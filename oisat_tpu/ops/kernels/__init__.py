"""Pallas TPU kernels for the hot paths.

All kernels fall back to interpreter mode off-TPU (tests run on the CPU
backend), selected automatically.
"""

import jax


def interpret_default() -> bool:
    return jax.default_backend() != "tpu"
