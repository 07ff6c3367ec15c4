"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver validates multi-chip sharding with
``xla_force_host_platform_device_count``; tests use the same trick so every
sharded code path executes (collectives included) without TPU hardware.
Numerics tests enable x64 so goldens agree with float64 NumPy references;
dedicated f32 tests cover the TPU dtype policy.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU: the ambient environment pre-sets JAX_PLATFORMS=axon (the real
# TPU tunnel) and overrides the env var, so use the config API.  On the TPU,
# float64 is emulated (~49-bit) and float64 goldens drift by ulps.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_oisat_env(monkeypatch):
    """run_month pins OISAT_* process-wide (deliberate in production so a
    parity month can't leak into later months); tests must not inherit a
    previous test's pins."""
    for k in ("OISAT_PARITY", "OISAT_F16_TRANSFER", "OISAT_FAST_SWATH",
              "OISAT_DEVICE_GRANULES"):
        monkeypatch.delenv(k, raising=False)
