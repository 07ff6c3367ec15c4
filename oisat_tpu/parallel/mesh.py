"""Device-mesh helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "factor2"]


def factor2(n: int):
    """Split n devices into the most-square (a, b) factorization, a*b = n."""
    best = (1, n)
    for a in range(1, int(np.sqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


def make_mesh(n_devices: int | None = None, axis_names=("obs", "grid")) -> Mesh:
    """A 2-D mesh over the first ``n_devices`` devices.

    'obs' shards the granule batch (data parallel); 'grid' shards analysis
    grid rows (spatial partition).  With one device both axes are size 1xN.
    """
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n > len(devs):
        raise RuntimeError(
            f"mesh requested {n} devices but the host has {len(devs)} "
            f"(check the mesh_devices control key)")
    a, b = factor2(n)
    mesh_devs = np.array(devs[:n]).reshape(a, b)
    return Mesh(mesh_devs, axis_names)
