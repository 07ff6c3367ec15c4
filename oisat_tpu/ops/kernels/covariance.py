"""Distance-decay background-error covariance built as a Pallas kernel.

``B[i, j] = sigma_i * sigma_j * exp(-d_ij^2 / (2 L^2))`` with ``d`` the
*chordal* distance ``2 R sqrt(hav)`` (km).  Chordal rather than great-circle
for two reasons: the Gaussian kernel of the chordal (Euclidean) distance is
provably positive definite on the sphere (the arc-length Gaussian is not),
and it needs no inverse trig (Pallas TPU has no asin lowering).  The two
agree to <1% for separations within ~2000 km, where the decay lives.

This is the TPU-native upgrade of the reference's diagonal-B assumption
(BASELINE.json north star): the matrix is produced tile-by-tile on the VPU
directly into HBM, with the row/column coordinate blocks resident in VMEM.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oisat_tpu.ops.kernels import interpret_default

__all__ = ["build_covariance", "EARTH_RADIUS_KM"]

EARTH_RADIUS_KM = 6371.0


def _cov_kernel(length_scale_km, latr, lonr, sigr, latc, lonc, sigc, out):
    lat_i = latr[0, :][:, None]
    lon_i = lonr[0, :][:, None]
    sig_i = sigr[0, :][:, None]
    lat_j = latc[0, :][None, :]
    lon_j = lonc[0, :][None, :]
    sig_j = sigc[0, :][None, :]
    sdlat = jnp.sin(0.5 * (lat_i - lat_j))
    sdlon = jnp.sin(0.5 * (lon_i - lon_j))
    a = sdlat * sdlat + jnp.cos(lat_i) * jnp.cos(lat_j) * sdlon * sdlon
    # chordal distance: d^2 = (2R)^2 * hav  (no sqrt/asin needed for d^2)
    d2 = (4.0 * EARTH_RADIUS_KM * EARTH_RADIUS_KM) * jnp.clip(a, 0.0, 1.0)
    decay = jnp.exp(-d2 / (2.0 * length_scale_km * length_scale_km))
    out[...] = sig_i * sig_j * decay


@partial(jax.jit, static_argnames=("length_scale_km", "tile", "interpret"))
def _build(lat_r, lon_r, sig, length_scale_km: float, tile: int, interpret: bool):
    n = lat_r.shape[1]
    grid = (n // tile, n // tile)
    row = pl.BlockSpec((1, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((1, tile), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_cov_kernel, length_scale_km),
        grid=grid,
        in_specs=[row, row, row, col, col, col],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(lat_r, lon_r, sig, lat_r, lon_r, sig)


def build_covariance(lat_deg, lon_deg, sigma, length_scale_km: float,
                     tile: int = 256, interpret: bool | None = None):
    """B (N, N) from degree coordinates and per-cell background std.

    N must be a multiple of ``tile`` (pad with ``sigma = 0`` rows, which
    produce zero covariance rows/columns).
    """
    if interpret is None:
        interpret = interpret_default()
    lat_r = jnp.deg2rad(jnp.asarray(lat_deg, jnp.float32)).reshape(1, -1)
    lon_r = jnp.deg2rad(jnp.asarray(lon_deg, jnp.float32)).reshape(1, -1)
    sig = jnp.asarray(sigma, jnp.float32).reshape(1, -1)
    n = lat_r.shape[1]
    if n % tile:
        raise ValueError(f"N={n} must be a multiple of tile={tile}")
    return _build(lat_r, lon_r, sig, float(length_scale_km), tile, interpret)


def build_covariance_reference(lat_deg, lon_deg, sigma, length_scale_km):
    """NumPy reference for tests."""
    lat = np.deg2rad(np.asarray(lat_deg, np.float64))
    lon = np.deg2rad(np.asarray(lon_deg, np.float64))
    sdlat = np.sin(0.5 * (lat[:, None] - lat[None, :]))
    sdlon = np.sin(0.5 * (lon[:, None] - lon[None, :]))
    a = sdlat**2 + np.cos(lat[:, None]) * np.cos(lat[None, :]) * sdlon**2
    d2 = (2.0 * EARTH_RADIUS_KM) ** 2 * np.clip(a, 0, 1)
    sig = np.asarray(sigma, np.float64)
    return sig[:, None] * sig[None, :] * np.exp(-d2 / (2 * length_scale_km**2))
