"""Full-covariance OI: ``K = B (B + R)^-1`` with distance-decay B.

The TPU-native generalization of the reference's per-cell scalar update
(reference optimal_interpolation.py assumes diagonal B and R; BASELINE.json
asks for the blocked-Cholesky solve with a distance-decay background-error
covariance).  With H = I on the analysis grid:

    A  = B + R                      (R = diag(sigma_o^2))
    w  = A^-1 (y - xa)              (Cholesky solve)
    xb = xa + B w
    Sb = B - B A^-1 B               (posterior covariance)
    AK = 1 - diag(Sb) / diag(B)     (averaging-kernel diagonal)

B is built by the Pallas kernel in
:mod:`oisat_tpu.ops.kernels.covariance`; the factorization and solves use
XLA's blocked TPU Cholesky (``jax.scipy.linalg``).  Setting
``length_scale_km -> 0`` recovers the reference's diagonal update exactly.

Missing cells (NaN) are compacted out on host; valid cells are padded to a
lane multiple with ``sigma_b = 0`` / ``sigma_o = 1`` rows, which decouple
from the solve.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from oisat_tpu.ops.kernels.covariance import build_covariance

__all__ = ["OIFullResult", "oi_full", "oi_full_dense", "oi_full_dense_scan"]

LANES = 128


class OIFullResult(NamedTuple):
    xb: np.ndarray
    averaging_kernel: np.ndarray
    increment: np.ndarray
    error: np.ndarray


@partial(jax.jit, static_argnames=("length_scale_km", "diag_block"))
def oi_full_dense(xa, y, sigma_b, sigma_o, lat, lon, length_scale_km: float,
                  diag_block: int = 1024):
    """Dense-cell solve: all 1-D inputs length N (multiple of 128), finite.

    The posterior-covariance diagonal ``diag(B - B A^-1 B)`` is accumulated
    in column blocks of ``diag_block`` (a full N-rhs ``cho_solve`` would
    materialize several NxN temporaries and exhausts HBM above ~10k cells).
    """
    b = build_covariance(lat, lon, sigma_b, length_scale_km, tile=LANES)
    a = b + jnp.diag(sigma_o.astype(jnp.float32) ** 2)
    chol = jax.scipy.linalg.cho_factor(a, lower=True)
    innov = (y - xa).astype(jnp.float32)
    w = jax.scipy.linalg.cho_solve(chol, innov)
    increment = b @ w
    xb = xa + increment

    n = b.shape[0]
    k = min(diag_block, n)
    nblocks = -(-n // k)
    npad = nblocks * k

    def block_diag(start):
        cols = jax.lax.dynamic_slice(b, (0, start), (n, k))  # (N, K)
        c = jax.scipy.linalg.cho_solve(chol, cols)
        return jnp.sum(cols * c, axis=0)  # diag entries for this block

    starts = jnp.minimum(jnp.arange(nblocks) * k, n - k)
    parts = jax.lax.map(block_diag, starts)  # (nblocks, K)
    # overlapping final block: recompute positions explicitly
    col_idx = (starts[:, None] + jnp.arange(k)[None, :]).ravel()
    quad = jnp.zeros((n,), b.dtype).at[col_idx].set(parts.ravel())
    bd = jnp.diag(b)
    sb_diag = bd - quad
    ak = 1.0 - sb_diag / bd
    err = jnp.sqrt(jnp.maximum(sb_diag, 0.0))
    return xb, ak, increment, err


@partial(jax.jit, static_argnames=("length_scale_km",))
def oi_full_dense_scan(xa, y, sigma_b, sigma_o, lat, lon, length_scale_km: float, regs):
    """Full-covariance OI *with* the reference's regularization scan.

    The scalar OI scans 99 factors r, scaling the background variance
    (reference optimal_interpolation.py:16-33).  Densely that would mean 99
    Cholesky factorizations; instead, whiten by R and eigendecompose once:

        C = D^-1 B D^-1 = Q diag(lam) Q^T          (D = diag(sigma_o))
        (rB + R)^-1 = D^-1 Q diag(1/(r lam + 1)) Q^T D^-1

    so every factor costs a few vector ops: with M = Q^T D^-1 B and
    S = colsum(coef * M*M), the posterior-variance diagonal is
    diag(Sb_r) = r diag(B) - r^2 S_r and the mean-AK curve, the Kneedle
    knee, and the chosen factor's fields all come from the same
    decomposition.  One eigh + two GEMMs total — the MXU does the scan.
    """
    f32 = jnp.float32
    b = build_covariance(lat, lon, sigma_b, length_scale_km, tile=LANES)
    d = sigma_o.astype(f32)
    dinv = 1.0 / d
    c = b * dinv[:, None] * dinv[None, :]
    lam, q = jnp.linalg.eigh(c)
    innov = ((y - xa) * dinv).astype(f32)
    t = q.T @ innov  # (N,)
    m = q.T @ (b * dinv[:, None])  # M = Q^T D^-1 B, (N, N)
    m2 = m * m
    bd = jnp.diag(b)
    # valid-cell mask for the mean-AK curve: pad cells carry sigma_b = 0
    valid = bd > 0
    nvalid = jnp.maximum(jnp.sum(valid), 1)

    def curve_point(r):
        coef = 1.0 / (r * lam + 1.0)
        s = coef @ m2  # (N,): sum_i coef_i M_ij^2
        ak_diag = jnp.where(valid, r * s / jnp.where(valid, bd, 1.0), jnp.nan)
        return jnp.sum(jnp.where(valid, ak_diag, 0.0)) / nvalid

    regs = jnp.asarray(regs, f32)
    curve = jax.vmap(curve_point)(regs)
    from oisat_tpu.ops.knee import kneedle_index

    reg_index = kneedle_index(regs, curve, fallback=0)
    r = regs[reg_index]
    coef = 1.0 / (r * lam + 1.0)
    w = dinv * (q @ (coef * t))  # (rB+R)^-1 innovation
    increment = r * (b @ w)
    xb = xa + increment
    s = coef @ m2
    sb_diag = r * bd - r * r * s
    ak = jnp.where(valid, 1.0 - sb_diag / jnp.where(valid, r * bd, 1.0), jnp.nan)
    err = jnp.sqrt(jnp.maximum(sb_diag, 0.0))
    return xb, ak, increment, err, reg_index, curve


def oi_full(xa2d, y2d, sigma_b2d, sigma_o2d, lat2d, lon2d, length_scale_km: float,
            regularization_on: bool = False):
    """Grid-shaped front end: NaN-compaction + padding + scatter-back."""
    xa = np.asarray(xa2d, np.float64)
    y = np.array(y2d, np.float64, copy=True)
    y[y < 0] = 0.0  # reference semantics (optimal_interpolation.py:14)
    sb = np.asarray(sigma_b2d, np.float64)
    so = np.asarray(sigma_o2d, np.float64)
    valid = (np.isfinite(xa) & np.isfinite(y) & np.isfinite(sb) & np.isfinite(so))
    idx = np.nonzero(valid.ravel())[0]
    n = idx.size
    if n == 0:
        nanf = np.full(xa.shape, np.nan)
        return OIFullResult(nanf, nanf.copy(), nanf.copy(), nanf.copy())
    npad = int(np.ceil(n / LANES)) * LANES

    def take(arr, fill):
        out = np.full(npad, fill)
        out[:n] = np.asarray(arr, np.float64).ravel()[idx]
        return jnp.asarray(out, jnp.float32)

    if regularization_on:
        from oisat_tpu.ops.oi import regularization_grid

        xb_v, ak_v, inc_v, err_v, _, _ = oi_full_dense_scan(
            take(xa, 0.0), take(y, 0.0), take(sb, 0.0), take(so, 1.0),
            take(lat2d, 0.0), take(lon2d, 0.0), float(length_scale_km),
            regularization_grid().astype(np.float32))
    else:
        xb_v, ak_v, inc_v, err_v = oi_full_dense(
            take(xa, 0.0), take(y, 0.0), take(sb, 0.0), take(so, 1.0),
            take(lat2d, 0.0), take(lon2d, 0.0), float(length_scale_km))

    def scatter(v):
        out = np.full(xa.size, np.nan)
        out[idx] = np.asarray(v)[:n]
        return out.reshape(xa.shape)

    return OIFullResult(scatter(xb_v), scatter(ak_v), scatter(inc_v), scatter(err_v))
