"""Optimal-interpolation (OI) analysis update — the core kernel.

Re-implements the reference's per-grid-cell scalar Kalman update
(reference oisatgmi/optimal_interpolation.py:6-52) as a fully-jitted,
shardable JAX computation:

    for each regularization factor r in 0.1..9.9 (99 values):
        K_r  = Sa*r / (Sa*r + So)                    (Kalman gain)
        Sb_r = (1 - K_r) * Sa * r                    (posterior variance)
        AK_r = 1 - Sb_r / (Sa*r)                     (averaging kernel)
        curve[r] = nanmean(AK_r)
    r* = Kneedle knee of (r, curve)   (fallback: first r)
    increment = K_{r*} * (Y - Xa);  Xb = Xa + increment
    returns (Xb, AK_{r*}, increment, sqrt(Sb_{r*}))

Semantics preserved exactly (NaN propagation included):
  * negative observations are clamped to 0 (NaN stays NaN) — reference :14,
  * AK is computed *literally* as ``1 - Sb/(Sa*r)`` so that cells with
    ``Sa == 0`` yield NaN (0/0) rather than the algebraically-equal K — the
    NaN pattern feeds the nanmean curve and therefore the knee choice,
  * the regularization grid is ``np.arange(0.1, 10, 0.1)`` evaluated in
    float64 once (99 points) and cast — reference :16-17,
  * no-knee fallback is the first factor — reference :39-43.

TPU-first shape: the curve is built by a ``lax.scan`` over the 99 factors
with masked sum/count reductions (no (99, H, W) materialization), then the
chosen factor's fields are computed in one fused elementwise pass.  The cell
dimension is embarrassingly parallel: under ``jit`` with a sharded mesh the
per-factor reductions become ``psum`` over ICI automatically.  A Pallas
fused-scan kernel (reads Sa/So once per tile, loops the 99 factors in VMEM)
is available in :mod:`oisat_tpu.ops.kernels.oi_scan` for the bandwidth-bound
curve phase.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from oisat_tpu.ops.knee import kneedle_index

__all__ = ["OIResult", "regularization_grid", "oi", "ak_curve"]


def regularization_grid() -> np.ndarray:
    """The reference's 99-point regularization scan grid (float64)."""
    return np.arange(0.1, 10.0, 0.1)


class OIResult(NamedTuple):
    """Outputs of the OI update (field shapes match the inputs)."""

    xb: jax.Array  # posterior state
    averaging_kernel: jax.Array  # AK at the chosen factor
    increment: jax.Array  # K * (Y - Xa)
    error: jax.Array  # sqrt(posterior variance)
    reg_index: jax.Array  # int32 index into the regularization grid
    reg_factor: jax.Array  # the chosen factor value
    curve: jax.Array  # mean-AK curve over the grid (for diagnostics)


def _kalman_terms(sa: jax.Array, so: jax.Array, reg: jax.Array):
    """K, Sb, AK for one regularization factor.

    ``Sb`` uses the numerically-stable product form
    ``Sa*r*So / (Sa*r + So)`` — algebraically identical to the reference's
    ``(1-K)*Sa*r`` but immune to the ``K -> 1`` cancellation that destroys
    float32 accuracy when ``So << Sa*r``.  NaN semantics match: ``Sa == 0``
    still yields ``Sb = 0`` and ``AK = 1 - 0/0 = NaN``; ``So == inf``
    (an unusable observation) needs an explicit guard — the product form's
    ``inf/inf`` would NaN the cell, but the reference computes ``K = 0``,
    ``Sb = Sa*r``, ``AK = 0`` and keeps it in the mean-AK curve (as does
    the fused Pallas kernel; the two curve engines must agree).
    """
    sar = sa * reg
    denom = sar + so
    k = sar / denom
    ratio = jnp.where(jnp.isinf(so), jnp.ones_like(so), so / denom)
    sb = sar * ratio
    ak = 1.0 - sb / sar
    return k, sb, ak


def _ak_stats(sa: jax.Array, so: jax.Array, reg: jax.Array):
    """Masked sum & count of the averaging kernel for one factor."""
    _, _, ak = _kalman_terms(sa, so, reg)
    valid = jnp.isfinite(ak)
    s = jnp.sum(jnp.where(valid, ak, 0.0))
    c = jnp.sum(valid)
    return s, c


def ak_curve(sa: jax.Array, so: jax.Array, regs: jax.Array) -> jax.Array:
    """Mean-AK-vs-regularization curve via a scan (no (R, ...) blowup)."""

    def body(carry, reg):
        s, c = _ak_stats(sa, so, reg)
        return carry, (s, c)

    _, (s, c) = jax.lax.scan(body, None, regs)
    return jnp.where(c > 0, s / c, jnp.nan)


def oi(
    xa: jax.Array,
    y: jax.Array,
    sa: jax.Array,
    so: jax.Array,
    regularization_on: bool = True,
    curve_impl: str = "auto",
    curve_fn=None,
) -> OIResult:
    """OI update. ``xa``: prior, ``y``: obs, ``sa``/``so``: error variances.

    All inputs share one shape; NaN marks missing cells and propagates.
    ``regularization_on`` is static (two trace variants).  ``curve_impl``
    selects the regularization-curve engine: "xla" (lax.scan), "pallas"
    (fused VMEM-resident kernel, ~3x faster on TPU), or "auto" (pallas on
    the TPU backend for float32 grids above 2^16 cells).  ``curve_fn``
    overrides the engine entirely with a callable ``(sa, so, regs) ->
    curve`` — the hook the sharded analysis step uses to run the Pallas
    kernel under ``shard_map`` on a device mesh (a bare ``pallas_call`` is
    not SPMD-partitioned by XLA).
    """
    dtype = jnp.result_type(xa, y, sa, so)
    xa = xa.astype(dtype)
    y = y.astype(dtype)
    sa = sa.astype(dtype)
    so = so.astype(dtype)

    # CTM-meaningless negative observations -> 0 (NaN preserved).
    y = jnp.where(y < 0, jnp.zeros_like(y), y)

    if regularization_on:
        regs_np = regularization_grid()
    else:
        regs_np = np.array([1.0])
    regs = jnp.asarray(regs_np, dtype=dtype)

    if curve_fn is not None:
        curve = curve_fn(sa, so, regs).astype(dtype)
    else:
        if curve_impl == "auto":
            use_pallas = (
                jax.default_backend() == "tpu"
                and dtype == jnp.float32
                and int(np.prod(xa.shape)) >= 1 << 16
            )
        else:
            use_pallas = curve_impl == "pallas"
        if use_pallas:
            from oisat_tpu.ops.kernels.oi_scan import ak_curve_pallas

            curve = ak_curve_pallas(sa, so, regs).astype(dtype)
        else:
            curve = ak_curve(sa, so, regs)
    if regularization_on:
        reg_index = kneedle_index(jnp.asarray(regs_np, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32), curve, fallback=0)
    else:
        reg_index = jnp.asarray(0, dtype=jnp.int32)
    reg = regs[reg_index]

    k, sb, ak = _kalman_terms(sa, so, reg)
    increment = k * (y - xa)
    xb = xa + increment
    return OIResult(
        xb=xb,
        averaging_kernel=ak,
        increment=increment,
        error=jnp.sqrt(sb),
        reg_index=reg_index,
        reg_factor=reg,
        curve=curve,
    )
