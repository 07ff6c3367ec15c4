"""Device-side regrid application: gather + weighted sum, box filters.

The hot half of the reference's regridding (reference
oisatgmi/interpolator.py:100-291): once the host has built a
:class:`~oisat_tpu.ops.weights.SparsePlan`, every 2-D/3-D field of a granule
is moved onto the target grid by one batched gather + weighted reduction —
a single fused XLA op instead of a scipy call per field per level.

Also implements the reference's box-filter upscaling
(`_upscaler`, interpolator.py:48-97): smooth the fine grid with a
``(ky, kx)`` mean filter (scipy ``convolve2d(mode='same',
boundary='symm')`` semantics, even kernels included), then map onto the CTM
grid through a (static, precomputed) nearest-neighbour plan.  Error fields
use the squared kernel ``1/(ky*kx)^2`` (`_boxfilter2`, interpolator.py:44-46).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["apply_plan", "boxfilter_same_symm", "apply_plan_arrays"]


def apply_plan_arrays(z, idx, w, mask):
    """Apply sparse weights: ``out[..., t] = sum_k w[t,k] * z[..., idx[t,k]]``.

    ``z``: (..., Npix) source pixel values (NaN = bad — propagates exactly as
    the scipy interpolators do).  ``mask``: True -> NaN (too far / out of
    hull).  Returns (..., T).
    """
    vals = jnp.take(z, idx, axis=-1)  # (..., T, K)
    out = jnp.sum(vals * w.astype(z.dtype), axis=-1)
    return jnp.where(mask, jnp.nan, out)


def apply_plan(plan, z):
    """Apply a host-built SparsePlan to ``z`` (..., Npix) -> (..., Ny, Nx)."""
    out = apply_plan_arrays(
        jnp.asarray(z), jnp.asarray(plan.idx), jnp.asarray(plan.w), jnp.asarray(plan.mask)
    )
    return out.reshape(z.shape[:-1] + plan.out_shape)


@partial(jax.jit, static_argnames=("ky", "kx", "squared"))
def boxfilter_same_symm(z, ky: int, kx: int, squared: bool = False):
    """Box filter with scipy ``convolve2d(mode='same', boundary='symm')`` semantics.

    ``z``: (..., H, W).  ``squared=True`` uses the error-variance kernel
    ``ones/(ky*kx)**2`` (reference ``_boxfilter2``).  NaNs spread over the
    window exactly like the reference's convolution.
    """
    z = jnp.asarray(z)
    # 'same' centering of a full convolution: pad_lo = k//2, pad_hi = (k-1)//2
    pads = [(0, 0)] * (z.ndim - 2) + [(ky // 2, (ky - 1) // 2), (kx // 2, (kx - 1) // 2)]
    zp = jnp.pad(z, pads, mode="symmetric")
    window = (1,) * (z.ndim - 2) + (ky, kx)
    s = lax.reduce_window(zp, jnp.zeros((), z.dtype), lax.add, window, (1,) * z.ndim, "valid")
    denom = (ky * kx) ** 2 if squared else (ky * kx)
    return s / jnp.asarray(denom, z.dtype)
