"""Fused OI regularization-curve scan as a Pallas kernel.

The curve phase of the OI update computes, for each of the 99 factors,
``nanmean(AK_r)`` over the grid.  The XLA ``lax.scan`` formulation re-reads
Sa/So from HBM once per factor (~99 x 2 passes); this kernel loads each
(Sa, So) tile into VMEM once and loops the factors over it on the VPU —
cutting HBM traffic by ~99x for the bandwidth-bound phase.

Layout: the flattened cell arrays are padded with NaN to (M, 128) tiles;
grid = (num_row_tiles, R) with the factor axis innermost, so Pallas keeps
the Sa/So block resident across the inner iterations and revisits the
per-factor (1, 2) accumulator block across row tiles (init at tile 0).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oisat_tpu.ops.kernels import interpret_default

__all__ = ["ak_curve_pallas", "ak_curve_pallas_sharded"]

LANES = 128


def _kernel(regs_ref, sa_ref, so_ref, out_ref):
    t = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((t == 0) & (i == 0))
    def _():
        # SMEM accepts scalar stores only
        def zero(j, _):
            out_ref[j, 0] = 0.0
            out_ref[j, 1] = 0.0
            return _

        jax.lax.fori_loop(0, out_ref.shape[0], zero, None)

    reg = regs_ref[i, 0]
    sa = sa_ref[...]
    so = so_ref[...]
    sar = sa * reg
    denom = sar + so
    # AK = 1 - Sb/(Sa r) reduces to K = Sa r/(Sa r + So) except at
    # Sa r == 0 where the reference's 0/0 yields NaN; one division total.
    ak = jnp.where(sar == 0.0, jnp.nan, sar / denom)
    valid = jnp.isfinite(ak)
    s = jnp.sum(jnp.where(valid, ak, 0.0))
    c = jnp.sum(valid.astype(jnp.float32))
    out_ref[i, 0] += s
    out_ref[i, 1] += c


@partial(jax.jit, static_argnames=("rows_per_tile", "interpret"))
def _scan(sa2d, so2d, regs, rows_per_tile: int, interpret: bool):
    m = sa2d.shape[0]
    num_tiles = m // rows_per_tile
    r = regs.shape[0]
    out = pl.pallas_call(
        _kernel,
        grid=(num_tiles, r),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (R, 1) factor table
            pl.BlockSpec((rows_per_tile, LANES), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_tile, LANES), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),  # full (R, 2) accumulator
        out_shape=jax.ShapeDtypeStruct((r, 2), jnp.float32),
        interpret=interpret,
    )(regs.reshape(-1, 1), sa2d, so2d)
    return out


def ak_curve_pallas(sa, so, regs, rows_per_tile: int = 512, interpret: bool | None = None):
    """Mean-AK curve over ``regs`` — fused Pallas version of
    :func:`oisat_tpu.ops.oi.ak_curve` (identical result)."""
    if interpret is None:
        interpret = interpret_default()
    sa = jnp.asarray(sa, jnp.float32).ravel()
    so = jnp.asarray(so, jnp.float32).ravel()
    n = sa.shape[0]
    tile_cells = rows_per_tile * LANES
    padded = int(np.ceil(max(n, 1) / tile_cells)) * tile_cells
    pad = padded - n
    sa2d = jnp.pad(sa, (0, pad), constant_values=jnp.nan).reshape(-1, LANES)
    so2d = jnp.pad(so, (0, pad), constant_values=jnp.nan).reshape(-1, LANES)
    regs = jnp.asarray(regs, jnp.float32)
    out = _scan(sa2d, so2d, regs, rows_per_tile, interpret)
    s, c = out[:, 0], out[:, 1]
    return jnp.where(c > 0, s / c, jnp.nan)


def ak_curve_pallas_sharded(sa, so, regs, mesh, axis: str = "grid",
                            rows_per_tile: int = 512, interpret: bool | None = None):
    """Multi-device mean-AK curve: the Pallas kernel runs per shard under
    ``shard_map`` and the (R, 2) sum/count partials are psum-reduced over
    ``axis`` — the pattern that keeps the fused kernel usable on a v5p-8
    mesh (a bare Pallas call is not SPMD-partitioned by XLA).
    """
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = interpret_default()
    nshards = mesh.shape[axis]
    sa = jnp.asarray(sa, jnp.float32).ravel()
    so = jnp.asarray(so, jnp.float32).ravel()
    n = sa.shape[0]
    chunk = rows_per_tile * LANES * nshards
    padded = int(np.ceil(max(n, 1) / chunk)) * chunk
    pad = padded - n
    sa2d = jnp.pad(sa, (0, pad), constant_values=jnp.nan).reshape(-1, LANES)
    so2d = jnp.pad(so, (0, pad), constant_values=jnp.nan).reshape(-1, LANES)
    regs = jnp.asarray(regs, jnp.float32)

    def shard_fn(a, b, r):
        return jax.lax.psum(_scan(a, b, r, rows_per_tile, interpret), axis)

    f = jax.shard_map(shard_fn, mesh=mesh,
                      in_specs=(P(axis, None), P(axis, None), P(None)),
                      out_specs=P(None), check_vma=False)
    out = f(sa2d, so2d, regs)
    s, c = out[:, 0], out[:, 1]
    return jnp.where(c > 0, s / c, jnp.nan)
