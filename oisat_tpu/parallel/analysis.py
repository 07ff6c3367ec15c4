"""The sharded end-to-end analysis step (averaging → bias → OI).

One jitted function takes the month's stacked granule fields ``(G, H, W)``
and produces the full OI analysis.  Under a mesh it runs SPMD: the granule
axis is sharded over 'obs', grid rows over 'grid'; XLA turns the temporal
reduction into a psum over 'obs' and the mean-AK curve reduction into a
global psum.  This one step is the TPU equivalent of the reference's whole
month-job compute (minus file IO): averaging.py + driver.bias_correct +
optimal_interpolation.py in a single compiled program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from oisat_tpu.ops.averaging import monthly_stats
from oisat_tpu.ops.oi import OIResult, oi

__all__ = [
    "AnalysisInputs", "AnalysisOutputs", "analysis_step", "make_analysis_step",
    "FullMonthInputs", "full_month_step", "make_full_month_step",
]


class AnalysisInputs(NamedTuple):
    """Stacked monthly granule fields, all (G, H, W)."""

    vcd: jax.Array
    uncertainty: jax.Array
    ctm_vcd: jax.Array
    aux1: jax.Array
    aux2: jax.Array


class AnalysisOutputs(NamedTuple):
    sat_vcd: jax.Array  # bias-corrected monthly mean observation
    sat_error: jax.Array
    ctm_vcd: jax.Array  # prior
    aux1: jax.Array
    aux2: jax.Array
    oi: OIResult
    scaling_factor: jax.Array


def analysis_step(inputs: AnalysisInputs, bias_offset: float = 0.0,
                  bias_slope: float = 1.0, error_ctm: float = 50.0,
                  gosat_mode: bool = False) -> AnalysisOutputs:
    """Monthly average + bias correction + OI update, one fused program."""
    stats = monthly_stats(inputs.vcd, inputs.uncertainty, inputs.ctm_vcd,
                          inputs.aux1, inputs.aux2)
    sat_vcd = (stats.sat_vcd - bias_offset) / bias_slope
    if gosat_mode:
        xa, y = stats.aux2, stats.aux1  # xcol pair (reference driver.py:112-114)
    else:
        xa, y = stats.ctm_vcd, sat_vcd
    sa = (xa * error_ctm / 100.0) ** 2
    so = stats.sat_error**2
    # XLA curve engine here: this function runs under jit with sharded
    # inputs, and a Pallas call would not be SPMD-partitioned by XLA.
    res = oi(xa, y, sa, so, regularization_on=True, curve_impl="xla")
    sf = res.xb / xa
    sf = jnp.where(jnp.isnan(sf) | jnp.isinf(sf) | (sf == 0.0), 1.0, sf)
    return AnalysisOutputs(sat_vcd=sat_vcd, sat_error=stats.sat_error,
                           ctm_vcd=stats.ctm_vcd, aux1=stats.aux1, aux2=stats.aux2,
                           oi=res, scaling_factor=sf)


def make_analysis_step(mesh: Mesh, **kwargs):
    """Jit ``analysis_step`` over a mesh.

    Inputs are sharded (obs, grid, None): granules over 'obs', grid rows
    over 'grid'.  2-D outputs are sharded (grid, None); scalars/curves are
    replicated.  Returns (jitted_fn, shard_inputs) where ``shard_inputs``
    device_puts a host AnalysisInputs with the right layout.
    """
    in_spec = P("obs", "grid", None)
    field_spec = P("grid", None)
    in_sh = AnalysisInputs(*([NamedSharding(mesh, in_spec)] * 5))
    out_sh = AnalysisOutputs(
        sat_vcd=NamedSharding(mesh, field_spec),
        sat_error=NamedSharding(mesh, field_spec),
        ctm_vcd=NamedSharding(mesh, field_spec),
        aux1=NamedSharding(mesh, field_spec),
        aux2=NamedSharding(mesh, field_spec),
        oi=OIResult(
            xb=NamedSharding(mesh, field_spec),
            averaging_kernel=NamedSharding(mesh, field_spec),
            increment=NamedSharding(mesh, field_spec),
            error=NamedSharding(mesh, field_spec),
            reg_index=NamedSharding(mesh, P()),
            reg_factor=NamedSharding(mesh, P()),
            curve=NamedSharding(mesh, P()),
        ),
        scaling_factor=NamedSharding(mesh, field_spec),
    )
    fn = jax.jit(partial(analysis_step, **kwargs), in_shardings=(in_sh,),
                 out_shardings=out_sh)

    def shard_inputs(inputs: AnalysisInputs) -> AnalysisInputs:
        return AnalysisInputs(*(jax.device_put(jnp.asarray(x), NamedSharding(mesh, in_spec))
                                for x in inputs))

    return fn, shard_inputs


class FullMonthInputs(NamedTuple):
    """A whole month of gridded granules + the matched CTM slices.

    Granule fields carry a leading G axis; per-granule CTM slices carry the
    same G axis (each granule was time-matched to its own CTM snapshot).
    """

    sat_pmid: jax.Array  # (G, Ls, H, W)
    sat_sw: jax.Array  # (G, Ls, H, W)
    vcd: jax.Array  # (G, H, W)
    amf: jax.Array  # (G, H, W)
    uncertainty: jax.Array  # (G, H, W)
    tropopause: jax.Array  # (G, H, W)
    ctm_pmid: jax.Array  # (G, Lc, H, W)
    ctm_pc: jax.Array  # (G, Lc, H, W)


def full_month_step(inputs: FullMonthInputs, bias_offset: float = 0.0,
                    bias_slope: float = 1.0, error_ctm: float = 50.0) -> AnalysisOutputs:
    """Observation operator + averaging + OI for a whole month, one program.

    This is the complete on-device compute of a reference month-job for a
    two-step sensor: vmapped AMF recalculation per granule, monthly
    statistics, bias correction, and the OI update.
    """
    from oisat_tpu.ops.vertical import amf_recal_fields

    new_amf, vcd_corr, model_vcd = jax.vmap(
        lambda sp, sw, cp, pc, tr, v, a: amf_recal_fields(sp, sw, cp, pc, tr, v, a, True)
    )(inputs.sat_pmid, inputs.sat_sw, inputs.ctm_pmid, inputs.ctm_pc,
      inputs.tropopause, inputs.vcd, inputs.amf)
    ai = AnalysisInputs(vcd=vcd_corr, uncertainty=inputs.uncertainty,
                        ctm_vcd=model_vcd, aux1=new_amf, aux2=inputs.amf)
    return analysis_step(ai, bias_offset=bias_offset, bias_slope=bias_slope,
                         error_ctm=error_ctm)


def make_full_month_step(mesh: Mesh, **kwargs):
    """Jit ``full_month_step`` over a mesh: granules sharded on 'obs', grid
    rows on 'grid', levels replicated."""
    g3 = NamedSharding(mesh, P("obs", "grid", None))
    g4 = NamedSharding(mesh, P("obs", None, "grid", None))
    in_sh = FullMonthInputs(sat_pmid=g4, sat_sw=g4, vcd=g3, amf=g3,
                            uncertainty=g3, tropopause=g3, ctm_pmid=g4, ctm_pc=g4)
    fn = jax.jit(partial(full_month_step, **kwargs), in_shardings=(in_sh,))

    def shard_inputs(inputs: FullMonthInputs) -> FullMonthInputs:
        return FullMonthInputs(*(jax.device_put(jnp.asarray(x), s)
                                 for x, s in zip(inputs, in_sh)))

    return fn, shard_inputs
