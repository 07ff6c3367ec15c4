import numpy as np
import jax
import jax.numpy as jnp

from oisat_tpu.parallel import make_mesh
from oisat_tpu.parallel.analysis import (
    AnalysisInputs,
    analysis_step,
    full_month_step,
    make_analysis_step,
    make_full_month_step,
)


def synth_inputs(G=4, H=16, W=24, seed=0):
    rng = np.random.default_rng(seed)
    def f():
        x = rng.normal(3, 1, (G, H, W))
        x[rng.random((G, H, W)) < 0.15] = np.nan
        return jnp.asarray(np.abs(x))
    return AnalysisInputs(vcd=f(), uncertainty=f(), ctm_vcd=f(), aux1=f(), aux2=f())


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_analysis_matches_single_device():
    inputs = synth_inputs()
    ref = analysis_step(inputs, bias_offset=0.3, bias_slope=0.7)
    mesh = make_mesh(8)
    fn, shard = make_analysis_step(mesh, bias_offset=0.3, bias_slope=0.7)
    got = fn(shard(inputs))
    np.testing.assert_allclose(np.asarray(got.oi.xb), np.asarray(ref.oi.xb), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(got.oi.curve), np.asarray(ref.oi.curve), rtol=1e-12)
    assert int(got.oi.reg_index) == int(ref.oi.reg_index)
    np.testing.assert_allclose(np.asarray(got.scaling_factor), np.asarray(ref.scaling_factor), rtol=1e-12)


def test_full_month_step_sharded():
    import __graft_entry__ as ge

    inputs = ge._synthetic_full_month(G=4, H=16, W=24)
    ref = full_month_step(inputs)
    mesh = make_mesh(8)
    fn, shard = make_full_month_step(mesh)
    got = fn(shard(inputs))
    np.testing.assert_allclose(np.asarray(got.oi.xb), np.asarray(ref.oi.xb), rtol=1e-5, atol=1e-6)
    assert int(got.oi.reg_index) == int(ref.oi.reg_index)


def test_dryrun_entrypoints():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out.oi.xb).shape == args[0].vcd.shape[1:]


def test_sharded_pallas_curve_matches_xla():
    from oisat_tpu.ops.kernels.oi_scan import ak_curve_pallas_sharded
    from oisat_tpu.ops.oi import ak_curve, regularization_grid

    rng = np.random.default_rng(5)
    n = 50_000  # deliberately not a multiple of the shard chunk
    sa = np.abs(rng.normal(2, 1, n)).astype(np.float32)
    so = np.abs(rng.normal(1, 0.5, n)).astype(np.float32)
    sa[rng.random(n) < 0.2] = np.nan
    sa[rng.random(n) < 0.02] = 0.0
    regs = regularization_grid().astype(np.float32)
    mesh = make_mesh(8, axis_names=("obs", "grid"))
    got = np.asarray(ak_curve_pallas_sharded(sa, so, regs, mesh, axis="grid",
                                             rows_per_tile=8))
    ref = np.asarray(ak_curve(jnp.asarray(sa), jnp.asarray(so), jnp.asarray(regs)))
    np.testing.assert_allclose(got, ref, rtol=2e-5)
