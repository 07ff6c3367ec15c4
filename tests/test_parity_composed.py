"""Composed-pipeline parity: regrid_granule and amf_recal (upscale branch)
against scipy-composed float64 implementations of the reference flow."""

import numpy as np
import jax.numpy as jnp
import pytest

from oisat_tpu.obs_operators import amf_recal
from oisat_tpu.ops.vertical import partial_column
from oisat_tpu.regridder import regrid_granule
from tests.reference_impl import amf_recal_pixelwise, interpolator_amf_scipy, upscaler_scipy
from tests.test_pipeline import ctm_grid, synthetic_ctm, synthetic_granule


@pytest.mark.parametrize("method", [1, 2, 4])
def test_regrid_granule_matches_composed_reference(method):
    g = synthetic_granule(0, 4)
    clon, clat = ctm_grid()
    ref = interpolator_amf_scipy(method, 0.25, g, clon, clat, flag_thresh=0.5)
    got = regrid_granule(method, 0.25, g, clon, clat, flag_thresh=0.5, dtype=np.float64)
    assert (ref is None) == (got is None)
    for name in ("vcd", "amf", "tropopause", "uncertainty"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)), ref[name],
                                   rtol=1e-9, atol=1e-11, err_msg=name)
    np.testing.assert_allclose(got.scattering_weights, ref["scattering_weights"],
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(got.pressure_mid, ref["pressure_mid"], rtol=1e-9, atol=1e-9)
    assert got.ctm_upscaled_needed == ref["upneeded"] == False  # noqa: E712


def test_amf_recal_upscale_branch():
    """CTM coarser than the granule grid -> ctm_upscaled_needed=True: the
    CTM pmids/partial columns must be box-filtered + KD-mapped onto the
    satellite grid before the vertical kernel (reference amf_recal.py:58-83)."""
    clon, clat = ctm_grid()
    ctm = synthetic_ctm(nt=8, nz=12)
    g = regrid_granule(1, 0.25, synthetic_granule(1, 5), clon, clat, flag_thresh=0.5)
    # force the upscale branch: pretend the granule grid is the fine grid
    g.ctm_upscaled_needed = True
    import dataclasses

    g2 = dataclasses.replace(g)
    g2.vcd = g.vcd.copy()
    out = amf_recal([ctm], [g2])[0]
    # golden: upscale ctm fields with the scipy upscaler, then pixelwise AMF
    hour = 4  # 13:30 -> closest 3-hourly slot (13.5/3=4.5 -> idx 4 or 5)
    import datetime

    tsat = g.time
    times = [t for t in ctm.time]
    diffs = [abs((tsat - t).total_seconds()) for t in times]
    hour = int(np.argmin(diffs))
    pmid = np.squeeze(ctm.pressure_mid[hour]).astype(np.float64)
    prof = np.squeeze(ctm.gas_profile[hour]).astype(np.float64)
    dp = np.squeeze(ctm.delta_p[hour]).astype(np.float64)
    pc = np.asarray(partial_column(jnp.asarray(dp), jnp.asarray(prof)))
    gridsize_ctm = np.hypot(1.25, 1.0)
    thr_sat = np.hypot(abs(g.longitude_center[0, 0] - g.longitude_center[0, 1]),
                       abs(g.latitude_center[0, 0] - g.latitude_center[1, 0]))
    pmid_u = np.stack([upscaler_scipy(clon, clat, pmid[z], g.longitude_center,
                                      g.latitude_center, gridsize_ctm, thr_sat)[2]
                       for z in range(pmid.shape[0])])
    pc_u = np.stack([upscaler_scipy(clon, clat, pc[z], g.longitude_center,
                                    g.latitude_center, gridsize_ctm, thr_sat)[2]
                     for z in range(pc.shape[0])])
    ref = amf_recal_pixelwise(np.asarray(g.pressure_mid, np.float64),
                              np.asarray(g.scattering_weights, np.float64),
                              pmid_u, pc_u,
                              np.asarray(g.tropopause, np.float64),
                              np.asarray(g.vcd, np.float64),
                              np.asarray(g.amf, np.float64))
    np.testing.assert_allclose(np.asarray(out.new_amf), ref[0], rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.ctm_vcd), ref[2], rtol=2e-5, atol=1e-7)
