import importlib.util
import os
import sys

import numpy as np
import h5py

from oisat_tpu.ncwriter import read_diag_nc, write_diag_nc, write_nc
from oisat_tpu.readers.ncio import read_nc


def _load(name):
    path = os.path.join(os.path.dirname(__file__), "..", "tools", name + ".py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_diag(path, seed=0):
    rng = np.random.default_rng(seed)
    H, W = 16, 24
    xa = np.abs(rng.normal(3, 1, (H, W)))
    y = xa * rng.uniform(0.8, 1.3, (H, W))
    err = np.abs(rng.normal(0.5, 0.1, (H, W)))
    lon, lat = np.meshgrid(np.linspace(-10, 10, W), np.linspace(30, 45, H))
    fields = {
        "sat_averaged_vcd": y, "ctm_averaged_vcd_prior": xa,
        "ctm_averaged_vcd_posterior": xa, "sat_averaged_error": err,
        "ak_OI": np.zeros((H, W)), "error_OI": np.zeros((H, W)),
        "scaling_factor": np.ones((H, W)), "lon": lon, "lat": lat,
        "aux1": np.ones((H, W)), "aux2": np.ones((H, W)),
    }
    write_diag_nc(path, fields, "2019-07-15 12:00:00")
    return fields


def test_readjust_oi(tmp_path):
    d = tmp_path / "diag"
    d.mkdir()
    make_diag(d / "NO2_201907.nc")
    mod = _load("readjust_OI")
    out = mod.readjust(d, tmp_path / "out", error_ctm=50.0)
    assert len(out) == 1
    fields, tstr = read_diag_nc(out[0])
    assert tstr.startswith("2019-07")
    # posterior now differs from prior (OI actually ran)
    assert not np.allclose(fields["ctm_averaged_vcd_posterior"],
                           fields["ctm_averaged_vcd_prior"])
    assert np.isfinite(fields["scaling_factor"]).all()


def test_convert2ext(tmp_path):
    d = tmp_path / "diag"
    d.mkdir()
    make_diag(d / "HCHO_201907.nc")
    mod = _load("convert2EXT")
    mod.convert(d, tmp_path / "ext", fake_years=range(2003, 2005))
    files = sorted(os.listdir(tmp_path / "ext"))
    assert "HCHO_201907.nc" in files
    assert "HCHO_200301.nc" in files and "HCHO_200412.nc" in files
    assert len(files) == 1 + 24
    sf = read_nc(tmp_path / "ext" / "HCHO_200301.nc", "SF")
    np.testing.assert_array_equal(sf, 1.0)
    with h5py.File(tmp_path / "ext" / "HCHO_201907.nc") as f:
        assert f["SF"].shape == (1, 16, 24)
        assert "hours since 2019-07-01" in f["time"].attrs["units"]


def test_create_oh_fields(tmp_path):
    # synthetic MERRA2 monthlies
    year = 2005
    for mm in range(1, 13):
        mdir = tmp_path / "merra2" / f"Y{year}" / f"M{mm:02}"
        mdir.mkdir(parents=True)
        L, H, W = 4, 6, 8
        write_nc(mdir / f"MERRA2_GMI.tavg24_3d_dac_Nv.monthly.{year}{mm:02}.nc4",
                 dims={"lev": np.arange(1.0, L + 1), "lat": np.linspace(-80, 80, H),
                       "lon": np.linspace(-170, 170, W)},
                 variables={"OH": (("lev", "lat", "lon"), np.full((L, H, W), 1e-12), {})})
        write_nc(mdir / f"MERRA2_GMI.tavg3_3d_met_Nv.monthly.{year}{mm:02}.nc4",
                 dims={"lev": np.arange(1.0, L + 1), "lat": np.linspace(-80, 80, H),
                       "lon": np.linspace(-170, 170, W)},
                 variables={"PL": (("lev", "lat", "lon"), np.full((L, H, W), 50000.0), {}),
                            "T": (("lev", "lat", "lon"), np.full((L, H, W), 250.0), {})})
    mod = _load("createOHfields")
    out = mod.create(tmp_path / "oh", str(tmp_path / "merra2"), year)
    assert len(out) == 12
    oh = read_nc(out[0], "OH")
    expect = 1e-12 * 6.02214076e23 * 500.0 / 8.314e4 / 250.0
    np.testing.assert_allclose(oh, expect, rtol=1e-12)


def test_readjust_oi_desroziers(tmp_path):
    """--desroziers N re-estimates So/Sa during the resume-from-diag OI
    (extension over the reference tool)."""
    d = tmp_path / "diag"
    d.mkdir()
    make_diag(d / "NO2_201907.nc", seed=3)
    mod = _load("readjust_OI")
    out0 = mod.readjust(d, tmp_path / "out0", error_ctm=200.0)
    out1 = mod.readjust(d, tmp_path / "out1", error_ctm=200.0,
                        desroziers_iterations=3)
    f0, _ = read_diag_nc(out0[0])
    f1, _ = read_diag_nc(out1[0])
    assert np.isfinite(f1["ctm_averaged_vcd_posterior"]).any()
    # the rescaled variances change the analysis (error field especially:
    # the wildly inflated 200% prior error is re-estimated down)
    assert not np.allclose(f1["error_OI"], f0["error_OI"], equal_nan=True)
    assert np.nanmean(f1["error_OI"]) < np.nanmean(f0["error_OI"])
