"""Failure-path behavior: corrupt files, empty months, all-bad QA."""

import numpy as np
import pytest

from oisat_tpu.ops.averaging import averaging
from oisat_tpu.readers.sensors import omi_reader
from tests.test_sensors import CLAT, CLON, write_omi_no2


def test_empty_month_raises_cleanly(tmp_path):
    out = omi_reader(str(tmp_path), "OMI_NO2", CLON, CLAT, "201907", trop=True)
    assert out == []
    from types import SimpleNamespace

    with pytest.raises(ValueError, match="no valid satellite granules"):
        averaging("2019-07-01", "2019-08-01", SimpleNamespace(sat_data=out))


def test_corrupt_file_becomes_none(tmp_path):
    # one good file, one garbage file (>100 bytes so it passes the size prune)
    write_omi_no2(tmp_path / "OMI-Aura_L2-OMNO2_2019m0710.nc")
    (tmp_path / "OMI-Aura_L2-OMNO2_2019m0711.nc").write_bytes(b"x" * 500)
    out = omi_reader(str(tmp_path), "OMI_NO2", CLON, CLAT, "201907", trop=True)
    assert len(out) == 2
    assert sum(g is not None for g in out) == 1


def test_tiny_file_pruned(tmp_path):
    (tmp_path / "OMI-Aura_L2-OMNO2_2019m0712.nc").write_bytes(b"x" * 10)
    out = omi_reader(str(tmp_path), "OMI_NO2", CLON, CLAT, "201907", trop=True)
    assert out == []


def test_all_bad_qa_granule_skipped(tmp_path):
    import h5py

    write_omi_no2(tmp_path / "OMI-Aura_L2-OMNO2_2019m0710.nc")
    with h5py.File(tmp_path / "OMI-Aura_L2-OMNO2_2019m0710.nc", "a") as f:
        f["ANCILLARY_DATA"]["CloudFraction"][...] = 0.9  # everything cloudy
    out = omi_reader(str(tmp_path), "OMI_NO2", CLON, CLAT, "201907", trop=True)
    # all-NaN vcd -> granule rejected (reference interpolator.py:165-167)
    assert out == [None]
