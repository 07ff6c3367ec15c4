"""Full month-job integration: control.yml -> job runner -> diag + report."""

import os

import numpy as np
import pytest
import yaml

from tests.test_sensors import write_omi_no2


@pytest.fixture
def job_env(tmp_path, monkeypatch):
    sat_dir = tmp_path / "omi_no2"
    sat_dir.mkdir()
    write_omi_no2(sat_dir / "OMI-Aura_L2-OMNO2_2019m0710.nc")
    ctrl = {
        "python_bin": "python3", "debug": False, "save_daily": False, "num_job": 1,
        "ctm_name": "FREE", "ctm_dir": str(tmp_path), "mcip_dir": str(tmp_path),
        "ctm_freq": "3-hourly", "ctm_avg": False, "ctm_error": 50.0,
        "gas": "NO2", "sensor": "OMI", "read_AK": True, "troposphere_only": True,
        "sat_dir": str(sat_dir),
        "start_date": "2019-07", "end_date": "2019-07",
        "output_pdf_dir": str(tmp_path / "report"),
        "output_nc_dir": str(tmp_path / "diag"),
    }
    with open(tmp_path / "control.yml", "w") as f:
        yaml.safe_dump(ctrl, f)
    with open(tmp_path / "control_free.yml", "w") as f:
        f.write("lonll: -10.0\nlonur: 10.0\nlatll: 30.0\nlatur: 45.0\ngridsize: 1.0\n")
    monkeypatch.chdir(tmp_path)
    return ctrl, tmp_path


def test_run_month_free_omi(job_env):
    ctrl, tmp = job_env
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "run_job", os.path.join(os.path.dirname(__file__), "..", "run", "job.py"))
    run_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(run_job)

    run_job.run_month(ctrl, 2019, 7)
    assert (tmp / "diag" / "NO2_201907.nc").exists()
    assert (tmp / "report" / "OI_report_NO2_201907.pdf").exists()
    from oisat_tpu.ncwriter import read_diag_nc

    fields, tstr = read_diag_nc(tmp / "diag" / "NO2_201907.nc")
    assert tstr.startswith("2019-07")
    assert np.isfinite(fields["sat_averaged_vcd"]).sum() > 10
    assert np.isfinite(fields["scaling_factor"]).all()


def test_month_window():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "run_job", os.path.join(os.path.dirname(__file__), "..", "run", "job.py"))
    run_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(run_job)
    assert run_job.month_window(2019, 7) == ("2019-07-01", "2019-08-01")
    assert run_job.month_window(2019, 12) == ("2019-12-01", "2020-01-01")


def test_submitter_scripts(tmp_path, monkeypatch):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "job_submitter", os.path.join(os.path.dirname(__file__), "..", "run", "job_submitter.py"))
    sub = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sub)
    ctrl = {"python_bin": "python3", "debug": False, "num_job": 8,
            "start_date": "2019-05", "end_date": "2019-06"}
    with open(tmp_path / "control.yml", "w") as f:
        yaml.safe_dump(ctrl, f)
    monkeypatch.chdir(tmp_path)
    scripts = sub.submit(scheduler="sbatch", dry_run=True)
    assert len(scripts) == 2  # May + June
    body = open(scripts[0]).read()
    assert "#SBATCH --cpus-per-task=8" in body
    assert "--mem=170G" in body
    assert "./job.py 2019 5" in body
    scripts = sub.submit(scheduler="qsub", dry_run=True)
    assert "#PBS" in open(scripts[0]).read()


def test_run_month_tempo_hour_loop(tmp_path, monkeypatch):
    """TEMPO runs 24 per-hour pipelines with per-hour fault tolerance
    (reference run/job.py:36-59): only hour 18 has data here, the other 23
    hours fail internally and the job must still complete."""
    import importlib.util

    from tests.test_sensors import write_tempo_no2

    sat_dir = tmp_path / "tempo"
    sat_dir.mkdir()
    write_tempo_no2(sat_dir / "TEMPO_NO2_L2_20230905T180000.nc")
    ctrl = {
        "python_bin": "python3", "debug": False, "save_daily": False, "num_job": 1,
        "ctm_name": "FREE", "ctm_dir": str(tmp_path), "mcip_dir": str(tmp_path),
        "ctm_freq": "hourly", "ctm_avg": False, "ctm_error": 50.0,
        "gas": "NO2", "sensor": "TEMPO", "read_AK": False, "troposphere_only": True,
        "sat_dir": str(sat_dir), "start_date": "2023-09", "end_date": "2023-09",
        "output_pdf_dir": str(tmp_path / "report"), "output_nc_dir": str(tmp_path / "diag"),
    }
    with open(tmp_path / "control_free.yml", "w") as f:
        f.write("lonll: -6.0\nlonur: 0.0\nlatll: 33.0\nlatur: 39.0\ngridsize: 0.5\n")
    monkeypatch.chdir(tmp_path)
    spec = importlib.util.spec_from_file_location(
        "run_job", os.path.join(os.path.dirname(__file__), "..", "run", "job.py"))
    run_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(run_job)
    run_job.run_month(ctrl, 2023, 9)
    assert (tmp_path / "diag" / "NO2_202309_18UTC.nc").exists()
    # no diags for empty hours
    assert not (tmp_path / "diag" / "NO2_202309_17UTC.nc").exists()
