"""Batch-job emitters: one SLURM/PBS job per (year, month).

Equivalent of the reference submitters (reference run/job_submitter_sbatch.py:45-68,
run/job_submitter_qsub.py:47-71), merged into one module with the scheduler
as an argument; the generated scripts keep the reference's resource shape
(170 GB / 12 h SLURM, 3 h PBS).  Months are fully independent jobs — the
reference's coarse parallelism layer, preserved for drop-in use.
"""

from __future__ import annotations

import datetime
import os

import yaml


def month_list(startdate: str, enddate: str):
    start = datetime.date(int(startdate[0:4]), int(startdate[5:7]), 1)
    end = datetime.date(int(enddate[0:4]), int(enddate[5:7]), 26)
    months, years = [], []
    d = start
    while d < end:
        months.append(d.month)
        years.append(d.year)
        d += datetime.timedelta(days=1)
    out = []
    for year in range(min(years), max(years) + 1):
        for month in range(min(months), max(months) + 1):
            out.append((year, month))
    return out


def sbatch_script(python_bin, num_job, year, month, debug=False):
    lines = [
        "#!/bin/bash",
        "#SBATCH -J oi_gmi",
        "#SBATCH --no-requeue",
        "#SBATCH --account=s1043",
        "#SBATCH --ntasks=1",
        f"#SBATCH --cpus-per-task={int(num_job)}",
        "#SBATCH --mem=170G",
        "#SBATCH --qos=debug" if debug else "#SBATCH -t 12:00:00",
        "#SBATCH -o oi_gmi-%j.out",
        "#SBATCH -e oi_gmi-%j.err",
        f"{python_bin} ./job.py {year} {month}",
    ]
    return "\n".join(lines) + "\n"


def qsub_script(python_bin, year, month, debug=False):
    lines = [
        "#!/bin/bash",
        "#PBS -l select=6:ncpus=4:mpiprocs=4:model=ivy",
        "#PBS -l walltime=3:00:00",
        "#PBS -N oi_gmi",
        "#PBS -j oe",
        "#PBS -m abe",
        "#PBS -o oi_gmi.out",
        "#PBS -e oi_gmi.err",
        "#PBS -W group_list=s1395",
    ]
    if debug:
        lines.append("#PBS -q devel")
    lines += ["cd $PBS_O_WORKDIR", f"{python_bin} ./job.py {year} {month}"]
    return "\n".join(lines) + "\n"


def submit(scheduler="sbatch", control="./control.yml", dry_run=False):
    with open(control, "r") as stream:
        ctrl = yaml.safe_load(stream)
    os.makedirs("./jobs", exist_ok=True)
    scripts = []
    for year, month in month_list(ctrl["start_date"], ctrl["end_date"]):
        if scheduler == "sbatch":
            body = sbatch_script(ctrl["python_bin"], ctrl["num_job"], year, month,
                                 debug=ctrl.get("debug", False))
        else:
            body = qsub_script(ctrl["python_bin"], year, month,
                               debug=ctrl.get("debug", False))
        path = f"./jobs/job_{year}_{month}.j"
        with open(path, "w") as f:
            f.write(body)
        scripts.append(path)
        if not dry_run:
            os.system(f"{scheduler} {path}")
    return scripts


if __name__ == "__main__":
    import sys

    submit(scheduler=sys.argv[1] if len(sys.argv) > 1 else "sbatch")
