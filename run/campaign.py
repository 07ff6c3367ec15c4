"""In-process campaign sweep: run many (year, month) jobs on one chip.

The reference fans months out as independent SLURM/PBS jobs
(run/job_submitter_*.py) because each CPU month takes hours; on TPU a month
is seconds-to-minutes, so a multi-month or multi-year campaign can run as
one process with cached compilations (all months share shapes) — the
'DCN sweep driver' of SURVEY.md §7 step 8.  Month-level fault tolerance
replaces manual resubmission: a failed month is retried once, then logged
and skipped.

Usage: python campaign.py [control.yml]  (uses start_date..end_date)
"""

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from job import load_control, run_month  # noqa: E402
from job_submitter import month_list  # noqa: E402

from oisat_tpu.utils.profiling import log, report, stage  # noqa: E402


def run_campaign(ctrl, retries: int = 1):
    months = month_list(ctrl["start_date"], ctrl["end_date"])
    failed = []
    for year, month in months:
        for attempt in range(retries + 1):
            try:
                with stage("month", year=year, month=month):
                    run_month(ctrl, year, month)
                log("month done", year=year, month=month)
                break
            except Exception:
                traceback.print_exc()
                if attempt == retries:
                    failed.append((year, month))
                    log("month FAILED after retries", year=year, month=month)
    log("campaign finished", months=len(months), failed=failed)
    print(report())
    return failed


if __name__ == "__main__":
    ctrl = load_control(sys.argv[1] if len(sys.argv) > 1 else "./control.yml")
    sys.exit(1 if run_campaign(ctrl) else 0)
