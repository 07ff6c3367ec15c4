"""SLURM submitter (reference run/job_submitter_sbatch.py): drop-in name.

Emits the reference's exact month set (cartesian min..max months x years —
see job_submitter.month_list_reference) for bit-parity of the job files.
"""
from job_submitter import submit

if __name__ == "__main__":
    submit(scheduler="sbatch", reference_months=True)
