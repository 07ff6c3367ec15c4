"""SLURM submitter (reference run/job_submitter_sbatch.py): drop-in name."""
from job_submitter import submit

if __name__ == "__main__":
    submit(scheduler="sbatch")
