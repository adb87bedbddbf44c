"""Job-level sweep launcher: fan (scene x model-variant) work items over
processes with retries — the HTCondor-submission equivalent
(cluster_mpi/htcondor_submission.sub semantics) on top of
psi_tpu.parallel.launcher.

    python scripts/launch_sweep.py --what fitting --gen results --fit fitted
    python scripts/launch_sweep.py --what train --variants s1 s2
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["train", "fitting"], default="fitting")
    ap.add_argument("--variants", nargs="*", default=["s1"])
    ap.add_argument("--gen", type=str, default="results")
    ap.add_argument("--fit", type=str, default="fitted")
    ap.add_argument("--max_parallel", type=int, default=1)
    ap.add_argument("--max_retries", type=int, default=500)  # htcondor_submission.sub:21
    ap.add_argument("--extra", nargs="*", default=["--synthetic"])
    args = ap.parse_args()

    from psi_tpu.parallel.launcher import JobSpec, run_jobs

    jobs = []
    if args.what == "train":
        for v in args.variants:
            jobs.append(JobSpec(
                name=f"train_{v}",
                argv=[sys.executable, "-m", "psi_tpu.cli.train", "--model_type", v,
                      "--save_dir", f"checkpoints_{v}", *args.extra],
                max_retries=args.max_retries,
            ))
    else:
        for ds in ["proxe"]:
            jobs.append(JobSpec(
                name=f"fitting_{ds}",
                argv=[sys.executable, "-m", "psi_tpu.cli.fitting", args.gen, args.fit,
                      "--dataset", ds, *args.extra],
                max_retries=args.max_retries,
            ))

    results = run_jobs(jobs, max_parallel=args.max_parallel)
    failed = [r for r in results if r.returncode != 0]
    print(f"[sweep] {len(results) - len(failed)}/{len(results)} jobs succeeded")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
