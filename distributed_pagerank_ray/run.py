"""CLI entry point: ``python -m distributed_pagerank_ray.run --algo pagerank …``

Submitted to a cluster with
``ray job submit -- python -m distributed_pagerank_ray.run --algo pagerank \
  --pages-parquet s3://…/pages --run-dir /mnt/runs/X``.

Owns the Ray session (the driver harness never imports this module).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def watch(run_dir: str, poll_s: float = 1.0, idle_timeout_s: "float | None" = None, out=None) -> int:
    """Live progress tail over a run directory — closes the reference's
    one UX gap (its SSE web client, cmd/client/main.go:97-161): the
    checkpoint layout IS the progress API, so watching a run needs no
    Ray session and works from any machine that sees the run_dir
    (file or URI). Prints one JSON line per newly durable iteration
    (iteration, residual, wall_sec, ...), then a final
    ``{"done": true}`` line once ``final/ranks`` is published.
    Returns 0 on completion, 1 on idle timeout."""
    import time

    from .state import checkpoint as ckpt

    out = out if out is not None else sys.stdout
    seen = -1
    idle = 0.0
    while True:
        m = ckpt.read_manifest(run_dir)
        progressed = False
        if m and m.get("completed_iter") is not None:
            k = int(m["completed_iter"])
            while seen < k:
                seen += 1
                mt = (
                    ckpt._read_json(
                        os.path.join(ckpt.iter_dir(run_dir, seen), "metrics.json")
                    )
                    or {}
                )
                line = {"iter": seen}
                line.update(
                    {
                        kk: vv
                        for kk, vv in mt.items()
                        if isinstance(vv, (int, float, bool, str))
                    }
                )
                print(json.dumps(line), file=out, flush=True)
                progressed = True
        if ckpt.exists(os.path.join(run_dir, "final", "ranks")):
            print(json.dumps({"done": True, "completed_iter": seen}), file=out, flush=True)
            return 0
        if progressed:
            idle = 0.0
        else:
            idle += poll_s
            if idle_timeout_s is not None and idle >= idle_timeout_s:
                print(
                    json.dumps({"done": False, "idle_timeout": True, "completed_iter": seen}),
                    file=out,
                    flush=True,
                )
                return 1
        time.sleep(poll_s)


def supervise(argv: list[str], max_restarts: int = 3, out=None) -> int:
    """Automatic failover at the job level — the engine's answer to the
    reference's bully leader election (pkg/node/worker.go:143-193): the
    reference keeps a job alive across a master crash by electing a new
    master; a Ray job's equivalent is a supervisor that relaunches the
    driver process, which resumes from the checkpoint manifest's
    ``completed_iter`` (state/checkpoint.py) — no operator in the loop.
    Runs ``python -m distributed_pagerank_ray.run <argv>`` as a child;
    on a nonzero exit (crash, OOM-kill, SIGKILL) relaunches up to
    ``max_restarts`` times. Returns the final child's exit code."""
    import subprocess

    out = out if out is not None else sys.stderr
    cmd = [sys.executable, "-m", "distributed_pagerank_ray.run", *argv]
    attempt = 0
    while True:
        rc = subprocess.call(cmd)
        if rc == 0:
            return 0
        attempt += 1
        if attempt > max_restarts:
            print(
                json.dumps({"supervise": "gave_up", "attempts": attempt, "rc": rc}),
                file=out,
                flush=True,
            )
            return rc
        print(
            json.dumps({"supervise": "restarting", "attempt": attempt, "rc": rc}),
            file=out,
            flush=True,
        )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--supervise",
        action="store_true",
        help="run the job in a supervised child process; relaunch on crash "
        "(resumes from the checkpoint manifest) up to --max-restarts times",
    )
    p.add_argument("--max-restarts", type=int, default=3)
    p.add_argument(
        "--watch",
        metavar="RUN_DIR",
        help="tail a run's per-iteration progress (no Ray session) and exit",
    )
    p.add_argument("--watch-poll", type=float, default=1.0)
    p.add_argument("--watch-idle-timeout", type=float, default=None)
    p.add_argument("--algo", default="pagerank", choices=["pagerank", "cc", "lpa", "triangles", "scc"])
    p.add_argument("--pages-parquet")
    p.add_argument("--edges-parquet")
    p.add_argument("--edgelist-txt")
    p.add_argument("--run-dir", default="/tmp/dpr_run")
    p.add_argument("--c", type=float, default=0.85)
    p.add_argument("--threshold", type=float, default=1e-6)
    p.add_argument("--max-iters", type=int, default=100)
    p.add_argument("--dangling", default="none", choices=["none", "redistribute"])
    p.add_argument("--outdegree-mode", default="line_count", choices=["line_count", "distinct"])
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    if args.watch:
        return watch(args.watch, poll_s=args.watch_poll, idle_timeout_s=args.watch_idle_timeout)
    if args.supervise:
        child_argv = [a for a in (argv if argv is not None else sys.argv[1:])]
        child_argv = [a for a in child_argv if a != "--supervise"]
        if "--max-restarts" in child_argv:
            i = child_argv.index("--max-restarts")
            del child_argv[i : i + 2]
        return supervise(child_argv, max_restarts=args.max_restarts)

    crash_marker = os.environ.get("DPR_TEST_CRASH_ONCE")
    if crash_marker and not os.path.exists(crash_marker):
        # test-only failover hook: die hard exactly once so the
        # supervised-restart pytest exercises a REAL crash + relaunch
        with open(crash_marker, "w") as fh:
            fh.write("crashed")
        os._exit(17)

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.registry import JobConfig, run

    cfg = JobConfig(
        algo=args.algo,
        pages_parquet=args.pages_parquet,
        edges_parquet=args.edges_parquet,
        edgelist_txt=args.edgelist_txt,
        run_dir=args.run_dir,
        c=args.c,
        threshold=args.threshold,
        max_iters=args.max_iters,
        dangling=args.dangling,
        outdegree_mode=args.outdegree_mode,
    )
    summary = run(cfg)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
