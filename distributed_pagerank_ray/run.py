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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
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
