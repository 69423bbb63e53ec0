"""Child process for the literal-SIGKILL resume test (run via subprocess).

argv: edges_parquet V run_dir max_iters
Builds (or reuses, via _DONE.json) the dense graph and runs PageRank
with threshold=0 for exactly max_iters iterations. The parent test
SIGKILLs this process mid-run and then re-runs it to prove resume.
"""

import sys

import ray
import ray.data

edges_path, v, run_dir, max_iters = (
    sys.argv[1],
    int(sys.argv[2]),
    sys.argv[3],
    int(sys.argv[4]),
)
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from distributed_pagerank_ray.config import PageRankConfig, RunConfig  # noqa: E402
from distributed_pagerank_ray.pipelines.graphbuild import build_graph_dense  # noqa: E402
from distributed_pagerank_ray.pipelines.pagerank import pagerank  # noqa: E402

g = build_graph_dense(
    ray.data.read_parquet(edges_path),
    v,
    run_dir,
    run_cfg=RunConfig(num_partitions=2, shard_rows=1 << 20),
)
res = pagerank(g, PageRankConfig(threshold=0.0, max_iters=max_iters))
print(f"CHILD_DONE iters={res.iterations} converged={res.converged}", flush=True)
ray.shutdown()
