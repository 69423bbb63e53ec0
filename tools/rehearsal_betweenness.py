"""Scale rehearsal for betweenness_centrality's SAMPLED-landmark path
(the 100-TB posture: exact all-landmarks is for gates/small graphs;
at scale K sources are sampled and the estimate is scaled by n/K).

Graph: V=1M expander-ish digraph (3 hash out-edges per vertex + an
8-ring for local structure), symmetrized by the operator — ~log(V)
diameter, so the fused forward sweep and the level-masked backward
sweep each run ~15-25 exchanges. K=64 landmarks in one batch.

Records wall time, exchange-free per-phase structure (batch count),
and peak system memory. Usage: python tools/rehearsal_betweenness.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scale_rehearsal import MemPeak  # noqa: E402

ROOT = "/tmp/dpr_rehearsal_bc"


def _gen_graph(path: str, v: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    chunk = 1 << 20
    for ci, lo in enumerate(range(0, v, chunk)):
        i = np.arange(lo, min(lo + chunk, v), dtype=np.int64)
        ring = (i // 8) * 8
        t = pa.table(
            {
                "src": pa.array(np.concatenate([i, i, i, i])),
                "dst": pa.array(
                    np.concatenate(
                        [
                            (48271 * i + 7) % v,
                            (16807 * i + 11) % v,
                            (69621 * i + 13) % v,
                            ring + (i - ring + 1) % 8,
                        ]
                    )
                ),
            }
        )
        pq.write_table(t, os.path.join(path, f"part_{ci:04d}.parquet"))


def main() -> None:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)

    import numpy as np
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from distributed_pagerank_ray.config import RunConfig
    from distributed_pagerank_ray.pipelines.centrality import betweenness_centrality
    from distributed_pagerank_ray.pipelines.graphbuild import build_graph

    mem = MemPeak()
    mem.start()
    V = 1_000_000
    t0 = time.time()
    if not os.path.exists(f"{ROOT}/edges.done"):
        _gen_graph(f"{ROOT}/edges", V)
        open(f"{ROOT}/edges.done", "w").close()
    gen_sec = round(time.time() - t0, 1)

    t0 = time.time()
    g = build_graph(
        ray.data.read_parquet(f"{ROOT}/edges"),
        f"{ROOT}/graph_run",
        src_col="src",
        dst_col="dst",
        mint=True,
        run_cfg=RunConfig(num_partitions=16, shard_rows=1 << 18),
    )
    build_sec = round(time.time() - t0, 1)

    # deterministic K=64 landmark sample (MINSTD-spread ids)
    K = 64
    lms = np.unique((48271 * np.arange(K, dtype=np.int64) + 12345) % g.n)
    t0 = time.time()
    bc = betweenness_centrality(g, landmarks=lms, batch_k=64, directed=False)
    df = bc.to_pandas()
    wall = round(time.time() - t0, 1)
    top = df.nlargest(5, "betweenness")
    out = {
        "metric": "betweenness_rehearsal_v1m_k64",
        "num_cpus": ncpu,
        "n_vertices": int(g.n),
        "n_landmarks": int(len(lms)),
        "gen_sec": gen_sec,
        "build_sec": build_sec,
        "betweenness_wall_sec": wall,
        "rows": int(len(df)),
        "top5_ids": top["id"].tolist(),
        "peak_rss_gib": mem.stop(),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
