"""One-off datapoint for BASELINE.md (VERDICT r4 #7): parse the bench
graph's edges in the reference TEXT edge-list format through
``read_edgelist`` — vectorized Arrow fast path vs the per-line loop.

Exports the cached bench edge table (/tmp/dpr_bench) to ``src dst``
text via DuckDB COPY, then times (a) the distributed read_text +
vectorized parse and (b) the same with the fast path disabled (the
old per-line kernel), printing one JSON line.

Usage: python tools/bench_edgelist_parse.py [--v N] (default 8M
vertices = the ~103M-edge bench graph; use --v 1000000 for a quick
~20M-edge run).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    V = int(sys.argv[sys.argv.index("--v") + 1]) if "--v" in sys.argv else 8_000_000
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from distributed_pagerank_ray.sources import edgelist
    from distributed_pagerank_ray.sources.synth import bench_graph_dir

    gdir, n_edges = bench_graph_dir(V, avg_extra_deg=15.0 if V >= 4_000_000 else 18.0)

    txt_dir = os.path.join(gdir, "edges_txt")
    if not os.path.exists(os.path.join(txt_dir, "_DONE")):
        import duckdb

        os.makedirs(txt_dir, exist_ok=True)
        t0 = time.time()
        duckdb.sql(
            f"COPY (SELECT src || ' ' || dst AS line FROM '{gdir}/edges/*.parquet') "
            f"TO '{txt_dir}/edges' (FORMAT CSV, HEADER false, PER_THREAD_OUTPUT true)"
        )
        print(f"# exported text in {time.time() - t0:.1f}s", file=sys.stderr)
        open(os.path.join(txt_dir, "_DONE"), "w").close()

    src = os.path.join(txt_dir, "edges")

    def run(vectorized: bool) -> float:
        t0 = time.time()
        ds = ray.data.read_text(src)
        fn = edgelist._parse_batch if vectorized else (
            lambda b: edgelist.parse_lines(b.column("text").to_pylist())
        )
        n = ds.map_batches(fn, batch_format="pyarrow").count()
        assert n == n_edges, (n, n_edges)
        return time.time() - t0

    run(True)  # warm page cache
    vec = min(run(True), run(True))
    loop = min(run(False), run(False))
    print(
        json.dumps(
            {
                "metric": "edgelist_text_parse",
                "n_edges": n_edges,
                "num_cpus": ncpu,
                "vectorized_sec": round(vec, 1),
                "per_line_loop_sec": round(loop, 1),
                "speedup": round(loop / vec, 2),
                "edges_per_sec_vectorized": round(n_edges / vec, 0),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
