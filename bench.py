"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N, ...}

Headline: PageRank, 5 fixed iterations, on the deterministic synthetic
bench graph (V=1M, E≈20M, Zipf out-degrees — generated once, cached in
/tmp/dpr_bench). Reported derived metric: edges/sec/iteration (the
BASELINE.json target metric).

``--scaling``: runs the headline twice in fresh subprocesses at
RAY_GRAFT_CPUS=8 and 32 on the same cached input (the sandbox protocol
for the N-vs-4N cluster criterion, see BASELINE.md) and prints both
throughputs + scaling efficiency.

Env knobs: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32), DPR_BENCH_ONLY=headline (skip the sf-dir query suite),
DPR_BENCH_V (bench graph vertices, default 1,000,000).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def run_bench() -> dict:
    import ray
    import ray.data

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only_headline = os.environ.get("DPR_BENCH_ONLY", "") == "headline"

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from distributed_pagerank_ray.config import PageRankConfig
    from distributed_pagerank_ray.pipelines.graphbuild import GraphTables, build_graph_dense
    from distributed_pagerank_ray.pipelines.pagerank import pagerank
    from distributed_pagerank_ray.sources.synth import bench_graph_dir

    queries: dict[str, float] = {}

    # ---- headline: synthetic bench graph, 5 fixed power iterations -------
    V = int(os.environ.get("DPR_BENCH_V", "1000000"))
    gdir, _ = bench_graph_dir(V)
    build_root = os.path.join(gdir, "graph_run")
    edges_ds = ray.data.read_parquet(os.path.join(gdir, "edges"))
    g_cached = build_graph_dense(edges_ds, V, build_root)

    # fresh iteration state, shared (cached) graph artifacts
    run_dir = tempfile.mkdtemp(prefix="dpr_bench_run_")
    os.symlink(os.path.join(build_root, "graph"), os.path.join(run_dir, "graph"))
    g = GraphTables(
        run_dir, g_cached.n, g_cached.m, g_cached.m_lines, g_cached.shard_rows, g_cached.semantics
    )
    g.edges().count()  # warm the page cache (measure compute+shuffle, not cold disk)

    iters = 5
    pr_sec, res = _timed(
        lambda: pagerank(g, PageRankConfig(threshold=0.0, max_iters=iters, normalize=False))
    )
    queries["pagerank_bench_5it"] = round(pr_sec, 3)
    edges_per_sec_per_iter = g.m * res.iterations / pr_sec / res.iterations

    result = {
        "metric": "pagerank_5iter_sec_v1m",
        "value": round(pr_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "bench_graph": {"n_vertices": g.n, "n_edges": g.m},
        "edges_per_sec_per_iter": round(edges_per_sec_per_iter, 0),
    }
    if only_headline:
        ray.shutdown()
        return result

    # ---- corpus pipeline: extract → graph → pagerank ---------------------
    from distributed_pagerank_ray.config import RunConfig
    from distributed_pagerank_ray.pipelines.graphbuild import build_graph
    from distributed_pagerank_ray.sources.corpus import corpus_dir
    from distributed_pagerank_ray.stages.extract import extract_links

    cdir = corpus_dir("medium")  # 200k pages, cached
    t, n_links = _timed(
        lambda: extract_links(
            ray.data.read_parquet(f"{cdir}/pages.parquet", columns=["url", "html"]),
            concurrency=max(2, ncpu // 2),
        ).count()
    )
    queries["extract_links_200k_pages"] = round(t, 3)

    def corpus_e2e():
        rd = tempfile.mkdtemp(prefix="dpr_corpus_e2e_")
        small = corpus_dir("small")
        links = extract_links(
            ray.data.read_parquet(f"{small}/pages.parquet", columns=["url", "html"]),
            concurrency=max(2, ncpu // 4),
        ).select_columns(["src_url", "dst_url"])
        gg = build_graph(links, rd, run_cfg=RunConfig(num_partitions=8))
        return pagerank(gg, PageRankConfig(threshold=1e-6))

    t, res2 = _timed(corpus_e2e)
    queries["corpus_e2e_5k_pages"] = round(t, 3)

    # ---- driver-table queries -------------------------------------------
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in [
        "r_q1_pricing",
        "r_q3_top_orders",
        "r_events_hourly",
        "t_exact_dedup",
        "t_ngram_dup_pairs",
        "e_knn",
        "g_out_degree",
        "g_triangles_parts",
    ]:
        def run(n=name):
            ds = qs[n](sf_dir)
            import ray.data as rdm

            return ds.count() if isinstance(ds, rdm.Dataset) else len(ds)

        t, _ = _timed(run)
        queries[name] = round(t, 3)

    ray.shutdown()
    return result


def run_scaling() -> dict:
    out = {}
    for ncpu in (8, 32):
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), DPR_BENCH_ONLY="headline"
        )
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        out[ncpu] = json.loads(p.stdout.strip().splitlines()[-1])
    t8, t32 = out[8]["value"], out[32]["value"]
    tput8 = out[8]["edges_per_sec_per_iter"]
    tput32 = out[32]["edges_per_sec_per_iter"]
    eff = (tput32 / tput8) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "sec_8": t8,
        "sec_32": t32,
        "edges_per_sec_per_iter_8": tput8,
        "edges_per_sec_per_iter_32": tput32,
        "scaling_efficiency": round(eff, 3),
        "bench_graph": out[32]["bench_graph"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
