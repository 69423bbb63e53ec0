"""Scale rehearsal: one headline PageRank run at 8x the bench size
(V=64M, E≈1B) on 32 CPUs, with ``shard_rows`` raised per the layout
note (pagerank.py docstring: keep S bounded by growing shards with n —
1<<22 rows = 32 MiB/shard -> S=16 at V=64M).

Records gen/build/iteration wall times, edges/sec/iteration, and peak
system memory (sampled from /proc/meminfo), for both the flat fan-in
and the tree combine (combine_fanin=32), into one JSON line — the
written datapoint for BASELINE.md that the knobs, not luck, carry an
8x size step.

Usage: python tools/scale_rehearsal.py [--keep] [--v N]
(--keep leaves the generated edge table cached in /tmp/dpr_bench).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class MemPeak(threading.Thread):
    """Samples system-wide used memory (MemTotal - MemAvailable) once a
    second; the peak approximates driver + workers + object store."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak_gb = 0.0
        self._stop = threading.Event()

    @staticmethod
    def _used_gb() -> float:
        info = {}
        with open("/proc/meminfo") as fh:
            for line in fh:
                k, v = line.split(":", 1)
                info[k] = int(v.strip().split()[0])
        return (info["MemTotal"] - info["MemAvailable"]) / (1 << 20)

    def run(self):
        while not self._stop.is_set():
            self.peak_gb = max(self.peak_gb, self._used_gb())
            time.sleep(1)

    def stop(self) -> float:
        self._stop.set()
        return round(self.peak_gb, 2)


def main() -> None:
    V = int(sys.argv[sys.argv.index("--v") + 1]) if "--v" in sys.argv else 64_000_000
    keep = "--keep" in sys.argv
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)

    import ray

    if not ray.is_initialized():
        # An explicit 64 GiB object store (/dev/shm is 126 GiB here):
        # the default 37 GiB store forces ~45 GB of disk spill at this
        # size, and this host's filesystem over-reports its capacity to
        # Ray's 95%-full monitor (252 GB claimed, ~93 GB real), so heavy
        # spilling aborts with OutOfDiskError instead of degrading.
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            logging_level="ERROR",
            object_store_memory=64 * (1 << 30),
        )
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from distributed_pagerank_ray.config import PageRankConfig, RunConfig
    from distributed_pagerank_ray.pipelines.graphbuild import GraphTables, build_graph_dense
    from distributed_pagerank_ray.pipelines.pagerank import pagerank
    from distributed_pagerank_ray.sources.synth import bench_graph_dir

    mem = MemPeak()
    mem.start()

    t0 = time.time()
    gdir, n_edges = bench_graph_dir(V, avg_extra_deg=15.0)
    gen_sec = time.time() - t0

    run_cfg = RunConfig(shard_rows=1 << 22)  # 32 MiB/shard -> S = V / 4M
    build_root = os.path.join(gdir, "graph_run")
    t0 = time.time()
    g_cached = build_graph_dense(
        ray.data.read_parquet(os.path.join(gdir, "edges")), V, build_root, run_cfg=run_cfg
    )
    build_sec = time.time() - t0

    iters = 3

    def one(tag: str, fanin: int):
        """Total wall + summed per-iteration wall (bench.py's protocol:
        iter wall includes the durable per-iteration checkpoint write,
        same as the sf0.1 headline numbers)."""
        rd = tempfile.mkdtemp(prefix=f"dpr_rehearsal_{tag}_")
        os.symlink(os.path.join(build_root, "graph"), os.path.join(rd, "graph"))
        gm = GraphTables(
            rd, g_cached.n, g_cached.m, g_cached.m_lines, g_cached.shard_rows,
            g_cached.semantics,
        )
        cfg = RunConfig(shard_rows=1 << 22, combine_fanin=fanin)
        t0 = time.time()
        res = pagerank(
            gm, PageRankConfig(threshold=0.0, max_iters=iters, normalize=False), cfg
        )
        total = time.time() - t0
        isec = 0.0
        for kk in range(1, res.iterations + 1):
            with open(os.path.join(rd, f"iter_{kk:04d}", "metrics.json")) as fh:
                isec += json.load(fh)["wall_sec"]
        shutil.rmtree(rd, ignore_errors=True)
        return total, isec

    one("warm", 0)  # warm-up: worker spin-up + object-store placement
    flat_total, flat = one("flat", 0)
    tree_total, tree = one("tree", 32)
    peak = mem.stop()

    eps_flat = g_cached.m * iters / flat
    eps_tree = g_cached.m * iters / tree
    out = {
        "metric": "scale_rehearsal_pagerank",
        "n_vertices": g_cached.n,
        "n_edges": g_cached.m,
        "num_cpus": ncpu,
        "shard_rows": 1 << 22,
        "n_shards": (g_cached.n + (1 << 22) - 1) // (1 << 22),
        "gen_sec": round(gen_sec, 1),
        "build_sec": round(build_sec, 1),
        "flat_3it_iter_sec": round(flat, 1),
        "flat_3it_total_sec": round(flat_total, 1),
        "tree_fanin32_3it_iter_sec": round(tree, 1),
        "tree_fanin32_3it_total_sec": round(tree_total, 1),
        "edges_per_sec_per_iter_flat": round(eps_flat, 0),
        "edges_per_sec_per_iter_tree": round(eps_tree, 0),
        "peak_system_mem_gb": peak,
    }
    print(json.dumps(out))
    ray.shutdown()
    if not keep:
        shutil.rmtree(gdir, ignore_errors=True)


if __name__ == "__main__":
    main()
