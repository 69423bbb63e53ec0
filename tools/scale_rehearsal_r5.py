"""Scale rehearsal for the late-round-5 operator families: DAG
longest-path depth, Luby MIS, byte-Levenshtein verify throughput, and
the winsorized-aggregate pass, each on a deterministic synthetic input
far above the gate scales (gates run at 500 planted vertices; these
run at V=4M / V=1M / 200k pairs / 20M rows), with wall time and peak
system memory recorded — the written datapoint for BASELINE.md that
these shapes carry a size step without driver-side materialization.

Inputs (generated under /tmp, deleted unless --keep):
- dagdepth: 16-layer layered DAG V=4M (layer = id mod 16, two affine
  next-layer targets per vertex, ~7.5M edges, depth <= 15) — rounds
  are bounded by DEPTH, not V, which is the property being rehearsed.
- mis: digraph V=1M, 3 affine out-edges/vertex (6M arcs after
  symmetrize); expected O(log V) Luby rounds.
- editdist: 200k pairs of 40-char strings through the vectorized DP
  (single-process numpy measure: the stage is embarrassingly parallel,
  so per-core throughput x cores is the cluster model).
- winsorize: 20M synthetic prices through the exact-histogram bound
  pass + clamp/sum pass.

Usage: python tools/scale_rehearsal_r5.py [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_rehearsal import MemPeak  # noqa: E402  (same tools dir)

ROOT = "/tmp/dpr_rehearsal_r5"


def _gen_layered_dag(path: str, v: int, layers: int) -> None:
    """vertex i in layer i%layers; two affine targets in layer+1."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    assert v % layers == 0
    m = v // layers
    os.makedirs(path, exist_ok=True)
    chunk = 1 << 20
    for ci, lo in enumerate(range(0, v, chunk)):
        i = np.arange(lo, min(lo + chunk, v), dtype=np.int64)
        k = i % layers
        sel = k < layers - 1
        i1, k1 = i[sel], k[sel]
        d1 = ((48271 * i1 + 7) % m) * layers + (k1 + 1)
        d2 = ((16807 * i1 + 11) % m) * layers + (k1 + 1)
        t = pa.table(
            {
                "src": pa.array(np.concatenate([i1, i1])),
                "dst": pa.array(np.concatenate([d1, d2])),
            }
        )
        pq.write_table(t, os.path.join(path, f"part_{ci:04d}.parquet"))


def _gen_graph(path: str, v: int, deg: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    coef = [(48271, 7), (16807, 11), (69621, 13)][:deg]
    chunk = 1 << 20
    for ci, lo in enumerate(range(0, v, chunk)):
        i = np.arange(lo, min(lo + chunk, v), dtype=np.int64)
        srcs = np.concatenate([i for _ in coef])
        dsts = np.concatenate([(a * i + b) % v for a, b in coef])
        pq.write_table(
            pa.table({"src": pa.array(srcs), "dst": pa.array(dsts)}),
            os.path.join(path, f"part_{ci:04d}.parquet"),
        )


def main() -> None:
    keep = "--keep" in sys.argv
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    os.makedirs(ROOT, exist_ok=True)
    mem = MemPeak()
    mem.start()
    V_DAG, LAYERS = 4_000_000, 16
    V_MIS = 1_000_000
    t0 = time.time()
    if not os.path.exists(f"{ROOT}/dag.done"):
        _gen_layered_dag(f"{ROOT}/dag", V_DAG, LAYERS)
        open(f"{ROOT}/dag.done", "w").close()
    if not os.path.exists(f"{ROOT}/mis.done"):
        _gen_graph(f"{ROOT}/mis", V_MIS, 3)
        open(f"{ROOT}/mis.done", "w").close()
    out: dict = {
        "metric": "scale_rehearsal_r5_families",
        "num_cpus": ncpu,
        "gen_sec": round(time.time() - t0, 1),
    }

    def verts(n):
        return ray.data.range(n).map_batches(
            lambda t: pa.table({"v": t.column("id").cast(pa.int64())}),
            batch_format="pyarrow",
        )

    # ---- DAG longest path -------------------------------------------------
    import distributed_pagerank_ray.pipelines.dagdepth as dd
    from distributed_pagerank_ray.pipelines.dagdepth import dag_longest_path

    t0 = time.time()
    res = dag_longest_path(
        ray.data.read_parquet(f"{ROOT}/dag"),
        verts(V_DAG),
        num_partitions=16,
        num_shards=16,
        max_rounds=24,
    )
    n_rows = res.count()
    out["dagdepth_v4m_sec"] = round(time.time() - t0, 1)
    out["dagdepth_rounds"] = dd.LAST_STATS["rounds"]
    assert n_rows == V_DAG, n_rows

    # ---- Luby MIS ----------------------------------------------------------
    import distributed_pagerank_ray.pipelines.mis as mm
    from distributed_pagerank_ray.pipelines.mis import mis_luby

    t0 = time.time()
    mis = mis_luby(
        ray.data.read_parquet(f"{ROOT}/mis"),
        verts(V_MIS),
        num_partitions=16,
        num_shards=16,
        max_rounds=64,
    )
    out["mis_size_v1m"] = mis.count()
    out["mis_v1m_sec"] = round(time.time() - t0, 1)
    out["mis_rounds"] = mm.LAST_STATS["rounds"]

    # ---- editdist vectorized throughput (single process) -------------------
    from distributed_pagerank_ray.functions.editdist import levenshtein_bytes

    rng = np.random.default_rng(5)
    letters = np.array(list("abcdefgh "), dtype="U1")
    a = ["".join(rng.choice(letters, 40)) for _ in range(200_000)]
    b = ["".join(rng.choice(letters, 40)) for _ in range(200_000)]
    t0 = time.time()
    d = levenshtein_bytes(a, b, prefix_chars=40)
    dt = time.time() - t0
    out["editdist_pairs_per_sec_1core"] = int(200_000 / dt)
    assert int(d.min()) >= 0

    # ---- winsorize at 20M rows ---------------------------------------------
    from ray.data.aggregate import Sum

    from distributed_pagerank_ray.functions.quantiles import grouped_discrete_quantiles

    def synth_prices(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        cents = (ids * 48271 + 7) % 1_000_000  # 10k-dollar range
        return pa.table(
            {
                "f": pa.array((ids % 3).astype(np.int64)),
                "cents": pa.array(cents.astype(np.int64)),
                "g": pa.array(np.zeros(len(ids), np.int64)),
            }
        )

    t0 = time.time()
    cds = (
        ray.data.range(20_000_000)
        .map_batches(synth_prices, batch_format="pyarrow")
        .materialize()
    )
    q = grouped_discrete_quantiles(
        cds, "g", "cents", qs=(0.01, 0.99), q_names=("lo", "hi"), int_bsp=True
    ).to_pandas()
    lo, hi = int(q["lo"].iloc[0]), int(q["hi"].iloc[0])

    def clamp(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        f = t.column("f").to_numpy(zero_copy_only=False)
        import pandas as pd

        g = (
            pd.DataFrame({"f": f, "w": np.clip(c, lo, hi)})
            .groupby("f", sort=False)["w"]
            .agg(["size", "sum"])
            .reset_index()
        )
        return pa.table(
            {
                "f": pa.array(g["f"].to_numpy(dtype=np.int64)),
                "n": pa.array(g["size"].to_numpy(dtype=np.int64)),
                "s": pa.array(g["sum"].to_numpy(dtype=np.int64)),
            }
        )

    agg = (
        cds.map_batches(clamp, batch_format="pyarrow")
        .groupby("f")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .to_pandas()
    )
    assert int(agg["n"].sum()) == 20_000_000
    out["winsorize_20m_sec"] = round(time.time() - t0, 1)

    out["peak_mem_gb"] = mem.stop()
    print(json.dumps(out))
    if not keep:
        shutil.rmtree(ROOT, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
