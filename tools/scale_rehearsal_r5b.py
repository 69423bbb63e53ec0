"""Scale rehearsal for the LATE round-5 batch-2 families: push-PPR,
interval-union coverage, the mergeable ε-quantile summary, rich-club
coefficients, and Jaro-Winkler verify throughput — each on a
deterministic synthetic input far above the gate scales, with wall
time and peak system memory recorded for BASELINE.md.

Inputs (generated under /tmp, deleted unless --keep):
- ppr_push: digraph V=2M, 3 affine out-edges/vertex (6M arcs), seed 0,
  ε=1e-6 — rounds are bounded by the push-drain geometry, not V.
- interval_cover: 20M events over 1M users (the hash-bucketed ordered
  plan; shifted-timeline running max per bucket).
- quantile_sketch: 50M skewed doubles (ties + heavy tail), δ=0.01 —
  one sketch pass + one exact-rank verify pass.
- rich_club: the same V=1M/6M graph through two degree joins + the
  threshold fold.
- jaro_winkler: 200k pairs × 40 chars, single-process (the stage is
  embarrassingly parallel; per-core throughput × cores is the model).

Usage: python tools/scale_rehearsal_r5b.py [--keep]
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

ROOT = "/tmp/dpr_rehearsal_r5b"


def _gen_graph(path: str, v: int, fanout: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    chunk = 1 << 20
    for ci, lo in enumerate(range(0, v, chunk)):
        i = np.arange(lo, min(lo + chunk, v), dtype=np.int64)
        srcs = np.concatenate([i] * fanout)
        dsts = np.concatenate(
            [((48271 * i + 7 + 1013 * k) % v) for k in range(fanout)]
        )
        keep = srcs != dsts
        pq.write_table(
            pa.table({"src": pa.array(srcs[keep]), "dst": pa.array(dsts[keep])}),
            f"{path}/part-{ci:04d}.parquet",
        )


def _gen_events(path: str, rows: int, users: int) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    chunk = 1 << 21
    for ci, lo in enumerate(range(0, rows, chunk)):
        i = np.arange(lo, min(lo + chunk, rows), dtype=np.int64)
        t = pa.table(
            {
                "event_id": pa.array(i),
                "user_id": pa.array((48271 * i + 11) % users),
                "ts": pa.array(
                    pd.to_datetime(((16807 * i) % 2_000_000) * 1_000_000, unit="us")
                ),
            }
        )
        pq.write_table(t, f"{path}/part-{ci:04d}.parquet")


def _gen_values(path: str, rows: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    chunk = 1 << 21
    for ci, lo in enumerate(range(0, rows, chunk)):
        i = np.arange(lo, min(lo + chunk, rows), dtype=np.int64)
        h = (48271 * i + 3) % 1_000_003
        # heavy ties at 0 (~20%) + affine body + a 1/1000 heavy tail
        v = np.where(h % 5 == 0, 0.0, h.astype(np.float64) / 1000.0)
        v = np.where(h % 1000 == 7, v * 5000.0, v)
        pq.write_table(pa.table({"v": pa.array(v)}), f"{path}/part-{ci:04d}.parquet")


def main() -> None:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
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
    V, EV_ROWS, Q_ROWS, USERS = 2_000_000, 20_000_000, 50_000_000, 1_000_000
    t0 = time.time()
    for name, gen in (
        ("graph", lambda: _gen_graph(f"{ROOT}/graph", V, 3)),
        ("events", lambda: _gen_events(f"{ROOT}/events.parquet", EV_ROWS, USERS)),
        ("values", lambda: _gen_values(f"{ROOT}/values", Q_ROWS)),
    ):
        if not os.path.exists(f"{ROOT}/{name}.done"):
            gen()
            open(f"{ROOT}/{name}.done", "w").close()
    out: dict = {
        "metric": "scale_rehearsal_r5b_families",
        "num_cpus": ncpu,
        "gen_sec": round(time.time() - t0, 1),
    }

    # ---- push-PPR -----------------------------------------------------------
    import tempfile

    from distributed_pagerank_ray.config import RunConfig
    from distributed_pagerank_ray.pipelines.graphbuild import build_graph
    from distributed_pagerank_ray.pipelines.pprpush import ppr_push

    t0 = time.time()
    g = build_graph(
        ray.data.read_parquet(f"{ROOT}/graph"),
        tempfile.mkdtemp(prefix="dpr_r5b_ppr_"),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=16, shard_rows=1 << 18),
    )
    out["ppr_build_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    res = ppr_push(g, seed=0, alpha=0.15, eps=1e-6, max_rounds=200)
    out["ppr_push_v2m_sec"] = round(time.time() - t0, 1)
    out["ppr_rounds"] = res.rounds
    out["ppr_touched"] = int(
        res.estimates()
        .map_batches(
            lambda t: pa.table(
                {"c": pa.array([int((t.column("p").to_numpy(zero_copy_only=False) > 0).sum())])}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["c"]
        .sum()
    )
    assert res.mass_ok and res.res_ok

    # ---- interval cover ------------------------------------------------------
    from distributed_pagerank_ray.pipelines.relational import interval_cover

    t0 = time.time()
    n_users = interval_cover(ROOT, num_buckets=None).count()  # reads events.parquet/
    out["interval_cover_20m_sec"] = round(time.time() - t0, 1)
    assert n_users == USERS, n_users

    # ---- quantile sketch ------------------------------------------------------
    from distributed_pagerank_ray.functions.sketches import quantile_sketch

    t0 = time.time()
    qres = quantile_sketch(
        ray.data.read_parquet(f"{ROOT}/values"), "v", delta=0.01
    ).to_pandas()
    out["quantile_sketch_50m_sec"] = round(time.time() - t0, 1)
    assert (qres["rank_err_ok"] == 1).all() and int(qres["n"].iloc[0]) == Q_ROWS

    # ---- rich club -------------------------------------------------------------
    from distributed_pagerank_ray.pipelines.metrics import rich_club

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    from distributed_pagerank_ray.util import distinct_i64_pairs

    t0 = time.time()
    und = distinct_i64_pairs(
        ray.data.read_parquet(f"{ROOT}/graph").map_batches(canon, batch_format="pyarrow"),
        "a",
        "b",
        num_shards=16,
    )
    rc = rich_club(und, ks=(2, 4, 8), num_partitions=16, num_shards=16).to_pandas()
    out["rich_club_v1m_sec"] = round(time.time() - t0, 1)
    out["rich_club_rows"] = len(rc)

    # ---- jaro-winkler throughput (single process) -------------------------------
    from distributed_pagerank_ray.functions.editdist import jaro_winkler_bytes

    rng = np.random.default_rng(0)
    letters = np.array(list("abcdefghijklmnop"), dtype=object)
    a = ["".join(rng.choice(letters, 40)) for _ in range(200_000)]
    b = [s[:20] + "".join(rng.choice(letters, 20)) for s in a]
    t0 = time.time()
    jw = jaro_winkler_bytes(a, b, prefix_chars=40)
    dt = time.time() - t0
    out["jw_pairs_per_sec_core"] = int(200_000 / dt)
    assert len(jw) == 200_000

    out["peak_mem_gib"] = mem.stop()
    print(json.dumps(out))
    if "--keep" not in sys.argv:
        shutil.rmtree(ROOT, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
