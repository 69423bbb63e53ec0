"""8x scale rehearsal for the round-4/5 operator families (VERDICT r4
#10): adamic-adar, bigram surprisal, user journeys / moving average,
and the fused-exchange SCC, each on a deterministic synthetic input far
above the gate scales, with wall time and peak system memory recorded —
the written datapoint for BASELINE.md that these shapes carry a size
step without driver-side materialization.

Inputs (all generated under /tmp, deleted unless --keep):
- adamic_adar: undirected graph V=2M, ~4 edges/vertex (8M edges);
  bounded degrees by construction, so the wedge stream is linear-ish.
- bigram_surprisal: 40k documents x ~200 Zipf-vocab words (8x the
  sf0.1 documents table in rows, ~20x in tokens).
- user_journeys + events_moving_avg: one 20M-row events table
  (200x sf0.1) through the size-derived bucket default.
- scc: digraph V=2M with ring-of-rings structure (nontrivial SCCs and
  a DAG condensation), ~4 edges/vertex.

Usage: python tools/scale_rehearsal_r4.py [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scale_rehearsal import MemPeak  # noqa: E402  (same tools dir)

ROOT = "/tmp/dpr_rehearsal_r4"


def _gen_graph(path: str, v: int, deg: int, cyclic: bool) -> None:
    """Deterministic edge table: vertex i -> (a_j * i + b_j) mod v for
    deg hash-style out-edges; with ``cyclic`` every vertex also links
    i -> (i + 1) mod (its 8-ring), giving ~v/8 nontrivial SCCs whose
    inner diameter stays small (min-prop is O(diameter) sync steps)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    coef = [(48271, 7), (16807, 11), (69621, 13), (40692, 17)][:deg]
    chunk = 1 << 20
    for ci, lo in enumerate(range(0, v, chunk)):
        i = np.arange(lo, min(lo + chunk, v), dtype=np.int64)
        srcs, dsts = [], []
        for a, b in coef:
            srcs.append(i)
            dsts.append((a * i + b) % v)
        if cyclic:
            ring = (i // 8) * 8
            srcs.append(i)
            dsts.append(ring + (i - ring + 1) % 8)
        t = pa.table(
            {
                "src": pa.array(np.concatenate(srcs)),
                "dst": pa.array(np.concatenate(dsts)),
            }
        )
        pq.write_table(t, os.path.join(path, f"part_{ci:04d}.parquet"))


def _gen_docs(path: str, n_docs: int, words_per_doc: int) -> None:
    """Zipf-vocab documents, vectorized generation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(7)
    vocab = np.array([f"w{k}" for k in range(20_000)], dtype=object)
    chunk = 4000
    for ci, lo in enumerate(range(0, n_docs, chunk)):
        hi = min(lo + chunk, n_docs)
        ids = np.arange(lo, hi, dtype=np.int64)
        z = rng.zipf(1.3, size=(hi - lo, words_per_doc)) % len(vocab)
        texts = [" ".join(vocab[row]) for row in z]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}),
            os.path.join(path, f"part_{ci:04d}.parquet"),
        )


def _gen_events(path: str, n: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(11)
    chunk = 1 << 21
    types = np.array(["view", "click", "cart", "buy", "search"], dtype=object)
    for ci, lo in enumerate(range(0, n, chunk)):
        hi = min(lo + chunk, n)
        m = hi - lo
        t = pa.table(
            {
                "event_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "user_id": pa.array(rng.integers(0, n // 20, m)),
                "ts": pa.array(
                    np.datetime64("2025-01-01", "us")
                    + rng.integers(0, 90 * 86400 * 10**6, m).astype("timedelta64[us]")
                ),
                "event_type": pa.array(types[rng.integers(0, 5, m)]),
                "value": pa.array(rng.random(m) * 100),
            }
        )
        pq.write_table(t, os.path.join(path, f"part_{ci:04d}.parquet"))


def main() -> None:
    keep = "--keep" in sys.argv
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)

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
    gen = {}
    t0 = time.time()
    if not os.path.exists(f"{ROOT}/aa_edges.done"):
        _gen_graph(f"{ROOT}/aa_edges", 2_000_000, 4, cyclic=False)
        open(f"{ROOT}/aa_edges.done", "w").close()
    if not os.path.exists(f"{ROOT}/scc_edges.done"):
        _gen_graph(f"{ROOT}/scc_edges", 2_000_000, 3, cyclic=True)
        open(f"{ROOT}/scc_edges.done", "w").close()
    if not os.path.exists(f"{ROOT}/docs.done"):
        _gen_docs(f"{ROOT}/docs", 40_000, 200)
        open(f"{ROOT}/docs.done", "w").close()
    if not os.path.exists(f"{ROOT}/events.done"):
        _gen_events(f"{ROOT}/sf/events.parquet", 20_000_000)
        open(f"{ROOT}/events.done", "w").close()
    gen["gen_sec"] = round(time.time() - t0, 1)

    out: dict = {"metric": "scale_rehearsal_r4_families", "num_cpus": ncpu, **gen}

    # ---- adamic-adar: undirected distinct (a<b) edges --------------------
    import pyarrow as pa

    def und(t: pa.Table) -> pa.Table:
        import numpy as np

        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        m = s != d
        a = np.minimum(s[m], d[m])
        b = np.maximum(s[m], d[m])
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    from distributed_pagerank_ray.pipelines.metrics import adamic_adar_scores
    from distributed_pagerank_ray.util import distinct_i64_pairs

    t0 = time.time()
    e = distinct_i64_pairs(
        ray.data.read_parquet(f"{ROOT}/aa_edges").map_batches(und, batch_format="pyarrow"),
        "a",
        "b",
        num_shards=16,
    ).materialize()
    n_edges = e.count()
    top = adamic_adar_scores(e, k=20, num_partitions=8, num_shards=16).to_pandas()
    out["adamic_adar"] = {
        "n_edges": n_edges,
        "wall_sec": round(time.time() - t0, 1),
        "rows": len(top),
    }

    # ---- bigram surprisal -------------------------------------------------
    from distributed_pagerank_ray.functions.textstats import bigram_surprisal

    t0 = time.time()
    n_rows = bigram_surprisal(ray.data.read_parquet(f"{ROOT}/docs")).count()
    out["bigram_surprisal"] = {
        "n_docs": n_rows,
        "wall_sec": round(time.time() - t0, 1),
    }

    # ---- ordered-window family over 20M events ---------------------------
    from distributed_pagerank_ray.pipelines.relational import (
        _derived_buckets,
        events_moving_avg,
        user_journeys,
    )

    ev = ray.data.read_parquet(f"{ROOT}/sf/events.parquet")
    buckets = _derived_buckets(ev, None)
    t0 = time.time()
    nj = user_journeys(f"{ROOT}/sf").count()
    tj = round(time.time() - t0, 1)
    t0 = time.time()
    nm = events_moving_avg(f"{ROOT}/sf").count()
    tm = round(time.time() - t0, 1)
    out["user_journeys"] = {"n_users": nj, "wall_sec": tj, "num_buckets": buckets}
    out["events_moving_avg"] = {"n_events": nm, "wall_sec": tm, "num_buckets": buckets}

    # ---- SCC ---------------------------------------------------------------
    from distributed_pagerank_ray.pipelines import scc as scc_mod

    t0 = time.time()
    labels = scc_mod.strongly_connected_components(
        ray.data.read_parquet(f"{ROOT}/scc_edges"),
        num_partitions=8,
        num_shards=8,
        max_iters=2000,
    )
    n_labeled = labels.count()
    out["scc"] = {
        "n_vertices": n_labeled,
        "wall_sec": round(time.time() - t0, 1),
        **scc_mod.LAST_STATS,
    }

    out["peak_system_mem_gb"] = mem.stop()
    print(json.dumps(out))
    ray.shutdown()
    if not keep:
        shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
