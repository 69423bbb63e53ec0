"""Deterministic synthetic edge-table generator for benchmarks.

Mirrors the reference's random-graph generator semantics at scale
(reference: pkg/graph/graph.go:101-166 — per-vertex random out-links,
self-loops excluded, connectivity chain i-1 → i) but seeded and
vectorized: Zipf out-degrees (hub skew), uniform destinations, written
as multi-row-group Parquet so ray.data.read_parquet parallelizes.
Vertex ids are dense 0..n-1 by construction.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


CHUNK = 2_000_000  # fixed: per-chunk rng seeds make content chunk-stable


def _gen_chunk(lo: int, n_vertices: int, avg_extra_deg: float, zipf_a: float, seed: int):
    """One chunk's edges — rng seeded per (seed, lo), so the dataset is
    a pure function of the parameters regardless of generation order or
    parallelism."""
    hi = min(n_vertices, lo + CHUNK)
    rng = np.random.default_rng((seed, lo))
    cap = max(2, int(avg_extra_deg * 6))
    n = hi - lo
    deg = np.minimum(rng.zipf(zipf_a, size=n), cap).astype(np.int64)
    # rescale zipf mean toward avg_extra_deg deterministically
    scale = max(1, int(round(avg_extra_deg / max(1.0, deg.mean()))))
    deg = np.minimum(deg * scale, cap)
    src = np.repeat(np.arange(lo, hi, dtype=np.int64), deg)
    dst = rng.integers(0, n_vertices - 1, size=len(src), dtype=np.int64)
    dst[dst >= src] += 1  # uniform over [0, n) \ {src} (graph.go:110-112)
    dst[dst >= n_vertices] = 0
    # connectivity chain (graph.go:129-138)
    chain_src = np.arange(max(lo, 1) - 1, hi - 1, dtype=np.int64)
    chain_dst = chain_src + 1
    src = np.concatenate([src, chain_src])
    dst = np.concatenate([dst, chain_dst])
    order = np.argsort(src, kind="stable")
    return src[order], dst[order]


def generate_edges(
    n_vertices: int,
    avg_extra_deg: float = 18.0,
    zipf_a: float = 1.7,
    seed: int = 42,
    chunk: int = CHUNK,
):
    """Yield (src, dst) int64 sorted array chunks; E ≈ n * (deg + 1)."""
    for lo in range(0, n_vertices, CHUNK):
        yield _gen_chunk(lo, n_vertices, avg_extra_deg, zipf_a, seed)


def bench_graph_dir(
    n_vertices: int, avg_extra_deg: float = 18.0, seed: int = 42, root: str = "/tmp/dpr_bench"
) -> tuple[str, int]:
    """Write (once, cached) the bench edge table; return (dir, n_edges).

    Layout: {root}/v{n}_d{deg}_s{seed}/edges/part-*.parquet, sorted by
    src within and across files (generated in src order), plus meta.
    """
    key = f"v{n_vertices}_d{int(avg_extra_deg)}_s{seed}"
    out = os.path.join(root, key)
    meta_p = os.path.join(out, "meta.json")
    if os.path.exists(meta_p):
        with open(meta_p) as fh:
            return out, json.load(fh)["n_edges"]
    tmp = out + ".tmp"
    edir = os.path.join(tmp, "edges")
    os.makedirs(edir, exist_ok=True)

    def _write_chunk(i: int, lo: int) -> int:
        src, dst = _gen_chunk(lo, n_vertices, avg_extra_deg, 1.7, seed)
        t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        pq.write_table(t, os.path.join(edir, f"part-{i:05d}.parquet"), row_group_size=1 << 20)
        return len(src)

    los = list(range(0, n_vertices, CHUNK))
    try:  # parallelize generation when a Ray session is up (chunk rngs
        # are independent, so parallel == sequential content)
        import ray

        if ray.is_initialized():
            f = ray.remote(_write_chunk)
            total = int(sum(ray.get([f.remote(i, lo) for i, lo in enumerate(los)])))
        else:
            raise RuntimeError("no ray")
    except Exception:
        total = sum(_write_chunk(i, lo) for i, lo in enumerate(los))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.replace(tmp, out)
    with open(meta_p, "w") as fh:
        json.dump({"n_vertices": n_vertices, "n_edges": total, "seed": seed}, fh)
    return out, total
