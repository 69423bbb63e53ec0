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


def generate_edges(
    n_vertices: int,
    avg_extra_deg: float = 18.0,
    zipf_a: float = 1.7,
    seed: int = 42,
    chunk: int = 4_000_000,
):
    """Yield (src, dst) int64 array chunks; E ≈ n * (avg_extra_deg-ish + 1)."""
    rng = np.random.default_rng(seed)
    cap = max(2, int(avg_extra_deg * 6))
    for lo in range(0, n_vertices, chunk):
        hi = min(n_vertices, lo + chunk)
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
        yield np.concatenate([src, chain_src]), np.concatenate([dst, chain_dst])


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
    total = 0
    for i, (src, dst) in enumerate(generate_edges(n_vertices, avg_extra_deg, seed=seed)):
        order = np.argsort(src, kind="stable")
        t = pa.table({"src": pa.array(src[order]), "dst": pa.array(dst[order])})
        pq.write_table(t, os.path.join(edir, f"part-{i:05d}.parquet"), row_group_size=1 << 20)
        total += len(src)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.replace(tmp, out)
    with open(meta_p, "w") as fh:
        json.dump({"n_vertices": n_vertices, "n_edges": total, "seed": seed}, fh)
    return out, total
