"""Deterministic random-walk sampling over the edge table.

Node2vec/DeepWalk-style walk-corpus generation — the input stage for
graph-embedding trainers — expressed Ray-Data-first. The reference
engine has no sampling surface at all (its only traversal is the
PageRank power iteration, SURVEY §2.2); walks are the missing piece a
link-graph engine needs to feed representation learning at 100 TB.

Determinism contract: the "random" next-hop choice is the neighbor
minimizing a QUADRATIC integer hash of (cur, dst, step)

    x = (cur*131 + dst*977 + step*7 + 1) % 100000007
    h = (x² + 48271·x) % 100000007        (ties → smaller dst)

— a pure int64 formula, so the walk corpus is reproducible across
runs, resumes and engines, and a SQL oracle can replay it join-by-join
(no RNG state to replicate; same reasoning as ``similarity.sign_matrix``:
the square breaks the affine lattice correlations an LCG would have).

Scale shape, per step:
- ONE hash join frontier×edges on the current vertex (both sides
  co-partitioned by the key — the partitioning the whole engine reuses),
- vectorized hash + per-batch pre-argmin, so the argmin shuffle moves
  at most (distinct walks per batch × blocks) candidate rows, never the
  V × avg_degree joined table,
- a (walk → min packed) groupby whose groups shrink to one row each.
Frontier and output are O(V · L); dead-end walks simply stop (inner
join drops them — documented, matches the oracle's inner join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from ..util import compact_for_join, count_i64_keys, ensure_schema

_I64 = pa.int64()
_M = 100_000_007
_SHIFT = 1 << 31
_MASK = _SHIFT - 1


def step_hash(cur: np.ndarray, dst: np.ndarray, step: int) -> np.ndarray:
    """The walk's next-hop priority (lower wins). int64-exact for
    cur, dst < 2^31 and any step < 2^31."""
    x = (cur * 131 + dst * 977 + np.int64(step) * 7 + 1) % _M
    return (x * x + x * 48271) % _M


def random_walks(
    edges: "ray.data.Dataset",
    length: int = 3,
    num_partitions: int = 16,
    num_shards: int = 8,
) -> "ray.data.Dataset":
    """One walk per distinct source vertex, ``length`` deterministic
    steps. Returns (walk, step, v) rows: step 0 is the start vertex;
    a walk that reaches a vertex with no out-edges stops early.

    Pass a symmetrized edge table for undirected walks. Vertex ids
    must lie in [0, 2^31) (packed argmin key) — ValueError otherwise.
    """
    edges = edges.map_batches(
        lambda t: pa.table(
            {"src": t.column("src").cast(_I64), "dst": t.column("dst").cast(_I64)}
        )
        if "src" in t.column_names
        else pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    E = compact_for_join(edges, num_partitions)

    starts = count_i64_keys(
        edges.map_batches(
            lambda t: pa.table({"src": t.column("src")})
            if "src" in t.column_names
            else pa.table({"src": pa.array([], _I64)}),
            batch_format="pyarrow",
        ),
        "src",
        num_shards=num_shards,
    ).map_batches(
        lambda t: pa.table({"walk": t.column("src"), "v": t.column("src")})
        if "src" in t.column_names
        else pa.table({"walk": pa.array([], _I64), "v": pa.array([], _I64)}),
        batch_format="pyarrow",
    )

    def stamped(ds: "ray.data.Dataset", step: int) -> "ray.data.Dataset":
        def f(t: pa.Table) -> pa.Table:
            if "walk" not in t.column_names:
                return pa.table(
                    {"walk": pa.array([], _I64), "step": pa.array([], _I64), "v": pa.array([], _I64)}
                )
            n = len(t)
            return pa.table(
                {
                    "walk": t.column("walk"),
                    "step": pa.array(np.full(n, step, dtype=np.int64)),
                    "v": t.column("v"),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    frontier = starts
    out = stamped(starts, 0)
    for step in range(1, length + 1):
        # the frontier is O(walks) rows; materialize to (a) stop the
        # loop when every walk hit a dead end (a fully-empty Dataset
        # has no schema and breaks the hash join on this Ray version)
        # and (b) cut the per-step lineage
        frontier = frontier.materialize()
        if frontier.count() == 0:
            break
        j = compact_for_join(frontier, num_partitions).join(
            E,
            join_type="inner",
            num_partitions=num_partitions,
            on=("v",),
            right_on=("src",),
        )

        def choose(t: pa.Table, _step: int = step) -> pa.Table:
            if len(t) == 0 or "walk" not in t.column_names:
                return pa.table({"walk": pa.array([], _I64), "pk": pa.array([], _I64)})
            w = t.column("walk").to_numpy(zero_copy_only=False).astype(np.int64)
            cur = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
            d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            if len(d) and (min(cur.min(), d.min()) < 0 or max(cur.max(), d.max()) >= _SHIFT):
                raise ValueError("vertex ids outside [0, 2^31) packing bound")
            pk = step_hash(cur, d, _step) * _SHIFT + d
            # local pre-argmin per walk: the global shuffle then moves
            # <= (walks in batch) rows instead of every candidate edge
            order = np.lexsort((pk, w))
            ws, ps = w[order], pk[order]
            first = np.ones(len(ws), dtype=bool)
            first[1:] = ws[1:] != ws[:-1]
            return pa.table({"walk": pa.array(ws[first]), "pk": pa.array(ps[first])})

        frontier = (
            j.map_batches(choose, batch_format="pyarrow")
            .groupby("walk")
            .aggregate(Min("pk", alias_name="pk"))
            .map_batches(ensure_schema({"walk": _I64, "pk": _I64}), batch_format="pyarrow")
            .map_batches(
                lambda t: pa.table(
                    {
                        "walk": t.column("walk"),
                        "v": pa.array(
                            t.column("pk").to_numpy(zero_copy_only=False) & _MASK
                        ),
                    }
                )
                if "walk" in t.column_names
                else pa.table({"walk": pa.array([], _I64), "v": pa.array([], _I64)}),
                batch_format="pyarrow",
            )
        )
        out = out.union(stamped(frontier, step))
    return out
