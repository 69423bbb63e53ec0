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
- the per-shard BSP argmin (``util.min_i64_by_key``): per-block partial
  mins, ``num_returns=S`` routing, merge-min reducers — the same
  combine shape as the rank gather, no row-level groupby anywhere.
Frontier and output are O(V · L); dead-end walks simply stop (inner
join drops them — documented, matches the oracle's inner join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..util import compact_for_join, count_i64_keys, min_i64_by_key

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

        frontier = min_i64_by_key(
            j.map_batches(choose, batch_format="pyarrow"),
            "walk",
            "pk",
            num_shards=num_shards,
        ).map_batches(
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
        out = out.union(stamped(frontier, step))
    return out


def skipgram_pairs(
    walks: "ray.data.Dataset",
    window: int = 2,
    num_partitions: int = 16,
    num_shards: int = 8,
) -> "ray.data.Dataset":
    """Skip-gram training pairs from a walk corpus: for every walk and
    step pair (i, j) with 0 < j − i ≤ ``window``, count the unordered
    vertex pair — the (center, context) extraction that turns walks
    into graph-embedding training data (word2vec over walks).

    Scale shape: ONE self-join on walk id (walks are short, so the
    join fan-out per walk is ≤ L², bounded), vectorized window filter
    and pair packing per batch, then the packed count BSP — never a
    two-column row groupby. Vertex ids must be < 2^31 (packed key).
    """
    left = walks.map_batches(
        lambda t: pa.table(
            {"walk": t.column("walk"), "i": t.column("step"), "a": t.column("v")}
        )
        if "walk" in t.column_names
        else pa.table(
            {"walk": pa.array([], _I64), "i": pa.array([], _I64), "a": pa.array([], _I64)}
        ),
        batch_format="pyarrow",
    )
    right = walks.map_batches(
        lambda t: pa.table(
            {"walk2": t.column("walk"), "j": t.column("step"), "b": t.column("v")}
        )
        if "walk" in t.column_names
        else pa.table(
            {"walk2": pa.array([], _I64), "j": pa.array([], _I64), "b": pa.array([], _I64)}
        ),
        batch_format="pyarrow",
    )
    j = compact_for_join(left, num_partitions).join(
        compact_for_join(right, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("walk",),
        right_on=("walk2",),
    )

    def pack(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table({"k": pa.array([], _I64)})
        i = t.column("i").to_numpy(zero_copy_only=False)
        jj = t.column("j").to_numpy(zero_copy_only=False)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        m = (jj > i) & (jj - i <= window)
        a, b = a[m], b[m]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        if len(lo) and (lo.min() < 0 or hi.max() >= _SHIFT):
            raise ValueError("vertex ids outside [0, 2^31) packing bound")
        return pa.table({"k": pa.array(lo * _SHIFT + hi)})

    return count_i64_keys(
        j.map_batches(pack, batch_format="pyarrow"), "k", num_shards=num_shards, count_col="n"
    ).map_batches(
        lambda t: pa.table(
            {
                "a": pa.array(t.column("k").to_numpy(zero_copy_only=False) // _SHIFT),
                "b": pa.array(t.column("k").to_numpy(zero_copy_only=False) & _MASK),
                "n": t.column("n"),
            }
        )
        if "k" in t.column_names
        else pa.table(
            {"a": pa.array([], _I64), "b": pa.array([], _I64), "n": pa.array([], _I64)}
        ),
        batch_format="pyarrow",
    )
