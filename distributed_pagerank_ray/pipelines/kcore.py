"""k-core peeling over an undirected edge set.

A vertex is in the k-core if it survives repeated removal of vertices
with degree < k. ``kcore_peel`` runs a FIXED number of peel rounds
(callers wanting the true core loop until the kill set is empty —
``rounds=None``); the fixed-round variant exists so the driver gate
can hash-match an unrolled-CTE DuckDB oracle (same trick as the
3-iteration PageRank query).

Scale shape per round: degrees via the per-shard count BSP
(util.count_i64_keys — no row-level groupby); the KILL set (vertices
below k) is applied either as a broadcast NOT-IN filter (small kill
sets — the common shape after round 1, when kill sets shrink
geometrically) or, above ``broadcast_kill_limit``, as a shuffle
``left_anti`` join that never gathers anything to the driver — the
FIRST round's kill set is every vertex with degree < k, which is O(V)
on a web graph and must not pass through the driver. Edges are
re-materialized per round so the next round's count scans the
filtered set, not the original lineage.

Reference parity: no such operator in lioia/distributed-pagerank
(PageRank only) — new-engine scope, SURVEY §2.5 graph family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..util import count_i64_keys, semi_join_filter

_I64 = pa.int64()


def _sym_degrees(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    both = edges.map_batches(
        lambda t: pa.table({"v": t.column("a")}), batch_format="pyarrow"
    ).union(edges.map_batches(lambda t: pa.table({"v": t.column("b")}), batch_format="pyarrow"))
    return count_i64_keys(both, "v", count_col="deg")


def kcore_peel(
    edges: "ray.data.Dataset",
    k: int,
    rounds: int | None = None,
    broadcast_kill_limit: int = 1 << 20,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Peel ``rounds`` times (or until fixpoint when ``rounds`` is
    None). ``edges`` must be distinct undirected pairs (a < b).
    Returns the surviving vertex set as (v, deg) — degrees as of the
    surviving edge set.

    Kill sets up to ``broadcast_kill_limit`` are broadcast (one filter
    pass, no AllToAll); larger ones — typically only round 1 at low k —
    go through two ``left_anti`` shuffle joins, driver-free."""
    return _sym_degrees(
        peel_edges(
            edges,
            k,
            rounds=rounds,
            broadcast_kill_limit=broadcast_kill_limit,
            num_partitions=num_partitions,
        )
    )


def peel_edges(
    edges: "ray.data.Dataset",
    k: int,
    rounds: int | None = None,
    broadcast_kill_limit: int = 1 << 20,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """The k-core's surviving EDGE set (kcore_peel's engine, exposed so
    core_numbers can iterate on shrinking edge sets: the (k+1)-core of
    the k-core's edges IS the (k+1)-core of the full graph)."""
    from ..util import compact_for_join, ensure_schema

    edges = edges.materialize()
    r = 0
    while rounds is None or r < rounds:
        r += 1
        deg = _sym_degrees(edges)
        kill_ds = deg.map_batches(
            lambda t: pa.table(
                {"v": t.column("v").filter(pc.less(t.column("deg"), k))}
                if "v" in t.column_names
                else {"v": pa.array([], _I64)}
            ),
            batch_format="pyarrow",
        ).materialize()
        n_kill = kill_ds.count()
        if n_kill == 0:
            # fixpoint: further rounds are identical no-ops, fixed-round
            # oracle parity is preserved by stopping here
            break
        edges = filter_out_endpoints(
            edges, kill_ds, n_kill, broadcast_kill_limit, num_partitions
        )
    return edges


def filter_out_endpoints(
    edges: "ray.data.Dataset",
    kill_ds: "ray.data.Dataset",
    n_kill: int,
    broadcast_kill_limit: int,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Drop every edge with EITHER endpoint in ``kill_ds`` (column
    ``v``), returning a MATERIALIZED edge set. Kill sets up to
    ``broadcast_kill_limit`` go through the packed-broadcast NOT-IN
    filter (no AllToAll); larger ones through two driver-free
    ``left_anti`` shuffle joins (the kcore round-1 shape, reused by
    the densest-subgraph peel)."""
    from ..util import compact_for_join, ensure_schema

    if n_kill <= broadcast_kill_limit:
        kill_parts = [
            b.column("v").to_numpy(zero_copy_only=False)
            for b in kill_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        ]
        kill = np.concatenate(kill_parts) if kill_parts else np.zeros(0, dtype=np.int64)
        return semi_join_filter(
            semi_join_filter(edges, "a", kill, keep=False), "b", kill, keep=False
        ).materialize()
    kc = compact_for_join(kill_ds, num_partitions)
    surv = compact_for_join(edges, num_partitions).join(
        kc, join_type="left_anti", num_partitions=num_partitions,
        on=("a",), right_on=("v",),
    ).materialize()
    # count-guard between chained left_anti joins: a full kill round
    # leaves a 0-block dataset with NO schema — map_batches never runs
    # on it, so the second join would see no `b` column and raise
    if surv.count() == 0:
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)})
        ).materialize()
    surv = compact_for_join(
        surv.map_batches(
            ensure_schema({"a": _I64, "b": _I64}), batch_format="pyarrow"
        ),
        num_partitions,
    )
    return surv.join(
        kc, join_type="left_anti", num_partitions=num_partitions,
        on=("b",), right_on=("v",),
    ).map_batches(
        ensure_schema({"a": _I64, "b": _I64}), batch_format="pyarrow"
    ).materialize()


def core_numbers(
    edges: "ray.data.Dataset",
    max_k: int = 1 << 16,
    broadcast_kill_limit: int = 1 << 20,
    num_partitions: int = 8,
    num_shards: int = 16,
) -> "ray.data.Dataset":
    """Full core decomposition: (v, coreness) for every vertex with at
    least one edge (coreness(v) = max k such that v is in the k-core;
    isolated vertices never enter an edge list and are out of scope).

    Shape: iterate ``peel_edges`` on the SHRINKING edge set — the
    (k+1)-core of the k-core's edges equals the (k+1)-core of the full
    graph, so each level pays only for the surviving subgraph. Every
    level's vertex set is stamped with ``-k`` and the union folds
    through ONE ``min_i64_by_key`` BSP at the end (min of -k = max k);
    the union's size is Σ_k |V_k| ≤ degeneracy · |V| rows of two int64s
    — no driver-side vertex sets. Raises if ``max_k`` levels don't
    exhaust the graph (no silent truncation)."""
    from ..util import min_i64_by_key

    levels = []
    cur = edges.materialize()
    k = 1
    while True:
        if k > max_k:
            raise RuntimeError(f"core_numbers: degeneracy exceeds max_k={max_k}")
        verts_k = _sym_degrees(cur).map_batches(
            lambda t, kk=k: pa.table(
                {"v": t.column("v"), "negk": pa.array(np.full(len(t), -kk, np.int64))}
            )
            if "v" in t.column_names
            else pa.table({"v": pa.array([], _I64), "negk": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
        levels.append(verts_k)
        cur = peel_edges(
            cur,
            k + 1,
            broadcast_kill_limit=broadcast_kill_limit,
            num_partitions=num_partitions,
        )
        if cur.count() == 0:
            break
        k += 1

    u = levels[0]
    for lv in levels[1:]:
        u = u.union(lv)
    folded = min_i64_by_key(u, "v", "negk", num_shards=num_shards)
    return folded.map_batches(
        lambda t: pa.table(
            {
                "v": t.column("v"),
                "coreness": pa.array(
                    -t.column("negk").to_numpy(zero_copy_only=False)
                ),
            }
        )
        if "v" in t.column_names
        else pa.table({"v": pa.array([], _I64), "coreness": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
