"""DAG longest-path depth (critical-path layering) via iterative
max-plus relaxation.

A path capability beyond the reference's PageRank-only scope
(lioia/distributed-pagerank, pkg/graph/pagerank.go): per vertex, the
length (edge count) of the longest chain ENDING at it — the
topological layer a scheduler would place it in, the "critical path"
depth of a build/derivation DAG, or the generation number of a
crawl-frontier DAG.

Execution shape — scc.py's fused inner loop with the sign flipped:
each round is ONE hash join (state ⋈ edges on src) producing
candidate depths ``d[src] + 1`` at each dst, then ONE per-shard BSP
argmin (``util.min_i64_by_key``) over the NEGATED depth (min of -d is
max of d), merged against the carried state. Convergence is the
monotone depth-sum check (depths only grow; no compare join). On a
DAG the loop terminates in longest-path-length rounds; a CYCLE makes
depths grow forever, so exhausting ``max_rounds`` raises — the raise
doubles as the cycle detector (same fail-loudly posture as the scc
inner fixpoint, ADVICE r4).

Scale: state is O(V) rows of two int64 columns, messages are O(E) per
round; nothing driver-side but two scalars (the round counter and the
monotone sum). Rounds = DAG depth — suited to shallow/layered DAGs
(dependency graphs, derivation chains); for depth beyond ~100 the
AllToAll round constant dominates, same trade as scc.py.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..util import compact_for_join, ensure_schema, min_i64_by_key

_I64 = pa.int64()

#: stats of the last dag_longest_path call: {"rounds"} (pytest pins
#: rounds == planted depth + 1: one extra round to observe no change).
LAST_STATS: dict = {}


def _project(ds, mapping: dict[str, str]):
    """Rename/select int64 columns with empty-block tolerance."""
    out_cols = list(mapping.items())

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or out_cols[0][1] not in t.column_names:
            return pa.table({o: pa.array([], _I64) for o, _ in out_cols})
        return pa.table({o: t.column(i).cast(_I64) for o, i in out_cols})

    return ds.map_batches(fn, batch_format="pyarrow")


def dag_longest_path(
    edges: "ray.data.Dataset",
    vertices: "ray.data.Dataset",
    num_partitions: int = 4,
    num_shards: int = 4,
    max_rounds: int = 64,
) -> "ray.data.Dataset":
    """(v, depth) over ``vertices``: longest chain (edge count) ending
    at each vertex of the directed DAG ``edges`` (src, dst).

    ``vertices`` (single int64 column ``v``) must cover every edge
    endpoint: a source vertex missing from it has no depth-0 seed, so
    chains through it would never relax. Raises RuntimeError
    after ``max_rounds`` rounds without a fixpoint: on a true DAG that
    means depth > max_rounds; on a cyclic input it is the cycle
    detector (longest path is undefined there).
    """
    global LAST_STATS
    P, S = num_partitions, num_shards
    stats = {"rounds": 0}
    LAST_STATS = stats

    # nd = -depth so min_i64_by_key's min IS the max depth.
    state = _project(vertices, {"v": "v"}).map_batches(
        lambda t: t.append_column("nd", pa.array([0] * len(t), _I64)),
        batch_format="pyarrow",
    ).materialize()
    e = _project(edges, {"src": "src", "dst": "dst"})
    if e.count() == 0:
        return _finish(state)
    e = compact_for_join(e, P)

    prev_sum = state.sum("nd")
    for _ in range(max_rounds):
        stats["rounds"] += 1
        msg = e.join(
            compact_for_join(_project(state, {"v2": "v", "nd2": "nd"}), P),
            join_type="inner",
            num_partitions=P,
            on=("src",),
            right_on=("v2",),
        )

        def relax(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "dst" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "nd": pa.array([], _I64)})
            import pyarrow.compute as pc

            return pa.table(
                {
                    "v": t.column("dst").cast(_I64),
                    "nd": pc.subtract(t.column("nd2").cast(_I64), 1),
                }
            )

        cand = msg.map_batches(relax, batch_format="pyarrow")
        merged = min_i64_by_key(
            state.union(cand), "v", "nd", num_shards=S
        ).materialize()
        new_sum = merged.sum("nd")
        state = merged
        if new_sum == prev_sum:
            return _finish(state)
        prev_sum = new_sum
    raise RuntimeError(
        f"dag_longest_path did not reach a fixpoint within max_rounds="
        f"{max_rounds}: the input has a cycle, or its depth exceeds the "
        "cap (raise max_rounds for genuinely deeper DAGs)"
    )


def _finish(state):
    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "v" not in t.column_names:
            return pa.table({"v": pa.array([], _I64), "depth": pa.array([], _I64)})
        import pyarrow.compute as pc

        return pa.table(
            {"v": t.column("v").cast(_I64), "depth": pc.negate(t.column("nd").cast(_I64))}
        )

    return state.map_batches(fn, batch_format="pyarrow").map_batches(
        ensure_schema({"v": _I64, "depth": _I64}), batch_format="pyarrow"
    )
