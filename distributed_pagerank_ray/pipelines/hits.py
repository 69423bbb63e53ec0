"""HITS (hubs & authorities) over an edge table — join-based, fixed
iteration count, L1-normalized.

Update rule per iteration (classic Kleinberg, with sum-normalization
instead of L2 so the unrolled SQL oracle stays exact):

    h'(v) = Σ_{(v,u) ∈ E} a(u)        then  h = h' / Σ h'
    a'(u) = Σ_{(v,u) ∈ E} h(v)        then  a = a' / Σ a'

starting from a₀ = 1/n on every vertex. Vertices with no out-edges
keep hub 0; no in-edges keep authority 0 (left-outer against the
vertex set each half-step).

Shape per iteration: TWO hash joins (scores ⋈ edges — the score table
is the small-per-partition side) + TWO grouped sums + two scalar
normalizer aggregates. Loop-invariant state (edge table, vertex set)
is materialized once. Like ``pagerank_weighted_fixed`` this is the
join-based formulation kept SQL-oracle-checkable by a fixed ``iters``;
the sharded BSP engine (pipelines/pagerank.py) remains the scale path
for massive iterative runs. Reference scope note: the reference engine
(lioia/distributed-pagerank, pkg/graph/pagerank.go) implements only
PageRank; HITS is an engine extension sharing its edge-table data
model and convergence-free fixed-iteration contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from ..util import compact_for_join, count_i64_keys, ensure_schema

_I64 = pa.int64()
_F64 = pa.float64()


def _score_sum(scores: "ray.data.Dataset") -> float:
    return float(scores.aggregate(Sum("x", alias_name="t"))["t"])


def hits_fixed(
    edges: "ray.data.Dataset",
    iters: int = 3,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "ray.data.Dataset":
    """Returns (vertex, hub, auth) after exactly ``iters`` iterations,
    each L1-normalized (Σhub = Σauth = 1), rounded to 6dp.
    Deterministic."""
    P = num_partitions

    e = edges.map_batches(
        lambda t: pa.table(
            {"src": t.column(src_col).cast(_I64), "dst": t.column(dst_col).cast(_I64)}
        ),
        batch_format="pyarrow",
    )
    e = compact_for_join(e, P).materialize()

    both = e.map_batches(
        lambda t: pa.table({"v": t.column("src")}), batch_format="pyarrow"
    ).union(e.map_batches(lambda t: pa.table({"v": t.column("dst")}), batch_format="pyarrow"))
    verts = (
        count_i64_keys(both, "v")
        .map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")
        .materialize()
    )
    n = verts.count()

    auth = verts.map_batches(
        lambda t: pa.table({"v": t.column("v"), "x": pa.array(np.full(len(t), 1.0 / n))}),
        batch_format="pyarrow",
    ).materialize()
    hub = auth

    def _half_step(scores, join_key: str, group_key: str):
        """One HITS half-step: sum scores of ``join_key`` neighbors
        onto ``group_key`` vertices, zero-fill, L1-normalize."""
        j = compact_for_join(scores, P).join(
            e, join_type="inner", num_partitions=P, on=("v",), right_on=(join_key,)
        )

        def pick(t: pa.Table) -> pa.Table:
            if group_key not in t.column_names:
                return pa.table({"k": pa.array([], _I64), "x": pa.array([], _F64)})
            return pa.table({"k": t.column(group_key), "x": t.column("x")})

        sums = (
            j.map_batches(pick, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("x", alias_name="s"))
            .map_batches(ensure_schema({"k": _I64, "s": _F64}), batch_format="pyarrow")
        )
        j2 = compact_for_join(verts, P).join(
            compact_for_join(sums, P),
            join_type="left_outer", num_partitions=P, on=("v",), right_on=("k",),
        )

        def fill(t: pa.Table) -> pa.Table:
            if "v" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "x": pa.array([], _F64)})
            s = t.column("s") if "s" in t.column_names else pa.nulls(len(t), _F64)
            s = pc.fill_null(s.cast(_F64) if s.type != _F64 else s, 0.0)
            return pa.table({"v": t.column("v"), "x": s})

        raw = j2.map_batches(fill, batch_format="pyarrow").materialize()
        total = _score_sum(raw)

        def norm(t: pa.Table) -> pa.Table:
            if "v" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "x": pa.array([], _F64)})
            return pa.table({"v": t.column("v"), "x": pc.divide(t.column("x"), pa.scalar(total))})

        return raw.map_batches(norm, batch_format="pyarrow").materialize()

    for _ in range(iters):
        # h(v) = Σ a(u) over out-neighbors u: join auth on EDGE DST,
        # accumulate onto src
        hub = _half_step(auth, "dst", "src")
        # a(u) = Σ h(v) over in-neighbors v: join hub on EDGE SRC,
        # accumulate onto dst
        auth = _half_step(hub, "src", "dst")

    merged = compact_for_join(
        hub.map_batches(
            lambda t: pa.table({"v": t.column("v"), "h": t.column("x")})
            if "v" in t.column_names
            else pa.table({"v": pa.array([], _I64), "h": pa.array([], _F64)}),
            batch_format="pyarrow",
        ),
        P,
    ).join(
        compact_for_join(
            auth.map_batches(
                lambda t: pa.table({"v2": t.column("v"), "a": t.column("x")})
                if "v" in t.column_names
                else pa.table({"v2": pa.array([], _I64), "a": pa.array([], _F64)}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="inner", num_partitions=P, on=("v",), right_on=("v2",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if "v" not in t.column_names:
            return pa.table(
                {
                    "vertex": pa.array([], _I64),
                    "hub": pa.array([], _F64),
                    "auth": pa.array([], _F64),
                }
            )
        return pa.table(
            {
                "vertex": t.column("v"),
                "hub": pa.array(np.round(t.column("h").to_numpy(zero_copy_only=False), 6)),
                "auth": pa.array(np.round(t.column("a").to_numpy(zero_copy_only=False), 6)),
            }
        )

    return merged.map_batches(fin, batch_format="pyarrow")
