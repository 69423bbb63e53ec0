"""Weighted single/multi-source shortest paths, fixed Bellman-Ford
rounds (join-based, SQL-oracle-checkable).

A path capability beyond the reference's PageRank-only scope
(lioia/distributed-pagerank, pkg/graph/pagerank.go). ``iters`` rounds
of relaxation give the exact min-cost walk using <= ``iters`` edges —
the unrolled-CTE oracle form (like ``pagerank_weighted_fixed`` /
``hits_fixed``); run the hop-metric variant to a true fixpoint on the
BSP engine via pipelines/bfs.py instead.

Execution shape per round — SPARSE frontier, min commutes through the
union:

    relaxed = dists ⋈ edges (on src)  →  (dst, d + w)
    dists   = groupby(v).min over (dists ∪ relaxed)

one hash join + one grouped min; vertices still at +inf simply have no
row. Multigraphs are fine AS IS: relaxing over parallel edges equals
relaxing over the min-weight simple edge, so callers never pay a
pair-dedup shuffle to prepare the edge table. The final stage
zero-fills against the vertex set once (unreached → -1).

Negative weights are rejected (min-cost-walk == shortest path needs
non-negative weights for the fixed-round semantics to be useful;
Bellman-Ford's negative-cycle detection is out of scope).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min

from ..util import compact_for_join, ensure_schema

_I64 = pa.int64()
_F64 = pa.float64()


def sssp_fixed(
    edges: "ray.data.Dataset",
    seeds: "list[int]",
    iters: int = 3,
    num_partitions: int = 8,
    directed: bool = True,
) -> "ray.data.Dataset":
    """(vertex, dist) over all vertices of ``edges`` (src, dst, w):
    min-cost walk from the seed set using <= ``iters`` edges; -1 where
    unreached. ``directed=False`` relaxes both directions. Distances
    round to 4dp (exact when weights are integer-valued)."""
    P = num_partitions
    seeds = sorted(int(s) for s in seeds)
    if not seeds:
        raise ValueError("sssp_fixed needs at least one seed vertex")

    def ew(t: pa.Table) -> pa.Table:
        if "src" not in t.column_names or len(t) == 0:
            return pa.table({"s": pa.array([], _I64), "d": pa.array([], _I64), "w": pa.array([], _F64)})
        w = t.column("w").cast(_F64)
        if len(t) and pc.min(w).as_py() < 0:
            raise ValueError("sssp_fixed needs non-negative weights")
        base = pa.table({"s": t.column("src"), "d": t.column("dst"), "w": w})
        if directed:
            return base
        rev = pa.table({"s": t.column("dst"), "d": t.column("src"), "w": w})
        return pa.concat_tables([base, rev])

    e = edges.map_batches(ew, batch_format="pyarrow").materialize()

    def vert_side(col):
        return e.map_batches(
            lambda t, c=col: pa.table({"v": t.column(c)}), batch_format="pyarrow"
        )

    # vertex set once (distinct via grouped min — no payload)
    verts = (
        vert_side("s").union(vert_side("d"))
        .groupby("v")
        .aggregate(Min("v", alias_name="_m"))
        .select_columns(["v"])
        .map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")
        .materialize()
    )

    seed_arr = np.asarray(seeds, dtype=np.int64)
    dists = ray.data.from_arrow(
        pa.table({"v": pa.array(seed_arr), "x": pa.array(np.zeros(len(seed_arr)))})
    ).materialize()

    for _ in range(iters):
        j = compact_for_join(dists, P).join(
            compact_for_join(e, P), join_type="inner", num_partitions=P,
            on=("v",), right_on=("s",),
        )

        def relax(t: pa.Table) -> pa.Table:
            if "d" not in t.column_names or len(t) == 0:
                return pa.table({"v": pa.array([], _I64), "x": pa.array([], _F64)})
            return pa.table({"v": t.column("d"), "x": pc.add(t.column("x"), t.column("w"))})

        dists = (
            dists.union(j.map_batches(relax, batch_format="pyarrow"))
            .groupby("v")
            .aggregate(Min("x", alias_name="x"))
            .map_batches(ensure_schema({"v": _I64, "x": _F64}), batch_format="pyarrow")
            .materialize()
        )

    out = compact_for_join(verts, P).join(
        compact_for_join(
            dists.map_batches(
                lambda t: pa.table({"v2": t.column("v"), "x": t.column("x")}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="left_outer", num_partitions=P, on=("v",), right_on=("v2",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if "v" not in t.column_names:
            return pa.table({"vertex": pa.array([], _I64), "dist": pa.array([], _F64)})
        x = t.column("x") if "x" in t.column_names else pa.nulls(len(t), _F64)
        x = pc.fill_null(x.cast(_F64), -1.0).to_numpy(zero_copy_only=False)
        return pa.table({"vertex": t.column("v"), "dist": pa.array(np.round(x, 4))})

    return out.map_batches(fin, batch_format="pyarrow")
