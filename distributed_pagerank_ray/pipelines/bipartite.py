"""Bipartiteness / odd-cycle detection via the bipartite double cover.

A graph is bipartite iff it contains no odd cycle. The distributed
reduction (standard folklore; avoids any new iterative machinery): run
plain connected components on the DOUBLE COVER — every vertex v splits
into (v,0)=2v and (v,1)=2v+1, every undirected edge {u,v} becomes the
two cross edges (2u, 2v+1) and (2u+1, 2v). An original component is
bipartite iff its two cover copies stay in DIFFERENT components (an odd
cycle merges them). This reuses ``build_graph`` + the checkpointed
label-propagation CC unchanged — one vectorized edge transform, one CC
run, two vertex_map joins and one side-pairing join.

Output per original vertex: (id, component, bipartite) where
``component`` = the minimum original vertex id in the component (CC's
min-label through the cover, divided back by 2) and ``bipartite`` is
the per-component odd-cycle-free flag.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import RunConfig
from ..util import compact_for_join, ensure_schema

_I64 = pa.int64()


def double_cover_edges(
    edges: "ray.data.Dataset", src_col: str = "src", dst_col: str = "dst"
) -> "ray.data.Dataset":
    """(2u, 2v+1) ∪ (2u+1, 2v) for every input edge — vectorized.
    Requires non-negative int ids < 2^62."""

    def double(t: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)})
        if src_col not in t.column_names or len(t) == 0:
            return empty
        u = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([2 * u, 2 * u + 1])),
                "dst": pa.array(np.concatenate([2 * v + 1, 2 * v])),
            }
        )

    return edges.map_batches(double, batch_format="pyarrow")


def bipartiteness(
    edges: "ray.data.Dataset",
    run_dir: str,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 4,
    max_iters: int = 100,
) -> "ray.data.Dataset":
    """Per original vertex: (id, component, bipartite). ``run_dir``
    hosts the cover graph + CC checkpoints (resume applies for free)."""
    from .components import connected_components
    from .graphbuild import build_graph

    g = build_graph(
        double_cover_edges(edges, src_col, dst_col),
        run_dir,
        src_col="src",
        dst_col="dst",
        mint=True,
        run_cfg=RunConfig(num_partitions=num_partitions),
    )
    labels = connected_components(g, max_iters=max_iters).labels()
    vmap = g.vertex_map()

    P = num_partitions
    j1 = compact_for_join(labels, P).join(
        compact_for_join(vmap, P), join_type="inner", num_partitions=P,
        on=("id",), right_on=("id",),
    )

    def p1(t: pa.Table) -> pa.Table:
        if "key" not in t.column_names:
            return pa.table({"dkey": pa.array([], _I64), "label": pa.array([], _I64)})
        return pa.table({"dkey": t.column("key"), "label": t.column("label")})

    j2 = compact_for_join(
        j1.map_batches(p1, batch_format="pyarrow").map_batches(
            ensure_schema({"dkey": _I64, "label": _I64}), batch_format="pyarrow"
        ),
        P,
    ).join(
        compact_for_join(vmap, P), join_type="inner", num_partitions=P,
        on=("label",), right_on=("id",),
    )

    def p2(t: pa.Table) -> pa.Table:
        # (original v, side, component min DOUBLED key)
        if "key" not in t.column_names:
            return pa.table(
                {"v": pa.array([], _I64), "side": pa.array([], _I64), "c": pa.array([], _I64)}
            )
        dk = t.column("dkey").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"v": pa.array(dk // 2), "side": pa.array(dk & 1), "c": pa.array(c)}
        )

    sides = j2.map_batches(p2, batch_format="pyarrow").map_batches(
        ensure_schema({"v": _I64, "side": _I64, "c": _I64}), batch_format="pyarrow"
    )

    def pick(side_val: int, a_name: str):
        def fn(t: pa.Table) -> pa.Table:
            if "v" not in t.column_names or len(t) == 0:
                return pa.table(
                    {f"v{side_val}": pa.array([], _I64), a_name: pa.array([], _I64)}
                )
            m = t.column("side").to_numpy(zero_copy_only=False) == side_val
            return pa.table(
                {
                    f"v{side_val}": pa.array(
                        t.column("v").to_numpy(zero_copy_only=False)[m]
                    ),
                    a_name: pa.array(t.column("c").to_numpy(zero_copy_only=False)[m]),
                }
            )

        return fn

    ev = sides.map_batches(pick(0, "a"), batch_format="pyarrow")
    od = sides.map_batches(pick(1, "b"), batch_format="pyarrow")
    j3 = compact_for_join(ev, P).join(
        compact_for_join(od, P), join_type="inner", num_partitions=P,
        on=("v0",), right_on=("v1",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names or len(t) == 0:
            return pa.table(
                {
                    "id": pa.array([], _I64),
                    "component": pa.array([], _I64),
                    "bipartite": pa.array([], pa.bool_()),
                }
            )
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id": t.column("v0"),
                "component": pa.array(np.minimum(a, b) // 2),
                "bipartite": pa.array(a != b),
            }
        )

    return j3.map_batches(fin, batch_format="pyarrow")
