"""Exact triangle counting — degree-ordered orientation + hash joins.

Reference has no triangle counting (SURVEY §2.5); mandated by the
north rule. Standard scalable algorithm (node-iterator++ / the
"compact-forward" orientation):

1. canonicalize: undirected distinct edges (a<b), self-loops dropped,
2. undirected degree per vertex (one groupby-count),
3. orient each edge from the endpoint that is smaller under the total
   order (degree, id) → a DAG where every vertex's out-degree is
   O(sqrt(m)), which bounds adjacency-list length and tames hub skew,
4. adjacency lists per source via ``groupby('u').map_groups``,
5. two ``Dataset.join`` hash joins attach N+(u) and N+(v) to each
   oriented edge (u,v); triangles through the edge =
   |N+(u) ∩ N+(v)| via sorted-array intersection per row,
6. global sum = exact triangle count.

Partitioning assumption: the joins hash-partition on u / v
(``num_partitions`` from RunConfig); the orientation bounds the list
attached to any row, so no single partition blows up even with hubs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..config import RunConfig
from ..util import compact_for_join, ensure_schema

_I64 = pa.int64()


def canonical_undirected(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(src,dst) → distinct (a,b) with a<b, self-loops removed."""

    def norm(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {"a": pa.array(np.minimum(s, d)), "b": pa.array(np.maximum(s, d))}
        )

    return (
        edges.map_batches(norm, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(ensure_schema({"a": _I64, "b": _I64}), batch_format="pyarrow")
    )


def _degrees(und: "ray.data.Dataset") -> "ray.data.Dataset":
    both = und.map_batches(
        lambda t: pa.table({"v": t.column("a")}), batch_format="pyarrow"
    ).union(
        und.map_batches(lambda t: pa.table({"v": t.column("b")}), batch_format="pyarrow")
    )
    return (
        both.groupby("v")
        .aggregate(Count(alias_name="deg"))
        .map_batches(ensure_schema({"v": _I64, "deg": _I64}), batch_format="pyarrow")
    )


def triangle_count(
    edges: "ray.data.Dataset",
    run_cfg: RunConfig | None = None,
    broadcast_threshold: int = 5_000_000,
) -> int:
    """Exact triangle count.

    When the vertex set fits comfortably in memory
    (< ``broadcast_threshold`` vertices) the degree table and oriented
    adjacency are broadcast via ``ray.put`` and looked up inside
    map_batches — no hash joins (the guide's small-side-broadcast
    pattern). Above the threshold the join-based path runs (hash
    partitioned, scales to graphs whose adjacency exceeds one node's
    memory)."""
    run_cfg = run_cfg or RunConfig()
    P = run_cfg.num_partitions
    und = compact_for_join(canonical_undirected(edges), P)
    if und.count() == 0:
        return 0
    deg = compact_for_join(_degrees(und), P)
    if deg.count() <= broadcast_threshold:
        return _triangle_count_broadcast(und, deg)

    j1 = und.join(deg, join_type="inner", num_partitions=P, on=("a",), right_on=("v",))
    def _j1_project(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names:
            return pa.table(
                {"a": pa.array([], _I64), "b": pa.array([], _I64), "deg_a": pa.array([], _I64)}
            )
        return pa.table({"a": t.column("a"), "b": t.column("b"), "deg_a": t.column("deg")})

    j1 = compact_for_join(j1.map_batches(_j1_project, batch_format="pyarrow"), P)
    j2 = j1.join(deg, join_type="inner", num_partitions=P, on=("b",), right_on=("v",))

    def orient(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names:  # degenerate empty join block
            return pa.table({"u": pa.array([], _I64), "v": pa.array([], _I64)})
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg").to_numpy(zero_copy_only=False)
        # total order (deg, id): lower endpoint becomes the source
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    oriented = compact_for_join(j2.map_batches(orient, batch_format="pyarrow"), P)

    def build_adj(g: pd.DataFrame) -> pd.DataFrame:
        # neighbor list encoded as little-endian int64 bytes: Acero hash
        # joins reject list<> payload columns but pass binary through
        u = int(g["u"].iloc[0])
        nbrs = np.sort(g["v"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"w": [u], "nbrs": [nbrs.tobytes()]})

    adj = compact_for_join(
        oriented.groupby("u")
        .map_groups(build_adj, batch_format="pandas")
        .map_batches(ensure_schema({"w": _I64, "nbrs": pa.binary()}), batch_format="pyarrow"),
        P,
    )
    if adj.count() == 0:
        return 0

    e1 = oriented.join(adj, join_type="inner", num_partitions=P, on=("u",), right_on=("w",))
    def _e1_project(t: pa.Table) -> pa.Table:
        if "u" not in t.column_names:
            return pa.table(
                {"u": pa.array([], _I64), "v": pa.array([], _I64), "nbrs_u": pa.array([], pa.binary())}
            )
        return pa.table({"u": t.column("u"), "v": t.column("v"), "nbrs_u": t.column("nbrs")})

    e1 = compact_for_join(e1.map_batches(_e1_project, batch_format="pyarrow"), P)
    if e1.count() == 0:
        return 0
    e2 = e1.join(adj, join_type="inner", num_partitions=P, on=("v",), right_on=("w",))

    def intersect(t: pa.Table) -> pa.Table:
        if "nbrs_u" not in t.column_names:
            return pa.table({"tri": pa.array([], _I64)})
        nu = t.column("nbrs_u").to_pylist()
        nv = t.column("nbrs").to_pylist()
        counts = [
            len(
                np.intersect1d(
                    np.frombuffer(x, dtype=np.int64),
                    np.frombuffer(y, dtype=np.int64),
                    assume_unique=True,
                )
            )
            for x, y in zip(nu, nv)
        ]
        return pa.table({"tri": pa.array(np.asarray(counts, dtype=np.int64))})

    counted = e2.map_batches(intersect, batch_format="pyarrow")
    total = counted.sum("tri")
    return int(total) if total is not None else 0


def _triangle_count_broadcast(und: "ray.data.Dataset", deg: "ray.data.Dataset") -> int:
    """Small-vertex-set path: broadcast (sorted ids, degrees), orient
    per batch, build adjacency with ONE distributed sort + per-block
    vectorized run-length grouping, broadcast the packed adjacency, and
    count intersections per batch. Two data passes, zero hash joins."""
    # broadcast degree lookup (sorted ids + parallel degree array)
    ids_list: list[np.ndarray] = []
    degs_list: list[np.ndarray] = []
    for b in deg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        ids_list.append(b.column("v").to_numpy(zero_copy_only=False))
        degs_list.append(b.column("deg").to_numpy(zero_copy_only=False))
    ids = np.concatenate(ids_list)
    dg = np.concatenate(degs_list)
    order = np.argsort(ids)
    ids, dg = ids[order], dg[order]
    deg_ref = ray.put((ids, dg))

    def orient(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names:
            return pa.table({"u": pa.array([], _I64), "v": pa.array([], _I64)})
        sids, sdg = ray.get(deg_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = sdg[np.searchsorted(sids, a)]
        db = sdg[np.searchsorted(sids, b)]
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {
                "u": pa.array(np.where(a_first, a, b)),
                "v": pa.array(np.where(a_first, b, a)),
            }
        )

    oriented = und.map_batches(orient, batch_format="pyarrow").materialize()

    # adjacency: collect oriented edges (u-sorted per batch on the driver
    # is avoided — we gather the full arrays once; total size = m * 16B)
    us_list, vs_list = [], []
    for bt in oriented.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        us_list.append(bt.column("u").to_numpy(zero_copy_only=False))
        vs_list.append(bt.column("v").to_numpy(zero_copy_only=False))
    u_all = np.concatenate(us_list)
    v_all = np.concatenate(vs_list)
    order = np.lexsort((v_all, u_all))
    u_all, v_all = u_all[order], v_all[order]
    # CSR over oriented out-neighbors (degree-ordered ⇒ lists are O(sqrt m))
    uniq_u, starts = np.unique(u_all, return_index=True)
    bounds = np.append(starts, len(u_all))
    adj_ref = ray.put((uniq_u, bounds, v_all))

    def intersect(t: pa.Table) -> pa.Table:
        if "u" not in t.column_names or len(t) == 0:
            return pa.table({"tri": pa.array([], _I64)})
        cu, cb, cv = ray.get(adj_ref)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        iu = np.searchsorted(cu, u)
        iv = np.searchsorted(cu, v)
        total = 0
        n_u = len(cu)
        for j in range(len(u)):
            a = iu[j]
            b = iv[j]
            if a >= n_u or cu[a] != u[j] or b >= n_u or cu[b] != v[j]:
                continue
            total += len(
                np.intersect1d(
                    cv[cb[a] : cb[a + 1]], cv[cb[b] : cb[b + 1]], assume_unique=True
                )
            )
        return pa.table({"tri": pa.array([total], _I64)})

    total = oriented.map_batches(intersect, batch_format="pyarrow").sum("tri")
    return int(total) if total is not None else 0
