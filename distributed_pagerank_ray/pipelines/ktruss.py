"""k-truss decomposition: the maximal subgraph in which every edge
closes at least k-2 triangles (a cohesive-subgraph mining primitive a
link-graph engine needs next to k-core — trusses are the standard
"community seed" unit on web/social graphs).

Algorithm: iterative support peel. Each round computes per-edge
triangle SUPPORT within the current edge set, drops edges with
support < k-2, and repeats until a fixpoint — removals CASCADE (a
dropped edge lowers its neighbors' support), so the loop is genuinely
iterative; rounds are monotone decreasing in |E| and the loop raises
on ``max_rounds`` rather than returning a non-fixpoint (the repo's
no-silent-non-convergence rule).

Scale shape (no groupby().map_groups, no driver materialization):

- support = the triangle join path of :mod:`.triangles` — degree
  orientation joins, per-shard BSP adjacency (``_build_adj_bsp``:
  hash-routed gather + lexsort + zero-copy binary offsets), then one
  vectorized segmented intersection per batch that emits each
  triangle's THREE canonical edges as packed int64 keys,
  pre-aggregated per batch and grouped-summed through
  ``util.count_i64_keys`` (O(edges-in-triangles × blocks) exchange).
- the support table doubles as the survivor edge list: an edge absent
  from it closes zero triangles and is peeled implicitly (hence the
  ``k >= 3`` precondition — a 2-truss would keep triangle-free edges).

Packed pair keys need vertex ids in [0, 2**31) (same precondition as
LPA's packed (dst,label) key; asserted loudly).

Reference parity anchor: the reference engine has no truss operator —
this is part of the §2.5 "new engine treatment" surface, the cohesive
companion to kcore.py (pkg/graph has PageRank only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import RunConfig
from ..util import compact_for_join, count_i64_keys, ensure_schema
from .triangles import _build_adj_bsp, _degrees, canonical_undirected

_I64 = pa.int64()
_PACK = np.int64(1) << np.int64(31)


def _segmented_intersect_elems(
    eid_a: np.ndarray, A: np.ndarray, eid_b: np.ndarray, B: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(eid, w) for every element in A-segment(i) ∩ B-segment(i) —
    the element-emitting sibling of triangles._segmented_intersect_counts
    (same composite-key searchsorted, same int64-overflow chunking)."""
    if len(A) == 0 or len(B) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    M = np.int64(max(int(A.max()), int(B.max())) + 1)
    n_edges = int(max(eid_a.max(), eid_b.max())) + 1
    chunk_edges = max(1, int((1 << 62) // M))
    out_e, out_w = [], []
    for lo in range(0, n_edges, chunk_edges):
        hi = min(n_edges, lo + chunk_edges)
        a0, a1 = np.searchsorted(eid_a, [lo, hi])
        b0, b1 = np.searchsorted(eid_b, [lo, hi])
        if a0 == a1 or b0 == b1:
            continue
        Ak = (eid_a[a0:a1] - lo) * M + A[a0:a1]
        Bk = (eid_b[b0:b1] - lo) * M + B[b0:b1]
        idx = np.searchsorted(Bk, Ak)
        idx_c = np.minimum(idx, len(Bk) - 1)
        match = (Bk[idx_c] == Ak) & (idx < len(Bk))
        out_e.append(eid_a[a0:a1][match])
        out_w.append(A[a0:a1][match])
    if not out_e:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(out_e), np.concatenate(out_w)


def _pack_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    if len(hi) and int(hi.max()) >= int(_PACK):
        raise ValueError("packed truss edge keys need vertex ids < 2**31")
    return lo * _PACK + hi


def edge_support(
    und: "ray.data.Dataset", num_partitions: int = 8, num_shards: int = 16
) -> "ray.data.Dataset":
    """Per-edge triangle support over a canonical undirected edge set
    ``(a, b), a < b``: returns ``(a, b, support)`` for every edge that
    closes >= 1 triangle (triangle-free edges are absent). Same join
    plan as triangles.triangle_count's scale path, but the segmented
    intersection EMITS the apex vertices so each triangle credits all
    three of its edges."""
    P = num_partitions
    und = compact_for_join(und, P)
    deg = compact_for_join(_degrees(und), P)

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
        if "a" not in t.column_names:
            return pa.table({"u": pa.array([], _I64), "v": pa.array([], _I64)})
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {"u": pa.array(np.where(a_first, a, b)), "v": pa.array(np.where(a_first, b, a))}
        )

    oriented = compact_for_join(j2.map_batches(orient, batch_format="pyarrow"), P)
    adj = compact_for_join(_build_adj_bsp(oriented, num_shards=P), P)

    e1 = oriented.join(adj, join_type="inner", num_partitions=P, on=("u",), right_on=("w",))

    def _e1_project(t: pa.Table) -> pa.Table:
        if "u" not in t.column_names:
            return pa.table(
                {"u": pa.array([], _I64), "v": pa.array([], _I64), "nbrs_u": pa.array([], pa.binary())}
            )
        return pa.table({"u": t.column("u"), "v": t.column("v"), "nbrs_u": t.column("nbrs")})

    e1 = compact_for_join(e1.map_batches(_e1_project, batch_format="pyarrow"), P)
    e2 = e1.join(adj, join_type="inner", num_partitions=P, on=("v",), right_on=("w",))

    def emit(t: pa.Table) -> pa.Table:
        if "nbrs_u" not in t.column_names or len(t) == 0:
            return pa.table({"key": pa.array([], _I64), "partial": pa.array([], _I64)})
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        nu = [np.frombuffer(x, dtype=np.int64) for x in t.column("nbrs_u").to_pylist()]
        nv = [np.frombuffer(y, dtype=np.int64) for y in t.column("nbrs").to_pylist()]
        lens_u = np.fromiter((len(x) for x in nu), dtype=np.int64, count=len(nu))
        lens_v = np.fromiter((len(x) for x in nv), dtype=np.int64, count=len(nv))
        A = np.concatenate(nu) if lens_u.sum() else np.zeros(0, np.int64)
        B = np.concatenate(nv) if lens_v.sum() else np.zeros(0, np.int64)
        eid_a = np.repeat(np.arange(len(t), dtype=np.int64), lens_u)
        eid_b = np.repeat(np.arange(len(t), dtype=np.int64), lens_v)
        eid, w = _segmented_intersect_elems(eid_a, A, eid_b, B)
        if len(eid) == 0:
            return pa.table({"key": pa.array([], _I64), "partial": pa.array([], _I64)})
        tu, tv = u[eid], v[eid]
        keys = np.concatenate(
            [_pack_pairs(tu, tv), _pack_pairs(tu, w), _pack_pairs(tv, w)]
        )
        # per-batch pre-aggregation keeps the BSP exchange at
        # O(distinct edges × blocks), not O(3 × triangles)
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(uk), "partial": pa.array(cnt.astype(np.int64))})

    partials = e2.map_batches(emit, batch_format="pyarrow")
    sup = count_i64_keys(
        partials, "key", num_shards=num_shards, count_col="support", weight_col="partial"
    )

    def unpack(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(k // _PACK),
                "b": pa.array(k % _PACK),
                "support": t.column("support"),
            }
        )

    return sup.map_batches(unpack, batch_format="pyarrow")


def ktruss(
    edges: "ray.data.Dataset",
    k: int,
    run_cfg: RunConfig | None = None,
    max_rounds: int = 64,
) -> "ray.data.Dataset":
    """The k-truss of ``edges`` (any directed/duplicated edge table;
    canonicalized first): returns ``(a, b, support)`` with a < b, one
    row per surviving edge, ``support`` = its triangle count WITHIN the
    truss (>= k-2 by construction). Raises after ``max_rounds``
    non-converged peel rounds."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3 (k=2 is just the triangle-free filter)")
    run_cfg = run_cfg or RunConfig()
    P = run_cfg.num_partitions
    out_schema = {"a": _I64, "b": _I64, "support": _I64}
    empty = ray.data.from_arrow(pa.table({c: pa.array([], t) for c, t in out_schema.items()}))

    und = compact_for_join(canonical_undirected(edges), P).materialize()
    m = und.count()
    thresh = k - 2
    for _ in range(max_rounds):
        if m == 0:
            return empty
        sup = edge_support(und, num_partitions=P, num_shards=max(2, P)).materialize()

        def keep(t: pa.Table) -> pa.Table:
            if "support" not in t.column_names or len(t) == 0:
                return pa.table({c: pa.array([], ty) for c, ty in out_schema.items()})
            mask = np.asarray(t.column("support").to_numpy(zero_copy_only=False)) >= thresh
            return t.filter(pa.array(mask))

        surv = (
            sup.map_batches(keep, batch_format="pyarrow")
            .map_batches(ensure_schema(out_schema), batch_format="pyarrow")
            .materialize()
        )
        m2 = surv.count()
        if m2 == m:
            return surv
        und = surv.drop_columns(["support"]).materialize()
        m = m2
    raise RuntimeError(f"k-truss peel did not converge within {max_rounds} rounds")
