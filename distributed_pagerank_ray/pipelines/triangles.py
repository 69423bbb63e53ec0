"""Exact triangle counting — degree-ordered orientation + hash joins.

Reference has no triangle counting (SURVEY §2.5); mandated by the
north rule. Standard scalable algorithm (node-iterator++ / the
"compact-forward" orientation):

1. canonicalize: undirected distinct edges (a<b), self-loops dropped,
2. undirected degree per vertex (one groupby-count),
3. orient each edge from the endpoint that is smaller under the total
   order (degree, id) → a DAG where every vertex's out-degree is
   O(sqrt(m)), which bounds adjacency-list length and tames hub skew,
4. adjacency lists per source via the per-shard BSP combine
   (``_build_adj_bsp``: hash-routed gather tasks + per-shard lexsort +
   segment boundaries — no per-vertex ``map_groups``),
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
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..config import RunConfig
from ..util import compact_for_join, distinct_i64_pairs, ensure_schema

_I64 = pa.int64()


def _expand_segments(starts: np.ndarray, lens: np.ndarray, flat: np.ndarray):
    """Gather per-edge variable-length segments of ``flat`` into one
    concatenated array + the edge id of every element (all vectorized:
    np.repeat + cumsum offset trick, no per-edge loop)."""
    total = int(lens.sum())
    eid = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    ofs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
    return eid, flat[starts[eid] + ofs]


def _segmented_intersect_counts(
    eid_a: np.ndarray, A: np.ndarray, eid_b: np.ndarray, B: np.ndarray, n_edges: int
) -> np.ndarray:
    """counts[i] = |A-segment(i) ∩ B-segment(i)| where both segments are
    sorted and elements are tagged with their edge id. One composite-key
    searchsorted over the whole batch — the vectorized replacement for a
    per-edge np.intersect1d loop. Chunks the A side if edge_id·M could
    overflow int64 (M = value range bound)."""
    out = np.zeros(n_edges, dtype=np.int64)
    if len(A) == 0 or len(B) == 0:
        return out
    M = np.int64(max(int(A.max()), int(B.max())) + 1)
    chunk_edges = max(1, int((1 << 62) // M))  # normally one chunk
    for lo in range(0, n_edges, chunk_edges):
        hi = min(n_edges, lo + chunk_edges)
        a0, a1 = np.searchsorted(eid_a, [lo, hi])  # eid arrays are sorted
        b0, b1 = np.searchsorted(eid_b, [lo, hi])
        if a0 == a1 or b0 == b1:
            continue
        Ak = (eid_a[a0:a1] - lo) * M + A[a0:a1]
        Bk = (eid_b[b0:b1] - lo) * M + B[b0:b1]
        idx = np.searchsorted(Bk, Ak)
        idx_c = np.minimum(idx, len(Bk) - 1)
        match = (Bk[idx_c] == Ak) & (idx < len(Bk))
        out[lo:hi] = np.bincount(eid_a[a0:a1][match] - lo, minlength=hi - lo)
    return out


def _adj_gather_block(t: pa.Table, S: int):
    """Gather body for _build_adj_bsp: per-block (u, v) pairs split per
    shard by multiplicative hash of u (all edges of one source land in
    one reducer)."""
    if "u" not in t.column_names or len(t) == 0:
        return [None] * S
    u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
    v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
    from ..util import _HASH_K

    with np.errstate(over="ignore"):
        shard = ((u.astype(np.uint64) * _HASH_K) >> np.uint64(33)).astype(np.int64) % S
    order = np.argsort(shard, kind="stable")
    u, v, shard = u[order], v[order], shard[order]
    out: list = [None] * S
    for s in np.unique(shard):
        lo, hi = np.searchsorted(shard, [s, s + 1])
        out[int(s)] = (u[lo:hi], v[lo:hi])
    return out


def _build_adj_bsp(oriented: "ray.data.Dataset", num_shards: int = 16) -> "ray.data.Dataset":
    """(w, nbrs) adjacency rows — sorted neighbor lists encoded as
    little-endian int64 binary blobs (Acero hash joins reject list<>
    payloads but pass binary through).

    Per-shard BSP combine (the distinct_i64_pairs shape): gather tasks
    route each source's edges to its reducer via ``num_returns=S``;
    each reducer lexsorts its (u, v) pairs once, finds segment
    boundaries with one np.diff pass, and emits the whole shard's
    adjacency as ONE Arrow binary column built zero-copy from
    (offsets, data) buffers. Replaces ``groupby('u').map_groups`` —
    one pandas group per source vertex, the many-tiny-groups shape
    this Ray version handles catastrophically (and this path only
    activates above ``broadcast_threshold`` vertices, where it's
    worst)."""
    import ray
    import ray.data

    S = max(2, num_shards)
    gather = ray.remote(_adj_gather_block)
    blocks = oriented.materialize().to_arrow_refs()

    @ray.remote
    def reduce(*parts):
        parts = [p for p in parts if p is not None]
        if not parts:
            return pa.table({"w": pa.array([], _I64), "nbrs": pa.array([], pa.binary())})
        u = np.concatenate([p[0] for p in parts])
        v = np.concatenate([p[1] for p in parts])
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        first = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        bounds = np.concatenate((first, [len(u)])).astype(np.int64)
        if bounds[-1] * 8 >= (1 << 31):
            raise ValueError(
                "adjacency shard exceeds 2 GiB of neighbor data; raise num_shards"
            )
        nbrs = pa.Array.from_buffers(
            pa.binary(),
            len(first),
            [None, pa.py_buffer((bounds * 8).astype(np.int32).tobytes()), pa.py_buffer(v.tobytes())],
        )
        return pa.table({"w": pa.array(u[first]), "nbrs": nbrs})

    gathers = [gather.options(num_returns=S).remote(b, S) for b in blocks]
    cols = [list(c) for c in zip(*gathers)]
    return ray.data.from_arrow_refs([reduce.remote(*cols[s]) for s in range(S)])


def canonical_undirected(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(src,dst) → distinct (a,b) with a<b, self-loops removed.

    Distinct runs as the per-shard BSP combine (``distinct_i64_pairs``
    — raw gather tasks + per-shard unique-merge reducers) when ids fit
    [0, 2^31); falls back to the 2-column hash groupby otherwise (Ray's
    AllToAll aggregate is ~20 s/1M rows here, so the BSP path matters)."""

    def norm(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {"a": pa.array(np.minimum(s, d)), "b": pa.array(np.maximum(s, d))}
        )

    normed = edges.map_batches(norm, batch_format="pyarrow")
    try:
        from ray.exceptions import RayTaskError

        return distinct_i64_pairs(normed, "a", "b").materialize()
    except (RayTaskError, ValueError):
        return (
            normed.groupby(["a", "b"])
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

    adj = compact_for_join(_build_adj_bsp(oriented, num_shards=P), P)
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
        if "nbrs_u" not in t.column_names or len(t) == 0:
            return pa.table({"tri": pa.array([], _I64)})
        # decode the binary neighbor blobs into two flat arrays + segment
        # lengths, then one vectorized segmented intersection
        nu = [np.frombuffer(x, dtype=np.int64) for x in t.column("nbrs_u").to_pylist()]
        nv = [np.frombuffer(y, dtype=np.int64) for y in t.column("nbrs").to_pylist()]
        lens_u = np.fromiter((len(a) for a in nu), dtype=np.int64, count=len(nu))
        lens_v = np.fromiter((len(a) for a in nv), dtype=np.int64, count=len(nv))
        A = np.concatenate(nu) if lens_u.sum() else np.zeros(0, dtype=np.int64)
        B = np.concatenate(nv) if lens_v.sum() else np.zeros(0, dtype=np.int64)
        eid_a = np.repeat(np.arange(len(t), dtype=np.int64), lens_u)
        eid_b = np.repeat(np.arange(len(t), dtype=np.int64), lens_v)
        counts = _segmented_intersect_counts(eid_a, A, eid_b, B, len(t))
        return pa.table({"tri": pa.array(counts)})

    counted = e2.map_batches(intersect, batch_format="pyarrow")
    total = counted.sum("tri")
    return int(total) if total is not None else 0


@ray.remote
def _pack_degree_lookup(*blocks: pa.Table):
    """(sorted vertex ids, parallel degree array) — built in a REMOTE
    task from the degree dataset's block refs; the driver only ever
    holds the ObjectRef (small-side-broadcast without driver rows)."""
    blocks = [b for b in blocks if len(b) > 0]
    ids = np.concatenate([b.column("v").to_numpy(zero_copy_only=False) for b in blocks])
    dg = np.concatenate([b.column("deg").to_numpy(zero_copy_only=False) for b in blocks])
    order = np.argsort(ids)
    return ids[order], dg[order]


@ray.remote
def _build_csr(deg_pack, *blocks: pa.Table):
    """Oriented CSR indexed by DENSE VERTEX RANK (position in the sorted
    id array): bounds[r]..bounds[r+1] slices the sorted neighbor-rank
    list of vertex rank r (empty for sinks). Built remotely from the
    oriented dataset's block refs — O(m) memory lives in one worker +
    the object store, never the driver."""
    ids, _ = deg_pack
    n = len(ids)
    blocks = [b for b in blocks if len(b) > 0]
    if not blocks:
        return np.zeros(n + 1, dtype=np.int64), np.zeros(0, dtype=np.int64), n
    u = np.concatenate([b.column("u").to_numpy(zero_copy_only=False) for b in blocks])
    v = np.concatenate([b.column("v").to_numpy(zero_copy_only=False) for b in blocks])
    ur = np.searchsorted(ids, u)
    vr = np.searchsorted(ids, v)
    order = np.lexsort((vr, ur))
    ur, vr = ur[order], vr[order]
    bounds = np.concatenate([[0], np.cumsum(np.bincount(ur, minlength=n))]).astype(np.int64)
    return bounds, vr.astype(np.int64), n


def _triangle_count_broadcast(und: "ray.data.Dataset", deg: "ray.data.Dataset") -> int:
    """Small-vertex-set path: degree lookup and oriented CSR adjacency
    are packed by REMOTE tasks (the driver handles only ObjectRefs),
    broadcast once, and every batch counts its edges' triangles with
    one vectorized segmented intersection. Two data passes, zero hash
    joins, no per-row Python loops."""
    deg_ref = _pack_degree_lookup.remote(*deg.materialize().to_arrow_refs())

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
    csr_ref = _build_csr.remote(deg_ref, *oriented.to_arrow_refs())

    def intersect(t: pa.Table) -> pa.Table:
        if "u" not in t.column_names or len(t) == 0:
            return pa.table({"tri": pa.array([], _I64)})
        sids, _ = ray.get(deg_ref)
        bounds, nbrs, n = ray.get(csr_ref)
        u = np.searchsorted(sids, t.column("u").to_numpy(zero_copy_only=False))
        v = np.searchsorted(sids, t.column("v").to_numpy(zero_copy_only=False))
        lens_u = bounds[u + 1] - bounds[u]
        lens_v = bounds[v + 1] - bounds[v]
        eid_a, A = _expand_segments(bounds[u], lens_u, nbrs)
        eid_b, B = _expand_segments(bounds[v], lens_v, nbrs)
        counts = _segmented_intersect_counts(eid_a, A, eid_b, B, len(t))
        return pa.table({"tri": pa.array([int(counts.sum())], _I64)})

    total = oriented.map_batches(intersect, batch_format="pyarrow", batch_size=4096).sum("tri")
    return int(total) if total is not None else 0
