"""Small shared utilities."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_HASH_K = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci multiplier


def tree_combine_refs(refs: list, combiner, fanin: int, *args) -> list:
    """Two-or-more-level fan-in: merge a per-shard list of payload
    ObjectRefs through ``combiner.remote(*args, group...)`` tasks in
    groups of ``fanin`` until at most ``fanin`` refs remain. ``fanin``
    <= 0 (or already few enough refs) returns the list unchanged — the
    flat path. Intermediate levels free their input refs as the loop
    rebinds the list, so the driver's live ref count stays O(B/fanin^d)
    while combiners run — the scale fix for the S x B flat fan-in bound
    (pagerank.py module docstring)."""
    if fanin and fanin > 0:
        while len(refs) > fanin:
            refs = [
                combiner.remote(*args, *refs[i : i + fanin])
                for i in range(0, len(refs), fanin)
            ]
    return refs


def _pack_pairs_block(t: pa.Table, col_a: str, col_b: str, S: int):
    """One gather task body: distinct packed (a<<32)|b keys of a block,
    split per shard (shard = multiplicative hash of the key — uniform
    even when the raw key space is clustered)."""
    if col_a not in t.column_names or len(t) == 0:
        return [None] * S
    a = t.column(col_a).to_numpy(zero_copy_only=False).astype(np.int64)
    b = t.column(col_b).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(a) and (
        a.min() < 0 or b.min() < 0 or a.max() >= (1 << 31) or b.max() >= (1 << 31)
    ):
        raise ValueError("distinct_i64_pairs needs ids in [0, 2^31)")
    with np.errstate(over="ignore"):
        u = np.unique((a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64))
        shard = ((u * _HASH_K) >> np.uint64(33)).astype(np.int64) % S
    order = np.argsort(shard, kind="stable")
    u, shard = u[order], shard[order]
    out: list = [None] * S
    for s in np.unique(shard):
        lo, hi = np.searchsorted(shard, [s, s + 1])
        out[int(s)] = u[lo:hi]
    return out


def distinct_i64_pairs(
    ds, col_a: str, col_b: str, num_shards: int = 16, out_a: str | None = None, out_b: str | None = None
):
    """Distinct (a, b) int64 rows via the per-shard BSP combine: gather
    tasks emit per-shard sorted unique packed keys (``num_returns=S``
    routes each straight to its reducer), reducers unique-merge and
    unpack. Replaces a two-column hash groupby whose AllToAll operator
    costs ~20 s per 1M rows on this Ray version.

    Requires both columns in [0, 2^31) (packed u64 key) — raises
    ValueError otherwise; callers with wider ids must fall back to
    ``groupby([a, b])``. Scale shape: reducer s holds only its distinct
    keys (≈ total/S); size ``num_shards`` to the cluster. Duplicates of
    one pair always land in one shard (hash of the full key).
    """
    import ray
    import ray.data

    S = max(2, num_shards)  # num_returns=1 would hand reducers the raw list
    gather = ray.remote(_pack_pairs_block)
    blocks = ds.materialize().to_arrow_refs()
    oa, ob = out_a or col_a, out_b or col_b

    @ray.remote
    def reduce(*parts):
        parts = [p for p in parts if p is not None]
        u = (
            np.unique(np.concatenate(parts)) if parts else np.zeros(0, dtype=np.uint64)
        )
        return pa.table(
            {
                oa: pa.array((u >> np.uint64(32)).astype(np.int64)),
                ob: pa.array((u & np.uint64(0xFFFFFFFF)).astype(np.int64)),
            }
        )

    gathers = [gather.options(num_returns=S).remote(b, col_a, col_b, S) for b in blocks]
    cols = [list(c) for c in zip(*gathers)]
    refs = [reduce.remote(*cols[s]) for s in range(S)]
    # errors (id-range ValueError) surface when the dataset is consumed;
    # callers wanting a groupby fallback catch RayTaskError at materialize
    return ray.data.from_arrow_refs(refs)


def _count_keys_block(t: pa.Table, col: str, S: int, weight_col: str | None = None):
    """Gather body for count_i64_keys: per-block (key, count) partials
    split per shard by multiplicative hash. With ``weight_col``, counts
    are SUMS of that int64 column instead of row counts (the combiner
    shape for pre-aggregated (key, partial_count) inputs)."""
    if col not in t.column_names or len(t) == 0:
        return [None] * S
    v = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
    if weight_col is not None:
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(v, return_inverse=True)
        c = np.bincount(inv, weights=w.astype(np.float64), minlength=len(u)).astype(np.int64)
    else:
        u, c = np.unique(v, return_counts=True)
    with np.errstate(over="ignore"):
        shard = ((u.astype(np.uint64) * _HASH_K) >> np.uint64(33)).astype(np.int64) % S
    order = np.argsort(shard, kind="stable")
    u, c, shard = u[order], c[order], shard[order]
    out: list = [None] * S
    for s in np.unique(shard):
        lo, hi = np.searchsorted(shard, [s, s + 1])
        out[int(s)] = (u[lo:hi], c[lo:hi])
    return out


def count_i64_keys(
    ds,
    col: str,
    num_shards: int = 16,
    count_col: str = "cnt",
    weight_col: str | None = None,
):
    """(key, count) per distinct int64 key — the per-shard BSP combine
    replacement for ``groupby(col).count()`` (partial counts per block,
    ``num_returns=S`` routing, merge-sum reducers). All values of one
    key land in one reducer; size num_shards to the cluster. With
    ``weight_col`` this becomes grouped SUM(weight) — feed it per-batch
    pre-aggregated (key, partial_count) rows to keep the exchange at
    O(vocab × blocks) instead of O(rows)."""
    import ray
    import ray.data

    S = max(2, num_shards)  # num_returns=1 would hand reducers the raw list
    gather = ray.remote(_count_keys_block)
    blocks = ds.materialize().to_arrow_refs()

    @ray.remote
    def reduce(*parts):
        parts = [p for p in parts if p is not None]
        if not parts:
            return pa.table({col: pa.array([], pa.int64()), count_col: pa.array([], pa.int64())})
        keys = np.concatenate([p[0] for p in parts])
        cnts = np.concatenate([p[1] for p in parts])
        u, inv = np.unique(keys, return_inverse=True)
        tot = np.bincount(inv, weights=cnts.astype(np.float64), minlength=len(u)).astype(np.int64)
        return pa.table({col: pa.array(u), count_col: pa.array(tot)})

    gathers = [gather.options(num_returns=S).remote(b, col, S, weight_col) for b in blocks]
    cols = [list(c) for c in zip(*gathers)]
    return ray.data.from_arrow_refs([reduce.remote(*cols[s]) for s in range(S)])


def _min_by_key_block(t: pa.Table, key_col: str, val_col: str, S: int):
    """Gather body for min_i64_by_key: per-block (key, min val) partials
    split per shard by multiplicative hash."""
    if key_col not in t.column_names or len(t) == 0:
        return [None] * S
    k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((v, k))
    k, v = k[order], v[order]
    first = np.ones(len(k), dtype=bool)
    first[1:] = k[1:] != k[:-1]
    k, v = k[first], v[first]
    with np.errstate(over="ignore"):
        shard = ((k.astype(np.uint64) * _HASH_K) >> np.uint64(33)).astype(np.int64) % S
    order = np.argsort(shard, kind="stable")
    k, v, shard = k[order], v[order], shard[order]
    out: list = [None] * S
    for s in np.unique(shard):
        lo, hi = np.searchsorted(shard, [s, s + 1])
        out[int(s)] = (k[lo:hi], v[lo:hi])
    return out


def min_i64_by_key(ds, key_col: str, val_col: str, num_shards: int = 16):
    """(key, min(val)) per distinct int64 key — the per-shard BSP
    combine replacement for ``groupby(key).min(val)`` (the argmin
    shuffle of the walk engine: pack (priority, payload) into val and
    the min IS the argmin). Same shape as ``count_i64_keys``: per-block
    partial mins, ``num_returns=S`` routing, merge-min reducers — the
    exchange is O(distinct keys × blocks), never O(rows)."""
    import ray
    import ray.data

    S = max(2, num_shards)
    gather = ray.remote(_min_by_key_block)
    blocks = ds.materialize().to_arrow_refs()

    @ray.remote
    def reduce(*parts):
        parts = [p for p in parts if p is not None]
        if not parts:
            return pa.table(
                {key_col: pa.array([], pa.int64()), val_col: pa.array([], pa.int64())}
            )
        keys = np.concatenate([p[0] for p in parts])
        vals = np.concatenate([p[1] for p in parts])
        order = np.lexsort((vals, keys))
        keys, vals = keys[order], vals[order]
        first = np.ones(len(keys), dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        return pa.table({key_col: pa.array(keys[first]), val_col: pa.array(vals[first])})

    gathers = [gather.options(num_returns=S).remote(b, key_col, val_col, S) for b in blocks]
    cols = [list(c) for c in zip(*gathers)]
    return ray.data.from_arrow_refs([reduce.remote(*cols[s]) for s in range(S)])


def _sum_payload_block(t: pa.Table, key_col: str, weight_cols, payload_cols, S: int):
    """Gather body for sum_i64_keys_with_payload: per-block (key,
    Σweights, first payload row) partials split per shard by
    multiplicative hash; each shard slice ships as a small pa.Table
    (payloads may be strings)."""
    if key_col not in t.column_names or len(t) == 0:
        return [None] * S
    k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    u, idx, inv = np.unique(k, return_index=True, return_inverse=True)
    sums = {}
    for wc in weight_cols:
        w = t.column(wc).to_numpy(zero_copy_only=False).astype(np.int64)
        sums[wc] = np.bincount(inv, weights=w.astype(np.float64), minlength=len(u)).astype(
            np.int64
        )
    pay = t.select(payload_cols).take(pa.array(idx))
    part = pa.table(
        {key_col: pa.array(u)}
        | {wc: pa.array(sums[wc]) for wc in weight_cols}
        | {p: pay.column(p) for p in payload_cols}
    )
    with np.errstate(over="ignore"):
        shard = ((u.astype(np.uint64) * _HASH_K) >> np.uint64(33)).astype(np.int64) % S
    order = np.argsort(shard, kind="stable")
    part, shard = part.take(pa.array(order)), shard[order]
    out: list = [None] * S
    for s in np.unique(shard):
        lo, hi = np.searchsorted(shard, [s, s + 1])
        out[int(s)] = part.slice(lo, hi - lo)
    return out


def sum_i64_keys_with_payload(
    ds, key_col: str, weight_col, payload_cols: "list[str]", num_shards: int = 16
):
    """(key, Σweight(s), payload...) per distinct int64 key — the
    string-carrying sibling of ``count_i64_keys(weight_col=...)`` for
    collapsed outputs keyed by a hash of their own payload (host pairs,
    canonical strings): payload columns MUST be functionally determined
    by the key (any representative is the same row), so reducers keep
    the first occurrence. ``weight_col`` may be one name or a list —
    each is summed per key independently (the multi-counter form, e.g.
    per-split word counts). Same BSP shape: per-block partials,
    ``num_returns=S`` routing, merge reducers; the exchange is
    O(distinct keys × blocks) rows of (key, weights, payload)."""
    import ray
    import ray.data

    weight_cols = [weight_col] if isinstance(weight_col, str) else list(weight_col)
    S = max(2, num_shards)
    gather = ray.remote(_sum_payload_block)

    blocks = ds.materialize().to_arrow_refs()
    empty = pa.table(
        {key_col: pa.array([], pa.int64())}
        | {wc: pa.array([], pa.int64()) for wc in weight_cols}
        | {p: pa.array([], pa.string()) for p in payload_cols}
    )

    @ray.remote
    def reduce(*parts):
        parts = [p for p in parts if p is not None and len(p) > 0]
        if not parts:
            return empty
        tbl = pa.concat_tables(parts).combine_chunks()
        k = tbl.column(key_col).to_numpy(zero_copy_only=False)
        u, idx, inv = np.unique(k, return_index=True, return_inverse=True)
        tots = {}
        for wc in weight_cols:
            w = tbl.column(wc).to_numpy(zero_copy_only=False)
            tots[wc] = np.bincount(
                inv, weights=w.astype(np.float64), minlength=len(u)
            ).astype(np.int64)
        pay = tbl.select(payload_cols).take(pa.array(idx))
        return pa.table(
            {key_col: pa.array(u)}
            | {wc: pa.array(tots[wc]) for wc in weight_cols}
            | {p: pay.column(p) for p in payload_cols}
        )

    gathers = [
        gather.options(num_returns=S).remote(b, key_col, weight_cols, payload_cols, S)
        for b in blocks
    ]
    cols = [list(c) for c in zip(*gathers)]
    return ray.data.from_arrow_refs([reduce.remote(*cols[s]) for s in range(S)])


def compact_for_join(ds, num_partitions: int):
    """Compact a Dataset so Dataset.join can consume it.

    Ray Data 2.49.2's hash-join finalize fails with ArrowInvalid
    ("No match ... for key field") when an input dataset contains
    0-row blocks (typed or not). Repartition to at most one block per
    row so every block is non-empty. Costs a rebalance pass — only the
    block *layout* moves; at scale num_partitions << rows so this is a
    plain repartition any join would want anyway.
    """
    m = ds.materialize()
    rows = m.count()  # free: metadata of the materialized dataset
    nb = max(1, min(num_partitions, rows))
    return m.repartition(nb)  # lazy; the consuming join executes it


def pack_sorted_keys(ds, col: str):
    """Pack a Dataset column into ONE sorted int64 array inside a REMOTE
    task and return the ObjectRef — the small-side-broadcast shape
    (triangles.py's _pack_degree_lookup): the driver only ever holds the
    ref, never the rows. Feed the ref straight to semi_join_filter."""
    import numpy as np

    import ray

    @ray.remote
    def _pack(*blocks):
        vals = [
            b.column(col).to_numpy(zero_copy_only=False)
            for b in blocks
            if col in b.column_names and len(b) > 0
        ]
        return np.sort(np.concatenate(vals)) if vals else np.zeros(0, dtype=np.int64)

    return _pack.remote(*ds.materialize().to_arrow_refs())


def semi_join_filter(ds, col: str, keys, keep: bool = True):
    """Semi (keep=True) / anti (keep=False) join against a small key set:
    broadcast the keys once via ray.put, filter inside map_batches —
    no shuffle (guide's semi/anti-join pattern; a Bloom filter swaps in
    for the exact set at larger key counts). ``keys`` may be an array
    (put from the driver) or an ObjectRef to a pre-SORTED array packed
    remotely (pack_sorted_keys) — the no-driver-gather path."""
    import numpy as np

    import ray

    if isinstance(keys, ray.ObjectRef):
        ref = keys
    else:
        arr = np.sort(np.asarray(keys if isinstance(keys, np.ndarray) else list(keys)))
        ref = ray.put(arr)

    def fn(t: pa.Table) -> pa.Table:
        if col not in t.column_names:
            return t
        ks = ray.get(ref)
        vals = t.column(col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, vals)
        idx[idx >= len(ks)] = len(ks) - 1 if len(ks) else 0
        present = (ks[idx] == vals) if len(ks) else np.zeros(len(vals), dtype=bool)
        return t.filter(pa.array(present if keep else ~present))

    return ds.map_batches(fn, batch_format="pyarrow")


def ensure_schema(schema: dict[str, pa.DataType]):
    """map_batches fn that re-asserts a fixed schema on every block.

    Ray Data's hash-shuffle/aggregate operators can emit 0-row blocks
    with an EMPTY schema (observed on 2.49.2); Acero hash joins then
    fail with "No match ... for key field". Pass the output of any
    groupby that feeds a join through this to pin the schema. Non-empty
    blocks must already contain the named columns.
    """

    def fn(t: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in schema.items():
            if name in t.column_names:
                col = t.column(name)
                cols[name] = col.cast(typ) if col.type != typ else col
            else:
                if len(t) != 0:
                    raise KeyError(f"column {name} missing from non-empty block")
                cols[name] = pa.array([], typ)
        return pa.table(cols)

    return fn


def topk_rows(ds, keys: "list[tuple[str, bool]]", k: int):
    """Exact top-k rows by numeric sort keys WITHOUT the full-sort
    shuffle: per-block vectorized partial top-k (each block needs only
    its own best k), then one remote merge of the tiny partials —
    #blocks × k rows through the object store instead of an AllToAll
    sort of the whole dataset (each AllToAll costs seconds of fixed
    startup here before moving a byte, and a full sort moves ALL of
    them).

    ``keys``: [(column, descending), ...] — numeric columns only
    (ints/floats/timestamps-as-int); callers must include a unique
    tiebreaker column for a deterministic result (the same contract a
    sort-based top-k has). Returns a single-block Dataset.
    """
    import numpy as np

    import ray
    import ray.data

    def _top_idx(t: pa.Table) -> "np.ndarray":
        cols = []
        for name, desc in reversed(keys):  # lexsort: last key is primary
            v = t.column(name).to_numpy(zero_copy_only=False)
            if not np.issubdtype(v.dtype, np.number):
                raise TypeError(f"topk_rows needs numeric keys; {name} is {v.dtype}")
            cols.append(-v if desc else v)
        return np.lexsort(cols)[:k]

    def part(t: pa.Table) -> pa.Table:
        if keys[0][0] not in t.column_names or len(t) == 0:
            return t.slice(0, 0)
        return t.take(pa.array(_top_idx(t)))

    partials = ds.map_batches(part, batch_format="pyarrow").materialize()

    @ray.remote
    def merge(*blocks):
        bl = [b for b in blocks if len(b) > 0 and keys[0][0] in b.column_names]
        if not bl:  # all-empty input: keep whatever typed schema exists
            return pa.concat_tables(list(blocks), promote_options="default")
        t = pa.concat_tables(bl, promote_options="default")
        return t.take(pa.array(_top_idx(t)))

    return ray.data.from_arrow_refs([merge.remote(*partials.to_arrow_refs())])


def _topk_group_cut(g, k):
    """Vectorized per-group head-k over PRE-SORTED arrays: rank within
    run = arange - run_start; returns the keep mask."""
    n = len(g)
    if n == 0:
        return np.zeros(0, dtype=bool)
    new = np.ones(n, dtype=bool)
    new[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(new)
    run_id = np.cumsum(new) - 1
    rank = np.arange(n) - starts[run_id]
    return rank < k


def grouped_topk_i64(ds, group_col: str, value_col: str, tie_cols: "list[str]", k: int, num_shards: int = 16):
    """Top-k rows per group by (value desc, tie_cols asc) — the grouped
    sibling of ``topk_rows``, as a per-shard BSP: each block contributes
    at most k candidate rows per group (vectorized lexsort + run cut),
    hash-routed by group to reducers that re-sort and cut k. All
    columns must be int64; the exchange is O(groups × k × blocks),
    never O(rows). Output columns (group_col, value_col, *tie_cols),
    fully ordered (group asc, value desc, ties asc)."""
    import ray
    import ray.data

    cols = [group_col, value_col, *tie_cols]
    S = max(2, num_shards)

    def _sort_cut(t: pa.Table):
        g = t.column(group_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ties = [
            t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in tie_cols
        ]
        order = np.lexsort(tuple(reversed([g, -v, *ties])))
        arrs = [a[order] for a in (g, v, *ties)]
        keep = _topk_group_cut(arrs[0], k)
        return [a[keep] for a in arrs]

    def _block(t: pa.Table, S_: int):
        if group_col not in t.column_names or len(t) == 0:
            return [None] * S_
        arrs = _sort_cut(t)
        g = arrs[0]
        with np.errstate(over="ignore"):
            shard = ((g.astype(np.uint64) * _HASH_K) >> np.uint64(33)).astype(np.int64) % S_
        order = np.argsort(shard, kind="stable")
        arrs = [a[order] for a in arrs]
        shard = shard[order]
        out: list = [None] * S_
        for s in np.unique(shard):
            lo, hi = np.searchsorted(shard, [s, s + 1])
            out[int(s)] = pa.table({c: pa.array(a[lo:hi]) for c, a in zip(cols, arrs)})
        return out

    gather = ray.remote(_block)
    blocks = ds.materialize().to_arrow_refs()
    empty = pa.table({c: pa.array([], pa.int64()) for c in cols})

    @ray.remote
    def reduce(*parts):
        parts = [p for p in parts if p is not None and len(p) > 0]
        if not parts:
            return empty
        t = pa.concat_tables(parts).combine_chunks()
        arrs = _sort_cut(t)
        return pa.table({c: pa.array(a) for c, a in zip(cols, arrs)})

    gathers = [gather.options(num_returns=S).remote(b, S) for b in blocks]
    colrefs = [list(c) for c in zip(*gathers)]
    return ray.data.from_arrow_refs([reduce.remote(*colrefs[s]) for s in range(S)])
