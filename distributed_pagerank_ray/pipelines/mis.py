"""Maximal independent set via Luby-style priority rounds.

A symmetric-graph capability beyond the reference's PageRank-only
scope (lioia/distributed-pagerank, pkg/graph/pagerank.go): select a
set of vertices no two of which are adjacent, maximal (every other
vertex has a neighbor in the set). The classic distributed use is
conflict-free scheduling (e.g. picking a non-overlapping subset of
near-dup clusters or crawl shards to process concurrently).

Algorithm — the deterministic-permutation variant of Luby's algorithm:
each round r assigns every still-active vertex a PRIORITY from a
quadratic hash of (v, r) (affine maps have lattice-correlated parity —
the repo-wide hash rule), tie-broken by v so priorities are total.
A vertex joins the MIS iff its priority is strictly smaller than every
ACTIVE neighbor's; winners and their neighbors then leave the active
set. Terminates in O(log n) rounds in expectation; ``max_rounds``
exhaustion raises (fail loudly, never return a non-maximal set).

Execution shape per round, all Dataset ops:
  - priorities: one map over the active set;
  - both-active edge annotate: sym ⋈ prio(src) ⋈ prio(dst)
    (a dead endpoint simply has no prio row, so the joins ARE the
    active-subgraph filter — no separate edge shrink);
  - neighbor min: ``util.min_i64_by_key`` over (dst, p_src), unioned
    with a (v, +BIG) row per active vertex so isolated vertices win
    without an outer join (Ray full/left outer coalesces key columns —
    the repo's validity landmine — so we avoid outer joins entirely);
  - winners: inner join prio ⋈ neighbor-min, keep p < min;
  - deactivate: active LEFT ANTI (winners ∪ their neighbors).

The symmetric edge table is rescanned per round (joins against the
shrinking prio set do the filtering); for graphs where many rounds
survive, a periodic semi-filter of ``sym`` against the active set
would bound that rescan — documented trade, not needed at the
O(log n) round counts this targets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..util import compact_for_join, ensure_schema, min_i64_by_key

_I64 = pa.int64()
_BIG = np.int64(1) << 62  # > any priority (< 2**43)

#: stats of the last mis_luby call: {"rounds"}.
LAST_STATS: dict = {}


def _priority(v: np.ndarray, r: int) -> np.ndarray:
    """Quadratic per-round hash, total-ordered by the v tie-break.
    w is folded below 2**15 so w²·A stays inside int64 exactly — the
    SQL oracle must be able to mirror the arithmetic overflow-free."""
    w = (v + np.int64(r) * 1000003) % 32768
    h = (w * w * 1315423911 + w * 2654435761 + 12345) % 2147483647
    return h * 4096 + v


def _project(ds, mapping: dict[str, str]):
    out_cols = list(mapping.items())

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or out_cols[0][1] not in t.column_names:
            return pa.table({o: pa.array([], _I64) for o, _ in out_cols})
        return pa.table({o: t.column(i).cast(_I64) for o, i in out_cols})

    return ds.map_batches(fn, batch_format="pyarrow")


def mis_luby(
    edges: "ray.data.Dataset",
    vertices: "ray.data.Dataset",
    num_partitions: int = 4,
    num_shards: int = 4,
    max_rounds: int = 64,
) -> "ray.data.Dataset":
    """Single-column (v) Dataset: a maximal independent set of the
    UNDIRECTED graph ``edges`` (src, dst; symmetrized here, self-loops
    dropped) over ``vertices`` (column ``v``, must cover endpoints).
    Deterministic: same input, same set."""
    global LAST_STATS
    P, S = num_partitions, num_shards
    stats = {"rounds": 0}
    LAST_STATS = stats

    def desym(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)})
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d])),
                "dst": pa.array(np.concatenate([d, s])),
            }
        )

    sym = compact_for_join(
        edges.map_batches(desym, batch_format="pyarrow"), P
    ).materialize()
    active = _project(vertices, {"v": "v"}).materialize()
    if sym.count() == 0:  # edgeless: every vertex is the MIS (and a
        # fully-empty Dataset cannot enter a hash join — the landmine)
        stats["rounds"] = 1
        return active.map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")
    mis_parts: list = []

    for r in range(max_rounds):
        if active.count() == 0:
            break
        stats["rounds"] += 1

        def prio_fn(t: pa.Table, _r=r) -> pa.Table:
            if len(t) == 0 or "v" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "p": pa.array([], _I64)})
            v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"v": pa.array(v), "p": pa.array(_priority(v, _r))})

        prio = compact_for_join(
            active.map_batches(prio_fn, batch_format="pyarrow"), P
        ).materialize()

        # both-active edges, annotated with the src priority
        m1 = sym.join(
            _project_prio(prio, "sv", "sp", P),
            join_type="inner",
            num_partitions=P,
            on=("src",),
            right_on=("sv",),
        )
        # pin the schema between chained joins (a join can emit 0-row
        # EMPTY-SCHEMA blocks that break the next join's key lookup)
        m1 = m1.map_batches(
            ensure_schema({"dst": _I64, "sp": _I64}), batch_format="pyarrow"
        )
        m2 = compact_for_join(m1, P).join(
            _project_prio(prio, "dv", "dp", P),
            join_type="inner",
            num_partitions=P,
            on=("dst",),
            right_on=("dv",),
        )
        cand = _project(m2, {"v": "dst", "p": "sp"})
        # isolated actives get a +BIG sentinel row instead of an outer join
        sentinel = prio.map_batches(
            lambda t: pa.table(
                {
                    "v": t.column("v").cast(_I64),
                    "p": pa.array(np.full(len(t), _BIG, np.int64)),
                }
            )
            if len(t) and "v" in t.column_names
            else pa.table({"v": pa.array([], _I64), "p": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
        nmin = min_i64_by_key(cand.union(sentinel), "v", "p", num_shards=S)

        win = compact_for_join(prio, P).join(
            compact_for_join(_project(nmin, {"nv": "v", "np": "p"}), P),
            join_type="inner",
            num_partitions=P,
            on=("v",),
            right_on=("nv",),
        )

        def keep_win(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "p" not in t.column_names:
                return pa.table({"v": pa.array([], _I64)})
            import pyarrow.compute as pc

            return pa.table(
                {"v": t.filter(pc.less(t.column("p"), t.column("np"))).column("v").cast(_I64)}
            )

        winners = win.map_batches(keep_win, batch_format="pyarrow").materialize()
        mis_parts.append(winners)

        nbrs = compact_for_join(sym, P).join(
            compact_for_join(_project(winners, {"wv": "v"}), P),
            join_type="inner",
            num_partitions=P,
            on=("src",),
            right_on=("wv",),
        )
        killed = winners.union(_project(nbrs, {"v": "dst"}))
        survivors = compact_for_join(active, P).join(
            compact_for_join(_project(killed, {"kv": "v"}), P),
            join_type="left_anti",
            num_partitions=P,
            on=("v",),
            right_on=("kv",),
        )
        active = _project(survivors, {"v": "v"}).materialize()
    else:
        raise RuntimeError(
            f"mis_luby did not empty the active set within max_rounds="
            f"{max_rounds} (raise the cap; the set built so far is "
            "independent but possibly not maximal)"
        )

    out = ray.data.from_arrow(pa.table({"v": pa.array([], _I64)}))
    for p in mis_parts:
        out = out.union(p)
    return out.map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")


def _project_prio(prio, vname: str, pname: str, P: int):
    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "v" not in t.column_names:
            return pa.table({vname: pa.array([], _I64), pname: pa.array([], _I64)})
        return pa.table({vname: t.column("v").cast(_I64), pname: t.column("p").cast(_I64)})

    return compact_for_join(prio.map_batches(fn, batch_format="pyarrow"), P)
