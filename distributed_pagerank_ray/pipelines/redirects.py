"""Redirect-chain resolution by pointer doubling.

Crawl-stack capability beyond the reference's PageRank-only scope
(lioia/distributed-pagerank resolves nothing — its edge list is taken
as-is, pkg/graph/graph.go:16-33): a crawl frontier records HTTP
redirects as a functional mapping ``src -> dst`` (at most one target
per source); link-graph construction wants every URL collapsed to its
TERMINAL destination plus the hop count (301-chain depth is itself a
spam / quality signal).

Algorithm — pointer doubling over the functional graph, the same
``p <- p[p]`` jump the Boruvka contraction uses (pipelines/mst.py:311)
but carrying a HOP DISTANCE payload: each vertex holds ``(p, d)`` =
(current pointer, hops consumed so far); one exchange replaces it with
``(p[p], d + d[p])``. Terminals (targets that never appear as a
source) enter as self-loops ``(t, t, 0)`` so the pointer table is
CLOSED — every join probe hits. Chains of length L resolve in
ceil(log2 L) + 1 exchanges, each one Acero join + one changed-count —
O(log L) all-to-alls regardless of chain length, vs the O(L) rounds a
naive one-hop-per-iteration walk would pay at web scale where
redirect chains are short but the long tail is adversarial.

Cycles (redirect loops, a real crawl pathology) never reach a
fixpoint under doubling; ``max_rounds`` exhaustion raises — the raise
IS the loop detector, the dagdepth.py idiom. 2^64-length chains are
out of scope by construction.

Join landmines honored (CLAUDE.md): ``compact_for_join`` both sides,
``ensure_schema`` pins between chained joins, per-round materialize
(lineage cut), no outer joins anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..util import compact_for_join, count_i64_keys, ensure_schema

_I64 = pa.int64()

#: stats of the last resolve_redirects call: {"jump_rounds"}.
LAST_STATS: dict = {}


def _proj(ds, mapping: dict[str, str]):
    out = list(mapping.items())

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or out[0][1] not in t.column_names:
            return pa.table({o: pa.array([], _I64) for o, _ in out})
        return pa.table({o: t.column(i).cast(_I64) for o, i in out})

    return ds.map_batches(fn, batch_format="pyarrow")


def resolve_redirects(
    redirects: "ray.data.Dataset",
    num_partitions: int = 8,
    num_shards: int = 4,
    max_rounds: int = 64,
) -> "ray.data.Dataset":
    """Resolve a functional redirect table to terminals.

    ``redirects``: columns ``src``/``dst`` (int64 URL ids; mint string
    URLs first, graphbuild's id-minting idiom), AT MOST ONE dst per
    src — duplicate sources are a data error upstream of this op.

    Returns one row per URL id seen on EITHER side:
    ``url_id`` (int64), ``final_id`` (terminal of its chain, int64),
    ``n_hops`` (redirects followed, int64; 0 for terminals).

    Raises RuntimeError when ``max_rounds`` doublings do not reach a
    fixpoint — a redirect CYCLE (doubling can never settle on one).
    """
    global LAST_STATS
    P, S = num_partitions, num_shards
    stats = {"jump_rounds": 0}
    LAST_STATS = stats

    srcs = _proj(redirects, {"k": "src"})
    dsts = _proj(redirects, {"k": "dst"})
    # terminals = distinct dsts that are not srcs (distinct via the
    # count-BSP — any-int64 keys; left_anti drops redirecting targets)
    # distinct dsts via the count-BSP (output keeps the input col name)
    dst_distinct = _proj(count_i64_keys(dsts, "k", num_shards=S), {"k": "k"})
    terminals = compact_for_join(dst_distinct, P).join(
        compact_for_join(_proj(srcs, {"sk": "k"}), P),
        join_type="left_anti",
        num_partitions=P,
        on=("k",),
        right_on=("sk",),
    )

    def seed_redirect(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return pa.table(
                {"c": pa.array([], _I64), "p": pa.array([], _I64), "d": pa.array([], _I64)}
            )
        n = len(t)
        return pa.table(
            {
                "c": t.column("src").cast(_I64),
                "p": t.column("dst").cast(_I64),
                "d": pa.array(np.ones(n, np.int64)),
            }
        )

    def seed_terminal(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "k" not in t.column_names:
            return pa.table(
                {"c": pa.array([], _I64), "p": pa.array([], _I64), "d": pa.array([], _I64)}
            )
        k = t.column("k").cast(_I64)
        return pa.table({"c": k, "p": k, "d": pa.array(np.zeros(len(t), np.int64))})

    ptr = (
        redirects.map_batches(seed_redirect, batch_format="pyarrow")
        .union(terminals.map_batches(seed_terminal, batch_format="pyarrow"))
        .map_batches(ensure_schema({"c": _I64, "p": _I64, "d": _I64}), batch_format="pyarrow")
        .materialize()
    )

    for _r in range(max_rounds):
        stats["jump_rounds"] += 1
        hop = compact_for_join(ptr, P).join(
            compact_for_join(
                _proj_pd(ptr), P
            ),  # (c2, p2, d2) — the table joined to itself one hop out
            join_type="inner",
            num_partitions=P,
            on=("p",),
            right_on=("c2",),
        )
        hop = hop.map_batches(
            ensure_schema({"c": _I64, "p": _I64, "d": _I64, "p2": _I64, "d2": _I64}),
            batch_format="pyarrow",
        ).materialize()

        def chg(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "p" not in t.column_names:
                return pa.table({"n": pa.array([0], _I64)})
            a = t.column("p").to_numpy(zero_copy_only=False)
            b = t.column("p2").to_numpy(zero_copy_only=False)
            return pa.table({"n": pa.array([int((a != b).sum())], _I64)})

        changed = sum(
            r["n"] for r in hop.map_batches(chg, batch_format="pyarrow").take_all()
        )

        def advance(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "c" not in t.column_names:
                return pa.table(
                    {"c": pa.array([], _I64), "p": pa.array([], _I64), "d": pa.array([], _I64)}
                )
            d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
            d2 = t.column("d2").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"c": t.column("c").cast(_I64), "p": t.column("p2").cast(_I64), "d": pa.array(d + d2)}
            )

        ptr = hop.map_batches(advance, batch_format="pyarrow").materialize()
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"resolve_redirects: no fixpoint within max_rounds={max_rounds} "
            "doublings — the redirect table contains a cycle (or raise the "
            "cap for chains longer than 2**64, which do not exist)"
        )

    def emit(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "c" not in t.column_names:
            return pa.table(
                {
                    "url_id": pa.array([], _I64),
                    "final_id": pa.array([], _I64),
                    "n_hops": pa.array([], _I64),
                }
            )
        return pa.table(
            {
                "url_id": t.column("c").cast(_I64),
                "final_id": t.column("p").cast(_I64),
                "n_hops": t.column("d").cast(_I64),
            }
        )

    return ptr.map_batches(emit, batch_format="pyarrow")


def _proj_pd(ptr):
    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "c" not in t.column_names:
            return pa.table(
                {"c2": pa.array([], _I64), "p2": pa.array([], _I64), "d2": pa.array([], _I64)}
            )
        return pa.table(
            {
                "c2": t.column("c").cast(_I64),
                "p2": t.column("p").cast(_I64),
                "d2": t.column("d").cast(_I64),
            }
        )

    return ptr.map_batches(fn, batch_format="pyarrow")
