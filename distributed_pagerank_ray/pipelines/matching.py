"""Maximal matching via greedy edge-priority rounds (the
Israeli–Itai / Luby-style edge variant of pipelines/mis.py).

A graph capability beyond the reference's PageRank-only scope
(lioia/distributed-pagerank, pkg/graph/pagerank.go): a set of
vertex-disjoint edges no further edge can join — the distributed
pairing primitive (dedup-pair reconciliation, crawl-shard pairing,
coarsening steps of multilevel partitioners).

Algorithm: each round salts a quadratic per-edge priority (the
mis.py hash shape, w folded below 2**15 so the SQL oracle's BIGINT
arithmetic is overflow-free); an edge becomes a CANDIDATE iff its
priority equals the minimum over ALL active edges at BOTH endpoints.
Unlike mis.py's vertex hash (tie-broken by v, total), edge priorities
can tie in general graphs, so candidates pass a CONFLICT DROP: a
per-vertex candidate count (one ``count_i64_keys`` BSP) and only
edges whose two endpoints each carry exactly ONE candidate match;
conflicted candidates simply retry under the next round's salt.
Matched endpoints leave via LEFT ANTI on both columns. The globally
minimal active edge always matches when untied, so progress is
whp-geometric; ``max_rounds`` exhaustion raises (fail loudly, never
return a non-maximal matching).

Scale shape per round: one priority map, one incident-min BSP, two
annotate joins, one conflict-count BSP, two anti joins — all O(active
edges), nothing driver-side but the round counter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..util import compact_for_join, count_i64_keys, ensure_schema, min_i64_by_key

_I64 = pa.int64()

#: stats of the last maximal_matching call: {"rounds", "conflict_drops"}.
LAST_STATS: dict = {}


def _edge_priority(src: np.ndarray, dst: np.ndarray, r: int) -> np.ndarray:
    w = (197 * src + 12289 * dst + np.int64(r) * 1000003) % 32768
    return (w * w * 1315423911 + w * 2654435761 + 12345) % 2147483647


def _project(ds, mapping: dict[str, str]):
    out_cols = list(mapping.items())

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or out_cols[0][1] not in t.column_names:
            return pa.table({o: pa.array([], _I64) for o, _ in out_cols})
        return pa.table({o: t.column(i).cast(_I64) for o, i in out_cols})

    return ds.map_batches(fn, batch_format="pyarrow")


def maximal_matching(
    edges: "ray.data.Dataset",
    num_partitions: int = 4,
    num_shards: int = 4,
    max_rounds: int = 64,
) -> "ray.data.Dataset":
    """(src, dst) rows forming a maximal matching of the UNDIRECTED
    graph ``edges`` (one row per undirected edge, self-loops dropped;
    parallel duplicates are harmless — they tie and conflict-drop,
    then match as soon as one copy wins). Deterministic."""
    global LAST_STATS
    P, S = num_partitions, num_shards
    stats = {"rounds": 0, "conflict_drops": 0}
    LAST_STATS = stats

    def clean(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)})
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})

    active = edges.map_batches(clean, batch_format="pyarrow").materialize()
    matched_parts: list = []

    for r in range(max_rounds):
        if active.count() == 0:
            break
        stats["rounds"] += 1

        def prio_fn(t: pa.Table, _r=r) -> pa.Table:
            if len(t) == 0 or "src" not in t.column_names:
                return pa.table(
                    {
                        "src": pa.array([], _I64),
                        "dst": pa.array([], _I64),
                        "p": pa.array([], _I64),
                    }
                )
            s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
            d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "src": pa.array(s),
                    "dst": pa.array(d),
                    "p": pa.array(_edge_priority(s, d, _r)),
                }
            )

        pe = compact_for_join(
            active.map_batches(prio_fn, batch_format="pyarrow"), P
        ).materialize()
        incident = _project(pe, {"v": "src", "p": "p"}).union(
            _project(pe, {"v": "dst", "p": "p"})
        )
        vmin = min_i64_by_key(incident, "v", "p", num_shards=S)

        j = pe.join(
            compact_for_join(_project(vmin, {"sv": "v", "sp": "p"}), P),
            join_type="inner",
            num_partitions=P,
            on=("src",),
            right_on=("sv",),
        )
        # pin the schema between chained joins (a join can emit 0-row
        # EMPTY-SCHEMA blocks that break the next join's key lookup)
        j = j.map_batches(
            ensure_schema({"src": _I64, "dst": _I64, "p": _I64, "sp": _I64}),
            batch_format="pyarrow",
        )
        j = compact_for_join(j, P).join(
            compact_for_join(_project(vmin, {"dv": "v", "dp": "p"}), P),
            join_type="inner",
            num_partitions=P,
            on=("dst",),
            right_on=("dv",),
        )

        def keep_cand(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "p" not in t.column_names:
                return pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)})
            import pyarrow.compute as pc

            m = pc.and_(
                pc.equal(t.column("p"), t.column("sp")),
                pc.equal(t.column("p"), t.column("dp")),
            )
            f = t.filter(m)
            return pa.table(
                {"src": f.column("src").cast(_I64), "dst": f.column("dst").cast(_I64)}
            )

        cand = j.map_batches(keep_cand, batch_format="pyarrow").materialize()
        if cand.count() == 0:  # an all-ties round: retry under a new salt
            stats["conflict_drops"] += 1
            continue

        cnt = count_i64_keys(
            _project(cand, {"v": "src"}).union(_project(cand, {"v": "dst"})),
            "v",
            num_shards=S,
        )
        ok = compact_for_join(cand, P).join(
            compact_for_join(_project(cnt, {"cv": "v", "cs": "cnt"}), P),
            join_type="inner",
            num_partitions=P,
            on=("src",),
            right_on=("cv",),
        )
        ok = ok.map_batches(  # schema pin between chained joins
            ensure_schema({"src": _I64, "dst": _I64, "cs": _I64}),
            batch_format="pyarrow",
        )
        ok = compact_for_join(ok, P).join(
            compact_for_join(_project(cnt, {"dv2": "v", "cd": "cnt"}), P),
            join_type="inner",
            num_partitions=P,
            on=("dst",),
            right_on=("dv2",),
        )

        def keep_ok(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "cs" not in t.column_names:
                return pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)})
            import pyarrow.compute as pc

            m = pc.and_(pc.equal(t.column("cs"), 1), pc.equal(t.column("cd"), 1))
            f = t.filter(m)
            return pa.table(
                {"src": f.column("src").cast(_I64), "dst": f.column("dst").cast(_I64)}
            )

        okm = ok.map_batches(keep_ok, batch_format="pyarrow").materialize()
        n_ok = okm.count()
        if n_ok < cand.count():
            stats["conflict_drops"] += 1
        if n_ok == 0:
            continue
        matched_parts.append(okm)

        dead = compact_for_join(
            _project(okm, {"v": "src"}).union(_project(okm, {"v": "dst"})), P
        )
        survivors = compact_for_join(active, P).join(
            _project_rename(dead, "k1"),
            join_type="left_anti",
            num_partitions=P,
            on=("src",),
            right_on=("k1",),
        )
        survivors = survivors.map_batches(  # schema pin (chained joins)
            ensure_schema({"src": _I64, "dst": _I64}), batch_format="pyarrow"
        ).materialize()
        if survivors.count() == 0:  # a fully-empty Dataset (0 typed
            # rows) cannot enter the second hash join — the landmine
            active = survivors
            continue
        survivors = compact_for_join(survivors, P).join(
            _project_rename(dead, "k2"),
            join_type="left_anti",
            num_partitions=P,
            on=("dst",),
            right_on=("k2",),
        )
        active = (
            _project(survivors, {"src": "src", "dst": "dst"})
            .materialize()
        )
    else:
        raise RuntimeError(
            f"maximal_matching did not settle within max_rounds={max_rounds} "
            "(persistent priority ties or the cap is too low; the matching "
            "built so far is vertex-disjoint but possibly not maximal)"
        )

    out = ray.data.from_arrow(
        pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)})
    )
    for p_ in matched_parts:
        out = out.union(p_)
    return out.map_batches(
        ensure_schema({"src": _I64, "dst": _I64}), batch_format="pyarrow"
    )


def _project_rename(ds, name: str):
    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "v" not in t.column_names:
            return pa.table({name: pa.array([], _I64)})
        return pa.table({name: t.column("v").cast(_I64)})

    return ds.map_batches(fn, batch_format="pyarrow")
