"""Distributed greedy graph coloring via iterated Luby MIS.

Capability beyond the reference's PageRank-only scope
(lioia/distributed-pagerank, pkg/graph/pagerank.go): assign every
vertex a color such that no edge is monochromatic — the classic
scheduling primitive (conflict-free crawl-shard batches, parallel
near-dup cluster processing: color c = "the c-th wave").

Algorithm (Jones–Plassmann by way of Luby): repeatedly take a maximal
independent set of the REMAINING graph (pipelines/mis.py — priority
rounds on the quadratic (v, round) hash), give it the next color, and
delete it. Uses at most Δ+1 colors; each MIS call is O(log n) rounds
in expectation, and the color count is bounded by the independence
structure, so the whole loop is O(Δ log n) exchanges worst-case —
fine for the bounded-degree planted gates and for web graphs after
hub splitting.

Determinism: mis_luby is deterministic per call and every call
restarts its round counter at 0, so on a clique the color order is
exactly the rank order of the round-0 priorities — the closed-form
fact the SQL gate checks.

Join landmines honored: ensure_schema pins between chained left_anti
joins AND a count-guard before the second (a full kill round leaves a
0-block no-schema intermediate — the matching.py landmine); edges and
vertices re-materialized per color (lineage cut).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..util import compact_for_join, ensure_schema
from .mis import mis_luby

_I64 = pa.int64()

#: stats of the last greedy_color call: {"n_colors", "mis_rounds"}.
LAST_STATS: dict = {}


def _proj(ds, mapping: dict[str, str]):
    out = list(mapping.items())

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or out[0][1] not in t.column_names:
            return pa.table({o: pa.array([], _I64) for o, _ in out})
        return pa.table({o: t.column(i).cast(_I64) for o, i in out})

    return ds.map_batches(fn, batch_format="pyarrow")


def greedy_color(
    edges: "ray.data.Dataset",
    vertices: "ray.data.Dataset",
    num_partitions: int = 4,
    num_shards: int = 4,
    max_colors: int = 64,
) -> "ray.data.Dataset":
    """(v, color) for every vertex; no edge has equal endpoint colors.

    ``edges``: (src, dst) int64, undirected semantics (symmetrized by
    the MIS layer, self-loops dropped there). ``vertices``: column
    ``v`` covering every endpoint. Raises when ``max_colors`` MIS
    waves do not exhaust the vertex set (degree > max_colors — raise
    the cap, or split hubs first)."""
    from . import mis as _mis

    global LAST_STATS
    P = num_partitions
    stats = {"n_colors": 0, "mis_rounds": 0}
    LAST_STATS = stats

    active_v = _proj(vertices, {"v": "v"}).materialize()
    active_e = _proj(edges, {"src": "src", "dst": "dst"}).materialize()
    parts: list = []

    for c in range(max_colors):
        if active_v.count() == 0:
            break
        sel = mis_luby(
            active_e,
            active_v,
            num_partitions=P,
            num_shards=num_shards,
        ).materialize()
        stats["n_colors"] += 1
        stats["mis_rounds"] += _mis.LAST_STATS.get("rounds", 0)

        def tag(t: pa.Table, _c=c) -> pa.Table:
            if len(t) == 0 or "v" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "color": pa.array([], _I64)})
            return pa.table(
                {"v": t.column("v").cast(_I64), "color": pa.array([_c] * len(t), _I64)}
            )

        parts.append(sel.map_batches(tag, batch_format="pyarrow"))

        kv = compact_for_join(_proj(sel, {"kv": "v"}), P)
        active_v = (
            compact_for_join(active_v, P)
            .join(kv, join_type="left_anti", num_partitions=P, on=("v",), right_on=("kv",))
            .map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")
            .materialize()
        )
        if active_v.count() == 0:
            break
        # shrink edges: drop anything touching this wave's vertices;
        # count-guard between the chained left_antis (matching.py)
        if active_e.count() > 0:
            e1 = (
                compact_for_join(active_e, P)
                .join(kv, join_type="left_anti", num_partitions=P, on=("src",), right_on=("kv",))
                .map_batches(ensure_schema({"src": _I64, "dst": _I64}), batch_format="pyarrow")
                .materialize()
            )
            if e1.count() > 0:
                active_e = (
                    compact_for_join(e1, P)
                    .join(
                        kv, join_type="left_anti", num_partitions=P, on=("dst",), right_on=("kv",)
                    )
                    .map_batches(ensure_schema({"src": _I64, "dst": _I64}), batch_format="pyarrow")
                    .materialize()
                )
            else:
                active_e = e1
    else:
        raise RuntimeError(
            f"greedy_color: vertices remain after max_colors={max_colors} MIS "
            "waves — a vertex degree exceeds the cap (raise it, or split hubs)"
        )

    out = ray.data.from_arrow(pa.table({"v": pa.array([], _I64), "color": pa.array([], _I64)}))
    for p in parts:
        out = out.union(p)
    return out.map_batches(ensure_schema({"v": _I64, "color": _I64}), batch_format="pyarrow")
