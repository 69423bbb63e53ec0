"""Minimum spanning forest via distributed Boruvka rounds.

A graph capability beyond the reference's PageRank-only scope
(lioia/distributed-pagerank, pkg/graph/pagerank.go): per connected
component of the undirected weighted graph, the unique minimum
spanning tree under the total order ``(w, packed edge key)`` — the
backbone a crawler/link-graph pipeline uses for cluster summarization
and redundancy pruning.

Execution shape — Boruvka, O(log V) rounds, everything through the
repo's join + per-shard-BSP idiom (no groupby().map_groups anywhere):

 1. relabel edges by current component (two hash joins, schema pinned
    between them per the chained-join landmine) and keep inter-
    component edges only;
 2. per component, the argmin edge under (w, key): one
    ``min_i64_by_key`` on w, an equi-join back on (c, w) — multi-key
    Acero joins work — then a second ``min_i64_by_key`` on the packed
    key (two-step argmin: no (w, key) bit-packing, so w is any int64
    in [0, 2^31));
 3. contract: chosen (c -> o) arcs form a pseudoforest whose only
    cycles are 2-cycles (mutual argmin under a total order); break
    them at the min endpoint, then POINTER-JUMP (p <- p[p], exact
    changed-count convergence) so an O(V)-long chosen chain contracts
    in O(log) exchanges, not O(V) min-label rounds;
 4. canonical labels: new label = min old label over each contracted
    tree (one grouped-min BSP) — component ids stay "min vertex id"
    every round, matching components.py's convention.

Rounds halve the component count, so ``max_rounds=32`` covers any
graph with < 2^32 vertices; exhausting it raises (fail-loudly, the
ADVICE-r4 posture). State is O(V) int64 rows + O(E) join payloads per
round; the driver holds only per-round counters.

Requires vertex ids and weights in [0, 2^31) (packed u62 edge keys);
raises otherwise. Parallel edges collapse to their (w, key)-min
up front, so the forest is the unique MSF under the lexicographic
perturbation — byte-reproducible across runs and cluster sizes
(tests/test_mst.py asserts equality with a driver-side Kruskal).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..util import compact_for_join, count_i64_keys, ensure_schema, min_i64_by_key

_I64 = pa.int64()
_SHIFT = np.int64(1) << np.int64(31)

#: stats of the last boruvka_forest call: {"rounds", "jump_rounds"}
#: (pytest pins rounds <= ceil(log2(V)) + 1 on planted chains).
LAST_STATS: dict = {}


def _empty(cols: dict[str, pa.DataType]) -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in cols.items()})


def _canon_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(key, w) with key = min*2^31 + max, parallel edges collapsed to
    the (w, key)-min weight, self-loops dropped; raises on ids/weights
    outside [0, 2^31)."""

    def pack(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return _empty({"key": _I64, "w": _I64})
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        hi = np.maximum(s, d)
        if len(s) and (
            int(s.min()) < 0 or int(d.min()) < 0 or int(hi.max()) >= int(_SHIFT)
            or int(w.min()) < 0 or int(w.max()) >= int(_SHIFT)
        ):
            raise ValueError(
                "boruvka_forest requires vertex ids and weights in [0, 2^31)"
            )
        keep = s != d
        lo = np.minimum(s, d)[keep]
        return pa.table(
            {"key": pa.array(lo * _SHIFT + hi[keep]), "w": pa.array(w[keep])}
        )

    return min_i64_by_key(
        edges.map_batches(pack, batch_format="pyarrow"), "key", "w", num_shards=4
    )


def _unpack(t: pa.Table, key_col: str = "key"):
    k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    return k // _SHIFT, k % _SHIFT


def _changed_count(ds: "ray.data.Dataset", a: str, b: str) -> int:
    """Exact count of rows where columns a != b (no compare join)."""

    def ind(t: pa.Table) -> pa.Table:
        if len(t) == 0 or a not in t.column_names:
            return _empty({"chg": _I64})
        x = t.column(a).to_numpy(zero_copy_only=False)
        y = t.column(b).to_numpy(zero_copy_only=False)
        return pa.table({"chg": pa.array([int((x != y).sum())], _I64)})

    n = ds.map_batches(ind, batch_format="pyarrow").sum("chg")
    return int(n or 0)


def boruvka_forest(
    edges: "ray.data.Dataset",
    num_partitions: int = 4,
    num_shards: int = 4,
    max_rounds: int = 32,
):
    """Minimum spanning forest of the undirected graph ``edges``
    (int64 ``src``, ``dst``, ``w``).

    Returns ``(forest, labels)``: ``forest`` has one row per chosen
    edge (``src`` < ``dst``, ``w``); ``labels`` maps every vertex
    (``v``) to its component id (``comp`` = min vertex id of the
    component). Deterministic: the unique MSF under (w, packed key)
    lexicographic order.
    """
    global LAST_STATS
    P, S = num_partitions, num_shards
    stats = {"rounds": 0, "jump_rounds": 0}
    LAST_STATS = stats

    e = _canon_edges(edges).materialize()

    def verts(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "key" not in t.column_names:
            return _empty({"v": _I64})
        a, b = _unpack(t)
        return pa.table({"v": pa.array(np.concatenate([a, b]))})

    vs = count_i64_keys(
        e.map_batches(verts, batch_format="pyarrow"), "v", num_shards=S
    )
    labels = vs.map_batches(
        lambda t: pa.table({"v": t.column("v"), "comp": t.column("v")})
        if len(t) and "v" in t.column_names
        else _empty({"v": _I64, "comp": _I64}),
        batch_format="pyarrow",
    ).materialize()

    def ends(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "key" not in t.column_names:
            return _empty({"key": _I64, "w": _I64, "ea": _I64, "eb": _I64})
        a, b = _unpack(t)
        return pa.table(
            {"key": t.column("key"), "w": t.column("w").cast(_I64),
             "ea": pa.array(a), "eb": pa.array(b)}
        )

    ee = compact_for_join(e.map_batches(ends, batch_format="pyarrow"), P)
    forest_parts: list = []
    esc = {"key": _I64, "w": _I64, "ea": _I64, "eb": _I64}

    for _ in range(max_rounds):
        stats["rounds"] += 1
        # 1. component-relabel both endpoints (schema pinned between joins)
        la = compact_for_join(
            labels.map_batches(
                lambda t: pa.table({"va": t.column("v"), "ca": t.column("comp")})
                if len(t) and "v" in t.column_names
                else _empty({"va": _I64, "ca": _I64}),
                batch_format="pyarrow",
            ),
            P,
        )
        lb = compact_for_join(
            labels.map_batches(
                lambda t: pa.table({"vb": t.column("v"), "cb": t.column("comp")})
                if len(t) and "v" in t.column_names
                else _empty({"vb": _I64, "cb": _I64}),
                batch_format="pyarrow",
            ),
            P,
        )
        j1 = ee.join(la, join_type="inner", num_partitions=P, on=("ea",), right_on=("va",))
        j1 = j1.map_batches(
            ensure_schema({**esc, "ca": _I64}), batch_format="pyarrow"
        )
        j2 = compact_for_join(j1, P).join(
            lb, join_type="inner", num_partitions=P, on=("eb",), right_on=("vb",)
        )
        inter = j2.map_batches(
            ensure_schema({**esc, "ca": _I64, "cb": _I64}), batch_format="pyarrow"
        ).filter(lambda r: r["ca"] != r["cb"]).materialize()
        if inter.count() == 0:
            break

        # 2. per-component argmin edge under (w, key): both directions
        def both(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "key" not in t.column_names:
                return _empty({"c": _I64, "w": _I64, "key": _I64})
            return pa.table(
                {
                    "c": pa.concat_arrays(
                        [t.column("ca").cast(_I64).combine_chunks(),
                         t.column("cb").cast(_I64).combine_chunks()]
                    ),
                    "w": pa.concat_arrays(
                        [t.column("w").cast(_I64).combine_chunks()] * 2
                    ),
                    "key": pa.concat_arrays(
                        [t.column("key").cast(_I64).combine_chunks()] * 2
                    ),
                }
            )

        cand = inter.map_batches(both, batch_format="pyarrow").materialize()
        m1 = min_i64_by_key(cand, "c", "w", num_shards=S)
        m1 = compact_for_join(
            m1.map_batches(ensure_schema({"c": _I64, "w": _I64}), batch_format="pyarrow"), P
        )
        tied = compact_for_join(cand, P).join(
            m1, join_type="inner", num_partitions=P, on=("c", "w")
        )
        tied = tied.map_batches(
            ensure_schema({"c": _I64, "w": _I64, "key": _I64}), batch_format="pyarrow"
        )
        chosen_k = min_i64_by_key(tied, "c", "key", num_shards=S)
        chosen_k = chosen_k.map_batches(
            ensure_schema({"c": _I64, "key": _I64}), batch_format="pyarrow"
        ).materialize()

        # forest += distinct chosen keys (a 2-cycle picks one edge twice)
        dkeys = count_i64_keys(chosen_k, "key", num_shards=S)
        dk = compact_for_join(
            dkeys.map_batches(
                lambda t: pa.table({"key": t.column("key")})
                if len(t) and "key" in t.column_names
                else _empty({"key": _I64}),
                batch_format="pyarrow",
            ),
            P,
        )
        fpart = ee.join(dk, join_type="inner", num_partitions=P, on=("key",))
        fpart = fpart.map_batches(ensure_schema(esc), batch_format="pyarrow")
        forest_parts.append(
            fpart.map_batches(
                lambda t: pa.table(
                    {"src": t.column("ea"), "dst": t.column("eb"), "w": t.column("w")}
                )
                if len(t) and "ea" in t.column_names
                else _empty({"src": _I64, "dst": _I64, "w": _I64}),
                batch_format="pyarrow",
            ).materialize()
        )

        # 3. chosen (c -> o) arcs; o = the edge's other-side component
        ck = compact_for_join(chosen_k, P)
        carc = ck.join(
            compact_for_join(
                inter.map_batches(
                    lambda t: pa.table(
                        {"key2": t.column("key"), "xa": t.column("ca"), "xb": t.column("cb")}
                    )
                    if len(t) and "key" in t.column_names
                    else _empty({"key2": _I64, "xa": _I64, "xb": _I64}),
                    batch_format="pyarrow",
                ),
                P,
            ),
            join_type="inner",
            num_partitions=P,
            on=("key",),
            right_on=("key2",),
        )

        def to_arc(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "c" not in t.column_names:
                return _empty({"c": _I64, "o": _I64})
            c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            xa = t.column("xa").to_numpy(zero_copy_only=False).astype(np.int64)
            xb = t.column("xb").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"c": pa.array(c), "o": pa.array(np.where(c == xa, xb, xa))})

        arcs = carc.map_batches(to_arc, batch_format="pyarrow").materialize()

        # break 2-cycles at the min endpoint: p = c if (o->c and c<o) else o
        a2 = compact_for_join(
            arcs.map_batches(
                lambda t: pa.table({"c2": t.column("c"), "o2": t.column("o")})
                if len(t) and "c" in t.column_names
                else _empty({"c2": _I64, "o2": _I64}),
                batch_format="pyarrow",
            ),
            P,
        )
        par = compact_for_join(arcs, P).join(
            a2, join_type="inner", num_partitions=P, on=("o",), right_on=("c2",)
        )

        def root_break(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "c" not in t.column_names:
                return _empty({"c": _I64, "p": _I64})
            c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            o = t.column("o").to_numpy(zero_copy_only=False).astype(np.int64)
            oo = t.column("o2").to_numpy(zero_copy_only=False).astype(np.int64)
            p = np.where((oo == c) & (c < o), c, o)
            return pa.table({"c": pa.array(c), "p": pa.array(p)})

        parents = par.map_batches(root_break, batch_format="pyarrow").materialize()

        # pointer jumping to the root (p <- p[p]); exact changed count
        for _j in range(64):
            pp = compact_for_join(
                parents.map_batches(
                    lambda t: pa.table({"c3": t.column("c"), "p3": t.column("p")})
                    if len(t) and "c" in t.column_names
                    else _empty({"c3": _I64, "p3": _I64}),
                    batch_format="pyarrow",
                ),
                P,
            )
            hop = compact_for_join(parents, P).join(
                pp, join_type="inner", num_partitions=P, on=("p",), right_on=("c3",)
            )
            hop = hop.map_batches(
                ensure_schema({"c": _I64, "p": _I64, "p3": _I64}), batch_format="pyarrow"
            ).materialize()
            stats["jump_rounds"] += 1
            chg = _changed_count(hop, "p", "p3")
            parents = hop.map_batches(
                lambda t: pa.table({"c": t.column("c"), "p": t.column("p3")})
                if len(t) and "c" in t.column_names
                else _empty({"c": _I64, "p": _I64}),
                batch_format="pyarrow",
            ).materialize()
            if chg == 0:
                break
        else:
            raise RuntimeError("boruvka pointer jumping did not converge in 64 rounds")

        # 4. canonical relabel: new label = min old comp id per tree
        minc = min_i64_by_key(
            parents.map_batches(
                lambda t: pa.table({"r": t.column("p"), "mc": t.column("c")})
                if len(t) and "c" in t.column_names
                else _empty({"r": _I64, "mc": _I64}),
                batch_format="pyarrow",
            ),
            "r",
            "mc",
            num_shards=S,
        )
        minc = minc.map_batches(
            ensure_schema({"r": _I64, "mc": _I64}), batch_format="pyarrow"
        )
        relab = compact_for_join(parents, P).join(
            compact_for_join(minc, P), join_type="inner", num_partitions=P,
            on=("p",), right_on=("r",),
        )
        relab = relab.map_batches(
            ensure_schema({"c": _I64, "p": _I64, "mc": _I64}), batch_format="pyarrow"
        )
        rel = compact_for_join(
            relab.map_batches(
                lambda t: pa.table({"oc": t.column("c"), "nc": t.column("mc")})
                if len(t) and "c" in t.column_names
                else _empty({"oc": _I64, "nc": _I64}),
                batch_format="pyarrow",
            ),
            P,
        )
        lmoved = compact_for_join(labels, P).join(
            rel, join_type="inner", num_partitions=P, on=("comp",), right_on=("oc",)
        )
        lmoved = lmoved.map_batches(
            ensure_schema({"v": _I64, "comp": _I64, "nc": _I64}), batch_format="pyarrow"
        ).map_batches(
            lambda t: pa.table({"v": t.column("v"), "comp": t.column("nc")})
            if len(t) and "v" in t.column_names
            else _empty({"v": _I64, "comp": _I64}),
            batch_format="pyarrow",
        )
        lkept = compact_for_join(labels, P).join(
            rel, join_type="left_anti", num_partitions=P, on=("comp",), right_on=("oc",)
        )
        lkept = lkept.map_batches(
            ensure_schema({"v": _I64, "comp": _I64}), batch_format="pyarrow"
        )
        labels = lmoved.union(lkept).map_batches(
            ensure_schema({"v": _I64, "comp": _I64}), batch_format="pyarrow"
        ).materialize()
    else:
        raise RuntimeError(
            f"boruvka_forest did not converge within max_rounds={max_rounds}"
        )

    if forest_parts:
        forest = forest_parts[0]
        for p_ in forest_parts[1:]:
            forest = forest.union(p_)
    else:
        forest = ray.data.from_arrow(_empty({"src": _I64, "dst": _I64, "w": _I64}))
    forest = forest.map_batches(
        ensure_schema({"src": _I64, "dst": _I64, "w": _I64}), batch_format="pyarrow"
    )
    return forest, labels


def forest_summary(
    forest: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    num_partitions: int = 4,
    num_shards: int = 4,
) -> "ray.data.Dataset":
    """(comp, n_edges, total_w) per connected component: MSF edge count
    and total weight (components of size 1 have no forest edge and are
    absent — callers wanting them union labels' distinct comps)."""
    P, S = num_partitions, num_shards
    lv = compact_for_join(
        labels.map_batches(
            lambda t: pa.table({"v": t.column("v"), "comp": t.column("comp")})
            if len(t) and "v" in t.column_names
            else _empty({"v": _I64, "comp": _I64}),
            batch_format="pyarrow",
        ),
        P,
    )
    j = compact_for_join(forest, P).join(
        lv, join_type="inner", num_partitions=P, on=("src",), right_on=("v",)
    )
    j = j.map_batches(
        ensure_schema({"src": _I64, "dst": _I64, "w": _I64, "comp": _I64}),
        batch_format="pyarrow",
    )
    cnt = count_i64_keys(j, "comp", num_shards=S, count_col="n_edges")

    def wpart(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "comp" not in t.column_names:
            return _empty({"comp": _I64, "pw": _I64})
        c = t.column("comp").to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        s = np.bincount(inv, weights=w.astype(np.float64), minlength=len(u)).astype(np.int64)
        return pa.table({"comp": pa.array(u), "pw": pa.array(s)})

    wsum = count_i64_keys(
        j.map_batches(wpart, batch_format="pyarrow"),
        "comp",
        num_shards=S,
        count_col="total_w",
        weight_col="pw",
    )
    out = compact_for_join(
        cnt.map_batches(
            ensure_schema({"comp": _I64, "n_edges": _I64}), batch_format="pyarrow"
        ),
        P,
    ).join(
        compact_for_join(
            wsum.map_batches(
                lambda t: pa.table({"comp2": t.column("comp"), "total_w": t.column("total_w")})
                if len(t) and "comp" in t.column_names
                else _empty({"comp2": _I64, "total_w": _I64}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="inner",
        num_partitions=P,
        on=("comp",),
        right_on=("comp2",),
    )
    return out.map_batches(
        ensure_schema({"comp": _I64, "n_edges": _I64, "total_w": _I64}),
        batch_format="pyarrow",
    ).select_columns(["comp", "n_edges", "total_w"])
