"""Whole-graph summary metrics: degree assortativity and the global
clustering coefficient.

Engine extensions beyond the reference's PageRank-only scope
(lioia/distributed-pagerank, pkg/graph) — standard link-graph health
metrics a web-corpus pipeline reports next to rank distributions.
Both reduce to tiny scalar aggregates, so the scale story is the
input-side plumbing:

- assortativity: two count-BSP degree tables (no row-level groupby),
  two Acero hash joins onto the edge stream, then per-batch moment
  partials (n, Σx, Σy, Σxy, Σx², Σy²) folded by one multi-Sum
  aggregate — the driver only ever sees six floats. Pearson r is
  scale-invariant, so the population-moment formula matches SQL's
  sample ``corr()`` exactly.
- clustering: C = 3·triangles / wedges, with triangles from
  pipelines/triangles.py (broadcast-CSR or join path) and wedges =
  Σ d(d−1)/2 folded per degree-table batch.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..config import RunConfig
from ..util import compact_for_join, count_i64_keys, ensure_schema

_I64 = pa.int64()

#: filled by two_hop_counts: how many relay vertices the default
#: max_relay_degree cap silenced this run (the no-silent-caps surface;
#: also logged as a warning when nonzero).
TWOHOP_LAST_STATS: dict = {}
_F64 = pa.float64()


def degree_assortativity(
    edges: "ray.data.Dataset", num_partitions: int = 8, num_shards: int = 16
) -> "ray.data.Dataset":
    """One row: (m, assortativity) — Pearson correlation across edges
    between the source's OUT-degree and the destination's IN-degree
    (the out/in degree correlation; on a symmetrized table it is the
    classic undirected assortativity). 6dp."""
    P = num_partitions

    def proj(col, out):
        return edges.map_batches(
            lambda t, c=col, o=out: pa.table({o: t.column(c)}), batch_format="pyarrow"
        )

    out_deg = count_i64_keys(proj("src", "s2"), "s2", num_shards=num_shards).map_batches(
        lambda t: pa.table({"s2": t.column("s2"), "x": t.column("cnt")})
        if "s2" in t.column_names
        else pa.table({"s2": pa.array([], _I64), "x": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    in_deg = count_i64_keys(proj("dst", "d2"), "d2", num_shards=num_shards).map_batches(
        lambda t: pa.table({"d2": t.column("d2"), "y": t.column("cnt")})
        if "d2" in t.column_names
        else pa.table({"d2": pa.array([], _I64), "y": pa.array([], _I64)}),
        batch_format="pyarrow",
    )

    j = compact_for_join(edges, P).join(
        compact_for_join(out_deg, P), join_type="inner", num_partitions=P,
        on=("src",), right_on=("s2",),
    )
    j = compact_for_join(j, P).join(
        compact_for_join(in_deg, P), join_type="inner", num_partitions=P,
        on=("dst",), right_on=("d2",),
    )

    def moments(t: pa.Table) -> pa.Table:
        cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
        if "x" not in t.column_names or len(t) == 0:
            return pa.table({c: pa.array([], _F64) for c in cols})
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(np.float64)
        vals = [float(len(x)), x.sum(), y.sum(), (x * y).sum(), (x * x).sum(), (y * y).sum()]
        return pa.table({c: pa.array([v]) for c, v in zip(cols, vals)})

    agg = j.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
        Sum("sxy", alias_name="sxy"), Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"),
    )
    n, sx, sy = agg["n"], agg["sx"], agg["sy"]
    cov = agg["sxy"] - sx * sy / n
    vx = agg["sxx"] - sx * sx / n
    vy = agg["syy"] - sy * sy / n
    r = cov / math.sqrt(vx * vy) if vx > 0 and vy > 0 else float("nan")
    return ray.data.from_items([{"m": int(n), "assortativity": round(r, 6)}])


def global_clustering(
    und_pairs: "ray.data.Dataset", run_cfg: RunConfig | None = None, num_shards: int = 16
) -> "ray.data.Dataset":
    """One row: (n_triangles, n_wedges, global_clustering) over a
    CANONICAL undirected pair table (a < b, distinct, no self-loops —
    ``triangles.canonical_undirected`` output). C = 3T / W with
    W = Σ_v d(v)·(d(v)−1)/2; integers exact, ratio 6dp."""
    from .triangles import triangle_count

    edges = und_pairs.map_batches(
        lambda t: pa.table({"src": t.column("a"), "dst": t.column("b")}),
        batch_format="pyarrow",
    )
    tri = triangle_count(edges, run_cfg or RunConfig(num_partitions=8))

    both = und_pairs.map_batches(
        lambda t: pa.table({"v": t.column("a")}), batch_format="pyarrow"
    ).union(
        und_pairs.map_batches(lambda t: pa.table({"v": t.column("b")}), batch_format="pyarrow")
    )

    def wedge_partial(t: pa.Table) -> pa.Table:
        if "cnt" not in t.column_names or len(t) == 0:
            return pa.table({"w": pa.array([], _I64)})
        d = t.column("cnt").to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())])})

    wedges = int(
        count_i64_keys(both, "v", num_shards=num_shards)
        .map_batches(wedge_partial, batch_format="pyarrow")
        .sum("w")
    )
    c = round(3.0 * tri / wedges, 6) if wedges else 0.0
    return ray.data.from_items(
        [{"n_triangles": int(tri), "n_wedges": wedges, "global_clustering": c}]
    )


def two_hop_counts(
    edges: "ray.data.Dataset",
    num_partitions: int = 8,
    num_shards: int = 16,
    max_relay_degree: int | None = 4096,
) -> "ray.data.Dataset":
    """Distinct ≤2-hop neighborhood size per vertex (friends-of-friends):
    n2(v) = |{u ≠ v : dist(v, u) ≤ 2 following edge direction}|.

    Scale shape: ONE hash self-join on the relay vertex (the only
    all-to-all the semantics force), then the distinct-pair BSP
    (sorted-unique packed keys routed per shard — not a two-column row
    groupby, ~20 s/M rows on this Ray version), then the count BSP per
    source. Falls back to the plain groupby pair-distinct when vertex
    ids exceed the [0, 2^31) packing bound.

    Hub relays fan out quadratically by nature of the metric;
    ``max_relay_degree`` bounds it BY DEFAULT (the LSH ``max_bucket``
    posture — the guard is opt-out, not opt-in): relays with
    out-degree above the cap contribute NO 2-hop pairs (their 1-hop
    edges still count), so one celebrity hub can't emit |in|×|out|
    pairs. ``None`` = the explicit exact/unbounded mode; results are
    identical whenever no relay exceeds the cap (asserted by the
    brute-force pytest on capped fixtures).
    """
    from ray.exceptions import RayTaskError

    from ..util import distinct_i64_pairs

    e = edges.map_batches(
        lambda t: pa.table(
            {"a": t.column("src").cast(_I64), "m": t.column("dst").cast(_I64)}
        )
        if "src" in t.column_names
        else pa.table({"a": pa.array([], _I64), "m": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    right = edges.map_batches(
        lambda t: pa.table(
            {"m2": t.column("src").cast(_I64), "b": t.column("dst").cast(_I64)}
        )
        if "src" in t.column_names
        else pa.table({"m2": pa.array([], _I64), "b": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    TWOHOP_LAST_STATS.clear()
    TWOHOP_LAST_STATS["n_relays_capped"] = 0
    if max_relay_degree is not None:
        # drop hub relays BEFORE the join: their |in|×|out| pair fan-out
        # is the one quadratic term in this metric
        deg = count_i64_keys(
            right.map_batches(
                lambda t: pa.table({"m2": t.column("m2")})
                if "m2" in t.column_names
                else pa.table({"m2": pa.array([], _I64)}),
                batch_format="pyarrow",
            ),
            "m2",
            num_shards=num_shards,
            count_col="_deg",
        )
        ok = deg.map_batches(
            lambda t: t.filter(
                pa.array(
                    t.column("_deg").to_numpy(zero_copy_only=False) <= max_relay_degree
                )
            ).select(["m2"])
            if "m2" in t.column_names and len(t)
            else pa.table({"m2": pa.array([], _I64)}),
            batch_format="pyarrow",
        ).materialize()
        n_relays = deg.count()
        n_capped = n_relays - ok.count()
        TWOHOP_LAST_STATS["n_relays_capped"] = n_capped
        if n_capped:
            # the repo's no-silent-caps rule (ADVICE r4): say loudly how
            # many hub relays contributed no 2-hop pairs this run
            import logging

            logging.getLogger(__name__).warning(
                "two_hop_counts: %d of %d relay vertices exceeded "
                "max_relay_degree=%d and contribute no 2-hop pairs "
                "(pass max_relay_degree=None for the exact mode)",
                n_capped,
                n_relays,
                max_relay_degree,
            )
        ok = ok.map_batches(
            lambda t: pa.table({"m3": t.column("m2")})
            if "m2" in t.column_names
            else pa.table({"m3": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
        right = compact_for_join(right, num_partitions).join(
            compact_for_join(ok, num_partitions),
            join_type="left_semi",
            num_partitions=num_partitions,
            on=("m2",),
            right_on=("m3",),
        )
    two = compact_for_join(e, num_partitions).join(
        compact_for_join(right, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("m",),
        right_on=("m2",),
    )
    pairs = two.map_batches(
        lambda t: pa.table({"a": t.column("a"), "b": t.column("b")})
        if "a" in t.column_names
        else pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).union(
        e.map_batches(
            lambda t: pa.table({"a": t.column("a"), "b": t.column("m")})
            if "a" in t.column_names
            else pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
    )
    try:
        uniq = distinct_i64_pairs(pairs, "a", "b", num_shards=num_shards)
    except (RayTaskError, ValueError):
        from ray.data.aggregate import Count

        uniq = (
            pairs.groupby(["a", "b"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["a", "b"])
            .map_batches(ensure_schema({"a": _I64, "b": _I64}), batch_format="pyarrow")
        )
    no_self = uniq.map_batches(
        lambda t: t.filter(
            pa.array(
                t.column("a").to_numpy(zero_copy_only=False)
                != t.column("b").to_numpy(zero_copy_only=False)
            )
        )
        if "a" in t.column_names and len(t)
        else pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    return count_i64_keys(no_self, "a", num_shards=num_shards, count_col="n2").map_batches(
        lambda t: pa.table({"id": t.column("a"), "n2": t.column("n2")})
        if "a" in t.column_names
        else pa.table({"id": pa.array([], _I64), "n2": pa.array([], _I64)}),
        batch_format="pyarrow",
    )


def sparsify_edges(
    edges: "ray.data.Dataset",
    k: int = 8,
    num_partitions: int = 8,
    num_shards: int = 16,
) -> "ray.data.Dataset":
    """Degree-capped deterministic edge sampling (graph sparsifier):
    keep edge (s, d) iff  h(s, d) · outdeg(s) < k · 100000007 — i.e.
    each source keeps ~k of its out-edges, chosen by hash, so hub
    fan-outs are bounded while low-degree vertices keep everything
    (h uniform on [0, M) ⇒ P(keep) = min(1, k/deg)). Deterministic:
    the same edges survive every run/engine, and the rule is a pure
    int64 expression a SQL oracle evaluates verbatim.

    Scale shape: degrees via the count BSP, ONE hash join of the
    degree table onto the edge stream (same src partitioning the
    engine reuses), then a pure per-batch filter. The standard
    pre-step before quadratic-ish analytics (triangles, co-occurrence)
    on hub-skewed web graphs.
    """
    e = edges.map_batches(
        lambda t: pa.table(
            {"src": t.column("src").cast(_I64), "dst": t.column("dst").cast(_I64)}
        )
        if "src" in t.column_names
        else pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    deg = count_i64_keys(
        e.map_batches(
            lambda t: pa.table({"s2": t.column("src")})
            if "src" in t.column_names
            else pa.table({"s2": pa.array([], _I64)}),
            batch_format="pyarrow",
        ),
        "s2",
        num_shards=num_shards,
        count_col="deg",
    )
    j = compact_for_join(e, num_partitions).join(
        compact_for_join(deg, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("s2",),
    )

    def keep(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)})
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        dg = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        x = (s * 131 + d * 977 + 5) % 100_000_007
        h = (x * x + x * 48271) % 100_000_007
        m = h * dg < k * 100_000_007
        return pa.table({"src": pa.array(s[m]), "dst": pa.array(d[m])})

    return j.map_batches(keep, batch_format="pyarrow")


def reciprocity(
    edges: "ray.data.Dataset",
    num_partitions: int = 8,
    num_shards: int = 16,
) -> "ray.data.Dataset":
    """Edge reciprocity of a directed graph: the fraction of distinct
    non-self edges (s, d) whose reverse (d, s) is also present — the
    standard directed-web-graph health metric (link exchanges vs
    one-way citations).

    Scale shape: distinct edges via the pair BSP (ids < 2^31), then
    ONE multi-key Acero self-join on (src, dst) = (dst, src) counts
    the reciprocal edges — no broadcast of the edge set, both sides
    hash-partition. Returns one row
    (n_edges, n_reciprocal, reciprocity[6dp])."""
    from ..util import distinct_i64_pairs

    e = edges.map_batches(
        lambda t: pa.table(
            {"src": t.column("src").cast(_I64), "dst": t.column("dst").cast(_I64)}
        )
        if "src" in t.column_names
        else pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    de = (
        distinct_i64_pairs(e, "src", "dst")
        .map_batches(
            lambda t: t.filter(
                pa.array(
                    t.column("src").to_numpy(zero_copy_only=False)
                    != t.column("dst").to_numpy(zero_copy_only=False)
                )
            )
            if "src" in t.column_names and len(t)
            else pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_edges = de.count()
    rev = de.map_batches(
        lambda t: pa.table({"r_src": t.column("dst"), "r_dst": t.column("src")})
        if "src" in t.column_names
        else pa.table({"r_src": pa.array([], _I64), "r_dst": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    j = compact_for_join(de, num_partitions).join(
        compact_for_join(rev, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("src", "dst"),
        right_on=("r_src", "r_dst"),
    )
    n_rec = j.count()
    frac = round(n_rec / n_edges, 6) if n_edges else 0.0
    return ray.data.from_items(
        [{"n_edges": int(n_edges), "n_reciprocal": int(n_rec), "reciprocity": frac}]
    )


def adamic_adar_scores(
    und_edges: "ray.data.Dataset",
    k: int = 20,
    num_partitions: int = 8,
    num_shards: int = 16,
    weight: str = "adamic_adar",
) -> "ray.data.Dataset":
    """Adamic-Adar link strength for EXISTING edges: for each distinct
    undirected edge (a < b), score = Σ_{m ∈ N(a) ∩ N(b)} 1 / ln(deg m)
    — the classic link-prediction feature, here evaluated on the
    graph's own edges (edge-strength ranking for e.g. dedup-cluster
    pruning). Returns the top-``k`` edges (score desc, a asc, b asc).

    Scale shape: symmetrize → undirected degrees via the count BSP →
    ONE relay self-join builds the 2-paths a-m-b (the only quadratic
    term; bound hub relays upstream via sparsify_edges, same posture
    as two_hop_counts) → 1/ln(deg m) attached by one hash join →
    paths are filtered to EXISTING edges INSIDE the partial map (the
    packed edge-key set rides in one remote-packed sorted array —
    8 B/edge; on a graph too large for that broadcast swap in the
    Bloom prefilter + exact semi join, the semi_join_filter posture)
    BEFORE any aggregation, so the grouped sum's input is bounded by
    wedges-on-edges, not all 2-path pairs (measured 30× on the
    sf0.01 parts graph: most of the 27.8M 2-paths land on non-edges)
    → partial-prune top-k (no full sort).

    Input must be canonical undirected (a < b) distinct edges with ids
    in [0, 2^31) (the packed-key bound).

    ``weight="resource_alloc"`` swaps the relay weight to 1/deg(m) —
    the Resource Allocation index (Zhou/Lü/Zhang 2009), empirically
    the strongest of the local link-prediction indices on skewed
    graphs (it punishes hub relays harder than 1/ln); everything else
    (wedge join, edge-set filter, top-k) is shared."""
    import ray

    from ray.data.aggregate import Sum as _Sum

    from ..util import topk_rows

    SHIFT = np.int64(1) << 31
    if weight not in ("adamic_adar", "resource_alloc"):
        raise ValueError("weight must be 'adamic_adar' or 'resource_alloc'")

    und = und_edges.map_batches(
        lambda t: pa.table(
            {"a": t.column("a").cast(_I64), "b": t.column("b").cast(_I64)}
        )
        if "a" in t.column_names
        else pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).materialize()
    sym = und.union(
        und.map_batches(
            lambda t: pa.table({"a": t.column("b"), "b": t.column("a")})
            if "a" in t.column_names
            else pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
    ).materialize()
    deg = count_i64_keys(
        sym.map_batches(
            lambda t: pa.table({"v": t.column("a")})
            if "a" in t.column_names
            else pa.table({"v": pa.array([], _I64)}),
            batch_format="pyarrow",
        ),
        "v",
        num_shards=num_shards,
        count_col="deg",
    )
    # 2-paths u - m - w (u != w): join sym(u, m) with sym(m2, w) on m
    left = sym.map_batches(
        lambda t: pa.table({"u": t.column("a"), "m": t.column("b")})
        if "a" in t.column_names
        else pa.table({"u": pa.array([], _I64), "m": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    right = sym.map_batches(
        lambda t: pa.table({"m2": t.column("a"), "w": t.column("b")})
        if "a" in t.column_names
        else pa.table({"m2": pa.array([], _I64), "w": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    # attach 1/ln(deg m) to the relay BEFORE the pair expansion (one
    # small join instead of one per 2-path)
    lw = compact_for_join(left, num_partitions).join(
        compact_for_join(deg, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("m",),
        right_on=("v",),
    )

    def relay_weight(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "u" not in t.column_names:
            return pa.table(
                {"u": pa.array([], _I64), "m": pa.array([], _I64), "wgt": pa.array([], _F64)}
            )
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore"):
            w = 1.0 / d if weight == "resource_alloc" else 1.0 / np.log(d)
        w[~np.isfinite(w)] = 0.0  # deg-1 relays contribute nothing (ln 1 = 0)
        return pa.table({"u": t.column("u"), "m": t.column("m"), "wgt": pa.array(w, _F64)})

    lw = lw.map_batches(relay_weight, batch_format="pyarrow")
    paths = compact_for_join(lw, num_partitions).join(
        compact_for_join(right, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("m",),
        right_on=("m2",),
    )

    # the packed edge-key set, sorted, packed in a REMOTE task — the
    # driver only holds the ref; 8 B/edge
    @ray.remote
    def _pack_edge_keys(*blocks):
        keys = [
            b.column("a").to_numpy(zero_copy_only=False) * SHIFT
            + b.column("b").to_numpy(zero_copy_only=False)
            for b in blocks
            if "a" in b.column_names and len(b) > 0
        ]
        return np.sort(np.concatenate(keys)) if keys else np.zeros(0, dtype=np.int64)

    edge_ref = _pack_edge_keys.remote(*und.to_arrow_refs())

    def pair_partials(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "u" not in t.column_names:
            return pa.table({"pk": pa.array([], _I64), "s": pa.array([], _F64)})
        u = t.column("u").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        g = t.column("wgt").to_numpy(zero_copy_only=False)
        m = u < w  # canonical orientation; also drops u == w
        pk = u[m] * SHIFT + w[m]
        g = g[m]
        # keep only 2-paths over EXISTING edges before aggregating —
        # the wedge stream is dominated by non-edge pairs
        ek = ray.get(edge_ref)
        if len(ek):
            idx = np.searchsorted(ek, pk)
            idx[idx >= len(ek)] = len(ek) - 1
            keep = ek[idx] == pk
            pk, g = pk[keep], g[keep]
        upk, inv = np.unique(pk, return_inverse=True)
        s = np.bincount(inv, weights=g, minlength=len(upk))
        return pa.table({"pk": pa.array(upk), "s": pa.array(s, _F64)})

    on_edges = (
        paths.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(_Sum("s", alias_name="score"))
        .map_batches(ensure_schema({"pk": _I64, "score": _F64}), batch_format="pyarrow")
    )

    def unpack(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "pk" not in t.column_names:
            return pa.table(
                {"a": pa.array([], _I64), "b": pa.array([], _I64), "score": pa.array([], _F64)}
            )
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(pk // SHIFT),
                "b": pa.array(pk & (SHIFT - 1)),
                "score": pa.array(
                    np.round(t.column("score").to_numpy(zero_copy_only=False), 6), _F64
                ),
            }
        )

    flat = on_edges.map_batches(unpack, batch_format="pyarrow")
    return topk_rows(flat, [("score", True), ("a", False), ("b", False)], k)


def degree_gini(
    edges: "ray.data.Dataset",
    num_shards: int = 16,
) -> "ray.data.Dataset":
    """Gini coefficient of the out-degree distribution — the standard
    skew/inequality summary a web-graph health report pairs with the
    power-law exponent (hub concentration in one number).

    G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx) over degrees sorted ascending
    (i = 1-based rank); tie order cannot change the sum, so the
    histogram form is exact: a distinct degree v held by c vertices
    occupies a contiguous rank block and contributes
    v·(2·Σranks − c·(n+1)) with integer arithmetic throughout.

    Scale shape: degrees via the count BSP, then a count-of-counts BSP
    (degree value → #vertices) whose output is O(distinct degrees) —
    the only rows the driver ever folds. Returns one row (n, gini 6dp)
    over vertices with out-degree ≥ 1 (same population as SQL's
    GROUP BY src)."""
    deg = count_i64_keys(
        edges.map_batches(
            lambda t: pa.table({"src": t.column("src").cast(_I64)})
            if "src" in t.column_names
            else pa.table({"src": pa.array([], _I64)}),
            batch_format="pyarrow",
        ),
        "src",
        num_shards=num_shards,
        count_col="deg",
    )
    hist = count_i64_keys(
        deg.map_batches(
            lambda t: pa.table({"deg": t.column("deg")})
            if "deg" in t.column_names
            else pa.table({"deg": pa.array([], _I64)}),
            batch_format="pyarrow",
        ),
        "deg",
        num_shards=num_shards,
        count_col="c",
    ).to_pandas()  # O(distinct degrees) rows — tiny by construction
    hist = hist.sort_values("deg").reset_index(drop=True)
    v = hist["deg"].to_numpy(dtype=np.int64)
    c = hist["c"].to_numpy(dtype=np.int64)
    n = int(c.sum())
    if n == 0:
        return ray.data.from_items([{"n": 0, "gini": 0.0}])
    # Python-int accumulation (ADVICE r4): rank_sums ~ n² and the
    # numerator terms ~ v·n² silently wrap int64 around n ~ 1e8 with
    # degrees in the thousands. The histogram is O(distinct degrees)
    # driver-side rows, so exact bigint arithmetic is free.
    num = 0
    den = 0
    end = 0
    for vi, ci in zip((int(x) for x in v), (int(x) for x in c)):
        start = end + 1
        end += ci
        rank_sum = (start + end) * ci // 2  # Σ ranks over the block
        num += vi * (2 * rank_sum - ci * (n + 1))
        den += vi * ci
    den *= n
    return ray.data.from_items(
        [{"n": n, "gini": round(num / den, 6) if den else 0.0}]
    )


def modularity(
    und_edges: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    num_partitions: int = 8,
    num_shards: int = 16,
) -> "ray.data.Dataset":
    """Newman modularity Q of a vertex partition over an undirected
    graph: Q = Σ_c [ m_c/m − (d_c/2m)² ] — the community-quality score
    a pipeline reports next to its LPA/CC labels.

    Inputs: canonical undirected distinct edges (a < b, no self-loops)
    and a (id, label) partition table. Scale shape: degrees via the
    count BSP; per-community degree sums d_c via one hash join +
    weighted count BSP; intra-community edge counts m_c via TWO label
    joins onto the edge stream + a vectorized equality filter +
    count BSP per label — no per-community grouping of raw edges.
    Returns one row (m, n_communities, modularity 6dp)."""
    e = und_edges.map_batches(
        lambda t: pa.table(
            {"a": t.column("a").cast(_I64), "b": t.column("b").cast(_I64)}
        )
        if "a" in t.column_names
        else pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).materialize()
    m = e.count()
    if m == 0:
        return ray.data.from_items([{"m": 0, "n_communities": 0, "modularity": 0.0}])
    lab = labels.map_batches(
        lambda t: pa.table(
            {"v": t.column("id").cast(_I64), "lab": t.column("label").cast(_I64)}
        )
        if "id" in t.column_names
        else pa.table({"v": pa.array([], _I64), "lab": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).materialize()

    # undirected degree per vertex
    both = e.map_batches(
        lambda t: pa.table({"v": t.column("a")})
        if "a" in t.column_names
        else pa.table({"v": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).union(
        e.map_batches(
            lambda t: pa.table({"v": t.column("b")})
            if "a" in t.column_names
            else pa.table({"v": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
    )
    deg = count_i64_keys(both, "v", num_shards=num_shards, count_col="deg")

    # d_c per community: join labels onto degrees, weighted count BSP
    dj = compact_for_join(deg, num_partitions).join(
        compact_for_join(lab, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("v",),
        right_on=("v",),
    )
    dc = count_i64_keys(
        dj.map_batches(
            lambda t: pa.table({"lab": t.column("lab"), "w": t.column("deg")})
            if "lab" in t.column_names
            else pa.table({"lab": pa.array([], _I64), "w": pa.array([], _I64)}),
            batch_format="pyarrow",
        ),
        "lab",
        num_shards=num_shards,
        count_col="d_c",
        weight_col="w",
    ).materialize()

    # m_c per community: two label joins onto the edge stream
    la = lab.map_batches(
        lambda t: pa.table({"va": t.column("v"), "la": t.column("lab")})
        if "v" in t.column_names
        else pa.table({"va": pa.array([], _I64), "la": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    lb = lab.map_batches(
        lambda t: pa.table({"vb": t.column("v"), "lb": t.column("lab")})
        if "v" in t.column_names
        else pa.table({"vb": pa.array([], _I64), "lb": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    j = compact_for_join(e, num_partitions).join(
        compact_for_join(la, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
        right_on=("va",),
    )
    j = compact_for_join(j, num_partitions).join(
        compact_for_join(lb, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
        right_on=("vb",),
    )
    intra = j.map_batches(
        lambda t: pa.table(
            {
                "lab": t.column("la").to_numpy(zero_copy_only=False)[
                    t.column("la").to_numpy(zero_copy_only=False)
                    == t.column("lb").to_numpy(zero_copy_only=False)
                ]
            }
        )
        if "la" in t.column_names and len(t)
        else pa.table({"lab": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    mc = count_i64_keys(intra, "lab", num_shards=num_shards, count_col="m_c").materialize()

    # fold the two tiny per-community tables (O(#communities))
    dc_pd = dc.to_pandas()
    mc_pd = mc.to_pandas().set_index("lab")["m_c"]
    q = 0.0
    for lab_id, d_c in zip(dc_pd["lab"], dc_pd["d_c"]):
        m_c = float(mc_pd.get(lab_id, 0))
        q += m_c / m - (d_c / (2.0 * m)) ** 2
    return ray.data.from_items(
        [
            {
                "m": int(m),
                "n_communities": int(len(dc_pd)),
                "modularity": round(q, 6),
            }
        ]
    )


def edge_jaccard(
    und_edges: "ray.data.Dataset",
    k: int = 20,
    num_partitions: int = 8,
    num_shards: int = 16,
) -> "ray.data.Dataset":
    """Neighborhood Jaccard similarity for EXISTING edges: for each
    distinct undirected edge (a < b),
    ``jaccard = |N(a) ∩ N(b)| / (deg a + deg b − |N(a) ∩ N(b)|)`` —
    the classic link-prediction / community-strength feature (the
    set-overlap sibling of :func:`adamic_adar_scores`). Returns the
    top-``k`` edges as ``(a, b, jaccard)``, ordered (jaccard desc,
    a asc, b asc), jaccard rounded 6dp BEFORE the ordering (the gate
    float-parity rule: the SQL twin orders by the same rounded value).

    Scale shape: the common-neighbor count is ktruss.edge_support —
    degree-oriented triangle join path + BSP adjacency, O(triangles)
    work, NOT the O(wedges) relay expansion adamic_adar needs (AA
    weights relays individually; Jaccard only needs the count, and
    every counted wedge closes a triangle). Edges closing zero
    triangles re-enter via a packed-key BSP sum over (support rows ∪
    zero rows) — NOT a left_outer join: a triangle-free input makes
    the support side a fully-empty Dataset, which Ray's hash join
    rejects (the empty-block landmine). Degrees then ride two hash
    joins. Driver holds only the k-row result.

    Input: canonical undirected (a < b) distinct edges, ids in
    [0, 2^31) (packed-key bound, inherited from edge_support).
    """
    from ..util import topk_rows
    from .ktruss import edge_support
    from .triangles import _degrees

    P = num_partitions
    und = compact_for_join(
        und_edges.map_batches(
            lambda t: pa.table({"a": t.column("a").cast(_I64), "b": t.column("b").cast(_I64)})
            if "a" in t.column_names
            else pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)}),
            batch_format="pyarrow",
        ),
        P,
    ).materialize()
    SHIFT = np.int64(1) << 31

    def _pack(sup_col: str | None):
        def fn(t: pa.Table) -> pa.Table:
            if "a" not in t.column_names or len(t) == 0:
                return pa.table({"key": pa.array([], _I64), "partial": pa.array([], _I64)})
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            w = (
                t.column(sup_col).to_numpy(zero_copy_only=False)
                if sup_col
                else np.zeros(len(t), np.int64)
            )
            return pa.table({"key": pa.array(a * SHIFT + b), "partial": pa.array(w)})

        return fn

    sup_rows = edge_support(und, num_partitions=P, num_shards=num_shards).map_batches(
        _pack("support"), batch_format="pyarrow"
    )
    zero_rows = und.map_batches(_pack(None), batch_format="pyarrow")
    tot = count_i64_keys(
        sup_rows.union(zero_rows),
        "key",
        num_shards=num_shards,
        count_col="support",
        weight_col="partial",
    )

    def _unpack(t: pa.Table) -> pa.Table:
        if "key" not in t.column_names or len(t) == 0:
            return pa.table(
                {"a": pa.array([], _I64), "b": pa.array([], _I64), "support": pa.array([], _I64)}
            )
        kk = t.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {"a": pa.array(kk // SHIFT), "b": pa.array(kk % SHIFT), "support": t.column("support")}
        )

    edges_sup = compact_for_join(tot.map_batches(_unpack, batch_format="pyarrow"), P)
    deg = compact_for_join(_degrees(und), P)

    j1 = edges_sup.join(deg, join_type="inner", num_partitions=P, on=("a",), right_on=("v",))

    def _j1_project(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names:
            return pa.table(
                {
                    "a": pa.array([], _I64),
                    "b": pa.array([], _I64),
                    "support": pa.array([], _I64),
                    "deg_a": pa.array([], _I64),
                }
            )
        return pa.table(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "support": t.column("support"),
                "deg_a": t.column("deg"),
            }
        )

    j1 = compact_for_join(j1.map_batches(_j1_project, batch_format="pyarrow"), P)
    j2 = j1.join(deg, join_type="inner", num_partitions=P, on=("b",), right_on=("v",))

    def score(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names or len(t) == 0:
            return pa.table(
                {"a": pa.array([], _I64), "b": pa.array([], _I64), "jaccard": pa.array([], _F64)}
            )
        da = t.column("deg_a").to_numpy(zero_copy_only=False).astype(np.float64)
        db = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        c = t.column("support").to_numpy(zero_copy_only=False).astype(np.float64)
        jac = np.round(c / (da + db - c), 6)
        return pa.table(
            {"a": t.column("a"), "b": t.column("b"), "jaccard": pa.array(jac, _F64)}
        )

    flat = j2.map_batches(score, batch_format="pyarrow")
    return topk_rows(flat, [("jaccard", True), ("a", False), ("b", False)], k)


def conductance(
    und_edges: "ray.data.Dataset",
    sides: "ray.data.Dataset",
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Conductance of a two-way vertex cut over an undirected graph:
    phi(S) = cut(S) / min(vol(S), vol(V\\S)) with vol counted in
    edge-endpoint incidences — the partition-quality score a pipeline
    reports next to a min-cut / balanced split (modularity's two-set
    sibling; bounded by Cheeger's inequality, so it is also the
    spectral-gap certificate).

    Inputs: canonical undirected distinct edges (a < b, no
    self-loops) and a (id, side) table with side in {0, 1}. Scale
    shape: the SAME two label joins onto the edge stream as
    :func:`modularity`, then per-batch integer partials
    (cut, vol0, vol1) folded by a 3-scalar aggregate — volumes are
    derived from the joined edge stream itself (each edge contributes
    its two endpoint sides), so no separate degree pass is needed.
    All counts stay int64; the single float division happens ONCE on
    the driver, rounded 6dp (the gate float-parity rule). Returns one
    row (cut, vol0, vol1, conductance). Raises if either side has
    zero volume (conductance undefined) or a side value is not 0/1.
    """
    e = und_edges.map_batches(
        lambda t: pa.table(
            {"a": t.column("a").cast(_I64), "b": t.column("b").cast(_I64)}
        )
        if "a" in t.column_names
        else pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).materialize()
    lab = sides.map_batches(
        lambda t: pa.table(
            {"v": t.column("id").cast(_I64), "s": t.column("side").cast(_I64)}
        )
        if "id" in t.column_names
        else pa.table({"v": pa.array([], _I64), "s": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).materialize()

    la = lab.map_batches(
        lambda t: pa.table({"va": t.column("v"), "sa": t.column("s")})
        if "v" in t.column_names
        else pa.table({"va": pa.array([], _I64), "sa": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    lb = lab.map_batches(
        lambda t: pa.table({"vb": t.column("v"), "sb": t.column("s")})
        if "v" in t.column_names
        else pa.table({"vb": pa.array([], _I64), "sb": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    j = compact_for_join(e, num_partitions).join(
        compact_for_join(la, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
        right_on=("va",),
    )
    j = compact_for_join(j, num_partitions).join(
        compact_for_join(lb, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
        right_on=("vb",),
    )

    def partials(t: pa.Table) -> pa.Table:
        if "sa" not in t.column_names or len(t) == 0:
            return pa.table(
                {c: pa.array([], _I64) for c in ["cut", "vol0", "vol1"]}
            )
        sa = t.column("sa").to_numpy(zero_copy_only=False)
        sb = t.column("sb").to_numpy(zero_copy_only=False)
        if ((sa | sb) & ~np.int64(1)).any():
            raise ValueError("conductance: side values must be 0 or 1")
        s01 = int(sa.sum() + sb.sum())  # side-1 endpoint incidences
        return pa.table(
            {
                "cut": pa.array([int((sa != sb).sum())], _I64),
                "vol0": pa.array([2 * len(sa) - s01], _I64),
                "vol1": pa.array([s01], _I64),
            }
        )

    from ray.data.aggregate import Sum

    agg = j.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("cut"), Sum("vol0"), Sum("vol1")
    )
    cut = int(agg["sum(cut)"] or 0)
    vol0 = int(agg["sum(vol0)"] or 0)
    vol1 = int(agg["sum(vol1)"] or 0)
    if vol0 == 0 or vol1 == 0:
        raise ValueError(
            f"conductance undefined: one side has zero volume (vol0={vol0}, vol1={vol1})"
        )
    return ray.data.from_items(
        [
            {
                "cut": cut,
                "vol0": vol0,
                "vol1": vol1,
                "conductance": round(cut / min(vol0, vol1), 6),
            }
        ]
    )


def butterfly_count(
    edges: "ray.data.Dataset",
    u_col: str = "u",
    v_col: str = "v",
    num_partitions: int = 8,
    num_shards: int = 16,
    max_hub_degree: "int | None" = None,
) -> "ray.data.Dataset":
    """Bipartite 4-cycle (butterfly) count — the bipartite analogue of
    triangle counting (Sanei-Mehri et al. 2018; the cohesion motif of
    user×item / order×part / host×resource incidence graphs): one row
    (n_pairs, butterflies) where n_pairs = same-U-side pairs sharing at
    least one V neighbor and butterflies = Σ_{u1<u2} C(cn(u1,u2), 2)
    over common-neighbor counts.

    Scale shape: DISTINCT incidence via the pair BSP (ids must be in
    [0, 2^31) — the packer's contract), ONE self-join on the V side
    (the only pair-expanding step — the wedge stream), vectorized a<b
    pack → packed count BSP → per-block C(n,2) partials folded to two
    scalars. ``max_hub_degree`` drops V-side hubs above the cap BEFORE
    the join (the item_pairs posture — a 10⁴-degree hub emits 10⁸
    wedge rows); default None = exact, and when the cap fires the
    number of dropped hubs is reported in the output row (never a
    silent cap)."""
    from ..util import (
        distinct_i64_pairs,
        pack_sorted_keys,
        semi_join_filter,
    )

    e = edges.map_batches(
        lambda t: pa.table(
            {"u": t.column(u_col).cast(_I64), "v": t.column(v_col).cast(_I64)}
        )
        if u_col in t.column_names
        else pa.table({"u": pa.array([], _I64), "v": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    de = distinct_i64_pairs(e, "u", "v").materialize()

    n_hubs_dropped = 0
    if max_hub_degree is not None:
        hot = count_i64_keys(de, "v", num_shards=num_shards, count_col="_c").map_batches(
            lambda t: t.filter(
                pa.array(t.column("_c").to_numpy(zero_copy_only=False) > max_hub_degree)
            ).select(["v"])
            if "v" in t.column_names and len(t)
            else pa.table({"v": pa.array([], _I64)}),
            batch_format="pyarrow",
        ).materialize()
        n_hubs_dropped = hot.count()
        if n_hubs_dropped:
            de = semi_join_filter(de, "v", pack_sorted_keys(hot, "v"), keep=False).materialize()
            if de.count() == 0:
                # every incidence was hub-backed: a fully-empty Dataset
                # has no schema and the join would raise — short-circuit
                return ray.data.from_items(
                    [{"n_pairs": 0, "butterflies": 0,
                      "n_hubs_dropped": int(n_hubs_dropped)}]
                )

    left = de.map_batches(
        lambda t: pa.table({"v": t.column("v"), "a": t.column("u")})
        if "v" in t.column_names
        else pa.table({"v": pa.array([], _I64), "a": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    right = de.map_batches(
        lambda t: pa.table({"v2": t.column("v"), "b": t.column("u")})
        if "v" in t.column_names
        else pa.table({"v2": pa.array([], _I64), "b": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    j = compact_for_join(left, num_partitions).join(
        compact_for_join(right, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("v",),
        right_on=("v2",),
    )

    SHIFT = np.int64(1) << 31

    def pack(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table({"pk": pa.array([], _I64)})
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        m = a < b
        return pa.table({"pk": pa.array(a[m] * SHIFT + b[m])})

    counts = count_i64_keys(
        j.map_batches(pack, batch_format="pyarrow"), "pk", count_col="n",
        num_shards=num_shards,
    )

    def bf_partial(t: pa.Table) -> pa.Table:
        if "n" not in t.column_names or len(t) == 0:
            return pa.table({"p": pa.array([], _I64), "bf": pa.array([], _I64)})
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p": pa.array([len(n)]),
                "bf": pa.array([int((n * (n - 1) // 2).sum())]),
            }
        )

    parts = counts.map_batches(bf_partial, batch_format="pyarrow").materialize()
    n_pairs = int(parts.sum("p") or 0)
    bf = int(parts.sum("bf") or 0)
    row = {"n_pairs": n_pairs, "butterflies": bf}
    if max_hub_degree is not None:
        row["n_hubs_dropped"] = int(n_hubs_dropped)
    return ray.data.from_items([row])


def local_clustering(
    und_edges: "ray.data.Dataset",
    num_partitions: int = 8,
    num_shards: int = 16,
) -> "ray.data.Dataset":
    """Per-vertex LOCAL clustering coefficient over a canonical
    undirected edge set ``(a, b), a < b``: for every vertex with
    degree >= 2, ``lcc = tri(v) / C(d, 2)`` — the per-vertex sibling
    of the global coefficient above, and the standard "how clique-like
    is this page's neighborhood" feature.

    Shape: per-edge triangle supports ride the ktruss triangle join
    path (``edge_support`` — O(triangles) work, never wedge
    expansion); each support row credits BOTH endpoints, so one
    weighted count-BSP folds Σ support per vertex = 2·tri(v).
    Zero-triangle vertices re-enter via (v, 0) rows UNIONed into the
    same BSP from the degree table (the ktruss zero-rows rule — never
    an outer join against a possibly fully-empty support set). One
    Acero join pairs (v, degree) with (v, 2tri); the terminal rounded
    division is the only float op, and its expression structure
    (2·tri·1.0 / (d·(d−1))) is mirrored by the SQL oracle.

    Output (vertex, degree, n_tri, lcc), degree >= 2 only."""
    from .ktruss import edge_support

    P = num_partitions
    sup = edge_support(und_edges, num_partitions=P, num_shards=num_shards)

    def expand_edges(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table({"v": pa.array([], _I64)})
        return pa.table(
            {
                "v": pa.concat_arrays(
                    [
                        t.column("a").cast(_I64).combine_chunks(),
                        t.column("b").cast(_I64).combine_chunks(),
                    ]
                )
            }
        )

    deg = count_i64_keys(
        und_edges.map_batches(expand_edges, batch_format="pyarrow"),
        "v",
        num_shards=num_shards,
        count_col="degree",
    )

    def expand_support(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table({"v": pa.array([], _I64), "w": pa.array([], _I64)})
        s = t.column("support").cast(_I64).combine_chunks()
        return pa.table(
            {
                "v": pa.concat_arrays(
                    [
                        t.column("a").cast(_I64).combine_chunks(),
                        t.column("b").cast(_I64).combine_chunks(),
                    ]
                ),
                "w": pa.concat_arrays([s, s]),
            }
        )

    def zero_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "v" not in t.column_names:
            return pa.table({"v": pa.array([], _I64), "w": pa.array([], _I64)})
        return pa.table(
            {
                "v": t.column("v").cast(_I64),
                "w": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    s2 = count_i64_keys(
        sup.map_batches(expand_support, batch_format="pyarrow").union(
            deg.map_batches(zero_rows, batch_format="pyarrow")
        ),
        "v",
        num_shards=num_shards,
        count_col="s2",
        weight_col="w",
    )
    joined = compact_for_join(
        deg.map_batches(ensure_schema({"v": _I64, "degree": _I64}), batch_format="pyarrow"),
        P,
    ).join(
        compact_for_join(
            s2.map_batches(
                lambda t: pa.table({"v2": t.column("v"), "s2": t.column("s2")}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="inner",
        num_partitions=P,
        on=("v",),
        right_on=("v2",),
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "v" not in t.column_names:
            return pa.table(
                {
                    "vertex": pa.array([], _I64),
                    "degree": pa.array([], _I64),
                    "n_tri": pa.array([], _I64),
                    "lcc": pa.array([], _F64),
                }
            )
        d = t.column("degree").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("s2").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d >= 2
        d, s = d[keep], s[keep]
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table(
            {
                "vertex": pa.array(v),
                "degree": pa.array(d),
                "n_tri": pa.array(s // 2),
                "lcc": pa.array(np.round(s * 1.0 / (d * (d - 1)), 6)),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def rich_club(
    und_edges: "ray.data.Dataset",
    ks: "tuple[int, ...]" = (1, 2, 4, 8, 16, 32),
    num_partitions: int = 8,
    num_shards: int = 16,
) -> "ray.data.Dataset":
    """Rich-club coefficients φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1)) —
    do high-degree vertices preferentially link to each other (the hub
    'old boys network' signal of web graphs; Colizza et al. 2006).
    Input: canonical undirected distinct edges (a < b). Output one row
    per k: (k, n_k, e_k, phi 6dp).

    Scale shape: undirected degrees via the count BSP; TWO hash joins
    attach both endpoint degrees to the edge stream; then one
    map_batches evaluates ALL thresholds per batch (a |ks|-column
    boolean fold → per-k partial counts) and the driver folds
    |ks| rows. The degree histogram side (n_k) is the same count-BSP
    output folded driver-side — O(distinct degrees) rows."""
    e = und_edges.map_batches(
        lambda t: pa.table({"a": t.column("a").cast(pa.int64()), "b": t.column("b").cast(pa.int64())})
        if "a" in t.column_names
        else pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    sym = e.union(
        e.map_batches(
            lambda t: pa.table({"a": t.column("b"), "b": t.column("a")})
            if "a" in t.column_names
            else pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        )
    )
    deg = count_i64_keys(
        sym.map_batches(
            lambda t: pa.table({"v": t.column("a")})
            if "a" in t.column_names
            else pa.table({"v": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        ),
        "v",
        num_shards=num_shards,
        count_col="deg",
    ).materialize()

    ka = np.asarray(sorted(ks), dtype=np.int64)

    # n_k from the degree histogram (count-of-counts BSP output is
    # O(distinct degrees) — driver-fold free)
    hist = count_i64_keys(
        deg.map_batches(
            lambda t: pa.table({"deg": t.column("deg")})
            if "deg" in t.column_names
            else pa.table({"deg": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        ),
        "deg",
        num_shards=num_shards,
        count_col="c",
    ).to_pandas()
    dv = hist["deg"].to_numpy(dtype=np.int64)
    dc = hist["c"].to_numpy(dtype=np.int64)
    n_k = np.array([dc[dv > k].sum() for k in ka], dtype=np.int64)

    da = compact_for_join(e, num_partitions).join(
        compact_for_join(deg, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
        right_on=("v",),
    )

    def rename_da(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "da": pa.array([], pa.int64())}
            )
        return pa.table({"a": t.column("a"), "b": t.column("b"), "da": t.column("deg")})

    both = compact_for_join(
        da.map_batches(rename_da, batch_format="pyarrow"), num_partitions
    ).join(
        compact_for_join(deg, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
        right_on=("v",),
    )

    def ek_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "da" not in t.column_names:
            return pa.table(
                {"i": pa.array([], pa.int64()), "e": pa.array([], pa.int64())}
            )
        a = t.column("da").to_numpy(zero_copy_only=False)
        b = t.column("deg").to_numpy(zero_copy_only=False)
        cnt = ((a[None, :] > ka[:, None]) & (b[None, :] > ka[:, None])).sum(axis=1)
        return pa.table(
            {"i": pa.array(np.arange(len(ka), dtype=np.int64)), "e": pa.array(cnt.astype(np.int64))}
        )

    ek = (
        both.map_batches(ek_partial, batch_format="pyarrow")
        .groupby("i")
        .aggregate(Sum("e", alias_name="e"))
        .map_batches(ensure_schema({"i": pa.int64(), "e": pa.int64()}), batch_format="pyarrow")
        .to_pandas()
        .sort_values("i")
    )
    e_k = np.zeros(len(ka), dtype=np.int64)
    e_k[ek["i"].to_numpy(dtype=np.int64)] = ek["e"].to_numpy(dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.where(
            n_k >= 2, 2.0 * e_k / (n_k.astype(np.float64) * (n_k - 1)), 0.0
        )
    return ray.data.from_items(
        [
            {"k": int(k), "n_k": int(nk), "e_k": int(ekk), "phi": round(float(p), 6)}
            for k, nk, ekk, p in zip(ka, n_k, e_k, phi)
        ]
    )
