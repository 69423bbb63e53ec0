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
        ).map_batches(
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
