"""HITS (hubs & authorities) over an edge table — join-based, fixed
iteration count, L1-normalized.

Update rule per iteration (classic Kleinberg, with sum-normalization
instead of L2 so the unrolled SQL oracle stays exact):

    h'(v) = Σ_{(v,u) ∈ E} a(u)        then  h = h' / Σ h'
    a'(u) = Σ_{(v,u) ∈ E} h(v)        then  a = a' / Σ a'

starting from a₀ = 1/n on every vertex. Vertices with no out-edges
keep hub 0; no in-edges keep authority 0.

Execution shape — the half-steps are LINEAR maps, so every scalar
normalization commutes to the end: the loop runs on RAW sparse scores
(initial a₀ ≡ 1, zero-score vertices dropped — they contribute
nothing to any later sum), each half-step is exactly ONE hash join
(scores ⋈ edges) + ONE grouped sum, and the final stage zero-fills
against the vertex set and divides hub/auth by their totals once.
That is 2 all-to-all exchanges per half-step instead of the naive 3 +
a per-step normalize pass, and is float-identical to the per-step
normalized chain up to ~1-ulp scalar reassociation (both sides round
to 6dp). Raw magnitudes grow like (mean degree)^half-steps — far
inside float64 range for the fixed small ``iters`` this pipeline
targets (SQL-oracle-able unrolled CTEs); for free-running iteration
counts use the sharded BSP engine instead.

Reference scope note: the reference engine (lioia/distributed-pagerank,
pkg/graph/pagerank.go) implements only PageRank; HITS is an engine
extension sharing its edge-table data model and fixed-iteration
contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from ..util import compact_for_join, count_i64_keys, ensure_schema

_I64 = pa.int64()
_F64 = pa.float64()


def hits_fixed(
    edges: "ray.data.Dataset",
    iters: int = 3,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "ray.data.Dataset":
    """Returns (vertex, hub, auth) after exactly ``iters`` iterations,
    each L1-normalized (Σhub = Σauth = 1), rounded to 6dp.
    Deterministic."""
    P = num_partitions

    e = edges.map_batches(
        lambda t: pa.table(
            {"src": t.column(src_col).cast(_I64), "dst": t.column(dst_col).cast(_I64)}
        ),
        batch_format="pyarrow",
    )
    e = compact_for_join(e, P).materialize()

    both = e.map_batches(
        lambda t: pa.table({"v": t.column("src")}), batch_format="pyarrow"
    ).union(e.map_batches(lambda t: pa.table({"v": t.column("dst")}), batch_format="pyarrow"))
    verts = (
        count_i64_keys(both, "v")
        .map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")
        .materialize()
    )

    # raw a₀ ≡ 1 (any uniform constant — normalization happens once at
    # the end, and scalars commute through the linear half-steps)
    auth = verts.map_batches(
        lambda t: pa.table({"v": t.column("v"), "x": pa.array(np.ones(len(t)))}),
        batch_format="pyarrow",
    ).materialize()
    hub = auth

    def _half_step(scores, join_key: str, group_key: str):
        """Raw half-step: sum scores of ``join_key`` neighbors onto
        ``group_key`` vertices. Sparse: vertices summing to nothing
        simply emit no row (they contribute nothing downstream)."""
        j = compact_for_join(scores, P).join(
            e, join_type="inner", num_partitions=P, on=("v",), right_on=(join_key,)
        )

        def pick(t: pa.Table) -> pa.Table:
            if group_key not in t.column_names:
                return pa.table({"k": pa.array([], _I64), "x": pa.array([], _F64)})
            return pa.table({"k": t.column(group_key), "x": t.column("x")})

        return (
            j.map_batches(pick, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("x", alias_name="s"))
            .map_batches(
                lambda t: pa.table({"v": t.column("k"), "x": t.column("s")})
                if "k" in t.column_names
                else pa.table({"v": pa.array([], _I64), "x": pa.array([], _F64)}),
                batch_format="pyarrow",
            )
            .map_batches(ensure_schema({"v": _I64, "x": _F64}), batch_format="pyarrow")
            .materialize()
        )

    for _ in range(iters):
        # h(v) = Σ a(u) over out-neighbors u: join auth on EDGE DST,
        # accumulate onto src
        hub = _half_step(auth, "dst", "src")
        # a(u) = Σ h(v) over in-neighbors v: join hub on EDGE SRC,
        # accumulate onto dst
        auth = _half_step(hub, "src", "dst")

    t_h = float(hub.aggregate(Sum("x", alias_name="t"))["t"])
    t_a = float(auth.aggregate(Sum("x", alias_name="t"))["t"])

    j = compact_for_join(verts, P).join(
        compact_for_join(
            hub.map_batches(
                lambda t: pa.table({"vh": t.column("v"), "h": t.column("x")}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="left_outer", num_partitions=P, on=("v",), right_on=("vh",),
    )
    j = compact_for_join(j, P).join(
        compact_for_join(
            auth.map_batches(
                lambda t: pa.table({"va": t.column("v"), "a": t.column("x")}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="left_outer", num_partitions=P, on=("v",), right_on=("va",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if "v" not in t.column_names:
            return pa.table(
                {
                    "vertex": pa.array([], _I64),
                    "hub": pa.array([], _F64),
                    "auth": pa.array([], _F64),
                }
            )
        n = len(t)
        h = t.column("h") if "h" in t.column_names else pa.nulls(n, _F64)
        a = t.column("a") if "a" in t.column_names else pa.nulls(n, _F64)
        h = pc.fill_null(h.cast(_F64), 0.0).to_numpy(zero_copy_only=False)
        a = pc.fill_null(a.cast(_F64), 0.0).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vertex": t.column("v"),
                "hub": pa.array(np.round(h / t_h, 6)),
                "auth": pa.array(np.round(a / t_a, 6)),
            }
        )

    return j.map_batches(fin, batch_format="pyarrow")


def salsa_fixed(
    edges: "ray.data.Dataset",
    iters: int = 2,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "ray.data.Dataset":
    """SALSA (Lempel & Moran's stochastic HITS sibling): the same
    hub/authority half-steps but every sent score is divided by the
    SENDER's degree —

        a'(u) = Σ_{(v,u) ∈ E} h(v) / out(v)
        h'(v) = Σ_{(v,u) ∈ E} a'(u) / in(u)

    run for exactly ``iters`` iterations from h₀ ≡ 1, then
    L1-normalized ONCE (the degree weights are FIXED, so each
    half-step stays a linear map and the single terminal
    normalization is float-identical to per-step normalizing up to
    scalar reassociation — the hits_fixed argument). Returns (vertex,
    hub, auth) rounded 6dp, zero where a side never receives mass.

    Execution shape: degrees via two count BSPs, annotated onto the
    edge table ONCE (two joins, schema-pinned), then per half-step one
    hash join + one grouped sum — identical cost profile to
    hits_fixed. Per-edge division happens at the map (x / deg, the
    exact expression the SQL oracle uses; never pre-inverted — the
    float-parity rule)."""
    P = num_partitions

    e = edges.map_batches(
        lambda t: pa.table(
            {"src": t.column(src_col).cast(_I64), "dst": t.column(dst_col).cast(_I64)}
        ),
        batch_format="pyarrow",
    )
    e = compact_for_join(e, P).materialize()

    od = count_i64_keys(
        e.map_batches(lambda t: pa.table({"v": t.column("src")}), batch_format="pyarrow"),
        "v",
        count_col="d",
    )
    idg = count_i64_keys(
        e.map_batches(lambda t: pa.table({"v": t.column("dst")}), batch_format="pyarrow"),
        "v",
        count_col="d",
    )
    both = e.map_batches(
        lambda t: pa.table({"v": t.column("src")}), batch_format="pyarrow"
    ).union(
        e.map_batches(lambda t: pa.table({"v": t.column("dst")}), batch_format="pyarrow")
    )
    verts = (
        count_i64_keys(both, "v")
        .map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")
        .materialize()
    )

    ea = e.join(
        compact_for_join(
            od.map_batches(
                lambda t: pa.table({"ov": t.column("v"), "od": t.column("d")})
                if "v" in t.column_names and len(t)
                else pa.table({"ov": pa.array([], _I64), "od": pa.array([], _I64)}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="inner", num_partitions=P, on=("src",), right_on=("ov",),
    )
    ea = ea.map_batches(  # schema pin between chained joins
        ensure_schema({"src": _I64, "dst": _I64, "od": _I64}), batch_format="pyarrow"
    )
    ea = compact_for_join(ea, P).join(
        compact_for_join(
            idg.map_batches(
                lambda t: pa.table({"iv": t.column("v"), "idg": t.column("d")})
                if "v" in t.column_names and len(t)
                else pa.table({"iv": pa.array([], _I64), "idg": pa.array([], _I64)}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="inner", num_partitions=P, on=("dst",), right_on=("iv",),
    )
    ea = compact_for_join(
        ea.map_batches(
            ensure_schema({"src": _I64, "dst": _I64, "od": _I64, "idg": _I64}),
            batch_format="pyarrow",
        ),
        P,
    ).materialize()

    hub = verts.map_batches(
        lambda t: pa.table({"v": t.column("v"), "x": pa.array(np.ones(len(t)))}),
        batch_format="pyarrow",
    ).materialize()
    auth = hub

    def _half(scores, join_key: str, group_key: str, deg_key: str):
        j = compact_for_join(scores, P).join(
            ea, join_type="inner", num_partitions=P, on=("v",), right_on=(join_key,)
        )

        def pick(t: pa.Table) -> pa.Table:
            if group_key not in t.column_names:
                return pa.table({"k": pa.array([], _I64), "x": pa.array([], _F64)})
            x = t.column("x").to_numpy(zero_copy_only=False)
            d = t.column(deg_key).to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({"k": t.column(group_key), "x": pa.array(x / d)})

        return (
            j.map_batches(pick, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("x", alias_name="s"))
            .map_batches(
                lambda t: pa.table({"v": t.column("k"), "x": t.column("s")})
                if "k" in t.column_names
                else pa.table({"v": pa.array([], _I64), "x": pa.array([], _F64)}),
                batch_format="pyarrow",
            )
            .map_batches(ensure_schema({"v": _I64, "x": _F64}), batch_format="pyarrow")
            .materialize()
        )

    for _ in range(iters):
        auth = _half(hub, "src", "dst", "od")
        hub = _half(auth, "dst", "src", "idg")

    t_h = float(hub.aggregate(Sum("x", alias_name="t"))["t"])
    t_a = float(auth.aggregate(Sum("x", alias_name="t"))["t"])

    j = compact_for_join(verts, P).join(
        compact_for_join(
            hub.map_batches(
                lambda t: pa.table({"vh": t.column("v"), "h": t.column("x")}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="left_outer", num_partitions=P, on=("v",), right_on=("vh",),
    )
    j = compact_for_join(j, P).join(
        compact_for_join(
            auth.map_batches(
                lambda t: pa.table({"va": t.column("v"), "a": t.column("x")}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="left_outer", num_partitions=P, on=("v",), right_on=("va",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if "v" not in t.column_names:
            return pa.table(
                {
                    "vertex": pa.array([], _I64),
                    "hub": pa.array([], _F64),
                    "auth": pa.array([], _F64),
                }
            )
        n = len(t)
        h = t.column("h") if "h" in t.column_names else pa.nulls(n, _F64)
        a = t.column("a") if "a" in t.column_names else pa.nulls(n, _F64)
        h = pc.fill_null(h.cast(_F64), 0.0).to_numpy(zero_copy_only=False)
        a = pc.fill_null(a.cast(_F64), 0.0).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vertex": t.column("v"),
                "hub": pa.array(np.round(h / t_h, 6)),
                "auth": pa.array(np.round(a / t_a, 6)),
            }
        )

    return j.map_batches(fin, batch_format="pyarrow")
