"""Weighted PageRank over an edge table with a ``weight`` column —
the JOIN-BASED formulation, fixed iteration count.

Contribution of src→dst is ``rank(src) · w(src,dst) / W(src)`` where
``W(src)`` is src's total out-weight; update is the reference rule
``r' = (1−c)·E + c·Σ contrib`` with uniform E (reference semantics per
pkg/graph/pagerank.go, generalized to weights; the unweighted sharded
BSP engine in pipelines/pagerank.py remains the scale path for the
plain case — this pipeline exists for weighted graphs and doubles as
the join-based contrast implementation its docstring mentions).

Shape per iteration: ONE hash join (ranks ⋈ edges on src — ranks is
the small-per-partition side) + ONE grouped sum on dst. Loop-invariant
state (edges with precomputed w/W, the vertex list) is materialized
once; only the rank table changes per iteration. Fixed ``iters`` keeps
it SQL-oracle-checkable (unrolled CTEs, like g_pagerank3)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from ..util import compact_for_join, ensure_schema

_I64 = pa.int64()
_F64 = pa.float64()


def pagerank_weighted_fixed(
    edges: "ray.data.Dataset",
    iters: int = 3,
    c: float = 0.85,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
) -> "ray.data.Dataset":
    """Returns (vertex, rank) after exactly ``iters`` iterations,
    normalized to Σrank = 1. Deterministic."""
    P = num_partitions

    norm_edges = edges.map_batches(
        lambda t: pa.table(
            {
                "src": t.column(src_col).cast(_I64),
                "dst": t.column(dst_col).cast(_I64),
                "w": t.column(w_col).cast(_F64),
            }
        ),
        batch_format="pyarrow",
    )
    # W(src): total out-weight — grouped sum once, joined back once
    wsum = (
        norm_edges.groupby("src")
        .aggregate(Sum("w", alias_name="W"))
        .map_batches(ensure_schema({"src": _I64, "W": _F64}), batch_format="pyarrow")
    )
    ew = compact_for_join(norm_edges, P).join(
        compact_for_join(wsum.map_batches(
            lambda t: pa.table({"src2": t.column("src"), "W": t.column("W")}),
            batch_format="pyarrow",
        ), P),
        join_type="inner", num_partitions=P, on=("src",), right_on=("src2",),
    )

    def _frac(t: pa.Table) -> pa.Table:
        if "src" not in t.column_names:
            return pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64), "f": pa.array([], _F64)})
        return pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "f": pc.divide(t.column("w"), t.column("W")),
            }
        )

    ew = compact_for_join(ew.map_batches(_frac, batch_format="pyarrow"), P).materialize()

    # vertex set = src ∪ dst — distinct via the count BSP (valid for
    # any int64 key: the shard hash wraps uint64, unlike the packed
    # PAIR key in distinct_i64_pairs which does need [0, 2^31) ids)
    both = norm_edges.map_batches(
        lambda t: pa.table({"v": t.column("src")}), batch_format="pyarrow"
    ).union(norm_edges.map_batches(lambda t: pa.table({"v": t.column("dst")}), batch_format="pyarrow"))
    from ..util import count_i64_keys

    verts = (
        count_i64_keys(both, "v")
        .map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")
        .materialize()
    )
    n = verts.count()
    base = (1.0 - c) / n

    ranks = verts.map_batches(
        lambda t: pa.table({"v": t.column("v"), "r": pa.array(np.full(len(t), 1.0 / n))}),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        j = compact_for_join(ranks, P).join(
            ew, join_type="inner", num_partitions=P, on=("v",), right_on=("src",)
        )

        def contrib(t: pa.Table) -> pa.Table:
            if "dst" not in t.column_names:
                return pa.table({"dst": pa.array([], _I64), "x": pa.array([], _F64)})
            return pa.table(
                {"dst": t.column("dst"), "x": pc.multiply(t.column("r"), t.column("f"))}
            )

        sums = (
            j.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("x", alias_name="s"))
            .map_batches(ensure_schema({"dst": _I64, "s": _F64}), batch_format="pyarrow")
        )
        j2 = compact_for_join(verts, P).join(
            compact_for_join(sums, P),
            join_type="left_outer", num_partitions=P, on=("v",), right_on=("dst",),
        )

        def update(t: pa.Table) -> pa.Table:
            if "v" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "r": pa.array([], _F64)})
            s = t.column("s") if "s" in t.column_names else pa.nulls(len(t), _F64)
            s = pc.fill_null(s.cast(_F64) if s.type != _F64 else s, 0.0)
            return pa.table(
                {"v": t.column("v"), "r": pc.add(pa.scalar(base), pc.multiply(pa.scalar(c), s))}
            )

        ranks = j2.map_batches(update, batch_format="pyarrow").materialize()

    total = float(
        ranks.aggregate(Sum("r", alias_name="t"))["t"]
    )

    def fin(t: pa.Table) -> pa.Table:
        if "v" not in t.column_names:
            return pa.table({"vertex": pa.array([], _I64), "rank": pa.array([], _F64)})
        return pa.table(
            {
                "vertex": t.column("v"),
                "rank": pa.array(
                    np.round(t.column("r").to_numpy(zero_copy_only=False) / total, 6)
                ),
            }
        )

    return ranks.map_batches(fin, batch_format="pyarrow")

def katz_fixed(
    edges: "ray.data.Dataset",
    iters: int = 3,
    beta: float = 0.005,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "ray.data.Dataset":
    """Katz centrality, fixed iteration count, join-based:

        x_{t+1}(v) = 1 + β · Σ_{(u,v)∈E} x_t(u),   x_0 ≡ 1

    — the path-counting centrality (β^k-weighted walks of every length)
    the damped-PageRank family doesn't cover: contributions are NOT
    out-degree normalized, so hubs radiate full mass. β must be below
    1/λ_max for the fixpoint to exist; a FIXED iteration count keeps
    the operator SQL-oracle-checkable (unrolled CTEs, like
    g_pagerank3). Same per-iteration shape as the weighted pipeline:
    one ranks⋈edges hash join + one grouped sum + a left-outer update
    join (vertices with no in-edges stay at 1). Returns (vertex, katz)
    rounded to 6 dp, UNnormalized — the raw recurrence the oracle
    replays."""
    P = num_partitions

    norm_edges = edges.map_batches(
        lambda t: pa.table(
            {
                "src": t.column(src_col).cast(_I64),
                "dst": t.column(dst_col).cast(_I64),
            }
        )
        if src_col in t.column_names
        else pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    E = compact_for_join(norm_edges, P).materialize()

    from ..util import count_i64_keys

    both = norm_edges.map_batches(
        lambda t: pa.table({"v": t.column("src")}), batch_format="pyarrow"
    ).union(
        norm_edges.map_batches(
            lambda t: pa.table({"v": t.column("dst")}), batch_format="pyarrow"
        )
    )
    verts = (
        count_i64_keys(both, "v")
        .map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")
        .materialize()
    )

    ranks = verts.map_batches(
        lambda t: pa.table({"v": t.column("v"), "r": pa.array(np.full(len(t), 1.0))}),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        j = compact_for_join(ranks, P).join(
            E, join_type="inner", num_partitions=P, on=("v",), right_on=("src",)
        )

        def contrib(t: pa.Table) -> pa.Table:
            if "dst" not in t.column_names:
                return pa.table({"dst": pa.array([], _I64), "x": pa.array([], _F64)})
            return pa.table({"dst": t.column("dst"), "x": t.column("r")})

        sums = (
            j.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("x", alias_name="s"))
            .map_batches(ensure_schema({"dst": _I64, "s": _F64}), batch_format="pyarrow")
        )
        j2 = compact_for_join(verts, P).join(
            compact_for_join(sums, P),
            join_type="left_outer",
            num_partitions=P,
            on=("v",),
            right_on=("dst",),
        )

        def update(t: pa.Table) -> pa.Table:
            if "v" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "r": pa.array([], _F64)})
            s = t.column("s") if "s" in t.column_names else pa.nulls(len(t), _F64)
            s = pc.fill_null(s.cast(_F64) if s.type != _F64 else s, 0.0)
            return pa.table(
                {
                    "v": t.column("v"),
                    "r": pc.add(pa.scalar(1.0), pc.multiply(pa.scalar(beta), s)),
                }
            )

        ranks = j2.map_batches(update, batch_format="pyarrow").materialize()

    def fin(t: pa.Table) -> pa.Table:
        if "v" not in t.column_names:
            return pa.table({"vertex": pa.array([], _I64), "katz": pa.array([], _F64)})
        return pa.table(
            {
                "vertex": t.column("v"),
                "katz": pa.array(
                    np.round(t.column("r").to_numpy(zero_copy_only=False), 6)
                ),
            }
        )

    return ranks.map_batches(fin, batch_format="pyarrow")


def eigencentrality_fixed(
    edges: "ray.data.Dataset",
    iters: int = 3,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "ray.data.Dataset":
    """Eigenvector centrality via a FIXED-count power iteration with one
    FINAL normalization:

        x_{t+1}(v) = Σ_{(u,v)∈E} x_t(u),  x_0 ≡ 1;
        eig(v) = x_iters(v) / Σ_w x_iters(w)

    — the undamped A^T power method (x_t(v) counts the directed
    t-step paths ending at v), the third member of the path-counting
    family next to :func:`katz_fixed` (β-damped, +1 restart) and
    pagerank (degree-normalized, teleport-damped). Per-iteration
    normalization would be the textbook form, but every intermediate
    float division multiplies float-parity surfaces; counts stay EXACT
    int64 through all iterations (engine and SQL oracle both sum
    BIGINTs) and the single final division is the only float op (the
    repo's float-parity rule). int64 bounds the reach: counts grow as
    Δ_in^iters, so ``iters`` beyond ~5 on a hub-heavy web graph needs
    the normalized variant instead — overflow raises loudly here.

    Same join plan as katz_fixed: one ranks⋈edges hash join + grouped
    sum + left-outer update per iteration; driver holds one scalar
    (the final total). Returns (vertex, eig) rounded 6 dp."""
    P = num_partitions

    norm_edges = edges.map_batches(
        lambda t: pa.table(
            {
                "src": t.column(src_col).cast(_I64),
                "dst": t.column(dst_col).cast(_I64),
            }
        )
        if src_col in t.column_names
        else pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    E = compact_for_join(norm_edges, P).materialize()

    from ..util import count_i64_keys

    both = norm_edges.map_batches(
        lambda t: pa.table({"v": t.column("src")}), batch_format="pyarrow"
    ).union(
        norm_edges.map_batches(
            lambda t: pa.table({"v": t.column("dst")}), batch_format="pyarrow"
        )
    )
    verts = (
        count_i64_keys(both, "v")
        .map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")
        .materialize()
    )

    ranks = verts.map_batches(
        lambda t: pa.table({"v": t.column("v"), "x": pa.array(np.ones(len(t), np.int64))}),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        j = compact_for_join(ranks, P).join(
            E, join_type="inner", num_partitions=P, on=("v",), right_on=("src",)
        )

        def contrib(t: pa.Table) -> pa.Table:
            if "dst" not in t.column_names:
                return pa.table({"dst": pa.array([], _I64), "c": pa.array([], _I64)})
            return pa.table({"dst": t.column("dst"), "c": t.column("x")})

        sums = (
            j.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="s"))
            .map_batches(ensure_schema({"dst": _I64, "s": _I64}), batch_format="pyarrow")
        )
        j2 = compact_for_join(verts, P).join(
            compact_for_join(sums, P),
            join_type="left_outer",
            num_partitions=P,
            on=("v",),
            right_on=("dst",),
        )

        def update(t: pa.Table) -> pa.Table:
            if "v" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "x": pa.array([], _I64)})
            s = t.column("s") if "s" in t.column_names else pa.nulls(len(t), _I64)
            s = pc.fill_null(s.cast(_I64) if s.type != _I64 else s, 0)
            x = s.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(x) and int(x.max()) > (1 << 60):
                raise OverflowError(
                    "eigencentrality path counts near int64 range — "
                    "use fewer iters or a normalized variant"
                )
            return pa.table({"v": t.column("v"), "x": pa.array(x)})

        ranks = j2.map_batches(update, batch_format="pyarrow").materialize()

    total = ranks.map_batches(
        lambda t: pa.table({"s": pa.array([int(t.column("x").to_numpy(zero_copy_only=False).sum())], _I64)})
        if "x" in t.column_names
        else pa.table({"s": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).sum("s")
    if not total:
        raise ValueError("eigencentrality total mass is zero (empty or sink-only graph)")

    def fin(t: pa.Table) -> pa.Table:
        if "v" not in t.column_names:
            return pa.table({"vertex": pa.array([], _I64), "eig": pa.array([], _F64)})
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "vertex": t.column("v"),
                "eig": pa.array(np.round(x / float(total), 6), _F64),
            }
        )

    return ranks.map_batches(fin, batch_format="pyarrow")
