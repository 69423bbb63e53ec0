"""Relational demo pipelines over the driver's TPC-H-ish tables.

These exercise the generic engine surface the reference lacks
(SURVEY §2.5): grouped aggregation (incl. ROLLUP levels, pivot, std),
hash / broadcast / outer / semi / anti joins (Q3, Q5, left_anti),
sort/top-k and top-k per group, distinct and INTERSECT set ops, scalar
functions, tumbling/hopping/session windows, and parquet predicate
pushdown at the read — each with an exact DuckDB SQL oracle (see
__ray_entry__.oracle_sql). Column names match the SQL aliases so the
driver's value-hash compare lines up.

Float outputs are rounded (4dp) on BOTH sides: cross-engine float
summation differs in the last ulp, never at 1e-4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..config import RunConfig
from ..util import compact_for_join, distinct_i64_pairs, ensure_schema

_I64 = pa.int64()
_F64 = pa.float64()


def _read(sf_dir: str, table: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round4(arr: np.ndarray) -> np.ndarray:
    return np.round(arr, 4)


# ---------------------------------------------------------------- q1 pricing

def q1_pricing(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-style pricing summary (filter → partial agg per batch is
    implicit: Ray's groupby aggregates per-block then combines)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        cutoff = pa.scalar(np.datetime64("1998-09-02T00:00:00", "us"))
        keep = pc.less_equal(t.column("l_shipdate"), cutoff)
        t = t.filter(keep)
        disc_price = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": t.column("l_quantity"),
                "base": t.column("l_extendedprice"),
                "disc": disc_price,
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base", alias_name="sum_base_price"),
            Sum("disc", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        if "l_returnflag" not in t.column_names:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "sum_qty": pa.array([], _F64),
                    "sum_base_price": pa.array([], _F64),
                    "sum_disc_price": pa.array([], _F64),
                    "count_order": pa.array([], _I64),
                }
            )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": pa.array(_round4(t.column("sum_qty").to_numpy(zero_copy_only=False))),
                "sum_base_price": pa.array(
                    _round4(t.column("sum_base_price").to_numpy(zero_copy_only=False))
                ),
                "sum_disc_price": pa.array(
                    _round4(t.column("sum_disc_price").to_numpy(zero_copy_only=False))
                ),
                "count_order": t.column("count_order"),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------- q3 join+topk

def _pack_order_dates_impl(*blocks: pa.Table):
    """(sorted orderkeys, parallel epoch-us dates) built remotely from
    the filtered-order dataset's block refs — the small-side-broadcast
    shape (triangles._pack_degree_lookup): the driver holds only the
    ObjectRef."""
    blocks = [b for b in blocks if "o_orderkey" in b.column_names and len(b) > 0]
    if not blocks:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    keys = np.concatenate([b.column("o_orderkey").to_numpy(zero_copy_only=False) for b in blocks])
    dates = np.concatenate([b.column("o_orderdate").to_numpy(zero_copy_only=False) for b in blocks])
    order = np.argsort(keys)
    return keys[order], dates[order]


_pack_order_dates = ray.remote(_pack_order_dates_impl)  # `import ray.data` binds `ray`


def q3_top_orders(
    sf_dir: str,
    segment: str = "BUILDING",
    k: int = 10,
    broadcast_threshold: int = 5_000_000,
) -> "ray.data.Dataset":
    """customer ⋈ orders ⋈ lineitem: top-k orders by revenue for one
    market segment.

    The dimension side (segment customers ⋈ orders) is one hash join;
    the FACT side is hybrid: when the filtered order set is small
    (< ``broadcast_threshold`` rows) its (orderkey → orderdate) map is
    packed sorted in a remote task and broadcast — the lineitem scan
    does a per-batch searchsorted lookup, no fact shuffle at all —
    else the original hash join runs (one segment of one TPC-H-scale
    orders table can outgrow any single worker). Then one groupby +
    deterministic sort/limit (revenue desc, orderkey asc)."""
    P = 8
    from ..util import pack_sorted_keys, semi_join_filter

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), segment)).select(["c_custkey"]),
        batch_format="pyarrow",
    ).materialize()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def _co(t: pa.Table) -> pa.Table:
        # o_orderdate carried as int64 epoch-us (Min aggregator + joins are
        # int-safe); restored to timestamp in the final projection
        if "o_orderkey" not in t.column_names:
            return pa.table({"o_orderkey": pa.array([], _I64), "o_orderdate": pa.array([], _I64)})
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"), "o_orderdate": t.column("o_orderdate").cast(_I64)}
        )

    if cust.count() <= broadcast_threshold:
        # dimension semi-filter: one-segment customer keys packed sorted in
        # a remote task, orders filtered per batch — no dimension shuffle
        cust_ref = pack_sorted_keys(cust, "c_custkey")
        co = semi_join_filter(orders, "o_custkey", cust_ref)
    else:
        co = compact_for_join(orders, P).join(
            compact_for_join(cust, P),
            join_type="inner", num_partitions=P, on=("o_custkey",), right_on=("c_custkey",),
        )

    co_mat = co.map_batches(_co, batch_format="pyarrow").materialize()

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev": pc.multiply(
                    t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
                ),
            }
        ),
        batch_format="pyarrow",
    )

    if co_mat.count() <= broadcast_threshold:
        pack_ref = _pack_order_dates.remote(*co_mat.to_arrow_refs())

        def lookup(t: pa.Table) -> pa.Table:
            if "l_orderkey" not in t.column_names or len(t) == 0:
                return pa.table(
                    {"o_orderkey": pa.array([], _I64), "o_orderdate": pa.array([], _I64), "rev": pa.array([], _F64)}
                )
            import ray

            keys, dates = ray.get(pack_ref)
            kk = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(keys, kk)
            idx_c = np.clip(idx, 0, max(len(keys) - 1, 0))
            hit = (keys[idx_c] == kk) if len(keys) else np.zeros(len(kk), dtype=bool)
            return pa.table(
                {
                    "o_orderkey": pa.array(kk[hit]),
                    "o_orderdate": pa.array(dates[idx_c[hit]]),
                    "rev": t.column("rev").filter(pa.array(hit)),
                }
            )

        matched = li.map_batches(lookup, batch_format="pyarrow")
    else:
        j = compact_for_join(li, P).join(
            compact_for_join(co_mat, P),
            join_type="inner", num_partitions=P, on=("l_orderkey",), right_on=("o_orderkey",),
        )

        def _j(t: pa.Table) -> pa.Table:
            if "l_orderkey" not in t.column_names:
                return pa.table(
                    {"o_orderkey": pa.array([], _I64), "o_orderdate": pa.array([], _I64), "rev": pa.array([], _F64)}
                )
            return pa.table(
                {"o_orderkey": t.column("l_orderkey"), "o_orderdate": t.column("o_orderdate"), "rev": t.column("rev")}
            )

        matched = j.map_batches(_j, batch_format="pyarrow")

    agg = (
        matched
        .groupby("o_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"), Min("o_orderdate", alias_name="o_orderdate"))
    )

    def fin(t: pa.Table) -> pa.Table:
        if "o_orderkey" not in t.column_names:
            return pa.table(
                {"o_orderkey": pa.array([], _I64), "revenue": pa.array([], _F64), "o_orderdate": pa.array([], pa.timestamp("us"))}
            )
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "revenue": pa.array(_round4(t.column("revenue").to_numpy(zero_copy_only=False))),
                "o_orderdate": t.column("o_orderdate").cast(pa.timestamp("us")),
            }
        )

    # partial-top-k merge instead of a full-sort AllToAll (util.topk_rows)
    from ..util import topk_rows

    return topk_rows(
        agg.map_batches(fin, batch_format="pyarrow"),
        [("revenue", True), ("o_orderkey", False)],
        k,
    )


def customer_urgent_counts(sf_dir: str, num_partitions: int = 8) -> "ray.data.Dataset":
    """LEFT OUTER join: every customer with their count of URGENT
    orders, zero when none (the outer-join surface; inner/semi/anti are
    gated elsewhere). The counting side is pre-aggregated to one row
    per custkey (count BSP) BEFORE the join, so the shuffle moves at
    most |customer| rows per side."""
    from ..util import count_i64_keys

    urgent = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table(
            {"o_custkey": t.column("o_custkey").filter(pc.equal(t.column("o_orderpriority"), "1-URGENT"))}
        ),
        batch_format="pyarrow",
    )
    counts = count_i64_keys(urgent, "o_custkey", count_col="n_urgent")
    cust = _read(sf_dir, "customer", ["c_custkey"])
    j = compact_for_join(cust, num_partitions).join(
        compact_for_join(counts, num_partitions),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if "c_custkey" not in t.column_names:
            return pa.table({"c_custkey": pa.array([], _I64), "n_urgent": pa.array([], _I64)})
        n = t.column("n_urgent") if "n_urgent" in t.column_names else pa.nulls(len(t), _I64)
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "n_urgent": pc.fill_null(n.cast(_I64) if n.type != _I64 else n, 0),
            }
        )

    return j.map_batches(fin, batch_format="pyarrow")


def _money_cents(t: pa.Table) -> pa.Table:
    """Project (priority, status, o_totalprice) → exact int64 cents.
    o_totalprice is a 2-decimal money value stored as float64, so
    x*100 is within ~1e-9 of an integer and rint is unambiguous."""
    return pa.table(
        {
            "o_orderpriority": t.column("o_orderpriority"),
            "o_orderstatus": t.column("o_orderstatus"),
            "cents": pa.array(
                np.rint(
                    t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64)
            ),
        }
    )


def _cents_to_revenue(t: pa.Table) -> pa.Table:
    """Finalize grouped cents → revenue float64 (cents/100.0 — exact
    division of an exact integer; identical bytes vs the SQL oracle's
    sum(CAST(x*100 AS BIGINT))/100.0)."""
    if "o_orderpriority" not in t.column_names:
        return pa.table(
            {
                "o_orderpriority": pa.array([], pa.string()),
                "o_orderstatus": pa.array([], pa.string()),
                "n_orders": pa.array([], _I64),
                "revenue": pa.array([], _F64),
            }
        )
    return pa.table(
        {
            "o_orderpriority": t.column("o_orderpriority"),
            "o_orderstatus": t.column("o_orderstatus"),
            "n_orders": t.column("n_orders").cast(_I64),
            "revenue": pa.array(
                t.column("cents").to_numpy(zero_copy_only=False).astype(np.float64) / 100.0
            ),
        }
    )


def orders_rollup(sf_dir: str) -> "ray.data.Dataset":
    """ROLLUP-style aggregation: order counts + revenue at three
    grouping levels — (priority, status), (priority), and grand total —
    unioned into one result with 'ALL' sentinels (the hash-compare-safe
    stand-in for SQL ROLLUP's NULLs; source columns are never null).

    Scale shape: the finest level is ONE grouped aggregate over the
    fact table; the two coarser levels re-aggregate the (tiny) finest
    result — never a second scan of the input.

    Money is summed as EXACT integer cents: at sf0.1 the grand total is
    ~3.75e10, where float64 summation error exceeds the 4th decimal, so
    a float Sum rounds to different cents than DuckDB's (r5 HASHDIFF).
    int64 cents are exact to 2^53/100 dollars and divide back to
    identical float64 bytes on both engines."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
    fine = (
        ds.map_batches(_money_cents, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="cents"))
        .map_batches(
            ensure_schema(
                {
                    "o_orderpriority": pa.string(),
                    "o_orderstatus": pa.string(),
                    "n_orders": _I64,
                    "cents": _I64,
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # reused by both coarser levels
    )

    # coarser levels re-aggregate the TINY finest result (at most
    # |priorities|×|statuses| rows): gather it once and sum with
    # pandas — two extra AllToAll groupbys for 15 rows would cost more
    # in operator startup than the whole query
    fdf = fine.to_pandas()
    mid = (
        fdf.groupby("o_orderpriority", as_index=False)[["n_orders", "cents"]]
        .sum()
        .assign(o_orderstatus="ALL")
    )
    top = pd.DataFrame(
        {
            "o_orderpriority": ["ALL"],
            "o_orderstatus": ["ALL"],
            "n_orders": [fdf["n_orders"].sum()],
            "cents": [fdf["cents"].sum()],
        }
    )
    coarse = pa.table(
        {
            "o_orderpriority": pa.array(
                list(mid["o_orderpriority"]) + list(top["o_orderpriority"]), pa.string()
            ),
            "o_orderstatus": pa.array(
                list(mid["o_orderstatus"]) + list(top["o_orderstatus"]), pa.string()
            ),
            "n_orders": pa.array(
                np.concatenate([mid["n_orders"].to_numpy(), top["n_orders"].to_numpy()]).astype(np.int64)
            ),
            "cents": pa.array(
                np.concatenate([mid["cents"].to_numpy(), top["cents"].to_numpy()]).astype(np.int64)
            ),
        }
    )

    return fine.union(ray.data.from_arrow(coarse)).map_batches(
        _cents_to_revenue, batch_format="pyarrow"
    )


def orders_cube(sf_dir: str) -> "ray.data.Dataset":
    """CUBE-style aggregation: all four grouping sets of
    (priority, status) — (p,s), (p), (s), () — with 'ALL' sentinels
    (same hash-safe stand-in as orders_rollup).

    Scale shape identical to ROLLUP's: ONE grouped aggregate over the
    fact table at the finest level; every coarser grouping set
    re-aggregates that tiny result on the driver (|p|×|s| rows) — the
    input is scanned exactly once however many grouping sets CUBE
    expands to. Money is exact int64 cents end-to-end (see
    orders_rollup's docstring for why float sums can't hash-match at
    this magnitude)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
    fine = (
        ds.map_batches(_money_cents, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="cents"))
        .map_batches(
            ensure_schema(
                {
                    "o_orderpriority": pa.string(),
                    "o_orderstatus": pa.string(),
                    "n_orders": _I64,
                    "cents": _I64,
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    fdf = fine.to_pandas()
    levels = [fdf]
    for keep in (["o_orderpriority"], ["o_orderstatus"], []):
        agg = (
            fdf.groupby(keep, as_index=False)[["n_orders", "cents"]].sum()
            if keep
            else pd.DataFrame(
                {"n_orders": [fdf["n_orders"].sum()], "cents": [fdf["cents"].sum()]}
            )
        )
        for c in ("o_orderpriority", "o_orderstatus"):
            if c not in keep:
                agg[c] = "ALL"
        levels.append(agg)
    out = pd.concat(levels, ignore_index=True)
    return ray.data.from_arrow(
        _cents_to_revenue(
            pa.table(
                {
                    "o_orderpriority": pa.array(list(out["o_orderpriority"]), pa.string()),
                    "o_orderstatus": pa.array(list(out["o_orderstatus"]), pa.string()),
                    "n_orders": pa.array(out["n_orders"].to_numpy().astype(np.int64)),
                    "cents": pa.array(out["cents"].to_numpy().astype(np.int64)),
                }
            )
        )
    )


def parts_in_both_years(sf_dir: str, y1: int = 1996, y2: int = 1997) -> "ray.data.Dataset":
    """INTERSECT: part keys shipped in BOTH years — two filtered
    distinct key sets (count BSP) intersected by a vectorized
    searchsorted against the broadcast SMALLER side (set ops without an
    AllToAll; INTERSECT output is bounded by the smaller input).

    The broadcast side is chosen by the (free, post-materialize) row
    counts and packed in a REMOTE task — no driver gather. When year 1
    is smaller, its keys first prune year 2 to the intersection key set
    (≤ the smaller side) which then filters year 1's counted rows, so
    every broadcast is bounded by min(|y1|, |y2|)."""
    import ray

    from ..util import count_i64_keys, pack_sorted_keys, semi_join_filter

    import pyarrow.dataset as pads

    def year_keys(year: int) -> "ray.data.Dataset":
        lo = np.datetime64(f"{year}-01-01T00:00:00", "us")
        hi = np.datetime64(f"{year + 1}-01-01T00:00:00", "us")
        # the date window is pushed into the scan (exact row-level
        # filtering by the pyarrow fragment reader, and row groups
        # whose stats miss the window are skipped entirely)
        pred = (pads.field("l_shipdate") >= pa.scalar(lo)) & (
            pads.field("l_shipdate") < pa.scalar(hi)
        )
        ds = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_shipdate"], filter=pred
        ).map_batches(
            lambda t: pa.table({"l_partkey": t.column("l_partkey")}), batch_format="pyarrow"
        )
        return count_i64_keys(ds, "l_partkey")

    a = year_keys(y1).materialize()
    b = year_keys(y2).materialize()
    if b.count() <= a.count():
        out = semi_join_filter(a, "l_partkey", pack_sorted_keys(b, "l_partkey"), keep=True)
    else:
        inter = semi_join_filter(
            b.select_columns(["l_partkey"]),
            "l_partkey",
            pack_sorted_keys(a, "l_partkey"),
            keep=True,
        )
        out = semi_join_filter(a, "l_partkey", pack_sorted_keys(inter, "l_partkey"), keep=True)
    return out.map_batches(
        ensure_schema({"l_partkey": _I64, "cnt": _I64}), batch_format="pyarrow"
    )


def parts_except_years(sf_dir: str, y1: int = 1996, y2: int = 1997) -> "ray.data.Dataset":
    """EXCEPT: part keys shipped in year ``y1`` but NOT in ``y2`` —
    completes the set-op surface (union/distinct/INTERSECT elsewhere,
    EXCEPT here). Same no-AllToAll shape as ``parts_in_both_years``:
    two filtered distinct key sets via the count BSP, then the y2 key
    set is packed in a REMOTE task and anti-filtered against y1 inside
    map_batches (the broadcast is the EXCLUDED side; at web scale swap
    in the Bloom prefilter + exact anti join when |y2| outgrows one
    node's memory — the documented trade, as in semi_join_filter)."""
    import ray

    from ..util import count_i64_keys, pack_sorted_keys, semi_join_filter

    import pyarrow.dataset as pads

    def year_keys(year: int) -> "ray.data.Dataset":
        lo = np.datetime64(f"{year}-01-01T00:00:00", "us")
        hi = np.datetime64(f"{year + 1}-01-01T00:00:00", "us")
        pred = (pads.field("l_shipdate") >= pa.scalar(lo)) & (
            pads.field("l_shipdate") < pa.scalar(hi)
        )
        ds = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_shipdate"], filter=pred
        ).map_batches(
            lambda t: pa.table({"l_partkey": t.column("l_partkey")}), batch_format="pyarrow"
        )
        return count_i64_keys(ds, "l_partkey")

    a = year_keys(y1).materialize()
    b = year_keys(y2).materialize()
    out = semi_join_filter(a, "l_partkey", pack_sorted_keys(b, "l_partkey"), keep=False)
    return out.map_batches(
        ensure_schema({"l_partkey": _I64, "cnt": _I64}), batch_format="pyarrow"
    )


def part_year_volumes(
    sf_dir: str, y1: int = 1995, y2: int = 1996, num_partitions: int = 8
) -> "ray.data.Dataset":
    """FULL OUTER join: per-part shipped-quantity sums for two ship
    years side by side, 0-filled where a part shipped in only one year
    (completes the join-type surface: inner/left/semi/anti elsewhere,
    full outer here). Each side pre-aggregates per batch (pandas
    combiner) so the grouped shuffle moves ≤ |parts| × blocks rows;
    the date window is pushed into both scans."""
    import pyarrow.dataset as pads

    from ..util import compact_for_join

    P = num_partitions

    def year_sum(year: int, key: str, out: str) -> "ray.data.Dataset":
        lo = np.datetime64(f"{year}-01-01T00:00:00", "us")
        hi = np.datetime64(f"{year + 1}-01-01T00:00:00", "us")
        pred = (pads.field("l_shipdate") >= pa.scalar(lo)) & (
            pads.field("l_shipdate") < pa.scalar(hi)
        )
        ds = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_shipdate"],
            filter=pred,
        )

        def partial(t: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    key: t.column("l_partkey").to_numpy(zero_copy_only=False),
                    "q": t.column("l_quantity").to_numpy(zero_copy_only=False),
                }
            )
            g = df.groupby(key, sort=False)["q"].sum().reset_index()
            return pa.table({key: pa.array(g[key].to_numpy(dtype=np.int64)), "q": pa.array(g["q"].to_numpy(dtype=np.float64))})

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .aggregate(Sum("q", alias_name=out))
            .map_batches(ensure_schema({key: _I64, out: _F64}), batch_format="pyarrow")
        )

    a = year_sum(y1, "l_partkey", "qty_a")
    b = year_sum(y2, "pk2", "qty_b")
    j = compact_for_join(a, P).join(
        compact_for_join(b, P),
        join_type="full_outer", num_partitions=P, on=("l_partkey",), right_on=("pk2",),
    )
    c1, c2 = f"qty_{y1}", f"qty_{y2}"

    def fin(t: pa.Table) -> pa.Table:
        if len(t) == 0 or ("l_partkey" not in t.column_names and "pk2" not in t.column_names):
            return pa.table(
                {"l_partkey": pa.array([], _I64), c1: pa.array([], _F64), c2: pa.array([], _F64)}
            )
        n = len(t)
        lk = t.column("l_partkey") if "l_partkey" in t.column_names else pa.nulls(n, _I64)
        rk = t.column("pk2") if "pk2" in t.column_names else pa.nulls(n, _I64)
        qa = t.column("qty_a") if "qty_a" in t.column_names else pa.nulls(n, _F64)
        qb = t.column("qty_b") if "qty_b" in t.column_names else pa.nulls(n, _F64)
        return pa.table(
            {
                "l_partkey": pc.coalesce(lk.cast(_I64), rk.cast(_I64)),
                c1: pa.array(
                    np.round(pc.fill_null(qa.cast(_F64), 0.0).to_numpy(zero_copy_only=False), 4)
                ),
                c2: pa.array(
                    np.round(pc.fill_null(qb.cast(_F64), 0.0).to_numpy(zero_copy_only=False), 4)
                ),
            }
        )

    return j.map_batches(fin, batch_format="pyarrow")


def user_type_pivot(sf_dir: str) -> "ray.data.Dataset":
    """Pivot (wide conditional aggregation): events per user with one
    count column per event_type. Per-batch combiner: each batch
    crosstabs locally (pandas), then ONE small grouped sum merges —
    the shuffle moves at most |users| × blocks narrow rows."""
    types = ["click", "error", "purchase", "signup", "view"]
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def crosstab(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t.column("user_id").to_numpy(zero_copy_only=False),
                "event_type": t.column("event_type").to_numpy(zero_copy_only=False),
            }
        )
        w = pd.crosstab(df["user_id"], df["event_type"])
        w = w.reindex(columns=types, fill_value=0).reset_index()
        return pa.table(
            {"user_id": pa.array(w["user_id"].to_numpy(dtype=np.int64))}
            | {f"n_{c}": pa.array(w[c].to_numpy(dtype=np.int64)) for c in types}
        )

    agg = ds.map_batches(crosstab, batch_format="pyarrow").groupby("user_id").aggregate(
        *[Sum(f"n_{c}", alias_name=f"n_{c}") for c in types]
    )
    return agg.map_batches(
        ensure_schema({"user_id": _I64} | {f"n_{c}": _I64 for c in types}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------- q5 multi-join

def q5_revenue_by_nation(
    sf_dir: str, region: str = "ASIA", year: int = 1996, num_partitions: int = 8
) -> "ray.data.Dataset":
    """TPC-H Q5-style 6-table query: revenue per nation for one region
    and order year, where the supplier is in the customer's nation.

    Join plan for scale: region/nation/supplier are DIMENSION tables —
    packed by remote tasks and broadcast via ray.put, applied as
    vectorized lookups inside map_batches (no shuffle). Only the two
    FACT joins shuffle: orders⋈customer-filtered (both pruned first)
    and lineitem⋈that. Aggregation is by int nationkey; names are
    attached to the final handful of rows.

    Broadcast bound: supplier is ~1% of lineitem in TPC-H, i.e. ~16 B
    × |supplier| resident per worker; above a few GB swap the supplier
    lookup for a third hash join (same compact_for_join pattern as the
    other two) — the plan is otherwise unchanged."""
    import ray

    P = num_partitions

    # region -> allowed nation keys + names (two tiny reads, one remote pack)
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])

    @ray.remote
    def _pack_nations(reg_blocks, nat_blocks, region_name):
        # block refs arrive nested in lists — resolve them in-task
        rt = pa.concat_tables([b for b in ray.get(list(reg_blocks)) if len(b)])
        nt = pa.concat_tables([b for b in ray.get(list(nat_blocks)) if len(b)])
        rkeys = rt.column("r_regionkey").filter(
            pc.equal(rt.column("r_name"), region_name)
        ).to_numpy(zero_copy_only=False)
        keep = pc.is_in(nt.column("n_regionkey").cast(_I64), value_set=pa.array(rkeys, _I64))
        nt = nt.filter(keep)
        nkeys = nt.column("n_nationkey").cast(_I64).to_numpy(zero_copy_only=False)
        names = nt.column("n_name").to_numpy(zero_copy_only=False)
        order = np.argsort(nkeys)
        return nkeys[order], names[order]

    nations_ref = _pack_nations.remote(
        reg.materialize().to_arrow_refs(), nat.materialize().to_arrow_refs(), region
    )

    # supplier -> nationkey map (dimension broadcast, sorted for searchsorted)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    @ray.remote
    def _pack_supp(*blocks):
        t = pa.concat_tables([b for b in blocks if len(b)])
        k = t.column("s_suppkey").cast(_I64).to_numpy(zero_copy_only=False)
        v = t.column("s_nationkey").cast(_I64).to_numpy(zero_copy_only=False)
        order = np.argsort(k)
        return k[order], v[order]

    supp_ref = _pack_supp.remote(*supp.materialize().to_arrow_refs())

    # customer pruned to the region's nations (broadcast filter, no shuffle)
    def cust_prep(t: pa.Table) -> pa.Table:
        nkeys, _ = ray.get(nations_ref)
        keep = pc.is_in(t.column("c_nationkey").cast(_I64), value_set=pa.array(nkeys, _I64))
        t = t.filter(keep)
        return pa.table(
            {"c_custkey": t.column("c_custkey"), "c_nationkey": t.column("c_nationkey").cast(_I64)}
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_prep, batch_format="pyarrow"
    )

    lo = np.datetime64(f"{year}-01-01T00:00:00", "us")
    hi = np.datetime64(f"{year + 1}-01-01T00:00:00", "us")

    def orders_prep(t: pa.Table) -> pa.Table:
        # the scan filter is EXACT row-level filtering (pyarrow
        # fragment reader), not just row-group pruning — only the
        # projection remains here
        return pa.table({"o_orderkey": t.column("o_orderkey"), "o_custkey": t.column("o_custkey")})

    import pyarrow.dataset as pads

    # predicate pushed into the parquet read: exact row filtering at
    # the scan, and row groups whose o_orderdate stats miss the window
    # never leave storage
    date_pred = (pads.field("o_orderdate") >= pa.scalar(lo)) & (
        pads.field("o_orderdate") < pa.scalar(hi)
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=date_pred,
    ).map_batches(orders_prep, batch_format="pyarrow")

    co = compact_for_join(orders, P).join(
        compact_for_join(cust, P), join_type="inner", num_partitions=P,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def co_prep(t: pa.Table) -> pa.Table:
        if "o_orderkey" not in t.column_names:
            return pa.table({"o_orderkey": pa.array([], _I64), "c_nationkey": pa.array([], _I64)})
        return pa.table({"o_orderkey": t.column("o_orderkey"), "c_nationkey": t.column("c_nationkey")})

    co = compact_for_join(co.map_batches(co_prep, batch_format="pyarrow"), P)

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey").cast(_I64),
                "rev": pc.multiply(
                    t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
                ),
            }
        ),
        batch_format="pyarrow",
    )
    j = compact_for_join(li, P).join(
        co, join_type="inner", num_partitions=P, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def local_filter(t: pa.Table) -> pa.Table:
        # supplier-nation == customer-nation: dimension lookup, no join
        if "l_suppkey" not in t.column_names:
            return pa.table({"nk": pa.array([], _I64), "rev": pa.array([], _F64)})
        sk, sn = ray.get(supp_ref)
        if len(sk) == 0 or len(t) == 0:
            return pa.table({"nk": pa.array([], _I64), "rev": pa.array([], _F64)})
        supp_keys = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(sk, supp_keys), 0, len(sk) - 1)
        s_nat = np.where(sk[pos] == supp_keys, sn[pos], -1)
        c_nat = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        m = s_nat == c_nat
        return pa.table(
            {
                "nk": pa.array(c_nat[m]),
                "rev": pa.array(t.column("rev").to_numpy(zero_copy_only=False)[m]),
            }
        )

    agg = (
        j.map_batches(local_filter, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("rev", alias_name="revenue"))
    )

    def fin(t: pa.Table) -> pa.Table:
        if "nk" not in t.column_names:
            return pa.table({"n_name": pa.array([], pa.string()), "revenue": pa.array([], _F64)})
        nkeys, names = ray.get(nations_ref)
        if len(nkeys) == 0 or len(t) == 0:
            return pa.table({"n_name": pa.array([], pa.string()), "revenue": pa.array([], _F64)})
        nk = t.column("nk").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(nkeys, nk), 0, len(nkeys) - 1)
        return pa.table(
            {
                "n_name": pa.array(names[pos]),
                "revenue": pa.array(_round4(t.column("revenue").to_numpy(zero_copy_only=False))),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------- windows

def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour windows per event_type: count + sum(value).

    Batch engine treatment of the stream table: window key computed
    per batch (floor to hour), then one grouped aggregate — the SQL
    ``date_trunc('hour', ts)`` equivalent (guide: batch windows via
    groupby on the bucketed key)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": pc.floor_temporal(t.column("ts"), unit="hour"),
                "value": t.column("value"),
            }
        )

    agg = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def fin(t: pa.Table) -> pa.Table:
        if "event_type" not in t.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], _I64),
                    "sum_value": pa.array([], _F64),
                }
            )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": t.column("window_start"),
                "n_events": t.column("n_events"),
                "sum_value": pa.array(_round4(t.column("sum_value").to_numpy(zero_copy_only=False))),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")



def _derived_buckets(ds, num_buckets, rows_per_bucket: int = 4_000_000) -> int:
    """Size-derived bucket count for the ordered-window family
    (VERDICT r4 #5). Each hash bucket materializes as ONE pandas group
    per task, so a fixed default of 32 means ~3% of the events table
    per task no matter how big it grows. Default (num_buckets=None):
    ceil(rows / 4M) buckets floored at 32, bounding per-bucket memory
    at ~4M rows (a few hundred MB for these narrow schemas). The row
    count comes from parquet metadata on fresh reads — no data scan.
    Pass an explicit int to override (tests pin odd values)."""
    if num_buckets is not None:
        return num_buckets
    return max(32, -(-ds.count() // rows_per_bucket))

def events_sessions(
    sf_dir: str, gap_minutes: int = 30, num_buckets: "int | None" = None
) -> "ray.data.Dataset":
    """Session windows per user: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``. Output:
    (user_id, session_start, n_events).

    Scale shape: users are HASH-BUCKETED (temporal.py's pattern) so the
    shuffle produces ~``num_buckets`` coarse groups — not one pandas
    group per user, which is catastrophic on this Ray version at 10⁸
    users. Each bucket sorts by (user_id, ts) once and splits sessions
    with a vectorized segmented diff (a session break at a user change
    or a gap over the threshold) — no per-user loop anywhere. Raise
    ``num_buckets`` with data size; each bucket is O(rows/num_buckets)."""
    from .temporal import _bucket_of

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    num_buckets = _derived_buckets(ds, num_buckets)
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column("user_id").cast(_I64).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(keys, num_buckets)),
                "user_id": pa.array(keys),
                "ts": t.column("ts"),
            }
        )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy()
        new_session = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_session[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap)
        starts = np.nonzero(new_session)[0]
        counts = np.diff(np.append(starts, len(ts)))
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "session_start": ts[starts],
                "n_events": counts.astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas")
        .map_batches(
            ensure_schema(
                {"user_id": _I64, "session_start": pa.timestamp("us"), "n_events": _I64}
            ),
            batch_format="pyarrow",
        )
    )


def events_lag_cumsum(sf_dir: str, num_buckets: "int | None" = None) -> "ray.data.Dataset":
    """Ordered per-user window functions in one pass: sequence number
    (row_number), gap to the previous event in µs (lag; -1 on each
    user's first event), and the running sum of ``value`` (4dp).
    Order within a user is (ts, event_id) — deterministic.

    Scale shape: same hash-bucketed plan as ``events_sessions`` —
    ~``num_buckets`` coarse pandas groups, one (user_id, ts) sort per
    bucket, then segmented vectorized kernels: run boundaries for
    row_number (cumcount), a shifted diff for lag, and a cumsum with
    the per-run offset subtracted for the running sum. No per-user
    groups, no Python loop over rows."""
    from .temporal import _bucket_of

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    num_buckets = _derived_buckets(ds, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column("user_id").cast(_I64).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(keys, num_buckets)),
                "event_id": t.column("event_id"),
                "user_id": pa.array(keys),
                "ts": t.column("ts"),
                "value": t.column("value"),
            }
        )

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        val = g["value"].to_numpy(dtype=np.float64)
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        if n > 1:
            new_user[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(new_user)[0]
        run_id = np.cumsum(new_user) - 1
        # row_number: position minus the run's start position
        seq = np.arange(n, dtype=np.int64) - starts[run_id] + 1
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        if n > 1:
            gap[1:] = ts_us[1:] - ts_us[:-1]
        gap[new_user] = -1
        # fresh sequential accumulator per user (pandas segmented
        # cumsum) — float-order-identical to SQL's running window sum,
        # unlike a global cumsum with the run offset subtracted
        cum = pd.Series(val).groupby(run_id).cumsum().to_numpy()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(dtype=np.int64),
                "user_id": uid,
                "seq": seq,
                "gap_us": gap,
                "cum_value": np.round(cum, 4),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(windows, batch_format="pandas")
        .map_batches(
            ensure_schema(
                {
                    "event_id": _I64,
                    "user_id": _I64,
                    "seq": _I64,
                    "gap_us": _I64,
                    "cum_value": _F64,
                }
            ),
            batch_format="pyarrow",
        )
    )


def events_sliding(sf_dir: str, size_hours: int = 2, slide_hours: int = 1) -> "ray.data.Dataset":
    """Hopping (sliding) windows per event_type: ``size_hours``-wide
    windows advancing every ``slide_hours``. Each event lands in
    size/slide windows — the replication happens inside map_batches
    (vectorized np.repeat), then ONE grouped aggregate; no flat_map
    row loop and no second shuffle."""
    if size_hours % slide_hours != 0:
        raise ValueError("size_hours must be a multiple of slide_hours")
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    n_copies = size_hours // slide_hours
    slide_us = slide_hours * 3_600_000_000

    def assign(t: pa.Table) -> pa.Table:
        # window starts live on the SLIDE grid: floor ts to a slide
        # multiple (floor-to-hour alone is wrong for slide_hours > 1)
        raw = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (raw // slide_us) * slide_us
        offs = np.arange(n_copies, dtype=np.int64) * slide_us
        starts = np.repeat(base, n_copies) - np.tile(offs, len(base))
        return pa.table(
            {
                "event_type": pa.array(
                    np.repeat(t.column("event_type").to_numpy(zero_copy_only=False), n_copies)
                ),
                "window_start": pa.array(starts).cast(pa.timestamp("us")),
                "value": pa.array(
                    np.repeat(t.column("value").to_numpy(zero_copy_only=False), n_copies)
                ),
            }
        )

    agg = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def fin(t: pa.Table) -> pa.Table:
        if "event_type" not in t.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], _I64),
                    "sum_value": pa.array([], _F64),
                }
            )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": t.column("window_start"),
                "n_events": t.column("n_events"),
                "sum_value": pa.array(_round4(t.column("sum_value").to_numpy(zero_copy_only=False))),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def top_orders_per_segment(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Top-k orders by o_totalprice per market segment (window-function
    shape: row_number() <= k). Scale pattern: the small dimension side
    (customer → segment) is broadcast once via ray.put; each orders
    batch prunes to its LOCAL top-k per segment (combiner) so the final
    shuffle moves O(k × segments × blocks) rows, not the orders table.
    Ties broken by o_orderkey asc — deterministic on both sides.

    Broadcast bound: the custkey→segment map costs ~24 B/customer per
    worker; above a few GB replace the lookup with a hash join against
    the pre-pruned orders side (the partial top-k combiner is
    unchanged either way — it is the part that makes the final
    shuffle small)."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    @ray.remote
    def _pack(*blocks: pa.Table):
        blocks = [b for b in blocks if len(b)]
        keys = np.concatenate([b.column("c_custkey").to_numpy(zero_copy_only=False) for b in blocks])
        segs = np.concatenate(
            [b.column("c_mktsegment").to_numpy(zero_copy_only=False) for b in blocks]
        )
        order = np.argsort(keys)
        return keys[order], segs[order]

    seg_ref = _pack.remote(*cust.materialize().to_arrow_refs())
    kk = k

    def local_topk(t: pa.Table) -> pa.Table:
        keys, segs = ray.get(seg_ref)
        if len(keys) == 0 or len(t) == 0:
            return pa.table(
                {"c_mktsegment": pa.array([], pa.string()), "o_orderkey": pa.array([], _I64), "o_totalprice": pa.array([], _F64)}
            )
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        pos = np.clip(pos, 0, len(keys) - 1)
        ok = keys[pos] == ck
        df = pd.DataFrame(
            {
                "c_mktsegment": segs[pos][ok],
                "o_orderkey": t.column("o_orderkey").to_numpy(zero_copy_only=False)[ok],
                "o_totalprice": t.column("o_totalprice").to_numpy(zero_copy_only=False)[ok],
            }
        )
        pruned = (
            df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable")
            .groupby("c_mktsegment", sort=False)
            .head(kk)
        )
        return pa.table(
            {
                "c_mktsegment": pa.array(pruned["c_mktsegment"], pa.string()),
                "o_orderkey": pa.array(pruned["o_orderkey"], _I64),
                "o_totalprice": pa.array(pruned["o_totalprice"], _F64),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
        ).head(kk)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return (
        orders.map_batches(local_topk, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .map_groups(final_topk, batch_format="pandas")
        .map_batches(
            ensure_schema(
                {"c_mktsegment": pa.string(), "o_orderkey": _I64, "o_totalprice": _F64}
            ),
            batch_format="pyarrow",
        )
    )


def customers_without_orders(
    sf_dir: str, priority: str = "1-URGENT", num_partitions: int = 8
) -> "ray.data.Dataset":
    """Anti-join: customers that never placed a ``priority`` order —
    the SHUFFLE anti shape (Ray's native ``left_anti`` join): both
    sides hash-partition, nothing is ever gathered to the driver, so
    it holds at any key-set size. (The complementary BROADCAST shape —
    distinct keys → ``semi_join_filter`` — is what r_urgent_semi_join
    uses for its small filtered key set.) The orders side is reduced
    to distinct custkeys via the count BSP before the join."""
    from ..util import count_i64_keys

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table(
            {"o_custkey": t.column("o_custkey").filter(pc.equal(t.column("o_orderpriority"), priority))}
        ),
        batch_format="pyarrow",
    )
    distinct = count_i64_keys(orders, "o_custkey").map_batches(
        lambda t: pa.table({"o_custkey": t.column("o_custkey")})
        if "o_custkey" in t.column_names
        else pa.table({"o_custkey": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    j = compact_for_join(cust, num_partitions).join(
        compact_for_join(distinct, num_partitions),
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if "c_custkey" not in t.column_names:
            return pa.table({"c_custkey": pa.array([], _I64), "c_acctbal": pa.array([], _F64)})
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_acctbal": pa.array(_round4(t.column("c_acctbal").to_numpy(zero_copy_only=False))),
            }
        )

    return j.map_batches(fin, batch_format="pyarrow")


def _props_k_array(props) -> pa.Array:
    """Vectorized extraction of the int ``k`` field from the
    '{"k": int}' ``props`` JSON column — ONE RE2 ``extract_regex`` pass
    over the whole batch instead of a per-row ``json.loads`` Python
    loop. Missing / null / unparseable → 0 (parity with
    ``json.loads(p or "{}").get("k", 0)``)."""
    ext = pc.extract_regex(pc.fill_null(props, ""), r'"k"\s*:\s*(?P<k>-?\d+)')
    return pc.fill_null(pc.cast(pc.struct_field(ext, "k"), pa.int64()), 0)


def events_props_sum(sf_dir: str) -> "ray.data.Dataset":
    """JSON scalar extraction: parse ``props`` ('{"k": int}'), sum k per
    event_type — vectorized RE2 field extraction per batch
    (``_props_k_array``); the SQL oracle uses DuckDB's JSON functions.

    ``sum_k`` is emitted float64: DuckDB's sum(BIGINT) comes back as a
    float in pandas, and the driver's value hash is typed."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def parse(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t.column("event_type"), "k": _props_k_array(t.column("props"))}
        )

    return (
        ds.map_batches(parse, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
        .map_batches(
            ensure_schema({"event_type": pa.string(), "sum_k": _F64, "n": _I64}),
            batch_format="pyarrow",
        )
    )


def events_distinct_users(sf_dir: str) -> "ray.data.Dataset":
    """Distinct users per event_type: two-level groupby (exact distinct
    via (type,user) dedup then count — the scalable exact pattern)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    pairs = (
        ds.groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            ensure_schema({"event_type": pa.string(), "user_id": _I64}), batch_format="pyarrow"
        )
    )
    return (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .map_batches(
            ensure_schema({"event_type": pa.string(), "n_users": _I64}), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------- graph builders over testdata

# order-vertex namespace offset: l_orderkey and l_partkey share small-int
# key spaces; offsetting orders keeps the bipartite graph bipartite
ORDER_BASE = 10_000_000


def lineitem_edges(sf_dir: str) -> "ray.data.Dataset":
    """Distinct (src=l_orderkey+ORDER_BASE, dst=l_partkey) edges.

    Distinct via the per-shard BSP combine (``distinct_i64_pairs``) —
    both key spaces fit [0, 2^31) by construction."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    mapped = ds.map_batches(
        lambda t: pa.table(
            {
                "src": pc.add(t.column("l_orderkey").cast(_I64), ORDER_BASE),
                "dst": t.column("l_partkey").cast(_I64),
            }
        ),
        batch_format="pyarrow",
    )
    # src = l_orderkey + ORDER_BASE exceeds the pair-packer's [0, 2^31)
    # bound at TPC-H SF ≳ 350 — degrade to the hash-groupby distinct
    # (graphbuild.py's pattern) instead of raising
    try:
        from ray.exceptions import RayTaskError

        return distinct_i64_pairs(mapped, "src", "dst").materialize()
    except (RayTaskError, ValueError):
        return (
            mapped.groupby(["src", "dst"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["src", "dst"])
            .map_batches(ensure_schema({"src": _I64, "dst": _I64}), batch_format="pyarrow")
        )


def part_cooccurrence_edges(sf_dir: str, num_partitions: int = 8) -> "ray.data.Dataset":
    """Undirected part co-occurrence graph: distinct (a < b) pairs of
    parts appearing in the same order — a vectorized hash self-join on
    the order key (per-group python expansion is 150k calls at sf0.1;
    the join is two scans + one shuffle)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    left = compact_for_join(
        ds.map_batches(
            lambda t: pa.table({"k": t.column("l_orderkey"), "a": t.column("l_partkey")}),
            batch_format="pyarrow",
        ),
        num_partitions,
    )
    right = compact_for_join(
        ds.map_batches(
            lambda t: pa.table({"k2": t.column("l_orderkey"), "b": t.column("l_partkey")}),
            batch_format="pyarrow",
        ),
        num_partitions,
    )
    joined = left.join(
        right, join_type="inner", num_partitions=num_partitions, on=("k",), right_on=("k2",)
    )

    def keep(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names:
            return pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)})
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        m = a < b
        return pa.table({"a": pa.array(a[m]), "b": pa.array(b[m])})

    return distinct_i64_pairs(joined.map_batches(keep, batch_format="pyarrow"), "a", "b")


# region -> nation -> supplier tri-level graph with namespaced ids:
# region r: id = r_regionkey; nation n: id = 100 + n_nationkey;
# supplier s: id = 1000 + s_suppkey. Small enough for a recursive-CTE
# SQL oracle; components = regions.
REGION_BASE, NATION_BASE, SUPP_BASE = 0, 100, 1000


def org_edges(sf_dir: str) -> "ray.data.Dataset":
    nations = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).map_batches(
        lambda t: pa.table(
            {
                "src": pc.add(t.column("n_regionkey").cast(_I64), REGION_BASE),
                "dst": pc.add(t.column("n_nationkey").cast(_I64), NATION_BASE),
            }
        ),
        batch_format="pyarrow",
    )
    supps = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "src": pc.add(t.column("s_nationkey").cast(_I64), NATION_BASE),
                "dst": pc.add(t.column("s_suppkey").cast(_I64), SUPP_BASE),
            }
        ),
        batch_format="pyarrow",
    )
    return nations.union(supps)


def qty_price_corr(sf_dir: str) -> "ray.data.Dataset":
    """Per-group Pearson correlation corr(l_quantity, l_extendedprice)
    BY l_returnflag — the mergeable-moments pattern done numerically
    stably in two passes:

    pass 1: grouped Mean/Count (one narrow aggregate);
    pass 2: per-batch sums of products CENTERED on the pass-1 means
            (broadcast as a plain dict captured by the batch fn), plus
            first-order residual sums so the result is exact for ANY
            centering constant:
              Sxy = Σ(x-a)(y-b) - Sx·Sy/n,  Sxx = Σ(x-a)² - Sx²/n.

    Centering kills the catastrophic cancellation of the naive
    E[xy]-E[x]E[y] form (sums of raw products reach ~1e15 here), so the
    6dp rounding matches DuckDB's streaming co-moment corr() exactly.
    Partials are O(batches × groups) tiny rows — merged on the driver
    like every sketch in this engine."""
    from ray.data.aggregate import Mean

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
    means = {
        r["l_returnflag"]: (r["mx"], r["my"])
        for r in ds.groupby("l_returnflag")
        .aggregate(
            Mean("l_quantity", alias_name="mx"),
            Mean("l_extendedprice", alias_name="my"),
        )
        .take_all()
    }

    def partial(t: pa.Table) -> pa.Table:
        if "l_returnflag" not in t.column_names or len(t) == 0:
            return pa.table(
                {
                    "flag": pa.array([], pa.string()),
                    **{
                        c: pa.array([], _F64)
                        for c in ("sxx", "syy", "sxy", "sx", "sy")
                    },
                    "n": pa.array([], _I64),
                }
            )
        flags = t.column("l_returnflag").to_numpy(zero_copy_only=False)
        x = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column("l_extendedprice").to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(flags, return_inverse=True)
        a = np.array([means[f][0] for f in uniq])[inv]
        b = np.array([means[f][1] for f in uniq])[inv]
        cx, cy = x - a, y - b
        k = len(uniq)
        return pa.table(
            {
                "flag": pa.array(list(uniq), pa.string()),
                "sxx": pa.array(np.bincount(inv, cx * cx, k)),
                "syy": pa.array(np.bincount(inv, cy * cy, k)),
                "sxy": pa.array(np.bincount(inv, cx * cy, k)),
                "sx": pa.array(np.bincount(inv, cx, k)),
                "sy": pa.array(np.bincount(inv, cy, k)),
                "n": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("flag", sort=True).sum()
    sxx = agg["sxx"] - agg["sx"] ** 2 / agg["n"]
    syy = agg["syy"] - agg["sy"] ** 2 / agg["n"]
    sxy = agg["sxy"] - agg["sx"] * agg["sy"] / agg["n"]
    corr = (sxy / np.sqrt(sxx * syy)).round(6)
    out = pa.table(
        {
            "l_returnflag": pa.array(list(agg.index), pa.string()),
            "corr_qty_price": pa.array(corr.to_numpy(), _F64),
            "n": pa.array(agg["n"].to_numpy().astype(np.int64)),
        }
    )
    return ray.data.from_arrow(out)


def top_user_by_type(sf_dir: str) -> "ray.data.Dataset":
    """Argmax per group: for each event_type, the user with the most
    events (ties → min user_id). Scale shape: event_type is
    dict-encoded against the (tiny, enum-ish) distinct-type list, the
    (type, user) count runs as ONE packed-key count BSP
    (code·2^32 + user_id — no row-level two-column groupby), each
    reducer block emits its per-type leader, and the driver merges
    S × |types| candidate rows. Falls back to a plain groupby when ids
    exceed the packing bound."""
    from ..util import count_i64_keys

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    types = sorted(
        {
            r["event_type"]
            for r in ds.map_batches(
                lambda t: pa.table(
                    {"event_type": pc.unique(t.column("event_type"))}
                ),
                batch_format="pyarrow",
            ).take_all()
        }
    )
    def pack(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) and (u.min() < 0 or u.max() >= (1 << 32)):
            raise ValueError("user_id outside packing bound [0, 2^32)")
        # C-level dictionary encode against the fixed type list — no
        # per-row Python dict lookups in the hot path
        c = pd.Categorical(
            t.column("event_type").to_numpy(zero_copy_only=False), categories=types
        ).codes.astype(np.int64)
        return pa.table({"k": pa.array((c << 32) + u)})

    counts = count_i64_keys(ds.map_batches(pack, batch_format="pyarrow"), "k")

    def leaders(t: pa.Table) -> pa.Table:
        if "k" not in t.column_names or len(t) == 0:
            return pa.table(
                {
                    "c": pa.array([], _I64),
                    "user_id": pa.array([], _I64),
                    "n": pa.array([], _I64),
                }
            )
        k = t.column("k").to_numpy(zero_copy_only=False)
        n = t.column("cnt").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"c": k >> 32, "user_id": k & 0xFFFFFFFF, "n": n})
        df = df.sort_values(["n", "user_id"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.drop_duplicates("c"), preserve_index=False)

    cand = counts.map_batches(leaders, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["n", "user_id"], ascending=[False, True], kind="mergesort")
    best = cand.drop_duplicates("c").sort_values("c")
    out = pa.table(
        {
            "event_type": pa.array([types[int(c)] for c in best["c"]], pa.string()),
            "user_id": pa.array(best["user_id"].to_numpy().astype(np.int64)),
            "n": pa.array(best["n"].to_numpy().astype(np.int64)),
        }
    )
    return ray.data.from_arrow(out)


def urgent_revenue_bloom(sf_dir: str, bits_per_key: int = 14) -> "ray.data.Dataset":
    """Semi-join aggregate with a BLOOM-prefiltered shuffle: revenue of
    lineitems belonging to URGENT orders, by return flag.

    Scale story (the `semi_join_filter` docstring's "a Bloom filter
    swaps in for the exact set at larger key counts"): the urgent key
    side is scanned with predicate pushdown, a Bloom filter over its
    keys is BUILT IN A REMOTE TASK (driver holds only the ObjectRef)
    and broadcast to a map_batches prefilter that drops non-matching
    fact rows BEFORE the exact hash semi-join — so the all-to-all only
    moves rows that (almost certainly) survive. False positives are
    removed by the exact join; the result is exact, the bloom is purely
    shuffle-volume reduction."""
    import pyarrow.dataset as pads

    import ray

    from ..functions.sketches import BloomFilter, splitmix64

    keys_ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    ).map_batches(
        lambda t: pa.table({"o_orderkey": t.column("o_orderkey")}),
        batch_format="pyarrow",
    )
    key_blocks = keys_ds.materialize()
    n_keys = max(1, key_blocks.count())

    n_bits = n_keys * bits_per_key

    @ray.remote
    def bloom_block(b):
        bf = BloomFilter(n_bits=n_bits, k=7)
        v = b.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        bf.add_hashes(splitmix64(v.view(np.uint64)))
        return bf.bits

    @ray.remote
    def or_merge(*parts):
        out = parts[0].copy()
        for p in parts[1:]:
            np.bitwise_or(out, p, out=out)
        return out

    # parallel per-block builds, tree OR-merge (never serial over the
    # whole key side; the bitmap itself bounds at n_keys·bits/8 bytes —
    # beyond ~10^8 keys partition the join instead of growing the bloom)
    from ..util import tree_combine_refs

    partials = [bloom_block.remote(b) for b in key_blocks.to_arrow_refs()]
    partials = tree_combine_refs(partials, or_merge, 8)
    bits_ref = partials[0] if len(partials) == 1 else or_merge.remote(*partials)

    def prefilter(t: pa.Table) -> pa.Table:
        import ray as _ray

        bf = BloomFilter(n_bits=n_bits, k=7, bits=_ray.get(bits_ref))
        v = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(bf.contains_hashes(splitmix64(v.view(np.uint64)))))

    fact = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(prefilter, batch_format="pyarrow")

    P = RunConfig().num_partitions
    joined = compact_for_join(fact, P).join(
        compact_for_join(key_blocks, P),
        join_type="left_semi",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        num_partitions=P,
    )

    def rev(t: pa.Table) -> pa.Table:
        if "l_returnflag" not in t.column_names or len(t) == 0:
            return pa.table(
                {"l_returnflag": pa.array([], pa.string()), "r": pa.array([], _F64)}
            )
        r = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table({"l_returnflag": t.column("l_returnflag"), "r": r})

    agg = (
        joined.map_batches(rev, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("r", alias_name="revenue"), Count(alias_name="n"))
    )

    def fin(t: pa.Table) -> pa.Table:
        if "l_returnflag" not in t.column_names:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "revenue": pa.array([], _F64),
                    "n": pa.array([], _I64),
                }
            )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "revenue": pa.array(
                    np.round(t.column("revenue").to_numpy(zero_copy_only=False), 4)
                ),
                "n": t.column("n"),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def stratified_qty_sample(sf_dir: str, per_bucket: int = 20) -> "ray.data.Dataset":
    """Stratified (curriculum-style) sampling: exact decile buckets of
    ``l_quantity``, then a deterministic hash-sample of ``per_bucket``
    rows per bucket — the balanced-by-difficulty sampling a training
    pipeline runs over a length/score column.

    Two passes, both already-gated machinery composed:
    1. exact decile cuts via the grouped-quantile histogram combiner
       (bounded-cardinality column; the 9-float cut list is the ONLY
       thing the driver holds and broadcasts),
    2. per-batch bucket assignment (searchsorted against the broadcast
       cuts — bucket = #cuts strictly below the value, matching the
       oracle's ``v > cut`` count), then the partial-prune per-group
       deterministic sampler (id-hash order, ties by id).
    """
    from ..functions.quantiles import grouped_discrete_quantiles
    from ..functions.sampling import deterministic_sample_per_group

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"]).map_batches(
        lambda t: pa.table(
            {
                "rid": pc.add(
                    pc.multiply(t.column("l_orderkey").cast(_I64), 8),
                    t.column("l_linenumber").cast(_I64),
                ),
                "l_quantity": t.column("l_quantity"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    qs = tuple(q / 10 for q in range(1, 10))
    with_g = li.map_batches(
        lambda t: t.append_column("_g", pa.array(np.zeros(len(t), dtype=np.int64))),
        batch_format="pyarrow",
    )
    cuts_tbl = grouped_discrete_quantiles(with_g, "_g", "l_quantity", qs=qs).to_pandas()
    cuts = np.array([cuts_tbl[f"q{int(q * 100)}"].iloc[0] for q in qs], dtype=np.float64)

    def assign(t: pa.Table) -> pa.Table:
        v = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(cuts, v, side="left")  # = #cuts strictly < v
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    return deterministic_sample_per_group(
        li.map_batches(assign, batch_format="pyarrow"),
        "bucket",
        "rid",
        per_bucket,
        {"bucket": _I64, "rid": _I64, "l_quantity": pa.float64()},
    )


def events_cume_dist(sf_dir: str) -> "ray.data.Dataset":
    """Per-group cumulative distribution (SQL ``cume_dist() OVER
    (PARTITION BY event_type ORDER BY value)``): fraction of the
    group's rows with value <= this row's value. Chosen over
    percent_rank because it is TIE-STABLE — a pure function of the
    value multiset, so it's deterministic across engines.

    Two passes on the quantile-combiner shape: per-(group, value)
    histogram partials → one small grouped sum → the merged histogram
    (bounded-cardinality assumption, same as the quantile operators)
    becomes a broadcast searchsorted table; pass 2 is a vectorized
    per-batch lookup. No per-group sort of the full table."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t.column("event_type").to_numpy(zero_copy_only=False),
                "v": t.column("value").to_numpy(zero_copy_only=False),
            }
        )
        c = df.groupby(["g", "v"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "g": pa.array(c["g"]),
                "v": pa.array(c["v"].astype(np.float64)),
                "n": pa.array(c["n"].to_numpy(dtype=np.int64)),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .dropna(subset=["g"])
        .sort_values(["g", "v"], kind="stable")
    )
    lookup: dict = {}
    for g, sub in hist.groupby("g", sort=False):
        vals = sub["v"].to_numpy(dtype=np.float64)
        cum = np.cumsum(sub["n"].to_numpy(dtype=np.int64))
        lookup[g] = (vals, cum / cum[-1])

    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "event_id" not in t.column_names:
            return pa.table(
                {
                    "event_id": pa.array([], _I64),
                    "event_type": pa.array([], pa.string()),
                    "cd": pa.array([], _F64),
                }
            )
        types = t.column("event_type").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        cd = np.empty(len(v))
        for g in pd.unique(types):
            m = types == g
            vals, frac = lookup[g]
            cd[m] = frac[np.searchsorted(vals, v[m], side="left")]
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "cd": pa.array(np.round(cd, 6), _F64),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def events_quartile_tiles(sf_dir: str, k: int = 4) -> "ray.data.Dataset":
    """Per-group quantile-bucket assignment (feature binning): tile =
    ``1 + ((rank − 1) · k) // n`` with SQL ``rank() OVER (PARTITION BY
    event_type ORDER BY value)`` — the tie-STABLE sibling of NTILE
    (NTILE splits ties across buckets by physical row order, which is
    nondeterministic across engines; RANK gives every tied row the
    same tile, and the arithmetic is all-integer, so parity is exact
    with zero float ops).

    Same two-pass quantile-combiner shape as events_cume_dist:
    per-(group, value) histogram partials → small grouped sum → the
    merged histogram becomes a broadcast exclusive-cumsum (= rank−1)
    lookup; pass 2 is a vectorized searchsorted per batch. No
    per-group sort of the full table; bounded-cardinality value
    domain assumed (the quantile operators' contract)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t.column("event_type").to_numpy(zero_copy_only=False),
                "v": t.column("value").to_numpy(zero_copy_only=False),
            }
        )
        c = df.groupby(["g", "v"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "g": pa.array(c["g"]),
                "v": pa.array(c["v"].astype(np.float64)),
                "n": pa.array(c["n"].to_numpy(dtype=np.int64)),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .dropna(subset=["g"])
        .sort_values(["g", "v"], kind="stable")
    )
    lookup: dict = {}
    for g, sub in hist.groupby("g", sort=False):
        vals = sub["v"].to_numpy(dtype=np.float64)
        n = sub["n"].to_numpy(dtype=np.int64)
        rank_lt = np.concatenate([[0], np.cumsum(n)[:-1]])  # rows strictly below
        lookup[g] = (vals, rank_lt, int(n.sum()))

    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "event_id" not in t.column_names:
            return pa.table(
                {
                    "event_id": pa.array([], _I64),
                    "event_type": pa.array([], pa.string()),
                    "tile": pa.array([], _I64),
                }
            )
        types = t.column("event_type").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        tile = np.empty(len(v), dtype=np.int64)
        for g in pd.unique(types):
            m = types == g
            vals, rank_lt, n_g = lookup[g]
            lt = rank_lt[np.searchsorted(vals, v[m], side="left")]
            tile[m] = 1 + (lt * k) // n_g
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "tile": pa.array(tile),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def hourly_distinct_users(sf_dir: str, num_shards: int = 8) -> "ray.data.Dataset":
    """Windowed DISTINCT counting: distinct users per tumbling hour —
    the shape behind DAU/HAU-style reach metrics. The (hour, user)
    dedup runs on the distinct-pair BSP (hour index packs with the
    user id; both < 2^31), then the per-hour count BSP — no row-level
    two-column groupby, no per-window set on the driver."""
    from ..util import count_i64_keys, distinct_i64_pairs

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def bucket(t: pa.Table) -> pa.Table:
        hrs = (
            pc.floor_temporal(t.column("ts"), unit="hour")
            .cast(pa.int64())  # µs since epoch
            .to_numpy(zero_copy_only=False)
            // 3_600_000_000  # hour index: fits [0, 2^31) for any real ts
        )
        return pa.table(
            {"h": pa.array(hrs), "u": t.column("user_id").cast(_I64)}
        )

    pairs = distinct_i64_pairs(
        ds.map_batches(bucket, batch_format="pyarrow"), "h", "u", num_shards=num_shards
    )
    counts = count_i64_keys(pairs, "h", num_shards=num_shards, count_col="n_users")

    def fin(t: pa.Table) -> pa.Table:
        if "h" not in t.column_names or len(t) == 0:
            return pa.table(
                {
                    "window_start": pa.array([], pa.timestamp("us")),
                    "n_users": pa.array([], _I64),
                }
            )
        ts = (t.column("h").to_numpy(zero_copy_only=False) * 3_600_000_000).astype(
            "datetime64[us]"
        )
        return pa.table({"window_start": pa.array(ts), "n_users": t.column("n_users")})

    return counts.map_batches(fin, batch_format="pyarrow")


def event_transitions(sf_dir: str, num_buckets: "int | None" = None) -> "ray.data.Dataset":
    """Markov transition counts: (previous event_type → event_type)
    over each user's time-ordered event stream — the funnel/propensity
    matrix behind product analytics.

    Same hash-bucketed plan as the other ordered-window operators
    (~``num_buckets`` coarse pandas groups, ONE (user, ts, id) sort per
    bucket), then a vectorized shift-compare per bucket emitting tiny
    (prev, cur, n) partials; the global fold is a |types|² groupby."""
    from ray.data.aggregate import Sum

    from .temporal import _bucket_of

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    num_buckets = _derived_buckets(ds, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column("user_id").cast(_I64).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(keys, num_buckets)),
                "event_id": t.column("event_id"),
                "user_id": pa.array(keys),
                "ts": t.column("ts"),
                "event_type": t.column("event_type"),
            }
        )

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        n = len(g)
        if n < 2:
            return pd.DataFrame({"prev": [], "cur": [], "n": []})
        same_user = uid[1:] == uid[:-1]
        prev, cur = et[:-1][same_user], et[1:][same_user]
        c = (
            pd.DataFrame({"prev": prev, "cur": cur})
            .groupby(["prev", "cur"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return c

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(transitions, batch_format="pandas")
    )
    return (
        partials.groupby(["prev", "cur"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            ensure_schema({"prev": pa.string(), "cur": pa.string(), "n": _I64}),
            batch_format="pyarrow",
        )
    )


def diff_tables(
    a: "ray.data.Dataset",
    b: "ray.data.Dataset",
    key: str,
    value: str,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Snapshot diff (CDC): compare two keyed tables and emit one row
    per difference — ``added`` (key only in b), ``removed`` (only in
    a), ``changed`` (both, value differs). Identical rows emit
    nothing, so the output is the changeset, not the table.

    One FULL OUTER hash join on the key + a vectorized per-batch
    status classify — the incremental-ingest primitive for reconciling
    a re-crawl against the previous snapshot.

    ``value`` must be non-null in both snapshots: Ray's full-outer
    join coalesces the right key into the left key column, so side
    membership is derived from value-column validity.
    """
    from ..util import compact_for_join

    P = num_partitions
    left = a.map_batches(
        lambda t: pa.table({"k": t.column(key).cast(_I64), "va": t.column(value)})
        if key in t.column_names
        else pa.table({"k": pa.array([], _I64), "va": pa.array([], pa.float64())}),
        batch_format="pyarrow",
    )
    right = b.map_batches(
        lambda t: pa.table({"k2": t.column(key).cast(_I64), "vb": t.column(value)})
        if key in t.column_names
        else pa.table({"k2": pa.array([], _I64), "vb": pa.array([], pa.float64())}),
        batch_format="pyarrow",
    )
    j = compact_for_join(left, P).join(
        compact_for_join(right, P),
        join_type="full_outer",
        num_partitions=P,
        on=("k",),
        right_on=("k2",),
    )

    def classify(t: pa.Table) -> pa.Table:
        if len(t) == 0 or ("k" not in t.column_names and "k2" not in t.column_names):
            return pa.table(
                {
                    key: pa.array([], _I64),
                    "status": pa.array([], pa.string()),
                    "old_value": pa.array([], pa.float64()),
                    "new_value": pa.array([], pa.float64()),
                }
            )
        n = len(t)
        lk = t.column("k") if "k" in t.column_names else pa.nulls(n, _I64)
        rk = t.column("k2") if "k2" in t.column_names else pa.nulls(n, _I64)
        va = t.column("va") if "va" in t.column_names else pa.nulls(n, pa.float64())
        vb = t.column("vb") if "vb" in t.column_names else pa.nulls(n, pa.float64())
        in_a = pc.is_valid(va).to_numpy(zero_copy_only=False)
        in_b = pc.is_valid(vb).to_numpy(zero_copy_only=False)
        van = np.where(in_a, va.to_numpy(zero_copy_only=False).astype(np.float64), np.nan)
        vbn = np.where(in_b, vb.to_numpy(zero_copy_only=False).astype(np.float64), np.nan)
        status = np.where(
            ~in_a, "added", np.where(~in_b, "removed", np.where(van != vbn, "changed", ""))
        )
        m = status != ""
        return pa.table(
            {
                key: pc.coalesce(lk.cast(_I64), rk.cast(_I64)).filter(pa.array(m)),
                "status": pa.array(status[m], pa.string()),
                "old_value": va.cast(pa.float64()).filter(pa.array(m)),
                "new_value": vb.cast(pa.float64()).filter(pa.array(m)),
            }
        )

    return j.map_batches(classify, batch_format="pyarrow")


def item_pairs(
    sf_dir: str,
    min_count: int = 20,
    num_partitions: int = 8,
    max_items_per_user: int | None = 4096,
) -> "ray.data.Dataset":
    """Market-basket pair mining: items (the ``props.k`` scalar) that
    co-occur in the same user's event stream, counted over DISTINCT
    (user, item) incidence — the pairwise frequent-itemset pass.

    Scale shape: vectorized RE2 JSON field extraction per batch
    (``_props_k_array``) → distinct-pair BSP for the incidence table →
    ONE self-join on user (the only pair-expanding step) → vectorized
    a<b canonicalize + pack → packed count BSP → threshold. No
    two-column row groupby anywhere.

    ``max_items_per_user`` ENFORCES the bounded fan-out the self-join
    relies on (the LSH ``max_bucket`` posture): users with more
    distinct items than the cap are dropped before the join — one
    power user with 10⁴ items would otherwise emit 10⁸ join rows.
    ``None`` = exact/unbounded (the oracle-parity mode; sf tables
    stay far under the default cap so the gate is unaffected).
    """
    from ..util import (
        compact_for_join,
        count_i64_keys,
        distinct_i64_pairs,
        pack_sorted_keys,
        semi_join_filter,
    )

    ds = _read(sf_dir, "events", ["user_id", "props"])

    def parse(t: pa.Table) -> pa.Table:
        return pa.table(
            {"u": t.column("user_id").cast(_I64), "k": _props_k_array(t.column("props"))}
        )

    du = distinct_i64_pairs(ds.map_batches(parse, batch_format="pyarrow"), "u", "k")
    if max_items_per_user is not None:
        du = du.materialize()
        hot = count_i64_keys(du, "u", count_col="_c").map_batches(
            lambda t: t.filter(
                pa.array(
                    t.column("_c").to_numpy(zero_copy_only=False) > max_items_per_user
                )
            ).select(["u"])
            if "u" in t.column_names and len(t)
            else pa.table({"u": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
        # the heavy-user set is tiny by construction; packed remotely
        # (driver holds only the ref) and anti-filtered without a shuffle
        du = semi_join_filter(du, "u", pack_sorted_keys(hot, "u"), keep=False)
    left = du.map_batches(
        lambda t: pa.table({"u": t.column("u"), "a": t.column("k")})
        if "u" in t.column_names
        else pa.table({"u": pa.array([], _I64), "a": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    right = du.map_batches(
        lambda t: pa.table({"u2": t.column("u"), "b": t.column("k")})
        if "u" in t.column_names
        else pa.table({"u2": pa.array([], _I64), "b": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    j = compact_for_join(left, num_partitions).join(
        compact_for_join(right, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("u",),
        right_on=("u2",),
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
        j.map_batches(pack, batch_format="pyarrow"), "pk", count_col="n"
    )

    def fin(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "pk" not in t.column_names:
            return pa.table(
                {"a": pa.array([], _I64), "b": pa.array([], _I64), "n": pa.array([], _I64)}
            )
        keep = t.column("n").to_numpy(zero_copy_only=False) >= min_count
        pk = t.column("pk").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "a": pa.array(pk // SHIFT),
                "b": pa.array(pk & (SHIFT - 1)),
                "n": pa.array(t.column("n").to_numpy(zero_copy_only=False)[keep]),
            }
        )

    return counts.map_batches(fin, batch_format="pyarrow")


def item_pair_cosine(
    sf_dir: str,
    min_count: int = 20,
    num_partitions: int = 8,
    max_items_per_user: "int | None" = 4096,
) -> "ray.data.Dataset":
    """Cosine-normalized co-occurrence (the bipartite-projection edge
    weight behind item-item recommenders): for each ``item_pairs``
    pair, ``cosine = n_ab / (√n_a · √n_b)`` with ``n_x`` = the item's
    distinct-user audience — raw counts favor popular items, cosine
    measures affinity.

    Shape: :func:`item_pairs` (distinct-pair BSP → self-join → packed
    count BSP) plus ONE more count-BSP for per-item audiences and two
    Acero joins onto the pair table (schema-pinned between — the
    chained-join rule). Float rule: the single rounded expression is
    ``n·1.0 / (sqrt(na)·sqrt(nb))`` — dot/(sqrt·sqrt), never
    normalize-then-dot — mirrored by the SQL twin.

    Output (a, b, n, cosine 6dp)."""
    from ..util import count_i64_keys, distinct_i64_pairs

    pairs = item_pairs(
        sf_dir,
        min_count=min_count,
        num_partitions=num_partitions,
        max_items_per_user=max_items_per_user,
    ).materialize()
    if pairs.count() == 0:
        # zero pairs above the threshold -> a fully-empty Dataset has
        # no schema and the hash join would raise (the chained-join
        # count-guard rule); short-circuit with the typed empty result
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], _I64),
                    "b": pa.array([], _I64),
                    "n": pa.array([], _I64),
                    "cosine": pa.array([], _F64),
                }
            )
        )

    ds = _read(sf_dir, "events", ["user_id", "props"])

    def parse(t: pa.Table) -> pa.Table:
        return pa.table(
            {"u": t.column("user_id").cast(_I64), "k": _props_k_array(t.column("props"))}
        )

    du = distinct_i64_pairs(ds.map_batches(parse, batch_format="pyarrow"), "u", "k")
    ic = count_i64_keys(du, "k", count_col="c")

    j1 = compact_for_join(
        pairs.map_batches(
            ensure_schema({"a": _I64, "b": _I64, "n": _I64}), batch_format="pyarrow"
        ),
        num_partitions,
    ).join(
        compact_for_join(
            ic.map_batches(
                lambda t: pa.table({"ka": t.column("k"), "ca": t.column("c")}),
                batch_format="pyarrow",
            ),
            num_partitions,
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
        right_on=("ka",),
    )
    j1 = j1.map_batches(
        ensure_schema({"a": _I64, "b": _I64, "n": _I64, "ca": _I64}),
        batch_format="pyarrow",
    )
    j2 = compact_for_join(j1, num_partitions).join(
        compact_for_join(
            ic.map_batches(
                lambda t: pa.table({"kb": t.column("k"), "cb": t.column("c")}),
                batch_format="pyarrow",
            ),
            num_partitions,
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
        right_on=("kb",),
    )

    def fin(t: pa.Table) -> pa.Table:
        cols = {"a": _I64, "b": _I64, "n": _I64}
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table(
                {c: pa.array([], dt) for c, dt in cols.items()}
                | {"cosine": pa.array([], _F64)}
            )
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t.column("cb").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": t.column("a").cast(_I64),
                "b": t.column("b").cast(_I64),
                "n": pa.array(n),
                "cosine": pa.array(np.round(n * 1.0 / (np.sqrt(ca) * np.sqrt(cb)), 6)),
            }
        )

    return j2.map_batches(fin, batch_format="pyarrow")


def retention_cohorts(sf_dir: str, num_partitions: int = 8) -> "ray.data.Dataset":
    """Cohort retention matrix: users bucketed by their FIRST active
    day (the cohort), counted per (cohort, day_offset) — the product
    analytics retention table.

    All-BSP plan: distinct (user, day) incidence via the pair BSP,
    per-user first day via the per-shard BSP argmin
    (``util.min_i64_by_key``), ONE hash join of the tiny (user, cohort)
    table back onto the incidence stream, then the packed count BSP on
    (cohort, offset). A user-day appears once, so the count IS distinct
    users — no row-level distinct anywhere.
    """
    from ..util import compact_for_join, count_i64_keys, distinct_i64_pairs, min_i64_by_key

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def days(t: pa.Table) -> pa.Table:
        d = (
            t.column("ts").cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table({"u": t.column("user_id").cast(_I64), "d": pa.array(d)})

    inc = distinct_i64_pairs(ds.map_batches(days, batch_format="pyarrow"), "u", "d").materialize()
    first = min_i64_by_key(inc, "u", "d").map_batches(
        lambda t: pa.table({"u2": t.column("u"), "cohort": t.column("d")})
        if "u" in t.column_names
        else pa.table({"u2": pa.array([], _I64), "cohort": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    j = compact_for_join(inc, num_partitions).join(
        compact_for_join(first, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("u",),
        right_on=("u2",),
    )
    PACK = np.int64(4096)

    def pack(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "d" not in t.column_names:
            return pa.table({"pk": pa.array([], _I64)})
        d = t.column("d").to_numpy(zero_copy_only=False)
        c = t.column("cohort").to_numpy(zero_copy_only=False)
        off = d - c
        if len(off) and off.max() >= PACK:
            raise ValueError("day offset exceeds packing bound (4096 days)")
        return pa.table({"pk": pa.array(c * PACK + off)})

    counts = count_i64_keys(
        j.map_batches(pack, batch_format="pyarrow"), "pk", count_col="n_users"
    )

    def fin(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "pk" not in t.column_names:
            return pa.table(
                {
                    "cohort": pa.array([], pa.timestamp("us")),
                    "day_offset": pa.array([], _I64),
                    "n_users": pa.array([], _I64),
                }
            )
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort": pa.array(
                    (pk // PACK).astype("datetime64[D]").astype("datetime64[us]")
                ),
                "day_offset": pa.array(pk % PACK),
                "n_users": t.column("n_users"),
            }
        )

    return counts.map_batches(fin, batch_format="pyarrow")


def qty_price_regression(sf_dir: str) -> "ray.data.Dataset":
    """Per-group ordinary least squares y = slope·x + intercept for
    (x = l_quantity, y = l_extendedprice) BY l_returnflag — the same
    numerically-stable centered two-pass moments as
    ``qty_price_corr`` (see its docstring), closed-form solved:
    slope = Sxy/Sxx, intercept = ȳ − slope·x̄. Matches DuckDB's
    regr_slope / regr_intercept at 4 dp."""
    from ray.data.aggregate import Mean

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
    means = {
        r["l_returnflag"]: (r["mx"], r["my"])
        for r in ds.groupby("l_returnflag")
        .aggregate(
            Mean("l_quantity", alias_name="mx"),
            Mean("l_extendedprice", alias_name="my"),
        )
        .take_all()
    }

    def partial(t: pa.Table) -> pa.Table:
        if "l_returnflag" not in t.column_names or len(t) == 0:
            return pa.table(
                {
                    "flag": pa.array([], pa.string()),
                    **{c: pa.array([], _F64) for c in ("sxx", "sxy", "sx", "sy")},
                    "n": pa.array([], _I64),
                }
            )
        flags = t.column("l_returnflag").to_numpy(zero_copy_only=False)
        x = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column("l_extendedprice").to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(flags, return_inverse=True)
        a = np.array([means[f][0] for f in uniq])[inv]
        b = np.array([means[f][1] for f in uniq])[inv]
        cx, cy = x - a, y - b
        k = len(uniq)
        return pa.table(
            {
                "flag": pa.array(list(uniq), pa.string()),
                "sxx": pa.array(np.bincount(inv, cx * cx, k)),
                "sxy": pa.array(np.bincount(inv, cx * cy, k)),
                "sx": pa.array(np.bincount(inv, cx, k)),
                "sy": pa.array(np.bincount(inv, cy, k)),
                "n": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("flag", sort=True).sum()
    sxx = agg["sxx"] - agg["sx"] ** 2 / agg["n"]
    sxy = agg["sxy"] - agg["sx"] * agg["sy"] / agg["n"]
    slope = sxy / sxx
    mx = pd.Series({f: means[f][0] for f in agg.index})
    my = pd.Series({f: means[f][1] for f in agg.index})
    intercept = my - slope * mx
    return ray.data.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(list(agg.index), pa.string()),
                "slope": pa.array(slope.round(4).to_numpy(), _F64),
                "intercept": pa.array(intercept.round(4).to_numpy(), _F64),
                "n": pa.array(agg["n"].to_numpy().astype(np.int64)),
            }
        )
    )


def funnel(
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Ordered funnel analysis: how many users complete step 1, then a
    LATER step 2, then a later step 3 … (earliest-completion greedy
    matching — the standard product-analytics funnel).

    Per step: one predicate-pushed scan of that step's events, a hash
    join against the previous step's (user, completion-time) frontier,
    a vectorized strictly-later filter, and the per-shard BSP argmin
    for the new earliest completion per user. The frontier shrinks
    monotonically; the driver holds only per-step counts.
    """
    from ..util import compact_for_join, min_i64_by_key

    import pyarrow.dataset as pads

    frontier = None
    counts: list[int] = []
    for step_name in steps:
        ev = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_type"],
            filter=pads.field("event_type") == step_name,
        ).map_batches(
            lambda t: pa.table(
                {
                    "u": t.column("user_id").cast(_I64),
                    "t": pa.array(
                        t.column("ts")
                        .cast(pa.timestamp("us"))
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    ),
                }
            )
            if "user_id" in t.column_names
            else pa.table({"u": pa.array([], _I64), "t": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
        if frontier is None:
            cur = min_i64_by_key(ev, "u", "t", num_shards=4)
        else:
            j = compact_for_join(ev, num_partitions).join(
                compact_for_join(frontier, num_partitions),
                join_type="inner",
                num_partitions=num_partitions,
                on=("u",),
                right_on=("u2",),
            )

            def later(t: pa.Table) -> pa.Table:
                if len(t) == 0 or "u" not in t.column_names:
                    return pa.table({"u": pa.array([], _I64), "t": pa.array([], _I64)})
                keep = (
                    t.column("t").to_numpy(zero_copy_only=False)
                    > t.column("tprev").to_numpy(zero_copy_only=False)
                )
                return pa.table(
                    {"u": t.column("u").filter(pa.array(keep)), "t": t.column("t").filter(pa.array(keep))}
                )

            cur = min_i64_by_key(
                j.map_batches(later, batch_format="pyarrow"), "u", "t", num_shards=4
            )
        frontier = cur.map_batches(
            lambda t: pa.table({"u2": t.column("u"), "tprev": t.column("t")})
            if "u" in t.column_names
            else pa.table({"u2": pa.array([], _I64), "tprev": pa.array([], _I64)}),
            batch_format="pyarrow",
        ).materialize()
        counts.append(frontier.count())
        if counts[-1] == 0:
            counts.extend([0] * (len(steps) - len(counts)))
            break
    return ray.data.from_arrow(
        pa.table(
            {
                "step": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
                "name": pa.array(list(steps), pa.string()),
                "n_users": pa.array(np.array(counts, dtype=np.int64)),
            }
        )
    )


def user_journeys(
    sf_dir: str, max_steps: int = 8, num_buckets: "int | None" = None
) -> "ray.data.Dataset":
    """Ordered per-user journey strings (grouped ordered string
    aggregation): the first ``max_steps`` event types per user joined
    with '>' in (ts, event_id) order — the journey-mining input table,
    and the engine's ordered STRING_AGG surface.

    Scale shape: the ``events_sessions`` hash-bucketed plan
    (~num_buckets coarse pandas groups, never one group per user);
    each bucket sorts once by (user_id, ts, event_id), caps each user
    to ``max_steps`` with a vectorized segmented cumcount, and emits
    one joined string per user. Output (user_id, n_events, journey)."""
    from .temporal import _bucket_of

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    num_buckets = _derived_buckets(ds, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column("user_id").cast(_I64).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(keys, num_buckets)),
                "event_id": t.column("event_id"),
                "user_id": pa.array(keys),
                "ts": t.column("ts"),
                "event_type": t.column("event_type"),
            }
        )

    def journeys(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        new = np.ones(len(uid), dtype=bool)
        if len(uid) > 1:
            new[1:] = uid[1:] != uid[:-1]
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        # per-run cumcount (position within user) without a loop
        pos = np.arange(len(uid)) - np.repeat(starts, np.diff(np.append(starts, len(uid))))
        keep = pos < max_steps
        # join kept types per run via pandas groupby-agg on run_id
        dfk = pd.DataFrame({"run": run_id[keep], "et": et[keep]})
        joined = dfk.groupby("run", sort=True)["et"].agg(">".join)
        totals = np.bincount(run_id, minlength=len(starts))
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": totals.astype(np.int64),
                "journey": joined.to_numpy(),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(journeys, batch_format="pandas")
        .map_batches(
            ensure_schema({"user_id": _I64, "n_events": _I64, "journey": pa.string()}),
            batch_format="pyarrow",
        )
    )


def events_moving_avg(sf_dir: str, num_buckets: "int | None" = None) -> "ray.data.Dataset":
    """Sliding window FRAME: per-user 3-event moving average of
    ``value`` in (ts, event_id) order (ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW) — the window-frame surface the tumbling/hopping
    windows don't cover. Output (event_id, ma3 4dp).

    Scale shape: the hash-bucketed ordered plan (events_sessions);
    per bucket one sort + two shifted adds in oldest-first order (the
    exact association SQL's windowed avg uses — cumsum differences
    would round differently). Run boundaries shrink the window at each
    user's first two events."""
    from .temporal import _bucket_of

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    num_buckets = _derived_buckets(ds, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column("user_id").cast(_I64).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(keys, num_buckets)),
                "event_id": t.column("event_id"),
                "user_id": pa.array(keys),
                "ts": t.column("ts"),
                "value": t.column("value"),
            }
        )

    def ma(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        v = g["value"].to_numpy(dtype=np.float64)
        n = len(v)
        same1 = np.zeros(n, dtype=bool)
        same2 = np.zeros(n, dtype=bool)
        if n > 1:
            same1[1:] = uid[1:] == uid[:-1]  # previous row is same user
        if n > 2:
            same2[2:] = uid[2:] == uid[:-2]  # row two back is same user
        v1 = np.zeros(n)
        v2 = np.zeros(n)
        v1[1:] = v[:-1]
        v2[2:] = v[:-2]
        # oldest-first association: (v[i-2] + v[i-1]) + v[i]
        s = np.where(same2, v2, 0.0) + np.where(same1, v1, 0.0) + v
        cnt = 1 + same1.astype(np.int64) + same2.astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(dtype=np.int64),
                "ma3": np.round(s / cnt, 4),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(ma, batch_format="pandas")
        .map_batches(
            ensure_schema({"event_id": _I64, "ma3": _F64}), batch_format="pyarrow"
        )
    )


def events_streaks(
    sf_dir: str, gap_seconds: int = 900, num_buckets: "int | None" = None
) -> "ray.data.Dataset":
    """Gaps-and-islands: per-user activity streaks. An island is a
    maximal run of a user's events (ordered by ts, event_id) where
    each event follows the previous one within ``gap_seconds`` whole
    seconds (``date_diff('second')`` boundary semantics — floor(b) −
    floor(a), never exact interval compare). Output per user:
    ``n_islands``, ``max_len`` (longest streak in events) and
    ``max_dur_s`` (longest streak's first→last whole-second span) —
    the classic SQL islands idiom (LAG break flags + windowed SUM)
    re-expressed without per-user window functions.

    All outputs are exact int64 — no float anywhere (the gate's
    exact-hash posture is free).

    Scale shape: the hash-bucketed ordered plan (events_sessions) —
    ~``num_buckets`` coarse pandas groups; per bucket one stable sort
    by (user_id, ts, event_id), a shifted diff for break flags, then
    island stats via reduceat over island-start offsets and per-user
    maxima via reduceat over user-start offsets. No per-user
    map_groups, no window shuffle."""
    from .temporal import _bucket_of

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    num_buckets = _derived_buckets(ds, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column("user_id").cast(_I64).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(keys, num_buckets)),
                "event_id": t.column("event_id"),
                "user_id": pa.array(keys),
                "ts": t.column("ts"),
            }
        )

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        sec = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64) // 1_000_000
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": np.array([], dtype=np.int64),
                    "n_islands": np.array([], dtype=np.int64),
                    "max_len": np.array([], dtype=np.int64),
                    "max_dur_s": np.array([], dtype=np.int64),
                }
            )
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (uid[1:] != uid[:-1]) | ((sec[1:] - sec[:-1]) > gap_seconds)
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, n))
        isl_user = uid[starts]
        isl_dur = sec[starts + lens - 1] - sec[starts]
        # fold islands per user (islands of one user are contiguous)
        unew = np.ones(len(starts), dtype=bool)
        if len(starts) > 1:
            unew[1:] = isl_user[1:] != isl_user[:-1]
        ustarts = np.flatnonzero(unew)
        return pd.DataFrame(
            {
                "user_id": isl_user[ustarts],
                "n_islands": np.diff(np.append(ustarts, len(starts))).astype(np.int64),
                "max_len": np.maximum.reduceat(lens, ustarts).astype(np.int64),
                "max_dur_s": np.maximum.reduceat(isl_dur, ustarts).astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(streaks, batch_format="pandas")
        .map_batches(
            ensure_schema(
                {
                    "user_id": _I64,
                    "n_islands": _I64,
                    "max_len": _I64,
                    "max_dur_s": _I64,
                }
            ),
            batch_format="pyarrow",
        )
    )


def benford_digits(sf_dir: str, num_shards: int = 8) -> "ray.data.Dataset":
    """Benford first-digit distribution of extended prices — the
    classic data-quality / fabrication screen (naturally-grown
    magnitudes follow log10(1 + 1/d); synthetic or truncated feeds
    don't). Per digit 1-9: n, share (one terminal division, 6 dp) and
    the Benford expectation (log10 parity verified at 6 dp vs DuckDB).

    First digits come from the DECIMAL STRING of integer cents (string
    head is exact; a log10/floor derivation is float-boundary-fragile
    at powers of ten). Scale shape: per-batch 9-bin bincount partials
    → one tiny grouped fold."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def pre(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "l_extendedprice" not in t.column_names:
            return pa.table({"digit": pa.array([], _I64), "c": pa.array([], _I64)})
        import pyarrow.compute as pc

        cents = np.floor(
            t.column("l_extendedprice").cast(_F64).to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        cents = cents[cents > 0]
        first = pc.utf8_slice_codeunits(
            pc.cast(pa.array(cents), pa.string()), 0, 1
        ).to_numpy(zero_copy_only=False)
        d = first.astype(np.int64)
        counts = np.bincount(d, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "c": pa.array(counts.astype(np.int64)),
            }
        )

    folded = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("c", alias_name="n"))
        .map_batches(ensure_schema({"digit": _I64, "n": _I64}), batch_format="pyarrow")
        .to_pandas()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    n = folded["n"].to_numpy(dtype=np.int64)
    total = int(n.sum())
    dig = folded["digit"].to_numpy(dtype=np.int64)
    return ray.data.from_items(
        [
            {
                "digit": int(d),
                "n": int(c),
                "share": round(c / total, 6) if total else 0.0,
                "expected": round(float(np.log10(1 + 1 / d)), 6),
            }
            for d, c in zip(dig, n)
            if c > 0  # absent digits are absent (the SQL GROUP BY rule)
        ]
    )


def decayed_value_per_user(sf_dir: str, num_shards: int = 16) -> "ray.data.Dataset":
    """Exponentially time-decayed engagement score per user — the
    recency-weighted sum every ranking/engagement pipeline keeps, made
    EXACT-HASH-SAFE by dyadic weights: weight = 2^(−k) with k = whole
    HOURS before the global max event time, floored at k = 16 (the
    decay floor: anything older than 16 h keeps weight 2⁻¹⁶). The
    engine accumulates the integer numerator Σ cents · 2^(16−k) — all
    int64, order-free — and performs ONE terminal division by 2¹⁶
    (the float-parity rule; a float exp() sum would be
    association-order fragile). Output (user_id, num, decayed 6dp).

    Scale shape: one tiny max-fold for the anchor time, then per-batch
    integer partials through the weighted count BSP."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    from ..util import count_i64_keys

    t_max = int(
        ds.map_batches(
            lambda t: pa.table(
                {
                    "m": pa.array(
                        [
                            int(
                                t.column("ts")
                                .cast(pa.timestamp("us"))
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)
                                .max()
                            )
                        ]
                        if len(t)
                        else [],
                        _I64,
                    )
                }
            ),
            batch_format="pyarrow",
        ).max("m")
    )

    def pre(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "user_id" not in t.column_names:
            return pa.table({"u": pa.array([], _I64), "p": pa.array([], _I64)})
        u = t.column("user_id").cast(_I64).to_numpy(zero_copy_only=False)
        us = (
            t.column("ts").cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        cents = np.floor(
            t.column("value").cast(_F64).to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        k = np.minimum((t_max - us) // 1_000_000 // 3600, 16)
        w = cents << (16 - k)
        # int64-exact grouped sum (np.bincount's float64 weights lose
        # exactness above 2^53): sort + run-cut + reduceat, the
        # rake_keywords word_partial pattern
        order = np.argsort(u, kind="stable")
        u, w = u[order], w[order]
        cut = np.ones(len(u), bool)
        cut[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(cut)
        return pa.table(
            {
                "u": pa.array(u[starts]),
                "p": pa.array(np.add.reduceat(w, starts).astype(np.int64)),
            }
        )

    summed = count_i64_keys(
        ds.map_batches(pre, batch_format="pyarrow"),
        "u",
        num_shards=num_shards,
        count_col="num",
        weight_col="p",
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "u" not in t.column_names:
            return pa.table(
                {
                    "user_id": pa.array([], _I64),
                    "num": pa.array([], _I64),
                    "decayed": pa.array([], _F64),
                }
            )
        num = t.column("num").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("u"),
                "num": pa.array(num),
                "decayed": pa.array(np.round(num / 65536.0, 6), _F64),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def mode_value_per_user(sf_dir: str, num_shards: int = 16) -> "ray.data.Dataset":
    """Deterministic grouped MODE — most frequent value per group with
    the tie rule pinned (count desc, value asc; SQL's bare ``mode()``
    is tie-unstable across engines so a gate can't use it). Values are
    floor-cents (floor is bit-identical across engines); output per
    user: ``mode_cents``, ``n_mode``.

    Scale shape: two packed-key BSPs, no row-level groupby —
    (1) per-batch np.unique pre-aggregation of packed (user≪31 | cents)
    into partial counts, folded by the weighted count BSP (exchange is
    O(distinct pairs × blocks), never O(rows));
    (2) the keep_best_per_cluster argmin recipe: min over packed
    ((2³¹−1−count)≪31 | cents) keyed by user IS the (count desc,
    cents asc) winner. Both packings need cents and count in
    [0, 2³¹) — counts above that raise (fail loudly, repartition the
    key first)."""
    from ..util import count_i64_keys, min_i64_by_key

    _MASK = (1 << 31) - 1
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def pre(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "user_id" not in t.column_names:
            return pa.table({"k": pa.array([], _I64), "p": pa.array([], _I64)})
        u = t.column("user_id").cast(_I64).to_numpy(zero_copy_only=False)
        cents = np.floor(
            t.column("value").cast(_F64).to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        if cents.size and (cents.min() < 0 or cents.max() > _MASK):
            raise ValueError("mode packing needs cents in [0, 2^31)")
        k, p = np.unique((u << 31) | cents, return_counts=True)
        return pa.table({"k": pa.array(k), "p": pa.array(p.astype(np.int64))})

    counts = count_i64_keys(
        ds.map_batches(pre, batch_format="pyarrow"),
        "k",
        num_shards=num_shards,
        count_col="cnt",
        weight_col="p",
    )

    def pack_winner(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "k" not in t.column_names:
            return pa.table({"user_id": pa.array([], _I64), "w": pa.array([], _I64)})
        k = t.column("k").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        if cnt.size and cnt.max() > _MASK:
            raise ValueError("mode packing needs counts < 2^31")
        return pa.table(
            {
                "user_id": pa.array(k >> 31),
                "w": pa.array(((_MASK - cnt) << 31) | (k & _MASK)),
            }
        )

    won = min_i64_by_key(
        counts.map_batches(pack_winner, batch_format="pyarrow"),
        "user_id",
        "w",
        num_shards=num_shards,
    )

    def unpack(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "user_id" not in t.column_names:
            return pa.table(
                {
                    "user_id": pa.array([], _I64),
                    "mode_cents": pa.array([], _I64),
                    "n_mode": pa.array([], _I64),
                }
            )
        w = t.column("w").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "mode_cents": pa.array(w & _MASK),
                "n_mode": pa.array(_MASK - (w >> 31)),
            }
        )

    return won.map_batches(unpack, batch_format="pyarrow")


def interval_cover(
    sf_dir: str, num_buckets: "int | None" = None
) -> "ray.data.Dataset":
    """Per-user interval-union coverage — the other classic
    gaps-and-islands shape (events_streaks merges by GAP between
    points; this merges OVERLAPPING/touching spans). Each event spans
    [s, e) with s = whole-second epoch of ts and e = s + 60 +
    event_id % 600 (a deterministic per-event duration both engines
    derive identically — the planting recipe); per user the output is
    ``n_events``, ``n_blocks`` (merged maximal spans; touching
    intervals s == running-max-e merge, strictly-later ones break) and
    ``covered_s`` (total union length, exact int64).

    Scale shape: the hash-bucketed ordered plan (events_sessions) —
    per bucket ONE stable sort by (user_id, s, e, event_id), then a
    single global ``np.maximum.accumulate`` running max where each
    user's timeline is shifted into a disjoint int64 range (shift =
    per-bucket user index · 2⁴², cancelling inside any one user's
    arithmetic) so no per-user loop or reset pass exists; block edges
    fall out of one shifted compare and per-user folds are reduceat
    over user-start offsets. No per-user map_groups, no window
    shuffle."""
    from .temporal import _bucket_of

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    num_buckets = _derived_buckets(ds, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column("user_id").cast(_I64).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(keys, num_buckets)),
                "event_id": t.column("event_id"),
                "user_id": pa.array(keys),
                "ts": t.column("ts"),
            }
        )

    def cover(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": np.array([], dtype=np.int64),
                "n_events": np.array([], dtype=np.int64),
                "n_blocks": np.array([], dtype=np.int64),
                "covered_s": np.array([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        eid = g["event_id"].to_numpy(dtype=np.int64)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        s = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64) // 1_000_000
        e = s + 60 + eid % 600
        order = np.lexsort((eid, e, s, uid))
        uid, s, e = uid[order], s[order], e[order]
        n = len(uid)
        # shift each user's timeline into a disjoint range so one
        # global running max respects per-user resets
        _, inv = np.unique(uid, return_inverse=True)
        shift = inv.astype(np.int64) << 42
        m = np.maximum.accumulate(e + shift)  # running max of shifted ends
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (s + shift)[1:] > m[:-1]  # touching (==) merges
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n) - 1  # last row of each block
        covered = (m[ends] - shift[ends]) - s[starts]  # shift cancels in-user
        blk_user = uid[starts]
        unew = np.ones(len(starts), dtype=bool)
        if len(starts) > 1:
            unew[1:] = blk_user[1:] != blk_user[:-1]
        ustarts = np.flatnonzero(unew)
        out_user = blk_user[ustarts]
        n_blocks = np.diff(np.append(ustarts, len(starts))).astype(np.int64)
        covered_s = np.add.reduceat(covered, ustarts).astype(np.int64)
        n_events = np.bincount(inv, minlength=inv.max() + 1)
        # bincount is keyed by the per-bucket user index; remap to the
        # block-order user sequence (np.unique sorted uid ascending and
        # lexsort's primary key is uid, so both walks are ascending)
        return pd.DataFrame(
            {
                "user_id": out_user,
                "n_events": n_events[inv[starts[ustarts]]].astype(np.int64),
                "n_blocks": n_blocks,
                "covered_s": covered_s,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cover, batch_format="pandas")
        .map_batches(
            ensure_schema(
                {
                    "user_id": _I64,
                    "n_events": _I64,
                    "n_blocks": _I64,
                    "covered_s": _I64,
                }
            ),
            batch_format="pyarrow",
        )
    )


def time_weighted_value(sf_dir: str, num_buckets: "int | None" = None) -> "ray.data.Dataset":
    """Time-weighted average value per user — each event's value is
    weighted by its DWELL (whole seconds until the user's next event,
    ``date_diff('second')`` boundary semantics: floor(b) − floor(a));
    the user's last event has no dwell and drops out. The metric every
    engagement pipeline derives from an event stream, and a LEAD()
    window surface the LAG-based family doesn't cover.

    Output (user_id, n_events, twa 6dp) for users with ≥ 2 events and
    a positive total dwell. Float-parity posture: values quantize to
    integer hundredths via floor(value·100) (floor is bit-identical
    across engines; never CAST-vs-rint), numerator and denominator
    accumulate as EXACT int64, and the single terminal division is the
    only float op (the repo's float-parity rule).

    Scale shape: the hash-bucketed ordered plan (events_sessions) —
    per bucket one stable sort + one shifted compare; no per-user
    map_groups."""
    from .temporal import _bucket_of

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    num_buckets = _derived_buckets(ds, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column("user_id").cast(_I64).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(keys, num_buckets)),
                "event_id": t.column("event_id"),
                "user_id": pa.array(keys),
                "ts": t.column("ts"),
                "value": t.column("value"),
            }
        )

    def twa(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        sec = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64) // 1_000_000
        vq = np.floor(g["value"].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
        n = len(g)
        nxt_same = np.zeros(n, dtype=bool)
        if n > 1:
            nxt_same[:-1] = uid[1:] == uid[:-1]
        dwell = np.zeros(n, dtype=np.int64)
        dwell[:-1] = sec[1:] - sec[:-1]
        dwell = np.where(nxt_same, dwell, 0)
        df = pd.DataFrame(
            {
                "user_id": uid,
                "num": vq * dwell,
                "den": dwell,
                "one": np.ones(n, dtype=np.int64),
            }
        )
        a = df.groupby("user_id", sort=False).agg(
            num=("num", "sum"), den=("den", "sum"), n_events=("one", "sum")
        ).reset_index()
        a = a[(a["n_events"] >= 2) & (a["den"] > 0)]
        return pd.DataFrame(
            {
                "user_id": a["user_id"].to_numpy(dtype=np.int64),
                "n_events": a["n_events"].to_numpy(dtype=np.int64),
                "twa": np.round(
                    a["num"].to_numpy(dtype=np.float64)
                    / (100.0 * a["den"].to_numpy(dtype=np.float64)),
                    6,
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(twa, batch_format="pandas")
        .map_batches(
            ensure_schema({"user_id": _I64, "n_events": _I64, "twa": _F64}),
            batch_format="pyarrow",
        )
    )


def _skyline_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2D skyline (minimize price, maximize
    size; ties on BOTH dims are mutually non-dominating). Vectorized:
    sort by (price asc, size desc), per-price-group max size via the
    leading element, prefix STRICT max over earlier (cheaper) groups;
    a point survives iff it carries its group max AND that max beats
    every strictly-cheaper point's size."""
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-size, price))
    p_s, s_s = price[order], size[order]
    new_grp = np.ones(n, dtype=bool)
    new_grp[1:] = p_s[1:] != p_s[:-1]
    grp_id = np.cumsum(new_grp) - 1
    grp_max = s_s[new_grp]  # first element of each group = its max
    prev_strict_max = np.empty(len(grp_max), dtype=s_s.dtype)
    prev_strict_max[0] = np.iinfo(np.int64).min if s_s.dtype.kind == "i" else -np.inf
    if len(grp_max) > 1:
        np.maximum.accumulate(grp_max[:-1], out=prev_strict_max[1:])
    keep_sorted = (s_s == grp_max[grp_id]) & (grp_max[grp_id] > prev_strict_max[grp_id])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline_parts(sf_dir: str) -> "ray.data.Dataset":
    """2D skyline (Pareto frontier) of the part table: minimize
    p_retailprice, maximize p_size — "no part is both cheaper and
    larger". The multi-objective shortlist every catalog/ranking
    pipeline wants, and a genuinely distributed-friendly operator:
    the skyline of a union IS the skyline of the per-block skylines
    (dominated rows can be discarded locally), so each batch prunes to
    its local frontier and ONE small merge computes the exact result.
    Only comparisons touch the float column — no arithmetic, so
    engine/oracle parity is exact by construction.

    Scale note: per-block partials bound the exchange at
    O(blocks × local-frontier); for uniformly random 2D data the
    frontier is O(log n) rows, for adversarially anti-correlated data
    it can approach n — the merge then degrades to a gather, which is
    inherent to exact skylines (documented, not silent)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    def local(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "p_partkey" not in t.column_names:
            return pa.table(
                {
                    "p_partkey": pa.array([], _I64),
                    "p_retailprice": pa.array([], _F64),
                    "p_size": pa.array([], _I64),
                }
            )
        price = t.column("p_retailprice").to_numpy(zero_copy_only=False)
        size = t.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _skyline_mask(price, size)
        return pa.table(
            {
                "p_partkey": t.column("p_partkey").cast(_I64).filter(pa.array(keep)),
                "p_retailprice": t.column("p_retailprice").filter(pa.array(keep)),
                "p_size": pa.array(size[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        return local(t)

    partials = ds.map_batches(local, batch_format="pyarrow")
    # exact final frontier: one merge over the pruned partials
    return (
        partials.repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .map_batches(
            ensure_schema(
                {"p_partkey": _I64, "p_retailprice": _F64, "p_size": _I64}
            ),
            batch_format="pyarrow",
        )
    )
