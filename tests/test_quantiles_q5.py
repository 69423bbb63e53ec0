"""Grouped discrete quantiles + the Q5 multi-join + grouped std —
verified against DuckDB on the sf0.001 testdata (these three have
driver-gate oracles too; the pytest copies keep them covered at
num_cpus=4 and on schema edge cases)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["lineitem", "events", "customer", "orders", "supplier", "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_grouped_discrete_quantiles_vs_duckdb():
    from distributed_pagerank_ray.functions.quantiles import grouped_discrete_quantiles

    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
    got = (
        grouped_discrete_quantiles(ds, "l_returnflag", "l_quantity", qs=(0.25, 0.5, 0.75, 0.9))
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    exp = (
        _con()
        .execute(
            """
            SELECT l_returnflag, quantile_disc(l_quantity, 0.25) AS q25,
                   quantile_disc(l_quantity, 0.5) AS q50,
                   quantile_disc(l_quantity, 0.75) AS q75,
                   quantile_disc(l_quantity, 0.9) AS q90
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
            """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_grouped_discrete_quantiles_tiny_groups():
    """n=1 and n=2 groups: index = ceil(q·n)−1 must clamp correctly."""
    from distributed_pagerank_ray.functions.quantiles import grouped_discrete_quantiles

    ds = ray.data.from_items(
        [{"g": "a", "v": 5.0}, {"g": "b", "v": 1.0}, {"g": "b", "v": 9.0}]
    )
    got = grouped_discrete_quantiles(ds, "g", "v", qs=(0.25, 0.5, 1.0)).to_pandas()
    got = got.set_index("g")
    assert got.loc["a"].tolist() == [5.0, 5.0, 5.0]
    # n=2: q=.25 → ceil(.5)−1 = 0 → 1.0; q=.5 → ceil(1)−1 = 0 → 1.0; q=1 → 9.0
    assert got.loc["b"].tolist() == [1.0, 1.0, 9.0]


def test_approx_quantiles_error_bound():
    from distributed_pagerank_ray.functions.quantiles import approx_quantiles

    rng = np.random.default_rng(5)
    vals = rng.exponential(10.0, 50_000)  # skewed on purpose
    ds = ray.data.from_arrow(
        __import__("pyarrow").table({"v": __import__("pyarrow").array(vals)})
    )
    qs = (0.1, 0.5, 0.9, 0.99)
    got = approx_quantiles(ds, "v", qs=qs, n_bins=4096)
    exact = np.quantile(vals, qs)
    width = (vals.max() - vals.min()) / 4096
    for g, e in zip(got, exact):
        assert abs(g - e) <= 2 * width + 1e-9, (g, e)
    # rank error: realized rank of each approximation within 1% of q
    for q, g in zip(qs, got):
        assert abs((vals <= g).mean() - q) <= 0.01


def test_q5_revenue_vs_duckdb():
    from distributed_pagerank_ray.pipelines.relational import q5_revenue_by_nation

    got = (
        q5_revenue_by_nation(SF)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    exp = (
        _con()
        .execute(
            """
            SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
            FROM customer c, orders o, lineitem l, supplier s, nation n, region r
            WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
              AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
              AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
              AND r.r_name = 'ASIA'
              AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1997-01-01'
            GROUP BY n.n_name ORDER BY n.n_name
            """
        )
        .df()
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_events_std_vs_duckdb():
    import __ray_entry__ as entry

    got = (
        entry.queries()["r_events_std"](SF)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    exp = (
        _con()
        .execute(
            "SELECT event_type, round(stddev_samp(value), 4) AS std_value, count(*) AS n "
            "FROM events GROUP BY event_type ORDER BY event_type"
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interpolated_quantiles_vs_numpy():
    from distributed_pagerank_ray.functions.quantiles import grouped_discrete_quantiles

    rng = np.random.default_rng(8)
    vals = rng.integers(0, 30, 4000).astype(np.float64)  # repeated values
    groups = np.array(["x", "y"])[rng.integers(0, 2, 4000)]
    import pyarrow as pa

    ds = ray.data.from_arrow(pa.table({"g": pa.array(groups), "v": pa.array(vals)}))
    got = (
        grouped_discrete_quantiles(ds, "g", "v", qs=(0.1, 0.5, 0.99), interpolated=True)
        .to_pandas()
        .set_index("g")
    )
    for g in ("x", "y"):
        sub = vals[groups == g]
        exp = np.quantile(sub, (0.1, 0.5, 0.99))  # numpy default = linear interp
        np.testing.assert_allclose(got.loc[g].to_numpy(), exp, atol=1e-9)


def test_q3_broadcast_equals_join_path():
    """q3's hybrid fact-side must give identical rows on both paths:
    broadcast (packed order-date lookup + customer semi-filter) and
    the hash-join fallback (threshold forced to 0)."""
    from distributed_pagerank_ray.pipelines.relational import q3_top_orders

    sf = "/root/testdata/sf0.001"
    a = q3_top_orders(sf, broadcast_threshold=5_000_000).take_all()
    b = q3_top_orders(sf, broadcast_threshold=0).take_all()
    assert a == b
    assert len(a) == 10


def test_grouped_discrete_quantiles_int_bsp_identical(ray_session):
    """The packed-key BSP histogram merge is a physical-plan choice:
    results must be bit-identical to the groupby path."""
    import pyarrow as pa

    from distributed_pagerank_ray.functions.quantiles import grouped_discrete_quantiles

    rng = np.random.default_rng(1)
    t = pa.table(
        {
            "g": pa.array(rng.integers(0, 3, 50_000).astype(np.int64)),
            "v": pa.array(rng.integers(0, 10_000, 50_000).astype(np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    a = (
        grouped_discrete_quantiles(ds, "g", "v", qs=(0.01, 0.5, 0.99))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
        .astype({"g": "int64"})
    )
    b = (
        grouped_discrete_quantiles(ds, "g", "v", qs=(0.01, 0.5, 0.99), int_bsp=True)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
        .astype({"g": "int64"})
    )
    pd.testing.assert_frame_equal(a, b)


def test_grouped_discrete_quantiles_int_bsp_rejects_out_of_range(ray_session):
    import pyarrow as pa

    from distributed_pagerank_ray.functions.quantiles import grouped_discrete_quantiles

    ds = ray.data.from_arrow(
        pa.table({"g": pa.array([0], pa.int64()), "v": pa.array([-5], pa.int64())})
    )
    with pytest.raises(Exception, match="int_bsp"):
        grouped_discrete_quantiles(ds, "g", "v", int_bsp=True).to_pandas()
