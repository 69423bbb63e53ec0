"""Temporal joins (pipelines/temporal) + the new relational operators
(top-k per group, sliding windows, anti-join, near-dedup keep-first):
each verified against a brute-force numpy/pandas oracle on synthetic
frames — independent of the DuckDB driver-gate oracles, and covering
edge cases (ties, empty sides, zero-count windows) the gate data may
not hit."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from distributed_pagerank_ray.pipelines.temporal import asof_join, range_count_join

US_PER_MIN = 60_000_000


def _events(rows):
    """rows: (event_id, user_id, t_minutes)"""
    return ray.data.from_items(
        [
            {
                "event_id": int(e),
                "user_id": int(u),
                "ts": np.datetime64(t * US_PER_MIN, "us"),
            }
            for e, u, t in rows
        ]
    )


def _brute_asof(probe, ref):
    out = []
    for pe, pu, pt in probe:
        cands = [(rt, re) for re, ru, rt in ref if ru == pu and rt <= pt]
        if cands:
            rt, re = max(cands)  # max t, then max id — the documented tie-break
            out.append((pe, pu, re, rt))
    return sorted(out)


def test_asof_join_matches_brute_force_with_ties():
    probe = [(1, 7, 10), (2, 7, 5), (3, 8, 100), (4, 9, 50)]  # user 9: no refs
    ref = [(10, 7, 5), (11, 7, 5), (12, 7, 9), (20, 8, 100), (21, 8, 99)]
    res = asof_join(_events(probe), _events(ref)).to_pandas()
    got = sorted((int(r.probe_id), int(r.key), int(r.ref_id)) for r in res.itertuples())
    exp = [(pe, pu, re) for pe, pu, re, _ in _brute_asof(probe, ref)]
    assert got == exp
    # matched timestamps are the reference's, not the probe's
    ts_by_probe = {int(r.probe_id): r.ref_ts for r in res.itertuples()}
    assert ts_by_probe[1] == pd.Timestamp(np.datetime64(9 * US_PER_MIN, "us"))  # latest <= 10
    assert ts_by_probe[2] == pd.Timestamp(np.datetime64(5 * US_PER_MIN, "us"))
    # exact-tie at t=5: ref ids 10 and 11 both at t=5 → larger id wins
    res2 = asof_join(_events([(2, 7, 5)]), _events(ref)).to_pandas()
    assert int(res2["ref_id"].iloc[0]) == 11
    # probe with no prior ref is dropped (inner)
    assert 4 not in set(res["probe_id"])


def test_asof_join_empty_ref_side():
    # inner semantics: no reference rows → no output. (A fully-empty
    # Ray dataset carries no schema — 0 blocks means no map_batches
    # ever runs — so only emptiness is asserted here; non-empty paths
    # pin the schema via _restore_ts.)
    res = asof_join(_events([(1, 7, 10)]), _events([])).to_pandas()
    assert len(res) == 0


def test_range_count_join_brute_force():
    rng = np.random.default_rng(7)
    probe = [(i, int(rng.integers(0, 5)), int(rng.integers(0, 500))) for i in range(80)]
    ref = [(1000 + i, int(rng.integers(0, 5)), int(rng.integers(0, 500))) for i in range(200)]
    w_min = 30
    res = (
        range_count_join(
            _events(probe), _events(ref), window_us=w_min * US_PER_MIN
        )
        .to_pandas()
        .set_index("probe_id")
    )
    assert len(res) == len(probe)  # every probe survives, zeros included
    for pe, pu, pt in probe:
        n = sum(1 for _, ru, rt in ref if ru == pu and pt - w_min < rt <= pt)
        assert int(res.loc[pe, "n_in_window"]) == n, pe


def test_top_orders_per_segment_oracle(tmp_path):
    """Partial-topk pruning must not change the exact answer, ties
    included (duplicate totalprice within a segment)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    n_orders, n_cust = 500, 40
    segs = np.array(["A", "B", "C"])[rng.integers(0, 3, n_cust)]
    price = np.round(rng.uniform(10, 99, n_orders), 0)  # coarse → many ties
    cust_of = rng.integers(0, n_cust, n_orders)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_mktsegment": pa.array(segs),
            }
        ),
        f"{tmp_path}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
                "o_custkey": pa.array(cust_of, pa.int64()),
                "o_totalprice": pa.array(price, pa.float64()),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    from distributed_pagerank_ray.pipelines.relational import top_orders_per_segment

    got = (
        top_orders_per_segment(str(tmp_path), k=3)
        .to_pandas()
        .sort_values(["c_mktsegment", "o_orderkey"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame(
        {"c_mktsegment": segs[cust_of], "o_orderkey": np.arange(n_orders), "o_totalprice": price}
    )
    exp = (
        df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .groupby("c_mktsegment", sort=False)
        .head(3)
        .sort_values(["c_mktsegment", "o_orderkey"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=False)


def test_sliding_window_covers_each_event_twice(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = [np.datetime64("2024-01-01T00:30", "us"), np.datetime64("2024-01-01T01:30", "us")]
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(["a", "a"]),
                "value": pa.array([1.0, 10.0]),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    from distributed_pagerank_ray.pipelines.relational import events_sliding

    got = events_sliding(str(tmp_path)).to_pandas().sort_values("window_start")
    # windows (2h size / 1h slide): 23:00(evt1), 00:00(both), 01:00(evt2)
    assert got["n_events"].sum() == 4  # each event in exactly 2 windows
    by_start = got.set_index("window_start")["sum_value"]
    assert by_start[pd.Timestamp("2024-01-01 00:00")] == 11.0
    assert by_start[pd.Timestamp("2023-12-31 23:00")] == 1.0
    assert by_start[pd.Timestamp("2024-01-01 01:00")] == 10.0


def test_weighted_pagerank_vs_numpy():
    import pyarrow as pa

    from distributed_pagerank_ray.pipelines.pagerank_weighted import pagerank_weighted_fixed

    # small weighted digraph with a duplicate edge (multigraph) and a
    # dangling vertex (3 has no out-edges)
    src = [0, 0, 1, 2, 2, 0]
    dst = [1, 2, 3, 0, 3, 1]  # (0,1) twice: w 1.0 and 0.5
    w = [1.0, 2.0, 1.0, 4.0, 1.0, 0.5]
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()), "w": pa.array(w)})
    )
    got = pagerank_weighted_fixed(ds, iters=3, num_partitions=2).to_pandas()
    got = dict(zip(got["vertex"], got["rank"]))

    n, c = 4, 0.85
    W = {0: 3.5, 1: 1.0, 2: 5.0}
    r = np.full(n, 1 / n)
    for _ in range(3):
        nxt = np.full(n, (1 - c) / n)
        for s, d, wt in zip(src, dst, w):
            nxt[d] += c * r[s] * wt / W[s]
        r = nxt
    r = r / r.sum()
    for v in range(n):
        assert abs(got[v] - round(float(r[v]), 6)) < 1.5e-6, (v, got[v], r[v])


def test_kcore_true_core_vs_brute_force():
    """rounds=None loops to the fixpoint; verify against an in-memory
    peeling oracle on a random graph."""
    import pyarrow as pa

    from distributed_pagerank_ray.pipelines.kcore import kcore_peel

    rng = np.random.default_rng(4)
    m = 1200  # dense enough that the core is non-empty (asserted below)
    a = rng.integers(0, 60, m)
    b = rng.integers(0, 60, m)
    keep = a < b
    pairs = sorted(set(zip(a[keep].tolist(), b[keep].tolist())))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    k = 8
    got = kcore_peel(ds, k=k, rounds=None).to_pandas()

    # oracle: iterative peeling on plain sets
    edges = set(pairs)
    while True:
        deg: dict[int, int] = {}
        for x, y in edges:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        kill = {v for v, d in deg.items() if d < k}
        if not kill:
            break
        edges = {(x, y) for x, y in edges if x not in kill and y not in kill}
    exp_deg: dict[int, int] = {}
    for x, y in edges:
        exp_deg[x] = exp_deg.get(x, 0) + 1
        exp_deg[y] = exp_deg.get(y, 0) + 1
    assert dict(zip(got["v"], got["deg"])) == exp_deg
    assert len(exp_deg) > 0  # non-degenerate fixture
    assert all(d >= k for d in exp_deg.values())

    # the anti-join path (forced: broadcast_kill_limit=0 so even the
    # first round's >50%-of-vertices kill set goes through left_anti
    # shuffle joins) must produce the identical core
    got2 = kcore_peel(ds, k=k, rounds=None, broadcast_kill_limit=0, num_partitions=4).to_pandas()
    assert dict(zip(got2["v"], got2["deg"])) == exp_deg


def test_near_dedup_keep_first_sf0001():
    """End-to-end near-dedup on the real documents table: kept == docs
    that are the min id of their exact-Jaccard duplicate component."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    import __ray_entry__ as entry

    got = (
        entry.queries()["t_near_dedup_keep"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ["documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    exp = (
        con.execute(entry.oracle_sql()["t_near_dedup_keep"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["kept"].isin([0, 1]).all() and got["kept"].sum() < len(got)
