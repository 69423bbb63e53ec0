"""Bucket-count invariance for the ordered-window family (VERDICT r4
#5): results must be identical for the size-derived default and any
explicit count — bucketing is a physical plan choice, not semantics."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def _cmp(df_a: pd.DataFrame, df_b: pd.DataFrame):
    cols = sorted(df_a.columns)
    a = df_a[cols].sort_values(cols).reset_index(drop=True)
    b = df_b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sessions_bucket_invariance(ray_session):
    from distributed_pagerank_ray.pipelines.relational import events_sessions

    _cmp(events_sessions(SF).to_pandas(), events_sessions(SF, num_buckets=257).to_pandas())


def test_moving_avg_bucket_invariance(ray_session):
    from distributed_pagerank_ray.pipelines.relational import events_moving_avg

    _cmp(events_moving_avg(SF).to_pandas(), events_moving_avg(SF, num_buckets=257).to_pandas())


def test_journeys_bucket_invariance(ray_session):
    from distributed_pagerank_ray.pipelines.relational import user_journeys

    _cmp(user_journeys(SF).to_pandas(), user_journeys(SF, num_buckets=257).to_pandas())


def test_derived_bucket_floor_and_scaling(ray_session):
    import ray.data

    from distributed_pagerank_ray.pipelines.relational import _derived_buckets

    ds = ray.data.range(1000)
    assert _derived_buckets(ds, None) == 32  # floor
    assert _derived_buckets(ds, 7) == 7  # explicit override wins
    assert _derived_buckets(ds, None, rows_per_bucket=100) == 32  # floored at 32
    assert _derived_buckets(ds, None, rows_per_bucket=20) == 50
    assert _derived_buckets(ds, None, rows_per_bucket=3) == 334  # ceil


def test_time_weighted_bucket_invariance(ray_session):
    from distributed_pagerank_ray.pipelines.relational import time_weighted_value

    _cmp(
        time_weighted_value(SF).to_pandas(),
        time_weighted_value(SF, num_buckets=257).to_pandas(),
    )


def test_streaks_bucket_invariance(ray_session):
    from distributed_pagerank_ray.pipelines.relational import events_streaks

    _cmp(events_streaks(SF).to_pandas(), events_streaks(SF, num_buckets=257).to_pandas())


def test_streaks_brute_force(ray_session):
    """Per-user islands vs a plain python reference on the sf0.001
    events table (gap compare on whole-second floors, not exact µs)."""
    import numpy as np
    import pyarrow.parquet as pq

    from distributed_pagerank_ray.pipelines.relational import events_streaks

    t = pq.read_table(SF + "/events.parquet", columns=["event_id", "user_id", "ts"])
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want: dict[int, list[int]] = {}
    for uid, g in df.groupby("user_id"):
        secs = (g["ts"].to_numpy("datetime64[us]").astype(np.int64) // 1_000_000).tolist()
        islands: list[list[int]] = [[secs[0]]]
        for prev, cur in zip(secs, secs[1:]):
            if cur - prev > 900:
                islands.append([cur])
            else:
                islands[-1].append(cur)
        want[int(uid)] = [
            len(islands),
            max(len(i) for i in islands),
            max(i[-1] - i[0] for i in islands),
        ]
    got = events_streaks(SF).to_pandas().set_index("user_id")
    assert len(got) == len(want)
    for uid, (ni, ml, md) in want.items():
        row = got.loc[uid]
        assert (row["n_islands"], row["max_len"], row["max_dur_s"]) == (ni, ml, md)
