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
