"""Deterministic sampling (functions/sampling): reproducibility and
exactness vs a brute-force numpy oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from distributed_pagerank_ray.functions.sampling import (
    _MOD,
    _MULT,
    deterministic_fraction,
    deterministic_sample_per_group,
)


def _ds(n=5000, seed=11):
    rng = np.random.default_rng(seed)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(rng.permutation(n).astype(np.int64)),
                "g": pa.array(np.array(["a", "b", "c"])[rng.integers(0, 3, n)]),
            }
        )
    )


def test_fraction_exact_and_stable():
    ds = _ds()
    got1 = sorted(deterministic_fraction(ds, "event_id", 0.2).to_pandas()["event_id"])
    got2 = sorted(deterministic_fraction(ds, "event_id", 0.2).to_pandas()["event_id"])
    assert got1 == got2  # rerun-stable
    ids = np.arange(5000, dtype=np.int64)
    exp = sorted(ids[(ids * _MULT) % _MOD < int(0.2 * _MOD)])
    assert got1 == exp
    # ~fraction of rows survive
    assert 0.15 < len(got1) / 5000 < 0.25


def test_fraction_overflow_guard():
    ds = ray.data.from_arrow(pa.table({"event_id": pa.array([2**62], pa.int64())}))
    with pytest.raises(Exception):
        deterministic_fraction(ds, "event_id", 0.5).to_pandas()


def test_sample_per_group_matches_brute_force():
    ds = _ds()
    got = (
        deterministic_sample_per_group(
            ds, "g", "event_id", n=7,
            out_schema={"g": pa.string(), "event_id": pa.int64()},
        )
        .to_pandas()
        .sort_values(["g", "event_id"])
        .reset_index(drop=True)
    )
    df = ds.to_pandas()
    df["_h"] = (df["event_id"] * _MULT) % _MOD
    exp = (
        df.sort_values(["_h", "event_id"], kind="stable")
        .groupby("g", sort=False)
        .head(7)[["g", "event_id"]]
        .sort_values(["g", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) == 21


def test_deterministic_split_partitions_and_fractions():
    from distributed_pagerank_ray.functions.sampling import deterministic_split

    ds = _ds(n=10_000)
    got = deterministic_split(ds, "event_id", {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    # exactly one split per row, rerun-stable
    again = deterministic_split(ds, "event_id", {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("event_id").reset_index(drop=True),
        again.sort_values("event_id").reset_index(drop=True),
    )
    frac = got["split"].value_counts(normalize=True)
    assert 0.77 < frac["train"] < 0.83 and 0.08 < frac["val"] < 0.12 and 0.08 < frac["test"] < 0.12
    with pytest.raises(ValueError):
        deterministic_split(ds, "event_id", {"a": 0.5, "b": 0.4})


def test_pack_sequences_multiblock_prefix_scan():
    import numpy as np
    import pyarrow as pa

    from distributed_pagerank_ray.functions.sampling import pack_sequences

    rng = np.random.RandomState(5)
    n = 1000
    toks = rng.randint(1, 90, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)), "n_tokens": pa.array(toks)})
    ).repartition(7)  # force the multi-block offset path
    got = (
        pack_sequences(ds, budget=256)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    prev = np.cumsum(toks) - toks
    assert np.array_equal(got["seq_id"].to_numpy(), prev // 256)
    assert np.array_equal(got["n_tokens"].to_numpy(), toks)
