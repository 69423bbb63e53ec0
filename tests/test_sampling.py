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


def test_chunk_spans_brute_force_and_edges():
    """chunk_spans == per-doc brute-force minimum-cover windows; zero-
    token docs absent; every token covered; no chunk wholly contained
    in its predecessor."""
    import numpy as np
    import pyarrow as pa

    from distributed_pagerank_ray.functions.sampling import chunk_spans

    C, S = 32, 24
    # adversarial sizes: 0, 1, S, S+1, C-1, C, C+1, 2C, exact multiples, big
    sizes = [0, 1, 23, 24, 25, 31, 32, 33, 48, 49, 56, 57, 64, 200, 1000]
    ids = np.arange(len(sizes), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(np.array(sizes, np.int64))})
    ).repartition(4)
    got = chunk_spans(ds, C, S).to_pandas().sort_values(["doc_id", "chunk_id"])

    exp = []
    for i, n in zip(ids, sizes):
        if n == 0:
            continue
        starts = [0]
        while starts[-1] + C < n:
            starts.append(starts[-1] + S)
        for j, st in enumerate(starts):
            exp.append((i, j, st, min(C, n - st)))
    assert [tuple(r) for r in got.to_numpy()] == exp
    # coverage: last chunk reaches the end
    last = got.groupby("doc_id").tail(1)
    assert (last["start_tok"] + last["n_chunk"] == [s for s in sizes if s > 0]).all()


def test_chunk_spans_rejects_bad_stride():
    import pyarrow as pa

    from distributed_pagerank_ray.functions.sampling import chunk_spans

    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([1]), "n_tokens": pa.array([5])}))
    with pytest.raises(ValueError):
        chunk_spans(ds, 8, 9)
    with pytest.raises(ValueError):
        chunk_spans(ds, 8, 0)


def test_weighted_priority_sample_matches_brute_force():
    """Winners == the k smallest (hash2(id)/w, id) computed brute-force;
    heavier rows win more often than a uniform draw."""
    import numpy as np
    import pyarrow as pa

    from distributed_pagerank_ray.functions.sampling import (
        _hash2_ids,
        weighted_priority_sample,
    )

    rng = np.random.default_rng(3)
    n, k = 4000, 50
    ids = rng.permutation(n).astype(np.int64)
    w = rng.integers(1, 500, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    ).repartition(9)
    got = weighted_priority_sample(ds, k).to_pandas()
    assert len(got) == k

    p = _hash2_ids(ids).astype(np.float64) / w
    order = np.lexsort((ids, p))[:k]
    assert list(got["doc_id"]) == list(ids[order])
    assert list(got["w"]) == list(w[order])
    assert np.allclose(got["prio"], np.round(p[order], 6))
    # weighted: mean weight of winners must exceed the population mean
    assert w[order].mean() > w.mean()


def test_weighted_priority_sample_rejects_nonpositive_weights():
    import pyarrow as pa

    from distributed_pagerank_ray.functions.sampling import weighted_priority_sample

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2]), "w": pa.array([3, 0])})
    )
    with pytest.raises(Exception):
        weighted_priority_sample(ds, 1).to_pandas()
