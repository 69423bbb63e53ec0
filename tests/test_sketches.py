import numpy as np

import ray.data

from distributed_pagerank_ray.functions.sketches import HLL, _hash64, approx_distinct


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(1)
    vals_a = [f"u{i}" for i in range(5000)]
    vals_b = [f"u{i}" for i in range(2500, 7500)]  # 50% overlap
    a = HLL().add_hashes(_hash64(vals_a))
    b = HLL().add_hashes(_hash64(vals_b))
    est_a = a.estimate()
    assert abs(est_a - 5000) / 5000 < 0.05
    merged = a.merge(b)
    assert abs(merged.estimate() - 7500) / 7500 < 0.05


def test_approx_distinct_dataset():
    ds = ray.data.range(20000).map_batches(
        lambda t: {"user": (t["id"] % 3000).astype(np.int64)}, batch_format="numpy"
    )
    est = approx_distinct(ds, "user")
    assert abs(est - 3000) / 3000 < 0.05


def test_deterministic():
    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["user_id"])
    e1 = approx_distinct(ds, "user_id")
    e2 = approx_distinct(ds, "user_id")
    assert e1 == e2
    exact = len(set(r["user_id"] for r in ds.take_all()))
    assert abs(e1 - exact) / exact < 0.06


def test_quantile_sketch_bound_and_compress(ray_session):
    from distributed_pagerank_ray.functions.sketches import (
        _compress_weighted,
        quantile_sketch,
    )

    # _compress_weighted: weights conserved, size bounded, max-value
    # representative biases ranks upward by at most one segment
    rng = np.random.default_rng(2)
    v = np.sort(rng.normal(size=5000))
    w = np.ones(5000, np.int64)
    cv, cw = _compress_weighted(v, w, 100)
    assert len(cv) <= 100 and cw.sum() == 5000
    assert (np.diff(cv) >= 0).all()
    # every compressed point's weighted rank is within one segment
    # (~n/budget) of its true rank
    cum = np.cumsum(cw)
    true_rank = np.searchsorted(v, cv, side="right")
    assert (np.abs(cum - true_rank) <= 5000 / 100 + 1).all()

    # end-to-end: adversarial skew (heavy ties + heavy tail)
    x = np.concatenate(
        [np.zeros(20000), rng.exponential(100, 20000), rng.normal(-50, 1, 20000)]
    )
    ds = ray.data.from_items([{"v": float(t)} for t in x]).repartition(13)
    out = quantile_sketch(ds, "v", delta=0.01).to_pandas()
    assert (out["rank_err_ok"] == 1).all()
    assert (out["n"] == len(x)).all()
