"""Distributed k-means + IVF ANN: clustering quality on separable
blobs, determinism, and IVF recall vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from distributed_pagerank_ray.functions.kmeans import kmeans_assign, kmeans_fit, knn_ivf
from distributed_pagerank_ray.functions.similarity import knn_brute_force


def _blobs(n=1200, k=6, d=16, seed=9, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)) * 3
    labels = rng.integers(0, k, n)
    pts = centers[labels] + rng.standard_normal((n, d)) * spread
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(pts.astype(np.float32))),
            }
        )
    )
    return ds, labels, pts


def test_kmeans_recovers_separable_blobs():
    ds, labels, _ = _blobs()
    cents = kmeans_fit(ds, k=6, n_iters=25)
    assign = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    df = pd.DataFrame({"cluster": assign["cluster"].to_numpy(), "label": labels})
    # purity: each found cluster is dominated by one true label
    purity = df.groupby("cluster")["label"].agg(lambda s: s.value_counts().iloc[0]).sum() / len(df)
    assert purity > 0.98, purity


def test_kmeans_deterministic():
    ds, _, _ = _blobs(n=400)
    c1 = kmeans_fit(ds, k=4, n_iters=10)
    c2 = kmeans_fit(ds, k=4, n_iters=10)
    np.testing.assert_array_equal(c1, c2)


def test_ivf_fullprobe_equals_brute_force():
    ds, _, pts = _blobs(n=600, k=5)
    q = pts[:4]
    exact = knn_brute_force(ds, q, k=8).to_pandas().sort_values(["query_id", "rnk"])
    ivf = knn_ivf(ds, q, k=8, n_clusters=5, nprobe=5).to_pandas().sort_values(["query_id", "rnk"])
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True)[["query_id", "neighbor_id", "rnk"]],
        ivf.reset_index(drop=True)[["query_id", "neighbor_id", "rnk"]],
    )


def test_ivf_small_nprobe_recall():
    ds, _, pts = _blobs(n=1200, k=6)
    q = pts[10:20]
    exact = knn_brute_force(ds, q, k=10).to_pandas()
    approx = knn_ivf(ds, q, k=10, n_clusters=6, nprobe=2).to_pandas()
    recalls = []
    for j in exact["query_id"].unique():
        e = set(exact[exact.query_id == j]["neighbor_id"])
        a = set(approx[approx.query_id == j]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    # blob-separable data: the query's own cluster holds its neighbors
    assert np.mean(recalls) >= 0.95, recalls
