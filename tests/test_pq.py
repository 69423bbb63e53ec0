"""Product quantization: the ADC≡reconstruction identity, exactness
in the degenerate full-codebook regime, and encode determinism."""

import numpy as np
import pyarrow as pa

import ray.data

from distributed_pagerank_ray.functions.pq import knn_pq_adc, pq_encode, pq_train


def _emb_ds(n=64, d=8, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d))
    return (
        ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array(list(m), pa.list_(pa.float64())),
                }
            )
        ),
        m,
    )


def test_pq_adc_identity_and_self_rank():
    ds, m = _emb_ds()
    out = knn_pq_adc(ds, n_queries=3, top_k=5, m_subspaces=4, k=8).to_pandas()
    assert out["adc_ok"].all()
    assert len(out) == 15
    # each query's own vector reconstructs closest to itself here
    for q in range(3):
        sub = out[out["query_id"] == q]
        assert sub[sub["rnk"] == 1]["neighbor_id"].iloc[0] == q


def test_pq_encode_deterministic_and_reconstruction_bound():
    ds, m = _emb_ds()
    books = pq_train(ds, m_subspaces=2, k=8)
    a = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    b = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    assert (a["code"].to_numpy() == b["code"].to_numpy()).all()
    # each vector's reconstruction is the NEAREST centroid per
    # subspace: reconstruction error <= error of any other code
    codes = np.stack([np.frombuffer(c, np.uint8) for c in a["code"]])
    M, k, sub = books.shape
    for mi in range(M):
        s = m[:, mi * sub : (mi + 1) * sub]
        d2 = ((s[:, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
        assert (codes[:, mi] == d2.argmin(axis=1)).all()
