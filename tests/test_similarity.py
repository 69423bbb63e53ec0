import numpy as np

import ray.data

from distributed_pagerank_ray.functions.similarity import (
    embedding_dup_pairs,
    knn_brute_force,
    knn_lsh,
)


def _emb_ds(n=200, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    items = [{"vec_id": i, "embedding": m[i].tolist()} for i in range(n)]
    return ray.data.from_items(items), m


def _brute(m, q, k):
    mq = m.astype(np.float64)
    mn = mq / np.linalg.norm(mq, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = mn @ qn.T
    out = {}
    for j in range(q.shape[0]):
        order = sorted(range(len(m)), key=lambda i: (-sims[i, j], i))[:k]
        out[j] = order
    return out


def test_knn_brute_force_exact():
    ds, m = _emb_ds()
    q = m[:3].astype(np.float64)
    res = knn_brute_force(ds, q, k=5).take_all()
    want = _brute(m, q, 5)
    for j in range(3):
        got = [r["neighbor_id"] for r in sorted((x for x in res if x["query_id"] == j), key=lambda r: r["rnk"])]
        assert got == want[j]
        # self is its own nearest neighbor
        assert got[0] == j


def test_knn_lsh_recall():
    ds, m = _emb_ds(n=500)
    q = m[:5].astype(np.float64)
    res = knn_lsh(ds, q, k=5, n_bits=4).take_all()
    want = _brute(m, q, 5)
    # approximate: self must be found (same bucket by construction),
    # and >=40% overlap with exact top-5 on average
    overlap = 0
    for j in range(5):
        got = [r["neighbor_id"] for r in res if r["query_id"] == j]
        assert j in got
        overlap += len(set(got) & set(want[j]))
    assert overlap / (5 * 5) >= 0.4


def test_embedding_dup_pairs():
    rng = np.random.default_rng(7)
    m = rng.standard_normal((50, 8))
    m[10] = m[3] + rng.standard_normal(8) * 1e-3  # planted near-dup
    items = [{"vec_id": i, "embedding": m[i].astype(np.float32).tolist()} for i in range(50)]
    ds = ray.data.from_items(items)
    got = embedding_dup_pairs(ds, threshold=0.99).take_all()
    pairs = {(r["a"], r["b"]) for r in got}
    assert (3, 10) in pairs
    for r in got:
        assert r["sim"] >= 0.99


def test_embedding_dup_pairs_hot_bucket_bound():
    # 800 identical vectors collapse into one bucket in every band;
    # with a cap the clique is dropped, a planted near-dup pair in a
    # cold bucket still verifies
    rng = np.random.default_rng(3)
    clone = rng.standard_normal(8)
    other = rng.standard_normal(8)
    near = other + rng.standard_normal(8) * 1e-3
    items = [{"vec_id": i, "embedding": clone.tolist()} for i in range(800)]
    items += [
        {"vec_id": 900, "embedding": other.tolist()},
        {"vec_id": 901, "embedding": near.tolist()},
    ]
    ds = ray.data.from_items(items)
    got = embedding_dup_pairs(ds, threshold=0.99, max_bucket=32).take_all()
    pairs = {(r["a"], r["b"]) for r in got}
    assert (900, 901) in pairs
    assert not any(a < 800 and b < 800 for a, b in pairs)


def test_on_driver_embeddings_table():
    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = ds.take(2)
    q = np.array([r["embedding"] for r in first], dtype=np.float64)
    res = knn_brute_force(ds, q, k=3, id_col="vec_id", emb_col="embedding").take_all()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    for j, rows in by_q.items():
        rows.sort(key=lambda r: r["rnk"])
        assert rows[0]["neighbor_id"] == first[j]["vec_id"]
        assert abs(rows[0]["sim"] - 1.0) < 1e-9


def test_random_sign_projection():
    from distributed_pagerank_ray.functions.similarity import (
        random_sign_projection,
        sign_matrix,
    )

    # sign matrix: ±1 only, full rank, decorrelated columns
    S = sign_matrix(64, 8)
    assert set(np.unique(S)) == {-1.0, 1.0}
    assert np.linalg.matrix_rank(S) == 8
    off = np.abs(np.corrcoef(S.T) - np.eye(8)).max()
    assert off < 0.5, off

    rng = np.random.RandomState(7)
    E = rng.randn(200, 64)
    items = [
        {"vec_id": i, "embedding": E[i].astype(np.float32).tolist()}
        for i in range(len(E))
    ]
    ds = ray.data.from_items(items)
    out = (
        random_sign_projection(ds, k=8)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    P = out[[f"p{c}" for c in range(8)]].to_numpy()
    # JL property: projection preserves squared norms in expectation
    ratio = (P**2).sum() / (E.astype(np.float32).astype(np.float64) ** 2).sum()
    assert 0.8 < ratio < 1.2, ratio
    # deterministic: a re-run is bit-identical
    out2 = (
        random_sign_projection(ds, k=8)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(P, out2[[f"p{c}" for c in range(8)]].to_numpy())


def test_pca_project_matches_numpy():
    import numpy as np
    import pyarrow as pa

    import ray.data

    from distributed_pagerank_ray.functions.similarity import pca_project

    rng = np.random.default_rng(9)
    # anisotropic cloud so the top components are unambiguous
    E = rng.normal(size=(300, 8)) * np.array([10, 5, 1, 1, 0.5, 0.3, 0.2, 0.1])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(300, dtype=np.int64)),
                "embedding": pa.array(list(E.astype(np.float32))),
            }
        )
    ).repartition(4)
    got = pca_project(ds, id_col="vec_id", k=3).to_pandas().sort_values("vec_id")

    X = E.astype(np.float32).astype(np.float64)
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    W = v[:, np.argsort(w)[::-1][:3]]
    flip = np.sign(W[np.abs(W).argmax(axis=0), np.arange(3)])
    P = (X - mean[None, :]) @ (W * flip[None, :])
    assert np.allclose(got[["pc1", "pc2", "pc3"]].to_numpy(), P, atol=1e-5)
    # variance ordering: pc1 spread >= pc2 >= pc3
    sd = got[["pc1", "pc2", "pc3"]].std().to_numpy()
    assert sd[0] > sd[1] > sd[2]


def test_centroid_silhouette_brute_force(ray_session):
    from distributed_pagerank_ray.functions.similarity import centroid_silhouette

    rng = np.random.default_rng(9)
    n, d, L = 120, 6, 4
    lab = rng.integers(0, L, n)
    X = rng.normal(size=(n, d)) + lab[:, None] * 2.0  # separated clusters
    ds = ray.data.from_items(
        [
            {"label": int(l), "embedding": [float(x) for x in row]}
            for l, row in zip(lab, X)
        ]
    ).repartition(3)
    got = centroid_silhouette(ds).to_pandas().sort_values("label").reset_index(drop=True)
    C = np.stack([X[lab == l].mean(axis=0) for l in range(L)])
    D = np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1))
    a = D[np.arange(n), lab]
    D[np.arange(n), lab] = np.inf
    b = D.min(axis=1)
    s = (b - a) / np.maximum(a, b)
    for l in range(L):
        row = got[got["label"] == l].iloc[0]
        assert row["n"] == (lab == l).sum()
        assert abs(row["mean_sil"] - round(s[lab == l].mean(), 6)) < 2e-6
    # separated clusters must score well
    assert (got["mean_sil"] > 0.3).all()
