"""Distributed k-means (Lloyd) and IVF approximate nearest-neighbor
search built on it.

Scale shape (the mergeable-partials pattern, like the HLL sketch and
the degree combiner):

- fit: per-batch assignment emits k (sum-vector, count) partial rows —
  k × (d+1) floats per BLOCK, independent of row count — merged into
  new centroids; the driver holds only centroids (k × d) and partials
  (blocks × k rows, coarse blobs).
- init: deterministic — the sample is the ``m`` rows with the smallest
  multiplicative id-hash (reproducible across runs/engines, see
  functions/sampling.py), then k-means++ with a fixed-seed RNG on that
  bounded sample.
- IVF search: vectors are bucketed by nearest centroid (one
  map_batches pass); a query probes only its ``nprobe`` nearest
  centroids' buckets. ``nprobe = n_clusters`` degenerates to exact
  brute force (used by the driver gate to hash-match the exact-knn SQL
  oracle); small ``nprobe`` is the approximate scale path (recall
  bound tested in pytest).

The reference engine has no ML operators (SURVEY §2.5); this is
new-engine scope for the training-data pipeline (embedding clustering,
ANN dedup/search).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..util import ensure_schema
from .sampling import _hash_ids
from .similarity import _batch_matrix, _normalize, _topk_det

_I64 = pa.int64()
_F64 = pa.float64()


def _sample_matrix(
    ds: "ray.data.Dataset", id_col: str, emb_col: str, m: int
) -> np.ndarray:
    """The m rows with the smallest id-hash, as a (m, d) matrix —
    deterministic and order-independent.

    Scale bound: a hash threshold of ~8m/n (n from the metadata-cheap
    ``count()``) prefilters INSIDE each batch, so the expected gather
    is O(m) rows total — not O(blocks × m); each batch additionally
    caps its contribution at its m smallest. With 8× oversampling the
    probability of the threshold missing part of the true smallest-m
    is negligible (Chernoff), and correctness degrades gracefully: a
    short sample still seeds k-means++ deterministically."""
    from .sampling import _MOD

    n = max(1, ds.count())
    cut = int(min(_MOD, np.ceil(_MOD * min(1.0, 8.0 * m / n))))

    def local(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = _hash_ids(ids)
        under = np.nonzero(h < cut)[0]
        keep = under[np.argsort(h[under], kind="stable")[:m]]
        mat = _batch_matrix(t, emb_col)[keep] if len(keep) else np.zeros((0, 0))
        return pa.table(
            {
                "h": pa.array(h[keep]),
                "emb": pa.array([row.tobytes() for row in mat], pa.binary()),
            }
        )

    parts = []
    for b in ds.map_batches(local, batch_format="pyarrow").iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        if len(b):
            parts.append(
                (
                    b.column("h").to_numpy(zero_copy_only=False),
                    np.stack([np.frombuffer(x, dtype=np.float64) for x in b.column("emb").to_pylist()]),
                )
            )
    if not parts:
        raise ValueError("kmeans_fit: empty input dataset")
    h = np.concatenate([p[0] for p in parts])
    mat = np.concatenate([p[1] for p in parts])
    keep = np.argsort(h, kind="stable")[:m]
    return mat[keep]


def _kmeanspp_init(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cents = [sample[int(rng.integers(len(sample)))]]
    d2 = np.full(len(sample), np.inf)
    for _ in range(k - 1):
        d2 = np.minimum(d2, ((sample - cents[-1]) ** 2).sum(axis=1))
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(sample[int(rng.choice(len(sample), p=p))])
    return np.stack(cents)


def kmeans_fit(
    ds: "ray.data.Dataset",
    k: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_iters: int = 20,
    tol: float = 1e-6,
    seed: int = 42,
    sample_size: int = 2048,
) -> np.ndarray:
    """Lloyd iterations with mergeable per-batch partials. Returns the
    (k, d) centroid matrix. Deterministic for fixed inputs/seed."""
    sample = _sample_matrix(ds, id_col, emb_col, max(sample_size, k * 8))
    cents = _kmeanspp_init(sample, k, seed)
    d = cents.shape[1]
    ds = ds.materialize()  # consumed once per iteration

    for _ in range(n_iters):
        c_ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            m = _batch_matrix(t, emb_col)
            # nearest centroid by squared L2, vectorized
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "c": pa.array(np.arange(len(c), dtype=np.int64)),
                    "sum": pa.array([row.tobytes() for row in sums], pa.binary()),
                    "n": pa.array(counts),
                }
            )

        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            if not len(b):
                continue
            ci = b.column("c").to_numpy(zero_copy_only=False)
            ni = b.column("n").to_numpy(zero_copy_only=False)
            si = np.stack([np.frombuffer(x, dtype=np.float64) for x in b.column("sum").to_pylist()])
            np.add.at(sums, ci, si)
            np.add.at(counts, ci, ni)
        nz = counts > 0
        new = cents.copy()
        new[nz] = sums[nz] / counts[nz, None]
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift <= tol:
            break
    return cents


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """(id, cluster) assignment — one stateless map_batches pass."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _batch_matrix(t, emb_col)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table(
            {
                id_col: t.column(id_col).cast(_I64),
                "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def knn_ivf(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
) -> "ray.data.Dataset":
    """IVF cosine top-k: coarse-quantize with k-means, probe only the
    ``nprobe`` nearest clusters per query. Output schema matches
    knn_brute_force: (query_id, neighbor_id, sim, rnk), deterministic
    (sim desc, neighbor_id asc)."""
    cents = kmeans_fit(ds, k=n_clusters, id_col=id_col, emb_col=emb_col, seed=seed)
    q = np.asarray(queries, dtype=np.float64)
    qn = _normalize(q)
    qd2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd2, axis=1, kind="stable")[:, :nprobe]  # (nq, nprobe)
    state = ray.put((qn, probes, cents))
    kk = k

    def score(t: pa.Table) -> pa.Table:
        qn_, probes_, c = ray.get(state)
        if len(t) == 0:
            return pa.table(
                {"query_id": pa.array([], _I64), "neighbor_id": pa.array([], _I64), "sim": pa.array([], _F64)}
            )
        m = _batch_matrix(t, emb_col)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        clus = d2.argmin(axis=1)
        mn = _normalize(m)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        out_q: list[int] = []
        out_id: list[int] = []
        out_s: list[float] = []
        for j in range(len(qn_)):
            mask = np.isin(clus, probes_[j])
            if not mask.any():
                continue
            s = mn[mask] @ qn_[j]
            sub = ids[mask]
            idx = _topk_det(s, sub, kk)
            out_q.extend([j] * len(idx))
            out_id.extend(sub[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, _I64),
                "neighbor_id": pa.array(out_id, _I64),
                "sim": pa.array(out_s, _F64),
            }
        )

    cands = ds.map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(kk)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "sim", "rnk"]]

    return (
        cands.groupby("query_id")
        .map_groups(merge, batch_format="pandas")
        .map_batches(
            ensure_schema({"query_id": _I64, "neighbor_id": _I64, "sim": _F64, "rnk": _I64}),
            batch_format="pyarrow",
        )
    )
