"""Product quantization (PQ) — the memory-bounded ANN scale path.

Beyond the reference's scope (lioia/distributed-pagerank implements
only PageRank); completes the similarity-search ladder
(brute → hyperplane-LSH → IVF → PQ): a (n, d) float corpus compresses
to n × M bytes (M subspace codes), and query scanning touches ONLY
codes + a per-query lookup table — the layout that fits a billion
vectors where raw floats cannot.

- Train: split dims into M contiguous subspaces, per-subspace k-means
  (functions/kmeans.py — mergeable partials, deterministic k-means++
  init) → an (M, k, d/M) codebook tensor, driver-held (M·k·d floats,
  tiny) and broadcast via ``ray.put``.
- Encode: one vectorized map — per subspace, argmin squared-L2 to the
  k centroids; codes packed as fixed-width binary (M bytes/vector for
  k ≤ 256).
- ADC query: per query, an (M, k) lookup table of subspace distances;
  a code scan sums M table entries per vector (pure take+sum, no
  float recompute per pair), per-batch top-k partials merged exactly
  like knn_brute_force.

EXACTNESS property used as the self-gate: with contiguous subspaces,
ADC distance ≡ ||q − reconstruct(code)||² to the decoded vector
(the subspace sums partition the dimensions), so the pipeline can
assert its own table-driven scan against a direct reconstruction
distance — a broken LUT, packing, or codebook order trips it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .similarity import _batch_matrix

_I64 = pa.int64()


def pq_train(
    ds: "ray.data.Dataset",
    m_subspaces: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """(M, k, d/M) float64 codebooks; deterministic."""
    from .kmeans import kmeans_fit

    dim = len(ds.take(1)[0][emb_col])
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
    books = []
    for mi in range(m_subspaces):
        lo = mi * sub

        def proj(t: pa.Table, _lo=lo) -> pa.Table:
            m = _batch_matrix(t, emb_col)[:, _lo : _lo + sub]
            return pa.table(
                {
                    id_col: t.column(id_col),
                    emb_col: pa.array(list(m), pa.list_(pa.float64())),
                }
            )

        books.append(
            kmeans_fit(
                ds.map_batches(proj, batch_format="pyarrow"),
                k=k,
                id_col=id_col,
                emb_col=emb_col,
                n_iters=n_iters,
                seed=seed + mi,
            )
        )
    return np.stack(books)


def pq_encode(
    ds: "ray.data.Dataset",
    books: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """(id, code) with code = M uint8 subspace indices as fixed-width
    binary."""
    M, k, sub = books.shape
    assert k <= 256
    b_ref = ray.put(books)

    def enc(t: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        m = _batch_matrix(t, emb_col)
        codes = np.empty((len(m), M), np.uint8)
        for mi in range(M):
            s = m[:, mi * sub : (mi + 1) * sub]
            d2 = ((s[:, None, :] - b[mi][None, :, :]) ** 2).sum(axis=2)
            codes[:, mi] = d2.argmin(axis=1)
        return pa.table(
            {
                id_col: t.column(id_col).cast(_I64),
                "code": pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(M), len(m), [None, pa.py_buffer(codes.tobytes())]
                ),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def knn_pq_adc(
    ds: "ray.data.Dataset",
    n_queries: int = 5,
    top_k: int = 10,
    m_subspaces: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    self_check: bool = True,
) -> "ray.data.Dataset":
    """(query_id, neighbor_id, rnk, adc_ok) — top-k by ADC squared-L2
    for the first ``n_queries`` ids (mirrors e_knn's query choice).
    ``adc_ok`` asserts the LUT scan against direct reconstruction
    distances for every reported pair (the PQ exactness identity)."""
    import pandas as pd

    books = pq_train(ds, m_subspaces=m_subspaces, k=k, id_col=id_col, emb_col=emb_col)
    M, _, sub = books.shape
    codes = pq_encode(ds, books, id_col=id_col, emb_col=emb_col).materialize()

    qrows = ds.sort(id_col).limit(n_queries).take_all()
    qids = np.array([r[id_col] for r in qrows], np.int64)
    qmat = np.array([r[emb_col] for r in qrows], np.float64)
    # per-query (M, k) subspace-distance LUTs
    luts = np.stack(
        [
            np.stack(
                [
                    ((books[mi] - qmat[qi, mi * sub : (mi + 1) * sub][None, :]) ** 2).sum(
                        axis=1
                    )
                    for mi in range(M)
                ]
            )
            for qi in range(len(qids))
        ]
    )  # (Q, M, k)
    lut_ref = ray.put(luts)
    b_ref = ray.put(books)

    def scan(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        raw = np.frombuffer(b"".join(t.column("code").to_pylist()), np.uint8).reshape(
            len(ids), M
        )
        out: dict = {"query_id": [], "neighbor_id": [], "adc": []}
        for qi in range(len(qids)):
            d = np.zeros(len(ids), np.float64)
            for mi in range(M):
                d += lut[qi, mi][raw[:, mi]]
            top = np.argsort(d, kind="stable")[: top_k]  # per-batch partial
            out["query_id"].extend([int(qids[qi])] * len(top))
            out["neighbor_id"].extend(ids[top].tolist())
            out["adc"].extend(d[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], _I64),
                "neighbor_id": pa.array(out["neighbor_id"], _I64),
                "adc": pa.array(out["adc"], pa.float64()),
            }
        )

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["adc", "neighbor_id"], kind="stable").head(top_k)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "adc", "rnk"]]

    merged = (
        codes.map_batches(scan, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )

    adc_ok = True
    if self_check:
        # exactness identity: ADC == ||q - reconstruct(code)||^2,
        # checked for the <= Q*top_k REPORTED pairs only (a broadcast
        # filter fetches just those codes — never the full code table)
        needed = np.sort(merged["neighbor_id"].unique().astype(np.int64))

        def pick(t: pa.Table) -> pa.Table:
            ids_ = t.column(id_col).to_numpy(zero_copy_only=False)
            m = np.isin(ids_, needed)
            return t.filter(pa.array(m))

        code_map = {
            r[id_col]: np.frombuffer(r["code"], np.uint8)
            for r in codes.map_batches(pick, batch_format="pyarrow").take_all()
        }
        for _, row in merged.iterrows():
            c = code_map[int(row["neighbor_id"])]
            recon = np.concatenate([books[mi, c[mi]] for mi in range(M)])
            qv = qmat[int(np.where(qids == int(row["query_id"]))[0][0])]
            if not np.isclose(((qv - recon) ** 2).sum(), row["adc"], atol=1e-8):
                adc_ok = False
    merged["adc_ok"] = adc_ok
    merged["adc"] = np.round(merged["adc"].to_numpy(), 6)
    return ray.data.from_pandas(
        merged[["query_id", "neighbor_id", "rnk", "adc", "adc_ok"]]
    )
