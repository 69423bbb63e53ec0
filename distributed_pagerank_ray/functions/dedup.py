"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (per the guide's sketch patterns):
- exact: content-hash per batch → one groupby over (hash) — partials
  per batch keep the shuffle narrow.
- n-gram Jaccard (exact): explode (shingle_hash, doc) → shingle-keyed
  co-occurrence counts → pair-keyed sum → filter by threshold. A pair
  can only reach jaccard>0 by sharing a shingle, so candidate
  generation is lossless. Optional ``max_df`` drops ubiquitous
  shingles (documented approximation for web-scale stopword shingles).
- MinHash+LSH: shingle→64-perm minhash per doc (vectorized affine
  hashes) → band rows → groupby(band, band_hash) buckets → candidate
  pairs → exact-Jaccard verification of candidates only.
- SimHash: 64-bit weighted-token hash, banded into 4×16-bit chunks for
  candidate generation, Hamming-verified.

All hashing is seeded/deterministic (blake2b, fixed rng seed) so runs
reproduce bit-for-bit.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min, Sum

from ..util import compact_for_join, ensure_schema

_I64 = pa.int64()
_MERSENNE = np.uint64((1 << 61) - 1)


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (uint64) of a document."""
    t = text or ""
    if len(t) < k:
        grams: Iterable[str] = [t] if t else []
    else:
        grams = (t[i : i + k] for i in range(len(t) - k + 1))
    arr = np.fromiter((_stable_hash64(g) for g in grams), dtype=np.uint64)
    return np.unique(arr)


def word_shingles(text: str, n: int = 3) -> np.ndarray:
    """Distinct word n-gram hashes. Words = whitespace-split of the
    trimmed text; a doc with fewer than n words yields one shingle of
    all its words (and an empty doc yields none) — mirrored exactly by
    the SQL oracle. Word shingles keep bucket sizes small on vocab-
    limited corpora where char shingles collide ubiquitously."""
    words = (text or "").split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    if len(words) < n:
        grams: Iterable[str] = [" ".join(words)]
    else:
        grams = (" ".join(words[i : i + n]) for i in range(len(words) - n + 1))
    arr = np.fromiter((_stable_hash64(g) for g in grams), dtype=np.uint64)
    return np.unique(arr)


def shingles(text: str, k: int, mode: str) -> np.ndarray:
    return char_shingles(text, k) if mode == "char" else word_shingles(text, k)


# ---------------------------------------------------------------- exact

def exact_dedup_groups(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """One row per distinct content: (doc_id = min id, n_dups).

    Hash-partitioned dedup: md5 per batch, groupby(hash) with Min/Count
    — the reference's implicit map-insert edge dedup (graph.go:77)
    generalized to arbitrary content.
    """

    def h(batch: pa.Table) -> pa.Table:
        hh = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table({"h": pa.array(hh, pa.string()), id_col: batch.column(id_col)})

    grouped = (
        ds.map_batches(h, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_dups"))
    )
    return grouped.map_batches(
        ensure_schema({id_col: _I64, "n_dups": _I64}), batch_format="pyarrow"
    )


# ---------------------------------------------------------------- n-gram jaccard (exact)

def _shingle_rows(ds, id_col, text_col, k, mode="char"):
    def explode(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        sh: list[int] = []
        for did, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            s = shingles(t, k, mode)
            ids.extend([did] * len(s))
            sh.extend(s.astype(np.int64).tolist())
        return pa.table({"sh": pa.array(sh, _I64), "doc": pa.array(ids, _I64)})

    return ds.map_batches(explode, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.8,
    num_partitions: int = 8,
    max_df: int | None = None,
    mode: str = "char",
) -> "ray.data.Dataset":
    """Exact pairs (a, b) with a<b and k-gram Jaccard >= threshold.

    Columns: (a, b, inter, size_a, size_b) — jaccard = inter /
    (size_a + size_b - inter); integers only so oracle comparison is
    exact. ``max_df=None`` keeps every shingle (exact result).
    ``mode``: 'char' (k chars) or 'word' (k-word n-grams).
    """
    rows = _shingle_rows(ds, id_col, text_col, k, mode).materialize()

    # per-doc distinct shingle counts
    sizes = (
        rows.groupby("doc")
        .aggregate(Count(alias_name="size"))
        .map_batches(ensure_schema({"doc": _I64, "size": _I64}), batch_format="pyarrow")
    )

    # pairs per shingle bucket (optionally drop ubiquitous shingles)
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(g["doc"].to_numpy(dtype=np.int64))
        if max_df is not None and len(docs) > max_df:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        if len(docs) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(docs), k=1)
        return pd.DataFrame({"a": docs[ia], "b": docs[ib]})

    inter = (
        rows.groupby("sh")
        .map_groups(pairs, batch_format="pandas")
        .map_batches(ensure_schema({"a": _I64, "b": _I64}), batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column("one", pa.array(np.ones(len(t), dtype=np.int64))),
            batch_format="pyarrow",
        )
        .groupby(["a", "b"])
        .aggregate(Sum("one", alias_name="inter"))
        .map_batches(ensure_schema({"a": _I64, "b": _I64, "inter": _I64}), batch_format="pyarrow")
    )

    inter = compact_for_join(inter, num_partitions)
    sizes = compact_for_join(sizes, num_partitions)
    j1 = inter.join(sizes, join_type="inner", num_partitions=num_partitions, on=("a",), right_on=("doc",))

    def _p1(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names:
            return pa.table(
                {c: pa.array([], _I64) for c in ["a", "b", "inter", "size_a"]}
            )
        return pa.table(
            {"a": t.column("a"), "b": t.column("b"), "inter": t.column("inter"), "size_a": t.column("size")}
        )

    j1 = compact_for_join(j1.map_batches(_p1, batch_format="pyarrow"), num_partitions)
    j2 = j1.join(sizes, join_type="inner", num_partitions=num_partitions, on=("b",), right_on=("doc",))

    thr = threshold

    def _final(t: pa.Table) -> pa.Table:
        cols = ["a", "b", "inter", "size_a", "size_b"]
        if "a" not in t.column_names:
            return pa.table({c: pa.array([], _I64) for c in cols})
        inter_v = t.column("inter").to_numpy(zero_copy_only=False).astype(np.float64)
        sa = t.column("size_a").to_numpy(zero_copy_only=False).astype(np.float64)
        sb = t.column("size").to_numpy(zero_copy_only=False).astype(np.float64)
        jac = inter_v / (sa + sb - inter_v)
        keep = jac >= thr
        return pa.table(
            {
                "a": t.column("a").filter(pa.array(keep)),
                "b": t.column("b").filter(pa.array(keep)),
                "inter": t.column("inter").filter(pa.array(keep)),
                "size_a": t.column("size_a").filter(pa.array(keep)),
                "size_b": pa.array(sb[keep].astype(np.int64)),
            }
        )

    return j2.map_batches(_final, batch_format="pyarrow")


# ---------------------------------------------------------------- minhash + lsh

class MinHasher:
    """Stateful minhash stage (actor pool): permutation coefficients are
    generated once per actor from a fixed seed (so every actor agrees)."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 42, id_col: str = "doc_id", text_col: str = "text", mode: str = "char"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.k = k
        self.id_col = id_col
        self.text_col = text_col
        self.mode = mode

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.k, self.mode)
        if len(sh) == 0:
            return np.zeros(len(self.a), dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return m.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        sigs = [self.signature(t) for t in batch.column(self.text_col).to_pylist()]
        return pa.table(
            {
                "doc": pa.array(ids, _I64),
                "sig": pa.array([s.astype(np.int64).tobytes() for s in sigs], pa.binary()),
            }
        )


def minhash_lsh_candidates(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
    concurrency: int = 4,
    mode: str = "char",
) -> "ray.data.Dataset":
    """Candidate near-dup pairs (a, b), a<b, distinct — docs sharing at
    least one LSH band bucket. bands=16 over 64 perms (r=4) targets
    jaccard ≳ 0.5-0.6 recall."""
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs = ds.map_batches(
        MinHasher(num_perm, k, seed, id_col, text_col, mode),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=1024,
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        docs: list[int] = []
        band_ids: list[int] = []
        band_hash: list[int] = []
        for did, sig in zip(batch.column("doc").to_pylist(), batch.column("sig").to_pylist()):
            s = np.frombuffer(sig, dtype=np.int64)
            for bi in range(bands):
                h = hashlib.blake2b(s[bi * r : (bi + 1) * r].tobytes(), digest_size=8).digest()
                docs.append(did)
                band_ids.append(bi)
                band_hash.append(int.from_bytes(h, "little") >> 1)
        return pa.table(
            {
                "doc": pa.array(docs, _I64),
                "band": pa.array(band_ids, _I64),
                "bh": pa.array(band_hash, _I64),
            }
        )

    buckets = sigs.map_batches(band_rows, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.unique(g["doc"].to_numpy(dtype=np.int64))
        if len(docs) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(docs), k=1)
        return pd.DataFrame({"a": docs[ia], "b": docs[ib]})

    cand = (
        buckets.groupby(["band", "bh"])
        .map_groups(pairs, batch_format="pandas")
        .map_batches(ensure_schema({"a": _I64, "b": _I64}), batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(ensure_schema({"a": _I64, "b": _I64}), batch_format="pyarrow")
    )
    return cand


def minhash_lsh_dedup_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_partitions: int = 8,
    **lsh_kw,
) -> "ray.data.Dataset":
    """LSH candidates verified by exact Jaccard >= threshold.

    Returns (a, b, inter, size_a, size_b). Verification joins the
    candidate pairs back to the shingle-set sizes / intersections —
    computed only for candidate docs, not all pairs.
    """
    k = lsh_kw.get("k", 5)
    mode = lsh_kw.get("mode", "char")
    cand = compact_for_join(
        minhash_lsh_candidates(ds, id_col, text_col, **lsh_kw), num_partitions
    )
    if cand.count() == 0:
        return cand

    # restrict shingle rows to candidate docs via semi-join (broadcastable
    # doc set would be the scale path; here an inner join keeps it exact)
    rows = _shingle_rows(ds, id_col, text_col, k, mode).materialize()
    sizes = (
        rows.groupby("doc")
        .aggregate(Count(alias_name="size"))
        .map_batches(ensure_schema({"doc": _I64, "size": _I64}), batch_format="pyarrow")
    )
    sizes = compact_for_join(sizes, num_partitions)

    j1 = cand.join(sizes, join_type="inner", num_partitions=num_partitions, on=("a",), right_on=("doc",))

    def _p1(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names:
            return pa.table({c: pa.array([], _I64) for c in ["a", "b", "size_a"]})
        return pa.table({"a": t.column("a"), "b": t.column("b"), "size_a": t.column("size")})

    j1 = compact_for_join(j1.map_batches(_p1, batch_format="pyarrow"), num_partitions)
    j2 = j1.join(sizes, join_type="inner", num_partitions=num_partitions, on=("b",), right_on=("doc",))

    def _p2(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names:
            return pa.table({c: pa.array([], _I64) for c in ["a", "b", "size_a", "size_b"]})
        return pa.table(
            {"a": t.column("a"), "b": t.column("b"), "size_a": t.column("size_a"), "size_b": t.column("size")}
        )

    pairs_sized = compact_for_join(j2.map_batches(_p2, batch_format="pyarrow"), num_partitions)

    # intersection counts for candidate pairs only: shingle-bucket pairs
    # filtered to the candidate set via join
    inter_all = (
        rows.groupby("sh")
        .map_groups(
            lambda g: (
                lambda docs: pd.DataFrame(
                    {
                        "a": docs[np.triu_indices(len(docs), k=1)[0]],
                        "b": docs[np.triu_indices(len(docs), k=1)[1]],
                    }
                )
                if len(docs) >= 2
                else pd.DataFrame({"a": [], "b": []}).astype(np.int64)
            )(np.sort(np.unique(g["doc"].to_numpy(dtype=np.int64)))),
            batch_format="pandas",
        )
        .map_batches(ensure_schema({"a": _I64, "b": _I64}), batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column("one", pa.array(np.ones(len(t), dtype=np.int64))),
            batch_format="pyarrow",
        )
        .groupby(["a", "b"])
        .aggregate(Sum("one", alias_name="inter"))
        .map_batches(ensure_schema({"a": _I64, "b": _I64, "inter": _I64}), batch_format="pyarrow")
    )
    inter_all = compact_for_join(inter_all, num_partitions)

    # key candidates and intersections on a packed pair key for one join
    def packkey(t: pa.Table, keep_cols) -> pa.Table:
        if "a" not in t.column_names:
            return pa.table(
                {"pk": pa.array([], _I64), **{c: pa.array([], _I64) for c in keep_cols}}
            )
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        pk = (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)  # ids < 2**31
        cols = {"pk": pa.array(pk)}
        for c in keep_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    left = compact_for_join(
        pairs_sized.map_batches(lambda t: packkey(t, ["a", "b", "size_a", "size_b"]), batch_format="pyarrow"),
        num_partitions,
    )
    right = compact_for_join(
        inter_all.map_batches(lambda t: packkey(t, ["inter"]), batch_format="pyarrow"),
        num_partitions,
    )
    joined = left.join(
        right, join_type="inner", num_partitions=num_partitions, on=("pk",), right_on=("pk",)
    )

    thr = threshold

    def _final(t: pa.Table) -> pa.Table:
        cols = ["a", "b", "inter", "size_a", "size_b"]
        if "a" not in t.column_names:
            return pa.table({c: pa.array([], _I64) for c in cols})
        inter_v = t.column("inter").to_numpy(zero_copy_only=False).astype(np.float64)
        sa = t.column("size_a").to_numpy(zero_copy_only=False).astype(np.float64)
        sb = t.column("size_b").to_numpy(zero_copy_only=False).astype(np.float64)
        jac = inter_v / (sa + sb - inter_v)
        keep = pa.array(jac >= thr)
        return pa.table({c: t.column(c).filter(keep) for c in cols})

    return joined.map_batches(_final, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash

class SimHasher:
    """64-bit SimHash over word tokens (weight = term frequency)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        import re

        self.word = re.compile(r"\w+")
        self.id_col = id_col
        self.text_col = text_col

    def simhash(self, text: str) -> int:
        words = self.word.findall((text or "").lower())
        if not words:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        uniq, counts = np.unique(np.asarray(words), return_counts=True)
        for w, c in zip(uniq, counts):
            h = _stable_hash64(w)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), c, -c)
        val = 0
        for i in range(64):
            if acc[i] > 0:
                val |= 1 << i
        return val

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        hs = [self.simhash(t) for t in batch.column(self.text_col).to_pylist()]
        # keep in int64 range by dropping the top bit (still 63 bits of signal)
        hs = [h & ((1 << 63) - 1) for h in hs]
        return pa.table({"doc": ids, "simhash": pa.array(hs, _I64)})


def simhash_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: band the 64-bit hash into
    ``max_hamming + 1`` chunks — by pigeonhole, any pair within the
    Hamming budget shares at least one identical chunk — group by
    chunk value, verify Hamming distance exactly."""
    n_bands = min(max_hamming + 1, 16)
    bounds = np.linspace(0, 64, n_bands + 1).astype(int)
    chunks = [(int(lo), int(hi - lo)) for lo, hi in zip(bounds[:-1], bounds[1:])]

    sigs = ds.map_batches(
        SimHasher(id_col, text_col), batch_format="pyarrow", concurrency=concurrency, batch_size=1024
    ).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        docs: list[int] = []
        bands: list[int] = []
        keys: list[int] = []
        hsv: list[int] = []
        for did, h in zip(batch.column("doc").to_pylist(), batch.column("simhash").to_pylist()):
            for bi, (lo, width) in enumerate(chunks):
                docs.append(did)
                bands.append(bi)
                keys.append((h >> lo) & ((1 << width) - 1))
                hsv.append(h)
        return pa.table(
            {
                "doc": pa.array(docs, _I64),
                "band": pa.array(bands, _I64),
                "key": pa.array(keys, _I64),
                "h": pa.array(hsv, _I64),
            }
        )

    md = max_hamming

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc").sort_values("doc")
        docs = g["doc"].to_numpy(dtype=np.int64)
        hs = g["h"].to_numpy(dtype=np.int64).astype(np.uint64)
        if len(docs) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(docs), k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= md
        return pd.DataFrame({"a": docs[ia][keep], "b": docs[ib][keep], "hamming": ham[keep]})

    return (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pandas")
        .map_batches(
            ensure_schema({"a": _I64, "b": _I64, "hamming": _I64}), batch_format="pyarrow"
        )
        .groupby(["a", "b"])
        .aggregate(Min("hamming", alias_name="hamming"))
        .map_batches(
            ensure_schema({"a": _I64, "b": _I64, "hamming": _I64}), batch_format="pyarrow"
        )
    )
