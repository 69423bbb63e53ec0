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

All hashing is seeded/deterministic (pandas siphash with its fixed
default key + polynomial n-gram combines, fixed rng seed for minhash
permutations) so runs reproduce bit-for-bit across processes.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

from ..util import compact_for_join, ensure_schema

_I64 = pa.int64()
_MERSENNE = np.uint64((1 << 61) - 1)


def hash_str_array(arr: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hashes of a string object array in one
    C-level pass (pandas siphash with its fixed default key — stable
    across processes/sessions, unlike Python's hash())."""
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=False)


# RE2's \s class, shared with DuckDB's regexp kernels. Python's bare
# str.split() splits on Unicode whitespace (\v, NBSP, U+2028, ...) and
# silently diverges from any '\s'-based SQL oracle on such docs — same
# bug class as the round-4 t_pack_seqs trim failure.
_RE2_WS = "\t\n\f\r "
_RE2_WS_RUN = re.compile(r"[\t\n\f\r ]+")


def _re2_word_split(t: "str | None") -> "list[str]":
    """Tokens = maximal runs of non-[\\t\\n\\f\\r ] chars — exactly what
    regexp_split_to_array(regexp_replace(x,'^\\s+|\\s+$','','g'),'\\s+')
    produces in DuckDB for non-blank x (and [] for blank/null)."""
    t = (t or "").strip(_RE2_WS)
    return _RE2_WS_RUN.split(t) if t else []


def word_shingle_hashes_batch(texts: "list[str]", n: int = 3) -> "list[np.ndarray]":
    """Per-doc distinct word-n-gram hashes for a whole batch.

    Words = RE2-\\s split of the RE2-\\s-trimmed text (see
    ``_re2_word_split``); a doc with fewer than n words yields one
    shingle of all its words; an empty doc yields none — mirrored
    exactly by the SQL oracle (which compares gram STRINGS, so the
    hash function is free to change).

    Vectorized: ALL tokens of the batch are hashed in one pandas
    siphash call, then each doc's n-gram hashes are a Horner combine of
    n consecutive token hashes (``poly_kgram_hashes``) — no per-shingle
    Python hashing (the round-1 hot-spot: blake2b per shingle)."""
    from .textstats import poly_kgram_hashes

    toks = [_re2_word_split(t) for t in texts]
    lens = [len(w) for w in toks]
    total = sum(lens)
    if total == 0:
        return [np.zeros(0, dtype=np.uint64) for _ in texts]
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in toks:
        flat[pos : pos + len(w)] = w
        pos += len(w)
    h = hash_str_array(flat)
    out: list[np.ndarray] = []
    pos = 0
    for L in lens:
        if L == 0:
            out.append(np.zeros(0, dtype=np.uint64))
            continue
        out.append(np.unique(poly_kgram_hashes(h[pos : pos + L], n)))
        pos += L
    return out


def char_shingle_hashes_batch(texts: "list[str]", k: int = 5) -> "list[np.ndarray]":
    """Per-doc distinct k-char shingle hashes: rolling polynomial hash
    over the code-point array (utf-32 decode → vectorized Horner)."""
    from .textstats import poly_kgram_hashes

    out: list[np.ndarray] = []
    for t in texts:
        t = t or ""
        if not t:
            out.append(np.zeros(0, dtype=np.uint64))
            continue
        cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        out.append(np.unique(poly_kgram_hashes(cps, k)))
    return out


def shingle_hashes_batch(texts: "list[str]", k: int, mode: str) -> "list[np.ndarray]":
    return (
        char_shingle_hashes_batch(texts, k) if mode == "char" else word_shingle_hashes_batch(texts, k)
    )


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (uint64) of one document."""
    return char_shingle_hashes_batch([text], k)[0]


def word_shingles(text: str, n: int = 3) -> np.ndarray:
    """Distinct word n-gram hashes (uint64) of one document."""
    return word_shingle_hashes_batch([text], n)[0]


def shingles(text: str, k: int, mode: str) -> np.ndarray:
    return shingle_hashes_batch([text], k, mode)[0]


# ---------------------------------------------------------------- exact

def exact_dedup_groups(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """One row per distinct content: (doc_id = min id, n_dups).

    Hash-partitioned dedup: TWO independent vectorized siphash-64
    passes per batch (pd.util.hash_array with distinct keys = 128 bits
    of group key — the same birthday-collision posture as the md5 this
    replaced, which serialized every batch through a per-row Python
    loop; VERDICT r4 fix #6), then groupby(h1, h2) with Min/Count —
    the reference's implicit map-insert edge dedup (graph.go:77)
    generalized to arbitrary content.
    """

    def h(batch: pa.Table) -> pa.Table:
        texts = np.asarray(
            pc.fill_null(batch.column(text_col), "").to_pandas(), dtype=object
        )
        h1 = pd.util.hash_array(texts, categorize=False)
        h2 = pd.util.hash_array(texts, hash_key="dpr_exactdedup_2", categorize=False)
        return pa.table(
            {
                "h1": pa.array(h1.view(np.int64)),
                "h2": pa.array(h2.view(np.int64)),
                id_col: batch.column(id_col),
            }
        )

    grouped = (
        ds.map_batches(h, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_dups"))
    )
    return grouped.map_batches(
        ensure_schema({id_col: _I64, "n_dups": _I64}), batch_format="pyarrow"
    )


# ---------------------------------------------------------------- n-gram jaccard (exact)

def _shingle_rows(ds, id_col, text_col, k, mode="char"):
    """(sh, doc, size) rows: one row per distinct shingle per doc, with
    the doc's distinct-shingle count attached to every row — each doc
    lives wholly inside one batch, so sizes need NO shuffle or join
    downstream (they ride along into the pair-count reducers)."""

    def explode(batch: pa.Table) -> pa.Table:
        per_doc = shingle_hashes_batch(batch.column(text_col).to_pylist(), k, mode)
        dids = batch.column(id_col).to_numpy(zero_copy_only=False)
        counts = np.fromiter((len(s) for s in per_doc), dtype=np.int64, count=len(per_doc))
        sh = (
            np.concatenate(per_doc).astype(np.int64)
            if counts.sum()
            else np.zeros(0, dtype=np.int64)
        )
        return pa.table(
            {
                "sh": pa.array(sh),
                "doc": pa.array(np.repeat(dids, counts)),
                "size": pa.array(np.repeat(counts, counts)),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def _pair_count_block(t: pa.Table, S: int):
    """Gather body for the pair-count BSP: per-block partial counts per
    packed pair key, sizes carried from the first occurrence."""
    if "pk" not in t.column_names or len(t) == 0:
        return [None] * S
    pk = t.column("pk").to_numpy(zero_copy_only=False)
    u, idx, c = np.unique(pk, return_index=True, return_counts=True)
    sa = t.column("sa").to_numpy(zero_copy_only=False)[idx]
    sb = t.column("sb").to_numpy(zero_copy_only=False)[idx]
    with np.errstate(over="ignore"):
        shard = (
            (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        ).astype(np.int64) % S
    order = np.argsort(shard, kind="stable")
    u, c, sa, sb, shard = u[order], c[order], sa[order], sb[order], shard[order]
    out: list = [None] * S
    for s in np.unique(shard):
        lo, hi = np.searchsorted(shard, [s, s + 1])
        out[int(s)] = (u[lo:hi], c[lo:hi], sa[lo:hi], sb[lo:hi])
    return out


def _pair_intersections(
    rows, num_partitions: int, threshold: float, num_shards: int = 16
):
    """rows(sh, doc, size) → (a, b, inter, size_a, size_b) for every
    pair with Jaccard >= threshold.

    Shape: one Acero self-join on the shingle hash generates the
    co-occurrence stream (a pair can only have jaccard > 0 by sharing a
    shingle, so this is lossless), then a per-shard BSP combine sums
    per-pair counts and applies the threshold INSIDE the reducers — no
    per-group map_groups (~200k tiny pandas groups on a 5k-doc corpus
    was the round-1 tail) and no sizes joins (sizes ride on the rows).
    Doc ids must fit [0, 2^31) for the packed pair key."""
    import ray
    import ray.data

    P = num_partitions
    left = compact_for_join(
        rows.map_batches(
            lambda t: pa.table(
                {"sh": t.column("sh"), "a": t.column("doc"), "sa": t.column("size")}
            ),
            batch_format="pyarrow",
        ),
        P,
    )
    right = compact_for_join(
        rows.map_batches(
            lambda t: pa.table(
                {"sh2": t.column("sh"), "b": t.column("doc"), "sb": t.column("size")}
            ),
            batch_format="pyarrow",
        ),
        P,
    )
    j = left.join(right, join_type="inner", num_partitions=P, on=("sh",), right_on=("sh2",))

    def keep(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names or len(t) == 0:
            return pa.table(
                {c: pa.array([], _I64) for c in ["pk", "sa", "sb"]}
            )
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        m = a < b
        if len(a) and (a.min() < 0 or b.min() < 0 or max(a.max(), b.max()) >= (1 << 31)):
            raise ValueError("pair BSP needs doc ids in [0, 2^31)")
        return pa.table(
            {
                "pk": pa.array((a[m] << np.int64(32)) | b[m]),
                "sa": t.column("sa").filter(pa.array(m)),
                "sb": t.column("sb").filter(pa.array(m)),
            }
        )

    packed = j.map_batches(keep, batch_format="pyarrow")
    S = max(2, num_shards)  # num_returns=1 would hand reducers the raw list
    thr = threshold
    gather = ray.remote(_pair_count_block)
    blocks = packed.materialize().to_arrow_refs()

    @ray.remote
    def reduce(*parts):
        cols = ["a", "b", "inter", "size_a", "size_b"]
        parts = [p for p in parts if p is not None]
        if not parts:
            return pa.table({c: pa.array([], _I64) for c in cols})
        keys = np.concatenate([p[0] for p in parts])
        cnts = np.concatenate([p[1] for p in parts])
        sas = np.concatenate([p[2] for p in parts])
        sbs = np.concatenate([p[3] for p in parts])
        u, inv = np.unique(keys, return_inverse=True)
        tot = np.bincount(inv, weights=cnts.astype(np.float64), minlength=len(u)).astype(np.int64)
        first = np.full(len(u), len(keys), dtype=np.int64)
        np.minimum.at(first, inv, np.arange(len(keys), dtype=np.int64))
        sa_u = sas[first]
        sb_u = sbs[first]
        jac = tot / (sa_u + sb_u - tot)
        m = jac >= thr
        return pa.table(
            {
                "a": pa.array(u[m] >> np.int64(32)),
                "b": pa.array(u[m] & np.int64(0xFFFFFFFF)),
                "inter": pa.array(tot[m]),
                "size_a": pa.array(sa_u[m]),
                "size_b": pa.array(sb_u[m]),
            }
        )

    gathers = [gather.options(num_returns=S).remote(b, S) for b in blocks]
    cols = [list(c) for c in zip(*gathers)]
    return ray.data.from_arrow_refs([reduce.remote(*cols[s]) for s in range(S)])


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
    exact. ``max_df=None`` keeps every shingle (exact result);
    ``max_df=N`` drops shingles appearing in > N docs (documented
    approximation for web-scale stopword shingles).
    ``mode``: 'char' (k chars) or 'word' (k-word n-grams).
    """
    rows = _shingle_rows(ds, id_col, text_col, k, mode).materialize()
    if max_df is not None:
        rows = _drop_frequent_shingles(rows, max_df)
    return _pair_intersections(rows, num_partitions, threshold)


def _drop_frequent_shingles(rows, max_df: int):
    """Filter out shingles whose document frequency exceeds ``max_df``:
    df via the count BSP, banned set broadcast (it is small by
    definition — only ubiquitous shingles cross a sane max_df)."""
    from ..util import count_i64_keys, semi_join_filter

    df = count_i64_keys(rows, "sh")
    banned_parts = []
    for b in df.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        import pyarrow.compute as pc

        banned_parts.append(
            b.column("sh").filter(pc.greater(b.column("cnt"), max_df)).to_numpy(zero_copy_only=False)
        )
    banned = np.concatenate(banned_parts) if banned_parts else np.zeros(0, dtype=np.int64)
    if len(banned) == 0:
        return rows
    return semi_join_filter(rows, "sh", banned, keep=False)


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

    def _sig_of(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.zeros(len(self.a), dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return m.min(axis=1)

    def signature(self, text: str) -> np.ndarray:
        return self._sig_of(shingles(text, self.k, self.mode))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        per_doc = shingle_hashes_batch(
            batch.column(self.text_col).to_pylist(), self.k, self.mode
        )
        return pa.table(
            {
                "doc": pa.array(ids, _I64),
                "sig": pa.array(
                    [self._sig_of(s).astype(np.int64).tobytes() for s in per_doc], pa.binary()
                ),
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
        """One (doc, band, band_hash) row per band, vectorized: the band
        hash is a polynomial combine of the band's r signature values
        (grouping is on (band, bh), so cross-band collisions are moot)."""
        if len(batch) == 0:
            return pa.table(
                {"doc": pa.array([], _I64), "band": pa.array([], _I64), "bh": pa.array([], _I64)}
            )
        docs = batch.column("doc").to_numpy(zero_copy_only=False)
        sigs = np.stack(
            [np.frombuffer(s, dtype=np.int64) for s in batch.column("sig").to_pylist()]
        ).view(np.uint64).reshape(len(docs), bands, r)
        with np.errstate(over="ignore"):
            bh = np.zeros((len(docs), bands), dtype=np.uint64)
            for j in range(r):
                bh = bh * np.uint64(1000003) + sigs[:, :, j]
        return pa.table(
            {
                "doc": pa.array(np.repeat(docs, bands)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), len(docs))),
                "bh": pa.array((bh >> np.uint64(1)).astype(np.int64).reshape(-1)),
            }
        )

    buckets = sigs.map_batches(band_rows, batch_format="pyarrow")

    # pairs per (band, bucket) via a two-key Acero self-join (buckets are
    # small by LSH construction, so the quadratic blow-up is bounded),
    # deduped across bands with the distinct-pair BSP — no per-bucket
    # map_groups (tens of thousands of tiny pandas groups).
    from ..util import distinct_i64_pairs

    P = 8
    left = compact_for_join(
        buckets.map_batches(
            lambda t: pa.table(
                {"band": t.column("band"), "bh": t.column("bh"), "a": t.column("doc")}
            ),
            batch_format="pyarrow",
        ),
        P,
    )
    right = compact_for_join(
        buckets.map_batches(
            lambda t: pa.table(
                {"band2": t.column("band"), "bh2": t.column("bh"), "b": t.column("doc")}
            ),
            batch_format="pyarrow",
        ),
        P,
    )
    j = left.join(
        right, join_type="inner", num_partitions=P, on=("band", "bh"), right_on=("band2", "bh2")
    )

    def keep(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names or len(t) == 0:
            return pa.table({"a": pa.array([], _I64), "b": pa.array([], _I64)})
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        m = a < b
        return pa.table({"a": pa.array(a[m]), "b": pa.array(b[m])})

    return distinct_i64_pairs(j.map_batches(keep, batch_format="pyarrow"), "a", "b")


def minhash_lsh_dedup_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_partitions: int = 8,
    **lsh_kw,
) -> "ray.data.Dataset":
    """LSH candidates verified by exact Jaccard >= threshold.

    Returns (a, b, inter, size_a, size_b): the threshold-filtered
    pair-intersection table (same BSP machinery as
    ``ngram_jaccard_pairs``) inner-joined to the LSH candidate set —
    only pairs that both clear the exact threshold AND collided in at
    least one band survive."""
    k = lsh_kw.get("k", 5)
    mode = lsh_kw.get("mode", "char")
    cand = minhash_lsh_candidates(ds, id_col, text_col, **lsh_kw)

    def _rename(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names or len(t) == 0:
            return pa.table({"ca": pa.array([], _I64), "cb": pa.array([], _I64)})
        return pa.table({"ca": t.column("a"), "cb": t.column("b")})

    cand = compact_for_join(cand.map_batches(_rename, batch_format="pyarrow"), num_partitions)
    if cand.count() == 0:
        empty = {c: pa.array([], _I64) for c in ["a", "b", "inter", "size_a", "size_b"]}
        import ray.data as _rd

        return _rd.from_arrow(pa.table(empty))

    rows = _shingle_rows(ds, id_col, text_col, k, mode).materialize()
    pairs_all = compact_for_join(
        _pair_intersections(rows, num_partitions, threshold), num_partitions
    )
    j = pairs_all.join(
        cand, join_type="inner", num_partitions=num_partitions, on=("a", "b"), right_on=("ca", "cb")
    )

    def _final(t: pa.Table) -> pa.Table:
        cols = ["a", "b", "inter", "size_a", "size_b"]
        if "a" not in t.column_names:
            return pa.table({c: pa.array([], _I64) for c in cols})
        return pa.table({c: t.column(c) for c in cols})

    return j.map_batches(_final, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash

class SimHasher:
    """64-bit SimHash over word tokens (weight = term frequency).

    Vectorized per batch: one siphash pass over every token occurrence,
    bit matrix via ``np.unpackbits`` (64 bytes/token), ±1 accumulation
    with one segmented ``np.add.reduceat`` — summing ±1 per OCCURRENCE
    equals the classic tf-weighted unique-term formulation, with no
    per-word Python loop."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        import re

        self.word = re.compile(r"\w+")
        self.id_col = id_col
        self.text_col = text_col

    def _acc_batch(self, texts: "list[str]") -> np.ndarray:
        """(n_docs, 64) signed bit accumulators."""
        toks = [self.word.findall((t or "").lower()) for t in texts]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64, count=len(toks))
        total = int(lens.sum())
        acc = np.zeros((len(texts), 64), dtype=np.int64)
        if total == 0:
            return acc
        flat = np.empty(total, dtype=object)
        pos = 0
        for w in toks:
            flat[pos : pos + len(w)] = w
            pos += len(w)
        h = hash_str_array(flat)
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        signed = bits.astype(np.int32) * 2 - 1
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        nz = lens > 0
        acc[nz] = np.add.reduceat(signed, starts[nz], axis=0)
        return acc

    def simhash(self, text: str) -> int:
        acc = self._acc_batch([text])[0]
        return int(
            ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        acc = self._acc_batch(batch.column(self.text_col).to_pylist())
        vals = ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(axis=1)
        # keep in int64 range by dropping the top bit (still 63 bits of signal)
        vals = (vals & np.uint64((1 << 63) - 1)).astype(np.int64)
        return pa.table({"doc": ids, "simhash": pa.array(vals, _I64)})


def drop_hot_buckets(rows, bucket_col: str, max_bucket: int):
    """Drop every row whose ``bucket_col`` value occurs more than
    ``max_bucket`` times: bucket sizes via the count BSP, the (small by
    definition) hot set broadcast as an anti semi-join filter. The
    LSH-bucket guard: degenerate web buckets (empty/boilerplate docs
    collapsing to one signature) otherwise make within-bucket pair
    generation quadratic."""
    import pyarrow.compute as pc

    from ..util import count_i64_keys, semi_join_filter

    sizes = count_i64_keys(rows, bucket_col)
    hot_parts = [
        b.column(bucket_col)
        .filter(pc.greater(b.column("cnt"), max_bucket))
        .to_numpy(zero_copy_only=False)
        for b in sizes.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ]
    hot = np.concatenate(hot_parts) if hot_parts else np.zeros(0, dtype=np.int64)
    if len(hot) == 0:
        return rows
    return semi_join_filter(rows, bucket_col, hot, keep=False)


def simhash_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    concurrency: int = 4,
    num_partitions: int = 8,
    max_bucket: int | None = 4096,
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: band the 64-bit hash into
    ``max_hamming + 1`` chunks — by pigeonhole, any pair within the
    Hamming budget shares at least one identical chunk — candidates via
    a two-key Acero self-join on (band, chunk value), Hamming verified
    vectorized (SWAR popcount over the xor), deduped across bands by a
    small groupby over the (few) surviving near-dup pairs.

    Scale guards: band keys come from numpy shifts over the whole
    column (no per-row loop), and (band, key) buckets larger than
    ``max_bucket`` are dropped BEFORE the join — a dropped pair can
    still surface through its other bands; ``max_bucket=None`` keeps
    every bucket (exact pigeonhole recall, quadratic on degenerate
    buckets)."""
    n_bands = min(max_hamming + 1, 16)
    bounds = np.linspace(0, 64, n_bands + 1).astype(np.uint64)
    los = bounds[:-1]
    widths = bounds[1:] - bounds[:-1]
    masks = np.where(
        widths >= np.uint64(64),
        np.uint64(0xFFFFFFFFFFFFFFFF),
        (np.uint64(1) << widths) - np.uint64(1),
    )
    band_ids = np.arange(n_bands, dtype=np.int64)

    sigs = ds.map_batches(
        SimHasher(id_col, text_col), batch_format="pyarrow", concurrency=concurrency, batch_size=1024
    ).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        """One (doc, band, key, h, bk) row per band — 2 vector ops per
        band (shift + mask) over the whole column; ``bk`` packs
        (band, key) into one int64 for the bucket-size counter (keys
        fit 32 bits whenever n_bands >= 2)."""
        if len(batch) == 0 or "doc" not in batch.column_names:
            return pa.table({c: pa.array([], _I64) for c in ["doc", "band", "key", "h", "bk"]})
        docs = batch.column("doc").to_numpy(zero_copy_only=False)
        h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        keys = ((h[:, None] >> los[None, :]) & masks[None, :]).astype(np.int64).reshape(-1)
        band = np.tile(band_ids, len(docs))
        bk = ((band << np.int64(32)) | keys) if n_bands > 1 else keys
        return pa.table(
            {
                "doc": pa.array(np.repeat(docs, n_bands)),
                "band": pa.array(band),
                "key": pa.array(keys),
                "h": pa.array(np.repeat(h.astype(np.int64), n_bands)),
                "bk": pa.array(bk),
            }
        )

    rows = sigs.map_batches(band_rows, batch_format="pyarrow")
    if max_bucket is not None:
        rows = drop_hot_buckets(rows.materialize(), "bk", max_bucket)

    P = num_partitions
    left = compact_for_join(
        rows.map_batches(
            lambda t: pa.table(
                {"band": t.column("band"), "key": t.column("key"), "a": t.column("doc"), "ha": t.column("h")}
            ),
            batch_format="pyarrow",
        ),
        P,
    )
    right = compact_for_join(
        rows.map_batches(
            lambda t: pa.table(
                {"band2": t.column("band"), "key2": t.column("key"), "b": t.column("doc"), "hb": t.column("h")}
            ),
            batch_format="pyarrow",
        ),
        P,
    )
    j = left.join(
        right, join_type="inner", num_partitions=P, on=("band", "key"), right_on=("band2", "key2")
    )
    md = max_hamming

    def verify(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names or len(t) == 0:
            return pa.table({c: pa.array([], _I64) for c in ["a", "b", "hamming"]})
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        ha = t.column("ha").to_numpy(zero_copy_only=False).astype(np.uint64)
        hb = t.column("hb").to_numpy(zero_copy_only=False).astype(np.uint64)
        m = a < b
        a, b, x = a[m], b[m], ha[m] ^ hb[m]
        if len(x):
            ham = np.unpackbits(x.view(np.uint8)).reshape(-1, 64).sum(axis=1).astype(np.int64)
        else:
            ham = np.zeros(0, dtype=np.int64)
        keep = ham <= md
        return pa.table(
            {"a": pa.array(a[keep]), "b": pa.array(b[keep]), "hamming": pa.array(ham[keep])}
        )

    return (
        j.map_batches(verify, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Min("hamming", alias_name="hamming"))
        .map_batches(
            ensure_schema({"a": _I64, "b": _I64, "hamming": _I64}), batch_format="pyarrow"
        )
    )


def _gram_pos_rows(texts: "list", doc_ids: np.ndarray, k: int) -> pa.Table:
    """Per-doc DISTINCT word-k-gram hashes with their position counts,
    as (gram, doc_id, pos_cnt) rows. Tokens/grams mirror the SQL oracle
    exactly: RE2-\\s split of the RE2-\\s-trimmed text, grams only for
    docs with >= k words (no short-doc fallback — the oracle's
    ``range(1, nw-k+2)`` emits none). One siphash call for the whole
    batch; Horner combine per doc (no per-gram Python hashing)."""
    from .textstats import poly_kgram_hashes

    toks = [_re2_word_split(t) for t in texts]
    lens = [len(w) for w in toks]
    total = sum(lens)
    g_out: list[np.ndarray] = []
    d_out: list[np.ndarray] = []
    c_out: list[np.ndarray] = []
    if total:
        flat = np.empty(total, dtype=object)
        pos = 0
        for w in toks:
            flat[pos : pos + len(w)] = w
            pos += len(w)
        h = hash_str_array(flat)
        pos = 0
        for i, L in enumerate(lens):
            if L >= k:
                u, c = np.unique(poly_kgram_hashes(h[pos : pos + L], k), return_counts=True)
                g_out.append(u.view(np.int64))
                d_out.append(np.full(len(u), doc_ids[i], dtype=np.int64))
                c_out.append(c.astype(np.int64))
            pos += L
    if not g_out:
        return pa.table(
            {
                "gram": pa.array([], _I64),
                "doc_id": pa.array([], _I64),
                "pos_cnt": pa.array([], _I64),
            }
        )
    return pa.table(
        {
            "gram": pa.array(np.concatenate(g_out)),
            "doc_id": pa.array(np.concatenate(d_out)),
            "pos_cnt": pa.array(np.concatenate(c_out)),
        }
    )


def dup_span_stats(
    docs: "ray.data.Dataset",
    k: int = 3,
    num_shards: int = 16,
    join_partitions: int = 8,
) -> "ray.data.Dataset":
    """Duplicated-span exposure per document: the fraction of a doc's
    word-k-gram POSITIONS whose gram occurs in >= 2 distinct documents
    — the per-doc signal behind exact-substring training-data dedup
    (Lee et al. 2021's "how much of this doc is corpus-duplicated
    text"; the reference has no text stack, repo-new capability).

    Shape (all BSP / one hash join — never all-pairs, never per-group
    Python):
      1. one ``map_batches`` pass emits per-doc DISTINCT gram hashes
         with position counts — O(tokens) work, O(distinct grams/doc)
         rows out;
      2. gram document-frequency = ``count_i64_keys`` over those rows
         (each doc contributes a gram once, so count == df); grams
         with df >= 2 form the dup side;
      3. one Acero inner join tags each (doc, gram) row dup/not;
      4. two weighted count-BSPs fold position counts per doc
         (numerator over the joined rows, denominator over all rows);
      5. a small left join + vectorized divide emits
         (doc_id, total_grams, dup_grams, dup_frac).

    Docs with fewer than k words have no grams and are absent from the
    output (mirrored by the oracle). 64-bit Horner gram hashes stand in
    for gram strings (collision odds ~n²/2^61 — the t_ngram_dup_pairs
    precedent)."""
    from ..util import count_i64_keys

    def rows_fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "doc_id" not in t.column_names:
            return _gram_pos_rows([], np.zeros(0, dtype=np.int64), k)
        return _gram_pos_rows(
            t.column("text").to_pylist(),
            t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
            k,
        )

    rows = docs.map_batches(rows_fn, batch_format="pyarrow").materialize()
    df_tbl = count_i64_keys(rows, "gram", num_shards=num_shards, count_col="df")
    def keep_dup(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "gram" not in t.column_names:
            return pa.table({"gram": pa.array([], _I64)})
        return t.filter(pc.greater_equal(t.column("df"), 2)).select(["gram"])

    dup_grams = df_tbl.map_batches(keep_dup, batch_format="pyarrow")
    tagged = compact_for_join(rows, join_partitions).join(
        compact_for_join(dup_grams, join_partitions),
        join_type="inner",
        num_partitions=join_partitions,
        on=("gram",),
    )
    dup_per_doc = count_i64_keys(
        tagged, "doc_id", num_shards=num_shards, count_col="dup_grams", weight_col="pos_cnt"
    )
    tot_per_doc = count_i64_keys(
        rows, "doc_id", num_shards=num_shards, count_col="total_grams", weight_col="pos_cnt"
    )
    joined = compact_for_join(
        tot_per_doc.map_batches(
            ensure_schema({"doc_id": _I64, "total_grams": _I64}), batch_format="pyarrow"
        ),
        join_partitions,
    ).join(
        compact_for_join(
            dup_per_doc.map_batches(
                ensure_schema({"doc_id": _I64, "dup_grams": _I64}), batch_format="pyarrow"
            ),
            join_partitions,
        ),
        join_type="left_outer",
        num_partitions=join_partitions,
        on=("doc_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {"doc_id": _I64, "total_grams": _I64, "dup_grams": _I64}
        if len(t) == 0 or "doc_id" not in t.column_names:
            return pa.table(
                {c: pa.array([], dt) for c, dt in cols.items()}
                | {"dup_frac": pa.array([], pa.float64())}
            )
        tot = t.column("total_grams").to_numpy(zero_copy_only=False).astype(np.int64)
        dup = t.column("dup_grams").to_numpy(zero_copy_only=False)
        dup = np.nan_to_num(dup.astype(np.float64), nan=0.0).astype(np.int64)
        frac = np.round(dup * 1.0 / tot, 6)  # structure mirrors the SQL
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(_I64),
                "total_grams": pa.array(tot),
                "dup_grams": pa.array(dup),
                "dup_frac": pa.array(frac),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def bigram_fluency(
    docs: "ray.data.Dataset",
    num_shards: int = 16,
    join_partitions: int = 8,
) -> "ray.data.Dataset":
    """Corpus-frequency fluency scoring — the integer-exact stand-in
    for an n-gram-LM perplexity filter (CCNet's quality gate without
    the float log-prob parity hazard): per document, over its word
    BIGRAM positions, sum the corpus-wide occurrence count of each
    position's bigram. Common phrasing scores high; text whose bigrams
    appear nowhere else scores low. Output per doc (>= 2 words; short
    docs absent, mirroring ``dup_span_stats``):

      n_bigrams — bigram positions in the doc,
      sum_tf    — Σ over positions of the bigram's corpus frequency,
      n_hapax   — positions whose bigram occurs exactly ONCE corpus-wide
                  (necessarily in this doc; the OOV-rate analogue),
      fluency   — round(sum_tf / n_bigrams, 6), the ONLY float op.

    Shape (the ``dup_span_stats`` plan with tf instead of df):
      1. one pass emits per-doc distinct bigram hashes + position
         counts (``_gram_pos_rows``, k=2 — Horner combine, no per-gram
         Python);
      2. corpus tf per gram = weighted ``count_i64_keys``;
      3. ONE Acero join tags each (doc, gram) row with its tf (every
         row matches — the tf table is built from these rows);
      4. one multi-counter BSP (``sum_i64_keys_with_payload`` with a
         weight-col list) folds the three per-doc counters in a single
         exchange.
    All counters are exact int64 end-to-end; the terminal division is
    the repo's float-parity rule."""
    from ..util import count_i64_keys, sum_i64_keys_with_payload

    def rows_fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "doc_id" not in t.column_names:
            return _gram_pos_rows([], np.zeros(0, dtype=np.int64), 2)
        return _gram_pos_rows(
            t.column("text").to_pylist(),
            t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
            2,
        )

    rows = docs.map_batches(rows_fn, batch_format="pyarrow").materialize()
    tf_tbl = count_i64_keys(
        rows, "gram", num_shards=num_shards, count_col="tf", weight_col="pos_cnt"
    )
    tagged = compact_for_join(rows, join_partitions).join(
        compact_for_join(
            tf_tbl.map_batches(
                ensure_schema({"gram": _I64, "tf": _I64}), batch_format="pyarrow"
            ),
            join_partitions,
        ),
        join_type="inner",
        num_partitions=join_partitions,
        on=("gram",),
    )

    def counters(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "doc_id" not in t.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], _I64),
                    "n_bigrams": pa.array([], _I64),
                    "sum_tf": pa.array([], _I64),
                    "n_hapax": pa.array([], _I64),
                }
            )
        pos = t.column("pos_cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(_I64),
                "n_bigrams": pa.array(pos),
                "sum_tf": pa.array(pos * tf),
                "n_hapax": pa.array(pos * (tf == 1)),
            }
        )

    folded = sum_i64_keys_with_payload(
        tagged.map_batches(counters, batch_format="pyarrow"),
        "doc_id",
        ["n_bigrams", "sum_tf", "n_hapax"],
        [],
        num_shards=num_shards,
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {"doc_id": _I64, "n_bigrams": _I64, "sum_tf": _I64, "n_hapax": _I64}
        if len(t) == 0 or "doc_id" not in t.column_names:
            return pa.table(
                {c: pa.array([], dt) for c, dt in cols.items()}
                | {"fluency": pa.array([], pa.float64())}
            )
        nb = t.column("n_bigrams").to_numpy(zero_copy_only=False).astype(np.int64)
        st = t.column("sum_tf").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(_I64),
                "n_bigrams": pa.array(nb),
                "sum_tf": pa.array(st),
                "n_hapax": t.column("n_hapax").cast(_I64),
                "fluency": pa.array(np.round(st * 1.0 / nb, 6)),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


_CDC_B = np.uint64(0x9E3779B97F4A7C15)  # odd Horner multiplier (mod 2^64)
_CDC_W = 8  # rolling window bytes
_CDC_MASK = np.uint64(63)  # 6-bit mask: ~1/64 boundary rate


def cdc_chunk_stats(
    docs: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Content-defined chunking stats (the Rabin/FastCDC family —
    storage-level dedup's shift-resistant complement to the word-gram
    text ops): each document's UTF-8 bytes are cut AFTER byte i
    whenever the 8-byte rolling Horner hash ending at i has its low 6
    bits zero, so chunk boundaries depend on CONTENT, not offsets —
    an insertion re-synchronizes within one window instead of shifting
    every downstream chunk. Output per non-empty doc: n_bytes,
    n_chunks, max_chunk and avg_chunk = round(n_bytes/n_chunks, 6)
    (the only float op). Docs shorter than the window have no cut
    candidates — one whole-doc chunk.

    Shape: embarrassingly parallel ``map_batches`` — the batch's docs
    are CONCATENATED into one byte buffer, the Horner hash runs as 8
    shifted vectorized multiply-adds over the whole buffer (uint64
    wraparound is the modulus), windows crossing doc joints are masked
    out, and only the tiny per-doc cut lists are touched in Python.
    No shuffle anywhere."""

    def stats(t: pa.Table) -> pa.Table:
        out = {
            "doc_id": [],
            "n_bytes": [],
            "n_chunks": [],
            "max_chunk": [],
        }
        if len(t) and text_col in t.column_names:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            texts = t.column(text_col).to_pylist()
            blobs = [(x or "").encode("utf-8") for x in texts]
            lens = np.array([len(b) for b in blobs], dtype=np.int64)
            buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            n = len(buf)
            w = _CDC_W
            if n >= w:
                h = buf[: n - w + 1].astype(np.uint64)
                for j in range(1, w):
                    h = h * _CDC_B + buf[j : n - w + 1 + j]
                hit = (h & _CDC_MASK) == 0  # hit[k]: window buf[k:k+w]
            else:
                hit = np.zeros(0, dtype=bool)
            starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
            for d in range(len(ids)):
                L = int(lens[d])
                if L == 0:
                    continue
                s = int(starts[d])
                # valid window starts fully inside this doc
                k0, k1 = s, s + L - w + 1
                if k1 > k0:
                    cuts = np.flatnonzero(hit[k0:k1]) + (w - 1)  # local END idx
                    cuts = cuts[cuts < L - 1]  # cut at the last byte is a no-op
                else:
                    cuts = np.zeros(0, dtype=np.int64)
                edges = np.concatenate([[-1], cuts, [L - 1]])
                seg = np.diff(edges)
                out["doc_id"].append(int(ids[d]))
                out["n_bytes"].append(L)
                out["n_chunks"].append(len(seg))
                out["max_chunk"].append(int(seg.max()))
        nb = np.array(out["n_bytes"], dtype=np.int64)
        nc = np.array(out["n_chunks"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.array(out["doc_id"], dtype=np.int64)),
                "n_bytes": pa.array(nb),
                "n_chunks": pa.array(nc),
                "max_chunk": pa.array(np.array(out["max_chunk"], dtype=np.int64)),
                "avg_chunk": pa.array(np.round(nb * 1.0 / np.maximum(nc, 1), 6)),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def sorted_neighborhood_pairs(
    ds: "ray.data.Dataset",
    key_col: str,
    id_col: str = "doc_id",
    window: int = 4,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Sorted-neighborhood blocking (the Hernandez-Stolfo SNM sweep —
    the classic entity-resolution candidate generator): rows are
    sorted by ``(key_col, id_col)`` and every pair whose GLOBAL sort
    ranks differ by less than ``window`` becomes a candidate. Returns
    (a, b, d): ids ordered by rank (a precedes b in the sweep) and
    their rank gap d in [1, window).

    Scale shape: global ranks via the two-pass distributed prefix
    scan (``sampling.pack_sequences``'s shape — per-block counts to
    the driver, offsets back; O(blocks) driver state), then pairing
    WITHOUT a groupby: rank bucket b = rank // window; the left side
    keeps its own bucket, the right side is emitted into its bucket
    AND the previous one — any pair with gap < window has its
    endpoints' buckets equal or adjacent, so ONE inner Acero join on
    the bucket key sees every candidate exactly once (the right
    emission whose bucket matches the left's). Buckets hold exactly
    ``window`` left rows by construction — no skew, no hot-bucket cap
    needed; join output is O(rows * 2 * window) before the gap
    filter, proportional to the O(rows * window) result itself.

    ``id_col`` values must be unique (they break sort ties and key
    the block-offset map). Requires window >= 2.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    _w = np.int64(window)
    sorted_ds = ds.select_columns([key_col, id_col]).sort([key_col, id_col]).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        # fk keeps the key column's NATIVE type — stringifying would
        # sort numeric keys lexically ("10" < "2") and corrupt offsets
        if len(t) == 0:
            return pa.table(
                {
                    "fk": t.column(key_col).slice(0, 0) if key_col in t.column_names else pa.array([], pa.string()),
                    "fi": pa.array([], _I64),
                    "c": pa.array([], _I64),
                }
            )
        return pa.table(
            {
                "fk": t.column(key_col).slice(0, 1),
                "fi": t.column(id_col).slice(0, 1).cast(_I64),
                "c": pa.array([len(t)], _I64),
            }
        )

    # per-block (first key, first id, count) — one tiny row per block
    metas = []
    for bt in sorted_ds.map_batches(
        block_meta, batch_size=None, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        metas.extend(bt.to_pylist())
    # ties are impossible: id_col is unique and every block starts at a
    # distinct (key, id)
    metas.sort(key=lambda m: (m["fk"], m["fi"]))
    offsets: dict = {}
    acc = 0
    for m in metas:
        offsets[m["fi"]] = acc
        acc += m["c"]

    def rank_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0 or id_col not in t.column_names:
            return pa.table({"rnk": pa.array([], _I64), "i": pa.array([], _I64)})
        ids = t.column(id_col).cast(_I64).to_numpy(zero_copy_only=False)
        base = offsets[int(ids[0])]
        return pa.table(
            {
                "rnk": pa.array(base + np.arange(len(ids), dtype=np.int64)),
                "i": pa.array(ids),
            }
        )

    ranked = sorted_ds.map_batches(
        rank_rows, batch_size=None, batch_format="pyarrow"
    ).materialize()

    def left_rows(t: pa.Table) -> pa.Table:
        if "rnk" not in t.column_names:
            return pa.table({c: pa.array([], _I64) for c in ["bkt", "ra", "a"]})
        r = t.column("rnk").to_numpy(zero_copy_only=False)
        return pa.table(
            {"bkt": pa.array(r // _w), "ra": t.column("rnk"), "a": t.column("i")}
        )

    def right_rows(t: pa.Table) -> pa.Table:
        if "rnk" not in t.column_names:
            return pa.table({c: pa.array([], _I64) for c in ["bkt2", "rb", "b"]})
        r = t.column("rnk").to_numpy(zero_copy_only=False)
        i = t.column("i").to_numpy(zero_copy_only=False)
        b0 = r // _w
        keep_prev = b0 >= 1
        return pa.table(
            {
                "bkt2": pa.array(np.concatenate([b0, b0[keep_prev] - 1])),
                "rb": pa.array(np.concatenate([r, r[keep_prev]])),
                "b": pa.array(np.concatenate([i, i[keep_prev]])),
            }
        )

    left = compact_for_join(
        ranked.map_batches(left_rows, batch_format="pyarrow"), num_partitions
    )
    right = compact_for_join(
        ranked.map_batches(right_rows, batch_format="pyarrow"), num_partitions
    )
    j = left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=("bkt",),
        right_on=("bkt2",),
    )

    def gap_filter(t: pa.Table) -> pa.Table:
        if "ra" not in t.column_names or len(t) == 0:
            return pa.table({c: pa.array([], _I64) for c in ["a", "b", "d"]})
        ra = t.column("ra").to_numpy(zero_copy_only=False)
        rb = t.column("rb").to_numpy(zero_copy_only=False)
        d = rb - ra
        m = (d >= 1) & (d < window)
        return pa.table(
            {
                "a": t.column("a").filter(pa.array(m)),
                "b": t.column("b").filter(pa.array(m)),
                "d": pa.array(d[m]),
            }
        )

    return j.map_batches(gap_filter, batch_format="pyarrow")


def keep_best_per_cluster(
    members: "object",
    quality: "object",
    id_col: str = "vid",
    label_col: str = "label",
    q_col: str = "q",
    num_partitions: int = 4,
    num_shards: int = 16,
) -> "object":
    """Quality-aware duplicate-cluster representative election — what a
    production near-dedup actually keeps (the LONGEST / highest-quality
    copy, not the smallest id): given cluster ``members`` (id, label)
    and a ``quality`` table (id, q), keep per label the member with MAX
    q, ties broken by MIN id. Returns (id_col, kept ∈ {0,1}).

    Scale shape: ONE Acero join members⋈quality, winners via ONE
    ``min_i64_by_key`` BSP on the packed priority
    ``(2^31-1-q) << 31 | id`` (max-q argmin trick; requires 0 ≤ q, id
    < 2^31 — raises otherwise), then ONE join back on label. No
    groupby, no driver gather."""
    import pyarrow.compute as pc

    from ..util import compact_for_join, ensure_schema, min_i64_by_key

    _LIM = np.int64(1) << 31

    qd = quality.map_batches(
        lambda t: pa.table(
            {"qid": t.column(id_col).cast(pa.int64()), "qv": t.column(q_col).cast(pa.int64())}
        )
        if id_col in t.column_names
        else pa.table({"qid": pa.array([], pa.int64()), "qv": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    j = compact_for_join(members, num_partitions).join(
        compact_for_join(qd, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=(id_col,),
        right_on=("qid",),
    )

    def pack(t: pa.Table) -> pa.Table:
        if id_col not in t.column_names or len(t) == 0:
            return pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
        vid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        q = t.column("qv").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(vid) and (vid.min() < 0 or vid.max() >= _LIM or q.min() < 0 or q.max() >= _LIM):
            raise ValueError("keep_best_per_cluster needs 0 <= id, q < 2^31")
        return pa.table({"k": pa.array(lab), "v": pa.array(((_LIM - 1 - q) << 31) | vid)})

    best = min_i64_by_key(
        j.map_batches(pack, batch_format="pyarrow"), "k", "v", num_shards=num_shards
    ).map_batches(
        lambda t: pa.table(
            {"blab": t.column("k"), "winner": pc.bit_wise_and(t.column("v"), int(_LIM) - 1)}
        )
        if "k" in t.column_names
        else pa.table({"blab": pa.array([], pa.int64()), "winner": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )

    j2 = compact_for_join(
        members.map_batches(
            ensure_schema({id_col: pa.int64(), label_col: pa.int64()}),
            batch_format="pyarrow",
        ),
        num_partitions,
    ).join(
        compact_for_join(best, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=(label_col,),
        right_on=("blab",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if id_col not in t.column_names or len(t) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "kept": pa.array([], pa.int64())}
            )
        vid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column("winner").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: pa.array(vid), "kept": pa.array((vid == w).astype(np.int64))})

    return j2.map_batches(fin, batch_format="pyarrow")


def clipped_ngram_overlap_batch(
    texts_a: "list[str]", texts_b: "list[str]", n: int = 2
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """BLEU-style clipped n-gram overlap for a batch of candidate
    pairs: per pair i, (n_a, n_b, n_clip) where n_a/n_b are the
    POSITIONAL n-gram counts (multiplicity kept — max(0, len−n+1),
    unlike the distinct-shingle generators above) and n_clip =
    Σ_g min(count_a(g), count_b(g)) — the clipped-match numerator of
    modified n-gram precision (Papineni et al. 2002).

    Tokens = the pinned RE2-\\s split; ALL tokens of both sides hash
    in ONE pandas-siphash call, n-grams are the Horner combine, and
    the per-pair clip is a sorted-multiset intersection (np.unique
    counts + searchsorted) — per-row Python is only the O(pairs) loop
    around vectorized kernels, the verify-stage posture shared with
    the sequential codecs."""
    from .textstats import poly_kgram_hashes

    toks_a = [_re2_word_split(t) for t in texts_a]
    toks_b = [_re2_word_split(t) for t in texts_b]
    lens = [len(w) for w in toks_a] + [len(w) for w in toks_b]
    total = sum(lens)
    P = len(texts_a)
    na = np.zeros(P, np.int64)
    nb = np.zeros(P, np.int64)
    nc = np.zeros(P, np.int64)
    if total == 0:
        return na, nb, nc
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in toks_a:
        flat[pos : pos + len(w)] = w
        pos += len(w)
    for w in toks_b:
        flat[pos : pos + len(w)] = w
        pos += len(w)
    h = hash_str_array(flat)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    for i in range(P):
        ha = h[offs[i] : offs[i + 1]]
        hb = h[offs[P + i] : offs[P + i + 1]]
        ga = poly_kgram_hashes(ha, n) if len(ha) >= n else np.zeros(0, np.uint64)
        gb = poly_kgram_hashes(hb, n) if len(hb) >= n else np.zeros(0, np.uint64)
        na[i], nb[i] = len(ga), len(gb)
        if len(ga) and len(gb):
            ua, ca = np.unique(ga, return_counts=True)
            ub, cb = np.unique(gb, return_counts=True)
            idx = np.searchsorted(ua, ub)
            idx[idx >= len(ua)] = len(ua) - 1
            hit = ua[idx] == ub
            nc[i] = np.minimum(ca[idx[hit]], cb[hit]).sum()
    return na, nb, nc
