"""Text-analysis operators for large-scale training-data pipelines.

All operators are vectorized ``map_batches`` transforms over a text
column (Arrow in / Arrow out) — language-ID (stopword n-gram
heuristic), quality scoring (length/punct/stopword ratios), token
counting (whitespace + a BPE-ish regex), and document fingerprinting
(md5 + winnowing rolling hash). The reference engine has no string
functions beyond Atoi (SURVEY §2.5); these are the additional
capabilities a 100 TB text pipeline needs.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- tokens

_BPE_ISH = re.compile(r"\w+|[^\w\s]")  # words or single punctuation marks
_PUNCT = set(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")

_EN_STOP = {"the", "and", "of", "a", "to", "in", "is", "with", "for", "on", "this", "that", "how"}
_IT_STOP = {"il", "la", "di", "e", "un", "una", "che", "per", "con", "come", "della", "sopra", "tra", "i"}


# The ONLY whitespace class used for trimming anywhere in the engine:
# exactly RE2's \s (= [\t\n\f\r ]), the class DuckDB's regexp kernels
# share. utf8_trim_whitespace is Unicode-wide (\v, NBSP, U+2028, ...)
# and silently diverges from every `\s`-based SQL oracle on docs padded
# with those characters — the round-4 t_pack_seqs driver-hash failure.
RE2_WS = "\t\n\f\r "

# DuckDB's bare trim(x) class, probed exhaustively: exactly the Unicode
# Zs (space-separator) category — NOT \t/\n (kept) and NOT the Unicode
# White_Space property (utf8_trim_whitespace adds \v, U+0085, U+2028/9).
# Oracles written with trim() must be mirrored with THIS class.
DUCKDB_TRIM = "\x20\xa0\u1680" + "".join(chr(c) for c in range(0x2000, 0x200B)) + "\u202f\u205f\u3000"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens = number of maximal non-whitespace runs (0 for blank).

    Whitespace = RE2 \\s ([\\t\\n\\f\\r ]) on BOTH trim and split, so a
    DuckDB oracle written as regexp_replace(x,'^\\s+|\\s+$','','g') +
    regexp_split_to_array(x,'\\s+') matches byte-for-byte on any input,
    including \\n/\\t-padded and NBSP-bearing docs. Null text counts 0.
    """
    trimmed = pc.utf8_trim(pc.fill_null(batch.column(text_col), ""), characters=RE2_WS)
    splits = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    n = pc.list_value_length(splits).to_numpy(zero_copy_only=False).astype(np.int64)
    blank = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    n[blank] = 0
    return batch.append_column("n_tokens", pa.array(n))


def long_token_count_batch(batch: pa.Table, text_col: str = "text", min_len: int = 4) -> pa.Table:
    """n_long = number of tokens (RE2-\\s runs, same split as
    ``token_count_batch``) of length >= ``min_len`` characters — the
    integer numerator of the short-token quality ratio. Fully
    vectorized: one regex split, one utf8_length, one reduceat-style
    per-list sum over the ListArray offsets; no Python loop. Blank /
    null docs count 0 (their single empty split token is < min_len).
    SQL twin: ``len(list_filter(regexp_split_to_array(trimmed,
    '\\s+'), x -> length(x) >= min_len))`` — both engines count
    characters, not bytes."""
    trimmed = pc.utf8_trim(pc.fill_null(batch.column(text_col), ""), characters=RE2_WS)
    splits = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    la = splits.combine_chunks() if isinstance(splits, pa.ChunkedArray) else splits
    ok = (
        pc.greater_equal(pc.utf8_length(la.values), min_len)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    offs = np.asarray(la.offsets)
    csum = np.concatenate([[0], np.cumsum(ok)])
    n_long = (csum[offs[1:]] - csum[offs[:-1]]).astype(np.int64)
    return batch.append_column("n_long", pa.array(n_long))


def bpe_ish_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Regex token count: words + punctuation marks counted separately
    (an approximation of BPE-style pre-tokenization)."""
    texts = batch.column(text_col).to_pylist()
    n = np.fromiter((len(_BPE_ISH.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts))
    return batch.append_column("n_bpe_tokens", pa.array(n))


# ---------------------------------------------------------------- normalize

def normalize_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Training-corpus text normalization, fully vectorized in Arrow
    kernels: lowercase → collapse whitespace runs to single spaces →
    trim. Appends ``text_norm`` (the original column is untouched —
    normalization is a derived view, never destructive)."""
    t = pc.utf8_lower(batch.column(text_col))
    t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
    # DUCKDB_TRIM (Zs), not utf8_trim_whitespace: the matching oracle is
    # DuckDB trim(regexp_replace(lower(x),'\s+',' ','g')) — trim() keeps
    # \v/U+2028 (White_Space-but-not-Zs) that utf8_trim_whitespace strips,
    # and strips NBSP/U+3000 (Zs) that an RE2-\s trim would keep.
    t = pc.utf8_trim(t, characters=DUCKDB_TRIM)
    return batch.append_column("text_norm", t)


# ---------------------------------------------------------------- PII redaction

# Applied IN ORDER, each pattern counted on the text as left by the
# previous replacement — the order is part of the operator's contract
# (and of the SQL oracle). RE2 syntax only: pyarrow and DuckDB both
# compile these with RE2, so one pattern string serves both engines.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def redact_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII redaction for training corpora: mask emails, IPv4 addresses
    and phone numbers with typed placeholder tokens, fully vectorized
    (RE2 kernels — no Python loop over rows).

    Appends ``n_email`` / ``n_ip`` / ``n_phone`` (non-overlapping match
    counts, each counted after the previous pattern's replacement) and
    ``text_redacted``. The original column is untouched. The reference
    engine has no string surface at all (SURVEY §2.5); this is a
    standard web-corpus preparation stage.
    """
    t = pc.fill_null(batch.column(text_col), "")
    out = batch
    for name, pat, repl in PII_PATTERNS:
        n = pc.count_substring_regex(t, pat)
        out = out.append_column(f"n_{name}", pc.cast(n, pa.int64()))
        t = pc.replace_substring_regex(t, pattern=pat, replacement=repl)
    return out.append_column("text_redacted", t)


# ---------------------------------------------------------------- quality

def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer quality facets (SQL-checkable) + a float score.

    n_chars_utf8: UTF-8 character count; n_punct: ASCII punctuation
    chars; n_upper: ASCII uppercase [A-Z]; n_digit: ASCII digits [0-9]
    (ASCII classes match the DuckDB oracle's [[:punct:]]/[A-Z]/[0-9]
    exactly on non-ASCII input too — Unicode str.isupper() would not).
    quality_score in [0,1]: penalizes very short docs, high punct
    ratio, and all-caps shouting (heuristic, documented here as THE
    definition — deterministic pure function of the text).

    Fully vectorized: pyarrow utf8_length + count_substring_regex (RE2
    char classes), no per-character Python loops.
    """
    col = pc.fill_null(batch.column(text_col), "")
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)

    def _count(pattern: str) -> np.ndarray:
        return (
            pc.count_substring_regex(col, pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )

    n_punct = _count(r"[!-/:-@\[-`{-~]")  # the 32 ASCII punctuation chars
    n_upper = _count(r"[A-Z]")
    n_digit = _count(r"[0-9]")
    denom = np.maximum(n_chars, 1).astype(np.float64)
    punct_ratio = n_punct / denom
    upper_ratio = n_upper / denom
    length_term = np.clip(n_chars / 200.0, 0.0, 1.0)
    score = length_term * (1.0 - np.clip(punct_ratio * 4, 0, 1)) * (1.0 - np.clip(upper_ratio * 2, 0, 1))
    out = batch
    for name, arr in [
        ("n_chars_utf8", n_chars),
        ("n_punct", n_punct),
        ("n_upper", n_upper),
        ("n_digit", n_digit),
    ]:
        out = out.append_column(name, pa.array(arr))
    return out.append_column("quality_score", pa.array(score))


# ---------------------------------------------------------------- repetition

def repetition_stats_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Gopher-style repetition quality signals, per document:

    - ``n_words``: whitespace-token count (same ``\\s+`` split /
      drop-empties tokenizer as ``doc_words`` — oracle-parity proven)
    - ``top_word_frac``: occurrences of the most frequent word / n_words
    - ``top_2gram_frac``: occurrences of the most frequent word 2-gram
      / total 2-grams
    - ``dup_2gram_frac``: 1 − distinct 2-grams / total 2-grams

    Heavily repeated boilerplate (nav bars, SEO spam) scores high on
    all three; the Gopher rules filter on thresholds over exactly these
    fractions. Fully vectorized: one siphash pass over every token
    occurrence, per-(doc, term) counts via lexsort + run-length
    boundaries — no Python loop over rows or words. 2-grams combine the
    two word hashes with a 64-bit odd-constant multiply (collision odds
    ~1e-16 per doc at these sizes). Fractions are 0 for docs with no
    words / no 2-grams, rounded to 6dp (oracle does the same)."""
    from .dedup import hash_str_array

    n_docs = len(batch)
    text = pc.fill_null(batch.column(text_col), "")
    parts = pc.split_pattern_regex(text, pattern=r"\s+")
    lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = parts.combine_chunks().flatten()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    words = flat.to_numpy(zero_copy_only=False)[keep]
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)[keep]
    wh = hash_str_array(words) if len(words) else np.zeros(0, dtype=np.uint64)

    def _run_stats(d: np.ndarray, h: np.ndarray):
        """Per-doc (total, top-run, n-runs) of (d, h) pairs."""
        total = np.bincount(d, minlength=n_docs)
        top = np.zeros(n_docs, dtype=np.int64)
        nruns = np.zeros(n_docs, dtype=np.int64)
        if len(d):
            order = np.lexsort((h, d))
            ds, hs = d[order], h[order]
            new = np.ones(len(ds), dtype=bool)
            new[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
            run_id = np.cumsum(new) - 1
            run_n = np.bincount(run_id)
            run_doc = ds[new]
            np.maximum.at(top, run_doc, run_n)
            nruns = np.bincount(run_doc, minlength=n_docs)
        return total, top, nruns

    n_words, top_w, _ = _run_stats(doc_idx, wh)
    adj = doc_idx[1:] == doc_idx[:-1] if len(doc_idx) else np.zeros(0, dtype=bool)
    g_doc = doc_idx[:-1][adj]
    gh = wh[:-1][adj] * np.uint64(0x9E3779B97F4A7C15) + wh[1:][adj]
    n_grams, top_g, distinct_g = _run_stats(g_doc, gh)

    def frac(num: np.ndarray, den: np.ndarray) -> np.ndarray:
        out = np.zeros(n_docs)
        nz = den > 0
        out[nz] = num[nz] / den[nz]
        return np.round(out, 6)

    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words.astype(np.int64)),
            "top_word_frac": pa.array(frac(top_w, n_words)),
            "top_2gram_frac": pa.array(frac(top_g, n_grams)),
            "dup_2gram_frac": pa.array(frac(n_grams - distinct_g, n_grams)),
        }
    )


# ---------------------------------------------------------------- tf-idf

def tfidf_top_terms(
    ds: "ray.data.Dataset",
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Top-``k`` TF-IDF terms per document: score = tf · ln(N / df),
    rounded to 6dp, ranked (tfidf desc, word asc) with ``rk`` 1..k.
    Same ``\\s+`` tokenizer as ``doc_words`` (oracle-parity proven).

    Scale shape — no vocabulary broadcast and no per-doc groups:
    1. ONE map_batches emits complete (doc, word, tf) rows — a doc is
       one input row, so its term counts never span batches; counting
       is the lexsort/run-length kernel, no Python loop.
    2. df comes from the count BSP over 64-bit word hashes (the
       ``count_i64_keys`` shape — vocabulary never leaves the
       workers; hash collisions merge two words' df with probability
       ~|V|²/2⁶⁴, negligible and strictly bounded, documented here).
    3. tf ⋈ df is an Acero int-key join (co-located by word hash).
    4. Per-batch local top-k per doc (a combiner: the global top-k is
       a subset of the union of per-batch top-ks), THEN an exact
       top-k inside ~``num_buckets`` hash-bucketed groups — the
       final shuffle moves O(k · partitions) rows per doc, and no
       per-user/per-doc tiny ``map_groups`` groups exist anywhere."""
    import pandas as pd

    import ray.data

    from ..util import compact_for_join, count_i64_keys, ensure_schema
    from .dedup import hash_str_array

    _STR = pa.string()
    n_docs = ds.count()
    P = num_partitions

    def tf_rows(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "word": pa.array([], _STR),
                "tf": pa.array([], pa.int64()),
                "wh": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        text = pc.fill_null(batch.column(text_col), "")
        parts = pc.split_pattern_regex(text, pattern=r"\s+")
        lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = parts.combine_chunks().flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        words = flat.to_numpy(zero_copy_only=False)[keep]
        if len(words) == 0:
            return empty
        doc_ids = np.repeat(
            batch.column(id_col).to_numpy(zero_copy_only=False), lengths
        )[keep]
        wh = hash_str_array(words).view(np.int64)
        order = np.lexsort((wh, doc_ids))
        d_s, h_s, w_s = doc_ids[order], wh[order], words[order]
        new = np.ones(len(d_s), dtype=bool)
        new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        run_id = np.cumsum(new) - 1
        tf = np.bincount(run_id)
        first = np.nonzero(new)[0]
        return pa.table(
            {
                "doc_id": pa.array(d_s[first]),
                "word": pa.array(w_s[first], _STR),
                "tf": pa.array(tf.astype(np.int64)),
                "wh": pa.array(h_s[first]),
            }
        )

    tf_ds = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()
    df_ds = count_i64_keys(tf_ds, "wh", count_col="df").map_batches(
        ensure_schema({"wh": pa.int64(), "df": pa.int64()}), batch_format="pyarrow"
    )
    joined = compact_for_join(tf_ds, P).join(
        compact_for_join(
            df_ds.map_batches(
                lambda t: pa.table({"wh2": t.column("wh"), "df": t.column("df")}),
                batch_format="pyarrow",
            ),
            P,
        ),
        join_type="inner", num_partitions=P, on=("wh",), right_on=("wh2",),
    )
    kk = k
    nb = num_buckets

    def score_prune(t: pa.Table) -> pd.DataFrame:
        if "doc_id" not in t.column_names or len(t) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "word": pd.Series([], dtype=object),
                    "tfidf": pd.Series([], dtype="float64"),
                    "tf": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="uint64"),
                }
            )
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        df = t.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        s6 = np.round(tf * np.log(n_docs / df), 6)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        out = pd.DataFrame(
            {
                "doc_id": doc,
                "word": t.column("word").to_numpy(zero_copy_only=False),
                "tfidf": s6,
                "tf": t.column("tf").to_numpy(zero_copy_only=False),
                "bucket": (doc.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                % np.uint64(nb),
            }
        )
        out = (
            out.sort_values(["doc_id", "tfidf", "word"], ascending=[True, False, True], kind="mergesort")
            .groupby("doc_id", sort=False)
            .head(kk)
        )
        return out

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "tfidf", "word"], ascending=[True, False, True], kind="mergesort"
        )
        g = g.groupby("doc_id", sort=False).head(kk).copy()
        g["rk"] = g.groupby("doc_id", sort=False).cumcount() + 1
        return g[["doc_id", "word", "tf", "tfidf", "rk"]]

    return (
        joined.map_batches(score_prune, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(final_topk, batch_format="pandas")
    )


# ---------------------------------------------------------------- lang id

class LangId:
    """Stateful language-ID stage (actor pool): stopword-set voting over
    lowercased word tokens. en / it / und. Word regex compiled once per
    actor (SURVEY §2.4 C8 pattern)."""

    def __init__(self) -> None:
        self.word = re.compile(r"[a-zà-ú]+")

    def classify(self, text: str) -> str:
        words = self.word.findall((text or "").lower())
        if not words:
            return "und"
        en = sum(w in _EN_STOP for w in words)
        it = sum(w in _IT_STOP for w in words)
        if en == 0 and it == 0:
            return "und"
        return "en" if en >= it else "it"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


# ---------------------------------------------------------------- fingerprints

def md5_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    digests = [
        hashlib.md5((t or "").encode("utf-8")).hexdigest()
        for t in batch.column(text_col).to_pylist()
    ]
    return batch.append_column("fingerprint", pa.array(digests, pa.string()))


_ROLL_BASE = np.uint64(1000003)
_MASK = np.uint64((1 << 61) - 1)


def poly_kgram_hashes(vals: np.ndarray, k: int) -> np.ndarray:
    """Polynomial hashes of all k-grams of a uint64 value array:
    h[i] = Σ_j vals[i+j]·B^(k-1-j) mod 2^64 — Horner over k shifted
    slices (k vector ops, no per-position Python loop). Shared kernel
    for winnowing (byte grams) and char-shingle hashing."""
    if len(vals) == 0:
        return np.zeros(0, dtype=np.uint64)
    if len(vals) < k:
        k = len(vals)  # short input: one gram covering everything
    L = len(vals) - k + 1
    with np.errstate(over="ignore"):
        h = np.zeros(L, dtype=np.uint64)
        for j in range(k):
            h = h * _ROLL_BASE + vals[j : j + L]
    return h


def _kgram_hashes(text: str, k: int) -> np.ndarray:
    """Rolling polynomial hashes of all byte k-grams of the text."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    return poly_kgram_hashes(b, k)


def winnow_fingerprint(text: str, k: int = 8, w: int = 16) -> int:
    """Winnowing (Schleimer et al. 2003): min k-gram hash per window,
    xor-folded to one int64 document fingerprint. Deterministic."""
    h = _kgram_hashes(text, k)
    if len(h) == 0:
        return 0
    if len(h) <= w:
        sel = np.array([h.min()])
    else:
        idx = np.arange(len(h) - w + 1)[:, None] + np.arange(w)[None, :]
        sel = np.unique(h[idx].min(axis=1))
    out = np.uint64(0)
    with np.errstate(over="ignore"):
        for v in sel:
            out ^= np.uint64(v) * _ROLL_BASE & _MASK
    return int(out & np.uint64((1 << 63) - 1))


def winnow_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [winnow_fingerprint(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("winnow_fp", pa.array(np.asarray(fps, dtype=np.int64)))


# ---------------------------------------------------------------- heavy hitters


def top_k_words(ds: "object", k: int = 25, cms_w: int = 1 << 15, cms_d: int = 4):
    """Corpus-wide top-k most frequent words (ties → word asc) with a
    count-min-sketch cross-check — the distributed heavy-hitters shape:

    1. ONE tokenize pass (the proven \\s+ doc_words split) emits
       per-batch PRE-AGGREGATED (word, partial_count) rows — the
       exchange is O(batch_vocab × batches), never O(tokens) — plus a
       per-batch CMS partial (one 2^15×4 counter table per batch).
    2. Exact counts: weighted count BSP over the siphashed word
       (count_i64_keys(weight_col=...) — no row-level string groupby).
    3. The k-th largest count is found from per-reducer-block top-k
       partials (no full sort); every hash at/above the threshold is a
       candidate (boundary ties included).
    4. Candidate words are resolved from the small pre-aggregated rows
       by a broadcast sorted-hash filter, then the driver sorts the
       ≤ k + ties survivors (cnt desc, word asc) and cuts to k.
    5. Self-gate: merged-CMS estimates must bound the exact counts from
       above within εN (ε = e / cms_w) — a broken exact path or a
       broken sketch flips ``cms_ok`` and the SQL twin turns red.

    64-bit siphash collisions would merge two words' counts
    (prob ≈ vocab² / 2^64 — negligible; documented, not silent).

    Returns a pyarrow Table (word, n, cms_ok).
    """
    import ray

    from ..util import count_i64_keys, semi_join_filter, topk_rows
    from .dedup import hash_str_array

    def partials(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        parts = pc.split_pattern_regex(text, pattern=r"\s+")
        flat = parts.combine_chunks().flatten()
        words = flat.to_numpy(zero_copy_only=False)
        words = words[words != ""]
        if len(words) == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "h": pa.array([], pa.int64()),
                    "pc_": pa.array([], pa.int64()),
                    "cms": pa.array([], pa.binary()),
                }
            )
        uniq, cnt = np.unique(words, return_counts=True)
        h = hash_str_array(uniq.astype(object))
        from .sketches import CountMinSketch

        cms = CountMinSketch(cms_w, cms_d).add_hashes(h, cnt)
        sk = [cms.to_bytes()] + [None] * (len(uniq) - 1)
        return pa.table(
            {
                "word": pa.array(list(uniq), pa.string()),
                "h": pa.array(h.view(np.int64)),
                "pc_": pa.array(cnt.astype(np.int64)),
                "cms": pa.array(sk, pa.binary()),
            }
        )

    pre = ds.map_batches(partials, batch_format="pyarrow").materialize()

    counts = count_i64_keys(
        pre.select_columns(["h", "pc_"]), "h", count_col="n", weight_col="pc_"
    )
    top = topk_rows(counts, [("n", True), ("h", False)], k).to_pandas()
    if len(top) == 0:
        return pa.table(
            {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
             "cms_ok": pa.array([], pa.bool_())}
        )
    thresh = int(top["n"].min())
    cand = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), thresh)),
        batch_format="pyarrow",
    ).to_pandas()  # ≤ k + boundary ties rows

    # resolve hash → word from the pre-aggregated rows (broadcast filter)
    cand_hashes = np.sort(cand["h"].to_numpy())
    resolved = (
        semi_join_filter(pre.select_columns(["word", "h"]), "h", cand_hashes)
        .to_pandas()
        .drop_duplicates("h")
    )
    out = cand.merge(resolved, on="h").sort_values(
        ["n", "word"], ascending=[False, True], kind="mergesort"
    ).head(k)

    # merge CMS partials (driver: one 1 MiB table per batch, summed)
    from .sketches import CountMinSketch

    # merge CMS partials REMOTELY (one per-block merge stage → ≤ 1 row
    # per block reaches the driver; at web scale the pre rows are
    # vocab × blocks and a driver-side scan over them would be the
    # slowest stage of the query)
    def merge_cms(t: pa.Table) -> pa.Table:
        part = None
        for b in t.column("cms").drop_null().to_pylist():
            c = CountMinSketch.from_bytes(b, cms_w, cms_d)
            part = c if part is None else part.merge(c)
        sk = [] if part is None else [part.to_bytes()]
        return pa.table({"cms": pa.array(sk, pa.binary())})

    acc = CountMinSketch(cms_w, cms_d)
    for row in (
        pre.select_columns(["cms"])
        .map_batches(merge_cms, batch_format="pyarrow", batch_size=1 << 16)
        .take_all()
    ):
        acc.merge(CountMinSketch.from_bytes(row["cms"], cms_w, cms_d))
    total_n = int(acc.table[0].sum())
    est = acc.estimate_hashes(out["h"].to_numpy().view(np.uint64))
    exact = out["n"].to_numpy()
    eps_n = max(5.0, np.e / cms_w * total_n)
    ok = bool((est >= exact).all() and (est - exact <= eps_n).all())
    return pa.table(
        {
            "word": pa.array(list(out["word"]), pa.string()),
            "n": pa.array(exact.astype(np.int64)),
            "cms_ok": pa.array([ok] * len(out), pa.bool_()),
        }
    )


def word_entropy_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document Shannon entropy (bits) of the word distribution —
    a repetition/quality signal (low entropy = templated/repetitive
    text). Tokenization = the proven \\s+ doc_words split; documents
    with zero words emit no row (mirrored by the SQL oracle).

    Vectorized: one Arrow regex split for the whole batch, then a
    C-level pandas groupby over (doc, word) and a segmented
    -Σ p·log2(p) — no per-row Python loops."""
    text = pc.fill_null(batch.column(text_col), "")
    parts = pc.split_pattern_regex(text, pattern=r"\s+")
    lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = parts.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    doc_ids = np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), lengths)
    keep = flat != ""
    flat, doc_ids = flat[keep], doc_ids[keep]
    if len(flat) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "word_entropy": pa.array([], pa.float64())}
        )
    df = pd.DataFrame({"d": doc_ids, "w": flat})
    wc = df.groupby(["d", "w"], sort=False).size().reset_index(name="c")
    tot = wc.groupby("d", sort=False)["c"].transform("sum")
    p = wc["c"].to_numpy() / tot.to_numpy()
    ent = pd.Series(-p * np.log2(p)).groupby(wc["d"].to_numpy()).sum()
    return pa.table(
        {
            "doc_id": pa.array(ent.index.to_numpy().astype(np.int64)),
            "word_entropy": pa.array(np.round(ent.to_numpy(), 6)),
        }
    )


def unigram_surprisal(
    ds: "object", num_partitions: int = 8, broadcast_vocab: int = 4_000_000
):
    """Per-document mean unigram surprisal (bits/word): for each word
    occurrence w, -log2(count(w)/N) with counts/N over the WHOLE
    corpus; averaged per doc. Low = stereotyped/common text, high =
    rare-token-heavy — the corpus-statistics quality signal a training
    pipeline uses alongside entropy/repetition.

    Scale shape:
    1. explode docs → (doc_id, word_hash) rows (strings dropped at the
       batch boundary — only 8-byte hashes shuffle);
    2. corpus counts = per-batch pre-aggregated partials → the weighted
       count BSP (O(vocab × blocks) exchange, never O(tokens));
    3. HYBRID lookup (the q3 broadcast-plan pattern): when the vocab
       fits ``broadcast_vocab`` rows (16 B each), the frequency table
       is packed into sorted arrays in a remote task and every batch
       resolves counts via searchsorted — docs stay whole in their
       batch, so per-doc means finish inside map_batches with NO join
       and NO groupby (measured 11× faster at 200k docs / 24M words:
       41.4 s → 3.8 s at 32 CPUs).
       Above the threshold: one int64-keyed Acero hash join + per-doc
       pre-aggregated partials + one grouped sum (the scatter-tolerant
       general path).

    Deterministic; 64-bit siphash collisions would merge two words'
    counts (prob ≈ vocab²/2^64 — documented, negligible; the SQL twin
    compares by word STRING so a collision would turn the gate red
    rather than pass silently).

    Returns a Dataset (doc_id, surprisal) — docs with no words emit no
    row (mirrored by the oracle)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..util import compact_for_join, count_i64_keys
    from .dedup import hash_str_array

    def explode(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        parts = pc.split_pattern_regex(text, pattern=r"\s+")
        lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = parts.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False), lengths)
        keep = flat != ""
        words = flat[keep]
        h = hash_str_array(words) if len(words) else np.zeros(0, dtype=np.uint64)
        return pa.table(
            {"doc_id": pa.array(doc_ids[keep]), "h": pa.array(h.view(np.int64))}
        )

    words = ds.map_batches(explode, batch_format="pyarrow").materialize()

    def pre(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("h").to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"h": pa.array(u), "pc_": pa.array(c.astype(np.int64))})

    counts = count_i64_keys(
        words.map_batches(pre, batch_format="pyarrow"), "h", count_col="n", weight_col="pc_"
    ).materialize()
    total_n = int(
        counts.map_batches(
            lambda t: pa.table(
                {"s": pa.array([int(t.column("n").to_numpy(zero_copy_only=False).sum())])}
            ),
            batch_format="pyarrow",
        ).sum("s")
        or 0
    )
    if total_n == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "surprisal": pa.array([], pa.float64())})
        )

    vocab = counts.count()  # metadata of the materialized counts
    if vocab <= broadcast_vocab:
        # broadcast path: pack the frequency table remotely (driver
        # holds only the ref), re-tokenize per batch (docs are whole by
        # construction — one row each) and finish per doc in one map
        @ray.remote
        def pack(*blocks):
            hs = np.concatenate(
                [b.column("h").to_numpy(zero_copy_only=False) for b in blocks]
            )
            ns = np.concatenate(
                [b.column("n").to_numpy(zero_copy_only=False) for b in blocks]
            )
            order = np.argsort(hs)
            return hs[order], ns[order].astype(np.float64)

        lut_ref = pack.remote(*counts.to_arrow_refs())

        def direct(t: pa.Table) -> pa.Table:
            hs, ns = ray.get(lut_ref)
            text = pc.fill_null(t.column("text"), "")
            parts = pc.split_pattern_regex(text, pattern=r"\s+")
            lengths = (
                pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            flat = parts.combine_chunks().flatten().to_numpy(zero_copy_only=False)
            doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
            keep = flat != ""
            wrds, doc_idx = flat[keep], doc_idx[keep]
            if len(wrds) == 0:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()), "surprisal": pa.array([], pa.float64())}
                )
            h = hash_str_array(wrds).view(np.int64)
            n = ns[np.searchsorted(hs, h)]  # every word is in the table
            s = -np.log2(n / total_n)
            nw = np.bincount(doc_idx, minlength=len(t))
            ssum = np.bincount(doc_idx, s, len(t))
            nz = nw > 0
            return pa.table(
                {
                    "doc_id": pa.array(
                        t.column("doc_id").to_numpy(zero_copy_only=False)[nz].astype(np.int64)
                    ),
                    "surprisal": pa.array(np.round(ssum[nz] / nw[nz], 6)),
                }
            )

        return ds.map_batches(direct, batch_format="pyarrow")

    joined = compact_for_join(words, num_partitions).join(
        compact_for_join(counts, num_partitions),
        join_type="inner",
        on=("h",),
        right_on=("h",),
        num_partitions=num_partitions,
    )

    def partial(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names or len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "nw": pa.array([], pa.int64()),
                }
            )
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = -np.log2(n / total_n)
        u, inv = np.unique(d, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(u),
                "s": pa.array(np.bincount(inv, s, len(u))),
                "nw": pa.array(np.bincount(inv, minlength=len(u)).astype(np.int64)),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("s", alias_name="s"), Sum("nw", alias_name="nw"))
    )

    def fin(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names or len(t) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "surprisal": pa.array([], pa.float64())}
            )
        s = t.column("s").to_numpy(zero_copy_only=False)
        nw = t.column("nw").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "surprisal": pa.array(np.round(s / nw, 6)),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def prune_frequent_words(ds: "object", max_df_frac: float = 0.4):
    """Vocabulary-pruned text rewrite: drop every word whose DOCUMENT
    FREQUENCY exceeds ``max_df_frac`` of the corpus (the C4/CCNet-style
    stopword/boilerplate pruning step), rebuilding each document's text
    from the surviving words in order. See ``_prune_frequent_units``
    for the scale shape; ``prune_frequent_lines`` is the line-level
    sibling (RefinedWeb-style boilerplate removal)."""
    n_docs = ds.count()
    thresh = max_df_frac * n_docs
    return _prune_frequent_units(
        ds, split_pattern=r"\s+", join_str=" ", df_cut=thresh, inclusive=False,
        out_col="text_pruned",
    )


def prune_frequent_lines(
    ds: "object", min_df: int = 2, id_col: str = "doc_id", text_col: str = "text"
):
    """Boilerplate LINE removal (RefinedWeb/CCNet-style): drop every
    line occurring in ``min_df`` or more documents (nav bars, footers,
    cookie banners), rebuilding each document from its surviving
    non-empty lines. Same hybrid shape as the word-level pruner."""
    return _prune_frequent_units(
        ds, split_pattern=r"\n", join_str="\n", df_cut=float(min_df),
        inclusive=True, out_col="text_pruned", id_col=id_col, text_col=text_col,
    )


def _prune_frequent_units(
    ds: "object",
    split_pattern: str,
    join_str: str,
    df_cut: float,
    inclusive: bool,
    out_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Shared document-frequency pruning core (words or lines):

    1. df counts: each doc lives in one row, so per-batch DISTINCT
       (doc, unit-hash) partials are globally exact; a weighted count
       BSP sums them — O(vocab × blocks) exchange;
    2. the hot set (df over the cut) is by construction SMALL (units
       frequent across documents — stopwords/boilerplate) and
       broadcasts as one sorted hash array;
    3. one rewrite pass: explode, drop hot units with a searchsorted
       mask, reassemble per doc via Arrow ``binary_join`` on a rebuilt
       ListArray — no per-row Python string joins.

    Returns (id_col, out_col) for EVERY doc ('' when everything was
    pruned or the doc was empty)."""
    import ray
    import ray.data

    from ..util import count_i64_keys
    from .dedup import hash_str_array

    thresh = df_cut

    def df_partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column(text_col), "")
        parts = pc.split_pattern_regex(text, pattern=split_pattern)
        lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = parts.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        keep = flat != ""
        words, doc_idx = flat[keep], doc_idx[keep]
        if len(words) == 0:
            return pa.table({"h": pa.array([], pa.int64()), "pc_": pa.array([], pa.int64())})
        h = hash_str_array(words).view(np.int64)
        pairs = np.unique(np.stack([doc_idx, h]), axis=1)  # distinct per doc
        u, c = np.unique(pairs[1], return_counts=True)
        return pa.table({"h": pa.array(u), "pc_": pa.array(c.astype(np.int64))})

    df = count_i64_keys(
        ds.map_batches(df_partial, batch_format="pyarrow"), "h", count_col="df", weight_col="pc_"
    )
    cmp = pc.greater_equal if inclusive else pc.greater
    hot = df.map_batches(
        lambda t: t.filter(cmp(t.column("df"), thresh)).select(["h"]),
        batch_format="pyarrow",
    )
    hot_arr = np.sort(
        np.concatenate(
            [b.column("h").to_numpy(zero_copy_only=False) for b in hot.iter_batches(batch_format="pyarrow")]
            or [np.zeros(0, dtype=np.int64)]
        )
    )
    hot_ref = ray.put(hot_arr)

    def rewrite(t: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        text = pc.fill_null(t.column(text_col), "")
        parts = pc.split_pattern_regex(text, pattern=split_pattern)
        lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = parts.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        keep = flat != ""
        if keep.any() and len(hs):
            h = np.zeros(len(flat), dtype=np.int64)
            h[keep] = hash_str_array(flat[keep]).view(np.int64)
            pos = np.searchsorted(hs, h)
            pos[pos >= len(hs)] = len(hs) - 1
            keep &= ~(hs[pos] == h)
        words, doc_idx = flat[keep], doc_idx[keep]
        # rebuild one ListArray of kept words per doc → vectorized join
        counts = np.bincount(doc_idx, minlength=len(t))
        offsets = np.zeros(len(t) + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        la = pa.ListArray.from_arrays(pa.array(offsets), pa.array(words, pa.string()))
        joined = pc.binary_join(la, join_str)
        return pa.table({id_col: t.column(id_col), out_col: joined})

    return ds.map_batches(rewrite, batch_format="pyarrow")


def word_pair_pmi(
    ds: "object",
    window: int = 2,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
) -> "object":
    """Windowed word co-occurrence PMI (word2phrase-style phrase
    mining): for unordered word pairs co-occurring within ``window``
    positions, pmi = log2( p(a,b) / (p(a)·p(b)) ), over pairs with
    n(a,b) ≥ min_count.

    Scale shape: vectorized whitespace explode, ONE self-join on doc
    id (fan-out ≤ window·words per doc), per-batch pair-count partials
    where words are order-preserving dictionary-encoded so the min/max
    pair canonicalization runs on int codes, then one grouped sum whose
    key space is vocab-bounded (the same documented assumption as the
    heavy-hitters and quantile combiners). The ``min_count`` threshold
    and the PMI math run DISTRIBUTED in a map over the grouped pair
    sums — word totals attach via the hybrid broadcast-vocab lookup
    (``unigram_surprisal`` shape: the word-count table is packed into
    sorted arrays by a remote task; the driver holds only the
    ObjectRef and two scalar totals, never the raw pair table, which
    on open-vocab web text is orders of magnitude larger than the
    surviving phrases). ASCII corpora only for exact SQL tie parity
    (Python codepoint order == DuckDB binary collation there).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..util import compact_for_join, ensure_schema

    def explode(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column(text_col), "")
        parts = pc.split_pattern_regex(text, pattern=r"\s+")
        lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = parts.combine_chunks().flatten()
        doc_ids = np.repeat(t.column(id_col).to_numpy(zero_copy_only=False), lengths)
        ordinals = (
            np.concatenate([np.arange(1, n + 1) for n in lengths])
            if len(t)
            else np.zeros(0, dtype=np.int64)
        )
        w = flat.to_numpy(zero_copy_only=False)
        keep = w != ""
        return pa.table(
            {
                "doc": pa.array(doc_ids[keep]),
                "pos": pa.array(ordinals[keep]),
                "w": pa.array(w[keep], pa.string()),
            }
        )

    words = ds.map_batches(explode, batch_format="pyarrow").materialize()

    left = words.map_batches(
        lambda t: pa.table({"doc": t.column("doc"), "i": t.column("pos"), "a": t.column("w")})
        if "doc" in t.column_names
        else pa.table({"doc": pa.array([], pa.int64()), "i": pa.array([], pa.int64()), "a": pa.array([], pa.string())}),
        batch_format="pyarrow",
    )
    right = words.map_batches(
        lambda t: pa.table({"doc2": t.column("doc"), "j": t.column("pos"), "b": t.column("w")})
        if "doc" in t.column_names
        else pa.table({"doc2": pa.array([], pa.int64()), "j": pa.array([], pa.int64()), "b": pa.array([], pa.string())}),
        batch_format="pyarrow",
    )
    joined = compact_for_join(left, num_partitions).join(
        compact_for_join(right, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc",),
        right_on=("doc2",),
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        i = t.column("i").to_numpy(zero_copy_only=False)
        j = t.column("j").to_numpy(zero_copy_only=False)
        m = (j > i) & (j - i <= window)
        a = t.column("a").to_numpy(zero_copy_only=False)[m]
        b = t.column("b").to_numpy(zero_copy_only=False)[m]
        # order-preserving dictionary encode: min/max on int codes
        cats = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(cats, a)
        cb = np.searchsorted(cats, b)
        lo = np.minimum(ca, cb)
        hi = np.maximum(ca, cb)
        df = pd.DataFrame({"lo": lo, "hi": hi}).groupby(["lo", "hi"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "a": pa.array(cats[df["lo"].to_numpy()], pa.string()),
                "b": pa.array(cats[df["hi"].to_numpy()], pa.string()),
                "n": pa.array(df["n"].to_numpy(dtype=np.int64)),
            }
        )

    import ray

    pair_sums = (
        joined.map_batches(pair_partials, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    def word_partials(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "w" not in t.column_names:
            return pa.table({"w": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        vc = pd.Series(t.column("w").to_numpy(zero_copy_only=False)).value_counts()
        return pa.table(
            {"w": pa.array(vc.index.to_numpy(), pa.string()), "c": pa.array(vc.to_numpy(dtype=np.int64))}
        )

    wc = (
        words.map_batches(word_partials, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )

    # global totals: driver holds two scalars only
    n_words = float(wc.sum("c") or 0)
    n_pairs = float(pair_sums.sum("n") or 0)

    # word-count lookup packed remotely into sorted parallel arrays —
    # the hybrid broadcast-vocab shape (unigram_surprisal): the driver
    # only ever holds the ObjectRef, never the vocab rows
    @ray.remote
    def _pack_wc(*blocks):
        blocks = [b for b in blocks if "w" in b.column_names and len(b) > 0]
        if not blocks:
            return np.zeros(0, dtype=object), np.zeros(0, dtype=np.float64)
        ws = np.concatenate(
            [b.column("w").to_numpy(zero_copy_only=False) for b in blocks]
        )
        cs = np.concatenate(
            [b.column("c").to_numpy(zero_copy_only=False) for b in blocks]
        )
        valid = ws != None  # noqa: E711  — groupby can emit a null key row
        ws, cs = ws[valid], cs[valid]
        order = np.argsort(ws)
        return ws[order], cs[order].astype(np.float64)

    lut_ref = _pack_wc.remote(*wc.to_arrow_refs())

    def finish(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "pmi": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0 or "a" not in t.column_names:
            return empty
        # min_count threshold runs HERE, distributed — only surviving
        # phrases ever pay the vocab lookup; null group keys dropped
        keep = pc.and_kleene(
            pc.is_valid(t.column("a")),
            pc.greater_equal(t.column("n"), min_count),
        )
        t = t.filter(pc.fill_null(keep, False))
        if len(t) == 0:
            return empty
        ws, cs = ray.get(lut_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        ca = cs[np.searchsorted(ws, a)]
        cb = cs[np.searchsorted(ws, b)]
        pmi = np.round(np.log2((n / n_pairs) / ((ca / n_words) * (cb / n_words))), 6)
        return pa.table(
            {
                "a": pa.array(a, pa.string()),
                "b": pa.array(b, pa.string()),
                "n": pa.array(n.astype(np.int64)),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return pair_sums.map_batches(finish, batch_format="pyarrow")


def postings_topk(
    ds: "object",
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "object":
    """Inverted-index head: for every word, the top-``k`` documents by
    term frequency (ties → smaller doc id) — the posting-list build of
    a search index, truncated to its serving head.

    Scale shape: each document lives in ONE row, so per-batch
    (word, doc, tf) counts are globally exact with no fold; each batch
    then prunes locally to ≤ k candidates per word, so the single
    shuffle moves O(k × vocab × blocks) rows; the final per-word prune
    runs on the vocab-bounded candidate table (same documented
    bounded-vocabulary contract as the heavy hitters / PMI operators).
    """
    import ray.data

    def tf_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or text_col not in t.column_names:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        text = pc.fill_null(t.column(text_col), "")
        parts = pc.split_pattern_regex(text, pattern=r"\s+")
        lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = parts.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        docs = np.repeat(t.column(id_col).to_numpy(zero_copy_only=False), lengths)
        keep = flat != ""
        df = (
            pd.DataFrame({"word": flat[keep], id_col: docs[keep]})
            .groupby(["word", id_col], sort=False)
            .size()
            .reset_index(name="tf")
        )
        # local prune: ≤ k candidates per word leave this batch
        df = (
            df.sort_values(["word", "tf", id_col], ascending=[True, False, True], kind="stable")
            .groupby("word", sort=False)
            .head(k)
        )
        return pa.table(
            {
                "word": pa.array(df["word"].to_numpy(), pa.string()),
                id_col: pa.array(df[id_col].to_numpy(dtype=np.int64)),
                "tf": pa.array(df["tf"].to_numpy(dtype=np.int64)),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["tf", id_col], ascending=[False, True], kind="stable"
        ).head(k)[["word", id_col, "tf"]]

    return (
        ds.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("word")
        .map_groups(final, batch_format="pandas")
    )


def bigram_surprisal(
    ds: "object", num_partitions: int = 8, broadcast_vocab: int = 4_000_000
):
    """Per-document mean bigram surprisal (bits/transition): for each
    adjacent word pair (w1, w2), -log2( count(w1,w2) / count(w1) ) with
    counts over the WHOLE corpus; averaged per doc. The conditional
    next-word-probability quality signal one step up from
    ``unigram_surprisal`` — low = formulaic/boilerplate transitions,
    high = unusual phrasing.

    Scale shape mirrors unigram_surprisal:
    1. one tokenize pass emits (doc, h1) unigram rows and
       (doc, h1, bh) bigram rows — bh is the Horner combine
       h1·B + h2 (the poly_kgram_hashes formula at k=2), so only
       8-byte hashes ever shuffle;
    2. corpus unigram/bigram counts via the weighted count BSP;
    3. HYBRID finish: bigram vocab ≤ ``broadcast_vocab`` → both count
       tables packed remotely into sorted arrays, docs finish in ONE
       map (no join, no groupby); above → two int64-keyed hash joins
       + per-doc partial sums + one grouped sum.

    Docs with < 2 kept words emit no row (mirrored by the oracle).
    64-bit hash collisions merge counts (prob ≈ vocab²/2^64; the SQL
    twin compares by STRING so a collision turns the gate red, never
    silently passes)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..util import compact_for_join, count_i64_keys
    from .dedup import hash_str_array

    def tokenize(t: pa.Table):
        text = pc.fill_null(t.column("text"), "")
        parts = pc.split_pattern_regex(text, pattern=r"\s+")
        lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = parts.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False), lengths)
        keep = flat != ""
        words = flat[keep]
        h = hash_str_array(words).view(np.int64) if len(words) else np.zeros(0, dtype=np.int64)
        return doc_ids[keep], h

    def explode(t: pa.Table) -> pa.Table:
        d, h = tokenize(t)
        return pa.table({"doc_id": pa.array(d.astype(np.int64)), "h": pa.array(h)})

    def explode_bigrams(t: pa.Table) -> pa.Table:
        d, h = tokenize(t)
        if len(h) < 2:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "h1": pa.array([], pa.int64()), "bh": pa.array([], pa.int64())}
            )
        adj = d[:-1] == d[1:]
        with np.errstate(over="ignore"):
            bh = (h[:-1].view(np.uint64) * _ROLL_BASE + h[1:].view(np.uint64)).view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d[:-1][adj].astype(np.int64)),
                "h1": pa.array(h[:-1][adj]),
                "bh": pa.array(bh[adj]),
            }
        )

    words = ds.map_batches(explode, batch_format="pyarrow")
    bigrams = ds.map_batches(explode_bigrams, batch_format="pyarrow").materialize()

    def pre(col):
        def fn(t: pa.Table) -> pa.Table:
            if col not in t.column_names or len(t) == 0:
                return pa.table({col: pa.array([], pa.int64()), "pc_": pa.array([], pa.int64())})
            u, c = np.unique(t.column(col).to_numpy(zero_copy_only=False), return_counts=True)
            return pa.table({col: pa.array(u), "pc_": pa.array(c.astype(np.int64))})

        return fn

    cnt1 = count_i64_keys(
        words.map_batches(pre("h"), batch_format="pyarrow"), "h", count_col="n1", weight_col="pc_"
    ).materialize()
    cnt2 = count_i64_keys(
        bigrams.map_batches(pre("bh"), batch_format="pyarrow"), "bh", count_col="n2", weight_col="pc_"
    ).materialize()

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "bigram_surprisal": pa.array([], pa.float64())}
    )

    if cnt2.count() <= broadcast_vocab:

        @ray.remote
        def pack(key_col, val_col, *blocks):
            blocks = [b for b in blocks if key_col in b.column_names and len(b) > 0]
            if not blocks:
                return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
            ks = np.concatenate([b.column(key_col).to_numpy(zero_copy_only=False) for b in blocks])
            vs = np.concatenate([b.column(val_col).to_numpy(zero_copy_only=False) for b in blocks])
            order = np.argsort(ks)
            return ks[order], vs[order].astype(np.float64)

        lut1 = pack.remote("h", "n1", *cnt1.to_arrow_refs())
        lut2 = pack.remote("bh", "n2", *cnt2.to_arrow_refs())

        def direct(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "text" not in t.column_names:
                return empty
            hs1, ns1 = ray.get(lut1)
            hs2, ns2 = ray.get(lut2)
            d, h = tokenize(t)
            if len(h) < 2:
                return empty
            adj = d[:-1] == d[1:]
            if not adj.any():
                return empty
            with np.errstate(over="ignore"):
                bh = (h[:-1].view(np.uint64) * _ROLL_BASE + h[1:].view(np.uint64)).view(np.int64)
            h1 = h[:-1][adj]
            bh = bh[adj]
            db = d[:-1][adj]
            c1 = ns1[np.searchsorted(hs1, h1)]
            c2 = ns2[np.searchsorted(hs2, bh)]
            s = -np.log2(c2 / c1)
            u, inv = np.unique(db, return_inverse=True)
            ssum = np.bincount(inv, s, len(u))
            ncnt = np.bincount(inv, minlength=len(u))
            return pa.table(
                {
                    "doc_id": pa.array(u.astype(np.int64)),
                    "bigram_surprisal": pa.array(np.round(ssum / ncnt, 6)),
                }
            )

        return ds.map_batches(direct, batch_format="pyarrow")

    # join path: two int64-keyed hash joins + grouped per-doc sums
    j = compact_for_join(bigrams, num_partitions).join(
        compact_for_join(cnt2, num_partitions),
        join_type="inner",
        on=("bh",),
        right_on=("bh",),
        num_partitions=num_partitions,
    )
    j = compact_for_join(
        j.map_batches(
            lambda t: pa.table(
                {"doc_id": t.column("doc_id"), "h1": t.column("h1"), "n2": t.column("n2")}
            )
            if "doc_id" in t.column_names
            else pa.table(
                {"doc_id": pa.array([], pa.int64()), "h1": pa.array([], pa.int64()), "n2": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        num_partitions,
    ).join(
        compact_for_join(cnt1, num_partitions),
        join_type="inner",
        on=("h1",),
        right_on=("h",),
        num_partitions=num_partitions,
    )

    def partial(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names or len(t) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "s": pa.array([], pa.float64()), "nb": pa.array([], pa.int64())}
            )
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = -np.log2(
            t.column("n2").to_numpy(zero_copy_only=False).astype(np.float64)
            / t.column("n1").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        u, inv = np.unique(d, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(u),
                "s": pa.array(np.bincount(inv, s, len(u))),
                "nb": pa.array(np.bincount(inv, minlength=len(u)).astype(np.int64)),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("s", alias_name="s"), Sum("nb", alias_name="nb"))
    )

    def fin(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names or len(t) == 0:
            return empty
        s = t.column("s").to_numpy(zero_copy_only=False)
        nb = t.column("nb").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "bigram_surprisal": pa.array(np.round(s / nb, 6)),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def lexical_diversity_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Per-document lexical-diversity signals: ``n_words``,
    ``n_distinct`` (distinct words in the doc), ``ttr`` (type-token
    ratio = distinct/words) and ``hapax_frac`` (fraction of word
    OCCURRENCES whose word appears exactly once in the doc) — the
    vocabulary-richness facet of quality filtering (low TTR = template
    spam / repetition). Fully vectorized: one siphash pass, per-(doc,
    word) run-length boundaries from a lexsort (the repetition_stats
    kernel shape). Docs with no words emit NO row (oracle mirrors).
    Fractions 6dp."""
    from .dedup import hash_str_array

    n_docs = len(batch)
    text = pc.fill_null(batch.column(text_col), "")
    parts = pc.split_pattern_regex(text, pattern=r"\s+")
    lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = parts.combine_chunks().flatten()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    words = flat.to_numpy(zero_copy_only=False)[keep]
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)[keep]
    total = np.bincount(doc_idx, minlength=n_docs)
    distinct = np.zeros(n_docs, dtype=np.int64)
    hapax_occ = np.zeros(n_docs, dtype=np.int64)
    if len(words):
        h = hash_str_array(words)
        order = np.lexsort((h, doc_idx))
        ds, hs = doc_idx[order], h[order]
        new = np.ones(len(ds), dtype=bool)
        new[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
        run_id = np.cumsum(new) - 1
        run_n = np.bincount(run_id)
        run_doc = ds[new]
        distinct = np.bincount(run_doc, minlength=n_docs)
        hapax_occ = np.bincount(run_doc[run_n == 1], minlength=n_docs)
    nz = total > 0
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)[nz].astype(np.int64)
    tot = total[nz].astype(np.float64)
    return pa.table(
        {
            id_col: pa.array(ids),
            "n_words": pa.array(total[nz]),
            "n_distinct": pa.array(distinct[nz]),
            "ttr": pa.array(np.round(distinct[nz] / tot, 6)),
            "hapax_frac": pa.array(np.round(hapax_occ[nz] / tot, 6)),
        }
    )


def zipf_word_alpha(ds: "object", xmin: int = 2) -> "object":
    """Zipf/power-law exponent of the corpus WORD-FREQUENCY
    distribution (Clauset-style discrete MLE, same estimator as the
    degree power law): alpha = 1 + n / Σ ln(c / (xmin − 0.5)) over
    words with count ≥ xmin. The corpus-statistics sanity check that a
    web corpus's vocabulary follows its expected heavy tail.

    Scale shape: one tokenize pass emitting per-batch pre-aggregated
    (word-hash, partial count) rows → weighted count BSP → per-batch
    (n, Σ ln) scalar partials → one tiny fold. Returns one row
    (n_tail, alpha 6dp)."""
    import ray.data
    from ray.data.aggregate import Sum

    from ..util import count_i64_keys
    from .dedup import hash_str_array

    def pre(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        parts = pc.split_pattern_regex(text, pattern=r"\s+")
        flat = parts.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        w = flat[flat != ""]
        if len(w) == 0:
            return pa.table({"h": pa.array([], pa.int64()), "pc_": pa.array([], pa.int64())})
        u, c = np.unique(hash_str_array(w).view(np.int64), return_counts=True)
        return pa.table({"h": pa.array(u), "pc_": pa.array(c.astype(np.int64))})

    counts = count_i64_keys(
        ds.map_batches(pre, batch_format="pyarrow"), "h", count_col="c", weight_col="pc_"
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "c" not in t.column_names:
            return pa.table({"n": pa.array([], pa.int64()), "sln": pa.array([], pa.float64())})
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        tail = c[c >= xmin]
        return pa.table(
            {
                "n": pa.array([len(tail)]),
                "sln": pa.array([float(np.log(tail / (xmin - 0.5)).sum())]),
            }
        )

    agg = counts.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sln", alias_name="sln")
    )
    n, sln = int(agg["n"] or 0), float(agg["sln"] or 0.0)
    alpha = round(1.0 + n / sln, 6) if sln else 0.0
    return ray.data.from_items([{"n_tail": n, "alpha": alpha}])


def zlib_ratio_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc zlib compression ratio — the classic repetition/quality
    signal (low ratio = highly repetitive text; boilerplate and spam
    compress far below natural prose). Emits (doc_id, raw_len,
    comp_len, ratio) with ratio = comp_len/raw_len at 6 dp (0.0 for
    empty docs). The per-doc ``zlib.compress`` call is C-level
    (DEFLATE has no vectorized form); level 6 is pinned so results are
    reproducible across runs. Not SQL-expressible — gated rows-only,
    with pytest pinning exact zlib parity and the repetitive-vs-prose
    ordering."""
    import zlib

    if len(t) == 0 or text_col not in t.column_names:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "raw_len": pa.array([], pa.int64()),
                "comp_len": pa.array([], pa.int64()),
                "ratio": pa.array([], pa.float64()),
            }
        )
    texts = t.column(text_col).to_pylist()
    raw = np.empty(len(texts), np.int64)
    comp = np.empty(len(texts), np.int64)
    for i, s in enumerate(texts):
        b = ("" if s is None else s).encode("utf-8")
        raw[i] = len(b)
        comp[i] = len(zlib.compress(b, 6))
    ratio = np.where(raw > 0, np.round(comp / np.maximum(raw, 1), 6), 0.0)
    return pa.table(
        {
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "raw_len": pa.array(raw),
            "comp_len": pa.array(comp),
            "ratio": pa.array(ratio, pa.float64()),
        }
    )


def zlib_ratios(ds: "object", text_col: str = "text") -> "object":
    """Dataset wrapper over :func:`zlib_ratio_batch`."""
    return ds.map_batches(
        lambda t: zlib_ratio_batch(t, text_col), batch_format="pyarrow"
    )


def bm25_scores(
    ds: "object",
    n_terms: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> "object":
    """BM25 relevance of every document against the corpus's own
    ``n_terms`` most frequent words (ties → word asc; a deterministic
    stand-in for any query-term set) — the classic IR ranking function
    and the retrieval side of an LLM data pipeline.

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)

    Float-parity posture: expression STRUCTURE matches the SQL oracle
    verbatim — ``avgdl = sum_dl/N`` divided once, ``dl/avgdl`` per
    doc, ``k1 + 1.0`` summed at runtime (never a pre-folded 2.2
    literal: IEEE ops are deterministic, literal folding is not), and
    the per-doc term sum runs in FIXED term order. N counts ALL
    documents (empty docs simply match nothing).

    Execution shape: pass 1 is the heavy-hitters top-k
    (:func:`top_k_words` — weighted count BSP, no row-level string
    groupby); pass 2 is ONE tokenize map emitting per-doc (dl, tf_t…)
    rows with the tiny term list broadcast in the task closure, a
    3-scalar aggregate (sum_dl + per-term df), and a final vectorized
    score map. Output (doc_id, n_hit, score 6dp) for docs matching ≥ 1
    term."""
    import ray.data
    from ray.data.aggregate import Sum

    from ..util import ensure_schema

    top = top_k_words(ds, k=n_terms)
    terms = top.column("word").to_pylist()
    if not terms:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_hit": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
    n_docs = ds.count()

    def doc_stats(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        parts = pc.split_pattern_regex(text, pattern=r"\s+")
        lc = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        offs = lc.offsets.to_numpy(zero_copy_only=False)
        words = lc.flatten().to_numpy(zero_copy_only=False)
        nonempty = (words != "").astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(nonempty)])
        dl = csum[offs[1:]] - csum[offs[:-1]]
        cols = {
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "dl": pa.array(dl.astype(np.int64)),
        }
        for j, term in enumerate(terms):
            hit = (words == term).astype(np.int64)
            hc = np.concatenate([[0], np.cumsum(hit)])
            cols[f"tf{j}"] = pa.array((hc[offs[1:]] - hc[offs[:-1]]).astype(np.int64))
        return pa.table(cols)

    stats = ds.map_batches(doc_stats, batch_format="pyarrow").materialize()

    def partial_agg(t: pa.Table) -> pa.Table:
        cols = {"g": pa.array([0], pa.int64()), "sum_dl": pa.array([int(np.sum(t.column("dl").to_numpy(zero_copy_only=False)))], pa.int64())}
        for j in range(len(terms)):
            tf = t.column(f"tf{j}").to_numpy(zero_copy_only=False)
            cols[f"df{j}"] = pa.array([int(np.sum(tf > 0))], pa.int64())
        return pa.table(cols)

    aggs = [Sum("sum_dl", alias_name="sum_dl")] + [
        Sum(f"df{j}", alias_name=f"df{j}") for j in range(len(terms))
    ]
    a = (
        stats.map_batches(partial_agg, batch_format="pyarrow")
        .groupby("g")
        .aggregate(*aggs)
        .to_pandas()
    )
    sum_dl = float(a["sum_dl"].iloc[0])
    avgdl = sum_dl / n_docs
    idf = [
        np.log((n_docs - float(a[f"df{j}"].iloc[0]) + 0.5)
               / (float(a[f"df{j}"].iloc[0]) + 0.5) + 1.0)
        for j in range(len(terms))
    ]

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "dl" not in t.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_hit": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.zeros(len(t), np.float64)
        n_hit = np.zeros(len(t), np.int64)
        for j in range(len(terms)):
            tf = t.column(f"tf{j}").to_numpy(zero_copy_only=False).astype(np.float64)
            contrib = idf[j] * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * (dl / avgdl))
            )
            s = s + np.where(tf > 0, contrib, 0.0)
            n_hit += (tf > 0).astype(np.int64)
        keep = n_hit > 0
        return pa.table(
            {
                "doc_id": t.column("doc_id").filter(pa.array(keep)),
                "n_hit": pa.array(n_hit[keep]),
                "score": pa.array(np.round(s[keep], 6)),
            }
        )

    return stats.map_batches(score, batch_format="pyarrow").map_batches(
        ensure_schema(
            {"doc_id": pa.int64(), "n_hit": pa.int64(), "score": pa.float64()}
        ),
        batch_format="pyarrow",
    )


def keyness_g2(
    docs: "object",
    split_fn,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_shards: int = 16,
) -> "object":
    """Corpus keyness — Dunning (1993) log-likelihood G² per word
    between two corpus splits (the standard corpus-linguistics /
    domain-drift comparison: which words are OVER-represented in split
    A vs split B). ``split_fn(ids: np.int64 array) -> 0/1 array``
    assigns each doc to a split; output one row per word:
    (word, na, nb, g2) with g2 = 2·Σ n·ln(n/E) over the two observed
    cells, E = total_split · (na+nb) / grand_total, zero cells
    contributing 0 — rounded 6dp, sorted by word.

    Scale shape: ONE tokenize pass (the pinned RE2-\\s trim+split) with
    per-batch (word → na, nb) pre-aggregation — the exchange is
    O(batch_vocab × batches), never O(tokens) — merged by the
    multi-counter string-carrying BSP (`util.sum_i64_keys_with_payload`
    with two weight columns); the grand totals are two driver scalars.
    The G² expression GROUPING matches the SQL oracle exactly
    (tot·(na+nb) then ÷ grand, ln of the ratio, multiply by n)."""
    from ..util import sum_i64_keys_with_payload
    from .dedup import hash_str_array

    empty = pa.table(
        {
            "h": pa.array([], pa.int64()),
            "na": pa.array([], pa.int64()),
            "nb": pa.array([], pa.int64()),
            "word": pa.array([], pa.string()),
        }
    )

    def partials(t: pa.Table) -> pa.Table:
        if text_col not in t.column_names or len(t) == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        s = split_fn(ids).astype(np.int64)
        trimmed = pc.utf8_trim(pc.fill_null(t.column(text_col), ""), characters=RE2_WS)
        parts = pc.split_pattern_regex(trimmed, pattern=r"\s+").combine_chunks()
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        words = parts.flatten().to_numpy(zero_copy_only=False)
        tok_s = np.repeat(s, np.diff(offsets))
        keep = words != ""
        words, tok_s = words[keep], tok_s[keep]
        if len(words) == 0:
            return empty
        uniq, idx, inv = np.unique(words, return_index=True, return_inverse=True)
        na = np.bincount(inv[tok_s == 0], minlength=len(uniq)).astype(np.int64)
        nb = np.bincount(inv[tok_s == 1], minlength=len(uniq)).astype(np.int64)
        h = hash_str_array(uniq.astype(object)).view(np.int64)
        return pa.table(
            {
                "h": pa.array(h),
                "na": pa.array(na),
                "nb": pa.array(nb),
                "word": pa.array(list(uniq), pa.string()),
            }
        )

    pre = docs.map_batches(partials, batch_format="pyarrow")
    merged = sum_i64_keys_with_payload(
        pre, "h", ["na", "nb"], ["word"], num_shards=num_shards
    ).materialize()
    ta = int(merged.sum("na") or 0)
    tb = int(merged.sum("nb") or 0)
    grand = ta + tb

    def score(t: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                "word": pa.array([], pa.string()),
                "na": pa.array([], pa.int64()),
                "nb": pa.array([], pa.int64()),
                "g2": pa.array([], pa.float64()),
            }
        )
        if "word" not in t.column_names or len(t) == 0 or grand == 0:
            return out_empty
        na = t.column("na").to_numpy(zero_copy_only=False)
        nb = t.column("nb").to_numpy(zero_copy_only=False)
        row = na + nb
        with np.errstate(divide="ignore", invalid="ignore"):
            ea = (ta * row) / grand
            eb = (tb * row) / grand
            term_a = np.where(na > 0, na * np.log(na / ea), 0.0)
            term_b = np.where(nb > 0, nb * np.log(nb / eb), 0.0)
        g2 = np.round(2.0 * (term_a + term_b), 6)
        return pa.table(
            {
                "word": t.column("word"),
                "na": pa.array(na),
                "nb": pa.array(nb),
                "g2": pa.array(g2),
            }
        )

    return merged.map_batches(score, batch_format="pyarrow").sort("word")


def sentence_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc sentence segmentation stats — the unit the
    sentence-level dedup / packing / readability passes need:
    sentences = non-blank RE2-\\s-trimmed segments between ``[.!?]+``
    runs. Appends (n_sentences, sent_chars, avg_chars) where avg =
    round(sent_chars·1.0/n, 6) — the single terminal division, grouping
    matched by the SQL oracle. Fully vectorized (one split kernel, one
    trim, two bincounts over ListArray offsets)."""
    text = pc.fill_null(batch.column(text_col), "")
    parts = pc.split_pattern_regex(text, pattern=r"[.!?]+").combine_chunks()
    offsets = parts.offsets.to_numpy(zero_copy_only=False)
    flat = pc.utf8_trim(parts.flatten(), characters=RE2_WS)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_ix = np.repeat(np.arange(len(batch)), np.diff(offsets))
    nb = lens > 0
    n_sent = np.bincount(doc_ix[nb], minlength=len(batch)).astype(np.int64)
    chars = np.bincount(doc_ix, weights=lens.astype(np.float64), minlength=len(batch)).astype(
        np.int64
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        avg = np.where(n_sent > 0, np.round(chars * 1.0 / n_sent, 6), 0.0)
    out = batch.append_column("n_sentences", pa.array(n_sent))
    out = out.append_column("sent_chars", pa.array(chars))
    return out.append_column("avg_chars", pa.array(avg))


def readability_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Flesch reading-ease per doc — the standard readability quality
    signal, with the vowel-run syllable heuristic (syllables ≈ maximal
    ``[aeiouyAEIOUY]+`` runs): flesch = 206.835 − 1.015·(W/S) −
    84.6·(Y/W) over W tokens (pinned RE2-\\s), S sentences (non-blank
    trimmed ``[.!?]+`` segments) and Y vowel runs. Rounded 6dp; the
    expression structure (each ratio as x·1.0/y, left-assoc
    subtraction, e0 double literals in the oracle) matches the SQL twin
    bit-for-bit. Docs with W = 0 or S = 0 get flesch = 0.0 (callers
    planting pads guarantee both ≥ 1)."""
    out = token_count_batch(batch, text_col)
    out = sentence_stats_batch(out, text_col)
    text = pc.fill_null(batch.column(text_col), "")
    y = pc.count_substring_regex(text, pattern="[aeiouyAEIOUY]+").cast(pa.int64())
    out = out.append_column("syll_runs", y)
    w = out.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
    s = out.column("n_sentences").to_numpy(zero_copy_only=False).astype(np.int64)
    yv = y.to_numpy(zero_copy_only=False).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        fl = 206.835 - 1.015 * (w * 1.0 / s) - 84.6 * (yv * 1.0 / w)
    fl = np.where((w > 0) & (s > 0), np.round(fl, 6), 0.0)
    return out.append_column("flesch", pa.array(fl))


def stopword_ratio(
    docs: "object", k: int = 10, text_col: str = "text", id_col: str = "doc_id",
    num_shards: int = 16,
) -> "object":
    """Corpus-derived stopword-density quality signal (the Gopher-style
    filter): stopwords = the corpus's own top-k words (ties → word
    asc, from `top_k_words`' exact heavy-hitters path), then per doc
    (n_tokens, n_stop, stop_ratio = round(n_stop·1.0/n_tokens, 6); 0.0
    for blank docs). The stopword set is k sorted hashes BROADCAST via
    ray.put — membership is one vectorized searchsorted per batch,
    never a join against the token stream."""
    import ray

    from .dedup import hash_str_array

    top = top_k_words(docs, k=k, cms_w=1 << 12, cms_d=2)
    words = top.column("word").to_pylist()
    sw = np.sort(hash_str_array(np.array(words, dtype=object)).view(np.int64))
    sw_ref = ray.put(sw)

    def per_doc(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_stop": pa.array([], pa.int64()),
                "stop_ratio": pa.array([], pa.float64()),
            }
        )
        if text_col not in t.column_names or len(t) == 0:
            return empty
        sw_local = ray.get(sw_ref)
        trimmed = pc.utf8_trim(pc.fill_null(t.column(text_col), ""), characters=RE2_WS)
        parts = pc.split_pattern_regex(trimmed, pattern=r"\s+").combine_chunks()
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        toks = parts.flatten().to_numpy(zero_copy_only=False)
        doc_ix = np.repeat(np.arange(len(t)), np.diff(offsets))
        keep = toks != ""
        toks, doc_ix = toks[keep], doc_ix[keep]
        nt = np.bincount(doc_ix, minlength=len(t)).astype(np.int64)
        if len(toks) and len(sw_local):
            h = hash_str_array(toks.astype(object)).view(np.int64)
            pos = np.searchsorted(sw_local, h)
            pos[pos >= len(sw_local)] = len(sw_local) - 1
            isin = sw_local[pos] == h
            ns = np.bincount(doc_ix[isin], minlength=len(t)).astype(np.int64)
        else:
            ns = np.zeros(len(t), dtype=np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(nt > 0, np.round(ns * 1.0 / nt, 6), 0.0)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pa.array(nt),
                "n_stop": pa.array(ns),
                "stop_ratio": pa.array(ratio),
            }
        )

    return docs.map_batches(per_doc, batch_format="pyarrow")


def pattern_hits_batch(
    batch: pa.Table, patterns: "list[str]", text_col: str = "text"
) -> pa.Table:
    """Multi-pattern literal blocklist counting — the spam/boilerplate
    filter primitive: per document and pattern, the number of
    NON-OVERLAPPING left-to-right occurrences (Arrow
    ``count_substring`` semantics, which equal SQL's
    ``(len(t) − len(replace(t, p, ''))) / len(p)``). Emits one row per
    (doc, pattern) with n_hits > 0.

    Stateless per-batch kernel: one vectorized ``count_substring``
    sweep per pattern (the pattern list is tiny and broadcast in the
    closure; compile-once actor pools are overkill for literal
    matching). Use inside ``map_batches``."""
    if len(batch) == 0 or text_col not in batch.column_names:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pattern": pa.array([], pa.string()),
                "n_hits": pa.array([], pa.int64()),
            }
        )
    ids = batch.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
    col = batch.column(text_col)
    out_id, out_p, out_n = [], [], []
    for p in patterns:
        cnt = pc.count_substring(col, p).to_numpy(zero_copy_only=False)
        cnt = np.nan_to_num(cnt.astype(np.float64), nan=0.0).astype(np.int64)
        m = cnt > 0
        if m.any():
            out_id.append(ids[m])
            out_p.append(np.full(int(m.sum()), p, dtype=object))
            out_n.append(cnt[m])
    if not out_id:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pattern": pa.array([], pa.string()),
                "n_hits": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_id)),
            "pattern": pa.array(np.concatenate(out_p), pa.string()),
            "n_hits": pa.array(np.concatenate(out_n)),
        }
    )


def unicode_normalize_batch(t: pa.Table, col: str = "text", form: str = "NFC") -> pa.Table:
    """Unicode-normalize a string column (stdlib unicodedata — NFC by
    default; NFD/NFKC/NFKD accepted). Per-string Python call: CPython
    exposes no vectorized normalizer, and the fast path inside
    unicodedata short-circuits already-normalized (quick-check YES)
    strings in C, so ASCII-dominant corpora pay ~a memcmp per doc.
    DuckDB's nfc_normalize() implements the same Unicode algorithm —
    the t_unicode_nfc gate pins engine/oracle parity on planted
    decomposed sequences."""
    import unicodedata

    if len(t) == 0 or col not in t.column_names:
        return t
    vals = t.column(col).to_pylist()
    out = [None if v is None else unicodedata.normalize(form, v) for v in vals]
    idx = t.column_names.index(col)
    return t.set_column(idx, col, pa.array(out, pa.string()))


def vocab_growth(
    docs: "object",
    num_buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_shards: int = 8,
) -> "object":
    """Vocabulary-growth curve (the Heaps-law view every corpus report
    plots): docs are cut into ``num_buckets`` contiguous doc_id ranges
    and each distinct word is charged to the FIRST bucket it appears
    in; output per non-empty bucket: ``new_words`` and the running
    ``cum_vocab``.

    Scale shape: per-batch the pinned RE2-\\s tokens hash in one
    siphash call and collapse to per-(word, min bucket) partials
    (lexsort + first-occurrence cut), then ONE min-BSP keyed by the
    64-bit word hash finds each word's global first bucket — the
    "first occurrence" primitive is exactly the walk engine's argmin
    shuffle. The driver folds only num_buckets rows (the cumsum).
    Word identity is the siphash (process-stable; 2⁻⁶⁴ collision
    odds — the shared posture of every hash-keyed text op here)."""
    import ray.data

    from ..util import count_i64_keys, min_i64_by_key
    from .dedup import _re2_word_split, hash_str_array

    nd = docs.count()
    B = max(1, -(-nd // num_buckets))  # ceil(nd / num_buckets)

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or id_col not in t.column_names:
            return pa.table({"h": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [_re2_word_split(x) for x in t.column(text_col).to_pylist()]
        lens = np.fromiter((len(w) for w in toks), np.int64, len(toks))
        total = int(lens.sum())
        if total == 0:
            return pa.table({"h": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        flat = np.empty(total, dtype=object)
        pos = 0
        for w in toks:
            flat[pos : pos + len(w)] = w
            pos += len(w)
        h = hash_str_array(flat).view(np.int64)
        b = np.repeat(ids // B, lens)
        # per-batch (word, min bucket) partial: lexsort + run cut
        order = np.lexsort((b, h))
        h, b = h[order], b[order]
        first = np.ones(len(h), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        return pa.table({"h": pa.array(h[first]), "b": pa.array(b[first])})

    firsts = min_i64_by_key(
        docs.map_batches(partial, batch_format="pyarrow"),
        "h",
        "b",
        num_shards=num_shards,
    )
    counts = (
        count_i64_keys(
            firsts.map_batches(
                lambda t: pa.table({"b": t.column("b")})
                if "b" in t.column_names
                else pa.table({"b": pa.array([], pa.int64())}),
                batch_format="pyarrow",
            ),
            "b",
            num_shards=num_shards,
            count_col="new_words",
        )
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "bucket": pa.array(counts["b"].to_numpy(dtype=np.int64)),
            "new_words": pa.array(counts["new_words"].to_numpy(dtype=np.int64)),
            "cum_vocab": pa.array(counts["new_words"].to_numpy(dtype=np.int64).cumsum()),
        }
    )


RAKE_STOPWORDS = ("a", "and", "in", "is", "it", "of", "the", "to")


def rake_keywords(
    docs: "object",
    k: int = 20,
    stopwords: "tuple[str, ...]" = RAKE_STOPWORDS,
    text_col: str = "text",
    num_shards: int = 8,
) -> "pa.Table":
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal runs of non-stopword tokens; word score = deg/freq
    (deg = Σ phrase length over the word's phrase occurrences, freq =
    occurrence count); phrase score = Σ member word scores. Returns
    the corpus top-``k`` distinct phrases by (score 6dp desc, phrase
    asc) with occurrence counts.

    Scale shape: (1) one multi-counter payload-free BSP folds (freq,
    deg) per 64-bit word hash; (2) the word-score table broadcasts via
    ray.put (the word_pair_pmi posture — O(vocab) floats); (3) a
    second pass dedups phrases through the string-carrying payload BSP
    keyed by the phrase hash (payload = the phrase itself), scores
    each DISTINCT phrase once by re-splitting it against the broadcast
    lookup, and prunes per-block top-k partials before one tiny merge
    (#blocks × k rows — the topk_rows shape, with the string
    tie-break inlined)."""
    import ray

    from ..util import count_i64_keys, sum_i64_keys_with_payload
    from .dedup import _re2_word_split, hash_str_array

    stops = frozenset(stopwords)

    def _phrases(texts):
        """Yield (tokens_list, phrase_strings) per doc."""
        for t in texts:
            toks = _re2_word_split(t)
            runs, cur = [], []
            for w in toks:
                if w in stops:
                    if cur:
                        runs.append(cur)
                    cur = []
                else:
                    cur.append(w)
            if cur:
                runs.append(cur)
            yield runs

    def word_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or text_col not in t.column_names:
            return pa.table(
                {"h": pa.array([], pa.int64()), "f": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        words, degs = [], []
        for runs in _phrases(t.column(text_col).to_pylist()):
            for run in runs:
                words.extend(run)
                degs.extend([len(run)] * len(run))
        if not words:
            return pa.table(
                {"h": pa.array([], pa.int64()), "f": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        h = hash_str_array(np.array(words, dtype=object)).view(np.int64)
        d = np.asarray(degs, dtype=np.int64)
        order = np.argsort(h, kind="stable")
        h, d = h[order], d[order]
        cut = np.ones(len(h), bool)
        cut[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(cut)
        return pa.table(
            {
                "h": pa.array(h[starts]),
                "f": pa.array(np.diff(np.append(starts, len(h))).astype(np.int64)),
                "d": pa.array(np.add.reduceat(d, starts).astype(np.int64)),
            }
        )

    stats = sum_i64_keys_with_payload(
        docs.map_batches(word_partial, batch_format="pyarrow"),
        "h",
        ["f", "d"],
        [],
        num_shards=num_shards,
    ).to_pandas()
    wh = stats["h"].to_numpy(dtype=np.int64)
    order = np.argsort(wh)
    wh = wh[order]
    # word scores quantize to the dyadic 2^-20 grid (floor — the
    # bit-identical-across-engines op): dyadic member scores make the
    # phrase sum ASSOCIATION-ORDER-FREE, so the SQL twin's bare SUM()
    # is exact rather than 1-ulp fragile (the t_bm25 rule, solved by
    # quantization instead of an unrolled left-assoc chain because
    # phrase length is unbounded)
    wscore = (
        np.floor(
            stats["d"].to_numpy(dtype=np.float64)[order]
            / stats["f"].to_numpy(dtype=np.float64)[order]
            * 1048576.0
        )
        / 1048576.0
    )
    lookup = ray.put((wh, wscore))

    def phrase_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or text_col not in t.column_names:
            return pa.table({"ph": pa.array([], pa.int64()), "n": pa.array([], pa.int64()), "phrase": pa.array([], pa.string())})
        phrases = []
        for runs in _phrases(t.column(text_col).to_pylist()):
            phrases.extend(" ".join(run) for run in runs)
        if not phrases:
            return pa.table({"ph": pa.array([], pa.int64()), "n": pa.array([], pa.int64()), "phrase": pa.array([], pa.string())})
        arr = np.array(phrases, dtype=object)
        h = hash_str_array(arr).view(np.int64)
        order = np.argsort(h, kind="stable")
        h, arr = h[order], arr[order]
        cut = np.ones(len(h), bool)
        cut[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(cut)
        return pa.table(
            {
                "ph": pa.array(h[starts]),
                "n": pa.array(np.diff(np.append(starts, len(h))).astype(np.int64)),
                "phrase": pa.array(arr[starts], pa.string()),
            }
        )

    distinct = sum_i64_keys_with_payload(
        docs.map_batches(phrase_partial, batch_format="pyarrow"),
        "ph",
        "n",
        ["phrase"],
        num_shards=num_shards,
    )

    def score_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"phrase": pa.array([], pa.string()), "n_occ": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
        if len(t) == 0 or "phrase" not in t.column_names:
            return empty
        whl, wsl = ray.get(lookup)
        phrases = t.column("phrase").to_pylist()
        scores = np.zeros(len(phrases))
        for i, p in enumerate(phrases):
            mh = hash_str_array(np.array(p.split(" "), dtype=object)).view(np.int64)
            scores[i] = wsl[np.searchsorted(whl, mh)].sum()
        df = pd.DataFrame(
            {
                "phrase": phrases,
                "n_occ": t.column("n").to_numpy(zero_copy_only=False),
                "score": np.round(scores, 6),
            }
        ).sort_values(["score", "phrase"], ascending=[False, True], kind="stable").head(k)
        return pa.table(
            {
                "phrase": pa.array(df["phrase"].tolist(), pa.string()),
                "n_occ": pa.array(df["n_occ"].to_numpy(dtype=np.int64)),
                "score": pa.array(df["score"].to_numpy(dtype=np.float64)),
            }
        )

    parts = distinct.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    fin = parts.sort_values(
        ["score", "phrase"], ascending=[False, True], kind="stable"
    ).head(k)
    return pa.table(
        {
            "phrase": pa.array(fin["phrase"].tolist(), pa.string()),
            "n_occ": pa.array(fin["n_occ"].to_numpy(dtype=np.int64)),
            "score": pa.array(fin["score"].to_numpy(dtype=np.float64)),
        }
    )
