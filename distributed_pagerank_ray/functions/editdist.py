"""Byte-exact Levenshtein distance, vectorized across a pair batch.

Verification-stage kernel for the near-dup stack: candidate pairs from
the cheap generators (n-gram Jaccard, MinHash, SimHash — see
functions/dedup.py) get an EXACT edit distance over a bounded prefix,
so borderline candidates are accepted/rejected on real evidence
instead of sketch estimates. A capability beyond the reference's scope
(lioia/distributed-pagerank implements only PageRank).

Semantics pinned to DuckDB's ``levenshtein``, which operates on UTF-8
BYTES, not codepoints (verified: ``levenshtein('éx','ex') = 2`` — 'é'
is two bytes). The DP therefore runs over the UTF-8 encoding of the
CHARACTER-prefix (``s[:prefix_chars]`` == SQL ``substr(s,1,n)``; both
are codepoint-based).

Vectorization: the classic O(La·Lb) DP is swept one A-row at a time
with every pair in the batch advancing together — per row, deletion
and substitution are elementwise minima against the previous row, and
the sequential insertion dependency ``cur[j-1]+1`` collapses to a
running minimum (``cur[j] = j + min_{k<=j}(t[k]-k)``, one
``np.minimum.accumulate``). Per-row Python appears only in the
C-level ``str.encode`` while packing the padded byte matrix.
Cost O(batch · Lmax²) with Lmax bounded by ``prefix_chars`` (×4 for
non-ASCII); size ``prefix_chars`` to the verification budget.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_I64 = pa.int64()


def _pad_utf8(col, prefix_chars: int) -> tuple[np.ndarray, np.ndarray]:
    """(batch, Lmax) uint8 matrix of zero-padded UTF-8 prefixes +
    per-row byte lengths. NUL padding is safe: positions past each
    row's length never influence its answer (extracted at la/lb)."""
    bs = [("" if s is None else s)[:prefix_chars].encode("utf-8") for s in col]
    n = len(bs)
    lens = np.fromiter((len(b) for b in bs), np.int64, n)
    lmax = int(lens.max()) if n else 0
    out = np.zeros((n, max(lmax, 1)), np.uint8)
    if lmax:
        cat = np.frombuffer(b"".join(bs), np.uint8)
        row = np.repeat(np.arange(n), lens)
        pos = np.arange(len(cat)) - np.repeat(np.cumsum(lens) - lens, lens)
        out[row, pos] = cat
    return out, lens


def levenshtein_bytes(col_a, col_b, prefix_chars: int = 40) -> np.ndarray:
    """int64 edit distances between ``col_a[i]`` and ``col_b[i]``
    (python/arrow string sequences), each truncated to its first
    ``prefix_chars`` CHARACTERS then compared byte-wise — exactly
    DuckDB ``levenshtein(substr(a,1,n), substr(b,1,n))``."""
    A, la = _pad_utf8(col_a, prefix_chars)
    B, lb = _pad_utf8(col_b, prefix_chars)
    P, _ = A.shape
    Lb = B.shape[1]
    res = np.where(la == 0, lb, np.int64(-1))
    # int32 DP state: distances are bounded by the byte prefix length
    # (< 2^31 always), and halving the row bandwidth is worth 2.4x
    jidx = np.arange(Lb + 1, dtype=np.int32)
    prev = np.broadcast_to(jidx, (P, Lb + 1)).copy()
    t = np.empty_like(prev)
    la_max = int(la.max()) if P else 0
    for i in range(1, la_max + 1):
        cost = (A[:, i - 1 : i] != B).astype(np.int32)
        t[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=t[:, 1:])
        cur = np.minimum.accumulate(t - jidx, axis=1) + jidx
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res.astype(np.int64)


def levenshtein_brute(a: str, b: str) -> int:
    """Reference DP over UTF-8 bytes (test oracle)."""
    x, y = a.encode("utf-8"), b.encode("utf-8")
    prev = list(range(len(y) + 1))
    for i in range(1, len(x) + 1):
        cur = [i] + [0] * len(y)
        for j in range(1, len(y) + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (x[i - 1] != y[j - 1]),
            )
        prev = cur
    return prev[len(y)]


# ------------------------------------------------- Jaro-Winkler similarity
# Second verification-stage string kernel (fuzzy-match scoring for the
# entity-resolution stack next to levenshtein_bytes). Semantics pinned to
# DuckDB's ``jaro_winkler_similarity`` (RapidFuzz lineage), verified
# in-sandbox: BYTE-based ('éx' vs 'ex' = 0.0 — the 2-byte é breaks the
# zero-width match window), either-empty → 0.0 (even '' vs ''), match
# window max(la,lb)//2 − 1 floored at 0, greedy left-to-right matching,
# prefix bonus capped at 4 bytes with weight 0.1 applied only when the
# plain Jaro score exceeds 0.7 (strict: 0.6969… gets no boost).


def jaro_bytes(col_a, col_b, prefix_chars: int = 40, padded=None) -> np.ndarray:
    """float64 Jaro similarity between ``col_a[i]`` and ``col_b[i]``,
    each truncated to its first ``prefix_chars`` CHARACTERS then
    compared byte-wise — DuckDB ``jaro_similarity(substr(a,1,n),
    substr(b,1,n))``.

    Vectorized like the Levenshtein sweep: the greedy matcher walks A
    positions sequentially but every pair in the batch advances
    together; per step one boolean window mask + one argmax across the
    B axis. Transpositions fall out of rank-aligned matched-character
    matrices at the end. Cost O(batch · Lmax²)."""
    A, la = _pad_utf8(col_a, prefix_chars) if padded is None else padded[:2]
    B, lb = _pad_utf8(col_b, prefix_chars) if padded is None else padded[2:]
    P, La = A.shape
    Lb = B.shape[1]
    if P == 0:
        return np.zeros(0, np.float64)
    win = np.maximum(np.maximum(la, lb) // 2 - 1, 0)  # per-pair window
    used = np.zeros((P, Lb), bool)
    a_matched = np.zeros((P, La), bool)
    jcols = np.arange(Lb)
    la_max = int(la.max())
    # greedy match: for A position i, the FIRST unused B byte equal to
    # A[:, i] within [i-win, i+win] and inside B's real length
    for i in range(la_max):
        cand = (
            (B == A[:, i : i + 1])
            & ~used
            & (jcols >= (i - win)[:, None])
            & (jcols <= (i + win)[:, None])
            & (jcols < lb[:, None])
            & (i < la)[:, None]
        )
        hit = cand.any(axis=1)
        j = cand.argmax(axis=1)  # first True = leftmost candidate
        used[hit, j[hit]] = True
        a_matched[hit, i] = True
    m = a_matched.sum(axis=1).astype(np.int64)
    # rank-align matched bytes: k-th matched byte of A vs k-th of B
    mmax = int(m.max()) if P else 0
    MA = np.zeros((P, max(mmax, 1)), np.uint8)
    MB = np.zeros((P, max(mmax, 1)), np.uint8)
    ra = np.cumsum(a_matched, axis=1) - 1
    rb = np.cumsum(used, axis=1) - 1
    pa_, ia = np.nonzero(a_matched)
    MA[pa_, ra[pa_, ia]] = A[pa_, ia]
    pb_, jb = np.nonzero(used)
    MB[pb_, rb[pb_, jb]] = B[pb_, jb]
    half_t = ((MA != MB) & (np.arange(max(mmax, 1)) < m[:, None])).sum(axis=1)
    t = (half_t // 2).astype(np.float64)
    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    sim = np.where((m == 0) | (la == 0) | (lb == 0), 0.0, sim)
    return sim


def jaro_winkler_bytes(col_a, col_b, prefix_chars: int = 40) -> np.ndarray:
    """DuckDB-pinned Jaro-Winkler: plain Jaro plus the common-prefix
    bonus ``l·0.1·(1−jaro)`` (l = common BYTES, capped at 4) applied
    only where jaro > 0.7."""
    A, la = _pad_utf8(col_a, prefix_chars)
    B, lb = _pad_utf8(col_b, prefix_chars)
    sim = jaro_bytes(col_a, col_b, prefix_chars, padded=(A, la, B, lb))
    if len(sim) == 0:
        return sim
    k = min(4, A.shape[1], B.shape[1])
    if k > 0:
        eq = A[:, :k] == B[:, :k]
        eq &= np.arange(k) < np.minimum(la, lb)[:, None]
        # common prefix = leading run of equality
        l = np.where(eq.all(axis=1), k, (~eq).argmax(axis=1)).astype(np.float64)
    else:
        l = np.zeros(len(sim))
    boost = sim > 0.7
    return np.where(boost, sim + l * 0.1 * (1.0 - sim), sim)


def jaro_winkler_brute(a: str, b: str) -> float:
    """Reference implementation over UTF-8 bytes (test oracle)."""
    x, y = a.encode("utf-8"), b.encode("utf-8")
    if not x or not y:
        return 0.0
    w = max(max(len(x), len(y)) // 2 - 1, 0)
    used = [False] * len(y)
    ma, mb = [], []
    for i, c in enumerate(x):
        for j in range(max(0, i - w), min(len(y), i + w + 1)):
            if not used[j] and y[j] == c:
                used[j] = True
                ma.append(c)
                break
    mb = [y[j] for j in range(len(y)) if used[j]]
    m = len(ma)
    if m == 0:
        return 0.0
    t = sum(1 for p, q in zip(ma, mb) if p != q) // 2
    sim = (m / len(x) + m / len(y) + (m - t) / m) / 3.0
    if sim > 0.7:
        l = 0
        for p, q in zip(x[:4], y[:4]):
            if p != q:
                break
            l += 1
        sim += l * 0.1 * (1.0 - sim)
    return sim
