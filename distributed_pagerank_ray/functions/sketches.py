"""Mergeable sketch aggregates — HyperLogLog distinct counting.

The scale pattern (guide: "Aggregation at scale"): each batch emits
ONE serialized sketch; a tiny second stage merges them. The shuffle
moves O(batches) registers instead of O(rows) keys. Reference has no
approximate aggregates (SURVEY §2.5); this is the metrics-path option
named there (HLL distinct-url count).

Standard HLL (Flajolet et al. 2007), p-bit register index, 64-bit
hashes, harmonic-mean estimator with small-range linear counting.
Deterministic (pandas siphash — process-stable, one C pass per batch;
same kernel as the dedup hashing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of stringified elements, vectorized
    (pd.util.hash_array siphash via dedup.hash_str_array — no per-row
    Python hashing)."""
    from .dedup import hash_str_array

    if isinstance(values, np.ndarray) and values.dtype == object:
        arr = values
    else:
        arr = np.array([str(v) for v in values], dtype=object)
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    return hash_str_array(arr)


class HLL:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HLL":
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining bits, top-aligned
        # rank = leading zeros + 1, via one unpackbits (MSB-first) +
        # argmax pass — no 64-iteration shift loop
        bits = np.unpackbits(
            rest.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1, bitorder="big"
        )
        rank = (np.argmax(bits, axis=1) + 1).astype(np.uint8)
        rank[rest == 0] = 64 - self.p + 1  # all-zero suffix (argmax=0 is wrong there)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HLL":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array — cheap
    deterministic int mixing (and a second independent hash for
    Bloom/CMS double hashing: g_i = h + i*splitmix64(h))."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class BloomFilter:
    """Plain Bloom filter over 64-bit key hashes, vectorized add /
    contains via double hashing (Kirsch–Mitzenmacher: g_i = h1 + i·h2).
    Used as a broadcast PREFILTER for semi joins whose key side is too
    big for the exact sorted-array broadcast — false positives are
    removed by an exact join on the survivors, so results stay exact;
    the bloom only cuts the rows entering the shuffle."""

    __slots__ = ("n_bits", "k", "bits")

    def __init__(self, n_bits: int, k: int = 7, bits: np.ndarray | None = None):
        self.n_bits = int(n_bits)
        self.k = int(k)
        self.bits = (
            bits
            if bits is not None
            else np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)
        )

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(len(h), k) bit positions."""
        h1 = h.astype(np.uint64)
        h2 = splitmix64(h1) | np.uint64(1)  # odd → full-period stride
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(self.n_bits)).astype(
            np.int64
        )

    def add_hashes(self, h: np.ndarray) -> "BloomFilter":
        if len(h) == 0:
            return self
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
        return self

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership test → bool array (no false negatives)."""
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        got = (self.bits[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return got.all(axis=1)


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan 2005): d rows × w
    counters, mergeable by elementwise sum. Estimate = min over rows —
    never undercounts, overcounts by ≤ εN w.h.p. (ε ≈ e/w). Row i's
    hash = splitmix64 double-hash of the key hash."""

    __slots__ = ("d", "w", "table")

    def __init__(self, w: int = 4096, d: int = 4, table: np.ndarray | None = None):
        self.w = int(w)
        self.d = int(d)
        self.table = (
            table if table is not None else np.zeros((self.d, self.w), dtype=np.int64)
        )

    def _cols(self, h: np.ndarray) -> np.ndarray:
        h1 = h.astype(np.uint64)
        h2 = splitmix64(h1) | np.uint64(1)
        i = np.arange(self.d, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.w)).astype(np.int64)

    def add_hashes(self, h: np.ndarray, counts: np.ndarray | None = None) -> "CountMinSketch":
        if len(h) == 0:
            return self
        c = (
            np.ones(len(h), dtype=np.int64)
            if counts is None
            else counts.astype(np.int64)
        )
        cols = self._cols(h)
        for r in range(self.d):  # d is 4-8: a fixed, tiny loop
            np.add.at(self.table[r], cols[r], c)
        return self

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._cols(h)
        ests = np.stack([self.table[r][cols[r]] for r in range(self.d)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, w: int = 4096, d: int = 4) -> "CountMinSketch":
        return cls(w, d, np.frombuffer(b, dtype=np.int64).reshape(d, w).copy())


def approx_distinct_by(
    ds: "ray.data.Dataset", key: str, col: str, p: int = 12
) -> dict:
    """Approximate COUNT(DISTINCT col) GROUP BY key → {key: estimate}.

    Scale shape: each batch emits ONE (key, sketch) row per group key
    present in it (a pandas groupby inside the batch — vectorized), a
    repartition(8) tree-merges partials per partition, and the driver
    merges ≤ 8×|keys| tiny rows. Assumes |distinct key| is small (an
    enum-ish group column); the shuffle never moves row-level data,
    only 2^p-byte registers."""
    import pandas as pd
    import pyarrow.compute as pc

    def sketch(batch: pa.Table) -> pa.Table:
        keys = (
            pc.fill_null(pc.cast(batch.column(key), pa.string()), "None")
            .to_numpy(zero_copy_only=False)
        )
        h = _hash64_ints_or_strs(batch.column(col))
        out_k, out_s = [], []
        for kv, idx in pd.Series(np.arange(len(keys))).groupby(keys).groups.items():
            out_k.append(kv)
            out_s.append(HLL(p).add_hashes(h[np.asarray(idx)]).to_bytes())
        return pa.table(
            {key: pa.array(out_k, pa.string()), "sketch": pa.array(out_s, pa.binary())}
        )

    def merge_partials(batch: pa.Table) -> pa.Table:
        ks = batch.column(key).to_numpy(zero_copy_only=False)
        sk = batch.column("sketch").to_numpy(zero_copy_only=False)
        acc: dict = {}
        for kv, b in zip(ks, sk):
            hl = HLL.from_bytes(b, p)
            if kv in acc:
                acc[kv].merge(hl)
            else:
                acc[kv] = hl
        return pa.table(
            {
                key: pa.array(list(acc), pa.string()),
                "sketch": pa.array([v.to_bytes() for v in acc.values()], pa.binary()),
            }
        )

    partials = ds.map_batches(sketch, batch_format="pyarrow")
    combined = partials.repartition(8).map_batches(
        merge_partials, batch_format="pyarrow", batch_size=1 << 20
    )
    acc: dict = {}
    for r in combined.take_all():
        hl = HLL.from_bytes(r["sketch"], p)
        if r[key] in acc:
            acc[r[key]].merge(hl)
        else:
            acc[r[key]] = hl
    return {k: v.estimate() for k, v in acc.items()}


def _hash64_ints_or_strs(col: "pa.ChunkedArray") -> np.ndarray:
    """64-bit hashes of an Arrow column: splitmix64 directly on integer
    columns (no stringify), siphash on everything else."""
    import pyarrow.compute as pc

    if pa.types.is_integer(col.type):
        v = pc.fill_null(col, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        return splitmix64(v.view(np.uint64))
    strs = pc.fill_null(pc.cast(col, pa.string()), "None").to_numpy(
        zero_copy_only=False
    )
    return _hash64(strs)


def approx_distinct(ds: "ray.data.Dataset", col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): one sketch row per batch, merged
    on the driver (sketches are tiny: 2^p bytes)."""

    def sketch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        strs = pc.fill_null(pc.cast(batch.column(col), pa.string()), "None").to_numpy(
            zero_copy_only=False
        )
        h = HLL(p).add_hashes(_hash64(strs))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    rows = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for r in rows:
        acc.merge(HLL.from_bytes(r["sketch"], p))
    return acc.estimate()


def kmv_distinct(
    ds: "ray.data.Dataset", col: str, k: int = 64, m: int = 2147483647
) -> "ray.data.Dataset":
    """K-minimum-values distinct-count sketch, DETERMINISTIC and
    SQL-mirrorable (unlike HLL's siphash, the per-value hash here is
    the repo's double-MINSTD map ``((x*48271) % m * 48271) % m`` —
    single-multiply MINSTD never wraps for small ids, the CLAUDE.md
    landmine — so a DuckDB oracle can compute the IDENTICAL estimate
    with ORDER BY hash LIMIT k).

    Estimator (Bar-Yossef et al. 2002): with h_k the k-th smallest
    DISTINCT hash value over [0, m), ``est = (k-1) * m / h_k``.
    Scale shape: each block emits at most k unique hashes (the only
    values that can matter globally), one tiny final task merges —
    the exchange is O(k * blocks), never O(rows).

    Fewer than k distinct hashes overall degrades to the EXACT count
    (the classic KMV small-side rule). Requires non-negative int64
    inputs below ~2**44 (k*48271 must stay inside int64 — true for
    every id/key column in the repo's tables).

    Returns one row: (k, n_seen_min, kth_hash, est_distinct) —
    ``n_seen_min`` = len(min-set) = min(k, total distinct hashes).
    """
    M = np.int64(m)

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or col not in t.column_names:
            return pa.table({"h": pa.array([], pa.int64())})
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = (v * np.int64(48271)) % M
        h = (h * np.int64(48271)) % M
        u = np.unique(h)  # sorted ascending
        return pa.table({"h": pa.array(u[:k])})

    def final(t: pa.Table) -> pa.Table:
        h = np.unique(t.column("h").to_numpy(zero_copy_only=False))
        n = min(k, len(h))
        if len(h) >= k:
            kth = int(h[k - 1])
            est = round(float(np.float64(k - 1) * np.float64(m) / np.float64(kth)), 6)
        else:  # degenerate small side: exact
            kth = int(h[-1]) if len(h) else 0
            est = float(len(h))
        return pa.table(
            {
                "k": pa.array([k], pa.int64()),
                "n_seen_min": pa.array([n], pa.int64()),
                "kth_hash": pa.array([kth], pa.int64()),
                "est_distinct": pa.array([est], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow")
    )


# ----------------------------------------- mergeable ε-quantile summary (MRL)


def _compress_weighted(v: np.ndarray, w: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress a sorted weighted summary to ≤ ``budget`` points:
    contiguous cumulative-weight segments of ~equal total weight, each
    represented by its LAST value carrying the whole segment weight.
    Representing a segment by its max value biases each point's rank
    upward by at most the segment weight — the additive error the
    caller budgets for (Manku/Rajagopalan/Lindsay-style deterministic
    summary; mergeable by concat-sort-recompress)."""
    if len(v) <= budget:
        return v, w
    cw = np.cumsum(w)
    total = cw[-1]
    # segment boundary for point i = smallest index with cw >= (i+1)/budget·total
    targets = (np.arange(1, budget + 1, dtype=np.float64)) * (total / budget)
    idx = np.unique(np.searchsorted(cw, targets, side="left").clip(0, len(v) - 1))
    seg_w = np.diff(np.concatenate(([0], cw[idx])))
    keep = seg_w > 0
    return v[idx][keep], seg_w[keep].astype(np.int64)


def quantile_sketch(
    ds: "ray.data.Dataset",
    col: str,
    qs: "tuple[float, ...]" = (0.01, 0.25, 0.5, 0.75, 0.99),
    delta: float = 0.01,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """ε-approximate quantiles via a DETERMINISTIC mergeable summary —
    the 100-TB quantile path (the exact grouped quantiles elsewhere in
    this repo sort or histogram the data; this streams it in one pass
    + one verify pass). Per block: sort + compress to ≤ 4/δ weighted
    points (≤ δ/4 of the block's weight per point); partials re-merge
    per partition and once at the end (each re-compression adds ≤ δ/4
    of TOTAL weight), so every estimate's true rank is within δ·n of
    its target — checked IN-QUERY by an exact distributed rank count
    of the estimates (the e_pq_adc identity posture: the sketch values
    themselves are merge-order-dependent, the bound is not). Output
    per q: (q, n, rank_err_ok)."""
    import ray.data

    from ..util import ensure_schema

    budget = max(8, int(np.ceil(4.0 / delta)))

    def block_sketch(t: pa.Table) -> pa.Table:
        if len(t) == 0 or col not in t.column_names:
            return pa.table({"v": pa.array([], pa.float64()), "w": pa.array([], pa.int64())})
        x = np.sort(t.column(col).cast(pa.float64()).to_numpy(zero_copy_only=False))
        x = x[~np.isnan(x)]
        v, w = _compress_weighted(x, np.ones(len(x), np.int64), budget)
        return pa.table({"v": pa.array(v, pa.float64()), "w": pa.array(w)})

    def remerge(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "v" not in t.column_names:
            return pa.table({"v": pa.array([], pa.float64()), "w": pa.array([], pa.int64())})
        v = t.column("v").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, w = _compress_weighted(v[order], w[order], budget)
        return pa.table({"v": pa.array(v, pa.float64()), "w": pa.array(w)})

    partials = (
        ds.map_batches(block_sketch, batch_format="pyarrow")
        .repartition(num_partitions)
        .map_batches(remerge, batch_format="pyarrow")
        .repartition(1)
        .map_batches(remerge, batch_format="pyarrow")
        .map_batches(
            ensure_schema({"v": pa.float64(), "w": pa.int64()}), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("v", kind="stable")
    )
    v = partials["v"].to_numpy(dtype=np.float64)
    w = partials["w"].to_numpy(dtype=np.int64)
    n = int(w.sum())
    if n == 0:
        return ray.data.from_items(
            [{"q": float(q), "n": 0, "rank_err_ok": 1} for q in qs]
        )
    cw = np.cumsum(w)
    ests = np.array(
        [v[min(np.searchsorted(cw, q * n, side="left"), len(v) - 1)] for q in qs]
    )

    # exact distributed rank INTERVAL of each estimate (one extra
    # streaming pass): a tie run makes "the rank of value v" the whole
    # interval [count(< v), count(<= v)] — the bound holds iff that
    # interval touches [q·n − δ·n, q·n + δ·n]
    def rank_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or col not in t.column_names:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                }
            )
        x = t.column(col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        x = x[~np.isnan(x)]
        lo = (x[None, :] < ests[:, None]).sum(axis=1).astype(np.int64)
        hi = (x[None, :] <= ests[:, None]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "i": pa.array(np.arange(len(qs), dtype=np.int64)),
                "lo": pa.array(lo),
                "hi": pa.array(hi),
            }
        )

    from ray.data.aggregate import Sum

    ranks = (
        ds.map_batches(rank_partial, batch_format="pyarrow")
        .groupby("i")
        .aggregate(Sum("lo", alias_name="lo"), Sum("hi", alias_name="hi"))
        .map_batches(
            ensure_schema({"i": pa.int64(), "lo": pa.int64(), "hi": pa.int64()}),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("i")
    )
    lo = ranks["lo"].to_numpy(dtype=np.int64)
    hi = ranks["hi"].to_numpy(dtype=np.int64)
    qn = np.asarray(qs) * n
    slack = delta * n + 1.0
    ok = ((hi >= qn - slack) & (lo <= qn + slack)).astype(np.int64)
    return ray.data.from_items(
        [
            {"q": float(q), "n": n, "rank_err_ok": int(o)}
            for q, o in zip(qs, ok)
        ]
    )
