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
