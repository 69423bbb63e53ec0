"""Mergeable sketch aggregates — HyperLogLog distinct counting.

The scale pattern (guide: "Aggregation at scale"): each batch emits
ONE serialized sketch; a tiny second stage merges them. The shuffle
moves O(batches) registers instead of O(rows) keys. Reference has no
approximate aggregates (SURVEY §2.5); this is the metrics-path option
named there (HLL distinct-url count).

Standard HLL (Flajolet et al. 2007), p-bit register index, 64-bit
hashes, harmonic-mean estimator with small-range linear counting.
Deterministic (blake2b row hashes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


def _hash64(values: list) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "little")
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


class HLL:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HLL":
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining bits, top-aligned
        # rank = leading zeros of rest + 1 (capped)
        rank = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        r = np.ones(len(h), dtype=np.uint8)
        for _ in range(64 - self.p):
            top = (cur & mask) != 0
            done = top & (rank == 0)
            rank[done] = r[done]
            cur = cur << np.uint64(1)
            r += 1
        rank[rank == 0] = 64 - self.p + 1
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
        h = HLL(p).add_hashes(_hash64(batch.column(col).to_pylist()))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    rows = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for r in rows:
        acc.merge(HLL.from_bytes(r["sketch"], p))
    return acc.estimate()
