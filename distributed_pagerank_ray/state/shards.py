"""Sharded dense vectors in the Ray object store.

The reference keeps the whole rank vector (and graph) in every
process's RAM and re-serializes it into every job payload (reference:
proto/node.proto:36-43, pkg/node/master.go:225-241). Here the
per-vertex vectors (rank, out-degree weight, labels, E) are dense
numpy arrays **sharded by fixed id range**: shard ``s`` covers ids
``[s*shard_rows, (s+1)*shard_rows)``. Shards are created by remote
tasks reading a Parquet checkpoint partitioned by ``shard`` — never by
the driver streaming all rows — and live in the object store, pulled
on demand by map_batches tasks.

Because the edge table is sorted by ``src``, each edge block's src
range overlaps only 1-2 shards, so a gather stage pulls O(its range)
bytes, not the whole vector. At 10^12 vertices the vector is ~8 TB:
no single process ever holds it; each task holds only its shards.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

# NB: must not start with "_" — pyarrow dataset discovery treats
# underscore-prefixed paths (incl. hive partition dirs) as metadata and
# skips them.
SHARD_COL = "shard"


def n_shards(n: int, shard_rows: int) -> int:
    return max(1, -(-n // shard_rows))


def add_shard_column(batch: pa.Table, id_col: str, shard_rows: int) -> pa.Table:
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return batch.append_column(
        SHARD_COL, pa.array((ids // shard_rows).astype(np.int64))
    )


@ray.remote(num_returns=2)
def _load_shard(
    path: str,
    shard: int,
    lo: int,
    size: int,
    id_col: str,
    val_col: str,
    fill: float,
    sum_col: str | None,
):
    """Read one shard partition dir -> (dense array for ids [lo, lo+size),
    sum of ``sum_col`` over the shard). The piggy-backed sum lets the
    PageRank loop get the L1 residual from the same checkpoint read that
    refreshes the rank shards — one read per iteration, not two."""
    from .checkpoint import fs_path, isdir

    shard_dir = os.path.join(path, f"{SHARD_COL}={shard}")
    out = np.full(size, fill, dtype=np.float64)
    extra = 0.0
    if isdir(shard_dir):
        cols = [id_col, val_col] + ([sum_col] if sum_col else [])
        fsys, inner = fs_path(shard_dir)
        t = pq.read_table(inner, columns=cols, filesystem=fsys)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        vals = t.column(val_col).to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < lo or ids.max() >= lo + size):
            # negative `ids - lo` would wrap silently and corrupt the
            # vector — this fires when a checkpoint written under a
            # different shard_rows layout is read back
            raise ValueError(
                f"shard {shard} at {path}: ids [{ids.min()}, {ids.max()}] outside "
                f"[{lo}, {lo + size}) — checkpoint layout/shard_rows mismatch"
            )
        out[ids - lo] = vals
        if sum_col:
            extra = float(t.column(sum_col).to_numpy(zero_copy_only=False).sum())
    return out, extra


@dataclass
class ShardedVector:
    """Handle to a dense float64 vector sharded across the object store."""

    refs: list  # list[ObjectRef[np.ndarray]]
    n: int
    shard_rows: int

    @classmethod
    def from_parquet(
        cls, path: str, n: int, shard_rows: int, id_col: str, val_col: str, fill: float = 0.0
    ) -> "ShardedVector":
        vec, _ = cls.from_parquet_with_sum(path, n, shard_rows, id_col, val_col, fill, None)
        return vec

    @classmethod
    def from_parquet_with_sum(
        cls,
        path: str,
        n: int,
        shard_rows: int,
        id_col: str,
        val_col: str,
        fill: float = 0.0,
        sum_col: str | None = None,
    ) -> tuple["ShardedVector", float]:
        S = n_shards(n, shard_rows)
        refs = []
        sum_refs = []
        for s in range(S):
            arr_ref, sum_ref = _load_shard.remote(
                path,
                s,
                s * shard_rows,
                min(shard_rows, n - s * shard_rows),
                id_col,
                val_col,
                fill,
                sum_col,
            )
            refs.append(arr_ref)
            sum_refs.append(sum_ref)
        total = float(sum(ray.get(sum_refs))) if sum_col else 0.0
        return cls(refs=refs, n=n, shard_rows=shard_rows), total

    @classmethod
    def arange(cls, n: int, shard_rows: int) -> "ShardedVector":
        """Identity vector (labels init = own id) built by remote tasks —
        the driver never materializes the full vector."""

        @ray.remote
        def make(lo: int, size: int) -> np.ndarray:
            return np.arange(lo, lo + size, dtype=np.float64)

        S = n_shards(n, shard_rows)
        refs = [
            make.remote(s * shard_rows, min(shard_rows, n - s * shard_rows)) for s in range(S)
        ]
        return cls(refs=refs, n=n, shard_rows=shard_rows)

    @classmethod
    def from_numpy(cls, arr: np.ndarray, shard_rows: int) -> "ShardedVector":
        n = len(arr)
        S = n_shards(n, shard_rows)
        refs = [ray.put(arr[s * shard_rows : (s + 1) * shard_rows]) for s in range(S)]
        return cls(refs=refs, n=n, shard_rows=shard_rows)

    def gather_range(self, lo: int, hi: int) -> tuple[int, np.ndarray]:
        """Values for the id range [lo, hi] (inclusive), pulling only the
        overlapping shards. Returns (offset, values) where values[i]
        is the value of id offset+i."""
        s0 = lo // self.shard_rows
        s1 = hi // self.shard_rows
        parts = ray.get(self.refs[s0 : s1 + 1])
        return s0 * self.shard_rows, np.concatenate(parts) if len(parts) > 1 else parts[0]

    def to_numpy(self) -> np.ndarray:
        return np.concatenate(ray.get(self.refs))[: self.n]


def map_reduce_shards(vec: ShardedVector, fn, combine=sum):
    """Apply ``fn(shard_array, lo)`` remotely per shard; combine scalars.

    Used for e.g. dangling-mass = sum of rank over dangling ids without
    any driver-side row iteration."""
    f = ray.remote(fn)
    out = ray.get(
        [f.remote(r, s * vec.shard_rows) for s, r in enumerate(vec.refs)]
    )
    return combine(out)


def hrw_assign_batch(
    t: "pa.Table", key_col: str, n_shards_: int = 8, out_col: str = "shard_hrw"
) -> "pa.Table":
    """Rendezvous (highest-random-weight) hashing: each key goes to the
    shard with the max mixing hash h(key, s) — the consistent-routing
    rule whose reshard cost is 1/n of the keys when a shard is added
    (vs ~all keys under mod-N), the property a long-lived crawl
    frontier needs. Hash is the repo's quadratic (key, salt) mix
    (mis.py/matching.py — affine maps have lattice-correlated parity),
    totalized by the shard id so ties are impossible:
    p = h(key, s) * n_shards + s, assignment = argmax over s.
    Pure vectorized numpy over an (n, S) matrix; SQL-mirrorable
    (the r_hrw_assign gate reproduces the argmax with a CASE chain)."""
    import numpy as np
    import pyarrow as pa

    if len(t) == 0 or key_col not in t.column_names:
        return t
    v = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    best_p = np.full(len(v), -1, np.int64)
    best_s = np.zeros(len(v), np.int64)
    for s in range(n_shards_):
        w = (v + np.int64(s) * 1000003) % 32768
        h = (w * w * 1315423911 + w * 2654435761 + 12345) % 2147483647
        p = h * n_shards_ + s
        take = p > best_p
        best_p = np.where(take, p, best_p)
        best_s = np.where(take, s, best_s)
    return t.append_column(out_col, pa.array(best_s))
