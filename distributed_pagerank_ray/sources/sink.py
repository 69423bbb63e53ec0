"""Resumable partitioned Parquet sink.

The 100-TB output contract (brief: "write partitioned Parquet … so a
failed run can skip finished partitions; never one giant file"):

- output is one directory per partition-key value
  (``<out>/<col>=<value>/part-*.parquet``), each published atomically
  (write into ``<dir>.tmp`` → fsync-free ``os.replace`` → ``_DONE``
  marker), mirroring the checkpoint shards' tmp+rename idempotency
  (state/checkpoint.py).
- a rerun of the same write SKIPS every partition whose ``_DONE``
  exists and regenerates only missing/partial ones — the dataset is
  filtered to the missing key set BEFORE execution, so finished
  partitions cost nothing (not even a read of their rows' blocks'
  transforms, when the filter prunes early).

Partition values must be int64-able or strings; high-cardinality
partitioning (millions of dirs) is the caller's anti-pattern to avoid
— partition by shard/day/source, not by row key.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

_DONE = "_DONE"


def _part_dir(out_dir: str, col: str, value) -> str:
    return os.path.join(out_dir, f"{col}={value}")


def finished_partitions(out_dir: str, col: str) -> set[str]:
    """String partition values whose _DONE marker exists."""
    if not os.path.isdir(out_dir):
        return set()
    vals = set()
    prefix = f"{col}="
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and os.path.exists(os.path.join(out_dir, name, _DONE)):
            vals.add(name[len(prefix):])
    return vals


def resumable_write_parquet(
    ds: "ray.data.Dataset", out_dir: str, partition_col: str
) -> "ray.data.Dataset":
    """Write ``ds`` partitioned by ``partition_col``; finished
    partitions (``_DONE`` present) are skipped on rerun — the input is
    filtered to missing keys BEFORE any shuffle, so a resume re-reads
    but never re-shuffles or re-writes completed work.

    Publication is atomic per partition: the whole partition lands in
    ``<dir>.tmp`` first, an ``os.replace`` swings it live, and the
    ``_DONE`` marker commits it — a SIGKILL mid-write leaves only a
    ``.tmp`` (or a dir without ``_DONE``), both treated as absent.

    Returns a Dataset of (partition value, n_rows) for the partitions
    written by THIS call.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir, partition_col)
    if done:
        done_arr = pa.array(sorted(done), pa.string())

        def drop_done(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            vals = pc.cast(t.column(partition_col), pa.string())
            return t.filter(pc.invert(pc.is_in(vals, value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    col, out = partition_col, out_dir

    def write_group(t: pa.Table) -> pa.Table:
        if len(t) == 0 or col not in t.column_names:
            return pa.table({col: pa.array([], pa.string()), "n_rows": pa.array([], pa.int64())})
        value = str(t.column(col)[0].as_py())
        target = _part_dir(out, col, value)
        # re-check _DONE: lineage re-execution / task retry (or consuming
        # the returned Dataset twice) can re-run this task after a prior
        # attempt committed — the frozen call-time `done` set won't know
        if os.path.exists(os.path.join(target, _DONE)):
            return pa.table({col: pa.array([value]), "n_rows": pa.array([len(t)], pa.int64())})
        # pid-unique tmp so two concurrent attempts never rmtree each
        # other's half-written dir; os.replace is the single commit point
        tmp = f"{target}.tmp{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        # hive convention: the partition column lives in the dir name,
        # not the file (readers re-derive it; keeping both breaks
        # schema merge on read)
        pq.write_table(t.drop_columns([col]), os.path.join(tmp, "part-00000.parquet"))
        shutil.rmtree(target, ignore_errors=True)  # partial dir without _DONE
        os.replace(tmp, target)
        with open(os.path.join(target, _DONE), "w") as fh:
            fh.write("ok")
        return pa.table({col: pa.array([value]), "n_rows": pa.array([len(t)], pa.int64())})

    return ds.groupby(partition_col).map_groups(write_group, batch_format="pyarrow")


def compact_parquet_dir(
    path: str, target_rows_per_file: int = 1_000_000
) -> dict:
    """Small-file compaction: rewrite a flat Parquet directory (the
    kind an append-style writer — e.g. repeated ``update_graph``
    increments hardlinking ``base_*`` files next to deltas — grows one
    file at a time) into ``ceil(rows / target_rows_per_file)`` files.

    Content-preserving (same multiset of rows; row order is not part
    of the contract) and crash-safe without in-place writes: the
    compacted copy lands in ``<path>.compact.tmp``, then two renames
    swing it live (``<path>`` → ``<path>.old`` → removed). A crash
    between the renames leaves ``<path>.old`` intact — ``recover``
    semantics: if ``path`` is missing but ``<path>.old`` exists,
    rename it back. Returns {files_before, files_after, rows}.
    """
    import ray.data

    files_before = sum(
        1 for n in os.listdir(path) if n.endswith(".parquet")
    )
    ds = ray.data.read_parquet(path).materialize()
    rows = ds.count()
    n_files = max(1, -(-rows // target_rows_per_file))
    tmp = path + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.repartition(n_files).write_parquet(tmp)
    old = path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = sum(1 for n in os.listdir(path) if n.endswith(".parquet"))
    return {"files_before": files_before, "files_after": files_after, "rows": rows}


def zorder_key_batch(x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":
    """Morton (Z-order) interleave of two 16-bit coordinates → int64
    key, fully vectorized (the five magic-number doubling steps). The
    classic multi-dimensional data-layout key: sorting by it makes
    range predicates on EITHER column prune row groups (each 2^k-sized
    key block spans a bounded x-range × y-range rectangle) — the
    standard lakehouse clustering trick for a 100-TB table queried by
    more than one column. Inputs are masked to 16 bits (callers bucket
    wider domains first); SQL-expressible with the same five steps."""
    import numpy as np

    def spread(v: "np.ndarray") -> "np.ndarray":
        v = v.astype(np.int64) & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return spread(x) | (spread(y) << 1)


def write_parquet_zordered(
    ds: "ray.data.Dataset",
    out_dir: str,
    x_col: str,
    y_col: str,
    key_col: str = "_zkey",
) -> None:
    """Write ``ds`` clustered by the Morton key of (x_col, y_col):
    append the vectorized key, global sort by it (ONE range shuffle —
    the same all-to-all any clustering write pays), drop the key, write
    partitioned parquet. Readers filtering on either column then prune
    row groups via parquet min/max stats."""
    import pyarrow as pa

    def add_key(t: "pa.Table") -> "pa.Table":
        if x_col not in t.column_names or len(t) == 0:
            return t
        import numpy as np

        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(key_col, pa.array(zorder_key_batch(x, y)))

    keyed = ds.map_batches(add_key, batch_format="pyarrow").sort(key_col)
    keyed.drop_columns([key_col]).write_parquet(out_dir)
