"""Resumable partitioned Parquet sink: atomic publish, skip-finished
resume, partial-partition regeneration."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from distributed_pagerank_ray.sources.sink import (
    finished_partitions,
    resumable_write_parquet,
)


def _ds(n=1000):
    rng = np.random.default_rng(2)
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array((rng.integers(0, 5, n)).astype(np.int64)),
                "x": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
    )


def _read_all(out):
    return (
        pq.read_table(out, partitioning="hive")
        .to_pandas()
        .astype({"day": np.int64})
        .sort_values("x")
        .reset_index(drop=True)
    )


def test_write_then_read_roundtrip(tmp_path):
    out = str(tmp_path / "out")
    res = resumable_write_parquet(_ds(), out, "day").to_pandas()
    assert sorted(res["day"].astype(int).tolist()) == [0, 1, 2, 3, 4]
    assert res["n_rows"].sum() == 1000
    assert finished_partitions(out, "day") == {"0", "1", "2", "3", "4"}
    got = _read_all(out)
    exp = _ds().to_pandas().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["day", "x"]], exp[["day", "x"]], check_like=True)


def test_resume_skips_finished_and_regenerates_partial(tmp_path):
    out = str(tmp_path / "out")
    resumable_write_parquet(_ds(), out, "day").to_pandas()

    # simulate a crash: partition 2 died mid-write (no _DONE), 3 left a .tmp
    os.remove(os.path.join(out, "day=2", "_DONE"))
    with open(os.path.join(out, "day=2", "part-00000.parquet"), "w") as fh:
        fh.write("garbage")  # truncated file must be replaced wholesale
    shutil.rmtree(os.path.join(out, "day=3"))
    os.makedirs(os.path.join(out, "day=3.tmp"))

    assert finished_partitions(out, "day") == {"0", "1", "4"}
    res2 = resumable_write_parquet(_ds(), out, "day").to_pandas()
    # only the two broken partitions were rewritten
    assert sorted(res2["day"].astype(int).tolist()) == [2, 3]
    got = _read_all(out)
    assert len(got) == 1000
    exp = _ds().to_pandas().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["day", "x"]], exp[["day", "x"]], check_like=True)


def test_noop_when_all_done(tmp_path):
    out = str(tmp_path / "out")
    resumable_write_parquet(_ds(), out, "day").to_pandas()
    res = resumable_write_parquet(_ds(), out, "day").to_pandas()
    assert len(res) == 0


def test_compact_parquet_dir_preserves_content():
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa

    from distributed_pagerank_ray.sources.sink import compact_parquet_dir

    out = tempfile.mkdtemp(prefix="dpr_compact_") + "/files"
    t = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64))})
    ray.data.from_arrow(t).repartition(9).write_parquet(out)
    before = sorted(
        r["k"] for r in ray.data.read_parquet(out).take_all()
    )
    stats = compact_parquet_dir(out, target_rows_per_file=2000)
    assert stats["rows"] == 5000
    assert stats["files_after"] == 3 and stats["files_before"] >= 9
    after = sorted(r["k"] for r in ray.data.read_parquet(out).take_all())
    assert after == before
    assert not os.path.exists(out + ".old") and not os.path.exists(out + ".compact.tmp")
    # compacting an already-compact dir is a no-op in file count
    stats2 = compact_parquet_dir(out, target_rows_per_file=2000)
    assert stats2["files_after"] == 3 and stats2["rows"] == 5000


def test_zorder_key_bit_interleave():
    """zorder_key_batch == per-bit brute interleave, incl. 16-bit mask."""
    import numpy as np

    from distributed_pagerank_ray.sources.sink import zorder_key_batch

    rng = [0, 1, 2, 3, 255, 256, 65535, 65536, 99999, 12345]
    x = np.array(rng, dtype=np.int64)
    y = np.array(rng[::-1], dtype=np.int64)

    def brute(a, b):
        a, b = a & 0xFFFF, b & 0xFFFF
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    got = zorder_key_batch(x, y)
    for xi, yi, g in zip(x, y, got):
        assert g == brute(int(xi), int(yi))


def test_write_parquet_zordered_roundtrip(tmp_path):
    """Clustered write preserves rows and emits key-sorted order."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    from distributed_pagerank_ray.sources.sink import (
        write_parquet_zordered,
        zorder_key_batch,
    )

    rows = [{"x": (i * 37) % 500, "y": (i * 91) % 500, "v": i} for i in range(3000)]
    ds = ray.data.from_items(rows).repartition(5)
    out = str(tmp_path / "zo")
    write_parquet_zordered(ds, out, "x", "y")

    t = pq.read_table(out)
    assert t.num_rows == 3000
    assert sorted(t.column("v").to_pylist()) == list(range(3000))
    # global file order is Morton-sorted (per file, and files are range-split)
    x = t.column("x").to_numpy()
    y = t.column("y").to_numpy()
    keys = zorder_key_batch(x.astype(np.int64), y.astype(np.int64))
    # each parquet fragment individually sorted
    import glob
    for f in sorted(glob.glob(out + "/*.parquet")):
        ft = pq.read_table(f)
        fk = zorder_key_batch(
            ft.column("x").to_numpy().astype(np.int64),
            ft.column("y").to_numpy().astype(np.int64),
        )
        assert (np.diff(fk) >= 0).all()
