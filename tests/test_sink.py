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
