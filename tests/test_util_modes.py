"""Coverage for util joins and the alternate PageRank combine mode."""

import subprocess
import sys

import numpy as np

import ray.data

from distributed_pagerank_ray.config import PageRankConfig, RunConfig
from distributed_pagerank_ray.pipelines.graphbuild import build_graph
from distributed_pagerank_ray.pipelines.pagerank import pagerank
from distributed_pagerank_ray.util import semi_join_filter
from oracle.pagerank_oracle import pagerank_oracle


def test_semi_and_anti_join():
    ds = ray.data.from_items([{"k": i, "v": i * 10} for i in range(20)])
    keys = {3, 5, 7}
    semi = sorted(r["k"] for r in semi_join_filter(ds, "k", keys, keep=True).take_all())
    assert semi == [3, 5, 7]
    anti = sorted(r["k"] for r in semi_join_filter(ds, "k", keys, keep=False).take_all())
    assert anti == sorted(set(range(20)) - keys)
    # empty key set: semi -> nothing, anti -> everything
    assert semi_join_filter(ds, "k", [], keep=True).count() == 0
    assert semi_join_filter(ds, "k", [], keep=False).count() == 20


def test_groupby_combine_mode_conformance(tmp_path, golden_graphs):
    """The pure-Dataset groupby combine (non-default) must match the
    oracle exactly, like the tasks mode."""
    src, dst = golden_graphs["tri_bridge"]
    ds = ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])
    g = build_graph(
        ds,
        str(tmp_path / "gbmode"),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=3, combine_mode="groupby"),
    )
    res = pagerank(g, PageRankConfig(), RunConfig(shard_rows=3, combine_mode="groupby"))
    want, it, conv, _ = pagerank_oracle(src, dst)
    assert np.allclose(res.ranks_numpy(), want, atol=1e-6)
    assert res.iterations == it and res.converged == conv


def test_cli_job_submit_style(tmp_path):
    """`python -m distributed_pagerank_ray.run` — the `ray job submit`
    entry — in a fresh process owning its own Ray session."""
    edgelist = tmp_path / "g.txt"
    edgelist.write_text("0 1\n1 2\n2 0\n")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "distributed_pagerank_ray.run",
            "--algo",
            "pagerank",
            "--edgelist-txt",
            str(edgelist),
            "--run-dir",
            str(tmp_path / "run"),
            "--num-cpus",
            "2",
        ],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json

    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["converged"] and summary["n_vertices"] == 3
    # 3-cycle: uniform ranks
    assert summary["status"].startswith("Converged after")


def test_bsp_single_shard_request():
    """num_shards=1 regression: with num_returns=1 Ray would hand the
    reducer the raw per-shard list; the BSP helpers floor S at 2."""
    import pyarrow as pa

    import ray.data
    from distributed_pagerank_ray.util import count_i64_keys, distinct_i64_pairs

    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([1, 1, 2, 2, 3], pa.int64()), "b": pa.array([7, 7, 8, 9, 9], pa.int64())})
    ).repartition(3)
    got = distinct_i64_pairs(ds, "a", "b", num_shards=1).to_pandas()
    assert sorted(map(tuple, got[["a", "b"]].to_numpy())) == [(1, 7), (2, 8), (2, 9), (3, 9)]
    cnt = count_i64_keys(ds, "a", num_shards=1).to_pandas()
    assert dict(zip(cnt["a"], cnt["cnt"])) == {1: 2, 2: 2, 3: 1}


def test_sliding_window_slide_grid(tmp_path):
    """slide_hours=2 regression: window starts must sit on the slide
    grid (00:00, 02:00, ...), not floor-to-hour minus offsets."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_pagerank_ray.pipelines.relational import events_sliding

    pq.write_table(
        pa.table(
            {
                "ts": pa.array([np.datetime64("2024-01-01T03:30", "us")], pa.timestamp("us")),
                "event_type": pa.array(["a"]),
                "value": pa.array([1.0]),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    got = events_sliding(str(tmp_path), size_hours=4, slide_hours=2).to_pandas()
    starts = sorted(str(s) for s in got["window_start"])
    assert starts == ["2024-01-01 00:00:00", "2024-01-01 02:00:00"], starts
    import pytest

    with pytest.raises(ValueError):
        events_sliding(str(tmp_path), size_hours=3, slide_hours=2)


def test_topk_rows_matches_full_sort():
    import numpy as np
    import ray.data

    from distributed_pagerank_ray.util import topk_rows

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 50, 500)  # many ties -> tiebreaker must decide
    ids = rng.permutation(500)
    ds = ray.data.from_items(
        [{"v": int(v), "id": int(i)} for v, i in zip(vals, ids)]
    ).repartition(7)
    got = topk_rows(ds, [("v", True), ("id", False)], 25).take_all()
    want = (
        ds.sort(["v", "id"], descending=[True, False]).limit(25).take_all()
    )
    assert got == want


def test_topk_rows_k_exceeds_rows():
    import ray.data

    from distributed_pagerank_ray.util import topk_rows

    ds = ray.data.from_items([{"v": i, "id": i} for i in range(5)])
    got = topk_rows(ds, [("v", False), ("id", False)], 100).take_all()
    assert [r["v"] for r in got] == [0, 1, 2, 3, 4]


def test_grouped_topk_i64_brute():
    """grouped_topk_i64 == per-group sort head-k with full tie chain,
    incl. groups smaller than k and duplicate values."""
    import numpy as np
    import ray.data

    from distributed_pagerank_ray.util import grouped_topk_i64

    rows = []
    for i in range(4000):
        rows.append(
            {"g": i % 7, "v": (i * i) % 50, "t1": i % 13, "t2": i}
        )
    rows.append({"g": 99, "v": 5, "t1": 0, "t2": 0})  # singleton group

    def brute():
        from collections import defaultdict

        by = defaultdict(list)
        for r in rows:
            by[r["g"]].append((-r["v"], r["t1"], r["t2"]))
        out = set()
        for g, items in by.items():
            for nv, t1, t2 in sorted(items)[:4]:
                out.add((g, -nv, t1, t2))
        return out

    ds = ray.data.from_items(rows).repartition(6)
    got = grouped_topk_i64(ds, "g", "v", ["t1", "t2"], k=4, num_shards=4).take_all()
    got_set = {(r["g"], r["v"], r["t1"], r["t2"]) for r in got}
    assert got_set == brute()
