"""North-rule requirement: a killed run resumes from checkpoint and the
resumed result is bit-equal to an uninterrupted run (FIXTURES.md §5)."""

import json
import os

import numpy as np

import ray.data

from distributed_pagerank_ray.config import PageRankConfig, RunConfig
from distributed_pagerank_ray.pipelines.graphbuild import build_graph
from distributed_pagerank_ray.pipelines.pagerank import pagerank


def _graph(tmp_path, golden_graphs, name, sub):
    src, dst = golden_graphs[name]
    ds = ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])
    return build_graph(
        ds,
        str(tmp_path / sub),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=3),
    )


def test_resume_bit_equal(tmp_path, golden_graphs):
    g1 = _graph(tmp_path, golden_graphs, "tri_bridge", "interrupted")
    partial = pagerank(g1, PageRankConfig(max_iters=3))
    assert partial.iterations == 3 and not partial.converged
    # "kill": a stale in-flight temp dir from a crashed iteration
    os.makedirs(os.path.join(g1.run_dir, "iter_0004.tmp", "junk"), exist_ok=True)

    resumed = pagerank(g1, PageRankConfig(max_iters=100))
    assert resumed.converged and resumed.iterations > 3

    g2 = _graph(tmp_path, golden_graphs, "tri_bridge", "uninterrupted")
    clean = pagerank(g2, PageRankConfig(max_iters=100))
    a = resumed.ranks_numpy(shard_rows=3)
    b = clean.ranks_numpy(shard_rows=3)
    assert np.array_equal(a, b)  # bit-equal, not just allclose
    assert resumed.iterations == clean.iterations


def test_manifest_metrics(tmp_path, golden_graphs):
    g = _graph(tmp_path, golden_graphs, "cycle4", "metrics")
    res = pagerank(g)
    with open(os.path.join(g.run_dir, "manifest.json")) as fh:
        m = json.load(fh)
    assert m["completed_iter"] == res.iterations
    # per-iteration metrics files exist with residual + wall time
    with open(os.path.join(g.run_dir, f"iter_{res.iterations:04d}", "metrics.json")) as fh:
        metrics = json.load(fh)
    assert metrics["residual"] == res.residual
    assert "wall_sec" in metrics and "edges" in metrics
    # consolidated queryable metrics table (one row per durable iteration)
    import pyarrow.parquet as pq

    mt = pq.read_table(os.path.join(g.run_dir, "metrics.parquet"))
    assert len(mt) == res.iterations + 1  # incl. iter 0 init
    assert "residual" in mt.column_names and "iteration" in mt.column_names


def test_checkpoint_every_cadence(tmp_path, golden_graphs):
    """checkpoint_every=3: intermediate iterations live only in the
    object store; durable dirs land every 3rd iteration plus a final
    flush; results identical to per-iteration checkpointing."""
    import os

    src, dst = golden_graphs["tri_bridge"]
    g1 = _graph(tmp_path, golden_graphs, "tri_bridge", "every1")
    r1 = pagerank(g1, PageRankConfig())

    ds = ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])
    from distributed_pagerank_ray.pipelines.graphbuild import build_graph

    g3 = build_graph(
        ds,
        str(tmp_path / "every3"),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=3, checkpoint_every=3),
    )
    r3 = pagerank(g3, PageRankConfig(), RunConfig(shard_rows=3, checkpoint_every=3))
    assert np.array_equal(r1.ranks_numpy(), r3.ranks_numpy())
    assert r1.iterations == r3.iterations
    iter_dirs = sorted(d for d in os.listdir(g3.run_dir) if d.startswith("iter_"))
    # far fewer durable checkpoints than iterations (init + every 3rd + flush)
    assert len(iter_dirs) < r3.iterations
    # resume from the sparse checkpoints still completes and agrees
    again = pagerank(g3, PageRankConfig(), RunConfig(shard_rows=3, checkpoint_every=3))
    assert np.array_equal(again.ranks_numpy(), r1.ranks_numpy())


def test_cc_resume(tmp_path, golden_graphs):
    from distributed_pagerank_ray.pipelines.components import connected_components

    g = _graph(tmp_path, golden_graphs, "tri_bridge", "cc_resume")
    partial = connected_components(g, max_iters=1)
    assert not partial.converged
    resumed = connected_components(g, max_iters=100)
    assert resumed.converged
    from oracle.graph_oracle import cc_oracle

    src, dst = golden_graphs["tri_bridge"]
    assert np.array_equal(resumed.labels_numpy(), cc_oracle(src, dst, n=g.n))
    # fully-converged re-entry is a no-op returning the same labels
    again = connected_components(g, max_iters=100)
    assert again.converged and again.iterations == resumed.iterations


def test_config_change_invalidates_resume(tmp_path, golden_graphs):
    g = _graph(tmp_path, golden_graphs, "cycle4", "inval")
    r1 = pagerank(g, PageRankConfig(c=0.85))
    r2 = pagerank(g, PageRankConfig(c=0.5))  # different damping -> fresh run
    assert r2.iterations >= 1
    want_sum = r2.ranks_numpy(shard_rows=3).sum()
    assert abs(want_sum - 1.0) < 1e-9
