"""Tree (two-level+) combine for the BSP fan-in: with
``RunConfig.combine_fanin > 0`` the per-shard reduce must see at most
``fanin`` payload refs (intermediate combiner tasks merge the rest)
and produce the same result as the flat path — exactly for CC/LPA
(min / integer counts are associative) and to FP-summation-order
tolerance for PageRank."""

import numpy as np
import pyarrow as pa

import ray.data

from distributed_pagerank_ray.config import PageRankConfig, RunConfig
from distributed_pagerank_ray.pipelines.components import connected_components
from distributed_pagerank_ray.pipelines.graphbuild import build_graph
from distributed_pagerank_ray.pipelines.lpa import label_propagation
from distributed_pagerank_ray.pipelines.pagerank import pagerank

N, M, SHARD_ROWS = 800, 6000, 64  # S = 13 shards -> 13 gather refs/shard


def _graph(tmp_path, name):
    rng = np.random.default_rng(5)
    src = rng.integers(0, N, M)
    dst = rng.integers(0, N, M)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    return build_graph(
        ds,
        str(tmp_path / name),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=SHARD_ROWS),
    )


def test_pagerank_tree_combine_matches_flat(tmp_path):
    cfg = PageRankConfig(max_iters=5, threshold=1e-30)
    flat = pagerank(_graph(tmp_path, "flat"), cfg, RunConfig(combine_fanin=0))
    tree = pagerank(_graph(tmp_path, "tree"), cfg, RunConfig(combine_fanin=2))
    a = flat.ranks_numpy(shard_rows=SHARD_ROWS)
    b = tree.ranks_numpy(shard_rows=SHARD_ROWS)
    assert flat.iterations == tree.iterations == 5
    # fanin=2 over 13 refs/shard forces a 4-level tree; results differ
    # only by FP summation order
    assert np.allclose(a, b, atol=1e-12, rtol=0)


def test_cc_lpa_tree_combine_exact(tmp_path):
    g_flat = _graph(tmp_path, "ccflat")
    g_tree = _graph(tmp_path, "cctree")
    cf = connected_components(g_flat, RunConfig(combine_fanin=0))
    ct = connected_components(g_tree, RunConfig(combine_fanin=2))
    assert cf.n_components == ct.n_components
    assert np.array_equal(
        cf.labels_numpy(shard_rows=SHARD_ROWS), ct.labels_numpy(shard_rows=SHARD_ROWS)
    )
    lf = label_propagation(g_flat, RunConfig(combine_fanin=0), max_iters=4)
    lt = label_propagation(g_tree, RunConfig(combine_fanin=2), max_iters=4)
    assert lf.iterations == lt.iterations
    assert np.array_equal(
        lf.labels_numpy(shard_rows=SHARD_ROWS), lt.labels_numpy(shard_rows=SHARD_ROWS)
    )
