import numpy as np
import pytest

import ray.data

from distributed_pagerank_ray.config import RunConfig
from distributed_pagerank_ray.pipelines.components import connected_components
from distributed_pagerank_ray.pipelines.graphbuild import build_graph
from distributed_pagerank_ray.pipelines.lpa import label_propagation
from oracle.graph_oracle import cc_oracle, lpa_oracle


def _graph(tmp_path, src, dst, name):
    ds = ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])
    return build_graph(
        ds,
        str(tmp_path / name),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=3),
    )


@pytest.mark.parametrize("name", ["chain5", "twocomp", "tri_bridge", "selfdup", "star8"])
def test_cc_exact(tmp_path, golden_graphs, name):
    src, dst = golden_graphs[name]
    g = _graph(tmp_path, src, dst, name)
    res = connected_components(g)
    want = cc_oracle(src, dst, n=g.n)
    got = res.labels_numpy(shard_rows=3)
    assert np.array_equal(got, want), name
    assert res.converged
    assert res.n_components == len(np.unique(want))


def test_cc_twocomp_membership(tmp_path, golden_graphs):
    src, dst = golden_graphs["twocomp"]
    g = _graph(tmp_path, src, dst, "twocomp_m")
    res = connected_components(g)
    labels = res.labels_numpy(shard_rows=3)
    assert labels.tolist() == [0, 0, 2, 2]
    assert res.n_components == 2


@pytest.mark.parametrize("name", ["twocomp", "tri_bridge", "star8"])
def test_lpa_matches_oracle(tmp_path, golden_graphs, name):
    src, dst = golden_graphs[name]
    g = _graph(tmp_path, src, dst, name + "_lpa")
    res = label_propagation(g, max_iters=20)
    want = lpa_oracle(src, dst, n=g.n, max_iters=20)
    got = res.labels_numpy(shard_rows=3)
    assert np.array_equal(got, want), (name, got.tolist(), want.tolist())


def test_lpa_tri_bridge_communities(tmp_path, golden_graphs):
    """tri_bridge: two triangles sharing vertex 2 — LPA splits into
    communities; exact labels fixed by the deterministic tie-break."""
    src, dst = golden_graphs["tri_bridge"]
    g = _graph(tmp_path, src, dst, "tb_comm")
    res = label_propagation(g, max_iters=20)
    labels = res.labels_numpy(shard_rows=3)
    # all of {0,1,2} agree with each other per the oracle
    want = lpa_oracle(src, dst, n=5, max_iters=20)
    assert np.array_equal(labels, want)
