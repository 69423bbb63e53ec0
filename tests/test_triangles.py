import numpy as np
import pytest

import ray.data

from distributed_pagerank_ray.config import RunConfig
from distributed_pagerank_ray.pipelines.triangles import triangle_count
from oracle.graph_oracle import triangle_oracle


def _edges_ds(src, dst):
    return ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])


@pytest.mark.parametrize(
    "name,expect",
    [("chain5", 0), ("cycle4", 0), ("tri_bridge", 2), ("k4", 4), ("selfdup", 0)],
)
def test_golden_triangles(golden_graphs, name, expect):
    src, dst = golden_graphs[name]
    assert triangle_oracle(src, dst) == expect  # fixture sanity
    got = triangle_count(_edges_ds(src, dst), RunConfig(num_partitions=2))
    assert got == expect, name


def test_random_graph_matches_bruteforce():
    rng = np.random.default_rng(3)
    m = 200
    src = rng.integers(0, 40, m)
    dst = rng.integers(0, 40, m)
    want = triangle_oracle(src, dst)
    got = triangle_count(_edges_ds(src, dst), RunConfig(num_partitions=4))
    assert got == want and want > 0


def test_join_path_matches_broadcast_path():
    """broadcast_threshold=0 forces the hash-join scale path; both
    implementations must agree exactly."""
    rng = np.random.default_rng(5)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    want = triangle_oracle(src, dst)
    got_join = triangle_count(
        _edges_ds(src, dst), RunConfig(num_partitions=4), broadcast_threshold=0
    )
    got_bcast = triangle_count(_edges_ds(src, dst), RunConfig(num_partitions=4))
    assert got_join == got_bcast == want
