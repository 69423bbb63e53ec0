import numpy as np
import pytest

import ray.data

from distributed_pagerank_ray.pipelines.sssp import sssp_fixed


def _brute(src, dst, w, seeds, iters, n, directed):
    """Min-cost walk using <= iters edges, dense DP."""
    INF = float("inf")
    d = np.full(n, INF)
    for s in seeds:
        d[s] = 0.0
    edges = list(zip(src, dst, w))
    if not directed:
        edges += [(b, a, x) for a, b, x in edges]
    for _ in range(iters):
        nd = d.copy()
        for a, b, x in edges:
            if d[a] + x < nd[b]:
                nd[b] = d[a] + x
        d = nd
    return np.where(np.isfinite(d), np.round(d, 4), -1.0)


def _run(edges_rows, seeds, iters, directed):
    ds = ray.data.from_items(edges_rows)
    out = (
        sssp_fixed(ds, seeds, iters=iters, num_partitions=2, directed=directed)
        .to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    return out


@pytest.mark.parametrize("directed", [True, False])
def test_sssp_matches_brute_force(directed):
    rng = np.random.RandomState(11)
    src = rng.randint(0, 12, 40)
    dst = rng.randint(0, 12, 40)
    w = rng.randint(1, 9, 40).astype(float)
    rows = [
        {"src": int(a), "dst": int(b), "w": float(x)} for a, b, x in zip(src, dst, w)
    ]
    out = _run(rows, [0], 3, directed)
    n_all = len(np.unique(np.concatenate([src, dst])))
    assert len(out) == n_all
    want = _brute(src, dst, w, [0], 3, 12, directed)
    keys = np.unique(np.concatenate([src, dst]))
    got = out["dist"].to_numpy()
    assert np.allclose(got, want[keys]), (got.tolist(), want[keys].tolist())


def test_sssp_multigraph_equals_min_edge():
    """Parallel edges relax identically to the min-weight simple edge."""
    multi = [
        {"src": 0, "dst": 1, "w": 7.0},
        {"src": 0, "dst": 1, "w": 3.0},
        {"src": 1, "dst": 2, "w": 5.0},
        {"src": 1, "dst": 2, "w": 9.0},
    ]
    simple = [
        {"src": 0, "dst": 1, "w": 3.0},
        {"src": 1, "dst": 2, "w": 5.0},
    ]
    a = _run(multi, [0], 2, True)
    b = _run(simple, [0], 2, True)
    assert a.values.tolist() == b.values.tolist()
    assert a[a.vertex == 2]["dist"].iloc[0] == 8.0


def test_sssp_unreached_and_validation():
    rows = [{"src": 0, "dst": 1, "w": 2.0}, {"src": 2, "dst": 3, "w": 1.0}]
    out = _run(rows, [0], 3, True)
    d = dict(zip(out["vertex"], out["dist"]))
    assert d == {0: 0.0, 1: 2.0, 2: -1.0, 3: -1.0}
    with pytest.raises(ValueError):
        sssp_fixed(ray.data.from_items(rows), [], iters=1)
    bad = [{"src": 0, "dst": 1, "w": -1.0}]
    with pytest.raises(Exception):
        sssp_fixed(ray.data.from_items(bad), [0], iters=1).take_all()
