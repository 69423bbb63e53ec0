"""Push-based approximate PPR vs a driver-side synchronous-push
replica (bit-exact) and the dense linear-system solve (ε-bounded)."""

import tempfile

import numpy as np
import pytest

import ray.data

from distributed_pagerank_ray.config import RunConfig
from distributed_pagerank_ray.pipelines.graphbuild import build_graph
from distributed_pagerank_ray.pipelines.pprpush import ppr_push


def _graph(tmp_path, pairs, shard_rows=3):
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in pairs])
    return build_graph(
        ds,
        str(tmp_path / "g"),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=shard_rows),
    )


def _brute_push(pairs, n, seed, alpha, eps, dangling_to_seed=True):
    deg = np.zeros(n, np.int64)
    adj = [[] for _ in range(n)]
    for a, b in pairs:
        deg[a] += 1
        adj[a].append(b)
    p = np.zeros(n)
    r = np.zeros(n)
    r[seed] = 1.0
    for _ in range(100000):
        act = [
            u
            for u in range(n)
            if (deg[u] > 0 and r[u] * (1.0 / deg[u]) >= eps) or (deg[u] == 0 and r[u] > 0)
        ]
        if not act:
            break
        new_r = r.copy()
        for u in act:
            new_r[u] = 0.0
        for u in act:
            p[u] += alpha * r[u]
            if deg[u]:
                w = (1.0 - alpha) * r[u] * (1.0 / deg[u])
                for v in adj[u]:
                    new_r[v] += w
            else:
                new_r[seed] += (1.0 - alpha) * r[u]
        r = new_r
    return p, r


def test_ppr_push_matches_replica_and_solve(tmp_path, ray_session):
    rng = np.random.default_rng(41)
    n = 18
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, 70), rng.integers(0, n, 70))
            if a != b
        }
        | {(i, i + 1) for i in range(n - 1)}  # every id appears (src ∪ dst)
    )
    g = _graph(tmp_path, pairs, shard_rows=5)
    alpha, eps = 0.2, 1e-9
    res = ppr_push(g, seed=3, alpha=alpha, eps=eps)
    got = res.estimates().to_pandas().sort_values("id")["p"].to_numpy()
    want_p, want_r = _brute_push(pairs, g.n, 3, alpha, eps)
    # synchronous push is deterministic: shard path must equal replica
    # to fp-noise (combine order differs across block routing)
    assert np.abs(got - want_p).max() < 1e-12
    assert res.mass_ok and res.res_ok
    assert abs(res.sum_p + res.sum_r - 1.0) < 1e-9
    # vs exact solve: dangling rows restart at the seed
    deg = np.zeros(g.n)
    P = np.zeros((g.n, g.n))
    for a, b in pairs:
        deg[a] += 1
    for a, b in pairs:
        P[a, b] = 1.0 / deg[a]
    for u in range(g.n):
        if deg[u] == 0:
            P[u, 3] = 1.0
    e = np.zeros(g.n)
    e[3] = 1.0
    pi = np.linalg.solve(np.eye(g.n) - (1 - alpha) * P.T, alpha * e)
    assert np.abs(pi - got).sum() <= res.sum_r + 1e-9


def test_ppr_push_guards(tmp_path, ray_session):
    g = _graph(tmp_path, [(0, 1), (1, 2)], shard_rows=2)
    with pytest.raises(ValueError):
        ppr_push(g, seed=99)
    with pytest.raises(RuntimeError):
        ppr_push(g, seed=0, eps=1e-12, max_rounds=1)
