"""Greedy maximal matching vs a sequential simulation of the identical
rule, validity, the planted K4+path closed form the SQL gate relies
on, and the tie-free sweep over every planted group base."""

import random

import numpy as np
import pyarrow as pa

import ray.data

import distributed_pagerank_ray.pipelines.matching as mt
from distributed_pagerank_ray.pipelines.matching import (
    _edge_priority,
    maximal_matching,
)

COMBOS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (4, 5), (5, 6)]


def _p(a, b, r=0):
    return int(
        _edge_priority(np.array([a], np.int64), np.array([b], np.int64), r)[0]
    )


def _brute(edges):
    active, matched, r = set(edges), set(), 0
    while active and r < 64:
        p = {e: _p(*e, r) for e in active}
        vmin: dict = {}
        for (a, b), pe in p.items():
            vmin[a] = min(vmin.get(a, 1 << 62), pe)
            vmin[b] = min(vmin.get(b, 1 << 62), pe)
        cand = [e for e in active if p[e] == vmin[e[0]] and p[e] == vmin[e[1]]]
        cc: dict = {}
        for a, b in cand:
            cc[a] = cc.get(a, 0) + 1
            cc[b] = cc.get(b, 0) + 1
        ok = [e for e in cand if cc[e[0]] == 1 and cc[e[1]] == 1]
        matched.update(ok)
        dead = {v for e in ok for v in e}
        active = {e for e in active if e[0] not in dead and e[1] not in dead}
        r += 1
    assert not active, "brute did not settle"
    return matched, r


def _ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def test_matching_matches_sequential_rule_and_is_valid():
    rng = random.Random(9)
    n = 40
    edges = set()
    while len(edges) < 70:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    exp, rounds = _brute(edges)
    got = set(
        map(
            tuple,
            maximal_matching(_ds(edges), num_partitions=2, num_shards=2)
            .to_pandas()
            .values.tolist(),
        )
    )
    assert got == exp
    assert mt.LAST_STATS["rounds"] == rounds
    verts = [v for e in got for v in e]
    assert len(verts) == len(set(verts))  # vertex-disjoint
    dead = set(verts)
    assert all(a in dead or b in dead for a, b in edges)  # maximal


def test_matching_planted_closed_form_and_tie_free_sweep():
    # every group base used by the g_matching_doc gate must be tie-free
    for g in range(256):
        b = 8 * g
        ps = [_p(b + i, b + j) for i, j in COMBOS]
        assert len(set(ps)) == len(ps), f"priority tie in group {g}"
    # closed form on one group: K4 matches argmin + its opposite (5-c),
    # the path matches its argmin
    b = 8 * 3
    edges = [(b + i, b + j) for i, j in COMBOS]
    got = set(
        map(
            tuple,
            maximal_matching(_ds(edges), num_partitions=2, num_shards=2)
            .to_pandas()
            .values.tolist(),
        )
    )
    ps = [_p(*e) for e in edges]
    cmin = int(np.argmin(ps[:6]))
    pmin = 6 + int(np.argmin(ps[6:]))
    assert got == {edges[cmin], edges[5 - cmin], edges[pmin]}


def test_matching_empty_and_single_edge():
    got = maximal_matching(_ds([]), num_partitions=2, num_shards=2).to_pandas()
    assert len(got) == 0
    got = maximal_matching(_ds([(3, 9)]), num_partitions=2, num_shards=2).to_pandas()
    assert got.values.tolist() == [[3, 9]]
