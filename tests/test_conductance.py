"""Conductance: brute-force parity + validation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from distributed_pagerank_ray.pipelines.metrics import conductance


def _run(pairs, side_of):
    verts = sorted({v for p in pairs for v in p})
    e = pa.table(
        {
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    s = pa.table(
        {
            "id": pa.array(verts, pa.int64()),
            "side": pa.array([side_of(v) for v in verts], pa.int64()),
        }
    )
    out = conductance(
        ray.data.from_arrow(e).repartition(3),
        ray.data.from_arrow(s).repartition(2),
        num_partitions=2,
    ).to_pandas()
    return out.iloc[0]


def _brute(pairs, side_of):
    cut = sum(1 for a, b in pairs if side_of(a) != side_of(b))
    vol = [0, 0]
    for a, b in pairs:
        vol[side_of(a)] += 1
        vol[side_of(b)] += 1
    return cut, vol[0], vol[1], round(cut / min(vol), 6)


def test_brute_parity_random():
    rng = np.random.default_rng(3)
    for n, m in [(20, 40), (60, 150)]:
        seen = set()
        while len(seen) < m:
            a, b = rng.integers(0, n, 2)
            if a != b:
                seen.add((min(int(a), int(b)), max(int(a), int(b))))
        pairs = sorted(seen)
        for side_of in (lambda v: v % 2, lambda v: 1 if v % 5 == 0 else 0):
            want = _brute(pairs, side_of)
            got = _run(pairs, side_of)
            assert (got["cut"], got["vol0"], got["vol1"], got["conductance"]) == want


def test_planted_bisection():
    # two K4s joined by one bridge: cut=1, vol = 13 each side,
    # conductance = 1/13
    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(4 + i, 4 + j) for i in range(4) for j in range(i + 1, 4)]
    pairs = k4a + k4b + [(3, 4)]
    got = _run(pairs, lambda v: 0 if v < 4 else 1)
    assert (got["cut"], got["vol0"], got["vol1"]) == (1, 13, 13)
    assert got["conductance"] == round(1 / 13, 6)


def test_zero_volume_and_bad_side_raise():
    with pytest.raises(ValueError):
        _run([(0, 1), (1, 2)], lambda v: 0)  # everything on side 0
    with pytest.raises(Exception):
        _run([(0, 1)], lambda v: v + 1)  # side 2 is invalid
