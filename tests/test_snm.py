"""Sorted-neighborhood blocking: brute-force parity + shape pins."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from distributed_pagerank_ray.functions.dedup import sorted_neighborhood_pairs


def _brute(keys, ids, window):
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    want = set()
    for p in range(len(order)):
        for q in range(p + 1, min(p + window, len(order))):
            want.add((ids[order[p]], ids[order[q]], q - p))
    return want


def _run(keys, ids, window, key_type, **kw):
    t = pa.table(
        {
            "k": pa.array(keys, key_type),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )
    out = sorted_neighborhood_pairs(
        ray.data.from_arrow(t).repartition(5), "k", "doc_id", window=window, **kw
    )
    got = set()
    for b in out.iter_batches(batch_format="pyarrow"):
        if "a" in b.column_names:
            got.update(zip(*(b.column(c).to_pylist() for c in ("a", "b", "d"))))
    return got


def test_brute_parity_int_keys_with_ties():
    rng = np.random.default_rng(7)
    n = 300
    ids = list(rng.permutation(n).astype(int))
    keys = [int(x) % 23 for x in rng.integers(0, 10_000, n)]  # heavy ties
    for w in (2, 4, 7):
        assert _run(keys, ids, w, pa.int64(), num_partitions=2) == _brute(keys, ids, w)


def test_brute_parity_string_keys():
    rng = np.random.default_rng(11)
    n = 200
    ids = list(range(n))
    keys = ["k%03d" % int(x) for x in rng.integers(0, 40, n)]
    assert _run(keys, ids, 5, pa.string(), num_partitions=3) == _brute(keys, ids, 5)


def test_numeric_keys_sort_numerically():
    # keys 2 and 10: lexicographic would order "10" < "2" and flip the
    # sweep — this pins the native-type block-offset ordering
    keys = [10, 2, 1, 30, 3]
    ids = [0, 1, 2, 3, 4]
    got = _run(keys, ids, 2, pa.int64(), num_partitions=2)
    # sorted by key: ids 2(k1), 1(k2), 4(k3), 0(k10), 3(k30)
    assert got == {(2, 1, 1), (1, 4, 1), (4, 0, 1), (0, 3, 1)}


def test_window_validation():
    with pytest.raises(ValueError):
        _run([1], [1], 1, pa.int64())
