"""DAG longest-path depth + byte-exact Levenshtein, vs brute-force
Python oracles (and DuckDB for the levenshtein byte semantics)."""

import random

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

import distributed_pagerank_ray.pipelines.dagdepth as dagdepth
from distributed_pagerank_ray.functions.editdist import (
    levenshtein_brute,
    levenshtein_bytes,
)
from distributed_pagerank_ray.pipelines.dagdepth import dag_longest_path


def _brute_longest_path(edges, n):
    """O(V·E) relaxation to fixpoint — fine at test size."""
    depth = [0] * n
    for _ in range(n + 1):
        changed = False
        for s, d in edges:
            if depth[s] + 1 > depth[d]:
                depth[d] = depth[s] + 1
                changed = True
        if not changed:
            return depth
    raise AssertionError("brute force did not converge (cycle?)")


def _ds_edges(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def _ds_verts(n):
    return ray.data.from_arrow(pa.table({"v": pa.array(list(range(n)), pa.int64())}))


def test_dag_longest_path_brute_force():
    rng = random.Random(41)
    n = 60
    # random DAG: edges only id-increasing => acyclic by construction
    edges = set()
    while len(edges) < 120:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    exp = _brute_longest_path(edges, n)
    got = (
        dag_longest_path(_ds_edges(edges), _ds_verts(n), num_partitions=2, num_shards=2)
        .to_pandas()
        .sort_values("v")
    )
    assert got["v"].tolist() == list(range(n))
    assert got["depth"].tolist() == exp
    # rounds = depth + 1 (one extra round observes the unchanged sum)
    assert dagdepth.LAST_STATS["rounds"] == max(exp) + 1


def test_dag_longest_path_edgeless_and_chain():
    got = dag_longest_path(_ds_edges([]), _ds_verts(4)).to_pandas()
    assert sorted(got["depth"].tolist()) == [0, 0, 0, 0]
    chain = [(i, i + 1) for i in range(5)]
    got = (
        dag_longest_path(_ds_edges(chain), _ds_verts(6), num_partitions=2, num_shards=2)
        .to_pandas()
        .sort_values("v")
    )
    assert got["depth"].tolist() == [0, 1, 2, 3, 4, 5]


def test_dag_longest_path_cycle_raises():
    with pytest.raises(RuntimeError, match="cycle|max_rounds"):
        dag_longest_path(
            _ds_edges([(0, 1), (1, 2), (2, 0)]),
            _ds_verts(3),
            num_partitions=2,
            num_shards=2,
            max_rounds=8,
        )


def test_levenshtein_bytes_matches_brute_and_duckdb():
    rng = random.Random(7)
    alpha = "abcdé漢 xyz\t"
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 60))),
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 60))),
        )
        for _ in range(200)
    ]
    pairs += [("", ""), ("a", ""), ("", "b"), ("héllo wörld", "hello world")]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = levenshtein_bytes(a, b, prefix_chars=40)
    exp = np.array([levenshtein_brute(x[:40], y[:40]) for x, y in pairs])
    assert (got == exp).all()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    duck = np.array(
        [
            r[0]
            for r in con.sql(
                "SELECT levenshtein(substr(a,1,40), substr(b,1,40)) FROM t"
            ).fetchall()
        ]
    )
    assert (got == duck).all()


def test_levenshtein_bytes_byte_not_codepoint():
    # DuckDB semantics: 'é' is two UTF-8 bytes, so é->e costs 2 (one
    # sub + one delete), not 1
    assert levenshtein_bytes(["éx"], ["ex"])[0] == 2
    assert levenshtein_bytes(["aé"], ["a"])[0] == 2


def test_jaro_winkler_published_vectors():
    from distributed_pagerank_ray.functions.editdist import jaro_winkler_bytes

    cases = {
        ("MARTHA", "MARHTA"): 0.9611111111111111,
        ("DIXON", "DICKSONX"): 0.8133333333333332,
        ("JELLYFISH", "SMELLYFISH"): 0.8962962962962964,
        ("DWAYNE", "DUANE"): 0.8400000000000001,
        ("abc", "abc"): 1.0,
        ("", "abc"): 0.0,
        ("", ""): 0.0,  # DuckDB returns 0 for empty-vs-empty
        ("ab", "ba"): 0.0,  # zero window: no matches possible
        ("éx", "ex"): 0.0,  # BYTE semantics break the é match
        ("abcd", "dcba"): 0.5,
        ("aXXXXXX", "aYYYYYY"): 0.42857142857142855,  # jaro <= 0.7: NO boost
        ("aaab", "aaac"): 0.8833333333333334,  # boost, prefix 3
        ("aaaaaaaaaa", "aaaaabaaaa"): 0.96,  # prefix capped at 4
    }
    got = jaro_winkler_bytes([k[0] for k in cases], [k[1] for k in cases])
    for (a, b), want, g in zip(cases.keys(), cases.values(), got):
        assert g == want, (a, b, g, want)


def test_jaro_winkler_matches_brute_and_duckdb():
    from distributed_pagerank_ray.functions.editdist import (
        jaro_winkler_brute,
        jaro_winkler_bytes,
    )

    rng = random.Random(13)
    alpha = "abcdé漢 xyz\t"
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 60))),
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 60))),
        )
        for _ in range(300)
    ]
    pairs += [("", ""), ("a", ""), ("", "b"), ("héllo wörld", "hello world")]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = jaro_winkler_bytes(a, b, prefix_chars=40)
    exp = np.array([jaro_winkler_brute(x[:40], y[:40]) for x, y in pairs])
    assert (got == exp).all()  # bit-exact, not allclose
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    duck = np.array(
        [
            r[0]
            for r in con.sql(
                "SELECT jaro_winkler_similarity(substr(a,1,40), substr(b,1,40)) FROM t"
            ).fetchall()
        ]
    )
    assert (got == duck).all()
