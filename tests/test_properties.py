"""Property-based tests (hypothesis) over the PURE kernels — parser,
shingles, fingerprints, sketches, and the numpy oracle's invariants —
with no Ray in the loop, so hundreds of examples stay cheap. The one
exception is the final BSP-combine section, which DOES run Ray per
example and is capped at max_examples=10 — keep any future Ray-in-loop
property test similarly capped."""

import numpy as np
from hypothesis import given, settings, strategies as st

from distributed_pagerank_ray.functions.dedup import char_shingles, word_shingles
from distributed_pagerank_ray.functions.sketches import HLL, _hash64
from distributed_pagerank_ray.functions.textstats import winnow_fingerprint
from distributed_pagerank_ray.sources.edgelist import parse_line
from oracle.pagerank_oracle import pagerank_oracle

TEXT = st.text(alphabet=st.characters(codec="utf-8", exclude_characters="\x00"), max_size=200)


@given(st.integers(-(10**9), 10**9), st.integers(-(10**9), 10**9))
def test_parse_line_roundtrip(a, b):
    assert parse_line(f"{a} {b}") == (a, b)
    assert parse_line(f"{a},{b}") == (a, b)


@given(TEXT)
@settings(max_examples=200)
def test_parse_line_never_wrong_accepts(line):
    """Any accepted line must be exactly two strict integers."""
    try:
        out = parse_line(line)
    except ValueError:
        return
    if out is None:
        assert line == "" or line.startswith("#") or line.startswith("//")
    else:
        s = line.replace(" ", ",", 1).split(",")
        assert len(s) == 2
        assert [int(x) for x in s] == list(out)
        for part in s:
            assert part.strip() == part  # no whitespace tolerance (Atoi)


@given(TEXT)
@settings(max_examples=100)
def test_shingles_deterministic_and_sorted(text):
    a = char_shingles(text)
    b = char_shingles(text)
    assert np.array_equal(a, b)
    assert np.array_equal(a, np.sort(a)) and len(np.unique(a)) == len(a)
    w = word_shingles(text)
    assert np.array_equal(w, word_shingles(text))
    # tokenization spec is RE2's \s (what the DuckDB oracles split on),
    # NOT Python str.split (Unicode whitespace): '\x0b' or NBSP is a
    # token character on both engines — see dedup._re2_word_split
    from distributed_pagerank_ray.functions.dedup import _re2_word_split

    if not _re2_word_split(text):
        assert len(w) == 0
    else:
        assert len(w) >= 1


@given(TEXT)
@settings(max_examples=100)
def test_winnow_deterministic(text):
    assert winnow_fingerprint(text) == winnow_fingerprint(text)
    assert winnow_fingerprint(text) >= 0


@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=500))
@settings(max_examples=30)
def test_hll_monotone_superset(vals):
    """Adding more values never decreases the estimate materially, and
    merge(a,b) == add(a ∪ b) exactly (register-wise)."""
    h1 = HLL().add_hashes(_hash64([str(v) for v in vals]))
    h2 = HLL().add_hashes(_hash64([str(v) for v in vals] + ["extra"]))
    both = HLL().add_hashes(_hash64([str(v) for v in vals]))
    both.merge(HLL().add_hashes(_hash64(["extra"])))
    assert np.array_equal(both.registers, h2.registers)


@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)), min_size=1, max_size=60
    ),
    st.floats(0.5, 0.95),
)
@settings(max_examples=25, deadline=None)
def test_oracle_invariants(edges, c):
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    ranks, it, conv, residual = pagerank_oracle(src, dst, c=c, threshold=1e-8)
    n = max(src.max(), dst.max()) + 1
    assert len(ranks) == n
    assert np.all(ranks >= 0)
    assert abs(ranks.sum() - 1.0) < 1e-9  # post-normalization
    assert 1 <= it <= 100
    # relabel invariance
    perm = np.random.default_rng(0).permutation(n)
    r2, it2, _, _ = pagerank_oracle(perm[src], perm[dst], c=c, threshold=1e-8, n_vertices=n)
    assert it == it2
    assert np.allclose(ranks, r2[perm], atol=1e-9)


# ---- BSP combine utilities vs pandas (few examples: Ray in the loop) ----

@given(
    st.lists(
        st.tuples(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1)),
        min_size=0,
        max_size=60,
    ),
    st.integers(2, 5),
)
@settings(max_examples=10, deadline=None)
def test_bsp_distinct_and_count_match_pandas(pairs, shards):
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from distributed_pagerank_ray.util import count_i64_keys, distinct_i64_pairs

    t = pa.table(
        {
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    distinct = distinct_i64_pairs(ds, "a", "b", num_shards=shards).to_pandas()
    counts = count_i64_keys(ds, "a", num_shards=shards).to_pandas()
    if not pairs:
        # all-empty Ray datasets drop their schema (documented quirk) —
        # only emptiness is checkable
        assert len(distinct) == 0 and len(counts) == 0
        return
    got_pairs = sorted(map(tuple, distinct[["a", "b"]].to_numpy()))
    assert got_pairs == sorted(set(pairs))
    exp = pd.Series([p[0] for p in pairs]).value_counts().to_dict()
    assert dict(zip(counts["a"], counts["cnt"])) == exp


@given(
    st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=50),
    st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=50),
    st.integers(1, 100),
)
def test_step_hash_range_and_determinism(cur, dst, step):
    from distributed_pagerank_ray.pipelines.walks import step_hash

    n = min(len(cur), len(dst))
    c = np.array(cur[:n], dtype=np.int64)
    d = np.array(dst[:n], dtype=np.int64)
    h = step_hash(c, d, step)
    assert (h >= 0).all() and (h < 100_000_007).all()
    assert np.array_equal(h, step_hash(c, d, step))
    # int64-exactness: recompute through Python bigints
    for i in range(n):
        x = (int(c[i]) * 131 + int(d[i]) * 977 + step * 7 + 1) % 100_000_007
        assert h[i] == (x * x + x * 48271) % 100_000_007


@given(st.integers(1, 256), st.integers(1, 32))
@settings(max_examples=50)
def test_sign_matrix_pure(d, k):
    from distributed_pagerank_ray.functions.similarity import sign_matrix

    S = sign_matrix(d, k)
    assert S.shape == (d, k)
    assert set(np.unique(S)) <= {-1.0, 1.0}
    assert np.array_equal(S, sign_matrix(d, k))


@given(TEXT)
@settings(max_examples=200)
def test_url_normalization_idempotent(s):
    import pyarrow as pa

    from distributed_pagerank_ray.functions.urls import normalize_url_batch

    once = normalize_url_batch(pa.table({"url": [s]})).column("url_norm").to_pylist()[0]
    twice = (
        normalize_url_batch(pa.table({"url": [once]})).column("url_norm").to_pylist()[0]
    )
    assert twice == once


@given(TEXT)
@settings(max_examples=200)
def test_pii_redaction_idempotent_and_clean(s):
    import pyarrow as pa

    from distributed_pagerank_ray.functions.textstats import redact_pii_batch

    out = redact_pii_batch(pa.table({"text": [s]}))
    red = out.column("text_redacted").to_pylist()[0]
    again = redact_pii_batch(pa.table({"text": [red]}))
    # a redacted text has no remaining matches and is a fixed point
    assert again.column("text_redacted").to_pylist()[0] == red
    assert again.column("n_email").to_pylist()[0] == 0
    assert again.column("n_ip").to_pylist()[0] == 0
    assert again.column("n_phone").to_pylist()[0] == 0


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2**31 - 1),
            st.integers(-(2**62), 2**62),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(2, 5),
)
@settings(max_examples=10, deadline=None)
def test_bsp_min_by_key_matches_pandas(rows, shards):
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from distributed_pagerank_ray.util import min_i64_by_key

    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    got = (
        min_i64_by_key(ray.data.from_arrow(t).repartition(3), "k", "v", num_shards=shards)
        .to_pandas()
    )
    exp = pd.DataFrame(rows, columns=["k", "v"]).groupby("k")["v"].min().to_dict()
    assert dict(zip(got["k"], got["v"])) == exp
