import itertools

import numpy as np
import pytest

import ray.data

from distributed_pagerank_ray.functions.dedup import (
    char_shingles,
    exact_dedup_groups,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen small birds "
    "watch from a fence near the old farm house in the valley"
)
DOCS = [
    {"doc_id": 0, "text": BASE},
    {"doc_id": 1, "text": BASE},  # exact dup of 0
    {"doc_id": 2, "text": BASE.replace("seventeen", "nineteen")},  # near dup
    {"doc_id": 3, "text": "completely different content about distributed systems and ray data pipelines"},
    {"doc_id": 4, "text": BASE + " with a small suffix added"},  # near dup
    {"doc_id": 5, "text": ""},
]


def _ds():
    return ray.data.from_items(DOCS)


def _brute_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(char_shingles(a, k).tolist()), set(char_shingles(b, k).tolist())
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup():
    out = exact_dedup_groups(_ds()).take_all()
    reps = sorted((r["doc_id"], r["n_dups"]) for r in out)
    assert (0, 2) in reps  # docs 0 and 1 collapse, min id 0
    assert len(reps) == 5  # 6 docs, one dup pair


def test_ngram_jaccard_exact_pairs():
    got = ngram_jaccard_pairs(_ds(), threshold=0.6, num_partitions=2).take_all()
    got_pairs = sorted((r["a"], r["b"]) for r in got)
    want = sorted(
        (a, b)
        for a, b in itertools.combinations(range(6), 2)
        if _brute_jaccard(DOCS[a]["text"], DOCS[b]["text"]) >= 0.6
    )
    assert got_pairs == want
    assert (0, 1) in got_pairs
    # verify reported intersection sizes are the true ones
    for r in got:
        sa = set(char_shingles(DOCS[r["a"]]["text"]).tolist())
        sb = set(char_shingles(DOCS[r["b"]]["text"]).tolist())
        assert r["inter"] == len(sa & sb)
        assert r["size_a"] == len(sa) and r["size_b"] == len(sb)


def test_minhash_lsh_dedup():
    got = minhash_lsh_dedup_pairs(_ds(), threshold=0.6, num_partitions=2).take_all()
    got_pairs = sorted((r["a"], r["b"]) for r in got)
    # verified candidates must be a subset of the exact result ...
    exact = sorted(
        (a, b)
        for a, b in itertools.combinations(range(6), 2)
        if _brute_jaccard(DOCS[a]["text"], DOCS[b]["text"]) >= 0.6
    )
    assert set(got_pairs) <= set(exact)
    # ... and LSH at 16 bands x 4 rows must catch the exact dup + strong near-dups
    assert (0, 1) in got_pairs


def test_simhash_pairs():
    got = simhash_pairs(_ds(), max_hamming=8).take_all()
    pairs = {(r["a"], r["b"]): r["hamming"] for r in got}
    assert pairs.get((0, 1)) == 0  # identical docs, zero hamming
    # near-dup 2 differs by one word -> small hamming, should appear
    assert (0, 2) in pairs
    # unrelated doc 3 (hamming 28) should not pair with 0
    assert (0, 3) not in pairs


def test_simhash_hot_bucket_bound():
    # 1000 identical docs share one simhash -> every band bucket is
    # degenerate; with a bucket cap the clone cliques are DROPPED (no
    # quadratic pair blowup) while a small planted near-dup pair in
    # cold buckets still surfaces
    clones = [{"doc_id": i, "text": "spam " * 40} for i in range(1000)]
    planted = [
        {"doc_id": 2000, "text": BASE},
        {"doc_id": 2001, "text": BASE.replace("seventeen", "nineteen")},
    ]
    ds = ray.data.from_items(clones + planted)
    got = simhash_pairs(ds, max_hamming=8, max_bucket=64).take_all()
    pairs = {(r["a"], r["b"]) for r in got}
    assert (2000, 2001) in pairs
    assert not any(a < 1000 and b < 1000 for a, b in pairs)  # clone cliques dropped
    # and with no cap the clone pairs DO exist (sanity of the guard)
    few = [{"doc_id": i, "text": "spam " * 40} for i in range(3)]
    got2 = simhash_pairs(ray.data.from_items(few), max_hamming=0, max_bucket=None).take_all()
    assert {(r["a"], r["b"]) for r in got2} == {(0, 1), (0, 2), (1, 2)}


# ---------------------------------------------------------------- decontam

def test_cross_split_contamination_matches_brute_force():
    """20 docs with engineered trigram overlap across the deterministic
    80/20 split; engine output must equal a pure-Python recompute of
    shared-distinct-trigram counts."""
    from distributed_pagerank_ray.functions.decontam import cross_split_contamination
    from distributed_pagerank_ray.functions.sampling import _MOD, _hash_ids

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    docs = []
    for i in range(20):
        # rotating windows create controlled cross-doc trigram overlap
        toks = [words[(i + j) % len(words)] for j in range(6)]
        docs.append({"doc_id": i, "text": " ".join(toks)})
    docs.append({"doc_id": 20, "text": ""})  # no grams → never contaminated

    def grams(text):
        t = text.split()
        if not t:
            return set()
        if len(t) < 3:
            return {" ".join(t)}
        return {" ".join(t[j : j + 3]) for j in range(len(t) - 2)}

    cut = int(0.8 * _MOD)
    ids = np.arange(21, dtype=np.int64)
    is_train = _hash_ids(_hash_ids(ids)) < cut
    train_g = set().union(*(grams(d["text"]) for d, tr in zip(docs, is_train) if tr)) if is_train.any() else set()
    want = {
        d["doc_id"]: len(grams(d["text"]) & train_g)
        for d, tr in zip(docs, is_train)
        if not tr and len(grams(d["text"]) & train_g) > 0
    }
    assert want, "fixture must actually contain contamination"

    out = cross_split_contamination(
        ray.data.from_items(docs), n=3, train_frac=0.8, num_partitions=2, num_shards=2
    ).take_all()
    got = {r["doc_id"]: r["n_shared"] for r in out}
    assert got == want


def test_cross_split_contamination_max_df():
    """max_df drops ubiquitous grams before matching: a gram present in
    every doc stops counting, so contamination counts can only drop."""
    from distributed_pagerank_ray.functions.decontam import cross_split_contamination

    shared = "one two three"
    docs = [{"doc_id": i, "text": f"{shared} filler{i} extra{i} pad{i}"} for i in range(12)]
    exact = cross_split_contamination(
        ray.data.from_items(docs), n=3, num_partitions=2, num_shards=2
    ).take_all()
    capped = cross_split_contamination(
        ray.data.from_items(docs), n=3, num_partitions=2, num_shards=2, max_df=2
    ).take_all()
    e = {r["doc_id"]: r["n_shared"] for r in exact}
    c = {r["doc_id"]: r["n_shared"] for r in capped}
    assert set(c) <= set(e)
    assert all(c[k] <= e[k] for k in c)
    assert sum(c.values()) < sum(e.values())


def test_keep_best_per_cluster_brute():
    """keep_best_per_cluster == argmax(q, tie min id) per cluster."""
    import numpy as np
    import ray.data

    from distributed_pagerank_ray.functions.dedup import keep_best_per_cluster

    members = []
    quality = []
    want = {}
    rng_q = [7, 3, 7, 1, 9, 9, 2]
    for c in range(12):  # clusters of varied size incl. singletons
        size = 1 + c % 4
        ids = [100 * c + i for i in range(size)]
        qs = [rng_q[(c + i) % len(rng_q)] for i in range(size)]
        best = min(zip([-q for q in qs], ids))[1]
        for i, q in zip(ids, qs):
            members.append({"vid": i, "label": c})
            quality.append({"vid": i, "q": q})
            want[i] = 1 if i == best else 0

    got = keep_best_per_cluster(
        ray.data.from_items(members).repartition(3),
        ray.data.from_items(quality).repartition(2),
        num_shards=4,
    ).take_all()
    assert len(got) == len(want)
    for r in got:
        assert r["kept"] == want[r["vid"]], r
