"""TextRank: word co-occurrence edges + fixed-iteration PageRank vs the
pure-numpy reference oracle on a hazard-rich corpus."""

import numpy as np

import ray.data

from distributed_pagerank_ray.functions.dedup import _re2_word_split
from distributed_pagerank_ray.pipelines.textrank import textrank, word_cooc_edges
from oracle.pagerank_oracle import pagerank_oracle

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "  \tthe quick  brown\nfox  ",  # pad + run hazards
    "",  # blank
    "solo",  # one token -> no pairs
    "alpha beta alpha beta gamma",  # repeats
    "x x x y",  # self-pairs dropped
    "dog eats dog food daily",
    "quick thinking wins the day",
]


def _brute_pairs():
    pairs = set()
    for d in DOCS:
        w = _re2_word_split(d)
        for a, b in zip(w, w[1:]):
            if a != b:
                pairs.add((min(a, b), max(a, b)))
    return pairs


def test_word_cooc_edges_brute():
    ds = ray.data.from_items([{"text": t} for t in DOCS]).repartition(3)
    got = {(r["src"], r["dst"]) for r in word_cooc_edges(ds, num_shards=4).take_all()}
    want = set()
    for a, b in _brute_pairs():
        want.add((a, b))
        want.add((b, a))
    assert got == want


def test_textrank_matches_oracle(tmp_path):
    ds = ray.data.from_items([{"text": t} for t in DOCS]).repartition(3)
    out = textrank(ds, str(tmp_path / "trank"), iters=3).take_all()

    pairs = _brute_pairs()
    words = sorted({w for p in pairs for w in p})
    wid = {w: i for i, w in enumerate(words)}
    src, dst = [], []
    for a, b in pairs:
        src += [wid[a], wid[b]]
        dst += [wid[b], wid[a]]
    ranks, _, _, _ = pagerank_oracle(
        np.array(src), np.array(dst), threshold=0.0, max_iters=3
    )

    assert len(out) == len(words)
    for r in out:
        np.testing.assert_allclose(r["rank"], ranks[wid[r["word"]]], atol=1e-9)
