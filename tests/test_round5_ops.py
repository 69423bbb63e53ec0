"""Round-5 operators: duplicated-span exposure + target-mixture
sampling, both vs brute-force Python oracles."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from distributed_pagerank_ray.functions.dedup import _re2_word_split, dup_span_stats
from distributed_pagerank_ray.functions.sampling import mixture_sample

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
DOCS = [
    {"doc_id": 0, "text": BASE},
    {"doc_id": 1, "text": BASE},  # exact dup: every gram shared
    {"doc_id": 2, "text": "alpha beta gamma UNIQUE words here only"},  # 1 shared gram
    {"doc_id": 3, "text": "nothing in common with anything else at all"},
    {"doc_id": 4, "text": "two words"},  # < k words: absent from output
    {"doc_id": 5, "text": ""},  # empty: absent
    {"doc_id": 6, "text": "  \t alpha beta gamma \n "},  # trim + exactly k words
    {"doc_id": 7, "text": "alpha alpha alpha alpha"},  # repeated gram positions
    {"doc_id": 8, "text": "alpha alpha alpha"},  # shares the repeated gram
]


def _brute_dup_spans(docs, k=3):
    grams = {}  # doc_id -> list of positional gram tuples
    for d in docs:
        w = _re2_word_split(d["text"])
        if len(w) >= k:
            grams[d["doc_id"]] = [tuple(w[i : i + k]) for i in range(len(w) - k + 1)]
    df = {}
    for did, gs in grams.items():
        for g in set(gs):
            df[g] = df.get(g, 0) + 1
    out = {}
    for did, gs in grams.items():
        dup = sum(1 for g in gs if df[g] >= 2)
        out[did] = (len(gs), dup, round(dup / len(gs), 6))
    return out


def test_dup_span_stats_matches_brute_force():
    got = (
        dup_span_stats(ray.data.from_items(DOCS), k=3, num_shards=2, join_partitions=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _brute_dup_spans(DOCS)
    assert set(got.index) == set(want)  # 4 and 5 absent
    for did, (tot, dup, frac) in want.items():
        row = got.loc[did]
        assert (row["total_grams"], row["dup_grams"]) == (tot, dup), did
        assert row["dup_frac"] == pytest.approx(frac, abs=1e-9)
    # planted invariants: exact dups are fully covered, singleton isn't
    assert got.loc[0, "dup_frac"] == 1.0 and got.loc[1, "dup_frac"] == 1.0
    assert got.loc[3, "dup_frac"] == 0.0
    assert got.loc[2, "dup_grams"] == 1  # exactly the "alpha beta gamma" position
    assert got.loc[7, "total_grams"] == 2 and got.loc[7, "dup_grams"] == 2


def _mix_ds(n=1000, blocks=7):
    langs = np.array(["en", "fr", "zh", "de", "es"])[
        np.arange(n) * 7 % 5
    ]  # deterministic, skewed off the id order
    t = pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64)), "lang": pa.array(langs)}
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _brute_mixture(n, weights, target_pct):
    langs = np.array(["en", "fr", "zh", "de", "es"])[np.arange(n) * 7 % 5]
    ids = np.arange(n, dtype=np.int64)
    h = ((ids * 48271) % 100_000_007 * 48271) % 100_000_007
    target = n * target_pct // 100
    out = []
    for g, w in weights.items():
        m = langs == g
        q = min(int(m.sum()), target * w // 100)
        order = np.lexsort((ids[m], h[m]))
        out.extend((g, i) for i in ids[m][order][:q])
    return set(out)


def test_mixture_sample_matches_brute_force():
    weights = {"en": 50, "fr": 30, "zh": 20}
    got = mixture_sample(_mix_ds(), weights, target_frac_pct=40).to_pandas()
    want = _brute_mixture(1000, weights, 40)
    assert set(zip(got["lang"], got["doc_id"])) == want
    # de/es excluded entirely
    assert set(got["lang"]) <= set(weights)
    # quota arithmetic: target 400 -> en 200, fr 120, zh 80 (all < avail 200)
    counts = got.groupby("lang").size().to_dict()
    assert counts == {"en": 200, "fr": 120, "zh": 80}


def test_mixture_sample_availability_cap_and_block_invariance():
    # fr weight so high its quota exceeds availability -> capped at avail
    weights = {"fr": 90, "en": 10}
    a = mixture_sample(_mix_ds(blocks=3), weights, target_frac_pct=80).to_pandas()
    b = mixture_sample(_mix_ds(blocks=17), weights, target_frac_pct=80).to_pandas()
    key = lambda df: sorted(zip(df["lang"], df["doc_id"]))
    assert key(a) == key(b)  # block-split invariant
    counts = a.groupby("lang").size().to_dict()
    # target 800 -> fr quota min(200, 720)=200 (capped), en min(200, 80)=80
    assert counts == {"fr": 200, "en": 80}
    assert key(a) == sorted(_brute_mixture(1000, weights, 80))

# ---------------------------------------------------------------- budget trim


def _trim_ds(n=400, blocks=9, seed=7):
    # deterministic docs with varied token counts and long-token ratios
    rng = np.random.default_rng(seed)
    words = np.array(["a", "of", "the", "word", "alpha", "gamma", "betaflow", "x1"])
    texts = [
        " ".join(words[rng.integers(0, len(words), rng.integers(1, 40))])
        for _ in range(n)
    ]
    texts[0] = ""  # blank doc: n_tokens 0, prio 0
    texts[1] = "\t tiny doc padded \n"
    t = pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64)), "text": pa.array(texts)}
    )
    return t, ray.data.from_arrow(t).repartition(blocks)


def _brute_budget_trim(t, budget, min_len=4):
    rows = []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        w = _re2_word_split(text)
        n = len(w)
        nl = sum(1 for x in w if len(x) >= min_len)
        prio = (1000 * nl) // n if n else 0
        rows.append((did, prio, n))
    rows.sort(key=lambda r: (-r[1], r[0]))
    out, cum = [], 0
    for did, prio, n in rows:
        cum += n
        if cum <= budget:
            out.append((did, prio, n, cum))
    return out


def test_budget_trim_matches_brute_force_and_block_invariant():
    from distributed_pagerank_ray.functions.sampling import budget_trim
    from distributed_pagerank_ray.functions.textstats import (
        long_token_count_batch,
        token_count_batch,
    )

    t, ds = _trim_ds()

    def prep(b):
        b = long_token_count_batch(token_count_batch(b))
        n = b.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        nl = b.column("n_long").to_numpy(zero_copy_only=False).astype(np.int64)
        prio = np.where(n > 0, (1000 * nl) // np.maximum(n, 1), 0).astype(np.int64)
        return pa.table(
            {"doc_id": b.column("doc_id"), "n_tokens": pa.array(n), "prio": pa.array(prio)}
        )

    budget = 2500
    got = (
        budget_trim(ds.map_batches(prep, batch_format="pyarrow"), budget=budget)
        .to_pandas()
        .sort_values("doc_id")
    )
    want = _brute_budget_trim(t, budget)
    assert sorted(zip(got["doc_id"], got["prio"], got["n_tokens"], got["cum_tokens"])) == sorted(
        want
    )
    # strict subset that nearly fills the budget (cut actually bites)
    assert 0 < len(got) < 400
    assert got["cum_tokens"].max() <= budget
    # block-split invariance
    _, ds17 = _trim_ds(blocks=17)
    got17 = (
        budget_trim(ds17.map_batches(prep, batch_format="pyarrow"), budget=budget)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert got17.values.tolist() == got.values.tolist()


def test_long_token_count_vectorized_matches_python():
    from distributed_pagerank_ray.functions.textstats import long_token_count_batch

    texts = ["", "a bb ccc dddd eeeee", "\t word \n", "αβγδ εζ", None, "x " * 50]
    b = pa.table({"text": pa.array(texts, pa.string())})
    got = long_token_count_batch(b).column("n_long").to_pylist()
    want = [
        sum(1 for w in _re2_word_split(x or "") if len(w) >= 4) for x in texts
    ]
    assert got == want
    # unicode: characters, not bytes (αβγδ is 4 chars -> counts)
    assert got[3] == 1


def test_edge_jaccard_brute_force():
    from distributed_pagerank_ray.pipelines.metrics import edge_jaccard

    rng = np.random.default_rng(23)
    raw = {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 25, 150), rng.integers(0, 25, 150))
        if a != b
    }
    und = sorted({(min(a, b), max(a, b)) for a, b in raw})
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in und], pa.int64()),
                "b": pa.array([e[1] for e in und], pa.int64()),
            }
        )
    ).repartition(3)
    got = edge_jaccard(ds, k=12, num_partitions=2, num_shards=2).to_pandas()

    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = []
    for a, b in und:
        c = len(adj[a] & adj[b])
        want.append((a, b, round(c / (len(adj[a]) + len(adj[b]) - c), 6)))
    want.sort(key=lambda t: (-t[2], t[0], t[1]))
    gl = [(int(r.a), int(r.b), float(r.jaccard)) for r in got.itertuples(index=False)]
    assert gl == want[:12]


def test_edge_jaccard_zero_common_edges_present():
    # a path graph has no triangles: every edge must surface with 0.0
    from distributed_pagerank_ray.pipelines.metrics import edge_jaccard

    und = [(i, i + 1) for i in range(6)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in und], pa.int64()),
                "b": pa.array([e[1] for e in und], pa.int64()),
            }
        )
    )
    got = edge_jaccard(ds, k=10, num_partitions=2, num_shards=2).to_pandas()
    assert len(got) == 6
    assert (got["jaccard"] == 0.0).all()


def test_eigencentrality_fixed_brute_force():
    from distributed_pagerank_ray.pipelines.pagerank_weighted import eigencentrality_fixed

    rng = np.random.default_rng(31)
    edges = sorted({(int(a), int(b)) for a, b in zip(rng.integers(0, 20, 80), rng.integers(0, 20, 80))})
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).repartition(3)
    got = (
        eigencentrality_fixed(ds, iters=3, num_partitions=2)
        .to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    x = np.ones(len(verts), dtype=np.int64)
    for _ in range(3):
        nxt = np.zeros_like(x)
        for a, b in edges:
            nxt[idx[b]] += x[idx[a]]
        x = nxt
    want = np.round(x.astype(np.float64) / x.sum(), 6)
    assert got["vertex"].tolist() == verts
    assert got["eig"].tolist() == want.tolist()


def test_events_quartile_tiles_tie_stable(tmp_path):
    import pandas as pd

    from distributed_pagerank_ray.pipelines.relational import events_quartile_tiles

    # heavy ties: 10 rows of value 1.0 must ALL share one tile
    df = pd.DataFrame(
        {
            "event_id": np.arange(16, dtype=np.int64),
            "event_type": ["a"] * 12 + ["b"] * 4,
            "value": [1.0] * 10 + [2.0, 3.0] + [5.0, 6.0, 7.0, 8.0],
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        events_quartile_tiles(str(tmp_path), k=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # group a: rank(1.0)=1 -> tile 1 for all ten; rank(2.0)=11 -> 1+(10*4)//12=4
    assert got.loc[:9, "tile"].tolist() == [1] * 10
    assert got.loc[10, "tile"] == 4
    assert got.loc[11, "tile"] == 1 + (11 * 4) // 12
    # group b: 4 distinct values over k=4 -> tiles 1..4
    assert got.loc[12:, "tile"].tolist() == [1, 2, 3, 4]


def _bpe_docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)


def test_bpe_train_matches_brute_force():
    from distributed_pagerank_ray.functions.bpe import bpe_brute_force, bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low newer wide lowest",
    ]
    got = bpe_train(_bpe_docs(texts), num_merges=12).to_pandas()
    wc: dict = {}
    for t in texts:
        for w in t.split(" "):
            wc[w] = wc.get(w, 0) + 1
    want = bpe_brute_force(wc, 12)
    assert [tuple(r) for r in got[["left", "right", "merged", "count"]].to_numpy()] == want


def test_bpe_same_symbol_runs_leftmost_greedy():
    from distributed_pagerank_ray.functions.bpe import bpe_brute_force, bpe_train

    # "aaaa" x3: (a,a) counts overlapping occurrences (3 per word), and
    # the merge applies leftmost-first -> "aa","aa"; next round merges
    # (aa,aa). Distributed and brute replicas must agree on all of it.
    texts = ["aaaa aaaa aaaa", "aaa b aaa", "ab ab"]
    got = bpe_train(_bpe_docs(texts), num_merges=4).to_pandas()
    wc: dict = {}
    for t in texts:
        for w in t.split(" "):
            wc[w] = wc.get(w, 0) + 1
    want = bpe_brute_force(wc, 4)
    assert [tuple(r) for r in got[["left", "right", "merged", "count"]].to_numpy()] == want
    assert got.loc[0, ["left", "right"]].tolist() == ["a", "a"]


def test_bpe_early_stop_single_chars():
    from distributed_pagerank_ray.functions.bpe import bpe_train

    got = bpe_train(_bpe_docs(["a b c d", "e f g"]), num_merges=5).to_pandas()
    assert len(got) == 0  # no adjacent pairs anywhere


def _brute_coreness(pairs):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    core = {}
    k = 1
    while edges:
        # peel to (k+1)-core
        cur = set(edges)
        verts_k = {v for e in cur for v in e}
        while True:
            deg: dict = {}
            for a, b in cur:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            kill = {v for v, d in deg.items() if d < k + 1}
            if not kill:
                break
            cur = {e for e in cur if e[0] not in kill and e[1] not in kill}
        verts_next = {v for e in cur for v in e}
        for v in verts_k - verts_next:
            core[v] = k
        edges = cur
        k += 1
    return core


def test_core_numbers_brute_force():
    from distributed_pagerank_ray.pipelines.kcore import core_numbers
    from distributed_pagerank_ray.pipelines.triangles import canonical_undirected

    rng = np.random.default_rng(41)
    pairs = [tuple(rng.integers(0, 30, 2)) for _ in range(180)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    ).repartition(3)
    got = core_numbers(canonical_undirected(ds), num_partitions=2).to_pandas()
    want = _brute_coreness(pairs)
    assert {(r.v, r.coreness) for r in got.itertuples()} == set(want.items())


def test_core_numbers_planted_closed_form():
    import itertools

    from distributed_pagerank_ray.pipelines.kcore import core_numbers
    from distributed_pagerank_ray.pipelines.triangles import canonical_undirected

    k4 = list(itertools.combinations(range(4), 2))
    chain = [(3, 4), (3, 5), (4, 5), (4, 6), (5, 6), (6, 7)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in k4 + chain], pa.int64()),
                "dst": pa.array([e[1] for e in k4 + chain], pa.int64()),
            }
        )
    )
    got = (
        core_numbers(canonical_undirected(ds), num_partitions=2)
        .to_pandas()
        .sort_values("v")
    )
    assert got["coreness"].tolist() == [3, 3, 3, 3, 2, 2, 2, 1]


def test_salsa_fixed_matches_numpy_replica():
    import random

    from distributed_pagerank_ray.pipelines.hits import salsa_fixed

    rng = random.Random(13)
    edges = sorted({(rng.randrange(8), 100 + rng.randrange(6)) for _ in range(20)})
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    got = (
        salsa_fixed(ds, iters=2, num_partitions=2)
        .to_pandas()
        .set_index("vertex")
        .sort_index()
    )

    verts = sorted(set(src) | set(dst))
    od = {v: int((src == v).sum()) for v in verts}
    idg = {v: int((dst == v).sum()) for v in verts}
    h = {v: 1.0 for v in verts}
    for _ in range(2):
        a = {}
        for s, d in edges:
            a[d] = a.get(d, 0.0) + h.get(s, 0.0) / od[s]
        h2 = {}
        for s, d in edges:
            h2[s] = h2.get(s, 0.0) + a.get(d, 0.0) / idg[d]
        h = h2
        auth = a
    th, ta = sum(h.values()), sum(auth.values())
    for v in verts:
        assert abs(got.loc[v, "hub"] - h.get(v, 0.0) / th) < 1e-5
        assert abs(got.loc[v, "auth"] - auth.get(v, 0.0) / ta) < 1e-5
    # SALSA's signature vs HITS: sends are degree-normalized, so total
    # sent mass per step is the number of SENDING vertices, not edges
    assert abs(sum(auth.values()) - len({s for s, _ in edges})) < 1e-9


def test_skyline_mask_brute_force_and_block_invariance():
    from distributed_pagerank_ray.pipelines.relational import _skyline_mask

    rng = np.random.default_rng(2)
    price = np.round(rng.random(2000) * 100, 2)
    size = rng.integers(1, 50, 2000)
    keep = _skyline_mask(price, size)
    dom = np.zeros(2000, bool)
    for i in range(2000):
        dom[i] = np.any(
            (price <= price[i])
            & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        )
    assert (keep == ~dom).all()
    # exact duplicates on the frontier are mutually non-dominating
    assert _skyline_mask(
        np.array([1.0, 1.0, 2.0, 0.5]), np.array([10, 10, 20, 1])
    ).tolist() == [True, True, True, True]
    assert _skyline_mask(np.array([1.0, 1.0, 1.0]), np.array([5, 7, 7])).tolist() == [
        False,
        True,
        True,
    ]
    # skyline(union) == skyline(union of block skylines): prune in two
    # arbitrary halves, merge, re-prune — identical frontier
    h = 1000
    k1 = _skyline_mask(price[:h], size[:h])
    k2 = _skyline_mask(price[h:], size[h:])
    mp = np.concatenate([price[:h][k1], price[h:][k2]])
    ms = np.concatenate([size[:h][k1], size[h:][k2]])
    merged = set(zip(mp[_skyline_mask(mp, ms)], ms[_skyline_mask(mp, ms)]))
    direct = set(zip(price[keep], size[keep]))
    assert merged == direct


def test_trustrank_mass_structure(ray_session):
    """Structural invariants on the bipartite gate graph: order
    vertices (pure sources, never reached from the part seed set) have
    tr == 0 → spam_mass == 1 exactly; seeded parts carry trust (mass
    < 1); mass is within [0, 1] for every vertex; and the two rank
    columns each sum to ~1."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    from distributed_pagerank_ray.pipelines.relational import ORDER_BASE

    df = entry.queries()["g_trustrank_mass"]("/root/testdata/sf0.001").to_pandas()
    assert abs(df["pr"].sum() - 1.0) < 1e-3 and abs(df["tr"].sum() - 1.0) < 1e-3
    orders = df[df["vertex"] >= ORDER_BASE]
    assert len(orders) and (orders["tr"] == 0).all() and (orders["spam_mass"] == 1).all()
    seeded = df[(df["vertex"] < ORDER_BASE) & (df["vertex"] % 7 == 0)]
    assert len(seeded) and (seeded["tr"] > 0).all() and (seeded["spam_mass"] < 1).all()
    # mass <= 1 everywhere; trusted seeds may go NEGATIVE (tr > pr is
    # the point of the seed set), so no lower bound
    assert (df["spam_mass"] <= 1).all()
    assert (seeded["spam_mass"] < 0).any()


def test_bigram_fluency_brute_force(ray_session):
    """Per-doc corpus-frequency counters vs a plain python reference
    on adversarial docs (exact dup pair, hapax-only doc, repeated
    bigram, whitespace pads, sub-2-word docs absent)."""
    from distributed_pagerank_ray.functions.dedup import bigram_fluency

    docs = [
        {"doc_id": 0, "text": "the cat sat on the mat"},
        {"doc_id": 1, "text": "the cat sat on the mat"},  # exact dup
        {"doc_id": 2, "text": "the cat naps"},  # shares 'the cat'
        {"doc_id": 3, "text": "zq xv qqq unique gibberish strings"},  # all hapax
        {"doc_id": 4, "text": "go go go go"},  # repeated bigram, tf=3 one gram
        {"doc_id": 5, "text": "single"},  # < 2 words: absent
        {"doc_id": 6, "text": "  \t the cat \n "},  # pads trim to 2 words
        {"doc_id": 7, "text": ""},  # absent
    ]
    grams: dict[int, list[tuple]] = {}
    for d in docs:
        w = d["text"].split()
        if len(w) >= 2:
            grams[d["doc_id"]] = [tuple(w[i : i + 2]) for i in range(len(w) - 1)]
    tf: dict[tuple, int] = {}
    for gs in grams.values():
        for g in gs:
            tf[g] = tf.get(g, 0) + 1
    got = (
        bigram_fluency(ray.data.from_items(docs), num_shards=3, join_partitions=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert sorted(got.index) == sorted(grams)
    for did, gs in grams.items():
        row = got.loc[did]
        s = sum(tf[g] for g in gs)
        h = sum(1 for g in gs if tf[g] == 1)
        assert (row["n_bigrams"], row["sum_tf"], row["n_hapax"]) == (len(gs), s, h)
        assert row["fluency"] == round(s / len(gs), 6)


def test_item_pair_cosine_matches_pandas(ray_session):
    """Cosine co-occurrence vs a pandas brute force over the sf0.001
    events table (json props parse, distinct incidence, pair counts,
    audience normalization) — and the empty-threshold short-circuit."""
    import json

    import pandas as pd

    from distributed_pagerank_ray.pipelines.relational import item_pair_cosine

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(sf + "/events.parquet", columns=["user_id", "props"])
    ev["k"] = ev["props"].map(lambda p: int(json.loads(p)["k"]))
    du = ev[["user_id", "k"]].drop_duplicates()
    ic = du.groupby("k").size()
    m = du.merge(du, on="user_id")
    m = m[m["k_x"] < m["k_y"]]
    cnt = m.groupby(["k_x", "k_y"]).size()
    cnt = cnt[cnt >= 5]
    got = item_pair_cosine(sf, min_count=5).to_pandas().set_index(["a", "b"]).sort_index()
    assert sorted(got.index) == sorted(cnt.index)
    for (a, b), n in cnt.items():
        row = got.loc[(a, b)]
        assert row["n"] == n
        import numpy as np

        assert row["cosine"] == round(float(n * 1.0 / (np.sqrt(ic[a]) * np.sqrt(ic[b]))), 6)
    # threshold above every count -> typed empty result, no join crash
    # (0-row to_pandas loses columns on this Ray version; the schema
    # is the contract)
    empty = item_pair_cosine(sf, min_count=10**9)
    assert empty.count() == 0
    assert empty.schema().names == ["a", "b", "n", "cosine"]


def test_pattern_hits_overlap_semantics():
    """Non-overlapping greedy counting: 'xx' in an x-run of n counts
    n//2; patterns absent emit no row; NULL text tolerated."""
    from distributed_pagerank_ray.functions.textstats import pattern_hits_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["xxxxx", "ab xx ab xx", "clean", None]),
        }
    )
    got = pattern_hits_batch(t, ["xx", "ab"]).to_pandas()
    rows = {(r.doc_id, r.pattern): r.n_hits for r in got.itertuples()}
    assert rows == {(0, "xx"): 2, (1, "xx"): 2, (1, "ab"): 2}


def test_resolve_redirects_doubling_and_cycle():
    """Pointer doubling matches a brute-force chain walk; chains of
    length 7 resolve in ceil(log2 7)+1 = 4 exchanges (O(log L), not
    O(L)); a redirect cycle raises instead of looping forever."""
    import numpy as np
    import ray.data

    from distributed_pagerank_ray.pipelines import redirects as rd

    # chains: 1->0, 2->1, ... 7->6 (len up to 7); a second family
    # 20->10 (cross-jump), 10->0 is NOT planted so 10 is terminal
    src = list(range(1, 8)) + [20]
    dst = list(range(0, 7)) + [10]
    tbl = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    out = rd.resolve_redirects(ray.data.from_arrow(tbl), num_partitions=2, num_shards=2)
    got = {r["url_id"]: (r["final_id"], r["n_hops"]) for r in out.take_all()}
    # brute force
    m = dict(zip(src, dst))
    exp = {}
    for u in set(src) | set(dst):
        cur, hops = u, 0
        while cur in m:
            cur, hops = m[cur], hops + 1
        exp[u] = (cur, hops)
    assert got == exp
    assert rd.LAST_STATS["jump_rounds"] <= 4  # log2(7) doublings + settle

    cyc = pa.table(
        {"src": pa.array([1, 2, 3], pa.int64()), "dst": pa.array([2, 3, 1], pa.int64())}
    )
    import pytest

    with pytest.raises(RuntimeError, match="cycle"):
        rd.resolve_redirects(
            ray.data.from_arrow(cyc), num_partitions=2, num_shards=2, max_rounds=8
        )


def test_kmv_distinct_matches_brute_force():
    """KMV estimate equals the brute-force (k-1)*m/h_k over the same
    double-MINSTD hashes; fewer-than-k distinct degrades to exact."""
    import numpy as np
    import ray.data

    from distributed_pagerank_ray.functions.sketches import kmv_distinct

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 100_000, size=5000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals)})).repartition(4)
    row = kmv_distinct(ds, "x", k=32).take_all()[0]
    M = 2147483647
    h = np.unique((vals * 48271 % M) * 48271 % M)
    kth = int(h[31])
    assert row["kth_hash"] == kth
    assert row["est_distinct"] == round(31.0 * M / kth, 6)
    assert row["n_seen_min"] == 32
    # sanity: the estimate is in the right ballpark of true distinct
    true = len(np.unique(vals))
    assert 0.5 * true < row["est_distinct"] < 2.0 * true

    small = ray.data.from_arrow(pa.table({"x": pa.array([5, 5, 9], pa.int64())}))
    r2 = kmv_distinct(small, "x", k=64).take_all()[0]
    assert r2["est_distinct"] == 2.0 and r2["n_seen_min"] == 2


def test_greedy_color_proper_and_deterministic():
    """Coloring is PROPER on a random graph (no monochromatic edge),
    covers every vertex exactly once, is deterministic across calls,
    and a K5 clique colors in exactly rank order of round-0 priority."""
    import numpy as np
    import ray.data

    from distributed_pagerank_ray.pipelines.coloring import greedy_color
    from distributed_pagerank_ray.pipelines.mis import _priority

    rng = np.random.default_rng(11)
    n = 60
    a = rng.integers(0, n, 150, dtype=np.int64)
    b = rng.integers(0, n, 150, dtype=np.int64)
    keep = a != b
    edges = pa.table({"src": pa.array(a[keep]), "dst": pa.array(b[keep])})
    verts = pa.table({"v": pa.array(np.arange(n, dtype=np.int64))})

    def run():
        out = greedy_color(
            ray.data.from_arrow(edges),
            ray.data.from_arrow(verts),
            num_partitions=2,
            num_shards=2,
            max_colors=32,
        )
        return {r["v"]: r["color"] for r in out.take_all()}

    col = run()
    assert len(col) == n and set(col) == set(range(n))
    for u, w in zip(a[keep], b[keep]):
        assert col[int(u)] != col[int(w)], (u, w)
    assert col == run()  # deterministic

    # K5: colors are the rank order of round-0 priorities
    k5v = np.arange(5, dtype=np.int64)
    combos = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    ke = pa.table(
        {
            "src": pa.array([i for i, _ in combos], pa.int64()),
            "dst": pa.array([j for _, j in combos], pa.int64()),
        }
    )
    out = greedy_color(
        ray.data.from_arrow(ke),
        ray.data.from_arrow(pa.table({"v": pa.array(k5v)})),
        num_partitions=2,
        num_shards=2,
        max_colors=6,
    )
    got = {r["v"]: r["color"] for r in out.take_all()}
    exp = {int(v): int(r) for r, v in enumerate(k5v[np.argsort(_priority(k5v, 0))])}
    assert got == exp


def test_unicode_normalize_batch_forms():
    """NFC composes decomposed pairs; NFD undoes it; NULLs pass
    through; already-normalized ASCII is unchanged."""
    from distributed_pagerank_ray.functions.textstats import unicode_normalize_batch

    t = pa.table(
        {
            "text": pa.array(
                ["plain ascii", "éé", "Å", None, ""]
            )
        }
    )
    nfc = unicode_normalize_batch(t, "text").column("text").to_pylist()
    assert nfc == ["plain ascii", "éé", "Å", None, ""]
    back = unicode_normalize_batch(
        pa.table({"text": pa.array(nfc)}), "text", form="NFD"
    ).column("text").to_pylist()
    assert back == ["plain ascii", "éé", "Å", None, ""]


def test_hrw_assign_stability():
    """Rendezvous property: adding a 9th shard moves ONLY keys whose
    new shard is 8 — no key moves between surviving shards (the
    consistent-routing guarantee mod-N lacks); distribution is
    non-degenerate across shards."""
    import numpy as np

    from distributed_pagerank_ray.state.shards import hrw_assign_batch

    keys = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64) * 7 + 1)})
    a8 = hrw_assign_batch(keys, "k", 8).column("shard_hrw").to_numpy()
    a9 = hrw_assign_batch(keys, "k", 9).column("shard_hrw").to_numpy()
    moved = a8 != a9
    assert (a9[moved] == 8).all()
    assert 0 < moved.sum() < len(keys) // 4  # ~1/9 expected
    assert len(np.unique(a8)) == 8


def test_meta_directives_parsing_hazards():
    """Attribute-order/quote/case hazards; most-restrictive union
    across doubled metas; canonical is first-match and skips the
    stylesheet decoy; pages without directives default clean."""
    from distributed_pagerank_ray.stages.extract import MetaDirectives

    md = MetaDirectives()
    pages = [
        b"<html><body>no directives</body></html>",
        b"<META CONTENT='NOFOLLOW' NAME='ROBOTS'>"
        b'<meta name="robots" content=" noindex , noarchive ">'
        b'<link rel="stylesheet" href="http://x/s.css">'
        b"<link data-v='1' rel='CANONICAL' href='http://c/1'>"
        b'<link rel="canonical" href="http://c/2">',
        b'<meta content="noindex" name="generator">',  # name!=robots
    ]
    t = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()), "html": pa.array(pages, pa.binary())}
    )
    got = md(t).to_pydict()
    assert got["noindex"] == [0, 1, 0]
    assert got["nofollow"] == [0, 1, 0]
    assert got["n_robots_metas"] == [0, 2, 0]
    assert got["canonical"] == ["", "http://c/1", ""]


def test_interval_cover_brute_force(tmp_path):
    import pandas as pd

    from distributed_pagerank_ray.pipelines.relational import interval_cover

    rng = np.random.default_rng(7)
    n = 400
    uid = rng.integers(0, 12, n)
    sec = rng.integers(0, 3000, n)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": uid.astype(np.int64),
            "ts": pd.to_datetime(sec * 1_000_000, unit="us"),
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        interval_cover(str(tmp_path), num_buckets=3)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # brute force: per user, merge sorted [s, e) with touching == merge
    s = sec.astype(np.int64)
    e = s + 60 + np.arange(n, dtype=np.int64) % 600
    want = []
    for u in sorted(set(uid.tolist())):
        idx = np.flatnonzero(uid == u)
        spans = sorted(zip(s[idx].tolist(), e[idx].tolist()))
        blocks = []
        for a, b in spans:
            if blocks and a <= blocks[-1][1]:
                blocks[-1][1] = max(blocks[-1][1], b)
            else:
                blocks.append([a, b])
        want.append(
            (u, len(idx), len(blocks), sum(b - a for a, b in blocks))
        )
    want_df = pd.DataFrame(want, columns=["user_id", "n_events", "n_blocks", "covered_s"])
    pd.testing.assert_frame_equal(got.astype("int64"), want_df.astype("int64"))


def test_interval_cover_bucket_invariance(tmp_path):
    import pandas as pd

    from distributed_pagerank_ray.pipelines.relational import interval_cover

    rng = np.random.default_rng(11)
    n = 100
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 5, n).astype(np.int64),
            "ts": pd.to_datetime(rng.integers(0, 900, n) * 1_000_000, unit="us"),
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    a = interval_cover(str(tmp_path), num_buckets=1).to_pandas().sort_values("user_id").reset_index(drop=True)
    b = interval_cover(str(tmp_path), num_buckets=257).to_pandas().sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_mode_per_user_tie_rule(tmp_path):
    import pandas as pd

    from distributed_pagerank_ray.pipelines.relational import mode_value_per_user

    # user 1: tie 2x1.00 vs 2x0.50 -> smaller cents (50) wins
    # user 2: clear winner 3x2.00
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 1, 2, 2, 2, 2], dtype=np.int64),
            "value": [1.0, 0.5, 1.0, 0.5, 2.0, 2.0, 2.0, 9.99],
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        mode_value_per_user(str(tmp_path), num_shards=2)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["mode_cents"].tolist() == [50, 200]
    assert got["n_mode"].tolist() == [2, 3]


def test_mode_per_user_packing_guard(tmp_path):
    import pandas as pd

    from distributed_pagerank_ray.pipelines.relational import mode_value_per_user

    df = pd.DataFrame({"user_id": [1], "value": [-0.5]})  # negative cents
    df.to_parquet(tmp_path / "events.parquet", index=False)
    with pytest.raises(Exception):
        mode_value_per_user(str(tmp_path), num_shards=2).to_pandas()


def test_resource_alloc_brute_force():
    from distributed_pagerank_ray.pipelines.metrics import adamic_adar_scores

    rng = np.random.default_rng(23)
    raw = {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 25, 150), rng.integers(0, 25, 150))
        if a != b
    }
    und = sorted({(min(a, b), max(a, b)) for a, b in raw})
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in und], pa.int64()),
                "b": pa.array([e[1] for e in und], pa.int64()),
            }
        )
    )
    got = adamic_adar_scores(
        ds, k=10, num_partitions=2, num_shards=2, weight="resource_alloc"
    ).to_pandas()
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = []
    for a, b in und:
        s = sum(1.0 / len(adj[m]) for m in adj[a] & adj[b])
        want.append((a, b, round(s, 6)))
    want.sort(key=lambda t: (-t[2], t[0], t[1]))
    gl = [(int(r.a), int(r.b), float(r.score)) for r in got.itertuples(index=False)]
    assert gl == want[:10]
    with pytest.raises(ValueError):
        adamic_adar_scores(ds, weight="nope")


def test_clipped_ngram_overlap_brute_force():
    from collections import Counter

    from distributed_pagerank_ray.functions.dedup import (
        _re2_word_split,
        clipped_ngram_overlap_batch,
    )

    rng = np.random.default_rng(5)
    vocab = ["the", "cat", "sat", "on", "mat", "a"]
    pairs = []
    for _ in range(60):
        la, lb = int(rng.integers(0, 12)), int(rng.integers(0, 12))
        a = " ".join(rng.choice(vocab, la))
        b = " ".join(rng.choice(vocab, lb))
        pairs.append((a, b))
    pairs += [("", ""), ("one", "one"), ("\tx  y\n", "x y")]
    na, nb, nc = clipped_ngram_overlap_batch([p[0] for p in pairs], [p[1] for p in pairs])
    for (a, b), ga, gb, gc in zip(pairs, na, nb, nc):
        ta, tb = _re2_word_split(a), _re2_word_split(b)
        ca = Counter(zip(ta, ta[1:]))
        cb = Counter(zip(tb, tb[1:]))
        assert ga == sum(ca.values()) and gb == sum(cb.values())
        assert gc == sum(min(ca[g], cb[g]) for g in ca)


def test_vocab_growth_brute_force():
    from distributed_pagerank_ray.functions.dedup import _re2_word_split
    from distributed_pagerank_ray.functions.textstats import vocab_growth

    texts = [
        "apple banana apple",
        "banana cherry",
        "",
        "  \t ",
        "date apple egg",
        "fig",
        "cherry fig grape",
        "grape apple",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    got = vocab_growth(ds, num_buckets=4, num_shards=2).to_pandas()
    B = -(-len(texts) // 4)
    first = {}
    for i, t in enumerate(texts):
        for w in _re2_word_split(t):
            first.setdefault(w, i // B)
    from collections import Counter

    nw = Counter(first.values())
    want_buckets = sorted(nw)
    assert got["bucket"].tolist() == want_buckets
    assert got["new_words"].tolist() == [nw[b] for b in want_buckets]
    assert got["cum_vocab"].tolist() == list(np.cumsum([nw[b] for b in want_buckets]))


def test_rich_club_brute_force():
    from distributed_pagerank_ray.pipelines.metrics import rich_club

    rng = np.random.default_rng(31)
    raw = {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 30, 200), rng.integers(0, 30, 200))
        if a != b
    }
    und = sorted({(min(a, b), max(a, b)) for a, b in raw})
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in und], pa.int64()),
                "b": pa.array([e[1] for e in und], pa.int64()),
            }
        )
    ).repartition(3)
    got = rich_club(ds, ks=(1, 3, 7), num_partitions=2, num_shards=2).to_pandas()
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for _, row in got.iterrows():
        k = row["k"]
        rich = {v for v, d in deg.items() if d > k}
        ek = sum(1 for a, b in und if a in rich and b in rich)
        assert row["n_k"] == len(rich) and row["e_k"] == ek
        want = round(2.0 * ek / (len(rich) * (len(rich) - 1)), 6) if len(rich) >= 2 else 0.0
        assert row["phi"] == want


def test_rake_keywords_brute_force():
    from collections import Counter, defaultdict

    from distributed_pagerank_ray.functions.dedup import _re2_word_split
    from distributed_pagerank_ray.functions.textstats import RAKE_STOPWORDS, rake_keywords

    texts = [
        "deep learning of the neural network",
        "neural network training is deep learning",
        "the quick brown fox and a lazy dog",
        "deep learning",
        "",
        "the the a of",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    got = rake_keywords(ds, k=5, num_shards=2).to_pandas()

    stops = set(RAKE_STOPWORDS)
    phrases = []
    for t in texts:
        cur = []
        for w in _re2_word_split(t) + ["the"]:
            if w in stops:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
    freq = Counter()
    deg = defaultdict(int)
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    scored = {}
    occ = Counter(phrases)
    import math

    for p in occ:
        # the engine quantizes word scores to the dyadic 2^-20 grid
        # (floor) so phrase sums are association-order-free
        scored[" ".join(p)] = round(
            sum(math.floor(deg[w] / freq[w] * 1048576) / 1048576 for w in p), 6
        )
    want = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["phrase"], got["score"])) == want
    assert got.set_index("phrase")["n_occ"].to_dict() == {
        " ".join(p) if isinstance(p, tuple) else p: occ[tuple(p.split(" "))]
        for p in got["phrase"]
    }


def test_decayed_value_brute_force(tmp_path):
    import pandas as pd

    from distributed_pagerank_ray.pipelines.relational import decayed_value_per_user

    rng = np.random.default_rng(19)
    n = 300
    sec = rng.integers(0, 90 * 3600, n)  # ages up to 90h: floor fires
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            "ts": pd.to_datetime(sec * 1_000_000, unit="us"),
            "value": np.round(rng.uniform(0, 50, n), 2),
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        decayed_value_per_user(str(tmp_path), num_shards=2)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    t_max = int(sec.max())
    cents = np.floor(df["value"].to_numpy() * 100).astype(np.int64)
    k = np.minimum((t_max - sec) // 3600, 16)
    num = cents << (16 - k)
    want = (
        pd.DataFrame({"user_id": df["user_id"], "num": num})
        .groupby("user_id", as_index=False)["num"]
        .sum()
    )
    assert got["num"].tolist() == want["num"].tolist()
    assert (got["decayed"] == np.round(got["num"] / 65536.0, 6)).all()


def test_benford_digits_brute(tmp_path):
    import pandas as pd

    from distributed_pagerank_ray.pipelines.relational import benford_digits

    rng = np.random.default_rng(29)
    # log-uniform magnitudes: close to Benford; plus power-of-ten edges
    p = np.concatenate(
        [10 ** rng.uniform(0, 4, 2000), np.array([10.0, 100.0, 1000.0, 9.99])]
    )
    df = pd.DataFrame({"l_extendedprice": p})
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)
    got = benford_digits(str(tmp_path)).to_pandas().sort_values("digit")
    cents = np.floor(p * 100).astype(np.int64)
    first = np.array([int(str(c)[0]) for c in cents if c > 0])
    import collections

    want = collections.Counter(first)
    total = len(first)
    assert got["digit"].tolist() == sorted(want)
    for _, row in got.iterrows():
        assert row["n"] == want[row["digit"]]
        assert row["share"] == round(want[row["digit"]] / total, 6)
    # power-of-ten cents (1000 -> 100000) must report digit 1, not a
    # float-log boundary artifact
    assert want[1] >= 3
