import numpy as np
import pyarrow as pa

import ray.data

from distributed_pagerank_ray.functions.textstats import (
    LangId,
    bpe_ish_token_count_batch,
    md5_fingerprint_batch,
    quality_batch,
    token_count_batch,
    winnow_fingerprint,
    winnow_batch,
)

DOCS = [
    {"doc_id": 0, "text": "the quick brown fox and the lazy dog"},
    {"doc_id": 1, "text": "  spaced   out\ttokens\nhere  "},
    {"doc_id": 2, "text": ""},
    {"doc_id": 3, "text": "il gatto e il cane per la casa di una strada"},
    {"doc_id": 4, "text": "Hello, world! 123."},
]


def test_token_count():
    t = pa.table({"doc_id": [d["doc_id"] for d in DOCS], "text": [d["text"] for d in DOCS]})
    out = token_count_batch(t)
    assert out.column("n_tokens").to_pylist() == [8, 4, 0, 11, 3]


def test_bpe_ish():
    t = pa.table({"text": ["Hello, world!"]})
    assert bpe_ish_token_count_batch(t).column("n_bpe_tokens").to_pylist() == [4]


def test_quality():
    t = pa.table({"text": ["abc", "!!!!", ""]})
    out = quality_batch(t)
    assert out.column("n_chars_utf8").to_pylist() == [3, 4, 0]
    assert out.column("n_punct").to_pylist() == [0, 4, 0]
    scores = out.column("quality_score").to_pylist()
    assert scores[1] == 0.0  # all punctuation
    assert 0 <= scores[0] <= 1


def test_langid():
    lid = LangId()
    assert lid.classify(DOCS[0]["text"]) == "en"
    assert lid.classify(DOCS[3]["text"]) == "it"
    assert lid.classify("zzz qqq") == "und"
    assert lid.classify("") == "und"


def test_langid_on_corpus(tiny_corpus):
    """Generator langs should be mostly recoverable by the heuristic."""
    pages = ray.data.read_parquet(f"{tiny_corpus}/pages.parquet", columns=["text", "lang"])
    out = pages.map_batches(LangId, batch_format="pyarrow", concurrency=2).take_all()
    agree = sum(1 for r in out if r["lang_pred"] == r["lang"])
    assert agree / len(out) > 0.9


def test_fingerprints_deterministic():
    t = pa.table({"text": ["hello world again and again", "hello world again and again", "different"]})
    md5 = md5_fingerprint_batch(t).column("fingerprint").to_pylist()
    assert md5[0] == md5[1] != md5[2]
    wf = winnow_batch(t).column("winnow_fp").to_pylist()
    assert wf[0] == wf[1] != wf[2]
    assert winnow_fingerprint("hello world again and again") == wf[0]
    # near-identical docs share most winnow windows only if long; just
    # check short-text and empty edge cases don't crash
    assert winnow_fingerprint("") == 0
    assert winnow_fingerprint("ab") != 0


def test_repetition_stats():
    """Hand-computed Gopher repetition fractions, plus a brute-force
    Counter cross-check over the shared DOCS fixtures (null text, empty
    text, leading/trailing whitespace)."""
    from collections import Counter

    from distributed_pagerank_ray.functions.textstats import repetition_stats_batch

    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a a a b",          # top word a=3/4; 2-grams: aa aa ab -> top 2/3, dup 1/3
                "x y x y x",        # top 3/5; 2-grams xy yx xy yx -> top 2/4, dup 2/4
                None,               # no words
                "solo",             # 1 word, no 2-grams
            ],
        }
    )
    out = repetition_stats_batch(t).to_pydict()
    assert out["n_words"] == [4, 5, 0, 1]
    assert out["top_word_frac"] == [0.75, 0.6, 0.0, 1.0]
    assert out["top_2gram_frac"] == [round(2 / 3, 6), 0.5, 0.0, 0.0]
    assert out["dup_2gram_frac"] == [round(1 / 3, 6), 0.5, 0.0, 0.0]

    docs = pa.Table.from_pylist(DOCS)
    got = repetition_stats_batch(docs).to_pydict()
    for i, d in enumerate(DOCS):
        words = [w for w in (d["text"] or "").split() if w]
        grams = list(zip(words, words[1:]))
        wc, gc = Counter(words), Counter(grams)
        assert got["n_words"][i] == len(words)
        assert got["top_word_frac"][i] == (
            round(max(wc.values()) / len(words), 6) if words else 0.0
        )
        assert got["top_2gram_frac"][i] == (
            round(max(gc.values()) / len(grams), 6) if grams else 0.0
        )
        assert got["dup_2gram_frac"][i] == (
            round((len(grams) - len(gc)) / len(grams), 6) if grams else 0.0
        )


def test_tfidf_top_terms():
    """tfidf_top_terms vs a brute-force Counter replica on the DOCS
    fixtures: same scores (tf·ln(N/df), 6dp), same (score desc, word
    asc) ranking, k=2, across several batch/bucket shapes."""
    import math
    from collections import Counter

    from distributed_pagerank_ray.functions.textstats import tfidf_top_terms

    docs = [d for d in DOCS]
    tfs = {d["doc_id"]: Counter((d["text"] or "").split()) for d in docs}
    df = Counter(w for c in tfs.values() for w in c)
    n = len(docs)
    want = {}
    for did, c in tfs.items():
        scored = sorted(
            ((round(tf * math.log(n / df[w]), 6), w, tf) for w, tf in c.items()),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        for rk, (s, w, tf) in enumerate(scored, 1):
            want[(did, rk)] = (w, s, tf)

    ds = ray.data.from_items(docs, override_num_blocks=3)
    out = tfidf_top_terms(ds, k=2, num_buckets=4).to_pandas()
    got = {
        (int(r.doc_id), int(r.rk)): (r.word, float(r.tfidf), int(r.tf))
        for r in out.itertuples()
    }
    assert got == want


def test_redact_pii():
    from distributed_pagerank_ray.functions.textstats import redact_pii_batch

    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                "mail bob.smith+x@sub.example.co.uk now",
                "server at 10.0.255.1 and 8.8.8.8 up",
                "call 555-123-4567 or 555 987 6543",
                "version 1234.1.1.1 is not an ip",
                None,
                "a@b.io via 1.2.3.4 tel 111-222-3333",
            ],
        }
    )
    out = redact_pii_batch(t)
    assert out.column("n_email").to_pylist() == [1, 0, 0, 0, 0, 1]
    assert out.column("n_ip").to_pylist() == [0, 2, 0, 0, 0, 1]
    assert out.column("n_phone").to_pylist() == [0, 0, 2, 0, 0, 1]
    red = out.column("text_redacted").to_pylist()
    assert red[0] == "mail <EMAIL> now"
    assert red[1] == "server at <IP> and <IP> up"
    assert red[2] == "call <PHONE> or <PHONE>"
    assert red[3] == "version 1234.1.1.1 is not an ip"  # \b blocks the match
    assert red[4] == ""
    assert red[5] == "<EMAIL> via <IP> tel <PHONE>"
    # original column untouched
    assert out.column("text").to_pylist() == t.column("text").to_pylist()


def test_normalize_url_batch():
    from distributed_pagerank_ray.functions.urls import normalize_url_batch

    t = pa.table(
        {
            "url": [
                "HTTP://WWW.Foo.COM:80/Path/X?q=1#frag",
                "https://a.b.c:443/",
                "HtTpS://Host.IO:8080/P?x=Y#z",
                "relative/path/no-scheme",
                "ftp://MIXED.Case.Org/File",
                None,
            ]
        }
    )
    out = normalize_url_batch(t)
    assert out.column("url_norm").to_pylist() == [
        "http://www.foo.com/Path/X?q=1",
        "https://a.b.c/",
        "https://host.io:8080/P?x=Y",
        "relative/path/no-scheme",
        "ftp://mixed.case.org/File",
        "",
    ]
    assert out.column("host").to_pylist() == [
        "www.foo.com",
        "a.b.c",
        "host.io:8080",
        "",
        "mixed.case.org",
        "",
    ]


def test_word_pair_pmi_brute_force():
    import math

    from distributed_pagerank_ray.functions.textstats import word_pair_pmi

    docs = [
        {"doc_id": 0, "text": "a b a b a b c"},
        {"doc_id": 1, "text": "b a b a x y"},
        {"doc_id": 2, "text": "a b a b"},
    ]
    # brute force
    from collections import Counter

    wc: Counter = Counter()
    prc: Counter = Counter()
    for d in docs:
        ws = [w for w in d["text"].split() if w]
        wc.update(ws)
        for i in range(len(ws)):
            for j in range(i + 1, min(i + 3, len(ws))):
                prc[tuple(sorted((ws[i], ws[j])))] += 1
    nw = sum(wc.values())
    np_ = sum(prc.values())
    want = {}
    for (a, b), n in prc.items():
        if n >= 2:
            want[(a, b)] = (
                n,
                round(math.log2((n / np_) / ((wc[a] / nw) * (wc[b] / nw))), 6),
            )

    ds = ray.data.from_items(docs)
    got = {
        (r["a"], r["b"]): (r["n"], r["pmi"])
        for r in word_pair_pmi(ds, window=2, min_count=2, num_partitions=2).take_all()
    }
    assert got == want


def test_prune_frequent_lines():
    from distributed_pagerank_ray.functions.textstats import prune_frequent_lines

    docs = [
        {"doc_id": 0, "text": "keep me\ncookie banner\nunique zero"},
        {"doc_id": 1, "text": "cookie banner\nunique one\n\nfooter"},
        {"doc_id": 2, "text": "footer\nunique two\ncookie banner"},
        {"doc_id": 3, "text": ""},
    ]
    got = {
        r["doc_id"]: r["text_pruned"]
        for r in prune_frequent_lines(ray.data.from_items(docs), min_df=2).take_all()
    }
    assert got == {
        0: "keep me\nunique zero",
        1: "unique one",  # empty line dropped too (df of '' is 1 here but blank units always go)
        2: "unique two",
        3: "",
    }


def test_zlib_ratio_exact_parity_and_ordering():
    import zlib

    from distributed_pagerank_ray.functions.textstats import zlib_ratio_batch

    docs = {
        0: "spam spam spam " * 200,
        1: "The quick brown fox jumps over the lazy dog; prose varies. " * 10,
        2: "",
        3: "héllo wörld   unicode bytes",
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    r = zlib_ratio_batch(t)
    for i, (did, s) in enumerate(docs.items()):
        b = s.encode("utf-8")
        assert r["raw_len"][i].as_py() == len(b)
        assert r["comp_len"][i].as_py() == len(zlib.compress(b, 6))
        exp = round(len(zlib.compress(b, 6)) / len(b), 6) if b else 0.0
        assert r["ratio"][i].as_py() == exp
    # the repetition signal: spam compresses far below prose
    assert r["ratio"][0].as_py() < 0.5 * r["ratio"][1].as_py()


def test_bm25_matches_brute_force(ray_session):
    import math

    from distributed_pagerank_ray.functions.textstats import bm25_scores

    docs = {
        0: "apple banana apple cherry",
        1: "banana banana date",
        2: "cherry apple",
        3: "",
        4: "egg fig grape",
        5: "apple apple apple banana banana cherry date egg",
    }
    ds = ray.data.from_items([{"doc_id": k, "text": v} for k, v in docs.items()])
    got = (
        bm25_scores(ds, n_terms=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    # brute force with the identical formula and term order
    toks = {k: [w for w in v.split(" ") if w] for k, v in docs.items()}
    from collections import Counter

    cnt = Counter(w for ws in toks.values() for w in ws)
    terms = sorted(cnt, key=lambda w: (-cnt[w], w))[:3]
    n = len(docs)
    sum_dl = float(sum(len(ws) for ws in toks.values()))
    avgdl = sum_dl / n
    df = {t: sum(1 for ws in toks.values() if t in ws) for t in terms}
    k1, b = 1.2, 0.75
    exp = {}
    for d, ws in toks.items():
        s, hits = 0.0, 0
        for t in terms:
            tf = float(ws.count(t))
            if tf > 0:
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(ws) / avgdl)))
                hits += 1
        if hits:
            exp[d] = (hits, round(s, 6))
    assert {int(i): (int(r.n_hit), float(r.score)) for i, r in got.iterrows()} == exp


def test_keyness_g2_brute_force():
    """keyness_g2 == hand-computed Dunning G² on a hazard corpus."""
    import math
    from collections import Counter

    import numpy as np
    import ray.data

    from distributed_pagerank_ray.functions.dedup import _re2_word_split
    from distributed_pagerank_ray.functions.textstats import keyness_g2

    texts = [
        "alpha beta alpha gamma",
        "beta beta delta",
        "  alpha\tdelta epsilon \n",
        "",
        "gamma gamma gamma zeta",
        "epsilon alpha",
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]

    def split(ids):
        return ids % 2  # even docs -> A, odd -> B

    ca, cb = Counter(), Counter()
    for i, t in enumerate(texts):
        (ca if i % 2 == 0 else cb).update(_re2_word_split(t))
    ta, tb = sum(ca.values()), sum(cb.values())

    def g2(w):
        na, nb = ca[w], cb[w]
        row = na + nb
        out = 0.0
        if na:
            out += na * math.log(na / ((ta * row) / (ta + tb)))
        if nb:
            out += nb * math.log(nb / ((tb * row) / (ta + tb)))
        return round(2 * out, 6)

    ds = ray.data.from_items(rows).repartition(3)
    got = keyness_g2(ds, split, num_shards=4).take_all()
    vocab = sorted(set(ca) | set(cb))
    assert [r["word"] for r in got] == vocab
    for r in got:
        assert (r["na"], r["nb"]) == (ca[r["word"]], cb[r["word"]])
        np.testing.assert_allclose(r["g2"], g2(r["word"]), atol=1e-9)


def test_sentence_stats_brute():
    import numpy as np
    import pyarrow as pa
    import re

    from distributed_pagerank_ray.functions.textstats import sentence_stats_batch

    texts = [
        "One. Two! Three?",
        "no terminator here",
        "",
        "  pad . . !! x? ",
        "a.b.c",
    ]
    t = pa.table({"text": pa.array(texts)})
    out = sentence_stats_batch(t)
    for i, txt in enumerate(texts):
        segs = [s.strip("\t\n\f\r ") for s in re.split(r"[.!?]+", txt)]
        nb = [s for s in segs if s]
        assert out.column("n_sentences")[i].as_py() == len(nb)
        assert out.column("sent_chars")[i].as_py() == sum(len(s) for s in nb)
        if nb:
            want = round(sum(len(s) for s in nb) * 1.0 / len(nb), 6)
            np.testing.assert_allclose(out.column("avg_chars")[i].as_py(), want)


def test_readability_brute():
    import re

    import numpy as np
    import pyarrow as pa

    from distributed_pagerank_ray.functions.textstats import readability_batch

    texts = ["The cat sat. On a mat!", "aeiou ouy xyz. q!"]
    out = readability_batch(pa.table({"text": pa.array(texts)}))
    for i, txt in enumerate(texts):
        w = len([x for x in re.split(r"[\t\n\f\r ]+", txt.strip("\t\n\f\r ")) if x])
        s = len([x for x in re.split(r"[.!?]+", txt) if x.strip("\t\n\f\r ")])
        y = len(re.findall(r"[aeiouyAEIOUY]+", txt))
        want = round(206.835 - 1.015 * (w * 1.0 / s) - 84.6 * (y * 1.0 / w), 6)
        assert out.column("n_tokens")[i].as_py() == w
        assert out.column("n_sentences")[i].as_py() == s
        assert out.column("syll_runs")[i].as_py() == y
        np.testing.assert_allclose(out.column("flesch")[i].as_py(), want)


def test_stopword_ratio_brute():
    from collections import Counter

    import numpy as np
    import ray.data

    from distributed_pagerank_ray.functions.dedup import _re2_word_split
    from distributed_pagerank_ray.functions.textstats import stopword_ratio

    texts = [
        "the cat and the dog and the bird",
        "a cat a dog a fish",
        "",
        "the the the unique",
        "zz yy xx",
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    cnt = Counter(w for t in texts for w in _re2_word_split(t))
    top = sorted(cnt, key=lambda w: (-cnt[w], w))[:3]

    ds = ray.data.from_items(rows).repartition(2)
    got = {r["doc_id"]: r for r in stopword_ratio(ds, k=3, num_shards=4).take_all()}
    for i, t in enumerate(texts):
        toks = _re2_word_split(t)
        ns = sum(1 for w in toks if w in top)
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["n_stop"] == ns
        want = round(ns * 1.0 / len(toks), 6) if toks else 0.0
        np.testing.assert_allclose(got[i]["stop_ratio"], want)
