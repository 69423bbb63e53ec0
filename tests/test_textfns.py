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
