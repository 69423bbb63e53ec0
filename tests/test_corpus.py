import numpy as np
import pyarrow.parquet as pq

from distributed_pagerank_ray.sources.corpus import generate_pages


def test_deterministic():
    p1, l1 = generate_pages(100, 5, seed=7)
    p2, l2 = generate_pages(100, 5, seed=7)
    assert p1.equals(p2) and l1.equals(l2)
    p3, _ = generate_pages(100, 5, seed=8)
    assert not p3.equals(p1)


def test_schema_and_invariants(tiny_corpus):
    pages = pq.read_table(f"{tiny_corpus}/pages.parquet")
    links = pq.read_table(f"{tiny_corpus}/links.parquet")
    assert pages.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert len(pages) == 64
    urls = set(pages.column("url").to_pylist())
    assert len(urls) == 64
    # all link endpoints are in-corpus, no self-links from the generator
    for s, d in zip(links.column("src_url").to_pylist(), links.column("dst_url").to_pylist()):
        assert s in urls and d in urls and s != d
    # heavy tail + chain: some page has several out-links
    srcs = links.column("src_url").to_pylist()
    counts = {u: srcs.count(u) for u in set(srcs)}
    assert max(counts.values()) >= 3
    # danglings exist at larger sizes; at 64 pages just assert text nonempty
    assert all(t for t in pages.column("text").to_pylist())


def test_langs():
    pages, _ = generate_pages(500, 5, seed=42)
    langs = pages.column("lang").to_pylist()
    frac_it = np.mean([l == "it" for l in langs])
    assert 0.03 < frac_it < 0.2
