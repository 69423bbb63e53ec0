import pyarrow.parquet as pq

import ray.data

from distributed_pagerank_ray.stages.extract import extract_links, extract_page, extract_text


def test_extract_page_pure():
    html = (
        b"<html><head><title>T &amp; U</title></head><body>"
        b"<p>hello world</p><p>second para</p>"
        b'<a href="https://x.example/a">go here</a>'
        b"</body></html>"
    )
    text, links = extract_page(html)
    assert text == "T & U\nhello world\nsecond para\ngo here"
    assert links == [("https://x.example/a", "go here")]


def test_text_byte_identical(tiny_corpus):
    """input_hint invariant: extracted text byte-identical per url vs golden."""
    pages = ray.data.read_parquet(f"{tiny_corpus}/pages.parquet")
    out = extract_text(pages.select_columns(["url", "html"]), concurrency=2).take_all()
    golden = {
        r["url"]: r["text"]
        for r in pq.read_table(f"{tiny_corpus}/pages.parquet", columns=["url", "text"]).to_pylist()
    }
    assert len(out) == len(golden)
    for row in out:
        assert row["text"].encode() == golden[row["url"]].encode(), row["url"]


def test_links_exact(tiny_corpus):
    pages = ray.data.read_parquet(f"{tiny_corpus}/pages.parquet", columns=["url", "html"])
    got = extract_links(pages, concurrency=2).take_all()
    got_pairs = sorted((r["src_url"], r["dst_url"]) for r in got)
    golden = pq.read_table(f"{tiny_corpus}/links.parquet").to_pylist()
    want_pairs = sorted((r["src_url"], r["dst_url"]) for r in golden)
    assert got_pairs == want_pairs  # duplicates preserved, multiset equality


def test_anchor_stats_brute_force():
    """anchor_stats == per-key brute force over a multi-block stream
    with collision-heavy keys and empty-anchor rows."""
    from collections import defaultdict

    from distributed_pagerank_ray.stages.extract import anchor_stats

    rows = []
    for i in range(3000):
        dst = (i * i + 3 * i) % 37  # skewed: some keys far hotter
        anchor = ("w" * (i % 11)) if i % 7 else ""  # empty anchors count 0 chars
        rows.append({"dst_id": dst, "anchor": anchor})
    want_n: dict = defaultdict(int)
    want_ch: dict = defaultdict(int)
    for r in rows:
        want_n[r["dst_id"]] += 1
        want_ch[r["dst_id"]] += len(r["anchor"])

    ds = ray.data.from_items(rows).repartition(7)
    got = anchor_stats(ds, num_shards=4).take_all()
    assert len(got) == len(want_n)
    for g in got:
        assert g["n_inlinks"] == want_n[g["dst_id"]]
        assert g["anchor_chars"] == want_ch[g["dst_id"]]


def test_alternate_links_attribute_hazards():
    import pyarrow as pa

    from distributed_pagerank_ray.stages.extract import AlternateLinks

    html = (
        b"<html><head>"
        b'<link rel="stylesheet" href="s.css">'
        b"<LINK HREFLANG='DE-de' REL='alternate' HREF='http://h/de'>"
        b'<link rel="alternate" href="http://h/x">'  # no hreflang: skipped
        b'<link hreflang="fr" rel="alternate" href="http://h/fr"/>'  # self-closing
        b"</head></html>"
    )
    t = pa.table(
        {"doc_id": pa.array([7], pa.int64()), "html": pa.array([html], pa.binary())}
    )
    out = AlternateLinks()(t).to_pydict()
    assert out == {
        "doc_id": [7, 7],
        "ord": [0, 1],
        "hreflang": ["de-de", "fr"],
        "href": ["http://h/de", "http://h/fr"],
    }
    empty = AlternateLinks()(
        pa.table({"doc_id": pa.array([1], pa.int64()), "html": pa.array([b"<p>x</p>"], pa.binary())})
    )
    assert len(empty) == 0
