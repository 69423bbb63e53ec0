"""Sitemap XML parse conformance: entities, CDATA, index nesting."""

import ray.data

from distributed_pagerank_ray.sources.sitemap import (
    parse_sitemap,
    read_sitemap_entries,
)

XML = (
    '<?xml version="1.0"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    "<url>\n  <loc>\thttps://a.test/x?q=1&amp;r=2 </loc>\n"
    "  <lastmod>2024-03-05</lastmod>\n</url>\n"
    "<url><loc><![CDATA[https://a.test/raw&amp;kept]]></loc>"
    "<lastmod>2024-03-06T01:02:03Z</lastmod></url>\n"
    "<url><priority>0.2</priority></url>\n"  # no loc -> skipped
    "<url><loc>https://a.test/nolastmod</loc></url>\n"
    "</urlset>"
)

INDEX = (
    "<sitemapindex>"
    "<sitemap><loc>https://a.test/sitemap1.xml</loc>"
    "<lastmod>2024-01-02</lastmod></sitemap>"
    "</sitemapindex>"
)


def test_parse_urlset_hazards():
    got = parse_sitemap(XML)
    assert got == [
        ("https://a.test/x?q=1&r=2", 20240305, False),
        ("https://a.test/raw&amp;kept", 20240306, False),  # CDATA stays raw
        ("https://a.test/nolastmod", 0, False),
    ]


def test_parse_index():
    assert parse_sitemap(INDEX) == [("https://a.test/sitemap1.xml", 20240102, True)]


def test_read_entries_dataset():
    ds = ray.data.from_items(
        [{"doc_id": 1, "sitemap": XML}, {"doc_id": 2, "sitemap": INDEX}]
    ).repartition(2)
    rows = sorted(
        read_sitemap_entries(ds).take_all(), key=lambda r: (r["doc_id"], r["loc"])
    )
    assert len(rows) == 4
    assert rows[-1] == {
        "doc_id": 2,
        "loc": "https://a.test/sitemap1.xml",
        "lastmod_key": 20240102,
        "is_index": True,
    }
