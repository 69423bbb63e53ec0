"""robots.txt parser + filter conformance: RFC 9309 core semantics."""

import numpy as np

import ray.data

from distributed_pagerank_ray.sources.robots import (
    parse_robots_bytes,
    robots_filter,
    robots_rules,
    rules_for_agent,
)

BLOB = (
    b"# comment line\r\n"
    b"User-Agent: Crawler\r\n"
    b"Disallow: /\r\n"
    b"\r\n"
    b"user-agent: bot\r\n"
    b"User-agent: spider\r\n"
    b"  Disallow: /priv\r\n"
    b"Allow: /priv/pub\r\n"
    b"Disallow: /*.bak$\r\n"
    b"Disallow:\r\n"          # empty value = no rule
    b"Crawl-delay: 10\r\n"    # unknown field skipped, closes UA run
    b"User-agent: *\r\n"
    b"Disallow: /all\r\n"
)


def test_parse_groups_and_hazards():
    rules = parse_robots_bytes(BLOB)
    # multi-agent header fans rules out to both agents
    assert ("bot", "/priv", False) in rules
    assert ("spider", "/priv", False) in rules
    assert ("bot", "/priv/pub", True) in rules
    assert ("crawler", "/", False) in rules
    assert ("*", "/all", False) in rules
    # empty Disallow contributes nothing
    assert not any(p == "" for _, p, _ in rules)


def test_agent_selection():
    rules = parse_robots_bytes(BLOB)
    assert rules_for_agent(rules, "BOT") == [
        ("/priv", False), ("/priv/pub", True), ("/*.bak$", False)
    ]
    # unknown agent falls back to the * group
    assert rules_for_agent(rules, "nobody") == [("/all", False)]


def test_filter_longest_match_and_anchors():
    cases = [
        (0, "/ok", True),            # sentinel allow
        (1, "/priv/x", False),       # prefix disallow
        (2, "/priv/pub/x", True),    # longer allow overrides
        (3, "/f.bak", False),        # wildcard + $ anchor
        (4, "/f.bak.x", True),       # anchor must not match
        (5, "/privy", False),        # prefix semantics (no boundary)
    ]
    urls = ray.data.from_items(
        [{"url_id": i, "host": "a.test", "path": p} for i, p, _ in cases]
        + [{"url_id": 99, "host": "norobots.test", "path": "/x"}]
    ).repartition(3)
    robots = ray.data.from_items([{"host": "a.test", "robots": BLOB.decode()}])
    rules = robots_rules(robots, agent="bot")
    got = {r["url_id"]: r["allowed"] for r in robots_filter(urls, rules, num_shards=4).take_all()}
    for i, _, want in cases:
        assert got[i] is want or got[i] == want, (i, got[i], want)
    assert got[99] == True  # unknown host defaults to allow


def test_crawl_delays():
    from distributed_pagerank_ray.sources.robots import crawl_delays, parse_crawl_delays

    blob = (
        "User-agent: crawler\nCrawl-delay: 99\n\n"
        "User-agent: bot\nUser-agent: spider\nDisallow: /x\nCrawl-Delay: 2.5\n\n"
        "User-agent: *\nCrawl-delay: oops\nCrawl-delay: 7\n"
    )
    got = parse_crawl_delays(blob)
    assert ("bot", 2.5) in got and ("spider", 2.5) in got and ("crawler", 99.0) in got
    assert ("*", 7.0) in got
    assert not any(isinstance(d, str) for _, d in got)

    ds = ray.data.from_items(
        [
            {"host": "a.test", "robots": blob},
            {"host": "b.test", "robots": "User-agent: *\nDisallow: /\n"},  # no delay
        ]
    )
    rows = {r["host"]: r["delay_ms"] for r in crawl_delays(ds, "bot", default_ms=123).take_all()}
    assert rows == {"a.test": 2500, "b.test": 123}


def test_sitemap_directives_hazards():
    from distributed_pagerank_ray.sources.robots import parse_sitemap_directives

    blob = (
        "# header comment\r\n"
        "SITEMAP: https://h.test/s1.xml  # trailing\r\n"
        "User-agent: *\r\n"
        "Disallow: /x\r\n"
        "sitemap: https://h.test/s2.xml\r\n"  # inside a group: still valid
        "Sitemap: /relative-skipped\r\n"
        "sitemap-index: https://h.test/decoy.xml\r\n"
        "Sitemap:https://h.test/s3.xml\r\n"  # no space after colon
    )
    assert parse_sitemap_directives(blob) == [
        "https://h.test/s1.xml",
        "https://h.test/s2.xml",
        "https://h.test/s3.xml",
    ]
    assert parse_sitemap_directives(b"") == []
    assert parse_sitemap_directives(None) == []
