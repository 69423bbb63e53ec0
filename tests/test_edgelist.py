import pytest

from distributed_pagerank_ray.sources.edgelist import parse_line, parse_lines, read_edgelist

FIXTURE = """# comment line
// also a comment

0 1
1 2
2,0
3 3
0 1
"""


def test_parse_line_compat():
    # reference: pkg/graph/graph.go:178-196
    assert parse_line("# x") is None
    assert parse_line("// x") is None
    assert parse_line("") is None
    assert parse_line("0 1") == (0, 1)
    assert parse_line("2,0") == (2, 0)
    assert parse_line("3 3") == (3, 3)  # self-loops accepted from files
    with pytest.raises(ValueError):
        parse_line("0\t1")  # tab-separated fails strconv.Atoi
    with pytest.raises(ValueError):
        parse_line("0  1")  # double space: only FIRST space replaced
    with pytest.raises(ValueError):
        parse_line("a b")
    with pytest.raises(ValueError):
        parse_line("0 1 2")


def test_parse_lines_duplicates_kept():
    t = parse_lines(FIXTURE.splitlines())
    assert t.column("src").to_pylist() == [0, 1, 2, 3, 0]
    assert t.column("dst").to_pylist() == [1, 2, 0, 3, 1]


def test_read_edgelist_http(monkeypatch):
    """URL branch (reference LoadGraphResource GET path) — fetched body
    parsed with the same strict rules; network stubbed."""
    import io
    import urllib.request

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(
        urllib.request, "urlopen", lambda url: FakeResp(FIXTURE.encode("utf-8"))
    )
    ds = read_edgelist("https://example.test/graph.txt")
    rows = sorted((r["src"], r["dst"]) for r in ds.take_all())
    assert rows == [(0, 1), (0, 1), (1, 2), (2, 0), (3, 3)]


def test_read_edgelist(tmp_path):
    p = tmp_path / "g.txt"
    p.write_text(FIXTURE)
    ds = read_edgelist(str(p))
    rows = sorted((r["src"], r["dst"]) for r in ds.take_all())
    assert rows == [(0, 1), (0, 1), (1, 2), (2, 0), (3, 3)]
