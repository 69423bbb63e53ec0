"""URL normalization for web-crawl link tables.

The reference consumes pre-cleaned integer edge lists
(pkg/graph/graph.go:35-60); a real Common-Crawl pipeline must first
canonicalize URLs so that the SAME page never mints two vertex ids.
Normalization contract (applied only to absolute URLs with a scheme;
anything else passes through unchanged):

- scheme and host lowercased,
- default ports ``:80`` / ``:443`` stripped from the host,
- fragment (``#...``) dropped,
- path/query preserved byte-for-byte.

Fully vectorized: one RE2 ``extract_regex`` + Arrow string kernels per
batch — no Python loop over rows — and the exact same regexes run in
the DuckDB oracle (both engines compile RE2).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)(?P<rest>[^#]*)"
)


def host_array(arr) -> pa.Array:
    """Lowercased, default-port-stripped host per URL — the graph
    partition key — vectorized (one RE2 extract + Arrow kernels).
    Relative / schemeless values yield ``''`` so callers can filter."""
    u = pc.fill_null(arr, "")
    parts = pc.extract_regex(u, _URL_RE)
    matched = pc.is_valid(parts)
    host = pc.utf8_lower(
        pc.replace_substring_regex(
            pc.fill_null(pc.struct_field(parts, "host"), ""),
            pattern=r":(80|443)$",
            replacement="",
        )
    )
    return pc.if_else(matched, host, pa.scalar("", pa.string()))


def normalize_url_batch(
    batch: pa.Table, url_col: str = "url", out_col: str = "url_norm"
) -> pa.Table:
    """Appends ``out_col`` (canonical URL) and ``host`` (lowercased,
    port-stripped registrable host — the graph partition key)."""
    u = pc.fill_null(batch.column(url_col), "")
    parts = pc.extract_regex(u, _URL_RE)
    matched = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "scheme"), ""))
    host = pc.utf8_lower(
        pc.replace_substring_regex(
            pc.fill_null(pc.struct_field(parts, "host"), ""),
            pattern=r":(80|443)$",
            replacement="",
        )
    )
    rest = pc.fill_null(pc.struct_field(parts, "rest"), "")
    norm = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    out = batch.append_column(out_col, pc.if_else(matched, norm, u))
    return out.append_column("host", pc.if_else(matched, host, pa.scalar("", pa.string())))


_PCT_RE = re.compile(rb"%([0-9A-Fa-f]{2})")
# RFC 3986 §2.3 unreserved: safe to DECODE; everything else only gets
# its hex digits uppercased (§6.2.2.1) — decoding reserved chars would
# change the URL's meaning.
_UNRESERVED = frozenset(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def pct_normalize(url: "str | None") -> str:
    """RFC 3986 §6.2.2 percent-encoding normalization: decode escapes
    of UNRESERVED characters (%7E → ~, %41 → A), uppercase the hex
    digits of every other escape (%2f → %2F), leave malformed '%'
    sequences untouched (a crawler must not corrupt what it cannot
    prove equivalent)."""
    if not url:
        return ""
    b = url.encode("utf-8")

    def fix(m: "re.Match[bytes]") -> bytes:
        v = int(m.group(1), 16)
        if v in _UNRESERVED:
            return bytes([v])
        return b"%" + m.group(1).upper()

    return _PCT_RE.sub(fix, b).decode("utf-8", "replace")


def pct_normalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """(url → norm_url) percent-encoding normalization over a batch;
    the regex is module-compiled, per-row work is one sub() pass."""
    urls = batch.column(url_col).to_pylist()
    out = pa.array([pct_normalize(u) for u in urls], pa.string())
    return batch.append_column("norm_url", out)
