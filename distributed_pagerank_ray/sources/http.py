"""HTTP response-header parsing — the crawl-stack stage between the
WARC container walk (sources/warc.py, which only splits status/body)
and content handling: media type + charset negotiation, framing
(Content-Length vs chunked), and header counting.

Reference parity anchor: the reference engine fetches edge lists over
plain HTTP without header inspection (pkg/graph/graph.go:16-49); header
semantics here are the new-engine crawl treatment mandated by the
survey (§2.5), pinned to the RFC 7230/9110 core:

- field names are case-insensitive tokens; OWS around the value is
  trimmed;
- obs-fold (CRLF followed by SP/HTAB) continues the PREVIOUS field
  value and must be unfolded to a single SP before splitting lines —
  the classic parser divergence (RFC 7230 §3.2.4);
- Content-Type parameters: media type is everything before the first
  ';' (lowercased); the charset parameter value may be a quoted-string
  or a bare token, compared case-insensitively;
- Transfer-Encoding containing the token "chunked" (any case) wins
  over Content-Length (which is reported as -1 = unframed-by-length).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_OBS_FOLD = re.compile(rb"\r\n[ \t]+")
_CHARSET = re.compile(rb"""charset=(?:"([^"]*)"|([^;\s"]*))""", re.I)


def parse_http_headers(b: bytes) -> tuple[int, str, str, int, int, int]:
    """(status, mime, charset, clen, chunked, n_headers) from one HTTP
    response message (headers terminated by CRLFCRLF; body ignored).
    A payload WITHOUT the blank-line terminator is treated as a
    head-only capture (every line is a header line) — the crawl-store
    convention for truncated header dumps; a truncated full response
    whose body contains non-header text therefore raises on the first
    colon-less body line rather than passing silently. Raises
    ValueError on a malformed status line or header framing — fail
    loudly, quarantine upstream (the PpmDecode contract)."""
    if b is None:
        raise ValueError("empty HTTP payload")
    end = b.find(b"\r\n\r\n")
    head = b if end < 0 else b[:end]
    head = _OBS_FOLD.sub(b" ", head)  # unfold continuations FIRST
    lines = head.split(b"\r\n")
    if not lines or not lines[0].startswith(b"HTTP/"):
        raise ValueError("missing HTTP status line")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(f"malformed status line {lines[0]!r}")
    status = int(parts[1])
    mime = ""
    charset = ""
    clen = -1
    chunked = 0
    n_headers = 0
    seen_ct = False
    seen_cl = False
    for line in lines[1:]:
        if not line:
            continue
        colon = line.find(b":")
        if colon <= 0:
            raise ValueError(f"malformed header line {line!r}")
        name = line[:colon].strip().lower()
        value = line[colon + 1 :].strip(b" \t")
        n_headers += 1
        if name == b"content-type" and not seen_ct:
            seen_ct = True
            mime = value.split(b";", 1)[0].strip(b" \t").lower().decode("latin-1")
            m = _CHARSET.search(value)
            if m:
                raw = m.group(1) if m.group(1) is not None else m.group(2)
                charset = raw.strip(b" \t").lower().decode("latin-1")
        elif name == b"content-length" and not seen_cl:
            seen_cl = True
            if value.isdigit():
                clen = int(value)
        elif name == b"transfer-encoding":
            toks = {t.strip().lower() for t in value.split(b",")}
            if b"chunked" in toks:
                chunked = 1
    if chunked:
        clen = -1  # chunked framing wins (RFC 7230 §3.3.3)
    return status, mime, charset, clen, chunked, n_headers


class HttpHeaderParse:
    """Actor-pool HTTP header extraction: regexes are module-compiled;
    per-record work is one find + one unfold + a line walk. Emits
    status, mime, charset, clen, chunked, n_headers."""

    def __init__(self, bin_col: str = "payload"):
        self.bin_col = bin_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("status", "mime", "charset", "clen", "chunked", "n_headers")}
        for buf in batch.column(self.bin_col):
            s, m, c, cl, ch, nh = parse_http_headers(buf.as_py())
            cols["status"].append(s)
            cols["mime"].append(m)
            cols["charset"].append(c)
            cols["clen"].append(cl)
            cols["chunked"].append(ch)
            cols["n_headers"].append(nh)
        out = batch.drop_columns([self.bin_col])
        out = out.append_column("status", pa.array(np.array(cols["status"], dtype=np.int64)))
        out = out.append_column("mime", pa.array(cols["mime"], pa.string()))
        out = out.append_column("charset", pa.array(cols["charset"], pa.string()))
        out = out.append_column("clen", pa.array(np.array(cols["clen"], dtype=np.int64)))
        out = out.append_column("chunked", pa.array(np.array(cols["chunked"], dtype=np.int64)))
        out = out.append_column(
            "n_headers", pa.array(np.array(cols["n_headers"], dtype=np.int64))
        )
        return out


def parse_http_headers_ds(
    ds: "object",
    bin_col: str = "payload",
    concurrency: int = 2,
    batch_size: int = 256,
) -> "object":
    """Actor-pool HTTP header parse — ExtractLinks' stage shape."""
    return ds.map_batches(
        HttpHeaderParse,
        fn_constructor_kwargs={"bin_col": bin_col},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


_HEX = frozenset(b"0123456789abcdefABCDEF")


def decode_chunked(b: bytes) -> tuple[bytes, int, int]:
    """REAL chunked transfer-coding decode (RFC 7230 §4.1): walk
    hex-size lines (chunk extensions after ';' ignored), reassemble
    the body, require the 0-size terminator, count trailer fields.
    Returns (body, n_chunks, n_trailers). Raises ValueError on
    malformed sizes/framing — fail loudly, quarantine upstream."""
    if b is None:
        raise ValueError("empty chunked payload")
    pos = 0
    out = bytearray()
    n_chunks = 0
    while True:
        eol = b.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("chunked: missing size line terminator")
        size_tok = b[pos:eol].split(b";", 1)[0].strip(b" \t")
        if not size_tok or any(c not in _HEX for c in size_tok):
            raise ValueError(f"chunked: bad size line {b[pos:eol]!r}")
        size = int(size_tok, 16)
        pos = eol + 2
        if size == 0:
            break
        chunk = b[pos : pos + size]
        if len(chunk) != size:
            raise ValueError("chunked: truncated chunk data")
        out += chunk
        pos += size
        if b[pos : pos + 2] != b"\r\n":
            raise ValueError("chunked: missing data terminator")
        pos += 2
        n_chunks += 1
    # trailer section: header lines until the blank line
    n_trailers = 0
    while True:
        eol = b.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("chunked: unterminated trailer section")
        line = b[pos:eol]
        pos = eol + 2
        if not line:
            break
        if b":" not in line:
            raise ValueError(f"chunked: malformed trailer {line!r}")
        n_trailers += 1
    return bytes(out), n_chunks, n_trailers


class ChunkedDecode:
    """Actor-pool chunked-body decode stage. Emits n_chunks, body_len,
    body_sum (Σ byte values — the reassembly-order witness: any
    misplaced chunk boundary shifts it) and n_trailers."""

    def __init__(self, bin_col: str = "payload"):
        self.bin_col = bin_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        nc, bl, bs, nt = [], [], [], []
        for buf in batch.column(self.bin_col):
            body, n_chunks, n_trailers = decode_chunked(buf.as_py())
            a = np.frombuffer(body, dtype=np.uint8).astype(np.int64)
            nc.append(n_chunks)
            bl.append(len(body))
            bs.append(int(a.sum()))
            nt.append(n_trailers)
        out = batch.drop_columns([self.bin_col])
        out = out.append_column("n_chunks", pa.array(np.array(nc, dtype=np.int64)))
        out = out.append_column("body_len", pa.array(np.array(bl, dtype=np.int64)))
        out = out.append_column("body_sum", pa.array(np.array(bs, dtype=np.int64)))
        out = out.append_column("n_trailers", pa.array(np.array(nt, dtype=np.int64)))
        return out


def decode_chunked_ds(
    ds: "object",
    bin_col: str = "payload",
    concurrency: int = 2,
    batch_size: int = 256,
) -> "object":
    """Actor-pool chunked decode — ExtractLinks' stage shape."""
    return ds.map_batches(
        ChunkedDecode,
        fn_constructor_kwargs={"bin_col": bin_col},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


class FetchChain:
    """Composed fetch pipeline stage: raw HTTP response bytes →
    header parse → chunked reassembly (when framed so) → gzip member
    inflate (when the magic matches) → real HTML link extraction
    (stages.extract.extract_page) — the whole crawler ingest path in
    one actor-pool stage. Emits status, mime, chunked, n_chunks,
    n_links per record. Anything malformed raises (every layer of the
    chain already fails loudly)."""

    def __init__(self, bin_col: str = "payload"):
        from ..stages.extract import extract_page

        self.bin_col = bin_col
        self._extract = extract_page

    def __call__(self, batch: pa.Table) -> pa.Table:
        st, mi, ch, nc, nl = [], [], [], [], []
        for buf in batch.column(self.bin_col):
            b = buf.as_py()
            status, mime, _charset, clen, chunked, _nh = parse_http_headers(b)
            end = b.find(b"\r\n\r\n")
            body = b"" if end < 0 else b[end + 4 :]
            n_chunks = 0
            if chunked:
                body, n_chunks, _nt = decode_chunked(body)
            elif clen >= 0:
                body = body[:clen]
            if body[:2] == b"\x1f\x8b":
                from ..functions.multimodal import decode_gzip_member

                body, _fname = decode_gzip_member(body)
            _, links = self._extract(body)
            st.append(status)
            mi.append(mime)
            ch.append(chunked)
            nc.append(n_chunks)
            nl.append(len(links))
        out = batch.drop_columns([self.bin_col])
        out = out.append_column("status", pa.array(np.array(st, dtype=np.int64)))
        out = out.append_column("mime", pa.array(mi, pa.string()))
        out = out.append_column("chunked", pa.array(np.array(ch, dtype=np.int64)))
        out = out.append_column("n_chunks", pa.array(np.array(nc, dtype=np.int64)))
        out = out.append_column("n_links", pa.array(np.array(nl, dtype=np.int64)))
        return out


def fetch_chain_ds(
    ds: "object",
    bin_col: str = "payload",
    concurrency: int = 2,
    batch_size: int = 128,
) -> "object":
    """Actor-pool composed fetch-ingest chain — ExtractLinks' shape."""
    return ds.map_batches(
        FetchChain,
        fn_constructor_kwargs={"bin_col": bin_col},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def sniff_encoding(b: bytes) -> tuple[str, int]:
    """(encoding, bom_len) for one raw document payload — the crawler
    charset-sniff step before text extraction: BOM detection first
    (UTF-32 checked BEFORE UTF-16: the LE UTF-32 BOM starts with the
    LE UTF-16 BOM — the classic misorder bug), then a strict UTF-8
    validity probe, else 'unknown-8bit' (undecodable legacy bytes;
    route to charset detection / the header's charset)."""
    if b is None:
        b = b""
    if b[:4] == b"\xff\xfe\x00\x00":
        return "utf-32le", 4
    if b[:4] == b"\x00\x00\xfe\xff":
        return "utf-32be", 4
    if b[:3] == b"\xef\xbb\xbf":
        return "utf-8-bom", 3
    if b[:2] == b"\xff\xfe":
        return "utf-16le", 2
    if b[:2] == b"\xfe\xff":
        return "utf-16be", 2
    try:
        b.decode("utf-8", "strict")
        return "utf-8", 0
    except UnicodeDecodeError:
        return "unknown-8bit", 0


class EncodingSniff:
    """Actor-pool encoding sniff: emits enc, bom_len, n_bytes (payload
    length EXCLUDING the BOM — what the decoder will actually see)."""

    def __init__(self, bin_col: str = "payload"):
        self.bin_col = bin_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        encs, boms, nb = [], [], []
        for buf in batch.column(self.bin_col):
            b = buf.as_py() or b""
            enc, bom = sniff_encoding(b)
            encs.append(enc)
            boms.append(bom)
            nb.append(len(b) - bom)
        out = batch.drop_columns([self.bin_col])
        out = out.append_column("enc", pa.array(encs, pa.string()))
        out = out.append_column("bom_len", pa.array(np.array(boms, dtype=np.int64)))
        out = out.append_column("n_bytes", pa.array(np.array(nb, dtype=np.int64)))
        return out
