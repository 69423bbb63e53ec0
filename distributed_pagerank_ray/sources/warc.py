"""WARC (Web ARChive) ingest — the standard wrapper format of web
crawls (Common-Crawl-style shards), parsed for real from bytes.

A source capability beyond the reference's plain edge-list scope
(lioia/distributed-pagerank, pkg/graph/graph.go reads text edge
lists): each WARC file is a concatenation of records —

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...          (header block)
    \\r\\n
    <Content-Length bytes of payload>
    \\r\\n\\r\\n                        (record separator)

and a ``response`` record's payload is itself an HTTP message whose
status line and body the parser must split. The ONE correctness rule
of WARC parsing is: advance by ``Content-Length``, never by scanning
for the next magic — payloads legitimately contain ``WARC/1.0``
bytes (the planted gate embeds exactly that adversarial marker).
Header names are case-insensitive; ``warcinfo``/``request``/other
record types are skipped, not errors.

Execution shape: one task per WARC file via
``ray.data.read_binary_files`` (shards are the parallel unit, as in
any crawl layout); the per-file record walk is sequential by format
design but each step is C-level ``bytes.find``/slicing. Malformed
input (bad magic, missing Content-Length, truncated payload) raises
ValueError — fail loudly, the PpmDecode contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_I64 = pa.int64()


def parse_warc_bytes(b: bytes) -> list[tuple[str, int, int]]:
    """(target_uri, http_status, body_bytes) per ``response`` record
    of one WARC file; other record types are skipped."""
    out: list[tuple[str, int, int]] = []
    pos = 0
    n = len(b)
    while pos < n:
        if b[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC record magic at byte {pos}")
        hdr_end = b.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        headers: dict[str, str] = {}
        for line in b[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                "utf-8", "replace"
            )
        if "content-length" not in headers:
            raise ValueError("WARC record without Content-Length")
        clen = int(headers["content-length"])
        payload = b[hdr_end + 4 : hdr_end + 4 + clen]
        if len(payload) != clen:
            raise ValueError("truncated WARC payload")
        if b[hdr_end + 4 + clen : hdr_end + 4 + clen + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        pos = hdr_end + 4 + clen + 4
        if headers.get("warc-type") != "response":
            continue
        uri = headers.get("warc-target-uri", "")
        # payload is an HTTP message: status line, headers, blank, body
        line_end = payload.find(b"\r\n")
        parts = payload[:line_end].split(b" ")
        if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
            raise ValueError("response payload is not an HTTP message")
        status = int(parts[1])
        body_at = payload.find(b"\r\n\r\n")
        if body_at < 0:
            raise ValueError("HTTP message without header terminator")
        out.append((uri, status, clen - (body_at + 4)))
    return out


class WarcParse:
    """Actor-pool stage: one input row per WARC file
    (``bytes`` column from ``read_binary_files``) → one output row per
    ``response`` record: (url, status, body_len)."""

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        statuses: list[int] = []
        blens: list[int] = []
        for buf in batch.column(self.bytes_col):
            for uri, status, blen in parse_warc_bytes(buf.as_py()):
                urls.append(uri)
                statuses.append(status)
                blens.append(blen)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "status": pa.array(np.array(statuses, dtype=np.int64)),
                "body_len": pa.array(np.array(blens, dtype=np.int64)),
            }
        )


def read_warc(
    paths: "str | list[str]", concurrency: "int | None" = None
) -> "ray.data.Dataset":
    """(url, status, body_len) over every response record under
    ``paths`` (a directory of .warc files or an explicit list).

    The parse is STATELESS, so the default is a plain task pool (no
    fixed actor pool to starve a small cluster — the repo's
    two-pools-one-DAG landmine); pass ``concurrency`` to pin an actor
    pool when composing with downstream stateful stages."""
    ds = ray.data.read_binary_files(paths, file_extensions=["warc"])
    if concurrency is None:
        parse = WarcParse()
        return ds.map_batches(parse, batch_size=4, batch_format="pyarrow")
    return ds.map_batches(
        WarcParse,
        concurrency=concurrency,
        batch_size=4,
        batch_format="pyarrow",
    )


def _record(rtype: str, extra: dict, payload: bytes) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {rtype}"]
    head += [f"{k}: {v}" for k, v in extra.items()]
    head.append(f"Content-Length: {len(payload)}")
    return ("\r\n".join(head) + "\r\n\r\n").encode("ascii") + payload + b"\r\n\r\n"


def build_warc(records: "list[tuple[str, int, bytes]]", info: str = "synthetic") -> bytes:
    """Test/gate encoder: one warcinfo record, then per (uri, status,
    body) a ``request`` record (parsers must skip it) and a
    ``response`` record wrapping an HTTP message."""

    rec = _record
    chunks = [rec("warcinfo", {}, f"software: {info}".encode("ascii"))]
    for uri, status, body in records:
        chunks.append(
            rec("request", {"WARC-Target-URI": uri}, f"GET {uri} HTTP/1.1".encode())
        )
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n\r\n".encode("ascii")
            + body
        )
        chunks.append(rec("response", {"WARC-Target-URI": uri}, http))
    return b"".join(chunks)


def build_warc_gz(records: "list[tuple[str, int, bytes]]", info: str = "synthetic") -> bytes:
    """The warc.gz layout (what Common Crawl actually ships): every
    WARC record is its OWN gzip member, members concatenated — readers
    can then seek to any record boundary and inflate independently."""
    from ..functions.multimodal import encode_gzip_member

    members = [_record("warcinfo", {}, f"software: {info}".encode("ascii"))]
    for uri, status, body in records:
        members.append(
            _record("request", {"WARC-Target-URI": uri}, f"GET {uri} HTTP/1.1".encode())
        )
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n\r\n".encode("ascii")
            + body
        )
        members.append(_record("response", {"WARC-Target-URI": uri}, http))
    return b"".join(encode_gzip_member(m) for m in members)


class WarcGzParse:
    """Actor-pool stage for .warc.gz files: split the multi-member
    gzip stream (per-record members, CRC-verified) and parse the
    reassembled records — (url, status, body_len) per response."""

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.multimodal import split_gzip_members

        urls: list[str] = []
        statuses: list[int] = []
        blens: list[int] = []
        for buf in batch.column(self.bytes_col):
            records = b"".join(split_gzip_members(buf.as_py()))
            for uri, status, blen in parse_warc_bytes(records):
                urls.append(uri)
                statuses.append(status)
                blens.append(blen)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "status": pa.array(np.array(statuses, dtype=np.int64)),
                "body_len": pa.array(np.array(blens, dtype=np.int64)),
            }
        )
