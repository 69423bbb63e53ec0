"""Sitemap XML ingest (sitemaps.org protocol) — the crawl-frontier
seed source that pairs with robots.txt (RFC 9309 points crawlers at
sitemaps; a Common-Crawl-style pipeline harvests URL frontiers from
them). Implemented: ``<urlset>`` entry extraction (``<loc>`` required,
``<lastmod>`` optional W3C datetime) and ``<sitemapindex>`` nesting
detection, with the real-world hazards: XML entity escapes in URLs
(``&amp;`` et al. MUST be unescaped), ``<![CDATA[...]]>`` wrapped
locations (no unescaping inside), whitespace padding around values,
and both date-only and full datetime ``lastmod`` forms.

Scale shape: sitemap blobs are per HOST (the small side of a crawl);
parsing is a per-blob pure function inside a plain ``map_batches``
stage (the multimodal-decoder shape — regexes compiled once at module
import), emitting one row per entry. The entry stream then joins /
filters like any URL table.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

_ENTRY_RE = re.compile(r"<(url|sitemap)\b[^>]*>(.*?)</\1>", re.DOTALL)
_LOC_RE = re.compile(r"<loc\b[^>]*>(.*?)</loc>", re.DOTALL)
_LASTMOD_RE = re.compile(r"<lastmod\b[^>]*>(.*?)</lastmod>", re.DOTALL)
_CDATA_RE = re.compile(r"^<!\[CDATA\[(.*)\]\]>$", re.DOTALL)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]
_WS = "\t\n\f\r "


def _clean_value(v: str) -> str:
    """Trim, then CDATA-unwrap (verbatim) or entity-unescape."""
    v = v.strip(_WS)
    m = _CDATA_RE.match(v)
    if m:
        return m.group(1)
    for ent, ch in _ENTITIES:
        if ent in v:
            v = v.replace(ent, ch)
    return v


def _lastmod_key(v: str) -> int:
    """YYYYMMDD int from a W3C datetime (date-only or full form);
    0 when absent/unparseable (keeps the column int64, never null)."""
    v = v.strip(_WS)
    m = re.match(r"^(\d{4})-(\d{2})-(\d{2})", v)
    if not m:
        return 0
    return int(m.group(1)) * 10000 + int(m.group(2)) * 100 + int(m.group(3))


def parse_sitemap(xml: "str | bytes") -> list[tuple[str, int, bool]]:
    """(loc, lastmod_key, is_index) per entry, in document order.
    Entries without a <loc> are skipped (spec: loc is required)."""
    if isinstance(xml, bytes):
        xml = xml.decode("utf-8", errors="replace")
    out: list[tuple[str, int, bool]] = []
    for m in _ENTRY_RE.finditer(xml or ""):
        body = m.group(2)
        locm = _LOC_RE.search(body)
        if not locm:
            continue
        loc = _clean_value(locm.group(1))
        if not loc:
            continue
        lm = _LASTMOD_RE.search(body)
        key = _lastmod_key(lm.group(1)) if lm else 0
        out.append((loc, key, m.group(1) == "sitemap"))
    return out


def read_sitemap_entries(
    sitemaps: "ray.data.Dataset",
    id_col: str = "doc_id",
    content_col: str = "sitemap",
) -> "ray.data.Dataset":
    """One row per sitemap entry: (id_col, loc, lastmod_key, is_index).
    ``lastmod_key`` = YYYYMMDD int (0 = absent); ``is_index`` marks
    <sitemapindex> children (nested sitemap URLs to fetch next)."""

    def explode(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "loc": pa.array([], pa.string()),
                "lastmod_key": pa.array([], pa.int64()),
                "is_index": pa.array([], pa.bool_()),
            }
        )
        if content_col not in t.column_names or len(t) == 0:
            return empty
        ids, locs, keys, idx = [], [], [], []
        for i, blob in zip(
            t.column(id_col).to_pylist(), t.column(content_col).to_pylist()
        ):
            for loc, key, is_index in parse_sitemap(blob):
                ids.append(i)
                locs.append(loc)
                keys.append(key)
                idx.append(is_index)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "loc": pa.array(locs, pa.string()),
                "lastmod_key": pa.array(keys, pa.int64()),
                "is_index": pa.array(idx, pa.bool_()),
            }
        )

    return sitemaps.map_batches(explode, batch_format="pyarrow")
