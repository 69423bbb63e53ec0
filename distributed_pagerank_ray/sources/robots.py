"""robots.txt parsing + crawl-permission evaluation (RFC 9309 core).

The reference consumes pre-fetched edge lists; a real Common-Crawl
pipeline must honor crawl politeness, and the robots decision is also a
standard FILTER over harvested URL frontiers. Implemented semantics
(the RFC 9309 core, documented subset):

- line-based records, ``#`` comments stripped, ``\\r\\n`` and bare
  ``\\n`` endings, field names case-insensitive, surrounding whitespace
  ignored;
- consecutive ``User-agent`` lines form one group header; a group's
  rules apply to every agent in the header;
- agent selection: groups whose token equals the product token
  (case-insensitive) win; if none, the ``*`` groups apply (exact-token
  match, not RFC prefix matching — documented simplification);
- ``Allow`` / ``Disallow`` values are path patterns: literal prefixes,
  ``*`` wildcards, and a ``$`` end anchor;
- decision: the LONGEST matching pattern (octet length) wins; on a
  length tie Allow wins; no matching rule (or empty Disallow) = allow.

Scale shape: robots blobs are parsed ONCE per host into an exploded
rules table (host, rpath, allow, plen) plus a zero-length allow sentinel
so every URL of a known host matches at least one row; URLs join rules
by host (the per-host fan-out is the handful of rules in the selected
group), matching is vectorized per DISTINCT pattern in the batch (one
Arrow ``starts_with`` / RE2 kernel per pattern, never per row), and the
per-URL winner is ONE ``min_i64_by_key`` BSP over the packed
(length, allow) priority. Unknown hosts (no robots row) default to
allow via a left-outer join.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_I64 = pa.int64()


def parse_robots_bytes(blob: "bytes | str") -> list[tuple[str, str, bool]]:
    """(agent_lower, path_pattern, allow) triples in file order. Pure,
    deterministic; invalid lines are skipped (RFC: ignore unknown)."""
    if isinstance(blob, bytes):
        text = blob.decode("utf-8", errors="replace")
    else:
        text = blob or ""
    out: list[tuple[str, str, bool]] = []
    agents: list[str] = []
    group_open = False  # True while consecutive UA lines accumulate
    for raw in text.replace("\r\n", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not group_open:
                agents = []
                group_open = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            group_open = False
            if not value:
                continue  # empty Disallow = allow everything = no rule
            for a in agents:
                out.append((a, value, field == "allow"))
        else:
            group_open = False
    return out


def rules_for_agent(
    rules: list[tuple[str, str, bool]], agent: str
) -> list[tuple[str, bool]]:
    """Select the applicable group's (path, allow) rules: exact
    case-insensitive agent token first, '*' fallback."""
    agent = agent.lower()
    specific = [(p, al) for a, p, al in rules if a == agent]
    if specific:
        return specific
    return [(p, al) for a, p, al in rules if a == "*"]


def _pattern_matcher(pattern: str):
    """(kind, payload) for one path pattern: ('prefix', str) for
    literal rules, ('regex', str) when it carries * or $."""
    if "*" not in pattern and not pattern.endswith("$"):
        return ("prefix", pattern)
    anchor = pattern.endswith("$")
    body = pattern[:-1] if anchor else pattern
    rx = "^" + ".*".join(re.escape(seg) for seg in body.split("*"))
    if anchor:
        rx += "$"
    return ("regex", rx)


def robots_rules(
    robots_ds: "ray.data.Dataset",
    agent: str,
    host_col: str = "host",
    content_col: str = "robots",
) -> "ray.data.Dataset":
    """Explode per-host robots blobs into the agent-selected rules
    table (host, path, allow, plen) + one zero-length allow sentinel
    per host (the RFC default-allow, and the join-coverage guarantee).
    The blob loop is per HOST (the small side), never per URL."""

    def explode(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "host": pa.array([], pa.string()),
                "rpath": pa.array([], pa.string()),
                "allow": pa.array([], _I64),
                "plen": pa.array([], _I64),
            }
        )
        if host_col not in t.column_names or len(t) == 0:
            return empty
        hosts, paths, allows, plens = [], [], [], []
        for host, blob in zip(
            t.column(host_col).to_pylist(), t.column(content_col).to_pylist()
        ):
            for path, allow in rules_for_agent(parse_robots_bytes(blob), agent):
                hosts.append(host)
                paths.append(path)
                allows.append(int(allow))
                plens.append(len(path))
            hosts.append(host)  # default-allow sentinel
            paths.append("")
            allows.append(1)
            plens.append(0)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "rpath": pa.array(paths, pa.string()),
                "allow": pa.array(allows, _I64),
                "plen": pa.array(plens, _I64),
            }
        )

    return robots_ds.map_batches(explode, batch_format="pyarrow")


def robots_filter(
    urls: "ray.data.Dataset",
    rules: "ray.data.Dataset",
    id_col: str = "url_id",
    path_col: str = "path",
    host_col: str = "host",
    num_partitions: int = 8,
    num_shards: int = 16,
) -> "ray.data.Dataset":
    """(id_col, allowed) per URL row: join URLs to the agent-selected
    rules by host, vectorized per-DISTINCT-pattern matching, longest
    match wins (Allow on ties) via one packed min-BSP. URLs whose host
    has no robots row default to allowed (left-outer join)."""
    from ..util import compact_for_join, min_i64_by_key

    j = compact_for_join(urls, num_partitions).join(
        compact_for_join(rules, num_partitions),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(host_col,),
        right_on=("host",),
    )

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], _I64), "v": pa.array([], _I64)})
        if id_col not in t.column_names or len(t) == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        paths = t.column(path_col)
        # side membership from VALUE validity (full/left outer joins
        # coalesce keys): a null plen row means "no robots for host"
        if "plen" in t.column_names:
            plen = t.column("plen").to_numpy(zero_copy_only=False)
            allow = t.column("allow").to_numpy(zero_copy_only=False)
            rule = t.column("rpath").to_pylist()
            missing = pa.compute.is_null(t.column("plen")).to_numpy(
                zero_copy_only=False
            )
        else:
            missing = np.ones(len(t), dtype=bool)
            plen = np.zeros(len(t))
            allow = np.ones(len(t))
            rule = [""] * len(t)
        vals = np.full(len(t), np.iinfo(np.int64).max, dtype=np.int64)
        vals[missing] = -1  # sentinel: allow, beats nothing, always kept
        live = ~missing
        if live.any():
            rule_arr = np.array(
                [r if m else "" for r, m in zip(rule, live)], dtype=object
            )
            for pat in np.unique(rule_arr[live]):
                sel = live & (rule_arr == pat)
                kind, payload = _pattern_matcher(str(pat))
                sub = paths.filter(pa.array(sel))
                if kind == "prefix":
                    m = pc.starts_with(sub, pattern=payload)
                else:
                    m = pc.match_substring_regex(sub, pattern=payload)
                m = m.to_numpy(zero_copy_only=False)
                idxs = np.flatnonzero(sel)
                pr = (
                    plen[idxs].astype(np.int64) * 2 + allow[idxs].astype(np.int64)
                )
                v = np.where(m, -pr, np.iinfo(np.int64).max)
                vals[idxs] = v
        keep = vals != np.iinfo(np.int64).max
        return pa.table({"k": pa.array(ids[keep]), "v": pa.array(vals[keep])})

    scored = j.map_batches(score, batch_format="pyarrow")
    best = min_i64_by_key(scored, "k", "v", num_shards=num_shards)

    def decide(t: pa.Table) -> pa.Table:
        if "k" not in t.column_names or len(t) == 0:
            return pa.table(
                {id_col: pa.array([], _I64), "allowed": pa.array([], pa.bool_())}
            )
        v = t.column("v").to_numpy(zero_copy_only=False)
        allowed = np.where(v == -1, True, ((-v) & 1) == 1)
        return pa.table({id_col: t.column("k"), "allowed": pa.array(allowed)})

    return best.map_batches(decide, batch_format="pyarrow")


def parse_crawl_delays(blob: "bytes | str") -> list[tuple[str, float]]:
    """(agent_lower, delay_seconds) per Crawl-delay directive, in file
    order — the de-facto politeness extension (not in RFC 9309 but
    honored by most crawlers). Same line/group hazards as
    ``parse_robots_bytes``; unparseable values are skipped."""
    if isinstance(blob, bytes):
        text = blob.decode("utf-8", errors="replace")
    else:
        text = blob or ""
    out: list[tuple[str, float]] = []
    agents: list[str] = []
    group_open = False
    for raw in text.replace("\r\n", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not group_open:
                agents = []
                group_open = True
            agents.append(value.lower())
        else:
            group_open = False
            if field == "crawl-delay":
                try:
                    d = float(value)
                except ValueError:
                    continue
                for a in agents:
                    out.append((a, d))
    return out


def crawl_delays(
    robots_ds: "ray.data.Dataset",
    agent: str,
    host_col: str = "host",
    content_col: str = "robots",
    default_ms: int = 0,
) -> "ray.data.Dataset":
    """(host, delay_ms) per host — the politeness schedule input: the
    FIRST Crawl-delay of the agent-specific group class (exact token),
    '*' class fallback, ``default_ms`` when absent. Milliseconds as
    int64 (round(seconds·1000)) so the table joins/aggregates
    exactly."""
    agent_l = agent.lower()

    def explode(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"host": pa.array([], pa.string()), "delay_ms": pa.array([], pa.int64())}
        )
        if host_col not in t.column_names or len(t) == 0:
            return empty
        hosts, delays = [], []
        for host, blob in zip(
            t.column(host_col).to_pylist(), t.column(content_col).to_pylist()
        ):
            ds_ = parse_crawl_delays(blob)
            chosen = [d for a, d in ds_ if a == agent_l] or [
                d for a, d in ds_ if a == "*"
            ]
            hosts.append(host)
            delays.append(int(round(chosen[0] * 1000)) if chosen else int(default_ms))
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "delay_ms": pa.array(delays, pa.int64()),
            }
        )

    return robots_ds.map_batches(explode, batch_format="pyarrow")


def parse_sitemap_directives(blob: "bytes | str") -> list[str]:
    """Sitemap: URLs in file order (RFC 9309 §2.3 other-records /
    sitemaps.org protocol): the field name is case-insensitive, the
    record is GROUP-INDEPENDENT (valid anywhere in the file, even
    inside a user-agent group — it does not close the group for rule
    parsing, but here we only collect), '#' comments are stripped, and
    the value must look absolute (scheme://) or it is skipped (the
    protocol requires full URLs)."""
    if isinstance(blob, bytes):
        text = blob.decode("utf-8", errors="replace")
    else:
        text = blob or ""
    out: list[str] = []
    for raw in text.replace("\r\n", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() != "sitemap":
            continue
        value = value.strip()
        if "://" in value:
            out.append(value)
    return out


def robots_sitemaps(
    robots: "ray.data.Dataset",
    host_col: str = "host",
    robots_col: str = "robots",
) -> "ray.data.Dataset":
    """(host, ord, sitemap_url) per Sitemap directive — the crawl
    frontier's sitemap-discovery feed (robots.txt is where sitemap
    URLs are published). Vectorized per batch: one pure-python parse
    per blob (blobs are small by protocol), flat Arrow output."""
    import numpy as np

    def parse(t: pa.Table) -> pa.Table:
        hosts, ords, urls = [], [], []
        if len(t) and host_col in t.column_names:
            for h, b in zip(
                t.column(host_col).to_pylist(), t.column(robots_col).to_pylist()
            ):
                for i, u in enumerate(parse_sitemap_directives(b)):
                    hosts.append(h)
                    ords.append(i)
                    urls.append(u)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "ord": pa.array(np.array(ords, dtype=np.int64)),
                "sitemap_url": pa.array(urls, pa.string()),
            }
        )

    return robots.map_batches(parse, batch_format="pyarrow")
