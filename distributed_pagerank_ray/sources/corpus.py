"""Deterministic Common-Crawl-style page corpus generator.

Produces the engine's primary input table (per BASELINE.json
``input_hint``): ``pages(url: string, warc_ts: timestamp[us],
html: binary, text: string, lang: string)`` plus a golden
``links(src_url, dst_url)`` table (the exact link lines embedded in the
HTML, duplicates preserved) used by extraction/graph-build tests.

Link model (FIXTURES.md §1): out-degree of page i is
``1 + min(Zipf(a=2.1), max_deg)`` (heavy-tailed → hub skew),
destinations seeded-uniform excluding self (mirrors the reference
generator's self-loop exclusion, reference: pkg/graph/graph.go:110-112),
plus a connectivity chain ``page(i-1) → page(i)`` (mirrors
graph.go:129-138). A seeded 2% of pages emit no links at all →
dangling sinks, exercising the reference's no-redistribution mass leak
(pkg/graph/pagerank.go:14-19). Duplicate destinations are kept in the
HTML (duplicate edges collapse to one in-link but count in line-count
out-degree, graph.go:77-78).

The ``text`` column is the golden extraction output: title, paragraph
texts and anchor texts in document order joined by "\\n" — the engine's
extractor must reproduce it byte-identically per url (``input_hint``
invariant).

Everything is a pure function of (n_pages, n_hosts, seed): no
wall-clock, no external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Two word pools so language-ID heuristics have signal. 90% of pages
# draw from EN, 10% from IT (FIXTURES.md §1; "it" chosen because the
# reference project's docs are Italian — no behavioral dependence).
_EN_WORDS = (
    "the quick brown fox jumps over a lazy dog and runs with great speed "
    "through green fields where many small birds sing of summer light "
    "this page describes how distributed systems move data between nodes "
    "while keeping every partition balanced under heavy load for users"
).split()
_IT_WORDS = (
    "il veloce cane marrone salta sopra un gatto pigro e corre con grande "
    "velocita attraverso i campi verdi dove molti piccoli uccelli cantano "
    "della luce di estate questa pagina descrive come i sistemi distribuiti "
    "muovono i dati tra i nodi mantenendo ogni partizione bilanciata"
).split()

_EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def page_url(i: int, n_hosts: int) -> str:
    return f"https://site{i % n_hosts}.example/p/{i}"


def _zipf_capped(rng: np.random.Generator, n: int, a: float, cap: int) -> np.ndarray:
    return np.minimum(rng.zipf(a, size=n), cap)


PAGE_CHUNK = 25_000  # fixed: per-chunk rng streams define the dataset


def _gen_pages_chunk(
    lo: int,
    n: int,
    n_hosts: int,
    seed: int,
    max_deg: int,
    dangling_frac: float,
    zipf_a: float,
) -> tuple[pa.Table, pa.Table]:
    """Pages [lo, min(lo+PAGE_CHUNK, n)) — rng seeded per (seed, lo) so
    the corpus is a pure function of its parameters regardless of
    generation order/parallelism."""
    hi = min(n, lo + PAGE_CHUNK)
    rng = np.random.default_rng((seed, lo))
    count = hi - lo
    langs = np.where(rng.random(count) < 0.9, "en", "it")
    dangling = rng.random(count) < dangling_frac
    out_deg = 1 + _zipf_capped(rng, count, zipf_a, max_deg - 1)
    n_paras = rng.integers(1, 4, size=count)

    html_list: list[bytes] = []
    text_list: list[str] = []
    src_idx: list[int] = []
    dst_idx: list[int] = []
    for j in range(count):
        i = lo + j
        pool = _EN_WORDS if langs[j] == "en" else _IT_WORDS
        title = f"Page {i} on site{i % n_hosts}"
        paras = []
        for _ in range(int(n_paras[j])):
            k = int(rng.integers(8, 25))
            paras.append(" ".join(rng.choice(pool, size=k)))

        # destinations: zipf-many uniform non-self draws + chain i -> i+1
        dsts: list[int] = []
        if not dangling[j]:
            for _ in range(int(out_deg[j])):
                d = int(rng.integers(0, n - 1))
                if d >= i:
                    d += 1  # uniform over [0, n) \ {i}
                dsts.append(d)
            if i + 1 < n:
                dsts.append(i + 1)  # connectivity chain page(i) -> page(i+1)

        anchors = [f"link to page {d} number {jj}" for jj, d in enumerate(dsts)]
        body_parts = [f"<p>{p}</p>" for p in paras] + [
            f'<a href="{page_url(d, n_hosts)}">{a}</a>' for d, a in zip(dsts, anchors)
        ]
        html = (
            f"<html><head><title>{title}</title></head><body>"
            + "".join(body_parts)
            + "</body></html>"
        )
        html_list.append(html.encode("utf-8"))
        text_list.append("\n".join([title] + paras + anchors))
        src_idx.extend([i] * len(dsts))
        dst_idx.extend(dsts)

    ts = _EPOCH_2024 + np.arange(lo, hi).astype("timedelta64[s]").astype("timedelta64[us]")
    pages = pa.table(
        {
            "url": pa.array([page_url(i, n_hosts) for i in range(lo, hi)], pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html_list, pa.binary()),
            "text": pa.array(text_list, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    links = pa.table(
        {
            "src_url": pa.array([page_url(i, n_hosts) for i in src_idx], pa.string()),
            "dst_url": pa.array([page_url(i, n_hosts) for i in dst_idx], pa.string()),
        }
    )
    return pages, links


def generate_pages(
    n_pages: int,
    n_hosts: int = 50,
    seed: int = 42,
    max_deg: int = 64,
    dangling_frac: float = 0.02,
    zipf_a: float = 2.1,
) -> tuple[pa.Table, pa.Table]:
    """Return ``(pages, links)`` Arrow tables.

    ``links`` holds one row per anchor *line* in document order
    (duplicates preserved) — the golden truth for the extractor and for
    line-count out-degrees.
    """
    pages_chunks = []
    links_chunks = []
    for lo in range(0, n_pages, PAGE_CHUNK):
        p, l = _gen_pages_chunk(lo, n_pages, n_hosts, seed, max_deg, dangling_frac, zipf_a)
        pages_chunks.append(p)
        links_chunks.append(l)
    return pa.concat_tables(pages_chunks), pa.concat_tables(links_chunks)


_SIZES = {  # FIXTURES.md §1
    "tiny": (64, 2),
    "small": (5_000, 50),
    "medium": (200_000, 500),
}


def corpus_dir(scale: str, root: str = "/tmp/dpr_corpus", seed: int = 42) -> str:
    """Write (once, cached) the corpus at a named scale; return its dir.

    Output: ``{root}/{scale}_s{seed}/pages.parquet`` + ``links.parquet``
    plus a ``_DONE`` marker for atomicity (a crashed write regenerates).
    Multi-file row-group layout so ray.data.read_parquet parallelizes.
    """
    n_pages, n_hosts = _SIZES[scale]
    out = os.path.join(root, f"{scale}_s{seed}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    tmp = out + ".tmp"
    pdir = os.path.join(tmp, "pages.parquet")  # directory of part files
    ldir = os.path.join(tmp, "links.parquet")
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(ldir, exist_ok=True)
    row_group = max(1024, min(n_pages, PAGE_CHUNK) // 8)

    def write_chunk(idx: int, lo: int) -> None:
        pages, links = _gen_pages_chunk(lo, n_pages, n_hosts, seed, 64, 0.02, 2.1)
        pq.write_table(pages, os.path.join(pdir, f"part-{idx:05d}.parquet"), row_group_size=row_group)
        pq.write_table(links, os.path.join(ldir, f"part-{idx:05d}.parquet"), row_group_size=row_group * 8)

    los = list(range(0, n_pages, PAGE_CHUNK))
    use_ray = False
    try:  # parallel when a Ray session is up (chunks are independent)
        import ray

        use_ray = ray.is_initialized() and len(los) > 1
    except ImportError:
        pass
    if use_ray:  # generation errors propagate — only Ray ABSENCE falls back
        f = ray.remote(write_chunk)
        ray.get([f.remote(i, lo) for i, lo in enumerate(los)])
    else:
        for i, lo in enumerate(los):
            write_chunk(i, lo)
    # a prior run may have died after moving children out of .tmp but
    # before _DONE: such a partial out dir would make os.replace fail
    # with ENOTEMPTY on non-empty dir targets — clear it first (the
    # regenerated .tmp is complete and deterministic)
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.replace(tmp, out)  # whole-dir atomic publish
    with open(done, "w") as fh:
        fh.write("ok")
    return out
