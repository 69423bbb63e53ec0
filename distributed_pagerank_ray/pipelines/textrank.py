"""TextRank keyword ranking — PageRank over the word co-occurrence graph.

The engine's two halves composed into one operator (Mihalcea & Tarau
2004, the standard unsupervised keyword extractor): tokenize the corpus
with the pinned RE2-\\s tokenizer, take window-2 (adjacent-word)
co-occurrences as UNDIRECTED edges, and run the SAME power-iteration
PageRank the link graph uses (uniform E, c=0.85, final normalization —
reference semantics pkg/graph/graph.go:82-97) over the minted word
graph. Word salience = stationary rank.

Scale shape: edge extraction is fully vectorized (one Arrow RE2
trim+split per batch, adjacency via ListArray offsets in numpy — no
Python loop over tokens), per-batch distinct via the vectorized pair
siphash, then ONE string-carrying BSP (`util.sum_i64_keys_with_payload`)
collapses to the global distinct pair set — the exchange carries
collapsed pairs, never the token stream. The graph side reuses
``build_graph`` (sorted dense minting, sharded vertices) and
``pagerank`` unchanged, so checkpoint/resume and the BSP combine apply
to the word graph for free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.dedup import hash_str_array
from ..util import sum_i64_keys_with_payload

# the pinned tokenizer classes (functions/dedup.py): RE2's \s — what
# '\s' matches in BOTH Arrow and DuckDB regex kernels
_TRIM_PAT = r"^[\t\n\f\r ]+|[\t\n\f\r ]+$"
_SPLIT_PAT = r"[\t\n\f\r ]+"


def word_cooc_edges(
    docs: "ray.data.Dataset", text_col: str = "text", num_shards: int = 16
) -> "ray.data.Dataset":
    """Distinct undirected window-2 word co-occurrence edges, emitted in
    BOTH directions as (src, dst) strings — feed straight to
    ``build_graph(mint=True)``. Self-pairs (repeated words) dropped;
    pairs never cross document boundaries."""

    empty = pa.table(
        {
            "h": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
        }
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        if text_col not in t.column_names or len(t) == 0:
            return empty
        text = pc.fill_null(t.column(text_col), "")
        trimmed = pc.replace_substring_regex(text, pattern=_TRIM_PAT, replacement="")
        parts = pc.split_pattern_regex(trimmed, pattern=_SPLIT_PAT).combine_chunks()
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        vals = parts.flatten().to_numpy(zero_copy_only=False)
        if len(vals) < 2:
            return empty
        a, b = vals[:-1], vals[1:]
        valid = np.ones(len(vals) - 1, dtype=bool)
        # pairs that would cross a document boundary
        cross = offsets[1:-1] - 1
        valid[cross[cross >= 0]] = False
        # blank docs tokenize to a single '' — drop any pair touching it
        valid &= (a != "") & (b != "") & (a != b)
        if not valid.any():
            return empty
        a, b = a[valid], b[valid]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        h = hash_str_array((lo + "\x01" + hi).astype(object)).view(np.int64)
        u, idx = np.unique(h, return_index=True)
        return pa.table(
            {
                "h": pa.array(u),
                "w": pa.array(np.ones(len(u), dtype=np.int64)),
                "a": pa.array(lo[idx], pa.string()),
                "b": pa.array(hi[idx], pa.string()),
            }
        )

    pre = docs.map_batches(pair_partials, batch_format="pyarrow")
    pairs = sum_i64_keys_with_payload(pre, "h", "w", ["a", "b"], num_shards=num_shards)

    def both_dirs(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names or len(t) == 0:
            return pa.table(
                {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t.column("b").combine_chunks(), t.column("a").combine_chunks()]
                ),
            }
        )

    return pairs.map_batches(both_dirs, batch_format="pyarrow")


def textrank(
    docs: "ray.data.Dataset",
    run_dir: str,
    text_col: str = "text",
    iters: int = 3,
    threshold: float = 0.0,
    num_partitions: int = 4,
) -> "ray.data.Dataset":
    """Corpus keyword ranks: (word, rank) over the minted word graph.
    ``iters`` with ``threshold=0.0`` gives the fixed-iteration form the
    SQL oracle unrolls; pass a threshold for converged ranks."""
    from ..config import PageRankConfig, RunConfig
    from ..pipelines.graphbuild import build_graph
    from ..pipelines.pagerank import pagerank
    from ..util import compact_for_join

    edges = word_cooc_edges(docs, text_col=text_col)
    g = build_graph(
        edges,
        run_dir,
        src_col="src",
        dst_col="dst",
        mint=True,
        run_cfg=RunConfig(num_partitions=num_partitions),
    )
    res = pagerank(g, PageRankConfig(threshold=threshold, max_iters=iters))
    joined = compact_for_join(res.ranks(), num_partitions).join(
        compact_for_join(g.vertex_map(), num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=("id",),
        right_on=("id",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if "key" not in t.column_names:
            return pa.table(
                {"word": pa.array([], pa.string()), "rank": pa.array([], pa.float64())}
            )
        return pa.table({"word": t.column("key"), "rank": t.column("rank")})

    return joined.map_batches(fin, batch_format="pyarrow")
