"""Train/eval decontamination: flag eval documents that share word
n-grams with any training document.

The standard LLM-corpus hygiene step (GPT-3 App. C-style n-gram
overlap): after a deterministic train/eval split, an eval document is
contaminated if any of its word n-grams also occurs in the training
split. A capability beyond the reference's scope
(lioia/distributed-pagerank implements only PageRank); composed
entirely from this repo's scale-safe primitives:

- shingle explode: ``dedup._shingle_rows`` (one vectorized siphash
  pass + Horner n-gram combine; one row per DISTINCT n-gram per doc,
  docs never span batches);
- split: the ``sampling`` module's multiplicative id hash — a pure
  per-batch filter on the exploded rows, no join against a split
  table;
- train-side distinct n-grams: ``util.count_i64_keys`` (per-shard BSP
  combine, no row-level groupby);
- overlap: ONE Acero hash join (eval rows ⋈ distinct train grams) —
  lossless, since a contaminated doc must share at least one gram —
  then a second count BSP for per-doc shared-gram counts.

Everything is hash-space (uint64 n-gram hashes); the SQL oracle
compares gram STRINGS, so the gate also guards the hash path against
collisions at test scale. ``max_df`` optionally drops ubiquitous
n-grams (web-scale stopword runs) before matching — documented
approximation, default off (exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..util import compact_for_join, count_i64_keys, ensure_schema
from .dedup import _drop_frequent_shingles, _shingle_rows
from .sampling import _MOD, _hash_ids

_I64 = pa.int64()


def cross_split_contamination(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    train_frac: float = 0.8,
    num_partitions: int = 8,
    num_shards: int = 16,
    max_df: int | None = None,
) -> "ray.data.Dataset":
    """(doc_id, n_shared) for every EVAL-split doc sharing >= 1 word
    n-gram with the TRAIN split; ``n_shared`` counts its distinct
    shared n-grams. Uncontaminated eval docs emit no row (inner-join
    semantics, mirrored by the oracle).

    Split: doc is TRAIN iff ``hash2(id) < int(train_frac * 100000007)``
    where ``hash2`` applies the sampling module's multiplicative hash
    TWICE — one round is purely linear for ids below the modulus (a
    dense 0..n id column would land entirely in train); the second
    round wraps the modulus and mixes (ids must be in [0, ~1.9e14]).
    """
    cut = int(train_frac * _MOD)
    rows = _shingle_rows(ds, id_col, text_col, n, "word").materialize()
    if max_df is not None:
        rows = _drop_frequent_shingles(rows, max_df)

    def side(train: bool):
        def f(t: pa.Table) -> pa.Table:
            if "doc" not in t.column_names or len(t) == 0:
                return pa.table({"sh": pa.array([], _I64), "doc": pa.array([], _I64)})
            m = _hash_ids(_hash_ids(t.column("doc").to_numpy(zero_copy_only=False))) < cut
            if not train:
                m = ~m
            return pa.table({"sh": t.column("sh"), "doc": t.column("doc")}).filter(pa.array(m))

        return rows.map_batches(f, batch_format="pyarrow")

    P = num_partitions
    # distinct train grams via the count BSP (its counts are free; only
    # the key set matters here)
    train_grams = count_i64_keys(side(True), "sh", num_shards=num_shards).map_batches(
        lambda t: pa.table({"sh2": t.column("sh")})
        if "sh" in t.column_names
        else pa.table({"sh2": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).map_batches(ensure_schema({"sh2": _I64}), batch_format="pyarrow")

    j = compact_for_join(side(False), P).join(
        compact_for_join(train_grams, P),
        join_type="inner", num_partitions=P, on=("sh",), right_on=("sh2",),
    )
    hits = j.map_batches(
        lambda t: pa.table({"doc": t.column("doc")})
        if "doc" in t.column_names
        else pa.table({"doc": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    return count_i64_keys(hits, "doc", num_shards=num_shards).map_batches(
        lambda t: pa.table({id_col: t.column("doc"), "n_shared": t.column("cnt")})
        if "doc" in t.column_names
        else pa.table({id_col: pa.array([], _I64), "n_shared": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
