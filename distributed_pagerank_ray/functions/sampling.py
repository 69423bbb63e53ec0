"""Deterministic, reproducible sampling for training-data pipelines.

Random sampling (``ds.random_sample``) is covered in pytest, but a
100 TB corpus pipeline wants REPRODUCIBLE samples: same input → same
sample, across reruns, resumes and engines. Both operators here key
the decision on a multiplicative hash of an id column, so they are
pure per-row/per-group functions of the data — embarrassingly
parallel (fraction) or one partial-prune shuffle (per-group), and
expressible in SQL for the oracle gate.

Hash: ``(id * 48271) % 100000007`` (MINSTD multiplier, prime modulus)
computed in int64 — exact as long as ``id * 48271`` fits int64
(id < ~1.9e14; documented bound, asserted). For full-range 64-bit ids
swap in the splitmix64 finalizer and a NUMERIC oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..util import ensure_schema

_MULT = 48271
_MOD = 100_000_007
_MAX_SAFE_ID = (2**63 - 1) // _MULT


def _hash_ids(ids: np.ndarray) -> np.ndarray:
    # negative ids are rejected too: numpy's % is non-negative while
    # SQL's is sign-preserving, so the paired oracles would diverge
    if len(ids) and (int(ids.max()) > _MAX_SAFE_ID or int(ids.min()) < 0):
        raise ValueError(
            f"ids must be in [0, {_MAX_SAFE_ID}] for the exact hash; use a 64-bit mixer"
        )
    return (ids.astype(np.int64) * _MULT) % _MOD


def deterministic_fraction(
    ds: "ray.data.Dataset", id_col: str, fraction: float
) -> "ray.data.Dataset":
    """Keep rows whose id-hash falls under ``fraction`` — a pure
    per-batch filter: no shuffle, no state, same rows every run."""
    cut = int(fraction * _MOD)

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_hash_ids(ids) < cut))

    return ds.map_batches(f, batch_format="pyarrow")


def deterministic_split(
    ds: "ray.data.Dataset", id_col: str, fractions: dict[str, float]
) -> "ray.data.Dataset":
    """Deterministic train/val/test-style split: each row's id-hash
    picks its split by cumulative fraction thresholds. Appends a
    ``split`` column — a pure per-batch map (no shuffle, no state,
    reproducible across runs and engines). Fractions must sum to 1."""
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    names = list(fractions)
    cuts = np.cumsum([int(fractions[n] * _MOD) for n in names[:-1]])

    def f(t: pa.Table) -> pa.Table:
        h = _hash_ids(t.column(id_col).to_numpy(zero_copy_only=False))
        idx = np.searchsorted(cuts, h, side="right")
        return t.append_column("split", pa.array(np.array(names, dtype=object)[idx]))

    return ds.map_batches(f, batch_format="pyarrow")


def deterministic_sample_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    n: int,
    out_schema: dict[str, pa.DataType],
) -> "ray.data.Dataset":
    """Per-group deterministic sample: the ``n`` rows with the smallest
    (id-hash, id) per group. Same partial-prune combiner shape as
    top-k-per-group: each batch keeps at most ``n`` candidates per
    group locally, so the final shuffle moves O(n × groups × blocks)
    rows, never the input."""
    cols = list(out_schema)

    def local(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {c: pa.array([], out_schema[c]) for c in cols}
                | {"_h": pa.array([], pa.int64())}
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({c: t.column(c).to_numpy(zero_copy_only=False) for c in cols})
        df["_h"] = _hash_ids(ids)
        pruned = df.sort_values(["_h", id_col], kind="stable").groupby(group_col, sort=False).head(n)
        return pa.table(
            {c: pa.array(pruned[c], out_schema[c]) for c in cols}
            | {"_h": pa.array(pruned["_h"].to_numpy(dtype=np.int64))}
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["_h", id_col], kind="stable").head(n)[cols]

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
        .map_batches(ensure_schema(out_schema), batch_format="pyarrow")
    )


def pack_sequences(
    ds: "ray.data.Dataset",
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> "ray.data.Dataset":
    """Sequential token-budget packing: documents in ``id_col`` order
    are laid head-to-tail and each is assigned to the training sequence
    its FIRST token lands in — ``seq_id = prev_cumsum // budget``. The
    deterministic, SQL-exact (pure int) cousin of context-window
    packing for LLM training shards.

    The engine primitive underneath is a DISTRIBUTED PREFIX SCAN, the
    same two-pass shape as ``graphbuild.mint_dense_ids``: sort by id,
    (pass 1) per-block (first_id, block_sum) — one tiny row per block
    to the driver — prefix offsets computed there, (pass 2) per-block
    vectorized cumsum + offset. O(blocks) driver state, never O(rows).
    """
    sorted_ds = ds.sort(id_col).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"first": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
        return pa.table(
            {
                "first": t.column(id_col).slice(0, 1).cast(pa.int64()),
                "s": pa.array(
                    [int(t.column(tokens_col).to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        )

    meta = sorted_ds.map_batches(block_meta, batch_size=None, batch_format="pyarrow").take_all()
    meta.sort(key=lambda m: m["first"])
    offsets: dict = {}
    acc = 0
    for m in meta:
        offsets[m["first"]] = acc
        acc += m["s"]

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    tokens_col: pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                }
            )
        n = t.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
        prev = offsets[int(t.column(id_col)[0].as_py())] + np.cumsum(n) - n
        return pa.table(
            {
                id_col: t.column(id_col),
                tokens_col: pa.array(n),
                "seq_id": pa.array(prev // budget),
            }
        )

    return sorted_ds.map_batches(assign, batch_size=None, batch_format="pyarrow")


def _hash2_ids(ids: np.ndarray) -> np.ndarray:
    """Double-multiply MINSTD: ``((id*48271) % M * 48271) % M``. The
    single multiply never wraps for ids < 2072 (ordering == id order,
    a non-sample over small-id tables like sf0.01 documents); the
    second round mixes any id range. Intermediate < 1e8 * 48271 —
    always int64-exact."""
    return (_hash_ids(ids) * _MULT) % _MOD


def mixture_sample(
    docs: "ray.data.Dataset",
    weights_pct: dict[str, int],
    target_frac_pct: int = 20,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Target-mixture subsampling: pick a deterministic subset whose
    per-group composition follows integer percent weights — the
    "assemble a training mixture from a multi-language corpus" step.
    ``quota_g = min(avail_g, total*target_frac_pct//100 * w_g//100)``
    (PURE int arithmetic, SQL-exact); groups missing from
    ``weights_pct`` are excluded. Within a group the sample is the
    quota smallest (double-MINSTD hash, id) rows.

    Scale shape: one tiny per-group count pass (O(groups × blocks)
    driver rows), then the partial-prune per-group selection — each
    batch locally keeps at most quota_g candidates per group, so the
    one shuffle moves O(Σ quotas × blocks) rows, never the corpus."""
    counted = docs.map_batches(
        lambda t: (
            pa.table({group_col: pa.array([], pa.string()), "n": pa.array([], pa.int64())})
            if len(t) == 0 or group_col not in t.column_names
            else pa.table(
                {
                    group_col: pa.array(
                        pd.Series(t.column(group_col).to_numpy(zero_copy_only=False))
                        .value_counts()
                        .index.to_numpy(dtype=object)
                    ),
                    "n": pa.array(
                        pd.Series(t.column(group_col).to_numpy(zero_copy_only=False))
                        .value_counts()
                        .to_numpy(dtype=np.int64)
                    ),
                }
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
    avail = counted.groupby(group_col)["n"].sum().to_dict()
    total = int(sum(avail.values()))
    target = total * target_frac_pct // 100
    quotas = {
        g: min(int(avail.get(g, 0)), target * w // 100) for g, w in weights_pct.items()
    }
    max_q = max(quotas.values(), default=0)

    def local(t: pa.Table) -> pa.Table:
        if len(t) == 0 or id_col not in t.column_names:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "_h": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                group_col: t.column(group_col).to_numpy(zero_copy_only=False),
                id_col: t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        df["_h"] = _hash2_ids(df[id_col].to_numpy())
        df = df.sort_values(["_h", id_col], kind="stable")
        q = df[group_col].map(quotas).fillna(0).astype(np.int64).to_numpy()
        r = df.groupby(group_col, sort=False).cumcount().to_numpy()
        pruned = df[r < np.minimum(q, max_q)]
        return pa.table(
            {
                group_col: pa.array(pruned[group_col].to_numpy(dtype=object), pa.string()),
                id_col: pa.array(pruned[id_col].to_numpy(dtype=np.int64)),
                "_h": pa.array(pruned["_h"].to_numpy(dtype=np.int64)),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g[[group_col, id_col]]
        n = quotas.get(g[group_col].iloc[0], 0)
        return g.sort_values(["_h", id_col], kind="stable").head(n)[[group_col, id_col]]

    return (
        docs.map_batches(local, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
        .map_batches(
            ensure_schema({group_col: pa.string(), id_col: pa.int64()}),
            batch_format="pyarrow",
        )
    )


def chunk_spans(
    ds: "ray.data.Dataset",
    chunk_tokens: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> "ray.data.Dataset":
    """RAG/pretraining chunking: split each document's token run into
    overlapping windows of ``chunk_tokens`` tokens advancing by
    ``stride`` (stride < chunk ⇒ overlap), emitting one row per chunk
    ``(id, chunk_id, start_tok, n_chunk)``. The chunk count is the
    MINIMUM number of windows covering every token:
    ``n_chunks = 1 if n <= C else 1 + ceil((n - C)/S)`` — no trailing
    window that is wholly contained in its predecessor. Documents with
    zero tokens emit no rows (mirrors the tokenizer CTE's absence).

    Pure int arithmetic (SQL-exact) and a pure per-batch flat-map: no
    shuffle, no state — embarrassingly parallel at any corpus size.
    Fully vectorized: the per-chunk expansion is one np.repeat + one
    arange-minus-offsets, never a Python loop over docs."""
    C, S = int(chunk_tokens), int(stride)
    if C <= 0 or S <= 0 or S > C:
        raise ValueError("need 0 < stride <= chunk_tokens")

    def f(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "n_chunk": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0 or tokens_col not in t.column_names:
            return empty
        n = t.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n > 0
        n, ids = n[keep], ids[keep]
        if len(n) == 0:
            return empty
        # ceil((n-C)/S) with non-negative operands only (SQL // parity)
        reps = np.where(n <= C, 1, 1 + (np.maximum(n - C, 0) + S - 1) // S)
        doc_rep = np.repeat(ids, reps)
        n_rep = np.repeat(n, reps)
        first = np.concatenate([[0], np.cumsum(reps)[:-1]])
        j = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(first, reps)
        start = j * S
        return pa.table(
            {
                id_col: pa.array(doc_rep),
                "chunk_id": pa.array(j),
                "start_tok": pa.array(start),
                "n_chunk": pa.array(np.minimum(C, n_rep - start)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def weighted_priority_sample(
    ds: "ray.data.Dataset",
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "w",
) -> "ray.data.Dataset":
    """Weighted sampling WITHOUT replacement, k winners: the
    Efraimidis–Spirakis priority-sample shape with the uniform draw
    replaced by the repo's deterministic double-MINSTD id hash —
    priority ``p = hash2(id) / w`` (higher weight ⇒ smaller expected
    priority ⇒ more likely selected), winners = the k smallest
    ``(p, id)``. Reproducible across runs/engines: ``p`` is one IEEE
    double division of exact integers, so numpy and any SQL engine
    produce bit-identical doubles (no transcendental libm calls — the
    reason for hash/w instead of the textbook u^(1/w)).

    Scale shape: per-batch partial top-k prune (each batch keeps at
    most k candidates), then a tiny global sort+limit over
    O(k × blocks) rows — the corpus itself is never shuffled.
    Weights must be integers >= 1."""
    if k <= 0:
        raise ValueError("k must be positive")

    def local(t: pa.Table) -> pa.Table:
        if len(t) == 0 or weight_col not in t.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    weight_col: pa.array([], pa.int64()),
                    "_p": pa.array([], pa.float64()),
                }
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(w) and int(w.min()) < 1:
            raise ValueError("weights must be >= 1")
        p = _hash2_ids(ids).astype(np.float64) / w
        order = np.lexsort((ids, p))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                weight_col: pa.array(w[order]),
                "_p": pa.array(p[order]),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col),
                weight_col: t.column(weight_col),
                "prio": pa.array(
                    np.round(t.column("_p").to_numpy(zero_copy_only=False), 6)
                ),
            }
        )

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .sort(["_p", id_col])
        .limit(k)
        .map_batches(finish, batch_format="pyarrow")
    )


def budget_trim(
    ds: "ray.data.Dataset",
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    prio_col: str = "prio",
) -> "ray.data.Dataset":
    """Token-budget corpus selection: keep the highest-priority
    documents whose token payload WHOLLY fits a global token budget —
    the "pick the best N-token subset of a web corpus" step of
    training-data assembly. Documents are laid head-to-tail in
    (``prio_col`` DESC, ``id_col`` ASC) order and a document is kept
    iff its cumulative end ``prefix_sum(n_tokens) <= budget`` (pure
    int arithmetic, SQL-exact: a window SUM over the same ordering).

    Same engine primitive as :func:`pack_sequences`: a DISTRIBUTED
    PREFIX SCAN — sort, (pass 1) one (first_prio, first_id, block_sum)
    row per block to the driver, prefix offsets computed there,
    (pass 2) per-block vectorized cumsum + offset + filter. O(blocks)
    driver state, never O(rows); blocks wholly past the budget emit
    zero rows without scanning their payloads.
    """
    sorted_ds = ds.sort([prio_col, id_col], descending=[True, False]).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "fp": pa.array([], pa.int64()),
                    "fi": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "fp": t.column(prio_col).slice(0, 1).cast(pa.int64()),
                "fi": t.column(id_col).slice(0, 1).cast(pa.int64()),
                "s": pa.array(
                    [int(t.column(tokens_col).to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        )

    meta = sorted_ds.map_batches(block_meta, batch_size=None, batch_format="pyarrow").take_all()
    meta.sort(key=lambda m: (-m["fp"], m["fi"]))
    offsets: dict = {}
    acc = 0
    for m in meta:
        offsets[(m["fp"], m["fi"])] = acc
        acc += m["s"]

    def select(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                prio_col: pa.array([], pa.int64()),
                tokens_col: pa.array([], pa.int64()),
                "cum_tokens": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        key = (int(t.column(prio_col)[0].as_py()), int(t.column(id_col)[0].as_py()))
        n = t.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cum_end = offsets[key] + np.cumsum(n)
        keep = cum_end <= budget
        if not keep.any():
            return empty
        return pa.table(
            {
                id_col: t.column(id_col).filter(pa.array(keep)),
                prio_col: t.column(prio_col).filter(pa.array(keep)).cast(pa.int64()),
                tokens_col: pa.array(n[keep]),
                "cum_tokens": pa.array(cum_end[keep]),
            }
        )

    return sorted_ds.map_batches(select, batch_size=None, batch_format="pyarrow")
