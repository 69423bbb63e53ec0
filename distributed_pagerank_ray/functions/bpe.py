"""Distributed BPE (byte-pair-encoding) merge training — the
tokenizer-training primitive of an LLM data pipeline, over the corpus
the engine already processes.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") trains on the WORD-FREQUENCY table, not the
raw corpus: one distributed tokenize+count pass collapses the corpus
to (word, count) rows, and every merge iteration then runs over that
vocab table — so the iterative phase's cost scales with VOCAB size,
not corpus size (the classic trainer's own trick, kept distributed
here).

Per-iteration shape (no driver materialization of the vocab):

1. pair partials: per vocab batch, adjacent symbol pairs are packed
   into int64 keys (``a·2³¹+b``, the repo's pair-BSP contract) and
   pre-aggregated with their word-count weights via ``np.unique`` —
   the exchange is O(distinct pairs × blocks).
2. ``util.count_i64_keys(weight_col=...)`` folds the partials (the
   weighted count BSP — no row-level groupby).
3. ``util.topk_rows`` k=1 (count desc, key asc — the deterministic
   tie-break; the key orders pairs by symbol id) hands the driver ONE
   scalar: the winning pair.
4. the merge is applied VECTORIZED over the vocab's flattened symbol
   values + list offsets (leftmost-greedy non-overlap, the classic
   apply semantics; overlap only matters for a==b runs, resolved by
   run-parity selection) — then the vocab re-materializes for the
   next round.

Symbol ids are self-assigning and deterministic: an initial character
symbol IS its Unicode codepoint; merge k mints id ``0x110000 + k``
(above the codepoint range). No coordination, no symbol table
shuffle; the driver keeps only the merge list (``num_merges`` rows)
and decodes ids to strings at the end.

Counting counts overlapping occurrences ("aaa" has two (a,a) pairs);
application merges leftmost-first non-overlapping — both exactly the
reference semantics of the original ``get_stats``/``merge_vocab``
implementation, asserted against a brute-force replica in
tests/test_round5_ops.py and in-query at gate scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from ..util import compact_for_join, count_i64_keys, ensure_schema, topk_rows
from .textstats import RE2_WS

_I64 = pa.int64()
_MERGE_BASE = 0x110000  # first id above the Unicode codepoint range
_SHIFT = np.int64(1) << 31


def word_count_vocab(
    docs: "ray.data.Dataset", text_col: str = "text", min_count: int = 1
) -> "ray.data.Dataset":
    """Distributed (word, n) vocabulary of ``docs``: the proven RE2-\\s
    tokenize (trim + split, textstats.py contract) with per-batch
    pre-aggregation, folded by ONE string groupby whose input is
    bounded by batch-vocab × batches (post-preagg), not tokens."""

    def partial(t: pa.Table) -> pa.Table:
        if text_col not in t.column_names or len(t) == 0:
            return pa.table({"word": pa.array([], pa.string()), "n": pa.array([], _I64)})
        trimmed = pc.utf8_trim(pc.fill_null(t.column(text_col), ""), characters=RE2_WS)
        splits = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(splits)
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return pa.table({"word": pa.array([], pa.string()), "n": pa.array([], _I64)})
        import pandas as pd

        c = pd.Series(flat.to_pandas()).value_counts()
        return pa.table(
            {
                "word": pa.array(c.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(c.to_numpy(dtype=np.int64)),
            }
        )

    vocab = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(ensure_schema({"word": pa.string(), "n": _I64}), batch_format="pyarrow")
    )
    if min_count > 1:
        vocab = vocab.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("n"), min_count))
            if "n" in t.column_names
            else t,
            batch_format="pyarrow",
        )
    return vocab


def _symbolize(t: pa.Table) -> pa.Table:
    """word string → list<int64> of Unicode codepoints (initial symbol
    ids ARE codepoints — deterministic, coordination-free)."""
    if "word" not in t.column_names or len(t) == 0:
        return pa.table(
            {"syms": pa.array([], pa.list_(_I64)), "n": pa.array([], _I64)}
        )
    words = t.column("word").to_pylist()
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
    flat = np.fromiter(
        (ord(ch) for w in words for ch in w), dtype=np.int64, count=int(lens.sum())
    )
    offsets = np.concatenate([[0], np.cumsum(lens)])
    syms = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat, _I64))
    return pa.table({"syms": syms, "n": t.column("n")})


def _pair_partials(t: pa.Table) -> pa.Table:
    if "syms" not in t.column_names or len(t) == 0:
        return pa.table({"key": pa.array([], _I64), "partial": pa.array([], _I64)})
    col = t.column("syms")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = np.asarray(col.values)
    offsets = np.asarray(col.offsets).astype(np.int64)
    w = t.column("n").to_numpy(zero_copy_only=False)
    if len(vals) < 2:
        return pa.table({"key": pa.array([], _I64), "partial": pa.array([], _I64)})
    m = np.ones(len(vals) - 1, dtype=bool)
    starts = np.zeros(len(vals) + 1, dtype=bool)
    starts[offsets] = True
    m &= ~starts[1 : len(vals)]  # pair may not straddle a row boundary
    idx = np.flatnonzero(m)
    if len(idx) == 0:
        return pa.table({"key": pa.array([], _I64), "partial": pa.array([], _I64)})
    keys = vals[idx] * _SHIFT + vals[idx + 1]
    row = np.searchsorted(offsets, idx, side="right") - 1
    uk, inv = np.unique(keys, return_inverse=True)
    cnt = np.zeros(len(uk), dtype=np.int64)
    np.add.at(cnt, inv, w[row])  # int64-exact (bincount weights are float)
    return pa.table({"key": pa.array(uk), "partial": pa.array(cnt)})


def _apply_merge(t: pa.Table, a: int, b: int, new_id: int) -> pa.Table:
    if "syms" not in t.column_names or len(t) == 0:
        return pa.table(
            {"syms": pa.array([], pa.list_(_I64)), "n": pa.array([], _I64)}
        )
    col = t.column("syms")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = np.asarray(col.values).copy()
    offsets = np.asarray(col.offsets).astype(np.int64)
    if len(vals) < 2:
        return pa.table({"syms": col, "n": t.column("n")})
    m = (vals[:-1] == a) & (vals[1:] == b)
    starts = np.zeros(len(vals) + 1, dtype=bool)
    starts[offsets] = True
    m &= ~starts[1 : len(vals)]
    idx = np.flatnonzero(m)
    if a == b and len(idx) > 1:
        # leftmost-greedy within same-symbol runs: keep even positions
        run_start = np.concatenate([[True], np.diff(idx) != 1])
        run_no = np.cumsum(run_start) - 1
        run_first = idx[run_start][run_no]  # each match's run-start position
        idx = idx[(idx - run_first) % 2 == 0]
    if len(idx) == 0:
        return pa.table({"syms": col, "n": t.column("n")})
    vals[idx] = new_id
    drop = np.zeros(len(vals), dtype=bool)
    drop[idx + 1] = True
    new_vals = vals[~drop]
    row = np.searchsorted(offsets, idx, side="right") - 1
    lens = np.diff(offsets)
    lens = lens - np.bincount(row, minlength=len(lens))
    new_offsets = np.concatenate([[0], np.cumsum(lens)])
    syms = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), pa.array(new_vals, _I64)
    )
    return pa.table({"syms": syms, "n": t.column("n")})


def bpe_train_from_vocab(
    vocab: "ray.data.Dataset", num_merges: int, num_shards: int = 8
) -> pa.Table:
    """Run ``num_merges`` BPE merge iterations over a (word, n) vocab
    Dataset. Returns the merge table (step, left, right, merged,
    count) with ids decoded to strings driver-side; stops early when
    no adjacent pair remains. The returned table is inherently
    driver-sized (num_merges rows)."""
    syms = vocab.map_batches(_symbolize, batch_format="pyarrow").materialize()
    merges: list[tuple[int, int, int, int]] = []  # (a, b, new_id, count)
    for step in range(num_merges):
        counts = count_i64_keys(
            syms.map_batches(_pair_partials, batch_format="pyarrow"),
            "key",
            num_shards=num_shards,
            count_col="cnt",
            weight_col="partial",
        )
        top = topk_rows(counts, [("cnt", True), ("key", False)], 1).take_all()
        if not top or top[0]["cnt"] < 1:
            break
        key, cnt = int(top[0]["key"]), int(top[0]["cnt"])
        a, b = key // int(_SHIFT), key % int(_SHIFT)
        new_id = _MERGE_BASE + step
        merges.append((a, b, new_id, cnt))
        syms = syms.map_batches(
            lambda t, a=a, b=b, nid=new_id: _apply_merge(t, a, b, nid),
            batch_format="pyarrow",
        ).materialize()

    # decode ids to strings (driver-side: merge list is tiny)
    def decode(i: int) -> str:
        if i < _MERGE_BASE:
            return chr(i)
        a, b, _, _ = merges[i - _MERGE_BASE]
        return decode(a) + decode(b)

    return pa.table(
        {
            "step": pa.array(np.arange(len(merges), dtype=np.int64)),
            "left": pa.array([decode(a) for a, _, _, _ in merges], pa.string()),
            "right": pa.array([decode(b) for _, b, _, _ in merges], pa.string()),
            "merged": pa.array([decode(n) for _, _, n, _ in merges], pa.string()),
            "count": pa.array([c for _, _, _, c in merges], _I64),
        }
    )


def bpe_train(
    docs: "ray.data.Dataset",
    num_merges: int = 20,
    text_col: str = "text",
    min_word_count: int = 1,
    num_shards: int = 8,
) -> pa.Table:
    """End-to-end: distributed word-count pass, then the merge loop.
    See module docstring for semantics and the scale shape."""
    vocab = word_count_vocab(docs, text_col=text_col, min_count=min_word_count)
    return bpe_train_from_vocab(vocab, num_merges, num_shards=num_shards)


def bpe_brute_force(word_counts: "dict[str, int]", num_merges: int) -> list[tuple]:
    """Pure-Python reference replica (classic get_stats/merge_vocab
    with the same id-order tie-break) — the oracle for tests and the
    in-query gate. Returns [(left, right, merged, count), ...]."""
    vocab = {w: [ord(c) for c in w] for w in word_counts}
    strings = {}

    def s(i):
        return strings[i] if i >= _MERGE_BASE else chr(i)

    out = []
    for step in range(num_merges):
        stats: dict[tuple[int, int], int] = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        nid = _MERGE_BASE + step
        strings[nid] = s(a) + s(b)
        for w, syms in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(nid)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = res
        out.append((s(a), s(b), strings[nid], cnt))
    return out
