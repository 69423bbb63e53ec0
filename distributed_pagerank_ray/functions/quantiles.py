"""Exact grouped discrete quantiles for bounded-cardinality value
columns (the batch-engine shape for percentile reporting over codes,
counts, ratings, quantities, …).

Scale shape: each batch pre-aggregates to (group, value, n) counts
(the combiner), one small groupby merges them, and ONLY the merged
histogram — O(groups × distinct values), bounded by assumption — is
gathered for the final cumsum walk. The raw column never leaves the
cluster and nothing is sorted. For unbounded/continuous columns use a
mergeable sketch instead (see functions/sketches.py's HLL for the
merge pattern); this module is the exact path and documents its
cardinality assumption.

Quantile definition matches DuckDB's ``quantile_disc``: the element at
zero-based sorted index ``ceil(q·n) − 1`` (verified against DuckDB
1.x; see tests).

``approx_quantiles`` is the promised sketch: a two-pass fixed-bin
histogram (pass 1: min/max/count aggregate; pass 2: per-batch sparse
bin counts merged by a distributed sum — the mergeable-sketch shape,
never gathered raw). Rank error is bounded by the heaviest bin's mass;
with uniform-ish data and 4096 bins that is ≲0.1%.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..util import ensure_schema

_I64 = pa.int64()
_F64 = pa.float64()


def grouped_discrete_quantiles(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    q_names: tuple[str, ...] | None = None,
    interpolated: bool = False,
    int_bsp: bool = False,
) -> "ray.data.Dataset":
    """Per-group exact quantiles of ``value_col``.

    ``interpolated=False``: discrete — the element at zero-based index
    ``ceil(q·n) − 1`` (DuckDB ``quantile_disc``). ``interpolated=True``:
    linear interpolation at fractional rank ``q·(n−1)`` (DuckDB
    ``quantile_cont`` / numpy default) — still EXACT, derived from the
    same merged histogram (the two order statistics around the
    fractional rank are looked up in the cumsum).

    Output columns: (group_col, *q_names) with float64 quantile values;
    ``q_names`` defaults to ``q25/q50/q75``-style labels.

    ``int_bsp=True`` routes the histogram merge through the packed-key
    per-shard BSP (``util.count_i64_keys(weight_col=...)``, the
    heavy-hitters path) instead of a row-level Ray groupby — 5-10×
    cheaper when the per-batch partials stay large (many distinct
    values, e.g. price cents). Requires BOTH columns int64 with g and
    v in [0, 2^31); each partial validates and raises ValueError
    otherwise (fall back to the default path then). Results are
    bit-identical either way — the merge is an integer histogram sum.
    """
    q_names = q_names or tuple(f"q{int(round(q * 100))}" for q in qs)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t.column(group_col).to_numpy(zero_copy_only=False),
                "v": t.column(value_col).to_numpy(zero_copy_only=False),
            }
        )
        c = df.groupby(["g", "v"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "g": pa.array(c["g"]),
                "v": pa.array(c["v"].astype(np.float64)),
                "n": pa.array(c["n"].to_numpy(dtype=np.int64)),
            }
        )

    if int_bsp:
        from ..util import count_i64_keys

        LIM = np.int64(1) << 31

        def packed_partial(t: pa.Table) -> pa.Table:
            g = t.column(group_col).to_numpy(zero_copy_only=False)
            v = t.column(value_col).to_numpy(zero_copy_only=False)
            if not (
                np.issubdtype(g.dtype, np.integer) and np.issubdtype(v.dtype, np.integer)
            ):
                raise ValueError("int_bsp requires int64 group and value columns")
            g = g.astype(np.int64)
            v = v.astype(np.int64)
            if len(v) and (
                g.min() < 0 or v.min() < 0 or g.max() >= LIM or v.max() >= LIM
            ):
                raise ValueError(
                    "int_bsp requires g and v in [0, 2^31); use int_bsp=False"
                )
            df = pd.DataFrame({"k": (g << 31) | v})
            c = df.groupby("k", sort=False).size().reset_index(name="n")
            return pa.table(
                {
                    "k": pa.array(c["k"].to_numpy(dtype=np.int64)),
                    "n": pa.array(c["n"].to_numpy(dtype=np.int64)),
                }
            )

        packed = count_i64_keys(
            ds.map_batches(packed_partial, batch_format="pyarrow"),
            "k",
            count_col="n",
            weight_col="n",
        )

        def unpack(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "g": pa.array([], _I64),
                        "v": pa.array([], _F64),
                        "n": pa.array([], _I64),
                    }
                )
            k = t.column("k").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "g": pa.array(k >> 31),
                    "v": pa.array((k & (LIM - 1)).astype(np.float64)),
                    "n": t.column("n"),
                }
            )

        hist = packed.map_batches(unpack, batch_format="pyarrow")
    else:
        hist = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["g", "v"])
            .aggregate(Sum("n", alias_name="n"))
        )
    # the merged histogram is small by the cardinality assumption —
    # gathering it is the documented final step, not a driver loop
    h = hist.to_pandas().dropna(subset=["g"]).sort_values(["g", "v"], kind="stable")

    rows: dict[str, list] = {group_col: []}
    for name in q_names:
        rows[name] = []
    def _at(vals: np.ndarray, cum: np.ndarray, idx: int) -> float:
        return float(vals[np.searchsorted(cum, idx + 1)])

    for g, sub in h.groupby("g", sort=True):
        vals = sub["v"].to_numpy(dtype=np.float64)
        cnts = sub["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        rows[group_col].append(g)
        for q, name in zip(qs, q_names):
            if interpolated:
                pos = min(max(q, 0.0), 1.0) * (n - 1)  # clamp like the discrete path
                lo, hi = int(np.floor(pos)), int(np.ceil(pos))
                a, b = _at(vals, cum, lo), _at(vals, cum, hi)
                rows[name].append(a + (pos - lo) * (b - a))
            else:
                idx = int(np.ceil(q * n)) - 1 if q > 0 else 0
                idx = max(0, min(idx, n - 1))
                rows[name].append(_at(vals, cum, idx))

    out = pa.table(
        {
            group_col: pa.array(rows[group_col]),
            **{name: pa.array(rows[name], _F64) for name in q_names},
        }
    )
    return ray.data.from_arrow(out)


def approx_quantiles(
    ds: "ray.data.Dataset",
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    n_bins: int = 4096,
) -> list[float]:
    """Approximate quantiles of a CONTINUOUS column via a mergeable
    fixed-bin histogram. Two passes, both streaming:

    1. global (min, max, count) — one tiny aggregate;
    2. per-batch ``np.bincount`` over scaled values emitted as sparse
       (bin, n) rows, merged by a distributed sum — the merged
       histogram is ≤ ``n_bins`` rows regardless of input size.

    Returns the left edge of the bin containing each q-th rank
    (rank error ≤ that bin's mass; value error ≤ (max−min)/n_bins).
    """
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(
        Min(value_col, alias_name="lo"), Max(value_col, alias_name="hi"), Count(alias_name="n")
    )
    lo, hi, n = float(stats["lo"]), float(stats["hi"]), int(stats["n"])
    if n == 0:
        return [float("nan")] * len(qs)
    width = (hi - lo) / n_bins or 1.0
    nb = n_bins

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        # nulls arrive as NaN; pass 1's Min/Max/Count ignore them, so the
        # histogram must too (NaN→int64 is undefined and would land in bin 0)
        v = v[~np.isnan(v)]
        b = np.clip(((v - lo) / width).astype(np.int64), 0, nb - 1)
        cnt = np.bincount(b, minlength=0)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bin": pa.array(nz.astype(np.int64)), "n": pa.array(cnt[nz].astype(np.int64))})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bin")
    )
    cum = hist["n"].cumsum().to_numpy()
    bins = hist["bin"].to_numpy()
    out = []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        out.append(lo + float(bins[np.searchsorted(cum, rank)]) * width)
    return out
