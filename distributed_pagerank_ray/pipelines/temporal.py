"""Temporal join operators Ray Data lacks natively: as-of join and
range (interval) join, built as a composition the guide prescribes for
custom operators — hash-bucket both sides on the equality key, union,
one coarse ``groupby(bucket)`` shuffle, then a vectorized
``pd.merge_asof`` kernel per bucket group.

Partitioning assumption (documented per the custom-operator contract):
rows that can match share the same equality key, so co-locating by
``hash(key) % num_buckets`` is sufficient; each bucket group must fit a
worker's heap (buckets are O(rows / num_buckets) — raise
``num_buckets`` with data size; key skew lands whole keys in one
bucket, so a hot key needs the salting treatment documented in
pagerank.py's shard notes).

Why merge_asof: the per-bucket kernel is pandas' compiled
backward-search (sorted searchsorted per ``by=`` group) — no Python
row loop; the range-count variant derives interval counts from two
as-of lookups against a per-key cumulative counter, turning a range
join into two O(log n) probes per row.

Reference parity: the reference engine (lioia/distributed-pagerank)
has no temporal operators at all — this module is new-engine scope
(SURVEY.md §2.5 additions), oracle-checked against DuckDB window SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..util import ensure_schema

_I64 = pa.int64()
_TS = pa.timestamp("us")

# Knuth multiplicative hash — deterministic, spreads sequential ids
_HASH_MULT = np.uint64(2654435761)


def _bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    h = (keys.astype(np.uint64) * _HASH_MULT) & np.uint64(0xFFFFFFFF)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _tagged(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    id_col: str,
    side: int,
    num_buckets: int,
) -> "ray.data.Dataset":
    """Project to the union schema (bucket, key, t, id, side); t is
    int64 epoch-us so both sides align regardless of source column."""

    def prep(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).cast(_I64).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(keys, num_buckets)),
                "key": pa.array(keys),
                "t": t.column(ts_col).cast(_TS).cast(_I64),
                "id": t.column(id_col).cast(_I64),
                "side": pa.array(np.full(len(t), side, dtype=np.int64)),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def asof_join(
    probe: "ray.data.Dataset",
    ref: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    probe_id: str = "event_id",
    ref_id: str = "event_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Backward as-of join: for each probe row, the reference row with
    the same key and the LARGEST timestamp <= the probe's timestamp
    (inner — probes with no prior reference row are dropped).

    Tie-break is deterministic: among reference rows sharing the
    winning timestamp, the largest ``ref_id`` wins (merge_asof takes
    the last right row in sort order; the right side is sorted by
    (t, id)).

    Output: (probe_id, key, ref_id, ref_ts).
    """
    u = _tagged(probe, key_col, ts_col, probe_id, 1, num_buckets).union(
        _tagged(ref, key_col, ts_col, ref_id, 0, num_buckets)
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 1].sort_values("t", kind="stable")
        right = g[g["side"] == 0].sort_values(["t", "id"], kind="stable")
        if not len(left) or not len(right):
            return pd.DataFrame(
                {"probe_id": [], "key": [], "ref_id": [], "ref_ts": []}
            ).astype({"probe_id": np.int64, "key": np.int64, "ref_id": np.int64, "ref_ts": np.int64})
        # merge_asof keeps only the probe's t; carry the reference t as
        # a payload column (rt) so the match's timestamp survives
        m = pd.merge_asof(
            left[["t", "key", "id"]],
            right[["t", "key", "id"]].rename(columns={"id": "rid"}).assign(rt=lambda d: d["t"]),
            on="t",
            by="key",
            direction="backward",
            allow_exact_matches=True,
        ).dropna(subset=["rid"])
        return pd.DataFrame(
            {
                "probe_id": m["id"].to_numpy(dtype=np.int64),
                "key": m["key"].to_numpy(dtype=np.int64),
                "ref_id": m["rid"].to_numpy(dtype=np.int64),
                "ref_ts": m["rt"].to_numpy(dtype=np.int64),
            }
        )

    return (
        u.groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
        .map_batches(
            _restore_ts({"probe_id": _I64, "key": _I64, "ref_id": _I64, "ref_ts": _TS}, ["ref_ts"]),
            batch_format="pyarrow",
        )
    )


def range_count_join(
    probe: "ray.data.Dataset",
    ref: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    probe_id: str = "event_id",
    ref_id: str = "event_id",
    window_us: int = 3_600_000_000,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Range (interval) join, counted: for each probe row, the number
    of reference rows with the same key in (probe_ts - window,
    probe_ts]. All probe rows survive (count 0 when none).

    Implemented as two as-of probes against a per-key cumulative
    counter: n = |refs <= ts| - |refs <= ts - window| — a range join
    as two binary searches instead of an output-exploding inequality
    join.

    Output: (probe_id, key, n_in_window).
    """
    u = _tagged(probe, key_col, ts_col, probe_id, 1, num_buckets).union(
        _tagged(ref, key_col, ts_col, ref_id, 0, num_buckets)
    )
    w = int(window_us)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 1]
        right = g[g["side"] == 0].sort_values(["key", "t", "id"], kind="stable")
        if not len(left):
            return pd.DataFrame({"probe_id": [], "key": [], "n_in_window": []}).astype(
                {"probe_id": np.int64, "key": np.int64, "n_in_window": np.int64}
            )
        out = pd.DataFrame(
            {
                "probe_id": left["id"].to_numpy(dtype=np.int64),
                "key": left["key"].to_numpy(dtype=np.int64),
            }
        )
        if not len(right):
            out["n_in_window"] = np.zeros(len(out), dtype=np.int64)
            return out
        right = right.assign(cum=right.groupby("key").cumcount().to_numpy() + 1)
        rt = right[["t", "key", "cum"]].sort_values("t", kind="stable")

        def cum_at(ts: np.ndarray) -> np.ndarray:
            probe_df = pd.DataFrame(
                {"t": ts, "key": out["key"].to_numpy(), "_i": np.arange(len(out))}
            ).sort_values("t", kind="stable")
            m = pd.merge_asof(
                probe_df, rt, on="t", by="key", direction="backward", allow_exact_matches=True
            ).sort_values("_i")
            return m["cum"].fillna(0).to_numpy(dtype=np.int64)

        ts = left["t"].to_numpy(dtype=np.int64)
        out["n_in_window"] = cum_at(ts) - cum_at(ts - w)
        return out

    return (
        u.groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
        .map_batches(
            ensure_schema({"probe_id": _I64, "key": _I64, "n_in_window": _I64}),
            batch_format="pyarrow",
        )
    )


def _restore_ts(schema: dict[str, pa.DataType], ts_cols: list[str]):
    """ensure_schema variant that rebuilds timestamp columns from the
    int64 epoch-us the kernels carry (groupby blocks may arrive empty
    or missing columns — see util.ensure_schema notes)."""

    def fn(t: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in schema.items():
            if name in t.column_names:
                col = t.column(name)
                if name in ts_cols:
                    col = col.cast(_I64).cast(_TS)
                cols[name] = col.cast(typ) if col.type != typ else col
            else:
                cols[name] = pa.array([] if len(t) == 0 else [None] * len(t), typ)
        return pa.table(cols)

    return fn
