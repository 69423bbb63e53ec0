"""Mimic the driver's correctness gate: run every queries() entry and its
oracle_sql() twin over the same sf dir, compare row-count + schema +
order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _encode_col(s: pd.Series) -> list[str]:
    """Byte-stable, dtype-sensitive string encoding of one column:
    ints/bools as i<int64>, floats as the exact float64 bit pattern
    (NaN canonicalized), datetimes as t<us-since-epoch>, everything
    else as s<utf-8 repr>. Two columns encode equal iff the driver's
    value hash would see them equal."""
    if pd.api.types.is_bool_dtype(s) or pd.api.types.is_integer_dtype(s):
        return [f"i{int(v)}" if pd.notna(v) else "null" for v in s]
    if pd.api.types.is_float_dtype(s):
        a = s.to_numpy(dtype="float64")
        return ["fnan" if np.isnan(v) else "f" + np.float64(v).tobytes().hex() for v in a]
    if pd.api.types.is_datetime64_any_dtype(s):
        a = s.astype("datetime64[us]")
        return ["null" if pd.isna(v) else f"t{v.value // 1000}" for v in a]
    # object: dates/datetimes from DuckDB DATE, ints/floats from pyarrow
    # list flattening, plain strings
    import datetime

    out = []
    for v in s:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            out.append("null")
        elif isinstance(v, bool) or isinstance(v, (int, np.integer)):
            out.append(f"i{int(v)}")
        elif isinstance(v, (float, np.floating)):
            out.append("f" + np.float64(v).tobytes().hex())
        elif isinstance(v, (pd.Timestamp, datetime.datetime)):
            out.append(f"t{int(pd.Timestamp(v).value // 1000)}")
        elif isinstance(v, datetime.date):
            out.append(f"t{int(pd.Timestamp(v).value // 1000)}")
        else:
            out.append("s" + str(v))
    return out


def canonical_hash(df: pd.DataFrame) -> str:
    """Exact-compare mode (VERDICT r4 #2): hash of row-sorted,
    column-name-sorted, dtype-canonicalized values with NO float
    tolerance — the driver's hash compare is exact, and the allclose
    path below is strictly looser (how the round-4 t_pack_seqs
    off-by-one token count escaped four rounds of local gating)."""
    import hashlib

    cols = sorted(df.columns)
    enc = [_encode_col(df[c]) for c in cols]
    rows = sorted("\x1f".join(vals) for vals in zip(*enc)) if len(df) else []
    h = hashlib.sha256()
    h.update(("\x1e".join(cols)).encode())
    for r in rows:
        h.update(b"\x1d")
        h.update(r.encode())
    return h.hexdigest()


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"schema mismatch: {sorted(got.columns)} vs {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"row count {len(got)} vs {len(want)}")
    g, w = canonical(got), canonical(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c].to_numpy(), w[c].to_numpy()
            if np.issubdtype(gv.dtype, np.floating):
                ok = np.allclose(gv.astype(float), wv.astype(float), atol=1e-9, equal_nan=True)
            else:
                ok = (gv == wv).all() if len(gv) else True
            if not ok:
                bad = np.nonzero(~(gv == wv))[0][:3] if gv.dtype == wv.dtype else []
                problems.append(f"values differ in col {c} (e.g. rows {list(bad)})")
    return problems


def main() -> int:
    sys.path.insert(0, "/root/repo")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows, cols={list(got.columns)} ({dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, got, want)
        # exact driver-style hash alongside the loose compare: a query
        # can allclose-pass yet hash-differ (the t_pack_seqs escape) —
        # surface that loudly even when `problems` is empty.
        try:
            hash_ok = canonical_hash(got) == canonical_hash(want)
        except Exception as e:  # noqa: BLE001
            hash_ok = False
            problems.append(f"canonical_hash raised {type(e).__name__}: {e}")
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        elif not hash_ok:
            print(f"HASHDIFF  {name}: allclose passes but exact driver-style hash differs ({dt:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(got)} rows exact-hash ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
