"""Smoke the driver contract: entry() runs and queries()/oracle_sql()
agree on a fast subset at sf0.001 (the full gate is
tools/check_correctness.py, run per-round by the driver at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from tools.check_correctness import TABLES, canonical, compare, to_pandas

SF = "/root/testdata/sf0.001"

FAST_SQL_QUERIES = [
    "g_out_degree",
    "r_q1_pricing",
    "r_events_hourly",
    "t_token_counts",
    "t_exact_dedup",
    "e_knn",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_entry_runs():
    out = to_pandas(entrymod.entry())
    assert len(out) == 20
    assert list(out.columns) == ["vertex", "rank"]
    assert (out["rank"] > 0).all()


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 15


@pytest.mark.parametrize("name", FAST_SQL_QUERIES)
def test_query_matches_oracle(con, name):
    got = to_pandas(entrymod.queries()[name](SF))
    want = con.execute(entrymod.oracle_sql()[name]).df()
    problems = compare(name, got, want)
    assert not problems, problems
