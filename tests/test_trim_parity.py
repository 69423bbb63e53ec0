"""Whitespace-trim parity between the Arrow engine and DuckDB oracles.

Round-4 driver failure (VERDICT r4 #1): `utf8_trim_whitespace` strips
Unicode whitespace while DuckDB `trim()` strips ASCII spaces only, so a
`\\n`-padded doc produced a phantom empty token in the oracle's
`regexp_split_to_array`. The engine now trims exactly RE2's \\s class
([\\t\\n\\f\\r ]) everywhere, and every pre-trimming oracle uses
regexp_replace(x, '^\\s+|\\s+$', '', 'g'). These tests pin the parity on
adversarial inputs the sf corpora don't contain.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from distributed_pagerank_ray.functions.dedup import _re2_word_split
from distributed_pagerank_ray.functions.textstats import token_count_batch

# every whitespace flavor that has bitten or could: RE2-\s members,
# the non-members Python/Unicode call whitespace (\v, NBSP, U+2028,
# ideographic space), and blanks/nulls
ADVERSARIAL = [
    "\nhello world",
    "hello world\n",
    "\thello\tworld\t",
    "\r\nwindows line\r\n",
    "\x0cform feed\x0c",
    "  plain  spaces  ",
    "\x0bvertical tab\x0b",  # \v is NOT RE2 \s: a token char on both sides
    "\xa0nbsp\xa0padded\xa0",  # NBSP is NOT RE2 \s
    " line sep ",
    "　ideographic　",
    "mixed\xa0inner and\nouter\t",
    "", " ", "\n", "\t\r\x0c", None,
    "one",
    "\n\n\nmany\n\n\nnewlines\n\n\n",
]

TRIM_SQL = "regexp_replace(COALESCE(t, ''), '^\\s+|\\s+$', '', 'g')"


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _oracle_tokens(con, text):
    row = con.execute(
        f"SELECT CASE WHEN length({TRIM_SQL}) = 0 THEN []::VARCHAR[] "
        f"ELSE regexp_split_to_array({TRIM_SQL}, '\\s+') END FROM (SELECT ? AS t)",
        [text],
    ).fetchone()
    return row[0]


def test_token_count_matches_duckdb(con):
    batch = pa.table({"text": pa.array(ADVERSARIAL, pa.string())})
    got = token_count_batch(batch).column("n_tokens").to_pylist()
    want = [len(_oracle_tokens(con, t)) for t in ADVERSARIAL]
    assert got == want, list(zip(ADVERSARIAL, got, want))


def test_word_split_matches_duckdb(con):
    for t in ADVERSARIAL:
        assert _re2_word_split(t) == _oracle_tokens(con, t), repr(t)


def test_normalize_matches_duckdb(con):
    from distributed_pagerank_ray.functions.textstats import normalize_batch

    batch = pa.table({"text": pa.array(ADVERSARIAL, pa.string())})
    got = normalize_batch(batch).column("text_norm").to_pylist()
    for t, g in zip(ADVERSARIAL, got):
        if t is None:
            continue  # engine keeps null text as null text_norm
        w = con.execute(
            "SELECT trim(regexp_replace(lower(t), '\\s+', ' ', 'g')) FROM (SELECT ? AS t)",
            [t],
        ).fetchone()[0]
        assert g == w, repr(t)
