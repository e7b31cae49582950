"""NFC normalization kernel (ops/unicode_norm.py): composition cases,
fast-path pass-through, NULL handling, DuckDB replay."""

import os
import sys
import unicodedata

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.unicode_norm import (  # noqa: E402
    nfc_normalize, nfc_normalize_sql)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="nfc-test")


CASES = [
    (0, "cafe\u0301"),           # NFD e+combining acute -> U+00E9
    (1, "caf\u00e9"),            # already NFC
    (2, "\u212bngstr\u00f6m"),  # singleton U+212B -> U+00C5
    (3, "s\u0323\u0307"),       # dot-below+dot-above -> U+1E69
    (4, "plain ascii"),
    (5, None),
]


def test_nfc_cases(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in CASES], "doc_id long, text string")
    got = {r.doc_id: (r.text_nfc, r.changed)
           for r in nfc_normalize(df).collect()}
    for i, s in CASES:
        if s is None:
            assert got[i] == (None, None)
        else:
            want = unicodedata.normalize("NFC", s)
            assert got[i][0] == want
            assert got[i][1] is (s != want)
    assert got[0][0] == "caf\u00e9" and got[0][1] is True
    assert got[1][1] is False
    assert got[2][0].startswith("\u00c5")


def test_nfc_matches_duckdb(spark):
    rows = [(i, s) for i, s in CASES if s is not None]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, nfc_normalize(df).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(con.execute(nfc_normalize_sql("text")).fetchall())
    assert got == want
