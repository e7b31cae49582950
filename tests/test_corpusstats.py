"""Corpus statistics (ops/corpusstats.py): histogram-exact quantiles
vs DuckDB quantile_cont on adversarial groups, tf-idf ranking."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.corpusstats import (  # noqa: E402
    int_quantiles, int_quantiles_sql, tfidf_topk)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="corpusstats-test")


def test_quantiles_match_duckdb_on_edge_groups(spark):
    # singleton group, two-value group, heavy-duplicate group, and a
    # group whose quantile positions land exactly on integers
    rows = ([("one", 7)]
            + [("two", 1), ("two", 9)]
            + [("dup", 5)] * 50 + [("dup", 6)] * 3
            + [("grid", v) for v in range(11)])
    df = spark.createDataFrame(rows, "g string, v int")
    got = {r.g: (r.q50, r.q90, r.q99)
           for r in int_quantiles(df, "g", "v").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {r[0]: r[1:]
            for r in con.execute(int_quantiles_sql("t", "g", "v")).fetchall()}
    assert got == want
    assert got["one"] == (7.0, 7.0, 7.0)
    assert got["grid"][0] == 5.0  # pos 0.5*(11-1) = exactly rank 5


def test_quantiles_interpolate(spark):
    df = spark.createDataFrame([("a", 0), ("a", 10)], "g string, v int")
    r = int_quantiles(df, "g", "v", qs=(0.5, 0.9)).collect()[0]
    assert (r.q50, r.q90) == (5.0, 9.0)


def test_tfidf_prefers_rare_terms(spark):
    rows = [(0, "common common rare0 rare0 rare0"),
            (1, "common rare1"),
            (2, "common other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.t1, r.t2, r.t3) for r in tfidf_topk(df).collect()}
    # 'common' appears in every doc -> lowest idf; doc-unique terms win
    assert got[0][0] == "rare0"
    assert got[1][0] == "rare1"
    assert got[2][0] == "other"
    # doc 1 has exactly 2 distinct terms -> t3 is NULL
    assert got[1][2] is None
