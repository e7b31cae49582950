"""Heading-outline rows: doc order, levels, empty docs."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    return get_spark(master="local[2]", app="test-outline")


def _rows(spark, pages):
    from swiftsoup_spark.ops.outline import headings_outline
    df = spark.createDataFrame(pages, "url string, html string")
    return [(r.url, r.idx, r.level, r.text)
            for r in headings_outline(df).collect()]


def test_outline_order_and_levels(spark):
    html = ("<html><body><h2>A</h2><p>x</p><h1>B <b>bold</b></h1>"
            "<div><h3>C</h3></div><h6>D</h6></body></html>")
    assert _rows(spark, [("u", html)]) == [
        ("u", 0, 2, "A"), ("u", 1, 1, "B bold"),
        ("u", 2, 3, "C"), ("u", 3, 6, "D")]


def test_outline_empty_and_case(spark):
    rows = _rows(spark, [
        ("none", "<html><body><p>no headings</p></body></html>"),
        ("up", "<html><body><H2>Up</H2></body></html>")])
    # no rows for the heading-free page; uppercase tag normalizes
    assert rows == [("up", 0, 2, "Up")]


def test_flesch_negative_floor_matches_duckdb(spark):
    # dense no-vowel / no-punct extremes push the score negative; the
    # offset-floor must equal DuckDB's // semantics exactly
    import duckdb
    from swiftsoup_spark.ops.textstats import flesch_score
    rows = [(1, "simple words here. short and clear."),
            (2, "tzk " * 50 + "tzk"),            # no vowels, no sentences
            (3, "a! e? i. o."),
            (4, "Pneumonoultramicroscopicsilicovolcanoconiosis " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.flesch_e3)
           for r in flesch_score(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    import __spark_entry__ as E
    want = {r[0]: tuple(r[1:]) for r in
            con.execute(E.oracle_sql()["flesch"]).fetchall()}
    assert got == want
    assert got[4][3] < 0  # the long-word doc really is negative
