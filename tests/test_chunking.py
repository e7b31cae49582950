"""Token-window chunking (ops/chunking.py): window math, overlap
continuity, remainder handling, and the DuckDB replay."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.chunking import (  # noqa: E402
    chunk_documents, chunk_documents_sql)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="chunk-test")


ROWS = [(0, " ".join(f"w{i}" for i in range(300))),
        (1, "short doc only"),
        (2, " ".join(f"x{i}" for i in range(128))),
        (3, " ".join(f"y{i}" for i in range(129)))]


def test_window_math_and_overlap(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = {(r.doc_id, r.chunk_idx): r for r in
           chunk_documents(df).collect()}
    # doc 0 (300 tokens, chunk 128 step 112): 3 windows
    assert {k for k in out if k[0] == 0} == {(0, 0), (0, 1), (0, 2)}
    w0, w1, w2 = (out[(0, i)].chunk_text.split(" ") for i in range(3))
    assert (w0[0], w0[-1], len(w0)) == ("w0", "w127", 128)
    assert (w1[0], w1[-1]) == ("w112", "w239")      # 16-token overlap
    assert w1[:16] == w0[-16:]
    assert (w2[0], w2[-1], len(w2)) == ("w224", "w299", 76)
    # short doc: exactly one window, untruncated
    assert out[(1, 0)].chunk_text == "short doc only"
    assert out[(1, 0)].n_tokens == 3
    # exact-chunk doc: one window; one-over doc: remainder window
    assert {k for k in out if k[0] == 2} == {(2, 0)}
    assert out[(3, 1)].n_tokens == 17


def test_duckdb_replay(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = sorted(map(tuple, chunk_documents(df).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", ROWS)
    cols_sorted = sorted(["doc_id", "chunk_idx", "chunk_text", "n_tokens"])
    ora = con.execute(chunk_documents_sql()).fetchall()
    # same column order as Spark output for tuple compare
    assert sorted(ora) == sorted(
        (r[0], r[1], r[2], r[3]) for r in got)


def test_bad_params():
    import pytest as pt
    with pt.raises(ValueError):
        chunk_documents(None, chunk=16, overlap=16)
