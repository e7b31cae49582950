"""Sequence packing (ops/packing.py): layout math, boundary straddle,
shard determinism, DuckDB replay."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.packing import pack_chunks, pack_chunks_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="pack-test")


def test_layout_math(spark):
    # one shard (n_shards=1): pure cumulative layout
    rows = [(1, 0, 40), (1, 1, 40), (2, 0, 10), (2, 1, 50)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_tokens int")
    got = {(r.doc_id, r.chunk_idx): (r.start_tok, r.seq_first, r.seq_last)
           for r in pack_chunks(df, seq_len=64, n_shards=1).collect()}
    assert got == {
        (1, 0): (0, 0, 0),      # tokens 0-39
        (1, 1): (40, 0, 1),     # 40-79 straddles the 64 boundary
        (2, 0): (80, 1, 1),     # 80-89
        (2, 1): (90, 1, 2),     # 90-139 straddles 128
    }


def test_partitioning_determinism(spark):
    rows = [(d, c, 10 + (d * 7 + c) % 30)
            for d in range(40) for c in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_tokens int")
    one = sorted(map(tuple, pack_chunks(df.repartition(1), 64, 4).collect()))
    many = sorted(map(tuple, pack_chunks(df.repartition(7), 64, 4).collect()))
    assert one == many


def test_duckdb_replay(spark):
    rows = [(d, c, 10 + (d * 7 + c) % 30)
            for d in range(40) for c in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_tokens int")
    got = sorted(map(tuple, pack_chunks(df, 64, 4).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE ch(doc_id BIGINT, chunk_idx INTEGER, n_tokens INTEGER)")
    con.executemany("INSERT INTO ch VALUES (?,?,?)", rows)
    ora = sorted(con.execute(
        pack_chunks_sql("SELECT * FROM ch", 64, 4)).fetchall())
    assert got == ora
