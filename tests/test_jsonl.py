"""JSONL export: escaping battery, valid-JSON round trip, DuckDB
octet parity on adversarial strings."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    return get_spark(master="local[2]", app="test-jsonl")


ROWS = [
    (0, "plain words", "en", "web"),
    (1, 'has "quotes" inside', "en", "web"),
    (2, "back\\slash and \\\\ two", "de", "web"),
    (3, "tab\there newline\nthere bell\x07", "fr", "web"),
    (4, 'both \\" mixed \\\\" endings \\', "en", "web"),
    (5, "café 中文 multibyte", "zh", "web"),
]


def _export(spark):
    from pyspark.sql import functions as F
    from swiftsoup_spark.ops.jsonl import jsonl_export
    df = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string")
    return {r.doc_id: (r.shard_id, r.line, r.n_octets)
            for r in jsonl_export(df).collect()}


def test_lines_are_valid_json_and_faithful(spark):
    got = _export(spark)
    assert set(got) == {r[0] for r in ROWS}
    for doc_id, text, lang, _src in ROWS:
        shard, line, n_octets = got[doc_id]
        obj = json.loads(line)  # must parse
        assert obj["id"] == doc_id
        assert obj["lang"] == lang
        # C0 controls flatten to spaces; everything else round-trips
        expect = "".join(" " if ord(c) < 0x20 else c for c in text)
        assert obj["text"] == expect
        assert shard == doc_id % 16
        assert n_octets == len(line.encode("utf-8"))


def test_duckdb_octet_parity(spark):
    import duckdb
    from swiftsoup_spark.ops.jsonl import jsonl_oracle_sql
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR,"
                " lang VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?)", ROWS)
    want = {r[0]: tuple(r[1:])
            for r in con.execute(jsonl_oracle_sql()).fetchall()}
    assert _export(spark) == want
