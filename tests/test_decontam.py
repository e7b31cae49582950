"""Benchmark n-gram decontamination gates (ops/decontam.py).

1. Planted contamination: docs embedding a benchmark passage are
   flagged, clean docs are not, and n_hits counts distinct matched
   shingles exactly.
2. decontaminate() removes exactly the flagged docs.
3. Normalization: case and whitespace-run differences between the doc
   and the benchmark never mask a hit.
4. Short texts (< n words) produce zero grams and never crash
   (Spark's sequence(1, 0) counts DOWN without the guard).
5. Plan shape: the benchmark probe is a BroadcastHashJoin — the
   document side must never shuffle its text.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops import decontam as DC  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="decontam-test")


BENCH = "the quick brown fox jumps over the lazy dog near the river bank"


@pytest.fixture(scope="module")
def tables(spark):
    docs = spark.createDataFrame(
        [
            (0, "clean document with entirely original words about spark "
                "plans and shuffle boundaries in distributed engines"),
            (1, f"prefix words then {BENCH} and a suffix tail"),
            (2, f"THE   Quick\tBrown FOX jumps over the LAZY dog near the "
                "river bank but cased and spaced differently"),
            (3, "too short"),
            (4, "another clean one where no benchmark eight gram appears "
                "at all in any window of the text"),
        ],
        "doc_id: long, text: string")
    bench = spark.createDataFrame([(BENCH,)], "text: string")
    return docs, bench


def test_planted_contamination(spark, tables):
    docs, bench = tables
    rows = {r["doc_id"]: r for r in
            DC.contamination(docs, bench, n=8).collect()}
    assert rows[1]["contaminated"] == 1
    assert rows[2]["contaminated"] == 1          # normalization-proof
    for clean in (0, 3, 4):
        assert rows[clean]["contaminated"] == 0
        assert rows[clean]["n_hits"] == 0
    # doc 1 contains the full 13-word passage => 6 matching 8-grams
    assert rows[1]["n_hits"] == 6
    # every doc is present in the output, even 0-gram ones
    assert set(rows) == {0, 1, 2, 3, 4}
    assert rows[3]["n_grams"] == 0


def test_decontaminate_filter(spark, tables):
    docs, bench = tables
    kept = {r["doc_id"] for r in
            DC.decontaminate(docs, bench, n=8).collect()}
    assert kept == {0, 3, 4}


def test_hit_counts_are_distinct_shingles(spark):
    # the same benchmark gram repeated in a doc counts once (distinct)
    docs = spark.createDataFrame(
        [(0, f"{BENCH} again {BENCH}")], "doc_id: long, text: string")
    bench = spark.createDataFrame([(BENCH,)], "text: string")
    row = DC.contamination(docs, bench, n=13).collect()[0]
    assert row["n_hits"] == 1


def test_broadcast_probe_plan(spark, tables):
    docs, bench = tables
    plan = (DC.contamination(docs, bench, n=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
