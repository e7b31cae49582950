"""ops/hof.with_array: bound-lambda-variable semantics + the quadratic
closure regression (kept fast: correctness here, the measured 200k-row
linearity evidence lives in BASELINE.md)."""

import os
import sys
import time

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="hof-test")


def test_with_array_value_semantics(spark):
    from swiftsoup_spark.ops.hof import with_array
    df = spark.createDataFrame([("a b c d",)], ["text"])
    grams = with_array(
        F.split("text", " "),
        lambda w: F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.array_join(F.slice(w, i, 2), " ")))
    got = df.select(grams.alias("g")).collect()[0]["g"]
    assert got == ["a b", "b c", "c d"]


def test_with_array_non_array_result(spark):
    from swiftsoup_spark.ops.hof import with_array
    df = spark.createDataFrame([("x y z",)], ["text"])
    n = with_array(F.split("text", " "), lambda w: F.size(w))
    assert df.select(n.alias("n")).collect()[0]["n"] == 3


def test_binder_must_take_one_parameter(spark):
    # pyspark passes (element, index) to 2-arg lambdas: a binder
    # written with a default arg silently receives the INDEX (0) —
    # the bug the quality_topngram oracle caught. Pin the contract.
    from swiftsoup_spark.ops.hof import with_array
    df = spark.createDataFrame([("a b",)], ["text"])
    bad = with_array(F.split("text", " "),
                     lambda w, n=2: F.lit(n))   # n is the index here
    assert df.select(bad.alias("n")).collect()[0]["n"] == 0


def test_chunking_long_doc_is_not_quadratic(spark):
    # pre-fix: one 200k-word row took ~12 s on 2 cores (re-split per
    # window); post-fix ~4 s. Use a 50k-word row and a generous wall
    # bound — the closure version would need >30 s, the fixed one ~1 s.
    from swiftsoup_spark.ops.chunking import chunk_documents
    df = spark.createDataFrame(
        [(0, " ".join(["w"] * 50000))], ["doc_id", "text"])
    t0 = time.time()
    n = chunk_documents(df).count()
    assert n == 447
    assert time.time() - t0 < 30
