"""DSIR importance resampling (ops/dsir.py): feature hashing, bucket
LLR weights, integer acceptance-resampling semantics, broadcast plan,
partitioning invariance, and the DuckDB bit-exact replay."""

import os
import sys

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.dsir import (  # noqa: E402
    dsir_scores, dsir_select, dsir_sql, dsir_weights,
    hashed_gram_buckets)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="dsir-test")


def _corpus(n=400):
    """Target sample (doc_id%10==0) is encyclopedia-flavored; raw docs
    with doc_id%9==1 share that vocabulary, the rest are spammy."""
    rows = []
    for i in range(n):
        base = f"web page {i % 7} content filler junk{i % 13} stuff"
        if i % 10 == 0 or i % 9 == 1:
            t = f"clean encyclopedia prose reference article {base}"
        else:
            t = f"spam casino click here buy now {base}"
        rows.append((i, t))
    return rows


def test_gram_features(spark):
    df = spark.createDataFrame([(1, "a  b c"), (2, "x"), (3, "")],
                               "doc_id long, text string")
    g = hashed_gram_buckets(df, buckets=16)
    counts = {r.doc_id: r.n for r in
              g.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    # "a b c": 3 unigrams + 2 bigrams (empty split artifact dropped
    # BEFORE bigram formation); "x": 1 unigram; "": no grams
    assert counts == {1: 5, 2: 1}
    assert g.filter(~F.col("bucket").between(0, 15)).count() == 0


def test_weights_bounded_and_broadcastable(spark):
    df = spark.createDataFrame(_corpus(200), "doc_id long, text string")
    w = dsir_weights(df, target_mod=10, buckets=64)
    rows = w.collect()
    assert len(rows) <= 64
    # target-marker vocabulary must weigh positive somewhere
    assert any(r.weight > 0 for r in rows)


def test_resample_semantics(spark):
    """The max-score doc is ALWAYS kept (acceptance prob 2^0 = 1), and
    docs beyond band_bits below max are never kept."""
    df = spark.createDataFrame(_corpus(300), "doc_id long, text string")
    out = dsir_select(df, target_mod=10, buckets=256, band_bits=30)
    rows = out.collect()
    assert len(rows) == 300
    smax = max(r.score for r in rows)
    for r in rows:
        if r.score == smax:
            assert r.kept
        if smax - r.score > 30:
            assert not r.kept


def test_enrichment_and_plan(spark):
    """Kept raw docs must be enriched in target-like documents, and
    the scoring join must be a broadcast (text never shuffles) —
    plan-gated on the pre-checkpoint scoring pipeline."""
    df = spark.createDataFrame(_corpus(400), "doc_id long, text string")
    splan = (dsir_scores(df, target_mod=10, buckets=256)
             ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in splan
    assert "CartesianProduct" not in splan
    out = dsir_select(df, target_mod=10, buckets=256, band_bits=40)
    rows = [r for r in out.collect() if r.doc_id % 10 != 0]  # raw pool
    kept_like = sum(1 for r in rows if r.kept and r.doc_id % 9 == 1)
    kept_spam = sum(1 for r in rows if r.kept and r.doc_id % 9 != 1)
    assert kept_like > 0 and kept_spam == 0


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(_corpus(200), "doc_id long, text string")
    a = sorted(map(tuple, dsir_select(df.coalesce(1), buckets=64)
                   .collect()))
    b = sorted(map(tuple, dsir_select(df.repartition(13), buckets=64)
                   .collect()))
    assert a == b


def test_duckdb_replay_bit_exact(spark):
    rows = _corpus(350)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple,
                     dsir_select(df, target_mod=10, buckets=128,
                                 band_bits=40).collect()))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows,
                                           columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.sql(
        dsir_sql(target_mod=10, buckets=128, band_bits=40)).fetchall()))
    assert got == want


def test_sample_bounded_fit_replay(spark):
    """fit_sample_mod bounds the FIT pass (the 100 TB contract: scoring
    is the only full corpus pass). The sampled fit changes the model —
    and the DuckDB replay with the same mod stays bit-exact."""
    rows = _corpus(350)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = sorted(map(tuple, dsir_select(df, buckets=128).collect()))
    samp = sorted(map(tuple, dsir_select(df, buckets=128,
                                         fit_sample_mod=3).collect()))
    assert full != samp          # the sample genuinely changes the fit
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows,
                                           columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.sql(
        dsir_sql(buckets=128, fit_sample_mod=3)).fetchall()))
    assert samp == want


def test_scored_single_pass(spark):
    """scored is checkpointed, so the returned plan must NOT re-inline
    the gram explode / model fit: no hashpartitioning exchange above
    the checkpoint, and exactly one 1-row broadcast cross (smax)."""
    df = spark.createDataFrame(_corpus(100), "doc_id long, text string")
    out = dsir_select(df, buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
