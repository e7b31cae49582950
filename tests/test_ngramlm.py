"""Char-n-gram LM quality scoring (ops/ngramlm.py): hand-computed
scores on a tiny corpus, the shorter-than-n zero path, integer
exactness across partitionings, and the broadcast-probe plan shape."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.ngramlm import char_ngram_model, lm_score


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="ngramlm-test")


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "aaaaaa"),    # grams: aaaaa x2
         (2, "aaaaab"),    # grams: aaaaa, aaaab
         (3, "bbbbb"),     # gram:  bbbbb (below min_count)
         (4, "xy")],       # shorter than n: no grams at all
        "doc_id long, text string")


def test_model_counts_and_pruning(spark, corpus):
    model = char_ngram_model(corpus, sample_mod=1, min_count=2)
    rows = {r.gram: r.cnt for r in model.collect()}
    # aaaaa appears 3x (2 in doc1 + 1 in doc2); aaaab/bbbbb pruned at 1
    assert rows == {"aaaaa": 3}


def test_hand_computed_scores(spark, corpus):
    model = char_ngram_model(corpus, sample_mod=1, min_count=2)
    got = {r.doc_id: (r.n_grams, r.n_hits, r.coverage_e4, r.avg_bits_e3)
           for r in lm_score(corpus, model).collect()}
    # cnt=3 -> floor(log2 3)+1 = 2 bits per hit gram
    assert got[1] == (2, 2, 10000, 2000)   # both grams hit: 4 bits / 2
    assert got[2] == (2, 1, 5000, 1000)    # one of two grams hits
    assert got[3] == (1, 0, 0, 0)          # gram exists, no model hit
    assert got[4] == (0, 0, 0, 0)          # too short: all zeros


def test_every_doc_appears_once(spark, corpus):
    model = char_ngram_model(corpus, sample_mod=1, min_count=2)
    out = lm_score(corpus, model)
    assert out.count() == 4
    assert out.select("doc_id").distinct().count() == 4


def test_partitioning_invariance(spark, corpus):
    """Integer-exact contract: identical rows at any parallelism."""
    model = char_ngram_model(corpus, sample_mod=1, min_count=2)
    one = sorted(map(tuple, lm_score(corpus.repartition(1), model).collect()))
    many = sorted(map(tuple, lm_score(corpus.repartition(7), model).collect()))
    assert one == many


def test_scoring_probe_broadcasts(spark, corpus):
    """The 10^12-row corpus side must stay a map-only scan: the model
    join is an explicit broadcast hash join, never a shuffle or a
    cartesian."""
    model = char_ngram_model(corpus, sample_mod=1, min_count=2)
    plan = (lm_score(corpus, model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sample_mod_trains_on_subset(spark):
    """Only doc_id % sample_mod == 0 rows feed the model."""
    df = spark.createDataFrame(
        [(0, "ccccc"), (1, "ccccc"), (2, "ccccc"), (3, "ddddd"),
         (4, "ccccc"), (6, "ccccc"), (8, "ccccc")],
        "doc_id long, text string")
    model = char_ngram_model(df, sample_mod=2, min_count=2)
    rows = {r.gram: r.cnt for r in model.collect()}
    # sampled docs: 0,2,4,6,8 -> ccccc x5; ddddd (doc 3) never sampled
    assert rows == {"ccccc": 5}
