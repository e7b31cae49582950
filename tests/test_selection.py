"""Training-set assembly ops: deterministic shard shuffle + token-budget
selection — semantics, reshard-proofness, and the no-global-sort plan
property."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="selection-test")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_shuffle_is_permutation_and_reshard_proof(spark):
    from swiftsoup_spark.ops.selection import shuffle_shards
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {(r["doc_id"], r["shard"], r["pos"])
         for r in shuffle_shards(df, n_shards=8).collect()}
    # per-shard positions are dense 0..n-1
    by_shard = {}
    for _, s, p in a:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # identical layout after an arbitrary repartition
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in shuffle_shards(df.repartition(13), n_shards=8).collect()}
    assert a == b
    # and it is not the identity order (actually shuffled)
    in_shard0 = sorted((p, d) for d, s, p in a if s == 0)
    assert [d for _, d in in_shard0] != sorted(d for _, d in in_shard0)


def test_shuffle_has_no_global_sort(spark):
    from swiftsoup_spark.ops.selection import shuffle_shards
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = _plan(shuffle_shards(df))
    # window partitioned by shard -> hashpartitioning exchange, never a
    # rangepartitioning (global sort) exchange
    assert "rangepartitioning" not in plan.lower()


def test_budget_greedy_prefix(spark):
    from swiftsoup_spark.ops.selection import select_token_budget
    # scores: 3 classes; budget 400 permille of 100 tokens = 40
    rows = [(i, 9, 10) for i in range(3)]          # class 9: 30 toks
    rows += [(10 + i, 5, 10) for i in range(3)]    # class 5: 30 toks
    rows += [(20 + i, 1, 10) for i in range(4)]    # class 1: 40 toks
    df = spark.createDataFrame(rows, ["doc_id", "score", "n_tokens"])
    got = {r["doc_id"]: r["keep"]
           for r in select_token_budget(df, budget_permille=400).collect()}
    # full class 9 (30) + first doc of boundary class 5 (cum 40) kept
    assert [got[i] for i in range(3)] == [True, True, True]
    assert [got[10 + i] for i in range(3)] == [True, False, False]
    assert all(not got[20 + i] for i in range(4))


def test_budget_zero_and_full(spark):
    from swiftsoup_spark.ops.selection import select_token_budget
    df = spark.createDataFrame(
        [(0, 2, 7), (1, 1, 5)], ["doc_id", "score", "n_tokens"])
    none = select_token_budget(df, budget_permille=0).collect()
    assert all(not r["keep"] for r in none)
    every = select_token_budget(df, budget_permille=1000).collect()
    assert all(r["keep"] for r in every)


def test_budget_boundary_window_is_score_partitioned(spark):
    from swiftsoup_spark.ops.selection import select_token_budget
    df = spark.createDataFrame(
        [(i, i % 5, 10) for i in range(50)], ["doc_id", "score", "n_tokens"])
    plan = _plan(select_token_budget(df))
    # the only window is partitioned by score (boundary class), so no
    # single-partition global window over the corpus
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "score" in line, line
