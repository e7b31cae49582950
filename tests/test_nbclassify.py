"""Naive-Bayes text classifier (ops/nbclassify.py): weight math,
pruning, broadcast plan, held-out accuracy on a noisy planted signal,
and the DuckDB replay."""

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.nbclassify import (  # noqa: E402
    nb_oracle_sql, score_nb, train_nb)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="nb-test")


def test_weight_math(spark):
    # word seen 7x in positives, 1x in negatives:
    # bits(8) - bits(2) = 4 - 2 = 2
    rows = [(True, "hot")] * 7 + [(False, "hot")] + \
           [(True, "cold")] + [(False, "cold")] * 7 + \
           [(True, "flat")] * 3 + [(False, "flat")] * 3 + \
           [(True, "rare")]
    df = spark.createDataFrame(rows, "label boolean, text string")
    m = {r.w: r.weight for r in train_nb(df).collect()}
    assert m == {"hot": 2, "cold": -2}   # flat prunes (weight 0),
    assert "rare" not in m               # rare prunes (min_count)


def test_score_and_plan(spark):
    model = spark.createDataFrame(
        [("good", 3), ("bad", -2)], "w string, weight int")
    docs = spark.createDataFrame(
        [(1, "good good bad"), (2, "bad"), (3, "nothing seen")],
        "doc_id long, text string")
    out = score_nb(docs, model)
    got = {r.doc_id: (r.n_hits, r.score, r.pred) for r in out.collect()}
    assert got == {1: (3, 4, True), 2: (1, -2, False), 3: (0, 0, False)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_heldout_accuracy_and_oracle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    label = F.col("doc_id") % 3 == 0
    planted = docs.select(
        "doc_id", label.alias("label"),
        F.concat(F.col("text"),
                 F.when(label & (F.col("doc_id") % 10 < 8),
                        F.lit(" qualmark clean wellformed"))
                 .when(~label & (F.col("doc_id") % 10 == 0),
                       F.lit(" qualmark"))
                 .otherwise(F.lit(""))).alias("text"))
    model = train_nb(planted.filter(F.col("doc_id") % 2 == 0)
                     .select("label", "text"))
    out = score_nb(planted, model)
    res = out.join(planted.select("doc_id", "label"), "doc_id")
    heldout = res.filter(F.col("doc_id") % 2 == 1)
    acc = heldout.select(F.avg((F.col("pred") == F.col("label"))
                               .cast("double"))).collect()[0][0]
    assert acc >= 0.75, acc   # real learning, not majority class
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    sql = nb_oracle_sql(
        "doc_id % 3 = 0", "doc_id % 2 = 0",
        table="""(SELECT doc_id, text ||
            CASE WHEN doc_id % 3 = 0 AND doc_id % 10 < 8
                 THEN ' qualmark clean wellformed'
                 WHEN doc_id % 3 <> 0 AND doc_id % 10 = 0
                 THEN ' qualmark' ELSE '' END AS text FROM documents)""")
    ora = sorted(con.execute(sql).fetchall())
    got = sorted((r.doc_id, r.n_hits, r.score, r.pred)
                 for r in out.collect())
    assert got == ora
