"""Cross-micro-batch stateful dedup (applyInPandasWithState)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="stateful-test")


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path_factory):
    from pyspark.sql import Row
    from swiftsoup_spark.streaming.stateful import dedup_stream

    in_dir = str(tmp_path_factory.mktemp("sin"))
    out_dir = str(tmp_path_factory.mktemp("sout"))
    ck_dir = str(tmp_path_factory.mktemp("sck"))

    batch1 = spark.createDataFrame([
        Row(url="u1", text="alpha"),
        Row(url="u2", text="beta"),
        Row(url="u3", text="alpha"),      # in-batch dupe
    ])
    batch1.coalesce(1).write.mode("overwrite").parquet(in_dir)

    schema = spark.read.parquet(in_dir).schema

    def run_once():
        src = spark.readStream.schema(schema).parquet(in_dir)
        q = (dedup_stream(src).writeStream
             .format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    run_once()
    got1 = {r.text for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {"alpha", "beta"}
    assert spark.read.parquet(out_dir).count() == 2

    # second batch: one cross-batch dupe, one new doc
    batch2 = spark.createDataFrame([
        Row(url="u4", text="alpha"),      # dupe of batch 1
        Row(url="u5", text="gamma"),
    ])
    batch2.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    assert {r.text for r in rows} == {"alpha", "beta", "gamma"}
    assert len(rows) == 3, "cross-batch duplicate not dropped"
