"""Watermarked windowed aggregation over a micro-batched event stream
equals the batch aggregation of the same data (update output mode emits
every window; the watermark bounds state, not results, when no event is
later than the allowed lateness)."""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    return get_spark(master="local[4]", app="stream-window")


def test_windowed_counts_match_batch(spark, tmp_path_factory):
    from swiftsoup_spark.streaming.windows import windowed_event_counts

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # stage the input as several files so availableNow processes multiple
    # micro-batches and the watermark actually advances between them
    src_dir = str(tmp_path_factory.mktemp("ev_src"))
    events.repartition(4).write.mode("overwrite").parquet(src_dir)

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    # the staged files are NOT time-ordered, so a tight watermark would
    # (correctly) drop events arriving later than the allowed lateness;
    # for batch-equality use a watermark spanning the corpus — state
    # bounding vs completeness is exactly the documented trade
    q = (windowed_event_counts(stream, watermark="3650 days")
         .writeStream.outputMode("update")
         .format("memory").queryName("winagg")
         .option("checkpointLocation", str(tmp_path_factory.mktemp("ck")))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    # update mode re-emits a window on every refinement; the LAST emit per
    # key is the final value — take max(n) (counts only grow)
    got = {(r["window_epoch"], r["event_type"]): (r["n"], r["sum_value_e6"])
           for r in spark.sql("""
               SELECT window_epoch, event_type, n, sum_value_e6 FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY window_epoch, event_type ORDER BY n DESC) rk
                 FROM winagg) WHERE rk = 1""").collect()}
    exp = {(r["window_epoch"], r["event_type"]): (r["n"], r["sum_value_e6"])
           for r in windowed_event_counts(events).collect()}
    assert got == exp

    # the watermark was actually installed on the streaming plan
    prog = q.recentProgress
    assert any(p.get("eventTime", {}).get("watermark") for p in prog), (
        "no watermark advanced in streaming progress")
    shutil.rmtree(src_dir, ignore_errors=True)


def test_sessionized_stream_matches_batch(spark, tmp_path_factory):
    # session windows (dynamic gap windows) over micro-batches must
    # converge to the batch sessionization of the same events
    from swiftsoup_spark.streaming.windows import sessionized_events

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = {tuple(r) for r in
             sessionized_events(events, gap="12 hours").collect()}

    src_dir = str(tmp_path_factory.mktemp("sess_src"))
    events.repartition(4).write.mode("overwrite").parquet(src_dir)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (sessionized_events(stream, gap="12 hours",
                            watermark="3650 days")
         .writeStream.outputMode("complete")
         .format("memory").queryName("sessagg")
         .option("checkpointLocation", str(tmp_path_factory.mktemp("ck2")))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql(
        "SELECT user_id, session_epoch, session_end_epoch, n_events, "
        "sum_value_e6 FROM sessagg").collect()}
    assert got == batch
