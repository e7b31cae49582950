"""Event-time windowed aggregation with watermarked late-data bounds.

The reference is batch-only; the pipeline counterpart of the batch
``events_hourly`` query for a live crawl/event stream.  The watermark is
what makes this run forever at corpus scale: without it the windowed
state grows with every hour ever seen; with it, state for windows older
than ``watermark`` behind the max observed event time is dropped, and
events later than that are discarded (the documented completeness/
state-size trade).  In append output mode a window only emits once the
watermark passes its end — i.e. results are final.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def windowed_event_counts(events, window: str = "1 hour",
                          watermark: str = "2 hours"):
    """(window_start, event_type, n, sum_value_e6) per event-time window.

    Works on a streaming OR batch DataFrame with (ts, event_type, value);
    on a stream the watermark bounds aggregation state and admits late
    events up to ``watermark``.
    """
    # watermarks require TIMESTAMP (with zone); events carry TIMESTAMP_NTZ
    # — equivalent under the session's fixed UTC timezone
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (src
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value") * 1000000).cast("long")
                  .alias("sum_value_e6"))
            .select(F.unix_timestamp("w.start").cast("long")
                     .alias("window_epoch"),
                    "event_type", "n", "sum_value_e6"))


def sessionized_events(events, gap: str = "10 minutes",
                       watermark: str = "30 minutes"):
    """Gap-based sessionization: (user_id, session_epoch, session_end_epoch,
    n_events, sum_value_e6) — one row per user session, a session being
    a maximal run of events with inter-event gaps below ``gap``
    (pyspark ``session_window``: on a stream the state per key closes
    ``gap`` after the last event once the watermark passes, so state is
    bounded; on a batch frame it is the same dynamic-window aggregate).

    The batch SQL replay is the classic islands query: per user, order
    by ts, start a new island when ts - lag(ts) > gap, island id =
    running sum of starts — which is exactly what the oracle renders.
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = (events.withWatermark("ts", watermark)
           if events.isStreaming else events)
    return (src
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value") * 1000000).cast("long")
                  .alias("sum_value_e6"))
            .select("user_id",
                    F.unix_timestamp("w.start").cast("long")
                     .alias("session_epoch"),
                    F.unix_timestamp("w.end").cast("long")
                     .alias("session_end_epoch"),
                    "n_events", "sum_value_e6"))
