"""Range (interval) join, bucketized — the second temporal operator
Spark lacks a first-class physical strategy for.

Matching events to time windows with a naive ``ON ts BETWEEN s AND e``
predicate gives Catalyst nothing to hash on: with a broadcast side it
becomes BroadcastNestedLoopJoin (every event tests EVERY interval);
without one, a cartesian. The standard fix is bucketization:

* explode each interval into the fixed-width buckets it covers
  (bounded by interval_length / bucket + 1 rows per interval);
* equi-join events on their single bucket id — hashable, partial-
  prunable, skew-safe under AQE;
* re-check the exact ``BETWEEN`` as a residual filter.

The exploded interval table stays small (intervals are dimension-
sized), so it broadcasts and the corpus side is MAP-ONLY; with a huge
interval table the same plan degrades gracefully to a shuffle equi
join on the bucket id. Overlapping intervals are honest interval
semantics: one event can match several windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["interval_join_bucketed"]


def interval_join_bucketed(events, intervals, ts_col: str = "ts",
                           start_col: str = "start_ep",
                           end_col: str = "end_ep",
                           bucket_secs: int = 3600):
    """Inner interval join: every (event, interval) pair with
    ``start_ep <= epoch(ts) <= end_ep``. Events carry all their
    columns plus ``__ep``; interval columns append."""
    iv = intervals.select(
        "*",
        F.explode(F.sequence(
            F.expr(f"{start_col} DIV {bucket_secs}"),
            F.expr(f"{end_col} DIV {bucket_secs}"))).alias("__b"))
    ev = (events
          .withColumn("__ep", F.unix_timestamp(ts_col).cast("long"))
          .withColumn("__b", F.expr(f"__ep DIV {bucket_secs}")))
    return (ev.join(F.broadcast(iv), "__b")
            .filter((F.col("__ep") >= F.col(start_col))
                    & (F.col("__ep") <= F.col(end_col)))
            .drop("__b"))
