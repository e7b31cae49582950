"""As-of (most-recent-at-or-before) join — the temporal lookup Spark
has no built-in operator for.

Crawl-native use: "which capture of this url was current at time T?"
(decontamination cutoffs, training-snapshot freezes, link-rot
analysis). The classic single-node answer is a merge over
time-sorted streams; the scale-safe distributed shape here is:

* one EQUI shuffle join on the key (url) — fanout per probe is the
  key's capture count, which is small and bounded by crawl cadence,
  never corpus-sized;
* filter ``build_ts <= probe_ts``;
* one ``max(struct(build_ts, payload...))`` per (key, probe_ts) —
  partial-aggregable, so losing candidates die map-side and ties
  break deterministically on payload (same argmax discipline as
  ops/snapshots.latest_snapshot).

Inner semantics: probes with no capture at-or-before their timestamp
produce no row (the caller left-joins back if "missing" matters).
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["as_of_join"]


def as_of_join(probes, builds, key: str = "url",
               probe_ts: str = "q_ts", build_ts: str = "ts_epoch",
               payload_cols=("content",)):
    """One row per (key, probe_ts): the build row with the greatest
    ``build_ts`` <= ``probe_ts``."""
    probe_cols = [c for c in probes.columns]
    j = (probes.join(builds, key)
         .filter(F.col(build_ts) <= F.col(probe_ts)))
    s = F.max(F.struct(build_ts, *payload_cols)).alias("s")
    return (j.groupBy(*probe_cols).agg(s)
            .select(*probe_cols,
                    F.col(f"s.{build_ts}").alias(build_ts),
                    *[F.col(f"s.{p}").alias(p) for p in payload_cols]))
