"""Per-host statistics with explicit skew handling.

The north rule calls for "salted repartitioning for skewed hosts": on a
real web corpus host cardinality is tiny next to row count (a viral host
can hold 1e8+ pages), so any per-host grouping that materializes
per-key state (top-K, samples, lists) funnels a whole host into one
task.  The scale-safe shape is the classic two-phase salted aggregate:

  phase 1: group by (host, salt=xxhash64(url) % S) — a viral host's
           rows split across S independent groups/tasks, so no single
           reducer holds more than |host|/S rows of list state;
  phase 2: group by host over the S pre-sliced partials — the merge
           sees at most S·K rows per host regardless of host size.

  Size S to the cluster (S≈executors) so |host|/S fits one task.

Counts/sums don't need this (Catalyst's partial aggregation already
combines map-side); ORDER-SENSITIVE bounded state (min-K here) does.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# no trailing '/': path-less URLs (https://example.com) keep their host
HOST_RE = r"https?://([^/]+)"


def host_url_sample(pages, k: int = 3, salt: int = 8):
    """(host, u1..uk): the K lexicographically-first urls per host via a
    salted two-phase min-K — deterministic, skew-bounded, no windows.

    A window `row_number() over (partition by host order by url)` is the
    naive equivalent and shuffles every row of a host into one task;
    this form caps any task's share of a host at 1/salt of its rows and
    merges salt·k pre-sliced candidates.
    """
    d = pages.select(
        F.regexp_extract("url", HOST_RE, 1).alias("host"),
        "url",
        (F.pmod(F.xxhash64("url"), F.lit(salt))).alias("s"))
    part = d.groupBy("host", "s").agg(
        F.slice(F.array_sort(F.collect_list("url")), 1, k).alias("us"))
    merged = part.groupBy("host").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("us"))), 1, k)
         .alias("us"))
    cols = [F.element_at("us", i + 1).alias(f"u{i + 1}") for i in range(k)]
    return merged.select("host", *cols)


def host_stats(pages):
    """(host, n_docs, total_bytes, n_langs): plain per-host aggregates —
    these combine map-side (partial agg), so no salting is needed; kept
    next to host_url_sample to document the distinction."""
    return (pages
            .select(F.regexp_extract("url", HOST_RE, 1).alias("host"),
                    F.length("html").alias("b"), "lang")
            .groupBy("host")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("b").alias("total_bytes"),
                 F.countDistinct("lang").alias("n_langs")))
