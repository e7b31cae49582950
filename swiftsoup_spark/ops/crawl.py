"""Crawl-side corpus operators: politeness frontier + revisit delta.

Two operators a Common-Crawl-style acquisition pipeline runs *before*
extraction ever sees a byte:

``crawl_frontier``
    Per-politeness-cycle fetch scheduling: every host contributes at
    most K urls per cycle (real crawlers cap per-host fetches, both for
    robots politeness and so one viral host cannot monopolize a fetch
    fleet), each host is pinned to a fetcher slot by a stable hash (all
    requests to one host leave from one slot → per-host rate limiting
    is local state, no coordination), and urls within a host are
    prioritized shallow-first (shorter url ≈ closer to the site root).

    Scale shape: the per-host top-K is the salted two-phase min-K from
    ``ops/hoststats.py`` — NO ``row_number() OVER (PARTITION BY host)``
    window, which would funnel a viral host's 1e8 rows into one task.
    Phase 1 groups by (host, salt) and keeps K candidates per slice;
    phase 2 merges salt*K pre-sliced candidates per host. The final
    rank is a posexplode of a ≤K-element array — per-row work, no
    second shuffle of the corpus.

``crawl_delta``
    CDX-style revisit detection between two crawl snapshots: per url,
    did the content digest change? Common Crawl stores revisit records
    instead of re-storing unchanged bodies; this operator computes the
    (url, old_digest, new_digest, changed) table that decision needs.

    Scale shape: the body is hashed map-side (md5 over the html bytes)
    BEFORE the shuffle, so only (url, snap, digest) rows — ~100 bytes —
    ride the groupBy, never the multi-KB bodies. One hash groupBy on
    url; 2 rows per group.

Both replay verbatim in ANSI SQL (DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from swiftsoup_spark.ops.hoststats import HOST_RE
from swiftsoup_spark.ops.mixing import bucket1000, bucket1000_sql


def crawl_frontier(pages, k: int = 3, n_slots: int = 16, salt: int = 8):
    """(host, slot, pos, url): per-cycle fetch plan — ≤``k`` urls per
    host, shallow-first (length(url), url) priority, host pinned to
    ``slot = md5bucket(host) % n_slots``."""
    d = pages.select(
        F.regexp_extract("url", HOST_RE, 1).alias("host"),
        "url",
        F.pmod(F.xxhash64("url"), F.lit(salt)).alias("s"))
    pri = F.struct(F.length("url").alias("l"), F.col("url").alias("u"))
    part = d.groupBy("host", "s").agg(
        F.slice(F.array_sort(F.collect_list(pri)), 1, k).alias("cand"))
    merged = part.groupBy("host").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("cand"))), 1, k)
         .alias("cand"))
    return (merged
            .select("host",
                    (bucket1000(F.col("host")) % n_slots)
                    .cast("int").alias("slot"),
                    F.posexplode("cand").alias("pos0", "c"))
            .select("host", "slot", (F.col("pos0") + 1).alias("pos"),
                    F.col("c.u").alias("url")))


def crawl_frontier_sql(pages_sql: str, k: int = 3, n_slots: int = 16) -> str:
    """DuckDB oracle: the window form (correct, not scale-safe — that is
    the point of the oracle: same answer, naive plan)."""
    return f"""
WITH p AS ({pages_sql}),
h AS (SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host, url FROM p),
r AS (SELECT host, url,
             row_number() OVER (PARTITION BY host
                                ORDER BY length(url), url) AS pos
      FROM h)
SELECT host, CAST({bucket1000_sql('host')} % {n_slots} AS INT) AS slot,
       CAST(pos AS INT) AS pos, url
FROM r WHERE pos <= {k}
"""


def crawl_delta(snapshots):
    """``snapshots``: (url, snap:int in {{0,1}}, html:string) → one row
    per url: (url, digest_old, digest_new, changed). Hash map-side,
    shuffle only the digests."""
    d = snapshots.select(
        "url", "snap", F.md5(F.col("html").cast("string")).alias("dg"))
    agg = d.groupBy("url").agg(
        F.max(F.when(F.col("snap") == 0, F.col("dg"))).alias("digest_old"),
        F.max(F.when(F.col("snap") == 1, F.col("dg"))).alias("digest_new"))
    return agg.select(
        "url", "digest_old", "digest_new",
        (F.col("digest_old") != F.col("digest_new")).alias("changed"))
