"""Deterministic data mixing: per-language (or per-source) quota
sampling for training-corpus assembly.

The mixture step of a pre-training pipeline ("keep 30% of en, 100% of
de, 5% of the boilerplate-heavy crawl") must be DETERMINISTIC — re-runs,
resumed partitions, and audits all have to pick the identical rows — so
random() is banned. Sampling here keys on a stable md5 bucket of the
row key: ``bucket(key) = int(md5(key)[:8], 16) % 1000`` and a row
survives iff ``bucket < rate_permille(lang)``.

Scale shape: the quota table is tiny (one row per language/source) —
broadcast hash join, corpus side stays a map-only scan; the bucket is
JVM codegen (md5 + conv). Everything replays verbatim in DuckDB, so the
operator is oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def bucket1000(key_col):
    """Stable 0..999 bucket from any column (cast to string, md5,
    first 8 hex digits). Uniform to ~2^-32; identical in DuckDB as
    ``CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT) %
    1000``."""
    return (F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10)
            .cast("long") % 1000)


def bucket1000_sql(key_expr: str) -> str:
    return (f"CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8) "
            f"AS BIGINT) % 1000")


def sample_quota(df, quota_df, key_col: str = "doc_id",
                 group_col: str = "lang", default_permille: int = 0):
    """Keep each row iff its stable bucket falls under its group's
    quota. ``quota_df`` has columns (``group_col``, rate_permille);
    groups absent from the quota table get ``default_permille``
    (0 = drop unknown groups — the safe default for a curated mixture).
    """
    q = F.broadcast(quota_df.select(F.col(group_col).alias("__g"),
                                    F.col("rate_permille").alias("__r")))
    out = (df.join(q, F.col(group_col) == F.col("__g"), "left")
           .filter(bucket1000(F.col(key_col))
                   < F.coalesce(F.col("__r"), F.lit(default_permille)))
           .drop("__g", "__r"))
    return out
