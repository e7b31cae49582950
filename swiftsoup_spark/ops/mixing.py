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


def temperature_quota(df, group_col: str = "lang", temperature: int = 2):
    """Derive the quota table FROM the corpus: multilingual temperature
    rebalancing (keep-rate ∝ n_g^(1/T - 1), scaled so the smallest
    group keeps everything). With the default T=2 the only floating
    step is ``sqrt`` — correctly rounded IEEE in both engines, so the
    derived integer rates replay exactly in DuckDB; other temperatures
    use ``pow`` and are documented as engine-exact only where libm
    agrees (stick to T=2 for oracle-gated paths).

    One count aggregate over the corpus (map-side combines) + one
    1-row broadcast for the scale constant — the quota table stays
    tiny and the corpus side map-only, like :func:`sample_quota`.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    if temperature == 2:
        weight = F.sqrt(F.col("__n"))
    else:
        weight = F.pow(F.col("__n"),
                       1.0 - 1.0 / temperature)  # n^(1 - 1/T)
    # keep-rate ∝ n^(1/T) / n = 1 / n^(1 - 1/T): LARGE groups
    # downsample, and the smallest group (min weight) keeps 1000‰
    w = counts.select(group_col, weight.alias("__w"))
    mn = w.agg(F.min("__w").alias("__mn"))
    return (w.crossJoin(F.broadcast(mn))
            .select(group_col,
                    F.floor(1000 * F.col("__mn") / F.col("__w"))
                    .cast("int").alias("rate_permille")))


def temperature_quota_sql(group_expr: str, table: str = "documents") -> str:
    """DuckDB replay of :func:`temperature_quota` (T=2)."""
    return f"""
WITH c AS (SELECT {group_expr} AS g, count(*) AS n FROM {table} GROUP BY 1),
w AS (SELECT g, sqrt(n) AS w FROM c),
mn AS (SELECT min(w) AS mn FROM w)
SELECT g, CAST(floor(1000 * mn / w) AS INTEGER) AS rate_permille
FROM w, mn
"""


def split_assign(df, text_col: str = "text",
                 val_permille: int = 10, test_permille: int = 10):
    """Deterministic train/val/test assignment — the most-used single
    operation in dataset prep, made reshard-proof: the bucket comes
    from the CONTENT hash (md5 of text, :func:`bucket1000`), so a
    document keeps its split across recrawls, re-partitioning, and
    pipeline re-runs, and exact duplicates always land in the same
    split (no train/test leakage through dup pairs). Pure map-side
    codegen — zero shuffle at any scale."""
    b = bucket1000(F.col(text_col))
    split = (F.when(b < test_permille, "test")
             .when(b < test_permille + val_permille, "val")
             .otherwise("train"))
    return df.select("doc_id", b.cast("int").alias("bucket"),
                     split.alias("split"))


def split_assign_sql(table: str = "documents", text_expr: str = "text",
                     val_permille: int = 10,
                     test_permille: int = 10) -> str:
    """DuckDB replay of :func:`split_assign`."""
    b = bucket1000_sql(text_expr)
    return f"""
WITH b AS (SELECT doc_id, CAST({b} AS INTEGER) AS bucket FROM {table})
SELECT doc_id, bucket,
       CASE WHEN bucket < {test_permille} THEN 'test'
            WHEN bucket < {test_permille + val_permille} THEN 'val'
            ELSE 'train' END AS split
FROM b
"""
