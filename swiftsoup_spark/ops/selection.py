"""Training-set assembly: deterministic corpus shuffle into shards, and
token-budget selection by quality score.

Two ops every corpus ships through on the way to a trainer:

- :func:`shuffle_shards` — the global pseudo-random permutation a
  training run needs (adjacent crawl pages are near-identical; feeding
  them in crawl order biases every batch), made deterministic and
  reshard-proof: position comes from md5 of the DOCUMENT ID, not from
  input order, so re-running on a repartitioned corpus yields the
  identical layout.
- :func:`select_token_budget` — "take the best N tokens": exact greedy
  selection by (score desc, id) without ever globally sorting the
  corpus. The trick is classic two-phase: a score HISTOGRAM (tiny —
  integer scores have bounded cardinality) decides full classes
  map-side, and only the single boundary score class pays a per-class
  window.

Both are integer-exact end to end, so the DuckDB oracles replay them
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["shuffle_shards", "shuffle_shards_sql",
           "select_token_budget", "select_token_budget_sql"]


def shuffle_shards(df, n_shards: int = 64, id_col: str = "doc_id"):
    """(doc_id, shard, pos): deterministic shuffled shard layout.

    shard = md5(id) mod n_shards; ``pos`` is the document's 0-based
    position within its shard, ordered by (md5(id), id) — i.e. a
    content-independent pseudo-random permutation of the corpus,
    identical no matter how the input was partitioned.

    Scale: one hash repartition by shard + sortWithinPartitions — the
    per-shard window never sees more than corpus/n_shards rows and
    there is NO global sort; this is exactly the physical layout of the
    shard files a writer would emit (``.repartition(shard)`` +
    ``sortWithinPartitions`` + partitioned write)."""
    key = F.md5(F.col(id_col).cast("string"))
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
             % n_shards).cast("int")
    w = (Window.partitionBy("shard").orderBy("__key", id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (df.select(id_col, key.alias("__key"), shard.alias("shard"))
            .withColumn("pos", F.coalesce(F.count("*").over(w), F.lit(0))
                        .cast("long"))
            .select(id_col, "shard", "pos"))


def shuffle_shards_sql(table: str = "documents", n_shards: int = 64,
                       id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`shuffle_shards`."""
    return f"""
WITH k AS (SELECT {id_col}, md5(CAST({id_col} AS VARCHAR)) AS key FROM {table}),
s AS (SELECT {id_col}, key,
             CAST(CAST('0x' || substr(key, 1, 8) AS BIGINT)
                  % {n_shards} AS INTEGER) AS shard
      FROM k)
SELECT {id_col}, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY key, {id_col})
            - 1 AS BIGINT) AS pos
FROM s
"""


def select_token_budget(df, budget_permille: int = 400,
                        score_col: str = "score",
                        token_col: str = "n_tokens",
                        id_col: str = "doc_id"):
    """(doc_id, score, n_tokens, keep): exact greedy token-budget
    selection — walk the corpus in (score desc, id) order and keep
    documents while the running token sum stays within
    ``budget_permille``/1000 of the corpus total.

    NO global sort: a score histogram (one tiny groupBy — integer
    quality scores have bounded cardinality) gets an exclusive prefix
    sum; every class whose prefix+size fits is kept map-side via a
    broadcast join, every class past the boundary is dropped map-side,
    and only the single BOUNDARY class pays a per-class cumulative
    window (partitioned by score, so its state is one score class, not
    the corpus). Semantically identical to the global-window greedy,
    which is what the oracle replays."""
    d = df.select(id_col, F.col(score_col).cast("long").alias("score"),
                  F.col(token_col).cast("long").alias("toks"))
    budget = d.agg((F.expr(f"sum(toks) * {budget_permille} DIV 1000"))
                   .alias("__budget"))
    hist = d.groupBy("score").agg(F.sum("toks").alias("class_toks"))
    wh = (Window.orderBy(F.desc("score"))
          .rowsBetween(Window.unboundedPreceding, -1))
    hist = (hist.withColumn(
        "cum_before", F.coalesce(F.sum("class_toks").over(wh), F.lit(0)))
        .join(F.broadcast(budget))
        .withColumn("__full", F.col("cum_before") + F.col("class_toks")
                    <= F.col("__budget"))
        .withColumn("__dead", F.col("cum_before") >= F.col("__budget")))
    d = d.join(F.broadcast(
        hist.select("score", "cum_before", "__budget", "__full", "__dead")),
        "score")
    wc = (Window.partitionBy("score").orderBy(id_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    boundary_keep = (F.col("cum_before") + F.sum("toks").over(wc)
                     <= F.col("__budget"))
    keep = (F.when(F.col("__full"), F.lit(True))
            .when(F.col("__dead"), F.lit(False))
            .otherwise(boundary_keep))
    return d.select(id_col, "score", F.col("toks").alias("n_tokens"),
                    keep.alias("keep"))


def select_token_budget_sql(score_expr: str, token_expr: str,
                            table: str = "documents",
                            budget_permille: int = 400,
                            id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`select_token_budget` — the equivalent
    global-window greedy (prefix of the (score desc, id) order)."""
    return f"""
WITH d AS (SELECT {id_col}, CAST({score_expr} AS BIGINT) AS score,
                  CAST({token_expr} AS BIGINT) AS toks FROM {table}),
t AS (SELECT CAST(sum(toks) * {budget_permille} // 1000 AS BIGINT)
        AS budget FROM d),
c AS (SELECT {id_col}, score, toks,
             sum(toks) OVER (ORDER BY score DESC, {id_col}
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM d)
SELECT {id_col}, score, toks AS n_tokens, cum <= t.budget AS keep
FROM c, t
"""
