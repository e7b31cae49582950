"""Supervised text classification — a hashed-vocabulary Naive-Bayes /
fastText-style linear scorer, the workhorse quality- and language-
filter family of web-corpus pipelines (CCNet's fastText lang-ID,
quality classifiers trained on "good corpus vs crawl").

Integer-exact by construction so the whole train+score pipeline is
oracle-replayable: the per-word weight is the BIT-LENGTH log-likelihood
ratio normalized by class token totals,
``[bits(n_pos(w)+1) + bits(N_neg+1)] - [bits(n_neg(w)+1) + bits(N_pos+1)]``
(``bits(x)`` = floor(log2 x)+1, computed as the base-2 digit count — no
libm ``log``, whose last-ulp rounding differs between the JVM and
DuckDB). The normalization terms make class-independent words weigh ~0
regardless of class imbalance — without them every common word drags
toward the majority class. A document's score is the sum of its words'
weights; prediction is ``score > 0`` (class prior deliberately omitted:
corpus filters want the likelihood ratio, not the crawl's base rate).
This is Naive Bayes quantized to 1-bit log granularity — coarse,
deterministic, and empirically discriminative wherever the class
vocabularies actually differ (lang-ID, boilerplate-vs-content).

Scale shape: training is one explode + word-keyed groupBy with map-side
combines over the LABELED sample (corpus-small by definition); the
model is ``min_count``-pruned and broadcast; scoring is a map-side
explode + broadcast hash join + doc-keyed sum — document text never
rides a shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _bits(col):
    # floor(log2(x)) + 1 for x >= 1: number of base-2 digits
    return F.length(F.conv(col.cast("string"), 10, 2))


def train_nb(labeled_df, text_col: str = "text", label_col: str = "label",
             min_count: int = 3):
    """(text, label boolean) -> (w, weight int) word-weight model."""
    words = labeled_df.select(
        F.col(label_col).alias("y"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"))
    counts = (words.filter(F.col("w") != "")
              .groupBy("w")
              .agg(F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("np"),
                   F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("nn")))
    # class token totals: a one-row aggregate broadcast-crossed in
    totals = counts.agg(F.sum("np").alias("tp"), F.sum("nn").alias("tn"))
    return (counts.filter(F.col("np") + F.col("nn") >= min_count)
            .crossJoin(F.broadcast(totals))
            .select("w", ((_bits(F.col("np") + 1)
                           + _bits(F.col("tn") + 1))
                          - (_bits(F.col("nn") + 1)
                             + _bits(F.col("tp") + 1)))
                    .cast("int").alias("weight"))
            .filter(F.col("weight") != 0))


def score_nb(df, model_df, text_col: str = "text", id_col: str = "doc_id"):
    """Score documents against a broadcast model: (id, n_hits, score,
    pred). Unseen words contribute 0 (pruned-model convention)."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("w"))
    hits = words.join(F.broadcast(model_df), "w")
    scored = (hits.groupBy(id_col)
              .agg(F.count("*").alias("n_hits"),
                   F.sum("weight").alias("score")))
    base = df.select(id_col)
    return (base.join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_hits", F.lit(0)).cast("int")
                    .alias("n_hits"),
                    F.coalesce("score", F.lit(0)).cast("long")
                    .alias("score"),
                    (F.coalesce("score", F.lit(0)) > 0).alias("pred")))


def nb_oracle_sql(label_sql: str, train_filter_sql: str,
                  min_count: int = 3, table: str = "documents") -> str:
    """DuckDB replay: train on ``train_filter_sql`` rows with label
    ``label_sql``, score every row of ``table``."""
    return f"""
WITH tr AS (SELECT {label_sql} AS y, text FROM {table}
            WHERE {train_filter_sql}),
w AS (SELECT y, unnest(string_split(text, ' ')) AS w FROM tr),
c AS (SELECT w, SUM(CASE WHEN y THEN 1 ELSE 0 END) AS np,
             SUM(CASE WHEN y THEN 0 ELSE 1 END) AS nn
      FROM w WHERE w <> '' GROUP BY w),
tot AS (SELECT SUM(np) AS tp, SUM(nn) AS tn FROM c),
m AS (SELECT w, CAST((length(bin(CAST(np + 1 AS BIGINT)))
                      + length(bin(CAST(tn + 1 AS BIGINT))))
                     - (length(bin(CAST(nn + 1 AS BIGINT)))
                        + length(bin(CAST(tp + 1 AS BIGINT))))
                AS INTEGER) AS weight
      FROM c, tot WHERE np + nn >= {min_count}),
m2 AS (SELECT * FROM m WHERE weight <> 0),
dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM {table}),
s AS (SELECT doc_id, count(*) AS n_hits, SUM(weight) AS score
      FROM dw JOIN m2 USING (w) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(s.n_hits, 0) AS INTEGER) AS n_hits,
       CAST(coalesce(s.score, 0) AS BIGINT) AS score,
       coalesce(s.score, 0) > 0 AS pred
FROM {table} d LEFT JOIN s ON d.doc_id = s.doc_id
"""
