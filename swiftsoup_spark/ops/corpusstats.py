"""Corpus-level statistics: scale-exact quantiles + tf-idf keywords.

``int_quantiles``
    Exact linear-interpolated quantiles (the ``quantile_cont`` /
    ``percentile_cont`` definition) of an INTEGER-valued column per
    group — without the classic scale bug. Spark's exact
    ``percentile()`` materializes every value of a group on one
    reducer: at 1e12 rows that is a straight OOM. For integer domains
    (doc lengths, token counts, line counts) the distinct-value
    histogram is tiny even when the row count is astronomical, so the
    scale-exact plan is:

      1. groupBy (group, v) → count          [map-side combinable]
      2. running rank per group over the SMALL histogram (window over
         ≤|domain| rows per group, not ≤|rows|)
      3. quantile q at rank pos = q*(N-1): x_lo = the v whose
         cumulative range covers floor(pos), x_hi likewise for
         ceil(pos), result = x_lo + (x_hi-x_lo)*frac — two conditional
         mins in one final aggregate.

    Every step is JVM codegen; the only window runs over the per-group
    histogram (bounded by the value domain). Matches DuckDB's
    ``quantile_cont`` bit-for-bit on integer inputs (the interpolation
    is one multiply-add on exactly-representable integers).

``tfidf_topk``
    Per-document top-k keywords by tf-idf — the classic relevance
    ranking, and a practical corpus-analysis primitive (what is this
    page about, without a model). Shape: one explode → (doc, term, tf)
    groupBy; one (term → df) groupBy over doc-distinct terms; idf join
    on term (equi shuffle join — the vocabulary is wide but each row is
    ~30 bytes; broadcastable when pruned by min_df); per-doc top-k via
    collect_list bounded by the DOCUMENT's distinct-term count (never
    the corpus), sorted in-array. No corpus-wide window, no cartesian.

    Ties break deterministically on (−score, term); scores are rounded
    to 6 dp so the float ``ln`` replays across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def int_quantiles(df, group_col: str, val_col: str,
                  qs: tuple = (0.5, 0.9, 0.99)):
    """Per-``group_col`` exact continuous quantiles of integer
    ``val_col``. Output: (group, q50, q90, ...) doubles rounded 6dp."""
    hist = (df.groupBy(group_col, val_col)
              .agg(F.count("*").alias("__c")))
    w = Window.partitionBy(group_col).orderBy(val_col)
    # cum_end = number of rows with value <= v  (1-based rank boundary)
    hist = hist.withColumn("__end", F.sum("__c").over(w))
    n = hist.groupBy(group_col).agg(F.sum("__c").alias("__n"))
    hist = hist.join(F.broadcast(n), group_col)
    aggs = []
    for q in qs:
        pos = F.lit(q) * (F.col("__n") - 1)          # 0-based rank
        lo, hi = F.floor(pos), F.ceil(pos)
        # value at 0-based rank r == min v whose cum_end > r
        x_lo = F.min(F.when(F.col("__end") > lo, F.col(val_col)))
        x_hi = F.min(F.when(F.col("__end") > hi, F.col(val_col)))
        frac = pos - lo
        name = f"q{int(q * 100)}"
        aggs.append(F.round(
            x_lo + (x_hi - x_lo) * F.max(frac), 6).alias(name))
    return hist.groupBy(group_col).agg(*aggs)


def int_quantiles_sql(table: str, group_col: str, val_col: str,
                      qs: tuple = (0.5, 0.9, 0.99)) -> str:
    cols = ", ".join(
        f"round(quantile_cont({val_col}, {q}), 6) AS q{int(q * 100)}"
        for q in qs)
    return f"SELECT {group_col}, {cols} FROM {table} GROUP BY {group_col}"


def tfidf_topk(docs, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text"):
    """(doc_id, t1..tk): top-k terms by tf-idf, ties → lexicographic.

    tf = in-doc term count; idf = ln((N+1)/(df+1)); score rounded 6dp.
    """
    terms = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.count()  # scalar: one job over the (tiny after pruning) scan
    idf = dfreq.select(
        "term", F.log((F.lit(n) + 1.0) / (F.col("df") + 1.0)).alias("idf"))
    scored = (tf.join(idf, "term")
                .select(id_col, "term",
                        F.round(F.col("tf") * F.col("idf"), 6).alias("s")))
    key = F.struct((-F.col("s")).alias("ns"), F.col("term").alias("t"))
    top = (scored.groupBy(id_col)
                 .agg(F.slice(F.array_sort(F.collect_list(key)), 1, k)
                       .alias("top")))
    # try_element_at: a doc with < k distinct terms yields NULL tails
    # (ANSI mode throws on plain element_at past the array end)
    cols = [F.try_element_at("top", F.lit(i + 1))["t"].alias(f"t{i + 1}")
            for i in range(k)]
    return top.select(id_col, *cols)


def tfidf_topk_sql(docs_table: str = "documents", k: int = 3) -> str:
    return f"""
WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM {docs_table}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM e GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM {docs_table}),
s AS (SELECT doc_id, term,
             round(tf * ln((n.n + 1.0) / (df + 1.0)), 6) AS s
      FROM tf JOIN dfq USING (term) CROSS JOIN n),
r AS (SELECT doc_id, term,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY s DESC, term) AS rn
      FROM s)
SELECT doc_id,
       max(CASE WHEN rn = 1 THEN term END) AS t1,
       max(CASE WHEN rn = 2 THEN term END) AS t2,
       max(CASE WHEN rn = 3 THEN term END) AS t3
FROM r WHERE rn <= {k} GROUP BY doc_id
"""
