"""BM25 keyword retrieval over the corpus — integer-exact.

The retrieval face of the engine: given a small query table, rank
documents by Okapi BM25 (k1=1.2, b=0.75) and return the top-k per
query. Floating ``ln`` is banned (last-ulp rounding differs across
engines — same reasoning as ops/nbclassify.py), so the score is
quantized to integers that replay bit-for-bit in any engine:

* idf as the BIT-LENGTH log: ``bits(N+1) - bits(df)`` where
  ``bits(x)`` = base-2 digit count = floor(log2 x)+1 — 1-bit
  granularity of log2((N+1)/df), floored at ONE quantum — Lucene's
  idf is likewise strictly positive (the raw probabilistic form goes
  negative for terms in over half the corpus and would rank matches
  BELOW non-matches; and a zero floor would zero out every match in
  small-vocabulary corpora, leaving tf-saturation nothing to rank);
* the tf-saturation term as one exact integer division: with
  ``avgdl_e2 = (100*sum(dl)) div N`` (a scalar),

    tfc_e4 = (10000 * 88*avgdl_e2*tf)
             div (40*avgdl_e2*tf + 12*avgdl_e2 + 3600*dl)

  is exactly floor(1e4 * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)))
  under the e2 quantization of avgdl (multiply the real formula by
  40*avgdl and clear denominators). int64-safe for dl ≤ 1e6 and
  avgdl ≤ 1e4 — beyond that, widen to decimal.

Plan shape at 10^12 docs: tokenize → (doc,term,tf) and (doc,dl)
groupBys (linear, map-side partials); df pruned TO QUERY TERMS before
anything joins (query table is tiny → broadcast, so the corpus-side
probe is map-only); one equi shuffle join attaches dl; per-query top-k
is TWO-PHASE (salted partial top-k, then a ≤ salt*k-row final merge) —
a popular query term never funnels the corpus into one reducer, unlike
a naive window. Ties break deterministically on (score desc, doc asc).
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["bm25_topk", "bm25_snippets", "QUERY_SET", "queries_df",
           "queries_values_sql"]

# deterministic demo query set over the synthetic vocabulary
QUERY_SET = [(0, "spark join"), (1, "window sort merge"),
             (2, "customer table")]


def queries_df(spark):
    return spark.createDataFrame(QUERY_SET, "query_id long, terms string")


def queries_values_sql() -> str:
    vals = ", ".join(f"(CAST({i} AS BIGINT), '{t}')" for i, t in QUERY_SET)
    return f"(VALUES {vals}) AS q(query_id, terms)"


def _bits(col):
    # floor(log2(x)) + 1 for x >= 1 (base-2 digit count, no libm)
    return F.length(F.conv(col.cast("string"), 10, 2))


def bm25_topk(docs, queries, k: int = 5, id_col: str = "doc_id",
              text_col: str = "text", salt: int = 32):
    """(query_id, rank, doc_id, score): top-k docs per query by the
    integer-exact BM25 above. ``queries`` is (query_id, terms) with
    space-separated terms."""
    terms = (docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .filter(F.col("term") != ""))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = terms.groupBy(id_col).agg(F.count("*").alias("dl"))
    # two scalars: the only driver-side values (documented convention)
    row = dl.agg(F.count("*").alias("n"), F.sum("dl").alias("a")).collect()[0]
    n, avgdl_e2 = row["n"], (100 * row["a"]) // row["n"]

    qterms = (queries.select(
        "query_id", F.explode(F.split("terms", " ")).alias("term"))
        .distinct())
    # df restricted to query terms BEFORE touching the corpus side:
    # (term, df, idf) stays broadcast-small
    dfreq = (tf.join(F.broadcast(qterms.select("term").distinct()), "term")
             .groupBy("term").agg(F.count("*").alias("df")))
    qmodel = (qterms.join(dfreq, "term")
              .select("query_id", "term",
                      F.greatest(_bits(F.lit(n + 1)) - _bits(F.col("df")),
                                 F.lit(1)).cast("long").alias("idf")))

    scored = (tf.join(F.broadcast(qmodel), "term")
              .join(dl, id_col)
              .select("query_id", id_col, "idf",
                      (F.lit(10000 * 88 * avgdl_e2) * F.col("tf"))
                      .cast("long").alias("__num"),
                      (F.lit(40 * avgdl_e2) * F.col("tf")
                       + F.lit(12 * avgdl_e2) + F.lit(3600) * F.col("dl"))
                      .cast("long").alias("__den"))
              .select("query_id", id_col,
                      (F.col("idf") * F.expr("__num DIV __den")).alias("w"))
              .groupBy("query_id", id_col)
              .agg(F.sum("w").alias("score")))

    key = F.struct((-F.col("score")).alias("ns"),
                   F.col(id_col).alias("d"))
    p1 = (scored.withColumn("__s", F.pmod(F.xxhash64(id_col), F.lit(salt)))
          .groupBy("query_id", "__s")
          .agg(F.slice(F.array_sort(F.collect_list(key)), 1, k).alias("t")))
    top = (p1.select("query_id", F.explode("t").alias("t"))
           .groupBy("query_id")
           .agg(F.slice(F.array_sort(F.collect_list("t")), 1, k)
                .alias("top")))
    return (top.select("query_id", F.posexplode("top").alias("pos", "t"))
            .select("query_id", (F.col("pos") + 1).cast("long").alias("rank"),
                    F.col("t.d").alias("doc_id"),
                    (-F.col("t.ns")).cast("long").alias("score")))


def bm25_snippets(docs, queries, k: int = 5, width: int = 30,
                  id_col: str = "doc_id", text_col: str = "text"):
    """(query_id, rank, doc_id, snippet): the top-k result rows with a
    keyword-in-context snippet of ``2*width`` chars around the first
    occurrence of the query's FIRST term (document start when the hit
    came from another term — locate()'s 0 clamps to position 1).

    Scale shape: the (query × k) hit list is tiny, so it BROADCASTS
    back onto the corpus — one map-only pass projects snippets; the
    corpus text never shuffles and non-hit docs never materialize."""
    top = bm25_topk(docs, queries, k, id_col=id_col, text_col=text_col)
    probe = (queries
             .select("query_id", F.split("terms", " ")[0].alias("__t"))
             .join(top, "query_id"))
    return (docs.join(F.broadcast(probe), id_col)
            .selectExpr(
                "query_id", "rank", id_col,
                f"substring({text_col}, "
                f"greatest(locate(__t, {text_col}) - {width}, 1), "
                f"{2 * width}) AS snippet"))
