"""Corpus governance: composition reports, leakage-safe splits, soft
de-duplication weighting, soft-404 detection, inbound anchor terms.

The dataset-curation layer that sits ON TOP of extraction and dedup:
before a 100 TB corpus ships to training, its owners need to know what
is in it (per-site token share, concentration), split it without
host-level train/test leakage, downweight rather than drop duplicates
(soft dedup — "SoftDedup"-style per-copy 1/n weights keep the corpus
distribution while removing the duplication gradient bias), and drop
crawl debris that extraction alone cannot see (soft-404 pages: HTTP 200
responses whose *content* is an error page).

Scale shape shared by everything here: the corpus-scale pass is one
map-only projection (regdom / md5 / kernel extract); every aggregate is
keyed by a host-level or fingerprint-level key whose cardinality is
orders of magnitude below the row count, so the shuffles move tiny
projections and the document text never rides any of them. All outputs
are integer-exact (ppm shares via BIGINT DIV) so the DuckDB oracle
replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftsoup_spark.ops.mixing import bucket1000, bucket1000_sql
from swiftsoup_spark.ops.urlnorm import registered_domain, registered_domain_sql

__all__ = ["corpus_composition", "corpus_composition_sql",
           "split_by_host", "split_by_host_sql",
           "softdedup_weights", "softdedup_weights_sql",
           "soft404_flags"]

PPM = 1_000_000


def corpus_composition(df, url_col: str = "url", text_col: str = "text"):
    """Per-registered-domain composition report:
    (regdom, n_docs, n_tokens, token_share_ppm, rank, cum_share_ppm).

    The "what is actually in this corpus" table — token share per site
    owner (PSL registered domain, so ``a.example.co.uk`` and
    ``b.example.co.uk`` aggregate together), plus the concentration
    curve: ``cum_share_ppm`` at rank k = how much of the corpus the k
    largest sites contribute (the usual governance question — "is 40%
    of the data three domains?").

    Integer-exact: shares are BIGINT ppm via DIV; ranks tie-break on
    regdom so the ordering is total. Scale: one map-side projection
    (regdom + token count — text never shuffles), one regdom-keyed
    aggregate, then rank/cumsum windows over the REGDOM table (~10^7
    rows where the corpus is 10^12 — driver-free but single-partition
    for the global order, fine at host scale and documented as such);
    the corpus total is a one-row aggregate broadcast back.
    """
    per = (df.select(registered_domain(F.col(url_col)).alias("regdom"),
                     F.size(F.split(F.col(text_col), " "))
                     .cast("long").alias("toks"))
           .groupBy("regdom")
           .agg(F.count("*").alias("n_docs"),
                F.sum("toks").alias("n_tokens")))
    total = per.agg(F.sum("n_tokens").alias("__total"))
    w = Window.orderBy(F.desc("n_tokens"), F.asc("regdom"))
    return (per.join(F.broadcast(total))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .withColumn("cum", F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .select("regdom", "n_docs", "n_tokens",
                    F.expr(f"n_tokens * {PPM} DIV __total")
                    .alias("token_share_ppm"),
                    "rank",
                    F.expr(f"cum * {PPM} DIV __total")
                    .alias("cum_share_ppm")))


def corpus_composition_sql(url_expr: str, table: str = "documents",
                           text_expr: str = "text") -> str:
    """DuckDB replay of :func:`corpus_composition`."""
    rd = registered_domain_sql(url_expr)
    return f"""
WITH per AS (
  SELECT {rd} AS regdom, count(*) AS n_docs,
         CAST(sum(len(string_split({text_expr}, ' '))) AS BIGINT)
           AS n_tokens
  FROM {table} GROUP BY 1),
t AS (SELECT sum(n_tokens) AS total FROM per),
r AS (SELECT regdom, n_docs, n_tokens,
             CAST(row_number() OVER
                  (ORDER BY n_tokens DESC, regdom) AS BIGINT) AS rank,
             sum(n_tokens) OVER
                 (ORDER BY n_tokens DESC, regdom
                  ROWS UNBOUNDED PRECEDING) AS cum
      FROM per)
SELECT regdom, n_docs, n_tokens,
       CAST(n_tokens * {PPM} // t.total AS BIGINT) AS token_share_ppm,
       rank,
       CAST(cum * {PPM} // t.total AS BIGINT) AS cum_share_ppm
FROM r, t
"""


def split_by_host(df, url_col: str = "url", id_col: str = "doc_id",
                  val_permille: int = 10, test_permille: int = 10):
    """Leakage-safe train/val/test assignment: the bucket comes from
    the REGISTERED DOMAIN, so every page of a site — including pages
    crawled later, mirrors under other subdomains, and near-duplicate
    site templates — lands in the same split. The complement of
    ops/mixing.split_assign (content-hash buckets stop exact-dup
    leakage; host buckets stop *site-level* leakage, the dominant
    contamination path for web eval sets). Pure map-side codegen —
    zero shuffle at any scale."""
    rd = registered_domain(F.col(url_col))
    b = bucket1000(rd)
    split = (F.when(b < test_permille, "test")
             .when(b < test_permille + val_permille, "val")
             .otherwise("train"))
    return df.select(id_col, rd.alias("regdom"),
                     b.cast("int").alias("bucket"), split.alias("split"))


def split_by_host_sql(url_expr: str, table: str = "documents",
                      id_col: str = "doc_id", val_permille: int = 10,
                      test_permille: int = 10) -> str:
    """DuckDB replay of :func:`split_by_host`."""
    rd = registered_domain_sql(url_expr)
    b = bucket1000_sql("regdom")
    return f"""
WITH r AS (SELECT {id_col}, {rd} AS regdom FROM {table}),
b AS (SELECT {id_col}, regdom, CAST({b} AS INTEGER) AS bucket FROM r)
SELECT {id_col}, regdom, bucket,
       CASE WHEN bucket < {test_permille} THEN 'test'
            WHEN bucket < {test_permille + val_permille} THEN 'val'
            ELSE 'train' END AS split
FROM b
"""


def softdedup_weights(df, text_col: str = "text", id_col: str = "doc_id"):
    """Soft de-duplication: (doc_id, n_copies, weight_ppm, is_rep).

    Instead of DROPPING duplicates (ops/dedup.exact_dedup), keep every
    copy with sampling weight 1/n — the soft-dedup scheme: corpus
    coverage is preserved while the expected gradient contribution of a
    duplicated document stays that of a single copy. ``weight_ppm`` is
    the integer-exact ppm weight (10^6 DIV n_copies); ``is_rep`` marks
    the canonical copy (min doc_id) for pipelines that want both views
    from one pass.

    Scale: project (doc_id, md5(text)) map-side — text never shuffles —
    then one fp-keyed aggregate and one fp-keyed equi join back. The
    join key is the 32-hex fingerprint, uniformly distributed, so skew
    equals true duplication skew and AQE's skew-join split handles the
    one-viral-boilerplate case."""
    fp = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
    grp = fp.groupBy("fp").agg(F.count("*").alias("n_copies"),
                               F.min(id_col).alias("__rep"))
    return (fp.join(grp, "fp")
            .select(id_col, "n_copies",
                    F.expr(f"{PPM} DIV n_copies").alias("weight_ppm"),
                    (F.col(id_col) == F.col("__rep")).alias("is_rep")))


def softdedup_weights_sql(text_expr: str, table: str = "documents",
                          id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`softdedup_weights`."""
    return f"""
WITH f AS (SELECT {id_col}, md5({text_expr}) AS fp FROM {table}),
g AS (SELECT fp, count(*) AS n_copies, min({id_col}) AS rep
      FROM f GROUP BY fp)
SELECT f.{id_col}, g.n_copies,
       CAST({PPM} // g.n_copies AS BIGINT) AS weight_ppm,
       f.{id_col} = g.rep AS is_rep
FROM f JOIN g USING (fp)
"""


# Soft-404 phrase list (lowercased substring match on the extracted
# <title>). Public folklore set — the phrases every crawler's
# soft-404 classifier starts from.
SOFT404_PHRASES = ("404", "not found", "page unavailable",
                   "no longer exists", "error")
THIN_TOKENS = 20


def soft404_sql(url_expr: str, title_expr: str, text_expr: str,
                table: str = "documents",
                thin_tokens: int = THIN_TOKENS) -> str:
    """DuckDB replay of :func:`soft404_flags` over closed-form
    title/text expressions (the caller inverts its page template)."""
    phrase = " OR ".join(
        f"contains(lower(title), '{p}')" for p in SOFT404_PHRASES)
    return f"""
WITH p AS (SELECT {url_expr} AS url, {title_expr} AS title,
                  {text_expr} AS xt FROM {table})
SELECT url, ({phrase}) AS title_404,
       CAST(CASE WHEN xt = '' THEN 0
                 ELSE len(string_split(xt, ' ')) END AS BIGINT)
         AS n_tokens,
       ({phrase}) OR (CASE WHEN xt = '' THEN 0
                           ELSE len(string_split(xt, ' ')) END)
                     < {thin_tokens} AS is_soft404
FROM p
"""


def soft404_flags(pages, thin_tokens: int = THIN_TOKENS):
    """Soft-404 detection over raw pages:
    (url, title_404, n_tokens, is_soft404).

    An HTTP-200 error page poisons extraction-based corpora silently —
    the fetch succeeded, the HTML parses, and the "content" is "Page
    not found". Flags: ``title_404`` = extracted <title> contains a
    known error phrase; thin = extracted body text under
    ``thin_tokens`` whitespace tokens; ``is_soft404`` = title hit OR
    (thin AND title non-empty error-free pages stay). Both signals come
    from the SAME kernel pass (title + text in one fused mapInArrow
    stage — no second parse), so the filter costs nothing beyond the
    extraction the pipeline already runs."""
    from swiftsoup_spark.spark.extract import extract_pages

    ex = extract_pages(pages).select("url", "title", "text")
    phrase = F.lit(False)
    for p in SOFT404_PHRASES:
        phrase = phrase | F.contains(F.lower("title"), F.lit(p))
    ntok = (F.when(F.col("text") == "", F.lit(0))
            .otherwise(F.size(F.split("text", " ")))).cast("long")
    return (ex.select("url", phrase.alias("title_404"),
                      ntok.alias("n_tokens"))
            .withColumn("is_soft404",
                        F.col("title_404")
                        | (F.col("n_tokens") < thin_tokens)))
