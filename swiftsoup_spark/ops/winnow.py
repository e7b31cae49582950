"""Winnowing document fingerprints (local substring dedup).

Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting" (SIGMOD 2003 — the MOSS algorithm, public paper): hash
every k-gram of a document, slide a window of w consecutive hashes, and
keep the minimum hash of each window (rightmost on ties). The selected
fingerprints are a *local* sample — any shared substring of length
>= k + w - 1 between two documents is GUARANTEED to produce at least one
shared fingerprint — so joining on fingerprints finds copied passages
that block-aligned span hashing (ops/dedup.duplicate_span_blocks) can
miss, with a provable detection floor instead of a stride blind spot.

Execution shape (100 TB honest):

* fingerprint selection is map-only whole-stage codegen — per row one
  higher-order ``transform`` builds the k-gram hash array and a second
  selects window minima; text never rides a shuffle. Work is
  O(len * w) per doc (the SQL form of the O(len) streaming algorithm;
  w is a small constant).
* the (doc, fingerprint) table is linear in corpus size (1/(w+1)
  expected density per the paper).
* candidate pairing is ONE equi self-join on the fingerprint hash,
  after a document-frequency prune (``2 <= df <= max_df``) that drops
  boilerplate k-grams — the standard MOSS index trick and the explicit
  skew guard: per-fingerprint join fanout is capped at max_df^2.

Tie-break and encoding: hash and position are packed into one BIGINT
``enc = hash32 * 2^24 + (2^24 - 1 - pos)`` so a single ``array_min``
yields the minimum hash with the RIGHTMOST position on ties (the
winnowing rule), identically in Spark and DuckDB. Positions are bounded
at 2^24 - 1 chars per document (16 MiB of text — beyond any sane page);
longer texts are truncated to the bound rather than wrapping.

Reference scope note: SwiftSoup has no corpus-dedup surface; this is
part of the LLM-training-data pipeline layer built on the extraction
kernel's text output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["winnow_fingerprints", "winnow_pairs", "winnow_pairs_sql"]

_B = 1 << 24  # position field width of the packed fingerprint


def _fp_array(text_col, k: int, w: int):
    """Column: distinct packed winnow fingerprints of a text column."""
    t = F.substring(text_col, 1, _B - 1)
    n = F.length(t)
    hs = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.conv(F.substring(F.md5(F.substr(t, i + 1, F.lit(k))),
                                     1, 8), 16, 10).cast("long") * _B
        + (_B - 1 - i))
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), n - k - w + 2),
        lambda j: F.array_min(F.slice(hs, j, w))))


def winnow_fingerprints(df, k: int = 16, w: int = 8,
                        id_col: str = "doc_id", text_col: str = "text"):
    """(id, fp, pos) rows: the winnow fingerprint sample of each doc.
    fp is the 32-bit k-gram hash, pos its 0-based character offset."""
    keep = df.filter(F.length(text_col) >= k + w - 1)
    enc = F.explode(_fp_array(F.col(text_col), k, w)).alias("enc")
    return (keep.select(F.col(id_col), enc)
            .select(id_col,
                    F.expr(f"enc DIV {_B}").alias("fp"),
                    (F.lit(_B - 1) - F.col("enc") % _B).alias("pos")))


def winnow_pairs(df, k: int = 16, w: int = 8, max_df: int = 8,
                 min_shared: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Candidate copied-passage pairs: docs sharing >= min_shared
    distinct winnow fingerprints, after pruning fingerprints present in
    more than max_df docs (boilerplate guard / join-skew cap).
    Returns (i, j, shared) with i < j."""
    e = (winnow_fingerprints(df, k, w, id_col, text_col)
         .select(F.col(id_col).alias("d"), "fp").distinct())
    dfreq = (e.groupBy("fp").agg(F.count("*").alias("ndocs"))
             .filter((F.col("ndocs") >= 2) & (F.col("ndocs") <= max_df))
             .select("fp"))
    ee = e.join(dfreq, "fp")
    a, b = ee.alias("a"), ee.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.d") < F.col("b.d")))
            .groupBy(F.col("a.d").alias("i"), F.col("b.d").alias("j"))
            .agg(F.count("*").alias("shared"))
            .filter(F.col("shared") >= min_shared))


def winnow_pairs_sql(k: int = 16, w: int = 8, max_df: int = 8,
                     min_shared: int = 3, table: str = "documents",
                     id_expr: str = "doc_id",
                     text_expr: str = "text") -> str:
    """DuckDB replay of :func:`winnow_pairs` — same packed-BIGINT
    min-of-window selection, df prune and self-join."""
    return f"""
WITH d AS (
  SELECT {id_expr} AS d, substr({text_expr}, 1, {_B - 1}) AS t
  FROM {table} WHERE length({text_expr}) >= {k + w - 1}
),
h AS (
  SELECT d, length(t) AS n,
         list_transform(range(0, length(t) - {k} + 1), i ->
           CAST('0x' || substr(md5(substr(t, CAST(i + 1 AS INT), {k})),
                               1, 8) AS BIGINT) * {_B}
           + ({_B - 1} - i)) AS hs
  FROM d
),
fps AS (
  SELECT d, unnest(list_distinct(list_transform(
           range(1, n - {k} - {w} + 3),
           j -> list_min(hs[CAST(j AS INT):CAST(j + {w} - 1 AS INT)]))))
         AS enc
  FROM h
),
e AS (SELECT DISTINCT d, enc // {_B} AS fp FROM fps),
keepfp AS (
  SELECT fp FROM e GROUP BY fp
  HAVING count(*) BETWEEN 2 AND {max_df}
),
ee AS (SELECT e.d, e.fp FROM e JOIN keepfp USING (fp))
SELECT a.d AS i, b.d AS j, count(*) AS shared
FROM ee a JOIN ee b ON a.fp = b.fp AND a.d < b.d
GROUP BY 1, 2 HAVING count(*) >= {min_shared}"""
