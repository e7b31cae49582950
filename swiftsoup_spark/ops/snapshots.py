"""Latest-capture-per-URL snapshot dedup.

Common-Crawl-style tables carry MULTIPLE captures of the same url
across crawl snapshots (the north-rule input is ``(url, warc_ts, html,
text, lang)``); nearly every downstream stage wants exactly one row per
url — the newest capture. This is the canonical "argmax per key"
pattern done the scale-safe way:

* ONE ``groupBy(url).agg(max(struct(ts, payload...)))`` — struct max
  compares fields left-to-right, so the newest ``ts`` wins and payload
  columns break ties deterministically (lexicographic), making the
  output bit-identical across partitionings;
* ``max`` is partial-aggregable: every map task keeps at most one
  payload per url locally, so old captures are discarded BEFORE the
  shuffle — the wire carries ~one row per (url, map partition), never
  the full capture history. No window sort, no row_number, no second
  join back.

Also ships the deterministic capture synthesizer used by the driver
query (1 + doc_id % 3 captures per url, versioned content) so the
DuckDB oracle is closed-form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["latest_snapshot", "synth_captures"]


def synth_captures(docs_df):
    """(url, ts_epoch, content): 1 + doc_id % 3 captures per url with
    strictly increasing timestamps; capture c carries content
    'v{c} {text}' so the winner is recognizable."""
    from swiftsoup_spark.spark.pages import TS0, URL_SQL
    return (docs_df
            .select("doc_id", "text",
                    F.expr(URL_SQL).alias("url"),
                    F.explode(F.sequence(
                        F.lit(0),
                        (F.col("doc_id") % 3).cast("int"))).alias("c"))
            .select("url",
                    (F.lit(TS0) + F.col("doc_id") * 10 + F.col("c"))
                    .cast("long").alias("ts_epoch"),
                    F.concat(F.lit("v"), F.col("c").cast("string"),
                             F.lit(" "), F.col("text")).alias("content")))


def latest_snapshot(df, key_cols=("url",), ts_col: str = "ts_epoch",
                    payload_cols=("content",)):
    """One row per key: the capture with the max ``ts_col`` (payload
    columns break timestamp ties deterministically)."""
    s = F.max(F.struct(ts_col, *payload_cols)).alias("s")
    return (df.groupBy(*key_cols).agg(s)
            .select(*key_cols,
                    F.col(f"s.{ts_col}").alias(ts_col),
                    *[F.col(f"s.{p}").alias(p) for p in payload_cols]))
