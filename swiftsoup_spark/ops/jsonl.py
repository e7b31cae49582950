"""JSONL training-shard export — octet-exact, pure codegen.

The interchange format every LM training stack reads is JSON Lines:
one ``{"id":...,"url":...,"lang":...,"text":"..."}`` object per row.
The export is rendered with explicit string building (NOT ``to_json``)
so the byte stream is engine-independent and the DuckDB oracle replays
every line octet-for-octet — the same discipline as the WET sink
(``sources/warc.py``): key order fixed, no whitespace, escaping
defined here, ``n_octets`` counting UTF-8 bytes for shard manifests.

Escaping scope: backslash and double-quote (literal ``replace``,
backslash first), plus C0 controls flattened to a space via one
regexp — the full ``\\u00XX`` escape table is deliberately NOT
emulated; corpus text is whitespace-normalized upstream, and the
controls-to-space rule keeps every emitted line valid JSON anyway.

Scale shape: one JVM-side projection over the scan — no shuffle, no
Python, no UDF; shard assignment is a pure column so a partitioned
write (``partitionBy(shard_id)``) streams straight to the sink."""

from __future__ import annotations

from pyspark.sql import functions as F

N_SHARDS = 16


def _esc(col):
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    return F.regexp_replace(c, "[\x00-\x1f]", " ")


def jsonl_export(docs_df, url_expr=None, n_shards: int = N_SHARDS):
    """-> (doc_id, shard_id, line, n_octets). ``url_expr`` defaults to
    the synth corpus URL formula (a Column may be passed)."""
    if url_expr is None:
        from swiftsoup_spark.spark.pages import URL_SQL
        url_expr = F.expr(URL_SQL)
    line = F.concat(
        F.lit('{"id":'), F.col("doc_id").cast("string"),
        F.lit(',"url":"'), _esc(url_expr),
        F.lit('","lang":"'), _esc(F.col("lang")),
        F.lit('","text":"'), _esc(F.col("text")),
        F.lit('"}'))
    return docs_df.select(
        "doc_id",
        (F.col("doc_id") % n_shards).cast("int").alias("shard_id"),
        line.alias("line"),
        F.octet_length(line).cast("long").alias("n_octets"))


def jsonl_oracle_sql(table: str = "documents",
                     n_shards: int = N_SHARDS) -> str:
    """DuckDB octet-exact replay of :func:`jsonl_export`."""
    from swiftsoup_spark.spark.pages import URL_SQL

    bs, q = chr(92), chr(34)

    def esc(expr: str) -> str:
        # DuckDB standard strings take backslashes literally: '\' IS one
        # backslash, '"' IS one quote — no doubling inside the literal.
        s = f"replace({expr}, '{bs}', '{bs}{bs}')"
        s = f"replace({s}, '{q}', '{bs}{q}')"
        return f"regexp_replace({s}, '[{bs}x00-{bs}x1f]', ' ', 'g')"

    line = (f"'{{\"id\":' || doc_id || ',\"url\":\"' || {esc(URL_SQL)} || "
            f"'\",\"lang\":\"' || {esc('lang')} || "
            f"'\",\"text\":\"' || {esc('text')} || '\"}}'")
    return f"""
WITH j AS (SELECT doc_id, {line} AS line FROM {table})
SELECT doc_id, CAST(doc_id % {n_shards} AS INTEGER) AS shard_id, line,
       CAST(octet_length(encode(line)) AS BIGINT) AS n_octets
FROM j
"""
