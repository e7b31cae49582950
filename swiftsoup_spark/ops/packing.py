"""Sequence packing — the last hop from chunked text to training
shards: concatenate each shard's token stream in a deterministic order
and cut it into fixed-length sequences (GPT-style pack-and-split; a
chunk may straddle a sequence boundary, recorded via first/last
sequence indexes).

Shard assignment is the url/doc-hash bucket (md5, engine-identical);
within a shard the order is (doc_id, chunk_idx) — so the layout is a
pure function of the data, reproducible across runs, partitionings and
engines, and the DuckDB oracle replays it with the same window sum.

Scale: one hash-partitioned window per shard (the sort IS the packing
cost — shard-parallel, each shard sorts only its own chunk metadata,
never the text); everything else is map-side arithmetic. Shards are
sized so one shard's metadata fits an executor (the usual 10^3-10^4
shards at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def shard_of(col, n_shards: int):
    """Deterministic md5 shard bucket of a column (engine-identical)."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
            .cast("int") % n_shards)


def pack_chunks(chunks_df, seq_len: int = 1024, n_shards: int = 8,
                id_col: str = "doc_id"):
    """(doc_id, chunk_idx, n_tokens) -> per-chunk packed layout:
    (shard, doc_id, chunk_idx, start_tok, seq_first, seq_last)."""
    df = chunks_df.withColumn("shard", shard_of(F.col(id_col), n_shards))
    w = (Window.partitionBy("shard")
         .orderBy(id_col, "chunk_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("s")
    df = df.withColumn("start_tok", start)
    return df.select(
        "shard", id_col, "chunk_idx",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.floor(F.col("start_tok") / seq_len).cast("int")
        .alias("seq_first"),
        F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / seq_len)
        .cast("int").alias("seq_last"))


def pack_chunks_sql(chunks_cte: str, seq_len: int = 1024,
                    n_shards: int = 8) -> str:
    """DuckDB replay over a CTE selecting (doc_id, chunk_idx,
    n_tokens)."""
    return f"""
WITH chunks_src AS ({chunks_cte}),
sh AS (SELECT *,
              CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                        AS INTEGER) % {n_shards} AS INTEGER) AS shard
       FROM chunks_src),
c AS (SELECT *,
             SUM(n_tokens) OVER (PARTITION BY shard
                                 ORDER BY doc_id, chunk_idx
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
             AS start_tok
      FROM sh)
SELECT shard, doc_id, chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(floor(start_tok / {seq_len}) AS INTEGER) AS seq_first,
       CAST(floor((start_tok + n_tokens - 1) / {seq_len}) AS INTEGER)
       AS seq_last
FROM c
"""
