"""Deterministic Bloom-filter membership over a key column.

The crawl-side "have we already fetched this url" / "is this doc in the
index" check: at 10^12 keys an exact semi-join against the full key set
is a corpus-scale shuffle, while a Bloom filter is a few KB..GB of bits
that BROADCASTS — the probe side stays a map-only scan. This module
builds the bit array WITH AGGREGATES (bit_or over shifted words), so
the build is one linear pass + one tiny groupBy, and probes it with a
broadcast join — no driver-side set, no UDF.

Determinism contract (the reason this is oracle-gated): positions come
from md5 hex digits — ``pos_i = int(md5(key)[3i .. 3i+3), 16)`` — so
m is fixed at 16^3 = 4096 bits per digit-triple and the SAME bit array
falls out of any engine. 32-bit words keep every shift below the
signed-64 overflow line. False positives are a property of the
PARAMETERS, not the engine: the oracle replays them bit-for-bit.

Sizing at scale: one triple of hex digits per hash caps m at 4096;
production sizing concatenates more digits (6 digits = 16M bits) —
``digits_per_pos`` is the knob; the structure is unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DIGITS = 3                      # 3 hex digits -> m = 4096 bits
M_BITS = 16 ** DIGITS
N_HASH = 2
WORD = 32


def _positions(key_col):
    """N_HASH bit positions from disjoint md5 hex-digit windows."""
    h = F.md5(key_col.cast("string"))
    return [F.conv(F.substring(h, 1 + i * DIGITS, DIGITS), 16, 10)
             .cast("long") for i in range(N_HASH)]


def bloom_build(keys_df, key_col: str):
    """-> (word:int, bits:bigint): the non-zero 32-bit words of the
    filter. One explode (N_HASH rows/key) + one ≤m/32-group bit_or."""
    pos = F.explode(F.array(*_positions(F.col(key_col)))).alias("p")
    return (keys_df.select(pos)
            .select(F.floor(F.col("p") / WORD).cast("int").alias("word"),
                    F.expr(f"shiftleft(1L, cast(p % {WORD} as int))")
                    .alias("b"))
            .groupBy("word").agg(F.expr("bit_or(b)").alias("bits")))


def bloom_probe(df, key_col: str, bloom_df):
    """-> df + (bloom_positive:boolean). The filter (≤128 rows here,
    ≤m/32 in general) is broadcast; the probe explodes each key to its
    N_HASH (word, bit) lookups and requires ALL to be set."""
    pos = F.explode(F.array(*_positions(F.col(key_col)))).alias("p")
    probes = (df.select(key_col, pos)
              .select(key_col,
                      F.floor(F.col("p") / WORD).cast("int").alias("word"),
                      F.expr(f"shiftleft(1L, cast(p % {WORD} as int))")
                      .alias("b")))
    hit = (probes.join(F.broadcast(bloom_df), "word", "left")
           .select(key_col,
                   (F.coalesce(F.col("bits"), F.lit(0))
                    .bitwiseAND(F.col("b")) != 0).alias("h")))
    return hit.groupBy(key_col).agg(F.expr("bool_and(h)").alias("bloom_positive"))


def bloom_sql(keys_sql: str, probe_sql: str, key: str = "k") -> str:
    """DuckDB replay: same positions, same words, same bit_or."""
    pos_exprs = ", ".join(
        f"CAST('0x' || substr(md5(CAST({key} AS VARCHAR)), "
        f"{1 + i * DIGITS}, {DIGITS}) AS BIGINT)" for i in range(N_HASH))
    return f"""
WITH seen AS ({keys_sql}),
sp AS (SELECT unnest([{pos_exprs}]) AS p FROM seen),
bloom AS (SELECT CAST(p // {WORD} AS INT) AS word,
                 bit_or(1::BIGINT << CAST(p % {WORD} AS INT)) AS bits
          FROM sp GROUP BY 1),
probe AS ({probe_sql}),
pp AS (SELECT {key}, unnest([{pos_exprs}]) AS p FROM probe),
ph AS (SELECT {key}, CAST(p // {WORD} AS INT) AS word,
              1::BIGINT << CAST(p % {WORD} AS INT) AS b FROM pp),
hits AS (SELECT ph.{key},
                (coalesce(bloom.bits, 0) & ph.b) <> 0 AS h
         FROM ph LEFT JOIN bloom USING (word))
SELECT {key}, bool_and(h) AS bloom_positive FROM hits GROUP BY {key}
"""
