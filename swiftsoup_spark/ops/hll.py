"""HyperLogLog distinct-count sketch, bit-exact and oracle-replayable.

At 100 TB, ``approx_count_distinct`` answers one question once; a
pipeline wants the *sketch itself* — per-group registers it can
persist, merge across days, and union across shards.  This module
builds classic HLL (Flajolet et al. 2007) registers relationally:

  * hash   = md5(value) — deterministic, seed-free, so the DuckDB
    oracle replays every register byte-for-byte;
  * index  = first 12 hash bits mod m (m = 1024 = 2^10; 2^12 % 2^10
    = 0, so the mod stays exactly uniform);
  * rho    = leading-zero rank of the next 52 bits (1..52, the
    all-zero tail capped at 52 — a 2^-52 event, negligible bias);
  * M[j]   = max(rho) per (group, register): ONE partial-aggregable
    groupBy — only (group, idx, rho) ints ride the shuffle, and
    map-side combine collapses duplicates before it.

The gated output is integer-only (no float crosses the gate): V = #
registers set and S = 2^52 * Z where Z = sum_j 2^-M[j] (absent
registers contribute 2^0 = 1, i.e. 2^52 scaled).  S is exact in
BIGINT: present registers add <= 2^51 each, absent 2^52, so
S < m * 2^52 = 2^62.  The float estimate (alpha_m * m^2 / Z with the
small-range linear-counting correction) is :func:`hll_estimate`,
applied driver-side after the exact sketch — tests pin its error to
the theoretical ~1.04/sqrt(m) band.

Merging sketches = max over registers — the same groupBy one level
up, which is why the register form (not the scalar) is the operator.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

M_REGISTERS = 1024
_ALPHA = 0.7213 / (1 + 1.079 / M_REGISTERS)


def hll_registers(df, group_col: str, value_col: str):
    """-> (group_col, idx, r): the populated HLL registers per group."""
    hx = F.md5(F.col(value_col))
    idx = (F.conv(F.substring(hx, 1, 3), 16, 10).cast("long")
           % M_REGISTERS).alias("idx")
    vstr = F.conv(F.substring(hx, 4, 13), 16, 10)
    v = vstr.cast("long")
    rho = (F.when(v == 0, F.lit(52))
           .otherwise(F.lit(53) - F.length(F.conv(vstr, 10, 2)))
           .cast("int").alias("rho"))
    return (df.select(F.col(group_col), idx, rho)
            .groupBy(group_col, "idx")
            .agg(F.max("rho").alias("r")))


def hll_sketch(df, group_col: str, value_col: str):
    """-> (group_col, v_set bigint, s_scaled bigint): the integer HLL
    summary per group (see module docstring for the encoding)."""
    regs = hll_registers(df, group_col, value_col)
    present = F.expr("sum(shiftleft(CAST(1 AS BIGINT), 52 - r))")
    return (regs.groupBy(group_col)
            .agg(F.count("*").cast("long").alias("v_set"),
                 present.alias("_sp"))
            .select(group_col, "v_set",
                    (F.col("_sp")
                     + (F.lit(M_REGISTERS) - F.col("v_set"))
                     * F.lit(1 << 52).cast("long"))
                    .cast("long").alias("s_scaled")))


def hll_estimate(v_set: int, s_scaled: int, m: int = M_REGISTERS) -> float:
    """Cardinality estimate from the integer summary (driver-side)."""
    z = s_scaled / float(1 << 52)
    e = _ALPHA * m * m / z
    if e <= 2.5 * m:
        zeros = m - v_set
        if zeros:
            e = m * math.log(m / zeros)
    return e


def _hex_nibbles_sql(col: str, start: int, n: int) -> str:
    """DuckDB integer parse of n hex chars of ``col`` starting at
    1-based ``start`` (codegen, same discipline as ops/urlnorm)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({col}, {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


def hll_oracle_sql(group_expr: str, value_expr: str,
                   table: str = "documents",
                   group_alias: str = "g") -> str:
    """DuckDB replay of :func:`hll_sketch` — byte-identical registers
    via the same md5 bit slicing."""
    idx = f"({_hex_nibbles_sql('hx', 1, 3)} % {M_REGISTERS})"
    v = _hex_nibbles_sql("hx", 4, 13)
    return f"""
WITH h AS (
  SELECT {group_expr} AS g, md5({value_expr}) AS hx FROM {table}),
b AS (
  SELECT g, {idx} AS idx, {v} AS v FROM h),
r AS (
  SELECT g, idx,
         max(CASE WHEN v = 0 THEN 52
                  ELSE 53 - length(printf('%b', v)) END) AS r
  FROM b GROUP BY g, idx)
SELECT g AS {group_alias}, CAST(count(*) AS BIGINT) AS v_set,
       CAST(sum(CAST(1 AS BIGINT) << (52 - r))
            + ({M_REGISTERS} - count(*))
              * (CAST(1 AS BIGINT) << 52) AS BIGINT) AS s_scaled
FROM r GROUP BY g
"""
