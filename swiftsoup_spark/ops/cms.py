"""Count-min sketch over corpus tokens — the heavy-hitters companion
to the HLL distinct sketch (``ops/hll.py``), built the same way:
deterministic md5 hashing so the DuckDB oracle replays every counter
bit-for-bit, and a relational construction whose only shuffle is one
partial-aggregable groupBy of small integer keys.

Sketch: d independent rows x w buckets; row r hashes a token as
``md5(token || ':' || r)`` -> first 8 hex chars -> bucket mod w (w a
power of two, 2^32 % w = 0, exactly uniform).  A token's estimated
count is min over rows of its bucket counter — >= the true count
always (collisions only ADD), within eps*N with probability 1-delta
for w = ceil(e/eps), d = ceil(ln 1/delta).  Merging sketches is
counter-wise addition: the same groupBy one level up, which is why the
counter table (not a scalar) is the operator's output.

Scale shape: tokens explode linearly; each token emits d = 4 rows of
(r, bucket) ints — the shuffle carries no strings, and map-side
combine collapses to at most d*w rows per partition regardless of
corpus size."""

from __future__ import annotations

from pyspark.sql import functions as F

D_ROWS = 4
W_BUCKETS = 256


def _bucket(token_col, r: int):
    return (F.conv(F.substring(
        F.md5(F.concat(token_col, F.lit(f":{r}"))), 1, 8), 16, 10)
        .cast("long") % W_BUCKETS)


def cms_sketch(df, text_col: str = "text"):
    """-> (r, bucket, c): the d x w counter table over whitespace
    tokens of ``text_col`` across the whole corpus."""
    words = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")).filter(
        F.col("w") != "")
    rows = None
    for r in range(D_ROWS):
        part = words.select(F.lit(r).alias("r"),
                            _bucket(F.col("w"), r).alias("bucket"))
        rows = part if rows is None else rows.unionByName(part)
    return (rows.groupBy("r", "bucket")
            .agg(F.count("*").alias("c")))


def cms_probe(df, probe_df, text_col: str = "text",
              token_col: str = "token"):
    """Point queries: -> (token, est) where est = min over rows of the
    token's bucket counter (0 when a bucket is empty). ``probe_df`` is
    small by construction -> broadcast; the sketch side is the
    :func:`cms_sketch` table (d*w rows, also tiny)."""
    sketch = cms_sketch(df, text_col)
    probes = None
    for r in range(D_ROWS):
        part = probe_df.select(
            F.col(token_col),
            F.lit(r).alias("r"),
            _bucket(F.col(token_col), r).alias("bucket"))
        probes = part if probes is None else probes.unionByName(part)
    joined = probes.join(sketch, ["r", "bucket"], "left")
    return (joined.groupBy(token_col)
            .agg(F.min(F.coalesce("c", F.lit(0))).alias("est")))


def cms_sketch_sql(table: str = "documents",
                   text_expr: str = "text") -> str:
    """DuckDB bit-exact replay of :func:`cms_sketch`."""
    parts = []
    for r in range(D_ROWS):
        parts.append(f"""
SELECT {r} AS r,
       CAST('0x' || substr(md5(w || ':{r}'), 1, 8) AS BIGINT)
         % {W_BUCKETS} AS bucket
FROM t WHERE w != ''""")
    un = " UNION ALL ".join(parts)
    return f"""
WITH t AS (SELECT unnest(string_split({text_expr}, ' ')) AS w
           FROM {table}),
b AS ({un})
SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
FROM b GROUP BY r, bucket
"""
