"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set,
compute dot products with higher-order array functions (JVM-side, no
Python), window-rank per query. Scale path: bucketed search (IVF-style
coarse partition; here the provided ``label`` is the centroid assignment)
restricts each probe to one bucket — at 10^9 vectors this turns a full
cross join into a partition-pruned join."""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(emb_df, n_queries: int = 8, k: int = 5):
    """Top-k cosine neighbors for the first ``n_queries`` vectors.
    Returns (query_id, neighbor_id, rank, sim)."""
    base = emb_df.select("vec_id", _as_double("embedding").alias("v"))
    q = (base.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv")))
    joined = base.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    sims = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _cosine(F.col("qv"), F.col("v")).alias("sim_raw"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim_raw", 4).alias("sim")))


def bucketed_topk(emb_df, n_queries: int = 8, k: int = 5, bucket_col: str = "label"):
    """IVF-style: probe only the query's bucket (nprobe=1). The join on the
    bucket key prunes to ~1/n_buckets of the corpus per query."""
    base = emb_df.select(
        "vec_id", F.col(bucket_col).alias("bucket"), _as_double("embedding").alias("v"))
    q = (base.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"), F.col("bucket").alias("qb"),
                 F.col("v").alias("qv")))
    joined = base.join(F.broadcast(q), F.col("bucket") == F.col("qb")) \
                 .filter(F.col("vec_id") != F.col("query_id"))
    sims = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _cosine(F.col("qv"), F.col("v")).alias("sim_raw"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim_raw", 4).alias("sim")))


def cosine_near_dup_pairs(emb_df, threshold: float = 0.95, limit_ids: int = 200):
    """Embedding-cosine near-duplicate pairs over a bounded id range."""
    base = (emb_df.filter(F.col("vec_id") < limit_ids)
            .select("vec_id", _as_double("embedding").alias("v")))
    a = base.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    b = base.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    return (a.crossJoin(b).filter(F.col("i") < F.col("j"))
            .select("i", "j", F.round(_cosine(F.col("va"), F.col("vb")), 4).alias("sim"))
            .filter(F.col("sim") >= threshold))
