"""Deduplication operators: exact, MinHash(+LSH banding), n-gram Jaccard,
SimHash.

Scale notes (the 100 TB design):
  * exact: one hash-partitioned groupBy on the fingerprint — map-side
    partial aggregation, no skew (md5 keys are uniform).
  * minhash: explode(word-set) is the only row-expansion; the k min()
    aggregations combine map-side, so shuffle volume is ~k hashes per doc.
  * LSH: band-bucket join replaces the quadratic all-pairs compare; buckets
    are md5 values → uniformly distributed join keys (no salting needed).
  * jaccard verify runs only on LSH candidates.
MinHash here uses portable md5-based hash family (min over md5(word||i)),
so a DuckDB oracle can replay signatures exactly.
"""

import pandas as pd

from pyspark.sql import functions as F

K_MINHASH = 8
N_BANDS = 4  # bands of 2 rows over the 8-hash signature


def exact_dedup(df, text_col: str = "text"):
    """Representative doc per exact-duplicate group + group size."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_dupes"))
    )


def _word_set(df, text_col: str):
    return df.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"))


def minhash_signatures(df, text_col: str = "text", k: int = K_MINHASH):
    """k-permutation MinHash over the word set, portable hash family
    (min lexicographic md5(word || i))."""
    words = _word_set(df, text_col)
    aggs = [F.min(F.md5(F.concat(F.col("w"), F.lit(str(i))))).alias(f"h{i}")
            for i in range(k)]
    return words.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(df, text_col: str = "text", threshold: float = 0.5,
                      limit_ids: int | None = None):
    """Near-dup candidate pairs via LSH banding, verified with exact
    word-set Jaccard. Returns (i, j, jaccard)."""
    if limit_ids is not None:
        df = df.filter(F.col("doc_id") < limit_ids)
    sigs = minhash_signatures(df, text_col)
    bands = sigs.select(
        "doc_id",
        *[F.md5(F.concat(F.col(f"h{2*b}"), F.col(f"h{2*b+1}"))).alias(f"band{b}")
          for b in range(N_BANDS)])
    # bucket-join per band, union, distinct candidate pairs
    cand = None
    for b in range(N_BANDS):
        a = bands.select(F.col("doc_id").alias("i"), F.col(f"band{b}").alias("bk"))
        c = bands.select(F.col("doc_id").alias("j"), F.col(f"band{b}").alias("bk"))
        p = a.join(c, "bk").filter(F.col("i") < F.col("j")).select("i", "j")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    jac = jaccard_pairs_for(df, cand, text_col)
    return jac.filter(F.col("jaccard") >= threshold)


def jaccard_pairs_for(df, pairs, text_col: str = "text"):
    """Exact word-set Jaccard for given (i, j) pairs."""
    words = _word_set(df, text_col)
    sizes = df.select(
        "doc_id",
        F.size(F.array_distinct(F.split(F.col(text_col), " "))).alias("sz"))
    wi = words.select(F.col("doc_id").alias("i"), "w")
    wj = words.select(F.col("doc_id").alias("j"), "w")
    inter = (
        pairs.join(wi, "i").join(wj, ["j", "w"])
        .groupBy("i", "j").agg(F.count("*").alias("inter")))
    si = sizes.select(F.col("doc_id").alias("i"), F.col("sz").alias("si"))
    sj = sizes.select(F.col("doc_id").alias("j"), F.col("sz").alias("sj"))
    return (
        inter.join(si, "i").join(sj, "j")
        .select("i", "j",
                F.round(F.col("inter") / (F.col("si") + F.col("sj") - F.col("inter")), 6)
                 .alias("jaccard")))


def ngram_jaccard_pairs(df, text_col: str = "text", threshold: float = 0.5,
                        limit_ids: int = 200):
    """All-pairs word-set Jaccard over a bounded id range (the exact
    baseline the LSH path approximates)."""
    df = df.filter(F.col("doc_id") < limit_ids)
    words = _word_set(df, text_col)
    sizes = df.select(
        "doc_id",
        F.size(F.array_distinct(F.split(F.col(text_col), " "))).alias("sz"))
    wi = words.select(F.col("doc_id").alias("i"), "w")
    wj = words.select(F.col("doc_id").alias("j"), "w")
    inter = (
        wi.join(wj, "w").filter(F.col("i") < F.col("j"))
        .groupBy("i", "j").agg(F.count("*").alias("inter")))
    si = sizes.select(F.col("doc_id").alias("i"), F.col("sz").alias("si"))
    sj = sizes.select(F.col("doc_id").alias("j"), F.col("sz").alias("sj"))
    return (
        inter.join(si, "i").join(sj, "j")
        .withColumn("jaccard",
                    F.round(F.col("inter") / (F.col("si") + F.col("sj") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("i", "j", "jaccard"))


def simhash(df, text_col: str = "text", bits: int = 64):
    """64-bit SimHash over the word multiset (Pandas-UDF path: bit-level
    accumulation isn't relational). Arrow-batched, hash = md5-derived."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for t in texts:
            acc = [0] * bits
            for w in (t or "").split(" "):
                h = int.from_bytes(
                    hashlib.md5(w.encode("utf-8")).digest()[:8], "big")
                for b in range(bits):
                    acc[b] += 1 if (h >> b) & 1 else -1
            v = 0
            for b in range(bits):
                if acc[b] > 0:
                    v |= 1 << b
            # to signed 64-bit
            if v >= 1 << 63:
                v -= 1 << 64
            out.append(v)
        return pd.Series(out)

    return df.select("doc_id", _simhash(F.col(text_col)).alias("simhash"))
