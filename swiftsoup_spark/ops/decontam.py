"""Benchmark n-gram decontamination for training-data pipelines.

The standard pre-training hygiene step (GPT-3 appendix C / C4 / Dolma
style): a document is *contaminated* if it contains any word n-gram that
also appears in a held-out benchmark/eval set. At corpus scale the
benchmark side is tiny (a few million n-grams at most) and the document
side is the 100 TB corpus, so the only sane plan is:

  1. normalize + shingle the BENCHMARK side, distinct its n-gram hashes
     (a small table — broadcast it);
  2. shingle the document side the same way and probe the broadcast set
     with an equi join — documents stream through their scan partitions,
     nothing document-sized ever shuffles;
  3. one (doc_id)-keyed aggregate counts matched shingles (map-side
     partial combine; rows surviving the broadcast probe are the rare
     contaminated ones, so this shuffle is a trickle).

Everything is built from JVM-side functions (split / transform / slice /
xxhash64) — no Python in the path — and every step has a closed-form
DuckDB replay, so the whole operator is oracle-gated end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _norm(col):
    """Shared normalization: lowercase, collapse whitespace runs."""
    return F.trim(F.regexp_replace(F.lower(col), "[ \\t\\n\\r]+", " "))


def _ngrams(col, n: int):
    """All word ``n``-grams of a text column as an array of strings.
    Guarded for short texts: Spark's ``sequence(1, 0)`` counts DOWN, so
    docs with fewer than ``n`` words must short-circuit to an empty
    array instead."""
    from swiftsoup_spark.ops.hof import with_array

    # the split array is BOUND as a lambda variable (ops/hof.py): a
    # closure over the computed split would re-evaluate it per n-gram
    return with_array(
        F.split(_norm(col), " "),
        lambda w: F.when(F.size(w) >= n, F.transform(
            F.sequence(F.lit(1), F.size(w) - n + 1),
            lambda i: F.array_join(F.slice(w, i, n), " "))
        ).otherwise(F.array().cast("array<string>")))


def benchmark_ngram_set(bench_df, n: int = 8, text_col: str = "text"):
    """Distinct hashed n-grams of the benchmark set: (gram_hash) —
    the small side of the probe. Distinct here keeps the broadcast
    minimal and makes per-doc hit counts well-defined."""
    return (bench_df
            .select(F.explode(_ngrams(F.col(text_col), n)).alias("gram"))
            .select(F.xxhash64("gram").alias("gram_hash"))
            .distinct())


def contamination(docs_df, bench_df, n: int = 8, text_col: str = "text"):
    """Per-document contamination stats vs a benchmark set.

    Returns (doc_id, n_grams, n_hits, contaminated) for EVERY document:
    ``n_grams`` = this doc's distinct n-gram count, ``n_hits`` = how many
    of them appear in the benchmark, ``contaminated`` = n_hits > 0.

    Plan shape (asserted in tests/test_decontam.py): ONE pass builds the
    shingle array (the expensive string work happens once), explodes it,
    LEFT-probes the broadcast benchmark set, and a single doc_id-keyed
    aggregate counts both grams and hits from the same rows. The join
    back to the full doc list only restores docs with < n words (zero
    grams — nothing exploded), and carries bare doc_ids. Text never
    rides a shuffle.
    """
    grams = (docs_df
             .select("doc_id",
                     F.explode(F.array_distinct(
                         _ngrams(F.col(text_col), n))).alias("gram"))
             .select("doc_id", F.xxhash64("gram").alias("gram_hash")))
    bench = F.broadcast(benchmark_ngram_set(bench_df, n, text_col)
                        .withColumn("__hit", F.lit(1)))
    per = (grams.join(bench, "gram_hash", "left")
           .groupBy("doc_id")
           .agg(F.count("*").cast("int").alias("n_grams"),
                F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits")))
    return (docs_df.select("doc_id").join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0).cast("int")
                     .alias("contaminated")))


def decontaminate(docs_df, bench_df, n: int = 8, text_col: str = "text"):
    """The filter itself: documents with zero benchmark n-gram overlap.
    Same broadcast-probe plan; the anti side never materializes hit
    counts it doesn't need."""
    grams = (docs_df
             .select("doc_id",
                     F.explode(_ngrams(F.col(text_col), n)).alias("gram"))
             .select("doc_id", F.xxhash64("gram").alias("gram_hash")))
    bench = F.broadcast(benchmark_ngram_set(bench_df, n, text_col))
    dirty = grams.join(bench, "gram_hash").select("doc_id").distinct()
    return docs_df.join(dirty, "doc_id", "left_anti")


def ngram_sql(text_expr: str, n: int) -> str:
    """DuckDB replay of :func:`_ngrams` (shared by oracle builders)."""
    norm = (f"trim(regexp_replace(lower({text_expr}), "
            f"'[ \\t\\n\\r]+', ' ', 'g'))")
    w = f"string_split({norm}, ' ')"
    return (f"list_transform(generate_series(1, len({w}) - {n} + 1), "
            f"i -> array_to_string(({w})[i:i+{n - 1}], ' '))")
