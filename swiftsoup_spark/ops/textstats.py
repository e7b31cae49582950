"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is JVM-side ``pyspark.sql.functions`` (whole-stage
codegen) — no Python UDFs — so every operator here has a closed-form
ANSI-SQL oracle and scales linearly with input splits (no shuffle except
the final aggregates)."""

from __future__ import annotations

from pyspark.sql import functions as F

# tiny multilingual stopword sets (public common words)
STOP_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]


def token_count(df, text_col: str = "text"):
    """Whitespace token count + char count per doc."""
    return df.select(
        "doc_id",
        F.length(text_col).alias("n_chars_m"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
    )


def quality_score(df, text_col: str = "text"):
    """Heuristic quality features: token stats, distinct ratio, stopword
    ratio (the classic Gopher/C4-style filters, expressed relationally)."""
    words = F.split(F.col(text_col), " ")
    stops = F.array([F.lit(w) for w in STOP_EN])
    n_tokens = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_stop = F.size(F.array_intersect(F.array_distinct(words), stops))
    mean_len = (F.length(text_col) - n_tokens + 1) / n_tokens
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(n_distinct / n_tokens, 6).alias("distinct_ratio"),
        n_stop.alias("n_stopword_types"),
        F.round(mean_len, 6).alias("mean_token_len"),
    )


def lang_signal(df, text_col: str = "text"):
    """n-gram/script language-ID heuristic: CJK char presence, latin ratio,
    English-stopword hits. (On the synthetic corpus this exposes the
    declared-vs-detected gap, a standard web-pipeline signal.)"""
    has_cjk = F.col(text_col).rlike("[一-鿿]")
    n_en = F.size(F.array_intersect(
        F.array_distinct(F.split(F.col(text_col), " ")),
        F.array(*[F.lit(w) for w in ("the", "a", "of", "and")])))
    return df.select(
        "doc_id", "lang",
        has_cjk.cast("int").alias("has_cjk"),
        n_en.alias("en_stopword_types"),
        F.when(has_cjk, F.lit("zh")).when(n_en >= 1, F.lit("en"))
         .otherwise(F.lit("und")).alias("lang_pred"),
    )


def fingerprint(df, text_col: str = "text"):
    """Deterministic document fingerprint (md5 of space-normalized text) —
    the exact-dedup / lineage key at corpus scale."""
    norm = F.trim(F.regexp_replace(F.col(text_col), "[ \\t\\n\\r]+", " "))
    return df.select("doc_id", F.md5(norm).alias("fp"))
