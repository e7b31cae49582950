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
    """Cheap language SIGNAL (CJK char presence + English-stopword
    hits) — kept as the fast pre-filter column; actual language
    identification is :func:`lang_detect` (char-trigram + script
    model)."""
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


# --- Gopher/C4-style quality filters -----------------------------------------


def quality_gopher(df, text_col: str = "text"):
    """Line- and symbol-level quality stats in the Gopher/C4 family:
    bullet-line fraction, ellipsis-line fraction, symbol-to-word ratio
    (# and ellipses), alphabetic-word fraction, duplicate-line fraction,
    duplicate-line *character* fraction — plus the combined
    ``gopher_pass`` flag.

    Scale: entirely per-row higher-order array functions (JVM codegen,
    zero shuffle, zero Python). The duplicate-line char scan is
    O(distinct_lines x lines) per row — lines per document are dozens,
    so it stays cheap and embarrassingly parallel; the corpus-scale
    repetition stats that genuinely need grouping live in
    :func:`quality_repetition`."""
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    words = F.filter(F.split(F.col(text_col), "[ \n]"),
                     lambda w: F.length(w) > 0)
    n_words = F.size(words)
    n_bullet = F.size(F.filter(
        lines, lambda l: l.startswith("- ") | l.startswith("* ")
        | l.startswith("•")))
    n_ellipsis = F.size(F.filter(
        lines, lambda l: l.endswith("...") | l.endswith("…")))
    n_hash = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("#")))
    n_dots = (F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("...")))) / 3
    symbol_ratio = (n_hash + n_dots) / n_words
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    dup_lines = n_lines - F.size(F.array_distinct(lines))
    dup_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0),
        lambda acc, d: acc + F.when(
            F.size(F.filter(lines, lambda x: x == d)) > 1,
            F.length(d) * F.size(F.filter(lines, lambda x: x == d)))
            .otherwise(F.lit(0)))
    n_chars = F.length(F.col(text_col))
    bullet_frac = n_bullet / n_lines
    ellipsis_frac = n_ellipsis / n_lines
    alpha_frac = n_alpha / n_words
    dup_line_frac = dup_lines / n_lines
    dup_char_frac = dup_chars / n_chars
    gopher_pass = ((n_words >= 50) & (n_words <= 100000)
                   & (symbol_ratio < 0.1) & (bullet_frac < 0.9)
                   & (ellipsis_frac < 0.3) & (alpha_frac > 0.8)
                   & (dup_line_frac < 0.3))

    def e6(c):
        return F.round(c * 1000000).cast("long")

    return df.select(
        "doc_id",
        n_lines.alias("n_lines"), n_words.alias("n_words"),
        e6(symbol_ratio).alias("symbol_ratio_e6"),
        e6(bullet_frac).alias("bullet_frac_e6"),
        e6(ellipsis_frac).alias("ellipsis_frac_e6"),
        e6(alpha_frac).alias("alpha_frac_e6"),
        e6(dup_line_frac).alias("dup_line_frac_e6"),
        e6(dup_char_frac).alias("dup_char_frac_e6"),
        gopher_pass.cast("int").alias("gopher_pass"),
    )


def quality_repetition(df, text_col: str = "text"):
    """Corpus-scale repetition stats: per doc, the most-frequent word's
    share of all words (Gopher's top-n-gram fraction at n=1) and its
    word. Explode -> two partial-aggregated groupBys (linear, map-side
    combines, shuffle keyed by (doc_id, word) then doc_id — no quadratic
    per-row scan, so it holds at 100 TB where documents can be MBs).
    Ties break lexicographically smaller word first (deterministic)."""
    words = (df.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col(text_col), "[ \n]"),
                           lambda w: F.length(w) > 0)).alias("w")))
    counts = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    # min(struct(-c, w)) = highest count, then lexicographically smallest
    # word — a partial-aggregable argmax (no window sort needed)
    top = (counts.groupBy("doc_id")
           .agg(F.min(F.struct((-F.col("c")).alias("negc"),
                               F.col("w"))).alias("t"),
                F.sum("c").alias("n_words"))
           .select("doc_id",
                   F.col("t.w").alias("top_word"),
                   (-F.col("t.negc")).alias("top_count"),
                   "n_words",
                   F.round((-F.col("t.negc")) * 1000000 / F.col("n_words"))
                    .cast("long").alias("top_word_frac_e6")))
    return top


# --- language identification -------------------------------------------------
#
# Two-stage detector, all JVM-side (whole-stage codegen, no Python):
#   1. script short-circuit — explicit code-point ranges (identical
#      literals in Java regex and RE2, so the DuckDB oracle replays them
#      exactly): kana => ja, hangul => ko, han => zh, cyrillic => ru,
#      greek => el, by script-char fraction of the text;
#   2. Latin path — characteristic-trigram scoring: per language, score
#      = regexp_count of the language's trigram ALTERNATION over the
#      space-padded lowercased text (leftmost-first non-overlapping scan
#      — identical semantics in Java regex and RE2); argmax wins, ties
#      break alphabetically, all-zero => 'und'.
#
# Scoring reads only the first ``sample_chars`` characters (langid needs
# ~hundreds of chars; MB-sized documents must not cost MBs of scanning)
# and uses ONE compiled regex per language instead of per-trigram
# replace-deltas — the r3 formulation expanded to ~72 replace calls,
# blowing Janino's 64 KB method limit and silently dropping the whole
# stage to interpreted mode (measured 10x slower at sf0.1).
#
# Replaces the r3 lang_signal toy (4 stopwords + CJK regex) with a real
# char-n-gram model while keeping the closed-form oracle property: every
# operation here is expressible verbatim in ANSI SQL.

LANG_TRIGRAMS = {
    "en": [" th", "the", "he ", " an", "nd ", "ing", " of", " to", "ed ",
           " in", "ion", " is"],
    "es": [" la", "la ", " el", "el ", "ión", "ció", " lo", "los", " es",
           "sta", " un", "una"],
    "fr": [" le", "le ", " et", "et ", "ent", "ait", "eur", "des", " un",
           "ux ", "est", " il"],
    "de": ["der", "ie ", "die", "und", " un", "sch", "ein", "ich", "cht",
           "en ", " ge", " di"],
    "it": [" di", "di ", "che", " ch", "il ", " il", "lla", "zio", "one",
           " pe", "per", "to "],
    "pt": ["ão ", "ção", " da", "da ", " do", "do ", "os ", " os", "em ",
           " em", " um", "uma"],
}

# (lang, code-point class, min script-char fraction); order matters — kana
# before han so Japanese text (which mixes both) resolves ja first.
LANG_SCRIPTS = [
    ("ja", "[ぁ-ヿ]", 0.05),
    ("ko", "[가-힣]", 0.30),
    ("zh", "[一-鿿]", 0.30),
    ("ru", "[Ѐ-ӿ]", 0.30),
    ("el", "[Ͱ-Ͽἀ-῿]", 0.30),
]


def lang_detect(df, text_col: str = "text", keep=("doc_id",),
                sample_chars: int = 1000):
    """Char-trigram + script language-ID. Returns (*keep, lang_pred,
    top_score) with top_score the winning trigram-alternation count (0
    on the script path and for 'und').

    Scale: pure per-row string expressions over the first
    ``sample_chars`` chars — 6 compiled trigram-alternation counts and
    5 script-range scans in one codegen stage; no shuffle, no Python,
    no broadcast state beyond plan literals."""
    t = F.concat(F.lit(" "),
                 F.lower(F.substring(F.col(text_col), 1, sample_chars)),
                 F.lit(" "))
    n = F.length(t)

    def script_frac(cls):
        return (n - F.length(F.regexp_replace(t, cls, ""))) / n

    scores = {
        lang: F.regexp_count(t, F.lit("(?:" + "|".join(tris) + ")"))
        for lang, tris in LANG_TRIGRAMS.items()
    }
    mx = F.greatest(*scores.values())
    latin = F.when(mx <= 0, F.lit("und"))
    for lang in sorted(LANG_TRIGRAMS):
        latin = latin.when(scores[lang] == mx, F.lit(lang))
    latin = latin.otherwise(F.lit("und"))

    pred = F.when(F.col(text_col).isNull() | (F.length(text_col) == 0),
                  F.lit("und"))
    for lang, cls, thr in LANG_SCRIPTS:
        pred = pred.when(script_frac(cls) > thr, F.lit(lang))
    pred = pred.otherwise(latin)

    return df.select(
        *keep,
        pred.alias("lang_pred"),
        F.when(pred.isin(list(LANG_TRIGRAMS)), mx).otherwise(F.lit(0))
         .cast("long").alias("top_score"),
    )


def lang_detect_oracle_exprs(text_expr: str = "text",
                             sample_chars: int = 1000):
    """The exact ANSI-SQL replay of :func:`lang_detect` (single source of
    truth: generated from the same LANG_TRIGRAMS / LANG_SCRIPTS tables).
    Returns (pred_sql, score_sql) scalar expressions over ``text_expr``."""
    t = f"(' ' || lower(substr({text_expr}, 1, {sample_chars})) || ' ')"
    score = {
        lang: ("len(regexp_extract_all("
               f"{t}, '(?:" + "|".join(tris) + ")'))")
        for lang, tris in LANG_TRIGRAMS.items()
    }
    mx = "greatest(" + ", ".join(f"({s})" for s in score.values()) + ")"
    latin = f"CASE WHEN {mx} <= 0 THEN 'und' "
    for lang in sorted(LANG_TRIGRAMS):
        latin += f"WHEN ({score[lang]}) = {mx} THEN '{lang}' "
    latin += "ELSE 'und' END"
    pred = (f"CASE WHEN {text_expr} IS NULL OR length({text_expr}) = 0 "
            f"THEN 'und' ")
    for lang, cls, thr in LANG_SCRIPTS:
        frac = (f"(length({t}) - length(regexp_replace({t}, '{cls}', '', 'g')))"
                f" * 1.0 / length({t})")
        pred += f"WHEN {frac} > {thr} THEN '{lang}' "
    pred += f"ELSE ({latin}) END"
    in_latin = " OR ".join(f"({pred}) = '{lg}'" for lg in sorted(LANG_TRIGRAMS))
    score_sql = (f"CAST(CASE WHEN {in_latin} THEN {mx} ELSE 0 END AS BIGINT)")
    return pred, score_sql


def fingerprint(df, text_col: str = "text"):
    """Deterministic document fingerprint (md5 of space-normalized text) —
    the exact-dedup / lineage key at corpus scale."""
    norm = F.trim(F.regexp_replace(F.col(text_col), "[ \\t\\n\\r]+", " "))
    return df.select("doc_id", F.md5(norm).alias("fp"))


# --- BPE-style pre-tokenization count ----------------------------------------

# GPT-2-ish pre-tokenizer, restricted to the RE2-safe subset shared by
# Java regex and DuckDB (no lookahead, no contraction special-cases):
# a token is an optional leading space + letter run, + digit run,
# + symbol run, or a whitespace run. \p{L}/\p{N} are Unicode general
# categories in BOTH dialects; \s is ASCII whitespace in both.
BPE_TOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(df, text_col: str = "text"):
    """Training-token budgeting needs tokenizer-shaped counts, not
    whitespace splits: "don't!" is 1 whitespace token but 4 BPE
    pre-tokens. Pure JVM regexp_extract_all — zero shuffle — and the
    identical pattern replays in DuckDB, so counts are oracle-exact.
    Returns (doc_id, n_pretokens, n_ws_tokens, pretoken_ratio_e6)."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
    n_pre = F.size(toks)
    n_ws = F.size(F.split(F.col(text_col), " "))
    return df.select(
        "doc_id",
        n_pre.alias("n_pretokens"),
        n_ws.alias("n_ws_tokens"),
        F.when(n_ws > 0,
               F.round(n_pre * 1000000 / n_ws).cast("long"))
         .otherwise(F.lit(0).cast("long")).alias("pretoken_ratio_e6"))


def quality_c4(df, text_col: str = "text", min_sentences: int = 5,
               min_words_per_line: int = 3):
    """The C4 cleaning rules (Raffel et al., "Exploring the Limits of
    Transfer Learning", §2.2) as one JVM-side pass — the other canonical
    webtext rule-set next to the Gopher stats (:func:`quality_gopher`):

    * keep only lines ending in terminal punctuation (``. ! ? "``),
    * drop lines with fewer than ``min_words_per_line`` words,
    * drop lines containing the word "javascript" (any case),
    * flag pages containing "lorem ipsum" (any case) or a curly brace,
    * require at least ``min_sentences`` sentences in the kept text.

    Returns (doc_id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
    c4_pass, text_c4) — text_c4 is the line-filtered page (the rows a
    C4-style pipeline would keep and feed to dedup), so the gate is on
    the actual cleaning output, not just counters.

    Scale: per-row higher-order array functions, zero shuffle, zero
    Python — embarrassingly parallel over the corpus scan like every
    filter in this family."""
    lines = F.split(F.col(text_col), "\n")
    n_words = (lambda l: F.size(F.filter(F.split(l, " "),
                                         lambda w: F.length(w) > 0)))
    kept = F.filter(
        lines,
        lambda l: (l.endswith(".") | l.endswith("!") | l.endswith("?")
                   | l.endswith('"'))
        & (n_words(l) >= min_words_per_line)
        & ~F.lower(l).contains("javascript"))
    text_c4 = F.array_join(kept, "\n")
    sentences = F.filter(F.split(text_c4, "[.!?]"),
                         lambda s: F.length(F.trim(s)) > 0)
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    n_sentences = F.size(sentences)
    return df.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        n_sentences.alias("n_sentences"),
        has_lorem.cast("int").alias("has_lorem"),
        has_brace.cast("int").alias("has_brace"),
        ((n_sentences >= min_sentences) & ~has_lorem & ~has_brace)
            .cast("int").alias("c4_pass"),
        text_c4.alias("text_c4"))


def top_ngram_share(df, text_col: str = "text", ns=(2, 3)):
    """Gopher's remaining repetition filters: per document, the most
    frequent word n-gram (for each n in ``ns``) and the fraction of the
    document's characters its occurrences cover (count x gram length /
    text length; overlapping occurrences may push the raw ratio past 1
    on degenerate inputs — the metric is a filter signal, not a measure).

    Returns (doc_id, n_chars, top{n}_gram, top{n}_count,
    top{n}_share_e6 for each n). Docs with fewer than n words get
    ('', 0, 0) for that n.

    Scale: ONE exploded stream tagged by n -> a (doc_id, n, gram) count
    groupBy -> a doc_id argmax groupBy using the partial-aggregable
    min(struct(-count, gram)) trick from :func:`quality_repetition` —
    two linear shuffles total for ALL n, no window sort, no quadratic
    per-row scan. Integer-exact e6 share via DIV."""
    words = F.filter(F.split(F.col(text_col), "[ \n]"),
                     lambda w: F.length(w) > 0)
    base = df.select("doc_id",
                     F.length(F.col(text_col)).alias("n_chars"),
                     words.alias("ws"))
    from swiftsoup_spark.ops.hof import with_array

    # word array bound as a lambda variable (ops/hof.py): the ws
    # projection gets CollapseProject-inlined into the lambda otherwise
    # and re-evaluated per gram. NB: the binder must take exactly ONE
    # parameter — pyspark passes (element, index) to 2-arg lambdas.
    def gram_builder(n):
        def build(ws):
            return F.when(
                F.size(ws) >= n,
                F.transform(F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                            lambda i: F.array_join(
                                F.slice(ws, i, F.lit(n)), " "))
            ).otherwise(F.array().cast("array<string>"))
        return build

    streams = []
    for n in ns:
        grams = with_array(F.col("ws"), gram_builder(n))
        streams.append(base.select(
            "doc_id", F.lit(n).alias("n"),
            F.explode(grams).alias("gram")))
    tagged = streams[0]
    for s in streams[1:]:
        tagged = tagged.unionByName(s)
    counts = tagged.groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("c"))
    aggs = []
    for n in ns:
        aggs.append(F.min(F.when(F.col("n") == n,
                                 F.struct((-F.col("c")).alias("negc"),
                                          F.col("gram")))).alias(f"t{n}"))
    top = counts.groupBy("doc_id").agg(*aggs)
    out = base.select("doc_id", "n_chars").join(top, "doc_id", "left")
    cols = [F.col("doc_id"), F.col("n_chars")]
    for n in ns:
        t = F.col(f"t{n}")
        cnt = F.coalesce(-t["negc"], F.lit(0))
        gram = F.coalesce(t["gram"], F.lit(""))
        cols += [
            gram.alias(f"top{n}_gram"),
            cnt.cast("long").alias(f"top{n}_count"),
            F.coalesce(
                F.expr(f"(0 - t{n}.negc) * length(t{n}.gram) * 1000000 "
                       f"DIV n_chars"), F.lit(0))
             .cast("long").alias(f"top{n}_share_e6")]
    return out.select(*cols)


def flesch_score(df, text_col: str = "text"):
    """Flesch reading-ease per doc, integer-exact at milli-point
    precision (no float path, so the DuckDB oracle replays it
    bit-for-bit): score = 206.835 - 1.015*(words/sentences)
    - 84.6*(syllables/words), with the classic vowel-group syllable
    heuristic and [.!?]+ runs as sentence breaks.  All three counts
    ship too (they are the useful filter features; the scalar is the
    human-readable summary).

    score_e3 uses the offset-floor trick: the numerator is shifted by
    +OFF*s*w so Spark's truncating DIV equals floor division for the
    (now positive) value, matching DuckDB's ``//`` exactly even when
    the score is negative."""
    w = F.greatest(F.lit(1), F.size(F.split(F.col(text_col), " "))).cast("long")
    s = F.greatest(F.lit(1), F.size(F.expr(
        f"regexp_extract_all({text_col}, '[.!?]+', 0)"))).cast("long")
    sy = F.size(F.expr(
        f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)")).cast("long")
    base = df.select(
        "doc_id",
        w.alias("n_words"),
        s.alias("n_sentences"),
        sy.alias("n_syllables"))
    return base.select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        F.expr(
            "(206835 * n_sentences * n_words - 1015 * n_words * n_words"
            " - 84600 * n_syllables * n_sentences"
            " + 1000000000 * n_sentences * n_words)"
            " DIV (n_sentences * n_words) - 1000000000")
        .cast("long").alias("flesch_e3"))


def char_entropy(df, text_col: str = "text"):
    """Character-distribution entropy quality signal, bit-length
    quantized so both engines replay it exactly.

    The compression-ratio / entropy filter family (Gopher drops docs
    whose bytes compress too well — keyboard mash, repeated tokens,
    binary junk all have skewed char distributions): per document,

        H_q = sum over distinct chars c of  cnt_c * (bits(N) - bits(cnt_c))

    with ``bits(x)`` = floor(log2 x) + 1 (base-2 digit count — the
    repo-wide no-libm log), N = char count. ``bits(N) - bits(cnt)`` is
    within ±1 bit of log2(N/cnt), so ``entropy_milli = 1000 * H_q DIV
    N`` is a monotone integer proxy for Shannon entropy in millibits
    per char: near 0 for single-char spam, high for diverse text.
    Output (doc_id, n_chars, n_distinct, entropy_milli) for every doc
    (empty docs score all zeros).

    Scale shape: explode to one row per char, then TWO hash
    aggregations — (doc_id, ch) count and a doc_id rollup. The
    exploded rows never leave their stage: partial aggregation
    collapses them to at most |alphabet| rows per doc (≲200 for
    webtext) before the shuffle, so shuffle volume is ~alphabet-size
    per doc and document text itself never rides the wire. The per-row
    HOF alternative (count each distinct char by scanning the array)
    is O(|alphabet| × N) compute per doc — strictly worse at scale.
    """
    chars = df.select(
        "doc_id", F.length(text_col).cast("long").alias("n"),
        F.explode(F.split(F.col(text_col), "")).alias("ch"))
    per_ch = (chars.filter(F.col("ch") != "")
              .groupBy("doc_id", "n", "ch")
              .agg(F.count("*").alias("cnt")))
    bits_n = F.length(F.conv(F.col("n").cast("string"), 10, 2))
    bits_c = F.length(F.conv(F.col("cnt").cast("string"), 10, 2))
    per_doc = (per_ch.groupBy("doc_id", "n")
               .agg(F.count("*").alias("n_distinct"),
                    F.sum(F.col("cnt") * (bits_n - bits_c))
                    .alias("hq")))
    return (df.select("doc_id").join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n", F.lit(0)).cast("long").alias("n_chars"),
                F.coalesce("n_distinct", F.lit(0)).cast("long")
                .alias("n_distinct"),
                F.coalesce(F.expr("hq * 1000 DIV n"), F.lit(0))
                .cast("long").alias("entropy_milli")))


def char_entropy_sql(table: str = "documents",
                     text_col: str = "text") -> str:
    """DuckDB replay of :func:`char_entropy` (split('') in Spark emits
    UTF-16 units; DuckDB's codepoint split differs only on non-BMP
    chars, absent from the synthetic corpus — same boundary the char
    n-gram family documents)."""
    return f"""
WITH ch AS (SELECT doc_id, length({text_col}) AS n,
                   unnest(string_split({text_col}, '')) AS ch
            FROM {table}),
pc AS (SELECT doc_id, n, ch, count(*) AS cnt
       FROM ch WHERE ch <> '' GROUP BY doc_id, n, ch),
pd AS (SELECT doc_id, n, count(*) AS n_distinct,
              SUM(cnt * (length(bin(CAST(n AS BIGINT)))
                         - length(bin(CAST(cnt AS BIGINT))))) AS hq
       FROM pc GROUP BY doc_id, n)
SELECT d.doc_id,
       CAST(coalesce(pd.n, 0) AS BIGINT) AS n_chars,
       CAST(coalesce(pd.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(coalesce(pd.hq * 1000 // pd.n, 0) AS BIGINT) AS entropy_milli
FROM {table} d LEFT JOIN pd ON d.doc_id = pd.doc_id
"""
