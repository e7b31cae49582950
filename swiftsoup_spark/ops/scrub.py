"""Unicode scrubbing: strip invisible/control characters, normalize
exotic spaces — the standard pre-tokenization cleanup pass.

Crawled text is full of zero-width characters (ZWSP/ZWNJ/ZWJ/word
joiner), soft hyphens, stray BOMs, C0/C1 controls, and typographic
space variants; left in place they fragment tokens and poison dedup
keys. Both regexes are ONE shared pattern string rendered to Spark SQL
(Java regex) and DuckDB (RE2) — the ``\\x{...}`` class syntax is common
to both dialects, so the oracle replays the exact transform
(same dual-dialect codegen pattern as ops/urlnorm.py).

Scale shape: two ``regexp_replace`` calls, pure JVM whole-stage
codegen — zero Python, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["scrub_text", "REMOVE_CLASS", "SPACE_CLASS", "scrub_sql"]

# zero-width + soft hyphen + BOM/word-joiner + C0 (minus \t\n) + C1
REMOVE_CLASS = (
    r"[\x{200B}-\x{200D}\x{00AD}\x{FEFF}\x{2060}"
    r"\x{0000}-\x{0008}\x{000B}-\x{001F}\x{007F}-\x{009F}]"
)
# NBSP + en/em/thin/hair spaces + narrow NBSP + medium math + ideographic
SPACE_CLASS = r"[\x{00A0}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]"


def scrub_text(df, text_col: str = "text", out_col: str = "text_scrubbed",
               count_col: str = "n_removed"):
    """Append ``out_col`` (scrubbed text) and ``count_col`` (number of
    characters deleted outright; space normalization is length-neutral
    and not counted)."""
    removed = F.regexp_replace(F.col(text_col), REMOVE_CLASS, "")
    return df.withColumn(
        count_col,
        (F.length(F.col(text_col)) - F.length(removed)).cast("int")
    ).withColumn(out_col, F.regexp_replace(removed, SPACE_CLASS, " "))


def scrub_sql(text_expr: str) -> str:
    """The identical transform as a DuckDB SQL expression."""
    return (f"regexp_replace(regexp_replace({text_expr}, "
            f"'{REMOVE_CLASS}', '', 'g'), '{SPACE_CLASS}', ' ', 'g')")
