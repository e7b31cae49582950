"""PII redaction for web-corpus pipelines: emails, IPv4 addresses and
phone-like digit runs replaced with typed placeholder tokens, plus
per-category match counts (the audit trail a compliance pass needs).

Everything is per-row regexp work in the RE2-compatible subset (no
lookaround, no backreference replacement), JVM-codegen on the Spark side
(``regexp_count`` / ``regexp_replace``) and replayed verbatim in DuckDB
(``len(regexp_extract_all(...))`` / ``regexp_replace(..., 'g')``) — so
the operator is oracle-gated and costs zero shuffles.

Counts are measured on the ORIGINAL text per category, independently;
replacements then apply in a fixed order (email → ipv4 → phone) so a
string can only be consumed by the earliest matching category.
Deliberately conservative patterns (documented false-negative bias):
redaction that silently eats prose is worse than leaving an odd
digit-run unredacted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")
# international-ish phone: optional +, then 9+ of digits/sep with digits
# at both ends — long enough to spare prices/years
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"

_CATEGORIES = [("email", EMAIL_RE, "<EMAIL>"),
               ("ipv4", IPV4_RE, "<IP>"),
               ("phone", PHONE_RE, "<PHONE>")]


def redact_pii(df, text_col: str = "text", keep=("doc_id",)):
    """(*keep, text_redacted, n_email, n_ipv4, n_phone)."""
    counts = [F.regexp_count(F.col(text_col), F.lit(pat))
               .alias(f"n_{name}")
              for name, pat, _ in _CATEGORIES]
    red = F.col(text_col)
    for _, pat, token in _CATEGORIES:
        red = F.regexp_replace(red, pat, token)
    return df.select(*keep, red.alias("text_redacted"), *counts)


def redact_pii_sql(text_expr: str = "text") -> str:
    """DuckDB replay of :func:`redact_pii`'s scalar expressions —
    returns the select-list fragment (redacted || counts), generated
    from the same category table."""
    red = text_expr
    for _, pat, token in _CATEGORIES:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    cols = [f"{red} AS text_redacted"]
    for name, pat, _ in _CATEGORIES:
        cols.append(f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) "
                    f"AS INTEGER) AS n_{name}")
    return ", ".join(cols)
