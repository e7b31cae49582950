"""Cross-document line-dedup gates (ops/dedup.py line_frequency /
remove_boilerplate_lines — the CCNet-style corpus boilerplate pass).

1. Planted boilerplate (a footer line shared by many docs) is removed
   from every document; unique lines survive in original order.
2. Whitespace normalization: differently-spaced copies of a line count
   as the same line.
3. A line repeated WITHIN one doc counts that doc once (distinct-doc
   frequency), and removal drops all its in-doc occurrences.
4. Fully-boilerplate documents rebuild to the empty string.
5. Empty/blank lines are never dedup candidates.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops import dedup as D  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="line-dedup-test")


FOOTER = "copyright example corp all rights reserved"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"unique body line {i}\n{FOOTER}") for i in range(8)]
    rows.append((100, f"first\n\ncookie  banner\ncookie banner\nlast"))
    rows.append((101, "cookie banner\nmore text 101"))
    rows.append((102, "cookie\tbanner\nmore text 102"))
    rows.append((103, FOOTER))
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_frequency_counts_distinct_docs(spark, corpus):
    from pyspark.sql import functions as F
    freq = {r["line_key"]: r["n_docs"]
            for r in D.line_frequency(corpus).collect()}
    key = (corpus.limit(1)
           .select(F.md5(F.lit(FOOTER)).alias("k")).collect()[0]["k"])
    assert freq[key] == 9           # docs 0..7 and 103
    banner = (corpus.limit(1)
              .select(F.md5(F.lit("cookie banner")).alias("k"))
              .collect()[0]["k"])
    assert freq[banner] == 3        # 100 (counted once), 101, 102


def test_removal_and_order(spark, corpus):
    out = {r["doc_id"]: r for r in
           D.remove_boilerplate_lines(corpus, max_docs=2).collect()}
    for i in range(8):
        assert out[i]["text_clean"] == f"unique body line {i}"
        assert out[i]["n_removed"] == 1
    # doc 100: both banner spellings removed, blank line kept, order kept
    assert out[100]["text_clean"] == "first\n\nlast"
    assert out[100]["n_removed"] == 2
    assert out[103]["text_clean"] == ""
    assert out[103]["n_removed"] == 1


def test_threshold_is_strict(spark, corpus):
    # max_docs=9: footer appears in exactly 9 docs -> NOT boilerplate
    out = {r["doc_id"]: r for r in
           D.remove_boilerplate_lines(corpus, max_docs=9).collect()}
    assert out[0]["text_clean"].endswith(FOOTER)


def test_blank_lines_never_candidates(spark):
    docs = spark.createDataFrame(
        [(i, f"\n\nreal {i}\n\n") for i in range(10)],
        "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in
           D.remove_boilerplate_lines(docs, max_docs=1).collect()}
    assert out[0]["text_clean"] == "\n\nreal 0\n\n"
    assert out[0]["n_removed"] == 0
