"""Gopher/C4 quality-filter depth (ops/textstats.quality_gopher /
quality_repetition): semantic checks on crafted documents plus the
scale-shape plan assertions (gopher stats shuffle-free; repetition argmax
partial-aggregated, no window sort)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops import textstats as TX  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="gopher-test")


def _gopher(spark, text):
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    return TX.quality_gopher(df).collect()[0].asDict()


def test_clean_prose_passes(spark):
    text = "the quick brown fox jumps over the lazy dog near the river bank"
    text = text + "\n" + "a second line of sensible words about the trade " \
        "of goods and the long roads between towns in the old world and " \
        "the ships that carried them home again for profit and glory" \
        "\nthen a third line arrives with enough extra words to push the " \
        "document over the fifty word floor of the gopher rules"
    r = _gopher(spark, text)
    assert r["gopher_pass"] == 1
    assert r["symbol_ratio_e6"] == 0
    assert r["bullet_frac_e6"] == 0
    assert r["dup_line_frac_e6"] == 0


def test_bullet_heavy_fails(spark):
    lines = ["- item %d" % i for i in range(19)] + ["one prose line"]
    r = _gopher(spark, "\n".join(lines))
    assert r["bullet_frac_e6"] == 950000
    assert r["gopher_pass"] == 0


def test_duplicate_lines_counted_in_chars(spark):
    dup = "this exact line repeats verbatim"
    text = "\n".join([dup, "a unique line", dup, dup])
    r = _gopher(spark, text)
    assert r["n_lines"] == 4
    # 3 copies of the 32-char dup line are duplicate chars
    assert r["dup_line_frac_e6"] == 500000          # (4-2)/4
    n_chars = len(text)
    assert r["dup_char_frac_e6"] == round(3 * len(dup) / n_chars * 1e6)


def test_ellipsis_and_symbols(spark):
    text = "to be continued...\nand then...\nmore #tags ## here\nplain"
    r = _gopher(spark, text)
    assert r["ellipsis_frac_e6"] == 500000
    assert r["symbol_ratio_e6"] > 0


def test_alpha_fraction(spark):
    r = _gopher(spark, "words 123 456 789 more")
    assert r["alpha_frac_e6"] == 400000  # 2 of 5 words have a letter


def test_repetition_argmax_and_ties(spark):
    df = spark.createDataFrame(
        [(0, "b b a a c"),          # tie 2-2 -> lexicographically 'a'
         (1, "x y x y x")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in TX.quality_repetition(df).collect()}
    assert rows[0]["top_word"] == "a" and rows[0]["top_count"] == 2
    assert rows[0]["top_word_frac_e6"] == 400000
    assert rows[1]["top_word"] == "x" and rows[1]["top_count"] == 3


def test_gopher_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    plan = TX.quality_gopher(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_repetition_plan_is_partial_agg_no_window(spark):
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    plan = TX.quality_repetition(df)._jdf.queryExecution() \
        .executedPlan().toString()
    # argmax via min(struct) partial aggregation, not a window sort
    assert "Window" not in plan
    assert "partial_min" in plan or "partial_" in plan
