"""C4 cleaning rules (ops/textstats.quality_c4): per-rule battery on
crafted documents plus the zero-shuffle plan gate."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.textstats import quality_c4


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="c4-test")


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return quality_c4(df, **kw).collect()[0]


def test_terminal_punctuation_variants_kept(spark):
    r = _one(spark, 'Ends with period.\nEnds with bang!\n'
                    'Ends with question?\nEnds with "quote"')
    assert r.n_lines == 4 and r.n_kept == 4


def test_non_terminal_and_short_lines_dropped(spark):
    r = _one(spark, "no terminal punctuation\nToo short.\n"
                    "This one is long enough.")
    assert r.n_kept == 1
    assert r.text_c4 == "This one is long enough."


def test_javascript_line_dropped_any_case(spark):
    r = _one(spark, "Enable JavaScript to continue.\n"
                    "please turn on javascript now.\nA normal line stays.")
    assert r.n_kept == 1
    assert "JavaScript" not in r.text_c4 and "javascript" not in r.text_c4


def test_lorem_and_brace_flags_fail_page(spark):
    lorem = _one(spark, "Lorem IPSUM dolor sit amet.\n"
                        "One. Two three. Four five. Six seven. Eight nine.")
    assert lorem.has_lorem == 1 and lorem.c4_pass == 0
    brace = _one(spark, "A line with code { inside } it.\n"
                        "One. Two three. Four five. Six seven. Eight nine.")
    assert brace.has_brace == 1 and brace.c4_pass == 0


def test_sentence_gate_boundary(spark):
    four = _one(spark, "One two. Three four. Five six. Seven eight.")
    five = _one(spark, "One two. Three four. Five six. Seven eight. Nine ten.")
    assert (four.n_sentences, four.c4_pass) == (4, 0)
    assert (five.n_sentences, five.c4_pass) == (5, 1)


def test_sentences_counted_on_kept_text_only(spark):
    # the dropped (no-terminal) line's periods never reach the count
    r = _one(spark, "a. b. c. d. e. f\nOnly this line counts here.")
    assert r.n_kept == 1 and r.n_sentences == 1


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
    plan = (quality_c4(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan and "EvalPython" not in plan
