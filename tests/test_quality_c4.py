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


# --- Gopher top-n-gram repetition (ops/textstats.top_ngram_share) ----------

from swiftsoup_spark.ops.textstats import top_ngram_share


def test_topngram_hand_computed_and_tiebreak(spark):
    df = spark.createDataFrame([(1, "a b a b a b c")],
                               "doc_id long, text string")
    r = top_ngram_share(df).collect()[0]
    assert (r.top2_gram, r.top2_count) == ("a b", 3)
    # 3 occurrences x 3 chars over 13 chars -> 692307 (integer DIV)
    assert r.top2_share_e6 == 692307
    # trigrams "a b a" and "b a b" both occur twice: smallest gram wins
    assert (r.top3_gram, r.top3_count) == ("a b a", 2)


def test_topngram_short_doc_zero_path(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "two words")],
                               "doc_id long, text string")
    got = {r.doc_id: r for r in top_ngram_share(df).collect()}
    assert (got[1].top2_gram, got[1].top2_count, got[1].top2_share_e6) == \
        ("", 0, 0)
    assert got[2].top2_gram == "two words" and got[2].top3_count == 0


def test_topngram_counts_across_newlines(spark):
    # words split on both space and newline: the repeated line repeats
    # its bigrams across the line boundary stream
    df = spark.createDataFrame([(1, "x y\nx y")], "doc_id long, text string")
    r = top_ngram_share(df).collect()[0]
    assert r.top2_count == 2 and r.top2_gram == "x y"


def test_topngram_no_cartesian_no_window(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (top_ngram_share(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "CartesianProduct" not in plan
    # argmax must be the partial-aggregable struct-min, not a sort window
    assert "Window" not in plan
