"""Language-ID (ops/textstats.lang_detect): semantic recovery gate.

The oracle-parity test certifies Spark == DuckDB on the same formula;
this file asserts the formula is *right* — the detector recovers the
planted language for every entry in the 11-language corpus, handles
degenerate inputs, and stays JVM-side (no Python eval in the plan)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops import textstats as TX  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="lang-test")


def _detect(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: (r["lang_pred"], r["top_score"])
            for r in TX.lang_detect(df).collect()}


def test_planted_corpus_recovered(spark):
    import __spark_entry__ as E
    rows = [(i, s) for i, (_, s) in enumerate(E._LANG_PLANTED)]
    got = _detect(spark, rows)
    for i, (code, _) in enumerate(E._LANG_PLANTED):
        assert got[i][0] == code, f"planted {code}, got {got[i][0]}"


def test_latin_top_score_positive(spark):
    got = _detect(spark, [(0, "the house of the king and the dog")])
    assert got[0] == ("en", got[0][1]) and got[0][1] > 0


def test_degenerate_inputs(spark):
    got = _detect(spark, [
        (0, ""),                       # empty -> und
        (1, "zzz qqq xxx 12345"),      # no profile hit -> und, score 0
        (2, None),                     # null -> und
    ])
    assert got[0] == ("und", 0)
    assert got[1] == ("und", 0)
    assert got[2] == ("und", 0)


def test_japanese_beats_chinese_on_mixed_text(spark):
    # Japanese mixes Han + kana; the kana short-circuit must fire first
    got = _detect(spark, [(0, "日本語のテキストは漢字とかなを混ぜて書かれます")])
    assert got[0][0] == "ja"


def test_script_path_reports_zero_trigram_score(spark):
    got = _detect(spark, [(0, "быстрая лиса и ленивая собака")])
    assert got[0] == ("ru", 0)


def test_plan_is_jvm_only(spark):
    # no BatchEvalPython / ArrowEvalPython stage: pure codegen expressions
    df = spark.createDataFrame([(1, "the of and")], ["doc_id", "text"])
    plan = TX.lang_detect(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_oracle_exprs_are_generated_from_same_tables():
    pred, score = TX.lang_detect_oracle_exprs("text")
    for lang in TX.LANG_TRIGRAMS:
        assert f"'{lang}'" in pred
    for tri in TX.LANG_TRIGRAMS["pt"]:
        assert tri in pred
    assert "BIGINT" in score


def test_bpe_token_count_segmentation(spark):
    """BPE pre-tokenizer: "it's a test-case, v2.0!" segments into
    letter/digit/symbol runs; whitespace split sees far fewer."""
    from swiftsoup_spark.ops import textstats as TX
    df = spark.createDataFrame(
        [(0, "it's a test-case, v2.0 (beta)!"), (1, "plain words here"),
         (2, "")],
        "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in TX.bpe_token_count(df).collect()}
    # it|'|s| a| test|-|case|,| v|2|.|0| (|beta|)! = 15 pretokens
    assert out[0]["n_pretokens"] == 15
    assert out[0]["n_ws_tokens"] == 5
    assert out[1]["n_pretokens"] == 3
    assert out[2]["n_pretokens"] == 0
