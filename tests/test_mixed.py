"""Mixed-format sniff-and-route extraction (ops/mixed.py)."""

import pytest

from swiftsoup_spark.ops.pdftext import build_mini_pdf


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="mixed-test")


def test_routing_and_bails(spark):
    from swiftsoup_spark.ops.mixed import extract_any_over
    rows = [
        ("h1", b"<html><body><p>hello html</p></body></html>"),
        ("p1", build_mini_pdf("hello pdf world", 0)),
        ("p2", b"%PDF-1.4\n/Encrypt <<>>"),      # pdf bail -> NULL text
        ("h2", "caf\xe9 <b>bold</b>".encode("utf-8")),
        ("n1", None),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = {r.url: (r.fmt, r.text)
           for r in extract_any_over(df).collect()}
    assert out["h1"] == ("html", "hello html")
    assert out["p1"] == ("pdf", "hello pdf world")
    assert out["p2"] == ("pdf", None)            # bail is NULL, never wrong
    assert out["h2"] == ("html", "café bold")
    assert out["n1"] == (None, None)


def test_single_fused_stage(spark):
    from swiftsoup_spark.ops.mixed import extract_any_over, synthesize_mixed
    df = spark.createDataFrame(
        [(0, "u0", "<p>x</p>", "x"), (1, "u1", "<p>y</p>", "y words here")],
        "doc_id long, url string, html string, text string")
    out = extract_any_over(synthesize_mixed(df, keep_cols=("url",)),
                           keep_cols=("url",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # route per row, no format split/shuffle
    got = {r.url: r.fmt for r in out.collect()}
    assert got == {"u0": "html", "u1": "pdf"}
