"""Structured table extraction (ops/tables.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.api import parse  # noqa: E402
from swiftsoup_spark.ops.tables import doc_tables, extract_tables  # noqa: E402


def test_header_data_colspan():
    h = ('<table><caption>c</caption>'
         '<thead><tr><th>H1</th><th>H2</th></tr></thead>'
         '<tbody><tr><td>a</td><td>b <b>x</b></td></tr>'
         '<tr><td colspan=2>span</td></tr></tbody></table>')
    assert doc_tables(parse(h)) == [[["H1", "H2"], ["a", "b x"], ["span"]]]


def test_nested_tables_stay_separate():
    h = ('<table><tr><td>outer'
         '<table><tr><td>inner</td></tr></table>'
         '</td></tr></table>')
    got = doc_tables(parse(h))
    # outer table's cell text flattens its subtree; the nested table
    # still emits its OWN rows (document order: outer first)
    assert got == [[["outer inner"]], [["inner"]]]


def test_no_tables_and_empty_rows():
    assert doc_tables(parse("<p>none</p>")) == []
    assert doc_tables(parse("<table></table>")) == [[]]


def test_implied_tbody_and_bare_rows():
    # parser inserts tbody; rows without cells yield empty lists
    h = "<table><tr><td>x</td></tr><tr></tr></table>"
    assert doc_tables(parse(h)) == [[["x"], []]]


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="tables-test")


def test_exploded_shape(spark):
    df = spark.createDataFrame(
        [("u1", "<table><tr><th>H</th></tr><tr><td>v</td></tr></table>"
                "<table><tr><td>t2</td></tr></table>")],
        "url string, html string")
    rows = {(r.table_idx, r.row_idx): r.cells
            for r in extract_tables(df).collect()}
    assert rows == {(0, 0): ["H"], (0, 1): ["v"], (1, 0): ["t2"]}
