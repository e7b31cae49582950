"""Page metadata governance: canonical/base precedence, robots token
merge, OpenGraph rows."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    return get_spark(master="local[2]", app="test-pagemeta")


def _dirs(spark, pages):
    from swiftsoup_spark.ops.pagemeta import page_directives
    df = spark.createDataFrame(pages, "url string, html string")
    return {r.url: (r.canonical, r.noindex, r.nofollow)
            for r in page_directives(df).collect()}


def test_canonical_resolution_and_base_precedence(spark):
    out = _dirs(spark, [
        ("https://a.test/x/p", "<head><link rel=canonical href='/c'></head>"),
        ("https://a.test/x/p2",
         "<head><base href='https://b.test/z/'>"
         "<link rel=canonical href='c2'></head>"),
        ("https://a.test/p3", "<head></head><body>no canonical</body>"),
    ])
    assert out["https://a.test/x/p"][0] == "https://a.test/c"
    # <base href> wins over the page url (reference absUrl semantics)
    assert out["https://a.test/x/p2"][0] == "https://b.test/z/c2"
    assert out["https://a.test/p3"][0] is None


def test_robots_token_merge(spark):
    out = _dirs(spark, [
        ("u1", "<head><meta name=robots content='NOINDEX'></head>"),
        ("u2", "<head><meta name=robots content='index, follow'>"
               "<meta name=robots content='nofollow'></head>"),  # OR-merge
        ("u3", "<head><meta name=robots content='none'></head>"),
        ("u4", "<body>nothing</body>"),
    ])
    assert out["u1"] == (None, True, False)
    assert out["u2"] == (None, False, True)
    assert out["u3"] == (None, True, True)
    assert out["u4"] == (None, False, False)


def test_og_meta_rows(spark):
    from swiftsoup_spark.ops.pagemeta import og_meta
    df = spark.createDataFrame([
        ("u1", "<head><meta property='og:image' content='i.png'>"
               "<meta property='other' content='x'>"
               "<meta property='og:title' content='T'></head>"),
        ("u2", "<body>none</body>"),
    ], "url string, html string")
    rows = [(r.url, r.idx, r.prop, r.content)
            for r in og_meta(df).collect()]
    assert rows == [("u1", 0, "og:image", "i.png"),
                    ("u1", 1, "og:title", "T")]
