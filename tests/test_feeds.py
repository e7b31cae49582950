"""RSS/Atom feed-item extraction (ops/feeds.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[2]", app="feeds-test")


RSS = (
    '<?xml version="1.0"?><rss version="2.0"><channel><title>F</title>'
    "<item><title>A &amp; B</title><link>https://x.test/1</link>"
    "<pubDate>2026-01-01</pubDate></item>"
    "<item><title>C</title><link>https://x.test/2</link>"
    "<pubDate>2026-01-02</pubDate></item></channel></rss>"
)
ATOM = (
    '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
    "<title>F</title><entry><title>E1</title>"
    '<link href="https://y.test/e1"/><updated>2026-02-01</updated>'
    "</entry></feed>"
)


def test_rss_and_atom_paths(spark):
    from swiftsoup_spark.ops.feeds import feed_items
    df = spark.createDataFrame(
        [(0, RSS), (1, ATOM), (2, "<rss><channel></channel></rss>")],
        "doc_id long, xml string")
    rows = {(r.doc_id, r.item_idx): r for r in feed_items(df).collect()}
    assert len(rows) == 3  # 2 rss items + 1 atom entry, empty feed -> 0
    r0 = rows[(0, 0)]
    assert (r0.kind, r0.title, r0.link, r0.ts) == (
        "rss", "A & B", "https://x.test/1", "2026-01-01")
    assert rows[(0, 1)].link == "https://x.test/2"
    a = rows[(1, 0)]
    # Atom link is the href ATTRIBUTE of a self-closing element
    assert (a.kind, a.link, a.ts) == ("atom", "https://y.test/e1", "2026-02-01")


def test_synth_matches_oracle_shape(spark):
    from swiftsoup_spark.ops.feeds import feed_items, synth_feed_table
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    out = feed_items(synth_feed_table(docs)).collect()
    # 1 + id%3 items per doc: 1+2+3+1+2+3 = 12
    assert len(out) == 12
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i in range(6):
        assert len(by_doc[i]) == 1 + i % 3
        assert all(r.kind == ("rss" if i % 2 == 0 else "atom")
                   for r in by_doc[i])
        assert by_doc[i][0].title == f"T {i}-0 & more"
