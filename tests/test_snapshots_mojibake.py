"""Snapshot dedup (ops/snapshots), mojibake repair (ops/mojibake),
and DOM template fingerprints (ops/template)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[2]", app="snap-moji-test")


def test_latest_snapshot_picks_max_ts(spark):
    from swiftsoup_spark.ops.snapshots import latest_snapshot
    df = spark.createDataFrame(
        [("u1", 10, "old"), ("u1", 30, "new"), ("u1", 20, "mid"),
         ("u2", 5, "only")],
        "url string, ts_epoch long, content string")
    rows = {r.url: r for r in latest_snapshot(df).collect()}
    assert (rows["u1"].ts_epoch, rows["u1"].content) == (30, "new")
    assert rows["u2"].content == "only"


def test_latest_snapshot_tie_break_deterministic(spark):
    from swiftsoup_spark.ops.snapshots import latest_snapshot
    df = spark.createDataFrame(
        [("u", 7, "aaa"), ("u", 7, "zzz"), ("u", 7, "mmm")],
        "url string, ts_epoch long, content string")
    # equal ts: struct max falls through to payload -> lexicographic max
    assert latest_snapshot(df).collect()[0].content == "zzz"


def test_fix_text_cases():
    from swiftsoup_spark.ops.mojibake import fix_text
    assert fix_text("cafÃ© au lait") == ("café au lait", True)
    # faithful cp1252 misdecode of “fine”: U+201D's 0x9D byte survives
    # as the C1 control char (sloppy-windows-1252), not as a cp1252 glyph
    assert fix_text("itâ€™s â€œfineâ€\x9d") == ("it’s “fine”", True)
    # truncated mojibake (missing continuation byte): strict decode
    # refuses, row passes through
    assert fix_text("bad tail â€") == ("bad tail â€", False)
    assert fix_text("cafÃƒÂ©") == ("café", True)  # double-encoded
    # genuine Latin text: strict UTF-8 round-trip fails -> untouched
    assert fix_text("café naïve résumé") == ("café naïve résumé", False)
    assert fix_text("Ã la carte") == ("Ã la carte", False)
    assert fix_text("plain ascii") == ("plain ascii", False)
    assert fix_text("") == ("", False)


def test_repair_mojibake_df(spark):
    from swiftsoup_spark.ops.mojibake import repair_mojibake
    df = spark.createDataFrame(
        [(0, "cafÃ© x"), (1, "café x"), (2, None)],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in repair_mojibake(df).collect()}
    assert (rows[0].text_fixed, rows[0].was_mojibake) == ("café x", True)
    assert (rows[1].text_fixed, rows[1].was_mojibake) == ("café x", False)
    assert (rows[2].text_fixed, rows[2].was_mojibake) == ("", False)


def test_template_clusters_group_same_shape(spark):
    from swiftsoup_spark.ops.template import dom_fingerprints, template_clusters
    a = "<html><body><div><p>one</p></div></body></html>"
    b = "<html><body><div><p>completely different words</p></div></body></html>"
    c = "<html><body><ul><li>x</li></ul></body></html>"
    df = spark.createDataFrame(
        [("https://h1.test/a", a), ("https://h1.test/b", b),
         ("https://h1.test/c", c), ("https://h2.test/a", a)],
        "url string, html string")
    fps = {r.url: r for r in dom_fingerprints(df).collect()}
    assert fps["https://h1.test/a"].fp == fps["https://h1.test/b"].fp
    assert fps["https://h1.test/a"].fp != fps["https://h1.test/c"].fp
    assert fps["https://h1.test/a"].n_nodes == 5  # html/head/body/div/p
    cl = {(r.host, r.fp): r.n_pages for r in template_clusters(df).collect()}
    assert cl[("h1.test", fps["https://h1.test/a"].fp)] == 2
    assert cl[("h2.test", fps["https://h2.test/a"].fp)] == 1
    assert len(cl) == 3
