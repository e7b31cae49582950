"""Crawl operators (ops/crawl.py): frontier cap/priority/slot pinning
and revisit-delta change detection."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.crawl import crawl_delta, crawl_frontier  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="crawl-test")


def test_frontier_caps_and_prioritizes(spark):
    # viral.test has 6 urls -> only k=3 survive, shallow-first
    rows = ([(f"https://viral.test/{'d' * n}/p",) for n in range(6)]
            + [("https://tiny.test/x",)])
    pages = spark.createDataFrame(rows, "url string")
    out = crawl_frontier(pages, k=3)
    got = {(r.host, r.pos): r.url for r in out.collect()}
    assert len([h for h, _ in got if h == "viral.test"]) == 3
    assert got[("viral.test", 1)] == "https://viral.test//p"
    assert got[("viral.test", 2)] == "https://viral.test/d/p"
    assert got[("viral.test", 3)] == "https://viral.test/dd/p"
    assert got[("tiny.test", 1)] == "https://tiny.test/x"


def test_frontier_slot_is_per_host_stable(spark):
    rows = [(f"https://h{i}.test/p{j}",) for i in range(5) for j in range(4)]
    pages = spark.createDataFrame(rows, "url string")
    out = crawl_frontier(pages, k=4, n_slots=4).collect()
    slots = {}
    for r in out:
        assert 0 <= r.slot < 4
        slots.setdefault(r.host, set()).add(r.slot)
    # every url of one host leaves from ONE fetcher slot
    assert all(len(s) == 1 for s in slots.values())


def test_frontier_salt_invariance(spark):
    """The two-phase min-K must be independent of the salt fan-out."""
    rows = [(f"https://h.test/{i:03d}",) for i in range(40)]
    pages = spark.createDataFrame(rows, "url string")
    a = sorted(map(tuple, crawl_frontier(pages, k=5, salt=2).collect()))
    b = sorted(map(tuple, crawl_frontier(pages, k=5, salt=16).collect()))
    assert a == b


def test_delta_flags_only_changed(spark):
    rows = [("u1", 0, "<p>old</p>"), ("u1", 1, "<p>new</p>"),
            ("u2", 0, "<p>same</p>"), ("u2", 1, "<p>same</p>")]
    snaps = spark.createDataFrame(rows, "url string, snap int, html string")
    got = {r.url: r for r in crawl_delta(snaps).collect()}
    assert got["u1"].changed is True
    assert got["u2"].changed is False
    assert got["u2"].digest_old == got["u2"].digest_new
