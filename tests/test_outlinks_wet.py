"""Outlink host-graph extraction (ops/linkgraph.outlink_host_edges)
and WET record formatting (sources/warc.wet_records)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.linkgraph import outlink_host_edges  # noqa: E402
from swiftsoup_spark.sources.warc import wet_records  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="outlink-test")


def test_outlinks_resolve_against_page_url(spark):
    html = ('<p><a href="/rel">in</a>'
            '<a href="https://other.test/x">out</a>'
            '<a href="#frag">frag</a></p>')
    pages = spark.createDataFrame(
        [("https://src.test/page", html)], "url string, html string")
    got = {(r.src_host, r.dst_host): r for r in
           outlink_host_edges(pages).collect()}
    # relative -> page host; fragment resolves to the page itself too
    assert got[("src.test", "src.test")].n_links == 2
    assert got[("src.test", "other.test")].anchors == "out"


def test_outlinks_base_tag_wins(spark):
    html = ('<head><base href="https://cdn.test/a/"></head>'
            '<body><a href="f">x</a></body>')
    pages = spark.createDataFrame(
        [("https://src.test/p", html)], "url string, html string")
    rows = outlink_host_edges(pages).collect()
    assert [(r.src_host, r.dst_host) for r in rows] == [
        ("src.test", "cdn.test")]


def test_outlinks_anchor_cap_and_salt_invariance(spark):
    rows = [(f"https://s.test/p{i}",
             f'<a href="https://d.test/{i}">a{i:02d}</a>')
            for i in range(10)]
    pages = spark.createDataFrame(rows, "url string, html string")
    for salt in (2, 16):
        out = outlink_host_edges(pages, k_anchors=3, salt=salt).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_links == 10
        assert r.anchors == "a00|a01|a02"  # lexicographic first 3


def test_wet_octet_exact_content_length(spark):
    df = spark.createDataFrame(
        [("https://u.test/p", 1767225600, "café — ok")],
        "url string, ts_epoch long, text string")
    wet = wet_records(df).collect()[0].wet
    header, _, payload = wet.partition("\r\n\r\n")
    assert payload == "café — ok"
    n = int([line for line in header.split("\r\n")
             if line.startswith("Content-Length:")][0].split(": ")[1])
    assert n == len(payload.encode("utf-8"))  # octets, not chars
    assert "WARC-Date: 2026-01-01T00:00:00Z" in header
    assert header.startswith("WARC/1.0\r\nWARC-Type: conversion")
