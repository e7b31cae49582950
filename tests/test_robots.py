"""robots.txt parsing + filtering (ops/robots.py): RFC 9309 group
semantics, comment/blank handling, the DuckDB replay, and the
broadcast filter plan."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.robots import (  # noqa: E402
    filter_robots, robots_disallow_rules, robots_disallow_rules_sql)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="robots-test")


ROBOTS = [
    # specific-UA group ignored; * group collects only non-empty rules
    ("a.test", "User-agent: googlebot\nDisallow: /g\n\n"
               "User-agent: *\nDisallow: /private\nDisallow: /tmp/\n"
               "# comment\nDisallow:\n"),
    # a group headed by MULTIPLE consecutive UA lines, one of them *
    ("b.test", "User-agent: *\nUser-agent: extra\nDisallow: /x\n\n"
               "User-agent: other\nDisallow: /y"),
    # no * group at all -> no rules row
    ("c.test", "User-agent: bot\nDisallow: /only-bot"),
    ("d.test", ""),
    # case-insensitive field names, CRLF tolerance via trim
    ("e.test", "USER-AGENT: *\nDISALLOW: /up\n"),
    # two separate * groups: prefixes union
    ("f.test", "User-agent: *\nDisallow: /one\n\n"
               "User-agent: *\nDisallow: /two"),
]


def _rules(spark):
    df = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    return robots_disallow_rules(df)


def test_group_semantics(spark):
    got = {r["host"]: r["prefixes"] for r in _rules(spark).collect()}
    assert got == {"a.test": ["/private", "/tmp/"],
                   "b.test": ["/x"],
                   "e.test": ["/up"],
                   "f.test": ["/one", "/two"]}


def test_duckdb_replay_identical(spark):
    got = {r["host"]: r["prefixes"] for r in _rules(spark).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE rsrc(host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO rsrc VALUES (?,?)", ROBOTS)
    sql = robots_disallow_rules_sql("SELECT host, robots_txt FROM rsrc")
    assert {h: p for h, p in con.execute(sql).fetchall()} == got


def test_filter_prefix_match_and_plan(spark):
    urls = spark.createDataFrame(
        [("https://a.test/private/x",), ("https://a.test/pub",),
         ("https://a.test/tmp/f",), ("https://a.test/tmpx",),
         ("https://b.test/x",), ("https://b.test/ok",),
         ("https://c.test/only-bot",), ("https://nohost.test/z",)],
        "url string")
    out = filter_robots(urls, _rules(spark))
    kept = sorted(r["url"] for r in out.collect())
    # '/tmp/' blocks /tmp/f but NOT /tmpx (prefix, not directory-loose)
    assert kept == ["https://a.test/pub", "https://a.test/tmpx",
                    "https://b.test/ok", "https://c.test/only-bot",
                    "https://nohost.test/z"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
