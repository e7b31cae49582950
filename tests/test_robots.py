"""robots.txt parsing + filtering (ops/robots.py): RFC 9309 group
semantics, Allow/Disallow longest-match precedence, comment/blank
handling, the DuckDB replays, and the broadcast filter plan."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.robots import (  # noqa: E402
    filter_robots, robots_decision_sql, robots_rules, robots_rules_sql)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="robots-test")


ROBOTS = [
    # specific-UA group ignored; * group collects only non-empty rules;
    # Allow carve-out under a Disallow
    ("a.test", "User-agent: googlebot\nDisallow: /g\n\n"
               "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
               "Disallow: /tmp/\n# comment\nDisallow:\n"),
    # a group headed by MULTIPLE consecutive UA lines, one of them *;
    # tie-length allow vs disallow -> allow wins
    ("b.test", "User-agent: *\nUser-agent: extra\nDisallow: /x\n"
               "Allow: /x\n\nUser-agent: other\nDisallow: /y"),
    # no * group at all -> no rules row
    ("c.test", "User-agent: bot\nDisallow: /only-bot"),
    ("d.test", ""),
    # case-insensitive field names
    ("e.test", "USER-AGENT: *\nDISALLOW: /up\nALLOW: /up/ok\n"),
    # two separate * groups: rules union
    ("f.test", "User-agent: *\nDisallow: /one\n\n"
               "User-agent: *\nDisallow: /two"),
]


def _rules(spark):
    df = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    return robots_rules(df)


def _plain(rules_df):
    return {r["host"]: [(x["p"], x["a"]) for x in r["rules"]]
            for r in rules_df.collect()}


def test_group_semantics(spark):
    got = _plain(_rules(spark))
    assert got == {
        "a.test": [("/private", False), ("/private/ok", True),
                   ("/tmp/", False)],
        "b.test": [("/x", False), ("/x", True)],
        "e.test": [("/up", False), ("/up/ok", True)],
        "f.test": [("/one", False), ("/two", False)]}


def test_duckdb_replay_identical(spark):
    got = _plain(_rules(spark))
    con = duckdb.connect()
    con.execute("CREATE TABLE rsrc(host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO rsrc VALUES (?,?)", ROBOTS)
    sql = robots_rules_sql("SELECT host, robots_txt FROM rsrc")
    ora = {h: [(x["p"], x["a"]) for x in rl]
           for h, rl in con.execute(sql).fetchall()}
    assert ora == got


def test_longest_match_precedence(spark):
    urls = spark.createDataFrame(
        [("https://a.test/private/x",),      # blocked
         ("https://a.test/private/ok/p",),   # Allow carve-out wins
         ("https://a.test/pub",),            # no match -> allowed
         ("https://a.test/tmp/f",),          # blocked
         ("https://a.test/tmpx",),           # '/tmp/' is not a prefix
         ("https://b.test/x/1",),            # tie -> allow wins
         ("https://c.test/only-bot",),       # no * group -> allowed
         ("https://nohost.test/z",)],        # no robots row -> allowed
        "url string")
    out = filter_robots(urls, _rules(spark))
    kept = sorted(r["url"] for r in out.collect())
    assert kept == ["https://a.test/private/ok/p", "https://a.test/pub",
                    "https://a.test/tmpx", "https://b.test/x/1",
                    "https://c.test/only-bot", "https://nohost.test/z"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_decision_sql_matches_fold(spark):
    # every (host, path) decision identical between the Spark fold and
    # the DuckDB arg_max rendering
    paths = ["/private/x", "/private/ok/p", "/pub", "/tmp/f", "/tmpx",
             "/x/1", "/one/two", "/up/ok/deep", "/up/no"]
    hosts = [h for h, _ in ROBOTS]
    urls = spark.createDataFrame(
        [(f"https://{h}{p}",) for h in hosts for p in paths],
        "url string")
    kept_spark = {r["url"] for r in
                  filter_robots(urls, _rules(spark)).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE rsrc(host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO rsrc VALUES (?,?)", ROBOTS)
    con.execute(f"CREATE TABLE rr AS SELECT * FROM ("
                f"{robots_rules_sql('SELECT host, robots_txt FROM rsrc')})")
    dec = robots_decision_sql("u.path", "r.rules")
    ora = con.execute(f"""
        WITH u AS (SELECT h.host, p.path,
                          'https://' || h.host || p.path AS url
                   FROM (SELECT unnest(?) AS host) h,
                        (SELECT unnest(?) AS path) p)
        SELECT u.url FROM u LEFT JOIN rr r ON u.host = r.host
        WHERE r.rules IS NULL OR {dec}""",
        [hosts, paths]).fetchall()
    assert {u for (u,) in ora} == kept_spark
