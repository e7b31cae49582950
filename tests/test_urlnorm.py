"""URL canonicalization gates (ops/urlnorm.py).

1. Semantics battery: case, default ports, userinfo, tracking params,
   param sort, fragments, dot segments (incl. root-level ``..`` and
   deep chains), non-URL passthrough.
2. Cross-dialect fidelity: the Spark Column and the generated DuckDB
   SQL produce IDENTICAL strings on every battery case — the property
   the oracle gate rests on.
3. url_dedup collapses planted variants into one canonical group.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops import urlnorm as U  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="urlnorm-test")


# (input, expected canonical)
BATTERY = [
    ("HTTP://Example.COM:80/a/../b?utm_source=x&id=1#frag",
     "http://example.com/b?id=1"),
    ("http://example.com/b?id=1", "http://example.com/b?id=1"),
    ("https://Example.com:443/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/a/b/c/../../d", "https://example.com/a/d"),
    ("https://example.com/a/./b/.", "https://example.com/a/b/"),
    ("https://example.com/../x", "https://example.com/x"),
    ("https://example.com/..", "https://example.com/"),
    ("https://example.com/a/..", "https://example.com/"),
    ("https://example.com/p?b=2&a=1&utm_campaign=z&gclid=123&",
     "https://example.com/p?a=1&b=2"),
    ("https://user:pw@Example.com/secret", "https://example.com/secret"),
    ("ftp://Host.example/Path/UPPER", "ftp://host.example/Path/UPPER"),
    ("not a url at all", "not a url at all"),
    ("  https://example.com/trim  ", "https://example.com/trim"),
    ("https://example.com/a#?fakequery=1", "https://example.com/a"),
    ("https://example.com/?", "https://example.com/"),
    ("https://example.com/...", "https://example.com/..."),
    ("https://example.com/a/.../../b", "https://example.com/a/b"),
    ("https://example.com/%41?x=%20", "https://example.com/%41?x=%20"),
    ("https://example.com:8080/keepport",
     "https://example.com:8080/keepport"),
    ("https://example.com./dot-host", "https://example.com/dot-host"),
    ("https://example.com/a//b/../c", "https://example.com/a//c"),
    ("https://example.com/x?ref=nav&refx=keep&xref=keep",
     "https://example.com/x?refx=keep&xref=keep"),
    ("https://example.com/deep/a/b/c/d/e/../../../../../x",
     "https://example.com/deep/x"),
    ("mailto:someone@example.com", "mailto:someone@example.com"),
    ("//protocol-relative.example/x", "//protocol-relative.example/x"),
    ("https://example.com/a/../../b", "https://example.com/b"),
    ("https://example.com/?#", "https://example.com/"),
    ("https://example.com/a?z=1&z=1&y#f", "https://example.com/a?y&z=1&z=1"),
]


@pytest.fixture(scope="module")
def results(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(u,) for u, _ in BATTERY], "url: string")
    sp = [r["c"] for r in
          df.select(U.canonical_url(F.col("url")).alias("c")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    for u, _ in BATTERY:
        con.execute("INSERT INTO t VALUES (?)", [u])
    dk = [r[0] for r in con.execute(
        "SELECT " + U.canonical_url_sql("url") + " FROM t").fetchall()]
    return sp, dk


def test_semantics(results):
    sp, _ = results
    for (u, want), got in zip(BATTERY, sp):
        assert got == want, f"{u!r}: {got!r} != {want!r}"


def test_cross_dialect_identical(results):
    sp, dk = results
    for (u, _), a, b in zip(BATTERY, sp, dk):
        assert a == b, f"{u!r}: spark={a!r} duckdb={b!r}"


def test_url_dedup_collapses_variants(spark):
    df = spark.createDataFrame(
        [("HTTP://Example.COM:80/page?utm_source=x",),
         ("http://example.com/page",),
         ("http://example.com/other/../page",),
         ("http://example.com/unrelated",)],
        "url: string")
    rows = {r["canon_url"]: r for r in U.url_dedup(df).collect()}
    assert rows["http://example.com/page"]["n_variants"] == 3
    assert (rows["http://example.com/page"]["rep_url"]
            == "HTTP://Example.COM:80/page?utm_source=x")
    assert rows["http://example.com/unrelated"]["n_variants"] == 1
