"""Gates for deterministic mixture sampling (ops/mixing.py) and the
host-blocklist filter (ops/urlnorm.py helpers).

1. sample_quota: rate 0 drops all, 1000 keeps all, mid rates keep the
   md5-bucket-stable subset (exact same ids across two runs), unknown
   groups honor default_permille.
2. bucket1000 matches its documented DuckDB replay.
3. filter_host_blocklist drops exactly the blocked hosts via a
   broadcast anti-join (plan-asserted); registered_domain groups
   subdomains.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from swiftsoup_spark.ops import mixing as M  # noqa: E402
from swiftsoup_spark.ops import urlnorm as U  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="mixing-test")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], f"text {i}") for i in range(300)]
    return spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")


def test_quota_extremes_and_determinism(spark, docs):
    quota = spark.createDataFrame(
        [("en", 1000), ("de", 0), ("fr", 500)],
        "lang: string, rate_permille: int")
    kept = M.sample_quota(docs, quota).select("doc_id", "lang").collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_lang.get("en", ())) == 100          # all kept
    assert "de" not in by_lang                        # all dropped
    assert 20 <= len(by_lang.get("fr", ())) <= 80     # ~half, hash-stable
    again = {r["doc_id"] for r in
             M.sample_quota(docs, quota).select("doc_id").collect()}
    assert again == {r["doc_id"] for r in kept}


def test_unknown_group_default(spark, docs):
    quota = spark.createDataFrame([("en", 1000)],
                                  "lang: string, rate_permille: int")
    kept = M.sample_quota(docs, quota, default_permille=0).collect()
    assert {r["lang"] for r in kept} == {"en"}
    kept_all = M.sample_quota(docs, quota, default_permille=1000).collect()
    assert {r["lang"] for r in kept_all} == {"en", "de", "fr"}


def test_bucket_matches_duckdb(spark, docs):
    sp = {r["doc_id"]: r["b"] for r in docs.select(
        "doc_id", M.bucket1000(F.col("doc_id")).alias("b")).collect()}
    con = duckdb.connect()
    dk = dict(con.execute(
        f"SELECT doc_id, {M.bucket1000_sql('doc_id')} FROM "
        f"(SELECT unnest(generate_series(0, 299)) AS doc_id)").fetchall())
    assert sp == dk


def test_blocklist_filter(spark):
    urls = spark.createDataFrame(
        [("https://bad.example/x",), ("https://Good.example/y",),
         ("https://sub.bad.example/z",), ("no-url",)],
        "url: string")
    blocked = spark.createDataFrame([("bad.example",)], "host: string")
    kept = [r["url"] for r in
            U.filter_host_blocklist(urls, blocked).collect()]
    assert sorted(kept) == ["https://Good.example/y",
                            "https://sub.bad.example/z", "no-url"]
    plan = (U.filter_host_blocklist(urls, blocked)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_registered_domain(spark):
    cases = [
        ("https://a.b.example.com/x", "example.com"),
        ("https://example.com/x", "example.com"),
        ("https://localhost/x", ""),
        # PSL 2-label suffixes: eTLD+1 keeps three labels
        ("https://a.b.example.co.uk/x", "example.co.uk"),
        ("https://foo.com.au/", "foo.com.au"),
        ("https://x.blogspot.com/p", "x.blogspot.com"),
        # PSL 3-label suffixes keep four
        ("http://deep.sub.school.k12.ny.us/", "school.k12.ny.us"),
        # a host that IS a public suffix has no registered domain
        ("https://co.uk/", ""),
        # ports never leak into the grouping key
        ("http://a.example.com:8080/", "example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url: string")
    got = [r["d"] for r in
           df.select(U.registered_domain(F.col("url")).alias("d")).collect()]
    assert got == [w for _, w in cases]
    # the DuckDB rendering replays identically (oracle contract)
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u, _ in cases])
    sql = f"SELECT {U.registered_domain_sql('url')} FROM t"
    assert [r[0] for r in con.execute(sql).fetchall()] == got


def test_temperature_quota(spark):
    from swiftsoup_spark.ops.mixing import (sample_quota,
                                            temperature_quota,
                                            temperature_quota_sql)
    import duckdb
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = temperature_quota(docs, "lang")
    rates = {r["lang"]: r["rate_permille"] for r in q.collect()}
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # smallest group keeps everything; larger groups downsample
    smallest = min(counts, key=counts.get)
    largest = max(counts, key=counts.get)
    assert rates[smallest] == 1000
    assert rates[largest] < rates[smallest]
    # rate ratio tracks sqrt of the inverse count ratio
    import math
    want = math.floor(1000 * math.sqrt(counts[smallest])
                      / math.sqrt(counts[largest]))
    assert rates[largest] == want
    # DuckDB replay identical
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    ora = dict(con.execute(temperature_quota_sql("lang")).fetchall())
    assert ora == rates
    # applying the quota shrinks imbalance (max/min count ratio)
    kept = {r["lang"]: r["n"] for r in
            sample_quota(docs, q).groupBy("lang")
            .agg(F.count("*").alias("n")).collect()}
    before = counts[largest] / counts[smallest]
    after = max(kept.values()) / min(kept.values())
    assert after < before
