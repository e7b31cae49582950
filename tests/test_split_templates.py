"""split_assign determinism/leak-proofness + URL template mining."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    return get_spark(master="local[4]", app="test-split-tmpl")


def test_split_assign_content_stable_and_leakproof(spark):
    from swiftsoup_spark.ops.mixing import split_assign
    rows = [(i, f"text number {i % 800}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.bucket, r.split)
           for r in split_assign(df).collect()}
    # exact duplicates (i and i+800 share text) get the same split
    for i in range(800):
        assert out[i] == out[i + 800] == out[i + 1600] if i + 1600 < 2000 \
            else out[i] == out[i + 800]
    # repartitioning must not move anyone
    out2 = {r.doc_id: (r.bucket, r.split)
            for r in split_assign(df.repartition(13)).collect()}
    assert out == out2
    # ~2% leave train (800 distinct texts; 4 sigma of binomial)
    splits = [v[1] for k, v in out.items() if k < 800]
    frac = 1 - splits.count("train") / 800
    assert 0.0 < frac < 0.055


def test_url_path_templates(spark):
    from swiftsoup_spark.ops.urlnorm import url_path_templates
    urls = (
        [(f"https://shop.example.com/item/{i}/view",) for i in range(50)]
        + [(f"https://shop.example.com/cal/2024/{m:02d}/{d:02d}",)
           for m in range(1, 6) for d in range(1, 11)]
        + [("https://a.example.com",),          # no path -> '/'
          ("https://U:p@b.example.com:8080/x9",)])  # userinfo stripped
    df = spark.createDataFrame(urls, "url string")
    got = {(r.host, r.template): r.n_urls
           for r in url_path_templates(df).collect()}
    assert got[("shop.example.com", "/item/{n}/view")] == 50
    assert got[("shop.example.com", "/cal/{n}/{n}/{n}")] == 50
    assert got[("a.example.com", "/")] == 1
    assert got[("b.example.com:8080", "/x{n}")] == 1


def test_url_templates_duckdb_parity(spark):
    import duckdb
    from swiftsoup_spark.ops.urlnorm import (url_path_templates,
                                             url_path_templates_sql)
    rows = [(1, "https://h.test/a/1/b?q=2"), (2, "https://h.test/a/9/b"),
            (3, "http://h2.test"), (4, "https://h.test/plain")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = sorted((r.host, r.template, r.n_urls)
                 for r in url_path_templates(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(map(tuple,
                      con.execute(url_path_templates_sql("url")).fetchall()))
    assert got == want
