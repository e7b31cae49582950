"""Gates for schema.org structured-data extraction (ops/structdata).

1. **JSON-LD lift + decode** — script body is a DataNode (invisible to
   text()), fields come out typed via get_json_object incl. the
   @type bracket path and nested author.name; pages without the script
   produce an all-null row, not a dropped row.
2. **Microdata ownership** — itemprop binds to the NEAREST itemscope
   ancestor; props outside any scope are skipped; two scopes on one
   page index 0,1 in document order.
3. **Value sources** — meta→content, a→href, img→src, time→datetime,
   default→element text (whitespace-normalized).
4. **Driver-query parity** — jsonld_meta and microdata match their
   DuckDB oracles at sf0.001.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.structdata import (jsonld_fields,  # noqa: E402
                                            microdata_items)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="structdata-test")


def _pages(spark, htmls):
    return spark.createDataFrame(
        [(f"https://t/{i}", h) for i, h in enumerate(htmls)],
        "url: string, html: string")


def test_jsonld_lift_and_nulls(spark):
    htmls = [
        '<html><head><script type="application/ld+json">'
        '{"@type":"NewsArticle","headline":"H0 &amp; more","wordCount":7,'
        '"author":{"name":"Ada"}}</script></head><body><p>x</p></body></html>',
        "<html><body><p>no script here</p></body></html>",
        '<html><body><script>var x = {"headline":"not ld"};</script>'
        "</body></html>",
    ]
    rows = {r["url"]: r for r in jsonld_fields(_pages(spark, htmls)).collect()}
    assert len(rows) == 3
    r0 = rows["https://t/0"]
    # script is RAWTEXT: &amp; stays raw in the data node, JSON-intact
    assert (r0["ld_type"], r0["headline"], r0["word_count"],
            r0["author"]) == ("NewsArticle", "H0 &amp; more", 7, "Ada")
    for u in ("https://t/1", "https://t/2"):
        r = rows[u]
        assert (r["ld_type"], r["headline"], r["word_count"],
                r["author"]) == (None, None, None, None)


def test_microdata_ownership_and_sources(spark):
    html = (
        '<html><body>'
        '<span itemprop="orphan">skip me</span>'
        '<div itemscope itemtype="https://schema.org/Book">'
        '  <span itemprop="name">A  <b>Tale</b></span>'
        '  <a itemprop="url" href="/b1">link text</a>'
        '  <img itemprop="image" src="/b1.png">'
        '  <time itemprop="datePublished" datetime="2020-01-02">Jan 2</time>'
        '  <meta itemprop="isbn" content="978-3">'
        '</div>'
        '<div itemscope itemtype="https://schema.org/Movie">'
        '  <div><span itemprop="name">Inner nested prop</span></div>'
        '</div>'
        '</body></html>')
    rows = microdata_items(_pages(spark, [html])).orderBy("prop_idx").collect()
    got = [(r["item_idx"], r["itemtype"].rsplit("/", 1)[-1], r["prop"],
            r["value"]) for r in rows]
    assert got == [
        (0, "Book", "name", "A Tale"),
        (0, "Book", "url", "/b1"),
        (0, "Book", "image", "/b1.png"),
        (0, "Book", "datePublished", "2020-01-02"),
        (0, "Book", "isbn", "978-3"),
        (1, "Movie", "name", "Inner nested prop"),
    ]


def _entry():
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entry_sd", os.path.join(root, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", ["jsonld_meta", "microdata"])
def test_driver_query_parity(spark, name):
    m = _entry()
    df = m.queries()[name](spark, SF)
    cols = df.columns
    srows = sorted(tuple(r) for r in df.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    res = con.execute(m.oracle_sql()[name])
    assert [d[0] for d in res.description] == cols
    assert srows == sorted(tuple(r) for r in res.fetchall())
