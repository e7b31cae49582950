"""DOM-heuristic main-content extraction (ops/maincontent.py):
link-density scoring boundary cases + the Spark operator plan."""

import pytest

from swiftsoup_spark.kernel.fastpath import build_arena
from swiftsoup_spark.kernel.treebuilder import HtmlTreeBuilder
from swiftsoup_spark.ops.maincontent import (
    main_content_node, main_content_text)


def _arena(html):
    a = build_arena(html)
    return a if a is not None else HtmlTreeBuilder().parse(html)


def _mc(html):
    return main_content_text(_arena(html))


def test_article_beats_nav():
    h = ('<body><div id="m"><h1>Title</h1><p>real prose body text</p></div>'
         '<div class="nav"><a href="/x">next &gt;</a></div></body>')
    assert _mc(h) == "Title real prose body text"


def test_link_farm_loses_despite_more_text():
    h = ('<body><div><a>one very long anchor text</a>'
         '<a>another very long anchor here</a><a>more more more links</a></div>'
         '<div><p>short real prose</p></div></body>')
    assert _mc(h) == "short real prose"


def test_mixed_block_scores_nonlink_minus_link():
    # 24 chars prose vs (10 prose + 20 link -> 10-20*1... score
    # text-2*link): second div: 30 - 40 = -10 < first div's 24
    h = ('<body><div><p>twenty-four chars prose.</p></div>'
         '<div><p>ten chars!</p><a>twenty chars of link!</a></div></body>')
    assert _mc(h) == "twenty-four chars prose."


def test_tie_goes_to_first_in_doc_order():
    h = '<body><div><p>same text</p></div><div><p>same text</p></div></body>'
    a = _arena(h)
    n = main_content_node(a)
    first = [nid for nid in range(len(a.parent))
             if a.node_text(nid) == "same text"]
    assert n == min(x for x in first if a.parent[x] != -1) or \
        a.node_text(n) == "same text"


def test_chrome_only_page_falls_back_to_body():
    h = '<body><div><a>x</a></div>plain tail</body>'
    assert _mc(h) == "xplain tail"


def test_no_candidates_falls_back_to_body():
    assert _mc("<body><p>just a paragraph</p></body>") == "just a paragraph"


def test_article_and_main_are_candidates():
    h = ('<body><article><p>the article body content</p></article>'
         '<div><a>nav nav nav</a></div></body>')
    assert _mc(h) == "the article body content"


def test_nested_candidate_prefers_denser_inner():
    # inner div has the same text but the outer also contains the nav
    # links -> outer score = text - 2*link < inner score = text
    h = ('<body><div id="outer"><div id="inner"><p>prose prose prose</p>'
         '</div><a>long navigation link text</a></div></body>')
    a = _arena(h)
    n = main_content_node(a)
    assert a.node_text(n) == "prose prose prose"


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="maincontent-test")


def test_spark_operator_and_plan(spark):
    from swiftsoup_spark.ops.maincontent import main_content_over
    df = spark.createDataFrame(
        [("u1", '<body><div><p>body text one</p></div>'
                '<div><a>nav</a></div></body>'),
         ("u2", '<body><article><p>body text two</p></article></body>')],
        "url string, html string")
    out = main_content_over(df)
    rows = {r.url: r.text for r in out.collect()}
    assert rows == {"u1": "body text one", "u2": "body text two"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # fused scan -> kernel, no shuffle


def test_public_api_main_content():
    import swiftsoup_spark as soup
    doc = soup.parse('<body><div id=m><p>real prose text</p></div>'
                     '<div class=nav><a href=/x>nav link</a></div></body>')
    el = soup.main_content(doc)
    assert el.attr("id") == "m"
    assert el.text() == "real prose text"
