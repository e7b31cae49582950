"""Shared Element/Elements query surface + traversal order, ported from
the reference ElementQueryTest and NodeTraversorTest
(/root/reference/Tests/SwiftSoupTests/ElementQueryTest.swift,
 /root/reference/Tests/SwiftSoupTests/NodeTraversorTest.swift).

The reference exercises a protocol (ElementQuery) implemented by both
Element and Elements; in Python the same polymorphism is duck-typed, so
each case asserts the behavior on both receivers."""

from swiftsoup_spark import parse

TEST_HTML = """
<html><head><title>Test</title></head><body>
<div class="content" id="main">
    <p class="intro">Hello <b>world</b></p>
    <a href="/link1" class="nav">Link 1</a>
    <a href="/link2" class="nav">Link 2</a>
    <input type="text" name="q" value="search term" />
    <script>var x = 1;</script>
</div>
</body></html>
"""


def test_generic_query_on_element_and_elements():
    doc = parse(TEST_HTML)
    div = doc.select("div.content").first()
    assert "Hello" in div.text() and "world" in div.text()
    assert div.attr("id") == "main"
    assert len(div.select("a[href]")) == 2

    anchors = doc.select("a")
    assert "Link 1" in anchors.text() and "Link 2" in anchors.text()
    assert anchors.attr("href") == "/link1"          # first match
    assert len(anchors.select("a[href]")) == 2


def test_attr_both_receivers():
    doc = parse(TEST_HTML)
    assert doc.select("a").first().attr("href") == "/link1"
    assert doc.select("a").attr("href") == "/link1"


def test_has_attr_both_receivers():
    doc = parse(TEST_HTML)
    el = doc.select("a").first()
    assert el.has_attr("href") and not el.has_attr("data-foo")
    els = doc.select("a")
    assert els.has_attr("href") and not els.has_attr("data-foo")


def test_has_class_both_receivers():
    doc = parse(TEST_HTML)
    p = doc.select("p").first()
    assert p.has_class("intro") and not p.has_class("outro")
    assert doc.select("a").has_class("nav")


def test_val_both_receivers():
    doc = parse(TEST_HTML)
    assert doc.select("input").first().val() == "search term"
    assert doc.select("input").val() == "search term"


def test_text_both_receivers():
    doc = parse(TEST_HTML)
    assert doc.select("p.intro").first().text() == "Hello world"
    assert doc.select("p.intro").text() == "Hello world"


def test_html_both_receivers():
    doc = parse(TEST_HTML)
    for h in (doc.select("p.intro").first().html(),
              doc.select("p.intro").html()):
        assert "Hello" in h and "<b>world</b>" in h


def test_select_both_receivers():
    doc = parse(TEST_HTML)
    assert len(doc.select("div").first().select("a")) == 2
    assert len(doc.select("div").select("a")) == 2
    assert len(doc.select("div").first().select("a.nav")) == 2


def test_outer_html_both_receivers():
    doc = parse('<p id="t">Hi</p>')
    assert doc.select("p").first().outer_html() == '<p id="t">Hi</p>'
    assert doc.select("p").outer_html() == '<p id="t">Hi</p>'


def test_has_text_both_receivers():
    doc = parse("<p>Hello</p><div></div>")
    assert doc.select("p").first().text()
    assert not doc.select("div").first().text()
    assert doc.select("p").text()
    assert not doc.select("div").text()


def test_text_normalization_variants():
    doc = parse("<p>  Hello   world  </p>")
    el = doc.select("p").first()
    assert el.text() == "Hello world"
    assert "Hello" in el.whole_text()         # raw, un-normalized


def test_attr_returns_empty_when_missing():
    doc = parse("<p>Hi</p>")
    assert doc.select("p").first().attr("data-missing") == ""
    assert doc.select("p").attr("data-missing") == ""


def test_empty_elements_return_defaults():
    doc = parse("<p>Hi</p>")
    empty = doc.select("span")
    assert empty.attr("href") == ""
    assert not empty.has_attr("href")
    assert not empty.has_class("foo")
    assert empty.val() == ""
    assert empty.text() == ""
    assert empty.html() == ""
    assert empty.outer_html() == ""
    assert len(empty.select("a")) == 0


def test_has_class_false_on_elements():
    assert not parse("<p>No class</p>").select("p").has_class("missing")


# ---- NodeTraversorTest ----------------------------------------------------

def test_traverse_order():
    doc = parse("<p id=1><b id=2>3</b>4</p><p id=5>6</p>")
    heads, tails = [], []

    def desc(n):
        a = n.arena
        if a.ntype[n.id] == 1:                # ELEMENT
            return ("e", (a.attrs[n.id] or {}).get("id") or "")
        return ("t", a.text[n.id])

    from swiftsoup_spark.kernel.elements_api import Elements
    Elements([doc.body()]).traverse(
        lambda n, d: heads.append(desc(n)),
        lambda n, d: tails.append(desc(n)))

    assert heads == [("e", ""), ("e", "1"), ("e", "2"), ("t", "3"),
                     ("t", "4"), ("e", "5"), ("t", "6")]
    assert tails == [("t", "3"), ("e", "2"), ("t", "4"), ("e", "1"),
                     ("t", "6"), ("e", "5"), ("e", "")]


def test_tail_can_remove_node():
    doc = parse("<p id=1>2</p><p id=3>4</p><p id=5>6</p>")
    from swiftsoup_spark.kernel.arena import ELEMENT, Element
    from swiftsoup_spark.kernel.elements_api import Elements

    def tail(n, d):
        a = n.arena
        if a.ntype[n.id] == ELEMENT and (a.attrs[n.id] or {}).get("id") == "3":
            Element(a, n.id).remove()

    Elements([doc.body()]).traverse(lambda n, d: None, tail)
    expected = parse("<p id=1>2</p><p id=5>6</p>")
    assert doc.body().html() == expected.body().html()
