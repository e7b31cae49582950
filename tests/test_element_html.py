"""Element html-output + navigation parity, ported from the reference
ElementTest.swift (outerHtml/innerHtml/formatting/pretty-print-off,
siblings, parents)."""

import re

from swiftsoup_spark import parse
from swiftsoup_spark.kernel.serializer import OutputSettings, serialize, inner_html


def sn(s: str) -> str:
    return re.sub(r"\n\s*", "", s)


def test_outer_html():
    doc = parse("<div title='Tags &amp;c.'><img src=foo.png><p><!-- comment -->Hello<p>there")
    assert sn(doc.outer_html()) == (
        '<html><head></head><body><div title="Tags &amp;c."><img src="foo.png" />'
        '<p><!-- comment -->Hello</p><p>there</p></div></body></html>')


def test_inner_html():
    doc = parse("<div>\n <p>Hello</p> </div>")
    assert doc.get_elements_by_tag("div")[0].html() == "<p>Hello</p>"


def test_format_html():
    doc = parse("<title>Format test</title><div><p>Hello <span>jsoup <span>users</span>"
                "</span></p><p>Good.</p></div>")
    assert doc.outer_html() == (
        "<html>\n <head>\n  <title>Format test</title>\n </head>\n <body>\n"
        "  <div>\n   <p>Hello <span>jsoup <span>users</span></span></p>\n"
        "   <p>Good.</p>\n  </div>\n </body>\n</html>")


def test_set_indent():
    doc = parse("<div><p>Hello\nthere</p></div>")
    out = serialize(doc.arena, 0, OutputSettings(indent_amount=0))
    assert out == ("<html>\n<head></head>\n<body>\n<div>\n<p>Hello there</p>\n"
                   "</div>\n</body>\n</html>")


def test_not_pretty():
    doc = parse("<div>   \n<p>Hello\n there\n</p></div>")
    out = serialize(doc.arena, 0, OutputSettings(pretty_print=False))
    # non-pretty document html is the source verbatim (reference
    # patchedOuterHtmlUTF8 with defaultTrackSourceRanges=true,
    # Document.swift:554-594, ParseSettings.swift:26); implied
    # <html><head><body> only materialize once the doc is mutated
    assert out == "<div>   \n<p>Hello\n there\n</p></div>"
    div = doc.select("div")[0]
    assert inner_html(doc.arena, div.id, OutputSettings(pretty_print=False)) == (
        "   \n<p>Hello\n there\n</p>")
    doc.select("p")[0].set_attr("k", "v")
    out2 = serialize(doc.arena, 0, OutputSettings(pretty_print=False))
    assert out2 == ("<div>   \n"
                    '<p k="v">Hello\n there\n</p></div>')


def test_empty_element_format():
    doc = parse("<section><div></div></section>")
    assert doc.select("section")[0].outer_html() == "<section>\n <div></div>\n</section>"


def test_get_siblings():
    doc = parse("<div><p>Hello<p id=1>there<p>this<p>is<p>an<p id=last>element</div>")
    p = doc.get_element_by_id("1")
    assert p.text() == "there"
    assert p.previous_element_sibling().text() == "Hello"
    assert p.next_element_sibling().text() == "this"
    sibs = p.parent().children()
    assert sibs[0].text() == "Hello"
    assert sibs[-1].text() == "element"


def test_get_parents():
    doc = parse("<div><p>Hello <span>there</span></div>")
    span = doc.select("span")[0]
    parents = doc.select("span").parents()
    assert [e.tag_name for e in parents] == ["p", "div", "body", "html"]


def test_element_sibling_index():
    doc = parse("<div><p>One</p>...<p>Two</p>...<p>Three</p>")
    ps = doc.select("p")
    assert [p.elem_sibling_index() for p in ps] == [0, 1, 2]
    # same content doesn't confuse identity
    doc2 = parse("<div><p>One</p>...<p>One</p>...<p>One</p>")
    assert [p.elem_sibling_index() for p in doc2.select("p")] == [0, 1, 2]


def test_elements_with_class():
    doc = parse("<div class='mellow yellow'><span class=mellow>Hello "
                "<b class='yellow'>Yellow!</b></span><p>Empty</p></div>")
    els = doc.get_elements_by_class("mellow")
    assert [e.tag_name for e in els] == ["div", "span"]
    els2 = doc.get_elements_by_class("yellow")
    assert [e.tag_name for e in els2] == ["div", "b"]
    assert doc.get_elements_by_class("solo") == []


def test_title_set_get_semantics():
    doc = parse("<title>First</title><p>x</p>")
    assert doc.title() == "First"
