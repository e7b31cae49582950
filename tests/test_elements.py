"""Elements (result-set) bulk-op parity, ported from the reference
ElementsTest (/root/reference/Tests/SwiftSoupTests/ElementsTest.swift)."""

import re

from swiftsoup_spark import parse


def strip_nl(s: str) -> str:
    """Reference TextUtil.stripNewlines: drop newlines + following indent."""
    return re.sub(r"\n\s*", "", s)


def test_filter():
    h = ("<p>Excl</p><div class=headline><p>Hello</p><p>There</p></div>"
         "<div class=headline><h1>Headline</h1></div>")
    els = parse(h).select(".headline").select("p")
    assert len(els) == 2
    assert els[0].text() == "Hello"
    assert els[1].text() == "There"


def test_attributes():
    doc = parse("<p title=foo><p title=bar><p class=foo><p class=bar>")
    with_title = doc.select("p[title]")
    assert len(with_title) == 2
    assert with_title.has_attr("title")
    assert not with_title.has_attr("class")
    assert with_title.attr("title") == "foo"

    with_title.remove_attr("title")
    assert len(with_title) == 2          # existing Elements not reevaluated
    assert len(doc.select("p[title]")) == 0

    ps = doc.select("p").set_attr("style", "classy")
    assert len(ps) == 4
    assert ps.last().attr("style") == "classy"
    assert ps.last().attr("class") == "bar"


def test_has_attr():
    ps = parse("<p title=foo><p title=bar><p class=foo><p class=bar>").select("p")
    assert ps.has_attr("class")
    assert not ps.has_attr("style")


def test_attr_first_match():
    doc = parse("<p title=foo><p title=bar><p class=foo><p class=bar>")
    assert doc.select("p").attr("class") == "foo"


def test_abs_attr():
    doc = parse("<a id=1 href='/foo'>One</a> "
                "<a id=2 href='https://google.com'>Two</a>")
    one, two, both = doc.select("#1"), doc.select("#2"), doc.select("a")
    assert one.attr("abs:href") == ""
    assert two.attr("abs:href") == "https://google.com"
    assert both.attr("abs:href") == "https://google.com"


def test_classes():
    doc = parse("<div><p class='mellow yellow'></p><p class='red green'></p>")
    els = doc.select("p")
    assert els.has_class("red")
    assert not els.has_class("blue")
    els.add_class("blue")
    els.remove_class("yellow")
    els.toggle_class("mellow")
    assert els[0].attr("class") == "blue"
    assert els[1].attr("class") == "red green blue mellow"


def test_text():
    assert parse("<div><p>Hello<p>there<p>world</div>").select(
        "div > *").text() == "Hello there world"


def test_has_text():
    doc = parse("<div><p>Hello</p></div><div><p></p></div>")
    assert any(el.text() for el in doc.select("div"))
    assert not any(el.text() for el in doc.select("div + div"))


def test_html():
    doc = parse("<div><p>Hello</p></div><div><p>There</p></div>")
    assert doc.select("div").html() == "<p>Hello</p>\n<p>There</p>"


def test_outer_html():
    doc = parse("<div><p>Hello</p></div><div><p>There</p></div>")
    assert (strip_nl(doc.select("div").outer_html())
            == "<div><p>Hello</p></div><div><p>There</p></div>")


def test_set_html():
    doc = parse("<p>One</p><p>Two</p><p>Three</p>")
    ps = doc.select("p")
    ps.prepend_html("<b>Bold</b>").append_html("<i>Ital</i>")
    assert strip_nl(ps[1].outer_html()) == "<p><b>Bold</b>Two<i>Ital</i></p>"
    ps.set_html("<span>Gone</span>")
    assert strip_nl(ps[1].outer_html()) == "<p><span>Gone</span></p>"


def test_val():
    doc = parse("<input value='one' /><textarea>two</textarea>")
    els = doc.select("input, textarea")
    assert len(els) == 2
    assert els.val() == "one"
    assert els.last().val() == "two"
    els.set_val("three")
    assert els.first().val() == "three"
    assert els.last().val() == "three"
    assert els.last().outer_html() == "<textarea>three</textarea>"


def test_before():
    doc = parse("<p>This <a>is</a> <a>SwiftSoup</a>.</p>")
    doc.select("a").before_html("<span>foo</span>")
    assert (strip_nl(doc.body().html())
            == "<p>This <span>foo</span><a>is</a> "
               "<span>foo</span><a>SwiftSoup</a>.</p>")


def test_after():
    doc = parse("<p>This <a>is</a> <a>SwiftSoup</a>.</p>")
    doc.select("a").after_html("<span>foo</span>")
    assert (strip_nl(doc.body().html())
            == "<p>This <a>is</a><span>foo</span> "
               "<a>SwiftSoup</a><span>foo</span>.</p>")


def test_wrap():
    doc = parse("<p><b>This</b> is <b>SwiftSoup</b></p>")
    doc.select("b").wrap("<i></i>")
    assert (doc.body().html()
            == "<p><i><b>This</b></i> is <i><b>SwiftSoup</b></i></p>")


def test_wrap_div():
    doc = parse("<p><b>This</b> is <b>SwiftSoup</b>.</p> "
                "<p>How do you like it?</p>")
    doc.select("p").wrap("<div></div>")
    assert (strip_nl(doc.body().html())
            == "<div><p><b>This</b> is <b>SwiftSoup</b>.</p></div> "
               "<div><p>How do you like it?</p></div>")


def test_unwrap():
    doc = parse('<div><font>One</font> <font><a href="/">Two</a></font></div')
    doc.select("font").unwrap()
    assert (strip_nl(doc.body().html())
            == '<div>One <a href="/">Two</a></div>')


def test_unwrap_p():
    doc = parse("<p><a>One</a> Two</p> Three <i>Four</i> <p>Fix <i>Six</i></p>")
    doc.select("p").unwrap()
    assert (strip_nl(doc.body().html())
            == "<a>One</a> Two Three <i>Four</i> Fix <i>Six</i>")


def test_unwrap_keeps_space():
    doc = parse("<p>One <span>two</span> <span>three</span> four</p>")
    doc.select("span").unwrap()
    assert doc.body().html() == "<p>One two three four</p>"


def test_empty():
    doc = parse("<div><p>Hello <b>there</b></p> <p>now!</p></div>")
    doc.output_settings.pretty_print = False
    doc.select("p").empty()
    assert doc.body().html() == "<div><p></p> <p></p></div>"


def test_remove():
    doc = parse("<div><p>Hello <b>there</b></p> SwiftSoup <p>now!</p></div>")
    doc.output_settings.pretty_print = False
    doc.select("p").remove()
    assert doc.body().html() == "<div> SwiftSoup </div>"


def test_eq():
    doc = parse("<p>Hello<p>there<p>world")
    assert doc.select("p").eq(1).text() == "there"
    assert doc.select("p")[1].text() == "there"


def test_is():
    ps = parse("<p>Hello<p title=foo>there<p>world").select("p")
    assert ps.is_("[title=foo]")
    assert not ps.is_("[title=bar]")


def test_parents():
    parents = parse("<div><p>Hello</p></div><p>There</p>").select("p").parents()
    assert len(parents) == 3
    assert [p.tag_name for p in parents] == ["div", "body", "html"]


def test_not():
    doc = parse("<div id=1><p>One</p></div> "
                "<div id=2><p><span>Two</span></p></div>")
    div1 = doc.select("div").not_(":has(p > span)")
    assert len(div1) == 1 and div1.first().attr("id") == "1"
    div2 = doc.select("div").not_("#1")
    assert len(div2) == 1 and div2.first().attr("id") == "2"


def test_tag_name_set():
    doc = parse("<p>Hello <i>there</i> <i>now</i></p>")
    doc.select("i").tag_name("em")
    assert doc.body().html() == "<p>Hello <em>there</em> <em>now</em></p>"


def test_traverse():
    doc = parse("<div><p>Hello</p></div><div>There</div>")
    accum = []
    doc.select("div").traverse(
        lambda node, depth: accum.append("<" + node.node_name + ">"),
        lambda node, depth: accum.append("</" + node.node_name + ">"))
    assert ("".join(accum)
            == "<div><p><#text></#text></p></div><div><#text></#text></div>")


def test_forms():
    doc = parse("<form id=1><input name=q></form><div /><form id=2>"
                "<input name=f></form>")
    els = doc.select("*")
    # 9 per the reference: the Document root is itself an Element
    # (tag '#root') and matches '*'
    assert len(els) == 9
    forms = els.forms()
    assert len(forms) == 2
    assert forms[0].attr("id") == "1"
    assert forms[1].attr("id") == "2"


def test_class_with_hyphen():
    els = parse("<p class='tab-nav'>Check</p>").get_elements_by_class("tab-nav")
    assert len(els) == 1
    assert els.text() == "Check"


def test_each_text():
    doc = parse("<div><p>1<p>2<p>3<p>4<p>5<p>6</div>"
                "<div><p>7<p>8<p>9<p>10<p>11<p>12<p></p></div>")
    div_text = doc.select("div").each_text()
    assert div_text == ["1 2 3 4 5 6", "7 8 9 10 11 12"]
    p_text = doc.select("p").each_text()
    assert len(doc.select("p")) == 13
    assert len(p_text) == 12             # last <p> has no text
    assert p_text[0] == "1" and p_text[4] == "5" and p_text[11] == "12"
