"""Node-level parity, ported from the reference NodeTest
(/root/reference/Tests/SwiftSoupTests/NodeTest.swift)."""

import re

from swiftsoup_spark import parse


def strip_nl(s: str) -> str:
    return re.sub(r"\n\s*", "", s)


def test_handles_abs_prefix():
    doc = parse("<a href=/foo>Hello</a>", "https://jsoup.org/")
    a = doc.select("a").first()
    assert a.attr("href") == "/foo"
    assert a.attr("abs:href") == "https://jsoup.org/foo"


def test_handles_abs_on_image():
    doc = parse('<p><img src="/rez/osi_logo.png" /></p>', "https://jsoup.org/")
    img = doc.select("img").first()
    assert img.attr("abs:src") == "https://jsoup.org/rez/osi_logo.png"
    assert img.abs_url("src") == img.attr("abs:src")


def test_handles_abs_prefix_on_has_attr():
    doc = parse("<a id=1 href='/foo'>One</a> "
                "<a id=2 href='https://jsoup.org/'>Two</a>")
    one = doc.select("#1").first()
    two = doc.select("#2").first()
    assert not one.has_attr("abs:href")
    assert one.has_attr("href")
    assert one.abs_url("href") == ""
    assert two.has_attr("abs:href")
    assert two.has_attr("href")
    assert two.abs_url("href") == "https://jsoup.org/"


def test_literal_abs_prefix():
    el = parse("<a abs:href='odd'>One</a>").select("a").first()
    assert el.has_attr("abs:href")
    assert el.attr("abs:href") == "odd"


def test_handle_abs_on_localhost_file_uris():
    doc = parse("<a href='password'>One/a><a href='/var/log/messages'>Two</a>",
                "file://localhost/etc/")
    one = doc.select("a").first()
    assert one.abs_url("href") == "file://localhost/etc/password"


def test_handles_abs_on_protocoless_absolute_uris():
    doc1 = parse("<a href='//example.net/foo'>One</a>", "http://example.com/")
    doc2 = parse("<a href='//example.net/foo'>One</a>", "https://example.com/")
    assert doc1.select("a").first().abs_url("href") == "http://example.net/foo"
    assert doc2.select("a").first().abs_url("href") == "https://example.net/foo"
    doc3 = parse("<img src=//www.google.com/images/errors/logo_sm.gif "
                 "alt=Google>", "https://google.com")
    assert (doc3.select("img").attr("abs:src")
            == "https://www.google.com/images/errors/logo_sm.gif")


def test_abs_handles_relative_query():
    doc = parse("<a href='?foo'>One</a> <a href='bar.html?foo'>Two</a>",
                "https://jsoup.org/path/file?bar")
    a1, a2 = doc.select("a")
    assert a1.abs_url("href") == "https://jsoup.org/path/file?foo"
    assert a2.abs_url("href") == "https://jsoup.org/path/bar.html?foo"


def test_abs_handles_dot_from_index():
    doc = parse("<a href='./one/two.html'>One</a>", "http://example.com")
    assert (doc.select("a").first().abs_url("href")
            == "http://example.com/one/two.html")


def test_remove():
    doc = parse("<p>One <span>two</span> three</p>")
    p = doc.select("p").first()
    p.child_nodes()[0].remove()
    assert p.text() == "two three"
    assert strip_nl(p.html()) == "<span>two</span> three"


def test_replace():
    doc = parse("<p>One <span>two</span> three</p>")
    p = doc.select("p").first()
    a = doc.arena
    em = a.new_element("em")
    a.append_child(em, a.new_node(2, text="foo"))   # TEXT node
    from swiftsoup_spark.kernel.arena import Element
    p.child_nodes()[1].replace_with(Element(a, em))
    assert p.html() == "One <em>foo</em> three"


def test_before_after_html():
    doc = parse("<p>One <b>two</b> three</p>")
    doc.select("b").first().before("<em>four</em>")
    assert doc.body().html() == "<p>One <em>four</em><b>two</b> three</p>"
    doc.select("b").first().after("<i>five</i>")
    assert (doc.body().html()
            == "<p>One <em>four</em><b>two</b><i>five</i> three</p>")


def test_unwrap():
    doc = parse("<div>One <span>Two <b>Three</b></span> Four</div>")
    span = doc.select("span").first()
    two_text = span.child_nodes()[0]
    node = span.unwrap()
    assert strip_nl(doc.body().html()) == "<div>One Two <b>Three</b> Four</div>"
    assert node is not None
    assert node.arena.text[node.id] == "Two "
    assert node == two_text
    assert node.parent() == doc.select("div").first()


def test_unwrap_no_children():
    doc = parse("<div>One <span></span> Two</div>")
    node = doc.select("span").first().unwrap()
    assert strip_nl(doc.body().html()) == "<div>One  Two</div>"
    assert node is None


def test_traverse():
    doc = parse("<div><p>Hello</p></div><div>There</div>")
    accum = []
    doc.select("div").eq(0).traverse(
        lambda n, d: accum.append("<" + n.node_name + ">"),
        lambda n, d: accum.append("</" + n.node_name + ">"))
    assert "".join(accum) == "<div><p><#text></#text></p></div>"


def test_node_is_not_a_sibling_of_itself():
    doc = parse("<div><p>One<p>Two<p>Three</div>")
    p2 = doc.select("p")[1]
    assert p2.text() == "Two"
    sibs = p2.siblings()
    assert len(sibs) == 2
    assert sibs[0].outer_html() == "<p>One</p>"
    assert sibs[1].outer_html() == "<p>Three</p>"


def test_supports_clone():
    doc = parse("<div class=foo>Text</div>")
    el = doc.select("div").first()
    assert el.has_class("foo")
    el_clone = doc.clone().select("div").first()
    assert el_clone.has_class("foo")
    assert el_clone.text() == "Text"
    el.remove_class("foo")
    el.set_text("None")
    assert not el.has_class("foo")
    assert el_clone.has_class("foo")
    assert el.text() == "None"
    assert el_clone.text() == "Text"


def test_deep_clone_independence():
    doc = parse("<div id=wrap><p class=one data-x=1>Text <span>Child</span>"
                "</p></div>")
    original = doc.select("#wrap").first()
    clone = original.clone()
    assert clone.parent() is None
    assert len(original.child_nodes()) == 1
    assert len(clone.child_nodes()) == 1

    original_p = original.select("p").first()
    clone_p = clone.select("p").first()
    assert original_p.attr("class") == "one"
    assert clone_p.attr("class") == "one"
    assert original_p.attr("data-x") == "1"

    clone_p.remove_attr("data-x")
    clone_p.add_class("two")
    clone_p.set_text("Changed")

    assert original_p.attr("data-x") == "1"
    assert original_p.attr("class") == "one"
    assert original_p.text() == "Text Child"
    assert clone_p.text() == "Changed"


def test_deep_clone_does_not_share_children():
    doc = parse("<div id=wrap><p>One</p><p>Two</p></div>")
    original = doc.select("#wrap").first()
    clone = original.clone()
    assert len(original.child_nodes()) == 2
    assert len(clone.child_nodes()) == 2
    clone.child_nodes()[0].remove()
    assert len(original.child_nodes()) == 2
    assert len(clone.child_nodes()) == 1


def test_clone_with_empty_attributes():
    doc = parse("<div><span>Hi</span></div>")
    span = doc.select("span").first()
    assert not span.has_attr("data-x")
    clone = span.clone()
    assert not clone.has_attr("data-x")
    clone.set_attr("data-x", "1")
    assert span.attr("data-x") == ""
    assert clone.attr("data-x") == "1"
