"""Cleaner/Whitelist parity cases ported from the reference CleanerTest
(/root/reference/Tests/SwiftSoupTests/CleanerTest.swift)."""

import re

from swiftsoup_spark import clean, is_valid
from swiftsoup_spark.clean import whitelist as W


def sn(s: str) -> str:
    return re.sub(r"\n\s*", "", s)


def test_simple_behaviour():
    h = "<div><p class=foo><a href='http://evil.com'>Hello <b id=bar>there</b>!</a></div>"
    assert sn(clean(h, "simpleText")) == "Hello <b>there</b>!"
    assert sn(clean("Hello <b>there</b>!", "simpleText")) == "Hello <b>there</b>!"


def test_basic_behaviour():
    h = ("<div><p><a href='javascript:sendAllMoney()'>Dodgy</a> "
         "<A HREF='HTTP://nice.com'>Nice</a></p><blockquote>Hello</blockquote>")
    assert sn(clean(h, "basic")) == (
        '<p><a rel="nofollow">Dodgy</a> <a href="HTTP://nice.com" rel="nofollow">'
        'Nice</a></p><blockquote>Hello</blockquote>')


def test_basic_with_images():
    h = ("<div><p><img src='http://example.com/' alt=Image></p>"
         "<p><img src='ftp://ftp.example.com'></p></div>")
    assert sn(clean(h, "basicWithImages")) == (
        '<p><img src="http://example.com/" alt="Image" /></p><p><img /></p>')


def test_relaxed():
    h = "<h1>Head</h1><table><tr><td>One<td>Two</td></tr></table>"
    assert sn(clean(h, "relaxed")) == (
        "<h1>Head</h1><table><tbody><tr><td>One</td><td>Two</td></tr></tbody></table>")


def test_remove_tags():
    h = "<div><p><A HREF='HTTP://nice.com'>Nice</a></p><blockquote>Hello</blockquote>"
    assert sn(clean(h, W.basic().remove_tags("a"))) == (
        "<p>Nice</p><blockquote>Hello</blockquote>")


def test_remove_enforced_attributes():
    h = "<div><p><A HREF='HTTP://nice.com'>Nice</a></p><blockquote>Hello</blockquote>"
    assert sn(clean(h, W.basic().remove_enforced_attribute("a", "rel"))) == (
        '<p><a href="HTTP://nice.com">Nice</a></p><blockquote>Hello</blockquote>')


def test_clean_javascript_href():
    h = "<A HREF=\"javascript:document.location='http://www.google.com/'\">XSS</A>"
    assert clean(h, "relaxed") == "<a>XSS</a>"


def test_clean_anchor_protocol():
    valid = '<a href="#valid">Valid anchor</a>'
    invalid = '<a href="#anchor with spaces">Invalid anchor</a>'
    assert clean(valid, "relaxed") == "<a>Valid anchor</a>"
    assert clean(invalid, "relaxed") == "<a>Invalid anchor</a>"
    wl = W.relaxed().add_protocols("a", "href", "#")
    assert clean(valid, wl) == valid
    wl2 = W.relaxed().add_protocols("a", "href", "#")
    assert clean(invalid, wl2) == "<a>Invalid anchor</a>"


def test_drops_unknown_tags():
    assert clean("<p><custom foo=true>Test</custom></p>", "relaxed") == "<p>Test</p>"


def test_handles_empty_attributes():
    h = "<img alt=\"\" src= unknown=''>"
    assert clean(h, "basicWithImages") == '<img alt="" />'


def test_is_valid():
    assert is_valid("<p>Test <b><a href='http://example.com/'>OK</a></b></p>", "basic")
    assert not is_valid("<p><script></script>Not <b>OK</b></p>", "basic")
    assert not is_valid("<p align=right>Test Not <b>OK</b></p>", "basic")
    assert not is_valid("<!-- comment --><p>Not OK</p>", "basic")


def test_resolves_relative_links():
    h = "<a href='/foo'>Link</a><img src='/bar'>"
    assert clean(h, "basicWithImages", "http://example.com/") == (
        '<a href="http://example.com/foo" rel="nofollow">Link</a>\n'
        '<img src="http://example.com/bar" />')


def test_only_resolves_slash_prefixed():
    h = "<a href='article.html'>Link</a><img src='image.png'>"
    assert clean(h, "basicWithImages", "http://example.com/base/") == (
        '<a href="article.html" rel="nofollow">Link</a>\n<img src="image.png" />')


def test_does_not_resolve_non_url_attributes():
    h = "<img width='/16' src='/bar'>"
    wl = (W.Whitelist().add_tags("img").add_attributes("img", "width", "src")
          .add_protocols("img", "src", "http", "https"))
    assert clean(h, wl, "http://example.com/") == (
        '<img width="/16" src="http://example.com/bar" />')


def test_preserves_relative_links_if_configured():
    h = "<a href='/foo'>Link</a><img src='/bar'> <img src='javascript:alert()'>"
    wl = W.basic_with_images().set_preserve_relative_links(True)
    assert clean(h, wl, "http://example.com/") == (
        '<a href="/foo" rel="nofollow">Link</a>\n<img src="/bar" /> \n<img />')


def test_drops_unresolvable_relative_links():
    assert clean("<a href='/foo'>Link</a>", "basic") == '<a rel="nofollow">Link</a>'


def test_all_pseudo_tag():
    h = "<p class='foo' src='bar'><a class='qux'>link</a></p>"
    wl = (W.Whitelist().add_attributes(":all", "class")
          .add_attributes("p", "style").add_tags("p", "a"))
    assert clean(h, wl) == '<p class="foo"><a class="qux">link</a></p>'


def test_nbsp_normalization():
    assert clean("&nbsp;", "none") == " "
    assert clean("Hello&nbsp;there&#160;friend", "none") == "Hello there friend"
    assert clean("&amp;&lt;&gt;", "none") == "&amp;&lt;&gt;"
    assert sn(clean("&nbsp;<b>Bold</b>", "simpleText")) == "&nbsp;<b>Bold</b>"


def test_comments_dropped_and_counted():
    assert clean("<!-- c --><p>One</p>", "basic") == "<p>One</p>"
    assert not is_valid("<!-- c --><p>One</p>", "basic")


def test_style_attr_not_url_mangled():
    wl = W.relaxed().add_tags("div").add_attributes("div", "style")
    out = clean('<div style="background-color:#E9EAEB;">content</div>', wl)
    # '#' must not be URL-percent-encoded (style is not a URL attribute)
    assert "background-color:#E9EAEB;" in out


def test_filters_style_to_whitelisted_properties():
    wl = (W.Whitelist().add_tags("p").add_attributes("p", "style")
          .add_css_properties("p", "color", "font-weight"))
    out = clean('<p style="color: red; position: absolute; font-weight: bold;">Hello</p>', wl)
    assert out == '<p style="color:red; font-weight:bold">Hello</p>'


def test_drops_style_when_nothing_remains():
    wl = (W.Whitelist().add_tags("p").add_attributes("p", "style")
          .add_css_properties("p", "color"))
    assert clean('<p style="position:absolute">Hello</p>', wl) == "<p>Hello</p>"


def test_all_pseudo_css_properties():
    wl = (W.Whitelist().add_tags("div", "span").add_attributes(":all", "style")
          .add_css_properties(":all", "color"))
    out = sn(clean('<div style="color:red; position:absolute">One</div>'
                   '<span style="font-weight:bold; color:blue">Two</span>', wl))
    assert out == '<div style="color:red">One</div><span style="color:blue">Two</span>'


def test_css_xss_vectors_dropped():
    wl = (W.Whitelist().add_tags("p").add_attributes("p", "style")
          .add_css_properties("p", "color", "background"))
    assert clean('<p style="background:url(javascript:alert(1))">x</p>', wl) == "<p>x</p>"
    assert clean('<p style="color:expression(alert(1))">x</p>', wl) == "<p>x</p>"


def test_css_escape_bypass_blocked():
    """CSS backslash escapes must not smuggle url(/expression( past the
    style filter (ADVICE round 1)."""
    from swiftsoup_spark.clean.whitelist import _sanitize_style
    allowed = {"background", "color", "width"}
    assert _sanitize_style(
        "background:\\75rl(javascript:alert(1))", allowed) is None
    assert _sanitize_style(
        "color:expression\\28 alert(1)\\29", allowed) is None
    assert _sanitize_style(
        "background:\\000075rl(javascript:x)", allowed) is None
    # benign escapes keep working
    assert _sanitize_style("width:10px", allowed) == "width:10px"
