"""Ported reference DocumentTest / DocumentTypeTest cases
(/root/reference/Tests/SwiftSoupTests/DocumentTest.swift,
DocumentTypeTest.swift)."""

import re

from swiftsoup_spark.api import parse
from swiftsoup_spark.kernel.serializer import OutputSettings, inner_html


def strip_nl(s: str) -> str:
    return re.sub(r"\n\s*", "", s)


def test_set_text_preserves_document_structure():
    d = parse("<p>Hello</p>")
    d.body().set_text("Replaced")
    assert d.body().text() == "Replaced"
    assert len(d.select("head")) == 1


def test_titles():
    no_title = parse("<p>Hello</p>")
    with_title = parse("<title>First</title><title>Ignore</title><p>Hello</p>")

    assert no_title.title() == ""
    no_title.set_title("Hello")
    assert no_title.title() == "Hello"
    assert no_title.select("title")[0].text() == "Hello"

    assert with_title.title() == "First"
    with_title.set_title("Hello")
    assert with_title.title() == "Hello"
    assert with_title.select("title")[0].text() == "Hello"

    normalise_title = parse("<title>   Hello\nthere   \n   now   \n")
    assert normalise_title.title() == "Hello there now"


def test_output_encoding():
    """DocumentTest.testOutputEncoding: charset+escape-mode plumbing."""
    d = parse("<p title=π>π & < > </p>")
    body = d.body()
    assert inner_html(d.arena, body.id, OutputSettings()) == (
        '<p title="π">π &amp; &lt; &gt; </p>')
    assert inner_html(d.arena, body.id, OutputSettings(charset="ascii")) == (
        '<p title="&#x3c0;">&#x3c0; &amp; &lt; &gt; </p>')
    assert inner_html(
        d.arena, body.id,
        OutputSettings(charset="ascii", escape_mode="extended")) == (
        '<p title="&pi;">&pi; &amp; &lt; &gt; </p>')


def test_xhtml_references():
    d = parse("&lt; &gt; &amp; &quot; &apos; &times;")
    body = d.body()
    assert inner_html(d.arena, body.id,
                      OutputSettings(escape_mode="xhtml")) == (
        "&lt; &gt; &amp; \" ' ×")


def test_normalises_structure():
    d = parse("<html><head><script>one</script><noscript><p>two</p>"
              "</noscript></head><body><p>three</p></body><p>four</p></html>")
    assert strip_nl(d.outer_html()) == (
        "<html><head><script>one</script><noscript>&lt;p&gt;two</noscript>"
        "</head><body><p>three</p><p>four</p></body></html>")


def test_noscript_img_becomes_text():
    """HtmlParserTest.swift:592-594."""
    d = parse("<html><head><noscript><img src='foo'></noscript></head>"
              "<body><p>Hello</p></body></html>")
    assert strip_nl(d.outer_html()) == (
        '<html><head><noscript>&lt;img src="foo"&gt;</noscript></head>'
        "<body><p>Hello</p></body></html>")


def test_doctype_outer_html():
    """DocumentTypeTest.testOuterHtmlGeneration shapes."""
    d = parse("<!DOCTYPE html><p>x</p>")
    assert d.outer_html().startswith("<!doctype html>")
    d2 = parse('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
               '"http://www.w3.org/TR/html4/strict.dtd"><p>x</p>')
    first = d2.outer_html().splitlines()[0]
    assert "-//W3C//DTD HTML 4.01//EN" in first


def test_resolve_reference_cases():
    """StringUtilTest.testResolvesRelativeUrls (full set)."""
    from swiftsoup_spark.clean.whitelist import resolve_url as r
    assert r("http://example.com", "./one/two?three") == "http://example.com/one/two?three"
    assert r("http://example.com?one", "./one/two?three") == "http://example.com/one/two?three"
    assert r("http://example.com", "./one/two?three#four") == "http://example.com/one/two?three#four"
    assert r("http://example.com/", "https://example.com/one") == "https://example.com/one"
    assert r("http://example.com/two/", "../one/two.html") == "http://example.com/one/two.html"
    assert r("https://example.com/", "//example2.com/one") == "https://example2.com/one"
    assert r("https://example.com:8080", "./one") == "https://example.com:8080/one"
    assert r("http://example.com/", "https://example2.com/one") == "https://example2.com/one"
    assert r("wrong", "https://example.com/one") == "https://example.com/one"
    assert r("https://example.com/one", "") == "https://example.com/one"
    assert r("wrong", "also wrong") == ""
    assert r("ftp://example.com/two/", "../one") == "ftp://example.com/one"
    assert r("ftp://example.com/one/", "./two.c") == "ftp://example.com/one/two.c"
    assert r("ftp://example.com/one/", "two.c") == "ftp://example.com/one/two.c"
