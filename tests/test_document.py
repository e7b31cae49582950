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


# --- meta-charset update (reference DocumentTest.swift:226-407) ------------

def _html_doc_with_charset(charset: str):
    """reference createHtmlDocument: shell + <meta charset> +
    <meta name=charset content=...> in head."""
    from swiftsoup_spark.clean.cleaner import _create_shell
    from swiftsoup_spark.kernel.arena import Document
    arena = _create_shell("")
    doc = Document(arena, 0)
    head = doc.head()
    head.append_element("meta", {"charset": charset})
    head.append_element("meta", {"name": "charset", "content": charset})
    return doc


def _xml_doc(version: str, charset: str, add_decl: bool):
    """reference createXmlDocument: <root>node</root> in xml syntax,
    optionally with a leading <?xml?> declaration."""
    from swiftsoup_spark.kernel.arena import (
        Arena, Document, DOCUMENT, TEXT, XMLDECL)
    a = Arena()
    doc_id = a.new_node(DOCUMENT)
    doc = Document(a, doc_id)
    root = doc.append_element("root")
    tid = a.new_node(TEXT, -1, "node")
    a.append_child(root.id, tid)
    doc.output_settings.syntax = "xml"
    if add_decl:
        decl = a.new_node(XMLDECL, -1, "xml",
                          {"version": version, "encoding": charset})
        a.insert_child(doc_id, 0, decl)
    return doc


def test_meta_charset_update_utf8():
    doc = _html_doc_with_charset("changeThis")
    doc.set_update_meta_charset(True)
    doc.set_charset("utf-8")
    expected = ('<html>\n <head>\n  <meta charset="UTF-8" />\n </head>\n'
                ' <body></body>\n</html>')
    assert doc.outer_html() == expected
    meta = doc.select("meta[charset]")[0]
    assert doc.charset() == "utf-8"
    assert meta.attr("charset") == "UTF-8"
    assert doc.output_settings.charset == "utf-8"


def test_meta_charset_update_iso_8859_2():
    doc = _html_doc_with_charset("changeThis")
    doc.set_update_meta_charset(True)
    doc.set_charset("iso8859-2")
    meta = doc.select("meta[charset]")[0]
    assert meta.attr("charset") == "ISO-8859-2"


def test_meta_charset_update_no_charset():
    from swiftsoup_spark.clean.cleaner import _create_shell
    from swiftsoup_spark.kernel.arena import Document
    doc = Document(_create_shell(""), 0)
    doc.set_update_meta_charset(True)
    doc.set_charset("utf-8")
    assert doc.select("meta[charset]")[0].attr("charset") == "UTF-8"
    expected = ('<html>\n <head>\n  <meta charset="UTF-8" />\n </head>\n'
                ' <body></body>\n</html>')
    assert doc.outer_html() == expected


def test_meta_charset_update_disabled():
    from swiftsoup_spark.clean.cleaner import _create_shell
    from swiftsoup_spark.kernel.arena import Document
    doc = Document(_create_shell(""), 0)
    assert doc.outer_html() == ('<html>\n <head></head>\n'
                                ' <body></body>\n</html>')
    assert len(doc.select("meta[charset]")) == 0
    assert doc.update_meta_charset() is False


def test_meta_charset_update_disabled_no_changes():
    doc = _html_doc_with_charset("dontTouch")
    expected = ('<html>\n <head>\n  <meta charset="dontTouch" />\n'
                '  <meta name="charset" content="dontTouch" />\n </head>\n'
                ' <body></body>\n</html>')
    assert doc.outer_html() == expected
    assert doc.select("meta[charset]")[0].attr("charset") == "dontTouch"
    assert doc.select("meta[name=charset]")[0].attr("content") == "dontTouch"


def test_meta_charset_update_enabled_after_charset_change():
    doc = _html_doc_with_charset("dontTouch")
    doc.set_charset("utf-8")   # set_charset itself enables the update
    assert doc.select("meta[charset]")[0].attr("charset") == "UTF-8"
    assert len(doc.select("meta[name=charset]")) == 0


def test_meta_charset_update_cleanup():
    doc = _html_doc_with_charset("dontTouch")
    doc.set_update_meta_charset(True)
    doc.set_charset("utf-8")
    expected = ('<html>\n <head>\n  <meta charset="UTF-8" />\n </head>\n'
                ' <body></body>\n</html>')
    assert doc.outer_html() == expected


def test_meta_charset_update_xml_utf8():
    doc = _xml_doc("1.0", "changeThis", True)
    doc.set_update_meta_charset(True)
    doc.set_charset("utf-8")
    decl = doc.child_nodes()[0]
    assert decl.attr("encoding") == "UTF-8"
    assert decl.attr("version") == "1.0"
    assert doc.charset() == "utf-8"


def test_meta_charset_update_xml_no_decl():
    doc = _xml_doc("1.0", "none", False)
    doc.set_update_meta_charset(True)
    doc.set_charset("utf-8")
    decl = doc.child_nodes()[0]
    assert decl.attr("encoding") == "UTF-8"
    assert decl.attr("version") == "1.0"
    assert '<?xml version="1.0" encoding="UTF-8"?>' in doc.outer_html()


def test_meta_charset_update_xml_disabled_no_changes():
    doc = _xml_doc("dontTouch", "dontTouch", True)
    decl = doc.child_nodes()[0]
    assert decl.attr("encoding") == "dontTouch"
    assert decl.attr("version") == "dontTouch"
    assert '<?xml version="dontTouch" encoding="dontTouch"?>' in doc.outer_html()


def test_meta_charset_disabled_per_default():
    doc = _html_doc_with_charset("none")
    assert doc.update_meta_charset() is False


def test_charset_display_name():
    from swiftsoup_spark.kernel.arena import charset_display_name
    assert charset_display_name("utf-8") == "UTF-8"
    assert charset_display_name("ascii") == "US-ASCII"
    assert charset_display_name("latin-1") == "ISO-8859-1"
    assert charset_display_name("iso8859-2") == "ISO-8859-2"
    assert charset_display_name("cp1252") == "windows-1252"
    assert charset_display_name("iso2022_jp") == "ISO-2022-JP"
