"""XML parser path (reference XmlTreeBuilderTest.swift)."""

from swiftsoup_spark import parse
from swiftsoup_spark.api import parse_xml


def test_simple_xml():
    doc = parse_xml("<doc id=2 href='/bar'>Foo <br /><link>One</link><link>Two</link></doc>")
    assert len(doc.select("doc")) == 1
    links = doc.select("link")
    assert [e.text() for e in links] == ["One", "Two"]
    assert doc.select("doc")[0].attr("href") == "/bar"


def test_xml_does_not_force_html_structure():
    doc = parse_xml("<doc><val>One<val>Two</val></bar>Three</doc>")
    # naive builder: start pushes, mismatched end pops to closest match
    assert doc.select("val")[0].text() == "OneTwoThree"
    assert doc.select("val val")[0].text() == "Two"


def test_xml_decl_detected():
    doc = parse("<?xml encoding='UTF-8' ?><body>One</body>")
    assert doc.text() == "One"
    # body is NOT auto-wrapped in html shell by the XML builder
    assert len(doc.select("body")) == 1
    assert doc.select("html") == []


def test_xml_comment_and_cdata():
    doc = parse_xml("<doc><!-- c --><![CDATA[ <raw> ]]></doc>")
    d = doc.select("doc")[0]
    assert d.whole_text() == " <raw> "


def test_xml_case_preserved_tags_are_lowercased_like_reference_default():
    # reference XmlTreeBuilder uses preserveCase settings; our kernel
    # normalizes to lowercase (HTML default) — selectors are lowercase too
    doc = parse_xml("<CHECK>One</CHECK>")
    assert doc.select("check")[0].text() == "One"


def test_parse_settings_preserve_case_html():
    """reference ParseSettings.preserveCase via Parser.settings():
    display names keep source case; dispatch and selectors use the
    normalized (lowercase) name (reference name vs normalName)."""
    from swiftsoup_spark.api import parse_html
    from swiftsoup_spark.kernel.tokenizer import PRESERVE_CASE

    d = parse_html('<DIV CLASS="X"><SpAn Foo="1">t</SpAn></DIV>',
                   settings=PRESERVE_CASE)
    div = d.select("div")[0]          # selectors: normalized name
    assert div.arena.tag_name_display(div.id) == "DIV"
    span = d.select("span")[0]
    assert span.arena.tag_name_display(span.id) == "SpAn"
    assert span.attr("Foo") == "1"    # attr case preserved
    html = d.body().outer_html()
    assert "<DIV" in html and "<SpAn" in html and 'CLASS="X"' in html


def test_xml_preserves_case_like_reference():
    """reference XmlTreeBuilder.defaultSettings == preserveCase
    (XmlTreeBuilder.swift:25-34): tags/attrs keep case, end tags match
    case-sensitively."""
    from swiftsoup_spark.api import parse_xml
    from swiftsoup_spark.kernel.serializer import serialize

    x = parse_xml('<Feed><Entry Id="1">a</Entry><entry>b</entry></Feed>')
    assert serialize(x.arena, 0) == (
        '<Feed><Entry Id="1">a</Entry><entry>b</entry></Feed>')
