"""Second parser batch: self-closing known tags, solidus handling,
comment-before-html, truncated-input robustness
(reference HtmlParserTest.swift:445-777)."""

import re

import pytest

from swiftsoup_spark import parse


def sn(s: str) -> str:
    return re.sub(r"\n\s*", "", s)


def test_handles_known_empty_blocks():
    h = ("<div id='1' /><script src='/foo' /><div id=2><img /><img></div>"
         "<a id=3 /><i /><foo /><foo>One</foo> <hr /> hr text <hr> hr text two")
    doc = parse(h)
    assert sn(doc.body().html()) == (
        '<div id="1"></div><script src="/foo"></script><div id="2">'
        '<img /><img /></div><a id="3"></a><i></i><foo /><foo>One</foo> <hr /> '
        'hr text <hr /> hr text two')


def test_known_empty_noframes_style_title():
    for tag in ("noframes", "style", "title"):
        h = f"<html><head><{tag} /><meta name=foo></head><body>One</body></html>"
        doc = parse(h)
        assert sn(doc.outer_html()) == (
            f'<html><head><{tag}></{tag}><meta name="foo" /></head>'
            f'<body>One</body></html>')


def test_solidus_at_attribute_end():
    doc = parse("<a href=/>link</a>")
    assert doc.body().html() == '<a href="/">link</a>'


def test_solidus_in_href():
    doc = parse("<a class=lp href=/lib/14160711/>link text</a>")
    a = doc.select("a")[0]
    assert a.text() == "link text"
    assert a.attr("href") == "/lib/14160711/"


def test_comment_before_html():
    doc = parse("<!-- comment --><!-- comment 2 --><p>One</p>")
    assert sn(doc.outer_html()) == ("<!-- comment --><!-- comment 2 -->"
                                    "<html><head></head><body><p>One</p></body></html>")


def test_empty_td_tag():
    doc = parse("<table><tr><td>One</td><td id='2' /></tr></table>")
    assert doc.select("tr")[0].html() == '<td>One</td>\n<td id="2"></td>'


def test_span_in_tbody():
    doc = parse("<table><tbody><span class='1'><tr><td>One</td></tr>"
                "<tr><td>Two</td></tr></span></tbody></table>")
    assert len(doc.select("span")[0].children()) == 0  # span fostered + closed
    assert len(doc.select("table")) == 1


def test_unterminated_entity_no_crash():
    doc = parse("<a href='&lt")
    assert doc.body().text() == ""


TRUNCATED = [
    '<a href="', '<a href="&', '<a href="&amp', '<a href="&amp;',
    "<a href='test&amp", "<div class=", '<div class="test', "<!DOCTYPE",
    "<!DOCTYPE html", "<!-- comment", "<script>var x = ", "<style>.foo {",
    '<img src="data:image/png;base64,', '<a href="https://example.com?a=1&',
    '<a href="https://example.com?a=1&amp', "<p>Hello \xc3",
    "<p>test</p><img src=\"foo&", "<table><tr><td>cell&amp",
    "<", "< ", "</", "<a", "<a ", "<a h", "<a href", "<a href=", "<a href='",
    "&", "&amp", "&#", "&#x", "&#x4", "&#65",
]


@pytest.mark.parametrize("html", TRUNCATED)
def test_truncated_html_does_not_crash(html):
    doc = parse(html)
    assert doc.body() is not None


def test_positioned_parse_errors():
    """Bounded positioned error list (reference ParseErrorList.swift,
    Parser.swift:69-90: off by default, (pos, msg) entries, max cap)."""
    from swiftsoup_spark.api import parse

    html = '<div class="a" class="b">x</div></span><td>y'
    d = parse(html, max_errors=16)
    errs = d.errors()
    assert [e.pos for e in errs] == [24, 32, 39]
    assert "Duplicate attribute" in errs[0].msg
    assert "end token 'span'" in errs[1].msg
    assert "start token 'td'" in errs[2].msg
    # count parity: the numeric counter tracks tokenizer errors
    assert d.arena.errors == 1

    # tracking off by default
    d2 = parse(html)
    assert list(d2.errors()) == []
    assert d2.arena.errors == 1

    # bounded at max_errors
    d3 = parse("<p a=1 a=2 a=3 a=4 a=5>", max_errors=2)
    assert len(d3.errors()) == 2
