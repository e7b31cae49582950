"""Attribute parsing parity, ported from the reference AttributeParseTest
(/root/reference/Tests/SwiftSoupTests/AttributeParseTest.swift)."""

from swiftsoup_spark import parse


def _attrs(el):
    return el.arena.attrs[el.id] or {}


def test_parses_rough_attribute_string():
    html = "<a id=\"123\" class=\"baz = 'bar'\" style = 'border: 2px'qux zim foo = 12 mux=18 />"
    el = parse(html).select("a")[0]
    a = _attrs(el)
    assert len(a) == 7
    assert a["id"] == "123"
    assert a["class"] == "baz = 'bar'"
    assert a["style"] == "border: 2px"
    assert a["qux"] is None and a["zim"] is None
    assert a["foo"] == "12"
    assert a["mux"] == "18"


def test_handles_newlines_and_returns():
    html = "<a\r\nfoo='bar\r\nqux'\r\nbar\r\n=\r\ntwo>One</a>"
    el = parse(html).select("a")[0]
    assert len(_attrs(el)) == 2
    assert el.attr("foo") == "bar\r\nqux"
    assert el.attr("bar") == "two"


def test_parses_empty_string():
    el = parse("<a />").select("a")[0]
    assert _attrs(el) == {}


def test_can_start_with_eq():
    el = parse("<a =empty />").select("a")[0]
    a = _attrs(el)
    assert list(a) == ["=empty"]
    assert el.attr("=empty") == ""


def test_strict_attribute_unescapes():
    html = ("<a id=1 href='?foo=bar&mid&lt=true'>One</a> "
            "<a id=2 href='?foo=bar&lt;qux&lg=1'>Two</a>")
    els = parse(html).select("a")
    assert els[0].attr("href") == "?foo=bar&mid&lt=true"
    assert els[1].attr("href") == "?foo=bar<qux&lg=1"


def test_more_attribute_unescapes():
    els = parse("<a href='&wr_id=123&mid-size=true&ok=&wr'>Check</a>").select("a")
    assert els[0].attr("href") == "&wr_id=123&mid-size=true&ok=&wr"


def test_query_string_keeps_ampersands():
    el = parse('<a href="/search?q=1&x=2&y=3"></a>').select("a")[0]
    assert el.attr("href") == "/search?q=1&x=2&y=3"


def test_query_string_decodes_entities():
    el = parse('<a href="/search?q=1&amp;x=2&amp;y=3"></a>').select("a")[0]
    assert el.attr("href") == "/search?q=1&x=2&y=3"


def test_parses_boolean_attributes():
    html = '<a normal="123" boolean empty=""></a>'
    el = parse(html).select("a")[0]
    assert el.attr("normal") == "123"
    assert el.attr("boolean") == ""
    assert el.attr("empty") == ""
    a = _attrs(el)
    assert len(a) == 3
    assert a["boolean"] is None  # valueless (BooleanAttribute)
    assert a["empty"] == ""
    assert el.outer_html() == html


def test_multibyte_attribute_values():
    el = parse('<a title="你&amp;好" href=hello&amp;world data=πβ></a>').select("a")[0]
    assert el.attr("title") == "你&好"
    assert el.attr("href") == "hello&world"
    assert el.attr("data") == "πβ"


def test_before_attribute_name_skips_whitespace():
    el = parse("<a  \t\r\nfoo=bar></a>").select("a")[0]
    assert el.attr("foo") == "bar"


def test_retains_slash_from_attribute_name():
    doc = parse("<img /onerror='doMyJob'/>")
    assert len(doc.select("img[onerror]")) != 0
    assert doc.body().html() == '<img onerror="doMyJob" />'


def test_attribute_names_lowercased():
    el = parse("<a HREF=x DATA-Foo=y></a>").select("a")[0]
    assert el.attr("href") == "x"
    assert el.attr("data-foo") == "y"


def test_dupe_attribute_first_wins():
    el = parse("<a href=one href=two></a>").select("a")[0]
    assert el.attr("href") == "one"


# ported reference AttributeParseTest edge cases (AttributeParseTest.swift:123-162)

def test_attribute_value_after_quoted_with_followup():
    d = parse('<a href="x"/p=1></a>')
    a = d.select("a")[0]
    assert a.attr("href") == "x"
    assert a.attr("p") == "1"


def test_unquoted_value_starts_with_equals_or_lt():
    assert parse("<p foo==bar></p>").select("p")[0].attr("foo") == "=bar"
    assert parse("<p foo=<bar></p>").select("p")[0].attr("foo") == "<bar"


def test_attribute_name_with_null_gets_replacement():
    p = parse("<p a\x00b=1></p>").select("p")[0]
    assert p.has_attr("a�b")
    assert p.attr("a�b") == "1"


def test_attribute_name_includes_quote_character():
    a = parse('<a data-abc"="foo"></a>').select("a")[0]
    assert a.has_attr('data-abc"')
    assert a.attr('data-abc"') == "foo"


def test_attribute_value_preserves_comment_tag_text():
    d = parse('<div><comment><img src="</comment>'
              '<img src=x onerror=alert(38)//">x</div>')
    assert d.select("img")[0].attr("src") == (
        "</comment><img src=x onerror=alert(38)//")


# ---- ported from the reference AttributesTest -----------------------------
# (/root/reference/Tests/SwiftSoupTests/AttributesTest.swift); the
# reference's Attributes object maps to the arena's insertion-ordered
# per-element dict, so the cases assert through the Element surface.

def test_parsed_attributes_materialize_and_mutate():
    html = '<a href="/one" data-foo="bar" disabled class="A B"></a>'
    el = parse(html).select("a")[0]
    a = _attrs(el)
    assert len(a) == 4
    assert a["href"] == "/one"
    assert a["data-foo"] == "bar"
    assert a["disabled"] is None          # boolean attribute
    assert el.attr("disabled") == ""      # renders empty through attr()
    assert a["class"] == "A B"
    el.set_attr("data-foo", "baz")
    assert el.attr("data-foo") == "baz"


def test_attribute_insertion_order_preserved():
    html = '<a Tot="raul" Hello="pismuth" data-name="Jsoup"></a>'
    el = parse(html).select("a")[0]
    assert list(_attrs(el).keys()) == ["tot", "hello", "data-name"]


def test_preserve_case_attribute_keys():
    from swiftsoup_spark.api import parse_html
    from swiftsoup_spark.kernel.tokenizer import PRESERVE_CASE
    doc = parse_html('<a HREF="/one" Data-Foo="bar"></a>',
                     settings=PRESERVE_CASE)
    el = doc.select("a")[0]
    assert el.attr("HREF") == "/one"
    assert el.attr("Data-Foo") == "bar"


def test_attributes_html_serialization():
    html = '<a href="/one" disabled data-foo="a&amp;b"></a>'
    el = parse(html).select("a")[0]
    assert el.outer_html() == '<a href="/one" disabled data-foo="a&amp;b"></a>'


def test_remove_attrs():
    el = parse('<a one="1" two="2" data-x="3"></a>').select("a")[0]
    el.remove_attr("two")
    el.remove_attr("data-x")
    a = _attrs(el)
    assert len(a) == 1 and "one" in a
