"""Entity decode/encode parity, ported from the reference EntitiesTest
(/root/reference/Tests/SwiftSoupTests/EntitiesTest.swift). UTF-8 output
charset only (the pipeline's output encoding)."""

from swiftsoup_spark.kernel.entities import escape, unescape
from swiftsoup_spark import parse


def test_escape_utf8():
    text = "Hello &<> Å å π 新 there ¾ © »"
    assert escape(text) == "Hello &amp;&lt;&gt; Å å π 新 there ¾ © »"
    assert unescape(escape(text)) == text


def test_unescape():
    text = ("Hello &AElig; &amp;&LT&gt; &reg &angst; &angst &#960; &#960 "
            "&#x65B0; there &! &frac34; &copy; &COPY;")
    assert unescape(text) == "Hello Æ &<> ® Å &angst π π 新 there &! ¾ © ©"
    assert unescape("&0987654321; &unknown") == "&0987654321; &unknown"


def test_strict_unescape():
    text = "Hello &amp= &amp;"
    assert unescape(text, strict=True) == "Hello &amp= &"
    assert unescape(text) == "Hello &= &"


def test_multipoint_entities():
    assert unescape("&nparsl;") == "⫽⃥"
    assert unescape("&npolint; &qfr;") == "⨔ 𝔮"


def test_case_sensitive():
    assert unescape("&Uuml; &uuml; &amp; &AMP") == "Ü ü & &"


def test_numeric_quote_replacements():
    assert unescape("&#92; &#36;") == "\\ $"


def test_in_attribute_suppression():
    # legacy no-semicolon ref followed by '=' or alnum is NOT decoded in attrs
    doc = parse('<a href="?a=b&amp=c&copy=d">x</a>')
    assert doc.select("a")[0].attr("href") == "?a=b&amp=c&copy=d"
    doc2 = parse('<a href="?a=b&amp;=c">x</a>')
    assert doc2.select("a")[0].attr("href") == "?a=b&=c"


def test_windows1252_remap():
    # WHATWG numeric remap of C1 range
    assert unescape("&#128;") == "€"
    assert unescape("&#x80;") == "€"


def test_null_and_out_of_range():
    assert unescape("&#0;") == "�"
    assert unescape("&#x110000;") == "�"


def test_nbsp_roundtrip():
    assert escape("a\xa0b") == "a&nbsp;b"
    assert unescape("a&nbsp;b") == "a\xa0b"
