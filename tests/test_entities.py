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


# --- escape modes + charset fallback (reference EntitiesTest.testEscape,
# testEscapeSupplementaryCharacter; Entities.swift:217-241,485-1100) ------

def test_escape_ascii_base():
    from swiftsoup_spark.kernel.entities import escape
    text = "Hello &<> \xc5 \xe5 π 新 there \xbe \xa9 \xbb"
    assert escape(text, charset="ascii", escape_mode="base") == (
        "Hello &amp;&lt;&gt; &Aring; &aring; &#x3c0; &#x65b0; "
        "there &frac34; &copy; &raquo;")


def test_escape_ascii_extended():
    from swiftsoup_spark.kernel.entities import escape
    text = "Hello &<> \xc5 \xe5 π 新 there \xbe \xa9 \xbb"
    assert escape(text, charset="ascii", escape_mode="extended") == (
        "Hello &amp;&lt;&gt; &angst; &aring; &pi; &#x65b0; "
        "there &frac34; &copy; &raquo;")


def test_escape_ascii_xhtml():
    from swiftsoup_spark.kernel.entities import escape
    text = "Hello &<> \xc5 \xe5 π 新 there \xbe \xa9 \xbb"
    assert escape(text, charset="ascii", escape_mode="xhtml") == (
        "Hello &amp;&lt;&gt; &#xc5; &#xe5; &#x3c0; &#x65b0; "
        "there &#xbe; &#xa9; &#xbb;")


def test_escape_utf8_passthrough():
    from swiftsoup_spark.kernel.entities import escape
    text = "Hello &<> \xc5 \xe5 π 新 there \xbe \xa9 \xbb"
    expected = ("Hello &amp;&lt;&gt; \xc5 \xe5 π 新 "
                "there \xbe \xa9 \xbb")
    for mode in ("base", "extended", "xhtml"):
        got = escape(text, charset="utf-8", escape_mode=mode)
        # nbsp-free text: modes only differ on charset fallback
        assert got == expected, mode


def test_escape_roundtrip():
    from swiftsoup_spark.kernel.entities import escape, unescape
    text = "Hello &<> \xc5 \xe5 π 新 there \xbe \xa9 \xbb"
    for mode in ("base", "extended", "xhtml"):
        for cs in ("ascii", "utf-8"):
            assert unescape(escape(text, charset=cs, escape_mode=mode)) == text


def test_escape_supplementary_character():
    from swiftsoup_spark.kernel.entities import escape
    text = "\U000210c1"
    assert escape(text, charset="ascii", escape_mode="base") == "&#x210c1;"
    assert escape(text, charset="utf-8", escape_mode="base") == text


def test_serializer_ascii_charset():
    from swiftsoup_spark.api import parse
    from swiftsoup_spark.kernel.serializer import OutputSettings, inner_html
    d = parse("<p>caf\xe9</p>")
    body = d.body()
    assert inner_html(d.arena, body.id,
                      OutputSettings(charset="ascii")) == "<p>caf&eacute;</p>"
    assert inner_html(d.arena, body.id,
                      OutputSettings()) == "<p>caf\xe9</p>"
