"""Text-extraction parity cases ported from the reference ElementTest
(/root/reference/Tests/SwiftSoupTests/ElementTest.swift:56-119,1021-1031).
These define the byte-identical text() contract."""

from swiftsoup_spark import parse


def test_get_text():
    doc = parse("<p>Hello <b>there</b> now")
    assert doc.text() == "Hello there now"
    p = doc.select("p")[0]
    assert p.text() == "Hello there now"
    assert p.own_text() == "Hello now"


def test_normalises_text():
    doc = parse("<p>Hello<p>There.</p> \n <p>Here <b>is</b> \n s<b>om</b>e text.")
    assert doc.text() == "Hello There. Here is some text."


def test_keeps_nbsp_collapsible():
    # U+00A0 collapses like whitespace in text()
    doc = parse("<p>a b\tc</p><p>d</p>")
    assert doc.text() == "a b c d"


def test_keeps_pre_text():
    doc = parse("<p>Hello \n \n there.</p> <div><pre>  What's \n\n  that?</pre>")
    assert doc.text() == "Hello there.   What's \n\n  that?"


def test_keeps_pre_text_in_code():
    doc = parse("<pre><code>code\n\ncode</code></pre>")
    assert doc.text() == "code\n\ncode"
    assert doc.body().html() == "<pre><code>code\n\ncode</code></pre>"


def test_br_is_space():
    doc = parse("<p>Hello<br>there</p>")
    assert doc.text() == "Hello there"
    doc = parse("<p>Hello <br> there</p>")
    assert doc.text() == "Hello there"


def test_text_nodes_raw():
    doc = parse("<p>One <span>Two</span> Three <br> Four</p>")
    p = doc.select("p")[0]
    texts = [n.arena.text[n.id] for n in p.text_nodes()]
    assert texts == ["One ", " Three ", " Four"]


def test_whole_text():
    doc = parse("<p> Hello\nthere &amp;  ")
    p = doc.select("p")[0]
    assert p.whole_text() == " Hello\nthere &  "


def test_own_text_with_br():
    doc = parse("<p>Hello <b>there</b> <br> now</p>")
    p = doc.select("p")[0]
    assert p.own_text() == "Hello now"
    assert p.text() == "Hello there now"


def test_data():
    doc = parse("<div><script>a < b</script><style>x { }</style>One</div>")
    div = doc.select("div")[0]
    assert div.data() == "a < bx { }"
    assert div.text() == "One"


def test_title():
    doc = parse("<html><head><title>Hello &amp; World</title></head><body>x</body></html>")
    assert doc.title() == "Hello & World"


def test_text_block_boundaries():
    # head-only visitor: a block boundary adds a space on entry, not on exit
    doc = parse("<div>One</div><div>Two</div><span>Three</span><span>Four</span>")
    assert doc.text() == "One TwoThreeFour"


def test_invalid_start_tags_stay_text():
    doc = parse("<div>Hello < There <&amp;></div>")
    assert doc.select("div")[0].text() == "Hello < There <&>"


# ---- ported from the reference StringUtilTest (normalization surface) -----
# (/root/reference/Tests/SwiftSoupTests/StringUtilTest.swift); join /
# padding / isNumeric are stdlib-subsumed; the parse-visible whitespace
# semantics are what we pin here.

def test_normalise_whitespace_through_parse():
    assert parse("   hello   \r \n  there    \n").text() == "hello there"
    assert parse("hello\nthere").text() == "hello there"
    assert parse("hello").text() == "hello"


def test_normalise_whitespace_handles_astral_chars():
    # U+2A6B2 (surrogate pair in UTF-16 hosts) followed by combining
    # chars; normalization must not split multi-unit characters
    s = "\U0002A6B2か゚  1"
    assert parse(s).text() == "\U0002A6B2か゚ 1"


def test_nbsp_is_not_collapsible_whitespace_in_pre():
    # nbsp normalizes to space in flow text but is preserved in <pre>
    assert parse("a\xa0b \t c\n").text() == "a b c"
    assert parse("<pre>a\xa0b</pre>").text() == "a\xa0b"
