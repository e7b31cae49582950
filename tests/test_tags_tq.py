"""Tag-trait and token-queue parity, ported from the reference TagTest
and TokenQueueTest (/root/reference/Tests/SwiftSoupTests/TagTest.swift,
/root/reference/Tests/SwiftSoupTests/TokenQueueTest.swift).

The reference's Tag registry maps to TagRegistry (interned ids + trait
bitmask); its TokenQueue maps to the query parser's _TQ plus the raw
selector-argument unescape."""

from swiftsoup_spark.kernel.tags import GLOBAL_TAGS
from swiftsoup_spark.select.queryparser import _TQ, _unescape_arg


def _tid(name):
    return GLOBAL_TAGS.intern(name)


# ---- TagTest --------------------------------------------------------------

def test_case_normalization_interns_same_tag():
    # html default settings lowercase tag names: P == p after normalize
    assert GLOBAL_TAGS.intern("P".lower()) == GLOBAL_TAGS.intern("p")


def test_div_semantics():
    t = _tid("div")
    assert GLOBAL_TAGS.is_block(t)
    assert GLOBAL_TAGS.format_as_block(t)


def test_p_semantics():
    t = _tid("p")
    assert GLOBAL_TAGS.is_block(t)
    assert not GLOBAL_TAGS.format_as_block(t)


def test_img_semantics():
    t = _tid("img")
    assert not GLOBAL_TAGS.is_block(t)      # inline
    assert GLOBAL_TAGS.is_empty(t)          # void/self-closing
    assert GLOBAL_TAGS.preserve_ws(_tid("pre"))


def test_default_semantics_unknown_tag():
    t1 = GLOBAL_TAGS.intern("foo")
    t2 = GLOBAL_TAGS.intern("foo")
    assert t1 == t2
    assert not GLOBAL_TAGS.is_block(t1)     # unknown -> inline
    assert not GLOBAL_TAGS.is_known(t1)


# ---- TokenQueueTest -------------------------------------------------------

def test_chomp_balanced():
    tq = _TQ("(one (two) three) four")
    assert tq.chomp_balanced("(", ")") == "one (two) three"
    assert tq.s[tq.pos:] == " four"


def test_chomp_escaped_balanced():
    tq = _TQ("(one (two) \\( \\) \\) three) four")
    guts = tq.chomp_balanced("(", ")")
    assert guts == "one (two) \\( \\) \\) three"
    assert _unescape_arg(guts) == "one (two) ( ) ) three"
    assert tq.s[tq.pos:] == " four"


def test_chomp_balanced_matches_as_much_as_possible():
    tq = _TQ("(something(or another")
    assert tq.chomp_balanced("(", ")") == "something(or another"


def test_unescape():
    assert _unescape_arg("one \\( \\) \\\\") == "one ( ) \\"


# ---- ported from the reference ParseSettingsTest --------------------------

def test_parse_settings_case_support():
    """(/root/reference/Tests/SwiftSoupTests/ParseSettingsTest.swift)
    The four tag/attr case combinations drive parse-level normalization."""
    from swiftsoup_spark.api import parse_html
    from swiftsoup_spark.kernel.tokenizer import ParseSettings

    html = '<FOO Bar="1">x</FOO>'
    both_on = parse_html(html, settings=ParseSettings(True, True))
    both_off = parse_html(html, settings=ParseSettings(False, False))
    tag_on = parse_html(html, settings=ParseSettings(True, False))
    attr_on = parse_html(html, settings=ParseSettings(False, True))

    def el(doc):
        return doc.select("foo")[0]

    assert "FOO" in el(both_on).outer_html()
    assert el(both_on).attr("Bar") == "1"
    assert "<foo" in el(both_off).outer_html()
    assert el(both_off).attr("bar") == "1"
    assert "FOO" in el(tag_on).outer_html()
    assert el(tag_on).attr("bar") == "1"
    assert "<foo" in el(attr_on).outer_html()
    assert el(attr_on).attr("Bar") == "1"


def test_query_parser_cache():
    """(/root/reference/Tests/SwiftSoupTests/QueryParserCacheTest.swift)
    Repeated parses of the same selector hit the compile cache."""
    from swiftsoup_spark.select.queryparser import parse_query
    e1 = parse_query("div.x > p[k=v]")
    e2 = parse_query("div.x > p[k=v]")
    assert e1 is e2                  # cached instance
