"""ICU regex dialect parity for :matches/:matchesOwn/[attr~=regex].

The reference compiles selector regexes with NSRegularExpression (ICU)
— Pattern.swift:26-39. Python 3.11 re natively accepts ICU's possessive
quantifiers / atomic groups / \\uXXXX; swiftsoup_spark.select.icu
translates the rest (\\p{...} property classes, \\x{...} hex escapes).
"""

import re

import pytest

from swiftsoup_spark import api
from swiftsoup_spark.select import icu


# --- translation unit tests -------------------------------------------------

@pytest.mark.parametrize("pattern,hit,miss", [
    (r"\p{Lu}", "aBc", "abc 123"),
    (r"\p{Ll}", "AbC", "ABC"),
    (r"\p{L}", "1é2", "123 ,;"),
    (r"\P{L}", "abc5", "abcé"),
    (r"\pN", "x7", "xyz"),
    (r"\p{Nd}", "٣", "abc"),           # arabic-indic digit
    (r"\p{Alpha}+", "wörd", "123"),
    (r"\p{Digit}", "a3", "abc"),
    (r"\p{Alnum}+", "a1", "  ,"),
    (r"\p{Punct}", "a,b", "ab1"),
    (r"\p{Upper}", "aQ", "aq"),
    (r"\p{IsUpper}", "Q", "q"),             # Is- prefix form
    (r"\p{^L}", "a5", "aé"),                # ICU inline negation
    (r"\p{WhiteSpace}", "a b", "ab"),
    (r"[\p{L}\d]+$", "aÁ9", "!!"),          # property inside a class
    (r"\x{1F600}", "hi \U0001F600", "hi"),  # brace hex escape, astral
    (r"\x{41}", "cAt", "cot"),
    (r"a*+b", "aaab", "aaac"),              # possessive (native 3.11)
    (r"(?>a+)b", "aab", "aac"),             # atomic group (native 3.11)
    (r"(?i)the rain", "The Rain in spain", "thunder"),
])
def test_icu_dialect(pattern, hit, miss):
    p = icu.compile(pattern)
    assert p.search(hit) is not None
    assert p.search(miss) is None


def test_plain_patterns_unchanged():
    # no \p / \x{: translate is the identity
    for pat in [r"\d+", r"\w+\s+\(\w+\)", r"(?i)^rain$", r"[0-9,]+",
                r"a\\p", r"[\]x]"]:
        assert icu.translate(pat) == pat


def test_unsupported_script_raises():
    # common scripts now resolve (test_icu_scripts.py); only names outside
    # the generated table stay loud errors
    assert icu.compile(r"\p{Greek}").search("Ω")
    with pytest.raises(re.error, match="unsupported ICU property"):
        icu.compile(r"\p{Tagbanwa}")


def test_unterminated_brace_raises():
    with pytest.raises(re.error):
        icu.compile(r"\p{Lu")


def test_long_category_names():
    assert icu.compile(r"\p{Uppercase_Letter}").search("Q")
    assert icu.compile(r"\p{Decimal_Number}").search("7")
    assert icu.compile(r"\p{gc=Lu}").search("Q")


# --- through the selector engine --------------------------------------------

HTML = ("<html><body>"
        "<p>the rain IN spain</p>"
        "<p>lowercase only</p>"
        "<p>brïng 42 umbrellas</p>"
        "<div title='Ärger'>x</div>"
        "</body></html>")


def test_matches_property_class():
    doc = api.parse(HTML)
    ps = doc.select(r"p:matches(\p{Lu}+)")
    assert [e.text() for e in ps] == ["the rain IN spain"]


def test_matches_own_digits_vs_property():
    doc = api.parse(HTML)
    assert len(doc.select(r"p:matchesOwn(\p{Nd}\p{Nd})")) == 1
    assert len(doc.select(r"p:matchesOwn(\p{Lu})")) == 1


def test_attr_matching_icu():
    doc = api.parse(HTML)
    assert len(doc.select(r"div[title~=\p{Lu}]")) == 1
    assert len(doc.select(r"div[title~=\p{Nd}]")) == 0


def test_matches_possessive_through_engine():
    doc = api.parse(HTML)
    # possessive quantifier passes straight through to re
    assert len(doc.select(r"p:matches(ra*+in)")) == 1


def test_reference_selector_cases_still_pass():
    # SelectorTest.swift:916-940 common-dialect cases (unchanged behavior)
    doc = api.parse("<p id=1>The <i>Rain</i></p> <p id=2>There are 99 "
                    "bottles.</p> <p id=3>Harder (this)</p> <p id=4>Rain</p>")
    assert len(doc.select(r"p:matches(The rain)")) == 0
    assert len(doc.select(r"p:matches((?i)the rain)")) == 1
    assert len(doc.select(r"p:matches((?i)^rain$)")) == 1
    assert len(doc.select(r"p:matches(\d+)")) == 1
    assert len(doc.select(r"p:matches(\w+\s+\(\w+\))")) == 1
    assert len(doc.select(r"p:matches((?i)the):has(i)")) == 1
