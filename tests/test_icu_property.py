"""Property check for the ICU \\p{...} translation: for every sampled
code point, membership in the translated character class must agree
with unicodedata.category — an independent assertion that the cached
run-length sweep and the range->class emission are both faithful."""

import re
import unicodedata

from swiftsoup_spark.select import icu

# deterministic stratified sample: every 211th code point (hits all
# planes, ~5.2k points) plus boundary-heavy low ranges
SAMPLE = list(range(0, 0x110000, 211)) + list(range(0, 0x300))


def _agrees(pattern: str, predicate) -> None:
    p = icu.compile(pattern)
    for cp in SAMPLE:
        ch = chr(cp)
        if 0xD800 <= cp <= 0xDFFF:
            continue  # lone surrogates aren't valid text
        assert (p.fullmatch(ch) is not None) == predicate(ch), hex(cp)


def test_lu_matches_category():
    _agrees(r"\p{Lu}", lambda c: unicodedata.category(c) == "Lu")


def test_l_group_matches_category_prefix():
    _agrees(r"\p{L}", lambda c: unicodedata.category(c).startswith("L"))


def test_negated_n_is_exact_complement():
    _agrees(r"\P{N}", lambda c: not unicodedata.category(c).startswith("N"))


def test_nd_matches_decimal_digits():
    _agrees(r"\p{Nd}", lambda c: unicodedata.category(c) == "Nd")


def test_punct_matches_p_group():
    _agrees(r"\p{Punct}", lambda c: unicodedata.category(c).startswith("P"))


def test_inside_class_union_is_exact():
    pred = lambda c: (unicodedata.category(c).startswith("L")
                      or c in "0123456789")
    _agrees(r"[\p{L}0-9]", pred)


# --- binary properties (derived, not category approximations) ----------

def test_uppercase_binary_property():
    # derived Uppercase includes Other_Uppercase (e.g. Roman numeral
    # U+2160 is category Nl but Uppercase) — str.isupper is the oracle
    _agrees(r"\p{Uppercase}", lambda c: c.isupper())
    p = icu.compile(r"\p{Uppercase}")
    assert p.fullmatch("Ⅰ")              # ROMAN NUMERAL ONE
    assert not icu.compile(r"\p{Lu}").fullmatch("Ⅰ")


def test_lowercase_binary_property():
    _agrees(r"\p{Lowercase}", lambda c: c.islower())
    assert icu.compile(r"\p{Lowercase}").fullmatch("ⅰ")


def test_cased_binary_property():
    _agrees(r"\p{Cased}", lambda c: (c.isupper() or c.islower()
                                     or unicodedata.category(c) == "Lt"))


def test_closed_form_binaries():
    nc = icu.compile(r"\p{Noncharacter_Code_Point}")
    for cp in (0xFDD0, 0xFDEF, 0xFFFE, 0xFFFF, 0x1FFFE, 0x10FFFF):
        assert nc.fullmatch(chr(cp)), hex(cp)
    for cp in (0xFDCF, 0xFFFD, 0x41):
        assert not nc.fullmatch(chr(cp)), hex(cp)
    jc = icu.compile(r"\p{Join_Control}")
    assert jc.fullmatch("‌") and jc.fullmatch("‍")
    assert not jc.fullmatch("​")
    bc = icu.compile(r"\p{Bidi_Control}")
    assert bc.fullmatch("‮") and not bc.fullmatch(" ")


def test_negated_binary():
    p = icu.compile(r"\P{Assigned}")
    assert p.fullmatch("\U000E0080")  # unassigned
    assert not p.fullmatch("A")


def test_unsupported_binary_still_loud():
    import pytest
    with pytest.raises(re.error):
        icu.compile(r"\p{Ideographic}")
