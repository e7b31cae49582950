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
