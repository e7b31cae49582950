"""ICU Script property classes in the :matches regex shim.

Reference ``Pattern.swift:1-83`` wraps NSRegularExpression (full ICU), so
``\\p{Greek}``-style Script classes work there natively. The shim resolves
them through a generated exact Script table (select/scripts_data.py,
produced by scripts/gen_script_ranges.py from the public UCD tables
shipped in RE2-via-DuckDB). Fidelity is gated here against RE2 itself:
for every generated script we probe all range endpoints and their
immediate outside neighbors — the exact code points where an
off-by-one or merge bug would show — and require the translated stdlib
pattern to agree with RE2's verdict at each one.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from swiftsoup_spark.select import icu
from swiftsoup_spark.select.scripts_data import SCRIPT_RANGES

_SURROGATES = range(0xD800, 0xE000)


def _re2_matches(con, script: str, cps: list[int]) -> dict[int, bool]:
    rows = con.sql(
        "SELECT c, regexp_matches(chr(CAST(c AS INT)), '^\\p{" + script + "}$') "
        "FROM (SELECT unnest($cps) AS c)", params={"cps": cps}).fetchall()
    return {c: bool(m) for c, m in rows}


# canonical display spelling for the generator's lowercase keys
_DISPLAY = {k: k.capitalize() for k in SCRIPT_RANGES}
_DISPLAY.update({"han": "Han", "yi": "Yi"})


@pytest.mark.parametrize("key", sorted(SCRIPT_RANGES))
def test_script_ranges_agree_with_re2(key):
    script = _DISPLAY[key]
    pat = icu.compile(r"^\p{" + script + r"}$")
    probes: set[int] = set()
    for lo, hi in SCRIPT_RANGES[key]:
        probes.update((lo, hi, lo - 1, hi + 1, (lo + hi) // 2))
    probes = sorted(c for c in probes
                    if 0 <= c <= 0x10FFFF and c not in _SURROGATES)
    con = duckdb.connect()
    want = _re2_matches(con, script, probes)
    for c in probes:
        got = pat.match(chr(c)) is not None
        assert got == want[c], (
            f"\\p{{{script}}} disagrees with RE2 at U+{c:04X}: "
            f"shim={got} re2={want[c]}")


def test_spelling_variants():
    greek = "αβγΩ"
    for spelling in ("Greek", "greek", "IsGreek", "sc=Greek",
                     "script=Greek", "Script=greek"):
        pat = icu.compile(r"^\p{" + spelling + r"}+$")
        assert pat.match(greek), spelling
        assert not pat.match("abc"), spelling


def test_negation_and_caret():
    # \P{Latin} and \p{^Latin} are the same class
    for pat_src in (r"^\P{Latin}$", r"^\p{^Latin}$"):
        pat = icu.compile(pat_src)
        assert pat.match("Ω") and pat.match("中") and pat.match("7")
        assert not pat.match("x")


def test_inside_character_class():
    pat = icu.compile(r"^[\p{Han}\p{Hiragana}0-9]+$")
    assert pat.match("中42ひら")
    assert not pat.match("abc")


def test_mixed_scripts_in_one_pattern():
    # CJK detection the lang-signal style: any Han / kana / Hangul char
    pat = icu.compile(r"[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]")
    assert pat.search("price: 価格")
    assert pat.search("한국어 text")
    assert not pat.search("plain ascii and ελληνικά")


def test_common_and_inherited():
    assert icu.compile(r"^\p{Common}+$").match("123 ,.!")
    assert icu.compile(r"^\p{Inherited}$").match("́")  # combining acute


def test_unknown_script_still_loud():
    with pytest.raises(re.error, match="unsupported ICU property"):
        icu.compile(r"\p{Tagbanwa}")
    with pytest.raises(re.error, match="unsupported ICU property"):
        icu.compile(r"\p{NotAScript}")


def test_general_categories_unaffected():
    # the resolution-order change must not break category forms
    pat = icu.compile(r"^\p{Lu}\p{Ll}+\p{Nd}$")
    assert pat.match("Abc7")
    assert icu.compile(r"^\p{IsAlpha}+$").match("aΩ中")
