"""ICU regex dialect shim for the selector engine.

The reference's ``:matches`` / ``:matchesOwn`` / ``[attr~=regex]`` compile
their pattern with NSRegularExpression — the ICU dialect (reference
``Pattern.swift:26-39``). Python 3.11's ``re`` already covers most of the
ICU surface natively (possessive quantifiers ``a*+``, atomic groups
``(?>...)``, ``\\uXXXX`` escapes, inline flags); the two constructs it
rejects are

  * ``\\p{Prop}`` / ``\\P{Prop}`` Unicode property classes (general
    categories like ``Lu``/``N``, one-letter groups like ``L``, and the
    POSIX-style binary names ICU aliases — ``Alpha``, ``Digit``,
    ``Punct``, ...), including the bare one-letter form ``\\pL``, and
  * ``\\x{10FFFF}`` brace-delimited hex escapes.

``compile(pattern)`` translates exactly those into explicit code-point
character classes and hands the result to ``re.compile`` — so the
selector grammar accepts the ICU dialect while evaluation stays on the
stdlib engine. General categories and POSIX-style binary names are
computed once from ``unicodedata``; ICU *script* names (``\\p{Greek}``,
``\\p{Han}``, ``\\p{sc=Cyrillic}``, ``\\p{IsHiragana}``, ...) resolve
through a generated exact Script-property table
(:mod:`swiftsoup_spark.select.scripts_data`, 35 scripts extracted from
the public UCD tables shipped in RE2 — see scripts/gen_script_ranges.py;
fidelity is gated against RE2 itself in tests/test_icu_scripts.py).
Unicode BINARY properties exactly derivable from the stdlib are swept
from their true predicates (``Uppercase``/``Lowercase`` via
str.isupper/islower — the *derived* properties, including
Other_Uppercase code points like Roman numerals — plus ``Cased``,
``Assigned``, and the closed-form ``Noncharacter_Code_Point`` /
``Bidi_Control`` / ``Join_Control``). Property names the shim still
cannot resolve (rare scripts outside the generated set; binary
properties needing PropList data the stdlib lacks, e.g. ``Alphabetic``
whose Other_Alphabetic marks unicodedata cannot see, ``Ideographic``,
``Dash``) raise ``re.error`` with a clear message — a documented
boundary, not a silent mismatch.

Canonical-equivalence matching is NOT part of the parity surface:
the reference constructs ``NSRegularExpression(pattern:, options: [])``
(Pattern.swift:26-31) and NSRegularExpression exposes no ICU
UREGEX_CANON_EQ flag, so the reference matches code points literally —
exactly as this shim does (verified round 5).
"""

from __future__ import annotations

import re
import sys
import unicodedata
from functools import lru_cache

from .scripts_data import SCRIPT_RANGES

__all__ = ["compile", "translate"]

_MAX_CP = sys.maxunicode  # 0x10FFFF

# ICU/Java POSIX-style binary property names -> general-category groups.
# Values are tuples of category prefixes/names unioned together; a leading
# "+" entry adds explicit extra code points.
_ALIASES: dict[str, tuple[str, ...]] = {
    "alpha": ("L",),
    "letter": ("L",),
    "lower": ("Ll",),
    "lowercaseletter": ("Ll",),
    "upper": ("Lu",),
    "uppercaseletter": ("Lu",),
    "titlecaseletter": ("Lt",),
    "digit": ("Nd",),
    "decimalnumber": ("Nd",),
    "number": ("N",),
    "alnum": ("L", "Nd"),
    "punct": ("P",),
    "punctuation": ("P",),
    "symbol": ("S",),
    "mark": ("M",),
    "separator": ("Z",),
    "cntrl": ("Cc",),
    "control": ("Cc",),
    "space": ("Z", "+\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f\x85"),
    "whitespace": ("Z", "+\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f\x85"),
    "white_space": ("Z", "+\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f\x85"),
    "blank": ("Zs", "+\t"),
    "graph": ("!ZC",),   # visible: NOT separator/other (ICU [^\p{Z}\p{C}])
    "print": ("!C", ),   # printable: NOT other
    "word": ("L", "M", "Nd", "Pc"),
    "xdigit": ("Nd", "+0123456789abcdefABCDEF"
               "０１２３４５６７８９"
               "ＡＢＣＤＥＦ"
               "ａｂｃｄｅｆ"),
    "ascii": ("+" + "".join(chr(c) for c in range(128)),),
    "any": ("L", "M", "N", "P", "S", "Z", "C"),
}

# Unicode BINARY properties exactly derivable from the stdlib: each
# entry is a predicate over a single character; the code space is swept
# once per property (run-length, lru-cached) exactly like the category
# table. Python's str.isupper()/islower() implement the DERIVED
# Uppercase/Lowercase properties (Lu/Ll plus Other_Uppercase/
# Other_Lowercase — e.g. Roman numeral Ⅰ is Uppercase but category Nl),
# so these sweeps are faithful to the UCD, not category approximations.
# Properties needing PropList data the stdlib lacks (Alphabetic's
# Other_Alphabetic marks, Ideographic, Math's Other_Math, ...) still
# raise re.error — the documented loud boundary.
_BINARY_PREDICATES: dict[str, object] = {
    "uppercase": lambda c: c.isupper(),
    "lowercase": lambda c: c.islower(),
    # Cased = Lowercase | Uppercase | Lt (Unicode DerivedCoreProperties)
    "cased": lambda c: (c.isupper() or c.islower()
                        or unicodedata.category(c) == "Lt"),
    "assigned": lambda c: unicodedata.category(c) != "Cn",
    # closed forms from the spec, not sweeps (exact, tiny)
    "noncharactercodepoint": lambda c: (
        0xFDD0 <= ord(c) <= 0xFDEF or (ord(c) & 0xFFFE) == 0xFFFE),
    "bidicontrol": lambda c: ord(c) in (
        0x061C, 0x200E, 0x200F, 0x202A, 0x202B, 0x202C, 0x202D, 0x202E,
        0x2066, 0x2067, 0x2068, 0x2069),
    "joincontrol": lambda c: ord(c) in (0x200C, 0x200D),
}


@lru_cache(maxsize=16)
def _binary_ranges(key: str) -> tuple[tuple[int, int], ...]:
    pred = _BINARY_PREDICATES[key]
    ranges: list[tuple[int, int]] = []
    run_start = None
    for cp in range(_MAX_CP + 1):
        if pred(chr(cp)):
            if run_start is None:
                run_start = cp
        elif run_start is not None:
            ranges.append((run_start, cp - 1))
            run_start = None
    if run_start is not None:
        ranges.append((run_start, _MAX_CP))
    return tuple(ranges)


# Long ICU/Unicode names for the two-letter general categories.
_LONG_CATEGORY = {
    "modifierletter": "Lm", "otherletter": "Lo", "casedletter": "L&",
    "nonspacingmark": "Mn", "spacingcombiningmark": "Mc", "spacingmark": "Mc",
    "enclosingmark": "Me", "letternumber": "Nl", "othernumber": "No",
    "connectorpunctuation": "Pc", "dashpunctuation": "Pd",
    "openpunctuation": "Ps", "closepunctuation": "Pe",
    "initialpunctuation": "Pi", "finalpunctuation": "Pf",
    "otherpunctuation": "Po", "mathsymbol": "Sm", "currencysymbol": "Sc",
    "modifiersymbol": "Sk", "othersymbol": "So", "spaceseparator": "Zs",
    "lineseparator": "Zl", "paragraphseparator": "Zp", "format": "Cf",
    "surrogate": "Cs", "privateuse": "Co", "unassigned": "Cn",
    "other": "C",
}


@lru_cache(maxsize=1)
def _category_starts() -> list[tuple[int, str]]:
    """One sweep of the code space -> run-length (start_cp, category) list.

    ~1.1M ``unicodedata.category`` calls, ~3400 runs; computed once per
    process and only when a pattern actually uses ``\\p``.
    """
    cat = unicodedata.category
    runs: list[tuple[int, str]] = []
    prev = None
    for cp in range(_MAX_CP + 1):
        c = cat(chr(cp))
        if c != prev:
            runs.append((cp, c))
            prev = c
    return runs


@lru_cache(maxsize=64)
def _prop_ranges(spec: tuple[str, ...]) -> tuple[tuple[int, int], ...]:
    """Union of code-point ranges for a category-spec tuple (see _ALIASES)."""
    want_prefix: set[str] = set()
    want_exact: set[str] = set()
    not_prefix: set[str] = set()
    extra: set[int] = set()
    for part in spec:
        if part.startswith("+"):
            extra.update(ord(ch) for ch in part[1:])
        elif part.startswith("!"):
            not_prefix.update(part[1:])       # e.g. "!ZC" -> not Z*, not C*
        elif len(part) == 1:
            want_prefix.add(part)
        elif part == "L&":                    # cased letters Lu|Ll|Lt
            want_exact.update(("Lu", "Ll", "Lt"))
        else:
            want_exact.add(part)

    runs = _category_starts()
    ranges: list[tuple[int, int]] = []

    def _match(c: str) -> bool:
        if not_prefix:
            return c[0] not in not_prefix
        return c[0] in want_prefix or c in want_exact

    for i, (start, c) in enumerate(runs):
        end = (runs[i + 1][0] if i + 1 < len(runs) else _MAX_CP + 1) - 1
        if _match(c):
            if ranges and ranges[-1][1] == start - 1:
                ranges[-1] = (ranges[-1][0], end)
            else:
                ranges.append((start, end))
    for cp in sorted(extra):
        # merge single extras (rare, tiny sets)
        placed = False
        for idx, (lo, hi) in enumerate(ranges):
            if lo <= cp <= hi:
                placed = True
                break
            if cp == hi + 1:
                ranges[idx] = (lo, cp)
                placed = True
                break
            if cp == lo - 1:
                ranges[idx] = (cp, hi)
                placed = True
                break
        if not placed:
            ranges.append((cp, cp))
    ranges.sort()
    # final merge after extras
    merged: list[tuple[int, int]] = []
    for lo, hi in ranges:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return tuple(merged)


def _name_to_ranges(name: str) -> tuple[tuple[int, int], ...]:
    """Property name -> code-point ranges, or raise re.error.

    Resolution order: POSIX/binary aliases, long category names,
    one/two-letter general categories, then Script names (exact UCD
    ranges from the generated table). Accepts the ICU spelling variants
    ``IsFoo`` / ``general_category=Foo`` / ``gc=Foo`` / ``script=Foo`` /
    ``sc=Foo``."""
    key = name.replace("_", "").replace("-", "").replace(" ", "").lower()
    for prefix in ("generalcategory=", "gc=", "script=", "sc=", "is"):
        if key.startswith(prefix) and len(key) > len(prefix):
            key = key[len(prefix):]
            break
    if key in _BINARY_PREDICATES:
        return _binary_ranges(key)
    if key in _ALIASES:
        return _prop_ranges(_ALIASES[key])
    if key in _LONG_CATEGORY:
        cat = _LONG_CATEGORY[key]
        return _prop_ranges(("Lu", "Ll", "Lt") if cat == "L&" else (cat,))
    # category spelling (case-insensitive after prefix strip): one-letter
    # group or two-letter general category
    if len(key) == 1 and key.upper() in "LMNPSZC":
        return _prop_ranges((key.upper(),))
    if len(key) == 2 and key[0].upper() in "LMNPSZC":
        return _prop_ranges((key[0].upper() + key[1].lower(),))
    if key in SCRIPT_RANGES:
        return SCRIPT_RANGES[key]
    raise re.error(
        f"unsupported ICU property \\p{{{name}}}: general categories, "
        f"POSIX-style names and {len(SCRIPT_RANGES)} common script names "
        f"are translated; this name is outside the generated set "
        f"(scripts/gen_script_ranges.py)")


def _complement(ranges: tuple[tuple[int, int], ...]) -> tuple[tuple[int, int], ...]:
    out: list[tuple[int, int]] = []
    prev = 0
    for lo, hi in ranges:
        if lo > prev:
            out.append((prev, lo - 1))
        prev = hi + 1
    if prev <= _MAX_CP:
        out.append((prev, _MAX_CP))
    return tuple(out)


def _esc(cp: int) -> str:
    return f"\\U{cp:08X}" if cp > 0xFFFF else f"\\u{cp:04X}"


def _class_body(ranges: tuple[tuple[int, int], ...]) -> str:
    parts = []
    for lo, hi in ranges:
        parts.append(_esc(lo) if lo == hi else f"{_esc(lo)}-{_esc(hi)}")
    return "".join(parts)


def translate(pattern: str) -> str:
    """ICU-dialect pattern -> equivalent Python ``re`` pattern.

    Rewrites ``\\p{...}`` / ``\\P{...}`` / ``\\pL`` and ``\\x{...}``;
    every other construct passes through untouched (Python 3.11 accepts
    ICU's possessive quantifiers and atomic groups natively).
    """
    out: list[str] = []
    i = 0
    n = len(pattern)
    in_class = False
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt in "pP":
                neg = nxt == "P"
                j = i + 2
                if j < n and pattern[j] == "{":
                    k = pattern.find("}", j)
                    if k < 0:
                        raise re.error(f"unterminated \\{nxt}{{ at {i}")
                    name = pattern[j + 1: k]
                    i = k + 1
                elif j < n:
                    name = pattern[j]          # bare one-letter form \pL
                    i = j + 1
                else:
                    raise re.error(f"dangling \\{nxt} at {i}")
                if name.startswith("^"):       # ICU \p{^L} == \P{L}
                    neg = not neg
                    name = name[1:]
                ranges = _name_to_ranges(name)
                if neg:
                    ranges = _complement(ranges)
                body = _class_body(ranges)
                out.append(body if in_class else f"[{body}]")
                continue
            if nxt == "x" and i + 2 < n and pattern[i + 2] == "{":
                k = pattern.find("}", i + 3)
                if k < 0:
                    raise re.error(f"unterminated \\x{{ at {i}")
                cp = int(pattern[i + 3: k], 16)
                out.append(_esc(cp))
                i = k + 1
                continue
            out.append(pattern[i: i + 2])
            i += 2
            continue
        if ch == "[" and not in_class:
            in_class = True
        elif ch == "]" and in_class:
            in_class = False
        out.append(ch)
        i += 1
    return "".join(out)


def compile(pattern: str, flags: int = 0):  # noqa: A001 - mirrors re.compile
    """``re.compile`` accepting the ICU dialect (see module docstring).

    Always routes through :func:`translate` — ``\\p``/``\\x{`` are
    re-syntax errors, so no valid stdlib pattern is altered, and ICU-only
    constructs are rewritten deterministically.
    """
    return re.compile(translate(pattern), flags)
