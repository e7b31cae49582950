"""HTML character-reference decode/encode.

Reproduces the reference's unescape semantics (tokenizer char-ref rules:
named refs w/ legacy no-semicolon set, numeric dec/hex refs with
windows-1252 remap, the "in attribute" suppression rule; see
/root/reference/Sources/Entities.swift:1377-1395 and
/root/reference/Sources/Tokeniser.swift:64-149) using the public WHATWG
entity table shipped in Python's stdlib (``html.entities.html5``).

Encode side implements the escape behavior needed for HTML serialization
parity under UTF-8 output (reference Entities.swift escape overloads).
"""

from __future__ import annotations

import re
from html.entities import html5 as _HTML5

# name (without ';') -> chars, for names that require a semicolon
ENT_SEMI: dict[str, str] = {}
# legacy names valid without a semicolon
ENT_NOSEMI: dict[str, str] = {}
for _k, _v in _HTML5.items():
    if _k.endswith(";"):
        ENT_SEMI[_k[:-1]] = _v
    else:
        ENT_NOSEMI[_k] = _v

_MAX_NAME = max(len(k) for k in ENT_SEMI)

# WHATWG numeric-reference remap for C1 range 0x80-0x9F (windows-1252)
_WIN1252 = [
    0x20AC, 0x81, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x8D, 0x017D, 0x8F,
    0x90, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x9D, 0x017E, 0x0178,
]

_NUM_RE = re.compile(r"#[xX]([0-9a-fA-F]+)|#([0-9]+)")
_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9]*")

REPLACEMENT = "�"


def _decode_codepoint(cp: int) -> str:
    if 0x80 <= cp <= 0x9F:
        cp = _WIN1252[cp - 0x80]
    if cp == 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        return REPLACEMENT
    return chr(cp)


def _match_ref(s: str, i: int, in_attribute: bool) -> tuple[str, int] | None:
    """Try to parse a character reference starting at s[i] (the char after
    '&'). Returns (decoded, next_index) or None if not a reference."""
    n = len(s)
    if i >= n:
        return None
    c = s[i]
    if c == "#":
        m = _NUM_RE.match(s, i)
        if m is None:
            return None
        end = m.end()
        cp = int(m.group(1), 16) if m.group(1) is not None else int(m.group(2))
        if end < n and s[end] == ";":
            end += 1
        return _decode_codepoint(cp), end
    m = _NAME_RE.match(s, i)
    if m is None:
        return None
    name = m.group(0)[:_MAX_NAME]
    end = i + len(name)
    # semicolon-terminated: longest name whose next char is ';'
    if end < n and s[end] == ";" and name in ENT_SEMI:
        return ENT_SEMI[name], end + 1
    # back off to the longest legacy (no-semicolon) prefix
    for ln in range(len(name), 1, -1):
        pref = name[:ln]
        if pref in ENT_SEMI and i + ln < n and s[i + ln] == ";":
            return ENT_SEMI[pref], i + ln + 1
        if pref in ENT_NOSEMI:
            j = i + ln
            if in_attribute and j < n and (s[j] == "=" or s[j].isalnum()):
                return None  # legacy-in-attribute suppression
            return ENT_NOSEMI[pref], j
    return None


def unescape(s: str, in_attribute: bool = False, strict: bool = False) -> str:
    """Decode character references per the tokenizer rules.

    ``strict=True`` only decodes semicolon-terminated refs (reference
    Parser.unescapeEntities strict mode)."""
    i = s.find("&")
    if i < 0:
        return s
    out: list[str] = []
    pos = 0
    n = len(s)
    while 0 <= i < n:
        out.append(s[pos:i])
        r = _match_ref(s, i + 1, in_attribute)
        if r is not None and (not strict or (s[r[1] - 1 : r[1]] == ";")):
            out.append(r[0])
            pos = r[1]
        else:
            out.append("&")
            pos = i + 1
        i = s.find("&", pos)
    out.append(s[pos:])
    return "".join(out)


# --- escape (serialization) -------------------------------------------------

# Escape modes (reference Entities.swift:217-241):
#   xhtml    — 4 core entities only (lt gt amp quot)
#   base     — the 106-entry HTML4 table: stdlib ``codepoint2name`` for
#              cp <= 0xFF (100 names) + the 6 uppercase aliases the
#              WHATWG table adds (AMP GT LT QUOT COPY REG) — verified
#              equal to the reference's packed base table
#   extended — the full 2125-name WHATWG table (== stdlib html5)
# Under a charset that can encode everything (utf-8) the observable
# escapes are the core set + nbsp; the named tables matter when the
# output charset cannot encode a character (reference
# Entities.swift:485-1100 escape overloads + appendEncoded): preferred
# named entity (lexicographically greatest name for the first
# codepoint, reference bestNameForScalar) else ``&#x...;``.
XHTML = "xhtml"
BASE = "base"
EXTENDED = "extended"

_XHTML_MAP = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}

_BASE_ALIAS_NAMES = frozenset(["AMP", "GT", "LT", "QUOT", "COPY", "REG"])


def _build_escape_tables() -> tuple[dict[int, str], dict[int, str]]:
    from html.entities import codepoint2name

    distinct: dict[str, str] = {}
    for k, v in _HTML5.items():
        distinct.setdefault(k.rstrip(";"), v)
    ext: dict[int, str] = {}
    for name, v in distinct.items():
        cp = ord(v[0])           # keyed by FIRST codepoint (ref parity)
        cur = ext.get(cp)
        if cur is None or name > cur:
            ext[cp] = name
    base_names = ({n for c, n in codepoint2name.items() if c <= 0xFF}
                  | _BASE_ALIAS_NAMES)
    basem: dict[int, str] = {}
    for name in base_names:
        cp = ord(distinct[name][0])
        cur = basem.get(cp)
        if cur is None or name > cur:
            basem[cp] = name
    return basem, ext


_ESC_BASE_BY_CP, _ESC_EXT_BY_CP = _build_escape_tables()


def _can_encode(ch: str, charset: str) -> bool:
    if charset in ("utf-8", "utf8", "utf-16", "utf16", "unicode"):
        return True
    if charset == "ascii":
        return ord(ch) < 0x80
    try:
        ch.encode(charset)
        return True
    except (UnicodeEncodeError, LookupError):
        return False


def _encode_fallback(ch: str, escape_mode: str) -> str:
    """Named-or-numeric escape for a charset-unencodable char
    (reference Entities.appendEncoded)."""
    table = (_ESC_EXT_BY_CP if escape_mode == EXTENDED
             else _ESC_BASE_BY_CP if escape_mode == BASE else {})
    name = table.get(ord(ch))
    if name is not None:
        return f"&{name};"
    return f"&#x{ord(ch):x};"


def escape(
    s: str,
    in_attribute: bool = False,
    escape_mode: str = BASE,
    pretty: bool = False,
    strip_leading_ws: bool = False,
    normalise_ws: bool = False,
    charset: str = "utf-8",
) -> str:
    """Escape text for HTML output.

    Mirrors the attribute/body distinction: body text escapes ``& < >
    nbsp``; attribute values escape ``& " nbsp`` (reference
    Entities.swift:485-1100). Characters the ``charset`` cannot encode
    fall back to the mode's named entity (or ``&#x...;``)."""
    out: list[str] = []
    last_was_white = False
    reached_non_white = not strip_leading_ws
    always_encodable = charset in ("utf-8", "utf8", "utf-16", "utf16",
                                   "unicode")
    for ch in s:
        if normalise_ws and ch in " \t\n\f\r":
            if last_was_white or not reached_non_white:
                continue
            out.append(" ")
            last_was_white = True
            continue
        if normalise_ws:
            last_was_white = False
            reached_non_white = True
        if ch == "&":
            out.append("&amp;")
        elif ch == "\xa0":
            out.append("&nbsp;" if escape_mode != XHTML else "&#xa0;")
        elif ch == "<":
            out.append("&lt;" if (not in_attribute or escape_mode == XHTML) else ch)
        elif ch == ">":
            out.append("&gt;" if not in_attribute else ch)
        elif ch == '"':
            out.append("&quot;" if in_attribute else ch)
        elif always_encodable or _can_encode(ch, charset):
            out.append(ch)
        else:
            out.append(_encode_fallback(ch, escape_mode))
    return "".join(out)
