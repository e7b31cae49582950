"""Whitelist config for the sanitizer (reference Whitelist.swift).

Presets none/simpleText/basic/basicWithImages/relaxed with the exact tag /
attribute / protocol / enforced-attribute sets of the reference
(Whitelist.swift:91-207), plus the URL-protocol validation rules
(Whitelist.swift:646-790). In the Spark pipeline a Whitelist is a
broadcast-able plain-data config evaluated inside the kernel."""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

_WS = " \t\n\f\r"

STRICT, TRIM, ALLOW = "strict", "trim", "allow"


def resolve_url(base: str, rel: str) -> str:
    """StringUtil.resolve parity (StringUtil.swift:1201-1260,
    StringUtilTest.testResolvesRelativeUrls): returns '' when
    unresolvable — no usable base (no scheme) and rel not absolute."""
    try:
        if urlparse(rel).scheme:
            return rel
        if not base or not urlparse(base).scheme:
            return ""          # reference: resolve("wrong","also wrong") == ""
        return urljoin(base, rel)
    except ValueError:
        return ""


class Whitelist:
    def __init__(self) -> None:
        self.tag_names: set[str] = set()
        self.attributes: dict[str, set[str]] = {}
        self.enforced: dict[str, dict[str, str]] = {}
        self.protocols: dict[str, dict[str, set[str]]] = {}
        self.css_properties: dict[str, set[str]] = {}
        self.preserve_relative_links = False
        self.url_whitespace_mode = ALLOW

    # --- builders -------------------------------------------------------------
    def add_tags(self, *tags: str) -> "Whitelist":
        self.tag_names.update(t.lower() for t in tags)
        return self

    def remove_tags(self, *tags: str) -> "Whitelist":
        for t in tags:
            self.tag_names.discard(t.lower())
        return self

    def add_attributes(self, tag: str, *keys: str) -> "Whitelist":
        self.attributes.setdefault(tag.lower(), set()).update(k.lower() for k in keys)
        return self

    def remove_attributes(self, tag: str, *keys: str) -> "Whitelist":
        s = self.attributes.get(tag.lower())
        if s:
            for k in keys:
                s.discard(k.lower())
        return self

    def add_enforced_attribute(self, tag: str, key: str, value: str) -> "Whitelist":
        self.enforced.setdefault(tag.lower(), {})[key.lower()] = value
        return self

    def remove_enforced_attribute(self, tag: str, key: str) -> "Whitelist":
        self.enforced.get(tag.lower(), {}).pop(key.lower(), None)
        return self

    def add_protocols(self, tag: str, key: str, *prots: str) -> "Whitelist":
        self.protocols.setdefault(tag.lower(), {}).setdefault(key.lower(), set()).update(
            p.lower() for p in prots)
        return self

    def remove_protocols(self, tag: str, key: str, *prots: str) -> "Whitelist":
        s = self.protocols.get(tag.lower(), {}).get(key.lower())
        if s:
            for p in prots:
                s.discard(p.lower())
        return self

    def add_css_properties(self, tag: str, *props: str) -> "Whitelist":
        self.css_properties.setdefault(tag.lower(), set()).update(
            p.lower() for p in props)
        return self

    def set_preserve_relative_links(self, v: bool) -> "Whitelist":
        self.preserve_relative_links = v
        return self

    def set_url_whitespace_mode(self, mode: str) -> "Whitelist":
        assert mode in (STRICT, TRIM, ALLOW)
        self.url_whitespace_mode = mode
        return self

    # --- checks ----------------------------------------------------------------
    def is_safe_tag(self, tag: str) -> bool:
        return tag in self.tag_names

    def is_text_only(self) -> bool:
        return not self.tag_names

    def _prepare_validation(self, v: str) -> str:
        return v if self.url_whitespace_mode == STRICT else v.strip(_WS)

    def _prepare_output(self, v: str) -> str:
        return v.strip(_WS) if self.url_whitespace_mode == TRIM else v

    def _is_url_attribute(self, tag: str, key: str) -> bool:
        if key in self.protocols.get(tag, {}):
            return True
        return tag != ":all" and key in self.protocols.get(":all", {})

    def _protocols_for(self, tag: str, key: str) -> set[str] | None:
        p = self.protocols.get(tag, {}).get(key)
        if p is not None:
            return p
        if tag != ":all":
            return self.protocols.get(":all", {}).get(key)
        return None

    def is_safe_attribute(self, tag: str, key: str, value: str, base_uri: str) -> bool:
        allowed = self.attributes.get(tag)
        if allowed is not None and key in allowed:
            prots = self.protocols.get(tag, {}).get(key)
            if prots is not None:
                return self._test_valid_protocol(value, prots, base_uri)
            return True
        return tag != ":all" and self.is_safe_attribute(":all", key, value, base_uri)

    def _test_valid_protocol(self, value: str, prots: set[str], base_uri: str) -> bool:
        checked = resolve_url(base_uri, value.strip(_WS) if base_uri else value)
        if not checked:
            checked = self._prepare_validation(value)
        low = checked.lower()
        for p in prots:
            if p == "#":
                if checked.startswith("#") and not re.search(r"\s", checked):
                    return True
                continue
            if low.startswith(p + ":"):
                return True
        return False

    def _should_resolve(self, v: str) -> bool:
        if not v or v[0] in _WS or v[-1] in _WS:
            return False
        if v.startswith("/"):
            return True
        try:
            return bool(urlparse(v).scheme)
        except ValueError:
            return False

    def safe_attribute(self, tag: str, key: str, value: str, base_uri: str) -> str | None:
        """Returns the (possibly rewritten) value if the attribute is kept,
        else None (reference safeAttribute, Whitelist.swift:646-690)."""
        if not self.is_safe_attribute(tag, key, value, base_uri):
            return None
        if key == "style":
            allowed = self._css_props_for(tag)
            if allowed is not None:
                return _sanitize_style(value, allowed)
        if not self._is_url_attribute(tag, key):
            return value
        candidate = value.strip(_WS) if base_uri else value
        if not self.preserve_relative_links and self._should_resolve(candidate):
            resolved = resolve_url(base_uri, candidate)
            if resolved:
                return resolved
        return self._prepare_output(value)

    def _css_props_for(self, tag: str) -> set[str] | None:
        t = self.css_properties.get(tag)
        a = self.css_properties.get(":all") if tag != ":all" else None
        if t is None and a is None:
            return None
        return (t or set()) | (a or set())

    def enforced_for(self, tag: str) -> dict[str, str]:
        return dict(self.enforced.get(tag, {}))


_CSS_COMMENT = re.compile(r"/\*.*?\*/", re.S)
_ALWAYS_UNSAFE_CSS = frozenset(["behavior", "-moz-binding"])


def _sanitize_style(style: str, allowed: set[str]) -> str | None:
    """Inline-CSS filter (reference Whitelist.sanitizeStyleAttribute):
    keep only whitelisted properties, strip comments, drop XSS vectors.
    Returns None to drop the attribute entirely."""
    s = _CSS_COMMENT.sub("", style)
    out = []
    for decl in _split_declarations(s):
        name, _, value = decl.partition(":")
        name = name.strip().lower()
        value = value.strip()
        if not name or not value or name not in allowed:
            continue
        if name in _ALWAYS_UNSAFE_CSS:
            continue
        # decode CSS backslash escapes (hex and identity) BEFORE the
        # pattern checks, else values like 'background:\75rl(javascript:x)'
        # or 'color:expression\28...' slip past the substring filters
        norm = re.sub(
            r"\s+", "", _CSS_COMMENT.sub("", _css_unescape(value)).lower())
        if "expression(" in norm or "@import" in norm or "url(" in norm:
            continue
        out.append(f"{name}:{value}")
    if not out:
        return None
    return "; ".join(out)


def _css_unescape(s: str) -> str:
    r"""Decode CSS backslash escapes: \HH..H (1-6 hex digits, optional
    trailing whitespace) -> codepoint; \<char> -> char."""
    def repl(m):
        h = m.group(1)
        if h:
            try:
                cp = int(h, 16)
                return chr(cp) if cp <= 0x10FFFF else "\ufffd"
            except ValueError:
                return ""
        return m.group(2)
    return re.sub(r"\\([0-9a-fA-F]{1,6})[ \t\n]?|\\(.)", repl, s)


def _split_declarations(s: str) -> list[str]:
    parts = []
    buf = []
    quote = None
    depth = 0
    i = 0
    while i < len(s):
        c = s[i]
        if quote:
            buf.append(c)
            if c == "\\" and i + 1 < len(s):
                buf.append(s[i + 1])
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in "\"'":
            quote = c
            buf.append(c)
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth = max(0, depth - 1)
            buf.append(c)
        elif c == ";" and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    if buf:
        parts.append("".join(buf))
    return [p for p in (x.strip() for x in parts) if p]


# --- presets (reference Whitelist.swift:91-207) -------------------------------
def none() -> Whitelist:
    return Whitelist()


def simple_text() -> Whitelist:
    return Whitelist().add_tags("b", "em", "i", "strong", "u")


def basic() -> Whitelist:
    return (
        Whitelist()
        .add_tags("a", "b", "blockquote", "br", "cite", "code", "dd", "dl", "dt",
                  "em", "i", "li", "ol", "p", "pre", "q", "small", "span", "strike",
                  "strong", "sub", "sup", "u", "ul")
        .add_attributes("a", "href")
        .add_attributes("blockquote", "cite")
        .add_attributes("q", "cite")
        .add_protocols("a", "href", "ftp", "http", "https", "mailto")
        .add_protocols("blockquote", "cite", "http", "https")
        .add_protocols("cite", "cite", "http", "https")
        .add_enforced_attribute("a", "rel", "nofollow")
    )


def basic_with_images() -> Whitelist:
    return (
        basic()
        .add_tags("img")
        .add_attributes("img", "align", "alt", "height", "src", "title", "width")
        .add_protocols("img", "src", "http", "https")
    )


def relaxed() -> Whitelist:
    return (
        Whitelist()
        .add_tags("a", "b", "blockquote", "br", "caption", "cite", "code", "col",
                  "colgroup", "dd", "div", "dl", "dt", "em", "h1", "h2", "h3", "h4",
                  "h5", "h6", "i", "img", "li", "ol", "p", "pre", "q", "small",
                  "span", "strike", "strong", "sub", "sup", "table", "tbody", "td",
                  "tfoot", "th", "thead", "tr", "u", "ul")
        .add_attributes("a", "href", "title")
        .add_attributes("blockquote", "cite")
        .add_attributes("col", "span", "width")
        .add_attributes("colgroup", "span", "width")
        .add_attributes("img", "align", "alt", "height", "src", "title", "width")
        .add_attributes("ol", "start", "type")
        .add_attributes("q", "cite")
        .add_attributes("table", "summary", "width")
        .add_attributes("td", "abbr", "axis", "colspan", "rowspan", "width")
        .add_attributes("th", "abbr", "axis", "colspan", "rowspan", "scope", "width")
        .add_attributes("ul", "type")
        .add_protocols("a", "href", "ftp", "http", "https", "mailto")
        .add_protocols("blockquote", "cite", "http", "https")
        .add_protocols("cite", "cite", "http", "https")
        .add_protocols("img", "src", "http", "https")
        .add_protocols("q", "cite", "http", "https")
    )


PRESETS = {
    "none": none,
    "simpleText": simple_text,
    "basic": basic,
    "basicWithImages": basic_with_images,
    "relaxed": relaxed,
}
