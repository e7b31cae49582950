"""Tag metadata registry: interned tag ids + per-tag trait bitmasks.

Mirrors the reference's Tag registry semantics (block/inline/void/
preserve-whitespace/format-as-block categories; see
/root/reference/Sources/Tag.swift:577-649) as a broadcastable,
executor-constant lookup table. Tag names are interned to small ints so
arena columns hold ``int32`` tag ids and selector evaluation compares
integers, not strings.
"""

from __future__ import annotations

# Trait bits
IS_BLOCK = 1 << 0           # block-level (jsoup's extended block list)
FORMAT_AS_BLOCK = 1 << 1    # pretty-print as block
IS_EMPTY = 1 << 2           # void element
SELF_CLOSING = 1 << 3       # seen a self-closing marker
PRESERVE_WS = 1 << 4        # pre/plaintext/title/textarea
FORM_LIST = 1 << 5
FORM_SUBMIT = 1 << 6
IS_KNOWN = 1 << 7

# Category lists: semantics per reference Tag.swift:577-612 (jsoup-derived).
BLOCK_TAGS = [
    "html", "head", "body", "frameset", "script", "noscript", "style", "meta",
    "link", "title", "frame", "noframes", "noembed", "section", "nav", "aside",
    "hgroup", "header", "footer", "p", "h1", "h2", "h3", "h4", "h5", "h6",
    "ul", "ol", "pre", "listing", "div", "blockquote", "hr", "address",
    "figure", "figcaption", "form", "fieldset", "center", "dir", "applet",
    "marquee", "ins", "del", "s", "dl", "dt", "dd", "li", "table", "caption",
    "thead", "tfoot", "tbody", "colgroup", "col", "tr", "th", "td", "video",
    "audio", "canvas", "details", "menu", "plaintext", "template", "article",
    "main", "svg", "math",
]
INLINE_TAGS = [
    "object", "base", "font", "tt", "i", "b", "u", "big", "small", "em",
    "strong", "dfn", "code", "samp", "kbd", "var", "cite", "abbr", "time",
    "acronym", "mark", "ruby", "rt", "rp", "rb", "a", "img", "br", "wbr",
    "map", "q", "sub", "sup", "bdo", "iframe", "embed", "span", "input",
    "select", "textarea", "label", "button", "optgroup", "option", "legend",
    "datalist", "keygen", "output", "progress", "meter", "area", "param",
    "source", "track", "summary", "command", "device", "basefont", "bgsound",
    "menuitem", "data", "bdi",
]
EMPTY_TAGS = frozenset([
    "meta", "link", "base", "frame", "img", "br", "wbr", "embed", "hr",
    "input", "keygen", "col", "command", "device", "area", "basefont",
    "bgsound", "menuitem", "param", "source", "track",
])
FORMAT_AS_INLINE_TAGS = frozenset([
    "title", "a", "p", "h1", "h2", "h3", "h4", "h5", "h6", "pre", "address",
    "li", "th", "td", "script", "style", "ins", "del", "s",
])
PRESERVE_WS_TAGS = frozenset(["pre", "plaintext", "title", "textarea"])
FORM_LISTED_TAGS = frozenset([
    "button", "fieldset", "input", "keygen", "object", "output", "select",
    "textarea",
])
FORM_SUBMIT_TAGS = frozenset([
    "input", "keygen", "object", "select", "textarea",
])


def _build_registry() -> tuple[dict[str, int], list[str], list[int]]:
    name_to_id: dict[str, int] = {}
    names: list[str] = []
    traits: list[int] = []

    def add(name: str, base: int) -> None:
        t = base | IS_KNOWN
        if name in EMPTY_TAGS:
            t |= IS_EMPTY
        if name in FORMAT_AS_INLINE_TAGS:
            t &= ~FORMAT_AS_BLOCK
        if name in PRESERVE_WS_TAGS:
            t |= PRESERVE_WS
        if name in FORM_LISTED_TAGS:
            t |= FORM_LIST
        if name in FORM_SUBMIT_TAGS:
            t |= FORM_SUBMIT
        name_to_id[name] = len(names)
        names.append(name)
        traits.append(t)

    for n in BLOCK_TAGS:
        add(n, IS_BLOCK | FORMAT_AS_BLOCK)
    for n in INLINE_TAGS:
        add(n, 0)
    return name_to_id, names, traits


_NAME_TO_ID, TAG_NAMES, TAG_TRAITS = _build_registry()


class TagRegistry:
    """Per-parse-universe tag interner. Known tags share global ids;
    unknown tags get appended. Instances are cheap; the Spark kernel keeps
    one per Python worker (broadcast-equivalent: deterministic rebuild)."""

    __slots__ = ("name_to_id", "names", "traits")

    def __init__(self) -> None:
        self.name_to_id = dict(_NAME_TO_ID)
        self.names = list(TAG_NAMES)
        self.traits = list(TAG_TRAITS)

    def intern(self, name: str) -> int:
        tid = self.name_to_id.get(name)
        if tid is None:
            tid = len(self.names)
            self.name_to_id[name] = tid
            self.names.append(name)
            # unknown tags: inline, not block, not known
            self.traits.append(0)
        return tid

    def name(self, tid: int) -> str:
        return self.names[tid]

    def is_block(self, tid: int) -> bool:
        return bool(self.traits[tid] & IS_BLOCK)

    def is_empty(self, tid: int) -> bool:
        return bool(self.traits[tid] & IS_EMPTY)

    def is_known(self, tid: int) -> bool:
        return bool(self.traits[tid] & IS_KNOWN)

    def preserve_ws(self, tid: int) -> bool:
        return bool(self.traits[tid] & PRESERVE_WS)

    def format_as_block(self, tid: int) -> bool:
        return bool(self.traits[tid] & FORMAT_AS_BLOCK)


# A process-wide default registry for single-doc API use. The tree builder
# may append unknown tags; ids for known tags are stable across processes.
GLOBAL_TAGS = TagRegistry()
