"""DOM → HTML serialization with the reference's pretty-print semantics.

Reproduces Element/TextNode/Comment/DataNode/DocumentType outerHtml rules
(/root/reference/Sources/Element.swift:2682-2756, TextNode.swift:281-332,
Comment.swift:74, DataNode.swift:197, DocumentType.swift:95,
Node.swift:1117 indent): blocks indent on newlines, void tags emit
`` />``, boolean attributes collapse, text normalizes unless whitespace is
preserved.
"""

from __future__ import annotations

from swiftsoup_spark.kernel.arena import (
    Arena, CDATA, COMMENT, DATA, DOCTYPE, DOCUMENT, ELEMENT, TEXT, XMLDECL,
)
from swiftsoup_spark.kernel.entities import escape

BOOLEAN_ATTRIBUTES = frozenset([
    "allowfullscreen", "async", "autofocus", "checked", "compact", "controls",
    "crossorigin", "declare", "default", "defer", "disabled", "formnovalidate",
    "hidden", "inert", "ismap", "itemscope", "multiple", "muted", "nohref",
    "noresize", "noshade", "novalidate", "nowrap", "open", "readonly",
    "required", "reversed", "seamless", "selected", "sortable", "truespeed",
    "typemustmatch",
])


class OutputSettings:
    __slots__ = ("pretty_print", "indent_amount", "outline", "syntax",
                 "escape_mode", "charset")

    def __init__(self, pretty_print: bool = True, indent_amount: int = 1,
                 outline: bool = False, syntax: str = "html",
                 escape_mode: str = "base", charset: str = "utf-8") -> None:
        self.pretty_print = pretty_print
        self.indent_amount = indent_amount
        self.outline = outline
        self.syntax = syntax
        self.escape_mode = escape_mode
        # output charset: chars it cannot encode serialize as named
        # (per escape_mode table) or &#x...; references (reference
        # OutputSettings.charset / Entities escape overloads)
        self.charset = charset


DEFAULT_OUT = OutputSettings()


def _attrs_html(attrs: dict | None, out: OutputSettings, buf: list[str]) -> None:
    if not attrs:
        return
    for k, v in attrs.items():
        buf.append(" ")
        buf.append(k)
        if v is None:
            continue  # valueless attribute serializes bare
        if not (v == "" and out.syntax == "html" and k.lower() in BOOLEAN_ATTRIBUTES):
            buf.append('="')
            buf.append(escape(v, in_attribute=True, escape_mode=out.escape_mode,
                              charset=out.charset))
            buf.append('"')


def _indent(buf: list[str], depth: int, out: OutputSettings) -> None:
    buf.append("\n" + " " * (depth * out.indent_amount))


def serialize(arena: Arena, nid: int, out: OutputSettings | None = None) -> str:
    out = out or DEFAULT_OUT
    if arena.ntype[nid] == DOCUMENT:
        patched = _patched_doc(arena, out)
        if patched is not None:
            return patched
    buf: list[str] = []
    _ser(arena, nid, 0, out, buf)
    s = "".join(buf)
    return s


def inner_html(arena: Arena, nid: int, out: OutputSettings | None = None) -> str:
    out = out or DEFAULT_OUT
    if arena.ntype[nid] == DOCUMENT:
        patched = _patched_doc(arena, out)
        if patched is not None:
            return patched
    buf: list[str] = []
    for c in arena.children[nid]:
        _ser(arena, c, 0, out, buf)
    s = "".join(buf)
    if out.pretty_print:
        s = s.strip(" \t\n\f\r")
    return s


def _patched_doc(arena: Arena, out: OutputSettings) -> str | None:
    """Whole-document raw emit: the original source with rebuilt
    fragments spliced over mutated subtrees (reference
    Document.patchedOuterHtmlUTF8 / sourcePatches,
    Document.swift:450-594). Engages only in non-pretty mode over a
    source-tracked parse. Returns None (fall back to the tree walk)
    when a mutation cannot be localized to a complete source range —
    the reference silently DROPS such changes (its collect() skips
    dirty nodes without complete ranges); we deliberately deviate and
    bail to the slow path so output always reflects the DOM."""
    src = arena.source
    if src is None or out.pretty_print or (
            out.syntax == "xml" and not arena.parsed_xml):
        # the xml-syntax guard mirrors the per-node raw path below:
        # raw HTML source is not valid under xml output syntax
        return None
    if not arena.mutated:
        return src
    patches: list[tuple[int, int, str]] = []
    dirty = arena.dirty
    mutated = arena.mutated
    src_start, src_close = arena.src_start, arena.src_close
    children = arena.children
    n = len(src)

    def walk(nid: int) -> bool:
        # bottom-up minimal patches: rebuild at the mutation site itself
        # when it has a complete range, else at its lowest ancestor that
        # does (reference registers mutation sites as dirty roots and
        # patches there, Document.swift:492-527). Returns False when the
        # subtree holds a mutation no range can localize.
        mark = len(patches)
        ok = True
        for c in children[nid]:
            if c in dirty:
                ok = walk(c) and ok
        if nid in mutated or not ok:
            ss, sc = src_start[nid], src_close[nid]
            if 0 <= ss and 0 <= sc <= n:
                del patches[mark:]   # this patch covers the inner ones
                buf: list[str] = []
                _ser(arena, nid, 0, out, buf, raw=False)
                patches.append((ss, sc, "".join(buf)))
                return True
            return False
        return True

    # document roots: patch inside each dirty top-level child; a mutation
    # on the document itself (e.g. inserted doctype/xmldecl) has no
    # source range -> bail
    doc = 0 if arena.ntype[0] == DOCUMENT else None
    if doc is None:
        return None
    if doc in mutated:
        return None
    for c in children[doc]:
        if c in dirty and not walk(c):
            return None
    patches.sort(key=lambda p: p[0])
    parts: list[str] = []
    cursor = 0
    for ss, sc, rep in patches:
        if ss < cursor:   # overlapping ranges: cannot splice safely
            return None
        parts.append(src[cursor:ss])
        parts.append(rep)
        cursor = sc
    parts.append(src[cursor:])
    return "".join(parts)


def _is_blank(s: str) -> bool:
    return not s.strip(" \t\n\f\r\xa0")


def _ser(arena: Arena, nid: int, depth: int, out: OutputSettings, buf: list[str],
         raw: bool = True) -> None:
    if raw and not out.pretty_print and arena.source is not None:
        # raw-source fast path (reference Node.rawSourceSlice,
        # Node.swift:1144-1183 + outerHtmlFast): re-emit the subtree's
        # original bytes when the source range is complete, nothing in
        # the subtree was mutated, and the syntax matches the parse
        # dialect. Source-faithful by design: original attribute
        # quoting/case/entity forms are preserved verbatim, exactly as
        # the reference does in non-pretty mode.
        sc = arena.src_close[nid]
        if sc >= 0 and nid not in arena.dirty:
            ss = arena.src_start[nid]
            if 0 <= ss and sc <= len(arena.source) and not (
                    out.syntax == "xml" and not arena.parsed_xml):
                buf.append(arena.source[ss:sc])
                return
    t = arena.ntype[nid]
    tags = arena.tags
    if t == DOCUMENT:
        for c in arena.children[nid]:
            _ser(arena, c, depth, out, buf, raw)
        return
    if t == ELEMENT:
        tid = arena.tag[nid]
        name = arena.display_tag.get(nid) or tags.name(tid)
        fab = tags.format_as_block(tid)
        pid = arena.parent[nid]
        parent_fab = (pid >= 0 and arena.ntype[pid] == ELEMENT
                      and tags.format_as_block(arena.tag[pid]))
        if out.pretty_print and (fab or parent_fab or out.outline) and buf:
            _indent(buf, depth, out)
        buf.append("<")
        buf.append(name)
        _attrs_html(arena.attrs[nid], out, buf)
        children = arena.children[nid]
        # ' />' only for void tags or UNKNOWN self-closed tags; known
        # non-void tags always print an explicit end tag (reference
        # HtmlParserTest testHandlesKnownEmptyBlocks)
        if not children and (tags.is_empty(tid) or (
                nid in arena.selfclosing and not tags.is_known(tid))):
            buf.append(" />")
            return
        buf.append(">")
        for c in children:
            _ser(arena, c, depth + 1, out, buf, raw)
        if out.pretty_print and children and (
            fab or (out.outline and (len(children) > 1 or (
                len(children) == 1 and arena.ntype[children[0]] != TEXT)))):
            _indent(buf, depth, out)
        buf.append("</")
        buf.append(name)
        buf.append(">")
        return
    if t == TEXT or t == CDATA:
        raw = arena.text[nid] or ""
        pid = arena.parent[nid]
        if out.pretty_print:
            sib0 = (pid >= 0 and arena.children[pid] and arena.children[pid][0] == nid)
            parent_fab = (pid >= 0 and arena.ntype[pid] == ELEMENT
                          and tags.format_as_block(arena.tag[pid]))
            if sib0 and parent_fab and not _is_blank(raw):
                _indent(buf, depth, out)
            normalise = not (t == CDATA or arena.preserves_ws(pid))
            buf.append(escape(raw, escape_mode=out.escape_mode, normalise_ws=normalise,
                              charset=out.charset))
        else:
            buf.append(escape(raw, escape_mode=out.escape_mode, charset=out.charset))
        return
    if t == DATA:
        buf.append(arena.text[nid] or "")
        return
    if t == COMMENT:
        if out.pretty_print:
            _indent(buf, depth, out)
        buf.append("<!--")
        buf.append(arena.text[nid] or "")
        buf.append("-->")
        return
    if t == DOCTYPE:
        a = arena.attrs[nid] or {}
        pub = a.get("publicid", "")
        sys = a.get("systemid", "")
        name = arena.text[nid] or ""
        if out.syntax == "html" and not pub and not sys:
            buf.append("<!doctype")
        else:
            buf.append("<!DOCTYPE")
        if name:
            buf.append(" " + name)
        if pub:
            buf.append(' PUBLIC "%s"' % pub)
        if sys:
            buf.append(' "%s"' % sys)
        buf.append(">")
        return
    if t == XMLDECL:
        a = arena.attrs[nid]
        name = arena.text[nid] or ""
        pi = name.startswith("!")
        buf.append("<" + ("!" if pi else "?"))
        buf.append(name.lstrip("!?"))
        tmp: list[str] = []
        _attrs_html(a, out, tmp)
        buf.extend(tmp)
        buf.append(("!" if pi else "?") + ">")
        return
