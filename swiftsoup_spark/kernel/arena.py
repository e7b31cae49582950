"""Flat struct-of-arrays DOM arena + node facade.

Where the reference builds a pointer-based node tree
(/root/reference/Sources/Node.swift:23-86), this engine keeps each
document's DOM as parallel arrays (node_id-indexed): ``parent``, ``ntype``,
``tag``, ``text``, ``attrs``, ``children``. Document order is DFS order over
``children``; selector evaluation and text extraction run as passes over
these columns, and the Spark kernel exports them directly into Arrow arrays
(the "arena DOM" demanded by the north star).

Node types:
  0 DOCUMENT, 1 ELEMENT, 2 TEXT, 3 DATA (script/style contents),
  4 COMMENT, 5 DOCTYPE, 6 XMLDECL, 7 CDATA (text, whitespace-preserving)
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from swiftsoup_spark.kernel.tags import GLOBAL_TAGS, TagRegistry

DOCUMENT, ELEMENT, TEXT, DATA, COMMENT, DOCTYPE, XMLDECL, CDATA = range(8)

_WS_RUN = re.compile(r"[ \t\n\f\r\xa0]+")
_WS_CHECK = re.compile(r"[\t\n\f\r\xa0]|  ")  # needs-normalization probe
_ASCII_WS = " \t\n\f\r"

# IANA-preferred display names for the common output charsets — the
# values Document.set_charset writes into <meta charset> / the XML decl
# (reference String.Encoding.displayName(); jsoup Charset.displayName()).
_CHARSET_DISPLAY = {
    "utf-8": "UTF-8", "utf8": "UTF-8", "utf-16": "UTF-16",
    "utf-16le": "UTF-16LE", "utf-16be": "UTF-16BE", "utf-32": "UTF-32",
    "ascii": "US-ASCII", "us-ascii": "US-ASCII",
    "latin-1": "ISO-8859-1", "latin1": "ISO-8859-1", "latin_1": "ISO-8859-1",
    "iso2022_jp": "ISO-2022-JP", "iso-2022-jp": "ISO-2022-JP",
    "shift_jis": "Shift_JIS", "euc_jp": "EUC-JP", "gbk": "GBK",
    "big5": "Big5", "koi8-r": "KOI8-R",
}


def charset_display_name(charset: str) -> str:
    """Canonical display form of a charset token (e.g. 'utf-8' ->
    'UTF-8', 'latin-1' -> 'ISO-8859-1', 'iso8859-2' -> 'ISO-8859-2')."""
    key = charset.strip().lower()
    hit = _CHARSET_DISPLAY.get(key)
    if hit:
        return hit
    m = re.fullmatch(r"(?:iso[-_]?8859|cp)[-_]?(\d+)", key)
    if m:
        if key.startswith("cp"):
            n = m.group(1)
            return "windows-" + n if n.startswith("12") else "cp" + n
        return "ISO-8859-" + m.group(1)
    m = re.fullmatch(r"windows[-_]?(\d+)", key)
    if m:
        return "windows-" + m.group(1)
    return charset.upper() if key.startswith("utf") else charset


class Arena:
    """One document's DOM as struct-of-arrays."""

    __slots__ = (
        "parent", "ntype", "tag", "text", "attrs", "children",
        "tags", "base_uri", "quirks", "errors", "error_list", "location",
        "selfclosing", "src_start", "src_end", "src_close", "form_controls",
        "display_tag", "out", "update_meta_charset", "np_cols", "source",
        "dirty", "mutated", "parsed_xml",
    )

    def __init__(self, tags: TagRegistry | None = None, base_uri: str = "") -> None:
        self.parent: list[int] = []
        self.ntype: list[int] = []
        self.tag: list[int] = []
        self.text: list[str | None] = []
        self.attrs: list[dict | None] = []
        self.children: list[list[int]] = []
        # source spans (char offsets into the decoded input; -1 = untracked)
        self.src_start: list[int] = []
        self.src_end: list[int] = []
        # raw-source serialization support (reference Node.swift:1001-1074
        # sourceRange/sourceRangeIsComplete/allowRawSource): for nodes
        # whose full subtree source is known (element closed by its own
        # explicit matching end tag, void element, comment), src_close
        # holds the char offset just past the subtree's source bytes;
        # -1 = incomplete (rebuild), -2 = never completable (the
        # subtree's source order diverges from DOM order, e.g. a table
        # that received foster-parented content). `source` is the decoded
        # input the spans index into; `dirty` is the reference's
        # sourceRangeDirty closure (mutated nodes plus all ancestors);
        # `mutated` records the exact mutation sites so the document
        # splice path (serializer._patched_doc) can prove every change
        # is covered by a patch instead of silently dropping it.
        self.src_close: list[int] = []
        self.source: str | None = None
        self.dirty: set[int] = set()
        self.mutated: set[int] = set()
        self.parsed_xml = False
        self.tags = tags if tags is not None else GLOBAL_TAGS
        self.base_uri = base_uri
        self.quirks = 0  # 0 no-quirks, 1 quirks, 2 limited-quirks
        self.errors = 0
        # bounded positioned error list (kernel.errors.ParseErrorList);
        # empty/no-tracking unless the parse enabled max_errors
        from swiftsoup_spark.kernel.errors import ParseErrorList
        self.error_list = ParseErrorList(0)
        self.location = base_uri
        self.selfclosing: set[int] = set()  # nodes whose start tag had '/>'
        self.out = None        # per-doc OutputSettings (None = default)
        # reference Document.updateMetaCharset (Document.swift:346-372):
        # when True, Document.set_charset syncs the <meta charset> element
        # / XML declaration. Off per default.
        self.update_meta_charset = False
        # C-builder fast columns: (order_i32, parent_i64, ntype_i8,
        # tag_i32) numpy views consumed by select.evaluators.Ctx;
        # invalidated on any structural mutation
        self.np_cols = None
        # form association (reference FormElement.swift): form node id ->
        # ordered list of its tracked control element ids
        self.form_controls: dict[int, list[int]] = {}
        # preserve-case display names (reference ParseSettings.preserveCase:
        # normalized name drives dispatch/selectors, display name drives
        # tagName()/serialization); empty under HTML default settings
        self.display_tag: dict[int, str] = {}

    # -- construction ----------------------------------------------------------
    def new_node(self, ntype: int, tag: int = -1, text: str | None = None,
                 attrs: dict | None = None) -> int:
        self.np_cols = None
        nid = len(self.parent)
        self.parent.append(-1)
        self.ntype.append(ntype)
        self.tag.append(tag)
        self.text.append(text)
        self.attrs.append(attrs)
        self.children.append([])
        self.src_start.append(-1)
        self.src_end.append(-1)
        self.src_close.append(-1)
        return nid

    def mark_dirty(self, nid: int) -> None:
        """Invalidate raw-source re-emit for ``nid`` and its ancestors
        (reference Node.markSourceDirty, Node.swift:528-558). Mutation
        APIs call this; the tree builders never do (bulk building keeps
        spans live, mirroring the reference's isBulkBuilding gate)."""
        if nid < 0:
            return
        self.mutated.add(nid)
        d = self.dirty
        parent = self.parent
        while nid != -1 and nid not in d:
            d.add(nid)
            nid = parent[nid]

    def new_element(self, name: str, attrs: dict | None = None) -> int:
        return self.new_node(ELEMENT, self.tags.intern(name), None, attrs)

    def append_child(self, pid: int, nid: int) -> None:
        self.np_cols = None
        if self.parent[nid] != -1:
            self.remove_from_parent(nid)
        self.parent[nid] = pid
        self.children[pid].append(nid)

    def insert_child(self, pid: int, index: int, nid: int) -> None:
        self.np_cols = None
        if self.parent[nid] != -1:
            self.remove_from_parent(nid)
        self.parent[nid] = pid
        self.children[pid].insert(index, nid)

    def insert_before(self, ref: int, nid: int) -> None:
        pid = self.parent[ref]
        self.insert_child(pid, self.children[pid].index(ref), nid)

    def remove_from_parent(self, nid: int) -> None:
        self.np_cols = None
        pid = self.parent[nid]
        if pid != -1:
            self.children[pid].remove(nid)
            self.parent[nid] = -1

    # -- trait helpers ---------------------------------------------------------
    def tag_name(self, nid: int) -> str:
        t = self.tag[nid]
        return self.tags.name(t) if t >= 0 else ""

    def tag_name_display(self, nid: int) -> str:
        """Original-case tag name under preserve-case settings
        (reference Element.tagName vs normalName)."""
        d = self.display_tag.get(nid)
        return d if d is not None else self.tag_name(nid)

    def is_block(self, nid: int) -> bool:
        return self.ntype[nid] == ELEMENT and self.tags.is_block(self.tag[nid])

    def preserves_ws(self, nid: int) -> bool:
        """Reference Element.preserveWhitespace: this element or its parent
        (one level up only) has the preserve-whitespace trait."""
        if nid < 0 or self.ntype[nid] != ELEMENT:
            return False
        if self.tags.preserve_ws(self.tag[nid]):
            return True
        pid = self.parent[nid]
        return pid >= 0 and self.ntype[pid] == ELEMENT and self.tags.preserve_ws(self.tag[pid])

    # -- traversal -------------------------------------------------------------
    def descendants(self, root: int) -> list[int]:
        """All nodes under root (excluding root) in document order."""
        out: list[int] = []
        stack = list(reversed(self.children[root]))
        while stack:
            nid = stack.pop()
            out.append(nid)
            ch = self.children[nid]
            if ch:
                stack.extend(reversed(ch))
        return out

    def element_descendants(self, root: int) -> list[int]:
        return [n for n in self.descendants(root) if self.ntype[n] == ELEMENT]

    # -- text extraction (the byte-identical contract) ---------------------------
    def node_text(self, root: int) -> str:
        """Element.text() semantics, byte-identical to the reference:
        DFS head-visitor; normalized text unless an enclosing pre/plaintext/
        title/textarea; single space on block/br boundaries; final trim.
        (reference Element.swift:1705-1875, StringUtil.swift:465-580)"""
        parts: list[str] = []
        nonempty = False
        last_space = False
        ntype, children, tag, tags, text, parent = (
            self.ntype, self.children, self.tag, self.tags, self.text, self.parent)
        traits = tags.traits
        from swiftsoup_spark.kernel.tags import IS_BLOCK, PRESERVE_WS
        br_id = tags.name_to_id.get("br", -2)
        ws_check = _WS_CHECK.search
        stack = [root]
        while stack:
            nid = stack.pop()
            t = ntype[nid]
            if t == TEXT or t == CDATA:
                raw = text[nid]
                if not raw:
                    continue
                pid = parent[nid]
                preserve = t == CDATA
                if not preserve and pid >= 0 and ntype[pid] == ELEMENT:
                    if traits[tag[pid]] & PRESERVE_WS:
                        preserve = True
                    else:
                        gp = parent[pid]
                        preserve = (gp >= 0 and ntype[gp] == ELEMENT
                                    and bool(traits[tag[gp]] & PRESERVE_WS))
                if preserve:
                    parts.append(raw)
                    nonempty = True
                    last_space = raw[-1] == " "
                else:
                    norm = raw if ws_check(raw) is None else _WS_RUN.sub(" ", raw)
                    if (not nonempty or last_space) and norm[:1] == " ":
                        norm = norm[1:]
                    if norm:
                        parts.append(norm)
                        nonempty = True
                        last_space = norm[-1] == " "
                continue
            if t == ELEMENT:
                tid = tag[nid]
                if nonempty and not last_space and (traits[tid] & IS_BLOCK or tid == br_id):
                    parts.append(" ")
                    last_space = True
            ch = children[nid]
            if ch:
                if len(ch) == 1:
                    stack.append(ch[0])
                else:
                    stack.extend(reversed(ch))
        return "".join(parts).strip(_ASCII_WS)

    def own_text(self, nid: int) -> str:
        """Direct-child text only; <br> contributes a space.
        (reference Element.swift:1952-1986)"""
        parts: list[str] = []
        nonempty = False
        last_space = False
        br_id = self.tags.name_to_id.get("br", -2)
        for cid in self.children[nid]:
            t = self.ntype[cid]
            if t == TEXT or t == CDATA:
                raw = self.text[cid] or ""
                if t == CDATA or self.preserves_ws(nid):
                    if raw:
                        parts.append(raw)
                        nonempty = True
                        last_space = raw[-1] == " "
                else:
                    norm = _WS_RUN.sub(" ", raw)
                    if norm:
                        if (not nonempty or last_space) and norm[0] == " ":
                            norm = norm[1:]
                        if norm:
                            parts.append(norm)
                            nonempty = True
                            last_space = norm[-1] == " "
            elif t == ELEMENT and self.tag[cid] == br_id and not last_space:
                parts.append(" ")
                last_space = True
        return "".join(parts).strip(_ASCII_WS)

    def node_data(self, root: int) -> str:
        """Concatenated DataNode/CDATA contents under root (Element.data())."""
        parts: list[str] = []
        stack = [root]
        while stack:
            nid = stack.pop()
            t = self.ntype[nid]
            if t == DATA or t == CDATA:
                parts.append(self.text[nid] or "")
            ch = self.children[nid]
            if ch:
                stack.extend(reversed(ch))
        return "".join(parts)

    def whole_text(self, root: int) -> str:
        parts: list[str] = []
        stack = [root]
        while stack:
            nid = stack.pop()
            t = self.ntype[nid]
            if t == TEXT or t == CDATA:
                parts.append(self.text[nid] or "")
            ch = self.children[nid]
            if ch:
                stack.extend(reversed(ch))
        return "".join(parts)


class Node:
    """Lightweight facade over (arena, id) — the test/parity API surface."""

    __slots__ = ("arena", "id")

    def __init__(self, arena: Arena, nid: int) -> None:
        self.arena = arena
        self.id = nid

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Node) and other.arena is self.arena and other.id == self.id

    def __hash__(self) -> int:
        return hash((id(self.arena), self.id))

    @property
    def node_type(self) -> int:
        return self.arena.ntype[self.id]

    @property
    def node_name(self) -> str:
        t = self.arena.ntype[self.id]
        if t == ELEMENT:
            return self.arena.tag_name(self.id)
        return {DOCUMENT: "#document", TEXT: "#text", DATA: "#data",
                COMMENT: "#comment", DOCTYPE: "#doctype", CDATA: "#cdata",
                XMLDECL: "#xmldecl"}.get(t, "#node")

    def parent(self) -> "Element | None":
        pid = self.arena.parent[self.id]
        if pid < 0:
            return None
        return _wrap(self.arena, pid)

    def child_nodes(self) -> list["Node"]:
        return [_wrap(self.arena, c) for c in self.arena.children[self.id]]

    def sibling_index(self) -> int:
        pid = self.arena.parent[self.id]
        if pid < 0:
            return 0
        return self.arena.children[pid].index(self.id)

    def next_sibling(self) -> "Node | None":
        pid = self.arena.parent[self.id]
        if pid < 0:
            return None
        sibs = self.arena.children[pid]
        i = sibs.index(self.id) + 1
        return _wrap(self.arena, sibs[i]) if i < len(sibs) else None

    def previous_sibling(self) -> "Node | None":
        pid = self.arena.parent[self.id]
        if pid < 0:
            return None
        sibs = self.arena.children[pid]
        i = sibs.index(self.id) - 1
        return _wrap(self.arena, sibs[i]) if i >= 0 else None

    def remove(self) -> None:
        pid = self.arena.parent[self.id]
        if pid >= 0:
            self.arena.mark_dirty(pid)
        self.arena.remove_from_parent(self.id)

    # attributes
    def attr(self, key: str) -> str:
        a = self.arena.attrs[self.id]
        # a literal "abs:xxx" attribute wins over abs-resolution
        # (reference NodeTest.testLiteralAbsPrefix)
        if key.startswith("abs:") and not (a is not None and key in a):
            return self.abs_url(key[4:])
        if a is None:
            return ""
        return a.get(key) or ""

    def has_attr(self, key: str) -> bool:
        a = self.arena.attrs[self.id]
        if key.startswith("abs:"):
            if a is not None and key in a:
                return True
            return bool(self.abs_url(key[4:]))
        return a is not None and key in a

    def set_attr(self, key: str, value: str) -> "Node":
        a = self.arena.attrs[self.id]
        if a is None:
            a = {}
            self.arena.attrs[self.id] = a
        a[key] = value
        self.arena.mark_dirty(self.id)
        return self

    def remove_attr(self, key: str) -> "Node":
        a = self.arena.attrs[self.id]
        if a is not None:
            a.pop(key, None)
            self.arena.mark_dirty(self.id)
        return self

    def abs_url(self, key: str) -> str:
        rel = self.attr(key)
        if not rel:
            return ""
        base = self.arena.base_uri
        if not base:
            # accept only already-absolute urls
            return rel if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", rel) else ""
        try:
            return urljoin(base, rel)
        except ValueError:
            return ""

    def outer_html(self) -> str:
        from swiftsoup_spark.kernel.serializer import serialize
        return serialize(self.arena, self.id, self.arena.out)

    # -- mutations (§2.5 DML surface; delegates to kernel.mutations) ------
    def before(self, html: str) -> "Node":
        from swiftsoup_spark.kernel import mutations as M
        M.before_html(self.arena, self.id, html)
        return self

    def after(self, html: str) -> "Node":
        from swiftsoup_spark.kernel import mutations as M
        M.after_html(self.arena, self.id, html)
        return self

    def wrap(self, html: str) -> "Node":
        from swiftsoup_spark.kernel import mutations as M
        M.wrap(self.arena, self.id, html)
        return self

    def unwrap(self) -> "Node | None":
        """Replace this node with its children; returns the FIRST child
        (or None if empty) — reference Node.unwrap()."""
        from swiftsoup_spark.kernel import mutations as M
        ch = self.arena.children[self.id]
        first = ch[0] if ch else None
        M.unwrap(self.arena, self.id)
        if first is None:
            return None
        if self.arena.ntype[first] == ELEMENT:
            return Element(self.arena, first)
        return Node(self.arena, first)

    def replace_with(self, other: "Node") -> "Node":
        from swiftsoup_spark.kernel import mutations as M
        M.replace_with(self.arena, self.id, other.id)
        return self


class Element(Node):
    __slots__ = ()

    @property
    def tag_name(self) -> str:
        return self.arena.tag_name(self.id)

    def is_block(self) -> bool:
        return self.arena.is_block(self.id)

    def element_id(self) -> str:
        return self.attr("id")

    def class_names(self) -> list[str]:
        cls = self.attr("class").strip()
        return [c for c in re.split(r"[ \t\n\f\r]+", cls) if c] if cls else []

    def has_class(self, name: str) -> bool:
        lname = name.lower()
        return any(c.lower() == lname for c in self.class_names())

    def children(self) -> list["Element"]:
        a = self.arena
        return [Element(a, c) for c in a.children[self.id] if a.ntype[c] == ELEMENT]

    def text(self) -> str:
        return self.arena.node_text(self.id)

    def own_text(self) -> str:
        return self.arena.own_text(self.id)

    def whole_text(self) -> str:
        return self.arena.whole_text(self.id)

    def data(self) -> str:
        return self.arena.node_data(self.id)

    def text_nodes(self) -> list[Node]:
        a = self.arena
        return [Node(a, c) for c in a.children[self.id] if a.ntype[c] in (TEXT, CDATA)]

    def select(self, css: str):
        from swiftsoup_spark.select.engine import select as _select
        from swiftsoup_spark.kernel.elements_api import Elements
        return Elements(Element(self.arena, i) for i in _select(self.arena, self.id, css))

    def select_first(self, css: str) -> "Element | None":
        r = self.select(css)
        return r[0] if r else None

    def matches(self, css: str) -> bool:
        from swiftsoup_spark.select.engine import node_matches
        return node_matches(self.arena, self.id, css)

    def html(self) -> str:
        from swiftsoup_spark.kernel.serializer import inner_html
        return inner_html(self.arena, self.id, self.arena.out)

    # getElementsBy* family (reference Element.swift:1215-1693) — these are
    # the reference's physical fast paths; here they compile to selectors.
    def get_elements_by_tag(self, name: str):
        return self.select(name.lower())

    def get_element_by_id(self, idv: str):
        r = self.select(f"#{idv}")
        return r[0] if r else None

    def get_elements_by_class(self, name: str):
        return self.select(f".{name}")

    def get_elements_by_attribute(self, key: str):
        return self.select(f"[{key}]")

    def get_elements_by_attribute_value(self, key: str, value: str):
        return self.select(f'[{key}="{value}"]')

    def get_all_elements(self):
        return self.select("*")

    def siblings(self) -> "list[Element]":
        p = self.parent()
        if p is None:
            return []
        return [e for e in p.children() if e.id != self.id]

    def next_element_sibling(self) -> "Element | None":
        p = self.parent()
        if p is None:
            return None
        sibs = p.children()
        idx = [e.id for e in sibs].index(self.id)
        return sibs[idx + 1] if idx + 1 < len(sibs) else None

    def previous_element_sibling(self) -> "Element | None":
        p = self.parent()
        if p is None:
            return None
        sibs = p.children()
        idx = [e.id for e in sibs].index(self.id)
        return sibs[idx - 1] if idx > 0 else None

    def elem_sibling_index(self) -> int:
        p = self.parent()
        if p is None:
            return 0
        return [e.id for e in p.children()].index(self.id)

    def append_element(self, name: str, attrs: dict | None = None) -> "Element":
        """Create a child element and return it (reference
        Element.appendElement, Element.swift)."""
        nid = self.arena.new_element(name, attrs)
        self.arena.mark_dirty(self.id)
        self.arena.append_child(self.id, nid)
        return Element(self.arena, nid)

    # mutations
    def append_html(self, html: str) -> "Element":
        from swiftsoup_spark.kernel import mutations as M
        M.append_html(self.arena, self.id, html)
        return self

    def prepend_html(self, html: str) -> "Element":
        from swiftsoup_spark.kernel import mutations as M
        M.prepend_html(self.arena, self.id, html)
        return self

    def set_text(self, text: str) -> "Element":
        from swiftsoup_spark.kernel import mutations as M
        M.set_text(self.arena, self.id, text)
        return self

    def set_html(self, html: str) -> "Element":
        from swiftsoup_spark.kernel import mutations as M
        M.set_html(self.arena, self.id, html)
        return self

    def set_tag_name(self, name: str) -> "Element":
        from swiftsoup_spark.kernel import mutations as M
        M.set_tag_name(self.arena, self.id, name)
        return self

    def empty(self) -> "Element":
        from swiftsoup_spark.kernel import mutations as M
        M.empty(self.arena, self.id)
        return self

    def add_class(self, name: str) -> "Element":
        from swiftsoup_spark.kernel import mutations as M
        M.add_class(self.arena, self.id, name)
        return self

    def remove_class(self, name: str) -> "Element":
        from swiftsoup_spark.kernel import mutations as M
        M.remove_class(self.arena, self.id, name)
        return self

    def toggle_class(self, name: str) -> "Element":
        from swiftsoup_spark.kernel import mutations as M
        M.toggle_class(self.arena, self.id, name)
        return self

    def val(self) -> str:
        if self.tag_name == "textarea":
            return self.text()
        return self.attr("value")

    def set_val(self, value: str) -> "Element":
        """Reference Element.val(String): textarea sets text, others the
        value attribute (Element.swift val setter)."""
        if self.tag_name == "textarea":
            self.set_text(value)
        else:
            self.set_attr("value", value)
        return self

    def as_form(self) -> "FormElement | None":
        return FormElement(self.arena, self.id) if self.tag_name == "form" else None

    def clone(self) -> "Element":
        """Deep copy of this element's subtree, detached (no parent) —
        reference Node.copy() (Node.swift copy/clone semantics)."""
        from swiftsoup_spark.kernel.mutations import copy_subtree
        return Element(self.arena, copy_subtree(self.arena, self.id, self.arena))


class FormElement(Element):
    """Form with tracked controls (reference FormElement.swift:14-161)."""

    __slots__ = ()

    def elements(self) -> list[Element]:
        return [Element(self.arena, c)
                for c in self.arena.form_controls.get(self.id, [])]

    def form_data(self) -> list[tuple[str, str]]:
        """(name, value) pairs of submittable controls."""
        out: list[tuple[str, str]] = []
        for el in self.elements():
            name = el.attr("name")
            if not name or el.has_attr("disabled"):
                continue
            tag = el.tag_name
            typ = el.attr("type").lower()
            if tag == "select":
                any_sel = False
                for opt in el.select("option[selected]"):
                    out.append((name, opt.val() or opt.text()))
                    any_sel = True
                if not any_sel:
                    first = el.select_first("option")
                    if first is not None:
                        out.append((name, first.val() or first.text()))
            elif typ in ("checkbox", "radio"):
                if el.has_attr("checked"):
                    out.append((name, el.attr("value") or "on"))
            elif tag == "textarea":
                out.append((name, el.text()))
            else:
                out.append((name, el.attr("value")))
        return out


class Document(Element):
    __slots__ = ()

    @property
    def output_settings(self):
        """Per-document serialization settings (reference
        Document.outputSettings(), Document.swift:647-812)."""
        if self.arena.out is None:
            from swiftsoup_spark.kernel.serializer import OutputSettings
            self.arena.out = OutputSettings()
        return self.arena.out

    def clone(self) -> "Document":
        """Independent deep copy of the whole document (reference
        Document.copy()): a fresh arena, mutations do not alias."""
        from swiftsoup_spark.kernel.mutations import copy_subtree
        a2 = Arena(self.arena.tags, self.arena.base_uri)
        root = copy_subtree(self.arena, self.id, a2)
        a2.quirks = self.arena.quirks
        return Document(a2, root)

    def _find(self, name: str) -> Element | None:
        a = self.arena
        tid = a.tags.name_to_id.get(name)
        for n in a.descendants(self.id):
            if a.ntype[n] == ELEMENT and a.tag[n] == tid:
                return Element(a, n)
        return None

    def head(self) -> Element | None:
        return self._find("head")

    def body(self) -> Element | None:
        return self._find("body")

    def title(self) -> str:
        t = self._find("title")
        return _WS_RUN.sub(" ", t.text()).strip(_ASCII_WS) if t else ""

    def set_title(self, title: str) -> "Document":
        """reference Document.title(set): update the first <title>, or
        create one in <head>."""
        t = self._find("title")
        if t is None:
            head = self.head()
            if head is None:
                return self
            tid = self.arena.new_element("title")
            self.arena.mark_dirty(head.id)
            self.arena.append_child(head.id, tid)
            t = Element(self.arena, tid)
        t.set_text(title)
        return self

    def text(self) -> str:
        return self.arena.node_text(self.id)

    # -- charset (reference Document.swift:321-400) ------------------------
    def charset(self) -> str:
        """Current output charset (reference Document.charset())."""
        return self.output_settings.charset

    def set_charset(self, charset: str) -> "Document":
        """Set the output charset AND sync the document's charset
        declaration (reference Document.charset(_:), Document.swift:321):
        enables updateMetaCharsetElement, then ensures a
        ``<meta charset>`` (html syntax) / XML declaration (xml syntax)
        carries the new value; obsolete ``<meta name=charset>`` elements
        are removed."""
        self.set_update_meta_charset(True)
        self.output_settings.charset = charset
        self._ensure_meta_charset_element()
        return self

    def set_update_meta_charset(self, update: bool) -> None:
        """reference Document.updateMetaCharsetElement(_:)."""
        self.arena.update_meta_charset = bool(update)

    def update_meta_charset(self) -> bool:
        """reference Document.updateMetaCharsetElement() getter."""
        return self.arena.update_meta_charset

    def _ensure_meta_charset_element(self) -> None:
        """reference Document.ensureMetaCharsetElement
        (Document.swift:379-430): update-or-create the charset element.
        No-op unless updateMetaCharset is enabled."""
        if not self.arena.update_meta_charset:
            return
        a = self.arena
        name = charset_display_name(self.output_settings.charset)
        if self.output_settings.syntax == "html":
            metas = self.select("meta[charset]")
            if metas:
                metas[0].set_attr("charset", name)
            else:
                head = self.head()
                if head is not None:
                    mid = a.new_element("meta", {"charset": name})
                    a.mark_dirty(head.id)
                    a.append_child(head.id, mid)
            # obsolete <meta name=charset content=...> definitions go away
            self.select("meta[name=charset]").remove()
        else:  # xml syntax -> declaration node
            kids = a.children[self.id]
            first = kids[0] if kids else None
            if first is not None and a.ntype[first] == XMLDECL and \
                    (a.text[first] or "").lstrip("!?") == "xml":
                attrs = a.attrs[first]
                if attrs is None:
                    attrs = {}
                    a.attrs[first] = attrs
                attrs["encoding"] = name
                attrs["version"] = "1.0"
                a.mark_dirty(first)
            else:
                did = a.new_node(XMLDECL, -1, "xml",
                                 {"version": "1.0", "encoding": name})
                a.mark_dirty(self.id)
                a.insert_child(self.id, 0, did)

    def errors(self):
        """Positioned parse errors from the last parse (bounded; empty
        unless the parse enabled ``max_errors`` — reference
        Parser.getErrors)."""
        return self.arena.error_list


def _wrap(arena: Arena, nid: int) -> Node:
    t = arena.ntype[nid]
    if t == ELEMENT:
        return Element(arena, nid)
    if t == DOCUMENT:
        return Document(arena, nid)
    return Node(arena, nid)
