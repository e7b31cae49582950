"""WHATWG HTML tree construction over the flat arena.

Re-expresses the reference's HtmlTreeBuilder / HtmlTreeBuilderState
(/root/reference/Sources/HtmlTreeBuilder.swift,
HtmlTreeBuilderState.swift — 23 insertion modes, adoption agency, foster
parenting, active formatting reconstruction) as an arena-writing builder.

Deliberate reference deviations we MUST mirror (they differ from the
WHATWG spec; see SURVEY.md §7 "hard parts"):
  * adoption agency: 8-iteration outer loop, 3-iteration inner loop,
    64-deep stack scan cap, no bookmark (HtmlTreeBuilderState.swift:1060-1161)
  * ``generateImpliedEndTags()`` with no exclude tag is a NO-OP
    (HtmlTreeBuilder.swift:1242-1249)
  * formatting element off stack at adoption start → anyOtherEndTag
"""

from __future__ import annotations

from swiftsoup_spark.kernel.arena import (
    Arena, CDATA, COMMENT, DATA, DOCTYPE, DOCUMENT, ELEMENT, TEXT,
)
from swiftsoup_spark.kernel.tags import TagRegistry
from swiftsoup_spark.kernel.tokenizer import Tokeniser

WS = "\t\n\f\r "

# --- tag-set constants (reference HtmlTreeBuilderState.swift:2517-2605) ----
IN_BODY_START_TO_HEAD = frozenset(
    "base basefont bgsound command link meta noframes script style title".split())
IN_BODY_START_P_CLOSERS = frozenset(
    """address article aside blockquote center details dir div dl fieldset
    figcaption figure footer header hgroup menu nav ol p section summary
    ul""".split())
HEADINGS = frozenset("h1 h2 h3 h4 h5 h6".split())
IN_BODY_START_LI_BREAKERS = frozenset("address div p".split())
DD_DT = frozenset("dd dt".split())
FORMATTERS = frozenset("a b big code em font i nobr s small strike strong tt u".split())
APPLETS = frozenset("applet marquee object".split())
EMPTY_FORMATTERS = frozenset("area br embed img keygen wbr".split())
MEDIA = frozenset("param source track".split())
IN_BODY_START_DROP = frozenset(
    "caption col colgroup frame head tbody td tfoot th thead tr".split())
IN_BODY_END_CLOSERS = frozenset(
    """address article aside blockquote button center details dir div dl
    fieldset figcaption figure footer header hgroup listing menu nav ol
    pre section summary ul""".split())
IN_BODY_END_ADOPTION_FORMATTERS = FORMATTERS
IN_BODY_END_TABLE_FOSTERS = frozenset("table tbody tfoot thead tr".split())
RAWTEXT_TAGS = frozenset("iframe noembed noframes style xmp".split())

IMPLIED_END_TAGS = frozenset("dd dt li option optgroup p rp rt".split())
SPECIAL = frozenset(
    """address applet area article aside base basefont bgsound blockquote
    body br button caption center col colgroup command dd details dir div
    dl dt embed fieldset figcaption figure footer form frame frameset h1
    h2 h3 h4 h5 h6 head header hgroup hr html iframe img input isindex li
    link listing marquee menu meta nav noembed noframes noscript object ol
    p param plaintext pre script section select style summary table tbody
    td textarea tfoot th thead title tr ul wbr xmp""".split())

SCOPE_BASE = ("applet", "caption", "html", "table", "td", "th", "marquee", "object")

# insertion modes
(INITIAL, BEFORE_HTML, BEFORE_HEAD, IN_HEAD, IN_HEAD_NOSCRIPT, AFTER_HEAD,
 IN_BODY, TEXT_MODE, IN_TABLE, IN_TABLE_TEXT, IN_CAPTION, IN_COLUMN_GROUP,
 IN_TABLE_BODY, IN_ROW, IN_CELL, IN_SELECT, IN_SELECT_IN_TABLE, AFTER_BODY,
 IN_FRAMESET, AFTER_FRAMESET, AFTER_AFTER_BODY, AFTER_AFTER_FRAMESET,
 FOREIGN) = range(23)


class HtmlTreeBuilder:
    def __init__(self, tags: TagRegistry | None = None,
                 track_spans: bool = True, max_errors: int = 0,
                 settings=None) -> None:
        self.tags = tags
        self.track_spans = track_spans
        self.max_errors = max_errors
        self.settings = settings

    # ------------------------------------------------------------------ setup
    def _init(self, html: str, base_uri: str) -> None:
        from swiftsoup_spark.kernel.errors import ParseErrorList
        self.arena = Arena(self.tags, base_uri)
        self.arena.error_list = ParseErrorList(self.max_errors)
        # the document node carries the reference's '#root' tag
        # (Document IS an Element, Element.swift:276): it is a
        # selector candidate for untagged evaluators ('*', :contains)
        self.doc = self.arena.new_node(DOCUMENT,
                                       self.arena.tags.intern("#root"))
        self.tok = Tokeniser(html, self.arena.error_list, self.settings)
        self.mode = INITIAL
        self.orig_mode = INITIAL
        self.stack: list[int] = []
        self.fmt: list[int | None] = []
        self.head_el: int | None = None
        self.form_el: int | None = None
        self.frameset_ok = True
        self.foster_inserts = False
        self.pending_chars: list[tuple] = []
        self.base_uri_set = False
        self.fragment = False
        self.context_tag: str | None = None
        self._pending_display: str | None = None
        # raw-source serialization (reference Node.swift:1001-1074): name
        # of the current source-backed start/end tag (None for synthetic /
        # reprocessed-without-source tokens). pop() stamps arena.src_close
        # when the popped element matches _cur_end (reference
        # HtmlTreeBuilder.pop, HtmlTreeBuilder.swift:580-592);
        # insert_empty/insert_comment stamp at insert (reference
        # insertEmpty/insert(comment), HtmlTreeBuilder.swift:355-410).
        self._cur_end: str | None = None
        self._cur_start: str | None = None
        self._cur_kind: str | None = None
        if self.track_spans:
            self.arena.source = html

    def parse(self, html: str, base_uri: str = "") -> Arena:
        self._init(html, base_uri)
        self._run()
        self.arena.errors = self.tok.errors
        return self.arena

    def parse_fragment(self, html: str, context: str | None, base_uri: str = "") -> tuple[Arena, list[int]]:
        """Returns (arena, root-level node ids). The arena's doc contains an
        <html> root holding the fragment (reference Parser.parseFragment /
        HtmlTreeBuilder.parseFragment, HtmlTreeBuilder.swift:88-145)."""
        self._init(html, base_uri)
        self.fragment = True
        root = self.arena.new_element("html")
        self.arena.append_child(self.doc, root)
        self.stack.append(root)
        if context:
            self.context_tag = context
            if context in ("title", "textarea"):
                self.tok.enter_raw("rcdata", context)
            elif context in ("iframe", "noembed", "noframes", "style", "xmp"):
                self.tok.enter_raw("rawtext", context)
            elif context == "script":
                self.tok.enter_raw("script", context)
            elif context == "plaintext":
                self.tok.enter_raw("plaintext", context)
            self._reset_insertion_mode(context)
            if context == "form":
                self.form_el = root
        else:
            self.mode = IN_BODY
        self._run()
        self.arena.errors = self.tok.errors
        return self.arena, list(self.arena.children[root])

    def _run(self) -> None:
        # a False return from process() is the "error, token ignored"
        # convention (reference tb.error(state)); with tracking enabled
        # those become positioned entries (reference ParseError(pos, msg))
        tok = self.tok
        errs = self.arena.error_list
        track = errs.max_size > 0
        while True:
            t = tok.read()
            if tok.tok_end > tok.tok_start:
                k = t[0]
                self._cur_kind = k
                self._cur_end = t[1] if k == "end" else None
                self._cur_start = t[1] if k == "start" else None
            else:  # synthetic / pending token: no source backing
                self._cur_kind = self._cur_end = self._cur_start = None
            ok = self.process(t)
            if track and ok is False:
                errs.add(tok.tok_start,
                         f"Unexpected {t[0]} token"
                         + (f" '{t[1]}'" if len(t) > 1 and t[0] != "char"
                            else ""))
            if t[0] == "eof":
                break
        # NOTE deliberately no EOF close-stamping: an element left open at
        # EOF can have later source content attached OUTSIDE its subtree
        # (e.g. an after-after-body comment appends to the Document while
        # lying inside <html>'s would-be span), so such spans are never
        # complete. The reference agrees — it only stamps at explicit
        # end-tag pops. Whole-document raw emit is handled instead by the
        # serializer's source-splice path, which needs no completeness
        # when nothing is dirty.

    # --------------------------------------------------------------- plumbing
    def current(self) -> int:
        return self.stack[-1]

    def current_name(self) -> str:
        return self.arena.tag_name(self.stack[-1]) if self.stack else ""

    def _name(self, nid: int) -> str:
        return self.arena.tag_name(nid)

    def is_special(self, nid: int) -> bool:
        return self._name(nid) in SPECIAL

    FORM_LISTED = frozenset(
        "button fieldset input keygen object output select textarea".split())

    def insert_elem(self, name: str, attrs: dict | None = None) -> int:
        el = self.arena.new_element(name, attrs)
        pd = self._pending_display
        if pd is not None and pd[0] == name:
            self.arena.display_tag[el] = pd[1]
        self._insert_node(el)
        self.stack.append(el)
        self._maybe_base(name, attrs)
        if self.form_el is not None and name in self.FORM_LISTED:
            self.arena.form_controls.setdefault(self.form_el, []).append(el)
        return el

    def insert_from_token(self, name: str, attrs: dict | None, sc: bool) -> int:
        """reference HtmlTreeBuilder.insert(startTag): a self-closing start
        tag inserts empty, pushes, and synthesizes its own end tag (queued
        into the tokenizer, so callers' post-insert steps — e.g. pushing
        onto the active formatting list — happen before the close)."""
        if sc:
            el = self.insert_empty(name, attrs, True)
            self.stack.append(el)
            self.tok._pending.insert(0, ("end", name))
            return el
        return self.insert_elem(name, attrs)

    def insert_empty(self, name: str, attrs: dict | None, self_closing: bool) -> int:
        el = self.arena.new_element(name, attrs)
        pd = self._pending_display
        if pd is not None and pd[0] == name:
            self.arena.display_tag[el] = pd[1]
        self._insert_node(el)
        if self.track_spans and self._cur_start == name:
            # void/self-closing subtree == its start tag (reference
            # insertEmpty, HtmlTreeBuilder.swift:360-362 complete:true)
            self.arena.src_close[el] = self.tok.tok_end
        if self_closing:
            self.arena.selfclosing.add(el)
        self._maybe_base(name, attrs)
        if self.form_el is not None and name in self.FORM_LISTED:
            self.arena.form_controls.setdefault(self.form_el, []).append(el)
        return el

    def _maybe_base(self, name: str, attrs: dict | None) -> None:
        # first <base href> wins, resolved against the document base
        # (reference HtmlParserTest testHandlesBaseTags)
        if name == "base" and attrs and attrs.get("href") and not self.base_uri_set:
            from swiftsoup_spark.clean.whitelist import resolve_url
            href = attrs["href"]
            self.arena.base_uri = resolve_url(self.arena.base_uri, href) or href
            self.base_uri_set = True

    def insert_char(self, text: str, kind: int = TEXT) -> None:
        tn = self.arena.new_node(kind, text=text)
        self._insert_node(tn)

    def insert_comment(self, data: str) -> None:
        c = self.arena.new_node(COMMENT, text=data)
        self._insert_node(c)
        if self.track_spans and self._cur_kind == "comment":
            # comment subtree == its token; raw emit reproduces the
            # original bytes even for bogus-comment forms like `</ x>`
            # (reference insert(commentToken), complete:true)
            self.arena.src_close[c] = self.tok.tok_end

    def _insert_node(self, nid: int) -> None:
        a = self.arena
        if self.track_spans:
            # selector-span support: record the triggering token's span
            a.src_start[nid] = self.tok.tok_start
            a.src_end[nid] = self.tok.tok_end
        if not self.stack:
            pid = self.doc
        elif self.foster_inserts and self.current_name() in (
                "table", "tbody", "tfoot", "thead", "tr"):
            self._foster_parent(nid)
            return
        else:
            pid = self.stack[-1]
        # fresh node: direct append (no reparent check needed)
        a.parent[nid] = pid
        a.children[pid].append(nid)

    def _foster_parent(self, nid: int) -> None:
        a = self.arena
        last_table = None
        for el in reversed(self.stack):
            if self._name(el) == "table":
                last_table = el
                break
        # the fostered node's source lies INSIDE the source span of the
        # table AND of every open element below it (tbody/tr/... down to
        # the current node) but OUTSIDE their DOM subtrees: none of them
        # can ever re-emit from raw source (-2 = permanently incomplete)
        if self.track_spans and self.stack:
            tgt = last_table if last_table is not None else self.stack[0]
            for el in self.stack[self.stack.index(tgt):]:
                a.src_close[el] = -2
        if last_table is not None:
            if a.parent[last_table] != -1:
                a.insert_before(last_table, nid)
            else:
                idx = self.stack.index(last_table)
                a.append_child(self.stack[idx - 1], nid)
        else:
            a.append_child(self.stack[0], nid)

    def pop(self) -> int:
        el = self.stack.pop()
        if self._cur_end is not None:
            self._stamp_close(el)
        return el

    def _stamp_close(self, el: int) -> None:
        """Record the end of ``el``'s source subtree (just past the
        current end tag) when the element is being closed by its own
        explicit end tag — the raw-source re-emit contract (reference
        Node.setSourceRangeEnd, Node.swift:566-573)."""
        a = self.arena
        if (self.track_spans and self._cur_end is not None
                and a.src_close[el] == -1 and a.src_start[el] >= 0
                and a.tag_name(el) == self._cur_end):
            a.src_close[el] = self.tok.tok_end
            # single-shot per token: a second same-named element popped
            # by the same end tag must not claim the close offset
            self._cur_end = None

    def pop_to_close(self, *names: str) -> None:
        while self.stack:
            el = self.pop()
            if self._name(el) in names:
                break

    def pop_to_before(self, name: str) -> None:
        while self.stack and self._name(self.current()) != name:
            self.pop()

    def clear_stack_to_table_context(self) -> None:
        while self.stack and self.current_name() not in ("table", "html"):
            self.pop()

    def clear_stack_to_table_body_context(self) -> None:
        while self.stack and self.current_name() not in ("tbody", "tfoot", "thead", "html"):
            self.pop()

    def clear_stack_to_table_row_context(self) -> None:
        while self.stack and self.current_name() not in ("tr", "html"):
            self.pop()

    def remove_from_stack(self, nid: int) -> None:
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] == nid:
                del self.stack[i]
                return

    def on_stack(self, nid: int) -> bool:
        return nid in self.stack

    def above_on_stack(self, nid: int) -> int | None:
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] == nid:
                return self.stack[i - 1] if i > 0 else None
        return None

    def insert_on_stack_after(self, after: int, nid: int) -> None:
        i = len(self.stack) - 1 - self.stack[::-1].index(after)
        self.stack.insert(i + 1, nid)

    def replace_on_stack(self, out: int, inn: int) -> None:
        for i, el in enumerate(self.stack):
            if el == out:
                self.stack[i] = inn
                return

    # scopes (reference HtmlTreeBuilder.swift:1000-1162)
    def _in_scope(self, names: tuple[str, ...], base: tuple[str, ...] = SCOPE_BASE,
                  extra: tuple[str, ...] = ()) -> bool:
        stack = self.stack
        arena_tag, tag_names = self.arena.tag, self.arena.tags.names
        lo = max(len(stack) - 100, 0)
        for i in range(len(stack) - 1, lo - 1, -1):
            n = tag_names[arena_tag[stack[i]]]
            if n in names:
                return True
            if n in base or n in extra:
                return False
        return False

    def in_scope(self, name: str) -> bool:
        return self._in_scope((name,))

    def in_button_scope(self, name: str) -> bool:
        return self._in_scope((name,), extra=("button",))

    def in_list_scope(self, name: str) -> bool:
        return self._in_scope((name,), extra=("ol", "ul"))

    def in_table_scope(self, name: str) -> bool:
        for el in reversed(self.stack):
            n = self._name(el)
            if n == name:
                return True
            if n in ("html", "table"):
                return False
        return False

    def in_select_scope(self, name: str) -> bool:
        for el in reversed(self.stack):
            n = self._name(el)
            if n == name:
                return True
            if n not in ("optgroup", "option"):
                return False
        return False

    def generate_implied_end_tags(self, exclude: str | None = None) -> None:
        # reference quirk: no-op when exclude is nil (HtmlTreeBuilder.swift:1242)
        if exclude is None:
            return
        while self.stack:
            n = self.current_name()
            if n == exclude or n not in IMPLIED_END_TAGS:
                return
            self.pop()

    # active formatting elements (reference HtmlTreeBuilder.swift:1291-1407)
    def push_fmt(self, el: int) -> None:
        a = self.arena
        num_seen = 0
        for pos in range(len(self.fmt) - 1, -1, -1):
            e = self.fmt[pos]
            if e is None:
                break
            if (self._name(e) == self._name(el)
                    and (a.attrs[e] or {}) == (a.attrs[el] or {})):
                num_seen += 1
            if num_seen == 3:
                del self.fmt[pos]
                break
        self.fmt.append(el)

    def last_fmt(self) -> int | None:
        return self.fmt[-1] if self.fmt else None

    def get_active_fmt(self, name: str) -> int | None:
        for e in reversed(self.fmt):
            if e is None:
                break
            if self._name(e) == name:
                return e
        return None

    def remove_fmt(self, el: int) -> None:
        for i in range(len(self.fmt) - 1, -1, -1):
            if self.fmt[i] == el:
                del self.fmt[i]
                return

    def replace_fmt(self, out: int, inn: int) -> None:
        for i, e in enumerate(self.fmt):
            if e == out:
                self.fmt[i] = inn
                return

    def in_fmt(self, el: int) -> bool:
        return el in self.fmt

    def clear_fmt_to_marker(self) -> None:
        while self.fmt:
            if self.fmt.pop() is None:
                break

    def reconstruct_fmt(self) -> None:
        last = self.last_fmt()
        if last is None or self.on_stack(last):
            return
        size = len(self.fmt)
        pos = size - 1
        skip = False
        entry = last
        while True:
            if pos == 0:
                skip = True
                break
            pos -= 1
            entry = self.fmt[pos]
            if entry is None or self.on_stack(entry):
                break
        while True:
            if not skip:
                pos += 1
                entry = self.fmt[pos]
            skip = False
            a = self.arena
            new_el = self.insert_elem(self._name(entry), dict(a.attrs[entry] or {}) or None)
            self.fmt[pos] = new_el
            if pos == size - 1:
                break

    def insert_marker(self) -> None:
        self.fmt.append(None)

    # --------------------------------------------------------------- dispatch
    def process(self, t: tuple, mode: int | None = None) -> bool:
        if t[0] == "cdata":
            # reference (pre-CDataNode jsoup): CDATA becomes a plain TextNode
            t = ("char", t[1])
        elif t[0] == "start" and len(t) > 4:
            # preserve-case settings: remember the display name for the
            # element this token inserts (normalized name drives logic);
            # paired with the normalized name so synthesized elements
            # (html/head/body) never pick it up
            self._pending_display = (t[1], t[4])
            try:
                return _MODES[self.mode if mode is None else mode](self, t)
            finally:
                self._pending_display = None
        m = self.mode if mode is None else mode
        return _MODES[m](self, t)

    def _reset_insertion_mode(self, frag_context: str | None = None) -> None:
        last = False
        for i in range(len(self.stack) - 1, -1, -1):
            nid = self.stack[i]
            name = self._name(nid)
            if i == 0:
                last = True
                if self.fragment:
                    name = frag_context or self.context_tag or ""
            if name == "select":
                self.mode = IN_SELECT
                return
            if name in ("td", "th") and not last:
                self.mode = IN_CELL
                return
            if name == "tr":
                self.mode = IN_ROW
                return
            if name in ("tbody", "thead", "tfoot"):
                self.mode = IN_TABLE_BODY
                return
            if name == "caption":
                self.mode = IN_CAPTION
                return
            if name == "colgroup":
                self.mode = IN_COLUMN_GROUP
                return
            if name == "table":
                self.mode = IN_TABLE
                return
            if name == "head":
                self.mode = IN_BODY
                return
            if name == "body":
                self.mode = IN_BODY
                return
            if name == "frameset":
                self.mode = IN_FRAMESET
                return
            if name == "html":
                self.mode = BEFORE_HEAD
                return
            if last:
                self.mode = IN_BODY
                return
        self.mode = IN_BODY

    # ------------------------------------------------------------------ modes
    def _initial(self, t: tuple) -> bool:
        k = t[0]
        if k == "char" and not t[1].strip(WS):
            return True
        if k == "comment":
            self.arena.append_child(self.doc, self.arena.new_node(COMMENT, text=t[1]))
            return True
        if k == "doctype":
            name, pub, sys, fq = t[1], t[2], t[3], t[4]
            d = self.arena.new_node(DOCTYPE, text=name)
            self.arena.attrs[d] = {"publicid": pub or "", "systemid": sys or ""}
            self.arena.append_child(self.doc, d)
            if fq or name != "html" or (pub is not None) or (sys is not None and sys != "about:legacy-compat"):
                if fq:
                    self.arena.quirks = 1
            self.mode = BEFORE_HTML
            return True
        self.mode = BEFORE_HTML
        return self.process(t)

    def _before_html(self, t: tuple) -> bool:
        k = t[0]
        if k == "doctype":
            return True
        if k == "comment":
            self.arena.append_child(self.doc, self.arena.new_node(COMMENT, text=t[1]))
            return True
        if k == "char" and not t[1].strip(WS):
            return True
        if k == "start" and t[1] == "html":
            el = self.arena.new_element("html", t[2])
            self.arena.append_child(self.doc, el)
            self.stack.append(el)
            self.mode = BEFORE_HEAD
            return True
        if k == "end" and t[1] not in ("head", "body", "html", "br"):
            return True  # error, ignore
        el = self.arena.new_element("html")
        self.arena.append_child(self.doc, el)
        self.stack.append(el)
        self.mode = BEFORE_HEAD
        return self.process(t)

    def _before_head(self, t: tuple) -> bool:
        k = t[0]
        if k == "char" and not t[1].strip(WS):
            return True
        if k == "comment":
            self.insert_comment(t[1])
            return True
        if k == "doctype":
            return True
        if k == "start" and t[1] == "html":
            return self.process(t, IN_BODY)
        if k == "start" and t[1] == "head":
            self.head_el = self.insert_elem("head", t[2])
            self.mode = IN_HEAD
            return True
        if k == "end" and t[1] not in ("head", "body", "html", "br"):
            return True
        self.head_el = self.insert_elem("head")
        self.mode = IN_HEAD
        return self.process(t)

    def _in_head(self, t: tuple) -> bool:
        k = t[0]
        if k == "char" and not t[1].strip(WS):
            self.insert_char(t[1])
            return True
        if k == "comment":
            self.insert_comment(t[1])
            return True
        if k == "doctype":
            return True
        if k == "start":
            name = t[1]
            if name == "html":
                return self.process(t, IN_BODY)
            if name in ("base", "basefont", "bgsound", "command", "link", "meta"):
                self.insert_empty(name, t[2], t[3])
                return True
            if name == "title":
                if t[3]:
                    self.insert_from_token(name, t[2], True)
                    self.orig_mode = self.mode
                    self.mode = TEXT_MODE
                    return True
                self.insert_elem(name, t[2])
                self.tok.enter_raw("rcdata", name)
                self.orig_mode = self.mode
                self.mode = TEXT_MODE
                return True
            if name in ("noframes", "style"):
                if t[3]:
                    self.insert_from_token(name, t[2], True)
                    self.orig_mode = self.mode
                    self.mode = TEXT_MODE
                    return True
                self.insert_elem(name, t[2])
                self.tok.enter_raw("rawtext", name)
                self.orig_mode = self.mode
                self.mode = TEXT_MODE
                return True
            if name == "noscript":
                self.insert_elem(name, t[2])
                self.mode = IN_HEAD_NOSCRIPT
                return True
            if name == "script":
                if t[3]:
                    self.insert_from_token(name, t[2], True)
                    self.orig_mode = self.mode
                    self.mode = TEXT_MODE
                    return True
                self.insert_elem(name, t[2])
                self.tok.enter_raw("script", name)
                self.orig_mode = self.mode
                self.mode = TEXT_MODE
                return True
            if name == "head":
                return True  # error
        if k == "end":
            name = t[1]
            if name == "head":
                self.pop()
                self.mode = AFTER_HEAD
                return True
            if name in ("body", "html", "br"):
                pass  # fall through to anything-else
            else:
                return True  # error
        # anything else: pop head, reprocess in AfterHead
        self.pop()
        self.mode = AFTER_HEAD
        return self.process(t)

    def _in_head_noscript(self, t: tuple) -> bool:
        # reference InHeadNoscript: the anything-else branch inserts the
        # TOKEN'S STRING RENDERING as a text node inside <noscript>
        # (HtmlTreeBuilderState InHeadNoscript anythingElse:
        # tb.insert(Token.Char().data(t.toString())) — so
        # '<noscript><img src=foo>' keeps '<img src="foo">' as TEXT,
        # HtmlParserTest.swift:592-594), and stray end tags are DROPPED.
        k = t[0]
        if k == "doctype":
            return True  # error
        if k == "start" and t[1] == "html":
            return self.process(t, IN_BODY)
        if k == "end" and t[1] == "noscript":
            self.pop()
            self.mode = IN_HEAD
            return True
        if (k == "char" and not t[1].strip(WS)) or k == "comment" or (
                k == "start" and t[1] in ("basefont", "bgsound", "link", "meta", "noframes", "style")):
            return self.process(t, IN_HEAD)
        if k == "end" and t[1] == "br":
            self.insert_char(self._token_text(t))
            return True
        if (k == "start" and t[1] in ("head", "noscript")) or k == "end":
            return False  # error, token dropped
        self.insert_char(self._token_text(t))
        return True

    def _token_text(self, t: tuple) -> str:
        """Token.toString() (reference Token.swift Tag/EndTag/Char
        toString): start tags render '<name key="escaped-val" bare>',
        end tags '</name>', char tokens their data; EOF renders the
        Swift String(describing:) artifact "EOF" (mirrored for parity).
        """
        from swiftsoup_spark.kernel.entities import escape
        k = t[0]
        if k == "start":
            attrs = t[2]
            if attrs:
                parts = []
                for key, v in attrs.items():
                    parts.append(
                        key if v is None
                        else f'{key}="{escape(v, in_attribute=True)}"')
                return "<" + t[1] + " " + " ".join(parts) + ">"
            return "<" + t[1] + ">"
        if k == "end":
            return "</" + t[1] + ">"
        if k in ("char", "cdata", "data"):
            return t[1]
        if k == "eof":
            return "EOF"
        return ""

    def _after_head(self, t: tuple) -> bool:
        k = t[0]
        if k == "char" and not t[1].strip(WS):
            self.insert_char(t[1])
            return True
        if k == "comment":
            self.insert_comment(t[1])
            return True
        if k == "doctype":
            return True
        if k == "start":
            name = t[1]
            if name == "html":
                return self.process(t, IN_BODY)
            if name == "body":
                self.insert_elem("body", t[2])
                self.frameset_ok = False
                self.mode = IN_BODY
                return True
            if name == "frameset":
                self.insert_elem("frameset", t[2])
                self.mode = IN_FRAMESET
                return True
            if name in ("base", "basefont", "bgsound", "link", "meta", "noframes",
                        "script", "style", "title"):
                # error: re-enter head
                if self.head_el is not None:
                    self.stack.append(self.head_el)
                    r = self.process(t, IN_HEAD)
                    self.remove_from_stack(self.head_el)
                    return r
                return self.process(t, IN_HEAD)
            if name == "head":
                return True
        if k == "end" and t[1] not in ("body", "html"):
            return True
        self.insert_elem("body")
        self.frameset_ok = True
        self.mode = IN_BODY
        return self.process(t)

    # ----------------------------------------------------------------- InBody
    def _in_body(self, t: tuple) -> bool:
        k = t[0]
        a = self.arena
        if k == "char" or k == "cdata":
            text = t[1]
            if k == "char" and text == "\x00":
                return False
            self.reconstruct_fmt()
            self.insert_char(text, TEXT if k == "char" else CDATA)
            if self.frameset_ok and text.strip(WS):
                self.frameset_ok = False
            return True
        if k == "data":
            self.reconstruct_fmt()
            self.insert_char(t[1], DATA)
            return True
        if k == "comment":
            self.insert_comment(t[1])
            return True
        if k == "doctype":
            return True
        if k == "start":
            return self._in_body_start(t)
        if k == "end":
            return self._in_body_end(t)
        if k == "eof":
            return True
        return True

    def _in_body_start(self, t: tuple) -> bool:
        name, attrs, sc = t[1], t[2], t[3]
        a = self.arena
        if name == "html":
            # merge attributes onto <html>
            if self.stack:
                root = self.stack[0]
                cur = a.attrs[root]
                if attrs:
                    if cur is None:
                        a.attrs[root] = dict(attrs)
                    else:
                        for kk, vv in attrs.items():
                            cur.setdefault(kk, vv)
            return True
        if name in IN_BODY_START_TO_HEAD:
            return self.process(t, IN_HEAD)
        if name == "body":
            self.frameset_ok = False
            if len(self.stack) >= 2 and self._name(self.stack[1]) == "body":
                body = self.stack[1]
                cur = a.attrs[body]
                if attrs:
                    if cur is None:
                        a.attrs[body] = dict(attrs)
                    else:
                        for kk, vv in attrs.items():
                            cur.setdefault(kk, vv)
            return True
        if name == "frameset":
            if len(self.stack) < 2 or self._name(self.stack[1]) != "body" or not self.frameset_ok:
                return False
            body = self.stack[1]
            a.remove_from_parent(body)
            while len(self.stack) > 1:
                self.pop()
            self.insert_elem("frameset", attrs)
            self.mode = IN_FRAMESET
            return True
        if name in IN_BODY_START_P_CLOSERS:
            if self.in_button_scope("p"):
                self.process(("end", "p"))
            self.insert_from_token(name, attrs, sc)
            return True
        if name in HEADINGS:
            if self.in_button_scope("p"):
                self.process(("end", "p"))
            if self.current_name() in HEADINGS:
                self.pop()
            self.insert_from_token(name, attrs, sc)
            return True
        if name in ("pre", "listing"):
            if self.in_button_scope("p"):
                self.process(("end", "p"))
            self.insert_from_token(name, attrs, sc)
            self.frameset_ok = False
            return True
        if name == "form":
            if self.form_el is not None:
                return False
            if self.in_button_scope("p"):
                self.process(("end", "p"))
            self.form_el = self.insert_from_token(name, attrs, sc)
            return True
        if name == "li":
            self.frameset_ok = False
            for el in reversed(self.stack):
                n = self._name(el)
                if n == "li":
                    self.process(("end", "li"))
                    break
                if n in SPECIAL and n not in IN_BODY_START_LI_BREAKERS:
                    break
            if self.in_button_scope("p"):
                self.process(("end", "p"))
            self.insert_from_token(name, attrs, sc)
            return True
        if name in DD_DT:
            self.frameset_ok = False
            for el in reversed(self.stack):
                n = self._name(el)
                if n in DD_DT:
                    self.process(("end", n))
                    break
                if n in SPECIAL and n not in IN_BODY_START_LI_BREAKERS:
                    break
            if self.in_button_scope("p"):
                self.process(("end", "p"))
            self.insert_from_token(name, attrs, sc)
            return True
        if name == "plaintext":
            if self.in_button_scope("p"):
                self.process(("end", "p"))
            self.insert_elem(name, attrs)
            self.tok.enter_raw("plaintext", name)
            return True
        if name == "button":
            if self.in_button_scope("button"):
                self.process(("end", "button"))
                return self.process(t)
            self.reconstruct_fmt()
            self.insert_from_token(name, attrs, sc)
            self.frameset_ok = False
            return True
        if name == "a":
            if self.get_active_fmt("a") is not None:
                self.process(("end", "a"))
                rem = self.get_active_fmt("a")
                if rem is not None:
                    self.remove_fmt(rem)
                    self.remove_from_stack(rem)
            self.reconstruct_fmt()
            el = self.insert_from_token(name, attrs, sc)
            self.push_fmt(el)
            return True
        if name in FORMATTERS:
            self.reconstruct_fmt()
            el = self.insert_from_token(name, attrs, sc)
            self.push_fmt(el)
            return True
        if name == "nobr":
            self.reconstruct_fmt()
            if self.in_scope("nobr"):
                self.process(("end", "nobr"))
                self.reconstruct_fmt()
            el = self.insert_from_token(name, attrs, sc)
            self.push_fmt(el)
            return True
        if name in APPLETS:
            self.reconstruct_fmt()
            self.insert_from_token(name, attrs, sc)
            self.insert_marker()
            self.frameset_ok = False
            return True
        if name == "table":
            if self.arena.quirks != 1 and self.in_button_scope("p"):
                self.process(("end", "p"))
            self.insert_from_token(name, attrs, sc)
            self.frameset_ok = False
            self.mode = IN_TABLE
            return True
        if name in EMPTY_FORMATTERS:
            self.reconstruct_fmt()
            self.insert_empty(name, attrs, sc)
            self.frameset_ok = False
            return True
        if name == "input":
            self.reconstruct_fmt()
            self.insert_empty(name, attrs, sc)
            if not attrs or attrs.get("type", "").lower() != "hidden":
                self.frameset_ok = False
            return True
        if name in MEDIA:
            self.insert_empty(name, attrs, sc)
            return True
        if name == "hr":
            if self.in_button_scope("p"):
                self.process(("end", "p"))
            self.insert_empty(name, attrs, sc)
            self.frameset_ok = False
            return True
        if name == "image":
            # most browsers: rewrite to img
            return self.process(("start", "img", attrs, sc))
        if name == "textarea":
            if sc:
                self.insert_from_token(name, attrs, True)
                self.orig_mode = self.mode
                self.mode = TEXT_MODE
                return True
            self.insert_elem(name, attrs)
            self.tok.enter_raw("rcdata", name)
            self.frameset_ok = False
            self.orig_mode = self.mode
            self.mode = TEXT_MODE
            return True
        if name == "xmp":
            if self.in_button_scope("p"):
                self.process(("end", "p"))
            self.reconstruct_fmt()
            self.frameset_ok = False
            if sc:
                self.insert_from_token(name, attrs, True)
                self.orig_mode = self.mode
                self.mode = TEXT_MODE
                return True
            self.insert_elem(name, attrs)
            self.tok.enter_raw("rawtext", name)
            self.orig_mode = self.mode
            self.mode = TEXT_MODE
            return True
        if name == "iframe":
            self.frameset_ok = False
            if sc:
                self.insert_from_token(name, attrs, True)
                self.orig_mode = self.mode
                self.mode = TEXT_MODE
                return True
            self.insert_elem(name, attrs)
            self.tok.enter_raw("rawtext", name)
            self.orig_mode = self.mode
            self.mode = TEXT_MODE
            return True
        if name == "noembed":
            if sc:
                self.insert_from_token(name, attrs, True)
                self.orig_mode = self.mode
                self.mode = TEXT_MODE
                return True
            self.insert_elem(name, attrs)
            self.tok.enter_raw("rawtext", name)
            self.orig_mode = self.mode
            self.mode = TEXT_MODE
            return True
        if name == "select":
            self.reconstruct_fmt()
            self.insert_from_token(name, attrs, sc)
            self.frameset_ok = False
            if self.mode in (IN_TABLE, IN_CAPTION, IN_TABLE_BODY, IN_ROW, IN_CELL):
                self.mode = IN_SELECT_IN_TABLE
            else:
                self.mode = IN_SELECT
            return True
        if name in ("optgroup", "option"):
            if self.current_name() == "option":
                self.process(("end", "option"))
            self.reconstruct_fmt()
            self.insert_from_token(name, attrs, sc)
            return True
        if name in ("rp", "rt"):
            if self.in_scope("ruby"):
                self.generate_implied_end_tags()
                self.insert_from_token(name, attrs, sc)
            return True
        # NOTE: svg/math intentionally take the generic branch below.
        # The reference has NO ForeignContent implementation — the mode
        # body is a stub (HtmlTreeBuilderState.swift:2436-2439 "todo:
        # implement. Also how do we get here?") and "svg"/"math" appear
        # only in Tag.swift:584's block list, so the reference parses
        # their contents as regular HTML via the anything-else insert.
        if name in IN_BODY_START_DROP:
            return False
        self.reconstruct_fmt()
        self.insert_from_token(name, attrs, sc)
        return True

    def _in_body_end(self, t: tuple) -> bool:
        name = t[1]
        a = self.arena
        if name in IN_BODY_END_ADOPTION_FORMATTERS:
            return self._adoption_agency(t, name)
        if name == "body":
            if not self.in_scope("body"):
                return False
            self.mode = AFTER_BODY
            return True
        if name == "html":
            if self.process(("end", "body")):
                return self.process(t, AFTER_BODY)
            return True
        if name in IN_BODY_END_CLOSERS:
            if not self.in_scope(name):
                return False
            self.generate_implied_end_tags()
            self.pop_to_close(name)
            return True
        if name == "form":
            current_form = self.form_el
            self.form_el = None
            if current_form is None or not self.in_scope(name):
                return False
            self.generate_implied_end_tags()
            self.remove_from_stack(current_form)
            return True
        if name == "p":
            if not self.in_button_scope(name):
                self.process(("start", "p", None, False))
                return self.process(t)
            self.generate_implied_end_tags(name)
            self.pop_to_close(name)
            return True
        if name == "li":
            if not self.in_list_scope(name):
                return False
            self.generate_implied_end_tags(name)
            self.pop_to_close(name)
            return True
        if name in DD_DT:
            if not self.in_scope(name):
                return False
            self.generate_implied_end_tags(name)
            self.pop_to_close(name)
            return True
        if name in HEADINGS:
            if not self._in_scope(tuple(HEADINGS)):
                return False
            self.generate_implied_end_tags(name)
            self.pop_to_close(*HEADINGS)
            return True
        if name == "sarcasm":
            return self._any_other_end_tag(name)
        if name in APPLETS:
            if not self.in_scope(name):
                return False
            self.generate_implied_end_tags()
            self.pop_to_close(name)
            self.clear_fmt_to_marker()
            return True
        if name == "br":
            return False  # error: ignore </br>
        return self._any_other_end_tag(name)

    def _any_other_end_tag(self, name: str) -> bool:
        for el in reversed(self.stack):
            n = self._name(el)
            if n == name:
                self.generate_implied_end_tags(name)
                self.pop_to_close(name)
                break
            if n in SPECIAL:
                return False
        return True

    def _adoption_agency(self, t: tuple, name: str) -> bool:
        # reference HtmlTreeBuilderState.swift:1060-1161 (jsoup-derived):
        # 8 outer iterations, 3 inner, 64-deep scan, no bookmark
        a = self.arena
        for _ in range(8):
            fmt_el = self.get_active_fmt(name)
            if fmt_el is None:
                return self._any_other_end_tag(name)
            if not self.on_stack(fmt_el):
                self.remove_fmt(fmt_el)
                return self._any_other_end_tag(name)
            if not self.in_scope(self._name(fmt_el)):
                return False
            furthest = None
            common_ancestor = None
            seen = False
            size = min(len(self.stack), 64)
            for si in range(size):
                el = self.stack[si]
                if el == fmt_el:
                    common_ancestor = self.stack[si - 1]
                    seen = True
                elif seen and self.is_special(el):
                    furthest = el
                    break
            if furthest is None:
                self.pop_to_close(self._name(fmt_el))
                self.remove_fmt(fmt_el)
                return True
            # restructuring begins: reparented subtrees no longer match
            # source order, so no element closed during (or after) this
            # run may claim a complete raw span
            self._cur_end = None
            node = furthest
            last_node = furthest
            for _ in range(3):
                if node is not None and self.on_stack(node):
                    node = self.above_on_stack(node)
                if node is not None and not self.in_fmt(node):
                    self.remove_from_stack(node)
                    continue
                if node == fmt_el:
                    break
                replacement = a.new_element(self._name(node), dict(a.attrs[node] or {}) or None)
                self.replace_fmt(node, replacement)
                self.replace_on_stack(node, replacement)
                node = replacement
                if a.parent[last_node] != -1:
                    a.remove_from_parent(last_node)
                a.append_child(node, last_node)
                last_node = node
            if self._name(common_ancestor) in IN_BODY_END_TABLE_FOSTERS:
                if a.parent[last_node] != -1:
                    a.remove_from_parent(last_node)
                self._foster_parent(last_node)
            else:
                if a.parent[last_node] != -1:
                    a.remove_from_parent(last_node)
                a.append_child(common_ancestor, last_node)
            adopter = a.new_element(name, dict(a.attrs[fmt_el] or {}) or None)
            for ch in list(a.children[furthest]):
                a.append_child(adopter, ch)
            a.append_child(furthest, adopter)
            self.remove_fmt(fmt_el)
            self.remove_from_stack(fmt_el)
            self.insert_on_stack_after(furthest, adopter)
        return True

    # ------------------------------------------------------------------- Text
    def _text(self, t: tuple) -> bool:
        k = t[0]
        if k in ("char", "cdata"):
            self.insert_char(t[1], TEXT if k == "char" else CDATA)
            return True
        if k == "data":
            self.insert_char(t[1], DATA)
            return True
        if k == "eof":
            self.pop()
            self.mode = self.orig_mode
            return self.process(t)
        if k == "end":
            self.pop()
            self.mode = self.orig_mode
            return True
        return True

    # ------------------------------------------------------------------ tables
    def _in_table(self, t: tuple) -> bool:
        k = t[0]
        if k in ("char", "cdata", "data"):
            self.pending_chars = []
            self.orig_mode = self.mode
            self.mode = IN_TABLE_TEXT
            return self.process(t)
        if k == "comment":
            self.insert_comment(t[1])
            return True
        if k == "doctype":
            return False
        if k == "start":
            name = t[1]
            if name == "caption":
                self.clear_stack_to_table_context()
                self.insert_marker()
                self.insert_elem(name, t[2])
                self.mode = IN_CAPTION
                return True
            if name == "colgroup":
                self.clear_stack_to_table_context()
                self.insert_elem(name, t[2])
                self.mode = IN_COLUMN_GROUP
                return True
            if name == "col":
                return self.process(("start", "colgroup", None, False)) and self.process(t)
            if name in ("tbody", "tfoot", "thead"):
                self.clear_stack_to_table_context()
                self.insert_elem(name, t[2])
                self.mode = IN_TABLE_BODY
                return True
            if name in ("td", "th", "tr"):
                return self.process(("start", "tbody", None, False)) and self.process(t)
            if name == "table":
                if self.process(("end", "table")):
                    return self.process(t)
                return True
            if name in ("style", "script"):
                return self.process(t, IN_HEAD)
            if name == "input":
                if not (t[2] and t[2].get("type", "").lower() == "hidden"):
                    return self._in_table_anything_else(t)
                self.insert_empty(name, t[2], t[3])
                return True
            if name == "form":
                if self.form_el is not None:
                    return False
                self.form_el = self.insert_empty(name, t[2], t[3])
                return True
            return self._in_table_anything_else(t)
        if k == "end":
            name = t[1]
            if name == "table":
                if not self.in_table_scope(name):
                    return False
                self.pop_to_close("table")
                self._reset_insertion_mode()
                return True
            if name in ("body", "caption", "col", "colgroup", "html", "tbody",
                        "td", "tfoot", "th", "thead", "tr"):
                return False
            return self._in_table_anything_else(t)
        if k == "eof":
            return True
        return self._in_table_anything_else(t)

    def _in_table_anything_else(self, t: tuple) -> bool:
        self.foster_inserts = True
        r = self.process(t, IN_BODY)
        self.foster_inserts = False
        return r

    def _in_table_text(self, t: tuple) -> bool:
        if t[0] in ("char", "cdata", "data"):
            self.pending_chars.append(t)
            return True
        # flush
        if self.pending_chars:
            joined = "".join(p[1] for p in self.pending_chars)
            if joined.strip(WS):
                # non-whitespace: foster-insert per InBody anything-else
                for p in self.pending_chars:
                    self.foster_inserts = True
                    self.process(p, IN_BODY)
                    self.foster_inserts = False
            else:
                for p in self.pending_chars:
                    self.insert_char(p[1])
            self.pending_chars = []
        self.mode = self.orig_mode
        return self.process(t)

    def _in_caption(self, t: tuple) -> bool:
        k = t[0]
        if k == "end" and t[1] == "caption":
            if not self.in_table_scope(t[1]):
                return False
            self.generate_implied_end_tags()
            self.pop_to_close("caption")
            self.clear_fmt_to_marker()
            self.mode = IN_TABLE
            return True
        if (k == "start" and t[1] in ("caption", "col", "colgroup", "tbody", "td",
                                      "tfoot", "th", "thead", "tr")) or (
                k == "end" and t[1] == "table"):
            if self.process(("end", "caption")):
                return self.process(t)
            return True
        if k == "end" and t[1] in ("body", "col", "colgroup", "html", "tbody",
                                   "td", "tfoot", "th", "thead", "tr"):
            return False
        return self.process(t, IN_BODY)

    def _in_column_group(self, t: tuple) -> bool:
        k = t[0]
        if k == "char" and not t[1].strip(WS):
            self.insert_char(t[1])
            return True
        if k == "comment":
            self.insert_comment(t[1])
            return True
        if k == "doctype":
            return True
        if k == "start" and t[1] == "html":
            return self.process(t, IN_BODY)
        if k == "start" and t[1] == "col":
            self.insert_empty(t[1], t[2], t[3])
            return True
        if k == "end" and t[1] == "colgroup":
            if self.current_name() == "html":
                return False
            self.pop()
            self.mode = IN_TABLE
            return True
        if k == "end" and t[1] == "col":
            return False
        if k == "eof":
            if self.current_name() == "html":
                return True
            # fallthrough
        if self.current_name() == "html":
            return False
        self.pop()
        self.mode = IN_TABLE
        return self.process(t)

    def _in_table_body(self, t: tuple) -> bool:
        k = t[0]
        if k == "start":
            name = t[1]
            if name == "tr":
                self.clear_stack_to_table_body_context()
                self.insert_elem(name, t[2])
                self.mode = IN_ROW
                return True
            if name in ("th", "td"):
                return self.process(("start", "tr", None, False)) and self.process(t)
            if name in ("caption", "col", "colgroup", "tbody", "tfoot", "thead"):
                return self._exit_table_body(t)
            return self.process(t, IN_TABLE)
        if k == "end":
            name = t[1]
            if name in ("tbody", "tfoot", "thead"):
                if not self.in_table_scope(name):
                    return False
                self.clear_stack_to_table_body_context()
                self.pop()
                self.mode = IN_TABLE
                return True
            if name == "table":
                return self._exit_table_body(t)
            if name in ("body", "caption", "col", "colgroup", "html", "td", "th", "tr"):
                return False
            return self.process(t, IN_TABLE)
        return self.process(t, IN_TABLE)

    def _exit_table_body(self, t: tuple) -> bool:
        if not (self.in_table_scope("tbody") or self.in_table_scope("thead")
                or self.in_table_scope("tfoot")):
            return False
        self.clear_stack_to_table_body_context()
        self.process(("end", self.current_name()))
        return self.process(t)

    def _in_row(self, t: tuple) -> bool:
        k = t[0]
        if k == "start":
            name = t[1]
            if name in ("th", "td"):
                self.clear_stack_to_table_row_context()
                self.insert_elem(name, t[2])
                self.mode = IN_CELL
                self.insert_marker()
                return True
            if name in ("caption", "col", "colgroup", "tbody", "tfoot", "thead", "tr"):
                return self._handle_missing_tr(t)
            return self.process(t, IN_TABLE)
        if k == "end":
            name = t[1]
            if name == "tr":
                if not self.in_table_scope(name):
                    return False
                self.clear_stack_to_table_row_context()
                self.pop()
                self.mode = IN_TABLE_BODY
                return True
            if name == "table":
                return self._handle_missing_tr(t)
            if name in ("tbody", "tfoot", "thead"):
                if not self.in_table_scope(name):
                    return False
                self.process(("end", "tr"))
                return self.process(t)
            if name in ("body", "caption", "col", "colgroup", "html", "td", "th"):
                return False
            return self.process(t, IN_TABLE)
        return self.process(t, IN_TABLE)

    def _handle_missing_tr(self, t: tuple) -> bool:
        if self.process(("end", "tr")):
            return self.process(t)
        return False

    def _in_cell(self, t: tuple) -> bool:
        k = t[0]
        if k == "end":
            name = t[1]
            if name in ("td", "th"):
                if not self.in_table_scope(name):
                    self.mode = IN_ROW
                    return False
                self.generate_implied_end_tags()
                self.pop_to_close(name)
                self.clear_fmt_to_marker()
                self.mode = IN_ROW
                return True
            if name in ("body", "caption", "col", "colgroup", "html"):
                return False
            if name in ("table", "tbody", "tfoot", "thead", "tr"):
                if not self.in_table_scope(name):
                    return False
                self._close_cell()
                return self.process(t)
            return self.process(t, IN_BODY)
        if k == "start" and t[1] in ("caption", "col", "colgroup", "tbody", "td",
                                     "tfoot", "th", "thead", "tr"):
            if not (self.in_table_scope("td") or self.in_table_scope("th")):
                return False
            self._close_cell()
            return self.process(t)
        return self.process(t, IN_BODY)

    def _close_cell(self) -> None:
        if self.in_table_scope("td"):
            self.process(("end", "td"))
        else:
            self.process(("end", "th"))

    def _in_select(self, t: tuple) -> bool:
        k = t[0]
        if k in ("char", "cdata"):
            if t[1] == "\x00":
                return False
            self.insert_char(t[1])
            return True
        if k == "comment":
            self.insert_comment(t[1])
            return True
        if k == "doctype":
            return False
        if k == "start":
            name = t[1]
            if name == "html":
                return self.process(t, IN_BODY)
            if name == "option":
                if self.current_name() == "option":
                    self.process(("end", "option"))
                self.insert_elem(name, t[2])
                return True
            if name == "optgroup":
                if self.current_name() == "option":
                    self.process(("end", "option"))
                if self.current_name() == "optgroup":
                    self.process(("end", "optgroup"))
                self.insert_elem(name, t[2])
                return True
            if name == "select":
                return self.process(("end", "select"))
            if name in ("input", "keygen", "textarea"):
                if not self.in_select_scope("select"):
                    return False
                self.process(("end", "select"))
                return self.process(t)
            if name == "script":
                return self.process(t, IN_HEAD)
            return False
        if k == "end":
            name = t[1]
            if name == "optgroup":
                if (self.current_name() == "option" and len(self.stack) >= 2
                        and self._name(self.stack[-2]) == "optgroup"):
                    self.process(("end", "option"))
                if self.current_name() == "optgroup":
                    self.pop()
                return True
            if name == "option":
                if self.current_name() == "option":
                    self.pop()
                return True
            if name == "select":
                if not self.in_select_scope(name):
                    return False
                self.pop_to_close(name)
                self._reset_insertion_mode()
                return True
            return False
        if k == "eof":
            return True
        return False

    def _in_select_in_table(self, t: tuple) -> bool:
        k = t[0]
        if k in ("start", "end") and t[1] in ("caption", "table", "tbody", "tfoot",
                                              "thead", "tr", "td", "th"):
            if k == "end" and not self.in_table_scope(t[1]):
                return False
            self.process(("end", "select"))
            return self.process(t)
        return self.process(t, IN_SELECT)

    def _after_body(self, t: tuple) -> bool:
        k = t[0]
        if k == "char" and not t[1].strip(WS):
            return self.process(t, IN_BODY)
        if k == "comment":
            # comment after body attaches to <html>
            c = self.arena.new_node(COMMENT, text=t[1])
            self.arena.append_child(self.stack[0] if self.stack else self.doc, c)
            return True
        if k == "doctype":
            return False
        if k == "start" and t[1] == "html":
            return self.process(t, IN_BODY)
        if k == "end" and t[1] == "html":
            self.mode = AFTER_AFTER_BODY
            return True
        if k == "eof":
            return True
        self.mode = IN_BODY
        return self.process(t)

    def _in_frameset(self, t: tuple) -> bool:
        k = t[0]
        if k == "char" and not t[1].strip(WS):
            self.insert_char(t[1])
            return True
        if k == "comment":
            self.insert_comment(t[1])
            return True
        if k == "doctype":
            return False
        if k == "start":
            name = t[1]
            if name == "html":
                return self.process(t, IN_BODY)
            if name == "frameset":
                self.insert_elem(name, t[2])
                return True
            if name == "frame":
                self.insert_empty(name, t[2], t[3])
                return True
            if name == "noframes":
                return self.process(t, IN_HEAD)
            return False
        if k == "end" and t[1] == "frameset":
            if self.current_name() == "html":
                return False
            self.pop()
            if not self.fragment and self.current_name() != "frameset":
                self.mode = AFTER_FRAMESET
            return True
        if k == "eof":
            return True
        return False

    def _after_frameset(self, t: tuple) -> bool:
        k = t[0]
        if k == "char" and not t[1].strip(WS):
            self.insert_char(t[1])
            return True
        if k == "comment":
            self.insert_comment(t[1])
            return True
        if k == "doctype":
            return False
        if k == "start" and t[1] == "html":
            return self.process(t, IN_BODY)
        if k == "end" and t[1] == "html":
            self.mode = AFTER_AFTER_FRAMESET
            return True
        if k == "start" and t[1] == "noframes":
            return self.process(t, IN_HEAD)
        if k == "eof":
            return True
        return False

    def _after_after_body(self, t: tuple) -> bool:
        k = t[0]
        if k == "comment":
            self.arena.append_child(self.doc, self.arena.new_node(COMMENT, text=t[1]))
            return True
        if k == "doctype" or (k == "char" and not t[1].strip(WS)) or (
                k == "start" and t[1] == "html"):
            return self.process(t, IN_BODY)
        if k == "eof":
            return True
        self.mode = IN_BODY
        return self.process(t)

    def _after_after_frameset(self, t: tuple) -> bool:
        k = t[0]
        if k == "comment":
            self.arena.append_child(self.doc, self.arena.new_node(COMMENT, text=t[1]))
            return True
        if k == "doctype" or (k == "char" and not t[1].strip(WS)) or (
                k == "start" and t[1] == "html"):
            return self.process(t, IN_BODY)
        if k == "eof":
            return True
        if k == "start" and t[1] == "noframes":
            return self.process(t, IN_HEAD)
        return False

    def _foreign(self, t: tuple) -> bool:  # minimal: treated as InBody
        return self.process(t, IN_BODY)


_MODES = {
    INITIAL: HtmlTreeBuilder._initial,
    BEFORE_HTML: HtmlTreeBuilder._before_html,
    BEFORE_HEAD: HtmlTreeBuilder._before_head,
    IN_HEAD: HtmlTreeBuilder._in_head,
    IN_HEAD_NOSCRIPT: HtmlTreeBuilder._in_head_noscript,
    AFTER_HEAD: HtmlTreeBuilder._after_head,
    IN_BODY: HtmlTreeBuilder._in_body,
    TEXT_MODE: HtmlTreeBuilder._text,
    IN_TABLE: HtmlTreeBuilder._in_table,
    IN_TABLE_TEXT: HtmlTreeBuilder._in_table_text,
    IN_CAPTION: HtmlTreeBuilder._in_caption,
    IN_COLUMN_GROUP: HtmlTreeBuilder._in_column_group,
    IN_TABLE_BODY: HtmlTreeBuilder._in_table_body,
    IN_ROW: HtmlTreeBuilder._in_row,
    IN_CELL: HtmlTreeBuilder._in_cell,
    IN_SELECT: HtmlTreeBuilder._in_select,
    IN_SELECT_IN_TABLE: HtmlTreeBuilder._in_select_in_table,
    AFTER_BODY: HtmlTreeBuilder._after_body,
    IN_FRAMESET: HtmlTreeBuilder._in_frameset,
    AFTER_FRAMESET: HtmlTreeBuilder._after_frameset,
    AFTER_AFTER_BODY: HtmlTreeBuilder._after_after_body,
    AFTER_AFTER_FRAMESET: HtmlTreeBuilder._after_after_frameset,
    FOREIGN: HtmlTreeBuilder._foreign,
}
