"""WHATWG HTML tokenizer (pull-based), tuned for batch throughput.

Re-expresses the reference's 67-state tokenizer
(/root/reference/Sources/TokeniserState.swift, Tokeniser.swift) as a
compact scanner over a decoded Python ``str``: the Data state advances with
C-speed ``str.find`` (the memchr analogue of CharacterReader.swift's SIMD
scans), entering per-character logic only inside tags. Character references
decode via :mod:`swiftsoup_spark.kernel.entities`.

Tokens are plain tuples (cheap to allocate, no classes):
  ('char', text)                    decoded text run
  ('cdata', text)                   CDATA section content (kept raw)
  ('data', text)                    RAWTEXT/script run (no entity decode)
  ('start', name, attrs|None, self_closing)
  ('end', name)
  ('comment', data)
  ('doctype', name, public_id, system_id, force_quirks)
  ('eof',)

The tree builder flips the tokenizer into RCDATA / RAWTEXT / script-data /
PLAINTEXT via :meth:`Tokeniser.enter_raw` — the same handoff the reference
does in HtmlTreeBuilderState (rcdata/rawtext transitions).
"""

from __future__ import annotations

import re

from swiftsoup_spark.kernel.entities import unescape

_TAGNAME_RE = re.compile(r"[a-zA-Z][^\t\n\f\r />]*")
_ATTRNAME_RE = re.compile(r"[^\t\n\f\r />=][^\t\n\f\r />=]*")
_WS_RE = re.compile(r"[\t\n\f\r ]*")
_UNQUOTED_VAL_RE = re.compile(r"[^\t\n\f\r >]*")
_DOCTYPE_RE = re.compile(r"doctype", re.IGNORECASE)
_SCRIPT_EVENT_RE = re.compile(r"<!--|-->|</script(?=[\t\n\f\r />]|$)|<script(?=[\t\n\f\r />]|$)", re.IGNORECASE)

EOF_TOK = ("eof",)


class ParseSettings:
    """Tag/attribute case handling (reference ParseSettings.swift:1-123).

    HTML default lowercases both; ``preserve_case`` keeps the source
    case. Like the reference, the preserved (display) name rides along
    with the normalized name: tree-builder dispatch and selectors always
    use the normalized form, serialization uses the display form."""

    __slots__ = ("preserve_tag_case", "preserve_attr_case")

    def __init__(self, preserve_tag_case: bool = False,
                 preserve_attr_case: bool = False) -> None:
        self.preserve_tag_case = preserve_tag_case
        self.preserve_attr_case = preserve_attr_case


HTML_DEFAULT = ParseSettings(False, False)
PRESERVE_CASE = ParseSettings(True, True)


class Tokeniser:
    __slots__ = ("s", "pos", "n", "_pending", "_raw_mode", "_raw_tag", "errors",
                 "tok_start", "tok_end", "error_list", "settings")

    def __init__(self, s: str, error_list=None,
                 settings: ParseSettings | None = None) -> None:
        if "\x00" in s:
            s = s.replace("\x00", "�")  # reference Tokeniser.swift:11
        self.s = s
        self.n = len(s)
        self.pos = 0
        self._pending: list[tuple] = []
        self._raw_mode: str | None = None  # rcdata|rawtext|script|plaintext
        self._raw_tag = ""
        self.errors = 0
        self.error_list = error_list  # optional bounded ParseErrorList
        self.settings = settings if settings is not None else HTML_DEFAULT
        self.tok_start = 0  # source span of the token last returned by read()
        self.tok_end = 0

    # -- tree-builder handoff -------------------------------------------------
    def enter_raw(self, mode: str, tag: str) -> None:
        self._raw_mode = mode
        self._raw_tag = tag

    # -- main pump -------------------------------------------------------------
    def read(self) -> tuple:
        self.tok_start = self.pos
        if self._pending:
            self.tok_end = self.pos
            return self._pending.pop(0)
        if self._raw_mode is not None:
            t = self._read_raw()
            self.tok_end = self.pos
            return t
        t = self._data()
        self.tok_end = self.pos
        return t

    def _data(self) -> tuple:
        s, n = self.s, self.n
        pos = self.pos
        start = pos
        while True:
            lt = s.find("<", pos)
            if lt < 0:
                self.pos = n
                if start < n:
                    return ("char", self._decode(s[start:n]))
                return EOF_TOK
            nxt = s[lt + 1] if lt + 1 < n else ""
            if nxt and nxt.isascii() and (nxt.isalpha() or nxt in "!/?"):
                if lt > start:
                    self.pos = lt
                    return ("char", self._decode(s[start:lt]))
                self.pos = lt
                tok = self._tag_open()
                if tok is not None:
                    return tok
                # '</>' was skipped entirely; continue scanning
                pos = start = self.pos
                continue
            pos = lt + 1  # literal '<'

    def _decode(self, run: str) -> str:
        return unescape(run) if "&" in run else run

    # -- raw content states (RCDATA/RAWTEXT/script/plaintext) ------------------
    def _read_raw(self) -> tuple:
        s, n = self.s, self.n
        mode, tag = self._raw_mode, self._raw_tag
        self._raw_mode = None
        i = self.pos
        if mode == "plaintext":
            self.pos = n
            return ("data", s[i:]) if i < n else EOF_TOK
        if mode == "script":
            end, close = self._script_end(i)
        else:
            end, close = self._find_close(i, tag)
            if close < 0 and mode == "rcdata":
                # reference deviation (TokeniserState RcdataLessthanSign):
                # '<'+alpha with no appropriate end tag ahead breaks out of
                # RCDATA, synthesizing the end tag
                bj = self._find_breakout(i)
                if bj >= 0:
                    text = s[i:bj]
                    self.pos = bj
                    self._pending.append(("end", tag))
                    if text:
                        return ("char", self._decode(text))
                    return self._pending.pop(0)
        text = s[i:end]
        if close >= 0:
            # consume the whole `</tag ...>` end tag
            m = _TAGNAME_RE.match(s, close + 2)
            j = m.end() if m else close + 2
            _, _, j, eof = self._attrs(j)
            self.pos = self.n if eof else j
            self._pending.append(("end", tag))
        else:
            self.pos = n
        if text:
            if mode == "rcdata":
                return ("char", self._decode(text))
            return ("data", text)
        return self._pending.pop(0) if self._pending else EOF_TOK

    def _find_breakout(self, i: int) -> int:
        s, n = self.s, self.n
        j = i
        while True:
            j = s.find("<", j)
            if j < 0 or j + 1 >= n:
                return -1
            c = s[j + 1]
            if c.isascii() and c.isalpha():
                return j
            j += 1

    def _find_close(self, i: int, tag: str) -> tuple[int, int]:
        """Find `</tag` (case-insensitive, followed by ws / '/' '>' or EOF).
        Returns (content_end, close_pos or -1)."""
        s, n = self.s, self.n
        needle = "</" + tag
        pos = i
        while True:
            k = _find_ci(s, needle, pos)
            if k < 0:
                return n, -1
            after = k + len(needle)
            if after >= n or s[after] in "\t\n\f\r />":
                return k, k
            pos = k + 1

    def _script_end(self, i: int) -> tuple[int, int]:
        """Script-data escaped/double-escaped scanning
        (reference TokeniserState ScriptData* states)."""
        s = self.s
        state = 0  # 0 plain, 1 escaped, 2 double-escaped
        pos = i
        while True:
            m = _SCRIPT_EVENT_RE.search(s, pos)
            if m is None:
                return self.n, -1
            t = m.group(0)
            if t == "<!--":
                if state == 0:
                    state = 1
            elif t == "-->":
                if state in (1, 2):
                    state = 0
            elif t[1] == "/":  # </script
                if state in (0, 1):
                    return m.start(), m.start()
                state = 1  # double-escaped: drop back to escaped
            else:  # <script inside escaped
                if state == 1:
                    state = 2
            pos = m.end()

    # -- tag states --------------------------------------------------------------
    def _tag_open(self) -> tuple | None:
        s, n = self.s, self.n
        i = self.pos + 1
        c = s[i]
        if c == "!":
            return self._markup_decl(i + 1)
        if c == "/":
            return self._end_tag(i + 1)
        if c == "?":
            return self._bogus_comment(i)
        m = _TAGNAME_RE.match(s, i)
        raw = m.group(0)
        name = raw if raw.islower() else raw.lower()
        attrs, self_closing, j, eof = self._attrs(m.end())
        if eof:
            self.pos = n
            return EOF_TOK  # unterminated tag at EOF is dropped
        self.pos = j
        if self.settings.preserve_tag_case and raw != name:
            return ("start", name, attrs, self_closing, raw)
        return ("start", name, attrs, self_closing)

    def _end_tag(self, i: int) -> tuple | None:
        s, n = self.s, self.n
        if i >= n:
            self.pos = n
            return ("char", "</")
        c = s[i]
        if c == ">":
            self.pos = i + 1
            return None  # '</>' ignored
        if not (c.isascii() and c.isalpha()):
            return self._bogus_comment(i)
        m = _TAGNAME_RE.match(s, i)
        raw = m.group(0)
        name = raw if raw.islower() else raw.lower()
        _, _, j, eof = self._attrs(m.end())
        if eof:
            self.pos = n
            return EOF_TOK
        self.pos = j
        if self.settings.preserve_tag_case and raw != name:
            return ("end", name, raw)
        return ("end", name)

    def _attrs(self, j: int) -> tuple[dict | None, bool, int, bool]:
        """Parse attributes from position j to past '>'.
        Returns (attrs|None, self_closing, next_pos, eof)."""
        s, n = self.s, self.n
        attrs: dict[str, str] | None = None
        self_closing = False
        while True:
            if j < n and s[j] in "\t\n\f\r ":
                j = _WS_RE.match(s, j).end()
            if j >= n:
                return attrs, self_closing, j, True
            c = s[j]
            if c == ">":
                return attrs, self_closing, j + 1, False
            if c == "/":
                if j + 1 < n and s[j + 1] == ">":
                    return attrs, True, j + 2, False
                j += 1
                continue
            # attribute name (a leading '=' is legal-with-error and joins the name)
            if c == "=":
                m = _ATTRNAME_RE.match(s, j + 1)
                name = "=" + (m.group(0) if m else "")
                j = m.end() if m else j + 1
            else:
                m = _ATTRNAME_RE.match(s, j)
                name = m.group(0)
                j = m.end()
            if not name.islower() and not self.settings.preserve_attr_case:
                name = name.lower()
            if j < n and s[j] in "\t\n\f\r ":
                j = _WS_RE.match(s, j).end()
            val: str | None = None  # valueless attr (serializes bare)
            if j < n and s[j] == "=":
                val = ""
                j = _WS_RE.match(s, j + 1).end()
                if j >= n:
                    return attrs, self_closing, j, True
                q = s[j]
                if q == '"' or q == "'":
                    k = s.find(q, j + 1)
                    if k < 0:
                        return attrs, self_closing, n, True
                    val = s[j + 1 : k]
                    j = k + 1
                else:
                    m = _UNQUOTED_VAL_RE.match(s, j)
                    val = m.group(0)
                    j = m.end()
                if val and "&" in val:
                    val = unescape(val, in_attribute=True)
            if attrs is None:
                attrs = {name: val}
            elif name not in attrs:  # first declaration wins
                attrs[name] = val
            else:
                self.errors += 1
                if self.error_list is not None:
                    self.error_list.add(j, f"Duplicate attribute {name!r}")

    # -- markup declarations -------------------------------------------------
    def _markup_decl(self, i: int) -> tuple:
        s, n = self.s, self.n
        if s.startswith("--", i):
            return self._comment(i + 2)
        if _DOCTYPE_RE.match(s, i):
            return self._doctype(i + 7)
        if s.startswith("[CDATA[", i):
            k = s.find("]]>", i + 7)
            if k < 0:
                self.pos = n
                return ("cdata", s[i + 7 :])
            self.pos = k + 3
            return ("cdata", s[i + 7 : k])
        return self._bogus_comment(i)

    def _comment(self, i: int) -> tuple:
        s, n = self.s, self.n
        if s.startswith(">", i):
            self.pos = i + 1
            return ("comment", "")
        if s.startswith("->", i):
            self.pos = i + 2
            return ("comment", "")
        p1 = s.find("-->", i)
        p2 = s.find("--!>", i)
        if p2 >= 0 and (p1 < 0 or p2 < p1):
            self.pos = p2 + 4
            data = s[i:p2]
        elif p1 >= 0:
            self.pos = p1 + 3
            data = s[i:p1]
        else:
            self.pos = n
            data = s[i:]
            if data.endswith("--!"):
                data = data[:-3]
        if data.startswith("-") and not data.startswith("--"):
            # comment-start-dash consumes one leading dash (jsoup-style)
            data = data[1:]
        return ("comment", data)

    def _bogus_comment(self, i: int) -> tuple:
        s, n = self.s, self.n
        k = s.find(">", i)
        if k < 0:
            self.pos = n
            return ("comment", s[i:])
        self.pos = k + 1
        return ("comment", s[i:k])

    def _doctype(self, i: int) -> tuple:
        s, n = self.s, self.n
        j = _WS_RE.match(s, i).end()
        name = ""
        public_id = None
        system_id = None
        force_quirks = False
        if j >= n:
            self.pos = n
            return ("doctype", "", None, None, True)
        if s[j] == ">":
            self.pos = j + 1
            return ("doctype", "", None, None, True)
        m = re.compile(r"[^\t\n\f\r >]+").match(s, j)
        name = m.group(0).lower()
        j = m.end()
        j = _WS_RE.match(s, j).end()
        if j < n and s[j] != ">":
            kw = s[j : j + 6].lower()
            j2 = j + 6

            def quoted(j: int) -> tuple[str | None, int]:
                j = _WS_RE.match(s, j).end()
                if j < n and s[j] in "\"'":
                    q = s[j]
                    k = s.find(q, j + 1)
                    if k < 0:
                        return s[j + 1 :], n
                    return s[j + 1 : k], k + 1
                return None, j

            if kw == "public":
                public_id, j2 = quoted(j2)
                system_id, j2 = quoted(j2)
                if public_id is None:
                    force_quirks = True
                j = j2
            elif kw == "system":
                system_id, j2 = quoted(j2)
                if system_id is None:
                    force_quirks = True
                j = j2
            else:
                force_quirks = True
        k = s.find(">", j)
        if k < 0:
            self.pos = n
            force_quirks = True
        else:
            self.pos = k + 1
        return ("doctype", name, public_id, system_id, force_quirks)


_CI_CACHE: dict[str, re.Pattern] = {}


def _find_ci(s: str, needle: str, start: int) -> int:
    """Case-insensitive find (compiled-pattern cache keyed by needle)."""
    pat = _CI_CACHE.get(needle)
    if pat is None:
        pat = _CI_CACHE[needle] = re.compile(re.escape(needle), re.IGNORECASE)
    m = pat.search(s, start)
    return m.start() if m else -1
