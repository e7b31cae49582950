"""CSS selector → evaluator-tree compiler.

Reimplements the reference's QueryParser/TokenQueue grammar
(/root/reference/Sources/QueryParser.swift:50-161, TokenQueue.swift):
combinators ``, > + ~ <space>`` with OR precedence, attribute ops
``= != ^= $= *= ~=``, the full pseudo set (:lt :gt :eq :has :not
:contains :containsOwn :containsData :matches :matchesOwn :nth-* :first-*
:last-* :only-* :empty :root), and ``ns|tag`` / ``*|tag`` tags.

Compilation happens once (driver-side in the Spark pipeline) and the
resulting tree is broadcast; evaluation is vectorized in
:mod:`swiftsoup_spark.select.engine`.
"""

from __future__ import annotations

import re
from functools import lru_cache

from swiftsoup_spark.select import evaluators as E

_COMBINATORS = ">+~ "
_NTH_RE = re.compile(
    r"^((\+|-)?(\d+)?)n(\s*(\+|-)?\s*\d+)?$|^(odd|even)$|^(\+|-)?(\d+)$",
    re.IGNORECASE)


class QueryError(ValueError):
    pass


class _TQ:
    """TokenQueue-alike over the selector string."""

    def __init__(self, s: str) -> None:
        self.s = s
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.s)

    def peek(self) -> str:
        return self.s[self.pos] if self.pos < len(self.s) else ""

    def consume_ws(self) -> bool:
        seen = False
        while not self.eof() and self.s[self.pos] in " \t\n\r\f":
            self.pos += 1
            seen = True
        return seen

    def match_chomp(self, c: str) -> bool:
        if self.s.startswith(c, self.pos):
            self.pos += len(c)
            return True
        return False

    def matches_any(self, chars: str) -> bool:
        return not self.eof() and self.s[self.pos] in chars

    def consume(self) -> str:
        c = self.s[self.pos]
        self.pos += 1
        return c

    def chomp_balanced(self, open_c: str, close_c: str) -> str:
        """reference TokenQueue.chompBalanced: consume '(' ... ')' content
        honoring nesting and quotes."""
        start = -1
        end = -1
        depth = 0
        in_q: str | None = None
        i = self.pos
        s = self.s
        while i < len(s):
            c = s[i]
            if c == "\\" and i + 1 < len(s):
                i += 2  # escaped char never affects balance
                continue
            if in_q:
                if c == in_q:
                    in_q = None
            elif c in "\"'":
                in_q = c
            elif c == open_c:
                depth += 1
                if depth == 1:
                    start = i + 1
            elif c == close_c:
                depth -= 1
                if depth == 0:
                    end = i
                    break
            i += 1
        if end < 0:
            if start < 0:
                raise QueryError(f"unbalanced {open_c}{close_c} in query")
            # tolerate missing close at EOF (reference TokenQueue behavior:
            # 'div:has([class]' parses)
            self.pos = len(s)
            return s[start:]
        self.pos = end + 1
        return s[start:end]

    def consume_ident(self) -> str:
        # element-name identifiers: anything up to a combinator/selector
        # delimiter (letters digits - _ | * and escapes)
        m = re.match(r"[^\s>+~,()\[\]#.:]+", self.s[self.pos:])
        if not m:
            raise QueryError(f"expected identifier at {self.s[self.pos:]}")
        self.pos += m.end()
        return m.group(0)

    def consume_css_ident(self) -> str:
        m = re.match(r"[a-zA-Z0-9_\-\\]+", self.s[self.pos:])
        if not m:
            raise QueryError(f"expected identifier at {self.s[self.pos:]!r} in {self.s!r}")
        self.pos += m.end()
        return m.group(0).replace("\\", "")


@lru_cache(maxsize=512)
def parse_query(css: str):
    """Compile a selector. LRU-cached (reference QueryParserCache)."""
    css = css.strip()
    if not css:
        raise QueryError("empty selector")
    tq = _TQ(css)
    return _parse_or(tq)


def _parse_or(tq: _TQ):
    evals = [_parse_sequence(tq)]
    while not tq.eof():
        tq.consume_ws()
        if tq.match_chomp(","):
            tq.consume_ws()
            evals.append(_parse_sequence(tq))
        else:
            break
    if len(evals) == 1:
        return evals[0]
    return E.Or(evals)


def _parse_sequence(tq: _TQ):
    tq.consume_ws()
    # leading combinator: '> p' is relative to root (reference allows it)
    if tq.matches_any(">+~"):
        comb = tq.consume()
        tq.consume_ws()
        right = _parse_simple_group(tq)
        cur = _combine(comb, E.MatchesRoot(), right)
    else:
        cur = _parse_simple_group(tq)
    while not tq.eof():
        ws = tq.consume_ws()
        if tq.eof() or tq.peek() == ",":
            break
        if tq.matches_any(">+~"):
            comb = tq.consume()
            tq.consume_ws()
            right = _parse_simple_group(tq)
            cur = _combine(comb, cur, right)
        elif ws:
            right = _parse_simple_group(tq)
            cur = _combine(" ", cur, right)
        else:
            # juxtaposed simple selector (shouldn't occur; group handles)
            right = _parse_simple_group(tq)
            cur = E.And([cur, right])
    return cur


def _combine(comb: str, left, right):
    if comb == ">":
        return E.And([right, E.ImmediateParent(left)])
    if comb == " ":
        return E.And([right, E.Ancestor(left)])
    if comb == "+":
        return E.And([right, E.ImmediatePreviousSibling(left)])
    if comb == "~":
        return E.And([right, E.PreviousSibling(left)])
    raise QueryError(f"unknown combinator {comb!r}")


def _parse_simple_group(tq: _TQ):
    evals = []
    while not tq.eof():
        c = tq.peek()
        if c == "#":
            tq.consume()
            evals.append(E.Id(tq.consume_css_ident()))
        elif c == ".":
            tq.consume()
            evals.append(E.Class(tq.consume_css_ident().lower()))
        elif c == "[":
            evals.append(_parse_attribute(tq.chomp_balanced("[", "]")))
        elif c == ":":
            tq.consume()
            evals.append(_parse_pseudo(tq))
        elif c == "*":
            tq.consume()
            if tq.match_chomp("|"):
                name = tq.consume_css_ident().lower()
                evals.append(E.Or([E.Tag(name), E.TagEndsWith(":" + name)]))
            else:
                evals.append(E.AllElements())
        elif re.match(r"[a-zA-Z_]", c):
            name = tq.consume_ident().lower()
            if "|" in name:
                ns, _, tag = name.partition("|")
                name = ns + ":" + tag
            evals.append(E.Tag(name))
        else:
            break
    if not evals:
        raise QueryError(f"could not parse query at {tq.s[tq.pos:]!r}")
    if len(evals) == 1:
        return evals[0]
    return E.And(evals)


def _parse_attribute(content: str):
    content = content.strip()
    if not content:
        raise QueryError("empty attribute selector")
    if content.startswith("^"):
        return E.AttributeStarting(content[1:].strip().lower())
    m = re.match(r"^\s*([^\s!=^$*~]+)\s*(=|!=|\^=|\$=|\*=|~=)\s*(.*)$", content)
    if not m:
        return E.Attribute(content.strip().lower())
    key = m.group(1).strip().lower()
    op = m.group(2)
    val = m.group(3).strip()
    if len(val) >= 2 and val[0] == val[-1] and val[0] in "\"'":
        # reference AttributeKeyPair (Evaluator.swift:448-457): the value
        # is unquoted FIRST and trimmed AFTER, so [class="value "] equals
        # [class=value] (the quoted trailing space is not significant)
        val = val[1:-1].strip()
    if op == "=":
        return E.AttributeWithValue(key, val)
    if op == "!=":
        return E.AttributeWithValueNot(key, val)
    if op == "^=":
        return E.AttributeWithValueStarting(key, val)
    if op == "$=":
        return E.AttributeWithValueEnding(key, val)
    if op == "*=":
        return E.AttributeWithValueContaining(key, val)
    if op == "~=":
        return E.AttributeWithValueMatching(key, val)
    raise QueryError(f"bad attribute op {op}")


def _nth(arg: str) -> tuple[int, int]:
    arg = arg.strip().lower()
    m = _NTH_RE.match(arg)
    if not m:
        raise QueryError(f"could not parse nth-index {arg!r}")
    if m.group(6):  # odd/even
        return (2, 1) if m.group(6) == "odd" else (2, 0)
    if m.group(8) is not None and m.group(4) is None and "n" not in arg:
        b = int(m.group(8))
        if m.group(7) == "-":
            b = -b
        return (0, b)
    a_txt = (m.group(1) or "").replace("+", "")
    a = int(a_txt) if a_txt not in ("", "-") else (-1 if a_txt == "-" else 1)
    b_txt = (m.group(4) or "").replace(" ", "").replace("+", "")
    b = int(b_txt) if b_txt else 0
    return (a, b)


def _unescape_arg(s: str) -> str:
    """reference TokenQueue.unescape: a backslash escapes ANY char."""
    if "\\" not in s:
        return s
    out = []
    it = iter(range(len(s)))
    skip = False
    for i, c in enumerate(s):
        if skip:
            skip = False
            out.append(c)
            continue
        if c == "\\" and i + 1 < len(s):
            skip = True
            continue
        out.append(c)
    return "".join(out)


def _parse_pseudo(tq: _TQ):
    name = tq.consume_css_ident().lower()
    if name in ("lt", "gt", "eq"):
        arg = int(tq.chomp_balanced("(", ")").strip())
        return {"lt": E.IndexLessThan, "gt": E.IndexGreaterThan,
                "eq": E.IndexEquals}[name](arg)
    if name == "has":
        sub = _TQ(tq.chomp_balanced("(", ")"))
        sub.consume_ws()
        if sub.matches_any(">+~"):
            comb = sub.consume()
            inner = _parse_or(sub)
            if comb == ">":
                return E.HasChild(inner)
            if comb == "+":
                return E.HasImmediateFollowingSibling(inner)
            return E.HasFollowingSibling(inner)
        return E.Has(_parse_or(sub))
    if name == "not":
        return E.Not(_parse_or(_TQ(tq.chomp_balanced("(", ")"))))
    if name == "contains":
        return E.ContainsText(_unescape_arg(tq.chomp_balanced("(", ")")).lower())
    if name == "containsown":
        return E.ContainsOwnText(_unescape_arg(tq.chomp_balanced("(", ")")).lower())
    if name == "containsdata":
        return E.ContainsData(_unescape_arg(tq.chomp_balanced("(", ")")).lower())
    if name == "matches":
        return E.MatchesRegex(tq.chomp_balanced("(", ")"))
    if name == "matchesown":
        return E.MatchesOwnRegex(tq.chomp_balanced("(", ")"))
    if name == "nth-child":
        a, b = _nth(tq.chomp_balanced("(", ")"))
        return E.IsNthChild(a, b)
    if name == "nth-last-child":
        a, b = _nth(tq.chomp_balanced("(", ")"))
        return E.IsNthLastChild(a, b)
    if name == "nth-of-type":
        a, b = _nth(tq.chomp_balanced("(", ")"))
        return E.IsNthOfType(a, b)
    if name == "nth-last-of-type":
        a, b = _nth(tq.chomp_balanced("(", ")"))
        return E.IsNthLastOfType(a, b)
    if name == "first-child":
        return E.IsFirstChild()
    if name == "last-child":
        return E.IsLastChild()
    if name == "first-of-type":
        return E.IsFirstOfType()
    if name == "last-of-type":
        return E.IsLastOfType()
    if name == "only-child":
        return E.IsOnlyChild()
    if name == "only-of-type":
        return E.IsOnlyOfType()
    if name == "empty":
        return E.IsEmpty()
    if name == "root":
        return E.IsRoot()
    raise QueryError(f"unknown pseudo :{name}")
