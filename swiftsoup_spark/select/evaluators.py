"""Vectorized selector evaluators over arena columns.

Each evaluator (reference Evaluator.swift:51-917,
StructuralEvaluator.swift) computes a numpy boolean mask over ALL nodes of
a document subtree in one shot — the per-element recursion of the
reference's Collector becomes column algebra: tag compares are int
equality on the ``tag`` column, ``:has``/descendant combinators are
parent-pointer propagation passes, and document order falls out of the
arena DFS order (reference Collector.swift:26-138 bulk tricks)."""

from __future__ import annotations

import re

import numpy as np

from swiftsoup_spark.kernel.arena import (
    CDATA, COMMENT, DATA, DOCTYPE, DOCUMENT, ELEMENT, TEXT, XMLDECL)
from swiftsoup_spark.select import icu


class Ctx:
    """Evaluation context: one document subtree as numpy columns."""

    def __init__(self, arena, root: int) -> None:
        self.arena = arena
        self.root = root
        n = len(arena.parent)
        self.n = n
        cols = arena.np_cols
        if cols is not None and root == 0:
            # C-builder fast init: order/parent/ntype/tag arrive as
            # ready numpy views — no per-node Python walk or re-boxing
            order_arr, self.parent, self.ntype, self.tag = cols
            self.order_arr = order_arr
            self.order = order_arr.tolist()
            if len(order_arr) == n:
                in_sub = np.ones(n, dtype=bool)   # no orphaned nodes
            else:
                in_sub = np.zeros(n, dtype=bool)
                in_sub[order_arr] = True
            self.in_sub = in_sub
            self.is_elem = in_sub & ((self.ntype == ELEMENT)
                                     | (self.ntype == DOCUMENT))
            self._cache = {}
            return
        order = [root] + arena.descendants(root)
        self.order = order
        self.order_arr = None
        in_sub = np.zeros(n, dtype=bool)
        in_sub[order] = True
        self.in_sub = in_sub
        self.ntype = np.asarray(arena.ntype, dtype=np.int8)
        self.tag = np.asarray(arena.tag, dtype=np.int32)
        self.parent = np.asarray(arena.parent, dtype=np.int64)
        # reference parity: the Document node IS an element candidate
        # (tag '#root') for untagged evaluators (Element.swift:276)
        self.is_elem = in_sub & ((self.ntype == ELEMENT)
                                 | (self.ntype == DOCUMENT))
        self._cache: dict = {}

    # --- propagation passes ---------------------------------------------------
    def ancestor_any(self, inner: np.ndarray) -> np.ndarray:
        """out[nid] = some ancestor (within subtree, excluding nid) matches."""
        out = np.zeros(self.n, dtype=bool)
        parent = self.parent
        for nid in self.order[1:]:
            p = parent[nid]
            out[nid] = inner[p] or out[p]
        return out

    def descendant_any(self, inner: np.ndarray) -> np.ndarray:
        """out[nid] = some strict descendant matches."""
        out = np.zeros(self.n, dtype=bool)
        parent = self.parent
        for nid in reversed(self.order[1:]):
            p = parent[nid]
            if inner[nid] or out[nid]:
                out[p] = True
        return out

    # --- cached per-element derived columns ------------------------------------
    def _get(self, key, fn):
        v = self._cache.get(key)
        if v is None:
            v = fn()
            self._cache[key] = v
        return v

    def sib_index(self) -> np.ndarray:
        """0-based index among element siblings (elementSiblingIndex)."""
        def build():
            idx = np.zeros(self.n, dtype=np.int32)
            a = self.arena
            for nid in self.order:
                k = 0
                for c in a.children[nid]:
                    if a.ntype[c] == ELEMENT:
                        idx[c] = k
                        k += 1
            return idx
        return self._get("sib_index", build)

    def sib_count(self) -> np.ndarray:
        """number of element siblings (including self)."""
        def build():
            cnt = np.zeros(self.n, dtype=np.int32)
            a = self.arena
            for nid in self.order:
                elems = [c for c in a.children[nid] if a.ntype[c] == ELEMENT]
                for c in elems:
                    cnt[c] = len(elems)
            # root of the select context: treat as only sibling
            cnt[self.root] = max(cnt[self.root], 1)
            return cnt
        return self._get("sib_count", build)

    def of_type_index(self) -> tuple[np.ndarray, np.ndarray]:
        """(index among same-tag element siblings, count of same-tag siblings)."""
        def build():
            idx = np.zeros(self.n, dtype=np.int32)
            cnt = np.zeros(self.n, dtype=np.int32)
            a = self.arena
            for nid in self.order:
                seen: dict[int, list[int]] = {}
                for c in a.children[nid]:
                    if a.ntype[c] == ELEMENT:
                        seen.setdefault(a.tag[c], []).append(c)
                for tid, nodes in seen.items():
                    for i, c in enumerate(nodes):
                        idx[c] = i
                        cnt[c] = len(nodes)
            return idx, cnt
        return self._get("of_type", build)

    def prev_elem_sibling(self) -> np.ndarray:
        """node id of immediately-previous element sibling, or -1."""
        def build():
            prev = np.full(self.n, -1, dtype=np.int64)
            a = self.arena
            for nid in self.order:
                last = -1
                for c in a.children[nid]:
                    if a.ntype[c] == ELEMENT:
                        prev[c] = last
                        last = c
            return prev
        return self._get("prev_sib", build)

    def attr_vals(self, key: str) -> list:
        ck = ("attr", key)
        v = self._cache.get(ck)
        if v is None:
            attrs = self.arena.attrs
            v = [None] * self.n
            for nid in self.order:
                a = attrs[nid]
                if a is not None and key in a:
                    v[nid] = a[key] or ""
            self._cache[ck] = v
        return v

    def texts(self) -> list:
        def build():
            a = self.arena
            out = [None] * self.n
            for nid in self.order:
                if self.is_elem[nid]:
                    out[nid] = a.node_text(nid).lower()
            return out
        return self._get("texts", build)

    def own_texts(self) -> list:
        def build():
            a = self.arena
            out = [None] * self.n
            for nid in self.order:
                if self.is_elem[nid]:
                    out[nid] = a.own_text(nid).lower()
            return out
        return self._get("own_texts", build)

    def datas(self) -> list:
        def build():
            a = self.arena
            out = [None] * self.n
            for nid in self.order:
                if self.is_elem[nid]:
                    out[nid] = a.node_data(nid).lower()
            return out
        return self._get("datas", build)


class Evaluator:
    def mask(self, ctx: Ctx) -> np.ndarray:  # pragma: no cover - abstract
        raise NotImplementedError


class And(Evaluator):
    def __init__(self, evals: list) -> None:
        self.evals = evals

    def mask(self, ctx: Ctx) -> np.ndarray:
        m = self.evals[0].mask(ctx)
        for e in self.evals[1:]:
            m = m & e.mask(ctx)
        return m


class Or(Evaluator):
    def __init__(self, evals: list) -> None:
        self.evals = evals

    def mask(self, ctx: Ctx) -> np.ndarray:
        m = self.evals[0].mask(ctx)
        for e in self.evals[1:]:
            m = m | e.mask(ctx)
        return m


class AllElements(Evaluator):
    def mask(self, ctx: Ctx) -> np.ndarray:
        return ctx.is_elem.copy()


class Tag(Evaluator):
    def __init__(self, name: str) -> None:
        self.name = name

    def mask(self, ctx: Ctx) -> np.ndarray:
        tid = ctx.arena.tags.name_to_id.get(self.name)
        if tid is None:
            return np.zeros(ctx.n, dtype=bool)
        return ctx.is_elem & (ctx.tag == tid)


class TagEndsWith(Evaluator):
    def __init__(self, suffix: str) -> None:
        self.suffix = suffix

    def mask(self, ctx: Ctx) -> np.ndarray:
        names = ctx.arena.tags.names
        tids = np.array([i for i, nm in enumerate(names) if nm.endswith(self.suffix)],
                        dtype=np.int32)
        if len(tids) == 0:
            return np.zeros(ctx.n, dtype=bool)
        return ctx.is_elem & np.isin(ctx.tag, tids)


class Id(Evaluator):
    def __init__(self, idv: str) -> None:
        self.id = idv

    def mask(self, ctx: Ctx) -> np.ndarray:
        # single pass over doc order, no intermediate column: ids are
        # sparse, so direct set-bits beat a full fromiter compare
        m = np.zeros(ctx.n, dtype=bool)
        attrs = ctx.arena.attrs
        idv = self.id
        for nid in ctx.order:
            a = attrs[nid]
            if a is not None and a.get("id") == idv:
                m[nid] = True
        return ctx.is_elem & m


class Class(Evaluator):
    def __init__(self, cls: str) -> None:
        self.cls = cls  # lowercase

    def mask(self, ctx: Ctx) -> np.ndarray:
        m = np.zeros(ctx.n, dtype=bool)
        attrs = ctx.arena.attrs
        c = self.cls
        for nid in ctx.order:
            a = attrs[nid]
            if a is not None:
                v = a.get("class")
                if v is not None and c in v.lower().split():
                    m[nid] = True
        return ctx.is_elem & m


class Attribute(Evaluator):
    def __init__(self, key: str) -> None:
        self.key = key

    def mask(self, ctx: Ctx) -> np.ndarray:
        vals = ctx.attr_vals(self.key)
        m = np.fromiter((v is not None for v in vals), dtype=bool, count=ctx.n)
        return ctx.is_elem & m


class AttributeStarting(Evaluator):
    def __init__(self, prefix: str) -> None:
        self.prefix = prefix

    def mask(self, ctx: Ctx) -> np.ndarray:
        attrs = ctx.arena.attrs
        p = self.prefix
        m = np.zeros(ctx.n, dtype=bool)
        for nid in ctx.order:
            a = attrs[nid]
            if a and any(k.startswith(p) for k in a):
                m[nid] = True
        return ctx.is_elem & m


class _AttrVal(Evaluator):
    def __init__(self, key: str, value: str) -> None:
        self.key = key
        self.value = value.lower()

    def _test(self, v: str) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def mask(self, ctx: Ctx) -> np.ndarray:
        vals = ctx.attr_vals(self.key)
        m = np.fromiter(
            (v is not None and self._test(v) for v in vals), dtype=bool, count=ctx.n)
        return ctx.is_elem & m


class AttributeWithValue(_AttrVal):
    def _test(self, v: str) -> bool:
        return v.strip().lower() == self.value


class AttributeWithValueNot(Evaluator):
    def __init__(self, key: str, value: str) -> None:
        self.key = key
        self.value = value.lower()

    def mask(self, ctx: Ctx) -> np.ndarray:
        vals = ctx.attr_vals(self.key)
        m = np.fromiter(
            (v is None or v.strip().lower() != self.value for v in vals),
            dtype=bool, count=ctx.n)
        return ctx.is_elem & m


class AttributeWithValueStarting(_AttrVal):
    def _test(self, v: str) -> bool:
        return v.lower().startswith(self.value)


class AttributeWithValueEnding(_AttrVal):
    def _test(self, v: str) -> bool:
        return v.lower().endswith(self.value)


class AttributeWithValueContaining(_AttrVal):
    def _test(self, v: str) -> bool:
        return self.value in v.lower()


class AttributeWithValueMatching(Evaluator):
    def __init__(self, key: str, pattern: str) -> None:
        self.key = key
        self.re = icu.compile(pattern)  # ICU dialect (Pattern.swift:26)

    def mask(self, ctx: Ctx) -> np.ndarray:
        vals = ctx.attr_vals(self.key)
        m = np.fromiter(
            (v is not None and self.re.search(v) is not None for v in vals),
            dtype=bool, count=ctx.n)
        return ctx.is_elem & m


class IndexLessThan(Evaluator):
    def __init__(self, idx: int) -> None:
        self.idx = idx

    def mask(self, ctx: Ctx) -> np.ndarray:
        return ctx.is_elem & (ctx.sib_index() < self.idx)


class IndexGreaterThan(Evaluator):
    def __init__(self, idx: int) -> None:
        self.idx = idx

    def mask(self, ctx: Ctx) -> np.ndarray:
        return ctx.is_elem & (ctx.sib_index() > self.idx)


class IndexEquals(Evaluator):
    def __init__(self, idx: int) -> None:
        self.idx = idx

    def mask(self, ctx: Ctx) -> np.ndarray:
        return ctx.is_elem & (ctx.sib_index() == self.idx)


def _nth_mask(pos: np.ndarray, a: int, b: int) -> np.ndarray:
    if a == 0:
        return pos == b
    return ((pos - b) * a >= 0) & ((pos - b) % a == 0)


class IsNthChild(Evaluator):
    def __init__(self, a: int, b: int) -> None:
        self.a, self.b = a, b

    def mask(self, ctx: Ctx) -> np.ndarray:
        pos = ctx.sib_index() + 1
        m = _nth_mask(pos, self.a, self.b)
        return ctx.is_elem & m & _has_elem_parent(ctx)


class IsNthLastChild(Evaluator):
    def __init__(self, a: int, b: int) -> None:
        self.a, self.b = a, b

    def mask(self, ctx: Ctx) -> np.ndarray:
        pos = ctx.sib_count() - ctx.sib_index()
        m = _nth_mask(pos, self.a, self.b)
        return ctx.is_elem & m & _has_elem_parent(ctx)


class IsNthOfType(Evaluator):
    def __init__(self, a: int, b: int) -> None:
        self.a, self.b = a, b

    def mask(self, ctx: Ctx) -> np.ndarray:
        idx, _ = ctx.of_type_index()
        m = _nth_mask(idx + 1, self.a, self.b)
        return ctx.is_elem & m & _has_elem_parent(ctx)


class IsNthLastOfType(Evaluator):
    def __init__(self, a: int, b: int) -> None:
        self.a, self.b = a, b

    def mask(self, ctx: Ctx) -> np.ndarray:
        idx, cnt = ctx.of_type_index()
        m = _nth_mask(cnt - idx, self.a, self.b)
        return ctx.is_elem & m & _has_elem_parent(ctx)


def _has_elem_parent(ctx: Ctx) -> np.ndarray:
    p = ctx.parent
    ok = np.zeros(ctx.n, dtype=bool)
    valid = p >= 0
    ok[valid] = ctx.ntype[p[valid]] == ELEMENT
    return ok


class IsFirstChild(Evaluator):
    def mask(self, ctx: Ctx) -> np.ndarray:
        return ctx.is_elem & (ctx.sib_index() == 0) & _has_elem_parent(ctx)


class IsLastChild(Evaluator):
    def mask(self, ctx: Ctx) -> np.ndarray:
        return (ctx.is_elem & (ctx.sib_index() == ctx.sib_count() - 1)
                & _has_elem_parent(ctx))


class IsOnlyChild(Evaluator):
    def mask(self, ctx: Ctx) -> np.ndarray:
        return ctx.is_elem & (ctx.sib_count() == 1) & _has_elem_parent(ctx)


class IsFirstOfType(Evaluator):
    def mask(self, ctx: Ctx) -> np.ndarray:
        idx, _ = ctx.of_type_index()
        return ctx.is_elem & (idx == 0) & _has_elem_parent(ctx)


class IsLastOfType(Evaluator):
    def mask(self, ctx: Ctx) -> np.ndarray:
        idx, cnt = ctx.of_type_index()
        return ctx.is_elem & (idx == cnt - 1) & _has_elem_parent(ctx)


class IsOnlyOfType(Evaluator):
    def mask(self, ctx: Ctx) -> np.ndarray:
        _, cnt = ctx.of_type_index()
        return ctx.is_elem & (cnt == 1) & _has_elem_parent(ctx)


class IsEmpty(Evaluator):
    def mask(self, ctx: Ctx) -> np.ndarray:
        a = ctx.arena
        m = np.zeros(ctx.n, dtype=bool)
        for nid in ctx.order:
            if ctx.is_elem[nid]:
                m[nid] = all(
                    a.ntype[c] in (COMMENT, DOCTYPE, XMLDECL)
                    for c in a.children[nid])
        return m


class IsRoot(Evaluator):
    def mask(self, ctx: Ctx) -> np.ndarray:
        m = np.zeros(ctx.n, dtype=bool)
        r = ctx.root
        a = ctx.arena
        if a.ntype[r] != ELEMENT:
            # document context: :root is the <html> element
            for c in a.children[r]:
                if a.ntype[c] == ELEMENT:
                    m[c] = True
                    break
        else:
            m[r] = True
        return m


class MatchesRoot(Evaluator):
    """Structural root marker for leading combinators ('> p')."""

    def mask(self, ctx: Ctx) -> np.ndarray:
        m = np.zeros(ctx.n, dtype=bool)
        m[ctx.root] = True
        return m


class ContainsText(Evaluator):
    def __init__(self, needle: str) -> None:
        self.needle = needle

    def mask(self, ctx: Ctx) -> np.ndarray:
        texts = ctx.texts()
        m = np.fromiter(
            (t is not None and self.needle in t for t in texts),
            dtype=bool, count=ctx.n)
        return ctx.is_elem & m


class ContainsOwnText(Evaluator):
    def __init__(self, needle: str) -> None:
        self.needle = needle

    def mask(self, ctx: Ctx) -> np.ndarray:
        texts = ctx.own_texts()
        m = np.fromiter(
            (t is not None and self.needle in t for t in texts),
            dtype=bool, count=ctx.n)
        return ctx.is_elem & m


class ContainsData(Evaluator):
    def __init__(self, needle: str) -> None:
        self.needle = needle

    def mask(self, ctx: Ctx) -> np.ndarray:
        datas = ctx.datas()
        m = np.fromiter(
            (t is not None and self.needle in t for t in datas),
            dtype=bool, count=ctx.n)
        return ctx.is_elem & m


class MatchesRegex(Evaluator):
    def __init__(self, pattern: str) -> None:
        self.re = icu.compile(pattern)  # ICU dialect (Pattern.swift:26)

    def mask(self, ctx: Ctx) -> np.ndarray:
        a = ctx.arena
        m = np.zeros(ctx.n, dtype=bool)
        for nid in ctx.order:
            if ctx.is_elem[nid] and self.re.search(a.node_text(nid)):
                m[nid] = True
        return m


class MatchesOwnRegex(Evaluator):
    def __init__(self, pattern: str) -> None:
        self.re = icu.compile(pattern)  # ICU dialect (Pattern.swift:26)

    def mask(self, ctx: Ctx) -> np.ndarray:
        a = ctx.arena
        m = np.zeros(ctx.n, dtype=bool)
        for nid in ctx.order:
            if ctx.is_elem[nid] and self.re.search(a.own_text(nid)):
                m[nid] = True
        return m


# --- structural ----------------------------------------------------------------
class HasChild(Evaluator):
    """:has(> X): some direct child matches inner."""

    def __init__(self, inner: Evaluator) -> None:
        self.inner = inner

    def mask(self, ctx: Ctx) -> np.ndarray:
        inner = self.inner.mask(ctx)
        m = np.zeros(ctx.n, dtype=bool)
        idx = np.nonzero(inner)[0]
        pp = ctx.parent[idx]
        m[pp[pp >= 0]] = True
        return ctx.is_elem & m


class HasImmediateFollowingSibling(Evaluator):
    """:has(+ X): the immediately-following element sibling matches."""

    def __init__(self, inner: Evaluator) -> None:
        self.inner = inner

    def mask(self, ctx: Ctx) -> np.ndarray:
        inner = self.inner.mask(ctx)
        prev = ctx.prev_elem_sibling()
        m = np.zeros(ctx.n, dtype=bool)
        idx = np.nonzero(inner)[0]
        pv = prev[idx]
        m[pv[pv >= 0]] = True
        return ctx.is_elem & m


class HasFollowingSibling(Evaluator):
    """:has(~ X): some later element sibling matches."""

    def __init__(self, inner: Evaluator) -> None:
        self.inner = inner

    def mask(self, ctx: Ctx) -> np.ndarray:
        inner = self.inner.mask(ctx)
        prev = ctx.prev_elem_sibling()
        m = np.zeros(ctx.n, dtype=bool)
        # suffix-OR along sibling chains: iterate reverse document order
        for nid in reversed(ctx.order):
            pv = prev[nid]
            if pv >= 0 and (inner[nid] or m[nid]):
                m[pv] = True
        return ctx.is_elem & m


class Has(Evaluator):
    def __init__(self, inner: Evaluator) -> None:
        self.inner = inner

    def mask(self, ctx: Ctx) -> np.ndarray:
        inner = self.inner.mask(ctx)
        return ctx.is_elem & ctx.descendant_any(inner)


class Not(Evaluator):
    def __init__(self, inner: Evaluator) -> None:
        self.inner = inner

    def mask(self, ctx: Ctx) -> np.ndarray:
        return ctx.is_elem & ~self.inner.mask(ctx)


class Ancestor(Evaluator):
    """descendant combinator: some ancestor matches inner."""

    def __init__(self, inner: Evaluator) -> None:
        self.inner = inner

    def mask(self, ctx: Ctx) -> np.ndarray:
        inner = self.inner.mask(ctx)
        return ctx.is_elem & ctx.ancestor_any(inner)


class ImmediateParent(Evaluator):
    def __init__(self, inner: Evaluator) -> None:
        self.inner = inner

    def mask(self, ctx: Ctx) -> np.ndarray:
        inner = self.inner.mask(ctx)
        p = ctx.parent
        m = np.zeros(ctx.n, dtype=bool)
        valid = (p >= 0) & ctx.in_sub
        m[valid] = inner[p[valid]]
        m[ctx.root] = False
        return ctx.is_elem & m


class PreviousSibling(Evaluator):
    def __init__(self, inner: Evaluator) -> None:
        self.inner = inner

    def mask(self, ctx: Ctx) -> np.ndarray:
        inner = self.inner.mask(ctx)
        prev = ctx.prev_elem_sibling()
        m = np.zeros(ctx.n, dtype=bool)
        # prefix-OR along element-sibling chains
        for nid in ctx.order:
            pv = prev[nid]
            if pv >= 0:
                m[nid] = m[pv] or inner[pv]
        return ctx.is_elem & m


class ImmediatePreviousSibling(Evaluator):
    def __init__(self, inner: Evaluator) -> None:
        self.inner = inner

    def mask(self, ctx: Ctx) -> np.ndarray:
        inner = self.inner.mask(ctx)
        prev = ctx.prev_elem_sibling()
        m = np.zeros(ctx.n, dtype=bool)
        valid = prev >= 0
        m[valid] = inner[prev[valid]]
        return ctx.is_elem & m
