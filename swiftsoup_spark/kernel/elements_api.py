"""Elements — ordered result-set with jQuery-style bulk ops
(reference Elements.swift, 766 LoC; §2.8). A thin list subclass over
Element facades; bulk ops map/filter across members."""

from __future__ import annotations

from swiftsoup_spark.kernel.arena import Element, Node
from swiftsoup_spark.kernel import mutations as M


class Elements(list):
    # -- reads ------------------------------------------------------------
    def text(self) -> str:
        """Combined text of all matched elements, space-joined
        (reference Elements.swift:213-222)."""
        parts = []
        for el in self:
            t = el.text()
            if t:
                parts.append(t)
        return " ".join(parts)

    def each_text(self) -> list[str]:
        return [el.text() for el in self if el.text()]

    def html(self) -> str:
        return "\n".join(el.html() for el in self)

    def outer_html(self) -> str:
        return "\n".join(el.outer_html() for el in self)

    def attr(self, key: str) -> str:
        """First matching element's attr (reference Elements.attr)."""
        for el in self:
            if el.has_attr(key):
                return el.attr(key)
        return ""

    def each_attr(self, key: str) -> list[str]:
        return [el.attr(key) for el in self if el.has_attr(key)]

    def has_attr(self, key: str) -> bool:
        return any(el.has_attr(key) for el in self)

    def has_class(self, name: str) -> bool:
        return any(el.has_class(name) for el in self)

    def val(self) -> str:
        return self[0].val() if self else ""

    def set_val(self, value: str) -> "Elements":
        """Bulk value set (reference Elements.val(String))."""
        for el in self:
            el.set_val(value)
        return self

    def set_html(self, html: str) -> "Elements":
        """Bulk inner-html replace (reference Elements.html(String))."""
        for el in self:
            el.set_html(html)
        return self

    def forms(self) -> list:
        """The matched elements that are forms, as FormElement
        (reference Elements.forms)."""
        return [f for f in (el.as_form() for el in self) if f is not None]

    # -- filtering / set ops -----------------------------------------------
    def select(self, css: str) -> "Elements":
        out = Elements()
        seen = set()
        for el in self:
            for m in el.select(css):
                if m not in seen:
                    seen.add(m)
                    out.append(m)
        return out

    def not_(self, css: str) -> "Elements":
        return Elements([el for el in self if not el.matches(css)])

    def eq(self, i: int) -> "Elements":
        return Elements([self[i]]) if 0 <= i < len(self) else Elements()

    def is_(self, css: str) -> bool:
        return any(el.matches(css) for el in self)

    def first(self):
        return self[0] if self else None

    def last(self):
        return self[-1] if self else None

    def parents(self) -> "Elements":
        """Dedup-ordered union of all ancestors (reference
        Elements.swift:604-616, OrderedSet)."""
        out = Elements()
        seen = set()
        for el in self:
            p = el.parent()
            while p is not None and p.node_type == 1:
                if p not in seen:
                    seen.add(p)
                    out.append(p)
                p = p.parent()
        return out

    def next(self, css: str | None = None) -> "Elements":
        out = Elements()
        for el in self:
            sibs = el.parent().children() if el.parent() else []
            try:
                i = sibs.index(el)
            except ValueError:
                continue
            if i + 1 < len(sibs):
                n = sibs[i + 1]
                if css is None or n.matches(css):
                    out.append(n)
        return out

    def prev(self, css: str | None = None) -> "Elements":
        out = Elements()
        for el in self:
            sibs = el.parent().children() if el.parent() else []
            try:
                i = sibs.index(el)
            except ValueError:
                continue
            if i - 1 >= 0:
                p = sibs[i - 1]
                if css is None or p.matches(css):
                    out.append(p)
        return out

    # -- bulk mutations ------------------------------------------------------
    def set_attr(self, key: str, value: str) -> "Elements":
        for el in self:
            el.set_attr(key, value)
        return self

    def remove_attr(self, key: str) -> "Elements":
        for el in self:
            el.remove_attr(key)
        return self

    def add_class(self, name: str) -> "Elements":
        for el in self:
            M.add_class(el.arena, el.id, name)
        return self

    def remove_class(self, name: str) -> "Elements":
        for el in self:
            M.remove_class(el.arena, el.id, name)
        return self

    def toggle_class(self, name: str) -> "Elements":
        for el in self:
            M.toggle_class(el.arena, el.id, name)
        return self

    def tag_name(self, name: str) -> "Elements":
        for el in self:
            M.set_tag_name(el.arena, el.id, name)
        return self

    def remove(self) -> "Elements":
        for el in self:
            el.remove()
        return self

    def empty(self) -> "Elements":
        for el in self:
            M.empty(el.arena, el.id)
        return self

    def unwrap(self) -> "Elements":
        for el in self:
            M.unwrap(el.arena, el.id)
        return self

    def wrap(self, html: str) -> "Elements":
        for el in self:
            M.wrap(el.arena, el.id, html)
        return self

    def append(self, x):  # list.append for internal building
        return super().append(x)

    def append_html(self, html: str) -> "Elements":
        for el in self:
            M.append_html(el.arena, el.id, html)
        return self

    def prepend_html(self, html: str) -> "Elements":
        for el in self:
            M.prepend_html(el.arena, el.id, html)
        return self

    def before_html(self, html: str) -> "Elements":
        for el in self:
            M.before_html(el.arena, el.id, html)
        return self

    def after_html(self, html: str) -> "Elements":
        for el in self:
            M.after_html(el.arena, el.id, html)
        return self

    # -- traversal ------------------------------------------------------------
    def traverse(self, head, tail=None) -> "Elements":
        """NodeVisitor-equivalent DFS with head/tail callbacks
        (reference NodeTraversor / Elements.traverse)."""
        from swiftsoup_spark.kernel.arena import _wrap
        for el in self:
            _traverse_node(el.arena, el.id, head, tail, 0)
        return self


def _traverse_node(arena, nid, head, tail, depth):
    from swiftsoup_spark.kernel.arena import _wrap
    head(_wrap(arena, nid), depth)
    for c in list(arena.children[nid]):
        _traverse_node(arena, c, head, tail, depth + 1)
    if tail is not None:
        tail(_wrap(arena, nid), depth)
