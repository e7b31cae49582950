"""DOM mutation operators — the reference's "DML" surface (§2.5):
append/prepend/before/after(html), wrap/unwrap/replaceWith, remove/empty,
class-list ops, text(set)/html(set)/tagName(set), splitText.

Mutations are arena rewrites: fragment parses land in a scratch arena and
are copied in (the one-shot Spark pipeline never mutates, so these live
outside the hot path; they serve the Cleaner, parseBodyFragment and the
API-parity tests)."""

from __future__ import annotations

from swiftsoup_spark.kernel.arena import Arena, ELEMENT, TEXT


def copy_subtree(src: Arena, src_id: int, dst: Arena) -> int:
    """Deep-copy a node (and subtree) from one arena into another.
    Returns the new node id in dst (unparented)."""
    new_id = dst.new_node(
        src.ntype[src_id], src.tag[src_id] if src.tag[src_id] < 0 else
        dst.tags.intern(src.tag_name(src_id)),
        src.text[src_id],
        dict(src.attrs[src_id]) if src.attrs[src_id] else None)
    if src_id in src.selfclosing:
        dst.selfclosing.add(new_id)
    for c in src.children[src_id]:
        cc = copy_subtree(src, c, dst)
        dst.append_child(new_id, cc)
    return new_id


def parse_fragment_into(arena: Arena, context_tag: str, html: str) -> list[int]:
    """Fragment-parse html (with the given context element name) and copy
    the resulting roots into ``arena``; returns unparented node ids."""
    from swiftsoup_spark.kernel.treebuilder import HtmlTreeBuilder
    frag_arena, ids = HtmlTreeBuilder().parse_fragment(
        html, context_tag, arena.base_uri)
    out = []
    for i in ids:
        frag_arena.remove_from_parent(i)
        out.append(copy_subtree(frag_arena, i, arena))
    return out


def append_html(arena: Arena, nid: int, html: str) -> None:
    arena.mark_dirty(nid)
    for c in parse_fragment_into(arena, arena.tag_name(nid) or "body", html):
        arena.append_child(nid, c)


def prepend_html(arena: Arena, nid: int, html: str) -> None:
    arena.mark_dirty(nid)
    for i, c in enumerate(parse_fragment_into(arena, arena.tag_name(nid) or "body", html)):
        arena.insert_child(nid, i, c)


def before_html(arena: Arena, nid: int, html: str) -> None:
    pid = arena.parent[nid]
    arena.mark_dirty(pid)
    ctx = arena.tag_name(pid) if arena.ntype[pid] == ELEMENT else "body"
    for c in parse_fragment_into(arena, ctx or "body", html):
        arena.insert_before(nid, c)


def after_html(arena: Arena, nid: int, html: str) -> None:
    pid = arena.parent[nid]
    arena.mark_dirty(pid)
    ctx = arena.tag_name(pid) if arena.ntype[pid] == ELEMENT else "body"
    sibs = arena.children[pid]
    idx = sibs.index(nid) + 1
    for c in parse_fragment_into(arena, ctx or "body", html):
        arena.insert_child(pid, idx, c)
        idx += 1


def wrap(arena: Arena, nid: int, html: str) -> None:
    """Wrap the node in the (deepest element of the) parsed html."""
    pid = arena.parent[nid]
    if pid >= 0:
        arena.mark_dirty(pid)
    ctx = arena.tag_name(pid) if pid >= 0 and arena.ntype[pid] == ELEMENT else "body"
    roots = parse_fragment_into(arena, ctx or "body", html)
    wrapper = next((r for r in roots if arena.ntype[r] == ELEMENT), None)
    if wrapper is None:
        return
    deepest = wrapper
    while True:
        els = [c for c in arena.children[deepest] if arena.ntype[c] == ELEMENT]
        if not els:
            break
        deepest = els[0]
    arena.insert_before(nid, wrapper)
    arena.remove_from_parent(nid)
    arena.append_child(deepest, nid)
    for r in roots[1:]:
        arena.append_child(arena.parent[wrapper], r)


def unwrap(arena: Arena, nid: int) -> None:
    """Replace the node with its own children (Node.unwrap)."""
    pid = arena.parent[nid]
    arena.mark_dirty(pid)
    idx = arena.children[pid].index(nid)
    kids = list(arena.children[nid])
    arena.remove_from_parent(nid)
    for k in kids:
        arena.parent[k] = -1
        arena.insert_child(pid, idx, k)
        idx += 1


def replace_with(arena: Arena, nid: int, new_id: int) -> None:
    arena.mark_dirty(arena.parent[nid])
    arena.insert_before(nid, new_id)
    arena.remove_from_parent(nid)


def empty(arena: Arena, nid: int) -> None:
    arena.mark_dirty(nid)
    for c in list(arena.children[nid]):
        arena.parent[c] = -1
    arena.children[nid] = []


def set_text(arena: Arena, nid: int, text: str) -> None:
    empty(arena, nid)
    tn = arena.new_node(TEXT, text=text)
    arena.append_child(nid, tn)


def set_html(arena: Arena, nid: int, html: str) -> None:
    empty(arena, nid)
    append_html(arena, nid, html)


def set_tag_name(arena: Arena, nid: int, name: str) -> None:
    arena.mark_dirty(nid)
    arena.np_cols = None   # tag column is mirrored in the fast columns
    arena.tag[nid] = arena.tags.intern(name.lower())


def split_text(arena: Arena, nid: int, offset: int) -> int:
    """TextNode.splitText: truncate this node at offset, insert the tail
    as a following sibling; returns the new node id."""
    raw = arena.text[nid] or ""
    arena.mark_dirty(nid)
    head, tail = raw[:offset], raw[offset:]
    arena.text[nid] = head
    tn = arena.new_node(TEXT, text=tail)
    pid = arena.parent[nid]
    arena.insert_child(pid, arena.children[pid].index(nid) + 1, tn)
    return tn


# class-list ops (reference Element.swift:2400-2655)
def add_class(arena: Arena, nid: int, name: str) -> None:
    cls = _classes(arena, nid)
    if name not in cls:
        cls.append(name)
    _set_classes(arena, nid, cls)


def remove_class(arena: Arena, nid: int, name: str) -> None:
    cls = [c for c in _classes(arena, nid) if c != name]
    _set_classes(arena, nid, cls)


def toggle_class(arena: Arena, nid: int, name: str) -> None:
    cls = _classes(arena, nid)
    if name in cls:
        cls = [c for c in cls if c != name]
    else:
        cls.append(name)
    _set_classes(arena, nid, cls)


def _classes(arena: Arena, nid: int) -> list[str]:
    a = arena.attrs[nid] or {}
    raw = (a.get("class") or "").strip()
    out = []
    for c in raw.split():
        if c and c not in out:
            out.append(c)
    return out


def _set_classes(arena: Arena, nid: int, cls: list[str]) -> None:
    arena.mark_dirty(nid)
    a = arena.attrs[nid]
    if a is None:
        a = {}
        arena.attrs[nid] = a
    if cls:
        a["class"] = " ".join(cls)
    else:
        a.pop("class", None)
