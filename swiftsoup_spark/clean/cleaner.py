"""Whitelist-based Cleaner (reference Cleaner.swift:33-139).

DFS copy of safe nodes from a dirty body into a fresh shell document:
text nodes always kept, DataNodes kept iff their parent tag is safe,
comments/doctypes dropped and counted; attributes filtered through
Whitelist.safeAttribute with enforced attributes appended."""

from __future__ import annotations

import re

from swiftsoup_spark.kernel.arena import (
    Arena, CDATA, COMMENT, DATA, DOCUMENT, ELEMENT, TEXT, Document,
)
from swiftsoup_spark.kernel.serializer import OutputSettings, inner_html
from swiftsoup_spark.clean.whitelist import Whitelist, PRESETS


def _create_shell(base_uri: str, tags=None) -> Arena:
    a = Arena(tags, base_uri)
    doc = a.new_node(DOCUMENT, a.tags.intern("#root"))
    html = a.new_element("html")
    a.append_child(doc, html)
    head = a.new_element("head")
    body = a.new_element("body")
    a.append_child(html, head)
    a.append_child(html, body)
    return a


def clean_arena(src: Arena, src_body: int, wl: Whitelist) -> tuple[Arena, int, int]:
    """Copy safe nodes of src_body's subtree into a fresh shell document.
    Returns (clean_arena, clean_body_id, num_discarded)."""
    dst = _create_shell(src.base_uri, None)
    body = dst.children[dst.children[0][0]][1]  # html -> [head, body]
    discarded = _copy_safe(src, src_body, dst, body, wl)
    return dst, body, discarded


def _copy_safe(src: Arena, src_root: int, dst: Arena, dst_root: int, wl: Whitelist) -> int:
    discarded = 0
    # stack of (src node, dst parent); element destinations tracked per node
    stack: list[tuple[int, int]] = [
        (c, dst_root) for c in reversed(src.children[src_root])]
    while stack:
        nid, dest = stack.pop()
        t = src.ntype[nid]
        if t == ELEMENT:
            tag = src.tag_name(nid)
            if wl.is_safe_tag(tag):
                new_attrs: dict[str, str | None] = {}
                for k, v in (src.attrs[nid] or {}).items():
                    sv = wl.safe_attribute(tag, k, v or "", src.base_uri)
                    if sv is None:
                        discarded += 1
                    elif v is None and sv == "":
                        new_attrs[k] = None  # keep valueless attrs bare
                    else:
                        new_attrs[k] = sv
                new_attrs.update(wl.enforced_for(tag))
                el = dst.new_element(tag, new_attrs or None)
                if nid in src.selfclosing:
                    dst.selfclosing.add(el)
                dst.append_child(dest, el)
                for c in reversed(src.children[nid]):
                    stack.append((c, el))
            else:
                discarded += 1
                for c in reversed(src.children[nid]):
                    stack.append((c, dest))  # descend, reference traverses whole tree
        elif t == TEXT or t == CDATA:
            tn = dst.new_node(t, text=src.text[nid])
            dst.append_child(dest, tn)
        elif t == DATA:
            pid = src.parent[nid]
            if pid >= 0 and src.ntype[pid] == ELEMENT and wl.is_safe_tag(src.tag_name(pid)):
                dn = dst.new_node(DATA, text=src.text[nid])
                dst.append_child(dest, dn)
            else:
                discarded += 1
        else:
            discarded += 1  # comments, doctypes, xml decls
    return discarded


def _nbsp_post(html: str, wl: Whitelist) -> str:
    """Text-only whitelists normalize nbsp entities to plain spaces
    (reference SwiftSoup.swift:435-447)."""
    if not wl.is_text_only():
        return html
    html = html.replace("&nbsp;", " ")
    return re.sub(r"&#(?:160|x[aA]0);", " ", html)


def _resolve_whitelist(wl) -> Whitelist:
    if wl is None:
        return PRESETS["relaxed"]()
    if isinstance(wl, str):
        return PRESETS[wl]()
    return wl


def clean_document(doc: Document, wl) -> Document:
    wl = _resolve_whitelist(wl)
    src = doc.arena
    body = doc.body()
    dst = _create_shell(src.base_uri)
    if body is not None:
        dst_html = dst.children[0][0]
        dst_body = dst.children[dst_html][1]
        _copy_safe(src, body.id, dst, dst_body, wl)
    return Document(dst, 0)


def clean_html(body_html: str, wl=None, base_uri: str = "",
               output_settings: OutputSettings | None = None) -> str:
    from swiftsoup_spark.api import parse_body_fragment
    wl = _resolve_whitelist(wl)
    dirty = parse_body_fragment(body_html, base_uri)
    src = dirty.arena
    body = dirty.body()
    dst, dst_body, _ = clean_arena(src, body.id, wl)
    html = inner_html(dst, dst_body, output_settings)
    return _nbsp_post(html, wl)


def is_valid_html(body_html: str, wl=None) -> bool:
    from swiftsoup_spark.api import parse_body_fragment
    wl = _resolve_whitelist(wl)
    dirty = parse_body_fragment(body_html, "")
    src = dirty.arena
    body = dirty.body()
    _, _, discarded = clean_arena(src, body.id, wl)
    return discarded == 0
