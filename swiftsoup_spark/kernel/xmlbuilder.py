"""Naive XML tree builder (reference XmlTreeBuilder.swift:19-193):
start tag pushes, end tag pops to closest matching open element, no HTML
insertion semantics. Comments starting with '?' or '!' become
declaration nodes."""

from __future__ import annotations

from swiftsoup_spark.kernel.arena import (
    Arena, CDATA, COMMENT, DATA, DOCTYPE, DOCUMENT, TEXT, XMLDECL,
)
from swiftsoup_spark.kernel.tags import TagRegistry
from swiftsoup_spark.kernel.tokenizer import PRESERVE_CASE, Tokeniser


class XmlTreeBuilder:
    """Tag/attribute case is PRESERVED (reference
    XmlTreeBuilder.defaultSettings == ParseSettings.preserveCase,
    XmlTreeBuilder.swift:25-34); end tags match case-sensitively."""

    def __init__(self, tags: TagRegistry | None = None) -> None:
        self.tags = tags

    def parse(self, xml: str, base_uri: str = "") -> Arena:
        a = Arena(self.tags, base_uri)
        doc = a.new_node(DOCUMENT, a.tags.intern("#root"))
        stack = [doc]
        tok = Tokeniser(xml, settings=PRESERVE_CASE)
        while True:
            t = tok.read()
            k = t[0]
            if k == "eof":
                break
            if k == "start":
                # intern the NORMALIZED name (selectors match on it, like
                # the reference's normalName); original case rides in
                # display_tag for tagName()/serialization
                el = a.new_element(t[1], t[2])
                if len(t) > 4:
                    a.display_tag[el] = t[4]
                a.append_child(stack[-1], el)
                if t[3]:
                    a.selfclosing.add(el)
                else:
                    stack.append(el)
            elif k == "end":
                # pop to closest matching open element (case-sensitive on
                # the display name, reference preserveCase); ignore if none
                name = t[2] if len(t) > 2 else t[1]
                for i in range(len(stack) - 1, 0, -1):
                    if a.tag_name_display(stack[i]) == name:
                        del stack[i:]
                        break
            elif k in ("char", "cdata"):
                n = a.new_node(TEXT if k == "char" else CDATA, text=t[1])
                a.append_child(stack[-1], n)
            elif k == "data":
                n = a.new_node(DATA, text=t[1])
                a.append_child(stack[-1], n)
            elif k == "comment":
                data = t[1]
                if data.startswith("?") or data.startswith("!"):
                    # XML declaration / processing instruction
                    body = data.strip("?!")
                    name = body.split(None, 1)[0] if body.split() else body
                    n = a.new_node(XMLDECL, text=("!" if data.startswith("!") else "") + name)
                    # parse pseudo-attributes
                    rest = body[len(name):]
                    attrs: dict[str, str] = {}
                    import re
                    for m in re.finditer(r'([^\s=]+)\s*=\s*"([^"]*)"|([^\s=]+)\s*=\s*\'([^\']*)\'', rest):
                        if m.group(1):
                            attrs[m.group(1)] = m.group(2)
                        else:
                            attrs[m.group(3)] = m.group(4)
                    if attrs:
                        a.attrs[n] = attrs
                else:
                    n = a.new_node(COMMENT, text=data)
                a.append_child(stack[-1], n)
            elif k == "doctype":
                d = a.new_node(DOCTYPE, text=t[1])
                a.attrs[d] = {"publicid": t[2] or "", "systemid": t[3] or ""}
                a.append_child(stack[-1], d)
        return a
