"""DOM → Markdown conversion over the flat arena — the modern
pipeline's upgrade over plain ``text()``: LLM corpora increasingly keep
document STRUCTURE (headings, lists, links, emphasis, code) as
CommonMark instead of flattening it away.

Covered (documented subset of CommonMark): h1-h6, paragraphs, a →
``[text](href)``, b/strong → ``**..**``, i/em → ``*..*``, code →
backticks, pre → fenced block (verbatim contents), ul/ol/li (nested,
``-`` / ``1.`` numbering), blockquote, hr, br (hard break), img →
``![alt](src)``. Tables flatten to their text (pipe-table emission is
a straightforward extension; not needed by the corpus oracle). Inline
text is whitespace-normalized with the same rules as ``text()``, so
Markdown output inherits the byte-exactness discipline.

Runs per document inside the usual fused Arrow batch stage
(``spark.extract.apply_kernel``) — one scan, no shuffle, no pandas.
"""

from __future__ import annotations

import re

from swiftsoup_spark.kernel.arena import (
    CDATA, DATA, ELEMENT, TEXT, Arena)

_WS_RUN = re.compile(r"[ \t\n\f\r\xa0]+")

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_SKIP = {"script", "style", "head", "template"}
_BOLD = {"b", "strong"}
_ITAL = {"i", "em"}
# block-ish elements that force a paragraph break around their output
_BLOCKS = {"p", "div", "section", "article", "main", "aside", "header",
           "footer", "nav", "figure", "figcaption", "address", "table",
           "tr", "caption"}


def _doc_markdown(arena: Arena, root: int) -> str:
    """Markdown for the subtree at ``root`` (usually the <body>)."""
    tags = arena.tags
    out: list[str] = []          # completed blocks
    cur: list[str] = []          # inline run of the current block

    def flush():
        s = _WS_RUN.sub(" ", "".join(cur)).strip()
        cur.clear()
        # \x05 = hard break (<br>): becomes backslash-newline AFTER
        # normalization so the newline survives the whitespace collapse
        s = re.sub(r" ?\x05 ?", "\\\\\n", s).strip()
        if s:
            out.append(s)

    def walk(nid: int, list_stack: tuple, quote: int):
        t = arena.ntype[nid]
        if t == TEXT or t == CDATA:
            cur.append(arena.text[nid] or "")
            return
        if t != ELEMENT:
            if t == DATA:
                return
            for c in arena.children[nid]:
                walk(c, list_stack, quote)
            return
        name = tags.name(arena.tag[nid])
        if name in _SKIP:
            return
        attrs = arena.attrs[nid] or {}
        if name in _HEADINGS:
            flush()
            cur.append("#" * _HEADINGS[name] + " ")
            for c in arena.children[nid]:
                walk(c, list_stack, quote)
            flush()
            return
        if name == "br":
            cur.append("\x05")   # hard break; resolved in flush()
            return
        if name == "hr":
            flush()
            out.append("---")
            return
        if name == "pre":
            flush()
            raw: list[str] = []

            def collect(n):
                if arena.ntype[n] in (TEXT, CDATA, DATA):
                    raw.append(arena.text[n] or "")
                for c in arena.children[n]:
                    collect(c)
            collect(nid)
            body = "".join(raw)
            # HTML drops one newline right after <pre>; mirror that
            if body.startswith("\n"):
                body = body[1:]
            out.append("```\n" + body.rstrip("\n") + "\n```")
            return
        if name == "code":
            cur.append("`")
            for c in arena.children[nid]:
                walk(c, list_stack, quote)
            cur.append("`")
            return
        if name in _BOLD or name in _ITAL:
            mark = "**" if name in _BOLD else "*"
            cur.append(mark)
            for c in arena.children[nid]:
                walk(c, list_stack, quote)
            cur.append(mark)
            return
        if name == "a" and attrs.get("href"):
            cur.append("[")
            for c in arena.children[nid]:
                walk(c, list_stack, quote)
            cur.append(f"]({attrs['href']})")
            return
        if name == "img":
            cur.append(f"![{attrs.get('alt', '')}]({attrs.get('src', '')})")
            return
        if name in ("ul", "ol"):
            flush()
            for c in arena.children[nid]:
                walk(c, list_stack + (name,), quote)
            return
        if name == "li":
            flush()
            depth = max(len(list_stack) - 1, 0)
            marker = "1." if (list_stack and list_stack[-1] == "ol") \
                else "-"
            cur.append("\x01" + "\x04" * depth + marker + " ")
            for c in arena.children[nid]:
                walk(c, list_stack, quote)
            flush()
            return
        if name == "blockquote":
            flush()
            mark = len(out)
            for c in arena.children[nid]:
                walk(c, list_stack, quote + 1)
            flush()
            out[mark:] = ["\n".join(
                "> " + ln for ln in b.split("\n")) for b in out[mark:]]
            return
        if name in ("td", "th"):
            # cells join with single spaces inside their row block
            for c in arena.children[nid]:
                walk(c, list_stack, quote)
            cur.append(" ")
            return
        if name in _BLOCKS:
            flush()
            for c in arena.children[nid]:
                walk(c, list_stack, quote)
            flush()
            return
        for c in arena.children[nid]:
            walk(c, list_stack, quote)

    walk(root, (), 0)
    flush()
    # \x01 marks a list-item block: keep its leading indentation and
    # join consecutive items with single newlines
    blocks: list[str] = []
    for b in out:
        if b.startswith("\x01"):
            item = b[1:].replace("\x04", "  ")
            if blocks and blocks[-1].startswith("\x02"):
                blocks[-1] += "\n" + item
            else:
                blocks.append("\x02" + item)
        else:
            blocks.append(b)
    return "\n\n".join(b[1:] if b.startswith("\x02") else b
                       for b in blocks)


def markdown_of(doc) -> str:
    """Markdown of a parsed Document's body (whole doc if no body)."""
    body = doc.body()
    return _doc_markdown(doc.arena, body.id if body else doc.id)
