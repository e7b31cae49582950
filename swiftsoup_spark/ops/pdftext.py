"""PDF text extraction — the north rule's "PDF/layout parse" leg.

A from-scratch, pure-stdlib (zlib) PDF text extractor run as an Arrow-
batched ``mapInArrow`` kernel over a binary payload column — the same
zero-shuffle, column-pruned scan shape as the HTML extraction path. No
PDF library exists in this sandbox, so BOTH sides of the contract are
ours and honestly scoped:

  * ``build_mini_pdf`` — a deterministic writer that synthesizes small
    but structurally varied PDFs (Flate and raw streams, Tj / TJ-with-
    kerning / hex-string / octal-escape / quote-operator shows, one- and
    two-page layouts) from the ``documents`` table. It exists so the
    driver gate has a corpus: the DuckDB oracle states the expected text
    in closed form over ``documents`` and never needs to parse PDF.
  * ``extract_pdf_text`` — the parser: scans stream objects (object
    scan, not xref-chain walking — xref streams / encrypted PDFs are a
    documented bail), FlateDecodes, and interprets the text operators of
    every content stream (BT/ET, Tj, TJ with kerning-as-space, ', ",
    Td/TD/T*/Tm line tracking) with full literal-string escape decoding
    (\\n, \\( , \\ddd octal, line continuations) and hex strings.
    Simple-font byte semantics (latin-1); CID/Type0 composite fonts and
    non-Flate filters are documented bails (text extracted as None).

Layout model: shows accumulate into lines; a negative vertical move
(Td/TD/T*/Tm with decreasing y) or the ' / " operators start a new
line; pages join with a newline. That is the reading-order heuristic of
classic extractors, not full layout analysis — enough to invert any
writer that emits text top-to-bottom.

Scale: one fused Scan -> MapInArrow stage per batch of opaque binaries,
no shuffle, payload column pruned to (id, pdf); the kernel is pure
per-document so executor count scales linearly exactly like the HTML
path.
"""

from __future__ import annotations

import re
import zlib

_WS = b" \t\r\n\f\0"
_DELIM = b"()<>[]{}/%"


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def _lit_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a literal string starting at ``data[i] == '('``; returns
    (decoded bytes, index after the closing paren)."""
    assert data[i:i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                            0x62: 8, 0x66: 12}[e])
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # \ddd octal, 1-3 digits
                j = i
                while j < n and j - i < 3 and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(int(data[i:j], 8) & 0xFF)
                i = j
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: PDF spec says drop the backslash
                out.append(e)
                i += 1
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out.append(c)
        i += 1
    return bytes(out), i


def _hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    assert data[i:i + 1] == b"<"
    j = data.find(b">", i)
    if j < 0:
        j = len(data)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1:j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), j + 1


def _content_tokens(data: bytes):
    """Tokenize a content stream: ('str', bytes) | ('num', float) |
    ('name', bytes) | ('op', bytes) | ('arr', open/close markers)."""
    i, n = 0, len(data)
    while i < n:
        c = data[i:i + 1]
        if c in _WS:
            i += 1
        elif c == b"%":
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == b"(":
            s, i = _lit_string(data, i)
            yield ("str", s)
        elif c == b"<":
            if data[i:i + 2] == b"<<":
                yield ("op", b"<<")
                i += 2
            else:
                s, i = _hex_string(data, i)
                yield ("str", s)
        elif c == b">" and data[i:i + 2] == b">>":
            yield ("op", b">>")
            i += 2
        elif c == b"[":
            yield ("arr", b"[")
            i += 1
        elif c == b"]":
            yield ("arr", b"]")
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and data[j:j + 1] not in _WS + _DELIM:
                j += 1
            yield ("name", data[i + 1:j])
            i = j
        else:
            j = i
            while j < n and data[j:j + 1] not in _WS + _DELIM:
                j += 1
            tok = data[i:j] or data[i:i + 1]
            if j == i:  # lone delimiter not handled above ({ })
                i += 1
            else:
                i = j
            try:
                yield ("num", float(tok))
            except ValueError:
                yield ("op", tok)


# TJ kerning more negative than this (thousandths of em) reads as a word
# space — the classic extractor heuristic.
_KERN_SPACE = -180.0


def _extract_stream_text(content: bytes) -> str:
    """Interpret one content stream's text operators -> extracted text."""
    lines: list[list[str]] = [[]]
    stack: list = []

    def show(b: bytes):
        lines[-1].append(b.decode("latin-1"))

    def newline():
        lines.append([])

    in_array: list = []
    array_mode = False
    for kind, val in _content_tokens(content):
        if kind == "arr":
            if val == b"[":
                array_mode = True
                in_array = []
            else:
                array_mode = False
                stack.append(in_array)
            continue
        if array_mode:
            if kind in ("str", "num"):
                in_array.append((kind, val))
            continue
        if kind in ("str", "num", "name"):
            stack.append(val)
            continue
        op = val
        if op == b"Tj" and stack:
            v = stack.pop()
            if isinstance(v, bytes):
                show(v)
        elif op == b"TJ" and stack:
            arr = stack.pop()
            if isinstance(arr, list):
                for k, v in arr:
                    if k == "str":
                        show(v)
                    elif k == "num" and v <= _KERN_SPACE:
                        show(b" ")
        elif op == b"'" and stack:
            v = stack.pop()
            newline()
            if isinstance(v, bytes):
                show(v)
        elif op == b'"' and len(stack) >= 3:
            v = stack.pop()
            stack.pop()
            stack.pop()
            newline()
            if isinstance(v, bytes):
                show(v)
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            ty = stack.pop()
            stack.pop()
            if isinstance(ty, float) and ty < 0:
                newline()
        elif op == b"T*":
            newline()
        elif op == b"Tm" and len(stack) >= 6:
            ty = stack.pop()
            for _ in range(5):
                stack.pop()
            # a fresh text matrix starts a new line only if we already
            # emitted on the current one (first Tm of a block is setup)
            if lines[-1]:
                newline()
        elif op in (b"BT", b"ET"):
            stack.clear()
        else:
            # unknown operator consumes nothing we track; clear operands
            stack.clear()
    text_lines = ["".join(parts) for parts in lines]
    # strip leading/trailing empty lines (quote-operator leading newline)
    while text_lines and not text_lines[0]:
        text_lines.pop(0)
    while text_lines and not text_lines[-1]:
        text_lines.pop()
    return "\n".join(text_lines)


_STREAM_DICT_RE = re.compile(rb"<<(?:[^<>]|<<[^<>]*>>)*>>\s*stream\r?\n",
                             re.S)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_OTHER_FILTER_RE = re.compile(
    rb"/Filter\s*(?:\[\s*)?/(?!FlateDecode)\w+")


def extract_pdf_text_bytes(data: bytes) -> str | None:
    """Extract reading-order text from one PDF, or None on a documented
    bail (not a PDF, encrypted, unsupported filter, corrupt stream)."""
    if not data or not data.startswith(b"%PDF-"):
        return None
    if b"/Encrypt" in data:
        return None
    pages: list[str] = []
    for m in _STREAM_DICT_RE.finditer(data):
        head, start = m.group(0), m.end()
        lm = _LENGTH_RE.search(head)
        exact = False
        if lm:
            end = start + int(lm.group(1))
            exact = data[end:end + 20].lstrip(b"\r\n ")[:9] == b"endstream"
            if not exact:
                end = data.find(b"endstream", start)  # wrong /Length
        else:
            end = data.find(b"endstream", start)  # indirect /Length
        if end < 0:
            return None
        payload = data[start:end]
        if not exact:
            # without a trusted /Length the newline before 'endstream' is
            # part of the file syntax, not the payload; with one, a
            # trailing 0x0A can be REAL compressed data — never strip it
            payload = payload.rstrip(b"\r\n")
        if _OTHER_FILTER_RE.search(head):
            return None  # LZW/DCT/... not supported: bail, don't guess
        if _FLATE_RE.search(head):
            try:
                payload = zlib.decompress(payload)
            except zlib.error:
                return None
        if b"BT" not in payload:
            continue  # not a text content stream (font file, image...)
        pages.append(_extract_stream_text(payload))
    if not pages:
        return None
    return "\n".join(pages)


# ---------------------------------------------------------------------------
# writer (corpus synthesizer for the driver gate + tests)
# ---------------------------------------------------------------------------

def _esc_lit(s: str) -> bytes:
    return (s.replace("\\", "\\\\").replace("(", "\\(")
             .replace(")", "\\)").encode("latin-1"))


def _octal_lit(s: str) -> bytes:
    return "".join(f"\\{ord(c):03o}" for c in s).encode("latin-1")


def _page_stream(body: bytes, flate: bool) -> bytes:
    payload = zlib.compress(body) if flate else body
    filt = b"/Filter /FlateDecode " if flate else b""
    return (b"<< " + filt + b"/Length " + str(len(payload)).encode()
            + b" >>\nstream\n" + payload + b"\nendstream")


def build_mini_pdf(text: str, variant: int) -> bytes:
    """Deterministic single-/two-page PDF whose extracted text is
    ``text`` (variant 3: ``text`` with the space at the word midpoint
    replaced by a newline — the page boundary).

    variant 0: Flate stream, one literal-string Tj
    variant 1: raw stream, TJ array with kerning numbers as the ONLY
               word separators (exercises kerning-as-space)
    variant 2: Flate stream, hex-string Tj
    variant 3: two raw pages: first all-octal-escape literal Tj, second
               shown with the ' (next-line show) operator
    """
    variant %= 4
    prolog = b"BT /F1 12 Tf 72 720 Td "
    if variant == 3:
        words = text.split(" ")
        half = (len(words) + 1) // 2
        p1 = " ".join(words[:half])
        p2 = " ".join(words[half:])
        contents = [prolog + b"(" + _octal_lit(p1) + b") Tj ET"]
        if p2:
            contents.append(
                b"BT /F1 12 Tf 72 720 Td (" + _esc_lit(p2) + b") ' ET")
        flates = [False] * len(contents)
    elif variant == 1:
        parts = b" -250 ".join(
            b"(" + _esc_lit(w) + b")" for w in text.split(" "))
        contents = [prolog + b"[" + parts + b"] TJ ET"]
        flates = [False]
    elif variant == 2:
        hx = text.encode("latin-1").hex().encode("ascii")
        contents = [prolog + b"<" + hx + b"> Tj ET"]
        flates = [True]
    else:
        contents = [prolog + b"(" + _esc_lit(text) + b") Tj ET"]
        flates = [True]

    n_pages = len(contents)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append((f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                 ).encode())
    first_content = 3 + n_pages
    for i in range(n_pages):
        objs.append((f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                     f"/Contents {first_content + i} 0 R "
                     f"/Resources << /Font << /F1 {first_content + n_pages} "
                     f"0 R >> >> >>").encode())
    for body, fl in zip(contents, flates):
        objs.append(_page_stream(body, fl))
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def synthesize_pdfs(df, text_col: str = "text", id_col: str = "doc_id",
                    out_col: str = "pdf", keep_cols: tuple = ()):
    """(id, keep_cols..., pdf binary) — deterministic writer over the
    documents table; variant keyed on ``id % 4`` so every parser path is
    exercised. ``keep_cols`` ride the Arrow batches through (no join
    needed to re-attach them)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    keep = [c for c in keep_cols if c != id_col]
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + [T.StructField(c, df.schema[c].dataType) for c in keep]
        + [T.StructField(out_col, T.BinaryType())])
    src = df.select(id_col, *keep, text_col)

    def batches(it):
        for batch in it:
            ids = batch.column(id_col)
            texts = batch.column(text_col)
            pdfs = [build_mini_pdf(t.as_py() or "", i.as_py() % 4)
                    for i, t in zip(ids, texts)]
            yield pa.RecordBatch.from_arrays(
                [ids] + [batch.column(c) for c in keep]
                + [pa.array(pdfs, pa.binary())],
                [id_col] + keep + [out_col])

    return src.mapInArrow(batches, out_schema)


def extract_pdf_text(df, pdf_col: str = "pdf", id_col: str = "doc_id",
                     out_col: str = "text", keep_cols: tuple = ()):
    """(id, keep_cols..., text) — Arrow-batched PDF text extraction;
    unparseable documents yield NULL (documented bails, never wrong
    text)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    keep = [c for c in keep_cols if c != id_col]
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + [T.StructField(c, df.schema[c].dataType) for c in keep]
        + [T.StructField(out_col, T.StringType())])
    src = df.select(id_col, *keep, pdf_col)

    def batches(it):
        for batch in it:
            ids = batch.column(id_col)
            pdfs = batch.column(pdf_col)
            texts = [extract_pdf_text_bytes(p.as_py()) for p in pdfs]
            yield pa.RecordBatch.from_arrays(
                [ids] + [batch.column(c) for c in keep]
                + [pa.array(texts, pa.string())],
                [id_col] + keep + [out_col])

    return src.mapInArrow(batches, out_schema)
