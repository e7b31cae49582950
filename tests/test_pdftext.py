"""From-scratch PDF text extractor (ops/pdftext.py): round-trip through
the deterministic writer plus handcrafted PDFs for operators and escape
forms the synthesized corpus doesn't emit."""

import zlib

import pytest

from swiftsoup_spark.ops.pdftext import (
    _extract_stream_text, build_mini_pdf, extract_pdf_text_bytes)


def _wrap(content: bytes, flate: bool = False, length: int | None = None,
          extra_head: bytes = b"") -> bytes:
    payload = zlib.compress(content) if flate else content
    n = len(payload) if length is None else length
    filt = b"/Filter /FlateDecode " if flate else b""
    return (b"%PDF-1.4\n1 0 obj\n<< " + filt + extra_head
            + b"/Length " + str(n).encode() + b" >>\nstream\n"
            + payload + b"\nendstream\nendobj\ntrailer\n%%EOF\n")


# --- writer/parser round trip ------------------------------------------------

@pytest.mark.parametrize("variant", [0, 1, 2, 3])
@pytest.mark.parametrize("text", [
    "hello world foo bar baz qux",
    "single",
    "a b",
    "x (weird) \\ chars ) (",
    "café crème déjà",            # latin-1 range bytes
])
def test_roundtrip(text, variant):
    got = extract_pdf_text_bytes(build_mini_pdf(text, variant))
    if variant == 3:
        w = text.split(" ")
        half = (len(w) + 1) // 2
        exp = " ".join(w[:half]) + (
            "\n" + " ".join(w[half:]) if w[half:] else "")
    else:
        exp = text
    assert got == exp


def test_flate_payload_ending_in_newline_byte():
    # /Length is exact: a compressed payload whose last byte is 0x0A must
    # not be stripped (the original doc-122 bail)
    for filler in range(400):
        content = b"BT (t" + str(filler).encode() * 30 + b") Tj ET"
        pdf = _wrap(content, flate=True)
        if zlib.compress(content).endswith(b"\n"):
            assert extract_pdf_text_bytes(pdf) is not None
            break


# --- content-stream operator coverage ----------------------------------------

def test_td_and_tstar_newlines():
    s = b"BT 72 720 Td (l1) Tj 0 -14 Td (l2) Tj T* (l3) Tj ET"
    assert _extract_stream_text(s) == "l1\nl2\nl3"


def test_positive_td_is_not_a_newline():
    s = b"BT 72 720 Td (a) Tj 10 0 Td (b) Tj ET"
    assert _extract_stream_text(s) == "ab"


def test_tm_newline_only_after_output():
    s = b"BT 1 0 0 1 72 720 Tm (a) Tj 1 0 0 1 72 700 Tm (b) Tj ET"
    assert _extract_stream_text(s) == "a\nb"


def test_quote_operators():
    assert _extract_stream_text(b"BT (a) Tj (b) ' ET") == "a\nb"
    assert _extract_stream_text(b'BT (a) Tj 2 0 (b) " ET') == "a\nb"


def test_tj_kerning_threshold():
    # <= -180 reads as a word space; smaller adjustments do not
    s = b"BT [(a) -250 (b) -50 (c)] TJ ET"
    assert _extract_stream_text(s) == "a bc"


def test_literal_escapes_and_comments():
    s = (b"BT % a comment\n"
         b"(par\\(en\\) \\\\ tab\\tnl\\nocta\\101l cont\\\ninues) Tj ET")
    assert _extract_stream_text(s) == "par(en) \\ tab\tnl\noctaAl continues"


def test_unknown_escape_drops_backslash():
    assert _extract_stream_text(b"BT (a\\qb) Tj ET") == "aqb"


def test_hex_string_odd_digits_and_whitespace():
    # odd digit count pads a trailing 0; embedded whitespace ignored
    assert _extract_stream_text(b"BT <4 86 9> Tj ET") == "Hi"


def test_nested_parens_unescaped():
    assert _extract_stream_text(b"BT ((nested (deep))) Tj ET") == "(nested (deep))"


# --- file-level robustness ----------------------------------------------------

def test_wrong_length_recovers_via_endstream_scan():
    pdf = _wrap(b"BT (ok) Tj ET", length=999)
    assert extract_pdf_text_bytes(pdf) == "ok"


def test_non_text_stream_skipped():
    binary = b"%PDF-1.4\n" + _wrap(b"\x00\x01binarydata")[9:]
    assert extract_pdf_text_bytes(binary) is None  # no BT stream at all


def test_multi_stream_pages_join_with_newline():
    one = _wrap(b"BT (p1) Tj ET")[9:]  # strip inner %PDF header
    two = _wrap(b"BT (p2) Tj ET")[9:]
    assert extract_pdf_text_bytes(b"%PDF-1.4\n" + one + two) == "p1\np2"


def test_bails_are_none_not_garbage():
    assert extract_pdf_text_bytes(b"") is None
    assert extract_pdf_text_bytes(b"GIF89a...") is None
    assert extract_pdf_text_bytes(b"%PDF-1.4\n/Encrypt <<>>") is None
    # unsupported filter
    lzw = _wrap(b"BT (x) Tj ET", extra_head=b"/Filter /LZWDecode ")
    assert extract_pdf_text_bytes(lzw.replace(b"/Length", b"/Length", 1)) is None
    # corrupt flate
    bad = _wrap(b"BT (x) Tj ET", flate=True)
    bad = bad.replace(zlib.compress(b"BT (x) Tj ET")[:4], b"\xde\xad\xbe\xef", 1)
    assert extract_pdf_text_bytes(bad) is None


# --- Spark operators ----------------------------------------------------------

@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="pdftext-test")


def test_spark_roundtrip_with_keep_cols(spark):
    from swiftsoup_spark.ops.pdftext import extract_pdf_text, synthesize_pdfs
    df = spark.createDataFrame(
        [(i, f"u{i}", f"word{i} tail common text here now ok fin{i}")
         for i in range(8)],
        "doc_id long, url string, text string")
    pdfs = synthesize_pdfs(df, keep_cols=("url",))
    out = extract_pdf_text(pdfs, keep_cols=("url",))
    rows = {r.doc_id: (r.url, r.text) for r in out.collect()}
    for i in range(8):
        url, text = rows[i]
        assert url == f"u{i}"
        exp = f"word{i} tail common text here now ok fin{i}"
        if i % 4 == 3:
            w = exp.split(" ")
            half = (len(w) + 1) // 2
            exp = " ".join(w[:half]) + "\n" + " ".join(w[half:])
        assert text == exp


def test_spark_plan_is_fused_scan(spark):
    # no shuffle anywhere: synthesize -> extract is chained MapInArrow
    from swiftsoup_spark.ops.pdftext import extract_pdf_text, synthesize_pdfs
    df = spark.createDataFrame([(1, "u", "t x")],
                               "doc_id long, url string, text string")
    plan = (extract_pdf_text(synthesize_pdfs(df, keep_cols=("url",)),
                             keep_cols=("url",))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_mutation_fuzz_never_crashes():
    # a hand-written binary parser must never raise on corrupt input:
    # deterministic byte mutations of valid PDFs -> str or None, no throw
    import random
    rng = random.Random(0x5EED)
    base = [build_mini_pdf(f"some words here w{i} x{i} y{i}", i % 4)
            for i in range(4)]
    for trial in range(400):
        pdf = bytearray(base[trial % 4])
        for _ in range(rng.randrange(1, 6)):
            op = rng.randrange(3)
            pos = rng.randrange(len(pdf))
            if op == 0:
                pdf[pos] = rng.randrange(256)            # flip
            elif op == 1:
                del pdf[pos:pos + rng.randrange(1, 20)]  # cut
            else:
                pdf[pos:pos] = bytes(rng.randrange(256)
                                     for _ in range(rng.randrange(1, 8)))
        out = extract_pdf_text_bytes(bytes(pdf))
        assert out is None or isinstance(out, str)


def test_truncation_fuzz_never_crashes():
    pdf = build_mini_pdf("alpha beta gamma delta", 0)
    for cut in range(0, len(pdf), 7):
        out = extract_pdf_text_bytes(pdf[:cut])
        assert out is None or isinstance(out, str)


def test_incremental_update_last_definition_wins():
    # PDF 1.7 §7.5.6: an incremental update APPENDS a new body for an
    # existing object number; the later definition is current. The
    # sequential scan must overwrite, not keep the first.
    base = build_mini_pdf("old stale text", 0)
    # append a replacement content stream for the same object number
    # holding the page content; find which object carries BT..ET
    from swiftsoup_spark.ops.pdftext import _scan_objects
    objs = _scan_objects(base)
    content_num = next(
        n for n, (_, payload, _ok) in objs.items()
        if payload is not None and b"BT" in payload)
    new_stream = b"BT 72 720 Td (fresh updated text) Tj ET"
    update = (str(content_num).encode() + b" 1 obj\n<< /Length "
              + str(len(new_stream)).encode() + b" >>\nstream\n"
              + new_stream + b"\nendstream\nendobj\n"
              b"trailer\n<< >>\n%%EOF\n")
    updated = base + update
    got = extract_pdf_text_bytes(updated)
    assert got == "fresh updated text"
