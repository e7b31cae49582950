"""Type0/CID composite-font PDF extraction (ops/pdftext).

The writer emits Identity-H fonts with ToUnicode CMaps; the parser walks
the object graph and decodes 2-byte CID shows through the CMap. Covers
both CMap forms, unicode beyond latin-1, astral plane, chunking past the
100-entry section cap, the documented bails (Type0 without ToUnicode,
undecodable needed content), and the bail-list *shrink*: unsupported
filters on streams a page doesn't need no longer poison the document.

Reference parity note: SwiftSoup has no PDF layer; semantics follow the
public PDF 1.7 spec (§9.10.3 ToUnicode CMaps, §9.7 composite fonts).
"""

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.pdftext import (  # noqa: E402
    build_mini_pdf,
    extract_pdf_text_bytes,
    _parse_cmap,
)


def rt(text, variant):
    return extract_pdf_text_bytes(build_mini_pdf(text, variant))


def test_bfchar_roundtrip_unicode():
    t = "Ωμέγα 中文 テキスト and plain ascii"
    assert rt(t, 4) == t


def test_bfrange_roundtrip_unicode():
    t = "runs abcdef αβγδε and gaps q z"
    assert rt(t, 5) == t


def test_astral_plane_chars():
    t = "math 𝕬 and gothic 𐍈 survive"
    assert rt(t, 4) == t
    assert rt(t, 5) == t


def test_cmap_chunking_past_100_entries():
    # >100 distinct chars forces multiple beginbfchar/bfrange sections
    chars = "".join(chr(0x100 + i) for i in range(130))
    t = chars[:65] + " " + chars[65:]
    assert rt(t, 4) == t
    assert rt(t, 5) == t


def test_type0_without_tounicode_bails_null():
    pdf = build_mini_pdf("some text here", 4)
    broken = pdf.replace(b"/ToUnicode 7 0 R ", b"")
    assert extract_pdf_text_bytes(broken) is None


def test_corrupt_tounicode_stream_bails_null():
    pdf = build_mini_pdf("some text here", 5)  # variant 5: Flate CMap
    # find the CMap stream (object 7) and corrupt its Flate payload
    start = pdf.find(b"7 0 obj")
    s = pdf.find(b"stream\n", start) + 7
    corrupted = pdf[:s] + b"\x00\x01" + pdf[s + 2:]
    assert extract_pdf_text_bytes(corrupted) is None


def test_unneeded_bad_filter_stream_no_longer_poisons():
    # append a DCTDecode (JPEG) image object no page references: the
    # structured walk extracts fine (legacy raw scan would have bailed)
    pdf = build_mini_pdf("clean text stays extractable", 0)
    img = (b"99 0 obj\n<< /Subtype /Image /Filter /DCTDecode /Length 4 >>\n"
           b"stream\n\xff\xd8\xff\xd9\nendstream\nendobj\n")
    assert extract_pdf_text_bytes(pdf + img) == "clean text stays extractable"


def test_parse_cmap_bfrange_forms():
    cmap = (b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"2 beginbfrange\n"
            b"<0001> <0003> <0041>\n"          # A B C incrementing
            b"<0005> <0005> [<00E9>]\n"        # array singleton: e-acute
            b"endbfrange\n"
            b"1 beginbfchar <0004> <0020> endbfchar\n")
    m, nbytes = _parse_cmap(cmap)
    assert nbytes == 2
    assert m[1] == "A" and m[2] == "B" and m[3] == "C"
    assert m[4] == " " and m[5] == "é"


def test_one_byte_codespace():
    cmap = (b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"1 beginbfchar <41> <0042> endbfchar\n")
    m, nbytes = _parse_cmap(cmap)
    assert nbytes == 1 and m[0x41] == "B"


def test_unmapped_cid_is_replacement_char_not_silence():
    pdf = build_mini_pdf("ab", 4)
    # widen the shown hex string with an unmapped CID 00FF
    pdf2 = pdf  # variant 4 content is Flate-compressed; rebuild by hand
    body = b"BT /F1 12 Tf 72 720 Td <000100FF0002> Tj ET"
    payload = zlib.compress(body)
    # swap object 4's stream for our custom one
    start = pdf.find(b"4 0 obj")
    end = pdf.find(b"endobj", start)
    new_obj = (b"4 0 obj\n<< /Filter /FlateDecode /Length "
               + str(len(payload)).encode()
               + b" >>\nstream\n" + payload + b"\nendstream\n")
    pdf2 = pdf[:start] + new_obj + pdf[end:]
    got = extract_pdf_text_bytes(pdf2)
    assert got == "a�b"


def test_simple_variants_still_roundtrip():
    for v in range(4):
        t = "legacy simple font path"
        exp = t if v != 3 else "legacy simple\nfont path"
        assert rt(t, v) == exp
