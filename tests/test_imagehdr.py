"""Container sniffing (PNG/JPEG/GIF/BMP) + real BMP codec."""

import struct

import numpy as np
import pytest

from swiftsoup_spark.ops.imagehdr import (decode_bmp, encode_bmp,
                                          encode_gif_shell,
                                          encode_jpeg_shell, sniff_image)
from swiftsoup_spark.ops.png import encode_png


def test_sniff_png():
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert sniff_image(encode_png(arr)) == ("png", 4, 3)


def test_sniff_jpeg_shell():
    b = encode_jpeg_shell(640, 480, b"\x00\x01\xff\x03" * 4)
    assert sniff_image(b) == ("jpeg", 640, 480)


def test_sniff_jpeg_fill_bytes():
    # extra 0xFF fill bytes before a marker are legal (T.81 B.1.1.2)
    b = encode_jpeg_shell(33, 7, b"xy")
    b = b[:2] + b"\xff\xff\xff" + b[2:]
    assert sniff_image(b) == ("jpeg", 33, 7)


def test_sniff_jpeg_progressive_sof2():
    # swap the SOF0 marker for SOF2 (progressive) — still a frame header
    b = bytearray(encode_jpeg_shell(100, 200, b"z"))
    i = bytes(b).index(b"\xff\xc0")
    b[i + 1] = 0xC2
    assert sniff_image(bytes(b)) == ("jpeg", 100, 200)


def test_sniff_jpeg_malformed():
    assert sniff_image(b"\xff\xd8\xff") is None
    assert sniff_image(b"\xff\xd8\xff\xd9") is None  # EOI before SOF
    good = encode_jpeg_shell(8, 8, b"q")
    assert sniff_image(good[:20]) is None  # truncated mid-segment
    # SOS before any SOF
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    assert sniff_image(b"\xff\xd8" + sos + b"\xff\xd9") is None


def test_sniff_gif():
    assert sniff_image(encode_gif_shell(320, 200, b"abc")) == ("gif", 320, 200)
    v87 = b"GIF87a" + struct.pack("<HHBBB", 5, 6, 0, 0, 0) + b"\x3b"
    assert sniff_image(v87) == ("gif", 5, 6)
    assert sniff_image(b"GIF90a" + bytes(8)) is None
    assert sniff_image(b"GIF89a\x00\x00") is None  # truncated


def test_sniff_bmp_variants():
    arr = np.full((2, 3), 9, dtype=np.uint8)
    assert sniff_image(encode_bmp(arr)) == ("bmp", 3, 2)
    # 12-byte BITMAPCOREHEADER
    core = (b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
            + struct.pack("<IHHHH", 12, 7, 4, 1, 24))
    assert sniff_image(core) == ("bmp", 7, 4)
    # top-down (negative height) reports abs
    b = bytearray(encode_bmp(arr))
    b[22:26] = struct.pack("<i", -2)
    assert sniff_image(bytes(b)) == ("bmp", 3, 2)


def test_sniff_rejects_non_images():
    assert sniff_image(None) is None
    assert sniff_image(b"") is None
    assert sniff_image(b"<html><body>hi</body></html>") is None
    assert sniff_image(b"%PDF-1.7 ...") is None


def test_bmp_roundtrip():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (16, 16), (5, 3)]:
        arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        dec = decode_bmp(encode_bmp(arr))
        assert dec is not None
        dw, dh, grey = dec
        assert (dw, dh) == (w, h)
        assert np.array_equal(grey, arr)


def test_bmp_topdown_decode():
    arr = np.arange(6, dtype=np.uint8).reshape(2, 3)
    b = bytearray(encode_bmp(arr))
    b[22:26] = struct.pack("<i", -2)
    # rows were written bottom-up; flipping the sign makes the reader
    # take file order as top-down, i.e. the image flips vertically
    dec = decode_bmp(bytes(b))
    assert dec is not None
    assert np.array_equal(dec[2], arr[::-1])


def test_bmp_decode_bails():
    arr = np.zeros((2, 2), dtype=np.uint8)
    good = encode_bmp(arr)
    assert decode_bmp(good[:30]) is None          # truncated
    b = bytearray(good)
    b[28] = 8                                     # 8bpp paletted
    assert decode_bmp(bytes(b)) is None
    b = bytearray(good)
    b[30] = 1                                     # RLE compression
    assert decode_bmp(bytes(b)) is None


@pytest.mark.parametrize("sel", [0, 1, 2, 3])
def test_corpus_payloads_parse(sel):
    # same construction as synth_image_corpus, minus Spark
    from swiftsoup_spark.ops.imagehdr import (encode_bmp as ebmp,
                                              encode_gif_shell as egif)
    from swiftsoup_spark.ops.jpeg import encode_jpeg as ejpg
    dig = bytes(range(16))
    w, h = 13, 9
    if sel == 2:
        payload = egif(w, h, dig)
    else:
        grid = np.frombuffer(dig, np.uint8)[
            (np.arange(h * w) % 16).reshape(h, w)]
        payload = [encode_png, ejpg, None, ebmp][sel](grid)
    fmt = ["png", "jpeg", "gif", "bmp"][sel]
    assert sniff_image(payload) == (fmt, w, h)


def test_corpus_jpeg_rows_really_decode():
    from swiftsoup_spark.ops.jpeg import decode_jpeg, encode_jpeg
    dig = bytes(range(16))
    w, h = 33, 25
    grid = np.frombuffer(dig, np.uint8)[
        (np.arange(h * w) % 16).reshape(h, w)]
    dec = decode_jpeg(encode_jpeg(grid))
    assert dec is not None and (dec[0], dec[1]) == (w, h)
    # values 0..15 on an 8-px period: lossy but nearby
    assert np.mean(np.abs(dec[2].astype(int) - grid.astype(int))) < 8


def test_sniff_never_raises_on_garbage():
    # crawl payloads are untrusted: arbitrary bytes must sniff to None
    # or a tuple, never raise
    import random
    rnd = random.Random(99)
    seeds = [
        b"", b"\xff", b"\xff\xd8", b"BM", b"GIF89a", b"\x89PNG\r\n\x1a\n",
        encode_jpeg_shell(4, 4, b"x")[:11], encode_bmp(
            np.zeros((2, 2), dtype=np.uint8))[:20],
    ]
    for _ in range(3000):
        base = seeds[rnd.randrange(len(seeds))]
        n = rnd.randrange(0, 64)
        blob = base + bytes(rnd.randrange(256) for _ in range(n))
        if rnd.random() < 0.3 and blob:
            i = rnd.randrange(len(blob))
            blob = blob[:i] + bytes([rnd.randrange(256)]) + blob[i + 1:]
        r = sniff_image(blob)
        assert r is None or (len(r) == 3 and r[1] > 0 and r[2] > 0)
        decode_bmp(blob)  # must not raise either
