"""From-scratch GIF87a codec: lossless round trip, general-LZW decode
(dictionary growth, width bumps, KwKwK), garbage fuzz."""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.gif import decode_gif, encode_gif
from swiftsoup_spark.ops.imagehdr import sniff_image


def test_roundtrip_exact():
    rng = np.random.default_rng(17)
    for h, w in [(1, 1), (3, 7), (16, 16), (40, 33), (1, 300)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        dec = decode_gif(encode_gif(img))
        assert dec is not None
        assert (dec[0], dec[1]) == (w, h)
        assert np.array_equal(dec[2], img)  # LZW is lossless


def test_sniffer_reads_real_gifs():
    img = np.zeros((5, 9), dtype=np.uint8)
    assert sniff_image(encode_gif(img)) == ("gif", 9, 5)


def _general_lzw_gif(img):
    """Test-side REFERENCE: a real dictionary-building LZW compressor
    (greedy longest-match, width bumps, clear at 4096) so the decoder
    is exercised on streams our uncompressed-trick encoder never
    produces — including KwKwK."""
    h, w = img.shape
    lsd = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out = bytearray()
    acc = nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = 9
    table = {(i,): i for i in range(256)}
    next_code = 258
    put(256, width)
    seq = ()
    for px in img.reshape(-1).tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        put(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(256, width)  # clear
            width = 9
            table = {(i,): i for i in range(256)}
            next_code = 258
        seq = (px,)
    if seq:
        put(table[seq], width)
    put(257, width)
    if nbits:
        out.append(acc & 0xFF)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        c = out[i:i + 255]
        blocks.append(len(c))
        blocks += c
    blocks.append(0)
    return b"GIF87a" + lsd + gct + desc + b"\x08" + bytes(blocks) + b"\x3b"


def test_general_lzw_decode_with_kwkwk():
    # constant runs force the KwKwK self-reference case immediately
    img = np.zeros((16, 16), dtype=np.uint8)
    dec = decode_gif(_general_lzw_gif(img))
    assert dec is not None and np.array_equal(dec[2], img)
    # structured + noisy content: dictionary growth across width bumps
    rng = np.random.default_rng(4)
    y, x = np.mgrid[0:48, 0:64]
    img2 = (((x // 4 + y // 4) % 16) * 17).astype(np.uint8)
    dec2 = decode_gif(_general_lzw_gif(img2))
    assert dec2 is not None and np.array_equal(dec2[2], img2)
    img3 = rng.integers(0, 256, size=(80, 90), dtype=np.uint8)
    dec3 = decode_gif(_general_lzw_gif(img3))
    assert dec3 is not None and np.array_equal(dec3[2], img3)


def test_gif89_extension_blocks_skipped():
    img = np.arange(8, dtype=np.uint8).reshape(2, 4)
    b = encode_gif(img)
    # splice a comment extension between GCT and image descriptor
    cut = 13 + 256 * 3
    ext = b"\x21\xfe\x05hello\x00"
    patched = b"GIF89a" + b[6:cut] + ext + b[cut:]
    dec = decode_gif(patched)
    assert dec is not None and np.array_equal(dec[2], img)


def test_decode_bails_cleanly():
    img = np.full((4, 4), 9, dtype=np.uint8)
    good = encode_gif(img)
    assert decode_gif(good[:20]) is None            # truncated in GCT
    assert decode_gif(good[:-10]) is None           # truncated stream
    b = bytearray(good)
    b[13 + 768 + 9] |= 0x40                         # interlace flag
    assert decode_gif(bytes(b)) is None
    assert decode_gif(b"GIF87a" + bytes(20)) is None
    assert decode_gif(b"") is None


def test_decode_never_raises_on_garbage():
    import random
    rnd = random.Random(8)
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_gif(img)
    for _ in range(800):
        blob = bytearray(good)
        for _ in range(rnd.randrange(1, 6)):
            blob[rnd.randrange(len(blob))] = rnd.randrange(256)
        r = decode_gif(bytes(blob))
        assert r is None or r[2].shape == (r[1], r[0])
