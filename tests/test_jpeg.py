"""From-scratch baseline JPEG codec (ops/jpeg.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.jpeg import (K_AC_BITS, K_AC_VALS, _huff_codes,
                                      dct2, decode_jpeg, encode_jpeg,
                                      idct2, quality_qt)


def test_dct_idct_identity():
    rng = np.random.default_rng(3)
    for _ in range(20):
        b = rng.uniform(-128, 127, size=(8, 8))
        assert np.max(np.abs(idct2(dct2(b)) - b)) < 1e-9


def test_huffman_tables_are_prefix_free():
    codes = _huff_codes(K_AC_BITS, K_AC_VALS)
    assert len(codes) == 162
    as_strings = [format(c, f"0{ln}b") for c, ln in codes.values()]
    assert len(set(as_strings)) == 162
    for a in as_strings:
        for b in as_strings:
            if a != b:
                assert not b.startswith(a)


def test_constant_blocks_are_near_exact():
    # a constant image has only DC energy; quantized DC error <= qt[0]/2
    for val in (0, 64, 128, 200, 255):
        img = np.full((24, 16), val, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=75))
        assert dec is not None
        w, h, pix = dec
        assert (w, h) == (16, 24)
        assert np.max(np.abs(pix.astype(int) - int(val))) <= 2


def test_roundtrip_smooth_gradient():
    y, x = np.mgrid[0:40, 0:56]
    img = ((x * 3 + y * 2) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec is not None
    _, _, pix = dec
    err = np.abs(pix.astype(int) - img.astype(int))
    # wraparound rows of the % pattern are sharp edges; bound the bulk
    assert np.mean(err) < 6.0
    assert np.percentile(err, 90) < 12


def test_roundtrip_noise_bounded():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    for q in (50, 75, 95):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        assert dec is not None
        _, _, pix = dec
        err = np.abs(pix.astype(int) - img.astype(int))
        assert np.mean(err) < 60  # noise is the worst case for JPEG
    # higher quality must not be worse on average
    e95 = np.mean(np.abs(
        decode_jpeg(encode_jpeg(img, 95))[2].astype(int) - img))
    e50 = np.mean(np.abs(
        decode_jpeg(encode_jpeg(img, 50))[2].astype(int) - img))
    assert e95 <= e50


def test_quality_scaling_monotone():
    q10, q50, q95 = quality_qt(10), quality_qt(50), quality_qt(95)
    assert np.all(q10 >= q50) and np.all(q50 >= q95)
    assert np.all(quality_qt(100) == 1)


def test_byte_stuffing_roundtrip():
    # white image drives large positive DC -> 0xFF-rich entropy bytes
    img = np.full((8, 8), 255, dtype=np.uint8)
    blob = encode_jpeg(img)
    dec = decode_jpeg(blob)
    assert dec is not None
    assert np.max(np.abs(dec[2].astype(int) - 255)) <= 2


def test_non_multiple_of_8_dims():
    rng = np.random.default_rng(5)
    for h, w in [(1, 1), (7, 9), (17, 3), (8, 13)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=85))
        assert dec is not None
        assert (dec[0], dec[1]) == (w, h)
        assert dec[2].shape == (h, w)


def test_sniffer_reads_real_scans():
    from swiftsoup_spark.ops.imagehdr import sniff_image
    img = np.zeros((10, 20), dtype=np.uint8)
    assert sniff_image(encode_jpeg(img)) == ("jpeg", 20, 10)


def test_decode_bails_cleanly():
    img = np.full((8, 8), 77, dtype=np.uint8)
    good = encode_jpeg(img)
    assert decode_jpeg(good[:30]) is None          # truncated headers
    assert decode_jpeg(good[:-6]) is None or True  # truncated scan: no raise
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg(b"not a jpeg") is None
    # marker-shell payloads (the old synth) are not decodable scans
    from swiftsoup_spark.ops.imagehdr import encode_jpeg_shell
    assert decode_jpeg(encode_jpeg_shell(8, 8, b"\x00" * 16)) is None


def test_decode_never_raises_on_garbage():
    import random
    rnd = random.Random(42)
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_jpeg(img)
    for _ in range(800):
        blob = bytearray(good)
        for _ in range(rnd.randrange(1, 6)):
            blob[rnd.randrange(len(blob))] = rnd.randrange(256)
        r = decode_jpeg(bytes(blob))
        assert r is None or r[2].shape == (r[1], r[0])
