"""From-scratch PNG codec (ops/png.py): encode/decode round trip, all
five row filters, color types, and bail conditions."""

import struct
import zlib

import numpy as np
import pytest

from swiftsoup_spark.ops.png import (
    _SIG, _chunk, decode_png, encode_png, parse_ihdr)


def test_roundtrip_gray():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 5), (48, 64), (17, 2)]:
        a = rng.randint(0, 256, (h, w)).astype(np.uint8)
        data = encode_png(a)
        got = decode_png(data)
        assert got is not None
        gw, gh, ch, arr = got
        assert (gw, gh, ch) == (w, h, 1)
        assert np.array_equal(arr[:, :, 0], a)


def test_parse_ihdr_cheap():
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert parse_ihdr(encode_png(a)) == (4, 3, 8, 0)
    assert parse_ihdr(b"notapng") is None
    assert parse_ihdr(b"") is None
    assert parse_ihdr(None) is None


def _make_png(arr, ctype, filters):
    """Hand-build a PNG applying the given filter type per row — the
    encoder only writes filter 0, so the decoder's filter coverage
    needs handcrafted inputs."""
    h, w, ch = arr.shape
    stride = w * ch
    prev = np.zeros(stride, dtype=np.int32)
    out = bytearray()
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        enc = row.copy()
        if f == 1:
            for x in range(stride - 1, ch - 1, -1):
                enc[x] = (row[x] - row[x - ch]) % 256
        elif f == 2:
            enc = (row - prev) % 256
        elif f == 3:
            for x in range(stride - 1, -1, -1):
                left = row[x - ch] if x >= ch else 0
                enc[x] = (row[x] - ((left + prev[x]) >> 1)) % 256
        elif f == 4:
            for x in range(stride - 1, -1, -1):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (row[x] - pr) % 256
        out.append(f)
        out.extend(int(v) & 0xFF for v in enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (6, 4)])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
def test_decode_all_filters_and_ctypes(ctype, ch, filters):
    rng = np.random.RandomState(ctype * 10 + filters[0])
    arr = rng.randint(0, 256, (6, 5, ch)).astype(np.uint8)
    data = _make_png(arr, ctype, filters)
    got = decode_png(data)
    assert got is not None
    w, h, gch, dec = got
    assert (w, h, gch) == (5, 6, ch)
    assert np.array_equal(dec, arr)


def test_multi_idat():
    a = np.arange(20, dtype=np.uint8).reshape(4, 5)
    raw = np.empty((4, 6), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a
    comp = zlib.compress(raw.tobytes())
    ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 0, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", comp[:7])
            + _chunk(b"IDAT", comp[7:]) + _chunk(b"IEND", b""))
    got = decode_png(data)
    assert got is not None and np.array_equal(got[3][:, :, 0], a)


def test_bails_never_wrong():
    a = np.zeros((2, 2), dtype=np.uint8)
    ok = encode_png(a)
    # 16-bit depth
    bad = bytearray(ok)
    bad[24] = 16
    assert decode_png(bytes(bad)) is None
    # paletted
    bad = bytearray(ok)
    bad[25] = 3
    assert decode_png(bytes(bad)) is None
    # interlaced
    bad = bytearray(ok)
    bad[28] = 1
    assert decode_png(bytes(bad)) is None
    # corrupt zlib
    bad = bytearray(ok)
    bad[45] ^= 0xFF
    assert decode_png(bytes(bad)) is None
    # truncated
    assert decode_png(ok[:40]) is None
    assert decode_png(b"\x00" * 60) is None
