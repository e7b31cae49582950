"""From-scratch stdlib PNG codec (W3C PNG spec / RFC 2083; no external
codec libraries — same discipline as the PDF parser in ``pdftext.py``).

Scope: what a training-data pipeline's image plumbing needs —
``decode_png`` reads baseline 8-bit greyscale / RGB / RGBA (color types
0, 2, 6), all five row filters, multi-IDAT streams; ``encode_png``
writes 8-bit greyscale. Interlaced (Adam7), paletted, and 16-bit images
return None (bail, never wrong — callers fall back to the documented
stub path). Pure numpy row loop: one pass per row for unfiltering
(inherently sequential per spec), vectorized within the row.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def encode_png(arr) -> bytes:
    """8-bit greyscale PNG from an (h, w) uint8 array. Deterministic:
    fixed zlib level, filter 0 on every row."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # prepend filter byte 0 to each row
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a
    idat = zlib.compress(raw.tobytes(), 6)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def parse_ihdr(data: bytes):
    """(width, height, bit_depth, color_type) from the IHDR chunk, or
    None when the payload is not a PNG. Cheap — no decompression."""
    if not data or not data.startswith(_SIG) or len(data) < 33:
        return None
    if data[12:16] != b"IHDR":
        return None
    w, h, depth, ctype = struct.unpack(">IIBB", data[16:26])
    return w, h, depth, ctype


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert PNG row filters. ``raw`` is (h, 1+stride) with the filter
    byte leading each row; returns (h, stride) uint8. Filters per the
    spec §6: 0 none, 1 sub, 2 up, 3 average, 4 paeth."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(h):
        f = raw[y, 0]
        row = raw[y, 1:].astype(np.intp)
        if f == 0:
            pass
        elif f == 1:
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif f == 2:
            row = (row + prev) & 0xFF
        elif f == 3:
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                row[x] = (row[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out


def decode_png(data: bytes):
    """PNG bytes -> (width, height, channels, (h, w, channels) uint8
    array), or None when not a decodable-in-scope PNG (wrong signature,
    interlaced, paletted, 16-bit, truncated, corrupt zlib)."""
    hdr = parse_ihdr(data)
    if hdr is None:
        return None
    w, h, depth, ctype = hdr
    if depth != 8 or ctype not in (0, 2, 6) or w <= 0 or h <= 0:
        return None
    interlace = data[28]
    if interlace != 0:
        return None
    channels = {0: 1, 2: 3, 6: 4}[ctype]
    # walk chunks, concatenating IDAT payloads
    pos, idat = 33, []
    n = len(data)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            return None
        if tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if not idat:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) != h * (1 + stride):
        return None
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    try:
        flat = _unfilter(rows, h, stride, channels)
    except ValueError:
        return None
    return w, h, channels, flat.reshape(h, w, channels)
