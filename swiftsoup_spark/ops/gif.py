"""From-scratch GIF87a codec (grayscale), stdlib+numpy only.

Fourth and final real decode path for the image corpus (after PNG,
BMP, JPEG): variable-width LSB-first LZW per the GIF spec, 256-entry
grayscale global color table. LZW is lossless, so — unlike JPEG —
decoded pixels ARE oracle-replayable and the GIF rows of the synth
corpus can sit behind the same hash gates as PNG/BMP.

The encoder uses the classic "uncompressed GIF" technique: every
pixel is emitted as its 9-bit literal code, with a CLEAR code injected
before the decoder's table would force a width increase — valid LZW
that any conformant decoder reads, with none of the patent-era
dictionary machinery. The decoder is a GENERAL LZW decoder (dictionary
growth, width bumps at 2^w, the KwKwK self-reference case) — it
decodes any single-frame non-interlaced GIF, not just our encoder's
output, and bails to None (never raises, never wrong) on interlace,
missing color tables, or truncation."""

from __future__ import annotations

import struct

import numpy as np

_CLEAR = 256
_EOI = 257


def encode_gif(arr) -> bytes:
    """(h, w) uint8 grayscale -> single-frame GIF87a bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    lsd = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    gct = bytes(v for i in range(256) for v in (i, i, i))
    imgdesc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)

    # LZW, LSB-first bit packing, fixed 9-bit codes + periodic CLEAR
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(_CLEAR)
    since_clear = 0
    for px in a.reshape(-1):
        if since_clear == 200:  # table at 258+199 < 512: width never bumps
            put(_CLEAR)
            since_clear = 0
        put(int(px))
        since_clear += 1
    put(_EOI)
    if nbits:
        out.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator

    return (b"GIF87a" + lsd + gct + imgdesc + b"\x08"  # min code size 8
            + bytes(blocks) + b"\x3b")


def decode_gif(data: bytes):
    """Single-frame non-interlaced GIF -> (w, h, (h, w) uint8 grey
    array via the red palette channel), or None when out of
    scope/malformed (never raises)."""
    try:
        return _decode(data)
    except Exception:
        return None


def _decode(data: bytes):
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    # skip extension blocks to the first image descriptor
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:
            break
        elif b == 0x3B:
            return None  # trailer before any image
        else:
            return None
        continue
    if pos + 10 > len(data) or data[pos] != 0x2C:
        return None
    _l, _t, w, h, ipack = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
    pos += 10
    if ipack & 0x40:
        return None  # interlaced out of scope
    pal = gct
    if ipack & 0x80:
        n = 2 << (ipack & 0x07)
        pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    if pal is None or w <= 0 or h <= 0 or w * h > 64 * 1024 * 1024:
        return None
    min_code = data[pos]
    pos += 1
    if not 2 <= min_code <= 8:
        return None
    # concatenate sub-blocks
    stream = bytearray()
    while True:
        if pos >= len(data):
            return None
        ln = data[pos]
        pos += 1
        if ln == 0:
            break
        stream += data[pos:pos + ln]
        pos += ln

    clear = 1 << min_code
    eoi = clear + 1
    acc = 0
    nbits = 0
    spos = 0
    width = min_code + 1
    table = None
    prev = None
    out = []

    def reset():
        nonlocal width, table, prev
        width = min_code + 1
        table = [(i,) for i in range(clear)] + [None, None]
        prev = None

    reset()
    need = w * h
    while len(out) < need:
        while nbits < width:
            if spos >= len(stream):
                return None
            acc |= stream[spos] << nbits
            spos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            return None  # EOI before enough pixels
        if prev is None:
            if code >= len(table) or table[code] is None:
                return None
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            if len(table) < 4096:  # deferred-clear: table just stops growing
                table.append(table[prev] + (entry[0],))
        elif code == len(table) and len(table) < 4096:
            entry = table[prev] + (table[prev][0],)  # KwKwK
            table.append(entry)
        else:
            return None
        out.extend(entry)
        prev = code
        if len(table) == (1 << width) and width < 12:
            width += 1
    idx = np.array(out[:need], dtype=np.int64)
    if np.any(idx >= pal.shape[0]):
        return None
    grey = pal[idx, 0].astype(np.uint8).reshape(h, w)
    return w, h, grey
