"""From-scratch image *container* parsing: format + dimension sniffing
for PNG / JPEG(JFIF) / GIF / BMP from payload bytes alone, plus a REAL
24-bit BMP codec (the one raster format whose pixel data needs no
compression codec — stdlib only).

This is the metadata pass a corpus pipeline runs over billions of
crawled images before any pixel work: genuine chunk/marker walking
(PNG IHDR, JPEG SOFn marker scan with fill-byte and stuffing rules,
GIF logical-screen descriptor, BMP DIB headers incl. the 12-byte core
header and top-down negative heights) — never a filename extension or
a metadata column.  All formats are public specs: PNG (RFC 2083 /
W3C), JPEG JFIF (ITU T.81 §B), GIF87a/89a, BMP (Windows DIB).

Scope boundary, stated plainly: JPEG/GIF *entropy* decode needs a
codec this sandbox lacks, so only their containers parse here; PNG
(``ops/png.py``) and BMP (below) decode pixels for real.  The synth
writers emit structurally-valid containers — for JPEG that means a
marker stream whose scan section is byte-stuffed payload (valid to
every marker walker, not a real Huffman scan), which is exactly what
the sniffer is allowed to depend on."""

from __future__ import annotations

import struct

import numpy as np

from swiftsoup_spark.ops.png import parse_ihdr

# JPEG markers without a length segment (ITU T.81 B.1.1.3): TEM,
# RSTn, SOI, EOI.  SOFn = C0-CF minus DHT(C4) / JPG(C8) / DAC(CC).
_JPEG_NO_LEN = {0x01, 0xD0, 0xD1, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7,
                0xD8, 0xD9}
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def _sniff_jpeg(data: bytes):
    """Walk the marker stream to the first SOFn frame header and read
    (height, width) from it (T.81 B.2.2: Lf P Y X ...).  Dimensions
    always precede the scan, so hitting SOS first means malformed.
    Fill bytes (extra 0xFFs before a marker, B.1.1.2) are legal and
    skipped."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    pos = 2
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            return None  # garbage between segments
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        if pos + 1 >= n:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker in _JPEG_NO_LEN:
            if marker == 0xD9:  # EOI before any SOF
                return None
            continue
        if pos + 2 > n:
            return None
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        if seglen < 2 or pos + seglen > n:
            return None
        if marker in _JPEG_SOF:
            if seglen < 7:
                return None
            h, w = struct.unpack(">HH", data[pos + 3:pos + 7])
            if w <= 0 or h <= 0:
                return None
            return w, h
        if marker == 0xDA:  # SOS without a preceding SOF
            return None
        pos += seglen
    return None


def _sniff_gif(data: bytes):
    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", data[6:10])
    if w <= 0 or h <= 0:
        return None
    return w, h


def _sniff_bmp(data: bytes):
    """BMP dims from the DIB header: 12-byte BITMAPCOREHEADER uses
    unsigned 16-bit dims; every later version (40/52/56/108/124) uses
    signed 32-bit, negative height meaning top-down row order."""
    if len(data) < 26 or data[:2] != b"BM":
        return None
    dib = struct.unpack("<I", data[14:18])[0]
    if dib == 12:
        w, h = struct.unpack("<HH", data[18:22])
    elif dib >= 40 and len(data) >= 14 + 40:
        w, h = struct.unpack("<ii", data[18:26])
        h = abs(h)
    else:
        return None
    if w <= 0 or h <= 0:
        return None
    return w, h


def sniff_image(data):
    """(format, width, height) parsed from the container bytes, or
    None when the payload is not a recognized/parseable image."""
    if not data:
        return None
    hdr = parse_ihdr(bytes(data))
    if hdr is not None:
        return ("png", hdr[0], hdr[1])
    for fmt, fn in (("jpeg", _sniff_jpeg), ("gif", _sniff_gif),
                    ("bmp", _sniff_bmp)):
        r = fn(bytes(data))
        if r is not None:
            return (fmt, r[0], r[1])
    return None


# --- synth container writers -------------------------------------------------

def encode_jpeg_shell(width: int, height: int, payload: bytes) -> bytes:
    """Structurally-valid JFIF marker stream carrying ``payload`` as
    the (byte-stuffed) scan section: SOI, APP0/JFIF, DQT, SOF0 (one
    8-bit component), DHT, SOS, stuffed payload, EOI.  Every marker
    walker parses it (that is what the sniffer gate exercises); it is
    NOT a decodable Huffman scan — see module docstring."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(range(1, 65))  # table 0, 64 8-bit entries
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    dht = b"\x00" + bytes(16) + b""  # class0/table0, zero codes
    sos = b"\x01\x01\x00" + b"\x00\x3f\x00"
    stuffed = payload.replace(b"\xff", b"\xff\x00")
    out = [b"\xff\xd8",
           b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0,
           b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt,
           b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0,
           b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht,
           b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos,
           stuffed, b"\xff\xd9"]
    return b"".join(out)


def encode_gif_shell(width: int, height: int, payload: bytes) -> bytes:
    """GIF89a header + logical screen descriptor (no global color
    table) + one comment-extension block carrying ``payload`` + the
    trailer.  Valid container, no LZW image data — see module
    docstring."""
    if len(payload) > 255:
        raise ValueError("payload > one sub-block")
    lsd = struct.pack("<HHBBB", width, height, 0, 0, 0)
    comment = b"\x21\xfe" + bytes([len(payload)]) + payload + b"\x00"
    return b"GIF89a" + lsd + comment + b"\x3b"


def encode_bmp(arr) -> bytes:
    """REAL 24-bit uncompressed BMP from an (h, w) uint8 grey array:
    BITMAPFILEHEADER + BITMAPINFOHEADER(40) + bottom-up BGR rows padded
    to 4 bytes.  Fully decodable by any BMP reader."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, 0:w * 3:3] = a
    rows[:, 1:w * 3:3] = a
    rows[:, 2:w * 3:3] = a
    pix = rows[::-1].tobytes()  # bottom-up
    off = 14 + 40
    filehdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    infohdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                          2835, 2835, 0, 0)
    return filehdr + infohdr + pix


def decode_bmp(data: bytes):
    """24-bit uncompressed BMP -> (width, height, (h, w) uint8 grey
    array taken from the blue channel), handling bottom-up (h>0) and
    top-down (h<0) row orders; None when not in-scope (compressed,
    paletted, other depths, truncated)."""
    if len(data) < 14 + 40 or data[:2] != b"BM":
        return None
    off = struct.unpack("<I", data[10:14])[0]
    dib, w, h_raw, _planes, bpp, comp = struct.unpack(
        "<IiiHHI", data[14:34])
    if dib < 40 or bpp != 24 or comp != 0 or w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    if off + stride * h > len(data):
        return None
    rows = np.frombuffer(data, dtype=np.uint8,
                         count=stride * h, offset=off).reshape(h, stride)
    grey = rows[:, 0:w * 3:3]  # blue channel
    if h_raw > 0:
        grey = grey[::-1]
    return w, h, np.ascontiguousarray(grey)
