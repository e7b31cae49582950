"""From-scratch baseline JPEG codec (ITU T.81), grayscale, numpy only.

Third real codec after PNG (``ops/png.py``) and BMP
(``ops/imagehdr.py``): baseline sequential DCT, one 8-bit component,
the Annex K luminance quantization + Huffman tables, libjpeg-style
quality scaling. The encoder exists so the synth corpus carries
GENUINE scans (not marker shells); the decoder exists so the
multimodal feature path decodes real web-format payloads.

Honest evidence boundary, stated plainly: JPEG is lossy and T.81
leaves IDCT precision implementation-defined, so decoded pixels are
NOT closed-form oracle-replayable the way PNG/BMP pixels are — the
decode path is pytest-gated (round-trip error bounds, DC-exactness on
constant blocks, pure-math DCT/IDCT identity, stuffing/garbage fuzz)
rather than hash-gated. Container metadata stays hash-gated through
``image_sniff``.

Scope kept deliberately tight (every bail is None, never wrong):
baseline SOF0, single component, no subsampling, no restart
intervals, no progressive decode, 8-bit precision.
"""

from __future__ import annotations

import struct

import numpy as np

# --- T.81 Annex K tables -----------------------------------------------------

# K.1 luminance quantization, natural (row-major) order
K_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

# zigzag scan order -> natural index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# K.3.1 DC luminance: BITS (codes per length 1..16) and HUFFVAL
K_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
K_DC_VALS = list(range(12))
# K.3.2 AC luminance
K_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
K_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# --- DCT (type-II orthonormal matrix form; IDCT is the transpose) ------------

_X = np.arange(8)
_A = np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16) / 2.0
_A[0, :] *= 1 / np.sqrt(2)


def dct2(block):
    """2-D type-II DCT of an 8x8 float block (JPEG convention)."""
    return _A @ block @ _A.T


def idct2(coef):
    """Exact inverse of :func:`dct2` (orthonormal transpose)."""
    return _A.T @ coef @ _A


def quality_qt(quality: int = 75):
    """Annex K luminance table scaled by libjpeg's quality convention."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt = (K_QT_LUMA * scale + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int64)


# --- canonical Huffman construction (T.81 C.2) -------------------------------

def _huff_codes(bits, vals):
    """value -> (code, length) from BITS/HUFFVAL."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """(code, length) -> value, for the bit-at-a-time decoder."""
    return {cl: v for v, cl in _huff_codes(bits, vals).items()}


# --- bit I/O with 0xFF byte stuffing -----------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise EOFError
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise EOFError
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                raise EOFError  # a real marker ends the scan
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _category(v: int):
    """JPEG magnitude category: (size, appended bits)."""
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    """Inverse of _category (T.81 F.2.2.1 EXTEND)."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


# --- encoder -----------------------------------------------------------------

def encode_jpeg(arr, quality: int = 75) -> bytes:
    """(h, w) uint8 grayscale -> baseline JFIF bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt = quality_qt(quality)
    qt_nat = qt.reshape(8, 8)
    ph = (h + 7) & ~7
    pw = (w + 7) & ~7
    img = np.empty((ph, pw), dtype=np.float64)
    img[:h, :w] = a
    img[h:, :w] = a[h - 1:h, :]  # edge replicate
    img[:, w:] = img[:, w - 1:w]
    img -= 128.0

    dc_codes = _huff_codes(K_DC_BITS, K_DC_VALS)
    ac_codes = _huff_codes(K_AC_BITS, K_AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            coef = dct2(img[by:by + 8, bx:bx + 8])
            q = np.round(coef / qt_nat).astype(np.int64)
            zz = q.reshape(-1)[ZIGZAG]
            # DC
            s, bits = _category(int(zz[0]) - prev_dc)
            prev_dc = int(zz[0])
            c, ln = dc_codes[s]
            bw.write(c, ln)
            if s:
                bw.write(bits, s)
            # AC
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                if k > last_nz:
                    break
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw.write(c, ln)
                    run -= 16
                s, bits = _category(v)
                c, ln = ac_codes[(run << 4) | s]
                bw.write(c, ln)
                bw.write(bits, s)
                run = 0
            if last_nz < 63:
                c, ln = ac_codes[0x00]  # EOB
                bw.write(c, ln)
    scan = bw.flush()

    qt_zz = qt[ZIGZAG]  # DQT stores zigzag order
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(int(x) for x in qt_zz)
    sof0 = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    dht = (b"\x00" + bytes(K_DC_BITS) + bytes(K_DC_VALS)
           + b"\x10" + bytes(K_AC_BITS) + bytes(K_AC_VALS))
    sos = b"\x01\x01\x00" + b"\x00\x3f\x00"

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", 2 + len(payload)) + payload

    return (b"\xff\xd8" + seg(0xE0, app0) + seg(0xDB, dqt)
            + seg(0xC0, sof0) + seg(0xC4, dht) + seg(0xDA, sos)
            + scan + b"\xff\xd9")


# --- decoder -----------------------------------------------------------------

def decode_jpeg(data: bytes):
    """Baseline grayscale JFIF -> (w, h, (h, w) uint8 array), or None
    when out of scope/malformed (never raises on garbage)."""
    try:
        return _decode(data)
    except Exception:
        return None


def _decode(data: bytes):
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    pos = 2
    qts = {}
    dc_tab = {}
    ac_tab = {}
    dims = None
    qt_id = None
    dc_id = ac_id = None
    while pos + 3 < len(data):
        if data[pos] != 0xFF:
            return None
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            return None  # EOI before scan
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        if seglen < 2 or pos + seglen > len(data):
            return None
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT, possibly several tables
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables out of scope
                tbl = np.frombuffer(body[i + 1:i + 65],
                                    dtype=np.uint8).astype(np.int64)
                if tbl.size != 64:
                    return None
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # undo zigzag storage
                qts[tq] = nat.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT, possibly several tables
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                if len(vals) != n:
                    return None
                (dc_tab if tc == 0 else ac_tab)[th] = \
                    _huff_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # baseline SOF0 only
            if len(body) < 8 or body[0] != 8:
                return None
            hgt, wid = struct.unpack(">HH", body[1:5])
            if body[5] != 1:
                return None  # single component only
            if body[7] != 0x11:
                return None  # no subsampling
            qt_id = body[8]
            dims = (wid, hgt)
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # progressive/extended out of scope
        elif marker == 0xDD:
            return None  # restart intervals out of scope
        elif marker == 0xDA:  # SOS
            if dims is None or len(body) < 4 or body[0] != 1:
                return None
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            pos += seglen
            break
        pos += seglen
    else:
        return None
    if (dims is None or qt_id not in qts
            or dc_id not in dc_tab or ac_id not in ac_tab):
        return None
    w, h = dims
    if w <= 0 or h <= 0 or w * h > 64 * 1024 * 1024:
        return None
    qt = qts[qt_id]
    dct_ = dc_tab[dc_id]
    act = ac_tab[ac_id]
    br = _BitReader(data, pos)

    def read_code(table):
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | br.bit()
            ln += 1
            v = table.get((code, ln))
            if v is not None:
                return v
        raise EOFError

    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    out = np.empty((ph, pw), dtype=np.float64)
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = np.zeros(64, dtype=np.int64)
            s = read_code(dct_)
            diff = _extend(br.bits(s), s) if s else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = read_code(act)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = rs >> 4, rs & 0x0F
                k += run
                if k > 63 or size == 0:
                    return None
                zz[k] = _extend(br.bits(size), size)
                k += 1
            coef = np.empty(64, dtype=np.int64)
            coef[ZIGZAG] = zz
            block = idct2(coef.reshape(8, 8) * qt) + 128.0
            out[by:by + 8, bx:bx + 8] = block
    pix = np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)
    return w, h, pix
