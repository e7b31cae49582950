"""From-scratch RIFF/WAV PCM16 codec — real audio decode for the
multimodal path.

WAV is the uncompressed audio container: a correct RIFF chunk walk +
PCM sample interpretation IS the decode (no codec mathematics), which
makes it the audio analogue of BMP — fully implementable from the
public spec with stdlib struct, and losslessly oracle-replayable.
Compressed codecs (mp3/aac/opus) stay documented stubs in
``ops/multimodal.py``; this module bounds that stub to "everything
except the uncompressed container".

Decoder scope (bails None, never wrong): format tag 1 (PCM) with 16
bits per sample, any channel count/rate, chunk walk tolerant of extra
chunks (LIST/fact/cue) before and after ``data``."""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 samples -> WAV bytes (PCM16 LE)."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()  # interleaved row-major == frame-major
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """WAV bytes -> (rate, n_channels, (n, ch) int16 array), or None
    when not in-scope PCM16 / malformed (never raises)."""
    try:
        return _decode(data)
    except Exception:
        return None


def _decode(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        ln = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body_end = pos + 8 + ln
        if body_end > len(data):
            return None
        if cid == b"fmt ":
            if ln < 16:
                return None
            fmt = struct.unpack("<HHIIHH", data[pos + 8:pos + 24])
        elif cid == b"data":
            pcm = data[pos + 8:body_end]
        pos = body_end + (ln & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        return None
    tag, ch, rate, _br, _ba, bits = fmt
    if tag != 1 or bits != 16 or ch < 1 or rate <= 0:
        return None
    n = len(pcm) // (2 * ch)
    if n == 0:
        return None
    a = np.frombuffer(pcm, dtype="<i2", count=n * ch).reshape(n, ch)
    return rate, ch, a
