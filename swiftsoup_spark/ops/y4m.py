"""From-scratch YUV4MPEG2 (.y4m) parser — real video decode for the
multimodal path.

Y4M is the uncompressed video interchange container (the format
ffmpeg/mjpegtools pipe raw video through): an ASCII stream header
(``YUV4MPEG2 W.. H.. F.. ...``), then ``FRAME`` markers each followed
by raw planes. Parsing it correctly IS the decode — the video
analogue of WAV/BMP, from the public mjpegtools spec, losslessly
oracle-replayable. Compressed codecs (h264/vp9/av1) stay documented
stubs; this module bounds that stub to "everything except the
uncompressed container".

Scope: colourspace ``Cmono`` (luma plane only) and ``C420``-family
(luma + half-size chroma, luma returned); interlacing tokens accepted
but only parsed, frame parameters on FRAME lines rejected (never
wrong)."""

from __future__ import annotations

import numpy as np


def encode_y4m(frames, fps: str = "25:1") -> bytes:
    """List of (h, w) uint8 luma arrays -> Cmono Y4M bytes."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 Cmono\n".encode()]
    for f in frames:
        a = np.ascontiguousarray(f, dtype=np.uint8)
        if a.shape != (h, w):
            raise ValueError("frame size mismatch")
        out.append(b"FRAME\n")
        out.append(a.tobytes())
    return b"".join(out)


def decode_y4m(data: bytes):
    """Y4M bytes -> (w, h, [(h, w) uint8 luma arrays]), or None when
    out of scope/malformed (never raises)."""
    try:
        return _decode(data)
    except Exception:
        return None


def _decode(data: bytes):
    if not data.startswith(b"YUV4MPEG2"):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    cspace = b"420"  # spec default when no C token
    for tok in data[9:nl].split(b" "):
        if not tok:
            continue
        k, v = tok[:1], tok[1:]
        if k == b"W":
            w = int(v)
        elif k == b"H":
            h = int(v)
        elif k == b"C":
            cspace = v
    if not w or not h or w <= 0 or h <= 0 or w * h > 64 * 1024 * 1024:
        return None
    if cspace == b"mono":
        fsize = w * h
    elif cspace.startswith(b"420"):
        if w % 2 or h % 2:
            return None
        fsize = w * h + 2 * ((w // 2) * (h // 2))
    else:
        return None  # 422/444/... out of scope
    frames = []
    pos = nl + 1
    while pos < len(data):
        if data[pos:pos + 5] != b"FRAME":
            return None
        fnl = data.find(b"\n", pos)
        if fnl < 0 or fnl != pos + 5:  # frame parameters out of scope
            return None
        pos = fnl + 1
        if pos + fsize > len(data):
            return None  # truncated frame
        luma = np.frombuffer(data, np.uint8, w * h, pos).reshape(h, w)
        frames.append(luma.copy())
        pos += fsize
    if not frames:
        return None
    return w, h, frames
