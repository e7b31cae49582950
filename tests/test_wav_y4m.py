"""RIFF/WAV PCM16 + YUV4MPEG2 codecs: round trips, chunk tolerance,
bail cases, garbage fuzz."""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.wav import decode_wav, encode_wav
from swiftsoup_spark.ops.y4m import decode_y4m, encode_y4m


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(2)
    mono = rng.integers(-32768, 32768, size=100, dtype=np.int16)
    r, ch, a = decode_wav(encode_wav(mono, 8000))
    assert (r, ch) == (8000, 1) and np.array_equal(a[:, 0], mono)
    stereo = rng.integers(-32768, 32768, size=(50, 2), dtype=np.int16)
    r, ch, a = decode_wav(encode_wav(stereo, 44100))
    assert (r, ch) == (44100, 2) and np.array_equal(a, stereo)


def test_wav_extra_chunks_tolerated():
    mono = np.arange(10, dtype=np.int16)
    b = encode_wav(mono, 16000)
    # splice a LIST chunk (odd length -> exercises word-align padding)
    # between 'fmt ' and 'data'
    fmt_end = 12 + 8 + 16
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = b[:fmt_end] + lst + b[fmt_end:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    dec = decode_wav(patched)
    assert dec is not None and np.array_equal(dec[2][:, 0], mono)


def test_wav_bails():
    mono = np.arange(4, dtype=np.int16)
    good = encode_wav(mono, 8000)
    assert decode_wav(good[:20]) is None
    b = bytearray(good)
    b[20] = 3  # format tag != PCM
    assert decode_wav(bytes(b)) is None
    b = bytearray(good)
    b[34] = 8  # 8-bit
    assert decode_wav(bytes(b)) is None
    assert decode_wav(b"RIFFxxxxWAVE") is None
    assert decode_wav(b"") is None


def test_y4m_roundtrip():
    rng = np.random.default_rng(6)
    frames = [rng.integers(0, 256, size=(9, 8), dtype=np.uint8)
              for _ in range(5)]
    dec = decode_y4m(encode_y4m(frames))
    assert dec is not None
    w, h, out = dec
    assert (w, h) == (8, 9) and len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_y4m_c420_luma():
    # hand-built C420 stream: luma plane + two quarter chroma planes
    w, h = 4, 2
    luma = np.arange(8, dtype=np.uint8).reshape(h, w)
    chroma = bytes(2) + bytes(2)
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
    blob = hdr + b"FRAME\n" + luma.tobytes() + chroma
    dec = decode_y4m(blob)
    assert dec is not None and np.array_equal(dec[2][0], luma)


def test_y4m_bails():
    frames = [np.zeros((2, 4), dtype=np.uint8)]
    good = encode_y4m(frames)
    assert decode_y4m(good[:-3]) is None        # truncated frame
    assert decode_y4m(b"YUV4MPEG2 W4 H2\nFRAME") is None
    assert decode_y4m(good.replace(b"Cmono", b"C444p")) is None
    assert decode_y4m(b"") is None
    # frame parameters are out of scope, must bail not misparse
    assert decode_y4m(good.replace(b"FRAME\n", b"FRAME Ix\n")) is None


def test_wav_y4m_never_raise_on_garbage():
    import random
    rnd = random.Random(12)
    gw = encode_wav(np.arange(16, dtype=np.int16), 8000)
    gy = encode_y4m([np.zeros((3, 3), dtype=np.uint8)] * 2)
    for _ in range(600):
        for good, dec in ((gw, decode_wav), (gy, decode_y4m)):
            blob = bytearray(good)
            for _ in range(rnd.randrange(1, 5)):
                blob[rnd.randrange(len(blob))] = rnd.randrange(256)
            dec(bytes(blob))  # any return is fine; raising is not
