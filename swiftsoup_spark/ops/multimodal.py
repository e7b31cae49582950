"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real Spark-side plumbing (schema, Arrow batching, mapInPandas batch
shape) with REAL from-scratch decode paths for every uncompressed or
stdlib-decompressible container: PNG (``ops/png.py``), baseline JPEG
(``ops/jpeg.py``), GIF LZW (``ops/gif.py``), BMP (``ops/imagehdr.py``),
WAV PCM16 (``ops/wav.py``), Y4M video (``ops/y4m.py``).  The documented
STUB boundary is now exactly "compressed audio/video codecs"
(mp3/aac/h264/... — no codec libs in this sandbox): those payloads take
a deterministic fake decode over the raw bytes.  Swap the stub for
ffmpeg/libvips on a cluster with codecs — the batch contract (binary
in, fixed-width features out) is what the engine guarantees either
way."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

PARSED_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("parsed", T.BooleanType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def synth_image_table(docs_df):
    """Documents -> binary 'image' column + typed metadata. PNG rows
    (even doc_id) carry a REAL greyscale PNG whose (height x width)
    pixel grid tiles the md5 digest — pixel(y, x) = digest[(y*width +
    x) mod 16] — so every decoded pixel is replayable from md5(text) in
    SQL; jpeg rows stay an opaque 16-byte digest payload (no stdlib
    jpeg codec — stub path)."""
    import numpy as np
    import pandas as pd

    from swiftsoup_spark.ops.png import encode_png

    base = docs_df.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        (1 + F.col("doc_id") % 64).cast("int").alias("width"),
        (1 + F.col("doc_id") % 48).cast("int").alias("height"),
        F.when(F.col("doc_id") % 2 == 0, "png").otherwise("jpeg").alias("format"),
    )

    def batches(it):
        for pdf in it:
            payloads = []
            for p, w, h, fmt in zip(pdf["payload"], pdf["width"],
                                    pdf["height"], pdf["format"]):
                if fmt == "png":
                    dig = np.frombuffer(p, dtype=np.uint8)
                    idx = (np.arange(int(h) * int(w)) % 16).reshape(
                        int(h), int(w))
                    payloads.append(encode_png(dig[idx]))
                else:
                    payloads.append(bytes(p))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "payload": payloads,
                "width": pdf["width"], "height": pdf["height"],
                "format": pdf["format"]})

    return base.mapInPandas(batches, IMAGE_META_SCHEMA)


SNIFF_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def synth_image_corpus(docs_df):
    """Documents -> a four-format image corpus (doc_id % 4: png, jpeg,
    gif, bmp), every payload genuine encoder output from the four
    from-scratch codecs (ops/png.py, ops/jpeg.py, ops/gif.py,
    ops/imagehdr.py), every one carrying the REAL md5-digest-tiled
    pixel grid (JPEG lossily, the rest exactly).  Dims use the same
    closed doc_id formulas as synth_image_table so oracles replay them
    without parsing."""
    import numpy as np
    import pandas as pd

    from swiftsoup_spark.ops.gif import encode_gif
    from swiftsoup_spark.ops.imagehdr import encode_bmp
    from swiftsoup_spark.ops.jpeg import encode_jpeg
    from swiftsoup_spark.ops.png import encode_png

    base = docs_df.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("digest"),
        (1 + F.col("doc_id") % 64).cast("int").alias("width"),
        (1 + F.col("doc_id") % 48).cast("int").alias("height"),
        (F.col("doc_id") % 4).cast("int").alias("fsel"),
    )

    def batches(it):
        for pdf in it:
            payloads = []
            for d, w, h, sel in zip(pdf["digest"], pdf["width"],
                                    pdf["height"], pdf["fsel"]):
                w, h, d = int(w), int(h), bytes(d)
                dig = np.frombuffer(d, dtype=np.uint8)
                grid = dig[(np.arange(h * w) % 16).reshape(h, w)]
                enc = (encode_png, encode_jpeg, encode_gif,
                       encode_bmp)[sel]
                payloads.append(enc(grid))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return base.mapInPandas(batches, T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]))


def image_sniff(img_df):
    """Container-only metadata pass (format + dims) parsed from payload
    bytes alone — no metadata-column fallback, so a wrong marker walk
    shows up as a wrong/null value, not a silent echo.  mapInPandas,
    one Arrow batch per call."""
    def batches(it):
        import pandas as pd

        from swiftsoup_spark.ops.imagehdr import sniff_image

        for pdf in it:
            fmts, ws, hs = [], [], []
            for p in pdf["payload"]:
                r = sniff_image(p)
                if r is None:
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                else:
                    fmts.append(r[0])
                    ws.append(r[1])
                    hs.append(r[2])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "format": fmts,
                                "width": ws, "height": hs})

    return img_df.mapInPandas(batches, SNIFF_SCHEMA)


DECODE_CHECK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("n_pixels", T.LongType()),
    T.StructField("pixel_sum", T.LongType()),
])


def image_decode_check(img_df):
    """Full pixel decode through whichever codec the payload sniffs as
    (PNG/JPEG/GIF/BMP), emitting the decoded pixel count and the exact
    pixel SUM — for the lossless codecs a value only a byte-correct
    decode produces, closed-form replayable from the synth digest
    formulas (the hash gate for three real decoders at once).
    Undecodable payloads emit nulls, never a metadata echo."""
    def batches(it):
        import pandas as pd

        from swiftsoup_spark.ops.gif import decode_gif
        from swiftsoup_spark.ops.imagehdr import decode_bmp, sniff_image
        from swiftsoup_spark.ops.jpeg import decode_jpeg
        from swiftsoup_spark.ops.png import decode_png

        for pdf in it:
            fmts, npx, sums = [], [], []
            for p in pdf["payload"]:
                p = bytes(p) if p is not None else None
                sn = sniff_image(p)
                dec = None
                if sn is not None:
                    fmt = sn[0]
                    if fmt == "png":
                        d = decode_png(p)
                        dec = (d[0], d[1], d[3][:, :, 0]) if d else None
                    elif fmt == "jpeg":
                        dec = decode_jpeg(p)
                    elif fmt == "gif":
                        dec = decode_gif(p)
                    else:
                        dec = decode_bmp(p)
                if dec is None:
                    fmts.append(sn[0] if sn else None)
                    npx.append(None)
                    sums.append(None)
                else:
                    w, h, grey = dec
                    fmts.append(sn[0])
                    npx.append(w * h)
                    sums.append(int(grey.astype("int64").sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "format": fmts,
                                "n_pixels": npx, "pixel_sum": sums})

    return img_df.mapInPandas(batches, DECODE_CHECK_SCHEMA)


def image_meta(img_df):
    """mapInPandas metadata extraction: dims/format PARSED from the
    payload bytes (PNG IHDR via ops/png.parse_ihdr — cheap, no
    decompression) with the metadata columns as the fallback for
    formats without a stdlib parser. ``parsed`` records which path each
    row took."""
    def batches(it):
        import pandas as pd

        from swiftsoup_spark.ops.png import parse_ihdr

        for pdf in it:
            ws, hs, fmts, parsed = [], [], [], []
            for p, w, h, fmt in zip(pdf["payload"], pdf["width"],
                                    pdf["height"], pdf["format"]):
                hdr = parse_ihdr(bytes(p)) if p is not None else None
                if hdr is not None:
                    ws.append(hdr[0])
                    hs.append(hdr[1])
                    fmts.append("png")
                    parsed.append(True)
                else:
                    ws.append(w)
                    hs.append(h)
                    fmts.append(fmt)
                    parsed.append(False)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "width": ws, "height": hs,
                "format": fmts, "parsed": parsed})

    return img_df.mapInPandas(batches, PARSED_META_SCHEMA)


def _fake_decode(payload: bytes) -> list[float]:
    """STUB decode for formats without a stdlib codec: deterministic
    8-dim feature from the payload bytes."""
    if payload is None:
        return []
    return [b / 255.0 for b in payload[:8]]


def image_features(img_df):
    """mapInPandas feature extraction: binary -> fixed-width float
    vector. PNG, JPEG and BMP payloads REALLY decode (ops/png,
    ops/jpeg, ops/imagehdr) — features are the first 8 pixels / 255
    and n_bytes counts decoded pixels; formats without an in-scope
    codec take the stub over raw payload bytes. One Arrow batch per
    call; the decode loop stays inside the batch."""
    def batches(it):
        import pandas as pd

        from swiftsoup_spark.ops.gif import decode_gif
        from swiftsoup_spark.ops.imagehdr import decode_bmp
        from swiftsoup_spark.ops.jpeg import decode_jpeg
        from swiftsoup_spark.ops.png import decode_png

        for pdf in it:
            feats, nbytes = [], []
            for p in pdf["payload"]:
                if p is None:
                    feats.append([])
                    nbytes.append(0)
                    continue
                dec = decode_png(bytes(p))
                if dec is not None:
                    w, h, _ch, arr = dec
                    flat = arr[:, :, 0].reshape(-1)
                elif (bmp := decode_bmp(bytes(p))) is not None:
                    w, h, grey = bmp
                    flat = grey.reshape(-1)
                elif (jpg := decode_jpeg(bytes(p))) is not None:
                    w, h, grey = jpg
                    flat = grey.reshape(-1)
                elif (gif := decode_gif(bytes(p))) is not None:
                    w, h, grey = gif
                    flat = grey.reshape(-1)
                else:
                    feats.append(_fake_decode(p))
                    nbytes.append(len(p))
                    continue
                feats.append([int(v) / 255.0 for v in flat[:8]])
                nbytes.append(w * h)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": nbytes,
                "features": feats,
            })

    return img_df.mapInPandas(batches, FEATURE_SCHEMA)


# --- audio -------------------------------------------------------------------

AUDIO_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
])

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("frame_energy", T.ArrayType(T.LongType())),
])


def synth_audio_table(docs_df):
    """Documents -> opaque binary 'audio' column + typed metadata.
    Deterministic fake PCM: 64 payload bytes = unhex(repeat(md5, 4))."""
    return docs_df.select(
        "doc_id",
        F.unhex(F.repeat(F.md5("text"), 4)).alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, 16000).otherwise(8000)
         .cast("int").alias("sample_rate"),
        (1 + F.col("doc_id") % 2).cast("int").alias("n_channels"),
    )


def audio_features(audio_df, frame_nibbles: int = 32):
    """mapInPandas frame-energy extraction: binary payload -> per-frame
    integer energy (sum of nibble amplitudes x 31250, i.e. mean*1e6 for
    32-nibble frames — exact integers, so the stub decode itself is
    oracle-replayable from the hex string). Real deployments swap the
    nibble loop for an ffmpeg/soundfile decode; the Arrow batch contract
    (binary in, fixed-width long array out) is what the engine pins."""
    scale = 1000000 // frame_nibbles
    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = {"doc_id": pdf["doc_id"], "n_bytes": [], "n_frames": [],
                    "frame_energy": []}
            for p in pdf["payload"]:
                if p is None:
                    rows["n_bytes"].append(0)
                    rows["n_frames"].append(0)
                    rows["frame_energy"].append([])
                    continue
                hx = p.hex()
                vals = [int(c, 16) for c in hx]
                nf = len(vals) // frame_nibbles
                rows["n_bytes"].append(len(p))
                rows["n_frames"].append(nf)
                rows["frame_energy"].append(
                    [sum(vals[f * frame_nibbles:(f + 1) * frame_nibbles])
                     * scale for f in range(nf)])
            yield pd.DataFrame(rows)

    return audio_df.mapInPandas(batches, AUDIO_FEATURE_SCHEMA)


# --- video -------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_hash", T.StringType()),
])


def synth_video_table(docs_df):
    """Documents -> opaque binary 'video' column (256 fake bytes =
    unhex(repeat(md5, 16))) + fps metadata."""
    return docs_df.select(
        "doc_id",
        F.unhex(F.repeat(F.md5("text"), 16)).alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, 24).otherwise(30)
         .cast("int").alias("fps"),
    )


def video_frame_sample(video_df, every: int = 4, frame_bytes: int = 32):
    """mapInPandas frame sampling: emit every ``every``-th 32-byte
    'frame' as (doc_id, frame_idx, frame_hash) rows — the exploding
    batch shape of a real frame sampler (one input row -> many output
    rows inside the Arrow batch, no Spark-side explode). frame_hash is
    md5 of the frame's hex string, so the DuckDB oracle replays it with
    md5(substr(hex, ...))."""
    def batches(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    continue
                hx = p.hex()
                nf = len(p) // frame_bytes
                for f in range(0, nf, every):
                    chunk = hx[f * frame_bytes * 2:(f + 1) * frame_bytes * 2]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(f)
                    out["frame_hash"].append(
                        hashlib.md5(chunk.encode()).hexdigest())
            yield pd.DataFrame(out)

    return video_df.mapInPandas(batches, VIDEO_FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("pixels", T.ArrayType(T.LongType())),
])


def image_resize(img_df, out_w: int = 4, out_h: int = 3):
    """mapInPandas image resize: binary payload -> fixed ``out_h x
    out_w`` pixel grid (row-major array<long>), nearest-neighbor. PNG
    payloads REALLY decode (ops/png.decode_png: IHDR dims, row
    unfiltering) and resize over the true pixel grid; formats without a
    stdlib codec fall back to the stub grid (pixel(y, x) = payload byte
    at ``(y*width + x) mod len(payload)``). Source coordinates use the
    exact integer map ``y = (i*height) DIV out_h`` / ``x = (j*width)
    DIV out_w`` so the output is bit-identical across partitionings and
    replayable by the DuckDB oracle from the md5 hex string (the synth
    PNG's pixel grid tiles the digest, so decode correctness is itself
    hash-gated). Batch contract: binary + dims in, fixed-width integer
    grid out; indexing vectorized per image, no per-pixel Python."""
    def batches(it):
        import numpy as np
        import pandas as pd

        from swiftsoup_spark.ops.png import decode_png

        oy = np.arange(out_h)
        ox = np.arange(out_w)
        for pdf in it:
            out = {"doc_id": pdf["doc_id"], "width": pdf["width"],
                   "height": pdf["height"], "pixels": []}
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if p is None or len(p) == 0 or w <= 0 or h <= 0:
                    out["pixels"].append([])
                    continue
                dec = decode_png(bytes(p))
                if dec is not None:
                    dw, dh, _ch, arr = dec
                    grid = arr[:, :, 0]
                    ys = (oy * dh) // out_h
                    xs = (ox * dw) // out_w
                    out["pixels"].append(
                        grid[ys[:, None], xs[None, :]]
                        .ravel().astype("int64").tolist())
                    continue
                buf = np.frombuffer(p, dtype=np.uint8)
                ys = (oy * int(h)) // out_h
                xs = (ox * int(w)) // out_w
                idx = (ys[:, None] * int(w) + xs[None, :]) % len(buf)
                out["pixels"].append(
                    buf[idx].ravel().astype("int64").tolist())
            yield pd.DataFrame(out)

    return img_df.mapInPandas(batches, RESIZE_SCHEMA)


# --- real uncompressed-container audio/video (WAV / Y4M) --------------------

WAV_ENERGY_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("energy", T.LongType()),
])

Y4M_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("luma_sum", T.LongType()),
])


def synth_wav_table(docs_df):
    """Documents -> REAL mono PCM16 WAV payloads: 64 samples where
    sample_i = ((b[i%16] * (1 + i//16)) % 256 - 128) * 256 over the
    md5 digest bytes — every sample value is a closed-form function of
    md5(text), so the decoded energies replay exactly in SQL."""
    import numpy as np
    import pandas as pd

    from swiftsoup_spark.ops.wav import encode_wav

    base = docs_df.select(
        "doc_id", F.unhex(F.md5("text")).alias("digest"),
        F.when(F.col("doc_id") % 2 == 0, 16000).otherwise(8000)
         .cast("int").alias("rate"))

    def batches(it):
        for pdf in it:
            payloads = []
            for d, r in zip(pdf["digest"], pdf["rate"]):
                b = np.frombuffer(bytes(d), np.uint8).astype(np.int64)
                i = np.arange(64)
                s = ((b[i % 16] * (1 + i // 16)) % 256 - 128) * 256
                payloads.append(encode_wav(s.astype(np.int16), int(r)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return base.mapInPandas(batches, T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType())]))


def wav_frame_energy(wav_df, frame: int = 16):
    """REAL audio decode (ops/wav.py RIFF walk + PCM16) -> per-frame
    energy sum(|sample|) rows. Undecodable payloads emit no rows."""
    def batches(it):
        import numpy as np
        import pandas as pd

        from swiftsoup_spark.ops.wav import decode_wav

        for pdf in it:
            ids, idxs, es = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                dec = decode_wav(bytes(p)) if p is not None else None
                if dec is None:
                    continue
                _rate, _ch, a = dec
                mono = a[:, 0].astype(np.int64)
                nf = len(mono) // frame
                for f in range(nf):
                    ids.append(doc_id)
                    idxs.append(f)
                    es.append(int(np.abs(
                        mono[f * frame:(f + 1) * frame]).sum()))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "energy": es})

    return wav_df.mapInPandas(batches, WAV_ENERGY_SCHEMA)


def synth_y4m_table(docs_df, n_frames: int = 6, w: int = 8, h: int = 9):
    """Documents -> REAL Cmono Y4M payloads: frame k pixel i =
    digest[(i + k) % 16] over the (h*w)-pixel plane — closed-form
    replayable per frame (h*w=72 is NOT a multiple of 16, so frame
    sums genuinely differ by k)."""
    import numpy as np
    import pandas as pd

    from swiftsoup_spark.ops.y4m import encode_y4m

    base = docs_df.select("doc_id", F.unhex(F.md5("text")).alias("digest"))

    def batches(it):
        for pdf in it:
            payloads = []
            for d in pdf["digest"]:
                b = np.frombuffer(bytes(d), np.uint8)
                i = np.arange(h * w)
                frames = [b[(i + k) % 16].reshape(h, w)
                          for k in range(n_frames)]
                payloads.append(encode_y4m(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return base.mapInPandas(batches, T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType())]))


def y4m_frame_sample(y4m_df, every: int = 2):
    """REAL video decode (ops/y4m.py) + frame sampling: every
    ``every``-th frame's luma sum. Undecodable payloads emit no rows."""
    def batches(it):
        import numpy as np
        import pandas as pd

        from swiftsoup_spark.ops.y4m import decode_y4m

        for pdf in it:
            ids, idxs, sums = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                dec = decode_y4m(bytes(p)) if p is not None else None
                if dec is None:
                    continue
                _w, _h, frames = dec
                for k in range(0, len(frames), every):
                    ids.append(doc_id)
                    idxs.append(k)
                    sums.append(int(frames[k].astype(np.int64).sum()))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "luma_sum": sums})

    return y4m_df.mapInPandas(batches, Y4M_FRAME_SCHEMA)
