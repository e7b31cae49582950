"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real Spark-side plumbing (schema, Arrow batching, mapInPandas batch shape)
with a STUBBED decode: the container has no image/audio codecs, so the
"decode" derives a deterministic fake payload (md5 bytes of the text).
Swap ``_fake_decode`` for a real PIL/ffmpeg call on a cluster with codecs —
the batch contract (binary in, fixed-width float features out) is what the
engine guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def synth_image_table(docs_df):
    """Documents -> opaque binary 'image' column + typed metadata.
    Deterministic: payload = md5 digest bytes, dims derived from doc_id."""
    return docs_df.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        (1 + F.col("doc_id") % 64).cast("int").alias("width"),
        (1 + F.col("doc_id") % 48).cast("int").alias("height"),
        F.when(F.col("doc_id") % 2 == 0, "png").otherwise("jpeg").alias("format"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """STUB decode: real deployments replace this with PIL/libvips; here we
    emit a deterministic 8-dim feature from the payload bytes."""
    if payload is None:
        return []
    return [b / 255.0 for b in payload[:8]]


def image_features(img_df):
    """mapInPandas feature extraction: binary -> fixed-width float vector.
    One Arrow batch per call; decode loop stays inside the batch."""
    def batches(it):
        import pandas as pd

        for pdf in it:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "features": feats,
            })

    return img_df.mapInPandas(batches, FEATURE_SCHEMA)
