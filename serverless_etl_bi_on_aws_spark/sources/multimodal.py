"""Multimodal columns (north-star X4): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas functions.

Data model: a ``media`` struct column
    media: struct<payload: binary, mime: string, width: int, height: int,
                  duration_ms: int>
Payloads stay opaque to the engine — the 100 TB design point keeps decode
out of the scan (no codec work during shuffles/joins; only the final
mapInPandas stage touches bytes, and it streams Arrow batches so peak memory
is one batch per core, not one file per row).

No image/audio libraries ship in this container, so the *decode* steps are
deterministic stubs (clearly marked); everything Spark-side — schema,
batching, partitioning, UDF signatures — is real and tested. Swap the stub
body for PIL/ffmpeg calls in production; the plumbing does not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_STRUCT = StructType(
    [
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

#: set True only when a real decoder (PIL/ffmpeg) is wired in
REAL_DECODERS_AVAILABLE = False


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", mime: str = "image/png") -> DataFrame:
    """Attach a deterministic synthetic ``media`` struct keyed on ``id_col``
    — the test stand-in for 'payload fetched from object storage by path'.
    Pure JVM expressions: payload = utf8 bytes of a seeded string, dims
    derived from the key."""
    key = F.col(id_col).cast("bigint")
    return df.withColumn(
        "media",
        F.struct(
            F.encode(F.concat(F.lit("payload:"), key.cast("string")), "UTF-8").alias("payload"),
            F.lit(mime).alias("mime"),
            (F.pmod(key, F.lit(64)) + 32).cast("int").alias("width"),
            (F.pmod(key * 7, F.lit(64)) + 32).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def decode_and_resize(
    df: DataFrame, target_w: int = 32, target_h: int = 32, media_col: str = "media"
) -> DataFrame:
    """Decode + resize over Arrow batches (mapInPandas). Output adds
    ``pixels: binary`` (row-major grayscale) and ``out_w/out_h``.

    STUB decode: with no codec libs in the image, pixels are a deterministic
    function of the payload bytes (so tests are stable). A real deployment
    replaces ``_fake_decode`` with PIL and keeps this exact batch shape.
    """
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("pixels", BinaryType(), True),
            StructField("out_w", IntegerType(), True),
            StructField("out_h", IntegerType(), True),
        ]
    )

    def _fake_decode(payload: bytes, w: int, h: int) -> bytes:
        if REAL_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")
        # deterministic fake: tile the payload bytes to w*h "pixels"
        if payload is None:
            return None
        reps = (w * h) // max(len(payload), 1) + 1
        return (payload * reps)[: w * h]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = pdf[media_col]
            pdf = pdf.copy()
            pdf["pixels"] = [
                _fake_decode(m["payload"], target_w, target_h) if m is not None else None
                for m in media
            ]
            pdf["out_w"] = target_w
            pdf["out_h"] = target_h
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def media_features(df: DataFrame, dim: int = 16, media_col: str = "media") -> DataFrame:
    """Feature-extraction stage: payload -> fixed-dim float vector, Arrow
    batch at a time (the embedding-model call site in production; here a
    deterministic byte-histogram projection so similarity ops downstream
    have real inputs)."""
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(
        df.schema.fields + [StructField("features", ArrayType(FloatType()), True)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for m in pdf[media_col]:
                if m is None or m["payload"] is None:
                    feats.append(None)
                    continue
                buf = m["payload"]
                hist = [0.0] * dim
                for b in buf:
                    hist[b % dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, n_frames: int = 4, media_col: str = "media") -> DataFrame:
    """Video frame sampling (one row in -> n rows out) via mapInPandas —
    the UDTF-shaped stage. STUB: frames are slices of the payload; a real
    deployment calls ffmpeg per batch and yields the same shape."""
    base = [f for f in df.schema.fields]
    out_schema = StructType(
        base
        + [
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[media_col]["payload"] if row[media_col] is not None else None
                for i in range(n_frames):
                    r = row.to_dict()
                    r["frame_idx"] = i
                    r["frame"] = None if payload is None else payload[i::n_frames]
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(batches, schema=out_schema)
