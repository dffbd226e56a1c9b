"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real and tested: schemas, partition-parallel
``mapInPandas`` with Arrow batches, typed metadata structs, frame-sampling
row expansion. The actual codec work is stubbed behind ``decoder``
callables because media libraries (PIL/ffmpeg/torchaudio) are not in this
container — pass a real decoder in production or use the deterministic
fake for tests.

Design for 100 TB: binary payloads stay in their partitions (no shuffle in
decode/featurize paths); batch size is Arrow-controlled; metadata-only
operations (filtering by width/duration) never touch the payload column
thanks to parquet column pruning.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

IMAGE_META = StructType([
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("format", StringType()),
])

AUDIO_META = StructType([
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("channels", IntegerType()),
    StructField("format", StringType()),
])

VIDEO_META = StructType([
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", LongType()),
    StructField("fps", FloatType()),
    StructField("format", StringType()),
])


def fake_image_decoder(payload: bytes) -> dict:
    """Deterministic stand-in for an image codec: derives metadata and a
    16-dim feature vector from a 60-bit md5 prefix of the bytes — the same
    ``portable_hash64`` scheme as dedup, so an independent SQL engine can
    reproduce every derived value (``('0x'||substr(md5(x),1,15))::BIGINT``
    in DuckDB). Real deployments pass e.g. a PIL-based decoder with the
    same signature."""
    if payload is None:
        return {"width": None, "height": None, "channels": None,
                "format": None, "features": None}
    import hashlib
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return {
        "width": 16 + h % 1024,
        "height": 16 + (h // 1024) % 1024,
        "channels": 3,
        "format": "fake",
        "features": [float((h >> (i * 2)) & 0xFF) / 255.0 for i in range(16)],
    }


def fake_audio_decoder(payload: bytes) -> dict:
    """Deterministic stand-in for an audio codec (same portable md5-prefix
    scheme as :func:`fake_image_decoder`, different field derivations):
    sample_rate ∈ {8,16,24,32,40,48} kHz, mono/stereo, and a bounded
    sample count — every value reproducible in any md5-capable engine."""
    if payload is None:
        return {"sample_rate": None, "n_samples": None, "channels": None,
                "format": None, "features": None}
    import hashlib
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return {
        "sample_rate": 8000 * (1 + h % 6),
        "n_samples": 1000 + (h // 6) % 1000000,
        "channels": 1 + (h // 7) % 2,
        "format": "fake",
        "features": [float((h >> (i * 3)) & 0x7F) / 127.0 for i in range(16)],
    }


def unavailable_decoder(payload: bytes) -> dict:
    raise NotImplementedError(
        "media codecs are not installed in this environment; supply a real "
        "decoder callable (bytes -> dict) to decode_images/decode_audio")


def decode_images(
    df: DataFrame,
    binary_col: str = "payload",
    decoder: Callable[[bytes], dict] = fake_image_decoder,
    feature_dim: int = 16,
) -> DataFrame:
    """Decode/feature-extract image binaries partition-parallel.

    Adds ``meta`` (IMAGE_META struct) + ``features array<float>`` columns.
    Runs as ``mapInPandas`` — Arrow-batched, zero shuffle, preserves all
    input columns.
    """
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("meta", IMAGE_META), StructField("features", ArrayType(FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, feats = [], []
            for payload in pdf[binary_col]:
                d = decoder(bytes(payload) if payload is not None else None)
                metas.append({k: d.get(k) for k in
                              ("width", "height", "channels", "format")})
                feats.append(d.get("features"))
            pdf = pdf.copy()
            pdf["meta"] = metas
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def decode_audio(
    df: DataFrame,
    binary_col: str = "payload",
    decoder: Callable[[bytes], dict] = fake_audio_decoder,
) -> DataFrame:
    """Decode/feature-extract audio binaries partition-parallel: adds
    ``meta`` (AUDIO_META struct, incl. derived duration) + ``features``.
    Same Arrow-batched zero-shuffle shape as :func:`decode_images`."""
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("meta", AUDIO_META),
           StructField("features", ArrayType(FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, feats = [], []
            for payload in pdf[binary_col]:
                d = decoder(bytes(payload) if payload is not None else None)
                metas.append({k: d.get(k) for k in
                              ("sample_rate", "n_samples", "channels",
                               "format")})
                feats.append(d.get("features"))
            pdf = pdf.copy()
            pdf["meta"] = metas
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, n_frames_col: str = "n_frames",
                  every: int = 30) -> DataFrame:
    """Frame-sampling row expansion: one output row per sampled frame index
    (builtin sequence+explode — the decode of each frame is then a
    per-row decoder call). No payload duplication until decode time."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
                             F.lit(every))))


def resize_spec(width: int, height: int) -> Column:
    """Typed resize instruction (executed by the decoder at decode time —
    engines should push resize into the codec, not post-process)."""
    return F.struct(F.lit(width).alias("width"), F.lit(height).alias("height"))
