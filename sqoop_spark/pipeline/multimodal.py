"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are ``binary`` columns with a metadata struct
(modality, width/height or sample rate, codec). The Spark-side machinery —
schema, Arrow batch shape, ``mapInPandas`` partition streaming, batch-size
control — is real and tested; the actual codec step is STUBBED because the
decode libraries (PIL/ffmpeg) are not in this container:

- ``decode_stub='fake'``  → deterministic feature vector derived from
  sha256(payload) — stable for tests.
- ``decode_stub='raise'`` → NotImplementedError, marking the integration
  point a real deployment fills in.

Scale notes: payloads stream through Arrow record batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory);
binary cells never pass through Python row objects. Frame-sampling/resize
for video would slot into the same ``mapInPandas`` generator, emitting
multiple rows per input row (generator output is not 1:1 constrained).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes)."""
    mods = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    sid = F.col("id")
    payload = F.to_binary(
        F.repeat(F.sha2(F.concat(F.lit(str(seed)), sid.cast("string")), 256), 8),
        F.lit("hex"),
    )
    return spark.range(n).select(
        sid.alias("media_id"),
        F.element_at(mods, (sid % 3 + 1).cast("int")).alias("modality"),
        payload.alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64(sid, F.lit("w")), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64(sid, F.lit("h")), F.lit(1080)) + 1).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def extract_features(
    df: DataFrame, decode_stub: str = "fake", batch_size_hint: int | None = None
) -> DataFrame:
    """Decode + featurize media partitions via ``mapInPandas``.

    The generator receives Arrow batches of the full rows (payload stays
    binary end-to-end); each batch is processed vectorized and yields the
    feature frame. This is the integration point where a real pipeline
    calls PIL/torchaudio — here stubbed per module docstring.
    """
    if decode_stub not in ("fake", "raise"):
        raise ValueError(f"unknown decode_stub: {decode_stub}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg — not available in this "
                    "container; plug the real decoder in here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return df.mapInPandas(process, schema=_FEATURES_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_sec", T.DoubleType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def frame_sample(
    df: DataFrame, fps: float = 1.0, max_frames: int = 8, decode_stub: str = "fake"
) -> DataFrame:
    """Sample frames from video rows — a 1:N ``mapInPandas`` fan-out.

    Demonstrates the generator contract codecs need: one input row yields
    MANY output rows (frames) without materializing them as a Python list
    per row — the generator emits one pandas frame per Arrow batch and
    Spark streams it. Non-video rows are dropped (filter pushed before the
    Python stage so images/audio never cross into Arrow). The decode is
    stubbed per the module docstring: frame bytes derive from
    sha256(payload ‖ frame_idx), frame count from the payload length —
    deterministic, schema-faithful, zero codec deps.
    """
    if decode_stub not in ("fake", "raise"):
        raise ValueError(f"unknown decode_stub: {decode_stub}")
    vids = df.filter(F.col("modality") == "video")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "video decode requires ffmpeg — not available in this "
                    "container; plug the real frame sampler in here"
                )
            out = {
                "media_id": [],
                "frame_idx": [],
                "ts_sec": [],
                "frame": [],
                "width": [],
                "height": [],
            }
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                # stub duration: 1 "second" per 64 payload bytes
                n = min(max_frames, max(1, int(len(payload) // 64 * fps)))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_sec"].append(i / fps)
                    out["frame"].append(
                        hashlib.sha256(bytes(payload) + i.to_bytes(4, "big")).digest()
                    )
                    out["width"].append(meta["width"])
                    out["height"].append(meta["height"])
            yield pd.DataFrame(out)

    return vids.mapInPandas(process, schema=_FRAMES_SCHEMA)


def resize_media(
    df: DataFrame, width: int, height: int, decode_stub: str = "fake"
) -> DataFrame:
    """Resize image rows — a 1:1 ``mapInPandas`` transform that rewrites
    both payload and metadata (the meta struct must stay consistent with
    the bytes, which is why this can't be a pure-SQL column edit). Stubbed
    resample: payload' = sha256(payload ‖ WxH) — deterministic; the real
    deployment swaps in PIL here. Non-image rows pass through untouched.
    """
    if decode_stub not in ("fake", "raise"):
        raise ValueError(f"unknown decode_stub: {decode_stub}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"{width}x{height}".encode()
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "image decode requires PIL — not available in this "
                    "container; plug the real resampler in here"
                )
            is_img = pdf["modality"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(
                lambda p: hashlib.sha256(bytes(p) + tag).digest()
            )
            pdf.loc[is_img, "meta"] = pdf.loc[is_img, "meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield pdf

    return df.mapInPandas(process, schema=df.schema)
