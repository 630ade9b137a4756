"""Multimodal columns: opaque binary payloads + typed metadata, with REAL
pure-numpy codecs for three simple containers.

Image/audio/video cells are ``binary`` columns with a metadata struct
(modality, width/height or sample rate, codec). The Spark-side machinery —
schema, Arrow batch shape, ``mapInPandas`` partition streaming — never
lets a payload leave Arrow as Python row objects; the codec work happens
vectorized inside the generator.

Codecs (``decode="numpy"``, the default — no PIL/ffmpeg dependency):

- **image**: binary PPM (P6) — ASCII header ``P6\\n<w> <h>\\n255\\n`` +
  w*h*3 RGB bytes. Parsed with a header regex + ``np.frombuffer``;
  resized with nearest-neighbor index maps (``resize_media``).
- **audio**: RIFF/WAVE PCM — the real chunked container (fmt + data
  chunks located by walking the chunk list, not by fixed offsets);
  16-bit little-endian mono samples via ``np.frombuffer``.
- **video**: a minimal frame container ``VID0`` — magic + u32be frame
  count + per-frame (u32be length + PPM frame). ``frame_sample``
  re-emits the actual PPM frame bytes (1:N fan-out).

``decode="fake"`` keeps the legacy hash-derived features (plumbing tests
with arbitrary payloads); ``decode="raise"`` marks where a real deployment
would swap in PIL/ffmpeg for formats beyond these.

Scale notes: payloads stream through Arrow record batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory);
all feature math is integer-sum-then-divide so the driver's DuckDB oracle
reproduces the values bit-for-bit (IEEE double division of exact int sums).
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import Iterator

import numpy as np
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
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

_DECODES = ("numpy", "fake", "raise")


# ---------------------------------------------------------------------------
# deterministic synthesis (real containers, closed-form byte math)
# ---------------------------------------------------------------------------
#
# Payload bytes are closed-form in media_id so the driver oracle can
# recompute every feature in DuckDB from `range(n)` without touching the
# binary itself:
#   image  w=4+id%13, h=3+id%7, pixel[i]  = (id*31 + i*7) % 256
#   audio  n=64+id%129, sample[i] = ((id*13 + i*5) % 65536) - 32768, sr 16k
#   video  nf=1+id%5, w=4+id%5, h=3+id%3, frame f pixel i =
#          (id*31 + f*131 + i*7) % 256


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6, maxval 255)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


_PPM_HEADER = re.compile(rb"^P6\n(\d+) (\d+)\n255\n")


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 array. Pure numpy."""
    m = _PPM_HEADER.match(payload)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h = int(m.group(1)), int(m.group(2))
    px = np.frombuffer(payload, dtype=np.uint8, offset=m.end(), count=w * h * 3)
    return px.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM container (the standard 44-byte
    fmt+data layout)."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono → (int16 samples, sample_rate). Walks the chunk
    list (a real WAV may carry LIST/fact chunks before data)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, sr = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported by the numpy codec")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, sr


def encode_vid0(frames: list[np.ndarray]) -> bytes:
    """List of (h, w, 3) uint8 frames → VID0 container (magic + u32be
    count + per-frame u32be length + PPM bytes)."""
    out = [b"VID0", struct.pack(">I", len(frames))]
    for fr in frames:
        ppm = encode_ppm(fr)
        out.append(struct.pack(">I", len(ppm)))
        out.append(ppm)
    return b"".join(out)


def decode_vid0(payload: bytes) -> list[np.ndarray]:
    """VID0 container → list of (h, w, 3) uint8 frames."""
    if payload[:4] != b"VID0":
        raise ValueError("not a VID0 payload")
    (nf,) = struct.unpack(">I", payload[4:8])
    pos, frames = 8, []
    for _ in range(nf):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        frames.append(decode_ppm(payload[pos + 4 : pos + 4 + ln]))
        pos += 4 + ln
    return frames


def _synth_one(mid: int) -> tuple[str, bytes, dict]:
    """One deterministic media row (modality, payload, meta) — the byte
    math the oracle mirrors; see the module docstring table."""
    mod = ("image", "audio", "video")[mid % 3]
    if mod == "image":
        w, h = 4 + mid % 13, 3 + mid % 7
        i = np.arange(w * h * 3, dtype=np.int64)
        px = ((mid * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w, 3)
        return mod, encode_ppm(px), dict(width=w, height=h, sample_rate=None, codec="ppm")
    if mod == "audio":
        n, sr = 64 + mid % 129, 16000
        i = np.arange(n, dtype=np.int64)
        s = (((mid * 13 + i * 5) % 65536) - 32768).astype(np.int16)
        return mod, encode_wav(s, sr), dict(width=None, height=None, sample_rate=sr, codec="wav")
    nf, w, h = 1 + mid % 5, 4 + mid % 5, 3 + mid % 3
    i = np.arange(w * h * 3, dtype=np.int64)
    frames = [
        ((mid * 31 + f * 131 + i * 7) % 256).astype(np.uint8).reshape(h, w, 3)
        for f in range(nf)
    ]
    return mod, encode_vid0(frames), dict(width=w, height=h, sample_rate=None, codec="vid0")


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL container payloads, generated
    executor-side via ``mapInPandas`` (no driver materialization — the
    synthesis distributes like any scan). ``seed`` is accepted for API
    stability; payloads are pure functions of media_id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_synth_one(int(m)) for m in pdf["id"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["id"].astype("int64"),
                    "modality": [r[0] for r in rows],
                    "payload": [r[1] for r in rows],
                    "meta": [r[2] for r in rows],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# feature extraction (the decode integration point)
# ---------------------------------------------------------------------------


def _fake_features(payload: bytes) -> list[float]:
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def _numpy_features(modality: str, payload: bytes) -> list[float]:
    """Real decoded features, integer-sum/IEEE-division math only (exactly
    DuckDB-reproducible — see __spark_entry__ multimodal oracle):

    image  [w, h, n_px_bytes, mean_all, mean_r, mean_g, mean_b, 0]
    audio  [n_samples, sample_rate, mean, mean_abs, min, max, rms, 0]
    video  [n_frames, w, h, mean_all, mean_frame0, 0, 0, 0]
    """
    if modality == "image":
        px = decode_ppm(payload)
        h, w, _ = px.shape
        flat = px.reshape(-1, 3).astype(np.int64)
        n = 3 * w * h
        return [
            float(w),
            float(h),
            float(n),
            int(flat.sum()) / n,
            int(flat[:, 0].sum()) / (w * h),
            int(flat[:, 1].sum()) / (w * h),
            int(flat[:, 2].sum()) / (w * h),
            0.0,
        ]
    if modality == "audio":
        s, sr = decode_wav(payload)
        si = s.astype(np.int64)
        n = len(si)
        return [
            float(n),
            float(sr),
            int(si.sum()) / n,
            int(np.abs(si).sum()) / n,
            float(si.min()),
            float(si.max()),
            float(np.sqrt(int((si * si).sum()) / n)),
            0.0,
        ]
    frames = decode_vid0(payload)
    h, w, _ = frames[0].shape
    allpx = np.stack(frames).astype(np.int64)
    return [
        float(len(frames)),
        float(w),
        float(h),
        int(allpx.sum()) / allpx.size,
        int(allpx[0].sum()) / frames[0].size,
        0.0,
        0.0,
        0.0,
    ]


def extract_features(
    df: DataFrame, decode: str = "numpy", batch_size_hint: int | None = None
) -> DataFrame:
    """Decode + featurize media partitions via ``mapInPandas``.

    The generator receives Arrow batches of the full rows (payload stays
    binary end-to-end). ``decode="numpy"`` runs the real pure-numpy codecs
    (PPM / WAV / VID0); ``"fake"`` hash-derives features from raw bytes
    (any payload); ``"raise"`` marks the PIL/ffmpeg integration point for
    formats beyond the built-in three.
    """
    if decode not in _DECODES:
        raise ValueError(f"unknown decode {decode!r}; use one of {_DECODES}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "raise":
                raise NotImplementedError(
                    "decode of formats beyond ppm/wav/vid0 requires "
                    "PIL/ffmpeg — plug the real decoder in here"
                )
            if decode == "numpy":
                feats = [
                    _numpy_features(m, bytes(p))
                    for m, p in zip(pdf["modality"], pdf["payload"])
                ]
            else:
                feats = pdf["payload"].map(_fake_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": feats,
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
    df: DataFrame, fps: float = 1.0, max_frames: int = 8, decode: str = "numpy"
) -> DataFrame:
    """Sample frames from video rows — a 1:N ``mapInPandas`` fan-out.

    One input row yields MANY output rows (frames) without materializing a
    Python list per row — the generator emits one pandas frame per Arrow
    batch and Spark streams it. Non-video rows are dropped by a filter
    pushed BEFORE the Python stage, so images/audio never cross into Arrow.

    ``decode="numpy"`` parses the VID0 container and emits the actual PPM
    frame bytes with their real dimensions, at most ``max_frames`` per
    video, timestamped ``f / fps``. ``"fake"`` keeps the legacy
    hash-derived frame bytes for arbitrary payloads.
    """
    if decode not in _DECODES:
        raise ValueError(f"unknown decode {decode!r}; use one of {_DECODES}")
    vids = df.filter(F.col("modality") == "video")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "raise":
                raise NotImplementedError(
                    "video decode beyond vid0 requires ffmpeg — plug the "
                    "real frame sampler in here"
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
                if decode == "numpy":
                    frames = decode_vid0(bytes(payload))[:max_frames]
                    for i, fr in enumerate(frames):
                        h, w, _ = fr.shape
                        out["media_id"].append(mid)
                        out["frame_idx"].append(i)
                        out["ts_sec"].append(i / fps)
                        out["frame"].append(encode_ppm(fr))
                        out["width"].append(w)
                        out["height"].append(h)
                else:
                    # legacy stub: 1 "second" per 64 payload bytes
                    n = min(max_frames, max(1, int(len(payload) // 64 * fps)))
                    for i in range(n):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(i)
                        out["ts_sec"].append(i / fps)
                        out["frame"].append(
                            hashlib.sha256(
                                bytes(payload) + i.to_bytes(4, "big")
                            ).digest()
                        )
                        out["width"].append(meta["width"])
                        out["height"].append(meta["height"])
            yield pd.DataFrame(out)

    return vids.mapInPandas(process, schema=_FRAMES_SCHEMA)


def resize_media(
    df: DataFrame, width: int, height: int, decode: str = "numpy"
) -> DataFrame:
    """Resize image rows — a 1:1 ``mapInPandas`` transform that rewrites
    both payload and metadata (the meta struct must stay consistent with
    the bytes, which is why this can't be a pure-SQL column edit).

    ``decode="numpy"``: real nearest-neighbor resample of the PPM pixels
    (two index maps + one fancy-index — vectorized, no Python pixel loop),
    re-encoded as PPM. ``"fake"`` keeps the legacy hash payload for
    arbitrary bytes. Non-image rows pass through untouched.
    """
    if decode not in _DECODES:
        raise ValueError(f"unknown decode {decode!r}; use one of {_DECODES}")

    def _resize(p: bytes) -> bytes:
        px = decode_ppm(p)
        h0, w0, _ = px.shape
        rows = (np.arange(height) * h0) // height
        cols = (np.arange(width) * w0) // width
        return encode_ppm(px[rows][:, cols])

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"{width}x{height}".encode()
        for pdf in batches:
            if decode == "raise":
                raise NotImplementedError(
                    "image decode beyond ppm requires PIL — plug the real "
                    "resampler in here"
                )
            is_img = pdf["modality"] == "image"
            pdf = pdf.copy()
            if decode == "numpy":
                pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(
                    lambda p: _resize(bytes(p))
                )
            else:
                pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(
                    lambda p: hashlib.sha256(bytes(p) + tag).digest()
                )
            pdf.loc[is_img, "meta"] = pdf.loc[is_img, "meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield pdf

    return df.mapInPandas(process, schema=df.schema)
