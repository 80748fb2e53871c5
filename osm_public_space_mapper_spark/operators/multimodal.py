"""Multimodal payload operators (task brief: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side plumbing — schemas, Arrow batching, mapInPandas signatures,
partition behavior — is real and tested; only codecs unavailable in this
container are stubbed behind NotImplementedError (brief: "STUB the decode
step behind a clearly-marked NotImplementedError ... make the Spark-side
plumbing real"). PNG/raw images decode for real (images/codec.py).

resize_images    decode → nearest-neighbor resize → re-encode (real, lossless
                 codecs; the canonical image-preprocess stage)
sample_frames    video frame-sampling plumbing; mp4/webm decode stubbed
audio_features   audio feature plumbing; mp3/flac decode stubbed, pcm16 real
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..images.codec import decode_image, encode_png, encode_raw


def _resize_nn(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = px.shape[:2]
    ys = np.clip((np.arange(out_h) + 0.5) * h / out_h, 0, h - 1).astype(np.int64)
    xs = np.clip((np.arange(out_w) + 0.5) * w / out_w, 0, w - 1).astype(np.int64)
    return px[ys][:, xs]


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real decode → resize → re-encode over Arrow batches."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for _, row in pdf.iterrows():
                px = decode_image(bytes(row["bytes"]), int(row["w"]), int(row["h"]), row["fmt"])
                rs = _resize_nn(px, out_w, out_h)
                blob = encode_png(rs) if row["fmt"] == "png" else encode_raw(rs)
                out["image_id"].append(row["image_id"])
                out["bytes"].append(blob)
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append(row["fmt"])
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(_run, _RESIZE_SCHEMA)


# --- video: frame sampling (decode stubbed) ---------------------------------

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("fmt", T.StringType(), False),       # mp4|webm|rawrgb
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("fps", T.DoubleType(), False),
    ]
)

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_png", T.BinaryType()),
    ]
)


def decode_video_frames(data: bytes, w: int, h: int, n_frames: int, fmt: str) -> np.ndarray:
    """(n, h, w, 3) uint8. Only 'rawrgb' (concatenated raw frames) decodes in
    this environment; real containers are STUBBED."""
    if fmt == "rawrgb":
        return np.frombuffer(data, np.uint8).reshape(n_frames, h, w, 3)
    raise NotImplementedError(
        f"video fmt={fmt!r}: no container decoder in this environment (stub); "
        "plumbing (schema/batching/sampling) is format-agnostic"
    )


def sample_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Every n-th frame as PNG — 1→N fan-out via mapInPandas."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "frame_png": []}
            for _, row in pdf.iterrows():
                frames = decode_video_frames(
                    bytes(row["bytes"]), int(row["w"]), int(row["h"]), int(row["n_frames"]), row["fmt"]
                )
                for i in range(0, len(frames), every_n):
                    out["video_id"].append(row["video_id"])
                    out["frame_idx"].append(i)
                    out["frame_png"].append(encode_png(frames[i]))
            yield pd.DataFrame(out)

    return videos.mapInPandas(_run, _FRAME_SCHEMA)


# --- audio: features (decode stubbed except pcm16) --------------------------

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("fmt", T.StringType(), False),       # mp3|flac|pcm16
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
    ]
)

_AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """int16 mono samples. Only 'pcm16' decodes here; mp3/flac are STUBBED."""
    if fmt == "pcm16":
        return np.frombuffer(data, np.int16)
    raise NotImplementedError(
        f"audio fmt={fmt!r}: no codec in this environment (stub); "
        "plumbing (schema/batching/features) is format-agnostic"
    )


def audio_features(audio: DataFrame) -> DataFrame:
    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"audio_id": [], "rms": [], "zero_crossings": [], "duration_s": []}
            for _, row in pdf.iterrows():
                s = decode_audio(bytes(row["bytes"]), row["fmt"]).astype(np.float64)
                out["audio_id"].append(row["audio_id"])
                out["rms"].append(float(np.sqrt(np.mean(s * s))) if len(s) else 0.0)
                out["zero_crossings"].append(int(np.sum(np.signbit(s[1:]) != np.signbit(s[:-1]))))
                out["duration_s"].append(float(len(s)) / float(row["sample_rate"]))
            yield pd.DataFrame(out)

    return audio.mapInPandas(_run, _AUDIO_FEAT_SCHEMA)
