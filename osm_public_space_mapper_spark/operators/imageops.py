"""Image-payload operators over the binary column (north rule input_hint).

All run as Arrow-batched mapInPandas / pandas UDFs over `bytes:binary` —
the Spark-side plumbing (schema, batching, partitioning) is format-agnostic;
codecs live in images/codec.py (PNG/raw from scratch; exotic formats raise
NotImplementedError at the codec layer, per the stub policy).

verify_invariants: per-row decoded-pixel round-trip (re-encode → decode →
PSNR; lossless ⇒ ∞, lossy threshold 40 dB) + caption equality against the
pre-engine source table (joined on image_id — a self-comparison would be
vacuous, so the source side is required).
image_features: decode → per-image feature vector (mean RGB, luma stats,
edge-energy proxy) — the "feature extract" stage of a training-data pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..images.codec import decode_image, encode_png, encode_raw, psnr

_INVARIANT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("psnr_db", T.DoubleType()),
        T.StructField("pixels_ok", T.BooleanType()),
        T.StructField("caption_ok", T.BooleanType()),
    ]
)


def verify_invariants(images: DataFrame, source: DataFrame | None = None, psnr_threshold: float = 40.0) -> DataFrame:
    """Per-row engine invariants for the post-engine `images` rows.

    caption_ok compares the caption that came THROUGH the engine against the
    pre-engine `source` table (equi-joined on image_id); a corrupted or
    dropped caption turns the row False (tests/test_image_joins.py proves
    this with a deliberate corruption). When source is omitted, images must
    itself carry the reference caption under `caption_src` — otherwise a
    self-comparison would be vacuously true, so this raises."""
    if source is not None:
        src = source.select(
            F.col("image_id"), F.col("caption").alias("caption_src")
        )
        images = images.select("image_id", "bytes", "w", "h", "fmt", "caption").join(
            src, "image_id", "left"
        )
    elif "caption_src" not in images.columns:
        raise ValueError(
            "verify_invariants needs the pre-engine captions: pass source= "
            "or provide a caption_src column (self-comparison is vacuous)"
        )

    def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "caption", "psnr_db", "pixels_ok", "caption_ok")}
            for _, row in pdf.iterrows():
                px = decode_image(bytes(row["bytes"]), int(row["w"]), int(row["h"]), row["fmt"])
                re_encoded = encode_png(px) if row["fmt"] == "png" else encode_raw(px)
                px2 = decode_image(re_encoded, int(row["w"]), int(row["h"]), row["fmt"])
                p = psnr(px, px2)
                out["image_id"].append(row["image_id"])
                out["caption"].append(row["caption"])
                out["psnr_db"].append(p if np.isfinite(p) else 1e9)
                out["pixels_ok"].append(bool(p >= psnr_threshold or not np.isfinite(p)))
                out["caption_ok"].append(
                    row["caption_src"] is not None and row["caption"] == row["caption_src"]
                )
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt", "caption", "caption_src").mapInPandas(
        _check, _INVARIANT_SCHEMA
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("luma_std", T.DoubleType()),
        T.StructField("edge_energy", T.DoubleType()),
    ]
)


def image_features(images: DataFrame) -> DataFrame:
    """Decode + lightweight feature extraction (vectorized numpy per image)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "mean_r", "mean_g", "mean_b", "luma_std", "edge_energy")}
            for _, row in pdf.iterrows():
                px = decode_image(bytes(row["bytes"]), int(row["w"]), int(row["h"]), row["fmt"]).astype(np.float64)
                out["image_id"].append(row["image_id"])
                out["mean_r"].append(float(px[:, :, 0].mean()))
                out["mean_g"].append(float(px[:, :, 1].mean()))
                out["mean_b"].append(float(px[:, :, 2].mean()))
                luma = px @ np.array([0.299, 0.587, 0.114])
                out["luma_std"].append(float(luma.std()))
                gx = np.abs(np.diff(luma, axis=1)).mean() if luma.shape[1] > 1 else 0.0
                gy = np.abs(np.diff(luma, axis=0)).mean() if luma.shape[0] > 1 else 0.0
                out["edge_energy"].append(float(gx + gy))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(_feat, _FEATURE_SCHEMA)
