"""Synthetic image+caption table (FIXTURES.md §2; BASELINE.json input_hint).

Schema: image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:int64. Deterministic from seed; geotag derives from
phash bits so the hinted schema stays exact:

  lon = bbox.left   + (phash & 0xFFFFFFFF)  / 2^32 * extent_lon
  lat = bbox.bottom + (phash >>> 32)        / 2^32 * extent_lat

Skew: a Zipfian share of rows lands in two dense "urban-center" hotspots to
exercise the salting + two-stage aggregation path the north rule requires.
"""

from __future__ import annotations

import numpy as np

from ..images.codec import encode_jpeg, encode_png, encode_raw, synth_pixels
from .elements import BBOX_4326

_HOTSPOTS = [(0.25, 0.72), (0.58, 0.45)]  # fraction coords of dense cells
_HOT_FRAC = 0.20  # ~20% of images in hotspots (FIXTURES.md §2)


def phash_from_frac(fx: np.ndarray, fy: np.ndarray) -> np.ndarray:
    lo = np.clip((fx * 2**32).astype(np.uint64), 0, 2**32 - 1)
    hi = np.clip((fy * 2**32).astype(np.uint64), 0, 2**32 - 1)
    return ((hi << np.uint64(32)) | lo).astype(np.int64)


def geotag_from_phash(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """phash int64 → (lon, lat) in EPSG:4326. The documented invariant used by
    cell encode, PIP join, kNN and tiling."""
    u = np.asarray(phash).astype(np.uint64)
    fx = (u & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32
    fy = (u >> np.uint64(32)).astype(np.float64) / 2**32
    lon = BBOX_4326["left"] + fx * (BBOX_4326["right"] - BBOX_4326["left"])
    lat = BBOX_4326["bottom"] + fy * (BBOX_4326["top"] - BBOX_4326["bottom"])
    return lon, lat


def generate_images(
    n: int, seed: int = 42, with_pixels: bool = True, jpeg_frac: float = 0.0
) -> "pd.DataFrame":  # noqa: F821
    """Deterministic image rows. with_pixels=False skips encoding (metadata-only
    benches where bytes content is irrelevant get cheap generation).

    jpeg_frac carves lossy baseline-JPEG rows out of the raw range using
    the SAME single rng draw, so the default 0.0 keeps the committed
    fixtures (and every hash-pinned test built on them) byte-identical
    while jpeg-bearing corpora stay one parameter away."""
    import pandas as pd

    rng = np.random.RandomState(seed)
    n_hot = int(n * _HOT_FRAC)
    n_cold = n - n_hot
    fx = np.empty(n)
    fy = np.empty(n)
    fx[:n_cold] = rng.uniform(0.001, 0.999, n_cold)
    fy[:n_cold] = rng.uniform(0.001, 0.999, n_cold)
    # hotspots: tight gaussian blobs around two centers
    which = rng.randint(0, len(_HOTSPOTS), n_hot)
    cx = np.array([_HOTSPOTS[i][0] for i in which])
    cy = np.array([_HOTSPOTS[i][1] for i in which])
    fx[n_cold:] = np.clip(cx + rng.normal(0, 0.01, n_hot), 0.001, 0.999)
    fy[n_cold:] = np.clip(cy + rng.normal(0, 0.01, n_hot), 0.001, 0.999)
    phash = phash_from_frac(fx, fy)

    ws = rng.randint(16, 97, n)
    hs = rng.randint(16, 97, n)
    uf = rng.rand(n)
    fmts = np.where(uf < 0.5, "png", np.where(uf >= 1.0 - jpeg_frac, "jpeg", "raw"))
    image_ids = [f"img-{seed:04x}-{i:08d}" for i in range(n)]
    captions = [
        f"scene {i}: öffentlicher Raum près du n°{i % 97} — category probe ☃"
        for i in range(n)
    ]
    if with_pixels:
        blobs = []
        for i in range(n):
            px = synth_pixels(i * 2654435761 + seed, int(ws[i]), int(hs[i]))
            if fmts[i] == "png":
                blobs.append(encode_png(px))
            elif fmts[i] == "jpeg":
                blobs.append(encode_jpeg(px, quality=90))
            else:
                blobs.append(encode_raw(px))
    else:
        blobs = [b""] * n
    return pd.DataFrame(
        {
            "image_id": image_ids,
            "bytes": blobs,
            "w": ws.astype(np.int32),
            "h": hs.astype(np.int32),
            "fmt": fmts,
            "caption": captions,
            "phash": phash,
        }
    )


def synth_images_spark(spark, n: int, seed: int = 42):
    """Distributed (JVM-expression) synthesis of the images table WITHOUT
    pixel payloads — for throughput benches at row counts where driver-side
    generation would bottleneck. Preserves the geotag-from-phash invariant
    and the two-hotspot Zipfian skew (~20% of rows in two dense cells)."""
    from pyspark.sql import functions as F

    df = spark.range(n)
    h1 = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1)))
    hot = F.pmod(F.col("id"), F.lit(5)) == 0  # 20%
    which = F.pmod(h2, F.lit(2))
    hx = F.when(which == 0, F.lit(_HOTSPOTS[0][0])).otherwise(F.lit(_HOTSPOTS[1][0]))
    hy = F.when(which == 0, F.lit(_HOTSPOTS[0][1])).otherwise(F.lit(_HOTSPOTS[1][1]))
    fx = F.when(hot, hx + (F.pmod(h1, F.lit(2001)) - 1000) / 100000.0).otherwise(
        F.pmod(h1, F.lit(998001)).cast("double") / 1000000.0 + 0.001
    )
    fy = F.when(hot, hy + (F.pmod(h2, F.lit(2001)) - 1000) / 100000.0).otherwise(
        F.pmod(h2, F.lit(998001)).cast("double") / 1000000.0 + 0.001
    )
    phash = F.shiftleft(F.floor(fy * F.lit(float(2**32))).cast("long"), 32).bitwiseOR(
        F.floor(fx * F.lit(float(2**32))).cast("long")
    )
    return df.select(
        F.concat(F.lit(f"img-{seed:04x}-"), F.lpad(F.col("id").cast("string"), 10, "0")).alias("image_id"),
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(32).alias("w"),
        F.lit(32).alias("h"),
        F.lit("raw").alias("fmt"),
        F.concat(F.lit("scene "), F.col("id").cast("string")).alias("caption"),
        phash.alias("phash"),
    )


def images_to_spark(spark, pdf=None, n: int = 2000, seed: int = 42, with_pixels: bool = True):
    from pyspark.sql import types as T

    if pdf is None:
        pdf = generate_images(n, seed, with_pixels)
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), True),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
            T.StructField("caption", T.StringType(), False),
            T.StructField("phash", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(pdf, schema)


# Weyl low-discrepancy steps (frac of golden ratio / plastic-number powers):
# irrational-step sequences cover the bbox uniformly and are PURE double
# arithmetic — the same rows are reproducible in any engine (the DuckDB
# oracle rebuilds this table with generate_series + identical expressions),
# unlike the Mersenne-Twister fixture above.
WEYL_X = 0.6180339887498949
WEYL_Y = 0.7548776662466927


def weyl_images_spark(spark, n: int, seed: int = 0):
    """Deterministic, SQL-oracle-expressible images table (expression-only
    synthesis, no numpy/driver loop — scales with spark.range).

    Keeps the two-hotspot skew of `generate_images` (every 5th row lands in a
    dense urban-center blob) and the geotag-from-phash invariant: phash packs
    floor(fy·2^32)<<32 | floor(fx·2^32), which `joins.with_geotag` unpacks."""
    from pyspark.sql import functions as F

    df = spark.range(n)
    i = F.col("id").cast("double") + F.lit(float(seed))

    def frac(c):
        return c - F.floor(c)

    fx_cold = frac(i * F.lit(WEYL_X)) * F.lit(0.998) + F.lit(0.001)
    fy_cold = frac(i * F.lit(WEYL_Y)) * F.lit(0.998) + F.lit(0.001)
    hot = F.pmod(F.col("id"), F.lit(5)) == 0
    which = F.pmod(F.floor(F.col("id") / 5), F.lit(2))
    hx = F.when(which == 0, F.lit(_HOTSPOTS[0][0])).otherwise(F.lit(_HOTSPOTS[1][0]))
    hy = F.when(which == 0, F.lit(_HOTSPOTS[0][1])).otherwise(F.lit(_HOTSPOTS[1][1]))
    fx = F.when(hot, hx + (frac(i * F.lit(WEYL_X)) - F.lit(0.5)) * F.lit(0.02)).otherwise(fx_cold)
    fy = F.when(hot, hy + (frac(i * F.lit(WEYL_Y)) - F.lit(0.5)) * F.lit(0.02)).otherwise(fy_cold)
    lo = F.floor(fx * F.lit(4294967296.0)).cast("long")
    hi = F.floor(fy * F.lit(4294967296.0)).cast("long")
    phash = F.shiftleft(hi, 32).bitwiseOR(lo)
    return df.select(
        F.concat(F.lit("wimg-"), F.lpad(F.col("id").cast("string"), 10, "0")).alias("image_id"),
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(32).alias("w"),
        F.lit(32).alias("h"),
        F.lit("raw").alias("fmt"),
        F.concat(F.lit("weyl scene "), F.col("id").cast("string")).alias("caption"),
        phash.alias("phash"),
    )
