"""Image codecs from scratch: PNG (stdlib zlib), baseline JPEG (see
images/jpeg.py), raw RGB, PSNR, synth pixels.

No Pillow/imageio in this environment (SURVEY.md §7.0); the BASELINE.json
input_hint requires opaque `bytes:binary` image payloads with a per-row
invariant of decoded-pixel allclose (PSNR ≥ 40 dB for lossy) + exact caption
equality. PNG here is lossless (filter 0, RGB8); JPEG is baseline
sequential DCT per ITU-T T.81 (lossy — the ≥40 dB invariant path); `raw`
is a plain height×width×3 uint8 buffer. Still-exotic formats (webp, video
codecs) stay stubbed — the Spark-side plumbing (binary column, Arrow
batches, mapInPandas decode) is identical regardless of codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .jpeg import JpegError, decode_jpeg, encode_jpeg  # noqa: F401 — re-export

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w, 3) → PNG bytes (color type 2, bit depth 8, filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w, 3). Supports RGB8 with filters 0-4."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            assert depth == 8 and ctype == 2 and interlace == 0, "only RGB8 non-interlaced"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    filters = raw[:, 0]
    scan = raw[:, 1:].astype(np.int32)
    bpp = 3
    out = np.zeros_like(scan)
    for r in range(h):
        f = filters[r]
        cur = scan[r].copy()
        prev = out[r - 1] if r > 0 else np.zeros(w * 3, np.int32)
        if f == 0:
            out[r] = cur
        elif f == 2:  # Up
            out[r] = (cur + prev) & 0xFF
        else:  # Sub/Average/Paeth need left-to-right scan
            row = np.zeros(w * 3, np.int32)
            for i in range(w * 3):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                if f == 1:
                    row[i] = (cur[i] + a) & 0xFF
                elif f == 3:
                    row[i] = (cur[i] + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[i] = (cur[i] + pred) & 0xFF
            out[r] = row
    return out.astype(np.uint8).reshape(h, w, 3)


def encode_raw(pixels: np.ndarray) -> bytes:
    return pixels.astype(np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, np.uint8).reshape(h, w, 3)


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        return decode_jpeg(data)
    if fmt == "raw":
        return decode_raw(data, w, h)
    raise NotImplementedError(
        f"fmt={fmt!r}: decoder not available in this environment; "
        "plumbing (binary column + Arrow batch) is format-agnostic"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-image pixel content (seeded gradient + noise) —
    FIXTURES.md §2: reproducible PSNR/allclose checks."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 / max(w - 1, 1)),
            (yy * 255 / max(h - 1, 1)),
            ((xx + yy) * 255 / max(w + h - 2, 1)),
        ],
        axis=2,
    )
    noise = rng.randint(0, 32, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)
