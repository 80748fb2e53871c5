"""Header-only image metadata extraction — parse container structure
(magic bytes, PNG chunk table, JPEG marker segments) WITHOUT decoding
pixel data: no IDAT inflate, no Huffman/IDCT. At ingest scale this is the
op that runs over every blob, so it must cost bytes-prefix I/O, not
decode CPU; it also detects the container from magic bytes independently
of the declared ``fmt`` column, catching mislabeled rows before a decode
kernel trips on them (complements `operators/imageops.with_decode_status`,
which pays the full decode).

From-scratch parsers over the same wire formats as `codec.py` / `jpeg.py`
(PNG ISO 15948 chunk layout, JPEG ITU-T T.81 marker segments).
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> str:
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    return "unknown"


def parse_png_header(data: bytes) -> dict:
    """Walk the chunk table: IHDR geometry, tEXt key→value pairs, chunk
    count, and CRC validity of the metadata chunks actually read (IDAT
    payloads are skipped over by length — never inflated)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    out: dict = {"texts": {}, "n_chunks": 0, "crc_ok": True}
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated chunk {tag!r}")
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        out["n_chunks"] += 1
        if tag != b"IDAT":  # metadata chunks are small; verify their CRCs
            if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
                out["crc_ok"] = False
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            out.update(
                width=int(w),
                height=int(h),
                bit_depth=int(depth),
                color_type=int(ctype),
                interlaced=bool(interlace),
                n_channels={0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(int(ctype)),
            )
        elif tag == b"tEXt":
            k, _, v = payload.partition(b"\x00")
            out["texts"][k.decode("latin-1")] = v.decode("latin-1")
        elif tag == b"IEND":
            break
        pos += 12 + length
    if "width" not in out:
        raise ValueError("no IHDR chunk")
    return out


def parse_jpeg_header(data: bytes) -> dict:
    """Walk marker segments to the frame header (SOFn): geometry,
    component count, progressive flag. Stops at SOS — entropy-coded data
    is never touched."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    out: dict = {"progressive": False}
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker desync at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + seglen]
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            precision, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            out.update(
                width=int(w),
                height=int(h),
                bit_depth=int(precision),
                n_channels=int(ncomp),
                progressive=marker == 0xC2,
            )
        elif marker == 0xDA:  # SOS — pixel data follows
            break
        pos += 2 + seglen
    if "width" not in out:
        raise ValueError("no SOF frame header")
    return out


def encode_png_texts(pixels, texts: dict[str, str]) -> bytes:
    """PNG with tEXt metadata chunks (caption/source/license tags a crawl
    pipeline carries) inserted between IHDR and IDAT."""
    from .codec import _chunk, encode_png

    base = encode_png(pixels)
    head_len = 8 + 12 + 13  # signature + IHDR chunk
    chunks = b"".join(
        _chunk(b"tEXt", k.encode("latin-1") + b"\x00" + v.encode("latin-1"))
        for k, v in sorted(texts.items())
    )
    return base[:head_len] + chunks + base[head_len:]
