"""From-scratch baseline JPEG codec (images/jpeg.py) — round-trip,
subsampling, restart markers, typed error paths, and the BASELINE.json
lossy invariant (PSNR >= 40 dB at quality 90 on photographic-statistics
fixtures). Pure numpy tests — no Spark session needed."""

import numpy as np
import pytest

from osm_public_space_mapper_spark.images.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def _photo(h: int = 96, w: int = 128) -> np.ndarray:
    """Smooth low-frequency content — photographic statistics, not white
    noise (JPEG by design discards high-frequency noise; the 40 dB
    invariant is a statement about photographs)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(xx / 17.0) + 50 * np.cos(yy / 13.0) + 10 * np.sin((xx + yy) / 29.0)
    return np.clip(np.stack([base, base * 0.9 + 10, base * 0.8 + 25], -1), 0, 255).astype(
        np.uint8
    )


def test_roundtrip_psnr_invariant_q90():
    img = _photo()
    for sub in ("444", "420", "422", "440"):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        assert out.shape == img.shape
        assert _psnr(out, img) >= 40.0, sub


def test_quality_monotone_in_bytes_and_fidelity():
    img = _photo()
    sizes, psnrs = [], []
    for q in (30, 60, 90):
        data = encode_jpeg(img, quality=q, subsampling="444")
        sizes.append(len(data))
        psnrs.append(_psnr(decode_jpeg(data), img))
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)


def test_second_generation_requantization_is_stable():
    """Decode -> re-encode at the same quality -> decode: pixels already on
    the q90 quantization lattice re-quantize near-idempotently. This is
    what makes verify_invariants' lossy path hold >= 40 dB."""
    img = _photo()
    gen1 = decode_jpeg(encode_jpeg(img, quality=90))
    gen2 = decode_jpeg(encode_jpeg(gen1, quality=90))
    assert _psnr(gen2, gen1) >= 40.0


def test_grayscale_single_component_scan():
    g = _photo()[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, quality=90))
    # engine image tables are RGB-shaped: grayscale replicates to 3
    assert out.shape == (g.shape[0], g.shape[1], 3)
    assert _psnr(out, np.repeat(g[:, :, None], 3, axis=2)) >= 40.0
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


@pytest.mark.parametrize("shape", [(7, 9), (8, 8), (17, 33), (1, 1), (15, 8), (8, 17)])
@pytest.mark.parametrize("sub", ["444", "420", "422", "440"])
def test_odd_sizes_all_subsamplings(shape, sub):
    rng = np.random.RandomState(shape[0] * 100 + shape[1])
    img = np.clip(rng.normal(128, 40, (*shape, 3)), 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert out.shape == img.shape


def test_restart_markers_roundtrip_bit_identical():
    """DRI/RSTn wire path: the restart-interval encode must decode to the
    SAME pixels as the no-restart encode (predictor resets are lossless)."""
    img = _photo(41, 57)
    plain = decode_jpeg(encode_jpeg(img, quality=85, subsampling="420"))
    for interval in (1, 2, 7):
        rst = decode_jpeg(
            encode_jpeg(img, quality=85, subsampling="420", restart_interval=interval)
        )
        assert np.array_equal(rst, plain), interval


def test_decoder_reads_tables_from_stream_not_assumptions():
    """Quality 35 uses scaled quant tables — a decoder that assumed Annex-K
    unscaled tables would produce garbage; PSNR proves DQT is honored."""
    img = _photo()
    out = decode_jpeg(encode_jpeg(img, quality=35, subsampling="444"))
    assert _psnr(out, img) >= 30.0


def test_typed_error_paths():
    img = _photo(16, 16)
    good = encode_jpeg(img)
    with pytest.raises(JpegError):
        decode_jpeg(b"junk bytes")
    with pytest.raises(JpegError):
        decode_jpeg(good[:40])  # truncated mid-header
    with pytest.raises(JpegError):
        decode_jpeg(good[:-30])  # truncated entropy segment
    with pytest.raises(NotImplementedError):
        # SOF2 progressive header
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x14\x01\x01\x11\x00")
    with pytest.raises(ValueError):
        encode_jpeg(img.astype(np.int32))  # wrong dtype
    with pytest.raises(ValueError):
        encode_jpeg(img, subsampling="411")


def test_byte_stuffing_survives_ff_heavy_content():
    """Entropy segments containing 0xFF bytes must be stuffed/unstuffed
    transparently; a solid mid-gray image plus structured detail exercises
    long 1-runs in the Huffman stream."""
    rng = np.random.RandomState(7)
    img = np.full((32, 32, 3), 255, np.uint8)
    img[8:24, 8:24] = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert _psnr(out, img) > 20.0


def test_decode_image_dispatch_and_fixture_jpeg_rows():
    """codec.decode_image routes fmt jpeg/jpg; generate_images(jpeg_frac=…)
    carves deterministic jpeg rows WITHOUT disturbing the rng sequence
    (default 0.0 keeps committed fixtures byte-identical)."""
    from osm_public_space_mapper_spark.fixtures.images import generate_images
    from osm_public_space_mapper_spark.images.codec import decode_image

    base = generate_images(60, seed=9)
    mixed = generate_images(60, seed=9, jpeg_frac=0.3)
    # same rng draw: every non-jpeg row is byte-identical to the default
    assert list(base["image_id"]) == list(mixed["image_id"])
    n_jpeg = 0
    for i in range(60):
        if mixed["fmt"][i] == "jpeg":
            n_jpeg += 1
            assert base["fmt"][i] == "raw"  # carved from the raw range
            px = decode_image(
                mixed["bytes"][i], int(mixed["w"][i]), int(mixed["h"][i]), "jpeg"
            )
            assert px.shape == (int(mixed["h"][i]), int(mixed["w"][i]), 3)
            ref = decode_image(
                base["bytes"][i], int(base["w"][i]), int(base["h"][i]), "raw"
            )
            assert _psnr(px, ref) >= 30.0  # lossy but faithful (noisy fixture)
        else:
            assert mixed["fmt"][i] == base["fmt"][i]
            assert mixed["bytes"][i] == base["bytes"][i]
    assert 5 <= n_jpeg <= 30
