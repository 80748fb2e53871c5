"""Image codec + per-row invariant tests (north rule: decoded-pixel allclose,
PSNR ≥ 40 dB for lossy fmt, exact caption equality)."""

import numpy as np

from osm_public_space_mapper_spark.images.codec import (
    decode_image,
    decode_png,
    decode_raw,
    encode_png,
    encode_raw,
    psnr,
    synth_pixels,
)
from osm_public_space_mapper_spark.fixtures.images import generate_images, geotag_from_phash, phash_from_frac


def test_png_roundtrip_exact():
    for seed, w, h in [(1, 16, 16), (7, 33, 17), (42, 96, 96)]:
        px = synth_pixels(seed, w, h)
        assert np.array_equal(decode_png(encode_png(px)), px)


def test_raw_roundtrip():
    px = synth_pixels(3, 20, 10)
    assert np.array_equal(decode_raw(encode_raw(px), 20, 10), px)


def test_psnr_threshold():
    px = synth_pixels(5, 64, 64)
    noisy = np.clip(px.astype(np.int32) + np.random.RandomState(0).randint(-2, 3, px.shape), 0, 255).astype(np.uint8)
    assert psnr(px, px) == float("inf")
    assert psnr(px, noisy) >= 40.0


def test_images_fixture_deterministic_and_invariant():
    pdf1 = generate_images(200, seed=42)
    pdf2 = generate_images(200, seed=42)
    assert (pdf1["phash"] == pdf2["phash"]).all()
    assert (pdf1["caption"] == pdf2["caption"]).all()
    # every row's bytes decode back to the synthesized pixels (lossless fmts)
    for i in range(0, 200, 37):
        row = pdf1.iloc[i]
        px = decode_image(row["bytes"], int(row["w"]), int(row["h"]), row["fmt"])
        assert px.shape == (int(row["h"]), int(row["w"]), 3)
    # geotag invariant: phash bits → lon/lat inside the Rabenhof bbox
    lon, lat = geotag_from_phash(pdf1["phash"].to_numpy())
    assert (lon >= 16.3988) .all() and (lon <= 16.4056).all()
    assert (lat >= 48.1943).all() and (lat <= 48.1989).all()
    # phash construction is the inverse of geotag derivation
    ph = phash_from_frac(np.array([0.5]), np.array([0.25]))
    lo, la = geotag_from_phash(ph)
    assert abs((lo[0] - 16.39885944803246) / (16.405590927719924 - 16.39885944803246) - 0.5) < 1e-6
