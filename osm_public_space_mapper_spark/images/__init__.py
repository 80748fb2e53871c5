from .codec import encode_png, decode_png, encode_raw, decode_raw, decode_image, psnr, synth_pixels  # noqa: F401
