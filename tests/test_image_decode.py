"""BMP/PPM decoder unit tests (the real kernel behind the multimodal seam)."""

import numpy as np
import pytest

from valere_ocr_ray.extract.image_decode import (
    ImageFormatError,
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    image_feature,
    sniff_image_format,
)


def _pixels(w=13, h=7, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_bmp_roundtrip_exact():
    px = _pixels()
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_row_padding_widths():
    # widths 1..8 cover every 4-byte padding case
    for w in range(1, 9):
        px = _pixels(w=w, h=3, seed=w)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_ppm_decode_with_comments():
    px = _pixels(w=4, h=2)
    payload = b"P6\n# a comment\n4 2\n# another\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(payload), px)


def test_sniff_and_dispatch():
    px = _pixels(w=3, h=3)
    assert sniff_image_format(encode_bmp(px)) == "bmp"
    assert sniff_image_format(b"P6\n3 3\n255\n" + px.tobytes()) == "ppm"
    assert sniff_image_format(b"\x89PNG\r\n") is None
    assert np.array_equal(decode_image(encode_bmp(px)), px)


def test_corrupt_payloads_raise_format_error():
    with pytest.raises(ImageFormatError):
        decode_bmp(b"BM" + b"\x00" * 20)  # truncated header
    with pytest.raises(ImageFormatError):
        decode_ppm(b"P6\n4 2\n255\n\x00\x00")  # truncated pixels
    px = _pixels(w=4, h=4)
    good = encode_bmp(px)
    with pytest.raises(ImageFormatError):
        decode_bmp(good[: len(good) // 2])  # truncated pixel data
    with pytest.raises(ImageFormatError):
        decode_image(b"GIF89a....")


def test_image_feature_geometry_tail():
    px = _pixels(w=20, h=10)
    f = image_feature(px, dim=32)
    assert f.shape == (32,)
    assert abs(f[-2] - np.log1p(20)) < 1e-6
    assert abs(f[-1] - np.log1p(10)) < 1e-6
    assert abs(f[:30].sum() - 1.0) < 1e-5  # normalized histogram
