"""Lossy WebP (VP8 keyframe) codec: cross-validation against the
system libwebp in BOTH directions, bool-coder round-trip properties,
loop-filter coverage, OCR parity on lossy cards, and routing.

The decoder is pinned BIT-EXACT against libwebp twice over:

* ``WebPEncodeRGB`` streams (the reference encoder's full construct
  surface: 16x16/B_PRED modes, coefficient-probability updates, real
  loop-filter levels) must decode to byte-identical Y/U/V planes
  (``WebPDecodeYUV``) AND byte-identical RGB (``WebPDecodeRGB`` —
  which additionally pins the re-derived fancy upsampler + fixed-point
  YUV->RGB kernel);
* every stream ``encode_vp8`` emits must decode byte-identically
  under libwebp and under this decoder (spec-valid output, not merely
  self-consistent).

These tests caught a real interop bug the self-roundtrip suite could
not: libwebp's intra-4x4 mode NUMBERING differs from RFC 6386's
(RD/VR/LD permuted), so the kf_bmode probability table recovered from
libwebp's .rodata must be permuted before RFC-id context indexing —
a mismatch there flips no early bits, silently forks the arithmetic
decoder's range, and corrupts a mode many reads later.

libwebp-dependent tests skip cleanly when libwebp.so.7 is absent;
the self-roundtrip and unit tests always run.
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from valere_ocr_ray.extract.glyph_font import (
    canonical_text,
    ocr_image_bytes,
    render_text_image,
)
from valere_ocr_ray.extract.image_decode import (
    ImageFormatError,
    decode_image,
    sniff_image_format,
)
from valere_ocr_ray.extract.vp8 import (
    BoolDecoder,
    BoolEncoder,
    decode_vp8,
    decode_vp8_yuv,
    encode_vp8,
    yuv420_to_rgb,
)
from valere_ocr_ray.extract.webp import decode_webp

from libwebp_oracle import (
    HAVE_LIBWEBP,
    ref_decode,
    ref_decode_yuv,
    ref_encode_lossy,
)

CARD_LINES = ["MEMBER ID: XQ998", "GROUP NO. G04217", "PLAN TYPE: PPO"]

needs_libwebp = pytest.mark.skipif(
    not HAVE_LIBWEBP, reason="libwebp.so.7 absent"
)


def _vp8_chunk(data: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if tag == b"VP8 ":
            return data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _cases() -> dict[str, np.ndarray]:
    rng = np.random.RandomState(3)
    yy, xx = np.meshgrid(np.arange(80), np.arange(100), indexing="ij")
    return {
        "card": render_text_image(CARD_LINES),
        "grad": np.ascontiguousarray(
            np.stack(
                [(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256], -1
            ).astype(np.uint8)
        ),
        "noise": rng.randint(0, 256, (64, 48, 3), np.uint8),
        "odd": rng.randint(0, 256, (37, 53, 3), np.uint8),
        "tiny": rng.randint(0, 256, (5, 7, 3), np.uint8),
        "smooth": np.ascontiguousarray(
            np.stack(
                [(xx // 4 + 40) % 256, (yy // 4 + 80) % 256, ((xx + yy) // 8) % 256],
                -1,
            ).astype(np.uint8)
        ),
        "one": np.full((1, 1, 3), 77, np.uint8),
    }


# --------------------------------------------- libwebp -> this decoder

@needs_libwebp
@pytest.mark.parametrize("quality", [5.0, 20.0, 50.0, 75.0, 90.0, 99.0])
def test_decode_libwebp_streams_bit_exact(quality):
    """Reference-encoder streams: YUV planes AND RGB byte-identical."""
    for name, img in _cases().items():
        data = ref_encode_lossy(img, quality)
        y, u, v = decode_vp8_yuv(_vp8_chunk(data))
        ry, ru, rv = ref_decode_yuv(data)
        assert np.array_equal(y, ry), (name, quality, "Y")
        assert np.array_equal(u, ru), (name, quality, "U")
        assert np.array_equal(v, rv), (name, quality, "V")
        rgb = yuv420_to_rgb(y, u, v)
        assert np.array_equal(rgb, ref_decode(data)), (name, quality, "RGB")


# --------------------------------------------- this encoder -> libwebp

@needs_libwebp
@pytest.mark.parametrize("qi", [0, 4, 20, 60, 127])
def test_encode_twin_cross_validates(qi):
    for name, img in _cases().items():
        data = encode_vp8(img, qi)
        ref = ref_decode_yuv(data)
        assert ref is not None, (name, qi, "libwebp rejected the stream")
        mine = decode_vp8_yuv(_vp8_chunk(data))
        for p, q, pl in zip(mine, ref, "YUV"):
            assert np.array_equal(p, q), (name, qi, pl)


@needs_libwebp
@pytest.mark.parametrize(
    "level,simple,sharp",
    [(20, False, 0), (63, False, 3), (35, True, 0), (10, False, 7),
     (45, True, 2), (20, False, 5)],
)
def test_loop_filter_paths_cross_validate(level, simple, sharp):
    """Both §15 filters (normal incl. hev/sharpness, simple) byte-exact."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (37, 45, 3), np.uint8)
    data = encode_vp8(
        img, 40, filter_level=level, filter_simple=simple, sharpness=sharp
    )
    mine = decode_vp8_yuv(_vp8_chunk(data))
    ref = ref_decode_yuv(data)
    for p, q, pl in zip(mine, ref, "YUV"):
        assert np.array_equal(p, q), (level, simple, sharp, pl)


# --------------------------------------------------- self round-trips

def test_self_roundtrip_reconstruction_quality():
    """Without libwebp: encode->decode must approximate the input to
    within the quantizer's worst-case band (sanity that the transform /
    quant / predict chain is coherent)."""
    img = render_text_image(CARD_LINES)
    rgb = decode_vp8(_vp8_chunk(encode_vp8(img, 0)))
    assert rgb.shape == img.shape
    assert np.abs(rgb.astype(int) - img.astype(int)).mean() < 8.0


def test_bool_coder_roundtrip_property():
    random.seed(7)
    for _ in range(100):
        seq = [
            (random.randint(1, 255), random.randint(0, 1))
            for _ in range(random.randint(1, 400))
        ]
        enc = BoolEncoder()
        for p, b in seq:
            enc.bool_(p, b)
        dec = BoolDecoder(enc.flush())
        assert all(dec.bool_(p) == b for p, b in seq)


def test_ocr_byte_exact_on_lossy_cards():
    """The corpus case: a card encoded lossily still OCRs byte-exact
    (quantization noise stays inside the binarization margin)."""
    img = render_text_image(CARD_LINES)
    want = canonical_text(CARD_LINES)
    for qi in (0, 4, 20):
        assert ocr_image_bytes(encode_vp8(img, qi)) == want, qi


@needs_libwebp
def test_ocr_byte_exact_on_libwebp_lossy_cards():
    img = render_text_image(CARD_LINES)
    want = canonical_text(CARD_LINES)
    for q in (75.0, 90.0, 99.0):
        assert ocr_image_bytes(ref_encode_lossy(img, q)) == want, q


# ----------------------------------------------------- routing + errors

def test_container_routing():
    img = render_text_image(CARD_LINES)
    data = encode_vp8(img, 4)
    assert sniff_image_format(data) == "webp"
    assert decode_image(data).shape == img.shape
    assert decode_webp(data).shape == img.shape


def test_malformed_streams_rejected():
    with pytest.raises(ImageFormatError):
        decode_vp8_yuv(b"\x00" * 5)  # too short
    with pytest.raises(ImageFormatError):
        decode_vp8_yuv(b"\x01" + b"\x00" * 20)  # interframe flag
    ok = _vp8_chunk(encode_vp8(np.full((4, 4, 3), 9, np.uint8)))
    bad = bytearray(ok)
    bad[3:6] = b"\x00\x00\x00"  # clobber start code
    with pytest.raises(ImageFormatError):
        decode_vp8_yuv(bytes(bad))


@pytest.mark.parametrize("shape", [(1, 1), (1, 17), (16, 16), (17, 33), (15, 3)])
def test_dimension_edges(shape):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (*shape, 3), np.uint8)
    out = decode_vp8(_vp8_chunk(encode_vp8(img, 10)))
    assert out.shape == img.shape
