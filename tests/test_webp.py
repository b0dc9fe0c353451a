"""Lossless WebP (VP8L): round-trips over every encoder path, OCR
parity with the BMP twin, container handling, dispatch/routing, and
hand-assembled bitstreams for the decoder paths the encoder twin does
not emit (meta prefix groups, the color transform)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from valere_ocr_ray.extract.glyph_font import (
    canonical_text,
    ocr_image_bytes,
    render_text_image,
)
from valere_ocr_ray.extract.image_decode import (
    ImageFormatError,
    decode_image,
    encode_bmp,
    sniff_image_format,
)
from valere_ocr_ray.extract.webp import (
    _BitWriter,
    decode_webp,
    encode_webp,
    sniff_webp,
)

CARD_LINES = ["MEMBER ID: XQ998", "GROUP NO. G04217", "PLAN TYPE: PPO"]


def _rng():
    return np.random.default_rng(1234)


@pytest.mark.parametrize(
    "n_colors,shape",
    [(2, (23, 101)), (4, (37, 53)), (16, (29, 31)), (256, (40, 40))],
)
def test_palette_round_trip(n_colors, shape):
    rng = _rng()
    lut = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    lut = np.unique(lut, axis=0)
    img = lut[rng.integers(0, len(lut), shape)]
    out = decode_webp(encode_webp(img))
    assert np.array_equal(out, img)


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"subtract_green": True},
        {"predictor": True},
        {"subtract_green": True, "predictor": True},
        {"cache_bits": 0},
        {"cache_bits": 11},
    ],
)
def test_truecolor_round_trip(kwargs):
    img = _rng().integers(0, 256, (48, 64, 3), dtype=np.uint8)
    out = decode_webp(encode_webp(img, **kwargs))
    assert np.array_equal(out, img)


def test_gradient_predictor_round_trip():
    # smooth image: predictor + subtract-green shrink it AND round-trip
    g = np.linspace(0, 255, 96).astype(np.uint8)
    img = np.stack([np.tile(g, (64, 1))] * 3, -1)
    img = (img + _rng().integers(0, 2, img.shape)).astype(np.uint8)
    enc = encode_webp(img, predictor=True, subtract_green=True)
    assert np.array_equal(decode_webp(enc), img)
    assert len(enc) < img.size  # beats raw bytes comfortably


@pytest.mark.parametrize("shape", [(1, 1), (1, 7), (7, 1), (2, 600)])
def test_degenerate_shapes(shape):
    img = _rng().integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(img)), img)


def test_lz77_row_copy_compression():
    # constant image: the previous-row/previous-pixel LZ77 must bite
    img = np.full((30, 700, 3), 17, np.uint8)
    img[3, 5] = (1, 2, 3)
    enc = encode_webp(img)
    assert np.array_equal(decode_webp(enc), img)
    assert len(enc) < 200


def test_sniff_and_dispatch():
    img = render_text_image(CARD_LINES)
    wp = encode_webp(img)
    assert sniff_webp(wp)
    assert sniff_image_format(wp) == "webp"
    assert np.array_equal(decode_image(wp), img)
    assert not sniff_webp(b"RIFF\x00\x00\x00\x00WAVE")


def test_ocr_byte_identical_to_bmp_twin():
    img = render_text_image(CARD_LINES)
    got = ocr_image_bytes(encode_webp(img))
    assert got == ocr_image_bytes(encode_bmp(img))
    assert got == canonical_text(CARD_LINES)


def test_docmeta_routes_webp_as_image():
    from valere_ocr_ray.stages.docmeta import _sniff_kinds

    wp = encode_webp(render_text_image(CARD_LINES))
    kinds = _sniff_kinds(
        pa.array([wp, b"RIFF1234WAVEdata", b"<html>"], pa.binary())
    )
    assert kinds.to_pylist() == ["image", "unknown", "html"]


def test_lossy_vp8_routed_to_vp8_decoder():
    # a VP8 chunk is no longer a seam: it routes to extract.vp8, which
    # rejects this garbage body as a malformed keyframe
    lossy = b"RIFF" + struct.pack("<I", 16) + b"WEBPVP8 " + b"\x00" * 8
    with pytest.raises(ImageFormatError):
        decode_webp(lossy)
    # and a real lossy file decodes through the container path
    from valere_ocr_ray.extract.vp8 import encode_vp8
    img = _rng().integers(0, 256, (9, 11, 3), dtype=np.uint8)
    rgb = decode_webp(encode_vp8(img, 4))
    assert rgb.shape == (9, 11, 3)


def test_vp8x_extended_container():
    # VP8X header chunk first, VP8L after — decoder scans to the
    # image chunk (the extended-container layout, RFC 9649 §2.5)
    img = _rng().integers(0, 256, (9, 11, 3), dtype=np.uint8)
    plain = encode_webp(img)
    vp8l = plain[12:]  # the VP8L chunk (+ possible pad)
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    payload = b"WEBP" + vp8x + vp8l
    ext = b"RIFF" + struct.pack("<I", len(payload)) + payload
    assert np.array_equal(decode_webp(ext), img)


def test_truncated_and_garbage():
    img = _rng().integers(0, 256, (9, 11, 3), dtype=np.uint8)
    enc = encode_webp(img)
    with pytest.raises(ImageFormatError):
        decode_webp(enc[:11])
    with pytest.raises(ImageFormatError):
        decode_webp(b"RIFF" + struct.pack("<I", 4) + b"WEBP")


# ------------------------- hand-assembled streams (decoder-only paths)


def _container(body_bits: _BitWriter) -> bytes:
    body = b"\x2f" + body_bits.finish()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _simple1(bw: _BitWriter, sym: int) -> None:
    """1-symbol simple prefix code header (zero bits per use)."""
    bw.write_bits(1, 1)  # simple
    bw.write_bits(0, 1)  # num_symbols - 1 = 0
    if sym <= 1:
        bw.write_bits(0, 1)
        bw.write_bits(sym, 1)
    else:
        bw.write_bits(1, 1)
        bw.write_bits(sym, 8)


def _simple2(bw: _BitWriter, s0: int, s1: int) -> None:
    """2-symbol simple prefix code header (1 bit per use)."""
    assert s0 < s1 <= 255
    bw.write_bits(1, 1)
    bw.write_bits(1, 1)
    bw.write_bits(1, 1)
    bw.write_bits(s0, 8)
    bw.write_bits(s1, 8)


def test_meta_prefix_groups_hand_stream():
    # 8x2 image, huffman image with block bits 2: left 4 columns are
    # group 0, right 4 group 1; each group's codes are 1-symbol simple
    # codes so every pixel costs zero bits and the pixel value is the
    # group's fixed ARGB — decoding correctly REQUIRES the per-block
    # meta lookup
    w, h = 8, 2
    bw = _BitWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)  # alpha hint
    bw.write_bits(0, 3)  # version
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(0, 1)  # no color cache
    bw.write_bits(1, 1)  # meta prefix codes present
    bw.write_bits(0, 3)  # huffman bits = 2 -> 4x4 blocks -> 2x1 image
    # --- huffman image sub-stream (2x1): greens 0 and 1 = group ids
    bw.write_bits(0, 1)  # sub-stream: no color cache
    _simple2(bw, 0, 1)  # green: symbols {0,1}, 1 bit each
    _simple1(bw, 0)  # red
    _simple1(bw, 0)  # blue
    _simple1(bw, 0)  # alpha
    _simple1(bw, 0)  # distance
    bw.write_bits(0, 1)  # pixel 0: green=0 (code 0)
    bw.write_bits(1, 1)  # pixel 1: green=1 (code 1)
    # --- two groups of 5 codes, all 1-symbol
    for g, r, b, a in ((200, 10, 20, 255), (100, 1, 2, 3)):
        _simple1(bw, g)
        _simple1(bw, r)
        _simple1(bw, b)
        _simple1(bw, a)
        _simple1(bw, 0)  # distance
    out = decode_webp(_container(bw))
    left = np.array([10, 200, 20], np.uint8)
    right = np.array([1, 100, 2], np.uint8)  # alpha 3 dropped
    assert np.array_equal(out[:, :4], np.broadcast_to(left, (2, 4, 3)))
    assert np.array_equal(out[:, 4:], np.broadcast_to(right, (2, 4, 3)))


def test_color_transform_hand_stream():
    # 4x2 image under one color-transform block; the expected output is
    # an independent straight-line replay of the RFC 9649 §4.3 inverse
    g2r, g2b, r2b = 0x40, 0xF0, 0x08  # +64, -16, +8 as int8
    w, h = 4, 2
    bw = _BitWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)
    bw.write_bits(0, 3)
    bw.write_bits(1, 1)  # transform present
    bw.write_bits(1, 2)  # COLOR transform
    bw.write_bits(0, 3)  # size_bits = 2 -> one 4x4 block
    # cte sub-image (1x1): pixel r=r2b, g=g2b, b=g2r
    bw.write_bits(0, 1)  # no cache
    _simple1(bw, g2b)  # green
    _simple1(bw, r2b)  # red
    _simple1(bw, g2r)  # blue
    _simple1(bw, 255)  # alpha
    _simple1(bw, 0)  # distance
    bw.write_bits(0, 1)  # end of transforms
    bw.write_bits(0, 1)  # no cache (main)
    bw.write_bits(0, 1)  # no meta
    _simple2(bw, 1, 128)  # green
    _simple2(bw, 3, 250)  # red
    _simple2(bw, 7, 200)  # blue
    _simple1(bw, 255)  # alpha
    _simple1(bw, 0)  # distance
    rng = _rng()
    greens, reds, blues = (rng.integers(0, 2, (3, w * h))).astype(int)
    for i in range(w * h):
        bw.write_bits(int(greens[i]), 1)
        bw.write_bits(int(reds[i]), 1)
        bw.write_bits(int(blues[i]), 1)
    out = decode_webp(_container(bw))

    def s8(v):
        return v - 256 if v >= 128 else v

    def delta(t, c):
        return (s8(t) * s8(c)) >> 5

    gv = [1, 128]
    rv = [3, 250]
    bv = [7, 200]
    for i in range(w * h):
        g = gv[greens[i]]
        r = (rv[reds[i]] + delta(g2r, g)) & 0xFF
        b = (bv[blues[i]] + delta(g2b, g) + delta(r2b, r)) & 0xFF
        y, x = divmod(i, w)
        assert tuple(out[y, x]) == (r, g, b), (i, out[y, x], (r, g, b))


def test_synth_card_container_rotation_includes_webp():
    # corpus v8 rotates the scanned-card slot through seven containers;
    # the webp slot decodes + OCRs like the rest
    from valere_ocr_ray.sources import synth

    found = False
    for i in range(600, 700):  # hundreds block 6 -> webp
        if i % 100 == 95 and i % 2 == 1:
            row = synth.synth_row(i)
            html = row[2]
            if sniff_image_format(html) == "webp":
                found = True
                assert row[0].endswith(".webp")
                assert "MEMBER ID:" in ocr_image_bytes(html)
    assert found
