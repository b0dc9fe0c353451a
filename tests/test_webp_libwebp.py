"""Cross-validation of the from-scratch VP8L codec against the system
libwebp (the format's reference implementation), via the test-only
ctypes oracle in ``tests/libwebp_oracle.py``.

Both directions are pinned:

* every stream ``encode_webp`` emits must decode BIT-EXACTLY under
  libwebp (spec-valid output, not merely self-consistent), and
* every stream libwebp's lossless encoder emits must decode
  pixel-exactly under ``decode_webp`` (full read-side coverage of the
  reference encoder's constructs: code-16 repeats, the 5/16/6 quirk in
  the code-length-code order, max_symbol trimming, LZ77 plane codes,
  color cache, all-transforms streams).

These tests caught a real bug the self-roundtrip suite could not:
``_CL_ORDER`` had symbol 16 at the end instead of between 5 and 6, a
self-consistent misreading that only surfaces against an independent
implementation (any table with a code length >= 6 desynced).

Skips cleanly when libwebp.so.7 is absent.
"""

from __future__ import annotations

import numpy as np
import pytest

from valere_ocr_ray.extract.glyph_font import render_text_image
from valere_ocr_ray.extract.webp import decode_webp, encode_webp

from libwebp_oracle import (
    HAVE_LIBWEBP,
    ref_decode,
    ref_encode_lossless,
)

pytestmark = pytest.mark.skipif(not HAVE_LIBWEBP, reason="libwebp.so.7 absent")


def _cases() -> dict[str, np.ndarray]:
    rng = np.random.RandomState(7)
    yy, xx = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    grad = np.stack(
        [(xx * 4) % 256, (yy * 5) % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    return {
        # the OCR corpus case: 2-color card, bundled palette path
        "card": render_text_image(
            ["MEMBER ID: XQ998", "GROUP NO. G04217", "PLAN TYPE: PPO"]
        ),
        # palette paths at every bundling width (3/2/1/0 bits)
        "pal2": rng.randint(0, 2, (31, 41, 1), dtype=np.uint8).repeat(3, 2) * 255,
        "pal3": rng.randint(0, 3, (19, 23, 1), dtype=np.uint8).repeat(3, 2) * 100,
        "pal16": rng.randint(0, 16, (40, 40, 1), dtype=np.uint8).repeat(3, 2) * 17,
        "pal200": rng.randint(0, 200, (64, 64, 1), dtype=np.uint8).repeat(3, 2),
        # truecolor
        "noise": rng.randint(0, 256, (37, 53, 3), dtype=np.uint8),
        "grad": grad,
        # degenerate shapes
        "one": np.full((1, 1, 3), 77, np.uint8),
        "row": rng.randint(0, 256, (1, 300, 3), dtype=np.uint8),
        "col": rng.randint(0, 256, (300, 1, 3), dtype=np.uint8),
        "flat": np.full((50, 60, 3), 200, np.uint8),
        # LZ77-heavy: uniform bands (the case that exposed _CL_ORDER)
        "bands17": np.concatenate(
            [np.full((3, 8, 3), i * 15, np.uint8) for i in range(17)]
        ),
    }


@pytest.mark.parametrize("name", sorted(_cases()))
def test_my_streams_decode_under_libwebp(name):
    img = np.ascontiguousarray(_cases()[name])
    for kw in ({}, {"subtract_green": True}, {"predictor": True}, {"cache_bits": 0}):
        data = encode_webp(img, **kw)
        got = ref_decode(data)
        assert got is not None, f"libwebp rejected encode_webp({kw}) stream"
        assert np.array_equal(got, img), f"libwebp pixel mismatch for {kw}"


@pytest.mark.parametrize("name", sorted(_cases()))
def test_libwebp_streams_decode_under_mine(name):
    img = np.ascontiguousarray(_cases()[name])
    data = ref_encode_lossless(img)
    assert np.array_equal(decode_webp(data), img)


def test_synth_corpus_webp_cards_are_spec_valid():
    # the corpus generator's WebP cards — BOTH rotation slots, VP8L
    # lossless (slot 6) and VP8 lossy (slot 7) — must be readable by
    # ANY webp decoder, not just ours, and decode identically here
    from valere_ocr_ray.sources import synth

    n = 0
    for i in range(600, 1700):
        if i % 100 == 95 and (i // 100) % 8 in (6, 7):
            html = synth.synth_row(i)[2]
            got = ref_decode(html)
            assert got is not None, f"libwebp rejected synth card {i}"
            assert np.array_equal(got, decode_webp(html))
            n += 1
    assert n >= 2
