"""JBIG2 (T.88) codec: MQ coder pinned to the published Annex H.2
test vector in BOTH directions, generic-region round-trips, segment
parsing, the PDF /JBIG2Decode XObject leg, and seam routing for the
unsupported segment families.

No system JBIG2 library exists in this container, so the external
anchor is the spec's own known-answer test: decoding the published
30-byte MQ codeword yields a bit sequence whose re-encode reproduces
the codeword byte-for-byte (flush marker 0xFF 0xAC included) — a
self-consistent coder with any deviation from the spec's state table,
stuffing or flush rules cannot do that.
"""

from __future__ import annotations

import numpy as np
import pytest

from valere_ocr_ray.extract.glyph_font import (
    canonical_text,
    ocr_image,
    render_text_image,
)
from valere_ocr_ray.extract.image_decode import ImageFormatError
from valere_ocr_ray.extract.jbig2 import (
    MQDecoder,
    MQEncoder,
    decode_generic_region,
    decode_jbig2_embedded,
    encode_generic_region,
    encode_jbig2_embedded,
)

CARD_LINES = ["MEMBER ID: XQ998", "GROUP NO. G04217", "PLAN TYPE: PPO"]

# ITU-T T.88 Annex H.2 (== JPEG 2000 MQ test): the published codeword
_H2_CODEWORD = bytes.fromhex(
    "84C73BFCE1A1430402200000410DBB86F4317FFF88FF37471ADB6ADFFFAC"
)


def _cases() -> dict[str, np.ndarray]:
    rng = np.random.RandomState(3)
    return {
        "card": render_text_image(CARD_LINES)[:, :, 0] < 128,
        "noise": rng.rand(40, 67) < 0.5,
        "sparse": rng.rand(64, 256) < 0.01,
        "dense": rng.rand(30, 90) < 0.97,
        "empty": np.zeros((12, 50), bool),
        "full": np.ones((12, 50), bool),
        "one": np.array([[True]]),
        "narrow": rng.rand(200, 3) < 0.4,
        "stripes": np.tile((np.arange(120) % 7) < 3, (25, 1)),
    }


def test_mq_coder_matches_published_vector():
    """Decode the published H.2 codeword through a single context, then
    re-encode the decision sequence: the output must equal the
    published bytes exactly (mid-stream 0xFF stuffing AND the 0xFF 0xAC
    flush marker)."""
    dec = MQDecoder(_H2_CODEWORD)
    icx, mps = [0], [0]
    bits = [dec.decode(icx, mps, 0) for _ in range(256)]
    enc = MQEncoder()
    icx, mps = [0], [0]
    for d in bits:
        enc.encode(icx, mps, 0, d)
    assert enc.flush() == _H2_CODEWORD


def test_mq_roundtrip_fuzz():
    rng = np.random.RandomState(9)
    for trial in range(20):
        n = int(rng.randint(1, 2000))
        p = rng.rand()
        bits = (rng.rand(n) < p).astype(int).tolist()
        n_ctx = int(rng.randint(1, 8))
        ctxs = rng.randint(0, n_ctx, size=n).tolist()
        enc = MQEncoder()
        icx, mps = [0] * n_ctx, [0] * n_ctx
        for cx, d in zip(ctxs, bits):
            enc.encode(icx, mps, cx, d)
        data = enc.flush()
        dec = MQDecoder(data)
        icx, mps = [0] * n_ctx, [0] * n_ctx
        back = [dec.decode(icx, mps, cx) for cx in ctxs]
        assert back == bits, trial


def test_generic_region_roundtrip():
    for name, ink in _cases().items():
        h, w = ink.shape
        enc = encode_generic_region(ink)
        assert np.array_equal(decode_generic_region(enc, w, h), ink), name


def test_embedded_stream_roundtrip():
    for name, ink in _cases().items():
        h, w = ink.shape
        emb = encode_jbig2_embedded(ink)
        assert np.array_equal(decode_jbig2_embedded(emb, w, h), ink), name


def test_scanned_pdf_jbig2_ocr():
    """A /JBIG2Decode XObject decodes and OCRs byte-exact — the same
    text as its BMP twin (JBIG2 generic coding is lossless)."""
    from valere_ocr_ray.extract.pdf_images import (
        extract_pdf_images,
        ocr_pdf_images,
    )
    from valere_ocr_ray.sources.synth import build_scanned_pdf_bytes

    pdf = build_scanned_pdf_bytes(CARD_LINES, codec="jbig2")
    imgs = extract_pdf_images(pdf)
    assert len(imgs) == 1 and imgs[0] is not None
    text, n_found, n_decoded = ocr_pdf_images(pdf, ocr_image)
    assert (n_found, n_decoded) == (1, 1)
    assert text == canonical_text(CARD_LINES)


def test_unsupported_segments_route_not_crash():
    import struct

    # a symbol-dictionary segment (type 0) must raise, not decode junk
    hdr = struct.pack(">IBBBI", 0, 0, 0, 1, 4) + b"\x00\x00\x00\x00"
    with pytest.raises(ImageFormatError):
        decode_jbig2_embedded(hdr, 10, 10)
    # no region at all
    with pytest.raises(ImageFormatError):
        decode_jbig2_embedded(b"", 10, 10)
    # truncated segment data
    with pytest.raises(ImageFormatError):
        decode_jbig2_embedded(struct.pack(">IBBBI", 0, 38, 0, 1, 99), 10, 10)
    # a NON-CAUSAL AT pixel (current row, at-or-right-of x) is refused
    # loudly — no conformant encoder emits one
    with pytest.raises(ImageFormatError):
        decode_generic_region(b"\x00", 4, 4, at=((1, 0),) * 4)
    # unknown template id
    with pytest.raises(ImageFormatError):
        decode_generic_region(b"\x00", 4, 4, template=7)


def test_mmr_generic_region_decodes():
    """MMR=1 generic regions carry T.6 (G4) data — the existing CCITT
    decoder serves them through the same segment path."""
    import struct

    from valere_ocr_ray.extract.ccitt import encode_g4

    ink = _cases()["card"]
    h, w = ink.shape
    body = encode_g4(ink)
    region = struct.pack(">IIIIB", w, h, 0, 0, 0) + bytes([0x01]) + body
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 1, 0)
    stream = (
        struct.pack(">IBBBI", 0, 48, 0, 1, len(page_info)) + page_info
        + struct.pack(">IBBBI", 1, 38, 0, 1, len(region)) + region
    )
    assert np.array_equal(decode_jbig2_embedded(stream, w, h), ink)


def test_generic_template_path_equals_fast_path():
    """The template-list decoder on (template 0, nominal AT) must agree
    with the pinned incremental-window fast path on the same stream —
    this anchors the generic construction (sorted-by-(y,x), MSB-first)
    to the layout the published SLTP context 0x9B25 validates."""
    from valere_ocr_ray.extract.jbig2 import (
        _NOMINAL_AT0,
        _decode_generic_template,
    )

    for name, ink in _cases().items():
        h, w = ink.shape
        enc = encode_generic_region(ink)
        fast = decode_generic_region(enc, w, h)
        slow = _decode_generic_template(enc, w, h, 0, _NOMINAL_AT0, False)
        assert np.array_equal(slow, fast) and np.array_equal(slow, ink), name


def test_generic_templates_1_to_3_roundtrip():
    """Templates 1-3 (nominal single-AT layouts) and a non-nominal AT
    variant round-trip through the template-list encoder/decoder."""
    from valere_ocr_ray.extract.jbig2 import (
        _NOMINAL_AT,
        _encode_generic_template,
    )

    rng = np.random.RandomState(5)
    cases = {
        "text": render_text_image(CARD_LINES)[:, :, 0] < 128,
        "noise": rng.rand(31, 59) < 0.4,
        "sparse": rng.rand(20, 120) < 0.03,
    }
    for template in (1, 2, 3):
        at = _NOMINAL_AT[template]
        for name, ink in cases.items():
            h, w = ink.shape
            data = _encode_generic_template(ink, template, at)
            back = decode_generic_region(
                data, w, h, template=template, at=at
            )
            assert np.array_equal(back, ink), (template, name)
    # non-nominal (but causal) AT on template 2
    at = ((-1, -2),)
    ink = cases["noise"]
    h, w = ink.shape
    data = _encode_generic_template(ink, 2, at)
    assert np.array_equal(
        decode_generic_region(data, w, h, template=2, at=at), ink
    )


def test_arith_int_roundtrip():
    """Annex-A integer coder: every range boundary, negatives, OOB."""
    from valere_ocr_ray.extract.jbig2 import (
        _decode_int,
        _encode_int,
        _new_int_ctx,
    )

    vals = [0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436, 123456,
            -1, -4, -20, -84, -340, -4436, -999999, None, 7, None, -7]
    enc = MQEncoder()
    ctx = _new_int_ctx()
    for v in vals:
        _encode_int(enc, ctx, v)
    data = enc.flush()
    dec = MQDecoder(data)
    ctx = _new_int_ctx()
    assert [_decode_int(dec, ctx) for _ in vals] == vals


def test_symbol_page_pixel_identical():
    """The symbol-coded page (dictionary + text region) decodes
    pixel-identically to the glyph renderer's raster."""
    from valere_ocr_ray.extract.jbig2 import encode_jbig2_symbol_page

    for lines in (
        CARD_LINES,
        ["A"],
        ["SPACES  AND   GAPS", "", "LAST LINE 123"],
    ):
        ink = render_text_image(lines)[:, :, 0] < 128
        h, w = ink.shape
        emb = encode_jbig2_symbol_page(lines)
        assert np.array_equal(decode_jbig2_embedded(emb, w, h), ink), lines


def test_symbol_dict_multiple_height_classes():
    """A dictionary with two height classes decodes (the encoder twin
    emits one class; this exercises the class loop directly)."""
    import struct

    from valere_ocr_ray.extract.jbig2 import (
        _SD_AT_NOMINAL,
        _encode_generic_bitmap,
        _encode_int,
        _new_int_ctx,
        decode_symbol_dict,
    )

    rng = np.random.RandomState(6)
    short = [rng.rand(4, 3) < 0.5, rng.rand(4, 6) < 0.5]
    tall = [rng.rand(9, 5) < 0.5]
    enc = MQEncoder()
    iadh, iadw, iaex = _new_int_ctx(), _new_int_ctx(), _new_int_ctx()
    gb_icx = [0] * (1 << 16)
    gb_mps = [0] * (1 << 16)
    _encode_int(enc, iadh, 4)  # class 1: height 4
    wprev = 0
    for bm in short:
        _encode_int(enc, iadw, bm.shape[1] - wprev)
        wprev = bm.shape[1]
        _encode_generic_bitmap(enc, gb_icx, gb_mps, bm)
    _encode_int(enc, iadw, None)
    _encode_int(enc, iadh, 5)  # class 2: height 9
    wprev = 0
    for bm in tall:
        _encode_int(enc, iadw, bm.shape[1] - wprev)
        wprev = bm.shape[1]
        _encode_generic_bitmap(enc, gb_icx, gb_mps, bm)
    _encode_int(enc, iadw, None)
    _encode_int(enc, iaex, 0)
    _encode_int(enc, iaex, 3)
    payload = (
        struct.pack(">H", 0) + _SD_AT_NOMINAL + struct.pack(">II", 3, 3)
        + enc.flush()
    )
    out = decode_symbol_dict(payload)
    assert len(out) == 3
    for got, want in zip(out, short + tall):
        assert np.array_equal(got, want)


def test_scanned_pdf_symbol_jbig2_ocr():
    """A symbol-coded /JBIG2Decode XObject OCRs byte-exact — the
    jbig2enc-shape PDF reads like its generic-coded and BMP twins."""
    from valere_ocr_ray.extract.pdf_images import ocr_pdf_images
    from valere_ocr_ray.sources.synth import build_scanned_pdf_bytes

    pdf = build_scanned_pdf_bytes(CARD_LINES, codec="jbig2_sym")
    text, n_found, n_decoded = ocr_pdf_images(pdf, ocr_image)
    assert (n_found, n_decoded) == (1, 1)
    assert text == canonical_text(CARD_LINES)


def test_huffman_and_refinement_still_route():
    import struct

    # huffman symbol dict (flags bit0) raises, never decodes junk
    payload = struct.pack(">H", 1) + b"\x00" * 16
    hdr = struct.pack(">IBBBI", 0, 0, 0, 1, len(payload))
    with pytest.raises(ImageFormatError):
        decode_jbig2_embedded(hdr + payload, 10, 10)
    # refinement region (type 40) raises
    hdr = struct.pack(">IBBBI", 0, 40, 0, 1, 4) + b"\x00" * 4
    with pytest.raises(ImageFormatError):
        decode_jbig2_embedded(hdr, 10, 10)
