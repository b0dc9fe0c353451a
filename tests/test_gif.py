"""GIF codec: LZW (LSB-first, standard width growth), interlace,
palettes, dispatch, and OCR parity with the BMP twin."""

import numpy as np
import pytest

from valere_ocr_ray.extract.gif import (
    decode_gif,
    encode_gif,
    gif_lzw_decode,
    gif_lzw_encode,
)
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


def test_gif_lzw_round_trip():
    rng = np.random.default_rng(5)
    for mcs, n_syms in ((2, 4), (4, 16), (8, 256)):
        for size in (0, 1, 37, 5_000, 120_000):
            data = rng.integers(0, n_syms, size, dtype=np.uint8).tobytes()
            assert gif_lzw_decode(gif_lzw_encode(data, mcs), mcs) == data
    runs = bytes([i % 3 for i in range(50)]) * 500
    assert gif_lzw_decode(gif_lzw_encode(runs, 2), 2) == runs
    assert len(gif_lzw_encode(runs, 2)) < len(runs) // 3


def test_gif_kwkwk_branch():
    # 'ababab...' forces the code==len(table) (KwKwK) decode branch early
    data = b"\x00\x01" * 300
    assert gif_lzw_decode(gif_lzw_encode(data, 2), 2) == data


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_round_trip(interlace):
    rng = np.random.default_rng(9)
    # 23 distinct colors -> 5-bit palette padded to 32
    lut = rng.integers(0, 256, (23, 3), dtype=np.uint8)
    px = lut[rng.integers(0, 23, (33, 41))]
    gif = encode_gif(px, interlace=interlace)
    assert sniff_image_format(gif) == "gif"
    assert (decode_gif(gif) == px).all()
    assert (decode_image(gif) == px).all()


def test_gif_two_color_and_256_color():
    bw = np.zeros((9, 7, 3), dtype=np.uint8)
    bw[2:5, 1:3] = 255
    assert (decode_gif(encode_gif(bw)) == bw).all()
    rng = np.random.default_rng(1)
    lut = np.unique(rng.integers(0, 256, (600, 3), dtype=np.uint8), axis=0)[:256]
    px = lut[rng.integers(0, len(lut), (50, 60))]
    assert (decode_gif(encode_gif(px)) == px).all()


def test_gif_errors_route_to_format_error():
    with pytest.raises(ImageFormatError):
        decode_gif(b"GIF89a" + b"\x00" * 4)  # truncated header
    with pytest.raises(ImageFormatError):
        decode_gif(b"not a gif")
    # trailer with no image descriptor
    import struct

    hdr = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b"
    with pytest.raises(ImageFormatError):
        decode_gif(hdr)


def test_gif_card_ocr_matches_bmp_twin():
    lines = ["MEMBER ID: G99", "PLAN TYPE: HMO"]
    img = render_text_image(lines)
    want = canonical_text(lines)
    assert ocr_image_bytes(encode_bmp(img)) == want
    assert ocr_image_bytes(encode_gif(img)) == want
    assert ocr_image_bytes(encode_gif(img, interlace=True)) == want


def test_gif_rows_extract_in_pipeline(ray_session, tmp_path):
    """Corpus v7 rotates scanned cards into GIF at i>=595: those rows
    route as doc_kind='image', OCR back to 'ok', and classify like
    their BMP twins."""
    from valere_ocr_ray.pipelines.extract import run_resumable
    from valere_ocr_ray.sources.synth import synth_pages

    d = str(tmp_path / "in")
    synth_pages(d, 700, n_shards=2)
    out = str(tmp_path / "out")
    run_resumable(d, out, group_size=2)

    import pyarrow.dataset as pads

    df = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    gifs = df[df["url"].str.endswith(".gif")]
    assert len(gifs) == 1  # i=595
    assert (gifs["status"] == "ok").all()
    assert (gifs["doc_kind"].astype(str) == "image").all()
    assert (gifs["doc_type"].astype(str) == "INSURANCE_CARD").all()
    assert gifs["extracted_text"].str.contains("MEMBER ID").all()
    assert gifs["ocr_used"].all()
