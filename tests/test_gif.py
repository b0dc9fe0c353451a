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


def test_animated_gif_frame_round_trip():
    from valere_ocr_ray.extract.gif import decode_gif_frames, encode_gif_frames

    rng = np.random.default_rng(4)
    lut = rng.integers(0, 256, (17, 3), dtype=np.uint8)
    frames = [lut[rng.integers(0, 17, (21, 30))] for _ in range(5)]
    gif = encode_gif_frames(frames)
    back = decode_gif_frames(gif)
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert (a == b).all()
    assert len(decode_gif_frames(gif, max_frames=2)) == 2
    # first-frame decode path sees frame 0 of the animation
    assert (decode_gif(gif) == frames[0]).all()


def test_animated_gif_composition_semantics():
    """GIF89a composition: partial frames land at (left, top),
    transparent pixels keep the prior canvas, disposal 2 restores the
    region to background."""
    import struct

    from valere_ocr_ray.extract.gif import (
        decode_gif_frames,
        gif_lzw_encode,
    )

    # hand-built 4x3 canvas, global palette [black, red, green]
    pal = b"\x00\x00\x00" + b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\xff"
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 3, 0x80 | 1 | (1 << 4), 0, 0)  # 4-color GCT
    out += pal

    def img_block(x, y, w, h, indexes, *, gce=None):
        b = bytearray()
        if gce is not None:
            packed, tidx = gce
            b += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, packed, 0, tidx, 0)
        b += struct.pack("<BHHHHB", 0x2C, x, y, w, h, 0)
        b.append(2)  # min code size
        data = gif_lzw_encode(bytes(indexes), 2)
        b.append(len(data))
        b += data
        b.append(0)
        return b

    # frame 1: full canvas of red, disposal 2 (packed bits 2-4;
    # restore to bg after)
    out += img_block(0, 0, 4, 3, [1] * 12, gce=(2 << 2, 0))
    # frame 2: 2x1 green patch at (1,1), disposal 1 + index 0
    # TRANSPARENT (packed bit 0)
    out += img_block(1, 1, 2, 1, [2, 0], gce=((1 << 2) | 1, 0))
    out.append(0x3B)

    f = decode_gif_frames(bytes(out))
    assert len(f) == 2
    assert (f[0] == [255, 0, 0]).all()  # all red
    # frame 2: canvas restored to background (black), patch green at
    # (1,1), transparent pixel at (1,2) stays background
    assert (f[1][1, 1] == [0, 255, 0]).all()
    assert (f[1][1, 2] == [0, 0, 0]).all()
    assert (f[1][0, 0] == [0, 0, 0]).all()


def test_animated_gif_disposal3_restore_previous():
    """Disposal 3: after the frame is shown, its region reverts to the
    canvas as it was BEFORE the frame drew — a later transparent frame
    must see the pre-patch pixels again (and disposal >= 4 raises)."""
    import struct

    import pytest as _pytest

    from valere_ocr_ray.extract.gif import (
        decode_gif_frames,
        gif_lzw_encode,
    )
    from valere_ocr_ray.extract.image_decode import ImageFormatError

    pal = b"\x00\x00\x00" + b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\xff"

    def gif(frames):
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", 4, 3, 0x80 | 1 | (1 << 4), 0, 0)
        out += pal
        for x, y, w, h, indexes, packed, tidx in frames:
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, packed, 0, tidx, 0)
            out += struct.pack("<BHHHHB", 0x2C, x, y, w, h, 0)
            out.append(2)
            data = gif_lzw_encode(bytes(indexes), 2)
            out.append(len(data))
            out += data
            out.append(0)
        out.append(0x3B)
        return bytes(out)

    f = decode_gif_frames(
        gif(
            [
                # frame 1: full canvas red, disposal 1 (leave)
                (0, 0, 4, 3, [1] * 12, 1 << 2, 0),
                # frame 2: 2x1 blue patch at (1,1), disposal 3 (restore prev)
                (1, 1, 2, 1, [3, 3], 3 << 2, 0),
                # frame 3: fully transparent full-frame, disposal 1 —
                # shows the canvas AFTER frame 2's region reverted
                (0, 0, 4, 3, [0] * 12, (1 << 2) | 1, 0),
            ]
        )
    )
    assert len(f) == 3
    assert (f[0] == [255, 0, 0]).all()
    assert (f[1][1, 1] == [0, 0, 255]).all() and (f[1][1, 2] == [0, 0, 255]).all()
    assert (f[1][0, 0] == [255, 0, 0]).all()
    # the patch reverted: frame 3 is all red again
    assert (f[2] == [255, 0, 0]).all()

    with _pytest.raises(ImageFormatError):
        decode_gif_frames(gif([(0, 0, 4, 3, [1] * 12, 4 << 2, 0)]))


def test_sample_gif_frames_stage(ray_session):
    """The multimodal frame-sample stage: one row per sampled frame
    (BMP payloads a downstream feature stage consumes for real),
    non-GIF payloads routed not dropped."""
    import ray.data as rd

    from valere_ocr_ray.extract.image_decode import decode_bmp
    from valere_ocr_ray.ops.multimodal import (
        extract_media_features,
        sample_gif_frames,
        synth_media_table,
    )

    t = synth_media_table(40)
    out = sample_gif_frames(
        rd.from_arrow(t), every_n=2, max_frames=3
    ).to_pandas()
    vids = out[out["media_type"] == "video"]
    assert (vids["status"] == "ok").all() and len(vids) > 0
    assert (vids["frame_index"] % 2 == 0).all()
    assert vids.groupby("media_id").size().max() <= 3
    # frames are real decodable BMPs of the logical screen
    px = decode_bmp(vids["payload"].iloc[0])
    assert px.shape == (18, 24, 3)
    # non-GIF media pass through as single skipped rows
    rest = out[out["media_type"] != "video"]
    assert (rest["status"] == "skipped_no_decoder").all()
    assert (rest["frame_index"] == -1).all()
    # composition: relabeled frames feature-extract through the REAL
    # image path (decoded geometry in the feature tail)
    frames_ds = rd.from_pandas(
        vids.assign(media_type="image", width=0, height=0, duration_ms=0)[
            ["media_id", "url", "media_type", "payload", "width", "height",
             "duration_ms"]
        ]
    )
    feats = extract_media_features(frames_ds, concurrency=2).to_pandas()
    assert (feats["status"] == "ok").all()
    assert (feats["decoded_w"] == 24).all() and (feats["decoded_h"] == 18).all()
