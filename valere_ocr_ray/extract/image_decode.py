"""Dependency-free image decoding: BMP (24-bit BI_RGB) + PPM (P6).

The container ships no image libraries, but these two formats are
fully decodable with stdlib ``struct`` + numpy — so the multimodal
seam (``ops/multimodal.py``) has at least one REAL kernel behind it:
header parse → pixel array → feature, not a fake.  Formats outside
these two still route to ``error_no_decoder`` (the documented stub
path for PIL/ffmpeg-class decoders).

Both decoders return ``(h, w, 3) uint8`` RGB arrays.
"""

from __future__ import annotations

import struct

import numpy as np


class ImageFormatError(ValueError):
    """Payload is not a decodable BMP/PPM image."""


def sniff_image_format(payload: bytes) -> str | None:
    """'bmp' | 'ppm' | None (undecodable here)."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    return None


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) bottom-up/top-down BMP → RGB array."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ImageFormatError("not a BMP")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, width, height) = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ImageFormatError(f"unsupported DIB header size {hdr_size}")
    (planes, bpp) = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if planes != 1 or bpp != 24 or compression != 0:
        raise ImageFormatError(
            f"unsupported BMP (planes={planes}, bpp={bpp}, compression={compression})"
        )
    top_down = height < 0
    h = abs(height)
    if width <= 0 or h == 0:
        raise ImageFormatError("degenerate dimensions")
    row_bytes = (width * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    need = data_offset + row_bytes * h
    if len(payload) < need:
        raise ImageFormatError("truncated pixel data")
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_offset)
    rows = raw.reshape(h, row_bytes)[:, : width * 3].reshape(h, width, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB array → 24-bit BI_RGB BMP bytes (the test/synth twin of
    :func:`decode_bmp`; round-trip is exact)."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    bgr = pixels[:, :, ::-1]
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = bgr[::-1].reshape(h, w * 3)
    data = body.tobytes()
    file_size = 54 + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB array → binary P6 PPM bytes (the test/synth twin of
    :func:`decode_ppm`; round-trip is exact)."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → RGB array."""
    if payload[:2] != b"P6":
        raise ImageFormatError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace separated with
    # '#' comments allowed between tokens
    pos = 2
    fields: list[int] = []
    n = len(payload)
    while len(fields) < 3 and pos < n:
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            pos = n if nl == -1 else nl + 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            end = pos
            while end < n and payload[end : end + 1].isdigit():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
        else:
            raise ImageFormatError("malformed PPM header")
    if len(fields) < 3 or pos >= n:
        raise ImageFormatError("truncated PPM header")
    w, h, maxval = fields
    if maxval > 255 or w <= 0 or h <= 0:
        raise ImageFormatError(f"unsupported PPM (maxval={maxval})")
    pos += 1  # single whitespace after maxval
    need = w * h * 3
    if n - pos < need:
        raise ImageFormatError("truncated pixel data")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def decode_image(payload: bytes) -> np.ndarray:
    fmt = sniff_image_format(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    raise ImageFormatError("undecodable format (no BMP/PPM magic)")


def image_feature(pixels: np.ndarray, dim: int = 32) -> np.ndarray:
    """Real image feature from decoded pixels: a ``dim-2``-bin
    normalized luminance histogram + log-scaled decoded width/height —
    the decoded GEOMETRY feeds the feature, which is what makes this a
    genuine decode path rather than a byte hash."""
    h, w, _ = pixels.shape
    lum = (
        0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
    ).ravel()
    hist, _ = np.histogram(lum, bins=dim - 2, range=(0.0, 255.0))
    feat = np.empty(dim, dtype=np.float32)
    feat[: dim - 2] = hist / max(lum.size, 1)
    feat[dim - 2] = np.log1p(w)
    feat[dim - 1] = np.log1p(h)
    return feat


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing — the dependency-
    free resize kernel for the multimodal pipeline (real, not a stub;
    bilinear-class quality needs PIL, which stays behind the seam)."""
    h, w = pixels.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ri][:, ci]
