"""Test-only ctypes bindings to the system libtiff, used as an
independent reference implementation for the from-scratch CCITT G4
codec in ``valere_ocr_ray/extract/ccitt.py``.

libtiff exposes the raw T.6 bitstream through raw-strip I/O: writing a
bilevel image with Compression=4 and reading the strip back RAW yields
reference-encoded G4 bytes; injecting our own G4 bytes as a raw strip
and reading the strip back DECODED runs the reference decoder over
them.  Both directions of the cross-validation ride those two paths.

Strictly a TEST oracle — the engine stays dependency-free.  Import is
gated; ``HAVE_LIBTIFF`` is the flag.
"""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

try:
    _lib = ctypes.CDLL("libtiff.so.6")
    HAVE_LIBTIFF = True
except OSError:  # pragma: no cover - present in CI container
    _lib = None
    HAVE_LIBTIFF = False

if HAVE_LIBTIFF:
    _lib.TIFFOpen.restype = ctypes.c_void_p
    _lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    _lib.TIFFClose.argtypes = [ctypes.c_void_p]
    _lib.TIFFWriteEncodedStrip.restype = ctypes.c_ssize_t
    _lib.TIFFWriteEncodedStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_ssize_t,
    ]
    _lib.TIFFWriteRawStrip.restype = ctypes.c_ssize_t
    _lib.TIFFWriteRawStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_ssize_t,
    ]
    _lib.TIFFReadEncodedStrip.restype = ctypes.c_ssize_t
    _lib.TIFFReadEncodedStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_ssize_t,
    ]
    _lib.TIFFReadRawStrip.restype = ctypes.c_ssize_t
    _lib.TIFFReadRawStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_ssize_t,
    ]
    # TIFFSetField is varargs; leave argtypes unset and pass c_int

_TAGS = {
    "width": 256, "length": 257, "bits": 258, "compression": 259,
    "photometric": 262, "spp": 277, "rows_per_strip": 278,
    "planar": 284, "t4options": 292,
}


def _pack_bits(ink: np.ndarray) -> bytes:
    """Boolean HxW (True=black) -> 1-bit MSB-first rows, byte padded
    (PHOTOMETRIC_MINISWHITE: set bit = black)."""
    return b"".join(np.packbits(row).tobytes() for row in ink)


def _unpack_bits(raw: bytes, w: int, h: int) -> np.ndarray:
    stride = (w + 7) // 8
    arr = np.frombuffer(raw, np.uint8, count=stride * h).reshape(h, stride)
    return np.unpackbits(arr, axis=1)[:, :w].astype(bool)


def _open_g4(path: str, mode: bytes, w: int, h: int, compression: int = 4,
             t4options: int | None = None):
    tif = _lib.TIFFOpen(path.encode(), mode)
    if not tif:
        raise RuntimeError("TIFFOpen failed")
    if mode.startswith(b"w"):
        # varargs call: the fixed args MUST be explicitly typed or
        # ctypes truncates the 64-bit handle to int (segfault)
        def f(tag: str, v: int) -> None:
            _lib.TIFFSetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(_TAGS[tag]),
                ctypes.c_int(v),
            )

        f("width", w)
        f("length", h)
        f("bits", 1)
        f("compression", compression)  # 4 = T.6, 3 = T.4 (G3), 2 = RLE (MH)
        if t4options is not None:
            f("t4options", t4options)  # bit 0 = 2-D (mixed) encoding
        f("photometric", 0)  # min-is-white
        f("spp", 1)
        f("rows_per_strip", h)
        f("planar", 1)
    return tif


def ref_encode_g4(ink: np.ndarray, compression: int = 4,
                  t4options: int | None = None) -> bytes:
    """Boolean ink array -> reference T.6 / T.4 / RLE bytes via libtiff."""
    h, w = ink.shape
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "x.tif")
        tif = _open_g4(path, b"w", w, h, compression, t4options)
        bits = _pack_bits(ink)
        n = _lib.TIFFWriteEncodedStrip(tif, 0, bits, len(bits))
        _lib.TIFFClose(tif)
        if n < 0:
            raise RuntimeError("libtiff G4 encode failed")
        tif = _lib.TIFFOpen(path.encode(), b"r")
        buf = ctypes.create_string_buffer(len(bits) + 4096)
        m = _lib.TIFFReadRawStrip(tif, 0, buf, len(buf))
        _lib.TIFFClose(tif)
        if m < 0:
            raise RuntimeError("libtiff raw strip read failed")
        return buf.raw[:m]


def ref_decode_g4(data: bytes, w: int, h: int, compression: int = 4,
                  t4options: int | None = None) -> np.ndarray | None:
    """T.6 / T.4 / RLE bytes -> boolean ink array via libtiff; None on reject."""
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "x.tif")
        tif = _open_g4(path, b"w", w, h, compression, t4options)
        n = _lib.TIFFWriteRawStrip(tif, 0, data, len(data))
        _lib.TIFFClose(tif)
        if n < 0:
            return None
        tif = _lib.TIFFOpen(path.encode(), b"r")
        stride = (w + 7) // 8
        buf = ctypes.create_string_buffer(stride * h)
        m = _lib.TIFFReadEncodedStrip(tif, 0, buf, len(buf))
        _lib.TIFFClose(tif)
        if m < 0:
            return None
        return _unpack_bits(buf.raw, w, h)
