"""Test-only ctypes bindings to the system libwebp, used as an
independent reference implementation for the from-scratch VP8L codec
in ``valere_ocr_ray/extract/webp.py`` (and the lossy-VP8 work).

This is strictly a TEST oracle: the engine itself stays
dependency-free.  Import is gated — when the shared library is absent
the dependent tests skip.  ``HAVE_LIBWEBP`` is the gate flag.
"""

from __future__ import annotations

import ctypes

import numpy as np

try:
    _lib = ctypes.CDLL("libwebp.so.7")
    HAVE_LIBWEBP = True
except OSError:  # pragma: no cover - present in CI container
    _lib = None
    HAVE_LIBWEBP = False

if HAVE_LIBWEBP:
    _lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    _lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _lib.WebPEncodeRGB.restype = ctypes.c_size_t
    _lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    _lib.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),  # width
        ctypes.POINTER(ctypes.c_int),  # height
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),  # u
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),  # v
        ctypes.POINTER(ctypes.c_int),  # stride
        ctypes.POINTER(ctypes.c_int),  # uv_stride
    ]
    _lib.WebPFree.argtypes = [ctypes.c_void_p]


def ref_encode_lossless(img: np.ndarray) -> bytes:
    """RGB HxWx3 uint8 -> lossless (VP8L) WebP bytes via libwebp."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _lib.WebPEncodeLosslessRGB(
        img.tobytes(), w, h, w * 3, ctypes.byref(out)
    )
    if n == 0:
        raise RuntimeError("libwebp lossless encode failed")
    data = ctypes.string_at(out, n)
    _lib.WebPFree(out)
    return data


def ref_encode_lossy(img: np.ndarray, quality: float = 90.0) -> bytes:
    """RGB HxWx3 uint8 -> lossy (VP8) WebP bytes via libwebp."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _lib.WebPEncodeRGB(
        img.tobytes(), w, h, w * 3, ctypes.c_float(quality), ctypes.byref(out)
    )
    if n == 0:
        raise RuntimeError("libwebp lossy encode failed")
    data = ctypes.string_at(out, n)
    _lib.WebPFree(out)
    return data


def ref_decode_yuv(
    data: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """WebP bytes -> (Y, U, V) uint8 planes via libwebp (4:2:0; U/V are
    ceil-half size).  The YUV planes are fully determined by the VP8
    spec (reconstruction + loop filter), unlike RGB which also bakes in
    libwebp's upsampler — so this is the sharpest decode oracle."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = _lib.WebPDecodeYUV(
        data,
        len(data),
        ctypes.byref(w),
        ctypes.byref(h),
        ctypes.byref(up),
        ctypes.byref(vp),
        ctypes.byref(stride),
        ctypes.byref(uv_stride),
    )
    if not yp:
        return None
    ww, hh = w.value, h.value
    uvw, uvh = (ww + 1) // 2, (hh + 1) // 2

    def plane(ptr, rows, cols, rstride):
        # exact byte count — the final row may be shorter than stride
        raw = ctypes.string_at(ptr, (rows - 1) * rstride + cols)
        out = np.empty((rows, cols), np.uint8)
        flat = np.frombuffer(raw, np.uint8)
        for r in range(rows):
            out[r] = flat[r * rstride : r * rstride + cols]
        return out

    y = plane(yp, hh, ww, stride.value)
    u = plane(up, uvh, uvw, uv_stride.value)
    v = plane(vp, uvh, uvw, uv_stride.value)
    _lib.WebPFree(yp)
    return y, u, v


def ref_decode(data: bytes) -> np.ndarray | None:
    """WebP bytes -> RGB HxWx3 uint8 via libwebp; None if it rejects
    the stream (an invalid-bitstream verdict from the reference)."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _lib.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    arr = np.ctypeslib.as_array(p, (h.value, w.value, 3)).copy()
    _lib.WebPFree(p)
    return arr
