"""Dependency-free lossy-WebP (VP8 keyframe, RFC 6386) decoder +
encoder twin.

Closes the LAST raster codec seam: after VP8L (``webp.py``), TIFF, GIF
and progressive JPEG, lossy ``VP8 `` chunks were the one remaining
web-image construct routed to :class:`ImageFormatError`.  The
reference's upload filter admits generic web images
(``IDD/finalcodes/InsuranceCard1.py:83-84``) and lossy WebP dominates
crawled corpora by volume, so a 100 TB extraction pass cannot treat it
as exotic.

Scope — keyframe (intra) decoding, which is the entire format for
WebP stills (a WebP file's VP8 chunk is always a keyframe):

* RFC 6386 §7 boolean arithmetic decoder, §9 frame/segment/filter/
  quantizer headers, multi token partitions;
* §11 keyframe intra modes (fixed-prob Y/UV trees, context-coded
  4x4 B modes);
* §13 DCT token trees over the fixed probability tables in
  ``vp8_tables.py`` (plus in-stream updates), zigzag placement,
  category extra bits;
* §14 dequantization (incl. the Y2 155/100 and chroma-DC-index-117
  quirks), inverse WHT, exact integer inverse DCT;
* §12 all intra predictors, byte-exact to the reference decoder
  (border 127/129 seeding, DC no-top/no-left variants, the
  top-right replication rule for 4x4 rows 1-3);
* §15 both loop filters (normal 2/4/6-tap with hev logic, simple),
  applied in raster MB order with the exact limit/ilevel/hev
  derivation;
* libwebp's output stage re-derived for RGB parity: the "fancy"
  3/1 + diagonal 4:2:0 chroma upsampler and the 16.6-bit fixed-point
  YUV->RGB kernel, so ``decode`` here is pinned BIT-EXACT against
  ``WebPDecodeRGB`` (and the YUV planes against ``WebPDecodeYUV``)
  in ``tests/test_vp8.py``.

``encode_vp8`` is the test/synth twin: a spec-valid minimal keyframe
encoder (all-B_PRED macroblocks, DC subblock prediction, forward
DCT + flat quantizer, fixed coefficient probabilities, loop filter
level 0, one token partition) whose output both this decoder and
libwebp decode to the identical YUV reconstruction.

Ref parity note: the reference pipeline ships raster uploads to AWS
Textract without transcoding (``IDD/finalcodes/SignedAgreement.py``);
this module exists so the Ray engine can decode the same uploads
in-process inside ``map_batches`` actors with zero native deps.

Scale note: pure-Python VP8 decode runs ~0.2-0.5 MP/s per core (the
boolean coder and the in-loop filter are inherently sequential per
macroblock; the numpy kernels are at per-call-overhead floor).  The
extraction stage parallelizes ACROSS images (one actor per core), so
node throughput scales linearly with cores, and the F2 size-cap
router bounds the worst-case single payload.  For a decode-bound
corpus the right lever is more actors, not a faster kernel.
"""

from __future__ import annotations

import struct

import numpy as np

from valere_ocr_ray.extract.image_decode import ImageFormatError
from valere_ocr_ray.extract.vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

# ---------------------------------------------------------------- bool

class BoolDecoder:
    """RFC 6386 §7 boolean arithmetic decoder (reference algorithm)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.value = 0
        self.pos = 0
        for _ in range(2):
            b = data[self.pos] if self.pos < len(data) else 0
            self.value = (self.value << 8) | b
            self.pos += 1
        self.range = 255
        self.bit_count = 0

    def bool_(self, probability: int) -> int:
        split = 1 + (((self.range - 1) * probability) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                b = self.data[self.pos] if self.pos < len(self.data) else 0
                self.value |= b
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool_(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool_(128) else v

    def flagged_signed(self, n: int) -> int:
        return self.signed(n) if self.bool_(128) else 0


# ---------------------------------------------------------- fixed data

# intra mode ids (RFC 6386 §11.2)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
(
    B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
    B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED,
) = range(10)

_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROB = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_MODE_PROB = (142, 114, 183)
_BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)
_SEGMENT_TREE = (2, 4, 0, -1, -2, -3)  # leaf 0 encoded as 0 (root-only)

# KF_BMODE_PROBS was recovered from libwebp's .rodata, whose intra-4x4
# mode NUMBERING differs from RFC 6386's: libwebp orders
# (DC,TM,VE,HE,RD,VR,LD,VL,HD,HU) where the RFC orders
# (DC,TM,VE,HE,LD,RD,VR,VL,HD,HU).  The bitstream codes are identical;
# only the table's context-row layout follows libwebp ids.  Permute it
# once into RFC indexing so `KF_BMODE[a_rfc, l_rfc]` is correct.
# (Found the hard way: indexing with RFC ids reads the wrong context
# row whenever a neighbor is LD/RD/VR — same early decode, silently
# forked arithmetic state, a flipped mode many reads later.)
_RFC2LW = np.array((0, 1, 2, 3, 6, 4, 5, 7, 8, 9))
KF_BMODE = KF_BMODE_PROBS[np.ix_(_RFC2LW, _RFC2LW)]
# plain-int copy: the arithmetic decoder runs per-bool in Python, and
# numpy SCALARS make every (range*prob)>>8 ~3x slower than ints
_KF_BMODE_PY = [[tuple(int(x) for x in row) for row in plane] for plane in KF_BMODE]
_UPD_PY = COEFF_UPDATE_PROBS.tolist()  # header flag loop: ints, not numpy

# §13.2 / §13.5
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
_PCAT = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)


def _tree_read(bd: BoolDecoder, tree, probs, start: int = 0) -> int:
    i = tree[start + bd.bool_(probs[start >> 1])]
    while i > 0:
        i = tree[i + bd.bool_(probs[i >> 1])]
    return -i


# ---------------------------------------------------------- dequant

def _clamp_q(v: int, hi: int = 127) -> int:
    return 0 if v < 0 else hi if v > hi else v


class _QuantFactors:
    """Per-segment dequantization factors (RFC 6386 §9.6, §14.1)."""

    __slots__ = ("y1", "y2", "uv")

    def __init__(self, q: int, d) -> None:
        self.y1 = (
            int(DC_QLOOKUP[_clamp_q(q + d["y_dc"])]),
            int(AC_QLOOKUP[_clamp_q(q)]),
        )
        y2ac = (int(AC_QLOOKUP[_clamp_q(q + d["y2_ac"])]) * 155) // 100
        self.y2 = (
            int(DC_QLOOKUP[_clamp_q(q + d["y2_dc"])]) * 2,
            y2ac if y2ac >= 8 else 8,
        )
        self.uv = (
            int(DC_QLOOKUP[_clamp_q(q + d["uv_dc"], 117)]),
            int(AC_QLOOKUP[_clamp_q(q + d["uv_ac"])]),
        )


# ---------------------------------------------------------- residuals

def _decode_block(
    bd: BoolDecoder, probs, first: int, ctx: int, dq: tuple[int, int]
) -> tuple[list[int], bool]:
    """One 4x4 coefficient block: token tree walk (RFC 6386 §13.3),
    extra-bit categories, sign, zigzag placement, dequantization.
    Returns (16 dequantized coeffs in raster order, any_nonzero).

    Hot kernel: the bool-decoder state lives in locals for the whole
    block (a closure over ``nonlocal`` state instead of per-bool
    method dispatch) — tokens are most of a frame's bool reads."""
    data = bd.data
    ln = len(data)
    val = bd.value
    rng = bd.range
    pos = bd.pos
    bc = bd.bit_count

    def boolf(p: int) -> int:
        nonlocal val, rng, pos, bc
        split = 1 + (((rng - 1) * p) >> 8)
        big = split << 8
        if val >= big:
            ret = 1
            rng -= split
            val -= big
        else:
            ret = 0
            rng = split
        while rng < 128:
            val <<= 1
            rng <<= 1
            bc += 1
            if bc == 8:
                bc = 0
                if pos < ln:
                    val |= data[pos]
                pos += 1
        return ret

    out = [0] * 16
    nz = False
    c = first
    skip_eob = False
    dq_dc, dq_ac = dq
    while c < 16:
        p = probs[_BANDS[c]][ctx]
        if not skip_eob:
            if not boolf(p[0]):
                break
        if not boolf(p[1]):  # DCT_0
            ctx = 0
            skip_eob = True
            c += 1
            continue
        skip_eob = False
        if not boolf(p[2]):
            val_c = 1
            ctx = 1
        else:
            ctx = 2
            if not boolf(p[3]):
                if not boolf(p[4]):
                    val_c = 2
                else:
                    val_c = 3 + boolf(p[5])
            else:
                if not boolf(p[6]):
                    cat = 0 if not boolf(p[7]) else 1
                else:
                    if not boolf(p[8]):
                        cat = 2 if not boolf(p[9]) else 3
                    else:
                        cat = 4 if not boolf(p[10]) else 5
                extra = 0
                for pb in _PCAT[cat]:  # extra bits, MSB first
                    extra = (extra << 1) | boolf(pb)
                val_c = _CAT_BASE[cat] + extra
        if boolf(128):
            val_c = -val_c
        out[_ZIGZAG[c]] = val_c * (dq_ac if c > 0 else dq_dc)
        nz = True
        c += 1
    bd.value = val
    bd.range = rng
    bd.pos = pos
    bd.bit_count = bc
    return out, nz


# ---------------------------------------------------------- transforms

def _iwht(coeffs: list[int]) -> list[int]:
    """Inverse Walsh-Hadamard for the Y2 block (RFC 6386 §14.3):
    returns the 16 DC values, one per Y subblock in raster order."""
    tmp = [0] * 16
    for i in range(4):
        a0 = coeffs[i] + coeffs[12 + i]
        a1 = coeffs[4 + i] + coeffs[8 + i]
        a2 = coeffs[4 + i] - coeffs[8 + i]
        a3 = coeffs[i] - coeffs[12 + i]
        tmp[i] = a0 + a1
        tmp[4 + i] = a3 + a2
        tmp[8 + i] = a0 - a1
        tmp[12 + i] = a3 - a2
    out = [0] * 16
    for i in range(4):
        dc = tmp[i * 4] + 3
        a0 = dc + tmp[i * 4 + 3]
        a1 = tmp[i * 4 + 1] + tmp[i * 4 + 2]
        a2 = tmp[i * 4 + 1] - tmp[i * 4 + 2]
        a3 = dc - tmp[i * 4 + 3]
        out[i * 4 + 0] = (a0 + a1) >> 3
        out[i * 4 + 1] = (a3 + a2) >> 3
        out[i * 4 + 2] = (a0 - a1) >> 3
        out[i * 4 + 3] = (a3 - a2) >> 3
    return out


def _idct(c: list[int]) -> list[int]:
    """Exact integer 4x4 inverse DCT (RFC 6386 §14.4; 20091/35468
    fixed-point rotation).  Input/output in raster order."""
    t = [0] * 16
    for i in range(4):
        a1 = c[i] + c[8 + i]
        b1 = c[i] - c[8 + i]
        c4, c12 = c[4 + i], c[12 + i]
        c1 = ((c4 * 35468) >> 16) - (c12 + ((c12 * 20091) >> 16))
        d1 = (c4 + ((c4 * 20091) >> 16)) + ((c12 * 35468) >> 16)
        t[i] = a1 + d1
        t[4 + i] = b1 + c1
        t[8 + i] = b1 - c1
        t[12 + i] = a1 - d1
    out = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = t[r] + t[r + 2]
        b1 = t[r] - t[r + 2]
        t1, t3 = t[r + 1], t[r + 3]
        c1 = ((t1 * 35468) >> 16) - (t3 + ((t3 * 20091) >> 16))
        d1 = (t1 + ((t1 * 20091) >> 16)) + ((t3 * 35468) >> 16)
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
    return out


def _add_residual(dst: np.ndarray, y: int, x: int, res: list[int]) -> None:
    block = dst[y : y + 4, x : x + 4].astype(np.int32)
    block += np.asarray(res, dtype=np.int32).reshape(4, 4)
    dst[y : y + 4, x : x + 4] = np.clip(block, 0, 255).astype(np.uint8)


# ---------------------------------------------------------- prediction

def _pred_whole(
    frame: np.ndarray, y0: int, x0: int, size: int, mode: int,
    mb_x: int, mb_y: int,
) -> None:
    """16x16 luma / 8x8 chroma intra prediction (RFC 6386 §12.2) into
    ``frame[y0:y0+size, x0:x0+size]``, with the reference border
    conventions (above=127 / left=129, DC no-top/no-left variants)."""
    tgt = frame[y0 : y0 + size, x0 : x0 + size]
    has_top = mb_y > 0
    has_left = mb_x > 0
    if mode == DC_PRED:
        s, n = 0, 0
        if has_top:
            s += int(frame[y0 - 1, x0 : x0 + size].astype(np.int32).sum())
            n += size
        if has_left:
            s += int(frame[y0 : y0 + size, x0 - 1].astype(np.int32).sum())
            n += size
        if n == 0:
            dc = 128  # no-top-left variant
        else:  # (s + n/2) / n with n a power of two
            dc = (s + (n >> 1)) >> n.bit_length() - 1
        tgt[:, :] = dc
        return
    above = (
        frame[y0 - 1, x0 : x0 + size].astype(np.int32)
        if has_top
        else np.full(size, 127, np.int32)
    )
    left = (
        frame[y0 : y0 + size, x0 - 1].astype(np.int32)
        if has_left
        else np.full(size, 129, np.int32)
    )
    if mode == V_PRED:
        tgt[:, :] = above.astype(np.uint8)[None, :]
    elif mode == H_PRED:
        tgt[:, :] = left.astype(np.uint8)[:, None]
    else:  # TM_PRED
        if not has_top:
            corner = 127
        elif not has_left:
            corner = 129
        else:
            corner = int(frame[y0 - 1, x0 - 1])
        vals = left[:, None] + above[None, :] - corner
        tgt[:, :] = np.clip(vals, 0, 255).astype(np.uint8)


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


def _pred4(mode: int, t: list[int], left: list[int]) -> list[list[int]]:
    """One 4x4 subblock predictor (RFC 6386 §12.3).  ``t`` holds the 9
    top context pixels [above-left, above*4, above-right*4]; ``left``
    the 4 left pixels.  Returns rows[4][4]."""
    x = t[0]
    a, b, c, d, e, f, g, h = t[1:9]
    i, j, k, l = left
    if mode == B_DC_PRED:
        dc = (a + b + c + d + i + j + k + l + 4) >> 3
        return [[dc] * 4 for _ in range(4)]
    if mode == B_TM_PRED:
        top = (a, b, c, d)
        return [
            [min(255, max(0, lv + tv - x)) for tv in top] for lv in (i, j, k, l)
        ]
    if mode == B_VE_PRED:
        row = [
            _avg3(x, a, b), _avg3(a, b, c), _avg3(b, c, d), _avg3(c, d, e),
        ]
        return [row[:] for _ in range(4)]
    if mode == B_HE_PRED:
        return [
            [_avg3(x, i, j)] * 4,
            [_avg3(i, j, k)] * 4,
            [_avg3(j, k, l)] * 4,
            [_avg3(k, l, l)] * 4,
        ]
    o = [[0] * 4 for _ in range(4)]
    if mode == B_LD_PRED:
        o[0][0] = _avg3(a, b, c)
        o[1][0] = o[0][1] = _avg3(b, c, d)
        o[2][0] = o[1][1] = o[0][2] = _avg3(c, d, e)
        o[3][0] = o[2][1] = o[1][2] = o[0][3] = _avg3(d, e, f)
        o[1][3] = o[2][2] = o[3][1] = _avg3(e, f, g)
        o[2][3] = o[3][2] = _avg3(f, g, h)
        o[3][3] = _avg3(g, h, h)
    elif mode == B_RD_PRED:
        o[3][0] = _avg3(j, k, l)
        o[3][1] = o[2][0] = _avg3(i, j, k)
        o[3][2] = o[2][1] = o[1][0] = _avg3(x, i, j)
        o[3][3] = o[2][2] = o[1][1] = o[0][0] = _avg3(a, x, i)
        o[2][3] = o[1][2] = o[0][1] = _avg3(b, a, x)
        o[1][3] = o[0][2] = _avg3(c, b, a)
        o[0][3] = _avg3(d, c, b)
    elif mode == B_VR_PRED:
        o[0][0] = o[2][1] = _avg2(x, a)
        o[0][1] = o[2][2] = _avg2(a, b)
        o[0][2] = o[2][3] = _avg2(b, c)
        o[0][3] = _avg2(c, d)
        o[3][0] = _avg3(k, j, i)
        o[2][0] = _avg3(j, i, x)
        o[1][0] = o[3][1] = _avg3(i, x, a)
        o[1][1] = o[3][2] = _avg3(x, a, b)
        o[1][2] = o[3][3] = _avg3(a, b, c)
        o[1][3] = _avg3(b, c, d)
    elif mode == B_VL_PRED:
        o[0][0] = _avg2(a, b)
        o[0][1] = o[2][0] = _avg2(b, c)
        o[0][2] = o[2][1] = _avg2(c, d)
        o[0][3] = o[2][2] = _avg2(d, e)
        o[1][0] = _avg3(a, b, c)
        o[1][1] = o[3][0] = _avg3(b, c, d)
        o[1][2] = o[3][1] = _avg3(c, d, e)
        o[1][3] = o[3][2] = _avg3(d, e, f)
        o[2][3] = _avg3(e, f, g)
        o[3][3] = _avg3(f, g, h)
    elif mode == B_HD_PRED:
        o[0][0] = o[1][2] = _avg2(i, x)
        o[1][0] = o[2][2] = _avg2(j, i)
        o[2][0] = o[3][2] = _avg2(k, j)
        o[3][0] = _avg2(l, k)
        o[0][3] = _avg3(a, b, c)
        o[0][2] = _avg3(x, a, b)
        o[0][1] = o[1][3] = _avg3(i, x, a)
        o[1][1] = o[2][3] = _avg3(x, i, j)
        o[2][1] = o[3][3] = _avg3(i, j, k)
        o[3][1] = _avg3(j, k, l)
    elif mode == B_HU_PRED:
        o[0][0] = _avg2(i, j)
        o[0][2] = o[1][0] = _avg2(j, k)
        o[1][2] = o[2][0] = _avg2(k, l)
        o[0][1] = _avg3(i, j, k)
        o[0][3] = o[1][1] = _avg3(j, k, l)
        o[1][3] = o[2][1] = _avg3(k, l, l)
        o[2][2] = o[2][3] = o[3][0] = o[3][1] = o[3][2] = o[3][3] = l
    else:  # pragma: no cover - mode ids are exhaustive
        raise ImageFormatError(f"bad 4x4 intra mode {mode}")
    return o


# ---------------------------------------------------------- headers

class _Headers:
    """Parsed first-partition frame headers (RFC 6386 §9)."""

    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_quant",
        "seg_filter", "seg_probs",
        "filter_simple", "filter_level", "sharpness",
        "lf_delta", "ref_lf_delta", "mode_lf_delta",
        "quants", "use_skip", "prob_skip", "coeff_probs",
    )


def _parse_headers(bd: BoolDecoder, width: int, height: int) -> _Headers:
    h = _Headers()
    h.width, h.height = width, height
    h.mb_w = (width + 15) >> 4
    h.mb_h = (height + 15) >> 4

    bd.bool_(128)  # color_space (keyframe; must be 0, tolerated)
    bd.bool_(128)  # clamping_type

    # §9.3 segmentation
    h.seg_enabled = bd.bool_(128)
    h.seg_update_map = False
    h.seg_abs = False
    h.seg_quant = [0, 0, 0, 0]
    h.seg_filter = [0, 0, 0, 0]
    h.seg_probs = [255, 255, 255]
    if h.seg_enabled:
        h.seg_update_map = bool(bd.bool_(128))
        update_data = bd.bool_(128)
        if update_data:
            h.seg_abs = bool(bd.bool_(128))
            for i in range(4):
                h.seg_quant[i] = bd.flagged_signed(7)
            for i in range(4):
                h.seg_filter[i] = bd.flagged_signed(6)
        if h.seg_update_map:
            for i in range(3):
                h.seg_probs[i] = bd.literal(8) if bd.bool_(128) else 255

    # §9.4 loop filter
    h.filter_simple = bool(bd.bool_(128))
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta = bool(bd.bool_(128))
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta:
        if bd.bool_(128):  # update flag
            for i in range(4):
                if bd.bool_(128):
                    h.ref_lf_delta[i] = bd.signed(6)
            for i in range(4):
                if bd.bool_(128):
                    h.mode_lf_delta[i] = bd.signed(6)

    n_parts = 1 << bd.literal(2)  # §9.5

    # §9.6 quantizer indices
    y_ac_qi = bd.literal(7)
    deltas = {
        "y_dc": bd.flagged_signed(4),
        "y2_dc": bd.flagged_signed(4),
        "y2_ac": bd.flagged_signed(4),
        "uv_dc": bd.flagged_signed(4),
        "uv_ac": bd.flagged_signed(4),
    }
    h.quants = []
    for s in range(4):
        if h.seg_enabled:
            q = h.seg_quant[s] if h.seg_abs else y_ac_qi + h.seg_quant[s]
        else:
            q = y_ac_qi
        h.quants.append(_QuantFactors(_clamp_q(q), deltas))

    bd.bool_(128)  # refresh_entropy_probs (keyframe: state is transient)

    # §13.4 coefficient probability updates
    probs = COEFF_PROBS.copy()
    for i in range(4):
        for j in range(8):
            for k in range(3):
                row_u = _UPD_PY[i][j][k]
                for t in range(11):
                    if bd.bool_(row_u[t]):
                        probs[i, j, k, t] = bd.literal(8)
    # hand the token decoder PYTHON ints (numpy scalars are ~3x
    # slower in the per-bool arithmetic, and tokens dominate decode)
    h.coeff_probs = probs.tolist()

    h.use_skip = bool(bd.bool_(128))
    h.prob_skip = bd.literal(8) if h.use_skip else 0
    return (h, n_parts)


# ---------------------------------------------------------- frame decode

_WHOLE_TO_B = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
               H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}


def decode_vp8_yuv(
    payload: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """VP8 chunk body -> (Y, U, V) uint8 planes, cropped to the frame
    size (U/V are ceil-half).  Bit-exact with the reference decoder:
    reconstruction + in-loop filtering per RFC 6386 §12-15."""
    if len(payload) < 10:
        raise ImageFormatError("VP8 payload too short")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 1:
        raise ImageFormatError("VP8 interframe in a still image")
    part1_size = tag >> 5
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ImageFormatError("bad VP8 keyframe start code")
    (wv,) = struct.unpack_from("<H", payload, 6)
    (hv,) = struct.unpack_from("<H", payload, 8)
    width, height = wv & 0x3FFF, hv & 0x3FFF
    if width == 0 or height == 0:
        raise ImageFormatError("empty VP8 frame")
    body = payload[10:]
    if part1_size > len(body):
        raise ImageFormatError("truncated VP8 first partition")
    bd = BoolDecoder(body[:part1_size])
    h, n_parts = _parse_headers(bd, width, height)
    mb_w, mb_h = h.mb_w, h.mb_h

    # token partition directory (§9.5): sizes trail the first partition
    rest = body[part1_size:]
    parts: list[BoolDecoder] = []
    dir_len = 3 * (n_parts - 1)
    off = dir_len
    for p in range(n_parts):
        if p < n_parts - 1:
            sz = rest[3 * p] | (rest[3 * p + 1] << 8) | (rest[3 * p + 2] << 16)
        else:
            sz = len(rest) - off
        parts.append(BoolDecoder(rest[off : off + sz]))
        off += sz

    # ---- pass 1: macroblock headers (modes live in partition 1)
    segments = np.zeros((mb_h, mb_w), np.int32)
    skips = np.zeros((mb_h, mb_w), bool)
    ymodes = np.zeros((mb_h, mb_w), np.int32)
    uvmodes = np.zeros((mb_h, mb_w), np.int32)
    bmodes = np.zeros((mb_h, mb_w, 4, 4), np.int32)
    above_b = np.full((mb_w, 4), B_DC_PRED, np.int32)  # bottom row per col
    for my in range(mb_h):
        left_b = np.full(4, B_DC_PRED, np.int32)
        for mx in range(mb_w):
            if h.seg_update_map:
                segments[my, mx] = _tree_read(bd, _SEGMENT_TREE, h.seg_probs)
            if h.use_skip:
                skips[my, mx] = bool(bd.bool_(h.prob_skip))
            ym = _tree_read(bd, _KF_YMODE_TREE, _KF_YMODE_PROB)
            ymodes[my, mx] = ym
            if ym == B_PRED:
                for r in range(4):
                    for c in range(4):
                        a = above_b[mx, c] if r == 0 else bmodes[my, mx, r - 1, c]
                        l = left_b[r] if c == 0 else bmodes[my, mx, r, c - 1]
                        bm = _tree_read(
                            bd, _BMODE_TREE, _KF_BMODE_PY[a][l]
                        )
                        bmodes[my, mx, r, c] = bm
            else:
                bmodes[my, mx, :, :] = _WHOLE_TO_B[ym]
            above_b[mx] = bmodes[my, mx, 3]
            left_b = bmodes[my, mx, :, 3].copy()
            uvmodes[my, mx] = _tree_read(bd, _UV_MODE_TREE, _KF_UV_MODE_PROB)

    # ---- pass 2: residual decode + reconstruction (unfiltered)
    Y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    has_coeffs = np.zeros((mb_h, mb_w), bool)

    # nonzero contexts: above per mb column, left per mb row
    a_y = np.zeros((mb_w, 4), bool)
    a_u = np.zeros((mb_w, 2), bool)
    a_v = np.zeros((mb_w, 2), bool)
    a_y2 = np.zeros(mb_w, bool)
    probs = h.coeff_probs

    for my in range(mb_h):
        bdt = parts[my % n_parts]
        l_y = np.zeros(4, bool)
        l_u = np.zeros(2, bool)
        l_v = np.zeros(2, bool)
        l_y2 = False
        for mx in range(mb_w):
            seg = int(segments[my, mx])
            qf = h.quants[seg]
            ym = int(ymodes[my, mx])
            is_b = ym == B_PRED
            skip = bool(skips[my, mx])

            coeffs: list[list[int] | None] = [None] * 24
            mb_nz = False
            if not skip:
                if not is_b:  # Y2 block
                    ctx = int(a_y2[mx]) + int(l_y2)
                    y2c, y2nz = _decode_block(bdt, probs[1], 0, ctx, qf.y2)
                    a_y2[mx] = l_y2 = y2nz
                    mb_nz |= y2nz
                    dcs = _iwht(y2c)
                first = 1 if not is_b else 0
                plane = probs[0] if not is_b else probs[3]
                for b in range(16):
                    r, c = b >> 2, b & 3
                    ctx = int(a_y[mx, c]) + int(l_y[r])
                    blk, nzf = _decode_block(bdt, plane, first, ctx, qf.y1)
                    if not is_b:
                        blk[0] = dcs[b]
                    a_y[mx, c] = l_y[r] = nzf
                    mb_nz |= nzf
                    coeffs[b] = blk
                for b in range(4):
                    r, c = b >> 1, b & 1
                    ctx = int(a_u[mx, c]) + int(l_u[r])
                    blk, nzf = _decode_block(bdt, probs[2], 0, ctx, qf.uv)
                    a_u[mx, c] = l_u[r] = nzf
                    mb_nz |= nzf
                    coeffs[16 + b] = blk
                for b in range(4):
                    r, c = b >> 1, b & 1
                    ctx = int(a_v[mx, c]) + int(l_v[r])
                    blk, nzf = _decode_block(bdt, probs[2], 0, ctx, qf.uv)
                    a_v[mx, c] = l_v[r] = nzf
                    mb_nz |= nzf
                    coeffs[20 + b] = blk
            else:
                # §13.1: a skipped MB zeroes every context, except that
                # a B_PRED MB (no Y2 block) leaves the Y2 context alone
                a_y[mx, :] = False
                l_y[:] = False
                a_u[mx, :] = False
                l_u[:] = False
                a_v[mx, :] = False
                l_v[:] = False
                if not is_b:
                    a_y2[mx] = l_y2 = False
            has_coeffs[my, mx] = mb_nz

            # ---- reconstruct
            y0, x0 = my * 16, mx * 16
            if is_b:
                _recon_bpred(
                    Y, y0, x0, mx, my, mb_w, bmodes[my, mx], coeffs
                )
            else:
                _pred_whole(Y, y0, x0, 16, ym, mx, my)
                if not skip:
                    for b in range(16):
                        blk = coeffs[b]
                        if any(blk):
                            _add_residual(
                                Y, y0 + (b >> 2) * 4, x0 + (b & 3) * 4,
                                _idct(blk),
                            )
            uvm = int(uvmodes[my, mx])
            cy0, cx0 = my * 8, mx * 8
            _pred_whole(U, cy0, cx0, 8, uvm, mx, my)
            _pred_whole(V, cy0, cx0, 8, uvm, mx, my)
            if not skip:
                for b in range(4):
                    r, c = b >> 1, b & 1
                    blk = coeffs[16 + b]
                    if any(blk):
                        _add_residual(
                            U, cy0 + r * 4, cx0 + c * 4, _idct(blk)
                        )
                    blk = coeffs[20 + b]
                    if any(blk):
                        _add_residual(
                            V, cy0 + r * 4, cx0 + c * 4, _idct(blk)
                        )

    # ---- in-loop filter (§15)
    _loop_filter(Y, U, V, h, segments, ymodes, has_coeffs)

    cw, ch = (width + 1) >> 1, (height + 1) >> 1
    return (
        Y[:height, :width],
        U[:ch, :cw],
        V[:ch, :cw],
    )


def _recon_bpred(
    Y: np.ndarray, y0: int, x0: int, mb_x: int, mb_y: int, mb_w: int,
    modes: np.ndarray, coeffs: list,
) -> None:
    """B_PRED macroblock reconstruction in a bordered local buffer
    (rows -1..15, cols -1..19) so later subblocks predict from earlier
    reconstructed ones, with the reference's top-right replication on
    subblock rows 1-3 (libwebp keeps the same scratch layout)."""
    buf = np.empty((17, 21), np.int32)
    if mb_y == 0:
        buf[0, :] = 127
    else:
        buf[0, 1:17] = Y[y0 - 1, x0 : x0 + 16]
        buf[0, 0] = 129 if mb_x == 0 else int(Y[y0 - 1, x0 - 1])
        if mb_x < mb_w - 1:
            buf[0, 17:21] = Y[y0 - 1, x0 + 16 : x0 + 20]
        else:
            buf[0, 17:21] = int(Y[y0 - 1, x0 + 15])
    if mb_x == 0:
        buf[1:17, 0] = 129
    else:
        buf[1:17, 0] = Y[y0 : y0 + 16, x0 - 1]
    # replicate the MB-level top-right onto the 3 lower subblock rows
    for rr in (4, 8, 12):
        buf[rr, 17:21] = buf[0, 17:21]

    for b in range(16):
        r, c = b >> 2, b & 3
        by, bx = 4 * r + 1, 4 * c + 1
        t = buf[by - 1, bx - 1 : bx + 8].tolist()
        left = buf[by : by + 4, bx - 1].tolist()
        pred = _pred4(int(modes[r, c]), t, left)
        blk = coeffs[b]
        if blk is not None and any(blk):
            res = _idct(blk)
            for i in range(4):
                prow = pred[i]
                row = buf[by + i]
                for jj in range(4):
                    v = prow[jj] + res[i * 4 + jj]
                    row[bx + jj] = 0 if v < 0 else 255 if v > 255 else v
        else:
            buf[by : by + 4, bx : bx + 4] = pred
    Y[y0 : y0 + 16, x0 : x0 + 16] = buf[1:17, 1:17].astype(np.uint8)


# ---------------------------------------------------------- loop filter

def _sclip(v: np.ndarray, lim: int) -> np.ndarray:
    return np.minimum(np.maximum(v, -lim - 1), lim)


def _clip255(v: np.ndarray) -> np.ndarray:
    return np.minimum(np.maximum(v, 0), 255)


def _filter_common(seg: np.ndarray, sel: np.ndarray, use_outer: np.ndarray):
    """Shared 2/4-pixel adjustment.  ``seg`` is (N, 8) int32 lanes
    [p3 p2 p1 p0 q0 q1 q2 q3]; rows where ``sel`` is False untouched.
    ``use_outer`` rows apply the hev 2-pixel filter, others the 4-pixel
    inner filter (libwebp DoFilter2_C / DoFilter4_C)."""
    p1, p0, q0, q1 = seg[:, 2], seg[:, 3], seg[:, 4], seg[:, 5]
    base = 3 * (q0 - p0)
    a = np.where(use_outer, base + _sclip(p1 - q1, 127), base)
    a1 = _sclip((a + 4) >> 3, 15)
    a2 = _sclip((a + 3) >> 3, 15)
    a3 = (a1 + 1) >> 1
    inner = sel & ~use_outer
    seg[:, 3] = np.where(sel, _clip255(p0 + a2), p0)
    seg[:, 4] = np.where(sel, _clip255(q0 - a1), q0)
    seg[:, 2] = np.where(inner, _clip255(p1 + a3), p1)
    seg[:, 5] = np.where(inner, _clip255(q1 - a3), q1)


def _filter6(seg: np.ndarray, sel: np.ndarray) -> None:
    """Macroblock-edge 6-pixel filter (libwebp DoFilter6_C)."""
    p2, p1, p0 = seg[:, 1], seg[:, 2], seg[:, 3]
    q0, q1, q2 = seg[:, 4], seg[:, 5], seg[:, 6]
    a = _sclip(3 * (q0 - p0) + _sclip(p1 - q1, 127), 127)
    a1 = (27 * a + 63) >> 7
    a2 = (18 * a + 63) >> 7
    a3 = (9 * a + 63) >> 7
    seg[:, 1] = np.where(sel, _clip255(p2 + a3), p2)
    seg[:, 2] = np.where(sel, _clip255(p1 + a2), p1)
    seg[:, 3] = np.where(sel, _clip255(p0 + a1), p0)
    seg[:, 4] = np.where(sel, _clip255(q0 - a1), q0)
    seg[:, 5] = np.where(sel, _clip255(q1 - a2), q1)
    seg[:, 6] = np.where(sel, _clip255(q2 - a3), q2)


def _needs_filter2(seg: np.ndarray, t: int, it: int) -> np.ndarray:
    d = np.abs(np.diff(seg, axis=1))  # |p3-p2| .. |q3-q2| (7 cols)
    ok = (4 * d[:, 3] + np.abs(seg[:, 2] - seg[:, 5])) <= t
    ok &= np.max(d[:, (0, 1, 2, 4, 5, 6)], axis=1) <= it
    return ok


def _hev(seg: np.ndarray, thresh: int) -> np.ndarray:
    p1, p0, q0, q1 = seg[:, 2], seg[:, 3], seg[:, 4], seg[:, 5]
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _edge_lanes(plane: np.ndarray, y: int, x: int, n: int, horiz: bool):
    """Extract the 8-pixel lanes across an edge as (n, 8) int32.
    ``horiz``: filtering across a VERTICAL edge at column x (reads
    columns x-4..x+3); else across a horizontal edge at row y."""
    if horiz:
        return plane[y : y + n, x - 4 : x + 4].astype(np.int32)
    return plane[y - 4 : y + 4, x : x + n].T.astype(np.int32)


def _store_lanes(
    plane: np.ndarray, y: int, x: int, n: int, horiz: bool, seg: np.ndarray
) -> None:
    if horiz:
        plane[y : y + n, x - 4 : x + 4] = seg.astype(np.uint8)
    else:
        plane[y - 4 : y + 4, x : x + n] = seg.T.astype(np.uint8)


def _normal_filter(seg: np.ndarray, limit, ilevel, hev_t, mb_edge) -> bool:
    """Apply the normal filter to lane array ``seg`` in place; returns
    whether anything was modified."""
    sel = _needs_filter2(seg, 2 * limit + 1, ilevel)
    if not sel.any():
        return False
    hv = _hev(seg, hev_t)
    if mb_edge:
        _filter6(seg, sel & ~hv)
        _filter_common(seg, sel & hv, np.ones(len(seg), bool))
    else:
        _filter_common(seg, sel, hv)
    return True


def _normal_edge(
    plane, y, x, n, horiz, limit, ilevel, hev_t, mb_edge: bool
) -> None:
    seg = _edge_lanes(plane, y, x, n, horiz)
    if _normal_filter(seg, limit, ilevel, hev_t, mb_edge):
        _store_lanes(plane, y, x, n, horiz, seg)


def _normal_edge_uv(
    u, v, y, x, horiz, limit, ilevel, hev_t, mb_edge: bool
) -> None:
    """One chroma edge, both planes as a single 16-lane batch (the
    kernels are lane-independent, so stacking U over V is exact)."""
    su = _edge_lanes(u, y, x, 8, horiz)
    sv = _edge_lanes(v, y, x, 8, horiz)
    seg = np.concatenate([su, sv])
    if _normal_filter(seg, limit, ilevel, hev_t, mb_edge):
        _store_lanes(u, y, x, 8, horiz, seg[:8])
        _store_lanes(v, y, x, 8, horiz, seg[8:])


def _simple_edge(plane, y, x, n, horiz, limit) -> None:
    seg = _edge_lanes(plane, y, x, n, horiz)
    p1, p0, q0, q1 = seg[:, 2], seg[:, 3], seg[:, 4], seg[:, 5]
    sel = (4 * np.abs(p0 - q0) + np.abs(p1 - q1)) <= 2 * limit + 1
    if not sel.any():
        return
    _filter_common(seg, sel, np.ones(n, bool))
    _store_lanes(plane, y, x, n, horiz, seg)


def _loop_filter(
    Y: np.ndarray, U: np.ndarray, V: np.ndarray, h: _Headers,
    segments: np.ndarray, ymodes: np.ndarray, has_coeffs: np.ndarray,
) -> None:
    """In-loop deblocking (RFC 6386 §15) in raster MB order, matching
    the reference's per-MB edge order: left, inner-vertical, top,
    inner-horizontal (luma then chroma within each group)."""
    if h.filter_level == 0:
        return
    mb_h, mb_w = segments.shape
    # precompute strengths per (segment, is_b)
    strengths = {}
    for s in range(4):
        if h.seg_enabled:
            base = (
                h.seg_filter[s]
                if h.seg_abs
                else h.filter_level + h.seg_filter[s]
            )
        else:
            base = h.filter_level
        for is_b in (0, 1):
            level = base
            if h.lf_delta:
                level += h.ref_lf_delta[0]  # keyframe: intra ref
                if is_b:
                    level += h.mode_lf_delta[0]
            level = 0 if level < 0 else 63 if level > 63 else level
            if level == 0:
                strengths[(s, is_b)] = None
                continue
            ilevel = level
            if h.sharpness > 0:
                ilevel >>= 2 if h.sharpness > 4 else 1
                if ilevel > 9 - h.sharpness:
                    ilevel = 9 - h.sharpness
            if ilevel < 1:
                ilevel = 1
            hev_t = 2 if level >= 40 else 1 if level >= 15 else 0
            strengths[(s, is_b)] = (2 * level + ilevel, ilevel, hev_t)

    for my in range(mb_h):
        for mx in range(mb_w):
            is_b = int(ymodes[my, mx] == B_PRED)
            st = strengths[(int(segments[my, mx]), is_b)]
            if st is None:
                continue
            limit, ilevel, hev_t = st
            inner = bool(has_coeffs[my, mx]) or bool(is_b)
            y0, x0 = my * 16, mx * 16
            cy0, cx0 = my * 8, mx * 8
            if h.filter_simple:
                if mx > 0:
                    _simple_edge(Y, y0, x0, 16, True, limit + 4)
                if inner:
                    for k in (4, 8, 12):
                        _simple_edge(Y, y0, x0 + k, 16, True, limit)
                if my > 0:
                    _simple_edge(Y, y0, x0, 16, False, limit + 4)
                if inner:
                    for k in (4, 8, 12):
                        _simple_edge(Y, y0 + k, x0, 16, False, limit)
            else:
                if mx > 0:
                    _normal_edge(Y, y0, x0, 16, True, limit + 4, ilevel, hev_t, True)
                    _normal_edge_uv(U, V, cy0, cx0, True, limit + 4, ilevel, hev_t, True)
                if inner:
                    for k in (4, 8, 12):
                        _normal_edge(Y, y0, x0 + k, 16, True, limit, ilevel, hev_t, False)
                    _normal_edge_uv(U, V, cy0, cx0 + 4, True, limit, ilevel, hev_t, False)
                if my > 0:
                    _normal_edge(Y, y0, x0, 16, False, limit + 4, ilevel, hev_t, True)
                    _normal_edge_uv(U, V, cy0, cx0, False, limit + 4, ilevel, hev_t, True)
                if inner:
                    for k in (4, 8, 12):
                        _normal_edge(Y, y0 + k, x0, 16, False, limit, ilevel, hev_t, False)
                    _normal_edge_uv(U, V, cy0 + 4, cx0, False, limit, ilevel, hev_t, False)


# ---------------------------------------------------------- yuv -> rgb

def _upsample_plane(c: np.ndarray, w: int, h: int) -> np.ndarray:
    """4:2:0 chroma plane -> full resolution, bit-exact with the
    reference "fancy" upsampler: a 3/1 edge rule on the first/last
    sample of each pair row and the 9-3-3-1 diagonal average inside."""
    cw = (w + 1) >> 1
    out = np.empty((h, w), np.int32)
    c = c.astype(np.int32)

    def pair(t, cu, dst_top, dst_bot):
        # first pixel: 3/1 vertical blend
        if dst_top is not None:
            dst_top[0] = (3 * t[0] + cu[0] + 2) >> 2
        if dst_bot is not None:
            dst_bot[0] = (3 * cu[0] + t[0] + 2) >> 2
        last_pair = (w - 1) >> 1
        if last_pair >= 1:
            tl = t[: last_pair]
            tt = t[1 : last_pair + 1]
            ll = cu[: last_pair]
            cc = cu[1 : last_pair + 1]
            avg = tl + tt + ll + cc + 8
            d12 = (avg + 2 * (tt + ll)) >> 3
            d03 = (avg + 2 * (tl + cc)) >> 3
            xs = np.arange(1, last_pair + 1)
            if dst_top is not None:
                dst_top[2 * xs - 1] = (d12 + tl) >> 1
                dst_top[2 * xs] = (d03 + tt) >> 1
            if dst_bot is not None:
                dst_bot[2 * xs - 1] = (d03 + ll) >> 1
                dst_bot[2 * xs] = (d12 + cc) >> 1
        if not (w & 1):
            if dst_top is not None:
                dst_top[w - 1] = (3 * t[cw - 1] + cu[cw - 1] + 2) >> 2
            if dst_bot is not None:
                dst_bot[w - 1] = (3 * cu[cw - 1] + t[cw - 1] + 2) >> 2

    # row 0: chroma row 0 mirrored
    pair(c[0], c[0], out[0], None)
    for r in range(1, c.shape[0]):
        top_dst = out[2 * r - 1]
        bot_dst = out[2 * r] if 2 * r < h else None
        pair(c[r - 1], c[r], top_dst, bot_dst)
    if not (h & 1):
        pair(c[-1], c[-1], out[h - 1], None)
    return out


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Reference-parity YUV 4:2:0 -> RGB: fancy chroma upsampling plus
    the 14-bit fixed-point BT.601 studio-swing kernel, so the result is
    byte-identical to libwebp's default RGB output path."""
    h, w = y.shape
    uf = _upsample_plane(u, w, h)
    vf = _upsample_plane(v, w, h)
    yy = (y.astype(np.int32) * 19077) >> 8

    def clip8(val: np.ndarray) -> np.ndarray:
        return np.where(
            (val & ~((256 << 6) - 1)) == 0,
            val >> 6,
            np.where(val < 0, 0, 255),
        ).astype(np.uint8)

    r = clip8(yy + ((vf * 26149) >> 8) - 14234)
    g = clip8(yy - ((uf * 6419) >> 8) - ((vf * 13320) >> 8) + 8708)
    b = clip8(yy + ((uf * 33050) >> 8) - 17685)
    return np.stack([r, g, b], axis=-1)


def decode_vp8(payload: bytes) -> np.ndarray:
    """VP8 chunk body -> RGB HxWx3 uint8 (reference-parity pipeline)."""
    return yuv420_to_rgb(*decode_vp8_yuv(payload))


# ---------------------------------------------------------- bool encoder

class BoolEncoder:
    """RFC 6386 §8 boolean arithmetic encoder (reference algorithm,
    carry-propagating).  The exact inverse of :class:`BoolDecoder`:
    encoding a (prob, bit) sequence and decoding the output returns
    the same bits."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def bool_(self, probability: int, value: int) -> None:
        split = 1 + (((self.range - 1) * probability) >> 8)
        if value:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8
        return None

    def literal(self, n: int, v: int) -> None:
        for shift in range(n - 1, -1, -1):
            self.bool_(128, (v >> shift) & 1)

    def signed(self, n: int, v: int) -> None:
        self.literal(n, abs(v))
        self.bool_(128, 1 if v < 0 else 0)

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


# ---------------------------------------------------------- encoder twin

def _fdct(block: np.ndarray) -> list[int]:
    """VP8 reference forward 4x4 DCT (the exact integer transform the
    reference encoder pairs with §14.4's inverse).  Input: int residual
    4x4; output raster-order coefficients."""
    ip = [int(v) for v in block.reshape(16)]
    tmp = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = (ip[r] + ip[r + 3]) * 8
        b1 = (ip[r + 1] + ip[r + 2]) * 8
        c1 = (ip[r + 1] - ip[r + 2]) * 8
        d1 = (ip[r] - ip[r + 3]) * 8
        tmp[r] = a1 + b1
        tmp[r + 2] = a1 - b1
        tmp[r + 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[r + 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = [0] * 16
    for i in range(4):
        a1 = tmp[i] + tmp[12 + i]
        b1 = tmp[4 + i] + tmp[8 + i]
        c1 = tmp[4 + i] - tmp[8 + i]
        d1 = tmp[i] - tmp[12 + i]
        out[i] = (a1 + b1 + 7) >> 4
        out[8 + i] = (a1 - b1 + 7) >> 4
        out[4 + i] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (1 if d1 else 0)
        out[12 + i] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out


def _encode_block_tokens(
    be: BoolEncoder, probs, first: int, ctx: int, zz: list[int]
) -> bool:
    """Token-encode one block's quantized coefficients (zigzag order),
    the exact inverse of :func:`_decode_block`'s tree walk."""
    last = -1
    for i in range(first, 16):
        if zz[i]:
            last = i
    c = first
    skip_eob = False
    while c <= last:
        p = probs[_BANDS[c]][ctx]
        if not skip_eob:
            be.bool_(p[0], 1)  # not EOB
        v = zz[c]
        a = abs(v)
        if a == 0:
            be.bool_(p[1], 0)
            ctx = 0
            skip_eob = True
            c += 1
            continue
        be.bool_(p[1], 1)
        skip_eob = False
        if a == 1:
            be.bool_(p[2], 0)
            ctx = 1
        else:
            be.bool_(p[2], 1)
            ctx = 2
            if a <= 4:
                be.bool_(p[3], 0)
                if a == 2:
                    be.bool_(p[4], 0)
                else:
                    be.bool_(p[4], 1)
                    be.bool_(p[5], a - 3)
            else:
                be.bool_(p[3], 1)
                cat = next(
                    k for k in range(5, -1, -1) if a >= _CAT_BASE[k]
                )
                if cat == 0:
                    be.bool_(p[6], 0)
                    be.bool_(p[7], 0)
                elif cat == 1:
                    be.bool_(p[6], 0)
                    be.bool_(p[7], 1)
                else:
                    be.bool_(p[6], 1)
                    if cat in (2, 3):
                        be.bool_(p[8], 0)
                        be.bool_(p[9], cat - 2)
                    else:
                        be.bool_(p[8], 1)
                        be.bool_(p[10], cat - 4)
                extra = a - _CAT_BASE[cat]
                pcat = _PCAT[cat]
                for k, pb in enumerate(pcat):
                    be.bool_(pb, (extra >> (len(pcat) - 1 - k)) & 1)
        be.bool_(128, 1 if v < 0 else 0)
        c += 1
    if last < 15:
        p = probs[_BANDS[c]][ctx]
        be.bool_(p[0], 0)  # EOB
    return last >= first


def _rgb_to_yuv420(
    img: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RGB -> studio-swing YUV 4:2:0 (libwebp's fixed-point forward
    conversion, 2x2 box-averaged chroma)."""
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    half = 1 << 15
    y = (16839 * r + 33059 * g + 6420 * b + half + (16 << 16)) >> 16
    h, w = r.shape
    # pad to even and box-average 2x2 for chroma
    he, we = (h + 1) & ~1, (w + 1) & ~1
    rp = np.pad(r, ((0, he - h), (0, we - w)), mode="edge")
    gp = np.pad(g, ((0, he - h), (0, we - w)), mode="edge")
    bp = np.pad(b, ((0, he - h), (0, we - w)), mode="edge")
    r2 = (rp[0::2, 0::2] + rp[0::2, 1::2] + rp[1::2, 0::2] + rp[1::2, 1::2] + 2) >> 2
    g2 = (gp[0::2, 0::2] + gp[0::2, 1::2] + gp[1::2, 0::2] + gp[1::2, 1::2] + 2) >> 2
    b2 = (bp[0::2, 0::2] + bp[0::2, 1::2] + bp[1::2, 0::2] + bp[1::2, 1::2] + 2) >> 2
    u = (-9719 * r2 - 19081 * g2 + 28800 * b2 + half + (128 << 18)) >> 18
    v = (28800 * r2 - 24116 * g2 - 4684 * b2 + half + (128 << 18)) >> 18
    return (
        np.clip(y, 0, 255).astype(np.uint8),
        np.clip(u, 0, 255).astype(np.uint8),
        np.clip(v, 0, 255).astype(np.uint8),
    )


def encode_vp8(
    img: np.ndarray,
    qi: int = 4,
    filter_level: int = 0,
    filter_simple: bool = False,
    sharpness: int = 0,
) -> bytes:
    """RGB HxWx3 uint8 -> complete lossy WebP (RIFF/VP8) bytes.

    A minimal-but-conforming keyframe encoder: every macroblock is
    B_PRED with DC subblock prediction (so no Y2/WHT leg), chroma is
    whole-MB DC, quantizer index ``qi`` is uniform, the loop filter is
    level 0, coefficient probabilities are the spec defaults, and one
    token partition is emitted.  ``tests/test_vp8.py`` pins libwebp's
    decode of this output byte-equal to :func:`decode_vp8_yuv`."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ImageFormatError("encode_vp8 wants HxWx3 RGB")
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 0x3FFF or w > 0x3FFF:
        raise ImageFormatError("bad dimensions for VP8")
    Yp, Up, Vp = _rgb_to_yuv420(img)
    mb_w, mb_h = (w + 15) >> 4, (h + 15) >> 4
    # pad planes to MB multiples by edge replication
    Y = np.pad(Yp, ((0, mb_h * 16 - h), (0, mb_w * 16 - w)), mode="edge")
    ch, cw = (h + 1) >> 1, (w + 1) >> 1
    U = np.pad(Up, ((0, mb_h * 8 - ch), (0, mb_w * 8 - cw)), mode="edge")
    V = np.pad(Vp, ((0, mb_h * 8 - ch), (0, mb_w * 8 - cw)), mode="edge")

    qi = _clamp_q(qi)
    qf = _QuantFactors(qi, {"y_dc": 0, "y2_dc": 0, "y2_ac": 0,
                            "uv_dc": 0, "uv_ac": 0})

    # ---- header partition
    hb = BoolEncoder()
    hb.bool_(128, 0)  # color space
    hb.bool_(128, 0)  # clamping
    hb.bool_(128, 0)  # segmentation off
    hb.bool_(128, 1 if filter_simple else 0)  # filter type
    hb.literal(6, filter_level)
    hb.literal(3, sharpness)
    hb.bool_(128, 0)  # lf deltas off
    hb.literal(2, 0)  # one token partition
    hb.literal(7, qi)
    for _ in range(5):
        hb.bool_(128, 0)  # quant deltas absent
    hb.bool_(128, 1)  # refresh entropy (transient on keyframes)
    upd = COEFF_UPDATE_PROBS
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for t in range(11):
                    hb.bool_(int(upd[i, j, k, t]), 0)
    hb.bool_(128, 1)   # mb_no_coeff_skip
    hb.literal(8, 128)  # prob_skip_false

    # ---- per-MB: reconstruct + collect coefficients, then emit
    tb = BoolEncoder()
    recon = np.zeros_like(Y)
    recon_u = np.zeros_like(U)
    recon_v = np.zeros_like(V)
    probs = COEFF_PROBS
    a_y = np.zeros((mb_w, 4), bool)
    a_u = np.zeros((mb_w, 2), bool)
    a_v = np.zeros((mb_w, 2), bool)
    skips = []

    def quantize(co: list[int], dq) -> list[int]:
        zz = []
        for idx in range(16):
            v = co[_ZIGZAG[idx]]
            q = dq[0 if idx == 0 else 1]
            a = (abs(v) * 2 + q) // (2 * q)
            a = 2047 if a > 2047 else a
            zz.append(-a if v < 0 else a)
        return zz

    mb_tokens: list[list] = []
    for my in range(mb_h):
        for mx in range(mb_w):
            y0, x0 = my * 16, mx * 16
            # ---- luma, B_PRED/DC4 in a bordered local buffer
            buf = np.empty((17, 21), np.int32)
            if my == 0:
                buf[0, :] = 127
            else:
                buf[0, 1:17] = recon[y0 - 1, x0 : x0 + 16]
                buf[0, 0] = 129 if mx == 0 else int(recon[y0 - 1, x0 - 1])
                if mx < mb_w - 1:
                    buf[0, 17:21] = recon[y0 - 1, x0 + 16 : x0 + 20]
                else:
                    buf[0, 17:21] = int(recon[y0 - 1, x0 + 15])
            if mx == 0:
                buf[1:17, 0] = 129
            else:
                buf[1:17, 0] = recon[y0 : y0 + 16, x0 - 1]
            blocks = []
            for b in range(16):
                r, c = b >> 2, b & 3
                by, bx = 4 * r + 1, 4 * c + 1
                above = buf[by - 1, bx : bx + 4]
                left = buf[by : by + 4, bx - 1]
                dc = (int(above.sum()) + int(left.sum()) + 4) >> 3
                src = Y[y0 + 4 * r : y0 + 4 * r + 4,
                        x0 + 4 * c : x0 + 4 * c + 4].astype(np.int32)
                zz = quantize(_fdct(src - dc), qf.y1)
                deq = [0] * 16
                for idx in range(16):
                    deq[_ZIGZAG[idx]] = zz[idx] * qf.y1[0 if idx == 0 else 1]
                res = _idct(deq)
                blk = np.clip(
                    dc + np.asarray(res, np.int32).reshape(4, 4), 0, 255
                )
                buf[by : by + 4, bx : bx + 4] = blk
                blocks.append(zz)
            recon[y0 : y0 + 16, x0 : x0 + 16] = buf[1:17, 1:17].astype(np.uint8)
            # ---- chroma, whole-8x8 DC
            cy0, cx0 = my * 8, mx * 8
            chroma_blocks = []
            for plane, rec in ((U, recon_u), (V, recon_v)):
                s, n = 0, 0
                if my > 0:
                    s += int(rec[cy0 - 1, cx0 : cx0 + 8].astype(np.int32).sum())
                    n += 8
                if mx > 0:
                    s += int(rec[cy0 : cy0 + 8, cx0 - 1].astype(np.int32).sum())
                    n += 8
                dc = 128 if n == 0 else (s + (n >> 1)) >> (n.bit_length() - 1)
                pred = np.full((8, 8), dc, np.int32)
                out_blocks = []
                for b in range(4):
                    r, c = b >> 1, b & 1
                    src = plane[cy0 + 4 * r : cy0 + 4 * r + 4,
                                cx0 + 4 * c : cx0 + 4 * c + 4].astype(np.int32)
                    zz = quantize(_fdct(src - dc), qf.uv)
                    deq = [0] * 16
                    for idx in range(16):
                        deq[_ZIGZAG[idx]] = zz[idx] * qf.uv[0 if idx == 0 else 1]
                    res = _idct(deq)
                    pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] = np.clip(
                        dc + np.asarray(res, np.int32).reshape(4, 4), 0, 255
                    )
                    out_blocks.append(zz)
                rec[cy0 : cy0 + 8, cx0 : cx0 + 8] = pred.astype(np.uint8)
                chroma_blocks.append(out_blocks)
            mb_tokens.append((mx, blocks, chroma_blocks))
            skips.append(
                not any(any(z) for z in blocks)
                and not any(any(z) for ob in chroma_blocks for z in ob)
            )

    # ---- mode partition (modes after header, raster MBs)
    idx = 0
    for my in range(mb_h):
        for mx in range(mb_w):
            hb.bool_(128, 1 if skips[idx] else 0)  # skip flag (prob 128)
            hb.bool_(145, 0)  # ymode = B_PRED
            for _ in range(16):  # all B_DC_PRED => ctx stays (DC, DC)
                hb.bool_(int(KF_BMODE[0, 0, 0]), 0)
            hb.bool_(142, 0)  # uv DC
            idx += 1

    # ---- token partition
    idx = 0
    for my in range(mb_h):
        l_y = np.zeros(4, bool)
        l_u = np.zeros(2, bool)
        l_v = np.zeros(2, bool)
        for mx in range(mb_w):
            _, blocks, chroma_blocks = mb_tokens[idx]
            if skips[idx]:
                a_y[mx, :] = False
                l_y[:] = False
                a_u[mx, :] = False
                l_u[:] = False
                a_v[mx, :] = False
                l_v[:] = False
                idx += 1
                continue
            for b in range(16):
                r, c = b >> 2, b & 3
                ctx = int(a_y[mx, c]) + int(l_y[r])
                nz = _encode_block_tokens(tb, probs[3], 0, ctx, blocks[b])
                a_y[mx, c] = l_y[r] = nz
            for plane_blocks, a_c, l_c in (
                (chroma_blocks[0], a_u, l_u),
                (chroma_blocks[1], a_v, l_v),
            ):
                for b in range(4):
                    r, c = b >> 1, b & 1
                    ctx = int(a_c[mx, c]) + int(l_c[r])
                    nz = _encode_block_tokens(
                        tb, probs[2], 0, ctx, plane_blocks[b]
                    )
                    a_c[mx, c] = l_c[r] = nz
            idx += 1

    part1 = hb.flush()
    tokens = tb.flush()
    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    frame = (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", w, h)
        + part1
        + tokens
    )
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

