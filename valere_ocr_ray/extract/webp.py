"""Dependency-free lossless-WebP (VP8L, RFC 9649) decoder + encoder twin.

Closes the WebP leg of the raster seam — after round 4's TIFF/GIF
additions this was the one web image format the extraction stage still
routed to the codec seam (``stages/extractor.py``).  The reference's
upload filter admits generic web images (``IDD/finalcodes/
InsuranceCard1.py:83-84``), and WebP is ubiquitous in crawled corpora.

Scope — the LOSSLESS half of the format, implemented in full from the
public spec (RFC 9649 "WebP Image Format", §3–5, the VP8L bitstream):

* RIFF container: plain ``VP8L`` files and extended ``VP8X`` files
  whose image chunk is ``VP8L``;
* LSB-first bitstream; canonical prefix codes read MSB-of-code-first
  (the DEFLATE convention), both the "simple" (1–2 symbol) and the
  normal code-length-coded form, incl. repeat codes 16/17/18 and the
  optional ``max_symbol`` field;
* all four transforms (predictor with the full 14-mode battery,
  color transform, subtract-green, color-indexing incl. sub-byte
  pixel bundling), applied inverse in reverse stream order;
* color cache, LZ77 backward references with the 120-entry 2D
  distance map, and the meta-prefix (entropy image) group lookup.

Lossy WebP (``VP8 `` chunks) is handled by the sibling from-scratch
VP8 keyframe decoder in :mod:`valere_ocr_ray.extract.vp8` — the
container scan here routes the chunk body to it.

``encode_webp`` is the test/synth twin: a spec-valid VP8L encoder
(palette + pixel bundling for ≤256-color images, else optional
subtract-green / predictor, color cache, greedy LZ77 against the
previous pixel and the previous row, real canonical Huffman codes).
It is an independent forward implementation of the same spec text, so
round-trip equality exercises every inverse path the decoder has.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

from valere_ocr_ray.extract.image_decode import ImageFormatError

# ------------------------------------------------------------------ bits


class _BitReader:
    """LSB-first bit reader (RFC 9649 §3.3)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # next byte index
        self.buf = 0
        self.nbits = 0

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos < len(self.data):
                self.buf |= self.data[self.pos] << self.nbits
                self.pos += 1
            else:
                # past-the-end reads yield zero bits (truncation is
                # caught by pixel-count bookkeeping, not here)
                self.buf |= 0
            self.nbits += 8
        val = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nbits -= n
        return val


class _BitWriter:
    """LSB-first bit writer — the encoder half of :class:`_BitReader`."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write_bits(self, val: int, n: int) -> None:
        self.buf |= (val & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Canonical prefix codes go on the wire MSB-first."""
        for i in range(length - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.nbits = 0
        return bytes(self.out)


# ------------------------------------------------------ prefix (Huffman)

# code-length-code symbol order (RFC 9649 §5.2.2).  NOTE the quirk:
# symbol 16 (repeat-previous) sits between 5 and 6, NOT at the end —
# pinned against libwebp in tests/test_webp.py (a wrong order decodes
# any table whose lengths stay <=5 and breaks on the first >=6).
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_CL_EXTRA = {16: (2, 3), 17: (3, 3), 18: (7, 11)}  # sym -> (extra_bits, offset)


def _canonical_codes(lengths: list[int]) -> list[int]:
    """DEFLATE-style canonical code assignment from code lengths."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    codes = [0] * len(lengths)
    for sym, ln in enumerate(lengths):
        if ln:
            codes[sym] = next_code[ln]
            next_code[ln] += 1
    return codes


class _PrefixCode:
    """Decode table: flat lookup on the next ``max_len`` stream bits.

    The stream carries each code MSB-first in an LSB-first bit buffer,
    so table index ``i`` matches code ``c`` of length ``L`` iff the low
    ``L`` bits of ``i`` equal ``reverse(c, L)``.
    """

    __slots__ = ("table", "max_len", "single")

    def __init__(self, lengths: list[int]) -> None:
        used = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not used:
            raise ImageFormatError("empty prefix code")
        if len(used) == 1:
            # degenerate: zero bits read per symbol (simple-code form)
            self.single = used[0][0]
            self.table = None
            self.max_len = 0
            return
        self.single = -1
        max_len = max(ln for _, ln in used)
        if max_len > 15:
            raise ImageFormatError("prefix code length > 15")
        codes = _canonical_codes(lengths)
        # completeness (Kraft) check — an over-/under-subscribed code
        # is a corrupt stream (libwebp's num_nodes check rejects both;
        # the 1-symbol special case above is the only exemption)
        kraft = sum(1 << (max_len - ln) for _, ln in used)
        if kraft != (1 << max_len):
            raise ImageFormatError("incomplete prefix code")
        table: list[tuple[int, int]] = [(-1, 0)] * (1 << max_len)
        for sym, ln in used:
            c = codes[sym]
            rev = 0
            for i in range(ln):
                rev = (rev << 1) | ((c >> i) & 1)
            step = 1 << ln
            for hi in range(0, 1 << max_len, step):
                table[hi | rev] = (sym, ln)
        self.table = table
        self.max_len = max_len

    def read(self, br: _BitReader) -> int:
        if self.single >= 0:
            return self.single
        while br.nbits < self.max_len:
            if br.pos < len(br.data):
                br.buf |= br.data[br.pos] << br.nbits
                br.pos += 1
                br.nbits += 8
            else:
                br.nbits = self.max_len  # zero-pad at EOF
        sym, ln = self.table[br.buf & ((1 << self.max_len) - 1)]
        if sym < 0:
            raise ImageFormatError("invalid prefix code in stream")
        br.buf >>= ln
        br.nbits -= ln
        return sym


def _read_code_lengths(
    br: _BitReader, cl_code: _PrefixCode, num_symbols: int
) -> list[int]:
    """Symbol code lengths via the code-length code (RFC 9649 §5.2.2)."""
    if br.read_bits(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = num_symbols
    lengths = [0] * num_symbols
    symbol = 0
    prev_len = 8
    while symbol < num_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            extra_bits, offset = _CL_EXTRA[code_len]
            repeat = br.read_bits(extra_bits) + offset
            fill = prev_len if code_len == 16 else 0
            if symbol + repeat > num_symbols:
                raise ImageFormatError("code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bits(1):  # simple code
        num_symbols = br.read_bits(1) + 1
        if br.read_bits(1):  # first symbol in 8 bits
            sym0 = br.read_bits(8)
        else:
            sym0 = br.read_bits(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            if sym0 >= alphabet_size:
                raise ImageFormatError("simple-code symbol out of range")
            lengths[sym0] = 1
            code = _PrefixCode.__new__(_PrefixCode)
            code.single = sym0
            code.table = None
            code.max_len = 0
            return code
        sym1 = br.read_bits(8)
        if sym0 >= alphabet_size or sym1 >= alphabet_size or sym0 == sym1:
            raise ImageFormatError("bad simple prefix code")
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixCode(lengths)
    # normal: code lengths for the code-length alphabet, in _CL_ORDER
    num_cl = 4 + br.read_bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read_bits(3)
    cl_code = _PrefixCode(cl_lengths)
    lengths = _read_code_lengths(br, cl_code, alphabet_size)
    return _PrefixCode(lengths)


# ------------------------------------------------------- LZ77 constants


def _prefix_decode_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (RFC 9649 §5.2.3)."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read_bits(extra_bits) + 1


def _prefix_ranges(n_codes: int) -> list[tuple[int, int, int]]:
    """(first_value, extra_bits, code) spans for prefix encoding."""
    spans = []
    for code in range(n_codes):
        if code < 4:
            spans.append((code + 1, 0, code))
        else:
            eb = (code - 2) >> 1
            offset = (2 + (code & 1)) << eb
            spans.append((offset + 1, eb, code))
    return spans


_LEN_SPANS = _prefix_ranges(24)
_DIST_SPANS = _prefix_ranges(40)

# 2D offsets for distance codes 1..120, scan-order near neighborhood
# (RFC 9649 §5.2.3, the distance-mapping table; (xoffset, yoffset))
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _plane_dist(code_value: int, xsize: int) -> int:
    if code_value > 120:
        return code_value - 120
    x, y = _DIST_MAP[code_value - 1]
    return max(1, y * xsize + x)


# --------------------------------------------------------- image stream

_GREEN_LIT = 256
_N_LENGTH = 24


class _Transform:
    __slots__ = ("kind", "size_bits", "image", "xsize_at", "palette")

    def __init__(self, kind: int) -> None:
        self.kind = kind
        self.size_bits = 0
        self.image: list[int] | None = None
        self.xsize_at = 0
        self.palette: list[int] | None = None


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_image_stream(
    br: _BitReader, xsize: int, ysize: int, is_level0: bool
) -> tuple[list[int], int]:
    """Decode one VP8L image stream; returns (argb pixels, final xsize).

    ``final xsize`` differs from ``xsize`` only at level 0 when a
    color-indexing transform bundles pixels (RFC 9649 §4.5).
    """
    transforms: list[_Transform] = []
    cur_xsize = xsize
    if is_level0:
        seen: set[int] = set()
        while br.read_bits(1):
            kind = br.read_bits(2)
            if kind in seen:
                raise ImageFormatError("duplicate VP8L transform")
            seen.add(kind)
            tr = _Transform(kind)
            tr.xsize_at = cur_xsize
            if kind in (0, 1):  # PREDICTOR / COLOR
                tr.size_bits = br.read_bits(3) + 2
                bw = (cur_xsize + (1 << tr.size_bits) - 1) >> tr.size_bits
                bh = (ysize + (1 << tr.size_bits) - 1) >> tr.size_bits
                tr.image, _ = _decode_image_stream(br, bw, bh, False)
            elif kind == 3:  # COLOR_INDEXING
                n_colors = br.read_bits(8) + 1
                deltas, _ = _decode_image_stream(br, n_colors, 1, False)
                pal = []
                prev = 0
                for d in deltas:  # palette entries are delta-coded
                    prev = (
                        (((prev >> 24) + (d >> 24)) & 0xFF) << 24
                        | (((prev >> 16) + (d >> 16)) & 0xFF & 0xFF) << 16
                        | ((((prev >> 8) & 0xFF) + ((d >> 8) & 0xFF)) & 0xFF) << 8
                        | ((prev + d) & 0xFF)
                    )
                    pal.append(prev)
                tr.palette = pal
                if n_colors <= 2:
                    wb = 3
                elif n_colors <= 4:
                    wb = 2
                elif n_colors <= 16:
                    wb = 1
                else:
                    wb = 0
                tr.size_bits = wb
                cur_xsize = (cur_xsize + (1 << wb) - 1) >> wb
            transforms.append(tr)

    cache_bits = 0
    if br.read_bits(1):
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ImageFormatError(f"bad color-cache size bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    # meta prefix codes (entropy image) — level 0 only
    huff_image: list[int] | None = None
    huff_bits = 0
    huff_xsize = 0
    n_groups = 1
    if is_level0 and br.read_bits(1):
        huff_bits = br.read_bits(3) + 2
        huff_xsize = (cur_xsize + (1 << huff_bits) - 1) >> huff_bits
        hh = (ysize + (1 << huff_bits) - 1) >> huff_bits
        huff_image, _ = _decode_image_stream(br, huff_xsize, hh, False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in huff_image) + 1

    green_size = _GREEN_LIT + _N_LENGTH + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    total = cur_xsize * ysize
    px: list[int] = [0] * total
    pos = 0
    group = groups[0]
    while pos < total:
        if huff_image is not None:
            x = pos % cur_xsize
            y = pos // cur_xsize
            meta = huff_image[(y >> huff_bits) * huff_xsize + (x >> huff_bits)]
            group = groups[(meta >> 8) & 0xFFFF]
        g_code, r_code, b_code, a_code, d_code = group
        sym = g_code.read(br)
        if sym < _GREEN_LIT:
            # stream order: green (already read), red, blue, alpha
            red = r_code.read(br)
            blue = b_code.read(br)
            alpha = a_code.read(br)
            argb = (alpha << 24) | (red << 16) | (sym << 8) | blue
            px[pos] = argb
            pos += 1
            if cache_size:
                cache[_cache_key(argb, cache_bits)] = argb
        elif sym < _GREEN_LIT + _N_LENGTH:
            length = _prefix_decode_value(sym - _GREEN_LIT, br)
            dist_code = d_code.read(br)
            dist = _plane_dist(_prefix_decode_value(dist_code, br), cur_xsize)
            if dist > pos or pos + length > total:
                raise ImageFormatError("LZ77 reference out of bounds")
            for _ in range(length):
                argb = px[pos - dist]
                px[pos] = argb
                pos += 1
                if cache_size:
                    cache[_cache_key(argb, cache_bits)] = argb
        else:
            idx = sym - _GREEN_LIT - _N_LENGTH
            px[pos] = cache[idx]
            pos += 1

    # inverse transforms, reverse stream order (RFC 9649 §4)
    for tr in reversed(transforms):
        if tr.kind == 3:
            px = _inv_color_indexing(px, tr, ysize)
            cur_xsize = tr.xsize_at
        elif tr.kind == 2:
            px = _inv_subtract_green(px)
        elif tr.kind == 1:
            px = _inv_color_transform(px, tr, cur_xsize, ysize)
        elif tr.kind == 0:
            px = _inv_predictor(px, tr, cur_xsize, ysize)
    return px, cur_xsize


# ------------------------------------------------------------ transforms


def _inv_subtract_green(px: list[int]) -> list[int]:
    arr = np.asarray(px, dtype=np.uint32)
    g = (arr >> 8) & 0xFF
    r = (((arr >> 16) & 0xFF) + g) & 0xFF
    b = ((arr & 0xFF) + g) & 0xFF
    out = (arr & 0xFF00FF00) | (r << 16) | b
    return out.tolist()


def _inv_color_indexing(px: list[int], tr: _Transform, ysize: int) -> list[int]:
    pal = tr.palette or []
    wb = tr.size_bits
    xsize = tr.xsize_at
    packed_x = (xsize + (1 << wb) - 1) >> wb
    pal_arr = np.asarray(pal + [0], dtype=np.uint32)  # OOB index -> 0
    greens = (np.asarray(px, dtype=np.uint32).reshape(ysize, packed_x) >> 8) & 0xFF
    if wb == 0:
        idx = greens
    else:
        per = 1 << wb  # pixels per packed green byte
        bits = 8 >> wb
        shifts = (np.arange(per, dtype=np.uint32) * bits)[None, None, :]
        idx = (greens[:, :, None] >> shifts) & ((1 << bits) - 1)
        idx = idx.reshape(ysize, packed_x * per)[:, :xsize]
    idx = np.minimum(idx, len(pal_arr) - 1).astype(np.int64)
    oob = idx >= len(pal)
    out = pal_arr[idx]
    out[oob] = 0
    return out.reshape(-1).tolist()


def _split(argb: int) -> tuple[int, int, int, int]:
    return (argb >> 24) & 0xFF, (argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF


def _ct_delta(t: int, c: int) -> int:
    """(int8)t * (int8)c >> 5 with arithmetic shift (RFC 9649 §4.3)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(
    px: list[int], tr: _Transform, xsize: int, ysize: int
) -> list[int]:
    sb = tr.size_bits
    bw = (xsize + (1 << sb) - 1) >> sb
    image = tr.image or []
    out = list(px)
    for y in range(ysize):
        row = y * xsize
        brow = (y >> sb) * bw
        for x in range(xsize):
            cte = image[brow + (x >> sb)]
            g2r = cte & 0xFF  # blue channel
            g2b = (cte >> 8) & 0xFF  # green channel
            r2b = (cte >> 16) & 0xFF  # red channel
            a, r, g, b = _split(out[row + x])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[row + x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(l: int, t: int, tl: int) -> int:
    p_l = 0
    p_t = 0
    for sh in (24, 16, 8, 0):
        cl = (l >> sh) & 0xFF
        ct = (t >> sh) & 0xFF
        ctl = (tl >> sh) & 0xFF
        p = cl + ct - ctl
        p_l += abs(p - cl)
        p_t += abs(p - ct)
    return l if p_l < p_t else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc-toward-zero
        out |= _clamp(a + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tl: int, tr_: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr_
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr_), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr_)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr_))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise ImageFormatError(f"bad predictor mode {mode}")


def _add_px(a: int, b: int) -> int:
    """Per-channel modular add (prediction residual recombination)."""
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _pred_at(
    px: list[int], x: int, y: int, xsize: int, mode: int
) -> int:
    """Prediction for (x, y) from already-final pixels (RFC 9649 §4.2):
    (0,0) -> opaque black; rest of row 0 -> L; column 0 -> T; and for
    the rightmost column TR wraps to the leftmost pixel of the current
    row (the spec's memory-layout rule)."""
    i = y * xsize + x
    if x == 0 and y == 0:
        return 0xFF000000
    if y == 0:
        return px[i - 1]
    if x == 0:
        return px[i - xsize]
    l = px[i - 1]
    t = px[i - xsize]
    tl = px[i - xsize - 1]
    # rightmost column: TR wraps to the leftmost pixel of the CURRENT
    # row (top[x+1] under the spec's contiguous-rows memory rule)
    tr_ = px[i - xsize + 1]  # == px[y*xsize] when x == xsize-1
    return _predict(mode, l, t, tl, tr_)


def _inv_predictor(
    px: list[int], tr: _Transform, xsize: int, ysize: int
) -> list[int]:
    sb = tr.size_bits
    bw = (xsize + (1 << sb) - 1) >> sb
    image = tr.image or []
    out = list(px)
    for y in range(ysize):
        brow = (y >> sb) * bw
        for x in range(xsize):
            mode = (image[brow + (x >> sb)] >> 8) & 0xFF
            pred = _pred_at(out, x, y, xsize, mode)
            out[y * xsize + x] = _add_px(out[y * xsize + x], pred)
    return out


# ------------------------------------------------------------- container


def sniff_webp(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a lossless WebP to an RGB uint8 HxWx3 array (alpha is
    composited-out by dropping it — the repo's raster contract)."""
    if not sniff_webp(payload):
        raise ImageFormatError("not a WebP (RIFF/WEBP magic missing)")
    pos = 12
    vp8l: bytes | None = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            # lossy WebP: full from-scratch VP8 keyframe decoder
            from valere_ocr_ray.extract.vp8 import decode_vp8

            return decode_vp8(body)
        pos += 8 + size + (size & 1)  # chunks are even-padded
    if vp8l is None or len(vp8l) < 5:
        raise ImageFormatError("no VP8L chunk in WebP container")
    if vp8l[0] != 0x2F:
        raise ImageFormatError("bad VP8L signature byte")
    br = _BitReader(vp8l[1:])
    xsize = br.read_bits(14) + 1
    ysize = br.read_bits(14) + 1
    br.read_bits(1)  # alpha hint
    if br.read_bits(3) != 0:
        raise ImageFormatError("unsupported VP8L version")
    px, _ = _decode_image_stream(br, xsize, ysize, True)
    arr = np.asarray(px, dtype=np.uint32).reshape(ysize, xsize)
    out = np.empty((ysize, xsize, 3), dtype=np.uint8)
    out[:, :, 0] = (arr >> 16) & 0xFF
    out[:, :, 1] = (arr >> 8) & 0xFF
    out[:, :, 2] = arr & 0xFF
    return out


# ================================================================ encoder


def _huffman_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Code lengths from frequencies, depth-limited by frequency
    smoothing (halve-and-floor until the tree fits)."""
    n = len(freqs)
    f = [max(0, v) for v in freqs]
    used = [i for i, v in enumerate(f) if v]
    lengths = [0] * n
    if not used:
        return lengths
    if len(used) == 1:
        s = used[0]
        if s <= 255:
            # expressible as a 1-symbol simple code (zero bits per use)
            lengths[s] = 1
            return lengths
        # symbols >255 can't ride the simple form: pad with a dummy
        # neighbor so the normal path gets a Kraft-complete code
        lengths[s] = 1
        lengths[0] = 1
        return lengths
    cur = {i: f[i] for i in used}
    while True:
        heap = [(w, i, ("leaf", i)) for i, w in cur.items()]
        heapq.heapify(heap)
        tick = n
        while len(heap) > 1:
            w1, _, t1 = heapq.heappop(heap)
            w2, _, t2 = heapq.heappop(heap)
            heapq.heappush(heap, (w1 + w2, tick, ("node", t1, t2)))
            tick += 1
        depths: dict[int, int] = {}

        def walk(node, d):
            stack = [(node, d)]
            while stack:
                nd, dd = stack.pop()
                if nd[0] == "leaf":
                    depths[nd[1]] = max(1, dd)
                else:
                    stack.append((nd[1], dd + 1))
                    stack.append((nd[2], dd + 1))

        walk(heap[0][2], 0)
        if max(depths.values()) <= max_len:
            for i, d in depths.items():
                lengths[i] = d
            return lengths
        cur = {i: max(1, w // 2) for i, w in cur.items()}


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> list[int]:
    """Emit the prefix-code header; returns canonical codes."""
    used = [(s, ln) for s, ln in enumerate(lengths) if ln]
    if 1 <= len(used) <= 2 and all(s <= 255 for s, _ in used):
        bw.write_bits(1, 1)  # simple
        bw.write_bits(len(used) - 1, 1)
        s0 = used[0][0]
        if s0 <= 1:
            bw.write_bits(0, 1)
            bw.write_bits(s0, 1)
        else:
            bw.write_bits(1, 1)
            bw.write_bits(s0, 8)
        if len(used) == 2:
            bw.write_bits(used[1][0], 8)
        else:
            # 1-symbol codes read ZERO bits per use: zero the length so
            # the emission loop writes nothing for this code
            lengths[s0] = 0
        codes = [0] * len(lengths)
        if len(used) == 2:
            codes[used[1][0]] = 1
        return codes
    # normal path: code the lengths with the code-length code
    bw.write_bits(0, 1)
    last_nz = max(s for s, _ in used)
    cl_syms: list[tuple[int, int]] = []  # (cl symbol, extra payload)
    i = 0
    while i <= last_nz:
        ln = lengths[i]
        if ln == 0:
            run = 1
            while i + run <= last_nz and lengths[i + run] == 0:
                run += 1
            while run >= 3:
                take = min(run, 138)
                if take <= 10:
                    cl_syms.append((17, take - 3))
                else:
                    cl_syms.append((18, take - 11))
                run -= take
                i += take
            for _ in range(run):
                cl_syms.append((0, -1))
                i += 1
        else:
            cl_syms.append((ln, -1))
            i += 1
    cl_freq = [0] * 19
    for s, _ in cl_syms:
        cl_freq[s] += 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    cl_codes = _canonical_codes(cl_lengths)
    # degenerate code-length code (one distinct symbol): decoders —
    # libwebp and ours alike — consume ZERO bits per symbol for a
    # 1-symbol table, so the emission loop must write none either
    # (extras of 17/18 still ride the stream)
    cl_emit = cl_lengths
    if sum(1 for v in cl_lengths if v) == 1:
        cl_emit = [0] * 19
    bw.write_bits(15, 4)  # num_code_lengths = 19: write all, in order
    for sym in _CL_ORDER:
        bw.write_bits(cl_lengths[sym], 3)
    # explicit max_symbol: cl_syms entries consumed, rest auto-zero
    n_coded = len(cl_syms)
    bw.write_bits(1, 1)
    nbits = 2
    while (n_coded - 2) >= (1 << nbits):
        nbits += 2
    bw.write_bits((nbits - 2) // 2, 3)
    bw.write_bits(n_coded - 2, nbits)
    for s, extra in cl_syms:
        bw.write_code(cl_codes[s], cl_emit[s])
        if s == 17:
            bw.write_bits(extra, 3)
        elif s == 18:
            bw.write_bits(extra, 7)
    return _canonical_codes(lengths)


def _prefix_encode(v: int, spans: list[tuple[int, int, int]]) -> tuple[int, int, int]:
    """value -> (code, extra_bits, extra_val)."""
    for first, eb, code in reversed(spans):
        if v >= first:
            return code, eb, v - first
    raise ValueError(f"unencodable prefix value {v}")


_TOK_LIT = 0
_TOK_COPY = 1
_TOK_CACHE = 2


def _tokenize(
    px: list[int], xsize: int, cache_bits: int
) -> list[tuple[int, int, int]]:
    """Greedy LZ77 against dist 1 and the previous row + color cache.
    Returns (kind, a, b): literal argb / (length, dist) / cache index."""
    cache_size = 1 << cache_bits if cache_bits else 0
    cache = [-1] * cache_size
    toks: list[tuple[int, int, int]] = []
    n = len(px)
    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        for dist in (1, xsize) if xsize > 1 else (1,):
            if i >= dist:
                l = 0
                lim = min(n - i, 4096)
                while l < lim and px[i + l - dist] == px[i + l]:
                    l += 1
                if l > best_len:
                    best_len, best_dist = l, dist
        if best_len >= 3:
            toks.append((_TOK_COPY, best_len, best_dist))
            if cache_size:
                for k in range(best_len):
                    v = px[i + k]
                    cache[_cache_key(v, cache_bits)] = v
            i += best_len
            continue
        v = px[i]
        if cache_size:
            key = _cache_key(v, cache_bits)
            if cache[key] == v:
                toks.append((_TOK_CACHE, key, 0))
                i += 1
                continue
            cache[key] = v
        toks.append((_TOK_LIT, v, 0))
        i += 1
    return toks


def _encode_image_stream(
    bw: _BitWriter,
    px: list[int],
    xsize: int,
    *,
    cache_bits: int = 0,
    lz77: bool = True,
    level0: bool = False,
) -> None:
    """Entropy-code one image stream (no transforms — callers write
    those first) per RFC 9649 §5: color-cache info, then — for level-0
    streams only — the meta-prefix bit (0: single group), then the five
    prefix-code headers, then the token stream."""
    if cache_bits:
        bw.write_bits(1, 1)
        bw.write_bits(cache_bits, 4)
    else:
        bw.write_bits(0, 1)
    if level0:
        bw.write_bits(0, 1)  # no meta prefix codes (single group)
    toks = (
        _tokenize(px, xsize, cache_bits)
        if lz77
        else [(_TOK_LIT, v, 0) for v in px]
    )
    cache_size = (1 << cache_bits) if cache_bits else 0
    g_freq = [0] * (_GREEN_LIT + _N_LENGTH + cache_size)
    r_freq = [0] * 256
    b_freq = [0] * 256
    a_freq = [0] * 256
    d_freq = [0] * 40
    enc: list[tuple] = []
    for kind, a, b in toks:
        if kind == _TOK_LIT:
            al, r, g, bl = _split(a)
            g_freq[g] += 1
            r_freq[r] += 1
            b_freq[bl] += 1
            a_freq[al] += 1
            enc.append((_TOK_LIT, g, r, bl, al))
        elif kind == _TOK_COPY:
            lc, leb, lev = _prefix_encode(a, _LEN_SPANS)
            dist = b
            if dist == xsize and xsize > 1:
                dv = 1  # map entry (0, 1)
            elif dist == 1:
                dv = 2 if xsize > 1 else 1  # map entry (1, 0)
            else:
                dv = dist + 120
            dc, deb, dev = _prefix_encode(dv, _DIST_SPANS)
            g_freq[_GREEN_LIT + lc] += 1
            d_freq[dc] += 1
            enc.append((_TOK_COPY, lc, leb, lev, dc, deb, dev))
        else:
            g_freq[_GREEN_LIT + _N_LENGTH + a] += 1
            enc.append((_TOK_CACHE, a))
    g_len = _huffman_lengths(g_freq, 15)
    r_len = _huffman_lengths(r_freq, 15)
    b_len = _huffman_lengths(b_freq, 15)
    a_len = _huffman_lengths(a_freq, 15)
    d_len = _huffman_lengths(d_freq, 15)
    # a code must exist even when never used (the decoder reads five)
    for ln, default in ((r_len, 0), (b_len, 0), (a_len, 0), (d_len, 0), (g_len, 0)):
        if not any(ln):
            ln[default] = 1
    g_codes = _write_prefix_code(bw, g_len)
    r_codes = _write_prefix_code(bw, r_len)
    b_codes = _write_prefix_code(bw, b_len)
    a_codes = _write_prefix_code(bw, a_len)
    d_codes = _write_prefix_code(bw, d_len)
    for tok in enc:
        if tok[0] == _TOK_LIT:
            _, g, r, bl, al = tok
            bw.write_code(g_codes[g], g_len[g])
            bw.write_code(r_codes[r], r_len[r])
            bw.write_code(b_codes[bl], b_len[bl])
            bw.write_code(a_codes[al], a_len[al])
        elif tok[0] == _TOK_COPY:
            _, lc, leb, lev, dc, deb, dev = tok
            sym = _GREEN_LIT + lc
            bw.write_code(g_codes[sym], g_len[sym])
            if leb:
                bw.write_bits(lev, leb)
            bw.write_code(d_codes[dc], d_len[dc])
            if deb:
                bw.write_bits(dev, deb)
        else:
            sym = _GREEN_LIT + _N_LENGTH + tok[1]
            bw.write_code(g_codes[sym], g_len[sym])


def encode_webp(
    pixels: np.ndarray,
    *,
    predictor: bool = False,
    subtract_green: bool = False,
    cache_bits: int = 6,
) -> bytes:
    """Encode RGB uint8 HxWx3 as lossless WebP (VP8L).

    ≤256-color images take the palette path (color-indexing transform
    with sub-byte bundling — the scanned-card case packs 8 px/byte);
    truecolor images optionally apply subtract-green and/or a uniform
    T-predictor first.  Round-trip (``decode_webp(encode_webp(x)) ==
    x``) is exact for any RGB input.
    """
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_webp expects HxWx3 uint8 RGB")
    h, w = pixels.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("dimensions out of VP8L range")
    arr = pixels.astype(np.uint32)
    argb = (
        np.uint32(0xFF000000)
        | (arr[:, :, 0] << 16)
        | (arr[:, :, 1] << 8)
        | arr[:, :, 2]
    )
    flat = argb.reshape(-1)
    uniq = np.unique(flat)

    bw = _BitWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)  # alpha hint
    bw.write_bits(0, 3)  # version

    if len(uniq) <= 256:
        # --- palette path
        pal = uniq.tolist()
        lut = {v: i for i, v in enumerate(pal)}
        idx = np.asarray([lut[v] for v in flat.tolist()], dtype=np.uint32).reshape(
            h, w
        )
        n_colors = len(pal)
        if n_colors <= 2:
            wb = 3
        elif n_colors <= 4:
            wb = 2
        elif n_colors <= 16:
            wb = 1
        else:
            wb = 0
        bw.write_bits(1, 1)  # transform present
        bw.write_bits(3, 2)  # COLOR_INDEXING
        bw.write_bits(n_colors - 1, 8)
        deltas = []
        prev = 0
        for v in pal:
            d = (
                (((v >> 24) - (prev >> 24)) & 0xFF) << 24
                | ((((v >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16
                | ((((v >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8
                | (((v & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            deltas.append(d)
            prev = v
        _encode_image_stream(bw, deltas, n_colors, cache_bits=0, lz77=False)
        if wb:
            per = 1 << wb
            bits = 8 >> wb
            packed_w = (w + per - 1) // per
            pad = packed_w * per - w
            if pad:
                idx = np.pad(idx, ((0, 0), (0, pad)))
            grp = idx.reshape(h, packed_w, per)
            green = np.zeros((h, packed_w), dtype=np.uint32)
            for k in range(per):
                green |= grp[:, :, k] << (k * bits)
        else:
            packed_w = w
            green = idx
        packed_px = (np.uint32(0xFF000000) | (green << 8)).reshape(-1).tolist()
        bw.write_bits(0, 1)  # no more transforms
        _encode_image_stream(
            bw, packed_px, packed_w, cache_bits=cache_bits, level0=True
        )
    else:
        px = flat.copy()
        order: list[int] = []
        if subtract_green:
            order.append(2)
        if predictor:
            order.append(0)
        for kind in order:
            bw.write_bits(1, 1)
            bw.write_bits(kind, 2)
            if kind == 2:
                g = (px >> 8) & 0xFF
                r = (((px >> 16) & 0xFF) - g) & 0xFF
                b = ((px & 0xFF) - g) & 0xFF
                px = (px & np.uint32(0xFF00FF00)) | (r << 16) | b
            else:  # uniform T-predictor (mode 2), one block size 2^9
                sb = 7  # size_bits-2 max is 7 -> block 512
                bw.write_bits(sb, 3)
                size_bits = sb + 2
                bwc = (w + (1 << size_bits) - 1) >> size_bits
                bhc = (h + (1 << size_bits) - 1) >> size_bits
                mode_px = [0xFF000200] * (bwc * bhc)  # green=2 (T)
                _encode_image_stream(bw, mode_px, bwc, cache_bits=0, lz77=False)
                cur = px.reshape(h, w).tolist()
                res = [[0] * w for _ in range(h)]
                final = [v for row in cur for v in row]
                for y in range(h):
                    for x in range(w):
                        mode = 2
                        if y == 0 and x == 0:
                            pred = 0xFF000000
                        elif y == 0:
                            pred = final[x - 1]
                        elif x == 0:
                            pred = final[(y - 1) * w]
                        else:
                            pred = final[(y - 1) * w + x]
                        v = final[y * w + x]
                        res[y][x] = (
                            ((((v >> 24) - (pred >> 24)) & 0xFF) << 24)
                            | (((((v >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16)
                            | (((((v >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8)
                            | ((((v & 0xFF) - (pred & 0xFF)) & 0xFF))
                        )
                px = np.asarray(
                    [v for row in res for v in row], dtype=np.uint32
                )
        bw.write_bits(0, 1)  # end of transforms
        _encode_image_stream(
            bw, px.tolist(), w, cache_bits=cache_bits, level0=True
        )

    body = b"\x2f" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff
