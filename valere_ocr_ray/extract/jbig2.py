"""JBIG2 (ITU-T T.88) — the scanner/fax bilevel codec inside PDF
``/JBIG2Decode`` streams: MQ arithmetic coder + generic-region decode,
plus the encoder twin used to synthesize fixtures.

The reference's Textract path reads *any* scan
(``IDD/finalcodes/SignedAgreement.py:124-156``); after CCITT, JBIG2 is
the dominant codec real fax/scanner PDFs carry (VERDICT r4 item 2),
so the local OCR leg needs it for parity.  Scope is the
scanner-default subset:

* **MQ coder** (T.88 Annex E; the identical coder appears in JPEG 2000
  Annex C) — 47-state Qe table, decoder AND encoder, with the 0xFF
  byte-stuffing rules; reading past the end of data feeds 0xFF bytes
  per the spec's marker convention.
* **Generic region decoding** (T.88 §6.2) — all four arithmetic
  templates: template 0 with nominal AT pixels (the layout every
  scanner encoder emits) on a fast incremental-context path, and
  templates 0-3 with ANY causal AT layout on a template-list path;
  TPGDON (typical-prediction) row-copy supported; ``MMR=1`` regions
  route to the existing T.6 decoder (``extract/ccitt.decode_g4``).
* **PDF-embedded segment stream** (T.88 Annex, "embedded organization"
  — no file header): segment headers, page info, immediate generic
  region (types 36/38/39), end-of-page/stripe/file skipped.  Symbol /
  text / halftone / refinement segments raise ``ImageFormatError`` —
  found-but-undecodable routes to the OCR seam's skip status, it is
  never mistaken for a blank page.

Bit layout of the template-0 context (16 bits, MSB first):
``[y-2: x-2..x+2][y-1: x-3..x+3][y: x-4..x-1]`` — the ordering under
which the spec's SLTP pseudo-pixel context is the published 0x9B25.
"""

from __future__ import annotations

import struct

import numpy as np

from valere_ocr_ray.extract.image_decode import ImageFormatError

# T.88 Table E.1 (== JPEG 2000 Table C.2): (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]
_QE_Q = [q for q, _, _, _ in _QE]
_QE_NMPS = [n for _, n, _, _ in _QE]
_QE_NLPS = [n for _, _, n, _ in _QE]
_QE_SW = [s for _, _, _, s in _QE]

# SLTP (typical-prediction) pseudo-pixel contexts per template (T.88
# §6.2.5.7); only template 0 is exercised here
_SLTP_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


class MQDecoder:
    """T.88 §E.3 software-conventions decoder.  Context state lives in
    caller-owned arrays ``icx``/``mpscx`` so one decoder can serve any
    number of context labels."""

    __slots__ = ("data", "bp", "c", "a", "ct", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.n = len(data)
        self.bp = 0
        b0 = data[0] if self.n else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.data[i] if i < self.n else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, icx: list, mpscx: list, cx: int) -> int:
        i = icx[cx]
        qe = _QE_Q[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = mpscx[cx]
                icx[cx] = _QE_NMPS[i]
            else:
                d = 1 - mpscx[cx]
                if _QE_SW[i]:
                    mpscx[cx] = 1 - mpscx[cx]
                icx[cx] = _QE_NLPS[i]
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mpscx[cx]
            if self.a < qe:
                d = 1 - mpscx[cx]
                if _QE_SW[i]:
                    mpscx[cx] = 1 - mpscx[cx]
                icx[cx] = _QE_NLPS[i]
            else:
                d = mpscx[cx]
                icx[cx] = _QE_NMPS[i]
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 §E.2 encoder (the fixture twin)."""

    __slots__ = ("out", "c", "a", "ct", "b_valid")

    def __init__(self) -> None:
        self.out = bytearray()
        self.c = 0
        self.a = 0x8000
        self.ct = 12
        self.b_valid = False  # no byte emitted yet

    def _byteout(self) -> None:
        if self.b_valid and self.out and self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                if self.b_valid:
                    self.out[-1] += 1
                    if self.out[-1] == 0xFF:
                        self.c &= 0x7FFFFFF
                        self.out.append((self.c >> 20) & 0xFF)
                        self.c &= 0xFFFFF
                        self.ct = 7
                        self.b_valid = True
                        return
                else:
                    # carry with no prior byte cannot occur after the
                    # first byteout; fold it into the emitted byte
                    pass
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
        self.b_valid = True

    def encode(self, icx: list, mpscx: list, cx: int, d: int) -> None:
        i = icx[cx]
        qe = _QE_Q[i]
        if d == mpscx[cx]:
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            icx[cx] = _QE_NMPS[i]
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if _QE_SW[i]:
                mpscx[cx] = 1 - mpscx[cx]
            icx[cx] = _QE_NLPS[i]
        # RENORME
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS (T.88 Figure E.12): largest in-interval C whose low
        # 16 bits are all ones, so the tail truncates into the marker
        temp = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= temp:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        # marker-terminated ending per Figure E.11: 0xFF 0xAC
        if not (self.out and self.out[-1] == 0xFF):
            self.out.append(0xFF)
        self.out.append(0xAC)
        return bytes(self.out)


# ---------------------------------------------------------------- generic


_NOMINAL_AT0 = ((3, -1), (-3, -1), (2, -2), (-2, -2))

# fixed (non-AT) context pixels per template (T.88 Figures 4-7); the
# context label is the sorted-by-(y,x) template read MSB-first — the
# ordering under which template 0's SLTP context is the published
# 0x9B25 (validated against the fast path below), and the same generic
# construction the field-proven readers use for every template.
_FIXED_TEMPLATE = {
    0: (
        (-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0),
    ),
    1: (
        (-1, -2), (0, -2), (1, -2), (2, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-3, 0), (-2, 0), (-1, 0),
    ),
    2: (
        (-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-2, 0), (-1, 0),
    ),
    3: (
        (-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0),
    ),
}
_NOMINAL_AT = {
    0: _NOMINAL_AT0,
    1: ((3, -1),),
    2: ((2, -1),),
    3: ((2, -1),),
}


def _sorted_template(template: int, at: tuple) -> list:
    pix = list(_FIXED_TEMPLATE[template]) + [tuple(p) for p in at]
    pix.sort(key=lambda p: (p[1], p[0]))
    return pix


def _decode_generic_template(
    data: bytes,
    width: int,
    height: int,
    template: int,
    at: tuple,
    tpgdon: bool,
) -> np.ndarray:
    """Template-list generic decode: any GBTEMPLATE 0-3 with ANY AT
    layout (current row's AT pixels must be left of x, which every
    conformant encoder satisfies — enforced).  Slower than the pinned
    template-0 window path; used for the non-default layouts."""
    pix = _sorted_template(template, at)
    for dx, dy in pix:
        if dy > 0 or (dy == 0 and dx >= 0):
            raise ImageFormatError("JBIG2 AT pixel not strictly causal")
    nbits = len(pix)
    dec = MQDecoder(data)
    icx = [0] * (1 << nbits)
    mpscx = [0] * (1 << nbits)
    out = np.zeros((height, width), dtype=np.uint8)
    ltp = 0
    sltp_cx = _SLTP_CTX[template]
    decode = dec.decode
    rows: list[bytes] = []
    zeros = bytes(width)
    for y in range(height):
        if tpgdon:
            ltp ^= decode(icx, mpscx, sltp_cx)
            if ltp:
                prev = rows[-1] if rows else zeros
                rows.append(prev)
                out[y] = np.frombuffer(prev, dtype=np.uint8)
                continue
        row = bytearray(width)
        for x in range(width):
            cx = 0
            for dx, dy in pix:
                xx, yy = x + dx, y + dy
                if yy < 0 or xx < 0 or xx >= width:
                    bit = 0
                elif yy == y:
                    bit = row[xx]
                else:
                    bit = rows[yy][xx]
                cx = (cx << 1) | bit
            row[x] = decode(icx, mpscx, cx)
        rows.append(bytes(row))
        out[y] = np.frombuffer(rows[-1], dtype=np.uint8)
    return out.astype(bool)


def _encode_generic_template(
    ink: np.ndarray, template: int, at: tuple
) -> bytes:
    """Template-list twin of :func:`_decode_generic_template` (used by
    tests to pin the non-default layouts by round-trip)."""
    pix = _sorted_template(template, at)
    ink = np.asarray(ink, dtype=bool).astype(np.uint8)
    height, width = ink.shape
    enc = MQEncoder()
    nbits = len(pix)
    icx = [0] * (1 << nbits)
    mpscx = [0] * (1 << nbits)
    encode = enc.encode
    for y in range(height):
        for x in range(width):
            cx = 0
            for dx, dy in pix:
                xx, yy = x + dx, y + dy
                bit = (
                    0
                    if yy < 0 or xx < 0 or xx >= width or (yy == y and xx >= x)
                    else int(ink[yy, xx])
                )
                cx = (cx << 1) | bit
            encode(icx, mpscx, cx, int(ink[y, x]))
    return enc.flush()


def decode_generic_region(
    data: bytes,
    width: int,
    height: int,
    *,
    template: int = 0,
    at: tuple = _NOMINAL_AT0,
    tpgdon: bool = False,
) -> np.ndarray:
    """Arithmetic generic-region decode → boolean ink (True = black).
    Template 0 with nominal AT pixels (the scanner-encoder default)
    takes the fast incremental-context path; templates 1-3 and
    non-nominal AT layouts go through the template-list path."""
    if template not in _FIXED_TEMPLATE:
        raise ImageFormatError(f"unsupported generic template {template}")
    if width <= 0 or height <= 0 or width * height > 64_000_000:
        raise ImageFormatError("bad JBIG2 region geometry")
    if template != 0 or tuple(at) != _NOMINAL_AT0:
        return _decode_generic_template(data, width, height, template, at, tpgdon)
    dec = MQDecoder(data)
    icx = [0] * (1 << 16)
    mpscx = [0] * (1 << 16)
    out = np.zeros((height, width), dtype=np.uint8)
    zeros = bytes(width)
    prev2: bytes = zeros  # row y-2 as 0/1 bytes
    prev1: bytes = zeros  # row y-1
    ltp = 0
    sltp_cx = _SLTP_CTX[template]
    decode = dec.decode
    for y in range(height):
        if tpgdon:
            ltp ^= decode(icx, mpscx, sltp_cx)
            if ltp:
                out[y] = np.frombuffer(prev1, dtype=np.uint8)
                prev2 = prev1  # row copied: windows shift down unchanged
                continue
        row = bytearray(width)
        # context windows at x=0 (out-of-bounds pixels are 0):
        # w2 covers (y-2, x-2..x+2), w1 (y-1, x-3..x+3), w0 (y, x-4..x-1)
        w2 = (prev2[0] << 2) | ((prev2[1] << 1) if width > 1 else 0) | (
            prev2[2] if width > 2 else 0
        )
        w1 = (prev1[0] << 3) | ((prev1[1] << 2) if width > 1 else 0) | (
            (prev1[2] << 1) if width > 2 else 0
        ) | (prev1[3] if width > 3 else 0)
        w0 = 0
        for x in range(width):
            px = decode(icx, mpscx, (w2 << 11) | (w1 << 4) | w0)
            row[x] = px
            nx2 = x + 3
            nx1 = x + 4
            w2 = ((w2 << 1) | (prev2[nx2] if nx2 < width else 0)) & 0x1F
            w1 = ((w1 << 1) | (prev1[nx1] if nx1 < width else 0)) & 0x7F
            w0 = ((w0 << 1) | px) & 0xF
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev2 = prev1
        prev1 = bytes(row)
    return out.astype(bool)


def encode_generic_region(ink: np.ndarray) -> bytes:
    """Boolean ink → MQ-coded generic-region body (template 0, nominal
    AT, TPGDON off) — the fixture twin of :func:`decode_generic_region`."""
    ink = np.asarray(ink, dtype=bool)
    height, width = ink.shape
    enc = MQEncoder()
    icx = [0] * (1 << 16)
    mpscx = [0] * (1 << 16)
    zeros = bytes(width)
    prev2: bytes = zeros
    prev1: bytes = zeros
    encode = enc.encode
    for y in range(height):
        row = bytes(ink[y].astype(np.uint8))
        w2 = (prev2[0] << 2) | ((prev2[1] << 1) if width > 1 else 0) | (
            prev2[2] if width > 2 else 0
        )
        w1 = (prev1[0] << 3) | ((prev1[1] << 2) if width > 1 else 0) | (
            (prev1[2] << 1) if width > 2 else 0
        ) | (prev1[3] if width > 3 else 0)
        w0 = 0
        for x in range(width):
            px = row[x]
            encode(icx, mpscx, (w2 << 11) | (w1 << 4) | w0, px)
            nx2 = x + 3
            nx1 = x + 4
            w2 = ((w2 << 1) | (prev2[nx2] if nx2 < width else 0)) & 0x1F
            w1 = ((w1 << 1) | (prev1[nx1] if nx1 < width else 0)) & 0x7F
            w0 = ((w0 << 1) | px) & 0xF
        prev2 = prev1
        prev1 = row
    return enc.flush()


# ------------------------------------------------------------- segments


def _segment_header(
    num: int, seg_type: int, page: int, data_len: int
) -> bytes:
    """Embedded-organization segment header: no referred-to segments,
    1-byte page association."""
    return struct.pack(">IBBBI", num, seg_type & 0x3F, 0x00, page, data_len)


def encode_jbig2_embedded(ink: np.ndarray) -> bytes:
    """Boolean ink → PDF-embedded JBIG2 stream (page info + immediate
    generic region + end-of-page), the ``/JBIG2Decode`` body shape."""
    ink = np.asarray(ink, dtype=bool)
    h, w = ink.shape
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)  # OP = OR
    gen_flags = bytes([0x00])  # MMR=0, template 0, TPGDON=0
    at = b"\x03\xff\xfd\xff\x02\xfe\xfe\xfe"  # nominal AT1..AT4
    body = encode_generic_region(ink)
    region = region_info + gen_flags + at + body
    out = bytearray()
    out += _segment_header(0, 48, 1, len(page_info)) + page_info
    out += _segment_header(1, 38, 1, len(region)) + region  # immediate generic
    out += _segment_header(2, 49, 1, 0)  # end of page
    return bytes(out)


def _parse_segment_headers(data: bytes):
    """Yield ``(seg_type, payload)`` for each segment of an embedded
    stream (T.88 §7.2, no file header)."""
    pos = 0
    n = len(data)
    while pos + 11 <= n:
        num = struct.unpack_from(">I", data, pos)[0]
        flags = data[pos + 4]
        seg_type = flags & 0x3F
        page_assoc_4 = bool(flags & 0x40)
        pos += 5
        rts = data[pos]
        count = rts >> 5
        if count == 7:
            count = struct.unpack_from(">I", data, pos)[0] & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8  # long form + retain bits
        else:
            pos += 1
        ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
        pos += count * ref_size
        pos += 4 if page_assoc_4 else 1
        if pos + 4 > n:
            raise ImageFormatError("truncated JBIG2 segment header")
        dlen = struct.unpack_from(">I", data, pos)[0]
        pos += 4
        if dlen == 0xFFFFFFFF:
            raise ImageFormatError("JBIG2 unknown-length segment unsupported")
        if pos + dlen > n:
            raise ImageFormatError("truncated JBIG2 segment data")
        yield seg_type, data[pos : pos + dlen]
        pos += dlen


# segment types that carry coding machinery this subset doesn't decode
# (symbol dictionaries, text/halftone/refinement regions)
_UNSUPPORTED_TYPES = {0, 4, 5, 6, 7, 16, 20, 22, 23, 40, 42, 43}


def decode_jbig2_embedded(data: bytes, width: int, height: int) -> np.ndarray:
    """PDF ``/JBIG2Decode`` body → boolean ink of the page (True=black).
    Generic regions (arithmetic template 0 or MMR) compose onto the
    page with OR; unsupported segment types raise ``ImageFormatError``
    so the caller routes found-but-undecodable, never blank."""
    page = np.zeros((height, width), dtype=bool)
    saw_region = False
    for seg_type, payload in _parse_segment_headers(data):
        if seg_type in (48, 49, 50, 51, 62):  # page info / EOP / EOS / EOF / ext
            continue
        if seg_type in (36, 38, 39):  # (intermediate/immediate) generic region
            if len(payload) < 18:
                raise ImageFormatError("short JBIG2 generic region")
            rw, rh, rx, ry, _op = struct.unpack_from(">IIIIB", payload, 0)
            gflags = payload[17]
            mmr = gflags & 1
            template = (gflags >> 1) & 3
            tpgdon = bool(gflags & 8)
            pos = 18
            if mmr:
                from valere_ocr_ray.extract.ccitt import decode_g4

                ink = decode_g4(payload[pos:], rw, rh)
            else:
                n_at = 4 if template == 0 else 1
                at = tuple(
                    (
                        struct.unpack_from("b", payload, pos + 2 * k)[0],
                        struct.unpack_from("b", payload, pos + 2 * k + 1)[0],
                    )
                    for k in range(n_at)
                )
                pos += 2 * n_at
                ink = decode_generic_region(
                    payload[pos:], rw, rh, template=template, at=at,
                    tpgdon=tpgdon,
                )
            ye, xe = min(ry + rh, height), min(rx + rw, width)
            if ye > ry and xe > rx:
                page[ry:ye, rx:xe] |= ink[: ye - ry, : xe - rx]
            saw_region = True
            continue
        if seg_type in _UNSUPPORTED_TYPES:
            raise ImageFormatError(
                f"unsupported JBIG2 segment type {seg_type}"
            )
        # unknown but skippable segment (comments etc.) — ignore
    if not saw_region:
        raise ImageFormatError("JBIG2 stream contains no region")
    return page


__all__ = [
    "MQDecoder",
    "MQEncoder",
    "decode_generic_region",
    "encode_generic_region",
    "decode_jbig2_embedded",
    "encode_jbig2_embedded",
]
