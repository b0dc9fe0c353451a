"""Dependency-free CCITT Group 4 (ITU-T T.6 "MMR") codec.

Scanned-document PDFs — the reference's async-Textract bread and
butter (``IDD/finalcodes/SignedAgreement.py:124-156``) — very often
carry their page images as ``/Filter /CCITTFaxDecode`` XObjects with
``/K < 0`` (pure two-dimensional T.6 coding): it is the default output
of fax pipelines and most document scanners' "bilevel" setting.  Until
now those pages hit the ``skipped_image_no_ocr`` routing in
``extract/pdf_images.py``; this module decodes them for real so the
glyph-OCR kernel can read the page.

Scope — the PDF/TIFF-relevant subset, implemented in full from the
public spec (ITU-T T.6 §2, with the T.4 §2.2 modified-Huffman run
tables that horizontal mode shares):

* vertical (V0, VR1-3, VL1-3), pass, and horizontal coding modes over
  per-line changing-element lists;
* the complete T.4 white/black terminating (0-63) + make-up (64-1728)
  code tables and the shared extended make-up codes (1792-2560),
  with >2560 runs via repeated max make-ups;
* EOFB detection (and tolerance of streams that simply end);
* ``encode_g4`` is the test/synth twin: a spec-valid T.6 encoder
  (vertical-preferred mode selection, the same tables) so fixtures
  and round-trips need no native library.

``tests/test_ccitt.py`` pins BOTH directions against the system
libtiff (Compression=4 raw strips) when it is present: libtiff's
encoder output must decode bit-exactly here, and every stream
``encode_g4`` emits must decode bit-exactly under libtiff.

Bit convention: the codec speaks "ink" — boolean HxW arrays where
True = black.  T.6 white runs are False spans.  PDF's ``BlackIs1``
and TIFF's ``PhotometricInterpretation`` remap at the call site.
"""

from __future__ import annotations

import numpy as np

from valere_ocr_ray.extract.image_decode import ImageFormatError

# ---------------------------------------------------------------- tables
# T.4 §2.2 run-length codes as (bits-string, run) — terminating 0..63
# then make-up codes; EXT make-ups 1792+ are shared by both colors.

_WHITE_CODES = [
    ("00110101", 0), ("000111", 1), ("0111", 2), ("1000", 3),
    ("1011", 4), ("1100", 5), ("1110", 6), ("1111", 7),
    ("10011", 8), ("10100", 9), ("00111", 10), ("01000", 11),
    ("001000", 12), ("000011", 13), ("110100", 14), ("110101", 15),
    ("101010", 16), ("101011", 17), ("0100111", 18), ("0001100", 19),
    ("0001000", 20), ("0010111", 21), ("0000011", 22), ("0000100", 23),
    ("0101000", 24), ("0101011", 25), ("0010011", 26), ("0100100", 27),
    ("0011000", 28), ("00000010", 29), ("00000011", 30), ("00011010", 31),
    ("00011011", 32), ("00010010", 33), ("00010011", 34), ("00010100", 35),
    ("00010101", 36), ("00010110", 37), ("00010111", 38), ("00101000", 39),
    ("00101001", 40), ("00101010", 41), ("00101011", 42), ("00101100", 43),
    ("00101101", 44), ("00000100", 45), ("00000101", 46), ("00001010", 47),
    ("00001011", 48), ("01010010", 49), ("01010011", 50), ("01010100", 51),
    ("01010101", 52), ("00100100", 53), ("00100101", 54), ("01011000", 55),
    ("01011001", 56), ("01011010", 57), ("01011011", 58), ("01001010", 59),
    ("01001011", 60), ("00110010", 61), ("00110011", 62), ("00110100", 63),
    # make-up
    ("11011", 64), ("10010", 128), ("010111", 192), ("0110111", 256),
    ("00110110", 320), ("00110111", 384), ("01100100", 448),
    ("01100101", 512), ("01101000", 576), ("01100111", 640),
    ("011001100", 704), ("011001101", 768), ("011010010", 832),
    ("011010011", 896), ("011010100", 960), ("011010101", 1024),
    ("011010110", 1088), ("011010111", 1152), ("011011000", 1216),
    ("011011001", 1280), ("011011010", 1344), ("011011011", 1408),
    ("010011000", 1472), ("010011001", 1536), ("010011010", 1600),
    ("011000", 1664), ("010011011", 1728),
]

_BLACK_CODES = [
    ("0000110111", 0), ("010", 1), ("11", 2), ("10", 3),
    ("011", 4), ("0011", 5), ("0010", 6), ("00011", 7),
    ("000101", 8), ("000100", 9), ("0000100", 10), ("0000101", 11),
    ("0000111", 12), ("00000100", 13), ("00000111", 14), ("000011000", 15),
    ("0000010111", 16), ("0000011000", 17), ("0000001000", 18),
    ("00001100111", 19), ("00001101000", 20), ("00001101100", 21),
    ("00000110111", 22), ("00000101000", 23), ("00000010111", 24),
    ("00000011000", 25), ("000011001010", 26), ("000011001011", 27),
    ("000011001100", 28), ("000011001101", 29), ("000001101000", 30),
    ("000001101001", 31), ("000001101010", 32), ("000001101011", 33),
    ("000011010010", 34), ("000011010011", 35), ("000011010100", 36),
    ("000011010101", 37), ("000011010110", 38), ("000011010111", 39),
    ("000001101100", 40), ("000001101101", 41), ("000011011010", 42),
    ("000011011011", 43), ("000001010100", 44), ("000001010101", 45),
    ("000001010110", 46), ("000001010111", 47), ("000001100100", 48),
    ("000001100101", 49), ("000001010010", 50), ("000001010011", 51),
    ("000000100100", 52), ("000000110111", 53), ("000000111000", 54),
    ("000000100111", 55), ("000000101000", 56), ("000001011000", 57),
    ("000001011001", 58), ("000000101011", 59), ("000000101100", 60),
    ("000001011010", 61), ("000001100110", 62), ("000001100111", 63),
    # make-up
    ("0000001111", 64), ("000011001000", 128), ("000011001001", 192),
    ("000001011011", 256), ("000000110011", 320), ("000000110100", 384),
    ("000000110101", 448), ("0000001101100", 512), ("0000001101101", 576),
    ("0000001001010", 640), ("0000001001011", 704), ("0000001001100", 768),
    ("0000001001101", 832), ("0000001110010", 896), ("0000001110011", 960),
    ("0000001110100", 1024), ("0000001110101", 1088),
    ("0000001110110", 1152), ("0000001110111", 1216),
    ("0000001010010", 1280), ("0000001010011", 1344),
    ("0000001010100", 1408), ("0000001010101", 1472),
    ("0000001011010", 1536), ("0000001011011", 1600),
    ("0000001100100", 1664), ("0000001100101", 1728),
]

_EXT_CODES = [  # shared by both colors (T.4 table 3)
    ("00000001000", 1792), ("00000001100", 1856), ("00000001101", 1920),
    ("000000010010", 1984), ("000000010011", 2048), ("000000010100", 2112),
    ("000000010101", 2176), ("000000010110", 2240), ("000000010111", 2304),
    ("000000011100", 2368), ("000000011101", 2432), ("000000011110", 2496),
    ("000000011111", 2560),
]


def _run_tree(codes) -> dict:
    """(bits-string, run) list -> binary trie as nested dicts;
    leaves are run ints."""
    root: dict = {}
    for bits, run in codes:
        node = root
        for b in bits[:-1]:
            node = node.setdefault(int(b), {})
            if not isinstance(node, dict):  # pragma: no cover - table bug
                raise AssertionError("prefix collision")
        last = int(bits[-1])
        assert last not in node, bits
        node[last] = run
    return root


_WHITE_TREE = _run_tree(_WHITE_CODES + _EXT_CODES)
_BLACK_TREE = _run_tree(_BLACK_CODES + _EXT_CODES)
_WHITE_EMIT = {run: bits for bits, run in _WHITE_CODES + _EXT_CODES}
_BLACK_EMIT = {run: bits for bits, run in _BLACK_CODES + _EXT_CODES}


class _Bits:
    """MSB-first bit reader over bytes."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        p = self.pos
        if p >= self.n:
            raise ImageFormatError("CCITT stream exhausted mid-code")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def peek_zero_run(self) -> int:
        """Number of consecutive 0 bits ahead (bounded), for EOFB."""
        k = 0
        p = self.pos
        while p < self.n and k < 32:
            if (self.data[p >> 3] >> (7 - (p & 7))) & 1:
                break
            k += 1
            p += 1
        return k

    def skip_to_one(self) -> int:
        """Advance past consecutive 0 bits to the next 1 bit, UNCAPPED
        (T.4 fill before an EOL is unbounded — minimum-scan-line-time
        padding); cursor lands ON the 1 bit (or at stream end).
        Returns the number of zeros skipped."""
        k = 0
        p = self.pos
        while p < self.n and not ((self.data[p >> 3] >> (7 - (p & 7))) & 1):
            k += 1
            p += 1
        self.pos = p
        return k


def _read_run(bits: _Bits, tree: dict) -> int:
    """One MH run: make-up codes accumulate until a terminating code
    (< 64) closes the run (T.4 §2.2.3)."""
    total = 0
    while True:
        node = tree
        while isinstance(node, dict):
            node = node.get(bits.bit())
            if node is None:
                raise ImageFormatError("bad CCITT run code")
        total += node
        if node < 64:
            return total
        # make-up: a terminating code of the SAME color must follow


def _decode_2d_line(bits: _Bits, ref: list[int], width: int) -> list[int]:
    """Decode ONE two-dimensionally coded line (the T.6 line machinery,
    shared verbatim by T.4 mixed mode's 2-D lines) against ``ref`` (the
    previous line's changing elements, ``[width, width]``-padded).
    Returns the new line's change positions."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 = white
    while a0 < width:
        # b1: first ref change > a0 with parity == color
        i = 0
        while i < len(ref) and (ref[i] <= a0 or (i & 1) != color):
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        # ---- mode code
        if bits.bit():  # 1 -> V0
            a1 = b1
            mode = "v"
        else:
            if bits.bit():  # 01x
                mode = "v"
                a1 = b1 + (1 if bits.bit() else -1)
            else:
                if bits.bit():  # 001 -> horizontal
                    mode = "h"
                else:
                    if bits.bit():  # 0001 -> pass
                        mode = "p"
                    else:
                        # 0000 1x / 0000 01x ... -> VR2/VL2/VR3/VL3
                        if bits.bit():  # 00001x
                            a1 = b1 + (2 if bits.bit() else -2)
                            mode = "v"
                        else:
                            if bits.bit():  # 000001x
                                a1 = b1 + (3 if bits.bit() else -3)
                                mode = "v"
                            else:
                                raise ImageFormatError(
                                    "unsupported CCITT extension/EOL"
                                )
        if mode == "p":
            a0 = b2
            continue
        if mode == "h":
            start = max(a0, 0)
            r1 = _read_run(bits, _BLACK_TREE if color else _WHITE_TREE)
            r2 = _read_run(bits, _WHITE_TREE if color else _BLACK_TREE)
            cur.append(start + r1)
            cur.append(start + r1 + r2)
            a0 = start + r1 + r2
            continue
        # vertical
        if a1 < 0 or a1 > width:
            raise ImageFormatError("CCITT vertical mode out of range")
        cur.append(a1)
        a0 = a1
        color ^= 1
    return [c for c in cur if c <= width]


def _paint_row(changes: list[int], rowbuf: np.ndarray) -> None:
    """changes -> pixels (spans between changes alternate, white first)."""
    width = len(rowbuf)
    pos = 0
    ink = False
    for c in changes:
        if ink and c > pos:
            rowbuf[pos:c] = True
        pos = c
        ink = not ink
    if ink and pos < width:
        rowbuf[pos:width] = True


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 bytes -> boolean ink array (height, width), True = black.

    ``height`` rows are decoded; EOFB (if present) is tolerated but not
    required — PDF streams routinely end at the row count.
    """
    if width <= 0 or height <= 0:
        raise ImageFormatError("bad CCITT geometry")
    bits = _Bits(data)
    out = np.zeros((height, width), bool)
    # reference line as changing-element positions; index parity gives
    # the color changed TO (even index -> to-black)
    ref = [width, width]
    for row in range(height):
        # EOFB = two EOLs (000000000001 twice)
        if bits.peek_zero_run() >= 11:
            break
        changes = _decode_2d_line(bits, ref, width)
        _paint_row(changes, out[row])
        ref = changes + [width, width]
    return out


# ---------------------------------------------------------------- encode

def _changes(rowbuf: np.ndarray) -> list[int]:
    # change positions with an imaginary leading white pixel, so a row
    # that STARTS black yields a change at 0
    ext = np.empty(len(rowbuf) + 1, np.int8)
    ext[0] = 0
    ext[1:] = rowbuf
    return np.flatnonzero(np.diff(ext)).tolist()


def decode_g3_1d(
    data: bytes, width: int, height: int, byte_align: bool = False
) -> np.ndarray:
    """CCITT Group 3 one-dimensional (T.4 MH) bytes -> boolean ink.

    The PDF ``/K 0`` case: every line is an independent sequence of
    alternating white/black modified-Huffman runs summing to ``width``
    (EOL codes, tolerated if present, are skipped).  ``byte_align`` is
    PDF's ``/EncodedByteAlign`` (each line starts on a byte boundary
    — also TIFF Compression=2 "CCITT RLE" layout)."""
    if width <= 0 or height <= 0:
        raise ImageFormatError("bad CCITT geometry")
    bits = _Bits(data)
    out = np.zeros((height, width), bool)
    for row in range(height):
        if byte_align and bits.pos % 8:
            bits.pos += 8 - bits.pos % 8
        if bits.pos >= bits.n:
            break
        # optional EOL (000000000001) before the line; fill before an
        # EOL is unbounded, so walk to the actual terminating 1
        while bits.peek_zero_run() >= 11 and bits.pos + 12 <= bits.n:
            bits.skip_to_one()
            if bits.pos < bits.n:
                bits.pos += 1  # consume the trailing 1
            else:
                break
        pos = 0
        white = True
        rowbuf = out[row]
        while pos < width:
            run = _read_run(bits, _WHITE_TREE if white else _BLACK_TREE)
            if pos + run > width:
                raise ImageFormatError("CCITT G3 run overflows the line")
            if not white and run:
                rowbuf[pos : pos + run] = True
            pos += run
            white = not white
    return out


def encode_g3_1d(ink: np.ndarray, byte_align: bool = False) -> bytes:
    """Boolean ink -> T.4 one-dimensional bytes (the twin)."""
    if ink.ndim != 2:
        raise ImageFormatError("encode_g3_1d wants a 2-D boolean array")
    h, w = ink.shape
    outbits: list[str] = []

    def emit_run(run: int, black: bool) -> None:
        table = _BLACK_EMIT if black else _WHITE_EMIT
        while run >= 2624:
            outbits.append(table[2560])
            run -= 2560
        if run >= 64:
            make = (run // 64) * 64
            outbits.append(table[make])
            run -= make
        outbits.append(table[run])

    for row in range(h):
        if byte_align:
            n = sum(len(s) for s in outbits)
            if n % 8:
                outbits.append("0" * (8 - n % 8))
        changes = _changes(ink[row]) + [w]
        pos = 0
        black = False
        for c in changes:
            emit_run(c - pos, black)
            pos = c
            black = not black
        if pos < w:
            emit_run(w - pos, black)
    s = "".join(outbits)
    s += "0" * ((-len(s)) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _emit_run(outbits: list, run: int, black: bool) -> None:
    table = _BLACK_EMIT if black else _WHITE_EMIT
    while run >= 2624:  # repeated max make-up
        outbits.append(table[2560])
        run -= 2560
    if run >= 64:
        make = (run // 64) * 64
        outbits.append(table[make])
        run -= make
    outbits.append(table[run])


def _encode_2d_line(outbits: list, cur: list, ref: list, w: int) -> None:
    """Emit ONE two-dimensionally coded line (vertical-preferred T.6
    mode selection) for change list ``cur`` against reference ``ref`` —
    shared by the G4 twin and the mixed-G3 twin's 2-D lines."""
    curw = cur + [w, w]
    a0 = -1
    color = 0
    ci = 0  # index into curw of next change > a0
    while a0 < w:
        i = 0
        while i < len(ref) and (ref[i] <= a0 or (i & 1) != color):
            i += 1
        b1 = ref[i] if i < len(ref) else w
        b2 = ref[i + 1] if i + 1 < len(ref) else w
        while ci < len(curw) and curw[ci] <= a0:
            ci += 1
        a1 = curw[ci] if ci < len(curw) else w
        if b2 < a1:
            outbits.append("0001")  # pass
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:
            outbits.append(
                {0: "1", 1: "011", 2: "000011", 3: "0000011",
                 -1: "010", -2: "000010", -3: "0000010"}[d]
            )
            a0 = a1
            color ^= 1
            continue
        # horizontal: runs a0..a1 (current color), a1..a2 (opposite)
        a2 = curw[ci + 1] if ci + 1 < len(curw) else w
        start = max(a0, 0)
        outbits.append("001")
        _emit_run(outbits, a1 - start, bool(color))
        _emit_run(outbits, a2 - a1, not bool(color))
        a0 = a2


def encode_g4(ink: np.ndarray, with_eofb: bool = True) -> bytes:
    """Boolean ink array (True = black) -> T.6 bytes (the twin)."""
    if ink.ndim != 2:
        raise ImageFormatError("encode_g4 wants a 2-D boolean array")
    h, w = ink.shape
    outbits: list[str] = []
    ref = [w, w]
    for row in range(h):
        cur = _changes(ink[row])
        _encode_2d_line(outbits, cur, ref, w)
        ref = cur + [w, w]
    if with_eofb:
        outbits.append("000000000001" * 2)
    s = "".join(outbits)
    pad = (-len(s)) % 8
    s += "0" * pad
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def decode_g3_mixed(
    data: bytes, width: int, height: int, byte_align: bool = False
) -> np.ndarray:
    """CCITT Group 3 two-dimensional / mixed mode (T.4 \u00a72.2.4, PDF
    ``/K > 0``) bytes -> boolean ink: every line is preceded by an EOL
    (000000000001) plus a tag bit — 1 means the line is one-dimensional
    (MH runs), 0 means two-dimensional (the T.6 line machinery against
    the previous line).  Fill zeros before an EOL are absorbed by the
    zero-run scan; RTC / stream end stops decoding early (remaining
    rows stay white, matching the G4 decoder's tolerance).  A stream
    that starts without an EOL treats its first line as 1-D, which T.4
    requires of the first line anyway."""
    if width <= 0 or height <= 0:
        raise ImageFormatError("bad CCITT geometry")
    bits = _Bits(data)
    out = np.zeros((height, width), bool)
    ref = [width, width]
    for row in range(height):
        if byte_align and bits.pos % 8:
            bits.pos += 8 - bits.pos % 8
        if bits.pos >= bits.n:
            break
        # consume fill + EOL, then the 1-D/2-D tag bit
        one_d = True
        z = bits.peek_zero_run()
        if z >= 11:
            # skip_to_one, not the capped peek: fill is unbounded in
            # T.4, so walk to the EOL's actual terminating 1 (ADVICE r4)
            bits.skip_to_one()
            if bits.pos + 2 > bits.n:
                break  # trailing fill / RTC tail
            bits.pos += 1  # the EOL's terminating 1
            one_d = bool(bits.bit())
        elif row > 0:
            raise ImageFormatError("mixed G3 line missing its EOL")
        if one_d:
            changes: list[int] = []
            pos = 0
            white = True
            while pos < width:
                run = _read_run(bits, _WHITE_TREE if white else _BLACK_TREE)
                if pos + run > width:
                    raise ImageFormatError("CCITT G3 run overflows the line")
                pos += run
                changes.append(pos)
                white = not white
        else:
            changes = _decode_2d_line(bits, ref, width)
        _paint_row(changes, out[row])
        ref = changes + [width, width]
    return out


def encode_g3_mixed(
    ink: np.ndarray, k: int = 2, byte_align: bool = False, with_rtc: bool = True
) -> bytes:
    """Boolean ink -> T.4 mixed-mode bytes (the twin): one 1-D line at
    the top of every ``k``-line group (tag 1), 2-D lines in between
    (tag 0) — the standard-fax K-factor layout.  ``byte_align`` pads
    with fill zeros so each EOL ends on a byte boundary (PDF
    ``/EncodedByteAlign``)."""
    if ink.ndim != 2:
        raise ImageFormatError("encode_g3_mixed wants a 2-D boolean array")
    if k < 1:
        raise ImageFormatError("mixed G3 needs k >= 1")
    h, w = ink.shape
    outbits: list[str] = []
    ref = [w, w]
    for row in range(h):
        one_d = (row % k) == 0
        if byte_align:
            n = sum(len(s) for s in outbits)
            # fill so EOL+tag's final two bits land byte-aligned: pad to
            # n + fill + 12 + 1 \u2261 0 (mod 8) — PDF aligns the LINE start
            # (after the tag) in practice; simplest spec-valid choice is
            # aligning the EOL start, which the zero-run scan absorbs
            if n % 8:
                outbits.append("0" * (8 - n % 8))
        outbits.append("000000000001")
        outbits.append("1" if one_d else "0")
        cur = _changes(ink[row])
        if one_d:
            pos = 0
            black = False
            for c in cur + ([w] if (not cur or cur[-1] != w) else []):
                _emit_run(outbits, c - pos, black)
                pos = c
                black = not black
            if pos < w:
                _emit_run(outbits, w - pos, black)
        else:
            _encode_2d_line(outbits, cur, ref, w)
        ref = cur + [w, w]
    if with_rtc:
        outbits.append("000000000001" * 6)
    s = "".join(outbits)
    pad = (-len(s)) % 8
    s += "0" * pad
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))
