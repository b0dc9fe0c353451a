"""Dependency-free FLAC codec — the audio modality's lossless-container
kernel (the container ships no audio libraries; like the image codecs,
the format is implemented in full from the public spec, RFC 9639 /
xiph.org format doc).

Decode scope (the subset every real FLAC encoder emits):

* STREAMINFO metadata (rate / channels / bits / total samples / MD5)
  and skip-over of all other metadata blocks;
* frame headers: both blocking strategies, all block-size / sample-rate
  / sample-size codes (incl. the end-of-header 8/16-bit forms), the
  UTF-8-coded frame/sample number, and the CRC-8 header check;
* all four subframe types — CONSTANT, VERBATIM, FIXED (orders 0-4,
  reconstructed as repeated ``np.cumsum``), LPC (orders 1-32,
  quantized coefficients + shift) — plus wasted-bits unpacking;
* Rice / Rice2 residual coding with partition orders and the n-bit
  verbatim escape;
* stereo decorrelation: independent, left/side, right/side, mid/side
  (side channels carry the spec's extra bit);
* frame CRC-16 check, and the STREAMINFO MD5 over the decoded PCM as
  the whole-stream integrity pin.

``encode_flac`` is the test/synth twin: fixed-blocksize frames, fixed
predictors (order 0-2 picked per channel by residual magnitude), Rice
partition order 0, correct CRC-8/CRC-16/MD5 — a spec-valid encoder so
round-trips and fixtures need no native library (none exists in this
container; the image codecs' libwebp/libtiff-style cross-pin is
unavailable for audio, so the pinning here is roundtrip + MD5 +
hand-built streams for the paths the twin's default mode skips:
left/side stereo and LPC subframes).

Reference parity: the reference never touches audio; this belongs to
the multimodal plumbing the engine adds (SURVEY.md §2 multimodal row).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacFormatError(ValueError):
    pass


def sniff_flac(payload: bytes) -> bool:
    return len(payload) >= 4 and payload[:4] == b"fLaC"


# ---------------------------------------------------------------- CRCs

def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if (c & top) else (c << 1)
        tab[i] = c & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TAB[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ int(_CRC16_TAB[(c >> 8) ^ b])
    return c


# ---------------------------------------------------------------- bits

class _Bits:
    """MSB-first bit reader with byte-position access (frame CRCs are
    computed over whole bytes, so the reader tracks byte offsets)."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def read(self, k: int) -> int:
        p = self.pos
        if p + k > self.n:
            raise FlacFormatError("FLAC stream exhausted mid-field")
        v = 0
        data = self.data
        # peel to byte alignment, then whole bytes, then the tail
        while k:
            byte = data[p >> 3]
            off = p & 7
            take = min(8 - off, k)
            v = (v << take) | ((byte >> (8 - off - take)) & ((1 << take) - 1))
            p += take
            k -= take
        self.pos = p
        return v

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v & (1 << (k - 1)) else v

    def read_unary(self) -> int:
        """Count 0 bits until the terminating 1."""
        q = 0
        data = self.data
        p = self.pos
        n = self.n
        while True:
            if p >= n:
                raise FlacFormatError("FLAC stream exhausted in unary code")
            byte = data[p >> 3]
            off = p & 7
            rest = byte & ((1 << (8 - off)) - 1)
            if rest == 0:
                q += 8 - off
                p += 8 - off
                continue
            lead = (8 - off) - rest.bit_length()
            q += lead
            p += lead + 1
            self.pos = p
            return q

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_utf8_number(bits: _Bits) -> int:
    """The frame header's UTF-8-style extended number (up to 36 bits /
    7 bytes)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n < 1 or n > 6:
        raise FlacFormatError("bad UTF-8 frame number")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise FlacFormatError("bad UTF-8 continuation in frame number")
        v = (v << 6) | (c & 0x3F)
    return v


_BLOCK_SIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                     8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                     13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                      6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                      11: 96000}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFFS = {  # order -> prediction coefficients on prior samples
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------- decode

def _decode_residual(bits: _Bits, block_size: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise FlacFormatError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = bits.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise FlacFormatError("partition order does not divide block size")
    out = np.empty(block_size - order, dtype=np.int64)
    w = 0
    for p in range(n_parts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        if n < 0:
            raise FlacFormatError("residual partition smaller than order")
        k = bits.read(pbits)
        if k == escape:
            nb = bits.read(5)
            for i in range(n):
                out[w + i] = bits.read_signed(nb) if nb else 0
        else:
            for i in range(n):
                q = bits.read_unary()
                u = (q << k) | bits.read(k) if k else q
                out[w + i] = (u >> 1) ^ -(u & 1)  # zigzag
        w += n
    return out


def _reconstruct_fixed(order: int, warm: list[int], res: np.ndarray) -> np.ndarray:
    """Fixed predictor of order k == k-fold integer cumsum over the
    residual with the warmup's k-th differences as seeds (vectorized —
    no per-sample Python for the common subframe type)."""
    warm_arr = np.asarray(warm, dtype=np.int64)
    arr = np.asarray(res, dtype=np.int64)
    # level j's first element is the j-th finite difference of x at
    # position j, computable from the warmup alone; integrating once
    # per level walks D^k back down to x
    for j in range(order - 1, -1, -1):
        seed = np.diff(warm_arr, n=j)[0] if j else warm_arr[0]
        arr = np.cumsum(np.concatenate([[seed], arr]))
    return arr


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise FlacFormatError("subframe padding bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise FlacFormatError("wasted bits exceed sample size")
    if t == 0:  # CONSTANT
        v = bits.read_signed(eff)
        out = np.full(block_size, v, dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array(
            [bits.read_signed(eff) for _ in range(block_size)], dtype=np.int64
        )
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        res = _decode_residual(bits, block_size, order)
        out = _reconstruct_fixed(order, warm, res)
    elif t >= 32:  # LPC
        order = t - 31
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise FlacFormatError("invalid LPC precision code")
        shift = bits.read_signed(5)
        if shift < 0:
            raise FlacFormatError("negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _decode_residual(bits, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        buf = out.tolist()  # python ints: LPC loop is sequential
        for i in range(order, block_size):
            acc = 0
            for j in range(order):
                acc += coefs[j] * buf[i - 1 - j]
            buf[i] = int(res[i - order]) + (acc >> shift)
        out = np.array(buf, dtype=np.int64)
    else:
        raise FlacFormatError(f"reserved subframe type {t}")
    if wasted:
        out = out << wasted
    return out


def decode_flac_pcm(payload: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes → (samples int32 array (n, channels), sample_rate,
    bits_per_sample).  Verifies every frame's CRC-8/CRC-16 and, when
    STREAMINFO carries one, the stream MD5 over the decoded PCM."""
    if not sniff_flac(payload):
        raise FlacFormatError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise FlacFormatError("truncated FLAC metadata")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:
            if length != 34:
                raise FlacFormatError("bad STREAMINFO length")
            bi = _Bits(body)
            bi.read(16)  # min block size
            bi.read(16)  # max block size
            bi.read(24)
            bi.read(24)  # min/max frame size
            rate = bi.read(20)
            channels = bi.read(3) + 1
            bps = bi.read(5) + 1
            total = bi.read(36)
            md5 = body[18:34]
            info = (rate, channels, bps, total, md5)
        pos += 4 + length
        if last:
            break
    if info is None:
        raise FlacFormatError("missing STREAMINFO")
    rate, channels, bps, total, md5 = info
    if rate == 0:
        raise FlacFormatError("STREAMINFO sample rate 0")

    bits = _Bits(payload)
    bits.pos = pos * 8
    chans: list[np.ndarray] = []
    out_blocks: list[np.ndarray] = []
    n_done = 0
    while bits.pos + 16 <= bits.n and (total == 0 or n_done < total):
        frame_start = bits.pos >> 3
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise FlacFormatError("lost FLAC frame sync")
        if bits.read(1):
            raise FlacFormatError("frame reserved bit set")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise FlacFormatError("frame header reserved bit set")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise FlacFormatError("reserved block size code")
        elif bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_CODES[bs_code]
        if sr_code == 0:
            pass
        elif sr_code in _SAMPLE_RATE_CODES:
            pass
        elif sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        else:
            raise FlacFormatError("invalid sample rate code")
        if ss_code == 0:
            f_bps = bps
        elif ss_code in _SAMPLE_SIZE_CODES:
            f_bps = _SAMPLE_SIZE_CODES[ss_code]
        else:
            raise FlacFormatError("reserved sample size code")
        crc8_end = bits.pos >> 3
        want = bits.read(8)
        if _crc8(payload[frame_start:crc8_end]) != want:
            raise FlacFormatError("frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise FlacFormatError("frame/STREAMINFO channel mismatch")
            sub = [
                _decode_subframe(bits, block_size, f_bps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise FlacFormatError("stereo decorrelation on non-stereo stream")
            # side channel gets one extra bit
            if ch_code == 8:  # left/side
                left = _decode_subframe(bits, block_size, f_bps)
                side = _decode_subframe(bits, block_size, f_bps + 1)
                sub = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(bits, block_size, f_bps + 1)
                right = _decode_subframe(bits, block_size, f_bps)
                sub = [right + side, right]
            else:  # mid/side
                mid = _decode_subframe(bits, block_size, f_bps)
                side = _decode_subframe(bits, block_size, f_bps + 1)
                l = ((mid << 1) | (side & 1)) + side
                sub = [l >> 1, (l - (side << 1)) >> 1]
        else:
            raise FlacFormatError("reserved channel assignment")
        bits.align_byte()
        crc16_end = bits.pos >> 3
        want16 = bits.read(16)
        if _crc16(payload[frame_start:crc16_end]) != want16:
            raise FlacFormatError("frame CRC-16 mismatch")
        out_blocks.append(np.stack(sub, axis=1))
        n_done += block_size

    if not out_blocks:
        raise FlacFormatError("FLAC stream has no frames")
    pcm = np.concatenate(out_blocks, axis=0)
    if total:
        pcm = pcm[:total]
    if md5 != b"\x00" * 16:
        if _pcm_md5(pcm, bps) != md5:
            raise FlacFormatError("stream MD5 mismatch")
    return pcm.astype(np.int32), rate, bps


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (mono float32 samples in [-1, 1], sample_rate) —
    the same surface :func:`wav_decode.decode_wav` exposes, so the
    multimodal audio stage treats both containers alike."""
    pcm, rate, bps = decode_flac_pcm(payload)
    mono = pcm.astype(np.float64).mean(axis=1)
    return (mono / float(1 << (bps - 1))).astype(np.float32), rate


def _pcm_md5(pcm: np.ndarray, bps: int) -> bytes:
    """STREAMINFO MD5: interleaved samples, little-endian, bps/8 bytes
    (bps is byte-aligned for every stream the twin emits)."""
    if bps % 8:
        raise FlacFormatError("MD5 over non-byte-aligned sample size")
    nb = bps // 8
    flat = pcm.astype(np.int64).reshape(-1)
    arr = flat.astype("<i8").view(np.uint8).reshape(-1, 8)[:, :nb]
    return hashlib.md5(arr.tobytes()).digest()


# ---------------------------------------------------------------- encode

class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.nbits += k
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _write_utf8_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    payload_bits = []
    while True:
        payload_bits.append(v & 0x3F)
        v >>= 6
        n = len(payload_bits)
        if v < (1 << (6 - n)) and n <= 6:
            break
    n = len(payload_bits)
    w.write(((0xFF << (7 - n)) & 0xFF) | v, 8)
    for p in reversed(payload_bits):
        w.write(0x80 | p, 8)


def _rice_k(res: np.ndarray) -> int:
    if not len(res):
        return 0
    mean = float(np.abs(res).mean())
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    return k


def _write_residual(w: _BitWriter, res: np.ndarray, *, escape_bits: int = 0) -> None:
    w.write(0, 2)  # Rice, 4-bit params
    w.write(0, 4)  # partition order 0
    if escape_bits:
        # the n-bit verbatim escape (param 0b1111) — decoder-path twin
        w.write(0xF, 4)
        w.write(escape_bits, 5)
        for r in res:
            w.write(int(r) & ((1 << escape_bits) - 1), escape_bits)
        return
    k = _rice_k(res)
    w.write(k, 4)
    for r in res:
        u = (int(r) << 1) ^ (int(r) >> 63)  # zigzag (int64 arithmetic shift)
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)


def _write_subframe_fixed(
    w: _BitWriter, x: np.ndarray, bps: int, *, as_lpc: bool = False,
    escape: bool = False, wasted: int = 0
) -> None:
    if wasted:
        if len(x) and int(np.bitwise_or.reduce(x)) & ((1 << wasted) - 1):
            raise FlacFormatError("wasted bits on non-divisible samples")
        x = x >> wasted
        bps -= wasted
    # pick fixed order 0-2 by absolute residual mass
    best, best_cost = 0, None
    for order in (0, 1, 2):
        if len(x) <= order:
            continue
        d = x.copy()
        for _ in range(order):
            d = np.diff(d)
        cost = int(np.abs(d).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    order = best
    d = x.copy()
    for _ in range(order):
        d = np.diff(d)
    res = d
    # escape width sized from the ACTUAL residual range, not bps+1: an
    # order-2 fixed-predictor residual can need up to bps+2 bits, and a
    # too-narrow width would silently wrap under the write mask
    # (ADVICE r4).  Two's-complement bits for r = bitlen(r>=0 ? r : -r-1)+1.
    escape_bits = 0
    if escape:
        mag = np.where(res >= 0, res, -res - 1) if len(res) else res
        need = (int(mag.max()) if len(mag) else 0).bit_length() + 1
        escape_bits = max(min(bps + 1, 31), need)
        if escape_bits > 31:
            raise FlacFormatError(
                f"residual needs {escape_bits} bits, escape caps at 31"
            )
    if not as_lpc or order == 0:
        w.write(0, 1)
        w.write(8 + order, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)
        for v in x[:order]:
            w.write(int(v), bps)
        _write_residual(w, res, escape_bits=escape_bits)
        return
    # LPC-disguised twin (tests the LPC decode machinery): the fixed
    # predictor's integer coefficients, doubled, with shift 1
    coefs = [c * 2 for c in _FIXED_COEFFS[order]]
    prec = max(abs(c) for c in coefs).bit_length() + 2
    w.write(0, 1)
    w.write(32 + order - 1, 6)
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write(0, 1)
    for v in x[:order]:
        w.write(int(v), bps)
    w.write(prec - 1, 4)
    w.write(1, 5)  # shift 1
    for c in coefs:
        w.write(c & ((1 << prec) - 1), prec)
    _write_residual(w, res, escape_bits=escape_bits)


def encode_flac(
    pcm: np.ndarray,
    rate: int,
    *,
    bps: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    as_lpc: bool = False,
    escape: bool = False,
    wasted: int = 0,
) -> bytes:
    """PCM int array (n,) or (n, channels) → FLAC bytes (the twin).
    ``stereo_mode``: ``independent``, ``left_side``, ``right_side`` or
    ``mid_side`` (2-channel only — the decorrelated modes exercise the
    decoder's side-channel extra-bit path).  ``as_lpc`` emits fixed
    predictors disguised as LPC subframes (doubled coefficients, shift
    1) to drive the LPC decode loop; ``escape`` forces the n-bit
    verbatim residual escape; ``wasted`` shifts out that many known-zero
    low bits per sample (samples must be divisible)."""
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, channels = pcm.shape
    if n == 0:
        raise FlacFormatError("encode_flac: empty signal")
    lim = 1 << (bps - 1)
    if pcm.min() < -lim or pcm.max() >= lim:
        raise FlacFormatError("encode_flac: samples exceed bps range")
    if stereo_mode not in ("independent", "left_side", "right_side", "mid_side"):
        raise FlacFormatError(f"unknown stereo_mode {stereo_mode!r}")
    if stereo_mode != "independent" and channels != 2:
        raise FlacFormatError(f"{stereo_mode} needs exactly 2 channels")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + _pcm_md5(pcm, bps)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    bs_code = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
               1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14,
               32768: 15}.get(block_size)
    sr_code = {v: k for k, v in _SAMPLE_RATE_CODES.items()}.get(rate, 0)
    ss_code = {v: k for k, v in _SAMPLE_SIZE_CODES.items()}[bps]

    for fi, start in enumerate(range(0, n, block_size)):
        blk = pcm[start : start + block_size]
        bsz = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(bs_code if (bs_code and bsz == block_size) else 7, 4)
        w.write(sr_code, 4)
        ch_code = {"independent": channels - 1, "left_side": 8,
                   "right_side": 9, "mid_side": 10}[stereo_mode]
        w.write(ch_code, 4)
        w.write(ss_code, 3)
        w.write(0, 1)
        _write_utf8_number(w, fi)
        if not (bs_code and bsz == block_size):
            w.write(bsz - 1, 16)
        w.align()
        hdr = w.bytes()
        w2 = _BitWriter()
        for b in hdr:
            w2.write(b, 8)
        w2.write(_crc8(hdr), 8)
        opts = dict(as_lpc=as_lpc, escape=escape, wasted=wasted)
        if stereo_mode == "left_side":
            side = blk[:, 0] - blk[:, 1]
            _write_subframe_fixed(w2, blk[:, 0], bps, **opts)
            _write_subframe_fixed(w2, side, bps + 1, **opts)
        elif stereo_mode == "right_side":
            side = blk[:, 0] - blk[:, 1]
            _write_subframe_fixed(w2, side, bps + 1, **opts)
            _write_subframe_fixed(w2, blk[:, 1], bps, **opts)
        elif stereo_mode == "mid_side":
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            side = blk[:, 0] - blk[:, 1]
            _write_subframe_fixed(w2, mid, bps, **opts)
            _write_subframe_fixed(w2, side, bps + 1, **opts)
        else:
            for c in range(channels):
                _write_subframe_fixed(w2, blk[:, c], bps, **opts)
        w2.align()
        frame = w2.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


__all__ = [
    "FlacFormatError",
    "decode_flac",
    "decode_flac_pcm",
    "encode_flac",
    "sniff_flac",
]
