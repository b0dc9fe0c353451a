"""Dependency-free GIF decoder (GIF87a/GIF89a) + encoder twin.

Closes the GIF leg of the raster seam (VERDICT r3 "What's missing"
#2): web corpora carry GIF scans/screenshots, and the reference's
upload filter admits generic images (``IDD/finalcodes/
InsuranceCard1.py:83-84``).  Scope — the still-image web subset:

* global or local color table, 8-bit max (any palette size 2..256);
* GIF-variant LZW: LSB-first bit packing inside 255-byte sub-blocks,
  initial code width from the per-image "minimum code size" byte,
  width grows at table size 2**w (NO early change — that's TIFF's
  quirk, ``extract/tiff.py``), Clear resets, EOI ends;
* interlaced images (the 8/8/4/2 four-pass row shuffle);
* frame 1 only: extensions (GCE/comment/application) are skipped by
  their sub-block structure, and decoding stops at the first image
  descriptor — animation frame-SAMPLING beyond frame 1 stays behind
  the multimodal seam with the video formats.

``encode_gif`` is the test/synth twin (GIF89a, global table padded to
a power of two, single frame, non-interlaced); round-trip is exact
for any ≤256-color image.
"""

from __future__ import annotations

import struct

import numpy as np

from valere_ocr_ray.extract.image_decode import ImageFormatError


def sniff_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------- LZW


def gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF LZW (LSB-first): indexes out, codes 2**mcs+2 .. 4095."""
    if not 2 <= min_code_size <= 11:
        raise ImageFormatError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # missing EOI: tolerate truncation
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= clear:
                raise ImageFormatError("GIF LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ImageFormatError("GIF LZW: code beyond table")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # standard LZW (no early change): widen when the table
            # FILLS the current code space
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`gif_lzw_decode` (emits Clear first, resets on
    table-full, EOI last)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # encoder widens ONE ENTRY AFTER the decoder builds the
            # same entry: the decoder lags one add, so both read/write
            # the next code at the same width
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full → reset
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- decode


def _read_color_table(payload: bytes, pos: int, n_colors: int) -> np.ndarray:
    end = pos + 3 * n_colors
    if end > len(payload):
        raise ImageFormatError("truncated GIF color table")
    return np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(n_colors, 3)


def _skip_subblocks(payload: bytes, pos: int) -> int:
    n = len(payload)
    while pos < n:
        size = payload[pos]
        pos += 1
        if size == 0:
            return pos
        pos += size
    raise ImageFormatError("truncated GIF sub-blocks")


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _iter_frames(payload: bytes):
    """Yield ``(x, y, idx_array, palette, gce)`` per image descriptor;
    ``gce`` is ``(disposal, transparent_index | None)`` from the
    preceding Graphic Control Extension (0, None when absent)."""
    if not sniff_gif(payload):
        raise ImageFormatError("not a GIF")
    if len(payload) < 13:
        raise ImageFormatError("truncated GIF header")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n_colors = 2 << (flags & 0x07)
        gct = _read_color_table(payload, pos, n_colors)
        pos += 3 * n_colors
    yield (sw, sh, gct, bg)  # header tuple first
    n = len(payload)
    gce: tuple[int, int | None] = (0, None)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= n:
                raise ImageFormatError("truncated GIF extension")
            label = payload[pos]
            if label == 0xF9 and pos + 6 <= n:  # Graphic Control Ext
                packed = payload[pos + 2]
                tidx = payload[pos + 5] if packed & 1 else None
                gce = ((packed >> 2) & 0x7, tidx)
            pos = _skip_subblocks(payload, pos + 1)
        elif block == 0x2C:  # image descriptor
            if pos + 9 > n:
                raise ImageFormatError("truncated GIF image descriptor")
            x, y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if w <= 0 or h <= 0:
                raise ImageFormatError("degenerate GIF dimensions")
            table = gct
            if iflags & 0x80:  # local color table
                n_colors = 2 << (iflags & 0x07)
                table = _read_color_table(payload, pos, n_colors)
                pos += 3 * n_colors
            if table is None:
                raise ImageFormatError("GIF image with no color table")
            if pos >= n:
                raise ImageFormatError("truncated GIF image data")
            mcs = payload[pos]
            pos += 1
            chunks = []
            while pos < n:
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                chunks.append(payload[pos : pos + size])
                pos += size
            idx_bytes = gif_lzw_decode(b"".join(chunks), mcs)
            if len(idx_bytes) < w * h:
                raise ImageFormatError("truncated GIF pixel data")
            idx = np.frombuffer(idx_bytes, dtype=np.uint8, count=w * h).reshape(
                h, w
            )
            if iflags & 0x40:  # interlaced: undo the 4-pass row order
                deinter = np.empty_like(idx)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for r in range(start, h, step):
                        deinter[r] = idx[src]
                        src += 1
                idx = deinter
            if int(idx.max(initial=0)) >= len(table):
                raise ImageFormatError("GIF palette index out of range")
            yield (x, y, idx, table, gce)
            gce = (0, None)
        elif block == 0x3B:  # trailer
            return
        else:
            raise ImageFormatError(f"unknown GIF block 0x{block:02x}")


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB of the FIRST frame."""
    it = _iter_frames(payload)
    next(it)  # header
    for x, y, idx, table, _gce in it:
        return table[idx]
    raise ImageFormatError("GIF contains no image")


def decode_gif_frames(
    payload: bytes, *, max_frames: int | None = None
) -> list[np.ndarray]:
    """Animated GIF → composed full-canvas RGB frames (the real kernel
    behind the multimodal frame-sample stage).

    Composition per GIF89a: each frame's rectangle lands at its
    (left, top) on the logical screen; transparent-index pixels leave
    the canvas unchanged; disposal 0/1 leave the region, disposal 2
    restores it to the background color, disposal 3 restores it to the
    canvas as it was BEFORE this frame was drawn (the archival
    restore-previous mode).  Disposal ≥ 4 is reserved and raises."""
    it = _iter_frames(payload)
    sw, sh, gct, bg = next(it)
    if sw <= 0 or sh <= 0:
        raise ImageFormatError("degenerate GIF logical screen")
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.tile(bg_rgb, (sh, sw, 1)).astype(np.uint8)
    frames: list[np.ndarray] = []
    for x, y, idx, table, (disposal, tidx) in it:
        if disposal >= 4:
            raise ImageFormatError(f"reserved GIF disposal {disposal}")
        h, w = idx.shape
        if y + h > sh or x + w > sw:
            raise ImageFormatError("GIF frame outside logical screen")
        region = canvas[y : y + h, x : x + w]
        prior = region.copy() if disposal == 3 else None
        rgb = table[idx]
        if tidx is not None:
            mask = idx != tidx
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore region to background
            canvas[y : y + h, x : x + w] = bg_rgb
        elif disposal == 3:  # restore region to pre-draw state
            canvas[y : y + h, x : x + w] = prior
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ImageFormatError("GIF contains no image")
    return frames


# ---------------------------------------------------------------- encode


def encode_gif(pixels: np.ndarray, *, interlace: bool = False) -> bytes:
    """RGB array (≤256 distinct colors) → single-frame GIF89a bytes."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    # palette size = power of two >= max(2, n_colors)
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_pal = 1 << bits
    palette = np.zeros((n_pal, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    mcs = max(2, bits)
    idx8 = idx.astype(np.uint8).reshape(h, w)
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        idx8 = idx8[order]
    data = gif_lzw_encode(idx8.tobytes(), mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7) | ((bits - 1) << 4), 0, 0)
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def encode_gif_frames(
    frames: list[np.ndarray], *, delay_cs: int = 10
) -> bytes:
    """Full-canvas RGB frames (shared ≤256-color palette) → animated
    GIF89a bytes (NETSCAPE loop block, GCE disposal 1 per frame) — the
    test/synth twin of :func:`decode_gif_frames`."""
    if not frames:
        raise ValueError("encode_gif_frames: no frames")
    h, w, _ = frames[0].shape
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif_frames: more than 256 distinct colors")
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_pal = 1 << bits
    palette = np.zeros((n_pal, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((bits - 1) & 7) | ((bits - 1) << 4), 0, 0
    )
    out += palette.tobytes()
    # NETSCAPE2.0 loop-forever application extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    per_frame = w * h
    for k, f in enumerate(frames):
        if f.shape != (h, w, 3):
            raise ValueError("encode_gif_frames: frames must share geometry")
        # GCE: size 4, packed 0x04 (disposal 1, no transparency),
        # delay, transparent idx 0, terminator
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x04, delay_cs, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(mcs)
        idx = inv[k * per_frame : (k + 1) * per_frame].astype(np.uint8)
        data = gif_lzw_encode(idx.tobytes(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


__all__ = [
    "decode_gif",
    "decode_gif_frames",
    "encode_gif",
    "encode_gif_frames",
    "gif_lzw_decode",
    "gif_lzw_encode",
    "sniff_gif",
]
