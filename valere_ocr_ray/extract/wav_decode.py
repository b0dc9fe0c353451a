"""Dependency-free WAV (RIFF PCM) decode — the audio modality's REAL
kernel (the container ships no audio libraries, but RIFF/PCM16 is a
pure struct+numpy parse, like BMP/PPM for images in
``image_decode.py``).  Anything non-PCM (compressed codecs) still
routes to the stub seam.

Reference parity: the reference never touches audio; this belongs to
the multimodal plumbing the engine adds (SURVEY.md §2 multimodal row).
"""

from __future__ import annotations

import struct

import numpy as np


class WavFormatError(ValueError):
    pass


def sniff_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (mono float32 samples in [-1, 1], sample_rate).
    Multi-channel input is mean-mixed to mono.  Raises
    :class:`WavFormatError` on anything that is not PCM16."""
    if not sniff_wav(payload):
        raise WavFormatError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavFormatError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_fmt != 1 or bits != 16 or channels < 1:
        raise WavFormatError(
            f"unsupported wav: fmt={audio_fmt} bits={bits} ch={channels}"
        )
    raw = np.frombuffer(data[: (len(data) // (2 * channels)) * 2 * channels],
                        dtype="<i2")
    samples = raw.astype(np.float32).reshape(-1, channels).mean(axis=1)
    return samples / 32768.0, int(rate)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Mono float32 [-1, 1] → RIFF PCM16 bytes (for synthetic corpora
    and round-trip tests)."""
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audio_feature(samples: np.ndarray, rate: int, dim: int = 32) -> np.ndarray:
    """Deterministic audio feature: [duration_s, rms, zero-crossing
    rate, peak] + a (dim-4)-bin mean-abs envelope — all numpy, no
    model."""
    n = max(len(samples), 1)
    head = np.array(
        [
            len(samples) / max(rate, 1),
            float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
            float(np.mean(np.abs(np.diff(np.signbit(samples))))) if len(samples) > 1 else 0.0,
            float(np.max(np.abs(samples))) if len(samples) else 0.0,
        ],
        dtype=np.float32,
    )
    bins = dim - 4
    idx = np.linspace(0, n, bins + 1).astype(int)
    env = np.array(
        [
            float(np.mean(np.abs(samples[a:b]))) if b > a else 0.0
            for a, b in zip(idx[:-1], idx[1:])
        ],
        dtype=np.float32,
    )
    return np.concatenate([head, env])
