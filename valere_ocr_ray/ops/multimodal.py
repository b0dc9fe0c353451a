"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The decode kernels themselves are STUBBED — no image/audio libraries
ship in this container — but everything Ray-side is real and tested:
schemas, actor-pool signatures, batch sizing for large binary rows,
status routing, output layout.  Swap ``_decode_stub`` for a real
decoder (PIL / ffmpeg / torchaudio) and nothing else changes.

Batch-size guidance: binary payloads make rows wide — size
``batch_size`` so ``batch_size × mean_payload × concurrency`` fits the
worker heap (SURVEY.md §4.2 skew row), and keep these stages in
``batch_format="pyarrow"`` (binary round-trips pandas as object dtype).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 32


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic fake 'decode → feature' kernel.

    Real implementation would decode pixels/samples and run a feature
    extractor; none of those libraries exist here, so the feature is a
    seeded byte-histogram projection — deterministic, shape-stable,
    and cheap, which is what the plumbing tests need.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    hist = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)
    seed = int.from_bytes(hashlib.md5(media_type.encode()).digest()[:4], "little")
    proj = np.random.default_rng(seed).standard_normal((256, FEATURE_DIM))
    return (hist.astype(np.float32) @ proj.astype(np.float32)) / max(len(payload), 1)


class MediaFeatureExtractor:
    """Actor-pool stage: payload binary → fixed-dim feature vector.

    ``__init__`` is where a real model would load (once per actor);
    ``__call__`` handles a batch, routing per-row failures to
    ``status='error_decode'`` instead of failing the task.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM) -> None:
        self.feature_dim = feature_dim  # real impl: load model weights here

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        types = batch["media_type"].to_pylist()
        feats: list[list[float] | None] = []
        status: list[str] = []
        for i, mt in enumerate(types):
            try:
                buf = payloads[i].as_buffer().to_pybytes()
                feats.append(_decode_stub(buf, mt).tolist())
                status.append("ok")
            except NotImplementedError:
                feats.append(None)
                status.append("error_no_decoder")
            except Exception:
                feats.append(None)
                status.append("error_decode")
        out = batch.drop_columns(["payload"])  # payload bytes stop here
        return out.append_column(
            "feature", pa.array(feats, pa.list_(pa.float32()))
        ).append_column("status", pa.array(status, pa.string()))


def extract_media_features(
    ds: ray.data.Dataset, *, concurrency=(1, 4), batch_size: int = 32
) -> ray.data.Dataset:
    """Feature-extract a media table; small batches because rows are
    payload-wide (see module docstring)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample_plan(duration_ms: int, every_ms: int = 1000) -> list[int]:
    """Deterministic frame-sampling timestamps for a video payload —
    the plan half of a decode+sample stage (the decode half is the
    stubbed kernel above)."""
    if duration_ms <= 0:
        return []
    return list(range(0, duration_ms, every_ms))


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        d = hashlib.md5(f"media:{seed}:{i}".encode()).digest()
        mt = ["image", "audio", "video", "weird"][i % 4 if i % 17 == 0 else i % 3]
        payload = (d * (8 + i % 23))[: 64 + (i * 37) % 512]
        rows["media_id"].append(i)
        rows["url"].append(f"https://media{i % 11}.example/{mt}/{i:06d}")
        rows["media_type"].append(mt)
        rows["payload"].append(payload)
        rows["width"].append(0 if mt != "image" else 64 + i % 512)
        rows["height"].append(0 if mt != "image" else 64 + (i * 3) % 512)
        rows["duration_ms"].append(0 if mt == "image" else 1000 + (i * 131) % 60000)
    return pa.table(rows, schema=MEDIA_SCHEMA)
