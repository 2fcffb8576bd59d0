"""Multimodal column plumbing (image/audio/video as opaque binary + typed
metadata).

The image/audio codec libraries are NOT in this container, so the decode
kernels are STUBS — `DecodeImageStage(decoder="real")` raises
NotImplementedError with the dependency named, while
`decoder="deterministic-fake"` parses only what raw bytes allow (length,
leading magic) and emits a deterministic feature vector.  Everything
Ray-side — schema, actor-pool signature, batch sizing for large payloads,
output layout — is real and tested, so swapping in a real codec is a
one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # 'image' | 'audio' | 'video'
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoded-feature vector: bytes of
    sha256(payload) expanded to `dim` floats in [0, 1)."""
    h = hashlib.sha256(payload).digest()
    reps = (dim * 4) // len(h) + 1
    raw = (h * reps)[: dim * 4]
    return (np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
            % 1000) / 1000.0


class DecodeImageStage:
    """Actor-pool stage: payload bytes -> feature vector + basic header
    metadata.  Large binary payloads => SMALL batch_size (callers should
    pass batch_size<=256 for multi-MB images so batch x concurrency fits
    worker heap)."""

    def __init__(self, decoder: str = "deterministic-fake", feature_dim: int = 64):
        if decoder not in ("deterministic-fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        if decoder == "real":
            raise NotImplementedError(
                "real image decode requires Pillow/opencv, not present in "
                "this container — use decoder='deterministic-fake' for "
                "pipeline plumbing tests"
            )
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([
            _fake_features(p or b"", self.feature_dim) for p in payloads
        ]) if payloads else np.empty((0, self.feature_dim))
        magics = [
            ("png" if (p or b"")[:4] == b"\x89PNG" else
             "jpg" if (p or b"")[:2] == b"\xff\xd8" else "unknown")
            for p in payloads
        ]
        return pa.table({
            "media_id": batch["media_id"],
            "detected_format": pa.array(magics, type=pa.string()),
            "payload_bytes": pa.array([len(p or b"") for p in payloads],
                                      type=pa.int64()),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), type=pa.float32()),
                self.feature_dim),
        })


class FrameSampleStage:
    """Video frame-sampling stub: emits one row per sampled frame index
    (the fan-out layout a real decoder would produce)."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, ts = [], [], []
        for mid, dur in zip(batch["media_id"].to_pylist(),
                            batch["duration_ms"].to_pylist()):
            d = dur or 0
            for k, t in enumerate(range(0, max(d, 1), self.every_ms)):
                ids.append(mid)
                frames.append(k)
                ts.append(t)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(frames, pa.int32()),
            "ts_ms": pa.array(ts, pa.int32()),
        })


def decode_images(ds, feature_dim: int = 64, batch_size: int = 256,
                  concurrency=None):
    from ..validate import _cluster_cpus

    return ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs=dict(feature_dim=feature_dim),
        batch_format="pyarrow",
        batch_size=batch_size,   # small: payloads are large binaries
        concurrency=concurrency if concurrency is not None else (1, _cluster_cpus()),
    )


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(["image", "audio", "video"], n)
    payloads = []
    for i, k in enumerate(kinds):
        body = rng.integers(0, 256, int(rng.integers(64, 2048)),
                            dtype=np.uint8).tobytes()
        head = b"\x89PNG" if k == "image" and i % 2 == 0 else \
               b"\xff\xd8" if k == "image" else b"RIFF"
        payloads.append(head + body)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(kinds.tolist(), pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(["application/octet-stream"] * n),
        "width": pa.array([None] * n, pa.int32()),
        "height": pa.array([None] * n, pa.int32()),
        "duration_ms": pa.array(
            [int(x) if k == "video" else None
             for x, k in zip(rng.integers(1000, 10_000, n), kinds)],
            pa.int32()),
    })
