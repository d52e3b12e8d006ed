"""Multimodal column stages — opaque ``binary`` payloads with typed
metadata.

Image/audio/video codecs are NOT available in this environment, so the
decode kernels are STUBBED: ``mode="strict"`` raises NotImplementedError
(the honest production placeholder); ``mode="fake"`` produces
deterministic md5-derived pseudo-features so the Ray-side plumbing —
schema, actor-pool signature, batch sizing, output layout — is real and
tested end-to-end.

Scale notes baked into the design: payload rows are MB-scale, so these
stages are meant to run with SMALL ``batch_size`` (default 32) and
``batch_format="pyarrow"`` (binary columns do not round-trip pandas
cleanly); the payload column is dropped from the output immediately
(project early).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DEFAULT_BATCH_SIZE = 32  # MB-scale payload rows → small batches


def _pseudo_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature vector: md5-seeded uniform floats."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    return np.random.default_rng(seed).random(dim)


class DecodeImageStage:
    """(id, payload:binary) → (id, width, height, features:list<float>).

    Real decode (PIL/opencv) is unavailable: ``strict`` raises, ``fake``
    emits md5-derived deterministic metadata/features.
    """

    def __init__(self, mode: str = "strict", feature_dim: int = 8,
                 id_col: str = "doc_id", payload_col: str = "payload"):
        if mode not in ("strict", "fake"):
            raise ValueError(mode)
        self.mode = mode
        self.dim = feature_dim
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError(
                "image decode requires an image codec (PIL/opencv) — not "
                "available in this environment; use mode='fake' for plumbing"
            )
        payloads = batch[self.payload_col].to_pylist()
        digests = [hashlib.md5(p or b"").digest() for p in payloads]
        width = [1 + d[0] for d in digests]
        height = [1 + d[1] for d in digests]
        feats = [_pseudo_features(p or b"", self.dim).tolist() for p in payloads]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class AudioFeatureStage:
    """(id, payload:binary) → (id, duration_ms, n_frames, features)."""

    def __init__(self, mode: str = "strict", frame_ms: int = 25,
                 id_col: str = "doc_id", payload_col: str = "payload"):
        if mode not in ("strict", "fake"):
            raise ValueError(mode)
        self.mode = mode
        self.frame_ms = frame_ms
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError(
                "audio decode requires an audio codec — not available; "
                "use mode='fake' for plumbing"
            )
        payloads = batch[self.payload_col].to_pylist()
        dur = [len(p or b"") for p in payloads]  # fake: 1 byte ≙ 1 ms
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "duration_ms": pa.array(dur, pa.int64()),
                "n_frames": pa.array(
                    [max(1, d // self.frame_ms) for d in dur], pa.int64()
                ),
                "features": pa.array(
                    [_pseudo_features(p or b"", 4).tolist() for p in payloads],
                    pa.list_(pa.float64()),
                ),
            }
        )


def binary_meta_batch(batch: pa.Table, id_col: str = "doc_id",
                      payload_col: str = "payload") -> pa.Table:
    """Codec-free metadata over an opaque binary column:
    (id, n_bytes, payload_md5). Mirrorable in SQL (octet_length / md5)."""
    payloads = batch[payload_col].to_pylist()
    return pa.table(
        {
            id_col: batch[id_col],
            "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            "payload_md5": pa.array(
                [hashlib.md5(p or b"").hexdigest() for p in payloads], pa.string()
            ),
        }
    )
