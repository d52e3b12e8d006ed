"""Per-partition index manifests — lineage + metrics + resumability.

The reference's resume mechanism is ``os.path.exists(pickle)`` at every
stage (cosine_similarity_bm25_reranking.py:288-331 and everywhere). Here a
build partition (one language shard) is resumable iff its ``manifest.json``
is COMMITTED, which happens atomically (write temp file → ``os.replace``)
only after the partition's Parquet outputs are fully written. A restarted
build skips committed partitions (pipelines/build_index.py), so a kill
mid-build never leaves a half-trusted shard.

Manifest fields: schema version, partition key, input fingerprint
(path + row count), metrics (docs / terms / postings), stats (N, avgdl),
and the build config — the lineage the north rule requires.
"""

from __future__ import annotations

import json
import os
import tempfile

SCHEMA_VERSION = 1
MANIFEST_NAME = "manifest.json"


def manifest_path(shard_dir: str) -> str:
    return os.path.join(shard_dir, MANIFEST_NAME)


def write_manifest(shard_dir: str, payload: dict) -> str:
    """Atomically commit a manifest (temp file + rename)."""
    os.makedirs(shard_dir, exist_ok=True)
    payload = dict(payload)
    payload["schema_version"] = SCHEMA_VERSION
    payload["committed"] = True
    fd, tmp = tempfile.mkstemp(dir=shard_dir, suffix=".manifest.tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())  # data durable BEFORE the rename commits
        os.replace(tmp, manifest_path(shard_dir))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return manifest_path(shard_dir)


def read_manifest(shard_dir: str):
    p = manifest_path(shard_dir)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            m = json.load(f)
    except (json.JSONDecodeError, ValueError, OSError):
        # a truncated/corrupt manifest (e.g. power loss by a writer that
        # didn't fsync) means NOT COMMITTED — rebuild, don't crash resume
        return None
    if not m.get("committed") or m.get("schema_version") != SCHEMA_VERSION:
        return None
    return m


def is_committed(shard_dir: str, input_fingerprint=None) -> bool:
    m = read_manifest(shard_dir)
    if m is None:
        return False
    if input_fingerprint is not None and m.get("input_fingerprint") != input_fingerprint:
        return False
    return True
