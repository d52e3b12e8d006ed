"""Deduplication operators — training-data-pipeline extensions.

The reference has only exact-identity keying by docid (no near-dup
machinery); these operators are the dedup suite a 100 TB corpus pipeline
needs, each expressed Ray-Data-first:

- exact / normalized dedup: content-hash ``map_batches`` + one groupby —
  the hash (md5) is computed vectorized per batch; the groupby moves only
  (hash, doc_id) pairs, never text.
- MinHash + LSH: shingle → md5-minhash signature per batch → explode to
  (band_idx, band_key, doc_id) rows → ``groupby(band)`` emits candidate
  pairs → pairwise Jaccard verification. All hashes are md5-derived so a
  DuckDB oracle reproduces them EXACTLY (functions/hashing.py).
- SimHash: 64-bit signatures, banded into 4x16-bit chunks for candidate
  generation, Hamming-verified.

Scale notes: the verification stage broadcasts the candidate docs'
shingle sets via ``ray.put`` (candidates ≪ corpus); at web scale this
becomes a semi-join of the pair list against the shingle table — the
partitioning key is doc_id either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    band_keys,
    hamming64,
    md5_hex,
    minhash_signature,
    shingles,
    simhash64,
)
from ..functions.tokenizer import tokenize_simple

NUM_HASHES = 8
BAND_SIZE = 2  # → 4 bands
SHINGLE_N = 3


def add_text_hash(batch: pa.Table, text_col: str = "text", normalize: bool = False) -> pa.Table:
    """Vectorized-ish md5 content hash; ``normalize`` lowercases and
    collapses whitespace/punctuation first (the simple-token stream)."""
    texts = batch[text_col].to_pylist()
    if normalize:
        hashes = [md5_hex(" ".join(tokenize_simple(t or ""))) for t in texts]
    else:
        hashes = [md5_hex(t or "") for t in texts]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def emit_band_rows(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per doc: shingle → minhash signature → one row per LSH band."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_id, out_band, out_key = [], [], []
    for i, t in zip(ids, texts):
        toks = tokenize_simple(t or "")
        sh = shingles(toks, SHINGLE_N)
        if not sh:
            continue
        sig = minhash_signature(sh, NUM_HASHES)
        for b, key in enumerate(band_keys(sig, BAND_SIZE)):
            out_id.append(i)
            out_band.append(b)
            out_key.append(key)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "band_idx": pa.array(out_band, pa.int64()),
            "band_key": pa.array(out_key, pa.string()),
        }
    )


def band_group_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """(band) group → candidate pairs (a < b)."""
    ids = sorted(set(group["doc_id"].tolist()))
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame(
        {"a": pd.Series(a, dtype="int64"), "b": pd.Series(b, dtype="int64")}
    )


class JaccardVerify:
    """Verify candidate pairs against a broadcast {doc_id: shingle set}."""

    def __init__(self, shingle_ref, threshold: float):
        import ray

        self.shingles = ray.get(shingle_ref)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        oa, ob, oj = [], [], []
        for x, y in zip(a, b):
            sa, sb = self.shingles.get(x), self.shingles.get(y)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= self.threshold:
                oa.append(x)
                ob.append(y)
                oj.append(int(np.floor(jac * 10000 + 0.5)))
        return pa.table(
            {
                "a": pa.array(oa, pa.int64()),
                "b": pa.array(ob, pa.int64()),
                "jaccard_x": pa.array(oj, pa.int64()),
            }
        )


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    sh = [simhash64(tokenize_simple(t or "")) for t in texts]
    chunks = {f"chunk{c}": [(h >> (16 * c)) & 0xFFFF for h in sh] for c in range(4)}
    out = batch.append_column(
        "simhash", pa.array(np.array(sh, dtype=np.uint64), pa.uint64())
    )
    for c in range(4):
        out = out.append_column(f"chunk{c}", pa.array(chunks[f"chunk{c}"], pa.int64()))
    return out


def simhash_pairs(sim_df: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    """Candidate pairs sharing any 16-bit chunk, Hamming-verified.
    (Driver-side finish over the small signature table; at scale this is
    4 groupbys over (chunk_c) exactly like the LSH band path.)"""
    pairs = set()
    for c in range(4):
        for _, g in sim_df.groupby(f"chunk{c}"):
            ids = g["doc_id"].tolist()
            hs = g["simhash"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    x, y = sorted((ids[i], ids[j]))
                    if (x, y) in pairs:
                        continue
                    if hamming64(int(hs[i]), int(hs[j])) <= max_hamming:
                        pairs.add((x, y))
    out = sorted(pairs)
    return pd.DataFrame(
        {"a": [p[0] for p in out], "b": [p[1] for p in out]}
    )
