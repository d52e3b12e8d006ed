"""Resumable partitioned Parquet export — the generic output sink.

The index build already resumes per language shard (state/manifest.py);
this module applies the same commit discipline to ARBITRARY dataset
exports: the cleaned corpus after a dedup apply, a filtered training
split, a scored subset. At 100 TB an export is hours of wall clock, so
"a failed run skips finished partitions" is a first-class requirement
(the reference's analog is its everything-is-a-pickle-checkpoint habit,
e.g. cosine_similarity_bm25_reranking.py:288-331 — re-expressed here as
per-shard atomic manifests over partitioned Parquet instead of one
driver pickle).

Plan shape (all Ray-Data streaming, ONE pass over the input):

1. every row gets a deterministic shard id = hash(key) % num_shards
   (content-independent placement; same input → same shard layout);
2. shards whose manifest is already committed for the same fingerprint
   are filtered OUT of the stream (resume skips their rows at the scan,
   not after the write);
3. uncommitted shard directories are cleaned before writing (a killed
   writer may have left partial files — without the manifest they are
   untrusted and rewritten);
4. ``write_parquet(..., partition_cols=[shard])`` streams every pending
   shard in one execution — no per-shard rescan;
5. per-shard row counts are read back from the Parquet FOOTERS (metadata
   only, no data scan) and each shard's manifest commits atomically.

A kill between (4) and (5) rewrites only the shards whose manifests are
missing; committed shards are never touched again (asserted by mtime in
tests/test_export.py).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.manifest import is_committed, read_manifest, write_manifest

SHARD_COL = "__shard"


def _add_shard(batch: pa.Table, num_shards: int, key_col: str) -> pa.Table:
    """Deterministic shard id from the key column. Unlike ``add_kpart``
    (placement-only, within one run) this hash must be stable ACROSS
    runs and processes — a resume recomputes it on the same input and
    must reproduce the committed layout — so it avoids
    ``pd.util.hash_array``'s process-salted string path."""
    vals = batch[key_col]
    if pa.types.is_integer(vals.type):
        h = vals.to_numpy(zero_copy_only=False).astype(np.uint64)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        shard = (h % np.uint64(num_shards)).astype(np.int64)
    else:
        import hashlib

        shard = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big"
                )
                % num_shards
                for v in vals.to_pylist()
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
    return batch.append_column(SHARD_COL, pa.array(shard, pa.int64()))


def _shard_dir(out_dir: str, s: int) -> str:
    return os.path.join(out_dir, f"{SHARD_COL}={s}")


def _manifest_dir(out_dir: str, s: int) -> str:
    return os.path.join(out_dir, "manifests", str(s))


def export_partitioned(
    ds,
    out_dir: str,
    *,
    num_shards: int = 64,
    key_col: str = "doc_id",
    fingerprint=None,
) -> dict:
    """Export ``ds`` to ``out_dir`` as ``num_shards`` hash-partitioned
    Parquet directories with per-shard atomic commit manifests.

    ``fingerprint`` identifies the INPUT (path + row count + transform
    config — the caller knows its lineage); a committed shard with a
    different fingerprint is stale and rewritten. Returns
    ``{shard: n_rows}`` for the full export (committed + written).
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    os.makedirs(out_dir, exist_ok=True)

    done = {
        s: read_manifest(_manifest_dir(out_dir, s))
        for s in range(num_shards)
        if is_committed(_manifest_dir(out_dir, s), fingerprint)
    }
    pending = [s for s in range(num_shards) if s not in done]
    if not pending:
        return {s: m["n_rows"] for s, m in done.items()}

    # untrusted leftovers from a killed writer: clean before rewriting
    for s in pending:
        shutil.rmtree(_shard_dir(out_dir, s), ignore_errors=True)

    sharded = ds.map_batches(
        _add_shard,
        fn_kwargs={"num_shards": num_shards, "key_col": key_col},
        batch_format="pyarrow",
    )
    if done:
        pend_arr = pa.array(pending, pa.int64())
        sharded = sharded.map_batches(
            lambda t: t.filter(pc.is_in(t[SHARD_COL], value_set=pend_arr)),
            batch_format="pyarrow",
        )
    sharded.write_parquet(out_dir, partition_cols=[SHARD_COL])

    counts = {}
    import pyarrow.parquet as pq

    for s in pending:
        sdir = _shard_dir(out_dir, s)
        files = (
            sorted(
                f for f in os.listdir(sdir) if f.endswith(".parquet")
            )
            if os.path.isdir(sdir)
            else []
        )
        n = sum(
            pq.read_metadata(os.path.join(sdir, f)).num_rows for f in files
        )
        write_manifest(
            _manifest_dir(out_dir, s),
            {
                "partition": s,
                "n_rows": n,
                "files": files,
                "input_fingerprint": fingerprint,
            },
        )
        counts[s] = n
    counts.update({s: m["n_rows"] for s, m in done.items()})
    return counts


def read_export(out_dir: str, num_shards: int = 64):
    """Read back a committed export as a Ray Dataset (raises if any shard
    manifest is missing — a partial export must not be silently read as
    complete)."""
    import ray.data

    missing = [
        s for s in range(num_shards) if not is_committed(_manifest_dir(out_dir, s))
    ]
    if missing:
        raise RuntimeError(
            f"export at {out_dir} is incomplete: shards {missing[:8]}"
            f"{'...' if len(missing) > 8 else ''} have no committed manifest"
        )
    paths = [
        os.path.join(sdir, f)
        for s in range(num_shards)
        if os.path.isdir(sdir := _shard_dir(out_dir, s))
        for f in sorted(os.listdir(sdir))
        if f.endswith(".parquet")
    ]
    if not paths:
        raise RuntimeError(f"export at {out_dir} has no data files")
    ds = ray.data.read_parquet(paths)
    if SHARD_COL in (ds.schema().names or []):
        ds = ds.drop_columns([SHARD_COL])
    return ds
