"""Document deletion (tombstones) and delete-aware serving/compaction.

The reference has no mutation story at all — removing documents means
re-running the whole pickle build (final_implementation.py). At crawl
scale, takedowns / opt-outs / recrawl-expiry arrive continuously and must
not force a 100-TB rebuild, so this module adds the Lucene live-docs
model on top of the generational index (pipelines/incremental.py):

- ``delete_docs(index_dir, urls)`` resolves the urls against each
  shard's docmap (one column-pruned distributed pass per shard; the url
  list rides along as a broadcast ``ray.put`` set — delete lists are
  operational-sized, not corpus-sized) and appends a TOMBSTONE parquet of
  (src, lang, doc_id) rows.  Commit is atomic: the parquet directory is
  durably written first, then ``tombstones.json`` is swapped via
  temp-file + rename.  Deletes accumulate across calls (union).
- Serving honours tombstones LIVE with Lucene semantics: tombstoned
  docs never appear in results, but global statistics (N, avgdl, df)
  stay those of the last build — scores of surviving docs are unchanged
  until compaction, exactly like Lucene's deleted-docs bitset.  The
  accelerated paths (WAND / MaxScore) fall back to masked exact TAAT for
  a shard that carries deletes; they regain full speed after compaction
  (Lucene: "deletes slow searches until merge").
- ``compact_index(..., tombstones_dir=...)`` (pipelines/incremental.py)
  physically drops tombstoned docs while merging: postings are decoded,
  filtered, re-encoded; per-term df is recounted from the survivors
  (terms whose postings empty out disappear); N / avgdl / total_tokens
  are recomputed from the surviving docmap — the compacted index is
  rank-identical to a fresh build over the surviving corpus (tested).

Storage layout (default ``<index_dir>/tombstones``, overridable so a
shared read-only index can carry caller-private deletes)::

    tombstones/
      tombstones.json          # {"dirs": ["t-000001", ...]}  (atomic)
      t-000001/*.parquet       # src:int64, lang:str, doc_id:int64 (LOCAL id)
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data

TOMBSTONES_JSON = "tombstones.json"


def in_sorted(vals: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``vals`` in a SORTED unique int64 array."""
    if sorted_arr is None or sorted_arr.size == 0:
        return np.zeros(len(vals), dtype=bool)
    i = np.searchsorted(sorted_arr, vals)
    i = np.minimum(i, sorted_arr.size - 1)
    return sorted_arr[i] == vals


def read_tombstone_dirs(tombstones_dir: str) -> list:
    p = os.path.join(tombstones_dir, TOMBSTONES_JSON)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [os.path.join(tombstones_dir, d) for d in json.load(f)["dirs"]]


def _commit_tombstone_dir(tombstones_dir: str, name: str) -> None:
    p = os.path.join(tombstones_dir, TOMBSTONES_JSON)
    dirs = []
    if os.path.exists(p):
        with open(p) as f:
            dirs = json.load(f)["dirs"]
    dirs.append(name)
    fd, tmp = tempfile.mkstemp(dir=tombstones_dir, suffix=".json.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"dirs": dirs}, f)
    os.replace(tmp, p)


def load_deleted(tombstones_dir: str) -> dict:
    """{(src, lang): sorted unique np.int64 LOCAL doc ids} over every
    committed tombstone parquet. Empty dict when no deletes exist."""
    parts: dict = {}
    for d in read_tombstone_dirs(tombstones_dir):
        t = pads.dataset(d).to_table(columns=["src", "lang", "doc_id"])
        src = t["src"].to_numpy(zero_copy_only=False)
        lang = np.asarray(t["lang"].to_pylist(), dtype=object)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        for key in {(int(s), l) for s, l in zip(src, lang)}:
            m = (src == key[0]) & (lang == key[1])
            parts.setdefault(key, []).append(ids[m])
    return {
        k: np.unique(np.concatenate(v).astype(np.int64))
        for k, v in parts.items()
    }


def deleted_ref(tombstones_dir) -> "ray.ObjectRef | None":
    """One plasma copy of the deleted-ids dict for scorer actor pools;
    None when the dir carries no tombstones."""
    if tombstones_dir is None:
        return None
    d = load_deleted(tombstones_dir)
    return ray.put(d) if d else None


def delete_docs(index_dir: str, urls, tombstones_dir: str = None) -> int:
    """Tombstone every document whose url is in ``urls``.

    Resolution is one column-pruned docmap scan per shard (base +
    generations) with the url set broadcast via ``ray.put`` — a
    distributed semi-join, nothing corpus-sized on the driver. Unknown
    urls are ignored. Returns the number of NEW tombstone rows written
    (0 leaves the tombstone log untouched).

    Concurrency contract (same as append_index): ONE writer at a time —
    the tombstones.json read-modify-write is atomic against readers
    (temp + rename) but two concurrent delete_docs calls could drop one
    another's log entry. Readers are always consistent."""
    from .incremental import shard_dirs

    tomb = tombstones_dir or os.path.join(index_dir, "tombstones")
    url_arr = pa.array(sorted({str(u) for u in urls}), pa.string())
    if len(url_arr) == 0:
        return 0
    url_ref = ray.put(url_arr)

    def _match(t: pa.Table, src: int, lang: str) -> pa.Table:
        wanted = ray.get(url_ref)
        m = pc.is_in(pc.cast(t["url"], pa.string()), value_set=wanted)
        t = t.filter(m)
        n = t.num_rows
        return pa.table({
            "src": pa.array(np.full(n, src, np.int64), pa.int64()),
            "lang": pa.array([lang] * n, pa.string()),
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
        })

    parts = []
    for src, d in enumerate(shard_dirs(index_dir)):
        import glob as _glob

        for p in sorted(_glob.glob(os.path.join(d, "docmap", "lang=*"))):
            lang = os.path.basename(p).split("=", 1)[1]
            parts.append(
                ray.data.read_parquet(p, columns=["doc_id", "url"]).map_batches(
                    _match, fn_kwargs={"src": src, "lang": lang},
                    batch_format="pyarrow",
                )
            )
    if not parts:
        raise FileNotFoundError(f"no docmap under {index_dir!r}")
    ds = parts[0]
    for extra in parts[1:]:
        ds = ds.union(extra)
    name = f"t-{len(read_tombstone_dirs(tomb)) + 1:06d}"
    out = os.path.join(tomb, name)
    os.makedirs(tomb, exist_ok=True)
    ds.write_parquet(out)
    # Ray writes no directory at all for an all-filtered (empty) dataset
    n_new = pads.dataset(out).count_rows() if os.path.isdir(out) else 0
    if n_new == 0:
        # nothing matched: drop the empty dir, keep the log untouched
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        return 0
    _commit_tombstone_dir(tomb, name)
    return n_new


def rebased_deleted_by_lang(deleted: dict, offsets_by_lang: dict) -> dict:
    """Tombstones' (src, lang, LOCAL id) → {lang: sorted unique GLOBAL
    ids} under the compaction doc-id rebasing (generation offsets)."""
    out: dict = {}
    for (src, lang), ids in deleted.items():
        out.setdefault(lang, []).append(ids + offsets_by_lang[lang][src])
    return {
        lang: np.unique(np.concatenate(v)) for lang, v in out.items()
    }
