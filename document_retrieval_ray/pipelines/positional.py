"""Positional index + index-backed phrase query.

The bag-of-words index (build_index.py) stores (term, doc, tf) — enough
for BM25 but not for phrase queries, which need token positions. The
reference engine has the same limitation (its tf dicts drop positions:
final_implementation.py:89-117 keeps only counts), so phrase semantics
here are defined by the corpus-scan `q_phrase_search` and its SQL
oracle; tests prove this index-backed path produces identical results.

Design for 100 TB:

- BUILD is one corpus pass with ZERO shuffle: every document lives in
  exactly one batch, so each batch's (term, doc_id, positions) rows are
  final. The writer hive-partitions by ``thash = stable_hash64(term) %
  num_parts`` so term lookups touch a bounded slice of the artifact.
- QUERY never rescans the corpus: it reads ONLY the ``thash=`` partition
  directories holding the phrase's terms (path-level pruning — the
  other ``num_parts - |terms|`` partitions are never listed), filters to
  the exact terms, then cogroups candidates by doc_id and intersects
  positions fully vectorized (packed ``doc_id << POS_BITS | shifted
  position`` keys + ``np.intersect1d`` per phrase slot).
- Exchange volume: the doc_id cogroup moves only rows of the phrase's
  terms — for typical phrases this is df(term) rows, orders of magnitude
  below corpus size.
"""

from __future__ import annotations

import json
import os
from functools import reduce

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import stable_hash64
from ..stages.index_build import add_kpart
from ..util import read_parquet_clean

# positions are packed into the low bits of an int64 alongside doc_id;
# 21 bits ≈ 2M tokens per document (asserted at build time)
POS_BITS = 22
POS_LIMIT = 1 << (POS_BITS - 1)

__all__ = [
    "append_positional_index",
    "build_positional_index",
    "phrase_query",
    "proximity_query",
    "read_pos_manifest",
]


def emit_positions(batch: pa.Table, num_parts: int,
                   doc_shift: int = None) -> pa.Table:
    """(doc_id, text) batch → (thash, term, doc_id, positions) rows,
    plus a ``dbucket = doc_id >> doc_shift`` doc-range column when
    ``doc_shift`` is set (the hot-term sub-partitioning axis).

    Fully vectorized: Arrow lower/regex/split, flat values + offsets,
    dictionary-encode for integer term codes, one lexsort, run-length
    boundaries → ListArray of 0-based positions. The per-batch vocabulary
    (dictionary) is the only thing hashed in Python — unique terms, not
    token occurrences.
    """
    text = pc.cast(batch["text"], pa.string())
    low = pc.utf8_lower(text)
    spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
    trimmed = pc.utf8_trim_whitespace(spaced)
    trimmed = pc.if_else(pc.is_valid(trimmed), trimmed, pa.scalar("", pa.string()))
    toks = pc.split_pattern(trimmed, " ").combine_chunks()

    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values
    start0 = offsets[0]
    if start0 != 0 or len(values) != offsets[-1]:
        values = values.slice(start0, offsets[-1] - start0)
        offsets = offsets - start0
    lens = np.diff(offsets)
    if lens.max(initial=0) >= POS_LIMIT:
        raise ValueError(
            f"document exceeds {POS_LIMIT} tokens; positional packing "
            f"needs wider POS_BITS"
        )
    parent = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    pos = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], lens)

    denc = values.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab_np = np.asarray(denc.dictionary.to_pandas(), dtype=object)

    # drop the '' sentinel token of empty documents (never a phrase term;
    # it is a doc's only token so no other positions shift)
    empty_codes = np.nonzero(vocab_np == "")[0]
    if len(empty_codes):
        keep = codes != empty_codes[0]
        parent, pos, codes = parent[keep], pos[keep], codes[keep]

    if len(parent) == 0:
        cols = {
            "thash": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "positions": pa.array([], pa.list_(pa.int32())),
        }
        if doc_shift is not None:
            cols["dbucket"] = pa.array([], pa.int64())
        return pa.table(cols)

    # packed-key radix argsort (see TokenizeStage._count), 1 pass vs
    # lexsort's 3; (parent, code, pos) triples are distinct so order is
    # byte-identical
    V = len(vocab_np)
    P = int(pos.max()) + 1 if len(pos) else 1
    if int(parent[-1] + 1) * V * P < 2**62:
        key = (parent * np.int64(V) + codes) * np.int64(P) + pos
        order = np.argsort(key, kind="stable")
    else:
        order = np.lexsort((pos, codes, parent))
    parent, pos, codes = parent[order], pos[order], codes[order]
    change = np.ones(len(parent), dtype=bool)
    change[1:] = (parent[1:] != parent[:-1]) | (codes[1:] != codes[:-1])
    starts = np.flatnonzero(change)
    list_offsets = np.append(starts, len(parent)).astype(np.int32)

    vhash = np.fromiter(
        (stable_hash64(s) % num_parts for s in vocab_np),
        dtype=np.int64,
        count=len(vocab_np),
    )
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    row_docs = doc_ids[parent[starts]].astype(np.int64)
    cols = {
        "thash": pa.array(vhash[codes[starts]], pa.int64()),
        "term": denc.dictionary.take(pa.array(codes[starts])),
        "doc_id": pa.array(row_docs, pa.int64()),
        "positions": pa.ListArray.from_arrays(
            pa.array(list_offsets), pa.array(pos.astype(np.int32))
        ),
    }
    if doc_shift is not None:
        cols["dbucket"] = pa.array(row_docs >> doc_shift, pa.int64())
    return pa.table(cols)


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "pos_manifest.json")


def read_pos_manifest(index_dir: str) -> dict | None:
    p = _manifest_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def build_positional_index(
    docs_path: str,
    index_dir: str,
    num_parts: int = 32,
    input_ds_factory=None,
    doc_shift: int = 14,
) -> dict:
    """One-pass, shuffle-free positional index build. Idempotent: a
    committed ``pos_manifest.json`` (atomic rename, written AFTER the
    parquet) makes re-runs a no-op — the resume unit is the whole
    artifact because the build is a single streaming pass.

    ``doc_shift``: positions are hive-partitioned by (thash, dbucket =
    doc_id >> doc_shift) — the doc-range axis lets a phrase query read a
    HOT term's rows only for the doc ranges its rare terms produced
    (SCALE.md's "per-term partition sharding for hot positional terms"),
    bounding the read by candidates instead of df ≈ N. A term-count
    sidecar (``term_stats/thash=H`` — exact per-term doc counts, NO
    shuffle: a term's rows all share its thash partition, so
    within-partition counts are global) feeds the rare/hot split at
    query time."""
    m = read_pos_manifest(index_dir)
    if m is not None:
        return m
    if input_ds_factory is not None:
        ds = input_ds_factory(columns=["doc_id", "text"])
    else:
        ds = read_parquet_clean(docs_path, columns=["doc_id", "text"])
    out = ds.map_batches(
        emit_positions,
        fn_kwargs={"num_parts": num_parts, "doc_shift": doc_shift},
        batch_format="pyarrow",
    )
    pos_dir = os.path.join(index_dir, "positions")
    out.write_parquet(pos_dir, partition_cols=["thash", "dbucket"])

    # term_stats sidecar: per-batch (thash, term, n_docs) partials — a
    # term's rows are COLOCATED in its thash partition lineage, and the
    # query sums partials per term, so no shuffle is ever needed
    def _count(t: pa.Table) -> pa.Table:
        g = pa.table({
            "thash": t["thash"], "term": t["term"],
        }).group_by(["thash", "term"]).aggregate([("term", "count")])
        return g.rename_columns(["thash", "term", "n_docs"])

    ray.data.read_parquet(pos_dir, columns=["term", "thash"]).map_batches(
        _count, batch_format="pyarrow"
    ).write_parquet(
        os.path.join(index_dir, "term_stats"), partition_cols=["thash"]
    )
    manifest = {
        "num_parts": num_parts,
        "source": docs_path,
        "doc_shift": doc_shift,
    }
    os.makedirs(index_dir, exist_ok=True)
    tmp = _manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(index_dir))
    return manifest


def append_positional_index(
    docs_path: str,
    index_dir: str,
    input_ds_factory=None,
) -> dict:
    """Append a crawl delta to an existing positional index WITHOUT
    rebuilding it: the delta gets its own one-pass artifact under
    ``generations/gen-N`` (same ``num_parts`` as the base, so term→
    partition routing is identical across generations), and the base
    manifest's ``generations`` list is atomically extended. Queries
    transparently union candidate rows across base + generations — exact
    because positions are per-document and the doc-id spaces of crawl
    deltas are disjoint (same caller contract as ``append_index``:
    dedup upstream). A crash mid-append leaves the previous manifest;
    re-running resumes the generation build (its own committed manifest)
    and then commits."""
    m = read_pos_manifest(index_dir)
    if m is None:
        raise FileNotFoundError(
            f"no committed positional index at {index_dir} — build the "
            "base with build_positional_index first"
        )
    gens = m.get("generations", [])
    name = f"gen-{len(gens) + 1:05d}"
    gen_dir = os.path.join(index_dir, "generations", name)
    build_positional_index(
        docs_path, gen_dir, num_parts=int(m["num_parts"]),
        input_ds_factory=input_ds_factory,
    )
    m["generations"] = gens + [name]
    tmp = _manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, _manifest_path(index_dir))
    return m


def _pos_dirs(index_dir: str) -> list:
    """Base + committed positional generations, in append order."""
    m = read_pos_manifest(index_dir)
    gens = (m or {}).get("generations", [])
    return [index_dir] + [
        os.path.join(index_dir, "generations", g) for g in gens
    ]


def _phrase_match_partition(group: pd.DataFrame, phrases) -> pd.DataFrame:
    """doc_id-hash partition of candidate (term, doc_id, positions) rows
    → final (phrase_id, doc_id, n_matches). A phrase slot j contributes
    the key set {doc << POS_BITS | (p - j + L)}; a phrase occurrence is a
    key present in EVERY slot's set, so ``reduce(np.intersect1d)`` — all
    numpy, no per-doc loop."""
    out_pid, out_doc, out_cnt = [], [], []
    by_term = {t: g for t, g in group.groupby("term", sort=False)}
    for pid, words in phrases:
        L = len(words)
        key_sets = []
        for j, w in enumerate(words):
            sub = by_term.get(w)
            if sub is None or len(sub) == 0:
                key_sets = []
                break
            _, packed = _flat_keys(sub)
            # low bits never borrow/carry: flat - j + L stays in (0, 2^POS_BITS)
            key_sets.append(packed + (L - j))
        if not key_sets:
            continue
        hit = reduce(np.intersect1d, key_sets)
        if len(hit) == 0:
            continue
        docs, counts = np.unique(hit >> POS_BITS, return_counts=True)
        out_pid.extend([pid] * len(docs))
        out_doc.append(docs)
        out_cnt.append(counts)
    if not out_doc:
        return pd.DataFrame(
            {
                "phrase_id": pd.Series(dtype=object),
                "doc_id": pd.Series(dtype="int64"),
                "n_matches": pd.Series(dtype="int64"),
            }
        )
    return pd.DataFrame(
        {
            "phrase_id": out_pid,
            "doc_id": np.concatenate(out_doc),
            "n_matches": np.concatenate(out_cnt).astype(np.int64),
        }
    )


def _flat_keys(sub: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(term-filtered candidate rows) → (doc-repeat array, packed
    ``doc << POS_BITS | pos`` keys)."""
    plists = sub["positions"].to_numpy()
    lens = np.fromiter(map(len, plists), dtype=np.int64, count=len(plists))
    flat = (
        np.concatenate(plists).astype(np.int64)
        if lens.sum()
        else np.array([], dtype=np.int64)
    )
    docrep = np.repeat(sub["doc_id"].to_numpy(np.int64), lens)
    return docrep, (docrep << POS_BITS) | flat


def _near_match_partition(group: pd.DataFrame, pairs, window: int) -> pd.DataFrame:
    """doc_id-hash partition → unordered proximity counts: n_matches =
    |{(pa, pb): |pa - pb| <= window}| per (pair, doc). Packed-key range
    counting: b's keys are sorted once, each a-position contributes
    ``searchsorted(hi) - searchsorted(lo)``. A window never leaks across
    documents because positions use < POS_BITS-1 bits while the doc id
    occupies the high bits (window < POS_LIMIT keeps ranges in-doc)."""
    assert 0 < window < POS_LIMIT
    out_pid, out_doc, out_cnt = [], [], []
    by_term = {t: g for t, g in group.groupby("term", sort=False)}
    for pid, ta, tb in pairs:
        sa, sb = by_term.get(ta), by_term.get(tb)
        if sa is None or sb is None or len(sa) == 0 or len(sb) == 0:
            continue
        adoc, akeys = _flat_keys(sa)
        _, bkeys = _flat_keys(sb)
        bkeys = np.sort(bkeys)
        cnt = np.searchsorted(bkeys, akeys + window, side="right") - np.searchsorted(
            bkeys, akeys - window, side="left"
        )
        hit = cnt > 0
        if not hit.any():
            continue
        docs, inv = np.unique(adoc[hit], return_inverse=True)
        totals = np.bincount(inv, weights=cnt[hit]).astype(np.int64)
        out_pid.extend([pid] * len(docs))
        out_doc.append(docs)
        out_cnt.append(totals)
    if not out_doc:
        return pd.DataFrame(
            {
                "pair_id": pd.Series(dtype=object),
                "doc_id": pd.Series(dtype="int64"),
                "n_matches": pd.Series(dtype="int64"),
            }
        )
    return pd.DataFrame(
        {
            "pair_id": out_pid,
            "doc_id": np.concatenate(out_doc),
            "n_matches": np.concatenate(out_cnt),
        }
    )


def _ordered_near_partition(group: pd.DataFrame, pairs,
                            max_gap: int) -> pd.DataFrame:
    """Ordered proximity (Lucene SpanNear inOrder=true): n_matches =
    |{(pa, pb): 1 <= pb - pa <= max_gap}| per (pair, doc) — the
    one-sided variant of :func:`_near_match_partition`'s packed-key
    range count (b strictly AFTER a, within the gap)."""
    assert 0 < max_gap < POS_LIMIT
    out_pid, out_doc, out_cnt = [], [], []
    by_term = {t: g for t, g in group.groupby("term", sort=False)}
    for pid, ta, tb in pairs:
        sa, sb = by_term.get(ta), by_term.get(tb)
        if sa is None or sb is None or len(sa) == 0 or len(sb) == 0:
            continue
        adoc, akeys = _flat_keys(sa)
        _, bkeys = _flat_keys(sb)
        bkeys = np.sort(bkeys)
        cnt = np.searchsorted(
            bkeys, akeys + max_gap, side="right"
        ) - np.searchsorted(bkeys, akeys, side="right")
        hit = cnt > 0
        if not hit.any():
            continue
        docs, inv = np.unique(adoc[hit], return_inverse=True)
        totals = np.bincount(inv, weights=cnt[hit]).astype(np.int64)
        out_pid.extend([pid] * len(docs))
        out_doc.append(docs)
        out_cnt.append(totals)
    if not out_doc:
        return pd.DataFrame(
            {
                "pair_id": pd.Series(dtype=object),
                "doc_id": pd.Series(dtype="int64"),
                "n_matches": pd.Series(dtype="int64"),
            }
        )
    return pd.DataFrame(
        {
            "pair_id": out_pid,
            "doc_id": np.concatenate(out_doc),
            "n_matches": np.concatenate(out_cnt),
        }
    )


def _walk_parquet(d: str) -> list:
    """All parquet files under ``d`` — one level (legacy thash-only
    layout) or two (thash/dbucket)."""
    out = []
    for root, _dirs, files in os.walk(d):
        out.extend(os.path.join(root, f) for f in files
                   if f.endswith(".parquet"))
    return sorted(out)


def _candidate_rows(index_dir: str, terms, num_parts_hint=None):
    """Shared read path: prune to the terms' thash partition dirs —
    across the base AND every committed positional generation — and
    filter to the exact terms. Returns (Dataset | None) — None when no
    partition holds any of the terms."""
    m = read_pos_manifest(index_dir)
    num_parts = (m or {}).get("num_parts", num_parts_hint)
    if num_parts is None:
        raise ValueError(f"no pos_manifest.json under {index_dir}")
    hashes = sorted({stable_hash64(w) % num_parts for w in terms})
    files: list = []
    for root in _pos_dirs(index_dir):
        for h in hashes:
            files.extend(
                _walk_parquet(os.path.join(root, "positions", f"thash={h}")))
    if not files:
        return None
    tset = pa.array(sorted(terms), pa.string())

    def flt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(pc.cast(t["term"], pa.string()), value_set=tset))
        return t.select(["term", "doc_id", "positions"])

    return ray.data.read_parquet(files).map_batches(flt, batch_format="pyarrow")


def term_doc_counts(index_dir: str, terms) -> dict | None:
    """Exact per-term doc counts from the ``term_stats`` sidecars (thash
    partition-pruned reads, partials summed across base + generations).
    None when any root predates the sidecar (legacy artifact)."""
    import pyarrow.parquet as _pq

    m = read_pos_manifest(index_dir)
    if m is None:
        return None
    num_parts = int(m["num_parts"])
    counts = {t: 0 for t in terms}
    hashes = sorted({stable_hash64(t) % num_parts for t in terms})
    tset = sorted(terms)
    for root in _pos_dirs(index_dir):
        sdir = os.path.join(root, "term_stats")
        if not os.path.isdir(sdir):
            return None
        for h in hashes:
            p = os.path.join(sdir, f"thash={h}")
            if not os.path.isdir(p):
                continue
            t = _pq.read_table(p, columns=["term", "n_docs"])
            t = t.filter(pc.is_in(pc.cast(t["term"], pa.string()),
                                  value_set=pa.array(tset, pa.string())))
            for term, n in zip(t["term"].to_pylist(),
                               t["n_docs"].to_pylist()):
                counts[term] += int(n)
    return counts


def _candidate_rows_pruned(index_dir: str, term_groups, hot_df: int,
                           anchor_cap: int, num_parts_hint=None):
    """Hot-term-aware read (SCALE.md's stated fix for the df≈N phrase
    degeneration): terms with df <= ``hot_df`` read as today; HOT terms
    read only (thash, dbucket) partition dirs covering the ANCHOR docs —
    the docs holding each group's rarest term — and filter to that doc
    set. Lossless: a doc matching group G contains G's anchor term, so
    every hot row a match needs survives.

    Degenerate contract (documented, audited): a group whose RAREST
    term is itself hotter than ``anchor_cap`` docs cannot be anchored —
    the whole call falls back to the full read (a worker-visible
    RuntimeWarning names the term), preserving exact results at the
    legacy cost. Returns (Dataset | None)."""
    import warnings

    all_terms = sorted({t for g in term_groups for t in g})
    dfs = term_doc_counts(index_dir, all_terms)
    if dfs is None:  # legacy artifact — no stats sidecar
        return _candidate_rows(index_dir, all_terms, num_parts_hint)
    anchors = set()
    for g in term_groups:
        present = [t for t in g if dfs.get(t, 0) > 0]
        if not present:
            continue  # a group with an absent term matches nothing
        anchors.add(min(present, key=lambda t: (dfs[t], t)))
    hot = {t for t in all_terms
           if dfs.get(t, 0) > hot_df and t not in anchors}
    if not hot:
        return _candidate_rows(index_dir, all_terms, num_parts_hint)
    if any(dfs[a] > anchor_cap for a in anchors):
        worst = max(anchors, key=lambda a: dfs[a])
        warnings.warn(
            f"positional pruned read: anchor term {worst!r} has "
            f"df={dfs[worst]} > anchor_cap={anchor_cap} — every term of "
            "its group is stopword-class, falling back to the full "
            "partition read (exact, corpus-proportional). Consider a "
            "parse-time stoplist for this phrase.",
            RuntimeWarning, stacklevel=3,
        )
        return _candidate_rows(index_dir, all_terms, num_parts_hint)

    rare = sorted(set(all_terms) - hot)
    rare_ds = _candidate_rows(index_dir, rare, num_parts_hint)
    if rare_ds is None:
        return None
    rare_ds = rare_ds.materialize()

    # anchor doc set (df(anchor)-bounded — the small side, broadcast)
    aset = pa.array(sorted(anchors), pa.string())

    def _adocs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(pc.cast(t["term"], pa.string()),
                              value_set=aset))
        return t.select(["doc_id"])

    parts = rare_ds.map_batches(_adocs, batch_format="pyarrow").take_all()
    if not parts:
        return rare_ds
    anchor_docs = np.unique(np.asarray(
        [r["doc_id"] for r in parts], dtype=np.int64))

    m = read_pos_manifest(index_dir)
    num_parts = int(m["num_parts"])
    hot_hashes = sorted({stable_hash64(t) % num_parts for t in hot})
    hot_files: list = []
    for root in _pos_dirs(index_dir):
        rm = read_pos_manifest(root) if root != index_dir else m
        shift = (rm or {}).get("doc_shift")
        for h in hot_hashes:
            hdir = os.path.join(root, "positions", f"thash={h}")
            if shift is None:  # legacy root: no doc-range axis
                hot_files.extend(_walk_parquet(hdir))
            else:
                for b in np.unique(anchor_docs >> np.int64(shift)):
                    hot_files.extend(
                        _walk_parquet(os.path.join(hdir, f"dbucket={b}")))
    if not hot_files:
        return rare_ds
    hset = pa.array(sorted(hot), pa.string())

    def _hflt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(pc.cast(t["term"], pa.string()),
                              value_set=hset))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(anchor_docs, ids)
        pos = np.clip(pos, 0, len(anchor_docs) - 1)
        t = t.filter(pa.array(anchor_docs[pos] == ids))
        return t.select(["term", "doc_id", "positions"])

    hot_ds = ray.data.read_parquet(hot_files).map_batches(
        _hflt, batch_format="pyarrow")
    return rare_ds.union(hot_ds)


def proximity_query(index_dir: str, pairs, window: int, num_parts_hint=None,
                    hot_df: int = 100_000, anchor_cap: int = 5_000_000):
    """Index-backed NEAR search: docs where ``ta`` and ``tb`` occur
    within ``window`` tokens of each other (unordered), with the pair
    count. ``pairs`` is [(pair_id, term_a, term_b)]. Same pruned read as
    phrase_query (each pair anchors on its rarer side)."""
    cand = _candidate_rows_pruned(
        index_dir, [{a, b} for _, a, b in pairs], hot_df, anchor_cap,
        num_parts_hint)
    empty = pd.DataFrame(
        {
            "pair_id": pd.Series(dtype=object),
            "doc_id": pd.Series(dtype="int64"),
            "n_matches": pd.Series(dtype="int64"),
        }
    )
    if cand is None:
        return ray.data.from_pandas(empty)
    return (
        cand.map_batches(
            add_kpart, fn_kwargs={"num_parts": 64, "cols": ("doc_id",)},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(
            lambda g: _near_match_partition(g, pairs, window),
            batch_format="pandas",
        )
    )


def ordered_proximity_query(index_dir: str, pairs, max_gap: int,
                            num_parts_hint=None, hot_df: int = 100_000,
                            anchor_cap: int = 5_000_000):
    """Ordered NEAR (``ta`` before ``tb``, gap <= ``max_gap`` tokens) —
    the sloppy ordered-phrase primitive; same pruned read + doc-hash
    cogroup shape as :func:`proximity_query`, ordered kernel."""
    cand = _candidate_rows_pruned(
        index_dir, [{a, b} for _, a, b in pairs], hot_df, anchor_cap,
        num_parts_hint)
    empty = pd.DataFrame(
        {
            "pair_id": pd.Series(dtype=object),
            "doc_id": pd.Series(dtype="int64"),
            "n_matches": pd.Series(dtype="int64"),
        }
    )
    if cand is None:
        return ray.data.from_pandas(empty)
    return (
        cand.map_batches(
            add_kpart, fn_kwargs={"num_parts": 64, "cols": ("doc_id",)},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(
            lambda g: _ordered_near_partition(g, pairs, max_gap),
            batch_format="pandas",
        )
    )


def phrase_query(index_dir: str, phrases, num_parts_hint: int | None = None,
                 hot_df: int = 100_000, anchor_cap: int = 5_000_000):
    """Index-backed phrase search: reads ONLY the partition directories
    of the phrase terms (path-level pruning), filters to the exact
    terms, doc_id-cogroups, intersects positions. ``phrases`` is
    [(phrase_id, "w1 w2 ...")]. Terms hotter than ``hot_df`` docs read
    only the doc-range sub-partitions covering each phrase's
    rarest-term candidates (``_candidate_rows_pruned``)."""
    parsed = [(pid, p.split()) for pid, p in phrases]
    cand = _candidate_rows_pruned(
        index_dir, [set(ws) for _, ws in parsed], hot_df, anchor_cap,
        num_parts_hint)
    empty = pd.DataFrame(
        {
            "phrase_id": pd.Series(dtype=object),
            "doc_id": pd.Series(dtype="int64"),
            "n_matches": pd.Series(dtype="int64"),
        }
    )
    if cand is None:
        return ray.data.from_pandas(empty)
    return (
        cand.map_batches(
            add_kpart, fn_kwargs={"num_parts": 64, "cols": ("doc_id",)},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(
            lambda g: _phrase_match_partition(g, parsed), batch_format="pandas"
        )
    )
