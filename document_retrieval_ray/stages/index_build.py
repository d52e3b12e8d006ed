"""Index-build stages: dense id assignment, posting-list encoding, segment merge.

The wide part of the engine (SURVEY.md §7 Phase 2). The reference builds
``{term: [doc_id,...]}`` dicts in driver RAM and merges partial dicts by
``dict.update`` (final_implementation.py:99-113, team_run1.py:111-121).
Here the same result is a Ray Data shuffle:

- ``AddPart``       url-hash partition column for deterministic dense ids.
- ``AssignDocIds``  ``groupby(lang, part).map_groups`` — sorts each group
                    by url, assigns ``doc_id = offset[lang, part] + rank``,
                    writes the group's docmap Parquet ATOMICALLY as a side
                    output (idempotent filename per (lang, part) → safe
                    under task retries), and returns posting triples.
- ``add_salt``      hot-term skew splitting: terms whose posting count
                    exceeds ``hot_term_threshold`` get doc-range sub-keys
                    ``salt = doc_id >> salt_shift`` (contiguous ranges, so
                    the merge is pure concatenation). Mirrors, at term
                    granularity, the reference's only skew acknowledgment —
                    en gets 208 pickle shards vs ≤19 for other languages
                    (final_implementation.py:228,251).
- ``EncodePartition``  per term-hash partition: one sort, numpy boundary
                    detection, delta-gap varbyte encode per segment with
                    per-block block-max metadata (last_doc, max_tf,
                    min_dl) for WAND pruning — whole partitions
                    vectorized, never one Ray group per term.
- ``MergePartition``  stateful actor-pool merger: concatenates a hot
                    term's encoded doc-range segments into the final
                    posting list (single-segment terms pass through
                    without decode).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import stable_hash64
from ..functions.varbyte import (
    decode_blocked_postings,
    decode_segments_many,
    encode_blocked_postings,
    varbyte_encode_with_lengths,
)
from .tokenize import flatten_tokens


def add_part(batch: pa.Table, num_parts: int) -> pa.Table:
    from ..functions.hashing import stable_hash64_many

    parts = (stable_hash64_many(batch["url"].combine_chunks())
             % np.uint64(num_parts)).astype(np.int64)
    return batch.append_column("part", pa.array(parts, pa.int64()))


class AssignDocIds:
    """Per-(lang, part) group: assign dense doc ids, side-write docmap
    (plus a tiny stats sidecar: n_docs / sum_dl per partition, so global
    stats are exact integer sums over sidecars — no extra pass over the
    corpus), then emit either:

    - ``emit="triples"``: posting triples (lang, term, doc_id, dl, tf) —
      the general path (feeds the cosine-norms pass too), or
    - ``emit="segments"``: ENCODED posting segments for the group's doc
      range directly (_ENCODED_SCHEMA rows, salt = part id). Because each
      (lang, part) group is a contiguous, disjoint doc-id range, per-group
      segments merge by pure concatenation — so the index build's only
      remaining shuffle moves compact encoded segments
      (vocab x parts rows) instead of every posting triple.
    """

    def __init__(self, offsets: dict, docmap_dir: str, emit: str = "triples",
                 block_size: int = 128, df_dir: str = None):
        # offsets: {(lang, part): first dense doc_id of this partition}
        self.offsets = offsets
        self.docmap_dir = docmap_dir
        self.emit = emit
        self.block_size = block_size
        # side-write per-(lang, part) document frequencies here: the group
        # already holds the unique (doc, term) pairs, so df partials cost
        # one factorize+bincount — and the df pass then needs NO extra
        # consumption of the posting stream (A2 without shuffle 2)
        self.df_dir = df_dir

    def __call__(self, group: pa.Table) -> pa.Table:
        lang = group["lang"][0].as_py()
        part = group["part"][0].as_py()
        order = np.argsort(np.asarray(group["url"].to_pandas(), dtype=object), kind="stable")
        group = group.take(pa.array(order))
        base = self.offsets[(lang, int(part))]
        n = group.num_rows
        doc_ids = np.arange(base, base + n, dtype=np.int64)

        self._write_docmap(lang, int(part), group, doc_ids)

        dls = group["dl"].to_numpy(zero_copy_only=False)
        if "tfs" in group.column_names:
            # counted input (TokenizeStage(counted=True)): tf already
            # computed upstream — flatten WITHOUT materializing the token
            # stream as Python objects (the ~5M-object flatten +
            # pd.factorize churn was this stage's dominant CPU; terms now
            # stay Arrow until they are integer codes)
            rows, term_vals = _flatten_list_values(group["terms"])
            _, tfs_arr = _flatten_list_col(group["tfs"], as_object=False)
            if len(rows) == 0:
                return _empty_triples() if self.emit == "triples" else _empty_encoded()
            tcodes = uniq_sorted = None
            if self.df_dir is not None or self.emit != "triples":
                tcodes, uniq_sorted = _sorted_codes(term_vals)
            if self.df_dir is not None:
                self._write_df_partial(lang, int(part), tcodes, uniq_sorted)
            if self.emit == "triples":
                return pa.table(
                    {
                        "lang": pa.array(np.repeat(lang, len(rows)), pa.string()),
                        "term": pc.cast(term_vals, pa.string()),
                        "doc_id": pa.array(doc_ids[rows], pa.int64()),
                        "dl": pa.array(dls[rows], pa.int64()),
                        "tf": pa.array(
                            np.asarray(tfs_arr, dtype=np.int64), pa.int64()
                        ),
                    }
                )
            return self._emit_segments(
                lang, int(part), tcodes, uniq_sorted, doc_ids[rows],
                dls[rows], np.asarray(tfs_arr),
            )

        parent, toks = flatten_tokens(group)
        if len(toks) == 0:
            return _empty_triples() if self.emit == "triples" else _empty_encoded()
        counted = (
            pd.DataFrame({"row": parent, "term": toks})
            .groupby(["row", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        rows = counted["row"].to_numpy()
        terms = counted["term"].to_numpy()
        tfs_arr = counted["tf"].to_numpy()
        if len(terms) == 0:
            return _empty_triples() if self.emit == "triples" else _empty_encoded()
        tcodes = uniq_sorted = None
        if self.df_dir is not None or self.emit != "triples":
            # factorize(sort=True) → integer codes in exact sorted-term
            # order, same contract as _sorted_codes
            tcodes, uniq_sorted = pd.factorize(
                np.asarray(terms, dtype=object), sort=True
            )
            uniq_sorted = np.asarray(uniq_sorted, dtype=object)
        if self.df_dir is not None:
            self._write_df_partial(lang, int(part), tcodes, uniq_sorted)
        if self.emit == "triples":
            return pa.table(
                {
                    "lang": pa.array(np.repeat(lang, len(rows)), pa.string()),
                    "term": pa.array(terms, pa.string()),
                    "doc_id": pa.array(doc_ids[rows], pa.int64()),
                    "dl": pa.array(dls[rows], pa.int64()),
                    "tf": pa.array(tfs_arr, pa.int64()),
                }
            )
        return self._emit_segments(
            lang, int(part), tcodes, uniq_sorted, doc_ids[rows],
            dls[rows], np.asarray(tfs_arr),
        )

    def _emit_segments(self, lang, part, tcodes, uniq_sorted, doc_id, dl,
                       tf) -> pa.Table:
        # integer codes in exact sorted-term order: the lexsort is O(n)
        # integer work instead of O(n log n) Python string compares, with
        # byte-identical output order
        order = np.lexsort((doc_id, tcodes))
        doc_id, dl, tf = doc_id[order], dl[order], tf[order]
        tcodes = tcodes[order]
        n = len(tcodes)
        change = tcodes[1:] != tcodes[:-1]
        starts = np.concatenate([[0], np.flatnonzero(change) + 1, [n]])
        T = len(starts) - 1
        return encode_segments_many(
            np.repeat(lang, T), uniq_sorted[tcodes[starts[:-1]]],
            np.full(T, part, dtype=np.int64),
            doc_id, tf, dl, starts, self.block_size,
        )

    def _write_df_partial(self, lang: str, part: int, tcodes,
                          uniq_sorted) -> None:
        """``tcodes`` codes the flattened unique-(doc, term) pair list, so
        its value counts ARE this partition's document frequencies. Written
        atomically (dot-prefixed temp + rename, idempotent under retry)
        like the docmap side-writes."""
        uniq = uniq_sorted
        counts = np.bincount(tcodes, minlength=len(uniq))
        out_dir = os.path.join(self.df_dir, f"lang={lang}")
        os.makedirs(out_dir, exist_ok=True)
        table = pa.table(
            {
                "term": pa.array(uniq, pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )
        final = os.path.join(out_dir, f"part-{part:05d}.parquet")
        fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".tmp-")
        os.close(fd)
        try:
            pq.write_table(table, tmp)
            os.replace(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def _write_docmap(self, lang: str, part: int, group: pa.Table, doc_ids):
        out_dir = os.path.join(self.docmap_dir, f"lang={lang}")
        os.makedirs(out_dir, exist_ok=True)
        table = pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "url": group["url"],
                "dl": group["dl"],
            }
        )
        final = os.path.join(out_dir, f"part-{part:05d}.parquet")
        # dot-prefix: pyarrow dataset reads ignore '.'-prefixed files, so
        # a temp orphaned by a hard-killed task can't poison later
        # directory reads of docmap/
        fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".tmp-")
        os.close(fd)
        try:
            pq.write_table(table, tmp)
            os.replace(tmp, final)  # idempotent under task retry
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        # stats sidecar (atomic, idempotent) — separate tree so parquet
        # directory reads of docmap/ stay clean
        import json

        stats_dir = os.path.join(
            os.path.dirname(self.docmap_dir), "docmap_stats", f"lang={lang}"
        )
        os.makedirs(stats_dir, exist_ok=True)
        stats = {
            "lang": lang,
            "part": part,
            "n_docs": int(group.num_rows),
            "sum_dl": int(np.sum(group["dl"].to_numpy(zero_copy_only=False))),
        }
        sfinal = os.path.join(stats_dir, f"part-{part:05d}.json")
        fd, tmp = tempfile.mkstemp(dir=stats_dir, prefix=".tmp-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(stats, f)
            os.replace(tmp, sfinal)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)


def _flatten_list_values(col):
    """(parent_index, flat values) for a list column, with the values kept
    as an ARROW array — flattening a group's ~5M tokens into Python
    objects dominated the assign stage's CPU before this existed."""
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    values = arr.values
    start = offsets[0]
    if start != 0 or len(values) != offsets[-1]:
        values = values.slice(start, offsets[-1] - start)
    lens = np.diff(offsets)
    parent = np.repeat(np.arange(len(arr), dtype=np.int64), lens)
    return parent, values


def _sorted_codes(values: pa.Array):
    """(codes int64, unique_sorted object) with codes in EXACT sorted-term
    order — byte-identical contract to ``pd.factorize(sort=True)`` but the
    hashing happens in Arrow's C dictionary-encode; only the UNIQUE values
    ever become Python strings (group vocab ≪ token stream)."""
    denc = pc.dictionary_encode(values)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = np.asarray(denc.dictionary.to_pandas(), dtype=object)
    order_u = np.argsort(uniq)
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order_u] = np.arange(len(uniq), dtype=np.int64)
    return rank[codes], uniq[order_u]


def _flatten_list_col(col, as_object: bool = True):
    """Generic (parent_index, flat values) for a list column."""
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    values = arr.values
    start = offsets[0]
    if start != 0 or len(values) != offsets[-1]:
        values = values.slice(start, offsets[-1] - start)
    lens = np.diff(offsets)
    parent = np.repeat(np.arange(len(arr), dtype=np.int64), lens)
    if as_object:
        vals = np.asarray(values.to_pandas(), dtype=object)
    else:
        vals = values.to_numpy(zero_copy_only=False)
    return parent, vals


def _empty_triples() -> pa.Table:
    return pa.table(
        {
            "lang": pa.array([], pa.string()),
            "term": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "dl": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
        }
    )


def partial_term_counts(batch: pa.Table) -> pa.Table:
    """Per-batch partial (lang, term) → n combine before the df groupby
    (pre-aggregation so the A2 shuffle moves partials, not triples)."""
    df = pd.DataFrame(
        {
            "lang": np.asarray(batch["lang"].to_pandas(), dtype=object),
            "term": np.asarray(batch["term"].to_pandas(), dtype=object),
        }
    )
    counted = df.groupby(["lang", "term"], sort=False).size().reset_index(name="n")
    return pa.table(
        {
            "lang": pa.array(counted["lang"].to_numpy(), pa.string()),
            "term": pa.array(counted["term"].to_numpy(), pa.string()),
            "n": pa.array(counted["n"].to_numpy(), pa.int64()),
        }
    )


def add_salt_and_kpart(
    batch: pa.Table, hot_terms_ref, salt_shift: int, num_parts: int
) -> pa.Table:
    """Add the hot-term doc-range salt AND the encode-shuffle partition key
    in one vectorized pass. Plain task (elastic): ``ray.get`` of the
    broadcast hot set hits the local object-store cache after the first
    fetch per worker — and the stage doesn't reserve a CPU-pinned actor
    pool (three chained pools deadlocked the streaming executor at 32
    CPUs). Hot membership is a C-level ``Series.isin`` on a combined
    "lang\\0term" key, not a per-row Python loop."""
    import ray

    hot = ray.get(hot_terms_ref) if hot_terms_ref is not None else frozenset()
    langs = pd.Series(batch["lang"].to_pandas(), dtype=object)
    terms = pd.Series(batch["term"].to_pandas(), dtype=object)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    salt = np.zeros(len(terms), dtype=np.int64)
    if hot:
        # term-only membership: salting a non-hot (lang, term) that merely
        # shares its term string with a hot pair is harmless (a few extra
        # sub-segments), and Series.isin on one column is far cheaper than
        # building a concatenated key per row
        hot_terms = {t for _, t in hot}
        mask = terms.isin(hot_terms).to_numpy()
        salt[mask] = doc_ids[mask] >> salt_shift
    hl = pd.util.hash_array(langs.to_numpy(dtype=object))
    ht = pd.util.hash_array(terms.to_numpy(dtype=object))
    h = (
        hl * np.uint64(0x9E3779B97F4A7C15)
        ^ ht
        ^ (salt.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
    ).astype(np.int64)
    out = batch.append_column("salt", pa.array(salt, pa.int64()))
    return out.append_column("kpart", pa.array(np.abs(h) % num_parts, pa.int64()))


def encode_segments_many(lang, term, salt, doc_id, tf, dl, starts,
                         block_size: int) -> pa.Table:
    """Vectorized encoder for MANY posting segments at once — the whole
    group's segments in a handful of numpy passes plus ONE varbyte encode,
    byte-identical to the per-term ``_append_segment_row`` loop (tested in
    test_index_build). The key facts making this possible:

    - within a segment the first gap of block b is relative to block
      b−1's LAST doc id, which is simply the previous posting — so the
      per-posting gap array is one global diff with resets to the
      absolute doc id at segment starts;
    - the interleaved value stream ([gaps..., tfs...] per block, blocks
      and segments contiguous) gives value positions gap_i = bstart+i and
      tf_i = bstart+i+blen in closed form;
    - varbyte is per-value independent, so one encode of the full value
      array plus its per-value byte lengths yields every block/segment
      byte offset, and the Arrow binary/list columns are assembled
      zero-copy from the flat buffer + offsets.

    ``lang``/``term``/``salt``: per-segment arrays (length T).
    ``doc_id``/``tf``/``dl``: flat posting arrays (length n), segment-major,
    doc ascending within each segment. ``starts``: int64 (T+1) segment
    boundaries into the flat arrays.
    """
    starts = np.asarray(starts, dtype=np.int64)
    T = len(starts) - 1
    if T <= 0:
        return _empty_encoded()
    n = int(starts[-1])
    doc_id = np.asarray(doc_id, dtype=np.int64)
    tf64 = np.asarray(tf, dtype=np.int64)
    dl64 = np.asarray(dl, dtype=np.int64)
    seg_lens = np.diff(starts)
    if (seg_lens <= 0).any():
        raise ValueError("encode_segments_many: empty segment")
    idx = np.arange(n, dtype=np.int64)
    within = idx - np.repeat(starts[:-1], seg_lens)
    gaps = np.empty(n, dtype=np.uint64)
    if n > 1:
        diffs = doc_id[1:] - doc_id[:-1]
        seg_start_mask = np.zeros(n, dtype=bool)
        seg_start_mask[starts[:-1]] = True
        if (diffs[~seg_start_mask[1:]] <= 0).any():
            raise ValueError("doc_ids must be strictly ascending")
        gaps[1:] = diffs.astype(np.uint64)
    gaps[starts[:-1]] = doc_id[starts[:-1]].astype(np.uint64)
    is_bstart = (within % block_size) == 0
    gbs = np.flatnonzero(is_bstart)
    gbe = np.concatenate([gbs[1:], [n]])
    blen = gbe - gbs
    bstart_per = np.repeat(gbs, blen)
    blen_per = np.repeat(blen, blen)
    vals = np.empty(2 * n, dtype=np.uint64)
    vals[bstart_per + idx] = gaps
    vals[bstart_per + idx + blen_per] = tf64.astype(np.uint64)
    data, nb = varbyte_encode_with_lengths(vals)
    vends = np.cumsum(nb)
    vstarts = vends - nb
    term_byte_off = np.empty(T + 1, dtype=np.int64)
    term_byte_off[:-1] = vstarts[2 * starts[:-1]]
    term_byte_off[-1] = int(vends[-1])
    if term_byte_off[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            "encoded partition exceeds 2 GiB (int32 Arrow binary offsets);"
            " raise num_encode_parts"
        )
    blocks_per_term = (seg_lens + block_size - 1) // block_size
    term_of_block = np.repeat(np.arange(T, dtype=np.int64), blocks_per_term)
    block_off_flat = vstarts[2 * gbs] - term_byte_off[term_of_block]
    loff = pa.array(
        np.concatenate([[0], np.cumsum(blocks_per_term)]).astype(np.int32),
        pa.int32(),
    )

    def _lst(flat):
        return pa.ListArray.from_arrays(
            loff, pa.array(np.asarray(flat, dtype=np.int64), pa.int64())
        )

    postings = pa.Array.from_buffers(
        pa.binary(),
        T,
        [
            None,
            pa.py_buffer(term_byte_off.astype(np.int32)),
            pa.py_buffer(data),
        ],
    )
    return pa.table(
        {
            "lang": pa.array(np.asarray(lang, dtype=object), pa.string()),
            "term": pa.array(np.asarray(term, dtype=object), pa.string()),
            "salt": pa.array(np.asarray(salt, dtype=np.int64), pa.int64()),
            "df": pa.array(seg_lens, pa.int64()),
            "cf": pa.array(np.add.reduceat(tf64, starts[:-1]), pa.int64()),
            "min_doc": pa.array(doc_id[starts[:-1]], pa.int64()),
            "postings": postings,
            "block_off": _lst(block_off_flat),
            "block_last": _lst(doc_id[gbe - 1]),
            "block_max_tf": _lst(np.maximum.reduceat(tf64, gbs)),
            "block_min_dl": _lst(np.minimum.reduceat(dl64, gbs)),
        },
        schema=_ENCODED_SCHEMA,
    )


def _append_segment_row(cols: dict, lang, term, salt, d, t, dl,
                        block_size: int) -> None:
    """Encode one (lang, term, salt) posting segment and append its
    _ENCODED_SCHEMA row to ``cols`` — the single emit path shared by the
    assign/encode/merge stages."""
    buf, block_off = encode_blocked_postings(d, t, block_size)
    last, max_tf, min_dl = _block_meta(d, t, dl, block_size)
    cols["lang"].append(lang)
    cols["term"].append(term)
    cols["salt"].append(int(salt))
    cols["df"].append(len(d))
    cols["cf"].append(int(t.sum()))
    cols["min_doc"].append(int(d[0]))
    cols["postings"].append(buf)
    cols["block_off"].append(block_off)
    cols["block_last"].append(last)
    cols["block_max_tf"].append(max_tf)
    cols["block_min_dl"].append(min_dl)


_ENCODED_SCHEMA = pa.schema(
    [
        ("lang", pa.string()),
        ("term", pa.string()),
        ("salt", pa.int64()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("min_doc", pa.int64()),
        ("postings", pa.binary()),
        ("block_off", pa.list_(pa.int64())),
        ("block_last", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int64())),
        ("block_min_dl", pa.list_(pa.int64())),
    ]
)


def add_kpart(batch: pa.Table, num_parts: int, cols) -> pa.Table:
    """Deterministic-within-run hash partition over key columns (the
    partition assignment never affects output values, only placement, so
    a fast non-cryptographic hash is fine). Per-column numeric hashes are
    combined — no per-row string concatenation."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    mix = np.uint64(0x9E3779B97F4A7C15)
    for c in cols:
        vals = pd.Series(batch[c].to_pandas())
        if vals.dtype == object:
            hc = pd.util.hash_array(vals.to_numpy(dtype=object))
        else:
            hc = pd.util.hash_array(vals.to_numpy())
        h = (h * mix) ^ hc
    # metadata-free schema: when the upstream block was pandas, Ray's
    # pandas→Arrow conversion attaches a b'pandas' schema blob that makes
    # the schema unhashable and defeats block-schema dedup in the shuffle
    # this map feeds (see util.from_pandas_clean)
    return batch.replace_schema_metadata(None).append_column(
        "kpart", pa.array(np.abs(h.astype(np.int64)) % num_parts, pa.int64())
    )


# per-worker vocabulary-index cache for vocab_encode_triples: building the
# vmap and hashing the vocab side cost O(|vocab|) — paying it once per
# WORKER instead of once per BATCH matters at multi-million-term vocabs
_VMAP_CACHE: dict = {}


def _vmap_for(vocab_ref):
    import ray

    key = vocab_ref.hex() if hasattr(vocab_ref, "hex") else id(vocab_ref)
    hit = _VMAP_CACHE.get(key)
    if hit is None:
        lang_arr, term_arr = ray.get(vocab_ref)  # object ndarrays, index = vid
        hit = pd.MultiIndex.from_arrays([lang_arr, term_arr])
        _VMAP_CACHE.clear()  # one live vocabulary per build per worker
        _VMAP_CACHE[key] = hit
    return hit


def vocab_encode_triples(
    batch: pa.Table, vocab_ref, hot_vids_ref, salt_shift: int, num_parts: int
) -> pa.Table:
    """Dictionary-encode (lang, term) → int ``vid`` using the broadcast
    driver vocabulary (indexed ONCE per worker, cached), add salt +
    kpart — the encode shuffle then moves and sorts ONLY numeric columns
    (string sort/hash over the full triple stream dominated the encode
    pass). Plain task."""
    import ray

    hot_vids = ray.get(hot_vids_ref) if hot_vids_ref is not None else None
    vindex = _vmap_for(vocab_ref)
    keys = pd.MultiIndex.from_arrays(
        [
            np.asarray(batch["lang"].to_pandas(), dtype=object),
            np.asarray(batch["term"].to_pandas(), dtype=object),
        ]
    )
    vid = vindex.get_indexer(keys).astype(np.int64)  # -1 = missing
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    salt = np.zeros(len(vid), dtype=np.int64)
    if hot_vids is not None and len(hot_vids):
        mask = np.isin(vid, hot_vids)
        salt[mask] = doc_ids[mask] >> salt_shift
    h = (
        vid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ^ salt.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    ).astype(np.int64)
    return pa.table(
        {
            "vid": pa.array(vid, pa.int64()),
            "doc_id": batch["doc_id"],
            "dl": batch["dl"],
            "tf": batch["tf"],
            "salt": pa.array(salt, pa.int64()),
            "kpart": pa.array(np.abs(h) % num_parts, pa.int64()),
        }
    )


def encode_partition_ids(group: pa.Table, block_size: int, vocab_ref) -> pa.Table:
    """Numeric variant of :func:`encode_partition`: segments keyed by
    (vid, salt), fully numeric sort; lang/term strings re-attached from
    the broadcast vocabulary only on the (tiny) output rows."""
    import ray

    lang_arr, term_arr = ray.get(vocab_ref)
    pdf = group.to_pandas()
    n = len(pdf)
    if n == 0:
        return _empty_encoded()
    order = np.lexsort(
        (pdf["doc_id"].to_numpy(), pdf["salt"].to_numpy(), pdf["vid"].to_numpy())
    )
    vid = pdf["vid"].to_numpy()[order]
    salt = pdf["salt"].to_numpy()[order]
    doc_id = pdf["doc_id"].to_numpy()[order]
    tf = pdf["tf"].to_numpy()[order]
    dl = pdf["dl"].to_numpy()[order]
    change = (vid[1:] != vid[:-1]) | (salt[1:] != salt[:-1])
    starts = np.concatenate([[0], np.flatnonzero(change) + 1, [n]])
    seg_vids = vid[starts[:-1]]
    return encode_segments_many(
        lang_arr[seg_vids], term_arr[seg_vids], salt[starts[:-1]],
        doc_id, tf, dl, starts, block_size,
    )


def encode_partition(group: pa.Table, block_size: int = 128) -> pa.Table:
    """One kpart group (MANY whole (lang, term, salt) segments) → encoded
    segment rows, vectorized: one sort, numpy boundary detection, a single
    output table. Replaces per-term map_groups (5 ms/group of Arrow and
    scheduling overhead at one row per group). Plain task — stateless."""
    pdf = group.to_pandas()
    n = len(pdf)
    if n == 0:
        return _empty_encoded()
    lang = pdf["lang"].to_numpy(dtype=object)
    term = pdf["term"].to_numpy(dtype=object)
    lcodes = pd.factorize(lang, sort=True)[0]
    tcodes = pd.factorize(term, sort=True)[0]
    order = np.lexsort(
        (pdf["doc_id"].to_numpy(), pdf["salt"].to_numpy(), tcodes, lcodes)
    )
    lang, term = lang[order], term[order]
    lcodes, tcodes = lcodes[order], tcodes[order]
    salt = pdf["salt"].to_numpy()[order]
    doc_id = pdf["doc_id"].to_numpy()[order]
    tf = pdf["tf"].to_numpy()[order]
    dl = pdf["dl"].to_numpy()[order]
    change = (
        (tcodes[1:] != tcodes[:-1])
        | (lcodes[1:] != lcodes[:-1])
        | (salt[1:] != salt[:-1])
    )
    starts = np.concatenate([[0], np.flatnonzero(change) + 1, [n]])
    head = starts[:-1]
    return encode_segments_many(
        lang[head], term[head], salt[head], doc_id, tf, dl, starts, block_size
    )


def _row_dl_lower(row) -> np.ndarray:
    """Per-doc dl LOWER BOUND for a segment row: the flat merge flattens
    each ORIGINAL segment to its seg-min; rows produced by intermediate
    merge rounds carry that flattening as run-length ``dl_runs``
    ([len, min, len, min, …]), so expanding runs reproduces the flat
    semantics exactly (byte-identical hierarchical merges)."""
    runs = row.get("dl_runs")
    if runs is not None and len(runs) > 0:
        r = np.asarray(runs, dtype=np.int64).reshape(-1, 2)
        return np.repeat(r[:, 1], r[:, 0])
    seg_min = int(np.min(row["block_min_dl"]))
    return np.full(int(row["df"]), seg_min, dtype=np.int64)


def _row_dl_runs(row) -> list:
    """This row's dl-run pairs (for carrying through merge rounds)."""
    runs = row.get("dl_runs")
    if runs is not None and len(runs) > 0:
        return list(np.asarray(runs, dtype=np.int64))
    return [int(row["df"]), int(np.min(row["block_min_dl"]))]


class MergePartition:
    """One kpart2 group of encoded segments (keyed by (lang, term) hash,
    salt-agnostic) → final posting rows. Single-segment terms pass through
    without decode; hot terms' doc-range segments concatenate in salt
    order (disjoint ascending ranges). Runs as an actor-pool stage — the
    'stateful segment merger' of the north star. Accepts rows from
    intermediate merge rounds (``dl_runs`` column) transparently."""

    def __init__(self, block_size: int = 128, min_df: int = 1):
        self.block_size = block_size
        self.min_df = min_df

    def __call__(self, group: pa.Table) -> pa.Table:
        drop = [c for c in ("kpart", "gsalt") if c in group.column_names]
        if drop:
            group = group.drop_columns(drop)
        n = group.num_rows
        if n == 0:
            return _empty_final()
        has_runs = "dl_runs" in group.column_names
        lang = np.asarray(group["lang"].to_pandas(), dtype=object)
        term = np.asarray(group["term"].to_pandas(), dtype=object)
        min_doc = group["min_doc"].to_numpy(zero_copy_only=False)
        lcodes = pd.factorize(lang, sort=True)[0]
        tcodes = pd.factorize(term, sort=True)[0]
        order = np.lexsort((min_doc, tcodes, lcodes))
        g = group.take(pa.array(order))
        lang, term = lang[order], term[order]
        lcodes, tcodes = lcodes[order], tcodes[order]
        df = g["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        change = (tcodes[1:] != tcodes[:-1]) | (lcodes[1:] != lcodes[:-1])
        tstarts = np.concatenate([[0], np.flatnonzero(change) + 1, [n]])
        seg_count = np.diff(tstarts)
        heads = tstarts[:-1]
        is_single = seg_count == 1
        single_rows = heads[is_single]
        single_rows = single_rows[df[single_rows] >= self.min_df]
        singles = (
            g.take(pa.array(single_rows)).select(
                [f.name for f in _ENCODED_SCHEMA]
            )
            if len(single_rows)
            else None
        )
        merged = None
        multi_heads = heads[~is_single]
        if len(multi_heads):
            # every row of every multi-segment term, in (term, min_doc)
            # order — all segments decode in ONE vectorized pass, dl lower
            # bounds expand from run pairs, and the merged lists re-encode
            # in ONE encode_segments_many call (merging IS concatenation:
            # doc ranges of a term's segments are disjoint ascending)
            row_term = np.repeat(np.arange(len(seg_count)), seg_count)
            rows_multi = np.flatnonzero((~is_single)[row_term])
            bufs = g["postings"].to_pandas().to_numpy(dtype=object)[rows_multi]
            dfs_m = df[rows_multi]
            doc, tf, seg_starts = decode_segments_many(
                bufs, dfs_m, self.block_size
            )
            bmin = g["block_min_dl"].combine_chunks()
            offs = bmin.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = bmin.flatten().to_numpy(zero_copy_only=False)
            row_min = np.minimum.reduceat(flat, offs[:-1] - offs[0])
            if has_runs:
                runs_col = g["dl_runs"].to_pandas().to_numpy(dtype=object)
                pairs = [
                    np.asarray(runs_col[ri], dtype=np.int64)
                    if runs_col[ri] is not None and len(runs_col[ri]) > 0
                    else np.array([df[ri], row_min[ri]], dtype=np.int64)
                    for ri in rows_multi
                ]
                rp = np.concatenate(pairs).reshape(-1, 2)
            else:
                rp = np.column_stack([dfs_m, row_min[rows_multi]])
            dl = np.repeat(rp[:, 1], rp[:, 0])
            mrow_bounds = np.concatenate(
                [[0], np.cumsum(seg_count[~is_single])]
            )
            merged = encode_segments_many(
                lang[multi_heads], term[multi_heads],
                np.zeros(len(multi_heads), dtype=np.int64),
                doc, tf, dl, seg_starts[mrow_bounds], self.block_size,
            )
            if self.min_df > 1:
                merged = merged.filter(
                    pc.greater_equal(merged["df"], self.min_df)
                )
        out_parts = [t for t in (singles, merged) if t is not None]
        if not out_parts:
            return _empty_final()
        out = pa.concat_tables([t.drop_columns(["salt"]) for t in out_parts])
        return out.drop_columns(["min_doc"])


_INTERMEDIATE_SCHEMA = pa.schema(
    list(_ENCODED_SCHEMA) + [("dl_runs", pa.list_(pa.int64()))]
)


def add_gsalt(batch: pa.Table, fanout: int) -> pa.Table:
    """Coarsen the doc-range salt for one hierarchical merge round:
    segments whose salts fall in the same ``salt // fanout`` bucket merge
    together this round."""
    salt = batch["salt"].to_numpy(zero_copy_only=False)
    out = batch
    if "gsalt" in out.column_names:
        out = out.drop_columns(["gsalt"])
    return out.append_column(
        "gsalt", pa.array(salt // fanout, pa.int64())
    )


class IntermediateMerge:
    """One hierarchical merge round (SCALE.md: tree of (term, range-bucket)
    rounds for terms whose merged list exceeds a task budget).

    Group = kpart over (lang, term, gsalt). Sections with ONE row pass
    through untouched (only salt coarsens) — so cold terms are never
    re-encoded and stay byte-identical to the flat path. Sections with ≥2
    rows concatenate in min_doc order into one segment whose per-doc dl
    lower bounds are carried as run-length ``dl_runs`` (one run per
    ORIGINAL source segment), making the tree merge associative and the
    final output byte-identical to the single-round flat merge."""

    def __init__(self, block_size: int = 128):
        self.block_size = block_size

    def __call__(self, group: pa.Table) -> pa.Table:
        if "kpart" in group.column_names:
            group = group.drop_columns(["kpart"])
        n = group.num_rows
        if n == 0:
            return pa.table(
                {f.name: pa.array([], f.type) for f in _INTERMEDIATE_SCHEMA},
                schema=_INTERMEDIATE_SCHEMA,
            )
        has_runs = "dl_runs" in group.column_names
        lang = np.asarray(group["lang"].to_pandas(), dtype=object)
        term = np.asarray(group["term"].to_pandas(), dtype=object)
        gsalt = group["gsalt"].to_numpy(zero_copy_only=False)
        min_doc = group["min_doc"].to_numpy(zero_copy_only=False)
        lcodes = pd.factorize(lang, sort=True)[0]
        tcodes = pd.factorize(term, sort=True)[0]
        order = np.lexsort((min_doc, gsalt, tcodes, lcodes))
        g = group.take(pa.array(order))
        lang, term, gsalt = lang[order], term[order], gsalt[order]
        lcodes, tcodes = lcodes[order], tcodes[order]
        df = g["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        change = (
            (tcodes[1:] != tcodes[:-1])
            | (lcodes[1:] != lcodes[:-1])
            | (gsalt[1:] != gsalt[:-1])
        )
        tstarts = np.concatenate([[0], np.flatnonzero(change) + 1, [n]])
        seg_count = np.diff(tstarts)
        heads = tstarts[:-1]
        is_single = seg_count == 1
        runs_col = (
            g["dl_runs"].to_pandas().to_numpy(dtype=object)
            if has_runs
            else None
        )

        def _row_runs_list(ri) -> list:
            if runs_col is not None:
                r = runs_col[ri]
                if r is not None and len(r) > 0:
                    return [int(x) for x in r]
            return []

        # --- passthrough sections: take rows untouched (cold terms are
        # never re-encoded and stay byte-identical to the flat path);
        # only salt coarsens to gsalt
        srows = heads[is_single]
        singles = None
        if len(srows):
            st = g.take(pa.array(srows)).select(
                [f.name for f in _ENCODED_SCHEMA]
            )
            st = st.set_column(
                st.schema.get_field_index("salt"),
                "salt",
                pa.array(gsalt[srows].astype(np.int64), pa.int64()),
            )
            s_runs = pa.array(
                [_row_runs_list(ri) for ri in srows], pa.list_(pa.int64())
            )
            singles = st.append_column("dl_runs", s_runs)
        # --- multi sections: ONE vectorized decode of every segment, dl
        # lower bounds expanded from run pairs, ONE re-encode; the merged
        # section's dl_runs = its source rows' run pairs concatenated
        merged = None
        multi_heads = heads[~is_single]
        if len(multi_heads):
            row_sec = np.repeat(np.arange(len(seg_count)), seg_count)
            rows_multi = np.flatnonzero((~is_single)[row_sec])
            bufs = g["postings"].to_pandas().to_numpy(dtype=object)[rows_multi]
            dfs_m = df[rows_multi]
            doc, tf, seg_starts = decode_segments_many(
                bufs, dfs_m, self.block_size
            )
            bmin = g["block_min_dl"].combine_chunks()
            offs = bmin.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = bmin.flatten().to_numpy(zero_copy_only=False)
            row_min = np.minimum.reduceat(flat, offs[:-1] - offs[0])
            pairs = [
                np.asarray(r, dtype=np.int64)
                if (r := (_row_runs_list(ri) or None)) is not None
                else np.array([df[ri], row_min[ri]], dtype=np.int64)
                for ri in rows_multi
            ]
            rp = np.concatenate(pairs).reshape(-1, 2)
            dl = np.repeat(rp[:, 1], rp[:, 0])
            mrow_bounds = np.concatenate(
                [[0], np.cumsum(seg_count[~is_single])]
            )
            merged = encode_segments_many(
                lang[multi_heads], term[multi_heads],
                gsalt[multi_heads].astype(np.int64),
                doc, tf, dl, seg_starts[mrow_bounds], self.block_size,
            )
            # merged dl_runs: per section, concat of its rows' run pairs
            pair_counts = np.fromiter(
                (p.size for p in pairs), dtype=np.int64, count=len(pairs)
            )
            run_flat = np.concatenate(pairs)
            # pairs are per multi ROW; sum counts per section
            sec_of_mrow = np.repeat(
                np.arange(len(multi_heads)), seg_count[~is_single]
            )
            sec_counts = np.bincount(
                sec_of_mrow, weights=pair_counts, minlength=len(multi_heads)
            ).astype(np.int64)
            loff = pa.array(
                np.concatenate([[0], np.cumsum(sec_counts)]).astype(np.int32),
                pa.int32(),
            )
            m_runs = pa.ListArray.from_arrays(
                loff, pa.array(run_flat, pa.int64())
            )
            merged = merged.append_column("dl_runs", m_runs)
        out_parts = [t for t in (singles, merged) if t is not None]
        out = pa.concat_tables(out_parts)
        return out.select([f.name for f in _INTERMEDIATE_SCHEMA])


def intermediate_merge_group(group: pa.Table, block_size: int = 128) -> pa.Table:
    """Plain-task wrapper for :class:`IntermediateMerge` — merge rounds run
    as ELASTIC tasks, not actor pools: with one pool per round chained
    behind the tokenize/assign pools, the pools' CPU reservations starve
    the streaming executor at small CPU counts (round-1 lesson)."""
    return IntermediateMerge(block_size)(group)


def _empty_encoded() -> pa.Table:
    return pa.table(
        {f.name: pa.array([], f.type) for f in _ENCODED_SCHEMA},
        schema=_ENCODED_SCHEMA,
    )


def _block_meta(doc_ids, tfs, dls, block_size):
    nb = (len(doc_ids) + block_size - 1) // block_size
    last, max_tf, min_dl = [], [], []
    for b in range(nb):
        s, e = b * block_size, min((b + 1) * block_size, len(doc_ids))
        last.append(int(doc_ids[e - 1]))
        max_tf.append(int(tfs[s:e].max()))
        min_dl.append(int(dls[s:e].min()))
    return last, max_tf, min_dl


def _empty_final() -> pa.Table:
    return (
        pa.table(
            {f.name: pa.array([], f.type) for f in _ENCODED_SCHEMA}
        ).drop_columns(["salt", "min_doc"])
    )
