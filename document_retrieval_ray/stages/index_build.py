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
import pyarrow.parquet as pq

from ..functions.hashing import stable_hash64
from ..functions.varbyte import decode_blocked_postings, encode_blocked_postings
from .tokenize import flatten_tokens


def add_part(batch: pa.Table, num_parts: int) -> pa.Table:
    urls = batch["url"].to_pylist()
    parts = np.fromiter(
        (stable_hash64(u) % num_parts for u in urls), dtype=np.int64, count=len(urls)
    )
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
            # computed upstream — just flatten, no per-group groupby
            rows, terms = _flatten_list_col(group["terms"])
            _, tf_vals = _flatten_list_col(group["tfs"], as_object=False)
            tfs_arr = tf_vals
        else:
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
        if self.df_dir is not None:
            self._write_df_partial(lang, int(part), terms)
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
            lang, int(part), np.asarray(terms, dtype=object), doc_ids[rows],
            dls[rows], np.asarray(tfs_arr)
        )

    def _emit_segments(self, lang, part, term, doc_id, dl, tf) -> pa.Table:
        order = np.lexsort((doc_id, term))
        term, doc_id, dl, tf = term[order], doc_id[order], dl[order], tf[order]
        n = len(term)
        change = term[1:] != term[:-1]
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        ends = np.concatenate([starts[1:], [n]])
        cols = {f.name: [] for f in _ENCODED_SCHEMA}
        for s, e in zip(starts, ends):
            _append_segment_row(cols, lang, term[s], part, doc_id[s:e],
                                tf[s:e], dl[s:e], self.block_size)
        return pa.table(
            {f.name: pa.array(cols[f.name], f.type) for f in _ENCODED_SCHEMA},
            schema=_ENCODED_SCHEMA,
        )

    def _write_df_partial(self, lang: str, part: int, terms) -> None:
        """``terms`` is the flattened unique-(doc, term) pair list, so its
        value counts ARE this partition's document frequencies. Written
        atomically (dot-prefixed temp + rename, idempotent under retry)
        like the docmap side-writes."""
        codes, uniq = pd.factorize(np.asarray(terms, dtype=object), sort=True)
        counts = np.bincount(codes, minlength=len(uniq))
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
    return batch.append_column(
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
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [n]])
    cols = {f.name: [] for f in _ENCODED_SCHEMA}
    for s, e in zip(starts, ends):
        v = int(vid[s])
        _append_segment_row(cols, lang_arr[v], term_arr[v], salt[s],
                            doc_id[s:e], tf[s:e], dl[s:e], block_size)
    return pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in _ENCODED_SCHEMA},
        schema=_ENCODED_SCHEMA,
    )


def encode_partition(group: pa.Table, block_size: int = 128) -> pa.Table:
    """One kpart group (MANY whole (lang, term, salt) segments) → encoded
    segment rows, vectorized: one sort, numpy boundary detection, a single
    output table. Replaces per-term map_groups (5 ms/group of Arrow and
    scheduling overhead at one row per group). Plain task — stateless."""
    pdf = group.to_pandas()
    pdf = pdf.sort_values(["lang", "term", "salt", "doc_id"], kind="mergesort")
    lang = pdf["lang"].to_numpy(dtype=object)
    term = pdf["term"].to_numpy(dtype=object)
    salt = pdf["salt"].to_numpy()
    doc_id = pdf["doc_id"].to_numpy()
    tf = pdf["tf"].to_numpy()
    dl = pdf["dl"].to_numpy()
    n = len(pdf)
    if n == 0:
        return _empty_encoded()
    change = (
        (term[1:] != term[:-1]) | (lang[1:] != lang[:-1]) | (salt[1:] != salt[:-1])
    )
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [n]])
    cols = {f.name: [] for f in _ENCODED_SCHEMA}
    for s, e in zip(starts, ends):
        _append_segment_row(cols, lang[s], term[s], salt[s], doc_id[s:e],
                            tf[s:e], dl[s:e], block_size)
    return pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in _ENCODED_SCHEMA},
        schema=_ENCODED_SCHEMA,
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
        pdf = group.to_pandas()
        has_runs = "dl_runs" in pdf.columns
        pdf = pdf.sort_values(["lang", "term", "min_doc"], kind="mergesort")
        lang = pdf["lang"].to_numpy(dtype=object)
        term = pdf["term"].to_numpy(dtype=object)
        n = len(pdf)
        if n == 0:
            return _empty_final()
        change = (term[1:] != term[:-1]) | (lang[1:] != lang[:-1])
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        ends = np.concatenate([starts[1:], [n]])
        keep_single = []
        merged_rows = {k: [] for k in (
            "lang", "term", "df", "cf", "min_doc", "postings",
            "block_off", "block_last", "block_max_tf", "block_min_dl",
        )}
        for s, e in zip(starts, ends):
            if e - s == 1:
                if pdf["df"].iloc[s] >= self.min_df:
                    keep_single.append(pdf.index[s])
                continue
            docs, tfs, dls = [], [], []
            for i in range(s, e):
                row = pdf.iloc[i]
                d, t = decode_blocked_postings(
                    row["postings"], list(row["block_off"]), int(row["df"]),
                    self.block_size,
                )
                docs.append(d.astype(np.int64))
                tfs.append(t.astype(np.int64))
                dls.append(_row_dl_lower(row))
            doc_ids = np.concatenate(docs)
            tf = np.concatenate(tfs)
            dl = np.concatenate(dls)
            if len(doc_ids) < self.min_df:
                continue
            buf, block_off = encode_blocked_postings(doc_ids, tf, self.block_size)
            last, max_tf, min_dl = _block_meta(doc_ids, tf, dl, self.block_size)
            merged_rows["lang"].append(lang[s])
            merged_rows["term"].append(term[s])
            merged_rows["df"].append(len(doc_ids))
            merged_rows["cf"].append(int(tf.sum()))
            merged_rows["min_doc"].append(int(doc_ids[0]))
            merged_rows["postings"].append(buf)
            merged_rows["block_off"].append(block_off)
            merged_rows["block_last"].append(last)
            merged_rows["block_max_tf"].append(max_tf)
            merged_rows["block_min_dl"].append(min_dl)
        singles_pdf = pdf.loc[keep_single]
        if has_runs:
            singles_pdf = singles_pdf.drop(columns=["dl_runs"])
        singles = (
            pa.Table.from_pandas(singles_pdf, preserve_index=False,
                                 schema=_ENCODED_SCHEMA)
            if keep_single
            else None
        )
        fields = [f for f in _ENCODED_SCHEMA if f.name != "salt"]
        merged = pa.table(
            {f.name: pa.array(merged_rows[f.name], f.type) for f in fields},
            schema=pa.schema(fields),
        )
        out_parts = []
        if singles is not None:
            out_parts.append(singles.drop_columns(["salt"]))
        out_parts.append(merged)
        out = pa.concat_tables(out_parts)
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
        pdf = group.to_pandas()
        if "dl_runs" not in pdf.columns:
            pdf["dl_runs"] = [None] * len(pdf)
        if len(pdf) == 0:
            return pa.table(
                {f.name: pa.array([], f.type) for f in _INTERMEDIATE_SCHEMA},
                schema=_INTERMEDIATE_SCHEMA,
            )
        pdf = pdf.sort_values(["lang", "term", "gsalt", "min_doc"],
                              kind="mergesort")
        lang = pdf["lang"].to_numpy(dtype=object)
        term = pdf["term"].to_numpy(dtype=object)
        gsalt = pdf["gsalt"].to_numpy()
        n = len(pdf)
        change = (
            (term[1:] != term[:-1])
            | (lang[1:] != lang[:-1])
            | (gsalt[1:] != gsalt[:-1])
        )
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        ends = np.concatenate([starts[1:], [n]])
        cols = {f.name: [] for f in _INTERMEDIATE_SCHEMA}
        for s, e in zip(starts, ends):
            if e - s == 1:
                # passthrough: never re-encode a lone segment (keeps cold
                # terms byte-identical to the flat path)
                row = pdf.iloc[s]
                runs = row["dl_runs"]
                cols["lang"].append(lang[s])
                cols["term"].append(term[s])
                cols["salt"].append(int(gsalt[s]))
                cols["df"].append(int(row["df"]))
                cols["cf"].append(int(row["cf"]))
                cols["min_doc"].append(int(row["min_doc"]))
                cols["postings"].append(row["postings"])
                cols["block_off"].append(list(row["block_off"]))
                cols["block_last"].append(list(row["block_last"]))
                cols["block_max_tf"].append(list(row["block_max_tf"]))
                cols["block_min_dl"].append(list(row["block_min_dl"]))
                cols["dl_runs"].append(
                    list(np.asarray(runs, np.int64))
                    if runs is not None and len(runs)
                    else []
                )
                continue
            docs, tfs, runs = [], [], []
            for i in range(s, e):
                row = pdf.iloc[i]
                d, t = decode_blocked_postings(
                    row["postings"], list(row["block_off"]), int(row["df"]),
                    self.block_size,
                )
                docs.append(d.astype(np.int64))
                tfs.append(t.astype(np.int64))
                runs.extend(_row_dl_runs(row))
            d = np.concatenate(docs)
            t = np.concatenate(tfs)
            r = np.asarray(runs, dtype=np.int64).reshape(-1, 2)
            dl = np.repeat(r[:, 1], r[:, 0])
            _append_segment_row(cols, lang[s], term[s], gsalt[s], d, t, dl,
                                self.block_size)
            cols["dl_runs"].append(runs)
        return pa.table(
            {f.name: pa.array(cols[f.name], f.type) for f in _INTERMEDIATE_SCHEMA},
            schema=_INTERMEDIATE_SCHEMA,
        )


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
