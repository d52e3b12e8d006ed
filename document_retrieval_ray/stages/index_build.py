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
- ``encode_term_group``  sort by doc_id → delta-gap varbyte encode → per
                    128-posting block-max metadata (last_doc, max_tf,
                    min_dl) for WAND pruning.
- ``MergeSegments`` stateful actor-pool merger: concatenates a hot term's
                    encoded doc-range segments into the final posting list
                    (single-segment terms pass through without decode).
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
    """Per-(lang, part) group: assign dense doc ids, side-write docmap,
    emit posting triples (lang, term, doc_id, dl, tf)."""

    def __init__(self, offsets: dict, docmap_dir: str):
        # offsets: {(lang, part): first dense doc_id of this partition}
        self.offsets = offsets
        self.docmap_dir = docmap_dir

    def __call__(self, group: pa.Table) -> pa.Table:
        lang = group["lang"][0].as_py()
        part = group["part"][0].as_py()
        order = np.argsort(np.asarray(group["url"].to_pandas(), dtype=object), kind="stable")
        group = group.take(pa.array(order))
        base = self.offsets[(lang, int(part))]
        n = group.num_rows
        doc_ids = np.arange(base, base + n, dtype=np.int64)

        self._write_docmap(lang, int(part), group, doc_ids)

        parent, terms = flatten_tokens(group)
        if len(terms) == 0:
            return _empty_triples()
        df = pd.DataFrame({"row": parent, "term": terms})
        counted = df.groupby(["row", "term"], sort=False).size().reset_index(name="tf")
        rows = counted["row"].to_numpy()
        dls = group["dl"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lang": pa.array(np.repeat(lang, len(rows)), pa.string()),
                "term": pa.array(counted["term"].to_numpy(), pa.string()),
                "doc_id": pa.array(doc_ids[rows], pa.int64()),
                "dl": pa.array(dls[rows], pa.int64()),
                "tf": pa.array(counted["tf"].to_numpy(), pa.int64()),
            }
        )

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
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        os.close(fd)
        try:
            pq.write_table(table, tmp)
            os.replace(tmp, final)  # idempotent under task retry
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)


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


class AddSalt:
    """Add doc-range salt sub-keys for hot terms (broadcast hot set)."""

    def __init__(self, hot_terms_ref, salt_shift: int):
        import ray

        # one object-store fetch per actor, not per batch
        self.hot = (
            ray.get(hot_terms_ref) if hot_terms_ref is not None else frozenset()
        )
        self.shift = salt_shift

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch["term"].to_pandas(), dtype=object)
        langs = np.asarray(batch["lang"].to_pandas(), dtype=object)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        salt = np.zeros(len(terms), dtype=np.int64)
        if self.hot:
            mask = np.fromiter(
                ((l, t) in self.hot for l, t in zip(langs, terms)),
                dtype=bool,
                count=len(terms),
            )
            salt[mask] = doc_ids[mask] >> self.shift
        return batch.append_column("salt", pa.array(salt, pa.int64()))


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


def _block_meta(doc_ids, tfs, dls, block_size):
    nb = (len(doc_ids) + block_size - 1) // block_size
    last, max_tf, min_dl = [], [], []
    for b in range(nb):
        s, e = b * block_size, min((b + 1) * block_size, len(doc_ids))
        last.append(int(doc_ids[e - 1]))
        max_tf.append(int(tfs[s:e].max()))
        min_dl.append(int(dls[s:e].min()))
    return last, max_tf, min_dl


def encode_term_group(group: pa.Table, block_size: int = 128) -> pa.Table:
    """One (lang, term, salt) group of triples → one encoded segment row."""
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False)
    tfs = group["tf"].to_numpy(zero_copy_only=False)
    dls = group["dl"].to_numpy(zero_copy_only=False)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
    buf, block_off = encode_blocked_postings(doc_ids, tfs, block_size)
    last, max_tf, min_dl = _block_meta(doc_ids, tfs, dls, block_size)
    return pa.table(
        {
            "lang": group["lang"].slice(0, 1),
            "term": group["term"].slice(0, 1),
            "salt": group["salt"].slice(0, 1),
            "df": pa.array([len(doc_ids)], pa.int64()),
            "cf": pa.array([int(tfs.sum())], pa.int64()),
            "min_doc": pa.array([int(doc_ids[0])], pa.int64()),
            "postings": pa.array([buf], pa.binary()),
            "block_off": pa.array([block_off], pa.list_(pa.int64())),
            "block_last": pa.array([last], pa.list_(pa.int64())),
            "block_max_tf": pa.array([max_tf], pa.list_(pa.int64())),
            "block_min_dl": pa.array([min_dl], pa.list_(pa.int64())),
        },
        schema=_ENCODED_SCHEMA,
    )


class MergeSegments:
    """Actor-pool merger: (lang, term) group of encoded segments → final row.

    Hot-term segments are disjoint ascending doc-id ranges (salt = doc_id
    >> shift), so merging = decode each in salt order, concatenate,
    re-encode. Single-segment groups pass through untouched (no decode).
    """

    def __init__(self, block_size: int = 128, min_df: int = 1):
        self.block_size = block_size
        self.min_df = min_df

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            if self.min_df > 1 and group["df"][0].as_py() < self.min_df:
                return _empty_final()
            out = group
        else:
            order = np.argsort(group["min_doc"].to_numpy(zero_copy_only=False))
            group = group.take(pa.array(order))
            all_docs, all_tfs = [], []
            all_dls = []
            for row in range(group.num_rows):
                df = group["df"][row].as_py()
                d, t = decode_blocked_postings(
                    group["postings"][row].as_py(),
                    group["block_off"][row].as_py(),
                    df,
                    self.block_size,
                )
                all_docs.append(d.astype(np.int64))
                all_tfs.append(t.astype(np.int64))
                # per-block min_dl preserved approximately on merge: reuse
                # the segment-level min for each posting's block bound
                # (smaller-than-true dl only LOOSENS the WAND upper bound —
                # still safe)
                seg_min = min(group["block_min_dl"][row].as_py())
                all_dls.append(np.full(len(d), seg_min, dtype=np.int64))
            doc_ids = np.concatenate(all_docs)
            tfs = np.concatenate(all_tfs)
            dls = np.concatenate(all_dls)
            if self.min_df > 1 and len(doc_ids) < self.min_df:
                return _empty_final()
            buf, block_off = encode_blocked_postings(doc_ids, tfs, self.block_size)
            last, max_tf, min_dl = _block_meta(doc_ids, tfs, dls, self.block_size)
            out = pa.table(
                {
                    "lang": group["lang"].slice(0, 1),
                    "term": group["term"].slice(0, 1),
                    "salt": pa.array([0], pa.int64()),
                    "df": pa.array([len(doc_ids)], pa.int64()),
                    "cf": pa.array([int(tfs.sum())], pa.int64()),
                    "min_doc": pa.array([int(doc_ids[0])], pa.int64()),
                    "postings": pa.array([buf], pa.binary()),
                    "block_off": pa.array([block_off], pa.list_(pa.int64())),
                    "block_last": pa.array([last], pa.list_(pa.int64())),
                    "block_max_tf": pa.array([max_tf], pa.list_(pa.int64())),
                    "block_min_dl": pa.array([min_dl], pa.list_(pa.int64())),
                },
                schema=_ENCODED_SCHEMA,
            )
        return out.drop_columns(["salt", "min_doc"])


def _empty_final() -> pa.Table:
    return (
        pa.table(
            {f.name: pa.array([], f.type) for f in _ENCODED_SCHEMA}
        ).drop_columns(["salt", "min_doc"])
    )
