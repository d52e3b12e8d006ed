"""Incremental (generational) index maintenance — append + compact.

The reference rebuilds its pickle index from scratch whenever the corpus
changes (final_implementation.py re-runs the full loop; resume is only
``os.path.exists`` on finished artifacts). At 10^12 docs a daily crawl
delta must NOT re-tokenize the other 10^12 documents, so this module adds
the Lucene-style segment model on top of ``build_index``:

- an index directory owns a BASE build plus zero or more GENERATIONS
  (``generations/gen-00001``, …), each itself a complete ``build_index``
  output over its delta corpus with its own local doc-id space;
- ``append_index`` builds the next generation and refreshes the global
  df artifact — the only shared state, vocabulary-sized, rebuilt by one
  groupby over the per-generation df tables;
- ``bm25_search_incremental`` serves base+generations through the
  doc-range-sharded scorer (pipelines/sharded.py) with global (N, avgdl,
  df) — rank-identical to a full rebuild because BM25 depends on per-doc
  (tf, dl) and GLOBAL corpus statistics only, all order-independent sums
  over the document set (tested);
- ``compact_index`` physically merges the generations into one fresh
  single-shard index (per-term posting concatenation in generation
  order after doc-id rebasing — the same associative doc-range merge the
  build's segment tree uses), bounding the per-query fan-out again.

Commit protocol: a generation becomes visible only when
``generations.json`` is atomically replaced (temp file + rename), which
happens AFTER the generation's own per-lang manifests and the new global
df version are durably written. A crash mid-append leaves the previous
json pointing at the previous consistent view; re-running the append
resumes the generation build (committed langs skip by fingerprint) and
then commits.

Cosine norms under append: per-doc TF-IDF norms bake in GLOBAL idf, so
an append makes every older document's stored norm stale for the merged
corpus. Appends are therefore allowed over a norms-built base, but the
base's ``norms/`` artifact must not be served against the merged corpus
— ``compact_index`` REBUILDS the norms from the compacted postings +
merged df (decoded triples through the same ``_build_cosine_norms``
kernels the fresh build uses), producing an index whose cosine results
equal a full rebuild (tested). BM25 and query-time tf-idf scoring have
no per-doc global state and append exactly.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import BM25Config, IndexConfig, TokenizerConfig
from ..functions.varbyte import decode_segments_many
from ..state.manifest import read_manifest
from ..stages.index_build import _ENCODED_SCHEMA, add_kpart, encode_segments_many
from ..util import default_pool, from_pandas_clean
from .build_index import build_index
from .sharded import bm25_search_sharded, build_global_df

GENERATIONS_JSON = "generations.json"

_POSTING_COLS = [
    "term", "df", "cf", "postings", "block_off", "block_last",
    "block_max_tf", "block_min_dl",
]


def read_generations(index_dir: str) -> dict:
    p = os.path.join(index_dir, GENERATIONS_JSON)
    if not os.path.exists(p):
        return {"generations": [], "global_df": None}
    with open(p) as f:
        g = json.load(f)
    if not g.get("committed"):
        return {"generations": [], "global_df": None}
    return g


def _write_generations(index_dir: str, payload: dict) -> None:
    payload = dict(payload)
    payload["committed"] = True
    fd, tmp = tempfile.mkstemp(dir=index_dir, suffix=".generations.tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(index_dir, GENERATIONS_JSON))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def shard_dirs(index_dir: str) -> list:
    """Base + committed generations, in doc-id (generation) order."""
    g = read_generations(index_dir)
    return [index_dir] + [
        os.path.join(index_dir, "generations", name) for name in g["generations"]
    ]


def _langs_of(d: str) -> list:
    mdir = os.path.join(d, "manifests")
    return sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []


def _base_config(index_dir: str) -> IndexConfig:
    """Reconstruct the build config from any base-lang manifest so a
    generation tokenizes/encodes EXACTLY like the base (a mismatch would
    silently miss vocabulary at query time)."""
    langs = _langs_of(index_dir)
    if not langs:
        raise FileNotFoundError(f"no committed manifests under {index_dir}")
    m = read_manifest(os.path.join(index_dir, "manifests", langs[0]))
    tok = TokenizerConfig(
        mode=m.get("tokenizer_mode", "simple"),
        stopwords=bool(m.get("tokenizer_stopwords", False)),
        min_token_len=int(m.get("tokenizer_min_token_len", 1)),
        bigram_langs=tuple(m.get("tokenizer_bigram_langs", ())),
    )
    return IndexConfig(
        tokenizer=tok,
        block_size=int(m.get("block_size", 128)),
        num_hash_parts=int(m.get("num_hash_parts", 64)),
        hot_term_threshold=int(m.get("hot_term_threshold", 100_000)),
        salt_shift=int(m.get("salt_shift", 16)),
    )


def _has_norms(dirs) -> bool:
    """True when any shard's manifest says it was built with cosine
    norms — the compaction-time signal to rebuild the norms artifact
    over the merged corpus (stored norms bake in global idf, which
    appends and deletes both change)."""
    for d in dirs:
        for lang in _langs_of(d):
            m = read_manifest(os.path.join(d, "manifests", lang))
            if m is not None and m.get("with_cosine_norms"):
                return True
    return False


def append_index(
    new_input,
    index_dir: str,
    *,
    cfg: IndexConfig = None,
    extract_html: bool = False,
    input_ds_factory=None,
    tokenize_concurrency=None,
) -> dict:
    """Build the next generation over ``new_input`` and commit it.

    Returns the new generation's per-lang manifests. The caller is
    responsible for delta hygiene (a url present in both base and delta
    becomes two documents — run the dedup operators upstream)."""
    dirs = shard_dirs(index_dir)
    if cfg is None:
        cfg = _base_config(index_dir)
    g = read_generations(index_dir)
    gen_name = f"gen-{len(g['generations']) + 1:05d}"
    gen_dir = os.path.join(index_dir, "generations", gen_name)
    manifests = build_index(
        new_input,
        gen_dir,
        cfg=cfg,
        extract_html=extract_html,
        with_cosine_norms=False,
        input_ds_factory=input_ds_factory,
        tokenize_concurrency=tokenize_concurrency,
    )
    # refresh the global df into a fresh versioned dir; the generations
    # json commit (below) is what makes it visible
    df_version = f"global_df/v{len(g['generations']) + 1:04d}"
    build_global_df(dirs + [gen_dir], os.path.join(index_dir, df_version))
    _write_generations(
        index_dir,
        {
            "generations": g["generations"] + [gen_name],
            "global_df": df_version,
        },
    )
    return manifests


def bm25_search_incremental(
    queries: ray.data.Dataset,
    index_dir: str,
    cfg: BM25Config = BM25Config(),
    tokenizer: TokenizerConfig = None,
    round_dp=4,
    concurrency=None,
    tombstones_dir=None,
) -> ray.data.Dataset:
    """BM25 over base + generations, rank-identical to a full rebuild
    (global N/avgdl/df via the sharded scorer). ``tombstones_dir=None``
    auto-detects ``<index_dir>/tombstones`` (pipelines.deletes); pass
    ``False`` to serve the raw index."""
    g = read_generations(index_dir)
    if not g["generations"]:
        raise FileNotFoundError(
            f"{index_dir} has no committed generations — use "
            "pipelines.query.bm25_search for a plain index"
        )
    if tokenizer is None:
        tokenizer = _base_config(index_dir).tokenizer
    if tombstones_dir is None:
        cand = os.path.join(index_dir, "tombstones")
        tombstones_dir = cand if os.path.isdir(cand) else False
    return bm25_search_sharded(
        queries,
        shard_dirs(index_dir),
        os.path.join(index_dir, g["global_df"]),
        cfg=cfg,
        tokenizer=tokenizer,
        round_dp=round_dp,
        concurrency=concurrency,
        tombstones_dir=tombstones_dir or None,
    )


# ------------------------------------------------------------- compaction


def _read_sized(path, columns, rows_per_block: int = 50_000,
                lo: int = 1, hi: int = 256):
    """read_parquet with a DATA-sized block count (footer row counts):
    Ray's default fan-out is CPU-sized, which turns a toy artifact into
    hundreds of near-empty scheduling tasks (measured: 5.5 s to count
    155 rows through a 7-dataset union). Returns (Dataset, total_rows).
    At scale the clamp is inert — blocks grow with the data."""
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    blocks = max(lo, min(hi, total // rows_per_block + 1))
    return (
        ray.data.read_parquet(
            path, columns=columns, override_num_blocks=blocks
        ),
        total,
    )


def _lang_offsets(dirs) -> dict:
    """{lang: [doc-id offset of dir i]} — cumulative n_docs in generation
    order; a dir without the lang contributes 0 docs."""
    langs = sorted({l for d in dirs for l in _langs_of(d)})
    out = {}
    for lang in langs:
        offs, acc = [], 0
        for d in dirs:
            offs.append(acc)
            m = read_manifest(os.path.join(d, "manifests", lang))
            acc += int(m["n_docs"]) if m is not None else 0
        out[lang] = offs
    return out


def compact_postings_partition(group: pd.DataFrame, offsets_by_lang: dict,
                               block_size: int,
                               deleted_ref=None) -> pa.Table:
    """One (lang, term)-hash partition of per-generation posting rows →
    final merged rows. Terms living only in generation 0 pass through
    byte-identical (offset 0, no decode); everything else decodes,
    rebases doc ids by its generation's offset, concatenates in
    generation order (disjoint ascending id ranges by construction) and
    re-encodes. Per-doc dl lower bounds carry at ORIGINAL-block
    granularity (repeat(block_min_dl, block counts)) — sound for WAND
    pruning, tighter than a segment-wide min.

    ``deleted_ref``: optional ObjectRef of {lang: sorted GLOBAL rebased
    doc ids} (pipelines.deletes tombstones). A lang carrying deletes
    loses its passthrough fast path — every term decodes, tombstoned
    postings are dropped, df is recounted from the survivors, and terms
    whose postings empty out vanish from the output (exactly a fresh
    build over the surviving corpus; tested)."""
    deleted_by_lang = ray.get(deleted_ref) if deleted_ref is not None else {}
    g = group.drop(columns=[c for c in ("kpart",) if c in group.columns])
    g = g.sort_values(["lang", "term", "src"], kind="mergesort")
    lang = g["lang"].to_numpy(dtype=object)
    term = g["term"].to_numpy(dtype=object)
    src = g["src"].to_numpy()
    n = len(g)
    if n == 0:
        return _empty_final_rows()
    change = (term[1:] != term[:-1]) | (lang[1:] != lang[:-1])
    tstarts = np.concatenate([[0], np.flatnonzero(change) + 1, [n]])
    seg_count = np.diff(tstarts)
    heads = tstarts[:-1]
    row_sec = np.repeat(np.arange(len(seg_count)), seg_count)
    # passthrough = a section that is ONE row living in generation 0
    is_pass = (seg_count == 1) & (src[heads] == 0)
    if deleted_by_lang:
        # a lang with tombstones must decode everything to filter
        lang_has_del = np.array(
            [lang[h] in deleted_by_lang for h in heads], dtype=bool
        )
        is_pass &= ~lang_has_del
    passthrough_idx = g.index.to_numpy()[heads[is_pass]]
    merged = _empty_final_rows()
    dec_heads = heads[~is_pass]
    if len(dec_heads):
        # all decode-sections' rows, vectorized: ONE decode pass, per-row
        # doc-id rebase by generation offset, dl lower bounds repeated at
        # ORIGINAL-block granularity, ONE re-encode over term boundaries
        rows_dec = np.flatnonzero((~is_pass)[row_sec])
        df_m = g["df"].to_numpy()[rows_dec].astype(np.int64)
        bufs = g["postings"].to_numpy()[rows_dec]
        doc, tf, seg_starts = decode_segments_many(bufs, df_m, block_size)
        offs = np.fromiter(
            (
                offsets_by_lang[lang[ri]][int(src[ri])]
                for ri in rows_dec
            ),
            dtype=np.int64,
            count=len(rows_dec),
        )
        doc = doc + np.repeat(offs, df_m)
        nb = (df_m + block_size - 1) // block_size
        bidx = np.arange(int(nb.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(nb) - nb, nb
        )
        counts = np.minimum(
            block_size, np.repeat(df_m, nb) - bidx * block_size
        )
        bmin_flat = np.concatenate(
            [
                np.asarray(x, dtype=np.int64)
                for x in g["block_min_dl"].to_numpy()[rows_dec]
            ]
        )
        dl = np.repeat(bmin_flat, counts)
        sec_bounds = np.concatenate([[0], np.cumsum(seg_count[~is_pass])])
        sec_langs = lang[dec_heads]
        sec_terms = term[dec_heads]
        starts = seg_starts[sec_bounds]
        if deleted_by_lang:
            from .deletes import in_sorted

            rows_per_sec = seg_count[~is_pass]
            sec_of_row = np.repeat(
                np.arange(rows_per_sec.size, dtype=np.int64), rows_per_sec
            )
            row_of_post = np.repeat(
                np.arange(len(rows_dec), dtype=np.int64), df_m
            )
            sec_of_post = sec_of_row[row_of_post]
            keep = np.ones(doc.size, dtype=bool)
            row_langs = lang[rows_dec]
            for lg, arr in deleted_by_lang.items():
                sel = (row_langs == lg)[row_of_post]
                if sel.any():
                    idx = np.flatnonzero(sel)
                    keep[idx[in_sorted(doc[idx], arr)]] = False
                    # dense renumbering: survivor's new id = old id minus
                    # the deleted ids below it (monotonic → ascending
                    # order inside each segment is preserved)
                    doc[idx] -= np.searchsorted(arr, doc[idx], side="right")
            surv = np.bincount(
                sec_of_post[keep], minlength=rows_per_sec.size
            )
            nonempty = surv > 0
            csum = np.concatenate([[0], np.cumsum(surv)])
            starts = np.concatenate([csum[:-1][nonempty], csum[-1:]])
            doc, tf, dl = doc[keep], tf[keep], dl[keep]
            sec_langs, sec_terms = sec_langs[nonempty], sec_terms[nonempty]
        if len(sec_langs):
            merged = encode_segments_many(
                sec_langs, sec_terms,
                np.zeros(len(sec_langs), dtype=np.int64),
                doc, tf, dl, starts, block_size,
            ).drop_columns(["salt", "min_doc"])
    parts = [merged]
    if len(passthrough_idx):
        pt = g.loc[passthrough_idx, ["lang"] + _POSTING_COLS]
        parts.append(
            from_pandas_clean(pt, preserve_index=False, schema=merged.schema)
        )
    return pa.concat_tables(parts)


def _empty_final_rows() -> pa.Table:
    fields = [f for f in _ENCODED_SCHEMA if f.name not in ("salt", "min_doc")]
    return pa.table(
        {f.name: pa.array([], f.type) for f in fields}, schema=pa.schema(fields)
    )


def compact_index(
    index_dir: str,
    out_dir: str,
    *,
    num_parts: int = 64,
    concurrency=None,
    tombstones_dir=None,
    with_cosine_norms=None,
) -> dict:
    """Physically merge base + generations into a single fresh index at
    ``out_dir`` (servable by the plain ``bm25_search``). Doc ids rebase
    to base-first generation order; scores are identical to a full
    rebuild (tested) though block boundaries may differ. Returns the new
    per-lang manifests.

    ``tombstones_dir=None`` auto-detects ``<index_dir>/tombstones``
    (pipelines.deletes); pass ``False`` to compact without applying
    deletes. With deletes applied the output is a fresh index over the
    SURVIVING corpus — postings filtered and re-encoded, df recounted,
    N/avgdl/total_tokens recomputed from the surviving docmap. The
    output carries no tombstones.

    ``with_cosine_norms=None`` (auto) REBUILDS the per-doc TF-IDF norms
    artifact when any source shard was built with norms: stored norms
    bake in global idf, which appends and deletes both change, so the
    source norms/ cannot be carried over — instead the compacted
    postings are decoded back to (lang, doc, term, tf) triples and run
    through the same ``_build_cosine_norms`` kernels the fresh build
    uses, against the merged df and the compacted corpus stats. Cosine
    results over the output then equal a full rebuild (tested). Pass
    ``True``/``False`` to force either way."""
    from .deletes import load_deleted, rebased_deleted_by_lang

    dirs = shard_dirs(index_dir)
    if tombstones_dir is None:
        cand = os.path.join(index_dir, "tombstones")
        tombstones_dir = cand if os.path.isdir(cand) else False
    deleted = load_deleted(tombstones_dir) if tombstones_dir else {}
    if len(dirs) == 1 and not deleted:
        raise FileNotFoundError(
            f"{index_dir} has no generations to compact and no tombstones"
            " to apply"
        )
    if with_cosine_norms is None:
        with_cosine_norms = _has_norms(dirs)
    offsets = _lang_offsets(dirs)
    langs = sorted(offsets)
    base_m = read_manifest(os.path.join(dirs[0], "manifests", _langs_of(dirs[0])[0]))
    block_size = int(base_m["block_size"])
    for d in dirs:
        for lang in _langs_of(d):
            m = read_manifest(os.path.join(d, "manifests", lang))
            if int(m["block_size"]) != block_size:
                raise ValueError("generations disagree on block_size")
    if concurrency is None:
        concurrency = default_pool(0.5)
    rebased = rebased_deleted_by_lang(deleted, offsets) if deleted else {}
    del_ref = ray.put(rebased) if rebased else None

    # --- docmap: rebase per generation, one streaming pass ---
    def _rebase(t: pa.Table, off: int, lang: str, dele=None,
                dele_global=None) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if dele is not None and dele.size:
            from .deletes import in_sorted

            t = t.filter(pa.array(~in_sorted(ids, dele)))
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ids = ids + off
        if dele_global is not None and dele_global.size:
            # dense renumbering (same mapping the postings compaction
            # applies): survivor id minus the deleted ids below it
            ids = ids - np.searchsorted(dele_global, ids, side="right")
        t = t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id", pa.array(ids, pa.int64())
        )
        return t.append_column("lang", pa.array([lang] * t.num_rows, pa.string()))

    # ONE hive read per source dir (lang is a partition column of the
    # docmap artifact) instead of a union of per-(dir, lang) datasets —
    # the per-dataset scheduling overhead dominated small compactions
    def _rebase_hive(t: pa.Table, si: int) -> pa.Table:
        parts = []
        langs_col = t["lang"].to_pylist()
        for lang in sorted(set(langs_col)):
            sub = t.filter(pc.equal(t["lang"], pa.scalar(lang)))
            sub = sub.drop_columns(["lang"])
            parts.append(_rebase(
                sub, off=offsets[str(lang)][si], lang=str(lang),
                dele=deleted.get((si, str(lang))),
                dele_global=rebased.get(str(lang)),
            ))
        return (
            pa.concat_tables(parts) if parts
            else _rebase(t.drop_columns(["lang"]), off=0, lang="")
        )

    dm_parts = []
    for si, d in enumerate(dirs):
        p = os.path.join(d, "docmap")
        if not os.path.isdir(p):
            continue
        ds, _ = _read_sized(p, ["doc_id", "url", "dl", "lang"])
        dm_parts.append(
            ds.map_batches(
                _rebase_hive, fn_kwargs={"si": si}, batch_format="pyarrow"
            )
        )
    dm = dm_parts[0]
    for extra in dm_parts[1:]:
        dm = dm.union(extra)
    dm.write_parquet(os.path.join(out_dir, "docmap"), partition_cols=["lang"])

    # --- postings: (lang, term)-hash partitions over all generations ---
    # one hive read per source dir (lang from the partition column); the
    # exchange width is sized to the data — 64 hash parts over a toy
    # vocabulary would pay 64 groups of scheduling for rows that fit in
    # a handful
    def _tag_hive(t: pa.Table, si: int) -> pa.Table:
        return t.append_column(
            "src", pa.array(np.full(t.num_rows, si, np.int64), pa.int64())
        )

    post_parts = []
    total_rows = 0
    for si, d in enumerate(dirs):
        p = os.path.join(d, "postings")
        if not os.path.isdir(p):
            continue
        ds, n = _read_sized(p, _POSTING_COLS + ["lang"], rows_per_block=4_000)
        total_rows += n
        post_parts.append(
            ds.map_batches(
                _tag_hive, fn_kwargs={"si": si}, batch_format="pyarrow"
            )
        )
    num_parts = min(num_parts, max(8, total_rows // 4_000 + 1))
    posts = post_parts[0]
    for extra in post_parts[1:]:
        posts = posts.union(extra)
    merged = (
        posts.map_batches(
            add_kpart, fn_kwargs={"num_parts": num_parts, "cols": ("lang", "term")},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(
            lambda g: compact_postings_partition(
                g, offsets, block_size, deleted_ref=del_ref
            ),
            batch_format="pandas",
        )
    )
    merged.write_parquet(os.path.join(out_dir, "postings"), partition_cols=["lang"])

    # --- df artifact ---
    if deleted:
        # recount from the compacted postings (the source df tables still
        # count tombstoned docs); vocabulary-sized read-back per lang
        for lang in langs:
            pp = os.path.join(out_dir, "postings", f"lang={lang}")
            op = os.path.join(out_dir, "df", f"lang={lang}")
            os.makedirs(op, exist_ok=True)
            if os.path.isdir(pp):
                t = pq.read_table(pp, columns=["term", "df"])
            else:
                t = pa.table({"term": pa.array([], pa.string()),
                              "df": pa.array([], pa.int64())})
            pq.write_table(t, os.path.join(op, "part-0.parquet"))
    else:
        # one vocabulary-sized merge of the source df tables
        build_global_df(dirs, os.path.join(out_dir, "df"))

    # --- per-lang stats: exact integer sums over source manifests ---
    from .build_index import _manifest_payload  # same payload shape
    from ..state.manifest import write_manifest

    cfg = _base_config(index_dir)
    surv_stats: dict = {}
    if deleted:
        # stats must reflect SURVIVORS: exact integer sums over the
        # compacted docmap — ONE distributed pass grouped by lang
        # (nothing corpus-sized on the driver), not a count+sum job pair
        # per language
        for r in (
            _read_sized(os.path.join(out_dir, "docmap"), ["dl", "lang"])[0]
            .groupby("lang")
            .aggregate(
                ray.data.aggregate.Count(alias_name="n_docs"),
                ray.data.aggregate.Sum("dl", alias_name="sum_dl"),
            )
            .take_all()  # bounded: one row per language
        ):
            surv_stats[str(r["lang"])] = (
                int(r["n_docs"]), int(r["sum_dl"] or 0)
            )
    stats_by_lang: dict = {}
    terms_by_lang: dict = {}
    fps_by_lang: dict = {}
    for lang in langs:
        n_docs = total_tokens = n_postings = 0
        fps = []
        for d in dirs:
            m = read_manifest(os.path.join(d, "manifests", lang))
            if m is None:
                continue
            n_docs += int(m["n_docs"])
            total_tokens += int(m["total_tokens"])
            fps.append(m["input_fingerprint"])
        if deleted:
            n_docs, total_tokens = surv_stats.get(lang, (0, 0))
            fps.append(f"deleted:{sum(v.size for v in deleted.values())}")
        dfp = os.path.join(out_dir, "df", f"lang={lang}")
        n_terms = 0
        if os.path.isdir(dfp):
            dft = pq.read_table(dfp, columns=["df"])
            n_terms = dft.num_rows
            n_postings = int(pc.sum(dft["df"]).as_py() or 0)
        stats_by_lang[lang] = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        }
        terms_by_lang[lang] = {"n_terms": n_terms, "n_postings": n_postings}
        fps_by_lang[lang] = fps

    # --- cosine norms: rebuilt over the COMPACTED corpus (never copied;
    # stored norms bake in the pre-append/pre-delete global idf) ---
    if with_cosine_norms:
        _rebuild_norms(out_dir, stats_by_lang, block_size)

    # --- manifests commit last: the shard is servable once these exist ---
    out_manifests = {}
    for lang in langs:
        payload = _manifest_payload(
            lang, "compact::" + ";".join(fps_by_lang[lang]),
            stats_by_lang[lang], terms_by_lang[lang], cfg, [],
            bool(with_cosine_norms), "compact",
        )
        write_manifest(os.path.join(out_dir, "manifests", str(lang)), payload)
        out_manifests[lang] = payload
    return out_manifests


def _rebuild_norms(out_dir: str, stats_by_lang: dict, block_size: int) -> None:
    """Per-doc TF-IDF norms over a compacted index: decode the compacted
    postings back into (lang, doc_id, term, tf) triples — a streaming
    map over posting rows, no extra corpus pass — and feed them through
    the fresh build's ``_build_cosine_norms`` (broadcast or (lang,term)
    cogroup, auto by vocabulary size) against the merged df/ artifact."""
    from .build_index import _build_cosine_norms

    def _decode(t: pa.Table) -> pa.Table:
        dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        bufs = t["postings"].to_numpy(zero_copy_only=False)
        doc, tf, _ = decode_segments_many(bufs, dfs, block_size)
        lang = np.repeat(
            np.asarray(t["lang"].to_pylist(), dtype=object), dfs
        )
        term = np.repeat(
            np.asarray(t["term"].to_pylist(), dtype=object), dfs
        )
        return pa.table({
            "lang": pa.array(lang, pa.string()),
            "doc_id": pa.array(doc, pa.int64()),
            "term": pa.array(term, pa.string()),
            "tf": pa.array(tf, pa.int64()),
        })

    pdir = os.path.join(out_dir, "postings")
    if not os.path.isdir(pdir):
        return
    posts, n = _read_sized(pdir, ["term", "df", "postings", "lang"],
                           rows_per_block=4_000)
    if n == 0:
        return
    triples = posts.map_batches(_decode, batch_format="pyarrow")
    d_out = {"df": os.path.join(out_dir, "df"),
             "norms": os.path.join(out_dir, "norms")}
    _build_cosine_norms(triples, d_out, stats_by_lang)
