"""End-to-end resumable index build (SURVEY.md §3 Ray-native lifecycle).

Pipeline::

    read_parquet(url, lang)                            [pass 0: counts]
      → AddPart → groupby(lang, part).count()          [langs + dense-id offsets]
    read_parquet(url, text|html, lang)                 [pass 1, column-pruned]
      → ExtractText (html corpora only)                [map_batches, Arrow]
      → TokenizeStage                                  [actor pool]
      → AddPart (url-hash partition)                   [map_batches]
      → groupby(lang, part).map_groups(AssignDocIds)   [SHUFFLE 1: doc ids]
          side-writes docmap/ parquet + docmap_stats/ sidecar JSONs
          + _df_partials/ per-(lang, part) df parquet,
          emits posting triples (or encoded segments)
    [segments flow: NO checkpoint — the stream continues straight into
     the merge tree + write below; exactly one consumer]
    [triples flow: object-store checkpoint, consumed 2x (norms + encode)]
    df = driver fold of _df_partials/ files                    [no shuffle]
      → {df parquet, hot-term set, per-lang term stats}
    triples → AddSalt(hot broadcast) → add_kpart       [hash-partition terms]
      → groupby(kpart).map_groups(EncodePartition)     [SHUFFLE 2: THE big one]
      → [hot terms only] add_kpart(lang,term)
        → groupby.map_groups(MergePartition)           [segment merge]
      → write postings/lang=*/*.parquet
      → per-lang manifest commit (atomic)

Resumability: a language shard whose manifest is committed for the same
input fingerprint is skipped entirely (reference analog: pickle-existence
guards, document_ranking_with_bm25.py:452-491 — but transactional here).

Scale notes:
- the segments flow (norms off) STREAMS end-to-end — no checkpoint at
  all: df and stats come from AssignDocIds' side-writes, so the posting
  stream has exactly one consumer;
- the triples flow (norms on) checkpoints the stream in the object store
  because norms + encode both consume it; df is NOT a consumer — it folds
  the side-written per-partition vocabulary files (no df shuffle at all);
- global (N, avgdl) stats are exact integer sums over per-partition
  sidecar JSONs — no extra pass over the corpus;
- terms are ENCODED per hash partition (whole partitions vectorized), not
  per term-group: per-group map_groups costs ~5 ms/group of Arrow and
  scheduling overhead, which at one row per term dominated the build;
- hot terms (df > hot_term_threshold) are salted into doc-range sub-keys
  so no single encode task ever sees a stopword-sized posting list; the
  merge shuffle runs ONLY when hot terms exist, and moves already-encoded
  compact segments.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data

from ..config import IndexConfig
from ..util import arrow_blocks, from_pandas_clean, read_parquet_clean
from ..stages.extract import ExtractText
from ..stages.index_build import (
    AssignDocIds,
    MergePartition,
    add_gsalt,
    intermediate_merge_group,
    add_kpart,
    add_part,
    add_salt_and_kpart,
    encode_partition,
    encode_partition_ids,
    vocab_encode_triples,
)
from ..stages.tokenize import TokenizeStage
from ..state.manifest import is_committed, read_manifest, write_manifest
from ..util import default_pool

IDF_LAWS = {
    "lucene": lambda N, df: np.log(1.0 + (N - df + 0.5) / (df + 0.5)),
    "cosine": lambda N, df: np.log((N - df + 0.5) / (df + 0.5)),
    "sklearn": lambda N, df: np.log((N + 1.0) / (df + 1.0)) + 1.0,
}

# bump whenever the on-disk shard layout changes: it participates in the
# resume fingerprint, so stale caches rebuild instead of being read with
# the wrong decoder
INDEX_FORMAT_VERSION = 2

# above this many MERGED vocabulary entries the driver-side df aggregation
# overflows to the distributed groupby fallback (truly web-scale vocab)
DRIVER_DF_MAX_TERMS = 50_000_000


def _input_fingerprint(input_path) -> str:
    """Cheap lineage fingerprint: path(s) + total rows + per-fragment
    (path, size, mtime), so rewriting an input in place with the same row
    count still invalidates resumable shards."""
    import hashlib as _hl

    try:
        dset = pads.dataset(input_path, format="parquet")
        rows = 0
        h = _hl.md5()
        for f in sorted(dset.get_fragments(), key=lambda f: f.path):
            rows += f.metadata.num_rows if f.metadata else 0
            try:
                st = os.stat(f.path)
                # nanosecond mtime: a same-size rewrite within the same
                # SECOND must still invalidate resume
                h.update(f"{f.path}:{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                h.update(f.path.encode())
        return f"{input_path}::rows={rows}::frag={h.hexdigest()[:16]}"
    except Exception:
        return str(input_path)


def _lang_dirs(index_dir: str):
    return {
        "docmap": os.path.join(index_dir, "docmap"),
        "docmap_stats": os.path.join(index_dir, "docmap_stats"),
        "postings": os.path.join(index_dir, "postings"),
        "norms": os.path.join(index_dir, "norms"),
        "df": os.path.join(index_dir, "df"),
        # AssignDocIds' per-(lang, part) df side-writes (scratch; the
        # compacted per-lang df/ parquet is the durable artifact)
        "df_partials": os.path.join(index_dir, "_df_partials"),
        "manifests": os.path.join(index_dir, "manifests"),
    }


def _clean_uncommitted(index_dir: str, langs) -> None:
    d = _lang_dirs(index_dir)
    for lang in langs:
        for key in ("docmap", "docmap_stats", "postings", "norms", "df",
                    "df_partials"):
            p = os.path.join(d[key], f"lang={lang}")
            if os.path.isdir(p):
                shutil.rmtree(p)


def _read_stats(d: dict, todo) -> dict:
    """Global per-lang (N, avgdl): exact integer sums over the tiny stats
    sidecar JSONs side-written by AssignDocIds — no pass over the corpus."""
    stats: dict = {}
    for lang in todo:
        n_docs = 0
        sum_dl = 0
        for p in glob.glob(os.path.join(d["docmap_stats"], f"lang={lang}", "*.json")):
            with open(p) as f:
                s = json.load(f)
            n_docs += s["n_docs"]
            sum_dl += s["sum_dl"]
        stats[lang] = {
            "n_docs": n_docs,
            "total_tokens": sum_dl,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        }
    return stats


def _df_hot_stats(d: dict, todo, cfg, want_acc: bool = True):
    """A2 (document frequency) WITHOUT consuming the posting stream: fold
    the per-(lang, part) df partials AssignDocIds side-wrote — each file is
    one partition's vocabulary (Heaps-law-sized, orders of magnitude
    smaller than the stream) — into the per-lang df/ parquet, the hot-term
    list, and per-lang term stats.

    Returns ``(df_acc | None, hot, term_stats)``; ``df_acc`` is None when
    the merged vocabulary exceeds the driver guard and the fold fell back
    to a DISTRIBUTED groupby — still over the partial files, never the
    stream. Guard override: env ``DRR_DF_MAX_TERMS`` (tests).

    ``want_acc=False`` (the segments flow, which never dictionary-encodes
    the shuffle) skips building the python ``df_acc`` dict — at a
    bigram-heavy multi-million-term vocabulary the dict build alone is
    seconds of serial driver time.

    The fold itself is a pyarrow concat + group-sum (C speed): the
    previous per-row Counter fold cost ~29 s of SERIAL driver time on a
    2M-doc reference-tokenizer build — a fixed cost that depressed the
    N-vs-4N scaling ratio at every cluster size."""
    import pyarrow.parquet as _pq

    max_terms = int(os.environ.get("DRR_DF_MAX_TERMS", DRIVER_DF_MAX_TERMS))
    overflow = False
    tables = []
    total_rows = 0
    for lang in todo:
        pdir = os.path.join(d["df_partials"], f"lang={lang}")
        for p in sorted(glob.glob(os.path.join(pdir, "*.parquet"))):
            t = _pq.read_table(p)
            tables.append(t.append_column(
                "lang", pa.array([lang] * t.num_rows, pa.string())
            ))
            total_rows += t.num_rows
            # conservative early exit: partial rows bound the merged key
            # count from above, so 8× the guard certainly overflows
            if total_rows > 8 * max_terms:
                overflow = True
                break
        if overflow:
            break
    merged_tbl = None
    if not overflow:
        if tables:
            merged_tbl = (
                pa.concat_tables(tables)
                .group_by(["lang", "term"])
                .aggregate([("n", "sum")])
            )
            overflow = merged_tbl.num_rows > max_terms
        else:
            merged_tbl = pa.table({
                "lang": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "n_sum": pa.array([], pa.int64()),
            })
    if overflow:
        del tables, merged_tbl
        per_lang = []
        for lang in todo:
            pdir = os.path.join(d["df_partials"], f"lang={lang}")
            if glob.glob(os.path.join(pdir, "*.parquet")):
                # ray.data.read_parquet hive-infers the lang column from
                # the `lang=…` path component at execution time — reading
                # the leaf dir already yields (term, n, lang) batches
                per_lang.append(ray.data.read_parquet(pdir))
        if not per_lang:
            return {}, [], {}
        base = per_lang[0]
        if len(per_lang) > 1:
            base = base.union(*per_lang[1:])
        df_ds = (
            base.groupby(["lang", "term"])
            .sum("n")
            .map_batches(
                lambda t: t.rename_columns(["lang", "term", "df"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        df_ds.write_parquet(d["df"], partition_cols=["lang"])
        hot = [
            (r["lang"], r["term"])
            for r in df_ds.filter(expr=f"df > {cfg.hot_term_threshold}").take_all()
        ]
        term_stats = {
            r["lang"]: r
            for r in df_ds.groupby("lang")
            .aggregate(
                ray.data.aggregate.Count(alias_name="n_terms"),
                ray.data.aggregate.Sum("df", alias_name="n_postings"),
            )
            .take_all()
        }
        return None, hot, term_stats

    merged_tbl = merged_tbl.rename_columns(["lang", "term", "df"])
    merged_tbl = merged_tbl.set_column(
        2, "df", pc.cast(merged_tbl["df"], pa.int64())
    )
    langs_present = pc.unique(merged_tbl["lang"]).to_pylist()
    term_stats = {}
    for lang in langs_present:
        g = merged_tbl.filter(pc.equal(merged_tbl["lang"], pa.scalar(lang)))
        g = g.select(["term", "df"])
        g = g.take(pc.sort_indices(g, sort_keys=[("term", "ascending")]))
        out_dir = os.path.join(d["df"], f"lang={lang}")
        os.makedirs(out_dir, exist_ok=True)
        _pq.write_table(g, os.path.join(out_dir, "part-00000.parquet"))
        term_stats[lang] = {
            "n_terms": g.num_rows,
            "n_postings": int(pc.sum(g["df"]).as_py() or 0),
        }
    hot_tbl = merged_tbl.filter(
        pc.greater(merged_tbl["df"], pa.scalar(cfg.hot_term_threshold))
    )
    hot = list(zip(hot_tbl["lang"].to_pylist(), hot_tbl["term"].to_pylist()))
    if not want_acc:
        return {}, hot, term_stats
    df_acc = dict(zip(
        zip(merged_tbl["lang"].to_pylist(), merged_tbl["term"].to_pylist()),
        merged_tbl["df"].to_pylist(),
    ))
    return df_acc, hot, term_stats


def build_index(
    input_path,
    index_dir: str,
    *,
    cfg: IndexConfig = IndexConfig(),
    extract_html: bool = False,
    with_cosine_norms: bool = True,
    tokenize_concurrency=None,
    input_ds_factory=None,
    keep_triples: bool = False,
    read_num_blocks: int | None = None,
) -> dict:
    """Build (or resume) the inverted index. Returns {lang: manifest dict}.

    ``input_ds_factory``: optional callable () → Dataset with columns
    (url, text|html, lang), overriding the parquet read (used to adapt the
    driver testdata shape). A factory taking a ``columns`` argument is
    given the pruned column list so pass 0 stays a thin read.
    Fingerprinting then uses ``input_path`` as an opaque label.

    ``read_num_blocks``: explicit corpus-read block count (None = the
    auto floor below, which depends on cluster CPUs). Scaling comparisons
    across cluster sizes should pin this so both runs execute the SAME
    job — otherwise the smaller cluster reads in fewer blocks and gains a
    per-block-overhead advantage that distorts the ratio.
    """
    import time

    _t0 = time.perf_counter()
    _profile = os.environ.get("DRR_PROFILE") == "1"

    def _mark(name):
        if _profile:
            print(f"[build {name}] {time.perf_counter() - _t0:.1f}s", flush=True)

    d = _lang_dirs(index_dir)
    # manifests/ always exists once a build ran — scorers use its absence
    # to distinguish "no index here" (config error) from "this language
    # has no shard" (legitimately empty result)
    os.makedirs(d["manifests"], exist_ok=True)
    if tokenize_concurrency is None:
        # quarter-size fixed pools for tokenize AND assign: both reserve
        # their CPUs for the execution's lifetime, and together with the
        # shuffle/write task stages they must stay under the cluster
        # size. Measured alternatives at 2M docs / 16 CPUs: an
        # autoscaling (1, max) range is 55% slower (ramp-up delay
        # serializes each phase's early blocks); tokenize=0.5 +
        # assign=0.25 speeds tokenize but slows the assign phase by more
        # (fewer free task slots while the idle pool's reservation
        # lingers).
        tokenize_concurrency = default_pool()
    tok = cfg.tokenizer
    fingerprint = (
        _input_fingerprint(input_path)
        + f"::tok={tok.mode},sw={int(tok.stopwords)},ml={tok.min_token_len}"
        + f",bg={'|'.join(tok.bigram_langs)}::fmt={INDEX_FORMAT_VERSION}"
    )

    import inspect

    _factory_takes_columns = (
        input_ds_factory is not None
        and len(inspect.signature(input_ds_factory).parameters) >= 1
    )

    def _auto_num_blocks():
        """Block-count floor for the corpus read. Two failure modes bound
        it: (a) Ray's default parallelism heuristic over-splits small
        inputs (a 120 MB file → ~200 × 0.6 MB blocks, each costing 3 map
        + 2 shuffle tasks downstream — measured 2.5× slower build at 100k
        docs); (b) an override ≤ CPU count makes the planner skip
        SplitBlocks and FUSE ReadParquet into the tokenize stage with too
        few tasks (measured: 1M-doc read+tokenize serialized, 95 s vs
        ~10 s). Use max(4 × cluster CPUs, input_bytes / 64 MB): 4× CPUs
        keeps the fused read+tokenize stage saturated with headroom for
        stragglers; at 100 TB the bytes term dominates and the read stays
        row-group parallel."""
        try:
            if os.path.isdir(input_path):
                total = sum(
                    os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(input_path)
                    for f in fs
                )
            else:
                total = os.path.getsize(input_path)
        except (OSError, TypeError):
            return None
        cpus = int(ray.cluster_resources().get("CPU", 8))
        return max(2 * cpus, -(-total // (64 << 20)))

    def read_input(columns=None):
        if input_ds_factory is not None:
            if columns is not None and _factory_takes_columns:
                return input_ds_factory(columns)
            return input_ds_factory()
        cols = columns or (["url", "lang"] + (["html"] if extract_html else ["text"]))
        return read_parquet_clean(
            input_path,
            columns=cols,
            override_num_blocks=read_num_blocks or _auto_num_blocks(),
        )

    # --- pass 0: per-(lang, part) doc counts → langs + dense-id offsets.
    # Per-batch partial counts summed on the driver (the result is tiny:
    # langs × num_hash_parts rows) — no shuffle needed. This scan is
    # COLUMN-PRUNED to (url, lang): at 100 TB the text column dominates
    # (~KB/doc vs ~60 B for url+lang), so the counting pass reads ~1-3% of
    # corpus bytes — cheaper than materializing the tokenized stream
    # pre-shuffle (which would double object-store pressure) and far
    # cheaper than a second full scan.
    def _partial_counts(t):
        import pandas as pd

        t = add_part(t.select(["url", "lang"]), cfg.num_hash_parts)
        g = (
            pd.DataFrame(
                {"lang": t["lang"].to_pandas(), "part": t["part"].to_pandas()}
            )
            .groupby(["lang", "part"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return from_pandas_clean(g)

    from collections import Counter as _Counter

    count_acc: dict = _Counter()
    for row in (
        read_input(columns=["url", "lang"])
        .map_batches(_partial_counts, batch_format="pyarrow")
        .take_all()
    ):
        count_acc[(row["lang"], int(row["part"]))] += int(row["n"])
    counts = [
        {"lang": l, "part": p, "count()": n} for (l, p), n in count_acc.items()
    ]
    _mark("counts")
    all_langs = sorted({r["lang"] for r in counts})

    todo = [
        l
        for l in all_langs
        if not is_committed(os.path.join(d["manifests"], str(l)), fingerprint)
    ]
    manifests = {
        l: read_manifest(os.path.join(d["manifests"], str(l)))
        for l in all_langs
        if l not in todo
    }
    if not todo:
        return manifests
    _clean_uncommitted(index_dir, todo)

    offsets: dict = {}
    for lang in todo:
        rows = sorted(((r["part"], r["count()"]) for r in counts if r["lang"] == lang))
        acc = 0
        for part, n in rows:
            offsets[(lang, int(part))] = acc
            acc += n

    docs = read_input()
    if len(todo) < len(all_langs):
        todo_arr = pa.array(sorted(todo))
        docs = docs.map_batches(
            lambda t: t.filter(pc.is_in(t["lang"], value_set=todo_arr)),
            batch_format="pyarrow",
        )
    if extract_html:
        docs = docs.map_batches(ExtractText(), batch_format="pyarrow")

    # --- pass 1: tokenize → assign ids (side-write docmap+stats) ---
    #
    # Two flows:
    # - "segments" (default when cosine norms aren't needed): each
    #   (lang, part) group ENCODES its posting segments in place — the
    #   only remaining shuffle moves compact encoded segments
    #   (vocab x parts rows), not every posting triple.
    # - "triples": emits raw triples, checkpointed in the object store and
    #   consumed by df / norms / encode passes (needed for cosine norms).
    segments_flow = not with_cosine_norms
    tokens = docs.map_batches(
        TokenizeStage,
        fn_constructor_kwargs={"config": cfg.tokenizer, "counted": True},
        batch_format="pyarrow",
        concurrency=tokenize_concurrency,
    )
    parted = tokens.map_batches(
        add_part, fn_kwargs={"num_parts": cfg.num_hash_parts}, batch_format="pyarrow"
    )
    assign_kwargs = {
        "offsets": offsets,
        "docmap_dir": d["docmap"],
        "emit": "segments" if segments_flow else "triples",
        "block_size": cfg.block_size,
        "df_dir": d["df_partials"],
    }
    assigned = parted.groupby(["lang", "part"]).map_groups(
        AssignDocIds,
        fn_constructor_kwargs=assign_kwargs,
        batch_format="pyarrow",
        concurrency=tokenize_concurrency,
    )
    if not segments_flow:
        # checkpoint in the OBJECT STORE (zero-copy, spills under
        # pressure): the triples stream is consumed twice (cosine norms +
        # encode) and a parquet round-trip through local disk was pure
        # non-scaling I/O. The df pass is NOT a consumer — AssignDocIds
        # side-writes per-(lang, part) df partials, so A2 folds compact
        # vocabulary files instead of re-reading the stream.
        # ``keep_triples`` additionally writes the triples to disk for
        # inspection.
        triples_mat = assigned.materialize()
        if keep_triples:
            triples_dir = os.path.join(index_dir, "_triples")
            if os.path.isdir(triples_dir):
                shutil.rmtree(triples_dir)
            triples_mat.write_parquet(triples_dir, min_rows_per_file=500_000)
        _mark("tokenize_assign_triples")

        # --- stats + df: folded from the side-written artifacts (sidecar
        # JSONs / df partial parquet) — NO consumption of the checkpoint
        stats = _read_stats(d, todo)
        df_acc, hot, term_stats = _df_hot_stats(d, todo, cfg)
        hot_ref = ray.put(frozenset(hot)) if hot else None
        # driver-resident vocabulary → dictionary-encode the shuffle
        # (numeric sort keys); None when the vocab overflowed to the
        # distributed fallback
        vocab_ref = None
        hot_vids_ref = None
        if df_acc is not None:
            keys = list(df_acc.keys())
            lang_arr = np.array([k[0] for k in keys], dtype=object)
            term_arr = np.array([k[1] for k in keys], dtype=object)
            vocab_ref = ray.put((lang_arr, term_arr))
            if hot:
                hot_set = set(hot)
                hot_vids_ref = ray.put(
                    np.array(
                        [i for i, k in enumerate(keys) if k in hot_set],
                        dtype=np.int64,
                    )
                )
        _mark("df_hot_stats")

        # --- optional cosine norms: |d| under the cosine idf law ---
        if with_cosine_norms:
            _build_cosine_norms(triples_mat, d, stats)
            _mark("cosine_norms")

    def _merge_rounds(seg, span: int):
        """Hierarchical (tree) segment merge: while more than one
        doc-range bucket remains, coarsen salt by ``merge_fanout`` and
        merge each (lang, term, gsalt) section — so no single task ever
        concatenates more than ``fanout`` segments of one term. Rounds are
        byte-identical to the flat merge (IntermediateMerge docstring)."""
        fanout = cfg.merge_fanout
        r = 0
        while span > 1:
            seg = seg.map_batches(
                add_gsalt, fn_kwargs={"fanout": fanout}, batch_format="pyarrow"
            ).map_batches(
                add_kpart,
                fn_kwargs={
                    "num_parts": cfg.num_encode_parts,
                    "cols": ("lang", "term", "gsalt"),
                },
                batch_format="pyarrow",
            )
            seg = seg.groupby("kpart").map_groups(
                intermediate_merge_group,
                fn_kwargs={"block_size": cfg.block_size},
                batch_format="pyarrow",
            )
            span = (span + fanout - 1) // fanout
            r += 1
            _mark(f"merge_round_{r}")
        return seg

    # --- pass 3: encode partitions (+ merge only when hot terms exist) ---
    if segments_flow:
        # NO checkpoint: the segments flow has exactly ONE consumer of the
        # posting stream (df and stats come from AssignDocIds' side
        # writes), so the whole build streams tokenize → assign/encode →
        # merge tree → write with backpressure, never pinning the stream
        # in the object store. Segments are already encoded; ONE shuffle
        # of compact segments into per-term merge partitions — or, with
        # merge_fanout >= 2, a TREE of bounded (term, doc-range-bucket)
        # merge rounds first (segments-flow salt = part index, so
        # span = num_hash_parts).
        seg_src = assigned
        if cfg.merge_fanout >= 2:
            seg_src = _merge_rounds(seg_src, cfg.num_hash_parts)
        rekeyed = seg_src.map_batches(
            add_kpart,
            fn_kwargs={"num_parts": cfg.num_encode_parts, "cols": ("lang", "term")},
            batch_format="pyarrow",
        )
        # plain tasks, NOT a third actor pool: tokenize + assign pools are
        # live in the same streaming graph now, and a third pool would
        # starve the executor at small CPU counts; MergePartition's state
        # is config-only, so per-group construction is free
        final = rekeyed.groupby("kpart").map_groups(
            lambda g: MergePartition(
                block_size=cfg.block_size, min_df=cfg.min_df
            )(g),
            batch_format="pyarrow",
        )
        final.write_parquet(d["postings"], partition_cols=["lang"])
        _mark("tokenize_encode_merge_write")
        if _profile:
            print(final.stats(), flush=True)
        # side-written artifacts exist only now (the single execution just
        # finished): fold sidecars + df partials → stats, df/, manifests
        stats = _read_stats(d, todo)
        # want_acc=False: the segments flow never dictionary-encodes the
        # shuffle, so the (lang, term)->df python dict is never read
        df_acc, hot, term_stats = _df_hot_stats(d, todo, cfg,
                                                want_acc=False)
        _mark("df_hot_stats")
        for lang in todo:
            s = stats.get(lang, {})
            t = term_stats.get(lang, {})
            payload = _manifest_payload(
                lang, fingerprint, s, t, cfg, hot, with_cosine_norms, "segments"
            )
            write_manifest(os.path.join(d["manifests"], str(lang)), payload)
            manifests[lang] = payload
        return manifests

    triples_ds = triples_mat
    if vocab_ref is not None:
        keyed = triples_ds.map_batches(
            vocab_encode_triples,
            fn_kwargs={
                "vocab_ref": vocab_ref,
                "hot_vids_ref": hot_vids_ref,
                "salt_shift": cfg.salt_shift,
                "num_parts": cfg.num_encode_parts,
            },
            batch_format="pyarrow",
        )
        encoded = keyed.groupby("kpart").map_groups(
            encode_partition_ids,
            fn_kwargs={"block_size": cfg.block_size, "vocab_ref": vocab_ref},
            batch_format="pyarrow",
        )
    else:
        keyed = triples_ds.map_batches(
            add_salt_and_kpart,
            fn_kwargs={
                "hot_terms_ref": hot_ref,
                "salt_shift": cfg.salt_shift,
                "num_parts": cfg.num_encode_parts,
            },
            batch_format="pyarrow",
        )
        encoded = keyed.groupby("kpart").map_groups(
            encode_partition,
            fn_kwargs={"block_size": cfg.block_size},
            batch_format="pyarrow",
        )
    if hot:
        if cfg.merge_fanout >= 2:
            # triples-flow salt = doc_id >> salt_shift → span from the
            # largest per-lang doc count
            max_docs = max((s["n_docs"] for s in stats.values()), default=1)
            span = ((max(max_docs, 1) - 1) >> cfg.salt_shift) + 1
            encoded = _merge_rounds(encoded, span)
        rekeyed = encoded.map_batches(
            add_kpart,
            fn_kwargs={"num_parts": cfg.num_encode_parts, "cols": ("lang", "term")},
            batch_format="pyarrow",
        )
        final = rekeyed.groupby("kpart").map_groups(
            MergePartition,
            fn_constructor_kwargs={"block_size": cfg.block_size, "min_df": cfg.min_df},
            batch_format="pyarrow",
            concurrency=tokenize_concurrency,
        )
    else:
        def finalize(t: pa.Table) -> pa.Table:
            if cfg.min_df > 1:
                t = t.filter(pc.greater_equal(t["df"], cfg.min_df))
            return t.drop_columns(
                [c for c in ("salt", "min_doc", "kpart") if c in t.column_names]
            )

        final = encoded.map_batches(finalize, batch_format="pyarrow")
    final.write_parquet(d["postings"], partition_cols=["lang"])
    _mark("encode_merge_write")
    del triples_mat  # release the object-store checkpoint

    # --- per-lang manifest commit ---
    for lang in todo:
        s = stats.get(lang, {})
        t = term_stats.get(lang, {})
        payload = _manifest_payload(
            lang, fingerprint, s, t, cfg, hot, with_cosine_norms, "triples"
        )
        write_manifest(os.path.join(d["manifests"], str(lang)), payload)
        manifests[lang] = payload
    return manifests


def _manifest_payload(lang, fingerprint, s, t, cfg, hot, with_cosine_norms, flow):
    return {
        "partition": str(lang),
        "input_fingerprint": fingerprint,
        "n_docs": int(s.get("n_docs", 0)),
        "avgdl": float(s.get("avgdl", 0.0) or 0.0),
        "total_tokens": int(s.get("total_tokens", 0) or 0),
        "n_terms": int(t.get("n_terms", 0)),
        "n_postings": int(t.get("n_postings", 0) or 0),
        "block_size": cfg.block_size,
        "hot_term_threshold": cfg.hot_term_threshold,
        "n_hot_terms": len(hot),
        "salt_shift": cfg.salt_shift,
        "num_hash_parts": cfg.num_hash_parts,
        "tokenizer_mode": cfg.tokenizer.mode,
        # the FULL tokenizer config: query-side tokenization must be able
        # to reconstruct every field, not just the mode (a stopword or
        # min-length mismatch silently misses the indexed vocabulary)
        "tokenizer_stopwords": bool(cfg.tokenizer.stopwords),
        "tokenizer_min_token_len": int(cfg.tokenizer.min_token_len),
        "tokenizer_bigram_langs": list(cfg.tokenizer.bigram_langs),
        "with_cosine_norms": bool(with_cosine_norms),
        "flow": flow,
    }


# above this many vocabulary terms the idf dict is too big to broadcast
# to every worker; the norms build switches to the term-bucket cogroup
NORM_BROADCAST_MAX_TERMS = 5_000_000


def _build_cosine_norms(triples_mat, d: dict, stats: dict,
                        broadcast_max_terms: int = None) -> None:
    """Per-doc TF-IDF L2 norms under the 'cosine' idf law
    (cosine_similarity_bm25_reranking.py:176-182, :94-110).

    Default path: broadcast the per-lang idf dict, partial per-batch doc
    sums, then a doc-keyed groupby-sum (one row per doc). When the
    vocabulary exceeds ``broadcast_max_terms``, the idf side is instead
    COGROUPED with the triples by a (lang, term) hash partition — only
    the tiny per-lang (N_docs) dict is broadcast; both paths produce
    identical norms (tested)."""
    import pandas as pd

    from ..stages.index_build import add_kpart

    if broadcast_max_terms is None:
        broadcast_max_terms = int(
            os.environ.get("DRR_NORM_BCAST_MAX", NORM_BROADCAST_MAX_TERMS)
        )
    df_tbl = (
        pads.dataset(d["df"], format="parquet", partitioning="hive")
        .to_table()
        .to_pandas()
    )
    # df/ may hold previously-committed languages on resume; norms for
    # those shards are already on disk — only build the todo set
    df_tbl = df_tbl[df_tbl["lang"].astype(str).isin(set(stats))]

    if len(df_tbl) <= broadcast_max_terms:
        idf_maps = {}
        for lang, g in df_tbl.groupby("lang"):
            N = stats[lang]["n_docs"]
            idf = np.log((N - g["df"].to_numpy() + 0.5) / (g["df"].to_numpy() + 0.5))
            idf_maps[lang] = dict(zip(g["term"], idf))
        idf_ref = ray.put(idf_maps)

        class PartialNorm:
            def __init__(self):
                self.idf_maps = ray.get(idf_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                import pandas as pd

                pdf = batch.to_pandas()
                # idf lookup vectorized per lang (Series.map is C-path;
                # a per-ROW python dict get dominated this kernel)
                idf = np.zeros(len(pdf), dtype=np.float64)
                for lang, g in pdf.groupby("lang", sort=False):
                    m = self.idf_maps.get(lang)
                    if m:
                        idf[g.index.to_numpy()] = (
                            g["term"].map(m).fillna(0.0).to_numpy()
                        )
                w = pdf["tf"].to_numpy() * idf
                pdf["w2"] = w * w
                out = (
                    pdf.groupby(["lang", "doc_id"], sort=False)["w2"].sum().reset_index()
                )
                return from_pandas_clean(out, preserve_index=False)

        partials = triples_mat.select_columns(["lang", "doc_id", "term", "tf"]).map_batches(
            PartialNorm, batch_format="pyarrow", concurrency=default_pool()
        )
    else:
        # term-bucket cogroup: df rows (doc_id = -1) and triples share a
        # (lang, term)-hash partition; idf is computed inside each
        # partition from its own df rows + the broadcast per-lang N
        n_by_lang = {lang: s["n_docs"] for lang, s in stats.items()}
        df_ds = ray.data.from_pandas(
            df_tbl.assign(doc_id=np.int64(-1), tf=df_tbl["df"].astype(np.int64))[
                ["lang", "doc_id", "term", "tf"]
            ]
        )
        unioned = (
            triples_mat.select_columns(["lang", "doc_id", "term", "tf"])
            .union(df_ds)
            .map_batches(
                add_kpart,
                fn_kwargs={"num_parts": 128, "cols": ("lang", "term")},
                batch_format="pyarrow",
            )
        )

        def norm_partition(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns=["kpart"]) if "kpart" in g.columns else g
            is_df = g["doc_id"].to_numpy() < 0
            dfp = g[is_df]
            tri = g[~is_df]
            if len(tri) == 0 or len(dfp) == 0:
                return pd.DataFrame(
                    {"lang": pd.Series(dtype="object"),
                     "doc_id": pd.Series(dtype="int64"),
                     "w2": pd.Series(dtype="float64")}
                )
            N = dfp["lang"].map(n_by_lang).to_numpy(dtype=np.float64)
            dfv = dfp["tf"].to_numpy(dtype=np.float64)
            idf_tbl = dfp.assign(idf=np.log((N - dfv + 0.5) / (dfv + 0.5)))
            m = tri.merge(
                idf_tbl[["lang", "term", "idf"]], on=["lang", "term"], how="left"
            )
            w = m["tf"].to_numpy(dtype=np.float64) * m["idf"].fillna(0.0).to_numpy()
            m["w2"] = w * w
            return (
                m.groupby(["lang", "doc_id"], sort=False)["w2"].sum().reset_index()
            )

        partials = unioned.groupby("kpart").map_groups(
            norm_partition, batch_format="pandas"
        )

    # util.arrow_blocks: pandas map_groups output must re-arrow before a
    # Ray aggregate (2.49 pandas-block all-to-all slow path)
    norms = arrow_blocks(partials).groupby(["lang", "doc_id"]).sum("w2")
    norms = norms.map_batches(
        lambda t: t.rename_columns(["lang", "doc_id", "norm2"]), batch_format="pyarrow"
    )
    norms.write_parquet(d["norms"], partition_cols=["lang"])
