"""Doc-range-sharded BM25 serving (the 10^12-doc layout of SCALE.md).

At web scale one language's index exceeds a node: the corpus is split
into doc-range shards, each built INDEPENDENTLY by ``build_index`` over
its partition of the corpus. Query serving then needs:

1. **Global statistics** — BM25 is rank-identical to a single giant index
   only if idf and avgdl use GLOBAL (N, df, avgdl), not per-shard values.
   N / avgdl come exactly from integer sums over shard manifests;
   per-term global df comes from one vocabulary-sized groupby over the
   shards' df tables (``build_global_df`` — run once per shard group).
2. **Fan-out** — each query row is replicated to every shard
   (``shard_id`` column); the scorer stage caches (shard, lang) indexes
   per actor, so routing is just which rows an actor sees.
3. **Merge** — per-shard top-k candidate rows are merged per query on
   the SAME (score_x desc, url asc) composite as ``topk_with_ties``,
   keyed by a hash partition of query_id (one vectorized task per
   partition, not one per query).

Exactness (tested): sharded results == single-index results for the same
corpus, rank / url / score_x identical. Reference analog: the per-lang
pickle-shard fan-in of final_implementation.py:223-287, generalized to
doc-range shards with global stats.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import BM25Config, TokenizerConfig
from ..functions.tokenizer import tokenize_cfg
from ..state.index_shard import LangIndex, IDF_LAWS, topk_with_ties
from ..state.manifest import read_manifest
from ..stages.index_build import add_kpart
from ..util import default_pool


def shard_langs(shard_dirs) -> set:
    langs = set()
    for d in shard_dirs:
        mdir = os.path.join(d, "manifests")
        if os.path.isdir(mdir):
            langs.update(os.listdir(mdir))
    return langs


def global_lang_stats(shard_dirs, lang: str):
    """Exact global (N, avgdl) from the shards' integer manifest sums."""
    n = 0
    toks = 0
    for d in shard_dirs:
        m = read_manifest(os.path.join(d, "manifests", lang))
        if m is None:
            continue
        n += int(m.get("n_docs", 0))
        toks += int(m.get("total_tokens", 0))
    return n, (toks / n if n else 0.0)


def build_global_df(shard_dirs, out_dir: str) -> None:
    """Merge the shards' per-lang df tables into one global df parquet:
    ONE vocabulary-sized groupby (vocab ≪ corpus), written hive-style by
    lang. Run once when a shard group is (re)assembled."""
    parts = []
    for d in shard_dirs:
        for p in glob.glob(os.path.join(d, "df", "lang=*")):
            lang = os.path.basename(p).split("=", 1)[1]
            t = pq.read_table(p, columns=["term", "df"])
            parts.append(t.append_column(
                "lang", pa.array([lang] * t.num_rows, pa.string())
            ))
    if not parts:
        raise ValueError("no df tables found under shard dirs")
    ds = ray.data.from_arrow(pa.concat_tables(parts))
    merged = ds.groupby(["lang", "term"]).sum("df")
    merged = merged.map_batches(
        lambda t: t.rename_columns(["lang", "term", "df"]), batch_format="pyarrow"
    )
    merged.write_parquet(out_dir, partition_cols=["lang"])


class _GlobalView:
    """LangIndex wrapper scoring with GLOBAL (N, avgdl, df) while reading
    the local shard's postings/doc-lengths/urls.

    ``n_docs`` stays LOCAL (scorers size their dense score arrays from
    it — a global value would make every query O(global corpus) in time
    and memory); the global doc count enters only through ``idf``."""

    def __init__(self, idx: LangIndex, global_n: int, avgdl: float, df_map: dict):
        self._idx = idx
        self.n_docs = idx.n_docs          # LOCAL: dense-array sizing
        self._global_n = global_n         # GLOBAL: idf only
        self.avgdl = avgdl                # GLOBAL
        self._df = df_map                 # GLOBAL per-term df
        self.dl = idx.dl
        self.norms = idx.norms

    @property
    def urls(self):
        return self._idx.urls

    def df(self, term):
        return self._df.get(term)

    def idf(self, term: str, law: str) -> float:
        d = self._df.get(term)
        if d is None:
            return 0.0
        return float(IDF_LAWS[law](float(self._global_n), float(d)))

    def postings(self, term: str):
        return self._idx.postings(term)

    def term_contrib(self, term: str, cfg):
        """Per-posting BM25 contribution under the GLOBAL avgdl — the
        inner LangIndex's cached/shared contribs were computed with its
        LOCAL avgdl and must not be reused here."""
        from ..state.index_shard import _bm25_contrib

        p = self._idx.postings(term)
        if p is None:
            return None
        doc_ids, tfs = p
        return _bm25_contrib(tfs, self.dl[doc_ids], cfg, self.avgdl)

    # pass-throughs that let the term-sharded scorers
    # (pipelines/term_sharded.py) run against a doc-shard's bucket with
    # GLOBAL stats — the (doc-range × term-range) grid composition.
    # Membership/blocks are LOCAL (this bucket's vocabulary slice);
    # df/idf/avgdl above are GLOBAL.
    @property
    def _terms(self):
        return self._idx._terms

    def term_blocks(self, term: str):
        return self._idx.term_blocks(term)

    def _blocks(self, i: int, which: str):
        return self._idx._blocks(i, which)

    def term_cmax(self, term: str, cfg) -> float:
        con = self.term_contrib(term, cfg)
        return float(con.max()) if con is not None and con.size else 0.0


class ShardedBM25Scorer:
    """Group stage over (shard_id, qpart)-keyed query rows: per-shard
    top-k candidates with GLOBAL-stat scores.

    ROUTING: the pipeline groups rows by (shard_id, query-hash part)
    before this stage, so one invocation only ever sees ONE shard, and —
    because the sort-based shuffle delivers groups shard-major — an
    actor's consecutive groups mostly share a shard. The per-actor view
    cache is a tiny LRU (default 2 shard-langs), so no actor ever holds
    more than a bounded number of shard indexes regardless of S. The
    global df dict per lang is a broadcast ObjectRef (vocabulary-sized —
    the same object a single index would hold)."""

    MAX_CACHED_VIEWS = 2

    def __init__(self, shard_dirs, global_df_refs, stats, cfg: BM25Config,
                 tokenizer: TokenizerConfig, round_dp=4, deleted_ref=None):
        from collections import OrderedDict

        self.shard_dirs = list(shard_dirs)
        self._df_refs = dict(global_df_refs)
        self._df_maps: dict = {}  # lazily fetched per lang actually served
        self.stats = stats  # {lang: (N, avgdl)}
        self.cfg = cfg
        self.tok = tokenizer
        self.round_dp = round_dp
        self._cache: "OrderedDict" = OrderedDict()
        # {(src, lang): sorted local doc ids} — pipelines.deletes live
        # tombstones; src == shard_id in generation order
        self._deleted_ref = deleted_ref
        self._deleted = None

    def _deleted_ids(self, shard_id: int, lang: str):
        if self._deleted_ref is None:
            return None
        if self._deleted is None:
            self._deleted = ray.get(self._deleted_ref)
        return self._deleted.get((shard_id, lang))

    def _df_map(self, lang: str):
        # lazy: an actor only deserializes the vocab dicts of the langs
        # its groups actually score
        if lang not in self._df_maps:
            self._df_maps[lang] = ray.get(self._df_refs[lang])
        return self._df_maps[lang]

    def _view(self, shard_id: int, lang: str):
        key = (shard_id, lang)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        try:
            idx = LangIndex(self.shard_dirs[shard_id], lang)
            n, avgdl = self.stats[lang]
            view = _GlobalView(idx, n, avgdl, self._df_map(lang))
        except FileNotFoundError:
            view = None
        self._cache[key] = view
        if len(self._cache) > self.MAX_CACHED_VIEWS:
            self._cache.popitem(last=False)
        return view

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.score import _concat, _rows
        from ..state.index_shard import score_bm25_taat

        qids = batch["query_id"].to_pylist()
        qs = batch["query"].to_pylist()
        langs = batch["lang"].to_pylist()
        sids = batch["shard_id"].to_pylist()
        # process rows grouped by (shard, lang): arbitrary interleaving
        # would thrash the tiny view LRU with one reload per transition
        order = np.lexsort(
            (np.asarray(langs, dtype=object), np.asarray(sids, dtype=np.int64))
        )
        parts = []
        for i in order:
            qid, q, lang, sid = qids[i], qs[i], langs[i], sids[i]
            view = self._view(int(sid), lang)
            if view is None:
                continue
            tokens = tokenize_cfg(q, lang, self.tok)
            if not tokens:
                continue
            scores = score_bm25_taat(view, tokens, self.cfg)
            dele = self._deleted_ids(int(sid), lang)
            if dele is not None and dele.size:
                scores[dele] = 0.0
            ranks, sel, keys = topk_with_ties(
                scores, view.urls, self.cfg.k, self.round_dp
            )
            if len(ranks) == 0:
                continue
            parts.append(_rows(qid, ranks, sel, keys, scores, view.urls,
                               self.round_dp))
        return _concat(parts)


def merge_partition(t: pa.Table, k: int) -> pa.Table:
    """Partition of per-shard candidates (all rows of a query share the
    partition) → global top-k per query on (score_x desc, url asc).
    Arrow in/out: native multi-key sort + run-length ranks, no pandas
    conversion in the merge exchange."""
    if "kpart" in t.column_names:
        t = t.drop_columns(["kpart"])
    if t.num_rows == 0:
        return pa.table({
            "query_id": pa.array([], pa.string()),
            "rank": pa.array([], pa.int64()),
            "url": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "score_x": pa.array([], pa.int64()),
        })
    idx = pc.sort_indices(t, sort_keys=[
        ("query_id", "ascending"), ("score_x", "descending"),
        ("url", "ascending"),
    ])
    t = t.take(idx)
    qid = t["query_id"].to_numpy(zero_copy_only=False)
    n = t.num_rows
    new = np.ones(n, dtype=bool)
    new[1:] = qid[1:] != qid[:-1]
    starts = np.flatnonzero(new)
    rank = np.arange(n, dtype=np.int64) - starts[np.cumsum(new) - 1] + 1
    keep = rank <= k
    t = t.filter(pa.array(keep))
    return pa.table({
        "query_id": t["query_id"],
        "rank": pa.array(rank[keep], pa.int64()),
        "url": t["url"],
        "score": t["score"],
        "score_x": t["score_x"],
    })


def bm25_search_sharded(
    queries: ray.data.Dataset,
    shard_dirs,
    global_df_dir: str,
    cfg: BM25Config = BM25Config(),
    tokenizer: TokenizerConfig = TokenizerConfig(),
    round_dp=4,
    concurrency=None,
    num_merge_parts: int = 64,
    tombstones_dir=None,
) -> ray.data.Dataset:
    """Rank-identical BM25 over a group of doc-range shards.

    ``global_df_dir``: output of :func:`build_global_df` for these shards.
    ``tombstones_dir``: optional ``pipelines.deletes`` log keyed by
    (shard position, lang) — live Lucene-style delete masking."""
    from .deletes import deleted_ref

    del_ref = deleted_ref(tombstones_dir)
    shard_dirs = list(shard_dirs)
    langs = sorted(shard_langs(shard_dirs))
    stats = {lang: global_lang_stats(shard_dirs, lang) for lang in langs}
    global_df_refs = {}
    for lang in langs:
        p = os.path.join(global_df_dir, f"lang={lang}")
        t = pq.read_table(p, columns=["term", "df"])
        global_df_refs[lang] = ray.put(
            dict(zip(t["term"].to_pylist(),
                     t["df"].to_numpy(zero_copy_only=False).tolist()))
        )
    if concurrency is None:
        concurrency = default_pool(0.5)

    n_shards = len(shard_dirs)

    def fan_out(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = np.repeat(np.arange(n, dtype=np.int64), n_shards)
        sid = np.tile(np.arange(n_shards, dtype=np.int64), n)
        out = t.take(pa.array(idx))
        return out.append_column("shard_id", pa.array(sid, pa.int64()))

    fanned = queries.map_batches(fan_out, batch_format="pyarrow")
    # ROUTE by shard: group rows on (shard_id, query-hash part) so each
    # task/group touches exactly one shard (qpart bounds group size at
    # scale); without this every actor would end up caching EVERY shard
    def add_qpart(t: pa.Table) -> pa.Table:
        t2 = add_kpart(t, num_parts=num_merge_parts, cols=("query_id",))
        return t2.rename_columns(
            ["qpart" if c == "kpart" else c for c in t2.column_names]
        )

    routed = fanned.map_batches(add_qpart, batch_format="pyarrow")
    candidates = routed.groupby(["shard_id", "qpart"]).map_groups(
        ShardedBM25Scorer,
        fn_constructor_kwargs=dict(
            deleted_ref=del_ref,
            shard_dirs=shard_dirs, global_df_refs=global_df_refs,
            stats=stats, cfg=cfg, tokenizer=tokenizer, round_dp=round_dp,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return (
        candidates.map_batches(
            add_kpart,
            fn_kwargs={"num_parts": num_merge_parts, "cols": ("query_id",)},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(lambda g: merge_partition(g, cfg.k),
                    batch_format="pyarrow")
    )
