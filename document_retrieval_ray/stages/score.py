"""Query-scoring stages — actor-pool ``map_batches`` classes over a
queries Dataset.

Design (SURVEY.md §3 Ray-native restatement): queries are NOT shuffled;
each scorer actor lazily loads the per-language index shards it
encounters and caches them across batches (T3 analog — the reference
reloads whole per-language models into driver RAM,
final_implementation.py:290-322; here shards load once per actor). For
larger-than-RAM indexes the same class runs behind a lang/shard routing
``groupby``; the partitioning assumption is lang = shard key.

Output schema per result row:
``(query_id, rank:int64, url, score:float64, score_x:int64)`` where
``score_x = floor(score * 10^round_dp + 0.5)`` — the fixed-point key used
for deterministic cross-engine comparison; ranking is on
(score_x desc, url asc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import BM25Config, TokenizerConfig
from ..functions.tokenizer import tokenize_cfg
from ..state.index_shard import (
    LangIndex,
    score_bm25_maxscore,
    score_bm25_taat,
    score_cosine_taat,
    score_lm_dirichlet_taat,
    score_query_wand,
    topk_all,
    topk_with_ties,
)

_RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("rank", pa.int64()),
        ("url", pa.string()),
        ("score", pa.float64()),
        ("score_x", pa.int64()),
    ]
)


class _IndexCache:
    """Per-actor shard cache. With ``shared_refs`` ({lang: ObjectRef of a
    build_shared_payload dict}) the actor maps the driver-loaded shard
    zero-copy from the object store; otherwise it reads the shard
    directory itself (first query of that language pays the load)."""

    def __init__(self, index_dir: str, shared_refs=None):
        self.index_dir = index_dir
        self.shared_refs = shared_refs or {}
        self._cache: dict = {}

    def get(self, lang: str):
        if lang not in self._cache:
            ref = self.shared_refs.get(lang)
            if ref is not None:
                import ray

                self._cache[lang] = LangIndex.from_payload(ray.get(ref))
            else:
                try:
                    self._cache[lang] = LangIndex(self.index_dir, lang)
                except FileNotFoundError:
                    # "this LANGUAGE has no shard" is expected (its
                    # queries yield no rows); an index dir with no
                    # manifests at all is a configuration error that must
                    # not silently produce an empty result set
                    import os

                    if not os.path.isdir(os.path.join(self.index_dir, "manifests")):
                        raise FileNotFoundError(
                            f"no index at {self.index_dir!r} (manifests/ missing)"
                        )
                    self._cache[lang] = None
        return self._cache[lang]


def _rows(query_id, ranks, sel, keys, scores, urls, round_dp):
    n = len(ranks)
    return {
        "query_id": [query_id] * n,
        "rank": list(ranks),
        "url": list(urls[sel]),
        "score": list(scores[sel]),
        "score_x": [int(k) for k in keys]
        if round_dp is not None
        else [0] * n,
    }


def _concat(parts) -> pa.Table:
    cols = {f.name: [] for f in _RESULT_SCHEMA}
    for p in parts:
        for k in cols:
            cols[k].extend(p[k])
    return pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in _RESULT_SCHEMA},
        schema=_RESULT_SCHEMA,
    )


class BM25ScorerStage:
    """map_batches stage: (query_id, query, lang) → top-k result rows."""

    def __init__(
        self,
        index_dir: str,
        cfg: BM25Config = BM25Config(),
        tokenizer: TokenizerConfig = TokenizerConfig(),
        round_dp=4,
        method: str = "taat",  # "taat" | "wand"
        shared_refs=None,
        deleted_ref=None,
    ):
        if method not in ("taat", "wand", "maxscore"):
            raise ValueError(f"unknown scoring method: {method!r}")
        self.cache = _IndexCache(index_dir, shared_refs)
        self.cfg = cfg
        self.tok = tokenizer
        self.round_dp = round_dp
        self.method = method
        # {(src, lang): sorted local doc ids} from pipelines.deletes —
        # Lucene live-docs semantics: tombstoned docs are masked out of
        # results, global stats stay stale until compaction. One plasma
        # fetch per actor (zero-copy numpy views).
        self._deleted_ref = deleted_ref
        self._deleted = None

    def _deleted_ids(self, lang: str):
        if self._deleted_ref is None:
            return None
        if self._deleted is None:
            import ray

            self._deleted = ray.get(self._deleted_ref)
        return self._deleted.get((0, lang))

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        qids = batch["query_id"].to_pylist()
        queries = batch["query"].to_pylist()
        langs = batch["lang"].to_pylist()
        # optional per-query search-after cursor (deep pagination): a
        # non-null (after_score_x, after_url) pair restricts results to
        # docs STRICTLY after the cursor in (score_x desc, url asc)
        # order — the O(page) seek. Cursor queries score via exact TAAT
        # (WAND/MaxScore prune against an unconstrained top-k bound).
        names = batch.column_names
        a_keys = (
            batch["after_score_x"].to_pylist()
            if "after_score_x" in names else [None] * len(qids)
        )
        a_urls = (
            batch["after_url"].to_pylist()
            if "after_url" in names else [None] * len(qids)
        )
        for qid, q, lang, a_key, a_url in zip(
            qids, queries, langs, a_keys, a_urls
        ):
            idx = self.cache.get(lang)
            if idx is None:
                continue
            tokens = tokenize_cfg(q, lang, self.tok)
            if not tokens:
                continue
            if a_key is not None:
                if a_url is None:
                    raise ValueError(
                        "search-after cursor for query_id="
                        f"{qid!r} has after_score_x={a_key!r} but a "
                        "missing/null after_url; both cursor fields "
                        "must be present"
                    )
                scores = score_bm25_taat(idx, tokens, self.cfg)
                dele = self._deleted_ids(lang)
                if dele is not None and dele.size:
                    scores[dele] = 0.0
                # cursor key lives in the rank-key domain: rounded keys
                # are integers (score * 10^dp), raw keys (round_dp=None,
                # the oracle rank-identity mode) are float scores —
                # int() there would silently truncate the cursor.
                cursor_key = (
                    int(a_key) if self.round_dp is not None else float(a_key)
                )
                ranks, sel, keys = topk_with_ties(
                    scores, idx.urls, self.cfg.k, self.round_dp,
                    after=(cursor_key, a_url),
                )
                if len(ranks) == 0:
                    continue
                parts.append(
                    _rows(qid, ranks, sel, keys, scores, idx.urls,
                          self.round_dp)
                )
                continue
            dele = self._deleted_ids(lang)
            if dele is not None and dele.size:
                # a shard with live tombstones scores via masked exact
                # TAAT (WAND/MaxScore bounds don't know about deletions);
                # the accelerated paths come back after compaction
                scores = score_bm25_taat(idx, tokens, self.cfg)
                scores[dele] = 0.0
                ranks, sel, keys = topk_with_ties(
                    scores, idx.urls, self.cfg.k, self.round_dp
                )
                if len(ranks) == 0:
                    continue
                parts.append(
                    _rows(qid, ranks, sel, keys, scores, idx.urls,
                          self.round_dp)
                )
                continue
            if self.method == "wand":
                top = score_query_wand(
                    idx, tokens, self.cfg, self.cfg.k, self.round_dp
                )
                if not top:
                    continue
                scores = np.array([s for s, _ in top])
                sel = np.array([d for _, d in top], dtype=np.int64)
                keys = (
                    np.floor(scores * (10.0 ** self.round_dp) + 0.5)
                    if self.round_dp is not None
                    else scores
                )
                order = np.lexsort((idx.urls[sel], -keys))
                parts.append(
                    {
                        "query_id": [qid] * len(order),
                        "rank": list(range(1, len(order) + 1)),
                        "url": list(idx.urls[sel[order]]),
                        "score": list(scores[order]),
                        # same contract as _rows: score_x is only defined
                        # under fixed-point rounding
                        "score_x": [int(k) for k in keys[order]]
                        if self.round_dp is not None
                        else [0] * len(order),
                    }
                )
            elif self.method == "maxscore":
                sub_scores, cand = score_bm25_maxscore(
                    idx, tokens, self.cfg, self.cfg.k, round_dp=self.round_dp
                )
                if cand is None:
                    # dense exact-TAAT fallback: rank the dense array
                    # directly (compacting ~N candidates first would just
                    # add three dense passes)
                    ranks, sel, keys = topk_with_ties(
                        sub_scores, idx.urls, self.cfg.k, self.round_dp
                    )
                    if len(ranks) == 0:
                        continue
                    parts.append(
                        _rows(qid, ranks, sel, keys, sub_scores, idx.urls,
                              self.round_dp)
                    )
                    continue
                if cand.size == 0:
                    continue
                # keep the candidate→url mapping LAZY: cand is the full
                # maxscore candidate set (often 10k+ docs/query) and
                # topk_with_ties only reads the ~k-sized preselect sliver;
                # eagerly decoding every candidate's url costs more than
                # the scoring itself
                urls = idx.urls
                sub_urls = (
                    urls.select(cand) if hasattr(urls, "select") else urls[cand]
                )
                ranks, sel, keys = topk_with_ties(
                    sub_scores, sub_urls, self.cfg.k, self.round_dp
                )
                if len(ranks) == 0:
                    continue
                parts.append(
                    _rows(qid, ranks, sel, keys, sub_scores, sub_urls, self.round_dp)
                )
            else:
                scores = score_bm25_taat(idx, tokens, self.cfg)
                ranks, sel, keys = topk_with_ties(
                    scores, idx.urls, self.cfg.k, self.round_dp
                )
                if len(ranks) == 0:
                    continue
                parts.append(
                    _rows(qid, ranks, sel, keys, scores, idx.urls, self.round_dp)
                )
        return _concat(parts)


# --------------------------------------------------------------- task pool
# Per-WORKER-PROCESS stage cache backing the task-pool serving mode
# (``pipelines.query`` ``pool="task"``): plain-function ``map_batches``
# tasks land on Ray's pre-started worker processes, so serving pays NO
# actor spawn/import ramp — the first task on each worker builds the
# stage once (a zero-copy map of the shared plasma payload) and every
# later task on that worker reuses it. Only sound when ``shared_refs``
# carries the shard payloads: without them each worker would re-read
# the shard from disk, and the ACTOR pool (which bounds the number of
# loads) is the right tool. Capped LRU: stages hold zero-copy views
# plus a vocab-sized term dict, so unbounded growth across many
# distinct serving configs would pin real memory per worker.
_PROC_STAGES: "dict" = {}
_PROC_STAGES_CAP = 4


def scorer_task(batch, *, key, cls, kwargs):
    """Task-pool adapter: build-or-reuse the scorer stage keyed by the
    driver-chosen ``key`` (stable across one serving call), then score
    the batch. See ``_PROC_STAGES`` for the cache contract."""
    import os as _os
    import time as _time

    trace = _os.environ.get("GRAFT_SCORE_TRACE") == "1"
    t0 = _time.perf_counter() if trace else 0.0
    stage = _PROC_STAGES.get(key)
    built = stage is None
    if stage is None:
        if len(_PROC_STAGES) >= _PROC_STAGES_CAP:
            _PROC_STAGES.pop(next(iter(_PROC_STAGES)))
        stage = _PROC_STAGES[key] = cls(**kwargs)
    if not trace:
        return stage(batch)
    t1 = _time.perf_counter()
    out = stage(batch)
    t2 = _time.perf_counter()
    import sys as _sys

    print(
        f"SCORETRACE pid={_os.getpid()} built={int(built)} "
        f"build_ms={(t1 - t0) * 1e3:.1f} score_ms={(t2 - t1) * 1e3:.1f} "
        f"rows={batch.num_rows} t_end={t2:.3f}",
        file=_sys.stderr, flush=True,
    )
    return out


class LMScorerStage:
    """Dirichlet-smoothed query-likelihood top-k (the reference's dead
    A10 semantic, served live): (query_id, query, lang) → result rows.

    Unlike BM25, every shard doc scores (missing terms contribute the
    smoothed background), so ranking uses :func:`topk_all` — no
    positive-score filter. A query with no in-vocabulary term emits no
    rows (matching the SQL oracle's inner join against cf)."""

    def __init__(
        self,
        index_dir: str,
        mu: float = 2000.0,
        tokenizer: TokenizerConfig = TokenizerConfig(),
        k: int = 10,
        round_dp=4,
        shared_refs=None,
    ):
        self.cache = _IndexCache(index_dir, shared_refs)
        self.mu = mu
        self.tok = tokenizer
        self.k = k
        self.round_dp = round_dp

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for qid, q, lang in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            batch["lang"].to_pylist(),
        ):
            idx = self.cache.get(lang)
            if idx is None:
                continue
            tokens = tokenize_cfg(q, lang, self.tok)
            if not tokens:
                continue
            scores = score_lm_dirichlet_taat(idx, tokens, mu=self.mu)
            if scores is None:
                continue
            ranks, sel, keys = topk_all(scores, idx.urls, self.k, self.round_dp)
            if len(ranks):
                parts.append(
                    _rows(qid, ranks, sel, keys, scores, idx.urls, self.round_dp)
                )
        return _concat(parts)


class CosineScorerStage:
    """TF-IDF cosine top-k (C5), optional BM25 rerank (C3/C6 two-stage)."""

    def __init__(
        self,
        index_dir: str,
        tokenizer: TokenizerConfig = TokenizerConfig(),
        k: int = 10,
        candidates: int = 200,
        rerank: bool = False,
        rerank_cfg: BM25Config = BM25Config(k1=1.5, b=0.75, idf="cosine"),
        round_dp=4,
        shared_refs=None,
    ):
        self.cache = _IndexCache(index_dir, shared_refs)
        self.tok = tokenizer
        self.k = k
        self.candidates = candidates
        self.rerank = rerank
        self.rcfg = rerank_cfg
        self.round_dp = round_dp

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for qid, q, lang in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            batch["lang"].to_pylist(),
        ):
            idx = self.cache.get(lang)
            if idx is None:
                continue
            tokens = tokenize_cfg(q, lang, self.tok)
            if not tokens:
                continue
            cos = score_cosine_taat(idx, tokens)
            if not self.rerank:
                ranks, sel, keys = topk_with_ties(cos, idx.urls, self.k, self.round_dp)
                if len(ranks):
                    parts.append(_rows(qid, ranks, sel, keys, cos, idx.urls, self.round_dp))
                continue
            # two-stage: cosine top-candidates → BM25 rerank with the C3
            # doc-length quirk (dl = sum of query-term tfs in the doc,
            # cosine_similarity_bm25_reranking.py:187)
            c_ranks, c_sel, _ = topk_with_ties(
                cos, idx.urls, self.candidates, self.round_dp
            )
            if len(c_sel) == 0:
                continue
            rescores = self._bm25_rerank(idx, tokens, c_sel)
            keys = (
                np.floor(rescores * (10.0 ** self.round_dp) + 0.5)
                if self.round_dp is not None
                else rescores
            )
            pos = rescores > 0
            csel, ckeys, cscores = c_sel[pos], keys[pos], rescores[pos]
            if len(csel) == 0:
                continue
            order = np.lexsort((idx.urls[csel], -ckeys))[: self.k]
            parts.append(
                {
                    "query_id": [qid] * len(order),
                    "rank": list(range(1, len(order) + 1)),
                    "url": list(idx.urls[csel[order]]),
                    "score": list(cscores[order]),
                    "score_x": [int(k) for k in ckeys[order]]
                    if self.round_dp is not None
                    else [0] * len(order),
                }
            )
        return _concat(parts)

    def _bm25_rerank(self, idx, tokens, cand: np.ndarray) -> np.ndarray:
        """C3: iterate query tokens WITH duplicates; idf law 'cosine';
        doc_length = sum of query-term tfs (duplicates double-count)."""
        cfg = self.rcfg
        cand_pos = {int(d): i for i, d in enumerate(cand)}
        tf_cols = {}
        for term in set(tokens):
            p = idx.postings(term)
            if p is None:
                continue
            doc_ids, tfs = p
            col = np.zeros(len(cand), dtype=np.float64)
            mask = np.isin(doc_ids, cand)
            for d, t in zip(doc_ids[mask], tfs[mask]):
                col[cand_pos[int(d)]] = t
            tf_cols[term] = col
        if not tf_cols:
            return np.zeros(len(cand))
        dlq = np.zeros(len(cand), dtype=np.float64)
        for term in tokens:  # duplicates count twice (reference :187)
            if term in tf_cols:
                dlq += tf_cols[term]
        scores = np.zeros(len(cand), dtype=np.float64)
        for term in tokens:  # duplicates iterate twice
            if term not in tf_cols:
                continue
            tf = tf_cols[term]
            idf = idx.idf(term, cfg.idf)
            denom = tf + cfg.k1 * (1.0 - cfg.b + cfg.b * (dlq / idx.avgdl))
            scores += idf * (tf * (cfg.k1 + 1.0)) / np.where(denom == 0, 1.0, denom)
        return scores
