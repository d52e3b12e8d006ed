"""Term-range-sharded BM25 serving — the (lang, term-range) axis of the
SCALE.md shard grid.

Doc-range sharding (pipelines/sharded.py) bounds the DOCUMENT side of a
shard server; this module bounds the VOCABULARY side: when one
language's posting lists exceed a node (the reference's per-language
in-RAM model, final_implementation.py:290-322, simply assumes they fit),
the postings are split into term-RANGE buckets with boundaries chosen by
cumulative posting volume, so every bucket server loads an
~equal-bytes slice of the posting lists. At 10^12 docs the full grid is
(doc-range × term-range); the two modules compose because each is
rank-identical to the unsharded index on its own axis.

Serving differs structurally from doc-range sharding: term buckets
partition each document's SCORE (a doc's BM25 total is the sum of
per-term contributions living in different buckets), so per-bucket
top-k is unsound — instead each bucket emits its full partial-score
candidate rows and a query-hash merge SUMS partials per (query, doc)
before one global top-k:

1. **Route** — queries are tokenized once in a fan-out map and
   replicated only to the buckets owning >= 1 query term (binary search
   of the token against the broadcast cut list — no index access).
2. **Score** — a (bucket, qpart) group stage scores its bucket's terms
   with plain ``score_bm25_taat`` over a stock :class:`LangIndex` view
   of the bucket shard: the bucket carries every owned term's FULL
   posting list and df, plus the base manifest's global (N, avgdl), so
   idf and length normalization are exact with zero new scoring code.
3. **Merge** — partial rows (query, lang, doc_id, score) hash-merge on
   query_id; totals feed the canonical ``topk_with_ties`` with urls
   resolved from the shared docmap (loaded once per merge actor).

Exactness: rank-identical to the single index at the serving contract
(fixed-point ``score_x`` + (score_x desc, url asc) ties — tested).  Raw
float scores may differ by ulps: a distributed sum regroups the
per-term additions, like any cross-node reduction.

Bucket layout (built once by :func:`build_term_buckets`)::

    out_dir/term_buckets.json            {"cuts": {lang: [...]}, ...}
    out_dir/postings_split/lang=L/tbucket=B/*.parquet
    out_dir/bucket-000B/
        manifests/<lang>/manifest.json   (copy — global N/avgdl/block_size)
        postings/lang=L  -> ../../postings_split/lang=L/tbucket=B
        docmap/lang=L    -> <base>/docmap/lang=L      (shared, not copied)

Each ``bucket-*`` dir is a complete, stock-loadable shard: ``LangIndex``
(and ``build_shared_payload``) read it unchanged; the docmap symlink is
the "bounded slice" contract — doc-side arrays are shared, postings are
the per-bucket slice.
"""

from __future__ import annotations

import json
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
from ..state.index_shard import LangIndex, topk_with_ties
from ..state.manifest import read_manifest, write_manifest
from ..stages.index_build import add_kpart
from ..util import default_pool

BUCKETS_JSON = "term_buckets.json"


def _langs_of(d: str) -> list:
    mdir = os.path.join(d, "manifests")
    return sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []


def cuts_from_sorted_vocab(terms: np.ndarray, dfs: np.ndarray,
                           num_buckets: int) -> list:
    """Exact cut selection over an already-sorted (term, df) vocabulary:
    cut where cumulative df crosses each 1/B quantile of the lang's
    total postings. The distributed path (:func:`compute_term_cuts`)
    must reproduce this byte-for-byte (tests/test_term_sharded.py)."""
    cum = np.cumsum(dfs)
    total = int(cum[-1]) if len(cum) else 0
    targets = [total * k // num_buckets for k in range(1, num_buckets)]
    cut_pos = np.searchsorted(cum, targets, side="left") + 1
    cut_pos = np.minimum(cut_pos, len(terms))
    return [str(terms[p]) for p in cut_pos if p < len(terms)]


def compute_term_cuts(index_dir: str, num_buckets: int,
                      prefix_len: int = 2,
                      max_fetch_terms: int = 2_000_000) -> dict:
    """Distributed cut selection — byte-identical to sorting each
    language's full vocabulary (:func:`cuts_from_sorted_vocab`, tested)
    WITHOUT materializing a vocab-sized column on the driver (at the
    10^8–10^9-term vocabularies SCALE.md projects, ``to_pylist`` of the
    df table is GBs of Python strings).

    Two bounded passes over the df table (vocab-sized, tiny next to the
    postings):

    1. **Histogram** — per-batch (lang, term-prefix) → (Σdf, #terms)
       partials folded on the driver (the guarded-fold pattern of the
       build's df fold): a few thousand rows regardless of vocab size.
       Because a k-codepoint prefix is an order-preserving projection of
       the term sort, each cumulative-df target's crossing term lands in
       exactly one prefix range.
    2. **Fetch** — only the crossing prefix ranges (plus each successor,
       for the ``+1`` boundary step) are read back; the driver sorts
       those narrow ranges exactly and picks the boundary term with the
       same searchsorted arithmetic as the in-memory path.

    If the needed ranges would exceed ``max_fetch_terms``, the prefix is
    lengthened and the histogram re-run (each retry is one more cheap
    df-table pass; at web scale 4–6 codepoints isolate any range)."""
    df_root = os.path.join(index_dir, "df")

    prev_est = None
    for attempt in range(4):
        plen = prefix_len + 2 * attempt

        def hist_batch(t: pa.Table, plen=plen) -> pa.Table:
            pref = pc.utf8_slice_codeunits(
                pc.cast(t["term"], pa.string()), 0, plen)
            tt = pa.table({"lang": t["lang"], "prefix": pref, "df": t["df"]})
            g = tt.group_by(["lang", "prefix"]).aggregate(
                [("df", "sum"), ("df", "count")])
            return g.rename_columns(["lang", "prefix", "df_sum", "n_terms"])

        parts = ray.data.read_parquet(
            df_root, columns=["term", "df", "lang"]
        ).map_batches(hist_batch, batch_format="pyarrow").take_all()
        hist = pd.DataFrame(parts)
        if hist.empty:
            return {}
        hist = hist.groupby(["lang", "prefix"], sort=True).sum().reset_index()

        # locate each target's crossing prefix + successor, per lang
        need: dict = {}      # lang -> set of prefixes to fetch
        plan: dict = {}      # lang -> list of (target, prefix_idx)
        meta: dict = {}      # lang -> (prefixes, df_before, nterms_before,
        #                               total_df, total_terms)
        for lang, h in hist.groupby("lang", sort=True):
            h = h.sort_values("prefix", kind="stable")
            prefixes = h["prefix"].to_numpy(dtype=object)
            df_sum = h["df_sum"].to_numpy(dtype=np.int64)
            n_terms = h["n_terms"].to_numpy(dtype=np.int64)
            cum_df = np.cumsum(df_sum)
            total = int(cum_df[-1])
            total_terms = int(n_terms.sum())
            df_before = cum_df - df_sum
            nterms_before = np.cumsum(n_terms) - n_terms
            meta[lang] = (prefixes, df_before, nterms_before,
                          total, total_terms)
            need[lang] = set()
            plan[lang] = []
            for k in range(1, num_buckets):
                target = total * k // num_buckets
                pi = int(np.searchsorted(cum_df, target, side="left"))
                pi = min(pi, len(prefixes) - 1)
                plan[lang].append((target, pi))
                need[lang].add(str(prefixes[pi]))
                if pi + 1 < len(prefixes):
                    need[lang].add(str(prefixes[pi + 1]))

        est = sum(
            int(hist[(hist["lang"] == lang)
                     & (hist["prefix"].isin(ps))]["n_terms"].sum())
            for lang, ps in need.items()
        )
        # stop when within budget OR when longer prefixes no longer
        # shrink the ranges (the floor is ~2 boundary terms per target
        # per lang — full-length prefixes can't isolate below that)
        if est <= max_fetch_terms or est == prev_est:
            break
        prev_est = est

    need_keys = {f"{lang}\x00{p}" for lang, ps in need.items() for p in ps}

    def fetch_batch(t: pa.Table, plen=plen) -> pa.Table:
        pref = pc.utf8_slice_codeunits(
            pc.cast(t["term"], pa.string()), 0, plen)
        keys = pc.binary_join_element_wise(
            pc.cast(t["lang"], pa.string()), pref, "\x00")
        return t.filter(pc.is_in(keys, value_set=pa.array(sorted(need_keys))))

    fetched = pd.DataFrame(
        ray.data.read_parquet(df_root, columns=["term", "df", "lang"])
        .map_batches(fetch_batch, batch_format="pyarrow").take_all()
    )

    cuts: dict = {}
    for lang, (prefixes, df_before, nterms_before,
               total, total_terms) in meta.items():
        rows = fetched[fetched["lang"] == lang] if len(fetched) else fetched
        by_prefix: dict = {}
        if len(rows):
            terms_all = rows["term"].to_numpy(dtype=object)
            dfs_all = rows["df"].to_numpy(dtype=np.int64)
            pref_all = np.asarray([t[:plen] for t in terms_all], dtype=object)
            for p in np.unique(pref_all):
                m = pref_all == p
                ts, ds_ = terms_all[m], dfs_all[m]
                order = np.argsort(ts)
                by_prefix[str(p)] = (ts[order], ds_[order])
        out = []
        for target, pi in plan[lang]:
            p = str(prefixes[pi])
            ts, ds_ = by_prefix.get(p, (np.array([], dtype=object),
                                        np.array([], dtype=np.int64)))
            local_cum = int(df_before[pi]) + np.cumsum(ds_)
            pos_local = int(np.searchsorted(local_cum, target, side="left"))
            cut_pos = int(nterms_before[pi]) + pos_local + 1
            if cut_pos >= total_terms:
                continue
            if pos_local + 1 < len(ts):
                out.append(str(ts[pos_local + 1]))
            else:
                nxt = by_prefix[str(prefixes[pi + 1])][0]
                out.append(str(nxt[0]))
        cuts[str(lang)] = out
    return cuts


def build_term_buckets(index_dir: str, out_dir: str,
                       num_buckets: int = 4) -> dict:
    """Split each language's postings into ``num_buckets`` term-RANGE
    buckets balanced by cumulative posting volume (sum of df), and lay
    out one stock-loadable shard dir per bucket (module docstring).

    Boundary choice: terms sorted lexicographically, cut where the
    cumulative df crosses each 1/B quantile of the lang's total postings
    — Zipf-head terms land alone in a bucket rather than skewing one
    server (the term-side analog of the build's hot-term salting). Cuts
    come from :func:`compute_term_cuts` (distributed — no vocab-sized
    driver materialization); the postings split is ONE streaming pass
    over all langs. Returns the routing table ``{"num_buckets": B,
    "cuts": {lang: [first term of bucket 1..B-1]}}`` (also written to
    ``out_dir/term_buckets.json``)."""
    langs = _langs_of(index_dir)
    if not langs:
        raise FileNotFoundError(f"no committed manifests under {index_dir}")
    cuts = compute_term_cuts(index_dir, num_buckets)
    for lang in langs:  # a committed lang with an empty vocab still routes
        cuts.setdefault(lang, [])

    # slice the postings by (lang, bucket): one streaming pass over the
    # whole postings tree (hive `lang` column), hive output — a single
    # Ray job instead of one executor ramp per lang
    cuts_np = {l: np.asarray(v, dtype=object) for l, v in cuts.items()}

    def assign(t: pa.Table) -> pa.Table:
        lang_arr = np.asarray(t["lang"].to_pylist(), dtype=object)
        terms = np.asarray(t["term"].to_pylist(), dtype=object)
        tb = np.zeros(len(terms), dtype=np.int64)
        for lang in np.unique(lang_arr):
            lc = cuts_np.get(str(lang))
            if lc is not None and len(lc):
                m = lang_arr == lang
                tb[m] = np.searchsorted(lc, terms[m], side="right")
        return t.append_column("tbucket", pa.array(tb, pa.int64()))

    ray.data.read_parquet(
        os.path.join(index_dir, "postings")
    ).map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "postings_split"),
        partition_cols=["lang", "tbucket"],
    )

    # per-bucket stock shard dirs: manifest copies + symlinked slices
    for b in range(num_buckets):
        bdir = os.path.join(out_dir, f"bucket-{b:04d}")
        for lang in langs:
            m = read_manifest(os.path.join(index_dir, "manifests", lang))
            write_manifest(os.path.join(bdir, "manifests", lang), {
                **{k: v for k, v in m.items()
                   if k not in ("committed", "schema_version")},
                "term_bucket": b,
                "term_buckets_total": num_buckets,
            })
            split = os.path.join(out_dir, "postings_split", f"lang={lang}",
                                 f"tbucket={b}")
            os.makedirs(split, exist_ok=True)
            if not any(f.endswith(".parquet") for f in os.listdir(split)):
                # a lang whose vocab all landed elsewhere: an EMPTY
                # parquet with the base postings schema keeps the bucket
                # stock-loadable (0 terms, full doc space)
                base_post = os.path.join(index_dir, "postings",
                                         f"lang={lang}")
                sch = pq.read_schema(
                    os.path.join(base_post, sorted(
                        f for f in os.listdir(base_post)
                        if f.endswith(".parquet")
                    )[0])
                )
                pq.write_table(sch.empty_table(),
                               os.path.join(split, "empty.parquet"))
            pdir = os.path.join(bdir, "postings")
            os.makedirs(pdir, exist_ok=True)
            link = os.path.join(pdir, f"lang={lang}")
            if not os.path.islink(link):
                os.symlink(os.path.relpath(split, pdir), link)
            ddir = os.path.join(bdir, "docmap")
            os.makedirs(ddir, exist_ok=True)
            dlink = os.path.join(ddir, f"lang={lang}")
            if not os.path.islink(dlink):
                os.symlink(
                    os.path.abspath(
                        os.path.join(index_dir, "docmap", f"lang={lang}")
                    ),
                    dlink,
                )
    table = {"num_buckets": num_buckets, "cuts": cuts}
    with open(os.path.join(out_dir, BUCKETS_JSON), "w") as f:
        json.dump(table, f, indent=2, sort_keys=True)
    return table


def read_term_buckets(out_dir: str) -> dict:
    with open(os.path.join(out_dir, BUCKETS_JSON)) as f:
        return json.load(f)


class TermBucketScorer:
    """(bucket, qpart) group stage → per-bucket PARTIAL score rows
    (query_id, lang, doc_id, score). Bucket shards load through the
    stock ``LangIndex`` (tiny LRU, as in the doc-range scorer); a doc's
    rows from different buckets are summed by the merge stage."""

    MAX_CACHED_VIEWS = 2

    def __init__(self, buckets_dir: str, num_buckets: int, cfg: BM25Config,
                 tokenizer: TokenizerConfig):
        from collections import OrderedDict

        self.buckets_dir = buckets_dir
        self.num_buckets = num_buckets
        self.cfg = cfg
        self.tok = tokenizer
        self._cache: "OrderedDict" = OrderedDict()

    def _idx(self, bucket: int, lang: str):
        key = (bucket, lang)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        try:
            idx = LangIndex(
                os.path.join(self.buckets_dir, f"bucket-{bucket:04d}"), lang
            )
        except FileNotFoundError:
            idx = None
        self._cache[key] = idx
        if len(self._cache) > self.MAX_CACHED_VIEWS:
            self._cache.popitem(last=False)
        return idx

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.index_shard import score_bm25_taat

        qids = batch["query_id"].to_pylist()
        qs = batch["query"].to_pylist()
        langs = batch["lang"].to_pylist()
        buckets = batch["tbucket"].to_pylist()
        order = np.lexsort(
            (np.asarray(langs, dtype=object),
             np.asarray(buckets, dtype=np.int64))
        )
        out_qid, out_lang, out_doc, out_score = [], [], [], []
        for i in order:
            qid, q, lang, b = qids[i], qs[i], langs[i], int(buckets[i])
            idx = self._idx(b, lang)
            if idx is None:
                continue
            tokens = tokenize_cfg(q, lang, self.tok)
            if not tokens:
                continue
            scores = score_bm25_taat(idx, tokens, self.cfg)
            nz = np.flatnonzero(scores)
            if nz.size == 0:
                continue
            out_qid.append(np.full(nz.size, qid, dtype=object))
            out_lang.append(np.full(nz.size, lang, dtype=object))
            out_doc.append(nz.astype(np.int64))
            out_score.append(scores[nz])
        if not out_qid:
            return pa.table({
                "query_id": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
        return pa.table({
            "query_id": pa.array(np.concatenate(out_qid), pa.string()),
            "lang": pa.array(np.concatenate(out_lang), pa.string()),
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            "score": pa.array(np.concatenate(out_score), pa.float64()),
        })


def _load_urls(index_dir: str, lang: str) -> np.ndarray:
    """urls in dense doc-id order from the shared docmap (the merge
    stage's only doc-side artifact — the docmap-server role)."""
    dm = pq.read_table(
        os.path.join(index_dir, "docmap", f"lang={lang}"),
        columns=["doc_id", "url"],
    )
    order = np.argsort(dm["doc_id"].to_numpy(zero_copy_only=False))
    return np.asarray(dm["url"].to_pylist(), dtype=object)[order]


# per-WORKER-PROCESS url-array cache for the task-based merge: merge
# groups run as plain tasks (a second ACTOR pool here would deadlock
# small CPU budgets — scorer pool + merge pool + shuffle tasks), and
# the docmap read amortizes across the groups each worker processes.
_URL_CACHE: dict = {}
_URL_CACHE_CAP = 4


def _cached_urls(index_dir: str, lang: str) -> np.ndarray:
    key = (index_dir, lang)
    hit = _URL_CACHE.get(key)
    if hit is None:
        if len(_URL_CACHE) >= _URL_CACHE_CAP:
            _URL_CACHE.pop(next(iter(_URL_CACHE)))
        hit = _URL_CACHE[key] = _load_urls(index_dir, lang)
    return hit


def merge_term_partials(g: pd.DataFrame, index_dir: str, k: int,
                        round_dp=4) -> pd.DataFrame:
    """qpart merge: sum partial scores per (query, doc), then the
    canonical top-k on (score_x desc, url asc). Urls come from the
    shared docmap via the per-worker cache."""
    from ..stages.score import _concat, _rows

    g = g.drop(columns=[c for c in ("kpart",) if c in g.columns])
    parts = []
    for (qid, lang), rows in g.groupby(["query_id", "lang"], sort=True):
        sums = rows.groupby("doc_id", sort=True)["score"].sum()
        cand = sums.index.to_numpy(dtype=np.int64)
        totals = sums.to_numpy(dtype=np.float64)
        pos = totals > 0
        cand, totals = cand[pos], totals[pos]
        if cand.size == 0:
            continue
        urls_sub = _cached_urls(index_dir, lang)[cand]
        ranks, sel, keys = topk_with_ties(totals, urls_sub, k, round_dp)
        if len(ranks) == 0:
            continue
        parts.append(
            _rows(qid, ranks, sel, keys, totals, urls_sub, round_dp)
        )
    return _concat(parts).to_pandas()


# ------------------------------------------------------- pruned serving
# DISTRIBUTED MaxScore over the term-range bucket group: the single-
# index MaxScore plan (state/index_shard.py:score_bm25_maxscore) with
# each term's step executed by its OWNING bucket.
#
#   P1  every bucket holding a RARE query term (df <= hot_df) emits that
#       term's full (doc, contribution) postings — Σ df(rare) rows, the
#       same candidate-generation work as single-index MaxScore, just
#       partitioned; the coordinator merges them into the candidate set.
#   P2  every bucket holding a HOT term gathers its contribution for
#       exactly the candidate docs (searchsorted into its cached
#       postings — |C| rows back) and reports the term's clamped upper
#       bound from its block metadata.
#   SAFE when rounded(Σ hot upper bounds) < rounded(k-th candidate
#       total) and the candidates fill the top-k — identical to the
#       single-index check, so the fast path holds exactly as often
#       (Zipf head terms have tiny idf; flat-partial workloads that
#       defeat per-bucket top-m exchanges don't defeat this). Otherwise
#       the exact full-TAAT merge runs.
#
# A first-cut top-m-per-bucket exchange (pipelined term-distributed
# evaluation) was measured at 77% certification failure on the Zipf
# workload — per-bucket m-th-partial bounds are too flat to beat a
# k-th-best SUM threshold; anchoring candidates on rare terms is what
# makes single-index MaxScore work, and it distributes cleanly because
# a term lives in exactly one bucket.
#
# Exchange volume: Σ df(rare) + |C|·#hot rows instead of every
# positive partial (corpus-sized for hot terms) under the TAAT merge.


def score_term_sharded_pruned(buckets: list, tokens, cfg: BM25Config,
                              k: int = 10, round_dp=4,
                              hot_df: int = 50_000):
    """Exact global top-k over a term-range bucket group WITHOUT a full
    TAAT of every bucket (header comment). ``buckets`` = LangIndex per
    bucket (None for buckets not holding this lang). Returns
    (totals, cand_doc_ids) — rank with ``topk_with_ties`` over the
    group's shared urls. Rank-identical to the single index (tested)."""
    from ..state.index_shard import _bm25_contrib, _term_weights

    active = []
    for idx in buckets:
        if idx is None:
            continue
        btoks = [t for t in tokens if t in idx._terms]
        if btoks:
            active.append((idx, btoks))
    if not active:
        return np.empty(0, np.float64), np.empty(0, np.int64)

    rare, hot = [], []  # (bucket idx, term, weight)
    for bidx, btoks in active:
        for t, w in _term_weights(btoks, cfg.compat):
            d = bidx.df(t)
            if d is None:
                continue
            (rare if d <= hot_df else hot).append((bidx, t, w))
    if not rare and not hot:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    if not rare:  # stopword-class query: no candidate anchor — exact merge
        return _term_sharded_taat(active, cfg)

    # P1: candidate set from the rare terms' owning buckets — dense
    # scatter vs sparse unique+bincount by the same crossover as
    # single-index MaxScore (O(n_docs) zero+scan vs O(R log R) sort)
    n_docs = active[0][0].n_docs
    ids_parts, contrib_parts = [], []
    R = 0
    for bidx, t, w in rare:
        doc_ids = bidx.postings(t)[0]
        idf = bidx.idf(t, cfg.idf)
        ids_parts.append(doc_ids.astype(np.int64, copy=False))
        contrib_parts.append((w * idf) * bidx.term_contrib(t, cfg))
        R += len(doc_ids)
    if n_docs <= (1 << 19) or R >= n_docs // 8:
        scores = np.zeros(n_docs, dtype=np.float64)
        for doc_ids, con in zip(ids_parts, contrib_parts):
            scores[doc_ids] += con
        cand = np.nonzero(scores > 0)[0]
        cscores = scores[cand]
    else:
        all_ids = np.concatenate(ids_parts)
        cand, inv = np.unique(all_ids, return_inverse=True)
        cscores = np.bincount(
            inv, weights=np.concatenate(contrib_parts), minlength=cand.size)
        pos_mask = cscores > 0
        cand, cscores = cand[pos_mask], cscores[pos_mask]

    # P2: hot-term gathers onto the candidates + clamped upper bounds
    hot_ub = 0.0
    for bidx, t, w in hot:
        i, _nb = bidx.term_blocks(t)
        mt = bidx._blocks(i, "max_tf").astype(np.float64)
        md = bidx._blocks(i, "min_dl").astype(np.float64)
        idf = bidx.idf(t, cfg.idf)
        ub = float(((w * idf) * _bm25_contrib(mt, md, cfg, bidx.avgdl)).max())
        hot_ub += max(ub, 0.0)  # absent negative-idf term → best case 0
        doc_ids = bidx.postings(t)[0]
        pos = np.searchsorted(doc_ids, cand.astype(doc_ids.dtype, copy=False))
        pos = np.clip(pos, 0, len(doc_ids) - 1)
        match = doc_ids[pos] == cand
        cscores[match] += (w * idf) * bidx.term_contrib(t, cfg)[pos[match]]

    if hot:
        k_eff = min(k, cscores.size)
        kth = (
            np.partition(cscores, cscores.size - k_eff)[cscores.size - k_eff]
            if cscores.size else 0.0
        )
        scale = 10.0 ** round_dp if round_dp is not None else None
        if scale is not None:
            safe = np.floor(hot_ub * scale + 0.5) < np.floor(kth * scale + 0.5)
        else:
            safe = hot_ub < kth
        if not (cscores.size >= k and safe):
            return _term_sharded_taat(active, cfg)  # exact fallback
    return cscores, cand


def _term_sharded_taat(active, cfg: BM25Config):
    """Exact fallback: dense partial sum across buckets (what the batch
    merge computes), candidates = positive totals. One shared
    accumulator — per-bucket arrays + a merge would pay B n_docs-sized
    zero/add passes for the same Σ df of scatter work."""
    from ..state.index_shard import _term_weights

    total = np.zeros(active[0][0].n_docs, np.float64)
    for idx, btoks in active:
        if idx.avgdl <= 0:
            continue
        for term, w in _term_weights(btoks, cfg.compat):
            p = idx.postings(term)
            if p is None:
                continue
            total[p[0]] += (w * idx.idf(term, cfg.idf)) * \
                idx.term_contrib(term, cfg)
    cand = np.flatnonzero(total > 0)
    return total[cand], cand


class TermGroupScorerStage:
    """Colocated bucket-GROUP scorer: one stage instance holds views of
    EVERY term bucket of the langs it serves and answers whole queries
    via :func:`score_term_sharded_pruned` — the coordinator+shards
    topology when a serving replica maps all buckets zero-copy from
    plasma (the buckets partition the postings, so the group costs the
    same bytes as the single index). Batch serving then needs ONE
    map_batches — no per-bucket fan-out, no partial-score exchange, no
    merge shuffle; the fan-out path (:func:`bm25_search_term_sharded`)
    remains the topology for buckets living on different nodes."""

    MAX_CACHED_LANGS = 2

    def __init__(self, index_dir: str, buckets_dir: str, num_buckets: int,
                 cfg: BM25Config, tokenizer: TokenizerConfig,
                 round_dp=4):
        from collections import OrderedDict

        self.index_dir = index_dir
        self.buckets_dir = buckets_dir
        self.num_buckets = num_buckets
        self.cfg = cfg
        self.tok = tokenizer
        self.round_dp = round_dp
        self._cache: "OrderedDict" = OrderedDict()

    def _group(self, lang: str):
        hit = self._cache.get(lang)
        if hit is not None:
            self._cache.move_to_end(lang)
            return hit
        buckets = []
        for b in range(self.num_buckets):
            try:
                buckets.append(LangIndex(
                    os.path.join(self.buckets_dir, f"bucket-{b:04d}"), lang))
            except FileNotFoundError:
                buckets.append(None)
        urls = (_cached_urls(self.index_dir, lang)
                if any(b is not None for b in buckets) else None)
        hit = (buckets, urls)
        self._cache[lang] = hit
        if len(self._cache) > self.MAX_CACHED_LANGS:
            self._cache.popitem(last=False)
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.score import _concat, _rows
        from ..state.index_shard import topk_with_ties

        parts = []
        for qid, q, lang in zip(batch["query_id"].to_pylist(),
                                batch["query"].to_pylist(),
                                batch["lang"].to_pylist()):
            buckets, urls = self._group(lang)
            if urls is None:
                continue
            tokens = tokenize_cfg(q, lang, self.tok)
            if not tokens:
                continue
            totals, cand = score_term_sharded_pruned(
                buckets, tokens, self.cfg, k=self.cfg.k,
                round_dp=self.round_dp)
            if cand.size == 0:
                continue
            urls_sub = urls[cand]
            ranks, sel, keys = topk_with_ties(
                totals, urls_sub, self.cfg.k, self.round_dp)
            if len(ranks):
                parts.append(_rows(qid, ranks, sel, keys, totals,
                                   urls_sub, self.round_dp))
        return _concat(parts)


def bm25_search_term_sharded_pruned(
    queries: ray.data.Dataset,
    index_dir: str,
    buckets_dir: str,
    cfg: BM25Config = BM25Config(),
    tokenizer: TokenizerConfig = TokenizerConfig(),
    round_dp=4,
    concurrency=None,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Rank-identical BM25 over the bucket group via the colocated
    :class:`TermGroupScorerStage` — one actor-pool map, zero shuffles."""
    table = read_term_buckets(buckets_dir)
    if concurrency is None:
        concurrency = default_pool(0.5)
    return queries.map_batches(
        TermGroupScorerStage,
        fn_constructor_kwargs=dict(
            index_dir=index_dir, buckets_dir=buckets_dir,
            num_buckets=int(table["num_buckets"]), cfg=cfg,
            tokenizer=tokenizer, round_dp=round_dp,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def bm25_search_term_sharded(
    queries: ray.data.Dataset,
    index_dir: str,
    buckets_dir: str,
    cfg: BM25Config = BM25Config(),
    tokenizer: TokenizerConfig = TokenizerConfig(),
    round_dp=4,
    concurrency=None,
    num_merge_parts: int = 32,
) -> ray.data.Dataset:
    """Rank-identical BM25 over the term-range bucket group built by
    :func:`build_term_buckets` (``index_dir`` = the base index, for the
    shared docmap; ``buckets_dir`` = the bucket layout)."""
    table = read_term_buckets(buckets_dir)
    cuts = {l: np.asarray(v, dtype=object) for l, v in table["cuts"].items()}
    num_buckets = int(table["num_buckets"])
    if concurrency is None:
        concurrency = default_pool(0.5)

    def fan_out(t: pa.Table) -> pa.Table:
        qids = t["query_id"].to_pylist()
        qs = t["query"].to_pylist()
        langs = t["lang"].to_pylist()
        o_q, o_t, o_l, o_b = [], [], [], []
        for qid, q, lang in zip(qids, qs, langs):
            lc = cuts.get(lang)
            if lc is None:
                continue
            tokens = tokenize_cfg(q, lang, tokenizer)
            if not tokens:
                continue
            tb = np.unique(np.searchsorted(
                lc, np.asarray(tokens, dtype=object), side="right"
            ))
            for b in tb:
                o_q.append(qid)
                o_t.append(q)
                o_l.append(lang)
                o_b.append(int(b))
        return pa.table({
            "query_id": pa.array(o_q, pa.string()),
            "query": pa.array(o_t, pa.string()),
            "lang": pa.array(o_l, pa.string()),
            "tbucket": pa.array(o_b, pa.int64()),
        })

    fanned = queries.map_batches(fan_out, batch_format="pyarrow")

    def add_qpart(t: pa.Table) -> pa.Table:
        t2 = add_kpart(t, num_parts=num_merge_parts, cols=("query_id",))
        return t2.rename_columns(
            ["qpart" if c == "kpart" else c for c in t2.column_names]
        )

    routed = fanned.map_batches(add_qpart, batch_format="pyarrow")
    partials = routed.groupby(["tbucket", "qpart"]).map_groups(
        TermBucketScorer,
        fn_constructor_kwargs=dict(
            buckets_dir=buckets_dir, num_buckets=num_buckets,
            cfg=cfg, tokenizer=tokenizer,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    merged = partials.map_batches(
        add_kpart,
        fn_kwargs={"num_parts": num_merge_parts, "cols": ("query_id",)},
        batch_format="pyarrow",
    ).groupby("kpart").map_groups(
        lambda g: merge_term_partials(g, index_dir, cfg.k, round_dp),
        batch_format="pandas",
    )
    return merged
