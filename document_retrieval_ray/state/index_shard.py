"""Query-time index shard state + scoring kernels.

``LangIndex`` is the per-language immutable shard a scorer actor loads once
(T3 analog: the reference reassembles a whole in-RAM BM25 model per
language from pickle shards, final_implementation.py:223-287; here the
shard is the Parquet index written by pipelines/build_index.py).

Scoring kernels:

- ``score_bm25_taat``  term-at-a-time numpy accumulation into a dense
  per-shard score array — exactly the reference's ``calculate_scores``
  semantics (final_implementation.py:127-145) in vectorized form, with the
  compat quirks behind BM25Config:
    * ``compat="reference"``: UNIQUE query terms; denominator
      ``tf + k1*(1 - b + dl/avgdl)`` (the missing-``b`` quirk at :142)
    * ``compat="standard"``: duplicate terms weighted by multiplicity;
      correct ``b*(dl/avgdl)`` (team_run1.py:193)
  Terms are accumulated in sorted order so distributed and oracle runs
  sum in the same float64 order (SURVEY.md §7 known-hard #1).
- ``score_query_wand``  document-at-a-time WAND over the
  block-structured posting streams: per-term upper bounds are the max of
  the per-block (block_max_tf, block_min_dl) bounds — valid for BOTH
  formulas since the score is increasing in tf and decreasing in dl.
  Skipping is BLOCK-LEVEL via block_last (``skip_to`` jumps whole blocks
  without decoding them); per-block score bounds are used for the term
  upper bound and by MaxScore, not (yet) for per-block WAND pivoting
  (full BMW is a possible refinement).
- ``score_cosine_taat``  TF-IDF cosine path (C5,
  cosine_similarity_bm25_reranking.py:198-226): query weight = idf (tf
  ignored), doc weight = tf*idf, scores normalized by stored doc norms and
  the query norm.
- ``topk_with_ties``   deterministic top-k: rank on the (optionally
  fixed-point-rounded) score desc, then url asc — the engine's canonical
  tie-break (replaces the reference's fragile argpartition tie order,
  final_implementation.py:147-154).
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import BM25Config
from ..functions.varbyte import decode_block, decode_blocked_postings
from .manifest import read_manifest

IDF_LAWS = {
    "lucene": lambda N, df: np.log(1.0 + (N - df + 0.5) / (df + 0.5)),
    "cosine": lambda N, df: np.log((N - df + 0.5) / (df + 0.5)),
    "sklearn": lambda N, df: np.log((N + 1.0) / (df + 1.0)) + 1.0,
}


def build_shared_payload(index_dir: str, lang: str, block_size: int = None,
                         hot_decode_df: int = 50_000,
                         contrib_cfg: "BM25Config" = None,
                         dense_df_frac: int = None) -> dict:
    """Load one language shard into FLAT numpy buffers suitable for
    zero-copy sharing via ``ray.put``: every scorer actor then maps the
    same plasma memory instead of re-reading and re-materializing the
    shard (per-actor load was the dominant cost of the query stage).

    Terms with df >= ``hot_decode_df`` are additionally PRE-DECODED here,
    once, into flat (doc_id, tf) buffers shared with the payload: under a
    Zipf query workload every scorer actor otherwise pays its own decode
    warm-up of the same head terms, a per-actor fixed cost that destroys
    query-stage scaling as the pool grows (observed: 2k queries sped up
    only 1.6× from 4→16 CPUs). Actors read the hot arrays as zero-copy
    plasma views. ``hot_decode_df=0`` disables.

    ``contrib_cfg``: when the serving BM25Config is known up front, the
    per-posting BM25 contribution tf*(k1+1)/(tf + k1*(1-b[+b]*dl/avgdl))
    of every hot term is ALSO precomputed here (it is query-independent:
    idf laws and term weights multiply outside). Scoring a Zipf-head term
    then reads one float64 per posting instead of gathering dl and
    re-deriving the formula (≈5× the traffic) per query per actor. The
    key (k1, b, compat) is stored; scorers fall back to on-the-fly
    computation for any other cfg.

    ``dense_df_frac``: ultra-hot terms — df >= max(hot_decode_df,
    n_docs // dense_df_frac) — additionally get a DENSE float32
    contribution array over the whole doc space (contrib at the doc's
    slot, 0 elsewhere). Scoring such a term is then one sequential
    SIMD multiply-add over 4 bytes/doc instead of a gather+scatter over
    16 bytes/posting (int64 doc_id + float64 contrib): at web-scale
    shards the Zipf head's posting lists have df ≈ n_docs and the
    sparse representation costs ~4× the memory traffic of the dense one
    while defeating the streaming prefetcher. These arrays back
    :func:`score_bm25_dense_est` (estimate + exact float64 rescore —
    results stay bit-identical to TAAT). 0 disables. Memory: one
    float32 × n_docs per dense term, bounded by the df threshold to
    ~dense_df_frac arrays' worth of postings.

    ``dense_df_frac=None`` resolves from the ``DRR_DENSE_DF_FRAC`` env
    var (default 8; **0 disables**) — dense arrays can add up to ~2× the
    Zipf-head postings bytes per lang payload in plasma, so
    memory-constrained deployments opt out without touching call sites.

    Layout: per-term variable-length data (postings bytes, block metadata
    lists) concatenated into one buffer + an int64 offsets array."""
    if dense_df_frac is None:
        dense_df_frac = int(os.environ.get("DRR_DENSE_DF_FRAC", "8"))
    m = read_manifest(os.path.join(index_dir, "manifests", str(lang)))
    if m is None:
        raise FileNotFoundError(f"no committed manifest for lang={lang}")
    post = pq.read_table(
        os.path.join(index_dir, "postings", f"lang={lang}"),
        columns=["term", "df", "postings", "block_off", "block_last",
                 "block_max_tf", "block_min_dl"],
    )

    def _concat_binary(col):
        # zero-copy: the Arrow binary column IS already (values buffer,
        # offsets) — reuse its buffers instead of a per-term Python loop
        # re-concatenating the whole postings payload
        arr = pc.cast(col.combine_chunks(), pa.large_binary())
        n = len(arr)
        if n == 0 or arr.buffers()[1] is None:
            return np.empty(0, np.uint8), np.zeros(n + 1, np.int64)
        off = np.frombuffer(arr.buffers()[1], np.int64)[
            arr.offset : arr.offset + n + 1
        ]
        data = np.frombuffer(arr.buffers()[2] or b"", np.uint8)
        buf = data[off[0] : off[-1]]
        return buf, (off - off[0]).astype(np.int64)

    def _concat_lists(col):
        arr = pc.cast(col.combine_chunks(), pa.large_list(pa.int64()))
        n = len(arr)
        if n == 0 or arr.buffers()[1] is None:
            return np.empty(0, np.int64), np.zeros(n + 1, np.int64)
        off = np.frombuffer(arr.buffers()[1], np.int64)[
            arr.offset : arr.offset + n + 1
        ]
        vals = arr.values.to_numpy(zero_copy_only=False)
        buf = vals[off[0] : off[-1]]
        return buf, (off - off[0]).astype(np.int64)

    post_buf, post_off = _concat_binary(post["postings"])
    bo_buf, bo_off = _concat_lists(post["block_off"])
    bl_buf, _ = _concat_lists(post["block_last"])
    mt_buf, _ = _concat_lists(post["block_max_tf"])
    md_buf, _ = _concat_lists(post["block_min_dl"])

    dm = pq.read_table(
        os.path.join(index_dir, "docmap", f"lang={lang}"),
        columns=["doc_id", "url", "dl"],
    )
    order = np.argsort(dm["doc_id"].to_numpy(zero_copy_only=False))
    # Arrow strings are already utf-8 (values, offsets): take in doc-id
    # order and reuse the buffers — no per-url Python encode loop
    urls_arr = pc.cast(
        dm["url"].combine_chunks().take(pa.array(order)), pa.large_binary()
    )
    if len(urls_arr) == 0 or urls_arr.buffers()[1] is None:
        url_buf = np.empty(0, np.uint8)
        url_off = np.zeros(len(urls_arr) + 1, np.int64)
    else:
        url_off = np.frombuffer(urls_arr.buffers()[1], np.int64)[
            urls_arr.offset : urls_arr.offset + len(urls_arr) + 1
        ]
        url_data = np.frombuffer(urls_arr.buffers()[2] or b"", np.uint8)
        url_buf = url_data[url_off[0] : url_off[-1]]
        url_off = (url_off - url_off[0]).astype(np.int64)

    norms = None
    norms_dir = os.path.join(index_dir, "norms", f"lang={lang}")
    if os.path.isdir(norms_dir):
        nt = pq.read_table(norms_dir, columns=["doc_id", "norm2"])
        n2 = np.zeros(m["n_docs"], dtype=np.float64)
        n2[nt["doc_id"].to_numpy(zero_copy_only=False)] = nt["norm2"].to_numpy(
            zero_copy_only=False
        )
        norms = np.sqrt(n2)

    bs = block_size or m.get("block_size", 128)
    df_arr = post["df"].to_numpy(zero_copy_only=False).astype(np.int64)

    # pre-decode the Zipf head once (shared, zero-copy in plasma)
    hot_rows = (
        np.nonzero(df_arr >= hot_decode_df)[0]
        if hot_decode_df and hot_decode_df > 0
        else np.empty(0, np.int64)
    )
    hot_off = np.zeros(len(hot_rows) + 1, dtype=np.int64)
    dl_f64 = dm["dl"].to_numpy(zero_copy_only=False)[order].astype(np.float64)
    avgdl = m["avgdl"]
    n_docs_m = int(m["n_docs"])
    dense_thr = (
        max(hot_decode_df or 1, n_docs_m // dense_df_frac)
        if contrib_cfg is not None and dense_df_frac and n_docs_m
        else None
    )

    def _decode_one(i: int):
        dpc, tpc = decode_blocked_postings(
            post_buf[post_off[i]:post_off[i + 1]],
            bo_buf[bo_off[i]:bo_off[i + 1]],
            int(df_arr[i]),
            bs,
        )
        # int64 ids: numpy fancy-index assignment converts indices to
        # intp internally, so int32 would force a df-sized conversion on
        # EVERY scatter (measured 1.6× slower than int64 scatter)
        dpc = dpc.astype(np.int64)
        tpc = tpc.astype(np.float64)
        con = (
            _bm25_contrib(tpc, dl_f64[dpc], contrib_cfg, avgdl)
            if contrib_cfg is not None and avgdl > 0
            else None
        )
        dense = None
        if dense_thr is not None and con is not None and int(df_arr[i]) >= dense_thr:
            dense = np.zeros(n_docs_m, np.float32)
            dense[dpc] = con  # round-to-nearest f64→f32 (error ≤ ulp·|c|)
        return dpc, tpc, con, dense

    if len(hot_rows):
        # numpy decode releases the GIL enough for thread parallelism
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as ex:
            decoded = list(ex.map(_decode_one, hot_rows))
        hot_docs_parts = [d for d, _, _, _ in decoded]
        hot_tfs_parts = [t for _, t, _, _ in decoded]
        hot_con_parts = [c for _, _, c, _ in decoded]
        np.cumsum([len(d) for d in hot_docs_parts], out=hot_off[1:])
        dense_rows = np.array(
            [int(r) for r, (_, _, _, dn) in zip(hot_rows, decoded) if dn is not None],
            dtype=np.int64,
        )
        dense_buf = (
            np.stack([dn for _, _, _, dn in decoded if dn is not None])
            if len(dense_rows)
            else np.empty((0, n_docs_m), np.float32)
        )
        dense_cmax = np.array(
            [
                float(c.max()) if c.size else 0.0
                for _, _, c, dn in decoded
                if dn is not None
            ],
            dtype=np.float64,
        )
    else:
        hot_docs_parts, hot_tfs_parts, hot_con_parts = [], [], []
        dense_rows = np.empty(0, np.int64)
        dense_buf = np.empty((0, n_docs_m), np.float32)
        dense_cmax = np.empty(0, np.float64)
    hot_docs = (
        np.concatenate(hot_docs_parts) if hot_docs_parts else np.empty(0, np.int64)
    )
    hot_tfs = (
        np.concatenate(hot_tfs_parts) if hot_tfs_parts else np.empty(0, np.float64)
    )
    hot_contrib = (
        np.concatenate(hot_con_parts)
        if hot_con_parts and hot_con_parts[0] is not None
        else None
    )

    term_arr, term_sorter, term_overflow = _pack_terms(post["term"])

    return {
        "lang": lang,
        "n_docs": m["n_docs"],
        "avgdl": m["avgdl"],
        "block_size": bs,
        "term_arr": term_arr,
        "term_sorter": term_sorter,
        "term_overflow": term_overflow,
        "df": df_arr,
        "post_buf": post_buf, "post_off": post_off,
        "bo_buf": bo_buf, "bo_off": bo_off,
        "bl_buf": bl_buf, "mt_buf": mt_buf, "md_buf": md_buf,
        "dl": dl_f64,
        "url_buf": url_buf, "url_off": url_off,
        "norms": norms,
        "hot_rows": np.asarray(hot_rows, np.int64),
        "hot_docs": hot_docs, "hot_tfs": hot_tfs, "hot_off": hot_off,
        "hot_contrib": hot_contrib,
        "dense_rows": dense_rows, "dense_buf": dense_buf,
        "dense_cmax": dense_cmax,
        "contrib_key": (
            (contrib_cfg.k1, contrib_cfg.b, contrib_cfg.compat)
            if contrib_cfg is not None and hot_contrib is not None
            else None
        ),
    }


_TERM_WIDTH_CAP = 64  # bytes; longer (junk) terms go to the overflow dict


def _pack_terms(term_col) -> tuple:
    """Vocabulary as a FIXED-WIDTH numpy bytes matrix (row order) + an
    argsort permutation — the zero-copy replacement for the old
    per-worker ``{term: row}`` dict. A Python list/dict of the vocab is
    pickled per worker and rebuilt per process (~seconds at the
    multi-million-term vocabularies a bigram tokenizer produces — the
    fixed per-worker cost that capped the ref-compat query stage's N→4N
    scaling); numpy arrays in the payload are plasma-mapped, so lookup
    state costs a worker NOTHING. Terms longer than
    ``_TERM_WIDTH_CAP`` bytes (web junk tail) live in a small pickled
    overflow dict instead of inflating every row's width."""
    tb = pc.cast(term_col.combine_chunks(), pa.large_binary())
    n = len(tb)
    if n == 0:
        return (np.empty(0, dtype="S1"), np.empty(0, np.int64), {})
    off = np.frombuffer(tb.buffers()[1], np.int64)[tb.offset:tb.offset + n + 1]
    vals = np.frombuffer(tb.buffers()[2] or b"", np.uint8)[off[0]:off[-1]]
    off = (off - off[0]).astype(np.int64)
    lens = np.diff(off)
    width = int(min(max(int(lens.max()), 1), _TERM_WIDTH_CAP))
    fit = lens <= width
    overflow = {}
    if not fit.all():
        vb = vals.tobytes()
        for i in np.flatnonzero(~fit):
            overflow[vb[off[i]:off[i + 1]]] = int(i)
    # scatter the utf-8 bytes into the padded matrix (vectorized);
    # overflow rows become all-0xFF sentinels — 0xFF never occurs in
    # valid utf-8, so no probe can ever match one
    out = np.zeros((n, width), np.uint8)
    out[~fit] = 0xFF
    lens_f = np.where(fit, lens, 0)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens_f)
    cols = np.arange(len(rows), dtype=np.int64) - np.repeat(
        np.cumsum(lens_f) - lens_f, lens_f)
    src = np.repeat(off[:-1], lens_f) + cols
    out[rows, cols] = vals[src]
    term_arr = out.view(f"S{width}").ravel()
    return term_arr, np.argsort(term_arr, kind="stable"), overflow


class _TermLookup:
    """dict-shaped (`get` / `in`) exact-match lookup over the packed
    vocabulary: binary search through the shared sorter permutation,
    plus a bounded per-instance cache for the Zipf-head repeats."""

    __slots__ = ("arr", "sorter", "overflow", "width", "cache")
    _CACHE_CAP = 65536

    def __init__(self, arr: np.ndarray, sorter: np.ndarray, overflow: dict):
        self.arr = arr
        self.sorter = sorter
        self.overflow = overflow
        self.width = arr.dtype.itemsize if len(arr) else 0
        self.cache: dict = {}

    def get(self, term, default=None):
        if term in self.cache:
            row = self.cache[term]
            return default if row is None else row
        b = term.encode("utf-8") if isinstance(term, str) else bytes(term)
        row = None
        if len(b) > self.width:
            row = self.overflow.get(b)
        elif len(self.arr):
            pos = int(np.searchsorted(self.arr, np.bytes_(b),
                                      sorter=self.sorter))
            if pos < len(self.arr):
                j = int(self.sorter[pos])
                if self.arr[j] == b:
                    row = j
        if len(self.cache) < self._CACHE_CAP:
            self.cache[term] = row
        return default if row is None else row

    def __contains__(self, term) -> bool:
        return self.get(term) is not None

    def __len__(self) -> int:
        return len(self.arr)

    def __iter__(self):
        # row order, like the dict this replaces (diagnostics/tests only
        # — vocab-sized, never on the serving path)
        inv = {row: b for b, row in self.overflow.items()}
        for i in range(len(self.arr)):
            b = inv.get(i)
            yield (bytes(self.arr[i]) if b is None else b).decode("utf-8")


class LangIndex:
    """One language shard. Construct from a shard directory (reads
    parquet) or from a shared payload (``from_payload`` — zero-copy
    views over plasma buffers)."""

    def __init__(self, index_dir: str, lang: str, block_size: int = None,
                 hot_decode_df: int = 50_000):
        # hot_decode_df: eager pre-decode threshold for the Zipf head
        # (0 disables — per-actor disk loads that never touch head terms
        # can skip the decode cost and the ~5-8× RAM of decoded arrays)
        self._init_from_payload(
            build_shared_payload(index_dir, lang, block_size,
                                 hot_decode_df=hot_decode_df)
        )

    @classmethod
    def from_payload(cls, payload: dict) -> "LangIndex":
        obj = cls.__new__(cls)
        obj._init_from_payload(payload)
        return obj

    def _init_from_payload(self, p: dict) -> None:
        self.lang = p["lang"]
        self.n_docs = p["n_docs"]
        self.avgdl = p["avgdl"]
        self.block_size = p["block_size"]
        self._terms = _TermLookup(
            p["term_arr"], p["term_sorter"], p.get("term_overflow") or {})
        self._df = p["df"]
        self._post_buf, self._post_off = p["post_buf"], p["post_off"]
        self._bo_buf, self._bo_off = p["bo_buf"], p["bo_off"]
        self._bl_buf, self._mt_buf, self._md_buf = p["bl_buf"], p["mt_buf"], p["md_buf"]
        self.dl = p["dl"]
        self._url_buf, self._url_off = p["url_buf"], p["url_off"]
        self.norms = p["norms"]
        self._urls = None
        # zero-copy views over the shared pre-decoded Zipf head
        self._hot: dict = {}
        self._hot_contrib: dict = {}
        self._contrib_key = p.get("contrib_key")
        hot_rows = p.get("hot_rows")
        if hot_rows is not None and len(hot_rows):
            ho = p["hot_off"]
            hd = p["hot_docs"]
            ht = p["hot_tfs"]
            hc = p.get("hot_contrib")
            for j, i in enumerate(hot_rows):
                self._hot[int(i)] = (hd[ho[j]:ho[j + 1]], ht[ho[j]:ho[j + 1]])
                if hc is not None:
                    self._hot_contrib[int(i)] = hc[ho[j]:ho[j + 1]]
        # dense float32 contribution arrays for the ultra-hot head
        # (zero-copy rows of the shared 2-D plasma buffer)
        self._dense: dict = {}
        self._dense_cmax: dict = {}
        dr = p.get("dense_rows")
        if dr is not None and len(dr):
            db, dc = p["dense_buf"], p["dense_cmax"]
            for j, i in enumerate(dr):
                self._dense[int(i)] = db[j]
                self._dense_cmax[int(i)] = float(dc[j])
        self._cmax_cache: dict = {}
        from collections import OrderedDict

        self._decoded: "OrderedDict" = OrderedDict()
        self._decoded_cap = 1024
        # per-instance contribution cache for cfgs the payload didn't
        # precompute (or disk-loaded shards): bounded by ELEMENT count —
        # Zipf-head arrays are df-sized, so an entry cap alone could pin
        # gigabytes per actor
        self._contrib_cache: "OrderedDict" = OrderedDict()
        self._contrib_elems = 0
        self._contrib_elems_cap = 32_000_000  # ≈256 MB of float64
        self._cf_cache: dict = {}
        self._total_dl = None

    @property
    def urls(self) -> "_LazyUrls":
        """Decode-on-demand view over the flat (url_buf, url_off) plasma
        buffers. Scorers only ever index candidate-sized slivers (top-k
        preselects, WAND pivots), so materializing the whole shard's url
        strings per actor — seconds of decode and ~0.5 GB of heap per
        actor at web-scale shards, the query stage's dominant per-actor
        warm-up — is wasted; the view decodes exactly the ids asked for."""
        if self._urls is None:
            self._urls = _LazyUrls(self._url_buf, self._url_off)
        return self._urls

    # --- per-term accessors over the flat buffers ---
    def _post_slice(self, i: int):
        return self._post_buf[self._post_off[i]:self._post_off[i + 1]]

    def _blocks(self, i: int, which: str):
        buf = {"off": self._bo_buf, "last": self._bl_buf,
               "max_tf": self._mt_buf, "min_dl": self._md_buf}[which]
        return buf[self._bo_off[i]:self._bo_off[i + 1]]

    def df(self, term: str):
        i = self._terms.get(term)
        return int(self._df[i]) if i is not None else None

    def cf(self, term: str):
        """Collection frequency — Σ tf over the term's postings, or None
        for an absent term. The index stores df, not cf; cf is derived
        from the (LRU-cached) decoded postings on first use and memoized
        per shard holder. Exact: tfs are integer-valued float64 and the
        sum stays far below 2^53 even at 10^12 docs × 10^3 tokens."""
        i = self._terms.get(term)
        if i is None:
            return None
        hit = self._cf_cache.get(i)
        if hit is None:
            hit = float(self.postings(term)[1].sum())
            self._cf_cache[i] = hit
        return hit

    @property
    def total_dl(self) -> float:
        """Collection length |C| = Σ dl over the shard (exact integer sum
        in float64)."""
        if self._total_dl is None:
            self._total_dl = float(self.dl.sum())
        return self._total_dl

    def idf(self, term: str, law: str) -> float:
        d = self.df(term)
        if d is None:
            return 0.0
        return float(IDF_LAWS[law](float(self.n_docs), float(d)))

    def postings(self, term: str):
        """Full decode → (doc_ids int64, tfs float64) or None. Decoded
        lists are LRU-cached per shard holder: Zipf query workloads hit
        the same head terms constantly and re-decoding dominates TAAT
        otherwise."""
        i = self._terms.get(term)
        if i is None:
            return None
        hot = self._hot.get(i)
        if hot is not None:
            return hot  # shared pre-decoded view — no per-actor warm-up
        hit = self._decoded.get(i)
        if hit is not None:
            self._decoded.move_to_end(i)
            return hit
        d, t = decode_blocked_postings(
            self._post_slice(i),
            self._blocks(i, "off"),
            int(self._df[i]),
            self.block_size,
        )
        out = (d.astype(np.int64), t.astype(np.float64))
        self._decoded[i] = out
        if len(self._decoded) > self._decoded_cap:
            self._decoded.popitem(last=False)
        return out

    def term_contrib(self, term: str, cfg: BM25Config):
        """Per-posting BM25 contribution array for ``term`` (aligned with
        ``postings(term)[0]``), or None for an absent term.

        Query-independent given (k1, b, compat): idf laws and term
        weights multiply OUTSIDE this factor, so one array serves every
        query and idf variant. Zipf-head terms resolve to the payload's
        shared plasma precompute when the cfg matches; anything else is
        computed once and kept in a size-bounded per-instance cache —
        per-query recomputation on head terms is ~5× the memory traffic
        of reading the cached array."""
        i = self._terms.get(term)
        if i is None:
            return None
        key = (cfg.k1, cfg.b, cfg.compat)
        if key == self._contrib_key:
            shared = self._hot_contrib.get(i)
            if shared is not None:
                return shared
        ck = (i, key)
        hit = self._contrib_cache.get(ck)
        if hit is not None:
            self._contrib_cache.move_to_end(ck)
            return hit
        doc_ids, tfs = self.postings(term)
        con = _bm25_contrib(tfs, self.dl[doc_ids], cfg, self.avgdl)
        self._contrib_cache[ck] = con
        self._contrib_elems += con.size
        while self._contrib_elems > self._contrib_elems_cap and len(
            self._contrib_cache
        ) > 1:
            _, old = self._contrib_cache.popitem(last=False)
            self._contrib_elems -= old.size
        return con

    def term_cmax(self, term: str, cfg: BM25Config) -> float:
        """max per-posting BM25 contribution of ``term`` under ``cfg``
        (memoized) — the error-bound input of the dense-estimate path."""
        i = self._terms.get(term)
        key = (i, cfg.k1, cfg.b, cfg.compat)
        hit = self._cmax_cache.get(key)
        if hit is None:
            con = self.term_contrib(term, cfg)
            hit = float(con.max()) if con is not None and con.size else 0.0
            self._cmax_cache[key] = hit
        return hit

    def term_blocks(self, term: str):
        """Block-level access for WAND: (row_index, n_blocks) or None."""
        i = self._terms.get(term)
        if i is None:
            return None
        return i, int(self._bo_off[i + 1] - self._bo_off[i])


def _term_weights(tokens, compat: str):
    """unique terms (reference, final_implementation.py:129) vs
    multiplicity-weighted (standard, team_run1.py:183-188); sorted for
    deterministic accumulation order."""
    if compat == "reference":
        return [(t, 1.0) for t in sorted(set(tokens))]
    from collections import Counter

    return sorted(Counter(tokens).items())


def _bm25_contrib(tf, dl, cfg: BM25Config, avgdl: float):
    """tf*(k1+1) / (tf + k1*(1 - b [+ b]*dl/avgdl)) with in-place temps.

    The naive expression allocates ~5 df-sized float64 temporaries; on
    Zipf-head terms (df ≈ N) that temp traffic dominates scoring and is
    pure memory-bandwidth — the resource scorer actors contend on. The
    rewrite keeps the EXACT IEEE op order (multiplication regrouping is
    avoided; `x + y == y + x` is exact in IEEE-754) so scores stay
    bit-identical to the oracle."""
    k1, b = cfg.k1, cfg.b
    if cfg.compat == "reference":
        denom = dl / avgdl  # missing-b quirk (reference :142)
    else:
        denom = b * dl
        denom /= avgdl
    denom += 1.0 - b
    denom *= k1
    denom += tf
    out = tf * (k1 + 1.0)
    out /= denom
    return out


def score_bm25_taat(idx: LangIndex, tokens, cfg: BM25Config) -> np.ndarray:
    """Dense score array over the shard's docs."""
    scores = np.zeros(idx.n_docs, dtype=np.float64)
    if idx.avgdl <= 0:
        return scores
    for term, weight in _term_weights(tokens, cfg.compat):
        p = idx.postings(term)
        if p is None:
            continue
        doc_ids = p[0]
        idf = idx.idf(term, cfg.idf)
        # (weight * idf) * contrib — same float op order as the inline
        # formula (left-assoc multiply), so cached contribs are exact
        scores[doc_ids] += (weight * idf) * idx.term_contrib(term, cfg)
    return scores


def score_cosine_taat(idx: LangIndex, tokens, law: str = "cosine") -> np.ndarray:
    """TF-IDF cosine scores (C5): q[t] = idf(t); d[t] = tf*idf(t)."""
    if idx.norms is None:
        raise RuntimeError("index built without cosine norms")
    scores = np.zeros(idx.n_docs, dtype=np.float64)
    qterms = sorted(set(tokens))
    qnorm2 = 0.0
    for term in qterms:
        idf = idx.idf(term, law)
        if idx.df(term) is None:
            continue
        qnorm2 += idf * idf
    if qnorm2 <= 0:
        return scores
    for term in qterms:
        p = idx.postings(term)
        if p is None:
            continue
        doc_ids, tfs = p
        idf = idx.idf(term, law)
        scores[doc_ids] += idf * (tfs * idf)
    qnorm = np.sqrt(qnorm2)
    safe = np.where(idx.norms > 0, idx.norms, 1.0)
    out = scores / (safe * qnorm)
    out[idx.norms == 0] = 0.0
    return out


class _LazyUrls:
    """Array-like view decoding url strings on demand from the shared
    flat buffers. Supports the two access shapes the scorers use —
    scalar int (WAND pivot admission) and int-array fancy indexing
    (top-k slivers) — returning a plain object ndarray so lexsort /
    list() / zip consumers are unchanged."""

    __slots__ = ("_buf", "_off")

    def __init__(self, buf: np.ndarray, off: np.ndarray):
        self._buf = buf
        self._off = off

    def __len__(self) -> int:
        return len(self._off) - 1

    def __getitem__(self, i):
        off = self._off
        buf = self._buf
        if isinstance(i, (int, np.integer)):
            return bytes(buf[off[i]:off[i + 1]]).decode("utf-8")
        idx = np.asarray(i)
        return np.array(
            [bytes(buf[off[j]:off[j + 1]]).decode("utf-8") for j in idx],
            dtype=object,
        )

    def select(self, ids) -> "_LazyUrls":
        """Lazy re-indexed view: ``view.select(cand)[i] == view[cand[i]]``
        WITHOUT decoding ``cand``'s urls — callers that pass a large
        candidate set into a top-k that reads only a sliver stay O(k)."""
        return _LazyUrlsIndirect(self, np.asarray(ids, dtype=np.int64))


class _LazyUrlsIndirect:
    """select()-result: indexes the parent through an id map, lazily."""

    __slots__ = ("_parent", "_ids")

    def __init__(self, parent: "_LazyUrls", ids: np.ndarray):
        self._parent = parent
        self._ids = ids

    def __len__(self) -> int:
        return len(self._ids)

    def __getitem__(self, i):
        if isinstance(i, (int, np.integer)):
            return self._parent[int(self._ids[i])]
        return self._parent[self._ids[np.asarray(i)]]


def score_lm_dirichlet_taat(idx: LangIndex, tokens, mu: float = 2000.0):
    """Query-likelihood language-model scoring with Dirichlet smoothing
    (Zhai & Lafferty, SIGIR 2001):

        score(q, d) = Σ_t  w_t · ln( (tf_td + μ·p_t) / (dl_d + μ) )

    over the query's multiplicity-weighted terms, with p_t = cf_t / |C|
    the collection unigram probability. EVERY shard doc receives a score
    (a missing term contributes the smoothed background probability), so
    scores are negative log-likelihoods and ranking is descending.

    Query terms absent from the collection are skipped (their p_t is
    undefined); returns None when no query term is in the vocabulary —
    the query then yields no result rows, mirroring the SQL oracle's
    inner join against the cf table.

    The reference carries this scorer only as dead code (A10,
    SURVEY.md §2.5); this is the live semantic served from the same
    compressed postings as BM25 — dense TAAT shape: one base pass over
    the dl array plus one scatter-add per in-vocabulary query term.
    """
    terms = [
        (t, float(w))
        for t, w in _term_weights(tokens, "standard")
        if t in idx._terms
    ]
    if not terms or idx.n_docs == 0:
        return None
    C = idx.total_dl
    if C <= 0:
        return None
    scores = np.zeros(idx.n_docs, dtype=np.float64)
    base = 0.0
    for term, w in terms:
        doc_ids, tfs = idx.postings(term)
        mup = mu * (idx.cf(term) / C)
        base += w * np.log(mup)
        # matched docs: replace the background ln(μp) with ln(tf + μp)
        scores[doc_ids] += w * (np.log(tfs + mup) - np.log(mup))
    scores += base
    W = sum(w for _, w in terms)
    # ln(dl + μ) denominator, shared by every query term
    scores -= W * np.log(idx.dl + mu)
    return scores


def topk_all(scores: np.ndarray, urls, k: int, round_dp=4):
    """``topk_with_ties`` without the positive-score restriction: every
    doc is a candidate (LM scores are negative log-probabilities). Same
    contract — rank on (rounded score desc, url asc), returns
    (ranks 1..k', doc_indices, score_keys)."""
    if scores.size == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.float64),
        )
    scale = 10.0 ** round_dp if round_dp is not None else None
    key = np.floor(scores * scale + 0.5) if scale is not None else scores
    pos = np.arange(scores.size, dtype=np.int64)
    if key.size > max(4 * k, 64):
        # O(n) preselect: only the kth-largest-key ties-or-beats sliver
        # needs the (url, key) lexsort
        kth = np.partition(key, key.size - k)[key.size - k]
        keep = np.nonzero(key >= kth)[0]
        pos, key = pos[keep], key[keep]
    order = np.lexsort((urls[pos], -key))
    take = order[: min(k, order.size)]
    sel = pos[take]
    return (
        np.arange(1, take.size + 1, dtype=np.int64),
        sel,
        key[take],
    )


def topk_with_ties(scores: np.ndarray, urls, k: int, round_dp=4, after=None):
    """Top-k of positive-score docs; rank on (rounded score desc, url asc).

    Returns (ranks 1..k', doc_indices, score_keys). ``round_dp=None`` ranks
    on raw float64 scores (oracle rank-identity tests).

    ``after``: optional (after_key, after_url) cursor — keep only docs
    STRICTLY after it in (key desc, url asc) order, i.e. key < after_key,
    or key == after_key and url > after_url. This is the search-after
    seek: the cursor filter applies BEFORE top-k selection, so deep
    paging costs O(page) per shard, never O(offset). The url tie-compare
    touches only the (usually tiny) key == after_key sliver, keeping
    lazy-url decoding cheap. Cursor queries take the exact path (the
    sampled-threshold shortcut assumes an unconstrained top)."""
    scale = 10.0 ** round_dp if round_dp is not None else None
    if after is not None:
        after_key, after_url = after
        pos = np.nonzero(scores > 0)[0]
        if pos.size == 0:
            return (
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.float64),
            )
        s = scores[pos]
        key = np.floor(s * scale + 0.5) if scale is not None else s
        below = key < after_key
        ties = np.nonzero(key == after_key)[0]
        if ties.size:
            tie_urls = np.asarray(urls[pos[ties]])
            below[ties[tie_urls > after_url]] = True
        keep = np.nonzero(below)[0]
        pos = pos[keep]
        key = key[keep]
        if pos.size == 0:
            return (
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.float64),
            )
        if key.size > max(4 * k, 64):
            kth = np.partition(key, key.size - k)[key.size - k]
            sl = np.nonzero(key >= kth)[0]
            pos = pos[sl]
            key = key[sl]
        order = np.lexsort((urls[pos], -key))
        take = order[: min(k, order.size)]
        sel = pos[take]
        return (
            np.arange(1, take.size + 1, dtype=np.int64),
            sel,
            key[take],
        )
    # Sampled-threshold preselect for big dense arrays: nonzero-compacting
    # ~N positive docs and np.partition-ing their keys are the two
    # dominant passes of a Zipf-head query (measured 4.6 + 9.7 ms at
    # 1.5M docs). A stride sample's kth-largest raw score t̂ sits near the
    # global (k·n/m)-quantile, so `scores >= t̂` keeps a few-thousand-doc
    # sliver in ONE dense compare pass. Exactness check: every excluded
    # doc scores < t̂, so its rounded key ≤ key(t̂); if key(t̂) is
    # STRICTLY below the sliver's kth key, no excluded doc can tie-or-
    # beat rank k — otherwise fall through to the exact slow path.
    pos = None
    if scores.size > 200_000:
        samp = scores[:: max(1, scores.size // 4096)]
        if samp.size > k:
            t_hat = np.partition(samp, samp.size - k)[samp.size - k]
            if t_hat > 0.0:
                cand = np.nonzero(scores >= t_hat)[0]
                if cand.size >= k:
                    s = scores[cand]
                    key = np.floor(s * scale + 0.5) if scale is not None else s
                    kth = np.partition(key, key.size - k)[key.size - k]
                    t_key = (
                        np.floor(t_hat * scale + 0.5) if scale is not None else t_hat
                    )
                    if t_key < kth:
                        keep = np.nonzero(key >= kth)[0]
                        pos = cand[keep]
                        key = key[keep]
    if pos is None:
        pos = np.nonzero(scores > 0)[0]
        if pos.size == 0:
            return (
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.float64),
            )
        s = scores[pos]
        key = np.floor(s * scale + 0.5) if scale is not None else s
        # O(n) preselect: keep every candidate whose key ties-or-beats the
        # kth largest key, then lexsort only that sliver. A full (url, key)
        # lexsort over all positive docs dominated hot-term queries.
        if key.size > max(4 * k, 64):
            kth = np.partition(key, key.size - k)[key.size - k]
            keep = np.nonzero(key >= kth)[0]
            pos = pos[keep]
            key = key[keep]
    # order by (-key, url)
    order = np.lexsort((urls[pos], -key))
    take = order[: min(k, order.size)]
    sel = pos[take]
    return (
        np.arange(1, take.size + 1, dtype=np.int64),
        sel,
        key[take],
    )


def dense_est_worthwhile(idx: LangIndex, tokens, cfg: BM25Config,
                         min_share: float = 0.5) -> bool:
    """Cheap pre-gate for :func:`score_bm25_dense_est` at the MaxScore
    fallback sites: the estimate pass is a full O(n_docs) float32 scan
    that can still return None (exactness guard), after which the exact
    float64 TAAT runs anyway — nearly doubling the corpus-wide work.
    Only attempt it when at least ``min_share`` of the query's present
    terms have payload dense arrays (the sparse remainder both slows
    the estimate and widens the error bound that fails the guard)."""
    if idx.avgdl <= 0 or not idx._dense:
        return False
    if (cfg.k1, cfg.b, cfg.compat) != idx._contrib_key:
        return False
    present = n_dense = 0
    for term, _w in _term_weights(tokens, cfg.compat):
        i = idx._terms.get(term)
        if i is None:
            continue
        present += 1
        if i in idx._dense:
            n_dense += 1
    return present > 0 and n_dense >= max(1, int(np.ceil(min_share * present)))


def score_bm25_dense_est(idx: LangIndex, tokens, cfg: BM25Config, k: int = 10,
                         round_dp=4):
    """Exact top-k via a float32 dense ESTIMATE + float64 candidate
    rescore — the cheap replacement for full dense TAAT on all-hot-term
    (stopword-class) queries, whose exact top-k is inherently a
    corpus-wide pass.

    1. est (float32) accumulates w·idf·contrib for every query term:
       ultra-hot terms read their payload-precomputed DENSE float32
       arrays in L2-sized chunks (sequential SIMD, 4 bytes/doc — no
       doc_id reads, no scatter); remaining terms scatter their sparse
       exact contributions. ~4× less memory traffic than the float64
       sparse TAAT it replaces, which is what the scorer pool contends
       on (DRAM bandwidth, not CPU).
    2. A stride-sampled kth estimate picks a candidate threshold τ;
       candidates are rescored in FLOAT64 with the same per-element
       multiply and term accumulation order as ``score_bm25_taat`` —
       candidate scores are bit-identical to TAAT's.
    3. Exactness guard: every excluded doc's true score ≤ τ + ε, where
       ε bounds the total f32 storage+accumulation error
       ((T+4)·2⁻²²·Σ|w·idf|·max-contrib ≥ the standard (2T+2)·u·S bound).
       If that bound's rank key could reach the candidate kth key, or
       fewer than k positive candidates survive, return None — the
       caller falls back to exact TAAT. With the 1.5·10^-dp margin
       folded into τ the guard virtually always holds.

    Returns (cand_scores float64, cand doc ids) — the
    ``score_bm25_maxscore`` candidate contract — or None (no dense
    arrays / cfg mismatch / guard failed)."""
    if idx.avgdl <= 0 or not idx._dense:
        return None
    if (cfg.k1, cfg.b, cfg.compat) != idx._contrib_key:
        return None
    plan = []  # (term, coeff, dense_or_None) in TAAT accumulation order
    n_dense = 0
    for term, w in _term_weights(tokens, cfg.compat):
        i = idx._terms.get(term)
        if i is None:
            continue
        coeff = w * idx.idf(term, cfg.idf)
        dense = idx._dense.get(i)
        plan.append((term, i, coeff, dense))
        if dense is not None:
            n_dense += 1
    if not plan or n_dense == 0:
        return None
    n = idx.n_docs

    # --- phase 1: float32 estimate ---
    est = np.zeros(n, dtype=np.float32)
    S_abs = 0.0
    dense_items = []
    for term, i, coeff, dense in plan:
        if dense is not None:
            dense_items.append((np.float32(coeff), dense))
            S_abs += abs(coeff) * idx._dense_cmax[i]
    CH = 1 << 19  # f32 chunk ≈ 2 MB: est chunk stays cache-resident
    tmp = np.empty(min(CH, n), np.float32)
    for c0 in range(0, n, CH):
        c1 = min(c0 + CH, n)
        e = est[c0:c1]
        t_ = tmp[: c1 - c0]
        for cf32, dense in dense_items:
            np.multiply(dense[c0:c1], cf32, out=t_)
            e += t_
    for term, i, coeff, dense in plan:
        if dense is not None:
            continue
        p = idx.postings(term)
        con = idx.term_contrib(term, cfg)
        est[p[0]] += (coeff * con).astype(np.float32)
        S_abs += abs(coeff) * idx.term_cmax(term, cfg)
    eps = (len(plan) + 4) * S_abs * (2.0 ** -22)

    # --- candidate selection: stride-sampled kth − error − key margin ---
    scale = 10.0 ** round_dp if round_dp is not None else None
    margin = (1.5 / scale) if scale is not None else 0.0
    samp = est[:: max(1, n // 4096)]
    t_hat = (
        float(np.partition(samp, samp.size - k)[samp.size - k])
        if samp.size > k
        else float(eps)
    )
    tau32 = np.float32(max(t_hat - 2.0 * eps - margin, eps))
    cand = np.nonzero(est > tau32)[0]
    if cand.size < k or cand.size > max(200_000, n // 4):
        return None  # no useful pruning — exact TAAT is the right tool

    # --- phase 2: exact float64 rescore, TAAT-identical op order ---
    cs = np.zeros(cand.size, dtype=np.float64)
    for term, i, coeff, dense in plan:
        doc_ids = idx.postings(term)[0]
        con = idx.term_contrib(term, cfg)
        pos = np.searchsorted(doc_ids, cand)
        np.clip(pos, 0, len(doc_ids) - 1, out=pos)
        match = doc_ids[pos] == cand
        cs[match] += coeff * con[pos[match]]

    # --- exactness guard ---
    B = float(tau32) + eps  # upper bound on any excluded doc's score
    pos_scores = cs[cs > 0]
    if pos_scores.size < k:
        return None
    if scale is not None:
        keys = np.floor(pos_scores * scale + 0.5)
        kth_key = np.partition(keys, keys.size - k)[keys.size - k]
        if not (np.floor(B * scale + 0.5) < kth_key):
            return None
    else:
        kth = np.partition(pos_scores, pos_scores.size - k)[pos_scores.size - k]
        if not (B < kth):
            return None
    return cs, cand


def score_bm25_maxscore(idx: LangIndex, tokens, cfg: BM25Config, k: int = 10,
                        hot_df: int = 50_000, round_dp=4):
    """Exact MaxScore-style accelerated top-k:

    1. dense TAAT over RARE terms (df <= hot_df) — the cheap part;
    2. HOT terms update only the candidate docs from phase 1
       (searchsorted into the hot posting list, O(|C| log df) instead of
       O(df));
    3. docs outside the candidate set can score at most
       sum(hot-term upper bounds); if that rounded bound is strictly
       below the running kth rounded score, the result is EXACT —
       otherwise fall back to full dense TAAT (always exact).

    Zipf head terms have tiny idf, so the fast path almost always holds;
    all-hot-term queries fall back (equivalent to TAAT).
    Returns (scores, candidate_idx): scores are valid for the candidates
    and the caller ranks candidates only — EXCEPT when candidate_idx is
    None, which means "scores is the full dense array" (the exact-TAAT
    fallback): compacting ~N candidates through nonzero + two gathers
    costs three dense passes that ``topk_with_ties`` would immediately
    redo, so the dense array is handed to the caller as-is.
    """
    if idx.avgdl <= 0:
        return np.zeros(0, np.float64), np.empty(0, np.int64)
    terms = _term_weights(tokens, cfg.compat)
    rare, hot = [], []
    for term, w in terms:
        d = idx.df(term)
        if d is None:
            continue
        (rare if d <= hot_df else hot).append((term, w))
    if not rare and not hot:
        return np.zeros(0, np.float64), np.empty(0, np.int64)
    if not rare:
        # all-hot (stopword-class) query: try the float32 dense-estimate
        # + exact-rescore path before paying the full float64 TAAT scan
        # (gated — a failed estimate would ADD a corpus-wide f32 pass)
        alt = (
            score_bm25_dense_est(idx, tokens, cfg, k, round_dp)
            if dense_est_worthwhile(idx, tokens, cfg) else None
        )
        if alt is not None:
            return alt
        return score_bm25_taat(idx, tokens, cfg), None

    # Phase 1 over RARE terms, two strategies by size:
    # - DENSE scatter (zero an n_docs array, scatter, scan) — cheapest
    #   when the doc space is small or the rare postings cover much of
    #   it (the scan amortizes);
    # - SPARSE unique+bincount over the concatenated rare postings —
    #   at a 2M-doc shard the dense path's 16 MB zero+scan PER QUERY
    #   made serving memory-bandwidth-bound, while Σ df(rare) is ~10^5.
    # The crossover is the O(R log R) sort vs the O(n_docs) dense scan.
    ids_parts, contrib_parts = [], []
    R = 0
    for term, w in rare:
        doc_ids = idx.postings(term)[0]
        idf = idx.idf(term, cfg.idf)
        ids_parts.append(doc_ids.astype(np.int64, copy=False))
        contrib_parts.append((w * idf) * idx.term_contrib(term, cfg))
        R += len(doc_ids)
    if idx.n_docs <= (1 << 19) or R >= idx.n_docs // 8:
        scores = np.zeros(idx.n_docs, dtype=np.float64)
        for doc_ids, con in zip(ids_parts, contrib_parts):
            scores[doc_ids] += con
        cand = np.nonzero(scores > 0)[0]
        cscores = scores[cand]
    else:
        all_ids = np.concatenate(ids_parts)
        cand, inv = np.unique(all_ids, return_inverse=True)
        cscores = np.bincount(
            inv, weights=np.concatenate(contrib_parts), minlength=cand.size
        )
        pos_mask = cscores > 0
        cand = cand[pos_mask]
        cscores = cscores[pos_mask]

    hot_ub = 0.0
    for term, w in hot:
        i, nb = idx.term_blocks(term)
        mt = idx._blocks(i, "max_tf").astype(np.float64)
        md = idx._blocks(i, "min_dl").astype(np.float64)
        idf = idx.idf(term, cfg.idf)
        ub = float(((w * idf) * _bm25_contrib(mt, md, cfg, idx.avgdl)).max())
        # clamp at 0: a doc OUTSIDE the candidate set may simply not
        # contain a negative-idf hot term (cosine law), so its best case
        # is the sum of only the POSITIVE hot-term bounds — summing a
        # negative ub here would understate the outside-docs bound and
        # let the 'safe' check skip the exact fallback incorrectly
        hot_ub += max(ub, 0.0)
        doc_ids = idx.postings(term)[0]
        # cast the SMALL side: int64 cand vs int32 hot ids would promote
        # (copy) the df-sized array per query
        pos = np.searchsorted(doc_ids, cand.astype(doc_ids.dtype, copy=False))
        pos = np.clip(pos, 0, len(doc_ids) - 1)
        match = doc_ids[pos] == cand
        # gather from the (shared) per-posting contribution array —
        # elementwise, so gathering equals computing on gathered operands
        cscores[match] += (w * idf) * idx.term_contrib(term, cfg)[pos[match]]

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
        # candidates must fill the whole top-k, else outside docs would
        # occupy the remaining ranks
        if not (cscores.size >= k and safe):
            alt = (
                score_bm25_dense_est(idx, tokens, cfg, k, round_dp)
                if dense_est_worthwhile(idx, tokens, cfg) else None
            )
            if alt is not None:
                return alt
            return score_bm25_taat(idx, tokens, cfg), None  # exact fallback
    return cscores, cand


class _RevStr:
    """Reverse-ordered string wrapper so a heapq MIN-heap treats the
    LARGEST url as the worst entry (final ranking is url ASC on ties)."""

    __slots__ = ("s",)

    def __init__(self, s):
        self.s = s

    def __lt__(self, other):
        return self.s > other.s

    def __eq__(self, other):
        return self.s == other.s


def score_query_wand(idx: LangIndex, tokens, cfg: BM25Config, k: int = 10,
                     round_dp=4):
    """WAND top-k → list of (score, doc_id), best-first.

    Exact w.r.t. TAAT + ``topk_with_ties`` for the same cfg (tested):
    candidates are admitted to the bounded heap on the SAME composite key
    (fixed-point-rounded score desc, url asc), so rounded-score ties
    crossing the k boundary resolve identically to the dense path; terms
    with negative idf (possible under the 'cosine' law) contribute via
    per-pivot binary search instead of being dropped. Pivot skips jump
    whole undecoded blocks via block_last, and every pivot passes a
    Block-Max-WAND refinement: the per-block score bounds of the lead
    cursors' covering blocks must reach the heap threshold, else the
    whole [pivot, nearest block boundary] range is skipped undecoded
    (Ding & Suel 2011's block-max pivoting, adapted to the rounded-key
    tie semantics: the block check reuses eval_bound, which already
    admits rounded ties).
    """
    if idx.avgdl <= 0:
        return []
    scale = (10.0 ** round_dp) if round_dp is not None else None
    terms = _term_weights(tokens, cfg.compat)
    cursors = []
    neg = []  # (doc_ids, tfs, weight*idf) for negative-idf terms
    for term, weight in terms:
        tb = idx.term_blocks(term)
        if tb is None:
            continue
        row, n_blocks = tb
        idf = idx.idf(term, cfg.idf)
        if idf > 0:
            cursors.append(_Cursor(idx, row, n_blocks, weight * idf))
        elif idf < 0:
            doc_ids, tfs = idx.postings(term)
            neg.append((doc_ids, tfs, weight * idf))
    if not cursors:
        return []

    def _neg_contrib(doc: int) -> float:
        s = 0.0
        for doc_ids, tfs, w in neg:
            j = int(np.searchsorted(doc_ids, doc))
            if j < len(doc_ids) and doc_ids[j] == doc:
                s += w * _bm25_contrib(float(tfs[j]), idx.dl[doc], cfg, idx.avgdl)
        return s

    urls = idx.urls
    heap: list = []  # min-heap of (key, _RevStr(url), doc_id, raw_score)
    # evaluate a pivot iff its positive-term upper-bound sum is > 0 and
    # >= eval_bound (the raw score below which the rounded key cannot
    # tie-or-beat the kth rounded key)
    eval_bound = 0.0
    for c in cursors:
        c.open_block(0, cfg)
    active = [c for c in cursors if c.current_doc is not None]
    while active:
        active.sort(key=lambda c: c.current_doc)
        acc = 0.0
        pivot_i = None
        for i, c in enumerate(active):
            acc += c.term_ub
            if acc > 0.0 and acc >= eval_bound:
                pivot_i = i
                break
        if pivot_i is None:
            break
        pivot_doc = active[pivot_i].current_doc
        # ---- BMW refinement: per-BLOCK bounds at the pivot. The lead set
        # is every cursor positioned at <= pivot_doc (ties past pivot_i
        # included — their bounds belong to pivot_doc too). For any doc d
        # in [pivot_doc, min block_last], each lead's covering block is
        # exactly the block found at pivot_doc (the previous block's last
        # is < pivot_doc <= d), so one check bounds the whole range and a
        # failed check skips it without decoding anything.
        lead_end = pivot_i + 1
        while lead_end < len(active) and active[lead_end].current_doc == pivot_doc:
            lead_end += 1
        block_ub = 0.0
        next_b = None  # min block_last over leads with postings >= pivot
        for c in active[:lead_end]:
            bub, blast = c.bound_at(pivot_doc)
            block_ub += bub
            if blast is not None and (next_b is None or blast < next_b):
                next_b = blast
        if not (block_ub > 0.0 and block_ub >= eval_bound):
            # pivot range cannot reach the heap: shallow-advance every
            # lead past the nearest block boundary (never past the next
            # cursor's doc — beyond it, other terms join the bound)
            nxt = pivot_doc + 1 if next_b is None else next_b + 1
            if lead_end < len(active):
                nxt = min(nxt, active[lead_end].current_doc)
            nxt = max(nxt, pivot_doc + 1)
            for c in active[:lead_end]:
                c.skip_to(nxt, cfg)
            active = [c for c in active if c.current_doc is not None]
            continue
        if active[0].current_doc == pivot_doc:
            # fully evaluate pivot_doc
            score = 0.0
            for c in active:
                if c.current_doc == pivot_doc:
                    score += c.weight_idf * _bm25_contrib(
                        c.current_tf, idx.dl[pivot_doc], cfg, idx.avgdl
                    )
            if neg:
                score += _neg_contrib(pivot_doc)
            if score > 0.0:
                key = np.floor(score * scale + 0.5) if scale is not None else score
                entry = (key, _RevStr(urls[pivot_doc]), pivot_doc, score)
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                elif (entry[0], entry[1]) > (heap[0][0], heap[0][1]):
                    heapq.heappushpop(heap, entry)
                if len(heap) == k:
                    kth_key = heap[0][0]
                    eval_bound = (
                        (kth_key - 0.5) / scale if scale is not None else kth_key
                    )
            for c in active:
                if c.current_doc == pivot_doc:
                    c.advance(cfg)
        else:
            for i in range(pivot_i):
                active[i].skip_to(pivot_doc, cfg)
        active = [c for c in active if c.current_doc is not None]
    return sorted(((s, d) for _, _, d, s in heap), key=lambda x: (-x[0], x[1]))


class _Cursor:
    """Posting-list cursor with lazy per-block decode."""

    __slots__ = (
        "idx", "row", "n_blocks", "weight_idf", "block", "pos",
        "docs", "tfs", "current_doc", "current_tf", "term_ub",
        "block_bounds", "lasts",
    )

    def __init__(self, idx: LangIndex, row: int, n_blocks: int, weight_idf: float):
        self.idx = idx
        self.row = row
        self.n_blocks = n_blocks
        self.weight_idf = weight_idf
        self.block = -1
        self.docs = None
        self.current_doc = None
        self.term_ub = 0.0  # set in open_block(0): max over blocks
        self.block_bounds = None  # per-block score bounds (BMW pivoting)
        self.lasts = None

    def bound_at(self, doc: int):
        """BMW per-block refinement: (score bound of the block covering
        the first posting >= doc, that block's last doc id) — or
        (0.0, None) when the term has no posting >= doc. The score is
        increasing in tf and decreasing in dl under both compat formulas,
        so (block_max_tf, block_min_dl) bounds every doc in the block."""
        b = int(np.searchsorted(self.lasts, doc))
        if b >= self.n_blocks:
            return 0.0, None
        return float(self.block_bounds[b]), int(self.lasts[b])

    def open_block(self, b: int, cfg: BM25Config):
        if self.block < 0:
            # vectorized over all blocks (a df≈10⁶ term has ~8k blocks —
            # a Python generator here cost ~8k iterations per query);
            # kept as an array: score_query_wand's block-max pivot check
            # indexes it per pivot
            mt = self.idx._blocks(self.row, "max_tf").astype(np.float64)
            md = self.idx._blocks(self.row, "min_dl").astype(np.float64)
            self.block_bounds = self.weight_idf * _bm25_contrib(
                mt, md, cfg, self.idx.avgdl
            )
            self.lasts = self.idx._blocks(self.row, "last")
            self.term_ub = float(self.block_bounds.max())
        if b >= self.n_blocks:
            self.current_doc = None
            return
        self.block = b
        offs = self.idx._blocks(self.row, "off")
        buf = self.idx._post_slice(self.row)
        off = int(offs[b])
        end = int(offs[b + 1]) if b + 1 < len(offs) else len(buf)
        prev_last = int(self.idx._blocks(self.row, "last")[b - 1]) if b > 0 else 0
        count = min(
            self.idx.block_size,
            int(self.idx._df[self.row]) - b * self.idx.block_size,
        )
        d, t = decode_block(buf, off, end, count, prev_last)
        self.docs = d.astype(np.int64)
        self.tfs = t.astype(np.float64)
        self.pos = 0
        self.current_doc = int(self.docs[0])
        self.current_tf = float(self.tfs[0])

    def advance(self, cfg: BM25Config):
        self.pos += 1
        if self.pos < len(self.docs):
            self.current_doc = int(self.docs[self.pos])
            self.current_tf = float(self.tfs[self.pos])
        else:
            self.open_block(self.block + 1, cfg)

    def skip_to(self, target: int, cfg: BM25Config):
        # block-level skip using block_last (no decode of skipped blocks)
        b = self.block
        lasts = self.idx._blocks(self.row, "last")
        while b < self.n_blocks and lasts[b] < target:
            b += 1
        if b != self.block:
            self.open_block(b, cfg)
            if self.current_doc is None:
                return
        # in-block skip
        i = int(np.searchsorted(self.docs, target))
        if i >= len(self.docs):
            self.open_block(self.block + 1, cfg)
            return
        self.pos = i
        self.current_doc = int(self.docs[i])
        self.current_tf = float(self.tfs[i])
