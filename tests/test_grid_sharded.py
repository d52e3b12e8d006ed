"""(doc-range × term-range) shard GRID composition — SCALE.md's full
10^12-doc layout: the corpus split into doc-range shards, each shard's
postings split into term-range buckets, served through BOTH merges
(term-bucket partial sum inside a doc shard, then cross-shard candidate
merge with GLOBAL statistics) — and the result must be RANK-IDENTICAL
to one index built over the whole corpus.

This is the composition claim behind the reference's per-lang in-RAM
model (final_implementation.py:290-322) at sizes one node can't hold on
either axis: doc-range bounds the document side, term-range bounds the
vocabulary side, and global (N, avgdl, df) keep idf / length
normalization exact across the grid.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from document_retrieval_ray.config import BM25Config, IndexConfig, TokenizerConfig
from document_retrieval_ray.functions.hashing import stable_hash64

CFG = IndexConfig(
    tokenizer=TokenizerConfig(mode="simple"),
    num_hash_parts=4,
    hot_term_threshold=80,
    salt_shift=5,
    block_size=16,
)
BM25 = BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard")
NUM_DOC_SHARDS = 2
NUM_TERM_BUCKETS = 3


@pytest.fixture(scope="module")
def grid_setup(ray_session, tiny_corpus, tmp_path_factory):
    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.term_sharded import build_term_buckets

    tmp_path = tmp_path_factory.mktemp("grid_sharded")
    docs = pq.read_table(tiny_corpus["documents"])

    single_dir = str(tmp_path / "single")
    build_index(tiny_corpus["documents"], single_dir, cfg=CFG,
                with_cosine_norms=False)

    shard_dirs, bucket_dirs = [], []
    for s in range(NUM_DOC_SHARDS):
        mask = pa.array(
            [stable_hash64(u) % NUM_DOC_SHARDS == s
             for u in docs["url"].to_pylist()]
        )
        p = str(tmp_path / f"corpus_s{s}.parquet")
        pq.write_table(docs.filter(mask), p)
        d = str(tmp_path / f"shard_{s}")
        build_index(p, d, cfg=CFG, with_cosine_norms=False)
        shard_dirs.append(d)
        b = str(tmp_path / f"buckets_{s}")
        build_term_buckets(d, b, num_buckets=NUM_TERM_BUCKETS)
        bucket_dirs.append(b)

    return {
        "single": single_dir,
        "shards": shard_dirs,
        "buckets": bucket_dirs,
        "queries": tiny_corpus["queries"],
    }


def _global_df_map(shard_dirs, lang):
    parts = []
    for d in shard_dirs:
        p = os.path.join(d, "df", f"lang={lang}")
        if os.path.isdir(p):
            parts.append(pq.read_table(p, columns=["term", "df"]).to_pandas())
    if not parts:
        return {}
    merged = pd.concat(parts).groupby("term")["df"].sum()
    return {t: int(v) for t, v in merged.items()}


def test_grid_equals_single_index(grid_setup):
    """Every query's grid result (term-bucket scoring inside each doc
    shard under global stats → cross-shard merge) matches the single
    index at the serving contract, on both the pruned (distributed
    MaxScore) and low-hot_df (hot-gather / exact-fallback) paths."""
    from document_retrieval_ray.functions.tokenizer import tokenize_cfg
    from document_retrieval_ray.pipelines.sharded import (
        _GlobalView, global_lang_stats,
    )
    from document_retrieval_ray.pipelines.term_sharded import (
        score_term_sharded_pruned,
    )
    from document_retrieval_ray.state.index_shard import (
        LangIndex, score_bm25_taat, topk_with_ties,
    )

    single_dir = grid_setup["single"]
    shard_dirs = grid_setup["shards"]
    bucket_dirs = grid_setup["buckets"]
    qt = pq.read_table(grid_setup["queries"]).to_pandas()

    langs = sorted({r["lang"] for _, r in qt.iterrows()})
    singles = {lang: LangIndex(single_dir, lang) for lang in langs}
    stats = {lang: global_lang_stats(shard_dirs, lang) for lang in langs}
    df_maps = {lang: _global_df_map(shard_dirs, lang) for lang in langs}

    # grid cells: per (doc shard, lang) a list of bucket views with
    # GLOBAL (N, avgdl, df) and LOCAL postings/vocab-slice/doc-space
    grid = {}
    for s, bdir in enumerate(bucket_dirs):
        for lang in langs:
            n, avgdl = stats[lang]
            views = []
            for b in range(NUM_TERM_BUCKETS):
                try:
                    idx = LangIndex(
                        os.path.join(bdir, f"bucket-{b:04d}"), lang)
                    views.append(
                        _GlobalView(idx, n, avgdl, df_maps[lang]))
                except FileNotFoundError:
                    views.append(None)
            grid[(s, lang)] = views

    # sanity: global stats equal the single index's
    for lang in langs:
        n, avgdl = stats[lang]
        assert n == singles[lang].n_docs
        assert abs(avgdl - singles[lang].avgdl) < 1e-12

    n_checked = 0
    for hot_df in (50_000, 2):
        for _, row in qt.iterrows():
            q, lang = row["query"], row["lang"]
            toks = tokenize_cfg(q, lang, TokenizerConfig(mode="simple"))
            if not toks:
                continue
            sidx = singles[lang]
            want_scores = score_bm25_taat(sidx, toks, BM25)
            w_r, w_sel, w_key = topk_with_ties(want_scores, sidx.urls, 10, 4)

            # grid serving: term-bucket scoring inside each doc shard,
            # then the cross-shard (score_x desc, url asc) merge
            urls_all, raws_all = [], []
            for s in range(NUM_DOC_SHARDS):
                views = grid[(s, lang)]
                totals, cand = score_term_sharded_pruned(
                    views, toks, BM25, k=10, round_dp=4, hot_df=hot_df)
                if cand.size == 0:
                    continue
                inner = next(v for v in views if v is not None)
                shard_urls = inner.urls[cand]
                urls_all.extend(shard_urls.tolist())
                raws_all.extend(totals.tolist())
            got_urls = np.asarray(urls_all, dtype=object)
            got_raw = np.asarray(raws_all, dtype=np.float64)
            key = np.floor(got_raw * 1e4 + 0.5)
            order = np.lexsort((got_urls, -key))[:10]

            assert len(order) == len(w_r), (q, lang, hot_df)
            want_urls = [sidx.urls[int(i)] for i in w_sel]
            assert [got_urls[i] for i in order] == want_urls, (q, lang)
            assert [key[i] for i in order] == list(w_key), (q, lang)
            for i, wi in zip(order, w_sel):
                assert abs(got_raw[i] - want_scores[int(wi)]) < 1e-9
            if len(w_r):
                n_checked += 1
    assert n_checked > 0


def test_grid_cells_are_stock_shards(grid_setup):
    """Each grid cell (doc shard × term bucket) is a complete
    stock-loadable shard: per-lang vocab slices across buckets
    reassemble each doc shard's df table exactly."""
    for s, (sdir, bdir) in enumerate(
        zip(grid_setup["shards"], grid_setup["buckets"])
    ):
        langs = sorted(os.listdir(os.path.join(sdir, "manifests")))
        for lang in langs:
            base = (
                pq.read_table(os.path.join(sdir, "postings", f"lang={lang}"),
                              columns=["term", "df"])
                .to_pandas().sort_values("term").reset_index(drop=True)
            )
            parts = []
            for b in range(NUM_TERM_BUCKETS):
                p = os.path.join(bdir, f"bucket-{b:04d}", "postings",
                                 f"lang={lang}")
                parts.append(
                    pq.read_table(p, columns=["term", "df"]).to_pandas())
            merged = (
                pd.concat(parts).sort_values("term").reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(merged, base)
