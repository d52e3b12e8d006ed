"""Rank-identity: engine top-k (docIDs AND scores) vs the numpy oracle,
for both BM25 compat modes, the WAND scorer, the cosine path, and the
two-stage rerank — on the synthetic reference-style query set
(FIXTURES.md F2 shapes: dup terms, OOV, all-stopword, <k matches, ties,
hot terms)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from document_retrieval_ray.config import BM25Config, IndexConfig, TokenizerConfig
from document_retrieval_ray.oracle import OracleIndex
from document_retrieval_ray.state.index_shard import (
    LangIndex,
    score_bm25_taat,
    score_cosine_taat,
    score_query_wand,
    topk_with_ties,
)
from document_retrieval_ray.functions.tokenizer import tokenize


CFG_REF = BM25Config.reference()
CFG_STD = BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard")


@pytest.fixture(scope="module", params=["simple", "reference"])
def built(request, ray_session, tiny_corpus, tmp_path_factory):
    from document_retrieval_ray.pipelines.build_index import build_index

    mode = request.param
    index_dir = str(tmp_path_factory.mktemp(f"index_{mode}"))
    cfg = IndexConfig(
        tokenizer=TokenizerConfig(mode=mode),
        num_hash_parts=8,
        hot_term_threshold=50,
        salt_shift=5,
        block_size=16,
    )
    build_index(tiny_corpus["documents"], index_dir, cfg=cfg, with_cosine_norms=True)
    docs = pq.read_table(tiny_corpus["documents"])
    oracle = OracleIndex(docs, TokenizerConfig(mode=mode), num_hash_parts=8)
    queries = pq.read_table(tiny_corpus["queries"]).to_pylist()
    return index_dir, oracle, queries, mode


def _assert_topk_identical(got, expect, qid):
    assert len(got) == len(expect), (qid, got, expect)
    for (g_rank, g_url, g_score), (e_rank, e_url, e_score, _) in zip(got, expect):
        assert g_rank == e_rank, qid
        assert g_url == e_url, (qid, g_rank, g_url, e_url)
        assert g_score == pytest.approx(e_score, rel=1e-9), (qid, g_url)


@pytest.mark.parametrize("cfg", [CFG_REF, CFG_STD], ids=["reference", "standard"])
def test_bm25_taat_rank_identity(built, cfg):
    index_dir, oracle, queries, mode = built
    checked = 0
    for q in queries:
        lang = q["lang"]
        idx = LangIndex(index_dir, lang)
        tokens = tokenize(q["query"], lang, mode)
        scores = score_bm25_taat(idx, tokens, cfg)
        ranks, sel, _ = topk_with_ties(scores, idx.urls, cfg.k, round_dp=4)
        got = list(zip(ranks, idx.urls[sel], scores[sel]))
        expect = oracle.topk(oracle.score_bm25(q["query"], lang, cfg), lang, cfg.k)
        _assert_topk_identical(got, [(r, u, s) + (k,) for r, u, s, k in expect], q["query_id"])
        checked += 1
    assert checked == len(queries)


def test_wand_matches_taat_scores(built):
    """WAND top-k score multiset == TAAT top-k score multiset (both cfgs)."""
    index_dir, oracle, queries, mode = built
    for cfg in (CFG_REF, CFG_STD):
        for q in queries:
            lang = q["lang"]
            idx = LangIndex(index_dir, lang)
            tokens = tokenize(q["query"], lang, mode)
            if not tokens:
                continue
            taat = score_bm25_taat(idx, tokens, cfg)
            _, sel, _ = topk_with_ties(taat, idx.urls, cfg.k, round_dp=None)
            wand = score_query_wand(idx, tokens, cfg, cfg.k, round_dp=None)
            got = sorted((round(s, 9) for s, _ in wand), reverse=True)
            exp = sorted((round(float(taat[i]), 9) for i in sel), reverse=True)
            assert got == exp, (q["query_id"], cfg.compat)


@pytest.mark.parametrize(
    "cfg",
    [
        CFG_REF,
        CFG_STD,
        # 'cosine' idf law goes NEGATIVE for df > N/2 terms: exercises the
        # negative-term evaluation path inside WAND
        BM25Config(k1=1.2, b=0.75, idf="cosine", compat="standard"),
    ],
    ids=["reference", "standard", "cosine-idf"],
)
def test_wand_matches_taat_rounded_ranking(built, cfg):
    """WAND with fixed-point admission == TAAT + topk_with_ties on the
    exact (rounded key desc, url asc) composite — the driver-oracle
    ranking contract (ADVICE round 1)."""
    index_dir, oracle, queries, mode = built
    for q in queries:
        lang = q["lang"]
        idx = LangIndex(index_dir, lang)
        tokens = tokenize(q["query"], lang, mode)
        if not tokens:
            continue
        taat = score_bm25_taat(idx, tokens, cfg)
        ranks, sel, keys = topk_with_ties(taat, idx.urls, cfg.k, round_dp=4)
        exp = [(int(r), idx.urls[i], int(k)) for r, i, k in zip(ranks, sel, keys)]
        wand = score_query_wand(idx, tokens, cfg, cfg.k, round_dp=4)
        wscores = np.array([s for s, _ in wand])
        wsel = np.array([d for _, d in wand], dtype=np.int64)
        if wsel.size == 0:
            assert exp == [], (q["query_id"], cfg.idf)
            continue
        wkeys = np.floor(wscores * 10000.0 + 0.5)
        order = np.lexsort((idx.urls[wsel], -wkeys))
        got = [
            (r + 1, idx.urls[wsel[i]], int(wkeys[i]))
            for r, i in enumerate(order)
        ]
        assert got == exp, (q["query_id"], cfg.idf, cfg.compat)


def test_cosine_rank_identity(built):
    index_dir, oracle, queries, mode = built
    for q in queries:
        lang = q["lang"]
        idx = LangIndex(index_dir, lang)
        tokens = tokenize(q["query"], lang, mode)
        got_scores = score_cosine_taat(idx, tokens)
        exp_scores = oracle.score_cosine(q["query"], lang)
        assert got_scores == pytest.approx(exp_scores, rel=1e-9, abs=1e-12), q["query_id"]
        ranks, sel, _ = topk_with_ties(got_scores, idx.urls, 10, round_dp=4)
        got = list(zip(ranks, idx.urls[sel], got_scores[sel]))
        expect = oracle.topk(exp_scores, lang, 10)
        _assert_topk_identical(got, expect, q["query_id"])


@pytest.mark.usefixtures("ray_session")
def test_query_pipeline_end_to_end(built, tiny_corpus):
    """The full Ray pipeline (queries ds → scorer actor pool) matches the
    oracle for every query, reference compat."""
    import ray.data
    from document_retrieval_ray.pipelines.query import bm25_search

    index_dir, oracle, queries, mode = built
    qds = ray.data.read_parquet(tiny_corpus["queries"])
    res = bm25_search(
        qds,
        index_dir,
        cfg=CFG_REF,
        tokenizer=TokenizerConfig(mode=mode),
        round_dp=4,
    ).to_pandas()
    got_by_q = {
        qid: g.sort_values("rank") for qid, g in res.groupby("query_id")
    }
    n_nonempty = 0
    for q in queries:
        expect = oracle.topk(
            oracle.score_bm25(q["query"], q["lang"], CFG_REF), q["lang"], CFG_REF.k
        )
        g = got_by_q.get(q["query_id"])
        if not expect:
            assert g is None or len(g) == 0, q["query_id"]
            continue
        n_nonempty += 1
        assert g is not None, q["query_id"]
        got = list(zip(g["rank"], g["url"], g["score"]))
        _assert_topk_identical(got, expect, q["query_id"])
    assert n_nonempty > 0


def test_two_stage_rerank_pipeline(built, tiny_corpus):
    """Cosine→BM25 rerank (C6): engine pipeline vs oracle two-stage."""
    import ray.data
    from document_retrieval_ray.pipelines.query import cosine_search
    from collections import Counter

    index_dir, oracle, queries, mode = built
    qds = ray.data.read_parquet(tiny_corpus["queries"])
    res = cosine_search(
        qds, index_dir, tokenizer=TokenizerConfig(mode=mode),
        k=10, rerank=True, candidates=50, round_dp=4,
    ).to_pandas()
    got_by_q = {qid: g.sort_values("rank") for qid, g in res.groupby("query_id")}

    cfg = BM25Config(k1=1.5, b=0.75, idf="cosine")
    checked = 0
    for q in queries:
        lang = q["lang"]
        tokens = tokenize(q["query"], lang, mode)
        cos = oracle.score_cosine(q["query"], lang)
        cand = [u for _, u, _, _ in oracle.topk(cos, lang, 50)]
        if not cand:
            continue
        url_to_i = {u: i for i, u in enumerate(oracle.doc_urls[lang])}
        # oracle C3 rerank
        scores = {}
        for u in cand:
            i = url_to_i[u]
            tf = oracle.term_freqs[lang][i]
            dlq = sum(tf.get(t, 0) for t in tokens)  # dups double-count
            s = 0.0
            for t in tokens:
                if t not in oracle.df[lang]:
                    continue
                f = tf.get(t, 0)
                idf = oracle.idf(lang, t, "cosine")
                denom = f + cfg.k1 * (1 - cfg.b + cfg.b * dlq / oracle.avgdl[lang])
                s += idf * (f * (cfg.k1 + 1)) / (denom if denom else 1.0)
            if s > 0:
                scores[u] = s
        exp_order = sorted(
            scores.items(),
            key=lambda kv: (-np.floor(kv[1] * 10000 + 0.5), kv[0]),
        )[:10]
        g = got_by_q.get(q["query_id"])
        if not exp_order:
            assert g is None or len(g) == 0, q["query_id"]
            continue
        assert g is not None, q["query_id"]
        assert list(g["url"]) == [u for u, _ in exp_order], q["query_id"]
        for gs, (_, es) in zip(g["score"], exp_order):
            assert gs == pytest.approx(es, rel=1e-9)
        checked += 1
    assert checked > 0


@pytest.mark.parametrize(
    "cfg",
    [
        CFG_STD,
        # cosine idf law: df > N/2 terms get NEGATIVE idf — the
        # outside-docs bound must clamp those terms' contributions at 0
        BM25Config(k1=1.2, b=0.75, idf="cosine", compat="standard"),
    ],
    ids=["lucene", "cosine-idf"],
)
def test_maxscore_matches_taat(built, cfg):
    """MaxScore accelerated top-k must equal TAAT exactly — forced through
    BOTH the candidate-restricted fast path and the all-hot fallback by a
    tiny hot_df threshold, under both idf sign regimes."""
    from document_retrieval_ray.state.index_shard import score_bm25_maxscore

    index_dir, oracle, queries, mode = built
    for hot_df in (5, 10**9):  # everything-hot vs nothing-hot
        for q in queries:
            lang = q["lang"]
            idx = LangIndex(index_dir, lang)
            tokens = tokenize(q["query"], lang, mode)
            if not tokens:
                continue
            taat = score_bm25_taat(idx, tokens, cfg)
            r_t = topk_with_ties(taat, idx.urls, 10, 4)
            exp = [(int(r), idx.urls[i], int(k)) for r, i, k in zip(*r_t)]
            ss, cand = score_bm25_maxscore(
                idx, tokens, cfg, 10, hot_df=hot_df, round_dp=4
            )
            if cand is None:  # dense exact-TAAT fallback contract
                r_m = topk_with_ties(ss, idx.urls, 10, 4)
                got = [
                    (int(r), idx.urls[i], int(k)) for r, i, k in zip(*r_m)
                ]
                assert got == exp, (q["query_id"], hot_df, cfg.idf)
                continue
            if cand.size == 0:
                assert exp == [], (q["query_id"], hot_df, cfg.idf)
                continue
            su = idx.urls[cand]
            r_m = topk_with_ties(ss, su, 10, 4)
            got = [(int(r), su[i], int(k)) for r, i, k in zip(*r_m)]
            assert got == exp, (q["query_id"], hot_df, cfg.idf)


def test_lm_dirichlet_rank_identity(built):
    """Dirichlet query-likelihood engine scores vs a textbook per-doc
    brute force (independent float op order: per-(doc,term)
    ln((tf+μp)/(dl+μ)) loop vs the engine's dense base+scatter
    decomposition)."""
    import math
    from collections import Counter

    from document_retrieval_ray.state.index_shard import (
        score_lm_dirichlet_taat,
        topk_all,
    )

    index_dir, oracle, queries, mode = built
    mu = 2000.0
    checked = 0
    for q in queries:
        lang = q["lang"]
        idx = LangIndex(index_dir, lang)
        tokens = tokenize(q["query"], lang, mode)
        got = score_lm_dirichlet_taat(idx, tokens, mu=mu)

        cf = Counter()
        for tfd in oracle.term_freqs[lang]:
            for t, v in tfd.items():
                cf[t] += v
        C = float(oracle.dl[lang].sum())
        terms = [
            (t, float(w))
            for t, w in sorted(Counter(tokens).items())
            if cf.get(t)
        ]
        if not terms:
            assert got is None, q["query_id"]
            continue
        n = oracle.N[lang]
        exp = np.zeros(n, dtype=np.float64)
        for d in range(n):
            dl = float(oracle.dl[lang][d])
            s = 0.0
            for t, w in terms:
                tf = float(oracle.term_freqs[lang][d].get(t, 0))
                p = cf[t] / C
                s += w * math.log((tf + mu * p) / (dl + mu))
            exp[d] = s
        assert got == pytest.approx(exp, rel=1e-9, abs=1e-12), q["query_id"]
        # every doc scores: the top-k must rank ALL docs, not just matches
        ranks, sel, _ = topk_all(got, idx.urls, 10, round_dp=4)
        key = np.floor(exp * 10000.0 + 0.5)
        order = np.lexsort((oracle.doc_urls[lang], -key))[:10]
        assert list(idx.urls[sel]) == list(oracle.doc_urls[lang][order]), (
            q["query_id"]
        )
        assert len(ranks) == min(10, n)
        checked += 1
    assert checked > 0
