"""Dense-estimate scoring path (``score_bm25_dense_est``): the float32
dense-contribution estimate + exact float64 candidate rescore must be
bit-identical to TAAT under every config it can serve — including raw
float keys (round_dp=None) and the negative-idf cosine law — and the
``score_bm25_maxscore`` entry point must stay exact with the dense
fallback wired in."""

import numpy as np
import pytest

from document_retrieval_ray.config import BM25Config, IndexConfig, TokenizerConfig
from document_retrieval_ray.functions.tokenizer import tokenize_cfg
from document_retrieval_ray.state.index_shard import (
    LangIndex,
    build_shared_payload,
    score_bm25_dense_est,
    score_bm25_maxscore,
    score_bm25_taat,
    topk_with_ties,
)

TOK = TokenizerConfig(mode="simple")


@pytest.fixture(scope="module")
def dense_index(ray_session, tmp_path_factory):
    """~4k-doc synthetic corpus, indexed; payload thresholds lowered so
    the Zipf head qualifies for dense float32 arrays."""
    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.sources.synth import write_corpus

    root = tmp_path_factory.mktemp("dense_est")
    corpus = str(root / "corpus")
    write_corpus(corpus, num_docs=4000, seed=11, mean_len=80)
    index_dir = str(root / "index")
    build_index(
        corpus + "/documents.parquet",
        index_dir,
        cfg=IndexConfig(tokenizer=TOK, num_hash_parts=4,
                        hot_term_threshold=10**9),
        with_cosine_norms=False,
    )
    return index_dir


def _queries(n=250, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        nterms = 1 + int(rng.integers(0, 4))
        out.append(" ".join(
            f"entok{int(rng.zipf(1.4)) % 1500}" for _ in range(nterms)
        ))
    # hand-picked shapes: OOV, dup terms, ultra-hot only, hot+rare mix
    out += ["entok0 entok0 entok1", "nosuchterm", "entok1",
            "entok1 entok1400", "entok0 entok2 entok900"]
    return out


@pytest.mark.parametrize(
    "cfg,dp",
    [
        (BM25Config(k1=1.2, b=0.75, compat="standard"), 4),
        (BM25Config(k1=1.2, b=0.75, compat="standard"), None),
        (BM25Config.reference(), 4),
        (BM25Config(k1=1.2, b=0.75, idf="cosine", compat="standard"), 4),
    ],
    ids=["standard", "raw-float", "reference", "cosine-idf"],
)
def test_dense_est_bit_identical_to_taat(dense_index, cfg, dp):
    payload = build_shared_payload(
        dense_index, "en", hot_decode_df=20, contrib_cfg=cfg,
        dense_df_frac=8,  # explicit: independent of DRR_DENSE_DF_FRAC
    )
    idx = LangIndex.from_payload(payload)
    assert len(idx._dense) > 0, "dense arrays must exist for this test"
    fired = 0
    for q in _queries():
        toks = tokenize_cfg(q, "en", TOK)
        if not toks:
            continue
        taat = score_bm25_taat(idx, toks, cfg)
        rt = topk_with_ties(taat, idx.urls, 10, dp)
        exp = [(int(r), idx.urls[int(i)], float(k)) for r, i, k in zip(*rt)]

        de = score_bm25_dense_est(idx, toks, cfg, 10, dp)
        if de is not None:
            fired += 1
            cs, cand = de
            su = idx.urls.select(cand)
            rm = topk_with_ties(cs, su, 10, dp)
            got = [(int(r), su[int(i)], float(k)) for r, i, k in zip(*rm)]
            assert got == exp, q

        ss, cand = score_bm25_maxscore(idx, toks, cfg, 10, round_dp=dp)
        if cand is None:
            rm = topk_with_ties(ss, idx.urls, 10, dp)
            got = [(int(r), idx.urls[int(i)], float(k)) for r, i, k in zip(*rm)]
        elif cand.size == 0:
            got = []
        else:
            su = idx.urls.select(cand)
            rm = topk_with_ties(ss, su, 10, dp)
            got = [(int(r), su[int(i)], float(k)) for r, i, k in zip(*rm)]
        assert got == exp, ("maxscore", q)
    assert fired > 50, f"dense path barely fired ({fired})"


def test_dense_est_declines_without_arrays(dense_index):
    """No contrib_cfg → no dense arrays → path declines (returns None)."""
    cfg = BM25Config(k1=1.2, b=0.75, compat="standard")
    idx = LangIndex.from_payload(
        build_shared_payload(dense_index, "en", hot_decode_df=20)
    )
    assert idx._dense == {}
    toks = tokenize_cfg("entok1 entok2", "en", TOK)
    assert score_bm25_dense_est(idx, toks, cfg, 10, 4) is None


def test_dense_est_declines_on_cfg_mismatch(dense_index):
    """Payload built for one (k1,b,compat) must not serve another."""
    built_cfg = BM25Config(k1=1.2, b=0.75, compat="standard")
    other_cfg = BM25Config(k1=1.5, b=0.75, compat="standard")
    idx = LangIndex.from_payload(
        build_shared_payload(dense_index, "en", hot_decode_df=20,
                             contrib_cfg=built_cfg, dense_df_frac=8)
    )
    assert len(idx._dense) > 0
    toks = tokenize_cfg("entok1 entok2", "en", TOK)
    assert score_bm25_dense_est(idx, toks, other_cfg, 10, 4) is None
    # ...and the maxscore entry point still returns exact results there
    taat = score_bm25_taat(idx, toks, other_cfg)
    rt = topk_with_ties(taat, idx.urls, 10, 4)
    exp = [(int(r), idx.urls[int(i)], float(k)) for r, i, k in zip(*rt)]
    ss, cand = score_bm25_maxscore(idx, toks, other_cfg, 10, round_dp=4)
    if cand is None:
        rm = topk_with_ties(ss, idx.urls, 10, 4)
        got = [(int(r), idx.urls[int(i)], float(k)) for r, i, k in zip(*rm)]
    else:
        su = idx.urls.select(cand)
        rm = topk_with_ties(ss, su, 10, 4)
        got = [(int(r), su[int(i)], float(k)) for r, i, k in zip(*rm)]
    assert got == exp


def test_dense_est_worthwhile_gate(dense_index):
    """The MaxScore fallback pre-gate: attempts the estimate only when
    >= half the present query terms have dense arrays (a failed
    estimate ADDS a corpus-wide float32 pass before the exact TAAT)."""
    from document_retrieval_ray.state.index_shard import (
        dense_est_worthwhile,
    )

    cfg = BM25Config(k1=1.2, b=0.75, compat="standard")
    idx = LangIndex.from_payload(
        build_shared_payload(dense_index, "en", hot_decode_df=20,
                             contrib_cfg=cfg, dense_df_frac=8)
    )
    dense_terms = [t for t in idx._terms if idx._dense.get(
        idx._terms.get(t)) is not None]
    sparse_terms = [t for t in idx._terms if idx._dense.get(
        idx._terms.get(t)) is None]
    assert dense_terms and len(sparse_terms) >= 3
    assert dense_est_worthwhile(idx, dense_terms[:1], cfg)
    assert dense_est_worthwhile(idx, dense_terms[:1] + sparse_terms[:1], cfg)
    assert not dense_est_worthwhile(
        idx, dense_terms[:1] + sparse_terms[:3], cfg)
    assert not dense_est_worthwhile(idx, sparse_terms[:2], cfg)
    # cfg mismatch / no dense arrays → never worthwhile
    other = BM25Config(k1=1.5, b=0.75, compat="standard")
    assert not dense_est_worthwhile(idx, dense_terms[:1], other)
