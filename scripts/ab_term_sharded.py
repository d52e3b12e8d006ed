#!/usr/bin/env python
"""Latency A/B: term-sharded serving, full bucket-TAAT merge vs the
3-phase pruned scheme (pipelines/term_sharded.py), with single-index
TAAT / MaxScore as reference points. One warm in-process server per
variant — the unit a serving deployment replicates; the pruned scheme's
P1/P3 messages are top-m/survivor-sized, so its in-process win is also
the cross-node exchange-volume win.

    PYTHONPATH=/root/repo python scripts/ab_term_sharded.py
"""
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = int(os.environ.get("AB_DOCS", "200000"))
QUERIES = int(os.environ.get("AB_QUERIES", "500"))
BUCKETS = int(os.environ.get("AB_BUCKETS", "4"))


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from document_retrieval_ray.config import (
        BM25Config, IndexConfig, TokenizerConfig,
    )
    from document_retrieval_ray.functions.tokenizer import tokenize_cfg
    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.term_sharded import (
        build_term_buckets, score_term_sharded_pruned, _term_sharded_taat,
    )
    from document_retrieval_ray.sources.synth import write_corpus
    from document_retrieval_ray.state.index_shard import (
        LangIndex, score_bm25_maxscore, score_bm25_taat, topk_with_ties,
    )

    corpus = f"/tmp/drr_ab/corpus_{DOCS}"
    if not os.path.exists(os.path.join(corpus, "documents.parquet")):
        write_corpus(corpus, num_docs=DOCS, seed=42, mean_len=200)
    index_dir = f"/tmp/drr_ab/index_{DOCS}"
    build_index(os.path.join(corpus, "documents.parquet"), index_dir,
                cfg=IndexConfig(tokenizer=TokenizerConfig(mode="simple"),
                                num_hash_parts=16),
                with_cosine_norms=False)
    bdir = f"/tmp/drr_ab/buckets_{DOCS}_{BUCKETS}"
    if not os.path.exists(os.path.join(bdir, "term_buckets.json")):
        shutil.rmtree(bdir, ignore_errors=True)
        build_term_buckets(index_dir, bdir, num_buckets=BUCKETS)

    cfg = BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard")
    tok = TokenizerConfig(mode="simple")
    sidx = LangIndex(index_dir, "en")
    bidx = [LangIndex(os.path.join(bdir, f"bucket-{b:04d}"), "en")
            for b in range(BUCKETS)]

    rng = np.random.default_rng(7)
    qs = []
    for _ in range(QUERIES):
        nterms = 2 + int(rng.integers(0, 3))
        qs.append(" ".join(
            f"entok{int(rng.zipf(1.4)) % 1500}" for _ in range(nterms)))

    def run(fn):
        lats, fp = [], 0
        for q in qs:
            toks = tokenize_cfg(q, "en", tok)
            t0 = time.perf_counter()
            fn(toks)
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()
        return {
            "p50_ms": round(lats[len(lats) // 2], 3),
            "p99_ms": round(lats[int(len(lats) * 0.99)], 3),
        }

    def active(toks):
        out = []
        for idx in bidx:
            bt = [t for t in toks if t in idx._terms]
            if bt:
                out.append((idx, bt))
        return out

    def _rank_maxscore(t):
        scores, cand = score_bm25_maxscore(sidx, t, cfg, 10, round_dp=4)
        urls = sidx.urls if cand is None else sidx.urls.select(cand)
        return topk_with_ties(scores, urls, 10, 4)

    variants = {
        "single_taat": lambda t: topk_with_ties(
            score_bm25_taat(sidx, t, cfg), sidx.urls, 10, 4),
        "single_maxscore": _rank_maxscore,
        "sharded_taat_merge": lambda t: (lambda tc: topk_with_ties(
            tc[0], sidx.urls.select(tc[1]), 10, 4))(
                _term_sharded_taat(active(t), cfg)),
        "sharded_pruned": lambda t: (lambda tc: topk_with_ties(
            tc[0], sidx.urls.select(tc[1]), 10, 4))(
                score_term_sharded_pruned(bidx, t, cfg, k=10, round_dp=4)),
    }
    out = {"docs": DOCS, "queries": QUERIES, "buckets": BUCKETS}
    for name, fn in variants.items():
        run(lambda t: fn(t))  # warm pass (decode caches)
        out[name] = run(fn)
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
