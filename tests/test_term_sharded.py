"""Term-range-sharded serving (pipelines/term_sharded.py): the bucket
group must be RANK-IDENTICAL (rank, url, score_x — raw scores to fp
tolerance) to the single index, including when queries span buckets."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from document_retrieval_ray.config import BM25Config, IndexConfig, TokenizerConfig

CFG = IndexConfig(
    tokenizer=TokenizerConfig(mode="simple"),
    num_hash_parts=4,
    hot_term_threshold=80,
    salt_shift=5,
    block_size=16,
)
BM25 = BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard")


@pytest.fixture(scope="module")
def term_shard_setup(ray_session, tiny_corpus, tmp_path_factory):
    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.term_sharded import (
        build_term_buckets,
    )

    tmp_path = tmp_path_factory.mktemp("term_sharded")
    single_dir = str(tmp_path / "single")
    build_index(tiny_corpus["documents"], single_dir, cfg=CFG,
                with_cosine_norms=False)
    buckets_dir = str(tmp_path / "buckets")
    table = build_term_buckets(single_dir, buckets_dir, num_buckets=3)
    return {"single": single_dir, "buckets": buckets_dir, "table": table,
            "queries": tiny_corpus["queries"]}


def test_bucket_layout_partitions_vocabulary(term_shard_setup):
    """Every (lang, term) lives in exactly ONE bucket; per-bucket df
    slices reassemble to the base df table; cuts are sorted."""
    from document_retrieval_ray.pipelines.term_sharded import _langs_of

    single = term_shard_setup["single"]
    bdir = term_shard_setup["buckets"]
    table = term_shard_setup["table"]
    assert table["num_buckets"] == 3
    for lang in _langs_of(single):
        cuts = table["cuts"][lang]
        assert cuts == sorted(cuts)
        base = (
            pq.read_table(os.path.join(single, "postings", f"lang={lang}"),
                          columns=["term", "df"])
            .to_pandas().sort_values("term").reset_index(drop=True)
        )
        parts = []
        for b in range(3):
            p = os.path.join(bdir, f"bucket-{b:04d}", "postings",
                             f"lang={lang}")
            t = pq.read_table(p, columns=["term", "df"]).to_pandas()
            if len(t):
                lo, hi = t["term"].min(), t["term"].max()
                # range property: bucket b's terms sit between its cuts
                if b > 0:
                    assert lo >= cuts[b - 1]
                if b < len(cuts):
                    assert hi < cuts[b]
            parts.append(t)
        merged = (
            pd.concat(parts).sort_values("term").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(merged, base)


def test_term_sharded_equals_single_index(term_shard_setup):
    import ray.data

    from document_retrieval_ray.pipelines.query import bm25_search
    from document_retrieval_ray.pipelines.term_sharded import (
        bm25_search_term_sharded,
    )

    qds = ray.data.read_parquet(term_shard_setup["queries"])
    want = (
        bm25_search(qds, term_shard_setup["single"], cfg=BM25,
                    tokenizer=TokenizerConfig(mode="simple"), round_dp=4)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        bm25_search_term_sharded(
            qds, term_shard_setup["single"], term_shard_setup["buckets"],
            cfg=BM25, tokenizer=TokenizerConfig(mode="simple"), round_dp=4,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "url", "score_x"]],
        want[["query_id", "rank", "url", "score_x"]],
    )
    # raw float: a distributed sum regroups additions — ulp tolerance
    assert (got["score"] - want["score"]).abs().max() < 1e-9


def test_queries_route_to_owning_buckets_only(term_shard_setup):
    """The fan-out sends a query only to buckets owning >= 1 of its
    terms (verified against the cut table), never to all buckets."""
    import pyarrow as pa
    import ray.data

    from document_retrieval_ray.functions.tokenizer import tokenize_cfg
    from document_retrieval_ray.pipelines.term_sharded import (
        read_term_buckets,
    )

    table = read_term_buckets(term_shard_setup["buckets"])
    qt = pq.read_table(term_shard_setup["queries"]).to_pandas()
    row = qt.iloc[0]
    lang = row["lang"]
    cuts = np.asarray(table["cuts"][lang], dtype=object)
    tokens = tokenize_cfg(row["query"], lang, TokenizerConfig(mode="simple"))
    want_buckets = set(
        int(b) for b in np.searchsorted(
            cuts, np.asarray(tokens, dtype=object), side="right"
        )
    )
    assert want_buckets and len(want_buckets) <= len(tokens)


def test_distributed_cuts_byte_identical(term_shard_setup):
    """compute_term_cuts (histogram + narrow-range fetch — no vocab-sized
    driver materialization) reproduces the in-memory sorted-vocab cut
    selection byte-for-byte, at several bucket counts and prefix lengths
    (prefix_len=1 forces multi-term prefix ranges; the tiny
    max_fetch_terms forces the refinement retry loop)."""
    from document_retrieval_ray.pipelines.term_sharded import (
        _langs_of, compute_term_cuts, cuts_from_sorted_vocab,
    )

    single = term_shard_setup["single"]

    def expected(num_buckets):
        out = {}
        for lang in _langs_of(single):
            t = pq.read_table(os.path.join(single, "df", f"lang={lang}"),
                              columns=["term", "df"])
            terms = np.asarray(t["term"].to_pylist(), dtype=object)
            dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(terms)
            out[lang] = cuts_from_sorted_vocab(
                terms[order], dfs[order], num_buckets)
        return out

    for nb in (2, 3, 5):
        assert compute_term_cuts(single, nb) == expected(nb), nb
    assert compute_term_cuts(single, 3, prefix_len=1) == expected(3)
    # refinement loop: a 1-codepoint histogram over a fetch budget this
    # small must lengthen the prefix and still land on identical cuts
    assert compute_term_cuts(single, 3, prefix_len=1,
                             max_fetch_terms=4) == expected(3)


def test_pruned_term_sharded_rank_identical(term_shard_setup):
    """score_term_sharded_pruned (distributed MaxScore — rare terms'
    owning buckets anchor the candidate set, hot buckets gather onto it
    with clamped bounds) is rank-identical to the single index at the
    serving contract, across the corpus query set plus crafted
    multi-bucket queries, at hot_df settings that exercise the pure-rare
    path, the hot-gather path, and the all-hot exact-merge fallback."""
    from document_retrieval_ray.functions.tokenizer import tokenize_cfg
    from document_retrieval_ray.pipelines.term_sharded import (
        read_term_buckets, score_term_sharded_pruned,
    )
    from document_retrieval_ray.state.index_shard import (
        LangIndex, score_bm25_taat, topk_with_ties,
    )

    single_dir = term_shard_setup["single"]
    bdir = term_shard_setup["buckets"]
    table = read_term_buckets(bdir)
    nb = table["num_buckets"]
    qt = pq.read_table(term_shard_setup["queries"]).to_pandas()
    cases = [(r["query"], r["lang"]) for _, r in qt.iterrows()]
    # crafted: span all buckets (cut-list terms), repeat-heavy, unknowns
    for lang, cuts in table["cuts"].items():
        cases.append((" ".join(cuts) + " " + (cuts[0] if cuts else ""), lang))
        cases.append(("zzznotaterm " + " ".join(cuts[:1]) * 3, lang))

    singles, buckets = {}, {}
    for _, lang in cases:
        if lang in singles:
            continue
        singles[lang] = LangIndex(single_dir, lang)
        row = []
        for b in range(nb):
            try:
                row.append(LangIndex(os.path.join(bdir, f"bucket-{b:04d}"),
                                     lang))
            except FileNotFoundError:
                row.append(None)
        buckets[lang] = row

    n_nonempty = 0
    for hot_df in (50_000, 2, 0):
        for q, lang in cases:
            toks = tokenize_cfg(q, lang, TokenizerConfig(mode="simple"))
            if not toks:
                continue
            sidx = singles[lang]
            want_scores = score_bm25_taat(sidx, toks, BM25)
            w_r, w_sel, w_key = topk_with_ties(want_scores, sidx.urls, 10, 4)
            totals, cand = score_term_sharded_pruned(
                buckets[lang], toks, BM25, k=10, round_dp=4, hot_df=hot_df)
            g_r, g_sel, g_key = topk_with_ties(
                totals, sidx.urls.select(cand), 10, 4)
            assert list(w_r) == list(g_r), (q, lang)
            assert list(w_key) == list(g_key), (q, lang)
            want_urls = [sidx.urls[int(i)] for i in w_sel]
            got_urls = [sidx.urls[int(cand[int(i)])] for i in g_sel]
            assert want_urls == got_urls, (q, lang)
            # raw totals: ulp tolerance (cross-bucket sum regrouping)
            got_raw = {u: totals[int(i)] for u, i in zip(got_urls, g_sel)}
            for u, i in zip(want_urls, w_sel):
                assert abs(got_raw[u] - want_scores[int(i)]) < 1e-9
            if len(w_r):
                n_nonempty += 1
    assert n_nonempty > 0


def test_colocated_pruned_batch_equals_fanout(term_shard_setup):
    """bm25_search_term_sharded_pruned (colocated group scorer, one
    map, zero shuffles) matches the fan-out/merge pipeline row for row
    at the serving contract."""
    import ray.data

    from document_retrieval_ray.pipelines.term_sharded import (
        bm25_search_term_sharded, bm25_search_term_sharded_pruned,
    )

    qds = ray.data.read_parquet(term_shard_setup["queries"])
    want = (
        bm25_search_term_sharded(
            qds, term_shard_setup["single"], term_shard_setup["buckets"],
            cfg=BM25, tokenizer=TokenizerConfig(mode="simple"), round_dp=4,
        ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    got = (
        bm25_search_term_sharded_pruned(
            qds, term_shard_setup["single"], term_shard_setup["buckets"],
            cfg=BM25, tokenizer=TokenizerConfig(mode="simple"), round_dp=4,
        ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "url", "score_x"]],
        want[["query_id", "rank", "url", "score_x"]],
    )
    assert (got["score"] - want["score"]).abs().max() < 1e-9
