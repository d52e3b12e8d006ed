"""Incremental append + compaction (pipelines/incremental.py): serving
base+generations and serving the compacted single index must both be
RANK-IDENTICAL to one index built over the full corpus."""

import os

import pandas as pd
import pyarrow as pa
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


def _split_corpus(docs_path, tmp_path, fractions):
    """Crawl-delta style split: first f0 of rows, then the next f1, …"""
    docs = pq.read_table(docs_path)
    n = docs.num_rows
    paths, start = [], 0
    for i, f in enumerate(fractions):
        end = n if i == len(fractions) - 1 else start + int(n * f)
        p = str(tmp_path / f"delta_{i}.parquet")
        pq.write_table(docs.slice(start, end - start), p)
        paths.append(p)
        start = end
    return paths


@pytest.fixture(scope="module")
def incremental_setup(ray_session, tiny_corpus, tmp_path_factory):
    """Base build + 2 appended generations, plus the full single build."""
    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.incremental import append_index

    tmp_path = tmp_path_factory.mktemp("incr")
    deltas = _split_corpus(tiny_corpus["documents"], tmp_path, [0.5, 0.3, 0.2])

    full_dir = str(tmp_path / "full")
    build_index(tiny_corpus["documents"], full_dir, cfg=CFG,
                with_cosine_norms=False)

    inc_dir = str(tmp_path / "incr")
    build_index(deltas[0], inc_dir, cfg=CFG, with_cosine_norms=False)
    # cfg=None on the first append: reconstructed from the base manifest
    append_index(deltas[1], inc_dir, cfg=None)
    append_index(deltas[2], inc_dir, cfg=CFG)
    return {"tmp": tmp_path, "full": full_dir, "inc": inc_dir,
            "queries": tiny_corpus["queries"]}


def _search_full(setup):
    import ray.data

    from document_retrieval_ray.pipelines.query import bm25_search

    qds = ray.data.read_parquet(setup["queries"])
    return (
        bm25_search(qds, setup["full"], cfg=BM25,
                    tokenizer=TokenizerConfig(mode="simple"), round_dp=4)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_generations_json_lists_two_generations(incremental_setup):
    from document_retrieval_ray.pipelines.incremental import (
        read_generations,
        shard_dirs,
    )

    g = read_generations(incremental_setup["inc"])
    assert g["generations"] == ["gen-00001", "gen-00002"]
    dirs = shard_dirs(incremental_setup["inc"])
    assert len(dirs) == 3 and dirs[0] == incremental_setup["inc"]


def test_incremental_serving_equals_full_rebuild(incremental_setup):
    import ray.data

    from document_retrieval_ray.pipelines.incremental import (
        bm25_search_incremental,
    )

    want = _search_full(incremental_setup)
    qds = ray.data.read_parquet(incremental_setup["queries"])
    got = (
        bm25_search_incremental(
            qds, incremental_setup["inc"], cfg=BM25,
            tokenizer=TokenizerConfig(mode="simple"), round_dp=4,
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
    assert (got["score"] - want["score"]).abs().max() < 1e-9


def test_compacted_index_equals_full_rebuild(incremental_setup):
    import ray.data

    from document_retrieval_ray.pipelines.incremental import compact_index
    from document_retrieval_ray.pipelines.query import bm25_search

    out_dir = str(incremental_setup["tmp"] / "compacted")
    manifests = compact_index(incremental_setup["inc"], out_dir)
    assert manifests  # at least one lang

    want = _search_full(incremental_setup)
    qds = ray.data.read_parquet(incremental_setup["queries"])
    got = (
        bm25_search(qds, out_dir, cfg=BM25,
                    tokenizer=TokenizerConfig(mode="simple"), round_dp=4)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "url", "score_x"]],
        want[["query_id", "rank", "url", "score_x"]],
    )
    assert (got["score"] - want["score"]).abs().max() < 1e-9

    # exact index-statistics parity with the full rebuild: per-lang
    # (term, df, cf) sets and the doc count must be IDENTICAL
    for lang_dir in sorted(os.listdir(os.path.join(out_dir, "postings"))):
        a = (
            pq.read_table(os.path.join(out_dir, "postings", lang_dir),
                          columns=["term", "df", "cf"])
            .to_pandas().sort_values("term").reset_index(drop=True)
        )
        b = (
            pq.read_table(os.path.join(incremental_setup["full"], "postings",
                                       lang_dir),
                          columns=["term", "df", "cf"])
            .to_pandas().sort_values("term").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    # manifests carry exact integer sums
    from document_retrieval_ray.state.manifest import read_manifest

    for lang in os.listdir(os.path.join(out_dir, "manifests")):
        mc = read_manifest(os.path.join(out_dir, "manifests", lang))
        mf = read_manifest(os.path.join(incremental_setup["full"], "manifests",
                                        lang))
        assert mc["n_docs"] == mf["n_docs"]
        assert mc["total_tokens"] == mf["total_tokens"]


def test_compacted_docmap_is_a_permutation_of_full(incremental_setup):
    out_dir = str(incremental_setup["tmp"] / "compacted")
    if not os.path.isdir(out_dir):
        pytest.skip("compaction test did not run first")
    for lang_dir in sorted(os.listdir(os.path.join(out_dir, "docmap"))):
        a = pq.read_table(os.path.join(out_dir, "docmap", lang_dir),
                          columns=["doc_id", "url", "dl"]).to_pandas()
        b = pq.read_table(
            os.path.join(incremental_setup["full"], "docmap", lang_dir),
            columns=["doc_id", "url", "dl"],
        ).to_pandas()
        # same url→dl mapping; ids dense and unique in both
        assert sorted(a["doc_id"]) == list(range(len(a)))
        assert sorted(b["doc_id"]) == list(range(len(b)))
        pd.testing.assert_frame_equal(
            a[["url", "dl"]].sort_values("url").reset_index(drop=True),
            b[["url", "dl"]].sort_values("url").reset_index(drop=True),
        )


def test_append_then_compact_rebuilds_cosine_norms(ray_session, tiny_corpus,
                                                   tmp_path_factory):
    """The daily-crawl cosine workflow: a norms-built base accepts
    appends (generation builds carry no norms), and compaction REBUILDS
    the norms artifact over the merged corpus — cosine results and the
    per-url norm2 values must equal a fresh full build with norms."""
    import numpy as np
    import ray.data

    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.incremental import (
        append_index,
        compact_index,
    )
    from document_retrieval_ray.pipelines.query import cosine_search
    from document_retrieval_ray.state.manifest import read_manifest

    tmp_path = tmp_path_factory.mktemp("incr_norms")
    deltas = _split_corpus(tiny_corpus["documents"], tmp_path, [0.7, 0.3])
    base = str(tmp_path / "base_norms")
    build_index(deltas[0], base, cfg=CFG, with_cosine_norms=True)
    append_index(deltas[1], base)          # no longer refuses

    out_dir = str(tmp_path / "compacted_norms")
    manifests = compact_index(base, out_dir)   # auto: base had norms
    assert all(m["with_cosine_norms"] for m in manifests.values())

    full_dir = str(tmp_path / "full_norms")
    build_index(tiny_corpus["documents"], full_dir, cfg=CFG,
                with_cosine_norms=True)

    # per-url norm2 parity (doc ids differ between the two layouts)
    for lang_dir in sorted(os.listdir(os.path.join(out_dir, "norms"))):
        def url_norms(d):
            n = pq.read_table(os.path.join(d, "norms", lang_dir)).to_pandas()
            dm = pq.read_table(os.path.join(d, "docmap", lang_dir),
                               columns=["doc_id", "url"]).to_pandas()
            m = n.merge(dm, on="doc_id")
            return m.sort_values("url")["norm2"].to_numpy()

        a, b = url_norms(out_dir), url_norms(full_dir)
        assert len(a) == len(b) > 0
        np.testing.assert_allclose(a, b, rtol=1e-12)

    qds = ray.data.read_parquet(tiny_corpus["queries"])

    def run(d):
        return (
            cosine_search(qds, d, tokenizer=TokenizerConfig(mode="simple"),
                          round_dp=4)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )

    got, want = run(out_dir), run(full_dir)
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "url", "score_x"]],
        want[["query_id", "rank", "url", "score_x"]],
    )
    # the compaction manifest parity: read_manifest sees norms flag
    for lang in os.listdir(os.path.join(out_dir, "manifests")):
        assert read_manifest(
            os.path.join(out_dir, "manifests", lang)
        )["with_cosine_norms"]


def test_search_incremental_requires_generations(ray_session, tiny_corpus,
                                                 tmp_path_factory):
    import ray.data

    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.incremental import (
        bm25_search_incremental,
    )

    tmp_path = tmp_path_factory.mktemp("incr_plain")
    base = str(tmp_path / "plain")
    build_index(tiny_corpus["documents"], base, cfg=CFG,
                with_cosine_norms=False)
    qds = ray.data.read_parquet(tiny_corpus["queries"])
    with pytest.raises(FileNotFoundError):
        bm25_search_incremental(qds, base)
