"""Doc-range-sharded serving (pipelines/sharded.py): a shard group with
global statistics must be RANK-IDENTICAL (rank, url, score_x — and raw
scores to fp tolerance) to one index built over the whole corpus."""

import os

import pandas as pd
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


@pytest.mark.usefixtures("ray_session")
def test_sharded_equals_single_index(tiny_corpus, tmp_path):
    import pyarrow as pa
    import ray.data

    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.query import bm25_search
    from document_retrieval_ray.pipelines.sharded import (
        bm25_search_sharded,
        build_global_df,
    )

    docs = pq.read_table(tiny_corpus["documents"])

    # split the corpus into 2 doc-range shards by url hash
    masks = [
        pa.array([stable_hash64(u) % 2 == s for u in docs["url"].to_pylist()])
        for s in range(2)
    ]
    shard_inputs = []
    for s in range(2):
        p = str(tmp_path / f"corpus_s{s}.parquet")
        pq.write_table(docs.filter(masks[s]), p)
        shard_inputs.append(p)

    single_dir = str(tmp_path / "single")
    build_index(tiny_corpus["documents"], single_dir, cfg=CFG,
                with_cosine_norms=False)
    shard_dirs = []
    for s, p in enumerate(shard_inputs):
        d = str(tmp_path / f"shard_{s}")
        build_index(p, d, cfg=CFG, with_cosine_norms=False)
        shard_dirs.append(d)

    gdf = str(tmp_path / "global_df")
    build_global_df(shard_dirs, gdf)
    # sanity: global df table equals the single index's df table
    single_df = (
        pq.read_table(os.path.join(single_dir, "df"))
        .to_pandas().sort_values(["term"]).reset_index(drop=True)
    )
    merged_df = (
        pq.read_table(gdf).to_pandas().sort_values(["term"]).reset_index(drop=True)
    )
    assert single_df["df"].sum() == merged_df["df"].sum()

    qds = ray.data.read_parquet(tiny_corpus["queries"])
    want = (
        bm25_search(qds, single_dir, cfg=BM25,
                    tokenizer=TokenizerConfig(mode="simple"), round_dp=4)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        bm25_search_sharded(
            qds, shard_dirs, gdf, cfg=BM25,
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
    # raw scores agree to float tolerance (different accumulation order)
    assert (got["score"] - want["score"]).abs().max() < 1e-9
