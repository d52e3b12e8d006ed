"""Batch query pipelines over a built index (SURVEY.md §7 Phase 3).

Reference analog: ``retrieve_test_queries_optimized``
(final_implementation.py:290-506) loads per-language models into driver
RAM and loops query batches sequentially. Here the queries are a Dataset
mapped over a scorer actor pool; results stream out and are sorted by
(query_id, rank) only at the sink (small output: k rows per query).
"""

from __future__ import annotations

import ray.data

from ..config import BM25Config, TokenizerConfig
from ..stages.score import BM25ScorerStage, CosineScorerStage
from ..util import default_pool


def bm25_search(
    queries: ray.data.Dataset,
    index_dir: str,
    cfg: BM25Config = BM25Config(),
    tokenizer: TokenizerConfig = TokenizerConfig(),
    method: str = "taat",
    round_dp=4,
    concurrency=None,
    batch_size: int = 256,
    shared_refs=None,
) -> ray.data.Dataset:
    """queries(query_id, query, lang) → (query_id, rank, url, score, score_x).

    ``shared_refs``: optional {lang: ObjectRef} of
    ``state.index_shard.build_shared_payload`` dicts — scorer actors then
    map the index zero-copy from the object store instead of each loading
    the shard from disk."""
    if concurrency is None:
        concurrency = default_pool(0.5)
    return queries.map_batches(
        BM25ScorerStage,
        fn_constructor_kwargs=dict(
            index_dir=index_dir, cfg=cfg, tokenizer=tokenizer,
            round_dp=round_dp, method=method, shared_refs=shared_refs,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def cosine_search(
    queries: ray.data.Dataset,
    index_dir: str,
    tokenizer: TokenizerConfig = TokenizerConfig(),
    k: int = 10,
    rerank: bool = False,
    candidates: int = 200,
    round_dp=4,
    concurrency=None,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """C5 cosine top-k; ``rerank=True`` → C6 two-stage (cosine → BM25-C3)."""
    if concurrency is None:
        concurrency = default_pool(0.5)
    return queries.map_batches(
        CosineScorerStage,
        fn_constructor_kwargs=dict(
            index_dir=index_dir, tokenizer=tokenizer, k=k,
            candidates=candidates, rerank=rerank, round_dp=round_dp,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def to_submission(results: ray.data.Dataset) -> ray.data.Dataset:
    """(query_id, rank, url, …) → (query_id, docids: stringified top-k list)
    — the reference's submission sink shape (final_implementation.py:527-530)."""
    import pandas as pd

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rank")
        return pd.DataFrame(
            {"query_id": [g["query_id"].iloc[0]], "docids": [str(list(g["url"]))]}
        )

    return results.groupby("query_id").map_groups(collect, batch_format="pandas")
