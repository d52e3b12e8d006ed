"""document_retrieval_ray — a Ray-Data-native inverted-index + BM25 engine.

A from-scratch rebuild of the capabilities of the reference repo
(Harkeerat2002/document-retrieval, an in-RAM pandas/pickle multilingual
BM25 retrieval system) re-expressed Ray-Data-first:

- ``sources/``    Parquet corpus/query readers + deterministic synthetic
                  Common-Crawl-style corpus generator (input_hint shape).
- ``functions/``  pure, deterministic kernels: tokenizers, stopwords,
                  varbyte posting codec, hashing/minhash, text stats.
- ``stages/``     map_batches-compatible batch transforms and actor-pool
                  classes (extract, tokenize, postings, scorers, dedup, ann).
- ``pipelines/``  end-to-end Dataset pipelines (index build, query, dedup).
- ``state/``      index shard layout, manifests, resumable checkpoints.
- ``oracle.py``   single-process numpy re-implementation of the reference
                  scoring semantics (rank-identity test oracle).

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"
