"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in document_retrieval_ray) calls ray.init()/ray.shutdown().

- ``entry()``      flagship BM25 retrieval over /root/testdata/sf0.001:
                   builds (or resumes) the inverted index with the Ray
                   pipeline and scores the embedded reference-style query
                   set (reference compat: k1=1.5, unique terms, missing-b
                   quirk — final_implementation.py:127-145 semantics).
- ``queries()``    one entry per implemented operator/pipeline
                   (SURVEY.md §2 + training-data extensions); each takes
                   sf_dir and returns a Dataset / DataFrame.
- ``oracle_sql()`` the exactly mirrored DuckDB SQL per query (column
                   names and fixed-point encodings match by construction;
                   see pipelines/testdata_queries.py). Every query has an
                   oracle, including ``simhash_pairs`` (the md5-based
                   signature is recomputed bit-by-bit in SQL) and
                   ``embed_neardup_lsh`` (the hyperplane matrix is
                   embedded as SQL literals).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from document_retrieval_ray.pipelines.testdata_queries import q_bm25_reference

    return q_bm25_reference("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from document_retrieval_ray.pipelines.testdata_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from document_retrieval_ray.pipelines.testdata_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
