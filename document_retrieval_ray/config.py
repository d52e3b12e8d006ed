"""Declarative configuration for tokenizer / BM25 / index build.

The reference hard-codes every knob at use sites; here each variant the
reference demonstrates (SURVEY.md §2.10) is a config field:

- tokenizer mode: ``simple`` (lowercase → non-alnum→space → split; exactly
  mirrorable in ANSI SQL for the DuckDB oracle) vs ``reference`` (the
  canonical M1 preprocessing of final_implementation.py:59-88 re-specified
  with self-contained deterministic stand-ins for NLTK/Okt).
- idf law (A4 variants): ``lucene`` = ln(1+(N-df+.5)/(df+.5))
  (final_implementation.py:115-118), ``cosine`` = ln((N-df+.5)/(df+.5))
  (cosine_similarity_bm25_reranking.py:176-182, can be negative),
  ``sklearn`` = ln((N+1)/(df+1))+1 (faiss_based_ANN_Implementation.py:86-90).
- BM25 compat (C1 vs C2): ``reference`` = unique query terms + missing-``b``
  denominator quirk (final_implementation.py:129,142), k1=1.5;
  ``standard`` = duplicate terms counted + correct b*(dl/avgdl)
  (team_run1.py:183-199), k1=1.2 (north-star default).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TokenizerConfig:
    mode: str = "simple"              # "simple" | "reference"
    stopwords: bool = False           # simple mode: filter embedded en stopwords
    bigram_langs: tuple = ("fr", "de", "es", "it")   # reference mode only
    min_token_len: int = 1


@dataclass(frozen=True)
class DedupConfig:
    """Knobs of the near-dup suite (MinHash/LSH + SimHash). The SQL
    oracles in pipelines/testdata_queries.py are generated FROM the
    default instance, so a query run with a non-default config must bring
    its own oracle."""

    num_hashes: int = 8       # minhash signature length
    band_size: int = 2        # hashes per LSH band (→ num_hashes/band_size bands)
    shingle_n: int = 3        # token-shingle width
    max_hamming: int = 3      # simhash near-dup bit distance
    # deterministic cap on LSH/band bucket size: a degenerate bucket (the
    # all-boilerplate band key at web scale) would otherwise make one task
    # O(|bucket|²). Truncation keeps the sorted-doc_id prefix and is
    # AUDITED: every truncating bucket emits a warning with its dropped
    # count (the "no silent caps" rule).
    max_bucket: int = 512


@dataclass(frozen=True)
class BM25Config:
    k1: float = 1.2
    b: float = 0.75
    idf: str = "lucene"               # "lucene" | "cosine" | "sklearn"
    compat: str = "standard"          # "standard" | "reference"
    k: int = 10                       # top-k

    @staticmethod
    def reference() -> "BM25Config":
        """Exact settings of the reference's best pipeline (C1)."""
        return BM25Config(k1=1.5, b=0.75, idf="lucene", compat="reference")


@dataclass(frozen=True)
class IndexConfig:
    block_size: int = 128             # postings per block-max block
    hot_term_threshold: int = 100_000 # postings count above which a term is salted
    salt_shift: int = 16              # salt = doc_id >> salt_shift (doc-range buckets)
    min_df: int = 1                   # M9 low-frequency-term filter (ranking_with_bm25.py:128-132)
    merge_fanout: int = 0             # ≥2 → hierarchical (tree) segment merge:
                                      # each round merges ≤fanout doc-range
                                      # segments per term until one remains;
                                      # byte-identical to the flat merge.
                                      # 0 = single-round flat merge

    docs_per_part: int = 1 << 20      # dense-id partition size
    num_hash_parts: int = 32          # url-hash partitions for dense id assignment
    num_encode_parts: int = 64        # term-hash partitions for the encode shuffle
    tokenizer: TokenizerConfig = field(default_factory=TokenizerConfig)
