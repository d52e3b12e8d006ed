"""Driver-testdata query suite: every operator from SURVEY.md §2 (plus the
training-data extensions) as a Ray pipeline over
``/root/testdata/sf*/``, each with an EXACTLY mirrored DuckDB oracle SQL.

Matching rules (shared with the SQL strings):
- tokenization = functions.tokenizer.tokenize_simple ≙ the
  ``string_split_regex(...)`` expression (tested equal in test_functions).
- every float is exported fixed-point: ``*_x = floor(v*10000 + 0.5)`` as
  BIGINT (functions.textstats.fx4); money uses ``*_c`` cents =
  ``floor(v*100 + 0.5)`` per ROW before integer summation, so sums are
  exact in both engines.
- rankings order by (rounded score desc, id asc) in both engines.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import BM25Config, IndexConfig, TokenizerConfig
from ..functions.stopwords import EN_SQL_STOPWORDS
from ..functions.textstats import LANG_MARKERS
from ..functions.tokenizer import tokenize_simple
from ..sources.corpus import docid_to_url, read_testdata_documents, url_to_docid
from ..stages.analysis import doc_stats_batch, fingerprint_batch, langid_batch
from ..util import from_pandas_clean, read_parquet_clean
from ..stages.dedup import (
    add_simhash,
    add_text_hash,
    attach_partition,
    band_pairs_partition,
    containment_bucket_pairs_partition,
    containment_partition,
    dedup_pairs_partition,
    emit_band_rows,
    emit_doc_shingles,
    emit_simhash_bands,
    jaccard_partition,
    pair_side_rows,
    simhash_pairs_partition,
    explode_shingle_rows,
    prefix_rows_partition,
    shingle_bucket_pairs_partition,
    shingle_df_partition,
    DEFAULT_DEDUP,
    MAX_BUCKET,
    SHINGLE_N,
)
from ..config import DedupConfig
from ..stages.index_build import add_kpart
from ..stages.ann import (
    BruteForceTopK,
    BucketTopK,
    IVFTopK,
    IVF_DIST_SCALE,
    NearDupPairs,
    emit_tile_rows,
    final_topk,
    fit_ivf_centroids,
    ivf_assign_batch,
    lsh_bucket,
    tile_pairs,
)
from ..stages.multimodal import binary_meta_batch
from ..stages.postings import emit_postings
from ..stages.tokenize import TokenizeStage, flatten_tokens
from ..stages.index_build import partial_term_counts
from ..util import arrow_blocks, default_pool

# ---------------------------------------------------------------- constants

# embedded retrieval query set (FIXTURES.md F2 shapes over the testdata vocab)
QUERYSET = [
    ("q01", "spark join window", "en"),
    ("q02", "the the spark", "en"),        # duplicate terms
    ("q03", "hash join zzzunseen", "fr"),  # OOV mix
    ("q04", "vector stream", "es"),
    ("q05", "data big query", "zh"),
    ("q06", "merge sort slow", "de"),
    ("q07", "dup", "en"),                  # rare marker term
    ("q08", "the", "fr"),                  # hot term
]
SAMPLE_TERMS = ("spark", "join", "window", "dup")
ANN_QUERY_IDS = (0, 1, 2, 3, 4)
NEARDUP_COS_THRESHOLD = 0.4
MINHASH_JACCARD_THRESHOLD = 0.5
NGRAM_JACCARD_THRESHOLD = 0.5
# fixed random-hyperplane matrix for the LSH near-dup path: module-level
# and seeded so the DuckDB oracle can embed the IDENTICAL planes as SQL
# literals (testdata embeddings are 64-dim)
EMB_DIM = 64
LSH_NUM_PLANES = 4
LSH_PLANES = np.random.default_rng(13).standard_normal((EMB_DIM, LSH_NUM_PLANES))
# IVF coarse-quantizer knobs: tiny nlist at test scale (the structure,
# not the constants, is what scales — at 100 TB nlist ~ sqrt(N)).
# The SQL oracle re-derives the SAME centroids from the data (init =
# vec_id < nlist, fixed Lloyd iterations, fixed-point sums), so no
# literals need embedding.
IVF_NLIST = 4
IVF_NPROBE = 2
IVF_NITER = 2

# Product-quantization knobs (same tiny-at-test-scale philosophy: at
# 100 TB the canonical setting is nsub=dim/2..dim/4 subspaces with
# ksub=256 one-byte codes; the SQL oracle re-derives the codebooks from
# the data, so no literals are embedded)
PQ_NSUB = 4
PQ_KSUB = 4
PQ_NITER = 2

# ------------------------------------------------------------ SQL fragments

TOKLIST = (
    "list_filter(string_split_regex(trim(regexp_replace(lower({col}), "
    "'[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"
)


def _fx(expr: str, scale: int = 10000) -> str:
    return f"CAST(floor(({expr})*{scale}.0 + 0.5) AS BIGINT)"


_TOK_CTE = (
    "tok AS (SELECT doc_id, lang, term, count(*) AS tf FROM "
    "(SELECT doc_id, lang, unnest(" + TOKLIST.format(col="text") + ") AS term "
    "FROM documents) GROUP BY doc_id, lang, term)"
)
_DL_CTE = (
    "dl AS (SELECT doc_id, lang, len(" + TOKLIST.format(col="text") + ") AS dl "
    "FROM documents)"
)
_STATS_CTE = "stats AS (SELECT lang, count(*) AS n_docs, avg(dl) AS avgdl FROM dl GROUP BY lang)"
_DF_CTE = "df AS (SELECT lang, term, count(*) AS df FROM tok GROUP BY lang, term)"


def _query_values(dedup: bool) -> str:
    """VALUES rows (query_id, lang, term, w) from QUERYSET; ``dedup`` →
    unique terms with w=1 (reference C1), else multiplicity weights."""
    rows = []
    for qid, text, lang in QUERYSET:
        toks = tokenize_simple(text)
        if dedup:
            items = [(t, 1) for t in sorted(set(toks))]
        else:
            c = {}
            for t in toks:
                c[t] = c.get(t, 0) + 1
            items = sorted(c.items())
        for t, w in items:
            rows.append(f"('{qid}', '{lang}', '{t}', {w})")
    return ", ".join(rows)


def _bm25_sql(k1: float, b: float, reference_quirk: bool, dedup: bool,
              where: str = "") -> str:
    """``where``: optional filter on the scored (doc) rows — used by the
    live-tombstone oracle (stats stay full-corpus, candidates shrink)."""
    if reference_quirk:
        denom = f"(tok.tf + {k1}*(1 - {b} + d.dl / s.avgdl))"  # missing-b quirk
    else:
        denom = f"(tok.tf + {k1}*(1 - {b} + {b} * d.dl / s.avgdl))"
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup)}),
scores AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id,
         sum( q.w * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * ({k1} + 1)) / {denom} ) AS score
  FROM q
  JOIN tok ON tok.lang = q.lang AND tok.term = q.term
  JOIN df ON df.lang = q.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = tok.doc_id
  JOIN stats s ON s.lang = q.lang
  {where}
  GROUP BY q.query_id, tok.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


_COSINE_CORE = f"""
{_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, lang, term, w) AS (VALUES {{qvalues}}),
idfc AS (
  SELECT df.lang, df.term, ln((s.n_docs - df.df + 0.5) / (df.df + 0.5)) AS idf
  FROM df JOIN stats s ON s.lang = df.lang
),
norms AS (
  SELECT tok.doc_id AS doc_id, sqrt(sum(pow(tok.tf * i.idf, 2))) AS nrm
  FROM tok JOIN idfc i ON i.lang = tok.lang AND i.term = tok.term
  GROUP BY tok.doc_id
),
qidf AS (
  SELECT DISTINCT q.query_id, q.lang, q.term, i.idf
  FROM q JOIN idfc i ON i.lang = q.lang AND i.term = q.term
),
qnorm AS (SELECT query_id, sqrt(sum(idf*idf)) AS qn FROM qidf GROUP BY query_id),
dots AS (
  SELECT qidf.query_id AS query_id, tok.doc_id AS doc_id,
         sum(qidf.idf * (tok.tf * qidf.idf)) AS dot
  FROM qidf JOIN tok ON tok.lang = qidf.lang AND tok.term = qidf.term
  GROUP BY qidf.query_id, tok.doc_id
),
cos AS (
  SELECT d.query_id, d.doc_id, d.dot / (n.nrm * qq.qn) AS score
  FROM dots d
  JOIN norms n ON n.doc_id = d.doc_id
  JOIN qnorm qq ON qq.query_id = d.query_id
  WHERE n.nrm > 0 AND qq.qn > 0
)
"""


LM_MU = 2000.0


def _lm_sql(mu: float) -> str:
    """Dirichlet query-likelihood oracle. qc = the query's
    multiplicity-weighted terms restricted to the collection vocabulary
    (inner join on cf — engine skips out-of-vocabulary terms the same
    way); each surviving term contributes
    w·ln((tf + μ·cf/|C|)/(dl + μ)) for EVERY doc of the language, with
    tf = 0 where the doc lacks the term."""
    return f"""
WITH {_TOK_CTE}, {_DL_CTE},
cf AS (SELECT lang, term, sum(tf) AS cf FROM tok GROUP BY lang, term),
coll AS (SELECT lang, sum(dl) AS cl FROM dl GROUP BY lang),
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup=False)}),
qc AS (
  SELECT q.query_id, q.lang, q.term, q.w, cf.cf, c.cl
  FROM q
  JOIN cf ON cf.lang = q.lang AND cf.term = q.term
  JOIN coll c ON c.lang = q.lang
),
scores AS (
  SELECT qc.query_id AS query_id, d.doc_id AS doc_id,
         sum( qc.w * ln( (coalesce(tok.tf, 0) + {mu}*(qc.cf/qc.cl))
                         / (d.dl + {mu}) ) ) AS score
  FROM qc
  JOIN dl d ON d.lang = qc.lang
  LEFT JOIN tok ON tok.doc_id = d.doc_id AND tok.lang = qc.lang
                AND tok.term = qc.term
  GROUP BY qc.query_id, d.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


def _cosine_sql() -> str:
    return f"""
WITH {_COSINE_CORE.format(qvalues=_query_values(dedup=True))},
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM cos WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


def _cosine_rerank_sql(k1: float = 1.5, b: float = 0.75, candidates: int = 200) -> str:
    # qd = duplicate-counting query terms (C3 iterates WITH duplicates)
    return f"""
WITH {_COSINE_CORE.format(qvalues=_query_values(dedup=True))},
cand AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {_fx('score')} DESC, doc_id ASC) AS crank
    FROM cos WHERE score > 0
  ) WHERE crank <= {candidates}
),
qd(query_id, lang, term, w) AS (VALUES {_query_values(dedup=False)}),
dlq AS (
  SELECT c.query_id AS query_id, c.doc_id AS doc_id,
         coalesce(sum(qd.w * tok.tf), 0) AS dlq
  FROM cand c
  JOIN qd ON qd.query_id = c.query_id
  LEFT JOIN tok ON tok.doc_id = c.doc_id AND tok.lang = qd.lang AND tok.term = qd.term
  GROUP BY c.query_id, c.doc_id
),
rescore AS (
  SELECT qd.query_id AS query_id, c.doc_id AS doc_id,
         sum( qd.w * i.idf * (tok.tf * ({k1} + 1))
              / (tok.tf + {k1} * (1 - {b} + {b} * (dq.dlq / s.avgdl))) ) AS score
  FROM cand c
  JOIN qd ON qd.query_id = c.query_id
  JOIN tok ON tok.doc_id = c.doc_id AND tok.lang = qd.lang AND tok.term = qd.term
  JOIN idfc i ON i.lang = qd.lang AND i.term = qd.term
  JOIN dlq dq ON dq.query_id = c.query_id AND dq.doc_id = c.doc_id
  JOIN stats s ON s.lang = qd.lang
  GROUP BY qd.query_id, c.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM rescore WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


# ------------------------------------------------------------ Ray helpers


def _sized_blocks(path: str, rows_per_block: int, lo: int = 8,
                  hi: int = 256) -> int:
    """Data-sized read fan-out (metadata-only row count). Most testdata
    pipelines funnel the read into one or more cogroup sorts whose cost
    is per-BLOCK — a 5k-row table arriving in 64 near-empty blocks pays
    ~3-6 s of pure scheduling per sort at toy scale, while at data scale
    rows/rows_per_block dominates and the clamp is a no-op."""
    import pyarrow.parquet as _pq

    if os.path.isdir(path):  # a write_parquet output directory
        n = sum(
            _pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        n = _pq.read_metadata(path).num_rows
    return max(lo, min(hi, n // rows_per_block + 1))


def _docs(sf_dir: str) -> ray.data.Dataset:
    path = f"{sf_dir}/documents.parquet"
    return read_parquet_clean(
        path, columns=["doc_id", "text", "lang"],
        override_num_blocks=_sized_blocks(path, 5_000),
    )


def _emb(sf_dir: str, columns=None) -> ray.data.Dataset:
    """Shared embeddings reader, data-sized blocks (vectors are wide rows,
    and the ANN kernels want a matmul-worthy batch per task)."""
    path = f"{sf_dir}/embeddings.parquet"
    return read_parquet_clean(
        path, columns=columns,
        override_num_blocks=_sized_blocks(path, 2_000, lo=4),
    )


def _tbl(sf_dir: str, name: str, columns=None,
         rows_per_block: int = 50_000) -> ray.data.Dataset:
    """Shared relational-table reader with a data-sized block count."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return read_parquet_clean(
        path, columns=columns,
        override_num_blocks=_sized_blocks(path, rows_per_block),
    )


def _events(sf_dir: str, columns=None) -> ray.data.Dataset:
    """Shared events reader with a data-sized block count (narrow integer
    rows pack denser than documents, hence the larger rows_per_block)."""
    path = f"{sf_dir}/events.parquet"
    return read_parquet_clean(
        path, columns=columns,
        override_num_blocks=_sized_blocks(path, 20_000),
    )


def _dl_batch(batch: pa.Table) -> pa.Table:
    text = pc.cast(batch["text"], pa.string())
    low = pc.utf8_lower(text)
    spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
    trimmed = pc.utf8_trim_whitespace(spaced)
    n_chars = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False)
    no_sp = pc.utf8_length(pc.replace_substring(trimmed, " ", "")).to_numpy(
        zero_copy_only=False
    )
    dl = np.where(n_chars == 0, 0, (n_chars - no_sp) + 1).astype(np.int64)
    return pa.table(
        {"doc_id": batch["doc_id"], "lang": batch["lang"], "dl": pa.array(dl)}
    )


def _tokens_ds(sf_dir: str) -> ray.data.Dataset:
    """(url, lang, tokens, dl) over the adapted testdata documents."""
    return read_testdata_documents(sf_dir).map_batches(
        TokenizeStage,
        fn_constructor_kwargs={"config": TokenizerConfig(mode="simple")},
        batch_format="pyarrow",
        concurrency=default_pool(),
    )


def _postings_ds(sf_dir: str) -> ray.data.Dataset:
    return _tokens_ds(sf_dir).map_batches(emit_postings, batch_format="pyarrow")


def _testdata_factory(sf_dir: str):
    """Columns-aware input factory for build_index: pass 0 asks for
    (url, lang) only; the testdata source column for url is doc_id."""

    def factory(columns=None):
        src = (
            ("doc_id", "text", "lang")
            if columns is None
            else tuple("doc_id" if c == "url" else c for c in columns)
        )
        return read_testdata_documents(sf_dir, columns=src)

    return factory


def _index_for(sf_dir: str) -> str:
    """Build (or resume from) the cached index for this sf_dir."""
    from .build_index import build_index

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = f"/tmp/drr_cache/{key}/index"
    cfg = IndexConfig(
        tokenizer=TokenizerConfig(mode="simple"),
        num_hash_parts=16,
        hot_term_threshold=200,
        salt_shift=8,
        block_size=128,
    )
    build_index(
        f"{sf_dir}/documents.parquet",
        index_dir,
        cfg=cfg,
        with_cosine_norms=True,
        input_ds_factory=_testdata_factory(sf_dir),
    )
    return index_dir


def _mod_factory(sf_dir: str, lo: int, hi: int, mod: int = 5):
    """Testdata factory restricted to docs with doc_id % mod in [lo, hi)
    — the deterministic 'crawl delta' slices of the incremental query."""
    base = _testdata_factory(sf_dir)

    def _keep(t: pa.Table) -> pa.Table:
        ids = np.array([int(u) for u in t["url"].to_pylist()], dtype=np.int64)
        m = ids % mod
        return t.filter(pa.array((m >= lo) & (m < hi)))

    def factory(columns=None):
        ds = base(columns)
        return ds.map_batches(_keep, batch_format="pyarrow")

    return factory


def _incr_index_for(sf_dir: str) -> str:
    """Cached GENERATIONAL index: base build over 60% of the corpus plus
    two appended generations of 20% each (pipelines/incremental.py).
    Idempotent: re-running resumes the base by fingerprint and skips
    already-committed generations."""
    from .build_index import build_index
    from .incremental import append_index, read_generations

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = f"/tmp/drr_cache/{key}/incr_index"
    cfg = IndexConfig(
        tokenizer=TokenizerConfig(mode="simple"),
        num_hash_parts=16,
        hot_term_threshold=200,
        salt_shift=8,
        block_size=128,
    )
    build_index(
        f"{sf_dir}/documents.parquet#incr-base",
        index_dir,
        cfg=cfg,
        with_cosine_norms=False,
        input_ds_factory=_mod_factory(sf_dir, 0, 3),
    )
    deltas = [(3, 4), (4, 5)]
    for i, (lo, hi) in enumerate(deltas):
        if len(read_generations(index_dir)["generations"]) > i:
            continue  # this delta is already committed
        append_index(
            f"{sf_dir}/documents.parquet#incr-delta{i + 1}",
            index_dir,
            cfg=cfg,
            input_ds_factory=_mod_factory(sf_dir, lo, hi),
        )
    return index_dir


def _query_ds() -> ray.data.Dataset:
    return ray.data.from_items(
        [{"query_id": q, "query": t, "lang": l} for q, t, l in QUERYSET]
    )


def _results_to_docids(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["doc_id"] = pdf["url"].astype(np.int64)
    return pdf[["query_id", "rank", "doc_id", "score_x"]].sort_values(
        ["query_id", "rank"]
    )


# ------------------------------------------------------------ Ray queries


def q_doc_stats(sf_dir: str):
    ds = _docs(sf_dir).map_batches(_dl_batch, batch_format="pyarrow")
    agg = ds.groupby("lang").aggregate(
        ray.data.aggregate.Count(alias_name="n_docs"),
        ray.data.aggregate.Mean("dl", alias_name="avgdl"),
    )
    pdf = agg.to_pandas()
    pdf["avgdl_x"] = np.floor(pdf["avgdl"] * 10000.0 + 0.5).astype(np.int64)
    return pdf[["lang", "n_docs", "avgdl_x"]]


def q_doc_lengths(sf_dir: str):
    return (
        _docs(sf_dir)
        .map_batches(_dl_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "dl"])
    )


def q_term_df(sf_dir: str):
    partials = _postings_ds(sf_dir).map_batches(
        partial_term_counts, batch_format="pyarrow"
    )
    out = partials.groupby(["lang", "term"]).sum("n")
    return out.map_batches(
        lambda t: t.rename_columns(["lang", "term", "df"]), batch_format="pyarrow"
    )


def q_term_idf(sf_dir: str):
    # per-lang N needs only the lang column — a thin 1-column scan, not
    # the tokenizing q_doc_stats pass (round-1 review: avoid re-running
    # the corpus scan for a count)
    stats = {
        r["lang"]: r["count()"]
        for r in read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["lang"]
        )
        .groupby("lang")
        .count()
        .take_all()
    }
    stats_ref = ray.put(stats)

    class AddIdf:
        def __init__(self):
            self.stats = ray.get(stats_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            langs = t["lang"].to_pylist()
            dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
            N = np.array([self.stats[l] for l in langs], dtype=np.float64)
            idf = np.log(1.0 + (N - dfs + 0.5) / (dfs + 0.5))
            idf_x = np.floor(idf * 10000.0 + 0.5).astype(np.int64)
            return t.append_column("idf_x", pa.array(idf_x, pa.int64()))

    return q_term_df(sf_dir).map_batches(
        AddIdf, batch_format="pyarrow", concurrency=default_pool()
    )


def q_postings_sample(sf_dir: str):
    terms = pa.array(list(SAMPLE_TERMS))

    def pick(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["term"], value_set=terms))
        return pa.table(
            {
                "doc_id": url_to_docid(t["url"]),
                "term": t["term"],
                "tf": t["tf"],
            }
        )

    return _postings_ds(sf_dir).map_batches(pick, batch_format="pyarrow")


def q_vocab(sf_dir: str):
    out = q_term_df(sf_dir).groupby("lang").count()
    return out.map_batches(
        lambda t: t.rename_columns(["lang", "n_terms"]), batch_format="pyarrow"
    )


def q_top_terms(sf_dir: str):
    def partial_tf(t: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {
                "lang": np.asarray(t["lang"].to_pandas(), dtype=object),
                "term": np.asarray(t["term"].to_pandas(), dtype=object),
                "tf": t["tf"].to_numpy(zero_copy_only=False),
            }
        )
        g = pdf.groupby(["lang", "term"], sort=False)["tf"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    sums = (
        _postings_ds(sf_dir)
        .map_batches(partial_tf, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .sum("tf")
    )

    def top10(g: pd.DataFrame) -> pd.DataFrame:
        g = g.rename(columns={"sum(tf)": "total_tf"})
        g = g.sort_values(["total_tf", "term"], ascending=[False, True]).head(10)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["lang", "term", "total_tf", "rank"]]

    return sums.groupby("lang").map_groups(top10, batch_format="pandas")


def q_bm25_reference(sf_dir: str):
    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    res = bm25_search(
        _query_ds(), index_dir,
        cfg=BM25Config(k1=1.5, b=0.75, idf="lucene", compat="reference"),
        round_dp=4,
    )
    return _results_to_docids(res.to_pandas())


def q_bm25_standard(sf_dir: str):
    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    res = bm25_search(
        _query_ds(), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        round_dp=4,
    )
    return _results_to_docids(res.to_pandas())


def q_bm25_term_sharded(sf_dir: str):
    """BM25 over a (lang, term-range) bucket group (pipelines/
    term_sharded.py): the cached index's postings split into 3
    volume-balanced term buckets, queries routed only to owning buckets,
    partial scores hash-merged per query — hash-checked against the SAME
    full-corpus oracle as bm25_standard (term sharding is rank-identical
    at the serving contract)."""
    from .term_sharded import bm25_search_term_sharded, build_term_buckets

    index_dir = _index_for(sf_dir)
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    bdir = f"/tmp/drr_cache/{key}/term_buckets"
    if not os.path.exists(os.path.join(bdir, "term_buckets.json")):
        build_term_buckets(index_dir, bdir, num_buckets=3)
    res = bm25_search_term_sharded(
        _query_ds(), index_dir, bdir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        tokenizer=TokenizerConfig(mode="simple"), round_dp=4,
    )
    return _results_to_docids(res.to_pandas())


def q_bm25_term_sharded_pruned(sf_dir: str):
    """BM25 over the SAME term-bucket group through the colocated
    distributed-MaxScore path (pipelines/term_sharded.py
    TermGroupScorerStage: rare buckets anchor candidates, hot buckets
    gather with clamped bounds, exact fallback) — one actor-pool map,
    zero shuffles — hash-checked against the same full-corpus oracle as
    bm25_standard."""
    from .term_sharded import (
        bm25_search_term_sharded_pruned, build_term_buckets,
    )

    index_dir = _index_for(sf_dir)
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    bdir = f"/tmp/drr_cache/{key}/term_buckets"
    if not os.path.exists(os.path.join(bdir, "term_buckets.json")):
        build_term_buckets(index_dir, bdir, num_buckets=3)
    res = bm25_search_term_sharded_pruned(
        _query_ds(), index_dir, bdir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        tokenizer=TokenizerConfig(mode="simple"), round_dp=4,
    )
    return _results_to_docids(res.to_pandas())


def q_bm25_wand(sf_dir: str):
    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    res = bm25_search(
        _query_ds(), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        round_dp=4, method="wand",
    )
    return _results_to_docids(res.to_pandas())


def q_index_integrity(sf_dir: str):
    """Index-integrity audit — the engine side reads ONLY its own
    committed index artifacts (the per-lang manifests' n_docs / avgdl /
    n_terms / n_postings); the oracle recomputes the same numbers from
    the raw documents table. Parity proves the build's exact-integer
    stat path (A3 sidecar sums, df assembly, posting counts) END TO END
    against ground truth — the check a production build runs before
    swapping an index generation live.

    Scale plan: manifests are |langs| json files; nothing else is read."""
    from ..state.manifest import read_manifest

    index_dir = _index_for(sf_dir)
    rows = []
    for lang in sorted(os.listdir(os.path.join(index_dir, "manifests"))):
        m = read_manifest(os.path.join(index_dir, "manifests", lang))
        if m is None:
            continue
        rows.append({
            "lang": lang,
            "n_docs": int(m["n_docs"]),
            "avgdl_x": int(np.floor(m["avgdl"] * 10000.0 + 0.5)),
            "n_terms": int(m["n_terms"]),
            "n_postings": int(m["n_postings"]),
        })
    return pd.DataFrame(
        rows, columns=["lang", "n_docs", "avgdl_x", "n_terms", "n_postings"]
    )


def q_percolate(sf_dir: str):
    """Reverse search (percolation — the alerting/saved-search primitive:
    Elasticsearch percolator semantics): for every incoming document,
    which stored queries match it CONJUNCTIVELY (every distinct query
    term present in the doc, same language).

    Scale plan: the stored-query table is alert-sized — broadcast once
    (here a closure constant); per batch, ONE factorize + unique pass
    builds the distinct (doc, term) pairs and each query resolves to a
    bincount over them. Zero shuffles; the output is match-sized."""
    # stored queries: the shared QUERYSET, conjunctive on distinct terms
    stored = []
    for qid, text, lang in QUERYSET:
        terms = sorted(set(tokenize_simple(text)))
        if terms:
            stored.append((qid, lang, terms))

    def match(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = np.asarray(t["lang"].to_pandas(), dtype=object)
        vals, parent = _flat_tok(t)
        out_doc, out_qid = [], []
        if len(vals):
            codes, uniques = pd.factorize(pd.Series(vals))
            # distinct (doc-row, token-code) pairs, one pass for ALL queries
            pair = parent * np.int64(len(uniques)) + codes
            upair = np.unique(pair)
            urow = upair // len(uniques)
            ucode = upair % len(uniques)
            uindex = pd.Index(uniques)
            for qid, lang, terms in stored:
                tcodes = uindex.get_indexer(terms)
                tcodes = tcodes[tcodes >= 0]
                if len(tcodes) != len(terms):
                    continue  # a term absent from this batch → no match here
                hit = np.isin(ucode, tcodes)
                cnt = np.bincount(urow[hit], minlength=len(ids))
                ok = np.nonzero((cnt == len(terms)) & (langs == lang))[0]
                out_doc.extend(ids[ok].tolist())
                out_qid.extend([qid] * len(ok))
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "query_id": pa.array(out_qid, pa.string()),
        })

    return _docs(sf_dir).map_batches(match, batch_format="pyarrow")


def _percolate_sql() -> str:
    return f"""
WITH tok AS (SELECT DISTINCT doc_id, lang, term
             FROM (SELECT doc_id, lang, unnest({TOKLIST.format(col='text')}) AS term
                   FROM documents)),
q(query_id, lang, term, w) AS (VALUES {_query_values(True)}),
qn AS (SELECT query_id, lang, count(*) AS n FROM q GROUP BY query_id, lang),
m AS (SELECT t.doc_id AS doc_id, q.query_id AS query_id, count(*) AS c
      FROM tok t JOIN q ON q.lang = t.lang AND q.term = t.term
      GROUP BY t.doc_id, q.query_id)
SELECT m.doc_id, m.query_id
FROM m JOIN qn ON qn.query_id = m.query_id
WHERE m.c = qn.n
"""


# autocomplete probe prefixes: fixed, short, and hitting both dense and
# sparse regions of the testdata vocabulary
SUGGEST_PREFIXES = ("ta", "jo", "s", "que")
SUGGEST_K = 5


def q_suggest(sf_dir: str):
    """Query autocomplete — top-SUGGEST_K completions per (lang, prefix)
    ranked by document frequency (df desc, term asc): the suggest box a
    search deployment serves straight from the index's df artifact.

    The engine reads ONLY the index's vocabulary table (df parquet —
    Heaps-law-sized, the artifact built for exactly this class of
    lookup); the oracle recomputes df from the raw corpus. Scale plan:
    the df read is column-pruned and prefix-filtered per batch; ranking
    moves ≤ |prefixes|·K rows per (lang, prefix) group out of each
    block, merged at the |langs|·|prefixes|·K-row driver frame."""
    index_dir = _index_for(sf_dir)
    dfv = read_parquet_clean(
        os.path.join(index_dir, "df"), columns=["lang", "term", "df"]
    )

    def local_top(t: pa.Table) -> pa.Table:
        pdf = pd.DataFrame({
            "lang": np.asarray(t["lang"].to_pandas(), dtype=object),
            "term": np.asarray(t["term"].to_pandas(), dtype=object),
            "df": t["df"].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        outs = []
        for pref in SUGGEST_PREFIXES:
            m = pdf[pdf["term"].str.startswith(pref)]
            if m.empty:
                continue
            m = m.sort_values(["df", "term"], ascending=[False, True])
            m = (
                m.groupby("lang", sort=False)
                .head(SUGGEST_K)
                .assign(prefix=pref)
            )
            outs.append(m)
        if not outs:
            return pa.table({
                "lang": pa.array([], pa.string()),
                "prefix": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
            })
        out = pd.concat(outs)[["lang", "prefix", "term", "df"]]
        return from_pandas_clean(out)

    cand = pd.DataFrame(
        dfv.map_batches(local_top, batch_format="pyarrow").take_all()
    )
    if cand.empty:
        return pd.DataFrame({
            "lang": pd.Series(dtype=object),
            "prefix": pd.Series(dtype=object),
            "term": pd.Series(dtype=object),
            "df": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
        })
    cand = cand.sort_values(
        ["lang", "prefix", "df", "term"], ascending=[True, True, False, True],
        kind="mergesort",
    )
    cand["rank"] = cand.groupby(["lang", "prefix"], sort=False).cumcount() + 1
    cand = cand[cand["rank"] <= SUGGEST_K]
    cand["df"] = cand["df"].astype(np.int64)
    return cand[["lang", "prefix", "term", "df", "rank"]].reset_index(drop=True)


def _suggest_sql() -> str:
    prefs = ", ".join(f"('{p}')" for p in SUGGEST_PREFIXES)
    return f"""
WITH tok AS (SELECT DISTINCT doc_id, lang, term
             FROM (SELECT doc_id, lang, unnest({TOKLIST.format(col='text')}) AS term
                   FROM documents)),
dfx AS (SELECT lang, term, count(*) AS df FROM tok GROUP BY lang, term),
p(prefix) AS (VALUES {prefs}),
cand AS (
  SELECT dfx.lang AS lang, p.prefix AS prefix, dfx.term AS term,
         CAST(dfx.df AS BIGINT) AS df,
         row_number() OVER (PARTITION BY dfx.lang, p.prefix
                            ORDER BY dfx.df DESC, dfx.term ASC) AS rank
  FROM dfx JOIN p ON starts_with(dfx.term, p.prefix)
)
SELECT lang, prefix, term, df, CAST(rank AS BIGINT) AS rank
FROM cand WHERE rank <= {SUGGEST_K}
"""


# did-you-mean inputs: deterministic misspellings of corpus vocabulary
# (last entry matches nothing — the empty-result contract is part of
# the oracle)
DYM_SET = [
    ("d1", "spak", "en"),
    ("d2", "joinn", "en"),
    ("d3", "windoow", "en"),
    ("d4", "mergge", "de"),
    ("d5", "vectro", "es"),
    ("d6", "qqqqqq", "en"),
]
DYM_MAX_DIST = 2
DYM_K = 3


def q_did_you_mean(sf_dir: str):
    """Spelling suggestion ("did you mean") served from the index's
    vocabulary artifact: per misspelled input, same-language vocabulary
    terms within Levenshtein distance ≤ DYM_MAX_DIST, ranked
    (distance asc, df desc, term asc), top DYM_K.

    Scale plan: the vocabulary never leaves the cluster — each df-table
    batch computes its candidates with ONE vectorized DuckDB
    ``levenshtein`` pass (the oracle's own function, so distances are
    identical by construction) behind a lossless length prefilter;
    only candidate rows (≤ |inputs| × near-matches per batch) reach
    the driver merge. The oracle recomputes df from the raw corpus
    (the same parity contract as ``suggest``)."""
    from ..functions.hashing import _duck

    index_dir = _index_for(sf_dir)
    dfv = read_parquet_clean(
        os.path.join(index_dir, "df"), columns=["lang", "term", "df"]
    )
    vals = ", ".join(
        f"('{qid}', '{term}', '{lang}')" for qid, term, lang in DYM_SET
    )

    def cand(t: pa.Table) -> pa.Table:
        con = _duck()
        con.register("_dym_v", t)
        out = con.execute(f"""
            SELECT q.qid AS qid, q.qterm AS qterm, v.term AS term,
                   CAST(v.df AS BIGINT) AS df,
                   CAST(levenshtein(v.term, q.qterm) AS BIGINT) AS dist
            FROM _dym_v v
            JOIN (VALUES {vals}) q(qid, qterm, qlang) ON v.lang = q.qlang
            WHERE abs(length(v.term) - length(q.qterm)) <= {DYM_MAX_DIST}
              AND levenshtein(v.term, q.qterm) <= {DYM_MAX_DIST}
        """).arrow()
        con.unregister("_dym_v")
        return out

    allc = pd.DataFrame(
        dfv.map_batches(cand, batch_format="pyarrow").take_all()
    )
    if allc.empty:
        return pd.DataFrame({
            "qid": pd.Series(dtype=object),
            "qterm": pd.Series(dtype=object),
            "term": pd.Series(dtype=object),
            "df": pd.Series(dtype="int64"),
            "dist": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
        })
    allc = allc.sort_values(
        ["qid", "dist", "df", "term"],
        ascending=[True, True, False, True], kind="mergesort",
    )
    allc["rank"] = (allc.groupby("qid", sort=False).cumcount() + 1).astype(
        np.int64)
    allc = allc[allc["rank"] <= DYM_K]
    allc["df"] = allc["df"].astype(np.int64)
    allc["dist"] = allc["dist"].astype(np.int64)
    return allc[["qid", "qterm", "term", "df", "dist", "rank"]].reset_index(
        drop=True)


def _did_you_mean_sql() -> str:
    vals = ", ".join(
        f"('{qid}', '{term}', '{lang}')" for qid, term, lang in DYM_SET
    )
    return f"""
WITH tok AS (SELECT DISTINCT doc_id, lang, term
             FROM (SELECT doc_id, lang, unnest({TOKLIST.format(col='text')}) AS term
                   FROM documents)),
dfx AS (SELECT lang, term, count(*) AS df FROM tok GROUP BY lang, term),
q(qid, qterm, qlang) AS (VALUES {vals}),
cand AS (
  SELECT q.qid AS qid, q.qterm AS qterm, dfx.term AS term,
         CAST(dfx.df AS BIGINT) AS df,
         CAST(levenshtein(dfx.term, q.qterm) AS BIGINT) AS dist
  FROM dfx JOIN q ON dfx.lang = q.qlang
  WHERE levenshtein(dfx.term, q.qterm) <= {DYM_MAX_DIST}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY dist, df DESC, term) AS rank
  FROM cand
)
SELECT qid, qterm, term, df, dist, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {DYM_K}
"""


PRF_TOP_DOCS = 10
PRF_K = 5


def q_prf_expansion(sf_dir: str):
    """Pseudo-relevance-feedback query expansion (RM1-style counts):
    each query's top-{PRF_TOP_DOCS} BM25 docs vote expansion terms by
    summed tf; the query's own terms are excluded; top-{PRF_K} per query
    on (tf_sum desc, term asc) — the classic two-pass retrieval
    expansion, exact-integer so the oracle replays it.

    Scale plan: pass 1 is the standard BM25 serving path; pass 2
    broadcasts only the tiny (doc → queries) feedback map, filters the
    corpus scan to the ≤ |Q|·k feedback docs per batch, and ships
    (query, term, tf) votes — feedback-sized, never corpus-sized."""
    from collections import Counter

    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    res = bm25_search(
        _query_ds(), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        round_dp=4,
    ).to_pandas()
    res = res[res["rank"] <= PRF_TOP_DOCS]
    doc2q: dict = {}
    for qid, url in zip(res["query_id"], res["url"]):
        doc2q.setdefault(int(url), []).append(qid)
    qterms = {qid: set(tokenize_simple(text)) for qid, text, _l in QUERYSET}

    def emit(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.asarray([int(d) in doc2q for d in ids], dtype=bool)
        o_q, o_t, o_f = [], [], []
        if keep.any():
            sub = t.filter(pa.array(keep))
            for did, text in zip(sub["doc_id"].to_pylist(),
                                 sub["text"].to_pylist()):
                counts = Counter(tokenize_simple(text or ""))
                for qid in doc2q[int(did)]:
                    for term, tf in counts.items():
                        o_q.append(qid)
                        o_t.append(term)
                        o_f.append(tf)
        return pa.table({
            "query_id": pa.array(o_q, pa.string()),
            "term": pa.array(o_t, pa.string()),
            "tf": pa.array(o_f, pa.int64()),
        })

    rows = pd.DataFrame(
        _docs(sf_dir).map_batches(emit, batch_format="pyarrow").take_all()
    )
    empty = pd.DataFrame({
        "query_id": pd.Series(dtype=object),
        "term": pd.Series(dtype=object),
        "tf_sum": pd.Series(dtype="int64"),
        "rank": pd.Series(dtype="int64"),
    })
    if rows.empty:
        return empty
    votes = rows.groupby(["query_id", "term"], sort=True)["tf"].sum() \
        .reset_index().rename(columns={"tf": "tf_sum"})
    votes = votes[[t not in qterms[q]
                   for q, t in zip(votes["query_id"], votes["term"])]]
    if votes.empty:
        return empty
    votes = votes.sort_values(["query_id", "tf_sum", "term"],
                              ascending=[True, False, True],
                              kind="mergesort")
    votes["rank"] = (votes.groupby("query_id", sort=False).cumcount() + 1
                     ).astype(np.int64)
    votes = votes[votes["rank"] <= PRF_K]
    votes["tf_sum"] = votes["tf_sum"].astype(np.int64)
    return votes[["query_id", "term", "tf_sum", "rank"]].reset_index(
        drop=True)


INDEX_DIFF_K = 10


def q_index_diff(sf_dir: str):
    """Generational index diff — the pre-merge audit an incremental
    deployment runs before compaction: per language, the base-vs-delta
    vocabulary movement (terms only in the base, terms the generations
    introduced, terms present in both) plus the top-{INDEX_DIFF_K}
    NEW terms by delta df (df desc, term asc). Served entirely from the
    per-generation df ARTIFACTS (vocabulary-sized — the index's own
    metadata, no corpus re-scan); the oracle recomputes both sides from
    the raw corpus via the generational doc_id%5 slice definition."""
    from .incremental import read_generations

    index_dir = _incr_index_for(sf_dir)
    gens = read_generations(index_dir)["generations"]
    base_ds = read_parquet_clean(os.path.join(index_dir, "df"),
                                 columns=["lang", "term", "df"])
    gen_parts = [
        read_parquet_clean(
            os.path.join(index_dir, "generations", g, "df"),
            columns=["lang", "term", "df"])
        for g in gens
    ]

    def tag(side):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "lang": t["lang"], "term": t["term"],
                "df_base": pc.multiply(
                    pc.cast(t["df"], pa.int64()), 1 - side),
                "df_delta": pc.multiply(
                    pc.cast(t["df"], pa.int64()), side),
            })

        return f

    merged = base_ds.map_batches(tag(0), batch_format="pyarrow")
    for g in gen_parts:
        merged = merged.union(g.map_batches(tag(1), batch_format="pyarrow"))
    agg = merged.groupby(["lang", "term"]).aggregate(
        ray.data.aggregate.Sum("df_base", alias_name="df_base"),
        ray.data.aggregate.Sum("df_delta", alias_name="df_delta"),
    ).to_pandas()
    agg["df_base"] = agg["df_base"].astype(np.int64)
    agg["df_delta"] = agg["df_delta"].astype(np.int64)

    status = np.where(
        (agg["df_base"] > 0) & (agg["df_delta"] > 0), "both",
        np.where(agg["df_base"] > 0, "base_only", "new"),
    )
    agg = agg.assign(status=status)
    summary = (
        agg.groupby(["lang", "status"], sort=True).size()
        .reset_index(name="n_terms")
    )
    new_terms = agg[agg["status"] == "new"].sort_values(
        ["lang", "df_delta", "term"], ascending=[True, False, True],
        kind="mergesort",
    )
    new_terms = new_terms.assign(
        rank=(new_terms.groupby("lang", sort=False).cumcount() + 1
              ).astype(np.int64))
    new_terms = new_terms[new_terms["rank"] <= INDEX_DIFF_K]
    # one result frame: summary rows (term='', rank=0) + top-new rows
    out = pd.concat([
        pd.DataFrame({
            "lang": summary["lang"], "status": summary["status"],
            "term": "", "n": summary["n_terms"].astype(np.int64),
            "rank": np.int64(0),
        }),
        pd.DataFrame({
            "lang": new_terms["lang"], "status": "new_top",
            "term": new_terms["term"],
            "n": new_terms["df_delta"].astype(np.int64),
            "rank": new_terms["rank"],
        }),
    ], ignore_index=True)
    return out.sort_values(["lang", "status", "rank", "term"]).reset_index(
        drop=True)


def _index_diff_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, lang, {TOKLIST.format(col='text')} AS l FROM documents
),
tok AS (
  SELECT DISTINCT doc_id, lang, unnest(l) AS term FROM toks
),
sides AS (
  SELECT lang, term,
         count(CASE WHEN doc_id % 5 < 3 THEN 1 END) AS df_base,
         count(CASE WHEN doc_id % 5 >= 3 THEN 1 END) AS df_delta
  FROM tok GROUP BY lang, term
),
tagged AS (
  SELECT lang, term, df_base, df_delta,
         CASE WHEN df_base > 0 AND df_delta > 0 THEN 'both'
              WHEN df_base > 0 THEN 'base_only' ELSE 'new' END AS status
  FROM sides
),
summary AS (
  SELECT lang, status, '' AS term, CAST(count(*) AS BIGINT) AS n,
         CAST(0 AS BIGINT) AS rank
  FROM tagged GROUP BY lang, status
),
new_top AS (
  SELECT lang, 'new_top' AS status, term, CAST(df_delta AS BIGINT) AS n,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY df_delta DESC, term ASC)
              AS BIGINT) AS rank
  FROM tagged WHERE status = 'new'
)
SELECT lang, status, term, n, rank FROM summary
UNION ALL
SELECT lang, status, term, n, rank FROM new_top WHERE rank <= {INDEX_DIFF_K}
"""


PMI_ANCHORS = ("spark", "join", "window", "dup")
PMI_MIN_SUPPORT = 2
PMI_K = 5


def q_related_terms(sf_dir: str):
    """"Related searches" via co-occurrence PMI: for each anchor term,
    the top-{PMI_K} en-language terms by fixed-point
    ln(N·df_ab / (df_a·df_b)) with support df_ab ≥ {PMI_MIN_SUPPORT},
    anchor excluded, ties on term asc.

    Scale plan: the co-occurrence count is a broadcast-anchored scan —
    batches keep only docs holding an anchor, emit per-batch partial
    (anchor, term) doc counts (exact: a doc lives in one batch), one
    (anchor, term)-keyed fold; df_a/df_b come from the index's df
    artifact pruned to the co-occurring vocabulary (bounded by Heaps
    law over the anchor doc sets, NOT the corpus vocabulary)."""
    from ..state.manifest import read_manifest

    index_dir = _index_for(sf_dir)
    anchors = set(PMI_ANCHORS)

    def emit(t: pa.Table) -> pa.Table:
        o_a, o_t, o_c = [], [], []
        langs = t["lang"].to_pylist()
        texts = t["text"].to_pylist()
        from collections import Counter

        cnt: "Counter" = Counter()
        for lang, text in zip(langs, texts):
            if lang != "en":
                continue
            terms = set(tokenize_simple(text or ""))
            hit = terms & anchors
            for a in hit:
                for term in terms:
                    cnt[(a, term)] += 1
        for (a, term), c in cnt.items():
            o_a.append(a)
            o_t.append(term)
            o_c.append(c)
        return pa.table({
            "anchor": pa.array(o_a, pa.string()),
            "term": pa.array(o_t, pa.string()),
            "n": pa.array(o_c, pa.int64()),
        })

    cooc = (
        _docs(sf_dir).map_batches(emit, batch_format="pyarrow")
        .groupby(["anchor", "term"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="df_ab"))
        .to_pandas()
    )
    empty = pd.DataFrame({
        "anchor": pd.Series(dtype=object),
        "term": pd.Series(dtype=object),
        "df_ab": pd.Series(dtype="int64"),
        "pmi_x": pd.Series(dtype="int64"),
        "rank": pd.Series(dtype="int64"),
    })
    if cooc.empty:
        return empty
    cooc = cooc[(cooc["df_ab"] >= PMI_MIN_SUPPORT)
                & (cooc["term"] != cooc["anchor"])]
    if cooc.empty:
        return empty

    want = set(cooc["term"]) | anchors
    dfv = read_parquet_clean(
        os.path.join(index_dir, "df", "lang=en"), columns=["term", "df"]
    )

    def flt(t: pa.Table) -> pa.Table:
        keep = np.asarray([x in want for x in t["term"].to_pylist()],
                          dtype=bool)
        return t.filter(pa.array(keep))

    dfd = pd.DataFrame(
        dfv.map_batches(flt, batch_format="pyarrow").take_all()
    )
    dfmap = {t: int(d) for t, d in zip(dfd["term"], dfd["df"])}
    n = int(read_manifest(
        os.path.join(index_dir, "manifests", "en"))["n_docs"])

    df_a = cooc["anchor"].map(dfmap).to_numpy(dtype=np.float64)
    df_b = cooc["term"].map(dfmap).to_numpy(dtype=np.float64)
    df_ab = cooc["df_ab"].to_numpy(dtype=np.float64)
    pmi = np.log((n * df_ab) / (df_a * df_b))
    cooc = cooc.assign(
        pmi_x=np.floor(pmi * 10000.0 + 0.5).astype(np.int64))
    cooc = cooc.sort_values(["anchor", "pmi_x", "term"],
                            ascending=[True, False, True], kind="mergesort")
    cooc["rank"] = (cooc.groupby("anchor", sort=False).cumcount() + 1
                    ).astype(np.int64)
    cooc = cooc[cooc["rank"] <= PMI_K]
    cooc["df_ab"] = cooc["df_ab"].astype(np.int64)
    return cooc[["anchor", "term", "df_ab", "pmi_x", "rank"]].reset_index(
        drop=True)


def _related_terms_sql() -> str:
    vals = ", ".join(f"('{a}')" for a in PMI_ANCHORS)
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
a(anchor) AS (VALUES {vals}),
adocs AS (
  SELECT a.anchor AS anchor, tok.doc_id AS doc_id
  FROM a JOIN tok ON tok.lang = 'en' AND tok.term = a.anchor
),
cooc AS (
  SELECT ad.anchor AS anchor, tok.term AS term,
         CAST(count(*) AS BIGINT) AS df_ab
  FROM adocs ad JOIN tok ON tok.doc_id = ad.doc_id AND tok.lang = 'en'
  GROUP BY ad.anchor, tok.term
  HAVING count(*) >= {PMI_MIN_SUPPORT}
),
scored AS (
  SELECT c.anchor, c.term, c.df_ab,
         {_fx('ln( (s.n_docs * c.df_ab) / (dfa.df * dfb.df) )')} AS pmi_x
  FROM cooc c
  JOIN df dfa ON dfa.lang = 'en' AND dfa.term = c.anchor
  JOIN df dfb ON dfb.lang = 'en' AND dfb.term = c.term
  JOIN stats s ON s.lang = 'en'
  WHERE c.term <> c.anchor
),
ranked AS (
  SELECT anchor, term, df_ab, pmi_x,
         row_number() OVER (PARTITION BY anchor
                            ORDER BY pmi_x DESC, term ASC) AS rank
  FROM scored
)
SELECT anchor, term, df_ab, pmi_x, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {PMI_K}
"""


MLT_SEEDS = (3, 17, 42)
MLT_TERMS = 5
MLT_K = 10


def q_more_like_this(sf_dir: str):
    """More-like-this (Lucene MLT semantics): for each seed doc, pick
    its top-{MLT_TERMS} terms by fixed-point tf·idf (idf = lucene law
    over the seed's language), run them as a BM25 query (distinct
    terms, w=1), exclude the seed, top-{MLT_K}.

    Scale plan: the seed pass is a broadcast-filtered corpus scan
    (seed-sized); idf comes from the index's df artifact pruned to the
    seed vocabulary; serving is the standard BM25 path. Nothing
    corpus-sized moves besides the one serving scan."""
    from collections import Counter

    from .query import bm25_search
    from ..state.manifest import read_manifest

    index_dir = _index_for(sf_dir)
    seeds = set(int(s) for s in MLT_SEEDS)

    def emit(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.asarray([int(d) in seeds for d in ids], dtype=bool)
        o_s, o_l, o_t, o_f = [], [], [], []
        if keep.any():
            sub = t.filter(pa.array(keep))
            for did, text, lang in zip(sub["doc_id"].to_pylist(),
                                       sub["text"].to_pylist(),
                                       sub["lang"].to_pylist()):
                for term, tf in Counter(tokenize_simple(text or "")).items():
                    o_s.append(int(did))
                    o_l.append(lang)
                    o_t.append(term)
                    o_f.append(tf)
        return pa.table({
            "seed": pa.array(o_s, pa.int64()),
            "lang": pa.array(o_l, pa.string()),
            "term": pa.array(o_t, pa.string()),
            "tf": pa.array(o_f, pa.int64()),
        })

    srows = pd.DataFrame(
        _docs(sf_dir).map_batches(emit, batch_format="pyarrow").take_all()
    )
    empty = pd.DataFrame({
        "seed": pd.Series(dtype="int64"),
        "rank": pd.Series(dtype="int64"),
        "doc_id": pd.Series(dtype="int64"),
        "score_x": pd.Series(dtype="int64"),
    })
    if srows.empty:
        return empty

    # idf inputs: df from the index artifact, pruned to the seed vocab
    want = set(zip(srows["lang"], srows["term"]))
    langs = sorted({l for l, _t in want})
    dfv = read_parquet_clean(
        os.path.join(index_dir, "df"), columns=["lang", "term", "df"]
    )

    def flt(t: pa.Table) -> pa.Table:
        keep = np.asarray(
            [(l, x) in want for l, x in zip(t["lang"].to_pylist(),
                                            t["term"].to_pylist())],
            dtype=bool,
        )
        return t.filter(pa.array(keep))

    dfd = pd.DataFrame(
        dfv.map_batches(flt, batch_format="pyarrow").take_all()
    )
    dfmap = {(l, t): int(d) for l, t, d in zip(
        dfd.get("lang", []), dfd.get("term", []), dfd.get("df", []))}
    nmap = {
        l: int(read_manifest(os.path.join(index_dir, "manifests", l))
               ["n_docs"]) for l in langs
    }

    # per-seed top-MLT_TERMS by (fixed-point tf*idf desc, term asc)
    wx = []
    for _i, r in srows.iterrows():
        d = dfmap.get((r["lang"], r["term"]))
        if d is None:
            wx.append(-1)
            continue
        n = nmap[r["lang"]]
        w = float(r["tf"]) * np.log(1 + (n - d + 0.5) / (d + 0.5))
        wx.append(int(np.floor(w * 10000.0 + 0.5)))
    srows = srows.assign(w_x=np.asarray(wx, np.int64))
    srows = srows[srows["w_x"] >= 0].sort_values(
        ["seed", "w_x", "term"], ascending=[True, False, True],
        kind="mergesort",
    )
    srows["rn"] = srows.groupby("seed", sort=False).cumcount() + 1
    picked = srows[srows["rn"] <= MLT_TERMS]

    qrows = []
    for seed, g in picked.groupby("seed", sort=True):
        qrows.append({
            "query_id": f"mlt{int(seed)}",
            "query": " ".join(g["term"]),
            "lang": g["lang"].iloc[0],
        })
    if not qrows:
        return empty
    res = bm25_search(
        ray.data.from_items(qrows), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard",
                       k=MLT_K + 1),
        round_dp=4,
    ).to_pandas()
    res["seed"] = res["query_id"].str.removeprefix("mlt").astype(np.int64)
    res["doc_id"] = res["url"].astype(np.int64)
    res = res[res["doc_id"] != res["seed"]]
    res = res.sort_values(["seed", "rank"], kind="mergesort")
    res["rank"] = (res.groupby("seed", sort=False).cumcount() + 1).astype(
        np.int64)
    res = res[res["rank"] <= MLT_K]
    return res[["seed", "rank", "doc_id", "score_x"]].reset_index(drop=True)


def _more_like_this_sql() -> str:
    seeds = ", ".join(f"({int(s)})" for s in MLT_SEEDS)
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
seeds(seed) AS (VALUES {seeds}),
sterm AS (
  SELECT s.seed AS seed, tok.lang AS lang, tok.term AS term, tok.tf AS tf
  FROM seeds s JOIN tok ON tok.doc_id = s.seed
),
sw AS (
  SELECT st.seed, st.lang, st.term,
         {_fx('st.tf * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))')}
           AS w_x
  FROM sterm st
  JOIN df ON df.lang = st.lang AND df.term = st.term
  JOIN stats s ON s.lang = st.lang
),
qsel AS (
  SELECT seed, lang, term FROM (
    SELECT *, row_number() OVER (PARTITION BY seed
                                 ORDER BY w_x DESC, term ASC) AS rn
    FROM sw
  ) WHERE rn <= {MLT_TERMS}
),
scores AS (
  SELECT q.seed AS seed, tok.doc_id AS doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * (1.2 + 1))
              / (tok.tf + 1.2*(1 - 0.75 + 0.75 * d.dl / s.avgdl)) ) AS score
  FROM qsel q
  JOIN tok ON tok.lang = q.lang AND tok.term = q.term
  JOIN df ON df.lang = q.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = tok.doc_id
  JOIN stats s ON s.lang = q.lang
  WHERE tok.doc_id <> q.seed
  GROUP BY q.seed, tok.doc_id
),
ranked AS (
  SELECT seed, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY seed
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT CAST(seed AS BIGINT) AS seed, CAST(rank AS BIGINT) AS rank,
       doc_id, score_x
FROM ranked WHERE rank <= {MLT_K}
"""


SNIPPET_TOP_DOCS = 3
SNIPPET_W = 8


def q_snippets(sf_dir: str):
    """Result snippets (hit highlighting): for each query's top-3 BM25
    docs, the best {SNIPPET_W}-token window — the one holding the most
    DISTINCT query terms, leftmost on ties, anchored at a query-term
    occurrence — with its 1-based start, distinct-term count, and the
    window text itself (reproduced in SQL via list_slice +
    array_to_string, so the string is oracle-checked byte-for-byte).

    Scale plan: identical to prf_expansion's pass 2 — the corpus scan
    filters to the ≤ |Q|·k result docs per batch (broadcast tiny map);
    window scoring is per-doc local and result-sized."""
    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    res = bm25_search(
        _query_ds(), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        round_dp=4,
    ).to_pandas()
    res = res[res["rank"] <= SNIPPET_TOP_DOCS]
    doc2q: dict = {}
    for qid, url in zip(res["query_id"], res["url"]):
        doc2q.setdefault(int(url), []).append(qid)
    qterms = {qid: set(tokenize_simple(text)) for qid, text, _l in QUERYSET}

    def emit(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.asarray([int(d) in doc2q for d in ids], dtype=bool)
        o_q, o_d, o_s, o_n, o_t = [], [], [], [], []
        if keep.any():
            sub = t.filter(pa.array(keep))
            for did, text in zip(sub["doc_id"].to_pylist(),
                                 sub["text"].to_pylist()):
                toks = tokenize_simple(text or "")
                for qid in doc2q[int(did)]:
                    qs = qterms[qid]
                    best = None  # (-n_terms, start0)
                    for a, tok in enumerate(toks):
                        if tok not in qs:
                            continue
                        win = toks[a:a + SNIPPET_W]
                        n = len(qs.intersection(win))
                        key = (-n, a)
                        if best is None or key < best:
                            best = key
                    if best is not None:
                        a = best[1]
                        o_q.append(qid)
                        o_d.append(int(did))
                        o_s.append(a + 1)  # 1-based, like SQL ordinality
                        o_n.append(-best[0])
                        o_t.append(" ".join(toks[a:a + SNIPPET_W]))
        return pa.table({
            "query_id": pa.array(o_q, pa.string()),
            "doc_id": pa.array(o_d, pa.int64()),
            "win_start": pa.array(o_s, pa.int64()),
            "n_terms": pa.array(o_n, pa.int64()),
            "snippet": pa.array(o_t, pa.string()),
        })

    rows = pd.DataFrame(
        _docs(sf_dir).map_batches(emit, batch_format="pyarrow").take_all()
    )
    if rows.empty:
        return pd.DataFrame({
            "query_id": pd.Series(dtype=object),
            "doc_id": pd.Series(dtype="int64"),
            "win_start": pd.Series(dtype="int64"),
            "n_terms": pd.Series(dtype="int64"),
            "snippet": pd.Series(dtype=object),
        })
    return rows.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


def _snippets_sql() -> str:
    """Shares _bm25_sql's scoring CTEs; the window search is replayed
    over 1-based token ordinals (generate_subscripts) and the snippet
    string via list_slice + array_to_string."""
    base = _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)
    tail = "SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10"
    assert tail in base, "bm25 oracle tail changed; update _snippets_sql"
    return base.replace(tail, f"""
, picked AS (
  SELECT query_id, doc_id FROM ranked WHERE rank <= {SNIPPET_TOP_DOCS}
),
dtoks AS (
  SELECT d.doc_id AS doc_id, {TOKLIST.format(col='d.text')} AS l
  FROM documents d JOIN (SELECT DISTINCT doc_id FROM picked) pd
    ON pd.doc_id = d.doc_id
),
posx AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS ord
  FROM dtoks
),
qd AS (SELECT DISTINCT query_id, term FROM q),
anchors AS (
  SELECT p.query_id AS query_id, p.doc_id AS doc_id, x.ord AS s
  FROM picked p
  JOIN posx x ON x.doc_id = p.doc_id
  JOIN qd ON qd.query_id = p.query_id AND qd.term = x.term
),
wins AS (
  SELECT a.query_id, a.doc_id, a.s,
         count(DISTINCT x2.term) AS n_terms
  FROM anchors a
  JOIN posx x2 ON x2.doc_id = a.doc_id
   AND x2.ord >= a.s AND x2.ord < a.s + {SNIPPET_W}
  JOIN qd q2 ON q2.query_id = a.query_id AND q2.term = x2.term
  GROUP BY a.query_id, a.doc_id, a.s
),
best AS (
  SELECT query_id, doc_id, s, n_terms,
         row_number() OVER (PARTITION BY query_id, doc_id
                            ORDER BY n_terms DESC, s ASC) AS rn
  FROM wins
)
SELECT b.query_id AS query_id, b.doc_id AS doc_id,
       CAST(b.s AS BIGINT) AS win_start,
       CAST(b.n_terms AS BIGINT) AS n_terms,
       array_to_string(list_slice(d.l, b.s, b.s + {SNIPPET_W - 1}), ' ')
         AS snippet
FROM best b JOIN dtoks d ON d.doc_id = b.doc_id WHERE rn = 1
""")


def _prf_expansion_sql() -> str:
    """Shares _bm25_sql's scoring CTEs (same no-drift contract as the
    collapsed oracle), replacing the final cut with the vote/rank tail."""
    base = _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)
    tail = "SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10"
    assert tail in base, "bm25 oracle tail changed; update _prf_expansion_sql"
    return base.replace(tail, f"""
, picked AS (
  SELECT query_id, doc_id FROM ranked WHERE rank <= {PRF_TOP_DOCS}
),
votes AS (
  SELECT p.query_id AS query_id, tok.term AS term,
         CAST(sum(tok.tf) AS BIGINT) AS tf_sum
  FROM picked p JOIN tok ON tok.doc_id = p.doc_id
  WHERE NOT EXISTS (SELECT 1 FROM q
                    WHERE q.query_id = p.query_id AND q.term = tok.term)
  GROUP BY p.query_id, tok.term
),
rankedx AS (
  SELECT query_id, term, tf_sum,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY tf_sum DESC, term ASC) AS rank
  FROM votes
)
SELECT query_id, term, tf_sum, CAST(rank AS BIGINT) AS rank
FROM rankedx WHERE rank <= {PRF_K}
""")


_INDEX_INTEGRITY_SQL = f"""
WITH dl AS (SELECT doc_id, lang, len({TOKLIST.format(col='text')}) AS dl
            FROM documents),
tok AS (SELECT DISTINCT doc_id, lang, term
        FROM (SELECT doc_id, lang, unnest({TOKLIST.format(col='text')}) AS term
              FROM documents)),
dfx AS (SELECT lang, term, count(*) AS df FROM tok GROUP BY lang, term),
v AS (SELECT lang, count(*) AS n_terms, sum(df) AS n_postings
      FROM dfx GROUP BY lang),
s AS (SELECT lang, count(*) AS n_docs, sum(dl) AS total_dl
      FROM dl GROUP BY lang)
SELECT s.lang AS lang, CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(floor((CAST(s.total_dl AS DOUBLE) / s.n_docs) * 10000.0 + 0.5)
            AS BIGINT) AS avgdl_x,
       CAST(coalesce(v.n_terms, 0) AS BIGINT) AS n_terms,
       CAST(coalesce(v.n_postings, 0) AS BIGINT) AS n_postings
FROM s LEFT JOIN v ON v.lang = s.lang
"""


def _bm25_collapsed_sql() -> str:
    """Oracle for q_bm25_collapsed: the bm25_standard scoring CTEs with
    the final top-10 cut replaced by the collapse window — top-CAND
    candidates, ≤ PER_SOURCE rows per (query, source) in rank order,
    re-ranked, cut to 10. Shares _bm25_sql so scoring semantics can
    never drift between the plain and collapsed oracles."""
    base = _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)
    tail = "SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10"
    assert tail in base, "bm25 oracle tail changed; update _bm25_collapsed_sql"
    return base.replace(tail, f"""
, cand AS (
  SELECT query_id, rank, doc_id, score_x
  FROM ranked WHERE rank <= {SITE_COLLAPSE_CAND}
),
src AS (
  SELECT c.query_id, c.rank, c.doc_id, c.score_x, d.source AS source,
         row_number() OVER (PARTITION BY c.query_id, d.source
                            ORDER BY c.rank) AS src_rank
  FROM cand c JOIN documents d ON d.doc_id = c.doc_id
),
kept AS (
  SELECT query_id, doc_id, score_x, source,
         row_number() OVER (PARTITION BY query_id ORDER BY rank) AS new_rank
  FROM src WHERE src_rank <= {SITE_COLLAPSE_PER_SOURCE}
)
SELECT query_id, new_rank AS rank, doc_id, score_x, source
FROM kept WHERE new_rank <= 10
""")


# site-collapse (SERP diversity) knobs: collapse applies within the
# top-CAND retrieved window — the same definition real engines use (the
# collapse never re-scores the full corpus) — and is mirrored verbatim
# in the SQL oracle, so both sides share one candidate-pool semantics
SITE_COLLAPSE_CAND = 50
# strict one-hit-per-domain at test scale (20 uniform sources × 8
# queries make a 2-per-source cap a no-op — a vacuous oracle; 1 forces
# the collapse to actually reorder every page)
SITE_COLLAPSE_PER_SOURCE = 1


def q_bm25_collapsed(sf_dir: str):
    """Site-collapsed BM25 (host collapsing — the SERP diversity rule):
    retrieve the top-SITE_COLLAPSE_CAND candidates per query, keep at
    most SITE_COLLAPSE_PER_SOURCE results per source in rank order,
    re-rank, cut to 10 — one domain can't monopolize a result page.

    Scale plan: the (doc → source) attachment joins a RESULT-sized
    frame (|queries|·cand rows); at web scale source is a docmap column
    the scorer emits with each hit (zero extra exchange), here a
    column-pruned read of the docs table serves the same lookup."""
    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    res = bm25_search(
        _query_ds(), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard",
                       k=SITE_COLLAPSE_CAND),
        round_dp=4,
    )
    pdf = res.to_pandas()
    pdf["doc_id"] = pdf["url"].astype(np.int64)
    import pyarrow.parquet as _pq

    src = _pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    pdf = pdf.merge(src, on="doc_id", how="inner")
    pdf = pdf.sort_values(["query_id", "rank"], kind="mergesort")
    pdf["src_rank"] = (
        pdf.groupby(["query_id", "source"], sort=False).cumcount() + 1
    )
    kept = pdf[pdf["src_rank"] <= SITE_COLLAPSE_PER_SOURCE].copy()
    kept["rank"] = kept.groupby("query_id", sort=False).cumcount() + 1
    kept = kept[kept["rank"] <= 10]
    return kept[["query_id", "rank", "doc_id", "score_x", "source"]].reset_index(
        drop=True
    )


def q_bm25_incremental(sf_dir: str):
    """Incremental-index end-to-end proof: 60% of the corpus built as the
    base, two 20% crawl deltas APPENDED as generations, served through
    the generational sharded scorer — and hash-checked against the SAME
    full-corpus SQL oracle as bm25_standard (append ≡ full rebuild)."""
    from .incremental import bm25_search_incremental

    index_dir = _incr_index_for(sf_dir)
    res = bm25_search_incremental(
        _query_ds(), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        tokenizer=TokenizerConfig(mode="simple"),
        round_dp=4,
    )
    return _results_to_docids(res.to_pandas())


# sources tombstoned by the deletion queries (~15% of the corpus, spread
# across every lang — documents.source is uniform over 20 values)
DELETED_SOURCES = ("src3", "src11", "src17")
_DELETED_PRED = "source IN ('src3', 'src11', 'src17')"


def _deletion_urls(sf_dir: str) -> list:
    import pyarrow.parquet as _pq

    t = _pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    m = pc.is_in(t["source"], value_set=pa.array(list(DELETED_SOURCES)))
    return docid_to_url(t.filter(m)["doc_id"]).to_pylist()


def _tombstones_for(sf_dir: str) -> str:
    """Tombstone ~15% of the cached index (by source), idempotently —
    the tombstone log lives OUTSIDE the index dir so the other bm25_*
    queries keep serving the full corpus."""
    from .deletes import delete_docs, read_tombstone_dirs

    index_dir = _index_for(sf_dir)
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tomb = f"/tmp/drr_cache/{key}/tombstones_src"
    if not read_tombstone_dirs(tomb):
        delete_docs(index_dir, _deletion_urls(sf_dir), tombstones_dir=tomb)
    return tomb


def q_bm25_deleted(sf_dir: str):
    """Live tombstone serving (pipelines/deletes.py) with Lucene
    semantics: deleted docs vanish from results while global stats stay
    those of the full build — the oracle keeps full-corpus stats CTEs
    and only filters the scored docs."""
    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    tomb = _tombstones_for(sf_dir)
    res = bm25_search(
        _query_ds(), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        round_dp=4, tombstones_dir=tomb,
    )
    return _results_to_docids(res.to_pandas())


def q_bm25_compacted(sf_dir: str):
    """Delete-aware compaction: tombstones physically applied (postings
    filtered + re-encoded, df recounted, N/avgdl recomputed), then served
    as a plain index — must equal a FRESH BUILD over the surviving corpus
    (the oracle recomputes every stat over the filtered documents)."""
    from .incremental import compact_index
    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    tomb = _tombstones_for(sf_dir)
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = f"/tmp/drr_cache/{key}/compacted_del_index"
    if not os.path.isdir(os.path.join(out, "manifests")):
        # BM25-only artifact: skip the cosine-norms rebuild (the cosine
        # path has its own compacted entry, cosine_compacted)
        compact_index(index_dir, out, tombstones_dir=tomb,
                      with_cosine_norms=False)
    res = bm25_search(
        _query_ds(), out,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        round_dp=4,
    )
    return _results_to_docids(res.to_pandas())


def q_cosine_compacted(sf_dir: str):
    """Cosine/C5 over an appended-then-compacted index with the per-doc
    TF-IDF norms REBUILT at compaction (incremental._rebuild_norms): the
    daily-crawl cosine workflow — base + two crawl deltas, physically
    merged, norms recomputed from the compacted postings + merged df —
    hash-checked against the SAME full-corpus oracle as `cosine`
    (compact + norms rebuild ≡ full rebuild with norms)."""
    from .incremental import compact_index
    from .query import cosine_search

    index_dir = _incr_index_for(sf_dir)
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = f"/tmp/drr_cache/{key}/compacted_norms_index"
    if not os.path.isdir(os.path.join(out, "manifests")):
        compact_index(index_dir, out, tombstones_dir=False,
                      with_cosine_norms=True)
    res = cosine_search(_query_ds(), out, k=10, round_dp=4)
    return _results_to_docids(res.to_pandas())


def q_lm_dirichlet(sf_dir: str):
    """Dirichlet-smoothed query-likelihood retrieval (μ=2000) served from
    the same compressed index as bm25_* — the reference's A10 dead-code
    semantic, live. Every doc scores (smoothed background for missing
    terms), so scores are negative and the SQL oracle cross-joins the
    in-vocabulary query terms with every doc of the language."""
    from .query import lm_search

    index_dir = _index_for(sf_dir)
    res = lm_search(_query_ds(), index_dir, mu=LM_MU, k=10, round_dp=4)
    return _results_to_docids(res.to_pandas())


def q_cosine(sf_dir: str):
    from .query import cosine_search

    index_dir = _index_for(sf_dir)
    res = cosine_search(_query_ds(), index_dir, k=10, rerank=False, round_dp=4)
    return _results_to_docids(res.to_pandas())


def q_cosine_rerank(sf_dir: str):
    from .query import cosine_search

    index_dir = _index_for(sf_dir)
    res = cosine_search(
        _query_ds(), index_dir, k=10, rerank=True, candidates=200, round_dp=4
    )
    return _results_to_docids(res.to_pandas())


def q_submission(sf_dir: str):
    """S6 submission sink shape: (query_id, docids = ','-joined top-10)."""
    pdf = q_bm25_reference(sf_dir).sort_values(["query_id", "rank"])
    rows = [
        {"query_id": qid, "docids": ",".join(str(d) for d in g["doc_id"])}
        for qid, g in pdf.groupby("query_id", sort=True)
    ]
    return pd.DataFrame(rows, columns=["query_id", "docids"])


def q_dedup_exact(sf_dir: str):
    ds = _docs(sf_dir).map_batches(
        lambda t: add_text_hash(t, normalize=False), batch_format="pyarrow"
    )
    out = ds.groupby("text_hash").aggregate(
        ray.data.aggregate.Min("doc_id", alias_name="keep_doc_id"),
        ray.data.aggregate.Count(alias_name="dup_count"),
    )
    return out


def q_dedup_normalized(sf_dir: str):
    ds = _docs(sf_dir).map_batches(
        lambda t: add_text_hash(t, normalize=True), batch_format="pyarrow"
    )
    return ds.groupby("text_hash").aggregate(
        ray.data.aggregate.Min("doc_id", alias_name="keep_doc_id"),
        ray.data.aggregate.Count(alias_name="dup_count"),
    )


def q_dedup_apply(sf_dir: str):
    """Materialize the exact-dedup SURVIVORS (the apply step a training
    pipeline runs after D1): keep the min-doc_id row of every content
    hash. One hash-partitioned shuffle; the keep decision happens inside
    the partition — no join, no driver set."""
    ds = _docs(sf_dir).map_batches(
        lambda t: add_text_hash(t, normalize=False), batch_format="pyarrow"
    )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["kpart"]) if "kpart" in g.columns else g
        out = g.sort_values(["text_hash", "doc_id"]).drop_duplicates(
            "text_hash", keep="first"
        )
        return out[["doc_id", "lang"]].astype({"doc_id": "int64"})

    return (
        ds.map_batches(
            add_kpart, fn_kwargs={"num_parts": 64, "cols": ("text_hash",)},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(keep_first, batch_format="pandas")
    )


def q_quality_filter(sf_dir: str):
    """Quality-gated corpus selection (the filter step after quality
    scoring): keep docs with quality >= 0.5 and >= 5 tokens."""

    def flt(t: pa.Table) -> pa.Table:
        s = doc_stats_batch(t)
        keep = pc.and_(
            pc.greater_equal(s["quality_x"], 5000),
            pc.greater_equal(s["n_tokens"], 5),
        )
        return s.filter(keep).select(["doc_id", "n_tokens", "quality_x"])

    return _docs(sf_dir).map_batches(flt, batch_format="pyarrow")


def q_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")


# see util.arrow_blocks docstring: pandas map_groups outputs MUST be
# re-arrowed before feeding a Ray groupby/aggregate (2.49 slow path)
_arrow_blocks = arrow_blocks


def _parted(ds, cols, num_parts=64):
    """Hash-partitioned groupby: one Ray group = one whole partition,
    processed vectorized (per-raw-key map_groups costs ~ms/key)."""
    return ds.map_batches(
        add_kpart, fn_kwargs={"num_parts": num_parts, "cols": cols},
        batch_format="pyarrow",
    ).groupby("kpart")


def q_minhash_pairs(sf_dir: str, cfg: DedupConfig = DEFAULT_DEDUP):
    """MinHash+LSH near-dup pairs, Jaccard-verified (threshold 0.5).

    Fully distributed: band groupby → candidate pairs → the pair list and
    the per-doc shingle-hash table are COGROUPED by doc_id (semi-join; no
    driver materialization, no broadcast), then per-(a, b) groups compute
    the exact intersection — the same plan as the _MINHASH_SQL oracle
    (which is generated from DEFAULT_DEDUP; a non-default ``cfg`` needs
    its own oracle)."""
    docs = _docs(sf_dir)
    bands = docs.map_batches(
        emit_band_rows, fn_kwargs={"cfg": cfg}, batch_format="pyarrow"
    )
    pairs = _parted(bands, ("band_idx", "band_key")).map_groups(
        lambda g: band_pairs_partition(g, max_bucket=cfg.max_bucket),
        batch_format="pandas",
    )
    # no dedicated dedup shuffle: duplicate (a, b) emissions from several
    # bands survive until the verify partition, which dedups by
    # (a, b, doc_id) — one fewer all-to-all in the plan
    sides = pairs.map_batches(pair_side_rows, batch_format="pyarrow")
    sh_tbl = docs.map_batches(
        emit_doc_shingles, fn_kwargs={"n": cfg.shingle_n}, batch_format="pyarrow"
    )
    attached = _parted(sh_tbl.union(sides), ("doc_id",)).map_groups(
        attach_partition, batch_format="pandas"
    )
    return _parted(attached, ("a", "b")).map_groups(
        lambda g: jaccard_partition(g, MINHASH_JACCARD_THRESHOLD),
        batch_format="pandas",
    )


def q_ngram_jaccard(sf_dir: str, cfg: DedupConfig = DEFAULT_DEDUP):
    """EXACT n-gram Jaccard similarity self-join (threshold 0.5): every
    pair with Jaccard >= t over distinct word-3-gram sets — the
    no-recall-loss complement of q_minhash_pairs, via AllPairs/PPJoin
    prefix filtering (see stages/dedup.py for the lemma and plan).

    All-distributed: shingle-df by hash colocation (exact, no broadcast),
    per-doc df-ascending prefix, shingle-bucket candidate pairs, then the
    same doc_id-cogrouped semi-join verify as minhash. The shingle table
    feeds two consumers (candidate generation + verify) so it is
    materialized once instead of re-tokenizing the corpus."""
    docs = _docs(sf_dir)
    sh_tbl = docs.map_batches(
        emit_doc_shingles, fn_kwargs={"n": cfg.shingle_n}, batch_format="pyarrow"
    ).materialize()
    exploded = sh_tbl.map_batches(explode_shingle_rows, batch_format="pyarrow")
    with_df = _parted(exploded, ("sh",)).map_groups(
        shingle_df_partition, batch_format="pandas"
    )
    prefix = _parted(with_df, ("doc_id",)).map_groups(
        lambda g: prefix_rows_partition(g, NGRAM_JACCARD_THRESHOLD),
        batch_format="pandas",
    )
    pairs = _parted(prefix, ("sh",)).map_groups(
        lambda g: shingle_bucket_pairs_partition(g, max_bucket=cfg.max_bucket),
        batch_format="pandas",
    )
    sides = pairs.map_batches(pair_side_rows, batch_format="pyarrow")
    attached = _parted(sh_tbl.union(sides), ("doc_id",)).map_groups(
        attach_partition, batch_format="pandas"
    )
    return _parted(attached, ("a", "b")).map_groups(
        lambda g: jaccard_partition(g, NGRAM_JACCARD_THRESHOLD),
        batch_format="pandas",
    )


CONTAINMENT_THRESHOLD = 0.8


def q_containment(sf_dir: str, cfg: DedupConfig = DEFAULT_DEDUP):
    """EXACT n-gram containment self-join (threshold 0.8, DIRECTIONAL):
    every ordered pair (a, b) with |S_a ∩ S_b| / |S_a| ≥ t over distinct
    word-3-gram sets — the asymmetric complement of q_ngram_jaccard that
    catches excerpt/quote relationships (a short doc inside a long one)
    whose symmetric Jaccard is far below any threshold.

    Same all-distributed plan as the Jaccard join and the same lossless
    prefix (overlap ≥ ⌈t·|S_a|⌉ forces a hit in a's first
    |S_a| − ⌈t·|S_a|⌉ + 1 df-ascending shingles) — but candidates pair
    the contained side's PREFIX rows against the container side's FULL
    postings, so buckets are df-sized on one side (capped + audited)."""
    docs = _docs(sf_dir)
    sh_tbl = docs.map_batches(
        emit_doc_shingles, fn_kwargs={"n": cfg.shingle_n}, batch_format="pyarrow"
    ).materialize()
    exploded = sh_tbl.map_batches(explode_shingle_rows, batch_format="pyarrow")
    with_df = _parted(exploded, ("sh",)).map_groups(
        shingle_df_partition, batch_format="pandas"
    )
    prefix = _parted(with_df, ("doc_id",)).map_groups(
        lambda g: prefix_rows_partition(g, CONTAINMENT_THRESHOLD),
        batch_format="pandas",
    )

    def _mark(role):
        def mark(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "sh": pc.cast(t["sh"], pa.int64()),
                    "doc_id": pc.cast(t["doc_id"], pa.int64()),
                    "role": pa.array([role] * t.num_rows, pa.int64()),
                }
            )

        return mark

    marked = prefix.map_batches(_mark(1), batch_format="pyarrow").union(
        exploded.map_batches(_mark(0), batch_format="pyarrow")
    )
    pairs = _parted(marked, ("sh",)).map_groups(
        lambda g: containment_bucket_pairs_partition(g, max_bucket=cfg.max_bucket),
        batch_format="pandas",
    )
    sides = pairs.map_batches(pair_side_rows, batch_format="pyarrow")
    attached = _parted(sh_tbl.union(sides), ("doc_id",)).map_groups(
        attach_partition, batch_format="pandas"
    )
    return _parted(attached, ("a", "b")).map_groups(
        lambda g: containment_partition(g, CONTAINMENT_THRESHOLD),
        batch_format="pandas",
    )


def q_neardup_components(sf_dir: str):
    """Near-dup CLUSTERS (the step after pair finding that a dedup
    pipeline actually applies): connected components of the verified
    minhash pair graph via distributed min-label propagation; rep = min
    doc_id of the component."""
    from ..stages.dedup import label_prop_components

    return label_prop_components(q_minhash_pairs(sf_dir))


def _canon_attach_partition(t: pa.Table) -> pa.Table:
    """doc_id-hash cogroup of component rows (kind 0: doc_id, rep) ∪ doc
    rows (kind 1: doc_id, n_chars) → (doc_id, rep, n_chars) with
    rep = -1 for docs in NO near-dup cluster (they become their own
    canonical downstream). The doc side is unique per id, so the join is
    one sorted searchsorted."""
    if "kpart" in t.column_names:
        t = t.drop_columns(["kpart"])
    kind = t["kind"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    rep = t["rep"].to_numpy(zero_copy_only=False).astype(np.int64)
    nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_doc = kind == 1
    d_ids, d_nch = ids[is_doc], nch[is_doc]
    c_ids, c_rep = ids[~is_doc], rep[~is_doc]
    order = np.argsort(d_ids, kind="stable")
    ds_, dn_ = d_ids[order], d_nch[order]
    out_ids, out_rep, out_nch = [ds_], [np.full(ds_.size, -1, np.int64)], [dn_]
    if c_ids.size:
        pos = np.minimum(np.searchsorted(ds_, c_ids), max(ds_.size - 1, 0))
        ok = ds_[pos] == c_ids if ds_.size else np.zeros(c_ids.size, bool)
        out_ids.append(c_ids[ok])
        out_rep.append(c_rep[ok])
        out_nch.append(dn_[pos[ok]])
        # a doc that IS a cluster member must not also emit a self row
        member = np.zeros(ds_.size, dtype=bool)
        member[pos[ok]] = True
        out_ids[0], out_rep[0], out_nch[0] = (
            ds_[~member], np.full(int((~member).sum()), -1, np.int64),
            dn_[~member],
        )
    return pa.table({
        "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
        "rep": pa.array(np.concatenate(out_rep), pa.int64()),
        "n_chars": pa.array(np.concatenate(out_nch), pa.int64()),
    })


def _canon_pick_partition(t: pa.Table) -> pa.Table:
    """ckey-hash partition (ckey = rep for members, own doc_id for
    singletons — reps are always member ids, so the key spaces never
    collide): per cluster pick the canonical on (n_chars desc, doc_id
    asc) and emit every member's (doc_id, canonical_id, kept)."""
    if "kpart" in t.column_names:
        t = t.drop_columns(["kpart"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    rep = t["rep"].to_numpy(zero_copy_only=False).astype(np.int64)
    nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_self = rep < 0
    out_ids = [ids[is_self]]
    out_canon = [ids[is_self]]
    m_ids, m_rep, m_nch = ids[~is_self], rep[~is_self], nch[~is_self]
    if m_ids.size:
        order = np.lexsort((m_ids, -m_nch, m_rep))
        m_ids, m_rep = m_ids[order], m_rep[order]
        first = np.ones(m_ids.size, dtype=bool)
        first[1:] = m_rep[1:] != m_rep[:-1]
        starts = np.flatnonzero(first)
        canon = m_ids[starts][np.cumsum(first) - 1]
        out_ids.append(m_ids)
        out_canon.append(canon)
    all_ids = np.concatenate(out_ids)
    all_canon = np.concatenate(out_canon)
    return pa.table({
        "doc_id": pa.array(all_ids, pa.int64()),
        "canonical_id": pa.array(all_canon, pa.int64()),
        "kept": pa.array((all_ids == all_canon).astype(np.int64), pa.int64()),
    })


def q_dedup_canonical(sf_dir: str):
    """Canonical-copy selection over the near-dup clusters — what a
    production crawl dedup actually SHIPS: every document maps to its
    cluster's best member (n_chars desc, doc_id asc tie-break; 'keep
    the longest capture'), docs in no cluster keep themselves. Composes
    the minhash pair graph + min-label components with two data-minimal
    exchanges: a doc_id cogroup attaches n_chars to the (cluster-sized)
    component rows and marks non-members, then ONE cluster-key exchange
    picks winners and emits every member's verdict (singletons key by
    their own id — reps are member ids, so the spaces never collide and
    no hot key forms).

    Scale plan: exchange 1 moves (doc_id, n_chars) pairs + the pair-graph
    membership rows; exchange 2 moves 3-int rows keyed by cluster (or
    self) — nothing corpus-wide is broadcast, collected, or sorted."""
    comp = q_neardup_components(sf_dir)
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "n_chars"])

    def comp_rows(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "rep": pc.cast(t["rep"], pa.int64()),
            "n_chars": pa.array(z, pa.int64()),
            "kind": pa.array(z, pa.int64()),
        })

    def doc_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "rep": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
            "kind": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        })

    unioned = comp.map_batches(comp_rows, batch_format="pyarrow").union(
        docs.map_batches(doc_rows, batch_format="pyarrow")
    )
    attached = (
        unioned.map_batches(
            add_kpart, fn_kwargs={"num_parts": 32, "cols": ("doc_id",)},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(_canon_attach_partition, batch_format="pyarrow")
    )

    def add_ckey(t: pa.Table) -> pa.Table:
        rep = t["rep"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ck = np.where(rep < 0, ids, rep)
        return t.append_column("ckey", pa.array(ck, pa.int64()))

    return (
        attached.map_batches(add_ckey, batch_format="pyarrow")
        .map_batches(
            add_kpart, fn_kwargs={"num_parts": 32, "cols": ("ckey",)},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(_canon_pick_partition, batch_format="pyarrow")
    )


PAGERANK_ITERS = 5
PAGERANK_TOPN = 20


def q_pagerank(sf_dir: str):
    """Integer PageRank over the verified minhash near-dup graph — the
    'which doc is the hub of its duplication cluster' canonical-copy
    signal (stages/graph.py: all-integer recurrence, 5 fixed power
    iterations, two pair-sized exchanges per round). Top-20 via
    per-block partial top-N → driver merge of O(blocks×N) rows."""
    from ..stages.graph import pagerank_integer

    pr = pagerank_integer(q_minhash_pairs(sf_dir), iters=PAGERANK_ITERS)

    def _partial_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["pr", "doc_id"], ascending=[False, True]
        ).head(PAGERANK_TOPN)
        return from_pandas_clean(df, preserve_index=False)

    cand = pr.map_batches(_partial_top, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["pr", "doc_id"], ascending=[False, True]
    ).head(PAGERANK_TOPN).reset_index(drop=True)
    cand["rnk"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand[["doc_id", "pr", "rnk"]].astype(
        {"doc_id": "int64", "pr": "int64"}
    )


def q_degree_dist(sf_dir: str):
    """Degree histogram of the verified near-dup graph — the cluster
    shape profile (a long tail of degree-1 nodes = pairwise dups; high
    degrees = template farms). One src-hash exchange colocates every
    node's edges so the degree is exact in-partition; the histogram
    reduce then moves at most max_degree rows per partition."""
    from ..stages.dedup import edges_both_ways

    edges = q_minhash_pairs(sf_dir).map_batches(
        edges_both_ways, batch_format="pyarrow"
    )

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[c for c in ("kpart",) if c in g.columns])
        deg = g.groupby("src", sort=False).size()
        out = (deg.value_counts().rename_axis("degree")
               .rename("n_nodes").reset_index())
        return out.astype({"degree": "int64", "n_nodes": "int64"})

    hist = (_arrow_blocks(
        _parted(edges, ("src",)).map_groups(kern, batch_format="pandas"))
            .groupby("degree").sum("n_nodes").to_pandas())
    hist.columns = ["degree", "n_nodes"]
    return hist.astype({"degree": "int64", "n_nodes": "int64"})


def q_triangles(sf_dir: str):
    """Exact triangle count of the verified near-dup graph — the density
    signal that separates tight duplicate cliques from chain-shaped
    false-positive clusters. Cohen wedge-closing plan (stages/graph.py):
    one center-keyed exchange emits u<v<w oriented wedges, one
    (v, w)-keyed exchange closes them against the edge set."""
    from ..stages.graph import count_triangles

    n = count_triangles(q_minhash_pairs(sf_dir))
    return pd.DataFrame({"n_triangles": pd.Series([n], dtype="int64")})


def q_event_bigrams(sf_dir: str):
    """Per-user event-type transition counts (sequence mining's order-1
    core): consecutive (prev → next) event pairs under (ts, event_id)
    ordering. ONE user_id-hash exchange; the kernel is a lexsort +
    shifted compare with a same-user guard; output is |types|² rows."""
    ev = _events(sf_dir, columns=["user_id", "ts", "event_id",
                                             "event_type"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "tsu": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[c for c in ("kpart",) if c in g.columns])
        u = g["user_id"].to_numpy(np.int64)
        tsu = g["tsu"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        et = np.asarray(g["event_type"].to_numpy(), dtype=object)
        order = np.lexsort((eid, tsu, u))
        u, et = u[order], et[order]
        if len(u) < 2:
            return pd.DataFrame({"t1": pd.Series(dtype=object),
                                 "t2": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        same = u[1:] == u[:-1]
        pdf = pd.DataFrame({"t1": et[:-1][same], "t2": et[1:][same]})
        out = pdf.groupby(["t1", "t2"], sort=False).size().rename(
            "n").reset_index()
        return out.astype({"n": "int64"})

    parts = _arrow_blocks(
        _parted(ev.map_batches(prep, batch_format="pyarrow"),
                ("user_id",)).map_groups(kernel, batch_format="pandas"))
    out = parts.groupby(["t1", "t2"]).sum("n").to_pandas()
    out.columns = ["t1", "t2", "n"]
    return out.astype({"n": "int64"})


def q_user_activity(sf_dir: str):
    """Activity histogram of the event log — #users by #events (the
    bot-vs-casual profile that drives per-user capping). One
    user-hash exchange of the pruned (user_id) column; the kernel
    value-counts users then histograms the counts, so the reduce moves
    ≤max_activity rows per partition."""
    ev = _events(sf_dir, columns=["user_id"])

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g["user_id"].value_counts()
        out = (cnt.value_counts().rename_axis("n_events")
               .rename("n_users").reset_index())
        return out.astype({"n_events": "int64", "n_users": "int64"})

    hist = (_arrow_blocks(
        _parted(ev, ("user_id",)).map_groups(kern, batch_format="pandas"))
            .groupby("n_events").sum("n_users").to_pandas())
    hist.columns = ["n_events", "n_users"]
    return hist.astype({"n_events": "int64", "n_users": "int64"})


_USER_ACTIVITY_SQL = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT n AS n_events, CAST(count(*) AS BIGINT) AS n_users
FROM c GROUP BY n
"""


def q_value_outliers(sf_dir: str):
    """Per-type outlier detection — events whose value exceeds 3× their
    event_type's exact median. All integer: values quantize to cents
    (floor(v*100 + .5) — identical double ops engine/SQL), the median
    comes from a (type, cents)-histogram exchange (bounded by distinct
    cent values per type, the dl_percentiles pattern), and the
    thresholds broadcast back into a second column-pruned scan as a
    tiny dict. Two input-sized reads, zero input-sized shuffles."""
    cols = ["event_id", "event_type", "value"]

    def to_cents(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        vc = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "vc": pa.array(vc, pa.int64()),
        })

    ev = _events(sf_dir, columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        pdf = (t.to_pandas().groupby(["event_type", "vc"], sort=False)
               .size().reset_index(name="n"))
        return from_pandas_clean(pdf, preserve_index=False)

    hist = (
        ev.map_batches(to_cents, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "vc"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # bounded: one row per distinct (type, cents)
    )
    med = {}
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("vc")
        cum = g["n"].to_numpy(np.int64).cumsum()
        tot = int(cum[-1])
        thresh = (50 * tot + 99) // 100  # exact ceil(50*tot/100)
        med[et] = int(g["vc"].to_numpy(np.int64)[
            np.searchsorted(cum, thresh, side="left")])

    def flag(t: pa.Table) -> pa.Table:
        pdf = to_cents(t).to_pandas()
        lim = pdf["event_type"].map(med).to_numpy(np.int64)
        out = pdf[pdf["vc"].to_numpy(np.int64) > 3 * lim]
        return from_pandas_clean(
            out.rename(columns={"vc": "value_cents"}), preserve_index=False)

    res = ev.map_batches(flag, batch_format="pyarrow").to_pandas()
    return res.astype({"event_id": "int64", "value_cents": "int64"})


_VALUE_OUTLIERS_SQL = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
h AS (SELECT event_type, vc, count(*) AS n FROM v GROUP BY event_type, vc),
c AS (SELECT event_type, vc,
        sum(n) OVER (PARTITION BY event_type ORDER BY vc) AS cum,
        sum(n) OVER (PARTITION BY event_type) AS tot
      FROM h),
m AS (SELECT event_type,
        min(vc) FILTER (WHERE cum >= ceil((50 * tot) / 100.0)) AS med
      FROM c GROUP BY event_type)
SELECT v.event_id, v.event_type, v.vc AS value_cents
FROM v JOIN m USING (event_type)
WHERE v.vc > 3 * m.med
"""


_EVENT_BIGRAMS_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS t1, nxt AS t2, count(*) AS n
FROM o WHERE nxt IS NOT NULL GROUP BY event_type, nxt
"""


def q_simhash_pairs(sf_dir: str, cfg: DedupConfig = DEFAULT_DEDUP):
    """SimHash near-dup pairs (Hamming <= 3) as a distributed LSH-band
    plan: 4 chunk-keyed band rows per doc (signature travels with the
    row) → groupby(band, chunk) Hamming-verifies in-group → (a, b)
    dedup. SQL-oracled: the _SIMHASH_SQL oracle recomputes the md5-based
    signature bit-by-bit in DuckDB."""
    sig = (
        _docs(sf_dir)
        .map_batches(add_simhash, batch_format="pyarrow")
        .select_columns(["doc_id", "simhash"])
    )
    bands = sig.map_batches(emit_simhash_bands, batch_format="pyarrow")
    pairs = (
        bands.map_batches(
            add_kpart, fn_kwargs={"num_parts": 64, "cols": ("band", "chunk")},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(
            lambda g: simhash_pairs_partition(
                g, max_hamming=cfg.max_hamming, max_bucket=cfg.max_bucket
            ),
            batch_format="pandas",
        )
    )
    return (
        pairs.map_batches(
            add_kpart, fn_kwargs={"num_parts": 64, "cols": ("a", "b")},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(dedup_pairs_partition, batch_format="pandas")
    )


def q_embed_neardup(sf_dir: str):
    """Exact all-pairs cosine ≥ threshold — distributed block-tiling:
    each vector is replicated to its (bi, bj) tiles (8 blocks → 36 tile
    groups), every unordered pair computed in exactly one tile. No
    take_all, no broadcast of the full matrix."""
    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    tiles = emb.map_batches(
        emit_tile_rows, fn_kwargs={"num_blocks": 8}, batch_format="pyarrow"
    )
    return tiles.groupby(["ti", "tj"]).map_groups(
        lambda g: tile_pairs(g, NEARDUP_COS_THRESHOLD, num_blocks=8),
        batch_format="pandas",
    )


def q_embed_neardup_lsh(sf_dir: str):
    """Near-dup pairs restricted to same-LSH-bucket candidates (the scale
    path: bucketing replaces the all-to-all tiling; recall traded for a
    linear exchange). Hyperplanes are fixed module-level constants so the
    SQL oracle evaluates the identical buckets."""
    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    bucketed = emb.map_batches(
        lsh_bucket, fn_kwargs={"planes": LSH_PLANES}, batch_format="pyarrow"
    )
    ndp = NearDupPairs(threshold=NEARDUP_COS_THRESHOLD)
    return bucketed.groupby("bucket").map_groups(
        lambda g: ndp(g), batch_format="pyarrow"
    )


KNN_K = 3


def q_knn_graph(sf_dir: str):
    """Exact k-NN graph over the embeddings (top-3 cosine neighbours per
    vector) — the all-pairs analog of ann_topk and the building block of
    kNN-graph dedup/clustering: block tiling puts every ordered (a, b)
    candidate in exactly one (bi, bj) tile, each tile emits per-vector
    PARTIAL top-k rows, and a vec_id-hash merge ranks the ≤ num_blocks×k
    survivors. Exchange = num_blocks × input + O(N·k); the O(N²/B)
    per-tile matmul is inherent to the exact graph (the LSH/IVF buckets
    are the approximate scale path)."""
    from ..stages.ann import knn_merge_partition, tile_knn_partial

    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    tiles = emb.map_batches(
        emit_tile_rows, fn_kwargs={"num_blocks": 8}, batch_format="pyarrow"
    )
    partials = tiles.groupby(["ti", "tj"]).map_groups(
        lambda g: tile_knn_partial(g, KNN_K, num_blocks=8),
        batch_format="pandas",
    )
    merged = partials.map_batches(
        add_kpart, fn_kwargs={"num_parts": 32, "cols": ("vec_id",)},
        batch_format="pyarrow",
    ).groupby("kpart").map_groups(
        lambda g: knn_merge_partition(g, KNN_K), batch_format="pandas"
    )
    return merged


def q_ann_topk(sf_dir: str):
    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    qid_arr = pa.array(list(ANN_QUERY_IDS), pa.int64())
    qrows = {
        r["vec_id"]: r["embedding"]
        for r in emb.map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qid_arr)),
            batch_format="pyarrow",
        ).take_all()
    }
    qids = sorted(qrows)
    qmat = np.array([qrows[q] for q in qids], dtype=np.float64)
    ref = ray.put((qids, qmat))
    partial = emb.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": 10},
        batch_format="pyarrow",
        concurrency=default_pool(),
    )
    return partial.groupby("query_vec").map_groups(final_topk, batch_format="pandas")


# radius (range) search threshold on the fx4 cosine grid: cos ≥ 0.3
ANN_RANGE_TAU_X = 3000


def q_ann_range(sf_dir: str):
    """Radius similarity search: every corpus vector within cosine ≥
    tau of each query vector — the threshold sibling of ann_topk
    (recommendation candidate generation / near-duplicate probes use
    this shape). Broadcast query matrix, per-batch matmul + fx4 filter,
    NO merge stage at all: emissions union to the exact set because each
    vector lives in one batch. Exchange = result rows only."""
    from ..stages.ann import RangeSearch

    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    qid_arr = pa.array(list(ANN_QUERY_IDS), pa.int64())
    qrows = {
        r["vec_id"]: r["embedding"]
        for r in emb.map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qid_arr)),
            batch_format="pyarrow",
        ).take_all()
    }
    qids = sorted(qrows)
    qmat = np.array([qrows[q] for q in qids], dtype=np.float64)
    ref = ray.put((qids, qmat))
    return emb.map_batches(
        RangeSearch,
        fn_constructor_kwargs={"queries_ref": ref, "tau_x": ANN_RANGE_TAU_X},
        batch_format="pyarrow",
        concurrency=default_pool(),
    )


def q_ann_recall(sf_dir: str):
    """Recall@10 of the LSH-bucketed ANN path against the exact
    brute-force ranking, per query — the quality-report op every
    approximate index needs next to it. Both inputs are result-sized
    (|queries| × 10), so the comparison is a driver frame; the heavy
    lifting stays in the two oracled pipelines it composes."""
    ex = q_ann_topk(sf_dir).to_pandas()[["query_vec", "vec_id"]]
    ap = q_ann_topk_lsh(sf_dir).to_pandas()[["query_vec", "vec_id"]]
    ap["hit"] = 1
    m = ex.merge(ap, on=["query_vec", "vec_id"], how="left")
    out = (
        m.groupby("query_vec", sort=False)
        .agg(n_overlap=("hit", lambda s: int(s.notna().sum())))
        .reset_index()
    )
    out["recall_x"] = out["n_overlap"] * 1000  # n/10 on the fx4 grid
    return out.astype({"query_vec": "int64", "n_overlap": "int64",
                       "recall_x": "int64"})


def q_ann_topk_lsh(sf_dir: str):
    """ANN top-k restricted to the query's LSH bucket (the scale path:
    candidate set shrinks by the bucket fan-out; recall traded for a
    bounded matmul). Same fixed hyperplanes as embed_neardup_lsh so the
    SQL oracle computes identical buckets."""
    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    bucketed = emb.map_batches(
        lsh_bucket, fn_kwargs={"planes": LSH_PLANES}, batch_format="pyarrow"
    )
    qid_arr = pa.array(list(ANN_QUERY_IDS), pa.int64())
    qrows = {
        r["vec_id"]: (r["embedding"], r["bucket"])
        for r in bucketed.map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qid_arr)),
            batch_format="pyarrow",
        ).take_all()
    }
    qids = sorted(qrows)
    qmat = np.array([qrows[q][0] for q in qids], dtype=np.float64)
    qbuckets = np.array([qrows[q][1] for q in qids], dtype=np.int64)
    ref = ray.put((qids, qmat, qbuckets))
    partial = bucketed.map_batches(
        BucketTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": 10},
        batch_format="pyarrow",
        concurrency=default_pool(),
    )
    return partial.groupby("query_vec").map_groups(final_topk, batch_format="pandas")


def q_ann_topk_ivf(sf_dir: str):
    """ANN top-k over an IVF (k-means) coarse quantizer — the classic
    scale path (FAISS IndexIVFFlat semantics,
    faiss_based_ANN_Implementation.py:114-149 uses the flat/LSH variants):
    a distributed deterministic Lloyd fit (driver reduces nlist × dim
    partials per iteration), a cell-assignment map, and per-query probing
    of the ``nprobe`` nearest cells. Candidate scoring shrinks by
    nlist/nprobe; recall traded for a bounded matmul. The DuckDB oracle
    re-derives identical centroids (same init, same fixed-point rounding),
    so this is fully value-hash-checked."""
    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    cent = fit_ivf_centroids(emb, IVF_NLIST, IVF_NITER)
    assigned = emb.map_batches(
        ivf_assign_batch, fn_kwargs={"centroids": cent}, batch_format="pyarrow"
    )
    qid_arr = pa.array(list(ANN_QUERY_IDS), pa.int64())
    qrows = {
        r["vec_id"]: r["embedding"]
        for r in emb.map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qid_arr)),
            batch_format="pyarrow",
        ).take_all()
    }
    qids = sorted(qrows)
    qmat = np.array([qrows[q] for q in qids], dtype=np.float64)
    # probe cells: nprobe nearest centroids per query, fixed-point rounded
    # distances, ties to the smaller cell (same as the oracle row_number)
    d = ((qmat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    dx = np.floor(d * IVF_DIST_SCALE + 0.5)
    order = np.argsort(dx, axis=1, kind="stable")  # stable → ties pick lower cell
    qcells = order[:, :IVF_NPROBE]
    ref = ray.put((qids, qmat, [c.tolist() for c in qcells]))
    partial = assigned.map_batches(
        IVFTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": 10},
        batch_format="pyarrow",
        concurrency=default_pool(),
    )
    return partial.groupby("query_vec").map_groups(final_topk, batch_format="pandas")


def q_kmeans_clusters(sf_dir: str):
    """Distributed deterministic k-means clustering of the embedding
    table: the IVF coarse quantizer exposed as a first-class clustering
    op — Lloyd fit with per-batch (cell, dim) partial moments (driver
    reduces nlist×dim only), then a one-pass assignment map. Returns
    (vec_id, cluster). The DuckDB oracle re-derives identical centroids
    (same init / fixed-point grids), so assignments are value-checked."""
    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    cent = fit_ivf_centroids(emb, IVF_NLIST, IVF_NITER)
    assigned = emb.map_batches(
        ivf_assign_batch, fn_kwargs={"centroids": cent}, batch_format="pyarrow"
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": t["vec_id"],
             "cluster": pc.cast(t["cell"], pa.int64())}
        )

    return assigned.map_batches(project, batch_format="pyarrow")


def q_pq_codes(sf_dir: str):
    """Product-quantization encode of the embedding table (FAISS IndexPQ
    semantics — the compression leg of IVF-PQ, the standard trillion-scale
    ANN layout): a distributed deterministic per-subspace Lloyd fit (one
    map_batches pass per iteration covers ALL subspaces; driver reduces
    nsub × ksub × subdim partials), then a one-pass encode map. Returns
    (vec_id, code_s0..code_s{nsub-1}). At scale the code columns replace
    the raw vectors: dim × 4 bytes → nsub bytes. The DuckDB oracle
    re-derives identical codebooks (same init / fixed-point grids), so
    codes are value-checked."""
    from ..stages.ann import fit_pq_codebooks, pq_encode_batch

    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    cb = fit_pq_codebooks(emb, PQ_NSUB, PQ_KSUB, PQ_NITER)
    encoded = emb.map_batches(
        pq_encode_batch, fn_kwargs={"codebooks": cb}, batch_format="pyarrow"
    )
    return encoded.drop_columns(["embedding"])


def q_ann_topk_pq(sf_dir: str):
    """ANN top-k by asymmetric distance computation over PQ codes: each
    query precomputes an (nsub, ksub) integer distance table from its
    EXACT subvectors to the fitted codebooks; candidate distance is nsub
    table lookups summed — the scan ships only the one-byte-per-subspace
    code columns, never raw vectors. Partial top-k per batch under the
    exact (distance, vec_id) order, then a per-query merge. Returns
    (query_vec, rank, vec_id, ad_x)."""
    from ..stages.ann import (
        PQTopK, final_topk_pq, fit_pq_codebooks, pq_encode_batch,
    )

    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    cb = fit_pq_codebooks(emb, PQ_NSUB, PQ_KSUB, PQ_NITER)
    encoded = emb.map_batches(
        pq_encode_batch, fn_kwargs={"codebooks": cb}, batch_format="pyarrow"
    ).drop_columns(["embedding"])
    qid_arr = pa.array(list(ANN_QUERY_IDS), pa.int64())
    qrows = {
        r["vec_id"]: r["embedding"]
        for r in emb.map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qid_arr)),
            batch_format="pyarrow",
        ).take_all()
    }
    qids = sorted(qrows)
    qmat = np.array([qrows[q] for q in qids], dtype=np.float64)
    ref = ray.put((qids, qmat))
    partial = encoded.map_batches(
        PQTopK,
        fn_constructor_kwargs={"queries_ref": ref, "codebooks": cb, "k": 10},
        batch_format="pyarrow",
        concurrency=default_pool(),
    )
    return partial.groupby("query_vec").map_groups(
        final_topk_pq, batch_format="pandas"
    )


def q_ann_topk_ivfpq(sf_dir: str):
    """ANN top-k over IVF + PQ combined (the FAISS IndexIVFPQ shape, PQ
    over raw vectors rather than residuals): the coarse k-means quantizer
    prunes each query's scan to its ``IVF_NPROBE`` cells AND the pruned
    candidates rank by PQ ADC distance, so at 10^12 vectors the scan
    touches nlist/nprobe of the data and ships only cell + code columns
    (nsub bytes per vector). Both codebook fits are the existing
    distributed deterministic Lloyd passes; the DuckDB oracle re-derives
    both chains and composes them."""
    from ..stages.ann import (
        IVFPQTopK, final_topk_pq, fit_ivf_centroids, fit_pq_codebooks,
        ivf_assign_batch, pq_encode_batch,
    )

    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    cent = fit_ivf_centroids(emb, IVF_NLIST, IVF_NITER)
    cb = fit_pq_codebooks(emb, PQ_NSUB, PQ_KSUB, PQ_NITER)
    data = (
        emb.map_batches(ivf_assign_batch, fn_kwargs={"centroids": cent},
                        batch_format="pyarrow")
        .map_batches(pq_encode_batch, fn_kwargs={"codebooks": cb},
                     batch_format="pyarrow")
        .drop_columns(["embedding"])
    )
    qid_arr = pa.array(list(ANN_QUERY_IDS), pa.int64())
    qrows = {
        r["vec_id"]: r["embedding"]
        for r in emb.map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qid_arr)),
            batch_format="pyarrow",
        ).take_all()
    }
    qids = sorted(qrows)
    qmat = np.array([qrows[q] for q in qids], dtype=np.float64)
    # probe cells exactly as q_ann_topk_ivf (fixed-point distances,
    # stable argsort → ties to the smaller cell, same as the oracle)
    d = ((qmat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    dx = np.floor(d * IVF_DIST_SCALE + 0.5)
    order = np.argsort(dx, axis=1, kind="stable")
    qcells = order[:, :IVF_NPROBE]
    ref = ray.put((qids, qmat, [c.tolist() for c in qcells]))
    partial = data.map_batches(
        IVFPQTopK,
        fn_constructor_kwargs={"queries_ref": ref, "codebooks": cb, "k": 10},
        batch_format="pyarrow",
        concurrency=default_pool(),
    )
    return partial.groupby("query_vec").map_groups(
        final_topk_pq, batch_format="pandas"
    )


def q_token_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(doc_stats_batch, batch_format="pyarrow")


def q_langid(sf_dir: str):
    return _docs(sf_dir).map_batches(langid_batch, batch_format="pyarrow")


# vocabulary size for the OOV-coverage audit (global top-K terms by tf)
OOV_VOCAB_K = 25


def q_oov_rate(sf_dir: str):
    """Tokenizer/vocabulary coverage audit (the fertility-style signal a
    training pipeline computes before committing to a vocab): the global
    top-OOV_VOCAB_K terms by total tf form the vocabulary; per document,
    the fraction of token OCCURRENCES outside it (fx4). Pass 1 is a full
    (term, tf) aggregate whose top-K is taken per aggregated block then
    merged on the driver (each term lives in exactly one block post-
    groupby, so the union of block top-Ks contains the global top-K —
    the driver never sees the whole vocabulary); pass 2 is a flat-token
    ``is_in`` + bincount per batch, zero shuffles."""
    docs = _docs(sf_dir)

    def term_partials(t: pa.Table) -> pa.Table:
        toks, _ = _simple_token_lists(t)
        values = toks.flatten()
        values = values.filter(pc.not_equal(values, ""))
        vc = pc.value_counts(values)
        return pa.table(
            {
                "term": vc.field("values"),
                "tf": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    sums = (
        docs.map_batches(term_partials, batch_format="pyarrow")
        .groupby("term")
        .sum("tf")
    )

    def local_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas().rename(columns={"sum(tf)": "total_tf"})
        df = df.sort_values(
            ["total_tf", "term"], ascending=[False, True]
        ).head(OOV_VOCAB_K)
        return from_pandas_clean(df, preserve_index=False)

    cand = pd.DataFrame(
        sums.map_batches(local_top, batch_format="pyarrow").take_all()
    )
    vocab = (
        cand.sort_values(["total_tf", "term"], ascending=[False, True])
        .head(OOV_VOCAB_K)["term"]
        .tolist()
    )
    vocab_arr = pa.array(sorted(vocab), pa.string())

    def score(t: pa.Table) -> pa.Table:
        toks, dl = _simple_token_lists(t)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = toks.values
        start0 = offsets[0]
        if start0 != 0 or len(values) != offsets[-1]:
            values = values.slice(start0, offsets[-1] - start0)
            offsets = offsets - start0
        lens = np.diff(offsets)
        parent = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
        hit = pc.is_in(values, value_set=vocab_arr).to_numpy(
            zero_copy_only=False
        )
        inv = np.bincount(parent[hit], minlength=len(toks)).astype(np.int64)
        dl_np = dl.to_numpy(zero_copy_only=False)
        keep = dl_np > 0
        oov = (dl_np[keep] - inv[keep]).astype(np.float64) / dl_np[keep]
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "n_tokens": pa.array(dl_np[keep], pa.int64()),
                "oov_x": pa.array(
                    np.floor(oov * 10000.0 + 0.5).astype(np.int64)
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def _simple_token_lists(t: pa.Table):
    """simple-tokenizer Arrow kernels → (token ListArray, dl Int64Array);
    empty docs hold the [""] sentinel with dl=0 (TokenizeStage._simple
    semantics)."""
    txt = pc.fill_null(t["text"], "")
    low = pc.utf8_lower(txt)
    spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
    trimmed = pc.utf8_trim_whitespace(spaced)
    toks = pc.split_pattern(trimmed, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    dl = np.where(empty, 0, lens).astype(np.int64)
    return toks, pa.array(dl, pa.int64())


def q_binary_meta(sf_dir: str):
    """Multimodal plumbing: treat utf-8 text bytes as an opaque payload."""

    def to_payload(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array([(s or "").encode("utf-8") for s in texts],
                                    pa.binary()),
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(to_payload, batch_format="pyarrow")
        .map_batches(binary_meta_batch, batch_format="pyarrow")
    )


def _cents(v: np.ndarray) -> np.ndarray:
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def q_rel_agg(sf_dir: str):
    ds = _tbl(sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        pdf["qty_c"] = _cents(pdf["l_quantity"].to_numpy())
        pdf["price_c"] = _cents(pdf["l_extendedprice"].to_numpy())
        pdf["disc_price_c"] = _cents(
            (pdf["l_extendedprice"].to_numpy()
             * (1.0 - pdf["l_discount"].to_numpy()))
        )
        g = (
            pdf.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(n=("qty_c", "size"), qty_c=("qty_c", "sum"),
                 price_c=("price_c", "sum"), disc_price_c=("disc_price_c", "sum"))
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Sum("qty_c", alias_name="qty_c"),
            ray.data.aggregate.Sum("price_c", alias_name="price_c"),
            ray.data.aggregate.Sum("disc_price_c", alias_name="disc_price_c"),
        )
    )
    return out


def q_rel_join_top(sf_dir: str):
    orders = _tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        pdf["revenue_c"] = _cents(pdf["o_totalprice"].to_numpy())
        g = (
            pdf.groupby("o_custkey", sort=False)
            .agg(revenue_c=("revenue_c", "sum"), n_orders=("revenue_c", "size"))
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    def partial_top(t: pa.Table) -> pa.Table:
        # per-block partial top-10 (final_topk pattern): the driver only
        # ever sees O(blocks × 10) rows, never the customer cardinality
        pdf = t.to_pandas()
        return from_pandas_clean(
            pdf.sort_values(
                ["revenue_c", "o_custkey"], ascending=[False, True]
            ).head(10),
            preserve_index=False,
        )

    rev = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            ray.data.aggregate.Sum("revenue_c", alias_name="revenue_c"),
            ray.data.aggregate.Sum("n_orders", alias_name="n_orders"),
        )
        .map_batches(partial_top, batch_format="pyarrow")
        .to_pandas()
    )
    top = rev.sort_values(
        ["revenue_c", "o_custkey"], ascending=[False, True]
    ).head(10).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    # distributed semi-filter of the customer dimension by the 10 winners
    keys = pa.array(top["o_custkey"].to_numpy(), pa.int64())
    cust = (
        _tbl(sf_dir, "customer", columns=["c_custkey", "c_name"]
        )
        .map_batches(
            lambda t: t.filter(pc.is_in(t["c_custkey"], value_set=keys)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    return out[["rank", "c_custkey", "c_name", "revenue_c", "n_orders"]]


def _asof_partition(group: pd.DataFrame) -> pd.DataFrame:
    """user_id-hash partition of (purchase ∪ signup) rows → as-of matches.
    Right-side ties on (user_id, ts) collapse to max event_id FIRST so
    the engine and the SQL oracle share one deterministic winner."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("event_id", "user_id", "matched_event_id", "gap_us")})
    g = group.drop(columns=["kpart"]) if "kpart" in group.columns else group
    left = g[g["event_type"] == "purchase"][["event_id", "ts", "user_id"]]
    right = g[g["event_type"] == "signup"]
    if left.empty or right.empty:
        return empty
    right = (
        right.groupby(["user_id", "ts"], sort=False)["event_id"].max().reset_index()
        .rename(columns={"event_id": "matched_event_id"})
    )
    right["matched_ts"] = right["ts"]
    left = left.sort_values(["ts", "event_id"], kind="mergesort")
    right = right.sort_values(["ts", "matched_event_id"], kind="mergesort")
    m = pd.merge_asof(left, right, on="ts", by="user_id", direction="backward")
    m = m.dropna(subset=["matched_event_id"])
    if m.empty:
        return empty
    m["gap_us"] = m["ts"] - m["matched_ts"]
    return m[["event_id", "user_id", "matched_event_id", "gap_us"]].astype("int64")


def q_rel_asof(sf_dir: str):
    """AS-OF JOIN — an operator Ray Data lacks: for every purchase event,
    the most recent signup of the same user at or before its timestamp
    (gap in exact integer microseconds).

    Distributed as a user_id-hash cogroup: both sides of a user colocate,
    the per-partition match is one vectorized ``pd.merge_asof``.
    Partitioning assumption (documented): one key's timeline fits a
    partition — a degenerate key would need time-bucketing with
    boundary replication of the latest right row per bucket."""
    ev = _events(sf_dir,
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def _sides(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(t["event_type"],
                     value_set=pa.array(["purchase", "signup"]))
        )
        # exact integer epoch-microseconds: merge keys and gaps stay
        # integral end-to-end (no datetime unit coercion)
        return t.set_column(
            t.schema.get_field_index("ts"), "ts", pc.cast(t["ts"], pa.int64())
        )

    return _parted(ev.map_batches(_sides, batch_format="pyarrow"),
                   ("user_id",)).map_groups(
        _asof_partition, batch_format="pandas"
    )


def q_rel_window(sf_dir: str):
    ds = _events(sf_dir, columns=["user_id", "ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        pdf["hour_ts"] = (
            pdf["ts"].dt.floor("h").to_numpy().astype("datetime64[s]").astype(np.int64)
        )
        pdf["value_c"] = _cents(pdf["value"].to_numpy())
        g = (
            pdf.groupby(["user_id", "hour_ts"], sort=False)
            .agg(n_events=("value_c", "size"), value_c=("value_c", "sum"))
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "hour_ts"])
        .aggregate(
            ray.data.aggregate.Sum("n_events", alias_name="n_events"),
            ray.data.aggregate.Sum("value_c", alias_name="value_c"),
        )
    )


def q_rel_json(sf_dir: str):
    ds = _events(sf_dir, columns=["event_type", "props"]
    )

    def extract(t: pa.Table) -> pa.Table:
        k = pc.cast(
            pc.struct_field(
                pc.extract_regex(pc.cast(t["props"], pa.string()), r"(?P<k>[0-9]+)"),
                "k",
            ),
            pa.int64(),
        )
        return pa.table({"event_type": t["event_type"], "k": k})

    return (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Count(alias_name="n"),
            ray.data.aggregate.Sum("k", alias_name="sum_k"),
        )
    )


def q_submission_wide(sf_dir: str):
    """S7 ranked-docs wide sink (document_ranking_with_bm25.py:495-499):
    columns doc_1..doc_10 per query; missing ranks → -1."""
    pdf = q_bm25_reference(sf_dir)
    wide = pdf.pivot(index="query_id", columns="rank", values="doc_id")
    for r in range(1, 11):
        if r not in wide.columns:
            wide[r] = np.nan
    wide = wide[[r for r in range(1, 11)]].fillna(-1).astype(np.int64)
    wide.columns = [f"doc_{r}" for r in range(1, 11)]
    return wide.reset_index()


# fixed contraction table (reference expands contractions via
# contractions.fix, text_preprocessing_and_stopwords_setup.py:58; this is
# the deterministic subset, applied sequentially). Patterns are RE2-safe
# (capture groups instead of lookbehind) so the SQL oracle applies the
# IDENTICAL regexes via regexp_replace.
CONTRACTIONS = [
    (r"\bwon't\b", "will not"),
    (r"\bcan't\b", "cannot"),
    (r"\bshan't\b", "shall not"),
    (r"\bi'm\b", "i am"),
    (r"\blet's\b", "let us"),
    (r"\bit's\b", "it is"),
    (r"\bthat's\b", "that is"),
    (r"\bthere's\b", "there is"),
    (r"\bwhat's\b", "what is"),
    (r"([a-z])n't\b", r"\1 not"),
    (r"([a-z])'re\b", r"\1 are"),
    (r"([a-z])'ve\b", r"\1 have"),
    (r"([a-z])'ll\b", r"\1 will"),
    (r"([a-z])'d\b", r"\1 would"),
]


def _webnorm_sql() -> str:
    expr = "lower(text)"
    for pat, rep in CONTRACTIONS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    expr = f"regexp_replace({expr}, 'http\\S+|www\\S+|https\\S+', ' ', 'g')"
    expr = f"regexp_replace({expr}, '[0-9]+', ' ', 'g')"
    expr = f"regexp_replace({expr}, '[^a-z ]', ' ', 'g')"
    expr = f"trim(regexp_replace({expr}, ' +', ' ', 'g'))"
    return (
        f"WITH n AS (SELECT doc_id, {expr} AS s FROM documents)\n"
        "SELECT doc_id, md5(s) AS norm_md5, length(s) AS norm_len FROM n"
    )


def q_web_normalize(sf_dir: str):
    """M4 web normalizer (text_preprocessing_and_stopwords_setup.py:53-73):
    lowercase → expand contractions → strip URLs → strip digits → strip
    punctuation → collapse whitespace. Output is the md5 + length of the
    normalized text."""
    import re

    contr_res = [(re.compile(p), r) for p, r in CONTRACTIONS]
    url_re = re.compile(r"http\S+|www\S+|https\S+")
    digit_re = re.compile(r"[0-9]+")
    punct_re = re.compile(r"[^a-z ]")
    ws_re = re.compile(r" +")

    def norm(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        out = []
        for s in texts:
            s = (s or "").lower()
            for cre, rep in contr_res:
                s = cre.sub(rep, s)
            s = url_re.sub(" ", s)
            s = digit_re.sub(" ", s)
            s = punct_re.sub(" ", s)
            s = ws_re.sub(" ", s).strip(" ")
            out.append(s)
        from ..functions.hashing import md5_hex

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_md5": pa.array([md5_hex(s) for s in out], pa.string()),
                "norm_len": pa.array([len(s) for s in out], pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(norm, batch_format="pyarrow")


def _vector_split_sentences(t: pa.Table):
    """Vectorized M6 '.'-split (same semantics as Python
    ``text.split('.')`` + ``strip(' ')`` + skip-empties): Arrow
    ``split_pattern`` → flat values + list offsets → (row index into the
    batch, sent_idx within the raw split, trimmed sentence). No per-doc
    Python loop — the same offsets-flattening shape as
    TokenizeStage._simple."""
    txt = pc.fill_null(t["text"], "")
    parts = pc.split_pattern(txt, ".")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offsets = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]          # flatten() honors slicing offsets
    flat = parts.flatten()
    trimmed = pc.utf8_trim(flat, " ")
    n_per = np.diff(offsets)
    parent = np.repeat(np.arange(len(t), dtype=np.int64), n_per)
    sent_idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
        offsets[:-1], n_per
    )
    keep = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
    keep_arr = pa.array(keep)
    return parent[keep], sent_idx[keep], trimmed.filter(keep_arr)


def q_sentences(sf_dir: str):
    """M6 sentence splitter (team_run1.py:45-46,88-98): 1→many flat map;
    sent_idx = position in the raw '.'-split (0-based), empties skipped."""

    def split(t: pa.Table) -> pa.Table:
        sel, sidx, sents = _vector_split_sentences(t)
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"], pa.array(sel)),
                "sent_idx": pa.array(sidx, pa.int64()),
                "sentence": sents,
            }
        )

    return _docs(sf_dir).map_batches(split, batch_format="pyarrow")


def q_readability(sf_dir: str):
    """Integer readability grade per doc — the Flesch-Kincaid-shaped
    corpus-quality signal (reading-grade filters are a standard
    training-data gate), made exactly reproducible: words = the simple-
    tokenizer token count, sentences = non-empty '.'-split parts (the
    M6 splitter), syllables ≈ vowel runs ``[aeiou]+`` in the normalized
    text (the classic approximation), and the grade is the all-integer
    fixed point ``rd_x = (39000·words)//sents + (118000·syll)//words −
    155900`` (FK's 0.39/11.8/15.59 ×10^4, floor divisions — no float
    anywhere, so the SQL mirror is bit-exact). Docs with zero words or
    sentences are dropped. Zero shuffle: one vectorized Arrow pass
    (regex match counts + the shared sentence-split kernel)."""
    docs = _docs(sf_dir)

    def score(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        norm = pc.replace_substring_regex(
            pc.utf8_lower(txt), "[^a-z0-9]+", " "
        )
        w = pc.count_substring_regex(norm, "[a-z0-9]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        sy = pc.count_substring_regex(norm, "[aeiou]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        sel, _sidx, _sents = _vector_split_sentences(t)
        ns = np.bincount(
            np.asarray(sel, dtype=np.int64), minlength=t.num_rows
        ).astype(np.int64)
        keep = (w > 0) & (ns > 0)
        rd = (
            (39000 * w[keep]) // ns[keep]
            + (118000 * sy[keep]) // w[keep]
            - 155900
        )
        ids = pc.cast(t["doc_id"], pa.int64()).take(
            pa.array(np.flatnonzero(keep))
        )
        return pa.table({
            "doc_id": ids,
            "n_words": pa.array(w[keep], pa.int64()),
            "n_sents": pa.array(ns[keep], pa.int64()),
            "n_syll": pa.array(sy[keep], pa.int64()),
            "rd_x": pa.array(rd, pa.int64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


_READABILITY_SQL = """
WITH base AS (
  SELECT doc_id,
         trim(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9]+', ' ',
                             'g')) AS norm,
         len(list_filter(string_split(coalesce(text, ''), '.'),
                         x -> trim(x) <> '')) AS n_sents
  FROM documents
),
cnt AS (
  SELECT doc_id,
         len(regexp_extract_all(norm, '[a-z0-9]+')) AS n_words,
         len(regexp_extract_all(norm, '[aeiou]+')) AS n_syll,
         n_sents
  FROM base
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sents AS BIGINT) AS n_sents,
       CAST(n_syll AS BIGINT) AS n_syll,
       CAST((39000 * n_words) // n_sents
            + (118000 * n_syll) // n_words - 155900 AS BIGINT) AS rd_x
FROM cnt WHERE n_words > 0 AND n_sents > 0
"""


# sentence key = doc_id * SENT_FACTOR + sent_idx: zero-padded as url it
# sorts numerically, so sentence tie-breaks = (doc_id, sent_idx) order
SENT_FACTOR = 100_000


def check_sent_key_bounds(doc_id: int, sent_idx: int) -> None:
    """sent_key = doc_id*SENT_FACTOR + sent_idx relies on DOCID_PAD-width
    zero-padding so (score desc, url asc) tie-breaks equal numeric sk
    order; overflow would SILENTLY corrupt rank parity with the oracle's
    ``sk ASC`` — fail loudly instead."""
    from ..sources.corpus import DOCID_PAD

    max_doc_id = 10 ** (DOCID_PAD - len(str(SENT_FACTOR - 1)))
    if doc_id >= max_doc_id:
        raise ValueError(
            f"doc_id {doc_id} >= {max_doc_id}: sent_key would exceed "
            f"{DOCID_PAD} digits and break url tie-break order "
            "(raise DOCID_PAD or change the SENT_FACTOR layout)"
        )
    if sent_idx >= SENT_FACTOR:
        raise ValueError(
            f"doc {doc_id} has sent_idx {sent_idx} >= {SENT_FACTOR}: "
            "sent_key collides with the next doc_id"
        )


def _sentence_factory(sf_dir: str):
    """Input factory for a SENTENCE-granularity index: the corpus rows are
    the sentences of q_sentences (same split semantics), keyed by
    sent_key = doc_id * SENT_FACTOR + sent_idx."""
    from ..sources.corpus import docid_to_url

    def factory(columns=None):
        ds = _docs(sf_dir)

        def split(t: pa.Table) -> pa.Table:
            sel, sidx, sents = _vector_split_sentences(t)
            doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            # key-layout invariants checked ONCE per batch on the extrema
            if len(doc_ids):
                check_sent_key_bounds(int(doc_ids.max()), 0)
            if len(sidx) and int(sidx.max()) >= SENT_FACTOR:
                j = int(np.argmax(sidx))
                check_sent_key_bounds(int(doc_ids[sel[j]]), int(sidx[j]))
            keys = doc_ids[sel] * SENT_FACTOR + sidx
            sel_arr = pa.array(sel)
            out = pa.table(
                {
                    "url": docid_to_url(pa.array(keys, pa.int64())),
                    "text": sents,
                    "lang": pc.take(t["lang"], sel_arr),
                }
            )
            if columns is not None:
                out = out.select(list(columns))
            return out

        return ds.map_batches(split, batch_format="pyarrow")

    return factory


def _sentence_index_for(sf_dir: str) -> str:
    from .build_index import build_index

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = f"/tmp/drr_cache/{key}/sent_index"
    cfg = IndexConfig(
        tokenizer=TokenizerConfig(mode="simple"),
        num_hash_parts=16,
        hot_term_threshold=200,
        salt_shift=8,
        block_size=128,
    )
    build_index(
        f"{sf_dir}/documents.parquet::sentences",
        index_dir,
        cfg=cfg,
        with_cosine_norms=False,
        input_ds_factory=_sentence_factory(sf_dir),
    )
    return index_dir


def q_sentence_bm25(sf_dir: str):
    """M6+J6+D3 end-to-end sentence retrieval (team_run1.py:80-99,285-295):
    a sentence-granularity index (reusing the whole build pipeline with
    sent_key docs) → top-100 sentences per query (reference-compat BM25) →
    ordered first-occurrence doc dedup → top-10 docs, carrying the best
    sentence's score."""
    from .query import bm25_search

    index_dir = _sentence_index_for(sf_dir)
    res = bm25_search(
        _query_ds(), index_dir,
        cfg=BM25Config(k1=1.5, b=0.75, idf="lucene", compat="reference", k=100),
        round_dp=4,
    )

    # DISTRIBUTED dedup tail (no driver to_pandas of the k=100 stream):
    # hash-partition by query_id — every row of one query lands in one
    # partition, so the ordered first-occurrence dedup + top-10 re-rank is
    # exact per partition (the qpart merge_partition pattern of
    # pipelines/sharded.py).
    def dedup_tail(g: pd.DataFrame) -> pd.DataFrame:
        if "kpart" in g.columns:
            g = g.drop(columns=["kpart"])
        g = g.copy()
        g["doc_id"] = g["url"].astype(np.int64) // SENT_FACTOR
        g = g.sort_values(["query_id", "rank"])
        out = g.drop_duplicates(["query_id", "doc_id"], keep="first")
        out = out.groupby("query_id", sort=True).head(10).copy()
        out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
        return out[["query_id", "rank", "doc_id", "score_x"]].reset_index(
            drop=True
        )

    return (
        res.map_batches(
            add_kpart,
            fn_kwargs={"num_parts": 16, "cols": ("query_id",)},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(dedup_tail, batch_format="pandas")
    )


def q_train_test_split(sf_dir: str):
    """K5 deterministic split (bm25_ranking.ipynb cell 4 analog): ~10%
    'test' by md5(doc_id) prefix — reproducible hash split, no RNG."""
    from ..functions.hashing import md5_hex

    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        split = [
            "test" if md5_hex(str(i))[:2] < "1a" else "train" for i in ids
        ]
        return pa.table({"split": pa.array(split, pa.string())})

    ds = _docs(sf_dir).map_batches(tag, batch_format="pyarrow")
    out = ds.groupby("split").count()
    return out.map_batches(
        lambda t: t.rename_columns(["split", "n_docs"]), batch_format="pyarrow"
    )


def q_eval_metrics(sf_dir: str):
    """J5/A9 evaluation join + metrics (bm25_ranking.ipynb cell 5,
    team_run1.py:305-325): binary relevance = docs of the query's language
    containing EVERY distinct query term; recall-hits in the BM25 top-10
    and MRR per query.

    Distributed: the tiny query-term table is captured in the match
    closure; relevance labeling is a filtered map over the postings
    stream + a (query_id, doc_id) groupby; the top-10 result list (80
    rows) is the broadcast side of the hit join. The driver only touches
    per-QUERY aggregates (≤ |QUERYSET| rows)."""
    results = q_bm25_reference(sf_dir)

    qterms: dict = {}
    n_terms: dict = {}
    for qid, qtext, lang in QUERYSET:
        terms = sorted(set(tokenize_simple(qtext)))
        n_terms[qid] = len(terms)
        for t in terms:
            qterms.setdefault((lang, t), []).append(qid)
    keyset = pa.array([f"{l}\x00{t}" for (l, t) in qterms], pa.string())

    def match(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["lang"], pa.string()), pc.cast(t["term"], pa.string()), "\x00"
        )
        t2 = t.filter(pc.is_in(key, value_set=keyset))
        docs = url_to_docid(t2["url"]).to_pylist()
        out_q, out_d = [], []
        for l, tm, d in zip(
            t2["lang"].to_pylist(), t2["term"].to_pylist(), docs
        ):
            for qid in qterms[(l, tm)]:
                out_q.append(qid)
                out_d.append(d)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
            }
        )

    relc = (
        _postings_ds(sf_dir)
        .map_batches(match, batch_format="pyarrow")
        .groupby(["query_id", "doc_id"])
        .count()
    )

    _SENTINEL = 1 << 30
    res_rank = {
        (r.query_id, r.doc_id): int(r.rank) for r in results.itertuples()
    }

    def rel_hits(t: pa.Table) -> pa.Table:
        qs = t["query_id"].to_pylist()
        ds = t["doc_id"].to_numpy(zero_copy_only=False)
        cnt = t["count()"].to_numpy(zero_copy_only=False)
        need = np.array([n_terms[q] for q in qs], dtype=np.int64)
        keep = np.nonzero(cnt == need)[0]
        ranks = np.array(
            [res_rank.get((qs[i], int(ds[i])), _SENTINEL) for i in keep],
            dtype=np.int64,
        )
        return pa.table(
            {
                "query_id": pa.array([qs[i] for i in keep], pa.string()),
                "hit": pa.array((ranks < _SENTINEL).astype(np.int64), pa.int64()),
                "hit_rank": pa.array(ranks, pa.int64()),
            }
        )

    agg = (
        relc.map_batches(rel_hits, batch_format="pyarrow")
        .groupby("query_id")
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_relevant"),
            ray.data.aggregate.Sum("hit", alias_name="hits_at_10"),
            ray.data.aggregate.Min("hit_rank", alias_name="first_rel"),
        )
        .to_pandas()
    )
    by_q = {r.query_id: r for r in agg.itertuples()}
    rows = []
    for qid, _qtext, _lang in QUERYSET:
        r = by_q.get(qid)
        first = int(r.first_rel) if r is not None else _SENTINEL
        mrr = (1.0 / first) if first < _SENTINEL else 0.0
        rows.append(
            {
                "query_id": qid,
                "n_relevant": int(r.n_relevant) if r is not None else 0,
                "hits_at_10": int(r.hits_at_10) if r is not None else 0,
                "mrr_x": int(np.floor(mrr * 10000 + 0.5)),
            }
        )
    return pd.DataFrame(rows, columns=["query_id", "n_relevant", "hits_at_10", "mrr_x"])


# phrase queries for q_phrase_search: (phrase_id, phrase text); tokenized
# with the same simple tokenizer as the corpus. p2 exercises repeated
# terms + overlapping matches ("batch batch batch" → 2 matches).
PHRASESET = [
    ("p1", "table scan"),
    ("p2", "batch batch"),
    ("p3", "big order scan"),
]

# session boundary: a gap of MORE than 24h starts a new session
SESSION_GAP_US = 24 * 3600 * 1_000_000


def q_phrase_search(sf_dir: str):
    """Phrase search by positional intersection — a fulltext feature the
    reference's bag-of-words index cannot express (its tf dicts drop
    positions: final_implementation.py:89-117 keeps only counts).

    Fully distributed with ZERO shuffle: every document lives in exactly
    one batch, so the per-batch scan emits final (phrase_id, doc_id,
    n_matches) rows directly. The kernel is vectorized end-to-end: the
    batch's tokens become ONE flat numpy array with a parent-row index;
    a phrase of length L is L shifted equality masks AND-ed together,
    with a parent[i] == parent[i+L-1] guard so matches never cross
    document boundaries. Repeated-term phrases and overlapping
    occurrences are correct by construction (each start offset is
    tested independently)."""
    phrases = [(pid, p.split()) for pid, p in PHRASESET]

    def scan(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        low = pc.utf8_lower(text)
        spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        trimmed = pc.utf8_trim_whitespace(spaced)
        toks = pc.split_pattern(trimmed, " ")
        parent, flat = flatten_tokens(pa.table({"tokens": toks}), "tokens")
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(flat)
        out_pid, out_doc, out_cnt = [], [], []
        for pid, words in phrases:
            L = len(words)
            if n < L:
                continue
            m = flat[: n - L + 1] == words[0]
            for j in range(1, L):
                m &= flat[j : n - L + 1 + j] == words[j]
            if L > 1:
                m &= parent[: n - L + 1] == parent[L - 1 :]
            starts = np.nonzero(m)[0]
            if len(starts) == 0:
                continue
            cnt = np.bincount(parent[starts], minlength=len(t))
            hit = np.nonzero(cnt)[0]
            out_pid.extend([pid] * len(hit))
            out_doc.append(doc_ids[hit])
            out_cnt.append(cnt[hit])
        return pa.table(
            {
                "phrase_id": pa.array(out_pid, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(out_doc) if out_doc else [], pa.int64()
                ),
                "n_matches": pa.array(
                    np.concatenate(out_cnt) if out_cnt else [], pa.int64()
                ),
            }
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(scan, batch_format="pyarrow")


def q_phrase_search_indexed(sf_dir: str):
    """Index-backed phrase search: same semantics (and SQL oracle) as
    q_phrase_search but answered from the positional-postings artifact —
    the query reads ONLY the term-hash partitions of the phrase terms,
    never the corpus (pipelines/positional.py). The parity run proves
    scan ≡ index."""
    from .positional import build_positional_index, phrase_query

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = f"/tmp/drr_cache/{key}/posindex"
    build_positional_index(f"{sf_dir}/documents.parquet", index_dir, num_parts=32)
    return phrase_query(index_dir, PHRASESET)


# boolean queries: (bool_id, must-have terms, must-not-have terms)
BOOLSET = [
    ("b1", ("hash", "join"), ("batch",)),
    ("b2", ("table",), ("scan",)),
    ("b3", ("group", "query", "row"), ()),
]


def q_bool_search(sf_dir: str):
    """Boolean retrieval (AND / AND NOT over term presence) — the
    classic set-model fulltext query. Zero-shuffle scan: per-batch
    presence masks via bincount over the flat token array, one boolean
    combine per query; a doc's verdict is final within its batch."""

    def scan(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        low = pc.utf8_lower(text)
        spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        trimmed = pc.utf8_trim_whitespace(spaced)
        toks = pc.split_pattern(trimmed, " ")
        parent, flat = flatten_tokens(pa.table({"tokens": toks}), "tokens")
        n = len(t)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)

        def present(term: str) -> np.ndarray:
            hits = parent[flat == term]
            return np.bincount(hits, minlength=n) > 0

        out_bid, out_doc = [], []
        for bid, must, must_not in BOOLSET:
            m = np.ones(n, dtype=bool)
            for w in must:
                m &= present(w)
            for w in must_not:
                m &= ~present(w)
            hit = np.nonzero(m)[0]
            out_bid.extend([bid] * len(hit))
            out_doc.append(doc_ids[hit])
        return pa.table(
            {
                "bool_id": pa.array(out_bid, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(out_doc) if out_doc else [], pa.int64()
                ),
            }
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(scan, batch_format="pyarrow")


def _bool_sql() -> str:
    selects = []
    for bid, must, must_not in BOOLSET:
        conds = [f"list_contains(l, '{w}')" for w in must]
        conds += [f"NOT list_contains(l, '{w}')" for w in must_not]
        selects.append(
            f"SELECT '{bid}' AS bool_id, doc_id FROM toks WHERE "
            + " AND ".join(conds)
        )
    return (
        f"WITH {_TOKS_CTE}\n" + "\nUNION ALL\n".join(selects)
    )


SNIPPET_CTX = 2  # tokens of context on each side of a phrase match


def q_phrase_snippets(sf_dir: str):
    """KWIC snippet generation: for every phrase match, the tokens
    around the FIRST occurrence in the doc (SNIPPET_CTX each side,
    space-joined). Zero-shuffle like q_phrase_search — a doc's snippet
    is final within its batch; the per-doc work after the vectorized
    match scan is a bounded join over <= L + 2·CTX tokens per MATCHING
    doc (matches, not corpus, bound the Python)."""
    phrases = [(pid, p.split()) for pid, p in PHRASESET]

    def scan(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        low = pc.utf8_lower(text)
        spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        trimmed = pc.utf8_trim_whitespace(spaced)
        toks = pc.split_pattern(trimmed, " ").combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = toks.values
        s0 = offsets[0]
        if s0 != 0 or len(values) != offsets[-1]:
            values = values.slice(s0, offsets[-1] - s0)
            offsets = offsets - s0
        lens = np.diff(offsets)
        parent = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
        flat = np.asarray(values.to_pandas(), dtype=object)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(flat)
        out_pid, out_doc, out_snip = [], [], []
        for pid, words in phrases:
            L = len(words)
            if n < L:
                continue
            m = flat[: n - L + 1] == words[0]
            for j in range(1, L):
                m &= flat[j : n - L + 1 + j] == words[j]
            if L > 1:
                m &= parent[: n - L + 1] == parent[L - 1 :]
            starts = np.nonzero(m)[0]
            if len(starts) == 0:
                continue
            # first occurrence per doc: starts are ascending, so the
            # first index of each parent run wins
            docs_at = parent[starts]
            first = np.ones(len(starts), dtype=bool)
            first[1:] = docs_at[1:] != docs_at[:-1]
            for s in starts[first]:
                d = parent[s]
                tok0 = offsets[d]
                rel = s - tok0
                lo = tok0 + max(rel - SNIPPET_CTX, 0)
                hi = min(tok0 + rel + L + SNIPPET_CTX, offsets[d + 1])
                out_pid.append(pid)
                out_doc.append(doc_ids[d])
                out_snip.append(" ".join(flat[lo:hi]))
        return pa.table(
            {
                "phrase_id": pa.array(out_pid, pa.string()),
                "doc_id": pa.array(
                    np.asarray(out_doc, dtype=np.int64)
                    if out_doc
                    else [],
                    pa.int64(),
                ),
                "snippet": pa.array(out_snip, pa.string()),
            }
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(scan, batch_format="pyarrow")


RRF_K = 60  # standard reciprocal-rank-fusion constant


def q_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion of the BM25(standard)
    and TF-IDF-cosine top-10 rankings — rrf = Σ 1/(60 + rank), fixed
    point 1e6, ties → doc_id asc, top-10 per query.

    Both input rankings are the existing distributed pipelines; the
    fusion itself is bounded at O(|queries| × 20) rows, so driver
    pandas is the right tool (same argument as q_submission)."""

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["query_id", "doc_id"]].copy()
        out["rrf_x"] = np.floor(
            1_000_000.0 / (RRF_K + df["rank"].to_numpy(np.float64)) + 0.5
        ).astype(np.int64)
        return out

    allr = pd.concat(
        [contrib(q_bm25_standard(sf_dir)), contrib(q_cosine(sf_dir))]
    )
    f = (
        allr.groupby(["query_id", "doc_id"], sort=False)["rrf_x"]
        .sum()
        .reset_index()
    )
    f = f.sort_values(
        ["query_id", "rrf_x", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    f = f.groupby("query_id", sort=False).head(10).reset_index(drop=True)
    f["rank"] = (f.groupby("query_id", sort=False).cumcount() + 1).astype(
        np.int64
    )
    return f[["query_id", "rank", "doc_id", "rrf_x"]]


def q_tfidf_keywords(sf_dir: str):
    """Per-document keyword extraction: top-3 terms per doc by
    tf·idf (idf law (a), fixed-point 1e4, ties → term asc).

    Scale path end-to-end, ONE corpus scan: the (lang, term)-hash
    COGROUP colocates every posting row of a term, so df is just the
    group size computed in place (a (doc, term) pair appears exactly
    once) — no df pipeline, no second tokenization, nothing
    vocabulary-sized broadcast or driver-held. A doc_id-hash partition
    then takes each doc's top-3. Only the per-lang doc-count dict
    (|langs| entries, from a thin 1-column scan) rides the closure."""
    stats = {
        r["lang"]: r["count()"]
        for r in read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["lang"]
        )
        .groupby("lang")
        .count()
        .take_all()
    }

    def tok_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": url_to_docid(t["url"]),
                "lang": t["lang"],
                "term": t["term"],
                "tf": t["tf"],
            }
        )

    tok = _postings_ds(sf_dir).map_batches(tok_rows, batch_format="pyarrow")

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "term": pd.Series(dtype=object),
                    "tfidf_x": pd.Series(dtype="int64"),
                }
            )
        dfv = (
            g.groupby(["lang", "term"], sort=False)["doc_id"]
            .transform("size")
            .to_numpy(np.float64)
        )
        N = g["lang"].map(stats).to_numpy(np.float64)
        idf = np.log(1.0 + (N - dfv + 0.5) / (dfv + 0.5))
        out = g[["doc_id", "term"]].copy()
        out["tfidf_x"] = np.floor(
            g["tf"].to_numpy(np.float64) * idf * 10000.0 + 0.5
        ).astype(np.int64)
        return out

    scored = _parted(tok, ("lang", "term")).map_groups(
        attach, batch_format="pandas"
    )

    def doc_top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "tfidf_x", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.groupby("doc_id", sort=False).head(3).reset_index(drop=True)
        g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
        return g[["doc_id", "rank", "term", "tfidf_x"]]

    return _parted(scored, ("doc_id",)).map_groups(
        doc_top, batch_format="pandas"
    )


def q_top_bigrams(sf_dir: str):
    """Collocation mining: top-10 adjacent word bigrams per language by
    total count (ties → bigram asc). Vectorized bigram construction
    (shifted Arrow join on the flat token array, parent-equality guard),
    per-batch partial counts, ONE vocabulary-sized groupby, per-block
    partial top-10 → bounded driver merge."""

    def partial(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        low = pc.utf8_lower(text)
        spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        trimmed = pc.utf8_trim_whitespace(spaced)
        toks = pc.split_pattern(trimmed, " ").combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = toks.values
        s0 = offsets[0]
        if s0 != 0 or len(values) != offsets[-1]:
            values = values.slice(s0, offsets[-1] - s0)
            offsets = offsets - s0
        n = len(values)
        if n < 2:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "bigram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        lens = np.diff(offsets)
        parent = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
        nonempty = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
        keep = (parent[:-1] == parent[1:]) & nonempty[:-1] & nonempty[1:]
        big = pc.binary_join_element_wise(
            values.slice(0, n - 1), values.slice(1, n - 1), " "
        )
        langs_np = np.asarray(
            t["lang"].to_pandas(), dtype=object
        )[parent[:-1][keep]]
        pdf = pd.DataFrame(
            {
                "lang": langs_np,
                "bigram": np.asarray(big.to_pandas(), dtype=object)[keep],
            }
        )
        g = (
            pdf.groupby(["lang", "bigram"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    def partial_top(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        return from_pandas_clean(
            pdf.sort_values(
                ["lang", "n", "bigram"], ascending=[True, False, True]
            ).groupby("lang", sort=False).head(10),
            preserve_index=False,
        )

    rows = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "bigram"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["lang", "bigram", "n"]),
            batch_format="pyarrow",
        )
        .map_batches(partial_top, batch_format="pyarrow")
        .to_pandas()
    )
    top = (
        rows.sort_values(["lang", "n", "bigram"], ascending=[True, False, True])
        .groupby("lang", sort=False)
        .head(10)
        .reset_index(drop=True)
    )
    top["rank"] = top.groupby("lang", sort=False).cumcount() + 1
    top["n"] = top["n"].astype(np.int64)
    return top[["lang", "rank", "bigram", "n"]]


# NEAR pairs for q_near_search: (pair_id, term_a, term_b); a doc matches
# when the terms co-occur within NEAR_WINDOW tokens (unordered)
NEARSET = [
    ("n1", "hash", "join"),
    ("n2", "table", "scan"),
    ("n3", "group", "query"),
]
NEAR_WINDOW = 3

# prefixes for q_prefix_search: (prefix_id, prefix) — wildcard term
# expansion `prefix*`, scored by total matched-term tf per doc
PREFIXSET = [("pf1", "sc"), ("pf2", "ba"), ("pf3", "st")]


def q_near_search(sf_dir: str):
    """Index-backed proximity (NEAR) search over the positional index:
    for each (term_a, term_b) pair, every doc where they co-occur within
    NEAR_WINDOW tokens, with the co-occurrence pair count. Reads only
    the two terms' partition dirs; per-partition kernel is sorted
    packed-key range counting (positional.py:_near_match_partition)."""
    from .positional import build_positional_index, proximity_query

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = f"/tmp/drr_cache/{key}/posindex"
    build_positional_index(f"{sf_dir}/documents.parquet", index_dir, num_parts=32)
    return proximity_query(index_dir, NEARSET, NEAR_WINDOW)


def q_prefix_search(sf_dir: str):
    """Wildcard term expansion (`prefix*`) with per-doc tf scoring and
    global top-10 per prefix. Scan-based and shuffle-free until the final
    merge: a doc lives in one batch, so per-batch (prefix, doc, tf) rows
    are final; each block then keeps its partial top-10 per prefix and
    the driver merges O(blocks × |prefixes| × 10) rows."""

    def scan(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        low = pc.utf8_lower(text)
        spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        trimmed = pc.utf8_trim_whitespace(spaced)
        toks = pc.split_pattern(trimmed, " ").combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = toks.values
        s0 = offsets[0]
        if s0 != 0 or len(values) != offsets[-1]:
            values = values.slice(s0, offsets[-1] - s0)
            offsets = offsets - s0
        lens = np.diff(offsets)
        parent = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_pid, out_doc, out_tf = [], [], []
        nonempty = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
        for pid, prefix in PREFIXSET:
            m = pc.starts_with(values, prefix).to_numpy(zero_copy_only=False)
            m &= nonempty
            if not m.any():
                continue
            cnt = np.bincount(parent[m], minlength=len(t))
            hit = np.nonzero(cnt)[0]
            out_pid.extend([pid] * len(hit))
            out_doc.append(doc_ids[hit])
            out_tf.append(cnt[hit])
        return pa.table(
            {
                "prefix_id": pa.array(out_pid, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(out_doc) if out_doc else [], pa.int64()
                ),
                "total_tf": pa.array(
                    np.concatenate(out_tf) if out_tf else [], pa.int64()
                ),
            }
        )

    def partial_top(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        return from_pandas_clean(
            pdf.sort_values(
                ["prefix_id", "total_tf", "doc_id"],
                ascending=[True, False, True],
            ).groupby("prefix_id", sort=False).head(10),
            preserve_index=False,
        )

    rows = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(scan, batch_format="pyarrow")
        .map_batches(partial_top, batch_format="pyarrow")
        .to_pandas()
    )
    top = (
        rows.sort_values(
            ["prefix_id", "total_tf", "doc_id"], ascending=[True, False, True]
        )
        .groupby("prefix_id", sort=False)
        .head(10)
        .reset_index(drop=True)
    )
    top["rank"] = top.groupby("prefix_id", sort=False).cumcount() + 1
    return top[["prefix_id", "rank", "doc_id", "total_tf"]]


def _session_partition(group: pd.DataFrame) -> pd.DataFrame:
    """user_id-hash partition of prepped events → per-session aggregates.
    Vectorized: lexsort by (user, ts, event_id), boundary mask where the
    user changes or the gap exceeds SESSION_GAP_US, then reduceat sums —
    no per-user Python loop."""
    cols = ("user_id", "session_idx", "start_us", "end_us", "n_events", "value_c")
    if len(group) == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    u = group["user_id"].to_numpy(np.int64)
    t = group["tsu"].to_numpy(np.int64)
    e = group["event_id"].to_numpy(np.int64)
    v = group["value_c"].to_numpy(np.int64)
    order = np.lexsort((e, t, u))
    u, t, v = u[order], t[order], v[order]
    new = np.ones(len(u), dtype=bool)
    if len(u) > 1:
        new[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > SESSION_GAP_US)
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(u)) - 1
    su = u[starts]
    # session_idx = 1-based ordinal of the session within its user
    pos = np.arange(len(starts))
    user_first = np.ones(len(starts), dtype=bool)
    user_first[1:] = su[1:] != su[:-1]
    first_pos = np.maximum.accumulate(np.where(user_first, pos, 0))
    return pd.DataFrame(
        {
            "user_id": su,
            "session_idx": pos - first_pos + 1,
            "start_us": t[starts],
            "end_us": t[ends],
            "n_events": ends - starts + 1,
            "value_c": np.add.reduceat(v, starts),
        }
    ).astype("int64")


def q_sessionize(sf_dir: str):
    """Gap-based sessionization — the streaming-window operator Ray Data
    lacks: a user's events share a session while consecutive gaps stay
    <= 24h; emits per-session (start, end, n_events, value cents).

    Distributed as a user_id-hash cogroup (the rel_asof plan): all
    events of a user colocate in one partition; the per-partition kernel
    is fully vectorized. Partitioning assumption (documented): one
    user's event timeline fits a partition — a degenerate user would
    need time-range bucketing with boundary stitching of open sessions
    across bucket edges."""
    ev = _events(sf_dir, columns=["event_id", "ts", "user_id", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                # exact integer epoch-micros + fixed-point cents so the
                # gap test and sums are integral end-to-end
                "tsu": pc.cast(t["ts"], pa.int64()),
                "value_c": pa.array(
                    _cents(t["value"].to_numpy(zero_copy_only=False)), pa.int64()
                ),
            }
        )

    return _parted(ev.map_batches(prep, batch_format="pyarrow"),
                   ("user_id",)).map_groups(
        _session_partition, batch_format="pandas"
    )


DAY_US = 86_400_000_000


def _retention_partition(group: pd.DataFrame) -> pd.DataFrame:
    """user_id-hash partition → distinct (cohort_day, day_offset) rows
    per user: cohort = the user's first active day, offsets = its other
    active days relative to it. Emitted rows are already distinct per
    user, so the downstream count is a plain sum."""
    g = group.drop(columns=[c for c in ("kpart",) if c in group.columns])
    users = g["user_id"].to_numpy(np.int64)
    days = g["tsu"].to_numpy(np.int64) // DAY_US
    pdf = pd.DataFrame({"u": users, "d": days}).drop_duplicates()
    coh = pdf.groupby("u", sort=False)["d"].transform("min")
    out = pd.DataFrame({
        "cohort_day": coh.to_numpy(np.int64),
        "day_offset": pdf["d"].to_numpy(np.int64) - coh.to_numpy(np.int64),
    })
    return out.astype({"cohort_day": "int64", "day_offset": "int64"})


def q_retention(sf_dir: str):
    """Cohort retention: users bucketed by their first active day, and
    for each (cohort, day-offset) the number of cohort users active that
    day — the standard growth-analytics triangle. ONE user_id-hash
    exchange; per-user rows are distinct by construction so the final
    (cohort, offset) count is a tiny integer groupby."""
    ev = _events(sf_dir, columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "tsu": pc.cast(t["ts"], pa.int64()),
        })

    rows = _arrow_blocks(
        _parted(ev.map_batches(prep, batch_format="pyarrow"),
                ("user_id",)).map_groups(
            _retention_partition, batch_format="pandas"))
    out = rows.groupby(["cohort_day", "day_offset"]).count().to_pandas()
    out.columns = ["cohort_day", "day_offset", "n_users"]
    return out.astype({"cohort_day": "int64", "day_offset": "int64",
                       "n_users": "int64"})


_RETENTION_SQL = f"""
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
),
c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id)
SELECT c.cohort AS cohort_day, d.day - c.cohort AS day_offset,
       count(*) AS n_users
FROM d JOIN c ON c.user_id = d.user_id
GROUP BY c.cohort, d.day - c.cohort
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_partition(group: pd.DataFrame) -> pd.DataFrame:
    """user_id-hash partition → (user_id, depth): the number of funnel
    steps completed IN ORDER (each step's event strictly after the
    previous step's earliest qualifying time). Vectorized: one per-user
    min per step via a masked groupby, chained through a map."""
    g = group.drop(columns=[c for c in ("kpart",) if c in group.columns])
    users = g["user_id"].to_numpy(np.int64)
    types = g["event_type"].to_numpy(dtype=object)
    tsu = g["tsu"].to_numpy(np.int64)
    uniq = np.unique(users)
    prev = {int(u): -(2 ** 62) for u in uniq}
    depth = {int(u): 0 for u in uniq}
    for si, step in enumerate(FUNNEL_STEPS, 1):
        m = types == step
        if not m.any():
            break
        su, st = users[m], tsu[m]
        thr = np.fromiter((prev[int(u)] for u in su), np.int64, len(su))
        ok = (st > thr) & np.fromiter(
            (depth[int(u)] == si - 1 for u in su), bool, len(su)
        )
        if not ok.any():
            break
        pdf = pd.DataFrame({"u": su[ok], "t": st[ok]})
        mins = pdf.groupby("u", sort=False)["t"].min()
        for u, t in mins.items():
            prev[int(u)] = int(t)
            depth[int(u)] = si
    return pd.DataFrame({
        "user_id": pd.Series(uniq, dtype="int64"),
        "depth": pd.Series([depth[int(u)] for u in uniq], dtype="int64"),
    })


def q_funnel(sf_dir: str):
    """Ordered funnel analysis (view → click → purchase): how many users
    complete each prefix of the step sequence, each step strictly after
    the previous step's first qualifying event — the classic sequential
    event-analytics op Ray Data has no primitive for. ONE user_id-hash
    exchange of (user, type, ts) rows; per-user logic vectorized in the
    partition kernel; output is |steps| rows."""
    ev = _events(sf_dir, columns=["user_id", "event_type", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(list(FUNNEL_STEPS)))
        t = t.filter(keep)
        return pa.table({
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "tsu": pc.cast(t["ts"], pa.int64()),
        })

    depths = _arrow_blocks(
        _parted(ev.map_batches(prep, batch_format="pyarrow"),
                ("user_id",)).map_groups(
            _funnel_partition, batch_format="pandas"))
    counts = depths.groupby("depth").count().to_pandas()  # ≤ |steps|+1 rows
    by_depth = dict(zip(counts["depth"].astype(int),
                        counts["count()"].astype(int)))
    rows = []
    for si, step in enumerate(FUNNEL_STEPS, 1):
        n = sum(v for d, v in by_depth.items() if d >= si)
        rows.append({"step": si, "event_type": step, "n_users": n})
    out = pd.DataFrame(rows)
    return out.astype({"step": "int64", "n_users": "int64"})


_FUNNEL_SQL = f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS ts FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id AS user_id, min(e.ts) AS ts
  FROM events e JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.ts
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id AS user_id, min(e.ts) AS ts
  FROM events e JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.ts
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS step, '{FUNNEL_STEPS[0]}' AS event_type,
       (SELECT count(*) FROM t1) AS n_users
UNION ALL SELECT 2, '{FUNNEL_STEPS[1]}', (SELECT count(*) FROM t2)
UNION ALL SELECT 3, '{FUNNEL_STEPS[2]}', (SELECT count(*) FROM t3)
"""


WINDOW_US = 3_600_000_000  # 1h tumbling window


def q_window_tumble(sf_dir: str):
    """Tumbling-window aggregate (1 h) over the event stream: per
    (event_type, window) event count, exact value cents, and distinct
    users — the batch form of a streaming tumbling window (the engine's
    windows are data-defined buckets, not wall-clock triggers).

    Distributed plan: per-batch PARTIAL aggregation collapses each batch
    to one row per (event_type, window, user_id) — counts and cents sum
    exactly across batches, and the user dimension travels only as
    per-batch-distinct (key, user) pairs (2-phase distinct) — then ONE
    (event_type, window)-keyed exchange of partials feeds a vectorized
    per-partition finalize. Nothing is broadcast; the exchange is
    bounded by distinct (key, user) pairs, not the event count."""
    ev = _events(sf_dir,
        columns=["ts", "event_type", "user_id", "value"],
    )

    def partial(t: pa.Table) -> pa.Table:
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "ws_us": (tsu // WINDOW_US) * WINDOW_US,
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "value_c": _cents(t["value"].to_numpy(zero_copy_only=False)),
            }
        )
        g = (
            df.groupby(["event_type", "ws_us", "user_id"], sort=False)
            .agg(n=("value_c", "size"), value_c=("value_c", "sum"))
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["event_type", "ws_us"], sort=False)
            .agg(n=("n", "sum"), value_c=("value_c", "sum"),
                 users=("user_id", "nunique"))
            .reset_index()
        )

    parts = ev.map_batches(partial, batch_format="pyarrow")
    return _parted(parts, ("event_type", "ws_us")).map_groups(
        finalize, batch_format="pandas"
    )


HOP_US = 1_800_000_000  # 30 min hop; window stays WINDOW_US (1 h)


def q_window_hop(sf_dir: str):
    """HOPPING (sliding) window aggregate: 1 h windows advancing every
    30 min, so each event lands in exactly WINDOW/HOP = 2 windows. Same
    2-phase plan as the tumbling window — the per-batch partial just
    replicates each event to its R member windows before collapsing, so
    the exchange grows by R, never by the event count × window length."""
    ev = _events(sf_dir, columns=["ts", "event_type", "value"]
    )
    r = WINDOW_US // HOP_US

    def partial(t: pa.Table) -> pa.Table:
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        types = np.asarray(t["event_type"].to_pandas(), dtype=object)
        cents = _cents(t["value"].to_numpy(zero_copy_only=False))
        frames = []
        for j in range(r):
            ws = (tsu // HOP_US - j) * HOP_US
            keep = ws >= 0
            frames.append(pd.DataFrame({
                "event_type": types[keep], "ws_us": ws[keep],
                "n": 1, "value_c": cents[keep],
            }))
        df = pd.concat(frames, ignore_index=True)
        g = (
            df.groupby(["event_type", "ws_us"], sort=False)
            .agg(n=("n", "sum"), value_c=("value_c", "sum"))
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[c for c in ("kpart",) if c in g.columns])
        return (
            g.groupby(["event_type", "ws_us"], sort=False)
            .agg(n=("n", "sum"), value_c=("value_c", "sum"))
            .reset_index()
            .astype({"ws_us": "int64", "n": "int64", "value_c": "int64"})
        )

    parts = ev.map_batches(partial, batch_format="pyarrow")
    return _parted(parts, ("event_type", "ws_us")).map_groups(
        finalize, batch_format="pandas"
    )


_WINDOW_HOP_SQL = f"""
SELECT event_type,
       ((epoch_us(ts) // {HOP_US}) - j.j) * {HOP_US} AS ws_us,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
       AS value_c
FROM events, (SELECT unnest(range(0, {WINDOW_US // HOP_US})) AS j) j
WHERE ((epoch_us(ts) // {HOP_US}) - j.j) * {HOP_US} >= 0
GROUP BY event_type, ws_us
"""


PMI_TOP_V = 50  # per-lang candidate vocabulary (top df terms)
PMI_MIN_CO = 2  # minimum doc co-occurrence for a pair to score


def q_pmi_pairs(sf_dir: str):
    """Doc-level PMI collocations: top-10 term pairs per language by
    pointwise mutual information ln(n_xy·N / (n_x·n_y)), counting
    document co-occurrence among each language's top-50 df terms.

    Scale shape: candidates come from the distributed df table via
    per-block partial top-V → one tiny driver merge (V×langs rows), so
    the pair space is bounded at C(V,2) per lang regardless of corpus
    size; the candidate set broadcasts once (`ray.put`); per-batch
    vectorized self-merge emits partial pair counts (≤ C(V,2) rows per
    batch after the in-batch groupby) and ONE vocabulary-bounded
    exchange sums them."""
    # per-lang N (thin 1-column scan) and top-V candidates by (df desc,
    # term asc)
    n_by_lang = {
        r["lang"]: int(r["count()"])
        for r in read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["lang"]
        )
        .groupby("lang")
        .count()
        .take_all()
    }

    def ptop(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        return from_pandas_clean(
            pdf.sort_values(["lang", "df", "term"],
                            ascending=[True, False, True])
            .groupby("lang", sort=False)
            .head(PMI_TOP_V),
            preserve_index=False,
        )

    cand = (
        q_term_df(sf_dir)
        .map_batches(ptop, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["lang", "df", "term"], ascending=[True, False, True])
        .groupby("lang", sort=False)
        .head(PMI_TOP_V)
    )
    sel_ref = ray.put(cand[["lang", "term", "df"]])

    class PairCounts:
        def __init__(self):
            self.sel = ray.get(sel_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            text = pc.cast(t["text"], pa.string())
            low = pc.utf8_lower(text)
            spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
            trimmed = pc.utf8_trim_whitespace(spaced)
            toks = pc.split_pattern(trimmed, " ").combine_chunks()
            lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
            parent = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
            vals = np.asarray(toks.values.to_pandas(), dtype=object)
            langs = np.asarray(t["lang"].to_pandas(), dtype=object)
            pdf = pd.DataFrame(
                {"row": parent, "lang": langs[parent], "term": vals}
            )
            pdf = pdf[pdf.term != ""].drop_duplicates(["row", "term"])
            pdf = pdf.merge(self.sel[["lang", "term"]], on=["lang", "term"])
            empty = pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "term_x": pa.array([], pa.string()),
                    "term_y": pa.array([], pa.string()),
                    "n_xy": pa.array([], pa.int64()),
                }
            )
            if len(pdf) == 0:
                return empty
            # within-doc pairs among the ≤V selected terms: self-merge on
            # the row id, keep the term_x < term_y half
            pairs = pdf.merge(pdf, on=["row", "lang"], suffixes=("_x", "_y"))
            pairs = pairs[pairs.term_x < pairs.term_y]
            if len(pairs) == 0:
                return empty
            g = (
                pairs.groupby(["lang", "term_x", "term_y"], sort=False)
                .size()
                .rename("n_xy")
                .reset_index()
            )
            g["n_xy"] = g["n_xy"].astype("int64")
            return from_pandas_clean(g, preserve_index=False)

    sums = (
        _docs(sf_dir)
        .map_batches(PairCounts, batch_format="pyarrow",
                     concurrency=default_pool())
        .groupby(["lang", "term_x", "term_y"])
        .sum("n_xy")
    )
    df_map = {
        (l, t): int(d)
        for l, t, d in zip(cand["lang"], cand["term"], cand["df"])
    }
    dfm_ref = ray.put((df_map, n_by_lang))

    class AddPmi:
        def __init__(self):
            self.df_map, self.n_by_lang = ray.get(dfm_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pdf = t.to_pandas().rename(columns={"sum(n_xy)": "n_xy"})
            pdf = pdf[pdf.n_xy >= PMI_MIN_CO]
            if len(pdf) == 0:
                return pa.table(
                    {
                        "lang": pa.array([], pa.string()),
                        "term_x": pa.array([], pa.string()),
                        "term_y": pa.array([], pa.string()),
                        "n_xy": pa.array([], pa.int64()),
                        "pmi_x": pa.array([], pa.int64()),
                    }
                )
            nxy = pdf["n_xy"].to_numpy(dtype=np.float64)
            N = np.array([self.n_by_lang[l] for l in pdf["lang"]],
                         dtype=np.float64)
            dfx = np.array(
                [self.df_map[(l, x)] for l, x in zip(pdf["lang"], pdf["term_x"])],
                dtype=np.float64,
            )
            dfy = np.array(
                [self.df_map[(l, y)] for l, y in zip(pdf["lang"], pdf["term_y"])],
                dtype=np.float64,
            )
            # same float op order as the SQL: (n_xy·N) / (df_x·df_y)
            pmi = np.log((nxy * N) / (dfx * dfy))
            pdf["pmi_x"] = np.floor(pmi * 10000.0 + 0.5).astype(np.int64)
            pdf["n_xy"] = pdf["n_xy"].astype("int64")
            return from_pandas_clean(
                pdf[["lang", "term_x", "term_y", "n_xy", "pmi_x"]],
                preserve_index=False,
            )

    def top10(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pmi_x", "term_x", "term_y"],
                          ascending=[False, True, True]).head(10)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["lang", "rank", "term_x", "term_y", "n_xy", "pmi_x"]]

    scored = sums.map_batches(AddPmi, batch_format="pyarrow",
                              concurrency=default_pool())
    return scored.groupby("lang").map_groups(top10, batch_format="pandas")


def q_latest_event(sf_dir: str):
    """Snapshot dedup: each (user_id, event_type)'s newest event —
    the recrawl keep-latest-capture-per-url semantic (stages/dedup.py
    keep_latest) exercised on the events table where the driver oracle
    can verify it. Winner = max (ts, event_id); full rows survive
    (value rides along like html bytes would in the corpus shape)."""
    from ..stages.dedup import keep_latest

    ev = _events(sf_dir,
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    return keep_latest(
        ev, key_cols=("user_id", "event_type"), ts_col="ts",
        tie_col="event_id",
    )


# ------------------------------------------------- round-3 training-data ops

# span-level exact dedup window size (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better": repeated k-token spans)
SPAN_N = 5
# per-lang keep rates for stratified sampling, as 2-hex-digit md5 bucket
# thresholds out of 256 (the K5 hash-split idiom applied per stratum)
STRAT_RATES = {"en": "20", "de": "80", "es": "80", "fr": "80", "zh": "80"}
SOURCE_CAP_K = 10  # per-source document quota
LM_SCALE = 1_000_000  # fixed-point scale for per-bigram logprobs


def _flat_tok(t: pa.Table):
    """Vectorized simple tokenization of a text batch → (values object
    ndarray, parent int64 row index ndarray), empties removed. Mirrors the
    SQL ``TOKLIST`` expression. Safe for adjacency ops: the collapse-to-
    single-space regex means '' only appears for fully-empty docs (a
    single token), so removing it never creates false adjacency."""
    text = pc.cast(t["text"], pa.string())
    low = pc.utf8_lower(text)
    spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
    trimmed = pc.utf8_trim_whitespace(spaced)
    toks = pc.split_pattern(trimmed, " ").combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values
    s0 = offsets[0]
    if s0 != 0 or len(values) != offsets[-1]:
        values = values.slice(s0, offsets[-1] - s0)
    lens = np.diff(offsets)
    parent = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    vals = np.asarray(values.to_pandas(), dtype=object)
    keep = vals != ""
    return vals[keep], parent[keep]


def _spans(vals: np.ndarray, parent: np.ndarray, k: int):
    """All k-token windows over the flat token array: (span strings object
    ndarray, parent row index ndarray). Parent-equality guard keeps
    windows inside one document."""
    n = len(vals)
    if n < k:
        return (
            np.empty(0, dtype=object),
            np.empty(0, dtype=np.int64),
        )
    m = n - k + 1
    ok = parent[:m] == parent[k - 1 :]
    w = vals[:m].copy()
    for j in range(1, k):
        w = w + " "
        w = w + vals[j : m + j]
    return w[ok], parent[:m][ok]


RANGE_JOIN_WINDOW_US = 3_600_000_000  # 1 hour in exact integer micros


def _range_join_partition(group: pd.DataFrame) -> pd.DataFrame:
    """user_id-hash partition of (purchase ∪ click) rows → per purchase,
    the count of same-user clicks with ts in [t−W, t). Count-in-range is
    two vectorized cumulative lookups: C(t⁻) − C((t−W)⁻), each a
    ``pd.merge_asof`` (backward, exact matches off) against the clicks'
    per-user running count."""
    empty = pd.DataFrame(
        {c: pd.Series(dtype="int64") for c in ("event_id", "user_id", "n_clicks")}
    )
    g = group.drop(columns=["kpart"]) if "kpart" in group.columns else group
    left = g[g["event_type"] == "purchase"][["event_id", "ts", "user_id"]]
    if left.empty:
        return empty
    right = g[g["event_type"] == "click"][["ts", "user_id"]]
    if right.empty:
        return left.assign(n_clicks=np.int64(0))[
            ["event_id", "user_id", "n_clicks"]
        ].astype("int64")
    right = right.sort_values("ts", kind="mergesort")
    right = right.assign(
        cum=right.groupby("user_id", sort=False).cumcount() + 1
    )
    users = left["user_id"].to_numpy(np.int64)

    def c_before(x: np.ndarray) -> np.ndarray:
        order = np.argsort(x, kind="stable")
        qs = pd.DataFrame({"ts": x[order], "user_id": users[order]})
        m = pd.merge_asof(
            qs,
            right,
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        out = np.zeros(len(x), np.int64)
        out[order] = m["cum"].fillna(0).to_numpy(np.int64)
        return out

    ts = left["ts"].to_numpy(np.int64)
    n = c_before(ts) - c_before(ts - RANGE_JOIN_WINDOW_US)
    return pd.DataFrame(
        {
            "event_id": left["event_id"].to_numpy(np.int64),
            "user_id": users,
            "n_clicks": n,
        }
    )


def q_range_join(sf_dir: str):
    """RANGE JOIN — an operator Ray Data lacks: for every purchase event,
    the number of same-user click events in the preceding hour
    ([t−1h, t), exact integer microseconds). Distributed as a
    user_id-hash cogroup like rel_asof; the per-partition kernel is two
    C-level merge_asof passes, no per-row Python. Same partitioning
    assumption as rel_asof: one key's timeline fits a partition."""
    ev = _events(sf_dir,
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def _sides(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(
                t["event_type"], value_set=pa.array(["purchase", "click"])
            )
        )
        return t.set_column(
            t.schema.get_field_index("ts"), "ts", pc.cast(t["ts"], pa.int64())
        )

    return _parted(
        ev.map_batches(_sides, batch_format="pyarrow"), ("user_id",)
    ).map_groups(_range_join_partition, batch_format="pandas")


def q_sample_stratified(sf_dir: str):
    """Deterministic stratified corpus sampling: per-lang keep rates via
    an md5(doc_id) 2-hex-digit bucket. Shuffle-free, reproducible without
    RNG state — the sampling decision is a pure function of the row."""
    from ..functions.hashing import md5_hex

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        langs = t["lang"].to_pylist()
        keep = pa.array(
            [
                md5_hex(str(i))[:2] < STRAT_RATES.get(l, "00")
                for i, l in zip(ids, langs)
            ]
        )
        return t.filter(keep).select(["doc_id", "lang"])

    return _docs(sf_dir).map_batches(pick, batch_format="pyarrow")


def q_source_stats(sf_dir: str):
    """Per-source corpus composition report — the dashboard a crawl
    curation loop watches (docs, bytes, mean length, corpus share per
    domain/source): n_docs, total_chars, mean chars fx4
    (floor(10^4·total/n)), and the corpus share in basis points fx4
    (floor(10^8·n_source/n_total)) — all exact integers.

    Scale plan: per-batch (source, n, chars) partials combine before ONE
    source-keyed groupby; the total-doc scalar comes from summing the
    same tiny aggregate (driver-side, |sources| rows) — no second corpus
    pass, nothing broadcast."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        pdf = pd.DataFrame({
            "source": np.asarray(t["source"].to_pandas(), dtype=object),
            "n_chars": t["n_chars"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        g = (
            pdf.groupby("source", sort=False)["n_chars"]
            .agg(["size", "sum"]).reset_index()
            .rename(columns={"size": "n_docs", "sum": "total_chars"})
        )
        return from_pandas_clean(g)

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("total_chars", alias_name="total_chars"),
        )
        .to_pandas()  # |sources| rows — bounded by the domain universe
    )
    n_total = int(agg["n_docs"].sum())
    n = agg["n_docs"].to_numpy(np.int64)
    tc = agg["total_chars"].to_numpy(np.int64)
    return pd.DataFrame({
        "source": agg["source"],
        "n_docs": n,
        "total_chars": tc,
        "mean_chars_x": (10_000 * tc) // n,
        "share_x": (100_000_000 * n) // n_total,
    })


_SOURCE_STATS_SQL = """
WITH s AS (
  SELECT source, count(*) AS n_docs, sum(n_chars) AS total_chars
  FROM documents GROUP BY source
),
t AS (SELECT sum(n_docs) AS n_total FROM s)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_chars AS BIGINT) AS total_chars,
       CAST((10000 * total_chars) // n_docs AS BIGINT) AS mean_chars_x,
       CAST((100000000 * n_docs) // t.n_total AS BIGINT) AS share_x
FROM s, t
"""


def q_token_fertility(sf_dir: str):
    """Per-language tokenizer fertility audit — the tokens-per-doc and
    chars-per-token profile an LLM-data pipeline checks before committing
    to a tokenizer/vocab (high-fertility languages cost more sequence
    budget per character): exact integer sums (n_docs, n_tokens,
    token_chars) and fx4 floor ratios.

    Scale plan: per-batch (lang, n_docs, n_tokens, token_chars) partials
    combine before ONE lang-keyed groupby of |langs| rows — no second
    corpus pass, nothing broadcast, the driver sees |langs| rows."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["text", "lang"]
    )

    def partial(t: pa.Table) -> pa.Table:
        langs = np.asarray(t["lang"].to_pandas(), dtype=object)
        vals, parent = _flat_tok(t)
        chars = pd.Series(vals).str.len().to_numpy(np.int64) if len(vals) else np.zeros(0, np.int64)
        tok = (
            pd.DataFrame({"lang": langs[parent], "chars": chars})
            .groupby("lang", sort=False)["chars"]
            .agg(["size", "sum"])
            .rename(columns={"size": "n_tokens", "sum": "token_chars"})
        )
        nd = pd.Series(langs).value_counts().rename("n_docs")
        out = pd.concat([nd, tok], axis=1).fillna(0).reset_index(
            names="lang"
        )
        for c in ("n_docs", "n_tokens", "token_chars"):
            out[c] = out[c].astype(np.int64)
        return from_pandas_clean(out)

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("n_tokens", alias_name="n_tokens"),
            ray.data.aggregate.Sum("token_chars", alias_name="token_chars"),
        )
        .to_pandas()  # |langs| rows
    )
    nd = agg["n_docs"].to_numpy(np.int64)
    nt = agg["n_tokens"].to_numpy(np.int64)
    tc = agg["token_chars"].to_numpy(np.int64)
    return pd.DataFrame({
        "lang": agg["lang"],
        "n_docs": nd,
        "n_tokens": nt,
        "token_chars": tc,
        "toks_per_doc_x": (10_000 * nt) // nd,
        "chars_per_tok_x": np.where(nt > 0, (10_000 * tc) // np.maximum(nt, 1), 0),
    })


_TOKEN_FERTILITY_SQL = f"""
WITH tokc AS (
  SELECT lang, count(*) AS n_tokens, sum(len(term)) AS token_chars
  FROM (SELECT lang, unnest({TOKLIST.format(col='text')}) AS term
        FROM documents)
  GROUP BY lang
),
d AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
SELECT d.lang AS lang,
       CAST(d.n_docs AS BIGINT) AS n_docs,
       CAST(coalesce(tokc.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(tokc.token_chars, 0) AS BIGINT) AS token_chars,
       CAST((10000 * coalesce(tokc.n_tokens, 0)) // d.n_docs AS BIGINT)
         AS toks_per_doc_x,
       CAST(CASE WHEN coalesce(tokc.n_tokens, 0) = 0 THEN 0
                 ELSE (10000 * tokc.token_chars) // tokc.n_tokens END
            AS BIGINT) AS chars_per_tok_x
FROM d LEFT JOIN tokc ON tokc.lang = d.lang
"""


def q_dup_rate_by_source(sf_dir: str):
    """Per-source exact-duplicate pollution report — the crawl-curation
    signal that decides which domains get demoted: a doc is a duplicate-
    cluster member when ≥ 2 docs share its exact text. Per source:
    n_docs, n_dup (cluster members), and the dup rate fx4.

    Scale plan: batches pre-collapse to (text_hash, source, cnt) partial
    counts, so the ONE content-hash exchange ships 128-bit hashes +
    counts (never text); cluster sizes resolve inside the hash
    partition; a final |sources|-row groupby sums the per-partition
    (source, n, dup) partials. No join, no broadcast, no driver set."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )
    hashed = docs.map_batches(
        lambda t: add_text_hash(t, normalize=False), batch_format="pyarrow"
    ).select_columns(["text_hash", "source"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame({
                "text_hash": np.asarray(t["text_hash"].to_pandas(), dtype=object),
                "source": np.asarray(t["source"].to_pandas(), dtype=object),
            })
            .groupby(["text_hash", "source"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return from_pandas_clean(g)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                "source": pd.Series(dtype=object),
                "n_docs": pd.Series(dtype="int64"),
                "n_dup": pd.Series(dtype="int64"),
            })
        cluster = g.groupby("text_hash", sort=False)["cnt"].transform("sum")
        g = g.assign(dup=np.where(cluster.to_numpy() >= 2,
                                  g["cnt"].to_numpy(), 0))
        out = (
            g.groupby("source", sort=False)
            .agg(n_docs=("cnt", "sum"), n_dup=("dup", "sum"))
            .reset_index()
        )
        return out.astype({"n_docs": "int64", "n_dup": "int64"})

    parts = _parted(
        hashed.map_batches(partial, batch_format="pyarrow"), ("text_hash",)
    ).map_groups(per_partition, batch_format="pandas")
    agg = (
        _arrow_blocks(parts)
        .groupby("source")
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("n_dup", alias_name="n_dup"),
        )
        .to_pandas()  # |sources| rows
    )
    nd = agg["n_docs"].to_numpy(np.int64)
    du = agg["n_dup"].to_numpy(np.int64)
    return pd.DataFrame({
        "source": agg["source"],
        "n_docs": nd,
        "n_dup": du,
        "dup_rate_x": (10_000 * du) // nd,
    })


# the testdata entry reports buckets larger than this; a production dedup
# run passes k=DedupConfig.max_bucket so the report lists exactly the
# buckets band_group_pairs truncates (512 ≫ any testdata bucket, which
# would make the oracle vacuous here — K=2 exercises the real path)
AUDIT_BUCKET_K = 2


def q_dedup_bucket_audit(sf_dir: str, k: int = AUDIT_BUCKET_K):
    """LSH bucket-size audit — the "no silent caps" counter as a
    first-class result: every (band_idx, band_key) bucket holding more
    than ``k`` docs, with the doc count a ``max_bucket=k`` run's
    deterministic sorted-prefix truncation (``band_group_pairs``,
    stages/dedup.py) would drop. With ``k=DedupConfig.max_bucket`` the
    report is non-empty iff ``q_minhash_pairs`` under-generated
    candidate pairs, so a dedup run ships it alongside the pair list
    instead of relying on worker-log RuntimeWarnings. ONE (band)-keyed
    exchange of hash rows (the same shuffle shape as the pair
    pipeline); the report itself is degenerate-bucket-sized."""
    bands = _docs(sf_dir).map_batches(emit_band_rows, batch_format="pyarrow")
    agg = bands.groupby(["band_idx", "band_key"]).aggregate(
        ray.data.aggregate.Count(alias_name="bucket_size")
    )

    def fin(t: pa.Table) -> pa.Table:
        size = t["bucket_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = size > k
        return pa.table(
            {
                "band_idx": pc.cast(t["band_idx"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "band_key": t["band_key"].filter(pa.array(keep)),
                "bucket_size": pa.array(size[keep], pa.int64()),
                "dropped": pa.array(size[keep] - k, pa.int64()),
            }
        )

    df = agg.map_batches(fin, batch_format="pyarrow").to_pandas()
    if df.empty:  # all-empty blocks lose their schema through to_pandas
        return pd.DataFrame({
            "band_idx": pd.Series(dtype="int64"),
            "band_key": pd.Series(dtype=object),
            "bucket_size": pd.Series(dtype="int64"),
            "dropped": pd.Series(dtype="int64"),
        })
    return df


def q_jaccard_prefix_audit(sf_dir: str, k: int = AUDIT_BUCKET_K):
    """Prefix-index bucket audit for the exact n-gram Jaccard join — the
    "no silent caps" counter of ``shingle_bucket_pairs_partition``'s
    ``max_bucket`` truncation as a first-class oracled result: every
    shingle-hash bucket of the df-ascending PREFIX index holding more
    than ``k`` docs, with the count a ``max_bucket=k`` run would drop.
    Same distributed plan as q_ngram_jaccard through the prefix stage
    (df by sh-hash colocation, per-doc prefix by doc-hash colocation);
    the report is degenerate-bucket-sized."""
    docs = _docs(sf_dir)
    # materialized like q_ngram_jaccard's: chaining three lazy keyed
    # exchanges through the streaming planner measured ~6x slower than
    # cutting the lineage here
    sh_tbl = docs.map_batches(
        emit_doc_shingles, fn_kwargs={"n": DEFAULT_DEDUP.shingle_n},
        batch_format="pyarrow",
    ).materialize()
    exploded = sh_tbl.map_batches(explode_shingle_rows, batch_format="pyarrow")
    with_df = _parted(exploded, ("sh",)).map_groups(
        shingle_df_partition, batch_format="pandas"
    ).materialize()
    prefix = _parted(with_df, ("doc_id",)).map_groups(
        lambda g: prefix_rows_partition(g, NGRAM_JACCARD_THRESHOLD),
        batch_format="pandas",
    )

    # bucket sizes by sh-hash COLOCATION (every row of a shingle lands
    # in one partition, so in-partition counts are global) — the repo's
    # cogroup idiom; a sort-based groupby over the lazy 3-exchange
    # lineage measured ~7x slower here
    def part_sizes(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[c for c in ("kpart",) if c in g.columns])
        sizes = g.groupby("sh", sort=True).size()
        sizes = sizes[sizes > k]
        return pd.DataFrame({
            "sh": sizes.index.to_numpy(dtype=np.int64),
            "bucket_size": sizes.to_numpy(dtype=np.int64),
            "dropped": (sizes - k).to_numpy(dtype=np.int64),
        })

    # to_pandas, NOT take_all: row-dict conversion of pandas blocks
    # measured ~0.5 ms/row — 9.5 s vs 0.13 s on this report
    df = _parted(prefix, ("sh",)).map_groups(
        part_sizes, batch_format="pandas"
    ).to_pandas()
    if df.empty:
        return pd.DataFrame({
            "sh": pd.Series(dtype="int64"),
            "bucket_size": pd.Series(dtype="int64"),
            "dropped": pd.Series(dtype="int64"),
        })
    return df


def q_containment_audit(sf_dir: str, k: int = AUDIT_BUCKET_K):
    """Bucket audit for the directional containment join — per shingle
    hash, the PREFIX-side and FULL-side doc counts that
    ``containment_bucket_pairs_partition`` would truncate at
    ``max_bucket=k``, with the summed drop. The full side is df-sized
    (every doc holding the shingle), so this is the join's hottest cap;
    a production run ships the report alongside the pair list."""
    docs = _docs(sf_dir)
    sh_tbl = docs.map_batches(
        emit_doc_shingles, fn_kwargs={"n": DEFAULT_DEDUP.shingle_n},
        batch_format="pyarrow",
    ).materialize()
    exploded = sh_tbl.map_batches(explode_shingle_rows, batch_format="pyarrow")
    with_df = _parted(exploded, ("sh",)).map_groups(
        shingle_df_partition, batch_format="pandas"
    )
    prefix = _parted(with_df, ("doc_id",)).map_groups(
        lambda g: prefix_rows_partition(g, CONTAINMENT_THRESHOLD),
        batch_format="pandas",
    )

    def _mark(role):
        def mark(t: pa.Table) -> pa.Table:
            return pa.table({
                "sh": pc.cast(t["sh"], pa.int64()),
                "role": pa.array(
                    np.full(t.num_rows, role, np.int64), pa.int64()),
            })

        return mark

    marked = prefix.map_batches(_mark(1), batch_format="pyarrow").union(
        exploded.map_batches(_mark(0), batch_format="pyarrow")
    )
    agg = marked.groupby("sh").aggregate(
        ray.data.aggregate.Count(alias_name="n_rows"),
        ray.data.aggregate.Sum("role", alias_name="n_prefix"),
    )

    def fin(t: pa.Table) -> pa.Table:
        rows = t["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
        npre = t["n_prefix"].to_numpy(zero_copy_only=False).astype(np.int64)
        nfull = rows - npre
        keep = (npre > k) | (nfull > k)
        return pa.table({
            "sh": pc.cast(t["sh"], pa.int64()).filter(pa.array(keep)),
            "n_prefix": pa.array(npre[keep], pa.int64()),
            "n_full": pa.array(nfull[keep], pa.int64()),
            "dropped": pa.array(
                np.maximum(npre[keep] - k, 0) + np.maximum(nfull[keep] - k, 0),
                pa.int64()),
        })

    df = agg.map_batches(fin, batch_format="pyarrow").to_pandas()
    if df.empty:
        return pd.DataFrame({
            "sh": pd.Series(dtype="int64"),
            "n_prefix": pd.Series(dtype="int64"),
            "n_full": pd.Series(dtype="int64"),
            "dropped": pd.Series(dtype="int64"),
        })
    return df


def q_simhash_band_audit(sf_dir: str, k: int = AUDIT_BUCKET_K):
    """SimHash (band, chunk) bucket audit — the counter behind
    ``simhash_band_pairs``' deterministic ``max_bucket`` truncation as
    an oracled result: every 16-bit-chunk bucket holding more than
    ``k`` docs with the would-be drop at ``max_bucket=k``. One
    (band, chunk)-keyed exchange of signature rows (the pair pipeline's
    own shuffle shape)."""
    sig = (
        _docs(sf_dir)
        .map_batches(add_simhash, batch_format="pyarrow")
        .select_columns(["doc_id", "simhash"])
    )
    bands = sig.map_batches(emit_simhash_bands, batch_format="pyarrow")
    agg = bands.groupby(["band", "chunk"]).aggregate(
        ray.data.aggregate.Count(alias_name="bucket_size")
    )

    def fin(t: pa.Table) -> pa.Table:
        size = t["bucket_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = size > k
        ka = pa.array(keep)
        return pa.table({
            "band": pc.cast(t["band"], pa.int64()).filter(ka),
            "chunk": pc.cast(t["chunk"], pa.int64()).filter(ka),
            "bucket_size": pa.array(size[keep], pa.int64()),
            "dropped": pa.array(size[keep] - k, pa.int64()),
        })

    df = agg.map_batches(fin, batch_format="pyarrow").to_pandas()
    if df.empty:
        return pd.DataFrame({
            "band": pd.Series(dtype="int64"),
            "chunk": pd.Series(dtype="int64"),
            "bucket_size": pd.Series(dtype="int64"),
            "dropped": pd.Series(dtype="int64"),
        })
    return df


_DUP_RATE_BY_SOURCE_SQL = """
WITH g AS (SELECT text, count(*) AS c FROM documents GROUP BY text),
d AS (SELECT documents.source AS source, g.c AS c
      FROM documents JOIN g USING (text))
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST((10000 * sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)) // count(*)
            AS BIGINT) AS dup_rate_x
FROM d GROUP BY source
"""


def q_source_cap(sf_dir: str):
    """Per-source quota enforcement (the per-domain cap of a web corpus):
    keep the SOURCE_CAP_K lowest-doc_id docs of every source. One
    source-hash exchange of (doc_id, source) only — the rank is computed
    inside the partition (a source's rows are colocated), no global
    sort."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "source": pd.Series(dtype=object),
                    "src_rank": pd.Series(dtype="int64"),
                }
            )
        g = g.sort_values(["source", "doc_id"], kind="mergesort")
        g = g.assign(src_rank=g.groupby("source", sort=False).cumcount() + 1)
        g = g[g["src_rank"] <= SOURCE_CAP_K]
        return g[["doc_id", "source", "src_rank"]].astype(
            {"doc_id": "int64", "src_rank": "int64"}
        )

    return _parted(ds, ("source",)).map_groups(cap, batch_format="pandas")


def q_rep_quality(sf_dir: str):
    """Gopher-style repetition quality signals per doc: fraction of
    bigram occurrences taken by the single most frequent bigram, and the
    duplicate-trigram fraction (1 − distinct/total). Zero shuffle — a doc
    lives in one batch; per-batch pandas hash-groupby kernels."""

    def rep(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "top2gram_frac_x": pa.array([], pa.int64()),
                "dup3gram_frac_x": pa.array([], pa.int64()),
            }
        )
        vals, parent = _flat_tok(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bg, bp = _spans(vals, parent, 2)
        if len(bg) == 0:
            return empty
        bdf = pd.DataFrame({"p": bp, "g": bg})
        per = bdf.groupby(["p", "g"], sort=False).size().groupby(level=0)
        nb = per.sum()
        maxc = per.max()
        tg, tp = _spans(vals, parent, 3)
        if len(tg):
            tdf = pd.DataFrame({"p": tp, "g": tg})
            tper = tdf.groupby("p", sort=False)["g"]
            nt = tper.size()
            ndt = tper.nunique()
            dup3 = np.floor(
                (1.0 - ndt.to_numpy(np.float64) / nt.to_numpy(np.float64))
                * 10000.0
                + 0.5
            ).astype(np.int64)
            dup3 = pd.Series(dup3, index=nt.index)
        else:
            dup3 = pd.Series(dtype="int64")
        p_idx = nb.index.to_numpy()
        top2 = np.floor(
            maxc.to_numpy(np.float64) / nb.to_numpy(np.float64) * 10000.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[p_idx], pa.int64()),
                "n_bigrams": pa.array(
                    nb.to_numpy(np.int64), pa.int64()
                ),
                "top2gram_frac_x": pa.array(top2, pa.int64()),
                "dup3gram_frac_x": pa.array(
                    dup3.reindex(nb.index, fill_value=0).to_numpy(np.int64),
                    pa.int64(),
                ),
            }
        )

    return _docs(sf_dir).map_batches(rep, batch_format="pyarrow")


def _span_rows(t: pa.Table) -> pa.Table:
    """Per-batch (span_hash, doc_id, c) rows: per-doc counts of each
    SPAN_N-token window (md5-hashed so only 32-byte keys travel)."""
    from ..functions.hashing import md5_hex

    vals, parent = _flat_tok(t)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    w, wp = _spans(vals, parent, SPAN_N)
    if len(w) == 0:
        return pa.table(
            {
                "span_hash": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
    pdf = pd.DataFrame({"span": w, "doc_id": ids[wp]})
    g = pdf.groupby(["span", "doc_id"], sort=False).size().rename("c").reset_index()
    uniq = {s: md5_hex(s) for s in g["span"].unique()}
    return pa.table(
        {
            "span_hash": pa.array(g["span"].map(uniq), pa.string()),
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }
    )


def q_dup_spans(sf_dir: str):
    """Span-level exact duplicate detection (Lee et al. 2022): every
    SPAN_N-token window appearing in ≥ 2 distinct documents, with doc and
    occurrence counts. Per-batch partial (span_hash, n_docs, n_occ) rows —
    a doc lives in one batch, so per-batch distinct-doc counts SUM exactly
    across batches — then ONE span-keyed exchange of the partials (already
    smaller than the token stream)."""

    def partial(t: pa.Table) -> pa.Table:
        r = _span_rows(t)
        if r.num_rows == 0:
            return pa.table(
                {
                    "span_hash": pa.array([], pa.string()),
                    "nd": pa.array([], pa.int64()),
                    "no": pa.array([], pa.int64()),
                }
            )
        pdf = r.to_pandas()
        g = pdf.groupby("span_hash", sort=False).agg(
            nd=("doc_id", "size"), no=("c", "sum")
        ).reset_index()
        return from_pandas_clean(g, preserve_index=False)

    agg = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("span_hash")
        .aggregate(
            ray.data.aggregate.Sum("nd", alias_name="n_docs"),
            ray.data.aggregate.Sum("no", alias_name="n_occ"),
        )
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], 2)),
        batch_format="pyarrow",
    )


def q_dup_span_docs(sf_dir: str):
    """The apply step of span-level dedup: per-doc duplicated-span
    coverage (how many of a doc's SPAN_N-token windows also occur in
    another doc). Two exchanges: the span-keyed cogroup flags duplicated
    spans IN PLACE (all rows of a span are colocated, like the tfidf df
    trick), emitting per-(doc, partition) partials; a doc-keyed sum
    finishes."""

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "ns": pd.Series(dtype="int64"),
                    "nd": pd.Series(dtype="int64"),
                }
            )
        docs_per_span = g.groupby("span_hash", sort=False)[
            "doc_id"
        ].transform("nunique")
        dup = (docs_per_span >= 2).to_numpy()
        c = g["c"].to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "ns": c,
                "nd": np.where(dup, c, 0),
            }
        )
        return (
            out.groupby("doc_id", sort=False)
            .agg(ns=("ns", "sum"), nd=("nd", "sum"))
            .reset_index()
        )

    rows = _docs(sf_dir).map_batches(_span_rows, batch_format="pyarrow")
    partials = _arrow_blocks(_parted(rows, ("span_hash",)).map_groups(
        flag, batch_format="pandas"
    ))
    return partials.groupby("doc_id").aggregate(
        ray.data.aggregate.Sum("ns", alias_name="n_spans"),
        ray.data.aggregate.Sum("nd", alias_name="n_dup_spans"),
    )


def q_lm_score(sf_dir: str):
    """Bigram-LM quality scoring (CCNet-style): train an add-one-smoothed
    per-lang bigram model on the corpus itself and score every document's
    total bigram log-likelihood. Count tables are attached by hash
    COLOCATION (in-place group sums, the tfidf_keywords df trick) —
    nothing vocabulary-sized is broadcast or driver-held; only the
    per-lang vocab-size dict (|langs| scalars) rides the closure.
    Per-bigram logprobs are fixed-point LM_SCALE integers so sums are
    order-independent across engines."""

    def bigram_rows(t: pa.Table) -> pa.Table:
        vals, parent = _flat_tok(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = np.asarray(t["lang"].to_pandas(), dtype=object)
        n = len(vals)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        ok = parent[:-1] == parent[1:]
        if not ok.any():
            return empty
        p = parent[:-1][ok]
        pdf = pd.DataFrame(
            {
                "doc_id": ids[p],
                "lang": langs[p],
                "w1": vals[:-1][ok],
                "w2": vals[1:][ok],
            }
        )
        g = (
            pdf.groupby(["doc_id", "lang", "w1", "w2"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    rows = _docs(sf_dir).map_batches(bigram_rows, batch_format="pyarrow")

    # per-lang vocab size V = count(DISTINCT w1): two vocab-sized groupbys,
    # |langs| scalars on the driver
    vdict = {
        r["lang"]: r["count()"]
        for r in rows.groupby(["lang", "w1"])
        .count()
        .groupby("lang")
        .count()
        .take_all()
    }

    def attach_c1(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "lang": pd.Series(dtype=object),
                    "w1": pd.Series(dtype=object),
                    "w2": pd.Series(dtype=object),
                    "c": pd.Series(dtype="int64"),
                    "c1": pd.Series(dtype="int64"),
                }
            )
        out = g[["doc_id", "lang", "w1", "w2", "c"]].copy()
        out["c1"] = g.groupby(["lang", "w1"], sort=False)["c"].transform("sum")
        return out

    def score(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                    "lp": pd.Series(dtype="int64"),
                }
            )
        c12 = g.groupby(["lang", "w1", "w2"], sort=False)["c"].transform(
            "sum"
        ).to_numpy(np.float64)
        c1 = g["c1"].to_numpy(np.float64)
        v = g["lang"].map(vdict).to_numpy(np.float64)
        c = g["c"].to_numpy(np.int64)
        lpx = np.floor(
            np.log((c12 + 1.0) / (c1 + v)) * float(LM_SCALE) + 0.5
        ).astype(np.int64)
        out = pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(np.int64), "n": c, "lp": lpx * c}
        )
        return (
            out.groupby("doc_id", sort=False)
            .agg(n=("n", "sum"), lp=("lp", "sum"))
            .reset_index()
        )

    with_c1 = _parted(rows, ("lang", "w1")).map_groups(
        attach_c1, batch_format="pandas"
    )
    partials = _arrow_blocks(_parted(with_c1, ("lang", "w1", "w2")).map_groups(
        score, batch_format="pandas"
    ))
    return partials.groupby("doc_id").aggregate(
        ray.data.aggregate.Sum("n", alias_name="n_bigrams"),
        ray.data.aggregate.Sum("lp", alias_name="logprob_x"),
    )


# --------------------------------------------- distribution / sketch ops

# exact distributed percentiles: doc lengths collapse to a VALUE HISTOGRAM
# (per-batch (lang, dl) partial counts → one tiny groupby), so the shuffle
# and the driver tail are O(distinct dl values), never O(docs). At 100 TB
# the histogram is still a few thousand rows per lang.
DL_PCTS = (25, 50, 75, 95)


def q_dl_percentiles(sf_dir: str):
    ds = _docs(sf_dir).map_batches(_dl_batch, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        pdf = (
            t.to_pandas()
            .groupby(["lang", "dl"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return from_pandas_clean(pdf, preserve_index=False)

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "dl"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # bounded: one row per distinct (lang, dl)
    )
    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("dl")
        cum = g["n"].to_numpy(np.int64).cumsum()
        dlv = g["dl"].to_numpy(np.int64)
        tot = int(cum[-1])
        row = {"lang": lang}
        for p in DL_PCTS:
            # smallest dl whose running count reaches ceil(p% of total);
            # ceil in exact integer math (mirrors the SQL ceil((p*tot)/100.0),
            # where the float quotient is never within 1/100 of a wrong int)
            thresh = (p * tot + 99) // 100
            row[f"p{p}"] = int(dlv[np.searchsorted(cum, thresh, side="left")])
        rows.append(row)
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)


# HyperLogLog distinct-term sketch: the canonical MERGEABLE-SKETCH shape —
# each batch emits its per-(lang, register) rho maxima (≤ langs × 256 rows),
# one small groupby-max combines them, the driver folds 256 registers into
# the estimate. Nothing vocabulary-sized ever moves or materializes; at
# 100 TB the exchange stays a few KB per batch regardless of corpus size.
# Hash = md5 (shared with the SQL oracle bit-for-bit): register = first
# 8 bits, rho = leading zeros of the next 48 bits + 1.
HLL_M = 256  # 2^8 registers
HLL_RHO_BITS = 48
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hll_partial(t: pa.Table) -> pa.Table:
    vals, parent = _flat_tok(t)
    langs = np.asarray(t["lang"].to_pandas(), dtype=object)[parent]
    if len(vals) == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "reg": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64()),
            }
        )
    # hash each (lang, term) once per batch (duplicates can't raise a max)
    key = np.char.add(np.char.add(langs.astype(str), "\x1f"), vals.astype(str))
    _, idx = np.unique(key, return_index=True)
    regs = np.empty(len(idx), np.int64)
    rhos = np.empty(len(idx), np.int64)
    for j, i in enumerate(idx):
        hx = hashlib.md5(str(vals[i]).encode("utf-8")).hexdigest()
        regs[j] = int(hx[:2], 16)
        v = int(hx[2 : 2 + HLL_RHO_BITS // 4], 16)
        rhos[j] = (HLL_RHO_BITS - v.bit_length()) + 1 if v else HLL_RHO_BITS + 1
    pdf = pd.DataFrame({"lang": langs[idx], "reg": regs, "rho": rhos})
    g = pdf.groupby(["lang", "reg"], sort=False)["rho"].max().reset_index()
    return from_pandas_clean(g, preserve_index=False)


def hll_estimate(reg_max: np.ndarray) -> int:
    """Fold a length-256 register-maxima array into the HLL estimate.

    The harmonic sum is EXACT integer math (sum of 2^(49-M), max rho 49),
    so engine and SQL oracle agree bit-for-bit; the one float division is
    by a power of two (commutes with rounding)."""
    s_int = int((np.int64(1) << (49 - reg_max.astype(np.int64))).sum())
    e = HLL_ALPHA * HLL_M * HLL_M / (s_int / (1 << 49))
    v = int((reg_max == 0).sum())
    if e <= 2.5 * HLL_M and v > 0:  # small-range correction
        e = HLL_M * np.log(HLL_M / v)
    return int(np.floor(e + 0.5))


def q_hll_distinct(sf_dir: str):
    agg = (
        _docs(sf_dir)
        .map_batches(_hll_partial, batch_format="pyarrow")
        .groupby(["lang", "reg"])
        .aggregate(ray.data.aggregate.Max("rho", alias_name="rho"))
        .to_pandas()  # bounded: ≤ langs × 256 rows
    )
    rows = []
    for lang, g in agg.groupby("lang"):
        reg_max = np.zeros(HLL_M, dtype=np.int64)
        reg_max[g["reg"].to_numpy(np.int64)] = g["rho"].to_numpy(np.int64)
        rows.append({"lang": lang, "hll_est": hll_estimate(reg_max)})
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)


# Count-Min sketch term-frequency estimation: the mergeable bounded-state
# point-query sketch (Cormode & Muthukrishnan 2005) — at 100 TB the
# (lang, d, cell) partial rows per batch are ≤ langs × CMS_D × CMS_W no
# matter the vocabulary, and the combine is ONE tiny groupby-sum; the
# classic companion to HLL (distinct) for heavy-hitter screening.
CMS_W = 256   # cells per row (first 2 md5 hex chars)
CMS_D = 4     # independent rows (hash salt = "d:")


def _cms_cell(d: int, term: str) -> int:
    hx = hashlib.md5(f"{d}:{term}".encode("utf-8")).hexdigest()
    return (int(hx[0], 16) * 16) + int(hx[1], 16)


def _cms_partial(t: pa.Table) -> pa.Table:
    """(lang, d, cell, cnt) partial — every token occurrence adds 1 to
    its CMS_D cells; duplicates collapse per batch before hashing."""
    vals, parent = _flat_tok(t)
    langs = np.asarray(t["lang"].to_pandas(), dtype=object)[parent]
    if len(vals) == 0:
        return pa.table({
            "lang": pa.array([], pa.string()),
            "d": pa.array([], pa.int64()),
            "cell": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        })
    key = np.char.add(np.char.add(langs.astype(str), "\x1f"), vals.astype(str))
    uk, idx, counts = np.unique(key, return_index=True, return_counts=True)
    out_lang = np.repeat(langs[idx], CMS_D)
    out_d = np.tile(np.arange(CMS_D, dtype=np.int64), len(idx))
    cells = np.empty(len(idx) * CMS_D, np.int64)
    for j, i in enumerate(idx):
        term = str(vals[i])
        for d in range(CMS_D):
            cells[j * CMS_D + d] = _cms_cell(d, term)
    pdf = pd.DataFrame({
        "lang": out_lang, "d": out_d, "cell": cells,
        "cnt": np.repeat(counts.astype(np.int64), CMS_D),
    })
    g = pdf.groupby(["lang", "d", "cell"], sort=False)["cnt"].sum().reset_index()
    return from_pandas_clean(g, preserve_index=False)


def cms_estimate(sketch: pd.DataFrame, lang: str, term: str) -> int:
    """Point query: min over the CMS_D row cells (0 when a cell is
    untouched). Always ≥ the true count (one-sided error)."""
    est = None
    for d in range(CMS_D):
        cell = _cms_cell(d, term)
        m = sketch[(sketch["lang"] == lang) & (sketch["d"] == d)
                   & (sketch["cell"] == cell)]
        v = int(m["cnt"].iloc[0]) if len(m) else 0
        est = v if est is None else min(est, v)
    return int(est)


def q_cms_counts(sf_dir: str):
    """Count-Min term-frequency estimates for the probe terms: per-batch
    bounded partials → ONE (lang, d, cell) groupby-sum (≤ langs×4×256
    rows) → driver point queries. ZERO corpus-sized exchange."""
    sketch = (
        _docs(sf_dir)
        .map_batches(_cms_partial, batch_format="pyarrow")
        .groupby(["lang", "d", "cell"])
        .sum("cnt")
        .to_pandas()  # bounded: ≤ langs × CMS_D × CMS_W rows
    )
    sketch = sketch.rename(columns={"sum(cnt)": "cnt"})
    rows = [
        {"lang": lang, "term": term,
         "est_tf": cms_estimate(sketch, lang, term)}
        for lang in sorted(sketch["lang"].unique())
        for term in SAMPLE_TERMS
    ]
    return pd.DataFrame(rows)[["lang", "term", "est_tf"]]


_CMS_CELL_SQL = (
    "(strpos('0123456789abcdef', substring(md5(CAST({d} AS VARCHAR) || ':' "
    "|| {term}), 1, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', substring(md5(CAST({d} AS VARCHAR) || ':' "
    "|| {term}), 2, 1)) - 1)"
)

_CMS_SQL = f"""
WITH occ AS (
  SELECT lang, term, count(*) AS c
  FROM (SELECT lang, unnest({TOKLIST.format(col='text')}) AS term
        FROM documents)
  GROUP BY lang, term
),
dd AS (SELECT unnest(range(0, {CMS_D})) AS d),
cells AS (
  SELECT lang, dd.d AS d,
         {_CMS_CELL_SQL.format(d='dd.d', term='term')} AS cell,
         sum(c) AS s
  FROM occ, dd GROUP BY lang, dd.d, cell
),
probe(term) AS (VALUES {", ".join(f"('{t}')" for t in SAMPLE_TERMS)}),
pcell AS (
  SELECT p.term AS term, dd.d AS d,
         {_CMS_CELL_SQL.format(d='dd.d', term='p.term')} AS cell
  FROM probe p, dd
),
est AS (
  SELECT l.lang AS lang, pc.term AS term,
         min(coalesce(c.s, 0)) AS est_tf
  FROM (SELECT DISTINCT lang FROM documents) l
  CROSS JOIN pcell pc
  LEFT JOIN cells c ON c.lang = l.lang AND c.d = pc.d AND c.cell = pc.cell
  GROUP BY l.lang, pc.term
)
SELECT lang, term, CAST(est_tf AS BIGINT) AS est_tf FROM est
"""


# grouped top-k with per-batch pruning: each batch forwards at most k rows
# per group, so the final per-group merge sees O(blocks × k) rows however
# large the corpus — the grouped analog of rel_join_top's partial top-k.
TOPGROUP_K = 3


def q_top_per_group(sf_dir: str):
    ds = _docs(sf_dir).map_batches(_dl_batch, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas().sort_values(
            ["lang", "dl", "doc_id"], ascending=[True, False, True]
        )
        return from_pandas_clean(
            pdf.groupby("lang", sort=False).head(TOPGROUP_K),
            preserve_index=False,
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["dl", "doc_id"], ascending=[False, True])
            .head(TOPGROUP_K)
            .copy()
        )
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["lang", "doc_id", "dl", "rnk"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


# BPE-ish token counting (brief: "token counting — whitespace + a BPE-ish
# regex"): subword-style segment count from a GPT-2-flavored alternation
# over the lowercased raw text, plus fertility = subword tokens per
# whitespace word. Both engines run the SAME RE2 pattern (Arrow's
# count_substring_regex and DuckDB's regexp_extract_all are both RE2),
# so non-overlapping leftmost-match counts agree exactly. Zero shuffle.
BPE_PAT = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def q_bpe_tokens(sf_dir: str):
    def kernel(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        low = pc.utf8_lower(text)
        n_bpe = pc.count_substring_regex(low, BPE_PAT).cast(pa.int64())
        nb = n_bpe.to_numpy(zero_copy_only=False)
        dl = _dl_batch(t)["dl"].to_numpy()
        fert = np.zeros(len(nb), dtype=np.int64)
        nz = dl > 0
        fert[nz] = np.floor((10000.0 * nb[nz]) / dl[nz] + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe": pa.array(nb, pa.int64()),
                "fertility_x": pa.array(fert, pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


# Benchmark decontamination (GPT-3/Lee-et-al style): flag documents whose
# DECON_N-token windows collide with a fixed evaluation-set span list.
# Scale shape = BROADCAST SEMI-JOIN: the eval-set hashes go to plasma once
# (ray.put) and every task membership-tests its batch's span hashes
# against the same object — zero shuffle, nothing corpus-sized moves, and
# a doc lives in one batch so per-batch hit counts are final.
DECON_N = 3
DECON_EVAL_SPANS = (
    "hash join order",
    "table scan merge",
    "stream spark window",
    "group part hash",
    "filter key fast",
    "data stream vector",
    "batch slow order",
    "query scan slow",
)


def q_decontaminate(sf_dir: str):
    from ..functions.hashing import md5_hex

    eval_ref = ray.put(frozenset(md5_hex(s) for s in DECON_EVAL_SPANS))

    def partial(t: pa.Table) -> pa.Table:
        es = ray.get(eval_ref)  # zero-copy shared set, fetched per task
        vals, parent = _flat_tok(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w, wp = _spans(vals, parent, DECON_N)
        if len(w) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_eval_hits": pa.array([], pa.int64()),
                }
            )
        uniq, inv = np.unique(w, return_inverse=True)
        hit_u = np.fromiter(
            (md5_hex(str(s)) in es for s in uniq), dtype=bool, count=len(uniq)
        )
        hit = hit_u[inv]
        if not hit.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_eval_hits": pa.array([], pa.int64()),
                }
            )
        hits = pd.DataFrame({"doc_id": ids[wp[hit]]})
        g = hits.groupby("doc_id", sort=False).size().rename("n_eval_hits")
        g = g.reset_index()
        return from_pandas_clean(g, preserve_index=False)

    return _docs(sf_dir).map_batches(partial, batch_format="pyarrow")


# ------------------------------------------ spelling correction (SymSpell)

# synthetic misspellings derived from the data itself (no external lists):
# the SPELL_NQ highest-df en terms of length >= SPELL_MIN_LEN, each with its
# 2nd character deleted
SPELL_NQ = 20
SPELL_MIN_LEN = 5
SPELL_TOPK = 3


# shared edit-distance-1 kernels (also the fuzzy_search serving path)
from ..functions.fuzzy import (  # noqa: E402
    deletion_variants as _deletion_variants,
    lev_le1 as _lev_le1,
)


def _en_vocab_ds(sf_dir: str):
    """(term, df) for lang='en' as a Dataset."""

    def en_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["lang"], "en"))
        return t.select(["term", "df"])

    return q_term_df(sf_dir).map_batches(en_only, batch_format="pyarrow")


def q_spell_correct(sf_dir: str):
    """SymSpell-style spelling correction: candidates via deletion-
    neighborhood intersection (a term t matches query m with
    levenshtein <= 1 iff ({t} ∪ D1(t)) ∩ ({m} ∪ D1(m)) ≠ ∅ — equal /
    insert / delete / substitute all intersect), then EXACT edit-distance
    verify on the candidate set, ranked by df.

    Scale shape: the vocabulary never leaves the cluster — each vocab
    batch generates its deletion variants vectorized (per-position Arrow
    slices) and probes the broadcast query-variant set; only matching
    candidates (result-sized) reach the driver for the exact verify +
    per-query top-k."""
    vocab = _en_vocab_ds(sf_dir)

    # 1. derive the misspelled query terms: per-batch partial top-NQ by
    #    (df desc, term asc) over len>=MIN_LEN terms, merged on the driver
    def partial_top(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(pc.utf8_length(t["term"]), SPELL_MIN_LEN))
        pdf = t.to_pandas()
        pdf = pdf.sort_values(["df", "term"], ascending=[False, True])
        return from_pandas_clean(pdf.head(SPELL_NQ), preserve_index=False)

    tops = vocab.map_batches(partial_top, batch_format="pyarrow").to_pandas()
    tops = tops.sort_values(["df", "term"], ascending=[False, True]).head(SPELL_NQ)
    mq = sorted({t[0] + t[2:] for t in tops["term"]})

    # 2. broadcast the query variant set; map variant -> misspelled terms
    var2m: dict[str, list[str]] = {}
    for m in mq:
        for v in {m} | {m[:i] + m[i + 1:] for i in range(len(m))}:
            var2m.setdefault(v, []).append(m)
    qvars = pa.array(sorted(var2m), pa.string())

    # 3. distributed candidate scan over the vocab
    def scan(t: pa.Table) -> pa.Table:
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        n = len(terms)
        idx = np.arange(n, dtype=np.int64)
        vidx, variants = _deletion_variants(terms)
        all_idx = np.concatenate([idx, vidx])
        all_var = pa.concat_arrays([terms, variants])
        hit = pc.is_in(all_var, value_set=qvars).to_numpy(zero_copy_only=False)
        sel = all_idx[hit]
        dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "variant": all_var.filter(pa.array(hit)),
                "term": terms.take(pa.array(sel)),
                "df": pa.array(dfs[sel], pa.int64()),
            }
        )

    cand = vocab.map_batches(scan, batch_format="pyarrow").to_pandas()

    # 4. exact verify + rank (result-sized)
    rows = []
    for variant, term, df_ in cand.itertuples(index=False):
        for m in var2m.get(variant, ()):
            rows.append((m, term, df_))
    out = pd.DataFrame(rows, columns=["misspelled", "suggestion", "df"])
    out = out.drop_duplicates(["misspelled", "suggestion"])
    keep = [
        _lev_le1(m, s) for m, s in zip(out["misspelled"], out["suggestion"])
    ]
    out = out[np.array(keep, dtype=bool)] if len(out) else out
    out = out.sort_values(
        ["misspelled", "df", "suggestion"], ascending=[True, False, True]
    )
    out["rank"] = out.groupby("misspelled").cumcount().astype(np.int64) + 1
    out = out[out["rank"] <= SPELL_TOPK].reset_index(drop=True)
    out["df"] = out["df"].astype(np.int64)
    return out[["misspelled", "suggestion", "df", "rank"]]


# ------------------------------------------------ faceted search counts

# ------------------------------------------------ fuzzy retrieval (term~1)

# fuzzy query set: typo'd tokens, Lucene `term~1` semantics — every
# same-language vocabulary term within levenshtein distance 1 of a query
# token joins the scored term multiset, weighted by the token's
# multiplicity (f03's doubled token exercises the weight sum)
FUZZYSET = [
    ("f01", "spak join", "en"),
    ("f02", "windw merge", "en"),
    ("f03", "vectr sortt sortt", "es"),
    ("f04", "hash streem", "de"),
]


def q_fuzzy_search(sf_dir: str):
    """Fuzzy retrieval (Lucene `term~1`) through the LIBRARY serving
    path (pipelines.query.bm25_search_fuzzy, also the CLI `query
    --fuzzy` path): each query token expands against the index's df
    artifact to every same-language vocabulary term within levenshtein
    distance 1 (SymSpell deletion-neighborhood candidates + exact
    verify, functions/fuzzy.py), then standard BM25 (k1=1.2, b=0.75,
    lucene idf) over the expanded weighted term multiset through the
    SAME cached index + scorer pool as bm25_standard. Reference analog:
    query-side preprocessing feeding retrieve_test_queries_optimized
    (final_implementation.py:290-506); fuzzy matching itself is an
    engine extension.

    Scale shape: the vocab is scanned in place (variants per df-shard
    batch, probed against the broadcast query-variant set —
    neighborhoods are tiny in a real vocab, so the expansion is
    result-sized); serving reuses the zero-copy shared-shard BM25
    stage unchanged."""
    from .query import bm25_search_fuzzy

    index_dir = _index_for(sf_dir)
    res = bm25_search_fuzzy(
        ray.data.from_items(
            [
                {"query_id": qid, "query": text, "lang": lang}
                for qid, text, lang in FUZZYSET
            ]
        ),
        index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        round_dp=4,
    )
    return _results_to_docids(res.to_pandas())


def _fuzzy_sql(k1: float = 1.2, b: float = 0.75) -> str:
    rows = []
    for qid, text, lang in FUZZYSET:
        c: dict[str, int] = {}
        for t in tokenize_simple(text):
            c[t] = c.get(t, 0) + 1
        for t, w in sorted(c.items()):
            rows.append(f"('{qid}', '{lang}', '{t}', {w})")
    qvalues = ", ".join(rows)
    denom = f"(tok.tf + {k1}*(1 - {b} + {b} * d.dl / s.avgdl))"
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, lang, qterm, w) AS (VALUES {qvalues}),
fq AS (
  SELECT q.query_id AS query_id, q.lang AS lang, df.term AS term,
         sum(q.w) AS w
  FROM q JOIN df ON df.lang = q.lang
              AND levenshtein(df.term, q.qterm) <= 1
  GROUP BY q.query_id, q.lang, df.term
),
scores AS (
  SELECT fq.query_id AS query_id, tok.doc_id AS doc_id,
         sum( fq.w * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * ({k1} + 1)) / {denom} ) AS score
  FROM fq
  JOIN tok ON tok.lang = fq.lang AND tok.term = fq.term
  JOIN df ON df.lang = fq.lang AND df.term = fq.term
  JOIN dl d ON d.doc_id = tok.doc_id
  JOIN stats s ON s.lang = fq.lang
  GROUP BY fq.query_id, tok.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


# ------------------------------------- query-performance prediction


def q_query_clarity(sf_dir: str):
    """Query clarity score (Cronen-Townsend QPP): KL divergence between
    the feedback language model (BM25 top-10 docs, ML estimate
    P(w|F_q) = tf_Fq(w)/|F_q|) and the collection model
    P(w|C) = cf(w)/|C|, summed over the feedback vocabulary — the
    pre-retrieval dashboard signal for "is this query well-specified".

    Scale shape: pass 1 is one tokenize scan emitting per-lang exact
    (sum_dl, n_docs) partials and the candidate docs' postings rows
    (semi-join on the broadcast result-sized id set); pass 2 computes
    collection frequencies ONLY for the feedback vocabulary (a filtered
    postings scan folding per-batch partial cf sums — at a 10^9-term
    vocab this becomes a cf-artifact lookup). Driver state is feedback-
    sized throughout."""
    from ..stages.postings import emit_postings

    top = q_bm25_standard(sf_dir)
    lang_of = {qid: lang for qid, _t, lang in QUERYSET}
    cand_urls = docid_to_url(
        pa.array(sorted(set(top["doc_id"].astype(np.int64))), pa.int64())
    )

    def scan1(t: pa.Table) -> pa.Table:
        p = emit_postings(t)
        p = p.filter(pc.is_in(p["url"], value_set=cand_urls))
        langs = np.asarray(t["lang"].to_pandas(), dtype=object)
        dls = t["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        sp = (
            pd.DataFrame({"lang": langs, "dl": dls})
            .groupby("lang", sort=False)["dl"]
            .sum()
            .reset_index()
        )
        out_a = pa.table(
            {
                "kind": pa.array(np.zeros(len(sp), np.int64)),
                "lang": pa.array(sp["lang"], pa.string()),
                "term": pa.array([""] * len(sp), pa.string()),
                "url": pa.array([""] * len(sp), pa.string()),
                "dl": pa.array(sp["dl"].to_numpy().astype(np.int64)),
                "tf": pa.array(np.zeros(len(sp), np.int64)),
            }
        )
        out_b = pa.table(
            {
                "kind": pa.array(np.ones(len(p), np.int64)),
                "lang": p["lang"],
                "term": p["term"],
                "url": p["url"],
                "dl": pc.cast(p["dl"], pa.int64()),
                "tf": pc.cast(p["tf"], pa.int64()),
            }
        )
        return pa.concat_tables([out_a, out_b])

    rows = _tokens_ds(sf_dir).map_batches(scan1, batch_format="pyarrow").to_pandas()
    coll_len = (
        rows[rows["kind"] == 0].groupby("lang")["dl"].sum().to_dict()
    )
    fb = rows[rows["kind"] == 1]

    fb_terms = pa.array(sorted(set(fb["term"])), pa.string())

    def scan2(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["term"], value_set=fb_terms))
        pdf = pd.DataFrame(
            {
                "lang": np.asarray(t["lang"].to_pandas(), dtype=object),
                "term": np.asarray(t["term"].to_pandas(), dtype=object),
                "tf": t["tf"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = pdf.groupby(["lang", "term"], sort=False)["tf"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    cfp = _postings_ds(sf_dir).map_batches(scan2, batch_format="pyarrow").to_pandas()
    cf = cfp.groupby(["lang", "term"], sort=False)["tf"].sum().to_dict()

    fb_dl: dict[str, int] = {}
    for _k, lang, term, url, dl_, tf_ in fb.itertuples(index=False):
        fb_dl[url] = int(dl_)
    # ONE vectorized docid->url pass over the result frame (review fix:
    # no per-row single-element Arrow kernel calls), folding doc->query
    # membership and feedback length together
    top_urls = docid_to_url(
        pa.array(top["doc_id"].astype(np.int64), pa.int64())
    ).to_pylist()
    doc_q: dict[str, list[str]] = {}
    flen: dict[str, int] = {}
    for qid, url in zip(top["query_id"], top_urls):
        doc_q.setdefault(url, []).append(qid)
        flen[qid] = flen.get(qid, 0) + fb_dl[url]

    # tf per (query, term), grouped by query in one pass
    tf_by_q: dict[str, dict[str, int]] = {}
    for _k, lang, term, url, _dl, tf_ in fb.itertuples(index=False):
        for qid in doc_q.get(url, ()):
            d = tf_by_q.setdefault(qid, {})
            d[term] = d.get(term, 0) + int(tf_)

    out = []
    for qid in sorted(tf_by_q):
        lang = lang_of[qid]
        cl = coll_len[lang]
        fl = flen[qid]
        clarity = 0.0
        n_terms = 0
        for term, tfv in sorted(tf_by_q[qid].items()):
            n_terms += 1
            pwf = tfv / fl
            pwc = cf[(lang, term)] / cl
            clarity += pwf * math.log(pwf / pwc)
        out.append(
            (qid, int(math.floor(clarity * 10000.0 + 0.5)), n_terms)
        )
    return pd.DataFrame(
        out, columns=["query_id", "clarity_x", "n_terms"]
    ).sort_values("query_id").reset_index(drop=True)


def _clarity_sql(k1: float = 1.2, b: float = 0.75) -> str:
    bm25 = _bm25_sql(k1, b, reference_quirk=False, dedup=False)
    return f"""
WITH top AS ({bm25}),
{_TOK_CTE}, {_DL_CTE},
fb AS (
  SELECT r.query_id AS query_id, tok.lang AS lang, tok.term AS term,
         sum(tok.tf) AS tfq
  FROM top r JOIN tok ON tok.doc_id = r.doc_id
  GROUP BY r.query_id, tok.lang, tok.term
),
flen AS (
  SELECT r.query_id AS query_id, sum(d.dl) AS fl
  FROM top r JOIN dl d ON d.doc_id = r.doc_id
  GROUP BY r.query_id
),
cf AS (SELECT lang, term, sum(tf) AS cf FROM tok GROUP BY lang, term),
coll AS (SELECT lang, sum(dl) AS cl FROM dl GROUP BY lang),
clar AS (
  SELECT fb.query_id AS query_id,
         sum( (fb.tfq / CAST(f.fl AS DOUBLE))
              * ln( (fb.tfq / CAST(f.fl AS DOUBLE))
                    / (cf.cf / CAST(c.cl AS DOUBLE)) ) ) AS clarity,
         CAST(count(*) AS BIGINT) AS n_terms
  FROM fb
  JOIN flen f ON f.query_id = fb.query_id
  JOIN cf ON cf.lang = fb.lang AND cf.term = fb.term
  JOIN coll c ON c.lang = fb.lang
  GROUP BY fb.query_id
)
SELECT query_id, {_fx('clarity')} AS clarity_x, n_terms
FROM clar ORDER BY query_id
"""


# ------------------------------------- function-score rescore window


def q_rescore_boost(sf_dir: str):
    """Function-score rescore (the Elasticsearch rescore-window +
    FunctionScoreQuery pattern): the BM25 top-10 window is re-ranked by
    boosted_x = floor(score_x * boost_x / 10000), where boost_x is the
    fixed-point doc-length prior 1 + ln(1 + n_chars/1000) — all-integer
    arithmetic after the two fixed-point floors, so engine and oracle
    agree bit-for-bit. The metadata lookup is a broadcast result-sized
    id set against a column-pruned documents scan (never a doc-table
    materialization); the rescore itself touches window-sized state
    only."""
    top = q_bm25_standard(sf_dir)
    ids = pa.array(sorted(set(top["doc_id"].astype(np.int64))), pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=ids))

    meta = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    nchars = dict(zip(meta["doc_id"].astype(np.int64),
                      meta["n_chars"].astype(np.int64)))

    out = top.copy()
    boosts = np.array(
        [
            int(math.floor((1.0 + math.log(1.0 + nchars[d] / 1000.0))
                           * 10000.0 + 0.5))
            for d in out["doc_id"].astype(np.int64)
        ],
        np.int64,
    )
    out["boost_x"] = boosts
    out["boosted_x"] = (
        out["score_x"].astype(np.int64) * boosts
    ) // 10000
    out = out.sort_values(
        ["query_id", "boosted_x", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int64) + 1
    return out[["query_id", "rank", "doc_id", "boosted_x", "boost_x"]]


def _rescore_boost_sql() -> str:
    bm25 = _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)
    return f"""
WITH top AS ({bm25}),
boosted AS (
  SELECT t.query_id AS query_id, t.doc_id AS doc_id,
         (t.score_x * {_fx('1.0 + ln(1.0 + d.n_chars / 1000.0)')})
           // 10000 AS boosted_x,
         {_fx('1.0 + ln(1.0 + d.n_chars / 1000.0)')} AS boost_x
  FROM top t JOIN documents d ON d.doc_id = t.doc_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY boosted_x DESC, doc_id ASC)
            AS BIGINT) AS rank,
       doc_id, boosted_x, boost_x
FROM boosted
"""


# ---------------------------------------- stopword auto-detection

# index-time stopword candidates: terms present in >= this fraction of a
# language's docs (the df/N census an analyzer build runs before fixing
# its stop list)
STOPWORD_DF_RATIO = 0.5


def q_stopword_detect(sf_dir: str):
    """Stopword auto-detection: per language, every term whose document
    frequency reaches STOPWORD_DF_RATIO of the language's corpus, with
    the fixed-point ratio. Zero-shuffle beyond the df groupby the df
    artifact already pays; per-lang N is a thin one-column scan
    broadcast into the filter."""
    n_docs = {
        r["lang"]: r["count()"]
        for r in read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["lang"])
        .groupby("lang")
        .count()
        .take_all()
    }
    n_ref = ray.put(n_docs)

    def pick(t: pa.Table) -> pa.Table:
        n = ray.get(n_ref)
        langs = t["lang"].to_pylist()
        dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = np.array([n[l] for l in langs], np.int64)
        ratio = dfs / nd
        keep = ratio >= STOPWORD_DF_RATIO
        ratio_x = np.floor(ratio * 10000.0 + 0.5).astype(np.int64)
        out = pa.table(
            {
                "lang": pa.array(np.asarray(langs, object)[keep], pa.string()),
                "term": pc.cast(t["term"], pa.string()).filter(
                    pa.array(keep)
                ),
                "df": pa.array(dfs[keep], pa.int64()),
                "n_docs": pa.array(nd[keep], pa.int64()),
                "ratio_x": pa.array(ratio_x[keep], pa.int64()),
            }
        )
        return out

    return q_term_df(sf_dir).map_batches(pick, batch_format="pyarrow")


_STOPWORD_SQL = f"""
WITH {_TOK_CTE},
df AS (SELECT lang, term, count(*) AS df FROM tok GROUP BY lang, term),
n AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
SELECT df.lang AS lang, df.term AS term, CAST(df.df AS BIGINT) AS df,
       CAST(n.n_docs AS BIGINT) AS n_docs,
       {_fx('df.df / CAST(n.n_docs AS DOUBLE)')} AS ratio_x
FROM df JOIN n ON n.lang = df.lang
WHERE df.df / CAST(n.n_docs AS DOUBLE) >= {STOPWORD_DF_RATIO}
"""


# ---------------------------------------- champion-list (top-docs) pruning

CHAMP_M = 5


def _qterm_scan(sf_dir: str):
    """ONE corpus pass shared by the candidate-restricted exact-BM25
    family (champion_topk, msm_search): each tokenize batch emits (a)
    exact per-lang (dl-sum, n_docs) partials and (b) the QUERYSET
    terms' postings rows. Returns (qterm_w, lang_of, stats, post, dfc):
    per-query term multiplicities, query langs, per-lang (N, exact
    avgdl), the query-term postings frame, and per-(lang, term) df."""
    from ..stages.postings import emit_postings

    qterm_w: dict[str, dict[str, int]] = {}
    for qid, text, _l in QUERYSET:
        c: dict[str, int] = {}
        for t in tokenize_simple(text):
            c[t] = c.get(t, 0) + 1
        qterm_w[qid] = c
    lang_of = {qid: lang for qid, _t, lang in QUERYSET}
    term_set = pa.array(
        sorted({t for c in qterm_w.values() for t in c}), pa.string()
    )

    def scan(t: pa.Table) -> pa.Table:
        p = emit_postings(t)
        p = p.filter(pc.is_in(p["term"], value_set=term_set))
        langs = np.asarray(t["lang"].to_pandas(), dtype=object)
        dls = t["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        sp = (
            pd.DataFrame({"lang": langs, "dl": dls})
            .groupby("lang", sort=False)["dl"]
            .agg(["sum", "count"])
            .reset_index()
        )
        out_a = pa.table(
            {
                "kind": pa.array(np.zeros(len(sp), np.int64)),
                "lang": pa.array(sp["lang"], pa.string()),
                "term": pa.array([""] * len(sp), pa.string()),
                "url": pa.array([""] * len(sp), pa.string()),
                "dl": pa.array(sp["sum"].to_numpy().astype(np.int64)),
                "tf": pa.array(sp["count"].to_numpy().astype(np.int64)),
            }
        )
        out_b = pa.table(
            {
                "kind": pa.array(np.ones(len(p), np.int64)),
                "lang": p["lang"],
                "term": p["term"],
                "url": p["url"],
                "dl": pc.cast(p["dl"], pa.int64()),
                "tf": pc.cast(p["tf"], pa.int64()),
            }
        )
        return pa.concat_tables([out_a, out_b])

    rows = _tokens_ds(sf_dir).map_batches(scan, batch_format="pyarrow").to_pandas()

    sp = rows[rows["kind"] == 0].groupby("lang")[["dl", "tf"]].sum()
    stats = {
        lang: (int(r["tf"]), int(r["dl"]) / int(r["tf"]))  # (N, exact avgdl)
        for lang, r in sp.iterrows()
    }
    post = rows[rows["kind"] == 1]
    dfc = post.groupby(["lang", "term"], sort=False).size().to_dict()
    return qterm_w, lang_of, stats, post, dfc


def _score_candidate_sets(sf_dir: str, cand_fn, k1: float = 1.2,
                          b: float = 0.75) -> pd.DataFrame:
    """Shared exact-BM25-on-candidates core for the candidate-restricted
    query policies (champion_topk / msm_search / common_terms): runs
    :func:`_qterm_scan`, then per query scores ``cand_fn(qid, c, lang,
    ctx)``'s candidate urls with standard BM25 (multiplicity weights,
    lucene idf, fixed-point), ranked top-10 by (score_x desc, doc asc).
    ``ctx`` carries {get_docs_of, tf_of, dfc, stats, post}. The policies
    differ ONLY in candidate selection."""
    qterm_w, lang_of, stats, post, dfc = _qterm_scan(sf_dir)

    tf_of: dict[tuple[str, str, str], int] = {}
    dl_of: dict[str, int] = {}
    for _k, lang, term, url, dl_, tf_ in post.itertuples(index=False):
        tf_of[(lang, term, url)] = int(tf_)
        dl_of[url] = int(dl_)

    _docs_of_cache: dict = {}

    def get_docs_of() -> dict:
        # built lazily — champion's cand_fn re-groups post itself and
        # never needs the per-(lang, term) url lists
        if not _docs_of_cache:
            d: dict[tuple[str, str], list[str]] = {}
            for _k, lang, term, url, _dl, _tf in post.itertuples(index=False):
                d.setdefault((lang, term), []).append(url)
            _docs_of_cache["d"] = d
        return _docs_of_cache["d"]

    ctx = {
        "get_docs_of": get_docs_of, "tf_of": tf_of, "dfc": dfc,
        "stats": stats, "post": post,
    }

    out = []
    for qid, c in sorted(qterm_w.items()):
        lang = lang_of[qid]
        if lang not in stats:
            continue
        n, avgdl = stats[lang]
        cand = cand_fn(qid, c, lang, ctx)
        scored = []
        for url in cand:
            s = 0.0
            for term, w in c.items():
                tf_ = tf_of.get((lang, term, url), 0)
                if tf_ == 0:
                    continue
                df_ = dfc[(lang, term)]
                idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
                s += (
                    w * idf * (tf_ * (k1 + 1))
                    / (tf_ + k1 * (1 - b + b * dl_of[url] / avgdl))
                )
            if s > 0:
                scored.append((int(math.floor(s * 10000.0 + 0.5)), int(url)))
        scored.sort(key=lambda r: (-r[0], r[1]))
        for rank, (sx, did) in enumerate(scored[:10], 1):
            out.append((qid, rank, did, sx))
    return pd.DataFrame(
        out, columns=["query_id", "rank", "doc_id", "score_x"]
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_champion_topk(sf_dir: str):
    """Champion-list retrieval (impact-ordered pruning, IIR ch.7): each
    term keeps a precomputed champion list — its top CHAMP_M docs by
    (tf desc, doc asc) — and a query is scored ONLY on the union of its
    terms' champion lists, with exact BM25 (standard k1=1.2/b=0.75,
    lucene idf, multiplicity weights) on that candidate set.

    Scale shape: at 100 TB the champion lists are an impact-ordered
    index artifact written at build time (one extra per-term top-m
    kept while encoding postings — no extra pass). This demo derives
    them in ONE corpus pass: each tokenize batch emits (a) exact
    per-lang dl-sum/count partials and (b) the query terms' postings
    rows; the driver folds stats, df, champion cuts, and the
    candidate-set scores, all result-sized except the hot-term postings
    rows (which the build-time artifact removes)."""
    champs_cache: dict = {}

    def cand_fn(qid, c, lang, ctx):
        if not champs_cache:
            champs_cache.update(
                {
                    key: list(
                        g.sort_values(
                            ["tf", "url"], ascending=[False, True]
                        ).head(CHAMP_M)["url"]
                    )
                    for key, g in ctx["post"].groupby(
                        ["lang", "term"], sort=False
                    )
                }
            )
        return sorted(
            {u for term in c for u in champs_cache.get((lang, term), ())}
        )

    return _score_candidate_sets(sf_dir, cand_fn)


def _champion_sql(k1: float = 1.2, b: float = 0.75) -> str:
    denom = f"(tok.tf + {k1}*(1 - {b} + {b} * d.dl / s.avgdl))"
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup=False)}),
champ AS (
  SELECT lang, term, doc_id FROM (
    SELECT lang, term, doc_id,
           row_number() OVER (PARTITION BY lang, term
                              ORDER BY tf DESC, doc_id ASC) AS rn
    FROM tok
  ) WHERE rn <= {CHAMP_M}
),
cand AS (
  SELECT DISTINCT q.query_id AS query_id, c.doc_id AS doc_id
  FROM q JOIN champ c ON c.lang = q.lang AND c.term = q.term
),
scores AS (
  SELECT q.query_id AS query_id, cand.doc_id AS doc_id,
         sum( q.w * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * ({k1} + 1)) / {denom} ) AS score
  FROM q
  JOIN cand ON cand.query_id = q.query_id
  JOIN tok ON tok.doc_id = cand.doc_id AND tok.lang = q.lang
           AND tok.term = q.term
  JOIN df ON df.lang = q.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = cand.doc_id
  JOIN stats s ON s.lang = q.lang
  GROUP BY q.query_id, cand.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


# --------------------------------------- near-dup cluster-size report


def q_neardup_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size distribution (the dedup-dashboard
    histogram: how much of the corpus collapses, and into how large
    clusters): component sizes from the verified minhash pair graph,
    then clusters per size. Two tiny groupbys over the result-sized
    component table — the pair graph and its components never touch
    doc-sized state."""
    comp = q_neardup_components(sf_dir).to_pandas()
    sizes = comp.groupby("rep").size().reset_index(name="size")
    hist = sizes.groupby("size").size().reset_index(name="n_clusters")
    hist["size"] = hist["size"].astype(np.int64)
    hist["n_clusters"] = hist["n_clusters"].astype(np.int64)
    return hist.sort_values("size").reset_index(drop=True)


def _cluster_sizes_sql() -> str:
    return """
WITH comp AS ({comp}),
sizes AS (SELECT rep, count(*) AS sz FROM comp GROUP BY rep)
SELECT CAST(sz AS BIGINT) AS size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY sz ORDER BY size
"""


# --------------------------------------- ordered sloppy-phrase query

# (pair_id, first_term, second_term): first must precede second within
# SLOP_GAP tokens (Lucene SpanNearQuery inOrder=true)
SLOPSET = [
    ("sp1", "hash", "join"),
    ("sp2", "window", "merge"),
    ("sp3", "big", "data"),
]
SLOP_GAP = 3


def q_phrase_slop(sf_dir: str):
    """Ordered sloppy phrase (Lucene SpanNear inOrder=true): docs where
    term A occurs BEFORE term B with gap <= SLOP_GAP tokens, with the
    ordered-pair count — the directional complement of near_search's
    unordered window, served from the SAME positional index
    (thash-pruned reads, doc-hash cogroup, one-sided packed-key
    searchsorted kernel: positional.py _ordered_near_partition)."""
    from .positional import build_positional_index, ordered_proximity_query

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = f"/tmp/drr_cache/{key}/posindex"
    build_positional_index(
        f"{sf_dir}/documents.parquet", index_dir, num_parts=32
    )
    return ordered_proximity_query(index_dir, SLOPSET, SLOP_GAP)


def _phrase_slop_sql() -> str:
    pvalues = ", ".join(
        f"('{pid}', '{a}', '{b}')" for pid, a, b in SLOPSET
    )
    return f"""
WITH {_TOKS_CTE},
pos AS (SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l)+1)) AS p FROM toks),
pr(pair_id, ta, tb) AS (VALUES {pvalues}),
m AS (
  SELECT pr.pair_id AS pair_id, a.doc_id AS doc_id, count(*) AS n_matches
  FROM pr
  JOIN pos a ON a.term = pr.ta
  JOIN pos b ON b.doc_id = a.doc_id AND b.term = pr.tb
  WHERE b.p - a.p BETWEEN 1 AND {SLOP_GAP}
  GROUP BY pr.pair_id, a.doc_id
)
SELECT pair_id, doc_id, CAST(n_matches AS BIGINT) AS n_matches FROM m
"""


# ------------------------------------------- span-first positional query

SPANFIRST_TERMS = ("spark", "window", "merge")
SPANFIRST_N = 3  # the term must occur within the first N tokens


def q_span_first(sf_dir: str):
    """Lucene SpanFirstQuery: every doc where the term occurs within the
    first SPANFIRST_N tokens, with its 0-based first position — served
    from the positional index (thash-partition-pruned read of ONLY the
    query terms' partition dirs; the per-batch kernel takes each
    positions-list head via offset arrays, no Python loop over rows).
    The title/lead-paragraph boost primitive of web ranking."""
    from .positional import _candidate_rows, build_positional_index

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = f"/tmp/drr_cache/{key}/posindex"
    build_positional_index(
        f"{sf_dir}/documents.parquet", index_dir, num_parts=32
    )
    ds = _candidate_rows(index_dir, SPANFIRST_TERMS)
    if ds is None:  # no partition holds any query term
        return pd.DataFrame(
            {
                "term": pd.Series(dtype=object),
                "doc_id": pd.Series(dtype="int64"),
                "first_pos": pd.Series(dtype="int64"),
            }
        )

    def pick(t: pa.Table) -> pa.Table:
        pos = t["positions"]
        if isinstance(pos, pa.ChunkedArray):
            pos = pos.combine_chunks()
        offsets = pos.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = pos.values.to_numpy(zero_copy_only=False).astype(np.int64)
        first = vals[offsets[:-1]]
        keep = first < SPANFIRST_N
        return pa.table(
            {
                "term": pc.cast(t["term"], pa.string()).filter(
                    pa.array(keep)
                ),
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "first_pos": pa.array(first[keep], pa.int64()),
            }
        )

    out = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    return out.sort_values(["term", "doc_id"]).reset_index(drop=True)


def _span_first_sql() -> str:
    tvalues = ", ".join(f"('{t}')" for t in SPANFIRST_TERMS)
    return f"""
WITH {_TOKS_CTE},
st(term) AS (VALUES {tvalues}),
hits AS (
  SELECT st.term AS term, toks.doc_id AS doc_id,
         CAST(list_position(toks.l, st.term) - 1 AS BIGINT) AS first_pos
  FROM st JOIN toks ON list_position(toks.l, st.term) > 0
)
SELECT term, doc_id, first_pos FROM hits
WHERE first_pos < {SPANFIRST_N}
ORDER BY term, doc_id
"""


# -------------------------------------- language-label QA report


def q_lang_mismatch(sf_dir: str):
    """Corpus-QA confusion report: labeled language vs the n-gram
    language detector's prediction, per (labeled, predicted) cell with
    a mismatch flag — the audit a crawl pipeline runs before trusting
    source-provided language tags. Per-batch partial counts before one
    tiny cells-sized groupby; zero doc-sized exchanges."""

    def scan(t: pa.Table) -> pa.Table:
        pred = langid_batch(t)
        pdf = pd.DataFrame(
            {
                "labeled_lang": np.asarray(t["lang"].to_pandas(), object),
                "pred_lang": np.asarray(
                    pred["pred_lang"].to_pandas(), object
                ),
            }
        )
        g = (
            pdf.groupby(["labeled_lang", "pred_lang"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return from_pandas_clean(g, preserve_index=False)

    agg = (
        _docs(sf_dir)
        .map_batches(scan, batch_format="pyarrow")
        .groupby(["labeled_lang", "pred_lang"])
        .sum("n")
    )

    def finish(t: pa.Table) -> pa.Table:
        lab = t["labeled_lang"]
        pred = t["pred_lang"]
        n = pc.cast(t["sum(n)"], pa.int64())
        mism = pc.cast(
            pc.not_equal(pc.cast(lab, pa.string()), pc.cast(pred, pa.string())),
            pa.int64(),
        )
        return pa.table(
            {
                "labeled_lang": lab,
                "pred_lang": pred,
                "n": n,
                "mismatch": mism,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _lang_mismatch_sql() -> str:
    return f"""
WITH li AS ({_langid_sql()})
SELECT d.lang AS labeled_lang, li.pred_lang AS pred_lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CASE WHEN d.lang <> li.pred_lang THEN 1 ELSE 0 END AS BIGINT)
         AS mismatch
FROM li JOIN documents d ON d.doc_id = li.doc_id
GROUP BY d.lang, li.pred_lang
"""


# ---------------------------------------------- tiered-index serving


def q_tiered_bm25(sf_dir: str):
    """Tiered-index serving policy (IIR 7.2.1): tier 1 scores only the
    champion lists (champion_topk); a query whose tier-1 result already
    holds a full top-10 is answered from tier 1 alone, otherwise it
    falls back to the full index (bm25_standard). The output tags which
    tier answered. At scale this is the latency/recall dial — tier 1
    touches m·|q| postings per query regardless of corpus size, and the
    fallback rate is the observable quality counter."""
    t1 = q_champion_topk(sf_dir)
    full = q_bm25_standard(sf_dir)

    counts = t1.groupby("query_id").size()
    tier1_full = {q for q, n in counts.items() if n >= 10}

    keep1 = t1[t1["query_id"].isin(tier1_full)].copy()
    keep1["tier"] = np.int64(1)
    keep2 = full[~full["query_id"].isin(tier1_full)].copy()
    keep2["tier"] = np.int64(2)
    out = pd.concat([keep1, keep2], ignore_index=True)
    out["tier"] = out["tier"].astype(np.int64)
    return out[["query_id", "rank", "doc_id", "score_x", "tier"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def _tiered_sql() -> str:
    champ = _champion_sql()
    full = _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)
    return f"""
WITH t1 AS ({champ}),
full_r AS ({full}),
t1full AS (
  SELECT query_id FROM t1 GROUP BY query_id HAVING count(*) >= 10
)
SELECT t1.query_id AS query_id, t1.rank AS rank, t1.doc_id AS doc_id,
       t1.score_x AS score_x, CAST(1 AS BIGINT) AS tier
FROM t1 WHERE t1.query_id IN (SELECT query_id FROM t1full)
UNION ALL
SELECT f.query_id, f.rank, f.doc_id, f.score_x, CAST(2 AS BIGINT) AS tier
FROM full_r f WHERE f.query_id NOT IN (SELECT query_id FROM t1full)
"""


# -------------------------------------------- data-mixture planning

MIX_BUDGET = 10_000  # docs in the planned training mixture


def q_mix_plan(sf_dir: str):
    """Training-data mixture plan (domain-reweighting, DoReMi-style
    bookkeeping): per source, the corpus share, the uniform-target
    sampling weight (target_share / actual_share, fixed-point) and the
    planned doc count under MIX_BUDGET, capped at availability — the
    plan a data loader executes when rebalancing skewed web sources.
    One thin (source, n_chars) scan with per-batch partials into a
    sources-sized groupby; everything downstream is sources-sized."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(t: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {
                "source": np.asarray(t["source"].to_pandas(), dtype=object),
                "n_chars": t["n_chars"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        )
        g = (
            pdf.groupby("source", sort=False)["n_chars"]
            .agg(["count", "sum"])
            .reset_index()
        )
        g.columns = ["source", "n_docs", "sum_chars"]
        return from_pandas_clean(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["n_docs", "sum_chars"])
        .to_pandas()
        .rename(columns={"sum(n_docs)": "n_docs", "sum(sum_chars)": "sum_chars"})
    )
    total = int(agg["n_docs"].sum())
    n_sources = len(agg)
    agg = agg.sort_values("source").reset_index(drop=True)
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    agg["sum_chars"] = agg["sum_chars"].astype(np.int64)
    agg["avg_chars_x"] = np.floor(
        agg["sum_chars"] / agg["n_docs"] * 10000.0 + 0.5
    ).astype(np.int64)
    target = 1.0 / n_sources
    agg["weight_x"] = np.floor(
        target / (agg["n_docs"] / total) * 10000.0 + 0.5
    ).astype(np.int64)
    agg["planned"] = np.minimum(
        agg["n_docs"].to_numpy(),
        np.floor(target * MIX_BUDGET).astype(np.int64),
    ).astype(np.int64)
    return agg[
        ["source", "n_docs", "sum_chars", "avg_chars_x", "weight_x", "planned"]
    ]


_MIX_SQL = f"""
WITH s AS (
  SELECT source, count(*) AS n_docs, sum(n_chars) AS sum_chars
  FROM documents GROUP BY source
),
t AS (SELECT sum(n_docs) AS total, count(*) AS n_sources FROM s)
SELECT s.source AS source, CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(s.sum_chars AS BIGINT) AS sum_chars,
       CAST(floor(s.sum_chars / CAST(s.n_docs AS DOUBLE) * 10000.0 + 0.5)
            AS BIGINT) AS avg_chars_x,
       CAST(floor((1.0 / t.n_sources)
                  / (s.n_docs / CAST(t.total AS DOUBLE)) * 10000.0 + 0.5)
            AS BIGINT) AS weight_x,
       CAST(least(s.n_docs,
                  CAST(floor((1.0 / t.n_sources) * {MIX_BUDGET}) AS BIGINT))
            AS BIGINT) AS planned
FROM s, t
ORDER BY source
"""


# ----------------------------------------------- burst detection


def q_burst_windows(sf_dir: str):
    """Stream burst detection (Kleinberg-style threshold form, all
    integer): per (event_type, hour) counts, then a window is a burst
    when its count exceeds 1.5x the sum of its 3 PRECEDING windows
    (3n > 2*prev3, row-lag semantics — gaps don't reset). Per-batch
    partial counts collapse before the one (type, hour) exchange; the
    lag pass is a per-type map_groups over the windows-sized aggregate,
    so post-aggregation state never scales with the event count."""
    ev = _events(sf_dir, columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": np.asarray(
                    t["event_type"].to_pandas(), dtype=object
                ),
                "hour_ts": (tsu // 3_600_000_000) * 3600,
            }
        )
        g = (
            df.groupby(["event_type", "hour_ts"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return from_pandas_clean(g, preserve_index=False)

    counts = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour_ts"])
        .sum("n")
    )

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.rename(columns={"sum(n)": "n"}).sort_values("hour_ts")
        n = g["n"].to_numpy(np.int64)
        prev3 = np.array(
            [n[max(0, i - 3):i].sum() for i in range(len(n))], np.int64
        )
        rn = np.arange(1, len(n) + 1)
        g = g.reset_index(drop=True)
        g["n"] = n
        g["prev3"] = prev3
        g["burst"] = ((rn > 3) & (3 * n > 2 * prev3)).astype(np.int64)
        g["hour_ts"] = g["hour_ts"].astype(np.int64)
        return g[["event_type", "hour_ts", "n", "prev3", "burst"]]

    return counts.groupby("event_type").map_groups(lag, batch_format="pandas")


_BURST_SQL = """
WITH w AS (
  SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
         count(*) AS n
  FROM events GROUP BY event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
),
l AS (
  SELECT event_type, hour_ts, CAST(n AS BIGINT) AS n,
         CAST(coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY hour_ts
                                    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS prev3,
         row_number() OVER (PARTITION BY event_type ORDER BY hour_ts) AS rn
  FROM w
)
SELECT event_type, hour_ts, n, prev3,
       CAST(CASE WHEN rn > 3 AND 3*n > 2*prev3 THEN 1 ELSE 0 END AS BIGINT)
         AS burst
FROM l
"""


# --------------------------------------------- exact heavy hitters

HH_K = 64  # report terms with share > 1/HH_K of a language's tokens


def q_heavy_hitters(sf_dir: str):
    """EXACT heavy hitters (terms with > 1/HH_K of a language's token
    occurrences) via the classic two-pass pattern: pass 1 emits each
    batch's LOCAL heavy candidates (batch_tf x K > batch_total — by
    pigeonhole a globally-heavy item is locally heavy in at least one
    batch, so the union is a lossless candidate filter, <= K per
    (batch, lang)) plus exact per-lang token totals; pass 2 recounts
    ONLY the candidates exactly. This is how exact heavy hitters run at
    100 TB — the candidate exchange is K-bounded per batch, never
    vocabulary-sized, and the verify pass is a filtered scan."""
    def pass1(t: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {
                "lang": np.asarray(t["lang"].to_pandas(), dtype=object),
                "term": np.asarray(t["term"].to_pandas(), dtype=object),
                "tf": t["tf"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = pdf.groupby(["lang", "term"], sort=False)["tf"].sum().reset_index()
        tot = g.groupby("lang", sort=False)["tf"].sum().rename("total")
        g = g.join(tot, on="lang")
        cand = g[g["tf"] * HH_K > g["total"]]
        out_tot = tot.reset_index()
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(out_tot), np.int64),
                         np.ones(len(cand), np.int64)]
                    )
                ),
                "lang": pa.array(
                    list(out_tot["lang"]) + list(cand["lang"]), pa.string()
                ),
                "term": pa.array(
                    [""] * len(out_tot) + list(cand["term"]), pa.string()
                ),
                "tf": pa.array(
                    np.concatenate(
                        [out_tot["total"].to_numpy().astype(np.int64),
                         np.zeros(len(cand), np.int64)]
                    )
                ),
            }
        )

    p1 = _postings_ds(sf_dir).map_batches(pass1, batch_format="pyarrow").to_pandas()
    totals = p1[p1["kind"] == 0].groupby("lang")["tf"].sum().to_dict()
    cand_keys = pa.array(
        sorted(
            {l + "\x00" + t for _k, l, t, _tf in
             p1[p1["kind"] == 1].itertuples(index=False)}
        ),
        pa.string(),
    )

    def pass2(t: pa.Table) -> pa.Table:
        langs = t["lang"]
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        keys = pc.binary_join_element_wise(langs, terms, "\x00")
        m = pc.is_in(keys, value_set=cand_keys)
        t2 = t.filter(m)
        pdf = pd.DataFrame(
            {
                "lang": np.asarray(t2["lang"].to_pandas(), dtype=object),
                "term": np.asarray(t2["term"].to_pandas(), dtype=object),
                "tf": t2["tf"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = pdf.groupby(["lang", "term"], sort=False)["tf"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    counts = (
        _postings_ds(sf_dir)
        .map_batches(pass2, batch_format="pyarrow")
        .to_pandas()
        .groupby(["lang", "term"], sort=False)["tf"]
        .sum()
        .reset_index()
    )
    counts["total"] = counts["lang"].map(totals).astype(np.int64)
    out = counts[counts["tf"] * HH_K > counts["total"]].copy()
    out["share_x"] = np.floor(
        out["tf"] / out["total"] * 10000.0 + 0.5
    ).astype(np.int64)
    out["tf"] = out["tf"].astype(np.int64)
    return out[["lang", "term", "tf", "share_x"]].sort_values(
        ["lang", "term"]
    ).reset_index(drop=True)


_HEAVY_SQL = f"""
WITH {_TOK_CTE},
tt AS (SELECT lang, sum(tf) AS total FROM tok GROUP BY lang),
s AS (SELECT lang, term, sum(tf) AS tf FROM tok GROUP BY lang, term)
SELECT s.lang AS lang, s.term AS term, CAST(s.tf AS BIGINT) AS tf,
       {_fx('s.tf / CAST(tt.total AS DOUBLE)')} AS share_x
FROM s JOIN tt ON tt.lang = s.lang
WHERE s.tf * {HH_K} > tt.total
ORDER BY lang, term
"""


# ----------------------------------------- synonym-expanded retrieval

# static synonym table (Lucene SynonymGraphFilter semantics: the synonym
# joins the query at the same position/weight as the original token) —
# the table is part of the operator spec, like patterns and thresholds
SYNONYMS = {"join": ("merge",), "sort": ("order",), "big": ("small",)}


def q_synonym_search(sf_dir: str):
    """Synonym-expanded retrieval: each query token also contributes its
    synonym-table entries at the same weight (Lucene synonym filter at
    query time), then standard BM25 through the UNCHANGED shared-shard
    scorer pool. Expansion is a driver-side constant-table rewrite —
    the serving path, candidate generation and scoring are exactly
    bm25_standard's."""
    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    items = []
    for qid, text, lang in QUERYSET:
        toks = list(tokenize_simple(text))
        expanded = list(toks)
        for t in toks:
            expanded.extend(SYNONYMS.get(t, ()))
        items.append(
            {"query_id": qid, "query": " ".join(expanded), "lang": lang}
        )
    res = bm25_search(
        ray.data.from_items(items), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        round_dp=4,
    )
    return _results_to_docids(res.to_pandas())


def _synonym_sql(k1: float = 1.2, b: float = 0.75) -> str:
    rows = []
    for qid, text, lang in QUERYSET:
        toks = list(tokenize_simple(text))
        expanded = list(toks)
        for t in toks:
            expanded.extend(SYNONYMS.get(t, ()))
        c: dict[str, int] = {}
        for t in expanded:
            c[t] = c.get(t, 0) + 1
        for t, w in sorted(c.items()):
            rows.append(f"('{qid}', '{lang}', '{t}', {w})")
    denom = f"(tok.tf + {k1}*(1 - {b} + {b} * d.dl / s.avgdl))"
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, lang, term, w) AS (VALUES {", ".join(rows)}),
scores AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id,
         sum( q.w * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * ({k1} + 1)) / {denom} ) AS score
  FROM q
  JOIN tok ON tok.lang = q.lang AND tok.term = q.term
  JOIN df ON df.lang = q.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = tok.doc_id
  JOIN stats s ON s.lang = q.lang
  GROUP BY q.query_id, tok.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


# ------------------------------------------ common-terms query policy

CT_DF_RATIO = 0.5  # df/N above this = "common" (stopword-class) term


def q_common_terms(sf_dir: str):
    """Common-terms query (Lucene CommonTermsQuery): query terms split
    into rare (df/N <= CT_DF_RATIO) and common; only docs matching at
    least one RARE term qualify, then exact BM25 over ALL the query's
    terms on that candidate set — hot terms boost ranking but cannot
    select candidates, which is the policy that keeps stopword-class
    terms from exploding the candidate set at scale. Shares the
    champion family's one-pass scan + candidate-scoring core
    (:func:`_score_candidate_sets`)."""

    def cand_fn(qid, c, lang, ctx):
        n, _avgdl = ctx["stats"][lang]
        dfc = ctx["dfc"]
        rare = [
            t for t in c
            if (lang, t) in dfc and dfc[(lang, t)] / n <= CT_DF_RATIO
        ]
        return sorted(
            {u for t in rare for u in ctx["get_docs_of"]().get((lang, t), ())}
        )

    return _score_candidate_sets(sf_dir, cand_fn)


def _common_terms_sql(k1: float = 1.2, b: float = 0.75) -> str:
    qd_rows = []
    for qid, text, lang in QUERYSET:
        for t in sorted(set(tokenize_simple(text))):
            qd_rows.append(f"('{qid}', '{lang}', '{t}')")
    denom = f"(tok.tf + {k1}*(1 - {b} + {b} * d.dl / s.avgdl))"
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup=False)}),
qd(query_id, lang, term) AS (VALUES {", ".join(qd_rows)}),
rare AS (
  SELECT qd.query_id AS query_id, qd.lang AS lang, qd.term AS term
  FROM qd
  JOIN df ON df.lang = qd.lang AND df.term = qd.term
  JOIN stats s ON s.lang = qd.lang
  WHERE df.df / CAST(s.n_docs AS DOUBLE) <= {CT_DF_RATIO}
),
qual AS (
  SELECT DISTINCT r.query_id AS query_id, tok.doc_id AS doc_id
  FROM rare r JOIN tok ON tok.lang = r.lang AND tok.term = r.term
),
scores AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id,
         sum( q.w * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * ({k1} + 1)) / {denom} ) AS score
  FROM q
  JOIN qual ON qual.query_id = q.query_id
  JOIN tok ON tok.doc_id = qual.doc_id AND tok.lang = q.lang
           AND tok.term = q.term
  JOIN df ON df.lang = q.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = qual.doc_id
  JOIN stats s ON s.lang = q.lang
  GROUP BY q.query_id, tok.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


# --------------------------------------- minimum-should-match retrieval

MSM_M = 2  # a doc must match at least this many DISTINCT query terms


def q_msm_search(sf_dir: str):
    """Minimum-should-match retrieval (Lucene `minimum_should_match`):
    only docs containing >= MSM_M distinct query terms qualify, ranked
    by exact standard BM25 (k1=1.2/b=0.75, lucene idf, multiplicity
    weights) — the precision knob that kills one-hot-term matches on
    multi-term queries. Shares the champion family's ONE-pass scan +
    candidate-scoring core (:func:`_score_candidate_sets`); the
    qualifying filter folds over result-sized driver state."""

    def cand_fn(qid, c, lang, ctx):
        hits: dict[str, int] = {}
        for term in c:
            for url in ctx["get_docs_of"]().get((lang, term), ()):
                hits[url] = hits.get(url, 0) + 1
        return sorted(u for u, k in hits.items() if k >= MSM_M)

    return _score_candidate_sets(sf_dir, cand_fn)


def _msm_sql(k1: float = 1.2, b: float = 0.75) -> str:
    qd_rows = []
    for qid, text, lang in QUERYSET:
        for t in sorted(set(tokenize_simple(text))):
            qd_rows.append(f"('{qid}', '{lang}', '{t}')")
    denom = f"(tok.tf + {k1}*(1 - {b} + {b} * d.dl / s.avgdl))"
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup=False)}),
qd(query_id, lang, term) AS (VALUES {", ".join(qd_rows)}),
qual AS (
  SELECT qd.query_id AS query_id, tok.doc_id AS doc_id
  FROM qd JOIN tok ON tok.lang = qd.lang AND tok.term = qd.term
  GROUP BY qd.query_id, tok.doc_id
  HAVING count(*) >= {MSM_M}
),
scores AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id,
         sum( q.w * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * ({k1} + 1)) / {denom} ) AS score
  FROM q
  JOIN qual ON qual.query_id = q.query_id
  JOIN tok ON tok.doc_id = qual.doc_id AND tok.lang = q.lang
           AND tok.term = q.term
  JOIN df ON df.lang = q.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = qual.doc_id
  JOIN stats s ON s.lang = q.lang
  GROUP BY q.query_id, tok.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


# -------------------------------------------- federated multi-shard search


def q_bm25_federated(sf_dir: str):
    """Federated scatter-gather retrieval: every query fans out to EVERY
    language shard (each scored with that shard's own N/avgdl/df — the
    reference's per-language models, final_implementation.py:290-322,
    searched as one federation instead of routed to a single lang), and
    the per-shard top-10s merge to a global top-10 by (score desc,
    doc_id asc). This is the Elasticsearch-style cross-shard merge: the
    gather sees only shards x k rows per query, never shard-interior
    state, so the merge cost is independent of corpus size."""
    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    # the shard list comes from the index manifests — never a hard-coded
    # language tuple (review fix: a corpus with additional languages must
    # federate over ALL its shards, as the oracle does)
    langs = sorted(os.listdir(os.path.join(index_dir, "manifests")))
    items = [
        {"query_id": qid, "query": text, "lang": lang}
        for qid, text, _l in QUERYSET
        for lang in langs
    ]
    res = bm25_search(
        ray.data.from_items(items), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard"),
        round_dp=4,
    )
    pdf = _results_to_docids(res.to_pandas())
    pdf = pdf.sort_values(
        ["query_id", "score_x", "doc_id"], ascending=[True, False, True]
    )
    top = pdf.groupby("query_id", sort=False).head(10).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount().astype(np.int64) + 1
    return top[["query_id", "rank", "doc_id", "score_x"]]


def _federated_sql(k1: float = 1.2, b: float = 0.75) -> str:
    rows = []
    for qid, text, _lang in QUERYSET:
        c: dict[str, int] = {}
        for t in tokenize_simple(text):
            c[t] = c.get(t, 0) + 1
        for t, w in sorted(c.items()):
            rows.append(f"('{qid}', '{t}', {w})")
    denom = f"(tok.tf + {k1}*(1 - {b} + {b} * d.dl / s.avgdl))"
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, term, w) AS (VALUES {", ".join(rows)}),
scores AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id,
         sum( q.w * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * ({k1} + 1)) / {denom} ) AS score
  FROM q
  JOIN tok ON tok.term = q.term
  JOIN df ON df.lang = tok.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = tok.doc_id
  JOIN stats s ON s.lang = tok.lang
  GROUP BY q.query_id, tok.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


# ------------------------------------------- learning-to-rank features


def q_ltr_features(sf_dir: str):
    """LTR training-feature extraction: for every (query, doc) pair in
    the BM25 top-10 candidates, the classic per-pair feature vector —
    retrieval score (bm25_x), summed query-term tf, matched distinct
    query terms, doc length, and summed lucene idf of the matched terms
    (fixed-point). This is the feature-join a training-data pipeline
    runs between retrieval and a ranker fit.

    Scale shape: ONE postings scan, filtered to the broadcast query-term
    set, emits (a) per-batch partial df counts for those terms and (b)
    the candidate-pair rows (semi-join on the broadcast result-sized
    (query, doc) set) — both result-sized outputs; no doc-table
    materialization, no second corpus pass. At a 10^9-term vocab the df
    partials become an index-artifact lookup instead."""
    top = q_bm25_standard(sf_dir)

    qterms = {qid: sorted(set(tokenize_simple(text))) for qid, text, _l in QUERYSET}
    lang_of = {qid: lang for qid, _t, lang in QUERYSET}
    term_set = pa.array(
        sorted({t for ts in qterms.values() for t in ts}), pa.string()
    )
    cand_docs = docid_to_url(
        pa.array(sorted(set(top["doc_id"].astype(np.int64))), pa.int64())
    )

    def scan(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["term"], value_set=term_set)
        t = t.filter(m)
        # (a) partial df per (lang, term): urls are unique per term here
        pdf = pd.DataFrame(
            {
                "lang": np.asarray(t["lang"].to_pandas(), dtype=object),
                "term": np.asarray(t["term"].to_pandas(), dtype=object),
            }
        )
        dfp = pdf.groupby(["lang", "term"], sort=False).size().reset_index(name="n")
        out_a = pa.table(
            {
                "kind": pa.array(np.zeros(len(dfp), np.int64)),
                "lang": pa.array(dfp["lang"], pa.string()),
                "term": pa.array(dfp["term"], pa.string()),
                "url": pa.array([""] * len(dfp), pa.string()),
                "dl": pa.array(np.zeros(len(dfp), np.int64)),
                "tf": pa.array(dfp["n"].to_numpy().astype(np.int64)),
            }
        )
        # (b) candidate-pair rows
        c = t.filter(pc.is_in(t["url"], value_set=cand_docs))
        out_b = pa.table(
            {
                "kind": pa.array(np.ones(len(c), np.int64)),
                "lang": c["lang"],
                "term": c["term"],
                "url": c["url"],
                "dl": pc.cast(c["dl"], pa.int64()),
                "tf": pc.cast(c["tf"], pa.int64()),
            }
        )
        return pa.concat_tables([out_a, out_b])

    rows = _postings_ds(sf_dir).map_batches(scan, batch_format="pyarrow").to_pandas()
    dfc = (
        rows[rows["kind"] == 0]
        .groupby(["lang", "term"], sort=False)["tf"]
        .sum()
        .to_dict()
    )
    n_docs = {
        r["lang"]: r["count()"]
        for r in read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["lang"])
        .groupby("lang")
        .count()
        .take_all()
    }

    cand = rows[rows["kind"] == 1]
    tf_of: dict[tuple[str, str, str], int] = {}
    dl_of: dict[str, int] = {}
    for _k, lang, term, url, dl_, tf_ in cand.itertuples(index=False):
        tf_of[(lang, term, url)] = int(tf_)
        dl_of[url] = int(dl_)

    # ONE vectorized docid->url pass (review fix: no per-row Arrow calls)
    top_urls = docid_to_url(
        pa.array(top["doc_id"].astype(np.int64), pa.int64())
    ).to_pylist()
    out = []
    for (qid, rank, doc_id, score_x), url in zip(
        top[["query_id", "rank", "doc_id", "score_x"]].itertuples(index=False),
        top_urls,
    ):
        lang = lang_of[qid]
        tf_sum = matched = 0
        idf_sum = 0.0
        for term in qterms[qid]:
            tf_ = tf_of.get((lang, term, url), 0)
            if tf_ > 0:
                tf_sum += tf_
                matched += 1
                df_ = dfc[(lang, term)]
                idf_sum += math.log(
                    1 + (n_docs[lang] - df_ + 0.5) / (df_ + 0.5)
                )
        out.append(
            (
                qid, int(doc_id), int(rank), int(score_x), tf_sum, matched,
                dl_of[url], int(math.floor(idf_sum * 10000.0 + 0.5)),
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "query_id", "doc_id", "rank", "bm25_x", "tf_sum", "matched",
            "dl", "idf_sum_x",
        ],
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)


def _ltr_sql(k1: float = 1.2, b: float = 0.75) -> str:
    qd_rows = []
    for qid, text, lang in QUERYSET:
        for t in sorted(set(tokenize_simple(text))):
            qd_rows.append(f"('{qid}', '{lang}', '{t}')")
    denom = f"(tok.tf + {k1}*(1 - {b} + {b} * d.dl / s.avgdl))"
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup=False)}),
qd(query_id, lang, term) AS (VALUES {", ".join(qd_rows)}),
scores AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id,
         sum( q.w * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * ({k1} + 1)) / {denom} ) AS score
  FROM q
  JOIN tok ON tok.lang = q.lang AND tok.term = q.term
  JOIN df ON df.lang = q.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = tok.doc_id
  JOIN stats s ON s.lang = q.lang
  GROUP BY q.query_id, tok.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS bm25_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
),
top AS (SELECT * FROM ranked WHERE rank <= 10),
feat AS (
  SELECT r.query_id AS query_id, r.doc_id AS doc_id, r.rank AS rank,
         r.bm25_x AS bm25_x,
         CAST(sum(tok.tf) AS BIGINT) AS tf_sum,
         CAST(count(*) AS BIGINT) AS matched,
         {_fx('sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)))')}
           AS idf_sum_x
  FROM top r
  JOIN qd ON qd.query_id = r.query_id
  JOIN tok ON tok.doc_id = r.doc_id AND tok.lang = qd.lang
           AND tok.term = qd.term
  JOIN df ON df.lang = qd.lang AND df.term = qd.term
  JOIN stats s ON s.lang = qd.lang
  GROUP BY r.query_id, r.doc_id, r.rank, r.bm25_x
)
SELECT f.query_id, f.doc_id, f.rank, f.bm25_x, f.tf_sum, f.matched,
       CAST(d.dl AS BIGINT) AS dl, f.idf_sum_x
FROM feat f JOIN dl d ON d.doc_id = f.doc_id
ORDER BY f.query_id, f.rank
"""


# ------------------------------------------------ wildcard term search

# Lucene-style wildcard patterns (`*` = any run, may be leading/infix —
# unlike prefix_search's prefix-only scan path, this one expands against
# the VOCABULARY and scores through the postings, the way a real index
# serves `te*m` queries)
WILDSET = [("w1", "s*k"), ("w2", "st*m"), ("w3", "*ow"), ("w4", "*er*")]


def _termset_retrieval(sf_dir: str, matchers) -> pd.DataFrame:
    """Shared multi-term retrieval core for the vocabulary-expansion
    query family (wildcard / regex): ``matchers`` is [(pattern_id,
    fn(terms: pa.Array) -> pa.BooleanArray)]. Each pattern expands to
    its matching vocabulary terms (distributed scan over the df
    artifact — the vocab never leaves the cluster; only matched terms,
    a query-selective set, reach the driver), then ONE postings scan
    emits per-batch (pattern, doc) partials that a (pattern_id, doc_id)
    groupby finalizes — a matched-docs-sized shuffle, NOT zero-shuffle:
    batch locality is not trusted because Ray splits oversized blocks
    mid-doc. Post-groupby each group lives in one block, so a per-block
    partial top-10 then an O(blocks x patterns x 10) driver re-cut are
    sound."""

    def match_terms(t: pa.Table) -> pa.Table:
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        out_pid, out_terms = [], []
        for pid, fn in matchers:
            sel = terms.filter(fn(terms))
            out_pid.extend([pid] * len(sel))
            out_terms.append(sel)
        return pa.table(
            {
                "pattern_id": pa.array(out_pid, pa.string()),
                "term": pa.concat_arrays(out_terms)
                if out_terms
                else pa.array([], pa.string()),
            }
        )

    matched = (
        q_term_df(sf_dir)
        .map_batches(match_terms, batch_format="pyarrow")
        .to_pandas()
    )
    by_pat = {
        pid: pa.array(sorted(set(g["term"])), pa.string())
        for pid, g in matched.groupby("pattern_id")
    }

    def score(t: pa.Table) -> pa.Table:
        # per-batch PARTIALS only (no top-k cut here): a doc's postings
        # can straddle batches once Ray splits an oversized block, so
        # finality is established by the (pattern, doc) groupby below,
        # not by batch locality (review fix)
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        urls = t["url"].to_numpy(zero_copy_only=False)
        tfs = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        frames = []
        for pid, _fn in matchers:
            tset = by_pat.get(pid)
            if tset is None or len(tset) == 0:
                continue
            m = pc.is_in(terms, value_set=tset).to_numpy(zero_copy_only=False)
            if not m.any():
                continue
            pdf = pd.DataFrame({"doc_id": urls[m].astype(np.int64), "tf": tfs[m]})
            g = pdf.groupby("doc_id", sort=False)["tf"].agg(["sum", "count"])
            g = g.reset_index()
            g.columns = ["doc_id", "total_tf", "n_terms"]
            g.insert(0, "pattern_id", pid)
            frames.append(g)
        if not frames:
            return pa.table(
                {
                    "pattern_id": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "total_tf": pa.array([], pa.int64()),
                    "n_terms": pa.array([], pa.int64()),
                }
            )
        out = pd.concat(frames, ignore_index=True)
        out["total_tf"] = out["total_tf"].astype(np.int64)
        out["n_terms"] = out["n_terms"].astype(np.int64)
        return from_pandas_clean(out, preserve_index=False)

    agg = (
        _postings_ds(sf_dir)
        .map_batches(score, batch_format="pyarrow")
        .groupby(["pattern_id", "doc_id"])
        .sum(["total_tf", "n_terms"])
    )

    def block_top(t: pa.Table) -> pa.Table:
        # post-groupby a (pattern, doc) group lives in exactly one
        # block, so the per-block top-10 cut is now sound
        pdf = t.to_pandas().rename(
            columns={"sum(total_tf)": "total_tf", "sum(n_terms)": "n_terms"}
        )
        pdf = pdf.sort_values(
            ["pattern_id", "total_tf", "doc_id"], ascending=[True, False, True]
        ).groupby("pattern_id", sort=False).head(10)
        pdf["total_tf"] = pdf["total_tf"].astype(np.int64)
        pdf["n_terms"] = pdf["n_terms"].astype(np.int64)
        return from_pandas_clean(pdf, preserve_index=False)

    parts = agg.map_batches(block_top, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["pattern_id", "total_tf", "doc_id"], ascending=[True, False, True]
    )
    top = parts.groupby("pattern_id", sort=False).head(10).reset_index(drop=True)
    top["rank"] = top.groupby("pattern_id").cumcount().astype(np.int64) + 1
    return top[["pattern_id", "rank", "doc_id", "total_tf", "n_terms"]]


def q_wildcard_search(sf_dir: str):
    """Wildcard retrieval (`s*k`, leading `*ow`, infix `*er*`) through
    the shared vocabulary-expansion core (:func:`_termset_retrieval`,
    Arrow match_like = SQL LIKE semantics).

    Scale note: leading-wildcard patterns scan the whole vocab — same
    contract as Lucene (the scan is distributed here); the matched-term
    broadcast assumes query-selective patterns."""
    matchers = [
        (pid, (lambda like: lambda terms: pc.match_like(terms, like))(
            p.replace("*", "%")
        ))
        for pid, p in WILDSET
    ]
    return _termset_retrieval(sf_dir, matchers)


# Lucene RegexpQuery analog: RE2 patterns (unanchored in both Arrow's
# match_substring_regex and DuckDB's regexp_matches — anchor explicitly)
REGEXSET = [
    ("rx1", "^s.a.k$"),
    ("rx2", "^st.*m$"),
    ("rx3", "ow$"),
    ("rx4", "^[a-z]{3}$"),
]


def q_regex_search(sf_dir: str):
    """Regex retrieval (Lucene RegexpQuery): each RE2 pattern expands to
    its matching vocabulary terms and scores through the postings, via
    the same shared core (and the same scale contract) as
    wildcard_search."""
    matchers = [
        (pid, (lambda rx: lambda terms: pc.match_substring_regex(terms, rx))(p))
        for pid, p in REGEXSET
    ]
    return _termset_retrieval(sf_dir, matchers)


def _regex_sql() -> str:
    pvalues = ", ".join(f"('{pid}', '{p}')" for pid, p in REGEXSET)
    return f"""
WITH {_TOK_CTE},
pat(pattern_id, pat) AS (VALUES {pvalues}),
m AS (
  SELECT p.pattern_id AS pattern_id, tok.doc_id AS doc_id,
         sum(tok.tf) AS total_tf, count(*) AS n_terms
  FROM pat p JOIN tok ON regexp_matches(tok.term, p.pat)
  GROUP BY p.pattern_id, tok.doc_id
),
ranked AS (
  SELECT pattern_id, doc_id, CAST(total_tf AS BIGINT) AS total_tf,
         CAST(n_terms AS BIGINT) AS n_terms,
         row_number() OVER (PARTITION BY pattern_id
                            ORDER BY total_tf DESC, doc_id ASC) AS rank
  FROM m
)
SELECT pattern_id, rank, doc_id, total_tf, n_terms
FROM ranked WHERE rank <= 10
"""


def _wildcard_sql() -> str:
    pvalues = ", ".join(
        f"('{pid}', '{p.replace('*', '%')}')" for pid, p in WILDSET
    )
    return f"""
WITH {_TOK_CTE},
pat(pattern_id, pat) AS (VALUES {pvalues}),
m AS (
  SELECT p.pattern_id AS pattern_id, tok.doc_id AS doc_id,
         sum(tok.tf) AS total_tf, count(*) AS n_terms
  FROM pat p JOIN tok ON tok.term LIKE p.pat
  GROUP BY p.pattern_id, tok.doc_id
),
ranked AS (
  SELECT pattern_id, doc_id, CAST(total_tf AS BIGINT) AS total_tf,
         CAST(n_terms AS BIGINT) AS n_terms,
         row_number() OVER (PARTITION BY pattern_id
                            ORDER BY total_tf DESC, doc_id ASC) AS rank
  FROM m
)
SELECT pattern_id, rank, doc_id, total_tf, n_terms
FROM ranked WHERE rank <= 10
"""


def q_facet_counts(sf_dir: str):
    """Facet aggregation over retrieval results: for each query, how many
    of its BM25 top-10 docs come from each corpus source. The doc->source
    lookup is a semi-join (broadcast result-sized id set, filtered
    column-pruned scan), never a doc-table materialization."""
    top = q_bm25_standard(sf_dir)
    ids = pa.array(sorted(set(top["doc_id"].astype(np.int64))), pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=ids))

    src = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        )
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    merged = top.merge(src, on="doc_id")
    out = (
        merged.groupby(["query_id", "source"], sort=False)
        .size()
        .rename("n_docs")
        .reset_index()
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out[["query_id", "source", "n_docs"]]


# -------------------------------------------------- dense rerank (C7 live)

DENSE_DIM = 16


def q_dense_rerank(sf_dir: str):
    """The C7 dense-rerank PIPELINE as an oracle-gated driver query: BM25
    top-10 candidates → doc texts embedded by the REAL actor-pool
    ``EmbedStage`` (batch-32, model loaded once per actor) → the REAL
    ``DenseRerankStage`` cosine re-scoring — with the transformer slot
    filled by ``HashProjectionModel``, whose md5-derived integer
    embeddings a DuckDB oracle recomputes exactly. Proves the whole C7
    data path end-to-end by VALUE, not just plumbing; only the encoder
    weights differ from production."""
    from ..stages.embed import (
        DenseRerankStage,
        EmbedStage,
        HashProjectionModel,
    )

    top = q_bm25_standard(sf_dir)
    ids = pa.array(sorted(set(top["doc_id"].astype(np.int64))), pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=ids))

    emb = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(pick, batch_format="pyarrow")
        .map_batches(
            EmbedStage,
            fn_constructor_kwargs=dict(
                model_factory=lambda: HashProjectionModel(DENSE_DIM)
            ),
            batch_size=32, batch_format="pyarrow",
            concurrency=default_pool(),
        )
        .to_pandas()  # bounded: the |queries| × 10 candidate set
    )
    qmap = {q: t for q, t, _ in QUERYSET}
    cand = top[["query_id", "doc_id"]].copy()
    cand["query"] = cand["query_id"].map(qmap)
    cand = cand.merge(emb, on="doc_id").rename(
        columns={"embedding": "cand_embedding"}
    )
    scored = (
        ray.data.from_pandas(cand)
        .map_batches(
            DenseRerankStage,
            fn_constructor_kwargs=dict(
                model_factory=lambda: HashProjectionModel(DENSE_DIM)
            ),
            batch_size=32, batch_format="pyarrow",
            concurrency=default_pool(),
        )
        .to_pandas()
    )
    scored = scored.sort_values(
        ["query_id", "dense_score_x", "doc_id"],
        ascending=[True, False, True],
    )
    scored["dense_rank"] = (
        scored.groupby("query_id", sort=False).cumcount() + 1
    ).astype(np.int64)
    return scored[
        ["query_id", "dense_rank", "doc_id", "dense_score_x"]
    ].reset_index(drop=True)


def q_dense_rerank_mlp(sf_dir: str):
    """C7 with the RICHER deterministic encoder (stages.embed.
    TinyMLPEncoder): per-token hash embeddings → mean pooling → ReLU MLP
    (team_run1.py:224-261 mean-pool + layer semantics, not just a text
    projection) — same BM25-candidates → EmbedStage → DenseRerankStage
    pipeline as dense_rerank; the DuckDB oracle replays tokenization,
    pooling, both layers (seeded weight matrices inlined as VALUES) and
    the exact-float64 cosine."""
    from ..stages.embed import (
        DenseRerankStage,
        EmbedStage,
        TinyMLPEncoder,
    )

    top = q_bm25_standard(sf_dir)
    ids = pa.array(sorted(set(top["doc_id"].astype(np.int64))), pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=ids))

    emb = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(pick, batch_format="pyarrow")
        .map_batches(
            EmbedStage,
            fn_constructor_kwargs=dict(
                model_factory=lambda: TinyMLPEncoder(DENSE_DIM)
            ),
            batch_size=32, batch_format="pyarrow",
            concurrency=default_pool(),
        )
        .to_pandas()  # bounded: the |queries| × 10 candidate set
    )
    qmap = {q: t for q, t, _ in QUERYSET}
    cand = top[["query_id", "doc_id"]].copy()
    cand["query"] = cand["query_id"].map(qmap)
    cand = cand.merge(emb, on="doc_id").rename(
        columns={"embedding": "cand_embedding"}
    )
    scored = (
        ray.data.from_pandas(cand)
        .map_batches(
            DenseRerankStage,
            fn_constructor_kwargs=dict(
                model_factory=lambda: TinyMLPEncoder(DENSE_DIM)
            ),
            batch_size=32, batch_format="pyarrow",
            concurrency=default_pool(),
        )
        .to_pandas()
    )
    scored = scored.sort_values(
        ["query_id", "dense_score_x", "doc_id"],
        ascending=[True, False, True],
    )
    scored["dense_rank"] = (
        scored.groupby("query_id", sort=False).cumcount() + 1
    ).astype(np.int64)
    return scored[
        ["query_id", "dense_rank", "doc_id", "dense_score_x"]
    ].reset_index(drop=True)


def _hash4_sql(md5_expr: str) -> str:
    """First 4 hex chars of an md5 → integer − 32768 (the
    HashProjectionModel dimension value), nibble-parsed in SQL."""
    h = "'0123456789abcdef'"
    parts = [
        f"(strpos({h}, substring({md5_expr}, {k}, 1)) - 1) * {16 ** (4 - k)}"
        for k in (1, 2, 3, 4)
    ]
    return "(" + " + ".join(parts) + " - 32768)"


def _dense_rerank_sql() -> str:
    bm25 = _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)
    qvals = ", ".join(f"('{q}', '{t}')" for q, t, _ in QUERYSET)
    hdoc = _hash4_sql("md5(CAST(i.i AS VARCHAR) || ':' || d.text)")
    hq = _hash4_sql("md5(CAST(i.i AS VARCHAR) || ':' || q.qtext)")
    return f"""
WITH
cand AS (SELECT query_id, doc_id FROM ({bm25}) b),
qt(query_id, qtext) AS (VALUES {qvals}),
dims AS (SELECT unnest(range(0, {DENSE_DIM})) AS i),
dvec AS (
  SELECT d.doc_id AS doc_id, i.i AS i, {hdoc} AS v
  FROM documents d
  JOIN (SELECT DISTINCT doc_id FROM cand) c ON c.doc_id = d.doc_id, dims i
),
qvec AS (SELECT q.query_id AS query_id, i.i AS i, {hq} AS v FROM qt q, dims i),
dt AS (
  SELECT c.query_id AS query_id, c.doc_id AS doc_id,
         CAST(sum(qv.v * dv.v) AS DOUBLE) AS dot
  FROM cand c
  JOIN qvec qv ON qv.query_id = c.query_id
  JOIN dvec dv ON dv.doc_id = c.doc_id AND dv.i = qv.i
  GROUP BY c.query_id, c.doc_id
),
nd AS (SELECT doc_id, sqrt(CAST(sum(v*v) AS DOUBLE)) AS n
       FROM dvec GROUP BY doc_id),
nq AS (SELECT query_id, sqrt(CAST(sum(v*v) AS DOUBLE)) AS n
       FROM qvec GROUP BY query_id),
cosr AS (
  SELECT dt.query_id AS query_id, dt.doc_id AS doc_id,
         {_fx('dt.dot / (nq.n * nd.n)')} AS dense_score_x
  FROM dt
  JOIN nq ON nq.query_id = dt.query_id
  JOIN nd ON nd.doc_id = dt.doc_id
),
r AS (
  SELECT query_id, doc_id, dense_score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dense_score_x DESC, doc_id ASC)
         AS dense_rank
  FROM cosr
)
SELECT query_id, CAST(dense_rank AS BIGINT) AS dense_rank, doc_id,
       dense_score_x
FROM r
"""


def _dense_rerank_mlp_sql() -> str:
    """SQL replay of TinyMLPEncoder end-to-end: TOKLIST tokenization,
    per-token hash4 embeddings, occurrence-mean pooling (fixed point),
    W1 @ · + ReLU, W2 @ · with the /64 output scale (weights inlined as
    VALUES — model constants), then the exact-float64 cosine rerank."""
    from ..stages.embed import TinyMLPEncoder

    enc = TinyMLPEncoder(DENSE_DIM)
    w1 = ", ".join(
        f"({i}, {j}, {int(enc.W1[i, j])})"
        for i in range(DENSE_DIM) for j in range(DENSE_DIM)
    )
    w2 = ", ".join(
        f"({i}, {j}, {int(enc.W2[i, j])})"
        for i in range(DENSE_DIM) for j in range(DENSE_DIM)
    )
    bm25 = _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)
    qvals = ", ".join(f"('{q}', '{t}')" for q, t, _ in QUERYSET)
    hv = _hash4_sql("md5(CAST(i.i AS VARCHAR) || ':' || t.tok)")
    toklist = TOKLIST.format(col="e.text")
    return f"""
WITH
cand AS (SELECT query_id, doc_id FROM ({bm25}) b),
qt(query_id, qtext) AS (VALUES {qvals}),
w1(i, j, w) AS (VALUES {w1}),
w2(i, j, w) AS (VALUES {w2}),
dims AS (SELECT unnest(range(0, {DENSE_DIM})) AS i),
ent AS (
  SELECT 'd' || CAST(d.doc_id AS VARCHAR) AS key, d.text AS text
  FROM documents d
  JOIN (SELECT DISTINCT doc_id FROM cand) c ON c.doc_id = d.doc_id
  UNION ALL
  SELECT 'q' || q.query_id AS key, q.qtext AS text FROM qt q
),
tok AS (SELECT e.key AS key, unnest({toklist}) AS tok FROM ent e),
ntok AS (SELECT key, count(*) AS n FROM tok GROUP BY key),
tokv AS (
  SELECT t.key AS key, i.i AS i, {hv} AS v FROM tok t, dims i
),
pooled AS (
  SELECT tv.key AS key, tv.i AS i,
         CAST(floor(CAST(sum(tv.v) AS DOUBLE) / nt.n + 0.5) AS BIGINT) AS p
  FROM tokv tv JOIN ntok nt ON nt.key = tv.key
  GROUP BY tv.key, tv.i, nt.n
),
h AS (
  SELECT p.key AS key, w.i AS i, greatest(sum(w.w * p.p), 0) AS a
  FROM pooled p JOIN w1 w ON w.j = p.i GROUP BY p.key, w.i
),
vec AS (
  SELECT a.key AS key, w.i AS i,
         CAST(floor(CAST(sum(w.w * a.a) AS DOUBLE) / 64.0) AS BIGINT) AS v
  FROM h a JOIN w2 w ON w.j = a.i GROUP BY a.key, w.i
),
dvec AS (SELECT CAST(substring(key, 2) AS BIGINT) AS doc_id, i, v
         FROM vec WHERE key LIKE 'd%'),
qvec AS (SELECT substring(key, 2) AS query_id, i, v
         FROM vec WHERE key LIKE 'q%'),
dt AS (
  SELECT c.query_id AS query_id, c.doc_id AS doc_id,
         CAST(sum(qv.v * dv.v) AS DOUBLE) AS dot
  FROM cand c
  JOIN qvec qv ON qv.query_id = c.query_id
  JOIN dvec dv ON dv.doc_id = c.doc_id AND dv.i = qv.i
  GROUP BY c.query_id, c.doc_id
),
nd AS (SELECT doc_id, sqrt(CAST(sum(v*v) AS DOUBLE)) AS n
       FROM dvec GROUP BY doc_id),
nq AS (SELECT query_id, sqrt(CAST(sum(v*v) AS DOUBLE)) AS n
       FROM qvec GROUP BY query_id),
cosr AS (
  SELECT dt.query_id AS query_id, dt.doc_id AS doc_id,
         {_fx('dt.dot / (nq.n * nd.n)')} AS dense_score_x
  FROM dt
  JOIN nq ON nq.query_id = dt.query_id
  JOIN nd ON nd.doc_id = dt.doc_id
),
r AS (
  SELECT query_id, doc_id, dense_score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dense_score_x DESC, doc_id ASC)
         AS dense_rank
  FROM cosr
)
SELECT query_id, CAST(dense_rank AS BIGINT) AS dense_rank, doc_id,
       dense_score_x
FROM r
"""


# ------------------------------------------------------- more like this

MLT_DOCS = (0, 1, 2, 3, 4)
MLT_TERMS = 3
MLT_K = 10


def q_mlt(sf_dir: str):
    """More-like-this retrieval: a document's top-3 tf·idf keywords
    become its query, served as standard BM25 from the compressed index,
    the source doc excluded. Composition of two oracled paths (keyword
    extraction cogroup + index serving); everything between them is a
    15-row driver frame."""
    from .query import bm25_search

    kw = (
        q_tfidf_keywords(sf_dir)
        .filter(expr=f"doc_id in {list(MLT_DOCS)}")
        .to_pandas()  # |MLT_DOCS| × MLT_TERMS rows
    )
    import pyarrow.parquet as _pq

    dl = _pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang"])
    langs = dict(zip(dl["doc_id"].to_pylist(), dl["lang"].to_pylist()))
    qrows = []
    for src, g in kw.groupby("doc_id"):
        terms = list(g.sort_values("rank")["term"])
        qrows.append({
            "query_id": f"d{int(src)}",
            "query": " ".join(sorted(set(terms))),
            "lang": langs[int(src)],
        })
    index_dir = _index_for(sf_dir)
    res = bm25_search(
        ray.data.from_items(qrows), index_dir,
        cfg=BM25Config(k1=1.2, b=0.75, idf="lucene", compat="standard",
                       k=MLT_K + 1),
        round_dp=4,
    ).to_pandas()
    res["doc_id"] = res["url"].astype(np.int64)
    res["src"] = res["query_id"].str.slice(1).astype(np.int64)
    res = res[res["doc_id"] != res["src"]]
    res = res.sort_values(["query_id", "score_x", "url"],
                          ascending=[True, False, True], kind="mergesort")
    res = res.groupby("query_id", sort=False).head(MLT_K).copy()
    res["rank"] = (res.groupby("query_id", sort=False).cumcount() + 1
                   ).astype(np.int64)
    return res[["query_id", "rank", "doc_id", "score_x"]].reset_index(
        drop=True
    )


def _mlt_sql() -> str:
    ids = ", ".join(str(i) for i in MLT_DOCS)
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
sc AS (
  SELECT tok.doc_id AS doc_id, tok.lang AS lang, tok.term AS term,
         {_fx('tok.tf * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))')}
         AS tfidf_x
  FROM tok
  JOIN df ON df.lang = tok.lang AND df.term = tok.term
  JOIN stats s ON s.lang = tok.lang
  WHERE tok.doc_id IN ({ids})
),
kw AS (
  SELECT doc_id, lang, term FROM (
    SELECT doc_id, lang, term,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tfidf_x DESC, term ASC) AS rank
    FROM sc
  ) WHERE rank <= {MLT_TERMS}
),
q AS (SELECT DISTINCT 'd' || CAST(doc_id AS VARCHAR) AS query_id,
             doc_id AS src, lang, term FROM kw),
scores AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id,
         sum( 1 * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * (1.2 + 1))
              / (tok.tf + 1.2*(1 - 0.75 + 0.75 * d.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tok ON tok.lang = q.lang AND tok.term = q.term
            AND tok.doc_id <> q.src
  JOIN df ON df.lang = q.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = tok.doc_id
  JOIN stats s ON s.lang = q.lang
  GROUP BY q.query_id, tok.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= {MLT_K}
"""


# ---------------------------------------- multinomial Naive Bayes (A11)

# The reference's dead A11 code is a quality classifier; the live
# trainable-classifier semantic here is multinomial NB predicting lang
# from tokens, trained distributively on the corpus itself. Everything
# that crosses machines is an INTEGER (counts, fx6 log-prob products),
# so training and scoring are order-independent and a SQL oracle
# replays them bit-for-bit.
NB_SCALE = 1_000_000


def _fx6(v: float) -> int:
    return int(np.floor(v * NB_SCALE + 0.5))


def _nb_token_rows(t: pa.Table) -> pa.Table:
    """(doc_id, lang, term, tf) per batch."""
    vals, parent = _flat_tok(t)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    langs = np.asarray(t["lang"].to_pandas(), dtype=object)
    if len(vals) == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
        })
    pdf = (
        pd.DataFrame({"doc_id": ids[parent], "lang": langs[parent],
                      "term": vals})
        .groupby(["doc_id", "lang", "term"], sort=False)
        .size().rename("tf").reset_index()
    )
    return from_pandas_clean(pdf, preserve_index=False)


def _nb_term_partition(group: pd.DataFrame) -> pd.DataFrame:
    """term-hash partition (ALL rows of each term colocated): derive the
    GLOBAL per-(lang, term) training counts in place, then emit
    (doc_id, cand, s1) likelihood partials — tf · fx6(ln(c+1)) for every
    candidate lang that has the term — plus marker rows: doc_id = -1
    carries per-lang total-token partials (→ c_l), doc_id = -2 carries
    the partition's distinct-term count (→ V). Downstream sums are all
    integer."""
    g = group.drop(columns=[c for c in ("kpart",) if c in group.columns])
    if g.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "cand": pd.Series(dtype=object),
                             "s1": pd.Series(dtype="int64")})
    ct = (
        g.groupby(["lang", "term"], sort=False)["tf"].sum()
        .rename("c").reset_index()
        .rename(columns={"lang": "cand"})
    )
    m = g[["doc_id", "term", "tf"]].merge(ct, on="term")
    lpx = np.floor(np.log(m["c"].to_numpy(np.float64) + 1.0)
                   * NB_SCALE + 0.5).astype(np.int64)
    m["s1"] = m["tf"].to_numpy(np.int64) * lpx
    out = (
        m.groupby(["doc_id", "cand"], sort=False)["s1"].sum().reset_index()
    )
    cl = ct.groupby("cand", sort=False)["c"].sum().reset_index()
    marks = pd.DataFrame({
        "doc_id": [-1] * len(cl) + [-2],
        "cand": list(cl["cand"]) + [""],
        "s1": list(cl["c"].astype(np.int64)) + [int(g["term"].nunique())],
    })
    res = pd.concat([out, marks], ignore_index=True)
    return res.astype({"doc_id": "int64", "s1": "int64"})


def _nb_argmax_partition(group: pd.DataFrame, pri_x: dict,
                         lden_x: dict) -> pd.DataFrame:
    """doc_id-hash partition of RAW s1 partials ∪ dl rows (cand =
    '__dl__'): the per-(doc, cand) sum happens HERE (all of a doc's rows
    are hash-colocated — Ray's native multi-key string groupby measured
    25× slower than this partition-sum on the same rows), then a fully
    vectorized integer argmax; ties break lang asc."""
    g = group.drop(columns=[c for c in ("kpart",) if c in group.columns])
    is_dl = g["cand"].to_numpy(dtype=object) == "__dl__"
    dl = g[is_dl][["doc_id", "s1"]].rename(columns={"s1": "dl"})
    if dl.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "pred_lang": pd.Series(dtype=object),
                             "score_x": pd.Series(dtype="int64")})
    s1 = (
        g[~is_dl].groupby(["doc_id", "cand"], sort=False)["s1"].sum()
        .reset_index()
    )
    langs = sorted(pri_x)
    base = dl.merge(pd.DataFrame({"cand": langs}), how="cross")
    base = base.merge(s1, on=["doc_id", "cand"], how="left")
    s1v = base["s1"].fillna(0).to_numpy(np.int64)
    pri = base["cand"].map(pri_x).to_numpy(np.int64)
    lden = base["cand"].map(lden_x).to_numpy(np.int64)
    base["score_x"] = pri + s1v - base["dl"].to_numpy(np.int64) * lden
    base = base.sort_values(["doc_id", "score_x", "cand"],
                            ascending=[True, False, True], kind="mergesort")
    top = base.groupby("doc_id", sort=False).head(1)
    return pd.DataFrame({
        "doc_id": top["doc_id"].to_numpy(np.int64),
        "pred_lang": top["cand"].to_numpy(dtype=object),
        "score_x": top["score_x"].to_numpy(np.int64),
    })


def q_nb_classify(sf_dir: str):
    """Train-and-apply multinomial Naive Bayes (add-one smoothing, lang
    as the label) in three bounded exchanges: token rows keyed by TERM
    (training counts derived in-place, likelihood partials emitted),
    ONE (doc, cand) integer sum, then a doc-keyed cogroup with the dl
    rows for the argmax. Per-lang totals, vocabulary size and priors are
    |langs|-sized driver scalars — nothing vocabulary-sized is broadcast
    or driver-held."""
    import math

    rows = _docs(sf_dir).map_batches(_nb_token_rows, batch_format="pyarrow")
    partials = (
        _parted(rows, ("term",))
        .map_groups(_nb_term_partition, batch_format="pandas")
        .materialize()  # two consumers: markers (tiny) + s1 stream
    )
    # marker rows: per-partition (c_l, V) partials — parts × langs rows
    marks = (
        partials.filter(expr="doc_id < 0").to_pandas()
        .groupby(["doc_id", "cand"], sort=False)["s1"].sum().reset_index()
    )
    ctot = dict(zip(marks[marks["doc_id"] == -1]["cand"],
                    marks[marks["doc_id"] == -1]["s1"].astype(int)))
    vocab_v = int(marks[marks["doc_id"] == -2]["s1"].iloc[0])

    docs = _docs(sf_dir).map_batches(_dl_batch, batch_format="pyarrow")
    nd = docs.groupby("lang").count().to_pandas()
    priors = dict(zip(nd["lang"], nd["count()"].astype(int)))
    n_total = int(sum(priors.values()))
    pri_x = {l: _fx6(math.log(c / n_total)) for l, c in priors.items()}
    lden_x = {
        l: _fx6(math.log(ctot.get(l, 0) + vocab_v)) for l in priors
    }

    dl_rows = docs.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "cand": pa.array(["__dl__"] * t.num_rows, pa.string()),
            "s1": pc.cast(t["dl"], pa.int64()),
        }),
        batch_format="pyarrow",
    )
    out = _parted(
        partials.filter(expr="doc_id >= 0").union(dl_rows), ("doc_id",)
    ).map_groups(
        lambda g: _nb_argmax_partition(g, pri_x, lden_x),
        batch_format="pandas",
    )
    return out


def _nb_confusion_partition(group: pd.DataFrame) -> pd.DataFrame:
    """doc_id-hash partition of prediction rows (kind 0) ∪ truth rows
    (kind 1) → (lang, pred_lang, n) partials."""
    g = group.drop(columns=[c for c in ("kpart",) if c in group.columns])
    kind = g["kind"].to_numpy(np.int64)
    pred = g[kind == 0][["doc_id", "val"]].rename(columns={"val": "pred_lang"})
    tru = g[kind == 1][["doc_id", "val"]].rename(columns={"val": "lang"})
    m = tru.merge(pred, on="doc_id", how="inner")
    out = (
        m.groupby(["lang", "pred_lang"], sort=False).size()
        .rename("n").reset_index()
    )
    return out.astype({"n": "int64"})


def q_nb_confusion(sf_dir: str):
    """Classifier evaluation as a first-class op: the (true lang ×
    predicted lang) confusion matrix of nb_classify — predictions and
    truths cogrouped by doc_id hash, partial counts, one |langs|²-sized
    finalize."""
    pred_rows = q_nb_classify(sf_dir).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "val": t["pred_lang"],
            "kind": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    truth_rows = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "val": t["lang"],
            "kind": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    partials = _arrow_blocks(
        _parted(pred_rows.union(truth_rows), ("doc_id",)).map_groups(
            _nb_confusion_partition, batch_format="pandas"))
    out = partials.groupby(["lang", "pred_lang"]).sum("n").to_pandas()
    out.columns = ["lang", "pred_lang", "n"]
    return out.astype({"n": "int64"})


def _nb_confusion_sql() -> str:
    return f"""
SELECT d.lang AS lang, nb.pred_lang AS pred_lang, count(*) AS n
FROM ({{nb}}) nb
JOIN documents d ON d.doc_id = nb.doc_id
GROUP BY d.lang, nb.pred_lang
"""


def _nb_sql() -> str:
    fx6 = "CAST(floor({expr} * 1000000 + 0.5) AS BIGINT)"
    lpx = fx6.format(expr="ln(ct.c + 1)")
    return f"""
WITH {_TOK_CTE}, {_DL_CTE},
ct AS (SELECT lang, term, CAST(sum(tf) AS BIGINT) AS c
       FROM tok GROUP BY lang, term),
cl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS ctot FROM ct GROUP BY lang),
vv AS (SELECT count(DISTINCT term) AS v FROM tok),
pri AS (SELECT lang, count(*) AS nd FROM documents GROUP BY lang),
nn AS (SELECT count(*) AS n FROM documents),
s1 AS (
  SELECT t.doc_id AS doc_id, ct.lang AS cand,
         CAST(sum(t.tf * {lpx}) AS BIGINT) AS s1
  FROM tok t JOIN ct ON ct.term = t.term
  GROUP BY t.doc_id, ct.lang
),
base AS (
  SELECT d.doc_id AS doc_id, p.lang AS cand,
         {fx6.format(expr="ln(CAST(p.nd AS DOUBLE) / (SELECT n FROM nn))")}
         + coalesce(s1.s1, 0)
         - d.dl * {fx6.format(expr="ln(CAST(c.ctot + (SELECT v FROM vv) AS DOUBLE))")}
         AS score_x
  FROM dl d
  CROSS JOIN pri p
  JOIN cl c ON c.lang = p.lang
  LEFT JOIN s1 ON s1.doc_id = d.doc_id AND s1.cand = p.lang
),
r AS (
  SELECT doc_id, cand, score_x,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_x DESC, cand ASC) AS rk
  FROM base
)
SELECT doc_id, cand AS pred_lang, CAST(score_x AS BIGINT) AS score_x
FROM r WHERE rk = 1
"""


# ----------------------------------------------- BM25F fielded retrieval

# fields: "title" = the doc's first BM25F_TITLE_LEN tokens (lead/headline),
# "body" = the rest — per-field length normalization, weighted-tf combine
# (simple BM25F, Robertson & Zaragoza 2009 §3.3): tf̃ = Σ_f w_f·tf_f/den_f,
# den_f = (1−b) + b·dl_f/avgdl_f, score = Σ_t w·idf·tf̃/(k1+tf̃)
BM25F_K1 = 1.2
BM25F_B = 0.75
BM25F_WT = 2.0   # title weight
BM25F_WB = 1.0   # body weight
BM25F_TITLE_LEN = 8


def _tok_positions(t: pa.Table):
    """_flat_tok plus each token's position WITHIN its doc."""
    vals, parent = _flat_tok(t)
    if len(vals) == 0:
        return vals, parent, np.empty(0, np.int64)
    starts = np.searchsorted(parent, np.arange(t.num_rows, dtype=np.int64))
    pos = np.arange(len(parent), dtype=np.int64) - starts[parent]
    return vals, parent, pos


def _bm25f_partial(t: pa.Table, qterms: tuple) -> pa.Table:
    """ONE corpus pass emitting union-schema partials: per-(batch, lang)
    stats rows (term='', n docs, Σdl_title, Σdl_body) plus EXACT per
    (lang, term ∈ query vocabulary) df counts (a doc lives in one batch,
    so distinct-doc partials sum exactly)."""
    vals, parent, pos = _tok_positions(t)
    n = t.num_rows
    langs = np.asarray(t["lang"].to_pandas(), dtype=object)
    is_t = pos < BM25F_TITLE_LEN
    dlt = np.bincount(parent[is_t], minlength=n)
    dlb = np.bincount(parent[~is_t], minlength=n)
    out = {"lang": [], "term": [], "df": [], "n": [], "sdt": [], "sdb": []}
    for lg in np.unique(langs):
        m = langs == lg
        out["lang"].append(lg)
        out["term"].append("")
        out["df"].append(0)
        out["n"].append(int(m.sum()))
        out["sdt"].append(int(dlt[m].sum()))
        out["sdb"].append(int(dlb[m].sum()))
    if len(vals):
        keep = np.isin(vals, np.array(sorted(set(qterms)), dtype=object))
        if keep.any():
            sp, st = parent[keep], vals[keep]
            key = np.char.add(np.char.add(sp.astype(str), "\x1f"),
                              st.astype(str))
            _, idx = np.unique(key, return_index=True)
            pdf = (
                pd.DataFrame({"lang": langs[sp[idx]], "term": st[idx]})
                .groupby(["lang", "term"], sort=False).size()
                .rename("df").reset_index()
            )
            for _, r in pdf.iterrows():
                out["lang"].append(r["lang"])
                out["term"].append(r["term"])
                out["df"].append(int(r["df"]))
                out["n"].append(0)
                out["sdt"].append(0)
                out["sdb"].append(0)
    return pa.table({
        "lang": pa.array(out["lang"], pa.string()),
        "term": pa.array(out["term"], pa.string()),
        "df": pa.array(out["df"], pa.int64()),
        "n": pa.array(out["n"], pa.int64()),
        "sdt": pa.array(out["sdt"], pa.int64()),
        "sdb": pa.array(out["sdb"], pa.int64()),
    })


def _bm25f_score_partial(t: pa.Table, stats: dict, dfmap: dict,
                         queries: list) -> pa.Table:
    """Per-batch BM25F scoring → PARTIAL top-10 rows per query (a doc
    lives in one batch, so its score is final; the merge sees
    O(blocks × 10) rows per query)."""
    import math

    vals, parent, pos = _tok_positions(t)
    n = t.num_rows
    langs = np.asarray(t["lang"].to_pandas(), dtype=object)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_t = pos < BM25F_TITLE_LEN
    dlt = np.bincount(parent[is_t], minlength=n).astype(np.float64)
    dlb = np.bincount(parent[~is_t], minlength=n).astype(np.float64)
    tf_cache: dict = {}

    def tf_fields(term):
        if term not in tf_cache:
            m = vals == term
            tf_cache[term] = (
                np.bincount(parent[m & is_t], minlength=n).astype(np.float64),
                np.bincount(parent[m & ~is_t], minlength=n).astype(np.float64),
            )
        return tf_cache[term]

    rows = {"query_id": [], "doc_id": [], "score_x": []}
    for qid, lang, items in queries:
        if lang not in stats:
            continue
        nn, avg_t, avg_b = stats[lang]
        score = np.zeros(n, dtype=np.float64)
        hit = False
        for term, w in items:
            df = dfmap.get((lang, term))
            if df is None:
                continue
            hit = True
            tft, tfb = tf_fields(term)
            tfn = np.zeros(n, dtype=np.float64)
            if avg_t > 0:
                tfn += (BM25F_WT * tft) / (
                    (1 - BM25F_B) + (BM25F_B * dlt) / avg_t
                )
            if avg_b > 0:
                tfn += (BM25F_WB * tfb) / (
                    (1 - BM25F_B) + (BM25F_B * dlb) / avg_b
                )
            idf = math.log(1 + (nn - df + 0.5) / (df + 0.5))
            score += (w * idf) * (tfn / (BM25F_K1 + tfn))
        if not hit:
            continue
        score[langs != lang] = 0.0
        cand = np.nonzero(score > 0)[0]
        if cand.size == 0:
            continue
        sx = np.floor(score[cand] * 10000.0 + 0.5).astype(np.int64)
        order = np.lexsort((ids[cand], -sx))[:10]
        rows["query_id"].extend([qid] * len(order))
        rows["doc_id"].extend(ids[cand[order]].tolist())
        rows["score_x"].extend(sx[order].tolist())
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.string()),
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "score_x": pa.array(rows["score_x"], pa.int64()),
    })


def q_bm25f(sf_dir: str):
    """BM25F fielded ranking as a two-scan zero-shuffle plan: pass 1 =
    one corpus pass of union-schema partials (lang stats + query-term
    df), pass 2 = per-batch scoring with the tiny stats broadcast and
    per-batch partial top-10 → driver merge of O(blocks×10) rows."""
    qterms = tuple(sorted({
        tok for _, text, _ in QUERYSET for tok in tokenize_simple(text)
    }))
    agg = (
        _docs(sf_dir)
        .map_batches(_bm25f_partial, fn_kwargs={"qterms": qterms},
                     batch_format="pyarrow")
        .groupby(["lang", "term"])
        .sum(["df", "n", "sdt", "sdb"])
        .to_pandas()  # bounded: langs × (1 + |query vocabulary|)
    )
    agg.columns = ["lang", "term", "df", "n", "sdt", "sdb"]
    stats = {}
    for _, r in agg[agg["term"] == ""].iterrows():
        nn = int(r["n"])
        stats[r["lang"]] = (
            nn,
            int(r["sdt"]) / nn if nn else 0.0,
            int(r["sdb"]) / nn if nn else 0.0,
        )
    dfmap = {
        (r["lang"], r["term"]): int(r["df"])
        for _, r in agg[agg["term"] != ""].iterrows()
    }
    queries = []
    for qid, text, lang in QUERYSET:
        c: dict = {}
        for tok in tokenize_simple(text):
            c[tok] = c.get(tok, 0) + 1
        queries.append((qid, lang, sorted(c.items())))
    partials = (
        _docs(sf_dir)
        .map_batches(
            _bm25f_score_partial,
            fn_kwargs={"stats": stats, "dfmap": dfmap, "queries": queries},
            batch_format="pyarrow",
        )
        .to_pandas()  # bounded: blocks × |queries| × 10
    )
    partials = partials.sort_values(
        ["query_id", "score_x", "doc_id"], ascending=[True, False, True]
    )
    top = partials.groupby("query_id", sort=False).head(10).copy()
    top["rank"] = (top.groupby("query_id", sort=False).cumcount() + 1).astype(
        np.int64
    )
    return top[["query_id", "rank", "doc_id", "score_x"]].reset_index(
        drop=True
    )


def _bm25f_sql() -> str:
    L = BM25F_TITLE_LEN
    avg_t = "(CAST(s.sdt AS DOUBLE) / s.n)"
    avg_b = "(CAST(s.sdb AS DOUBLE) / s.n)"
    tfn = (
        f"(CASE WHEN s.sdt = 0 THEN 0 ELSE ({BM25F_WT} * t2.tft) / "
        f"((1 - {BM25F_B}) + ({BM25F_B} * coalesce(dt.dl, 0)) / {avg_t}) END"
        f" + CASE WHEN s.sdb = 0 THEN 0 ELSE ({BM25F_WB} * t2.tfb) / "
        f"((1 - {BM25F_B}) + ({BM25F_B} * coalesce(db.dl, 0)) / {avg_b}) END)"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, lang, {TOKLIST.format(col='text')} AS l FROM documents
),
tt AS (SELECT doc_id, lang, unnest(list_slice(l, 1, {L})) AS term FROM toks),
tb AS (SELECT doc_id, lang, unnest(list_slice(l, {L + 1}, len(l))) AS term
       FROM toks),
t2 AS (
  SELECT doc_id, lang, term,
         sum(CASE WHEN fld = 't' THEN 1 ELSE 0 END) AS tft,
         sum(CASE WHEN fld = 'b' THEN 1 ELSE 0 END) AS tfb
  FROM (SELECT doc_id, lang, term, 't' AS fld FROM tt
        UNION ALL SELECT doc_id, lang, term, 'b' FROM tb)
  GROUP BY doc_id, lang, term
),
dlt AS (SELECT doc_id, count(*) AS dl FROM tt GROUP BY doc_id),
dlb AS (SELECT doc_id, count(*) AS dl FROM tb GROUP BY doc_id),
s AS (
  SELECT d.lang AS lang, count(*) AS n,
         sum(coalesce(lt.dl, 0)) AS sdt, sum(coalesce(lb.dl, 0)) AS sdb
  FROM documents d
  LEFT JOIN dlt lt ON lt.doc_id = d.doc_id
  LEFT JOIN dlb lb ON lb.doc_id = d.doc_id
  GROUP BY d.lang
),
dfx AS (
  SELECT lang, term, count(DISTINCT doc_id) AS df
  FROM (SELECT doc_id, lang, term FROM tt
        UNION ALL SELECT doc_id, lang, term FROM tb)
  GROUP BY lang, term
),
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup=False)}),
scores AS (
  SELECT q.query_id AS query_id, t2.doc_id AS doc_id,
         sum( q.w * ln(1 + (s.n - dfx.df + 0.5) / (dfx.df + 0.5))
              * ({tfn} / ({BM25F_K1} + {tfn})) ) AS score
  FROM q
  JOIN t2 ON t2.lang = q.lang AND t2.term = q.term
  JOIN dfx ON dfx.lang = q.lang AND dfx.term = q.term
  JOIN s ON s.lang = q.lang
  LEFT JOIN dlt dt ON dt.doc_id = t2.doc_id
  LEFT JOIN dlb db ON db.doc_id = t2.doc_id
  GROUP BY q.query_id, t2.doc_id
),
ranked AS (
  SELECT query_id, doc_id, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank, doc_id, score_x FROM ranked WHERE rank <= 10
"""


# ------------------------------------- pseudo-relevance-feedback expansion

QEXP_DOCS = 3
QEXP_TOPK = 5


def q_query_expand(sf_dir: str):
    """RM3-ish query expansion: terms of each query's BM25 top-QEXP_DOCS
    docs, scored sum(tf across those docs) * idf_x (exact integer once idf
    is fixed-point), original query terms excluded, top-QEXP_TOPK per
    query by (score_x desc, term asc).

    Scale shape: candidate doc ids (result-sized) are broadcast into a
    postings-stream filter; the idf stream is filtered to the candidate
    term set (also result-sized) — neither the corpus nor the vocabulary
    is materialized."""
    top = q_bm25_standard(sf_dir)
    cand = top[top["rank"] <= QEXP_DOCS][["query_id", "doc_id"]]
    cand_ids = pa.array(sorted(set(cand["doc_id"].astype(np.int64))), pa.int64())

    def pick_postings(t: pa.Table) -> pa.Table:
        did = url_to_docid(t["url"])
        mask = pc.is_in(did, value_set=cand_ids)
        t2 = t.filter(mask)
        return pa.table(
            {
                "doc_id": did.filter(mask),
                "lang": t2["lang"],
                "term": t2["term"],
                "tf": t2["tf"],
            }
        )

    posts = (
        _postings_ds(sf_dir)
        .map_batches(pick_postings, batch_format="pyarrow")
        .to_pandas()
    )

    terms_needed = pa.array(sorted(set(posts["term"])), pa.string())

    def pick_idf(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["term"], value_set=terms_needed))

    idf = (
        q_term_idf(sf_dir)
        .map_batches(pick_idf, batch_format="pyarrow")
        .to_pandas()[["lang", "term", "idf_x"]]
    )

    qterms = {qid: set(tokenize_simple(text)) for qid, text, _ in QUERYSET}
    exp = cand.merge(posts, on="doc_id").merge(idf, on=["lang", "term"])
    drop = [
        t in qterms[q] for q, t in zip(exp["query_id"], exp["term"])
    ]
    exp = exp[~np.array(drop, dtype=bool)] if len(exp) else exp
    agg = (
        exp.groupby(["query_id", "term", "idf_x"], sort=False)["tf"]
        .sum()
        .reset_index()
    )
    agg["score_x"] = agg["tf"].astype(np.int64) * agg["idf_x"].astype(np.int64)
    agg = agg.sort_values(
        ["query_id", "score_x", "term"], ascending=[True, False, True]
    )
    agg["rank"] = agg.groupby("query_id").cumcount().astype(np.int64) + 1
    agg = agg[agg["rank"] <= QEXP_TOPK].reset_index(drop=True)
    return agg[["query_id", "term", "score_x", "rank"]]


def q_token_entropy(sf_dir: str):
    """Per-document token-distribution Shannon entropy (nats, fixed-point
    ``entropy_x`` = 1e-4) plus distinct-type count — the diversity /
    repetition quality signal a webtext pipeline gates on (low entropy =
    boilerplate, keyword stuffing, template spam). Pure per-document
    map_batches: ZERO shuffles; entropy is derived from integer token
    counts (H = ln(L) − Σ c·ln(c)/L) so engine and oracle round the same
    doubles through the shared fx4 grid."""

    def ent(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        low = pc.utf8_lower(text)
        spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        trimmed = pc.utf8_trim_whitespace(spaced)
        toks = pc.split_pattern(trimmed, " ")
        parent, flat = flatten_tokens(pa.table({"tokens": toks}), "tokens")
        n = len(t)
        n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
        if len(flat):
            tcodes, tuniq = pd.factorize(flat)
            v = np.int64(len(tuniq))
            upak, cnt = np.unique(parent * v + tcodes, return_counts=True)
            up = (upak // v).astype(np.int64)
            n_types = np.bincount(up, minlength=n).astype(np.int64)
            s = np.bincount(up, weights=cnt * np.log(cnt), minlength=n)
        else:
            n_types = np.zeros(n, dtype=np.int64)
            s = np.zeros(n, dtype=np.float64)
        safe_l = np.maximum(n_tokens, 1).astype(np.float64)
        h = np.where(n_tokens > 0, np.log(safe_l) - s / safe_l, 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "entropy_x": pa.array(
                    np.floor(h * 10000.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return _docs(sf_dir).map_batches(ent, batch_format="pyarrow")


def q_neardup_apply(sf_dir: str):
    """Materialize near-dup SURVIVORS — the apply step after minhash pair
    finding + connected components: drop every non-representative member
    of a component (keep = component min doc_id), keep everything else.

    Distributed anti-join: drop rows (components where doc_id != rep) and
    document rows are hash-colocated on doc_id and filtered inside the
    partition — no driver set, no broadcast, no join materialization."""
    comp = q_neardup_components(sf_dir)

    def drop_rows(t: pa.Table) -> pa.Table:
        d = t.filter(pc.not_equal(t["doc_id"], t["rep"]))
        return pa.table(
            {
                "doc_id": pc.cast(d["doc_id"], pa.int64()),
                "lang": pa.array([""] * len(d), pa.string()),
                "is_doc": pa.array(np.zeros(len(d), dtype=np.int8), pa.int8()),
            }
        )

    def doc_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang": pc.cast(t["lang"], pa.string()),
                "is_doc": pa.array(np.ones(len(t), dtype=np.int8), pa.int8()),
            }
        )

    docs = _docs(sf_dir).map_batches(doc_rows, batch_format="pyarrow")
    unioned = docs.union(comp.map_batches(drop_rows, batch_format="pyarrow"))

    def keep_part(g: pd.DataFrame) -> pd.DataFrame:
        dropped = set(g.loc[g["is_doc"] == 0, "doc_id"])
        out = g[(g["is_doc"] == 1) & ~g["doc_id"].isin(dropped)]
        return out[["doc_id", "lang"]].astype({"doc_id": "int64"})

    return _parted(unioned, ("doc_id",)).map_groups(
        keep_part, batch_format="pandas"
    )


SOURCE_LIFT_TOPK = 5
SOURCE_LIFT_MIN_COUNT = 5


def q_source_lift(sf_dir: str):
    """Per-source distinctive vocabulary by EXACT integer lift:
    lift = (c_st/n_s)/(cg_t/N), emitted fixed-point as
    ``lift_x = (c·N·10000) // (n_s·cg)`` — all-integer arithmetic, so
    engine and oracle agree bit-for-bit (no float division anywhere).
    Top-5 terms per source with support c >= 5, ties broken term ASC.

    Plan: per-batch partial (source, term, c) counts (vocab-sized, NOT
    corpus-sized — materialized once for its two consumers) → per-source
    totals are a bounded-small aggregate (≤ #sources rows) folded on the
    driver → ONE term-hash shuffle completes per-term global counts
    inside each partition → tiny per-source top-k. int64 note: c·N·10000
    needs < 2^63, i.e. ≲1e14 total tokens per run — beyond that switch
    the lift to object ints / HUGEINT."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def partial_counts(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        low = pc.utf8_lower(text)
        spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        trimmed = pc.utf8_trim_whitespace(spaced)
        toks = pc.split_pattern(trimmed, " ")
        parent, flat = flatten_tokens(pa.table({"tokens": toks}), "tokens")
        if not len(flat):
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        src = np.asarray(t["source"].to_pandas(), dtype=object)[parent]
        tcodes, tuniq = pd.factorize(flat)
        scodes, suniq = pd.factorize(src)
        v = np.int64(len(tuniq))
        upak, cnt = np.unique(scodes * v + tcodes, return_counts=True)
        return pa.table(
            {
                "source": pa.array(suniq[upak // v], pa.string()),
                "term": pa.array(tuniq[upak % v], pa.string()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = docs.map_batches(partial_counts, batch_format="pyarrow").materialize()
    totals = (
        parts.groupby("source")
        .aggregate(ray.data.aggregate.Sum("c", alias_name="n"))
        .take_all()
    )
    n_by_src = {r["source"]: int(r["n"]) for r in totals}
    big_n = int(sum(n_by_src.values()))

    def merge_and_lift(g: pd.DataFrame) -> pd.DataFrame:
        # the term-hash partition holds EVERY (source, term) row of its
        # terms, so the per-term global count cg is exact in-partition
        g = g.groupby(["source", "term"], as_index=False)["c"].sum()
        cg = g.groupby("term")["c"].transform("sum").to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        ns = g["source"].map(n_by_src).to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "source": g["source"],
                "term": g["term"],
                "c": c,
                "lift_x": (c * big_n * 10000) // (ns * cg),
            }
        )
        return out[out["c"] >= SOURCE_LIFT_MIN_COUNT]

    lifted = _parted(parts, ("term",)).map_groups(
        merge_and_lift, batch_format="pandas"
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["lift_x", "term"], ascending=[False, True])
            .head(SOURCE_LIFT_TOPK)
            .copy()
        )
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["source", "rank", "term", "c", "lift_x"]]

    return lifted.groupby("source").map_groups(topk, batch_format="pandas")


# quality_sample: entropy tier cuts (fx4 nats) and per-tier keep rates
# (2-hex-digit md5 thresholds, the sample_stratified idiom): boilerplate
# tier ~12.5 %, mid tier 50 %, diverse tier ~99.6 %
QS_TIER_CUTS = (29_000, 32_000)
QS_RATES = ("20", "80", "ff")


def q_quality_sample(sf_dir: str):
    """Quality-weighted deterministic sampling (curriculum-style): docs
    bucket into diversity tiers by token entropy and each tier keeps a
    different deterministic md5 fraction — the standard up-weighting of
    diverse text over boilerplate when building a training mix. Zero
    shuffles end-to-end: entropy is per-document (q_token_entropy's
    scan) and the keep decision is a pure function of (doc_id, tier),
    reproducible without RNG state."""
    from ..functions.hashing import md5_hex

    def pick(t: pa.Table) -> pd.DataFrame:
        ent = t["entropy_x"].to_numpy(zero_copy_only=False)
        tier = np.digitize(ent, QS_TIER_CUTS).astype(np.int64)
        ids = t["doc_id"].to_pylist()
        keep = np.array(
            [md5_hex(str(i))[:2] < QS_RATES[tr]
             for i, tr in zip(ids, tier)]
        )
        return pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64)[keep],
                             "tier": tier[keep]})

    return q_token_entropy(sf_dir).map_batches(pick, batch_format="pyarrow")


def _quality_sample_sql() -> str:
    te = ORACLE_SQL["token_entropy"]
    t1, t2 = QS_TIER_CUTS
    r0, r1, r2 = QS_RATES
    return f"""
WITH te AS ({te}),
t AS (
  SELECT doc_id,
         CASE WHEN entropy_x < {t1} THEN 0
              WHEN entropy_x < {t2} THEN 1 ELSE 2 END AS tier
  FROM te
)
SELECT doc_id, CAST(tier AS BIGINT) AS tier FROM t
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      CASE tier WHEN 0 THEN '{r0}' WHEN 1 THEN '{r1}' ELSE '{r2}' END
"""


# related_docs: keyword-df cap (non-discriminative keywords skipped —
# bounds the per-term pair fan-out at C(cap, 2)) and min shared keywords
RELATED_MAX_TERM_DOCS = 64
RELATED_MIN_SHARED = 2


def q_related_docs(sf_dir: str):
    """Related-content pairs: unordered doc pairs sharing at least
    RELATED_MIN_SHARED of their top-3 tf·idf keywords — the bounded
    sparse similarity self-join behind "more like this" at corpus scale.

    Scale plan: the keyword table (3 rows/doc, from the one-scan
    `q_tfidf_keywords` cogroup) is term-hash partitioned; a term shared
    by k docs emits C(k, 2) pairs ONLY when 2 <= k <=
    RELATED_MAX_TERM_DOCS (a keyword common to more docs is not
    discriminative — the deterministic cap both sides mirror), so the
    pair exchange is bounded by |terms|·C(cap, 2); the final (a, b)
    count-groupby moves pair rows only."""
    kw = q_tfidf_keywords(sf_dir).select_columns(["doc_id", "term"])

    def pair_kern(g: pd.DataFrame) -> pd.DataFrame:
        # grouped_pairs wants integer group keys — factorize the terms
        # (order-irrelevant: pairs are per-group); oversize="skip" is the
        # non-discriminative-keyword rule (HAVING count(*) <= cap)
        from ..stages.dedup import grouped_pairs

        codes, _ = pd.factorize(g["term"], sort=False)
        a, b = grouped_pairs(
            codes, g["doc_id"].to_numpy(np.int64),
            RELATED_MAX_TERM_DOCS, oversize="skip",
        )
        return pd.DataFrame({"a": a, "b": b})

    pairs = _arrow_blocks(_parted(kw, ("term",)).map_groups(
        pair_kern, batch_format="pandas"))

    agg = pairs.groupby(["a", "b"]).count()

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["a", "b", "n_shared"])
        t = t.set_column(2, "n_shared", pc.cast(t["n_shared"], pa.int64()))
        return t.filter(
            pc.greater_equal(t["n_shared"], pa.scalar(RELATED_MIN_SHARED))
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _related_docs_sql() -> str:
    kw = ORACLE_SQL["tfidf_keywords"]
    return f"""
WITH kw AS ({kw}),
kd AS (SELECT term FROM kw GROUP BY term
       HAVING count(*) BETWEEN 2 AND {RELATED_MAX_TERM_DOCS}),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_shared
  FROM kw a JOIN kw b ON b.term = a.term AND b.doc_id > a.doc_id
  JOIN kd ON kd.term = a.term
  GROUP BY a.doc_id, b.doc_id
)
SELECT a, b, CAST(n_shared AS BIGINT) AS n_shared
FROM p WHERE n_shared >= {RELATED_MIN_SHARED}
"""


# debounce window for event_dedup (exact integer microseconds)
EVENT_DEDUP_WINDOW_US = 3_600_000_000


def q_event_dedup(sf_dir: str):
    """Time-windowed event deduplication (debounce): drop an event when
    the SAME (user_id, event_type) fired strictly less than
    EVENT_DEDUP_WINDOW_US earlier (previous-event semantics, i.e. SQL
    ``lag``; ties on ts collapse to the lowest event_id). The standard
    at-least-once-delivery cleanup of a 100 TB event log.

    Distributed as a user_id-hash cogroup (the sessionize plan): a
    user's timeline colocates, the kernel is one lexsort + one
    groupby-shift — no per-row Python. Exact integer microseconds
    end-to-end."""
    ev = _events(sf_dir,
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "tsu": pc.cast(t["ts"], pa.int64()),
        })

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "tsu", "event_id"])
        prev = g.groupby(["user_id", "event_type"], sort=False)["tsu"].shift()
        keep = prev.isna() | ((g["tsu"] - prev) >= EVENT_DEDUP_WINDOW_US)
        out = g.loc[keep, ["event_id", "user_id", "event_type"]]
        return out.reset_index(drop=True)

    return _parted(ev.map_batches(prep, batch_format="pyarrow"),
                   ("user_id",)).map_groups(kern, batch_format="pandas")


_EVENT_DEDUP_SQL = f"""
WITH x AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tsu,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
)
SELECT event_id, user_id, event_type FROM x
WHERE prev IS NULL OR tsu - prev >= {EVENT_DEDUP_WINDOW_US}
"""


def q_rel_rollup(sf_dir: str):
    """Multi-level aggregate (GROUP BY ROLLUP shape): leaf, per-flag
    subtotal, and grand-total rows from ONE distributed pass — the
    subtotals derive on the driver from the |flags×statuses|-sized leaf
    frame (exact: everything is fixed-point integer), so no second scan
    and no extra shuffle. 'ALL' is the rollup sentinel."""
    leaf = q_rel_agg(sf_dir).to_pandas()
    leaf = leaf.astype({"n": "int64", "qty_c": "int64", "price_c": "int64",
                        "disc_price_c": "int64"})
    meas = ["n", "qty_c", "price_c", "disc_price_c"]
    sub = leaf.groupby("l_returnflag", as_index=False)[meas].sum()
    sub["l_linestatus"] = "ALL"
    tot = leaf[meas].sum().to_frame().T
    tot["l_returnflag"] = "ALL"
    tot["l_linestatus"] = "ALL"
    cols = ["l_returnflag", "l_linestatus"] + meas
    out = pd.concat([leaf[cols], sub[cols], tot[cols]], ignore_index=True)
    return out.astype({m: "int64" for m in meas})


_REL_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       count(*) AS n,
       CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c,
       CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS price_c,
       CAST(sum(CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS disc_price_c
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# TPC-H-Q5-shaped multiway join parameters
REL_Q5_REGION = "ASIA"
REL_Q5_FROM = "1996-01-01"
REL_Q5_TO = "1997-01-01"


def q_rel_q5(sf_dir: str):
    """Multiway distributed join (TPC-H Q5 shape): revenue per nation for
    orders in a date window where customer and supplier share a nation
    inside one region — the canonical star-join a 100 TB warehouse plan
    must express.

    Scale plan: region/nation are constant-size driver tables; the
    supplier→nation map (|suppliers| ≪ |orders|) is broadcast ONCE via
    ``ray.put`` and read inside the second join kernel — never reshipped
    per batch. The two input-sized joins run as hash cogroups that
    exchange only pruned integer columns: (1) orders⨝customer on custkey
    (orders pre-filtered to the date window, customers to the region's
    nations — both predicates pushed into the scans); (2) the (orderkey,
    c_nation) result ⨝ lineitem on orderkey, where the kernel also
    applies the supplier-nation equality and pre-aggregates revenue per
    nation, so the final exchange is ≤ partitions×|nations| rows.
    Revenue is exact fixed-point cents (identical double op order as the
    SQL oracle)."""
    import pyarrow.parquet as _pq

    nat = _pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = _pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    ).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == REL_Q5_REGION, "r_regionkey"].iloc[0])
    nat = nat[nat["n_regionkey"] == rkey]
    nat_keys = pa.array(nat["n_nationkey"].astype("int64").to_numpy(),
                        pa.int64())
    supp = _pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).to_pandas()
    # dense suppkey→nationkey lookup (−1 = supplier outside the region);
    # bounded by |suppliers|, broadcast once
    lut = np.full(int(supp["s_suppkey"].max()) + 1, -1, dtype=np.int64)
    in_reg = supp["s_nationkey"].astype("int64").isin(
        set(nat["n_nationkey"].astype("int64")))
    lut[supp.loc[in_reg, "s_suppkey"].to_numpy()] = (
        supp.loc[in_reg, "s_nationkey"].astype("int64").to_numpy())
    lut_ref = ray.put(lut)

    lo = int(pd.Timestamp(REL_Q5_FROM).value // 1000)
    hi = int(pd.Timestamp(REL_Q5_TO).value // 1000)

    def o_rows(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["o_orderdate"], pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(ts, pa.scalar(lo)),
                             pc.less(ts, pa.scalar(hi))))
        n = len(t)
        return pa.table({
            "kind": pa.array(np.zeros(n, np.int8)),
            "key": pc.cast(t["o_custkey"], pa.int64()),
            "a": pc.cast(t["o_orderkey"], pa.int64()),
        })

    def c_rows(t: pa.Table) -> pa.Table:
        nk = pc.cast(t["c_nationkey"], pa.int64())
        t = t.set_column(t.schema.get_field_index("c_nationkey"),
                         "c_nationkey", nk)
        t = t.filter(pc.is_in(t["c_nationkey"], value_set=nat_keys))
        n = len(t)
        return pa.table({
            "kind": pa.array(np.ones(n, np.int8)),
            "key": pc.cast(t["c_custkey"], pa.int64()),
            "a": t["c_nationkey"],
        })

    orders = _tbl(sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(o_rows, batch_format="pyarrow")
    cust = _tbl(sf_dir, "customer",
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(c_rows, batch_format="pyarrow")

    def join1(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["kind"] == 0]
        c = g[g["kind"] == 1]
        if o.empty or c.empty:
            return pd.DataFrame({"kind": pd.Series(dtype="int8"),
                                 "key": pd.Series(dtype="int64"),
                                 "a": pd.Series(dtype="int64"),
                                 "rev_c": pd.Series(dtype="int64")})
        m = o[["key", "a"]].merge(
            c[["key", "a"]].rename(columns={"a": "c_nat"}), on="key")
        # → (orderkey, c_nation) rows for the second cogroup
        return pd.DataFrame({
            "kind": np.zeros(len(m), np.int8),
            "key": m["a"].to_numpy(),
            "a": m["c_nat"].to_numpy(),
            "rev_c": np.zeros(len(m), np.int64),
        })

    j1 = _parted(orders.union(cust), ("key",)).map_groups(
        join1, batch_format="pandas")

    def li_rows(t: pa.Table) -> pa.Table:
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({
            "kind": pa.array(np.ones(len(t), np.int8)),
            "key": pc.cast(t["l_orderkey"], pa.int64()),
            "a": pc.cast(t["l_suppkey"], pa.int64()),
            "rev_c": pa.array(_cents(ext * (1.0 - disc))),
        })

    li = _tbl(sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_rows, batch_format="pyarrow")

    def join2(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"nationkey": pd.Series(dtype="int64"),
                              "revenue_c": pd.Series(dtype="int64")})
        jo = g[g["kind"] == 0]
        lit = g[g["kind"] == 1]
        if jo.empty or lit.empty:
            return empty
        m = lit[["key", "a", "rev_c"]].merge(
            jo[["key", "a"]].rename(columns={"a": "c_nat"}), on="key")
        if m.empty:
            return empty
        s_lut = ray.get(lut_ref)
        sk = m["a"].to_numpy()
        snat = np.where(sk < len(s_lut), s_lut[np.minimum(sk, len(s_lut) - 1)],
                        -1)
        m = m[snat == m["c_nat"].to_numpy()]
        if m.empty:
            return empty
        out = m.groupby("c_nat", sort=False)["rev_c"].sum().reset_index()
        out.columns = ["nationkey", "revenue_c"]
        return out.astype({"nationkey": "int64", "revenue_c": "int64"})

    rev = (
        _arrow_blocks(_parted(j1.union(li), ("key",))
                      .map_groups(join2, batch_format="pandas"))
        .groupby("nationkey")
        .aggregate(ray.data.aggregate.Sum("revenue_c",
                                          alias_name="revenue_c"))
        .to_pandas()
    )
    names = nat.rename(columns={"n_nationkey": "nationkey"})[
        ["nationkey", "n_name"]].astype({"nationkey": "int64"})
    out = rev.merge(names, on="nationkey")
    out = out.sort_values(["revenue_c", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["n_name", "revenue_c"]].astype({"revenue_c": "int64"})


_REL_Q5_SQL = f"""
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{REL_Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{REL_Q5_FROM}'
  AND o_orderdate < TIMESTAMP '{REL_Q5_TO}'
GROUP BY n_name
"""


# embedding outlier detection: fixed-point grid + farthest-K per label
EMB_OUT_FX = 1000.0
EMB_OUT_TOPK = 3


def q_embed_outliers(sf_dir: str):
    """Embedding-space outlier detection — per label, the EMB_OUT_TOPK
    vectors farthest from their label centroid (the data-quality gate
    that flags mislabeled / corrupt vectors before training).

    Exact and summation-order-independent: coordinates quantize to the
    1e3 fixed-point grid, the centroid stays a RATIONAL (per-dim integer
    sum S, count n), so the comparable distance is
    d2n = Σ_d (q_d·n − S_d)² — all int64, no float accumulation anywhere
    (the bound |q·n − S| < 5.3e7 keeps 64·diff² far inside int64; an
    assert fires if a bigger corpus ever approaches it). Two
    column-pruned passes: (1) per-batch (label, dim) partial moments →
    one labels×dim-sized groupby; (2) the tiny (S, n) tables broadcast
    back into a scan that computes d2n and keeps a per-batch partial
    top-K per label, so the driver merge sees O(blocks·labels·K) rows."""
    from ..stages.ann import _stack

    emb_cols = ["vec_id", "embedding", "label"]

    def _quant(col) -> np.ndarray:
        return np.floor(_stack(col) * EMB_OUT_FX + 0.5).astype(np.int64)

    def moments(t: pa.Table) -> pa.Table:
        q = _quant(t["embedding"])
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        labs, inv = np.unique(lab, return_inverse=True)
        dim = q.shape[1]
        sums = np.zeros((len(labs), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(labs)).astype(np.int64)
        # dim index 0 carries the label count; coordinate sums at 1..dim
        out_lab = np.repeat(labs, dim + 1)
        out_dim = np.tile(np.arange(dim + 1, dtype=np.int64), len(labs))
        out_s = np.concatenate(
            [np.concatenate(([cnt[i]], sums[i])) for i in range(len(labs))]
        )
        return pa.table({"label": out_lab, "dim": out_dim, "s": out_s})

    emb = _emb(sf_dir, columns=emb_cols)
    mom = (
        emb.map_batches(moments, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(ray.data.aggregate.Sum("s", alias_name="s"))
        .take_all()
    )
    by_label: dict[int, dict[int, int]] = {}
    for r in mom:
        by_label.setdefault(int(r["label"]), {})[int(r["dim"])] = int(r["s"])
    n_map = {}
    s_map = {}
    for L, dims in by_label.items():
        n_map[L] = dims.pop(0)
        dim = max(dims)
        s_map[L] = np.array([dims[i] for i in range(1, dim + 1)],
                            dtype=np.int64)

    def dist_topk(t: pa.Table) -> pa.Table:
        q = _quant(t["embedding"])
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        o_lab, o_vid, o_d = [], [], []
        for L in np.unique(lab):
            sel = lab == L
            diff = q[sel] * n_map[int(L)] - s_map[int(L)][None, :]
            assert np.abs(diff).max(initial=0) < 379_000_000, (
                "embed_outliers: fixed-point distance would overflow "
                "int64 — lower EMB_OUT_FX"
            )
            d2n = (diff * diff).sum(axis=1)
            vids = vid[sel]
            order = np.lexsort((vids, -d2n))[:EMB_OUT_TOPK]
            o_lab.append(np.full(len(order), L, np.int64))
            o_vid.append(vids[order])
            o_d.append(d2n[order])
        if not o_lab:
            return pa.table({"label": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "d2n": pa.array([], pa.int64())})
        return pa.table({"label": np.concatenate(o_lab),
                         "vec_id": np.concatenate(o_vid),
                         "d2n": np.concatenate(o_d)})

    part = emb.map_batches(dist_topk, batch_format="pyarrow").to_pandas()
    out = part.sort_values(["label", "d2n", "vec_id"],
                           ascending=[True, False, True])
    out = out.groupby("label", sort=True).head(EMB_OUT_TOPK).reset_index(
        drop=True)
    out["rank"] = out.groupby("label").cumcount() + 1
    return out[["label", "vec_id", "d2n", "rank"]].astype(
        {"label": "int64", "vec_id": "int64", "d2n": "int64",
         "rank": "int64"})


_EMB_OUT_SQL = f"""
WITH u AS (
  SELECT vec_id, label, unnest(range(1, len(embedding) + 1)) AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {EMB_OUT_FX} + 0.5)
              AS BIGINT) AS q
  FROM embeddings
),
cs AS (
  SELECT label, i, CAST(sum(q) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM u GROUP BY label, i
),
d AS (
  SELECT u.vec_id AS vec_id, u.label AS label,
         CAST(sum((u.q*cs.n - cs.s)*(u.q*cs.n - cs.s)) AS BIGINT) AS d2n
  FROM u JOIN cs ON cs.label = u.label AND cs.i = u.i
  GROUP BY u.vec_id, u.label
),
r AS (
  SELECT label, vec_id, d2n,
         row_number() OVER (PARTITION BY label
                            ORDER BY d2n DESC, vec_id ASC) AS rank
  FROM d
)
SELECT CAST(label AS BIGINT) AS label, vec_id, d2n, rank
FROM r WHERE rank <= {EMB_OUT_TOPK}
"""


# group_percentiles: exact per-event-type value percentiles
GP_PCTS = (25, 50, 75, 90, 99)


def q_group_percentiles(sf_dir: str):
    """Exact per-group percentiles (p25/p50/p75/p90/p99 of event value
    per event_type) — the grouped-quantile primitive a data-quality
    dashboard needs. Same plan as dl_percentiles: values quantize to
    exact integer cents, each batch emits a (type, cents) partial
    histogram, one bounded groupby-sum combines them (rows = distinct
    cent values per type, NOT rows of input), and the driver walks the
    ≤|types| cumulative sums. Zero input-sized shuffles at any scale."""
    ev = _events(sf_dir, columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        vc = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        pdf = (pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                             "vc": vc})
               .groupby(["event_type", "vc"], sort=False)
               .size().reset_index(name="n"))
        return from_pandas_clean(pdf, preserve_index=False)

    hist = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "vc"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # bounded: one row per distinct (type, cents)
    )
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("vc")
        cum = g["n"].to_numpy(np.int64).cumsum()
        vcv = g["vc"].to_numpy(np.int64)
        tot = int(cum[-1])
        row = {"event_type": et}
        for p in GP_PCTS:
            thresh = (p * tot + 99) // 100  # exact ceil(p*tot/100)
            row[f"p{p}"] = int(vcv[np.searchsorted(cum, thresh, side="left")])
        rows.append(row)
    return (pd.DataFrame(rows).sort_values("event_type")
            .reset_index(drop=True))


_GP_PCT_COLS = ",\n  ".join(
    f"min(vc) FILTER (WHERE cum >= ceil(({p} * tot) / 100.0)) AS p{p}"
    for p in GP_PCTS
)
_GROUP_PCT_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
h AS (SELECT event_type, vc, count(*) AS n FROM v GROUP BY event_type, vc),
c AS (SELECT event_type, vc,
        sum(n) OVER (PARTITION BY event_type ORDER BY vc) AS cum,
        sum(n) OVER (PARTITION BY event_type) AS tot
      FROM h)
SELECT event_type,
  {_GP_PCT_COLS}
FROM c GROUP BY event_type
"""


def q_rel_antijoin(sf_dir: str):
    """Anti-join primitive (TPC-H Q22 shape): customers with an
    above-average account balance who placed NO urgent order. The
    above-average test is exact integer cross-multiplication
    (vc·n > Σvc — no float average), and the anti-join is a custkey-hash
    cogroup where the orders side is pre-filtered to '1-URGENT' and
    ships only per-batch-distinct custkeys (a key set, not order rows):
    per partition, keep the customer rows whose key never appears on the
    orders side. Exchange = |customers| + |distinct urgent custkeys|
    rows; no broadcast, no driver set."""
    cust = _tbl(sf_dir, "customer",
        columns=["c_custkey", "c_acctbal"])

    def c_cents(t: pa.Table) -> pa.Table:
        vc = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"key": pc.cast(t["c_custkey"], pa.int64()),
                         "vc": pa.array(vc, pa.int64())})

    cents = cust.map_batches(c_cents, batch_format="pyarrow")

    def bal_partial(t: pa.Table) -> pa.Table:
        vc = t["vc"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(vc.sum())], pa.int64()),
                         "n": pa.array([len(vc)], pa.int64())})

    stats = cents.map_batches(bal_partial, batch_format="pyarrow").to_pandas()
    tot, n = int(stats["s"].sum()), int(stats["n"].sum())

    def c_rows(t: pa.Table) -> pa.Table:
        vc = t["vc"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(vc * n > tot))
        return pa.table({"kind": pa.array(np.zeros(len(t), np.int8)),
                         "key": t["key"], "vc": t["vc"]})

    def o_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        keys = np.unique(pc.cast(t["o_custkey"], pa.int64())
                         .to_numpy(zero_copy_only=False))
        return pa.table({"kind": pa.array(np.ones(len(keys), np.int8)),
                         "key": pa.array(keys, pa.int64()),
                         "vc": pa.array(np.zeros(len(keys), np.int64))})

    cand = cents.map_batches(c_rows, batch_format="pyarrow")
    okeys = _tbl(sf_dir, "orders",
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(o_rows, batch_format="pyarrow")

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["kind"] == 0]
        placed = g.loc[g["kind"] == 1, "key"].to_numpy()
        keep = c[~c["key"].isin(placed)]
        return pd.DataFrame({
            "c_custkey": keep["key"].to_numpy(np.int64),
            "acctbal_cents": keep["vc"].to_numpy(np.int64)})

    return _parted(cand.union(okeys), ("key",)).map_groups(
        anti, batch_format="pandas"
    ).select_columns(["c_custkey", "acctbal_cents"])


_REL_ANTIJOIN_SQL = """
WITH c AS (
  SELECT c_custkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS vc
  FROM customer
),
s AS (SELECT CAST(sum(vc) AS BIGINT) AS tot,
             CAST(count(*) AS BIGINT) AS n FROM c)
SELECT c.c_custkey AS c_custkey, c.vc AS acctbal_cents
FROM c, s
WHERE c.vc * s.n > s.tot
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


# linreg_fit: fixed-point scale for the fitted coefficients
LINREG_SCALE = 10**9


def q_linreg_fit(sf_dir: str):
    """Distributed ordinary-least-squares fit (the trainable-regression
    analog of nb_classify): predict a document's character count from
    two integer features — tokenized length dl and 'e'-occurrence
    count (a letter-frequency feature; the synthetic text carries no
    punctuation) — by
    solving the 3×3 normal equations. Each batch emits ONE row of exact
    int64 moment sums (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y);
    the driver folds the ≤num_batches rows and solves via an explicit
    Cramer expansion written with the IDENTICAL float64 operation order
    as the SQL oracle, so the fx9 coefficients hash-match bit-for-bit.
    Exchange is 9 integers per batch regardless of corpus size. (Moments
    stay < 2^53 well past 10^9 docs at these feature magnitudes; beyond
    that the fold would move to hugeint/compensated summation.)"""
    docs = _docs(sf_dir)

    def moments(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        y = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(
            np.int64)
        x2 = (y - pc.utf8_length(pc.replace_substring(text, "e", ""))
              .to_numpy(zero_copy_only=False)).astype(np.int64)
        x1 = _dl_batch(t)["dl"].to_numpy(zero_copy_only=False)
        return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in {
            "n": len(y), "s1": x1.sum(), "s2": x2.sum(), "sy": y.sum(),
            "s11": (x1 * x1).sum(), "s12": (x1 * x2).sum(),
            "s22": (x2 * x2).sum(), "s1y": (x1 * y).sum(),
            "s2y": (x2 * y).sum()}.items()})

    m = docs.map_batches(moments, batch_format="pyarrow").to_pandas()
    n, s1, s2, sy, s11, s12, s22, s1y, s2y = (
        float(int(m[c].sum())) for c in
        ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y"))

    def det3(a, b, c, d, e, f, g, h, i):
        # identical operation order to the SQL oracle's expansion
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
    b1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
    b2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
    fx = LINREG_SCALE
    return pd.DataFrame({
        "n": pd.array([int(n)], dtype="int64"),
        "b0_x": pd.array([int(np.floor(b0 * fx + 0.5))], dtype="int64"),
        "b1_x": pd.array([int(np.floor(b1 * fx + 0.5))], dtype="int64"),
        "b2_x": pd.array([int(np.floor(b2 * fx + 0.5))], dtype="int64"),
    })


_LINREG_SQL = f"""
WITH {_DL_CTE},
f AS (
  SELECT d.dl AS x1,
         length(doc.text) - length(replace(doc.text, 'e', '')) AS x2,
         length(doc.text) AS y
  FROM documents doc JOIN dl d USING (doc_id)
),
mom AS (
  SELECT CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n,
         CAST(CAST(sum(x1) AS BIGINT) AS DOUBLE) AS s1,
         CAST(CAST(sum(x2) AS BIGINT) AS DOUBLE) AS s2,
         CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
         CAST(CAST(sum(x1*x1) AS BIGINT) AS DOUBLE) AS s11,
         CAST(CAST(sum(x1*x2) AS BIGINT) AS DOUBLE) AS s12,
         CAST(CAST(sum(x2*x2) AS BIGINT) AS DOUBLE) AS s22,
         CAST(CAST(sum(x1*y) AS BIGINT) AS DOUBLE) AS s1y,
         CAST(CAST(sum(x2*y) AS BIGINT) AS DOUBLE) AS s2y
  FROM f
),
sol AS (
  SELECT CAST(n AS BIGINT) AS n,
    (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))
      AS det,
    (sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
       + s2*(s1y*s12 - s11*s2y)) AS d0,
    (n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
       + s2*(s1*s2y - s1y*s2)) AS d1,
    (n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
       + sy*(s1*s12 - s11*s2)) AS d2
  FROM mom
)
SELECT n,
  CAST(floor((d0/det) * {LINREG_SCALE} + 0.5) AS BIGINT) AS b0_x,
  CAST(floor((d1/det) * {LINREG_SCALE} + 0.5) AS BIGINT) AS b1_x,
  CAST(floor((d2/det) * {LINREG_SCALE} + 0.5) AS BIGINT) AS b2_x
FROM sol
"""


# mmr_rerank: query vector, candidate pool, picks, quantization scale.
# λ = 0.5 is exact in integers: score = 2·rel − max-sim-to-selected.
MMR_QUERY_ID = 0
MMR_POOL = 20
MMR_K = 5
MMR_Q_SCALE = 10**6


def q_mmr_rerank(sf_dir: str):
    """Maximal-marginal-relevance diversified retrieval: greedily pick
    MMR_K vectors from the query's top-MMR_POOL inner-product candidates,
    each step maximizing 2·rel(i) − max_{j∈selected} sim(i, j) (λ = 0.5
    kept exact by the ×2). Everything is exact int64 — embeddings
    quantize to floor(v·10⁶ + 0.5) so dots are integers and the greedy
    argmax (ties → lowest vec_id) is deterministic on any cluster.

    Scale plan: the relevance scan is the ann_topk shape — the tiny
    quantized query vector rides the closure, each batch emits its
    partial top-POOL (exchange = batches × POOL rows), and everything
    after the pool selection is O(POOL²) driver math on 20 vectors. The
    candidate-embedding fetch is a second column-pruned filtered scan,
    not a take_all of the corpus."""
    from ..stages.ann import _stack

    emb = _emb(sf_dir, columns=["vec_id", "embedding"])
    qid_arr = pa.array([MMR_QUERY_ID], pa.int64())
    qrow = emb.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qid_arr)),
        batch_format="pyarrow",
    ).take_all()
    qq = np.floor(
        np.asarray(qrow[0]["embedding"], np.float64) * MMR_Q_SCALE + 0.5
    ).astype(np.int64)

    def rel_partial(t: pa.Table) -> pa.Table:
        m = _stack(t["embedding"])
        q = np.floor(m * MMR_Q_SCALE + 0.5).astype(np.int64)
        rel = q @ qq
        vec = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = vec != MMR_QUERY_ID
        rel, vec = rel[mask], vec[mask]
        order = np.lexsort((vec, -rel))[:MMR_POOL]
        return pa.table({"vec_id": pa.array(vec[order], pa.int64()),
                         "rel": pa.array(rel[order], pa.int64())})

    pool = (emb.map_batches(rel_partial, batch_format="pyarrow")
            .to_pandas()  # bounded: ≤ num_batches × MMR_POOL rows
            .sort_values(["rel", "vec_id"], ascending=[False, True])
            .head(MMR_POOL).reset_index(drop=True))
    cand_ids = pool["vec_id"].to_numpy(np.int64)
    rel_by_id = dict(zip(cand_ids, pool["rel"].to_numpy(np.int64)))

    cid_arr = pa.array([int(c) for c in cand_ids], pa.int64())
    crows = emb.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=cid_arr)),
        batch_format="pyarrow",
    ).take_all()  # bounded: MMR_POOL rows
    cvecs = {r["vec_id"]: np.floor(
        np.asarray(r["embedding"], np.float64) * MMR_Q_SCALE + 0.5
    ).astype(np.int64) for r in crows}
    cmat = np.stack([cvecs[c] for c in cand_ids])
    sims = cmat @ cmat.T  # exact int64, POOL × POOL
    idx = {int(c): i for i, c in enumerate(cand_ids)}

    selected: list[tuple[int, int]] = []
    remaining = [int(c) for c in cand_ids]
    while remaining and len(selected) < MMR_K:
        best = None
        for c in remaining:  # ≤ MMR_POOL iterations — driver-tiny
            sc = 2 * int(rel_by_id[c])
            if selected:
                sc -= max(int(sims[idx[c], idx[s]]) for s, _ in selected)
            if best is None or sc > best[1] or (sc == best[1] and c < best[0]):
                best = (c, sc)
        selected.append(best)
        remaining.remove(best[0])
    return pd.DataFrame({
        "rank": pd.array(range(1, len(selected) + 1), dtype="int64"),
        "vec_id": pd.array([c for c, _ in selected], dtype="int64"),
        "mmr_x": pd.array([s for _, s in selected], dtype="int64"),
    })


def _mmr_sql() -> str:
    """Greedy selection unrolled to MMR_K picks — each step re-scores the
    unselected pool against the selected set and takes the (sc DESC,
    vec_id ASC) head; all-integer so the argmax is exact."""
    qid, pooln, scale = MMR_QUERY_ID, MMR_POOL, MMR_Q_SCALE
    ctes = [f"""uq AS (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}.0 + 0.5)
              AS BIGINT) AS q
  FROM embeddings
)""", f"""rel AS (
  SELECT ub.vec_id AS vec_id, CAST(sum(a.q * ub.q) AS BIGINT) AS rel
  FROM uq a JOIN uq ub ON ub.i = a.i AND ub.vec_id <> {qid}
  WHERE a.vec_id = {qid}
  GROUP BY ub.vec_id
)""", f"""cand AS (
  SELECT vec_id, rel FROM (
    SELECT vec_id, rel,
           row_number() OVER (ORDER BY rel DESC, vec_id ASC) AS rn
    FROM rel) WHERE rn <= {pooln}
)""", """sims AS (
  SELECT ua.vec_id AS a, ub.vec_id AS b, CAST(sum(ua.q * ub.q) AS BIGINT) AS s
  FROM uq ua JOIN uq ub ON ub.i = ua.i AND ua.vec_id <> ub.vec_id
  JOIN cand ca ON ca.vec_id = ua.vec_id
  JOIN cand cb ON cb.vec_id = ub.vec_id
  GROUP BY ua.vec_id, ub.vec_id
)""", "pick1 AS (SELECT vec_id, 2*rel AS sc FROM cand "
      "ORDER BY rel DESC, vec_id ASC LIMIT 1)",
      "sel1 AS (SELECT vec_id FROM pick1)"]
    for st in range(2, MMR_K + 1):
        ctes.append(f"""p{st} AS (
  SELECT c.vec_id AS vec_id, 2*c.rel - max(s.s) AS sc
  FROM cand c JOIN sims s ON s.a = c.vec_id
  JOIN sel{st - 1} sl ON sl.vec_id = s.b
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{st - 1})
  GROUP BY c.vec_id, c.rel
)""")
        ctes.append(f"pick{st} AS (SELECT vec_id, sc FROM p{st} "
                    "ORDER BY sc DESC, vec_id ASC LIMIT 1)")
        ctes.append(f"sel{st} AS (SELECT vec_id FROM sel{st - 1} "
                    f"UNION ALL SELECT vec_id FROM pick{st})")
    out = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id, sc AS mmr_x "
        f"FROM pick{i}" for i in range(1, MMR_K + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + out


# cross_dedup: the "incoming crawl" source batch — near-dup pairs are
# reported only when exactly one side belongs to it
CROSS_NEW_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def q_cross_dedup(sf_dir: str):
    """Incremental-crawl dedup: near-duplicate pairs where exactly one
    side belongs to the incoming source batch (CROSS_NEW_SOURCES) — the
    dedupe-new-data-against-the-existing-corpus step every recurring
    crawl ingestion runs. Composes the fully-distributed minhash verify,
    then attaches each side's source by a doc_id-hash cogroup against a
    two-column (doc_id, source) scan (the pair list is near-dup-sized;
    the corpus-sized side travels only by hash colocation, nothing is
    broadcast), and keeps pairs with exactly one new side. Output:
    (new_doc, dup_of, jaccard_x)."""
    pairs = q_minhash_pairs(sf_dir)

    def side_rows(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        j = t["jaccard_x"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
            "a": pa.array(np.concatenate([a, a]), pa.int64()),
            "b": pa.array(np.concatenate([b, b]), pa.int64()),
            "jaccard_x": pa.array(np.concatenate([j, j]), pa.int64()),
        })

    new_arr = pa.array(list(CROSS_NEW_SOURCES), pa.string())

    def src_rows(t: pa.Table) -> pa.Table:
        # source rows ride the same schema: a = −1 marks a new-batch doc,
        # a = −2 an existing-corpus doc (pair rows always have a ≥ 0)
        is_new = pc.is_in(t["source"], value_set=new_arr).to_numpy(
            zero_copy_only=False)
        flag = np.where(is_new, -1, -2).astype(np.int64)
        n = len(t)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "a": pa.array(flag, pa.int64()),
            "b": pa.array(np.zeros(n, np.int64)),
            "jaccard_x": pa.array(np.zeros(n, np.int64)),
        })

    srcs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(src_rows, batch_format="pyarrow")

    def attach_src(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["kpart"]) if "kpart" in g.columns else g
        src = g[g["a"] < 0]
        pr = g[g["a"] >= 0]
        if src.empty or pr.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 ("a", "b", "jaccard_x", "doc_id", "is_new")})
        m = pr.merge(src[["doc_id", "a"]].rename(columns={"a": "flag"}),
                     on="doc_id")
        m["is_new"] = (m["flag"] == -1).astype(np.int64)
        return m[["a", "b", "jaccard_x", "doc_id", "is_new"]]

    sides = pairs.map_batches(side_rows, batch_format="pyarrow")
    attached = _parted(sides.union(srcs), ("doc_id",)).map_groups(
        attach_src, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["kpart"]) if "kpart" in g.columns else g
        out_new, out_dup, out_j = [], [], []
        for (a, b), gg in g.groupby(["a", "b"], sort=False):
            if len(gg) != 2 or int(gg["is_new"].sum()) != 1:
                continue
            new_row = gg[gg["is_new"] == 1].iloc[0]
            out_new.append(int(new_row["doc_id"]))
            out_dup.append(int(b if int(new_row["doc_id"]) == a else a))
            out_j.append(int(new_row["jaccard_x"]))
        return pd.DataFrame({
            "new_doc": pd.Series(out_new, dtype="int64"),
            "dup_of": pd.Series(out_dup, dtype="int64"),
            "jaccard_x": pd.Series(out_j, dtype="int64")})

    return _parted(attached, ("a", "b")).map_groups(
        combine, batch_format="pandas")


def _cross_dedup_sql() -> str:
    new_in = ", ".join(f"'{s}'" for s in CROSS_NEW_SOURCES)
    return f"""
WITH p AS ({ORACLE_SQL["minhash_pairs"]})
SELECT CASE WHEN sa.source IN ({new_in}) THEN p.a ELSE p.b END AS new_doc,
       CASE WHEN sa.source IN ({new_in}) THEN p.b ELSE p.a END AS dup_of,
       p.jaccard_x AS jaccard_x
FROM p
JOIN documents sa ON sa.doc_id = p.a
JOIN documents sb ON sb.doc_id = p.b
WHERE (sa.source IN ({new_in})) <> (sb.source IN ({new_in}))
"""


def q_value_norm(sf_dir: str):
    """Per-group min–max feature scaling (the fit+transform shape of a
    distributed preprocessing step): each event's value rescaled to
    [0, 10000] within its event_type. Exact end-to-end: values quantize
    to integer cents, per-type (min, max) come from 2-integers-per-batch
    partials folded on the driver (a tiny dict, captured by the second
    scan's closure — never reshipped per batch), and the transform is
    integer floor division ((vc−min)·10⁴ // (max−min)). Two column-pruned
    scans, zero shuffles."""
    ev = _events(sf_dir, columns=["event_id", "event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        vc = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "event_type": t["event_type"],
                         "vc": pa.array(vc, pa.int64())})

    def mm_partial(t: pa.Table) -> pa.Table:
        pdf = (t.to_pandas().groupby("event_type", sort=False)["vc"]
               .agg(["min", "max"]).reset_index())
        return from_pandas_clean(pdf, preserve_index=False)

    cents = ev.map_batches(to_cents, batch_format="pyarrow")
    mm = (cents.map_batches(mm_partial, batch_format="pyarrow")
          .to_pandas()  # bounded: |types| rows per batch
          .groupby("event_type").agg(mn=("min", "min"), mx=("max", "max")))
    lo = mm["mn"].to_dict()
    hi = mm["mx"].to_dict()

    def transform(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        mn = pdf["event_type"].map(lo).to_numpy(np.int64)
        mx = pdf["event_type"].map(hi).to_numpy(np.int64)
        span = mx - mn
        vc = pdf["vc"].to_numpy(np.int64)
        # degenerate group (min == max) pins to 0, mirrored in SQL
        norm = np.where(span > 0, ((vc - mn) * 10000) // np.maximum(span, 1),
                        0).astype(np.int64)
        return pa.table({"event_id": pa.array(pdf["event_id"], pa.int64()),
                         "event_type": pa.array(pdf["event_type"]),
                         "norm_x": pa.array(norm, pa.int64())})

    return cents.map_batches(transform, batch_format="pyarrow")


_VALUE_NORM_SQL = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
mm AS (SELECT event_type, min(vc) AS mn, max(vc) AS mx
       FROM v GROUP BY event_type)
SELECT v.event_id AS event_id, v.event_type AS event_type,
       CASE WHEN mm.mx > mm.mn
            THEN CAST(((v.vc - mm.mn) * 10000) // (mm.mx - mm.mn) AS BIGINT)
            ELSE 0 END AS norm_x
FROM v JOIN mm USING (event_type)
"""


def q_export_roundtrip(sf_dir: str):
    """Resumable partitioned-export round-trip (pipelines/export.py, the
    generic sink): stream documents into a hash-sharded Parquet export
    with per-shard atomic commit manifests, then read the committed
    export back through the integrity-checked reader and project
    (doc_id, lang, text_chars). Hash equality against the source table
    proves the sink+source pair is lossless end-to-end; the resume /
    skip-committed semantics are kill-tested in tests/test_export.py.
    Reference analog: the per-stage pickle checkpoints
    (cosine_similarity_bm25_reranking.py:288-331) re-expressed as
    partitioned Parquet a failed 100-TB run can resume."""
    import shutil
    import tempfile

    from .export import export_partitioned, read_export

    out = os.path.join(
        tempfile.gettempdir(),
        "drr_export_rt_" + hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:10],
    )
    # fresh run each call: the query must re-exercise the full write path
    shutil.rmtree(out, ignore_errors=True)
    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    export_partitioned(
        ds, out, num_shards=16, key_col="doc_id", fingerprint="docs:" + sf_dir
    )
    back = read_export(out, num_shards=16)

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang": t["lang"],
                "text_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    return back.map_batches(proj, batch_format="pyarrow")


_EXPORT_RT_SQL = """
SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS text_chars
FROM documents
"""


PACK_BUDGET = 2048  # tokens per packed training sequence (concat-and-chunk)
PACK_RANGE = 256  # doc_id range width = one leaf of the distributed scan


def q_seq_pack(sf_dir: str):
    """LLM pretraining sequence packing (concat-and-chunk): per language,
    documents are concatenated in doc_id order and the token stream is
    cut into PACK_BUDGET-token sequences; each doc is assigned the
    pack_id its first token falls into. The interesting primitive is the
    ORDERED prefix sum, which no Ray Data verb provides — implemented as
    the classic two-level distributed scan: (1) one pass counts tokens
    per doc and folds per-(lang, doc_id-range) partial sums (tiny:
    ranges × langs rows), (2) the driver exclusive-scans that sidecar in
    (lang, range) order, (3) a second partition-level pass sorts each
    range locally and adds its broadcast base offset. Exchange = one
    (lang,range)-hash shuffle of 4 integer columns; the sidecar scan on
    the driver is |corpus|/PACK_RANGE rows (at 100 TB with PACK_RANGE
    sized to ~1e6 docs that is thousands of rows, not data-scale).
    Reference analog: none (extension); semantics match GPT-style
    concat-and-chunk dataloaders."""
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"],
        # data-sized fan-out: the counted stream feeds a cogroup sort
        # whose cost is per-block (SCALE.md block-compaction rule)
        override_num_blocks=max(8, min(256, n_docs // 20_000 + 1)))

    def count_tokens(t: pa.Table) -> pa.Table:
        # vectorized token count ≙ len(TOKLIST) — same Arrow kernels as
        # _dl_batch (tested equal to tokenize_simple in test_functions)
        n = _dl_batch(t)["dl"]
        did = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "doc_id": did,
                "lang": t["lang"],
                "n_tokens": n,
                "r": pc.divide(did, pa.scalar(PACK_RANGE, pa.int64())),
            }
        )

    toks = docs.map_batches(count_tokens, batch_format="pyarrow")

    def range_partial(t: pa.Table) -> pa.Table:
        pdf = (
            t.select(["lang", "r", "n_tokens"])
            .to_pandas()
            .groupby(["lang", "r"], sort=False)["n_tokens"]
            .sum()
            .reset_index(name="s")
        )
        return from_pandas_clean(pdf, preserve_index=False)

    sums = (
        toks.map_batches(range_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: langs × ranges rows, NOT input rows
        .groupby(["lang", "r"], as_index=False)["s"]
        .sum()
        .sort_values(["lang", "r"])
    )
    # exclusive scan per lang over range order → base offset of each range
    sums["base"] = sums.groupby("lang")["s"].cumsum() - sums["s"]
    off_df = sums[["lang", "r", "base"]].reset_index(drop=True)

    parts = toks.map_batches(
        add_kpart, fn_kwargs={"num_parts": 32, "cols": ("lang", "r")},
        batch_format="pyarrow",
    )

    def scan_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "r", "doc_id"])
        local = (
            g.groupby(["lang", "r"], sort=False)["n_tokens"].cumsum()
            - g["n_tokens"]
        )
        m = g.merge(off_df, on=["lang", "r"], how="left", sort=False)
        start = local.to_numpy(np.int64) + m["base"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "lang": g["lang"].to_numpy(),
                "n_tokens": g["n_tokens"].to_numpy(np.int64),
                "pack_id": start // PACK_BUDGET,
            }
        )

    return parts.groupby("kpart").map_groups(
        scan_partition, batch_format="pandas"
    )


_SEQ_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, len({TOKLIST.format(col="text")}) AS n_tokens
  FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(coalesce(sum(n_tokens) OVER (
         PARTITION BY lang ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       // {PACK_BUDGET} AS BIGINT) AS pack_id
FROM t
"""


# denylist-term scrub (the PII-redaction shape: emails/phones at 100 TB,
# corpus-vocabulary terms here so the patterns actually fire on testdata)
REDACT_PATTERN = r"\b(customer|key|value)\b"


def q_redact_terms(sf_dir: str):
    """Denylist-regex redaction audit — the PII-scrub stage of a training
    -data pipeline (emails, phone numbers, denylist terms). Per doc:
    match count and the post-redaction character length. Entirely
    RE2-vectorized (`pc.count_substring_regex` /
    `pc.replace_substring_regex` — both engines run RE2, so \\b
    semantics agree); single column-pruned scan, zero shuffles, no
    Python loop. Reference analog: the preprocessing regex strips
    (final_implementation.py:30-47), generalized to redaction."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        txt = t["text"]
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_hits": pc.cast(
                    pc.count_substring_regex(txt, REDACT_PATTERN), pa.int64()
                ),
                "clean_chars": pc.cast(
                    pc.utf8_length(
                        pc.replace_substring_regex(txt, REDACT_PATTERN, "")
                    ),
                    pa.int64(),
                ),
            }
        )

    return docs.map_batches(scrub, batch_format="pyarrow")


_REDACT_SQL = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{REDACT_PATTERN}')) AS BIGINT) AS n_hits,
  CAST(length(regexp_replace(text, '{REDACT_PATTERN}', '', 'g')) AS BIGINT)
    AS clean_chars
FROM documents
"""


APPROX_PCT_BIN = 500  # histogram bin width in cents (5.00 units)
APPROX_PCTS = (50, 95, 99)


def q_approx_percentiles(sf_dir: str):
    """Approximate per-group percentiles from a MERGEABLE fixed-width
    histogram sketch — the scale path beside the exact
    `group_percentiles`: the exact plan's combine state is one row per
    DISTINCT value, this one's is one row per BIN (bounded by
    value-range/bin, independent of cardinality), so it survives
    columns where distinct values ≈ rows. Estimate = lower edge of the
    first bin whose cumulative count reaches ceil(p·n/100) — a
    deterministic estimator mirrored exactly in SQL, so parity is exact
    even though the estimate is approximate. Error bound ≤ one bin
    width by construction."""
    ev = _events(sf_dir, columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        vc = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        b = np.floor(vc / float(APPROX_PCT_BIN)).astype(np.int64)
        pdf = (
            pd.DataFrame({"event_type": t["event_type"].to_pandas(), "bin": b})
            .groupby(["event_type", "bin"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return from_pandas_clean(pdf, preserve_index=False)

    hist = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # bounded: types × bins rows
    )
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("bin")
        cum = g["n"].to_numpy(np.int64).cumsum()
        edges = g["bin"].to_numpy(np.int64) * APPROX_PCT_BIN
        tot = int(cum[-1])
        row = {"event_type": et}
        for p in APPROX_PCTS:
            thresh = (p * tot + 99) // 100  # exact ceil(p*tot/100)
            row[f"p{p}_est"] = int(
                edges[np.searchsorted(cum, thresh, side="left")]
            )
        rows.append(row)
    return (
        pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    )


_APPROX_PCT_COLS = ",\n  ".join(
    f"min(edge) FILTER (WHERE cum >= ceil(({p} * tot) / 100.0)) AS p{p}_est"
    for p in APPROX_PCTS
)
_APPROX_PCT_SQL = f"""
WITH v AS (
  SELECT event_type,
         CAST(floor(CAST(floor(value * 100 + 0.5) AS BIGINT)
              / {APPROX_PCT_BIN}.0) AS BIGINT) AS bin
  FROM events
),
h AS (SELECT event_type, bin, count(*) AS n FROM v GROUP BY event_type, bin),
c AS (SELECT event_type, bin * {APPROX_PCT_BIN} AS edge,
        sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        sum(n) OVER (PARTITION BY event_type) AS tot
      FROM h)
SELECT event_type,
  {_APPROX_PCT_COLS}
FROM c GROUP BY event_type
"""


SKEW_SALTS = 4  # fact-side salt fanout for hot join keys


def q_rel_skew_join(sf_dir: str):
    """Skew-aware (salted) repartition join: per-mktsegment event count
    and exact-cents value total for events joined to customer on
    user_id = c_custkey. A plain key-hash cogroup sends EVERY row of a
    hot key to one partition — with Zipf-skewed user activity one task
    would own the head user's entire history. The salted plan bounds
    that: fact rows get salt = event_id mod S placement-only, the dim
    side is replicated S× (one copy per salt), and the cogroup runs on
    (key, salt), so a hot key's fact rows spread over S partitions at
    the cost of S×|dim| replicated rows (|dim| ≪ |fact| makes that the
    right trade; S sizes to the observed head/mean skew ratio). The
    per-partition kernel joins via a dim dict and folds per-segment
    integer partials, so the final exchange is ≤ partitions × segments
    rows. Results are salt-invariant (asserted by the plain-join SQL
    oracle). Reference analog: none (scale extension)."""
    ev = _events(sf_dir, columns=["event_id", "user_id", "value"])
    cust = _tbl(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def fact_rows(t: pa.Table) -> pa.Table:
        vc = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(t)
        return pa.table(
            {
                "kind": pa.array(np.zeros(n, np.int8)),
                "key": pc.cast(t["user_id"], pa.int64()),
                "salt": pa.array(eid % SKEW_SALTS, pa.int64()),
                "vc": pa.array(vc, pa.int64()),
                "seg": pa.array([""] * n, pa.string()),
            }
        )

    def dim_rows(t: pa.Table) -> pa.Table:
        # replicate each dim row once per salt bucket
        n = len(t)
        key = np.repeat(
            t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            SKEW_SALTS,
        )
        seg = np.repeat(np.asarray(t["c_mktsegment"].to_pylist(), object),
                        SKEW_SALTS)
        salt = np.tile(np.arange(SKEW_SALTS, dtype=np.int64), n)
        m = n * SKEW_SALTS
        return pa.table(
            {
                "kind": pa.array(np.ones(m, np.int8)),
                "key": pa.array(key, pa.int64()),
                "salt": pa.array(salt, pa.int64()),
                "vc": pa.array(np.zeros(m, np.int64)),
                "seg": pa.array(seg, pa.string()),
            }
        )

    both = (
        ev.map_batches(fact_rows, batch_format="pyarrow")
        .union(cust.map_batches(dim_rows, batch_format="pyarrow"))
        .map_batches(
            add_kpart,
            fn_kwargs={"num_parts": 32, "cols": ("key", "salt")},
            batch_format="pyarrow",
        )
    )

    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["kind"] == 1]
        fact = g[g["kind"] == 0]
        if dim.empty or fact.empty:
            return pd.DataFrame(
                {"c_mktsegment": pd.Series([], dtype=object),
                 "n_events": pd.Series([], dtype=np.int64),
                 "value_c": pd.Series([], dtype=np.int64)}
            )
        # one key can land here under several salts — dedupe to a unique
        # key→segment map (the replicas are identical by construction)
        dim = dim.drop_duplicates("key")
        seg = fact["key"].map(
            pd.Series(dim["seg"].to_numpy(), index=dim["key"].to_numpy())
        )
        keep = seg.notna()
        out = (
            pd.DataFrame({"c_mktsegment": seg[keep].to_numpy(),
                          "vc": fact.loc[keep, "vc"].to_numpy(np.int64)})
            .groupby("c_mktsegment", sort=False)["vc"]
            .agg(n_events="size", value_c="sum")
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        out["value_c"] = out["value_c"].astype(np.int64)
        return out

    return (
        _arrow_blocks(both.groupby("kpart")
                      .map_groups(join_partition, batch_format="pandas"))
        .groupby("c_mktsegment")
        .aggregate(
            ray.data.aggregate.Sum("n_events", alias_name="n_events"),
            ray.data.aggregate.Sum("value_c", alias_name="value_c"),
        )
    )


_SKEW_JOIN_SQL = """
SELECT c.c_mktsegment AS c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_c
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_upsert_apply(sf_dir: str):
    """CDC merge (MERGE INTO / upsert): apply a changelog of updates and
    deletes onto a keyed base snapshot — the shape every incremental
    100-TB ingest needs. The changelog here is derived deterministically
    from the base in the same scan (doc_id ≡ 3 mod 7 → update bumping
    n_chars by 1000; doc_id ≡ 5 mod 13 → delete; a key matching both
    gets DELETE precedence): one pass emits tagged rows (0 = base,
    1 = update, 2 = delete), a doc_id-hash cogroup colocates each key's
    rows, and the per-partition kernel applies precedence vectorized
    (delete wins, else update value, else base). Exchange = base +
    changelog rows, pruned to 4 integer/str columns; at scale the
    changelog side is the (small) incremental batch and the plan is
    unchanged. Related: `latest_event` (keep-latest without ops),
    `bm25_deleted` (tombstone serving)."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])

    def emit(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        lang = np.asarray(t["lang"].to_pylist(), object)
        nc = pc.cast(t["n_chars"], pa.int64()).to_numpy(zero_copy_only=False)
        upd = did % 7 == 3
        del_ = did % 13 == 5
        kind = np.concatenate(
            [np.zeros(len(did), np.int8),
             np.ones(int(upd.sum()), np.int8),
             np.full(int(del_.sum()), 2, np.int8)]
        )
        return pa.table(
            {
                "kind": pa.array(kind),
                "doc_id": pa.array(
                    np.concatenate([did, did[upd], did[del_]]), pa.int64()),
                "lang": pa.array(
                    np.concatenate([lang, lang[upd], lang[del_]]), pa.string()),
                "n_chars": pa.array(
                    np.concatenate([nc, nc[upd] + 1000,
                                    np.zeros(int(del_.sum()), np.int64)]),
                    pa.int64()),
            }
        )

    parts = (
        docs.map_batches(emit, batch_format="pyarrow")
        .map_batches(add_kpart,
                     fn_kwargs={"num_parts": 32, "cols": ("doc_id",)},
                     batch_format="pyarrow")
    )

    def apply_partition(g: pd.DataFrame) -> pd.DataFrame:
        deleted = set(g.loc[g["kind"] == 2, "doc_id"].to_numpy(np.int64))
        upd = g[g["kind"] == 1]
        new_val = pd.Series(upd["n_chars"].to_numpy(np.int64),
                            index=upd["doc_id"].to_numpy(np.int64))
        base = g[g["kind"] == 0]
        keep = ~base["doc_id"].isin(deleted)
        base = base[keep]
        did = base["doc_id"].to_numpy(np.int64)
        merged = pd.Series(did).map(new_val)
        out_n = np.where(merged.notna(),
                         merged.fillna(0).to_numpy(np.int64),
                         base["n_chars"].to_numpy(np.int64))
        return pd.DataFrame(
            {"doc_id": did, "lang": base["lang"].to_numpy(),
             "n_chars": out_n.astype(np.int64)}
        )

    return parts.groupby("kpart").map_groups(
        apply_partition, batch_format="pandas")


_UPSERT_SQL = """
WITH upd AS (
  SELECT doc_id, n_chars + 1000 AS n_chars FROM documents WHERE doc_id % 7 = 3
),
del AS (SELECT doc_id FROM documents WHERE doc_id % 13 = 5)
SELECT d.doc_id AS doc_id, d.lang AS lang,
       CAST(coalesce(u.n_chars, d.n_chars) AS BIGINT) AS n_chars
FROM documents d LEFT JOIN upd u USING (doc_id)
WHERE d.doc_id NOT IN (SELECT doc_id FROM del)
"""


def q_user_running_total(sf_dir: str):
    """Per-key ordered analytic (running spend per user over time) — the
    window-function shape (SUM ... OVER (PARTITION BY k ORDER BY t))
    expressed without any global sort: users are independent, so a
    user-hash cogroup colocates each user's events and the partition
    kernel does ONE lexsort + grouped cumulative sum for all its users
    at once. Exact integer cents; (ts, event_id) is a deterministic
    total order (event_id unique), mirrored by the SQL window's ROWS
    frame. Contrast with `seq_pack`, whose prefix sum crosses partition
    boundaries and needs the two-level scan; here the partition key IS
    the window key, so no sidecar pass exists."""
    ev = _events(sf_dir, columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        vc = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "vc": pa.array(vc, pa.int64()),
            }
        )

    parts = (
        ev.map_batches(prep, batch_format="pyarrow")
        .map_batches(add_kpart,
                     fn_kwargs={"num_parts": 32, "cols": ("user_id",)},
                     batch_format="pyarrow")
    )

    def scan_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        run = g.groupby("user_id", sort=False)["vc"].cumsum()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": g["user_id"].to_numpy(np.int64),
                "run_c": run.to_numpy(np.int64),
            }
        )

    return parts.groupby("kpart").map_groups(
        scan_partition, batch_format="pandas")


_RUNNING_TOTAL_SQL = """
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
)
SELECT event_id, user_id,
  CAST(sum(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_c
FROM v
"""


def q_value_zscore(sf_dir: str):
    """Per-group z-score standardization (the other classic fit+transform
    beside `value_norm`'s min-max): each event's value standardized
    within its event_type. Fit state = 3 exact integers per type
    (n, Σvc, Σvc²) folded from per-batch partials — merge-associative,
    so the fit is one bounded exchange at any scale; the transform pass
    re-reads the cents stream with the tiny (μ, σ) table captured by
    closure. μ/σ/z are computed in float64 with the IDENTICAL op order
    as the SQL oracle (mu = S/n; var = S2/n − mu·mu; z = (v−mu)/sqrt),
    exported fx4; σ = 0 (degenerate group) pins z to 0, mirrored."""
    ev = _events(sf_dir, columns=["event_id", "event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        vc = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "event_type": t["event_type"],
                         "vc": pa.array(vc, pa.int64())})

    cents = ev.map_batches(to_cents, batch_format="pyarrow")

    def moment_partial(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        pdf["vc2"] = pdf["vc"] * pdf["vc"]
        g = (pdf.groupby("event_type", sort=False)
             .agg(n=("vc", "size"), s=("vc", "sum"), s2=("vc2", "sum"))
             .reset_index())
        return from_pandas_clean(g, preserve_index=False)

    mom = (cents.map_batches(moment_partial, batch_format="pyarrow")
           .to_pandas()  # bounded: |types| rows per batch
           .groupby("event_type")
           .agg(n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum")))
    stats = {}
    for et, row in mom.iterrows():
        n = float(row["n"])
        mu = float(row["s"]) / n
        var = float(row["s2"]) / n - mu * mu
        stats[et] = (mu, np.sqrt(var) if var > 0 else 0.0)

    def transform(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        mu = pdf["event_type"].map({k: v[0] for k, v in stats.items()})
        sig = pdf["event_type"].map({k: v[1] for k, v in stats.items()})
        vc = pdf["vc"].to_numpy(np.float64)
        z = np.where(sig > 0, (vc - mu) / np.where(sig > 0, sig, 1.0), 0.0)
        zx = np.floor(z * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"event_id": pa.array(pdf["event_id"], pa.int64()),
                         "event_type": pa.array(pdf["event_type"]),
                         "z_x": pa.array(zx, pa.int64())})

    return cents.map_batches(transform, batch_format="pyarrow")


_VALUE_ZSCORE_SQL = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
m AS (SELECT event_type, count(*) AS n, sum(vc) AS s, sum(vc*vc) AS s2
      FROM v GROUP BY event_type),
f AS (SELECT event_type,
        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS var
      FROM m)
SELECT v.event_id AS event_id, v.event_type AS event_type,
  CASE WHEN f.var > 0
       THEN CAST(floor(((CAST(v.vc AS DOUBLE) - f.mu) / sqrt(f.var))
                       * 10000.0 + 0.5) AS BIGINT)
       ELSE 0 END AS z_x
FROM v JOIN f USING (event_type)
"""


NTILE_PCTS = (25, 50, 75)


def q_value_ntile(sf_dir: str):
    """Quantile feature bucketization (the fit+transform a gradient-boost
    /embedding-binning preprocessor needs): each event assigned its
    within-type quartile bucket 1–4. EXACT at any scale: the fit reuses
    the `group_percentiles` bounded-histogram plan (one row per distinct
    cents value per type), thresholds are the same ceil-rank integers,
    and the transform is pure integer comparisons — no float anywhere,
    so no tie ambiguity (bucket = 1 + Σ [vc > p_k], mirrored in SQL)."""
    ev = _events(sf_dir, columns=["event_id", "event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        vc = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "event_type": t["event_type"],
                         "vc": pa.array(vc, pa.int64())})

    cents = ev.map_batches(to_cents, batch_format="pyarrow")

    def hist_partial(t: pa.Table) -> pa.Table:
        pdf = (t.select(["event_type", "vc"]).to_pandas()
               .groupby(["event_type", "vc"], sort=False)
               .size().reset_index(name="n"))
        return from_pandas_clean(pdf, preserve_index=False)

    hist = (cents.map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["event_type", "vc"])
            .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
            .to_pandas())  # bounded: distinct (type, cents) rows
    cuts = {}
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("vc")
        cum = g["n"].to_numpy(np.int64).cumsum()
        vcv = g["vc"].to_numpy(np.int64)
        tot = int(cum[-1])
        cuts[et] = tuple(
            int(vcv[np.searchsorted(cum, (p * tot + 99) // 100, side="left")])
            for p in NTILE_PCTS
        )

    def transform(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        vc = pdf["vc"].to_numpy(np.int64)
        bucket = np.ones(len(vc), np.int64)
        for i in range(len(NTILE_PCTS)):
            th = pdf["event_type"].map(
                {k: v[i] for k, v in cuts.items()}).to_numpy(np.int64)
            bucket += (vc > th).astype(np.int64)
        return pa.table({"event_id": pa.array(pdf["event_id"], pa.int64()),
                         "event_type": pa.array(pdf["event_type"]),
                         "bucket": pa.array(bucket, pa.int64())})

    return cents.map_batches(transform, batch_format="pyarrow")


_NTILE_CUT_COLS = ",\n  ".join(
    f"min(vc) FILTER (WHERE cum >= ceil(({p} * tot) / 100.0)) AS p{p}"
    for p in NTILE_PCTS
)
_VALUE_NTILE_SQL = f"""
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
h AS (SELECT event_type, vc, count(*) AS n FROM v GROUP BY event_type, vc),
c AS (SELECT event_type, vc,
        sum(n) OVER (PARTITION BY event_type ORDER BY vc) AS cum,
        sum(n) OVER (PARTITION BY event_type) AS tot
      FROM h),
cuts AS (SELECT event_type, {_NTILE_CUT_COLS} FROM c GROUP BY event_type)
SELECT v.event_id AS event_id, v.event_type AS event_type,
  CAST(1 + CASE WHEN v.vc > cuts.p25 THEN 1 ELSE 0 END
         + CASE WHEN v.vc > cuts.p50 THEN 1 ELSE 0 END
         + CASE WHEN v.vc > cuts.p75 THEN 1 ELSE 0 END AS BIGINT) AS bucket
FROM v JOIN cuts USING (event_type)
"""


WINSOR_LO, WINSOR_HI = 5, 95


def q_winsorized_mean(sf_dir: str):
    """Robust per-group mean with winsorization (the data-quality
    aggregate that survives sensor spikes / bot outliers): each event
    value is clipped to its type's exact [p5, p95] ceil-rank thresholds
    (same bounded-histogram fit as group_percentiles — state is one row
    per distinct cents value, never per event) and the clipped mean is
    reported. n and the clipped sum are exact integers; the mean is fx4
    with SQL-mirrored float op order. Two bounded exchanges total."""
    cents = _events(sf_dir, columns=["event_type", "value"]).map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "vc": pa.array(
                    np.floor(
                        t["value"].to_numpy(zero_copy_only=False) * 100.0
                        + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        pdf = (t.to_pandas().groupby(["event_type", "vc"], sort=False)
               .size().reset_index(name="n"))
        return from_pandas_clean(pdf, preserve_index=False)

    hist = (cents.map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["event_type", "vc"])
            .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
            .to_pandas())  # bounded: distinct (type, cents) rows
    cuts = {}
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("vc")
        cum = g["n"].to_numpy(np.int64).cumsum()
        vcv = g["vc"].to_numpy(np.int64)
        tot = int(cum[-1])
        lo = int(vcv[np.searchsorted(cum, (WINSOR_LO * tot + 99) // 100,
                                     side="left")])
        hi = int(vcv[np.searchsorted(cum, (WINSOR_HI * tot + 99) // 100,
                                     side="left")])
        cuts[et] = (lo, hi)

    def clip_partial(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        lo = pdf["event_type"].map({k: v[0] for k, v in cuts.items()}
                                   ).to_numpy(np.int64)
        hi = pdf["event_type"].map({k: v[1] for k, v in cuts.items()}
                                   ).to_numpy(np.int64)
        w = np.clip(pdf["vc"].to_numpy(np.int64), lo, hi)
        g = (pd.DataFrame({"event_type": pdf["event_type"], "w": w})
             .groupby("event_type", sort=False)["w"]
             .agg(n="size", wins_sum_c="sum").reset_index())
        return from_pandas_clean(g, preserve_index=False)

    agg = (cents.map_batches(clip_partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(ray.data.aggregate.Sum("n", alias_name="n"),
                      ray.data.aggregate.Sum("wins_sum_c",
                                             alias_name="wins_sum_c")))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["wins_sum_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        mx = np.floor((s / n) * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": pc.cast(t["n"], pa.int64()),
                "wins_sum_c": pc.cast(t["wins_sum_c"], pa.int64()),
                "wins_mean_x": pa.array(mx, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_WINSOR_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
h AS (SELECT event_type, vc, count(*) AS n FROM v GROUP BY event_type, vc),
c AS (SELECT event_type, vc,
        sum(n) OVER (PARTITION BY event_type ORDER BY vc) AS cum,
        sum(n) OVER (PARTITION BY event_type) AS tot
      FROM h),
cuts AS (SELECT event_type,
    min(vc) FILTER (WHERE cum >= ceil(({WINSOR_LO} * tot) / 100.0)) AS lo,
    min(vc) FILTER (WHERE cum >= ceil(({WINSOR_HI} * tot) / 100.0)) AS hi
  FROM c GROUP BY event_type),
w AS (SELECT v.event_type,
        CASE WHEN v.vc < cuts.lo THEN cuts.lo
             WHEN v.vc > cuts.hi THEN cuts.hi ELSE v.vc END AS wv
      FROM v JOIN cuts USING (event_type))
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(wv) AS BIGINT) AS wins_sum_c,
  CAST(floor((CAST(sum(wv) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             * 10000.0 + 0.5) AS BIGINT) AS wins_mean_x
FROM w GROUP BY event_type
"""


BLOOM_BITS = 1 << 20  # 128 KiB bit array — broadcastable at any scale
BLOOM_K = 4


def _bloom_hashes(keys: np.ndarray) -> np.ndarray:
    """BLOOM_K bit positions per key via splitmix64 double hashing
    (deterministic, no Python loop): h_i = h1 + i*h2 mod BLOOM_BITS."""
    x = keys.astype(np.uint64)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    h1 = x
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    h2 = x | np.uint64(1)
    ks = np.arange(BLOOM_K, dtype=np.uint64)[:, None]
    return ((h1[None, :] + ks * h2[None, :])
            % np.uint64(BLOOM_BITS)).astype(np.int64)


def q_bloom_semijoin(sf_dir: str):
    """Bloom-prefiltered exact semi-join — revenue cents per returnflag
    over lineitem rows whose order is URGENT. The 100-TB pattern: the
    build side's keys fold into a fixed 128 KiB Bloom bit-array (per-
    batch partial bitmaps OR-merged on the driver — merge-associative,
    size independent of key count), the probe side drops non-matching
    rows AT THE SCAN for the cost of a broadcast no bigger than a block,
    and only the surviving ~FP-rate fraction pays the exact key-hash
    cogroup that removes Bloom false positives. Result is EXACT (the
    verify stage ships per-batch-distinct probe keys like rel_antijoin);
    the SQL oracle is the plain semi-join. Exchange = survivors +
    distinct build keys, vs the full probe table for a naive plan."""
    orders = _tbl(sf_dir, "orders",
                  columns=["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(
            pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))
        ).select(["o_orderkey"]),
        batch_format="pyarrow",
    )

    def bloom_partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(BLOOM_BITS, np.bool_)
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys):
            bits[_bloom_hashes(keys).ravel()] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          pa.binary())})

    packed = orders.map_batches(bloom_partial, batch_format="pyarrow")
    bloom = np.zeros(BLOOM_BITS // 8, np.uint8)
    for row in packed.take_all():  # bounded: one 128 KiB row per batch
        bloom |= np.frombuffer(row["bits"], np.uint8)
    bloom_bits = np.unpackbits(bloom).astype(np.bool_)

    def prefilter(t: pa.Table) -> pa.Table:
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(keys):
            return t
        hit = bloom_bits[_bloom_hashes(keys)].all(axis=0)
        return t.filter(pa.array(hit))

    li = _tbl(sf_dir, "lineitem",
              columns=["l_orderkey", "l_extendedprice", "l_returnflag"]
              ).map_batches(prefilter, batch_format="pyarrow")

    # exact verify: cogroup survivors with per-batch-distinct build keys
    def li_rows(t: pa.Table) -> pa.Table:
        pc_ = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "kind": pa.array(np.zeros(len(t), np.int8)),
                "key": pc.cast(t["l_orderkey"], pa.int64()),
                "flag": t["l_returnflag"],
                "price_c": pa.array(pc_, pa.int64()),
            }
        )

    def key_rows(t: pa.Table) -> pa.Table:
        k = np.unique(
            t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        n = len(k)
        return pa.table(
            {
                "kind": pa.array(np.ones(n, np.int8)),
                "key": pa.array(k, pa.int64()),
                "flag": pa.array([""] * n, pa.string()),
                "price_c": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    both = (li.map_batches(li_rows, batch_format="pyarrow")
            .union(orders.map_batches(key_rows, batch_format="pyarrow"))
            .map_batches(add_kpart,
                         fn_kwargs={"num_parts": 32, "cols": ("key",)},
                         batch_format="pyarrow"))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        good = set(g.loc[g["kind"] == 1, "key"].to_numpy(np.int64))
        f = g[g["kind"] == 0]
        f = f[f["key"].isin(good)]
        if f.empty:
            return pd.DataFrame({"l_returnflag": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64),
                                 "revenue_c": pd.Series([], dtype=np.int64)})
        out = (f.groupby("flag", sort=False)["price_c"]
               .agg(n="size", revenue_c="sum").reset_index()
               .rename(columns={"flag": "l_returnflag"}))
        out["n"] = out["n"].astype(np.int64)
        out["revenue_c"] = out["revenue_c"].astype(np.int64)
        return out

    return (_arrow_blocks(both.groupby("kpart")
                          .map_groups(verify, batch_format="pandas"))
            .groupby("l_returnflag")
            .aggregate(ray.data.aggregate.Sum("n", alias_name="n"),
                       ray.data.aggregate.Sum("revenue_c",
                                              alias_name="revenue_c")))


_BLOOM_SEMIJOIN_SQL = """
SELECT l.l_returnflag AS l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_c
FROM lineitem l
WHERE l.l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l.l_returnflag
"""


def q_rel_broadcast_join(sf_dir: str):
    """Map-side broadcast join — the third canonical join strategy
    beside the key-hash cogroup (rel_join_top) and the salted cogroup
    (rel_skew_join): when one side fits in worker memory, ship it ONCE
    via ``ray.put`` and join inside ``map_batches`` with ZERO shuffle of
    the big side. Per (mktsegment, event_type): event count and exact
    cents total. The dim payload is a dense custkey→segment-code int8
    array + code table (|customers| bytes, not a Python dict per batch);
    each fact batch folds integer partials, so the only exchange is
    ≤ batches × (segments × types) partial rows. The plan is the right
    one whenever |dim| ≪ cluster worker heap — document the flip point
    to rel_skew_join when it is not."""
    import pyarrow.parquet as _pq

    cust = _pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    keys = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    segs = np.asarray(cust["c_mktsegment"].to_pylist(), object)
    seg_names = sorted(set(segs.tolist()))
    code_of = {s: i for i, s in enumerate(seg_names)}
    lut = np.full(int(keys.max()) + 1, -1, np.int8)
    lut[keys] = np.array([code_of[s] for s in segs], np.int8)
    lut_ref = ray.put(lut)  # broadcast once; workers map the same buffer

    ev = _events(sf_dir, columns=["user_id", "event_type", "value"])

    class JoinFold:
        def __init__(self):  # once per actor: fetch the shared LUT
            self.lut = ray.get(lut_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            ok = u < len(self.lut)
            code = np.where(ok, self.lut[np.minimum(u, len(self.lut) - 1)],
                            -1)
            keep = code >= 0
            vc = np.floor(
                t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            pdf = pd.DataFrame(
                {
                    "seg_code": code[keep],
                    "event_type": np.asarray(t["event_type"].to_pylist(),
                                             object)[keep],
                    "vc": vc[keep],
                }
            )
            g = (pdf.groupby(["seg_code", "event_type"], sort=False)["vc"]
                 .agg(n="size", value_c="sum").reset_index())
            g["n"] = g["n"].astype(np.int64)
            g["value_c"] = g["value_c"].astype(np.int64)
            return from_pandas_clean(g, preserve_index=False)

    agg = (ev.map_batches(JoinFold, batch_format="pyarrow",
                          concurrency=default_pool())
           .groupby(["seg_code", "event_type"])
           .aggregate(ray.data.aggregate.Sum("n", alias_name="n"),
                      ray.data.aggregate.Sum("value_c",
                                             alias_name="value_c")))

    names = pa.array(seg_names, pa.string())

    def finish(t: pa.Table) -> pa.Table:
        codes = t["seg_code"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c_mktsegment": pc.take(names, pa.array(codes, pa.int64())),
                "event_type": t["event_type"],
                "n": pc.cast(t["n"], pa.int64()),
                "value_c": pc.cast(t["value_c"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_BROADCAST_JOIN_SQL = """
SELECT c.c_mktsegment AS c_mktsegment, e.event_type AS event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_c
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
"""


# ------------------------------------------- RAG / pretraining chunking

# token-window chunking: window tokens per chunk, stride tokens between
# chunk starts (overlap = window - stride). Starts run 0, S, 2S, … while
# start < n, so every chunk contributes at least one new token and the
# tail chunk may be short. Mirrored literally in _CHUNK_SQL.
CHUNK_WINDOW = 8
CHUNK_STRIDE = 6


def _chunk_batch(t: pa.Table, window: int = CHUNK_WINDOW,
                 stride: int = CHUNK_STRIDE) -> pa.Table:
    """Vectorized token-window chunker: the simple-tokenizer Arrow kernels
    (same as TokenizeStage._simple) produce flat token values + list
    offsets; chunk rows are then pure offsets math — np.repeat/arange for
    (parent doc, chunk_idx, start), one gather ``take`` for the chunk
    token stream, and ``binary_join`` to rebuild chunk strings. No
    per-doc Python loop. Overlapping windows cannot share one ListArray
    (offsets must be disjoint), hence the explicit gather index."""
    toks, dl = _simple_token_lists(t)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values
    start0 = offsets[0]
    if start0 != 0 or len(values) != offsets[-1]:
        # flatten() semantics for a sliced array (positional.py pattern)
        values = values.slice(start0, offsets[-1] - start0)
        offsets = offsets - start0
    n = dl.to_numpy(zero_copy_only=False)  # [""] sentinel → 0
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

    keep = n > 0
    kn = n[keep]
    koff = offsets[:-1][keep]
    kdoc = doc_ids[keep]
    n_chunks = (kn + stride - 1) // stride
    total_c = int(n_chunks.sum())
    schema = pa.schema(
        [("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
         ("n_tokens", pa.int64()), ("chunk", pa.string())]
    )
    if total_c == 0:
        return schema.empty_table()
    parent = np.repeat(np.arange(len(kn), dtype=np.int64), n_chunks)
    coff = np.concatenate(([0], np.cumsum(n_chunks)))
    ci = np.arange(total_c, dtype=np.int64) - np.repeat(coff[:-1], n_chunks)
    starts = ci * stride
    clen = np.minimum(window, kn[parent] - starts)
    flat_start = koff[parent] + starts
    out_off = np.concatenate(([0], np.cumsum(clen)))
    gather = (
        np.arange(out_off[-1], dtype=np.int64)
        - np.repeat(out_off[:-1], clen)
        + np.repeat(flat_start, clen)
    )
    gathered = values.take(pa.array(gather, pa.int64()))
    lists = pa.LargeListArray.from_arrays(
        pa.array(out_off, pa.int64()), gathered
    )
    return pa.table(
        {
            "doc_id": pa.array(kdoc[parent], pa.int64()),
            "chunk_idx": pa.array(ci, pa.int64()),
            "n_tokens": pa.array(clen.astype(np.int64), pa.int64()),
            "chunk": pc.binary_join(lists, " "),
        }
    )


def q_chunk_text(sf_dir: str):
    """RAG / pretraining document chunking: overlapping CHUNK_WINDOW-token
    windows at CHUNK_STRIDE starts over the simple-tokenized text. A pure
    1→many map — column-pruned scan, zero shuffles, all-Arrow kernels.
    Reference analog: none (training-data extension; the op every
    retrieval-augmented pipeline runs before embedding)."""
    return _docs(sf_dir).map_batches(_chunk_batch, batch_format="pyarrow")


def q_chunk_dedup(sf_dir: str):
    """Cross-document repeated-passage mining over the q_chunk_text
    windows (the C4/RefinedWeb-style passage-duplication audit): chunks
    are md5-keyed; per input batch the (hash, doc_id) partial counts are
    already COMPLETE (a document's chunks never span batches), so the
    only exchange is a hash-keyed groupby of 3 compact columns; n_docs is
    a plain row Count because the partials make (hash, doc_id) unique.
    Emits hashes occurring more than once."""
    from ..functions.hashing import md5_hex

    def partial(t: pa.Table) -> pa.Table:
        c = _chunk_batch(t)
        df = pd.DataFrame(
            {
                "chunk_md5": [md5_hex(s) for s in c["chunk"].to_pylist()],
                "doc_id": c["doc_id"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["chunk_md5", "doc_id"], sort=False).size()
        out = g.rename("cnt").reset_index()
        return pa.table(
            {
                "chunk_md5": pa.array(out["chunk_md5"], pa.string()),
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "cnt": pa.array(out["cnt"].to_numpy().astype(np.int64)),
            }
        )

    agg = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("chunk_md5")
        .aggregate(
            ray.data.aggregate.Sum("cnt", alias_name="n_occ"),
            ray.data.aggregate.Count(alias_name="n_docs"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        m = pc.greater(pc.cast(t["n_occ"], pa.int64()), 1)
        t = t.filter(m)
        return pa.table(
            {
                "chunk_md5": t["chunk_md5"],
                "n_occ": pc.cast(t["n_occ"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_CHUNK_CTE = f"""t AS (
  SELECT doc_id, {TOKLIST.format(col="text")} AS toks FROM documents
), c AS (
  SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
), e AS (
  SELECT doc_id, toks, n,
         unnest(range((n + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE})) AS ci
  FROM c
), chunks AS (
  SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
         CAST(least({CHUNK_WINDOW}, n - ci*{CHUNK_STRIDE}) AS BIGINT)
           AS n_tokens,
         array_to_string(
           toks[CAST(ci*{CHUNK_STRIDE}+1 AS BIGINT):
                CAST(least(ci*{CHUNK_STRIDE}+{CHUNK_WINDOW}, n) AS BIGINT)],
           ' ') AS chunk
  FROM e
)"""

_CHUNK_TEXT_SQL = f"WITH {_CHUNK_CTE} SELECT * FROM chunks"

_OOV_RATE_SQL = f"""
WITH {_TOK_CTE}, {_DL_CTE},
vsum AS (SELECT term, sum(tf) AS total_tf FROM tok GROUP BY term),
vocab AS (
  SELECT term FROM vsum ORDER BY total_tf DESC, term ASC LIMIT {OOV_VOCAB_K}
),
inv AS (
  SELECT t.doc_id, sum(t.tf) AS in_vocab
  FROM tok t JOIN vocab v ON v.term = t.term GROUP BY t.doc_id
)
SELECT d.doc_id, CAST(d.dl AS BIGINT) AS n_tokens,
       {_fx('CAST(d.dl - coalesce(i.in_vocab, 0) AS DOUBLE) / d.dl')} AS oov_x
FROM dl d LEFT JOIN inv i ON i.doc_id = d.doc_id
WHERE d.dl > 0
"""

_CHUNK_DEDUP_SQL = f"""
WITH {_CHUNK_CTE}
SELECT md5(chunk) AS chunk_md5, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM chunks GROUP BY md5(chunk) HAVING count(*) > 1
"""


# ---------------------------------------------------- round-3g operators

# filtered vector search: corpus side restricted to an allowed metadata
# label set (production vector stores call this pre-filtering)
ANN_FILTER_LABELS = (0, 2, 4, 6, 8)


def q_ann_filtered(sf_dir: str):
    """Metadata-filtered ANN top-k: ann_topk restricted to corpus vectors
    whose ``label`` is in ANN_FILTER_LABELS — the pre-filter semantics of
    filtered vector search (the reference's FAISS path,
    faiss_based_ANN_Implementation.py:114-149, has no filter; this is the
    training-data extension every production store needs).

    Scale plan: the predicate is ONE vectorized Arrow ``is_in`` kernel
    BEFORE the matmul, so selectivity cuts compute and candidate rows
    proportionally; everything downstream is the proven ann_topk shape
    (broadcast query matrix via ray.put, per-batch partial top-(k+margin),
    merge moves O(batches·k)). Query vectors come from the UNfiltered
    table — a query's own label never gates its search."""
    emb = _emb(sf_dir, columns=["vec_id", "embedding", "label"])
    qid_arr = pa.array(list(ANN_QUERY_IDS), pa.int64())
    qrows = {
        r["vec_id"]: r["embedding"]
        for r in emb.map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qid_arr)),
            batch_format="pyarrow",
        ).take_all()
    }
    qids = sorted(qrows)
    qmat = np.array([qrows[q] for q in qids], dtype=np.float64)
    ref = ray.put((qids, qmat))
    lab_arr = pa.array(list(ANN_FILTER_LABELS), pa.int64())
    filtered = emb.map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t["label"], pa.int64()), value_set=lab_arr)
        ),
        batch_format="pyarrow",
    )
    partial = filtered.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": 10},
        batch_format="pyarrow",
        concurrency=default_pool(),
    )
    return partial.groupby("query_vec").map_groups(final_topk, batch_format="pandas")


# co-visitation: which event types count as a "visit", the deterministic
# per-user item cap (smallest-item prefix — mirrored in SQL), and the
# minimum-support filter on emitted pairs
COVISIT_TYPES = ("click", "view")
COVISIT_MAX_ITEMS = 32
COVISIT_MIN_USERS = 2


def _covisit_partition(group: pd.DataFrame) -> pd.DataFrame:
    """user_id-hash partition of (user_id, item) rows → unordered item
    pairs, one row per (user, pair). Distinct-per-user is exact here
    because the hash cogroup colocates ALL of a user's rows; the item cap
    keeps a degenerate user's fan-out at C(cap, 2). Pair generation is
    the vectorized `grouped_pairs` kernel — one triu gather per distinct
    group size, no per-user Python loop."""
    from ..stages.dedup import grouped_pairs

    a, b = grouped_pairs(
        group["user_id"].to_numpy(np.int64),
        group["item"].to_numpy(np.int64),
        COVISIT_MAX_ITEMS,
        oversize="truncate",
    )
    return pd.DataFrame({"a": a, "b": b})


def q_item_ctr(sf_dir: str):
    """Per-item click-through report — the serving-quality dashboard of a
    search/recsys deployment: views, clicks, and the CTR fx4 per item
    (item = the FIRST digit run in props, the covisit convention;
    digitless rows dropped, mirrored in SQL). Items with zero views are
    excluded (no denominator).

    Scale plan: batches pre-collapse to (item, views, clicks) partial
    counts, so the single item-keyed groupby moves |items|-bounded rows
    per block; the fx ratio is an exact integer floor division."""
    ev = _events(sf_dir, columns=["event_type", "props"])
    types = pa.array(["view", "click"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=types))
        item = pc.cast(
            pc.struct_field(
                pc.extract_regex(pc.cast(t["props"], pa.string()),
                                 r"(?P<k>[0-9]+)"),
                "k",
            ),
            pa.int64(),
        )
        out = pa.table({
            "item": item,
            "event_type": pc.cast(t["event_type"], pa.string()),
        }).filter(pc.is_valid(item))
        pdf = out.to_pandas()
        g = (
            pdf.assign(
                views=(pdf["event_type"] == "view").astype(np.int64),
                clicks=(pdf["event_type"] == "click").astype(np.int64),
            )
            .groupby("item", sort=False)[["views", "clicks"]]
            .sum()
            .reset_index()
        )
        return from_pandas_clean(g)

    agg = ev.map_batches(prep, batch_format="pyarrow").groupby("item").aggregate(
        ray.data.aggregate.Sum("views", alias_name="n_view"),
        ray.data.aggregate.Sum("clicks", alias_name="n_click"),
    )

    def finish(t: pa.Table) -> pa.Table:
        nv = t["n_view"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = t["n_click"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nv > 0
        return pa.table({
            "item": pc.cast(t["item"], pa.int64()).filter(pa.array(keep)),
            "n_view": pa.array(nv[keep], pa.int64()),
            "n_click": pa.array(nc[keep], pa.int64()),
            "ctr_x": pa.array((10_000 * nc[keep]) // nv[keep], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


_ITEM_CTR_SQL = """
WITH e AS (
  SELECT CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS item,
         event_type
  FROM events
  WHERE event_type IN ('view', 'click')
    AND regexp_extract(props, '([0-9]+)', 1) <> ''
),
a AS (
  SELECT item,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click
  FROM e GROUP BY item
)
SELECT item, CAST(n_view AS BIGINT) AS n_view,
       CAST(n_click AS BIGINT) AS n_click,
       CAST((10000 * n_click) // n_view AS BIGINT) AS ctr_x
FROM a WHERE n_view > 0
"""


def q_covisit(sf_dir: str):
    """Item-item co-visitation counts — the classic recommendation
    co-occurrence matrix over a web event log: for every unordered item
    pair, how many distinct users interacted with BOTH (click/view
    events; item = the FIRST digit run anywhere in the props string — a
    deliberately cheap extraction, mirrored in SQL; rows whose props
    contain no digits are dropped).

    Scale plan: ONE user_id-hash exchange colocates each user's rows;
    per-user distinct + the COVISIT_MAX_ITEMS smallest-item cap bound the
    pair fan-out at C(cap, 2) per user (a crawler hitting every item
    cannot quadratically blow up the exchange — the cap is deterministic
    and mirrored in SQL); the final (a, b) count groupby moves pair rows
    only. Same shape as related_docs, keyed by user instead of term."""
    ev = _events(sf_dir, columns=["user_id", "event_type", "props"])
    types = pa.array(list(COVISIT_TYPES))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=types))
        item = pc.cast(
            pc.struct_field(
                pc.extract_regex(pc.cast(t["props"], pa.string()),
                                 r"(?P<k>[0-9]+)"),
                "k",
            ),
            pa.int64(),
        )
        out = pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                        "item": item})
        # props without any digit run extract to null — drop them
        # (mirrored by WHERE item IS NOT NULL in the oracle)
        return out.filter(pc.is_valid(out["item"]))

    rows = ev.map_batches(prep, batch_format="pyarrow")
    pairs = _arrow_blocks(
        _parted(rows, ("user_id",)).map_groups(
            _covisit_partition, batch_format="pandas"
        )
    )
    agg = pairs.groupby(["a", "b"]).count()

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["a", "b", "n_users"])
        t = t.set_column(2, "n_users", pc.cast(t["n_users"], pa.int64()))
        return t.filter(
            pc.greater_equal(t["n_users"], pa.scalar(COVISIT_MIN_USERS))
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_COVISIT_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS item
  FROM events WHERE event_type IN {COVISIT_TYPES}
    AND regexp_matches(props, '[0-9]')
),
ui AS (SELECT DISTINCT user_id, item FROM ev WHERE item IS NOT NULL),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
    FROM ui
  ) WHERE rn <= {COVISIT_MAX_ITEMS}
),
p AS (
  SELECT x.item AS a, y.item AS b, count(*) AS n_users
  FROM capped x JOIN capped y
    ON y.user_id = x.user_id AND y.item > x.item
  GROUP BY x.item, y.item
)
SELECT a, b, CAST(n_users AS BIGINT) AS n_users
FROM p WHERE n_users >= {COVISIT_MIN_USERS}
"""


# extractive summary: top sentences per doc by summed fx4 term idf
SUMMARY_TOPK = 2


def _idf_join_partition(group: pd.DataFrame) -> pd.DataFrame:
    """(lang, term)-hash partition of sentence-term rows (kind 0) ∪ idf
    rows (kind 1) → (doc_id, sent_idx, idf_x) contributions. Inner-join
    semantics: a term outside the corpus vocabulary contributes nothing
    (impossible here — sentence terms come FROM corpus docs — but the
    join shape is what scales)."""
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "sent_idx": pd.Series(dtype="int64"),
                          "idf_x": pd.Series(dtype="int64")})
    s = group[group["kind"] == 0]
    i = group[group["kind"] == 1]
    if s.empty or i.empty:
        return empty
    m = s[["lang", "term", "doc_id", "sent_idx"]].merge(
        i[["lang", "term", "idf_x"]], on=["lang", "term"]
    )
    if m.empty:
        return empty
    return m[["doc_id", "sent_idx", "idf_x"]].astype(
        {"doc_id": "int64", "sent_idx": "int64", "idf_x": "int64"}
    )


def _summary_top_partition(group: pd.DataFrame) -> pd.DataFrame:
    """doc_id-hash partition of per-sentence scores → per-doc top
    SUMMARY_TOPK by (score_x desc, sent_idx asc), fully vectorized
    (sort + cumcount, no per-doc loop)."""
    g = group.sort_values(["doc_id", "score_x", "sent_idx"],
                          ascending=[True, False, True])
    r = g.groupby("doc_id", sort=False).cumcount().to_numpy() + 1
    g = g.assign(rank=r)[r <= SUMMARY_TOPK]
    return g[["doc_id", "rank", "sent_idx", "score_x"]].astype(
        {"doc_id": "int64", "rank": "int64", "sent_idx": "int64",
         "score_x": "int64"}
    )


def q_extract_summary(sf_dir: str):
    """Extractive document summarization: the SUMMARY_TOPK sentences per
    doc with the highest summed term idf over the sentence's UNIQUE
    in-vocabulary terms — the classic TF-IDF extractive summarizer
    (Luhn-style), run corpus-wide. Scores are integer sums of the fx4
    per-term idf_x, so cross-engine parity is exact (no float summation
    order anywhere).

    Scale plan: sentence split + per-sentence term dedup are vectorized
    per batch (a sentence lives in one row); the idf lookup is a
    (lang, term)-hash cogroup join against the Heaps-law-sized idf table
    (NOT a broadcast — vocab at 10^12 docs is 10^8-10^9 terms); the
    score sum is one (doc, sent) groupby of contribution rows; the final
    per-doc top-k reuses the doc-hash partition + vectorized cumcount
    kernel. Three exchanges total, each data-minimal."""
    docs = _docs(sf_dir)

    def sent_terms(t: pa.Table) -> pa.Table:
        sel, sidx, sents = _vector_split_sentences(t)
        sel_arr = pa.array(sel)
        doc_ids = pc.take(t["doc_id"], sel_arr).to_numpy(zero_copy_only=False)
        langs = pc.take(t["lang"], sel_arr)
        # SQL-mirrored simple tokenization of each sentence
        low = pc.utf8_lower(sents)
        spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        trimmed = pc.utf8_trim_whitespace(spaced)
        toks = pc.split_pattern(trimmed, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        flat = toks.flatten()
        n_per = np.diff(offsets)
        parent = np.repeat(np.arange(len(sents), dtype=np.int64), n_per)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = parent[keep]
        terms = flat.filter(pa.array(keep))
        pdf = pd.DataFrame(
            {
                "doc_id": doc_ids[parent].astype(np.int64),
                "sent_idx": sidx[parent].astype(np.int64),
                "lang": np.asarray(langs.to_pandas(), dtype=object)[parent],
                "term": np.asarray(terms.to_pandas(), dtype=object),
            }
        ).drop_duplicates()           # unique terms per sentence (exact:
        pdf["kind"] = np.int8(0)      # a sentence lives in ONE batch row)
        pdf["idf_x"] = np.int64(0)
        return from_pandas_clean(pdf, preserve_index=False)

    sent_rows = docs.map_batches(sent_terms, batch_format="pyarrow")

    def idf_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "doc_id": pa.array(np.zeros(n, np.int64)),
                "sent_idx": pa.array(np.zeros(n, np.int64)),
                "lang": t["lang"],
                "term": t["term"],
                "kind": pa.array(np.ones(n, np.int8)),
                "idf_x": pc.cast(t["idf_x"], pa.int64()),
            }
        )

    idf = q_term_idf(sf_dir).map_batches(idf_rows, batch_format="pyarrow")
    contrib = _arrow_blocks(
        _parted(sent_rows.union(idf), ("lang", "term")).map_groups(
            _idf_join_partition, batch_format="pandas"
        )
    )
    scores = (
        contrib.groupby(["doc_id", "sent_idx"])
        .aggregate(ray.data.aggregate.Sum("idf_x", alias_name="score_x"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("score_x"),
                "score_x",
                pc.cast(t["score_x"], pa.int64()),
            ),
            batch_format="pyarrow",
        )
    )
    return _parted(scores, ("doc_id",)).map_groups(
        _summary_top_partition, batch_format="pandas"
    )


_EXTRACT_SUMMARY_SQL = f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
idf AS (
  SELECT df.lang, df.term,
         {_fx('ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))')} AS idf_x
  FROM df JOIN stats s ON s.lang = df.lang
),
sp AS (SELECT doc_id, lang, string_split(text, '.') AS parts FROM documents),
us AS (SELECT doc_id, lang, unnest(parts) AS sent,
              unnest(range(0, len(parts))) AS sent_idx FROM sp),
sent AS (
  SELECT doc_id, lang, CAST(sent_idx AS BIGINT) AS sent_idx,
         trim(sent) AS sentence
  FROM us WHERE trim(sent) <> ''
),
st AS (
  SELECT DISTINCT doc_id, lang, sent_idx, term FROM (
    SELECT doc_id, lang, sent_idx,
           unnest({TOKLIST.format(col="sentence")}) AS term
    FROM sent
  )
),
sc AS (
  SELECT st.doc_id AS doc_id, st.sent_idx AS sent_idx,
         CAST(sum(i.idf_x) AS BIGINT) AS score_x
  FROM st JOIN idf i ON i.lang = st.lang AND i.term = st.term
  GROUP BY st.doc_id, st.sent_idx
),
r AS (
  SELECT doc_id, sent_idx, score_x,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_x DESC, sent_idx ASC) AS rank
  FROM sc
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, sent_idx, score_x
FROM r WHERE rank <= {SUMMARY_TOPK}
"""


# vocabulary drift between two corpus snapshots (doc_id parity split):
# per-term G² log-likelihood ratio, top DRIFT_TOPK by (g2_x desc, term)
DRIFT_TOPK = 50
DRIFT_MIN_TOTAL = 5


def q_vocab_drift(sf_dir: str):
    """Term-distribution drift report between two corpus snapshots (half
    A = even doc_id, half B = odd — the deterministic stand-in for
    crawl-N vs crawl-N+1): per term the Dunning G² log-likelihood ratio
    of its occurrence counts against the halves' totals, top DRIFT_TOPK
    terms. The standard corpus-QA op that catches a scraper change or a
    spam flood between snapshots.

    Scale plan: per-batch partial (term, cnt_a, cnt_b) rows → ONE
    vocab-keyed groupby (Heaps-law-sized, 4-5 orders below the token
    stream); the two grand totals are a driver-side aggregate of that
    vocab table (two integers); G² is then a vectorized map over the
    vocab rows with the totals in the closure, and the top-k is
    per-block partial top-DRIFT_TOPK → one result-sized merge. All
    counts are exact integers; G² itself is a per-term scalar expression
    with an identical op shape in SQL, so fx4 parity is exact."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=_sized_blocks(f"{sf_dir}/documents.parquet", 5_000),
    )

    def partial(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        low = pc.utf8_lower(pc.cast(t["text"], pa.string()))
        spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        trimmed = pc.utf8_trim_whitespace(spaced)
        toks = pc.split_pattern(trimmed, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        flat = toks.flatten()
        n_per = np.diff(offsets)
        parent = np.repeat(np.arange(len(t), dtype=np.int64), n_per)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = parent[keep]
        halves = (doc_ids[parent] % 2).astype(np.int64)
        pdf = pd.DataFrame(
            {
                "term": np.asarray(flat.filter(pa.array(keep)).to_pandas(),
                                   dtype=object),
                "cnt_a": np.where(halves == 0, 1, 0).astype(np.int64),
                "cnt_b": np.where(halves == 1, 1, 0).astype(np.int64),
            }
        )
        g = pdf.groupby("term", sort=False)[["cnt_a", "cnt_b"]].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    # vocab-sized (Heaps' law) — materializing it is the small-side
    # exception, and it is consumed twice (totals + the G² map)
    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            ray.data.aggregate.Sum("cnt_a", alias_name="cnt_a"),
            ray.data.aggregate.Sum("cnt_b", alias_name="cnt_b"),
        )
        .materialize()
    )
    tot = agg.aggregate(
        ray.data.aggregate.Sum("cnt_a", alias_name="na"),
        ray.data.aggregate.Sum("cnt_b", alias_name="nb"),
    )
    na, nb = int(tot["na"]), int(tot["nb"])

    def g2_batch(t: pa.Table) -> pa.Table:
        a = pc.cast(t["cnt_a"], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t["cnt_b"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = (a + b) >= DRIFT_MIN_TOTAL
        a, b = a[keep], b[keep]
        terms = t["term"].filter(pa.array(keep))
        n = na + nb
        # expected-ratio form: ra = a·(Na+Nb) / ((a+b)·Na) — the exact
        # integer products go to float64 only at the division, the same
        # op order as the SQL expression
        ra = (a * n).astype(np.float64) / ((a + b) * na).astype(np.float64)
        rb = (b * n).astype(np.float64) / ((a + b) * nb).astype(np.float64)
        ta = np.where(a > 0, a * np.log(np.where(a > 0, ra, 1.0)), 0.0)
        tb = np.where(b > 0, b * np.log(np.where(b > 0, rb, 1.0)), 0.0)
        g2 = 2.0 * (ta + tb)
        g2_x = np.floor(g2 * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "term": terms,
                "cnt_a": pa.array(a, pa.int64()),
                "cnt_b": pa.array(b, pa.int64()),
                "g2_x": pa.array(g2_x, pa.int64()),
            }
        )

    def partial_top(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        return from_pandas_clean(
            pdf.sort_values(["g2_x", "term"], ascending=[False, True])
            .head(DRIFT_TOPK),
            preserve_index=False,
        )

    scored = agg.map_batches(g2_batch, batch_format="pyarrow").map_batches(
        partial_top, batch_format="pyarrow"
    )
    top = (
        scored.to_pandas()
        .sort_values(["g2_x", "term"], ascending=[False, True])
        .head(DRIFT_TOPK)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "term", "cnt_a", "cnt_b", "g2_x"]].astype(
        {"rank": "int64", "term": "object", "cnt_a": "int64",
         "cnt_b": "int64", "g2_x": "int64"}
    )


_VOCAB_DRIFT_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest({TOKLIST.format(col="text")}) AS term FROM documents
),
c AS (
  SELECT term,
         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_a,
         CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_b
  FROM t GROUP BY term
),
tot AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS na,
               CAST(sum(cnt_b) AS BIGINT) AS nb FROM c),
g AS (
  SELECT c.term, c.cnt_a, c.cnt_b,
         {_fx('''2.0 * (
           (CASE WHEN c.cnt_a = 0 THEN 0.0
                 ELSE c.cnt_a * ln(CAST(c.cnt_a*(tot.na+tot.nb) AS DOUBLE)
                                   / CAST((c.cnt_a+c.cnt_b)*tot.na AS DOUBLE))
            END)
           + (CASE WHEN c.cnt_b = 0 THEN 0.0
                   ELSE c.cnt_b * ln(CAST(c.cnt_b*(tot.na+tot.nb) AS DOUBLE)
                                     / CAST((c.cnt_a+c.cnt_b)*tot.nb AS DOUBLE))
              END))''')} AS g2_x
  FROM c CROSS JOIN tot
  WHERE c.cnt_a + c.cnt_b >= {DRIFT_MIN_TOTAL}
),
r AS (
  SELECT term, cnt_a, cnt_b, g2_x,
         row_number() OVER (ORDER BY g2_x DESC, term ASC) AS rank
  FROM g
)
SELECT CAST(rank AS BIGINT) AS rank, term, cnt_a, cnt_b, g2_x
FROM r WHERE rank <= {DRIFT_TOPK}
"""


def _mutual_partition(group: pd.DataFrame) -> pd.DataFrame:
    """(lo, hi)-hash partition of directed kNN edges → pairs present in
    BOTH directions. Each unordered pair contributes at most two rows
    (the kNN graph is rank-deduped), so the kernel is one groupby-size;
    the reported cos_x is the lo→hi edge's (canonical direction)."""
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "cos_x": pd.Series(dtype="int64")})
    g = group.drop(columns=[c for c in ("kpart",) if c in group.columns])
    if g.empty:
        return empty
    keep_cos = np.where(g["dir"].to_numpy() == 0,
                        g["cos_x"].to_numpy(np.int64), np.int64(-(1 << 62)))
    c = (
        g.assign(keep_cos=keep_cos)
        .groupby(["lo", "hi"], sort=False)
        .agg(n=("dir", "size"), cos_x=("keep_cos", "max"))
        .reset_index()
    )
    c = c[c["n"] == 2]
    if c.empty:
        return empty
    return pd.DataFrame({"a": c["lo"].to_numpy(np.int64),
                         "b": c["hi"].to_numpy(np.int64),
                         "cos_x": c["cos_x"].to_numpy(np.int64)})


def q_knn_mutual(sf_dir: str):
    """Mutual k-NN pairs: unordered (a, b) where each vector is in the
    OTHER's top-KNN_K — the reciprocal-neighbor filter that turns a kNN
    graph into high-precision near-dup/cluster edges (one-directional
    neighbors are dominated by hubs; mutuality removes them).

    Scale plan: composes the oracled q_knn_graph (tile-partial top-k,
    O(N·k) edges out); each directed edge re-keys to its unordered pair
    and ONE pair-hash cogroup keeps pairs seen from both sides — the
    exchange is edge-sized (N·k rows), never corpus-squared."""
    knn = q_knn_graph(sf_dir)

    def pair_key(t: pa.Table) -> pa.Table:
        a = pc.cast(t["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t["nbr"], pa.int64()).to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table(
            {
                "lo": pa.array(lo),
                "hi": pa.array(hi),
                # dir 0 = the lo→hi edge (canonical cos_x source)
                "dir": pa.array((a != lo).astype(np.int8)),
                "cos_x": pc.cast(t["cos_x"], pa.int64()),
            }
        )

    edges = knn.map_batches(pair_key, batch_format="pyarrow")
    return _parted(edges, ("lo", "hi")).map_groups(
        _mutual_partition, batch_format="pandas"
    )


# deep pagination: page size of the cursor-search second page
SEARCH_AFTER_PAGE = 10


def q_search_after(sf_dir: str):
    """Cursor-based deep pagination ("search after"): the SECOND page of
    the reference-BM25 ranking, fetched by cursor rather than by rank
    offset — the fulltext-serving feature that makes deep paging O(page)
    instead of O(offset) per shard. The cursor is the (score_x, doc_id)
    composite of each query's LAST page-1 hit; page 2 = the top
    SEARCH_AFTER_PAGE hits STRICTLY after it in (score desc, id asc)
    order.

    Scale plan: both fetches are the proven sharded top-k (each shard
    returns ≤ k rows; the cursor filter composes with per-shard
    preselection so no shard ever materializes `offset` rows); the
    cursor attach + after-filter here run on the RESULT-sized frame
    (|queries| × k rows — driver-bounded by construction)."""
    from .query import bm25_search

    index_dir = _index_for(sf_dir)
    # ONE 2-page-deep fetch serves both sides: its rank ≤ page prefix IS
    # page 1 (identical ordering), so the cursor derives locally instead
    # of paying a second scoring pass
    deep = _results_to_docids(
        bm25_search(
            _query_ds(), index_dir,
            cfg=BM25Config(k1=1.5, b=0.75, idf="lucene", compat="reference",
                           k=2 * SEARCH_AFTER_PAGE),
            round_dp=4,
        ).to_pandas()
    )
    page1 = deep[deep["rank"] <= SEARCH_AFTER_PAGE]
    # cursor = last returned hit per query; page 2 exists only when page
    # 1 was full (a short page means the ranking is exhausted)
    last = page1.sort_values(["query_id", "rank"]).groupby(
        "query_id", sort=False
    ).tail(1)
    full = last[last["rank"] == SEARCH_AFTER_PAGE]
    cursors = full.set_index("query_id")[["score_x", "doc_id"]]
    m = deep.merge(cursors, left_on="query_id", right_index=True,
                   suffixes=("", "_cur"))
    after = m[
        (m["score_x"] < m["score_x_cur"])
        | ((m["score_x"] == m["score_x_cur"]) & (m["doc_id"] > m["doc_id_cur"]))
    ]
    out = after.sort_values(["query_id", "rank"]).groupby(
        "query_id", sort=False
    ).head(SEARCH_AFTER_PAGE)
    return out[["query_id", "rank", "doc_id", "score_x"]].reset_index(
        drop=True
    ).astype({"rank": "int64", "doc_id": "int64", "score_x": "int64"})


def q_df_histogram(sf_dir: str):
    """Index-statistics report: postings-list length distribution per
    language in log2 buckets (bucket = floor(log2(df))) — the standard
    index-QA histogram that surfaces stopword-ish heads and singleton
    tails before they surprise the serving path.

    Scale plan: runs entirely on the Heaps-law vocab table (the term_df
    groupby output); the histogram partial is a per-batch integer
    groupby and the final exchange moves ≤ langs × 64 rows. log2 is
    exact at every bucket boundary (powers of two are exact doubles), so
    the floor agrees with SQL bit-for-bit."""
    df = q_term_df(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        dfs = pc.cast(t["df"], pa.int64()).to_numpy(zero_copy_only=False)
        bucket = np.floor(np.log2(dfs.astype(np.float64))).astype(np.int64)
        pdf = pd.DataFrame(
            {"lang": np.asarray(t["lang"].to_pandas(), dtype=object),
             "bucket": bucket}
        )
        g = pdf.groupby(["lang", "bucket"], sort=False).size().reset_index(
            name="n_terms"
        )
        return from_pandas_clean(g, preserve_index=False)

    out = (
        df.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "bucket"])
        .aggregate(ray.data.aggregate.Sum("n_terms", alias_name="n_terms"))
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("n_terms"), "n_terms",
            pc.cast(t["n_terms"], pa.int64()),
        ),
        batch_format="pyarrow",
    )


# time-decayed popularity: integer decay chain w0=10000, w_{a+1} = w_a*9//10
# (an exact integer geometric decay — no float exp/pow anywhere, so the
# engine and the SQL recursive CTE agree bit-for-bit)
DECAY_W0 = 10000
DECAY_NUM = 9
DECAY_DEN = 10


def _decay_weights(max_age: int) -> np.ndarray:
    w = [DECAY_W0]
    for _ in range(max_age):
        w.append((w[-1] * DECAY_NUM) // DECAY_DEN)
    return np.asarray(w, dtype=np.int64)


def q_popularity_decay(sf_dir: str):
    """Time-decayed item popularity (trending score): each click/view of
    an item contributes w(age) where age = days before the newest event
    and w follows the exact integer chain w0=10000, w*9//10 per day —
    the standard recency-weighted popularity of a recommender/trending
    feed, made reproducible (no float exp: the decay table is integer
    floor-division, mirrored by a recursive CTE).

    Scale plan: pass 1 is a thin (ts-only) max aggregate; the weight
    table (≤ age-range rows) broadcasts via ray.put; pass 2 emits
    per-batch (item, weighted-sum) integer partials so the only exchange
    is an item-keyed groupby of partial rows."""
    types = pa.array(list(COVISIT_TYPES))
    ev = _events(sf_dir, columns=["event_type", "ts", "props"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=types))
        item = pc.cast(
            pc.struct_field(
                pc.extract_regex(pc.cast(t["props"], pa.string()),
                                 r"(?P<k>[0-9]+)"),
                "k",
            ),
            pa.int64(),
        )
        day = pc.divide(pc.cast(t["ts"], pa.int64()), pa.scalar(DAY_US))
        out = pa.table({"item": item, "day": day})
        # item = first digit run anywhere in props; digitless props
        # extract to null — drop (mirrored in the oracle SQL)
        return out.filter(pc.is_valid(out["item"]))

    rows = ev.map_batches(prep, batch_format="pyarrow")
    span = rows.aggregate(
        ray.data.aggregate.Max("day", alias_name="md"),
        ray.data.aggregate.Min("day", alias_name="mn"),
    )
    if not span or span.get("md") is None:      # no qualifying events
        return pd.DataFrame({"item": pd.Series(dtype="int64"),
                             "score_x": pd.Series(dtype="int64")})
    md, mn = int(span["md"]), int(span["mn"])
    wref = ray.put(_decay_weights(md - mn))

    class Weighted:
        def __init__(self):
            self.w = ray.get(wref)

        def __call__(self, t: pa.Table) -> pa.Table:
            item = t["item"].to_numpy(zero_copy_only=False)
            age = md - t["day"].to_numpy(zero_copy_only=False)
            pdf = pd.DataFrame({"item": item, "ws": self.w[age]})
            g = pdf.groupby("item", sort=False)["ws"].sum().reset_index()
            return from_pandas_clean(g, preserve_index=False)

    out = (
        rows.map_batches(Weighted, batch_format="pyarrow",
                         concurrency=default_pool())
        .groupby("item")
        .aggregate(ray.data.aggregate.Sum("ws", alias_name="score_x"))
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("score_x"), "score_x",
            pc.cast(t["score_x"], pa.int64()),
        ),
        batch_format="pyarrow",
    )


def _streaks_partition(group: pd.DataFrame) -> pd.DataFrame:
    """user_id-hash partition → per-user consecutive-active-day runs
    (islands), fully vectorized: lexsort by (user, day), a run breaks
    where the user changes or the day jumps by more than one."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("user_id", "streak_start", "streak_end",
                           "n_days")})
    g = group[["user_id", "day"]].drop_duplicates()
    if g.empty:
        return empty
    g = g.sort_values(["user_id", "day"])
    u = g["user_id"].to_numpy(np.int64)
    d = g["day"].to_numpy(np.int64)
    new_run = np.ones(len(g), dtype=bool)
    new_run[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
    run_id = np.cumsum(new_run) - 1
    out = (
        pd.DataFrame({"run": run_id, "user_id": u, "day": d})
        .groupby("run", sort=False)
        .agg(user_id=("user_id", "first"), streak_start=("day", "min"),
             streak_end=("day", "max"), n_days=("day", "size"))
        .reset_index(drop=True)
    )
    return out.astype({c: "int64" for c in out.columns})


def q_streaks(sf_dir: str):
    """Per-user activity streaks (gaps-and-islands): maximal runs of
    consecutive active days per user, with start/end/length — the
    engagement-analytics sibling of retention, and the canonical islands
    problem (day − row_number grouping in SQL).

    Scale plan: ONE user_id-hash exchange of (user, day) rows (distinct
    days dedup inside the partition kernel — a user's whole timeline is
    colocated, the sessionize assumption); the kernel is a lexsort +
    shift compare, no per-user Python loop."""
    ev = _events(sf_dir, columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), pa.scalar(DAY_US)),
        })

    return _parted(ev.map_batches(prep, batch_format="pyarrow"),
                   ("user_id",)).map_groups(
        _streaks_partition, batch_format="pandas"
    )


_STREAKS_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
),
g AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM ud
)
SELECT user_id, min(day) AS streak_start, max(day) AS streak_end,
       CAST(count(*) AS BIGINT) AS n_days
FROM g GROUP BY user_id, grp
"""

_POPULARITY_DECAY_SQL = f"""
WITH RECURSIVE ev AS (
  SELECT CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS item,
         epoch_us(ts) // {DAY_US} AS day
  FROM events WHERE event_type IN {COVISIT_TYPES}
    AND regexp_matches(props, '[0-9]')
),
mx AS (SELECT max(day) AS md, min(day) AS mn FROM ev),
w(age, wt) AS (
  SELECT 0, CAST({DECAY_W0} AS BIGINT)
  UNION ALL
  SELECT age + 1, (wt * {DECAY_NUM}) // {DECAY_DEN}
  FROM w WHERE age < (SELECT md - mn FROM mx)
),
c AS (SELECT item, day, count(*) AS n FROM ev GROUP BY item, day)
SELECT c.item AS item, CAST(sum(c.n * w.wt) AS BIGINT) AS score_x
FROM c CROSS JOIN mx JOIN w ON w.age = mx.md - c.day
GROUP BY c.item
"""


def q_group_distinct(sf_dir: str):
    """Exact grouped count-distinct (distinct users per event type) —
    the exact companion to the HLL estimate (`hll_distinct`): the
    standard two-level plan where the dedup exchange moves (group, key)
    pairs once and the final count is group-sized. At 10^12 rows the
    (group, key) exchange is the cost ceiling — that is precisely when
    you switch to the HLL sibling; shipping both documents the cutover."""
    ev = _events(sf_dir, columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {"event_type": np.asarray(t["event_type"].to_pandas(),
                                      dtype=object),
             "user_id": t["user_id"].to_numpy(zero_copy_only=False)}
        ).drop_duplicates()           # in-batch dedup shrinks the exchange
        return from_pandas_clean(pdf, preserve_index=False)

    pairs = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .count()
    )
    out = (
        pairs.map_batches(
            lambda t: t.select(["event_type"]), batch_format="pyarrow"
        )
        .groupby("event_type")
        .count()
    )
    return out.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "n_users": pc.cast(t["count()"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


_GROUP_DISTINCT_SQL = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


ALSO_VIEWED_K = 3


def q_also_viewed(sf_dir: str):
    """"People also viewed": for every item, the ALSO_VIEWED_K strongest
    co-visited items by (shared users desc, item asc) — the item-item
    recommendation serving table built from the covisit projection.

    Scale plan: composes the oracled q_covisit (pair-bounded by the
    per-user cap); each unordered pair expands to both directions and
    ONE src-hash partition ranks per item with the vectorized
    sort+cumcount kernel (no per-item loop). Exchange = 2×pairs."""
    pairs = q_covisit(sf_dir)

    def expand(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        n = t["n_users"].to_numpy(zero_copy_only=False)
        return pa.table({
            "item": pa.array(np.concatenate([a, b]), pa.int64()),
            "rec": pa.array(np.concatenate([b, a]), pa.int64()),
            "n_users": pa.array(np.concatenate([n, n]), pa.int64()),
        })

    def top_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["item", "n_users", "rec"],
                          ascending=[True, False, True])
        r = g.groupby("item", sort=False).cumcount().to_numpy() + 1
        g = g.assign(rank=r)[r <= ALSO_VIEWED_K]
        return g[["item", "rank", "rec", "n_users"]].astype(
            {"item": "int64", "rank": "int64", "rec": "int64",
             "n_users": "int64"}
        )

    both = pairs.map_batches(expand, batch_format="pyarrow")
    return _parted(both, ("item",)).map_groups(
        top_partition, batch_format="pandas"
    )


def _also_viewed_sql() -> str:
    return f"""
WITH p AS ({_COVISIT_SQL}),
e AS (
  SELECT a AS item, b AS rec, n_users FROM p
  UNION ALL SELECT b, a, n_users FROM p
),
r AS (
  SELECT item, rec, n_users,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_users DESC, rec ASC) AS rank
  FROM e
)
SELECT item, CAST(rank AS BIGINT) AS rank, rec, n_users
FROM r WHERE rank <= {ALSO_VIEWED_K}
"""


def q_dl_percent_rank(sf_dir: str):
    """Percent-rank of each doc's token length within its language —
    the windowed analytics op (SQL ``percent_rank()``) behind
    length-percentile quality cuts, computed WITHOUT a global sort:
    pr = (rank − 1)/(n − 1) where rank−1 = docs with strictly smaller
    dl, derived from a (lang, dl)-histogram exchange (bounded by the
    number of DISTINCT lengths, not by N) whose per-lang cumsum
    broadcasts back as a lookup. Fixed-point via integer floor division
    — exact parity with the SQL window by construction."""
    ds = _docs(sf_dir).map_batches(_dl_batch, batch_format="pyarrow")
    hist = (
        ds.map_batches(
            lambda t: t.select(["lang", "dl"]), batch_format="pyarrow"
        )
        .groupby(["lang", "dl"])
        .count()
        .to_pandas()   # bounded: distinct (lang, dl) values, not docs
    )
    hist.columns = ["lang", "dl", "n"]
    lut: dict = {}
    totals: dict = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("dl")
        below = np.concatenate([[0], np.cumsum(g["n"].to_numpy())[:-1]])
        for dl, cb in zip(g["dl"].to_numpy(), below):
            lut[(lang, int(dl))] = int(cb)
        totals[lang] = int(g["n"].sum())
    lut_ref = ray.put((lut, totals))

    class AddPr:
        def __init__(self):
            lut, totals = ray.get(lut_ref)
            self.lut_df = pd.DataFrame(
                [(l, dl, cb) for (l, dl), cb in lut.items()],
                columns=["lang", "dl", "below"],
            )
            self.tot_df = pd.DataFrame(
                list(totals.items()), columns=["lang", "n"]
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            pdf = pd.DataFrame({
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                "lang": np.asarray(t["lang"].to_pandas(), dtype=object),
                "dl": t["dl"].to_numpy(zero_copy_only=False),
            })
            m = pdf.merge(self.lut_df, on=["lang", "dl"]).merge(
                self.tot_df, on="lang"
            )
            n = m["n"].to_numpy(np.int64)
            below = m["below"].to_numpy(np.int64)
            pr = np.where(n == 1, 0, (10000 * below) // np.maximum(n - 1, 1))
            return pa.table({
                "doc_id": pa.array(m["doc_id"].to_numpy(np.int64)),
                "lang": pa.array(m["lang"], pa.string()),
                "dl": pa.array(m["dl"].to_numpy(np.int64)),
                "pr_x": pa.array(pr.astype(np.int64)),
            })

    return ds.map_batches(AddPr, batch_format="pyarrow",
                          concurrency=default_pool())


_DL_PERCENT_RANK_SQL = f"""
WITH {_DL_CTE},
w AS (
  SELECT doc_id, lang, dl,
         rank() OVER (PARTITION BY lang ORDER BY dl) AS rnk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM dl
)
SELECT doc_id, lang, CAST(dl AS BIGINT) AS dl,
       CAST(CASE WHEN n = 1 THEN 0
                 ELSE (10000 * (rnk - 1)) // (n - 1) END AS BIGINT) AS pr_x
FROM w
"""


# table checksum: 48-bit value per row from md5(doc_id ':' text), summed
# per lang — order-independent, so replicas compare without a sort
CHECKSUM_NIBBLES = 12


def q_table_checksum(sf_dir: str):
    """Order-independent table checksum (anti-entropy): per language,
    the integer sum of each row's 48-bit md5-prefix of
    ``doc_id || ':' || text`` plus the row count — the cheap
    replica-comparison digest a 100 TB replicated table needs (any
    single-row corruption shifts the sum; addition commutes, so no
    ordering or single-reducer is required).

    Scale plan: zero shuffles — per-batch integer partial sums, one
    lang-keyed reduce of langs×batches tiny rows. 48-bit row values keep
    the int64 sum overflow-free below ~2^15 rows per lang at test scale;
    at 10^12 rows the sum wraps mod 2^63 identically on every replica
    (documented — comparisons stay valid)."""
    from ..functions.hashing import md5_hex

    docs = _docs(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        langs = np.asarray(t["lang"].to_pandas(), dtype=object)
        vals = np.fromiter(
            (int(md5_hex(f"{i}:{s}")[:CHECKSUM_NIBBLES], 16)
             for i, s in zip(ids, texts)),
            dtype=np.int64, count=len(ids),
        )
        pdf = (
            pd.DataFrame({"lang": langs, "checksum": vals})
            .groupby("lang", sort=False)
            .agg(checksum=("checksum", "sum"), n_docs=("checksum", "size"))
            .reset_index()
        )
        return from_pandas_clean(pdf, preserve_index=False)

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            ray.data.aggregate.Sum("checksum", alias_name="checksum"),
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
        )
    )
    return out.map_batches(
        lambda t: pa.table({
            "lang": t["lang"],
            "checksum": pc.cast(t["checksum"], pa.int64()),
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


# 12-nibble hex → BIGINT via the simhash oracle's strpos nibble decode
_CHECKSUM_SQL = f"""
WITH r AS (SELECT i FROM range(0, {CHECKSUM_NIBBLES}) t(i)),
h AS (
  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR) || ':' || text) AS hx
  FROM documents
),
v AS (
  SELECT h.lang AS lang,
         sum(CAST(strpos('0123456789abcdef',
                         substring(h.hx, CAST(r.i + 1 AS INT), 1)) - 1
                  AS BIGINT)
             * CAST(power(16, {CHECKSUM_NIBBLES - 1} - r.i) AS BIGINT))
           AS v
  FROM h CROSS JOIN r GROUP BY h.doc_id, h.lang
)
SELECT lang, CAST(sum(v) AS BIGINT) AS checksum,
       CAST(count(*) AS BIGINT) AS n_docs
FROM v GROUP BY lang
"""


# nDCG@10 rank weights: fx4 of 1/log2(r+1), computed ONCE here and
# embedded literally in the SQL oracle — both engines share the exact
# integers, so the metric is integer arithmetic end-to-end
NDCG_K = 10
NDCG_W = [int(np.floor(10000.0 / np.log2(r + 1) + 0.5))
          for r in range(1, NDCG_K + 1)]


def q_eval_ndcg(sf_dir: str):
    """nDCG@10 of the reference-BM25 ranking under the same derived
    binary relevance as `eval_metrics` (docs of the query's language
    containing EVERY distinct query term) — the graded-position metric
    next to recall/MRR. DCG = Σ W[rank] over relevant top-10 hits with
    the shared integer weight table; IDCG = the best-possible prefix
    sum; ndcg_x = (10000·DCG) // IDCG. Same distributed relevance
    labeling plan as eval_metrics (filtered postings map + one
    (query, doc) groupby; the driver touches per-query aggregates
    only)."""
    results = q_bm25_reference(sf_dir)

    qterms: dict = {}
    n_terms: dict = {}
    for qid, qtext, lang in QUERYSET:
        terms = sorted(set(tokenize_simple(qtext)))
        n_terms[qid] = len(terms)
        for t in terms:
            qterms.setdefault((lang, t), []).append(qid)
    keyset = pa.array([f"{l}\x00{t}" for (l, t) in qterms], pa.string())

    def match(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["lang"], pa.string()), pc.cast(t["term"], pa.string()),
            "\x00",
        )
        t2 = t.filter(pc.is_in(key, value_set=keyset))
        docs = url_to_docid(t2["url"]).to_pylist()
        out_q, out_d = [], []
        for l, tm, d in zip(t2["lang"].to_pylist(), t2["term"].to_pylist(),
                            docs):
            for qid in qterms[(l, tm)]:
                out_q.append(qid)
                out_d.append(d)
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
        })

    relc = (
        _postings_ds(sf_dir)
        .map_batches(match, batch_format="pyarrow")
        .groupby(["query_id", "doc_id"])
        .count()
    )

    res_rank = {
        (r.query_id, r.doc_id): int(r.rank) for r in results.itertuples()
    }

    def rel_w(t: pa.Table) -> pa.Table:
        qs = t["query_id"].to_pylist()
        ds = t["doc_id"].to_numpy(zero_copy_only=False)
        cnt = t["count()"].to_numpy(zero_copy_only=False)
        need = np.array([n_terms[q] for q in qs], dtype=np.int64)
        keep = np.nonzero(cnt == need)[0]
        w = np.zeros(len(keep), dtype=np.int64)
        for j, i in enumerate(keep):
            rank = res_rank.get((qs[i], int(ds[i])))
            if rank is not None and rank <= NDCG_K:
                w[j] = NDCG_W[rank - 1]
        return pa.table({
            "query_id": pa.array([qs[i] for i in keep], pa.string()),
            "w": pa.array(w),
        })

    agg = (
        relc.map_batches(rel_w, batch_format="pyarrow")
        .groupby("query_id")
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_relevant"),
            ray.data.aggregate.Sum("w", alias_name="dcg_w"),
        )
        .to_pandas()
    )
    by_q = {r.query_id: r for r in agg.itertuples()}
    rows = []
    for qid, _qtext, _lang in QUERYSET:
        r = by_q.get(qid)
        n_rel = int(r.n_relevant) if r is not None else 0
        dcg = int(r.dcg_w) if r is not None else 0
        idcg = sum(NDCG_W[: min(n_rel, NDCG_K)])
        rows.append({
            "query_id": qid,
            "n_relevant": n_rel,
            "dcg_w": dcg,
            "ndcg_x": (10000 * dcg) // idcg if idcg else 0,
        })
    return pd.DataFrame(
        rows, columns=["query_id", "n_relevant", "dcg_w", "ndcg_x"]
    )


def _eval_ndcg_sql() -> str:
    wvals = ", ".join(f"({r + 1}, {w})" for r, w in enumerate(NDCG_W))
    return f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup=True)}),
qn AS (SELECT query_id, count(*) AS n_terms FROM q GROUP BY query_id),
relc AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id, count(*) AS c
  FROM q JOIN tok ON tok.lang = q.lang AND tok.term = q.term
  GROUP BY q.query_id, tok.doc_id
),
rel AS (
  SELECT relc.query_id, relc.doc_id
  FROM relc JOIN qn ON qn.query_id = relc.query_id
  WHERE relc.c = qn.n_terms
),
scores AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id,
         sum( q.w * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * (1.5 + 1)) / (tok.tf + 1.5*(1 - 0.75 + d.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tok ON tok.lang = q.lang AND tok.term = q.term
  JOIN df ON df.lang = q.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = tok.doc_id
  JOIN stats s ON s.lang = q.lang
  GROUP BY q.query_id, tok.doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
),
wt(r, wt) AS (VALUES {wvals}),
hits AS (
  SELECT r.query_id AS query_id,
         sum(CASE WHEN rel.doc_id IS NOT NULL THEN wt.wt ELSE 0 END) AS dcg_w
  FROM ranked r
  JOIN wt ON wt.r = r.rank
  LEFT JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
  WHERE r.rank <= {NDCG_K}
  GROUP BY r.query_id
),
nrel AS (SELECT query_id, count(*) AS n_relevant FROM rel GROUP BY query_id),
idcg AS (
  SELECT n.query_id,
         (SELECT sum(wt) FROM wt WHERE wt.r <= least(n.n_relevant, {NDCG_K}))
           AS v
  FROM nrel n
),
allq AS (SELECT DISTINCT query_id FROM q)
SELECT a.query_id AS query_id,
       CAST(coalesce(n.n_relevant, 0) AS BIGINT) AS n_relevant,
       CAST(coalesce(h.dcg_w, 0) AS BIGINT) AS dcg_w,
       CAST(CASE WHEN i.v IS NULL OR i.v = 0 THEN 0
                 ELSE (10000 * coalesce(h.dcg_w, 0)) // i.v END AS BIGINT)
         AS ndcg_x
FROM allq a
LEFT JOIN nrel n ON n.query_id = a.query_id
LEFT JOIN hits h ON h.query_id = a.query_id
LEFT JOIN idcg i ON i.query_id = a.query_id
"""


def _lag_partition(group: pd.DataFrame) -> pd.DataFrame:
    """user_id-hash partition of per-(user, type) first-event times →
    (user_id, gap_us) for users whose first purchase is at-or-after
    their first signup. Vectorized pivot: at most two rows per user
    reach this kernel."""
    empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                          "gap_us": pd.Series(dtype="int64")})
    s = group[group["event_type"] == "signup"]
    p = group[group["event_type"] == "purchase"]
    if s.empty or p.empty:
        return empty
    m = s[["user_id", "t"]].merge(
        p[["user_id", "t"]], on="user_id", suffixes=("0", "1")
    )
    m = m[m["t1"] >= m["t0"]]
    if m.empty:
        return empty
    return pd.DataFrame({
        "user_id": m["user_id"].to_numpy(np.int64),
        "gap_us": (m["t1"] - m["t0"]).to_numpy(np.int64),
    })


def q_conversion_lag(sf_dir: str):
    """Conversion latency: per user, the exact microsecond gap from the
    FIRST signup to the user's FIRST purchase overall, keeping the user
    only when that earliest purchase is not before the signup (a user
    who also purchased pre-signup is excluded, not re-measured to their
    first post-signup purchase) — the time-to-convert distribution
    behind activation dashboards (funnel counts WHO converts; this
    measures HOW FAST).

    Scale plan: per-batch partial (user, type, min ts) rows combine
    before the shuffle, so the (user, type) min-groupby moves at most
    2 rows per user per batch; the pivot kernel then sees ≤ 2 rows per
    user on one user-hash partition. Exact integer microseconds
    end-to-end."""
    types = pa.array(["signup", "purchase"])
    ev = _events(sf_dir, columns=["user_id", "event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=types))
        pdf = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": np.asarray(t["event_type"].to_pandas(),
                                     dtype=object),
            "t": pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False),
        })
        g = pdf.groupby(["user_id", "event_type"], sort=False)["t"].min()
        return from_pandas_clean(g.reset_index(), preserve_index=False)

    firsts = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(ray.data.aggregate.Min("t", alias_name="t"))
    )
    return _parted(firsts, ("user_id",)).map_groups(
        _lag_partition, batch_format="pandas"
    )


_CONVERSION_LAG_SQL = """
WITH s AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'purchase' GROUP BY user_id)
SELECT s.user_id AS user_id, CAST(p.t1 - s.t0 AS BIGINT) AS gap_us
FROM s JOIN p ON p.user_id = s.user_id
WHERE p.t1 >= s.t0
"""


# ------------------------------------------------------------ registries

QUERIES = {
    "doc_stats": q_doc_stats,
    "doc_lengths": q_doc_lengths,
    "term_df": q_term_df,
    "term_idf": q_term_idf,
    "postings_sample": q_postings_sample,
    "vocab": q_vocab,
    "top_terms": q_top_terms,
    "bm25_reference": q_bm25_reference,
    "bm25_standard": q_bm25_standard,
    "bm25_term_sharded": q_bm25_term_sharded,
    "bm25_term_sharded_pruned": q_bm25_term_sharded_pruned,
    "bm25_incremental": q_bm25_incremental,
    "bm25_deleted": q_bm25_deleted,
    "bm25_compacted": q_bm25_compacted,
    "bm25_wand": q_bm25_wand,
    "bm25_collapsed": q_bm25_collapsed,
    "index_integrity": q_index_integrity,
    "suggest": q_suggest,
    "percolate": q_percolate,
    "item_ctr": q_item_ctr,
    "lm_dirichlet": q_lm_dirichlet,
    "cosine": q_cosine,
    "cosine_compacted": q_cosine_compacted,
    "cosine_rerank": q_cosine_rerank,
    "submission": q_submission,
    "dedup_exact": q_dedup_exact,
    "dedup_normalized": q_dedup_normalized,
    "dedup_apply": q_dedup_apply,
    "quality_filter": q_quality_filter,
    "fingerprint": q_fingerprint,
    "minhash_pairs": q_minhash_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "containment": q_containment,
    "neardup_components": q_neardup_components,
    "dedup_canonical": q_dedup_canonical,
    "pagerank": q_pagerank,
    "degree_dist": q_degree_dist,
    "triangles": q_triangles,
    "event_bigrams": q_event_bigrams,
    "value_outliers": q_value_outliers,
    "group_percentiles": q_group_percentiles,
    "value_norm": q_value_norm,
    "user_activity": q_user_activity,
    "simhash_pairs": q_simhash_pairs,
    "embed_neardup": q_embed_neardup,
    "knn_graph": q_knn_graph,
    "embed_neardup_lsh": q_embed_neardup_lsh,
    "ann_topk": q_ann_topk,
    "ann_topk_lsh": q_ann_topk_lsh,
    "ann_recall": q_ann_recall,
    "ann_topk_ivf": q_ann_topk_ivf,
    "kmeans_clusters": q_kmeans_clusters,
    "pq_codes": q_pq_codes,
    "ann_topk_pq": q_ann_topk_pq,
    "ann_topk_ivfpq": q_ann_topk_ivfpq,
    "mmr_rerank": q_mmr_rerank,
    "token_stats": q_token_stats,
    "langid": q_langid,
    "binary_meta": q_binary_meta,
    "rel_agg": q_rel_agg,
    "rel_join_top": q_rel_join_top,
    "rel_q5": q_rel_q5,
    "rel_antijoin": q_rel_antijoin,
    "linreg_fit": q_linreg_fit,
    "related_docs": q_related_docs,
    "rel_rollup": q_rel_rollup,
    "event_dedup": q_event_dedup,
    "embed_outliers": q_embed_outliers,
    "rel_window": q_rel_window,
    "rel_asof": q_rel_asof,
    "rel_json": q_rel_json,
    "submission_wide": q_submission_wide,
    "web_normalize": q_web_normalize,
    "sentences": q_sentences,
    "readability": q_readability,
    "sentence_bm25": q_sentence_bm25,
    "train_test_split": q_train_test_split,
    "eval_metrics": q_eval_metrics,
    "phrase_search": q_phrase_search,
    "phrase_search_indexed": q_phrase_search_indexed,
    "near_search": q_near_search,
    "prefix_search": q_prefix_search,
    "tfidf_keywords": q_tfidf_keywords,
    "top_bigrams": q_top_bigrams,
    "hybrid_rrf": q_hybrid_rrf,
    "phrase_snippets": q_phrase_snippets,
    "bool_search": q_bool_search,
    "sessionize": q_sessionize,
    "funnel": q_funnel,
    "retention": q_retention,
    "window_tumble": q_window_tumble,
    "window_hop": q_window_hop,
    "latest_event": q_latest_event,
    "pmi_pairs": q_pmi_pairs,
    "range_join": q_range_join,
    "sample_stratified": q_sample_stratified,
    "quality_sample": q_quality_sample,
    "source_cap": q_source_cap,
    "source_stats": q_source_stats,
    "token_fertility": q_token_fertility,
    "dup_rate_by_source": q_dup_rate_by_source,
    "did_you_mean": q_did_you_mean,
    "prf_expansion": q_prf_expansion,
    "snippets": q_snippets,
    "more_like_this": q_more_like_this,
    "related_terms": q_related_terms,
    "index_diff": q_index_diff,
    "dedup_bucket_audit": q_dedup_bucket_audit,
    "jaccard_prefix_audit": q_jaccard_prefix_audit,
    "containment_audit": q_containment_audit,
    "simhash_band_audit": q_simhash_band_audit,
    "rep_quality": q_rep_quality,
    "dup_spans": q_dup_spans,
    "dup_span_docs": q_dup_span_docs,
    "lm_score": q_lm_score,
    "dl_percentiles": q_dl_percentiles,
    "hll_distinct": q_hll_distinct,
    "cms_counts": q_cms_counts,
    "top_per_group": q_top_per_group,
    "bpe_tokens": q_bpe_tokens,
    "decontaminate": q_decontaminate,
    "spell_correct": q_spell_correct,
    "facet_counts": q_facet_counts,
    "fuzzy_search": q_fuzzy_search,
    "wildcard_search": q_wildcard_search,
    "regex_search": q_regex_search,
    "ltr_features": q_ltr_features,
    "bm25_federated": q_bm25_federated,
    "stopword_detect": q_stopword_detect,
    "rescore_boost": q_rescore_boost,
    "query_clarity": q_query_clarity,
    "tiered_bm25": q_tiered_bm25,
    "lang_mismatch": q_lang_mismatch,
    "span_first": q_span_first,
    "neardup_cluster_sizes": q_neardup_cluster_sizes,
    "msm_search": q_msm_search,
    "phrase_slop": q_phrase_slop,
    "synonym_search": q_synonym_search,
    "common_terms": q_common_terms,
    "heavy_hitters": q_heavy_hitters,
    "burst_windows": q_burst_windows,
    "mix_plan": q_mix_plan,
    "champion_topk": q_champion_topk,
    "dense_rerank": q_dense_rerank,
    "dense_rerank_mlp": q_dense_rerank_mlp,
    "bm25f": q_bm25f,
    "nb_classify": q_nb_classify,
    "mlt": q_mlt,
    "nb_confusion": q_nb_confusion,
    "query_expand": q_query_expand,
    "token_entropy": q_token_entropy,
    "neardup_apply": q_neardup_apply,
    "cross_dedup": q_cross_dedup,
    "source_lift": q_source_lift,
    "export_roundtrip": q_export_roundtrip,
    "seq_pack": q_seq_pack,
    "redact_terms": q_redact_terms,
    "approx_percentiles": q_approx_percentiles,
    "rel_skew_join": q_rel_skew_join,
    "upsert_apply": q_upsert_apply,
    "user_running_total": q_user_running_total,
    "value_zscore": q_value_zscore,
    "value_ntile": q_value_ntile,
    "winsorized_mean": q_winsorized_mean,
    "bloom_semijoin": q_bloom_semijoin,
    "rel_broadcast_join": q_rel_broadcast_join,
    "chunk_text": q_chunk_text,
    "chunk_dedup": q_chunk_dedup,
    "ann_range": q_ann_range,
    "oov_rate": q_oov_rate,
    "ann_filtered": q_ann_filtered,
    "covisit": q_covisit,
    "extract_summary": q_extract_summary,
    "vocab_drift": q_vocab_drift,
    "knn_mutual": q_knn_mutual,
    "search_after": q_search_after,
    "df_histogram": q_df_histogram,
    "popularity_decay": q_popularity_decay,
    "streaks": q_streaks,
    "group_distinct": q_group_distinct,
    "also_viewed": q_also_viewed,
    "dl_percent_rank": q_dl_percent_rank,
    "table_checksum": q_table_checksum,
    "eval_ndcg": q_eval_ndcg,
    "conversion_lag": q_conversion_lag,
}


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_TOKS_CTE = "toks AS (SELECT doc_id, lang, " + TOKLIST.format(col="text") + " AS l FROM documents)"

_MINHASH_SQL = f"""
WITH {_TOKS_CTE},
shl AS (
  SELECT doc_id,
         CASE WHEN len(l) < {SHINGLE_N} THEN [array_to_string(l, ' ')]
              ELSE list_transform(range(1, len(l) - {SHINGLE_N - 2}),
                                  i -> array_to_string(list_slice(l, i, i + {SHINGLE_N - 1}), ' '))
         END AS sh_list
  FROM toks WHERE len(l) >= 1
),
sh AS (SELECT DISTINCT doc_id, unnest(sh_list) AS shingle FROM shl),
mh AS (
  SELECT doc_id, s.seed AS seed,
         min(md5(CAST(s.seed AS VARCHAR) || ':' || shingle)) AS mh
  FROM sh, (SELECT i AS seed FROM range(0, 8) t(i)) s
  GROUP BY doc_id, s.seed
),
bands AS (
  SELECT doc_id, (seed // 2) AS band_idx,
         md5(string_agg(mh, '|' ORDER BY seed)) AS band_key
  FROM mh GROUP BY doc_id, (seed // 2)
),
bands_r AS (
  -- mirror of the engine's deterministic max_bucket truncation: only the
  -- sorted-doc_id prefix of each band bucket generates candidates
  SELECT doc_id, band_idx, band_key,
         row_number() OVER (PARTITION BY band_idx, band_key ORDER BY doc_id) AS rn
  FROM bands
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands_r x JOIN bands_r y
    ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id
  WHERE x.rn <= {MAX_BUCKET} AND y.rn <= {MAX_BUCKET}
),
inter AS (
  SELECT c.a AS a, c.b AS b, count(*) AS ni
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
SELECT i.a AS a, i.b AS b,
       {_fx('CAST(ni AS DOUBLE) / (za.n + zb.n - ni)')} AS jaccard_x
FROM inter i
JOIN sizes za ON za.doc_id = i.a
JOIN sizes zb ON zb.doc_id = i.b
WHERE CAST(ni AS DOUBLE) / (za.n + zb.n - ni) >= {MINHASH_JACCARD_THRESHOLD}
"""

_DEDUP_BUCKET_AUDIT_SQL = f"""
WITH {_TOKS_CTE},
shl AS (
  SELECT doc_id,
         CASE WHEN len(l) < {SHINGLE_N} THEN [array_to_string(l, ' ')]
              ELSE list_transform(range(1, len(l) - {SHINGLE_N - 2}),
                                  i -> array_to_string(list_slice(l, i, i + {SHINGLE_N - 1}), ' '))
         END AS sh_list
  FROM toks WHERE len(l) >= 1
),
sh AS (SELECT DISTINCT doc_id, unnest(sh_list) AS shingle FROM shl),
mh AS (
  SELECT doc_id, s.seed AS seed,
         min(md5(CAST(s.seed AS VARCHAR) || ':' || shingle)) AS mh
  FROM sh, (SELECT i AS seed FROM range(0, {DEFAULT_DEDUP.num_hashes}) t(i)) s
  GROUP BY doc_id, s.seed
),
bands AS (
  SELECT doc_id, (seed // {DEFAULT_DEDUP.band_size}) AS band_idx,
         md5(string_agg(mh, '|' ORDER BY seed)) AS band_key
  FROM mh GROUP BY doc_id, (seed // {DEFAULT_DEDUP.band_size})
)
SELECT CAST(band_idx AS BIGINT) AS band_idx, band_key,
       CAST(count(*) AS BIGINT) AS bucket_size,
       CAST(count(*) - {AUDIT_BUCKET_K} AS BIGINT) AS dropped
FROM bands GROUP BY band_idx, band_key HAVING count(*) > {AUDIT_BUCKET_K}
"""


# Exact n-gram Jaccard join: the oracle is the CLEAN SEMANTIC definition
# (all pairs sharing >= 1 shingle, exact Jaccard >= t) — the engine's
# prefix filter must be lossless against it, which is precisely the
# AllPairs correctness claim under test.
_NGRAM_JACCARD_SQL = f"""
WITH {_TOKS_CTE},
shl AS (
  SELECT doc_id,
         CASE WHEN len(l) < {SHINGLE_N} THEN [array_to_string(l, ' ')]
              ELSE list_transform(range(1, len(l) - {SHINGLE_N - 2}),
                                  i -> array_to_string(list_slice(l, i, i + {SHINGLE_N - 1}), ' '))
         END AS sh_list
  FROM toks WHERE len(l) >= 1
),
sh AS (SELECT DISTINCT doc_id, unnest(sh_list) AS shingle FROM shl),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS ni
  FROM sh sa JOIN sh sb ON sb.shingle = sa.shingle AND sa.doc_id < sb.doc_id
  GROUP BY sa.doc_id, sb.doc_id
)
SELECT i.a AS a, i.b AS b,
       {_fx('CAST(ni AS DOUBLE) / (za.n + zb.n - ni)')} AS jaccard_x
FROM inter i
JOIN sizes za ON za.doc_id = i.a
JOIN sizes zb ON zb.doc_id = i.b
WHERE CAST(ni AS DOUBLE) / (za.n + zb.n - ni) >= {NGRAM_JACCARD_THRESHOLD}
"""

_CONTAINMENT_SQL = f"""
WITH {_TOKS_CTE},
shl AS (
  SELECT doc_id,
         CASE WHEN len(l) < {SHINGLE_N} THEN [array_to_string(l, ' ')]
              ELSE list_transform(range(1, len(l) - {SHINGLE_N - 2}),
                                  i -> array_to_string(list_slice(l, i, i + {SHINGLE_N - 1}), ' '))
         END AS sh_list
  FROM toks WHERE len(l) >= 1
),
sh AS (SELECT DISTINCT doc_id, unnest(sh_list) AS shingle FROM shl),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS ni
  FROM sh sa JOIN sh sb ON sb.shingle = sa.shingle
                       AND sa.doc_id <> sb.doc_id
  GROUP BY sa.doc_id, sb.doc_id
)
SELECT i.a AS a, i.b AS b,
       {_fx('CAST(ni AS DOUBLE) / za.n')} AS containment_x
FROM inter i
JOIN sizes za ON za.doc_id = i.a
WHERE CAST(ni AS DOUBLE) / za.n >= 0.8
"""

# stable_hash64 replayed in SQL: the first 16 hex chars of md5 parsed
# big-endian into HUGEINT (per-position multipliers 16^(16-p)), wrapped
# to the engine's SIGNED int64 view. Consumes a CTE `sh(doc_id,
# shingle)`; produces `shv(doc_id, sh)` (distinct by hash, like
# emit_doc_shingles).
_HEX_MULTS = ", ".join(f"({p}, {16 ** (16 - p)})" for p in range(1, 17))
_SH64_CTES = f"""
h16 AS (SELECT * FROM (VALUES {_HEX_MULTS}) m(p, mult)),
shh AS (
  SELECT doc_id, shingle,
         sum(CAST(strpos('0123456789abcdef',
                  substring(md5(shingle), CAST(m.p AS INT), 1)) - 1 AS HUGEINT)
             * CAST(m.mult AS HUGEINT)) AS uh
  FROM sh CROSS JOIN h16 m GROUP BY doc_id, shingle
),
shv AS (
  SELECT DISTINCT doc_id,
         CAST(CASE WHEN uh >= 9223372036854775808
                   THEN uh - 18446744073709551616 ELSE uh END AS BIGINT) AS sh
  FROM shh
)"""

_SHINGLE_SH_CTES = f"""{{toks}},
shl AS (
  SELECT doc_id,
         CASE WHEN len(l) < {SHINGLE_N} THEN [array_to_string(l, ' ')]
              ELSE list_transform(range(1, len(l) - {SHINGLE_N - 2}),
                                  i -> array_to_string(list_slice(l, i, i + {SHINGLE_N - 1}), ' '))
         END AS sh_list
  FROM toks WHERE len(l) >= 1
),
sh AS (SELECT DISTINCT doc_id, unnest(sh_list) AS shingle FROM shl),
{_SH64_CTES},
dfs AS (SELECT sh, count(*) AS df FROM shv GROUP BY sh),
sizes AS (SELECT doc_id, count(*) AS n FROM shv GROUP BY doc_id)"""


def _prefix_cte(threshold: float) -> str:
    """`pr(doc_id, sh)`: each doc's df-ascending lossless prefix under
    the engine's canonical (df asc, signed-hash asc) order."""
    return f"""pr AS (
  SELECT doc_id, sh FROM (
    SELECT v.doc_id AS doc_id, v.sh AS sh,
           row_number() OVER (PARTITION BY v.doc_id ORDER BY d.df, v.sh) AS rk,
           z.n AS n
    FROM shv v JOIN dfs d USING (sh) JOIN sizes z USING (doc_id)
  ) WHERE rk <= n - CAST(ceil({threshold} * n) AS BIGINT) + 1
)"""


_JACCARD_PREFIX_AUDIT_SQL = f"""
WITH {_SHINGLE_SH_CTES.format(toks=_TOKS_CTE)},
{_prefix_cte(NGRAM_JACCARD_THRESHOLD)}
SELECT sh, CAST(count(*) AS BIGINT) AS bucket_size,
       CAST(count(*) - {AUDIT_BUCKET_K} AS BIGINT) AS dropped
FROM pr GROUP BY sh HAVING count(*) > {AUDIT_BUCKET_K}
"""

_CONTAINMENT_AUDIT_SQL = f"""
WITH {_SHINGLE_SH_CTES.format(toks=_TOKS_CTE)},
{_prefix_cte(CONTAINMENT_THRESHOLD)},
np_ AS (SELECT sh, count(*) AS n_prefix FROM pr GROUP BY sh)
SELECT d.sh AS sh,
       CAST(coalesce(p.n_prefix, 0) AS BIGINT) AS n_prefix,
       CAST(d.df AS BIGINT) AS n_full,
       CAST(greatest(coalesce(p.n_prefix, 0) - {AUDIT_BUCKET_K}, 0)
            + greatest(d.df - {AUDIT_BUCKET_K}, 0) AS BIGINT) AS dropped
FROM dfs d LEFT JOIN np_ p USING (sh)
WHERE coalesce(p.n_prefix, 0) > {AUDIT_BUCKET_K} OR d.df > {AUDIT_BUCKET_K}
"""

_EMB_UNNEST = """
u AS (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM u GROUP BY vec_id)
"""

# SimHash recomputed bit-exactly in SQL: stable_hash64(term) is the first
# 16 hex chars of md5 big-endian, so bit i lives in hex char (16 - i//4)
# at nibble bit (i % 4); acc_i = Σ tf·(2·bit−1); signature bit = acc > 0.
_SIMHASH_SQL = f"""
WITH {_TOK_CTE},
r AS (SELECT i FROM range(0, 64) t(i)),
nib AS (
  SELECT tok.doc_id AS doc_id, r.i AS i,
         (CASE WHEN ((strpos('0123456789abcdef',
                      substring(md5(tok.term), CAST(16 - r.i // 4 AS INT), 1)) - 1)
                     >> CAST(r.i % 4 AS INT)) & 1 = 1
               THEN 1 ELSE -1 END) * tok.tf AS sgn
  FROM tok CROSS JOIN r
),
accs AS (SELECT doc_id, i, sum(sgn) AS acc FROM nib GROUP BY doc_id, i),
bits AS (
  SELECT d.doc_id AS doc_id, r.i AS i,
         CASE WHEN coalesce(a.acc, 0) > 0 THEN 1 ELSE 0 END AS bit
  FROM documents d CROSS JOIN r
  LEFT JOIN accs a ON a.doc_id = d.doc_id AND a.i = r.i
),
chunks AS (
  SELECT doc_id, CAST(i // 16 AS BIGINT) AS band,
         CAST(sum(bit * (1 << CAST(i % 16 AS INT))) AS BIGINT) AS chunk
  FROM bits GROUP BY doc_id, i // 16
),
chunks_r AS (
  -- mirror of the engine's deterministic max_bucket truncation
  SELECT doc_id, band, chunk,
         row_number() OVER (PARTITION BY band, chunk ORDER BY doc_id) AS rn
  FROM chunks
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM chunks_r x JOIN chunks_r y
    ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id
  WHERE x.rn <= {MAX_BUCKET} AND y.rn <= {MAX_BUCKET}
),
ham AS (
  SELECT c.a AS a, c.b AS b,
         sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS hd
  FROM cand c
  JOIN bits ba ON ba.doc_id = c.a
  JOIN bits bb ON bb.doc_id = c.b AND bb.i = ba.i
  GROUP BY c.a, c.b
)
SELECT a, b FROM ham WHERE hd <= 3
"""

# (band, chunk) bucket audit over the same bit-exact SQL signature
# recomputation as _SIMHASH_SQL (CTEs shared verbatim through `chunks`)
_SIMHASH_BAND_AUDIT_SQL = f"""
WITH {_TOK_CTE},
r AS (SELECT i FROM range(0, 64) t(i)),
nib AS (
  SELECT tok.doc_id AS doc_id, r.i AS i,
         (CASE WHEN ((strpos('0123456789abcdef',
                      substring(md5(tok.term), CAST(16 - r.i // 4 AS INT), 1)) - 1)
                     >> CAST(r.i % 4 AS INT)) & 1 = 1
               THEN 1 ELSE -1 END) * tok.tf AS sgn
  FROM tok CROSS JOIN r
),
accs AS (SELECT doc_id, i, sum(sgn) AS acc FROM nib GROUP BY doc_id, i),
bits AS (
  SELECT d.doc_id AS doc_id, r.i AS i,
         CASE WHEN coalesce(a.acc, 0) > 0 THEN 1 ELSE 0 END AS bit
  FROM documents d CROSS JOIN r
  LEFT JOIN accs a ON a.doc_id = d.doc_id AND a.i = r.i
),
chunks AS (
  SELECT doc_id, CAST(i // 16 AS BIGINT) AS band,
         CAST(sum(bit * (1 << CAST(i % 16 AS INT))) AS BIGINT) AS chunk
  FROM bits GROUP BY doc_id, i // 16
)
SELECT band, chunk, CAST(count(*) AS BIGINT) AS bucket_size,
       CAST(count(*) - {AUDIT_BUCKET_K} AS BIGINT) AS dropped
FROM chunks GROUP BY band, chunk HAVING count(*) > {AUDIT_BUCKET_K}
"""

_PLANE_VALUES = ", ".join(
    # repr(float(...)): plain-Python float repr round-trips exactly AND
    # stays valid SQL under numpy>=2 (np scalar repr became
    # 'np.float64(…)' per NEP 51)
    f"({i + 1}, {p}, {float(LSH_PLANES[i, p])!r})"
    for i in range(EMB_DIM)
    for p in range(LSH_NUM_PLANES)
)

_NEARDUP_SQL = f"""
WITH {_EMB_UNNEST},
d AS (
  SELECT ua.vec_id AS a, ub.vec_id AS b, sum(ua.v * ub.v) AS dot
  FROM u ua JOIN u ub ON ua.i = ub.i AND ua.vec_id < ub.vec_id
  GROUP BY ua.vec_id, ub.vec_id
),
c AS (
  SELECT d.a AS a, d.b AS b, d.dot / (na.nrm * nb.nrm) AS cos
  FROM d JOIN n na ON na.vec_id = d.a JOIN n nb ON nb.vec_id = d.b
  WHERE na.nrm > 0 AND nb.nrm > 0
)
SELECT a, b, {_fx('cos')} AS cos_x FROM c WHERE cos >= {NEARDUP_COS_THRESHOLD}
"""

_KNN_SQL = f"""
WITH {_EMB_UNNEST},
d AS (
  SELECT ua.vec_id AS a, ub.vec_id AS b, sum(ua.v * ub.v) AS dot
  FROM u ua JOIN u ub ON ua.i = ub.i AND ua.vec_id <> ub.vec_id
  GROUP BY ua.vec_id, ub.vec_id
),
c AS (
  SELECT d.a AS a, d.b AS b, {_fx('d.dot / (na.nrm * nb.nrm)')} AS cos_x
  FROM d JOIN n na ON na.vec_id = d.a JOIN n nb ON nb.vec_id = d.b
  WHERE na.nrm > 0 AND nb.nrm > 0
),
r AS (
  SELECT a AS vec_id, b AS nbr, cos_x,
         row_number() OVER (PARTITION BY a ORDER BY cos_x DESC, b ASC) AS rnk
  FROM c
)
SELECT vec_id, nbr, cos_x, CAST(rnk AS BIGINT) AS rnk FROM r
WHERE rnk <= {KNN_K}
"""

_NEARDUP_LSH_SQL = f"""
WITH {_EMB_UNNEST},
pl(i, p, w) AS (VALUES {_PLANE_VALUES}),
bits AS (
  SELECT u.vec_id AS vec_id, pl.p AS p,
         CASE WHEN floor(sum(u.v * pl.w) * 1000000000000.0 + 0.5) > 0 THEN 1 ELSE 0 END AS bit
  FROM u JOIN pl ON pl.i = u.i GROUP BY u.vec_id, pl.p
),
bk AS (
  SELECT vec_id, CAST(sum(bit * (1 << CAST(p AS INT))) AS BIGINT) AS bucket
  FROM bits GROUP BY vec_id
),
d AS (
  SELECT ua.vec_id AS a, ub.vec_id AS b, sum(ua.v * ub.v) AS dot
  FROM u ua
  JOIN u ub ON ua.i = ub.i AND ua.vec_id < ub.vec_id
  JOIN bk ba ON ba.vec_id = ua.vec_id
  JOIN bk bb ON bb.vec_id = ub.vec_id AND bb.bucket = ba.bucket
  GROUP BY ua.vec_id, ub.vec_id
),
c AS (
  SELECT d.a AS a, d.b AS b, d.dot / (na.nrm * nb.nrm) AS cos
  FROM d JOIN n na ON na.vec_id = d.a JOIN n nb ON nb.vec_id = d.b
  WHERE na.nrm > 0 AND nb.nrm > 0
)
SELECT a, b, {_fx('cos')} AS cos_x FROM c WHERE cos >= {NEARDUP_COS_THRESHOLD}
"""

_ANN_LSH_SQL = f"""
WITH {_EMB_UNNEST},
pl(i, p, w) AS (VALUES {_PLANE_VALUES}),
bits AS (
  SELECT u.vec_id AS vec_id, pl.p AS p,
         CASE WHEN floor(sum(u.v * pl.w) * 1000000000000.0 + 0.5) > 0 THEN 1 ELSE 0 END AS bit
  FROM u JOIN pl ON pl.i = u.i GROUP BY u.vec_id, pl.p
),
bk AS (
  SELECT vec_id, CAST(sum(bit * (1 << CAST(p AS INT))) AS BIGINT) AS bucket
  FROM bits GROUP BY vec_id
),
d AS (
  SELECT uq.vec_id AS query_vec, ub.vec_id AS vec_id, sum(uq.v * ub.v) AS dot
  FROM u uq
  JOIN u ub ON ub.i = uq.i AND ub.vec_id <> uq.vec_id
  JOIN bk bq ON bq.vec_id = uq.vec_id
  JOIN bk bb ON bb.vec_id = ub.vec_id AND bb.bucket = bq.bucket
  WHERE uq.vec_id IN {ANN_QUERY_IDS}
  GROUP BY uq.vec_id, ub.vec_id
),
c AS (
  SELECT d.query_vec, d.vec_id, d.dot / (nq.nrm * nb.nrm) AS cos
  FROM d JOIN n nq ON nq.vec_id = d.query_vec JOIN n nb ON nb.vec_id = d.vec_id
  WHERE nq.nrm > 0 AND nb.nrm > 0
),
ranked AS (
  SELECT query_vec, vec_id, {_fx('cos')} AS cos_x,
         row_number() OVER (PARTITION BY query_vec
                            ORDER BY {_fx('cos')} DESC, vec_id ASC) AS rank
  FROM c
)
SELECT query_vec, rank, vec_id, cos_x FROM ranked WHERE rank <= 10
"""

_ANN_SQL = f"""
WITH {_EMB_UNNEST},
d AS (
  SELECT uq.vec_id AS query_vec, ub.vec_id AS vec_id, sum(uq.v * ub.v) AS dot
  FROM u uq JOIN u ub ON ub.i = uq.i AND ub.vec_id <> uq.vec_id
  WHERE uq.vec_id IN {ANN_QUERY_IDS}
  GROUP BY uq.vec_id, ub.vec_id
),
c AS (
  SELECT d.query_vec, d.vec_id, d.dot / (nq.nrm * nb.nrm) AS cos
  FROM d JOIN n nq ON nq.vec_id = d.query_vec JOIN n nb ON nb.vec_id = d.vec_id
  WHERE nq.nrm > 0 AND nb.nrm > 0
),
ranked AS (
  SELECT query_vec, vec_id, {_fx('cos')} AS cos_x,
         row_number() OVER (PARTITION BY query_vec
                            ORDER BY {_fx('cos')} DESC, vec_id ASC) AS rank
  FROM c
)
SELECT query_vec, rank, vec_id, cos_x FROM ranked WHERE rank <= 10
"""

_ANN_RANGE_SQL = f"""
WITH {_EMB_UNNEST},
d AS (
  SELECT uq.vec_id AS query_vec, ub.vec_id AS vec_id, sum(uq.v * ub.v) AS dot
  FROM u uq JOIN u ub ON ub.i = uq.i AND ub.vec_id <> uq.vec_id
  WHERE uq.vec_id IN {ANN_QUERY_IDS}
  GROUP BY uq.vec_id, ub.vec_id
),
c AS (
  SELECT d.query_vec, d.vec_id, d.dot / (nq.nrm * nb.nrm) AS cos
  FROM d JOIN n nq ON nq.vec_id = d.query_vec JOIN n nb ON nb.vec_id = d.vec_id
  WHERE nq.nrm > 0 AND nb.nrm > 0
)
SELECT query_vec, vec_id, {_fx('cos')} AS cos_x
FROM c WHERE {_fx('cos')} >= {ANN_RANGE_TAU_X}
"""


def _ivf_fasg_ctes(nlist: int, niter: int, with_prefix: bool = True) -> str:
    """WITH-chain re-deriving the engine's k-means centroids from the
    data and the final cell assignment (``fasg``) — init = embeddings of
    vec_id < nlist, then ``niter`` chained Lloyd iterations (assignment
    by fixed-point-rounded squared L2, per-dim coordinate sums rounded to
    the 1e6 grid before the mean, empty cells keep the previous centroid
    via LEFT JOIN + COALESCE). Every cross-implementation float
    comparison goes through the same fixed-point grids as stages/ann.py
    (IVF_DIST_SCALE / IVF_SUM_SCALE). Shared by the IVF-ANN and
    kmeans-clustering oracles."""
    # with_prefix=False lets the chain append to another WITH-chain that
    # already defined the shared ``u`` unnest (the IVF+PQ composition)
    ctes = [f"WITH {_EMB_UNNEST}," if with_prefix else ","]
    ctes.append(
        f"cent0 AS (SELECT vec_id AS cell, i, v AS c FROM u "
        f"WHERE vec_id < {nlist})"
    )
    prev = "cent0"
    for it in range(1, niter + 1):
        ctes.append(f""",
dist{it} AS (
  SELECT u.vec_id AS vec_id, p.cell AS cell,
         floor(sum((u.v - p.c) * (u.v - p.c)) * 1000000000.0 + 0.5) AS dx
  FROM u JOIN {prev} p ON p.i = u.i
  GROUP BY u.vec_id, p.cell
),
asg{it} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dx ASC, cell ASC) AS rn
    FROM dist{it}) t WHERE rn = 1
),
sums{it} AS (
  SELECT a.cell AS cell, u.i AS i,
         floor(sum(u.v) * 1000000.0 + 0.5) AS sx, count(*) AS cnt
  FROM u JOIN asg{it} a ON a.vec_id = u.vec_id
  GROUP BY a.cell, u.i
),
cent{it} AS (
  SELECT p.cell AS cell, p.i AS i,
         COALESCE(s.sx / (s.cnt * 1000000.0), p.c) AS c
  FROM {prev} p LEFT JOIN sums{it} s ON s.cell = p.cell AND s.i = p.i
)""")
        prev = f"cent{it}"
    ctes.append(f""",
fdist AS (
  SELECT u.vec_id AS vec_id, p.cell AS cell,
         floor(sum((u.v - p.c) * (u.v - p.c)) * 1000000000.0 + 0.5) AS dx
  FROM u JOIN {prev} p ON p.i = u.i
  GROUP BY u.vec_id, p.cell
),
fasg AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dx ASC, cell ASC) AS rn
    FROM fdist) t WHERE rn = 1
)""")
    return "".join(ctes)


def _kmeans_sql(nlist: int = IVF_NLIST, niter: int = IVF_NITER) -> str:
    """k-means clustering oracle: identical centroid derivation as the
    IVF chain, final per-vector assignment only."""
    return _ivf_fasg_ctes(nlist, niter) + """
SELECT vec_id, cell AS cluster FROM fasg"""


def _ivf_sql(nlist: int = IVF_NLIST, nprobe: int = IVF_NPROBE,
             niter: int = IVF_NITER, k: int = 10) -> str:
    """IVF ANN oracle: the shared centroid/assignment chain
    (:func:`_ivf_fasg_ctes`), then probes the ``nprobe`` nearest cells
    per query and ranks cosine top-``k``."""
    return _ivf_fasg_ctes(nlist, niter) + f""",
qdist AS (
  SELECT vec_id AS query_vec, cell, dx FROM fdist
  WHERE vec_id IN {ANN_QUERY_IDS}
),
probe AS (
  SELECT query_vec, cell FROM (
    SELECT query_vec, cell,
           row_number() OVER (PARTITION BY query_vec
                              ORDER BY dx ASC, cell ASC) AS rn
    FROM qdist) t WHERE rn <= {nprobe}
),
d AS (
  SELECT pr.query_vec AS query_vec, a.vec_id AS vec_id,
         sum(uq.v * ub.v) AS dot
  FROM probe pr
  JOIN fasg a ON a.cell = pr.cell
  JOIN u uq ON uq.vec_id = pr.query_vec
  JOIN u ub ON ub.vec_id = a.vec_id AND ub.i = uq.i
  WHERE a.vec_id <> pr.query_vec
  GROUP BY pr.query_vec, a.vec_id
),
c AS (
  SELECT d.query_vec, d.vec_id, d.dot / (nq.nrm * nb.nrm) AS cos
  FROM d JOIN n nq ON nq.vec_id = d.query_vec
         JOIN n nb ON nb.vec_id = d.vec_id
  WHERE nq.nrm > 0 AND nb.nrm > 0
),
ranked AS (
  SELECT query_vec, vec_id, {_fx('cos')} AS cos_x,
         row_number() OVER (PARTITION BY query_vec
                            ORDER BY {_fx('cos')} DESC, vec_id ASC) AS rank
  FROM c
)
SELECT query_vec, rank, vec_id, cos_x FROM ranked WHERE rank <= {k}"""


def _pq_ctes(nsub: int, ksub: int, niter: int, dim: int = 64) -> str:
    """WITH-chain re-deriving the engine's product-quantization codebooks
    and per-vector codes: per subspace ``j`` the same Lloyd chain as
    :func:`_ivf_fasg_ctes` runs over the subvector slice (``u`` rows with
    i in subspace j; the unnest index ``i`` is 1-based), ending in the
    final assignment ``p{j}fa`` (vec_id → code). Fixed-point grids match
    stages/ann.py (IVF_DIST_SCALE / IVF_SUM_SCALE)."""
    subdim = dim // nsub
    ctes = [f"WITH {_EMB_UNNEST}"]
    for j in range(nsub):
        lo, hi = j * subdim, (j + 1) * subdim
        ctes.append(
            f""",
u{j} AS MATERIALIZED (SELECT vec_id, i, v FROM u WHERE i > {lo} AND i <= {hi}),
p{j}c0 AS MATERIALIZED (SELECT vec_id AS cell, i, v AS c FROM u{j} WHERE vec_id < {ksub})"""
        )
        prev = f"p{j}c0"
        for it in range(1, niter + 1):
            ctes.append(f""",
p{j}d{it} AS MATERIALIZED (
  SELECT u.vec_id AS vec_id, p.cell AS cell,
         floor(sum((u.v - p.c) * (u.v - p.c)) * 1000000000.0 + 0.5) AS dx
  FROM u{j} u JOIN {prev} p ON p.i = u.i
  GROUP BY u.vec_id, p.cell
),
p{j}a{it} AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dx ASC, cell ASC) AS rn
    FROM p{j}d{it}) t WHERE rn = 1
),
p{j}s{it} AS MATERIALIZED (
  SELECT a.cell AS cell, u.i AS i,
         floor(sum(u.v) * 1000000.0 + 0.5) AS sx, count(*) AS cnt
  FROM u{j} u JOIN p{j}a{it} a ON a.vec_id = u.vec_id
  GROUP BY a.cell, u.i
),
p{j}c{it} AS MATERIALIZED (
  SELECT p.cell AS cell, p.i AS i,
         COALESCE(s.sx / (s.cnt * 1000000.0), p.c) AS c
  FROM {prev} p LEFT JOIN p{j}s{it} s ON s.cell = p.cell AND s.i = p.i
)""")
            prev = f"p{j}c{it}"
        ctes.append(f""",
p{j}fd AS MATERIALIZED (
  SELECT u.vec_id AS vec_id, p.cell AS cell,
         floor(sum((u.v - p.c) * (u.v - p.c)) * 1000000000.0 + 0.5) AS dx
  FROM u{j} u JOIN {prev} p ON p.i = u.i
  GROUP BY u.vec_id, p.cell
),
p{j}fa AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dx ASC, cell ASC) AS rn
    FROM p{j}fd) t WHERE rn = 1
)""")
    return "".join(ctes)


def _pq_codes_sql(nsub: int = PQ_NSUB, ksub: int = PQ_KSUB,
                  niter: int = PQ_NITER) -> str:
    """PQ encode oracle: per-subspace codebook derivation, final
    assignment per vector → one code column per subspace."""
    cols = ", ".join(f"p{j}fa.cell AS code_s{j}" for j in range(nsub))
    joins = "".join(
        f" JOIN p{j}fa ON p{j}fa.vec_id = p0fa.vec_id"
        for j in range(1, nsub)
    )
    return _pq_ctes(nsub, ksub, niter) + f"""
SELECT p0fa.vec_id AS vec_id, {cols} FROM p0fa{joins}"""


def _pq_topk_sql(nsub: int = PQ_NSUB, ksub: int = PQ_KSUB,
                 niter: int = PQ_NITER, k: int = 10) -> str:
    """PQ ADC top-k oracle: per-query rounded subspace distance tables
    (exact query subvectors vs final codebooks), candidate distance =
    integer table lookups summed via the code joins, ties to the smaller
    vec_id."""
    qts = "".join(f""",
qt{j} AS MATERIALIZED (
  SELECT u.vec_id AS query_vec, p.cell AS cell,
         floor(sum((u.v - p.c) * (u.v - p.c)) * 1000000000.0 + 0.5) AS dx
  FROM u{j} u JOIN p{j}c{niter} p ON p.i = u.i
  WHERE u.vec_id IN {ANN_QUERY_IDS}
  GROUP BY u.vec_id, p.cell
)""" for j in range(nsub))
    joins = "".join(
        f"\n  JOIN p{j}fa f{j} ON f{j}.vec_id = f0.vec_id"
        for j in range(1, nsub)
    ) + "".join(
        f"\n  JOIN qt{j} q{j} ON q{j}.cell = f{j}.cell"
        + (" AND q%d.query_vec = q0.query_vec" % j if j else "")
        for j in range(nsub)
    )
    dist = " + ".join(f"q{j}.dx" for j in range(nsub))
    return _pq_ctes(nsub, ksub, niter) + qts + f""",
ad AS (
  SELECT q0.query_vec AS query_vec, f0.vec_id AS vec_id,
         CAST({dist} AS BIGINT) AS ad_x
  FROM p0fa f0{joins}
  WHERE f0.vec_id <> q0.query_vec
),
ranked AS (
  SELECT query_vec, vec_id, ad_x,
         row_number() OVER (PARTITION BY query_vec
                            ORDER BY ad_x ASC, vec_id ASC) AS rank
  FROM ad
)
SELECT query_vec, rank, vec_id, ad_x FROM ranked WHERE rank <= {k}"""


def _ivfpq_sql(nlist: int = IVF_NLIST, nprobe: int = IVF_NPROBE,
               niter: int = IVF_NITER, nsub: int = PQ_NSUB,
               ksub: int = PQ_KSUB, pq_niter: int = PQ_NITER,
               k: int = 10) -> str:
    """IVF+PQ ANN oracle: the PQ codebook/code chain and the IVF
    centroid/assignment chain run over the same shared ``u`` unnest,
    then the ADC distance joins of the PQ oracle are additionally
    constrained to candidates whose IVF cell is among the query's
    ``nprobe`` probed cells — exactly the engine's pruning."""
    qts = "".join(f""",
qt{j} AS MATERIALIZED (
  SELECT u.vec_id AS query_vec, p.cell AS cell,
         floor(sum((u.v - p.c) * (u.v - p.c)) * 1000000000.0 + 0.5) AS dx
  FROM u{j} u JOIN p{j}c{pq_niter} p ON p.i = u.i
  WHERE u.vec_id IN {ANN_QUERY_IDS}
  GROUP BY u.vec_id, p.cell
)""" for j in range(nsub))
    joins = "".join(
        f"\n  JOIN p{j}fa f{j} ON f{j}.vec_id = f0.vec_id"
        for j in range(1, nsub)
    ) + "".join(
        f"\n  JOIN qt{j} q{j} ON q{j}.cell = f{j}.cell"
        + (" AND q%d.query_vec = q0.query_vec" % j if j else "")
        for j in range(nsub)
    )
    dist = " + ".join(f"q{j}.dx" for j in range(nsub))
    return (
        _pq_ctes(nsub, ksub, pq_niter)
        + _ivf_fasg_ctes(nlist, niter, with_prefix=False)
        + qts
        + f""",
qdist AS (
  SELECT vec_id AS query_vec, cell, dx FROM fdist
  WHERE vec_id IN {ANN_QUERY_IDS}
),
probe AS (
  SELECT query_vec, cell FROM (
    SELECT query_vec, cell,
           row_number() OVER (PARTITION BY query_vec
                              ORDER BY dx ASC, cell ASC) AS rn
    FROM qdist) t WHERE rn <= {nprobe}
),
ad AS (
  SELECT q0.query_vec AS query_vec, f0.vec_id AS vec_id,
         CAST({dist} AS BIGINT) AS ad_x
  FROM p0fa f0{joins}
  JOIN fasg fa ON fa.vec_id = f0.vec_id
  JOIN probe pr ON pr.query_vec = q0.query_vec AND pr.cell = fa.cell
  WHERE f0.vec_id <> q0.query_vec
),
ranked AS (
  SELECT query_vec, vec_id, ad_x,
         row_number() OVER (PARTITION BY query_vec
                            ORDER BY ad_x ASC, vec_id ASC) AS rank
  FROM ad
)
SELECT query_vec, rank, vec_id, ad_x FROM ranked WHERE rank <= {k}"""
    )


def _sentence_bm25_sql(k1: float = 1.5, b: float = 0.75,
                       cand: int = 100, k: int = 10) -> str:
    """Sentence-granularity BM25 (reference compat) → top-``cand``
    sentences → first-occurrence doc dedup → top-``k`` docs; mirrors
    q_sentence_bm25 exactly (sk = doc_id*SENT_FACTOR + sent_idx is the
    tie-break key, same as the zero-padded url)."""
    toks = TOKLIST.format(col="s")
    return f"""
WITH sp AS (SELECT doc_id, lang, string_split(text, '.') AS parts FROM documents),
su AS (SELECT doc_id, lang, unnest(parts) AS sent,
              unnest(range(0, len(parts))) AS sent_idx FROM sp),
sent AS (
  SELECT doc_id * {SENT_FACTOR} + sent_idx AS sk, lang, trim(sent) AS s
  FROM su WHERE trim(sent) <> ''
),
stok AS (SELECT sk, lang, term, count(*) AS tf FROM
         (SELECT sk, lang, unnest({toks}) AS term FROM sent)
         GROUP BY sk, lang, term),
sdl AS (SELECT sk, lang, len({toks}) AS dl FROM sent),
sstats AS (SELECT lang, count(*) AS n_docs, avg(dl) AS avgdl FROM sdl GROUP BY lang),
sdf AS (SELECT lang, term, count(*) AS df FROM stok GROUP BY lang, term),
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup=True)}),
scores AS (
  SELECT q.query_id AS query_id, stok.sk AS sk,
         sum( q.w * ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (stok.tf * ({k1} + 1))
              / (stok.tf + {k1}*(1 - {b} + d.dl / st.avgdl)) ) AS score
  FROM q
  JOIN stok ON stok.lang = q.lang AND stok.term = q.term
  JOIN sdf df ON df.lang = q.lang AND df.term = q.term
  JOIN sdl d ON d.sk = stok.sk
  JOIN sstats st ON st.lang = q.lang
  GROUP BY q.query_id, stok.sk
),
sranked AS (
  SELECT query_id, sk, {_fx('score')} AS score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, sk ASC) AS srank
  FROM scores WHERE score > 0
),
s_top AS (SELECT * FROM sranked WHERE srank <= {cand}),
docfirst AS (
  SELECT query_id, sk // {SENT_FACTOR} AS doc_id, min(srank) AS first_rank
  FROM s_top GROUP BY query_id, sk // {SENT_FACTOR}
),
final AS (
  SELECT f.query_id AS query_id, f.doc_id AS doc_id, r.score_x AS score_x,
         row_number() OVER (PARTITION BY f.query_id
                            ORDER BY f.first_rank ASC) AS rank
  FROM docfirst f
  JOIN s_top r ON r.query_id = f.query_id AND r.srank = f.first_rank
)
SELECT query_id, rank, doc_id, score_x FROM final WHERE rank <= {k}
"""


def _langid_sql() -> str:
    hits = ",\n  ".join(
        f"len(list_filter(l, x -> list_contains({_sql_list(LANG_MARKERS[lang])}, x))) AS hits_{lang}"
        for lang in sorted(LANG_MARKERS)
    )
    langs = sorted(LANG_MARKERS)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"hits_{lang} >= hits_{other}" for other in langs[i + 1:]]
        if conds:
            cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
        else:
            cases.append(f"ELSE '{lang}'")
    hit_cols = ", ".join(f"hits_{lang}" for lang in langs)
    return f"""
WITH {_TOKS_CTE},
h AS (SELECT doc_id,
  {hits}
FROM toks)
SELECT doc_id, {hit_cols},
  CASE {' '.join(cases)} END AS pred_lang
FROM h
"""


def _token_stats_sql() -> str:
    stop = _sql_list(EN_SQL_STOPWORDS)
    mean = "tok_chars/CAST(n_tokens AS DOUBLE)"
    ratio = "stop_hits/CAST(n_tokens AS DOUBLE)"
    quality = (
        f"0.5*least(n_tokens,100)/100.0 + 0.3*(1 - {ratio}) "
        f"+ 0.2*least({mean},10.0)/10.0"
    )
    return f"""
WITH {_TOKS_CTE},
s AS (
  SELECT doc_id, len(l) AS n_tokens, len(array_to_string(l, '')) AS tok_chars,
         len(list_filter(l, x -> list_contains({stop}, x))) AS stop_hits
  FROM toks
)
SELECT doc_id, n_tokens, tok_chars,
  CASE WHEN n_tokens = 0 THEN 0 ELSE {_fx(mean)} END AS mean_tok_len_x,
  CASE WHEN n_tokens = 0 THEN 0 ELSE {_fx(ratio)} END AS stop_ratio_x,
  CASE WHEN n_tokens = 0 THEN 0 ELSE {_fx(quality)} END AS quality_x
FROM s
"""


def _phrase_sql() -> str:
    """Positional-intersection phrase oracle: zip-unnest tokens with
    1-based positions; a candidate start sp in a doc matches phrase P
    when every (i, term) of P has a token at position sp + i — i.e. the
    (phrase, doc, sp) group collects count(DISTINCT i) == len(P) hits
    (DISTINCT so a repeated phrase term can't double-count one slot)."""
    rows = []
    for pid, p in PHRASESET:
        for i, w in enumerate(p.split()):
            rows.append(f"('{pid}', {i}, '{w}')")
    return f"""
WITH {_TOKS_CTE},
pos AS (SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l)+1)) AS p FROM toks),
ph(phrase_id, i, term) AS (VALUES {", ".join(rows)}),
phl AS (SELECT phrase_id, count(*) AS plen FROM ph GROUP BY phrase_id),
m AS (
  SELECT ph.phrase_id AS phrase_id, pos.doc_id AS doc_id, pos.p - ph.i AS sp,
         count(DISTINCT ph.i) AS nhit
  FROM ph JOIN pos ON pos.term = ph.term
  GROUP BY ph.phrase_id, pos.doc_id, pos.p - ph.i
)
SELECT m.phrase_id AS phrase_id, m.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_matches
FROM m JOIN phl ON phl.phrase_id = m.phrase_id
WHERE m.nhit = phl.plen
GROUP BY m.phrase_id, m.doc_id
"""


def _phrase_snippets_sql() -> str:
    """KWIC oracle: first match start per (phrase, doc) = min over the
    same positional-intersection m CTE as _phrase_sql; the snippet is a
    1-based inclusive list_slice of the token list (identical window to
    the engine's 0-based half-open slice)."""
    rows = []
    for pid, p in PHRASESET:
        for i, w in enumerate(p.split()):
            rows.append(f"('{pid}', {i}, '{w}')")
    return f"""
WITH {_TOKS_CTE},
pos AS (SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l)+1)) AS p FROM toks),
ph(phrase_id, i, term) AS (VALUES {", ".join(rows)}),
phl AS (SELECT phrase_id, count(*) AS plen FROM ph GROUP BY phrase_id),
m AS (
  SELECT ph.phrase_id AS phrase_id, pos.doc_id AS doc_id, pos.p - ph.i AS sp,
         count(DISTINCT ph.i) AS nhit
  FROM ph JOIN pos ON pos.term = ph.term
  GROUP BY ph.phrase_id, pos.doc_id, pos.p - ph.i
),
firsts AS (
  SELECT m.phrase_id AS phrase_id, m.doc_id AS doc_id, min(m.sp) AS sp,
         any_value(phl.plen) AS plen
  FROM m JOIN phl ON phl.phrase_id = m.phrase_id
  WHERE m.nhit = phl.plen
  GROUP BY m.phrase_id, m.doc_id
)
SELECT f.phrase_id AS phrase_id, f.doc_id AS doc_id,
       array_to_string(
         list_slice(t.l, greatest(f.sp - {SNIPPET_CTX}, 1),
                    least(f.sp + f.plen - 1 + {SNIPPET_CTX}, len(t.l))),
         ' ') AS snippet
FROM firsts f JOIN toks t ON t.doc_id = f.doc_id
"""


_SPANS_CTE = f"""
spans AS (
  SELECT doc_id, unnest(list_transform(range(1, len(l) - {SPAN_N - 2}),
           i -> array_to_string(list_slice(l, i, i + {SPAN_N - 1}), ' '))) AS sp
  FROM toks WHERE len(l) >= {SPAN_N}
)"""

_DUP_SPANS_SQL = f"""
WITH {_TOKS_CTE}, {_SPANS_CTE},
g AS (SELECT md5(sp) AS span_hash, count(DISTINCT doc_id) AS n_docs,
             count(*) AS n_occ
      FROM spans GROUP BY md5(sp))
SELECT span_hash, n_docs, n_occ FROM g WHERE n_docs >= 2
"""

_DUP_SPAN_DOCS_SQL = f"""
WITH {_TOKS_CTE}, {_SPANS_CTE},
g AS (SELECT sp, count(DISTINCT doc_id) AS ndocs FROM spans GROUP BY sp)
SELECT s.doc_id AS doc_id, count(*) AS n_spans,
       CAST(sum(CASE WHEN g.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans
FROM spans s JOIN g ON g.sp = s.sp
GROUP BY s.doc_id
"""

_REP_QUALITY_SQL = f"""
WITH {_TOKS_CTE},
big AS (SELECT doc_id, unnest(list_transform(range(1, len(l)),
          i -> array_to_string(list_slice(l, i, i + 1), ' '))) AS bg
        FROM toks WHERE len(l) >= 2),
bigc AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg),
bagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb, max(c) AS maxc
         FROM bigc GROUP BY doc_id),
tri AS (SELECT doc_id, unnest(list_transform(range(1, len(l) - 1),
          i -> array_to_string(list_slice(l, i, i + 2), ' '))) AS tg
        FROM toks WHERE len(l) >= 3),
tagg AS (SELECT doc_id, count(*) AS nt, count(DISTINCT tg) AS ndt
         FROM tri GROUP BY doc_id)
SELECT b.doc_id AS doc_id, b.nb AS n_bigrams,
       {_fx('maxc * 1.0 / nb')} AS top2gram_frac_x,
       COALESCE({_fx('1.0 - ndt * 1.0 / nt')}, 0) AS dup3gram_frac_x
FROM bagg b LEFT JOIN tagg t ON t.doc_id = b.doc_id
"""

_STRAT_CASE = " ".join(
    f"WHEN '{lang}' THEN '{th}'" for lang, th in sorted(STRAT_RATES.items())
)

_LM_SCORE_SQL = f"""
WITH {_TOKS_CTE},
big AS (SELECT doc_id, lang,
               unnest(list_transform(range(1, len(l)), i -> l[i])) AS w1,
               unnest(list_transform(range(1, len(l)), i -> l[i + 1])) AS w2
        FROM toks WHERE len(l) >= 2),
docbig AS (SELECT doc_id, lang, w1, w2, count(*) AS c FROM big
           GROUP BY doc_id, lang, w1, w2),
c1t AS (SELECT lang, w1, CAST(sum(c) AS BIGINT) AS c1 FROM docbig
        GROUP BY lang, w1),
c12t AS (SELECT lang, w1, w2, CAST(sum(c) AS BIGINT) AS c12 FROM docbig
         GROUP BY lang, w1, w2),
vt AS (SELECT lang, count(DISTINCT w1) AS v FROM big GROUP BY lang),
lp AS (SELECT d.doc_id AS doc_id, d.c AS c,
              CAST(floor(ln((c12t.c12 + 1.0) / (c1t.c1 + vt.v))
                         * {LM_SCALE}.0 + 0.5) AS BIGINT) * d.c AS lpx
       FROM docbig d
       JOIN c1t ON c1t.lang = d.lang AND c1t.w1 = d.w1
       JOIN c12t ON c12t.lang = d.lang AND c12t.w1 = d.w1
                AND c12t.w2 = d.w2
       JOIN vt ON vt.lang = d.lang)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(sum(lpx) AS BIGINT) AS logprob_x
FROM lp GROUP BY doc_id
"""

# exact percentiles over the (lang, dl) value histogram; threshold =
# ceil(p% of total) — the float quotient (p*tot)/100.0 is never within
# 1/100 of a wrong integer, so ceil matches the engine's integer math
_DL_PCT_COLS = ",\n  ".join(
    f"min(CASE WHEN cum >= ceil(({p} * tot) / 100.0) THEN dl END) AS p{p}"
    for p in DL_PCTS
)
_DL_PCT_SQL = f"""
WITH {_DL_CTE},
h AS (SELECT lang, dl, count(*) AS n FROM dl GROUP BY lang, dl),
c AS (SELECT lang, dl,
        sum(n) OVER (PARTITION BY lang ORDER BY dl) AS cum,
        sum(n) OVER (PARTITION BY lang) AS tot
      FROM h)
SELECT lang,
  {_DL_PCT_COLS}
FROM c GROUP BY lang
"""

# HyperLogLog recomputed bit-for-bit: md5 register/rho from hex chars, the
# harmonic sum as an EXACT BIGINT (2^(49-rho) per register, absent = 2^49,
# max 2^57), one CAST→DOUBLE, one division by 2^49 (exact power-of-two
# scaling commutes with double rounding, so it equals the engine's
# correctly-rounded python int division)
_HLL_RHO_CASE = """
CASE WHEN z0 = 12 THEN 49
     ELSE 4 * z0 + 1 +
       CASE WHEN substring(tail, z0 + 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 0
            WHEN substring(tail, z0 + 1, 1) IN ('4','5','6','7') THEN 1
            WHEN substring(tail, z0 + 1, 1) IN ('2','3') THEN 2
            ELSE 3 END
END"""
_HLL_SQL = f"""
WITH tt AS (SELECT DISTINCT lang, unnest({TOKLIST.format(col='text')}) AS term
            FROM documents),
h AS (SELECT lang, md5(term) AS hx FROM tt),
z AS (SELECT lang,
        (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS reg,
        substring(hx, 3, 12) AS tail,
        length(regexp_extract(substring(hx, 3, 12), '^0*')) AS z0
      FROM h),
r AS (SELECT lang, reg, {_HLL_RHO_CASE} AS rho FROM z),
rm AS (SELECT lang, reg, max(rho) AS mr FROM r GROUP BY lang, reg),
s AS (SELECT lang, count(*) AS np,
        sum(CAST(1 AS BIGINT) << (49 - mr)) AS sp
      FROM rm GROUP BY lang),
e AS (SELECT lang, 256 - np AS v,
        CAST({HLL_ALPHA!r} AS DOUBLE) * 65536.0 /
        (CAST(sp + (CAST(256 - np AS BIGINT) << 49) AS DOUBLE)
         / 562949953421312.0) AS e_raw
      FROM s)
SELECT lang,
  CAST(CASE WHEN e_raw <= 640.0 AND v > 0
            THEN floor(256.0 * ln(256.0 / v) + 0.5)
            ELSE floor(e_raw + 0.5) END AS BIGINT) AS hll_est
FROM e
"""

_TOP_PER_GROUP_SQL = f"""
WITH {_DL_CTE},
r AS (SELECT lang, doc_id, dl,
        row_number() OVER (PARTITION BY lang ORDER BY dl DESC, doc_id) AS rnk
      FROM dl)
SELECT lang, doc_id, dl, rnk FROM r WHERE rnk <= {TOPGROUP_K}
"""

_BPE_SQL = f"""
WITH {_DL_CTE},
b AS (SELECT doc_id,
        CAST(len(regexp_extract_all(lower(text), '{BPE_PAT}')) AS BIGINT)
          AS n_bpe
      FROM documents)
SELECT b.doc_id AS doc_id, b.n_bpe AS n_bpe,
       CAST(CASE WHEN dl.dl = 0 THEN 0
                 ELSE floor((10000.0 * b.n_bpe) / dl.dl + 0.5)
            END AS BIGINT) AS fertility_x
FROM b JOIN dl ON dl.doc_id = b.doc_id
"""

_DECON_VALUES = ", ".join(f"('{s}')" for s in DECON_EVAL_SPANS)
_DECON_SQL = f"""
WITH {_TOKS_CTE},
sp3 AS (SELECT doc_id,
          unnest(list_transform(range(1, len(l) - {DECON_N - 2}),
            i -> array_to_string(list_slice(l, i, i + {DECON_N - 1}), ' ')))
          AS sp
        FROM toks WHERE len(l) >= {DECON_N}),
ev(sp) AS (VALUES {_DECON_VALUES})
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_hits
FROM sp3 JOIN ev USING (sp) GROUP BY doc_id
"""

_SPELL_SQL = f"""
WITH {_TOK_CTE}, {_DF_CTE},
v AS (SELECT term, df FROM df WHERE lang = 'en'),
mq AS (
  SELECT DISTINCT substr(term, 1, 1) || substr(term, 3) AS misspelled FROM (
    SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS rn
    FROM v WHERE len(term) >= {SPELL_MIN_LEN}
  ) WHERE rn <= {SPELL_NQ}
),
cand AS (
  SELECT mq.misspelled, v.term AS suggestion, v.df
  FROM mq JOIN v ON levenshtein(mq.misspelled, v.term) <= 1
),
ranked AS (
  SELECT misspelled, suggestion, df,
         row_number() OVER (PARTITION BY misspelled
                            ORDER BY df DESC, suggestion ASC) AS rank
  FROM cand
)
SELECT misspelled, suggestion, df, rank FROM ranked WHERE rank <= {SPELL_TOPK}
"""

_FACET_SQL = f"""
WITH res AS ({{bm25}})
SELECT res.query_id AS query_id, d.source AS source,
       CAST(count(*) AS BIGINT) AS n_docs
FROM res JOIN documents d ON d.doc_id = res.doc_id
GROUP BY res.query_id, d.source
"""

_QEXP_SQL = f"""
WITH res AS ({{bm25}}),
cand AS (SELECT query_id, doc_id FROM res WHERE rank <= {QEXP_DOCS}),
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup=True)}),
ql AS (SELECT DISTINCT query_id, lang FROM q),
{_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
idfx AS (
  SELECT df.lang, df.term,
         {_fx('ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))')} AS idf_x
  FROM df JOIN stats s ON s.lang = df.lang
),
exp AS (
  SELECT c.query_id AS query_id, tok.term AS term,
         CAST(sum(tok.tf) AS BIGINT) * i.idf_x AS score_x
  FROM cand c
  JOIN ql ON ql.query_id = c.query_id
  JOIN tok ON tok.doc_id = c.doc_id AND tok.lang = ql.lang
  JOIN idfx i ON i.lang = ql.lang AND i.term = tok.term
  LEFT JOIN q ON q.query_id = c.query_id AND q.term = tok.term
  WHERE q.term IS NULL
  GROUP BY c.query_id, tok.term, i.idf_x
),
ranked AS (
  SELECT query_id, term, score_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_x DESC, term ASC) AS rank
  FROM exp
)
SELECT query_id, term, score_x, rank FROM ranked WHERE rank <= {QEXP_TOPK}
"""

def _pagerank_sql() -> str:
    """Integer-PageRank oracle: the stages/graph.py recurrence unrolled
    PAGERANK_ITERS times as chained CTEs (the Lloyd-chain idiom) — all
    quantities integral, so summation order can't matter."""
    from ..stages.graph import (
        PAGERANK_DAMP_DEN,
        PAGERANK_DAMP_NUM,
        PAGERANK_SCALE,
    )

    tele = PAGERANK_DAMP_DEN - PAGERANK_DAMP_NUM
    steps = []
    prev = "s0"
    for t in range(1, PAGERANK_ITERS + 1):
        steps.append(f"""
s{t} AS (
  SELECT e.dst AS n,
         CAST(({tele} * (SELECT b0 FROM base)
               + {PAGERANK_DAMP_NUM} * sum({prev}.s // d.deg))
              // {PAGERANK_DAMP_DEN} AS BIGINT) AS s
  FROM edges e JOIN {prev} ON {prev}.n = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)""")
        prev = f"s{t}"
    return f"""
WITH
pairs AS (SELECT a, b FROM ({_MINHASH_SQL}) mh),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
base AS (SELECT CAST({PAGERANK_SCALE} AS BIGINT) // count(*) AS b0
         FROM deg),
s0 AS (SELECT src AS n, (SELECT b0 FROM base) AS s FROM deg),
{", ".join(steps)},
r AS (SELECT n AS doc_id, s AS pr,
             row_number() OVER (ORDER BY s DESC, n ASC) AS rnk
      FROM {prev})
SELECT doc_id, pr, CAST(rnk AS BIGINT) AS rnk FROM r
WHERE rnk <= {PAGERANK_TOPN}
"""


def _over_survivors(sql: str) -> str:
    """Re-point an oracle's ``documents`` references at the surviving
    corpus (``main.documents`` minus the deleted sources) by shadowing
    the view name with a CTE — the injected CTE must reference the view
    schema-qualified or DuckDB reports a circular CTE."""
    return sql.replace(
        "\nWITH ",
        "\nWITH documents AS "
        f"(SELECT * FROM main.documents WHERE NOT ({_DELETED_PRED})), ",
        1,
    )


ORACLE_SQL = {
    "spell_correct": _SPELL_SQL,
    "dense_rerank": _dense_rerank_sql(),
    "dense_rerank_mlp": _dense_rerank_mlp_sql(),
    "bm25f": _bm25f_sql(),
    "nb_classify": _nb_sql(),
    "nb_confusion": _nb_confusion_sql().format(nb=_nb_sql()),
    "mlt": _mlt_sql(),
    "facet_counts": _FACET_SQL.format(
        bm25=_bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)
    ),
    "fuzzy_search": _fuzzy_sql(),
    "wildcard_search": _wildcard_sql(),
    "regex_search": _regex_sql(),
    "ltr_features": _ltr_sql(),
    "bm25_federated": _federated_sql(),
    "stopword_detect": _STOPWORD_SQL,
    "rescore_boost": _rescore_boost_sql(),
    "query_clarity": _clarity_sql(),
    "tiered_bm25": _tiered_sql(),
    "lang_mismatch": _lang_mismatch_sql(),
    "span_first": _span_first_sql(),
    "champion_topk": _champion_sql(),
    "msm_search": _msm_sql(),
    "phrase_slop": _phrase_slop_sql(),
    "synonym_search": _synonym_sql(),
    "common_terms": _common_terms_sql(),
    "heavy_hitters": _HEAVY_SQL,
    "burst_windows": _BURST_SQL,
    "mix_plan": _MIX_SQL,
    "query_expand": _QEXP_SQL.format(
        bm25=_bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)
    ),
    "dl_percentiles": _DL_PCT_SQL,
    "hll_distinct": _HLL_SQL,
    "cms_counts": _CMS_SQL,
    "top_per_group": _TOP_PER_GROUP_SQL,
    "bpe_tokens": _BPE_SQL,
    "decontaminate": _DECON_SQL,
    "range_join": """
SELECT p.event_id AS event_id, p.user_id AS user_id,
       CAST(count(c.event_id) AS BIGINT) AS n_clicks
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
""",
    "sample_stratified": f"""
SELECT doc_id, lang FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      CASE lang {_STRAT_CASE} ELSE '00' END
""",
    "source_stats": _SOURCE_STATS_SQL,
    "token_fertility": _TOKEN_FERTILITY_SQL,
    "dup_rate_by_source": _DUP_RATE_BY_SOURCE_SQL,
    "dedup_bucket_audit": _DEDUP_BUCKET_AUDIT_SQL,
    "jaccard_prefix_audit": _JACCARD_PREFIX_AUDIT_SQL,
    "containment_audit": _CONTAINMENT_AUDIT_SQL,
    "simhash_band_audit": _SIMHASH_BAND_AUDIT_SQL,
    "source_cap": f"""
SELECT doc_id, source, src_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS src_rank
  FROM documents
) WHERE src_rank <= {SOURCE_CAP_K}
""",
    "rep_quality": _REP_QUALITY_SQL,
    "dup_spans": _DUP_SPANS_SQL,
    "dup_span_docs": _DUP_SPAN_DOCS_SQL,
    "lm_score": _LM_SCORE_SQL,
    "doc_stats": f"WITH {_DL_CTE}, {_STATS_CTE} "
                 f"SELECT lang, n_docs, {_fx('avgdl')} AS avgdl_x FROM stats",
    "doc_lengths": f"WITH {_DL_CTE} SELECT doc_id, dl FROM dl",
    "term_df": f"WITH {_TOK_CTE}, {_DF_CTE} SELECT lang, term, df FROM df",
    "term_idf": f"WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE} "
                f"SELECT df.lang AS lang, df.term AS term, df.df AS df, "
                f"{_fx('ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))')} AS idf_x "
                f"FROM df JOIN stats s ON s.lang = df.lang",
    "postings_sample": f"WITH {_TOK_CTE} SELECT doc_id, term, tf FROM tok "
                       f"WHERE term IN {SAMPLE_TERMS}",
    "vocab": f"WITH {_TOK_CTE}, {_DF_CTE} "
             f"SELECT lang, count(*) AS n_terms FROM df GROUP BY lang",
    "top_terms": f"""
WITH {_TOK_CTE},
tf_sum AS (SELECT lang, term, CAST(sum(tf) AS BIGINT) AS total_tf FROM tok GROUP BY lang, term),
ranked AS (
  SELECT lang, term, total_tf,
         row_number() OVER (PARTITION BY lang
                            ORDER BY total_tf DESC, term ASC) AS rank
  FROM tf_sum
)
SELECT lang, term, total_tf, rank FROM ranked WHERE rank <= 10
""",
    "bm25_reference": _bm25_sql(1.5, 0.75, reference_quirk=True, dedup=True),
    "bm25_standard": _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False),
    "bm25_term_sharded": _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False),
    "bm25_term_sharded_pruned": _bm25_sql(1.2, 0.75, reference_quirk=False,
                                          dedup=False),
    # the incremental (append) path must equal a full-corpus build
    "bm25_incremental": _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False),
    # live tombstones: FULL-corpus stats, scored docs filtered (Lucene)
    "bm25_deleted": _bm25_sql(
        1.2, 0.75, reference_quirk=False, dedup=False,
        where=f"WHERE tok.doc_id NOT IN "
              f"(SELECT doc_id FROM documents WHERE {_DELETED_PRED})",
    ),
    # delete-compaction: every stat recomputed over the SURVIVING corpus
    "bm25_compacted": _over_survivors(
        _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)
    ),
    "bm25_wand": _bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False),
    "bm25_collapsed": _bm25_collapsed_sql(),
    "index_integrity": _INDEX_INTEGRITY_SQL,
    "suggest": _suggest_sql(),
    "did_you_mean": _did_you_mean_sql(),
    "prf_expansion": _prf_expansion_sql(),
    "snippets": _snippets_sql(),
    "more_like_this": _more_like_this_sql(),
    "related_terms": _related_terms_sql(),
    "index_diff": _index_diff_sql(),
    "percolate": _percolate_sql(),
    "item_ctr": _ITEM_CTR_SQL,
    "lm_dirichlet": _lm_sql(LM_MU),
    "cosine": _cosine_sql(),
    "cosine_compacted": _cosine_sql(),
    "cosine_rerank": _cosine_rerank_sql(),
    "submission": (
        "SELECT query_id, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rank) "
        "AS docids FROM (" + _bm25_sql(1.5, 0.75, True, True) + ") GROUP BY query_id"
    ),
    "dedup_exact": "SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, "
                   "count(*) AS dup_count FROM documents GROUP BY md5(text)",
    "dedup_normalized": (
        "SELECT md5(array_to_string(" + TOKLIST.format(col="text") + ", ' ')) "
        "AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS dup_count "
        "FROM documents GROUP BY 1"
    ),
    "dedup_apply": """
SELECT d.doc_id AS doc_id, d.lang AS lang
FROM documents d
JOIN (SELECT min(doc_id) AS k FROM documents GROUP BY md5(text)) s
  ON s.k = d.doc_id
""",
    "quality_filter": (
        "SELECT doc_id, n_tokens, quality_x FROM (" + _token_stats_sql() + ") "
        "WHERE quality_x >= 5000 AND n_tokens >= 5"
    ),
    "fingerprint": f"WITH {_TOKS_CTE} SELECT doc_id, "
                   f"md5(array_to_string(l, ' ')) AS fp, len(l) AS n_tokens FROM toks",
    "minhash_pairs": _MINHASH_SQL,
    "ngram_jaccard": _NGRAM_JACCARD_SQL,
    "containment": _CONTAINMENT_SQL,
    "neardup_components": f"""
WITH RECURSIVE
pairs AS (SELECT a, b FROM ({_MINHASH_SQL}) mh),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT src AS n FROM edges),
walk(n, lbl) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.n
)
SELECT n AS doc_id, min(lbl) AS rep FROM walk GROUP BY n
""",
    "dedup_canonical": f"""
WITH RECURSIVE
pairs AS (SELECT a, b FROM ({_MINHASH_SQL}) mh),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT src AS n FROM edges),
walk(n, lbl) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.n
),
comp AS (SELECT n AS doc_id, min(lbl) AS rep FROM walk GROUP BY n),
members AS (SELECT c.doc_id AS doc_id, c.rep AS rep, d.n_chars AS n_chars
            FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
winners AS (SELECT rep, doc_id AS canonical_id FROM (
  SELECT rep, doc_id,
         row_number() OVER (PARTITION BY rep
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM members
) WHERE rn = 1)
SELECT m.doc_id AS doc_id, w.canonical_id AS canonical_id,
       CAST(m.doc_id = w.canonical_id AS BIGINT) AS kept
FROM members m JOIN winners w ON w.rep = m.rep
UNION ALL
SELECT d.doc_id, d.doc_id, CAST(1 AS BIGINT) AS kept
FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM comp)
""",
    "pagerank": _pagerank_sql(),
    "degree_dist": f"""
WITH pairs AS (SELECT a, b FROM ({_MINHASH_SQL}) mh),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM pairs UNION ALL SELECT b AS node FROM pairs
  ) GROUP BY node
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
""",
    "triangles": f"""
WITH pairs AS (SELECT a, b FROM ({_MINHASH_SQL}) mh)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM pairs p1
JOIN pairs p2 ON p2.a = p1.a AND p2.b > p1.b
JOIN pairs p3 ON p3.a = p1.b AND p3.b = p2.b
""",
    "event_bigrams": _EVENT_BIGRAMS_SQL,
    "value_outliers": _VALUE_OUTLIERS_SQL,
    "group_percentiles": _GROUP_PCT_SQL,
    "value_norm": _VALUE_NORM_SQL,
    "export_roundtrip": _EXPORT_RT_SQL,
    "seq_pack": _SEQ_PACK_SQL,
    "redact_terms": _REDACT_SQL,
    "approx_percentiles": _APPROX_PCT_SQL,
    "rel_skew_join": _SKEW_JOIN_SQL,
    "upsert_apply": _UPSERT_SQL,
    "user_running_total": _RUNNING_TOTAL_SQL,
    "value_zscore": _VALUE_ZSCORE_SQL,
    "value_ntile": _VALUE_NTILE_SQL,
    "winsorized_mean": _WINSOR_SQL,
    "bloom_semijoin": _BLOOM_SEMIJOIN_SQL,
    "rel_broadcast_join": _BROADCAST_JOIN_SQL,
    "chunk_text": _CHUNK_TEXT_SQL,
    "chunk_dedup": _CHUNK_DEDUP_SQL,
    "ann_range": _ANN_RANGE_SQL,
    "oov_rate": _OOV_RATE_SQL,
    "user_activity": _USER_ACTIVITY_SQL,
    "simhash_pairs": _SIMHASH_SQL,
    "embed_neardup": _NEARDUP_SQL,
    "knn_graph": _KNN_SQL,
    "embed_neardup_lsh": _NEARDUP_LSH_SQL,
    "ann_topk": _ANN_SQL,
    "ann_topk_lsh": _ANN_LSH_SQL,
    "ann_recall": f"""
WITH ex AS ({_ANN_SQL}), ap AS ({_ANN_LSH_SQL})
SELECT ex.query_vec AS query_vec,
       count(ap.vec_id) AS n_overlap,
       count(ap.vec_id) * 1000 AS recall_x
FROM ex LEFT JOIN ap ON ap.query_vec = ex.query_vec
                     AND ap.vec_id = ex.vec_id
GROUP BY ex.query_vec
""",
    "ann_topk_ivf": _ivf_sql(),
    "kmeans_clusters": _kmeans_sql(),
    "pq_codes": _pq_codes_sql(),
    "ann_topk_pq": _pq_topk_sql(),
    "ann_topk_ivfpq": _ivfpq_sql(),
    "token_stats": _token_stats_sql(),
    "langid": _langid_sql(),
    "binary_meta": "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
                   "md5(text) AS payload_md5 FROM documents",
    "rel_agg": """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c,
       CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS price_c,
       CAST(sum(CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS disc_price_c
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    "rel_q5": _REL_Q5_SQL,
    "rel_antijoin": _REL_ANTIJOIN_SQL,
    "linreg_fit": _LINREG_SQL,
    "rel_rollup": _REL_ROLLUP_SQL,
    "event_dedup": _EVENT_DEDUP_SQL,
    "embed_outliers": _EMB_OUT_SQL,
    "rel_join_top": """
WITH rev AS (
  SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT r.o_custkey, r.revenue_c, r.n_orders,
         row_number() OVER (ORDER BY r.revenue_c DESC, r.o_custkey ASC) AS rank
  FROM rev r
)
SELECT t.rank AS rank, c.c_custkey AS c_custkey, c.c_name AS c_name,
       t.revenue_c AS revenue_c, t.n_orders AS n_orders
FROM ranked t JOIN customer c ON c.c_custkey = t.o_custkey
WHERE t.rank <= 10
""",
    "rel_window": """
SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
FROM events GROUP BY user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
""",
    "rel_asof": """
WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'),
s0 AS (SELECT user_id, ts, max(event_id) AS event_id
       FROM events WHERE event_type = 'signup' GROUP BY user_id, ts)
SELECT p.event_id AS event_id, p.user_id AS user_id,
       s0.event_id AS matched_event_id,
       CAST(epoch_us(p.ts) - epoch_us(s0.ts) AS BIGINT) AS gap_us
FROM p ASOF JOIN s0 ON p.user_id = s0.user_id AND p.ts >= s0.ts
""",
    "rel_json": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
""",
    "submission_wide": (
        "SELECT query_id, "
        + ", ".join(
            f"coalesce(MAX(CASE WHEN rank = {r} THEN doc_id END), -1) AS doc_{r}"
            for r in range(1, 11)
        )
        + " FROM (" + _bm25_sql(1.5, 0.75, True, True) + ") GROUP BY query_id"
    ),
    "web_normalize": _webnorm_sql(),
    "readability": _READABILITY_SQL,
    "sentences": """
WITH s AS (SELECT doc_id, string_split(text, '.') AS parts FROM documents),
u AS (SELECT doc_id, unnest(parts) AS sent,
             unnest(range(0, len(parts))) AS sent_idx FROM s)
SELECT doc_id, sent_idx, trim(sent) AS sentence FROM u WHERE trim(sent) <> ''
""",
    "sentence_bm25": _sentence_bm25_sql(),
    "train_test_split": """
SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
            THEN 'test' ELSE 'train' END AS split,
       count(*) AS n_docs
FROM documents GROUP BY 1
""",
    "eval_metrics": f"""
WITH {_TOK_CTE}, {_DL_CTE}, {_STATS_CTE}, {_DF_CTE},
q(query_id, lang, term, w) AS (VALUES {_query_values(dedup=True)}),
qn AS (SELECT query_id, count(*) AS n_terms FROM q GROUP BY query_id),
relc AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id, count(*) AS c
  FROM q JOIN tok ON tok.lang = q.lang AND tok.term = q.term
  GROUP BY q.query_id, tok.doc_id
),
rel AS (
  SELECT relc.query_id, relc.doc_id
  FROM relc JOIN qn ON qn.query_id = relc.query_id
  WHERE relc.c = qn.n_terms
),
scores AS (
  SELECT q.query_id AS query_id, tok.doc_id AS doc_id,
         sum( q.w * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tok.tf * (1.5 + 1)) / (tok.tf + 1.5*(1 - 0.75 + d.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tok ON tok.lang = q.lang AND tok.term = q.term
  JOIN df ON df.lang = q.lang AND df.term = q.term
  JOIN dl d ON d.doc_id = tok.doc_id
  JOIN stats s ON s.lang = q.lang
  GROUP BY q.query_id, tok.doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_fx('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
),
hits AS (
  SELECT r.query_id AS query_id, count(rel.doc_id) AS hits_at_10,
         min(CASE WHEN rel.doc_id IS NOT NULL THEN r.rank END) AS first_rel
  FROM ranked r
  LEFT JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
  WHERE r.rank <= 10
  GROUP BY r.query_id
),
nrel AS (SELECT query_id, count(*) AS n_relevant FROM rel GROUP BY query_id),
allq AS (SELECT DISTINCT query_id FROM q)
SELECT a.query_id AS query_id,
       coalesce(n.n_relevant, 0) AS n_relevant,
       coalesce(h.hits_at_10, 0) AS hits_at_10,
       CAST(floor(coalesce(1.0 / h.first_rel, 0)*10000.0 + 0.5) AS BIGINT) AS mrr_x
FROM allq a
LEFT JOIN nrel n ON n.query_id = a.query_id
LEFT JOIN hits h ON h.query_id = a.query_id
""",
    "phrase_search": _phrase_sql(),
    "phrase_search_indexed": _phrase_sql(),
    "near_search": f"""
WITH {_TOKS_CTE},
pos AS (SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l)+1)) AS p FROM toks),
pr(pair_id, ta, tb) AS (VALUES {", ".join(f"('{pid}', '{a}', '{b}')" for pid, a, b in NEARSET)}),
m AS (
  SELECT pr.pair_id AS pair_id, a.doc_id AS doc_id, count(*) AS n_matches
  FROM pr
  JOIN pos a ON a.term = pr.ta
  JOIN pos b ON b.doc_id = a.doc_id AND b.term = pr.tb
  WHERE abs(a.p - b.p) <= {NEAR_WINDOW}
  GROUP BY pr.pair_id, a.doc_id
)
SELECT pair_id, doc_id, CAST(n_matches AS BIGINT) AS n_matches FROM m
""",
    "prefix_search": f"""
WITH {_TOKS_CTE},
pos AS (SELECT doc_id, unnest(l) AS term FROM toks),
pf(prefix_id, pre) AS (VALUES {", ".join(f"('{pid}', '{p}')" for pid, p in PREFIXSET)}),
m AS (
  SELECT pf.prefix_id AS prefix_id, pos.doc_id AS doc_id,
         CAST(count(*) AS BIGINT) AS total_tf
  FROM pf JOIN pos ON starts_with(pos.term, pf.pre)
  GROUP BY pf.prefix_id, pos.doc_id
),
ranked AS (
  SELECT prefix_id, doc_id, total_tf,
         row_number() OVER (PARTITION BY prefix_id
                            ORDER BY total_tf DESC, doc_id ASC) AS rank
  FROM m
)
SELECT prefix_id, rank, doc_id, total_tf FROM ranked WHERE rank <= 10
""",
    "phrase_snippets": _phrase_snippets_sql(),
    "bool_search": _bool_sql(),
    "hybrid_rrf": f"""
WITH bm AS ({_bm25_sql(1.2, 0.75, reference_quirk=False, dedup=False)}),
cs AS ({_cosine_sql()}),
u AS (
  SELECT query_id, doc_id,
         CAST(floor(1000000.0/({RRF_K} + rank) + 0.5) AS BIGINT) AS rrf_x
  FROM bm
  UNION ALL
  SELECT query_id, doc_id,
         CAST(floor(1000000.0/({RRF_K} + rank) + 0.5) AS BIGINT)
  FROM cs
),
f AS (SELECT query_id, doc_id, CAST(sum(rrf_x) AS BIGINT) AS rrf_x
      FROM u GROUP BY query_id, doc_id),
rr AS (
  SELECT query_id, doc_id, rrf_x,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_x DESC, doc_id ASC) AS rank
  FROM f
)
SELECT query_id, rank, doc_id, rrf_x FROM rr WHERE rank <= 10
""",
    "tfidf_keywords": f"""
WITH {_TOK_CTE}, {_DF_CTE},
nstats AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
sc AS (
  SELECT tok.doc_id AS doc_id, tok.term AS term,
         {_fx('tok.tf * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))')} AS tfidf_x
  FROM tok
  JOIN df ON df.lang = tok.lang AND df.term = tok.term
  JOIN nstats s ON s.lang = tok.lang
),
ranked AS (
  SELECT doc_id, term, tfidf_x,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_x DESC, term ASC) AS rank
  FROM sc
)
SELECT doc_id, rank, term, tfidf_x FROM ranked WHERE rank <= 3
""",
    "top_bigrams": f"""
WITH {_TOKS_CTE},
pos AS (SELECT doc_id, lang, unnest(l) AS term,
               unnest(range(1, len(l)+1)) AS p FROM toks),
bg AS (
  SELECT a.lang AS lang, a.term || ' ' || b.term AS bigram,
         CAST(count(*) AS BIGINT) AS n
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
  GROUP BY a.lang, a.term || ' ' || b.term
),
ranked AS (
  SELECT lang, bigram, n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n DESC, bigram ASC) AS rank
  FROM bg
)
SELECT lang, rank, bigram, n FROM ranked WHERE rank <= 10
""",
    "sessionize": f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tsu,
         CAST(floor(value*100.0 + 0.5) AS BIGINT) AS value_c,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS pts
  FROM events),
f AS (
  SELECT user_id, tsu, value_c,
         sum(CASE WHEN pts IS NULL OR tsu - pts > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY tsu, event_id
                 ROWS UNBOUNDED PRECEDING) AS sess
  FROM e)
SELECT user_id, CAST(sess AS BIGINT) AS session_idx,
       min(tsu) AS start_us, max(tsu) AS end_us,
       count(*) AS n_events, CAST(sum(value_c) AS BIGINT) AS value_c
FROM f GROUP BY user_id, sess
""",
    "funnel": _FUNNEL_SQL,
    "retention": _RETENTION_SQL,
    "window_hop": _WINDOW_HOP_SQL,
    "window_tumble": f"""
SELECT event_type,
       (epoch_us(ts) // {WINDOW_US}) * {WINDOW_US} AS ws_us,
       count(*) AS n,
       CAST(sum(CAST(floor(value*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_c,
       count(DISTINCT user_id) AS users
FROM events GROUP BY 1, 2
""",
    "pmi_pairs": f"""
WITH {_TOK_CTE},
docs_n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
{_DF_CTE},
topv AS (
  SELECT lang, term, df FROM (
    SELECT lang, term, df,
           row_number() OVER (PARTITION BY lang
                              ORDER BY df DESC, term ASC) AS rn
    FROM df) t WHERE rn <= {PMI_TOP_V}
),
sel AS (
  SELECT t.doc_id, t.lang, t.term
  FROM tok t JOIN topv v ON v.lang = t.lang AND v.term = t.term
),
pairs AS (
  SELECT a.lang AS lang, a.term AS term_x, b.term AS term_y,
         count(*) AS n_xy
  FROM sel a
  JOIN sel b ON b.doc_id = a.doc_id AND b.lang = a.lang
            AND a.term < b.term
  GROUP BY a.lang, a.term, b.term
),
pmi AS (
  SELECT p.lang, p.term_x, p.term_y, p.n_xy,
         ln((CAST(p.n_xy AS DOUBLE) * dn.n)
            / (CAST(vx.df AS DOUBLE) * vy.df)) AS pmi
  FROM pairs p
  JOIN docs_n dn ON dn.lang = p.lang
  JOIN topv vx ON vx.lang = p.lang AND vx.term = p.term_x
  JOIN topv vy ON vy.lang = p.lang AND vy.term = p.term_y
  WHERE p.n_xy >= {PMI_MIN_CO}
),
ranked AS (
  SELECT lang, term_x, term_y, n_xy, {_fx('pmi')} AS pmi_x,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {_fx('pmi')} DESC,
                                     term_x ASC, term_y ASC) AS rank
  FROM pmi
)
SELECT lang, rank, term_x, term_y, n_xy, pmi_x
FROM ranked WHERE rank <= 10
""",
    "latest_event": """
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT event_id, ts, user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
    "token_entropy": f"""
WITH {_TOKS_CTE},
tc AS (SELECT doc_id, tok, count(*) AS c
       FROM (SELECT doc_id, unnest(l) AS tok FROM toks) GROUP BY doc_id, tok),
e AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             sum(c * ln(c)) AS s
      FROM tc GROUP BY doc_id)
SELECT d.doc_id AS doc_id,
       COALESCE(e.n_tokens, 0) AS n_tokens,
       COALESCE(e.n_types, 0) AS n_types,
       COALESCE(CAST(floor((ln(e.n_tokens) - e.s / e.n_tokens) * 10000.0 + 0.5)
                     AS BIGINT), 0) AS entropy_x
FROM documents d LEFT JOIN e ON e.doc_id = d.doc_id
""",
    "neardup_apply": f"""
WITH RECURSIVE
pairs AS (SELECT a, b FROM ({_MINHASH_SQL}) mh),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT src AS n FROM edges),
walk(n, lbl) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.n
),
comp AS (SELECT n AS doc_id, min(lbl) AS rep FROM walk GROUP BY n)
SELECT d.doc_id AS doc_id, d.lang AS lang
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
WHERE c.doc_id IS NULL OR c.rep = d.doc_id
""",
    "source_lift": f"""
WITH toks AS (SELECT doc_id, source, {TOKLIST.format(col="text")} AS l
              FROM documents),
st AS (SELECT source, tok AS term, count(*) AS c
       FROM (SELECT source, unnest(l) AS tok FROM toks) GROUP BY source, tok),
ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY source),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS N FROM st),
g AS (SELECT term, CAST(sum(c) AS BIGINT) AS cg FROM st GROUP BY term),
lifted AS (
  SELECT st.source AS source, st.term AS term, CAST(st.c AS BIGINT) AS c,
         CAST((CAST(st.c AS BIGINT) * tot.N * 10000) // (ns.n * g.cg)
              AS BIGINT) AS lift_x
  FROM st
  JOIN ns ON ns.source = st.source
  JOIN g ON g.term = st.term
  CROSS JOIN tot
  WHERE st.c >= {SOURCE_LIFT_MIN_COUNT}
),
r AS (SELECT source, term, c, lift_x,
             row_number() OVER (PARTITION BY source
                                ORDER BY lift_x DESC, term ASC) AS rank
      FROM lifted)
SELECT source, CAST(rank AS BIGINT) AS rank, term, c, lift_x
FROM r WHERE rank <= {SOURCE_LIFT_TOPK}
""",
}

ORACLE_SQL["ann_filtered"] = f"""
WITH {_EMB_UNNEST},
ok AS (SELECT vec_id FROM embeddings
       WHERE label IN {ANN_FILTER_LABELS}),
d AS (
  SELECT uq.vec_id AS query_vec, ub.vec_id AS vec_id, sum(uq.v * ub.v) AS dot
  FROM u uq JOIN u ub ON ub.i = uq.i AND ub.vec_id <> uq.vec_id
  JOIN ok ON ok.vec_id = ub.vec_id
  WHERE uq.vec_id IN {ANN_QUERY_IDS}
  GROUP BY uq.vec_id, ub.vec_id
),
c AS (
  SELECT d.query_vec, d.vec_id, d.dot / (nq.nrm * nb.nrm) AS cos
  FROM d JOIN n nq ON nq.vec_id = d.query_vec JOIN n nb ON nb.vec_id = d.vec_id
  WHERE nq.nrm > 0 AND nb.nrm > 0
),
ranked AS (
  SELECT query_vec, vec_id, {_fx('cos')} AS cos_x,
         row_number() OVER (PARTITION BY query_vec
                            ORDER BY {_fx('cos')} DESC, vec_id ASC) AS rank
  FROM c
)
SELECT query_vec, rank, vec_id, cos_x FROM ranked WHERE rank <= 10
"""
ORACLE_SQL["covisit"] = _COVISIT_SQL
ORACLE_SQL["neardup_cluster_sizes"] = _cluster_sizes_sql().format(
    comp=ORACLE_SQL["neardup_components"]
)
ORACLE_SQL["popularity_decay"] = _POPULARITY_DECAY_SQL
ORACLE_SQL["streaks"] = _STREAKS_SQL
ORACLE_SQL["group_distinct"] = _GROUP_DISTINCT_SQL
ORACLE_SQL["also_viewed"] = _also_viewed_sql()
ORACLE_SQL["dl_percent_rank"] = _DL_PERCENT_RANK_SQL
ORACLE_SQL["table_checksum"] = _CHECKSUM_SQL
ORACLE_SQL["eval_ndcg"] = _eval_ndcg_sql()
ORACLE_SQL["conversion_lag"] = _CONVERSION_LAG_SQL
ORACLE_SQL["knn_mutual"] = f"""
WITH knn AS ({_KNN_SQL})
SELECT k1.vec_id AS a, k1.nbr AS b, k1.cos_x AS cos_x
FROM knn k1 JOIN knn k2 ON k2.vec_id = k1.nbr AND k2.nbr = k1.vec_id
WHERE k1.vec_id < k1.nbr
"""
ORACLE_SQL["extract_summary"] = _EXTRACT_SUMMARY_SQL
ORACLE_SQL["vocab_drift"] = _VOCAB_DRIFT_SQL

# these compose other oracle entries, so they register after the dict
_sa_base = _bm25_sql(1.5, 0.75, reference_quirk=True, dedup=True)
# loud guard: if _bm25_sql's final predicate ever changes shape, fail at
# import instead of silently oracling page 1
assert _sa_base.count("WHERE rank <= 10") == 1, "search_after oracle anchor"
ORACLE_SQL["search_after"] = _sa_base.replace(
    "WHERE rank <= 10",
    f"WHERE rank > {SEARCH_AFTER_PAGE} AND rank <= {2 * SEARCH_AFTER_PAGE}",
)
ORACLE_SQL["df_histogram"] = f"""
WITH t AS ({ORACLE_SQL["term_df"]})
SELECT lang, CAST(floor(log2(df)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_terms
FROM t GROUP BY lang, bucket
"""
ORACLE_SQL["related_docs"] = _related_docs_sql()
ORACLE_SQL["quality_sample"] = _quality_sample_sql()
ORACLE_SQL["mmr_rerank"] = _mmr_sql()
ORACLE_SQL["cross_dedup"] = _cross_dedup_sql()
