"""Corpus / query readers → ray.data.Dataset.

Two physical input shapes are supported:

- **input_hint shape** (BASELINE.json): ``(url, warc_ts, html, text, lang)``
  — the Common-Crawl-style table our engine is designed for. Reference
  analog: ``corpus.json`` array of {docid, text, lang}
  (bm25_text_preprocessing.py:82-90).
- **driver testdata shape**: ``documents.parquet`` with
  ``(doc_id:int64, text, lang, source, n_chars)`` — adapted by mapping
  ``url = zero-padded str(doc_id)`` so ranking tie-breaks on ``url`` agree
  with numeric ``doc_id`` order.

Columns are pruned at the read (only what the pipeline consumes leaves
storage).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# zero-padding width for int doc ids → url strings (lexicographic == numeric)
DOCID_PAD = 12


def docid_to_url(doc_id_array) -> pa.Array:
    """int64 doc_id → zero-padded string key (vectorized)."""
    s = pc.cast(doc_id_array, pa.string())
    return pc.utf8_lpad(s, DOCID_PAD, "0")


def url_to_docid(url_array) -> pa.Array:
    return pc.cast(url_array, pa.int64())


def read_webpages(path, columns=None, with_html: bool = False) -> ray.data.Dataset:
    """Read an input_hint-shaped Parquet corpus, pruning columns."""
    if columns is None:
        columns = ["url", "text", "lang"] + (["html"] if with_html else [])
    return ray.data.read_parquet(path, columns=columns)


def read_testdata_documents(sf_dir: str, columns=("doc_id", "text", "lang")) -> ray.data.Dataset:
    """Read driver testdata documents and adapt to the engine key schema."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))

    def adapt(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("url", docid_to_url(batch["doc_id"]))
        return batch.drop_columns(["doc_id"])

    return ds.map_batches(adapt, batch_format="pyarrow")


def read_queries(path, columns=("query_id", "query", "lang")) -> ray.data.Dataset:
    return ray.data.read_parquet(path, columns=list(columns))
