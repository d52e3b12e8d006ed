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

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..util import read_parquet_clean

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
    return read_parquet_clean(path, columns=columns)


def read_testdata_documents(sf_dir: str, columns=("doc_id", "text", "lang")) -> ray.data.Dataset:
    """Read driver testdata documents and adapt to the engine key schema.

    Block count is sized to the footer row count (rows/5k, clamped
    [8, 256]) — downstream cogroup sorts pay per-block scheduling, so a
    toy table must not arrive in 64 near-empty splits; at data scale the
    clamp is inert (see SCALE.md, data-sized read fan-out)."""
    import pyarrow.parquet as _pq

    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):
        n = sum(
            _pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        n = _pq.read_metadata(path).num_rows
    ds = read_parquet_clean(
        path, columns=list(columns),
        override_num_blocks=max(8, min(256, n // 5_000 + 1)),
    )

    def adapt(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("url", docid_to_url(batch["doc_id"]))
        return batch.drop_columns(["doc_id"])

    return ds.map_batches(adapt, batch_format="pyarrow")


def read_corpus_json(path) -> ray.data.Dataset:
    """Read a reference-format JSON corpus — an array (or JSONL) of
    ``{docid, text, lang}`` objects (S1; loaded with ``json.load`` at
    bm25_text_preprocessing.py:82-90 / pd.read_json at
    document_ranking_with_bm25.py:72-75) — and adapt it to the engine's
    key schema (docid → url). A user of the reference can point this at
    their existing ``corpus.json`` unchanged."""
    ds = ray.data.read_json(path)

    def adapt(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in batch.column_names}
        url = (
            pc.cast(cols.pop("docid"), pa.string())
            if "docid" in cols
            else cols.pop("url")
        )
        out = pa.table({"url": url})
        for name in ("text", "lang"):
            if name in cols:
                out = out.append_column(name, pc.cast(cols[name], pa.string()))
        return out

    return ds.map_batches(adapt, batch_format="pyarrow")


def read_queries(path, columns=("query_id", "query", "lang")) -> ray.data.Dataset:
    """Read a query table (S2). Parquet by default; ``.csv`` paths use
    the reference's CSV format (ranking_with_bm25.py:236-239 /
    final_implementation.py:164-169 — the test set names the key column
    ``id``, normalized to ``query_id`` here)."""
    if str(path).endswith(".csv"):
        ds = ray.data.read_csv(path)

        def adapt(batch: pa.Table) -> pa.Table:
            if "id" in batch.column_names and "query_id" not in batch.column_names:
                batch = batch.rename_columns(
                    ["query_id" if c == "id" else c for c in batch.column_names]
                )
            keep = [c for c in columns if c in batch.column_names]
            out = batch.select(keep)
            if "query_id" in out.column_names:
                i = out.column_names.index("query_id")
                out = out.set_column(
                    i, "query_id", pc.cast(out["query_id"], pa.string())
                )
            return out

        return ds.map_batches(adapt, batch_format="pyarrow")
    return read_parquet_clean(path, columns=list(columns))
