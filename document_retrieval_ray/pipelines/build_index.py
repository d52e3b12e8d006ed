"""End-to-end resumable index build (SURVEY.md §3 Ray-native lifecycle).

Pipeline::

    read_parquet(url, text|html, lang)                 [column-pruned read]
      → ExtractText (html corpora only)                [map_batches, Arrow]
      → TokenizeStage                                  [actor pool]
      → AddPart (url-hash partition)                   [map_batches]
      → groupby(lang, part).map_groups(AssignDocIds)   [SHUFFLE 1: doc ids]
          side-writes docmap/lang=*/part-*.parquet, emits posting triples
      → triples checkpoint (scratch parquet)           [disk, reused 3x]
      → partial_term_counts → groupby(lang,term).sum   [SHUFFLE 2: df, partial+final]
      → AddSalt(hot terms broadcast via ray.put)
      → groupby(lang, term, salt).map_groups(encode)   [SHUFFLE 3: THE big one]
      → groupby(lang, term).map_groups(MergeSegments)  [hot-term segment merge]
      → write postings/lang=*/*.parquet
      → per-lang manifest commit (atomic)

Resumability: a language shard whose manifest is committed for the same
input fingerprint is skipped entirely (reference analog: pickle-existence
guards, document_ranking_with_bm25.py:452-491 — but transactional here).

Scale notes: the triples checkpoint is a deliberate disk spill so the
stream is consumed three times (df / norms / encode) without re-tokenizing
or pinning the corpus in the object store; the df shuffle moves per-batch
partials, not triples; hot terms (df > hot_term_threshold) are salted into
doc-range sub-keys so no single groupby task ever sees a stopword-sized
posting list.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data

from ..config import IndexConfig
from ..stages.extract import ExtractText
from ..stages.index_build import (
    AddSalt,
    AssignDocIds,
    MergeSegments,
    add_part,
    encode_term_group,
    partial_term_counts,
)
from ..stages.tokenize import TokenizeStage
from ..state.manifest import is_committed, read_manifest, write_manifest

IDF_LAWS = {
    "lucene": lambda N, df: np.log(1.0 + (N - df + 0.5) / (df + 0.5)),
    "cosine": lambda N, df: np.log((N - df + 0.5) / (df + 0.5)),
    "sklearn": lambda N, df: np.log((N + 1.0) / (df + 1.0)) + 1.0,
}


def _default_pool() -> int:
    """Actor-pool size for class stages. A pipeline here runs at most TWO
    actor pools concurrently plus read/shuffle/write task stages; pools
    that reserve every CPU deadlock the streaming executor (observed at
    num_cpus=4: tokenize 2 + assign 2 = 4 → the read task starves
    forever). Budget: (cpus - 2) / 2 per pool, min 1."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, (cpus - 2) // 2)


def _input_fingerprint(input_path) -> str:
    """Cheap lineage fingerprint: path(s) + total row count from metadata."""
    try:
        dset = pads.dataset(input_path, format="parquet")
        rows = sum(f.metadata.num_rows if f.metadata else 0 for f in dset.get_fragments())
        return f"{input_path}::rows={rows}"
    except Exception:
        return str(input_path)


def _lang_dirs(index_dir: str):
    return {
        "docmap": os.path.join(index_dir, "docmap"),
        "postings": os.path.join(index_dir, "postings"),
        "norms": os.path.join(index_dir, "norms"),
        "df": os.path.join(index_dir, "df"),
        "manifests": os.path.join(index_dir, "manifests"),
    }


def _clean_uncommitted(index_dir: str, langs) -> None:
    d = _lang_dirs(index_dir)
    for lang in langs:
        for key in ("docmap", "postings", "norms", "df"):
            p = os.path.join(d[key], f"lang={lang}")
            if os.path.isdir(p):
                shutil.rmtree(p)


def build_index(
    input_path,
    index_dir: str,
    *,
    cfg: IndexConfig = IndexConfig(),
    extract_html: bool = False,
    with_cosine_norms: bool = True,
    tokenize_concurrency=None,
    input_ds_factory=None,
    keep_triples: bool = False,
) -> dict:
    """Build (or resume) the inverted index. Returns {lang: manifest dict}.

    ``input_ds_factory``: optional callable () → Dataset with columns
    (url, text|html, lang), overriding the parquet read (used to adapt the
    driver testdata shape). Fingerprinting then uses ``input_path`` as an
    opaque label.
    """
    d = _lang_dirs(index_dir)
    if tokenize_concurrency is None:
        tokenize_concurrency = _default_pool()
    fingerprint = _input_fingerprint(input_path) + f"::tok={cfg.tokenizer.mode}"

    def read_input():
        if input_ds_factory is not None:
            return input_ds_factory()
        cols = ["url", "lang"] + (["html"] if extract_html else ["text"])
        return ray.data.read_parquet(input_path, columns=cols)

    # --- which language shards still need building? ---
    all_langs = sorted(read_input().unique("lang"))
    todo = [
        l
        for l in all_langs
        if not is_committed(os.path.join(d["manifests"], str(l)), fingerprint)
    ]
    manifests = {
        l: read_manifest(os.path.join(d["manifests"], str(l)))
        for l in all_langs
        if l not in todo
    }
    if not todo:
        return manifests
    _clean_uncommitted(index_dir, todo)

    docs = read_input()
    if len(todo) < len(all_langs):
        import pyarrow as pa

        todo_arr = pa.array(sorted(todo))
        docs = docs.map_batches(
            lambda t: t.filter(pc.is_in(t["lang"], value_set=todo_arr)),
            batch_format="pyarrow",
        )

    if extract_html:
        docs = docs.map_batches(ExtractText(), batch_format="pyarrow")

    # --- pass 0: per-(lang, part) doc counts → dense-id offsets ---
    parted_keys = docs.map_batches(
        lambda t: add_part(t.select(["url", "lang"]), cfg.num_hash_parts),
        batch_format="pyarrow",
    )
    counts = parted_keys.groupby(["lang", "part"]).count().take_all()
    offsets: dict = {}
    for lang in todo:
        rows = sorted(
            ((r["part"], r["count()"]) for r in counts if r["lang"] == lang)
        )
        acc = 0
        for part, n in rows:
            offsets[(lang, int(part))] = acc
            acc += n

    # --- pass 1: tokenize → assign ids (side-write docmap) → triples ---
    tokens = docs.map_batches(
        TokenizeStage,
        fn_constructor_kwargs={"config": cfg.tokenizer},
        batch_format="pyarrow",
        concurrency=tokenize_concurrency,
    )
    parted = tokens.map_batches(
        add_part, fn_kwargs={"num_parts": cfg.num_hash_parts}, batch_format="pyarrow"
    )
    triples = parted.groupby(["lang", "part"]).map_groups(
        AssignDocIds,
        fn_constructor_kwargs={"offsets": offsets, "docmap_dir": d["docmap"]},
        batch_format="pyarrow",
        concurrency=tokenize_concurrency,
    )
    triples_dir = os.path.join(index_dir, "_triples")
    if os.path.isdir(triples_dir):
        shutil.rmtree(triples_dir)
    triples.write_parquet(triples_dir)

    # --- pass 2: document frequency (partial combine, then small shuffle) ---
    partials = ray.data.read_parquet(triples_dir, columns=["lang", "term"]).map_batches(
        partial_term_counts, batch_format="pyarrow"
    )
    df_ds = partials.groupby(["lang", "term"]).sum("n")
    df_ds = df_ds.map_batches(
        lambda t: t.rename_columns(["lang", "term", "df"]), batch_format="pyarrow"
    )
    df_ds.write_parquet(d["df"], partition_cols=["lang"])

    # hot terms for skew salting (small driver-side set, broadcast once)
    hot = [
        (r["lang"], r["term"])
        for r in ray.data.read_parquet(d["df"]).filter(
            expr=f"df > {cfg.hot_term_threshold}"
        ).take_all()
    ]
    hot_ref = ray.put(frozenset(hot)) if hot else None

    # --- stats per lang (N over ALL docs incl. dl=0, avgdl incl. zeros) ---
    docmap_ds = ray.data.read_parquet(d["docmap"], columns=["dl", "lang"])
    stats_rows = docmap_ds.groupby("lang").aggregate(
        ray.data.aggregate.Count(alias_name="n_docs"),
        ray.data.aggregate.Mean("dl", alias_name="avgdl"),
        ray.data.aggregate.Sum("dl", alias_name="total_tokens"),
    ).take_all()
    stats = {r["lang"]: r for r in stats_rows}

    # --- optional cosine norms: |d| under the cosine idf law ---
    if with_cosine_norms:
        _build_cosine_norms(triples_dir, d, stats)

    # --- pass 3: encode + merge + write postings ---
    triples_ds = ray.data.read_parquet(triples_dir)
    salted = triples_ds.map_batches(
        AddSalt,
        fn_constructor_kwargs={"hot_terms_ref": hot_ref, "salt_shift": cfg.salt_shift},
        batch_format="pyarrow",
        concurrency=tokenize_concurrency,
    )
    encoded = salted.groupby(["lang", "term", "salt"]).map_groups(
        encode_term_group,
        fn_kwargs={"block_size": cfg.block_size},
        batch_format="pyarrow",
    )  # plain function → elastic tasks
    merged = encoded.groupby(["lang", "term"]).map_groups(
        MergeSegments,
        fn_constructor_kwargs={"block_size": cfg.block_size, "min_df": cfg.min_df},
        batch_format="pyarrow",
        concurrency=tokenize_concurrency,
    )
    merged.write_parquet(d["postings"], partition_cols=["lang"])

    # --- per-lang metrics + manifest commit ---
    term_stats = {
        r["lang"]: r
        for r in ray.data.read_parquet(d["postings"], columns=["lang", "df"])
        .groupby("lang")
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_terms"),
            ray.data.aggregate.Sum("df", alias_name="n_postings"),
        )
        .take_all()
    }
    if not keep_triples:
        shutil.rmtree(triples_dir, ignore_errors=True)

    for lang in todo:
        s = stats.get(lang, {})
        t = term_stats.get(lang, {})
        payload = {
            "partition": str(lang),
            "input_fingerprint": fingerprint,
            "n_docs": int(s.get("n_docs", 0)),
            "avgdl": float(s.get("avgdl", 0.0) or 0.0),
            "total_tokens": int(s.get("total_tokens", 0) or 0),
            "n_terms": int(t.get("n_terms", 0)),
            "n_postings": int(t.get("n_postings", 0) or 0),
            "block_size": cfg.block_size,
            "hot_term_threshold": cfg.hot_term_threshold,
            "salt_shift": cfg.salt_shift,
            "num_hash_parts": cfg.num_hash_parts,
            "tokenizer_mode": cfg.tokenizer.mode,
            "with_cosine_norms": bool(with_cosine_norms),
        }
        write_manifest(os.path.join(d["manifests"], str(lang)), payload)
        manifests[lang] = payload
    return manifests


def _build_cosine_norms(triples_dir: str, d: dict, stats: dict) -> None:
    """Per-doc TF-IDF L2 norms under the 'cosine' idf law
    (cosine_similarity_bm25_reranking.py:176-182, :94-110): broadcast the
    per-lang idf dict, partial per-batch doc sums, then a doc-keyed
    groupby-sum (small output: one row per doc)."""
    import pandas as pd
    import pyarrow as pa

    df_tbl = ray.data.read_parquet(d["df"]).to_pandas()
    idf_maps = {}
    for lang, g in df_tbl.groupby("lang"):
        N = stats[lang]["n_docs"]
        idf = np.log((N - g["df"].to_numpy() + 0.5) / (g["df"].to_numpy() + 0.5))
        idf_maps[lang] = dict(zip(g["term"], idf))
    idf_ref = ray.put(idf_maps)

    class PartialNorm:
        def __init__(self):
            self.idf_maps = ray.get(idf_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pdf = batch.to_pandas()
            idf = np.array(
                [
                    self.idf_maps.get(l, {}).get(t, 0.0)
                    for l, t in zip(pdf["lang"], pdf["term"])
                ]
            )
            w = pdf["tf"].to_numpy() * idf
            pdf["w2"] = w * w
            out = (
                pdf.groupby(["lang", "doc_id"], sort=False)["w2"].sum().reset_index()
            )
            return pa.Table.from_pandas(out, preserve_index=False)

    norms = (
        ray.data.read_parquet(triples_dir, columns=["lang", "doc_id", "term", "tf"])
        .map_batches(PartialNorm, batch_format="pyarrow", concurrency=_default_pool())
        .groupby(["lang", "doc_id"])
        .sum("w2")
    )
    norms = norms.map_batches(
        lambda t: t.rename_columns(["lang", "doc_id", "norm2"]), batch_format="pyarrow"
    )
    norms.write_parquet(d["norms"], partition_cols=["lang"])
