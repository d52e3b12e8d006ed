"""Document deletion (pipelines/deletes.py): live tombstone serving must
exclude deleted docs with Lucene semantics (stale global stats — the
ranking equals 'full-index ranking with the deleted urls filtered out'),
and delete-aware compaction must be rank- and stat-identical to a fresh
build over the surviving corpus."""

import json
import os

import numpy as np
import pandas as pd
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


def _frame(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)[["query_id", "rank", "url", "score_x"]]
    )


@pytest.fixture(scope="module")
def delete_setup(ray_session, tiny_corpus, tmp_path_factory):
    """One plain index over the tiny corpus with every 7th url deleted,
    plus a fresh build over the surviving corpus as the ground truth."""
    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.deletes import delete_docs

    tmp = tmp_path_factory.mktemp("deletes")
    docs = pq.read_table(tiny_corpus["documents"])
    urls = docs["url"].to_pylist()
    deleted_urls = sorted(set(urls[::7]))

    idx_dir = str(tmp / "index")
    build_index(tiny_corpus["documents"], idx_dir, cfg=CFG,
                with_cosine_norms=False)
    n = delete_docs(idx_dir, deleted_urls)
    assert n == len(deleted_urls)

    surv_path = str(tmp / "surviving.parquet")
    keep = [u not in set(deleted_urls) for u in urls]
    pq.write_table(docs.filter(np.array(keep)), surv_path)
    surv_dir = str(tmp / "surv_index")
    build_index(surv_path, surv_dir, cfg=CFG, with_cosine_norms=False)

    return {
        "tmp": tmp, "index": idx_dir, "surv_index": surv_dir,
        "deleted": set(deleted_urls), "queries": tiny_corpus["queries"],
    }


def _search(index_dir, queries_path, method="taat", k=None,
            tombstones=None) -> pd.DataFrame:
    import ray.data

    from document_retrieval_ray.pipelines.query import bm25_search

    cfg = BM25 if k is None else BM25Config(
        k1=1.2, b=0.75, idf="lucene", compat="standard", k=k
    )
    qds = ray.data.read_parquet(queries_path)
    return _frame(bm25_search(
        qds, index_dir, cfg=cfg, tokenizer=TokenizerConfig(mode="simple"),
        round_dp=4, method=method, tombstones_dir=tombstones,
    ))


def test_live_delete_equals_filtered_full_ranking(delete_setup):
    """Lucene live-docs semantics, checked through an INDEPENDENT path:
    rank the FULL index deep enough, drop the deleted urls post-hoc,
    re-rank the survivors — must equal the tombstone-masked search
    (deletion must not change surviving docs' scores)."""
    deleted = delete_setup["deleted"]
    got = _search(delete_setup["index"], delete_setup["queries"])
    assert not set(got["url"]) & deleted
    deep = _search(delete_setup["index"], delete_setup["queries"],
                   k=10 + len(deleted), tombstones=False)
    want = deep[~deep["url"].isin(deleted)].copy()
    want["rank"] = want.groupby("query_id").cumcount() + 1
    want = want[want["rank"] <= 10].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_wand_and_maxscore_fall_back_to_masked_taat(delete_setup):
    taat = _search(delete_setup["index"], delete_setup["queries"], "taat")
    for method in ("wand", "maxscore"):
        got = _search(delete_setup["index"], delete_setup["queries"], method)
        pd.testing.assert_frame_equal(got, taat)


def test_delete_unknown_urls_is_noop(delete_setup, tmp_path):
    from document_retrieval_ray.pipelines.deletes import (
        delete_docs,
        read_tombstone_dirs,
    )

    before = read_tombstone_dirs(
        os.path.join(delete_setup["index"], "tombstones")
    )
    assert delete_docs(delete_setup["index"], ["no-such-url-1", "x"]) == 0
    after = read_tombstone_dirs(
        os.path.join(delete_setup["index"], "tombstones")
    )
    assert after == before


def test_deletes_accumulate_across_calls(delete_setup):
    from document_retrieval_ray.pipelines.deletes import (
        delete_docs,
        load_deleted,
    )

    tomb = str(delete_setup["tmp"] / "tomb2")
    one = sorted(delete_setup["deleted"])[0]
    other = sorted(delete_setup["deleted"])[1]
    assert delete_docs(delete_setup["index"], [one], tombstones_dir=tomb) == 1
    assert delete_docs(delete_setup["index"], [one, other],
                       tombstones_dir=tomb) == 2
    total = sum(v.size for v in load_deleted(tomb).values())
    assert total == 2  # union, not multiset


def test_compact_with_deletes_equals_fresh_build(delete_setup):
    from document_retrieval_ray.pipelines.incremental import compact_index
    from document_retrieval_ray.state.manifest import read_manifest

    out = str(delete_setup["tmp"] / "compacted")
    compact_index(delete_setup["index"], out)

    surv = delete_setup["surv_index"]
    langs = sorted(
        os.path.basename(p).split("=")[1]
        for p in __import__("glob").glob(os.path.join(surv, "df", "lang=*"))
    )
    for lang in langs:
        # df parity: same (term → df) map
        a = pq.read_table(os.path.join(out, "df", f"lang={lang}"),
                          columns=["term", "df"]).to_pandas()
        b = pq.read_table(os.path.join(surv, "df", f"lang={lang}"),
                          columns=["term", "df"]).to_pandas()
        a = a.sort_values("term").reset_index(drop=True)
        b = b.sort_values("term").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        # docmap parity: same (url → dl) map
        da = pq.read_table(os.path.join(out, "docmap", f"lang={lang}"),
                           columns=["url", "dl"]).to_pandas()
        db = pq.read_table(os.path.join(surv, "docmap", f"lang={lang}"),
                           columns=["url", "dl"]).to_pandas()
        da = da.sort_values("url").reset_index(drop=True)
        db = db.sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(da, db)
        # manifest stat parity
        ma = read_manifest(os.path.join(out, "manifests", lang))
        mb = read_manifest(os.path.join(surv, "manifests", lang))
        assert int(ma["n_docs"]) == int(mb["n_docs"])
        assert int(ma["total_tokens"]) == int(mb["total_tokens"])

    got = _search(out, delete_setup["queries"])
    want = _search(surv, delete_setup["queries"])
    pd.testing.assert_frame_equal(got, want)
    # no deleted url can have survived compaction
    assert not set(got["url"]) & delete_setup["deleted"]


def test_generational_delete_and_compact(ray_session, tiny_corpus,
                                         tmp_path_factory):
    """Deletes spanning base + generations: live incremental serving
    masks them; compaction applies them; both agree with a fresh build
    over the survivors."""
    import ray.data

    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.deletes import delete_docs
    from document_retrieval_ray.pipelines.incremental import (
        append_index,
        bm25_search_incremental,
        compact_index,
    )

    tmp = tmp_path_factory.mktemp("gen_del")
    docs = pq.read_table(tiny_corpus["documents"])
    n = docs.num_rows
    cut = int(n * 0.6)
    base_p = str(tmp / "base.parquet")
    delta_p = str(tmp / "delta.parquet")
    pq.write_table(docs.slice(0, cut), base_p)
    pq.write_table(docs.slice(cut), delta_p)

    inc = str(tmp / "inc")
    build_index(base_p, inc, cfg=CFG, with_cosine_norms=False)
    append_index(delta_p, inc, cfg=CFG)

    urls = docs["url"].to_pylist()
    deleted_urls = sorted(set(urls[::9]))  # spans both segments
    assert delete_docs(inc, deleted_urls) == len(deleted_urls)

    qds = ray.data.read_parquet(tiny_corpus["queries"])
    live = _frame(bm25_search_incremental(
        qds, inc, cfg=BM25, tokenizer=TokenizerConfig(mode="simple"),
        round_dp=4,
    ))
    assert not set(live["url"]) & set(deleted_urls)

    out = str(tmp / "compacted")
    compact_index(inc, out)

    surv_p = str(tmp / "surv.parquet")
    keep = [u not in set(deleted_urls) for u in urls]
    pq.write_table(docs.filter(np.array(keep)), surv_p)
    surv = str(tmp / "surv_index")
    build_index(surv_p, surv, cfg=CFG, with_cosine_norms=False)

    got = _search(out, tiny_corpus["queries"])
    want = _search(surv, tiny_corpus["queries"])
    pd.testing.assert_frame_equal(got, want)


def test_delete_entire_language_then_compact(ray_session, tiny_corpus,
                                             tmp_path_factory):
    """Tombstoning EVERY doc of one language and compacting must yield a
    servable index whose other languages are untouched and whose deleted
    language yields zero rows (empty-partition encode/df/manifest path)."""
    import ray.data

    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.deletes import delete_docs
    from document_retrieval_ray.pipelines.incremental import compact_index
    from document_retrieval_ray.state.manifest import read_manifest

    tmp = tmp_path_factory.mktemp("lang_del")
    docs = pq.read_table(tiny_corpus["documents"])
    langs = docs["lang"].to_pylist()
    urls = docs["url"].to_pylist()
    # pick the SMALLEST language so the test stays fast
    import collections

    victim_lang = min(collections.Counter(langs).items(),
                      key=lambda kv: kv[1])[0]
    victims = [u for u, l in zip(urls, langs) if l == victim_lang]
    assert victims

    idx = str(tmp / "index")
    build_index(tiny_corpus["documents"], idx, cfg=CFG,
                with_cosine_norms=False)
    assert delete_docs(idx, victims) == len(victims)
    out = str(tmp / "compacted")
    compact_index(idx, out)

    m = read_manifest(os.path.join(out, "manifests", victim_lang))
    assert m is not None and int(m["n_docs"]) == 0

    qdf = pq.read_table(tiny_corpus["queries"]).to_pandas()
    got = _search(out, tiny_corpus["queries"])
    assert not set(got["url"]) & set(victims)
    # the victim language emits no rows; at least one other lang does
    qlang = dict(zip(qdf["query_id"], qdf["lang"]))
    got_langs = {qlang[q] for q in got["query_id"]}
    assert victim_lang not in got_langs and got_langs
