"""Index build (Phase 2): shuffle correctness vs the numpy oracle —
doc ids, docmap, df table, stats, codec round-trip through the shard."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from document_retrieval_ray.config import IndexConfig, TokenizerConfig
from document_retrieval_ray.oracle import OracleIndex
from document_retrieval_ray.state.index_shard import LangIndex
from document_retrieval_ray.state.manifest import read_manifest


@pytest.fixture(scope="module")
def built(ray_session, tiny_corpus, tmp_path_factory):
    from document_retrieval_ray.pipelines.build_index import build_index

    index_dir = str(tmp_path_factory.mktemp("index"))
    cfg = IndexConfig(
        tokenizer=TokenizerConfig(mode="simple"),
        num_hash_parts=8,
        hot_term_threshold=50,   # force salting of Zipf-head terms
        salt_shift=5,            # doc-range buckets of 32
        block_size=16,           # force multi-block posting lists
    )
    manifests = build_index(
        tiny_corpus["documents"], index_dir, cfg=cfg, with_cosine_norms=True
    )
    return index_dir, cfg, manifests


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    docs = pq.read_table(tiny_corpus["documents"])
    return OracleIndex(docs, TokenizerConfig(mode="simple"), num_hash_parts=8)


def test_manifests_committed(built):
    index_dir, cfg, manifests = built
    assert manifests
    for lang, m in manifests.items():
        assert m["n_docs"] > 0
        disk = read_manifest(os.path.join(index_dir, "manifests", lang))
        assert disk is not None and disk["n_docs"] == m["n_docs"]


def test_stats_match_oracle(built, oracle):
    index_dir, cfg, manifests = built
    assert sorted(manifests) == oracle.langs
    for lang in oracle.langs:
        m = manifests[lang]
        assert m["n_docs"] == oracle.N[lang]
        assert m["avgdl"] == pytest.approx(oracle.avgdl[lang], rel=1e-12)


def test_docmap_matches_oracle(built, oracle):
    index_dir, _, _ = built
    for lang in oracle.langs:
        dm = pq.read_table(os.path.join(index_dir, "docmap", f"lang={lang}"))
        order = np.argsort(dm["doc_id"].to_numpy(zero_copy_only=False))
        urls = np.asarray(dm["url"].to_pandas(), dtype=object)[order]
        assert list(urls) == list(oracle.doc_urls[lang]), lang
        dls = dm["dl"].to_numpy(zero_copy_only=False)[order]
        assert list(dls) == list(oracle.dl[lang].astype(int)), lang


def test_df_table_matches_oracle(built, oracle):
    index_dir, _, _ = built
    for lang in oracle.langs:
        t = pq.read_table(
            os.path.join(index_dir, "df", f"lang={lang}"), columns=["term", "df"]
        )
        got = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        assert got == oracle.df[lang], lang


def test_postings_roundtrip_matches_oracle(built, oracle):
    """Decode every posting list from the shard and compare (docids, tfs)
    against the oracle's Counters — covers salting + merge + codec."""
    index_dir, cfg, _ = built
    for lang in oracle.langs:
        idx = LangIndex(index_dir, lang)
        assert set(idx._terms) == set(oracle.df[lang]), lang
        for term in sorted(oracle.df[lang]):
            got_docs, got_tfs = idx.postings(term)
            exp_docs, exp_tfs = oracle._postings(lang, term)
            assert list(got_docs) == list(exp_docs), (lang, term)
            assert list(got_tfs.astype(int)) == list(exp_tfs.astype(int)), (lang, term)
            assert idx.df(term) == len(exp_docs)
            # strictly ascending doc ids even through salted merge
            assert (np.diff(got_docs) > 0).all() if len(got_docs) > 1 else True


def test_hot_terms_were_salted(built, oracle):
    """The skew path must actually exercise: some term exceeds the
    threshold in the tiny Zipf corpus."""
    _, cfg, _ = built
    max_df = max(max(d.values()) for d in oracle.df.values())
    assert max_df > cfg.hot_term_threshold, (
        "fixture no longer exercises the hot-term salting path"
    )


def test_cosine_norms_match_oracle(built, oracle):
    index_dir, _, _ = built
    for lang in oracle.langs:
        idx = LangIndex(index_dir, lang)
        exp = oracle.cosine_norms(lang)
        assert idx.norms == pytest.approx(exp, rel=1e-9), lang


def test_resume_skips_committed(built, tiny_corpus):
    """Second build over the same input must be a no-op (all langs skipped)."""
    from document_retrieval_ray.pipelines.build_index import build_index

    index_dir, cfg, manifests = built
    before = {
        lang: os.path.getmtime(os.path.join(index_dir, "manifests", lang, "manifest.json"))
        for lang in manifests
    }
    again = build_index(tiny_corpus["documents"], index_dir, cfg=cfg)
    assert sorted(again) == sorted(manifests)
    for lang in manifests:
        after = os.path.getmtime(
            os.path.join(index_dir, "manifests", lang, "manifest.json")
        )
        assert after == before[lang], f"{lang} was rebuilt"


@pytest.mark.usefixtures("ray_session")
def test_min_df_filter(tiny_corpus, tmp_path):
    """M9 low-frequency-term filter (ranking_with_bm25.py:128-132):
    min_df=2 must drop every df-1 term from the postings (both flows)."""
    from document_retrieval_ray.pipelines.build_index import build_index
    import pyarrow.parquet as pq2

    for flow_norms in (False, True):
        idx = str(tmp_path / f"minidx_{flow_norms}")
        cfg = IndexConfig(
            tokenizer=TokenizerConfig(mode="simple"),
            num_hash_parts=4, min_df=2, hot_term_threshold=10**9,
        )
        m = build_index(
            tiny_corpus["documents"], idx, cfg=cfg, with_cosine_norms=flow_norms
        )
        for lang in m:
            t = pq2.read_table(
                os.path.join(idx, "postings", f"lang={lang}"), columns=["df"]
            )
            dfs = t["df"].to_numpy(zero_copy_only=False)
            assert len(dfs) > 0 and (dfs >= 2).all(), (lang, flow_norms)


@pytest.mark.usefixtures("ray_session")
def test_cosine_norms_cogroup_path_identical(built, tiny_corpus, tmp_path, monkeypatch):
    """The term-bucket cogroup norms path (vocab too big to broadcast)
    must produce the same norms as the broadcast path."""
    import pandas as pd

    from document_retrieval_ray.pipelines.build_index import build_index

    index_dir, cfg, manifests = built
    b = str(tmp_path / "norm_cogroup")
    monkeypatch.setenv("DRR_NORM_BCAST_MAX", "0")  # force the cogroup path
    build_index(tiny_corpus["documents"], b, cfg=cfg, with_cosine_norms=True)
    for lang in sorted(manifests):
        na = (
            pq.read_table(os.path.join(index_dir, "norms", f"lang={lang}"))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        nb = (
            pq.read_table(os.path.join(b, "norms", f"lang={lang}"))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert list(na["doc_id"]) == list(nb["doc_id"]), lang
        # summation order differs between the paths → allow ulp-level drift
        assert np.allclose(na["norm2"], nb["norm2"], rtol=1e-12, atol=0), lang


@pytest.mark.usefixtures("ray_session")
def test_empty_corpus_build(tmp_path):
    """A zero-row corpus must build to an empty (but valid) index and
    queries against it must return no rows without crashing."""
    import pyarrow as pa
    import pyarrow.parquet as pqt
    import ray.data

    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.query import bm25_search

    src = str(tmp_path / "empty.parquet")
    pqt.write_table(
        pa.table(
            {
                "url": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
            }
        ),
        src,
    )
    idx = str(tmp_path / "empty_idx")
    manifests = build_index(src, idx, cfg=IndexConfig(), with_cosine_norms=False)
    assert manifests == {}
    qds = ray.data.from_items(
        [{"query_id": "q1", "query": "anything", "lang": "en"}]
    )
    res = bm25_search(qds, idx).to_pandas()
    assert len(res) == 0


def test_encode_segments_many_byte_identical_to_loop():
    """The vectorized multi-segment encoder must be BYTE-identical to the
    per-term _append_segment_row loop (the merge tree's associativity and
    the resume byte-identity guarantees rest on this)."""
    import numpy as np
    import pyarrow as pa

    from document_retrieval_ray.stages.index_build import (
        _ENCODED_SCHEMA,
        _append_segment_row,
        encode_segments_many,
    )

    rng = np.random.default_rng(11)
    for trial in range(10):
        T = int(rng.integers(1, 30))
        B = int(rng.choice([1, 2, 3, 8, 128]))
        lang, term, salt, doc, tf, dl, starts = [], [], [], [], [], [], [0]
        for t in range(T):
            df = int(rng.integers(1, 300))
            d = np.sort(
                rng.choice(
                    np.arange(0, 5_000_000, dtype=np.int64),
                    size=df,
                    replace=False,
                )
            )
            lang.append(f"l{rng.integers(0, 3)}")
            term.append(f"t{trial}_{t}")
            salt.append(int(rng.integers(0, 32)))
            doc.append(d)
            tf.append(rng.integers(1, 1000, size=df).astype(np.int64))
            dl.append(rng.integers(1, 5000, size=df).astype(np.int64))
            starts.append(starts[-1] + df)
        docf = np.concatenate(doc)
        tff = np.concatenate(tf)
        dlf = np.concatenate(dl)
        new = encode_segments_many(
            np.array(lang, object), np.array(term, object), np.array(salt),
            docf, tff, dlf, np.array(starts), B,
        )
        cols = {f.name: [] for f in _ENCODED_SCHEMA}
        for i in range(T):
            s, e = starts[i], starts[i + 1]
            _append_segment_row(
                cols, lang[i], term[i], salt[i],
                docf[s:e], tff[s:e], dlf[s:e], B,
            )
        old = pa.table(
            {f.name: pa.array(cols[f.name], f.type) for f in _ENCODED_SCHEMA},
            schema=_ENCODED_SCHEMA,
        )
        assert new.equals(old), f"trial {trial} (block_size={B})"


def test_decode_segments_many_roundtrip():
    import numpy as np

    from document_retrieval_ray.functions.varbyte import (
        decode_segments_many,
        encode_blocked_postings,
    )

    rng = np.random.default_rng(13)
    for B in (1, 3, 128):
        bufs, dfs, docs, tfs = [], [], [], []
        for _ in range(25):
            df = int(rng.integers(1, 500))
            d = np.sort(
                rng.choice(
                    np.arange(0, 3_000_000, dtype=np.int64),
                    size=df,
                    replace=False,
                )
            )
            f = rng.integers(1, 900, size=df).astype(np.int64)
            buf, _ = encode_blocked_postings(d, f, B)
            bufs.append(buf)
            dfs.append(df)
            docs.append(d)
            tfs.append(f)
        dd, tt, st = decode_segments_many(bufs, np.array(dfs), B)
        assert np.array_equal(dd, np.concatenate(docs))
        assert np.array_equal(tt, np.concatenate(tfs))
        assert np.array_equal(st, np.concatenate([[0], np.cumsum(dfs)]))
