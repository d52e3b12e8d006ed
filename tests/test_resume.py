"""Resume correctness (FIXTURES.md §F3 kill-tests): a build restarted after
losing one partition's commit produces byte-identical index contents."""

import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from document_retrieval_ray.config import IndexConfig, TokenizerConfig


CFG = IndexConfig(
    tokenizer=TokenizerConfig(mode="simple"),
    num_hash_parts=4,
    hot_term_threshold=80,
    salt_shift=5,
    block_size=16,
)


def _index_contents(index_dir, langs):
    out = {}
    for lang in langs:
        post = pq.read_table(os.path.join(index_dir, "postings", f"lang={lang}"))
        pdf = post.to_pandas().sort_values("term").reset_index(drop=True)
        dm = (
            pq.read_table(os.path.join(index_dir, "docmap", f"lang={lang}"))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        out[lang] = (pdf, dm)
    return out


@pytest.mark.usefixtures("ray_session")
def test_killed_partition_rebuild_is_identical(tiny_corpus, tmp_path):
    from document_retrieval_ray.pipelines.build_index import build_index

    a = str(tmp_path / "index_a")
    b = str(tmp_path / "index_b")
    m_a = build_index(tiny_corpus["documents"], a, cfg=CFG, with_cosine_norms=False)
    m_b = build_index(tiny_corpus["documents"], b, cfg=CFG, with_cosine_norms=False)
    langs = sorted(m_a)
    assert langs == sorted(m_b)

    # simulate a crash that lost lang 'en' before its manifest commit:
    victim = "en"
    shutil.rmtree(os.path.join(b, "manifests", victim))
    # partial garbage left behind by the "crash"
    garbage = os.path.join(b, "postings", f"lang={victim}", "garbage.parquet")
    with open(garbage, "wb") as f:
        f.write(b"not a parquet file")

    m_b2 = build_index(tiny_corpus["documents"], b, cfg=CFG, with_cosine_norms=False)
    assert sorted(m_b2) == langs
    assert not os.path.exists(garbage), "uncommitted partition must be cleaned"

    ca = _index_contents(a, langs)
    cb = _index_contents(b, langs)
    for lang in langs:
        pa_df, da = ca[lang]
        pb_df, db = cb[lang]
        pd.testing.assert_frame_equal(da, db)
        pd.testing.assert_frame_equal(
            pa_df[["term", "df", "cf", "postings"]],
            pb_df[["term", "df", "cf", "postings"]],
        )


@pytest.mark.usefixtures("ray_session")
def test_resume_with_cosine_norms(tiny_corpus, tmp_path):
    """ADVICE r1 (medium): resume after a partial commit with the DEFAULT
    with_cosine_norms=True must not crash (df/ still holds committed
    languages that stats doesn't) and must reproduce identical norms."""
    from document_retrieval_ray.pipelines.build_index import build_index

    a = str(tmp_path / "norm_a")
    b = str(tmp_path / "norm_b")
    m_a = build_index(tiny_corpus["documents"], a, cfg=CFG, with_cosine_norms=True)
    build_index(tiny_corpus["documents"], b, cfg=CFG, with_cosine_norms=True)
    langs = sorted(m_a)
    assert len(langs) >= 2, "fixture must span multiple languages"

    victim = langs[0]
    shutil.rmtree(os.path.join(b, "manifests", victim))
    m_b2 = build_index(tiny_corpus["documents"], b, cfg=CFG, with_cosine_norms=True)
    assert sorted(m_b2) == langs

    for lang in langs:
        na = (
            pq.read_table(os.path.join(a, "norms", f"lang={lang}"))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        nb = (
            pq.read_table(os.path.join(b, "norms", f"lang={lang}"))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(na, nb)


@pytest.mark.usefixtures("ray_session")
def test_rewritten_input_same_rows_invalidates(tiny_corpus, tmp_path):
    """ADVICE r1 (low): rewriting the input IN PLACE with the same row
    count must change the fingerprint (size/mtime are folded in), so
    committed shards are rebuilt instead of silently served stale."""
    import pyarrow as pa_mod

    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.state.manifest import read_manifest

    src = str(tmp_path / "docs.parquet")
    shutil.copyfile(tiny_corpus["documents"], src)
    idx = str(tmp_path / "index_rw")
    m1 = build_index(src, idx, cfg=CFG, with_cosine_norms=False)

    # rewrite in place: same rows, different text
    t = pq.read_table(src)
    texts = [(s or "") + " zzchanged" for s in t["text"].to_pylist()]
    t = t.set_column(
        t.schema.get_field_index("text"), "text", pa_mod.array(texts, pa_mod.string())
    )
    pq.write_table(t, src)

    m2 = build_index(src, idx, cfg=CFG, with_cosine_norms=False)
    assert any(
        m2[l]["input_fingerprint"] != m1[l]["input_fingerprint"] for l in m1
    ), "in-place rewrite with identical row count must invalidate resume"


@pytest.mark.usefixtures("ray_session")
def test_changed_input_invalidates(tiny_corpus, small_corpus, tmp_path):
    """A different input fingerprint must NOT be treated as resumable."""
    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.state.manifest import read_manifest

    idx = str(tmp_path / "index_c")
    build_index(tiny_corpus["documents"], idx, cfg=CFG, with_cosine_norms=False)
    m1 = {
        l: read_manifest(os.path.join(idx, "manifests", l))
        for l in os.listdir(os.path.join(idx, "manifests"))
    }
    build_index(small_corpus["documents"], idx, cfg=CFG, with_cosine_norms=False)
    m2 = {
        l: read_manifest(os.path.join(idx, "manifests", l))
        for l in os.listdir(os.path.join(idx, "manifests"))
    }
    assert any(
        m2[l]["input_fingerprint"] != m1[l]["input_fingerprint"]
        for l in m1
        if l in m2
    ), "rebuild against different input must refresh fingerprints"


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("with_norms", [False, True], ids=["segments", "triples"])
def test_hierarchical_merge_byte_identical(tiny_corpus, tmp_path, with_norms):
    """merge_fanout=2 over num_hash_parts=16 runs 4 intermediate rounds
    (16→8→4→2→1); the final postings must be byte-identical to the flat
    single-round merge, in BOTH flows."""
    import dataclasses

    from document_retrieval_ray.pipelines.build_index import build_index

    cfg_flat = IndexConfig(
        tokenizer=TokenizerConfig(mode="simple"),
        num_hash_parts=16,
        hot_term_threshold=60,
        salt_shift=4,
        block_size=16,
    )
    cfg_tree = dataclasses.replace(cfg_flat, merge_fanout=2)
    a = str(tmp_path / f"flat_{with_norms}")
    b = str(tmp_path / f"tree_{with_norms}")
    m_a = build_index(tiny_corpus["documents"], a, cfg=cfg_flat,
                      with_cosine_norms=with_norms)
    m_b = build_index(tiny_corpus["documents"], b, cfg=cfg_tree,
                      with_cosine_norms=with_norms)
    langs = sorted(m_a)
    assert langs == sorted(m_b)
    cols = ["term", "df", "cf", "postings", "block_off", "block_last",
            "block_max_tf", "block_min_dl"]
    for lang in langs:
        pa_df = (
            pq.read_table(os.path.join(a, "postings", f"lang={lang}"))
            .to_pandas().sort_values("term").reset_index(drop=True)
        )
        pb_df = (
            pq.read_table(os.path.join(b, "postings", f"lang={lang}"))
            .to_pandas().sort_values("term").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(pa_df[cols], pb_df[cols])


@pytest.mark.usefixtures("ray_session")
def test_segments_flow_equals_triples_flow(tiny_corpus, tmp_path):
    """The fast segments flow and the triples flow must produce identical
    posting lists (df/cf/postings bytes per term)."""
    from document_retrieval_ray.pipelines.build_index import build_index

    a = str(tmp_path / "idx_triples")
    b = str(tmp_path / "idx_segments")
    build_index(tiny_corpus["documents"], a, cfg=CFG, with_cosine_norms=True)
    build_index(tiny_corpus["documents"], b, cfg=CFG, with_cosine_norms=False)
    langs = sorted(os.listdir(os.path.join(a, "manifests")))
    assert langs == sorted(os.listdir(os.path.join(b, "manifests")))
    for lang in langs:
        pa_df = (
            pq.read_table(os.path.join(a, "postings", f"lang={lang}"))
            .to_pandas().sort_values("term").reset_index(drop=True)
        )
        pb_df = (
            pq.read_table(os.path.join(b, "postings", f"lang={lang}"))
            .to_pandas().sort_values("term").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            pa_df[["term", "df", "cf", "postings"]],
            pb_df[["term", "df", "cf", "postings"]],
        )
