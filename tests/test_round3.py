"""Round-3 fix tests: CLI arg plumbing, tokenizer manifest round-trip,
dedup-config knobs + truncation audit, LSH sign determinism, zero-copy
embedding stacking, vectorized sentence split, sentence-key bounds,
submission invariants, and the C7 pluggable-model contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- CLI


def test_cli_num_cpus_position_independent(monkeypatch):
    """`--num-cpus` must be honored whether it comes before or after the
    subcommand (the argparse _SubParsersAction default-overwrite bug)."""
    from document_retrieval_ray import cli

    captured = {}

    class _Stop(Exception):
        pass

    def fake_ensure(n=None):
        captured["n"] = n
        raise _Stop

    monkeypatch.setattr(cli, "_ensure_ray", fake_ensure)
    base = ["build", "--input", "x.parquet", "--index", "/tmp/nope"]

    with pytest.raises(_Stop):
        cli.main(["--num-cpus", "8"] + base)
    assert captured["n"] == 8

    with pytest.raises(_Stop):
        cli.main(base + ["--num-cpus", "6"])
    assert captured["n"] == 6

    with pytest.raises(_Stop):
        cli.main(base)
    assert captured["n"] is None


def test_index_tokenizer_full_roundtrip(tmp_path):
    """_index_tokenizer must restore EVERY TokenizerConfig field from the
    manifest, and default sanely for pre-round-3 manifests."""
    import os

    from document_retrieval_ray.cli import _index_tokenizer
    from document_retrieval_ray.config import TokenizerConfig
    from document_retrieval_ray.state.manifest import write_manifest

    idx = tmp_path / "idx"
    write_manifest(
        str(idx / "manifests" / "en"),
        {
            "tokenizer_mode": "reference",
            "tokenizer_stopwords": True,
            "tokenizer_min_token_len": 2,
            "tokenizer_bigram_langs": ["de"],
        },
    )
    got = _index_tokenizer(str(idx))
    assert got == TokenizerConfig(
        mode="reference", stopwords=True, min_token_len=2, bigram_langs=("de",)
    )

    # legacy manifest (mode only) → defaults for the missing fields
    idx2 = tmp_path / "idx2"
    write_manifest(str(idx2 / "manifests" / "en"), {"tokenizer_mode": "simple"})
    got2 = _index_tokenizer(str(idx2))
    assert got2.mode == "simple" and got2.stopwords is False
    assert got2.min_token_len == 1
    # missing index dir → pure default
    assert _index_tokenizer(str(tmp_path / "missing")) == TokenizerConfig()
    assert os.path.isdir(idx / "manifests")


# ------------------------------------------------- dedup config + audit


def test_dedup_truncation_audited_minhash():
    """A band bucket over max_bucket must WARN with the dropped count and
    keep the deterministic sorted-doc_id prefix (the no-silent-caps rule)."""
    from document_retrieval_ray.stages.dedup import band_group_pairs

    g = pd.DataFrame(
        {
            "doc_id": np.arange(10)[::-1],  # unsorted on purpose
            "band_idx": 0,
            "band_key": "k",
        }
    )
    with pytest.warns(RuntimeWarning, match="truncated.*dropped 6"):
        pairs = band_group_pairs(g, max_bucket=4)
    # prefix = sorted ids 0..3 → C(4,2)=6 pairs, all within the prefix
    assert len(pairs) == 6
    assert pairs["a"].max() <= 3 and pairs["b"].max() <= 3

    # at/below the cap: silent
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        pairs_ok = band_group_pairs(g, max_bucket=10)
    assert len(pairs_ok) == 45


def test_dedup_truncation_audited_simhash():
    from document_retrieval_ray.stages.dedup import simhash_band_pairs

    g = pd.DataFrame(
        {
            "doc_id": np.arange(8),
            "band": 1,
            "chunk": 7,
            "simhash_i": np.int64(0),  # identical → Hamming 0, all pairs
        }
    )
    with pytest.warns(RuntimeWarning, match="truncated.*dropped 5"):
        pairs = simhash_band_pairs(g, max_hamming=3, max_bucket=3)
    assert len(pairs) == 3  # C(3,2)
    assert set(pairs["a"]) <= {0, 1} and set(pairs["b"]) <= {1, 2}


def test_dedup_config_plumbed():
    """emit_band_rows honors a non-default DedupConfig: num_hashes=4,
    band_size=2 → 2 band rows per non-empty doc."""
    from document_retrieval_ray.config import DedupConfig
    from document_retrieval_ray.stages.dedup import DEFAULT_DEDUP, emit_band_rows

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["the quick brown fox jumps over the lazy dog", ""],
        }
    )
    out_default = emit_band_rows(t, cfg=DEFAULT_DEDUP)
    # default 8 hashes / band_size 2 → 4 bands; empty doc emits none
    assert len(out_default) == 4

    out_small = emit_band_rows(t, cfg=DedupConfig(num_hashes=4, band_size=2))
    assert len(out_small) == 2
    assert out_small["band_idx"].to_pylist() == [0, 1]


# ------------------------------------------------------ LSH sign robust


def test_lsh_sign_near_zero_deterministic():
    """Projections within the 1e-12 grid of zero must land in the SAME
    bucket bit regardless of summation order: both ±1e-15 round to bit 0."""
    from document_retrieval_ray.stages.ann import lsh_bucket

    planes = np.array([[1.0]])  # dim=1, one plane: dot = the value itself
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[1e-15], [-1e-15], [1.0], [-1.0]], pa.list_(pa.float64())
            ),
        }
    )
    out = lsh_bucket(t, planes=planes)
    assert out["bucket"].to_pylist() == [0, 0, 1, 0]


# --------------------------------------------------- zero-copy _stack


def test_stack_fixed_size_list():
    from document_retrieval_ray.stages.ann import _stack

    arr = pa.FixedSizeListArray.from_arrays(
        pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float32()), 3
    )
    m = _stack(arr)
    assert m.dtype == np.float64 and m.shape == (2, 3)
    np.testing.assert_array_equal(m, [[1, 2, 3], [4, 5, 6]])


def test_stack_list_chunked_and_sliced():
    from document_retrieval_ray.stages.ann import _stack

    base = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], pa.list_(pa.float64()))
    chunked = pa.chunked_array([base.slice(0, 1), base.slice(1, 2)])
    np.testing.assert_array_equal(
        _stack(chunked), [[1, 2], [3, 4], [5, 6]]
    )
    # a sliced ListArray has a nonzero offset — flatten() must honor it
    sl = base.slice(1, 2)
    np.testing.assert_array_equal(_stack(sl), [[3, 4], [5, 6]])


def test_stack_ragged_fallback():
    from document_retrieval_ray.stages.ann import _stack

    # equal lengths → matrix even through the pylist fallback w/ nulls
    ragged = pa.array([[1.0], [2.0, 3.0]], pa.list_(pa.float64()))
    with pytest.raises(Exception):
        _stack(ragged)  # genuinely ragged: no rectangular matrix exists
    withnull = pa.array([[1.0, 2.0], None], pa.list_(pa.float64()))
    # null rows take the fallback path (never the reshape fast path) and
    # fail there too — a null embedding has no rectangular representation
    with pytest.raises(Exception):
        _stack(withnull)


# ------------------------------------------- vectorized sentence split


def _py_split(texts):
    out = []
    for row, text in enumerate(texts):
        for i, s in enumerate((text or "").split(".")):
            s = s.strip(" ")
            if s:
                out.append((row, i, s))
    return out


@pytest.mark.parametrize(
    "texts",
    [
        ["a.b.c", "", None, "...", " x . y ", "no dots here"],
        ["héllo wörld. ünïcode.", ".", "a..b", "  .  leading"],
        [None, None],
        ["." * 50],
        ["tail dot ends it."],
    ],
)
def test_vector_split_matches_python(texts):
    from document_retrieval_ray.pipelines.testdata_queries import (
        _vector_split_sentences,
    )

    t = pa.table({"text": pa.array(texts, pa.string())})
    sel, sidx, sents = _vector_split_sentences(t)
    got = list(zip(sel.tolist(), sidx.tolist(), sents.to_pylist()))
    assert got == _py_split(texts)


def test_vector_split_sliced_batch():
    """Ray hands out zero-copy SLICES of tables; the offsets math must
    honor a nonzero table offset."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        _vector_split_sentences,
    )

    full = pa.table({"text": pa.array(["drop me.", "a.b", "c. d."])})
    sl = full.slice(1, 2)
    sel, sidx, sents = _vector_split_sentences(sl)
    assert list(zip(sel.tolist(), sidx.tolist(), sents.to_pylist())) == [
        (0, 0, "a"),
        (0, 1, "b"),
        (1, 0, "c"),
        (1, 1, "d"),
    ]


def test_sent_key_bounds_guard():
    from document_retrieval_ray.pipelines.testdata_queries import (
        SENT_FACTOR,
        check_sent_key_bounds,
    )

    check_sent_key_bounds(10**6, SENT_FACTOR - 1)  # max legal
    with pytest.raises(ValueError, match="doc_id"):
        check_sent_key_bounds(10**7, 0)
    with pytest.raises(ValueError, match="sent_idx"):
        check_sent_key_bounds(1, SENT_FACTOR)


# ---------------------------------------------- submission invariants


@pytest.mark.usefixtures("ray_session")
def test_submission_rejects_duplicate_docids():
    import ray.data

    from document_retrieval_ray.pipelines.query import to_submission

    rows = [
        {"query_id": 1, "rank": 1, "url": "d1"},
        {"query_id": 1, "rank": 2, "url": "d1"},  # duplicate!
    ]
    ds = ray.data.from_items(rows)
    with pytest.raises(Exception, match="duplicate doc ids"):
        to_submission(ds, num_parts=2).take_all()


@pytest.mark.usefixtures("ray_session")
def test_submission_enforces_k_and_passes_clean():
    import ray.data

    from document_retrieval_ray.pipelines.query import to_submission

    rows = [
        {"query_id": q, "rank": r, "url": f"d{r}"}
        for q in (1, 2)
        for r in (1, 2, 3)
    ]
    ds = ray.data.from_items(rows)
    ok = to_submission(ds, num_parts=2, k=3).take_all()
    assert sorted(r["query_id"] for r in ok) == [1, 2]
    assert all(r["docids"] == "['d1', 'd2', 'd3']" for r in ok)
    with pytest.raises(Exception, match="more than k=2"):
        to_submission(ds, num_parts=2, k=2).take_all()


# --------------------------------------------- C7 pluggable model oracle


@pytest.mark.usefixtures("ray_session")
def test_c7_model_factory_roundtrip_oracle():
    """The pluggable-model contract itself, oracled: a tiny deterministic
    numpy 'model' wired through EmbedStage → DenseRerankStage must produce
    hand-computed cosine scores (model_factory called once per actor)."""
    import ray.data

    from document_retrieval_ray.stages.embed import DenseRerankStage, EmbedStage

    DIM = 3

    class TinyModel:
        """encode(text) = [len, #vowels, 1] — deterministic, no RNG."""

        def encode(self, texts):
            return np.array(
                [
                    [len(t or ""), sum((t or "").count(v) for v in "aeiou"), 1.0]
                    for t in texts
                ],
                dtype=np.float64,
            )

    docs = [
        {"doc_id": 0, "text": "alpha beta"},
        {"doc_id": 1, "text": "zz"},
        {"doc_id": 2, "text": "queueing"},
    ]
    emb = (
        ray.data.from_items(docs)
        .repartition(2)
        .map_batches(
            EmbedStage,
            fn_constructor_kwargs=dict(model_factory=TinyModel, dim=DIM),
            batch_format="pyarrow",
            batch_size=32,
            concurrency=1,
        )
        .take_all()
    )
    m = TinyModel()
    by_id = {r["doc_id"]: np.asarray(r["embedding"]) for r in emb}
    for d in docs:
        want = m.encode([d["text"]])[0].astype(np.float32)
        np.testing.assert_allclose(by_id[d["doc_id"]], want, rtol=1e-6)

    # rerank: candidates carry cand_embedding; score = cos(q_vec, cand)
    cand = [
        {
            "query_id": 7,
            "query": "abc",
            "url": f"u{d['doc_id']}",
            "cand_embedding": by_id[d["doc_id"]].astype(np.float64).tolist(),
        }
        for d in docs
    ]
    scored = (
        ray.data.from_items(cand)
        .map_batches(
            DenseRerankStage,
            fn_constructor_kwargs=dict(model_factory=TinyModel),
            batch_format="pyarrow",
            batch_size=32,
            concurrency=1,
        )
        .take_all()
    )
    qv = m.encode(["abc"])[0]
    for r in scored:
        did = int(r["url"][1:])
        cv = by_id[did].astype(np.float64)
        want = float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv)))
        assert abs(r["dense_score"] - want) < 1e-6
        assert r["dense_score_x"] == int(np.floor(want * 10000 + 0.5))


# --------------------------------------- df side-writes + overflow path


def _read_df_dir(index_dir):
    import os

    import pyarrow.dataset as pads

    t = (
        pads.dataset(os.path.join(index_dir, "df"), format="parquet",
                     partitioning="hive")
        .to_table()
        .to_pandas()
    )
    t["lang"] = t["lang"].astype(str)
    return (
        t[["lang", "term", "df"]]
        .sort_values(["lang", "term"])
        .reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("norms", [False, True], ids=["segments", "triples"])
def test_df_overflow_fallback_matches_driver_fold(
    tiny_corpus, tmp_path, monkeypatch, norms
):
    """The distributed df fallback (vocab over the driver guard) must
    produce the same df table and manifest stats as the driver fold, in
    BOTH flows — and the triples flow must still encode correctly without
    a vocab_ref (string-keyed shuffle path)."""
    from document_retrieval_ray.pipelines.build_index import build_index

    tag = "t" if norms else "s"
    idx_a = str(tmp_path / f"idx_driver_{tag}")
    ma = build_index(tiny_corpus["documents"], idx_a, with_cosine_norms=norms)

    monkeypatch.setenv("DRR_DF_MAX_TERMS", "0")  # trip overflow immediately
    idx_b = str(tmp_path / f"idx_dist_{tag}")
    mb = build_index(tiny_corpus["documents"], idx_b, with_cosine_norms=norms)

    da, db = _read_df_dir(idx_a), _read_df_dir(idx_b)
    pd.testing.assert_frame_equal(da, db, check_dtype=False)
    for lang in ma:
        assert ma[lang]["n_terms"] == mb[lang]["n_terms"]
        assert ma[lang]["n_postings"] == mb[lang]["n_postings"]
        assert ma[lang]["n_docs"] == mb[lang]["n_docs"]


# ------------------------------------------------------------- IVF ANN


@pytest.mark.usefixtures("ray_session")
class TestIVF:
    def _emb_ds(self, mat):
        import ray.data

        t = pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        )
        return ray.data.from_arrow(t).repartition(4)

    def test_fit_deterministic(self):
        """Two fits over the same (multi-block) dataset are bit-identical —
        the fixed-point sum rounding makes partial-order irrelevant."""
        from document_retrieval_ray.stages.ann import fit_ivf_centroids

        rng = np.random.default_rng(3)
        mat = rng.standard_normal((100, 8))
        ds = self._emb_ds(mat)
        c1 = fit_ivf_centroids(ds, 4, 2)
        c2 = fit_ivf_centroids(ds, 4, 2)
        np.testing.assert_array_equal(c1, c2)
        assert c1.shape == (4, 8)

    def test_empty_cell_keeps_previous_centroid(self):
        """Rows 0 and 1 identical → every vector tie-breaks to cell 0, so
        cell 1 empties after one iteration and must keep its init vector
        (the oracle's LEFT JOIN + COALESCE semantics)."""
        from document_retrieval_ray.stages.ann import fit_ivf_centroids

        rng = np.random.default_rng(5)
        mat = rng.standard_normal((20, 4))
        mat[1] = mat[0]
        ds = self._emb_ds(mat)
        cent = fit_ivf_centroids(ds, 2, 1)
        np.testing.assert_array_equal(cent[1], mat[1])
        assert not np.array_equal(cent[0], mat[0])  # cell 0 moved

    def test_full_probe_equals_exact(self):
        """nprobe = nlist → the candidate set is the whole corpus, so IVF
        results must equal the exact brute-force ranking."""
        import ray

        from document_retrieval_ray.stages.ann import (
            BruteForceTopK,
            IVFTopK,
            final_topk,
            fit_ivf_centroids,
            ivf_assign_batch,
        )

        rng = np.random.default_rng(7)
        mat = rng.standard_normal((120, 8))
        ds = self._emb_ds(mat)
        nlist = 4
        cent = fit_ivf_centroids(ds, nlist, 2)
        assigned = ds.map_batches(
            ivf_assign_batch, fn_kwargs={"centroids": cent},
            batch_format="pyarrow",
        )
        qids = [0, 5, 9]
        qmat = mat[qids].astype(np.float64)
        all_cells = [list(range(nlist))] * len(qids)
        ivf_ref = ray.put((qids, qmat, all_cells))
        bf_ref = ray.put((qids, qmat))
        got = (
            assigned.map_batches(
                IVFTopK,
                fn_constructor_kwargs={"queries_ref": ivf_ref, "k": 5},
                batch_format="pyarrow", concurrency=1,
            )
            .groupby("query_vec")
            .map_groups(lambda g: final_topk(g, k=5), batch_format="pandas")
            .to_pandas()
        )
        exp = (
            ds.map_batches(
                BruteForceTopK,
                fn_constructor_kwargs={"queries_ref": bf_ref, "k": 5},
                batch_format="pyarrow", concurrency=1,
            )
            .groupby("query_vec")
            .map_groups(lambda g: final_topk(g, k=5), batch_format="pandas")
            .to_pandas()
        )
        key = ["query_vec", "rank"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            exp.sort_values(key).reset_index(drop=True),
        )


# ---------------------------------------------------------------- ngram jaccard


class TestPrefixFilterJaccard:
    """The AllPairs prefix filter (stages/dedup.py) must be LOSSLESS:
    every pair with Jaccard >= t shares a shingle within both docs'
    df-ordered prefixes. Pure-numpy property test over random set
    families (no Ray)."""

    @staticmethod
    def _pipeline_pairs(sets: dict, threshold: float) -> set:
        """Drive the three partition stages exactly as q_ngram_jaccard
        wires them (single partition = one global group)."""
        from document_retrieval_ray.stages.dedup import (
            prefix_rows_partition,
            shingle_bucket_pairs_partition,
            shingle_df_partition,
        )

        rows = []
        for doc, s in sets.items():
            for sh in s:
                rows.append((sh, doc, len(s)))
        if not rows:
            return set()
        ex = pd.DataFrame(rows, columns=["sh", "doc_id", "n"])
        with_df = shingle_df_partition(ex)
        prefix = prefix_rows_partition(with_df, threshold)
        pairs = shingle_bucket_pairs_partition(prefix, max_bucket=10_000)
        return set(zip(pairs["a"].tolist(), pairs["b"].tolist()))

    def test_prefix_candidates_superset_of_true_pairs(self):
        rng = np.random.default_rng(11)
        for trial in range(20):
            universe = rng.integers(0, 60, size=40)
            sets = {}
            for doc in range(30):
                k = int(rng.integers(1, 12))
                sets[doc] = set(int(x) for x in rng.choice(universe, size=k))
            for threshold in (0.3, 0.5, 0.8):
                cands = self._pipeline_pairs(sets, threshold)
                for a in sets:
                    for b in sets:
                        if a >= b:
                            continue
                        inter = len(sets[a] & sets[b])
                        union = len(sets[a] | sets[b])
                        if union and inter / union >= threshold:
                            assert (a, b) in cands, (
                                f"trial {trial} t={threshold}: true pair "
                                f"({a},{b}) J={inter/union:.2f} missed"
                            )

    def test_identical_and_disjoint_sets(self):
        sets = {0: {1, 2, 3}, 1: {1, 2, 3}, 2: {7, 8, 9}, 3: {10}}
        cands = self._pipeline_pairs(sets, 0.9)
        assert (0, 1) in cands
        assert (2, 3) not in cands and (0, 2) not in cands

    def test_bucket_truncation_audited(self):
        import warnings

        from document_retrieval_ray.stages.dedup import (
            shingle_bucket_pairs_partition,
        )

        g = pd.DataFrame({"sh": [5] * 10, "doc_id": list(range(10))})
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            pairs = shingle_bucket_pairs_partition(g, max_bucket=4)
        assert len(pairs) == 6  # C(4,2) from the sorted prefix
        assert any("truncated" in str(x.message) for x in w)


# --------------------------------------------- phrase search / sessionize


class TestPhraseSearch:
    def _scan(self, docs):
        """Run q_phrase_search's kernel logic through a tiny in-memory
        corpus written to parquet (exercises the real pipeline)."""
        import ray

        from document_retrieval_ray.pipelines.testdata_queries import (
            q_phrase_search,
        )
        import os
        import tempfile

        d = tempfile.mkdtemp()
        pa_tbl = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(pa_tbl, os.path.join(d, "documents.parquet"))
        out = q_phrase_search(d).to_pandas()
        return {
            (r.phrase_id, r.doc_id): r.n_matches for r in out.itertuples()
        }

    def test_overlapping_repeated_terms(self, ray_session):
        # "batch batch batch" contains TWO overlapping "batch batch"
        m = self._scan(["batch batch batch", "batch", "x batch batch y"])
        assert m[("p2", 0)] == 2
        assert ("p2", 1) not in m
        assert m[("p2", 2)] == 1

    def test_no_cross_document_match(self, ray_session):
        # doc 0 ends with 'table', doc 1 starts with 'scan' — adjacency
        # must not leak across document boundaries
        m = self._scan(["slow merge table", "scan fast join"])
        assert not any(pid == "p1" for pid, _ in m)

    def test_trigram_and_punctuation_normalization(self, ray_session):
        m = self._scan(["Big, ORDER... scan!", "big order; sort scan"])
        assert m[("p3", 0)] == 1
        assert ("p3", 1) not in m


class TestSessionize:
    def _sessions(self, rows):
        from document_retrieval_ray.pipelines.testdata_queries import (
            _session_partition,
        )

        g = pd.DataFrame(
            rows, columns=["user_id", "event_id", "tsu", "value_c"]
        )
        return _session_partition(g)

    def test_gap_boundary_is_strict(self):
        from document_retrieval_ray.pipelines.testdata_queries import (
            SESSION_GAP_US,
        )

        t0 = 1_700_000_000_000_000
        out = self._sessions(
            [
                (1, 0, t0, 10),
                (1, 1, t0 + SESSION_GAP_US, 20),  # exactly the gap: SAME session
                (1, 2, t0 + 2 * SESSION_GAP_US + 1, 30),  # gap+1: NEW session
            ]
        )
        assert len(out) == 2
        s1 = out[out.session_idx == 1].iloc[0]
        assert s1.n_events == 2 and s1.value_c == 30
        s2 = out[out.session_idx == 2].iloc[0]
        assert s2.n_events == 1 and s2.start_us == t0 + 2 * SESSION_GAP_US + 1

    def test_multiple_users_interleaved(self):
        t0 = 1_700_000_000_000_000
        out = self._sessions(
            [
                (2, 0, t0, 1),
                (1, 1, t0 + 5, 2),
                (2, 2, t0 + 10, 4),
                (1, 3, t0 + 15, 8),
            ]
        )
        # each user: one session of 2 events; session_idx restarts per user
        assert sorted(out.user_id.tolist()) == [1, 2]
        assert out.session_idx.tolist() == [1, 1]
        assert out.n_events.tolist() == [2, 2]
        assert sorted(out.value_c.tolist()) == [5, 10]

    def test_unsorted_input_and_ts_ties(self):
        t0 = 1_700_000_000_000_000
        # ties on tsu break by event_id; input arrives unsorted
        out = self._sessions(
            [
                (1, 5, t0 + 100, 1),
                (1, 2, t0, 2),
                (1, 9, t0 + 100, 4),
            ]
        )
        assert len(out) == 1
        r = out.iloc[0]
        assert r.n_events == 3 and r.value_c == 7
        assert r.start_us == t0 and r.end_us == t0 + 100

    def test_empty_partition(self):
        out = self._sessions([])
        assert len(out) == 0
        assert list(out.columns) == [
            "user_id", "session_idx", "start_us", "end_us",
            "n_events", "value_c",
        ]


class TestPhraseSnippets:
    def _snips(self, docs):
        import os
        import tempfile

        import pyarrow.parquet as pq

        from document_retrieval_ray.pipelines.testdata_queries import (
            q_phrase_snippets,
        )

        d = tempfile.mkdtemp()
        t = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = q_phrase_snippets(d).to_pandas()
        return {(r.phrase_id, r.doc_id): r.snippet for r in out.itertuples()}

    def test_window_clipping_and_first_occurrence(self, ray_session):
        s = self._snips(
            [
                "table scan at start of doc",       # clipped left
                "ends with a table scan",            # clipped right
                "x y table scan z w table scan",     # first occurrence wins
            ]
        )
        assert s[("p1", 0)] == "table scan at start"
        assert s[("p1", 1)] == "with a table scan"
        assert s[("p1", 2)] == "x y table scan z w"


# ------------------------------------------- round-3 serving fast paths


def _topk_bruteforce(scores, urls, k, round_dp):
    """Reference implementation: full sort on (rounded key desc, url asc)."""
    pos = np.nonzero(scores > 0)[0]
    if pos.size == 0:
        return [], [], []
    key = (
        np.floor(scores[pos] * (10.0 ** round_dp) + 0.5)
        if round_dp is not None
        else scores[pos]
    )
    order = sorted(range(pos.size), key=lambda i: (-key[i], urls[pos[i]]))[:k]
    return (
        list(range(1, len(order) + 1)),
        [int(pos[i]) for i in order],
        [key[i] for i in order],
    )


@pytest.mark.parametrize(
    "case",
    [
        "ties_heavy",      # few distinct rounded keys → big tie groups
        "all_equal",       # every positive doc ties
        "sparse",          # fewer than k positives
        "smooth",          # distinct scores (fast path should engage)
        "tail_zeroes",     # positives rounding to key 0 fill the tail
    ],
)
def test_topk_sampled_threshold_matches_bruteforce(case):
    """The sampled-threshold dense preselect in topk_with_ties must be
    EXACT: identical (rank, doc, key) triples to a full sort, including
    tie groups straddling the kth key and sub-rounding scores."""
    from document_retrieval_ray.state.index_shard import topk_with_ties

    rng = np.random.default_rng(11)
    n = 300_000  # above the fast-path threshold
    scores = np.zeros(n, dtype=np.float64)
    if case == "ties_heavy":
        idx = rng.choice(n, 150_000, replace=False)
        scores[idx] = rng.integers(1, 6, idx.size) * 0.25
    elif case == "all_equal":
        idx = rng.choice(n, 120_000, replace=False)
        scores[idx] = 3.75
    elif case == "sparse":
        idx = rng.choice(n, 4, replace=False)
        scores[idx] = rng.random(4) + 0.5
    elif case == "smooth":
        idx = rng.choice(n, 200_000, replace=False)
        scores[idx] = rng.random(idx.size) * 10 + 0.01
    else:  # tail_zeroes: scores > 0 but rounding to key 0
        idx = rng.choice(n, 5_000, replace=False)
        scores[idx] = 1e-9
        hi = rng.choice(idx, 3, replace=False)
        scores[hi] = 2.5
    urls = np.array([f"u{i:07d}" for i in range(n)], dtype=object)
    for k in (10, 100):
        ranks, sel, keys = topk_with_ties(scores, urls, k, 4)
        er, es, ek = _topk_bruteforce(scores, urls, k, 4)
        assert list(ranks) == er, case
        assert [int(i) for i in sel] == es, case
        assert [int(x) for x in keys] == [int(x) for x in ek], case


def test_term_contrib_shared_vs_computed(tmp_path, ray_session):
    """term_contrib must return IDENTICAL float64 arrays whether it reads
    the payload's shared precompute (cfg matches), computes on the fly
    (cfg differs), or computes under a _GlobalView's global avgdl — and
    BM25 scores must not depend on which path served the factor."""
    import ray.data  # noqa: F401  (ray initialised by the session fixture)

    from document_retrieval_ray.config import BM25Config, IndexConfig, TokenizerConfig
    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.sources.synth import write_corpus
    from document_retrieval_ray.state.index_shard import (
        LangIndex,
        _bm25_contrib,
        build_shared_payload,
        score_bm25_maxscore,
        score_bm25_taat,
    )

    corpus = tmp_path / "corpus"
    index_dir = str(tmp_path / "index")
    write_corpus(str(corpus), num_docs=400, seed=9)
    build_index(
        str(corpus / "documents.parquet"), index_dir,
        cfg=IndexConfig(tokenizer=TokenizerConfig(mode="simple")),
        with_cosine_norms=False,
    )
    cfg = BM25Config(k1=1.2, b=0.75, compat="standard")
    other = BM25Config(k1=1.5, b=0.6, compat="standard")

    # low threshold so the synthetic head terms actually go through the
    # shared pre-decode + contrib path
    pay = build_shared_payload(index_dir, "en", hot_decode_df=5,
                               contrib_cfg=cfg)
    assert pay["hot_contrib"] is not None and pay["contrib_key"] == (
        1.2, 0.75, "standard")
    idx_shared = LangIndex.from_payload(pay)
    idx_plain = LangIndex(index_dir, "en", hot_decode_df=5)  # no contrib

    terms = list(idx_shared._terms)[:40]  # packed vocab iterates row order
    for term in terms:
        a = idx_shared.term_contrib(term, cfg)
        b = idx_plain.term_contrib(term, cfg)
        doc_ids, tfs = idx_plain.postings(term)
        direct = _bm25_contrib(tfs, idx_plain.dl[doc_ids], cfg,
                               idx_plain.avgdl)
        assert np.array_equal(a, b) and np.array_equal(b, direct), term
        # non-matching cfg must NOT serve the shared array
        c = idx_shared.term_contrib(term, other)
        d = _bm25_contrib(tfs, idx_plain.dl[doc_ids], other,
                          idx_plain.avgdl)
        assert np.array_equal(c, d), term

    toks = ["entok1", "entok2", "entok7"]
    s1 = score_bm25_taat(idx_shared, toks, cfg)
    s2 = score_bm25_taat(idx_plain, toks, cfg)
    assert np.array_equal(s1, s2)
    # the two holders may legitimately take DIFFERENT exact paths now
    # (the payload holder has dense float32 arrays -> dense-estimate
    # candidates; the plain holder falls back to dense TAAT), so compare
    # the RANKED RESULT, which must not depend on the serving path
    from document_retrieval_ray.state.index_shard import topk_with_ties

    def _ranked(idx):
        ss, cand = score_bm25_maxscore(idx, toks, cfg, 10, hot_df=5,
                                       round_dp=4)
        if cand is None:
            r = topk_with_ties(ss, idx.urls, 10, 4)
            return [(int(a), idx.urls[int(i)], float(k))
                    for a, i, k in zip(*r)]
        if cand.size == 0:
            return []
        su = idx.urls.select(cand)
        r = topk_with_ties(ss, su, 10, 4)
        return [(int(a), su[int(i)], float(k)) for a, i, k in zip(*r)]

    assert _ranked(idx_shared) == _ranked(idx_plain)


def test_reference_format_sources_roundtrip(tmp_path, ray_session):
    """S1/S2 reference formats: a corpus.json (JSONL of {docid, text,
    lang}) and a test.csv (id, query, lang) must flow through the engine
    unchanged — build an index from the JSON corpus and score the CSV
    queries, matching the same pipeline run from Parquet inputs."""
    import json as _json

    import ray.data

    from document_retrieval_ray.config import BM25Config, IndexConfig, TokenizerConfig
    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.query import bm25_search
    from document_retrieval_ray.sources.corpus import read_corpus_json, read_queries
    from document_retrieval_ray.sources.synth import write_corpus

    corpus = tmp_path / "corpus"
    write_corpus(str(corpus), num_docs=300, seed=4)
    docs = ray.data.read_parquet(str(corpus / "documents.parquet")).take_all()

    jpath = tmp_path / "corpus.json"
    with open(jpath, "w") as f:
        for d in docs:
            f.write(_json.dumps(
                {"docid": d["url"], "text": d["text"], "lang": d["lang"]}) + "\n")
    cpath = tmp_path / "test.csv"
    qs = [
        {"id": "q0", "query": "entok1 entok7", "lang": "en"},
        {"id": "q1", "query": "detok3", "lang": "de"},
    ]
    with open(cpath, "w") as f:
        f.write("id,query,lang\n")
        for q in qs:
            f.write(f"{q['id']},{q['query']},{q['lang']}\n")

    jds = read_corpus_json(str(jpath))
    assert set(jds.schema().names) == {"url", "text", "lang"}

    icfg = IndexConfig(tokenizer=TokenizerConfig(mode="simple"))
    idx_json = str(tmp_path / "idx_json")
    idx_parq = str(tmp_path / "idx_parq")
    build_index(
        str(jpath), idx_json, cfg=icfg, with_cosine_norms=False,
        input_ds_factory=lambda columns=None: read_corpus_json(str(jpath)),
    )
    build_index(str(corpus / "documents.parquet"), idx_parq, cfg=icfg,
                with_cosine_norms=False)

    qds = read_queries(str(cpath))
    assert set(qds.schema().names) == {"query_id", "query", "lang"}
    cfg = BM25Config(k1=1.2, b=0.75, compat="standard")
    a = bm25_search(qds, idx_json, cfg=cfg).to_pandas()
    b = bm25_search(read_queries(str(cpath)), idx_parq, cfg=cfg).to_pandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) and a[["query_id", "rank", "url", "score_x"]].equals(
        b[["query_id", "rank", "url", "score_x"]]
    )


# ---------------------------------------------------- spelling correction


class TestSpellHelpers:
    def _lev(self, a, b):
        """Reference full DP levenshtein."""
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[lb]

    def test_lev_le1_matches_dp(self):
        from document_retrieval_ray.pipelines.testdata_queries import _lev_le1

        words = ["", "a", "ab", "ba", "abc", "bca", "abcd", "acd",
                 "abce", "xbcd", "abdc", "aabc", "abcc", "hello", "hallo",
                 "hell", "helloo", "world"]
        for a in words:
            for b in words:
                assert _lev_le1(a, b) == (self._lev(a, b) <= 1), (a, b)

    def test_deletion_variants_vectorized_matches_python(self):
        import pyarrow as pa
        from document_retrieval_ray.pipelines.testdata_queries import (
            _deletion_variants,
        )

        terms = ["spark", "a", "", "join", "aa"]
        idx, var = _deletion_variants(pa.array(terms, pa.string()))
        got = sorted(zip(idx.tolist(), var.to_pylist()))
        exp = sorted(
            (i, t[:j] + t[j + 1:])
            for i, t in enumerate(terms)
            for j in range(len(t))
        )
        assert got == exp

    def test_deletion_variants_empty(self):
        import pyarrow as pa
        from document_retrieval_ray.pipelines.testdata_queries import (
            _deletion_variants,
        )

        idx, var = _deletion_variants(pa.array([], pa.string()))
        assert len(idx) == 0 and len(var) == 0

    def test_neighborhood_covers_lev_le1(self):
        """Candidate rule: lev(a,b)<=1 ⇒ ({a}∪D1(a)) ∩ ({b}∪D1(b)) ≠ ∅."""
        words = ["hello", "hallo", "hell", "helloo", "chello", "helo"]
        for a in words:
            for b in words:
                if self._lev(a, b) <= 1:
                    va = {a} | {a[:i] + a[i + 1:] for i in range(len(a))}
                    vb = {b} | {b[:i] + b[i + 1:] for i in range(len(b))}
                    assert va & vb, (a, b)


def test_topk_all_matches_naive_with_negatives_and_ties():
    """topk_all (preselect path) == naive full sort on (rounded key desc,
    url asc), including negative scores and rounded-key ties — the LM
    ranking contract."""
    import numpy as np

    from document_retrieval_ray.state.index_shard import topk_all

    rng = np.random.default_rng(99)
    for n in (5, 64, 400, 5000):
        scores = -rng.uniform(1.0, 50.0, size=n)
        # force rounded-key ties
        scores[rng.integers(0, n, size=max(2, n // 10))] = -7.25
        urls = np.array([f"{i:06d}" for i in range(n)], dtype=object)
        ranks, sel, keys = topk_all(scores, urls, 10, round_dp=4)
        key_all = np.floor(scores * 10000.0 + 0.5)
        order = np.lexsort((urls, -key_all))[: min(10, n)]
        assert list(sel) == list(order)
        assert list(keys) == [key_all[i] for i in order]
        assert list(ranks) == list(range(1, len(order) + 1))


@pytest.mark.usefixtures("ray_session")
def test_keep_latest_corpus_shape_and_ties():
    """keep_latest over a Common-Crawl-shaped table (url, warc_ts, html):
    re-crawled urls collapse to the newest capture, timestamp ties break
    on the tie column, binary payloads survive, across many small blocks
    (per-batch partial + one key-hash exchange)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from document_retrieval_ray.stages.dedup import keep_latest

    rng = np.random.default_rng(5)
    n = 400
    urls = [f"https://ex.org/{i % 97}" for i in range(n)]  # ~4 captures/url
    ts = rng.integers(1_000_000, 2_000_000, size=n)
    # forced tie on one url pair, above every other capture of that url
    ts[10] = ts[11] = 3_000_000
    urls[11] = urls[10]
    df = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "cap_id": np.arange(n, dtype=np.int64),
            "html": [f"<b>{i}</b>".encode() for i in range(n)],
        }
    )
    tbl = pa.table(df)
    ds = ray.data.from_arrow(tbl).repartition(13)
    got = (
        keep_latest(ds, key_cols=("url",), ts_col="warc_ts", tie_col="cap_id",
                    num_parts=8)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["url", "warc_ts", "cap_id"])
        .drop_duplicates(subset=["url"], keep="last")
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["url", "warc_ts", "cap_id", "html"]],
        exp[["url", "warc_ts", "cap_id", "html"]],
    )
    # the tied pair resolved to the larger cap_id
    tied = got[got.url == urls[10]]
    assert int(tied.cap_id.iloc[0]) == 11


@pytest.mark.usefixtures("ray_session")
def test_containment_catches_excerpt_jaccard_misses(tmp_path):
    """A short doc fully contained in a long one: containment(a→b)=1.0
    while symmetric Jaccard is far below threshold — the directional
    join finds exactly the ordered pair the Jaccard join cannot."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from document_retrieval_ray.pipelines.testdata_queries import (
        q_containment,
        q_ngram_jaccard,
    )

    words = [f"w{i:02d}" for i in range(60)]
    long_text = " ".join(words)
    short_text = " ".join(words[10:18])  # 8 tokens ⊂ long, 6 shingles
    other = " ".join(f"z{i:02d}" for i in range(40))
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [long_text, short_text, other],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(long_text), len(short_text), len(other)],
        }
    )
    sf = str(tmp_path)
    pq.write_table(pa.table(df), f"{sf}/documents.parquet")
    got = q_containment(sf)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    # the only qualifying ordered pair: short (2) contained in long (1)
    assert list(zip(got.a, got.b)) == [(2, 1)]
    assert int(got.containment_x.iloc[0]) == 10000  # exactly 1.0
    jac = q_ngram_jaccard(sf)
    jac = jac.to_pandas() if hasattr(jac, "to_pandas") else jac
    assert len(jac) == 0  # symmetric Jaccard ≈ 6/58 — far below 0.5


@pytest.mark.usefixtures("ray_session")
def test_embed_outliers_hand_computed(tmp_path):
    """Crafted clusters: label 0 is a tight cluster with one far point
    (vec 9); label 1 is symmetric so ties resolve by vec_id ASC. The
    engine's rational-centroid integer distance must pick the planted
    outlier first and break ties deterministically."""
    import pyarrow.parquet as pq

    from document_retrieval_ray.pipelines.testdata_queries import (
        EMB_OUT_TOPK,
        q_embed_outliers,
    )

    dim = 4
    rows = []
    # label 0: nine points at ~0, one planted far point
    for i in range(9):
        rows.append((i, [0.001 * i] * dim, 0))
    rows.append((9, [0.4] * dim, 0))
    # label 1: two mirrored points, equidistant from their centroid
    rows.append((10, [0.2] * dim, 1))
    rows.append((11, [-0.2] * dim, 1))
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows],
                                  pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
    out = q_embed_outliers(str(tmp_path))
    lab0 = out[out["label"] == 0]
    assert int(lab0.iloc[0]["vec_id"]) == 9
    assert len(lab0) == min(EMB_OUT_TOPK, 10)
    assert list(lab0["rank"]) == list(range(1, len(lab0) + 1))
    # label 1: exact tie on d2n → vec_id ascending
    lab1 = out[out["label"] == 1]
    assert list(lab1["vec_id"]) == [10, 11]
    assert lab1["d2n"].nunique() == 1

    # brute-force rational-centroid oracle for label 0's winner distance
    q = np.floor(np.array([r[1] for r in rows[:10]], dtype=np.float64)
                 * 1000.0 + 0.5).astype(np.int64)
    s = q.sum(axis=0)
    d2n = ((q * 10 - s) ** 2).sum(axis=1)
    assert int(lab0.iloc[0]["d2n"]) == int(d2n[9])


@pytest.mark.usefixtures("ray_session")
def test_rel_q5_pandas_oracle():
    """rel_q5 vs an independent driver-side pandas replay of the 6-table
    plan on sf0.001 (separate from the DuckDB parity check)."""
    import pyarrow.parquet as pq

    from document_retrieval_ray.pipelines.testdata_queries import (
        REL_Q5_FROM,
        REL_Q5_REGION,
        REL_Q5_TO,
        q_rel_q5,
    )

    sf = "/root/testdata/sf0.001"
    got = q_rel_q5(sf)

    t = {
        n: pq.read_table(f"{sf}/{n}.parquet").to_pandas()
        for n in ("region", "nation", "customer", "supplier", "orders",
                  "lineitem")
    }
    rkey = int(t["region"].loc[t["region"].r_name == REL_Q5_REGION,
                               "r_regionkey"].iloc[0])
    nat = t["nation"][t["nation"].n_regionkey == rkey]
    o = t["orders"][(t["orders"].o_orderdate >= pd.Timestamp(REL_Q5_FROM))
                    & (t["orders"].o_orderdate < pd.Timestamp(REL_Q5_TO))]
    m = (
        t["lineitem"]
        .merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey",
               right_on="o_orderkey")
        .merge(t["customer"][["c_custkey", "c_nationkey"]],
               left_on="o_custkey", right_on="c_custkey")
        .merge(t["supplier"][["s_suppkey", "s_nationkey"]],
               left_on="l_suppkey", right_on="s_suppkey")
    )
    m = m[m.c_nationkey == m.s_nationkey]
    m = m.merge(nat[["n_nationkey", "n_name"]], left_on="c_nationkey",
                right_on="n_nationkey")
    m["rev_c"] = np.floor(
        m.l_extendedprice.to_numpy()
        * (1.0 - m.l_discount.to_numpy()) * 100.0 + 0.5
    ).astype(np.int64)
    exp = (
        m.groupby("n_name")["rev_c"].sum().reset_index()
        .rename(columns={"rev_c": "revenue_c"})
        .sort_values(["revenue_c", "n_name"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.astype({"revenue_c": "int64"})
    )


@pytest.mark.usefixtures("ray_session")
def test_ivfpq_numpy_replay():
    """ann_topk_ivfpq vs a driver-side numpy replay of the composition
    (cells, codes, ADC tables, probe pruning, tie order) on sf0.001 —
    independent of the DuckDB oracle."""
    import ray.data

    from document_retrieval_ray.pipelines.testdata_queries import (
        ANN_QUERY_IDS,
        IVF_NITER,
        IVF_NLIST,
        IVF_NPROBE,
        PQ_KSUB,
        PQ_NITER,
        PQ_NSUB,
        q_ann_topk_ivfpq,
    )
    from document_retrieval_ray.stages.ann import (
        IVF_DIST_SCALE,
        fit_ivf_centroids,
        fit_pq_codebooks,
        ivf_assign_cells,
    )

    sf = "/root/testdata/sf0.001"
    got = q_ann_topk_ivfpq(sf)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).sort_values(
        ["query_vec", "rank"]).reset_index(drop=True)

    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    rows = sorted((r["vec_id"], r["embedding"]) for r in emb.take_all())
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    cent = fit_ivf_centroids(emb, IVF_NLIST, IVF_NITER)
    cb = fit_pq_codebooks(emb, PQ_NSUB, PQ_KSUB, PQ_NITER)
    subdim = mat.shape[1] // PQ_NSUB
    cells = ivf_assign_cells(mat, cent)
    codes = np.stack(
        [ivf_assign_cells(mat[:, j * subdim:(j + 1) * subdim], cb[j])
         for j in range(PQ_NSUB)], axis=1)

    exp_rows = []
    for qid in ANN_QUERY_IDS:
        qv = mat[ids == qid][0]
        dq = np.floor(((qv[None, :] - cent) ** 2).sum(axis=1)
                      * IVF_DIST_SCALE + 0.5)
        probe = np.argsort(dq, kind="stable")[:IVF_NPROBE]
        tabs = np.stack([
            np.floor(((qv[j * subdim:(j + 1) * subdim][None, :] - cb[j]) ** 2)
                     .sum(axis=1) * IVF_DIST_SCALE + 0.5).astype(np.int64)
            for j in range(PQ_NSUB)])
        cand = np.nonzero(np.isin(cells, probe) & (ids != qid))[0]
        ad = tabs[np.arange(PQ_NSUB)[None, :], codes[cand]].sum(axis=1)
        order = np.lexsort((ids[cand], ad))[:10]
        for rk, o in enumerate(order, 1):
            exp_rows.append((qid, rk, ids[cand][o], ad[o]))
    exp = pd.DataFrame(exp_rows,
                       columns=["query_vec", "rank", "vec_id", "ad_x"])
    pd.testing.assert_frame_equal(
        got[["query_vec", "rank", "vec_id", "ad_x"]],
        exp.astype({c: "int64" for c in exp.columns}),
    )


@pytest.mark.usefixtures("ray_session")
def test_event_dedup_burst_semantics(tmp_path):
    """Crafted bursts: previous-event (lag) semantics — a chain where
    each event is within the window of its predecessor collapses to its
    first event even when the chain outlasts the window; exact-tie
    events collapse to the lowest event_id; other event_types and other
    users never interact."""
    import pyarrow.parquet as pq

    from document_retrieval_ray.pipelines.testdata_queries import (
        EVENT_DEDUP_WINDOW_US,
        q_event_dedup,
    )

    W = EVENT_DEDUP_WINDOW_US
    base = 1_700_000_000_000_000
    rows = [
        # user 1 click chain: 0, 0.6W, 1.2W — e2 within W of e1, e3
        # within W of e2 (but 1.2W from e1): lag semantics drop BOTH
        (1, 1, "click", base),
        (2, 1, "click", base + int(0.6 * W)),
        (3, 1, "click", base + int(1.2 * W)),
        # exact tie: same user/type/ts → keep lowest event_id
        (4, 1, "view", base), (5, 1, "view", base),
        # gap exactly == W is NOT a duplicate (strict <)
        (6, 1, "buy", base), (7, 1, "buy", base + W),
        # another user same type/ts as user 1 → independent
        (8, 2, "click", base),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(tbl, f"{tmp_path}/events.parquet")
    out = q_event_dedup(str(tmp_path))
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert sorted(out["event_id"]) == [1, 4, 6, 7, 8]


@pytest.mark.usefixtures("ray_session")
def test_rel_rollup_internally_consistent():
    """Leaf rows sum to their flag subtotal, subtotals sum to the grand
    total, and the grand total equals the raw lineitem row count."""
    import pyarrow.parquet as pq

    from document_retrieval_ray.pipelines.testdata_queries import q_rel_rollup

    sf = "/root/testdata/sf0.001"
    out = q_rel_rollup(sf)
    leaf = out[(out.l_returnflag != "ALL") & (out.l_linestatus != "ALL")]
    sub = out[(out.l_returnflag != "ALL") & (out.l_linestatus == "ALL")]
    tot = out[(out.l_returnflag == "ALL") & (out.l_linestatus == "ALL")]
    assert len(tot) == 1
    for m in ("n", "qty_c", "price_c", "disc_price_c"):
        assert leaf[m].sum() == int(tot[m].iloc[0])
        assert sub[m].sum() == int(tot[m].iloc[0])
        per_flag = leaf.groupby("l_returnflag")[m].sum()
        for flag, v in per_flag.items():
            assert int(sub.loc[sub.l_returnflag == flag, m].iloc[0]) == v
    n_rows = pq.read_metadata(f"{sf}/lineitem.parquet").num_rows
    assert int(tot["n"].iloc[0]) == n_rows


@pytest.mark.usefixtures("ray_session")
def test_related_docs_pandas_replay():
    """related_docs vs a driver-side pandas replay of the pairing rule
    (df-cap, a<b order, shared-count threshold) over the engine's own
    keyword table (itself oracled separately)."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        RELATED_MAX_TERM_DOCS,
        RELATED_MIN_SHARED,
        q_related_docs,
        q_tfidf_keywords,
    )

    sf = "/root/testdata/sf0.001"
    got = q_related_docs(sf)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    assert (got["a"] < got["b"]).all()
    assert got["n_shared"].between(RELATED_MIN_SHARED, 3).all()

    kw = q_tfidf_keywords(sf).to_pandas()[["doc_id", "term"]]
    sizes = kw.groupby("term")["doc_id"].transform("size")
    kw = kw[(sizes >= 2) & (sizes <= RELATED_MAX_TERM_DOCS)]
    m = kw.merge(kw, on="term")
    m = m[m.doc_id_x < m.doc_id_y]
    exp = (
        m.groupby(["doc_id_x", "doc_id_y"]).size().reset_index(name="n_shared")
    )
    exp = exp[exp.n_shared >= RELATED_MIN_SHARED].rename(
        columns={"doc_id_x": "a", "doc_id_y": "b"})
    exp = exp.sort_values(["a", "b"]).reset_index(drop=True).astype(
        {"a": "int64", "b": "int64", "n_shared": "int64"})
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_quality_sample_determinism_and_rates():
    """quality_sample is a pure function of the row (two invocations are
    identical), tiers follow the entropy cuts, and each tier's keep rate
    lands near its md5 threshold."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        QS_RATES,
        QS_TIER_CUTS,
        q_quality_sample,
        q_token_entropy,
    )

    sf = "/root/testdata/sf0.001"
    a = q_quality_sample(sf).to_pandas().sort_values("doc_id").reset_index(
        drop=True)
    b = q_quality_sample(sf).to_pandas().sort_values("doc_id").reset_index(
        drop=True)
    pd.testing.assert_frame_equal(a, b)

    ent = q_token_entropy(sf).to_pandas().set_index("doc_id")["entropy_x"]
    tiers = np.digitize(ent.loc[a["doc_id"]].to_numpy(), QS_TIER_CUTS)
    assert (tiers == a["tier"].to_numpy()).all()
    # every tier keeps < its md5 ceiling and the kept set is non-trivial
    full_tiers = np.digitize(ent.to_numpy(), QS_TIER_CUTS)
    for tr, rate_hex in enumerate(QS_RATES):
        n_all = int((full_tiers == tr).sum())
        n_kept = int((a["tier"] == tr).sum())
        if n_all:
            expect = int(rate_hex, 16) / 256.0
            assert abs(n_kept / n_all - expect) < 0.15
    assert 0 < len(a) < len(ent)


@pytest.mark.usefixtures("ray_session")
def test_group_percentiles_pandas_replay():
    """group_percentiles equals a direct pandas ceil-rank walk over the
    exact cents histogram."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        GP_PCTS,
        q_group_percentiles,
    )

    sf = "/root/testdata/sf0.001"
    got = q_group_percentiles(sf).sort_values("event_type").reset_index(
        drop=True)

    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    ev["vc"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    rows = []
    for et, g in ev.groupby("event_type"):
        v = np.sort(g["vc"].to_numpy())
        tot = len(v)
        row = {"event_type": et}
        for p in GP_PCTS:
            row[f"p{p}"] = int(v[(p * tot + 99) // 100 - 1])
        rows.append(row)
    exp = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_rel_antijoin_pandas_replay():
    """rel_antijoin equals the pandas isin anti-join with the exact
    integer above-average test."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        q_rel_antijoin,
    )

    sf = "/root/testdata/sf0.001"
    got = (q_rel_antijoin(sf).to_pandas().sort_values("c_custkey")
           .reset_index(drop=True))

    cust = pd.read_parquet(f"{sf}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"])
    vc = np.floor(cust["c_acctbal"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    orders = pd.read_parquet(f"{sf}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])
    urgent = set(orders.loc[orders["o_orderpriority"] == "1-URGENT",
                            "o_custkey"].to_numpy())
    keep = (vc * len(cust) > vc.sum()) & ~cust["c_custkey"].isin(urgent)
    exp = pd.DataFrame({
        "c_custkey": cust.loc[keep, "c_custkey"].to_numpy(np.int64),
        "acctbal_cents": vc[keep.to_numpy()],
    }).sort_values("c_custkey").reset_index(drop=True)
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_linreg_fit_matches_lstsq():
    """linreg_fit's Cramer solution agrees with numpy lstsq on the raw
    design matrix (rtol 1e-6 — different float op order, same system)."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        LINREG_SCALE,
        q_linreg_fit,
    )

    sf = "/root/testdata/sf0.001"
    got = q_linreg_fit(sf)
    assert int(got["n"].iloc[0]) > 0

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    txt = docs["text"]
    y = txt.str.len().to_numpy(np.float64)
    x2 = (txt.str.len() - txt.str.replace("e", "", regex=False).str.len()
          ).to_numpy(np.float64)
    norm = (txt.str.lower().str.replace(r"[^a-z0-9]+", " ", regex=True)
            .str.strip())
    x1 = np.where(norm.str.len() == 0, 0,
                  norm.str.count(" ") + 1).astype(np.float64)
    A = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    got_beta = np.array([got[f"b{i}_x"].iloc[0] for i in range(3)],
                        np.float64) / LINREG_SCALE
    assert np.allclose(got_beta, beta, rtol=1e-6, atol=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_mmr_rerank_numpy_replay():
    """mmr_rerank equals a direct numpy replay of the greedy λ=0.5 MMR
    over the exact quantized top-POOL pool, and actually diversifies
    (selection order differs from pure relevance order unless the pool
    is already diverse)."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        MMR_K,
        MMR_POOL,
        MMR_Q_SCALE,
        MMR_QUERY_ID,
        q_mmr_rerank,
    )

    sf = "/root/testdata/sf0.001"
    got = q_mmr_rerank(sf)

    emb = pd.read_parquet(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    mat = np.floor(np.stack(emb["embedding"].to_numpy()).astype(np.float64)
                   * MMR_Q_SCALE + 0.5).astype(np.int64)
    vec = emb["vec_id"].to_numpy(np.int64)
    qv = mat[vec == MMR_QUERY_ID][0]
    mask = vec != MMR_QUERY_ID
    rel = mat[mask] @ qv
    ids = vec[mask]
    order = np.lexsort((ids, -rel))[:MMR_POOL]
    cand, crel = ids[order], rel[order]
    cmat = mat[mask][order]
    sims = cmat @ cmat.T
    sel, rem = [], list(range(MMR_POOL))
    while rem and len(sel) < MMR_K:
        best = None
        for i in rem:
            sc = 2 * int(crel[i])
            if sel:
                sc -= max(int(sims[i, j]) for j, _ in sel)
            if (best is None or sc > best[2]
                    or (sc == best[2] and cand[i] < cand[best[0]])):
                best = (i, int(cand[i]), sc)
        sel.append((best[0], best[2]))
        rem.remove(best[0])
    exp = pd.DataFrame({
        "rank": pd.array(range(1, MMR_K + 1), dtype="int64"),
        "vec_id": pd.array([int(cand[i]) for i, _ in sel], dtype="int64"),
        "mmr_x": pd.array([s for _, s in sel], dtype="int64"),
    })
    pd.testing.assert_frame_equal(got, exp)
    assert int(got["rank"].iloc[0]) == 1 and len(got) == MMR_K


@pytest.mark.usefixtures("ray_session")
def test_cross_dedup_sides_and_subset():
    """cross_dedup rows are exactly the minhash pairs with one side in
    the new-source batch, oriented new_doc → dup_of."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        CROSS_NEW_SOURCES,
        q_cross_dedup,
        q_minhash_pairs,
    )

    sf = "/root/testdata/sf0.001"
    got = (q_cross_dedup(sf).to_pandas()
           .sort_values(["new_doc", "dup_of"]).reset_index(drop=True))
    pairs = q_minhash_pairs(sf).to_pandas()
    src = pd.read_parquet(f"{sf}/documents.parquet",
                          columns=["doc_id", "source"])
    is_new = src.set_index("doc_id")["source"].isin(CROSS_NEW_SOURCES)
    na = is_new.loc[pairs["a"]].to_numpy()
    nb = is_new.loc[pairs["b"]].to_numpy()
    keep = pairs[na ^ nb]
    exp = pd.DataFrame({
        "new_doc": np.where(is_new.loc[keep["a"]].to_numpy(),
                            keep["a"], keep["b"]).astype(np.int64),
        "dup_of": np.where(is_new.loc[keep["a"]].to_numpy(),
                           keep["b"], keep["a"]).astype(np.int64),
        "jaccard_x": keep["jaccard_x"].to_numpy(np.int64),
    }).sort_values(["new_doc", "dup_of"]).reset_index(drop=True)
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp)
    assert is_new.loc[got["new_doc"]].all()
    assert not is_new.loc[got["dup_of"]].any()


@pytest.mark.usefixtures("ray_session")
def test_value_norm_bounds_and_replay():
    """value_norm equals the pandas min-max replay, lands in [0, 10000],
    and hits both endpoints (each group's min → 0, max → 10000)."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        q_value_norm,
    )

    sf = "/root/testdata/sf0.001"
    got = (q_value_norm(sf).to_pandas().sort_values("event_id")
           .reset_index(drop=True))

    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    ev["vc"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    g = ev.groupby("event_type")["vc"]
    mn = g.transform("min").to_numpy(np.int64)
    mx = g.transform("max").to_numpy(np.int64)
    span = mx - mn
    norm = np.where(span > 0,
                    ((ev["vc"].to_numpy(np.int64) - mn) * 10000)
                    // np.maximum(span, 1), 0).astype(np.int64)
    exp = pd.DataFrame({"event_id": ev["event_id"].to_numpy(np.int64),
                        "event_type": ev["event_type"],
                        "norm_x": norm}).sort_values("event_id").reset_index(
        drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert got["norm_x"].between(0, 10000).all()
    per_type = got.groupby("event_type")["norm_x"]
    assert (per_type.min() == 0).all() and (per_type.max() == 10000).all()
