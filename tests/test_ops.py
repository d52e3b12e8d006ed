"""Unit + pipeline tests for dedup / ANN / analysis / multimodal stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from document_retrieval_ray.stages.ann import (
    BruteForceTopK,
    NearDupPairs,
    emit_tile_rows,
    final_topk,
    lsh_bucket,
    tile_pairs,
)
from document_retrieval_ray.stages.dedup import (
    add_simhash,
    add_text_hash,
    band_group_pairs,
    emit_band_rows,
    emit_simhash_bands,
    simhash_band_pairs,
    simhash_pairs,
)
from document_retrieval_ray.stages.multimodal import (
    AudioFeatureStage,
    DecodeImageStage,
    binary_meta_batch,
)
from document_retrieval_ray.functions.hashing import hamming64, simhash64
from document_retrieval_ray.functions.tokenizer import tokenize_simple


def _doc_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


class TestDedup:
    def test_text_hash_exact_vs_normalized(self):
        t = _doc_table(["Hello World", "hello   world!", "other"])
        exact = add_text_hash(t)["text_hash"].to_pylist()
        assert len(set(exact)) == 3
        norm = add_text_hash(t, normalize=True)["text_hash"].to_pylist()
        assert norm[0] == norm[1] != norm[2]

    def test_band_rows_near_dup_share_band(self):
        base = " ".join(f"word{i}" for i in range(60))
        near = base.replace("word30", "changed")  # 3 of 58 shingles differ
        far = "completely different content with many other words here now"
        t = _doc_table([base, near, far])
        rows = emit_band_rows(t).to_pandas()
        shared = rows.groupby(["band_idx", "band_key"])["doc_id"].apply(set)
        assert any({0, 1} <= s for s in shared), "near-dups share no band"
        assert not any({0, 2} <= s for s in shared)

    def test_simhash_pairs_oracle(self):
        """Pipeline pairs == brute-force numpy oracle pairs."""
        texts = [
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",  # near
            "one two three four five six seven eight",
            "alpha beta gamma delta epsilon zeta eta theta",  # exact dup of 0
        ]
        sim = add_simhash(_doc_table(texts)).to_pandas()
        got = simhash_pairs(sim, max_hamming=3)
        hashes = [simhash64(tokenize_simple(t)) for t in texts]
        exp = sorted(
            (a, b)
            for a in range(len(texts))
            for b in range(a + 1, len(texts))
            if hamming64(hashes[a], hashes[b]) <= 3
        )
        # oracle = all-pairs; pipeline = chunk-blocked candidates. Within
        # hamming<=3 of 64 bits split into 4 chunks, at least one chunk is
        # identical (pigeonhole) → candidate generation is lossless.
        assert list(zip(got["a"], got["b"])) == exp
        assert (0, 3) in exp

    def test_simhash_band_path_matches_driver_reference(self):
        """Distributed band plan (emit_simhash_bands → per-(band, chunk)
        verify → (a, b) dedup) == the driver-side reference impl."""
        texts = [
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",
            "one two three four five six seven eight",
            "alpha beta gamma delta epsilon zeta eta theta",
            "",
            "",
        ]
        sim = add_simhash(_doc_table(texts))
        exp = simhash_pairs(sim.to_pandas(), max_hamming=3)
        bands = emit_simhash_bands(
            sim.select(["doc_id", "simhash"])
        ).to_pandas()
        parts = [
            simhash_band_pairs(g)
            for _, g in bands.groupby(["band", "chunk"])
        ]
        got = (
            pd.concat(parts, ignore_index=True)
            .drop_duplicates()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp.reset_index(drop=True))
        # the two empty docs (simhash 0) must pair with each other
        assert (4, 5) in set(zip(got["a"], got["b"]))

    def test_band_group_pairs_bucket_cap(self):
        g = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64)})
        out = band_group_pairs(g, max_bucket=10)
        # truncated deterministically to the sorted prefix
        assert len(out) == 45
        assert out["a"].max() <= 9 and out["b"].max() <= 9


@pytest.mark.usefixtures("ray_session")
class TestAnn:
    def test_brute_force_matches_numpy(self):
        import ray

        rng = np.random.default_rng(3)
        mat = rng.standard_normal((200, 16))
        ids = np.arange(200)
        qids = [0, 5]
        qmat = mat[qids]
        ref = ray.put((qids, qmat))
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        )
        stage = BruteForceTopK(ref, k=5)
        partial = stage(t).to_pandas()
        out = pd.concat(
            [final_topk(g, k=5) for _, g in partial.groupby("query_vec")]
        )
        # numpy oracle
        nmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        for qi, qid in enumerate(qids):
            cos = nmat @ nmat[qids[qi]]
            cos[qid] = -np.inf
            key = np.floor(cos * 10000 + 0.5)
            order = np.lexsort((ids, -key))[:5]
            got = out[out["query_vec"] == qid].sort_values("rank")
            assert list(got["vec_id"]) == list(ids[order])

    def test_neardup_pairs_group(self):
        mat = np.array([[1, 0], [0.999, 0.04], [0, 1.0]])
        t = pa.table(
            {
                "vec_id": pa.array([10, 11, 12], pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        )
        out = NearDupPairs(threshold=0.95)(t).to_pandas()
        assert list(zip(out["a"], out["b"])) == [(10, 11)]

    def test_tiled_all_pairs_exact(self):
        """Block-tiled distributed all-pairs == brute-force numpy pairs."""
        rng = np.random.default_rng(7)
        mat = rng.standard_normal((60, 8))
        mat[13] = mat[4] + 0.01 * rng.standard_normal(8)  # a near-dup
        ids = np.arange(100, 160, dtype=np.int64)
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        )
        thr = 0.5
        tiles = emit_tile_rows(t, num_blocks=4).to_pandas()
        parts = [
            tile_pairs(g, thr, num_blocks=4)
            for _, g in tiles.groupby(["ti", "tj"])
        ]
        got = (
            pd.concat(parts, ignore_index=True)
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ mat.T) / np.outer(norms, norms)
        iu = np.triu_indices(60, k=1)
        keep = cos[iu] >= thr
        exp = pd.DataFrame(
            {
                "a": pd.Series(ids[iu[0][keep]], dtype="int64"),
                "b": pd.Series(ids[iu[1][keep]], dtype="int64"),
                "cos_x": pd.Series(
                    np.floor(cos[iu][keep] * 10000 + 0.5).astype(np.int64),
                    dtype="int64",
                ),
            }
        ).sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)
        assert len(exp) >= 1  # the planted near-dup is found

    def test_tiled_knn_graph_equals_brute_force(self):
        """tile_knn_partial + knn_merge_partition == brute-force top-k
        (cos desc, id asc), incl. a zero-norm vector excluded both ways."""
        from document_retrieval_ray.stages.ann import (
            knn_merge_partition,
            tile_knn_partial,
        )

        rng = np.random.default_rng(11)
        mat = rng.standard_normal((50, 8))
        mat[7] = 0.0  # zero-norm: no edges in or out
        ids = np.arange(200, 250, dtype=np.int64)
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        )
        k = 3
        tiles = emit_tile_rows(t, num_blocks=4).to_pandas()
        parts = [
            tile_knn_partial(g, k, num_blocks=4)
            for _, g in tiles.groupby(["ti", "tj"])
        ]
        got = (
            knn_merge_partition(pd.concat(parts, ignore_index=True), k)
            .sort_values(["vec_id", "rnk"])
            .reset_index(drop=True)
        )
        norms = np.linalg.norm(mat, axis=1)
        rows = []
        for i in range(len(ids)):
            if norms[i] == 0:
                continue
            cand = [
                (int(np.floor(
                    (mat[i] @ mat[j]) / (norms[i] * norms[j]) * 10000 + 0.5
                )), int(ids[j]))
                for j in range(len(ids))
                if j != i and norms[j] > 0
            ]
            cand.sort(key=lambda cv: (-cv[0], cv[1]))
            for r, (cx, nbr) in enumerate(cand[:k], 1):
                rows.append((int(ids[i]), nbr, cx, r))
        exp = pd.DataFrame(
            rows, columns=["vec_id", "nbr", "cos_x", "rnk"]
        ).astype("int64").sort_values(["vec_id", "rnk"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)

    def test_lsh_neardup_subset_of_all_pairs(self):
        """Bucketed near-dup pairs ⊆ exact all-pairs at the same threshold
        (LSH only ever restricts candidates)."""
        rng = np.random.default_rng(11)
        mat = rng.standard_normal((80, 16))
        for i in range(0, 20, 2):  # plant near-dups
            mat[i + 1] = mat[i] + 0.05 * rng.standard_normal(16)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(80, dtype=np.int64), pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        )
        thr = 0.9
        bucketed = lsh_bucket(t, num_planes=4).to_pandas()
        ndp = NearDupPairs(threshold=thr)
        got = pd.concat(
            [
                ndp(pa.Table.from_pandas(g, preserve_index=False)).to_pandas()
                for _, g in bucketed.groupby("bucket")
            ],
            ignore_index=True,
        )
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ mat.T) / np.outer(norms, norms)
        iu = np.triu_indices(80, k=1)
        all_pairs = {
            (int(a), int(b))
            for a, b in zip(iu[0][cos[iu] >= thr], iu[1][cos[iu] >= thr])
        }
        got_pairs = set(zip(got["a"], got["b"]))
        assert got_pairs <= all_pairs
        assert len(got_pairs) >= 1  # finds at least some planted dups

    def test_lsh_bucket_deterministic(self):
        rng = np.random.default_rng(5)
        mat = rng.standard_normal((50, 8))
        t = pa.table(
            {
                "vec_id": pa.array(range(50), pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        )
        b1 = lsh_bucket(t)["bucket"].to_pylist()
        b2 = lsh_bucket(t)["bucket"].to_pylist()
        assert b1 == b2
        assert len(set(b1)) > 1


@pytest.mark.usefixtures("ray_session")
class TestComponents:
    def test_label_prop_chain_graph(self):
        """A diameter-4 chain forces multiple propagation rounds; a
        disjoint pair must keep its own representative."""
        import ray.data

        from document_retrieval_ray.stages.dedup import label_prop_components

        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([1, 2, 3, 4, 10], pa.int64()),
                    "b": pa.array([2, 3, 4, 5, 11], pa.int64()),
                }
            )
        ).repartition(3)
        out = label_prop_components(pairs).to_pandas()
        got = dict(zip(out["doc_id"], out["rep"]))
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}

    def test_label_prop_empty_graph_keeps_schema(self):
        import ray.data

        from document_retrieval_ray.stages.dedup import label_prop_components

        pairs = ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )
        out = label_prop_components(pairs)
        # NOTE: ray's to_pandas() drops columns on 0-row datasets; the
        # schema contract lives on the Dataset
        assert out.schema().names == ["doc_id", "rep"]
        assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
class TestSvdReduction:
    def _emb_table(self, mat, ids=None):
        n = len(mat)
        return pa.table(
            {
                "vec_id": pa.array(ids if ids is not None else range(n), pa.int64()),
                "embedding": pa.array(
                    np.asarray(mat, dtype=np.float64).tolist(), pa.list_(pa.float64())
                ),
            }
        )

    def test_full_rank_projection_preserves_topk(self):
        """Full-rank projection is orthogonal → cosine top-k identical."""
        import ray.data

        from document_retrieval_ray.stages.ann import (
            fit_svd_projection,
            project_embeddings,
        )

        rng = np.random.default_rng(19)
        mat = rng.standard_normal((120, 12))
        ds = ray.data.from_arrow(self._emb_table(mat)).repartition(4)
        p = fit_svd_projection(ds, dim_out=12)
        assert np.allclose(p.T @ p, np.eye(12), atol=1e-9)
        red = np.concatenate(
            [
                np.asarray(b["embedding"].to_pylist())
                for b in ds.map_batches(
                    project_embeddings, fn_kwargs={"projection": p},
                    batch_format="pyarrow",
                ).iter_batches(batch_format="pyarrow")
            ]
        )
        def topk(m, qi, k=10):
            nm = m / np.linalg.norm(m, axis=1, keepdims=True)
            cos = nm @ nm[qi]
            cos[qi] = -np.inf
            return list(np.argsort(-cos)[:k])

        # rows may arrive reordered across blocks; re-align by vec_id
        ids = np.concatenate(
            [
                np.asarray(b["vec_id"].to_pylist())
                for b in ds.map_batches(
                    project_embeddings, fn_kwargs={"projection": p},
                    batch_format="pyarrow",
                ).iter_batches(batch_format="pyarrow")
            ]
        )
        red_aligned = np.empty_like(red)
        red_aligned[ids] = red
        for qi in (0, 7, 33):
            assert topk(mat, qi) == topk(red_aligned, qi)

    def test_low_rank_recall(self):
        """Reduced-dim ANN over genuinely low-rank data recovers the exact
        neighbors (the reference's 256-dim TruncatedSVD use case)."""
        import ray.data

        from document_retrieval_ray.stages.ann import fit_svd_projection

        rng = np.random.default_rng(23)
        basis = rng.standard_normal((6, 48))          # rank-6 subspace
        coef = rng.standard_normal((200, 6))
        mat = coef @ basis + 1e-9 * rng.standard_normal((200, 48))
        ds = ray.data.from_arrow(self._emb_table(mat)).repartition(4)
        p = fit_svd_projection(ds, dim_out=6)
        red = mat @ p

        def topk(m, qi, k=10):
            nm = m / np.linalg.norm(m, axis=1, keepdims=True)
            cos = nm @ nm[qi]
            cos[qi] = -np.inf
            return set(np.argsort(-cos)[:k])

        hits = sum(
            len(topk(mat, qi) & topk(red, qi)) / 10.0 for qi in range(0, 40, 5)
        ) / 8.0
        assert hits >= 0.95, hits


class TestStemBugGate:
    def test_substring_stem_bug_reproduced(self):
        """The gated M2 mode must reproduce the reference's str.replace
        substring rewriting (stemming 'port' also rewrites 'portable')."""
        from document_retrieval_ray.functions.tokenizer import (
            stem_suffix,
            tokenize_stem_bug,
        )

        # 'portes' stems to 'port'; the subsequent replace('portable', ...)
        # no longer matches, but replace('portes', 'port') already rewrote
        # the 'portes' PREFIX inside 'portesque' too
        text = "portes portesque"
        toks = tokenize_stem_bug(text, "en")
        assert stem_suffix("portes") == "port"
        # bug: 'portesque' became 'portque' via the substring replace
        assert toks == ["port", "portque"], toks

    def test_clean_path_differs(self):
        from document_retrieval_ray.functions.tokenizer import tokenize

        text = "portes portesque"
        clean = [w for w in ("portes", "portesque")]
        assert tokenize(text, "en", "simple") == clean
        assert tokenize(text, "en", "stem_bug") != clean


class TestEmbedStage:
    def test_strict_mode_raises(self):
        from document_retrieval_ray.stages.embed import DenseRerankStage, EmbedStage

        t = _doc_table(["hello"])
        with pytest.raises(NotImplementedError):
            EmbedStage(model="strict")(t)
        t2 = pa.table(
            {
                "query": pa.array(["q"], pa.string()),
                "cand_embedding": pa.array([[0.1, 0.2]], pa.list_(pa.float64())),
            }
        )
        with pytest.raises(NotImplementedError):
            DenseRerankStage(model="strict")(t2)

    def test_fake_mode_deterministic_unit_norm(self):
        from document_retrieval_ray.stages.embed import EmbedStage

        t = _doc_table(["alpha beta", "gamma", ""])
        out1 = EmbedStage(model="fake", dim=16)(t)
        out2 = EmbedStage(model="fake", dim=16)(t)
        assert out1.equals(out2)
        assert out1.schema.field("embedding").type == pa.list_(pa.float32())
        mat = np.asarray(out1["embedding"].to_pylist(), dtype=np.float64)
        assert mat.shape == (3, 16)
        assert np.allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-6)

    def test_model_factory_called_once_and_pipelines_into_ann(self):
        from document_retrieval_ray.stages.embed import EmbedStage, _FakeModel

        calls = []

        def factory():
            calls.append(1)
            return _FakeModel(8)

        stage = EmbedStage(model_factory=factory)
        t = _doc_table(["a b c", "d e f", "a b c"])
        out = stage(t)
        stage(t)
        assert len(calls) == 1, "model must load once per actor, not per batch"
        # identical texts → identical embeddings (usable for cosine dedup)
        m = np.asarray(out["embedding"].to_pylist())
        assert np.allclose(m[0], m[2]) and not np.allclose(m[0], m[1])

    def test_dense_rerank_scores(self):
        from document_retrieval_ray.stages.embed import DenseRerankStage, _FakeModel

        model = _FakeModel(8)
        q = ["query one", "query one"]
        cand_texts = ["query one", "unrelated text"]
        cand = model.encode(cand_texts)
        t = pa.table(
            {
                "query": pa.array(q, pa.string()),
                "url": pa.array(["u1", "u2"], pa.string()),
                "cand_embedding": pa.array(cand.tolist(), pa.list_(pa.float64())),
            }
        )
        out = DenseRerankStage(model="fake", dim=8)(t).to_pandas()
        assert out["dense_score_x"].iloc[0] == 10000  # identical text → cos 1
        assert out["dense_score_x"].iloc[1] < 10000
        assert "cand_embedding" not in out.columns


class TestMultimodal:
    def test_strict_mode_raises(self):
        t = pa.table(
            {"doc_id": pa.array([1], pa.int64()), "payload": pa.array([b"x"], pa.binary())}
        )
        with pytest.raises(NotImplementedError):
            DecodeImageStage(mode="strict")(t)
        with pytest.raises(NotImplementedError):
            AudioFeatureStage(mode="strict")(t)

    def test_fake_mode_deterministic_schema(self):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array([b"abc", b""], pa.binary()),
            }
        )
        out1 = DecodeImageStage(mode="fake", feature_dim=4)(t)
        out2 = DecodeImageStage(mode="fake", feature_dim=4)(t)
        assert out1.equals(out2)
        assert out1.schema.field("features").type == pa.list_(pa.float64())
        assert out1["n_bytes"].to_pylist() == [3, 0]
        audio = AudioFeatureStage(mode="fake")(t)
        assert audio["duration_ms"].to_pylist() == [3, 0]
        assert audio["n_frames"].to_pylist() == [1, 1]

    def test_binary_meta(self):
        import hashlib

        t = pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "payload": pa.array([b"hello"], pa.binary()),
            }
        )
        out = binary_meta_batch(t)
        assert out["n_bytes"].to_pylist() == [5]
        assert out["payload_md5"].to_pylist() == [hashlib.md5(b"hello").hexdigest()]
