"""Positional index: build + index-backed phrase query
(pipelines/positional.py) — scan/index equality, partition pruning,
idempotent resume, and kernel edge cases."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from document_retrieval_ray.functions.hashing import stable_hash64
from document_retrieval_ray.pipelines.positional import (
    POS_BITS,
    _phrase_match_partition,
    build_positional_index,
    emit_positions,
    phrase_query,
    read_pos_manifest,
)


def _write_docs(d, docs):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    return p


DOCS = [
    "the table scan runs a table scan twice",
    "batch batch batch",
    "",  # empty doc: sentinel token must be dropped
    "scan table",  # reversed — must not match "table scan"
]


class TestEmitPositions:
    def test_positions_and_sentinel(self):
        t = pa.table(
            {"doc_id": pa.array([7, 8], pa.int64()),
             "text": pa.array(["a b a", ""], pa.string())}
        )
        out = emit_positions(t, num_parts=8).to_pandas()
        # doc 8 is empty → contributes nothing
        assert set(out["doc_id"]) == {7}
        by_term = {r.term: list(r.positions) for r in out.itertuples()}
        assert by_term == {"a": [0, 2], "b": [1]}
        assert (out["thash"] == out["term"].map(
            lambda s: stable_hash64(s) % 8)).all()

    def test_punctuation_normalized(self):
        t = pa.table(
            {"doc_id": pa.array([1], pa.int64()),
             "text": pa.array(["Big, ORDER... scan!"], pa.string())}
        )
        out = emit_positions(t, num_parts=4).to_pandas()
        got = {r.term: list(r.positions) for r in out.itertuples()}
        assert got == {"big": [0], "order": [1], "scan": [2]}


class TestPhraseQueryIndexed:
    @pytest.fixture(scope="class")
    def index_dir(self, tmp_path_factory, ray_session):
        d = str(tmp_path_factory.mktemp("posidx"))
        docs_path = _write_docs(d, DOCS)
        build_positional_index(docs_path, os.path.join(d, "idx"), num_parts=8)
        return os.path.join(d, "idx")

    def test_matches_scan_semantics(self, index_dir):
        out = phrase_query(
            index_dir,
            [("p1", "table scan"), ("p2", "batch batch"), ("px", "scan twice")],
        ).to_pandas()
        got = {(r.phrase_id, r.doc_id): r.n_matches for r in out.itertuples()}
        assert got[("p1", 0)] == 2  # two non-overlapping occurrences
        assert ("p1", 3) not in got  # reversed order must not match
        assert got[("p2", 1)] == 2  # overlapping repeated-term matches
        assert got[("px", 0)] == 1

    def test_absent_term_phrase_empty(self, index_dir):
        out = phrase_query(index_dir, [("pz", "zebra table")]).to_pandas()
        assert len(out) == 0

    def test_resume_is_noop(self, index_dir):
        m1 = read_pos_manifest(index_dir)
        m2 = build_positional_index("IGNORED", index_dir, num_parts=999)
        assert m2 == m1 and m2["num_parts"] == 8

    def test_partition_pruning_reads_only_needed_dirs(self, index_dir):
        # the query's read set is constructed from the phrase terms'
        # thash dirs only — verify those dirs are a strict subset
        pos_dir = os.path.join(index_dir, "positions")
        all_parts = {d for d in os.listdir(pos_dir) if d.startswith("thash=")}
        needed = {
            f"thash={stable_hash64(w) % 8}" for w in ("table", "scan")
        }
        assert needed < all_parts  # corpus has more partitions than the query


class TestPhraseMatchPartitionKernel:
    def _group(self, rows):
        return pd.DataFrame(
            {
                "term": [r[0] for r in rows],
                "doc_id": np.array([r[1] for r in rows], dtype=np.int64),
                "positions": [np.array(r[2], dtype=np.int32) for r in rows],
            }
        )

    def test_basic_and_repeated(self):
        g = self._group(
            [
                ("a", 1, [0, 3]),
                ("b", 1, [1, 2]),
                ("a", 2, [5]),
            ]
        )
        out = _phrase_match_partition(g, [("q", ["a", "b"]), ("r", ["b", "b"])])
        got = {(r.phrase_id, r.doc_id): r.n_matches for r in out.itertuples()}
        # "a b": doc1 at start 0 only (pos3 has no b at 4)
        assert got == {("q", 1): 1, ("r", 1): 1}

    def test_empty_group(self):
        out = _phrase_match_partition(
            self._group([]), [("q", ["a", "b"])]
        )
        assert len(out) == 0
        assert list(out.columns) == ["phrase_id", "doc_id", "n_matches"]

    def test_key_packing_headroom(self):
        # positions near the packing limit must not collide across docs
        big = (1 << (POS_BITS - 1)) - 2
        g = self._group([("a", 1, [big]), ("b", 1, [big + 1]), ("a", 2, [0])])
        out = _phrase_match_partition(g, [("q", ["a", "b"])])
        got = {(r.phrase_id, r.doc_id): r.n_matches for r in out.itertuples()}
        assert got == {("q", 1): 1}


class TestProximityKernel:
    def _group(self, rows):
        return pd.DataFrame(
            {
                "term": [r[0] for r in rows],
                "doc_id": np.array([r[1] for r in rows], dtype=np.int64),
                "positions": [np.array(r[2], dtype=np.int32) for r in rows],
            }
        )

    def test_window_counting(self):
        from document_retrieval_ray.pipelines.positional import (
            _near_match_partition,
        )

        g = self._group(
            [
                ("a", 1, [0, 10]),
                ("b", 1, [2, 3, 9]),
                ("a", 2, [0]),
                ("b", 2, [100]),
            ]
        )
        out = _near_match_partition(g, [("q", "a", "b")], window=3)
        got = {(r.pair_id, r.doc_id): r.n_matches for r in out.itertuples()}
        # doc1: a@0 pairs with b@2,3 (2); a@10 pairs with b@9 (1) → 3
        assert got == {("q", 1): 3}

    def test_no_cross_doc_window(self):
        from document_retrieval_ray.pipelines.positional import (
            POS_LIMIT,
            _near_match_partition,
        )

        # doc 1 ends near the position cap; doc 2 starts at 0 — the
        # packed-key window must not bridge them
        g = self._group(
            [("a", 1, [POS_LIMIT - 1]), ("b", 2, [0])]
        )
        out = _near_match_partition(g, [("q", "a", "b")], window=3)
        assert len(out) == 0

    def test_unordered_and_missing_term(self):
        from document_retrieval_ray.pipelines.positional import (
            _near_match_partition,
        )

        g = self._group([("a", 1, [5]), ("b", 1, [4])])
        out = _near_match_partition(
            g, [("q", "a", "b"), ("z", "a", "zebra")], window=1
        )
        got = {(r.pair_id, r.doc_id): r.n_matches for r in out.itertuples()}
        assert got == {("q", 1): 1}


def test_prefix_search_partial_top_semantics(ray_session, tmp_path):
    """Ten+ docs matching one prefix across blocks: global top-10 ranks
    deterministic by (tf desc, doc_id asc)."""
    import os as _os

    from document_retrieval_ray.pipelines.testdata_queries import q_prefix_search

    docs = ["scan " * (i % 4 + 1) for i in range(25)]  # tf in {1..4}
    t = pa.table(
        {
            "doc_id": pa.array(range(25), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    pq.write_table(t, _os.path.join(str(tmp_path), "documents.parquet"))
    out = q_prefix_search(str(tmp_path))
    sc = out[out.prefix_id == "pf1"]
    assert len(sc) == 10
    # ranks 1..10; first docs are the tf=4 ones (doc_id 3, 7, 11, ...)
    assert sc.iloc[0].doc_id == 3 and sc.iloc[0].total_tf == 4
    assert list(sc["rank"]) == list(range(1, 11))
    assert (sc.total_tf.values[:-1] >= sc.total_tf.values[1:]).all()


def test_append_positional_generation_equals_full_build(ray_session,
                                                        tmp_path):
    """Generational positional index: base over the first docs + an
    appended delta must answer phrase and NEAR queries identically to
    one index built over the full corpus — appends never force a
    positional rebuild."""
    from document_retrieval_ray.pipelines.positional import (
        append_positional_index,
        proximity_query,
    )

    full = DOCS + ["table scan appended here", "appended table scan"]
    base_dir, delta_dir, idx_a, idx_f = (
        str(tmp_path / n) for n in ("base", "delta", "idx_a", "idx_f")
    )
    os.makedirs(base_dir), os.makedirs(delta_dir)
    # delta doc ids continue after the base (disjoint id contract)
    t_base = pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string()),
    })
    t_delta = pa.table({
        "doc_id": pa.array(range(len(DOCS), len(full)), pa.int64()),
        "text": pa.array(full[len(DOCS):], pa.string()),
    })
    pq.write_table(t_base, os.path.join(base_dir, "documents.parquet"))
    pq.write_table(t_delta, os.path.join(delta_dir, "documents.parquet"))
    full_path = str(tmp_path / "full.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(full)), pa.int64()),
        "text": pa.array(full, pa.string()),
    }), full_path)

    build_positional_index(
        os.path.join(base_dir, "documents.parquet"), idx_a, num_parts=8
    )
    m = append_positional_index(
        os.path.join(delta_dir, "documents.parquet"), idx_a
    )
    assert m["generations"] == ["gen-00001"]
    assert read_pos_manifest(idx_a)["generations"] == ["gen-00001"]
    build_positional_index(full_path, idx_f, num_parts=8)

    phrases = [("p1", "table scan"), ("p2", "batch batch")]

    def run_phrase(d):
        out = phrase_query(d, phrases).to_pandas()
        return out.sort_values(["phrase_id", "doc_id"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(run_phrase(idx_a), run_phrase(idx_f))
    got = run_phrase(idx_a)
    # delta docs DO answer: both appended docs contain "table scan"
    assert {len(DOCS), len(DOCS) + 1} <= set(
        got[got.phrase_id == "p1"]["doc_id"]
    )

    def run_near(d):
        out = proximity_query(
            d, [("q", "table", "appended")], window=2
        ).to_pandas()
        return out.sort_values(["pair_id", "doc_id"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(run_near(idx_a), run_near(idx_f))
    assert len(run_near(idx_a)) == 2


def test_append_positional_requires_base(ray_session, tmp_path):
    from document_retrieval_ray.pipelines.positional import (
        append_positional_index,
    )

    p = _write_docs(str(tmp_path), ["a b"])
    with pytest.raises(FileNotFoundError):
        append_positional_index(p, str(tmp_path / "nothing"))


def test_hot_term_phrase_bounded_read(ray_session, tmp_path):
    """SCALE.md's df≈N phrase degeneration and its fix: a stopword-class
    phrase term reads ONLY the (thash, dbucket) sub-partitions covering
    the rare anchor's candidate docs — the hot side's ingested rows are
    bounded by candidates, not df — while results stay identical to the
    unpruned read; an un-anchorable (all-hot) group warns and falls back
    to the exact full read."""
    import pandas as pd
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from document_retrieval_ray.pipelines.positional import (
        _candidate_rows, _candidate_rows_pruned, build_positional_index,
        phrase_query, term_doc_counts,
    )

    n = 120
    rare_docs = {7, 33, 77}
    rows = []
    for d in range(n):
        text = "filler common words here"
        if d in rare_docs:
            text = "filler rareword " + text
        rows.append({"doc_id": d, "text": text})
    p = str(tmp_path / "docs.parquet")
    pq_.write_table(pa_.Table.from_pylist(rows), p)
    idx = str(tmp_path / "posidx")
    # doc_shift=3 → 8-doc buckets: pruning visible at this scale
    build_positional_index(p, idx, num_parts=8, doc_shift=3)

    dfs = term_doc_counts(idx, ["filler", "rareword", "absent"])
    assert dfs == {"filler": n, "rareword": len(rare_docs), "absent": 0}

    groups = [{"filler", "rareword"}]
    full = _candidate_rows(idx, {"filler", "rareword"}).to_pandas()
    pruned = _candidate_rows_pruned(idx, groups, hot_df=4,
                                    anchor_cap=10**6).to_pandas()
    full_hot = (full["term"] == "filler").sum()
    pruned_hot = (pruned["term"] == "filler").sum()
    assert full_hot == n
    # bounded: ≤ |anchor dbuckets| × bucket size, ≪ corpus
    assert pruned_hot <= len(rare_docs) * 8
    assert pruned_hot < full_hot / 2
    # and exactly the anchor docs' rows survive the doc filter
    assert set(pruned.loc[pruned["term"] == "filler", "doc_id"]) == rare_docs

    # end-to-end: pruned phrase results == unpruned
    want = (
        phrase_query(idx, [("p", "filler rareword")], hot_df=10**9)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    got = (
        phrase_query(idx, [("p", "filler rareword")], hot_df=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert set(got["doc_id"]) == rare_docs
    pd.testing.assert_frame_equal(got, want)

    # all-hot group: un-anchorable → audited exact fallback
    with pytest.warns(RuntimeWarning, match="anchor_cap"):
        fb = (
            phrase_query(idx, [("p", "filler common")], hot_df=4,
                         anchor_cap=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
    assert len(fb) == n  # every doc matches "filler common"
