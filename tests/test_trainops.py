"""Unit tests for the round-3 training-data operators: span-level exact
dedup (dup_spans / dup_span_docs), Gopher-style repetition quality,
deterministic stratified sampling, per-source capping, and bigram-LM
scoring — edge semantics the sf-parity suite can't isolate (doc-boundary
guards, cross-block distinct-doc summation, hand-computed oracles)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from document_retrieval_ray.pipelines.testdata_queries import (
    SOURCE_CAP_K,
    SPAN_N,
    STRAT_RATES,
    _flat_tok,
    _spans,
    q_dup_span_docs,
    q_dup_spans,
    q_lm_score,
    q_rep_quality,
    q_sample_stratified,
    q_source_cap,
)


def _write_docs(rows: list[dict], parts: int = 1) -> str:
    """Write a documents fixture; parts > 1 forces multiple read blocks
    (documents.parquet becomes a directory of part files)."""
    d = tempfile.mkdtemp()
    cols = {k: [r.get(k) for r in rows] for k in rows[0]}
    t = pa.table(cols)
    p = os.path.join(d, "documents.parquet")
    if parts == 1:
        pq.write_table(t, p)
    else:
        os.makedirs(p)
        step = (len(rows) + parts - 1) // parts
        for i in range(parts):
            pq.write_table(
                t.slice(i * step, step), os.path.join(p, f"part-{i}.parquet")
            )
    return d


def _doc(doc_id, text, lang="en", source="srcA"):
    return {"doc_id": doc_id, "text": text, "lang": lang, "source": source}


# ------------------------------------------------------------- _spans


def test_spans_doc_boundary_and_repeats():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b a b", "b a b"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    vals, parent = _flat_tok(t)
    w, wp = _spans(vals, parent, 2)
    # doc 0: "a b","b a","a b"; doc 1: "b a","a b" — no cross-doc "b b"
    assert list(w) == ["a b", "b a", "a b", "b a", "a b"]
    assert list(wp) == [0, 0, 0, 1, 1]
    w3, _ = _spans(vals, parent, 4)
    assert list(w3) == ["a b a b"]  # doc 1 (3 tokens) emits nothing


def test_spans_shorter_than_window():
    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["only two"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    vals, parent = _flat_tok(t)
    w, wp = _spans(vals, parent, 5)
    assert len(w) == 0 and len(wp) == 0


# ------------------------------------------------------- rep_quality


def test_rep_quality_hand_example(ray_session):
    sf = _write_docs(
        [
            _doc(0, "a a a b"),     # bigrams: (a a)x2,(a b) ; tri distinct
            _doc(1, "c c c c"),     # bigrams: (c c)x3 ; tri (c c c)x2 dup
            _doc(2, "single"),      # no bigrams -> absent
        ]
    )
    out = q_rep_quality(sf).to_pandas().set_index("doc_id")
    assert 2 not in out.index
    assert out.loc[0, "n_bigrams"] == 3
    assert out.loc[0, "top2gram_frac_x"] == int(
        np.floor(2 / 3 * 10000 + 0.5)
    )
    assert out.loc[0, "dup3gram_frac_x"] == 0  # "a a a","a a b" distinct
    assert out.loc[1, "n_bigrams"] == 3
    assert out.loc[1, "top2gram_frac_x"] == 10000
    assert out.loc[1, "dup3gram_frac_x"] == 5000  # 1 distinct of 2


def test_rep_quality_short_doc_has_zero_trigram_frac(ray_session):
    sf = _write_docs([_doc(0, "x y")])
    out = q_rep_quality(sf).to_pandas()
    assert out.loc[0, "n_bigrams"] == 1
    assert out.loc[0, "dup3gram_frac_x"] == 0


# --------------------------------------------------------- dup_spans


SHARED = "alpha beta gamma delta epsilon"  # exactly SPAN_N tokens
assert len(SHARED.split()) == SPAN_N


def test_dup_spans_cross_block_distinct_docs(ray_session):
    # the shared span sits in 3 docs split across 2 read blocks; the
    # per-batch distinct-doc partials must SUM to 3 across blocks
    sf = _write_docs(
        [
            _doc(0, SHARED + " zeta"),
            _doc(1, "eta " + SHARED),
            _doc(2, SHARED),
            _doc(3, "unrelated words only here now"),
        ],
        parts=2,
    )
    out = q_dup_spans(sf).to_pandas()
    from document_retrieval_ray.functions.hashing import md5_hex

    h = md5_hex(SHARED)
    row = out[out["span_hash"] == h]
    assert len(row) == 1
    assert int(row["n_docs"].iloc[0]) == 3
    assert int(row["n_occ"].iloc[0]) == 3


def test_dup_spans_same_doc_repeat_not_cross_doc(ray_session):
    # a span repeated twice INSIDE one doc is not a cross-doc duplicate
    sf = _write_docs(
        [
            _doc(0, SHARED + " filler " + SHARED),
            _doc(1, "totally different text goes here"),
        ]
    )
    out = q_dup_spans(sf).to_pandas()
    from document_retrieval_ray.functions.hashing import md5_hex

    hashes = (
        set(out["span_hash"]) if "span_hash" in out.columns else set()
    )
    assert md5_hex(SHARED) not in hashes


def test_dup_span_docs_coverage(ray_session):
    # doc 0 has 2 windows, of which 1 (= SHARED) also occurs in doc 1
    sf = _write_docs(
        [
            _doc(0, SHARED + " tail"),
            _doc(1, SHARED),
            _doc(2, "nothing in common with others at all"),
        ]
    )
    out = q_dup_span_docs(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_spans"] == 2
    assert out.loc[0, "n_dup_spans"] == 1
    assert out.loc[1, "n_spans"] == 1
    assert out.loc[1, "n_dup_spans"] == 1
    assert out.loc[2, "n_dup_spans"] == 0


# ------------------------------------------------------- source_cap


def test_source_cap_keeps_k_smallest_per_source(ray_session):
    rows = [
        _doc(i, f"text {i}", source=("s1" if i % 2 == 0 else "s2"))
        for i in range(30)
    ]
    sf = _write_docs(rows)
    out = q_source_cap(sf).to_pandas()
    for src, g in out.groupby("source"):
        assert len(g) == SOURCE_CAP_K
        expect = sorted(
            r["doc_id"] for r in rows if r["source"] == src
        )[:SOURCE_CAP_K]
        assert sorted(g["doc_id"]) == expect
        assert sorted(g["src_rank"]) == list(range(1, SOURCE_CAP_K + 1))


# ------------------------------------------------ sample_stratified


def test_sample_stratified_deterministic_and_correct(ray_session):
    from document_retrieval_ray.functions.hashing import md5_hex

    sf = "/root/testdata/sf0.001"
    a = q_sample_stratified(sf).to_pandas().sort_values("doc_id")
    b = q_sample_stratified(sf).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    for r in a.itertuples():
        assert md5_hex(str(r.doc_id))[:2] < STRAT_RATES[r.lang]


# ---------------------------------------------------------- lm_score


def test_lm_score_hand_example(ray_session):
    sf = _write_docs([_doc(0, "a b"), _doc(1, "a b a c")])
    out = q_lm_score(sf).to_pandas().set_index("doc_id")
    # counts: c(a,b)=2 c(b,a)=1 c(a,c)=1 ; c1(a)=3 c1(b)=1 ; V={a,b} -> 2
    lp = lambda c12, c1: int(
        np.floor(np.log((c12 + 1.0) / (c1 + 2.0)) * 1e6 + 0.5)
    )
    assert out.loc[0, "n_bigrams"] == 1
    assert out.loc[0, "logprob_x"] == lp(2, 3)
    assert out.loc[1, "n_bigrams"] == 3
    assert out.loc[1, "logprob_x"] == lp(2, 3) + lp(1, 1) + lp(1, 3)


def test_lm_score_langs_are_independent(ray_session):
    # the same bigram in another lang must not share counts
    sf = _write_docs(
        [_doc(0, "x y", lang="en"), _doc(1, "x y", lang="de")]
    )
    out = q_lm_score(sf).to_pandas().set_index("doc_id")
    # each lang: c12=1 c1=1 V=1 -> ln(2/2)=0
    assert out.loc[0, "logprob_x"] == 0
    assert out.loc[1, "logprob_x"] == 0


# --------------------------------------------------------- range_join


def _write_events(rows: list[dict]) -> str:
    d = tempfile.mkdtemp()
    t = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "ts": pa.array(
                [r["ts"] for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array(
                [r["event_type"] for r in rows], pa.string()
            ),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


def test_range_join_window_boundaries(ray_session):
    from document_retrieval_ray.pipelines.testdata_queries import (
        q_range_join,
    )

    H = 3_600_000_000  # 1h in us
    T = 1_700_000_000_000_000  # purchase time
    ev = [
        {"event_id": 1, "ts": T, "user_id": 7, "event_type": "purchase"},
        # in [T-H, T): exactly at T-H counts, strictly before T counts
        {"event_id": 2, "ts": T - H, "user_id": 7, "event_type": "click"},
        {"event_id": 3, "ts": T - 1, "user_id": 7, "event_type": "click"},
        # excluded: exactly at T, before T-H, other user, other type
        {"event_id": 4, "ts": T, "user_id": 7, "event_type": "click"},
        {"event_id": 5, "ts": T - H - 1, "user_id": 7, "event_type": "click"},
        {"event_id": 6, "ts": T - 10, "user_id": 8, "event_type": "click"},
        {"event_id": 7, "ts": T - 10, "user_id": 7, "event_type": "view"},
        # a purchase with no clicks at all for its user
        {"event_id": 8, "ts": T, "user_id": 9, "event_type": "purchase"},
    ]
    sf = _write_events(ev)
    out = q_range_join(sf).to_pandas().set_index("event_id")
    assert out.loc[1, "n_clicks"] == 2
    assert out.loc[8, "n_clicks"] == 0
    assert len(out) == 2


def test_pagerank_integer_matches_reference_loop(ray_session):
    """pagerank_integer == a hand-rolled driver loop of the documented
    integer recurrence on a path graph (hub node 2 must rank first)."""
    import numpy as np
    import ray.data

    from document_retrieval_ray.stages.graph import (
        PAGERANK_SCALE,
        pagerank_integer,
    )

    pairs = ray.data.from_items([
        {"a": 1, "b": 2}, {"a": 2, "b": 3},
    ])
    got = (
        pagerank_integer(pairs, iters=4, num_parts=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # reference: adjacency {1:[2], 2:[1,3], 3:[2]}
    adj = {1: [2], 2: [1, 3], 3: [2]}
    base = PAGERANK_SCALE // 3
    s = {n: base for n in adj}
    for _ in range(4):
        inc = {n: 0 for n in adj}
        for j, outs in adj.items():
            c = s[j] // len(outs)
            for i in outs:
                inc[i] += c
        s = {n: (15 * base + 85 * inc[n]) // 100 for n in adj}
    want = sorted(s.items())
    assert list(got["doc_id"]) == [n for n, _ in want]
    assert list(got["pr"]) == [v for _, v in want]
    assert max(s, key=lambda n: s[n]) == 2  # the hub


def test_pagerank_empty_graph(ray_session):
    import pyarrow as pa
    import ray.data

    from document_retrieval_ray.stages.graph import pagerank_integer

    empty = ray.data.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
    }))
    ds = pagerank_integer(empty)
    assert ds.count() == 0
    assert [f.name for f in ds.schema().base_schema] == ["doc_id", "pr"]


def test_bm25f_title_hit_outranks_body_hit():
    """Two same-length docs, the query term in the TITLE field of one and
    the BODY field of the other: the title hit must score higher (field
    weight 2.0 vs 1.0); a doc without the term scores 0."""
    import pyarrow as pa

    from document_retrieval_ray.pipelines.testdata_queries import (
        _bm25f_partial,
        _bm25f_score_partial,
    )

    filler = ["pad%d" % i for i in range(12)]
    title_hit = "zzkey " + " ".join(filler[:11])          # term at pos 0
    body_hit = " ".join(filler[:11]) + " zzkey"           # term at pos 11
    no_hit = " ".join(filler)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([title_hit, body_hit, no_hit], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
    })
    agg = _bm25f_partial(t, ("zzkey",)).to_pandas()
    st = agg[agg["term"] == ""].iloc[0]
    stats = {"en": (int(st["n"]), int(st["sdt"]) / int(st["n"]),
                    int(st["sdb"]) / int(st["n"]))}
    dfmap = {("en", "zzkey"): int(agg[agg["term"] == "zzkey"]["df"].iloc[0])}
    out = _bm25f_score_partial(
        t, stats, dfmap, [("q1", "en", [("zzkey", 1)])]
    ).to_pandas()
    assert set(out["doc_id"]) == {1, 2}  # no-hit doc absent
    s = dict(zip(out["doc_id"], out["score_x"]))
    assert s[1] > s[2]


def test_funnel_strict_order_and_ties():
    """Out-of-order events don't advance the funnel, and a same-timestamp
    next-step event does NOT count (strictly-after semantics)."""
    import pyarrow as pa

    from document_retrieval_ray.pipelines.testdata_queries import (
        _funnel_partition,
    )

    rows = [
        # u1: clean view(10) -> click(20) -> purchase(30) => depth 3
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click BEFORE view => only view counts => depth 1
        (2, "click", 5), (2, "view", 10),
        # u3: click at the SAME ts as view => strict > fails => depth 1
        (3, "view", 10), (3, "click", 10),
        # u4: purchase without click => depth 1 (view only)
        (4, "view", 10), (4, "purchase", 30),
        # u5: no view at all => depth 0
        (5, "click", 10), (5, "purchase", 20),
    ]
    g = pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_type": [r[1] for r in rows],
        "tsu": [r[2] for r in rows],
    })
    out = _funnel_partition(g).set_index("user_id")["depth"]
    assert dict(out) == {1: 3, 2: 1, 3: 1, 4: 1, 5: 0}


def test_nb_classify_hand_example(ray_session):
    """Two langs with distinctive vocab: predictions recover the true
    lang, and one score is checked against the hand-computed integer
    recurrence (priors + tf·fx6(ln(c+1)) − dl·fx6(ln(c_l + V)))."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        _fx6,
        q_nb_classify,
    )

    sf = _write_docs([
        _doc(0, "apple apple banana", lang="en"),
        _doc(1, "apple banana banana", lang="en"),
        _doc(2, "pomme poire pomme", lang="fr"),
        _doc(3, "poire poire pomme", lang="fr"),
    ])
    out = q_nb_classify(sf).to_pandas().set_index("doc_id")
    assert dict(out["pred_lang"]) == {0: "en", 1: "en", 2: "fr", 3: "fr"}
    # hand-check doc 0 under cand=en:
    # counts en: apple=3, banana=3; c_en=6; V=4 (apple banana pomme poire)
    # prior ln(2/4); s1 = 2*fx6(ln(4)) + 1*fx6(ln(4)); dl=3
    want = (
        _fx6(np.log(2 / 4))
        + 2 * _fx6(np.log(3 + 1)) + 1 * _fx6(np.log(3 + 1))
        - 3 * _fx6(np.log(6 + 4))
    )
    assert int(out.loc[0, "score_x"]) == want


def test_count_triangles_hand_graph(ray_session):
    """Triangle {1,2,3} + 4-clique {10..13} (C(4,3)=4) + a square and a
    dangling edge (0 each) => 5; each triangle counted exactly once."""
    import ray.data

    from document_retrieval_ray.stages.graph import count_triangles

    edges = [(1, 2), (1, 3), (2, 3),            # triangle
             (3, 4),                            # dangling
             (5, 6), (6, 7), (7, 8), (5, 8)]    # square, no diagonal
    edges += [(a, b) for a in (10, 11, 12, 13)
              for b in (10, 11, 12, 13) if a < b]  # 4-clique
    pairs = ray.data.from_items([{"a": a, "b": b} for a, b in edges])
    assert count_triangles(pairs, num_parts=4) == 5


def test_count_triangles_empty(ray_session):
    import pyarrow as pa
    import ray.data

    from document_retrieval_ray.stages.graph import count_triangles

    empty = ray.data.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
    }))
    assert count_triangles(empty) == 0


def test_count_triangles_star_hub(ray_session):
    """A star (hub 1 → 2..9) has C(8,2)=28 wedges but zero closures —
    exercises the wedge path without any triangle; adding one rim edge
    (2,3) closes exactly one."""
    import ray.data

    from document_retrieval_ray.stages.graph import count_triangles

    star = [(1, b) for b in range(2, 10)]
    pairs = ray.data.from_items([{"a": a, "b": b} for a, b in star])
    assert count_triangles(pairs, num_parts=4) == 0
    pairs2 = ray.data.from_items(
        [{"a": a, "b": b} for a, b in star + [(2, 3)]])
    assert count_triangles(pairs2, num_parts=4) == 1


def test_event_bigrams_kernel_order_and_guard(ray_session, tmp_path):
    """Hand oracle: ts ties break by event_id; single-event users emit
    nothing; transitions never cross a user boundary."""
    import pyarrow.parquet as pq_

    from document_retrieval_ray.pipelines.testdata_queries import (
        q_event_bigrams,
    )

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array([100, 100, 200, 100, 300, 100],
                       pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 8, 8, 9], pa.int64()),
        "event_type": ["a", "b", "c", "b", "a", "c"],
        "value": pa.array([0.0] * 6, pa.float64()),
        "props": ["{}"] * 6,
    })
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    out = q_event_bigrams(str(tmp_path))
    got = {(r.t1, r.t2): r.n for r in out.itertuples()}
    # user 7: a(ts100,id1) -> b(ts100,id2) -> c(ts200): (a,b), (b,c)
    # user 8: b -> a; user 9: single event, nothing
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("b", "a"): 1}


def test_count_triangles_random_vs_bruteforce(ray_session):
    """Seeded random G(n, p) graphs vs an O(n^3) itertools oracle —
    covers hub skew, isolated nodes, and multi-partition closure."""
    import itertools

    import ray.data

    from document_retrieval_ray.stages.graph import count_triangles

    rng = np.random.default_rng(1234)
    for n, p in ((12, 0.4), (20, 0.25), (30, 0.15)):
        edges = [(a, b) for a in range(n) for b in range(a + 1, n)
                 if rng.random() < p]
        want = sum(
            1 for u, v, w in itertools.combinations(range(n), 3)
            if (u, v) in set(edges) and (u, w) in set(edges)
            and (v, w) in set(edges)
        )
        pairs = ray.data.from_items(
            [{"a": a, "b": b} for a, b in edges])
        assert count_triangles(pairs, num_parts=8) == want, (n, p)
