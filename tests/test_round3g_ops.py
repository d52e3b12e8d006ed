"""Edge cases for the round-3g operators (ann_filtered, covisit,
extract_summary, vocab_drift) on crafted tables: a best-overall
neighbor excluded by the label filter, a query whose own label is
disallowed, the per-user item cap and min-support filter, a summary
score tie broken by sentence order, a term present in only one
snapshot half, and the drift min-total filter. Each case runs the REAL
query function against the REAL oracle SQL on the crafted parquet."""

import os

import duckdb
import numpy as np
import pandas as pd

from document_retrieval_ray.pipelines.testdata_queries import (
    ANN_FILTER_LABELS,
    COVISIT_MAX_ITEMS,
    COVISIT_MIN_USERS,
    DRIFT_MIN_TOTAL,
    EMB_DIM,
    ORACLE_SQL,
    QUERIES,
    SUMMARY_TOPK,
)


def _run(name, sf_dir, tables):
    got = QUERIES[name](sf_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    exp = con.execute(ORACLE_SQL[name]).fetchdf()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    return got


def test_ann_filtered_label_gate(ray_session, tmp_path):
    """The globally best neighbor carries a disallowed label and must be
    excluded; a query whose OWN label is disallowed still searches."""
    bad = next(l for l in range(10) if l not in ANN_FILTER_LABELS)
    ok = ANN_FILTER_LABELS[0]
    e = np.zeros((8, EMB_DIM), dtype=np.float32)
    labels = np.zeros(8, dtype=np.int32)
    for q in range(5):                 # queries 0..4 on unit axes
        e[q, q] = 1.0
    labels[0] = bad                    # q0's own label is disallowed
    e[5, 0] = 3.0                      # cos(q0)=1.0 — but label is bad
    labels[5] = bad
    e[6, 0] = 1.0                      # cos(q0)=~0.89, allowed
    e[6, 5] = 0.5
    labels[6] = ok
    e[7, 1] = 1.0                      # exact dup of q1, allowed
    labels[7] = ok
    pd.DataFrame(
        {
            "vec_id": np.arange(8, dtype=np.int64),
            "embedding": [row for row in e],
            "label": labels,
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)

    got = _run("ann_filtered", str(tmp_path), ["embeddings"])
    q0 = got[got["query_vec"] == 0].sort_values("rank")
    assert 5 not in set(q0["vec_id"]), "disallowed label leaked into top-k"
    assert q0.iloc[0]["vec_id"] == 6   # best ALLOWED neighbor wins
    q1 = got[got["query_vec"] == 1].sort_values("rank")
    assert q1.iloc[0]["vec_id"] == 7 and q1.iloc[0]["cos_x"] == 10000


def test_covisit_cap_and_support(ray_session, tmp_path):
    """User A visits cap+4 items (only the cap smallest pair up); users
    B and C share items (1, 2) so that pair reaches min support; B's
    repeat view of item 1 counts once; a signup event is ignored."""
    rows = []
    # user 1: items 0 .. cap+3 (clicks) — cap keeps 0..cap-1
    for it in range(COVISIT_MAX_ITEMS + 4):
        rows.append((1, "click", '{"k": %d}' % it))
    # users 2 and 3 both view items 1 and 2 → pair (1,2) support 3 (with
    # user 1), items (1, cap+1) only via user 1 → below support after cap
    for u in (2, 3):
        rows.append((u, "view", '{"k": 1}'))
        rows.append((u, "view", '{"k": 2}'))
    rows.append((2, "view", '{"k": 1}'))          # duplicate — distinct
    rows.append((2, "signup", '{"k": 9}'))        # ignored event type
    pd.DataFrame(rows, columns=["user_id", "event_type", "props"]).astype(
        {"user_id": "int64"}
    ).to_parquet(tmp_path / "events.parquet", index=False)

    got = _run("covisit", str(tmp_path), ["events"])
    pair12 = got[(got["a"] == 1) & (got["b"] == 2)]
    assert len(pair12) == 1 and int(pair12["n_users"].iloc[0]) == 3
    # items beyond the cap never pair (user 1 kept only 0..cap-1)
    assert int(got["b"].max()) <= COVISIT_MAX_ITEMS - 1
    # every emitted pair meets min support
    assert (got["n_users"] >= COVISIT_MIN_USERS).all()


def test_extract_summary_tie_and_single(ray_session, tmp_path):
    """Two sentences with identical unique-term idf sums tie → the lower
    sent_idx ranks first; a one-sentence doc emits a single row; a
    duplicated term within a sentence counts once."""
    docs = pd.DataFrame(
        {
            "doc_id": np.array([0, 1], dtype=np.int64),
            # doc 0: s0 and s1 contain the same term set {alpha, beta}
            # (s1 repeats alpha — dedup makes the score equal); s2 has
            # only the corpus-wide common term.
            "text": [
                "alpha beta. beta alpha alpha. common",
                "common",
            ],
            "lang": ["en", "en"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    got = _run("extract_summary", str(tmp_path), ["documents"])
    d0 = got[got["doc_id"] == 0].sort_values("rank")
    assert len(d0) == SUMMARY_TOPK
    assert list(d0["sent_idx"]) == [0, 1]          # tie → sent order
    assert d0["score_x"].iloc[0] == d0["score_x"].iloc[1]
    d1 = got[got["doc_id"] == 1]
    assert len(d1) == 1 and int(d1["sent_idx"].iloc[0]) == 0


def test_vocab_drift_half_only_and_min_total(ray_session, tmp_path):
    """A term occurring only in half A exercises the b=0 branch; a rare
    term under DRIFT_MIN_TOTAL is dropped; equal-G² terms order by term
    asc via rank."""
    even_text = " ".join(["onlya"] * DRIFT_MIN_TOTAL + ["shared"] * 10)
    odd_text = " ".join(["rare"] + ["shared"] * 10)
    docs = pd.DataFrame(
        {
            "doc_id": np.array([0, 1], dtype=np.int64),
            "text": [even_text, odd_text],
            "lang": ["en", "en"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    got = _run("vocab_drift", str(tmp_path), ["documents"])
    terms = set(got["term"])
    assert "onlya" in terms            # b = 0 branch survives and scores
    assert "rare" not in terms         # under DRIFT_MIN_TOTAL
    only = got[got["term"] == "onlya"].iloc[0]
    assert int(only["cnt_b"]) == 0 and int(only["g2_x"]) > 0
    assert list(got["rank"]) == sorted(got["rank"])


def test_knn_mutual_hub_removed(ray_session, tmp_path):
    """A hub vector close to many others appears in THEIR top-k while its
    own top-k holds only its closest few — one-directional edges must not
    survive; a perfect mutual pair must."""
    from document_retrieval_ray.pipelines.testdata_queries import EMB_DIM

    rng = np.random.default_rng(7)
    e = np.zeros((12, EMB_DIM), dtype=np.float32)
    # 0 and 1: a tight mutual pair on an isolated axis
    e[0, 10] = 1.0
    e[1, 10] = 1.0
    e[1, 11] = 0.05
    # 2: hub — equal moderate similarity to 3..11 (spokes), whose own
    # top-3 each contains the hub, while the hub's top-3 holds only the
    # 3 closest spokes
    e[2, 0] = 1.0
    for i, v in enumerate(range(3, 12)):
        e[v, 0] = 1.0
        e[v, 1 + (i % 5)] = 0.4 + 0.05 * i   # distinct off-axis noise
    pd.DataFrame(
        {
            "vec_id": np.arange(12, dtype=np.int64),
            "embedding": [row for row in e],
            "label": np.zeros(12, dtype=np.int32),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)

    got = _run("knn_mutual", str(tmp_path), ["embeddings"])
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 1) in pairs                      # mutual pair survives
    assert got[(got["a"] == 0) & (got["b"] == 1)]["cos_x"].iloc[0] > 9900
    # every emitted pair is canonical (a < b) and unique
    assert (got["a"] < got["b"]).all()
    assert len(pairs) == len(got)


def test_search_after_page_boundary(ray_session):
    """Page 2 of the reference ranking: disjoint from page 1, strictly
    after page 1's cursor in (score desc, id asc) order, and empty for
    queries whose page 1 was short."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        SEARCH_AFTER_PAGE,
        q_bm25_reference,
        q_search_after,
    )

    sf = "/root/testdata/sf0.001"
    p1 = q_bm25_reference(sf)
    p2 = q_search_after(sf)
    for qid, g2 in p2.groupby("query_id"):
        g1 = p1[p1["query_id"] == qid].sort_values("rank")
        assert len(g1) == SEARCH_AFTER_PAGE     # page 2 ⇒ page 1 full
        cur = g1.iloc[-1]
        overlap = set(g1["doc_id"]) & set(g2["doc_id"])
        assert not overlap
        for r in g2.itertuples():
            assert (r.score_x, -r.doc_id) < (cur.score_x, -cur.doc_id)
            assert r.rank > SEARCH_AFTER_PAGE
    short = {q for q, g in p1.groupby("query_id") if len(g) < SEARCH_AFTER_PAGE}
    assert short.isdisjoint(set(p2["query_id"]))


def test_df_histogram_bucket_edges(ray_session, tmp_path):
    """df values at exact powers of two land in their own bucket (log2 is
    exact there); df=1 → bucket 0."""
    # term 'one' in 1 doc, 'two' in 2, 'three' in 3, 'four' in 4
    texts = []
    for i in range(4):
        parts = ["one"] if i == 0 else []
        if i < 2:
            parts.append("two")
        if i < 3:
            parts.append("three")
        parts.append("four")
        texts.append(" ".join(parts))
    pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * 4,
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    got = _run("df_histogram", str(tmp_path), ["documents"])
    hist = {int(r.bucket): int(r.n_terms) for r in got.itertuples()}
    # df=1 → bucket 0 ('one'); df=2,3 → bucket 1 ('two','three');
    # df=4 → bucket 2 ('four')
    assert hist == {0: 1, 1: 2, 2: 1}


def _ts(day: int) -> pd.Timestamp:
    return pd.Timestamp("2025-01-01") + pd.Timedelta(days=day)


def test_popularity_decay_chain(ray_session, tmp_path):
    """Same-day events weigh w0; an event `age` days older weighs the
    exact integer chain value; ignored event types don't score."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        DECAY_W0,
        _decay_weights,
    )

    rows = [
        # item 1: two hits on the newest day, one hit 3 days older
        (_ts(10), "click", '{"k": 1}'),
        (_ts(10), "view", '{"k": 1}'),
        (_ts(7), "click", '{"k": 1}'),
        # item 2: one hit on the oldest day only
        (_ts(5), "view", '{"k": 2}'),
        # ignored type on the newest day
        (_ts(10), "signup", '{"k": 3}'),
    ]
    df = pd.DataFrame(rows, columns=["ts", "event_type", "props"]).assign(
        user_id=np.arange(len(rows), dtype=np.int64)
    )
    df["ts"] = df["ts"].astype("datetime64[us]")   # the events table's unit
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = _run("popularity_decay", str(tmp_path), ["events"])
    w = _decay_weights(5)          # ages 0..5 (day 10 − day 5)
    s = {int(r.item): int(r.score_x) for r in got.itertuples()}
    assert s[1] == 2 * DECAY_W0 + w[3]
    assert s[2] == w[5]
    assert 3 not in s


def test_streaks_islands(ray_session, tmp_path):
    """Consecutive days merge into one streak; a 1-day gap splits; two
    hits on the same day dedup; users are independent."""
    rows = [
        (1, _ts(0)), (1, _ts(1)), (1, _ts(1)), (1, _ts(2)),   # 0-2 streak
        (1, _ts(4)),                                          # singleton
        (2, _ts(3)), (2, _ts(4)),                             # 3-4 streak
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"]).astype(
        {"user_id": "int64"}
    )
    df["ts"] = df["ts"].astype("datetime64[us]")   # the events table's unit
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = _run("streaks", str(tmp_path), ["events"])
    base = int(got["streak_start"].min())
    rel = {
        (int(r.user_id), int(r.streak_start) - base,
         int(r.streak_end) - base, int(r.n_days))
        for r in got.itertuples()
    }
    assert rel == {(1, 0, 2, 3), (1, 4, 4, 1), (2, 3, 4, 2)}


def test_search_after_native_seek(ray_session):
    """The scorer's native cursor (after_score_x, after_url query
    columns → topk_with_ties(after=...) seek) returns EXACTLY ranks
    11..20 of a 2-page-deep fetch — page-2-by-cursor is rank-identical
    to deep paging, per query, including score_x values."""
    import ray as ray_

    from document_retrieval_ray.config import BM25Config
    from document_retrieval_ray.pipelines import testdata_queries as tq
    from document_retrieval_ray.pipelines.query import bm25_search

    sf = "/root/testdata/sf0.001"
    index_dir = tq._index_for(sf)
    base = dict(k1=1.5, b=0.75, idf="lucene", compat="reference")
    deep = bm25_search(
        tq._query_ds(), index_dir, cfg=BM25Config(**base, k=20), round_dp=4
    ).to_pandas()

    page1 = deep[deep["rank"] <= 10]
    cur = page1[page1["rank"] == 10].set_index("query_id")
    assert len(cur), "fixture needs at least one full page-1 query"
    qrows = [
        {
            "query_id": q,
            "query": t,
            "lang": l,
            "after_score_x": int(cur.loc[q, "score_x"]),
            "after_url": str(cur.loc[q, "url"]),
        }
        for q, t, l in tq.QUERYSET
        if q in cur.index
    ]
    got = bm25_search(
        ray_.data.from_items(qrows), index_dir,
        cfg=BM25Config(**base, k=10), round_dp=4,
    ).to_pandas()

    exp = deep[(deep["rank"] > 10) & (deep["query_id"].isin(cur.index))]
    assert len(got) == len(exp)
    for qid in cur.index:
        g = got[got["query_id"] == qid].sort_values("rank")
        x = exp[exp["query_id"] == qid].sort_values("rank")
        assert list(g["url"]) == list(x["url"]), qid
        assert list(g["score_x"]) == list(x["score_x"]), qid
        # page-local rank numbering: 1..page vs the deep fetch's 11..20
        assert list(g["rank"]) == [r - 10 for r in x["rank"]], qid


def test_popularity_decay_no_qualifying_events(ray_session, tmp_path):
    """An events table with no click/view rows yields an empty frame
    (the span aggregate guard), matching the oracle's empty result."""
    df = pd.DataFrame(
        {
            "user_id": np.array([1], dtype=np.int64),
            "event_type": ["signup"],
            "props": ['{"k": 1}'],
        }
    )
    df["ts"] = pd.Series([pd.Timestamp("2025-01-01")]).astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = _run("popularity_decay", str(tmp_path), ["events"])
    assert len(got) == 0


def test_group_distinct_dedups(ray_session, tmp_path):
    """Repeated (event_type, user) rows count once."""
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 2, 3], dtype=np.int64),
            "event_type": ["click", "click", "view", "click", "view"],
            "props": ['{"k": 1}'] * 5,
        }
    )
    df["ts"] = pd.Series([pd.Timestamp("2025-01-01")] * 5).astype(
        "datetime64[us]"
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = _run("group_distinct", str(tmp_path), ["events"])
    assert {r.event_type: int(r.n_users) for r in got.itertuples()} == {
        "click": 2, "view": 2,
    }


def test_also_viewed_tie_and_cap(ray_session, tmp_path):
    """Equal-support recs order by item id; at most ALSO_VIEWED_K rows
    per item; both directions of a pair appear."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        ALSO_VIEWED_K,
    )

    rows = []
    # items 1..6 all co-visited with item 0 by 2 users each → 6 recs for
    # item 0, all tied at n_users=2 → rank by rec asc, capped at K
    for u in range(2):
        for it in range(7):
            rows.append((u, "view", '{"k": %d}' % it))
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "props"]).astype(
        {"user_id": "int64"}
    )
    df["ts"] = pd.Series([pd.Timestamp("2025-01-01")] * len(df)).astype(
        "datetime64[us]"
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = _run("also_viewed", str(tmp_path), ["events"])
    i0 = got[got["item"] == 0].sort_values("rank")
    assert len(i0) == ALSO_VIEWED_K
    assert list(i0["rec"]) == [1, 2, 3][:ALSO_VIEWED_K]   # tie → id asc
    # symmetric: item 6 recommends 0 too
    i6 = got[got["item"] == 6]
    assert 0 in set(i6["rec"])


def test_dl_percent_rank_ties_and_singleton(ray_session, tmp_path):
    """Equal lengths share a percent rank (rank = count strictly below);
    a single-doc language gets 0."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": ["a b", "c d", "e f g", "h", "solo"],
            "lang": ["en", "en", "en", "en", "fr"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = _run("dl_percent_rank", str(tmp_path), ["documents"])
    en = got[got["lang"] == "en"].set_index("doc_id")["pr_x"]
    # en dls: 2, 2, 3, 1 → below-counts 1, 1, 3, 0 over n-1=3
    assert int(en[3]) == 0
    assert int(en[0]) == int(en[1]) == (10000 * 1) // 3
    assert int(en[2]) == 10000
    fr = got[got["lang"] == "fr"]
    assert int(fr["pr_x"].iloc[0]) == 0


def test_table_checksum_detects_corruption(ray_session, tmp_path):
    """Permuting rows keeps the checksum; flipping one character in one
    row changes it."""
    base = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["alpha", "beta", "gamma", "delta"],
            "lang": ["en"] * 4,
        }
    )
    base.to_parquet(tmp_path / "documents.parquet", index=False)
    a = _run("table_checksum", str(tmp_path), ["documents"])

    perm = base.iloc[[2, 0, 3, 1]].reset_index(drop=True)
    perm.to_parquet(tmp_path / "documents.parquet", index=False)
    b = _run("table_checksum", str(tmp_path), ["documents"])
    assert int(a["checksum"].iloc[0]) == int(b["checksum"].iloc[0])

    bad = base.copy()
    bad.loc[1, "text"] = "betb"
    bad.to_parquet(tmp_path / "documents.parquet", index=False)
    c = _run("table_checksum", str(tmp_path), ["documents"])
    assert int(c["checksum"].iloc[0]) != int(a["checksum"].iloc[0])
    assert int(c["n_docs"].iloc[0]) == int(a["n_docs"].iloc[0])


def test_eval_ndcg_perfect_and_zero(ray_session, tmp_path):
    """A query whose single relevant doc ranks #1 scores ndcg_x=10000;
    a query with no relevant docs scores 0; parity holds on the crafted
    corpus."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            # doc 0 contains ALL of q01's terms ("spark join window") →
            # the only relevant doc, and the top hit; others match some
            "text": [
                "spark join window",
                "spark spark filler",
                "join filler text",
            ],
            "lang": ["en"] * 3,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = _run("eval_ndcg", str(tmp_path), ["documents"])
    q01 = got[got["query_id"] == "q01"].iloc[0]
    assert int(q01["n_relevant"]) == 1 and int(q01["ndcg_x"]) == 10000
    # q04 "vector stream" (es) has no matching docs at all
    q04 = got[got["query_id"] == "q04"].iloc[0]
    assert int(q04["n_relevant"]) == 0 and int(q04["ndcg_x"]) == 0


def test_conversion_lag_edges(ray_session, tmp_path):
    """First-signup→first-purchase gap: a purchase BEFORE the signup
    disqualifies (negative gap), same-instant converts with gap 0,
    users missing either event emit nothing."""
    rows = [
        (1, "signup", 0), (1, "purchase", 5), (1, "purchase", 2),  # gap 2
        (2, "purchase", 1), (2, "signup", 3),                      # negative
        (3, "signup", 7), (3, "purchase", 7),                      # gap 0
        (4, "signup", 9),                                          # no buy
        (5, "purchase", 9),                                        # no signup
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "off"]).astype(
        {"user_id": "int64"}
    )
    df["ts"] = (
        pd.Timestamp("2025-01-01")
        + pd.to_timedelta(df.pop("off"), unit="s")
    ).astype("datetime64[us]")
    df["props"] = '{"k": 1}'
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = _run("conversion_lag", str(tmp_path), ["events"])
    lag = {int(r.user_id): int(r.gap_us) for r in got.itertuples()}
    assert lag == {1: 2_000_000, 3: 0}
