"""Round-4 regression tests for the ADVICE items: the search-after
cursor under raw-float keys (round_dp=None), the half-specified-cursor
fail-loud path, and digitless-props rows in covisit/popularity_decay
(the first-digit-run extraction yields null — both engine and oracle
must drop the row, not crash)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from document_retrieval_ray.pipelines.testdata_queries import (
    ORACLE_SQL,
    QUERIES,
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


def _events_frame(rows):
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "props", "ts"])
    df["user_id"] = df["user_id"].astype("int64")
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def test_covisit_digitless_props(ray_session, tmp_path):
    """Props with no digit run extract to a null item: the row is
    dropped on both sides instead of crashing the pair kernel."""
    t0 = pd.Timestamp("2025-01-01")
    rows = [
        (1, "click", '{"k": 7}', t0),
        (1, "click", '{"k": 9}', t0),
        (1, "view", "no digits here", t0),      # dropped
        (2, "click", '{"k": 7}', t0),
        (2, "view", '{"k": 9}', t0),
        (2, "click", "", t0),                   # dropped
        (3, "view", "none", t0),                # user with ONLY null items
    ]
    _events_frame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    got = _run("covisit", str(tmp_path), ["events"])
    assert {(int(r.a), int(r.b), int(r.n_users)) for r in got.itertuples()} \
        == {(7, 9, 2)}


def test_popularity_decay_digitless_props(ray_session, tmp_path):
    """Digitless props drop BEFORE the day-span aggregate, so a stray
    unparseable row cannot stretch the decay table either."""
    t0 = pd.Timestamp("2025-01-10")
    rows = [
        (1, "click", '{"k": 5}', t0),
        (2, "view", '{"k": 5}', t0 - pd.Timedelta(days=1)),
        # digitless click far in the past: must NOT extend the age span
        (3, "click", "ancient digitless", t0 - pd.Timedelta(days=300)),
    ]
    _events_frame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    got = _run("popularity_decay", str(tmp_path), ["events"])
    s = {int(r.item): int(r.score_x) for r in got.itertuples()}
    # w0 + w1 = 10000 + 9000 over a 1-day span
    assert s == {5: 19000}


def _cursor_fixtures():
    from document_retrieval_ray.pipelines import testdata_queries as tq

    sf = "/root/testdata/sf0.001"
    return sf, tq, tq._index_for(sf)


def test_cursor_raw_float_seek(ray_session):
    """round_dp=None (raw float rank keys): the cursor key must stay a
    float — int() truncation would let same-int-different-float docs
    leak back into page 2."""
    import ray as ray_

    from document_retrieval_ray.config import BM25Config
    from document_retrieval_ray.pipelines.query import bm25_search

    sf, tq, index_dir = _cursor_fixtures()
    base = dict(k1=1.5, b=0.75, idf="lucene", compat="reference")
    deep = bm25_search(
        tq._query_ds(), index_dir, cfg=BM25Config(**base, k=20),
        round_dp=None,
    ).to_pandas()
    page1 = deep[deep["rank"] <= 10]
    cur = page1[page1["rank"] == 10].set_index("query_id")
    assert len(cur), "fixture needs at least one full page-1 query"
    qrows = [
        {
            "query_id": q,
            "query": t,
            "lang": l,
            "after_score_x": float(cur.loc[q, "score"]),
            "after_url": str(cur.loc[q, "url"]),
        }
        for q, t, l in tq.QUERYSET
        if q in cur.index
    ]
    got = bm25_search(
        ray_.data.from_items(qrows), index_dir,
        cfg=BM25Config(**base, k=10), round_dp=None,
    ).to_pandas()
    exp = deep[(deep["rank"] > 10) & (deep["query_id"].isin(cur.index))]
    assert len(got) == len(exp)
    for qid in cur.index:
        g = got[got["query_id"] == qid].sort_values("rank")
        x = exp[exp["query_id"] == qid].sort_values("rank")
        assert list(g["url"]) == list(x["url"]), qid
        np.testing.assert_allclose(g["score"].to_numpy(),
                                   x["score"].to_numpy())


def test_task_pool_rank_identity(ray_session, tmp_path):
    """pool='task' (warm-worker task pool over shared payloads) must be
    rank-identical to the actor pool — same (query_id, rank, url,
    score_x) rows — and must refuse to run without shared_refs."""
    import ray as ray_

    from document_retrieval_ray.config import (
        BM25Config, IndexConfig, TokenizerConfig,
    )
    from document_retrieval_ray.pipelines.build_index import build_index
    from document_retrieval_ray.pipelines.query import bm25_search
    from document_retrieval_ray.sources.synth import write_corpus
    from document_retrieval_ray.state.index_shard import build_shared_payload

    corpus = tmp_path / "corpus"
    index_dir = str(tmp_path / "index")
    write_corpus(str(corpus), num_docs=400, seed=11)
    manifests = build_index(
        str(corpus / "documents.parquet"), index_dir,
        cfg=IndexConfig(tokenizer=TokenizerConfig(mode="simple")),
        with_cosine_norms=False,
    )
    cfg = BM25Config(k1=1.2, b=0.75, compat="standard")
    refs = {l: ray_.put(build_shared_payload(index_dir, l, contrib_cfg=cfg))
            for l in manifests}
    qrows = [
        {"query_id": f"q{i}", "query": f"entok{i % 7} entok{(i * 3) % 11}",
         "lang": "en"}
        for i in range(40)
    ] + [{"query_id": "qfr", "query": "frtok1 frtok2", "lang": "fr"}]
    qds = ray_.data.from_items(qrows).repartition(8)

    def run(pool, method):
        df = bm25_search(
            qds, index_dir, cfg=cfg, method=method,
            tokenizer=TokenizerConfig(mode="simple"),
            shared_refs=refs, pool=pool, batch_size=8,
        ).to_pandas()
        return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

    for method in ("taat", "maxscore"):
        a = run("actor", method)
        t = run("task", method)
        assert len(a) and a[["query_id", "rank", "url", "score_x"]].equals(
            t[["query_id", "rank", "url", "score_x"]]
        ), method

    with pytest.raises(ValueError, match="shared_refs"):
        bm25_search(qds, index_dir, cfg=cfg, pool="task")
    with pytest.raises(ValueError, match="pool"):
        bm25_search(qds, index_dir, cfg=cfg, pool="bogus")


def test_cursor_half_specified_raises(ray_session):
    """A cursor row with after_score_x set but after_url null fails
    loudly with a descriptive error, not a numpy TypeError."""
    import ray as ray_

    from document_retrieval_ray.config import BM25Config
    from document_retrieval_ray.pipelines.query import bm25_search

    sf, tq, index_dir = _cursor_fixtures()
    q, t, l = tq.QUERYSET[0]
    qrows = [{"query_id": q, "query": t, "lang": l,
              "after_score_x": 123.0, "after_url": None}]
    with pytest.raises(Exception, match="after_url"):
        bm25_search(
            ray_.data.from_items(qrows), index_dir,
            cfg=BM25Config(k1=1.5, b=0.75, idf="lucene",
                           compat="reference", k=10),
        ).to_pandas()


def test_dedup_canonical_picks_longest(ray_session, tmp_path):
    """A near-dup cluster's canonical is the LONGEST member (n_chars
    desc, doc_id asc) — not the min id — and docs outside any cluster
    keep themselves."""
    base = "alpha beta gamma delta epsilon zeta eta theta " * 30
    rows = [
        # cluster: docs 0,1,2 near-identical; doc 2 is the longest
        (0, base, "en", "srcA", len(base)),
        (1, base + "tail", "en", "srcA", len(base) + 4),
        (2, base + "tail two", "en", "srcA", len(base) + 8),
        # singleton
        (3, "completely different text about other things entirely "
            "with no overlap at all in any shingle window here", "en",
         "srcB", 104),
    ]
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    got = _run("dedup_canonical", str(tmp_path), ["documents"])
    m = {int(r.doc_id): (int(r.canonical_id), int(r.kept))
         for r in got.itertuples()}
    assert m[3] == (3, 1)                       # singleton keeps itself
    cluster_ids = {d for d in (0, 1, 2) if d in m}
    assert len(cluster_ids) == 3
    canon = {m[d][0] for d in cluster_ids}
    assert canon == {2}, m                      # longest member wins
    assert m[2] == (2, 1) and m[0][1] == 0 and m[1][1] == 0
