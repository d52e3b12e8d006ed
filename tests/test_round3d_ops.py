"""Edge cases for the round-3d operators (seq_pack, rel_skew_join,
user_running_total, upsert_apply) on crafted corpora the driver testdata
cannot produce: a document longer than the pack budget, empty /
punctuation-only texts, fact keys with no dim match, and timestamp ties.
Each case runs the REAL query function against the REAL oracle SQL on
the crafted parquet."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from document_retrieval_ray.pipelines.testdata_queries import (
    ORACLE_SQL,
    PACK_BUDGET,
    PACK_RANGE,
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


def test_seq_pack_edges(ray_session, tmp_path):
    # one doc longer than the whole budget, empty + punct-only docs,
    # doc_ids far apart so several PACK_RANGE leaves exist per lang
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, PACK_RANGE + 3, 3 * PACK_RANGE + 1, 7, 900],
            "lang": ["en", "en", "en", "en", "en", "de", "de"],
            "text": [
                "alpha beta gamma",
                "w " * (PACK_BUDGET + 50),  # spans >1 pack by itself
                "",  # 0 tokens
                "... !!! ???",  # punct-only → 0 tokens
                "tail doc after a gap of empty ranges",
                "ein zwei drei vier",
                "fünf sechs",
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = _run("seq_pack", str(tmp_path), ["documents"])
    by_id = got.set_index("doc_id")
    # doc 0 starts pack 0; doc 1 starts after 3 tokens → still pack 0
    assert by_id.loc[0, "pack_id"] == 0 and by_id.loc[1, "pack_id"] == 0
    # doc 2 starts after 3 + (PACK_BUDGET+50) tokens → pack 1
    assert by_id.loc[2, "pack_id"] == (3 + PACK_BUDGET + 50) // PACK_BUDGET
    # langs pack independently: first de doc is pack 0
    assert by_id.loc[7, "pack_id"] == 0
    assert by_id.loc[2, "n_tokens"] == 0
    assert by_id.loc[PACK_RANGE + 3, "n_tokens"] == 0


def test_rel_skew_join_unmatched_keys(ray_session, tmp_path):
    # fact keys 7/8 have no dim row → inner-join drop; key 1 is hot
    ev = pd.DataFrame(
        {
            "event_id": np.arange(10, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 1, 1, 2, 2, 7, 8, 1], np.int64),
            "value": np.linspace(0.01, 9.99, 10),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3], np.int64),
            "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY"],
        }
    )
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    cust.to_parquet(tmp_path / "customer.parquet", index=False)
    got = _run("rel_skew_join", str(tmp_path), ["events", "customer"])
    # unmatched keys dropped; dim-only segment MACHINERY absent
    assert set(got["c_mktsegment"]) == {"BUILDING", "AUTOMOBILE"}
    assert int(got.loc[got["c_mktsegment"] == "BUILDING", "n_events"].iloc[0]) == 6


def test_user_running_total_ts_ties(ray_session, tmp_path):
    ts = pd.Timestamp("2025-01-01 00:00:00")
    ev = pd.DataFrame(
        {
            "event_id": np.array([3, 1, 2, 4], np.int64),
            "user_id": np.array([5, 5, 5, 6], np.int64),
            # events 1/2/3 share a timestamp: order must fall back to
            # event_id (ROWS frame, not RANGE peer-sum)
            "ts": [ts, ts, ts, ts],
            "value": [1.00, 2.00, 4.00, 8.00],
        }
    )
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    got = _run("user_running_total", str(tmp_path), ["events"])
    by_id = got.set_index("event_id")["run_c"]
    assert by_id.loc[1] == 200 and by_id.loc[2] == 600 and by_id.loc[3] == 700
    assert by_id.loc[4] == 800


def test_upsert_apply_delete_beats_update(ray_session, tmp_path):
    # doc_id 31 ≡ 3 (mod 7) AND ≡ 5 (mod 13): both an update and a
    # delete row exist — delete must win
    ids = np.array([31, 3, 5, 10, 100], np.int64)
    docs = pd.DataFrame(
        {
            "doc_id": ids,
            "lang": ["en"] * 5,
            "text": ["x"] * 5,
            "n_chars": np.array([10, 20, 30, 40, 50], np.int64),
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = _run("upsert_apply", str(tmp_path), ["documents"])
    assert 31 not in set(got["doc_id"])  # delete precedence
    assert 5 not in set(got["doc_id"])  # plain delete
    by_id = got.set_index("doc_id")["n_chars"]
    assert by_id.loc[3] == 20 + 1000  # update applied
    assert by_id.loc[10] == 40 + 1000  # 10 ≡ 3 (mod 7): also an update
    assert by_id.loc[100] == 50  # untouched base (100%7=2, 100%13=9)


def test_approx_percentile_within_one_bin(ray_session, tmp_path):
    from document_retrieval_ray.pipelines.testdata_queries import (
        APPROX_PCT_BIN,
    )

    rng = np.random.default_rng(3)
    v = rng.uniform(0.01, 400.0, 2000)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(2000, dtype=np.int64),
            "user_id": np.zeros(2000, np.int64),
            "ts": pd.Timestamp("2025-01-01"),
            "event_type": ["t"] * 2000,
            "value": v,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    got = _run("approx_percentiles", str(tmp_path), ["events"])
    # estimator error bound: lower edge ≤ exact percentile < edge + bin
    cents = np.floor(v * 100 + 0.5).astype(np.int64)
    for p in (50, 95, 99):
        exact = np.sort(cents)[int(np.ceil(p * len(cents) / 100)) - 1]
        est = int(got[f"p{p}_est"].iloc[0])
        assert est <= exact < est + APPROX_PCT_BIN
