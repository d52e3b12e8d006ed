"""Edge cases for the round-3f operators (ann_range, oov_rate) on crafted
tables: a cosine exactly at the fx4 threshold, zero vectors, self-
exclusion, an all-in-vocab doc, an exactly-half-OOV doc, and a vocab-
boundary total_tf tie broken by term order. Each case runs the REAL
query function against the REAL oracle SQL on the crafted parquet."""

import os

import duckdb
import numpy as np
import pandas as pd

from document_retrieval_ray.pipelines.testdata_queries import (
    ANN_RANGE_TAU_X,
    EMB_DIM,
    OOV_VOCAB_K,
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


def test_ann_range_threshold_edges(ray_session, tmp_path):
    tau = ANN_RANGE_TAU_X / 10000.0
    e = np.zeros((9, EMB_DIM), dtype=np.float32)
    e[0, 0] = 1.0                     # query 0 (ANN_QUERY_IDS fixed 0..4)
    e[1, 1] = 1.0                     # queries 1..4: unit axes
    e[2, 2] = 1.0
    e[3, 3] = 1.0
    e[4, 4] = 1.0
    e[5, 0] = 2.0                     # parallel to q0 → cos 1, in range
    e[6, 5] = 1.0                     # orthogonal to all queries → out
    e[7, 0] = tau                     # cos(q0, e7) = tau exactly → IN (≥)
    e[7, 5] = np.sqrt(1.0 - tau * tau)
    # e[8] stays all-zero → excluded by the nrm > 0 guard
    pd.DataFrame(
        {
            "vec_id": np.arange(9, dtype=np.int64),
            "embedding": [row for row in e],
            "label": np.zeros(9, dtype=np.int32),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    got = _run("ann_range", str(tmp_path), ["embeddings"])
    q0 = got[got["query_vec"] == 0]
    assert set(q0["vec_id"]) == {5, 7}      # boundary hit included, ≥
    assert int(q0[q0["vec_id"] == 7]["cos_x"].iloc[0]) == ANN_RANGE_TAU_X
    assert 8 not in set(got["vec_id"])      # zero vector never emitted
    assert not ((got["query_vec"] == got["vec_id"]).any())  # no self


def test_oov_rate_edges(ray_session, tmp_path):
    # vocab = top-OOV_VOCAB_K by total tf. 5 hot terms (tf 10 each) +
    # 40 singleton terms: ranks 6..45 all tie at tf=1, so the vocab
    # boundary is decided purely by term ASC — r00..r19 make the cut
    # (20 slots left), r20..r39 are OOV.
    hot = " ".join(f"hot{i}" for i in range(5))
    rare_in = " ".join(f"r{i:02d}" for i in range(20))
    rare_out = " ".join(f"r{i:02d}" for i in range(20, 40))
    texts = (
        [hot] * 9                      # all-vocab docs → oov_x = 0
        + [hot + " " + hot]            # dup hot terms, still oov 0
        + ["", "?!.,"]                 # empty / punct-only → excluded
        + [rare_in]                    # 20 in-vocab singletons → oov 0
        + [rare_out]                   # 20 OOV singletons → oov 10000
        # half hot0 (in vocab), half DISTINCT singletons that sort after
        # every r-term ('x' > 'r'), so they lose the tf=1 tie → half OOV
        + [" ".join(["hot0"] * 7 + [f"x{i}" for i in range(7)])]
    )
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    assert OOV_VOCAB_K == 25
    got = _run("oov_rate", str(tmp_path), ["documents"])
    by_id = got.set_index("doc_id")["oov_x"]
    assert 10 not in by_id.index and 11 not in by_id.index  # dl=0 dropped
    assert (by_id.loc[list(range(10))] == 0).all()
    assert by_id.loc[12] == 0          # r00..r19 won the tie-break
    assert by_id.loc[13] == 10000      # r20..r39 lost it
    assert by_id.loc[14] == 5000       # half OOV on the fx4 grid
