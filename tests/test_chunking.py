"""Edge cases for the RAG chunking operators (chunk_text, chunk_dedup) on
a crafted corpus the driver testdata cannot produce: empty and
punctuation-only docs, token counts below / at / just above the window,
and a periodic document whose overlapping windows coincide (an in-doc
repeated chunk, so n_occ > n_docs). Runs the REAL query functions against
the REAL oracle SQL on the crafted parquet."""

import os

import duckdb
import pandas as pd
import pyarrow as pa

from document_retrieval_ray.pipelines.testdata_queries import (
    CHUNK_STRIDE,
    CHUNK_WINDOW,
    ORACLE_SQL,
    QUERIES,
    _chunk_batch,
)


def _run(name, sf_dir):
    got = QUERIES[name](sf_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents')}.parquet')"
    )
    exp = con.execute(ORACLE_SQL[name]).fetchdf()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    return got


def _write_docs(tmp_path, texts):
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_chunk_text_edges(ray_session, tmp_path):
    W, S = CHUNK_WINDOW, CHUNK_STRIDE
    texts = [
        "",                                # no chunks
        "... !!! ,,,",                     # punct-only → no chunks
        "one",                             # 1 token, below stride
        " ".join(f"w{i}" for i in range(S)),        # exactly one stride
        " ".join(f"w{i}" for i in range(W)),        # exactly one window
        " ".join(f"w{i}" for i in range(W + 1)),    # window + 1 → 2 chunks
        "Mixed, CASE text: with 42 digits & punct-uation everywhere!!",
    ]
    sf = _write_docs(tmp_path, texts)
    got = _run("chunk_text", sf)
    # empty/punct-only docs emit nothing
    assert set(got["doc_id"]) == {2, 3, 4, 5, 6}
    one = got[got["doc_id"] == 4]
    assert len(one) == 2 and list(one["n_tokens"]) == [W, W - S]
    two = got[got["doc_id"] == 5]
    assert len(two) == 2 and list(two["n_tokens"]) == [W, W + 1 - S]
    assert (got[got["doc_id"] == 2]["chunk"] == "one").all()


def test_chunk_dedup_in_doc_repeat(ray_session, tmp_path):
    W, S = CHUNK_WINDOW, CHUNK_STRIDE
    # periodic doc: every window is the same token sequence → one hash,
    # several occurrences in ONE doc (n_occ > n_docs); plus a cross-doc
    # duplicate pair
    texts = [
        " ".join(["rep"] * (3 * S + 2)),   # windows at 0,S,2S,3S coincide
        "alpha beta gamma delta " * 2,
        "alpha beta gamma delta " * 2,
    ]
    sf = _write_docs(tmp_path, texts)
    got = _run("chunk_dedup", sf)
    assert (got["n_occ"] > 1).all()
    in_doc = got[got["n_docs"] == 1]
    assert len(in_doc) >= 1 and (in_doc["n_occ"] > in_doc["n_docs"]).all()
    cross = got[got["n_docs"] == 2]
    assert len(cross) >= 1


def test_chunk_batch_sliced_input(ray_session):
    # the offsets math must honor Arrow slicing (non-zero offsets[0])
    t = pa.table(
        {
            "doc_id": pa.array([7, 8, 9], pa.int64()),
            "text": ["a b c d e f g h i j", "", "x y z"],
            "lang": ["en"] * 3,
        }
    )
    full = _chunk_batch(t).to_pandas()
    sliced = _chunk_batch(t.slice(1, 2)).to_pandas()
    exp = full[full["doc_id"] >= 8].reset_index(drop=True)
    pd.testing.assert_frame_equal(sliced, exp)
