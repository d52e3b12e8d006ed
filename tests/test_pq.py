"""Product-quantization (PQ) unit tests: codebook fit shape/determinism,
encode code ranges, ADC table-lookup distance vs a brute-force numpy
reconstruction, and tie-exactness of the partial top-k under heavy
distance ties (quantized distances collide by construction).

The full engine-vs-DuckDB value check for pq_codes / ann_topk_pq lives in
tests/test_oracle_parity.py (parametrized over ORACLE_SQL)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from document_retrieval_ray.stages.ann import (
    IVF_DIST_SCALE,
    PQTopK,
    final_topk_pq,
    fit_pq_codebooks,
    ivf_assign_cells,
    pq_encode_batch,
)

NSUB, KSUB, NITER, DIM = 4, 4, 2, 16


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    n = 120
    mat = rng.normal(size=(n, DIM)).astype(np.float64)
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        )
    ), mat


def test_fit_shape_and_determinism(emb_ds):
    ds, _ = emb_ds
    cb1 = fit_pq_codebooks(ds, NSUB, KSUB, NITER)
    cb2 = fit_pq_codebooks(ds, NSUB, KSUB, NITER)
    assert cb1.shape == (NSUB, KSUB, DIM // NSUB)
    np.testing.assert_array_equal(cb1, cb2)


def test_encode_codes_in_range_and_match_assign(emb_ds):
    ds, mat = emb_ds
    cb = fit_pq_codebooks(ds, NSUB, KSUB, NITER)
    batch = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
        }
    )
    enc = pq_encode_batch(batch, cb)
    subdim = DIM // NSUB
    for j in range(NSUB):
        codes = enc[f"code_s{j}"].to_numpy()
        assert codes.min() >= 0 and codes.max() < KSUB
        expect = ivf_assign_cells(mat[:, j * subdim:(j + 1) * subdim], cb[j])
        np.testing.assert_array_equal(codes, expect)


def test_adc_distance_matches_bruteforce(ray_session, emb_ds):
    import ray

    ds, mat = emb_ds
    cb = fit_pq_codebooks(ds, NSUB, KSUB, NITER)
    batch = pq_encode_batch(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        ),
        cb,
    ).drop_columns(["embedding"])
    qids = [0, 5]
    qmat = mat[qids]
    ref = ray.put((qids, qmat))
    stage = PQTopK(ref, cb, k=len(mat), margin=0)  # keep everything
    out = stage(batch).to_pandas()
    subdim = DIM // NSUB
    codes = np.stack(
        [batch[f"code_s{j}"].to_numpy() for j in range(NSUB)], axis=1
    )
    for qi, qid in enumerate(qids):
        # brute force: per-sub rounded d2 to the ASSIGNED centroid, summed
        want = np.zeros(len(mat), dtype=np.int64)
        for j in range(NSUB):
            d = ((qmat[qi, j * subdim:(j + 1) * subdim][None, :]
                  - cb[j][codes[:, j]]) ** 2).sum(axis=1)
            want += np.floor(d * IVF_DIST_SCALE + 0.5).astype(np.int64)
        got = (
            out[out.query_vec == qid]
            .set_index("vec_id")["ad_x"]
            .to_dict()
        )
        for v in range(len(mat)):
            if v == qid:
                assert v not in got
            else:
                assert got[v] == want[v], (qid, v)


def test_partial_topk_tie_exactness(ray_session):
    """Many identical vectors → identical codes → identical ADC distance:
    the two-batch partial + merge must equal a single global sort by
    (ad_x, vec_id)."""
    import ray

    n = 60
    mat = np.tile(np.arange(DIM, dtype=np.float64), (n, 1))
    mat[:4] += np.arange(4)[:, None]  # distinct init vectors
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        )
    )
    cb = fit_pq_codebooks(ds, NSUB, KSUB, NITER)
    full = pq_encode_batch(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        ),
        cb,
    ).drop_columns(["embedding"])
    qids = [0]
    ref = ray.put((qids, mat[:1]))
    k = 10
    stage = PQTopK(ref, cb, k=k, margin=0)
    # split into two batches; partials then merged must equal global order
    parts = [stage(full.slice(0, 30)), stage(full.slice(30))]
    merged = final_topk_pq(
        pa.concat_tables(parts).to_pandas(), k=k
    ).reset_index(drop=True)
    glob = stage(full)  # single-batch partial IS the global top-k
    want = final_topk_pq(glob.to_pandas(), k=k).reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, want)
