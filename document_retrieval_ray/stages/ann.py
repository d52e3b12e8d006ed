"""Similarity search over an embedding column (``list<float>``).

Training-data-pipeline extension (the reference's ANN path is
FAISS-over-TF-IDF, faiss_based_ANN_Implementation.py:114-149,269-288 —
FAISS is unavailable here and the semantics are covered by these
operators):

- ``BruteForceTopK``: the exact baseline — the query matrix is broadcast
  once via ``ray.put``; each batch does one float64 matmul and emits only
  its per-batch top-k rows, so the final ``groupby(query)`` merge moves
  O(batches*k) rows, not O(n).
- ``lsh_bucket``: random-hyperplane signatures (seeded, deterministic) —
  the scale path: queries search only their bucket (and optionally
  neighboring buckets by Hamming distance).
- ``embedding_neardup_pairs``: all-pairs cosine >= threshold with label /
  bucket blocking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack(col) -> np.ndarray:
    """Arrow list column → (n, dim) float64 matrix WITHOUT per-row Python
    objects: embeddings are fixed-dim, so the flat child values reshape
    directly (zero-copy from the object store until the dtype cast).
    Falls back to the pylist path only for ragged/null input."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.FixedSizeListArray) and col.null_count == 0:
        dim = col.type.list_size
        vals = col.flatten().to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(vals, dtype=np.float64).reshape(len(col), dim)
    if isinstance(col, (pa.ListArray, pa.LargeListArray)) and col.null_count == 0:
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        if len(lens) and (lens == lens[0]).all() and lens[0] > 0:
            dim = int(lens[0])
            # flatten() honors slicing offsets (unlike .values)
            vals = col.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(vals, dtype=np.float64).reshape(
                len(col), dim
            )
    return np.asarray(col.to_pylist(), dtype=np.float64)


# fixed-point scale for the LSH sign decision: numpy (pairwise/BLAS) and
# the SQL oracle (sequential SUM) can disagree by ~1e-16 on a projection
# near zero; both sides round the dot to 1e-12 grid BEFORE taking the
# sign, so summation order can no longer flip a bucket bit
LSH_SIGN_SCALE = 1e12


def normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


class BruteForceTopK:
    """map_batches: emit per-batch top-(k+margin) (query_id, vec_id, cos)
    rows. cos = dot / (|a|*|b|) — the same operation shape as the SQL
    oracle, so fixed-point keys agree to the last ulp-rounding. The margin
    keeps boundary ties alive for the final deterministic merge."""

    def __init__(self, queries_ref, k: int = 10, margin: int = 32,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = qids                            # list of query vec ids
        self.qmat = np.asarray(qmat, dtype=np.float64)
        self.qnorm = np.linalg.norm(self.qmat, axis=1)
        self.keep = k + margin
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mat = _stack(batch[self.vec_col])
        norms = np.linalg.norm(mat, axis=1)
        dots = mat @ self.qmat.T                    # (n, Q)
        cos = dots / np.outer(np.where(norms == 0, 1, norms),
                              np.where(self.qnorm == 0, 1, self.qnorm))
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            col = cos[:, qi]
            cand = np.nonzero((ids != qid) & (norms > 0))[0]
            if cand.size == 0:
                continue
            k = min(self.keep, cand.size)
            top = cand[np.argpartition(-col[cand], k - 1)[:k]]
            out_q.extend([qid] * k)
            out_v.extend(ids[top].tolist())
            out_c.extend(col[top].tolist())
        return pa.table(
            {
                "query_vec": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


class BucketTopK:
    """LSH-restricted ANN top-k (the scale path of BruteForceTopK): each
    query only scores candidates in ITS OWN hyperplane bucket, so the
    per-batch matmul shrinks by the bucket fan-out. Same partial-top-k →
    groupby(query) merge shape; same SQL-matching cos op order."""

    def __init__(self, queries_ref, k: int = 10, margin: int = 32,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 bucket_col: str = "bucket"):
        import ray

        qids, qmat, qbuckets = ray.get(queries_ref)
        self.qids = qids
        self.qmat = np.asarray(qmat, dtype=np.float64)
        self.qbuckets = np.asarray(qbuckets, dtype=np.int64)
        self.qnorm = np.linalg.norm(self.qmat, axis=1)
        self.keep = k + margin
        self.id_col = id_col
        self.vec_col = vec_col
        self.bucket_col = bucket_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        buckets = batch[self.bucket_col].to_numpy(zero_copy_only=False)
        mat = _stack(batch[self.vec_col])
        norms = np.linalg.norm(mat, axis=1)
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            cand = np.nonzero(
                (buckets == self.qbuckets[qi]) & (ids != qid) & (norms > 0)
            )[0]
            if cand.size == 0 or self.qnorm[qi] == 0:
                continue
            dots = mat[cand] @ self.qmat[qi]
            cos = dots / (norms[cand] * self.qnorm[qi])
            k = min(self.keep, cand.size)
            top = np.argpartition(-cos, k - 1)[:k]
            out_q.extend([qid] * k)
            out_v.extend(ids[cand[top]].tolist())
            out_c.extend(cos[top].tolist())
        return pa.table(
            {
                "query_vec": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def final_topk(group: pd.DataFrame, k: int = 10, round_dp: int = 4) -> pd.DataFrame:
    """(query_vec) group of per-batch partials → global top-k with the
    engine tie-break (cos_x desc, vec_id asc)."""
    key = np.floor(group["cos"].to_numpy() * (10.0 ** round_dp) + 0.5).astype(np.int64)
    g = group.assign(cos_x=key).sort_values(
        ["cos_x", "vec_id"], ascending=[False, True]
    ).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[["query_vec", "rank", "vec_id", "cos_x"]]


class RangeSearch:
    """Radius (range) similarity search — the threshold sibling of
    BruteForceTopK: per batch, emit EVERY (query_vec, vec_id) with
    fixed-point cosine ≥ tau_x. No merge stage is needed: each corpus
    vector lives in exactly one batch, so the per-batch emissions union
    to the exact answer (the result is a set, not a ranking). Same
    broadcast query matrix (ray.put once, read per actor) and same
    cos = dot/(|a||b|) op order as the SQL oracle."""

    def __init__(self, queries_ref, tau_x: int, round_dp: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = qids
        self.qmat = np.asarray(qmat, dtype=np.float64)
        self.qnorm = np.linalg.norm(self.qmat, axis=1)
        self.tau_x = int(tau_x)
        self.scale = 10.0 ** round_dp
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mat = _stack(batch[self.vec_col])
        norms = np.linalg.norm(mat, axis=1)
        dots = mat @ self.qmat.T                    # (n, Q)
        cos = dots / np.outer(np.where(norms == 0, 1, norms),
                              np.where(self.qnorm == 0, 1, self.qnorm))
        cos_x = np.floor(cos * self.scale + 0.5).astype(np.int64)
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            hit = np.nonzero(
                (cos_x[:, qi] >= self.tau_x) & (ids != qid) & (norms > 0)
            )[0]
            if hit.size == 0:
                continue
            out_q.extend([qid] * hit.size)
            out_v.extend(ids[hit].tolist())
            out_c.extend(cos_x[hit, qi].tolist())
        return pa.table(
            {
                "query_vec": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_x": pa.array(out_c, pa.int64()),
            }
        )


def svd_partial_moments(batch: pa.Table, vec_col: str = "embedding") -> pa.Table:
    """Per-batch partial second moments for the distributed SVD fit:
    (n, flat XᵀX). One row per batch → the driver reduction handles a
    dim×dim matrix regardless of corpus size (the tall-skinny pattern).
    TruncatedSVD semantics (no centering), so no Σx is needed."""
    mat = _stack(batch[vec_col])
    return pa.table(
        {
            "n": pa.array([len(mat)], pa.int64()),
            "xtx": pa.array([(mat.T @ mat).ravel().tolist()], pa.list_(pa.float64())),
        }
    )


def fit_svd_projection(emb_ds, dim_out: int, vec_col: str = "embedding") -> np.ndarray:
    """T4 analog (faiss_based_ANN_Implementation.py:272-283 reduces TF-IDF
    to 256 dims with TruncatedSVD before FAISS): distributed fit of a
    (dim, dim_out) projection from the top eigenvectors of XᵀX
    (TruncatedSVD semantics — no centering). The corpus-sized work is one
    ``map_batches`` of partial moments; the driver only eigendecomposes a
    dim×dim matrix. Eigenvector signs are fixed deterministically."""
    parts = emb_ds.map_batches(
        svd_partial_moments, fn_kwargs={"vec_col": vec_col},
        batch_format="pyarrow",
    ).take_all()
    if not parts:
        raise ValueError("empty embedding dataset")
    dim = int(np.sqrt(len(parts[0]["xtx"])))
    xtx = np.zeros((dim, dim), dtype=np.float64)
    for r in parts:
        xtx += np.asarray(r["xtx"], dtype=np.float64).reshape(dim, dim)
    vals, vecs = np.linalg.eigh(xtx)          # ascending
    order = np.argsort(vals)[::-1][:dim_out]  # top eigenvalues
    p = vecs[:, order]
    # deterministic sign: largest-|component| entry of each vector positive
    for j in range(p.shape[1]):
        i = int(np.argmax(np.abs(p[:, j])))
        if p[i, j] < 0:
            p[:, j] = -p[:, j]
    return p


def project_embeddings(batch: pa.Table, projection: np.ndarray,
                       vec_col: str = "embedding") -> pa.Table:
    """Apply the broadcast (dim, dim_out) projection: one matmul per
    batch; replaces the embedding column with its reduced form."""
    mat = _stack(batch[vec_col])
    red = mat @ projection
    out = batch.drop_columns([vec_col])
    return out.append_column(vec_col, pa.array(red.tolist(), pa.list_(pa.float64())))


def lsh_bucket(batch: pa.Table, num_planes: int = 8, seed: int = 13,
               vec_col: str = "embedding", planes: np.ndarray = None) -> pa.Table:
    """Random-hyperplane LSH bucket id per row (deterministic, seeded).
    Pass ``planes`` (dim × num_planes) explicitly when an external oracle
    must see the exact same hyperplanes (e.g. embedded as SQL literals)."""
    mat = _stack(batch[vec_col])
    if planes is None:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((mat.shape[1], num_planes))
    else:
        num_planes = planes.shape[1]
    dots = mat @ planes
    bits = np.floor(dots * LSH_SIGN_SCALE + 0.5) > 0
    bucket = (bits * (1 << np.arange(num_planes))).sum(axis=1)
    return batch.append_column("bucket", pa.array(bucket.astype(np.int64), pa.int64()))


# fixed-point grids for the IVF (k-means) path: numpy partial sums and the
# SQL oracle's sequential SUM can differ by ~1e-16 per reduction, so every
# cross-implementation comparison (assignment distances, centroid
# coordinate sums) is rounded to a grid first — the same trick as
# LSH_SIGN_SCALE. Distances are O(100) → 1e9 grid stays inside 2^53;
# coordinate sums are O(1000) → 1e6 grid.
IVF_DIST_SCALE = 1e9
IVF_SUM_SCALE = 1e6


def ivf_assign_cells(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid cell per row by squared L2, fixed-point-rounded so
    summation order can't flip an argmin; ties break to the smallest cell
    (mirrors the oracle's ``ORDER BY dx ASC, cell ASC`` row_number)."""
    d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    dx = np.floor(d * IVF_DIST_SCALE + 0.5)
    return np.argmin(dx, axis=1).astype(np.int64)


def ivf_partial_sums(batch: pa.Table, centroids: np.ndarray,
                     vec_col: str = "embedding") -> pa.Table:
    """One Lloyd-iteration partial per batch: (cell, member count, per-dim
    float sums). The driver reduction handles nlist × dim numbers per
    batch regardless of corpus size (same tall-skinny shape as the SVD
    moments)."""
    mat = _stack(batch[vec_col])
    cells = ivf_assign_cells(mat, centroids)
    out_cell, out_cnt, out_sum = [], [], []
    for cell in np.unique(cells):
        sel = cells == cell
        out_cell.append(int(cell))
        out_cnt.append(int(sel.sum()))
        out_sum.append(mat[sel].sum(axis=0).tolist())
    return pa.table(
        {
            "cell": pa.array(out_cell, pa.int64()),
            "cnt": pa.array(out_cnt, pa.int64()),
            "fsum": pa.array(out_sum, pa.list_(pa.float64())),
        }
    )


def fit_ivf_centroids(emb_ds, nlist: int, niter: int,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> np.ndarray:
    """Distributed deterministic IVF coarse quantizer (Lloyd, ``niter``
    fixed iterations): init = the ``nlist`` lowest-``id_col`` vectors
    (exact parquet floats — reproducible by any other engine), then each
    iteration is ONE ``map_batches`` of per-cell partial sums reduced on
    the driver (nlist × dim numbers). Centroid updates are fixed-point:
    coordinate sums round to the IVF_SUM_SCALE grid before the mean, so an
    external oracle summing in a different order fits identical centroids.
    Empty cells keep their previous centroid."""
    init = sorted(
        (r[id_col], r[vec_col])
        for r in emb_ds.filter(expr=f"{id_col} < {nlist}").take_all()
    )
    if len(init) != nlist:
        raise ValueError(
            f"IVF init expects vectors with {id_col} 0..{nlist - 1}; "
            f"got {len(init)} rows"
        )
    cent = np.array([v for _, v in init], dtype=np.float64)
    for _ in range(niter):
        parts = emb_ds.map_batches(
            ivf_partial_sums,
            fn_kwargs={"centroids": cent, "vec_col": vec_col},
            batch_format="pyarrow",
        ).take_all()
        fsum = np.zeros_like(cent)
        cnt = np.zeros(nlist, dtype=np.int64)
        for r in parts:
            fsum[int(r["cell"])] += np.asarray(r["fsum"], dtype=np.float64)
            cnt[int(r["cell"])] += int(r["cnt"])
        sx = np.floor(fsum * IVF_SUM_SCALE + 0.5)
        denom = np.maximum(cnt, 1)[:, None] * IVF_SUM_SCALE
        cent = np.where(cnt[:, None] > 0, sx / denom, cent)
    return cent


def ivf_assign_batch(batch: pa.Table, centroids: np.ndarray,
                     vec_col: str = "embedding") -> pa.Table:
    """Append the IVF cell id (search-time assignment stage)."""
    cells = ivf_assign_cells(_stack(batch[vec_col]), centroids)
    return batch.append_column("cell", pa.array(cells, pa.int64()))


class IVFTopK:
    """IVF-probed ANN top-k (the k-means analog of BucketTopK): each query
    scores only candidates whose cell is among its ``nprobe`` nearest
    centroids. Same partial-top-k → groupby(query) merge shape; same
    SQL-matching cos op order."""

    def __init__(self, queries_ref, k: int = 10, margin: int = 32,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 cell_col: str = "cell"):
        import ray

        qids, qmat, qcells = ray.get(queries_ref)
        self.qids = qids
        self.qmat = np.asarray(qmat, dtype=np.float64)
        self.qcells = [
            np.asarray(sorted(map(int, cells)), dtype=np.int64)
            for cells in qcells
        ]
        self.qnorm = np.linalg.norm(self.qmat, axis=1)
        self.keep = k + margin
        self.id_col = id_col
        self.vec_col = vec_col
        self.cell_col = cell_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        cells = batch[self.cell_col].to_numpy(zero_copy_only=False)
        mat = _stack(batch[self.vec_col])
        norms = np.linalg.norm(mat, axis=1)
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            in_probe = np.isin(cells, self.qcells[qi])
            cand = np.nonzero(in_probe & (ids != qid) & (norms > 0))[0]
            if cand.size == 0 or self.qnorm[qi] == 0:
                continue
            dots = mat[cand] @ self.qmat[qi]
            cos = dots / (norms[cand] * self.qnorm[qi])
            k = min(self.keep, cand.size)
            top = np.argpartition(-cos, k - 1)[:k]
            out_q.extend([qid] * k)
            out_v.extend(ids[cand[top]].tolist())
            out_c.extend(cos[top].tolist())
        return pa.table(
            {
                "query_vec": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def pq_partial_sums(batch: pa.Table, codebooks: np.ndarray,
                    vec_col: str = "embedding") -> pa.Table:
    """One Lloyd-iteration partial for ALL product-quantization subspaces
    in a single pass over the batch: (sub, cell, member count, per-dim
    float sums over the SUBvector). The driver reduction handles
    nsub × ksub × subdim numbers per batch regardless of corpus size."""
    mat = _stack(batch[vec_col])
    nsub, ksub, subdim = codebooks.shape
    out_sub, out_cell, out_cnt, out_sum = [], [], [], []
    for j in range(nsub):
        sub = mat[:, j * subdim:(j + 1) * subdim]
        cells = ivf_assign_cells(sub, codebooks[j])
        for cell in np.unique(cells):
            sel = cells == cell
            out_sub.append(j)
            out_cell.append(int(cell))
            out_cnt.append(int(sel.sum()))
            out_sum.append(sub[sel].sum(axis=0).tolist())
    return pa.table(
        {
            "sub": pa.array(out_sub, pa.int64()),
            "cell": pa.array(out_cell, pa.int64()),
            "cnt": pa.array(out_cnt, pa.int64()),
            "fsum": pa.array(out_sum, pa.list_(pa.float64())),
        }
    )


def fit_pq_codebooks(emb_ds, nsub: int, ksub: int, niter: int,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> np.ndarray:
    """Distributed deterministic product-quantization fit (FAISS
    IndexPQ-style codebooks): the vector dim splits into ``nsub``
    contiguous subspaces and each subspace runs an independent Lloyd
    k-means with ``ksub`` centroids — all subspaces fitted TOGETHER, one
    ``map_batches`` pass per iteration (not nsub passes). Init and
    fixed-point grids are identical to :func:`fit_ivf_centroids` (init =
    subvectors of the ``ksub`` lowest-``id_col`` rows; coordinate sums
    rounded to IVF_SUM_SCALE before the mean; assignment distances on the
    IVF_DIST_SCALE grid), so an external oracle fits identical codebooks.
    Returns (nsub, ksub, subdim)."""
    init = sorted(
        (r[id_col], r[vec_col])
        for r in emb_ds.filter(expr=f"{id_col} < {ksub}").take_all()
    )
    if len(init) != ksub:
        raise ValueError(
            f"PQ init expects vectors with {id_col} 0..{ksub - 1}; "
            f"got {len(init)} rows"
        )
    full = np.array([v for _, v in init], dtype=np.float64)
    dim = full.shape[1]
    if dim % nsub:
        raise ValueError(f"dim {dim} not divisible by nsub {nsub}")
    subdim = dim // nsub
    cb = np.stack(
        [full[:, j * subdim:(j + 1) * subdim] for j in range(nsub)]
    )  # (nsub, ksub, subdim)
    for _ in range(niter):
        parts = emb_ds.map_batches(
            pq_partial_sums,
            fn_kwargs={"codebooks": cb, "vec_col": vec_col},
            batch_format="pyarrow",
        ).take_all()
        fsum = np.zeros_like(cb)
        cnt = np.zeros((nsub, ksub), dtype=np.int64)
        for r in parts:
            fsum[int(r["sub"]), int(r["cell"])] += np.asarray(
                r["fsum"], dtype=np.float64
            )
            cnt[int(r["sub"]), int(r["cell"])] += int(r["cnt"])
        sx = np.floor(fsum * IVF_SUM_SCALE + 0.5)
        denom = np.maximum(cnt, 1)[..., None] * IVF_SUM_SCALE
        cb = np.where(cnt[..., None] > 0, sx / denom, cb)
    return cb


def pq_encode_batch(batch: pa.Table, codebooks: np.ndarray,
                    vec_col: str = "embedding") -> pa.Table:
    """Encode each vector as ``nsub`` one-byte-sized codes (nearest
    codebook centroid per subspace, same fixed-point/tie semantics as
    :func:`ivf_assign_cells`), appended as int64 ``code_s{j}`` columns.
    At scale the codes column set replaces the raw embedding column —
    dim × 4 bytes shrink to nsub bytes per vector (e.g. 256 → 8)."""
    mat = _stack(batch[vec_col])
    nsub, ksub, subdim = codebooks.shape
    for j in range(nsub):
        cells = ivf_assign_cells(mat[:, j * subdim:(j + 1) * subdim],
                                 codebooks[j])
        batch = batch.append_column(f"code_s{j}", pa.array(cells, pa.int64()))
    return batch


class PQTopK:
    """ADC (asymmetric distance computation) top-k over PQ codes: each
    query precomputes one (nsub, ksub) table of fixed-point-rounded
    squared L2 distances from its exact subvectors to every codebook
    centroid; a candidate's approximate distance is then ``nsub`` integer
    table lookups summed — no float math and no raw vectors in the scan.
    Emits per-batch partial top-(k+margin) smallest; merge with
    ``final_topk_pq``. The scan reads ONLY the code columns (the raw
    embedding column is never shipped), which is the entire point of PQ
    at 10^12-vector scale."""

    def __init__(self, queries_ref, codebooks: np.ndarray, k: int = 10,
                 margin: int = 32, id_col: str = "vec_id"):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = list(qids)
        qmat = np.asarray(qmat, dtype=np.float64)
        nsub, ksub, subdim = codebooks.shape
        self.nsub = nsub
        # tables[qi, j, cell] = rounded d2(q_sub_j, codebook[j][cell])
        tabs = np.empty((len(self.qids), nsub, ksub), dtype=np.int64)
        for j in range(nsub):
            qsub = qmat[:, j * subdim:(j + 1) * subdim]
            d = ((qsub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
            tabs[:, j, :] = np.floor(d * IVF_DIST_SCALE + 0.5).astype(np.int64)
        self.tables = tabs
        self.keep = k + margin
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        codes = np.stack(
            [batch[f"code_s{j}"].to_numpy(zero_copy_only=False)
             for j in range(self.nsub)],
            axis=1,
        )  # (n, nsub)
        out_q, out_v, out_d = [], [], []
        subs = np.arange(self.nsub)
        for qi, qid in enumerate(self.qids):
            dist = self.tables[qi][subs[None, :], codes].sum(axis=1)
            cand = np.nonzero(ids != qid)[0]
            if cand.size == 0:
                continue
            k = min(self.keep, cand.size)
            # quantized distances tie HEAVILY (only ksub^nsub distinct
            # values exist), so the partial must keep the exact local
            # top-k under the final (ad, vec_id) order — a plain
            # argpartition on dist could drop a tied-but-smaller-id row
            # the global merge needs
            order = np.lexsort((ids[cand], dist[cand]))[:k]
            top = cand[order]
            out_q.extend([qid] * k)
            out_v.extend(ids[top].tolist())
            out_d.extend(dist[top].tolist())
        return pa.table(
            {
                "query_vec": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "ad_x": pa.array(out_d, pa.int64()),
            }
        )


class IVFPQTopK:
    """IVF+PQ ANN (FAISS IndexIVFPQ shape, PQ over raw vectors rather
    than residuals — documented simplification so the codebooks stay
    independently oracle-derivable): the coarse quantizer prunes the
    scan to each query's ``nprobe`` cells and the pruned candidates are
    ranked by PQ ADC distance — the scan ships ONLY the cell id and the
    code columns, which is the full 10^12-vector recipe (memory = nsub
    bytes/vector, compute = |probed cells| table lookups).

    ``queries_ref`` resolves to (qids, qmat, qcells) where qcells[i] is
    query i's probed cell list (computed on the driver from the same
    fixed-point centroid distances as the IVF oracle)."""

    def __init__(self, queries_ref, codebooks: np.ndarray, k: int = 10,
                 margin: int = 32, id_col: str = "vec_id"):
        import ray

        qids, qmat, qcells = ray.get(queries_ref)
        self.qids = list(qids)
        self.qcells = [np.asarray(c, dtype=np.int64) for c in qcells]
        qmat = np.asarray(qmat, dtype=np.float64)
        nsub, ksub, subdim = codebooks.shape
        self.nsub = nsub
        tabs = np.empty((len(self.qids), nsub, ksub), dtype=np.int64)
        for j in range(nsub):
            qsub = qmat[:, j * subdim:(j + 1) * subdim]
            d = ((qsub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
            tabs[:, j, :] = np.floor(d * IVF_DIST_SCALE + 0.5).astype(np.int64)
        self.tables = tabs
        self.keep = k + margin
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        codes = np.stack(
            [batch[f"code_s{j}"].to_numpy(zero_copy_only=False)
             for j in range(self.nsub)],
            axis=1,
        )
        out_q, out_v, out_d = [], [], []
        subs = np.arange(self.nsub)
        for qi, qid in enumerate(self.qids):
            cand = np.nonzero(np.isin(cells, self.qcells[qi])
                              & (ids != qid))[0]
            if cand.size == 0:
                continue
            dist = self.tables[qi][subs[None, :], codes[cand]].sum(axis=1)
            k = min(self.keep, cand.size)
            # exact local top-k under the final (ad, vec_id) order — the
            # quantized distances tie heavily (see PQTopK)
            order = np.lexsort((ids[cand], dist))[:k]
            top = cand[order]
            out_q.extend([qid] * k)
            out_v.extend(ids[top].tolist())
            out_d.extend(dist[order].tolist())
        return pa.table(
            {
                "query_vec": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "ad_x": pa.array(out_d, pa.int64()),
            }
        )


def final_topk_pq(group: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """(query_vec) group of PQTopK partials → global top-k by approximate
    distance (ad_x asc, vec_id asc — the SQL oracle's row_number order)."""
    g = group.sort_values(["ad_x", "vec_id"], ascending=[True, True]).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[["query_vec", "rank", "vec_id", "ad_x"]]


class NearDupPairs:
    """All-pairs cosine >= threshold within a blocking group (label or LSH
    bucket): map_groups over the block, one matmul per group."""

    def __init__(self, threshold: float, id_col: str = "vec_id",
                 vec_col: str = "embedding", round_dp: int = 4):
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col
        self.round_dp = round_dp

    def __call__(self, group: pa.Table) -> pa.Table:
        ids = group[self.id_col].to_numpy(zero_copy_only=False)
        mat = _stack(group[self.vec_col])
        norms = np.linalg.norm(mat, axis=1)
        # dot / (|a|*|b|) — the SAME op order as the SQL oracle so the
        # fixed-point keys agree; zero-norm rows are excluded (SQL nrm > 0)
        dots = mat @ mat.T
        denom = np.outer(np.where(norms == 0, 1, norms), np.where(norms == 0, 1, norms))
        cos = dots / denom
        iu = np.triu_indices(len(ids), k=1)
        mask = (
            (cos[iu] >= self.threshold)
            & (norms[iu[0]] > 0)
            & (norms[iu[1]] > 0)
        )
        ai, bi = iu[0][mask], iu[1][mask]
        a = np.minimum(ids[ai], ids[bi])
        b = np.maximum(ids[ai], ids[bi])
        cx = np.floor(cos[iu][mask] * (10.0 ** self.round_dp) + 0.5).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "cos_x": pa.array(cx, pa.int64()),
            }
        )


def emit_tile_rows(batch: pa.Table, num_blocks: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Exact distributed all-pairs: assign each vector to block
    ``vec_id % num_blocks`` and replicate it to every (bi, bj) tile it
    participates in (bi <= bj). Every unordered pair lands in EXACTLY one
    tile group, so a groupby(ti, tj) + per-tile matmul computes all pairs
    with an exchange of num_blocks × input — no driver materialization,
    no O(N²) task."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    blk = ids % num_blocks
    # vectorized replication: row i appears num_blocks times; its tile is
    # (min(blk_i, j), max(blk_i, j)) for j in 0..num_blocks-1
    rep = np.repeat(np.arange(n, dtype=np.int64), num_blocks)
    other = np.tile(np.arange(num_blocks, dtype=np.int64), n)
    mine = blk[rep]
    ti = np.minimum(mine, other)
    tj = np.maximum(mine, other)
    out = batch.select([id_col, vec_col]).take(pa.array(rep))
    out = out.append_column("ti", pa.array(ti, pa.int64()))
    out = out.append_column("tj", pa.array(tj, pa.int64()))
    return out.select(["ti", "tj", id_col, vec_col]).rename_columns(
        ["ti", "tj", "vec_id", "embedding"]
    )


def tile_pairs(group: pd.DataFrame, threshold: float, num_blocks: int = 8,
               round_dp: int = 4) -> pd.DataFrame:
    """(ti, tj) tile group → cosine pairs ≥ threshold between (or within)
    its two blocks. cos = dot / (|a|*|b|), zero norms excluded — mirrors
    the SQL oracle exactly."""
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "cos_x": pd.Series(dtype="int64")})
    ids = group["vec_id"].to_numpy().astype(np.int64)
    # replication means a vector appears once per tile; dedup within tile
    _, first = np.unique(ids, return_index=True)
    ids = ids[first]
    # one C-level stack of the already-materialized row arrays (pandas
    # group input); the hot matmul below is unaffected
    mat = np.stack(group["embedding"].to_numpy()[first]).astype(
        np.float64, copy=False
    )
    if len(ids) < 2:
        return empty
    ti = int(group.iloc[0]["ti"])
    tj = int(group.iloc[0]["tj"])
    blk = ids % num_blocks
    norms = np.linalg.norm(mat, axis=1)
    if ti == tj:
        iu = np.triu_indices(len(ids), k=1)
        ai, bi = iu
    else:
        li = np.nonzero(blk == ti)[0]
        ri = np.nonzero(blk == tj)[0]
        if li.size == 0 or ri.size == 0:
            return empty
        ai, bi = np.repeat(li, ri.size), np.tile(ri, li.size)
    dots = np.einsum("ij,ij->i", mat[ai], mat[bi])
    na, nb = norms[ai], norms[bi]
    cos = dots / (np.where(na == 0, 1, na) * np.where(nb == 0, 1, nb))
    keep = (cos >= threshold) & (na > 0) & (nb > 0)
    a = np.minimum(ids[ai[keep]], ids[bi[keep]])
    b = np.maximum(ids[ai[keep]], ids[bi[keep]])
    cx = np.floor(cos[keep] * (10.0 ** round_dp) + 0.5).astype(np.int64)
    return pd.DataFrame(
        {
            "a": pd.Series(a, dtype="int64"),
            "b": pd.Series(b, dtype="int64"),
            "cos_x": pd.Series(cx, dtype="int64"),
        }
    )


def tile_knn_partial(group: pd.DataFrame, k: int, num_blocks: int = 8,
                     round_dp: int = 4) -> pd.DataFrame:
    """(ti, tj) tile group → per-vector PARTIAL top-k neighbour rows
    (vec_id, nbr, cos_x) seen from THIS tile — the k-NN-graph leg of the
    block-tiling all-pairs plan (``emit_tile_rows``). Every (a, b) pair
    lives in exactly one tile, so the global per-vector merge sees at
    most num_blocks × k candidate rows per vector; nothing corpus-sized
    moves twice. Cosine matches the SQL oracle's op order on the fx4
    grid; zero-norm vectors are neither sources nor neighbours."""
    empty = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                          "nbr": pd.Series(dtype="int64"),
                          "cos_x": pd.Series(dtype="int64")})
    ids = group["vec_id"].to_numpy().astype(np.int64)
    _, first = np.unique(ids, return_index=True)
    ids = ids[first]  # sorted ascending → stable argsort ties = id asc
    if len(ids) < 2:
        return empty
    mat = np.stack(group["embedding"].to_numpy()[first]).astype(
        np.float64, copy=False
    )
    ti = int(group.iloc[0]["ti"])
    tj = int(group.iloc[0]["tj"])
    blk = ids % num_blocks
    norms = np.linalg.norm(mat, axis=1)
    SENT = np.int64(-(2 ** 62))
    scale = 10.0 ** round_dp

    def _emit(src_idx, cand_idx, dots):
        # dots: (len(src), len(cand)) raw dot products
        nsrc = norms[src_idx][:, None]
        ncnd = norms[cand_idx][None, :]
        cos = dots / (np.where(nsrc == 0, 1, nsrc) * np.where(ncnd == 0, 1, ncnd))
        cx = np.floor(cos * scale + 0.5).astype(np.int64)
        cx[:, norms[cand_idx] == 0] = SENT          # invalid neighbours
        same = ids[src_idx][:, None] == ids[cand_idx][None, :]
        cx[same] = SENT                              # self (diagonal tiles)
        kk = min(k, cx.shape[1])
        order = np.argsort(-cx, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(cx.shape[0]), kk)
        cols = order.ravel()
        keep = (cx[rows, cols] > SENT) & (norms[src_idx][rows] > 0)
        return (ids[src_idx][rows[keep]], ids[cand_idx][cols[keep]],
                cx[rows, cols][keep])

    parts = []
    if ti == tj:
        sel = np.nonzero(blk == ti)[0]
        if sel.size >= 2:
            d = mat[sel] @ mat[sel].T
            parts.append(_emit(sel, sel, d))
    else:
        li = np.nonzero(blk == ti)[0]
        ri = np.nonzero(blk == tj)[0]
        if li.size and ri.size:
            d = mat[li] @ mat[ri].T
            parts.append(_emit(li, ri, d))
            parts.append(_emit(ri, li, d.T))
    if not parts:
        return empty
    return pd.DataFrame({
        "vec_id": pd.Series(np.concatenate([p[0] for p in parts]), dtype="int64"),
        "nbr": pd.Series(np.concatenate([p[1] for p in parts]), dtype="int64"),
        "cos_x": pd.Series(np.concatenate([p[2] for p in parts]), dtype="int64"),
    })


def knn_merge_partition(group: pd.DataFrame, k: int) -> pd.DataFrame:
    """vec_id-hash partition of tile partials → final top-k neighbour
    rows with rank (cos_x desc, nbr asc). A pair appears in exactly one
    tile, so no dedup is needed."""
    g = group.drop(columns=[c for c in ("kpart",) if c in group.columns])
    g = g.sort_values(["vec_id", "cos_x", "nbr"],
                      ascending=[True, False, True], kind="mergesort")
    g = g.groupby("vec_id", sort=False).head(k).copy()
    g["rnk"] = (g.groupby("vec_id", sort=False).cumcount() + 1).astype("int64")
    return g[["vec_id", "nbr", "cos_x", "rnk"]]
