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
    arr = col.to_pylist()
    return np.asarray(arr, dtype=np.float64)


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


def lsh_bucket(batch: pa.Table, num_planes: int = 8, seed: int = 13,
               vec_col: str = "embedding") -> pa.Table:
    """Random-hyperplane LSH bucket id per row (deterministic, seeded)."""
    mat = _stack(batch[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((mat.shape[1], num_planes))
    bits = (mat @ planes) > 0
    bucket = (bits * (1 << np.arange(num_planes))).sum(axis=1)
    return batch.append_column("bucket", pa.array(bucket.astype(np.int64), pa.int64()))


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
        mat = normalize_rows(_stack(group[self.vec_col]))
        cos = mat @ mat.T
        iu = np.triu_indices(len(ids), k=1)
        mask = cos[iu] >= self.threshold
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
