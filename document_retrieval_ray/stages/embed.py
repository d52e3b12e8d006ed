"""Dense text-embedding stage (C7/T2 surface) — pluggable model behind an
actor-pool ``map_batches`` class.

Reference analog: the transformer embedding pass of
``corpus_processing_and_embedding.py:89-117`` and the dense rerank of
``team_run1.py:211-295`` (sentence-transformer, batch-32, model loaded
once then applied per batch). torch/transformers are NOT available in
this environment, so the model slot is pluggable:

- ``model="strict"``   raises NotImplementedError (honest production
                       placeholder — wire a real ``model_factory`` here).
- ``model="fake"``     deterministic md5-seeded pseudo-embeddings, so the
                       Ray-side plumbing (actor pool, batch-32 sizing,
                       float32 list column, downstream ANN compatibility)
                       is real and tested end-to-end.
- ``model_factory``    callable () → object with ``encode(list[str]) ->
                       (n, dim) ndarray``; called ONCE per actor in
                       ``__init__`` (never per batch), which is the whole
                       point of the actor-pool pattern.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DEFAULT_BATCH_SIZE = 32  # model-inference batches (reference uses 32)


def _fake_embedding(text: str, dim: int) -> np.ndarray:
    """Deterministic stand-in: md5-seeded standard normals, L2-normalized
    (unit vectors, like sentence-transformer output)."""
    seed = int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")
    v = np.random.default_rng(seed).standard_normal(dim)
    n = np.linalg.norm(v)
    return v / (n if n > 0 else 1.0)


class _FakeModel:
    def __init__(self, dim: int):
        self.dim = dim

    def encode(self, texts):
        return np.stack([_fake_embedding(t or "", self.dim) for t in texts])


class HashProjectionModel:
    """SQL-REPRODUCIBLE deterministic encoder for oracle-gated dense
    pipelines: dimension i of a text is
    ``int(md5(f"{i}:{text}")[:4 hex], 16) - 32768`` — small integers, so
    dots/norms are exact in float32/float64 and a DuckDB oracle can
    recompute every embedding from ``md5(i || ':' || text)``. Stands in
    for the transformer slot wherever end-to-end value parity (not just
    plumbing) must be provable without torch."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def encode(self, texts):
        out = np.empty((len(texts), self.dim), dtype=np.float64)
        for r, t in enumerate(texts):
            t = t or ""
            for i in range(self.dim):
                hx = hashlib.md5(f"{i}:{t}".encode("utf-8")).hexdigest()
                out[r, i] = int(hx[:4], 16) - 32768
        return out


class TinyMLPEncoder:
    """Mean-pool + 2-layer integer MLP encoder — the richer deterministic
    stand-in for the transformer slot (team_run1.py:224-261 semantics:
    per-token embeddings, mean pooling, dense layer math), built so a
    DuckDB oracle reproduces every output EXACTLY:

    - token embedding, dim i: ``int(md5(f"{i}:{token}")[:4], 16) - 32768``
      (the HashProjectionModel hash, applied per TOKEN not per text);
    - mean pooling over token OCCURRENCES → fixed point:
      ``floor(sum/n + 0.5)`` (int64; sum exact, float64 division exact);
    - layer 1: ``h = W1 @ pooled``; ReLU ``a = max(h, 0)``;
    - layer 2: ``out = floor((W2 @ a) / 64)`` — the 2^6 output scale
      bounds |out| ≤ 2^23 so every later cosine dot stays below 2^53
      and the float64 cosine is EXACT cross-engine (and the float32
      list column roundtrips losslessly: 24-bit mantissa).

    ``W1``/``W2`` are seeded integers in [-8, 8] — model constants,
    inlined into the SQL oracle as literal VALUES. Empty texts embed as
    the zero vector. Tokenization = ``tokenize_simple`` (the TOKLIST
    SQL macro)."""

    def __init__(self, dim: int = 16, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.dim = dim
        self.W1 = rng.integers(-8, 9, size=(dim, dim)).astype(np.int64)
        self.W2 = rng.integers(-8, 9, size=(dim, dim)).astype(np.int64)

    def _token_vec(self, cache: dict, tok: str) -> np.ndarray:
        v = cache.get(tok)
        if v is None:
            v = cache[tok] = np.array(
                [
                    int(hashlib.md5(
                        f"{i}:{tok}".encode("utf-8")
                    ).hexdigest()[:4], 16) - 32768
                    for i in range(self.dim)
                ],
                dtype=np.int64,
            )
        return v

    def encode(self, texts):
        from ..functions.tokenizer import tokenize_simple

        out = np.zeros((len(texts), self.dim), dtype=np.int64)
        cache: dict = {}
        for r, t in enumerate(texts):
            toks = tokenize_simple(t or "")
            if not toks:
                continue
            sums = np.zeros(self.dim, dtype=np.int64)
            for tok in toks:
                sums += self._token_vec(cache, tok)
            pooled = np.floor(sums / len(toks) + 0.5).astype(np.int64)
            h = self.W1 @ pooled
            a = np.maximum(h, 0)
            out[r] = np.floor_divide(self.W2 @ a, 64)
        return out


class EmbedStage:
    """(id, text) → (id, embedding: list<float32>).

    Pass to ``map_batches(EmbedStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=32)`` — model setup happens once per actor.
    """

    def __init__(self, model: str = "strict", dim: int = 64,
                 model_factory=None, id_col: str = "doc_id",
                 text_col: str = "text"):
        if model_factory is not None:
            self.model = model_factory()
        elif model == "fake":
            self.model = _FakeModel(dim)
        elif model == "strict":
            self.model = None
        else:
            raise ValueError(model)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.model is None:
            raise NotImplementedError(
                "dense embedding requires torch/transformers — not available "
                "in this environment; pass model='fake' for plumbing or a "
                "model_factory for a real encoder"
            )
        texts = batch[self.text_col].to_pylist()
        mat = np.asarray(self.model.encode(texts), dtype=np.float32)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
            }
        )


class DenseRerankStage:
    """C7 dense rerank: (query_id, query, url/candidates …) candidate rows
    carrying a ``cand_embedding`` column are re-scored by cosine against
    the query embedding (computed by the same pluggable model). One model
    per actor; one matmul per batch."""

    def __init__(self, model: str = "strict", dim: int = 64,
                 model_factory=None, query_col: str = "query",
                 emb_col: str = "cand_embedding", round_dp: int = 4):
        if model_factory is not None:
            self.model = model_factory()
        elif model == "fake":
            self.model = _FakeModel(dim)
        elif model == "strict":
            self.model = None
        else:
            raise ValueError(model)
        self.query_col = query_col
        self.emb_col = emb_col
        self.round_dp = round_dp

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.model is None:
            raise NotImplementedError(
                "dense rerank requires an embedding model — pass "
                "model='fake' or a model_factory"
            )
        queries = batch[self.query_col].to_pylist()
        qmat = np.asarray(self.model.encode(queries), dtype=np.float64)
        cmat = np.asarray(batch[self.emb_col].to_pylist(), dtype=np.float64)
        qn = np.linalg.norm(qmat, axis=1)
        cn = np.linalg.norm(cmat, axis=1)
        dots = np.einsum("ij,ij->i", qmat, cmat)
        cos = dots / (np.where(qn == 0, 1, qn) * np.where(cn == 0, 1, cn))
        cx = np.floor(cos * (10.0 ** self.round_dp) + 0.5).astype(np.int64)
        out = batch.drop_columns([self.emb_col])
        out = out.append_column("dense_score", pa.array(cos, pa.float64()))
        return out.append_column("dense_score_x", pa.array(cx, pa.int64()))
