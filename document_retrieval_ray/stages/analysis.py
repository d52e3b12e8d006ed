"""Text-analysis map_batches stages (token counting, quality scoring,
language-ID heuristic, fingerprinting) — SQL-mirrored definitions live in
functions/textstats.py and functions/hashing.py."""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import md5_hex
from ..functions.textstats import LANG_MARKERS, doc_stats_row, langid_stopword
from ..functions.tokenizer import tokenize_simple


def doc_stats_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    rows = [doc_stats_row(t or "") for t in batch[text_col].to_pylist()]
    out = {id_col: batch[id_col]}
    for key in ("n_tokens", "tok_chars", "mean_tok_len_x", "stop_ratio_x", "quality_x"):
        out[key] = pa.array([r[key] for r in rows], pa.int64())
    return pa.table(out)


def langid_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    rows = [langid_stopword(t or "") for t in batch[text_col].to_pylist()]
    out = {id_col: batch[id_col]}
    # fixed schema from LANG_MARKERS (not rows[0]): empty batches must emit
    # the same columns so Ray Data can union mixed empty/non-empty blocks
    keys = [f"hits_{lang}" for lang in sorted(LANG_MARKERS)]
    for key in keys:
        out[key] = pa.array([r[key] for r in rows], pa.int64())
    out["pred_lang"] = pa.array([r["pred_lang"] for r in rows], pa.string())
    return pa.table(out)


def fingerprint_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(doc_id, fp, n_tokens): fp = md5 of the space-joined simple-token
    stream (whitespace/punctuation-insensitive document fingerprint)."""
    texts = batch[text_col].to_pylist()
    toks = [tokenize_simple(t or "") for t in texts]
    return pa.table(
        {
            id_col: batch[id_col],
            "fp": pa.array([md5_hex(" ".join(t)) for t in toks], pa.string()),
            "n_tokens": pa.array([len(t) for t in toks], pa.int64()),
        }
    )
