"""Text-analysis kernels: token counting, quality scoring, language ID.

These extend the reference (which has only doc-length computation,
ranking_with_bm25.py:196-198) with the text-analysis operators a
large-scale training-data pipeline needs. Every definition here is
mirrored exactly in DuckDB oracle SQL (see __ray_entry__), so all
constants are FROZEN — change them only together with the SQL.

Fixed-point convention: ratios are exported as ``floor(x * 10000 + 0.5)``
BIGINTs (``fx4``) so float hashing is stable across engines.
"""

from __future__ import annotations

import math

from .stopwords import EN_SQL_STOPWORDS
from .tokenizer import tokenize_simple

__all__ = ["fx4", "doc_stats_row", "LANG_MARKERS", "langid_stopword"]


def fx4(x: float) -> int:
    """Fixed-point 4-decimal encoding, identical to SQL
    ``CAST(floor(x*10000 + 0.5) AS BIGINT)``."""
    return int(math.floor(x * 10000.0 + 0.5))


def doc_stats_row(text: str) -> dict:
    """Per-document text statistics (simple tokenizer).

    n_tokens   token count
    tok_chars  total characters across tokens
    mean_tok_len_x  fx4(tok_chars / n_tokens)
    stop_ratio_x    fx4(stopword tokens / n_tokens)  (EN_SQL_STOPWORDS)
    quality_x       fx4(0.5*least(n_tokens,100)/100
                        + 0.3*(1 - stop_ratio)
                        + 0.2*least(mean_tok_len,10)/10)
    All zero for token-less documents.
    """
    toks = tokenize_simple(text)
    n = len(toks)
    if n == 0:
        return dict(n_tokens=0, tok_chars=0, mean_tok_len_x=0, stop_ratio_x=0, quality_x=0)
    tok_chars = sum(len(t) for t in toks)
    stop = sum(1 for t in toks if t in EN_SQL_STOPWORDS)
    mean_len = tok_chars / n
    stop_ratio = stop / n
    quality = (
        0.5 * min(n, 100) / 100.0
        + 0.3 * (1.0 - stop_ratio)
        + 0.2 * min(mean_len, 10.0) / 10.0
    )
    return dict(
        n_tokens=n,
        tok_chars=tok_chars,
        mean_tok_len_x=fx4(mean_len),
        stop_ratio_x=fx4(stop_ratio),
        quality_x=fx4(quality),
    )


# frozen marker-word profiles for the stopword-hit language heuristic;
# alphabetical key order IS the argmax tie-break order (mirrored in SQL).
LANG_MARKERS: dict = {
    "de": ("der", "die", "das", "und", "nicht", "ein", "ist"),
    "en": ("the", "a", "and", "of", "is", "to", "in"),
    "es": ("el", "la", "los", "que", "de", "es", "un"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai", "you"),
}


def langid_stopword(text: str) -> dict:
    """Predict language by marker-word hit counts, tie → alphabetical."""
    toks = tokenize_simple(text)
    hits = {
        lang: sum(1 for t in toks if t in marks)
        for lang, marks in sorted(LANG_MARKERS.items())
    }
    best = max(hits.values()) if hits else 0
    pred = next(l for l in sorted(hits) if hits[l] == best)
    out = {f"hits_{l}": hits[l] for l in sorted(hits)}
    out["pred_lang"] = pred
    return out
