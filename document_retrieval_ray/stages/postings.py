"""Posting-triple emission (A1 analog) — per-batch, shuffle-free.

The reference builds per-doc ``defaultdict(int)`` term counters in a Python
loop (final_implementation.py:105-113). Here the batch's token stream is
dictionary-encoded and run-length counted entirely at the C level — no
per-row Python, no Python string objects.

Output: one row per (document, distinct term):
``(lang, term, url, dl, tf)`` — the postings-triples Dataset that feeds the
``groupby(lang, term)`` index-build shuffle (A2/A5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def emit_postings(batch: pa.Table, token_col: str = "tokens") -> pa.Table:
    """(url, lang, tokens, dl) → (lang, term, url, dl, tf).

    C-level counting: dictionary-encode the flat token stream and
    run-length count over a (doc, code) lexsort — no Python string
    objects, no pandas object-key groupby."""
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "lang": pa.array([], pa.string()),
            "term": pa.array([], pa.string()),
            "url": pa.array([], pa.string()),
            "dl": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
        }
    )
    col = batch[token_col].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    values = col.values
    start = offsets[0]
    if start != 0 or len(values) != offsets[-1]:
        values = values.slice(start, offsets[-1] - start)
    if len(values) == 0:
        return empty
    lens = np.diff(offsets)
    parent = np.repeat(np.arange(len(col), dtype=np.int64), lens)
    enc = pc.dictionary_encode(values)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dict_arr = enc.dictionary
    keep = (pc.utf8_length(dict_arr).to_numpy(zero_copy_only=False) > 0)[codes]
    parent, codes = parent[keep], codes[keep]
    if len(parent) == 0:
        return empty
    # packed-key radix argsort (see TokenizeStage._count): 1 pass vs
    # lexsort's 2; equal keys are identical pairs so output is unchanged
    V = len(dict_arr)
    if int(parent[-1] + 1) * V < 2**62:
        order = np.argsort(parent * np.int64(V) + codes, kind="stable")
    else:
        order = np.lexsort((codes, parent))
    p2, c2 = parent[order], codes[order]
    change = (p2[1:] != p2[:-1]) | (c2[1:] != c2[:-1])
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [len(p2)]])
    rows = p2[starts]
    idx = pa.array(rows)
    return pa.table(
        {
            "lang": pc.cast(batch["lang"].combine_chunks().take(idx), pa.string()),
            "term": pc.cast(dict_arr.take(pa.array(c2[starts])), pa.string()),
            "url": pc.cast(batch["url"].combine_chunks().take(idx), pa.string()),
            "dl": pa.array(
                batch["dl"].to_numpy(zero_copy_only=False)[rows], pa.int64()
            ),
            "tf": pa.array((ends - starts).astype(np.int64), pa.int64()),
        }
    )
