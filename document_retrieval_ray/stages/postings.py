"""Posting-triple emission (A1 analog) — per-batch, shuffle-free.

The reference builds per-doc ``defaultdict(int)`` term counters in a Python
loop (final_implementation.py:105-113). Here the batch's token lists are
flattened to (row, term) pairs once, then counted with a single pandas
hash-groupby — no per-row Python.

Output: one row per (document, distinct term):
``(lang, term, url, dl, tf)`` — the postings-triples Dataset that feeds the
``groupby(lang, term)`` index-build shuffle (A2/A5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .tokenize import flatten_tokens


def emit_postings(batch: pa.Table) -> pa.Table:
    """(url, lang, tokens, dl) → (lang, term, url, dl, tf)."""
    parent, terms = flatten_tokens(batch)
    if len(terms) == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "url": pa.array([], pa.string()),
                "dl": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
            }
        )
    df = pd.DataFrame({"row": parent, "term": terms})
    counted = (
        df.groupby(["row", "term"], sort=False).size().reset_index(name="tf")
    )
    rows = counted["row"].to_numpy()
    urls = np.asarray(batch["url"].to_pandas(), dtype=object)[rows]
    langs = np.asarray(batch["lang"].to_pandas(), dtype=object)[rows]
    dls = batch["dl"].to_numpy(zero_copy_only=False)[rows]
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "term": pa.array(counted["term"].to_numpy(), pa.string()),
            "url": pa.array(urls, pa.string()),
            "dl": pa.array(dls, pa.int64()),
            "tf": pa.array(counted["tf"].to_numpy(), pa.int64()),
        }
    )
