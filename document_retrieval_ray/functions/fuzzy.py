"""Edit-distance-1 term matching kernels (SymSpell deletion
neighborhoods) shared by spelling suggestion and fuzzy retrieval.

A term t matches a query token m with levenshtein(t, m) <= 1 iff
({t} | D1(t)) intersects ({m} | D1(m)), where D1 is the set of
single-character deletions — equality, insert, delete and substitute
all produce an intersection, so the neighborhood probe is a lossless
candidate filter ahead of the exact verify.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def lev_le1(a: str, b: str) -> bool:
    """Exact levenshtein(a, b) <= 1 (unit costs, same as DuckDB's)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = 0
    skipped = False
    while i < la:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif not skipped:
            skipped = True
            j += 1
        else:
            return False
    return True


def deletion_variants(terms: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(row_idx, variant) for every single-character deletion of every
    term — vectorized per deletion POSITION with Arrow slice kernels, so
    the loop count is max term length, not vocabulary size."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    lens = pc.utf8_length(terms)
    maxlen = pc.max(lens).as_py() if n else 0
    idx_parts, var_parts = [], []
    base = np.arange(n, dtype=np.int64)
    for i in range(maxlen or 0):
        mask = pc.greater(lens, i)
        sel = pc.filter(terms, mask)
        var = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sel, 0, i),
            pc.utf8_slice_codeunits(sel, i + 1, 2**30),
            "",
        )
        idx_parts.append(base[mask.to_numpy(zero_copy_only=False)])
        var_parts.append(var)
    if not idx_parts:
        return np.empty(0, np.int64), pa.array([], pa.string())
    return np.concatenate(idx_parts), pa.concat_arrays(var_parts)
