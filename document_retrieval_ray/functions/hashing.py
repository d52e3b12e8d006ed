"""Deterministic hashing: md5 helpers, minhash/LSH signatures, simhash,
rolling fingerprints.

Everything here is reproducible in DuckDB SQL where an oracle needs it:

- ``md5_hex(s)``                   ≙ SQL ``md5(s)``
- minhash_i(doc)  = lexicographic ``min(md5(f"{seed}:{shingle}"))``
                                   ≙ SQL ``min(md5(seed || ':' || shingle))``
- band key        = ``md5('|'.join(minhashes of the band))``
                                   ≙ SQL ``md5(string_agg(... ORDER BY seed))``

The minhash construction intentionally uses md5 *hex strings* ordered
lexicographically (not integers) so the SQL oracle and the Ray pipeline
compare identical values. SimHash and the rolling fingerprint use
md5-derived 64-bit integers; they have no SQL oracle (rows-only check) but
a numpy pytest oracle.

Replaces the reference's implicit exact-identity keying (docid strings) —
the reference has no near-dup machinery; this is part of the
training-data-pipeline extension surface required of this engine.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = [
    "md5_hex",
    "md5_hex_many",
    "stable_hash64",
    "stable_hash64_many",
    "shingles",
    "minhash_signature",
    "band_keys",
    "simhash64",
    "rolling_fingerprint",
]


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def stable_hash64(s: str) -> int:
    """First 8 bytes of md5 as an unsigned 64-bit int (deterministic)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


# ------------------------------------------------------------- batched md5
# One vectorized C pass per BATCH instead of one hashlib call per Python
# row: DuckDB's md5() over a registered Arrow column produces the exact
# same hex bytes as hashlib (it IS the oracle's md5), so every dedup
# oracle stays bit-identical while the hot emit stages stop paying
# per-row Python overhead. The per-process connection is pinned to one
# thread — a Ray task/actor slot is one CPU.

_DUCK_CON = None


def _duck():
    global _DUCK_CON
    if _DUCK_CON is None:
        import duckdb

        _DUCK_CON = duckdb.connect()
        _DUCK_CON.execute("SET threads=1")
    return _DUCK_CON


def md5_hex_many(strings) -> "np.ndarray":
    """md5 hex digests of a string sequence (list / numpy / pyarrow),
    order-preserving; one vectorized DuckDB pass. Identical bytes to
    ``[md5_hex(s) for s in strings]`` (tested)."""
    import pyarrow as pa

    arr = strings if isinstance(strings, (pa.Array, pa.ChunkedArray)) else \
        pa.array(list(strings), pa.string())
    if len(arr) == 0:
        return np.asarray([], dtype=object)
    tbl = pa.table({"s": arr})
    con = _duck()
    con.register("_md5_in", tbl)
    out = con.execute("SELECT md5(s) AS h FROM _md5_in").arrow()
    con.unregister("_md5_in")
    return np.asarray(out["h"].to_pylist(), dtype=object)


def stable_hash64_many(strings) -> "np.ndarray":
    """Vectorized :func:`stable_hash64`: first 8 md5 bytes as uint64,
    one DuckDB pass + one bulk hex decode (no per-row int.from_bytes)."""
    hexes = md5_hex_many(strings)
    if len(hexes) == 0:
        return np.asarray([], dtype=np.uint64)
    joined = "".join(h[:16] for h in hexes)
    return np.frombuffer(bytes.fromhex(joined), dtype=">u8").astype(np.uint64)


def shingles(tokens: list, n: int = 3) -> list:
    """Distinct n-token shingles, space-joined, order-stable distinct."""
    if len(tokens) < n:
        return [" ".join(tokens)] if tokens else []
    seen = set()
    out = []
    for i in range(len(tokens) - n + 1):
        s = " ".join(tokens[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def minhash_signature(shingle_list: list, num_hashes: int = 8) -> list:
    """Per seed i: lexicographic min of md5(f"{i}:{shingle}") hex digests."""
    if not shingle_list:
        return ["" for _ in range(num_hashes)]
    return [
        min(md5_hex(f"{i}:{s}") for s in shingle_list) for i in range(num_hashes)
    ]


def band_keys(signature: list, band_size: int = 2) -> list:
    """LSH band keys: md5 of '|'-joined minhashes per band."""
    return [
        md5_hex("|".join(signature[b : b + band_size]))
        for b in range(0, len(signature), band_size)
    ]


def simhash64(tokens: list) -> int:
    """64-bit SimHash over token md5-64 hashes weighted by tf."""
    if not tokens:
        return 0
    uniq, counts = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
    hashes = np.array([stable_hash64(t) for t in uniq], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    weights = counts[:, None]
    acc = ((bits * 2 - 1) * weights).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(tokens: list, base: int = 1_000_003, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash over token hash64s (order-sensitive)."""
    h = 0
    for t in tokens:
        h = (h * base + stable_hash64(t)) % mod
    return h
