"""Delta-gap + varbyte posting-list codec (vectorized numpy).

Format (north-star posting format, SURVEY.md §1.3):

- a posting list for one term is the pair of arrays ``doc_ids`` (strictly
  ascending uint64) and ``tfs`` (uint64 >= 1), encoded as ONE varbyte
  stream of ``2*df`` values: first the ``df`` doc-id gaps
  (``gap_0 = doc_id_0``, ``gap_i = doc_id_i - doc_id_{i-1}``), then the
  ``df`` term frequencies.
- varbyte: little-endian 7-bit groups; the MSB is set on the LAST byte of
  each value (classic IR varbyte). Values up to 2**63 supported.

Encode and decode are fully vectorized (no per-value Python loop): encode
scatters 7-bit groups by byte position; decode reconstructs values with a
segmented ``np.add.reduceat`` over terminator positions.

The reference keeps posting lists as Python ``{term: [doc_id, ...]}`` dicts
(final_implementation.py:99,113) — this codec replaces that with a compact
binary representation suitable for Arrow ``binary`` columns and shard files.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "varbyte_encode",
    "varbyte_encode_with_lengths",
    "varbyte_decode",
    "encode_postings",
    "decode_postings",
    "encode_blocked_postings",
    "decode_blocked_postings",
    "decode_segments_many",
    "decode_block",
]

_MAX_BYTES = 10  # ceil(64/7)


def varbyte_encode_with_lengths(values: np.ndarray):
    """Encode a uint array to a varbyte stream, returning
    ``(uint8 ndarray, per-value byte lengths int64 ndarray)`` — the
    stream is byte-identical to :func:`varbyte_encode`; the lengths let a
    caller slice the stream at arbitrary value boundaries (the basis of
    the multi-segment encoder in stages.index_build)."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.ndim != 1:
        raise ValueError("varbyte_encode expects a 1-D array")
    if arr.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # bytes needed per value: 1 + number of 7-bit groups above the first.
    # Early-exit at the stream's max (posting gaps/tfs rarely exceed 2-3
    # bytes, so this runs 2-3 compare passes instead of 9) and add the
    # bool mask in place (no df-sized int64 temp per pass).
    nb = np.ones(arr.shape, dtype=np.int64)
    mx = int(arr.max())
    for k in range(1, _MAX_BYTES):
        if mx < (1 << (7 * k)):
            break
        nb += arr >= np.uint64(1 << (7 * k))
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(nb.max())):
        mask = nb > k
        out[starts[mask] + k] = (
            (arr[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        ).astype(np.uint8)
    out[ends - 1] |= 0x80  # terminator bit on last byte of each value
    return out, nb


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint array to a varbyte stream."""
    out, _ = varbyte_encode_with_lengths(values)
    return out.tobytes()


def varbyte_decode(buf) -> np.ndarray:
    """Decode a varbyte stream back to a uint64 array. Accepts bytes or a
    uint8 ndarray view (zero-copy slices of a shared buffer)."""
    if isinstance(buf, np.ndarray):
        data = buf
    else:
        data = np.frombuffer(buf, dtype=np.uint8)
    if data.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero(data & 0x80)[0]
    if ends.size == 0 or ends[-1] != data.size - 1:
        raise ValueError("truncated varbyte stream")
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # position of each byte within its value
    lens = ends - starts + 1
    pos = np.arange(data.size, dtype=np.int64) - np.repeat(starts, lens)
    vals7 = (data & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    return np.add.reduceat(vals7, starts)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> bytes:
    """Delta-gap + varbyte encode a (sorted doc_ids, tfs) posting list."""
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    if doc_ids.size != tfs.size:
        raise ValueError("doc_ids and tfs must have equal length")
    if doc_ids.size == 0:
        return b""
    gaps = np.empty_like(doc_ids)
    gaps[0] = doc_ids[0]
    if doc_ids.size > 1:
        diffs = np.diff(doc_ids.astype(np.int64))
        if (diffs <= 0).any():
            raise ValueError("doc_ids must be strictly ascending")
        gaps[1:] = diffs.astype(np.uint64)
    return varbyte_encode(np.concatenate([gaps, tfs]))


def decode_postings(buf, df: int):
    """Inverse of :func:`encode_postings` → (doc_ids, tfs) uint64 arrays."""
    vals = varbyte_decode(buf)
    if vals.size != 2 * df:
        raise ValueError(f"expected {2*df} values, got {vals.size}")
    gaps, tfs = vals[:df], vals[df:]
    return np.cumsum(gaps, dtype=np.uint64), tfs


# --- block-structured layout (random block access for block-max WAND) ---
#
# stream = block_0 ++ block_1 ++ ... where block_b is an independent varbyte
# stream of 2*count_b values: [gaps of the block..., tfs of the block...].
# The first gap of block b is relative to the LAST doc id of block b-1
# (block 0: relative to -0). ``block_off[b]`` is the byte offset of block b;
# block b spans bytes [block_off[b], block_off[b+1]) (last block: to end).


def encode_blocked_postings(doc_ids: np.ndarray, tfs: np.ndarray, block_size: int):
    """→ (buf: bytes, block_off: list[int]). doc_ids strictly ascending."""
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    if doc_ids.size != tfs.size:
        raise ValueError("doc_ids and tfs must have equal length")
    if doc_ids.size > 1 and (np.diff(doc_ids.astype(np.int64)) <= 0).any():
        # a violated merge invariant (overlapping/duplicated segments)
        # must fail loudly — a wrapped uint64 gap would encode fine and
        # decode to garbage doc ids
        raise ValueError("doc_ids must be strictly ascending")
    chunks, offsets = [], []
    pos = 0
    prev_last = np.uint64(0)
    for s in range(0, doc_ids.size, block_size):
        e = min(s + block_size, doc_ids.size)
        d = doc_ids[s:e]
        gaps = np.empty(e - s, dtype=np.uint64)
        gaps[0] = d[0] - prev_last
        if e - s > 1:
            gaps[1:] = np.diff(d.astype(np.int64)).astype(np.uint64)
        chunk = varbyte_encode(np.concatenate([gaps, tfs[s:e]]))
        offsets.append(pos)
        pos += len(chunk)
        chunks.append(chunk)
        prev_last = d[-1]
    return b"".join(chunks), offsets


def decode_segments_many(bufs, dfs, block_size: int):
    """Decode MANY block-structured posting segments in one pass →
    ``(doc_ids int64, tfs int64, seg_starts int64)`` flat arrays, segment-
    major. ``bufs``: iterable of per-segment byte streams (as produced by
    :func:`encode_blocked_postings`); ``dfs``: per-segment posting counts.

    Varbyte streams are self-delimiting, so decoding the concatenation of
    all buffers equals concatenating the decodes; the gap/tf positions in
    the interleaved value stream are recovered in closed form from the
    block structure (mirror of ``encode_segments_many``), and absolute doc
    ids are one segmented cumsum (within a segment, every block's first
    gap is relative to the previous posting)."""
    dfs = np.asarray(dfs, dtype=np.int64)
    n = int(dfs.sum())
    if n == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.zeros(len(dfs) + 1, np.int64),
        )
    if (dfs <= 0).any():
        raise ValueError("decode_segments_many: empty segment")
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    vals = varbyte_decode(data)
    if vals.size != 2 * n:
        raise ValueError(f"expected {2*n} values, got {vals.size}")
    starts = np.concatenate([[0], np.cumsum(dfs)]).astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    within = idx - np.repeat(starts[:-1], dfs)
    gbs = np.flatnonzero((within % block_size) == 0)
    gbe = np.concatenate([gbs[1:], [n]])
    blen = gbe - gbs
    bstart_per = np.repeat(gbs, blen)
    blen_per = np.repeat(blen, blen)
    gaps = vals[bstart_per + idx]
    tfs = vals[bstart_per + idx + blen_per]
    cs = np.cumsum(gaps)
    doc = cs - np.repeat(cs[starts[:-1]] - gaps[starts[:-1]], dfs)
    return doc.astype(np.int64), tfs.astype(np.int64), starts


def decode_block(buf, off: int, end: int, count: int, prev_last: int):
    """Decode one block → (doc_ids, tfs)."""
    if isinstance(buf, np.ndarray):
        vals = varbyte_decode(buf[off:end])
    else:
        vals = varbyte_decode(bytes(buf[off:end]))
    if vals.size != 2 * count:
        raise ValueError(f"expected {2*count} values in block, got {vals.size}")
    gaps, tfs = vals[:count].copy(), vals[count:]
    gaps[0] += np.uint64(prev_last)
    return np.cumsum(gaps, dtype=np.uint64), tfs


def decode_blocked_postings(buf, block_off, df: int, block_size: int):
    """Decode the full block-structured stream → (doc_ids, tfs).

    Fully vectorized: ONE varbyte pass over the whole buffer, then a mask
    split into gap/tf positions. Because each block's first gap is
    relative to the previous block's last doc id, the cumsum of the
    concatenated gap stream yields absolute doc ids directly — no
    per-block Python loop (a df≈10⁶ term has ~8k blocks; the per-block
    loop dominated full decodes)."""
    if df == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    data = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, dtype=np.uint8)
    vals = varbyte_decode(data)
    if vals.size != 2 * df:
        raise ValueError(f"expected {2*df} values, got {vals.size}")
    bs = int(block_size)
    pos = np.arange(2 * df, dtype=np.int64)
    blk = pos // (2 * bs)
    within = pos - blk * (2 * bs)
    count_in_blk = np.minimum(bs, df - blk * bs)
    is_gap = within < count_in_blk
    gaps = vals[is_gap]
    tfs = vals[~is_gap]
    return np.cumsum(gaps, dtype=np.uint64), tfs
