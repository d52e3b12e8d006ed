"""Property-based tests (hypothesis) for the codec and top-k kernels —
randomized inputs beyond the fixture corpora."""

import numpy as np
from hypothesis import given, settings, strategies as st

from document_retrieval_ray.functions.varbyte import (
    decode_blocked_postings,
    decode_postings,
    encode_blocked_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)
from document_retrieval_ray.state.index_shard import topk_with_ties


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 62)), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(arr))) == vals


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1 << 40),  # gaps >= 1
            st.integers(min_value=1, max_value=1 << 20),  # tf >= 1
        ),
        min_size=1,
        max_size=400,
    ),
    st.integers(min_value=1, max_value=64),  # block size
)
@settings(max_examples=100, deadline=None)
def test_blocked_postings_roundtrip(pairs, block_size):
    gaps = np.array([g for g, _ in pairs], dtype=np.uint64)
    doc_ids = np.cumsum(gaps, dtype=np.uint64)
    tfs = np.array([t for _, t in pairs], dtype=np.uint64)
    buf, block_off = encode_blocked_postings(doc_ids, tfs, block_size)
    d, t = decode_blocked_postings(
        np.frombuffer(buf, np.uint8), block_off, len(doc_ids), block_size
    )
    assert list(d) == list(doc_ids)
    assert list(t) == list(tfs)
    # blocked and flat codecs agree
    d2, t2 = decode_postings(encode_postings(doc_ids, tfs), len(doc_ids))
    assert list(d2) == list(doc_ids) and list(t2) == list(tfs)


@given(
    st.lists(st.floats(min_value=-5, max_value=5, allow_nan=False), min_size=0,
             max_size=80),
    st.integers(min_value=1, max_value=15),
)
@settings(max_examples=100, deadline=None)
def test_topk_with_ties_properties(scores, k):
    s = np.asarray(scores, dtype=np.float64)
    urls = np.array([f"u{i:04d}" for i in range(len(s))], dtype=object)
    ranks, sel, keys = topk_with_ties(s, urls, k, round_dp=4)
    # only positive scores, at most k, ranks consecutive from 1
    assert len(sel) <= k
    assert all(s[i] > 0 for i in sel)
    assert list(ranks) == list(range(1, len(sel) + 1))
    # result equals brute-force composite sort of all positive docs
    pos = np.nonzero(s > 0)[0]
    key = np.floor(s[pos] * 10000 + 0.5)
    order = sorted(range(len(pos)), key=lambda j: (-key[j], urls[pos[j]]))
    expect = [pos[j] for j in order[:k]]
    assert list(sel) == expect
