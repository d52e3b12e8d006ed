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


# ---------------------------------------------------------------- round-3g


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),      # user_id
            st.integers(min_value=0, max_value=30),     # day
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=150, deadline=None)
def test_streaks_partition_matches_bruteforce(rows):
    """_streaks_partition ≡ per-user brute-force islands over the
    distinct-day sets, for any (user, day) multiset."""
    import pandas as pd

    from document_retrieval_ray.pipelines.testdata_queries import (
        _streaks_partition,
    )

    g = pd.DataFrame(rows, columns=["user_id", "day"]).astype("int64")
    got = {
        (int(r.user_id), int(r.streak_start), int(r.streak_end),
         int(r.n_days))
        for r in _streaks_partition(g).itertuples()
    }
    exp = set()
    for u in sorted({u for u, _ in rows}):
        days = sorted({d for uu, d in rows if uu == u})
        start = prev = days[0]
        for d in days[1:] + [None]:
            if d is None or d != prev + 1:
                exp.add((u, start, prev, prev - start + 1))
                start = d
            prev = d
    assert got == exp


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),      # user_id
            st.integers(min_value=0, max_value=50),     # item
        ),
        min_size=0,
        max_size=150,
    )
)
@settings(max_examples=150, deadline=None)
def test_covisit_partition_matches_bruteforce(rows):
    """_covisit_partition pairs ≡ brute force over each user's capped
    sorted-distinct item prefix."""
    from itertools import combinations

    import pandas as pd

    from document_retrieval_ray.pipelines.testdata_queries import (
        COVISIT_MAX_ITEMS,
        _covisit_partition,
    )

    g = pd.DataFrame(rows, columns=["user_id", "item"]).astype("int64")
    got = sorted(
        (int(r.a), int(r.b)) for r in _covisit_partition(g).itertuples()
    )
    exp = []
    for u in {u for u, _ in rows}:
        items = sorted({i for uu, i in rows if uu == u})[:COVISIT_MAX_ITEMS]
        exp.extend(combinations(items, 2))
    assert got == sorted(exp)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),      # src
            st.integers(min_value=0, max_value=9),      # dst
            st.integers(min_value=-5000, max_value=10000),  # cos_x
        ),
        min_size=0,
        max_size=100,
    )
)
@settings(max_examples=150, deadline=None)
def test_mutual_partition_matches_bruteforce(edges):
    """_mutual_partition keeps exactly the unordered pairs present in
    both directions, reporting the lo→hi edge's cos_x."""
    import pandas as pd

    from document_retrieval_ray.pipelines.testdata_queries import (
        _mutual_partition,
    )

    # kNN edge lists never contain self-loops or duplicate (src, dst)
    seen, clean = set(), []
    for s, d, c in edges:
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            clean.append((s, d, c))
    lo = [min(s, d) for s, d, _ in clean]
    hi = [max(s, d) for s, d, _ in clean]
    g = pd.DataFrame(
        {
            "lo": lo,
            "hi": hi,
            "dir": [0 if s < d else 1 for s, d, _ in clean],
            "cos_x": [c for _, _, c in clean],
        }
    ).astype("int64")
    got = sorted(
        (int(r.a), int(r.b), int(r.cos_x))
        for r in _mutual_partition(g).itertuples()
    )
    directed = {(s, d): c for s, d, c in clean}
    exp = sorted(
        (s, d, c)
        for (s, d), c in directed.items()
        if s < d and (d, s) in directed
    )
    assert got == exp


@given(st.integers(min_value=0, max_value=500))
@settings(max_examples=50, deadline=None)
def test_decay_weights_chain(max_age):
    """Weights are the exact floor-division chain: nonincreasing,
    w0=10000, each step = prev*9//10."""
    from document_retrieval_ray.pipelines.testdata_queries import (
        DECAY_DEN,
        DECAY_NUM,
        DECAY_W0,
        _decay_weights,
    )

    w = _decay_weights(max_age)
    assert len(w) == max_age + 1 and w[0] == DECAY_W0
    for i in range(max_age):
        assert w[i + 1] == (int(w[i]) * DECAY_NUM) // DECAY_DEN
        assert w[i + 1] <= w[i]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),       # group key
            st.integers(min_value=0, max_value=40),      # value
        ),
        min_size=0,
        max_size=150,
    ),
    st.integers(min_value=1, max_value=12),              # cap
    st.sampled_from(["truncate", "skip"]),
)
@settings(max_examples=200, deadline=None)
def test_grouped_pairs_matches_bruteforce(rows, cap, oversize):
    """grouped_pairs ≡ per-group brute force for both oversize modes."""
    from itertools import combinations

    import numpy as np

    from document_retrieval_ray.stages.dedup import grouped_pairs

    keys = np.array([k for k, _ in rows], dtype=np.int64)
    vals = np.array([v for _, v in rows], dtype=np.int64)
    a, b = grouped_pairs(keys, vals, cap, oversize=oversize)
    got = sorted(zip(a.tolist(), b.tolist()))
    exp = []
    for g in sorted({k for k, _ in rows}):
        items = sorted({v for k, v in rows if k == g})
        if oversize == "skip" and len(items) > cap:
            continue
        exp.extend(combinations(items[:cap], 2))
    assert got == sorted(exp)
    assert all(x < y for x, y in got)


# ---------------------------------------------------------------- fuzzy

def _lev_dp(a: str, b: str) -> int:
    """Reference O(len(a)*len(b)) levenshtein (unit costs)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    st.text(alphabet="abc", max_size=8),
    st.text(alphabet="abc", max_size=8),
)
@settings(max_examples=400, deadline=None)
def test_lev_le1_matches_dp(a, b):
    from document_retrieval_ray.functions.fuzzy import lev_le1

    assert lev_le1(a, b) == (_lev_dp(a, b) <= 1)


@given(
    st.text(alphabet="abcd", min_size=1, max_size=8),
    st.text(alphabet="abcd", min_size=1, max_size=8),
)
@settings(max_examples=400, deadline=None)
def test_deletion_neighborhood_is_lossless_filter(a, b):
    """The SymSpell candidate probe never drops a true match:
    lev(a,b) <= 1 implies ({a} | D1(a)) intersects ({b} | D1(b)).
    False candidates (e.g. transpositions at distance 2) are allowed —
    that's what the exact verify removes — so probe AND lev_le1
    together equal the exact distance predicate."""
    import pyarrow as pa

    from document_retrieval_ray.functions.fuzzy import (
        deletion_variants, lev_le1,
    )

    def hood(s: str) -> set:
        _idx, var = deletion_variants(pa.array([s], pa.string()))
        return {s} | set(var.to_pylist())

    probe = bool(hood(a) & hood(b))
    truth = _lev_dp(a, b) <= 1
    if truth:
        assert probe  # lossless: no false negatives
    assert (probe and lev_le1(a, b)) == truth
