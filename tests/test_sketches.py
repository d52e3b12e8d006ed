"""Unit oracles for the distribution/sketch ops (dl_percentiles,
hll_distinct, top_per_group) — pure-python checks of the math the
distributed pipelines rely on; end-to-end parity is covered by
test_oracle_parity."""

import hashlib

import numpy as np
import pandas as pd

from document_retrieval_ray.pipelines.testdata_queries import (
    DL_PCTS,
    HLL_M,
    HLL_RHO_BITS,
    TOPGROUP_K,
    hll_estimate,
)


def _hll_register(term: str) -> tuple[int, int]:
    hx = hashlib.md5(term.encode("utf-8")).hexdigest()
    reg = int(hx[:2], 16)
    v = int(hx[2 : 2 + HLL_RHO_BITS // 4], 16)
    rho = (HLL_RHO_BITS - v.bit_length()) + 1 if v else HLL_RHO_BITS + 1
    return reg, rho


def _simulate(terms) -> int:
    reg_max = np.zeros(HLL_M, dtype=np.int64)
    for t in terms:
        reg, rho = _hll_register(t)
        reg_max[reg] = max(reg_max[reg], rho)
    return hll_estimate(reg_max)


def test_hll_empty_registers_small_range():
    # one item → small-range (linear-counting) branch: m * ln(m / V)
    reg, rho = _hll_register("alpha")
    reg_max = np.zeros(HLL_M, dtype=np.int64)
    reg_max[reg] = rho
    est = _simulate(["alpha"])
    expect = int(np.floor(HLL_M * np.log(HLL_M / (HLL_M - 1)) + 0.5))
    assert est == expect == 1


def test_hll_duplicates_do_not_raise_estimate():
    terms = [f"tok{i}" for i in range(500)]
    assert _simulate(terms) == _simulate(terms * 7)


def test_hll_accuracy_large_n():
    # σ ≈ 1.04/√m = 6.5% for m=256; fixed term set → deterministic run
    for n in (5_000, 50_000):
        est = _simulate(f"word{i:06d}" for i in range(n))
        assert abs(est / n - 1.0) < 0.15, (n, est)


def test_hll_merge_associativity():
    # register-max merging is what makes the sketch distributable: any
    # batch split must yield the same registers (hence estimate)
    terms = [f"t{i}" for i in range(2_000)]
    whole = _simulate(terms)
    reg_a = np.zeros(HLL_M, dtype=np.int64)
    reg_b = np.zeros(HLL_M, dtype=np.int64)
    for i, t in enumerate(terms):
        tgt = reg_a if i % 3 else reg_b
        reg, rho = _hll_register(t)
        tgt[reg] = max(tgt[reg], rho)
    assert hll_estimate(np.maximum(reg_a, reg_b)) == whole


def test_percentile_threshold_math():
    # engine: thresh = ceil(p% of tot) in exact ints; searchsorted(left)
    # picks the first histogram bucket whose running count reaches it
    counts = np.array([3, 1, 6], dtype=np.int64)  # dl values 10, 20, 30
    dlv = np.array([10, 20, 30], dtype=np.int64)
    cum = counts.cumsum()
    tot = int(cum[-1])

    def pick(p):
        thresh = (p * tot + 99) // 100
        return int(dlv[np.searchsorted(cum, thresh, side="left")])

    # tot=10, cum=[3,4,10]: smallest dl with cum ≥ ceil(p*tot/100)
    assert pick(25) == 10   # ceil(2.5)=3 ≤ cum[0]=3
    assert pick(50) == 30   # ceil(5)=5 > cum[1]=4 → third bucket
    assert pick(75) == 30   # ceil(7.5)=8
    assert pick(10) == 10   # ceil(1)=1 ≤ 3
    assert pick(95) == 30
    assert DL_PCTS == (25, 50, 75, 95)


def test_top_per_group_partial_prune_lossless():
    # forwarding only the per-batch top-k per group never changes the
    # global per-group top-k (monotone: dropped rows rank below k rows
    # of the same batch)
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "lang": rng.choice(["en", "fr", "de"], size=400),
            "doc_id": np.arange(400, dtype=np.int64),
            "dl": rng.integers(0, 50, size=400).astype(np.int64),
        }
    )

    def topk(d):
        return (
            d.sort_values(["dl", "doc_id"], ascending=[False, True])
            .groupby("lang", sort=False)
            .head(TOPGROUP_K)
        )

    full = topk(df).sort_values(["lang", "dl", "doc_id"]).reset_index(drop=True)
    parts = [topk(df.iloc[i : i + 64]) for i in range(0, 400, 64)]
    pruned = (
        topk(pd.concat(parts)).sort_values(["lang", "dl", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full, pruned)


def test_cms_overestimates_and_merges(ray_session):
    """CMS point estimates are one-sided (est >= true occurrence count)
    and the sketch merge is associative: combining per-batch partials in
    any grouping gives the same cells as one global pass."""
    import pyarrow as pa

    from document_retrieval_ray.pipelines.testdata_queries import (
        CMS_D,
        _cms_partial,
        cms_estimate,
    )

    texts = [
        "spark spark join window",
        "join join join dup spark",
        "window dup dup",
    ]
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en", "en", "en"], pa.string()),
    })
    whole = _cms_partial(t).to_pandas()
    parts = pd.concat(
        [_cms_partial(t.slice(i, 1)).to_pandas() for i in range(3)]
    )
    merged = parts.groupby(["lang", "d", "cell"], sort=False)["cnt"].sum().reset_index()
    a = whole.sort_values(["lang", "d", "cell"]).reset_index(drop=True)
    b = merged.sort_values(["lang", "d", "cell"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    true = {"spark": 3, "join": 4, "window": 2, "dup": 3, "absent": 0}
    for term, want in true.items():
        est = cms_estimate(whole, "en", term)
        assert est >= want
    # with 4 terms in 256 cells collisions are absent: estimates exact
    for term in ("spark", "join", "window", "dup"):
        assert cms_estimate(whole, "en", term) == true[term]
