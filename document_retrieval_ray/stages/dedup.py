"""Deduplication operators — training-data-pipeline extensions.

The reference has only exact-identity keying by docid (no near-dup
machinery); these operators are the dedup suite a 100 TB corpus pipeline
needs, each expressed Ray-Data-first:

- exact / normalized dedup: content-hash ``map_batches`` + one groupby —
  the hash (md5) is computed vectorized per batch; the groupby moves only
  (hash, doc_id) pairs, never text.
- MinHash + LSH: shingle → md5-minhash signature per batch → explode to
  (band_idx, band_key, doc_id) rows → ``groupby(band)`` emits candidate
  pairs → pairwise Jaccard verification. All hashes are md5-derived so a
  DuckDB oracle reproduces them EXACTLY (functions/hashing.py).
- SimHash: 64-bit signatures, banded into 4x16-bit chunks for candidate
  generation, Hamming-verified.

Scale notes: the verification stage is a DISTRIBUTED semi-join — the
candidate-pair list is exploded to per-side membership rows, cogrouped
with the per-doc shingle-hash table by ``doc_id`` (one corpus-sized
exchange), and the Jaccard intersection is computed in per-(a, b) groups.
Nothing is broadcast or materialized on the driver. Band groups larger
than ``max_bucket`` are truncated deterministically (sorted doc_id
prefix) so no single task is ever quadratic in a degenerate bucket.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hamming64, shingles
from ..functions.tokenizer import tokenize_simple

from ..config import DedupConfig
from ..util import arrow_blocks

DEFAULT_DEDUP = DedupConfig()
# module aliases kept for call sites / oracle templates built from the
# DEFAULT config — parameterized paths take a DedupConfig instead
NUM_HASHES = DEFAULT_DEDUP.num_hashes
BAND_SIZE = DEFAULT_DEDUP.band_size
SHINGLE_N = DEFAULT_DEDUP.shingle_n
MAX_BUCKET = DEFAULT_DEDUP.max_bucket


def _audit_truncation(kind: str, key, kept: int, dropped: int) -> None:
    """A bucket hit ``max_bucket``: surface it (the "no silent caps"
    rule). ``warnings`` so worker logs carry it and tests can assert on
    it; deterministic result, observable drop."""
    import warnings

    warnings.warn(
        f"dedup {kind} bucket {key!r} truncated: kept {kept} sorted doc_ids, "
        f"dropped {dropped} — candidate pairs outside the prefix are not "
        f"generated (raise DedupConfig.max_bucket if this bucket is real)",
        RuntimeWarning,
        stacklevel=2,
    )


def add_text_hash(batch: pa.Table, text_col: str = "text", normalize: bool = False) -> pa.Table:
    """Batched md5 content hash (one vectorized DuckDB pass per batch —
    functions/hashing.py); ``normalize`` lowercases and collapses
    whitespace/punctuation first via Arrow kernels (byte-identical to
    ``" ".join(tokenize_simple(t))`` — tested)."""
    import pyarrow.compute as pc

    from ..functions.hashing import md5_hex_many

    col = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
    if normalize:
        col = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(col), "[^a-z0-9]+", " "),
            " ",
        )
    hashes = md5_hex_many(col.combine_chunks() if isinstance(
        col, pa.ChunkedArray) else col)
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def _flat_shingles(batch: pa.Table, id_col: str, text_col: str, n: int):
    """(doc_id, shingle) rows flattened across the batch — the shared
    front half of the minhash / semi-join emit stages."""
    did, sh = [], []
    for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        ss = shingles(tokenize_simple(t or ""), n)
        if ss:
            did.extend([i] * len(ss))
            sh.extend(ss)
    return did, sh


def emit_band_rows(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text",
                   cfg: DedupConfig = DEFAULT_DEDUP) -> pa.Table:
    """Per doc: shingle → minhash signature → one row per LSH band.

    The seeds × shingles md5 blow-up runs as ONE vectorized DuckDB
    query per batch (md5 + group-min + band string_agg — the exact
    _MINHASH_SQL oracle plan, so bytes are identical by construction);
    only the tiny (doc, band) rows come back to Python. ~2.3× the
    per-row-Python emit this replaces."""
    from ..functions.hashing import _duck

    did, sh = _flat_shingles(batch, id_col, text_col, cfg.shingle_n)
    if not did:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "band_idx": pa.array([], pa.int64()),
            "band_key": pa.array([], pa.string()),
        })
    tbl = pa.table({"did": pa.array(did, pa.int64()),
                    "s": pa.array(sh, pa.string())})
    con = _duck()
    con.register("_mh_sh", tbl)
    out = con.execute(f"""
        WITH sig AS (
            SELECT did, i, min(md5(CAST(i AS VARCHAR) || ':' || s)) AS h
            FROM _mh_sh, range(0, {int(cfg.num_hashes)}) t(i)
            GROUP BY did, i
        )
        SELECT did AS doc_id,
               CAST(i // {int(cfg.band_size)} AS BIGINT) AS band_idx,
               md5(string_agg(h, '|' ORDER BY i)) AS band_key
        FROM sig GROUP BY did, band_idx ORDER BY doc_id, band_idx
    """).arrow()
    con.unregister("_mh_sh")
    return out.cast(pa.schema([("doc_id", pa.int64()),
                               ("band_idx", pa.int64()),
                               ("band_key", pa.string())]))


def band_group_pairs(group: pd.DataFrame, max_bucket: int = MAX_BUCKET) -> pd.DataFrame:
    """(band) group → candidate pairs (a < b). Buckets larger than
    ``max_bucket`` are truncated to the sorted doc_id prefix (deterministic;
    a bucket that large is a degenerate key, not a near-dup cluster) —
    each truncation is audited with a warning carrying the dropped count."""
    all_ids = sorted(set(group["doc_id"].tolist()))
    ids = all_ids[:max_bucket]
    if len(all_ids) > max_bucket:
        key = (
            (group["band_idx"].iloc[0], group["band_key"].iloc[0])
            if "band_idx" in group.columns and len(group)
            else "<band>"
        )
        _audit_truncation("minhash-band", key, len(ids), len(all_ids) - len(ids))
    n = len(ids)
    arr = np.asarray(ids, dtype=np.int64)
    iu = np.triu_indices(n, k=1)
    return pd.DataFrame(
        {
            "a": pd.Series(arr[iu[0]], dtype="int64"),
            "b": pd.Series(arr[iu[1]], dtype="int64"),
        }
    )


# ---------------------------------------------------------------- semi-join
# Distributed Jaccard verification (no driver materialization, no
# broadcast): mirror of the _MINHASH_SQL oracle's
# "join sh twice by doc_id, count intersections" plan expressed as two
# cogroups. Shingles travel as stable int64 hashes (first 8 bytes of md5)
# to keep the doc_id exchange compact; a cross-doc hash collision would
# perturb one intersection count with probability ~(#shingles)²/2⁶⁵.

_SEMIJOIN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("shs", pa.list_(pa.int64())),
        ("n", pa.int64()),
    ]
)


def emit_doc_shingles(batch: pa.Table, id_col: str = "doc_id",
                      text_col: str = "text", n: int = None) -> pa.Table:
    """One row per non-empty doc: sorted distinct shingle hashes + count,
    in the unified semi-join schema (a = b = -1 marks a shingle row)."""
    from ..functions.hashing import stable_hash64_many

    if n is None:
        n = DEFAULT_DEDUP.shingle_n
    did, sh = _flat_shingles(batch, id_col, text_col, n)
    if not did:
        return _SEMIJOIN_SCHEMA.empty_table()
    # batched md5-64 (one DuckDB pass), then per-doc sorted-distinct via
    # one lexsort — identical values/order to the per-doc
    # np.unique(uint64.view(int64)) this replaces (SIGNED sort order;
    # tested)
    did_np = np.asarray(did, dtype=np.int64)
    h = stable_hash64_many(sh).view(np.int64)
    order = np.lexsort((h, did_np))
    d2, h2 = did_np[order], h[order]
    keep = np.ones(len(d2), dtype=bool)
    keep[1:] = (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])
    d3, h3 = d2[keep], h2[keep]
    starts = np.flatnonzero(np.r_[True, d3[1:] != d3[:-1]])
    counts = np.diff(np.r_[starts, len(d3)])
    offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
    m = len(starts)
    return pa.table(
        {
            "doc_id": pa.array(d3[starts], pa.int64()),
            "a": pa.array(np.full(m, -1), pa.int64()),
            "b": pa.array(np.full(m, -1), pa.int64()),
            "shs": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(h3, pa.int64()),
            ),
            "n": pa.array(counts, pa.int64()),
        },
        schema=_SEMIJOIN_SCHEMA,
    )


def pair_side_rows(batch: pa.Table) -> pa.Table:
    """Candidate pairs (a, b) → two membership rows keyed by each side's
    doc_id, in the unified semi-join schema (empty shs marks a pair row)."""
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    doc = np.concatenate([a, b])
    aa = np.concatenate([a, a])
    bb = np.concatenate([b, b])
    m = len(doc)
    return pa.table(
        {
            "doc_id": pa.array(doc, pa.int64()),
            "a": pa.array(aa, pa.int64()),
            "b": pa.array(bb, pa.int64()),
            "shs": pa.array([[]] * m, pa.list_(pa.int64())),
            "n": pa.array(np.zeros(m, np.int64), pa.int64()),
        },
        schema=_SEMIJOIN_SCHEMA,
    )


# Partition-level group functions: every per-key stage below is keyed by
# a HASH PARTITION (add_kpart, ~64 parts) rather than the raw key, so one
# Ray group = one whole partition processed vectorized — per-key
# map_groups overhead (~ms of Arrow slicing per key) dominated the
# pipeline at one group per pair/doc/bucket.


def _drop_kpart(g: pd.DataFrame) -> pd.DataFrame:
    return g.drop(columns=["kpart"]) if "kpart" in g.columns else g


def dedup_pairs_partition(group: pd.DataFrame) -> pd.DataFrame:
    """Partition of candidate pairs → distinct (a, b) rows."""
    return _drop_kpart(group).drop_duplicates(["a", "b"])


def band_pairs_partition(group: pd.DataFrame,
                         max_bucket: int = MAX_BUCKET) -> pd.DataFrame:
    """Partition of band rows → candidate pairs from every
    (band_idx, band_key) bucket inside it."""
    g = _drop_kpart(group)
    parts = [
        band_group_pairs(gg, max_bucket)
        for _, gg in g.groupby(["band_idx", "band_key"], sort=False)
    ]
    if not parts:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return pd.concat(parts, ignore_index=True)


_ATTACHED_SCHEMA = pa.schema([
    ("a", pa.int64()), ("b", pa.int64()), ("doc_id", pa.int64()),
    ("shs", pa.list_(pa.int64())), ("n", pa.int64()),
])


def attach_partition(group: pd.DataFrame) -> pa.Table:
    """Partition of the doc_id-keyed cogroup (shingle rows where a < 0,
    pair-membership rows otherwise): one vectorized merge replicates each
    doc's shingle-hash array onto its pair rows.

    Returns an ARROW table with an explicit list<int64> ``shs`` column:
    a pandas frame carrying ndarray cells converts to Ray's tensor
    EXTENSION types — fixed-shape in blocks where every array happens to
    have equal length, variable-shaped otherwise — and two such blocks
    meeting in one downstream sort-reduce partition cannot concat
    (observed as a rare ValueError in ray::reduce at sf0.01)."""
    g = _drop_kpart(group)
    is_sh = g["a"].to_numpy() < 0
    sh = g.loc[is_sh, ["doc_id", "shs", "n"]]
    pr = g.loc[~is_sh, ["doc_id", "a", "b"]]
    if len(sh) == 0 or len(pr) == 0:
        return _ATTACHED_SCHEMA.empty_table()
    out = pr.merge(sh, on="doc_id", how="inner")
    # doc_id stays on the row: a pair emitted by several bands produces
    # duplicate side rows, deduped in the verify partition by
    # (a, b, doc_id) — saving a dedicated dedup shuffle
    return pa.table(
        {
            "a": pa.array(out["a"].to_numpy(np.int64), pa.int64()),
            "b": pa.array(out["b"].to_numpy(np.int64), pa.int64()),
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64), pa.int64()),
            "shs": pa.array(
                [np.asarray(x, dtype=np.int64) for x in out["shs"]],
                pa.list_(pa.int64()),
            ),
            "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
        },
        schema=_ATTACHED_SCHEMA,
    )


def jaccard_partition(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Partition of attached pair sides (both sides of a pair are in the
    same partition — keyed by (a, b) hash) → verified pairs. A pair with a
    missing side (its doc had no shingles) is skipped, matching the
    broadcast verifier's semantics."""
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "jaccard_x": pd.Series(dtype="int64")})
    g = _drop_kpart(group)
    if "doc_id" in g.columns:
        # duplicate side rows from multi-band pair emissions
        g = g.drop_duplicates(["a", "b", "doc_id"])
    if len(g) < 2:
        return empty
    g = g.sort_values(["a", "b"], kind="mergesort")
    a = g["a"].to_numpy()
    b = g["b"].to_numpy()
    shs = g["shs"].to_numpy()
    ns = g["n"].to_numpy()
    change = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [len(g)]])
    oa, ob, oj = [], [], []
    for s, e in zip(starts, ends):
        if e - s != 2:
            continue
        s1 = np.asarray(shs[s], dtype=np.int64)
        s2 = np.asarray(shs[s + 1], dtype=np.int64)
        inter = int(np.intersect1d(s1, s2, assume_unique=True).size)
        union = int(ns[s]) + int(ns[s + 1]) - inter
        if union <= 0:
            continue
        jac = inter / union
        if jac >= threshold:
            oa.append(int(a[s]))
            ob.append(int(b[s]))
            oj.append(int(np.floor(jac * 10000 + 0.5)))
    return pd.DataFrame(
        {
            "a": pd.Series(oa, dtype="int64"),
            "b": pd.Series(ob, dtype="int64"),
            "jaccard_x": pd.Series(oj, dtype="int64"),
        }
    )


# --------------------------------------------- exact n-gram Jaccard join
# AllPairs/PPJoin-style prefix filtering (Bayardo, Ma, Srikant, WWW'07;
# Xiao et al., WWW'08 — public algorithms): an EXACT similarity self-join
# (every pair with Jaccard >= t, no LSH recall loss) whose candidate
# generation is linear in the prefix-index size instead of quadratic in
# the corpus. Under one global canonical order of shingles (global df
# ascending, hash-value tie-break), any two sets with overlap >= o must
# share an element within their first (|S| - o + 1) elements; with
# J(a,b) >= t implying |a∩b| >= ceil(t*max(|a|,|b|)) >= ceil(t*|S|) for
# each side, emitting the first |S| - ceil(t*|S|) + 1 shingles per doc is
# a LOSSLESS filter. df-ascending ordering puts each doc's rarest
# shingles in the prefix, so hot shingles never form buckets unless a
# doc consists almost entirely of hot shingles.
#
# Distributed plan (no broadcast — the shingle-df table is vocabulary-
# sized but travels only by hash colocation):
#   explode (doc -> shingle rows) -> kpart(sh) partitions [df = in-
#   partition count, exact because every row of a shingle colocates]
#   -> kpart(doc_id) partitions [per-doc prefix under the (df, sh)
#   order] -> kpart(sh) bucket pairs -> the existing semi-join verify.


def explode_shingle_rows(batch: pa.Table) -> pa.Table:
    """Semi-join-schema shingle rows → one (sh, doc_id, n) row per
    distinct shingle hash. Arrow list_flatten + np.repeat — no per-row
    Python loop."""
    import pyarrow.compute as pc

    shs = batch["shs"]
    flat = pc.list_flatten(shs)
    lens = pc.list_value_length(shs).to_numpy(zero_copy_only=False)
    lens = np.asarray(lens, dtype=np.int64)
    ids = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), lens)
    ns = np.repeat(batch["n"].to_numpy(zero_copy_only=False), lens)
    return pa.table(
        {
            "sh": flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat,
            "doc_id": pa.array(ids, pa.int64()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def shingle_df_partition(group: pd.DataFrame) -> pd.DataFrame:
    """sh-hash partition of exploded rows: every occurrence of a given
    shingle is in this partition, so its GLOBAL df is the in-partition
    count — no separate df groupby, no join, no broadcast."""
    g = _drop_kpart(group).copy()
    g["df"] = g.groupby("sh")["sh"].transform("size").astype("int64")
    return g[["sh", "doc_id", "n", "df"]]


def prefix_rows_partition(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """doc_id-hash partition of (sh, doc_id, n, df) rows: per doc, order
    shingles by the global canonical order (df asc, sh asc) and keep the
    first n - ceil(threshold*n) + 1 — the lossless Jaccard prefix."""
    g = _drop_kpart(group).sort_values(["doc_id", "df", "sh"], kind="mergesort")
    rank = g.groupby("doc_id", sort=False).cumcount().to_numpy()
    n = g["n"].to_numpy()
    plen = n - np.ceil(threshold * n).astype(np.int64) + 1
    return g.loc[rank < plen, ["sh", "doc_id"]]


def shingle_bucket_pairs_partition(group: pd.DataFrame,
                                   max_bucket: int = MAX_BUCKET) -> pd.DataFrame:
    """sh-hash partition of prefix rows: candidate pairs (a < b) from
    every shingle bucket inside it, locally deduped. Degenerate buckets
    truncate to the sorted doc_id prefix with an audited drop count."""
    g = _drop_kpart(group)
    parts = []
    for sh_val, gg in g.groupby("sh", sort=False):
        all_ids = np.sort(gg["doc_id"].unique()).astype(np.int64)
        ids = all_ids[:max_bucket]
        if len(all_ids) > max_bucket:
            _audit_truncation("jaccard-prefix", int(sh_val), len(ids),
                              len(all_ids) - len(ids))
        if len(ids) < 2:
            continue
        iu = np.triu_indices(len(ids), k=1)
        parts.append(pd.DataFrame({"a": ids[iu[0]], "b": ids[iu[1]]}))
    if not parts:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return (
        pd.concat(parts, ignore_index=True)
        .drop_duplicates(["a", "b"])
        .astype({"a": "int64", "b": "int64"})
    )


def simhash_pairs_partition(group: pd.DataFrame, max_hamming: int = 3,
                            max_bucket: int = MAX_BUCKET) -> pd.DataFrame:
    """Partition of simhash band rows → Hamming-verified pairs from every
    (band, chunk) bucket inside it (locally deduped; the global (a, b)
    dedup runs as the next partition stage)."""
    g = _drop_kpart(group)
    parts = [
        simhash_band_pairs(gg, max_hamming, max_bucket)
        for _, gg in g.groupby(["band", "chunk"], sort=False)
    ]
    if not parts:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return pd.concat(parts, ignore_index=True).drop_duplicates(["a", "b"])


# ------------------------------------------------------- connected components
# Near-dup CLUSTERS from the verified pair graph: distributed min-label
# propagation (each round: spread every node's label along its edges,
# take the min per node). Labels only decrease, so equal label-sums
# between rounds ⟺ converged — a cheap aggregate, no driver graph.


def compact_blocks(ds, num_parts: int):
    """Collapse an over-fragmented MATERIALIZED Dataset to ~num_parts
    blocks before an iterative pipeline consumes it. Upstream groupby
    fan-out can hand a 25-row pair graph over in 100+ near-empty blocks,
    and every power-iteration round then pays per-block scheduling cost
    on TWO shuffles — at sf0.01 this was 124 s of pure overhead for a
    47-node graph. At 100 TB ``num_parts`` is data-sized (rows/4k), so
    the repartition is a no-op there and a one-off tiny exchange here."""
    if ds.num_blocks() > 2 * num_parts:
        return ds.repartition(num_parts).materialize()
    return ds


def edges_both_ways(batch: pa.Table) -> pa.Table:
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    if len(a) and (a.min() < 0 or b.min() < 0):
        # dst = -1 marks label rows downstream; negative node ids would be
        # misclassified and corrupt every touched component
        raise ValueError("label propagation requires non-negative node ids")
    return pa.table(
        {
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        }
    )


def spread_labels_partition(t: pa.Table) -> pa.Table:
    """Partition of the src-keyed cogroup (label rows have dst = -1):
    emit (node=dst, lbl) along every edge plus (node=src, lbl) itself.
    Arrow in/out (this kernel runs every label-prop round — the pandas
    group conversion was pure overhead); the label side is unique per
    src, so the edge join is one sorted searchsorted."""
    if "kpart" in t.column_names:
        t = t.drop_columns(["kpart"])
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    lbl = t["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_lbl = dst < 0
    lsrc, llbl = src[is_lbl], lbl[is_lbl]
    esrc, edst = src[~is_lbl], dst[~is_lbl]
    nodes, labels = [lsrc], [llbl]
    if esrc.size and lsrc.size:
        order = np.argsort(lsrc, kind="stable")
        ls, lv = lsrc[order], llbl[order]
        pos = np.minimum(np.searchsorted(ls, esrc), ls.size - 1)
        ok = ls[pos] == esrc
        nodes.append(edst[ok])
        labels.append(lv[pos[ok]])
    return pa.table({
        "node": pa.array(np.concatenate(nodes), pa.int64()),
        "lbl": pa.array(np.concatenate(labels), pa.int64()),
    })


def label_prop_components(pairs_ds, max_rounds: int = 64,
                          num_parts: int = 64):
    """(a, b) pair Dataset → (doc_id, rep) where rep is the min doc_id of
    the connected component. Rounds are two pair-sized shuffles each;
    converges in component-diameter rounds (near-dup clusters are
    shallow). Raises if ``max_rounds`` is exhausted before convergence —
    silently split components would disagree with the transitive-closure
    oracle. Node ids must be non-negative (checked)."""
    import ray.data

    from .index_build import add_kpart

    # ONE upstream execution: edges feed both the initial labels and the
    # per-round message stream
    edges = pairs_ds.map_batches(
        edges_both_ways, batch_format="pyarrow"
    ).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "rep": pa.array([], pa.int64())})
        )
    # partition count follows the data (~4k edge rows per partition):
    # a toy graph runs 1-2 tasks per round instead of 64 near-empty
    # ones; a 100 TB graph keeps the full ``num_parts`` fan-out
    num_parts = max(1, min(num_parts, edges.count() // 4096 + 1))
    edges = compact_blocks(edges, num_parts)

    labels = (
        edges.map_batches(
            lambda t: pa.table({"src": t["src"], "lbl": t["src"]}),
            batch_format="pyarrow",
        )
        .groupby("src")
        .min("lbl")
        .map_batches(
            lambda t: t.rename_columns(["src", "lbl"]), batch_format="pyarrow"
        )
        .materialize()
    )
    # static edge rows: hash-partitioned ONCE (the kpart of a row never
    # changes; re-hashing |2E| rows every round was pure waste)
    e_rows = (
        edges.map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "lbl": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .map_batches(
            add_kpart, fn_kwargs={"num_parts": num_parts, "cols": ("src",)},
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        lab_rows = labels.map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                    "lbl": t["lbl"],
                }
            ),
            batch_format="pyarrow",
        ).map_batches(
            add_kpart, fn_kwargs={"num_parts": num_parts, "cols": ("src",)},
            batch_format="pyarrow",
        )
        msgs = (
            e_rows.union(lab_rows)
            .groupby("kpart")
            .map_groups(spread_labels_partition, batch_format="pyarrow")
        )
        labels = (
            msgs.groupby("node")
            .min("lbl")
            .map_batches(
                lambda t: t.rename_columns(["src", "lbl"]), batch_format="pyarrow"
            )
            .materialize()
        )
        cur_sum = labels.sum("lbl")
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds "
            "(component diameter exceeds max_rounds)"
        )
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "rep"]), batch_format="pyarrow"
    )


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Batched SimHash: tokens flattened across the batch, ONE md5-64
    pass over the batch's DISTINCT tokens (pd.factorize + DuckDB —
    functions/hashing.py), then 64 bincount bit-planes per doc instead
    of a per-doc Python loop. Bit-identical to per-doc
    :func:`simhash64` (tested)."""
    from ..functions.hashing import stable_hash64_many

    texts = batch[text_col].to_pylist()
    n_docs = len(texts)
    flat_tok, flat_doc = [], []
    for d, t in enumerate(texts):
        toks = tokenize_simple(t or "")
        flat_tok.extend(toks)
        flat_doc.extend([d] * len(toks))
    sim = np.zeros(n_docs, dtype=np.uint64)
    if flat_tok:
        codes, uniques = pd.factorize(
            pd.Index(np.asarray(flat_tok, dtype=object)))
        h_uniq = stable_hash64_many(list(uniques))
        # tf per (doc, distinct token): group the flat rows once
        key = np.asarray(flat_doc, dtype=np.int64) * len(uniques) + codes
        ukey, tf = np.unique(key, return_counts=True)
        udoc = (ukey // len(uniques)).astype(np.int64)
        huu = h_uniq[ukey % len(uniques)]
        # per-doc weighted bit sums: acc_bit = 2*Σ(tf where bit set) - Σtf
        tot = np.bincount(udoc, weights=tf, minlength=n_docs)
        for b in range(64):
            mask = ((huu >> np.uint64(b)) & np.uint64(1)).astype(np.float64)
            s = np.bincount(udoc, weights=tf * mask, minlength=n_docs)
            sim |= ((2.0 * s - tot) > 0).astype(np.uint64) << np.uint64(b)
        # docs with zero tokens keep simhash 0 (bincount already does)
    chunks = {
        c: ((sim >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        for c in range(4)
    }
    out = batch.append_column("simhash", pa.array(sim, pa.uint64()))
    for c in range(4):
        out = out.append_column(f"chunk{c}", pa.array(chunks[c], pa.int64()))
    return out


def emit_simhash_bands(batch: pa.Table) -> pa.Table:
    """Signature rows → 4 band rows per doc: (band c, 16-bit chunk value,
    doc_id, full simhash). The signature travels WITH the band row so the
    Hamming verify happens inside the band group — one shuffle, no second
    join."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    sims = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    n = len(ids)
    parts = []
    for c in range(4):
        chunk = ((sims >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        parts.append((np.full(n, c, np.int64), chunk, ids, sims.view(np.int64)))
    return pa.table(
        {
            "band": pa.array(np.concatenate([p[0] for p in parts]), pa.int64()),
            "chunk": pa.array(np.concatenate([p[1] for p in parts]), pa.int64()),
            "doc_id": pa.array(np.concatenate([p[2] for p in parts]), pa.int64()),
            "simhash_i": pa.array(np.concatenate([p[3] for p in parts]), pa.int64()),
        }
    )


def simhash_band_pairs(group: pd.DataFrame, max_hamming: int = 3,
                       max_bucket: int = MAX_BUCKET) -> pd.DataFrame:
    """(band, chunk) group → Hamming-verified pairs (a < b). Vectorized
    popcount over the XOR of all in-bucket signature pairs; deterministic
    sorted-prefix truncation for degenerate buckets."""
    dd = group.drop_duplicates("doc_id")
    g = dd.sort_values("doc_id").head(max_bucket)
    if len(dd) > max_bucket:
        key = (
            (int(g["band"].iloc[0]), int(g["chunk"].iloc[0]))
            if "band" in g.columns and len(g)
            else "<chunk>"
        )
        _audit_truncation("simhash-band", key, len(g), len(dd) - len(g))
    ids = g["doc_id"].to_numpy().astype(np.int64)
    sims = g["simhash_i"].to_numpy().astype(np.int64).view(np.uint64)
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    iu = np.triu_indices(n, k=1)
    x = sims[iu[0]] ^ sims[iu[1]]
    # vectorized popcount via byte-view + unpackbits
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
    keep = ham <= max_hamming
    return pd.DataFrame(
        {
            "a": pd.Series(ids[iu[0][keep]], dtype="int64"),
            "b": pd.Series(ids[iu[1][keep]], dtype="int64"),
        }
    )


def simhash_pairs(sim_df: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    """Candidate pairs sharing any 16-bit chunk, Hamming-verified.
    (Driver-side reference implementation — kept as the pytest oracle for
    the distributed band path in q_simhash_pairs.)"""
    pairs = set()
    for c in range(4):
        for _, g in sim_df.groupby(f"chunk{c}"):
            ids = g["doc_id"].tolist()
            hs = g["simhash"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    x, y = sorted((ids[i], ids[j]))
                    if (x, y) in pairs:
                        continue
                    if hamming64(int(hs[i]), int(hs[j])) <= max_hamming:
                        pairs.add((x, y))
    out = sorted(pairs)
    return pd.DataFrame(
        {"a": [p[0] for p in out], "b": [p[1] for p in out]}
    )


def keep_latest(ds, key_cols, ts_col: str, tie_col: str, num_parts: int = 64):
    """Snapshot / recrawl dedup: keep each key's NEWEST row — e.g. the
    latest capture per url in a Common-Crawl-style corpus where re-crawls
    append rows with fresh ``warc_ts``.

    Winner per key = lexicographic max of (ts_col, tie_col); the tie
    column makes the result deterministic when timestamps collide.

    Scale shape (combiner pattern, same as the exact-dedup path): a
    per-BATCH vectorized reduce first — a batch's duplicate captures
    collapse before anything moves — then ONE key-hash exchange of the
    per-batch survivors (``add_kpart``, one task per partition, not per
    key) and a per-partition final reduce. Full rows travel only for
    batch survivors; nothing is broadcast and no driver state exists, so
    payload columns (html bytes) ride along untouched.
    """
    from .index_build import add_kpart

    key_cols = list(key_cols)
    sort_cols = key_cols + [ts_col, tie_col]

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort")
        return df.drop_duplicates(subset=key_cols, keep="last")

    partial = ds.map_batches(_reduce, batch_format="pandas")
    parted = partial.map_batches(
        add_kpart,
        fn_kwargs={"num_parts": num_parts, "cols": tuple(key_cols)},
        batch_format="pyarrow",
    )
    out = parted.groupby("kpart").map_groups(_reduce, batch_format="pandas")
    return out.drop_columns(["kpart"])


def containment_bucket_pairs_partition(group: pd.DataFrame,
                                       max_bucket: int = MAX_BUCKET) -> pd.DataFrame:
    """sh-hash partition of marked shingle rows (role 1 = the contained
    side's df-ascending prefix, role 0 = full postings): DIRECTIONAL
    candidate pairs (a contained-in b) from every bucket — a ranges over
    the bucket's prefix rows, b over its full rows, a ≠ b. Lossless by
    the prefix lemma: containment(a→b) ≥ t needs overlap ≥ ⌈t·|S_a|⌉, so
    b must hit a's first |S_a| − ⌈t·|S_a|⌉ + 1 shingles. Degenerate
    buckets truncate each side to the sorted doc_id prefix, audited."""
    g = _drop_kpart(group)
    parts = []
    for sh_val, gg in g.groupby("sh", sort=False):
        role = gg["role"].to_numpy()
        a_all = np.sort(gg.loc[role == 1, "doc_id"].unique()).astype(np.int64)
        b_all = np.sort(gg.loc[role == 0, "doc_id"].unique()).astype(np.int64)
        a_ids, b_ids = a_all[:max_bucket], b_all[:max_bucket]
        if len(a_all) > max_bucket or len(b_all) > max_bucket:
            _audit_truncation(
                "containment-prefix", int(sh_val),
                len(a_ids) + len(b_ids),
                (len(a_all) - len(a_ids)) + (len(b_all) - len(b_ids)),
            )
        if len(a_ids) == 0 or len(b_ids) == 0:
            continue
        aa = np.repeat(a_ids, len(b_ids))
        bb = np.tile(b_ids, len(a_ids))
        keep = aa != bb
        if keep.any():
            parts.append(pd.DataFrame({"a": aa[keep], "b": bb[keep]}))
    if not parts:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return (
        pd.concat(parts, ignore_index=True)
        .drop_duplicates(["a", "b"])
        .astype({"a": "int64", "b": "int64"})
    )


def containment_partition(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Partition of attached DIRECTIONAL pair sides → verified
    containments: |S_a ∩ S_b| / |S_a| ≥ t (denominator is the CONTAINED
    side — the asymmetric complement of jaccard_partition, catching
    excerpt/quote relationships whose symmetric Jaccard is low)."""
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "containment_x": pd.Series(dtype="int64")})
    g = _drop_kpart(group)
    if "doc_id" in g.columns:
        g = g.drop_duplicates(["a", "b", "doc_id"])
    if len(g) < 2:
        return empty
    g = g.sort_values(["a", "b"], kind="mergesort")
    a = g["a"].to_numpy()
    b = g["b"].to_numpy()
    doc = g["doc_id"].to_numpy()
    shs = g["shs"].to_numpy()
    ns = g["n"].to_numpy()
    change = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [len(g)]])
    oa, ob, oc = [], [], []
    for s, e in zip(starts, ends):
        if e - s != 2:
            continue
        ia = s if doc[s] == a[s] else s + 1
        ib = s + 1 if ia == s else s
        if doc[ia] != a[s] or doc[ib] != b[s]:
            continue
        sa = np.asarray(shs[ia], dtype=np.int64)
        sb = np.asarray(shs[ib], dtype=np.int64)
        na = int(ns[ia])
        if na <= 0:
            continue
        inter = int(np.intersect1d(sa, sb, assume_unique=True).size)
        cont = inter / na
        if cont >= threshold:
            oa.append(int(a[s]))
            ob.append(int(b[s]))
            oc.append(int(np.floor(cont * 10000 + 0.5)))
    return pd.DataFrame(
        {
            "a": pd.Series(oa, dtype="int64"),
            "b": pd.Series(ob, dtype="int64"),
            "containment_x": pd.Series(oc, dtype="int64"),
        }
    )


def grouped_pairs(keys: np.ndarray, values: np.ndarray, cap: int,
                  oversize: str = "truncate"):
    """All unordered (a, b) value pairs within each key group, with NO
    per-group Python loop: rows lexsort by (key, value), (key, value)
    duplicates drop, then pairs emit via one ``triu_indices`` gather per
    DISTINCT group size — at most ``cap`` vectorized iterations however
    many groups the partition holds.

    ``oversize``: what a group larger than ``cap`` does —
    - ``"truncate"``: keep its ``cap`` SMALLEST values (covisit's
      deterministic per-user item cap, mirrored in SQL by
      ``row_number() OVER (ORDER BY value) <= cap``);
    - ``"skip"``: drop the whole group (related_docs' non-discriminative
      -keyword rule, mirrored by ``HAVING count(*) <= cap``).

    Returns (a, b) int64 arrays with a < b within each pair."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if len(keys) == 0:
        return empty
    keys = np.asarray(keys)
    values = np.asarray(values, dtype=np.int64)
    order = np.lexsort((values, keys))
    k = keys[order]
    v = values[order]
    first = np.ones(len(k), dtype=bool)
    first[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
    k = k[first]
    v = v[first]
    newg = np.ones(len(k), dtype=bool)
    newg[1:] = k[1:] != k[:-1]
    starts = np.nonzero(newg)[0]
    ends = np.concatenate([starts[1:], [len(k)]])
    raw = ends - starts
    if oversize == "skip":
        keep = raw <= cap
        starts, raw = starts[keep], raw[keep]
        sizes = raw
    else:
        sizes = np.minimum(raw, cap)
    out_a, out_b = [], []
    for s in np.unique(sizes):
        s = int(s)
        if s < 2:
            continue
        gs = starts[sizes == s]
        idx = gs[:, None] + np.arange(s)[None, :]
        vals = v[idx]                       # (groups, s) — the s smallest
        ai, bi = np.triu_indices(s, 1)
        out_a.append(vals[:, ai].ravel())
        out_b.append(vals[:, bi].ravel())
    if not out_a:
        return empty
    return (
        np.concatenate(out_a).astype(np.int64),
        np.concatenate(out_b).astype(np.int64),
    )
