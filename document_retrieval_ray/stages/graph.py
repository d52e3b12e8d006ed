"""Distributed graph analytics over document-similarity graphs.

The near-dup pipelines produce a pair graph (stages/dedup.py builds it,
``label_prop_components`` collapses it into clusters); this module adds
POWER-ITERATION analytics over the same graph — here integer PageRank,
the canonical "which document is the hub of its duplication cluster"
signal (pick-the-canonical-copy in a crawl dedup, template detection).

Everything is EXACT INTEGER arithmetic so a SQL oracle reproduces it
bit-for-bit regardless of summation order (the repo-wide fixed-point
discipline):

- scores live on a ``SCALE = 10^12`` integer grid; the initial mass per
  node is ``SCALE // n``;
- an edge (j → i) carries ``s_j // deg_j`` (integer division);
- the damping update is ``s_i' = (15·base + 85·incoming_i) // 100``
  (i.e. d = 0.85 with the teleport mass pinned to the INITIAL uniform
  base, the "personalized to uniform" variant — deliberately chosen so
  every quantity stays integral);
- undirected graphs have no dangling nodes (every node has in-edges), so
  no dangling-mass redistribution is needed.

Distribution (mirrors ``label_prop_components``): edge rows are
hash-partitioned by src ONCE and reused every round; a round is two
pair-sized exchanges — (scores ∪ edges) cogrouped by src emit
per-edge contributions, then one groupby(dst).sum. Per-src degree is
derived IN-PARTITION (all edges of a src share its hash partition), so
no separate degree join ever ships."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import compact_blocks, edges_both_ways
from .index_build import add_kpart
from ..util import arrow_blocks

PAGERANK_SCALE = 10 ** 12
PAGERANK_DAMP_NUM = 85    # d = 0.85 as an integer fraction
PAGERANK_DAMP_DEN = 100


def pagerank_contrib_partition(t: pa.Table) -> pa.Table:
    """src-keyed partition of edge rows (s = -1) ∪ score rows (dst = -1):
    emit (node = dst, c = s_src // deg_src) per edge. deg is computed
    in-partition — the src hash colocates all of a node's out-edges.
    Arrow in/out (runs every power iteration): degree = run lengths of
    the src-sorted edges, score join = one searchsorted (scores are
    unique per src)."""
    if "kpart" in t.column_names:
        t = t.drop_columns(["kpart"])
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    sv_all = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_score = dst < 0
    ssrc, sval = src[is_score], sv_all[is_score]
    esrc, edst = src[~is_score], dst[~is_score]
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "c": pa.array([], pa.int64())})
    if not esrc.size or not ssrc.size:
        return empty
    order = np.argsort(esrc, kind="stable")
    esrc, edst = esrc[order], edst[order]
    uniq, counts = np.unique(esrc, return_counts=True)
    deg = np.repeat(counts, counts)
    so = np.argsort(ssrc, kind="stable")
    ss, sv = ssrc[so], sval[so]
    pos = np.minimum(np.searchsorted(ss, esrc), ss.size - 1)
    ok = ss[pos] == esrc
    if not ok.any():
        return empty
    c = sv[pos[ok]] // deg[ok]
    return pa.table({"node": pa.array(edst[ok], pa.int64()),
                     "c": pa.array(c, pa.int64())})


def pagerank_integer(pairs_ds, iters: int = 5, num_parts: int = 64,
                     scale: int = PAGERANK_SCALE):
    """(a, b) undirected pair Dataset → (doc_id, pr) integer PageRank
    after ``iters`` fixed power iterations (see module docstring for the
    exact integer recurrence a SQL oracle can replay)."""
    import ray.data

    edges = pairs_ds.map_batches(
        edges_both_ways, batch_format="pyarrow"
    ).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "pr": pa.array([], pa.int64())})
        )
    # partition count follows the data: ~4k edge rows per partition, so a
    # toy graph runs 1-2 tasks per iteration while a 100 TB near-dup
    # graph keeps (and should raise) the full fan-out via ``num_parts``
    num_parts = max(1, min(num_parts, edges.count() // 4096 + 1))
    edges = compact_blocks(edges, num_parts)
    nodes = (
        edges.groupby("src").count()
        .map_batches(lambda t: t.select(["src"]), batch_format="pyarrow")
        .materialize()
    )
    n = nodes.count()
    base = scale // n

    # static edge rows, hash-partitioned once (kpart never changes)
    e_rows = edges.map_batches(
        lambda t: pa.table({
            "src": t["src"], "dst": t["dst"],
            "s": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
        }),
        batch_format="pyarrow",
    ).map_batches(
        add_kpart, fn_kwargs={"num_parts": num_parts, "cols": ("src",)},
        batch_format="pyarrow",
    ).materialize()

    scores = nodes.map_batches(
        lambda t: pa.table({
            "src": t["src"],
            "s": pa.array(np.full(t.num_rows, base, np.int64), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    for _ in range(iters):
        s_rows = scores.map_batches(
            lambda t: pa.table({
                "src": t["src"],
                "dst": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                "s": t["s"],
            }),
            batch_format="pyarrow",
        ).map_batches(
            add_kpart, fn_kwargs={"num_parts": num_parts, "cols": ("src",)},
            batch_format="pyarrow",
        )
        incoming = (
            e_rows.union(s_rows)
            .groupby("kpart")
            .map_groups(pagerank_contrib_partition, batch_format="pyarrow")
            .groupby("node")
            .sum("c")
        )
        scores = incoming.map_batches(
            lambda t: pa.table({
                "src": t["node"],
                "s": pa.array(
                    (
                        (PAGERANK_DAMP_DEN - PAGERANK_DAMP_NUM) * base
                        + PAGERANK_DAMP_NUM
                        * t["sum(c)"].to_numpy(zero_copy_only=False)
                    ) // PAGERANK_DAMP_DEN,
                    pa.int64(),
                ),
            }),
            batch_format="pyarrow",
        ).materialize()
    return scores.map_batches(
        lambda t: t.rename_columns(["doc_id", "pr"]), batch_format="pyarrow"
    )


def wedge_rows_partition(t: pa.Table) -> pa.Table:
    """center-keyed partition of both-ways edges: for each center u emit
    the wedges (v, w) over u's neighbor pairs with u < v < w — the
    smallest-vertex orientation, so each triangle is generated by
    exactly ONE center and never needs a /3 correction. Wedge volume is
    Σ C(deg⁺(u), 2) over the u-smallest orientation — the standard
    Cohen-MR bound, quadratic only in the ORIENTED degree (hubs shed
    their wedges to smaller-id neighbors). Arrow in/out."""
    if "kpart" in t.column_names:
        t = t.drop_columns(["kpart"])
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = dst > src  # oriented: only neighbors above the center
    src, dst = src[keep], dst[keep]
    empty = pa.table({"v": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64())})
    if not len(src):
        return empty
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    # per-center neighbor pair enumeration, vectorized per center run
    change = np.flatnonzero(src[1:] != src[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(src)]])
    vs, ws = [], []
    for s_, e_ in zip(starts, ends):
        nb = dst[s_:e_]  # sorted ascending, all > center
        if nb.size < 2:
            continue
        iu = np.triu_indices(nb.size, k=1)
        vs.append(nb[iu[0]])
        ws.append(nb[iu[1]])
    if not vs:
        return empty
    return pa.table({
        "v": pa.array(np.concatenate(vs), pa.int64()),
        "w": pa.array(np.concatenate(ws), pa.int64()),
    })


def _pack_pairs(v: np.ndarray, w: np.ndarray) -> np.ndarray:
    """(v, w) int64 pairs → void16 keys: byte-wise equality is pair
    equality, which is all membership needs (np.isin sorts by an
    arbitrary-but-total byte order)."""
    a = np.empty(len(v), dtype=[("v", "<i8"), ("w", "<i8")])
    a["v"], a["w"] = v, w
    return a.view("V16").ravel()


def triangle_close_partition(t: pa.Table) -> pa.Table:
    """(v, w)-hash partition of wedge rows ∪ edge-marker rows
    (is_edge = 1): triangles closed in-partition = wedges whose (v, w)
    is an edge. Emits one partial-count row. Arrow in/out; membership is
    one vectorized np.isin over packed pair keys (the per-row Python
    set-lookup loop dominated this kernel)."""
    if "kpart" in t.column_names:
        t = t.drop_columns(["kpart"])
    is_e = t["is_edge"].to_numpy(zero_copy_only=False).astype(np.int64) == 1
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    ev, ew = v[is_e], w[is_e]
    if not ev.size:
        return pa.table({"n_triangles": pa.array([], pa.int64())})
    wv, ww = v[~is_e], w[~is_e]
    n = (
        int(np.isin(_pack_pairs(wv, ww), _pack_pairs(ev, ew)).sum())
        if wv.size else 0
    )
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


def count_triangles(pairs_ds, num_parts: int = 64):
    """Exact distributed triangle count over an undirected (a, b) pair
    Dataset — the Cohen wedge-closing plan: one center-keyed exchange
    generates oriented wedges, one (v, w)-keyed exchange closes them
    against the edge set. Returns the integer count."""
    import ray.data

    from .dedup import edges_both_ways
    from .index_build import add_kpart

    edges = pairs_ds.map_batches(
        edges_both_ways, batch_format="pyarrow"
    ).materialize()
    if edges.count() == 0:
        return 0
    num_parts = max(1, min(num_parts, edges.count() // 4096 + 1))
    edges = compact_blocks(edges, num_parts)
    wedges = (
        edges.map_batches(
            add_kpart, fn_kwargs={"num_parts": num_parts, "cols": ("src",)},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(wedge_rows_partition, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "is_edge",
                pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            ),
            batch_format="pyarrow",
        )
    )
    edge_rows = edges.map_batches(
        lambda t: pa.table({
            "v": t["src"], "w": t["dst"],
            "is_edge": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        }),
        batch_format="pyarrow",
    ).map_batches(
        # canonical v < w once (both-ways edges carry each twice)
        lambda t: t.filter(pc.less(t["v"], t["w"])),
        batch_format="pyarrow",
    )
    partials = (
        wedges.union(edge_rows)
        .map_batches(
            add_kpart, fn_kwargs={"num_parts": num_parts, "cols": ("v", "w")},
            batch_format="pyarrow",
        )
        .groupby("kpart")
        .map_groups(triangle_close_partition, batch_format="pyarrow")
    )
    return int(partials.sum("n_triangles") or 0)
