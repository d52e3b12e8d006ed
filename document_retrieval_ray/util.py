"""Small shared runtime helpers (no ray.init here — sessions are owned by
the caller)."""

from __future__ import annotations


def default_pool(frac: float = 0.25) -> int:
    """Default actor-pool size for callable-class stages: a fixed FRACTION
    of cluster CPUs (proportional across cluster sizes, so N-vs-4N scaling
    measurements compare like with like), never the whole budget — a pool
    that reserves every CPU deadlocks Ray Data's streaming executor
    because read/shuffle/write task stages starve.

    Defaults: build stages use 0.25 each (two concurrent pools + task
    stages), the query scorer uses 0.5 (single pool).
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, int(cpus * frac))


def arrow_blocks(ds):
    """Convert pandas-formatted blocks back to Arrow (zero work beyond a
    per-block ``Table.from_pandas``). Ray Data 2.49's all-to-all
    sort/aggregate path over PANDAS blocks is pathologically slow — a
    256k-row ``map_groups`` → ``groupby.aggregate`` chain measured
    29.3 s vs 4.4 s with this hop at sf0.1 — so every
    ``map_groups(batch_format="pandas")`` output that feeds a Ray
    groupby / aggregate / sum should pass through here. Chains into an
    ``add_kpart`` map are already safe (it is an Arrow-format map)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")
