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
