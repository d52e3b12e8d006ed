"""Small shared runtime helpers (no ray.init here — sessions are owned by
the caller)."""

from __future__ import annotations


def default_pool(frac_of_budget: float = 0.5) -> int:
    """Default actor-pool size for callable-class stages.

    Leaves 2 CPUs of headroom for task stages (read/shuffle/write) —
    a pool that reserves every CPU deadlocks Ray Data's streaming
    executor — and splits the rest between up to two concurrent pools.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, int((cpus - 2) * frac_of_budget))
