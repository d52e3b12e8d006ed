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
    ``add_kpart`` map are already safe (it is an Arrow-format map).

    Also strips schema metadata: see :func:`from_pandas_clean`."""
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def read_parquet_clean(path, *, columns=None, **kw):
    """``ray.data.read_parquet`` with an explicit, metadata-free schema.

    Parquet files written through pandas embed a ``b'pandas'`` blob in the
    file schema; Ray's read operator then unifies per-fragment schemas and
    — because pyarrow Schemas with metadata are unhashable — logs "Failed
    to hash the schemas (for deduplication)" and skips the dedup fast
    path. Reading the footer schema once, stripping metadata, and passing
    it explicitly avoids the unify entirely. ``columns`` prunes the schema
    the same way it prunes the read."""
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    import ray.data

    if "schema" not in kw:
        first = path[0] if isinstance(path, (list, tuple)) else path
        if _os.path.isdir(first):
            parts = sorted(
                f for f in _os.listdir(first) if f.endswith(".parquet")
            )
            first = _os.path.join(first, parts[0]) if parts else None
        if first is not None and _os.path.exists(first):
            sch = _pq.read_schema(first).remove_metadata()
            fields = [pa.field(f.name, f.type) for f in sch]
            if columns is not None:
                by_name = {f.name: f for f in fields}
                fields = [by_name[c] for c in columns]
            kw["schema"] = pa.schema(fields)
    return ray.data.read_parquet(
        path, columns=list(columns) if columns is not None else None, **kw
    )


def from_pandas_clean(df, **kw):
    """``pa.Table.from_pandas`` minus the ``b'pandas'`` schema metadata.

    pyarrow Schemas carrying metadata are UNHASHABLE (``Schema.__hash__``
    trips over the metadata dict), which defeats Ray Data's block-schema
    dedup on every reduce of an exchange — each block then re-unifies and
    re-serializes an ~800-byte metadata blob, and the executor logs
    "Failed to hash the schemas (for deduplication)" per occurrence. Every
    batch/group kernel that hands a pandas frame back to Ray should build
    its Arrow table through here."""
    import pyarrow as pa

    kw.setdefault("preserve_index", False)
    return pa.Table.from_pandas(df, **kw).replace_schema_metadata(None)
