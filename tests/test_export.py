"""Resumable partitioned export (pipelines/export.py): commit/skip/rewrite
semantics and read-back integrity."""

import os
import shutil

import pandas as pd
import pytest
import ray.data

from document_retrieval_ray.pipelines.export import (
    SHARD_COL,
    _manifest_dir,
    _shard_dir,
    export_partitioned,
    read_export,
)
from document_retrieval_ray.state.manifest import read_manifest

SF = "/root/testdata/sf0.001"
NSH = 8


def _docs_ds():
    return ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


def _docs_df():
    return pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


@pytest.fixture
def out(tmp_path):
    return str(tmp_path / "export")


def test_full_export_round_trip(ray_session, out):
    counts = export_partitioned(
        _docs_ds(), out, num_shards=NSH, fingerprint="fp1"
    )
    exp = _docs_df()
    assert sum(counts.values()) == len(exp)
    assert set(counts) == set(range(NSH))
    got = (
        read_export(out, num_shards=NSH)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "text", "lang"]],
        exp.sort_values("doc_id").reset_index(drop=True),
    )


def test_resume_skips_committed_and_rewrites_uncommitted(ray_session, out):
    counts1 = export_partitioned(
        _docs_ds(), out, num_shards=NSH, fingerprint="fp1"
    )
    victim = next(s for s, n in counts1.items() if n > 0)
    # simulate a kill mid-write: manifest missing, junk partial file left
    os.remove(os.path.join(_manifest_dir(out, victim), "manifest.json"))
    with open(os.path.join(_shard_dir(out, victim), "junk.parquet~"), "w") as f:
        f.write("partial")
    committed_mtimes = {
        s: os.path.getmtime(_shard_dir(out, s))
        for s in range(NSH)
        if s != victim and os.path.isdir(_shard_dir(out, s))
    }
    with pytest.raises(RuntimeError, match="incomplete"):
        read_export(out, num_shards=NSH)

    counts2 = export_partitioned(
        _docs_ds(), out, num_shards=NSH, fingerprint="fp1"
    )
    assert counts2 == counts1
    # committed shards were never touched; the victim was cleaned + rewritten
    for s, mt in committed_mtimes.items():
        assert os.path.getmtime(_shard_dir(out, s)) == mt
    assert not os.path.exists(
        os.path.join(_shard_dir(out, victim), "junk.parquet~")
    )
    got = read_export(out, num_shards=NSH).to_pandas()
    assert len(got) == len(_docs_df())
    assert got["doc_id"].is_unique


def test_noop_resume_and_fingerprint_invalidation(ray_session, out):
    export_partitioned(_docs_ds(), out, num_shards=NSH, fingerprint="fp1")
    mt = {
        s: os.path.getmtime(_shard_dir(out, s))
        for s in range(NSH)
        if os.path.isdir(_shard_dir(out, s))
    }
    # same fingerprint: pure no-op (no dataset execution needed, dirs untouched)
    export_partitioned(_docs_ds(), out, num_shards=NSH, fingerprint="fp1")
    assert {
        s: os.path.getmtime(_shard_dir(out, s)) for s in mt
    } == mt
    # changed fingerprint: everything stale, full rewrite
    counts = export_partitioned(
        _docs_ds(), out, num_shards=NSH, fingerprint="fp2"
    )
    assert sum(counts.values()) == len(_docs_df())
    for s in range(NSH):
        assert read_manifest(_manifest_dir(out, s))["input_fingerprint"] == "fp2"


def test_shard_layout_deterministic(ray_session, out):
    """Same input → same per-shard row counts in independent exports
    (resume correctness depends on recomputing the identical layout)."""
    a = export_partitioned(
        _docs_ds(), out + "_a", num_shards=NSH, fingerprint="x"
    )
    b = export_partitioned(
        _docs_ds(), out + "_b", num_shards=NSH, fingerprint="x"
    )
    assert a == b
    shutil.rmtree(out + "_a")
    shutil.rmtree(out + "_b")


def test_string_key_sharding(ray_session, out):
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "lang"]
    )
    counts = export_partitioned(
        ds, out, num_shards=4, key_col="lang", fingerprint="s"
    )
    assert sum(counts.values()) == len(_docs_df())
    got = read_export(out, num_shards=4).to_pandas()
    assert SHARD_COL not in got.columns
