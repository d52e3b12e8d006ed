"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Deterministic ~250-doc synthetic corpus on disk (FIXTURES.md `tiny`)."""
    from document_retrieval_ray.sources.synth import write_corpus

    out = tmp_path_factory.mktemp("tiny_corpus")
    paths = write_corpus(str(out), num_docs=250, seed=42)
    return paths


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """~1500-doc corpus for end-to-end pipeline tests (FIXTURES.md `small`)."""
    from document_retrieval_ray.sources.synth import write_corpus

    out = tmp_path_factory.mktemp("small_corpus")
    paths = write_corpus(str(out), num_docs=1500, seed=7)
    return paths
