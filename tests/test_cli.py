"""CLI driver (ray-job-submit surface): build → query → submission."""

import json
import os

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_cli_build_query_roundtrip(tiny_corpus, tmp_path, capsys):
    from document_retrieval_ray.cli import main

    index_dir = str(tmp_path / "cli_index")
    out_dir = str(tmp_path / "cli_results")

    rc = main(
        ["build", "--input", tiny_corpus["documents"], "--index", index_dir,
         "--no-cosine-norms"]
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built and all(v["n_docs"] > 0 for v in built.values())

    rc = main(
        ["query", "--index", index_dir, "--queries", tiny_corpus["queries"],
         "--out", out_dir, "--compat", "reference", "--submission"]
    )
    assert rc == 0
    import pyarrow.parquet as pq

    res = pq.read_table(out_dir).to_pandas()
    assert len(res) > 0
    assert set(res.columns) == {"query_id", "rank", "url", "score", "score_x"}
    sub_files = os.listdir(out_dir + "_submission")
    assert sub_files
    sub = pd.concat(
        [pd.read_csv(os.path.join(out_dir + "_submission", f)) for f in sub_files]
    )
    assert {"query_id", "docids"} <= set(sub.columns)


@pytest.mark.usefixtures("ray_session")
def test_cli_append_query_compact_roundtrip(tiny_corpus, tmp_path, capsys):
    """append routes the next query through the generational scorer;
    compact produces a plain index with the same doc count."""
    import pyarrow.parquet as pq

    from document_retrieval_ray.cli import main

    docs = pq.read_table(tiny_corpus["documents"])
    half = docs.num_rows // 2
    base_p = str(tmp_path / "base.parquet")
    delta_p = str(tmp_path / "delta.parquet")
    pq.write_table(docs.slice(0, half), base_p)
    pq.write_table(docs.slice(half), delta_p)

    index_dir = str(tmp_path / "cli_incr_index")
    assert main(["build", "--input", base_p, "--index", index_dir,
                 "--no-cosine-norms"]) == 0
    capsys.readouterr()
    assert main(["append", "--input", delta_p, "--index", index_dir]) == 0
    appended = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert appended["generations"] == ["gen-00001"]

    out_dir = str(tmp_path / "cli_incr_results")
    assert main(["query", "--index", index_dir, "--queries",
                 tiny_corpus["queries"], "--out", out_dir]) == 0
    res = pq.read_table(out_dir).to_pandas()
    assert len(res) > 0
    assert set(res.columns) == {"query_id", "rank", "url", "score", "score_x"}

    compact_dir = str(tmp_path / "cli_compacted")
    capsys.readouterr()
    assert main(["compact", "--index", index_dir, "--out", compact_dir]) == 0
    compacted = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sum(v["n_docs"] for v in compacted.values()) == docs.num_rows


@pytest.mark.usefixtures("ray_session")
def test_cli_stats_lineage(tiny_corpus, tmp_path, capsys):
    """`stats` surfaces the per-partition lineage + metrics: committed
    manifests with docs/terms/postings and the input fingerprint, plus
    artifact shard counts — and fails loudly on a non-index dir."""
    from document_retrieval_ray.cli import main

    index_dir = str(tmp_path / "idx")
    assert main(["build", "--input", tiny_corpus["documents"],
                 "--index", index_dir]) == 0
    capsys.readouterr()
    assert main(["stats", "--index", index_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["generations"] == []
    assert out["partitions"], "at least one committed language partition"
    for lang, m in out["partitions"].items():
        assert m["committed"] is True, lang
        for k in ("n_docs", "n_terms", "n_postings", "avgdl",
                  "input_fingerprint"):
            assert k in m, (lang, k)
    assert out["artifacts"]["postings"]["parquet_files"] > 0
    assert out["artifacts"]["postings"]["bytes"] > 0
    with pytest.raises(FileNotFoundError):
        main(["stats", "--index", str(tmp_path / "nope")])


def test_cli_delete_then_query_and_stats(tiny_corpus, tmp_path, capsys):
    """delete subcommand tombstones urls; query then excludes them; stats
    reports the tombstone counts; compact applies them."""
    import pyarrow.parquet as pq

    from document_retrieval_ray.cli import main

    index_dir = str(tmp_path / "del_index")
    out_dir = str(tmp_path / "del_results")

    rc = main(["build", "--input", tiny_corpus["documents"],
               "--index", index_dir, "--no-cosine-norms"])
    assert rc == 0
    capsys.readouterr()

    docs = pq.read_table(tiny_corpus["documents"], columns=["url"])
    victims = sorted(set(docs["url"].to_pylist()))[:4]
    urls_file = tmp_path / "gone.txt"
    urls_file.write_text("\n".join(victims[1:]) + "\n")
    rc = main(["delete", "--index", index_dir, "--url", victims[0],
               "--urls-file", str(urls_file)])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {"tombstoned": 4, "requested": 4}

    rc = main(["query", "--index", index_dir,
               "--queries", tiny_corpus["queries"], "--out", out_dir])
    assert rc == 0
    capsys.readouterr()
    res = pq.read_table(out_dir).to_pandas()
    assert len(res) > 0 and not set(res["url"]) & set(victims)

    rc = main(["stats", "--index", index_dir])
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sum(st["tombstones"].values()) == 4

    out2 = str(tmp_path / "del_compacted")
    rc = main(["compact", "--index", index_dir, "--out", out2])
    assert rc == 0
    capsys.readouterr()
    rc = main(["stats", "--index", out2])
    assert rc == 0
    st2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st2["tombstones"] == {}
    n_before = sum(
        v["n_docs"] for v in st["partitions"].values() if "n_docs" in v
    )
    n_after = sum(
        v["n_docs"] for v in st2["partitions"].values() if "n_docs" in v
    )
    assert n_after == n_before - 4


@pytest.mark.usefixtures("ray_session")
def test_cli_term_buckets_and_task_pool(tiny_corpus, tmp_path, capsys):
    """term-buckets builds a bucket layout; query --term-buckets and
    query --pool task both return the same rows as the plain path."""
    import pyarrow.parquet as pq

    from document_retrieval_ray.cli import main

    index_dir = str(tmp_path / "tb_index")
    assert main(["build", "--input", tiny_corpus["documents"],
                 "--index", index_dir, "--no-cosine-norms"]) == 0
    capsys.readouterr()

    def run_query(extra, out):
        assert main(["query", "--index", index_dir, "--queries",
                     tiny_corpus["queries"], "--out", out] + extra) == 0
        capsys.readouterr()
        return (
            pq.read_table(out).to_pandas()
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        )

    plain = run_query([], str(tmp_path / "r_plain"))

    bdir = str(tmp_path / "tb_buckets")
    assert main(["term-buckets", "--index", index_dir, "--out", bdir,
                 "--num-buckets", "3"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["buckets"] == 3

    sharded = run_query(["--term-buckets", bdir], str(tmp_path / "r_tb"))
    task = run_query(["--pool", "task"], str(tmp_path / "r_task"))
    for got in (sharded, task):
        pd.testing.assert_frame_equal(
            got[["query_id", "rank", "url", "score_x"]],
            plain[["query_id", "rank", "url", "score_x"]],
        )


@pytest.mark.usefixtures("ray_session")
def test_cli_fuzzy_query(tiny_corpus, tmp_path, capsys):
    """--fuzzy expands a typo'd token against the index vocabulary: the
    misspelled query returns 0 rows plain but >0 rows fuzzy, and an
    exact token's fuzzy result still includes its exact-match docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from document_retrieval_ray.cli import main

    index_dir = str(tmp_path / "fuzzy_index")
    assert main(["build", "--input", tiny_corpus["documents"],
                 "--index", index_dir, "--no-cosine-norms"]) == 0
    capsys.readouterr()

    q_path = str(tmp_path / "fuzzy_queries.parquet")
    pq.write_table(
        pa.table(
            {
                "query_id": ["fz1"],
                "query": ["entok3q"],  # not in vocab; dist 1 from entok3
                "lang": ["en"],
            }
        ),
        q_path,
    )

    out_plain = str(tmp_path / "fuzzy_out_plain")
    assert main(["query", "--index", index_dir, "--queries", q_path,
                 "--out", out_plain]) == 0
    # 0 results: the sink writes nothing (or an empty dir)
    import os as _os

    n_plain = (
        len(pq.read_table(out_plain))
        if _os.path.isdir(out_plain) and _os.listdir(out_plain)
        else 0
    )
    assert n_plain == 0

    out_fuzzy = str(tmp_path / "fuzzy_out")
    assert main(["query", "--index", index_dir, "--queries", q_path,
                 "--out", out_fuzzy, "--fuzzy"]) == 0
    res = pq.read_table(out_fuzzy).to_pandas()
    assert len(res) > 0
    assert set(res["query_id"]) == {"fz1"}

    # --fuzzy composes with the warm-task-pool serving mode: identical rows
    out_task = str(tmp_path / "fuzzy_out_task")
    assert main(["query", "--index", index_dir, "--queries", q_path,
                 "--out", out_task, "--fuzzy", "--pool", "task"]) == 0
    task_res = (
        pq.read_table(out_task).to_pandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        res.sort_values(["query_id", "rank"]).reset_index(drop=True),
        task_res,
    )


@pytest.mark.usefixtures("ray_session")
def test_cli_fuzzy_sees_generation_vocab(tiny_corpus, tmp_path, capsys):
    """--fuzzy expansion must read the generational global_df: a term
    first seen in an APPEND is matched by a typo'd fuzzy query."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from document_retrieval_ray.cli import main

    docs = pq.read_table(tiny_corpus["documents"])
    half = docs.num_rows // 2
    base_p = str(tmp_path / "fz_base.parquet")
    delta_p = str(tmp_path / "fz_delta.parquet")
    pq.write_table(docs.slice(0, half), base_p)
    delta = docs.slice(half)
    # the appended docs carry a vocabulary term the base never saw
    delta = delta.set_column(
        delta.schema.get_field_index("text"),
        "text",
        pa.array(["zzzuniq appended document"] * delta.num_rows,
                 pa.large_string()),
    )
    pq.write_table(delta, delta_p)

    index_dir = str(tmp_path / "fz_incr_index")
    assert main(["build", "--input", base_p, "--index", index_dir,
                 "--no-cosine-norms"]) == 0
    assert main(["append", "--input", delta_p, "--index", index_dir]) == 0
    capsys.readouterr()

    q_path = str(tmp_path / "fz_gen_queries.parquet")
    pq.write_table(
        pa.table(
            {
                "query_id": ["g1"],
                "query": ["zzzuniqx"],  # dist 1 from the appended term
                "lang": ["en"],
            }
        ),
        q_path,
    )
    out_dir = str(tmp_path / "fz_gen_out")
    assert main(["query", "--index", index_dir, "--queries", q_path,
                 "--out", out_dir, "--fuzzy"]) == 0
    res = pq.read_table(out_dir).to_pandas()
    assert len(res) > 0
    assert set(res["query_id"]) == {"g1"}
