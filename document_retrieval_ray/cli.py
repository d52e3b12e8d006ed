"""Command-line entry points (``ray job submit``-compatible driver).

    python -m document_retrieval_ray.cli build  --input docs.parquet --index /path/idx
    python -m document_retrieval_ray.cli query  --index /path/idx --queries q.parquet \
        --out /tmp/results [--compat reference|standard] [--method taat|wand]
    python -m document_retrieval_ray.cli cosine --index /path/idx --queries q.parquet \
        --out /tmp/results [--rerank]
    python -m document_retrieval_ray.cli append --input delta.parquet --index /path/idx
    python -m document_retrieval_ray.cli delete --index /path/idx --urls-file gone.txt
    python -m document_retrieval_ray.cli compact --index /path/idx --out /path/idx2
    python -m document_retrieval_ray.cli stats  --index /path/idx

On a cluster: ``ray job submit --working-dir . -- python -m
document_retrieval_ray.cli build ...`` — the module only calls
``ray.init`` when no session exists (the job driver/host may own one).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus=None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True)
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def _index_tokenizer(index_dir: str):
    """The tokenizer config the index was BUILT with, recovered from any
    committed manifest — query-side tokenization must match it or query
    terms silently miss the indexed vocabulary."""
    import os

    from .config import TokenizerConfig
    from .state.manifest import read_manifest

    mdir = os.path.join(index_dir, "manifests")
    for lang in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        m = read_manifest(os.path.join(mdir, lang))
        if m is not None and "tokenizer_mode" in m:
            # restore EVERY field, not just mode — an index built with
            # stopwords/min_token_len/bigram_langs must get matching
            # query-side tokenization (older manifests lack the extra
            # fields; dataclass defaults then apply)
            return TokenizerConfig(
                mode=m["tokenizer_mode"],
                stopwords=bool(m.get("tokenizer_stopwords", False)),
                min_token_len=int(m.get("tokenizer_min_token_len", 1)),
                bigram_langs=tuple(
                    m.get("tokenizer_bigram_langs", ("fr", "de", "es", "it"))
                ),
            )
    return TokenizerConfig()


def main(argv=None) -> int:
    common = argparse.ArgumentParser(add_help=False)
    # SUPPRESS: the subparser parses into the same namespace, and a plain
    # default=None would overwrite a value given BEFORE the subcommand
    # (argparse _SubParsersAction copies subparser defaults over parsed
    # main-parser values)
    common.add_argument("--num-cpus", type=int, default=argparse.SUPPRESS)
    p = argparse.ArgumentParser(prog="document_retrieval_ray", parents=[common])
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", parents=[common],
                       help="build (or resume) the inverted index")
    b.add_argument("--input", required=True, help="parquet corpus (url, text|html, lang)")
    b.add_argument("--index", required=True, help="index output directory")
    b.add_argument("--tokenizer", default="simple", choices=["simple", "reference"])
    b.add_argument("--extract-html", action="store_true")
    b.add_argument("--no-cosine-norms", action="store_true")
    b.add_argument("--min-df", type=int, default=1)
    b.add_argument("--hot-term-threshold", type=int, default=100_000)

    q = sub.add_parser("query", parents=[common],
                       help="batch BM25 top-k retrieval")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True, help="parquet (query_id, query, lang)")
    q.add_argument("--out", required=True, help="output parquet directory")
    q.add_argument("--compat", default="standard", choices=["standard", "reference"])
    q.add_argument("--method", default="taat", choices=["taat", "wand", "maxscore"])
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--k1", type=float, default=None)
    q.add_argument("--b", type=float, default=0.75)
    q.add_argument("--submission", action="store_true",
                   help="also write (query_id, docids) submission CSV shape")
    q.add_argument("--pool", default="actor", choices=["actor", "task"],
                   help="scorer execution: actor pool (disk-loaded shards)"
                        " or warm-worker task pool (loads shards once into"
                        " the object store and serves zero-copy — no actor"
                        " ramp)")
    q.add_argument("--term-buckets", default=None,
                   help="serve through a (lang, term-range) bucket group"
                        " built by the term-buckets command")
    q.add_argument("--fuzzy", action="store_true",
                   help="Lucene term~1: expand each query token to every"
                        " same-language vocabulary term within edit"
                        " distance 1 (served from the index df artifact)"
                        " before scoring")

    tb = sub.add_parser("term-buckets", parents=[common],
                        help="split an index's postings into volume-"
                             "balanced term-range bucket shards")
    tb.add_argument("--index", required=True)
    tb.add_argument("--out", required=True, help="bucket layout directory")
    tb.add_argument("--num-buckets", type=int, default=4)

    a = sub.add_parser("append", parents=[common],
                       help="append a crawl delta as a new index generation")
    a.add_argument("--input", required=True, help="parquet delta corpus")
    a.add_argument("--index", required=True, help="existing base index directory")
    a.add_argument("--extract-html", action="store_true")

    cp = sub.add_parser("compact", parents=[common],
                        help="physically merge base + generations into one index")
    cp.add_argument("--index", required=True)
    cp.add_argument("--out", required=True, help="compacted index output directory")

    d = sub.add_parser("delete", parents=[common],
                       help="tombstone documents by url (Lucene live-docs; "
                            "stats stay stale until compact)")
    d.add_argument("--index", required=True)
    d.add_argument("--url", action="append", default=[],
                   help="url to delete (repeatable)")
    d.add_argument("--urls-file", default=None,
                   help="text file with one url per line")

    st = sub.add_parser("stats", parents=[common],
                        help="per-partition lineage + metrics of a built index")
    st.add_argument("--index", required=True)

    c = sub.add_parser("cosine", parents=[common],
                       help="TF-IDF cosine top-k (optional BM25 rerank)")
    c.add_argument("--index", required=True)
    c.add_argument("--queries", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--rerank", action="store_true")
    c.add_argument("--candidates", type=int, default=200)
    c.add_argument("--k", type=int, default=10)

    args = p.parse_args(argv)

    if args.cmd == "stats":
        # pure metadata read (the north rule's per-partition lineage +
        # metrics surface) — no Ray session needed
        import os

        from .pipelines.incremental import read_generations
        from .state.manifest import read_manifest

        mdir = os.path.join(args.index, "manifests")
        if not os.path.isdir(mdir):
            raise FileNotFoundError(
                f"no index at {args.index!r} (manifests/ missing)"
            )
        langs = {}
        for lang in sorted(os.listdir(mdir)):
            m = read_manifest(os.path.join(mdir, lang))
            langs[lang] = (
                {k: v for k, v in sorted(m.items())}
                if m is not None
                else {"committed": False}
            )
        artifacts = {}
        for sub_dir in ("postings", "docmap", "df", "norms"):
            root = os.path.join(args.index, sub_dir)
            if not os.path.isdir(root):
                continue
            files = bytes_ = 0
            for dirpath, _dirs, names in os.walk(root):
                for n in names:
                    if n.endswith(".parquet"):
                        files += 1
                        bytes_ += os.path.getsize(os.path.join(dirpath, n))
            artifacts[sub_dir] = {"parquet_files": files, "bytes": bytes_}
        from .pipelines.deletes import load_deleted

        tomb = os.path.join(args.index, "tombstones")
        deleted = load_deleted(tomb) if os.path.isdir(tomb) else {}
        print(json.dumps({
            "index": args.index,
            "partitions": langs,
            "generations": read_generations(args.index)["generations"],
            "artifacts": artifacts,
            "tombstones": {
                f"src={s},lang={l}": int(v.size)
                for (s, l), v in sorted(deleted.items())
            },
        }, sort_keys=True, default=str))
        return 0

    _ensure_ray(getattr(args, "num_cpus", None))
    import ray.data

    from .config import BM25Config, IndexConfig, TokenizerConfig

    if args.cmd == "build":
        from .pipelines.build_index import build_index

        cfg = IndexConfig(
            tokenizer=TokenizerConfig(mode=args.tokenizer),
            min_df=args.min_df,
            hot_term_threshold=args.hot_term_threshold,
        )
        manifests = build_index(
            args.input, args.index, cfg=cfg,
            extract_html=args.extract_html,
            with_cosine_norms=not args.no_cosine_norms,
        )
        print(json.dumps({l: {k: m[k] for k in ("n_docs", "n_terms", "n_postings")}
                          for l, m in manifests.items()}, sort_keys=True))
        return 0

    if args.cmd == "append":
        from .pipelines.incremental import append_index, read_generations

        manifests = append_index(args.input, args.index,
                                 extract_html=args.extract_html)
        print(json.dumps({
            "generations": read_generations(args.index)["generations"],
            "appended": {l: {k: m[k] for k in ("n_docs", "n_terms", "n_postings")}
                         for l, m in manifests.items()},
        }, sort_keys=True))
        return 0

    if args.cmd == "delete":
        from .pipelines.deletes import delete_docs

        urls = list(args.url)
        if args.urls_file:
            with open(args.urls_file) as f:
                urls.extend(line.strip() for line in f if line.strip())
        if not urls:
            p.error("delete: provide --url and/or --urls-file")
        n = delete_docs(args.index, urls)
        print(json.dumps({"tombstoned": n, "requested": len(set(urls))}))
        return 0

    if args.cmd == "compact":
        from .pipelines.incremental import compact_index

        manifests = compact_index(args.index, args.out)
        print(json.dumps({l: {k: m[k] for k in ("n_docs", "n_terms", "n_postings")}
                          for l, m in manifests.items()}, sort_keys=True))
        return 0

    if args.cmd == "term-buckets":
        from .pipelines.term_sharded import build_term_buckets

        table = build_term_buckets(args.index, args.out,
                                   num_buckets=args.num_buckets)
        print(json.dumps({
            "buckets": table["num_buckets"],
            "cuts": {l: len(v) for l, v in table["cuts"].items()},
            "out": args.out,
        }, sort_keys=True))
        return 0

    queries = ray.data.read_parquet(args.queries)
    if args.cmd == "query":
        from .pipelines.incremental import bm25_search_incremental, read_generations
        from .pipelines.query import bm25_search, to_submission

        k1 = args.k1 if args.k1 is not None else (1.5 if args.compat == "reference" else 1.2)
        cfg = BM25Config(k1=k1, b=args.b, compat=args.compat, k=args.k)
        if args.fuzzy:
            from .pipelines.query import fuzzy_expand

            queries = fuzzy_expand(
                queries, args.index, tokenizer=_index_tokenizer(args.index)
            )
        # tokenize queries the way the index was BUILT (recorded in its
        # manifests) — a mismatch silently misses the vocabulary
        if args.term_buckets:
            from .pipelines.term_sharded import bm25_search_term_sharded

            res = bm25_search_term_sharded(
                queries, args.index, args.term_buckets, cfg=cfg,
                tokenizer=_index_tokenizer(args.index),
            )
        elif read_generations(args.index)["generations"]:
            # a generational index serves through the sharded scorer
            # (method selection is per-shard TAAT there)
            res = bm25_search_incremental(queries, args.index, cfg=cfg,
                                          tokenizer=_index_tokenizer(args.index))
        else:
            shared_refs = None
            if args.pool == "task":
                # the serving-deployment shape: shards load ONCE into the
                # object store; every warm worker maps them zero-copy
                import os as _os

                import ray as _ray

                from .state.index_shard import build_shared_payload

                _load = _ray.remote(num_cpus=1)(build_shared_payload)
                mdir = _os.path.join(args.index, "manifests")
                shared_refs = {
                    lang: _load.remote(args.index, lang, contrib_cfg=cfg)
                    for lang in sorted(_os.listdir(mdir))
                }
            res = bm25_search(queries, args.index, cfg=cfg, method=args.method,
                              tokenizer=_index_tokenizer(args.index),
                              shared_refs=shared_refs, pool=args.pool)
        res.write_parquet(args.out)
        if args.submission:
            to_submission(
                ray.data.read_parquet(args.out)
            ).write_csv(args.out + "_submission")
        print(json.dumps({"results": args.out}))
        return 0

    if args.cmd == "cosine":
        from .pipelines.query import cosine_search

        res = cosine_search(
            queries, args.index, k=args.k,
            rerank=args.rerank, candidates=args.candidates,
            tokenizer=_index_tokenizer(args.index),
        )
        res.write_parquet(args.out)
        print(json.dumps({"results": args.out}))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
