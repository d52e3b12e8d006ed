"""Deterministic synthetic Common-Crawl-style corpus (BASELINE.json input_hint).

Generates the F1/F2 fixture tables (FIXTURES.md):

- ``documents``: (url:string, warc_ts:timestamp[us], html:binary,
  text:large_string, lang:string). ``html`` wraps ``text`` in fixed markup
  such that :mod:`..stages.extract` provably recovers ``text``
  byte-identically (the input_hint per-row invariant).
- ``queries``: (query_id, query, lang, positive_docs, negative_docs) with
  every query shape FIXTURES.md §F2 requires (dup terms, OOV, all-stopword,
  <k matches, ties, hot term).

Properties mirrored from the reference corpus (final_implementation.py:310-318):
per-language Zipf token distribution (hot-term df skew) and an ``en``-heavy
language skew (~20x the docs of other languages).

All randomness from one seeded ``numpy.random.Generator``; identical bytes
across regenerations. No external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.stopwords import STOPWORDS

LANGS = ("en", "fr", "de", "es", "it", "ar", "ko")

# fixed markup: extract_text() slices between these two markers
HTML_PREFIX = (
    "<html><head><title>synthetic page</title>"
    "<script>var boilerplate_js=1;</script></head>"
    "<body><nav>site navigation boilerplate</nav><main>"
)
HTML_SUFFIX = "</main><footer>copyright boilerplate footer</footer></body></html>"


def _vocab(lang: str, size: int) -> list:
    """Per-language deterministic vocabulary; head is shared stopword-like mass."""
    stop = sorted(STOPWORDS[lang])[:20]
    body = [f"{lang}tok{i}" for i in range(size - len(stop))]
    return stop + body


def generate_corpus(
    num_docs: int = 3000,
    seed: int = 42,
    vocab_size: int = 2000,
    zipf_a: float = 1.3,
    mean_len: int = 120,
):
    """Return (documents: pa.Table, queries: pa.Table)."""
    rng = np.random.default_rng(seed)
    # language skew: en ~ 20x the others (reference skew at small scale)
    weights = np.array([20.0, 1.2, 1.1, 1.1, 1.15, 0.9, 0.8])
    probs = weights / weights.sum()
    langs = rng.choice(len(LANGS), size=num_docs, p=probs)

    vocabs = {l: _vocab(l, vocab_size) for l in LANGS}
    vocab_arrs = {l: np.array(v, dtype=object) for l, v in vocabs.items()}
    # vectorized doc generation (bench corpora reach 10^5+ docs): one gamma
    # draw per doc for lengths, one Zipf draw for ALL tokens, per-lang
    # vocabulary gather, then a join per doc
    dls = np.maximum(1, rng.gamma(2.0, mean_len / 2.0, size=num_docs).astype(np.int64))
    offsets = np.concatenate([[0], np.cumsum(dls)])
    all_ranks = np.minimum(rng.zipf(zipf_a, size=int(offsets[-1])), vocab_size) - 1
    texts = [""] * num_docs
    for li, lang in enumerate(LANGS):
        idxs = np.nonzero(langs == li)[0]
        va = vocab_arrs[lang]
        for i in idxs:
            words = va[all_ranks[offsets[i]:offsets[i + 1]]]
            texts[i] = " ".join(words.tolist())
    urls, tss, lang_col = [], [], []
    base_ts = np.datetime64("2024-06-01T00:00:00", "us")
    for i in range(num_docs):
        lang = LANGS[langs[i]]
        v = vocabs[lang]
        # edge docs: empty / stopword-only / duplicate-heavy (FIXTURES.md F1)
        if i == 7:
            texts[i] = ""
        elif i == 11:
            texts[i] = " ".join(sorted(STOPWORDS[lang])[:10] * 3)
        elif i == 13:
            texts[i] = " ".join([v[50]] * 40)
        urls.append(f"https://{lang}.example.org/doc/{i:08d}")
        lang_col.append(lang)
        tss.append(base_ts + np.timedelta64(int(i) * 1000, "us"))

    html = [(HTML_PREFIX + t + HTML_SUFFIX).encode("utf-8") for t in texts]
    documents = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(lang_col, pa.string()),
        }
    )

    queries = _generate_queries(rng, vocabs, texts, urls, lang_col)
    return documents, queries


def _generate_queries(rng, vocabs, texts, urls, lang_col) -> pa.Table:
    """Every FIXTURES.md F2 query shape, per language."""
    qid, qtext, qlang, pos = [], [], [], []

    def add(lang, words, positive=None):
        i = len(qid)
        qid.append(f"q-{lang}-{i:04d}")
        qtext.append(" ".join(words))
        qlang.append(lang)
        pos.append(positive)

    from ..functions.stopwords import MERGED_STOPWORDS

    for lang in LANGS:
        v = vocabs[lang]
        if len(v) <= 200:
            raise ValueError(
                "vocab_size must be > 200: the fixture query shapes index "
                "fixed vocabulary ranks (duplicate/OOV/rare shapes)"
            )
        # pick an existing doc of this language for positive_docs
        doc_idx = next(
            (j for j, l in enumerate(lang_col) if l == lang and texts[j]), None
        )
        positive = urls[doc_idx] if doc_idx is not None else None
        sample = texts[doc_idx].split()[:4] if doc_idx is not None else [v[100]]
        add(lang, sample, positive)                       # 1. in-vocab multi-term
        add(lang, [v[120], v[120], v[121]])               # 2. duplicate terms
        add(lang, [v[130], "zzqqxunseen", "qqzwwnope"])   # 3. OOV mix
        # 4. empty-after-preprocessing: words must be in the MERGED
        # reference stopword set (per-lang ar/ko stopwords are NOT — a
        # query built from those survives reference preprocessing)
        add(lang, sorted(MERGED_STOPWORDS)[:3])
        # 5. genuinely rare term, <k matches: v[-1] is the Zipf CLIP
        # bucket (~9% of token mass — second-hottest "term"); a deep
        # un-clipped rank is actually rare
        add(lang, [v[len(v) - 60]])
        add(lang, [v[60], v[61]])                         # 6. tie-prone short query
        add(lang, [v[0]])                                 # 7. hot (stopword-like) term
    return pa.table(
        {
            "query_id": pa.array(qid, pa.string()),
            "query": pa.array(qtext, pa.string()),
            "lang": pa.array(qlang, pa.string()),
            "positive_docs": pa.array(pos, pa.string()),
            "negative_docs": pa.array([None] * len(qid), pa.string()),
        }
    )


def write_corpus(
    out_dir: str,
    num_docs: int = 3000,
    seed: int = 42,
    shard_rows: int = 50_000,
    **kw,
) -> dict:
    """Write documents.parquet + queries.parquet; returns paths.

    Corpora above ``shard_rows`` docs are written as a DIRECTORY of
    part files (the real Common-Crawl layout): Ray executes one read
    task per file, so a single giant file would serialize the read —
    measured ~8 s single-task decompression on a 1 GB corpus that 20
    shards read in parallel."""
    os.makedirs(out_dir, exist_ok=True)
    docs, queries = generate_corpus(num_docs=num_docs, seed=seed, **kw)
    doc_path = os.path.join(out_dir, "documents.parquet")
    q_path = os.path.join(out_dir, "queries.parquet")
    n = docs.num_rows
    if n <= shard_rows:
        # small row groups so a parallel reader can split ONE file into
        # many read tasks
        pq.write_table(docs, doc_path, row_group_size=4096)
    else:
        os.makedirs(doc_path, exist_ok=True)
        nshards = -(-n // shard_rows)
        for i in range(nshards):
            pq.write_table(
                docs.slice(i * shard_rows, shard_rows),
                os.path.join(doc_path, f"part-{i:05d}.parquet"),
                row_group_size=4096,
            )
    pq.write_table(queries, q_path)
    return {"documents": doc_path, "queries": q_path}
