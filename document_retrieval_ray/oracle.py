"""Single-process numpy oracle re-implementing the reference scoring
semantics (SURVEY.md §5/§7 Phase 4).

Independent of the Ray engine's index structures: builds plain
dict/Counter structures the way the reference does
(final_implementation.py:105-122 — per-doc Counters, df dict, dense doc
ids), then scores with the exact reference formulas. Shares ONLY the pure
tokenizer functions and the url-hash partition rule with the engine (both
are part of the engine's *specification*), so an engine bug in the
shuffle, codec, or scorer cannot be masked by the oracle.

Checks supported:
- dense doc-id assignment (lang, url-hash part, url order)
- per-lang stats (N over all docs, avgdl incl. empty docs)
- df table
- BM25 top-k (compat reference C1 / standard C2), rank-identical
- cosine top-k (C5) and cosine→BM25 rerank (C6/C3 quirks)
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from .config import BM25Config, TokenizerConfig
from .functions.hashing import stable_hash64
from .functions.tokenizer import tokenize_cfg


class OracleIndex:
    def __init__(
        self,
        documents: pa.Table,
        tokenizer: TokenizerConfig = TokenizerConfig(),
        num_hash_parts: int = 32,
    ):
        self.tok = tokenizer
        urls = documents["url"].to_pylist()
        texts = documents["text"].to_pylist()
        langs = documents["lang"].to_pylist()

        # dense per-lang doc ids: order by (url-hash part, url)
        by_lang: dict = {}
        for u, t, l in zip(urls, texts, langs):
            by_lang.setdefault(l, []).append((stable_hash64(u) % num_hash_parts, u, t))
        self.langs = sorted(by_lang)
        self.doc_urls: dict = {}
        self.doc_texts: dict = {}
        for l in self.langs:
            rows = sorted(by_lang[l], key=lambda r: (r[0], r[1]))
            self.doc_urls[l] = np.array([r[1] for r in rows], dtype=object)
            self.doc_texts[l] = [r[2] for r in rows]

        # per-doc term freqs, dl, df, stats
        self.term_freqs: dict = {}
        self.dl: dict = {}
        self.df: dict = {}
        self.N: dict = {}
        self.avgdl: dict = {}
        for l in self.langs:
            tfs = []
            dls = []
            df = Counter()
            for text in self.doc_texts[l]:
                toks = tokenize_cfg(text, l, self.tok)
                c = Counter(toks)
                tfs.append(c)
                dls.append(len(toks))
                df.update(c.keys())
            self.term_freqs[l] = tfs
            self.dl[l] = np.array(dls, dtype=np.float64)
            self.df[l] = dict(df)
            self.N[l] = len(tfs)
            self.avgdl[l] = float(np.mean(dls)) if dls else 0.0

    # --- idf laws (A4) ---
    def idf(self, lang: str, term: str, law: str) -> float:
        d = self.df[lang].get(term)
        if d is None:
            return 0.0
        N = float(self.N[lang])
        if law == "lucene":
            return float(np.log(1.0 + (N - d + 0.5) / (d + 0.5)))
        if law == "cosine":
            return float(np.log((N - d + 0.5) / (d + 0.5)))
        if law == "sklearn":
            return float(np.log((N + 1.0) / (d + 1.0)) + 1.0)
        raise ValueError(law)

    def _postings(self, lang: str, term: str):
        doc_ids = [
            i for i, c in enumerate(self.term_freqs[lang]) if term in c
        ]
        tfs = [self.term_freqs[lang][i][term] for i in doc_ids]
        return np.array(doc_ids, dtype=np.int64), np.array(tfs, dtype=np.float64)

    def score_bm25(self, query: str, lang: str, cfg: BM25Config) -> np.ndarray:
        tokens = tokenize_cfg(query, lang, self.tok)
        scores = np.zeros(self.N[lang], dtype=np.float64)
        if not tokens or self.avgdl[lang] <= 0:
            return scores
        if cfg.compat == "reference":
            terms = [(t, 1.0) for t in sorted(set(tokens))]
        else:
            terms = sorted(Counter(tokens).items())
        for term, w in terms:
            if term not in self.df[lang]:
                continue
            doc_ids, tf = self._postings(lang, term)
            dl = self.dl[lang][doc_ids]
            idf = self.idf(lang, term, cfg.idf)
            if cfg.compat == "reference":
                denom = tf + cfg.k1 * (1.0 - cfg.b + dl / self.avgdl[lang])
            else:
                denom = tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / self.avgdl[lang])
            scores[doc_ids] += (w * idf) * ((tf * (cfg.k1 + 1.0)) / denom)
        return scores

    def cosine_norms(self, lang: str) -> np.ndarray:
        n2 = np.zeros(self.N[lang], dtype=np.float64)
        for i, c in enumerate(self.term_freqs[lang]):
            for term, tf in c.items():
                w = tf * self.idf(lang, term, "cosine")
                n2[i] += w * w
        return np.sqrt(n2)

    def score_cosine(self, query: str, lang: str) -> np.ndarray:
        tokens = tokenize_cfg(query, lang, self.tok)
        scores = np.zeros(self.N[lang], dtype=np.float64)
        qterms = sorted(set(tokens))
        qnorm2 = sum(
            self.idf(lang, t, "cosine") ** 2 for t in qterms if t in self.df[lang]
        )
        if qnorm2 <= 0:
            return scores
        for term in qterms:
            if term not in self.df[lang]:
                continue
            doc_ids, tf = self._postings(lang, term)
            idf = self.idf(lang, term, "cosine")
            scores[doc_ids] += idf * (tf * idf)
        norms = self.cosine_norms(lang)
        safe = np.where(norms > 0, norms, 1.0)
        out = scores / (safe * np.sqrt(qnorm2))
        out[norms == 0] = 0.0
        return out

    def topk(self, scores: np.ndarray, lang: str, k: int = 10, round_dp=4):
        """Same deterministic tie-break as the engine:
        (rounded score desc, url asc); positive scores only."""
        urls = self.doc_urls[lang]
        pos = np.nonzero(scores > 0)[0]
        if pos.size == 0:
            return []
        s = scores[pos]
        key = np.floor(s * (10.0 ** round_dp) + 0.5) if round_dp is not None else s
        order = np.lexsort((urls[pos], -key))[:k]
        return [
            (r + 1, urls[pos[i]], float(scores[pos[i]]), float(key[i]))
            for r, i in enumerate(order)
        ]
