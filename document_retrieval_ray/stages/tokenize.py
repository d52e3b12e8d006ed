"""Tokenization stage (M1/M2/M7 analog) — actor-pool ``map_batches`` class.

The reference preprocesses with per-row Python over pandas
(final_implementation.py:59-88 applied in a loop). Here:

- ``simple`` mode runs fully vectorized on Arrow: ``utf8_lower`` →
  ``replace_substring_regex`` → ``split_pattern`` (zero Python per row).
- ``reference`` mode needs per-token Python (lemma/stem/bigrams), so the
  batch loop is over documents, with the stopword/stemmer tables built
  ONCE per actor in ``__init__`` (T1 analog: the reference rebuilds Okt /
  WordNetLemmatizer / stopword sets per call — we deliberately don't).

Output schema: input key columns + ``tokens: list<string>`` + ``dl:int64``
(token count, the doc-length of A3/M8). Empty documents get ``tokens=[]``
via the single-empty-string sentinel that downstream stages filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import TokenizerConfig
from ..functions.stopwords import MERGED_STOPWORDS, STOPWORDS
from ..functions.tokenizer import tokenize_cfg


class TokenizeStage:
    """(url, text, lang, …) → (url, lang, tokens, dl), or with
    ``counted=True`` → (url, lang, terms:list, tfs:list<int64>, dl):
    per-doc term frequencies computed HERE (A1), so the doc-id shuffle
    moves distinct (term, tf) pairs instead of every token occurrence
    (~40% smaller under a Zipf vocabulary) and the assign stage skips its
    per-group groupby."""

    def __init__(
        self,
        config: TokenizerConfig = TokenizerConfig(),
        text_col: str = "text",
        keep_cols=("url", "lang"),
        counted: bool = False,
    ):
        self.cfg = config
        self.text_col = text_col
        self.keep_cols = list(keep_cols)
        self.counted = counted
        # per-actor state (T1): stopword tables resolved once
        self.merged_stop = MERGED_STOPWORDS
        self.en_stop = STOPWORDS["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # the vectorized Arrow path covers the default simple config;
        # non-default knobs (stopwords / min_token_len) route through the
        # same tokenize_cfg the SCORERS use, so build and query always
        # tokenize identically
        if (
            self.cfg.mode == "simple"
            and not self.cfg.stopwords
            and self.cfg.min_token_len <= 1
        ):
            tokens, dl = self._simple(batch)
        else:
            tokens, dl = self._python_cfg(batch)
        out = batch.select([c for c in self.keep_cols if c in batch.column_names])
        if not self.counted:
            out = out.append_column("tokens", tokens)
            out = out.append_column("dl", dl)
            return out
        terms, tfs = self._count(batch, tokens)
        out = out.append_column("terms", terms)
        out = out.append_column("tfs", tfs)
        out = out.append_column("dl", dl)
        return out

    def _count(self, batch: pa.Table, tokens):
        """Per-doc (distinct terms, tfs) list columns from the token lists.

        Fully C-level: dictionary-encode the flat token stream (no Python
        string objects), run-length count over a (doc, code) lexsort, and
        rebuild list columns from run boundaries — ~3× faster than the
        pandas object-key groupby it replaces. Term order within a doc is
        dictionary-code order (downstream sorts by term string wherever
        order matters)."""
        n = len(tokens)
        col = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        values = col.values
        start = offsets[0]
        if start != 0 or len(values) != offsets[-1]:
            values = values.slice(start, offsets[-1] - start)
        lens = np.diff(offsets)
        parent = np.repeat(np.arange(n, dtype=np.int64), lens)

        def _empty():
            e = pa.array([[] for _ in range(n)], pa.list_(pa.string()))
            z = pa.array([[] for _ in range(n)], pa.list_(pa.int32()))
            return e, z

        if len(values) == 0:
            return _empty()
        enc = pc.dictionary_encode(values)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_arr = enc.dictionary
        # drop the '' sentinel of empty documents
        nonempty = pc.utf8_length(dict_arr).to_numpy(zero_copy_only=False) > 0
        keep = nonempty[codes]
        parent, codes = parent[keep], codes[keep]
        if len(parent) == 0:
            return _empty()
        # single-pass radix argsort of a packed (parent, code) key beats
        # the two-pass lexsort ~1.7×; equal keys are IDENTICAL pairs, so
        # run boundaries (and thus the output) are unchanged
        V = len(dict_arr)
        if len(parent) and int(parent[-1] + 1) * V < 2**62:
            order = np.argsort(parent * np.int64(V) + codes, kind="stable")
        else:  # packed key would overflow (never at sane batch sizes)
            order = np.lexsort((codes, parent))
        p2, c2 = parent[order], codes[order]
        change = (p2[1:] != p2[:-1]) | (c2[1:] != c2[:-1])
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        ends = np.concatenate([starts[1:], [len(p2)]])
        # int32 tf halves this list column's bytes through the doc-id
        # shuffle (tf is bounded by doc length; consumers upcast at use)
        tf = (ends - starts).astype(np.int32)
        run_parent = p2[starts]
        run_codes = c2[starts]
        lens2 = np.bincount(run_parent, minlength=n)
        off2 = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lens2, out=off2[1:])
        terms = pa.ListArray.from_arrays(
            pa.array(off2), dict_arr.take(pa.array(run_codes))
        )
        tfs = pa.ListArray.from_arrays(pa.array(off2), pa.array(tf, pa.int32()))
        return terms, tfs

    # --- vectorized simple mode ---
    def _simple(self, batch: pa.Table):
        text = pc.cast(batch[self.text_col], pa.string())
        low = pc.utf8_lower(text)
        spaced = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        trimmed = pc.utf8_trim_whitespace(spaced)
        trimmed = pc.if_else(pc.is_valid(trimmed), trimmed, pa.scalar("", pa.string()))
        toks = pc.split_pattern(trimmed, " ")
        # rows that are empty after trim split to [""] — dl counts real tokens
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        dl = np.where(empty, 0, lens).astype(np.int64)
        return toks, pa.array(dl, pa.int64())

    # --- per-row path (reference mode; simple with non-default knobs) ---
    def _python_cfg(self, batch: pa.Table):
        texts = batch[self.text_col].to_pylist()
        langs = batch["lang"].to_pylist()
        toks = [tokenize_cfg(t, l, self.cfg) for t, l in zip(texts, langs)]
        dl = pa.array([len(t) for t in toks], pa.int64())
        return pa.array(toks, pa.list_(pa.string())), dl


def flatten_tokens(batch: pa.Table, token_col: str = "tokens"):
    """(tokens list column) → (parent_row_index ndarray, flat terms StringArray).

    Filters the '' sentinel tokens produced for empty documents.
    """
    col = batch[token_col].combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # defensive; combine_chunks on column
        col = col.chunk(0)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    values = col.values
    lens = np.diff(offsets)
    parent = np.repeat(np.arange(len(col), dtype=np.int64), lens)
    # account for a possible non-zero start offset of a sliced array
    start = offsets[0]
    if start != 0 or len(values) != offsets[-1]:
        values = values.slice(start, offsets[-1] - start)
    vals_np = np.asarray(values.to_pandas(), dtype=object)
    keep = vals_np != ""
    return parent[keep], vals_np[keep]
