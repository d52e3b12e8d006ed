"""Unit tests: tokenizers, varbyte codec, hashing, text stats (no Ray)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from document_retrieval_ray.functions.tokenizer import (
    tokenize_simple,
    tokenize_reference,
    lemmatize_en,
    stem_suffix,
)
from document_retrieval_ray.functions.varbyte import (
    varbyte_encode,
    varbyte_decode,
    encode_postings,
    decode_postings,
)
from document_retrieval_ray.functions.hashing import (
    md5_hex,
    shingles,
    minhash_signature,
    band_keys,
    simhash64,
    hamming64,
    rolling_fingerprint,
)
from document_retrieval_ray.functions.textstats import doc_stats_row, langid_stopword, fx4


class TestTokenizerSimple:
    def test_basic(self):
        assert tokenize_simple("Hello, World! 42x") == ["hello", "world", "42x"]

    def test_empty_and_nonstring(self):
        assert tokenize_simple("") == []
        assert tokenize_simple(None) == []
        assert tokenize_simple("   ...  ") == []

    def test_stopword_filter(self):
        assert tokenize_simple("the fast fox", stopword_filter=True) == ["fast", "fox"]

    def test_matches_duckdb_expression(self):
        """tokenize_simple must equal the DuckDB SQL it is mirrored by."""
        import duckdb

        samples = [
            "the Quick   brown-fox; jumps_over 12 lazy dogs!",
            "a,b,,c  d",
            "UPPER lower 123abc",
            "",
            "...",
        ]
        con = duckdb.connect()
        for s in samples:
            (sql_toks,) = con.execute(
                "select string_split_regex(trim(regexp_replace(lower(?), "
                "'[^a-z0-9]+', ' ', 'g')), ' ')",
                [s],
            ).fetchone()
            sql_toks = [t for t in sql_toks if t != ""]
            assert sql_toks == tokenize_simple(s), s


class TestTokenizerReference:
    def test_punctuation_strip_no_space(self):
        # str.translate removes punctuation WITHOUT inserting spaces (M1 quirk)
        assert tokenize_reference("ab-cd efg", "ar") == ["abcd", "efg"]

    def test_stopword_lowercase_test_only(self):
        # "The" dropped (lowercase test); surviving non-en tokens keep case
        toks = tokenize_reference("The Maison", "fr", bigram_langs=())
        assert toks == [stem_suffix("Maison")]

    def test_en_lemmatize(self):
        toks = tokenize_reference("dogs running", "en")
        assert toks == [lemmatize_en("dogs"), lemmatize_en("running")]
        assert lemmatize_en("dogs") == "dog"

    def test_bigrams_appended(self):
        toks = tokenize_reference("maison jardin voiture", "fr")
        base = [stem_suffix(w) for w in ["maison", "jardin", "voiture"]]
        assert toks == base + [f"{base[0]}_{base[1]}", f"{base[1]}_{base[2]}"]

    def test_empty(self):
        assert tokenize_reference(None, "en") == []
        assert tokenize_reference("", "ko") == []


class TestVarbyte:
    def test_roundtrip_small(self):
        vals = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**50], dtype=np.uint64)
        assert list(varbyte_decode(varbyte_encode(vals))) == list(vals)

    def test_empty(self):
        assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
        assert varbyte_decode(b"").size == 0

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=50))
    def test_roundtrip_property(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        out = varbyte_decode(varbyte_encode(arr))
        assert list(out) == vals

    def test_postings_roundtrip(self):
        doc_ids = np.array([3, 7, 8, 1000, 10**7], dtype=np.uint64)
        tfs = np.array([1, 5, 2, 1, 9], dtype=np.uint64)
        buf = encode_postings(doc_ids, tfs)
        d, t = decode_postings(buf, 5)
        assert list(d) == list(doc_ids) and list(t) == list(tfs)

    def test_postings_must_ascend(self):
        with pytest.raises(ValueError):
            encode_postings(np.array([5, 5]), np.array([1, 1]))

    def test_truncated_stream_raises(self):
        buf = varbyte_encode(np.array([300], dtype=np.uint64))
        with pytest.raises(ValueError):
            varbyte_decode(buf[:-1])


class TestHashing:
    def test_md5_matches_duckdb(self):
        import duckdb

        con = duckdb.connect()
        for s in ["abc", "", "0:foo bar baz"]:
            assert con.execute("select md5(?)", [s]).fetchone()[0] == md5_hex(s)

    def test_shingles(self):
        assert shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
        assert shingles(["a", "b"], 3) == ["a b"]
        assert shingles([], 3) == []
        # distinct, first-occurrence order
        assert shingles(["x", "x", "x", "x"], 3) == ["x x x"]

    def test_minhash_similarity_monotone(self):
        a = shingles(list("abcdefghij"), 3)
        b = shingles(list("abcdefghiz"), 3)
        c = shingles(list("zyxwvutsrq"), 3)
        sig_a, sig_b, sig_c = (minhash_signature(x, 16) for x in (a, b, c))
        agree_ab = sum(x == y for x, y in zip(sig_a, sig_b))
        agree_ac = sum(x == y for x, y in zip(sig_a, sig_c))
        assert agree_ab > agree_ac

    def test_band_keys(self):
        sig = minhash_signature(["s1", "s2"], 8)
        keys = band_keys(sig, 2)
        assert len(keys) == 4 and len(set(map(len, keys))) == 1

    def test_simhash_near_vs_far(self):
        t1 = "the quick brown fox jumps over the lazy dog".split()
        t2 = "the quick brown fox jumps over the lazy cat".split()
        t3 = "completely different words entirely unrelated text here now".split()
        assert hamming64(simhash64(t1), simhash64(t2)) < hamming64(
            simhash64(t1), simhash64(t3)
        )

    def test_rolling_fingerprint_order_sensitive(self):
        assert rolling_fingerprint(["a", "b"]) != rolling_fingerprint(["b", "a"])
        assert rolling_fingerprint(["a", "b"]) == rolling_fingerprint(["a", "b"])


class TestTextStats:
    def test_doc_stats(self):
        r = doc_stats_row("the fast fox")
        assert r["n_tokens"] == 3
        assert r["tok_chars"] == len("the") + len("fast") + len("fox")
        assert r["stop_ratio_x"] == fx4(1 / 3)

    def test_empty(self):
        assert doc_stats_row("")["n_tokens"] == 0

    def test_langid_deterministic_tie(self):
        r = langid_stopword("xyz abc")  # no marker hits anywhere → tie → 'de'
        assert r["pred_lang"] == "de"

    def test_langid_en(self):
        assert langid_stopword("the cat and the hat is here")["pred_lang"] == "en"


class TestSynth:
    def test_deterministic(self):
        from document_retrieval_ray.sources.synth import generate_corpus

        d1, q1 = generate_corpus(num_docs=100, seed=42)
        d2, q2 = generate_corpus(num_docs=100, seed=42)
        assert d1.equals(d2) and q1.equals(q2)
        assert d1.num_rows == 100

    def test_schema_matches_input_hint(self):
        from document_retrieval_ray.sources.synth import generate_corpus
        import pyarrow as pa

        d, q = generate_corpus(num_docs=50, seed=1)
        assert d.schema.field("url").type == pa.string()
        assert d.schema.field("warc_ts").type == pa.timestamp("us")
        assert d.schema.field("html").type == pa.binary()
        assert d.schema.field("text").type == pa.large_string()
        assert d.schema.field("lang").type == pa.string()
        assert set(q.column_names) == {
            "query_id", "query", "lang", "positive_docs", "negative_docs",
        }

    def test_html_wraps_text(self):
        from document_retrieval_ray.sources.synth import (
            generate_corpus,
            HTML_PREFIX,
            HTML_SUFFIX,
        )

        d, _ = generate_corpus(num_docs=20, seed=3)
        for html, text in zip(d["html"].to_pylist(), d["text"].to_pylist()):
            assert html.decode("utf-8") == HTML_PREFIX + text + HTML_SUFFIX


class TestWebNormalizeParity:
    def test_contraction_expansion_matches_duckdb(self):
        """M4 + contraction expansion: the Python regex chain and the
        generated SQL chain are byte-identical on contraction-heavy text."""
        import re

        import duckdb

        from document_retrieval_ray.pipelines.testdata_queries import (
            CONTRACTIONS,
            _webnorm_sql,
        )

        def pynorm(s):
            s = (s or "").lower()
            for p, r in CONTRACTIONS:
                s = re.sub(p, r, s)
            s = re.sub(r"http\S+|www\S+|https\S+", " ", s)
            s = re.sub(r"[0-9]+", " ", s)
            s = re.sub(r"[^a-z ]", " ", s)
            s = re.sub(r" +", " ", s).strip(" ")
            return s

        texts = [
            "I can't believe it's not butter! They don't know we'll "
            "won't you'd they're I'm",
            "shan't o'clock what's http://x.co/a9 123 Mixed-CASE",
            "let's go; there's more. isn't it? we've you'll he'd",
            "",
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        for i, t in enumerate(texts):
            con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
        sql = _webnorm_sql().replace(
            "SELECT doc_id, md5(s) AS norm_md5, length(s) AS norm_len FROM n",
            "SELECT doc_id, s FROM n ORDER BY doc_id",
        )
        rows = con.execute(sql).fetchall()
        for i, t in enumerate(texts):
            assert pynorm(t) == rows[i][1], t
