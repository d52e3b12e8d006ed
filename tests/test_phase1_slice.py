"""Phase-1 end-to-end slice (SURVEY.md §7): read → extract → tokenize →
postings → write, as a Ray Dataset pipeline on the synthetic corpus."""

import collections

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from document_retrieval_ray.sources.synth import generate_corpus
from document_retrieval_ray.stages.extract import ExtractText
from document_retrieval_ray.stages.tokenize import TokenizeStage
from document_retrieval_ray.stages.postings import emit_postings
from document_retrieval_ray.functions.tokenizer import tokenize_simple
from document_retrieval_ray.config import TokenizerConfig


class TestExtractUnit:
    def test_byte_identity(self):
        docs, _ = generate_corpus(num_docs=60, seed=5)
        out = ExtractText()(docs)
        assert out["text"].to_pylist() == docs["text"].to_pylist()

    def test_fallback_strips_tags(self):
        t = pa.table(
            {
                "url": ["u1"],
                "html": [b"<html><script>x=1</script><p>hello  world</p></html>"],
            }
        )
        out = ExtractText()(t)
        assert out["text"].to_pylist() == ["hello world"]


class TestTokenizeUnit:
    def test_simple_matches_pure_function(self):
        docs, _ = generate_corpus(num_docs=80, seed=6)
        out = TokenizeStage(TokenizerConfig(mode="simple"))(docs)
        for text, toks, dl in zip(
            docs["text"].to_pylist(), out["tokens"].to_pylist(), out["dl"].to_pylist()
        ):
            expect = tokenize_simple(text)
            assert dl == len(expect)
            got = [t for t in toks if t != ""]
            assert got == expect

    def test_reference_mode(self):
        docs, _ = generate_corpus(num_docs=40, seed=6)
        out = TokenizeStage(TokenizerConfig(mode="reference"))(docs)
        assert out.num_rows == 40
        assert out.schema.field("tokens").type == pa.list_(pa.string())


class TestPostingsUnit:
    def test_tf_counts(self):
        t = pa.table(
            {
                "url": ["a", "b"],
                "lang": ["en", "en"],
                "tokens": [["x", "y", "x"], [""]],
                "dl": [3, 0],
            }
        )
        out = emit_postings(t)
        rows = {(r["url"], r["term"]): r["tf"] for r in out.to_pylist()}
        assert rows == {("a", "x"): 2, ("a", "y"): 1}

    def test_matches_counter_oracle(self):
        docs, _ = generate_corpus(num_docs=100, seed=8)
        tok = TokenizeStage(TokenizerConfig(mode="simple"))(docs)
        out = emit_postings(tok)
        got = collections.defaultdict(dict)
        for r in out.to_pylist():
            got[r["url"]][r["term"]] = r["tf"]
        for url, text in zip(docs["url"].to_pylist(), docs["text"].to_pylist()):
            expect = collections.Counter(tokenize_simple(text))
            assert got.get(url, {}) == dict(expect), url


@pytest.mark.usefixtures("ray_session")
class TestPhase1Pipeline:
    def test_end_to_end(self, tiny_corpus, tmp_path):
        import ray.data

        ds = ray.data.read_parquet(
            tiny_corpus["documents"], columns=["url", "html", "lang", "text"]
        )
        extracted = ds.map_batches(ExtractText(out_col="extracted", keep_html=False),
                                   batch_format="pyarrow")

        # per-row invariant: extracted text byte-identical to input text per url
        def check(batch: pa.Table) -> pa.Table:
            assert batch["extracted"].to_pylist() == batch["text"].to_pylist()
            return batch.select(["url", "lang", "extracted"]).rename_columns(
                ["url", "lang", "text"]
            )

        checked = extracted.map_batches(check, batch_format="pyarrow")
        tokens = checked.map_batches(
            TokenizeStage, batch_format="pyarrow", concurrency=2
        )
        postings = tokens.map_batches(emit_postings, batch_format="pyarrow")
        out_dir = str(tmp_path / "postings")
        postings.write_parquet(out_dir)

        written = pq.read_table(out_dir)
        assert written.num_rows > 0
        assert set(written.column_names) == {"lang", "term", "url", "dl", "tf"}
        # postings are unique per (url, term)
        import pandas as pd

        pdf = written.to_pandas()
        assert not pdf.duplicated(["url", "term"]).any()
        assert (pdf["tf"] >= 1).all()


class TestTokenizerConfigPlumbing:
    def test_non_default_config_matches_tokenize_cfg(self):
        """stopwords / min_token_len / custom bigram_langs must flow
        through TokenizeStage identically to the scorers' tokenize_cfg
        (a build-only knob would silently desync build and query)."""
        import pyarrow as pa

        from document_retrieval_ray.config import TokenizerConfig
        from document_retrieval_ray.functions.tokenizer import tokenize_cfg
        from document_retrieval_ray.stages.tokenize import TokenizeStage

        docs = pa.table(
            {
                "url": pa.array(["u1", "u2", "u3"], pa.string()),
                "text": pa.array(
                    ["The quick brown fox a b", "pt words ligam aqui", ""],
                    pa.string(),
                ),
                "lang": pa.array(["en", "pt", "en"], pa.string()),
            }
        )
        for cfg in (
            TokenizerConfig(mode="simple", stopwords=True),
            TokenizerConfig(mode="simple", min_token_len=3),
            TokenizerConfig(mode="reference", bigram_langs=("pt",)),
        ):
            out = TokenizeStage(cfg)(docs)
            for i in range(3):
                expect = tokenize_cfg(
                    docs["text"][i].as_py(), docs["lang"][i].as_py(), cfg
                )
                assert out["tokens"][i].as_py() == expect, cfg
                assert out["dl"][i].as_py() == len(expect), cfg
        # custom bigram set actually produces bigrams for that lang
        out = TokenizeStage(TokenizerConfig(mode="reference", bigram_langs=("pt",)))(docs)
        assert any("_" in t for t in out["tokens"][1].as_py())
