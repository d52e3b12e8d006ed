"""HTML → text extraction stage (M4 analog).

The reference strips HTML with BeautifulSoup inside its web normalizer
(text_preprocessing_and_stopwords_setup.py:53-73). Here extraction is a
vectorized ``map_batches`` transform over the Arrow ``html:binary`` column:

- primary path: the page's ``<main>…</main>`` element content, extracted
  with one RE2 kernel (``pyarrow.compute.extract_regex``). For corpora
  whose html was rendered by wrapping the text (our synthetic input_hint
  corpus), this recovers ``text`` BYTE-IDENTICALLY per url — the
  input_hint per-row invariant, asserted in tests.
- fallback path (no ``<main>``): drop ``<script>``/``<style>`` blocks,
  strip all tags, collapse whitespace — best-effort boilerplate removal,
  not byte-exact.

The stage is a callable class so the (cheap) kernel setup happens once per
actor; it drops ``html`` from the output immediately (project early —
html rows are MB-scale at real crawl sizes).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

MAIN_RE = r"(?s)<main>(?P<t>.*)</main>"


class ExtractText:
    """map_batches stage: (…, html:binary) → (…, text:large_string)."""

    def __init__(self, out_col: str = "text", keep_html: bool = False):
        self.out_col = out_col
        self.keep_html = keep_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = pc.cast(batch["html"], pa.large_string())
        m = pc.extract_regex(html, MAIN_RE)
        main_text = pc.struct_field(m, "t")
        # fallback: strip scripts/styles, then all tags, then collapse spaces
        no_script = pc.replace_substring_regex(
            html, r"(?s)<(script|style)\b[^>]*>.*?</(script|style)>", " "
        )
        no_tags = pc.replace_substring_regex(no_script, r"<[^>]*>", " ")
        collapsed = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(no_tags, r"\s+", " ")
        )
        text = pc.if_else(pc.is_valid(main_text), main_text, collapsed)
        cols = [c for c in batch.column_names if c not in (self.out_col, "html")]
        out = batch.select(cols).append_column(
            self.out_col, pc.cast(text, pa.large_string())
        )
        if self.keep_html:
            out = out.append_column("html", batch["html"])
        return out
