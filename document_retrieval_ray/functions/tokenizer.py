"""Deterministic tokenizers.

Two modes (config.TokenizerConfig.mode):

``simple``
    ``re.sub('[^a-z0-9]+', ' ', text.lower()).split()`` — exactly
    mirrorable in DuckDB SQL::

        string_split_regex(trim(regexp_replace(lower(text),
                           '[^a-z0-9]+', ' ', 'g')), ' ')

    Used by every oracle-checked ``queries()`` entry so the Ray result and
    the DuckDB oracle tokenize identically.

``reference``
    Re-specification of the reference's canonical M1 preprocessing
    (final_implementation.py:59-88): strip ASCII punctuation via
    ``str.translate`` (no space inserted); whitespace tokenize (our
    deterministic stand-in for NLTK word_tokenize / Okt.morphs, which are
    unavailable here — SURVEY.md §7); drop tokens whose ``.lower()`` is in
    the merged 5-language stopword set; en → lemmatize (deterministic
    suffix rules standing in for WordNet); fr/de/es/it → suffix stem
    (standing in for Snowball); fr/de/es/it → append ``"_"``-joined token
    bigrams. Non-English tokens are NOT lowercased (only the stopword test
    lowercases) — a reference quirk we preserve. Non-str/empty → [].

Both are pure functions of (text, lang); the numpy test oracle imports
these same functions, so engine-vs-oracle rank identity is exact.
"""

from __future__ import annotations

import re
import string

from .stopwords import MERGED_STOPWORDS, STOPWORDS

_SIMPLE_RE = re.compile(r"[^a-z0-9]+")
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)

__all__ = [
    "tokenize_simple",
    "tokenize_reference",
    "tokenize_stem_bug",
    "tokenize",
    "lemmatize_en",
    "stem_suffix",
    "SIMPLE_TOKEN_SQL",
]

# the DuckDB expression that mirrors tokenize_simple; {col} is substituted
SIMPLE_TOKEN_SQL = (
    "string_split_regex(trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g')), ' ')"
)


def tokenize_simple(text, stopword_filter: bool = False) -> list:
    """Lowercase, non-alphanumeric → space, whitespace split."""
    if not isinstance(text, str) or not text:
        return []
    toks = _SIMPLE_RE.sub(" ", text.lower()).split()
    if stopword_filter:
        en = STOPWORDS["en"]
        toks = [t for t in toks if t not in en]
    return toks


# --- deterministic stand-ins for WordNet lemmatizer / Snowball stemmers ---

_EN_IRREGULAR = {
    "men": "men", "women": "women", "children": "children", "feet": "feet",
    "geese": "geese", "mice": "mice", "teeth": "teeth", "people": "people",
}


def lemmatize_en(word: str) -> str:
    """Deterministic noun-ish lemmatizer (stand-in for WordNetLemmatizer).

    Suffix rules only; never touches words of length <= 3.
    """
    if len(word) <= 3 or word in _EN_IRREGULAR:
        return word
    lw = word
    if lw.endswith("ies") and len(lw) > 4:
        return lw[:-3] + "y"
    if lw.endswith("sses") or lw.endswith("shes") or lw.endswith("ches") or lw.endswith("xes"):
        return lw[:-2]
    if lw.endswith("ss") or lw.endswith("us") or lw.endswith("is"):
        return lw
    if lw.endswith("s") and not lw.endswith("'s"):
        return lw[:-1]
    return lw


_STEM_SUFFIXES = (
    "issements", "issement", "ations", "ation", "amente", "emente", "mente",
    "ements", "ement", "ieren", "erons", "eront", "erait", "aient", "iendo",
    "ando", "ante", "ente", "ung", "eur", "euse", "ion", "ida", "ido", "ada",
    "ado", "are", "ere", "ire", "ant", "ent", "ait", "ais", "iez", "ons",
    "ez", "er", "ir", "re", "en", "es", "as", "os", "is", "a", "e", "o", "s",
)


def stem_suffix(word: str) -> str:
    """Deterministic longest-suffix stripper (stand-in for Snowball).

    Strips at most one suffix; keeps a stem of length >= 3.
    """
    if len(word) <= 3:
        return word
    for suf in _STEM_SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            return word[: -len(suf)]
    return word


def tokenize_reference(text, lang: str, bigram_langs=("fr", "de", "es", "it")) -> list:
    """Canonical M1 preprocessing (final_implementation.py:59-88), re-specified."""
    if not isinstance(text, str) or not text:
        return []
    stripped = text.translate(_PUNCT_TABLE)
    tokens = stripped.split()
    tokens = [w for w in tokens if w.lower() not in MERGED_STOPWORDS]
    if lang == "en":
        tokens = [lemmatize_en(w) for w in tokens]
    elif lang in ("fr", "de", "es", "it"):
        tokens = [stem_suffix(w) for w in tokens]
    if lang in bigram_langs and len(tokens) >= 2:
        tokens = tokens + ["_".join(p) for p in zip(tokens, tokens[1:])]
    return tokens


def tokenize_stem_bug(text, lang: str) -> list:
    """M2 compat GATE for the reference's substring-stem bug
    (ranking_with_bm25.py:51-74): lowercase → punctuation→space →
    stopword filter → ``text.replace(word, stem(word))`` per word — a
    SUBSTRING replace that also rewrites occurrences inside other words
    (the bug, reproduced verbatim behind this explicit opt-in mode) →
    iterative double-space collapse → split. Uses the deterministic
    ``stem_suffix`` stand-in for PorterStemmer."""
    if not isinstance(text, str) or not text:
        return []
    text = re.sub(f"[{re.escape(string.punctuation)}]", " ", text.lower())
    sw = STOPWORDS.get(lang, STOPWORDS["en"])
    text = " ".join(w for w in text.split() if w not in sw)
    for word in text.split():
        text = text.replace(word, stem_suffix(word))
    for _ in range(10):
        text = text.replace("  ", " ")
    return text.split()


def tokenize(text, lang: str, mode: str = "simple", stopword_filter: bool = False,
             bigram_langs=("fr", "de", "es", "it"), min_token_len: int = 1) -> list:
    """Single entry point used by BOTH index build and query scoring —
    every config knob must flow through here so the two sides tokenize
    identically (a build-only bigram set would make queries miss the
    indexed bigram vocabulary silently)."""
    if mode == "simple":
        toks = tokenize_simple(text, stopword_filter=stopword_filter)
    elif mode == "reference":
        toks = tokenize_reference(text, lang, bigram_langs=bigram_langs)
    elif mode == "stem_bug":
        toks = tokenize_stem_bug(text, lang)
    else:
        raise ValueError(f"unknown tokenizer mode: {mode}")
    if min_token_len > 1:
        toks = [t for t in toks if len(t) >= min_token_len]
    return toks


def tokenize_cfg(text, lang: str, cfg) -> list:
    """tokenize() driven by a TokenizerConfig."""
    return tokenize(
        text, lang, cfg.mode,
        stopword_filter=cfg.stopwords,
        bigram_langs=cfg.bigram_langs,
        min_token_len=cfg.min_token_len,
    )
