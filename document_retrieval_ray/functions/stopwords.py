"""Embedded deterministic stopword lists.

The reference loads NLTK stopword corpora for en/fr/de/es/it and merges
them into one set applied to every language (final_implementation.py:40-47,
ranking_with_bm25.py:35-46). NLTK is not available in this environment
(SURVEY.md §7), so we embed our own small, deterministic lists. The
*semantics* are preserved (merged-set membership test on ``token.lower()``);
the exact membership differs from NLTK — the test oracle uses the same
lists, so engine-vs-oracle rank identity is exact.

``EN_SQL_STOPWORDS`` is deliberately tiny and frozen: it is inlined into
DuckDB oracle SQL strings, so it must never change without updating
__ray_entry__.oracle_sql.
"""

from __future__ import annotations

# frozen: mirrored literally inside oracle SQL (``NOT IN (...)``)
EN_SQL_STOPWORDS: tuple = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

_EN = """a about above after again against all am an and any are as at be because
been before being below between both but by could did do does doing down during
each few for from further had has have having he her here hers herself him himself
his how i if in into is it its itself just me more most my myself no nor not now
of off on once only or other our ours ourselves out over own same she should so
some such than that the their theirs them themselves then there these they this
those through too under until up very was we were what when where which while who
whom why will with you your yours yourself yourselves"""

_FR = """au aux avec ce ces dans de des du elle en et eux il ils je la le les leur
lui ma mais me meme mes moi mon ne nos notre nous on ou par pas pour qu que qui sa
se ses son sur ta te tes toi ton tu un une vos votre vous etre avoir fait plus"""

_DE = """aber alle als also am an auch auf aus bei bin bis bist da damit dann das
dass dein dem den der des die dir doch du durch ein eine einem einen einer eines
er es fur hab habe hat hatte ich ihr im in ist ja kann mein mich mir mit nach
nicht noch nur oder sehr sich sie sind so uber um und uns unser vom von vor war
was weil wenn werden wie wir wird zu zum zur"""

_ES = """al algo algunos ante antes como con contra cual cuando de del desde donde
durante e el ella ellas ellos en entre era es esa ese eso esta este esto fue ha
han hasta hay la las le les lo los mas me mi mis mucho muy nada ni no nos nosotros
o os otra otro para pero poco por porque que quien se sin sobre son su sus tambien
te tiene todo todos tu un una uno unos y ya yo"""

_IT = """a ad agli ai al alla alle allo anche che chi ci coi col come con contro da
dagli dai dal dalla dalle dallo degli dei del della delle dello di dove e ed era
essere fra gli ha hanno il in io la le lei lo loro lui ma mi mia mio ne nei nel
nella noi non nostro o per piu quale quando che questo se sei si sia sono su sua
sue sui sul sulla suo tra tu tua tuo un una uno voi"""

_AR = """fi min ala an ma la ila hatha allathi kul kan lam lan qad wa aw thumma
inna anna lakin hal ay baad qabl ind lada"""

_KO = """eun neun i ga eul reul e eseo wa gwa do man ui ro euro kkaji buteo hago
geurigo hajiman geuraeseo ttoneun"""


def _mk(s: str) -> frozenset:
    return frozenset(s.split())


STOPWORDS: dict = {
    "en": _mk(_EN),
    "fr": _mk(_FR),
    "de": _mk(_DE),
    "es": _mk(_ES),
    "it": _mk(_IT),
    "ar": _mk(_AR),
    "ko": _mk(_KO),
}

# reference semantics: en+fr+de+es+it merged, applied to ALL languages
# (final_implementation.py:40-47,73)
MERGED_STOPWORDS: frozenset = frozenset().union(
    *(STOPWORDS[l] for l in ("en", "fr", "de", "es", "it"))
)
