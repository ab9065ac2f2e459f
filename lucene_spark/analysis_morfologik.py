"""MorfologikFilter analog — dictionary lemmatization with stacked
lemmata.

Reference: analysis/morfologik/src/java/.../MorfologikFilter.java:40
(each token is looked up in a morfologik FSA dictionary; its lemmata
replace it, stacked at the same position with posIncr 0; tokens with
no analysis pass through) and TestMorfologikAnalyzer.java's case
rules: an exact-case entry wins alone (Poznania -> Poznań), otherwise
the lowercase entry applies (Liście -> liście's analyses), otherwise
the token passes through unchanged (aarona -> aarona).

THE DICTIONARY IS USER-SUPPLIED. The reference's Polish data
(PoliMorf) is GPL/CC-licensed and tens of MB — deliberately not
vendored. ``SAMPLE_ENTRIES`` below transcribes only the reference
TEST dictionary's analyses (test data, for parity vectors); real use
is ``MorfologikStemmer(your_entries)`` with entries exported from any
morfologik-format dictionary.

Analyzer integration: the inverted chain lowercases before token
filters, so plugging the stemmer through the ``morfologik`` analyzer
key applies LOWERCASE-ONLY lookups (a documented deviation — the
exact-case tier needs the standalone API on a case-preserving
pipeline).
"""

from __future__ import annotations

__all__ = ["MorfologikStemmer", "SAMPLE_ENTRIES", "morfologik_emitter"]

# reference test-dictionary analyses (TestMorfologikAnalyzer.java:40-117)
SAMPLE_ENTRIES: dict[str, tuple[str, ...]] = {
    "liście": ("liście", "liść", "list", "lista"),
    "danych": ("dany", "dana", "dane", "dać"),
    "t": ("tom", "tona"),
    "Poznania": ("Poznań",),
    "poznania": ("poznanie", "poznać"),
    "Aarona": ("Aaron",),
    "AGD": ("AGD", "artykuły gospodarstwa domowego"),
    "agd": ("artykuły gospodarstwa domowego",),
}


class MorfologikStemmer:
    """entries: surface -> ordered lemma tuple. Case-sensitive keys;
    lookup order = exact surface, then lowercase (MorfologikFilter's
    case folding via Dictionary metadata), then passthrough."""

    def __init__(self, entries: dict[str, tuple[str, ...]] | None = None):
        self._exact = dict(entries if entries is not None else SAMPLE_ENTRIES)
        # lowercase tier: ONLY lowercase-keyed entries — a capitalized
        # (proper-noun) entry never matches a lowercase token
        # ("Aarona" -> Aaron but "aarona" passes through, reference
        # test :114-115)
        self._lower = {
            k: tuple(v) for k, v in self._exact.items() if k == k.lower()
        }

    def stem(self, token: str) -> tuple[str, ...]:
        hit = self._exact.get(token)
        if hit is not None:
            return tuple(hit)
        hit = self._lower.get(token.lower())
        if hit is not None:
            return tuple(hit)
        return (token,)


def morfologik_emitter(conf):
    """Analyzer-chain expand hook (lowercased stream — see module
    docstring): token -> same-position lemma stack."""
    entries = None
    if isinstance(conf, dict):
        entries = conf.get("entries")
    st = MorfologikStemmer(entries)
    return st.stem
