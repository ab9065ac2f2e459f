"""RSLP step-machine stemmers: Galician (full + minimal) and the
Portuguese RSLP stemmer.

The engine is `pt/RSLPStemmerBase.java` re-expressed over the vendored
rule tables in `rslp_rules.py` (parsed from the reference's .rslp
resources): a Step is an ordered rule list guarded by a min word
length and optional entry suffixes; the FIRST matching rule fires and
the step ends. A rule matches when the word ends with its suffix, the
remaining stem is at least `min_stem_len` long, and no exception
matches — exceptions are whole-word or ends-with patterns depending on
the step's flag. Replacements may be longer than the removed suffix
(the reference requires an oversized char buffer for this; Python
strings don't care).

Flows:

- ``galician_stem``          — gl/GalicianStemmer.java:40-85: plural,
  unification, adverb, augmentative-to-fixpoint, noun else verb,
  vowel, then RSLG accent removal.
- ``galician_minimal_stem``  — gl/GalicianMinimalStemmer.java:33-38:
  the Plural step only (RSLP-S).
- ``portuguese_rslp_stem``   — pt/PortugueseStemmer.java:40-105:
  plural, adverb, feminine, augmentative (once), noun else verb else
  vowel, then accent removal. (The repo's `portuguese_light_stem` in
  analysis_lang.py is the separate Savoy light stemmer.)
"""

from __future__ import annotations

from lucene_spark.rslp_rules import GALICIAN_STEPS, PORTUGUESE_STEPS


def _apply_step(step, w: str) -> str:
    min_len, whole_word_exc, conds, rules = step
    n = len(w)
    if n < min_len:
        return w
    if conds and not any(w.endswith(c) for c in conds):
        return w
    for suffix, min_stem, replacement, exceptions in rules:
        if len(w) - len(suffix) < min_stem or not w.endswith(suffix):
            continue
        if exceptions:
            if whole_word_exc:
                if w in exceptions:
                    continue
            elif any(w.endswith(e) for e in exceptions):
                continue
        return w[: len(w) - len(suffix)] + replacement
    return w


_GL_ACCENTS = str.maketrans("áéêíóú", "aeeiou")
_PT_ACCENTS = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ",
    "aaaaaaceeeeiiiinooooouuuuyy",
)


def galician_stem(w: str) -> str:
    g = GALICIAN_STEPS
    w = _apply_step(g["Plural"], w)
    w = _apply_step(g["Unification"], w)
    w = _apply_step(g["Adverb"], w)
    while True:
        old = w
        w = _apply_step(g["Augmentative"], w)
        if w == old:
            break
    old = w
    w = _apply_step(g["Noun"], w)
    if w == old:  # suffix not removed
        w = _apply_step(g["Verb"], w)
    w = _apply_step(g["Vowel"], w)
    return w.translate(_GL_ACCENTS)


def galician_minimal_stem(w: str) -> str:
    return _apply_step(GALICIAN_STEPS["Plural"], w)


def portuguese_rslp_stem(w: str) -> str:
    p = PORTUGUESE_STEPS
    w = _apply_step(p["Plural"], w)
    w = _apply_step(p["Adverb"], w)
    w = _apply_step(p["Feminine"], w)
    w = _apply_step(p["Augmentative"], w)
    old = w
    w = _apply_step(p["Noun"], w)
    if w == old:
        old = w
        w = _apply_step(p["Verb"], w)
        if w == old:
            w = _apply_step(p["Vowel"], w)
    return w.translate(_PT_ACCENTS)


RSLP_FILTERS = {
    "galician_stem": galician_stem,
    "galician_minimal_stem": galician_minimal_stem,
    "portuguese_rslp_stem": portuguese_rslp_stem,
}
