"""Misc per-token filters from analysis/common re-expressed in Python.

All are pure string->string functions registered in
``analysis._TOKEN_FILTERS`` (applied once per unique batch token by
``_filter_map`` — the vectorized hot path). References:
  analysis/util/ElisionFilter.java:31-67 (+ FrenchAnalyzer.java:56
      DEFAULT_ARTICLES)
  analysis/tr/ApostropheFilter.java:33-55
  analysis/core/DecimalDigitFilter.java:29-62
  analysis/miscellaneous/ScandinavianNormalizationFilter.java:38-140
  analysis/miscellaneous/ScandinavianFoldingFilter.java:48-120
  analysis/de/GermanNormalizationFilter.java:40-106
  analysis/miscellaneous/CapitalizationFilter.java:32-55 (default config)
  analysis/miscellaneous/TruncateTokenFilter.java:32-56 (dynamic
      ``truncate_<n>`` registry names)
"""

from __future__ import annotations

import unicodedata

# FrenchAnalyzer.DEFAULT_ARTICLES (FrenchAnalyzer.java:56-61)
ELISION_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
)

_APOSTROPHES = ("'", "’")


def elision(token: str, articles: frozenset = ELISION_ARTICLES) -> str:
    """ElisionFilter: if the prefix before the FIRST apostrophe
    (' or U+2019) is an article, strip prefix + apostrophe."""
    idx = -1
    for i, ch in enumerate(token):
        if ch in _APOSTROPHES:
            idx = i
            break
    if idx >= 0 and token[:idx] in articles:
        return token[idx + 1 :]
    return token


def apostrophe(token: str) -> str:
    """ApostropheFilter (tr): drop everything from the first apostrophe
    (' or U+2019) on, apostrophe included."""
    for i, ch in enumerate(token):
        if ch in _APOSTROPHES:
            return token[:i]
    return token


def decimal_digit(token: str) -> str:
    """DecimalDigitFilter: fold every Unicode decimal digit (Nd) outside
    Basic Latin to its 0-9 equivalent."""
    out = []
    for ch in token:
        if ord(ch) > 0x7F and unicodedata.category(ch) == "Nd":
            out.append(chr(ord("0") + unicodedata.digit(ch)))
        else:
            out.append(ch)
    return "".join(out)


def scandinavian_normalize(token: str) -> str:
    """ScandinavianNormalizationFilter: äÄöÖ and the digraphs aa/ao/ae/
    oe/oo (any case of the second char) -> åÅæÆøØ. Single left-to-right
    pass; the second digraph char is deleted in place (the reference
    mutates the buffer and re-examines nothing, so no cascading)."""
    buf = list(token)
    i, n = 0, len(buf)
    while i < n:
        c = buf[i]
        if c == "ä":
            buf[i] = "æ"
        elif c == "Ä":
            buf[i] = "Æ"
        elif c == "ö":
            buf[i] = "ø"
        elif c == "Ö":
            buf[i] = "Ø"
        elif i + 1 < n:
            nxt = buf[i + 1]
            if c == "a" and nxt in "aoAO":
                del buf[i + 1]
                n -= 1
                buf[i] = "å"
            elif c == "A" and nxt in "aAoO":
                del buf[i + 1]
                n -= 1
                buf[i] = "Å"
            elif c == "a" and nxt in "eE":
                del buf[i + 1]
                n -= 1
                buf[i] = "æ"
            elif c == "A" and nxt in "eE":
                del buf[i + 1]
                n -= 1
                buf[i] = "Æ"
            elif c == "o" and nxt in "eEoO":
                del buf[i + 1]
                n -= 1
                buf[i] = "ø"
            elif c == "O" and nxt in "eEoO":
                del buf[i + 1]
                n -= 1
                buf[i] = "Ø"
        i += 1
    return "".join(buf)


def scandinavian_fold(token: str) -> str:
    """ScandinavianFoldingFilter: åäæ->a, öø->o (case kept), and the
    digraphs aa/ae/ao, oe/oo collapse to the first char."""
    buf = list(token)
    i, n = 0, len(buf)
    while i < n:
        c = buf[i]
        if c in "åäæ":
            buf[i] = "a"
        elif c in "ÅÄÆ":
            buf[i] = "A"
        elif c in "öø":
            buf[i] = "o"
        elif c in "ÖØ":
            buf[i] = "O"
        elif i + 1 < n:
            nxt = buf[i + 1]
            if c in "aA" and nxt in "aAeEoO":
                del buf[i + 1]
                n -= 1
            elif c in "oO" and nxt in "eEoO":
                del buf[i + 1]
                n -= 1
        i += 1
    return "".join(buf)


def german_normalize(token: str) -> str:
    """GermanNormalizationFilter: ä/ö/ü -> a/o/u, ß -> ss, and 'e' is
    deleted when the 3-state FSM sits in the umlaut state U (so 'ae'
    typed for 'ä' folds to 'a', but 'dauer' keeps its e)."""
    N, V, U = 0, 1, 2
    state = N
    out = []
    for c in token:
        if c in ("a", "o"):
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state != U:
                out.append(c)
            state = V
        elif c in ("i", "q", "y"):
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


def capitalization(token: str) -> str:
    """CapitalizationFilter with the default config (onlyFirstWord=true,
    forceFirstLetter=true, minWordLength=0): first letter upper-cased,
    the rest lower-cased."""
    if not token:
        return token
    return token[0].upper() + token[1:].lower()


def truncate(token: str, length: int) -> str:
    """TruncateTokenFilter: fixed prefix truncation (F5 stemming)."""
    return token[:length] if len(token) > length else token


MISC_FILTERS = {
    "elision": elision,
    "apostrophe": apostrophe,
    "decimal_digit": decimal_digit,
    "scandinavian_normalize": scandinavian_normalize,
    "scandinavian_fold": scandinavian_fold,
    "german_normalize": german_normalize,
    "capitalization": capitalization,
}


def dynamic_filter(name: str):
    """Parametrized registry names: ``truncate_<n>`` (TruncateTokenFilter
    length) and ``icu_transform:<ID>`` (ICUTransformFilter analog —
    analysis_icutransform.get_transliterator compound IDs). Returns None
    when the name is not a dynamic filter."""
    if name.startswith("icu_transform:"):
        from lucene_spark.analysis_icutransform import get_transliterator

        return get_transliterator(name[len("icu_transform:") :])
    if name.startswith("truncate_"):
        try:
            ln = int(name[len("truncate_") :])
        except ValueError:
            return None
        if ln < 1:
            raise ValueError(
                f"length parameter must be a positive number: {ln}"
            )
        return lambda t: truncate(t, ln)
    return None
