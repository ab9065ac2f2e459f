"""Analysis chain: tokenizer + lowercase + optional stop filter.

Replicates the *semantics* of the reference's default chain
(`lucene/analysis/standard/StandardAnalyzer.java:85-90` = StandardTokenizer
-> LowerCaseFilter -> StopFilter with an EMPTY default stopset):

- Tokens are maximal runs of word characters. We implement a documented
  UAX#29 subset: ``[0-9A-Za-z_]+`` over the lowercased text (underscore is
  ExtendNumLet in UAX#29 word-break and joins words, matching
  StandardTokenizer on identifiers like ``foo_bar``; MidLetter/MidNumLet
  joins for ``.``/``'`` are NOT applied — a documented deviation,
  analysis/standard/StandardTokenizer.java:38).
- maxTokenLength = 255 (StandardTokenizer.java:77): longer runs are split
  every 255 chars, like the JFlex buffer does.
- LowerCaseFilter (analysis/LowerCaseFilter.java) = str.lower() first, so
  query-side and index-side agree.
- StopFilter (analysis/StopFilter.java) removes stopwords but *advances
  the position increment*, leaving holes so phrase semantics survive.
  Default stopset is EMPTY (StandardAnalyzer.java:47-50).

THE ORACLE CONTRACT: the exact same tokenization must be expressible in
ANSI SQL for the DuckDB cross-check. ``TOKEN_REGEX_SQL`` is that regex;
``tokenize()`` and ``regexp_extract_all(lower(text), TOKEN_REGEX_SQL)``
produce identical token streams for any input (RE2 and Python `re` agree
on this pattern).

Everything is pandas/numpy-vectorized per Arrow batch — no per-row Python
in the Spark hot path (the UDF receives a pandas Series of documents).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

from lucene_spark.analysis_cjk import cjk_bigrams, cjk_split, cjk_width_fold
from lucene_spark.smallfloat import int_to_byte4

MAX_TOKEN_LENGTH = 255  # StandardTokenizer.java:77
TOKEN_REGEX = re.compile(r"[0-9a-z_]+")
TOKEN_REGEX_SQL = "[0-9a-z_]+"  # identical RE2 pattern for DuckDB oracles


# ---------------------------------------------------------------------------
# analysis/common zoo: char filter + token filters, configured per index
# via an ``analyzer`` dict stored in the manifest so index- and
# query-time analysis always agree (Analyzer reuse contract):
#
#   {"ascii_fold": bool,                  # ASCIIFoldingFilter (pre-tokenize)
#    "stopwords": [..],                   # StopFilter set
#    "synonyms": {tok: [syn, ..]},        # SynonymFilter, index-time expand
#    "keep_orig": bool,                   # SynonymMap keepOrig
#    "filters": ["english_minimal_stem" | "porter_stem", ..]}
#
# Chain order: ascii_fold -> tokenize -> lowercase is implicit (we fold
# the lowered text) -> StopFilter -> SynonymFilter (injected tokens at
# the same position, posIncr=0) -> stemmers. Injected tokens do NOT
# count toward the field length (discountOverlaps=true default,
# BM25Similarity / TFIDFSimilarity "discountOverlaps"), so synonyms
# leave dl/norms unchanged. Query-side analysis applies the same chain
# MINUS synonym expansion (index-time expansion indexes the synonym;
# expanding again at query time would double-match).
# ---------------------------------------------------------------------------

# Non-decomposable Latin-1/Latin-A folds from ASCIIFoldingFilter.java
# (the NFKD pass handles every accent that decomposes to base+mark).
_FOLD_SUPPLEMENT = str.maketrans(
    {
        "ß": "ss", "æ": "ae", "ø": "o", "þ": "th", "ð": "d",
        "đ": "d", "ħ": "h", "ı": "i", "ĸ": "k", "ł": "l",
        "ŋ": "n", "œ": "oe", "ŧ": "t", "ſ": "s",
    }
)
_COMBINING_RE = re.compile(
    "[\\u0300-\\u036f\\u1ab0-\\u1aff\\u1dc0-\\u1dff\\u20d0-\\u20ff\\ufe20-\\ufe2f]"
)


def fold_ascii(text: str) -> str:
    """ASCIIFoldingFilter analog (miscellaneous/ASCIIFoldingFilter.java):
    NFKD-decompose, strip combining marks, fold the non-decomposable
    Latin supplements. Applied to the lowered text BEFORE tokenization
    (our tokenizer's ASCII alphabet would otherwise split at accented
    chars — a documented consequence of the UAX#29-subset tokenizer)."""
    return _COMBINING_RE.sub(
        "", unicodedata.normalize("NFKD", text)
    ).translate(_FOLD_SUPPLEMENT)


# ---------------------------------------------------------------------------
# UAX#29 word-break joins (analysis/standard/StandardTokenizer.java:38):
# '.' (MidNumLet) and "'" (Single_Quote/MidNumLetQ) do NOT break a word
# when flanked by two letters (WB6/WB7) or two digits (WB11/WB12) —
# "don't", "3.14" and "foo.bar" stay single tokens. Implemented as a
# two-pass marker substitution: valid separators become the uppercase
# markers D / Q (impossible in the lowered text), the token regex
# accepts markers, and tokens restore them. Two passes resolve chains
# like "a.b.c.d" (pass 1 consumes every other separator, pass 2 the
# stranded ones; non-overlapping leftmost semantics are identical in
# Python `re` and RE2, so ``uax29_tokens_sql`` reproduces the exact
# stream for the DuckDB oracles). Documented deviations from full
# UAX#29: '_' (ExtendNumLet) does not enable joins, and MidLetter
# chars other than the apostrophe (e.g. ':') are not joined.
# ---------------------------------------------------------------------------

# Token-PIECE count regexes (Java dialect — Spark-side only; DuckDB
# oracles use the marker-substitution twin since RE2 lacks lookbehind).
# One match per emitted token piece: a maximal token run chunked {1,255}
# greedily = ceil(run_len/255) matches (StandardTokenizer.java:77), so
# regexp_count(lower(text), rx) IS the field length dl — no
# regexp_extract_all array materialization, no substitution passes.
# The uax29 variant extends runs through join-eligible separators
# (letter[.']letter / digit[.']digit, the two-pass marking semantics:
# every eligible separator joins — lookarounds see original flanks, so
# overlap-counting is exact); separator chars count toward piece length
# exactly like the markers do in the Python chain.
PIECE_REGEX_SQL = "[0-9a-z_]{1,255}"
UAX_PIECE_REGEX_SQL = (
    "(?:[0-9a-z_]"
    "|(?<=[a-z])['.](?=[a-z])"
    "|(?<=[0-9])['.](?=[0-9])"
    "){1,255}"
)

_UAX_JOIN_RULES = [  # (pattern, marker replacement)
    (re.compile(r"([a-z])\.([a-z])"), r"\1D\2"),
    (re.compile(r"([a-z])'([a-z])"), r"\1Q\2"),
    (re.compile(r"([0-9])\.([0-9])"), r"\1D\2"),
    (re.compile(r"([0-9])'([0-9])"), r"\1Q\2"),
]
UAX_TOKEN_REGEX = re.compile(r"[0-9a-z_DQ]+")
# tokenizer="unicode": Unicode letters/digits/underscore (\w, lowered) —
# the non-ASCII-language companion to the language-zoo stemmers
# (analysis_lang.py). SQL twin via RE2 character classes.
UNICODE_TOKEN_REGEX = re.compile(r"\w+")
UNICODE_TOKEN_REGEX_SQL = r"[\p{L}\p{N}_]+"
# tokenizer="icu" (with the icu_segment pre-splitter): like `unicode`
# but Thai/Lao/Khmer runs keep their combining marks (Mn is not \w;
# \w+ would split "ที่" at the vowel/tone marks)
ICU_TOKEN_REGEX = re.compile(r"[\u0e00-\u0eff\u1780-\u17ff]+|\w+")


def _token_regex(tokenizer: str):
    if tokenizer == "uax29":
        return UAX_TOKEN_REGEX
    if tokenizer == "unicode":
        return UNICODE_TOKEN_REGEX
    if tokenizer == "icu":
        return ICU_TOKEN_REGEX
    return TOKEN_REGEX


def path_hierarchy_tokens(text: str, delimiter: str = "/",
                          replacement: str | None = None, skip: int = 0,
                          reverse: bool = False) -> list[str]:
    """PathHierarchyTokenizer / ReversePathHierarchyTokenizer analog
    (analysis/path/PathHierarchyTokenizer.java:70-181,
    ReversePathHierarchyTokenizer.java:124-170).

    Forward: every prefix ending at a delimiter plus the whole string
    ("/a/b/c" -> "/a", "/a/b", "/a/b/c"); ``skip`` drops the first
    ``skip`` path components and re-heads each token with the
    replacement delimiter ("/a/b/c", skip=1 -> "/b", "/b/c").
    Reverse: every suffix starting after a delimiter plus the whole
    string; ``skip`` trims the LAST ``skip`` components. Delimiters are
    rewritten to ``replacement`` in the emitted tokens. All tokens
    share one position (posIncr 1, 0, 0, ... in the reference), so the
    caller scores them as overlaps (dl = 1).

    Case is preserved — the reference tokenizer does not lowercase.
    """
    if skip < 0:
        raise ValueError("skip cannot be negative")
    repl = delimiter if replacement is None else replacement
    if not text:
        return []
    if reverse:
        # delimiterPositions = [0] + (index+1 per delimiter) + [len]
        positions = [0]
        positions += [i + 1 for i, ch in enumerate(text) if ch == delimiter]
        if positions[-1] < len(text):
            positions.append(len(text))
        count = len(positions)
        idx = count - 1 - skip
        if idx < 0:
            return []
        end = positions[idx]
        replaced = text.replace(delimiter, repl)
        return [replaced[positions[k]:end] for k in range(count - skip - 1)]
    tokens: list[str] = []
    buf: list[str] = []
    skipped = 0
    for i, ch in enumerate(text):
        is_d = ch == delimiter
        if i == 0:
            # the first char always consumes one skip unit, delimiter
            # or not (PathHierarchyTokenizer.java:146-152)
            skipped += 1
            if skipped > skip:
                buf.append(repl if is_d else ch)
        elif is_d:
            if skipped > skip:
                tokens.append("".join(buf))
                buf.append(repl)
            else:
                skipped += 1
                if skipped > skip:
                    buf.append(repl)
        elif skipped > skip:
            buf.append(ch)
    if skipped > skip and buf:
        tokens.append("".join(buf))
    return tokens


_PATH_TOKENIZERS = ("path_hierarchy", "path_hierarchy_reverse")


def _path_analyzer_cfg(analyzer: dict) -> dict:
    """Validate + normalize the path-tokenizer analyzer config. The
    path tokenizers emit same-position overlap tokens and preserve
    case, so they compose with char_filters and the str->str ``filters``
    chain only."""
    allowed = {"tokenizer", "path", "char_filters", "filters"}
    # keys that round-trip through the manifest with null/false values
    # are not "configured" — only truthy extras conflict
    extra = {k for k, v in analyzer.items() if k not in allowed and v}
    if extra:
        raise ValueError(
            f"path_hierarchy tokenizer does not compose with {sorted(extra)}"
        )
    cfg = dict(analyzer.get("path") or {})
    cfg.setdefault("delimiter", "/")
    cfg.setdefault("replacement", None)
    cfg.setdefault("skip", 0)
    cfg["reverse"] = analyzer["tokenizer"] == "path_hierarchy_reverse"
    return cfg
_UAX_RESTORE = str.maketrans({"D": ".", "Q": "'"})


def uax29_join(text: str) -> str:
    """Mark join-eligible separators in lowered text (two passes)."""
    for _ in range(2):
        for pat, rep in _UAX_JOIN_RULES:
            text = pat.sub(rep, text)
    return text


def _uax29_restore(tok: str) -> str:
    return tok.translate(_UAX_RESTORE) if ("D" in tok or "Q" in tok) else tok


def uax29_tokens_sql(col: str) -> str:
    """DuckDB expression: token list of ``col`` under the uax29
    tokenizer — the same two-pass marker replaces, token regex and
    restore as the Python chain."""
    s = f"lower({col})"
    for _ in range(2):
        for pat, marker in (
            (r"([a-z])\.([a-z])", "D"),
            (r"([a-z])''([a-z])", "Q"),
            (r"([0-9])\.([0-9])", "D"),
            (r"([0-9])''([0-9])", "Q"),
        ):
            s = f"regexp_replace({s}, '{pat}', '\\1{marker}\\2', 'g')"
    return (
        f"list_transform(regexp_extract_all({s}, '[0-9a-z_DQ]+'), "
        f"t -> replace(replace(t, 'D', '.'), 'Q', ''''))"
    )


def english_minimal_stem(w: str) -> str:
    """Harman S-stemmer (en/EnglishMinimalStemmer.java:26-44):
    plural-only stripping. Mirrors the reference rule-for-rule; also
    expressed in ANSI SQL by ``MINIMAL_STEM_SQL`` for the oracles."""
    if len(w) < 3 or w[-1] != "s":
        return w
    c = w[-2]
    if c in ("u", "s"):
        return w
    if c == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "e"):
            return w
    return w[:-1]


def minimal_stem_sql(col: str) -> str:
    """The exact EnglishMinimalStemmer rules as a SQL CASE over ``col``
    (for the DuckDB oracle cross-check)."""
    L = f"length({col})"
    c2 = f"substr({col}, {L}-1, 1)"   # s[len-2]
    c3 = f"substr({col}, {L}-2, 1)"   # s[len-3]
    c4 = f"substr({col}, {L}-3, 1)"   # s[len-4]
    return (
        f"CASE WHEN {L} < 3 OR substr({col}, {L}, 1) != 's' THEN {col} "
        f"WHEN {c2} IN ('u','s') THEN {col} "
        f"WHEN {c2} = 'e' THEN ("
        f"  CASE WHEN {L} > 3 AND {c3} = 'i' AND {c4} NOT IN ('a','e')"
        f"       THEN substr({col}, 1, {L}-3) || 'y' "
        f"       WHEN {c3} IN ('i','a','o','e') THEN {col} "
        f"       ELSE substr({col}, 1, {L}-1) END) "
        f"ELSE substr({col}, 1, {L}-1) END"
    )


# --- Porter stemmer (en/PorterStemmer.java, Porter 1980 + official
# errata: step2 y->i needs a vowel in the stem, "bli"->"ble",
# "logi"->"log"). Verified against the reference's porterTestData
# vocabulary in tests/test_analysis_chain.py. ---

_VOWELS = frozenset("aeiou")


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V] over the whole string."""
    m, i, n = 0, 0, len(w)
    while i < n and _cons(w, i):
        i += 1
    while True:
        while i < n and not _cons(w, i):
            i += 1
        if i >= n:
            return m
        m += 1
        while i < n and _cons(w, i):
            i += 1


def _has_vowel(w: str) -> bool:
    return any(not _cons(w, i) for i in range(len(w)))


def _doublec(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    n = len(w)
    if n < 3 or not _cons(w, n - 1) or _cons(w, n - 2) or not _cons(w, n - 3):
        return False
    return w[-1] not in "wxy"


_STEP3 = [  # (suffix, replacement), m(stem) > 0
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]
_STEP4 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP5 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    # step 1a: plurals
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("s") and not w.endswith("ss"):
        w = w[:-1]
    # step 1b: -ed / -ing
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        stem = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            stem = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            stem = w[:-3]
        if stem is not None:
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _doublec(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"
    # step 2 (paper 1c, official variant): y -> i with a vowel in the stem
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # steps 3 + 4: double suffixes, m(stem) > 0
    for table in (_STEP3, _STEP4):
        for suf, rep in table:
            if w.endswith(suf):
                if _measure(w[: -len(suf)]) > 0:
                    w = w[: -len(suf)] + rep
                break
    # step 5: strip in <c>vcvc<v> context, m(stem) > 1
    for suf in _STEP5:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break
    # step 6: final -e, final double -l
    if w.endswith("e"):
        a = _measure(w)
        if a > 1 or (a == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    if w.endswith("l") and _doublec(w) and _measure(w) > 1:
        w = w[:-1]
    return w


_TOKEN_FILTERS = {
    "english_minimal_stem": english_minimal_stem,
    "porter_stem": porter_stem,
}

# language zoo (analysis/common light stemmers — see analysis_lang.py)
from lucene_spark.analysis_lang import LIGHT_STEMMERS as _LIGHT_STEMMERS  # noqa: E402

_TOKEN_FILTERS.update(_LIGHT_STEMMERS)

# snowball family (tartarus/snowball/ext — see analysis_snowball.py)
from lucene_spark.analysis_snowball import SNOWBALL_STEMMERS as _SNOWBALL  # noqa: E402

_TOKEN_FILTERS.update(_SNOWBALL)

# phonetic encoders, replace mode (analysis/phonetic PhoneticFilter with
# inject=false; see analysis_phonetic.py — inject mode is the "phonetic"
# analyzer key, handled like synonym injection)
from lucene_spark.analysis_phonetic import PHONETIC_FILTERS as _PHONETIC  # noqa: E402

_TOKEN_FILTERS.update(_PHONETIC)

# analysis/icu analogs: nfkc_cf normalizer + UTR#30 folding (see
# analysis_icu.py — stdlib unicodedata, no binary .nrm data)
from lucene_spark.analysis_icu import ICU_FILTERS as _ICU  # noqa: E402

_TOKEN_FILTERS.update(_ICU)

# Brazilian Portuguese stemmer (br/BrazilianStemmer.java — see
# analysis_br.py; verified against the reference's 82 test pairs)
from lucene_spark.analysis_br import brazilian_stem as _brazilian_stem  # noqa: E402

_TOKEN_FILTERS["brazilian_stem"] = _brazilian_stem

# international zoo (ar/fa/hi/ckb/cz/bg/bn/id/lv/no/sr — see
# analysis_intl.py; previously importable as functions only, now
# registry names usable in analyzer {"filters": [...]} configs)
from lucene_spark.analysis_intl import INTL_FILTERS as _INTL  # noqa: E402

_TOKEN_FILTERS.update(_INTL)

# misc zoo: elision, apostrophe, decimal digits, scandinavian
# normalize/fold, german normalize, capitalization (analysis_misc.py)
from lucene_spark.analysis_misc import (  # noqa: E402
    MISC_FILTERS as _MISC,
    dynamic_filter as _dynamic_filter,
)

_TOKEN_FILTERS.update(_MISC)


def _resolve_filter(name: str):
    """Registry lookup + parametrized names (``truncate_<n>``,
    ``stempel:<table_path>``)."""
    fn = _TOKEN_FILTERS.get(name)
    if fn is None and name.startswith("stempel:"):
        # Egothor/stempel stemmer with a user-supplied trained table
        # (analysis_stempel.py; table cached per worker)
        from lucene_spark.analysis_stempel import stempel_dynamic

        fn = stempel_dynamic(name)
    if fn is None:
        fn = _dynamic_filter(name)
    if fn is None:
        raise KeyError(f"unknown token filter {name!r}")
    return fn


def ngram_emitter(conf: dict):
    """NGramTokenFilter / EdgeNGramTokenFilter analog
    (analysis/ngram/NGramTokenFilter.java:36, EdgeNGramTokenFilter.java:
    35): emit every n-gram (or edge n-gram) of each token at the SOURCE
    position (posIncr=0 overlaps since 7.4, offsets keep the whole-token
    span) — dl/norms discount the grams exactly like synonym injections.
    ``preserve_original`` keeps the surface token too (keepShortTerm /
    preserveOriginal flag). Documented deviation: a token shorter than
    ``min`` passes through unchanged instead of being dropped (keeps dl
    identical to the SQL twin; the reference drops it unless
    preserveOriginal).

    conf: {"min": int, "max": int, "edge": bool, "preserve_original": bool}
    """
    mn = int(conf.get("min", 1))
    mx = int(conf.get("max", 2))
    edge = bool(conf.get("edge", False))
    keep = bool(conf.get("preserve_original", False))
    if mn < 1 or mx < mn:
        raise ValueError(f"bad ngram range: min={mn}, max={mx}")

    def emit(t: str) -> tuple:
        if len(t) < mn:
            return (t,)
        out = [t] if keep else []
        if edge:
            out += [t[:ln] for ln in range(mn, min(mx, len(t)) + 1)]
        else:
            out += [
                t[i : i + ln]
                for ln in range(mn, mx + 1)
                for i in range(len(t) - ln + 1)
            ]
        # keep=True can duplicate the full token (it is its own gram
        # when len(t) <= mx) — the reference emits it once
        if keep and len(t) <= mx:
            out = [t] + [g for g in out[1:] if g != t]
        return tuple(out)

    return emit


def compound_emitter(conf: dict):
    """DictionaryCompoundWordTokenFilter analog (analysis/compound/
    DictionaryCompoundWordTokenFilter.java:66-95 +
    CompoundWordTokenFilterBase.java:100-127): tokens of at least
    ``min_word`` chars emit every dictionary subword of length
    [min_subword, max_subword] found at any start offset, stacked at
    the source position (posIncr=0 — the original is ALWAYS kept, so
    dl/norms discount the subwords like synonym injections).
    ``only_longest`` keeps only the longest match per start offset.
    Matching is case-insensitive via a lowercased dictionary (the
    reference uses an ignoreCase CharArraySet; our chain has already
    lowercased the token).

    conf: {"dictionary": iterable[str], "min_word": 5, "min_subword": 2,
           "max_subword": 15, "only_longest": False}
    """
    dic = frozenset(w.lower() for w in conf.get("dictionary") or ())
    if not dic:
        raise ValueError("compound dictionary must not be empty")
    min_word = int(conf.get("min_word", 5))
    min_sub = int(conf.get("min_subword", 2))
    max_sub = int(conf.get("max_subword", 15))
    only_longest = bool(conf.get("only_longest", False))
    if min_sub < 1 or max_sub < min_sub:
        raise ValueError(
            f"bad subword range: min={min_sub}, max={max_sub}")

    def emit(t: str) -> tuple:
        n = len(t)
        if n < min_word:
            return (t,)
        out = [t]
        for i in range(0, n - min_sub + 1):
            longest = None
            for j in range(min_sub, max_sub + 1):
                if i + j > n:
                    break
                sub = t[i : i + j]
                if sub in dic:
                    if only_longest:
                        if longest is None or len(longest) < j:
                            longest = sub
                    else:
                        out.append(sub)
            if only_longest and longest is not None:
                out.append(longest)
        return tuple(out)

    return emit


class _Filters(list):
    """The normalized filter chain: a plain list of registry names plus
    the optional keyword-marker/stemmer-override protection pair. Truthy
    whenever there is ANY term-mapping work to do (filters or protect),
    so the chain's `if filters:` routing stays a single check."""

    def __init__(self, names, protect=None):
        super().__init__(names)
        self.protect = protect

    def __bool__(self):  # noqa: D105
        return len(self) > 0 or self.protect is not None


def _filter_map(vocab, filters, protect=None) -> dict[str, str]:
    """Apply the token-filter chain once per UNIQUE token (the hot-path
    trick: factorize the batch vocabulary, stem each unique surface form
    once, map the stream through the dict).

    ``protect``: optional (keyword_set, overrides) pair —
    KeywordMarkerFilter (analysis/miscellaneous/KeywordMarkerFilter.java:
    keyword-marked tokens pass every stemmer untouched) and
    StemmerOverrideFilter (StemmerOverrideFilter.java:46: the override
    IS the output and sets the keyword flag, so later stemmers skip)."""
    if protect is None:
        protect = getattr(filters, "protect", None)
    keyword_set, overrides = protect or (None, None)
    fns = [_resolve_filter(f) for f in filters]
    out = {}
    for t in vocab:
        if keyword_set and t in keyword_set:
            out[t] = t
            continue
        if overrides and t in overrides:
            out[t] = overrides[t]
            continue
        v = t
        for fn in fns:
            v = fn(v)
        out[t] = v
    return out


_WD_RULES = [
    # WordDelimiterGraphFilter analog (analysis/common/.../miscellaneous/
    # WordDelimiterGraphFilter.java, default flags GENERATE_WORD_PARTS |
    # GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS):
    # intra-word case / digit / underscore boundaries become token
    # breaks BEFORE lowercasing, expressed as a vectorizable string
    # rewrite — "getHTTPResponse_v2" -> "get HTTP Response v 2". Parts
    # take consecutive positions (the parts-only subset of the
    # reference's token graph; catenate/preserveOriginal variants are
    # not reproduced).
    (re.compile(r"_"), " "),
    (re.compile(r"([A-Z]+)([A-Z][a-z])"), r"\1 \2"),  # HTTPServer -> HTTP Server
    (re.compile(r"([a-z])([A-Z])"), r"\1 \2"),        # camelCase -> camel Case
    (re.compile(r"([A-Za-z])([0-9])"), r"\1 \2"),     # v2 -> v 2
    (re.compile(r"([0-9])([A-Za-z])"), r"\1 \2"),     # 2x -> 2 x
]


def word_delimit(text: str) -> str:
    """Apply the word-delimiter split rules to (case-intact) text."""
    for rx, rep in _WD_RULES:
        text = rx.sub(rep, text)
    return text


def word_delimit_sql(col: str) -> str:
    """DuckDB expression mirroring ``word_delimit`` (oracle parity):
    the same substitutions, chained regexp_replace with the 'g' flag."""
    s = col
    for rx, rep in _WD_RULES:
        pat = rx.pattern.replace("'", "''")
        rep_sql = rep.replace("\\1", "\\1").replace("'", "''")
        s = f"regexp_replace({s}, '{pat}', '{rep_sql}', 'g')"
    return s


class _DropSet:
    """StopFilter ∪ LengthFilter drop predicate. ``t in dropset`` means
    DROP (position hole; FilteringTokenFilter keeps posIncr holes for
    both filters). LengthFilter (analysis/miscellaneous/
    LengthFilter.java:30-48): keep tokens with min <= len <= max."""

    __slots__ = ("stop", "mn", "mx")

    def __init__(self, stop, mn: int, mx: int):
        if mn < 0:
            raise ValueError(f"minimum length must be >= 0: {mn}")
        if mn > mx:
            raise ValueError(f"maximum must be >= minimum: {mn} > {mx}")
        self.stop, self.mn, self.mx = stop, mn, mx

    def __contains__(self, t) -> bool:
        if self.stop is not None and t in self.stop:
            return True
        return not (self.mn <= len(t) <= self.mx)

    def __bool__(self) -> bool:  # always an active predicate
        return True


def _norm_analyzer(analyzer: dict | None, stopwords=None):
    """Normalize the analyzer config + legacy stopwords arg into
    (tokenizer, fold, stopset, synonyms, keep_orig, filters, wd,
    shingles, cjk, expand, fp). ``stopset`` may be a `_DropSet`
    (stopwords ∪ LengthFilter); ``shingles`` is None | "all" |
    frozenset(common words); ``fp`` is the FingerprintFilter config."""
    a = analyzer or {}
    stopset = stopwords if stopwords is not None else (
        frozenset(a["stopwords"]) if a.get("stopwords") else None
    )
    if a.get("length"):
        # LengthFilter config {"min": int, "max": int} — composes with
        # the stopset into one drop predicate (both leave holes)
        ln = a["length"]
        stopset = _DropSet(
            stopset, int(ln.get("min", 0)), int(ln.get("max", 1 << 30))
        )
    # DEFAULT = "uax29": the MidNumLet/MidLetter join rules keep
    # "don't" / "3.14" / "foo.bar" single tokens like the reference
    # StandardTokenizer (JFlex UAX#29, StandardTokenizer.java:38).
    # "standard" opts back into the plain [0-9a-z_]+ subset. The
    # word_delimiter pre-splitter defaults to "standard": its split
    # boundaries ('.' between identifier parts) are exactly the chars
    # the uax29 joins would re-glue, so composing them undoes the split.
    # cjk (CJKAnalyzer.java) needs the `unicode` regex so spaced-out CJK
    # chars survive tokenization at all.
    cjk = a.get("cjk", False)  # False | True | "unigrams"
    # icu_segment (ICUTokenizer analog): SEA dictionary pre-split +
    # the mark-preserving `icu` token regex
    default_tok = ("unicode" if cjk or a.get("morfologik")
                   else "icu" if a.get("icu_segment")
                   else "standard" if a.get("word_delimiter") else "uax29")
    # one same-position token-expansion slot: phonetic codes OR n-grams
    # (both emit extra terms at the source position, posIncr=0)
    expand = a.get("phonetic")
    if expand is not None:
        from lucene_spark.analysis_phonetic import phonetic_emitter

        expand = phonetic_emitter(expand)
    if a.get("token_ngrams"):
        if expand is not None:
            raise ValueError("phonetic and token_ngrams are mutually exclusive")
        expand = ngram_emitter(a["token_ngrams"])
    if a.get("compound"):
        if expand is not None:
            raise ValueError("compound is mutually exclusive with "
                             "phonetic/token_ngrams")
        expand = compound_emitter(a["compound"])
    if a.get("morfologik"):
        # MorfologikFilter analog: lemma stack replaces the token
        # (analysis_morfologik.py; lowercase-tier lookups here)
        if expand is not None:
            raise ValueError("morfologik is mutually exclusive with "
                             "phonetic/token_ngrams/compound")
        from lucene_spark.analysis_morfologik import morfologik_emitter

        expand = morfologik_emitter(a["morfologik"])
    # KeywordMarkerFilter / StemmerOverrideFilter config: terms the
    # stemmer chain must not touch, and explicit surface->stem overrides
    protect = None
    if a.get("keyword_marker") or a.get("stem_overrides"):
        protect = (
            frozenset(a.get("keyword_marker") or ()),
            dict(a.get("stem_overrides") or {}),
        )
    # shingle slot: "all" = ShingleFilter bigrams; a frozenset =
    # CommonGramsFilter (bigram only when either member is common)
    if a.get("shingles") and a.get("common_grams"):
        raise ValueError("shingles and common_grams are mutually exclusive")
    shingles = (
        "all"
        if a.get("shingles")
        else (frozenset(a["common_grams"]) if a.get("common_grams") else None)
    )
    # FingerprintFilter config: True or {"separator": str, "max_size": int}
    fp = a.get("fingerprint")
    if fp is True:
        fp = {}
    cf = _char_filter_fns(a["char_filters"]) if a.get("char_filters") else None
    return (
        a.get("tokenizer", default_tok),
        bool(a.get("ascii_fold")),
        stopset,
        {k: list(v) for k, v in (a.get("synonyms") or {}).items()},
        bool(a.get("keep_orig", True)),
        _Filters(list(a.get("filters") or []), protect),
        bool(a.get("word_delimiter")),
        shingles,
        cjk,
        expand,
        fp,
        cf,
    )


def _char_filter_fns(specs: list) -> list:
    """CharFilter chain configs -> (compiled_regex, replacement) pairs,
    applied to the raw text BEFORE the tokenizer (the reference wraps
    the Reader):

    - ``{"type": "pattern_replace", "pattern": .., "replacement": ..}``
      = PatternReplaceCharFilter (analysis/pattern/
      PatternReplaceCharFilter.java:41) — regex substitution over the
      whole input (Python regex dialect, backrefs ``\\1``).
    - ``{"type": "mapping", "map": {src: dst, ..}}`` = MappingCharFilter
      (analysis/charfilter/MappingCharFilter.java + NormalizeCharMap):
      greedy longest-match-at-position, expressed as an alternation
      regex with keys sorted longest-first (re picks the first matching
      alternative, so longest wins like the reference's FST walk).

    - ``{"type": "html_strip", "escaped_tags": [..]}`` =
      HTMLStripCharFilter (analysis/charfilter/HTMLStripCharFilter
      .jflex): tag/comment/script/style/entity stripping via the
      scanner in ``analysis_html.py`` — entry is a plain callable.

    Offset correction is NOT maintained (length-changing char filters
    reject ``want_offsets``, like the other length-changing chains)."""
    out = []
    for spec in specs:
        typ = spec.get("type", "pattern_replace")
        if typ == "pattern_replace":
            out.append(
                (re.compile(spec["pattern"]), spec.get("replacement", ""))
            )
        elif typ == "html_strip":
            from lucene_spark.analysis_html import html_strip

            esc = frozenset(
                t.lower() for t in (spec.get("escaped_tags") or ())
            )
            out.append(lambda s, _e=esc: html_strip(s, _e))
        elif typ == "mapping":
            m = dict(spec["map"])
            if not m or any(not k for k in m):
                raise ValueError("mapping char filter needs non-empty keys")
            keys = sorted(m, key=len, reverse=True)
            rx = re.compile("|".join(re.escape(k) for k in keys))
            out.append((rx, lambda mt, _m=m: _m[mt.group(0)]))
        else:
            raise ValueError(f"unknown char filter type {typ!r}")
    return out


def _fingerprint_terms(terms: list, fp: dict) -> list:
    """FingerprintFilter analog (analysis/miscellaneous/
    FingerprintFilter.java:33-141): the whole stream collapses to ONE
    token = sorted, de-duplicated terms joined by ``separator``; if the
    joined size exceeds ``max_size`` the output is EMPTY (the reference
    emits nothing, line 132-135)."""
    sep = fp.get("separator", " ")
    max_size = int(fp.get("max_size", 1024))
    uniq = sorted(set(terms))
    if not uniq:
        return []
    joined = sep.join(uniq)
    if len(joined) > max_size:
        return []
    return [joined]


def _add_shingles(terms: list, positions: list, sep: str = "_",
                  common=None):
    """ShingleFilter analog (analysis/common/.../shingle/ShingleFilter
    .java, minShingleSize=maxShingleSize=2, outputUnigrams=true):
    adjacent-token bigrams appended after the unigram stream, each at
    its FIRST token's position (posIncr=0 overlap -> discounted from dl
    like synonym injections). Adjacency means positions differ by
    exactly 1, so a stopword hole breaks the shingle (the reference
    inserts a filler token; we emit no shingle across the hole —
    documented deviation, fillers never match real terms anyway).

    ``common`` switches to CommonGramsFilter semantics
    (analysis/commongrams/CommonGramsFilter.java:52-168): the bigram is
    emitted only when EITHER member is a common word (isCommon() ||
    lastWasCommon, line 113), same '_' separator, same posIncr=0
    overlap at the first member's position."""
    sh_t, sh_p = [], []
    for i in range(len(terms) - 1):
        if positions[i + 1] == positions[i] + 1 and (
            common is None
            or terms[i] in common
            or terms[i + 1] in common
        ):
            sh_t.append(terms[i] + sep + terms[i + 1])
            sh_p.append(positions[i])
    return terms + sh_t, positions + sh_p


def tokenize(text: str, stopwords: frozenset | None = None,
             analyzer: dict | None = None, expand_synonyms: bool = True):
    """One document -> (terms:list[str], positions:list[int]).

    Positions count stopword holes (StopFilter position increments);
    synonym-injected terms repeat the source position (posIncr=0)."""
    a = analyzer or {}
    if a.get("ja") not in (None, False):
        # Japanese morphological analysis (kuromoji analog) — the
        # Viterbi tokenizer replaces the regex tokenizer and carries
        # its own filter chain (analysis_ja.ja_tokenize)
        from lucene_spark.analysis_ja import ja_tokenize

        return ja_tokenize(text, a["ja"])
    if a.get("ko") not in (None, False) or a.get("zh") not in (None, False):
        # Korean (nori analog) / Chinese (smartcn analog) lattice
        # tokenizers (analysis_lattice.py)
        from lucene_spark.analysis_lattice import KO_TOKENIZER, ZH_TOKENIZER

        cfg = a.get("ko") if a.get("ko") not in (None, False) else a.get("zh")
        tok = KO_TOKENIZER if a.get("ko") not in (None, False) else ZH_TOKENIZER
        cfg = cfg if isinstance(cfg, dict) else {}
        return tok.tokenize(
            text or "",
            frozenset(cfg["pos_stop"]) if cfg.get("pos_stop") else None,
            bool(cfg.get("discard_punctuation", True)),
        )
    if a.get("tokenizer") in _PATH_TOKENIZERS:
        cfg = _path_analyzer_cfg(a)
        if not text:
            return [], []
        if a.get("char_filters"):
            for f in _char_filter_fns(a["char_filters"]):
                text = f(text) if callable(f) else f[0].sub(f[1], text)
        toks = path_hierarchy_tokens(
            text, cfg["delimiter"], cfg["replacement"], cfg["skip"],
            cfg["reverse"],
        )
        if a.get("filters"):
            fmap = _filter_map(set(toks), _Filters(list(a["filters"])))
            toks = [fmap[t] for t in toks]
        # one position for the whole hierarchy (posIncr 1, 0, 0, ...)
        return toks, [0] * len(toks)
    (tokenizer, fold, stopset, synonyms, keep_orig, filters, wd,
     shingles, cjk, expand, fp, cf) = _norm_analyzer(analyzer, stopwords)
    if shingles and synonyms:
        raise ValueError("shingles + synonyms not supported in one chain")
    if cjk and (shingles or wd):
        raise ValueError("cjk composes with stop/fold/stem, not "
                         "shingles/word_delimiter")
    if expand and (shingles or cjk):
        raise ValueError("phonetic/ngram expansion composes with stop/fold/"
                         "stem/synonyms, not shingles/cjk")
    if fp is not None and (synonyms or shingles or cjk or expand):
        raise ValueError("fingerprint composes with stop/fold/stem chains, "
                         "not synonyms/shingles/cjk/expansion")
    if not text:
        return [], []
    if cf:
        # CharFilters wrap the Reader: they run before the tokenizer
        # and before any case handling
        for f in cf:
            text = f(text) if callable(f) else f[0].sub(f[1], text)
    if wd:
        text = word_delimit(text)
    if cjk:
        # CJKAnalyzer.java chain order: width fold precedes lowercase
        # (both are per-char, order only matters for fullwidth latin,
        # where either order converges)
        text = cjk_width_fold(text)
    text = text.lower()
    if fold:
        text = fold_ascii(text)
    if cjk:
        # StandardTokenizer emits Han/Hiragana/Katakana/Hangul one char
        # per token (<IDEOGRAPHIC>); spacing them out makes the
        # `unicode` regex do the same (analysis_cjk.cjk_split)
        text = cjk_split(text)
    if tokenizer == "icu":
        from lucene_spark.analysis_icu import sea_segment

        text = sea_segment(text)
    uax = tokenizer == "uax29"
    if uax:
        text = uax29_join(text)
    raw, positions = [], []
    pos = 0
    for m in _token_regex(tokenizer).finditer(text):
        tok = _uax29_restore(m.group()) if uax else m.group()
        for i in range(0, len(tok), MAX_TOKEN_LENGTH):
            piece = tok[i : i + MAX_TOKEN_LENGTH]
            if stopset is None or piece not in stopset:
                if piece in synonyms and expand_synonyms:
                    if keep_orig:
                        raw.append(piece)
                        positions.append(pos)
                    for s in synonyms[piece]:
                        raw.append(s)
                        positions.append(pos)
                else:
                    raw.append(piece)
                    positions.append(pos)
            pos += 1
    if filters:
        fmap = _filter_map(set(raw), filters)
        raw = [fmap[t] for t in raw]
    if expand:
        pmap = {t: expand(t) for t in set(raw)}
        out_t, out_p = [], []
        for t, p in zip(raw, positions):
            for e in pmap[t]:
                out_t.append(e)
                out_p.append(p)  # injected codes are posIncr=0
        raw, positions = out_t, out_p
    if cjk:
        raw, positions = cjk_bigrams(
            raw, positions, output_unigrams=(cjk == "unigrams"))
    if shingles:
        raw, positions = _add_shingles(
            raw, positions,
            common=None if shingles == "all" else shingles,
        )
    if fp is not None:
        raw = _fingerprint_terms(raw, fp)
        positions = [0] * len(raw)
    return raw, positions


def analyze_batch(texts: pd.Series, stopwords: frozenset | None = None,
                  analyzer: dict | None = None,
                  want_offsets: bool = False) -> pd.DataFrame:
    """Vectorized batch tokenize: Series[str] -> DataFrame(terms, positions, dl, norm).

    ``want_offsets`` adds an ``offsets`` column: per doc a flat int list
    interleaving (start_char, surface_len) per emitted token, aligned
    with ``terms`` (OffsetAttribute; Lucene stores startOffset+endOffset
    in the .pos/.pay files when IndexOptions include offsets,
    Lucene90PostingsFormat.java:64-78). Offsets point into the ORIGINAL
    text, so they are only supported for length-preserving chains: the
    default tokenizer, stopwords, synonyms and stemmers are fine (the
    surface span survives token filters, like the reference where
    filters mutate termAtt but not offsetAtt); ascii_fold and the uax29
    join rules rewrite the string and raise.

    dl = field length minus overlaps (we produce no overlap tokens, so
    dl = emitted token count + stopword holes? No: Lucene's
    FieldInvertState.length counts *all* positions incremented, i.e.
    stopword holes count toward length? StopFilter increments position but
    does NOT increment FieldInvertState.length for removed tokens —
    length counts accepted tokens only (index/FieldInvertState.java:121).
    So dl = len(terms).
    norm = SmallFloat.intToByte4(dl) (BM25Similarity.java:137-148).
    """
    a = analyzer or {}
    if a.get("ja") not in (None, False):
        if want_offsets:
            raise ValueError("the ja chain rewrites terms (base form, "
                             "katakana stem); offsets are not supported")
        from lucene_spark.analysis_ja import ja_analyze_batch

        return ja_analyze_batch(texts, a["ja"])
    if a.get("ko") not in (None, False) or a.get("zh") not in (None, False):
        if want_offsets:
            raise ValueError("lattice chains drop punctuation; offsets "
                             "are not supported")
        from lucene_spark.analysis_lattice import KO_TOKENIZER, ZH_TOKENIZER

        cfg = a.get("ko") if a.get("ko") not in (None, False) else a.get("zh")
        tok = KO_TOKENIZER if a.get("ko") not in (None, False) else ZH_TOKENIZER
        cfg = cfg if isinstance(cfg, dict) else {}
        return tok.analyze_batch(
            texts,
            frozenset(cfg["pos_stop"]) if cfg.get("pos_stop") else None,
            bool(cfg.get("discard_punctuation", True)),
        )
    if a.get("tokenizer") in _PATH_TOKENIZERS:
        if want_offsets:
            raise ValueError("path_hierarchy emits overlap tokens whose "
                             "spans grow; offsets are not supported")
        cfg = _path_analyzer_cfg(a)
        filled = texts.fillna("")
        if a.get("char_filters"):
            for f in _char_filter_fns(a["char_filters"]):
                if callable(f):
                    filled = filled.map(f)
                else:
                    filled = filled.str.replace(f[0], f[1], regex=True)
        tok_lists = [
            path_hierarchy_tokens(
                s, cfg["delimiter"], cfg["replacement"], cfg["skip"],
                cfg["reverse"],
            )
            for s in filled
        ]
        if a.get("filters"):
            fl = _Filters(list(a["filters"]))
            fmap = _filter_map({t for ts in tok_lists for t in ts}, fl)
            tok_lists = [[fmap[t] for t in ts] for ts in tok_lists]
        # every token of a path shares one position: dl counts the
        # non-overlap tokens only (discountOverlaps), i.e. 1 per
        # non-empty path
        dl = np.asarray([1 if ts else 0 for ts in tok_lists], dtype=np.int64)
        return pd.DataFrame({
            "terms": tok_lists,
            "positions": [[0] * len(ts) for ts in tok_lists],
            "dl": dl,
            "norm": int_to_byte4(dl).astype(np.int32),
        })
    (tokenizer, fold, stopset, synonyms, keep_orig, filters, wd,
     shingles, cjk, expand, fp, cf) = _norm_analyzer(analyzer, stopwords)
    if cf and want_offsets:
        raise ValueError("char filters rewrite the text; offsets are not "
                         "offset-corrected")
    if shingles and (synonyms or want_offsets):
        raise ValueError(
            "shingles compose with stop/stem/fold/wd chains, not with "
            "synonyms or offsets"
        )
    if cjk and (shingles or wd or want_offsets):
        raise ValueError("cjk composes with stop/fold/stem, not "
                         "shingles/word_delimiter/offsets")
    if expand and (shingles or cjk):
        raise ValueError("phonetic/ngram expansion composes with stop/fold/"
                         "stem/synonyms, not shingles/cjk")
    if fp is not None and (synonyms or shingles or cjk or expand
                           or want_offsets):
        raise ValueError("fingerprint composes with stop/fold/stem chains, "
                         "not synonyms/shingles/cjk/expansion/offsets")
    filled = texts.fillna("")
    if cf:
        # vectorized CharFilter chain (regex substitution per filter;
        # scanner-based filters like html_strip map per value)
        for f in cf:
            if callable(f):
                filled = filled.map(f)
            else:
                filled = filled.str.replace(f[0], f[1], regex=True)
    if wd:
        # vectorized: the split rules are plain regex substitutions on
        # the case-intact text, chained with pandas .str.replace
        for rx, rep in _WD_RULES:
            filled = filled.str.replace(rx, rep, regex=True)
    if cjk:
        filled = filled.map(cjk_width_fold)
    lowered = filled.str.lower()
    if cjk:
        lowered = lowered.map(cjk_split)
    if tokenizer == "icu":
        from lucene_spark.analysis_icu import sea_segment

        if want_offsets:
            raise ValueError(
                "icu_segment inserts word-boundary spaces; offsets are "
                "not supported"
            )
        lowered = lowered.map(sea_segment)
    if fold:
        lowered = (
            lowered.str.normalize("NFKD")
            .str.replace(_COMBINING_RE, "", regex=True)
            .map(lambda s: s.translate(_FOLD_SUPPLEMENT))
        )
    uax = tokenizer == "uax29"
    if uax:
        for _ in range(2):
            for pat, rep in _UAX_JOIN_RULES:
                lowered = lowered.str.replace(pat, rep, regex=True)
    all_starts = None
    if want_offsets:
        # uax29 is allowed: its marker substitution ("a.b" -> "aDb") is
        # length-preserving, so match starts/lens in the marked text are
        # valid spans of the original text after restore.
        if fold or wd:
            raise ValueError(
                "offsets require a length-preserving chain "
                "(no ascii_fold / word_delimiter)"
            )
        rx = _token_regex(tokenizer)
        tok_lists, start_lists = [], []
        for s in lowered:
            matches = list(rx.finditer(s))
            tok_lists.append(
                [_uax29_restore(m.group()) for m in matches]
                if uax
                else [m.group() for m in matches]
            )
            start_lists.append([m.start() for m in matches])
        all_terms = pd.Series(tok_lists, index=lowered.index, dtype=object)
        all_starts = start_lists
    else:
        all_terms = lowered.str.findall(_token_regex(tokenizer))
        if uax:
            all_terms = all_terms.map(lambda ts: [_uax29_restore(t) for t in ts])
    out_terms, out_pos, out_dl, out_off = [], [], [], []
    fmap: dict[str, str] = {}
    if filters:
        vocab = set()
        for toks in all_terms:
            vocab.update(toks)
        for syns in synonyms.values():
            vocab.update(syns)
        fmap = _filter_map(vocab, filters)
    pmap: dict[str, tuple] = {}
    if expand:
        # encode once per unique post-filter surface form per batch
        pvocab = set()
        for toks in all_terms:
            pvocab.update(fmap.get(t, t) if filters else t for t in toks)
        for syns in synonyms.values():
            pvocab.update(fmap.get(s, s) if filters else s for s in syns)
        pmap = {t: expand(t) for t in pvocab}
    for di, toks in enumerate(all_terms):
        starts = all_starts[di] if all_starts is not None else None
        if any(len(t) > MAX_TOKEN_LENGTH for t in toks):
            split, split_starts = [], []
            for k, t in enumerate(toks):
                for i in range(0, len(t), MAX_TOKEN_LENGTH):
                    split.append(t[i : i + MAX_TOKEN_LENGTH])
                    if starts is not None:
                        split_starts.append(starts[k] + i)
            toks = split
            if starts is not None:
                starts = split_starts
        if stopset or synonyms or filters or expand:
            terms, positions, offs, n_orig = [], [], [], 0
            for p, t in enumerate(toks):
                if stopset and t in stopset:
                    continue  # hole: position advances, length doesn't
                n_orig += 1
                if synonyms and t in synonyms:
                    emitted = ([t] if keep_orig else []) + synonyms[t]
                else:
                    emitted = (t,)
                for e in emitted:
                    fe = fmap.get(e, e) if filters else e
                    if expand:
                        pe = pmap.get(fe)
                        if pe is None:
                            pe = pmap[fe] = expand(fe)
                    else:
                        pe = (fe,)
                    for o in pe:
                        terms.append(o)
                        positions.append(p)
                        if starts is not None:
                            # injected/stemmed/encoded tokens keep the
                            # surface span
                            offs.extend((starts[p], len(t)))
            if cjk:
                terms, positions = cjk_bigrams(
                    terms, positions, output_unigrams=(cjk == "unigrams"))
                # bigrams re-densified: dl = distinct positions (the
                # overlapping unigrams of outputUnigrams are posIncr=0,
                # discounted like synonym injections)
                n_orig = (positions[-1] + 1) if positions else 0
            if shingles:
                terms, positions = _add_shingles(
                    terms, positions,
                    common=None if shingles == "all" else shingles,
                )
            if fp is not None:
                terms = _fingerprint_terms(terms, fp)
                positions = [0] * len(terms)
                n_orig = len(terms)
            out_terms.append(terms)
            out_pos.append(positions)
            # discountOverlaps=true (the reference default): injected
            # synonym tokens (posIncr=0) don't count toward length
            out_dl.append(n_orig)
            if starts is not None:
                out_off.append(offs)
        else:
            terms, positions = list(toks), list(range(len(toks)))
            dl_val = len(toks)
            if cjk:
                terms, positions = cjk_bigrams(
                    terms, positions, output_unigrams=(cjk == "unigrams"))
                dl_val = (positions[-1] + 1) if positions else 0
            if shingles:
                terms, positions = _add_shingles(
                    terms, positions,
                    common=None if shingles == "all" else shingles,
                )
            if fp is not None:
                terms = _fingerprint_terms(terms, fp)
                positions = [0] * len(terms)
                dl_val = len(terms)
            out_terms.append(terms)
            out_pos.append(positions)
            out_dl.append(dl_val)
            if starts is not None:
                out_off.append(
                    [v for s, t in zip(starts, toks) for v in (s, len(t))]
                )
    dl = np.asarray(out_dl, dtype=np.int64)
    data = {
        "terms": out_terms,
        "positions": out_pos,
        "dl": dl,
        "norm": int_to_byte4(dl).astype(np.int32),
    }
    if want_offsets:
        data["offsets"] = out_off
    return pd.DataFrame(data)


def analyze_query_text(text: str, stopwords: frozenset | None = None,
                       analyzer: dict | None = None) -> list[str]:
    """Query-side analysis (util/QueryBuilder.java re-runs the analyzer).

    Synonym expansion is index-time only, so it's skipped here."""
    return tokenize(text, stopwords, analyzer, expand_synonyms=False)[0]
