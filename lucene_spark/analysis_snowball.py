"""Snowball stemmers (Snowball 2.0.0 algorithms), re-expressed as pure
token -> token functions for the analyzer registry
(`analysis._TOKEN_FILTERS`).  Like the light-stemmer zoo
(analysis_lang.py) these run once per UNIQUE batch token
(analysis._filter_map), so cost is O(vocabulary), not O(tokens).

Each function implements the published Snowball algorithm
(https://snowballstem.org/algorithms/) and is verified against the
reference's test vocabularies (2000 word/stem pairs per language,
lucene/analysis/common/src/test/org/apache/lucene/analysis/snowball/
<lang>.zip) with zero mismatches (tests/test_snowball.py):

  snowball_english_stem    tartarus/snowball/ext/EnglishStemmer.java   (Porter2)
  snowball_german_stem     tartarus/snowball/ext/GermanStemmer.java
  snowball_spanish_stem    tartarus/snowball/ext/SpanishStemmer.java
  snowball_italian_stem    tartarus/snowball/ext/ItalianStemmer.java
  snowball_portuguese_stem tartarus/snowball/ext/PortugueseStemmer.java
  snowball_danish_stem     tartarus/snowball/ext/DanishStemmer.java
  snowball_norwegian_stem  tartarus/snowball/ext/NorwegianStemmer.java
  snowball_swedish_stem    tartarus/snowball/ext/SwedishStemmer.java
  snowball_russian_stem    tartarus/snowball/ext/RussianStemmer.java

  snowball_french_stem     tartarus/snowball/ext/FrenchStemmer.java
    (same methodology, but the reference ships NO french.zip test
    vocabulary — Lucene itself does not vocab-test French — so this
    one is covered by hand-traced unit vectors only)

The reference applies these via SnowballFilter
(analysis/common/src/java/org/apache/lucene/analysis/snowball/
SnowballFilter.java); input is assumed already lower-cased (the
reference chains LowerCaseFilter first), as our analyzer chain does.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _r_after(w: str, start: int, vowels: str) -> int:
    """Standard snowball region start: position after the first
    non-vowel following a vowel, scanning from `start`."""
    n = len(w)
    i = start
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    return i + 1 if i < n else n


def _longest_suffix(w: str, table) -> tuple[str, object] | None:
    """find_among_b analog: longest suffix of `w` present in `table`
    (an iterable of (suffix, action) pairs)."""
    best = None
    for suf, action in table:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, action)
    return best


# ---------------------------------------------------------------------------
# English (Porter2) — snowball english.sbl / EnglishStemmer.java
# ---------------------------------------------------------------------------

_EN_V = "aeiouy"
_EN_LI = "cdeghkmnrt"
_EN_DOUBLE = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

_EN_EXC1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}
_EN_EXC2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

# Step 2 table: suffix -> replacement (None = conditional, handled inline)
_EN_STEP2 = [
    ("ational", "ate"), ("ization", "ize"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"),
    ("tional", "tion"), ("biliti", "ble"), ("lessli", "less"),
    ("entli", "ent"), ("aliti", "al"), ("alism", "al"), ("ation", "ate"),
    ("fulli", "ful"), ("ousli", "ous"), ("iviti", "ive"),
    ("anci", "ance"), ("enci", "ence"), ("abli", "able"), ("alli", "al"),
    ("izer", "ize"), ("ator", "ate"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]
_EN_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]
_EN_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ate", "ent", "ism", "iti", "ive", "ize", "ous", "ion",
    "al", "er", "ic",
)


def _en_shortv(w: str) -> bool:
    """Backward shortv at end of `w`: non-v_WXY preceded by v preceded
    by non-v, OR the whole word is v non-v."""
    n = len(w)
    if (
        n >= 3
        and w[-1] not in _EN_V
        and w[-1] not in "wxY"
        and w[-2] in _EN_V
        and w[-3] not in _EN_V
    ):
        return True
    return n == 2 and w[0] in _EN_V and w[1] not in _EN_V


def snowball_english_stem(w: str) -> str:
    if w in _EN_EXC1:
        return _EN_EXC1[w]
    if len(w) < 3:
        return w
    # prelude: strip one leading ', mark consonant-y as Y
    if w[0] == "'":
        w = w[1:]
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_V:
            chars[i] = "Y"
    w = "".join(chars)

    # mark_regions (gener/commun/arsen prefix exception)
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        r1 = _r_after(w, 0, _EN_V)
    r2 = _r_after(w, r1, _EN_V)

    # Step 0: longest of ' 's 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) - 3 >= 2 else "ie")
    elif w.endswith("ss") or w.endswith("us"):
        pass
    elif w.endswith("s"):
        if any(c in _EN_V for c in w[:-2]):
            w = w[:-1]

    if w in _EN_EXC2:
        return w

    if len(w) >= 3:
        # Step 1b
        m = _longest_suffix(w, [(s, None) for s in
                                ("eedly", "ingly", "edly", "eed", "ing", "ed")])
        if m:
            suf = m[0]
            if suf in ("eed", "eedly"):
                if len(w) - len(suf) >= r1:
                    w = w[: -len(suf)] + "ee"
            else:
                stem = w[: -len(suf)]
                if any(c in _EN_V for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_EN_DOUBLE):
                        w = w[:-1]
                    elif len(w) == r1 and _en_shortv(w):
                        w += "e"
        # Step 1c: y/Y -> i after a non-vowel that isn't the first letter
        if (
            len(w) >= 3
            and w[-1] in "yY"
            and w[-2] not in _EN_V
        ):
            w = w[:-1] + "i"
        # Step 2 (R1)
        m = _longest_suffix(w, _EN_STEP2)
        if m and len(w) - len(m[0]) >= r1:
            suf, rep = m
            if suf == "ogi":
                if w.endswith("logi"):
                    w = w[:-1]
            elif suf == "li":
                if len(w) >= 3 and w[-3] in _EN_LI:
                    w = w[:-2]
            else:
                w = w[: -len(suf)] + rep
        # Step 3 (R1; ative needs R2)
        m = _longest_suffix(w, _EN_STEP3)
        if m and len(w) - len(m[0]) >= r1:
            suf, rep = m
            if suf == "ative":
                if len(w) - 5 >= r2:
                    w = w[:-5]
            else:
                w = w[: -len(suf)] + rep
        # Step 4 (R2)
        m = _longest_suffix(w, [(s, None) for s in _EN_STEP4])
        if m and len(w) - len(m[0]) >= r2:
            suf = m[0]
            if suf == "ion":
                if len(w) >= 4 and w[-4] in "st":
                    w = w[:-3]
            else:
                w = w[: -len(suf)]
        # Step 5
        if w.endswith("e"):
            pos = len(w) - 1
            if pos >= r2 or (pos >= r1 and not _en_shortv(w[:-1])):
                w = w[:-1]
        elif w.endswith("ll") and len(w) - 1 >= r2:
            w = w[:-1]

    return w.replace("Y", "y")


# ---------------------------------------------------------------------------
# German — snowball german.sbl / GermanStemmer.java
# ---------------------------------------------------------------------------

_DE_V = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"
_DE_POST = str.maketrans({"ä": "a", "ö": "o", "ü": "u",
                          "U": "u", "Y": "y"})


def _de_mark_uy(w: str) -> str:
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_V and chars[i + 1] in _DE_V:
            chars[i] = chars[i].upper()
    return "".join(chars)


def snowball_german_stem(w: str) -> str:
    # prelude: ss for ß; u/y between vowels marked as consonants U/Y
    w = _de_mark_uy(w.replace("ß", "ss"))
    return _de_stem_suffixes(w)


def snowball_german2_stem(w: str) -> str:
    """german2 variant (German2Stemmer.java): identical suffix machine,
    but the prelude marks U/Y FIRST (so a u between vowels never folds)
    and then folds ß->ss, ae->ä, oe->ö, ue->ü with qu protecting a
    following ue."""
    w = _de_mark_uy(w)
    out, i = [], 0
    while i < len(w):
        two = w[i:i + 2]
        if w[i] == "ß":
            out.append("ss"); i += 1
        elif two == "ae":
            out.append("ä"); i += 2
        elif two == "oe":
            out.append("ö"); i += 2
        elif two == "ue":
            out.append("ü"); i += 2
        elif two == "qu":
            out.append("qu"); i += 2
        else:
            out.append(w[i]); i += 1
    return _de_stem_suffixes("".join(out))


def _de_stem_suffixes(w: str) -> str:
    r1 = _r_after(w, 0, _DE_V)
    r2 = _r_after(w, r1, _DE_V)  # from the UNCLAMPED r1 (mark_regions order)
    r1 = max(r1, min(3, len(w)))  # region before R1 is at least 3 chars

    # pass 1 (R1)
    m = _longest_suffix(w, [("ern", 1), ("em", 1), ("er", 1),
                            ("en", 2), ("es", 2), ("e", 2), ("s", 3)])
    if m and len(w) - len(m[0]) >= r1:
        suf, case = m
        if case == 1:
            w = w[: -len(suf)]
        elif case == 2:
            w = w[: -len(suf)]
            if w.endswith("niss"):
                w = w[:-1]
        elif w[-2:-1] and len(w) >= 2 and w[-2] in _DE_S_END:
            w = w[:-1]

    # pass 2 (R1)
    m = _longest_suffix(w, [("est", 1), ("en", 1), ("er", 1), ("st", 2)])
    if m and len(w) - len(m[0]) >= r1:
        suf, case = m
        if case == 1:
            w = w[: -len(suf)]
        elif len(w) >= 6 and w[-3] in _DE_ST_END:
            w = w[:-2]

    # pass 3 (R2, d-suffixes)
    m = _longest_suffix(w, [("end", 1), ("ung", 1), ("isch", 2), ("ik", 2),
                            ("ig", 2), ("lich", 3), ("heit", 3), ("keit", 4)])
    if m and len(w) - len(m[0]) >= r2:
        suf, case = m
        if case == 1:
            w = w[: -len(suf)]
            if (w.endswith("ig") and not w.endswith("eig")
                    and len(w) - 2 >= r2):
                w = w[:-2]
        elif case == 2:
            if not w[: -len(suf)].endswith("e"):
                w = w[: -len(suf)]
        elif case == 3:
            w = w[: -len(suf)]
            if (w.endswith("er") or w.endswith("en")) and len(w) - 2 >= r1:
                w = w[:-2]
        else:
            w = w[: -len(suf)]
            m2 = _longest_suffix(w, [("lich", None), ("ig", None)])
            if m2 and len(w) - len(m2[0]) >= r2:
                w = w[: -len(m2[0])]

    return w.translate(_DE_POST)


# ---------------------------------------------------------------------------
# Scandinavian trio — danish.sbl / norwegian.sbl / swedish.sbl
# These use `setlimit tomark p1 for ([substring])`: the suffix search is
# confined to R1, so longest-match only considers suffixes that START at
# or after r1 (unlike the English/German post-check style).
# ---------------------------------------------------------------------------


def _longest_suffix_in_r1(w: str, r1: int, sufs) -> str | None:
    best = None
    for suf in sufs:
        if (
            w.endswith(suf)
            and len(w) - len(suf) >= r1
            and (best is None or len(suf) > len(best))
        ):
            best = suf
    return best


def _clamped_r1(w: str, vowels: str) -> int:
    return max(_r_after(w, 0, vowels), min(3, len(w)))


_DA_V = "aeiouyåæø"
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_DA_CONS = frozenset("bcdfghjklmnpqrstvwxz")
_DA_MAIN = (
    "erendes", "hedens", "erende", "erens", "heden", "heder", "endes",
    "ernes", "erets", "ethed", "erede", "eres", "enes", "erer", "eren",
    "erne", "heds", "eret", "ered", "ende", "ens", "ers", "ets", "ene",
    "ere", "hed", "es", "en", "er", "et", "e", "s",
)
_DA_PAIRS = ("gd", "dt", "gt", "kt")


def _da_consonant_pair(w: str, r1: int) -> str:
    if len(w) >= 2 and w[-2:] in _DA_PAIRS and len(w) - 2 >= r1:
        return w[:-1]
    return w


def snowball_danish_stem(w: str) -> str:
    r1 = _clamped_r1(w, _DA_V)
    m = _longest_suffix_in_r1(w, r1, _DA_MAIN)
    if m == "s":
        if len(w) >= 2 and w[-2] in _DA_S_END:
            w = w[:-1]
    elif m:
        w = w[: -len(m)]
    w = _da_consonant_pair(w, r1)
    if w.endswith("igst"):
        w = w[:-2]
    m = _longest_suffix_in_r1(w, r1, ("elig", "løst", "lig", "els", "ig"))
    if m == "løst":
        w = w[:-1]
    elif m:
        w = w[: -len(m)]
        w = _da_consonant_pair(w, r1)
    if (
        len(w) >= 2
        and w[-1] in _DA_CONS
        and w[-2] == w[-1]
        and len(w) - 1 >= r1
    ):
        w = w[:-1]
    return w


_NO_V = "aeiouyæåø"
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")
_NO_MAIN = (
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "edes",
    "enes", "erte", "ande", "ende", "ane", "ene", "ede", "ens", "ers",
    "ets", "het", "ast", "ert", "as", "es", "en", "ar", "er", "et",
    "a", "e", "s",
)
_NO_ERT = ("erte", "ert")
_NO_OTHER = (
    "hetslov", "elig", "eleg", "slov", "elov", "lig", "eig", "leg",
    "els", "lov", "ig",
)


def snowball_norwegian_stem(w: str) -> str:
    r1 = _clamped_r1(w, _NO_V)
    m = _longest_suffix_in_r1(w, r1, _NO_MAIN)
    if m == "s":
        if len(w) >= 2 and (
            w[-2] in _NO_S_END
            or (w[-2] == "k" and len(w) >= 3 and w[-3] not in _NO_V)
        ):
            w = w[:-1]
    elif m in _NO_ERT:
        w = w[: -len(m)] + "er"
    elif m:
        w = w[: -len(m)]
    if len(w) >= 2 and w[-2:] in ("dt", "vt") and len(w) - 2 >= r1:
        w = w[:-1]
    m = _longest_suffix_in_r1(w, r1, _NO_OTHER)
    if m:
        w = w[: -len(m)]
    return w


_SV_V = "aeiouyäåö"
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
_SV_MAIN = (
    "heterna", "hetens", "arnas", "ernas", "ornas", "andes", "andet",
    "arens", "heten", "heter", "anden", "arna", "erna", "orna", "ande",
    "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens",
    "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at", "a",
    "e", "s",
)
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def snowball_swedish_stem(w: str) -> str:
    r1 = _clamped_r1(w, _SV_V)
    m = _longest_suffix_in_r1(w, r1, _SV_MAIN)
    if m == "s":
        if len(w) >= 2 and w[-2] in _SV_S_END:
            w = w[:-1]
    elif m:
        w = w[: -len(m)]
    if len(w) >= 2 and w[-2:] in _SV_PAIRS and len(w) - 2 >= r1:
        w = w[:-1]
    m = _longest_suffix_in_r1(w, r1, ("fullt", "löst", "lig", "els", "ig"))
    if m == "fullt":
        w = w[:-1]
    elif m == "löst":
        w = w[:-1]
    elif m:
        w = w[: -len(m)]
    return w


# ---------------------------------------------------------------------------
# Romance helpers + Spanish — spanish.sbl / SpanishStemmer.java
# ---------------------------------------------------------------------------


def _rv_romance(w: str, vowels: str) -> int:
    """RV: if the 2nd letter is a consonant, after the next vowel; if the
    first two letters are vowels, after the next consonant; else (c-v)
    after the 3rd letter; end of word when not found."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return min(i + 1, n)
    if w[0] in vowels:
        i = 2
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, n)
    return 3


_ES_V = "aeiouáéíóúü"
_ES_POST = str.maketrans("áéíóú", "aeiou")
_ES_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los",
            "nos", "la", "le", "lo", "me", "se")
_ES_PRE = [
    ("iéndo", "iendo"), ("ándo", "ando"), ("ár", "ar"), ("ér", "er"),
    ("ír", "ir"), ("iendo", ""), ("yendo", "y?"), ("ando", ""),
    ("ar", ""), ("er", ""), ("ir", ""),
]
# standard_suffix table: (suffix, case)
_ES_STD = [
    ("amientos", 1), ("imientos", 1), ("amiento", 1), ("imiento", 1),
    ("aciones", 2), ("uciones", 4), ("logías", 3), ("encias", 5),
    ("ancias", 2), ("idades", 8), ("adoras", 2), ("amente", 6),
    ("adores", 2), ("ución", 4), ("logía", 3), ("encia", 5),
    ("ancia", 2), ("mente", 7), ("adora", 2), ("antes", 2),
    ("ables", 1), ("ibles", 1), ("istas", 1), ("ación", 2),
    ("icas", 1), ("icos", 1), ("osas", 1), ("osos", 1), ("anzas", 1),
    ("ismos", 1), ("ivas", 9), ("ivos", 9), ("idad", 8), ("able", 1),
    ("ible", 1), ("ante", 2), ("ista", 1), ("anza", 1), ("ador", 2),
    ("ica", 1), ("ico", 1), ("osa", 1), ("oso", 1), ("ismo", 1),
    ("iva", 9), ("ivo", 9),
]
_ES_YVERB = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
             "yes", "ya", "ye", "yo", "yó")
_ES_VERB1 = ("éis", "emos", "en", "es")  # gu -> drop u cases
_ES_VERB2 = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "ábamos",
    "áramos", "ásemos", "aríais", "eríais", "iríais", "ierais",
    "ieseis", "asteis", "isteis", "íamos", "arían", "arías", "aréis",
    "erían", "erías", "eréis", "irían", "irías", "iréis", "ieran",
    "iesen", "ieron", "iendo", "ieras", "ieses", "abais", "arais",
    "aseis", "íais", "aremos", "eremos", "iremos", "aban", "aran",
    "asen", "aron", "arán", "erán", "irán", "abas",
    "adas", "idas", "aras", "ases", "ías", "ará", "aré", "erá", "eré",
    "irá", "iré", "aba", "ada", "ida", "ara", "ase", "ían", "ado",
    "ido", "ando", "iera", "iese", "aste", "iste", "ería", "iría",
    "aría", "arás", "erás", "irás", "áis", "ía", "ad", "ed", "id",
    "an", "ió", "ar", "er", "ir", "as", "ís", "ados", "idos", "amos",
    "imos",
)


def snowball_spanish_stem(w: str) -> str:
    rv = _rv_romance(w, _ES_V)
    r1 = _r_after(w, 0, _ES_V)
    r2 = _r_after(w, r1, _ES_V)

    # step 0: attached pronoun
    p = _longest_suffix(w, [(s, None) for s in _ES_PRON])
    if p:
        stem = w[: -len(p[0])]
        m = _longest_suffix(stem, _ES_PRE)
        if m and len(stem) - len(m[0]) >= rv:
            suf, rep = m
            if rep == "":
                w = stem
            elif rep == "y?":
                if stem.endswith("uyendo"):
                    w = stem
            else:
                w = stem[: -len(suf)] + rep

    # step 1: standard suffix  (falls through to verb steps on failure)
    done = False
    m = _longest_suffix(w, _ES_STD)
    if m:
        suf, case = m
        start = len(w) - len(suf)
        if case == 6:
            if start >= r1:
                done = True
                w = w[:-6]
                m2 = _longest_suffix(w, [("ic", 2), ("ad", 2), ("os", 2),
                                         ("iv", 1)])
                if m2 and len(w) - 2 >= r2:
                    w = w[:-2]
                    if m2[1] == 1 and w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
        elif start >= r2:
            done = True
            if case == 1:
                w = w[: -len(suf)]
            elif case == 2:
                w = w[: -len(suf)]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
            elif case == 3:
                w = w[: -len(suf)] + "log"
            elif case == 4:
                w = w[: -len(suf)] + "u"
            elif case == 5:
                w = w[: -len(suf)] + "ente"
            elif case == 7:
                w = w[: -len(suf)]
                m2 = _longest_suffix(w, [("ante", None), ("able", None),
                                         ("ible", None)])
                if m2 and len(w) - 4 >= r2:
                    w = w[:-4]
            elif case == 8:
                w = w[: -len(suf)]
                m2 = _longest_suffix(w, [("abil", None), ("ic", None),
                                         ("iv", None)])
                if m2 and len(w) - len(m2[0]) >= r2:
                    w = w[: -len(m2[0])]
            elif case == 9:
                w = w[: -len(suf)]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]

    # step 2a: y-verb suffixes (suffix within RV, preceded by u)
    if not done:
        m = _longest_suffix_in_r1(w, rv, _ES_YVERB)
        if m and w[: -len(m)].endswith("u"):
            w = w[: -len(m)]
            done = True

    # step 2b: other verb suffixes (within RV)
    if not done:
        m = _longest_suffix_in_r1(w, rv, _ES_VERB1 + _ES_VERB2)
        if m:
            if m in _ES_VERB1 and w[: -len(m)].endswith("gu"):
                w = w[: -len(m) - 1]
            else:
                w = w[: -len(m)]

    # step 3: residual
    m = _longest_suffix(w, [(s, None) for s in
                            ("os", "a", "o", "á", "í", "ó", "e", "é")])
    if m and len(w) - len(m[0]) >= rv:
        suf = m[0]
        if suf in ("e", "é"):
            w = w[: -len(suf)]
            if w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]
        else:
            w = w[: -len(suf)]

    return w.translate(_ES_POST)


# ---------------------------------------------------------------------------
# Italian — italian.sbl / ItalianStemmer.java
# ---------------------------------------------------------------------------

_IT_V = "aeiouàèìòù"
_IT_AEIO = "aeioàèìò"
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")
_IT_POST = str.maketrans("UI", "ui")
_IT_PRON = (
    "gliela", "gliele", "glieli", "glielo", "gliene",
    "cela", "cele", "celi", "celo", "cene", "mela", "mele", "meli",
    "melo", "mene", "sene", "tela", "tele", "teli", "telo", "tene",
    "vela", "vele", "veli", "velo", "vene", "gli",
    "la", "le", "li", "lo", "ne", "ci", "mi", "si", "ti", "vi",
)
_IT_STD = [
    ("amente", 7), ("amenti", 6), ("imenti", 6), ("amento", 6),
    ("imento", 6), ("atrice", 1), ("atrici", 1), ("usione", 4),
    ("azione", 2), ("uzione", 4), ("usioni", 4), ("azioni", 2),
    ("uzioni", 4),
    ("logia", 3), ("logie", 3), ("abile", 1), ("ibile", 1),
    ("atore", 2), ("atori", 2), ("abili", 1), ("ibili", 1),
    ("mente", 1), ("anza", 1), ("enza", 5), ("anze", 1), ("enze", 5),
    ("iche", 1), ("ichi", 1), ("ismi", 1), ("ismo", 1), ("ista", 1),
    ("iste", 1), ("isti", 1), ("istà", 1), ("istè", 1), ("istì", 1),
    ("ante", 1), ("anti", 1),
    ("ica", 1), ("ice", 1), ("ici", 1), ("ico", 1), ("osa", 1),
    ("ose", 1), ("osi", 1), ("oso", 1), ("iva", 9), ("ive", 9),
    ("ivi", 9), ("ivo", 9), ("ità", 8),
]
_IT_VERB = (
    "erebbero", "irebbero", "assero", "essero", "issero", "assimo",
    "eremmo", "iremmo", "iscano", "iscono", "avano", "evano", "ivano",
    "eranno", "iranno", "arono", "erono", "irono", "avamo", "evamo",
    "ivamo", "eremo", "iremo", "erebbe", "irebbe", "avate", "evate",
    "ivate", "erete", "irete", "ereste", "ireste", "eresti", "iresti",
    "isca", "enda", "isce", "ende", "asse", "isci", "endi", "erai",
    "irai", "erei", "irei", "assi", "isco", "ando", "endo", "Yamo",
    "iamo", "ammo", "emmo", "immo", "ano", "ono", "ata", "ita", "uta",
    "ava", "eva", "iva", "are", "ere", "ire", "ate", "ete", "ite",
    "ute", "ati", "iti", "uti", "avi", "evi", "ivi", "ato", "ito",
    "uto", "avo", "evo", "ivo", "erà", "irà", "erò", "irò", "ar", "ir",
)


def snowball_italian_stem(w: str) -> str:
    # prelude: acute -> grave, qu -> qU, u/i between vowels marked U/I
    w = w.translate(_IT_ACUTE)
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    for i in range(1, len(chars) - 1):
        if (chars[i] in "ui" and chars[i - 1] in _IT_V
                and chars[i + 1] in _IT_V):
            chars[i] = chars[i].upper()
    w = "".join(chars)

    rv = _rv_romance(w, _IT_V)
    r1 = _r_after(w, 0, _IT_V)
    r2 = _r_after(w, r1, _IT_V)

    # attached pronoun
    p = _longest_suffix(w, [(s, None) for s in _IT_PRON])
    if p:
        stem = w[: -len(p[0])]
        m = _longest_suffix(stem, [("ando", 1), ("endo", 1), ("ar", 2),
                                   ("er", 2), ("ir", 2)])
        if m and len(stem) - len(m[0]) >= rv:
            w = stem if m[1] == 1 else stem + "e"

    done = False
    m = _longest_suffix(w, _IT_STD)
    if m:
        suf, case = m
        start = len(w) - len(suf)
        if case == 6:
            if start >= rv:
                done = True
                w = w[: -len(suf)]
        elif case == 7:
            if start >= r1:
                done = True
                w = w[:-6]
                m2 = _longest_suffix(w, [("abil", 2), ("ic", 2), ("os", 2),
                                         ("iv", 1)])
                if m2 and len(w) - len(m2[0]) >= r2:
                    w = w[: -len(m2[0])]
                    if m2[1] == 1 and w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
        elif start >= r2:
            done = True
            if case == 1:
                w = w[: -len(suf)]
            elif case == 2:
                w = w[: -len(suf)]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
            elif case == 3:
                w = w[: -len(suf)] + "log"
            elif case == 4:
                w = w[: -len(suf)] + "u"
            elif case == 5:
                w = w[: -len(suf)] + "ente"
            elif case == 8:
                w = w[: -len(suf)]
                m2 = _longest_suffix(w, [("abil", None), ("ic", None),
                                         ("iv", None)])
                if m2 and len(w) - len(m2[0]) >= r2:
                    w = w[: -len(m2[0])]
            elif case == 9:
                w = w[: -len(suf)]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]

    if not done:
        m = _longest_suffix_in_r1(w, rv, _IT_VERB)
        if m:
            w = w[: -len(m)]

    # vowel suffix: final a/e/i/o/à/è/ì/ò in RV, then a following i in RV
    if w and w[-1] in _IT_AEIO and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # ch/gh -> c/g
    if (
        len(w) >= 2
        and w[-1] == "h"
        and w[-2] in "cg"
        and len(w) - 2 >= rv  # RV checked at the c/g position
    ):
        w = w[:-1]

    return w.translate(_IT_POST)


# ---------------------------------------------------------------------------
# French — french.sbl / FrenchStemmer.java
# ---------------------------------------------------------------------------

_FR_V = "aeiouyàâèéêëîïôùû"
_FR_KEEP_S = "aiouès"
_FR_STD = [
    ("issements", 12), ("issement", 12),
    ("atrices", 2), ("amment", 13), ("emment", 14),
    ("atrice", 2), ("ements", 6), ("logies", 3), ("usions", 4),
    ("utions", 4), ("ations", 2), ("ateurs", 2),
    ("ement", 6), ("logie", 3), ("usion", 4), ("ution", 4),
    ("ation", 2), ("ateur", 2), ("iqUes", 1), ("ances", 1),
    ("ences", 5), ("ables", 1), ("ismes", 1), ("euses", 11),
    ("istes", 1), ("ments", 15),
    ("iqUe", 1), ("ance", 1), ("ence", 5), ("able", 1), ("isme", 1),
    ("euse", 11), ("iste", 1), ("ives", 8), ("eaux", 9), ("ment", 15),
    ("ités", 7), ("ive", 8), ("ifs", 8), ("aux", 10), ("eux", 1),
    ("ité", 7), ("if", 8),
]
_FR_IVERB = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse", "ira",
    "ies", "ir", "is", "it", "ie", "i", "ît",
)
_FR_VERB = [
    ("eraIent", 2), ("assions", 3), ("erions", 2), ("assent", 3),
    ("assiez", 3), ("èrent", 2), ("erais", 2), ("erait", 2),
    ("eriez", 2), ("erons", 2), ("eront", 2), ("aIent", 3),
    ("antes", 3), ("asses", 3), ("ions", 1), ("erai", 2), ("eras", 2),
    ("erez", 2), ("âmes", 3), ("âtes", 3), ("ante", 3), ("ants", 3),
    ("asse", 3), ("ées", 2), ("era", 2), ("iez", 2), ("ais", 3),
    ("ait", 3), ("ant", 3), ("ée", 2), ("és", 2), ("er", 2),
    ("ez", 2), ("ât", 3), ("ai", 3), ("as", 3), ("é", 2), ("a", 3),
]
_FR_RESID = [("Ière", 2), ("ière", 2), ("Ier", 2), ("ier", 2),
             ("ion", 1), ("e", 3)]
_FR_DOUBLE = ("eill", "ell", "enn", "onn", "ett")


def _fr_prelude(w: str) -> str:
    out = []
    i = 0
    n = len(w)
    while i < n:
        c = w[i]
        if c in _FR_V:
            out.append(c)
            nxt = w[i + 1] if i + 1 < n else ""
            nxt2 = w[i + 2] if i + 2 < n else ""
            if nxt == "u" and nxt2 in _FR_V:
                out.append("U")
                i += 2
            elif nxt == "i" and nxt2 in _FR_V:
                out.append("I")
                i += 2
            elif nxt == "y":
                out.append("Y")
                i += 2
            else:
                i += 1
        elif c == "ë":
            out.append("He")
            i += 1
        elif c == "ï":
            out.append("Hi")
            i += 1
        elif c == "y" and i + 1 < n and w[i + 1] in _FR_V:
            out.append("Y")
            i += 1
        elif c == "q" and i + 1 < n and w[i + 1] == "u":
            out.append("qU")
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def snowball_french_stem(w: str) -> str:
    w = _fr_prelude(w)
    n = len(w)
    if n >= 3 and w[0] in _FR_V and w[1] in _FR_V:
        rv = 3
    elif w[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        i = 1
        while i < n and w[i] not in _FR_V:
            i += 1
        rv = i + 1 if i < n else n
    r1 = _r_after(w, 0, _FR_V)
    r2 = _r_after(w, r1, _FR_V)

    changed = False  # any of standard / i_verb / verb succeeded

    m = _longest_suffix(w, _FR_STD)
    if m:
        suf, case = m
        start = len(w) - len(suf)
        if case == 1 and start >= r2:
            w, changed = w[:-len(suf)], True
        elif case == 2 and start >= r2:
            w, changed = w[:-len(suf)], True
            if w.endswith("ic"):
                if len(w) - 2 >= r2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
        elif case == 3 and start >= r2:
            w, changed = w[:-len(suf)] + "log", True
        elif case == 4 and start >= r2:
            w, changed = w[:-len(suf)] + "u", True
        elif case == 5 and start >= r2:
            w, changed = w[:-len(suf)] + "ent", True
        elif case == 6 and start >= rv:
            w, changed = w[:-len(suf)], True
            m2 = _longest_suffix(w, [("iqU", 3), ("abl", 3), ("Ièr", 4),
                                     ("ièr", 4), ("eus", 2), ("iv", 1)])
            if m2:
                s2, c2 = m2
                st2 = len(w) - len(s2)
                if c2 == 1 and st2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif c2 == 2:
                    if st2 >= r2:
                        w = w[:-3]
                    elif st2 >= r1:
                        w = w[:-3] + "eux"
                elif c2 == 3 and st2 >= r2:
                    w = w[:-3]
                elif c2 == 4 and st2 >= rv:
                    w = w[:-3] + "i"
        elif case == 7 and start >= r2:
            w, changed = w[:-len(suf)], True
            m2 = _longest_suffix(w, [("abil", 1), ("ic", 2), ("iv", 3)])
            if m2:
                s2, c2 = m2
                st2 = len(w) - len(s2)
                if c2 == 1:
                    w = w[:-4] if st2 >= r2 else w[:-4] + "abl"
                elif c2 == 2:
                    w = w[:-2] if st2 >= r2 else w[:-2] + "iqU"
                elif st2 >= r2:
                    w = w[:-2]
        elif case == 8 and start >= r2:
            w, changed = w[:-len(suf)], True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif case == 9:
            w, changed = w[:-1], True
        elif case == 10 and start >= r1:
            w, changed = w[:-2] + "l", True
        elif case == 11:
            if start >= r2:
                w, changed = w[:-len(suf)], True
            elif start >= r1:
                w, changed = w[:-len(suf)] + "eux", True
        elif case == 12 and start >= r1 and start >= 1 \
                and w[start - 1] not in _FR_V:
            w, changed = w[:-len(suf)], True
        elif case == 13 and start >= rv:
            w = w[:-6] + "ant"  # then fall through to verb steps
        elif case == 14 and start >= rv:
            w = w[:-6] + "ent"
        elif case == 15 and start >= 1 and w[start - 1] in _FR_V \
                and start - 1 >= rv:
            w = w[:-len(suf)]

    if not changed:
        # i-verb: suffix in RV, preceded (within RV) by a non-vowel, not H
        m = _longest_suffix_in_r1(w, rv, _FR_IVERB)
        if m:
            start = len(w) - len(m)
            if (start > rv and w[start - 1] not in _FR_V
                    and w[start - 1] != "H"):
                w, changed = w[:start], True

    if not changed:
        m = None
        best = None
        for suf, case in _FR_VERB:
            if w.endswith(suf) and len(w) - len(suf) >= rv and (
                    best is None or len(suf) > len(best[0])):
                best = (suf, case)
        if best:
            suf, case = best
            start = len(w) - len(suf)
            if case == 1:
                if start >= r2:
                    w, changed = w[:start], True
            elif case == 2:
                w, changed = w[:start], True
            else:
                w, changed = w[:start], True
                if w.endswith("e") and len(w) - 1 >= rv:
                    w = w[:-1]

    if changed:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # residual suffix
        if w.endswith("s") and len(w) >= 2 and (
                w[-3:-1] == "Hi" or w[-2] not in _FR_KEEP_S):
            w = w[:-1]
        m = None
        best = None
        for suf, case in _FR_RESID:
            if w.endswith(suf) and len(w) - len(suf) >= rv and (
                    best is None or len(suf) > len(best[0])):
                best = (suf, case)
        if best:
            suf, case = best
            start = len(w) - len(suf)
            if case == 1:
                if start >= r2 and start > rv and w[start - 1] in "st":
                    w = w[:start]
            elif case == 2:
                w = w[:start] + "i"
            else:
                w = w[:start]

    # un_double
    if w.endswith(_FR_DOUBLE):
        w = w[:-1]
    # un_accent: >=1 trailing non-vowels preceded by é/è -> e
    i = len(w) - 1
    while i >= 0 and w[i] not in _FR_V:
        i -= 1
    if i >= 0 and i < len(w) - 1 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    # postlude
    out = []
    i = 0
    while i < len(w):
        if w.startswith("He", i):
            out.append("ë")
            i += 2
        elif w.startswith("Hi", i):
            out.append("ï")
            i += 2
        elif w[i] == "H":
            i += 1
        elif w[i] == "I":
            out.append("i")
            i += 1
        elif w[i] == "U":
            out.append("u")
            i += 1
        elif w[i] == "Y":
            out.append("y")
            i += 1
        else:
            out.append(w[i])
            i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# Portuguese — portuguese.sbl / PortugueseStemmer.java
# ---------------------------------------------------------------------------

_PT_V = "aeiouáâéêíóôú"
_PT_STD = [
    ("amentos", 1), ("imentos", 1), ("uça~o", 3), ("uço~es", 3),
    ("amento", 1), ("imento", 1), ("adoras", 1), ("adores", 1),
    ("aça~o", 1), ("aço~es", 1), ("logias", 2), ("ências", 4),
    ("amente", 5), ("idades", 7), ("ância", 1), ("ência", 4),
    ("logia", 2), ("mente", 6), ("idade", 7), ("adora", 1),
    ("antes", 1), ("ador", 1), ("ante", 1), ("ável", 1), ("ível", 1),
    ("istas", 1), ("ismos", 1), ("osas", 1), ("osos", 1), ("icas", 1),
    ("icos", 1), ("iras", 9), ("ezas", 1), ("ivas", 8), ("ivos", 8),
    ("ista", 1), ("ismo", 1), ("osa", 1), ("oso", 1), ("ica", 1),
    ("ico", 1), ("ira", 9), ("eza", 1), ("iva", 8), ("ivo", 8),
]
_PT_VERB = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira",
    "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
    "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
    "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
    "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
    "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas",
    "ias", "arias", "erias", "irias", "aras", "eras", "iras", "avas",
    "es", "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses",
    "esses", "isses", "astes", "estes", "istes", "is", "ais", "eis",
    "areis", "ereis", "ireis", "áreis", "éreis", "íreis", "ásseis",
    "ésseis", "ísseis", "áveis", "íeis", "aríeis", "eríeis", "iríeis",
    "ados", "idos", "amos", "áramos", "éramos", "íramos", "ávamos",
    "íamos", "aríamos", "eríamos", "iríamos", "emos", "aremos",
    "eremos", "iremos", "ássemos", "êssemos", "íssemos", "imos",
    "armos", "ermos", "irmos", "ámos", "arás", "erás", "irás", "eu",
    "iu", "ou", "ará", "erá", "irá",
)


def snowball_portuguese_stem(w: str) -> str:
    w = w.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_romance(w, _PT_V)
    r1 = _r_after(w, 0, _PT_V)
    r2 = _r_after(w, r1, _PT_V)

    changed = False
    m = _longest_suffix(w, _PT_STD)
    if m:
        suf, case = m
        start = len(w) - len(suf)
        if case == 1 and start >= r2:
            w, changed = w[:-len(suf)], True
        elif case == 2 and start >= r2:
            w, changed = w[:-len(suf)] + "log", True
        elif case == 3 and start >= r2:
            w, changed = w[:-len(suf)] + "u", True
        elif case == 4 and start >= r2:
            w, changed = w[:-len(suf)] + "ente", True
        elif case == 5 and start >= r1:
            w, changed = w[:-6], True
            m2 = _longest_suffix(w, [("ic", 2), ("ad", 2), ("os", 2),
                                     ("iv", 1)])
            if m2 and len(w) - 2 >= r2:
                w = w[:-2]
                if m2[1] == 1 and w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif case == 6 and start >= r2:
            w, changed = w[:-5], True
            m2 = _longest_suffix(w, [("ante", None), ("avel", None),
                                     ("ível", None)])
            if m2 and len(w) - 4 >= r2:
                w = w[:-4]
        elif case == 7 and start >= r2:
            w, changed = w[:-len(suf)], True
            m2 = _longest_suffix(w, [("abil", None), ("ic", None),
                                     ("iv", None)])
            if m2 and len(w) - len(m2[0]) >= r2:
                w = w[:-len(m2[0])]
        elif case == 8 and start >= r2:
            w, changed = w[:-len(suf)], True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
        elif case == 9 and start >= rv and w[:start].endswith("e"):
            w, changed = w[:-len(suf)] + "ir", True

    if not changed:
        m = _longest_suffix_in_r1(w, rv, _PT_VERB)
        if m:
            w, changed = w[:-len(m)], True

    if changed:
        # final i preceded by c, i in RV -> delete
        if w.endswith("ci") and len(w) - 1 >= rv:
            w = w[:-1]
    else:
        m = _longest_suffix_in_r1(w, rv, ("os", "a", "i", "o", "á",
                                          "í", "ó"))
        if m:
            w = w[:-len(m)]

    # residual form
    if w.endswith(("e", "é", "ê")):
        pos = len(w) - 1
        if pos >= rv:
            w = w[:-1]
            if ((w.endswith("gu") or w.endswith("ci"))
                    and len(w) - 1 >= rv):
                w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Russian — russian.sbl / RussianStemmer.java
# (every step runs inside RV: setlimit tomark pV wraps the whole
# backwards block, so suffixes AND their а/я look-behinds must lie in RV)
# ---------------------------------------------------------------------------

_RU_V = "аеиоуыэюя"
_RU_PERF1 = ("вшись", "вши", "в")
_RU_PERF2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJ = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ое", "ые",
    "ей", "ий", "ой", "ый", "ем", "им", "ом", "ым", "их", "ых", "ею",
    "ою", "ую", "юю", "ая", "яя",
)
_RU_PART1 = ("нн", "ем", "вш", "ющ", "щ")
_RU_PART2 = ("ивш", "ывш", "ующ")
_RU_VERB1 = (
    "нно", "ете", "йте", "ешь", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)
_RU_VERB2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ит", "ыт", "ят", "ую",
    "ю",
)
_RU_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию", "ья",
    "ье", "ия", "ью", "ии", "еи", "ие", "ей", "ий", "ой",
    "ам", "ем", "ом", "ям", "ах", "ях", "ев", "ов", "а", "е", "и",
    "й", "о", "у", "ы", "ь", "ю", "я",
)


def snowball_russian_stem(w: str) -> str:
    w = w.replace("ё", "е")
    n = len(w)
    i = 0
    while i < n and w[i] not in _RU_V:
        i += 1
    rv = i + 1 if i < n else n
    i = rv
    while i < n and w[i] in _RU_V:
        i += 1
    p1 = i + 1 if i < n else n
    i = p1
    while i < n and w[i] not in _RU_V:
        i += 1
    i += 1  # past the vowel
    while i < n and w[i] in _RU_V:
        i += 1
    r2 = i + 1 if i < n else n

    def ay(start: int) -> bool:
        return start - 1 >= rv and w[start - 1] in "ая"

    # step 1: perfective gerund, else (reflexive? then adj|verb|noun)
    m = _longest_suffix_in_r1(w, rv, _RU_PERF1 + _RU_PERF2)
    if m and (m in _RU_PERF2 or ay(len(w) - len(m))):
        w = w[: -len(m)]
    else:
        m = _longest_suffix_in_r1(w, rv, ("сь", "ся"))
        if m:
            w = w[: -len(m)]
        m = _longest_suffix_in_r1(w, rv, _RU_ADJ)
        if m:
            w = w[: -len(m)]
            m2 = _longest_suffix_in_r1(w, rv, _RU_PART1 + _RU_PART2)
            if m2 and (m2 in _RU_PART2 or ay(len(w) - len(m2))):
                w = w[: -len(m2)]
        else:
            m = _longest_suffix_in_r1(w, rv, _RU_VERB1 + _RU_VERB2)
            if m and (m in _RU_VERB2 or ay(len(w) - len(m))):
                w = w[: -len(m)]
            else:
                m = _longest_suffix_in_r1(w, rv, _RU_NOUN)
                if m:
                    w = w[: -len(m)]

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational (R2, within RV)
    m = _longest_suffix_in_r1(w, rv, ("ость", "ост"))
    if m and len(w) - len(m) >= r2:
        w = w[: -len(m)]

    # step 4: tidy up
    m = _longest_suffix_in_r1(w, rv, ("ейше", "ейш", "н", "ь"))
    if m in ("ейше", "ейш"):
        w = w[: -len(m)]
        if w.endswith("нн") and len(w) - 1 >= rv:
            w = w[:-1]
    elif m == "н":
        if w[-2:] == "нн" and len(w) - 2 >= rv:
            w = w[:-1]
    elif m == "ь":
        w = w[:-1]
    return w




# ---------------------------------------------------------------------------
# Dutch — snowball dutch.sbl / DutchStemmer.java
# (R2 continues from the UNADJUSTED R1 before the min-3 floor is applied —
#  the floor only moves the R1 *test* position, not the R2 scan start)
# ---------------------------------------------------------------------------

_NL_V = "aeiouyè"

_NL_MAP = str.maketrans("äëïöüáéíóú", "aeiouaeiou")

def _nl_undouble(w):
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w

def snowball_dutch_stem(w):
    w = w.translate(_NL_MAP)
    # mark: initial y -> Y, y after vowel -> Y, i between vowels -> I
    ch = list(w)
    n = len(ch)
    for j in range(n):
        if ch[j] == "y" and (j == 0 or ch[j-1] in _NL_V):
            ch[j] = "Y"
        elif ch[j] == "i" and 0 < j < n-1 and ch[j-1] in _NL_V and ch[j+1] in _NL_V:
            ch[j] = "I"
    w = "".join(ch)
    r1 = _r_after(w, 0, _NL_V)
    r2 = _r_after(w, r1, _NL_V)   # from the UNADJUSTED r1
    if r1 < 3: r1 = 3

    def in_r1(i): return i >= r1
    def in_r2(i): return i >= r2

    # step 1
    if w.endswith("heden"):
        if in_r1(len(w)-5): w = w[:-5] + "heid"
    elif w.endswith("ene") or w.endswith("en"):
        k = 3 if w.endswith("ene") else 2
        stem = w[:-k]
        if in_r1(len(w)-k) and stem and stem[-1] not in _NL_V + "i" and not stem.endswith("gem"):
            # wait: valid en-ending: non-vowel and not gem — check spec
            w = _nl_undouble(stem)
    elif w.endswith("se") or w.endswith("s"):
        k = 2 if w.endswith("se") else 1
        stem = w[:-k]
        if in_r1(len(w)-k) and stem and stem[-1] not in _NL_V + "j":
            w = stem
    # step 2
    e_found = False
    if w.endswith("e") and in_r1(len(w)-1) and len(w) >= 2 and w[-2] not in _NL_V:
        e_found = True
        w = _nl_undouble(w[:-1])
    # step 3a
    if w.endswith("heid") and in_r2(len(w)-4) and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en"):
            stem = w[:-2]
            if in_r1(len(w)-2) and stem and stem[-1] not in _NL_V + "i" and not stem.endswith("gem"):
                w = _nl_undouble(stem)
    # step 3b
    if w.endswith("end") or w.endswith("ing"):
        if in_r2(len(w)-3):
            w = w[:-3]
            if w.endswith("ig") and in_r2(len(w)-2) and (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
    elif w.endswith("ig"):
        if in_r2(len(w)-2) and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif w.endswith("lijk"):
        if in_r2(len(w)-4):
            w = w[:-4]
            if w.endswith("e") and in_r1(len(w)-1) and len(w) >= 2 and w[-2] not in _NL_V:
                w = _nl_undouble(w[:-1])
    elif w.endswith("baar"):
        if in_r2(len(w)-4):
            w = w[:-4]
    elif w.endswith("bar"):
        if in_r2(len(w)-3) and e_found:
            w = w[:-3]
    # step 4: undouble vowel  C v v d  (d != I, v in aa ee oo uu)
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (c not in _NL_V and d not in _NL_V and d != "I"
                and v1 == v2 and v1 in "aeou"):
            w = w[:-2] + w[-1]
    return w.replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Romanian — snowball romanian.sbl / RomanianStemmer.java
# (RV is the Spanish-style region; verb suffixes must lie entirely in RV,
#  including the consonant/u lookback of the conditional group)
# ---------------------------------------------------------------------------

_RO_V = "aeiouăâî"   # a e i o u ă â î

def _rv_spanish(w, vowels):
    n = len(w)
    if n < 2: return n
    if w[1] not in vowels:            # X C ... -> after next vowel
        i = 2
        while i < n and w[i] not in vowels: i += 1
        return i + 1 if i < n else n
    if w[0] in vowels:                # V V ... -> after next consonant
        i = 2
        while i < n and w[i] in vowels: i += 1
        return i + 1 if i < n else n
    return 3 if n > 3 else n          # C V -> after third letter

_RO_STEP0 = [
    ("ul", 1), ("ului", 1),
    ("aua", 2),
    ("ea", 3), ("ele", 3), ("elor", 3),
    ("iua", 4), ("iei", 4), ("ii", 4), ("ilor", 4), ("iilor", 4), ("iile", 4),
    ("ile", 5),
    ("atei", 6),
    ("aţia", 7), ("aţie", 7),
]
_RO_COMBO = [
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
    ("abilităţi", "abil"),
    ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
    ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
    ("icităţi", "ic"), ("icator", "ic"), ("icatori", "ic"),
    ("iciv", "ic"), ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"),
    ("icivă", "ic"), ("ical", "ic"), ("icala", "ic"), ("icale", "ic"),
    ("icali", "ic"), ("icală", "ic"),
    ("ativ", "at"), ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
    ("ativă", "at"), ("aţiune", "at"), ("atoare", "at"),
    ("ator", "at"), ("atori", "at"),
    ("ătoare", "at"), ("ător", "at"), ("ători", "at"),
    ("itiv", "it"), ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
    ("itivă", "it"), ("iţiune", "it"), ("itoare", "it"),
    ("itor", "it"), ("itori", "it"),
]
_RO_STD = [
    # case 1: delete
    *[(s, 1) for s in (
        "ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta", "iva",
        "ic", "ice", "abile", "ibile", "oase", "ate", "itate", "ite", "ante",
        "ute", "ive", "ici", "abili", "ibili", "atori", "osi", "ati", "itati",
        "iti", "anti", "uti", "ivi", "ităi", "oşi",
        "ităţi", "abil", "ibil", "ator", "os", "at", "it", "ant",
        "ut", "iv", "ică", "abilă", "ibilă", "oasă",
        "ată", "ită", "antă", "ută", "ivă")],
    ("iune", 2), ("iuni", 2),
    ("ista", 3), ("isme", 3), ("iste", 3), ("isti", 3), ("işti", 3),
    ("ism", 3), ("ist", 3), ("istă", 3),
]
# verb suffixes: 1 = delete if preceded (within RV) by consonant or 'u';
# 2 = delete
_RO_VERB = [
    *[(s, 1) for s in (
        "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere",
        "ire", "âre", "ase", "ise", "use", "âse",
        "eşte", "ăşte", "eze", "ai", "eai", "iai",
        "eşti", "ăşti", "ui", "ezi", "âi", "aşi",
        "aseşi", "iseşi", "useşi", "âseşi",
        "işi", "uşi", "âşi",
        "eaţi", "iaţi", "arăţi",
        "aserăţi", "iserăţi", "userăţi",
        "âserăţi", "irăţi", "urăţi",
        "ârăţi", "am", "eam", "iam", "asem", "isem", "usem",
        "âsem", "arăm", "aserăm", "iserăm",
        "userăm", "âserăm", "irăm", "urăm",
        "ârăm", "au", "eau", "iau", "indu", "ându", "ez",
        "ească", "ară", "aseră", "iseră",
        "useră", "âseră", "iră", "ură",
        "âră", "ează")],
    *[(s, 2) for s in (
        "se", "sese", "sei", "seşi", "seseşi", "aţi",
        "eţi", "iţi", "âţi", "serăţi",
        "seserăţi", "em", "sesem", "im", "âm", "ăm",
        "serăm", "seserăm", "seră", "seseră")],
]

def snowball_romanian_stem(w):
    # prelude: u/i after a vowel and before a vowel -> U/I
    ch = list(w); n = len(ch)
    for j in range(1, n - 1):
        if ch[j] in "ui" and ch[j-1] in _RO_V and ch[j+1] in _RO_V:
            ch[j] = ch[j].upper()
    w = "".join(ch)
    pv = _rv_spanish(w, _RO_V)
    r1 = _r_after(w, 0, _RO_V)
    r2 = _r_after(w, r1, _RO_V)

    # step 0 (R1)
    m = _longest_suffix(w, _RO_STEP0)
    if m and len(w) - len(m[0]) >= r1:
        suf, act = m
        stem = w[:-len(suf)]
        if act == 1: w = stem
        elif act == 2: w = stem + "a"
        elif act == 3: w = stem + "e"
        elif act == 4: w = stem + "i"
        elif act == 5:
            if not stem.endswith("ab"): w = stem + "i"
        elif act == 6: w = stem + "at"
        elif act == 7: w = stem + "aţi"

    # standard suffix: repeat combo (R1), then a_3 (R2)
    removed = False
    while True:
        m = _longest_suffix(w, _RO_COMBO)
        if m and len(w) - len(m[0]) >= r1:
            w = w[:-len(m[0])] + m[1]
            removed = True
        else:
            break
    m = _longest_suffix(w, _RO_STD)
    if m and len(w) - len(m[0]) >= r2:
        suf, act = m
        if act == 1:
            w = w[:-len(suf)]; removed = True
        elif act == 2:
            if w[:-len(suf)].endswith("ţ"):
                w = w[:-len(suf)-1] + "t"; removed = True
        elif act == 3:
            w = w[:-len(suf)] + "ist"; removed = True

    # verb suffix (only if nothing removed above), entirely within RV
    if not removed:
        m = _longest_suffix(w, [(s, a) for s, a in _RO_VERB
                         if len(w) - len(s) >= pv and w.endswith(s)])
        if m:
            suf, act = m
            i = len(w) - len(suf)
            if act == 2:
                w = w[:i]
            else:
                if i - 1 >= pv and (w[i-1] not in _RO_V or w[i-1] == "u"):
                    w = w[:i]
                # note: 'u' is a vowel, so condition = consonant or u

    # vowel suffix (RV)
    m = _longest_suffix(w, [("a", 1), ("e", 1), ("ie", 1), ("i", 1), ("ă", 1)])
    if m and len(w) - len(m[0]) >= pv:
        w = w[:-len(m[0])]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Irish — snowball irish.sbl / IrishStemmer.java
# (initial-mutation prefix strip, then noun/deriv/verb suffix passes)
# ---------------------------------------------------------------------------

_GA_V = "aeiouáéíóú"

_GA_PREFIX = [
    ("b'", ""), ("d'", ""), ("h-", ""), ("m'", ""), ("n-", ""), ("t-", ""),
    ("bhf", "f"), ("d'fh", "f"), ("fh", "f"),
    ("sh", "s"), ("ts", "s"),
    ("bh", "b"), ("mb", "b"),
    ("ch", "c"), ("gc", "c"),
    ("dh", "d"), ("nd", "d"),
    ("gh", "g"), ("ng", "g"),
    ("bp", "p"), ("ph", "p"),
    ("dt", "t"), ("th", "t"),
    ("mh", "m"),
]
_GA_NOUN = [
    *[(s, 1) for s in ("íochta", "aíochta", "abh", "eabh", "ibh", "aibh",
                       "amh", "eamh", "imh", "aimh", "íocht", "aíocht")],
    *[(s, 2) for s in ("ire", "aire", "irí", "airí")],
]
_GA_DERIV = [
    *[(s, 1) for s in ("achta", "eachta", "ach", "each", "acht", "eacht",
                       "achtúil", "eachtúil")],
    *[(s, ("arc",)) for s in ("arcachta", "arcacht", "arcachtaí")],
    *[(s, ("gin",)) for s in ("gineach", "gineas", "ginis")],
    *[(s, ("graf",)) for s in ("grafaíochta", "grafaíoch", "grafaíocht",
                               "grafaíochtaí")],
    *[(s, ("paite",)) for s in ("patacha", "paite", "patach", "pataigh")],
    *[(s, ("óid",)) for s in ("óideacha", "óideach", "óidigh")],
]
_GA_VERB = [
    *[(s, 1) for s in ("imid", "aimid", "ímid", "aímid", "faidh", "fidh")],
    *[(s, 2) for s in ("adh", "eadh", "áil", "ain", "tear", "tar")],
]

def snowball_irish_stem(w):
    # initial mutation/morph prefix (longest match at word start)
    best = None
    for pre, rep in _GA_PREFIX:
        if w.startswith(pre) and (best is None or len(pre) > len(best[0])):
            best = (pre, rep)
    if best:
        w = best[1] + w[len(best[0]):]
    # regions
    n = len(w); i = 0
    while i < n and w[i] not in _GA_V: i += 1
    pv = i + 1 if i < n else n
    r1 = _r_after(w, 0, _GA_V)
    r2 = _r_after(w, r1, _GA_V)

    m = _longest_suffix(w, _GA_NOUN)
    if m:
        suf, act = m; i = len(w) - len(suf)
        if (act == 1 and i >= r1) or (act == 2 and i >= r2):
            w = w[:i]
    m = _longest_suffix(w, _GA_DERIV)
    if m:
        suf, act = m; i = len(w) - len(suf)
        if act == 1:
            if i >= r2: w = w[:i]
        else:
            w = w[:i] + act[0]
    m = _longest_suffix(w, _GA_VERB)
    if m:
        suf, act = m; i = len(w) - len(suf)
        if (act == 1 and i >= pv) or (act == 2 and i >= r1):
            w = w[:i]
    return w


# ---------------------------------------------------------------------------
# Hungarian — snowball hungarian.sbl / HungarianStemmer.java
# (R1 honours initial digraphs cs/dzs/gy/ly/ny/sz/ty/zs; un-double removes
#  the second-to-last char so ccs->cs, ssz->sz work unchanged)
# ---------------------------------------------------------------------------

_HU_V = "aeiouáéíóöőúüű"
_HU_DIGRAPH = ("cs", "dzs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLE = ("bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk", "ll",
              "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz", "tt", "tty",
              "vv", "zz", "zzs")

def _hu_r1(w):
    n = len(w)
    if not n: return n
    if w[0] in _HU_V:
        i = 0
        while i < n and w[i] in _HU_V: i += 1   # first consonant
        if i >= n: return n
        for d in sorted(_HU_DIGRAPH, key=len, reverse=True):
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_V: i += 1   # first vowel
    return i + 1 if i < n else n

def _ends_double(w):
    return any(w.endswith(d) for d in _HU_DOUBLE)

def _undouble(w):
    return w[:-2] + w[-1] if len(w) >= 2 else w

_HU_CASE = ("ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
            "nál", "nél", "ból", "ról", "tól", "ül", "ből", "ről", "től",
            "n", "an", "ban", "en", "ben", "képpen", "on", "ön", "képp",
            "kor", "t", "at", "et", "ként", "anként", "enként", "onként",
            "ot", "ért", "öt", "hez", "hoz", "höz", "vá", "vé")

def snowball_hungarian_stem(w):
    r1 = _hu_r1(w)

    def in_r1(i): return i >= r1

    def v_ending(w):
        if w.endswith("á") and in_r1(len(w) - 1): return w[:-1] + "a"
        if w.endswith("é") and in_r1(len(w) - 1): return w[:-1] + "e"
        return w

    # instrum: al/el in R1, preceded by double consonant -> delete + undouble
    if w.endswith(("al", "el")) and in_r1(len(w) - 2) and _ends_double(w[:-2]):
        w = _undouble(w[:-2])
    # case
    m = _longest_suffix(w, [(s, 1) for s in _HU_CASE])
    if m and in_r1(len(w) - len(m[0])):
        w = v_ending(w[:-len(m[0])])
    # case_special: án->a, ánként->a, én->e (longest)
    m = _longest_suffix(w, [("án", "a"), ("én", "e"), ("ánként", "a")])
    if m and in_r1(len(w) - len(m[0])):
        w = w[:-len(m[0])] + m[1]
    # case_other: stul/astul/stül/estül -> delete; ástul->a; éstül->e
    m = _longest_suffix(w, [("stul", ""), ("astul", ""), ("stül", ""),
                     ("estül", ""), ("ástul", "a"), ("éstül", "e")])
    if m and in_r1(len(w) - len(m[0])):
        w = w[:-len(m[0])] + m[1]
    # factive: final á/é in R1 preceded by double -> delete + undouble
    if w and w[-1] in "áé" and in_r1(len(w) - 1) and _ends_double(w[:-1]):
        w = _undouble(w[:-1])
    # owned
    m = _longest_suffix(w, [("éi", ""), ("áéi", "a"), ("ééi", "e"), ("é", ""),
                     ("ké", ""), ("aké", ""), ("eké", ""), ("oké", ""),
                     ("öké", ""), ("áké", "a"), ("éké", "e"), ("éé", "e")])
    if m and in_r1(len(w) - len(m[0])):
        w = w[:-len(m[0])] + m[1]
    # sing_owner
    m = _longest_suffix(w, [
        *[(s, "") for s in ("a", "ja", "d", "ad", "ed", "od", "öd", "e",
                            "je", "nk", "unk", "ünk", "uk", "juk", "ük",
                            "jük", "m", "am", "em", "om", "o")],
        *[(s, "a") for s in ("ád", "ánk", "ájuk", "ám", "á")],
        *[(s, "e") for s in ("éd", "énk", "éjük", "ém", "é")]])
    if m and in_r1(len(w) - len(m[0])):
        w = w[:-len(m[0])] + m[1]
    # plur_owner
    m = _longest_suffix(w, [
        *[(s, "") for s in ("id", "aid", "jaid", "eid", "jeid", "i", "ai",
                            "jai", "ei", "jei", "itek", "eitek", "jeitek",
                            "ik", "aik", "jaik", "eik", "jeik", "ink",
                            "aink", "jaink", "eink", "jeink", "aitok",
                            "jaitok", "im", "aim", "jaim", "eim", "jeim")],
        *[(s, "a") for s in ("áid", "ái", "áik", "áink", "áitok", "áim")],
        *[(s, "e") for s in ("éid", "éi", "éitek", "éik", "éink", "éim")]])
    if m and in_r1(len(w) - len(m[0])):
        w = w[:-len(m[0])] + m[1]
    # plural
    m = _longest_suffix(w, [("k", ""), ("ak", ""), ("ek", ""), ("ok", ""),
                     ("ök", ""), ("ák", "a"), ("ék", "e")])
    if m and in_r1(len(w) - len(m[0])):
        w = w[:-len(m[0])] + m[1]
    return w


# ---------------------------------------------------------------------------
# Finnish — snowball finnish.sbl / FinnishStemmer.java
# (case endings match entirely inside R1; den/seen/tten/siin carry
#  in-among conditions that FALL BACK to shorter matches on failure,
#  while the hAn-family vowel checks are post-commit and abort the rule)
# ---------------------------------------------------------------------------

_FI_V1 = "aeiouyäö"
_FI_V2 = "aeiouäö"
_FI_PARTICLE_END = _FI_V1 + "nt"
_FI_AEI = "aeiä"
_FI_C = "bcdfghjklmnpqrstvwxz"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

def snowball_finnish_stem(w):
    p1 = _r_after(w, 0, _FI_V1)
    p2 = _r_after(w, p1, _FI_V1)
    ending_removed = False

    def within_r1(suf, word):
        return len(word) - len(suf) >= p1 and word.endswith(suf)

    # --- particle etc (suffix within R1) ---
    best = None
    for suf, act in (("pa", 1), ("sti", 2), ("kaan", 1), ("han", 1),
                     ("kin", 1), ("hän", 1), ("kään", 1), ("ko", 1),
                     ("pä", 1), ("kö", 1)):
        if within_r1(suf, w) and (best is None or len(suf) > len(best[0])):
            best = (suf, act)
    if best:
        suf, act = best
        stem = w[:-len(suf)]
        if act == 1:
            if stem and stem[-1] in _FI_PARTICLE_END:
                w = stem
        elif len(w) - len(suf) >= p2:
            w = stem

    # --- possessive (suffix within R1) ---
    best = None
    for suf, act in (("nsa", 3), ("mme", 3), ("nne", 3), ("ni", 2),
                     ("si", 1), ("an", 4), ("en", 6), ("än", 5),
                     ("nsä", 3)):
        if within_r1(suf, w) and (best is None or len(suf) > len(best[0])):
            best = (suf, act)
    if best:
        suf, act = best
        stem = w[:-len(suf)]
        if act == 1:
            if not stem.endswith("k"):
                w = stem
        elif act == 2:
            w = stem[:-3] + "ksi" if stem.endswith("kse") else stem
        elif act == 3:
            w = stem
        elif act == 4:
            if stem.endswith(("lla", "na", "ssa", "ta", "lta", "sta")):
                w = stem
        elif act == 5:
            if stem.endswith(("llä", "nä", "ssä", "tä", "ltä", "stä")):
                w = stem
        elif act == 6:
            if stem.endswith(("lle", "ine")):
                w = stem

    # --- case ending (suffix within R1) ---
    # in-among conditions (fallback to shorter match on failure); the
    # lookback itself must also lie within R1
    def cond_vi(stem):     # preceded by i preceded by V2, all >= p1
        return (len(stem) >= 2 and len(stem) - 2 >= p1
                and stem[-1] == "i" and stem[-2] in _FI_V2)

    def cond_long(stem):   # preceded by a long vowel, both chars >= p1
        return len(stem) - 2 >= p1 and stem.endswith(_FI_LONG)

    _CASE = [
        ("a", 8), ("lla", 0), ("na", 0), ("ssa", 0), ("ta", 0), ("lta", 0),
        ("sta", 0), ("tta", 2), ("lle", 0), ("ine", 0), ("ksi", 0),
        ("n", 7), ("han", 1), ("den", cond_vi), ("seen", cond_long),
        ("hen", 12), ("tten", cond_vi), ("hin", 13), ("siin", cond_vi),
        ("hon", 14), ("hän", 15), ("hön", 16), ("ä", 8), ("llä", 0),
        ("nä", 0), ("ssä", 0), ("tä", 0), ("ltä", 0), ("stä", 0),
        ("ttä", 2),
    ]
    cands = sorted((c for c in _CASE if within_r1(c[0], w)),
                   key=lambda c: -len(c[0]))
    chosen = None
    for suf, act in cands:
        if callable(act):
            if act(w[:-len(suf)]):
                chosen = (suf, -1)
                break
            continue          # in-among condition failed: fallback
        chosen = (suf, act)
        break
    if chosen:
        suf, act = chosen
        stem = w[:-len(suf)]
        ok = True
        extra = 0
        if act in (1, 12, 13, 14, 15, 16):
            vow = {1: "a", 12: "e", 13: "i", 14: "o", 15: "ä", 16: "ö"}[act]
            ok = stem.endswith(vow)
        elif act == 2:
            ok = stem.endswith("e")
        elif act == 7:
            # n: if preceded by long vowel or "ie", delete one extra char
            if stem.endswith(_FI_LONG) or stem.endswith("ie"):
                if len(stem) - 1 >= p1:
                    extra = 1
        elif act == 8:
            ok = (len(stem) >= 2 and stem[-1] in _FI_V1
                  and stem[-2] in _FI_C)
        if ok:
            w = stem[:-extra] if extra else stem
            ending_removed = True

    # --- other endings (suffix within R2) ---
    best = None
    for suf, act in (("eja", 0), ("mma", 1), ("imma", 0), ("mpa", 1),
                     ("impa", 0), ("mmi", 1), ("immi", 0), ("mpi", 1),
                     ("impi", 0), ("ejä", 0), ("mmä", 1), ("immä", 0),
                     ("mpä", 1), ("impä", 0)):
        if len(w) - len(suf) >= p2 and w.endswith(suf) and (
                best is None or len(suf) > len(best[0])):
            best = (suf, act)
    if best:
        suf, act = best
        stem = w[:-len(suf)]
        if act == 0 or not stem.endswith("po"):
            w = stem

    # --- i/t plural ---
    if ending_removed:
        if w and w[-1] in "ij" and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        if (w.endswith("t") and len(w) - 1 >= p1
                and len(w) >= 2 and len(w) - 2 >= p1 and w[-2] in _FI_V1):
            w = w[:-1]
            best = None
            for suf, act in (("mma", 1), ("imma", 0)):
                if len(w) - len(suf) >= p2 and w.endswith(suf) and (
                        best is None or len(suf) > len(best[0])):
                    best = (suf, act)
            if best:
                suf, act = best
                stem = w[:-len(suf)]
                if act == 0 or not stem.endswith("po"):
                    w = stem

    # --- tidy (each op independent; lookbacks within R1 for the first 4)
    if len(w) - 2 >= p1 and w.endswith(_FI_LONG):
        w = w[:-1]
    if (w and len(w) - 1 >= p1 and w[-1] in _FI_AEI
            and len(w) >= 2 and len(w) - 2 >= p1 and w[-2] in _FI_C):
        w = w[:-1]
    if len(w) - 1 >= p1 and w.endswith(("oj", "uj")):
        w = w[:-1]
    if len(w) - 1 >= p1 and w.endswith("jo"):
        w = w[:-1]
    # final consonant undouble (unlimited scan)
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_V1:
        i -= 1
    if i >= 1 and w[i] in _FI_C and w[i-1] == w[i]:
        w = w[:i] + w[i+1:]
    return w


# ---------------------------------------------------------------------------
# Nepali — snowball nepali.sbl / NepaliStemmer.java
# (category-1 postposition strip, then a loop of optional category-2
#  removal + category-3 removal until no category-3 suffix remains;
#  suffix tables vendored from the published algorithm)
# ---------------------------------------------------------------------------

A0 = [('लाइ', 1), ('लाई', 1), ('सँग', 1), ('संग', 1), ('मार्फत', 1), ('रत', 1), ('का', 2), ('मा', 1), ('द्वारा', 1), ('कि', 2), ('पछि', 1), ('की', 2), ('ले', 1), ('कै', 2), ('सँगै', 1), ('मै', 1), ('को', 2)]
A1 = [('ँ', -1), ('ं', -1), ('ै', -1)]
A2 = [('ँ', 1), ('ं', 1), ('ै', 2)]
A3 = [('थिए', 1), ('छ', 1), ('इछ', 1), ('एछ', 1), ('िछ', 1), ('ेछ', 1), ('नेछ', 1), ('हुनेछ', 1), ('इन्छ', 1), ('िन्छ', 1), ('हुन्छ', 1), ('एका', 1), ('इएका', 1), ('िएका', 1), ('ेका', 1), ('नेका', 1), ('दा', 1), ('इदा', 1), ('िदा', 1), ('देखि', 1), ('माथि', 1), ('एकी', 1), ('इएकी', 1), ('िएकी', 1), ('ेकी', 1), ('देखी', 1), ('थी', 1), ('दी', 1), ('छु', 1), ('एछु', 1), ('ेछु', 1), ('नेछु', 1), ('नु', 1), ('हरु', 1), ('हरू', 1), ('छे', 1), ('थे', 1), ('ने', 1), ('एकै', 1), ('ेकै', 1), ('नेकै', 1), ('दै', 1), ('इदै', 1), ('िदै', 1), ('एको', 1), ('इएको', 1), ('िएको', 1), ('ेको', 1), ('नेको', 1), ('दो', 1), ('इदो', 1), ('िदो', 1), ('यो', 1), ('इयो', 1), ('भयो', 1), ('ियो', 1), ('थियो', 1), ('दियो', 1), ('थ्यो', 1), ('छौ', 1), ('इछौ', 1), ('एछौ', 1), ('िछौ', 1), ('ेछौ', 1), ('नेछौ', 1), ('यौ', 1), ('थियौ', 1), ('छ्यौ', 1), ('थ्यौ', 1), ('छन्', 1), ('इछन्', 1), ('एछन्', 1), ('िछन्', 1), ('ेछन्', 1), ('नेछन्', 1), ('लान्', 1), ('छिन्', 1), ('थिन्', 1), ('पर्', 1), ('इस्', 1), ('थिइस्', 1), ('छस्', 1), ('इछस्', 1), ('एछस्', 1), ('िछस्', 1), ('ेछस्', 1), ('नेछस्', 1), ('िस्', 1), ('थिस्', 1), ('छेस्', 1), ('होस्', 1)]


def snowball_nepali_stem(w):
    # category 1: postpositions
    m = _longest_suffix(w, A0)
    if m:
        suf, act = m
        stem = w[:-len(suf)]
        if act == 1:
            w = stem
        elif act == 2 and not (stem.endswith("ए") or stem.endswith("े")):
            w = stem
    # loop: optional category-2 removal, then category-3 removal
    while True:
        m2 = _longest_suffix(w, A2)
        if m2:
            suf, act = m2
            stem = w[:-len(suf)]
            if act == 1 and (stem.endswith("यौ") or stem.endswith("छौ")
                             or stem.endswith("नौ") or stem.endswith("थे")):
                w = stem
            elif act == 2 and stem.endswith("त्र"):
                w = stem
        m3 = _longest_suffix(w, A3)
        if not m3:
            break
        w = w[:-len(m3[0])]
    return w




# ---------------------------------------------------------------------------
# Turkish — snowball turkish.sbl / TurkishStemmer.java
# (suffix-chain state machines; vowel harmony = "some earlier vowel in the
#  harmony group of the word's last vowel"; snowball try() restores the
#  cursor but never the buffer, so an lAr slice whose required ki-chain
#  then fails stays removed — C6 even falls through to the possessive
#  alternatives on the mutated buffer; the reference's C4 lArI branch
#  matches without slicing, replicated as-is)
# ---------------------------------------------------------------------------

_TR_V = "aeiouöüı"
_TR_U = "iuüı"
_TR_HARMONY = {"a": "aouı", "e": "eiöü", "ı": "aı", "i": "ei",
               "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}

def _tr_harmony(s):
    i = len(s) - 1
    while i >= 0 and s[i] not in _TR_V:
        i -= 1
    if i < 0:
        return False
    grp = _TR_HARMONY[s[i]]
    return any(ch in grp for ch in s[:i])

def _among(w, c, sufs):
    best = None
    s = w[:c]
    for suf in sufs:
        if s.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    return c - len(best) if best else None

def _opt_cons(w, c, ch):
    # optional n/s/y consonant before position c
    if c >= 1 and w[c-1] == ch:
        return c - 1 if c >= 2 and w[c-2] in _TR_V else None
    if c >= 2 and w[c-2] in _TR_V:
        return c
    return None

def _opt_U(w, c):
    # optional U vowel (i/u/ü/ı) before position c, after a consonant
    if c >= 1 and w[c-1] in _TR_U:
        return c - 1 if c >= 2 and w[c-2] not in _TR_V else None
    if c >= 2 and w[c-2] not in _TR_V:
        return c
    return None

def _harmonic(sufs, opt=None):
    def mark(w, c):
        if not _tr_harmony(w[:c]):
            return None
        c2 = _among(w, c, sufs)
        if c2 is None:
            return None
        return _opt_cons(w, c2, opt) if opt else c2
    return mark

def _plain(sufs, opt=None):
    def mark(w, c):
        c2 = _among(w, c, sufs)
        if c2 is None:
            return None
        return _opt_cons(w, c2, opt) if opt else c2
    return mark

def _m_possessives(w, c):
    c2 = _among(w, c, ("m", "n", "miz", "niz", "muz", "nuz",
                       "müz", "nüz", "mız", "nız"))
    return _opt_U(w, c2) if c2 is not None else None

def _m_sU(w, c):
    if _tr_harmony(w[:c]) and c >= 1 and w[c-1] in _TR_U:
        return _opt_cons(w, c - 1, "s")
    return None

def _m_yU(w, c):
    if _tr_harmony(w[:c]) and c >= 1 and w[c-1] in _TR_U:
        return _opt_cons(w, c - 1, "y")
    return None

def _m_yken(w, c):
    return _opt_cons(w, c - 3, "y") if w[:c].endswith("ken") else None

def _m_ki(w, c):
    return c - 2 if w[:c].endswith("ki") else None

_m_lArI = _plain(("leri", "ları"))
_m_nU = _harmonic(("ni", "nu", "nü", "nı"))
_m_nUn = _harmonic(("in", "un", "ün", "ın"), "n")
_m_yA = _harmonic(("a", "e"), "y")
_m_nA = _harmonic(("na", "ne"))
_m_DA = _harmonic(("da", "ta", "de", "te"))
_m_ndA = _harmonic(("nda", "nde"))
_m_DAn = _harmonic(("dan", "tan", "den", "ten"))
_m_ndAn = _harmonic(("ndan", "nden"))
_m_ylA = _harmonic(("la", "le"), "y")
_m_ncA = _harmonic(("ca", "ce"), "n")
_m_yUm = _harmonic(("im", "um", "üm", "ım"), "y")
_m_sUn = _harmonic(("sin", "sun", "sün", "sın"))
_m_yUz = _harmonic(("iz", "uz", "üz", "ız"), "y")
_m_sUnUz = _plain(("siniz", "sunuz", "sünüz", "sınız"))
_m_lAr = _harmonic(("lar", "ler"))
_m_nUz = _harmonic(("niz", "nuz", "nüz", "nız"))
_m_DUr = _harmonic(("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır"))
_m_cAsInA = _plain(("casına", "cesine"))
_m_yDU = _harmonic(tuple(d + v + t for d in "dt" for v in "iuüı"
                         for t in ("", "k", "m", "n")), "y")
_m_ysA = _plain(("sa", "se", "sak", "sek", "sam", "sem", "san", "sen"), "y")
_m_ymUs = _harmonic(("miş", "muş", "müş", "mış"), "y")

def _first(w, c, *marks):
    for m in marks:
        r = m(w, c)
        if r is not None:
            return r
    return None

def _try_lar_chain(w):
    """try([mark_lAr] delete stem_suffix_chain_before_ki): the lAr slice
    is permanent even when the required chain then fails (snowball's
    try() restores the cursor, never the buffer)."""
    r = _m_lAr(w, len(w))
    if r is not None:
        w = w[:r]
        w2 = _chain_ki(w)
        if w2 is not None:
            return w2
    return w

def _chain_ki(w):
    """stem_suffix_chain_before_ki at the end of w; None if no match."""
    c = _m_ki(w, len(w))
    if c is None:
        return None
    r = _m_DA(w, c)
    if r is not None:                       # B1: DAki
        w = w[:r]
        r2 = _m_lAr(w, len(w))
        if r2 is not None:
            w = w[:r2]
            w2 = _chain_ki(w)
            return w2 if w2 is not None else w
        r2 = _m_possessives(w, len(w))
        if r2 is not None:
            w = w[:r2]
            w = _try_lar_chain(w)
        return w
    r = _m_nUn(w, c)
    if r is not None:                       # B2: nUn + ki
        w = w[:r]
        r2 = _m_lArI(w, len(w))
        if r2 is not None:
            return w[:r2]
        r2 = _first(w, len(w), _m_possessives, _m_sU)
        if r2 is not None:
            return _try_lar_chain(w[:r2])
        w2 = _chain_ki(w)
        return w2 if w2 is not None else w
    r = _m_ndA(w, c)
    if r is not None:                       # B3: ndA + ki (no slice yet)
        r2 = _m_lArI(w, r)
        if r2 is not None:
            return w[:r2]
        r2 = _m_sU(w, r)
        if r2 is not None:
            return _try_lar_chain(w[:r2])
        w2 = _chain_ki(w[:r])               # chain at the pre-ndA cursor;
        if w2 is not None:                  # the ndAki tail stays in place
            return w2 + w[r:]
        return None                         # B3 failed entirely
    return None

def _nominal_verb(w):
    c = len(w)
    r = _first(w, c, _m_ymUs, _m_yDU, _m_ysA, _m_yken)
    if r is not None:
        return w[:r], True
    r = _m_cAsInA(w, c)
    if r is not None:
        r2 = _first(w, r, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)
        r3 = _m_ymUs(w, r2 if r2 is not None else r)
        if r3 is not None:
            return w[:r3], True
    r = _m_lAr(w, c)
    if r is not None:
        w = w[:r]
        r2 = _first(w, len(w), _m_DUr, _m_yDU, _m_ysA, _m_ymUs)
        if r2 is not None:
            w = w[:r2]
        return w, False
    r = _m_nUz(w, c)
    if r is not None:
        r2 = _first(w, r, _m_yDU, _m_ysA)
        if r2 is not None:
            return w[:r2], True
    r = _first(w, c, _m_sUnUz, _m_yUz, _m_sUn, _m_yUm)
    if r is not None:
        w = w[:r]
        r2 = _m_ymUs(w, len(w))
        if r2 is not None:
            w = w[:r2]
        return w, True
    r = _m_DUr(w, c)
    if r is not None:
        w = w[:r]
        r2 = _first(w, len(w), _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)
        r3 = _m_ymUs(w, r2 if r2 is not None else len(w))
        if r3 is not None:
            w = w[:r3]
        return w, True
    return w, True

def _noun_suffixes(w):
    c = len(w)
    r = _m_lAr(w, c)                        # C1
    if r is not None:
        w = w[:r]
        w2 = _chain_ki(w)
        return w2 if w2 is not None else w
    r = _m_ncA(w, c)                        # C2
    if r is not None:
        w = w[:r]
        r2 = _m_lArI(w, len(w))
        if r2 is not None:
            return w[:r2]
        r2 = _first(w, len(w), _m_possessives, _m_sU)
        if r2 is not None:
            return _try_lar_chain(w[:r2])
        r2 = _m_lAr(w, len(w))
        if r2 is not None:
            w2 = _chain_ki(w[:r2])
            if w2 is not None:
                return w2
            return w[:r2]                   # lAr slice permanent
        return w
    r = _first(w, c, _m_ndA, _m_nA)         # C3 (no slice until inner hit)
    if r is not None:
        r2 = _m_lArI(w, r)
        if r2 is not None:
            return w[:r2]
        r2 = _m_sU(w, r)
        if r2 is not None:
            return _try_lar_chain(w[:r2])
        w2 = _chain_ki(w[:r])
        if w2 is not None:
            return w2 + w[r:]
        # C3 failed; fall through
    r = _first(w, c, _m_ndAn, _m_nU)        # C4 (no slice until inner hit)
    if r is not None:
        r2 = _m_sU(w, r)
        if r2 is not None:
            return _try_lar_chain(w[:r2])
        if _m_lArI(w, r) is not None:
            return w                        # reference slices nothing here
        # C4 failed; fall through
    r = _m_DAn(w, c)                        # C5
    if r is not None:
        w = w[:r]
        r2 = _m_possessives(w, len(w))
        if r2 is not None:
            return _try_lar_chain(w[:r2])
        r2 = _m_lAr(w, len(w))
        if r2 is not None:
            w = w[:r2]
            w2 = _chain_ki(w)
            return w2 if w2 is not None else w
        w2 = _chain_ki(w)
        return w2 if w2 is not None else w
    r = _first(w, c, _m_nUn, _m_ylA)        # C6
    if r is not None:
        w = w[:r]
        r2 = _m_lAr(w, len(w))
        if r2 is not None:
            w = w[:r2]                      # lAr slice permanent
            w2 = _chain_ki(w)
            if w2 is not None:
                return w2
            # required chain failed: fall through to the next
            # alternatives ON THE MUTATED BUFFER (cursor-only restore)
        r2 = _first(w, len(w), _m_possessives, _m_sU)
        if r2 is not None:
            return _try_lar_chain(w[:r2])
        w2 = _chain_ki(w)
        return w2 if w2 is not None else w
    r = _m_lArI(w, c)                       # C7
    if r is not None:
        return w[:r]
    w2 = _chain_ki(w)                       # C8
    if w2 is not None:
        return w2
    r = _first(w, c, _m_DA, _m_yU, _m_yA)   # C9
    if r is not None:
        w = w[:r]
        r2 = _m_possessives(w, len(w))
        if r2 is not None:
            w = w[:r2]
            r3 = _m_lAr(w, len(w))
            if r3 is not None:
                w = w[:r3]
            w2 = _chain_ki(w)
            return w2 if w2 is not None else w
        r2 = _m_lAr(w, len(w))
        if r2 is not None:
            w = w[:r2]
            w2 = _chain_ki(w)
            return w2 if w2 is not None else w
        return w
    r = _first(w, c, _m_possessives, _m_sU)  # C10
    if r is not None:
        return _try_lar_chain(w[:r])
    return w

def snowball_turkish_stem(w):
    if sum(1 for ch in w if ch in _TR_V) < 2:
        return w
    w, cont = _nominal_verb(w)
    if not cont:
        return w
    w = _noun_suffixes(w)
    if w in ("ad", "soyad"):
        return w
    if w.endswith(("d", "g")):
        i = len(w) - 1
        while i >= 0 and w[i] not in _TR_V:
            i -= 1
        if i >= 0:
            v = w[i]
            w += ("ı" if v in "aı" else "i" if v in "ei"
                  else "u" if v in "ou" else "ü")
    tail = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
    if w and w[-1] in tail:
        w = w[:-1] + tail[w[-1]]
    return w




# ---------------------------------------------------------------------------
# Porter (snowball variant) — porter.sbl / PorterStemmer.java
# (the original 1980 algorithm with snowball's Y-marking prelude; differs
#  from porter2/english above and from the classic PorterStemmer in
#  analysis.py in the y handling and R-region tests)
# ---------------------------------------------------------------------------

_PORTER_V = "aeiouy"
_PORTER_VWXY = "aeiouwxyY"

def _sb_shortv(s):
    # backward C-V-X at end of s, X not in v_WXY
    return (len(s) >= 3 and s[-1] not in _PORTER_VWXY
            and s[-2] in _PORTER_V and s[-3] not in _PORTER_V)

_S2 = [("anci", "ance"), ("enci", "ence"), ("abli", "able"), ("eli", "e"),
       ("alli", "al"), ("ousli", "ous"), ("entli", "ent"), ("aliti", "al"),
       ("biliti", "ble"), ("iviti", "ive"), ("tional", "tion"),
       ("ational", "ate"), ("alism", "al"), ("ation", "ate"),
       ("ization", "ize"), ("izer", "ize"), ("ator", "ate"),
       ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")]
_S3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
       ("ical", "ic"), ("ful", ""), ("ness", "")]
_S4 = ("ic", "ance", "ence", "able", "ible", "ate", "ive", "ize", "iti",
       "al", "ism", "ion", "er", "ous", "ant", "ent", "ment", "ement", "ou")

def snowball_porter_stem(w):
    # prelude: initial y -> Y; every y following a vowel -> Y
    y_found = False
    ch = list(w)
    if ch and ch[0] == "y":
        ch[0] = "Y"; y_found = True
    for j in range(1, len(ch)):
        if ch[j] == "y" and ch[j-1] in _PORTER_V:
            ch[j] = "Y"; y_found = True
    w = "".join(ch)
    p1 = _r_after(w, 0, _PORTER_V)
    p2 = _r_after(w, p1, _PORTER_V)

    # 1a
    m = _longest_suffix(w, [("s", 3), ("ies", 2), ("sses", 1), ("ss", 0)])
    if m:
        suf, act = m
        if act == 1: w = w[:-4] + "ss"
        elif act == 2: w = w[:-3] + "i"
        elif act == 3: w = w[:-1]
    # 1b
    m = _longest_suffix(w, [("ed", 2), ("eed", 1), ("ing", 2)])
    if m:
        suf, act = m
        if act == 1:
            if len(w) - 3 >= p1:
                w = w[:-3] + "ee"
        else:
            stem = w[:-len(suf)]
            if any(c in _PORTER_V for c in stem):
                w = stem
                if w.endswith(("bl", "at", "iz")):
                    w += "e"
                elif (len(w) >= 2 and w[-1] == w[-2]
                      and w[-2:] in ("bb", "dd", "ff", "gg", "mm", "nn",
                                     "pp", "rr", "tt")):
                    w = w[:-1]
                elif len(w) == p1 and _sb_shortv(w):
                    w += "e"
    # 1c: y/Y at end with a vowel somewhere before -> i
    if w and w[-1] in "yY" and any(c in _PORTER_V for c in w[:-1]):
        w = w[:-1] + "i"
    # 2
    m = _longest_suffix(w, _S2)
    if m and len(w) - len(m[0]) >= p1:
        w = w[:-len(m[0])] + m[1]
    # 3
    m = _longest_suffix(w, _S3)
    if m and len(w) - len(m[0]) >= p1:
        w = w[:-len(m[0])] + m[1]
    # 4
    m = _longest_suffix(w, [(s, 1) for s in _S4])
    if m and len(w) - len(m[0]) >= p2:
        suf = m[0]
        if suf != "ion" or w[:-3].endswith(("s", "t")):
            w = w[:-len(suf)]
    # 5a
    if w.endswith("e"):
        if len(w) - 1 >= p2 or (len(w) - 1 >= p1 and not _sb_shortv(w[:-1])):
            w = w[:-1]
    # 5b
    if w.endswith("ll") and len(w) - 1 >= p2:
        w = w[:-1]
    if y_found:
        w = w.replace("Y", "y")
    return w


# ---------------------------------------------------------------------------
# Lovins — lovins.sbl / LovinsStemmer.java
# (294 endings with conditions A..CC vendored from the published 1968
#  algorithm, longest-match-with-fallback, undoubling, 34 respell rules)
# ---------------------------------------------------------------------------

_LOVINS_ENDINGS = [("s'", 'A'), ('a', 'A'), ('ia', 'A'), ('ata', 'A'), ('ic', 'A'), ('aic', 'A'), ('allic', 'BB'), ('aric', 'A'), ('atic', 'B'), ('itic', 'H'), ('antic', 'C'), ('istic', 'A'), ('alistic', 'B'), ('aristic', 'A'), ('ivistic', 'A'), ('ed', 'E'), ('anced', 'B'), ('enced', 'A'), ('ished', 'A'), ('ied', 'A'), ('ened', 'E'), ('ioned', 'A'), ('ated', 'I'), ('ented', 'C'), ('ized', 'F'), ('arized', 'A'), ('oid', 'A'), ('aroid', 'A'), ('hood', 'A'), ('ehood', 'A'), ('ihood', 'A'), ('elihood', 'E'), ('ward', 'A'), ('e', 'A'), ('ae', 'A'), ('ance', 'B'), ('icance', 'A'), ('ence', 'A'), ('ide', 'L'), ('icide', 'A'), ('otide', 'A'), ('age', 'B'), ('able', 'A'), ('atable', 'A'), ('izable', 'E'), ('arizable', 'A'), ('ible', 'A'), ('encible', 'A'), ('ene', 'E'), ('ine', 'M'), ('idine', 'I'), ('one', 'R'), ('ature', 'E'), ('eature', 'Z'), ('ese', 'A'), ('wise', 'A'), ('ate', 'A'), ('entiate', 'A'), ('inate', 'A'), ('ionate', 'D'), ('ite', 'AA'), ('ive', 'A'), ('ative', 'A'), ('ize', 'F'), ('alize', 'A'), ('icalize', 'A'), ('ialize', 'A'), ('entialize', 'A'), ('ionalize', 'A'), ('arize', 'A'), ('ing', 'N'), ('ancing', 'B'), ('encing', 'A'), ('aging', 'B'), ('ening', 'E'), ('ioning', 'A'), ('ating', 'I'), ('enting', 'C'), ('ying', 'B'), ('izing', 'F'), ('arizing', 'A'), ('ish', 'C'), ('yish', 'A'), ('i', 'A'), ('al', 'BB'), ('ical', 'A'), ('aical', 'A'), ('istical', 'A'), ('oidal', 'A'), ('eal', 'Y'), ('ial', 'A'), ('ancial', 'A'), ('arial', 'A'), ('ential', 'A'), ('ional', 'A'), ('ational', 'B'), ('izational', 'A'), ('ental', 'A'), ('ful', 'A'), ('eful', 'A'), ('iful', 'A'), ('yl', 'R'), ('ism', 'B'), ('icism', 'A'), ('oidism', 'A'), ('alism', 'B'), ('icalism', 'A'), ('ionalism', 'A'), ('inism', 'J'), ('ativism', 'A'), ('um', 'U'), ('ium', 'A'), ('ian', 'A'), ('ician', 'A'), ('en', 'F'), ('ogen', 'A'), ('on', 'S'), ('ion', 'Q'), ('ation', 'B'), ('ication', 'G'), ('entiation', 'A'), ('ination', 'A'), ('isation', 'A'), ('arisation', 'A'), ('entation', 'A'), ('ization', 'F'), ('arization', 'A'), ('action', 'G'), ('o', 'A'), ('ar', 'X'), ('ear', 'Y'), ('ier', 'A'), ('ariser', 'A'), ('izer', 'F'), ('arizer', 'A'), ('or', 'T'), ('ator', 'A'), ('s', 'W'), ("'s", 'A'), ('as', 'B'), ('ics', 'A'), ('istics', 'A'), ('es', 'E'), ('ances', 'B'), ('ences', 'A'), ('ides', 'L'), ('oides', 'A'), ('ages', 'B'), ('ies', 'P'), ('acies', 'A'), ('ancies', 'A'), ('encies', 'A'), ('aries', 'A'), ('ities', 'A'), ('alities', 'A'), ('ivities', 'A'), ('ines', 'M'), ('nesses', 'A'), ('ates', 'A'), ('atives', 'A'), ('ings', 'N'), ('is', 'A'), ('als', 'BB'), ('ials', 'A'), ('entials', 'A'), ('ionals', 'A'), ('isms', 'B'), ('ians', 'A'), ('icians', 'A'), ('ions', 'B'), ('ations', 'B'), ('arisations', 'A'), ('entations', 'A'), ('izations', 'A'), ('arizations', 'A'), ('ars', 'O'), ('iers', 'A'), ('izers', 'F'), ('ators', 'A'), ('less', 'A'), ('eless', 'A'), ('ness', 'A'), ('eness', 'E'), ('ableness', 'A'), ('eableness', 'E'), ('ibleness', 'A'), ('ateness', 'A'), ('iteness', 'A'), ('iveness', 'A'), ('ativeness', 'A'), ('ingness', 'A'), ('ishness', 'A'), ('iness', 'A'), ('ariness', 'E'), ('alness', 'A'), ('icalness', 'A'), ('antialness', 'A'), ('entialness', 'A'), ('ionalness', 'A'), ('fulness', 'A'), ('lessness', 'A'), ('ousness', 'A'), ('eousness', 'A'), ('iousness', 'A'), ('itousness', 'A'), ('entness', 'A'), ('ants', 'B'), ('ists', 'A'), ('icists', 'A'), ('us', 'V'), ('ous', 'A'), ('eous', 'A'), ('aceous', 'A'), ('antaneous', 'A'), ('ious', 'A'), ('acious', 'B'), ('itous', 'A'), ('ant', 'B'), ('icant', 'A'), ('ent', 'C'), ('ement', 'A'), ('izement', 'A'), ('ist', 'A'), ('icist', 'A'), ('alist', 'A'), ('icalist', 'A'), ('ialist', 'A'), ('ionist', 'A'), ('entist', 'A'), ('y', 'B'), ('acy', 'A'), ('ancy', 'B'), ('ency', 'A'), ('ly', 'B'), ('ealy', 'Y'), ('ably', 'A'), ('ibly', 'A'), ('edly', 'E'), ('iedly', 'A'), ('ely', 'E'), ('ately', 'A'), ('ively', 'A'), ('atively', 'A'), ('ingly', 'B'), ('atingly', 'A'), ('ily', 'A'), ('lily', 'A'), ('arily', 'A'), ('ally', 'B'), ('ically', 'A'), ('aically', 'A'), ('allically', 'C'), ('istically', 'A'), ('alistically', 'B'), ('oidally', 'A'), ('ially', 'A'), ('entially', 'A'), ('ionally', 'A'), ('ationally', 'B'), ('izationally', 'B'), ('entally', 'A'), ('fully', 'A'), ('efully', 'A'), ('ifully', 'A'), ('enly', 'E'), ('arly', 'K'), ('early', 'Y'), ('lessly', 'A'), ('ously', 'A'), ('eously', 'A'), ('iously', 'A'), ('ently', 'A'), ('ary', 'F'), ('ery', 'E'), ('icianry', 'A'), ('atory', 'A'), ('ity', 'A'), ('acity', 'A'), ('icity', 'A'), ('eity', 'A'), ('ality', 'A'), ('icality', 'A'), ('iality', 'A'), ('antiality', 'A'), ('entiality', 'A'), ('ionality', 'A'), ('elity', 'A'), ('ability', 'A'), ('izability', 'A'), ('arizability', 'A'), ('ibility', 'A'), ('inity', 'CC'), ('arity', 'B'), ('ivity', 'A')]
_LOVINS_RESPELL = [('uad', 18), ('vad', 19), ('cid', 20), ('lid', 21), ('erid', 22), ('pand', 23), ('end', 24), ('ond', 25), ('lud', 26), ('rud', 27), ('ul', 9), ('her', 28), ('metr', 7), ('istr', 6), ('urs', 5), ('uct', 2), ('et', 32), ('mit', 29), ('ent', 30), ('umpt', 3), ('rpt', 4), ('ert', 31), ('yt', 33), ('iev', 1), ('olv', 8), ('ax', 14), ('ex', 15), ('bex', 10), ('dex', 11), ('pex', 12), ('tex', 13), ('ix', 16), ('lux', 17), ('yz', 33)]

def _c_A(s): return len(s) >= 2
def _c_B(s): return len(s) >= 3
def _c_C(s): return len(s) >= 4
def _c_D(s): return len(s) >= 5
def _c_E(s): return len(s) >= 2 and not s.endswith("e")
def _c_F(s): return len(s) >= 3 and not s.endswith("e")
def _c_G(s): return len(s) >= 3 and s.endswith("f")
def _c_H(s): return len(s) >= 2 and (s.endswith("t") or s.endswith("ll"))
def _c_I(s): return len(s) >= 2 and s[-1] not in "oe"
def _c_J(s): return len(s) >= 2 and s[-1] not in "ae"
def _c_K(s): return len(s) >= 3 and (s[-1] in "li"
                                     or (s.endswith("e") and len(s) >= 3
                                         and s[-3] == "u"))
def _c_L(s):
    if len(s) < 2 or s[-1] in "ux":
        return False
    return not (s[-1] == "s" and not s[:-1].endswith("o"))
def _c_M(s): return len(s) >= 2 and s[-1] not in "acem"
def _c_N(s):
    if len(s) < 3: return False
    if s[-3] == "s": return len(s) >= 4
    return True
def _c_O(s): return len(s) >= 2 and s[-1] in "li"
def _c_P(s): return len(s) >= 2 and not s.endswith("c")
def _c_Q(s): return len(s) >= 3 and s[-1] not in "ln"
def _c_R(s): return len(s) >= 2 and s[-1] in "nr"
def _c_S(s): return len(s) >= 2 and (s.endswith("dr")
                                     or (s.endswith("t")
                                         and not s.endswith("tt")))
def _c_T(s): return len(s) >= 2 and (s.endswith("s")
                                     or (s.endswith("t")
                                         and not s.endswith("ot")))
def _c_U(s): return len(s) >= 2 and s[-1] in "lmnr"
def _c_V(s): return len(s) >= 2 and s.endswith("c")
def _c_W(s): return len(s) >= 2 and s[-1] not in "su"
def _c_X(s): return len(s) >= 2 and (s[-1] in "li"
                                     or (s.endswith("e") and len(s) >= 3
                                         and s[-3] == "u"))
def _c_Y(s): return len(s) >= 2 and s.endswith("in")
def _c_Z(s): return len(s) >= 2 and not s.endswith("f")
def _c_AA(s): return len(s) >= 2 and (
    s[-1] in "dflt" or s.endswith(("ph", "th", "er", "or", "es")))
def _c_BB(s): return (len(s) >= 3 and not s.endswith("met")
                      and not s.endswith("ryst"))
def _c_CC(s): return len(s) >= 2 and s.endswith("l")

_LOVINS_CONDS = {k[3:]: v for k, v in list(globals().items())
                 if k.startswith("_c_")}

_RESPELL_SUB = {
    1: "ief", 2: "uc", 3: "um", 4: "rb", 5: "ur", 6: "ister", 7: "meter",
    8: "olut", 9: "l", 10: "bic", 11: "dic", 12: "pic", 13: "tic",
    14: "ac", 15: "ec", 16: "ic", 17: "luc", 18: "uas", 19: "vas",
    20: "cis", 21: "lis", 22: "eris", 23: "pans", 24: "ens", 25: "ons",
    26: "lus", 27: "rus", 28: "hes", 29: "mis", 30: "ens", 31: "ers",
    32: "es", 33: "ys",
}
_RESPELL_GUARD = {9: "aio", 24: "s", 28: "pt", 30: "m", 32: "n"}

def snowball_lovins_stem(w):
    # endings: longest suffix whose condition passes (among fallback)
    cands = sorted((e for e in _LOVINS_ENDINGS if w.endswith(e[0])),
                   key=lambda e: -len(e[0]))
    for suf, cond in cands:
        stem = w[:-len(suf)]
        if _LOVINS_CONDS[cond](stem):
            w = stem
            break
    # undouble
    if len(w) >= 2 and w[-1] == w[-2] and w[-2:] in (
            "bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt"):
        w = w[:-1]
    # respell (longest match; guards are post-commit: failure = no change)
    best = None
    for suf, act in _LOVINS_RESPELL:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, act)
    if best:
        suf, act = best
        stem = w[:-len(suf)]
        guard = _RESPELL_GUARD.get(act)
        if not (guard and stem and stem[-1] in guard):
            w = stem + _RESPELL_SUB[act]
    return w


# ---------------------------------------------------------------------------
# Kraaij-Pohlmann — kp.sbl / KpStemmer.java (Dutch variant)
# (measure-based regions counting "ij" as one vowel unit, short-vowel
#  lengthening after suffix removal, ge- prefix/infix loss, final
#  devoicing undo v->f z->s, condition fallthrough within each among)
# ---------------------------------------------------------------------------

def _kp_longest(w, sufs):
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


_KP_V = "aeiouy"
_KP_VWX = "aeiouwxy"
_KP_AOU = "aou"
_KP_AIOU = "aiou"

def _kp_V(w, c):
    return (c >= 1 and w[c-1] in _KP_V) or w[:c].endswith("ij")

def _kp_VX(w, c):
    return c >= 1 and _kp_V(w, c - 1)

def _kp_C(w, c):
    return (not w[:c].endswith("ij")) and c >= 1 and w[c-1] not in _KP_V

def _kp_measure(w):
    n = len(w); i = 0; p1 = p2 = n
    while i < n and w[i] not in _KP_V: i += 1
    cnt = 0
    while i < n:
        if w.startswith("ij", i): i += 2; cnt += 1
        elif w[i] in _KP_V: i += 1; cnt += 1
        else: break
    if cnt and i < n and w[i] not in _KP_V:
        i += 1; p1 = i
        while i < n and w[i] not in _KP_V: i += 1
        cnt = 0
        while i < n:
            if w.startswith("ij", i): i += 2; cnt += 1
            elif w[i] in _KP_V: i += 1; cnt += 1
            else: break
        if cnt and i < n and w[i] not in _KP_V:
            p2 = i + 1
    return p1, p2

def _kp_lengthen(w):
    """Double the vowel before a final consonant (not w/x/y) when it is a
    short open syllable: a/o/u preceded by a non-vowel or at the start;
    or e likewise, unless the context shows it is not stressed."""
    n = len(w)
    if n < 2 or w[-1] in _KP_VWX:
        return w
    v = w[-2]
    if v in _KP_AOU:
        if n == 2 or w[-3] not in _KP_V:
            return w[:-1] + v + w[-1]
        return w
    if v == "e":
        if n > 2 and w[-3] in _KP_V:
            return w
        # after consuming the non-vowel before e (position n-3):
        if n >= 4 and w[-4] in _KP_AIOU:
            return w
        if n >= 6 and w[-5] in _KP_AIOU and w[-6] not in _KP_V:
            return w
        return w[:-1] + "e" + w[-1]
    return w

def _kp_step1(w, p1, p2):
    suf = _kp_longest(w, ("nde", "en", "s", "'s", "es", "ies", "aus"))
    if not suf:
        return w, False
    c = len(w) - len(suf)
    if suf == "'s":
        return w[:c], True
    if suf == "s":
        if c >= p1 and not (c >= 1 and w[c-1] == "t" and c - 1 >= p1) \
                and _kp_C(w, c):
            return w[:c], True
        return w, False
    if suf == "ies":
        if c >= p1:
            return w[:c] + "ie", True
        return w, False
    if suf == "es":
        s = w[:c]
        if s.endswith("ar") and c - 2 >= p1 and _kp_C(w, c - 2):
            return _kp_lengthen(w[:c-2]), True
        if s.endswith("er") and c - 2 >= p1 and _kp_C(w, c - 2):
            return w[:c-2], True
        if c >= p1 and _kp_C(w, c):
            return w[:c] + "e", True
        return w, False
    if suf == "aus":
        if c >= p1 and _kp_V(w, c):
            return w[:c] + "au", True
        return w, False
    if suf == "en":
        s = w[:c]
        if s.endswith("hed") and c - 3 >= p1:
            return w[:c-3] + "heid", True
        if s.endswith("nd"):
            return w[:c], True
        if s.endswith("d") and c - 1 >= p1 and _kp_C(w, c - 1):
            return w[:c-1], True
        if (s.endswith("i") or s.endswith("j")) and _kp_V(w, c - 1):
            return w[:c], True
        if c >= p1 and _kp_C(w, c):
            return _kp_lengthen(w[:c]), True
        return w, False
    # nde
    return w[:c] + "nd", True

def _kp_step2(w, p1, p2):
    suf = _kp_longest(w, ("de", "ge", "ische", "je", "lijke", "le", "ene",
                       "re", "se", "te", "ieve"))
    if not suf:
        return w, False
    c = len(w) - len(suf)
    R1 = c >= p1
    if suf == "je":
        s = w[:c]
        if s.endswith("'t"):
            return w[:c-2], True
        if s.endswith("et") and c - 2 >= p1 and _kp_C(w, c - 2):
            return w[:c-2], True
        if s.endswith("rnt"):
            return w[:c-3] + "rn", True
        if s.endswith("t") and c - 1 >= p1 and _kp_VX(w, c - 1):
            return w[:c-1], True
        if s.endswith("ink"):
            return w[:c-3] + "ing", True
        if s.endswith("mp"):
            return w[:c-2] + "m", True
        if s.endswith("'") and c - 1 >= p1:
            return w[:c-1], True
        if R1 and _kp_C(w, c):
            return w[:c], True
        return w, False
    if not R1:
        return w, False
    if suf == "ge":
        return w[:c] + "g", True
    if suf == "lijke":
        return w[:c] + "lijk", True
    if suf == "ische":
        return w[:c] + "isch", True
    if suf == "de":
        if _kp_C(w, c):
            return w[:c], True
        return w, False
    if suf == "te":
        return w[:c] + "t", True
    if suf == "se":
        return w[:c] + "s", True
    if suf == "re":
        return w[:c] + "r", True
    if suf == "le":
        return _kp_lengthen(w[:c] + "l"), True
    if suf == "ene":
        if _kp_C(w, c):
            return _kp_lengthen(w[:c] + "en"), True
        return w, False
    # ieve
    if _kp_C(w, c):
        return w[:c] + "ief", True
    return w, False

def _kp_step3(w, p1, p2):
    suf = _kp_longest(w, ("heid", "fie", "gie", "atie", "isme", "ing", "arij",
                       "erij", "sel", "rder", "ster", "iteit", "dst", "tst"))
    if not suf:
        return w, False
    c = len(w) - len(suf)
    if suf == "rder":
        return w[:c] + "r", True
    if suf in ("fie", "gie"):
        if c >= p2:
            return _kp_lengthen(w[:c] + suf[0]), True
        return w, False
    if c < p1:
        return w, False
    if suf == "atie":
        return w[:c] + "eer", True
    if suf in ("isme", "ing", "erij", "iteit"):
        return _kp_lengthen(w[:c]), True
    if suf in ("heid", "sel", "ster"):
        return w[:c], True
    if suf == "arij":
        if _kp_C(w, c):
            return w[:c] + "aar", True
        return w, False
    if suf == "dst":
        if _kp_C(w, c):
            return w[:c] + "d", True
        return w, False
    # tst
    if _kp_C(w, c):
        return w[:c] + "t", True
    return w, False

def _kp_step4(w, p1, p2):
    suf = _kp_longest(w, ("end", "atief", "erig", "achtig", "ioneel", "baar",
                       "laar", "naar", "raar", "eriger", "achtiger",
                       "lijker", "tant", "erigst", "achtigst", "lijkst"))
    if suf:
        c = len(w) - len(suf)
        if c >= p1:
            if suf == "ioneel":
                return w[:c] + "ie", True
            if suf == "atief":
                return w[:c] + "eer", True
            if suf in ("achtig", "baar", "achtiger", "achtigst"):
                return w[:c], True
            if suf == "naar":
                if _kp_V(w, c):
                    return w[:c] + "n", True
            elif suf == "laar":
                if _kp_V(w, c):
                    return w[:c] + "l", True
            elif suf == "raar":
                if _kp_V(w, c):
                    return w[:c] + "r", True
            elif suf == "tant":
                return w[:c] + "teer", True
            elif suf in ("lijker", "lijkst"):
                return w[:c] + "lijk", True
            elif suf in ("end", "erig", "eriger", "erigst"):
                if _kp_C(w, c):
                    return _kp_lengthen(w[:c]), True
    suf = _kp_longest(w, ("ig", "iger", "igst"))
    if suf:
        c = len(w) - len(suf)
        if c >= p1 and _kp_C(w, c):
            return _kp_lengthen(w[:c]), True
    return w, False

def _kp_step7(w):
    if w.endswith("kt"): return w[:-2] + "k", True
    if w.endswith("ft"): return w[:-2] + "f", True
    if w.endswith("pt"): return w[:-2] + "p", True
    return w, False

_KP_DOUBLES = ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll", "mm",
               "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww", "xx", "zz")

def _kp_step6(w):
    if len(w) >= 2 and w[-2:] in _KP_DOUBLES:
        return w[:-1], True
    if w.endswith("v"):
        return w[:-1] + "f", True
    if w.endswith("z"):
        return w[:-1] + "s", True
    return w, False

def _kp_step1c(w, p1):
    if w.endswith("d") and len(w) - 1 >= p1 and _kp_C(w, len(w) - 1):
        c = len(w) - 1
        if not (c >= 1 and w[c-1] == "n" and c - 1 >= p1):
            return w[:c]
    elif w.endswith("t") and len(w) - 1 >= p1 and _kp_C(w, len(w) - 1):
        c = len(w) - 1
        if not (c >= 1 and w[c-1] == "h" and c - 1 >= p1):
            return w[:c]
    return w

def _kp_lose_prefix(w):
    if not w.startswith("ge") or len(w) < 5:
        return w, False
    rest = w[2:]
    i = 0
    while i < len(rest) and rest[i] not in _KP_V: i += 1
    if i >= len(rest):
        return w, False
    j = i
    while j < len(rest) and rest[j] in _KP_V: j += 1
    if j >= len(rest):
        return w, False
    return rest, True

def _kp_lose_infix(w):
    k = w.find("ge", 1)
    if k < 0:
        return w, False
    end = k + 2
    if end + 3 > len(w):
        return w, False
    rest = w[end:]
    i = 0
    while i < len(rest) and rest[i] not in _KP_V: i += 1
    if i >= len(rest):
        return w, False
    j = i
    while j < len(rest) and rest[j] in _KP_V: j += 1
    if j >= len(rest):
        return w, False
    return w[:k] + w[end:], True

def snowball_kp_stem(w):
    y_found = False
    ch = list(w)
    if ch and ch[0] == "y":
        ch[0] = "Y"; y_found = True
    for j in range(1, len(ch)):
        if ch[j] == "y" and ch[j-1] in _KP_V:
            ch[j] = "Y"; y_found = True
    w = "".join(ch)
    p1, p2 = _kp_measure(w)
    stemmed = False
    for step in (_kp_step1, _kp_step2, _kp_step3, _kp_step4):
        w, did = step(w, p1, p2)
        stemmed = stemmed or did
    w2, ge_removed = _kp_lose_prefix(w)
    if ge_removed:
        w = w2
        p1, p2 = _kp_measure(w)
        w = _kp_step1c(w, p1)
    w2, ge2 = _kp_lose_infix(w)
    if ge2:
        w = w2
        p1, p2 = _kp_measure(w)
        w = _kp_step1c(w, p1)
    w, did7 = _kp_step7(w)
    stemmed = stemmed or did7
    if stemmed or ge_removed or ge2:
        w, _ = _kp_step6(w)
    if y_found:
        w = w.replace("Y", "y")
    return w



SNOWBALL_STEMMERS = {
    "snowball_english_stem": snowball_english_stem,
    "snowball_german_stem": snowball_german_stem,
    "snowball_german2_stem": snowball_german2_stem,
    "snowball_french_stem": snowball_french_stem,
    "snowball_spanish_stem": snowball_spanish_stem,
    "snowball_italian_stem": snowball_italian_stem,
    "snowball_portuguese_stem": snowball_portuguese_stem,
    "snowball_danish_stem": snowball_danish_stem,
    "snowball_norwegian_stem": snowball_norwegian_stem,
    "snowball_swedish_stem": snowball_swedish_stem,
    "snowball_russian_stem": snowball_russian_stem,
    "snowball_dutch_stem": snowball_dutch_stem,
    "snowball_romanian_stem": snowball_romanian_stem,
    "snowball_irish_stem": snowball_irish_stem,
    "snowball_hungarian_stem": snowball_hungarian_stem,
    "snowball_finnish_stem": snowball_finnish_stem,
    "snowball_nepali_stem": snowball_nepali_stem,
    "snowball_turkish_stem": snowball_turkish_stem,
    "snowball_porter_stem": snowball_porter_stem,
    "snowball_lovins_stem": snowball_lovins_stem,
    "snowball_kp_stem": snowball_kp_stem,
}
