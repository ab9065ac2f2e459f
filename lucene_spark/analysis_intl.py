"""Arabic / Persian / Hindi normalizers + light stemmers.

Extends the language zoo (`analysis_lang.py` light stemmers,
`analysis_snowball.py` snowball family, `analysis_cjk.py` CJK bigrams)
with the reference's right-to-left + Indic packages, re-expressed as
the str->str token filters the `filters` analyzer-chain seam consumes
(`analysis._TOKEN_FILTERS`; applied once per unique batch token):

- ``arabic_normalize`` — analysis/common/.../ar/ArabicNormalizer.java:37-98:
  hamza-seated alefs -> bare alef, teh marbuta -> heh, dotless yeh
  (alef maksura) -> yeh, removal of tatweel + the eight harakat.
- ``arabic_stem``      — ar/ArabicStemmer.java:35-160 (Larkey light10):
  one definite-article/conjunction prefix (waw needs >=4 chars, the
  rest >=2 chars of remainder), then every matching plural/possessive
  suffix in table order, each needing >=2 chars of remainder.
- ``persian_normalize`` — fa/PersianNormalizer.java:30-85: farsi yeh /
  yeh barree -> arabic yeh, keheh -> kaf, heh+yeh / heh goal -> heh,
  hamza-above removed. PersianAnalyzer chains the ARABIC normalizer
  first (fa/PersianAnalyzer.java), i.e. use
  ``["arabic_normalize", "persian_normalize"]``.
- ``hindi_normalize``  — hi/HindiNormalizer.java:39-172 (Pingali/Varma
  + Larkey CLIR additions): candrabindu -> bindu, dead-n (NA+virama)
  -> anusvara, nukta forms folded, zwj/zwnj/virama removed,
  chandra vowels and long vowels shortened (independent + dependent).
- ``hindi_stem``       — hi/HindiStemmer.java:29-121 (Ramanathan/Rao
  lightweight stemmer): longest of the 5/4/3/2/1-akshara suffix lists,
  removed once, guarded by len > suffix_len + 1.

All code points are BMP, so Python ``len(str)`` equals the reference's
UTF-16 term-buffer lengths and the length guards transfer verbatim.
Verified against the reference's own filter test vectors
(tests/test_intl_analysis.py).
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Arabic (ar/ArabicNormalizer.java, ar/ArabicStemmer.java)
# ---------------------------------------------------------------------------

_AR_NORM = str.maketrans({
    "آ": "ا",  # alef madda -> alef
    "أ": "ا",  # alef hamza above -> alef
    "إ": "ا",  # alef hamza below -> alef
    "ى": "ي",  # dotless yeh -> yeh
    "ة": "ه",  # teh marbuta -> heh
    "ـ": None,      # tatweel
    "ً": None,      # fathatan
    "ٌ": None,      # dammatan
    "ٍ": None,      # kasratan
    "َ": None,      # fatha
    "ُ": None,      # damma
    "ِ": None,      # kasra
    "ّ": None,      # shadda
    "ْ": None,      # sukun
})


def arabic_normalize(w: str) -> str:
    return w.translate(_AR_NORM)


# table order matters: first matching prefix wins; suffixes apply in
# order, each at most once (ArabicStemmer.java:100-118)
_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_stem(w: str) -> str:
    for p in _AR_PREFIXES:
        # waw alone needs a >=4-char word; longer prefixes need >=2
        # chars of remainder (startsWithCheckLength)
        if len(p) == 1:
            if len(w) < 4:
                continue
        elif len(w) < len(p) + 2:
            continue
        if w.startswith(p):
            w = w[len(p):]
            break
    for s in _AR_SUFFIXES:
        if len(w) >= len(s) + 2 and w.endswith(s):
            w = w[: -len(s)]
    return w


# ---------------------------------------------------------------------------
# Persian (fa/PersianNormalizer.java)
# ---------------------------------------------------------------------------

_FA_NORM = str.maketrans({
    "ی": "ي",  # farsi yeh -> yeh
    "ے": "ي",  # yeh barree -> yeh
    "ک": "ك",  # keheh -> kaf
    "ۀ": "ه",  # heh+yeh -> heh
    "ہ": "ه",  # heh goal -> heh
    "ٔ": None,      # hamza above (necessary for HEH + HAMZA)
})


def persian_normalize(w: str) -> str:
    return w.translate(_FA_NORM)


# ---------------------------------------------------------------------------
# Hindi (hi/HindiNormalizer.java, hi/HindiStemmer.java)
# ---------------------------------------------------------------------------

# dead n (NA + virama) -> anusvara, applied before the table so the
# virama survives into this rule (HindiNormalizer.java:39-44)
_HI_DEAD_N = re.compile("न्")

_HI_NORM = str.maketrans({
    "ँ": "ं",  # candrabindu -> bindu
    "़": None,      # nukta
    "ऩ": "न",  # nnna -> na
    "ऱ": "र",  # rra -> ra
    "ऴ": "ळ",  # llla -> lla
    "क़": "क",  # qa -> ka
    "ख़": "ख",  # khha -> kha
    "ग़": "ग",  # ghha -> ga
    "ज़": "ज",  # za -> ja
    "ड़": "ड",  # dddha -> dda
    "ढ़": "ढ",  # rha -> ddha
    "फ़": "फ",  # fa -> pha
    "य़": "य",  # yya -> ya
    "‍": None,      # zwj
    "‌": None,      # zwnj
    "्": None,      # virama
    "ॅ": "े",  # candra e -> e
    "ॆ": "े",  # short e -> e
    "ॉ": "ो",  # candra o -> o
    "ॊ": "ो",  # short o -> o
    "ऍ": "ए",  # candra E -> E
    "ऎ": "ए",  # short E -> E
    "ऑ": "ओ",  # candra O -> O
    "ऒ": "ओ",  # short O -> O
    "ॲ": "अ",  # candra A -> A
    "आ": "अ",  # AA -> A
    "ई": "इ",  # II -> I
    "ऊ": "उ",  # UU -> U
    "ॠ": "ऋ",  # vocalic RR -> R
    "ॡ": "ऌ",  # vocalic LL -> L
    "ऐ": "ए",  # AI -> E
    "औ": "ओ",  # AU -> O
    "ी": "ि",  # ii -> i
    "ू": "ु",  # uu -> u
    "ॄ": "ृ",  # vocalic rr -> r
    "ॣ": "ॢ",  # vocalic ll -> l
    "ै": "े",  # ai -> e
    "ौ": "ो",  # au -> o
})


def hindi_normalize(w: str) -> str:
    return _HI_DEAD_N.sub("ं", w).translate(_HI_NORM)


# suffix tiers, longest first; one removal total, guarded len > n+1
# (HindiStemmer.java:29-121, Ramanathan/Rao)
_HI_SUFFIXES = (
    ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां"),
    ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
     "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
     "ियों", "ियां"),
    ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
     "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
     "ुआं"),
    ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
     "ता", "ाँ", "ां", "ों", "ें"),
    ("ो", "े", "ू", "ु", "ी", "ि", "ा"),
)


def hindi_stem(w: str) -> str:
    for tier in _HI_SUFFIXES:
        n = len(tier[0])
        if len(w) > n + 1:
            for s in tier:
                if w.endswith(s):
                    return w[:-n]
    return w


# ---------------------------------------------------------------------------
# Sorani Kurdish (ckb/SoraniNormalizer.java, ckb/SoraniStemmer.java)
# ---------------------------------------------------------------------------

_CKB_DELETE = set("ـًٌٍَُِّْ")


def sorani_normalize(w: str) -> str:
    """SoraniNormalizer.java:37-125 — a left-to-right in-place scan
    (deletions shift the remainder, so a reh exposed at position 0 by a
    deleted format char still gets the rreh rewrite, and word-final heh
    is judged against the CURRENT end)."""
    import unicodedata

    s = list(w)
    i, ln = 0, len(s)
    while i < ln:
        c = s[i]
        if c in ("ي", "ى"):   # yeh / dotless yeh -> farsi yeh
            s[i] = "ی"
        elif c == "ك":              # kaf -> keheh
            s[i] = "ک"
        elif c == "‌":              # zwnj; heh+zwnj -> ae
            if i > 0 and s[i - 1] == "ه":
                s[i - 1] = "ە"
            del s[i]
            ln -= 1
            continue
        elif c == "ه":              # word-final heh -> ae
            if i == ln - 1:
                s[i] = "ە"
        elif c == "ة":              # teh marbuta -> ae
            s[i] = "ە"
        elif c == "ھ":              # heh doachashmee -> heh
            s[i] = "ه"
        elif c == "ر":              # word-initial reh -> rreh
            if i == 0:
                s[i] = "ڕ"
        elif c == "ڒ":              # reh small v above -> rreh
            s[i] = "ڕ"
        elif c in _CKB_DELETE or unicodedata.category(c) == "Cf":
            del s[i]
            ln -= 1
            continue
        i += 1
    return "".join(s)


def sorani_stem(w: str) -> str:
    """SoraniStemmer.java:31-100 — postposition, then possessive
    pronoun, then ONE of the ezafe/definite/indefinite/demonstrative
    suffixes (first match in the reference's if/else chain returns)."""
    n = len(w)
    # postposition
    if n > 5 and w.endswith("دا"):
        w = w[:-2]
    elif n > 4 and w.endswith("نا"):
        w = w[:-1]
    elif n > 6 and w.endswith("ەوە"):
        w = w[:-3]
    n = len(w)
    # possessive pronoun
    if n > 6 and (w.endswith("مان") or w.endswith("یان")
                  or w.endswith("تان")):
        w = w[:-3]
    n = len(w)
    for suf, guard in (
        ("ێکی", 6), ("یەکی", 7),     # indefinite singular ezafe
        ("ێک", 5), ("یەک", 6),       # indefinite singular
        ("ەکە", 6), ("کە", 5),       # definite singular
        ("ەکان", 7), ("کان", 6),     # definite plural
        ("یانی", 7), ("انی", 6),     # indefinite plural ezafe
        ("یان", 6), ("ان", 5),       # indefinite plural
        ("یانە", 7), ("انە", 6),     # demonstrative plural
    ):
        if n > guard and w.endswith(suf):
            return w[: -len(suf)]
    # demonstrative singular (-2 despite the 3-char match, the
    # reference keeps the leading vowel), absolute singular ezafe
    if n > 5 and (w.endswith("ایە") or w.endswith("ەیە")):
        return w[:-2]
    if n > 4 and w.endswith("ە"):
        return w[:-1]
    if n > 4 and w.endswith("ی"):
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Czech (cz/CzechStemmer.java — Dolamic/Savoy light stemmer; input
# lowercase WITH diacritics)
# ---------------------------------------------------------------------------

_CZ_CASE = (
    (7, ("atech",)),
    (6, ("ětem", "etem", "atům")),
    (5, ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
         "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
         "aty", "ých", "ama", "ami", "ové", "ovi", "ými")),
    (4, ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
         "mi", "ou")),
)


def czech_stem(w: str) -> str:
    # removeCase
    done = False
    for guard, sufs in _CZ_CASE:
        if len(w) > guard:
            for s in sufs:
                if w.endswith(s):
                    w = w[: -len(s)]
                    done = True
                    break
        if done:
            break
    else:
        if len(w) > 3 and w[-1] in "aeiouůyáéíýě":
            w = w[:-1]
    # removePossessives
    if len(w) > 5 and (w.endswith("ov") or w.endswith("in")
                       or w.endswith("ův")):
        w = w[:-2]
    # normalize (palatalization)
    if not w:
        return w
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


# ---------------------------------------------------------------------------
# Bulgarian (bg/BulgarianStemmer.java — Savoy BUIR light stemmer)
# ---------------------------------------------------------------------------


def _bg_article(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("ият"):
        return w[:-3]
    if n > 5 and w[-2:] in ("ът", "то", "те", "та", "ия"):
        return w[:-2]
    if n > 4 and w.endswith("ят"):
        return w[:-2]
    return w


def _bg_plural(w: str) -> str:
    n = len(w)
    if n > 6:
        if w.endswith("овци"):
            return w[:-3]
        if w.endswith("ове"):
            return w[:-3]
        if w.endswith("еве"):
            return w[:-3] + "й"
    if n > 5:
        if w.endswith("ища"):
            return w[:-3]
        if w.endswith("та"):
            return w[:-2]
        if w.endswith("ци"):
            return w[:-2] + "к"
        if w.endswith("зи"):
            return w[:-2] + "г"
        if w[-3] == "е" and w[-1] == "и":
            return w[:-3] + "я" + w[-2]
    if n > 4:
        if w.endswith("си"):
            return w[:-2] + "х"
        if w.endswith("и"):
            return w[:-1]
    return w


def bulgarian_stem(w: str) -> str:
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    w = _bg_article(w)
    w = _bg_plural(w)
    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w and w[-1] in "аое":
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w




# ---------------------------------------------------------------------------
# Bengali (bn/BengaliNormalizer.java, bn/BengaliStemmer.java)
# ---------------------------------------------------------------------------


def bengali_normalize(w: str) -> str:
    """BengaliNormalizer.java:29-152 (UzZaman/Khan double-metaphone
    folding): chandrabindu deletion, long->short kars, khio and
    ja/ba-phala cluster rewrites with the reference's exact in-place
    index arithmetic, visarga tripling/deletion, sh/na/ra folds."""
    s = list(w)
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\u0981":            # chandrabindu: delete
            del s[i]
            n -= 1
            continue
        elif c == "\u09c0":          # dirgho i kar -> rossho i kar
            s[i] = "\u09bf"
        elif c == "\u09c2":          # dirgho u kar -> rossho u kar
            s[i] = "\u09c1"
        elif c == "\u0995":          # khio cluster
            if i + 2 < n and s[i + 1] == "\u09cd" and s[i + 2] == "\u09bf":
                if i == 0:
                    s[i] = "\u0996"
                    del s[i + 2]
                    del s[i + 1]
                    n -= 2
                else:
                    s[i + 1] = "\u0996"
                    del s[i + 2]
                    n -= 1
        elif c == "\u0999":          # nga -> anusvara
            s[i] = "\u0982"
        elif c == "\u09af":          # ja phala
            if i - 2 == 0 and s[i - 1] == "\u09cd":
                s[i - 1] = "\u09c7"
                if i + 1 < n and s[i + 1] == "\u09be":
                    del s[i + 1]
                    n -= 1
                del s[i]
                n -= 1
                continue              # java i--; i++ -> same index
            elif i - 1 >= 0 and s[i - 1] == "\u09cd":
                del s[i]
                del s[i - 1]
                n -= 2
                i -= 1                # java i -= 2; i++ -> i - 1
                continue
        elif c == "\u09ac":          # ba phala
            if i == 0 or s[i - 1] != "\u09cd":
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                n -= 2
                i -= 1
                continue
            elif i - 5 >= 0 and s[i - 3] == "\u09cd":
                del s[i]
                del s[i - 1]
                n -= 2
                i -= 1
                continue
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                n -= 1
                continue              # java i--; i++ -> same index
        elif c == "\u0983":          # visarga
            if i == n - 1:
                if n <= 3:
                    s[i] = "\u09b9"
                else:
                    del s[i]
                    n -= 1
                    continue
            else:
                s[i] = s[i + 1]
        elif c in ("\u09b6", "\u09b7"):  # sh forms -> sa
            s[i] = "\u09b8"
        elif c == "\u09a3":          # murdhanya na -> dantya na
            s[i] = "\u09a8"
        elif c in ("\u09dc", "\u09dd"):  # rra forms -> ra
            s[i] = "\u09b0"
        elif c == "\u09ce":          # khanda ta -> ta
            s[i] = "\u09a4"
        i += 1
    return "".join(s)


# verb-inflection suffix tiers, longest first, one removal
# (BengaliStemmer.java:31-127, Sengupta/Chaudhuri + Savoy criteria)
_BN_SUFFIXES = (
    (9,
     ("\u09bf\u09df\u09be\u099b\u09bf\u09b2\u09be\u09ae", "\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09be\u09ae", "\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09c7\u09a8", "\u0987\u09a4\u09c7\u099b\u09bf\u09b2\u09c7\u09a8", "\u09bf\u09df\u09be\u099b\u09bf\u09b2\u09c7\u09a8", "\u0987\u09df\u09be\u099b\u09bf\u09b2\u09c7\u09a8")),
    (8,
     ("\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09bf", "\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09c7", "\u09bf\u09df\u09be\u099b\u09bf\u09b2\u09be", "\u09bf\u09df\u09be\u099b\u09bf\u09b2\u09c7", "\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09be", "\u09bf\u09df\u09be\u099b\u09bf\u09b2\u09bf", "\u09df\u09c7\u09a6\u09c7\u09b0\u0995\u09c7")),
    (7,
     ("\u09bf\u09a4\u09c7\u099b\u09bf\u09b8", "\u09bf\u09a4\u09c7\u099b\u09c7\u09a8", "\u09bf\u09df\u09be\u099b\u09bf\u09b8", "\u09bf\u09df\u09be\u099b\u09c7\u09a8", "\u09c7\u099b\u09bf\u09b2\u09be\u09ae", "\u09c7\u099b\u09bf\u09b2\u09c7\u09a8", "\u09c7\u09a6\u09c7\u09b0\u0995\u09c7")),
    (6,
     ("\u09bf\u09a4\u09c7\u099b\u09bf", "\u09bf\u09a4\u09c7\u099b\u09be", "\u09bf\u09a4\u09c7\u099b\u09c7", "\u099b\u09bf\u09b2\u09be\u09ae", "\u099b\u09bf\u09b2\u09c7\u09a8", "\u09bf\u09df\u09be\u099b\u09bf", "\u09bf\u09df\u09be\u099b\u09be", "\u09bf\u09df\u09be\u099b\u09c7", "\u09c7\u099b\u09bf\u09b2\u09c7", "\u09c7\u099b\u09bf\u09b2\u09be", "\u09df\u09c7\u09a6\u09c7\u09b0", "\u09a6\u09c7\u09b0\u0995\u09c7")),
    (5,
     ("\u09bf\u09b2\u09be\u09ae", "\u09bf\u09b2\u09c7\u09a8", "\u09bf\u09a4\u09be\u09ae", "\u09bf\u09a4\u09c7\u09a8", "\u09bf\u09ac\u09c7\u09a8", "\u099b\u09bf\u09b2\u09bf", "\u099b\u09bf\u09b2\u09c7", "\u099b\u09bf\u09b2\u09be", "\u09a4\u09c7\u099b\u09c7", "\u09bf\u09a4\u09c7\u099b", "\u0996\u09be\u09a8\u09be", "\u0996\u09be\u09a8\u09bf", "\u0997\u09c1\u09b2\u09cb", "\u0997\u09c1\u09b2\u09bf", "\u09df\u09c7\u09b0\u09be", "\u09c7\u09a6\u09c7\u09b0")),
    (4,
     ("\u09b2\u09be\u09ae", "\u09bf\u09b2\u09bf", "\u0987\u09b2\u09bf", "\u09bf\u09b2\u09c7", "\u0987\u09b2\u09c7", "\u09b2\u09c7\u09a8", "\u09bf\u09b2\u09be", "\u0987\u09b2\u09be", "\u09a4\u09be\u09ae", "\u09bf\u09a4\u09bf", "\u0987\u09a4\u09bf", "\u09bf\u09a4\u09c7", "\u0987\u09a4\u09c7", "\u09a4\u09c7\u09a8", "\u09bf\u09a4\u09be", "\u09bf\u09ac\u09be", "\u0987\u09ac\u09be", "\u09bf\u09ac\u09bf", "\u0987\u09ac\u09bf", "\u09ac\u09c7\u09a8", "\u09bf\u09ac\u09c7", "\u0987\u09ac\u09c7", "\u099b\u09c7\u09a8", "\u09df\u09cb\u09a8", "\u09df\u09c7\u09b0", "\u09c7\u09b0\u09be", "\u09a6\u09c7\u09b0")),
    (3,
     ("\u09bf\u09b8", "\u09c7\u09a8", "\u09b2\u09bf", "\u09b2\u09c7", "\u09b2\u09be", "\u09a4\u09bf", "\u09a4\u09c7", "\u09a4\u09be", "\u09ac\u09bf", "\u09ac\u09c7", "\u09ac\u09be", "\u099b\u09bf", "\u099b\u09be", "\u099b\u09c7", "\u09c1\u09a8", "\u09c1\u0995", "\u099f\u09be", "\u099f\u09bf", "\u09a8\u09bf", "\u09c7\u09b0", "\u09a4\u09c7", "\u09b0\u09be", "\u0995\u09c7")),
    (2,
     ("\u09bf", "\u09c0", "\u09be", "\u09cb", "\u09c7", "\u09ac", "\u09a4")),
)


def bengali_stem(w: str) -> str:
    for guard, tier in _BN_SUFFIXES:
        if len(w) > guard:
            for s in tier:
                if w.endswith(s):
                    return w[: -len(s)]
    return w




# ---------------------------------------------------------------------------
# Indonesian (id/IndonesianStemmer.java — Tala 2003)
# ---------------------------------------------------------------------------

_ID_KE, _ID_PENG, _ID_DI, _ID_MENG, _ID_TER, _ID_BER, _ID_PE = (
    1, 2, 4, 8, 16, 32, 64)


def indonesian_stem(w: str, derivational: bool = True) -> str:
    """IndonesianStemmer.java:45-267 (Tala): inflectional particles +
    possessive pronouns, then derivational first-order prefix ->
    suffix -> second-order prefix with the reference's rule-fired
    control flow, syllable (=vowel) budget, and prefix/suffix
    disallowed-combination flags (e.g. peng- blocks -kan)."""
    syl = sum(1 for c in w if c in "aeiou")
    flags = 0

    def vowel(c: str) -> bool:
        return c in "aeiou"

    if syl > 2 and (w.endswith("kah") or w.endswith("lah")
                    or w.endswith("pun")):
        syl -= 1
        w = w[:-3]
    if syl > 2:
        if w.endswith("ku") or w.endswith("mu"):
            syl -= 1
            w = w[:-2]
        elif w.endswith("nya"):
            syl -= 1
            w = w[:-3]
    if not derivational:
        return w

    def first_order(w: str) -> str:
        nonlocal syl, flags
        if w.startswith("meng"):
            flags |= _ID_MENG; syl -= 1; return w[4:]
        if w.startswith("meny") and len(w) > 4 and vowel(w[4]):
            flags |= _ID_MENG; syl -= 1; return "s" + w[4:]
        if w.startswith("men"):
            flags |= _ID_MENG; syl -= 1; return w[3:]
        if w.startswith("mem"):
            flags |= _ID_MENG; syl -= 1; return w[3:]
        if w.startswith("me"):
            flags |= _ID_MENG; syl -= 1; return w[2:]
        if w.startswith("peng"):
            flags |= _ID_PENG; syl -= 1; return w[4:]
        if w.startswith("peny") and len(w) > 4 and vowel(w[4]):
            flags |= _ID_PENG; syl -= 1; return "s" + w[4:]
        if w.startswith("peny"):
            flags |= _ID_PENG; syl -= 1; return w[4:]
        if w.startswith("pen") and len(w) > 3 and vowel(w[3]):
            flags |= _ID_PENG; syl -= 1; return "t" + w[3:]
        if w.startswith("pen"):
            flags |= _ID_PENG; syl -= 1; return w[3:]
        if w.startswith("pem"):
            flags |= _ID_PENG; syl -= 1; return w[3:]
        if w.startswith("di"):
            flags |= _ID_DI; syl -= 1; return w[2:]
        if w.startswith("ter"):
            flags |= _ID_TER; syl -= 1; return w[3:]
        if w.startswith("ke"):
            flags |= _ID_KE; syl -= 1; return w[2:]
        return w

    def second_order(w: str) -> str:
        nonlocal syl, flags
        if w.startswith("ber"):
            flags |= _ID_BER; syl -= 1; return w[3:]
        if w == "belajar":
            flags |= _ID_BER; syl -= 1; return w[3:]
        if (w.startswith("be") and len(w) > 4 and not vowel(w[2])
                and w[3] == "e" and w[4] == "r"):
            flags |= _ID_BER; syl -= 1; return w[2:]
        if w.startswith("per"):
            syl -= 1; return w[3:]
        if w == "pelajar":
            syl -= 1; return w[3:]
        if w.startswith("pe"):
            flags |= _ID_PE; syl -= 1; return w[2:]
        return w

    def suffix(w: str) -> str:
        nonlocal syl
        if (w.endswith("kan") and not flags & _ID_KE
                and not flags & _ID_PENG and not flags & _ID_PE):
            syl -= 1; return w[:-3]
        if (w.endswith("an") and not flags & _ID_DI
                and not flags & _ID_MENG and not flags & _ID_TER):
            syl -= 1; return w[:-2]
        if (w.endswith("i") and not w.endswith("si")
                and not flags & _ID_BER and not flags & _ID_KE
                and not flags & _ID_PENG):
            syl -= 1; return w[:-1]
        return w

    old = len(w)
    if syl > 2:
        w = first_order(w)
    if old != len(w):  # a rule fired
        old = len(w)
        if syl > 2:
            w = suffix(w)
        if old != len(w):  # a rule fired
            if syl > 2:
                w = second_order(w)
    else:
        if syl > 2:
            w = second_order(w)
        if syl > 2:
            w = suffix(w)
    return w




# ---------------------------------------------------------------------------
# Latvian (lv/LatvianStemmer.java — Kreslins light stemmer)
# ---------------------------------------------------------------------------

# (affix, vowel-count guard, fires palatalization) — order matters
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("aj\u0101m", 2, False), ("ajos", 2, False), ("aj\u0101s", 2, False),
    ("iem", 2, True), ("aj\u0101", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("\u0101m", 1, False),
    ("am", 1, False), ("\u0113m", 1, False), ("\u012bm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("\u0101s", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("\u012bs", 1, False),
    ("\u0113s", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True), ("e", 1, False),
    ("\u0101", 1, False), ("\u0113", 1, False), ("\u012b", 1, False),
    ("\u016b", 1, False), ("o", 1, False), ("s", 0, False),
    ("\u0161", 0, False),
)

_LV_VOWELS = set("aeiou\u0101\u012b\u0113\u016b")


def _lv_unpalatalize(stem: str, removed_first: str) -> str:
    """LatvianStemmer.unpalatalize — the declension II/V/VI inverse
    palatalization; the -u affix enables the genitive-plural-only
    k\u0161->kst and \u0146\u0146->nn rules."""
    if removed_first == "u":
        if stem.endswith("k\u0161"):
            return stem[:-2] + "kst"
        if stem.endswith("\u0146\u0146"):
            return stem[:-2] + "nn"
    if stem[-2:] in ("pj", "bj", "mj", "vj"):
        return stem[:-1]
    two = {"\u0161\u0146": "sn", "\u017e\u0146": "zn",
           "\u0161\u013c": "sl", "\u017e\u013c": "zl",
           "\u013c\u0146": "ln", "\u013c\u013c": "ll"}
    if stem[-2:] in two:
        return stem[:-2] + two[stem[-2:]]
    one = {"\u010d": "c", "\u013c": "l", "\u0146": "n"}
    if stem and stem[-1] in one:
        return stem[:-1] + one[stem[-1]]
    return stem


def latvian_stem(w: str) -> str:
    n_vowels = sum(1 for c in w if c in _LV_VOWELS)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if (n_vowels > vc and len(w) >= len(affix) + 3
                and w.endswith(affix)):
            stem = w[: -len(affix)]
            return _lv_unpalatalize(stem, affix[0]) if palatalizes else stem
    return w


# ---------------------------------------------------------------------------
# Case folding the generic .lower() gets wrong (tr/el/ga)
# ---------------------------------------------------------------------------


def turkish_lowercase(w: str) -> str:
    """TurkishLowerCaseFilter.java:61-112 — I without a combining dot
    above lowers to DOTLESS i (\u0131); I + combining-dot-above lowers
    to i with the dot consumed; combining dots after an i-context are
    removed to mimic composed lowercase. Replaces str.lower() for
    Turkish — a generic lower() has already destroyed the distinction.
    """
    import unicodedata

    out: list = []
    chars = list(w)
    i, n = 0, len(chars)
    i_or_after = False
    while i < n:
        c = chars[i]
        i_or_after = c == "I" or (i_or_after
                                  and unicodedata.category(c) == "Mn")
        if i_or_after:
            if c == "\u0307":
                i += 1
                continue
            if c == "I":
                j = i + 1
                before_dot = False
                while j < n and unicodedata.category(chars[j]) == "Mn":
                    if chars[j] == "\u0307":
                        before_dot = True
                        break
                    j += 1
                if before_dot:
                    out.append("i")
                else:
                    out.append("\u0131")
                    i_or_after = False
                i += 1
                continue
        # Java Character.toLowerCase(\u0130) is a plain 'i'; Python's
        # str.lower() expands it to 'i' + combining dot above
        out.append("i" if c == "\u0130" else c.lower())
        i += 1
    return "".join(out)


_GA_UPPER_VOWELS = set("AEIOU\u00c1\u00c9\u00cd\u00d3\u00da")


def irish_lowercase(w: str) -> str:
    """IrishLowerCaseFilter.java:37-80 — inserts a hyphen between an
    eclipsis/t-prothesis prefix (n-/t-) and a following UPPER vowel
    before lowercasing (nAthair -> n-athair). Case-sensitive, so it
    replaces str.lower() rather than following it."""
    if len(w) > 1 and w[0] in ("n", "t") and w[1] in _GA_UPPER_VOWELS:
        return w[0] + "-" + w[1:].lower()
    return w.lower()


_EL_FOLD = str.maketrans({
    "\u03c2": "\u03c3",                       # final sigma -> sigma
    "\u0386": "\u03b1", "\u03ac": "\u03b1",  # alpha tonos
    "\u0388": "\u03b5", "\u03ad": "\u03b5",  # epsilon tonos
    "\u0389": "\u03b7", "\u03ae": "\u03b7",  # eta tonos
    "\u038a": "\u03b9", "\u03aa": "\u03b9", "\u03af": "\u03b9",
    "\u03ca": "\u03b9", "\u0390": "\u03b9",  # iota tonos/dialytika
    "\u038e": "\u03c5", "\u03ab": "\u03c5", "\u03cd": "\u03c5",
    "\u03cb": "\u03c5", "\u03b0": "\u03c5",  # upsilon tonos/dialytika
    "\u038c": "\u03bf", "\u03cc": "\u03bf",  # omicron tonos
    "\u038f": "\u03c9", "\u03ce": "\u03c9",  # omega tonos
    "\u03a2": "\u03c2",                       # reserved (bwcompat)
})


def greek_lowercase(w: str) -> str:
    """GreekLowerCaseFilter.java:40-113 — lowercase + final-sigma
    standardization + tonos/dialytika removal. The sigma/diacritic
    table is lowercase-idempotent, so this also works as a token
    filter AFTER a generic lower()."""
    return w.lower().translate(_EL_FOLD)




# ---------------------------------------------------------------------------
# Norwegian (no/NorwegianLightStemmer.java, no/NorwegianMinimalStemmer.java)
# ---------------------------------------------------------------------------


def norwegian_light_stem(w: str, bokmaal: bool = True,
                         nynorsk: bool = False) -> str:
    """NorwegianLightStemmer.java:85-183 — genitive -s, then ONE pass
    over the hand-crafted ending tiers; Bokmaal/Nynorsk endings are
    flag-gated exactly like the reference (factory default BOKMAAL)."""
    n = len(w)
    if n > 4 and w[-1] == "s":
        n -= 1
    e = lambda suf: n >= len(suf) and w[n - len(suf): n] == suf
    if n > 7 and ((e("heter") and bokmaal) or (e("heten") and bokmaal)
                  or (e("heita") and nynorsk)):
        return w[: n - 5]
    if n > 8 and nynorsk and (e("heiter") or e("leiken") or e("leikar")):
        return w[: n - 6]
    if n > 5 and (e("dom") or (e("het") and bokmaal)):
        return w[: n - 3]
    if n > 6 and nynorsk and (e("heit") or e("semd") or e("leik")):
        return w[: n - 4]
    if n > 7 and (e("elser") or e("elsen")):
        return w[: n - 5]
    if n > 6 and ((e("ende") and bokmaal) or (e("ande") and nynorsk)
                  or e("else") or (e("este") and bokmaal)
                  or (e("aste") and nynorsk) or (e("eren") and bokmaal)
                  or (e("aren") and nynorsk)):
        return w[: n - 4]
    if n > 5 and ((e("ere") and bokmaal) or (e("are") and nynorsk)
                  or (e("est") and bokmaal) or (e("ast") and nynorsk)
                  or e("ene") or (e("ane") and nynorsk)):
        return w[: n - 3]
    if n > 4 and (e("er") or e("en") or e("et") or (e("ar") and nynorsk)
                  or (e("st") and bokmaal) or e("te")):
        return w[: n - 2]
    if n > 3 and w[n - 1] in "aen":
        return w[: n - 1]
    return w[:n]


def norwegian_minimal_stem(w: str, bokmaal: bool = True,
                           nynorsk: bool = False) -> str:
    """NorwegianMinimalStemmer.java:81-110 — known noun plurals +
    genitive -s only."""
    n = len(w)
    if n > 4 and w[-1] == "s":
        n -= 1
    e = lambda suf: n >= len(suf) and w[n - len(suf): n] == suf
    if n > 5 and (e("ene") or (e("ane") and nynorsk)):
        return w[: n - 3]
    if n > 4 and (e("er") or e("en") or e("et")
                  or (e("ar") and nynorsk)):
        return w[: n - 2]
    if n > 3 and w[n - 1] in "ae":
        return w[: n - 1]
    return w[:n]


# ---------------------------------------------------------------------------
# Serbian (sr/SerbianNormalizationFilter.java — cyrillic + latin
# diacritics -> "bald" latin)
# ---------------------------------------------------------------------------

_SR_NORM = str.maketrans({
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d",
    "ђ": "dj", "đ": "dj",
    "е": "e", "ж": "z", "з": "z", "ž": "z", "и": "i", "ј": "j",
    "к": "k", "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj",
    "о": "o", "п": "p", "р": "r", "с": "s", "т": "t",
    "ћ": "c", "ц": "c", "ч": "c", "č": "c", "ć": "c",
    "у": "u", "ф": "f", "х": "h", "џ": "dz", "ш": "s", "š": "s",
})


def serbian_normalize(w: str) -> str:
    return w.translate(_SR_NORM)


# sr/SerbianNormalizationRegularFilter.java — Cyrillic -> Latin keeping
# the diacritics (đ ž ć č dž š); Latin input passes through unchanged
_SR_NORM_REGULAR = str.maketrans({
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "đ",
    "е": "e", "ж": "ž", "з": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o",
    "п": "p", "р": "r", "с": "s", "т": "t", "ћ": "ć", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "č", "џ": "dž", "ш": "š",
})


def serbian_normalize_regular(w: str) -> str:
    return w.translate(_SR_NORM_REGULAR)


INTL_FILTERS = {
    "norwegian_light_stem": norwegian_light_stem,
    "norwegian_minimal_stem": norwegian_minimal_stem,
    "serbian_normalize": serbian_normalize,
    "serbian_normalize_regular": serbian_normalize_regular,
    "latvian_stem": latvian_stem,
    "greek_lowercase": greek_lowercase,
    "indonesian_stem": indonesian_stem,
    "bengali_normalize": bengali_normalize,
    "bengali_stem": bengali_stem,
    "arabic_normalize": arabic_normalize,
    "arabic_stem": arabic_stem,
    "persian_normalize": persian_normalize,
    "hindi_normalize": hindi_normalize,
    "hindi_stem": hindi_stem,
    "sorani_normalize": sorani_normalize,
    "sorani_stem": sorani_stem,
    "czech_stem": czech_stem,
    "bulgarian_stem": bulgarian_stem,
}


CASE_FOLDERS = {
    "turkish": turkish_lowercase,
    "irish": irish_lowercase,
    "greek": greek_lowercase,
}
