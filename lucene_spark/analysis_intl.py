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


INTL_FILTERS = {
    "arabic_normalize": arabic_normalize,
    "arabic_stem": arabic_stem,
    "persian_normalize": persian_normalize,
    "hindi_normalize": hindi_normalize,
    "hindi_stem": hindi_stem,
}
