"""Language-analysis zoo: the nine "light" stemmers from the reference's
analysis/common module (Savoy's corpus-based light stemming, "Light
Stemming Approaches for the French, Portuguese, German and Hungarian
Languages", SAC 2006), re-expressed as pure token -> token functions
for the analyzer registry (`analysis._TOKEN_FILTERS`): the build
applies them once per UNIQUE batch token (analysis._filter_map), so
cost is O(vocabulary), not O(tokens).

Each function mirrors its reference algorithm exactly and is verified
against the reference's FULL published test vocabulary — 311,619
word/stem pairs across the nine languages, zero mismatches
(tests/test_lang_stemmers.py):

  german_light_stem     analysis/de/GermanLightStemmer.java
  spanish_light_stem    analysis/es/SpanishLightStemmer.java
  french_light_stem     analysis/fr/FrenchLightStemmer.java
  italian_light_stem    analysis/it/ItalianLightStemmer.java
  portuguese_light_stem analysis/pt/PortugueseLightStemmer.java
  swedish_light_stem    analysis/sv/SwedishLightStemmer.java
  russian_light_stem    analysis/ru/RussianLightStemmer.java
  finnish_light_stem    analysis/fi/FinnishLightStemmer.java
  hungarian_light_stem  analysis/hu/HungarianLightStemmer.java
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# accent-fold tables (each stemmer folds its own subset, per reference)
# ---------------------------------------------------------------------------

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")
_IT_FOLD = _ES_FOLD
_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")
_FR_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def german_light_stem(w: str) -> str:
    """GermanLightStemmer.java — umlaut fold, plural/case suffixes
    (-ern/-em/-en/-er/-es/-e/-s after a stEnding consonant), then
    superlative/inflection (-est/-er/-en/-st)."""
    w = w.translate(_DE_FOLD)
    n = len(w)
    # step 1
    if n > 5 and w.endswith("ern"):
        n -= 3
    elif n > 4 and w[n - 2] == "e" and w[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and w[n - 1] == "e":
        n -= 1
    elif n > 3 and w[n - 1] == "s" and w[n - 2] in "bdfghklmnt":
        n -= 1
    # step 2
    if n > 5 and w[n - 3 : n] == "est":
        n -= 3
    elif n > 4 and w[n - 2] == "e" and w[n - 1] in "rn":
        n -= 2
    elif n > 4 and w[n - 2 : n] == "st" and w[n - 3] in "bdfghklmnt":
        n -= 2
    return w[:n]


def spanish_light_stem(w: str) -> str:
    """SpanishLightStemmer.java — accent fold + plural/gender endings
    (-os/-as/-es with ces -> z), words < 5 chars untouched."""
    if len(w) < 5:
        return w
    w = w.translate(_ES_FOLD)
    if w[-1] in "oae":
        return w[:-1]
    if w[-1] == "s":
        if w.endswith("eses"):
            return w[:-2]
        if w.endswith("ces"):
            return w[:-3] + "z"
        if w[-2] in "oae":
            return w[:-2]
    return w


def italian_light_stem(w: str) -> str:
    """ItalianLightStemmer.java — accent fold + final-vowel plural
    endings (with i/h digraph handling), words < 6 chars untouched."""
    if len(w) < 6:
        return w
    w = w.translate(_IT_FOLD)
    last, prev = w[-1], w[-2]
    if last == "e":
        return w[:-2] if prev in "ih" else w[:-1]
    if last == "i":
        return w[:-2] if prev in "hi" else w[:-1]
    if last in "ao":
        return w[:-2] if prev == "i" else w[:-1]
    return w


def swedish_light_stem(w: str) -> str:
    """SwedishLightStemmer.java — definite/plural/comparative suffix
    ladder (-s, then -elser/-heten ... single t/a/e/n)."""
    n = len(w)
    if n > 4 and w[n - 1] == "s":
        n -= 1
    if n > 7 and w[n - 5 : n] in ("elser", "heten"):
        return w[: n - 5]
    if n > 6 and w[n - 4 : n] in (
        "arne", "erna", "ande", "else", "aste", "orna", "aren"
    ):
        return w[: n - 4]
    if n > 5 and w[n - 3 : n] in ("are", "ast", "het"):
        return w[: n - 3]
    if n > 4 and w[n - 2 : n] in ("ar", "er", "or", "en", "at", "te", "et"):
        return w[: n - 2]
    if n > 3 and w[n - 1] in "taen":
        return w[: n - 1]
    return w[:n]


def french_light_stem(w: str) -> str:
    """FrenchLightStemmer.java — plural x/s strip, the -issement/-ateur/
    -trice/... suffix cascade with letter rewrites, then norm():
    accent fold, repeated-letter collapse, -ie/-r/-e/-e strip."""
    s = list(w)
    n = len(s)

    def ends(suf: str) -> bool:
        return n >= len(suf) and s[n - len(suf) : n] == list(suf)

    def norm(m: int) -> str:
        t = s[:m]
        if m > 4:
            t = list("".join(t).translate(_FR_FOLD))
            # collapse consecutive repeated letters
            out = [t[0]]
            for ch in t[1:]:
                if ch == out[-1] and ch.isalpha():
                    continue
                out.append(ch)
            t = out
            m = len(t)
        if m > 4 and t[m - 2 : m] == ["i", "e"]:
            m -= 2
        if m > 4:
            if t[m - 1] == "r":
                m -= 1
            if t[m - 1] == "e":
                m -= 1
            if t[m - 1] == "e":
                m -= 1
            if t[m - 1] == t[m - 2] and t[m - 1].isalpha():
                m -= 1
        return "".join(t[:m])

    if n > 5 and s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u" and s[n - 4] != "e":
            s[n - 2] = "l"
        n -= 1
    if n > 3 and s[n - 1] == "x":
        n -= 1
    if n > 3 and s[n - 1] == "s":
        n -= 1
    if n > 9 and ends("issement"):
        n -= 6
        s[n - 1] = "r"
        return norm(n)
    if n > 8 and ends("issant"):
        n -= 4
        s[n - 1] = "r"
        return norm(n)
    if n > 6 and ends("ement"):
        n -= 4
        if n > 3 and s[n - 3 : n] == list("ive"):
            n -= 1
            s[n - 1] = "f"
        return norm(n)
    if n > 11 and ends("ficatrice"):
        n -= 5
        s[n - 2], s[n - 1] = "e", "r"
        return norm(n)
    if n > 10 and ends("ficateur"):
        n -= 4
        s[n - 2], s[n - 1] = "e", "r"
        return norm(n)
    if n > 9 and ends("catrice"):
        n -= 3
        s[n - 4], s[n - 3], s[n - 2] = "q", "u", "e"
        return norm(n)
    if n > 8 and ends("cateur"):
        n -= 2
        s[n - 4], s[n - 3], s[n - 2], s[n - 1] = "q", "u", "e", "r"
        return norm(n)
    if n > 8 and ends("atrice"):
        n -= 4
        s[n - 2], s[n - 1] = "e", "r"
        return norm(n)
    if n > 7 and ends("ateur"):
        n -= 3
        s[n - 2], s[n - 1] = "e", "r"
        return norm(n)
    if n > 6 and ends("trice"):
        n -= 1
        s[n - 3], s[n - 2], s[n - 1] = "e", "u", "r"
    if n > 5 and ends("ième"):
        return norm(n - 4)
    if n > 7 and ends("teuse"):
        n -= 2
        s[n - 1] = "r"
        return norm(n)
    if n > 6 and ends("teur"):
        n -= 1
        s[n - 1] = "r"
        return norm(n)
    if n > 5 and ends("euse"):
        return norm(n - 2)
    if n > 8 and ends("ère"):
        n -= 1
        s[n - 2] = "e"
        return norm(n)
    if n > 7 and ends("ive"):
        n -= 1
        s[n - 1] = "f"
        return norm(n)
    if n > 4 and (ends("folle") or ends("molle")):
        n -= 2
        s[n - 1] = "u"
        return norm(n)
    if n > 9 and ends("nnelle"):
        return norm(n - 5)
    if n > 9 and ends("nnel"):
        return norm(n - 3)
    if n > 4 and ends("ète"):
        n -= 1
        s[n - 2] = "e"
    if n > 8 and ends("ique"):
        n -= 4
    if n > 8 and ends("esse"):
        return norm(n - 3)
    if n > 7 and ends("inage"):
        return norm(n - 3)
    if n > 9 and ends("isation"):
        n -= 7
        if n > 5 and s[n - 3 : n] == list("ual"):
            s[n - 2] = "e"
        return norm(n)
    if n > 9 and ends("isateur"):
        return norm(n - 7)
    if n > 8 and ends("ation"):
        return norm(n - 5)
    if n > 8 and ends("ition"):
        return norm(n - 5)
    return norm(n)


def portuguese_light_stem(w: str) -> str:
    """PortugueseLightStemmer.java — plural suffixes (with l/m
    restorations), feminine normalization, final vowel strip, accent
    fold (fold LAST, per reference). Words < 4 chars untouched."""
    if len(w) < 4:
        return w
    s = list(w)
    n = len(s)

    def ends(m: int, suf: str) -> bool:
        return m >= len(suf) and s[m - len(suf) : m] == list(suf)

    # removeSuffix
    if n > 4 and ends(n, "es") and s[n - 3] in "rslz":
        n -= 2
    elif n > 3 and ends(n, "ns"):
        s[n - 2] = "m"
        n -= 1
    elif n > 4 and (ends(n, "eis") or ends(n, "éis")):
        s[n - 3], s[n - 2] = "e", "l"
        n -= 1
    elif n > 4 and ends(n, "ais"):
        s[n - 2] = "l"
        n -= 1
    elif n > 4 and ends(n, "óis"):
        s[n - 3], s[n - 2] = "o", "l"
        n -= 1
    elif n > 4 and ends(n, "is"):
        s[n - 1] = "l"
    elif n > 3 and (ends(n, "ões") or ends(n, "ães")):
        n -= 1
        s[n - 2], s[n - 1] = "ã", "o"
    elif n > 6 and ends(n, "mente"):
        n -= 5
    elif n > 3 and s[n - 1] == "s":
        n -= 1

    # normFeminine
    if n > 3 and s[n - 1] == "a":
        if n > 7 and (ends(n, "inha") or ends(n, "iaca") or ends(n, "eira")):
            s[n - 1] = "o"
        elif n > 6:
            if (
                ends(n, "osa") or ends(n, "ica") or ends(n, "ida")
                or ends(n, "ada") or ends(n, "iva") or ends(n, "ama")
            ):
                s[n - 1] = "o"
            elif ends(n, "ona"):
                s[n - 3], s[n - 2] = "ã", "o"
                n -= 1
            elif ends(n, "ora"):
                n -= 1
            elif ends(n, "esa"):
                s[n - 3] = "ê"
                n -= 1
            elif ends(n, "na"):
                s[n - 1] = "o"

    if n > 4 and s[n - 1] in "eao":
        n -= 1
    return "".join(s[:n]).translate(_PT_FOLD)


_RU_4 = ("иями", "оями")
_RU_3 = (
    "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему", "ери",
    "ими", "ого", "ому", "ыми", "оев",
)
_RU_2 = (
    "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою", "ую",
    "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им", "ое", "ой",
    "ом", "ов", "ые", "ый", "ым", "ми",
)


def russian_light_stem(w: str) -> str:
    """RussianLightStemmer.java — case-ending ladder + ь/и/нн
    normalization."""
    n = len(w)
    # removeCase
    if n > 6 and w[n - 4 : n] in _RU_4:
        n -= 4
    elif n > 5 and w[n - 3 : n] in _RU_3:
        n -= 3
    elif n > 4 and w[n - 2 : n] in _RU_2:
        n -= 2
    elif n > 3 and w[n - 1] in "аеиоуйыяь":
        n -= 1
    # normalize
    if n > 3:
        if w[n - 1] in "ьи":
            n -= 1
        elif w[n - 1] == "н" and w[n - 2] == "н":
            n -= 1
    return w[:n]


LIGHT_STEMMERS = {
    "german_light_stem": german_light_stem,
    "spanish_light_stem": spanish_light_stem,
    "french_light_stem": french_light_stem,
    "italian_light_stem": italian_light_stem,
    "portuguese_light_stem": portuguese_light_stem,
    "swedish_light_stem": swedish_light_stem,
    "russian_light_stem": russian_light_stem,
}


def finnish_light_stem(w: str) -> str:
    """FinnishLightStemmer.java (analysis/fi) — ä/å/ö fold, particle
    (-kin/-ko, recursive) + case-ending ladder + hde->ksi and repeated
    k/p/t collapse normalizations. Words < 4 chars untouched."""
    if len(w) < 4:
        return w
    s = list(w.translate(_FI_FOLD))

    def ends(m: int, suf: str) -> bool:
        return m >= len(suf) and s[m - len(suf) : m] == list(suf)

    def vowel(ch: str) -> bool:
        return ch in "aeiouy"

    def step1(n: int) -> int:
        if n > 8:
            if ends(n, "kin"):
                return step1(n - 3)
            if ends(n, "ko"):
                return step1(n - 2)
        if n > 11:
            if ends(n, "dellinen"):
                return n - 8
            if ends(n, "dellisuus"):
                return n - 9
        return n

    def step2(n: int) -> int:
        if n > 5:
            if ends(n, "lla") or ends(n, "tse") or ends(n, "sti"):
                return n - 3
            if ends(n, "ni"):
                return n - 2
            if ends(n, "aa"):
                return n - 1
        return n

    def step3(n: int) -> int:
        if n > 8:
            if ends(n, "nnen"):
                s[n - 4] = "s"
                return n - 3
            if ends(n, "ntena"):
                s[n - 5] = "s"
                return n - 4
            if ends(n, "tten"):
                return n - 4
            if ends(n, "eiden"):
                return n - 5
        if n > 6:
            if (
                ends(n, "neen") or ends(n, "niin") or ends(n, "seen")
                or ends(n, "teen") or ends(n, "inen")
            ):
                return n - 4
            if s[n - 3] == "h" and vowel(s[n - 2]) and s[n - 1] == "n":
                return n - 3
            if ends(n, "den"):
                s[n - 3] = "s"
                return n - 2
            if ends(n, "ksen"):
                s[n - 4] = "s"
                return n - 3
            if (
                ends(n, "ssa") or ends(n, "sta") or ends(n, "lla")
                or ends(n, "lta") or ends(n, "tta") or ends(n, "ksi")
                or ends(n, "lle")
            ):
                return n - 3
        if n > 5:
            if ends(n, "na") or ends(n, "ne"):
                return n - 2
            if ends(n, "nei"):
                return n - 3
        if n > 4:
            if ends(n, "ja") or ends(n, "ta"):
                return n - 2
            if s[n - 1] == "a":
                return n - 1
            if s[n - 1] == "n" and vowel(s[n - 2]):
                return n - 2
            if s[n - 1] == "n":
                return n - 1
        return n

    def norm1(n: int) -> int:
        if n > 5 and ends(n, "hde"):
            s[n - 3], s[n - 2], s[n - 1] = "k", "s", "i"
        if n > 4 and (ends(n, "ei") or ends(n, "at")):
            return n - 2
        if n > 3 and s[n - 1] in "tsjeai":
            return n - 1
        return n

    def norm2(n: int) -> int:
        if n > 8 and s[n - 1] in "eou":
            n -= 1
        if n > 4:
            if s[n - 1] == "i":
                n -= 1
            if n > 4:
                # collapse repeated k/p/t
                out = [s[0]]
                for ch in s[1:n]:
                    if ch == out[-1] and ch in "kpt":
                        continue
                    out.append(ch)
                s[:len(out)] = out
                n = len(out)
        return n

    return "".join(s[: norm2(norm1(step3(step2(step1(len(s))))))])


def hungarian_light_stem(w: str) -> str:
    """HungarianLightStemmer.java (analysis/hu) — accent fold, case
    endings, possessives, plural -k (with a/o/e fallthrough), final
    a/e/i/o normalization."""
    s = list(w.translate(_HU_FOLD))
    n = len(s)

    def ends(m: int, suf: str) -> bool:
        return m >= len(suf) and s[m - len(suf) : m] == list(suf)

    def vowel(ch: str) -> bool:
        return ch in "aeiouy"

    def remove_case(n: int) -> int:
        if n > 6 and ends(n, "kent"):
            return n - 4
        if n > 5:
            if any(
                ends(n, x)
                for x in ("nak", "nek", "val", "vel", "ert", "rol", "ban",
                          "ben", "bol", "nal", "nel", "hoz", "hez", "tol")
            ):
                return n - 3
            if (ends(n, "al") or ends(n, "el")) and not vowel(s[n - 3]) \
                    and s[n - 3] == s[n - 4]:
                return n - 3
        if n > 4:
            if any(
                ends(n, x)
                for x in ("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                          "be", "ul", "ig")
            ):
                return n - 2
            if (ends(n, "on") or ends(n, "en")) and not vowel(s[n - 3]):
                return n - 2
            if s[n - 1] in "tn":
                return n - 1
            if s[n - 1] in "ae" and s[n - 2] == s[n - 3] and not vowel(s[n - 2]):
                return n - 2
        return n

    def remove_possessive(n: int) -> int:
        if n > 6:
            if not vowel(s[n - 5]) and (
                ends(n, "atok") or ends(n, "otok") or ends(n, "etek")
            ):
                return n - 4
            if ends(n, "itek") or ends(n, "itok"):
                return n - 4
        if n > 5:
            if not vowel(s[n - 4]) and (
                ends(n, "unk") or ends(n, "tok") or ends(n, "tek")
            ):
                return n - 3
            if vowel(s[n - 4]) and ends(n, "juk"):
                return n - 3
            if ends(n, "ink"):
                return n - 3
        if n > 4:
            if not vowel(s[n - 3]) and any(
                ends(n, x) for x in ("am", "em", "om", "ad", "ed", "od", "uk")
            ):
                return n - 2
            if vowel(s[n - 3]) and (
                ends(n, "nk") or ends(n, "ja") or ends(n, "je")
            ):
                return n - 2
            if ends(n, "im") or ends(n, "id") or ends(n, "ik"):
                return n - 2
        if n > 3:
            if s[n - 1] in "ae" and not vowel(s[n - 2]):
                return n - 1
            if s[n - 1] in "md" and vowel(s[n - 2]):
                return n - 1
            if s[n - 1] == "i":
                return n - 1
        return n

    def remove_plural(n: int) -> int:
        if n > 3 and s[n - 1] == "k":
            if s[n - 2] in "aoe" and n > 4:
                return n - 2
            return n - 1
        return n

    def normalize(n: int) -> int:
        if n > 3 and s[n - 1] in "aeio":
            return n - 1
        return n

    return "".join(s[: normalize(remove_plural(remove_possessive(remove_case(n))))])


_FI_FOLD = str.maketrans("äåö", "aao")
_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")

LIGHT_STEMMERS["finnish_light_stem"] = finnish_light_stem
LIGHT_STEMMERS["hungarian_light_stem"] = hungarian_light_stem
