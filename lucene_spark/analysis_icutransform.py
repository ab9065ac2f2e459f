"""ICUTransformFilter analog — script transliteration as a token filter.

Reference: analysis/icu/src/java/.../ICUTransformFilter.java:55 (wraps
``com.ibm.icu.text.Transliterator``; the term text is replaced by the
transform of the whole token). ICU ships hundreds of transform IDs
backed by CLDR data files; this module vendors SMALL self-built tables
for the transforms the reference's own tests exercise
(TestICUTransformFilter.java:34-56) plus the rule-based engine:

- ``Traditional-Simplified`` — per-char table (subset of the CLDR
  Han simplification mapping, common characters only)
- ``Katakana-Hiragana`` — the systematic -0x60 codepoint shift
- ``Fullwidth-Halfwidth`` — fullwidth ASCII + halfwidth-katakana
  decomposition (dakuten split to U+FF9E/U+FF9F)
- ``Any-Latin`` — Greek (UNGEGN-style, digraphs ph/th/ch/ps, accents
  carried through combining marks) and Cyrillic (scientific) subsets;
  other scripts pass through
- ``Han-Latin`` — per-char pinyin subset, space-separated syllables
- ``NFD`` / ``NFC`` / ``[:Nonspacing Mark:] Remove`` / ``CaseFold``
- compound IDs: ``A; B; C`` compose left to right
- ``Transliterator.createFromRules`` analog: ``from_rules("a > b;
  c { a > d; a } x > e;")`` — ordered rules, leftmost-longest position
  scan, optional left (``pre {``) and right (``} post``) contexts,
  replacement text NOT rescanned, ``\\uXXXX``/``\\UXXXXXXXX`` escapes.

Analyzer hook: ``filters: ["icu_transform:Any-Latin"]`` (dynamic
filter name, applied per unique token like every other filter).
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

__all__ = ["get_transliterator", "from_rules"]

# --- vendored tables -------------------------------------------------------

_TRAD_SIMP = dict(zip(
    "簡體國語學習書寫門開關東車馬鳥魚貝見話語讀買賣員圓園遠運動發髮飛機氣廣場長張當黨點".replace(" ", ""),
    "简体国语学习书写门开关东车马鸟鱼贝见话语读买卖员圆园远运动发发飞机气广场长张当党点".replace(" ", ""),
))

_HW_KATA = {
    # fullwidth katakana -> halfwidth (base forms; dakuten decompose)
    "ア": "ｱ", "イ": "ｲ", "ウ": "ｳ", "エ": "ｴ", "オ": "ｵ",
    "カ": "ｶ", "キ": "ｷ", "ク": "ｸ", "ケ": "ｹ", "コ": "ｺ",
    "サ": "ｻ", "シ": "ｼ", "ス": "ｽ", "セ": "ｾ", "ソ": "ｿ",
    "タ": "ﾀ", "チ": "ﾁ", "ツ": "ﾂ", "テ": "ﾃ", "ト": "ﾄ",
    "ナ": "ﾅ", "ニ": "ﾆ", "ヌ": "ﾇ", "ネ": "ﾈ", "ノ": "ﾉ",
    "ハ": "ﾊ", "ヒ": "ﾋ", "フ": "ﾌ", "ヘ": "ﾍ", "ホ": "ﾎ",
    "マ": "ﾏ", "ミ": "ﾐ", "ム": "ﾑ", "メ": "ﾒ", "モ": "ﾓ",
    "ヤ": "ﾔ", "ユ": "ﾕ", "ヨ": "ﾖ",
    "ラ": "ﾗ", "リ": "ﾘ", "ル": "ﾙ", "レ": "ﾚ", "ロ": "ﾛ",
    "ワ": "ﾜ", "ヲ": "ｦ", "ン": "ﾝ", "ー": "ｰ", "。": "｡",
    "「": "｢", "」": "｣", "、": "､", "・": "･",
    "ァ": "ｧ", "ィ": "ｨ", "ゥ": "ｩ", "ェ": "ｪ", "ォ": "ｫ",
    "ッ": "ｯ", "ャ": "ｬ", "ュ": "ｭ", "ョ": "ｮ",
}

_GREEK_LATIN = {
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
    "η": "ē", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
    "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "σ": "s",
    "ς": "s", "τ": "t", "υ": "y", "φ": "ph", "χ": "ch", "ψ": "ps",
    "ω": "ō",
}

_CYR_LATIN = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ж": "ž", "з": "z", "и": "i", "й": "j", "к": "k", "л": "l",
    "м": "m", "н": "n", "о": "o", "п": "p", "р": "r", "с": "s",
    "т": "t", "у": "u", "ф": "f", "х": "h", "ц": "c", "ч": "č",
    "ш": "š", "щ": "šč", "ъ": "ʺ", "ы": "y", "ь": "ʹ", "э": "è",
    "ю": "ju", "я": "ja", "ё": "ë",
}

_PINYIN = {
    "中": "zhōng", "国": "guó", "语": "yǔ", "言": "yán", "文": "wén",
    "学": "xué", "数": "shù", "据": "jù", "索": "suǒ", "引": "yǐn",
    "搜": "sōu", "分": "fēn", "析": "xī", "处": "chǔ", "理": "lǐ",
}


def _t_trad_simp(s: str) -> str:
    return "".join(_TRAD_SIMP.get(c, c) for c in s)


def _t_kata_hira(s: str) -> str:
    return "".join(
        chr(ord(c) - 0x60) if 0x30A1 <= ord(c) <= 0x30F6 else c
        for c in s
    )


def _t_full_half(s: str) -> str:
    out = []
    for c in s:
        cp = ord(c)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(chr(cp - 0xFEE0))
        elif c == "　":
            out.append(" ")
        elif c in _HW_KATA:
            out.append(_HW_KATA[c])
        else:
            # dakuten/handakuten katakana decompose: ガ -> ｶ + ﾞ
            d = unicodedata.normalize("NFD", c)
            if len(d) == 2 and d[0] in _HW_KATA and d[1] in "゙゚":
                out.append(_HW_KATA[d[0]])
                out.append("ﾞ" if d[1] == "゙" else "ﾟ")
            else:
                out.append(c)
    return "".join(out)


def _t_any_latin(s: str) -> str:
    # decompose so accents ride through as combining marks, map base
    # letters, recompose (Αλφαβητικός -> Alphabētikós)
    out = []
    for c in unicodedata.normalize("NFD", s):
        low = c.lower()
        if low in _GREEK_LATIN:
            t = _GREEK_LATIN[low]
            out.append(t.capitalize() if c.isupper() else t)
        elif low in _CYR_LATIN:
            t = _CYR_LATIN[low]
            out.append(t.capitalize() if c.isupper() else t)
        else:
            out.append(c)
    return unicodedata.normalize("NFC", "".join(out))


def _t_han_latin(s: str) -> str:
    """One pinyin syllable per han char, consecutive syllables
    space-separated (中国 -> "zhōng guó"); other chars pass through."""
    out: list[str] = []
    prev_han = False
    for c in s:
        if c in _PINYIN:
            if prev_han:
                out.append(" ")
            out.append(_PINYIN[c])
            prev_han = True
        else:
            out.append(c)
            prev_han = False
    return "".join(out)


def _t_nfd(s: str) -> str:
    return unicodedata.normalize("NFD", s)


def _t_nfc(s: str) -> str:
    return unicodedata.normalize("NFC", s)


def _t_remove_mn(s: str) -> str:
    return "".join(
        c for c in s if unicodedata.category(c) != "Mn"
    )


def _t_casefold(s: str) -> str:
    return s.casefold()


_SYSTEM = {
    "traditional-simplified": _t_trad_simp,
    "katakana-hiragana": _t_kata_hira,
    "fullwidth-halfwidth": _t_full_half,
    "any-latin": _t_any_latin,
    "han-latin": _t_han_latin,
    "nfd": _t_nfd,
    "nfc": _t_nfc,
    "[:nonspacing mark:] remove": _t_remove_mn,
    "casefold": _t_casefold,
}


@lru_cache(maxsize=64)
def get_transliterator(transform_id: str):
    """Compound transform ID -> callable (``A; B`` composes left to
    right, like Transliterator.getInstance)."""
    fns = []
    for part in transform_id.split(";"):
        key = part.strip().lower()
        if not key:
            continue
        fn = _SYSTEM.get(key)
        if fn is None:
            raise KeyError(
                f"unknown transform {part.strip()!r} (vendored subset; "
                f"see analysis_icutransform.py docstring)"
            )
        fns.append(fn)

    def apply(s: str) -> str:
        for f in fns:
            s = f(s)
        return s

    return apply


# --- rule-based transliterator (createFromRules analog) --------------------

_ESC_RE = re.compile(r"\\U([0-9a-fA-F]{8})|\\u([0-9a-fA-F]{4})")


def _unescape(s: str) -> str:
    return _ESC_RE.sub(
        lambda m: chr(int(m.group(1) or m.group(2), 16)), s
    ).strip()


def from_rules(rules: str):
    """Ordered ``pattern > replacement;`` rules with optional
    ``pre { pattern`` / ``pattern } post`` contexts. Leftmost scan;
    at each position the FIRST matching rule applies; the replacement
    is not rescanned (matches the reference test expectations:
    "a > b; b > c;" maps abacadaba -> bcbcbdbcb, and
    "c { a > b; a > d;" maps caa -> cbd)."""
    parsed = []
    for raw in rules.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        lhs, rhs = raw.split(">", 1)
        rhs = _unescape(rhs)
        pre = post = ""
        pat = lhs
        if "{" in lhs:
            pre, pat = lhs.split("{", 1)
        if "}" in pat:
            pat, post = pat.split("}", 1)
        parsed.append((
            _unescape(pre), _unescape(pat), _unescape(post), rhs
        ))

    def apply(s: str) -> str:
        out = []
        i = 0
        n = len(s)
        while i < n:
            for pre, pat, post, rhs in parsed:
                if not s.startswith(pat, i):
                    continue
                if pre and not s.endswith(pre, 0, i):
                    continue
                j = i + len(pat)
                if post and not s.startswith(post, j):
                    continue
                out.append(rhs)
                i = j
                break
            else:
                out.append(s[i])
                i += 1
        return "".join(out)

    return apply
