"""CJK analysis: width normalization + bigram tokenization.

Re-expresses the reference's `analysis/cjk` package for the analyzer
chain (`analysis.py`):

- `cjk_width_fold`  — CJKWidthFilter.java:36-120: fullwidth ASCII
  variants (U+FF01–FF5E) fold to basic latin; halfwidth katakana
  (U+FF65–FF9F) folds to standard katakana, composing the voiced /
  半-voiced sound marks (U+FF9E/FF9F) into the preceding kana when a
  composed form exists. Applied to the raw text (the filter is
  per-character, so text-level == token-level).
- `cjk_split`       — StandardTokenizer's CJK behavior (the tokenizer
  emits Han/Hiragana/Katakana/Hangul as <IDEOGRAPHIC>/<HIRAGANA>/…
  tokens that CJKBigramFilter consumes char-by-char,
  CJKBigramFilter.java:53-60,135-141): spaces are injected around
  every CJK char so the `unicode` token regex emits them singly.
- `cjk_bigrams`     — CJKBigramFilter.java:146-240: runs of adjacent
  CJK chars (consecutive positions, same buffered run) become
  overlapping bigrams (<DOUBLE>); a lone CJK char that cannot pair
  emits as a unigram (<SINGLE>). With `output_unigrams=True` every
  char also emits at its own position and bigrams overlap the first
  char's position (posIncr=0), matching the reference's
  outputUnigrams mode.

The ~30-language dictionary segmenters (kuromoji/nori/smartcn) are
out of scope — bigram CJK is the reference's own dictionary-free
default (CJKAnalyzer.java), and is what web-scale multilingual
corpora get unless a per-language model ships.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# width fold (CJKWidthFilter.java)
# ---------------------------------------------------------------------------

# halfwidth kana -> fullwidth, indexed by cp - 0xFF65
# (CJKWidthFilter.java KANA_NORM; FF9E/FF9F fall back to the combining
# marks U+3099/309A when they cannot compose)
_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3, 0x30E5,
    0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8, 0x30AA, 0x30AB,
    0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,
    0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8, 0x30CA, 0x30CB, 0x30CC, 0x30CD,
    0x30CE, 0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0,
    0x30E1, 0x30E2, 0x30E4, 0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC,
    0x30ED, 0x30EF, 0x30F3, 0x3099, 0x309A,
]

# kana combining deltas for the voiced (FF9E) / half-voiced (FF9F)
# marks, indexed by prev - 0x30A6 (CJKWidthFilter.java KANA_COMBINE_*)
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_COMBINE_HALF_VOICED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 2,
    0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]


def cjk_width_fold(text: str) -> str:
    """CJKWidthFilter analog over a text string."""
    out: list[str] = []
    for ch in text:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(chr(cp - 0xFEE0))
        elif 0xFF65 <= cp <= 0xFF9F:
            if cp in (0xFF9E, 0xFF9F) and out:
                prev = ord(out[-1])
                if 0x30A6 <= prev <= 0x30FD:
                    d = (_KANA_COMBINE_HALF_VOICED if cp == 0xFF9F
                         else _KANA_COMBINE_VOICED)[prev - 0x30A6]
                    if d:
                        out[-1] = chr(prev + d)
                        continue
            out.append(chr(_KANA_NORM[cp - 0xFF65]))
        else:
            out.append(ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# CJK char classes (CJKBigramFilter.java HAN|HIRAGANA|KATAKANA|HANGUL)
# ---------------------------------------------------------------------------

# Han (unified + ext A + compat), Hiragana, Katakana, Hangul syllables+jamo
_CJK_RE = re.compile(
    "[一-鿿㐀-䶿豈-﫿"   # Han
    "぀-ゟ"                               # Hiragana (incl. marks)
    "゠-ヿㇰ-ㇿ"                  # Katakana
    "가-힯ᄀ-ᇿ㄰-㆏]"    # Hangul
)


def is_cjk_char(ch: str) -> bool:
    return bool(_CJK_RE.match(ch))


def cjk_split(text: str) -> str:
    """Space out each CJK char so the `unicode` token regex emits it as
    its own token — the StandardTokenizer <IDEOGRAPHIC>-per-char
    behavior that CJKBigramFilter's buffer consumes."""
    return _CJK_RE.sub(lambda m: f" {m.group()} ", text)


def cjk_bigrams(terms: list, positions: list,
                output_unigrams: bool = False):
    """CJKBigramFilter.java:146-240 over a (terms, positions) stream.

    Single-char CJK tokens at consecutive positions form a buffered
    run; each adjacent pair emits a <DOUBLE> bigram at the FIRST
    char's position. A run of length 1 emits its char as a <SINGLE>
    unigram. Non-CJK tokens pass through untouched. With
    ``output_unigrams`` every buffered char also emits at its own
    position, bigrams overlapping (posIncr=0) like the reference's
    outputUnigrams mode. Position values compress so downstream
    phrase positions stay dense, mirroring the filter's posIncr
    accounting."""
    out_t: list = []
    out_p: list = []
    run_t: list = []
    run_p: list = []

    def flush():
        if not run_t:
            return
        if len(run_t) == 1 and not output_unigrams:
            out_t.append(run_t[0])
            out_p.append(run_p[0])
        else:
            if output_unigrams:
                out_t.extend(run_t)
                out_p.extend(run_p)
            for i in range(len(run_t) - 1):
                out_t.append(run_t[i] + run_t[i + 1])
                out_p.append(run_p[i])
        run_t.clear()
        run_p.clear()

    for t, p in zip(terms, positions):
        if len(t) == 1 and is_cjk_char(t):
            if run_t and p != run_p[-1] + 1:
                flush()
            run_t.append(t)
            run_p.append(p)
        else:
            flush()
            out_t.append(t)
            out_p.append(p)
    flush()
    # re-densify positions preserving order + overlaps
    order = sorted(range(len(out_t)), key=lambda i: (out_p[i], i))
    remap: dict = {}
    for i in order:
        if out_p[i] not in remap:
            remap[out_p[i]] = len(remap)
    return [out_t[i] for i in order], [remap[out_p[i]] for i in order]
