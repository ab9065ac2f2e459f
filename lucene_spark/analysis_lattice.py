"""Generic small-lexicon lattice tokenizer — the shared engine behind
the nori (Korean) and smartcn (Chinese) analogs.

Reference semantics (not code):
- nori: analysis/nori/src/java/.../ko/KoreanTokenizer.java:88 — the
  same rolling Viterbi over a mecab-style dictionary as kuromoji,
  applied to Korean (decompounds runs like "이외의" into 이외 + 의).
- smartcn: analysis/smartcn/src/java/.../cn/smart/hhmm/
  HHMMSegmenter.java:38 — hidden-Markov bigram segmentation of Chinese
  sentences; out-of-vocabulary hanzi become single-char tokens
  (SmartChineseAnalyzer test: 我|购买|了|道具|和|服装).

Like analysis_ja.py (whose fuller engine adds SEARCH-mode penalties
and IPADIC char classes), the DICTIONARIES ARE NOT mecab-ko-dic /
the smartcn bigram model — shipping them is out of scope. Each
instantiation vendors a small self-built lexicon with self-chosen
costs; the ENGINE (least-cost lattice, per-class connection costs,
script-aware unknown handling) follows the published algorithms, and
the reference test-vector sentences covered by the lexicons segment
identically.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

__all__ = ["LatEntry", "LatticeTokenizer", "KO_TOKENIZER", "ZH_TOKENIZER"]


@dataclass(frozen=True)
class LatEntry:
    surface: str
    cost: int
    pos: str          # coarse tag: N noun, J particle, V verb, C conj,
    # P pronoun, SYM symbol ...
    base: str | None = None


class LatticeTokenizer:
    """Least-cost segmentation over a vendored lexicon.

    unknown handling per script class of the first char:
    - ``group`` classes (hangul-with-no-dict-word, latin, digits):
      the maximal same-class run is one unknown token;
    - ``single`` classes (CJK ideographs): one unknown token per char
      (the smartcn OOV rule).
    """

    #                 (base, per_char)
    UNK_GROUP_COST = (8000, 1600)
    UNK_SINGLE_COST = 10600

    def __init__(self, entries: list[LatEntry],
                 conn: dict[tuple[str, str], int] | None = None,
                 default_conn: int = 600,
                 single_char_classes: tuple = ("cjk",)):
        self._by_surface: dict[str, LatEntry] = {}
        for e in entries:
            self._by_surface[e.surface] = e
        self._prefixes = frozenset(
            e.surface[:i]
            for e in entries
            for i in range(1, len(e.surface) + 1)
        )
        self._max_len = max(len(e.surface) for e in entries)
        self._conn = conn or {}
        self._default_conn = default_conn
        self._single = frozenset(single_char_classes)

    @staticmethod
    def _char_class(ch: str) -> str:
        cp = ord(ch)
        if 0xAC00 <= cp <= 0xD7AF or 0x1100 <= cp <= 0x11FF:
            return "hangul"
        if (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
                or cp >= 0x20000):
            return "cjk"
        if ch.isdigit():
            return "digit"
        if ch.isalpha():
            return "alpha"
        return "sym"

    def _conn_cost(self, left: str, right: str) -> int:
        return self._conn.get((left, right), self._default_conn)

    def _segment(self, frag: str) -> list[tuple[str, str]]:
        n = len(frag)
        classes = [self._char_class(c) for c in frag]
        # best[pos][pos_tag] = (cost, back_start, back_tag, surface, tag)
        best: list[dict[str, tuple]] = [dict() for _ in range(n + 1)]
        best[0]["BOS"] = (0, -1, "", "", "")
        for i in range(n):
            if not best[i]:
                continue
            cands: list[tuple[str, str, int]] = []  # (surface, tag, cost)
            has_dict = False
            for ln in range(1, min(self._max_len, n - i) + 1):
                piece = frag[i : i + ln]
                if piece not in self._prefixes:
                    break
                e = self._by_surface.get(piece)
                if e is not None:
                    cands.append((piece, e.pos, e.cost))
                    has_dict = True
            if not has_dict:
                cls = classes[i]
                if cls in self._single:
                    cands.append((frag[i], "UNK", self.UNK_SINGLE_COST))
                else:
                    run = i + 1
                    while run < n and classes[run] == cls:
                        run += 1
                    base, per = self.UNK_GROUP_COST
                    cands.append(
                        (frag[i:run], "UNK", base + per * (run - i))
                    )
            for surface, tag, wcost in cands:
                end = i + len(surface)
                for ltag, (lcost, *_r) in best[i].items():
                    total = lcost + self._conn_cost(ltag, tag) + wcost
                    cur = best[end].get(tag)
                    if cur is None or total < cur[0] or (
                        total == cur[0] and i < cur[1]
                    ):
                        best[end][tag] = (total, i, ltag, surface, tag)
        if not best[n]:
            return [(frag, "UNK")]
        end_tag = min(best[n], key=lambda t: (best[n][t][0], t))
        out = []
        pos, tag = n, end_tag
        while pos > 0:
            cost, start, ltag, surface, t = best[pos][tag]
            out.append((surface, t))
            pos, tag = start, ltag
        out.reverse()
        return out

    def tokenize(self, text: str, pos_stop: frozenset | None = None,
                 discard_punct: bool = True) -> tuple[list[str], list[int]]:
        """(terms, positions); POS-stopped tokens leave holes, discarded
        punctuation leaves none (same contract as analysis_ja)."""
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        for frag in text.split():
            for surface, tag in self._segment(frag):
                is_punct = tag == "SYM" or all(
                    self._char_class(c) == "sym" for c in surface
                )
                if discard_punct and is_punct:
                    continue
                term = surface.lower()
                if pos_stop is not None and tag in pos_stop:
                    pos += 1  # hole
                    continue
                terms.append(term)
                positions.append(pos)
                pos += 1
        return terms, positions

    def analyze_batch(self, texts: pd.Series,
                      pos_stop: frozenset | None = None,
                      discard_punct: bool = True) -> pd.DataFrame:
        from lucene_spark.smallfloat import int_to_byte4

        term_lists, pos_lists = [], []
        for s in texts.fillna(""):
            t, p = self.tokenize(s, pos_stop, discard_punct)
            term_lists.append(t)
            pos_lists.append(p)
        dl = np.asarray([len(t) for t in term_lists], dtype=np.int64)
        return pd.DataFrame({
            "terms": term_lists,
            "positions": pos_lists,
            "dl": dl,
            "norm": int_to_byte4(dl).astype(np.int32),
        })


# --- Korean (nori analog) --------------------------------------------------

_KO_ENTRIES = [
    # particles (조사) — KoreanPartOfSpeechStopFilter's J class
    *[LatEntry(s, 400, "J") for s in (
        "의", "은", "는", "이", "가", "을", "를", "에", "에서", "도",
        "와", "과", "로", "으로", "만", "부터", "까지",
    )],
    # nouns (incl. the reference test vocabulary: 화학 이외 것 사이즈)
    *[LatEntry(s, 3000, "N") for s in (
        "화학", "이외", "것", "사이즈", "한국", "언어", "사전", "검색",
        "색인", "문서", "데이터", "시스템", "분석", "처리", "번역",
    )],
    *[LatEntry(s, 100, "SYM") for s in ("。", "．", "！", "？", "!", "?")],
]
KO_TOKENIZER = LatticeTokenizer(
    _KO_ENTRIES,
    conn={("N", "J"): 0, ("J", "N"): 100, ("BOS", "N"): 100},
    single_char_classes=("cjk",),  # hangul unknowns GROUP (run tokens)
)

# --- Chinese (smartcn analog) ----------------------------------------------

_ZH_ENTRIES = [
    *[LatEntry(s, 800, "P") for s in ("我", "你", "他", "她", "我们")],
    *[LatEntry(s, 500, "J") for s in ("的", "了", "是", "在", "吗")],
    *[LatEntry(s, 600, "C") for s in ("和", "或", "与")],
    *[LatEntry(s, 3000, "V") for s in ("购买", "搜索", "分析", "处理")],
    *[LatEntry(s, 3000, "N") for s in (
        "道具", "服装", "中国", "语言", "词典", "索引", "文档", "数据",
        "系统", "引擎",
    )],
    *[LatEntry(s, 100, "SYM") for s in ("。", "，", "、", "！", "？")],
]
ZH_TOKENIZER = LatticeTokenizer(
    _ZH_ENTRIES,
    conn={("P", "V"): 100, ("V", "J"): 0, ("J", "N"): 100,
          ("N", "C"): 100, ("C", "N"): 100, ("BOS", "P"): 100},
    single_char_classes=("cjk",),  # smartcn OOV hanzi -> unigrams
)
