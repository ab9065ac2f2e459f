"""Korean (nori analog) and Chinese (smartcn analog) lattice
tokenizers (analysis_lattice.py).

Reference vectors: nori TestKoreanTokenizer.java (:150 spaces,
:132 part-of-speech number split) and smartcn
TestSmartChineseAnalyzer.java (:30 chinese sentence, :46 two
sentences).
"""

from __future__ import annotations

import pandas as pd

from lucene_spark.analysis import analyze_batch, tokenize
from lucene_spark.analysis_lattice import KO_TOKENIZER, ZH_TOKENIZER


def test_korean_reference_vectors():
    # TestKoreanTokenizer: 화학 이외의 것 -> 화학 | 이외 | 의 | 것
    assert KO_TOKENIZER.tokenize("화학 이외의 것")[0] == [
        "화학", "이외", "의", "것"
    ]
    # multiple spaces collapse (the :150 vector)
    assert KO_TOKENIZER.tokenize("화학        이외의         것")[0] == [
        "화학", "이외", "의", "것"
    ]
    # 44사이즈 -> 44 | 사이즈 (digit run + dictionary noun)
    assert KO_TOKENIZER.tokenize("44사이즈")[0] == ["44", "사이즈"]


def test_chinese_reference_vectors():
    # TestSmartChineseAnalyzer: 我购买了道具和服装。
    want = ["我", "购买", "了", "道具", "和", "服装"]
    assert ZH_TOKENIZER.tokenize("我购买了道具和服装。")[0] == want
    assert (
        ZH_TOKENIZER.tokenize("我购买了道具和服装。 我购买了道具和服装。")[0]
        == want + want
    )


def test_oov_hanzi_unigrams():
    # smartcn OOV rule: unknown ideographs segment to single chars
    terms, _ = ZH_TOKENIZER.tokenize("魑魅魍魉")
    assert terms == ["魑", "魅", "魍", "魉"]


def test_hangul_unknown_groups():
    # unknown hangul runs group into one token
    terms, _ = KO_TOKENIZER.tokenize("꿰뚫었다")
    assert terms == ["꿰뚫었다"]


def test_pos_stop_holes():
    terms, pos = KO_TOKENIZER.tokenize(
        "화학 이외의 것", pos_stop=frozenset({"J"})
    )
    assert terms == ["화학", "이외", "것"]
    assert pos == [0, 1, 3]


def test_analyzer_dispatch_and_batch():
    assert tokenize("화학 이외의 것", analyzer={"ko": True})[0] == [
        "화학", "이외", "의", "것"
    ]
    assert tokenize("我购买了道具和服装。", analyzer={"zh": True})[0] == [
        "我", "购买", "了", "道具", "和", "服装"
    ]
    out = analyze_batch(
        pd.Series(["화학 이외의 것", "", None]), analyzer={"ko": True}
    )
    assert list(out["dl"]) == [4, 0, 0]
    out_zh = analyze_batch(
        pd.Series(["我购买了道具和服装。"]), analyzer={"zh": {}}
    )
    assert list(out_zh["terms"][0]) == [
        "我", "购买", "了", "道具", "和", "服装"
    ]
