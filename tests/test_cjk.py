"""CJK analysis (analysis_cjk.py + the `cjk` analyzer-chain hook) —
width-fold vectors from CJKWidthFilter's tables, bigram semantics from
CJKBigramFilter (runs, lone singles, outputUnigrams overlap, stopword
holes breaking runs), and chain integration: tokenize/analyze_batch
parity, mixed-script docs, and e2e phrase behavior over bigrams."""

from __future__ import annotations

import pandas as pd

from lucene_spark.analysis import analyze_batch, tokenize
from lucene_spark.analysis_cjk import (
    cjk_bigrams,
    cjk_split,
    cjk_width_fold,
    is_cjk_char,
)

# --- width fold (CJKWidthFilter.java) --------------------------------------


def test_width_fullwidth_ascii():
    assert cjk_width_fold("Ｔｅｓｔ　１２３") == "Test　123"
    assert cjk_width_fold("ａｂｃ！") == "abc!"


def test_width_halfwidth_katakana():
    # ｶﾀｶﾅ -> カタカナ
    assert cjk_width_fold("ｶﾀｶﾅ") == "カタカナ"
    # voiced mark composes: ｶﾞ -> ガ, ﾊﾞ -> バ; half-voiced: ﾊﾟ -> パ
    assert cjk_width_fold("ｶﾞ") == "ガ"
    assert cjk_width_fold("ﾊﾞ") == "バ"
    assert cjk_width_fold("ﾊﾟ") == "パ"
    # mark with no composable predecessor falls back to combining char
    assert cjk_width_fold("ﾞ") == "゙"


# --- bigrams (CJKBigramFilter.java) ----------------------------------------


def test_bigram_run():
    t, p = cjk_bigrams(["日", "本", "語"], [0, 1, 2])
    assert t == ["日本", "本語"] and p == [0, 1]


def test_lone_single_emits_unigram():
    t, p = cjk_bigrams(["日"], [0])
    assert t == ["日"] and p == [0]
    t, p = cjk_bigrams(["abc", "日", "def"], [0, 1, 2])
    assert t == ["abc", "日", "def"] and p == [0, 1, 2]


def test_output_unigrams_overlap():
    t, p = cjk_bigrams(["日", "本", "語"], [0, 1, 2], output_unigrams=True)
    assert t == ["日", "日本", "本", "本語", "語"]
    assert p == [0, 0, 1, 1, 2]


def test_position_hole_breaks_run():
    # a stopword hole between the chars: no bigram across it
    t, p = cjk_bigrams(["日", "本"], [0, 2])
    assert t == ["日", "本"] and p == [0, 1]


def test_mixed_script_passthrough():
    t, p = cjk_bigrams(["hello", "日", "本", "world"], [0, 1, 2, 3])
    assert t == ["hello", "日本", "world"] and p == [0, 1, 2]


def test_hangul_and_kana_classes():
    assert is_cjk_char("한") and is_cjk_char("ひ") and is_cjk_char("カ")
    assert is_cjk_char("語") and not is_cjk_char("a") and not is_cjk_char("1")


# --- analyzer-chain integration --------------------------------------------

CJK = {"cjk": True}


def test_tokenize_cjk_chain():
    terms, positions = tokenize("Spark処理系のテスト", analyzer=CJK)
    assert terms == ["spark", "処理", "理系", "系の", "のテ", "テス", "スト"]
    assert positions == list(range(7))


def test_tokenize_width_fold_in_chain():
    # fullwidth latin + halfwidth katakana normalize before bigramming
    terms, _ = tokenize("Ｓｐａｒｋ ｶﾞｲﾄﾞ", analyzer=CJK)
    assert terms == ["spark", "ガイ", "イド"]


def test_batch_matches_tokenize():
    docs = [
        "日本語のテスト text",
        "Ｔｅｓｔ ｶﾞ 東京",
        "plain ascii only",
        "",
    ]
    got = analyze_batch(pd.Series(docs), analyzer=CJK)
    for i, d in enumerate(docs):
        t, p = tokenize(d, analyzer=CJK)
        assert list(got["terms"][i]) == t, d
        assert list(got["positions"][i]) == p, d


def test_batch_dl_counts_positions_not_overlaps():
    uni = {"cjk": "unigrams"}
    got = analyze_batch(pd.Series(["日本語"]), analyzer=uni)
    # unigrams at 3 positions, bigrams overlap (posIncr=0): dl = 3
    assert list(got["terms"][0]) == ["日", "日本", "本", "本語", "語"]
    assert got["dl"][0] == 3
    got2 = analyze_batch(pd.Series(["日本語"]), analyzer=CJK)
    assert got2["dl"][0] == 2  # two bigram positions


def test_cjk_with_stopwords():
    # ascii stopword removal leaves a hole that breaks the adjacent run
    terms, positions = tokenize(
        "日本 the 東京", analyzer={"cjk": True, "stopwords": ["the"]})
    assert terms == ["日本", "東京"]
    # positions stay dense after re-densify but the hole broke any
    # cross-gap bigram (日本/東京 pairs only within their own runs)
    assert len(positions) == 2
