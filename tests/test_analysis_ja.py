"""Japanese morphological analysis (analysis_ja.py, kuromoji analog).

Reference test vectors from
lucene/analysis/kuromoji/src/test/.../TestJapaneseTokenizer.java for
sentences fully covered by the vendored lexicon; plus unknown-word
class behavior, the filter chain, and the synthetic-corpus
segmentation-recovery property that backs the ja_term_topk gate.
"""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_spark.analysis import analyze_batch, tokenize
from lucene_spark.analysis_ja import (
    JA_DEFAULT_POS_STOP,
    iteration_mark_expand,
    ja_analyze_batch,
    ja_tokenize,
    katakana_stem,
)


# --- reference segmentation vectors (TestJapaneseTokenizer) ----------------

@pytest.mark.parametrize(
    "text,want",
    [
        # testDecomposition2 (:266)
        (
            "麻薬の密売は根こそぎ絶やさなければならない",
            ["麻薬", "の", "密売", "は", "根こそぎ", "絶やさ",
             "なけれ", "ば", "なら", "ない"],
        ),
        # testDecomposition4 (:282) — analyzer keeps punctuation out
        ("これは本ではない", ["これ", "は", "本", "で", "は", "ない"]),
        # testSegmentation (:534), punctuation discarded
        (
            "スペースステーションに行きます。うたがわしい。",
            ["スペース", "ステーション", "に", "行き", "ます",
             "うたがわしい"],
        ),
    ],
)
def test_reference_vectors(text, want):
    got, pos = ja_tokenize(text, {"mode": "search"})
    assert got == want
    assert pos == list(range(len(want)))


def test_surrogate_kanji_unigrams():
    # TestJapaneseTokenizer:409 — out-of-vocabulary kanji (incl.
    # supplementary-plane) segment to single-char tokens
    got, _ = ja_tokenize("𩬅艱鍟䇹愯瀛")
    assert got == ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]


def test_katakana_unknown_groups():
    # unknown katakana runs group into one token (char.def KATAKANA
    # GROUP=1), NORMAL and SEARCH alike when no dictionary split exists
    for mode in ("normal", "search"):
        got, _ = ja_tokenize("シニアソフトウエアエンジニヤ", {"mode": mode})
        assert got == ["シニアソフトウエアエンジニヤ"]


def test_dictionary_beats_grouped_unknown():
    # スペース + ステーション are lexicon entries: the grouped unknown
    # run must lose to the dictionary split
    got, _ = ja_tokenize("スペースステーション")
    assert got == ["スペース", "ステーション"]


def test_punctuation_kept_when_configured():
    got, _ = ja_tokenize(
        "これは本ではない。", {"discard_punctuation": False}
    )
    assert got[-1] == "。"


def test_base_form_filter():
    # JapaneseBaseFormFilter.java:33 — inflected surfaces map to base
    got, _ = ja_tokenize("行きます", {"base_form": True})
    assert got == ["行く", "ます"]
    got2, _ = ja_tokenize("絶やさなければ", {"base_form": True})
    assert got2[0] == "絶やす"


def test_pos_stop_leaves_holes():
    # JapanesePartOfSpeechStopFilter: particles dropped, positions keep
    # counting (FilteringTokenFilter semantics)
    terms, pos = ja_tokenize(
        "データを検索", {"pos_stop": ["助詞"]}
    )
    assert terms == ["データ", "検索"]
    assert pos == [0, 2]


def test_default_pos_stop_set():
    terms, _ = ja_tokenize(
        "これは本ではない", {"pos_stop": sorted(JA_DEFAULT_POS_STOP)}
    )
    # particles (は) and auxiliaries (で/ない) dropped; pronoun + noun stay
    assert terms == ["これ", "本"]


def test_katakana_stem_filter():
    # JapaneseKatakanaStemFilter.java:39 — trailing ー stripped at len>=4
    assert katakana_stem("コンピューター") == "コンピュータ"
    assert katakana_stem("タクシー") == "タクシ"
    assert katakana_stem("カー") == "カー"  # too short
    assert katakana_stem("merge") == "merge"  # not katakana
    terms, _ = ja_tokenize("タクシー", {"katakana_stem": True})
    assert terms == ["タクシ"]


def test_iteration_marks():
    # JapaneseIterationMarkCharFilter.java:47-57
    assert iteration_mark_expand("時々") == "時時"
    assert iteration_mark_expand("こゝ") == "ここ"
    assert iteration_mark_expand("こゞ") == "こご"
    assert iteration_mark_expand("ばゝ") == "ばは"  # unvoiced copy
    assert iteration_mark_expand("馬鹿々々しい") == "馬鹿馬鹿しい"
    assert iteration_mark_expand("サヽ") == "ササ"
    assert iteration_mark_expand("サヾ") == "サザ"
    # length-preserving (char filter contract)
    for s in ("時々", "馬鹿々々しい", "こゞ"):
        assert len(iteration_mark_expand(s)) == len(s)
    terms, _ = ja_tokenize("時々", {"iteration_marks": True})
    assert terms == ["時時"] or terms == ["時", "時"]


def test_mixed_scripts_and_whitespace():
    terms, pos = ja_tokenize("abc 123 データ")
    assert terms == ["abc", "123", "データ"]
    assert pos == [0, 1, 2]
    # latin lowercased (LowerCaseFilter tail)
    terms2, _ = ja_tokenize("ABC データ")
    assert terms2 == ["abc", "データ"]


def test_empty_and_null():
    assert ja_tokenize("", None) == ([], [])
    out = ja_analyze_batch(pd.Series(["", None, "データ"]))
    assert list(out["dl"]) == [0, 0, 1]


def test_analyzer_config_dispatch():
    # the {"ja": ...} analyzer key routes tokenize/analyze_batch
    terms, _ = tokenize("これは本ではない", analyzer={"ja": {}})
    assert terms == ["これ", "は", "本", "で", "は", "ない"]
    out = analyze_batch(
        pd.Series(["麻薬の密売", "データを検索"]),
        analyzer={"ja": {"mode": "search"}},
    )
    assert list(out["terms"][0]) == ["麻薬", "の", "密売"]
    assert list(out["dl"]) == [3, 3]
    assert (out["norm"] >= 0).all()


def test_offsets_rejected():
    with pytest.raises(ValueError):
        analyze_batch(
            pd.Series(["データ"]), analyzer={"ja": {}}, want_offsets=True
        )


def test_corpus_segmentation_recovery():
    # the ja_term_topk gate's soundness: for the synthetic noun+particle
    # corpus the Viterbi least-cost path IS the generated segmentation
    from __spark_entry__ import _ja_units

    for d in range(0, 50000, 7):
        want = _ja_units(d)
        got, _ = ja_tokenize("".join(want), {"mode": "search"})
        assert got == want, d
