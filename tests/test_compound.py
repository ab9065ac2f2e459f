"""DictionaryCompoundWordTokenFilter vectors from the reference test
(analysis/compound/TestCompoundWordTokenFilter.java), through the
analyzer `compound` expansion slot (originals kept, subwords posIncr=0)."""

import pytest

from lucene_spark.analysis import analyze_batch, compound_emitter, tokenize

import pandas as pd

SE_DICT = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
           "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
           "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad"]


def _emit(dic, text, **kw):
    return list(compound_emitter({"dictionary": dic, **kw})(text))


def test_se_vectors():
    # per-token emissions of testDumbCompoundWordsSE (chain-lowercased)
    assert _emit(SE_DICT, "bildörr") == ["bildörr", "bil", "dörr"]
    assert _emit(SE_DICT, "bilmotor") == ["bilmotor", "bil", "motor"]
    assert _emit(SE_DICT, "slagborr") == ["slagborr", "slag", "borr"]
    assert _emit(SE_DICT, "glasögonfodral") == [
        "glasögonfodral", "glas", "ögon", "fodral"]
    assert _emit(SE_DICT, "basfiolsfodral") == [
        "basfiolsfodral", "bas", "fiol", "fodral"]
    assert _emit(SE_DICT, "skomakare") == ["skomakare", "sko", "makare"]
    assert _emit(SE_DICT, "vindrutetorkare") == [
        "vindrutetorkare", "vind", "rute", "torkare"]
    # shorter than minWordSize (5): passes through whole
    assert _emit(SE_DICT, "abba") == ["abba"]


def test_longest_match():
    # testDumbCompoundWordsSELongestMatch: 'fiols' beats 'fiol'
    dic = SE_DICT + ["Fiols"]
    assert _emit(dic, "basfiolsfodral", only_longest=True) == [
        "basfiolsfodral", "bas", "fiols", "fodral"]


def test_min_subword_length():
    # testWordComponentWithLessThanMinimumLength: 'd' (< minSubword 2)
    # never emits
    assert _emit(["abc", "d", "efg"], "abcdefg") == ["abcdefg", "abc", "efg"]


def test_token_min_word_size_boundary():
    # exactly minWordSize decomposes ("abcdef" with min_word default 5)
    assert _emit(["ab", "cd", "ef"], "abcdef") == ["abcdef", "ab", "cd", "ef"]


def test_bad_config():
    with pytest.raises(ValueError):
        compound_emitter({"dictionary": []})
    with pytest.raises(ValueError):
        compound_emitter({"dictionary": ["ab"], "min_subword": 3,
                          "max_subword": 2})
    with pytest.raises(ValueError):
        tokenize("x", analyzer={"compound": {"dictionary": ["ab"]},
                                "token_ngrams": {"min": 2, "max": 3}})


def test_through_tokenize_positions():
    terms, positions = tokenize(
        "bildörr abba",
        analyzer={"tokenizer": "unicode",
                  "compound": {"dictionary": SE_DICT}},
    )
    assert terms == ["bildörr", "bil", "dörr", "abba"]
    # subwords overlap the source position
    assert positions == [0, 0, 0, 1]


def test_analyze_batch_dl_discounts_subwords():
    df = analyze_batch(
        pd.Series(["bildörr abba"]),
        analyzer={"tokenizer": "unicode",
                  "compound": {"dictionary": SE_DICT}},
    )
    # dl counts source tokens only (posIncr=0 injections discounted)
    assert list(df["dl"]) == [2]
    assert list(df["terms"]) == [["bildörr", "bil", "dörr", "abba"]]
