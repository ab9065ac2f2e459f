"""Stream-level analysis filters: LengthFilter (drop + position holes),
FingerprintFilter (whole-stream collapse), CommonGramsFilter
(conditional bigrams) — vs the reference's own test streams."""

from __future__ import annotations

import pytest

from lucene_spark.analysis import analyze_batch, tokenize

import pandas as pd


def test_length_filter_holes():
    # LengthFilter(min=3, max=5): dropped tokens leave position holes
    # like StopFilter (FilteringTokenFilter posIncr semantics)
    terms, pos = tokenize(
        "ab abc abcdef xyz", analyzer={"length": {"min": 3, "max": 5}}
    )
    assert terms == ["abc", "xyz"]
    assert pos == [1, 3]


def test_length_filter_composes_with_stopwords():
    terms, pos = tokenize(
        "ab the abc xyz",
        analyzer={"length": {"min": 3, "max": 5}, "stopwords": ["xyz"]},
    )
    assert terms == ["the", "abc"]
    assert pos == [1, 2]


def test_length_filter_validation():
    with pytest.raises(ValueError):
        tokenize("x", analyzer={"length": {"min": 5, "max": 3}})


def test_fingerprint_reference_streams():
    # TestFingerprintFilter.java:26-70 (lowercased by our chain)
    def fpt(text, **cfg):
        return tokenize(text, analyzer={"fingerprint": cfg or True})[0]

    assert fpt("b a b e") == ["a b e"]
    assert fpt("b2 b2") == ["b2"]
    assert fpt("b2 a1 c3 d4 e5 f6 g7 h1", max_size=4) == []
    assert fpt("b2 a1 c3 b2", separator="_") == ["a1_b2_c3"]
    assert fpt("a1") == ["a1"]
    assert fpt("") == []


def test_fingerprint_batch_dl():
    out = analyze_batch(
        pd.Series(["b a b e", "x y", ""]),
        analyzer={"fingerprint": True},
    )
    assert list(out["terms"]) == [["a b e"], ["x y"], []]
    assert list(out["dl"]) == [1, 1, 0]
    assert list(out["positions"]) == [[0], [0], []]


def test_common_grams_reference_stream():
    # TestCommonGramsFilter.java:40-56: "How the s a brown s cow d like
    # A B thing?" with common words {the, s, a, d, of} — our chain
    # lowercases, bigrams ride posIncr=0 at the first member's position
    common = ["the", "s", "a", "d", "of"]
    terms, pos = tokenize(
        "how the s", analyzer={"common_grams": common}
    )
    by_pos = sorted(zip(pos, terms))
    assert by_pos == [
        (0, "how"), (0, "how_the"), (1, "the"), (1, "the_s"), (2, "s"),
    ]
    # no bigram between two non-common adjacent words
    terms, _ = tokenize(
        "brown cow of milk", analyzer={"common_grams": common}
    )
    assert "brown_cow" not in terms and "cow_of" in terms and "of_milk" in terms


def test_common_grams_batch_dl_unchanged():
    out = analyze_batch(
        pd.Series(["how the s a brown"]),
        analyzer={"common_grams": ["the", "s", "a"]},
    )
    # grams are posIncr=0 overlaps: dl counts unigrams only
    assert list(out["dl"]) == [5]
    assert "how_the" in out["terms"][0]


def test_char_filters():
    # MappingCharFilter: greedy longest-match at position (c++ vs c),
    # case-sensitive like NormalizeCharMap; PatternReplaceCharFilter:
    # regex substitution before the tokenizer
    cfg = {
        "char_filters": [
            {"type": "mapping", "map": {"&": " and ", "c++": "cpp"}},
            {"type": "pattern_replace", "pattern": "[0-9]+",
             "replacement": "N"},
        ]
    }
    terms, _ = tokenize("c++ & java 123", analyzer=cfg)
    assert terms == ["cpp", "and", "java", "n"]
    out = analyze_batch(pd.Series(["c++ & java 123", ""]), analyzer=cfg)
    assert list(out["terms"])[0] == ["cpp", "and", "java", "n"]
    assert list(out["dl"]) == [4, 0]
    # longest-match: key "ab" beats "a" at the same position
    cfg2 = {"char_filters": [{"type": "mapping",
                              "map": {"a": "x", "ab": "y"}}]}
    assert tokenize("ab a", analyzer=cfg2)[0] == ["y", "x"]
    with pytest.raises(ValueError):
        tokenize("x", analyzer={"char_filters": [{"type": "nope"}]})
    with pytest.raises(ValueError):
        analyze_batch(
            pd.Series(["x"]),
            analyzer={"char_filters": [
                {"type": "pattern_replace", "pattern": "x"}]},
            want_offsets=True,
        )


def test_exclusions():
    with pytest.raises(ValueError):
        tokenize("x", analyzer={"shingles": True, "common_grams": ["a"]})
    with pytest.raises(ValueError):
        tokenize("x", analyzer={"fingerprint": True, "shingles": True})
