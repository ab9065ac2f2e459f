"""NGramTokenFilter / EdgeNGramTokenFilter analogs (analysis/ngram).

Reference semantics since 7.4: every gram sits at the source token's
position (posIncr=0 overlaps) with the whole-token offsets; dl/norms
discount the grams like synonym injections. Configured via the
``token_ngrams`` analyzer key.
"""

import pandas as pd
import pytest

from lucene_spark.analysis import analyze_batch, tokenize


def test_ngrams_all_positions_stacked():
    terms, pos = tokenize("abcd x", analyzer={"token_ngrams": {"min": 2, "max": 3}})
    assert terms == ["ab", "bc", "cd", "abc", "bcd", "x"]
    assert pos == [0, 0, 0, 0, 0, 1]


def test_edge_ngrams():
    terms, pos = tokenize(
        "abcd", analyzer={"token_ngrams": {"min": 2, "max": 3, "edge": True}}
    )
    assert terms == ["ab", "abc"]
    assert pos == [0, 0]


def test_preserve_original_no_duplicate():
    terms, _ = tokenize(
        "abc",
        analyzer={"token_ngrams": {"min": 2, "max": 3, "preserve_original": True}},
    )
    assert terms == ["abc", "ab", "bc"]


def test_short_token_passthrough():
    # documented deviation: shorter-than-min tokens pass through
    terms, _ = tokenize("a abcd", analyzer={"token_ngrams": {"min": 2, "max": 2}})
    assert terms == ["a", "ab", "bc", "cd"]


def test_dl_discounts_grams_and_batch_agrees():
    an = {"token_ngrams": {"min": 2, "max": 3}}
    df = analyze_batch(pd.Series(["abcd x", ""]), analyzer=an)
    assert df["dl"].tolist() == [2, 0]
    assert df["terms"].iloc[0] == tokenize("abcd x", analyzer=an)[0]


def test_composes_with_stemmer_chain():
    an = {"filters": ["porter_stem"], "token_ngrams": {"min": 3, "max": 3, "edge": True}}
    # porter stems "running" -> "run"; edge 3-grams of the STEM
    terms, _ = tokenize("running", analyzer=an)
    assert terms == ["run"]


def test_mutually_exclusive_with_phonetic():
    with pytest.raises(ValueError):
        tokenize("x", analyzer={"token_ngrams": {"min": 2}, "phonetic": "soundex"})


def test_bad_range_rejected():
    with pytest.raises(ValueError):
        tokenize("x", analyzer={"token_ngrams": {"min": 3, "max": 2}})
