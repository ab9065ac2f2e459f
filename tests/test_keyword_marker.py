"""KeywordMarkerFilter + StemmerOverrideFilter analogs.

Reference: ``analysis/miscellaneous/KeywordMarkerFilter.java`` (keyword-
marked tokens pass every stemmer untouched) and
``StemmerOverrideFilter.java:46`` (the override IS the output and sets
the keyword flag so downstream stemmers skip it). Configured via the
``keyword_marker`` / ``stem_overrides`` analyzer keys; pure-Python
tests over the chain.
"""

import pandas as pd

from lucene_spark.analysis import analyze_batch, tokenize

CHAIN = {
    "filters": ["porter_stem"],
    "keyword_marker": ["running"],
    "stem_overrides": {"flies": "fly"},
}


def test_keyword_marker_protects_from_stemmer():
    terms, _ = tokenize("running walked jumped", analyzer=CHAIN)
    assert terms == ["running", "walk", "jump"]


def test_stemmer_override_wins_over_chain():
    # porter would give "fli"; the override pins "fly" and skips porter
    terms, _ = tokenize("flies walked", analyzer=CHAIN)
    assert terms == ["fly", "walk"]


def test_overrides_without_any_stemmer():
    terms, _ = tokenize(
        "flies walked", analyzer={"stem_overrides": {"flies": "fly"}}
    )
    assert terms == ["fly", "walked"]


def test_batch_path_agrees_and_dl_unchanged():
    df = analyze_batch(pd.Series(["running walked flies", ""]), analyzer=CHAIN)
    assert df["terms"].iloc[0] == ["running", "walk", "fly"]
    assert df["dl"].tolist() == [3, 0]


def test_composes_with_synonyms_and_stop():
    chain = {
        **CHAIN,
        "stopwords": ["the"],
        "synonyms": {"fast": ["quick"]},
    }
    terms, pos = tokenize("the fast flies running", analyzer=chain)
    # fast keeps orig + injects quick (both stemmed; keyword/override
    # protection applies to injected forms too), flies overridden
    assert terms == ["fast", "quick", "fly", "running"]
    assert pos == [1, 1, 2, 3]
