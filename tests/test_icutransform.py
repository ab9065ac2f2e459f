"""ICUTransformFilter analog (analysis_icutransform.py).

Every vector from
lucene/analysis/icu/src/test/.../TestICUTransformFilter.java.
"""

from __future__ import annotations

import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.analysis_icutransform import from_rules, get_transliterator


@pytest.mark.parametrize(
    "tid,inp,want",
    [
        # testBasicFunctionality (:34-43)
        ("Traditional-Simplified", "簡化字", "简化字"),
        ("Katakana-Hiragana", "ヒラガナ", "ひらがな"),
        ("Fullwidth-Halfwidth", "アルアノリウ", "ｱﾙｱﾉﾘｳ"),
        ("Any-Latin", "Αλφαβητικός Κατάλογος", "Alphabētikós Katálogos"),
        (
            "NFD; [:Nonspacing Mark:] Remove",
            "Alphabētikós Katálogos",
            "Alphabetikos Katalogos",
        ),
        ("Han-Latin", "中国", "zhōng guó"),
        # testOptimizerCompound (:70)
        ("Traditional-Simplified; CaseFold", "ABCDE", "abcde"),
    ],
)
def test_system_transforms(tid, inp, want):
    assert get_transliterator(tid)(inp) == want


def test_custom_rules():
    # testCustomFunctionality (:46): replacements are not rescanned
    assert from_rules("a > b; b > c;")("abacadaba") == "bcbcbdbcb"
    # testCustomFunctionality2 (:55): left context
    assert from_rules("c { a > b; a > d;")("caa") == "cbd"


def test_rule_escapes_and_contexts():
    # testOptimizerSurrogate (:74): \U escape for a supplementary char
    assert from_rules("\\U00020087 > x;")("\U00020087y") == "xy"
    # right context
    assert from_rules("a } b > x;")("ab ac") == "xb ac"


def test_cyrillic_subset():
    assert get_transliterator("Any-Latin")("Москва") == "Moskva"


def test_unknown_transform_raises():
    with pytest.raises(KeyError):
        get_transliterator("Hangul-Latin")


def test_filter_chain_integration():
    # dynamic registry name: the transform applies per token
    terms, _ = tokenize(
        "Αλφαβητικός", analyzer={
            "tokenizer": "unicode",
            "filters": ["icu_transform:Any-Latin; NFD; "
                        "[:Nonspacing Mark:] Remove"],
        },
    )
    assert terms == ["alphabetikos"]
