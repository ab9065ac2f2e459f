"""Misc filter zoo (analysis_misc.py) vs the reference's own test
streams: TestElision, TestApostropheFilter, TestDecimalDigitFilter,
TestScandinavianNormalizationFilter, TestScandinavianFoldingFilter,
TestGermanNormalizationFilter, TestCapitalizationFilter."""

from __future__ import annotations

import pytest

from lucene_spark.analysis import _resolve_filter, tokenize
from lucene_spark.analysis_misc import (
    apostrophe,
    capitalization,
    decimal_digit,
    elision,
    german_normalize,
    scandinavian_fold,
    scandinavian_normalize,
    truncate,
)


def test_elision():
    # TestElision.java: "l'avion" -> "avion" etc.; the apostrophe may
    # be U+2019; non-article prefixes keep the token
    assert elision("l'avion") == "avion"
    assert elision("d'avion") == "avion"
    assert elision("j’aime") == "aime"
    assert elision("qu'il") == "il"
    assert elision("jusqu'à") == "à"
    assert elision("aujourd'hui") == "aujourd'hui"  # not an article
    assert elision("avion") == "avion"
    assert elision("") == ""


def test_apostrophe():
    # TestApostropheFilter.java:28: Türkiye'de 2003'te Van Gölü'nü
    # gördüm -> türkiye 2003 van gölü gördüm (after lowercase)
    toks = ["türkiye'de", "2003'te", "van", "gölü'nü", "gördüm"]
    assert [apostrophe(t) for t in toks] == [
        "türkiye", "2003", "van", "gölü", "gördüm",
    ]
    assert apostrophe("a’b") == "a"
    assert apostrophe("'x") == ""


def test_decimal_digit():
    # TestDecimalDigitFilter.java:85: Arabic-Indic digits
    assert decimal_digit("١٢٣٤") == "1234"
    assert decimal_digit("١٢٣٤") == "1234"
    assert decimal_digit("abc123") == "abc123"
    # Devanagari digits
    assert decimal_digit("१०") == "10"
    # non-digit non-latin chars pass
    assert decimal_digit("ä٣b") == "ä3b"


# TestScandinavianNormalizationFilter.java:51-106
_SN_VECTORS = [
    ("aeäaeeea", "æææeea"), ("aeäaeeeae", "æææeeæ"), ("aeaeeeae", "ææeeæ"),
    ("bøen", "bøen"), ("bOEen", "bØen"), ("åene", "åene"),
    ("blåbærsyltetøj", "blåbærsyltetøj"),
    ("blaabaersyltetöj", "blåbærsyltetøj"),
    ("räksmörgås", "ræksmørgås"), ("raeksmörgaos", "ræksmørgås"),
    ("raeksmörgaas", "ræksmørgås"), ("raeksmoergås", "ræksmørgås"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "å"), ("aa", "å"), ("aA", "å"), ("ao", "å"), ("aO", "å"),
    ("AA", "Å"), ("Aa", "Å"), ("Ao", "Å"), ("AO", "Å"),
    ("æ", "æ"), ("ä", "æ"), ("Æ", "Æ"), ("Ä", "Æ"),
    ("ae", "æ"), ("aE", "æ"), ("Ae", "Æ"), ("AE", "Æ"),
    ("ö", "ø"), ("ø", "ø"), ("Ö", "Ø"), ("Ø", "Ø"),
    ("oo", "ø"), ("oe", "ø"), ("oO", "ø"), ("oE", "ø"),
    ("Oo", "Ø"), ("Oe", "Ø"), ("OO", "Ø"), ("OE", "Ø"),
    ("", ""),
]

# TestScandinavianFoldingFilter.java:51-125
_SF_VECTORS = [
    ("aeäaeeea", "aaaeea"), ("aeäaeeeae", "aaaeea"), ("aeaeeeae", "aaeea"),
    ("bøen", "boen"), ("åene", "aene"),
    ("blåbærsyltetøj", "blabarsyltetoj"),
    ("blaabaarsyltetoej", "blabarsyltetoj"),
    ("blåbärsyltetöj", "blabarsyltetoj"),
    ("raksmorgas", "raksmorgas"), ("räksmörgås", "raksmorgas"),
    ("ræksmørgås", "raksmorgas"), ("raeksmoergaas", "raksmorgas"),
    ("ræksmörgaos", "raksmorgas"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "a"), ("aa", "a"), ("aA", "a"), ("ao", "a"), ("aO", "a"),
    ("AA", "A"), ("Aa", "A"), ("Ao", "A"), ("AO", "A"),
    ("æ", "a"), ("ä", "a"), ("Æ", "A"), ("Ä", "A"),
    ("ae", "a"), ("aE", "a"), ("Ae", "A"), ("AE", "A"),
    ("ö", "o"), ("ø", "o"), ("Ö", "O"), ("Ø", "O"),
    ("oo", "o"), ("oe", "o"), ("oO", "o"), ("oE", "o"),
    ("Oo", "O"), ("Oe", "O"), ("OO", "O"), ("OE", "O"),
    ("", ""),
]


def test_scandinavian_normalization_reference_vectors():
    bad = [
        (i, w, scandinavian_normalize(i))
        for i, w in _SN_VECTORS
        if scandinavian_normalize(i) != w
    ]
    assert not bad, bad


def test_scandinavian_folding_reference_vectors():
    bad = [
        (i, w, scandinavian_fold(i))
        for i, w in _SF_VECTORS
        if scandinavian_fold(i) != w
    ]
    assert not bad, bad


def test_german_normalization():
    # TestGermanNormalizationFilter.java:53-81
    assert german_normalize("schaltflächen") == "schaltflachen"
    assert german_normalize("schaltflaechen") == "schaltflachen"
    assert german_normalize("dauer") == "dauer"
    assert german_normalize("weißbier") == "weissbier"
    assert german_normalize("") == ""


def test_capitalization_and_truncate():
    assert capitalization("kiTTEN") == "Kitten"
    assert capitalization("") == ""
    assert truncate("abcdefg", 5) == "abcde"
    assert truncate("abc", 5) == "abc"


def test_dynamic_truncate_and_registry():
    fn = _resolve_filter("truncate_5")
    assert fn("prefixes") == "prefi"
    assert _resolve_filter("elision") is elision
    with pytest.raises(KeyError):
        _resolve_filter("no_such_filter")
    with pytest.raises(ValueError):
        _resolve_filter("truncate_0")


def test_chain_through_tokenize():
    # filters compose in the analyzer chain (post-lowercase)
    terms, _ = tokenize(
        "l'avion vole", analyzer={"filters": ["elision"]}
    )
    assert terms == ["avion", "vole"]
    # the uax29 default keeps x'y single-token (like StandardTokenizer),
    # so the apostrophe filter sees the whole token
    terms, _ = tokenize(
        "turkiye'de gordum", analyzer={"filters": ["apostrophe"]}
    )
    assert terms == ["turkiye", "gordum"]
    terms, _ = tokenize(
        "blaabaersyltetöj",
        analyzer={
            "tokenizer": "unicode",
            "filters": ["scandinavian_normalize"],
        },
    )
    assert terms == ["blåbærsyltetøj"]
    terms, _ = tokenize(
        "identifier tokens", analyzer={"filters": ["truncate_5"]}
    )
    assert terms == ["ident", "token"]
