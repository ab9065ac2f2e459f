"""Beider-Morse phonetic filter (analysis_beidermorse.py).

Reference vectors from
lucene/analysis/phonetic/src/test/.../TestBeiderMorseFilter.java.
"""

from __future__ import annotations

import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.analysis_beidermorse import PhoneticEngine, beider_morse_emitter


def test_basic_usage_vector():
    # TestBeiderMorseFilter.testBasicUsage (GENERIC, EXACT)
    e = PhoneticEngine("generic", "exact", True)
    assert e.encode("Angelo") == [
        "anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo"
    ]
    assert e.encode("D'Angelo") == [
        "anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo",
        "danZelo", "dandZelo", "dangelo", "danhelo", "danjelo", "danxelo",
    ]


def test_language_set_restriction():
    # TestBeiderMorseFilter.testLanguageSet
    e = PhoneticEngine("generic", "exact", True)
    got = e.encode("Angelo", frozenset({"italian", "greek", "spanish"}))
    assert got == ["andZelo", "angelo", "anxelo"]


def test_numbers_and_empty_pass_through():
    # TestBeiderMorseFilter.testNumbers / testEmptyTerm: the FILTER
    # passes tokens with no phonetic output through unchanged
    emit = beider_morse_emitter()
    assert emit("1234") == ("1234",)
    assert emit("") == ("",)
    assert emit("Angelo")[0] == "anZelo"


def test_approx_folds():
    e = PhoneticEngine("generic", "approx", True)
    got = e.encode("Angelo")
    assert "anZelo" in got and "andZelo" not in got  # dZ folded to Z


def test_language_pruning_drops_incompatible_paths():
    e = PhoneticEngine("generic", "exact", True)
    # 'cz' is polish-only; a following spanish-only branch must prune
    got = e.encode("czgel")  # g|[ei] branches constrained to polish
    # only language-compatible alternatives survive: g (any) — not
    # french Z / spanish x / italian dZ etc.
    assert got == ["tSgel"]


def test_invalid_config():
    with pytest.raises(ValueError):
        PhoneticEngine("ashkenazi")
    with pytest.raises(ValueError):
        PhoneticEngine("generic", "fuzzy")


def test_analyzer_chain_integration():
    terms, pos = tokenize(
        "angelo", analyzer={"phonetic": {"encoder": "beider_morse"}}
    )
    assert terms == [
        "anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo"
    ]
    assert pos == [0] * 6  # same-position stack
