"""Daitch-Mokotoff Soundex (analysis_dm.py) — verified against the
reference filter's own test streams
(TestDaitchMokotoffSoundexFilter.java:32-44) and the commons-codec
class's documented examples."""

from __future__ import annotations

from lucene_spark.analysis_dm import dm_encode, dm_soundex
from lucene_spark.analysis_phonetic import PHONETIC_FILTERS, phonetic_emitter


def _stream(text: str, inject: bool) -> list[str]:
    emit = phonetic_emitter({"encoder": "daitch_mokotoff", "inject": inject})
    out: list[str] = []
    for tok in text.split():
        out.extend(emit(tok))
    return out


def test_filter_stream_inject():
    # TestDaitchMokotoffSoundexFilter.testAlgorithms (inject=true)
    assert _stream("aaa bbb ccc easgasg", True) == [
        "aaa", "000000", "bbb", "700000", "ccc", "400000", "450000",
        "454000", "540000", "545000", "500000", "easgasg", "045450",
    ]


def test_filter_stream_replace():
    # TestDaitchMokotoffSoundexFilter.testAlgorithms (inject=false)
    assert _stream("aaa bbb ccc easgasg", False) == [
        "000000", "700000", "400000", "450000", "454000", "540000",
        "545000", "500000", "045450",
    ]


def test_empty_term_passthrough():
    assert _stream("", True) == [] and phonetic_emitter(
        {"encoder": "daitch_mokotoff"}
    )("") == ("",)


def test_published_examples():
    # the standard published D-M example: Peters branches on rs
    assert dm_soundex("Peters") == ("734000", "739400")
    # the m/n force-append rule: adjacent m+n keep both 6s
    assert dm_soundex("mn")[0].startswith("66")
    # vowel separation resets the same-code fold: s-a-s codes s twice
    # (non-initial vowels code to nothing but reset the fold memory)
    assert dm_encode("sasa") == "440000"
    # adjacent identical codes fold: "ss" codes once
    assert dm_encode("ss") == "400000"
    # digit-only input: no rules fire, the empty branch pads to 000000
    # (commons-codec behavior; the DM filter has no non-encodable
    # passthrough, unlike PhoneticFilter)
    assert dm_encode("12345") == "000000"


def test_branching_vs_encode():
    codes = dm_soundex("ckc")
    assert dm_encode("ckc") == codes[0]
    assert len(set(codes)) == len(codes)
    for c in codes:
        assert len(c) == 6 and c.isdigit()


def test_registry_replace_filter():
    fn = PHONETIC_FILTERS["phonetic_daitch_mokotoff"]
    assert fn("bbb") == "700000"


def test_foldings():
    # ß folds to s, accented vowels to bare vowels
    assert dm_encode("straße") == dm_encode("strase")
    assert dm_encode("café") == dm_encode("cafe")
