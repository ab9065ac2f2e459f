"""Stempel / Egothor stemmer (analysis_stempel.py) — patch-command
interpreter vectors, serialized-table loader round-trip, and (when the
reference's Apache-licensed Polish table is on disk as the
user-supplied table) the reference's own PolishAnalyzer vectors
(TestPolishAnalyzer.java: studenta/studenci -> student, stopword and
exclusion behavior).
"""

import os
import struct

import pandas as pd
import pytest

from lucene_spark.analysis import analyze_batch
from lucene_spark.analysis_stempel import (
    StempelStemmer,
    diff_apply,
    load_stemmer_table,
    load_stopwords,
    polish_analyzer,
    stempel_dynamic,
)

_PL_DIR = (
    "/root/reference/lucene/analysis/stempel/src/resources/org/apache/"
    "lucene/analysis/pl"
)
_TBL = os.path.join(_PL_DIR, "stemmer_20000.tbl")
_STOP = os.path.join(_PL_DIR, "stopwords.txt")

needs_table = pytest.mark.skipif(
    not os.path.exists(_TBL), reason="no user-supplied Polish table"
)


# ---------------------------------------------------------------------------
# Diff.apply (Diff.java:103)
# ---------------------------------------------------------------------------


def test_diff_apply_delete():
    # Diff.java class doc: patch "Db" reduces teacher -> teach
    assert diff_apply("teacher", "Db") == "teach"


def test_diff_apply_replace_insert_skip():
    # '-a' skips one char, 'Rx' replaces at cursor, 'Ia' inserts after
    assert diff_apply("abcd", "Ra") == "abca"          # replace last
    assert diff_apply("abcd", "-aRx") == "abxd"        # skip 1, replace
    assert diff_apply("abc", "Da") == "ab"             # delete last
    assert diff_apply("", "Db") == ""                  # empty in, empty out
    assert diff_apply("abc", None) == "abc"


def test_diff_apply_swallows_overrun():
    # reference swallows StringIndexOutOfBounds mid-patch, keeping the
    # edits applied so far (Diff.java:143-147)
    assert diff_apply("ab", "DbDbDb") == ""


# ---------------------------------------------------------------------------
# Loader round-trip on a hand-serialized miniature table (plain Trie)
# ---------------------------------------------------------------------------


def _utf(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def _mini_trie_bytes() -> bytes:
    # method "0" (no 'M') -> plain Trie; reversed walk (forward=False)
    # one root row: 'a' -> cmd 0 ("Da"), no ref
    out = [_utf("0")]
    out.append(b"\x00")                      # forward = False
    out.append(struct.pack(">i", 0))         # root row id
    out.append(struct.pack(">i", 1))         # n cmds
    out.append(_utf("Da"))
    out.append(struct.pack(">i", 1))         # n rows
    out.append(struct.pack(">i", 1))         # row: n cells
    out.append(struct.pack(">H", ord("a")))  # cell char
    out.append(struct.pack(">iiii", 0, 1, -1, 0))  # cmd, cnt, ref, skip
    return b"".join(out)


def test_loader_roundtrip_mini_trie(tmp_path):
    p = tmp_path / "mini.tbl"
    p.write_bytes(_mini_trie_bytes())
    t = load_stemmer_table(str(p))
    # reversed walk: last char 'a' hits the cell -> command "Da"
    assert t.get_last_on_path("a") == "Da"
    s = StempelStemmer(t)
    assert s.stem("banana") == "banan"   # delete trailing 'a'
    assert s.stem("xyz") is None         # no path -> no patch


# ---------------------------------------------------------------------------
# Reference Polish table (user-supplied data)
# ---------------------------------------------------------------------------


@needs_table
def test_reference_vectors():
    s = StempelStemmer(load_stemmer_table(_TBL))
    # TestPolishAnalyzer.testBasics
    assert s.stem("studenta") == "student"
    assert s.stem("studenci") == "student"


@needs_table
def test_filter_min_length_and_passthrough():
    fn = stempel_dynamic(f"stempel:{_TBL}")
    assert fn("studenta") == "student"
    # length <= 3 passes through un-stemmed (StempelFilter.java:69)
    assert fn("abc") == "abc"


@needs_table
def test_polish_analyzer_chain():
    stop = load_stopwords(_STOP)
    assert "był" in stop or len(stop) > 100
    conf = polish_analyzer(_TBL, stopwords=stop + ["był"])
    an = analyze_batch(
        pd.Series(["studenta był studenci"]), analyzer=conf
    )
    terms = list(an["terms"].iloc[0])
    poss = list(an["positions"].iloc[0])
    assert terms == ["student", "student"]
    # the stopword leaves a position hole
    assert poss == [0, 2]


@needs_table
def test_polish_analyzer_exclusions():
    # TestPolishAnalyzer.testExclude: excluded surface form unstemmed,
    # others still stem
    conf = polish_analyzer(_TBL, stem_exclusions=["studenta"])
    an = analyze_batch(pd.Series(["studenta studenci"]), analyzer=conf)
    assert list(an["terms"].iloc[0]) == ["studenta", "student"]
