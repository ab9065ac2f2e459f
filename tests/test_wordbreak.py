"""WordBreakSpellChecker (suggest/spell/WordBreakSpellChecker.java).

Break + combine suggestions over a purpose-built index, each checked
against a brute-force dictionary-df oracle computed independently in
Python (mirroring TestWordBreakSpellChecker's hand-verified cases)."""

import collections

import pandas as pd
import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.index import Index, build_index
from lucene_spark.search.wordbreak import (
    NUM_CHANGES_THEN_SUMMED_FREQUENCY,
    SEPARATOR_TERM,
    SUGGEST_ALWAYS,
    SUGGEST_MORE_POPULAR,
    SUGGEST_WHEN_NOT_IN_INDEX,
    WordBreakSpellChecker,
)

_TEXTS = [
    "the quick red fox jumps",  # doc roster chosen so dfs differ
    "the quick brown fox",
    "quick brown dog",
    "red dog barks",
    "fox den quick",
    "redfox sighting",  # compound present in the index
]


@pytest.fixture(scope="module")
def wb_index(spark, tmp_path_factory):
    pdf = pd.DataFrame({
        "doc_id": range(len(_TEXTS)),
        "content": _TEXTS,
    })
    idx_dir = str(tmp_path_factory.mktemp("wbidx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir, text_col="content",
        doc_id_col="doc_id", num_buckets=4, salt_rows=2048,
    )
    return Index(spark, idx_dir)


def _dfs():
    c = collections.Counter()
    for t in _TEXTS:
        c.update(set(tokenize(t)[0]))
    return c


def test_break_single_change(wb_index):
    wb = WordBreakSpellChecker(wb_index)
    sugs = wb.suggest_word_breaks("quickbrown", 5)
    assert len(sugs) == 1
    (a, b), = [tuple(w.string for w in s) for s in sugs]
    assert (a, b) == ("quick", "brown")
    dfs = _dfs()
    s = sugs[0]
    assert s[0].freq == dfs["quick"] and s[1].freq == dfs["brown"]
    assert all(w.score == 1 for w in s)


def test_break_two_changes_recursion(wb_index):
    # "thequickbrown": no 2-word split is fully valid, but the
    # recursion on the right part yields (the, quick, brown)
    wb = WordBreakSpellChecker(wb_index, max_changes=2)
    sugs = wb.suggest_word_breaks("thequickbrown", 5)
    shapes = [tuple(w.string for w in s) for s in sugs]
    assert ("the", "quick", "brown") in shapes
    three = sugs[shapes.index(("the", "quick", "brown"))]
    assert all(w.score == 2 for w in three)  # score = number of breaks


def test_break_term_in_index_suppressed(wb_index):
    wb = WordBreakSpellChecker(wb_index)
    # "redfox" IS in the index -> no suggestions in the default mode ...
    assert wb.suggest_word_breaks("redfox", 5) == []
    # ... but SUGGEST_ALWAYS still splits it
    sugs = wb.suggest_word_breaks("redfox", 5, suggest_mode=SUGGEST_ALWAYS)
    assert [tuple(w.string for w in s) for s in sugs] == [("red", "fox")]


def test_break_more_popular_threshold(wb_index):
    dfs = _dfs()
    wb = WordBreakSpellChecker(wb_index)
    # SUGGEST_MORE_POPULAR on an in-index term: components must each
    # reach the original's df ("redfox" df=1; red/fox dfs >= 1 pass)
    sugs = wb.suggest_word_breaks(
        "redfox", 5, suggest_mode=SUGGEST_MORE_POPULAR)
    assert [tuple(w.string for w in s) for s in sugs] == [("red", "fox")]
    assert dfs["red"] >= 1 and dfs["fox"] >= 1


def test_break_sort_methods(wb_index):
    # under maxChanges=2 both the 2-word and any 3-word suggestions
    # exist; fewer words always sorts first regardless of freq method
    wb = WordBreakSpellChecker(wb_index, max_changes=2)
    for method in (None, NUM_CHANGES_THEN_SUMMED_FREQUENCY):
        kw = {"sort_method": method} if method else {}
        sugs = wb.suggest_word_breaks("quickbrown", 5, **kw)
        assert [len(s) for s in sugs] == sorted(len(s) for s in sugs)


def test_min_break_word_length(wb_index):
    wb = WordBreakSpellChecker(wb_index, min_break_word_length=4)
    # valid split (red=3 chars) is below the floor -> nothing
    assert wb.suggest_word_breaks("redfoxx", 5) == []


def test_combine_basic(wb_index):
    wb = WordBreakSpellChecker(wb_index)
    # "redf" + "ox": "redf" unknown (minFreq==0 satisfied), combined
    # "redfox" df=1 -> one suggestion covering terms 0..1
    out = wb.suggest_word_combinations(["redf", "ox"], 5)
    assert len(out) == 1
    cs = out[0]
    assert cs.suggestion.string == "redfox"
    assert cs.original_term_indexes == (0, 1)
    assert cs.suggestion.freq == _dfs()["redfox"]
    assert cs.suggestion.score == 1  # combinations used


def test_combine_requires_missing_term_in_default_mode(wb_index):
    wb = WordBreakSpellChecker(wb_index)
    # both components in the index -> default mode suppresses
    assert wb.suggest_word_combinations(["red", "fox"], 5) == []
    # SUGGEST_ALWAYS emits it
    out = wb.suggest_word_combinations(["red", "fox"], 5,
                                       suggest_mode=SUGGEST_ALWAYS)
    assert [c.suggestion.string for c in out] == ["redfox"]


def test_combine_separator_blocks(wb_index):
    wb = WordBreakSpellChecker(wb_index)
    out = wb.suggest_word_combinations(
        ["redf", SEPARATOR_TERM, "ox"], 5, suggest_mode=SUGGEST_ALWAYS)
    assert out == []


def test_combine_max_changes_window(wb_index):
    # three-term combine needs max_changes >= 2
    wb1 = WordBreakSpellChecker(wb_index, max_changes=1)
    wb2 = WordBreakSpellChecker(wb_index, max_changes=2)
    terms = ["re", "df", "ox"]
    assert wb1.suggest_word_combinations(terms, 5) == []
    out = wb2.suggest_word_combinations(terms, 5)
    assert [c.suggestion.string for c in out] == ["redfox"]
    assert out[0].original_term_indexes == (0, 1, 2)
    assert out[0].suggestion.score == 2
