"""Query-string parser -> plan-tree tests (pure Python, no Spark)."""

from __future__ import annotations

import pytest

from lucene_spark.search import plans as P
from lucene_spark.search.queryparser import parse


def test_single_term():
    assert parse("Hello") == P.TermQ("hello")


def test_default_or():
    q = parse("merge sort")
    assert q == P.BoolQ(should=(P.TermQ("merge"), P.TermQ("sort")))


def test_infix_and():
    q = parse("merge AND sort")
    assert q == P.BoolQ(must=(P.TermQ("merge"), P.TermQ("sort")))


def test_plus_minus():
    q = parse("+merge -sort hash")
    assert q == P.BoolQ(
        must=(P.TermQ("merge"),),
        should=(P.TermQ("hash"),),
        must_not=(P.TermQ("sort"),),
    )


def test_not_operator():
    q = parse("merge NOT sort")
    assert q == P.BoolQ(should=(P.TermQ("merge"),), must_not=(P.TermQ("sort"),))


def test_phrase_and_slop():
    assert parse('"apache license"') == P.PhraseQ(("apache", "license"))
    assert parse('"apache license"~3') == P.PhraseQ(("apache", "license"), slop=3)


def test_phrase_reanalyzed():
    # analyzer lowercases and splits punctuation, like index side
    assert parse('"Apache-License"') == P.PhraseQ(("apache", "license"))


def test_boost():
    q = parse("merge^2.5")
    assert q == P.BoostQ(P.TermQ("merge"), 2.5)


def test_fuzzy():
    assert parse("mergee~1") == P.FuzzyQ("mergee", max_edits=1)
    assert parse("mergee~") == P.FuzzyQ("mergee", max_edits=2)


def test_prefix_and_wildcard():
    assert parse("lic*") == P.PrefixQ("lic")
    assert parse("b?g") == P.WildcardQ("b?g")
    assert parse("l*e") == P.WildcardQ("l*e")


def test_ranges():
    assert parse("[aaa TO bbb]") == P.TermRangeQ("aaa", "bbb", True, True)
    assert parse("{aaa TO bbb}") == P.TermRangeQ("aaa", "bbb", False, False)


def test_compound():
    q = parse('+"data line"~1 merge^2 -lic* fuzz~1')
    assert q == P.BoolQ(
        must=(P.PhraseQ(("data", "line"), slop=1),),
        should=(P.BoostQ(P.TermQ("merge"), 2.0), P.FuzzyQ("fuzz", max_edits=1)),
        must_not=(P.PrefixQ("lic"),),
    )


def test_multi_token_atom_becomes_or():
    assert parse("foo-bar") == P.BoolQ(should=(P.TermQ("foo"), P.TermQ("bar")))


def test_garbage_raises():
    with pytest.raises(ValueError):
        parse('"unterminated')
