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


# --- round-2 grammar: field scoping, parentheses, escaping ---------------

def test_field_scoped_term():
    assert parse("head:data") == P.TermQ("data", field="head")


def test_field_scoped_group():
    q = parse("head:(vector OR data)")
    assert q == P.BoolQ(
        should=(P.TermQ("vector", field="head"), P.TermQ("data", field="head"))
    )


def test_parens_grouping():
    q = parse("(a AND b) OR (c AND d)")
    assert isinstance(q, P.BoolQ) and len(q.should) == 2
    assert all(isinstance(c, P.BoolQ) and len(c.must) == 2 for c in q.should)


def test_mixed_field_parens_phrase():
    q = parse('head:data AND (merge OR sort) -"data line"')
    assert q.must[0] == P.TermQ("data", field="head")
    assert isinstance(q.must[1], P.BoolQ)
    assert q.must_not == (P.PhraseQ(("data", "line")),)


def test_escaped_colon_not_a_field():
    q = parse(r"foo\:bar")
    # escaped colon: no field; analyzer then splits on the colon (same
    # as the reference: escape defeats the grammar, not the analyzer)
    assert q == P.BoolQ(should=(P.TermQ("foo"), P.TermQ("bar")))


def test_escaped_parens_literal():
    q = parse(r"\(merge\)")
    assert q == P.TermQ("merge")


def test_field_wildcard_and_fuzzy():
    q = parse("head:qu?ck body~1")
    assert q.should[0] == P.WildcardQ("qu?ck", field="head")
    f = q.should[1]
    assert f.term == "body" and f.max_edits == 1 and f.field is None


def test_unbalanced_paren_raises():
    import pytest as _pt
    with _pt.raises(ValueError):
        parse("(a AND b")
    with _pt.raises(ValueError):
        parse("a) b")
