"""SimpleQueryParser (queryparser/simple/SimpleQueryParser.java) — the
degradation-not-exception syntax. Cases mirror TestSimpleQueryParser's
hand-verified trees."""

from lucene_spark.search import plans as P
from lucene_spark.search.simpleparser import (
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    WHITESPACE_OPERATOR,
    SimpleQueryParser,
)


def _p(text, **kw):
    return SimpleQueryParser(**kw).parse(text)


def test_match_all_star():
    assert _p("*") == P.MatchAllQ()
    assert _p("  *  ") == P.MatchAllQ()


def test_empty_is_no_docs():
    assert _p("") is None
    assert _p("   ") is None


def test_default_or_and_explicit_ops():
    q = _p("foo bar")
    assert isinstance(q, P.BoolQ) and len(q.should) == 2 and not q.must
    q = _p("foo + bar")
    assert len(q.must) == 2 and not q.should
    q = _p("foo | bar")
    assert len(q.should) == 2
    # default operator MUST
    q = _p("foo bar", default_operator="must")
    assert len(q.must) == 2


def test_not_wraps_with_match_all():
    q = _p("-foo")
    assert isinstance(q, P.BoolQ)
    assert q.must_not == (P.TermQ("foo"),)
    assert q.should == (P.MatchAllQ(),)
    # double negation cancels (state.not % 2)
    assert _p("--foo") == P.TermQ("foo")


def test_phrase_near_prefix_fuzzy():
    q = _p('"quick brown"~2')
    assert isinstance(q, P.PhraseQ) and q.slop == 2
    q = _p("ser*")
    assert q == P.PrefixQ("ser")
    q = _p("merg~1")
    assert isinstance(q, P.FuzzyQ) and q.max_edits == 1
    # bare ~ = 2 edits; capped at 2; ~0 degrades to a term
    assert _p("foo~").max_edits == 2
    assert _p("foo~9").max_edits == 2
    assert _p("foo~0") == P.TermQ("foo")


def test_precedence_quirk_matches_reference():
    # (a | b) + c: OR subtree becomes one MUST clause of the new parent
    q = _p("(foo | bar) + baz")
    assert isinstance(q, P.BoolQ) and len(q.must) == 2 and not q.should
    sub, term = q.must
    assert isinstance(sub, P.BoolQ) and len(sub.should) == 2
    assert term == P.TermQ("baz")
    # operation change wraps the running tree (a + b | c)
    q = _p("a + b | c")
    assert isinstance(q, P.BoolQ) and len(q.should) == 2
    assert isinstance(q.should[0], P.BoolQ) and len(q.should[0].must) == 2


def test_degradation_never_raises():
    # unterminated quote: the quote is extraneous, terms still parse
    q = _p('un"closed')
    assert isinstance(q, P.BoolQ) and len(q.should) == 2
    # unbalanced paren ignored
    q = _p("(foo bar")
    assert isinstance(q, P.BoolQ) and len(q.should) == 2
    # empty group resets the pending op
    assert _p("() foo") == P.TermQ("foo")
    # escape keeps the operator literal (analyzer then strips it)
    assert _p(r"foo\+bar") is not None


def test_flags_disable_operators():
    # only whitespace enabled: +,",* are literal text for the analyzer
    q = _p('a+b "c', flags=WHITESPACE_OPERATOR)
    assert isinstance(q, P.BoolQ) and len(q.should) == 2
    # phrase+precedence only: '-' is literal, never a NOT
    q = _p("-foo", flags=PHRASE_OPERATOR | PRECEDENCE_OPERATORS | WHITESPACE_OPERATOR)
    assert q == P.TermQ("foo")  # analyzer drops the dash


def test_multi_field_weights():
    q = _p("data", fields={"title": 2.0, None: 1.0})
    assert isinstance(q, P.BoolQ) and len(q.should) == 2
    boosted = [c for c in q.should if isinstance(c, P.BoostQ)]
    assert boosted and boosted[0].boost == 2.0
    assert boosted[0].inner == P.TermQ("data", field="title")
