"""Surround query-language parser (search/surround.py) — grammar
shapes (infix + prefix ops, precedence, fields, weights), distance
lowering (nW/nN -> SpanNearQ slop=n-1), truncation expansion inside
W/N via the term dictionary, error modes, and e2e equivalence with
hand-built span plans through the Searcher."""

from __future__ import annotations

import pytest

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import Searcher, plans as P
from lucene_spark.search.surround import (
    SurroundParseError,
    TooManyBasicQueries,
    parse,
)

# --- grammar shapes ---------------------------------------------------------


def test_infix_distance_ops():
    assert parse("3w(a, b)") == P.SpanNearQ(
        (P.SpanTermQ("a"), P.SpanTermQ("b")), slop=2, in_order=True)
    assert parse("a n b") == P.SpanNearQ(
        (P.SpanTermQ("a"), P.SpanTermQ("b")), slop=0, in_order=False)
    # W binds tighter than N: a N b W c == N(a, W(b, c))
    q = parse("a n b w c")
    assert q.in_order is False
    assert q.clauses[1] == P.SpanNearQ(
        (P.SpanTermQ("b"), P.SpanTermQ("c")), slop=0, in_order=True)


def test_boolean_precedence():
    q = parse("a AND b OR c")
    assert isinstance(q, P.BoolQ) and len(q.should) == 2
    assert q.should[0] == P.BoolQ(must=(P.TermQ("a"), P.TermQ("b")))
    q2 = parse("a NOT b")
    assert q2 == P.BoolQ(must=(P.TermQ("a"),), must_not=(P.TermQ("b"),))


def test_prefix_forms_and_case():
    assert parse("OR(x, y)") == parse("x or y")
    assert parse("and(x, y)") == parse("x AND y")
    assert parse("5N(a, b, c)") == P.SpanNearQ(
        (P.SpanTermQ("a"), P.SpanTermQ("b"), P.SpanTermQ("c")),
        slop=4, in_order=False)


def test_fields_and_weights():
    q = parse("title: 2w(a, b)")
    assert all(c.field == "title" for c in q.clauses)
    q2 = parse("x^2^3")
    assert isinstance(q2, P.BoostQ) and q2.boost == 6.0
    # multi-field chain ORs per-field copies (FieldsQuery.java)
    q3 = parse("f1:f2:term")
    assert q3 == P.BoolQ(should=(
        P.TermQ("term", field="f1"), P.TermQ("term", field="f2")))


def test_truncations():
    assert parse("pre*") == P.PrefixQ("pre")
    assert parse("t?unc*") == P.WildcardQ("t?unc*")
    with pytest.raises(SurroundParseError):
        parse("*nope")


def test_or_inside_distance_becomes_spanor():
    q = parse("3w(or(a, b), c)")
    assert q.clauses[0] == P.SpanOrQ((P.SpanTermQ("a"), P.SpanTermQ("b")))


def test_error_modes():
    with pytest.raises(SurroundParseError):
        parse("w(and(a, b), c)")  # AND inside distance
    with pytest.raises(SurroundParseError):
        parse("a NOT")  # dangling operator
    with pytest.raises(SurroundParseError):
        parse("OR(onearg)")  # prefix op needs >= 2 args
    with pytest.raises(SurroundParseError):
        parse("100w(a, b)")  # distance 2..99 only


# --- e2e through the Searcher -----------------------------------------------


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    pdf = make_corpus(300, seed=13)
    idx_dir = str(tmp_path_factory.mktemp("surround_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", num_buckets=4, salt_rows=64,
    )
    return Searcher(Index(spark, idx_dir), scoring="double")


def _top(searcher, q, k=10):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in searcher.scored(q, k).collect()
    ]


def test_e2e_matches_hand_built_span(searcher):
    parsed = parse("3w(async, await)")
    hand = P.SpanNearQ(
        (P.SpanTermQ("async"), P.SpanTermQ("await")), slop=2, in_order=True)
    assert _top(searcher, parsed) == _top(searcher, hand)


def test_e2e_unordered(searcher):
    parsed = parse("4n(await, async)")
    hand = P.SpanNearQ(
        (P.SpanTermQ("await"), P.SpanTermQ("async")), slop=3, in_order=False)
    assert _top(searcher, parsed) == _top(searcher, hand)


def test_e2e_truncation_inside_distance(searcher):
    # needs the searcher's dictionary to expand (SpanNearClauseFactory)
    with pytest.raises(SurroundParseError):
        parse("3w(asy*, await)")  # no searcher passed
    parsed = parse("3w(asy*, await)", searcher=searcher)
    span0 = parsed.clauses[0]
    assert isinstance(span0, (P.SpanOrQ, P.SpanTermQ))
    rows = _top(searcher, parsed)
    # asy* covers async: superset of the plain async-await matches
    plain = _top(searcher, parse("3w(async, await)"))
    assert {d for d, _ in plain} <= {d for d, _ in rows} or len(rows) == 10


def test_e2e_boolean_equivalence(searcher):
    parsed = parse("async AND await")
    hand = P.BoolQ(must=(P.TermQ("async"), P.TermQ("await")))
    assert _top(searcher, parsed) == _top(searcher, hand)


def test_too_many_basic_queries(searcher):
    import lucene_spark.search.surround as SU
    old = SU.MAX_BASIC_QUERIES
    SU.MAX_BASIC_QUERIES = 3
    try:
        with pytest.raises(TooManyBasicQueries):
            parse("a AND b AND c AND d")
    finally:
        SU.MAX_BASIC_QUERIES = old
