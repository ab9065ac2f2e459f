"""XML query parser (search/xmlparser.py, CoreParser analog) — element
-> plan-node mapping for every registered builder, nesting, attribute
defaults, error modes, and the registry seam."""

from __future__ import annotations

import pytest

from lucene_spark.search import plans as P
from lucene_spark.search.xmlparser import (
    UnsupportedXmlElement,
    XmlParseError,
    XmlQueryParser,
    parse,
    register,
)


def test_term_query():
    q = parse('<TermQuery fieldName="title" boost="2.0">Merge</TermQuery>')
    assert q == P.TermQ("merge", boost=2.0, field="title")
    # default field threading
    q2 = XmlQueryParser(default_field="body").parse(
        "<TermQuery>sort</TermQuery>")
    assert q2.field == "body"


def test_terms_query_analyzes():
    q = parse("<TermsQuery>Merge Sort</TermsQuery>")
    assert q == P.BoolQ(should=(P.TermQ("merge"), P.TermQ("sort")))


def test_boolean_query_occurs():
    q = parse(
        '<BooleanQuery minimumNumberShouldMatch="1">'
        '<Clause occurs="must"><TermQuery>a</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>b</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>c</TermQuery></Clause>'
        '<Clause occurs="filter"><MatchAllDocsQuery/></Clause>'
        "</BooleanQuery>"
    )
    assert q.must == (P.TermQ("a"),)
    assert q.should == (P.TermQ("b"),)
    assert q.must_not == (P.TermQ("c"),)
    assert q.filter == (P.MatchAllQ(),)
    assert q.min_should_match == 1


def test_range_and_point_range():
    q = parse('<RangeQuery fieldName="t" lowerTerm="a" upperTerm="c" '
              'includeUpper="false"/>')
    assert q == P.TermRangeQ("a", "c", True, False, field="t")
    q2 = parse('<PointRangeQuery fieldName="n_chars" lowerTerm="10" '
               'upperTerm="99"/>')
    assert q2 == P.FieldFilter("n_chars", "between", (10, 99))


def test_dismax_constscore_userquery():
    q = parse('<DisjunctionMaxQuery tieBreaker="0.3">'
              "<TermQuery>a</TermQuery><TermQuery>b</TermQuery>"
              "</DisjunctionMaxQuery>")
    assert isinstance(q, P.DisMaxQ) and q.tiebreak == 0.3
    q2 = parse("<ConstantScoreQuery><TermQuery>a</TermQuery>"
               "</ConstantScoreQuery>")
    assert q2 == P.ConstScoreQ(P.TermQ("a"))
    q3 = parse("<UserQuery>merge AND sort</UserQuery>")
    assert isinstance(q3, (P.BoolQ, P.TermQ))


def test_span_tree():
    q = parse(
        '<SpanNear slop="2" inOrder="false">'
        "<SpanTerm>a</SpanTerm>"
        "<SpanOrTerms>b c</SpanOrTerms>"
        "</SpanNear>"
    )
    assert q == P.SpanNearQ(
        (P.SpanTermQ("a"),
         P.SpanOrQ((P.SpanTermQ("b"), P.SpanTermQ("c")))),
        slop=2, in_order=False)
    q2 = parse('<SpanFirst end="3"><SpanTerm>x</SpanTerm></SpanFirst>')
    assert q2 == P.SpanFirstQ(P.SpanTermQ("x"), end=3)
    q3 = parse("<SpanNot>"
               "<Include><SpanTerm>a</SpanTerm></Include>"
               "<Exclude><SpanTerm>b</SpanTerm></Exclude>"
               "</SpanNot>")
    assert q3 == P.SpanNotQ(P.SpanTermQ("a"), P.SpanTermQ("b"))


def test_boosting_term_is_payload_avg():
    q = parse('<BoostingTermQuery fieldName="f">tok</BoostingTermQuery>')
    assert q == P.PayloadScoreQ(P.SpanTermQ("tok", field="f"), func="avg")


def test_error_modes():
    with pytest.raises(UnsupportedXmlElement):
        parse("<SpanPositionRange/>")
    with pytest.raises(XmlParseError):
        parse("<BooleanQuery><TermQuery>a</TermQuery></BooleanQuery>")
    with pytest.raises(XmlParseError):
        parse("not xml at all <<<")
    with pytest.raises(XmlParseError):
        parse("<ConstantScoreQuery></ConstantScoreQuery>")
    with pytest.raises(UnsupportedXmlElement):
        # non-span element inside a span position
        parse("<SpanNear><TermQuery>a</TermQuery></SpanNear>")


def test_register_seam():
    register("MyQuery", lambda el, p: P.MatchAllQ(boost=9.0))
    try:
        assert parse("<MyQuery/>") == P.MatchAllQ(boost=9.0)
    finally:
        from lucene_spark.search import xmlparser as X
        X._QUERY_BUILDERS.pop("MyQuery", None)
