"""StandardQueryParser (flexible framework analog): config-handler
behaviors over the classic syntax. Pure plan-tree tests, no Spark."""

import pytest

from lucene_spark.search import plans as P
from lucene_spark.search.standardparser import StandardQueryParser, parse


def test_default_operator_and():
    q = parse("alpha beta", default_operator="AND")
    assert isinstance(q, P.BoolQ)
    assert len(q.must) == 2 and not q.should


def test_default_operator_or_unchanged():
    q = parse("alpha beta")
    assert isinstance(q, P.BoolQ)
    assert len(q.should) == 2 and not q.must


def test_explicit_or_wins_over_and_operator():
    q = parse("alpha OR beta", default_operator="AND")
    assert isinstance(q, P.BoolQ)
    assert len(q.should) == 2 and not q.must


def test_mixed_conj_matches_reference_addclause():
    # classic QueryParser with AND default: "a AND b OR c" -> +a b c?
    # addClause: CONJ_AND promotes a; CONJ_OR demotes b and adds c SHOULD
    q = parse("a AND b OR c", default_operator="AND")
    must = {t.term for t in q.must}
    should = {t.term for t in q.should}
    assert must == {"a"} and should == {"b", "c"}
    # with OR default too (CONJ_OR demotion is unconditional)
    q2 = parse("a AND b OR c", default_operator="OR")
    assert {t.term for t in q2.must} == {"a"}
    assert {t.term for t in q2.should} == {"b", "c"}


def test_explicit_plus_survives_or():
    q = parse("a OR +b", default_operator="AND")
    assert {t.term for t in q.must} == {"b"}
    assert {t.term for t in q.should} == {"a"}


def test_multi_fields_expansion():
    sp = StandardQueryParser().set_multi_fields({"text": 1.0, "head": 2.0})
    q = sp.parse("vector")
    assert isinstance(q, P.BoolQ) and len(q.should) == 2
    plain = [c for c in q.should if isinstance(c, P.TermQ)]
    boosted = [c for c in q.should if isinstance(c, P.BoostQ)]
    assert plain[0].field == "text"
    assert boosted[0].boost == 2.0 and boosted[0].inner.field == "head"


def test_multi_fields_respects_explicit_field():
    sp = StandardQueryParser().set_multi_fields(["text", "head"])
    q = sp.parse("head:vector")
    assert isinstance(q, P.TermQ) and q.field == "head"


def test_phrase_slop_default():
    sp = StandardQueryParser().set_phrase_slop(2)
    q = sp.parse('"alpha beta"')
    assert q.slop == 2
    q2 = sp.parse('"alpha beta"~5')
    assert q2.slop == 5  # explicit slop wins


def test_leading_wildcard_rejected_by_default():
    sp = StandardQueryParser()
    with pytest.raises(ValueError):
        sp.parse("*ector")
    sp.set_allow_leading_wildcard(True)
    sp.parse("*ector")  # no raise


def test_single_clause_and_default_returns_bare():
    q = parse("alpha", default_operator="AND")
    assert isinstance(q, P.TermQ)
