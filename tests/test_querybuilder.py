"""QueryBuilder (util/QueryBuilder.java) — analyzer-driven query shapes.

Mirrors the reference's TestQueryBuilder: each test feeds query text
through an analysis chain and asserts the exact plan-node tree the
reference would build (term / boolean / synonym / phrase / multiphrase
/ min-should-match shapes)."""

import pytest

from lucene_spark.search import plans as P
from lucene_spark.search.querybuilder import QueryBuilder


def test_single_term():
    qb = QueryBuilder()
    assert qb.create_boolean_query(None, "Vector") == P.TermQ("vector")


def test_boolean_should_and_must():
    qb = QueryBuilder()
    q = qb.create_boolean_query(None, "merge sort")
    assert q == P.BoolQ(should=(P.TermQ("merge"), P.TermQ("sort")))
    q = qb.create_boolean_query(None, "merge sort", "must")
    assert q == P.BoolQ(must=(P.TermQ("merge"), P.TermQ("sort")))


def test_invalid_operator_and_fraction():
    qb = QueryBuilder()
    with pytest.raises(ValueError):
        qb.create_boolean_query(None, "x", "must_not")
    with pytest.raises(ValueError):
        qb.create_min_should_match_query(None, "x y", 1.5)


def test_empty_and_stopword_only_stream_is_none():
    qb = QueryBuilder(analyzer={"stopwords": ["the", "of"]})
    assert qb.create_boolean_query(None, "") is None
    assert qb.create_boolean_query(None, "the of") is None
    assert qb.create_phrase_query(None, "the of") is None


def test_min_should_match_fraction():
    qb = QueryBuilder()
    # QueryBuilder.java:172-180: msm = (int)(fraction * clauses)
    q = qb.create_min_should_match_query(None, "a1 b2 c3 d4", 0.5)
    assert isinstance(q, P.BoolQ)
    assert q.min_should_match == 2
    assert len(q.should) == 4
    # fraction == 1 -> conjunction (QueryBuilder.java:160-162)
    q = qb.create_min_should_match_query(None, "a1 b2", 1.0)
    assert q == P.BoolQ(must=(P.TermQ("a1"), P.TermQ("b2")))
    # single term never wraps
    assert qb.create_min_should_match_query(None, "solo", 0.5) == P.TermQ("solo")


def test_phrase_with_stop_hole_positions():
    qb = QueryBuilder(analyzer={"stopwords": ["of"]})
    # "master of science" -> positions (0, 2): the hole survives
    # (TestQueryBuilder.testPhraseQueryPositionIncrements)
    q = qb.create_phrase_query(None, "master of science")
    assert q == P.PhraseQ(("master", "science"), positions=(0, 2))


def test_phrase_single_token_degenerates_to_term():
    qb = QueryBuilder()
    assert qb.create_phrase_query(None, "vector") == P.TermQ("vector")


def test_phrase_slop_threaded():
    qb = QueryBuilder()
    q = qb.create_phrase_query(None, "data line", 2)
    assert q == P.PhraseQ(("data", "line"), slop=2, positions=(0, 1))


_SYN = {"synonyms": {"quick": ["fast"]}, "keep_orig": True}


def test_synonym_single_position():
    # one position with posIncr=0 alternatives -> lone SynonymQuery
    # (QueryBuilder.java analyzeBoolean)
    qb = QueryBuilder(analyzer=_SYN, expand_synonyms=True)
    q = qb.create_boolean_query(None, "quick")
    assert q == P.SynonymQ(("quick", "fast"))


def test_synonym_multi_boolean():
    qb = QueryBuilder(analyzer=_SYN, expand_synonyms=True)
    q = qb.create_boolean_query(None, "quick merge", "must")
    assert q == P.BoolQ(must=(P.SynonymQ(("quick", "fast")), P.TermQ("merge")))


def test_synonym_quoted_multiphrase():
    qb = QueryBuilder(analyzer=_SYN, expand_synonyms=True)
    q = qb.create_phrase_query(None, "quick merge")
    assert q == P.MultiPhraseQ((("quick", "fast"), ("merge",)))


def test_synonym_plus_hole_in_phrase_rejected():
    qb = QueryBuilder(
        analyzer={"synonyms": {"quick": ["fast"]}, "keep_orig": True,
                  "stopwords": ["of"]},
        expand_synonyms=True)
    with pytest.raises(NotImplementedError):
        qb.create_phrase_query(None, "quick of merge")


def test_field_threading():
    qb = QueryBuilder()
    q = qb.create_boolean_query("head", "merge sort")
    assert q.should[0].field == "head"
