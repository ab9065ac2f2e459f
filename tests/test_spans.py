"""Span query family (queries/spans/*.java analogs) — lowering to the
interval algebra, span-specific combinator semantics, and e2e equivalence
with PhraseQ where the contracts coincide (SpanNearQuery in-order slop=0
over distinct terms == exact PhraseQuery: same matches, same freq, same
summed-idf weight)."""

from __future__ import annotations

import numpy as np

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import Searcher, plans as P
from lucene_spark.search import intervals as IV


def _pos(**kw):
    return {k: np.asarray(v) for k, v in kw.items()}


# --- lowering -----------------------------------------------------------


def test_span_lowering_shapes():
    q = P.SpanNearQ((P.SpanTermQ("a"), P.SpanTermQ("b")), slop=2, in_order=True)
    src = P.span_source(q)
    assert isinstance(src, P.IntervalOrdered) and src.max_gaps == 2
    q2 = P.SpanNearQ((P.SpanTermQ("a"), P.SpanTermQ("b")), slop=1, in_order=False)
    assert isinstance(P.span_source(q2), P.IntervalUnordered)
    q3 = P.SpanOrQ((P.SpanTermQ("a"), P.SpanTermQ("b")))
    assert isinstance(P.span_source(q3), P.IntervalOr)
    assert isinstance(P.rewrite(q), P.IntervalQ)


def test_span_not_overlap_semantics():
    # include "a b" spans, exclude "c": (1,2) overlaps c@2 -> dropped
    src = P.span_source(
        P.SpanNotQ(
            P.SpanNearQ((P.SpanTermQ("a"), P.SpanTermQ("b")), 0, True),
            P.SpanTermQ("c"),
        )
    )
    pos = _pos(a=[1, 10], b=[2, 11], c=[2])
    assert IV.evaluate(src, pos) == [(10, 11)]
    # pre/post expansion: c@8 with post=2 reaches into (10, 11)
    src2 = P.span_source(
        P.SpanNotQ(
            P.SpanNearQ((P.SpanTermQ("a"), P.SpanTermQ("b")), 0, True),
            P.SpanTermQ("c"),
            post=2,
        )
    )
    pos2 = _pos(a=[10], b=[11], c=[8])
    assert IV.evaluate(src2, pos2) == []
    # exclude term absent from the doc: include spans all survive
    assert IV.evaluate(src, _pos(a=[1], b=[2])) == [(1, 2)]


def test_span_first_semantics():
    # SpanFirstQuery(end=3): Lucene span ends are exclusive, so a term
    # at position 2 has end 3 and survives end=3; position 3 does not
    src = P.span_source(P.SpanFirstQ(P.SpanTermQ("a"), end=3))
    assert IV.evaluate(src, _pos(a=[0, 2, 3, 9])) == [(0, 0), (2, 2)]


def test_span_position_range_semantics():
    # SpanPositionRangeQuery: start >= 2 and exclusive end <= 6
    # (a term at position 5 has span end 6 and survives end=6)
    src = P.span_source(
        P.SpanPositionRangeQ(P.SpanTermQ("a"), start=2, end=6)
    )
    assert IV.evaluate(src, _pos(a=[0, 2, 5, 6, 9])) == [(2, 2), (5, 5)]
    # multi-position spans: BOTH endpoints must sit inside the range
    near = P.SpanNearQ((P.SpanTermQ("a"), P.SpanTermQ("b")), 0, True)
    src2 = P.span_source(P.SpanPositionRangeQ(near, start=1, end=4))
    pos = _pos(a=[0, 1, 3, 8], b=[1, 2, 4, 9])
    # candidate spans (0,1) startswith 0 -> out; (1,2) in; (3,4) end 5
    # exceeds end=4 -> out; (8,9) out
    assert IV.evaluate(src2, pos) == [(1, 2)]
    # start=0 degenerates to SpanFirst
    src3 = P.span_source(P.SpanPositionRangeQ(P.SpanTermQ("a"), 0, 3))
    first = P.span_source(P.SpanFirstQ(P.SpanTermQ("a"), end=3))
    p = _pos(a=[0, 2, 3, 9])
    assert IV.evaluate(src3, p) == IV.evaluate(first, p)


def test_span_containing_within():
    big = P.SpanNearQ((P.SpanTermQ("a"), P.SpanTermQ("c")), 5, True)
    little = P.SpanTermQ("b")
    pos = _pos(a=[1, 20], b=[2], c=[4, 23])
    got = IV.evaluate(P.span_source(P.SpanContainingQ(big, little)), pos)
    assert got == [(1, 4)]
    got_w = IV.evaluate(P.span_source(P.SpanWithinQ(little, big)), pos)
    assert got_w == [(2, 2)]


def test_span_unordered_matches_reversed():
    src = P.span_source(
        P.SpanNearQ((P.SpanTermQ("a"), P.SpanTermQ("b")), 3, in_order=False)
    )
    assert IV.evaluate(src, _pos(a=[5], b=[3])) == [(3, 5)]
    src_o = P.span_source(
        P.SpanNearQ((P.SpanTermQ("a"), P.SpanTermQ("b")), 3, in_order=True)
    )
    assert IV.evaluate(src_o, _pos(a=[5], b=[3])) == []


# --- e2e ---------------------------------------------------------------


def test_span_near_equals_phrase_e2e(spark, tmp_path_factory):
    """slop=0 in-order SpanNear over distinct terms == exact PhraseQuery:
    identical doc sets AND identical float32 scores (both use freq =
    alignment count and summed leaf idf)."""
    pdf = make_corpus(150, seed=29)
    idx_dir = str(tmp_path_factory.mktemp("span_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", keep_cols=["lang"], num_buckets=4, salt_rows=64,
    )
    s = Searcher(Index(spark, idx_dir), scoring="lucene")
    span = P.SpanNearQ(
        (P.SpanTermQ("async"), P.SpanTermQ("await")), slop=0, in_order=True
    )
    got = {
        int(r["doc_id"]): float(np.float32(r["score"]))
        for r in s.scored(span).collect()
    }
    want = {
        int(r["doc_id"]): float(np.float32(r["score"]))
        for r in s.scored(P.PhraseQ(("async", "await"))).collect()
    }
    assert got == want
    assert len(got) > 0

    # sloppy variant must be a superset of the exact matches
    sloppy = P.SpanNearQ(
        (P.SpanTermQ("async"), P.SpanTermQ("await")), slop=3, in_order=True
    )
    sloppy_docs = {int(r["doc_id"]) for r in s.scored(sloppy).collect()}
    assert set(got) <= sloppy_docs

    # span filter context: doc_set equals the scored doc set
    ds = {int(r["doc_id"]) for r in s.doc_set(span).collect()}
    assert ds == set(got)
