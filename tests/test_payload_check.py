"""SpanPayloadCheckQuery (queries/payloads/SpanPayloadCheckQuery.java)
— identity vs the unchecked span when every payload passes, emptiness
when none can, op/length filtering vs a brute-force oracle."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import Searcher, plans as P
from lucene_spark.search import intervals as IV

ANALYZER = {"payloads": "token_length"}


@pytest.fixture(scope="module")
def chk_idx(spark, tmp_path_factory):
    pdf = make_corpus(120, seed=31)
    idx_dir = str(tmp_path_factory.mktemp("paycheck_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", num_buckets=4, salt_rows=64,
        analyzer=ANALYZER,
    )
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    return idx_dir, pdf


def _brute_docs(pdf, span, refs, op):
    """Doc ids with >=1 accepted span (payload = token length)."""
    import operator

    cmp = {"eq": operator.eq, "gt": operator.gt, "gte": operator.ge,
           "lt": operator.lt, "lte": operator.le}[op]
    src = P.span_source(span)
    terms = set(IV.leaf_terms(src))
    out = set()
    for _, row in pdf.iterrows():
        toks, poss = tokenize(row["content"], analyzer=ANALYZER)
        pos_by_term, pay = {}, {}
        for t, p in zip(toks, poss):
            if t in terms:
                pos_by_term.setdefault(t, []).append(p)
                pay[(t, p)] = float(len(t))
        ivs = IV.evaluate(
            src, {t: np.asarray(v) for t, v in pos_by_term.items()}
        )
        for s0, s1 in ivs:
            seq = sorted(
                (p, pay[(t, p)])
                for t, ps in pos_by_term.items()
                for p in ps
                if s0 <= p <= s1
            )
            if len(seq) == len(refs) and all(
                cmp(np.float32(v), np.float32(r))
                for (_, v), r in zip(seq, refs)
            ):
                out.add(int(row["doc_id"]))
                break
    return out


def test_always_true_check_equals_plain_span(spark, chk_idx):
    # token_length payload of "async" is always 5.0 -> the check passes
    # on every span; scores must equal the unchecked span query exactly
    idx_dir, _ = chk_idx
    s = Searcher(Index(spark, idx_dir), scoring="double")
    span = P.SpanTermQ("async")
    checked = {
        int(r["doc_id"]): float(r["score"])
        for r in s.scored(
            P.SpanPayloadCheckQ(span, payloads=(5.0,))
        ).collect()
    }
    plain = {
        int(r["doc_id"]): float(r["score"])
        for r in s.scored(P.rewrite(span)).collect()
    }
    assert checked and checked == plain


def test_impossible_check_is_empty(spark, chk_idx):
    idx_dir, _ = chk_idx
    s = Searcher(Index(spark, idx_dir), scoring="double")
    span = P.SpanTermQ("async")
    assert s.scored(
        P.SpanPayloadCheckQ(span, payloads=(4.0,))
    ).collect() == []
    # wrong sequence length also rejects every span
    assert s.scored(
        P.SpanPayloadCheckQ(span, payloads=(5.0, 5.0))
    ).collect() == []


@pytest.mark.parametrize("op,refs", [
    ("gte", (3.0,)), ("gt", (2.0,)), ("lt", (10.0,)), ("eq", (2.0,)),
])
def test_op_filtering_matches_brute(spark, chk_idx, op, refs):
    idx_dir, pdf = chk_idx
    s = Searcher(Index(spark, idx_dir), scoring="double")
    span = P.SpanOrQ((P.SpanTermQ("go"), P.SpanTermQ("channel")))
    got = {
        int(r["doc_id"])
        for r in s.scored(
            P.SpanPayloadCheckQ(span, payloads=refs, op=op)
        ).collect()
    }
    assert got == _brute_docs(pdf, span, list(refs), op)


def test_near_span_sequence_check(spark, chk_idx):
    # two-leaf ordered near: payload sequence is (len(async), len(await))
    idx_dir, pdf = chk_idx
    s = Searcher(Index(spark, idx_dir), scoring="double")
    span = P.SpanNearQ(
        (P.SpanTermQ("async"), P.SpanTermQ("await")), slop=5, in_order=True
    )
    got = {
        int(r["doc_id"])
        for r in s.scored(
            P.SpanPayloadCheckQ(span, payloads=(5.0, 5.0))
        ).collect()
    }
    assert got == _brute_docs(pdf, span, [5.0, 5.0], "eq")
    assert got, "near span must match some docs"


def test_unknown_op_rejected(spark, chk_idx):
    idx_dir, _ = chk_idx
    s = Searcher(Index(spark, idx_dir), scoring="double")
    with pytest.raises(ValueError):
        s.scored(
            P.SpanPayloadCheckQ(P.SpanTermQ("async"), (5.0,), op="ne")
        )
