"""Per-position payloads (queries/payloads/PayloadScoreQuery.java,
PayloadFunction) — storage round-trip through the pay stream, span
payload scoring vs a brute-force oracle, and survival through
delete + compact."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.index.builder import compact_index, delete_docs
from lucene_spark.search import PayloadScoreQ, Searcher, plans as P
from lucene_spark.search import intervals as IV

ANALYZER = {"payloads": "token_length"}


@pytest.fixture(scope="module")
def pay_idx(spark, tmp_path_factory):
    pdf = make_corpus(120, seed=31)
    idx_dir = str(tmp_path_factory.mktemp("pay_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", keep_cols=["lang"], num_buckets=4,
        salt_rows=64, analyzer=ANALYZER,
    )
    # replicate the builder's docID assignment: rank over all columns
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    return idx_dir, pdf


def _brute(pdf, span, func):
    """Python oracle: evaluate intervals per doc over the tokenized
    text; payloads = token length at matched leaf positions."""
    src = P.span_source(span)
    terms = set(IV.leaf_terms(src))
    fns = {"min": min, "max": max, "avg": lambda v: sum(v) / len(v),
           "sum": sum}
    out = {}
    for _, row in pdf.iterrows():
        toks, poss = tokenize(row["content"], analyzer=ANALYZER)
        pos_by_term = {}
        pay_by_term = {}
        for t, p in zip(toks, poss):
            if t in terms:
                pos_by_term.setdefault(t, []).append(p)
                pay_by_term.setdefault(t, []).append(float(len(t)))
        pos_np = {t: np.asarray(v) for t, v in pos_by_term.items()}
        ivs = IV.evaluate(src, pos_np)
        if not ivs:
            continue
        vals = []
        for s0, s1 in ivs:
            for t, ps in pos_by_term.items():
                for p, pay in zip(ps, pay_by_term[t]):
                    if s0 <= p <= s1:
                        vals.append(pay)
        out[int(row["doc_id"])] = fns[func](vals)
    return out


@pytest.mark.parametrize("func", ["max", "avg", "sum", "min"])
def test_payload_span_or_matches_brute(spark, pay_idx, func):
    idx_dir, pdf = pay_idx
    s = Searcher(Index(spark, idx_dir), scoring="double")
    span = P.SpanOrQ((P.SpanTermQ("async"), P.SpanTermQ("go"),
                      P.SpanTermQ("channel")))
    got = {
        int(r["doc_id"]): round(float(r["score"]), 6)
        for r in s.scored(PayloadScoreQ(span, func)).collect()
    }
    want = {k: round(v, 6) for k, v in _brute(pdf, span, func).items()}
    assert got == want
    assert got, "query must match some docs"


def test_payload_span_near(spark, pay_idx):
    idx_dir, pdf = pay_idx
    s = Searcher(Index(spark, idx_dir), scoring="double")
    span = P.SpanNearQ(
        (P.SpanTermQ("async"), P.SpanTermQ("await")), slop=5, in_order=True
    )
    got = {
        int(r["doc_id"]): round(float(r["score"]), 6)
        for r in s.scored(PayloadScoreQ(span, "sum", boost=2.0)).collect()
    }
    want = {
        k: round(2.0 * v, 6) for k, v in _brute(pdf, span, "sum").items()
    }
    assert got == want


def test_payloads_survive_compact(spark, pay_idx, tmp_path):
    import shutil

    idx_dir, pdf = pay_idx
    work = str(tmp_path / "pay_copy")
    shutil.copytree(idx_dir, work)
    span = P.SpanTermQ("async")
    before = {
        int(r["doc_id"]): float(r["score"])
        for r in Searcher(Index(spark, work), scoring="double")
        .scored(PayloadScoreQ(span, "avg")).collect()
    }
    victim = sorted(before)[0]
    delete_docs(
        spark, work, spark.createDataFrame([(victim,)], ["doc_id"])
    )
    compact_index(spark, work)
    after = {
        int(r["doc_id"]): float(r["score"])
        for r in Searcher(Index(spark, work), scoring="double")
        .scored(PayloadScoreQ(span, "avg")).collect()
    }
    assert victim not in after
    assert after == {k: v for k, v in before.items() if k != victim}


def test_payload_requires_payload_index(spark, tmp_path_factory):
    pdf = make_corpus(30, seed=32)
    idx_dir = str(tmp_path_factory.mktemp("nopay_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", num_buckets=2, salt_rows=64,
    )
    s = Searcher(Index(spark, idx_dir), scoring="double")
    with pytest.raises(ValueError, match="payloads"):
        s.scored(PayloadScoreQ(P.SpanTermQ("async"), "max")).collect()


def test_checkindex_validates_payload_stream(spark, pay_idx):
    from lucene_spark.index.check import check_index

    idx_dir, _ = pay_idx
    rep = check_index(Index(spark, idx_dir))
    assert rep["posting_violations"] == {}
