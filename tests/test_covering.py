"""CoveringQuery (sandbox/search/CoveringQuery.java, CoveringScorer.java)
— identity vs BooleanQuery when minimumNumberMatch is constant, and a
brute-force oracle for a per-doc (dynamic) threshold."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import BoolQ, CoveringQ, Searcher, TermQ

TERMS = ("merge", "sort", "hash")


@pytest.fixture(scope="module")
def cov_idx(spark, tmp_path_factory):
    pdf = make_corpus(150, seed=17)
    idx_dir = str(tmp_path_factory.mktemp("cov_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", keep_cols=["lang"], num_buckets=4,
        salt_rows=64,
    )
    return Index(spark, idx_dir)


def _rows(df):
    return sorted(
        (int(r["doc_id"]), float(np.float32(r["score"])))
        for r in df.collect()
    )


def test_constant_one_equals_should_union(cov_idx):
    """minMatch = max(1, 0) = 1 -> same docs+scores as a pure SHOULD."""
    s = Searcher(cov_idx)
    cov = s.scored(CoveringQ(tuple(TermQ(t) for t in TERMS), "0"))
    should = s.scored(BoolQ(should=tuple(TermQ(t) for t in TERMS)))
    assert _rows(cov) == _rows(should)


def test_constant_two_equals_msm(cov_idx):
    s = Searcher(cov_idx)
    cov = s.scored(CoveringQ(tuple(TermQ(t) for t in TERMS), "2"))
    msm = s.scored(
        BoolQ(should=tuple(TermQ(t) for t in TERMS), min_should_match=2)
    )
    assert _rows(cov) == _rows(msm)


def test_dynamic_threshold_brute(cov_idx):
    """Per-doc threshold doc_id % 4 (0..3): doc must match
    max(1, doc_id % 4) of the three terms."""
    s = Searcher(cov_idx)
    got = dict(
        _rows(s.scored(CoveringQ(tuple(TermQ(t) for t in TERMS),
                                 "doc_id % 4")))
    )
    per_term = {
        t: dict(_rows(s.scored(TermQ(t)))) for t in TERMS
    }
    all_docs = set().union(*[set(d) for d in per_term.values()])
    want = {}
    for d in all_docs:
        matches = [t for t in TERMS if d in per_term[t]]
        if len(matches) >= max(1, d % 4):
            want[d] = float(
                np.float32(sum(per_term[t][d] for t in matches))
            )
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-4, (d, got[d], want[d])


def test_null_value_never_matches(cov_idx):
    s = Searcher(cov_idx)
    out = s.scored(
        CoveringQ(tuple(TermQ(t) for t in TERMS),
                  "CASE WHEN doc_id % 2 = 0 THEN NULL ELSE 1 END")
    )
    assert all(int(r["doc_id"]) % 2 == 1 for r in out.collect())
