"""Interval algebra: unit semantics, brute-force equivalence, e2e scoring.

The brute-force oracle here is an INDEPENDENT implementation (full
enumeration of ordered chains / unordered combinations + containment
minimalization) so the streaming algorithms in
lucene_spark/search/intervals.py are checked against a different
construction, mirroring the reference's equivalence-test pattern.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.oracle import PandasOracle
from lucene_spark.search import Searcher, plans as P
from lucene_spark.search import intervals as IV


def _brute_ordered(subs):
    cands = []
    for combo in itertools.product(*subs):
        ok = all(combo[i][0] > combo[i - 1][1] for i in range(1, len(combo)))
        if ok:
            cands.append((combo[0][0], combo[-1][1]))
    return _brute_minimal(cands)


def _brute_unordered(subs):
    cands = [
        (min(c[0] for c in combo), max(c[1] for c in combo))
        for combo in itertools.product(*subs)
    ]
    return _brute_minimal(cands)


def _brute_minimal(cands):
    out = []
    for a in set(cands):
        if not any(b != a and a[0] <= b[0] and b[1] <= a[1] for b in set(cands)):
            out.append(a)
    return sorted(out)


def test_ordered_basic():
    pos = {"a": np.array([1, 10]), "b": np.array([3, 12])}
    src = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")))
    assert IV.evaluate(src, pos) == [(1, 3), (10, 12)]


def test_ordered_minimality():
    # a at 1 and 2, b at 3: (1,3) contains (2,3) -> only (2,3) survives
    pos = {"a": np.array([1, 2]), "b": np.array([3])}
    src = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")))
    assert IV.evaluate(src, pos) == [(2, 3)]


def test_unordered_any_order():
    pos = {"a": np.array([5]), "b": np.array([2])}
    assert IV.evaluate(
        P.IntervalUnordered((P.IntervalTerm("a"), P.IntervalTerm("b"))), pos
    ) == [(2, 5)]
    assert IV.evaluate(
        P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b"))), pos
    ) == []


def test_filters():
    pos = {"a": np.array([0]), "b": np.array([5])}
    wide = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")), max_gaps=3)
    assert IV.evaluate(wide, pos) == []
    ok = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")), max_gaps=4)
    assert IV.evaluate(ok, pos) == [(0, 5)]
    w = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")), max_width=4)
    assert IV.evaluate(w, pos) == []


def test_nested_ordered():
    # ordered(unordered(a, b), c)
    pos = {"a": np.array([4]), "b": np.array([2]), "c": np.array([7])}
    inner = P.IntervalUnordered((P.IntervalTerm("a"), P.IntervalTerm("b")))
    outer = P.IntervalOrdered((inner, P.IntervalTerm("c")))
    assert IV.evaluate(outer, pos) == [(2, 7)]


@pytest.mark.parametrize("seed", range(12))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(seed)
    pos = {
        t: np.unique(rng.integers(0, 25, size=rng.integers(1, 6)))
        for t in ("a", "b", "c")
    }
    subs = [[(int(p), int(p)) for p in pos[t]] for t in ("a", "b", "c")]
    terms = (P.IntervalTerm("a"), P.IntervalTerm("b"), P.IntervalTerm("c"))
    got_o = IV.evaluate(P.IntervalOrdered(terms), pos)
    assert got_o == _brute_ordered(subs), (pos, got_o)
    got_u = IV.evaluate(P.IntervalUnordered(terms), pos)
    assert got_u == _brute_unordered(subs), (pos, got_u)


def test_e2e_interval_query(spark, tmp_path_factory):
    pdf = make_corpus(150, seed=13)
    idx_dir = str(tmp_path_factory.mktemp("iv_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", order_cols=["repo", "path", "commit"],
        keep_cols=["lang"], num_buckets=4, salt_rows=64,
    )
    s = Searcher(Index(spark, idx_dir), scoring="lucene")
    src = P.IntervalOrdered(
        (P.IntervalTerm("apache"), P.IntervalTerm("version")), max_gaps=4
    )
    got = {
        int(r["doc_id"]): float(np.float32(r["score"]))
        for r in s.scored(P.IntervalQ(src)).collect()
    }
    # oracle: brute force over the pandas oracle's position lists
    opdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    opdf["doc_id"] = np.arange(len(opdf), dtype=np.int64)
    oracle = PandasOracle(opdf, text_col="content")
    from lucene_spark import bm25

    w = bm25.combined_idf(
        [len(oracle.postings["apache"]), len(oracle.postings["version"])],
        oracle.doc_count,
    )
    want = {}
    for d in set(oracle.postings["apache"]) & set(oracle.postings["version"]):
        subs = [
            [(p, p) for p in oracle.postings["apache"][d]],
            [(p, p) for p in oracle.postings["version"][d]],
        ]
        ivs = [iv for iv in _brute_ordered(subs) if (iv[1] - iv[0]) - 1 <= 4]
        freq = sum(1.0 / (1.0 + max(0, (e - st) - 1)) for st, e in ivs)
        if freq > 0:
            sc = bm25.score(
                np.array([freq]), np.array([oracle.norms[d]]), w, oracle.cache
            )
            want[d] = float(np.float32(sc[0]))
    assert got == want
    assert len(got) > 0


# --- round-2 combinators (Intervals.java or/containing/containedBy/
#     notContaining/notContainedBy/notWithin) -----------------------------

def _pos(**kw):
    import numpy as np
    return {k: np.asarray(v) for k, v in kw.items()}


def test_interval_or():
    pos = _pos(a=[1, 9], b=[4])
    src = P.IntervalOr((P.IntervalTerm("a"), P.IntervalTerm("b")))
    assert IV.evaluate(src, pos) == [(1, 1), (4, 4), (9, 9)]


def test_interval_or_minimalizes():
    pos = _pos(a=[1], b=[2], c=[2])
    # ordered(a,b) yields (1,2); term c yields (2,2) which is contained
    src = P.IntervalOr(
        (P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b"))),
         P.IntervalTerm("c"))
    )
    assert IV.evaluate(src, pos) == [(2, 2)]


def test_containing():
    pos = _pos(a=[0, 10], b=[3, 20], c=[1])
    big = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")))
    # big intervals: (0,3), (10,20); only (0,3) contains c at (1,1)
    src = P.IntervalContaining(big, P.IntervalTerm("c"))
    assert IV.evaluate(src, pos) == [(0, 3)]


def test_contained_by():
    pos = _pos(a=[0, 10], b=[3, 20], c=[1, 15])
    big = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")))
    src = P.IntervalContainedBy(P.IntervalTerm("c"), big)
    assert IV.evaluate(src, pos) == [(1, 1), (15, 15)]


def test_not_containing():
    pos = _pos(a=[0, 10], b=[3, 20], c=[1])
    big = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")))
    src = P.IntervalNotContaining(big, P.IntervalTerm("c"))
    assert IV.evaluate(src, pos) == [(10, 20)]


def test_not_containing_missing_subtrahend_keeps_all():
    pos = _pos(a=[0], b=[3])
    big = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")))
    src = P.IntervalNotContaining(big, P.IntervalTerm("zzz"))
    assert IV.evaluate(src, pos) == [(0, 3)]


def test_not_contained_by():
    pos = _pos(a=[0, 10], b=[3, 20], c=[1, 30])
    big = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")))
    src = P.IntervalNotContainedBy(P.IntervalTerm("c"), big)
    assert IV.evaluate(src, pos) == [(30, 30)]


def test_not_within():
    pos = _pos(a=[0, 10, 30], b=[12])
    src = P.IntervalNotWithin(P.IntervalTerm("a"), 3, P.IntervalTerm("b"))
    # a@10 is within 3 of b@12 -> dropped; a@0 and a@30 survive
    assert IV.evaluate(src, pos) == [(0, 0), (30, 30)]


def test_required_terms_shapes():
    big = P.IntervalOrdered((P.IntervalTerm("a"), P.IntervalTerm("b")))
    assert IV.required_terms(P.IntervalNotContaining(big, P.IntervalTerm("c"))) == [["a"], ["b"]]
    assert IV.required_terms(P.IntervalContaining(big, P.IntervalTerm("c"))) == [["a"], ["b"], ["c"]]
    assert IV.required_terms(P.IntervalOr((P.IntervalTerm("x"), P.IntervalTerm("y")))) == [["x", "y"]]
