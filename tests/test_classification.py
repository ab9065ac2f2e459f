"""Classification module (lucene/classification analogs): NB scores
equal a brute-force pure-Python oracle computing the reference formulas
from the raw tokenized corpus; the kNN vote equals the reference vote
recomputed from the engine's own MLT top-k."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.analysis import analyze_query_text
from lucene_spark.classification import (
    KNearestNeighborClassifier,
    SimpleNaiveBayesClassifier,
)
from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import BoolQ, Searcher, plans as P

N_DOCS = 200


@pytest.fixture(scope="module")
def cls_setup(spark, tmp_path_factory):
    pdf = make_corpus(N_DOCS, seed=17)
    idx_dir = str(tmp_path_factory.mktemp("cls_idx"))
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        keep_cols=["lang"],
        num_buckets=4,
        salt_rows=64,
    )
    s = Searcher(Index(spark, idx_dir), scoring="lucene")
    opdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    opdf["doc_id"] = np.arange(len(opdf), dtype=np.int64)
    return s, opdf


def _nb_bruteforce(opdf, text: str) -> list[tuple[str, float]]:
    """The reference formulas, computed from the raw corpus in Python."""
    doc_terms = [set(analyze_query_text(t)) for t in opdf["content"]]
    langs = list(opdf["lang"])
    cls_counts: dict[str, int] = {}
    for lang in langs:
        cls_counts[lang] = cls_counts.get(lang, 0) + 1
    n_all = float(sum(cls_counts.values()))
    # sumDocFreq / docCount: total (doc, unique term) pairs / docs with text
    sum_df = sum(len(ts) for ts in doc_terms)
    doc_count = sum(1 for ts in doc_terms if ts)
    avgu = sum_df / doc_count
    toks = analyze_query_text(text)
    occ: dict[str, int] = {}
    for t in toks:
        occ[t] = occ.get(t, 0) + 1
    scored = []
    for c in sorted(cls_counts):
        n_c = float(cls_counts[c])
        den = avgu * n_c + n_all
        s = float(np.log(n_c) - np.log(n_all))
        for w in sorted(occ):
            hits = sum(
                1 for ts, lang in zip(doc_terms, langs) if lang == c and w in ts
            )
            s += occ[w] * float(np.log((hits + 1) / den))
        scored.append((c, s))
    mx = max(s for _, s in scored)
    loga = mx + float(np.log(sum(np.exp(s - mx) for _, s in scored)))
    out = [(c, float(np.exp(s - loga))) for c, s in scored]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


def test_nb_matches_bruteforce(cls_setup):
    s, opdf = cls_setup
    nb = SimpleNaiveBayesClassifier(s, "lang")
    for text in [
        "public class server import async await",
        "def merge value return",
        "",
    ]:
        got = nb.get_classes(text)
        want = _nb_bruteforce(opdf, text)
        assert [c for c, _ in got] == [c for c, _ in want]
        np.testing.assert_allclose(
            [p for _, p in got], [p for _, p in want], rtol=1e-9
        )
    # probabilities sum to 1 (normClassificationResults contract)
    assert abs(sum(p for _, p in nb.get_classes("merge")) - 1.0) < 1e-9


def test_nb_assign_class_is_argmax(cls_setup):
    s, _ = cls_setup
    nb = SimpleNaiveBayesClassifier(s, "lang")
    res = nb.get_classes("public class extends implements")
    assert nb.assign_class("public class extends implements") == res[0]
    assert res[0][1] >= res[-1][1]


def test_knn_vote_matches_reference_formula(cls_setup):
    s, _ = cls_setup
    k = 10
    knn = KNearestNeighborClassifier(s, "lang", k=k, max_query_terms=8)
    text = "async await chan func return value"
    got = knn.get_classes(text)
    assert got

    # recompute the reference vote from the engine's own MLT top-k
    # (classifier default knobs: min_term_freq=1, min_doc_freq=1)
    q = s.mlt_from_text(text, 8, min_term_freq=1, min_doc_freq=1)
    q = BoolQ(should=q.should, filter=(P.FieldFilter("lang", "notnull", None),))
    hits = (
        s.top_k(q, k)
        .join(s.index.docs.select("doc_id", "lang"), "doc_id")
        .collect()
    )
    mx = max(float(r["score"]) for r in hits)
    counts: dict[str, int] = {}
    boosts: dict[str, float] = {}
    for r in sorted(hits, key=lambda r: (-float(r["score"]), int(r["doc_id"]))):
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
        boosts[r["lang"]] = boosts.get(r["lang"], 0.0) + float(r["score"]) / mx
    sumdoc = sum(counts.values())
    den = float(k if sumdoc >= k else sumdoc)
    want = sorted(
        ((c, boosts[c] / den) for c in counts), key=lambda r: (-r[1], r[0])
    )
    assert [c for c, _ in got] == [c for c, _ in want]
    np.testing.assert_allclose(
        [v for _, v in got], [v for _, v in want], rtol=1e-12
    )
    assert knn.assign_class(text) == got[0]


def test_knn_empty_text(cls_setup):
    s, _ = cls_setup
    knn = KNearestNeighborClassifier(s, "lang", k=5)
    assert knn.get_classes("") == []
