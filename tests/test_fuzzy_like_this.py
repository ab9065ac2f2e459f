"""FuzzyLikeThisQuery (sandbox/queries/FuzzyLikeThisQuery.java:63):
brute-force the whole rewrite (variant enumeration, boosts, avg-df
fallback, per-token/global queues, df=1 TermStates override) in plain
pandas and assert score identity with the engine in double mode.
"""

import math

import pytest

from lucene_spark.analysis import analyze_query_text, tokenize
from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import FuzzyLikeThisQ, Searcher
from lucene_spark.search.executor import _edit_distance
from lucene_spark.smallfloat import LENGTH_TABLE, int_to_byte4

N_DOCS = 250
MAX_VARIANTS = 50


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_corpus(N_DOCS, seed=13)
    idx_dir = str(tmp_path_factory.mktemp("fltidx"))
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        num_buckets=4,
        salt_rows=64,
    )
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    docs = [tokenize_text(t) for t in pdf["content"]]
    return Index(spark, idx_dir), docs


def tokenize_text(text):
    return tokenize(text, None, None)[0]


def brute_flt(docs, query_text, max_edits, max_num_terms, ignore_tf=False):
    """The reference rewrite, straight-line (java:105-233)."""
    from collections import Counter

    df = Counter()
    for toks in docs:
        df.update(set(toks))
    n_docs = len(docs)
    doc_count = sum(1 for t in docs if t)
    sum_ttf = sum(len(t) for t in docs)
    avgdl = sum_ttf / doc_count

    kept = []
    for tok in dict.fromkeys(analyze_query_text(query_text)):
        variants = []
        for term, d in df.items():
            if abs(len(term) - len(tok)) > max_edits:
                continue
            ed = _edit_distance(term, tok, True)
            if ed <= max_edits:
                boost = (
                    1.0 if ed == 0
                    else 1.0 - ed / min(len(term), len(tok))
                )
                variants.append((term, d, boost))
        if not variants:
            continue
        d_src = df.get(tok, 0)
        if d_src == 0:
            d_src = sum(d for _t, d, _b in variants) // len(variants)
        idf = math.log((n_docs + 1) / (d_src + 1)) + 1.0
        variants.sort(key=lambda v: (-v[2], v[0]))
        for term, _d, boost in variants[:MAX_VARIANTS]:
            kept.append((boost * boost * idf, term))
    kept.sort(key=lambda x: (-x[0], x[1]))
    weights = {}
    for w, t in kept[:max_num_terms]:
        weights[t] = weights.get(t, 0.0) + w

    # score: SHOULD-sum of clauses with df forced to 1 (java:176-189)
    w1 = math.log(1 + (doc_count - 1 + 0.5) / 1.5)
    scores = {}
    for doc_id, toks in enumerate(docs):
        s = 0.0
        for t, w in weights.items():
            freq = toks.count(t)
            if not freq:
                continue
            if ignore_tf:
                s += w
            else:
                qdl = LENGTH_TABLE[int_to_byte4(len(toks)) & 0xFF]
                inv = 1.0 / (1.2 * (1 - 0.75 + 0.75 * qdl / avgdl))
                ww = w * w1
                s += ww - ww / (1 + freq * inv)
        if s:
            scores[doc_id] = s
    return weights, scores


@pytest.mark.parametrize("text,me,mnt", [
    ("import licens", 1, 10),
    ("zzz_missing merge", 1, 8),   # absent source term -> avg-df fallback
    ("the", 1, 5),                 # high-df source
])
def test_score_identity(spark, built, text, me, mnt):
    index, docs = built
    s = Searcher(index, scoring="double")
    q = FuzzyLikeThisQ(text, max_edits=me, max_num_terms=mnt)
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in s.scored(q).collect()
    }
    want_w, want = brute_flt(docs, text, me, mnt)
    # engine's variant weights match the brute rewrite
    eng_w = s._fuzzy_like_this_vars(q)
    assert set(eng_w) == set(want_w)
    for t in want_w:
        assert eng_w[t] == pytest.approx(want_w[t], rel=1e-12), t
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d


def test_ignore_tf(spark, built):
    index, docs = built
    s = Searcher(index, scoring="double")
    q = FuzzyLikeThisQ("import licens", max_edits=1, max_num_terms=10,
                       ignore_tf=True)
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in s.scored(q).collect()
    }
    _w, want = brute_flt(docs, "import licens", 1, 10, ignore_tf=True)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d


def test_doc_set_matches_scored_support(spark, built):
    index, _docs = built
    s = Searcher(index, scoring="double")
    q = FuzzyLikeThisQ("import licens", max_edits=1, max_num_terms=10)
    ds = {int(r["doc_id"]) for r in s.doc_set(q).collect()}
    sc = {int(r["doc_id"]) for r in s.scored(q).collect()}
    assert ds == sc


def test_no_variants_is_empty(spark, built):
    index, _docs = built
    s = Searcher(index, scoring="double")
    q = FuzzyLikeThisQ("qqqqqqqqqqqqqqqqqq", max_edits=1, max_num_terms=10)
    assert s.scored(q).count() == 0
