"""NGramPhraseQuery rewrite + TopFieldCollector multi-field Sort."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import NGramPhraseQ, PhraseQ, Searcher, TermQ
from lucene_spark.search import plans as P


def test_ngram_rewrite_drops_redundant_grams():
    # NGramPhraseQuery.java:46-77: keep every n-th + last, original pos
    q = P.rewrite(NGramPhraseQ(2, ("ab", "bc", "cd", "de")))
    assert isinstance(q, PhraseQ)
    assert q.terms == ("ab", "cd", "de")
    assert q.positions == (0, 2, 3)
    # non-optimizable: short phrase or n < 2 -> plain consecutive phrase
    q = P.rewrite(NGramPhraseQ(2, ("ab", "bc")))
    assert q.terms == ("ab", "bc") and q.positions is None
    q = P.rewrite(NGramPhraseQ(1, ("a", "b", "c")))
    assert q.positions is None


@pytest.fixture(scope="module")
def small(spark, tmp_path_factory):
    pdf = make_corpus(120, seed=7)
    idx_dir = str(tmp_path_factory.mktemp("ng_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir, text_col="content",
        order_cols=["repo", "path", "commit"], keep_cols=["repo", "lang"],
        num_buckets=4, salt_rows=64,
    )
    opdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    opdf["doc_id"] = np.arange(len(opdf), dtype=np.int64)
    return Index(spark, idx_dir), opdf


def test_ngram_phrase_matches_offset_oracle(small):
    index, opdf = small
    s = Searcher(index, scoring="double")
    # pick a phrase that exists: first doc's first three tokens
    toks0 = tokenize(opdf["content"][0])[0]
    a, b, c = toks0[0], toks0[1], toks0[2]
    got = {
        int(r["doc_id"])
        for r in s.scored(NGramPhraseQ(2, (a, b, c))).collect()
    }
    want = set()
    for did, text in zip(opdf["doc_id"], opdf["content"]):
        tk = tokenize(text)[0]
        if any(
            tk[p] == a and tk[p + 2] == c for p in range(max(0, len(tk) - 2))
        ):
            want.add(int(did))
    assert got == want and got  # middle slot unchecked by the rewrite


def test_top_field_multi_sort(small):
    index, opdf = small
    s = Searcher(index, scoring="double")
    toks0 = tokenize(opdf["content"][0])[0]
    term = toks0[0]
    got = [
        (r["doc_id"], r["repo"], r["lang"])
        for r in s.top_field(TermQ(term), [("repo", False), ("lang", True)], 5).collect()
    ]
    match = opdf[[term in tokenize(t)[0] for t in opdf["content"]]]
    want = (
        match.sort_values(
            ["repo", "lang", "doc_id"], ascending=[True, False, True]
        )
        .head(5)[["doc_id", "repo", "lang"]]
        .itertuples(index=False, name=None)
    )
    assert got == list(want)


def test_top_field_missing_value(spark, tmp_path_factory):
    # SortField.setMissingValue analog: nulls substitute, changing rank
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "content": ["x a", "x b", "x c", "x d"],
            "score_col": pd.array([10.0, None, 5.0, None], dtype="Float64"),
        }
    )
    idx_dir = str(tmp_path_factory.mktemp("miss_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir, text_col="content",
        doc_id_col="doc_id", keep_cols=["score_col"], num_buckets=2,
        salt_rows=64,
    )
    s = Searcher(Index(spark, idx_dir), scoring="double")
    # missing -> 7.0: order desc becomes 10, 7(null,d1), 7(null,d3), 5
    got = [
        int(r["doc_id"])
        for r in s.top_field(
            TermQ("x"), [("score_col", True)], 4, missing={"score_col": 7.0}
        ).collect()
    ]
    assert got == [0, 1, 3, 2]
    # unsubstituted: nulls last on desc
    got = [
        int(r["doc_id"])
        for r in s.top_field(TermQ("x"), [("score_col", True)], 4).collect()
    ]
    assert got == [0, 2, 1, 3]
