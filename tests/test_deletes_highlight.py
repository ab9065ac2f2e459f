"""Deletes (live-docs masking) + passage highlighting."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index, delete_docs
from lucene_spark.oracle import PandasOracle
from lucene_spark.search import BoolQ, MatchAllQ, PhraseQ, Searcher, TermQ
from lucene_spark.search.highlight import highlight


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_corpus(200, seed=11)
    idx_dir = str(tmp_path_factory.mktemp("del_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", order_cols=["repo", "path", "commit"],
        keep_cols=["lang"], num_buckets=4, salt_rows=64,
    )
    opdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    opdf["doc_id"] = np.arange(len(opdf), dtype=np.int64)
    return idx_dir, PandasOracle(opdf, text_col="content")


def test_delete_by_query_masks_results(spark, built):
    idx_dir, oracle = built
    s0 = Searcher(Index(spark, idx_dir))
    before = {d for d, _ in [(r["doc_id"], r) for r in s0.doc_set(TermQ("license")).collect()]}
    victims = s0.doc_set(TermQ("def"))  # delete-by-query
    victim_ids = {int(r["doc_id"]) for r in victims.collect()}
    delete_docs(spark, idx_dir, victims)

    s1 = Searcher(Index(spark, idx_dir))  # reopen
    after = {int(r["doc_id"]) for r in s1.doc_set(TermQ("license")).collect()}
    assert after == before - victim_ids
    # scores of surviving docs are UNCHANGED (stats keep deleted docs
    # until merge, like the reference)
    got = {
        int(r["doc_id"]): float(np.float32(r["score"]))
        for r in s1.top_k(TermQ("license"), 1000).collect()
    }
    want = {
        d: float(np.float32(sc))
        for d, sc in oracle.term_scores("license").items()
        if d not in victim_ids
    }
    assert got == want
    # phrase + matchall + boolean paths respect deletes too
    assert victim_ids.isdisjoint(
        {int(r["doc_id"]) for r in s1.doc_set(MatchAllQ()).collect()}
    )
    assert victim_ids.isdisjoint(
        {int(r["doc_id"]) for r in s1.doc_set(PhraseQ(("apache", "license"))).collect()}
    )
    assert victim_ids.isdisjoint(
        {
            int(r["doc_id"])
            for r in s1.doc_set(BoolQ(should=(TermQ("def"), TermQ("import")))).collect()
        }
    )
    # snapshot isolation: the pre-delete searcher still sees everything
    assert {int(r["doc_id"]) for r in s0.doc_set(TermQ("license")).collect()} == before


def test_highlight_passages(spark, built):
    idx_dir, _ = built
    s = Searcher(Index(spark, idx_dir))
    hits = s.top_k(TermQ("license"), 5)
    rows = highlight(s.index, hits, ["license", "apache"], window=80).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_matches"] >= 1
        assert "<b>" in r["passage"]
        assert len(r["passage"]) <= 80 + r["n_matches"] * len("<b></b>")
        assert r["first_offset"] >= 0
        inner = r["passage"].replace("<b>", "").replace("</b>", "")
        # the passage text is a verbatim slice of the stored document
        text = s.index.corpus.filter(f"doc_id = {r['doc_id']}").collect()[0]["content"]
        assert inner in text


def test_highlight_no_match(spark, built):
    idx_dir, _ = built
    s = Searcher(Index(spark, idx_dir))
    hits = s.top_k(TermQ("license"), 3)
    rows = highlight(s.index, hits, ["zzz_not_there"]).collect()
    assert all(r["passage"] is None and r["first_offset"] == -1 for r in rows)
