"""UnifiedHighlighter best-passages: PassageScorer formula parity
(uhighlight/PassageScorer.java) + e2e over a built index."""

import math

from lucene_spark.search import highlight as H


def test_passage_scorer_formula():
    # hand-computed from PassageScorer.java with defaults
    k1, b, pivot = 1.2, 0.75, 87.0
    content_len, ttf = 500, 3
    num_docs = 1 + content_len / pivot
    want_w = (k1 + 1) * math.log(1 + (num_docs + 0.5) / (ttf + 0.5))
    assert abs(H.passage_weight(content_len, ttf) - want_w) < 1e-12
    freq, plen = 2, 120
    want_tf = freq / (freq + k1 * ((1 - b) + b * (plen / pivot)))
    assert abs(H.passage_tf(freq, plen) - want_tf) < 1e-12
    assert abs(H.passage_norm(0) - (1 + 1 / math.log(pivot))) < 1e-12


def test_doc_best_passages_order_and_scoring():
    text = (
        "The quick brown fox. "
        "Nothing relevant here at all. "
        "A fox and another fox appear twice in this sentence! "
        "Final fox mention."
    )
    out = H._doc_best_passages(
        text, ["fox"], max_passages=2, pre="<b>", post="</b>",
        k1=1.2, b=0.75, pivot=87.0,
    )
    assert len(out) == 2
    # returned in document order; the double-fox sentence must be included
    assert out[0][1] < out[1][1]
    texts = [p for p, _s, _sc in out]
    assert any("<b>fox</b> and another <b>fox</b>" in t for t in texts)
    # every returned passage highlights the term
    assert all("<b>fox</b>" in t for t in texts)
    # the two-match passage outranks a one-match passage at equal length
    tf_doc = {"fox": 4}
    s2 = H._score_passage({"fox": 2}, tf_doc, 50, 100, len(text), 1.2, 0.75, 87.0)
    s1 = H._score_passage({"fox": 1}, tf_doc, 50, 100, len(text), 1.2, 0.75, 87.0)
    assert s2 > s1


def test_no_match_returns_empty():
    assert H._doc_best_passages("plain text", ["zzz"], 3, "<b>", "</b>", 1.2, 0.75, 87.0) == []


def test_best_passages_e2e(spark, tmp_path):
    from lucene_spark.index import Index, build_index

    rows = [
        (0, "alpha beta gamma. delta alpha alpha here! unrelated tail."),
        (1, "no relevant terms in this one. none at all."),
        (2, "alpha at the very start. middle filler sentence. alpha again near the end."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx_dir = str(tmp_path / "bp_idx")
    build_index(spark, df, idx_dir, text_col="text", doc_id_col="doc_id",
                num_buckets=2, salt_rows=64)
    index = Index(spark, idx_dir)
    hits = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    got = H.best_passages(index, hits, ["alpha"], max_passages=2).toPandas()
    by_doc = {d: g.sort_values("p_start") for d, g in got.groupby("doc_id")}
    assert 1 not in by_doc  # no matches -> no passages
    # doc 0: the triple-alpha sentence scores above the single-alpha one,
    # both are returned (max_passages=2) in document order
    d0 = by_doc[0]
    assert len(d0) == 2
    assert d0["p_score"].iloc[1] > d0["p_score"].iloc[0]
    assert "<b>alpha</b> <b>alpha</b>" in d0["passage"].iloc[1]
    d2 = by_doc[2]
    assert len(d2) == 2
    assert all("<b>alpha</b>" in p for p in d2["passage"])
