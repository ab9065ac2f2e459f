"""FieldMaskingSpanQuery (spans/FieldMaskingSpanQuery.java) — a span
evaluated against its real field's postings but advertised as another
field, so SpanNear/SpanOr can combine positions across fields. The
canonical contract: with two fields carrying IDENTICAL token streams,
a masked cross-field SpanNear matches exactly like the single-field
one (the reference javadoc's 'same analysis, aligned positions' use)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import FieldMaskingSpanQ, Searcher, plans as P
from lucene_spark.search import intervals as IV

N_DOCS = 150


@pytest.fixture(scope="module")
def masked_idx(spark, tmp_path_factory):
    pdf = make_corpus(N_DOCS, seed=31)
    pdf["head"] = pdf["content"].str.slice(0, 120)
    idx_dir = str(tmp_path_factory.mktemp("fmask_idx"))
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="content",
        # "copy" indexes the SAME source column -> token streams (and
        # positions, dfs, norms) identical to the default field
        extra_fields={"copy": "content", "head": "head"},
        order_cols=["repo", "path", "commit"],
        keep_cols=["lang"],
        num_buckets=4,
        salt_rows=64,
    )
    return Searcher(Index(spark, idx_dir), scoring="lucene")


# --- lowering / algebra --------------------------------------------------


def test_masking_lowering():
    inner = P.SpanNearQ(
        (P.SpanTermQ("a"), P.SpanTermQ("b", field="f2")), slop=1, in_order=True
    )
    src = P.span_source(P.FieldMaskingSpanQ(inner, "content"))
    assert isinstance(src, P.IntervalOrdered)
    leaves = src.sources
    assert leaves[0] == P.IntervalTerm("a")
    assert leaves[1] == P.IntervalTerm("b", "f2")
    assert IV.leaf_keys(src) == ["a", ("f2", "b")]
    assert IV.required_terms(src) == [["a"], [("f2", "b")]]
    assert IV.has_field_leaves(src)
    assert not IV.has_field_leaves(P.span_source(P.SpanTermQ("a")))
    # rewrite() accepts the masked node like any span
    assert isinstance(P.rewrite(P.FieldMaskingSpanQ(inner, "content")), P.IntervalQ)


def test_masked_evaluate_keys_fields_separately():
    src = P.span_source(
        P.SpanNearQ(
            (
                P.SpanTermQ("a"),
                P.FieldMaskingSpanQ(P.SpanTermQ("a", field="f2"), "content"),
            ),
            slop=0,
            in_order=True,
        )
    )
    # same surface term in two fields: positions must NOT be conflated
    pos = {"a": np.asarray([3]), ("f2", "a"): np.asarray([4])}
    assert IV.evaluate(src, pos) == [(3, 4)]
    assert IV.evaluate(src, {"a": np.asarray([3])}) == []


# --- e2e -----------------------------------------------------------------


def test_masked_span_equals_single_field_e2e(masked_idx):
    """Mask one leaf into the identical 'copy' field: doc sets AND
    float32 scores equal the all-default-field SpanNear (same positions,
    same dfs, same norms by construction)."""
    s = masked_idx
    plain = P.SpanNearQ(
        (P.SpanTermQ("async"), P.SpanTermQ("await")), slop=0, in_order=True
    )
    masked = P.SpanNearQ(
        (
            P.SpanTermQ("async"),
            FieldMaskingSpanQ(P.SpanTermQ("await", field="copy"), "content"),
        ),
        slop=0,
        in_order=True,
    )
    want = {
        int(r["doc_id"]): float(np.float32(r["score"]))
        for r in s.scored(plain).collect()
    }
    got = {
        int(r["doc_id"]): float(np.float32(r["score"]))
        for r in s.scored(masked).collect()
    }
    assert len(want) > 0
    assert got == want
    # filter context drives the same evaluator
    ds = {int(r["doc_id"]) for r in s.doc_set(masked).collect()}
    assert ds == set(want)


def test_masked_span_truncated_field_subset_e2e(masked_idx):
    """'head' is the first 120 chars of content with aligned positions:
    a masked head-leaf SpanNear can only match where the leaf occurs
    inside the head window -> a (non-empty) subset of the all-content
    matches."""
    s = masked_idx
    plain = P.SpanNearQ(
        (P.SpanTermQ("apache"), P.SpanTermQ("license")), slop=0, in_order=True
    )
    masked = P.SpanNearQ(
        (
            FieldMaskingSpanQ(P.SpanTermQ("apache", field="head"), "content"),
            P.SpanTermQ("license"),
        ),
        slop=0,
        in_order=True,
    )
    plain_docs = {int(r["doc_id"]) for r in s.scored(plain).collect()}
    masked_docs = {int(r["doc_id"]) for r in s.scored(masked).collect()}
    assert masked_docs
    assert masked_docs <= plain_docs
