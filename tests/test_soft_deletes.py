"""Soft deletes (IndexWriterConfig.setSoftDeletesField +
softUpdateDocument + SoftDeletesDirectoryReaderWrapper +
SoftDeletesRetentionMergePolicy): docs are masked by a docvalues marker
instead of a live-docs bitset, survive until compaction, and a
retention predicate keeps selected soft-deleted docs through merges.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.corpus import make_corpus
from lucene_spark.index import (
    Index,
    build_index,
    compact_index,
    soft_delete_docs,
)
from lucene_spark.search import Searcher, TermQ

N_DOCS = 100


@pytest.fixture()
def built(spark, tmp_path):
    pdf = make_corpus(N_DOCS, seed=9)
    idx_dir = str(tmp_path / "idx")
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        keep_cols=["lang"],
        num_buckets=4,
        salt_rows=64,
        soft_deletes_field="__soft_del",
    )
    return idx_dir


def _hits(idx, term):
    return {int(r["doc_id"]) for r in Searcher(idx).doc_set(TermQ(term)).collect()}


def test_soft_delete_masks_results(spark, built):
    idx = Index(spark, built)
    before = _hits(idx, "import")
    assert len(before) >= 3
    victims = sorted(before)[:2]
    soft_delete_docs(
        spark, built,
        spark.createDataFrame([(d,) for d in victims], "doc_id long"),
    )
    # wrapped view (default): masked; read-through view: still visible
    assert _hits(Index(spark, built), "import") == before - set(victims)
    assert _hits(Index(spark, built, include_soft_deleted=True), "import") == before


def test_compaction_reclaims_soft_deleted(spark, built):
    idx = Index(spark, built)
    victims = sorted(_hits(idx, "import"))[:2]
    soft_delete_docs(
        spark, built,
        spark.createDataFrame([(d,) for d in victims], "doc_id long"),
    )
    compact_index(spark, built)
    idx2 = Index(spark, built, include_soft_deleted=True)
    live_ids = {int(r["doc_id"]) for r in idx2.docs.select("doc_id").collect()}
    assert not (set(victims) & live_ids)  # physically gone
    assert idx2.N == N_DOCS + 5 - len(victims)  # corpus adds 5 edge docs


def test_retention_keeps_matching_docs(spark, built):
    """SoftDeletesRetentionMergePolicy.java:62: soft-deleted docs
    matching the retention query survive the merge, still marked and
    still masked."""
    idx = Index(spark, built)
    hits = _hits(idx, "import")
    docs = {
        int(r["doc_id"]): r["lang"]
        for r in idx.docs.select("doc_id", "lang").collect()
    }
    langs = {docs[d] for d in hits}
    keep_lang = sorted(langs)[0]
    victims = sorted(hits)[:4]
    kept = [d for d in victims if docs[d] == keep_lang]
    gone = [d for d in victims if docs[d] != keep_lang]
    assert gone  # test needs both kinds
    soft_delete_docs(
        spark, built,
        spark.createDataFrame([(d,) for d in victims], "doc_id long"),
    )
    compact_index(spark, built, soft_retention=f"lang = '{keep_lang}'")
    thru = Index(spark, built, include_soft_deleted=True)
    live_ids = {int(r["doc_id"]) for r in thru.docs.select("doc_id").collect()}
    assert set(kept) <= live_ids and not (set(gone) & live_ids)
    # retained docs stay marked -> still masked in the wrapped view
    assert not (set(kept) & _hits(Index(spark, built), "import"))


def test_soft_delete_requires_configured_field(spark, tmp_path):
    pdf = make_corpus(30, seed=3)
    idx_dir = str(tmp_path / "plain")
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", order_cols=["repo", "path", "commit"],
        num_buckets=2, salt_rows=64,
    )
    with pytest.raises(ValueError, match="soft_deletes_field"):
        soft_delete_docs(
            spark, idx_dir, spark.createDataFrame([(0,)], "doc_id long")
        )


def test_scores_identical_to_hard_view(spark, built):
    """Masking happens at the scorer leaf, so surviving docs keep their
    scores bit-for-bit (stats still count masked docs, like Lucene)."""
    idx0 = Index(spark, built)
    s0 = Searcher(idx0)
    base = {
        int(r["doc_id"]): np.float32(r["score"])
        for r in s0.top_k(TermQ("license"), 20).collect()
    }
    victims = sorted(base)[:1]
    soft_delete_docs(
        spark, built,
        spark.createDataFrame([(d,) for d in victims], "doc_id long"),
    )
    s1 = Searcher(Index(spark, built))
    after = {
        int(r["doc_id"]): np.float32(r["score"])
        for r in s1.top_k(TermQ("license"), 20).collect()
    }
    assert victims[0] not in after
    for d, sc in after.items():
        if d in base:
            assert sc == base[d]
