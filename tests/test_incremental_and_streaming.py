"""Incremental segment append (NRT-reopen analog) + streaming monitor.

Append invariant: building an index on docs A then appending docs B must
answer every query exactly like one build over A+B (same global stats,
same docIDs, same float32 scores) — the SegmentMerger/DocIDMerger
correctness contract, checked engine-vs-engine and vs the pandas oracle.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, append_to_index, build_index
from lucene_spark.oracle import PandasOracle
from lucene_spark.search import BoolQ, PhraseQ, PrefixQ, Searcher, TermQ
from lucene_spark.streaming import Monitor

N_DOCS = 300
SPLIT = 200


@pytest.fixture(scope="module")
def corpora():
    pdf = make_corpus(N_DOCS, seed=7)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    return pdf.iloc[:SPLIT], pdf.iloc[SPLIT:]


@pytest.fixture(scope="module")
def appended(spark, corpora, tmp_path_factory):
    a, b = corpora
    idx_dir = str(tmp_path_factory.mktemp("incr_idx"))
    build_index(
        spark,
        spark.createDataFrame(a),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        keep_cols=["lang"],
        num_buckets=4,
        salt_rows=64,
    )
    n_before = Index(spark, idx_dir).N
    append_to_index(
        spark,
        spark.createDataFrame(b),
        idx_dir,
        order_cols=["repo", "path", "commit"],
    )
    return idx_dir, n_before


@pytest.fixture(scope="module")
def oracle_full(corpora):
    import pandas as pd

    a, b = corpora
    full = pd.concat([a, b]).reset_index(drop=True)
    full["doc_id"] = np.arange(len(full), dtype=np.int64)
    return PandasOracle(full, text_col="content")


def test_append_global_stats(spark, appended, oracle_full):
    idx_dir, n_before = appended
    idx = Index(spark, idx_dir)
    assert n_before == SPLIT
    assert idx.N == oracle_full.N
    assert idx.doc_count == oracle_full.doc_count
    assert idx.sum_ttf == oracle_full.sum_ttf
    assert idx.manifest["version"] == 1


@pytest.mark.parametrize("term", ["import", "license", "the", "var_3"])
def test_append_rank_identity(spark, appended, oracle_full, term):
    idx_dir, _ = appended
    s = Searcher(Index(spark, idx_dir), scoring="lucene")
    got = [
        (int(r["doc_id"]), float(np.float32(r["score"])))
        for r in s.top_k(TermQ(term), 20).collect()
    ]
    want = oracle_full.top_k(oracle_full.term_scores(term), 20)
    assert got == [(d, float(np.float32(sc))) for d, sc in want]


def test_append_phrase_spans_segments(spark, appended, oracle_full):
    idx_dir, _ = appended
    s = Searcher(Index(spark, idx_dir), scoring="lucene")
    got = {int(r["doc_id"]) for r in s.doc_set(PhraseQ(("apache", "license"))).collect()}
    want = set(oracle_full.multiphrase_scores([("apache",), ("license",)]))
    assert got == want
    # matches exist in BOTH segments (doc ids below and above the split)
    assert any(d < SPLIT for d in got) and any(d >= SPLIT for d in got)


def test_append_snapshot_isolation(spark, corpora, tmp_path_factory):
    """A reader opened before the append keeps its snapshot."""
    a, b = corpora
    idx_dir = str(tmp_path_factory.mktemp("snap_idx"))
    build_index(
        spark, spark.createDataFrame(a), idx_dir,
        text_col="content", order_cols=["repo", "path", "commit"],
        keep_cols=["lang"], num_buckets=4, salt_rows=64,
    )
    old = Index(spark, idx_dir)
    old_n = old.N
    append_to_index(spark, spark.createDataFrame(b), idx_dir,
                    order_cols=["repo", "path", "commit"])
    assert old.N == old_n  # pre-append reader unchanged
    assert Index(spark, idx_dir).N == old_n + len(b)


# --- streaming monitor -------------------------------------------------------


@pytest.fixture(scope="module")
def monitor():
    m = Monitor()
    m.register("q_license", TermQ("license"))
    m.register("q_phrase", PhraseQ(("apache", "license")))
    m.register("q_bool", BoolQ(must=(TermQ("import"),), must_not=(TermQ("license"),)))
    m.register("q_prefix", BoolQ(must=(PrefixQ("var_"),)))
    m.register("q_sloppy", PhraseQ(("apache", "version"), slop=3))
    return m


def test_monitor_batch_matches_engine(spark, monitor):
    pdf = make_corpus(120, seed=3)
    pdf["doc_id"] = np.arange(len(pdf), dtype=np.int64)
    docs = spark.createDataFrame(pdf)
    got = (
        monitor.match(docs, key_col="doc_id", text_col="content")
        .groupBy("query_id")
        .agg(F.collect_set("doc_key").alias("keys"))
        .collect()
    )
    by_q = {r["query_id"]: {int(k) for k in r["keys"]} for r in got}
    oracle = PandasOracle(pdf, text_col="content")
    assert by_q.get("q_license", set()) == set(oracle.term_scores("license"))
    assert by_q.get("q_phrase", set()) == set(
        oracle.multiphrase_scores([("apache",), ("license",)])
    )
    want_bool = set(oracle.term_scores("import")) - set(oracle.term_scores("license"))
    assert by_q.get("q_bool", set()) == want_bool
    want_sloppy = set(oracle.multiphrase_scores([("apache",), ("version",)], slop=3))
    assert by_q.get("q_sloppy", set()) == want_sloppy


def test_monitor_streaming_file_source(spark, monitor, tmp_path_factory):
    """True Structured Streaming run: file source, availableNow trigger,
    in-memory sink."""
    src = tmp_path_factory.mktemp("stream_src")
    chk = tmp_path_factory.mktemp("stream_chk")
    pdf = make_corpus(60, seed=9)
    pdf["doc_id"] = np.arange(len(pdf), dtype=np.int64)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    q = (
        monitor.match_stream(stream, key_col="doc_id", text_col="content")
        .format("memory")
        .queryName("monitor_matches")
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_key"], r["query_id"])
        for r in spark.sql("SELECT * FROM monitor_matches").collect()
    }
    want = {
        (r["doc_key"], r["query_id"])
        for r in monitor.match(
            spark.createDataFrame(pdf), key_col="doc_id", text_col="content"
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_checkindex_clean_on_appended(spark, appended):
    """CheckIndex analog passes on a multi-segment (appended) index."""
    from lucene_spark.index.check import check_index

    idx_dir, _ = appended
    report = check_index(Index(spark, idx_dir))
    assert report["term_stats_mismatches"] == 0
    assert report["bad_norms"] == 0
    assert report["sha256_mismatches"] == 0
    assert report["doc_ids_dense"] is True
    assert report["global_stats_ok"] is True
    assert report["posting_violations"] == {}


def test_checkindex_detects_corruption(spark, corpora, tmp_path_factory):
    """Tamper with the manifest stats -> CheckIndex must fail."""
    import json
    import os

    from lucene_spark.index.check import CheckIndexError, check_index

    a, _ = corpora
    idx_dir = str(tmp_path_factory.mktemp("bad_idx"))
    build_index(
        spark, spark.createDataFrame(a), idx_dir,
        text_col="content", order_cols=["repo", "path", "commit"],
        keep_cols=["lang"], num_buckets=4, salt_rows=64,
    )
    mf = os.path.join(idx_dir, "manifest.json")
    m = json.load(open(mf))
    m["sum_total_term_freq"] += 7
    json.dump(m, open(mf, "w"))
    with pytest.raises(CheckIndexError, match="manifest stats"):
        check_index(Index(spark, idx_dir))


def test_streaming_index_maintenance(spark, tmp_path_factory):
    """NRT pipeline end-to-end: a Structured Streaming source appends
    each micro-batch as a new index segment via foreachBatch — the
    SearcherManager/ControlledRealTimeReopenThread analog (SURVEY §2.12).
    """
    src = tmp_path_factory.mktemp("nrt_src")
    chk = tmp_path_factory.mktemp("nrt_chk")
    idx_dir = str(tmp_path_factory.mktemp("nrt_idx"))

    pdf = make_corpus(160, seed=21)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    a, b = pdf.iloc[:100], pdf.iloc[100:]

    # bootstrap index from the first batch, then stream the rest in
    build_index(
        spark, spark.createDataFrame(a), idx_dir,
        text_col="content", order_cols=["repo", "path", "commit"],
        keep_cols=["lang"], num_buckets=4, salt_rows=64,
    )
    spark.createDataFrame(b).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))

    def absorb(batch_df, batch_id):
        if batch_df.count():
            append_to_index(
                spark, batch_df, idx_dir, order_cols=["repo", "path", "commit"]
            )

    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    idx = Index(spark, idx_dir)  # NRT reopen
    assert idx.N == len(pdf)
    # the streamed docs are searchable and scored with updated global stats
    full = pdf.reset_index(drop=True).copy()
    full["doc_id"] = np.arange(len(full), dtype=np.int64)
    oracle = PandasOracle(full, text_col="content")
    s = Searcher(idx, scoring="lucene")
    got = [
        (int(r["doc_id"]), float(np.float32(r["score"])))
        for r in s.top_k(TermQ("license"), 15).collect()
    ]
    want = [
        (d, float(np.float32(sc)))
        for d, sc in oracle.top_k(oracle.term_scores("license"), 15)
    ]
    assert got == want


def test_compaction_merges_segments_and_reclaims_deletes(spark, tmp_path_factory):
    """forceMerge(1) analog: segments merge to one, deletes reclaim, and
    post-compaction scores equal a fresh build over the surviving docs
    (global stats updated — the reference's post-merge behavior)."""
    import pandas as pd

    from lucene_spark.index import compact_index, delete_docs
    from lucene_spark.index.check import check_index

    pdf = make_corpus(240, seed=31)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    a, b = pdf.iloc[:150], pdf.iloc[150:]
    idx_dir = str(tmp_path_factory.mktemp("cmp_idx"))
    build_index(
        spark, spark.createDataFrame(a), idx_dir,
        text_col="content", order_cols=["repo", "path", "commit"],
        keep_cols=["lang"], num_buckets=4, salt_rows=64,
    )
    append_to_index(spark, spark.createDataFrame(b), idx_dir,
                    order_cols=["repo", "path", "commit"])
    s0 = Searcher(Index(spark, idx_dir))
    victims = s0.doc_set(TermQ("def"))
    victim_ids = {int(r["doc_id"]) for r in victims.collect()}
    assert victim_ids
    delete_docs(spark, idx_dir, victims)

    compact_index(spark, idx_dir)

    idx = Index(spark, idx_dir)
    assert isinstance(idx.manifest["paths"]["postings"], str)  # one segment
    assert idx.N == len(pdf) - len(victim_ids)
    assert idx.deletes is None
    check_index(idx)  # every invariant (df/ttf/stats/global) post-merge

    # oracle over survivors with ORIGINAL doc_ids and reclaimed stats
    full = pdf.reset_index(drop=True).copy()
    full["doc_id"] = np.arange(len(full), dtype=np.int64)
    survivors = full[~full["doc_id"].isin(victim_ids)]
    oracle = PandasOracle(survivors, text_col="content", id_col="doc_id")
    s1 = Searcher(idx, scoring="lucene")
    for term in ("license", "import", "the"):
        got = [
            (int(r["doc_id"]), float(np.float32(r["score"])))
            for r in s1.top_k(TermQ(term), 20).collect()
        ]
        want = [
            (d, float(np.float32(sc)))
            for d, sc in oracle.top_k(oracle.term_scores(term), 20)
        ]
        assert got == want, term
    # phrase path (positions survive re-encoding)
    got_ph = {int(r["doc_id"]) for r in s1.doc_set(PhraseQ(("apache", "license"))).collect()}
    want_ph = set(oracle.multiphrase_scores([("apache",), ("license",)]))
    assert got_ph == want_ph
