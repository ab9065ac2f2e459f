"""Physical-plan audit: the properties that make queries scale must be
visible in the executed plan (SURVEY.md §4 / the .explain discipline).

- term lookup: Parquet PartitionFilters on bucket (partition pruning),
  PushedFilters on term (predicate pushdown to the scan)
- top-k: TakeOrderedAndProject (per-partition heap + merge, never a
  global sort)
- multi-term expansion: broadcast semi join of the matching dictionary
  slice against postings
- pipeline projections: no shuffle (no Exchange) for per-row text ops
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.pipeline import textstats
from lucene_spark.search import PrefixQ, Searcher, TermQ


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("plan_idx"))
    build_index(
        spark,
        spark.createDataFrame(make_corpus(200, seed=5)),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        keep_cols=["lang"],
        num_buckets=4,
        salt_rows=64,
    )
    return Searcher(Index(spark, idx_dir))


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_topk_plan(searcher):
    plan = plan_of(searcher.top_k(TermQ("license"), 10))
    assert "TakeOrderedAndProject" in plan, plan
    # both the bucket route and the term predicate reach the parquet scan
    assert "EqualTo(term,license)" in plan and "PushedFilters" in plan, plan
    assert "bucket" in plan.split("PushedFilters")[1][:200], plan
    assert plan.count("Exchange") == 0, plan  # term query: shuffle-free


def test_multiterm_expansion_broadcast(searcher):
    plan = plan_of(searcher.doc_set(PrefixQ("lic")))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "StartsWith(term,lic)" in plan, plan  # dictionary filter pushed down


def test_top_field_plan(searcher):
    # multi-field sort: per-partition top-k + merge, never a global sort
    plan = plan_of(
        searcher.top_field(TermQ("license"), [("lang", False)], 5)
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan, plan  # no global Sort node


def test_multiterm_scored_rewrite_plan(searcher):
    # scoring rewrite: ONE postings scan for all expansions (a single
    # parquet read of the postings table), term filter pushed down
    s = Searcher(searcher.index, scoring="double")
    plan = plan_of(s.scored(PrefixQ("lic", rewrite="scoring_boolean")))
    assert plan.count("Scan parquet") <= 2, plan  # postings (+deletes none)
    assert "term" in plan.split("PushedFilters")[1][:300], plan


def test_textstats_projection_shuffle_free(spark):
    docs = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    )
    for op in (textstats.with_quality, textstats.with_token_counts,
               textstats.with_lang_id, textstats.with_fingerprint):
        plan = plan_of(op(docs))
        assert "Exchange" not in plan, (op.__name__, plan)


def test_docs_filter_pushdown(searcher):
    df = searcher.index.docs.filter(F.col("lang") == "java").select("doc_id")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,java)]" in plan, plan
    assert "ReadSchema: struct<doc_id:bigint" in plan, plan  # column pruning


# ---------------------------------------------------------------------------
# dedup / ANN scale-path plan audits: the 100 TB-killer shapes must NOT
# appear — no cross join at any Hamming radius, no shingle self-join when
# LSH candidates bound the verify, partition-pruned ANN probes.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, f"some text body number {i} with shared tokens alpha beta gamma") for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_pairs_no_cross_join(spark, docs_df):
    from lucene_spark.pipeline import dedup

    plan = plan_of(dedup.simhash_pairs(dedup.simhash(docs_df), max_hamming=8))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_decontam_broadcasts_benchmark_side(spark, docs_df):
    from lucene_spark.pipeline import dedup

    sh = dedup.shingle_hashes(docs_df)
    df = dedup.benchmark_overlap(
        sh.filter("doc_id >= 5"), sh.filter("doc_id < 5"), min_overlap=1
    )
    plan = plan_of(df)
    # the eval-set side is broadcast; the corpus shingles are probed
    # once and aggregated — no corpus-vs-corpus shuffle join
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_minhash_verify_no_shingle_self_join(spark, docs_df):
    from lucene_spark.pipeline import dedup

    df = dedup.minhash_dedup_pairs(docs_df, tau=0.3)
    plan = plan_of(df)
    # verification joins candidate pairs to per-doc sets (array_intersect),
    # never the raw (a.sh == b.sh) self-join of the shingle stream
    assert "array_intersect" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    import re

    # no equi-join keyed on a shingle-hash column anywhere in the plan
    assert not re.search(r"\[sh#\d+L?\],\s*\[sh#\d+L?\]", plan), plan


def test_phrase_two_phase_plan(searcher):
    from lucene_spark.search import PhraseQ

    # small-df route: every slot is tiny, so the phase-1 conjunction is
    # cost-gated OFF — NO semi-join, the position shuffle alone
    plan_small = plan_of(searcher.scored(PhraseQ(("license", "file"))))
    assert plan_small.find("collect_list") >= 0, plan_small
    assert "LeftSemi" not in plan_small, plan_small

    # big-df route (threshold forced to 0): the positions aggregate must
    # sit ABOVE a doc_id semi join (only conjunction survivors' position
    # arrays reach the shuffle)
    old = searcher.PHRASE_CONJ_MIN_DF
    searcher.PHRASE_CONJ_MIN_DF = 0
    try:
        plan = plan_of(searcher.scored(PhraseQ(("license", "file"))))
    finally:
        searcher.PHRASE_CONJ_MIN_DF = old
    agg_at = plan.find("collect_list")
    assert agg_at >= 0, plan
    below = plan[agg_at:]
    assert "LeftSemi" in below, plan
    # and the phrase UDF is evaluated exactly once (no Filter-vs-Project
    # double ArrowEvalPython of the same UDF)
    assert plan.count("phrase_freq(plists") <= 2, plan  # defn + one eval ref


def test_ann_probe_partition_pruned(spark, tmp_path):
    from lucene_spark.pipeline import similarity

    rows = [(i, [float((i * 7 + j) % 13) - 6.0 for j in range(16)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ann_dir = str(tmp_path / "annidx")
    similarity.build_ann_index(emb, ann_dir, nbits=4, n_tables=2)
    index = spark.read.parquet(ann_dir)
    qv = rows[0][1]
    df = similarity.ann_topk(None, qv, 5, nbits=4, n_tables=2, index=index)
    plan = plan_of(df)
    # (table, bucket) are partition columns: the probe must prune, i.e.
    # carry PartitionFilters on both, and scan only candidate partitions
    pf = plan.split("PartitionFilters")[1][:400]
    assert "table" in pf and "bucket" in pf, plan
    # and the result agrees with a brute-force rerank over ALL vectors for
    # the probed candidate set (rows-only sanity: top-1 is the query itself)
    top = df.collect()
    assert top and top[0]["vec_id"] == 0, top
