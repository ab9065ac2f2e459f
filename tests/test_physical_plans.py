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
