"""100-TB scale guards: the quadratic/driver-memory blowups that stay
invisible at test scale must be bounded IN THE PLAN, not by luck.

Covers the three guards added in round 5:
- jaccard_pairs' co-occurrence candidate generator caps shingle df
  (default 1000) — a hot shingle never self-joins quadratically;
- minhash_candidates caps bucket membership — an oversized
  (band, sig) bucket emits star pairs around its representative, O(n)
  instead of O(n^2), with side-a pruning BEFORE the join;
- multi-term scoring rewrites push maxClauseCount / max_expansions
  into the stats scan (CollectLimit / TakeOrdered in the physical
  plan), so a hostile prefix never collects the dictionary slice.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.pipeline import dedup
from lucene_spark.search import PrefixQ, Searcher


# --- jaccard_pairs df cap ----------------------------------------------------


def test_jaccard_default_cap_is_set():
    assert dedup.DEFAULT_MAX_SHINGLE_DF == 1000
    import inspect

    sig = inspect.signature(dedup.jaccard_pairs)
    assert sig.parameters["max_shingle_df"].default == 1000


def test_jaccard_cap_prunes_hot_shingles(spark):
    # 4 docs all sharing one hot 3-shingle run ("x y z"), two of them
    # also sharing a rare tail. With max_shingle_df=2 the hot shingles
    # (df=4) generate no candidates; the rare pair survives and its
    # jaccard is computed on the FULL sets.
    df = spark.createDataFrame(
        [
            (1, "x y z rare1 rare2 rare3 rare4"),
            (2, "x y z rare1 rare2 rare3 rare4"),
            (3, "x y z other stuff entirely here"),
            (4, "x y z more unrelated padding words"),
        ],
        "doc_id long, text string",
    )
    sh = dedup.shingle_hashes(df)
    got = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in dedup.jaccard_pairs(sh, 0.2, max_shingle_df=2).collect()
    }
    assert (1, 2) in got
    # full-set jaccard: identical docs -> 1.0 even though candidate
    # generation only saw the rare shingles
    assert got[(1, 2)] == 1.0
    # pairs sharing ONLY the hot run are not candidates under the cap
    # (their true jaccard is 1/9 ~= 0.11, so compare at tau=0.1)
    low = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(sh, 0.1, max_shingle_df=2).collect()
    }
    assert (3, 4) not in low
    # the uncapped generator finds them
    unc = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(sh, 0.1, max_shingle_df=None).collect()
    }
    assert (3, 4) in unc


def test_jaccard_cap_plan_has_semijoin(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    sh = dedup.shingle_hashes(df)
    plan = dedup.jaccard_pairs(sh, 0.3)._jdf.queryExecution().toString()
    assert "LeftSemi" in plan  # the df-cap pushes as a semi join


def test_jaccard_sql_twin_matches_capped_semantics(spark):
    rows = [
        (1, "x y z rare1 rare2 rare3 rare4"),
        (2, "x y z rare1 rare2 rare3 rare4"),
        (3, "x y z other stuff entirely here"),
        (4, "x y z more unrelated padding words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = sorted(
        tuple(r)
        for r in dedup.jaccard_pairs(
            dedup.shingle_hashes(df), 0.2, max_shingle_df=2
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            dedup.jaccard_pairs_sql(0.2, max_shingle_df=2)
        ).fetchall()
    )
    assert got == want


# --- minhash bucket cap ------------------------------------------------------


def test_minhash_bucket_cap_star_fallback(spark):
    # 4 identical docs share every band -> every bucket has 4 members.
    # With max_bucket=2 the candidate set must be the star around the
    # min docID, not all 6 pairs.
    txt = "the quick brown fox jumps over the lazy dog again today"
    df = spark.createDataFrame(
        [(i, txt) for i in (1, 2, 3, 4)], "doc_id long, text string"
    )
    bands = dedup.minhash_bands(df)
    star = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(bands, max_bucket=2).collect()
    }
    assert star == {(1, 2), (1, 3), (1, 4)}
    # default cap (10k) keeps all-pairs behavior at sane bucket sizes
    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(bands).collect()
    }
    assert full == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}


def test_minhash_star_preserves_clusters(spark):
    txt = "the quick brown fox jumps over the lazy dog again today"
    df = spark.createDataFrame(
        [(i, txt) for i in (1, 2, 3, 4)], "doc_id long, text string"
    )
    cands = dedup.minhash_candidates(dedup.minhash_bands(df), max_bucket=2)
    pairs = dedup.jaccard_pairs(
        dedup.shingle_hashes(df), 0.9, candidates=cands
    )
    got = {
        (r["doc_id"], r["cluster"])
        for r in dedup.cluster_duplicates(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_minhash_sql_twin_matches_star_semantics(spark):
    txt = "the quick brown fox jumps over the lazy dog again today"
    rows = [(i, txt) for i in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    cands = dedup.minhash_candidates(dedup.minhash_bands(df), max_bucket=2)
    got = sorted(
        tuple(r)
        for r in dedup.jaccard_pairs(
            dedup.shingle_hashes(df), 0.3, candidates=cands
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            dedup.minhash_pairs_sql(0.3, max_bucket=2)
        ).fetchall()
    )
    assert got == want


# --- scoring-rewrite driver-collect bound ------------------------------------


@pytest.fixture(scope="module")
def guard_idx(spark, tmp_path_factory):
    pdf = make_corpus(80, seed=17)
    idx_dir = str(tmp_path_factory.mktemp("guard_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", num_buckets=4, salt_rows=64,
    )
    return idx_dir


def test_scoring_rewrite_limit_in_plan(spark, guard_idx):
    s = Searcher(Index(spark, guard_idx))
    pred = s._multiterm_pred(PrefixQ("t", rewrite="scoring_boolean"))
    plan = s._predicate_term_stats_df(
        pred, None, limit=s.MAX_CLAUSE_COUNT + 1
    )._jdf.queryExecution().toString()
    assert "CollectLimit" in plan or "GlobalLimit" in plan
    plan_ord = s._predicate_term_stats_df(
        pred, None, order_limit=50
    )._jdf.queryExecution().toString()
    assert "TakeOrderedAndProject" in plan_ord


def test_scoring_rewrite_maxclause_raises_without_full_collect(spark, guard_idx):
    s = Searcher(Index(spark, guard_idx))
    s.MAX_CLAUSE_COUNT = 2  # instance override, class default stays 1024
    with pytest.raises(ValueError, match="maxClauseCount"):
        s._multiterm_scored(PrefixQ("t", rewrite="scoring_boolean"),
                            "scoring_boolean")


def test_top_terms_blended_pushdown_matches_driver_sort(spark, guard_idx):
    # the TakeOrdered pushdown must pick the same lexicographically
    # smallest expansions the old collect-everything-then-sort did
    s = Searcher(Index(spark, guard_idx))
    pred = s._multiterm_pred(PrefixQ("t"))
    pushed = s._predicate_term_stats(pred, None, order_limit=5)
    full = sorted(s._predicate_term_stats(pred, None))[:5]
    assert pushed == full
