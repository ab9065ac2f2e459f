"""Commit points, time travel, rollback, snapshots and commit-aware GC
(IndexWriter.commit / DirectoryReader.listCommits / open(IndexCommit) /
IndexWriter.rollback / SnapshotDeletionPolicy /
KeepOnlyLastCommitDeletionPolicy / IndexFileDeleter analogs — see
lucene_spark/index/commits.py for the file:line citations).
"""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.corpus import make_corpus
from lucene_spark.index import (
    Index,
    SnapshotDeletionPolicy,
    build_index,
    commit_point,
    compact_index,
    delete_docs,
    list_commits,
    purge_commits,
    read_commit,
    rollback,
    update_doc_values,
)
from lucene_spark.index.builder import _update_manifest
from lucene_spark.search import Searcher, TermQ

N_DOCS = 120


@pytest.fixture()
def built(spark, tmp_path):
    pdf = make_corpus(N_DOCS, seed=9)
    pdf["stars"] = [i % 7 for i in range(len(pdf))]
    idx_dir = str(tmp_path / "idx")
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        keep_cols=["lang", "stars"],
        num_buckets=4,
        salt_rows=64,
    )
    return idx_dir


def test_build_creates_commit_point(spark, built):
    commits = list_commits(built)
    assert [c["gen"] for c in commits] == [1]
    # make_corpus appends its mandated edge rows beyond N_DOCS
    assert commits[0]["n"] == Index(spark, built).N >= N_DOCS
    # the live manifest is stamped with the same gen
    assert Index(spark, built).manifest["gen"] == 1
    # commit content == live manifest content
    assert read_commit(built, 1)["paths"] == Index(spark, built).manifest["paths"]


def test_commit_noop_without_changes(spark, built):
    assert commit_point(built) == 1  # nothing changed since the build
    assert [c["gen"] for c in list_commits(built)] == [1]
    # force / user_data make an empty commit non-empty (setLiveCommitData)
    g = commit_point(built, user_data={"tag": "backup-1"})
    assert g == 2
    assert list_commits(built)[-1]["user_data"] == {"tag": "backup-1"}


def test_mutators_create_commits_and_time_travel(spark, built):
    stars5 = Index(spark, built).docs.filter("doc_id = 5").head()["stars"]
    dele = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    delete_docs(spark, built, dele)
    upd = spark.createDataFrame([(5, 999)], "doc_id long, value long")
    update_doc_values(spark, built, upd, "stars")
    gens = [c["gen"] for c in list_commits(built)]
    assert gens == [1, 2, 3]

    # current view: deletes + dv update applied
    cur = Index(spark, built)
    assert cur.deletes is not None and cur.deletes.count() == 3
    assert cur.docs.filter("doc_id = 5").select("stars").head()["stars"] == 999

    # time travel to the pre-delete commit: no deletes, original stars
    old = Index(spark, built, commit=1)
    assert old.deletes is None
    assert old.docs.filter("doc_id = 5").head()["stars"] == stars5

    # mid commit: deletes visible, dv update not
    mid = Index(spark, built, commit=2)
    assert mid.deletes is not None and mid.deletes.count() == 3
    assert mid.docs.filter("doc_id = 5").head()["stars"] == stars5


def test_time_travel_search_masks_match_commit(spark, built):
    dele = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    delete_docs(spark, built, dele)
    hits_old = {
        r["doc_id"]
        for r in Searcher(Index(spark, built, commit=1))
        .doc_set(TermQ("the"))
        .collect()
    }
    hits_new = {
        r["doc_id"]
        for r in Searcher(Index(spark, built)).doc_set(TermQ("the")).collect()
    }
    assert hits_new == {d for d in hits_old if d >= 40}
    assert hits_old - hits_new  # the deleted range did match pre-delete


def test_rollback_restores_last_commit(spark, built):
    before = read_commit(built, 1)
    # an uncommitted manifest change (a mid-build stage write is the
    # real-world case; _update_manifest is exactly that code path)
    _update_manifest(built, "bogus_stage", {"rows": 1}, {"N": 1})
    assert Index(spark, built).N == 1
    after = rollback(built)
    assert after["N"] == before["N"] > 1
    assert "bogus_stage" not in after["stages"]
    assert after == before


def test_rollback_requires_a_commit(tmp_path):
    with pytest.raises(FileNotFoundError):
        rollback(str(tmp_path))


def test_snapshot_refcount(spark, built):
    commit_point(built, user_data={"k": 1})  # gen 2
    pol = SnapshotDeletionPolicy(built)
    assert pol.snapshot() == 2  # defaults to newest
    assert pol.snapshot(2) == 2  # second pin on the same gen
    pol.release(2)
    assert pol.get_snapshots() == [2]  # still pinned once
    pol.release(2)
    assert pol.get_snapshots() == []
    with pytest.raises(KeyError):
        pol.release(2)
    with pytest.raises(FileNotFoundError):
        pol.snapshot(99)


def test_purge_keeps_snapshots_and_gcs_unreferenced_dirs(spark, built):
    n = Index(spark, built).N
    dele = spark.createDataFrame([(0,), (1,)], "doc_id long")
    delete_docs(spark, built, dele)          # gen 2
    compact_index(spark, built)              # gen 3: fresh *_compact1 dirs
    assert [c["gen"] for c in list_commits(built)] == [1, 2, 3]

    # snapshot protects gen 1's data through the purge
    SnapshotDeletionPolicy(built).snapshot(1)
    rep = purge_commits(built, keep_last=1)
    assert rep["retained"] == [1, 3] and rep["dropped"] == [2]
    # gen 1 still opens: its postings/docs dirs survived the GC
    assert Index(spark, built, commit=1).docs.count() == n
    assert Index(spark, built).docs.count() == n - 2

    # release the pin: the next purge reclaims the pre-compaction dirs
    SnapshotDeletionPolicy(built).release(1)
    rep = purge_commits(built, keep_last=1)
    assert rep["retained"] == [3] and rep["dropped"] == [1]
    assert "postings" in rep["gc_removed_dirs"]
    assert not os.path.exists(os.path.join(built, "postings"))
    assert os.path.exists(os.path.join(built, "postings_compact1"))
    # the current index is untouched by GC
    idx = Index(spark, built)
    assert idx.docs.count() == n - 2
    assert Searcher(idx).top_k(TermQ("the"), k=5).count() == 5
    with pytest.raises(FileNotFoundError):
        read_commit(built, 1)


def test_purge_never_drops_live_paths(spark, built):
    # even with every commit file gone but one, GC must keep everything
    # the LIVE manifest references (an uncommitted delete segment)
    dele = spark.createDataFrame([(3,)], "doc_id long")
    delete_docs(spark, built, dele)  # gen 2 references deletes_seg0
    rep = purge_commits(built, keep_last=1)
    assert rep["gc_removed_dirs"] == []
    assert Index(spark, built).deletes.count() == 1
