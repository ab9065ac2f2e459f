"""Per-segment HNSW ANN (pipeline/hnsw.py) — graph-build diversity
invariants, search recall vs brute force on the numpy core, e2e
build/search through Spark with the multi-segment merge, and
determinism of the persisted index."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from lucene_spark.pipeline import hnsw as H
from lucene_spark.pipeline import similarity as S

N, DIM = 500, 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(9)
    rows = [
        (i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(N)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()


def _np_vectors(emb):
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


# --- numpy core -----------------------------------------------------------


def test_build_graph_fanout_capped():
    rng = np.random.RandomState(0)
    V = H._normalize(rng.randn(200, DIM))
    g = H._build_graph(V, max_conn=8, beam_width=16, seed=3)
    assert all(len(nbrs) <= 8 for nbrs in g)
    # every non-first node got linked somewhere (connected enough to search)
    assert sum(len(nbrs) for nbrs in g) > 0
    # undirected-ish: a fresh node's forward links got back-links unless trimmed
    linked = set()
    for i, nbrs in enumerate(g):
        linked.add(i) if nbrs else None
        linked.update(nbrs)
    assert len(linked) == 200


def test_core_search_recall():
    rng = np.random.RandomState(1)
    V = H._normalize(rng.randn(400, DIM))
    g = H._build_graph(V, max_conn=16, beam_width=32, seed=7)
    recs = []
    for qi in range(10):
        qv = H._normalize(rng.randn(1, DIM))[0]
        exact = set(np.argsort(-(V @ qv))[:10].tolist())
        ords, _ = H._search_graph(
            V, g, qv, topk=10, num_seed=64, rng=np.random.RandomState(2))
        recs.append(len(set(ords) & exact) / 10)
    assert sum(recs) / len(recs) >= 0.9


# --- e2e through Spark ----------------------------------------------------


@pytest.fixture(scope="module")
def hnsw_index(spark, emb, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hnsw") / "idx")
    H.build_hnsw_index(emb, out, n_segments=3, max_conn=16, beam_width=32)
    return spark.read.parquet(out)


def test_index_shape(hnsw_index):
    assert hnsw_index.count() == N
    segs = [r["segment"] for r in
            hnsw_index.select("segment").distinct().collect()]
    assert sorted(segs) == [0, 1, 2]
    # ords dense per segment
    for s in segs:
        ords = [r["ord"] for r in
                hnsw_index.filter(F.col("segment") == s).select("ord").collect()]
        assert sorted(ords) == list(range(len(ords)))


def test_e2e_recall_vs_brute(emb, hnsw_index):
    M = _np_vectors(emb)
    recs = []
    for qi in (0, 1, 2, 3, 4):
        qv = [float(x) for x in M[qi]]
        exact = {r["vec_id"] for r in S.cosine_topk(emb, qv, 10).collect()}
        got = {r["vec_id"] for r in
               H.hnsw_topk(qv, 10, hnsw_index, num_seed=64).collect()}
        recs.append(len(got & exact) / 10)
    assert sum(recs) / len(recs) >= 0.9
    # the query vector itself is always its own nearest neighbor
    qv = [float(x) for x in M[0]]
    top = H.hnsw_topk(qv, 1, hnsw_index, num_seed=64).collect()
    assert top and top[0]["vec_id"] == 0 and abs(top[0]["cos"] - 1.0) < 1e-6


def test_build_deterministic(spark, emb, tmp_path_factory):
    out2 = str(tmp_path_factory.mktemp("hnsw2") / "idx")
    H.build_hnsw_index(emb, out2, n_segments=3, max_conn=16, beam_width=32)
    idx2 = spark.read.parquet(out2)
    a = sorted(
        (r["segment"], r["vec_id"], tuple(r["neighbors"]))
        for r in idx2.collect()
    )
    # rebuild into a third dir: byte-identical graphs
    out3 = str(tmp_path_factory.mktemp("hnsw3") / "idx")
    H.build_hnsw_index(emb, out3, n_segments=3, max_conn=16, beam_width=32)
    b = sorted(
        (r["segment"], r["vec_id"], tuple(r["neighbors"]))
        for r in spark.read.parquet(out3).collect()
    )
    assert a == b
