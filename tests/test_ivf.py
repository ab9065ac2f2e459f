"""IVF coarse-quantizer ANN (pipeline/similarity.py ivf_*) — assignment
parity with the numpy oracle, exactness when every cell is probed,
Lloyd training improving quantization error, and recall of the trained
index at nprobe < n_cells."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.pipeline import similarity as S

N, DIM, CELLS = 400, 16, 8


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    # clustered data so k-means has structure to find
    centers = rng.standard_normal((CELLS, DIM)) * 3
    rows = []
    for i in range(N):
        c = int(rng.integers(CELLS))
        v = centers[c] + rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()


def _np_vectors(emb):
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_assign_matches_numpy(emb):
    C = S.ivf_centroids_random(DIM, CELLS)
    got = {r["id"]: r["cell"] for r in S.ivf_assign(emb, C).collect()}
    M = _np_vectors(emb)
    want = S._assign_cells(M, C)
    assert [got[i] for i in range(N)] == list(want)


def test_full_probe_equals_brute_force(emb):
    """nprobe = n_cells probes everything -> identical to exact top-k."""
    C = S.ivf_centroids_random(DIM, CELLS)
    qv = [float(x) for x in _np_vectors(emb)[7]]
    ivf = [
        (r["vec_id"], r["cos"])
        for r in S.ivf_topk(emb, qv, 10, C, nprobe=CELLS).collect()
    ]
    brute = [
        (r["vec_id"], r["cos"]) for r in S.cosine_topk(emb, qv, 10).collect()
    ]
    assert ivf == brute


def test_train_reduces_quantization_error(emb):
    M = _np_vectors(emb)
    C0 = S.ivf_centroids_random(DIM, CELLS)
    C5 = S.ivf_train(emb, CELLS, n_iters=5)

    def qerr(C):
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return float(d.min(axis=1).mean())

    assert qerr(C5) < qerr(C0) * 0.7


def test_trained_recall_at_nprobe2(emb):
    C = S.ivf_train(emb, CELLS, n_iters=5)
    M = _np_vectors(emb)
    hits = total = 0
    for qid in (3, 57, 211):
        qv = [float(x) for x in M[qid]]
        got = {r["vec_id"] for r in S.ivf_topk(emb, qv, 10, C, nprobe=2).collect()}
        want = {r["vec_id"] for r in S.cosine_topk(emb, qv, 10).collect()}
        hits += len(got & want)
        total += len(want)
    assert hits / total >= 0.7  # clustered data: nprobe=2 of 8 cells


def test_index_probe_matches_inline_assign(emb, tmp_path):
    C = S.ivf_centroids_random(DIM, CELLS)
    d = str(tmp_path / "ivf")
    S.build_ivf_index(emb, d, C)
    idx = emb.sparkSession.read.parquet(d)
    qv = [float(x) for x in _np_vectors(emb)[7]]
    via_index = [r["vec_id"] for r in S.ivf_topk(None, qv, 10, C, 2, index=idx).collect()]
    inline = [r["vec_id"] for r in S.ivf_topk(emb, qv, 10, C, 2).collect()]
    assert via_index == inline


def test_ivf_probe_partition_pruned(emb, tmp_path):
    """Scale guard: probing a build_ivf_index layout must prune on the
    cell partition column (PartitionFilters), like the LSH probe."""
    C = S.ivf_centroids_random(DIM, CELLS)
    d = str(tmp_path / "ivf_prune")
    S.build_ivf_index(emb, d, C)
    idx = emb.sparkSession.read.parquet(d)
    qv = [float(x) for x in _np_vectors(emb)[3]]
    df = S.ivf_topk(None, qv, 5, C, nprobe=2, index=idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1][:300]
    assert "cell" in pf, plan
