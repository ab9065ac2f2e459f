"""MultiSimilarity (sum of sub-scores, MultiSimilarity.java:30-76) and
PerFieldSimilarityWrapper (field-dispatched similarity,
PerFieldSimilarityWrapper.java:31-47) — scorer math + registry seam,
plus an e2e check that the per-field wrapper picks different
similarities for different fields through the Searcher."""

from __future__ import annotations

import numpy as np

from lucene_spark.similarities import (
    BooleanSimilarity,
    ClassicSimilarity,
    MultiSimilarity,
    PerFieldSimilarityWrapper,
    by_name,
)


def _score(sim, df=3, ttf=9, n=100, sttf=5000, boost=1.0,
           freqs=(1.0, 2.0, 5.0), qdl=(8, 16, 32)):
    w = sim.weight(df, ttf, n, sttf, boost)
    return sim.score(np.asarray(freqs), np.asarray(qdl, dtype=np.float64), w)


def test_multi_is_sum_of_children():
    classic = ClassicSimilarity()
    boolean = BooleanSimilarity()
    multi = MultiSimilarity(["classic", "boolean"])
    got = _score(multi)
    want = _score(classic) + _score(boolean)
    assert np.allclose(got, want)


def test_multi_registry_and_combined_flag():
    m = by_name("multi", sims=["classic", "classic"])
    assert isinstance(m, MultiSimilarity)
    assert m.supports_combined  # classic supports combined weights
    m2 = MultiSimilarity(["classic", "lmdirichlet"])
    assert not m2.supports_combined  # LM models have no summed-idf combine


def test_per_field_dispatch():
    pf = PerFieldSimilarityWrapper(
        "classic", {"head": BooleanSimilarity()}
    )
    # default field -> classic scores
    w = pf.weight(3, 9, 100, 5000, 1.0, field=None)
    got = pf.score(np.array([2.0]), np.array([16.0]), w)
    want = _score(ClassicSimilarity(), freqs=(2.0,), qdl=(16,))
    assert np.allclose(got, want)
    # mapped field -> boolean score (= boost)
    w2 = pf.weight(3, 9, 100, 5000, 2.5, field="head")
    got2 = pf.score(np.array([2.0]), np.array([16.0]), w2)
    assert np.allclose(got2, [2.5])
    assert pf.get("head").name == "boolean"
    assert pf.get("other").name == "classic"


def test_per_field_e2e_searcher(spark, tmp_path_factory):
    import pandas as pd

    from lucene_spark.index import Index, build_index
    from lucene_spark.search import Searcher, TermQ

    pdf = pd.DataFrame({
        "doc_id": range(8),
        "text": ["data line merge"] * 4 + ["data data data line"] * 4,
        "head": ["data big"] * 8,
    })
    idx_dir = str(tmp_path_factory.mktemp("pf_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="text", extra_fields={"head": "head"}, doc_id_col="doc_id",
        num_buckets=2, salt_rows=16,
    )
    idx = Index(spark, idx_dir)
    pf = PerFieldSimilarityWrapper("classic", {"head": "boolean"})
    s = Searcher(idx, scoring="double", similarity=pf)
    # default field scores like plain classic
    want = {r["doc_id"]: round(r["score"], 6) for r in
            Searcher(idx, scoring="double", similarity="classic")
            .scored(TermQ("data")).collect()}
    got = {r["doc_id"]: round(r["score"], 6)
           for r in s.scored(TermQ("data")).collect()}
    assert got == want
    # 'head' field scores boolean: every match == boost (1.0)
    rows = s.scored(TermQ("data", field="head")).collect()
    assert rows and all(abs(r["score"] - 1.0) < 1e-9 for r in rows)
