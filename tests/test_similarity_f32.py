"""Float32 scoring mode for the similarity zoo.

Reference cast semantics: SimilarityBase.score() computes the model in
DOUBLE and SimScorer#score returns float (SimilarityBase.java:218-225),
so double math + one final float32 cast IS the reference float
arithmetic for every SimilarityBase subclass; ClassicSimilarity/TFIDF
computes per-step in float (TFIDFSimilarity.java:497-503) and overrides
score_f32 accordingly. Searcher(scoring="lucene", similarity=...) now
routes through score_f32 + the float-cast sum combine.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark import similarities as S
from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import BoolQ, Searcher, TermQ


def test_score_f32_dtype_and_closeness():
    rng = np.random.default_rng(7)
    f = rng.integers(1, 50, 500).astype(np.float64)
    qdl = rng.integers(1, 500, 500).astype(np.float64)
    for name in ("classic", "boolean", "lmdirichlet", "lmjelinekmercer",
                 "dfi", "dfr", "ib", "sweetspot"):
        try:
            sim = S.by_name(name)
        except (KeyError, TypeError):
            continue
        w = sim.weight(10, 30, 1000, 50000, 1.3)
        d = sim.score(f, qdl, w)
        x = sim.score_f32(f, qdl, w)
        assert x.dtype == np.float32, name
        assert np.allclose(d, x.astype(np.float64), rtol=2e-4, atol=1e-6), name


def test_classic_f32_is_per_step_float():
    sim = S.by_name("classic")
    w = sim.weight(3, 9, 100, 5000, 1.0)
    f = np.array([7.0])
    qdl = np.array([13.0])
    # per-step float32: tf and lengthNorm each rounded to f32 BEFORE the
    # product (TFIDF), not one final cast of the double product
    tf = np.float32(np.sqrt(np.float32(7.0)))
    norm = np.float32(np.float32(1.0) / np.sqrt(np.float32(13.0)))
    expect = np.float32(tf * np.float32(w[0]) * norm)
    assert sim.score_f32(f, qdl, w)[0] == expect


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_corpus(400, seed=5)
    idx_dir = str(tmp_path_factory.mktemp("idx_simf32"))
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        num_buckets=4,
        salt_rows=128,
    )
    return Index(spark, idx_dir)


@pytest.mark.parametrize("name", ["classic", "lmdirichlet", "boolean"])
def test_f32_mode_rank_identical_to_double(built, name):
    q = BoolQ(should=(TermQ("license"), TermQ("apache"), TermQ("var_17")))
    dd = Searcher(built, scoring="double", similarity=name).top_k(q, 15).collect()
    ff = Searcher(built, scoring="lucene", similarity=name).top_k(q, 15).collect()
    assert [r["doc_id"] for r in dd] == [r["doc_id"] for r in ff]
    for a, b in zip(dd, ff):
        assert abs(a["score"] - b["score"]) <= 1e-4 * max(1.0, abs(a["score"]))
