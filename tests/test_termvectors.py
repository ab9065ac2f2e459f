"""Term vectors (Lucene90TermVectorsFormat / IndexReader.getTermVector
analog): the doc-major table must reproduce, per document, exactly the
term/freq/position/offset stream the analyzer emits — ground truth is
a direct analyze_batch pass over the stored text. Also covers the
TERM_VECTORS highlight offset source (vs the POSTINGS source) and the
MoreLikeThis term-vector fast path (vs the re-analyze path).
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.analysis import analyze_batch
from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index, build_term_vectors
from lucene_spark.index.termvectors import highlight_from_tvec
from lucene_spark.search import Searcher, TermQ
from lucene_spark.search.highlight import highlight_from_index

N_DOCS = 120


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_corpus(N_DOCS, seed=23)
    idx_dir = str(tmp_path_factory.mktemp("idx_tvec"))
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        keep_cols=["lang"],
        num_buckets=4,
        salt_rows=64,
        with_offsets=True,
        with_term_vectors=True,
    )
    return Index(spark, idx_dir), pdf


def _truth_vector(index, doc_id):
    """{term: (freq, positions, starts, lengths)} by re-analyzing the
    stored text with the manifest-pinned chain."""
    text = (
        index.corpus.filter(f"doc_id = {doc_id}")
        .select("content")
        .collect()[0][0]
    )
    an = analyze_batch(pd.Series([text]), analyzer=index.analyzer,
                       want_offsets=True)
    terms = an["terms"].iloc[0]
    poss = an["positions"].iloc[0]
    offs = np.asarray(an["offsets"].iloc[0], dtype=np.int64).reshape(-1, 2)
    out = {}
    for i, t in enumerate(terms):
        f, p, s, l = out.setdefault(t, [0, [], [], []])
        out[t][0] += 1
        p.append(int(poss[i]))
        s.append(int(offs[i, 0]))
        l.append(int(offs[i, 1]))
    return out


def test_vector_matches_reanalysis(built):
    index, _pdf = built
    assert index.manifest.get("with_term_vectors") is True
    for doc_id in (0, 7, N_DOCS - 1):
        truth = _truth_vector(index, doc_id)
        rows = index.term_vector(doc_id).collect()
        got = {
            r["term"]: (
                int(r["freq"]),
                list(r["positions"]),
                list(r["starts"]),
                list(r["lengths"]),
            )
            for r in rows
        }
        assert set(got) == set(truth)
        for t, (f, p, s, l) in truth.items():
            assert got[t] == (f, p, s, l), t


def test_freq_agrees_with_postings_ttf(built):
    """Column-sums over the doc-major table must equal the term-major
    stats table (the transpose preserves mass)."""
    import pyspark.sql.functions as F

    index, _ = built
    tv = index.term_vectors.groupBy("term").agg(
        F.sum("freq").alias("ttf"), F.count("*").alias("df")
    )
    st = index.term_stats.groupBy("term").agg(
        F.sum("ttf").alias("ttf2"), F.sum("df").alias("df2")
    )
    diff = (
        tv.join(st, "term", "full")
        .filter(
            "ttf IS NULL OR ttf2 IS NULL OR ttf != ttf2 OR df != df2"
        )
        .count()
    )
    assert diff == 0


def test_highlight_sources_agree(built):
    """TERM_VECTORS and POSTINGS offset sources must produce identical
    passages for the same hits and terms."""
    index, _ = built
    s = Searcher(index)
    hits = s.top_k(TermQ("license"), 8)
    a = {
        r["doc_id"]: (r["passage"], r["n_matches"], r["first_offset"])
        for r in highlight_from_index(index, hits, ["license"]).collect()
    }
    b = {
        r["doc_id"]: (r["passage"], r["n_matches"], r["first_offset"])
        for r in highlight_from_tvec(index, hits, ["license"]).collect()
    }
    assert a == b and len(a) == 8


def test_mlt_paths_agree(built, spark, tmp_path_factory):
    """more_like_this via term vectors == via stored-text re-analysis."""
    index, pdf = built
    s_tvec = Searcher(index)
    q_tvec = s_tvec.more_like_this(5, max_terms=8)

    idx2 = str(tmp_path_factory.mktemp("idx_notvec"))
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx2,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        num_buckets=4,
        salt_rows=64,
    )
    s_plain = Searcher(Index(spark, idx2))
    q_plain = s_plain.more_like_this(5, max_terms=8)
    assert q_tvec == q_plain


def test_doc_id_filter_pushed(built):
    """The per-doc fetch must push the doc_id filter to the scan."""
    index, _ = built
    plan = index.term_vector(3)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan


def test_build_on_existing_index_resumes(built, spark):
    index, _ = built
    # second call is a resume no-op (stage already committed)
    path = build_term_vectors(spark, index.index_dir, resume=True)
    assert path == index.manifest["paths"]["tvec"]
