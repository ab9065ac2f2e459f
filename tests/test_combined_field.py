"""CombinedFieldQuery / BM25F (sandbox/search/CombinedFieldQuery.java,
MultiNormsLeafSimScorer.java) — brute-force oracle over a two-field
index, plus the single-field degenerate case (weight 1.0 over just the
default field == plain TermQuery)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.bm25 import idf_double, score_double
from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import CombinedFieldQ, Searcher, TermQ
from lucene_spark.smallfloat import LENGTH_TABLE, int_to_byte4


@pytest.fixture(scope="module")
def cf_idx(spark, tmp_path_factory):
    pdf = make_corpus(120, seed=41)
    pdf["head"] = pdf["content"].str.slice(0, 120)
    idx_dir = str(tmp_path_factory.mktemp("cf_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", extra_fields={"head": "head"},
        num_buckets=4, salt_rows=64,
    )
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    return idx_dir, pdf


def _rows(df):
    return {
        int(r["doc_id"]): float(r["score"]) for r in df.collect()
    }


def _quant(dl: int) -> int:
    return int(LENGTH_TABLE[int_to_byte4(np.array([dl]))[0] & 0xFF])


def _brute(pdf, term, weights):
    """weights: {'content': w, 'head': w}. Returns doc_id -> score."""
    tf, dl = {}, {}
    for _, row in pdf.iterrows():
        d = int(row["doc_id"])
        for fld, w in weights.items():
            toks, _ = tokenize(row[fld])
            tf[(d, fld)] = toks.count(term)
            dl[(d, fld)] = len(toks)
    df_max, per_field_df = 0, {}
    for fld in weights:
        per_field_df[fld] = sum(
            1 for d in pdf["doc_id"] if tf[(int(d), fld)] > 0
        )
        df_max = max(df_max, per_field_df[fld])
    doc_count = max(
        sum(1 for d in pdf["doc_id"] if dl[(int(d), fld)] > 0)
        for fld in weights
    )
    sum_ttf = sum(
        w * sum(dl[(int(d), fld)] for d in pdf["doc_id"])
        for fld, w in weights.items()
    )
    avgdl = sum_ttf / doc_count
    w_idf = idf_double(df_max, doc_count)
    out = {}
    for _, row in pdf.iterrows():
        d = int(row["doc_id"])
        freq = sum(w * tf[(d, fld)] for fld, w in weights.items())
        if freq <= 0:
            continue
        rdl = int(np.floor(sum(
            np.float32(w) * np.float32(_quant(dl[(d, fld)]))
            for fld, w in weights.items()
        ) + 0.5))
        qdl = _quant(rdl)
        out[d] = float(
            score_double(
                np.array([freq]), np.array([qdl]), w_idf, avgdl
            )[0]
        )
    return out


def test_combined_field_vs_brute(spark, cf_idx):
    idx_dir, pdf = cf_idx
    s = Searcher(Index(spark, idx_dir), scoring="double")
    got = _rows(s.scored(
        CombinedFieldQ(("merge",), (("content", 1.0), ("head", 2.0)))
    ))
    want = _brute(pdf, "merge", {"content": 1.0, "head": 2.0})
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])


def test_single_field_weight_one_is_plain_term(spark, cf_idx):
    idx_dir, _pdf = cf_idx
    s = Searcher(Index(spark, idx_dir), scoring="double")
    cf = _rows(s.scored(CombinedFieldQ(("sort",), (("content", 1.0),))))
    tq = _rows(s.scored(TermQ("sort")))
    assert set(cf) == set(tq)
    for d in cf:
        assert abs(cf[d] - tq[d]) < 1e-9


def test_weight_below_one_rejected(spark, cf_idx):
    idx_dir, _pdf = cf_idx
    s = Searcher(Index(spark, idx_dir))
    with pytest.raises(ValueError):
        s.scored(CombinedFieldQ(("merge",), (("content", 0.5),)))
