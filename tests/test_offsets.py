"""Indexed character offsets (IndexOptions ..._AND_OFFSETS,
Lucene90PostingsFormat.java:64-78) + offset-source highlighting
(UnifiedHighlighter OffsetSource.POSTINGS).

Ground truth is re.finditer over the stored text — the offsets read
back from the compressed postings must reproduce it exactly, including
after a delete + compaction cycle.
"""

import re

import numpy as np
import pytest

from lucene_spark.codec import decode_block, decode_value_stream
from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.index.builder import compact_index, delete_docs
from lucene_spark.index.check import check_index
from lucene_spark.search import Searcher, TermQ
from lucene_spark.search.highlight import highlight, highlight_from_index

N_DOCS = 120


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_corpus(N_DOCS, seed=11)
    idx_dir = str(tmp_path_factory.mktemp("idx_off"))
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
    )
    return Index(spark, idx_dir), pdf


def _truth_offsets(index, term):
    """{doc_id: [(start, end), ...]} from re-scanning stored text."""
    rx = re.compile(r"(?<![0-9a-z_])" + re.escape(term) + r"(?![0-9a-z_])")
    out = {}
    for r in index.corpus.select("doc_id", "content").collect():
        spans = [(m.start(), m.end()) for m in rx.finditer((r["content"] or "").lower())]
        if spans:
            out[int(r["doc_id"])] = spans
    return out


def _decoded_offsets(index, term):
    """{doc_id: [(start, end), ...]} decoded from the off stream."""
    out = {}
    for row in index.postings_for_terms([term]).collect():
        docs, freqs = [], []
        for blk in row["blocks"]:
            d, f, _ = decode_block(blk)
            docs.append(d)
            freqs.append(f)
        d = np.concatenate(docs)
        f = np.concatenate(freqs)
        off = decode_value_stream(bytes(row["off"])).astype(np.int64).reshape(-1, 2)
        bounds = np.concatenate([[0], np.cumsum(f)]).astype(np.int64)
        for i in range(len(d)):
            chunk = off[bounds[i] : bounds[i + 1]]
            starts = np.cumsum(chunk[:, 0])
            out[int(d[i])] = list(zip(starts.tolist(), (starts + chunk[:, 1]).tolist()))
    return out


@pytest.mark.parametrize("term", ["import", "merge", "value"])
def test_offsets_roundtrip(built, term):
    index, _ = built
    want = _truth_offsets(index, term)
    got = _decoded_offsets(index, term)
    assert got == want


def test_checkindex_offsets_invariant(built):
    index, _ = built
    report = check_index(index)
    assert report["posting_violations"] == {}


def test_highlight_from_index_matches_rescan(built):
    index, _ = built
    s = Searcher(index)
    hits = s.top_k(TermQ("class"), 8)
    a = {
        r["doc_id"]: (r["passage"], r["n_matches"], r["first_offset"])
        for r in highlight(index, hits, ["class"]).collect()
    }
    b = {
        r["doc_id"]: (r["passage"], r["n_matches"], r["first_offset"])
        for r in highlight_from_index(index, hits, ["class"]).collect()
    }
    assert a == b
    assert any(v[1] > 0 for v in b.values())


def test_offsets_survive_delete_compact(built, spark):
    index, _ = built
    term = "import"
    before = _decoded_offsets(index, term)
    victims = sorted(before)[:3]
    delete_docs(
        spark, index.index_dir,
        spark.createDataFrame([(int(v),) for v in victims], "doc_id long"),
    )
    compact_index(spark, index.index_dir)
    idx2 = Index(spark, index.index_dir)
    after = _decoded_offsets(idx2, term)
    want = {d: v for d, v in before.items() if d not in victims}
    assert after == want
    assert check_index(idx2)["posting_violations"] == {}
