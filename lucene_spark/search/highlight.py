"""Passage highlighting — the UnifiedHighlighter analog
(highlighter/.../UnifiedHighlighter.java:93): find query-term match
offsets in the stored text, pick the best window, mark the matches.

Spark shape: the top-k hits (a handful of rows) broadcast-join back to
the corpus snapshot (the stored-fields fetch), then one Arrow-batched
UDF does offset discovery + passage scoring per document. Passage score
= number of query-term matches inside the window (ties: earliest
window), the BreakIterator-free core of the reference's passage scorer.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.index.reader import Index

_HL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("passage", T.StringType()),
        T.StructField("n_matches", T.IntegerType()),
        T.StructField("first_offset", T.IntegerType()),
    ]
)


def _term_offsets(text: str, terms: list[str]) -> list[tuple[int, int]]:
    """(start, end) offsets of whole-token query-term matches."""
    low = text.lower()
    pat = re.compile(
        r"(?<![0-9a-z_])(" + "|".join(re.escape(t) for t in terms) + r")(?![0-9a-z_])"
    )
    return [(m.start(), m.end()) for m in pat.finditer(low)]


def highlight(
    index: Index,
    hits: DataFrame,
    terms: list[str],
    window: int = 120,
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """hits(doc_id, ...) -> (doc_id, passage, n_matches, first_offset).

    Docs with no match get a null passage and first_offset = -1 (the
    reference returns no fragments for non-matching fields)."""
    text_col = index.manifest["text_col"]
    fetched = F.broadcast(hits.select("doc_id")).join(
        index.corpus.select("doc_id", text_col), "doc_id"
    )
    terms = [t.lower() for t in terms]

    def fn(iterator):
        for pdf in iterator:
            out = {"doc_id": [], "passage": [], "n_matches": [], "first_offset": []}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                text = text or ""
                offs = _term_offsets(text, terms)
                out["doc_id"].append(doc_id)
                p, n, fo = _passage_from_spans(text, offs, window, pre, post)
                out["passage"].append(p)
                out["n_matches"].append(n)
                out["first_offset"].append(fo)
            yield pd.DataFrame(out)

    return fetched.mapInPandas(fn, schema=_HL_SCHEMA)


def _passage_from_spans(text, offs, window, pre, post):
    """Sorted match spans -> (passage | None, n_matches, first_offset)."""
    if not offs:
        return None, 0, -1
    # best window: slide over match starts, count matches inside
    best_i, best_n = 0, 0
    for i, (s, _) in enumerate(offs):
        n = sum(1 for s2, e2 in offs[i:] if e2 <= s + window)
        if n > best_n:
            best_i, best_n = i, n
    w_start = offs[best_i][0]
    w_end = min(len(text), w_start + window)
    inside = [(s, e) for s, e in offs if s >= w_start and e <= w_end]
    frag, prev = [], w_start
    for s, e in inside:
        frag.append(text[prev:s])
        frag.append(pre + text[s:e] + post)
        prev = e
    frag.append(text[prev:w_end])
    return "".join(frag), len(inside), offs[0][0]


_MATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("m_start", T.IntegerType()),
        T.StructField("m_end", T.IntegerType()),
    ]
)


def highlight_from_index(
    index: Index,
    hits: DataFrame,
    terms: list[str],
    field: str | None = None,
    window: int = 120,
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """Offset-accurate highlighting from INDEXED offsets — no stored-text
    re-scan/re-tokenize (UnifiedHighlighter.OffsetSource.POSTINGS,
    highlighter/.../FieldOffsetStrategy.java: match offsets come straight
    from the postings' offset stream). Requires an index built with
    ``with_offsets=True``; the match discovery is one bucket-pruned
    postings scan sliced to the broadcast top-k docIDs, so huge stored
    docs never get re-tokenized on the query path."""
    if not index.manifest.get("with_offsets"):
        raise ValueError(
            "index was built without offsets (build_index(with_offsets=True))"
        )
    terms = [t.lower() for t in terms]
    hit_ids = np.sort(
        np.array(
            [r["doc_id"] for r in hits.select("doc_id").collect()],
            dtype=np.int64,
        )
    )
    bids = index.spark.sparkContext.broadcast(hit_ids)
    rows = index.postings_for_terms(terms, field).select("blocks", "off")

    def decode_fn(iterator):
        from lucene_spark.codec import decode_block, decode_value_stream

        for pdf in iterator:
            out_d, out_s, out_e = [], [], []
            for blocks, off_bin in zip(pdf["blocks"], pdf["off"]):
                docs, freqs = [], []
                for blk in blocks:
                    d, f, _nm = decode_block(blk)
                    docs.append(d)
                    freqs.append(f)
                d = np.concatenate(docs)
                f = np.concatenate(freqs)
                sel = np.flatnonzero(np.isin(d, bids.value))
                if not len(sel):
                    continue
                off = (
                    decode_value_stream(bytes(off_bin))
                    .astype(np.int64)
                    .reshape(-1, 2)
                )
                bounds = np.concatenate([[0], np.cumsum(f)]).astype(np.int64)
                for i in sel:
                    chunk = off[bounds[i] : bounds[i + 1]]
                    starts = np.cumsum(chunk[:, 0])
                    ends = starts + chunk[:, 1]
                    out_d.extend([int(d[i])] * len(starts))
                    out_s.extend(starts.tolist())
                    out_e.extend(ends.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(out_d, dtype=np.int64),
                    "m_start": np.asarray(out_s, dtype=np.int32),
                    "m_end": np.asarray(out_e, dtype=np.int32),
                }
            )

    matches = rows.mapInPandas(decode_fn, schema=_MATCH_SCHEMA)
    text_col = index.manifest["text_col"]
    fetched = F.broadcast(hits.select("doc_id")).join(
        index.corpus.select("doc_id", text_col), "doc_id"
    )
    joined = fetched.join(matches, "doc_id", "left")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = int(pdf["doc_id"].iat[0])
        text = pdf[text_col].iat[0] or ""
        spans = sorted(
            {
                (int(s), int(e))
                for s, e in zip(pdf["m_start"], pdf["m_end"])
                if pd.notna(s)
            }
        )
        p, n, fo = _passage_from_spans(text, spans, window, pre, post)
        return pd.DataFrame(
            {
                "doc_id": [doc_id],
                "passage": [p],
                "n_matches": [n],
                "first_offset": [fo],
            }
        )

    return joined.groupBy("doc_id").applyInPandas(build, schema=_HL_SCHEMA)
