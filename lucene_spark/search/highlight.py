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


# ---------------------------------------------------------------------------
# UnifiedHighlighter best-passages: sentence passages + PassageScorer
# ---------------------------------------------------------------------------

_PASSAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("passage", T.StringType()),
        T.StructField("p_start", T.IntegerType()),
        T.StructField("p_score", T.DoubleType()),
    ]
)

# sentence-boundary approximation of BreakIterator.getSentenceInstance:
# break after terminal punctuation + whitespace, and at newlines
_SENT_RE = re.compile(r"(?<=[.!?])\s+|\n+")


def _sentence_spans(text: str) -> list:
    spans, start = [], 0
    for m in _SENT_RE.finditer(text):
        if m.start() > start:
            spans.append((start, m.start()))
        start = m.end()
    if start < len(text):
        spans.append((start, len(text)))
    return spans or [(0, len(text))]


def passage_weight(content_len: int, ttf: int, k1=1.2, b=0.75, pivot=87.0) -> float:
    """PassageScorer.weight (uhighlight/PassageScorer.java:96-103):
    numDocs approximated from content length."""
    num_docs = 1 + content_len / pivot
    return (k1 + 1) * np.log(1 + (num_docs + 0.5) / (ttf + 0.5))


def passage_tf(freq: int, passage_len: int, k1=1.2, b=0.75, pivot=87.0) -> float:
    """PassageScorer.tf (PassageScorer.java:105-108)."""
    norm = k1 * ((1 - b) + b * (passage_len / pivot))
    return freq / (freq + norm)


def passage_norm(passage_start: int, pivot=87.0) -> float:
    """PassageScorer.norm (PassageScorer.java:110-112): gentle bias
    toward passages earlier in the document."""
    return 1 + 1 / np.log(pivot + passage_start)


def _score_passage(term_freqs_in_passage, term_freqs_in_doc, p_len, p_start,
                   content_len, k1, b, pivot):
    """PassageScorer.score (PassageScorer.java:114-136): per UNIQUE
    matched term, tf(passage freq, passage len) * weight(content len,
    doc freq); the sum scaled by norm(passage start)."""
    s = 0.0
    for t, fp in term_freqs_in_passage.items():
        s += passage_tf(fp, p_len, k1, b, pivot) * passage_weight(
            content_len, term_freqs_in_doc[t], k1, b, pivot
        )
    return float(s * passage_norm(p_start, pivot))


def _term_offsets_with_terms(text: str, terms: list) -> list:
    low = text.lower()
    pat = re.compile(
        r"(?<![0-9a-z_])(" + "|".join(re.escape(t) for t in terms) + r")(?![0-9a-z_])"
    )
    return [(m.start(), m.end(), m.group(1)) for m in pat.finditer(low)]


def _doc_best_passages(text, terms, max_passages, pre, post, k1, b, pivot):
    """One document -> top-N sentence passages by PassageScorer score,
    returned in document order (FieldHighlighter.highlightOffsetsEnums:
    a score-ordered priority queue of passages, re-sorted by offset for
    formatting)."""
    matches = _term_offsets_with_terms(text, terms)
    if not matches:
        return []
    tf_doc: dict = {}
    for _s, _e, t in matches:
        tf_doc[t] = tf_doc.get(t, 0) + 1
    sents = _sentence_spans(text)
    per_sent: dict = {}
    si = 0
    for ms, me, t in matches:
        while si + 1 < len(sents) and sents[si][1] <= ms:
            si += 1
        per_sent.setdefault(si, []).append((ms, me, t))
    scored = []
    for i, mlist in per_sent.items():
        ps, pe = sents[i]
        tf_p: dict = {}
        for _s, _e, t in mlist:
            tf_p[t] = tf_p.get(t, 0) + 1
        sc = _score_passage(tf_p, tf_doc, pe - ps, ps, len(text), k1, b, pivot)
        scored.append((sc, ps, pe, mlist))
    scored.sort(key=lambda x: (-x[0], x[1]))
    top = sorted(scored[:max_passages], key=lambda x: x[1])
    out = []
    for sc, ps, pe, mlist in top:
        frag, prev = [], ps
        for ms, me, _t in mlist:
            frag.append(text[prev:ms])
            frag.append(pre + text[ms:me] + post)
            prev = me
        frag.append(text[prev:pe])
        out.append(("".join(frag), ps, sc))
    return out


def best_passages(
    index: Index,
    hits: DataFrame,
    terms: list,
    max_passages: int = 3,
    pre: str = "<b>",
    post: str = "</b>",
    k1: float = 1.2,
    b: float = 0.75,
    pivot: float = 87.0,
) -> DataFrame:
    """UnifiedHighlighter analog with the reference's PassageScorer
    (uhighlight/PassageScorer.java: BM25-shaped tf saturation x
    length-approximated idf x early-passage norm; defaults k1=1.2,
    b=0.75, pivot=87) over sentence passages.  Sentence segmentation is
    a regex approximation of BreakIterator.getSentenceInstance
    (documented deviation); the scoring math is reference-exact in
    float64.

    hits(doc_id, ...) -> (doc_id, passage, p_start, p_score): up to
    ``max_passages`` rows per doc, in document order.  Spark shape:
    broadcast top-k docIDs joined to the corpus snapshot, one
    Arrow-batched pass per fetched doc."""
    text_col = index.manifest["text_col"]
    fetched = F.broadcast(hits.select("doc_id")).join(
        index.corpus.select("doc_id", text_col), "doc_id"
    )
    terms = [t.lower() for t in terms]

    def fn(iterator):
        for pdf in iterator:
            out = {"doc_id": [], "passage": [], "p_start": [], "p_score": []}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                for passage, ps, sc in _doc_best_passages(
                    text or "", terms, max_passages, pre, post, k1, b, pivot
                ):
                    out["doc_id"].append(doc_id)
                    out["passage"].append(passage)
                    out["p_start"].append(ps)
                    out["p_score"].append(sc)
            yield pd.DataFrame(out)

    return fetched.mapInPandas(fn, schema=_PASSAGE_SCHEMA)
