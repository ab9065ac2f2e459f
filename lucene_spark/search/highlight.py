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
                if not offs:
                    out["passage"].append(None)
                    out["n_matches"].append(0)
                    out["first_offset"].append(-1)
                    continue
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
                out["passage"].append("".join(frag))
                out["n_matches"].append(len(inside))
                out["first_offset"].append(offs[0][0])
            yield pd.DataFrame(out)

    return fetched.mapInPandas(fn, schema=_HL_SCHEMA)
