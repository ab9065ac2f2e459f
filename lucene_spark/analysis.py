"""Analysis chain: tokenizer + lowercase + optional stop filter.

Replicates the *semantics* of the reference's default chain
(`lucene/analysis/standard/StandardAnalyzer.java:85-90` = StandardTokenizer
-> LowerCaseFilter -> StopFilter with an EMPTY default stopset):

- Tokens are maximal runs of word characters. We implement a documented
  UAX#29 subset: ``[0-9A-Za-z_]+`` over the lowercased text (underscore is
  ExtendNumLet in UAX#29 word-break and joins words, matching
  StandardTokenizer on identifiers like ``foo_bar``; MidLetter/MidNumLet
  joins for ``.``/``'`` are NOT applied — a documented deviation,
  analysis/standard/StandardTokenizer.java:38).
- maxTokenLength = 255 (StandardTokenizer.java:77): longer runs are split
  every 255 chars, like the JFlex buffer does.
- LowerCaseFilter (analysis/LowerCaseFilter.java) = str.lower() first, so
  query-side and index-side agree.
- StopFilter (analysis/StopFilter.java) removes stopwords but *advances
  the position increment*, leaving holes so phrase semantics survive.
  Default stopset is EMPTY (StandardAnalyzer.java:47-50).

THE ORACLE CONTRACT: the exact same tokenization must be expressible in
ANSI SQL for the DuckDB cross-check. ``TOKEN_REGEX_SQL`` is that regex;
``tokenize()`` and ``regexp_extract_all(lower(text), TOKEN_REGEX_SQL)``
produce identical token streams for any input (RE2 and Python `re` agree
on this pattern).

Everything is pandas/numpy-vectorized per Arrow batch — no per-row Python
in the Spark hot path (the UDF receives a pandas Series of documents).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from lucene_spark.smallfloat import int_to_byte4

MAX_TOKEN_LENGTH = 255  # StandardTokenizer.java:77
TOKEN_REGEX = re.compile(r"[0-9a-z_]+")
TOKEN_REGEX_SQL = "[0-9a-z_]+"  # identical RE2 pattern for DuckDB oracles


def tokenize(text: str, stopwords: frozenset | None = None):
    """One document -> (terms:list[str], positions:list[int]).

    Positions count stopword holes (StopFilter position increments).
    """
    if not text:
        return [], []
    terms, positions = [], []
    pos = 0
    for m in TOKEN_REGEX.finditer(text.lower()):
        tok = m.group()
        for i in range(0, len(tok), MAX_TOKEN_LENGTH):
            piece = tok[i : i + MAX_TOKEN_LENGTH]
            if stopwords is None or piece not in stopwords:
                terms.append(piece)
                positions.append(pos)
            pos += 1
    return terms, positions


def analyze_batch(texts: pd.Series, stopwords: frozenset | None = None) -> pd.DataFrame:
    """Vectorized batch tokenize: Series[str] -> DataFrame(terms, positions, dl, norm).

    dl = field length minus overlaps (we produce no overlap tokens, so
    dl = emitted token count + stopword holes? No: Lucene's
    FieldInvertState.length counts *all* positions incremented, i.e.
    stopword holes count toward length? StopFilter increments position but
    does NOT increment FieldInvertState.length for removed tokens —
    length counts accepted tokens only (index/FieldInvertState.java:121).
    So dl = len(terms).
    norm = SmallFloat.intToByte4(dl) (BM25Similarity.java:137-148).
    """
    lowered = texts.fillna("").str.lower()
    all_terms = lowered.str.findall(TOKEN_REGEX)
    out_terms, out_pos = [], []
    for toks in all_terms:
        if any(len(t) > MAX_TOKEN_LENGTH for t in toks):
            toks = [
                t[i : i + MAX_TOKEN_LENGTH]
                for t in toks
                for i in range(0, len(t), MAX_TOKEN_LENGTH)
            ]
        if stopwords:
            terms, positions = [], []
            for p, t in enumerate(toks):
                if t not in stopwords:
                    terms.append(t)
                    positions.append(p)
            out_terms.append(terms)
            out_pos.append(positions)
        else:
            out_terms.append(list(toks))
            out_pos.append(list(range(len(toks))))
    dl = np.fromiter((len(t) for t in out_terms), dtype=np.int64, count=len(out_terms))
    return pd.DataFrame(
        {
            "terms": out_terms,
            "positions": out_pos,
            "dl": dl,
            "norm": int_to_byte4(dl).astype(np.int32),
        }
    )


def analyze_query_text(text: str, stopwords: frozenset | None = None) -> list[str]:
    """Query-side analysis (util/QueryBuilder.java re-runs the analyzer)."""
    return tokenize(text, stopwords)[0]
