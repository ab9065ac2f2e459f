"""Reverse search over a document stream — the `monitor` module analog
(monitor/Monitor.java:47, memory/MemoryIndex.java:161).

The reference registers a set of queries, then matches each incoming
document against all of them by building a single-doc in-RAM index
(MemoryIndex) per document. Spark-first shape:

- the registered query set is COMPILED once on the driver into plain
  data (term sets / slot position specs) and broadcast;
- documents arrive as a Structured Streaming source; each micro-batch is
  matched inside one Arrow-batched mapInPandas — per document we build
  the term -> positions dict (the MemoryIndex analog) and evaluate every
  compiled query against it, vectorized per batch;
- matches (doc identifier, query_id) flow to any streaming sink.

Supported query nodes: TermQ, PhraseQ (exact + sloppy via the engine's
anchor-greedy semantics), BoolQ over those, TermInSetQ, PrefixQ.
Scoring is intentionally out of scope (the reference monitor reports
matches, not ranks).

At scale: the stream is partitioned by Spark; the broadcast query set is
shared per executor; presearcher-style pruning (only evaluate queries
whose rarest term occurs in the doc) is applied per document.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.analysis import tokenize
from lucene_spark.search import plans as P


@dataclass(frozen=True)
class _CompiledQuery:
    query_id: str
    kind: str          # 'bool'
    must: tuple        # of compiled leaves
    should: tuple
    must_not: tuple
    min_should: int
    anchor_terms: tuple  # presearcher: any of these must appear, else skip


def _compile_leaf(q):
    if isinstance(q, P.TermQ):
        return ("term", q.term)
    if isinstance(q, P.TermInSetQ):
        return ("any", tuple(q.terms))
    if isinstance(q, P.PrefixQ):
        return ("prefix", q.prefix)
    if isinstance(q, P.PhraseQ):
        return ("phrase", tuple((t,) for t in q.terms), q.slop)
    if isinstance(q, P.MultiPhraseQ):
        return ("phrase", tuple(tuple(a) for a in q.positions), q.slop)
    raise TypeError(f"monitor does not support {type(q).__name__}")


def _leaf_terms(leaf) -> tuple:
    kind = leaf[0]
    if kind == "term":
        return (leaf[1],)
    if kind == "any":
        return leaf[1]
    if kind == "prefix":
        return ()  # prefix can't be presearched by exact term
    if kind == "phrase":
        return tuple(t for alt in leaf[1] for t in alt)
    return ()


def compile_query(query_id: str, q) -> _CompiledQuery:
    q = P.rewrite(q)
    if isinstance(q, P.BoolQ):
        must = tuple(_compile_leaf(c) for c in list(q.must) + list(q.filter))
        should = tuple(_compile_leaf(c) for c in q.should)
        must_not = tuple(_compile_leaf(c) for c in q.must_not)
        msm = q.min_should_match if (q.min_should_match or must) else 1
    else:
        must, should, must_not, msm = (_compile_leaf(q),), (), (), 0
    anchors: tuple = ()
    if must:
        anchors = _leaf_terms(must[0])  # any required leaf gates the eval
    elif should:
        anchors = tuple(t for leaf in should for t in _leaf_terms(leaf))
    return _CompiledQuery(query_id, "bool", must, should, must_not, msm, anchors)


def _match_leaf(leaf, pos_by_term: dict) -> bool:
    kind = leaf[0]
    if kind == "term":
        return leaf[1] in pos_by_term
    if kind == "any":
        return any(t in pos_by_term for t in leaf[1])
    if kind == "prefix":
        return any(t.startswith(leaf[1]) for t in pos_by_term)
    if kind == "phrase":
        slots, slop = leaf[1], leaf[2]
        slot_pos = []
        for off, alt in enumerate(slots):
            parts = [
                np.asarray(pos_by_term[t], dtype=np.int64) - off
                for t in alt
                if t in pos_by_term
            ]
            if not parts:
                return False
            slot_pos.append(np.unique(np.concatenate(parts)))
        if slop == 0:
            cand = slot_pos[0]
            for sp in slot_pos[1:]:
                cand = np.intersect1d(cand, sp, assume_unique=True)
            return bool(len(cand[cand >= 0]))
        for a in slot_pos[0]:
            picks = [int(a)]
            ok = True
            for sp in slot_pos[1:]:
                j = int(np.searchsorted(sp, a))
                best = None
                for jj in (j - 1, j):
                    if 0 <= jj < len(sp):
                        d = abs(int(sp[jj]) - int(a))
                        if best is None or d < best[0]:
                            best = (d, int(sp[jj]))
                if best is None:
                    ok = False
                    break
                picks.append(best[1])
            if ok and max(picks) - min(picks) <= slop:
                return True
        return False
    raise ValueError(kind)


def _match_doc(cq: _CompiledQuery, pos_by_term: dict) -> bool:
    if cq.anchor_terms and not any(t in pos_by_term for t in cq.anchor_terms):
        return False  # presearcher prune
    for leaf in cq.must:
        if not _match_leaf(leaf, pos_by_term):
            return False
    if cq.must_not and any(_match_leaf(x, pos_by_term) for x in cq.must_not):
        return False
    if cq.min_should:
        hits = sum(1 for leaf in cq.should if _match_leaf(leaf, pos_by_term))
        if hits < cq.min_should:
            return False
    return True


_MATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_key", T.StringType()),
        T.StructField("query_id", T.StringType()),
    ]
)


def match_batch(df: DataFrame, compiled: list[_CompiledQuery],
                key_col: str, text_col: str) -> DataFrame:
    """Match a (micro-)batch DataFrame against the compiled query set.
    Works identically on static and streaming DataFrames."""
    queries = list(compiled)

    def fn(iterator):
        for pdf in iterator:
            keys, qids = [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                terms, positions = tokenize(text or "")
                pos_by_term: dict[str, list[int]] = {}
                for t, p in zip(terms, positions):
                    pos_by_term.setdefault(t, []).append(p)
                for cq in queries:
                    if _match_doc(cq, pos_by_term):
                        keys.append(str(key))
                        qids.append(cq.query_id)
            yield pd.DataFrame({"doc_key": keys, "query_id": qids})

    return df.select(F.col(key_col), F.col(text_col)).mapInPandas(fn, schema=_MATCH_SCHEMA)


class Monitor:
    """Register queries once, match document streams forever."""

    def __init__(self):
        self._compiled: list[_CompiledQuery] = []

    def register(self, query_id: str, q) -> None:
        self._compiled.append(compile_query(query_id, q))

    @property
    def query_ids(self) -> list[str]:
        return [c.query_id for c in self._compiled]

    def match(self, docs: DataFrame, key_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
        """Static or streaming DataFrame -> (doc_key, query_id) matches."""
        return match_batch(docs, self._compiled, key_col, text_col)

    def match_stream(self, stream: DataFrame, key_col: str = "doc_id",
                     text_col: str = "text", **writer_opts):
        """Streaming source -> streaming matcher query. Returns the
        DataStreamWriter so callers pick sink/trigger/checkpoint."""
        return self.match(stream, key_col, text_col).writeStream
