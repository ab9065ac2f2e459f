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
shared per executor; and candidate selection is the reference's
TermFilteredPresearcher (monitor/TermFilteredPresearcher.java:62):
each query contributes a minimal covering term set — conjunctions
index only their highest-weight child (TermWeightor.DEFAULT length
weighting, longer ~ rarer), disjunctions index every child, queries
with no extractable terms fall into the ANYTOKEN bucket — and each
document only evaluates the queries its own terms pull from that
index, so per-doc cost tracks the doc's vocabulary, not the
registered-query count. For query sets too large even to broadcast,
the same (term -> query) table joins the exploded doc-term stream as a
DataFrame semi-join — the index IS relational data here.
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
    anchors = _presearch_terms(must, should, msm)
    return _CompiledQuery(query_id, "bool", must, should, must_not, msm, anchors)


# ---------------------------------------------------------------------------
# TermFilteredPresearcher term extraction (monitor/QueryAnalyzer.java +
# QueryTree.java + TermWeightor.java)
# ---------------------------------------------------------------------------

_LENGTH_NORMS = [3.0 * 2.718281828459045 ** (-0.3 * i) for i in range(32)]


def _term_weight(term: str) -> float:
    """TermWeightor.DEFAULT = lengthWeightor(3, 0.3)
    (TermWeightor.java:32,122-133): longer terms are assumed rarer."""
    n = len(term.encode("utf-8"))
    return 4.0 - _LENGTH_NORMS[min(n, 31)]


def _leaf_tree(leaf) -> tuple:
    """leaf -> (weight, frozenset(terms)). Weight 0 + empty set = an
    ANY node (no term extraction possible — e.g. prefix)."""
    kind = leaf[0]
    if kind == "term":
        return (_term_weight(leaf[1]), frozenset((leaf[1],)))
    if kind == "any":
        # disjunction of its terms: ALL terms index, weight = min child
        ts = frozenset(leaf[1])
        return (min(map(_term_weight, ts), default=0.0), ts)
    if kind == "phrase":
        # conjunction over slots (each slot a disjunction of
        # alternatives): pick the best slot
        slots = []
        for alt in leaf[1]:
            ts = frozenset(alt)
            slots.append((min(map(_term_weight, ts), default=0.0), ts))
        best = max(slots, key=lambda s: s[0])
        return best
    return (0.0, frozenset())  # prefix and friends: ANY


def _presearch_terms(must: tuple, should: tuple, msm: int) -> tuple:
    """The reference presearcher's covering term set
    (TermFilteredPresearcher.java:62 + QueryTree.java:191-276): a
    conjunction indexes only its highest-weight child's terms; a
    disjunction indexes the union of all children. Empty result =
    ANYTOKEN (the query must be checked against every document)."""
    if must:
        trees = [_leaf_tree(leaf) for leaf in must]
        weighted = [t for t in trees if t[0] > 0]
        if not weighted:
            return ()
        return tuple(sorted(max(weighted, key=lambda t: t[0])[1]))
    if should and msm >= 1:
        out: set = set()
        for leaf in should:
            w, ts = _leaf_tree(leaf)
            if w <= 0:
                return ()  # one un-extractable disjunct -> ANYTOKEN
            out.update(ts)
        return tuple(sorted(out))
    return ()


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


def build_query_index(compiled: list[_CompiledQuery]):
    """The presearcher's QUERY INDEX (Monitor.java: registered queries
    are indexed by their extracted terms; matching builds a disjunction
    of the document's terms against that index,
    TermFilteredPresearcher.buildQuery). Here: term -> query ordinals,
    plus the ANYTOKEN list of queries with no extractable terms — the
    broadcast-dict analog of the reference's in-RAM query index."""
    by_term: dict[str, list[int]] = {}
    anytoken: list[int] = []
    for i, cq in enumerate(compiled):
        if cq.anchor_terms:
            for t in cq.anchor_terms:
                by_term.setdefault(t, []).append(i)
        else:
            anytoken.append(i)
    return by_term, anytoken


def match_batch(df: DataFrame, compiled: list[_CompiledQuery],
                key_col: str, text_col: str) -> DataFrame:
    """Match a (micro-)batch DataFrame against the compiled query set.
    Works identically on static and streaming DataFrames.

    Per document, candidate queries come from the term-filtered query
    index (cost ~ O(doc terms), independent of the registered-query
    count); only candidates run the full positional evaluation — the
    reference's presearch -> MemoryIndex -> full-query two-phase."""
    queries = list(compiled)
    by_term, anytoken = build_query_index(queries)

    def fn(iterator):
        for pdf in iterator:
            keys, qids = [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                terms, positions = tokenize(text or "")
                pos_by_term: dict[str, list[int]] = {}
                for t, p in zip(terms, positions):
                    pos_by_term.setdefault(t, []).append(p)
                cand: set[int] = set(anytoken)
                for t in pos_by_term:
                    cand.update(by_term.get(t, ()))
                for i in sorted(cand):
                    if _match_doc(queries[i], pos_by_term):
                        keys.append(str(key))
                        qids.append(queries[i].query_id)
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
