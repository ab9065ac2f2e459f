"""ComplexPhraseQueryParser analog (queryparser/complexPhrase/
ComplexPhraseQueryParser.java) — plan shapes with a stubbed dictionary,
and e2e equivalence: an expanded wildcard/fuzzy/group inside a phrase
matches exactly the union of the corresponding exact phrases."""

from __future__ import annotations

import fnmatch

import numpy as np

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import Searcher, plans as P
from lucene_spark.search import complexphrase as CP


class _StubSearcher:
    """Just enough of Searcher's dictionary surface for parse tests."""

    MAX_CLAUSE_COUNT = 1024

    def __init__(self, vocab):
        self.vocab = sorted(vocab)

    def _multiterm_pred(self, q):
        return q

    def _predicate_term_stats(self, q, field, limit=None, order_limit=None):
        if isinstance(q, P.PrefixQ):
            keep = [t for t in self.vocab if t.startswith(q.prefix)]
        elif isinstance(q, P.WildcardQ):
            keep = [t for t in self.vocab if fnmatch.fnmatchcase(t, q.pattern)]
        elif isinstance(q, P.TermRangeQ):
            keep = [
                t for t in self.vocab
                if (t >= q.lower if q.include_lower else t > q.lower)
                and (t <= q.upper if q.include_upper else t < q.upper)
            ]
        else:
            raise TypeError(q)
        if order_limit is not None:
            keep = sorted(keep)[:order_limit]
        elif limit is not None:
            keep = keep[:limit]
        return [(t, 1, 1) for t in keep]

    def _fuzzy_expansions(self, q):
        from lucene_spark.search.executor import _edit_distance

        out = []
        for t in self.vocab:
            ed = _edit_distance(t, q.term, q.transpositions)
            if ed <= q.max_edits:
                out.append((t, 1, 1.0 if ed == 0 else 1.0 - ed / min(len(t), len(q.term))))
        return out


_VOCAB = ["apache", "apart", "async", "await", "license", "licensed",
          "john", "jon", "jonathan", "electric", "banjo"]


def test_wildcard_inside_phrase_plan():
    q = CP.parse('"lic* apache"', _StubSearcher(_VOCAB))
    assert isinstance(q, P.IntervalQ)  # spans rewrite to intervals
    src = q.source
    assert isinstance(src, P.IntervalOrdered) and src.max_gaps == 0
    or_leaf, term_leaf = src.sources
    assert isinstance(or_leaf, P.IntervalOr)
    assert {s.term for s in or_leaf.sources} == {"license", "licensed"}
    assert term_leaf.term == "apache"


def test_fuzzy_and_slop_inside_phrase_plan():
    q = CP.parse('"jonn~1 peters*"~2', _StubSearcher(_VOCAB))
    src = q.source
    assert isinstance(src, P.IntervalOrdered) and src.max_gaps == 2
    fz, pref = src.sources
    assert {s.term for s in fz.sources} == {"john", "jon"}
    # peters* matches nothing in the stub vocab -> unmatchable sentinel
    assert pref.term == CP._NO_MATCH_TERM


def test_group_with_negation_plan():
    q = CP.parse('"(banjo -electric) license"', _StubSearcher(_VOCAB))
    src = q.source
    grp, term = src.sources
    assert isinstance(grp, P.IntervalNotOverlapping)
    assert grp.minuend.term == "banjo" and grp.subtrahend.term == "electric"
    assert term.term == "license"


def test_unordered_option_and_outside_clauses():
    q = CP.parse('+"apa* async"~1 -banjo', _StubSearcher(_VOCAB),
                 in_order=False)
    assert isinstance(q, P.BoolQ)
    inner = q.must[0].source
    assert isinstance(inner, P.IntervalUnordered)
    assert isinstance(q.must_not[0], P.TermQ)


def test_complex_phrase_e2e(spark, tmp_path_factory):
    """Expanded multi-term phrase == union of the exact phrases over
    the concrete expansions (same docs, via the real index)."""
    pdf = make_corpus(200, seed=31)
    idx_dir = str(tmp_path_factory.mktemp("cpx_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", keep_cols=["lang"], num_buckets=4, salt_rows=64,
    )
    s = Searcher(Index(spark, idx_dir), scoring="lucene")

    q = CP.parse('"asyn* await"', s)
    got = {int(r["doc_id"]) for r in s.scored(q).collect()}

    pred = s._multiterm_pred(P.PrefixQ("asyn"))
    expansions = [t for t, _d, _t in s._predicate_term_stats(pred, None)]
    assert "async" in expansions
    want = set()
    for t in expansions:
        want |= {
            int(r["doc_id"])
            for r in s.scored(P.PhraseQ((t, "await"))).collect()
        }
    assert got == want and got

    # single-position phrase with only a wildcard: behaves like the
    # OR of its expansions (doc sets)
    q2 = CP.parse('"asyn*"', s)
    got2 = {int(r["doc_id"]) for r in s.scored(q2).collect()}
    want2 = set()
    for t in expansions:
        want2 |= {int(r["doc_id"]) for r in s.scored(P.TermQ(t)).collect()}
    assert got2 == want2 and got2
