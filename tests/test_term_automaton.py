"""TermAutomatonQuery (sandbox/search/TermAutomatonQuery.java:70,
TermAutomatonScorer.java:231) and PhraseWildcardQuery
(sandbox/search/PhraseWildcardQuery.java:63).

The matcher is verified two ways:
* pure-Python fuzz vs an INDEPENDENT path-count oracle (a recursive
  enumeration of term-anchored DFA paths — a different algorithm from
  the event-queue simulation under test);
* Spark identities: automata equivalent to known queries (exact
  phrase, multi-phrase alternation, ANY gap == explicit-position
  phrase) must reproduce their docs and scores bit-for-bit.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import (
    MultiPhraseQ,
    PhraseQ,
    PhraseWildcardQ,
    PrefixQ,
    Searcher,
    TermAutomatonQ,
)
from lucene_spark.search import termautomaton as TA
from lucene_spark.search.plans import PhraseQ as _PhraseQ


# ---------------------------------------------------------------------------
# independent oracle: recursive path enumeration
# ---------------------------------------------------------------------------

def _oracle_freq(tokens: list[str], dfa: TA.DFA) -> int:
    """Count term-consuming DFA steps into an accept state, over paths
    anchored at term occurrences (start = step(0, term)), with ANY
    steps allowed at any position p < the LAST alphabet-term
    occurrence (the scorer's lazy lastPos->pos advance window)."""
    sym = {t: i for i, t in enumerate(dfa.terms)}
    events = [(p, sym[t]) for p, t in enumerate(tokens) if t in sym]
    if not events:
        return 0
    last_event_pos = events[-1][0]
    syms_at = {}
    for p, s in events:
        syms_at.setdefault(p, []).append(s)
    count = 0

    def walk(p: int, state: int) -> None:
        nonlocal count
        # consume the token at p (if it is an alphabet term)
        for s in syms_at.get(p, ()):
            ns = dfa.step.get((state, s))
            if ns is not None:
                if ns in dfa.accepts:
                    count += 1
                walk(p + 1, ns)
        # consume ANY at p — only while a later event exists to drive
        # the advance
        if dfa.has_any and p < last_event_pos:
            ns = dfa.step.get((state, TA.ANY))
            if ns is not None:
                walk(p + 1, ns)

    for p, s in events:
        ns = dfa.step.get((0, s))
        if ns is not None:
            if ns in dfa.accepts:
                count += 1
            walk(p + 1, ns)
    return count


def _count(tokens: list[str], dfa: TA.DFA) -> int:
    sym = {t: i for i, t in enumerate(dfa.terms)}
    events = [(p, sym[t]) for p, t in enumerate(tokens) if t in sym]
    return TA.count_matches(events, dfa)


def test_exact_phrase_automaton_pure():
    # a -> b: matches every adjacent "a b"
    dfa = TA.determinize(3, ((0, 1, "a"), (1, 2, "b")), (2,))
    assert _count(["a", "b", "a", "b"], dfa) == 2
    assert _count(["a", "a", "b"], dfa) == 1
    assert _count(["b", "a"], dfa) == 0
    assert TA.required_terms(dfa) == ["a", "b"]


def test_any_gap_pure():
    dfa = TA.determinize(4, ((0, 1, "a"), (1, 2, None), (2, 3, "c")), (3,))
    assert _count(["a", "x", "c"], dfa) == 1
    assert _count(["a", "c"], dfa) == 0  # gap must be exactly one token
    assert _count(["a", "x", "x", "c"], dfa) == 0
    assert TA.required_terms(dfa) == ["a", "c"]


def test_alternation_pure():
    dfa = TA.determinize(
        3, ((0, 1, "a"), (0, 1, "b"), (1, 2, "c")), (2,)
    )
    assert _count(["a", "c", "b", "c"], dfa) == 2
    assert TA.required_terms(dfa) == ["c"]


def test_trailing_any_never_scores():
    # accept reached only via ANY: the reference increments freq only on
    # term-consuming steps (TermAutomatonScorer.java:277-341)
    dfa = TA.determinize(3, ((0, 1, "a"), (1, 2, None)), (2,))
    assert _count(["a", "x"], dfa) == 0


def test_loop_automaton_pure():
    # a (b)* c : b-loop
    dfa = TA.determinize(
        3, ((0, 1, "a"), (1, 1, "b"), (1, 2, "c")), (2,)
    )
    assert _count(["a", "c"], dfa) == 1
    assert _count(["a", "b", "b", "c"], dfa) == 1
    assert _count(["a", "b", "x", "c"], dfa) == 0


def test_fuzz_vs_path_oracle():
    rng = random.Random(42)
    vocab = ["a", "b", "c", "d"]
    for trial in range(300):
        n_states = rng.randint(2, 5)
        n_trans = rng.randint(1, 7)
        transitions = []
        for _ in range(n_trans):
            f = rng.randrange(n_states)
            to = rng.randrange(n_states)
            t = rng.choice(vocab + [None])
            transitions.append((f, to, t))
        accepts = tuple(
            s for s in range(n_states) if rng.random() < 0.4
        ) or (n_states - 1,)
        dfa = TA.determinize(n_states, tuple(transitions), accepts)
        if not dfa.terms:
            continue
        tokens = [
            rng.choice(vocab + ["x", "y"]) for _ in range(rng.randint(0, 12))
        ]
        assert _count(tokens, dfa) == _oracle_freq(tokens, dfa), (
            trial, transitions, accepts, tokens
        )


# ---------------------------------------------------------------------------
# Spark identities
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ta_idx(spark, tmp_path_factory):
    pdf = make_corpus(200, seed=23)
    idx_dir = str(tmp_path_factory.mktemp("ta_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", num_buckets=4, salt_rows=64,
    )
    return Index(spark, idx_dir)


def _rows(df):
    return sorted(
        (int(r["doc_id"]), float(np.float32(r["score"])))
        for r in df.collect()
    )


def test_automaton_equals_exact_phrase(ta_idx):
    s = Searcher(ta_idx)
    q = TermAutomatonQ(
        3, ((0, 1, "apache"), (1, 2, "license")), (2,)
    )
    got = _rows(s.scored(q))
    assert got and got == _rows(s.scored(PhraseQ(("apache", "license"))))


def test_automaton_equals_multiphrase(ta_idx):
    s = Searcher(ta_idx)
    q = TermAutomatonQ(
        3, ((0, 1, "apache"), (0, 1, "public"), (1, 2, "license")), (2,)
    )
    mp = MultiPhraseQ((("apache", "public"), ("license",)))
    got = _rows(s.scored(q))
    assert got and got == _rows(s.scored(mp))


def test_automaton_any_equals_explicit_positions(ta_idx):
    s = Searcher(ta_idx)
    q = TermAutomatonQ(
        4, ((0, 1, "async"), (1, 2, None), (2, 3, "and")), (3,)
    )
    ph = _PhraseQ(("async", "and"), positions=(0, 2))
    got = _rows(s.scored(q))
    assert got and got == _rows(s.scored(ph))


def test_automaton_absent_required_term_empty(ta_idx):
    s = Searcher(ta_idx)
    q = TermAutomatonQ(
        3, ((0, 1, "apache"), (1, 2, "zzznotaterm")), (2,)
    )
    assert s.scored(q).count() == 0


def test_automaton_doc_set_matches_scored(ta_idx):
    s = Searcher(ta_idx)
    q = TermAutomatonQ(3, ((0, 1, "apache"), (1, 2, "license")), (2,))
    ds = sorted(int(r["doc_id"]) for r in s.doc_set(q).collect())
    sc = sorted(d for d, _ in _rows(s.scored(q)))
    assert ds == sc


# ---------------------------------------------------------------------------
# PhraseWildcardQuery
# ---------------------------------------------------------------------------

def test_phrase_wildcard_equals_expanded_multiphrase(ta_idx):
    s = Searcher(ta_idx)
    pw = PhraseWildcardQ((PrefixQ("apa"), "license"))
    exp = sorted(
        t for t, _df, _ttf in s._predicate_term_stats(
            s._multiterm_pred(PrefixQ("apa")), None
        )
    )
    assert exp  # fixture corpus contains apache
    mp = MultiPhraseQ((tuple(exp), ("license",)))
    got = _rows(s.scored(pw))
    assert got and got == _rows(s.scored(mp))


def test_phrase_wildcard_budget_split(ta_idx):
    """Total budget 1 with one multi-term: only the first dictionary
    expansion survives (remainingExpansions / remainingMultiTerms)."""
    s = Searcher(ta_idx)
    pw = PhraseWildcardQ(
        (PrefixQ("a"), "license"), max_multi_term_expansions=1
    )
    exp = sorted(
        t for t, _df, _ttf in s._predicate_term_stats(
            s._multiterm_pred(PrefixQ("a")), None
        )
    )[:1]
    mp = MultiPhraseQ((tuple(exp), ("license",)))
    assert _rows(s.scored(pw)) == _rows(s.scored(mp))


def test_phrase_wildcard_no_expansion_empty(ta_idx):
    s = Searcher(ta_idx)
    pw = PhraseWildcardQ((PrefixQ("zzzznope"), "license"))
    assert s.scored(pw).count() == 0
    assert s.doc_set(pw).count() == 0
