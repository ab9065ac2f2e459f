"""SloppyPhraseMatcher parity: the exact pq matcher (sloppy.py), its
2-term closed form used by the SQL oracle, and repeated-term phrases
end-to-end (SloppyPhraseMatcher.java:163-205, 365-470)."""

import random

import numpy as np
import pytest

from lucene_spark.search.sloppy import sloppy_phrase_freq


def head_rule_freq(A, B, slop):
    """The 2-term closed form encoded in the phrase_sloppy SQL oracle."""
    lists = {0: sorted(A), 1: sorted(B)}
    a0, b0 = lists[0][0], lists[1][0]
    h, lst = (b0, 1) if b0 >= a0 else (a0, 0)
    freq = 0.0
    while True:
        other = lists[1 - lst]
        below = [v for v in other if v <= h]
        if below:
            gap = h - max(below)
            if gap <= slop:
                freq += 1.0 / (1.0 + gap)
        nxt = [v for v in other if v > h]
        if not nxt:
            break
        h, lst = min(nxt), 1 - lst
    return freq


def test_reference_docstring_example():
    # SloppyPhraseMatcher class comment: "a b"~2 on "x a b a y"
    # matches "a b" (len 0) and "b a" (len 2) -> 1 + 1/3
    f = sloppy_phrase_freq([("a", [1, 3]), ("b", [2])], 2)
    assert abs(f - (1.0 + 1.0 / 3.0)) < 1e-12


def test_exact_and_misses():
    assert sloppy_phrase_freq([("a", [5]), ("b", [6])], 0) == 1.0
    assert sloppy_phrase_freq([("a", [0]), ("b", [10])], 2) == 0.0


def test_repeats():
    # "get get value" exactly present
    assert sloppy_phrase_freq([("g", [0, 1]), ("g", [0, 1]), ("v", [2])], 0) == 1.0
    # only one 'get' in the doc: repeat group cannot place two distinct
    # positions -> no match at any slop
    assert sloppy_phrase_freq([("g", [0]), ("g", [0]), ("v", [1])], 4) == 0.0
    # "a a"~1 on "a x a": positions [0, 2]; PPs at adjusted 0 and 1 after
    # repeat init -> matchLength 1 -> one match of weight 1/2
    assert sloppy_phrase_freq([("a", [0, 2]), ("a", [0, 2])], 1) == 0.5


def test_two_term_closed_form_matches_matcher():
    rnd = random.Random(11)
    for _ in range(5000):
        raw_a = sorted(rnd.sample(range(0, 14), rnd.randint(1, 5)))
        raw_b = sorted(rnd.sample(range(0, 14), rnd.randint(1, 5)))
        slop = rnd.randint(0, 5)
        ref = sloppy_phrase_freq([("x", raw_a), ("y", raw_b)], slop)
        got = head_rule_freq(raw_a, [v - 1 for v in raw_b], slop)
        assert abs(ref - got) < 1e-12, (raw_a, raw_b, slop, ref, got)


def test_repeated_phrase_end_to_end(spark, tmp_path):
    """Engine scores for a repeated-term sloppy phrase match the exact
    matcher applied to hand-known documents."""
    from lucene_spark import bm25
    from lucene_spark.index import Index, build_index
    from lucene_spark.search import PhraseQ, Searcher

    rows = [
        (0, "get get value now"),          # exact
        (1, "get value get later"),        # repeats out of order
        (2, "get x get value"),            # slop-1 style
        (3, "value get nothing here"),     # no second get
        (4, "completely unrelated text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    idx_dir = str(tmp_path / "rptidx")
    build_index(spark, df, idx_dir, text_col="body", doc_id_col="doc_id",
                num_buckets=2, salt_rows=64)
    s = Searcher(Index(spark, idx_dir), scoring="lucene")
    got = {
        int(r["doc_id"]): float(np.float32(r["score"]))
        for r in s.scored(PhraseQ(("get", "get", "value"), slop=2)).collect()
    }
    # expected via the same matcher over hand-tokenized positions
    import re
    docs = {d: re.findall(r"[0-9a-z_]+", t) for d, t in rows}
    expected_docs = {}
    for d, toks in docs.items():
        pos = {}
        for i, t in enumerate(toks):
            pos.setdefault(t, []).append(i)
        if "get" not in pos or "value" not in pos:
            continue
        f = sloppy_phrase_freq(
            [("get", pos["get"]), ("get", pos["get"]), ("value", pos["value"])], 2
        )
        if f > 0:
            expected_docs[d] = f
    assert set(got) == set(expected_docs), (got, expected_docs)
    assert 0 in got and 3 not in got


# ---------------------------------------------------------------------------
# multi-term (MultiPhraseQuery alternative) slots — the reference's
# hasMultiTermRpts machinery (SloppyPhraseMatcher.initFirstTime,
# advanceRepeatGroups multi-term branch)
# ---------------------------------------------------------------------------


def test_multi_term_slot_degenerates_to_single():
    """A multi-term slot whose union stream equals a single term's
    stream must score identically to the single-term phrase."""
    rnd = random.Random(23)
    for _ in range(2000):
        A = sorted(rnd.sample(range(0, 14), rnd.randint(1, 5)))
        B = sorted(rnd.sample(range(0, 14), rnd.randint(1, 5)))
        slop = rnd.randint(0, 4)
        single = sloppy_phrase_freq([("a", A), ("b", B)], slop)
        multi = sloppy_phrase_freq(
            [(frozenset(["a", "x"]), A), (frozenset(["b", "y"]), B)], slop
        )
        assert multi == single, (A, B, slop)


def test_multi_term_hidden_collision_no_double_placement():
    # slots ({a,b}, {b}) on doc "b": both streams hold only b@0 —
    # the shared position cannot serve both slots -> no match ever
    assert sloppy_phrase_freq(
        [(frozenset(["a", "b"]), [0]), (frozenset(["b"]), [0])], 4
    ) == 0.0
    # doc "b b": the two slots can take b@0 and b@1 -> an exact match
    f = sloppy_phrase_freq(
        [(frozenset(["a", "b"]), [0, 1]), (frozenset(["b"]), [0, 1])], 0
    )
    assert f == 1.0
    # javadoc hidden-collision example: P1={a,b}, P2={b,c}, doc "a c b":
    # exact alignment a@0,c@1 exists -> freq includes a slop-0 match
    f2 = sloppy_phrase_freq(
        [(frozenset(["a", "b"]), [0, 2]), (frozenset(["b", "c"]), [1, 2])], 0
    )
    assert f2 >= 1.0


def test_multi_term_group_spans_slots_via_shared_terms():
    # slots ({a,b}, {b,c}, {c}): term-groups union {a,b}+{b,c}+{c} into
    # ONE repeat group across all three slots; a doc with a single
    # shared position per stream cannot satisfy three distinct slots
    assert sloppy_phrase_freq(
        [
            (frozenset(["a", "b"]), [0]),
            (frozenset(["b", "c"]), [0]),
            (frozenset(["c"]), [0]),
        ],
        6,
    ) == 0.0
    # distinct positions available -> exact "0 1 2" alignment
    assert sloppy_phrase_freq(
        [
            (frozenset(["a", "b"]), [0, 1, 2]),
            (frozenset(["b", "c"]), [0, 1, 2]),
            (frozenset(["c"]), [0, 1, 2]),
        ],
        0,
    ) >= 1.0


def test_multi_phrase_sloppy_end_to_end(spark, tmp_path):
    """MultiPhraseQ slop>0 e2e: superset of its slop=0 doc set, and when
    every slot has one alternative it equals the plain sloppy phrase."""
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import Index, build_index
    from lucene_spark.search import MultiPhraseQ, PhraseQ, Searcher

    pdf = make_corpus(150, seed=37)
    idx_dir = str(tmp_path / "mp_idx")
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", num_buckets=4, salt_rows=64,
    )
    s = Searcher(Index(spark, idx_dir), scoring="double")
    mp = MultiPhraseQ((("async", "go"), ("await",)), slop=3)
    docs_sloppy = {int(r["doc_id"]) for r in s.scored(mp).collect()}
    mp0 = MultiPhraseQ((("async", "go"), ("await",)), slop=0)
    docs_exact = {int(r["doc_id"]) for r in s.scored(mp0).collect()}
    assert docs_exact <= docs_sloppy
    assert docs_sloppy, "sloppy multiphrase must match something"
    # single-alternative slots == plain sloppy phrase, score-identical
    mp1 = MultiPhraseQ((("async",), ("await",)), slop=3)
    ph = PhraseQ(("async", "await"), slop=3)
    got_mp = {
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in s.scored(mp1).collect()
    }
    got_ph = {
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in s.scored(ph).collect()
    }
    assert got_mp == got_ph
