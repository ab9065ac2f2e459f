"""StringDistance zoo (search/distances.py) — verified against every
vector the reference's own tests assert
(suggest/src/test/.../spell/TestLevenshteinDistance.java,
TestJaroWinklerDistance.java, TestNGramDistance.java)."""

from __future__ import annotations

import pytest

from lucene_spark.search.distances import (
    STRING_DISTANCES,
    jaro_winkler_distance,
    levenshtein_distance,
    lucene_levenshtein_distance,
    ngram_distance,
)

LEV = [
    ("al", "al", 1.0),
    ("martha", "marhta", 0.6666),
    ("jones", "johnson", 0.4285),
    ("abcvwxyz", "cabvwxyz", 0.75),
    ("dwayne", "duane", 0.666),
    ("dixon", "dicksonx", 0.5),
    ("six", "ten", 0.0),
    ("", "al", 0.0),
    ("", "", 1.0),
]


@pytest.mark.parametrize("a,b,want", LEV)
def test_levenshtein(a, b, want):
    assert levenshtein_distance(a, b) == pytest.approx(want, abs=1e-3)


def test_levenshtein_symmetric_pairs():
    assert levenshtein_distance("zac ephron", "zac efron") == pytest.approx(
        levenshtein_distance("zac ephron", "kai ephron"), abs=1e-3
    )
    assert levenshtein_distance(
        "brittney spears", "britney spears"
    ) > levenshtein_distance("brittney spears", "brittney startzman")


JW_RANGES = [
    ("al", "al", 1.0, 1.0),
    ("martha", "marhta", 0.961, 0.962),
    ("jones", "johnson", 0.832, 0.833),
    ("abcvwxyz", "cabvwxyz", 0.958, 0.959),
    ("dwayne", "duane", 0.84, 0.841),
    ("dixon", "dicksonx", 0.813, 0.814),
    ("fvie", "ten", 0.0, 0.0),
]


@pytest.mark.parametrize("a,b,lo,hi", JW_RANGES)
def test_jaro_winkler(a, b, lo, hi):
    d = jaro_winkler_distance(a, b)
    assert lo <= d <= hi


def test_jaro_winkler_orderings():
    assert jaro_winkler_distance("zac ephron", "zac efron") > jaro_winkler_distance(
        "zac ephron", "kai ephron"
    )
    assert jaro_winkler_distance(
        "brittney spears", "britney spears"
    ) > jaro_winkler_distance("brittney spears", "brittney startzman")


NGRAM1 = [
    ("al", "al", 1.0), ("a", "a", 1.0), ("b", "a", 0.0),
    ("martha", "marhta", 0.6666), ("jones", "johnson", 0.4285),
    ("natural", "contrary", 0.25), ("abcvwxyz", "cabvwxyz", 0.75),
    ("dwayne", "duane", 0.666), ("dixon", "dicksonx", 0.5),
    ("six", "ten", 0.0),
]
NGRAM2 = [
    ("al", "al", 1.0), ("a", "a", 1.0), ("b", "a", 0.0),
    ("a", "aa", 0.5),
    ("martha", "marhta", 0.6666), ("jones", "johnson", 0.4285),
    ("natural", "contrary", 0.25), ("abcvwxyz", "cabvwxyz", 0.625),
    ("dwayne", "duane", 0.5833), ("dixon", "dicksonx", 0.5),
    ("six", "ten", 0.0),
]
NGRAM3 = [
    ("al", "al", 1.0), ("a", "a", 1.0), ("b", "a", 0.0),
    ("martha", "marhta", 0.7222), ("jones", "johnson", 0.4762),
    ("natural", "contrary", 0.2083), ("abcvwxyz", "cabvwxyz", 0.5625),
    ("dwayne", "duane", 0.5277), ("dixon", "dicksonx", 0.4583),
    ("six", "ten", 0.0),
]


@pytest.mark.parametrize("a,b,want", NGRAM1)
def test_ngram1(a, b, want):
    assert ngram_distance(a, b, n=1) == pytest.approx(want, abs=1e-3)


@pytest.mark.parametrize("a,b,want", NGRAM2)
def test_ngram2(a, b, want):
    assert ngram_distance(a, b, n=2) == pytest.approx(want, abs=1e-3)


@pytest.mark.parametrize("a,b,want", NGRAM3)
def test_ngram3(a, b, want):
    assert ngram_distance(a, b, n=3) == pytest.approx(want, abs=1e-3)


def test_ngram_number_pairs_equal():
    # (the reference's n=1 variant of this assertion passes a delta of
    # literally `001` == 1.0 — vacuous — so it is not asserted here)
    s, t1, t2 = "0012345678", "0012890678", "0072385698"
    assert ngram_distance(s, t1, n=2) == pytest.approx(
        ngram_distance(s, t2, n=2), abs=1e-3
    )
    assert ngram_distance(s, t1, n=3) < ngram_distance(s, t2, n=3)


def test_lucene_levenshtein():
    # transposition counts once; normalized by min length
    assert lucene_levenshtein_distance("martha", "marhta") == pytest.approx(
        1.0 - 1 / 6, abs=1e-6
    )
    assert lucene_levenshtein_distance("al", "al") == 1.0
    # reference's raw-count empty-case oddity preserved
    assert lucene_levenshtein_distance("", "ab") == 2.0


def test_registry_keys():
    assert set(STRING_DISTANCES) == {
        "levenshtein", "jaro_winkler", "ngram", "lucene_levenshtein"
    }
