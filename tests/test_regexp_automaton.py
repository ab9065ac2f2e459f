"""Brzozowski-derivative RegExp evaluator (search/regexp_automaton.py)
— agreement with the Java-regex translation on the shared dialect
subset, and set-algebra verification of the two operators ONLY the
automaton path can evaluate (`~` complement, nested `&`), plus
interval/grammar edge cases from RegExp.java."""

from __future__ import annotations

import re
from itertools import product

import pytest

from lucene_spark.search.regexp import (
    RegexpSyntaxError,
    term_predicate_pattern,
)
from lucene_spark.search.regexp_automaton import RegexMatcher, parse

# --- agreement with the rlike translation on the shared subset -------------

ALPHABET = "abc0"


def _universe(maxlen: int = 4):
    for n in range(maxlen + 1):
        for tup in product(ALPHABET, repeat=n):
            yield "".join(tup)


SHARED_PATTERNS = [
    "abc",
    "a.c",
    "ab*",
    "a+b?",
    "(ab|ba)c*",
    "[ab]c",
    "[^ab]",
    "[a-c]+",
    "a{2}",
    "a{1,2}b",
    "a{2,}",
    '"a.c"',
    "()",
    "#",
    "@",
    "a@",
    "\\*a",
    "ab&.b",  # top-level & is supported by both paths
    "<1-10>",
    "<07-13>",
    "<2-2>",
]


@pytest.mark.parametrize("pattern", SHARED_PATTERNS)
def test_agrees_with_java_translation(pattern):
    rx = re.compile(term_predicate_pattern(pattern))
    m = RegexMatcher(pattern)
    for s in _universe():
        assert m.matches(s) == bool(rx.match(s)), (pattern, s)


def test_interval_agreement_numeric():
    for pat, lo, hi, fixed in [("<1-10>", 1, 10, 0), ("<005-0101>", 5, 101, 0),
                               ("<25-17>", 17, 25, 2)]:
        m = RegexMatcher(pat)
        for v in range(0, 130):
            for pad in range(0, 3):
                s = str(v).zfill(len(str(v)) + pad)
                want = lo <= v <= hi and (len(s) == fixed if fixed else True)
                assert m.matches(s) == want, (pat, s)


# --- the automaton-only operators -------------------------------------------


def test_complement_is_set_complement():
    base = RegexMatcher("ab.*")
    comp = RegexMatcher("~(ab.*)")
    for s in _universe():
        assert comp.matches(s) == (not base.matches(s)), s


def test_complement_binds_to_complexp():
    # ~a* == (~a)* per RegExp.java parseComplExp: star applies OUTSIDE.
    # L(~a) is every string except "a"; star of it accepts any string
    # that is NOT exactly "a" (any s != "a" is a single factor in L,
    # while "a"'s only nonempty factorization is ["a"], rejected).
    m = RegexMatcher("~a*")
    assert m.matches("") and m.matches("aa") and m.matches("aaa")
    assert not m.matches("a")
    # whereas explicit ~(a*) rejects exactly the a-runs
    m2 = RegexMatcher("~(a*)")
    assert not m2.matches("") and not m2.matches("aa")
    assert m2.matches("b") and m2.matches("ab")


def test_complement_concat():
    # ~(a)b: complement applies to 'a' only, then concat b
    m = RegexMatcher("~(a)b")
    assert m.matches("ab") is False  # "a" is in a's language
    assert m.matches("b")            # "" is not 'a'
    assert m.matches("cb") and m.matches("aab")
    assert not m.matches("a")


def test_nested_intersection():
    # (ab&a.)|c. — & nested under | (the rlike path rejects this)
    m = RegexMatcher("(ab&a.)|c.")
    ab = re.compile(r"^ab$")
    adot = re.compile(r"^a.$")
    cdot = re.compile(r"^c.$")
    for s in _universe():
        want = (bool(ab.match(s)) and bool(adot.match(s))) or bool(
            cdot.match(s))
        assert m.matches(s) == want, s


def test_intersection_with_complement():
    # all strings over [abc]+ that contain 'ab' but do NOT end in c:
    # @ab@ & ~(@c)
    m = RegexMatcher("@ab@&~(@c)")
    for s in _universe():
        want = "ab" in s and not s.endswith("c")
        assert m.matches(s) == want, s


def test_double_complement_roundtrip():
    m = RegexMatcher("~~(ab)")
    for s in _universe(3):
        assert m.matches(s) == (s == "ab")


def test_empty_language_complement_is_all():
    m = RegexMatcher("~#")
    assert m.matches("") and m.matches("anything")
    m2 = RegexMatcher("~@")
    assert not m2.matches("") and not m2.matches("x")


# --- grammar / robustness ----------------------------------------------------


def test_syntax_errors():
    for bad in ["(ab", "a[b", '"ab', "<1-", "<a-b>", "a)", "<name>"]:
        with pytest.raises(RegexpSyntaxError):
            parse(bad)


def test_batch_and_none_handling():
    m = RegexMatcher("ab?")
    assert m.matches_batch(["a", "ab", "abb", None]) == [
        True, True, False, False]


def test_dfa_cache_reuse():
    m = RegexMatcher("(a|b)*abb")
    for s in _universe(4):
        pass
    n1 = len(m._trans)
    m.matches("ababb") and m.matches("bbabb")
    [m.matches(s) for s in _universe(4)]
    n2 = len(m._trans)
    # second sweep over the same alphabet adds no new transitions
    [m.matches(s) for s in _universe(4)]
    assert len(m._trans) == n2 and n2 >= n1


def test_state_space_stays_small():
    # canonicalization bounds the lazy DFA: a pathological-looking
    # pattern over a 4-char alphabet should stay in the tens of states
    m = RegexMatcher("~((a|b)*abb(a|b)*)&(a|b|c)*")
    seen = set()
    for s in _universe(4):
        m.matches(s)
    states = {st for (st, _c) in m._trans}
    assert len(states) < 64


# --- seeded random fuzz vs Python re on the shared dialect -------------------


def _gen_pattern(rng, depth=0):
    """Random pattern over the dialect subset both paths evaluate."""
    if depth > 3:
        return rng.choice("abc0")
    r = rng.random()
    if r < 0.35:
        return rng.choice("abc0.")
    if r < 0.5:
        return _gen_pattern(rng, depth + 1) + _gen_pattern(rng, depth + 1)
    if r < 0.62:
        return ("(" + _gen_pattern(rng, depth + 1) + "|"
                + _gen_pattern(rng, depth + 1) + ")")
    if r < 0.74:
        return "(" + _gen_pattern(rng, depth + 1) + ")" + rng.choice("?*+")
    if r < 0.84:
        chars = "".join(sorted(set(rng.choice("abc0") for _ in range(2))))
        neg = "^" if rng.random() < 0.3 else ""
        return f"[{neg}{chars}]"
    if r < 0.92:
        lo = rng.randrange(3)
        return "(%s){%d,%d}" % (_gen_pattern(rng, depth + 1), lo,
                                lo + rng.randrange(3))
    return '"' + rng.choice(["a.c", "ab", "*"]) + '"'


def test_fuzz_vs_python_re():
    import random

    rng = random.Random(20260818)
    strings = [s for s in _universe(3)]
    tested = 0
    for _ in range(300):
        pat = _gen_pattern(rng)
        try:
            rx = re.compile(term_predicate_pattern(pat))
        except Exception:
            continue  # pattern hits an unsupported/edge construct
        m = RegexMatcher(pat)
        for s in strings:
            assert m.matches(s) == bool(rx.match(s)), (pat, s)
        tested += 1
    assert tested > 200
