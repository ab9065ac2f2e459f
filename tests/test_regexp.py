"""Lucene RegExp dialect matrix (util/automaton/RegExp.java) — the
translate-or-reject compat layer. Each supported operator is checked by
matching the anchored Java translation against accept/reject strings
(whole-term semantics, like RegexpQuery); unsupported operators must
raise UnsupportedRegexpOperator naming the operator."""

from __future__ import annotations

import re

import pytest

from lucene_spark.search.regexp import (
    RegexpSyntaxError,
    UnsupportedRegexpOperator,
    term_predicate_pattern,
    to_java_regex,
)


def _matches(pattern: str, s: str) -> bool:
    return re.search(term_predicate_pattern(pattern), s) is not None


# (pattern, accepted, rejected)
MATRIX = [
    ("abc", ["abc"], ["ab", "abcd", "xabc"]),
    ("a.c", ["abc", "a c"], ["ac", "abbc"]),
    ("b[aeiou]g", ["bag", "bog"], ["bg", "byg", "bags"]),
    ("[a-c]x", ["ax", "cx"], ["dx", "x"]),
    ("[^a-c]x", ["dx", "zx"], ["ax", "x"]),
    ("ab?c", ["ac", "abc"], ["abbc"]),
    ("ab*c", ["ac", "abc", "abbbc"], ["adc"]),
    ("ab+c", ["abc", "abbc"], ["ac"]),
    ("a{2,3}", ["aa", "aaa"], ["a", "aaaa"]),
    ("a{2}", ["aa"], ["a", "aaa"]),
    ("a{2,}", ["aa", "aaaa"], ["a"]),
    # stacked quantifiers stay Lucene-associative, never Java-lazy
    ("ab*?c", ["ac", "abc", "abbc"], ["adc"]),
    ("foo|bar", ["foo", "bar"], ["foobar", "fo"]),
    ("(ab|cd)e", ["abe", "cde"], ["ab", "e"]),
    ("()", [""], ["a"]),
    # ^ $ are LITERAL characters in the Lucene dialect
    ("^a$", ["^a$"], ["a"]),
    # quoted literal: metachars inside quotes are literal
    ('"a.c"', ["a.c"], ["abc"]),
    ('foo"[x]"', ["foo[x]"], ["foox"]),
    # @ = any string, # = empty language
    ("a@", ["a", "abc", "a.."], ["ba"]),
    ("a#b", [], ["ab", "a#b", "anything"]),
    ("(#)?", [""], ["a"]),
    # escapes
    (r"a\.c", ["a.c"], ["abc"]),
    (r"a\\c", ["a\\c"], ["ac"]),
    (r"\~x", ["~x"], ["x"]),
    # top-level intersection: both operands must cover the whole term
    ("[ab]*&.*a.*", ["a", "aba", "ba"], ["b", "bb", "ca"]),
    ("a.c&ab.", ["abc"], ["abd", "axc"]),
    # numeric intervals (Automata.makeDecimalInterval semantics):
    # different-length operands -> any leading zeros, value in range
    ("<1-10>", ["1", "7", "10", "007", "0000010"], ["0", "11", "x", ""]),
    ("<0-40>", ["0", "00", "39", "040"], ["41", "400"]),
    # same-length operands -> fixed width, zero-padded
    ("<01-10>", ["01", "05", "10"], ["1", "5", "11", "010"]),
    ("<10-99>", ["10", "55", "99"], ["9", "100", "055"]),
    # reversed bounds swap (RegExp.java:1316-1320)
    ("<10-1>", ["3", "10"], ["0", "11"]),
    # composes with surrounding pattern + quantifiers
    ("v<1-31>x?", ["v7", "v31x", "v07"], ["v32", "32"]),
]


@pytest.mark.parametrize("pattern,accept,reject", MATRIX)
def test_dialect_matrix(pattern, accept, reject):
    for s in accept:
        assert _matches(pattern, s), (pattern, s, "should match")
    for s in reject:
        assert not _matches(pattern, s), (pattern, s, "should NOT match")


@pytest.mark.parametrize(
    "pattern,op",
    [
        ("~abc", "~"),
        ("a~b", "~"),
        ("(a&b)c", "&"),  # nested intersection: no sound translation
        ("<myname>", "<myname>"),  # named automaton extension point
    ],
)
def test_unsupported_operators_raise(pattern, op):
    with pytest.raises(UnsupportedRegexpOperator) as ei:
        to_java_regex(pattern)
    assert op in str(ei.value)


@pytest.mark.parametrize(
    "pattern", ["(ab", "a)", "[abc", "a{2,", '"abc', "[]"]
)
def test_malformed_patterns_raise(pattern):
    with pytest.raises(RegexpSyntaxError):
        to_java_regex(pattern)


def test_anchoring_is_whole_term():
    # RegexpQuery matches the entire term, never a substring
    assert not re.search(term_predicate_pattern("b[aeiou]g"), "xbagx")
    assert re.search(term_predicate_pattern("b[aeiou]g"), "bag")
