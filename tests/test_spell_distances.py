"""DirectSpellChecker pluggable StringDistance (spell.suggest_similar
``distance=``) — e2e over a purpose-built index, each suggestion list
checked against a brute-force dictionary rescore with the same pure
function (DirectSpellChecker.java setDistance: candidates stay the
max_edits fuzzy bound, the distance only scores)."""

from __future__ import annotations

import collections

import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.index import build_index, Index
from lucene_spark.search.distances import STRING_DISTANCES
from lucene_spark.search.executor import _edit_distance
from lucene_spark.search.spell import suggest_similar

_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "quick quack quibble quote",
    "brawn brown braun bron",
    "jumps jumbs bumps pumps",
    "fox box lox socks",
    "quick brown fox again",
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("spell_dist_idx"))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id long, text string"
    )
    build_index(
        spark, df, out, text_col="text", doc_id_col="doc_id",
        num_buckets=4, salt_rows=2048,
    )
    return Index(spark, out)


def _brute(term, num_sug, max_edits, min_prefix, accuracy, dist_key):
    dfs = collections.Counter()
    for t in _TEXTS:
        for tok in set(tokenize(t)[0]):
            dfs[tok] += 1
    fn = STRING_DISTANCES[dist_key]
    rows = []
    for cand, df in dfs.items():
        if cand == term or not cand.startswith(term[:min_prefix]):
            continue
        if _edit_distance(cand, term, True) > max_edits:
            continue
        score = fn(term, cand)
        if score >= accuracy:
            rows.append((cand, df, score))
    rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
    return rows[:num_sug]


@pytest.mark.parametrize("dist_key", sorted(STRING_DISTANCES))
def test_distance_rescore_matches_brute(idx, dist_key):
    term, k = "quik", 5
    got = [
        (r.suggestion, r.df, r.score)
        for r in suggest_similar(
            idx, term, num_sug=k, accuracy=0.3, distance=dist_key
        ).collect()
    ]
    want = _brute(term, k, 2, 1, 0.3, dist_key)
    assert [(s, d) for s, d, _ in got] == [(s, d) for s, d, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-6)


def test_internal_default_unchanged(idx):
    # the default path must stay the FuzzyTermsEnum formula
    got = suggest_similar(idx, "quik", num_sug=3).collect()
    assert got and all(0.0 <= r.score <= 1.0 for r in got)
    best = got[0]
    assert best.suggestion == "quick"
    assert best.score == pytest.approx(1.0 - 1 / 4, abs=1e-9)


def test_unknown_distance_rejected(idx):
    with pytest.raises(KeyError):
        suggest_similar(idx, "quik", distance="nope")
