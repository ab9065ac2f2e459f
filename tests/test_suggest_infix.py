"""InfixSuggester (suggest/analyzing/AnalyzingInfixSuggester.java:102)
— prefix-on-last-token / exact-on-earlier semantics, weight ranking,
context filtering, allTermsRequired=False union ranking."""

from __future__ import annotations

from lucene_spark.search.suggest import InfixSuggester

ENTRIES = [
    # (key, text, weight, contexts)
    (1, "lucene in action", 50, ["book"]),
    (2, "lucene for dummies", 30, ["book"]),
    (3, "managing lucene indexes", 80, ["blog"]),
    (4, "action movies review", 20, ["blog"]),
    (5, "lucid dreaming", 90, ["blog"]),
]


def _sug(spark, **kw):
    df = spark.createDataFrame(
        ENTRIES, ["key", "text", "weight", "contexts"]
    )
    return InfixSuggester(df, contexts_col="contexts", **kw)


def test_last_token_is_prefix_any_position(spark):
    s = _sug(spark)
    # "luc" matches lucene (any word position: infix) AND lucid
    got = [r["key"] for r in s.lookup("luc", 10).collect()]
    assert got == [5, 3, 1, 2]  # weight desc: 90, 80, 50, 30


def test_earlier_tokens_exact(spark):
    s = _sug(spark)
    # "lucene" exact + "act" prefix -> only "lucene in action"
    got = [r["key"] for r in s.lookup("lucene act", 10).collect()]
    assert got == [1]
    # "luc act" would need token 'luc' EXACT -> no entry has it
    assert s.lookup("luc act", 10).count() == 0


def test_weight_ordering_and_limit(spark):
    s = _sug(spark)
    got = [r["key"] for r in s.lookup("lucene", 2).collect()]
    assert got == [3, 1]  # top-2 by weight among 3 lucene entries


def test_context_filtering(spark):
    s = _sug(spark)
    got = [r["key"] for r in s.lookup("lucene", 10, contexts=["book"]).collect()]
    assert got == [1, 2]


def test_all_terms_required_false(spark):
    s = _sug(spark)
    # union semantics: entries matching MORE tokens rank first
    rows = s.lookup(
        "lucene action", 10, all_terms_required=False
    ).collect()
    keys = [r["key"] for r in rows]
    # key 1 matches both tokens; 3, 2 match 'lucene'; 4 matches 'action'
    assert keys[0] == 1
    assert set(keys) == {1, 2, 3, 4}
    # among single-token matches, weight desc: 3 (80), 2 (30), 4 (20)
    assert keys[1:] == [3, 2, 4]


def test_build_materializes_and_results_stable(spark):
    s = _sug(spark).build()
    assert [r["key"] for r in s.lookup("luc", 10).collect()] == [5, 3, 1, 2]
