"""BlendedInfixSuggester (search/suggest.py) — mirrors the reference's
own tests (suggest/src/test/.../analyzing/TestBlendedInfixSuggester.java):
position-ranked suggestions across the weight quirks (unitary, zero,
Long.MAX_VALUE) and the exact blended values per blender type."""

from __future__ import annotations

import pytest

from lucene_spark.search.suggest import BlendedInfixSuggester

LONG_MAX = (1 << 63) - 1
STAR = "star wars: episode v - the empire strikes back"


def _sugg(spark, text, weight, **kw):
    df = spark.createDataFrame(
        [(0, text, weight)], "key long, text string, weight long"
    )
    return BlendedInfixSuggester(df, **kw).build()


def _score(s, query):
    rows = s.lookup(query, n=1).collect()
    return rows[0].score if rows else None


@pytest.mark.parametrize("weight", [8, 1, 0, LONG_MAX])
def test_blended_sort_ranking(spark, weight):
    # assertSuggestionsRanking: scores fall as the first matched token
    # moves away from the start; unmatched query returns nothing
    s = _sugg(spark, STAR, weight)
    w0 = _score(s, "star ")
    w1 = _score(s, "war")
    w2 = _score(s, "empire ba")
    w3 = _score(s, "back")
    assert w0 > w1 > w2 > w3
    assert _score(s, "bacc") is None


def test_blending_type_linear(spark):
    w = 20
    s = _sugg(spark, "top of the lake", w)
    assert _score(s, "top") == w
    assert _score(s, "the") == int(w * (1 - 0.10 * 2))
    assert _score(s, "lake") == int(w * (1 - 0.10 * 3))


def test_blending_type_reciprocal(spark):
    w = 20
    s = _sugg(spark, "top of the lake", w, blender_type="reciprocal", num_factor=1)
    assert _score(s, "top") == w
    assert _score(s, "the") == int(w * 1 / (1 + 2))
    assert _score(s, "lake") == int(w * 1 / (1 + 3))


def test_blending_type_exponential_reciprocal(spark):
    w = 20
    s = _sugg(
        spark, "top of the lake", w,
        blender_type="exponential_reciprocal", num_factor=1, exponent=4.0,
    )
    assert _score(s, "top") == w
    assert _score(s, "the") == int(w * 1 / (1 + 2) ** 4.0)
    assert _score(s, "lake") == int(w * 1 / (1 + 3) ** 4.0)


def test_small_weight_scale_up(spark):
    # weights in (-10, 10) are scaled by 1/LINEAR_COEF so the long cast
    # keeps resolution (BlendedInfixSuggester.java:266-268); weight 0
    # first becomes 1
    s = _sugg(spark, "top of the lake", 2)
    assert _score(s, "the") == int(2 * 10 * (1 - 0.10 * 2))
    s0 = _sugg(spark, "top of the lake", 0)
    assert _score(s0, "the") == int(1 * 10 * (1 - 0.10 * 2))


def test_num_factor_promotes_blended_winners(spark, tmp_path):
    # testRequiresMore analog: "lake" matched late in a heavy
    # suggestion vs early in a light one — with num_factor high enough
    # the light one wins after blending
    rows = [
        (0, "top of the lake", 18),
        (1, "lake view apartment", 10),
    ]
    df = spark.createDataFrame(rows, "key long, text string, weight long")
    s = BlendedInfixSuggester(df, blender_type="reciprocal", num_factor=10).build()
    out = s.lookup("lake", n=2).collect()
    # light entry: pos 0 -> 10*1 = 10; heavy entry: pos 3 -> 18/4 = 4
    assert [r.key for r in out] == [1, 0]
    assert out[0].score == 10 and out[1].score == 4


def test_unknown_blender_rejected(spark):
    df = spark.createDataFrame([(0, "x", 1)], "key long, text string, weight long")
    with pytest.raises(ValueError):
        BlendedInfixSuggester(df, blender_type="nope")
