"""Grouping module (lucene/grouping analog) vs a pandas brute force.

Reference semantics under test:
  GroupingSearch.java:49 two-pass grouped search (group paging +
  within-group paging), AllGroupsCollector.java:33 distinct-group
  count, AllGroupHeadsCollector.java:38 per-group head docs.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search.grouping import (
    group_heads,
    grouped_search,
    total_group_count,
)


@pytest.fixture(scope="module")
def scored(spark):
    rng = np.random.default_rng(7)
    n = 300
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            # coarse scores so ties exercise the docID tiebreak
            "score": np.round(rng.uniform(0, 3, n), 1),
            "lang": rng.choice(["go", "py", "rs", "java", "c"], n),
            "stars": rng.integers(0, 50, n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def brute(pdf, group_limit, group_offset=0, max_per=1, within_offset=0,
          gkey="score", gasc=False, wkey=None, wasc=None):
    wkey = gkey if wkey is None else wkey
    wasc = gasc if wasc is None else wasc

    def order(df, key, asc):
        return df.sort_values([key, "doc_id"], ascending=[asc, True],
                              kind="mergesort")

    heads = order(pdf, wkey, wasc).groupby("lang", as_index=False).head(0)
    # within ranks
    rows = []
    for lang, g in pdf.groupby("lang"):
        g = order(g, wkey, wasc).reset_index(drop=True)
        g["within_rank"] = np.arange(1, len(g) + 1)
        rows.append(g)
    ranked = pd.concat(rows)
    # group heads under group sort
    heads = []
    for lang, g in pdf.groupby("lang"):
        heads.append(order(g, gkey, gasc).iloc[0])
    heads = order(pd.DataFrame(heads), gkey, gasc).reset_index(drop=True)
    heads["group_rank"] = np.arange(1, len(heads) + 1)
    sel = heads[(heads.group_rank > group_offset)
                & (heads.group_rank <= group_offset + group_limit)]
    out = ranked.merge(sel[["lang", "group_rank"]], on="lang")
    out = out[(out.within_rank > within_offset)
              & (out.within_rank <= within_offset + max_per)].copy()
    out["within_rank"] -= within_offset
    return out


def normalize(df):
    cols = ["lang", "group_rank", "within_rank", "doc_id"]
    return sorted(map(tuple, df[cols].astype(object).values.tolist()))


def test_grouped_search_basic(scored):
    sdf, pdf = scored
    got = grouped_search(sdf, "lang", group_limit=3, max_docs_per_group=2).toPandas()
    want = brute(pdf, 3, max_per=2)
    assert normalize(got) == normalize(want)


def test_grouped_search_paging(scored):
    sdf, pdf = scored
    got = grouped_search(
        sdf, "lang", group_limit=2, group_offset=1,
        max_docs_per_group=3, within_group_offset=1,
    ).toPandas()
    want = brute(pdf, 2, group_offset=1, max_per=3, within_offset=1)
    assert normalize(got) == normalize(want)


def test_grouped_search_field_sorts(scored):
    """groupSort and withinGroupSort on a doc-values field, asc."""
    sdf, pdf = scored
    got = grouped_search(
        sdf, "lang", group_limit=4, max_docs_per_group=2,
        group_sort=(("stars", True),), within_sort=(("score", False),),
    ).toPandas()
    want = brute(pdf, 4, max_per=2, gkey="stars", gasc=True,
                 wkey="score", wasc=False)
    assert normalize(got) == normalize(want)


def test_total_group_count(scored):
    sdf, pdf = scored
    got = total_group_count(sdf, "lang").collect()[0]["group_count"]
    assert got == pdf.lang.nunique()


def test_group_heads(scored):
    sdf, pdf = scored
    got = group_heads(sdf, "lang").toPandas()
    want = {
        lang: g.sort_values(["score", "doc_id"], ascending=[False, True]).iloc[0].doc_id
        for lang, g in pdf.groupby("lang")
    }
    assert len(got) == len(want)
    assert {r.lang: r.doc_id for r in got.itertuples()} == want


def test_grouped_search_one_shuffle(scored):
    """Scale property: the match set is shuffled ONCE (hash partition on
    the group key); group selection joins back as a broadcast."""
    sdf, _ = scored
    plan = (
        grouped_search(sdf, "lang", group_limit=3, max_docs_per_group=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_unknown_sort_key_raises(scored):
    sdf, _ = scored
    with pytest.raises(ValueError):
        grouped_search(sdf, "lang", 2, group_sort=(("nope", True),))
