"""Hierarchical taxonomy facets (facet/taxonomy/FastTaxonomyFacetCounts
.java:39, TaxonomyFacets.getTopChildren) — prefix counting, top-children
ranking, range facets, drill-sideways over the taxonomy dimension.
Brute-force oracles computed in plain Python on the same rows."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from lucene_spark import facets

ROWS = [
    # (doc_id, path)
    (0, ["web", "en", "short"]),
    (1, ["web", "en", "long"]),
    (2, ["web", "fr", "short"]),
    (3, ["wiki", "en", "short"]),
    (4, ["wiki", "en", "short"]),
    (5, ["wiki", "de", "long"]),
    (6, ["web", "en", "short"]),
]
MATCH_IDS = [0, 1, 2, 3, 4, 6]  # doc 5 does not match


def _frames(spark):
    docs = spark.createDataFrame(
        [(i, p) for i, p in ROWS], ["doc_id", "path"]
    )
    matches = spark.createDataFrame([(i,) for i in MATCH_IDS], ["doc_id"])
    return matches, docs


def _brute_counts():
    c: Counter = Counter()
    for i, p in ROWS:
        if i not in MATCH_IDS:
            continue
        for d in range(1, len(p) + 1):
            c["/".join(p[:d])] += 1
    return c


def test_taxonomy_counts_match_brute_force(spark):
    matches, docs = _frames(spark)
    got = {
        r["node"]: (r["parent"], r["depth"], r["cnt"])
        for r in facets.taxonomy_counts(matches, docs).collect()
    }
    want = _brute_counts()
    assert set(got) == set(want)
    for node, cnt in want.items():
        parent, depth, n = got[node]
        assert n == cnt
        assert depth == node.count("/") + 1
        assert parent == node.rsplit("/", 1)[0] if "/" in node else parent == ""


def test_taxonomy_top_children(spark):
    matches, docs = _frames(spark)
    rows = facets.taxonomy_top_children(matches, docs, top_n=1).collect()
    by_parent = {r["parent"]: r for r in rows}
    # root: web (4 matching docs) beats wiki (2)
    assert by_parent[""]["node"] == "web" and by_parent[""]["cnt"] == 4
    # under web: en (3) beats fr (1)
    assert by_parent["web"]["node"] == "web/en"
    # ties break label-asc: web/en/short(2) vs web/en/long(1) -> short
    assert by_parent["web/en"]["node"] == "web/en/short"
    assert all(r["rnk"] == 1 for r in rows)


def test_range_counts_overlapping(spark):
    docs = spark.createDataFrame(
        [(i, v) for i, v in enumerate([5, 15, 25, 95])], ["doc_id", "n"]
    )
    matches = docs.select("doc_id")
    ranges = [("lo", 0, 20), ("mid", 10, 30), ("all", 0, 100)]
    got = {
        r["bucket"]: r["cnt"]
        for r in facets.range_counts(matches, docs, "n", ranges).collect()
    }
    # overlapping ranges double-count docs, like the reference LongRange
    assert got == {"lo": 2, "mid": 2, "all": 4}


def test_drill_sideways_taxonomy(spark):
    matches, docs = _frames(spark)
    # drilled to ["web"]: sideways shows every level-1 sibling count
    got = {
        r["node"]: r["cnt"]
        for r in facets.drill_sideways_taxonomy(
            matches, docs, "path", ["web"]
        ).collect()
    }
    assert got == {"web": 4, "wiki": 2}
    # drilled to ["web", "en"]: level-2 siblings within the base match set
    got2 = {
        r["node"]: r["cnt"]
        for r in facets.drill_sideways_taxonomy(
            matches, docs, "path", ["web", "en"]
        ).collect()
    }
    assert got2 == {"web/en": 3, "web/fr": 1, "wiki/en": 2}


def test_taxonomy_plan_is_single_aggregate(spark):
    """Scale guard: the taxonomy count is explode -> ONE partial+final
    aggregate; no window, no join back to doc rows, no collect."""
    matches, docs = _frames(spark)
    plan = facets.taxonomy_counts(matches, docs)._jdf.queryExecution().executedPlan().toString()
    # join (<=2 exchanges for the tiny test frames) + ONE agg shuffle;
    # partial aggregation present (HashAggregate twice: partial+final)
    assert plan.count("Exchange") <= 3
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
