"""Sampled faceting (RandomSamplingFacetsCollector + amortizeFacetCounts
analogs, facet/RandomSamplingFacetsCollector.java:60,139,214) — see
lucene_spark/facets.py sample_matches/amortize_facet_counts for the
documented ordinal-bin -> docID-range-bin and XORShift -> deterministic
Knuth-hash deviations.
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.facets import (
    _HASH_MOD,
    _HASH_MULT,
    _HASH_PREMOD,
    amortize_facet_counts,
    sample_matches,
)


def _matches(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id long")


def test_passthrough_when_small(spark):
    m = _matches(spark, range(10))
    out, rate = sample_matches(m, sample_size=10)
    assert rate == 1.0 and out is m  # totalHits <= sampleSize: no sampling


def test_threshold_rule_brute_force_identity(spark):
    ids = [i for i in range(1000) if i % 3 != 0]  # 667 matches, gaps
    m = _matches(spark, ids)
    out, rate = sample_matches(m, sample_size=50, seed=11)
    got = sorted(r["doc_id"] for r in out.collect())
    # brute-force the documented rule in plain python
    n = len(ids)
    assert rate == 50 / n
    thr = int(rate * _HASH_MOD)

    def key(d):
        return ((d + 11) % _HASH_PREMOD) * _HASH_MULT % _HASH_MOD

    want = sorted(d for d in ids if key(d) < thr)
    assert got == want
    # Bernoulli(rate): sample size concentrates around the target
    assert 25 <= len(got) <= 85


def test_deterministic_and_seed_sensitive(spark):
    m = _matches(spark, range(500))
    a = {r["doc_id"] for r in sample_matches(m, 20, seed=1)[0].collect()}
    b = {r["doc_id"] for r in sample_matches(m, 20, seed=1)[0].collect()}
    c = {r["doc_id"] for r in sample_matches(m, 20, seed=2)[0].collect()}
    assert a == b  # reproducible given the seed (the reference's contract)
    assert a != c  # and the seed matters


def test_total_hits_skips_the_count_job(spark):
    m = _matches(spark, range(400))
    out, rate = sample_matches(m, 40, total_hits=400, seed=3)
    assert rate == 0.1
    assert 20 <= out.count() <= 65


def test_amortize_scales_and_caps(spark):
    counts = spark.createDataFrame(
        [("py", 30), ("go", 4)], "lang string, cnt long"
    )
    # rate 0.1 -> x10; 'py' capped at its true df 250
    cap = spark.createDataFrame(
        [("py", 250), ("go", 999)], "lang string, max_cnt long"
    )
    out = {
        r["lang"]: r["cnt"]
        for r in amortize_facet_counts(counts, 0.1, label_max=cap).collect()
    }
    assert out == {"py": 250, "go": 40}
    # rate 1.0 is a no-op (reference: totalHits <= sampleSize)
    assert amortize_facet_counts(counts, 1.0) is counts


def test_amortize_truncates_like_the_reference(spark):
    # (int)(count / rate): 7 / 0.3 = 23.33.. -> 23, not 24
    counts = spark.createDataFrame([("py", 7)], "lang string, cnt long")
    out = amortize_facet_counts(counts, 0.3).collect()
    assert out[0]["cnt"] == 23


def test_sampling_plan_is_shuffle_free(spark):
    """Scale guard: the sample is ONE narrow filter — no exchange, no
    window, no sort, no aggregate."""
    m = _matches(spark, range(2000))
    out, _ = sample_matches(m, 100, total_hits=2000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan
    for bad in ("Exchange", "Window", "Sort", "Aggregate"):
        assert bad not in plan, plan
