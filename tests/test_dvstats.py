"""DocValuesStats (misc/search/DocValuesStats.java) vs a NumPy brute
force, including the reference's sequential Welford accumulation —
proving the distributed builtin aggregates compute the identical
moments (population variance = variance/count, DocValuesStats.java:131).
"""

import math

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search.dvstats import (
    numeric_stats,
    sorted_numeric_stats,
    sorted_stats,
)


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(11)
    n = 200
    vals = rng.integers(-50, 1000, n).astype(float)
    vals[rng.choice(n, 30, replace=False)] = np.nan  # 30 missing docs
    langs = rng.choice(["go", "py", "rs"], n).astype(object)
    langs[rng.choice(n, 20, replace=False)] = None
    multi = [
        None if i % 7 == 0
        else [int(x) for x in rng.integers(0, 100, int(rng.integers(0, 4)))]
        for i in range(n)
    ]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64), "num": vals,
         "lang": langs, "multi": multi}
    )
    docs = spark.createDataFrame(pdf)
    # match set: every 3rd doc
    match = pdf[pdf.doc_id % 3 == 0][["doc_id"]]
    return spark.createDataFrame(match), docs, pdf, match


def welford(values):
    """The reference's accumulation loop, verbatim semantics
    (DocValuesStats.java:157-168)."""
    count, mean, variance, mn, mx, sm = 0, 0.0, 0.0, math.inf, -math.inf, 0.0
    for v in values:
        count += 1
        mn, mx, sm = min(mn, v), max(mx, v), sm + v
        old = mean
        mean += (v - mean) / count
        variance += (v - mean) * (v - old)
    return count, mn, mx, sm, mean, variance / count if count else 0.0


def test_numeric_stats(frames):
    match_df, docs, pdf, match = frames
    row = numeric_stats(match_df, docs, "num").collect()[0]
    sub = pdf.merge(match, on="doc_id")
    vals = sub.num.dropna().values
    count, mn, mx, sm, mean, var = welford(vals)
    assert row["count"] == count
    assert row["missing"] == len(sub) - count
    assert row["min"] == mn and row["max"] == mx
    assert row["sum"] == pytest.approx(sm)
    assert row["mean"] == pytest.approx(mean, rel=1e-9)
    assert row["variance"] == pytest.approx(var, rel=1e-9)
    assert row["stdev"] == pytest.approx(math.sqrt(var), rel=1e-9)


def test_sorted_stats(frames):
    match_df, docs, pdf, match = frames
    row = sorted_stats(match_df, docs, "lang").collect()[0]
    sub = pdf.merge(match, on="doc_id")
    present = sub.lang.dropna()
    assert row["count"] == len(present)
    assert row["missing"] == len(sub) - len(present)
    assert row["min"] == present.min() and row["max"] == present.max()


def test_sorted_numeric_stats(frames):
    """Multi-valued field: moments over every VALUE, count/missing per
    document (SortedNumericDocValuesStats, DocValuesStats.java:205)."""
    match_df, docs, pdf, match = frames
    row = sorted_numeric_stats(match_df, docs, "multi").collect()[0]
    sub = pdf.merge(match, on="doc_id")
    has = sub.multi.map(lambda v: v is not None and len(v) > 0)
    flat = [v for lst in sub.multi[has] for v in lst]
    count, mn, mx, sm, mean, var = welford([float(v) for v in flat])
    assert row["count"] == int(has.sum())
    assert row["missing"] == len(sub) - int(has.sum())
    assert row["values_count"] == len(flat)
    assert row["min"] == mn and row["max"] == mx
    assert row["sum"] == sm
    assert row["mean"] == pytest.approx(mean, rel=1e-9)
    assert row["variance"] == pytest.approx(var, rel=1e-9)


def test_single_aggregation_plan(frames):
    """Scale property: the whole collector is one partial+final
    HashAggregate over a broadcast join — no extra shuffle of docs."""
    match_df, docs, _, _ = frames
    plan = (
        numeric_stats(match_df, docs, "num")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 0
