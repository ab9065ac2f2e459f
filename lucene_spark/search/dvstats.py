"""DocValuesStats — the `lucene/misc` doc-values statistics collector.

Reference: misc/src/java/org/apache/lucene/misc/search/
  DocValuesStats.java:29           (count / missing / min / max)
  DocValuesStats.java:100-143      (NumericDocValuesStats: mean,
      population variance `variance/count`, stdev, sum — Welford
      accumulation over the match set)
  DocValuesStats.java:205+         (SortedNumericDocValuesStats: the
      same moments over EVERY value of a multi-valued field)
  DocValuesStats.java (SortedDocValuesStats)  (BytesRef fields:
      count / missing / lexicographic min / max only)
  DocValuesStatsCollector.java:28  (collector driving accumulate() for
      every hit of the query)

Spark-first: the reference's sequential Welford accumulator is exactly
what Catalyst's partial aggregates compute distributively — `avg`,
`var_pop`, `stddev_pop`, `sum`, `min`, `max`, `count` are all
map-side-combined builtin aggregates, so the whole collector is ONE
aggregation over (match set ⋈ doc values), no shuffle beyond the
final single-row reduce. `missing` is hits-without-a-value, per the
reference's accumulate() else-branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _joined(doc_set: DataFrame, docs: DataFrame, field: str) -> DataFrame:
    return doc_set.select("doc_id").join(
        docs.select("doc_id", field), "doc_id", "left"
    )


def numeric_stats(doc_set: DataFrame, docs: DataFrame, field: str) -> DataFrame:
    """LongDocValuesStats / DoubleDocValuesStats over the match set:
    one row (count, missing, min, max, sum, mean, variance, stdev).
    Variance is the population variance (DocValuesStats.java:131:
    ``variance / count``)."""
    c = F.col(field)
    return _joined(doc_set, docs, field).agg(
        F.count(c).alias("count"),
        (F.count(F.lit(1)) - F.count(c)).alias("missing"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("mean"),
        F.var_pop(c).alias("variance"),
        F.stddev_pop(c).alias("stdev"),
    )


def sorted_numeric_stats(
    doc_set: DataFrame, docs: DataFrame, field: str
) -> DataFrame:
    """SortedNumericDocValuesStats: `field` is an array column; the
    moments run over every VALUE (valuesCount) while count/missing stay
    per-document (DocValuesStats.java:205-258)."""
    c = F.col(field)
    has = c.isNotNull() & (F.size(c) > 0)
    exploded = (
        _joined(doc_set, docs, field)
        .select(
            "doc_id",
            has.alias("_has"),
            F.explode_outer(F.when(has, c).otherwise(F.array(F.lit(None)))).alias("v"),
        )
    )
    return exploded.agg(
        F.count_distinct(F.when(F.col("_has"), F.col("doc_id"))).alias("count"),
        F.count_distinct(F.when(~F.col("_has"), F.col("doc_id"))).alias("missing"),
        F.count(F.col("v")).alias("values_count"),
        F.min("v").alias("min"),
        F.max("v").alias("max"),
        F.sum("v").alias("sum"),
        F.avg("v").alias("mean"),
        F.var_pop("v").alias("variance"),
        F.stddev_pop("v").alias("stdev"),
    )


def sorted_stats(doc_set: DataFrame, docs: DataFrame, field: str) -> DataFrame:
    """SortedDocValuesStats (BytesRef field): count / missing /
    lexicographic min / max — the reference tracks no moments for
    binary fields."""
    c = F.col(field)
    return _joined(doc_set, docs, field).agg(
        F.count(c).alias("count"),
        (F.count(F.lit(1)) - F.count(c)).alias("missing"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
    )
