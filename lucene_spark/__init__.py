"""lucene_spark — a PySpark-native inverted-index build + BM25 top-k query engine.

A from-scratch re-expression of the reference engine's capabilities
(Apache Lucene, jpountz/lucene @ /root/reference) on Spark DataFrames:

- index build  = tokenize (Arrow UDF) -> invert (map-side combine) ->
  salted repartition by (term-bucket, docid-range) -> FOR/PFor block
  encode -> Parquet postings partitioned by term bucket
- query serve  = term-stats broadcast -> bucket-pruned postings scan ->
  vectorized block decode + float32 BM25 -> per-partition top-k ->
  TakeOrderedAndProject global merge

Nothing is copied from the reference; reference files are cited in
docstrings (file:line) for the *semantics* each module replicates.
"""

__version__ = "0.1.0"

from lucene_spark.session import get_spark  # noqa: F401
