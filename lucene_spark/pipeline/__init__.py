"""Training-data pipeline operators over document / embedding tables.

Beyond the reference engine's own query surface, a 100 TB corpus pipeline
needs corpus hygiene and retrieval primitives. Everything here is
Spark-first: built-in functions where possible, Arrow-vectorized pandas
UDFs where not, and every hash is cross-engine stable (md5-derived,
reproducible in DuckDB SQL) so each operator has an independent oracle.

Modules:
- textstats  — token counting, quality scoring, language ID, fingerprints
- dedup      — exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine
- similarity — brute-force cosine top-k + LSH-bucketed ANN
- multimodal — binary asset columns: schema, decode/feature plumbing (stubbed codecs)
"""

from lucene_spark.pipeline import dedup, multimodal, similarity, textstats  # noqa: F401
