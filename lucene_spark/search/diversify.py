"""DiversifiedTopDocsCollector analog
(misc/src/java/org/apache/lucene/misc/search/DiversifiedTopDocsCollector.java:63):
top-k by score with at most ``max_hits_per_key`` docs sharing any one
key — the "no more than N hits from the same artist" result-diversity
collector. The reference maintains a global priority queue with
per-key eviction; the declarative equivalent is rank-within-key then
global top-k, which yields the same result set (a doc outside its
key's best N can never sit in the final queue: its key-mates above it
would evict it).

Spark shape: ONE shuffle on the key (the window partition), then
TakeOrderedAndProject for the global top-k — no global sort. At scale
the per-key rank prunes the candidate set to |keys| * N rows before
the top-k reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def diversified_top_k(
    scored: DataFrame,
    key_col: str,
    k: int,
    max_hits_per_key: int = 1,
    tie_col: str = "doc_id",
) -> DataFrame:
    """Top ``k`` rows of ``scored`` (needs ``score``, ``tie_col`` and
    ``key_col`` columns) by score desc / tie asc, keeping at most
    ``max_hits_per_key`` rows per key. NULL keys are their own group
    (the reference reserves a key slot for docs missing the field)."""
    w = Window.partitionBy(key_col).orderBy(
        F.desc("score"), F.asc(tie_col)
    )
    return (
        scored.withColumn("_dvk_rank", F.row_number().over(w))
        .filter(F.col("_dvk_rank") <= int(max_hits_per_key))
        .drop("_dvk_rank")
        .orderBy(F.desc("score"), F.asc(tie_col))
        .limit(int(k))
    )
