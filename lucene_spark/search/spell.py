"""Spell correction — the DirectSpellChecker analog
(suggest/src/java/org/apache/lucene/search/spell/DirectSpellChecker.java):
"did you mean" candidates straight from the live terms dictionary, no
side index.

Reference semantics reproduced: candidates within ``max_edits``
transposition-aware (Damerau) edits of the query term that share its
``min_prefix``-char prefix; similarity = 1 - ed / min(|term|,
|candidate|) (fuzzy-style length-normalized distance,
FuzzyTermsEnum.java:249-255); candidates below ``accuracy`` drop
(DirectSpellChecker.java accuracy field); ordered score desc, doc freq
desc, term asc (the SuggestWordQueue comparator cascade).

Spark shape: ONE pruned scan of the term_stats table — the length-band,
prefix and loose-Levenshtein predicates run JVM-side against the
dictionary scan (dictionary FST intersection analog), the exact
Damerau distance in one Arrow-batched UDF over the few survivors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.index.reader import Index
from lucene_spark.search.distances import STRING_DISTANCES
from lucene_spark.search.executor import _edit_distance


def suggest_similar(
    index: Index,
    term: str,
    num_sug: int = 5,
    max_edits: int = 2,
    min_prefix: int = 1,
    accuracy: float = 0.5,
    min_df: int = 1,
    more_popular: bool = False,
    field: str | None = None,
    distance: str = "internal",
) -> DataFrame:
    """-> DataFrame(suggestion, df, score), best first.

    ``more_popular``: only suggest terms with df strictly above the
    query term's own df (SuggestMode.SUGGEST_MORE_POPULAR).

    ``distance``: scoring metric (DirectSpellChecker.setDistance) —
    ``internal`` (default, FuzzyTermsEnum 1-ed/min formula) or a
    `search.distances.STRING_DISTANCES` key (levenshtein,
    jaro_winkler, ngram, lucene_levenshtein). As in the reference,
    candidate GENERATION is always the max_edits fuzzy bound; the
    pluggable distance only rescores the survivors, and ``accuracy``
    thresholds that score."""
    term = term.lower()
    k = int(max_edits)
    stats = index.term_stats
    if index.has_field_column:
        stats = stats.filter(F.col("field") == index.resolve_field(field))
    pred = (
        (F.col("term") != term)
        & (F.abs(F.length(F.col("term")) - F.lit(len(term))) <= k)
        # damerau <= k implies plain levenshtein <= 2k (a transposition
        # costs at most 2 plain edits) — JVM-side pre-filter
        & (F.levenshtein(F.col("term"), F.lit(term)) <= 2 * k)
    )
    if min_prefix:
        pred = pred & F.col("term").startswith(term[:min_prefix])
    cand = stats.filter(pred).groupBy("term").agg(F.sum("df").alias("df"))
    if min_df > 1:
        cand = cand.filter(F.col("df") >= min_df)
    if more_popular:
        own = index.stats_for_terms([term], field)
        own_df = own[term][0] if term in own else 0
        cand = cand.filter(F.col("df") > own_df)

    dist_fn = None if distance == "internal" else STRING_DISTANCES[distance]

    @F.pandas_udf(T.IntegerType())
    def ed_udf(terms: pd.Series) -> pd.Series:
        return pd.Series(
            [_edit_distance(t, term, True) for t in terms], dtype="int32"
        )

    cand = cand.withColumn("ed", ed_udf("term")).filter(F.col("ed") <= k)
    if dist_fn is None:
        score = (
            F.lit(1.0)
            - F.col("ed")
            / F.least(F.length("term"), F.lit(len(term))).cast("double")
        )
    else:

        @F.pandas_udf(T.DoubleType())
        def dist_udf(terms: pd.Series) -> pd.Series:
            return pd.Series([float(dist_fn(term, t)) for t in terms])

        score = dist_udf("term")
    return (
        cand.withColumn("score", score)
        .filter(F.col("score") >= float(accuracy))
        .select(F.col("term").alias("suggestion"), "df", "score")
        .orderBy(F.desc("score"), F.desc("df"), F.asc("suggestion"))
        .limit(int(num_sug))
    )
