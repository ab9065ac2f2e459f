"""FuzzySuggester analog (suggest/analyzing/FuzzySuggester.java:66) —
typo-tolerant completion: the typed query matches a completion when
some PREFIX of the completion is within ``max_edits`` of it
(the reference intersects a Levenshtein automaton of the query with
the suggestion FST).

Reference defaults preserved (FuzzySuggester.java:104-120):
max_edits=1, transpositions=True, non_fuzzy_prefix=1,
min_fuzzy_length=3 (shorter queries complete exactly).

Relational shape (one bucket-pruned term_stats scan, like
Searcher.suggest):

1. pushdown pre-filter — candidates must share the non-fuzzy prefix
   and be long enough (|term| >= |q| - max_edits); both sargable.
2. JVM band — prefix-edit-distance identity: some prefix of t is
   within e of q  iff  min over L in [|q|-e, |q|+e] of
   lev(q, t[:L]) <= e (any closer prefix must have length within e of
   |q|). 2e+1 ``levenshtein(substring(...))`` terms, all codegen.
   With transpositions a Damerau match only guarantees lev <= 2e, so
   the band widens to 2e and step 3 refines.
3. exact refine (transpositions only) — Arrow-batched Damerau prefix
   distance over the few banded survivors (shares executor's
   _edit_distance).

Ranking: weight desc (ttf, like Searcher.suggest), term asc — the
reference ranks by FST weight only; fuzzier matches do not rank lower
(FuzzySuggester javadoc notes exactly this).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.search.executor import _edit_distance


def _prefix_lev_band(q: str, e: int):
    """min over L in [|q|-e, |q|+e] of lev(q, term[:L]) as a codegen
    column (substring is 1-based; L floors at 1)."""
    cols = [
        F.levenshtein(F.substring(F.col("term"), 1, max(1, L)), F.lit(q))
        for L in range(max(1, len(q) - e), len(q) + e + 1)
    ]
    return F.least(*cols) if len(cols) > 1 else cols[0]


class FuzzySuggester:
    def __init__(
        self,
        index,
        max_edits: int = 1,
        transpositions: bool = True,
        non_fuzzy_prefix: int = 1,
        min_fuzzy_length: int = 3,
        field: str | None = None,
    ):
        if not 0 <= max_edits <= 2:
            raise ValueError("max_edits must be 0..2 (LevenshteinAutomata bound)")
        self.index = index
        self.max_edits = max_edits
        self.transpositions = transpositions
        self.non_fuzzy_prefix = non_fuzzy_prefix
        self.min_fuzzy_length = min_fuzzy_length
        self.field = field

    def _stats(self) -> DataFrame:
        stats = self.index.term_stats
        if self.index.has_field_column:
            stats = stats.filter(
                F.col("field") == self.index.resolve_field(self.field)
            )
        return stats.groupBy("term").agg(F.sum("ttf").alias("weight"))

    def lookup(self, query: str, n: int = 10) -> DataFrame:
        """Top-``n`` (term, weight) completions."""
        stats = self._stats()
        e = self.max_edits
        if len(query) < self.min_fuzzy_length or e == 0:
            cand = stats.filter(F.col("term").startswith(query))
        else:
            pre = F.col("term").startswith(query[: self.non_fuzzy_prefix])
            pre = pre & (F.length("term") >= len(query) - e)
            band = 2 * e if self.transpositions else e
            cand = stats.filter(pre).filter(
                _prefix_lev_band(query, e) <= band
            )
            if self.transpositions:
                q = query
                k = e

                @F.pandas_udf(T.IntegerType())
                def ped(terms: pd.Series) -> pd.Series:
                    lo, hi = max(1, len(q) - k), len(q) + k

                    def d(t: str) -> int:
                        return min(
                            _edit_distance(t[:L], q, True)
                            for L in range(lo, min(hi, len(t)) + 1)
                        )

                    return pd.Series([d(t) for t in terms], dtype="int32")

                cand = cand.filter(ped("term") <= e)
        return cand.orderBy(F.desc("weight"), F.asc("term")).limit(n)
