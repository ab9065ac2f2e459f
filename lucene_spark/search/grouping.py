"""Grouping module — the `lucene/grouping` analog.

Reference: grouping/src/java/org/apache/lucene/search/grouping/
  GroupingSearch.java:49        (two-pass grouped-search facade)
  FirstPassGroupingCollector.java:42 (top groups ordered by groupSort —
      a group's rank is its BEST doc's sort key)
  TopGroupsCollector.java:40    (second pass: top docs per selected
      group ordered by withinGroupSort, withinGroupOffset paging)
  AllGroupsCollector.java:33    (total distinct group count)
  AllGroupHeadsCollector.java:38 (per-group most-relevant doc)

Spark-first: the reference's two collector passes over postings become
two window functions over the scored match set.

  * second pass  = ``row_number() OVER (PARTITION BY group ORDER BY
    withinGroupSort)`` — ONE hash-partition shuffle on the group key.
  * first pass   = rank the per-group head rows (``rn == 1`` under
    groupSort) with a distributed top-(offset+limit)
    (``TakeOrderedAndProject``, no global sort), then broadcast the
    selected-group set (tiny by contract: ``group_offset +
    group_limit`` rows) back onto the ranked match set.

At 100 TB the only full-data movement is the single partitionBy(group)
shuffle; group selection never materializes more than
``group_offset + group_limit`` rows on the driver side, and the final
filter is a broadcast-hash semi-join.

Sort specs are tuples of ``(key, ascending)`` where ``key`` is either
the literal string ``"score"`` or a column name of the input frame.
Exactly like Lucene's ``Sort`` with a trailing docID tiebreak, every
spec gets an implicit ``(doc_id, ascending)`` appended so results are
total-ordered and reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCORE = "score"

_GROUP_RANK = "group_rank"
_WITHIN_RANK = "within_rank"


def _order(sort_spec, frame_cols) -> list:
    cols = []
    for key, asc in sort_spec:
        name = SCORE if key == SCORE else key
        if name not in frame_cols:
            raise ValueError(f"sort key {key!r} not in frame columns")
        c = F.col(name)
        cols.append(c.asc() if asc else c.desc())
    cols.append(F.col("doc_id").asc())
    return cols


def grouped_search(
    scored: DataFrame,
    group_field: str,
    group_limit: int,
    group_offset: int = 0,
    max_docs_per_group: int = 1,
    within_group_offset: int = 0,
    group_sort=((SCORE, False),),
    within_sort=None,
) -> DataFrame:
    """GroupingSearch.search(groupOffset, groupLimit) analog.

    `scored` is the match set with at least (doc_id, score,
    group_field, <any sort fields>) — i.e. `Searcher.scored(q)` joined
    with the doc-values columns the sorts need. Returns one row per
    returned doc with ``group_rank`` (1-based rank of its group under
    groupSort, offset applied) and ``within_rank`` (1-based rank of the
    doc inside its group under withinGroupSort, offset applied), like
    TopGroups' nested GroupDocs flattened.
    """
    if within_sort is None:
        within_sort = group_sort
    cols = scored.columns

    w_in = Window.partitionBy(group_field).orderBy(*_order(within_sort, cols))
    ranked = scored.withColumn(_WITHIN_RANK, F.row_number().over(w_in))

    # first pass: each group's head row under groupSort carries the
    # group's sort key; distributed top-(offset+limit) of the heads.
    w_g = Window.partitionBy(group_field).orderBy(*_order(group_sort, cols))
    heads = (
        scored.withColumn("_grn", F.row_number().over(w_g))
        .filter(F.col("_grn") == 1)
        .drop("_grn")
        .orderBy(*_order(group_sort, cols))
        .limit(group_offset + group_limit)
    )
    # ranking the ≤ offset+limit selected heads: single tiny partition
    sel = (
        heads.withColumn(
            _GROUP_RANK,
            F.row_number().over(Window.orderBy(*_order(group_sort, cols))),
        )
        .filter(F.col(_GROUP_RANK) > group_offset)
        .select(group_field, _GROUP_RANK)
    )

    lo, hi = within_group_offset, within_group_offset + max_docs_per_group
    return (
        ranked.filter((F.col(_WITHIN_RANK) > lo) & (F.col(_WITHIN_RANK) <= hi))
        .join(F.broadcast(sel), group_field)
        .withColumn(_WITHIN_RANK, F.col(_WITHIN_RANK) - F.lit(lo))
    )


def total_group_count(scored: DataFrame, group_field: str) -> DataFrame:
    """AllGroupsCollector analog: number of distinct groups in the
    match set (GroupingSearch.setAllGroups(true) -> getAllMatchingGroups
    size). One row, column ``group_count``."""
    return scored.agg(
        F.countDistinct(group_field).alias("group_count")
    )


def group_heads(
    scored: DataFrame, group_field: str, sort=((SCORE, False),)
) -> DataFrame:
    """AllGroupHeadsCollector analog: for EVERY group in the match set,
    the single most-relevant doc under `sort` (no group paging — the
    reference returns a bitset of head docIDs)."""
    w = Window.partitionBy(group_field).orderBy(*_order(sort, scored.columns))
    return (
        scored.withColumn("_hrn", F.row_number().over(w))
        .filter(F.col("_hrn") == 1)
        .drop("_hrn")
    )
