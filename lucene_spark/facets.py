"""Faceting — flat term counts, range counts, and hierarchical taxonomy
counts (facet/FacetsCollector.java, facet/range/RangeFacetCounts.java,
facet/taxonomy/FastTaxonomyFacetCounts.java:39, TaxonomyReader.java).

Spark-first shapes. A facet dimension is a docs-table column; the
taxonomy analog is an ``ARRAY<STRING>`` path column (the reference's
FacetLabel / ordinal dictionary collapses to the path prefixes
themselves — Spark shuffles by the prefix value, so no global ordinal
assignment pass is needed). Counting a dimension is a semi-joined
groupBy with map-side partial aggregation: at 100 TB each facet costs
one shuffle of (#distinct-nodes x #partitions) partial rows, never a
doc-row shuffle. Everything below is built-in column expressions
(whole-stage codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SEP = "/"


def path_column(*levels) -> "F.Column":
    """Build the ARRAY<STRING> taxonomy path from level expressions
    (FacetField("dim", "level1", "level2", ...) analog). Level values
    must not contain the separator; cast + null-safe."""
    return F.array(*[F.col(c) if isinstance(c, str) else c for c in levels])


def taxonomy_counts(
    matches: DataFrame,
    docs: DataFrame,
    path_col: str = "path",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """FastTaxonomyFacetCounts.java:39 analog: for every matching doc,
    count EVERY prefix of its taxonomy path (the reference increments
    the ordinal of each path ancestor per doc; here the "ordinal" is
    the joined prefix string).

    Returns (node, parent, depth, cnt): node = "a/b/c" prefix joined
    with '/', parent = the node one level up ('' at depth 1).

    Plan: semi-join matches into the path projection, explode the
    prefix arrays (output rows = depth x matches, bounded by max path
    depth), then ONE groupBy(node) with partial aggregation. No window,
    no driver collect."""
    path = F.col(path_col)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(path)),
        lambda i: F.slice(path, F.lit(1), i),
    )
    joined = matches.select(doc_id_col).join(
        docs.select(doc_id_col, path_col), doc_id_col
    )
    exploded = joined.select(F.explode(prefixes).alias("node_arr"))
    counts = exploded.groupBy("node_arr").agg(F.count(F.lit(1)).alias("cnt"))
    depth = F.size("node_arr")
    return counts.select(
        F.array_join("node_arr", SEP).alias("node"),
        F.array_join(F.slice("node_arr", F.lit(1), depth - 1), SEP).alias(
            "parent"
        ),
        depth.alias("depth"),
        "cnt",
    )


def taxonomy_sum_values(
    matches: DataFrame,
    docs: DataFrame,
    value_col: str,
    path_col: str = "path",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Association facets analog (facet/taxonomy/
    TaxonomyFacetSumValueSource.java, TaxonomyFacetIntAssociations /
    FloatAssociations with AssociationAggregationFunction.SUM): every
    matching doc contributes its per-doc association value to EVERY
    ancestor of its taxonomy path; per-node aggregate = SUM.

    Returns (node, parent, depth, total). Same one-shuffle shape as
    ``taxonomy_counts`` (explode bounded by path depth, map-side
    partial agg); the value rides the same projection, so adding the
    aggregation costs no extra scan or shuffle."""
    path = F.col(path_col)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(path)),
        lambda i: F.slice(path, F.lit(1), i),
    )
    joined = matches.select(doc_id_col).join(
        docs.select(doc_id_col, path_col, value_col), doc_id_col
    )
    exploded = joined.select(
        F.explode(prefixes).alias("node_arr"),
        F.col(value_col).cast("double").alias("_v"),
    )
    sums = exploded.groupBy("node_arr").agg(F.sum("_v").alias("total"))
    depth = F.size("node_arr")
    return sums.select(
        F.array_join("node_arr", SEP).alias("node"),
        F.array_join(F.slice("node_arr", F.lit(1), depth - 1), SEP).alias(
            "parent"
        ),
        depth.alias("depth"),
        "total",
    )


def long_value_counts(
    matches: DataFrame,
    docs: DataFrame,
    value_expr: str,
    topn: int | None = None,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """LongValueFacetCounts (facet/LongValueFacetCounts.java:49,279-342):
    count of matching docs per distinct value of a long value source.
    ``getTopChildrenSortByCount`` ordering: count desc, ties by value
    ascending (line 302); ``getAllChildrenSortByValue`` when ``topn`` is
    None. Docs with a NULL value don't count (missing doc values).

    Spark shape: ONE map-side-combined shuffle on the value; top-N is
    TakeOrderedAndProject — no global sort."""
    joined = matches.select(doc_id_col).join(
        docs.select(
            doc_id_col, F.expr(value_expr).cast("long").alias("value")
        ),
        doc_id_col,
    )
    counts = (
        joined.filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if topn is not None:
        return counts.orderBy(F.desc("cnt"), F.asc("value")).limit(topn)
    return counts.orderBy("value")


def taxonomy_top_children(
    matches: DataFrame,
    docs: DataFrame,
    path_col: str = "path",
    top_n: int = 2,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """getTopChildren analog (TaxonomyFacets.getTopChildren): the top-N
    children of EVERY node (and of the root) by (count desc, label asc).
    One extra window shuffle over the tiny node-count table only."""
    counts = taxonomy_counts(matches, docs, path_col, doc_id_col)
    w = Window.partitionBy("parent").orderBy(F.desc("cnt"), F.asc("node"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select("parent", "node", "cnt", "rnk")
    )


def term_counts(
    matches: DataFrame, docs: DataFrame, dim: str, doc_id_col: str = "doc_id"
) -> DataFrame:
    """Flat SSDV facet counts (SortedSetDocValuesFacetCounts.java):
    (value, cnt) for one docs-table dimension column."""
    return (
        matches.select(doc_id_col)
        .join(docs.select(doc_id_col, dim), doc_id_col)
        .groupBy(F.col(dim).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def range_counts(
    matches: DataFrame,
    docs: DataFrame,
    col: str,
    ranges: list[tuple[str, float, float]],
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """LongRangeFacetCounts analog: ``ranges`` = (label, lo, hi] ...
    actually [lo, hi) like the reference's LongRange(minInclusive=True,
    maxInclusive=False). Overlapping ranges are allowed (a doc counts in
    each covering range), matching the reference — hence one aggregate
    per range folded into a single groupBy over an exploded label array."""
    c = F.col(col)
    labels = F.array(
        *[
            F.when((c >= F.lit(lo)) & (c < F.lit(hi)), F.lit(label))
            for label, lo, hi in ranges
        ]
    )
    return (
        matches.select(doc_id_col)
        .join(docs.select(doc_id_col, col), doc_id_col)
        .select(F.explode(F.filter(labels, lambda x: x.isNotNull())).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def drill_sideways_taxonomy(
    matches: DataFrame,
    docs: DataFrame,
    path_col: str,
    drill_prefix: list[str],
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """DrillSideways over the taxonomy dimension: counts of the SIBLING
    subtree nodes at the drilled depth — the drill-down on the dimension
    itself is dropped (DrillSideways.java:63 contract), so the user sees
    every alternative value at that level with the base query applied."""
    depth = len(drill_prefix)
    path = F.col(path_col)
    joined = matches.select(doc_id_col).join(
        docs.select(doc_id_col, path_col), doc_id_col
    )
    node = F.array_join(F.slice(path, F.lit(1), F.lit(depth)), SEP)
    return (
        joined.filter(F.size(path) >= depth)
        .groupBy(node.alias("node"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---- sampled faceting (RandomSamplingFacetsCollector analog) -----------

# Knuth multiplicative-hash constants for the per-doc deterministic
# "random" key. 2**31 pre-reduction keeps (2**31)*2654435761 < 2**63
# (no 64-bit overflow in any engine).
_HASH_MULT = 2654435761
_HASH_PREMOD = 1 << 31
_HASH_MOD = 1 << 32


def _sample_key(doc_id, seed: int):
    """The per-doc sampling key, as a Column. Exact integer arithmetic —
    replicable bit-for-bit in plain SQL (the oracle gates do), unlike a
    seeded sequential RNG."""
    return F.pmod(
        F.pmod(doc_id + F.lit(int(seed)), F.lit(_HASH_PREMOD))
        * F.lit(_HASH_MULT),
        F.lit(_HASH_MOD),
    )


def sample_matches(
    matches: DataFrame,
    sample_size: int,
    total_hits: int | None = None,
    seed: int = 0,
    doc_id_col: str = "doc_id",
) -> tuple[DataFrame, float]:
    """RandomSamplingFacetsCollector analog
    (facet/RandomSamplingFacetsCollector.java:60,139-210): when the match
    set exceeds ``sample_size``, facet over a ~sample_size subset picked
    one-per-bin, and amortize the counts back up by the sampling rate.

    Returns ``(sampled_matches, sampling_rate)``; rate 1.0 (and the
    original DataFrame) when no sampling is needed — the reference's
    ``totalHits <= sampleSize`` passthrough.

    Faithful-vs-distributed deviation, by design: the reference walks
    the matches in docID order, slices them into consecutive bins of
    ``1/rate`` matches and picks one per bin with a seeded XORShift64 —
    a stratified exactly-sampleSize sample. The bin structure needs
    every match's ORDINAL, i.e. a global ordering pass (a full sort or
    a one-partition window) — a scale-killer at 10^12 docs — and a
    sequential RNG cannot be replayed distributively. Here a match is
    kept iff a Knuth multiplicative hash of (doc_id + seed) falls under
    ``rate * 2^32``: Bernoulli(rate) per doc instead of
    stratified-exactly-S, the SAME sampling rate (so
    :func:`amortize_facet_counts` stays unbiased: each kept doc
    represents 1/rate matches in expectation), sample size
    Binomial(n, rate) ~ sampleSize, deterministic given the seed (the
    reason the reference takes a seed) and bit-replicable in plain SQL.
    The stratification the reference buys is a small variance reduction;
    the price here would be a global sort.

    Plan: ONE narrow filter on the match set — no shuffle, no window,
    no sort, nothing collected.

    ``total_hits``: pass the already-known match count to skip the
    count job (the reference reads it off its collected bitsets).
    """
    n = int(total_hits) if total_hits is not None else matches.count()
    if n <= sample_size:
        return matches, 1.0
    rate = sample_size / n
    threshold = int(rate * _HASH_MOD)
    sampled = matches.filter(
        _sample_key(F.col(doc_id_col), seed) < F.lit(threshold)
    )
    return sampled, rate


def amortize_facet_counts(
    counts: DataFrame,
    sampling_rate: float,
    cnt_col: str = "cnt",
    label_max: DataFrame | None = None,
) -> DataFrame:
    """amortizeFacetCounts (RandomSamplingFacetsCollector.java:214-246):
    scale sampled counts back up — ``corrected = (int)(count / rate)``,
    then cap per label at its true document frequency when an upper
    bound is available (the reference reads ``IndexReader.docFreq`` off
    the term dictionary; pass the analog as ``label_max``: a DataFrame
    sharing the label column(s) plus a ``max_cnt`` column, e.g. a
    precomputed dimension-cardinality table). No-op at rate 1.0."""
    if sampling_rate >= 1.0:
        return counts
    out = counts.withColumn(
        cnt_col,
        F.floor(F.col(cnt_col) / F.lit(float(sampling_rate))).cast("long"),
    )
    if label_max is not None:
        on = [c for c in label_max.columns if c != "max_cnt"]
        out = out.join(label_max, on, "left").withColumn(
            cnt_col, F.least(F.col(cnt_col), F.col("max_cnt"))
        ).drop("max_cnt")
    return out
