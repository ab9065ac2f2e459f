"""Deterministic sampling, splitting, mixing and sequence packing for
training-data pipelines.

Every operator here is driven by ONE portable per-document hash
(`hash_unit`): a split-multiply LCG over doc_id computed with identical
integer arithmetic in Spark Catalyst and DuckDB SQL, so the driver's
oracle gate can replay each operator exactly. No randomness, no state:
re-running a pipeline over the same corpus reproduces the same splits,
samples and mixtures — the property large training runs actually need
(resumable jobs, auditable membership).

Scale notes (100 TB):

* hash split / source mixing are per-row projections + pushed-down
  filters — no shuffle at all.
* `pack_concat` (GPT-style concat-and-chunk packing: concatenate docs
  in doc_id order, cut every ``seq_len`` tokens) needs a GLOBAL ordered
  prefix sum. A bare ``Window.orderBy`` collapses to one partition, so
  it is computed in two levels: per-bucket token sums (bucket =
  doc_id // bucket_width, a map-side groupBy), an ordered prefix sum
  over the SMALL bucket-sums table, broadcast back, then a window
  cumsum partitioned BY bucket. With bucket_width ~ sqrt(N) both
  levels stay ~sqrt(N) rows per task at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_spark.pipeline.textstats import WORD_RE

# Split-multiply LCG constants (glibc's LCG multiplier). doc_id is mixed
# as lo/hi 31-bit halves so every intermediate fits in int64 for
# doc_id < 2^62 — both Spark and DuckDB error/wrap on BIGINT overflow,
# so portable arithmetic must never overflow.
_A_LO = 1103515245
_A_HI = 784588716
_M = 1 << 31


def hash_unit(id_col: Column, seed: int = 0) -> Column:
    """Deterministic uniform-ish value in [0, 1) per id — identical in
    Spark and in the DuckDB oracle (hash_unit_sql)."""
    lo = id_col % _M
    hi = F.shiftright(id_col.cast("long"), 31) % _M
    h = (lo * _A_LO % _M + hi * _A_HI % _M + F.lit(int(seed))) % _M
    return h.cast("double") / F.lit(float(_M))


def hash_unit_sql(id_expr: str, seed: int = 0) -> str:
    """The DuckDB twin of hash_unit (same integer arithmetic)."""
    return (
        f"(((({id_expr}) % {_M}) * {_A_LO} % {_M}"
        f" + (({id_expr}) >> 31) % {_M} * {_A_HI} % {_M}"
        f" + {seed}) % {_M}) / {float(_M)}"
    )


def split_assign(df: DataFrame, fractions: dict[str, float],
                 seed: int = 0, id_col: str = "doc_id") -> DataFrame:
    """Assign every doc to exactly one named split (train/val/test...)
    by cumulative thresholds over hash_unit. ``fractions`` must sum to
    1.0 (the last split absorbs rounding). Deterministic, stateless,
    shuffle-free."""
    names = list(fractions)
    u = hash_unit(F.col(id_col), seed)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += float(fractions[name])
        w = F.when(u < F.lit(acc), F.lit(name))
        expr = w if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    expr = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    return df.withColumn("split", expr)


def source_mix(df: DataFrame, weights: dict[str, float], seed: int = 0,
               source_col: str = "source", id_col: str = "doc_id") -> DataFrame:
    """Weighted source mixture: keep each doc with its source's
    probability (hash-Bernoulli — deterministic membership). Sources
    absent from ``weights`` are dropped. The CASE + comparison pushes
    to the scan; no shuffle."""
    u = hash_unit(F.col(id_col), seed)
    thr = None
    for src, w in sorted(weights.items()):
        c = F.when(F.col(source_col) == src, F.lit(float(w)))
        thr = c if thr is None else thr.when(F.col(source_col) == src, F.lit(float(w)))
    thr = thr.otherwise(F.lit(0.0))
    return df.filter(u < thr)


def pack_concat(df: DataFrame, seq_len: int, text_col: str = "text",
                id_col: str = "doc_id", bucket_width: int = 1024,
                token_expr: Column | None = None) -> DataFrame:
    """Concat-and-chunk sequence packing stats: concatenating all docs'
    word tokens in id order and cutting every ``seq_len`` tokens, which
    fixed-length training sequences does each doc land in?

    Returns (doc_id, n_tokens, first_seq, n_seqs): first_seq =
    floor(prefix_tokens / seq_len); n_seqs = number of sequences the
    doc spans (0 for empty docs). Two-level distributed prefix sum —
    see the module docstring; no global single-partition window.

    ``token_expr`` overrides the default whitespace-word count with any
    per-doc token-count Column — e.g. ``bpe.bpe_count_expr(text_col)``
    to pack by ACTUAL subword-tokenizer counts (real pipelines pack by
    the training tokenizer, not by words)."""
    toks = (
        token_expr.cast("long")
        if token_expr is not None
        else F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
            )
        ).cast("long")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
        F.expr(f"{id_col} div {int(bucket_width)}").alias("_bkt"),
    )
    # level 1: per-bucket totals (map-side combine), prefix over the
    # small bucket table. The bucket table is ~N/bucket_width rows —
    # pick bucket_width ~ sqrt(N) so this window's sort stays tiny.
    bsums = base.groupBy("_bkt").agg(F.sum("n_tokens").alias("_bsum"))
    woff = (
        Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bsums.withColumn(
        "_boff", F.coalesce(F.sum("_bsum").over(woff), F.lit(0))
    ).select("_bkt", "_boff")
    # level 2: within-bucket ordered cumsum (partitioned window — scales)
    win = (
        Window.partitionBy("_bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        base.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_prefix",
            F.col("_boff") + F.coalesce(F.sum("n_tokens").over(win), F.lit(0)),
        )
    )
    first_seq = F.floor(F.col("_prefix") / F.lit(int(seq_len)))
    last_seq = F.floor(
        (F.col("_prefix") + F.col("n_tokens") - 1) / F.lit(int(seq_len))
    )
    n_seqs = F.when(F.col("n_tokens") > 0, last_seq - first_seq + 1).otherwise(
        F.lit(0)
    )
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        first_seq.cast("long").alias("first_seq"),
        n_seqs.cast("int").alias("n_seqs"),
    )


# --- DuckDB oracle SQL (same arithmetic, dialect: DuckDB) -------------------


def split_counts_sql(fractions: dict[str, float], seed: int = 0) -> str:
    names = list(fractions)
    u = hash_unit_sql("doc_id", seed)
    acc = 0.0
    whens = []
    for name in names[:-1]:
        acc += float(fractions[name])
        whens.append(f"WHEN {u} < {acc} THEN '{name}'")
    case = f"CASE {' '.join(whens)} ELSE '{names[-1]}' END"
    return (
        f"SELECT {case} AS split, CAST(count(*) AS BIGINT) AS n "
        f"FROM documents GROUP BY split ORDER BY split"
    )


def source_mix_sql(weights: dict[str, float], seed: int = 0) -> str:
    u = hash_unit_sql("doc_id", seed)
    whens = " ".join(
        f"WHEN source = '{s}' THEN {float(w)}" for s, w in sorted(weights.items())
    )
    return (
        f"SELECT doc_id FROM documents "
        f"WHERE {u} < (CASE {whens} ELSE 0.0 END) ORDER BY doc_id"
    )


def pack_concat_sql(seq_len: int) -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{WORD_RE}'))::BIGINT AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM t)
SELECT doc_id, n_tokens::INT AS n_tokens,
       (prefix // {seq_len})::BIGINT AS first_seq,
       (CASE WHEN n_tokens > 0
             THEN (prefix + n_tokens - 1) // {seq_len} - prefix // {seq_len} + 1
             ELSE 0 END)::INT AS n_seqs
FROM c ORDER BY doc_id"""
