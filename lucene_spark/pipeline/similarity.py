"""Similarity search over an embedding column (`array<float>`).

Two paths:
- `cosine_topk`  — exact brute-force top-k, pure built-in higher-order
  functions (zip_with + aggregate, JVM-side, whole-stage codegen). The
  correctness baseline; one scan, TakeOrderedAndProject top-k, no shuffle.
- `lsh_buckets` / `ann_topk` — random-hyperplane LSH: 100 TB path. Each
  vector gets an nbits signature (one Arrow batch matmul); queries probe
  buckets within Hamming radius `probe` of their own signature, so the
  exact rerank touches only candidate buckets. Recall vs brute force is
  asserted in tests (no oracle — the plan is approximate by design).

- `ivf_*` — IVF coarse quantizer (FAISS IVF-flat shape; the analog of
  the reference's graph/cluster-based dense-vector formats): vectors
  are assigned to their nearest centroid cell, the cell table persists
  `partitionBy(cell)`, queries probe only the `nprobe` nearest cells and
  rerank exactly. Centroids are either deterministic seeded Gaussians
  (oracle-checkable: literals inline into SQL like the LSH hyperplanes)
  or Lloyd-trained via `ivf_train` (distributed partial-sum iterations;
  recall asserted in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int, id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine similarity to `query_vec` (double precision,
    rounded 4dp; ties broken by id asc). Built-in expressions only."""
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    qnorm = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    cos = _dot(F.col("embedding"), qlit) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))) * F.lit(qnorm)
    )
    return (
        emb.select(F.col(id_col), F.round(cos, 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_self_sql(query_id: int, k: int, id_col: str = "vec_id") -> str:
    """DuckDB oracle where the query vector is the embedding of row
    `query_id` — keeps the SQL static across scale factors."""
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE {id_col} = {query_id}),
s AS (
  SELECT {id_col},
         list_sum(list_transform(list_zip(embedding, qv),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(qv,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
  FROM embeddings, q)
SELECT {id_col}, round(cos, 4) AS cos FROM s
ORDER BY round(cos, 4) DESC, {id_col} LIMIT {k}"""


def knn_join_self_sql(n_queries: int, k: int) -> str:
    """DuckDB oracle for knn_join with queries = first n_queries vectors."""
    return f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM n WHERE vec_id < {n_queries}),
c AS (
  SELECT q.qid, n.vec_id,
         round(list_sum(list_transform(list_zip(n.embedding, q.qe),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * q.qn), 4) AS cos
  FROM n CROSS JOIN q),
r AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
  FROM c)
SELECT qid, vec_id, cos, rank::INT AS rank FROM r WHERE rank <= {k}
ORDER BY qid, rank"""


def cosine_topk_sql(query_vec: list[float], k: int, id_col: str = "vec_id") -> str:
    """DuckDB oracle for cosine_topk: same double arithmetic + rounding."""
    qnorm = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    qlist = ", ".join(repr(float(v)) for v in query_vec)
    return f"""
WITH q(qv) AS (SELECT [{qlist}]),
s AS (
  SELECT {id_col},
         list_sum(list_transform(list_zip(embedding, qv),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * {qnorm!r}) AS cos
  FROM embeddings, q)
SELECT {id_col}, round(cos, 4) AS cos FROM s
ORDER BY round(cos, 4) DESC, {id_col} LIMIT {k}"""


# ---------------------------------------------------------------------------
# random-hyperplane LSH (scale path)
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, nbits: int, seed: int = 11) -> np.ndarray:
    """Deterministic (nbits, dim) Gaussian hyperplanes."""
    return np.random.default_rng(seed).standard_normal((nbits, dim))


def lsh_buckets(
    emb: DataFrame, nbits: int = 16, seed: int = 11, id_col: str = "vec_id"
) -> DataFrame:
    """(id, bucket) sign-bit signatures — one vectorized matmul per Arrow
    batch. At 100 TB the bucketed table is written partitioned by bucket
    so a probe reads only its candidate partitions."""
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("bucket", T.LongType())]
    )
    # capture dim lazily from the first batch; hyperplanes are seed-deterministic
    def fn(iterator):
        R = None
        weights = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            M = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            if R is None:
                R = hyperplanes(M.shape[1], nbits, seed)
            bits = (M @ R.T) > 0
            buckets = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "bucket": buckets.astype(np.int64)}
            )

    return emb.select(F.col(id_col), "embedding").mapInPandas(fn, schema=schema)


def _probe_buckets(bucket: int, nbits: int, probe_hamming: int) -> list[int]:
    """Buckets within Hamming distance <= probe_hamming (0, 1, or 2)."""
    out = {bucket}
    if probe_hamming >= 1:
        for i in range(nbits):
            out.add(bucket ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(nbits):
            for j in range(i + 1, nbits):
                out.add(bucket ^ (1 << i) ^ (1 << j))
    return sorted(out)


def _table_seed(seed: int, t: int) -> int:
    return seed + 1000 * t


def lsh_buckets_multi(
    emb: DataFrame,
    nbits: int = 8,
    seed: int = 11,
    n_tables: int = 4,
    id_col: str = "vec_id",
    with_embedding: bool = True,
) -> DataFrame:
    """(table, bucket, id[, embedding]) signatures for ALL tables in ONE
    scan: each Arrow batch does one (batch x dim) @ (dim x nbits) matmul
    per table against in-memory hyperplanes — the corpus is read once,
    not once per table. `with_embedding=True` carries the vector along so
    a probe of the persisted table needs no join back to the corpus."""
    fields = [
        T.StructField("table", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("id", T.LongType()),
    ]
    if with_embedding:
        fields.append(T.StructField("embedding", emb.schema["embedding"].dataType))
    schema = T.StructType(fields)

    def fn(iterator):
        Rs = None
        weights = np.uint64(1) << np.arange(nbits, dtype=np.uint64)
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            M = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            if Rs is None:
                Rs = [
                    hyperplanes(M.shape[1], nbits, _table_seed(seed, t))
                    for t in range(n_tables)
                ]
            for t, R in enumerate(Rs):
                bits = (M @ R.T) > 0
                buckets = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
                out = {
                    "table": np.full(len(pdf), t, dtype=np.int32),
                    "bucket": buckets.astype(np.int64),
                    "id": pdf[id_col].to_numpy(),
                }
                if with_embedding:
                    out["embedding"] = pdf["embedding"]
                yield pd.DataFrame(out)

    return emb.select(F.col(id_col), "embedding").mapInPandas(fn, schema=schema)


def build_ann_index(
    emb: DataFrame,
    out_dir: str,
    *,
    nbits: int = 8,
    seed: int = 11,
    n_tables: int = 4,
    id_col: str = "vec_id",
) -> str:
    """Materialize the multi-table LSH bucket table ONCE, written
    `partitionBy(table, bucket)` so every probe is a partition-pruned
    read of just its candidate buckets (n_tables * (1 + nbits) dirs for
    probe_hamming=1 out of n_tables * 2^nbits total). Keep nbits <= ~12
    for a dynamic-partition write; beyond that, bucket-transform table
    formats (Iceberg) carry the same pruning without the directory fanout.
    Embeddings are stored in-row (n_tables x duplication — the standard
    LSH table trade) so the rerank never joins back to the corpus."""
    lsh_buckets_multi(
        emb, nbits, seed, n_tables, id_col, with_embedding=True
    ).write.mode("overwrite").partitionBy("table", "bucket").parquet(out_dir)
    return out_dir


def _query_probe_pairs(
    query_vec: list[float],
    nbits: int,
    seed: int,
    probe_hamming: int,
    n_tables: int,
) -> list[tuple[int, int]]:
    """(table, bucket) partitions a query must read."""
    q = np.asarray(query_vec, dtype=np.float64)
    pairs = []
    for t in range(n_tables):
        R = hyperplanes(len(q), nbits, _table_seed(seed, t))
        qbits = (R @ q) > 0
        qbucket = int(
            (qbits.astype(np.uint64) << np.arange(nbits, dtype=np.uint64)).sum()
        )
        pairs.extend((t, b) for b in _probe_buckets(qbucket, nbits, probe_hamming))
    return pairs


def ann_topk(
    emb: DataFrame | None,
    query_vec: list[float],
    k: int,
    nbits: int = 16,
    seed: int = 11,
    probe_hamming: int = 1,
    n_tables: int = 4,
    id_col: str = "vec_id",
    index: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: multi-table LSH probe + exact cosine rerank.

    `n_tables` independent hyperplane sets; a vector is a candidate if
    ANY table buckets it within Hamming `probe_hamming` of the query's
    bucket. Two probe paths:
    - `index` (a DataFrame over a `build_ann_index` directory): filter on
      literal (table, bucket) pairs — partition-pruned read, the 100 TB
      path; only candidate partitions are touched.
    - `emb` fallback: signatures for all tables computed in ONE scan
      (lsh_buckets_multi), filtered to the probe pairs.
    Candidates dedup by id, then exact cosine rerank over candidates only."""
    pairs = _query_probe_pairs(query_vec, nbits, seed, probe_hamming, n_tables)
    src = (
        index
        if index is not None
        else lsh_buckets_multi(emb, nbits, seed, n_tables, id_col, with_embedding=True)
    )
    cond = None
    for t, b in pairs:
        clause = (F.col("table") == t) & (F.col("bucket") == b)
        cond = clause if cond is None else cond | clause
    cands = (
        src.filter(cond)
        .select(F.col("id").alias(id_col), "embedding")
        .dropDuplicates([id_col])
    )
    return cosine_topk(cands, query_vec, k, id_col)


def ann_lsh_self_sql(
    query_id: int,
    k: int,
    *,
    nbits: int = 8,
    seed: int = 11,
    probe_hamming: int = 1,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
) -> str:
    """Deterministic DuckDB oracle for ann_topk with the query vector =
    embedding of `query_id`: the seeded Gaussian hyperplanes are inlined
    as literals, buckets recomputed in SQL, candidates = rows whose
    bucket is within `probe_hamming` of the query row's bucket in ANY
    table, then the exact cosine rerank. Bit-for-bit the same candidate
    set as the Spark plan (same float64 dot products, same strict >0)."""
    def dotlit(r: np.ndarray) -> str:
        lits = ", ".join(repr(float(x)) for x in r)
        return (
            "list_sum(list_transform(list_zip(v, ["
            + lits
            + "]), p -> p[1] * p[2]))"
        )

    bucket_exprs = []
    for t in range(n_tables):
        R = hyperplanes(dim, nbits, _table_seed(seed, t))
        bits = " + ".join(
            f"(CASE WHEN {dotlit(R[b])} > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(nbits)
        )
        bucket_exprs.append(f"({bits}) AS b{t}")
    ham_any = " OR ".join(
        f"bit_count(xor(bt.b{t}::UBIGINT, qb.b{t}::UBIGINT)) <= {probe_hamming}"
        for t in range(n_tables)
    )
    return f"""
WITH e AS (
  SELECT {id_col}, embedding,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
bt AS (SELECT {id_col}, {', '.join(bucket_exprs)} FROM e),
qb AS (SELECT * FROM bt WHERE {id_col} = {query_id}),
cand AS (SELECT bt.{id_col} FROM bt, qb WHERE {ham_any}),
q AS (SELECT embedding AS qv FROM embeddings WHERE {id_col} = {query_id}),
s AS (
  SELECT e.{id_col},
         list_sum(list_transform(list_zip(e.embedding, qv),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(qv,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
  FROM e JOIN cand USING ({id_col}), q)
SELECT {id_col}, round(cos, 4) AS cos FROM s
ORDER BY round(cos, 4) DESC, {id_col} LIMIT {k}"""


# ---------------------------------------------------------------------------
# IVF coarse quantizer (scale path #2 — cell-partitioned, nprobe reads)
# ---------------------------------------------------------------------------


def ivf_centroids_random(dim: int, n_cells: int, seed: int = 17) -> np.ndarray:
    """Deterministic seeded Gaussian centroids (n_cells, dim) — the
    oracle-checkable quantizer (no training state; same role as the
    seeded LSH hyperplanes)."""
    return np.random.default_rng(seed).standard_normal((n_cells, dim))


def _assign_cells(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Row-wise argmin of squared L2 distance; ties -> lowest cell id
    (np.argmin), matching the oracle's (distance, cell) ordering."""
    d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d, axis=1)


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    with_embedding: bool = True,
) -> DataFrame:
    """(cell, id[, embedding]) assignments — one vectorized distance
    matmul per Arrow batch against the broadcast centroid array."""
    fields = [
        T.StructField("cell", T.IntegerType()),
        T.StructField("id", T.LongType()),
    ]
    if with_embedding:
        fields.append(T.StructField("embedding", emb.schema["embedding"].dataType))
    schema = T.StructType(fields)
    C = np.asarray(centroids, dtype=np.float64)

    def fn(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            M = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            cells = _assign_cells(M, C)
            out = {"cell": cells.astype(np.int32), "id": pdf[id_col].to_numpy()}
            if with_embedding:
                out["embedding"] = pdf["embedding"]
            yield pd.DataFrame(out)

    return emb.select(F.col(id_col), "embedding").mapInPandas(fn, schema=schema)


def ivf_train(
    emb: DataFrame,
    n_cells: int,
    n_iters: int = 5,
    seed: int = 17,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Distributed Lloyd's k-means. Init = seeded Gaussian; each
    iteration is ONE job: per-partition (cell, sum_vec, count) partial
    aggregates (numpy, Arrow-batched), combined driver-side — the
    collected state is n_cells x dim floats, never vector rows. Empty
    cells keep their previous centroid (FAISS behavior)."""
    first = emb.select("embedding").first()
    dim = len(first["embedding"])
    C = ivf_centroids_random(dim, n_cells, seed)
    schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("sum_vec", T.ArrayType(T.DoubleType())),
            T.StructField("cnt", T.LongType()),
        ]
    )
    for _ in range(n_iters):
        Cb = C.copy()

        def fn(iterator, Cb=Cb):
            sums = np.zeros((len(Cb), Cb.shape[1]))
            cnts = np.zeros(len(Cb), dtype=np.int64)
            for pdf in iterator:
                if len(pdf) == 0:
                    continue
                M = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
                )
                cells = _assign_cells(M, Cb)
                np.add.at(sums, cells, M)
                np.add.at(cnts, cells, 1)
            nz = np.nonzero(cnts)[0]
            if len(nz):
                yield pd.DataFrame(
                    {
                        "cell": nz.astype(np.int32),
                        "sum_vec": [sums[i].tolist() for i in nz],
                        "cnt": cnts[nz],
                    }
                )

        parts = (
            emb.select("embedding")
            .mapInPandas(fn, schema=schema)
            .groupBy("cell")
            .agg(
                F.aggregate(
                    F.collect_list("sum_vec"),
                    F.array_repeat(F.lit(0.0), dim),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("sum_vec"),
                F.sum("cnt").alias("cnt"),
            )
            .collect()
        )
        C = C.copy()
        for r in parts:
            C[r["cell"]] = np.asarray(r["sum_vec"]) / r["cnt"]
    return C


def build_ivf_index(
    emb: DataFrame,
    out_dir: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
) -> str:
    """Materialize the cell table `partitionBy(cell)` — a probe reads
    only its nprobe candidate partitions (same pruning contract as
    build_ann_index's (table, bucket) layout)."""
    ivf_assign(emb, centroids, id_col, with_embedding=True).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(out_dir)
    return out_dir


def ivf_topk(
    emb: DataFrame | None,
    query_vec: list[float],
    k: int,
    centroids: np.ndarray,
    nprobe: int = 2,
    id_col: str = "vec_id",
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF probe: the query's `nprobe` nearest cells (driver-side argsort
    over n_cells distances — tiny), candidate rows filtered by literal
    cell ids (partition-pruned on a build_ivf_index layout), exact
    cosine rerank over candidates only."""
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((C - q[None, :]) ** 2).sum(axis=1)
    cells = [int(c) for c in np.argsort(d, kind="stable")[:nprobe]]
    src = index if index is not None else ivf_assign(emb, C, id_col)
    cands = (
        src.filter(F.col("cell").isin(cells))
        .select(F.col("id").alias(id_col), "embedding")
    )
    return cosine_topk(cands, query_vec, k, id_col)


def ivf_self_sql(
    query_id: int,
    k: int,
    *,
    n_cells: int = 8,
    nprobe: int = 2,
    seed: int = 17,
    dim: int = 64,
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle for ivf_topk with seeded centroids (inlined as
    literals) and query vector = embedding of `query_id`. Cell
    assignment = argmin squared-L2 with ties to the lowest cell id
    (QUALIFY over (d, cell)); the query's nprobe cells computed the
    same way; exact cosine rerank over the probed cells."""
    C = ivf_centroids_random(dim, n_cells, seed)

    def dist(c: np.ndarray) -> str:
        lits = ", ".join(repr(float(x)) for x in c)
        return (
            "list_sum(list_transform(list_zip(v, ["
            + lits
            + "]), p -> (p[1] - p[2]) * (p[1] - p[2])))"
        )

    cell_list = ", ".join(str(i) for i in range(n_cells))
    dist_list = ", ".join(dist(C[i]) for i in range(n_cells))
    return f"""
WITH e AS (
  SELECT {id_col}, embedding,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
rowcells AS (
  SELECT {id_col}, c AS cell FROM (
    SELECT {id_col}, unnest([{cell_list}]) AS c, unnest([{dist_list}]) AS d
    FROM e)
  QUALIFY row_number() OVER (PARTITION BY {id_col} ORDER BY d, c) = 1),
qcells AS (
  SELECT c FROM (
    SELECT unnest([{cell_list}]) AS c, unnest([{dist_list}]) AS d
    FROM e WHERE {id_col} = {query_id})
  ORDER BY d, c LIMIT {nprobe}),
cand AS (
  SELECT {id_col} FROM rowcells WHERE cell IN (SELECT c FROM qcells)),
q AS (SELECT embedding AS qv FROM embeddings WHERE {id_col} = {query_id}),
s AS (
  SELECT e.{id_col},
         list_sum(list_transform(list_zip(e.embedding, qv),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(qv,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
  FROM e JOIN cand USING ({id_col}), q)
SELECT {id_col}, round(cos, 4) AS cos FROM s
ORDER BY round(cos, 4) DESC, {id_col} LIMIT {k}"""


def knn_join(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    qid_col: str = "qid",
) -> DataFrame:
    """Batch k-NN: for every query row (qid, embedding), the exact top-k
    corpus neighbors by cosine. Broadcast the (small) query side; rank
    with a window — the standard blocked brute-force kNN join shape.

    SIZE BOUND: ``crossJoin(broadcast(queries))`` is a broadcast
    nested-loop by construction — correct and cheap while the query
    batch fits a broadcast (rule of thumb: <= ~10^4 queries x dim
    floats; executor work is |corpus| * |queries| dots). For large
    query sets use the bucketed paths instead (ann_topk / ivf_topk per
    query, or pre-bucket both sides) — do NOT feed 10^6 queries here.

    Output: (qid, vec_id, cos, rank)."""
    from pyspark.sql import Window as W

    a = emb.select(
        F.col(id_col),
        F.col("embedding").alias("e"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("na"),
    )
    b = queries.select(
        F.col(qid_col),
        F.col("embedding").alias("qe"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nb"),
    )
    cos = _dot(F.col("e"), F.col("qe")) / (F.col("na") * F.col("nb"))
    w = W.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        a.crossJoin(F.broadcast(b))
        .withColumn("cos", F.round(cos, 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cos", "rank")
    )
