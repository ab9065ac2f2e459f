"""Per-segment HNSW graph ANN over an embedding column.

The reference's flagship dense-vector feature is a single-layer
navigable-small-world graph (util/hnsw/HnswGraphBuilder.java:32,
HnswGraph.java:95 — `numSeed` random entry points instead of a
hierarchy, a diversity heuristic when linking), built PER SEGMENT and
searched segment-by-segment with a global TopDocs merge
(Lucene90VectorWriter / KnnGraphValues).

That per-segment shape is exactly what maps onto Spark:

- **Build** — vectors are hash-assigned to `n_segments` segments;
  one `applyInPandas` group per segment builds its graph independently
  (numpy, no cross-segment traffic). At 100 TB this is embarrassingly
  parallel: segments build concurrently across executors, and segment
  size (`rows // n_segments`) is the only memory knob — size it so one
  segment's vectors + adjacency fit an executor (e.g. 1M × 768-d f32
  ≈ 3 GB). The graph persists as plain parquet rows
  `(segment, ord, vec_id, embedding, neighbors)` partitioned by
  segment — no custom binary format, any reader can audit it.
- **Search** — `mapInPandas` over the index runs the reference's
  greedy beam search inside each segment (entry points from a
  per-segment seeded RNG, bounded best-first expansion,
  HnswGraph.java:95-160) and emits each segment's top-k; the global
  top-k is a built-in TakeOrderedAndProject — the TopDocs.merge
  analog. Query cost is O(n_segments × beam) graph hops, independent
  of total row count, which is the whole point vs brute force.

Similarity is cosine via unit-normalized dot product (the reference's
DOT_PRODUCT strategy over normalized vectors,
VectorValues.SearchStrategy). Scores returned are true cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return M / n


def _diverse_select(cand_ords: np.ndarray, cand_scores: np.ndarray,
                    V: np.ndarray, qv: np.ndarray, max_conn: int):
    """HnswGraphBuilder.java:193-205 — walk candidates best-first and
    keep one only if it is closer to the new node than to every
    already-selected neighbor (diversityCheck, :226-240)."""
    order = np.argsort(-cand_scores, kind="stable")
    sel: list[int] = []
    for j in order:
        c = int(cand_ords[j])
        cs = float(cand_scores[j])
        if all(float(V[c] @ V[s]) <= cs for s in sel):
            sel.append(c)
            if len(sel) >= max_conn:
                break
    return sel


def _search_graph(V: np.ndarray, graph: list[list[int]], qv: np.ndarray,
                  topk: int, num_seed: int, rng: np.random.RandomState):
    """HnswGraph.search (HnswGraph.java:95-160): seed the result queue
    with `num_seed` random entry points, then best-first expand
    neighbors, bounding by the current worst retained score."""
    size = len(graph)
    if size == 0:
        return [], []
    seeds = rng.randint(0, size, size=min(num_seed, 2 * size))
    visited = set()
    # results: min-heap semantics via sorted insert on small k — keep
    # a python list of (score, ord), capped at num_seed like the
    # reference's NeighborQueue(numSeed).
    results: list[tuple[float, int]] = []
    candidates: list[tuple[float, int]] = []
    import heapq

    for e in seeds:
        e = int(e)
        if e in visited:
            continue
        visited.add(e)
        s = float(V[e] @ qv)
        heapq.heappush(results, (s, e))
        if len(results) > num_seed:
            heapq.heappop(results)
        heapq.heappush(candidates, (-s, e))
    bound = results[0][0] if len(results) >= num_seed else -np.inf
    while candidates:
        negs, c = heapq.heappop(candidates)
        if -negs < bound and len(results) >= num_seed:
            break
        for nb in graph[c]:
            if nb in visited:
                continue
            visited.add(nb)
            s = float(V[nb] @ qv)
            if len(results) >= num_seed and s <= bound:
                continue
            heapq.heappush(results, (s, nb))
            if len(results) > num_seed:
                heapq.heappop(results)
            bound = results[0][0] if len(results) >= num_seed else -np.inf
            heapq.heappush(candidates, (-s, nb))
    top = sorted(results, key=lambda t: (-t[0], t[1]))[:topk]
    return [o for _, o in top], [s for s, _ in top]


def _build_graph(V: np.ndarray, max_conn: int, beam_width: int,
                 seed: int) -> list[list[int]]:
    """HnswGraphBuilder.build/addGraphNode (HnswGraphBuilder.java:120-205):
    insert nodes in order; each new node beam-searches the graph built
    so far, links to a diverse subset of the beam, and back-links —
    trimming any neighbor list that overflows max_conn with the same
    diversity rule (diversityUpdate, :210-224)."""
    rng = np.random.RandomState(seed)
    n = V.shape[0]
    graph: list[list[int]] = [[] for _ in range(n)]
    for node in range(1, n):
        qv = V[node]
        ords, scores = _search_graph(
            V[:node], [graph[i] for i in range(node)], qv,
            topk=beam_width, num_seed=beam_width, rng=rng,
        )
        sel = _diverse_select(
            np.asarray(ords, dtype=np.int64),
            np.asarray(scores, dtype=np.float64), V, qv, max_conn,
        )
        graph[node] = list(sel)
        for s in sel:
            graph[s].append(node)
            if len(graph[s]) > max_conn:
                arr = np.asarray(graph[s], dtype=np.int64)
                sc = V[arr] @ V[s]
                graph[s] = _diverse_select(arr, sc, V, V[s], max_conn)
    return graph


_INDEX_SCHEMA = T.StructType([
    T.StructField("segment", T.IntegerType(), False),
    T.StructField("ord", T.IntegerType(), False),
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    T.StructField("neighbors", T.ArrayType(T.IntegerType()), False),
])


def build_hnsw_index(emb: DataFrame, out_dir: str, n_segments: int = 4,
                     max_conn: int = 16, beam_width: int = 32,
                     seed: int = 7, id_col: str = "vec_id") -> None:
    """Build per-segment graphs and persist them partitioned by segment.

    Each applyInPandas group is ONE segment: the build is a single
    shuffle (hash by id → segment) followed by independent per-segment
    numpy work — the Spark analog of concurrent per-segment
    HnswGraphBuilder runs under IndexWriter."""

    def fn(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seg = int(pdf["segment"].iloc[0])
        M = np.asarray(pdf["embedding"].tolist(), dtype=np.float32)
        V = _normalize(M.astype(np.float64))
        graph = _build_graph(V, max_conn, beam_width, seed ^ (seg * 0x9E37))
        return pd.DataFrame({
            "segment": seg,
            "ord": np.arange(len(pdf), dtype=np.int32),
            "vec_id": pdf[id_col].astype("int64"),
            "embedding": pdf["embedding"],
            "neighbors": [np.asarray(g, dtype=np.int32) for g in graph],
        })

    staged = (
        emb.select(
            F.col(id_col).alias("vec_id"), "embedding",
            F.pmod(F.hash(F.col(id_col)), F.lit(n_segments))
            .cast("int").alias("segment"),
        )
        .groupBy("segment").applyInPandas(fn, _INDEX_SCHEMA)
    )
    staged.write.mode("overwrite").partitionBy("segment").parquet(out_dir)


def hnsw_topk(query_vec, k: int, index: DataFrame, num_seed: int = 64,
              seed: int = 7) -> DataFrame:
    """Search every segment's graph, merge with a global top-k.

    One mapInPandas pass over the (segment-partitioned) index — each
    Arrow batch group belongs to one segment because the parquet is
    partitioned by segment and batches don't span files; we still
    group defensively by the segment column inside the UDF. The final
    orderBy(..).limit(k) is TakeOrderedAndProject — the
    TopDocs.merge analog, no full sort."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    qv = q / (qn if qn else 1.0)

    out_schema = T.StructType([
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), False),
    ])

    def fn(batches):
        for pdf in batches:
            for seg, g in pdf.groupby("segment"):
                g = g.sort_values("ord").reset_index(drop=True)
                M = np.asarray(g["embedding"].tolist(), dtype=np.float32)
                V = _normalize(M.astype(np.float64))
                graph = [list(nb) for nb in g["neighbors"]]
                rng = np.random.RandomState(seed ^ (int(seg) * 0x9E37))
                ords, scores = _search_graph(
                    V, graph, qv, topk=k, num_seed=num_seed, rng=rng)
                if ords:
                    yield pd.DataFrame({
                        "vec_id": g["vec_id"].iloc[ords].astype("int64"),
                        "cos": np.asarray(scores, dtype=np.float64),
                    })

    res = index.select("segment", "ord", "vec_id", "embedding",
                       "neighbors").mapInPandas(fn, out_schema)
    return (
        res.select("vec_id", F.round("cos", 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    )
