"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB:
- exact dedup        — one hash-shuffle on sha256(text) (map-side partial agg).
- shingle/minhash    — per-doc signatures computed in one Arrow batch pass
                       (no shuffle), then candidate generation is a
                       groupBy on (band, signature) — only near-dup docs
                       ever meet in the shuffle, never all pairs.
- verification       — exact Jaccard on candidate pairs only (semi-joined
                       shingle sets), the classic LSH verify step.
- simhash            — per-doc 31-bit signature, pairs by Hamming<=d.
- embedding          — exact cosine pairs for the oracle; random-hyperplane
                       LSH buckets as the scale path (similarity.py).

Hash contract (cross-engine stable, so every operator has a DuckDB
oracle): base = md5_number_lower(s) mod (2^31-1), i.e. the low 8 md5
digest bytes little-endian — identical in Python hashlib, DuckDB
md5_number_lower, and nothing exceeds 2^62 in the (a*h+b) mod p
permutations, so plain 64-bit arithmetic agrees everywhere. At
production scale you would swap xxhash64 (JVM built-in) via hash_fn.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.pipeline.textstats import WORD_RE

P31 = (1 << 31) - 1  # Mersenne prime 2^31-1
SHINGLE_N = 3
SIMHASH_BITS = 31


def perm_seeds(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash permutations,
    derived from md5 so the oracle SQL can inline them as literals."""
    out = []
    for i in range(k):
        d = hashlib.md5(f"minhash:{seed}:{i}".encode()).digest()
        a = (int.from_bytes(d[:8], "little") % (P31 - 1)) + 1
        b = int.from_bytes(d[8:16], "little") % P31
        out.append((a, b))
    return out


def _md5_low64(strings: list[str]) -> np.ndarray:
    """md5 low-8-bytes little-endian (DuckDB md5_number_lower analog)."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little") for s in strings),
        dtype=np.uint64,
        count=len(strings),
    )


def _doc_shingle_hashes(text: str) -> np.ndarray:
    """Distinct SHINGLE_N-gram token shingles -> base hashes mod P31."""
    toks = WORD_RE_COMPILED.findall(text.lower())
    if len(toks) < SHINGLE_N:
        return np.zeros(0, np.uint64)
    shingles = {
        " ".join(toks[i : i + SHINGLE_N]) for i in range(len(toks) - SHINGLE_N + 1)
    }
    return _md5_low64(sorted(shingles)) % np.uint64(P31)


WORD_RE_COMPILED = re.compile(WORD_RE)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(dup_doc_id, keeper_doc_id) pairs: docs whose sha256(text) collides
    with an earlier (min doc_id) doc. One hash shuffle; partial agg
    map-side. The keeper itself is not emitted."""
    h = df.select(F.col("doc_id"), F.sha2(F.col(text_col), 256).alias("h"))
    keepers = h.groupBy("h").agg(F.min("doc_id").alias("keeper_doc_id"))
    return (
        h.join(keepers, "h")
        .filter(F.col("doc_id") != F.col("keeper_doc_id"))
        .select(F.col("doc_id").alias("dup_doc_id"), "keeper_doc_id")
    )


# ---------------------------------------------------------------------------
# shingles + exact n-gram Jaccard
# ---------------------------------------------------------------------------

_SHINGLE_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("sh", T.LongType())]
)


def shingle_hashes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sh) distinct shingle hashes per doc — Arrow batch UDF."""

    def fn(iterator):
        for pdf in iterator:
            ids, hs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                h = _doc_shingle_hashes(text or "")
                ids.append(np.full(len(h), doc_id, dtype=np.int64))
                hs.append(h.astype(np.int64))
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "sh": np.concatenate(hs)}
                )

    return df.select("doc_id", text_col).mapInPandas(fn, schema=_SHINGLE_SCHEMA)


#: Default document-frequency cap for jaccard_pairs' co-occurrence
#: candidate generator. The generator self-joins shingle postings, so a
#: hot shingle with df=f contributes f^2/2 candidate rows — at 100 TB a
#: df=10^6 code trigram alone would emit 5*10^11 rows. Capping candidate
#: generation at df<=1000 bounds any one shingle to <=5*10^5 rows while
#: verification still computes exact Jaccard on FULL shingle sets; a
#: pair is missed only if it shares exclusively ultra-hot shingles
#: (which near-dups at tau>=0.3 essentially never do). Pass
#: max_shingle_df=None explicitly to get the uncapped exact generator.
DEFAULT_MAX_SHINGLE_DF = 1000


def jaccard_pairs(
    shingles: DataFrame,
    tau: float,
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact shingle-Jaccard >= tau pairs (doc_a < doc_b, jac rounded 4dp).

    Candidates-FIRST shape (the LSH verify contract): candidate pairs are
    either supplied (`candidates`, e.g. from minhash_candidates) or
    generated from co-occurring shingles; verification then joins the
    candidate pairs to per-doc sorted shingle-set arrays and computes the
    intersection with JVM `array_intersect` — work is O(|candidates| *
    avg set size), never the f^2 blow-up of a raw shingle self-join on a
    hot shingle (a common code trigram with df=10^6 would alone produce
    5*10^11 join rows at 100 TB).

    `max_shingle_df`: df cap for the co-occurrence candidate generator
    (default DEFAULT_MAX_SHINGLE_DF=1000) — shingles appearing in more
    than this many docs are ignored FOR CANDIDATE GENERATION ONLY
    (jaccard is still computed on full sets). The standard near-dup
    trade: a pair sharing exclusively ultra-common shingles is missed,
    everything else is exact. Pass None to force the uncapped quadratic
    generator (exact, but unsafe at scale)."""
    doc_sets = shingles.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("sh")).alias("shs"),
        F.count(F.lit(1)).alias("sz"),
    )
    if candidates is None:
        gen = shingles
        if max_shingle_df is not None:
            dfc = shingles.groupBy("sh").agg(F.count(F.lit(1)).alias("shdf"))
            gen = shingles.join(
                dfc.filter(F.col("shdf") <= max_shingle_df).select("sh"), "sh", "left_semi"
            )
        a = gen.alias("a")
        b = gen.alias("b")
        candidates = (
            a.join(
                b,
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
    sa = doc_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"), F.col("sz").alias("sza")
    )
    sb = doc_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"), F.col("sz").alias("szb")
    )
    out = (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("shs_a", "shs_b")))
        .withColumn(
            "jac", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
        )
        .filter(F.col("jac") >= tau)
        .select("doc_a", "doc_b", F.round("jac", 4).alias("jac"))
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

_BAND_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("sig", T.StringType()),
    ]
)


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """(doc_id, band, sig): LSH band signatures. num_perm/bands rows per
    doc per band; docs with < SHINGLE_N tokens produce no rows.

    Per Arrow batch: shingle hashes (n,) x seeds (k,2) -> (k,n) permuted
    matrix -> row-min = signature, split into `bands` groups of r =
    num_perm/bands values, each band serialized as 'v1-v2-...-vr'."""
    assert num_perm % bands == 0
    r = num_perm // bands
    seeds = perm_seeds(num_perm, seed)
    A = np.array([a for a, _ in seeds], dtype=np.uint64)[:, None]
    B = np.array([b for _, b in seeds], dtype=np.uint64)[:, None]

    def fn(iterator):
        for pdf in iterator:
            ids, band_ids, sigs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                h = _doc_shingle_hashes(text or "")
                if len(h) == 0:
                    continue
                sig = ((A * h[None, :] + B) % np.uint64(P31)).min(axis=1)
                for bi in range(bands):
                    chunk = sig[bi * r : (bi + 1) * r]
                    ids.append(doc_id)
                    band_ids.append(bi)
                    sigs.append("-".join(str(int(v)) for v in chunk))
            yield pd.DataFrame(
                {
                    "doc_id": np.array(ids, dtype=np.int64),
                    "band": np.array(band_ids, dtype=np.int32),
                    "sig": pd.array(sigs, dtype=object),
                }
            )

    return df.select("doc_id", text_col).mapInPandas(fn, schema=_BAND_SCHEMA)


#: Bucket-membership cap for minhash_candidates: a (band, sig) bucket
#: with n members normally emits n^2/2 pairs — one 10^5-member
#: exact-duplicate flood would alone emit 5*10^9 pairs. Buckets above
#: the cap fall back to STAR pairs around the min-docID representative
#: (O(n) pairs); connectivity for clustering is preserved, and the
#: pathological buckets are near-exact duplicate floods where every
#: member verifies against the representative anyway.
DEFAULT_MAX_BUCKET = 10_000


def minhash_candidates(
    bands_df: DataFrame, max_bucket: int | None = DEFAULT_MAX_BUCKET
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one full band —
    the LSH bucket join. Only bucket-mates meet in the shuffle; buckets
    larger than ``max_bucket`` emit star pairs around their min-docID
    representative instead of all pairs (the side-a pruning happens
    BEFORE the join, so the quadratic rows are never materialized)."""
    a = bands_df.alias("a")
    if max_bucket is not None:
        sizes = bands_df.groupBy("band", "sig").agg(
            F.count(F.lit(1)).alias("bn"), F.min("doc_id").alias("rep")
        )
        a = (
            bands_df.join(sizes, ["band", "sig"])
            .filter(
                (F.col("bn") <= int(max_bucket))
                | (F.col("doc_id") == F.col("rep"))
            )
            .select("doc_id", "band", "sig")
            .alias("a")
        )
    b = bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    tau: float = 0.7,
    num_perm: int = 32,
    bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures -> banded candidates ->
    exact-Jaccard verification >= tau."""
    cands = minhash_candidates(minhash_bands(df, text_col, num_perm, bands, seed))
    return jaccard_pairs(shingle_hashes(df, text_col), tau, candidates=cands)


# ---------------------------------------------------------------------------
# duplicate-cluster resolution: pairs -> connected components -> survivors
# ---------------------------------------------------------------------------


def cluster_duplicates(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a duplicate-pair graph: (doc_id,
    cluster) where cluster = min docID in the component — the step that
    turns pairwise near-dup hits into actual dedup decisions.

    Distributed hash-min label propagation: every node repeatedly takes
    the min label over itself and its neighbors; iterations = graph
    diameter (near-dup clusters are shallow — dozens of hops would mean
    a pathological chain). Each round is ONE shuffle (join + groupBy on
    the symmetric edge list); labels are localCheckpoint()ed per round
    so lineage stays flat, and convergence is detected with a cheap
    changed-count. At 100 TB the edge list is the (already sparse)
    verified-pair output, orders of magnitude smaller than the corpus;
    for adversarial long-chain graphs swap in large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond")."""
    edges = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        sym.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh_min = (
            sym.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("label").alias("nlabel")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nlabel").alias("minn"))
        )
        new = (
            labels.join(neigh_min.withColumnRenamed("src", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("minn", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new.join(labels.withColumnRenamed("label", "old"), "doc_id")
            .filter(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("doc_id", F.col("label").alias("cluster"))


def canonical_survivors(clusters: DataFrame) -> DataFrame:
    """(dup_doc_id, keeper_doc_id): every clustered doc except the
    cluster representative (min docID), ready to anti-join against the
    corpus — the keep-one-per-cluster dedup policy."""
    return clusters.filter(F.col("doc_id") != F.col("cluster")).select(
        F.col("doc_id").alias("dup_doc_id"), F.col("cluster").alias("keeper_doc_id")
    )


def clusters_sql(pairs_sql: str) -> str:
    """DuckDB oracle: exact connected components over the same pair set
    via a recursive reachability CTE, labeled by min reachable docID."""
    return f"""
WITH RECURSIVE p AS ({pairs_sql}),
e AS (SELECT doc_a AS s, doc_b AS d FROM p
      UNION ALL SELECT doc_b, doc_a FROM p),
reach(node, root) AS (
  SELECT DISTINCT s, s FROM e
  UNION
  SELECT e.d, r.root FROM reach r JOIN e ON e.s = r.node
)
SELECT node AS doc_id, min(root) AS cluster FROM reach
GROUP BY node ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
)


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """31-bit SimHash over word tokens weighted by term frequency:
    bit b = 1 iff sum_t tf_t * (2*bit_b(h_t) - 1) > 0."""

    def fn(iterator):
        bits = np.arange(SIMHASH_BITS, dtype=np.uint64)
        for pdf in iterator:
            ids, vals = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = WORD_RE_COMPILED.findall((text or "").lower())
                if not toks:
                    ids.append(doc_id)
                    vals.append(0)
                    continue
                uniq, tf = np.unique(np.array(toks, dtype=object), return_counts=True)
                h = _md5_low64(list(uniq)) % np.uint64(P31)
                bm = ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
                w = (2 * bm - 1) * tf[:, None]
                sums = w.sum(axis=0)
                sh = int(((sums > 0).astype(np.uint64) << bits).sum())
                ids.append(doc_id)
                vals.append(sh)
            yield pd.DataFrame(
                {"doc_id": np.array(ids, np.int64), "simhash": np.array(vals, np.int64)}
            )

    return df.select("doc_id", text_col).mapInPandas(fn, schema=_SIMHASH_SCHEMA)


def _simhash_blocks(nbits: int, nblocks: int) -> list[tuple[int, int]]:
    """(shift, width) for `nblocks` near-equal contiguous bit blocks."""
    base, extra = divmod(nbits, nblocks)
    out, shift = [], 0
    for i in range(nblocks):
        w = base + (1 if i < extra else 0)
        out.append((shift, w))
        shift += w
    return out


def simhash_pairs(sim_df: DataFrame, max_hamming: int) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming distance <= max_hamming.

    Lossless pigeonhole blocking, no cross join at ANY d (HmSearch /
    multi-index Hamming, Manku et al. WWW'07 "Detecting Near-Duplicates
    for Web Crawling" generalized):

    - d <= nblocks-1 with nblocks = ceil((d+1)/2) blocks: if every block
      differed in >= 2 bits the total distance would be >= 2*nblocks >
      d, so some block differs in <= 1 bit. Side A explodes each block
      into its value plus all single-bit flips (w+1 keys per block);
      side B keeps the exact block value; equal (block, key) pairs cover
      exactly the "<=1 bit diff in this block" relation. The join is on
      exact 64-bit keys — shuffle-partitionable, no inequality scan.
    - The exact bit_count Hamming filter afterwards makes the result
      identical to the all-pairs definition (blocking is recall-lossless
      by the pigeonhole bound), so the brute-force oracle still matches.
    """
    ab = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    if max_hamming <= 1:
        # 2 exact blocks: low 16 / high 15 bits (d<=1 => one block equal)
        a = sim_df.alias("a")
        b = sim_df.alias("b")
        ham = F.bit_count(ab)
        lo = lambda c: F.col(c).bitwiseAND(F.lit((1 << 16) - 1))  # noqa: E731
        hi = lambda c: F.shiftright(F.col(c), 16)  # noqa: E731
        blocked = a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & ((lo("a.simhash") == lo("b.simhash")) | (hi("a.simhash") == hi("b.simhash"))),
        )
        return blocked.filter(ham <= max_hamming).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
    nblocks = max(2, -(-(max_hamming + 1) // 2))
    blocks = _simhash_blocks(SIMHASH_BITS, nblocks)

    def block_val(col, shift, width):
        return F.shiftright(col, shift).bitwiseAND(F.lit((1 << width) - 1))

    sh = F.col("simhash")
    # side B: one exact key per block
    b_rows = sim_df.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        block_val(sh, s, w).cast("long").alias("key"),
                    )
                    for i, (s, w) in enumerate(blocks)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key"))
    # side A: exact key + every single-bit flip of the block value
    a_structs = []
    for i, (s, w) in enumerate(blocks):
        v = block_val(sh, s, w).cast("long")
        a_structs.append(F.struct(F.lit(i).alias("blk"), v.alias("key")))
        for bit in range(w):
            a_structs.append(
                F.struct(
                    F.lit(i).alias("blk"),
                    v.bitwiseXOR(F.lit(1 << bit)).alias("key"),
                )
            )
    a_rows = sim_df.select(
        "doc_id", "simhash", F.explode(F.array(*a_structs)).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key"))
    a = a_rows.alias("a")
    b = b_rows.alias("b")
    ham = F.bit_count(ab)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (exact; LSH scale path in similarity.py)
# ---------------------------------------------------------------------------


def embedding_dup_pairs(emb: DataFrame, tau: float, id_col: str = "vec_id") -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine similarity >= tau. Exact
    all-pairs in double precision via built-in higher-order functions
    (JVM-side); the LSH-bucketed variant (similarity.lsh_buckets) bounds
    the join at scale."""
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda x: F.sqrt(dot(x, x))  # noqa: E731
    n = emb.select(
        F.col(id_col).alias("id"),
        F.col("embedding").alias("e"),
        norm(F.col("embedding")).alias("nrm"),
    )
    a, b = n.alias("a"), n.alias("b")
    cos = dot(F.col("a.e"), F.col("b.e")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= tau)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("cos", 4).alias("cos"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_SHINGLES_CTE = f"""
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS t
  FROM documents),
tokidx AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - {SHINGLE_N - 1})) AS i
  FROM toks WHERE len(t) >= {SHINGLE_N}),
shingles AS (
  SELECT DISTINCT doc_id,
         md5_number_lower(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) % {P31} AS sh
  FROM tokidx)
"""


def benchmark_overlap(
    shingles: DataFrame,
    bench_shingles: DataFrame,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the number of
    distinct token n-gram shingles it shares with a benchmark /
    evaluation set, keeping docs with ``n_overlap >= min_overlap``
    (the classic train-set decontamination pass — e.g. the n-gram
    overlap filters used to scrub eval sets out of web-scale training
    corpora).

    Both inputs are (doc_id, sh) from :func:`shingle_hashes` (per-doc
    shingle sets are already distinct, so a plain count after the join
    is the distinct-overlap count).

    100 TB shape: the benchmark side is eval sets — tiny next to the
    corpus — so it is reduced to DISTINCT shingles and broadcast; the
    corpus side sees one hash-join probe + one groupBy(doc_id) partial
    aggregation. No shuffle of the corpus shingles against themselves,
    no pairwise blow-up.

    Output: (doc_id, n_overlap).
    """
    bset = F.broadcast(bench_shingles.select("sh").distinct())
    return (
        shingles.join(bset, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= int(min_overlap))
    )


def benchmark_overlap_sql(bench_max_doc_id: int, min_overlap: int = 1) -> str:
    """DuckDB oracle for :func:`benchmark_overlap` with the benchmark
    defined as documents with doc_id < bench_max_doc_id and the corpus
    as the rest."""
    return f"""
WITH {_SHINGLES_CTE},
bench AS (SELECT DISTINCT sh FROM shingles WHERE doc_id < {bench_max_doc_id}),
corpus AS (SELECT * FROM shingles WHERE doc_id >= {bench_max_doc_id})
SELECT c.doc_id, count(*)::BIGINT AS n_overlap
FROM corpus c JOIN bench b ON c.sh = b.sh
GROUP BY 1 HAVING count(*) >= {min_overlap}
ORDER BY doc_id"""


def exact_duplicates_sql() -> str:
    return """
WITH h AS (SELECT doc_id, sha256(text) AS hh FROM documents),
k AS (SELECT hh, min(doc_id) AS keeper_doc_id FROM h GROUP BY hh)
SELECT h.doc_id AS dup_doc_id, k.keeper_doc_id
FROM h JOIN k USING (hh) WHERE h.doc_id != k.keeper_doc_id
ORDER BY dup_doc_id"""


def jaccard_pairs_sql(
    tau: float, max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF
) -> str:
    """DuckDB twin of jaccard_pairs: candidates from shingles with
    df <= max_shingle_df, exact Jaccard verified on FULL shingle sets —
    the same two-stage semantics as the Spark side."""
    if max_shingle_df is None:
        cand_cte = """
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id)"""
    else:
        cand_cte = f"""
rare AS (SELECT sh FROM shingles GROUP BY sh
         HAVING count(*) <= {max_shingle_df}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  WHERE a.sh IN (SELECT sh FROM rare))"""
    return f"""
WITH {_SHINGLES_CTE},{cand_cte},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 4) AS jac
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= {tau}
ORDER BY doc_a, doc_b"""


def minhash_pairs_sql(
    tau: float,
    num_perm: int = 32,
    bands: int = 8,
    seed: int = 7,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> str:
    r = num_perm // bands
    seeds = perm_seeds(num_perm, seed)
    seed_rows = ", ".join(f"({i}, {a}::UBIGINT, {b}::UBIGINT)" for i, (a, b) in enumerate(seeds))
    if max_bucket is None:
        cand_cte = """
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandsig a JOIN bandsig b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)"""
    else:
        # mirror of minhash_candidates' star fallback for oversized
        # buckets: left side keeps only the min-docID representative
        cand_cte = f"""
bsize AS (
  SELECT band, sig, count(*) AS bn, min(doc_id) AS rep
  FROM bandsig GROUP BY band, sig),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandsig a
  JOIN bsize s ON s.band = a.band AND s.sig = a.sig
  JOIN bandsig b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  WHERE s.bn <= {max_bucket} OR a.doc_id = s.rep)"""
    return f"""
WITH {_SHINGLES_CTE},
seeds(i, a, b) AS (VALUES {seed_rows}),
sig AS (
  SELECT s.doc_id, d.i, min((d.a * s.sh + d.b) % {P31}) AS mh
  FROM shingles s CROSS JOIN seeds d GROUP BY s.doc_id, d.i),
bandsig AS (
  SELECT doc_id, i // {r} AS band,
         string_agg(mh::VARCHAR, '-' ORDER BY i) AS sig
  FROM sig GROUP BY doc_id, i // {r}),{cand_cte},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 4) AS jac
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= {tau}
ORDER BY doc_a, doc_b"""


_SIMHASH_CTE = f"""
toksh AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS tok
  FROM documents),
tfh AS (
  SELECT doc_id, md5_number_lower(tok) % {P31} AS h, count(*) AS c
  FROM toksh GROUP BY doc_id, tok),
bitsum AS (
  SELECT doc_id, g.b,
         sum(CASE WHEN (h >> g.b) & 1 = 1 THEN c ELSE -c END) AS s
  FROM tfh, generate_series(0, {SIMHASH_BITS - 1}) AS g(b)
  GROUP BY doc_id, g.b),
shv AS (
  SELECT d.doc_id, coalesce(x.simhash, 0) AS simhash
  FROM documents d LEFT JOIN (
    SELECT doc_id,
           sum(CASE WHEN s > 0 THEN (1::UBIGINT << b) ELSE 0 END)::BIGINT AS simhash
    FROM bitsum GROUP BY doc_id) x USING (doc_id))
"""


def simhash_sql() -> str:
    return f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM shv ORDER BY doc_id"


def simhash_pairs_sql(max_hamming: int) -> str:
    return f"""
WITH {_SIMHASH_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT))::INT AS hamming
FROM shv a JOIN shv b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT)) <= {max_hamming}
ORDER BY doc_a, doc_b"""


def embedding_pairs_sql(tau: float) -> str:
    return f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (a.nrm * b.nrm) AS cos
  FROM n a JOIN n b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cos, 4) AS cos FROM pairs
WHERE cos >= {tau} ORDER BY id_a, id_b"""
