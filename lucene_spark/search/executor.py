"""Physical query execution over the postings tables — the
IndexSearcher / Weight / Scorer analog (search/IndexSearcher.java:660-712).

Execution shape per SURVEY.md §3.2: driver-side plan build reads global
term stats (a tiny collect — the createWeight statistics pass,
TermQuery.java:61-64), then one bucket-pruned scan of the postings
Parquet decodes and scores blocks inside an Arrow-batched mapInPandas
(numpy float32 BM25, bm25.py), per-partition top-k happens inside
Spark's TakeOrderedAndProject, and the driver merge applies the
(score desc, docID asc) tie-break of search/HitQueue.java:78-84.

Block-max pruning: for top-k term queries the decode UDF skips blocks
whose competitive-impact max score cannot beat the running local top-k
threshold — the ImpactsDISI.advanceShallow effect
(search/ImpactsDISI.java:61-91) at block granularity. Correctness never
depends on it (verified by tests with pruning on/off).

Two scoring modes:
- 'lucene': float32-exact reference arithmetic (BM25Similarity.java:246).
- 'double': same formula in float64 — used only for cross-checking
  results against an ANSI-SQL oracle that computes in double.
"""

from __future__ import annotations

from collections import OrderedDict

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark import bm25
from lucene_spark.codec import decode_block, decode_value_stream
from lucene_spark.index.reader import Index
from lucene_spark.search import plans as P
from lucene_spark.smallfloat import LENGTH_TABLE

_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)
_DOCS_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType())])
_FREQ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("freq", T.IntegerType()),
        T.StructField("norm", T.IntegerType()),
    ]
)
_POS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("idx", T.IntegerType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
        T.StructField("norm", T.IntegerType()),
    ]
)

_POS_PAY_SCHEMA = T.StructType(
    _POS_SCHEMA.fields
    + [T.StructField("payloads", T.ArrayType(T.FloatType()))]
)


def _key_field(k) -> str | None:
    """Leaf-key field: keys are bare terms (default field) or
    (field, term) tuples (FieldMaskingSpanQ-scoped leaves)."""
    return k[0] if isinstance(k, tuple) else None


def _key_term(k) -> str:
    return k[1] if isinstance(k, tuple) else k


def _by_field(keys) -> dict:
    """Group leaf keys by field, preserving order: {field|None: [terms]}."""
    out: dict = {}
    for k in keys:
        out.setdefault(_key_field(k), []).append(_key_term(k))
    return out


def _edit_distance(a: str, b: str, transpositions: bool) -> int:
    """Levenshtein, or unrestricted Damerau-Levenshtein when
    `transpositions` (matches DuckDB damerau_levenshtein; see FuzzyQ
    docstring for the documented OSA-variant deviation from Lucene's
    parametric automaton)."""
    la, lb = len(a), len(b)
    if not transpositions:
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            ca = a[i - 1]
            for j in range(1, lb + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != b[j - 1]),
                )
            prev = cur
        return prev[lb]
    # unrestricted Damerau (alphabet + last-row tracking)
    inf = la + lb
    da: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = inf
    for i in range(la + 1):
        d[i + 1][0] = inf
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = inf
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            i1 = da.get(b[j - 1], 0)
            j1 = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _decode_positions_row(pos_bin: bytes, freqs: np.ndarray) -> list:
    """pos stream -> list of per-doc position arrays (delta decode)."""
    d = decode_value_stream(bytes(pos_bin)).astype(np.int64)
    if len(d) == 0:
        return [np.zeros(0, np.int64) for _ in freqs]
    c = np.cumsum(d)
    starts = np.concatenate([[0], np.cumsum(freqs)[:-1]]).astype(np.int64)
    base = np.repeat(c[starts] - d[starts], freqs)
    pos = c - base
    return np.split(pos, np.cumsum(freqs)[:-1])


class Searcher:
    # Below this many estimated postings (sum of clause dfs) the WAND
    # machinery's extra driver round-trips (θ sampling + verification)
    # cost more than the decode they would save — route to the plain
    # one-job plan instead. Cost-based, like the reference's rewrite
    # decisions; at 100 TB any hot clause clears this instantly.
    WAND_MIN_POSTINGS = 5_000_000
    WAND_META_CACHE_MAX = 32  # persisted bounds DataFrames kept (LRU)

    # Phrase phase-1: once the rarest slot's df is at most this, the
    # position shuffle is already bounded tightly enough that decoding
    # the REMAINING slots' doc blocks (one scan + semi-join apiece) costs
    # more than the rows it would prune — phase 2's position matching is
    # exact regardless. Mirrors ConjunctionDISI's lead-cost asymmetry.
    PHRASE_CONJ_MIN_DF = 65_536
    # approximation-phase benefit bar: expected surviving position rows
    # must undercut the unpruned position shuffle by this factor
    PHRASE_CONJ_PRUNE_RATIO = 0.5

    def __init__(self, index: Index, scoring: str = "lucene", prune: bool = True,
                 wand_min_postings: int | None = None,
                 similarity: str | object | None = None,
                 query_cache=None, **sim_kwargs):
        assert scoring in ("lucene", "double")
        # IndexSearcher.setSimilarity analog: None = the default BM25
        # (float32 bit-parity path). Named similarities support both
        # modes: "double" is the oracle-checkable float64 path;
        # "lucene" applies the reference's float casts — SimilarityBase
        # computes the model in double and the SimScorer casts the final
        # value to float (SimilarityBase.java:218-225), so per-term
        # float32 final casts + the existing float-cast sum combine ARE
        # the reference float arithmetic (Classic overrides with TFIDF's
        # per-step float computation).
        if similarity is not None:
            from lucene_spark import similarities as _sims

            self.sim = _sims.by_name(similarity, **sim_kwargs)
        else:
            self.sim = None
        self.index = index
        self.scoring = scoring
        self.prune_enabled = prune  # block-max WAND for boolean top-k
        self.wand_min_postings = (
            self.WAND_MIN_POSTINGS if wand_min_postings is None else wand_min_postings
        )
        # per-reader MaxScoreCache analog: LRU of persisted (term, salt)
        # bounds DataFrames, capped so a long-running query service with
        # diverse hot terms can't accumulate persisted blocks without
        # bound (evicted entries are unpersisted, like querycache.py)
        self._wand_meta_cache: OrderedDict = OrderedDict()
        # LRUQueryCache analog (search/querycache.py): caches persisted
        # doc-set DataFrames for repeated filter-context queries
        self.query_cache = query_cache
        self._deletes = index.deletes  # None when nothing deleted

    def _live(self, df: DataFrame) -> DataFrame:
        """Mask deleted docs at the scorer leaf — exactly where the
        reference applies liveDocs (scorer.score(collector, liveDocs)).
        Broadcast anti join; no-op when the index has no deletes."""
        if self._deletes is None:
            return df
        return df.join(F.broadcast(self._deletes), "doc_id", "left_anti")

    # ------------------------------------------------------------------
    # weights (createWeight analog: one-time global stats)
    # ------------------------------------------------------------------

    def _weight(self, df: int, boost: float, field: str | None = None,
                ttf: int = 0):
        """weight = boost * idf (BM25Similarity.java:242), idf against the
        FIELD's docCount (per-field CollectionStatistics). With a
        pluggable similarity installed the weight is that similarity's
        createWeight-time params tuple instead of a float."""
        if self.sim is not None:
            extra = ({"field": field}
                     if getattr(self.sim, "wants_field", False) else {})
            return self.sim.weight(
                df, ttf, self.index.doc_count_for(field),
                self.index.sum_ttf_for(field), boost, **extra,
            )
        dc = self.index.doc_count_for(field)
        if self.scoring == "lucene":
            return float(np.float32(boost) * bm25.idf(df, dc))
        return boost * bm25.idf_double(df, dc)

    def _combined_weight(self, dfs: list[int], boost: float,
                         field: str | None = None) -> float:
        """Multi-term weight: per-term float idfs summed in double
        (BM25Similarity.java:191-200)."""
        if self.sim is not None:
            extra = ({"field": field}
                     if getattr(self.sim, "wants_field", False) else {})
            return self.sim.combined_weight(
                [(n, 0) for n in dfs], self.index.doc_count_for(field),
                self.index.sum_ttf_for(field), boost, **extra,
            )
        dc = self.index.doc_count_for(field)
        if self.scoring == "lucene":
            return float(np.float32(boost) * bm25.combined_idf(dfs, dc))
        return boost * sum(bm25.idf_double(n, dc) for n in dfs)

    # ------------------------------------------------------------------
    # decode UDFs
    # ------------------------------------------------------------------

    def _sim_score(self):
        """Bound scorer for the installed similarity honoring the scoring
        mode: float64, or the reference's float32 final cast ("lucene").
        Returns float64 arrays either way (DataFrame score columns are
        double)."""
        sim = self.sim
        if self.scoring == "lucene":
            return lambda f, qdl, w: sim.score_f32(f, qdl, w).astype(np.float64)
        return sim.score

    def _score_arrays(self, freqs, norms, weight):
        if self.sim is not None:
            qdl = LENGTH_TABLE[np.asarray(norms, dtype=np.int64) & 0xFF]
            return self._sim_score()(freqs, qdl, weight)
        if self.scoring == "lucene":
            return bm25.score(freqs, norms, np.float32(weight), self.index.cache_f32).astype(
                np.float64
            )
        qdl = LENGTH_TABLE[np.asarray(norms, dtype=np.int64) & 0xFF]
        return bm25.score_double(freqs, qdl, weight, self.index.avgdl_dbl)

    def _scored_term_rows(self, terms_weights: dict[str, float], k: int | None,
                          field: str | None = None) -> DataFrame:
        """postings rows for terms -> (doc_id, score) with block-max pruning.

        Pruning (single-term top-k only, k given): skip blocks whose
        impact-derived max score can't enter the local running top-k
        (ImpactsDISI.java:61-91 / MaxScoreCache.java:70-108 effect)."""
        rows = self.index.postings_for_terms(list(terms_weights), field)
        scoring = self.scoring
        sim = self.sim
        sim_score = self._sim_score() if sim is not None else None
        cache_f32 = self.index.cache_f32_for(field)
        avgdl_dbl = self.index.avgdl_dbl_for(field)
        prune = k is not None and len(terms_weights) == 1

        def fn(iterator):
            # running local top-k as a flat numpy array: threshold =
            # topk.min() once full; per-block update is one np.partition
            # (no per-score Python loop)
            topk = np.zeros(0, dtype=np.float64)
            threshold = -np.inf

            def block_max(impacts, weight):
                f = np.array([p["freq"] for p in impacts], dtype=np.float32)
                nm = np.array([p["norm"] for p in impacts], dtype=np.int64)
                if sim is not None:
                    return float(np.max(sim_score(f, LENGTH_TABLE[nm & 0xFF], weight)))
                if scoring == "lucene":
                    return float(np.max(bm25.score(f, nm, np.float32(weight), cache_f32)))
                qdl = LENGTH_TABLE[nm & 0xFF]
                return float(np.max(bm25.score_double(f, qdl, weight, avgdl_dbl)))

            for pdf in iterator:
                out_docs, out_scores = [], []
                for row in pdf.itertuples(index=False):
                    w = terms_weights[row.term]
                    for blk in row.blocks:
                        if prune and len(topk) >= k and len(blk["impacts"]) > 0:
                            if block_max(blk["impacts"], w) <= threshold:
                                continue  # non-competitive block skipped
                        d, f, nm = decode_block(blk)
                        if sim is not None:
                            qdl = LENGTH_TABLE[nm.astype(np.int64) & 0xFF]
                            s = sim_score(f, qdl, w)
                        elif scoring == "lucene":
                            s = bm25.score(f, nm, np.float32(w), cache_f32).astype(np.float64)
                        else:
                            qdl = LENGTH_TABLE[nm.astype(np.int64) & 0xFF]
                            s = bm25.score_double(f, qdl, w, avgdl_dbl)
                        out_docs.append(d)
                        out_scores.append(s)
                        if prune:
                            merged = np.concatenate([topk, s])
                            if len(merged) > k:
                                merged = np.partition(merged, len(merged) - k)[-k:]
                            topk = merged
                            if len(topk) >= k:
                                threshold = float(topk.min())
                if out_docs:
                    yield pd.DataFrame(
                        {
                            "doc_id": np.concatenate(out_docs),
                            "score": np.concatenate(out_scores),
                        }
                    )

        return self._live(rows.mapInPandas(fn, schema=_SCORE_SCHEMA))

    def _doc_rows(self, terms: list[str], field: str | None = None) -> DataFrame:
        """Decoded (doc_id) rows for a term set — non-scoring (FILTER path)."""
        rows = self.index.postings_for_terms(terms, field)

        def fn(iterator):
            for pdf in iterator:
                outs = [decode_block(blk)[0] for blocks in pdf["blocks"] for blk in blocks]
                if outs:
                    yield pd.DataFrame({"doc_id": np.concatenate(outs)})

        return self._live(rows.mapInPandas(fn, schema=_DOCS_SCHEMA))

    def _stats_for_keys(self, keys: list) -> dict:
        """stats_for_terms over mixed-field leaf keys: one lookup per
        distinct field, results keyed back by leaf key."""
        out: dict = {}
        for fld, ts in _by_field(keys).items():
            s = self.index.stats_for_terms(ts, fld)
            for t, v in s.items():
                out[(fld, t) if fld else t] = v
        return out

    def _position_rows_keyed(self, keys: list, with_payloads: bool = False) -> DataFrame:
        """_position_rows over mixed-field leaf keys: one fetch per
        distinct field, the per-fetch term idx remapped to the key's
        position in ``keys``. Single-field queries (every query without
        FieldMaskingSpanQ) collapse to one fetch with an identity remap —
        zero overhead on the common path."""
        out = None
        for fld, ts in _by_field(keys).items():
            p = self._position_rows(ts, fld, with_payloads)
            gidx = [keys.index((fld, t) if fld else t) for t in ts]
            if gidx != list(range(len(keys))):
                p = p.withColumn(
                    "idx",
                    F.element_at(
                        F.array(*[F.lit(g) for g in gidx]), F.col("idx") + 1
                    ),
                )
            out = p if out is None else out.unionByName(p)
        return out

    def _doc_rows_for_predicate(self, predicate, field: str | None = None) -> DataFrame:
        """MultiTermQuery constant-score path: semi-join the postings scan
        against the matching slice of the terms dictionary (broadcast),
        then decode docIDs (MultiTermQueryConstantScoreWrapper.java)."""
        stats = self.index.term_stats
        posts = self.index.postings
        if self.index.has_field_column:
            fld = self.index.resolve_field(field)
            stats = stats.filter(F.col("field") == fld)
            posts = posts.filter(F.col("field") == fld)
        matching = stats.filter(predicate).select("term", "bucket")
        rows = posts.join(
            F.broadcast(matching), ["term", "bucket"], "left_semi"
        )

        def fn(iterator):
            for pdf in iterator:
                outs = [decode_block(blk)[0] for blocks in pdf["blocks"] for blk in blocks]
                if outs:
                    yield pd.DataFrame({"doc_id": np.concatenate(outs)})

        return self._live(rows.mapInPandas(fn, schema=_DOCS_SCHEMA))

    def _freq_rows(self, terms: list[str], field: str | None = None) -> DataFrame:
        """(doc_id, term, freq, norm) rows — synonym/blended scoring input."""
        rows = self.index.postings_for_terms(terms, field)

        def fn(iterator):
            for pdf in iterator:
                parts = []
                for row in pdf.itertuples(index=False):
                    for blk in row.blocks:
                        d, f, nm = decode_block(blk)
                        parts.append(
                            pd.DataFrame(
                                {
                                    "doc_id": d,
                                    "term": row.term,
                                    "freq": f.astype(np.int32),
                                    "norm": nm.astype(np.int32),
                                }
                            )
                        )
                if parts:
                    yield pd.concat(parts)

        return self._live(rows.mapInPandas(fn, schema=_FREQ_SCHEMA))

    def _position_rows(self, terms: list[str], field: str | None = None,
                       with_payloads: bool = False) -> DataFrame:
        """(doc_id, idx, positions, norm[, payloads]) for phrase/span
        matching; idx = index of the term in ``terms``. Two-phase:
        positions only decoded here, for phrase terms (TwoPhaseIterator /
        ExactPhraseMatcher pattern). ``with_payloads`` adds the f32
        payload list aligned with positions (requires a payload build)."""
        if not self.index.manifest.get("with_positions", True):
            raise ValueError("index built without positions; phrase queries unavailable")
        if with_payloads and not self.index.manifest.get("with_payloads"):
            raise ValueError(
                "index built without payloads; rebuild with "
                'analyzer={"payloads": ...} for PayloadScoreQuery'
            )
        rows = self.index.postings_for_terms(terms, field)
        idx_of = {t: i for i, t in enumerate(terms)}
        schema = _POS_PAY_SCHEMA if with_payloads else _POS_SCHEMA

        def fn(iterator):
            for pdf in iterator:
                out = {"doc_id": [], "idx": [], "positions": [], "norm": []}
                if with_payloads:
                    out["payloads"] = []
                for row in pdf.itertuples(index=False):
                    freqs_all, docs_all, norms_all = [], [], []
                    for blk in row.blocks:
                        d, f, nm = decode_block(blk)
                        docs_all.append(d), freqs_all.append(f), norms_all.append(nm)
                    if not docs_all:
                        continue
                    d = np.concatenate(docs_all)
                    f = np.concatenate(freqs_all)
                    nm = np.concatenate(norms_all)
                    plists = _decode_positions_row(row.pos, f)
                    i = idx_of[row.term]
                    out["doc_id"].extend(d.tolist())
                    out["idx"].extend([i] * len(d))
                    out["positions"].extend([p.astype(np.int32).tolist() for p in plists])
                    out["norm"].extend(nm.astype(np.int64).tolist())
                    if with_payloads:
                        pay = (
                            decode_value_stream(bytes(row.pay))
                            .astype(np.uint32)
                            .view(np.float32)
                        )
                        out["payloads"].extend(
                            [c.tolist() for c in np.split(
                                pay, np.cumsum(f)[:-1]
                            )]
                        )
                if out["doc_id"]:
                    yield pd.DataFrame(out)

        return self._live(rows.mapInPandas(fn, schema=schema))

    # ------------------------------------------------------------------
    # scored plans
    # ------------------------------------------------------------------

    def scored(self, q, k: int | None = None, candidates: list[int] | None = None) -> DataFrame:
        """Plan node -> DataFrame(doc_id, score). Recursive Weight tree.

        `candidates`: optional small docID allow-list (the QueryRescorer
        second pass, search/QueryRescorer.java:62-80 — the rescorer
        advances scorers only over the top-N first-pass docs). Applied at
        every leaf right after decode, BEFORE any shuffle/aggregation, so
        a rescore never pays a full-corpus second-pass shuffle."""
        q = P.rewrite(q)
        if isinstance(q, P.TermQ):
            stats = self.index.stats_for_terms([q.term], q.field)
            if q.term not in stats:
                return self._empty_scored()
            w = self._weight(stats[q.term][0], q.boost, q.field,
                             ttf=stats[q.term][1])
            return self._cand(
                self._scored_term_rows({q.term: w}, k, q.field), candidates
            )
        if isinstance(q, P.SynonymQ):
            return self._cand(self._synonym_scored(q), candidates)
        if isinstance(q, P.BlendedTermQ):
            return self._cand(self._blended_scored(q), candidates)
        if isinstance(q, (P.PhraseQ, P.MultiPhraseQ)):
            return self._phrase_scored(q, candidates=candidates)
        if isinstance(q, P.PhraseWildcardQ):
            mp = self._phrase_wildcard_multiphrase(q)
            if mp is None:
                return self._empty_scored()
            return self._phrase_scored(mp, candidates=candidates)
        if isinstance(q, P.TermAutomatonQ):
            return self._term_automaton_scored(q, candidates=candidates)
        if isinstance(q, P.CommonTermsQ):
            return self.scored(self._rewrite_common_terms(q), k, candidates)
        if isinstance(q, P.IntervalQ):
            return self._interval_scored(q, candidates=candidates)
        if isinstance(q, P.PayloadScoreQ):
            return self._payload_scored(q, candidates=candidates)
        if isinstance(q, P.SpanPayloadCheckQ):
            return self._payload_check_scored(q, candidates=candidates)
        if isinstance(q, P.FeatureQ):
            feat = F.col(q.col).cast("double")
            if q.fn == "saturation":
                expr = F.lit(float(q.boost)) * feat / (feat + F.lit(float(q.pivot)))
            elif q.fn == "log":
                expr = F.lit(float(q.boost)) * F.log(F.lit(float(q.pivot)) + feat)
            elif q.fn == "sigmoid":
                # FeatureField.java:440-452: 1 - k^a / (f^a + k^a)
                pivot_pa = F.lit(float(q.pivot) ** float(q.a))
                expr = F.lit(float(q.boost)) * (
                    F.lit(1.0) - pivot_pa / (F.pow(feat, F.lit(float(q.a))) + pivot_pa)
                )
            else:
                raise ValueError(q.fn)
            if self.scoring == "lucene":
                expr = expr.cast("float").cast("double")
            return self._cand(
                self._live(
                    self.index.docs.filter(feat.isNotNull()).select(
                        "doc_id", expr.alias("score")
                    )
                ),
                candidates,
            )
        if isinstance(q, P.DistanceFeatureQ):
            # LongDistanceFeatureQuery.java:117: score = boost *
            # pivot / (pivot + |value - origin|), double math, one
            # final float rounding.
            val = F.col(q.col).cast("double")
            # Evaluation order matches the reference: boost * (pivot /
            # (pivot + dist)) — the division rounds first, then the
            # boost multiply (LongDistanceFeatureQuery.java:117).
            expr = F.lit(float(q.boost)) * (
                F.lit(float(q.pivot))
                / (
                    F.lit(float(q.pivot))
                    + F.abs(val - F.lit(float(q.origin)))
                )
            )
            if self.scoring == "lucene":
                expr = expr.cast("float").cast("double")
            return self._cand(
                self._live(
                    self.index.docs.filter(val.isNotNull()).select(
                        "doc_id", expr.alias("score")
                    )
                ),
                candidates,
            )
        if isinstance(q, P.GeoDistanceFeatureQ):
            # LatLonPointDistanceFeatureQuery.java:130-131: haversine
            # meters from the origin through the same pulse.
            from lucene_spark.geo import haversine_meters

            dist = haversine_meters(q.lat_col, q.lon_col, q.lat, q.lon)
            # boost * (pivot / (pivot + d)) — division rounds before the
            # boost multiply (LatLonPointDistanceFeatureQuery.java:271).
            expr = F.lit(float(q.boost)) * (
                F.lit(float(q.pivot_m)) / (F.lit(float(q.pivot_m)) + dist)
            )
            if self.scoring == "lucene":
                expr = expr.cast("float").cast("double")
            present = (
                F.col(q.lat_col).isNotNull()
                & F.col(q.lon_col).isNotNull()
            )
            return self._cand(
                self._live(
                    self.index.docs.filter(present).select(
                        "doc_id", expr.alias("score")
                    )
                ),
                candidates,
            )
        if isinstance(q, P.FunctionScoreQ):
            # FunctionScoreQuery.createWeight: inner supplies the match
            # set, score comes from the values source (replace) or
            # inner * source (boostByValue). k is NOT forwarded: the
            # transformed score reorders docs, so inner-side block-max
            # pruning against the BM25 ranking would be unsound (the
            # reference likewise never propagates setMinCompetitiveScore
            # through the score transform).
            inner = self.scored(q.inner, None, candidates)
            src = F.expr(q.source).cast("double") * F.lit(float(q.boost))
            new_score = src if q.mode == "replace" else F.col("score") * src
            if self.scoring == "lucene":
                new_score = new_score.cast("float").cast("double")
            return (
                inner.join(self.index.docs, "doc_id")
                .select("doc_id", new_score.alias("score"))
            )
        if isinstance(q, P.BoolQ):
            return self._bool_scored(q, k=k, candidates=candidates)
        if isinstance(q, P.DisMaxQ):
            return self._dismax_scored(q, candidates=candidates)
        if isinstance(q, P.CoveringQ):
            return self._covering_scored(q, candidates=candidates)
        if isinstance(q, P.CombinedFieldQ):
            return self._cand(self._combined_field_scored(q), candidates)
        if isinstance(q, P.ConstScoreQ):
            return self._cand(
                self.doc_set(q.inner).withColumn("score", F.lit(float(q.boost))), candidates
            )
        if isinstance(q, P.BoostQ):
            inner = self.scored(q.inner, k, candidates)
            if self.scoring == "lucene":
                boosted = (F.col("score").cast("float") * F.lit(np.float32(q.boost)).cast("float"))
                return inner.withColumn("score", boosted.cast("double"))
            return inner.withColumn("score", F.col("score") * F.lit(float(q.boost)))
        if isinstance(q, P.MatchAllQ):
            return self._cand(
                self._live(self.index.docs.select("doc_id")).withColumn(
                    "score", F.lit(float(q.boost))
                ),
                candidates,
            )
        if isinstance(q, P.FuzzyQ):
            # reference default: TopTermsBlendedFreqScoringRewrite
            # (FuzzyQuery.java:52) — scored, not constant-score
            return self._cand(self._fuzzy_scored(q), candidates)
        if isinstance(q, P.FuzzyLikeThisQ):
            return self._cand(self._fuzzy_like_this_scored(q), candidates)
        if isinstance(q, (P.PrefixQ, P.WildcardQ, P.RegexpQ, P.TermRangeQ, P.TermInSetQ)):
            rw = getattr(q, "rewrite", "constant_score")
            if rw == "constant_score":
                # CONSTANT_SCORE_REWRITE default (MultiTermQuery.java:53-83)
                return self._cand(
                    self.doc_set(q).withColumn("score", F.lit(float(q.boost))),
                    candidates,
                )
            return self._cand(self._multiterm_scored(q, rw), candidates)
        raise TypeError(f"unsupported query node: {q!r}")

    MAX_CLAUSE_COUNT = 1024  # IndexSearcher.maxClauseCount default

    def _multiterm_scored(self, q, rw: str) -> DataFrame:
        """Scoring rewrites for multi-term queries
        (MultiTermQuery.java:96-212, ScoringRewrite.java,
        TopTermsRewrite.java): expand against the terms dictionary, then
        score the expansions as a SHOULD disjunction in ONE postings
        scan (per-term weights resolved inside the decode UDF)."""
        if rw == "scoring_boolean":
            # every term with its OWN stats (ScoringRewrite.java:60-100).
            # The maxClauseCount bound is pushed INTO the stats query as
            # limit(MAX+1): a hostile prefix over a 10^10-term dictionary
            # ships at most 1025 rows to the driver before raising, never
            # the whole matching slice.
            exp = self._predicate_term_stats(
                self._multiterm_pred(q), q.field,
                limit=self.MAX_CLAUSE_COUNT + 1,
            )
            if len(exp) > self.MAX_CLAUSE_COUNT:
                raise ValueError(
                    f"maxClauseCount exceeded: >{self.MAX_CLAUSE_COUNT}"
                    " expansions"
                )
            weights = {
                t: self._weight(df, q.boost, q.field, ttf=ttf)
                for t, df, ttf in exp
            }
        elif rw == "top_terms_blended":
            # equal boosts -> ScoreTerm queue keeps the lexicographically
            # smallest (TopTermsRewrite.java:210-212); blended df/ttf =
            # max over kept (BlendedTermQuery.java:281-290). The queue is
            # a JVM-side TakeOrdered (order_limit): only max_expansions
            # rows ever reach the driver.
            exp = self._predicate_term_stats(
                self._multiterm_pred(q), q.field,
                order_limit=int(getattr(q, "max_expansions", 50)),
            )
            if exp:
                df_b = max(df for _, df, _ in exp)
                ttf_b = max(ttf for _, _, ttf in exp)
                weights = {
                    t: self._weight(df_b, q.boost, q.field, ttf=ttf_b)
                    for t, _df, _ttf in exp
                }
            else:
                weights = {}
        else:
            raise ValueError(f"unknown rewrite method: {rw}")
        if not weights:
            return self._empty_scored()
        per = self._scored_term_rows(weights, None, q.field)
        return per.groupBy("doc_id").agg(
            self._sum_as_float(F.col("score")).alias("score")
        )

    def _multiterm_pred(self, q):
        """Terms-dictionary predicate for a multi-term query node (the
        TermsEnum intersection, pushed to the stats/postings scans)."""
        if isinstance(q, P.PrefixQ):
            return F.col("term").startswith(q.prefix)
        if isinstance(q, P.WildcardQ):
            like = q.pattern.replace("%", r"\%").replace("_", r"\_")
            like = like.replace("*", "%").replace("?", "_")
            return F.col("term").like(like)
        if isinstance(q, P.RegexpQ):
            if q.syntax == "java":
                # opt-out escape hatch: raw Java regex, substring match
                return F.col("term").rlike(q.pattern)
            # Lucene RegExp dialect (util/automaton/RegExp.java) compiled
            # to an anchored Java pattern — whole-term semantics like
            # RegexpQuery; unsupported operators raise loudly
            from lucene_spark.search.regexp import term_predicate_pattern

            return F.col("term").rlike(term_predicate_pattern(q.pattern))
        if isinstance(q, P.TermRangeQ):
            lo = F.col("term") >= q.lower if q.include_lower else F.col("term") > q.lower
            hi = F.col("term") <= q.upper if q.include_upper else F.col("term") < q.upper
            return lo & hi
        if isinstance(q, P.TermInSetQ):
            return F.col("term").isin(list(q.terms))
        raise TypeError(f"not a multi-term node: {q!r}")

    def _predicate_term_stats(
        self,
        pred,
        field: str | None,
        limit: int | None = None,
        order_limit: int | None = None,
    ) -> list[tuple]:
        """[(term, df, ttf)] for dictionary terms matching ``pred`` —
        cross-segment stats summed like Index.stats_for_terms.

        ``limit`` caps the rows shipped to the driver (CollectLimit —
        the maxClauseCount pre-check); ``order_limit`` returns the
        lexicographically-first N terms via a JVM-side TakeOrdered (the
        TopTermsRewrite priority queue). Both bound driver memory to
        O(limit) regardless of dictionary size."""
        rows = self._predicate_term_stats_df(
            pred, field, limit=limit, order_limit=order_limit
        ).collect()
        out = [(r["term"], int(r["df"]), int(r["ttf"])) for r in rows]
        if order_limit is not None:
            out.sort()
        return out

    def _predicate_term_stats_df(
        self,
        pred,
        field: str | None,
        limit: int | None = None,
        order_limit: int | None = None,
    ) -> DataFrame:
        """The uncollected plan behind _predicate_term_stats (exposed so
        tests can assert the CollectLimit / TakeOrdered bound is in the
        physical plan, not applied driver-side)."""
        stats = self.index.term_stats
        if self.index.has_field_column:
            stats = stats.filter(
                F.col("field") == self.index.resolve_field(field)
            )
        agg = (
            stats.filter(pred)
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
        )
        if order_limit is not None:
            agg = agg.orderBy("term").limit(int(order_limit))
        elif limit is not None:
            agg = agg.limit(int(limit))
        return agg

    def _empty_scored(self) -> DataFrame:
        return self.index.spark.createDataFrame([], _SCORE_SCHEMA)

    @staticmethod
    def _cand(df: DataFrame, candidates) -> DataFrame:
        """DocID allow-list filter (rescore second pass): a literal list
        pushes down as an IN predicate; a DataFrame allow-list (the WAND
        θ-verification, where the candidates are themselves a sub-plan)
        applies as a broadcast semi-join so sample + verification run as
        ONE Spark action instead of collect-then-isin."""
        if candidates is None:
            return df
        if isinstance(candidates, DataFrame):
            ids = candidates.select("doc_id").distinct()
            return df.join(F.broadcast(ids), "doc_id", "left_semi")
        return df.filter(F.col("doc_id").isin([int(d) for d in candidates]))

    def _sum_as_float(self, col):
        """Disjunction sum: float32 clause scores accumulated in double,
        result cast to float (DisjunctionSumScorer.java:38-44)."""
        s = F.sum(col)
        if self.scoring == "lucene":
            return s.cast("float").cast("double")
        return s

    def _synonym_scored(self, q: P.SynonymQ) -> DataFrame:
        """SynonymQuery.java:198-214: one pseudo-term, df = max(term dfs),
        per-doc freq = sum of term freqs, scored once."""
        terms = list(dict.fromkeys(q.terms))
        fld = q.field
        stats = self.index.stats_for_terms(terms, fld)
        if not stats:
            return self._empty_scored()
        df_max = max(s[0] for s in stats.values())
        w = self._weight(df_max, q.boost, fld,
                         ttf=max(s[1] for s in stats.values()))
        freqs = self._freq_rows([t for t in terms if t in stats], fld)
        agg = freqs.groupBy("doc_id").agg(
            F.sum("freq").alias("freq"), F.first("norm").alias("norm")
        )
        return self._score_freq_df(agg, w, fld)

    def _blended_scored(self, q: P.BlendedTermQ) -> DataFrame:
        """BlendedTermQuery.java:334 — every Term(field, text) pair is
        scored with the BLENDED df (max over all pairs; the reference
        rewrites each TermStates' docFreq up to the max so no field's
        rarity dominates), while each pair keeps its OWN field norms and
        avgdl; pairs combine via disjunction-max with the builder's
        tiebreak (DisjunctionMaxRewrite default)."""
        terms = list(dict.fromkeys(q.terms))
        flds = list(q.fields) if q.fields else [q.field]
        per_field_stats = {f: self.index.stats_for_terms(terms, f) for f in flds}
        dfs = [
            s[0]
            for st in per_field_stats.values()
            for s in st.values()
        ]
        if not dfs:
            return self._empty_scored()
        df_max = max(dfs)
        per_term = None
        for f in flds:
            st = per_field_stats[f]
            present = [t for t in terms if t in st]
            if not present:
                continue
            w = self._weight(df_max, q.boost, f)
            sc = self._score_freq_df(
                self._freq_rows(present, f).select("doc_id", "freq", "norm"), w, f
            )
            per_term = sc if per_term is None else per_term.unionByName(sc)
        agg = per_term.groupBy("doc_id").agg(
            F.max("score").alias("mx"), F.sum("score").alias("sm")
        )
        if self.scoring == "lucene":
            expr = (
                F.col("mx").cast("float")
                + F.lit(np.float32(q.tiebreak)).cast("float")
                * (F.col("sm").cast("float") - F.col("mx").cast("float"))
            ).cast("double")
        else:
            expr = F.col("mx") + F.lit(float(q.tiebreak)) * (F.col("sm") - F.col("mx"))
        return agg.select("doc_id", expr.alias("score"))

    def _combined_field_scored(self, q: P.CombinedFieldQ) -> DataFrame:
        """CombinedFieldQuery / BM25F (see plans.CombinedFieldQ for the
        reference's stats-merging rules). Spark shape: per-field freq
        rows union + ONE groupBy summing the weighted tf; the combined
        norm comes from the docs table's per-field norm columns (every
        weighted field contributes its length whether or not it matched
        the term, like MultiFieldNormValues), joined only onto the
        already-aggregated match set."""
        fields = [(f, float(w)) for f, w in q.fields]
        if any(w < 1.0 for _f, w in fields):
            raise ValueError("field weight must be >= 1 "
                             "(CombinedFieldQuery.Builder.addField)")
        terms = list(dict.fromkeys(q.terms))
        per_field_stats = {
            f: self.index.stats_for_terms(terms, f) for f, _w in fields
        }
        df_max = max(
            [0] + [v[0] for st in per_field_stats.values()
                   for v in st.values()]
        )
        if df_max == 0:
            return self._empty_scored()
        doc_count = max(self.index.doc_count_for(f) for f, _w in fields)
        sum_ttf = sum(w * self.index.sum_ttf_for(f) for f, w in fields)
        if self.scoring == "lucene":
            weight = float(np.float32(q.boost) * bm25.idf(df_max, doc_count))
            avgdl = float(
                bm25.avg_field_length(int(sum_ttf), doc_count)
            )
            cache = bm25.norm_cache(np.float32(avgdl))
        else:
            weight = q.boost * bm25.idf_double(df_max, doc_count)
            avgdl = sum_ttf / float(doc_count)
            cache = None
        # weighted per-(field, term) freq rows -> one groupBy sum
        u = None
        for f, w in fields:
            present = [t for t in terms if t in per_field_stats[f]]
            if not present:
                continue
            rows = self._freq_rows(present, f).select(
                "doc_id",
                (F.col("freq").cast("double") * F.lit(w)).alias("wfreq"),
            )
            u = rows if u is None else u.unionByName(rows)
        agg = u.groupBy("doc_id").agg(F.sum("wfreq").alias("freq"))
        # combined pseudo-norm from the docs table's per-field norms
        norm_cols = [
            (self.index.norm_col_for(f), w) for f, w in fields
        ]
        docs = self.index.docs.select(
            "doc_id", *[c for c, _w in norm_cols]
        )
        joined = agg.join(docs, "doc_id")
        col_names = [c for c, _w in norm_cols]
        col_weights = [w for _c, w in norm_cols]
        scoring = self.scoring

        @F.pandas_udf(T.DoubleType())
        def cf_score(freq: pd.Series, *norms: pd.Series) -> pd.Series:
            from lucene_spark.smallfloat import int_to_byte4

            total = np.zeros(len(freq), dtype=np.float32)
            for w, ns in zip(col_weights, norms):
                total += np.float32(w) * LENGTH_TABLE[
                    ns.to_numpy().astype(np.int64) & 0xFF
                ].astype(np.float32)
            # Math.round(float) = floor(x + 0.5)
            nb = int_to_byte4(
                np.floor(total.astype(np.float64) + 0.5).astype(np.int64)
            )
            f = freq.to_numpy()
            if scoring == "lucene":
                s = bm25.score(
                    f.astype(np.float32), nb, np.float32(weight), cache
                ).astype(np.float64)
            else:
                qdl = LENGTH_TABLE[nb.astype(np.int64) & 0xFF]
                s = bm25.score_double(f, qdl, weight, avgdl)
            return pd.Series(s)

        return joined.select(
            "doc_id", cf_score("freq", *col_names).alias("score")
        )

    def _fuzzy_expansions(self, q: P.FuzzyQ) -> list[tuple]:
        """FuzzyTermsEnum + TopTermsRewrite: (term, df, boost) for the top
        max_expansions dictionary terms within edit distance, highest
        boost first (ties: lexicographically smaller term wins, the
        ScoreTerm priority-queue order, TopTermsRewrite.java:210-212).
        boost = 1 - ed / min(|candidate|, |query|); exact match = 1
        (FuzzyTermsEnum.java:249-255)."""
        target = q.term
        k = int(q.max_edits)
        stats = self.index.term_stats
        if self.index.has_field_column:
            stats = stats.filter(
                F.col("field") == self.index.resolve_field(q.field)
            )
        # JVM pre-filters pushed to the scan: length band (|len diff| <= k
        # for either distance variant), prefix constraint, and a loose
        # plain-Levenshtein bound (a transposition costs <= 2 plain
        # edits, so damerau <= k implies levenshtein <= 2k)
        pred = F.abs(F.length(F.col("term")) - F.lit(len(target))) <= k
        if q.prefix_len:
            pred = pred & F.col("term").startswith(target[: q.prefix_len])
        lev_bound = 2 * k if q.transpositions else k
        pred = pred & (F.levenshtein(F.col("term"), F.lit(target)) <= lev_bound)
        cand = stats.filter(pred).groupBy("term").agg(F.sum("df").alias("df"))

        transpositions = q.transpositions

        @F.pandas_udf(T.IntegerType())
        def ed_udf(terms: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    _edit_distance(t, target, transpositions)
                    for t in terms
                ],
                dtype="int32",
            )

        cand = cand.withColumn("ed", ed_udf("term")).filter(F.col("ed") <= k)
        boost = F.when(F.col("ed") == 0, F.lit(1.0)).otherwise(
            1.0 - F.col("ed") / F.least(F.length("term"), F.lit(len(target))).cast("double")
        )
        rows = (
            cand.withColumn("boost", boost)
            .orderBy(F.desc("boost"), F.asc("term"))
            .limit(int(q.max_expansions))
            .collect()
        )
        return [(r["term"], int(r["df"]), float(r["boost"])) for r in rows]

    def _fuzzy_like_this_vars(self, q: "P.FuzzyLikeThisQ") -> dict[str, float]:
        """FuzzyLikeThisQuery.rewrite (sandbox/queries/FuzzyLikeThisQuery
        .java:105-189): the kept variant terms and their final weights.

        Per distinct analyzed token: enumerate ALL dictionary variants
        within max_edits (avg-df fallback counts every variant, java:150
        totalVariantDocFreqs, not just the kept 50), keep the per-token
        top MAX_VARIANTS_PER_TERM by (boost desc, term asc), weight each
        kept variant boost^2 * ClassicSimilarity.idf(df_src, numDocs)
        with idf = ln((numDocs+1)/(df+1)) + 1 (ClassicSimilarity.java:72),
        then ONE global queue keeps the top max_num_terms variants by
        (weight desc, term asc). A term kept under two source tokens
        contributes both weights (two SHOULD clauses on the same term —
        scores sum, and the clause score is linear in the weight, so the
        weights merge additively)."""
        from lucene_spark.analysis import analyze_query_text

        tokens = list(dict.fromkeys(
            analyze_query_text(q.query_text, analyzer=self.index.analyzer)
        ))
        n_docs = self.index.N
        kept: list[tuple[float, str]] = []
        for tok in tokens:
            exp = self._fuzzy_expansions(P.FuzzyQ(
                tok, max_edits=q.max_edits, prefix_len=q.prefix_len,
                max_expansions=1 << 30, transpositions=True, field=q.field,
            ))
            if not exp:
                continue
            df_src = next((df for t, df, _b in exp if t == tok), 0)
            if df_src == 0:
                # integer average over ALL variants (java:158-161)
                df_src = sum(df for _t, df, _b in exp) // len(exp)
            idf = math.log((n_docs + 1) / float(df_src + 1)) + 1.0
            for t, _df, b in exp[: P.FuzzyLikeThisQ.MAX_VARIANTS_PER_TERM]:
                kept.append((b * b * idf, t))
        # global ScoreTermQueue order: weight desc, ties smaller term
        # first (java:239-244 lessThan)
        kept.sort(key=lambda x: (-x[0], x[1]))
        weights: dict[str, float] = {}
        for w, t in kept[: int(q.max_num_terms)]:
            weights[t] = weights.get(t, 0.0) + w * float(q.boost)
        return weights

    def _fuzzy_like_this_scored(self, q: "P.FuzzyLikeThisQ") -> DataFrame:
        """Score the rewritten SHOULD union. Each clause is a TermQuery
        whose TermStates are overridden to df=1/ttf=1 (java:176-189) —
        the in-clause idf is the same constant for every variant — boosted
        by the precomputed variant weight; ignore_tf swaps the clause for
        ConstantScore(weight). ONE postings scan covers all variants."""
        var_weights = self._fuzzy_like_this_vars(q)
        if not var_weights:
            return self._empty_scored()
        if q.ignore_tf:
            # ConstantScore clauses: each matched variant adds exactly
            # its weight, freq/norm ignored (java:178)
            wmap = F.create_map(*[
                x for t, w in sorted(var_weights.items())
                for x in (F.lit(t), F.lit(float(w)))
            ])
            return (
                self._freq_rows(list(var_weights), q.field)
                .groupBy("doc_id")
                .agg(self._sum_as_float(wmap[F.col("term")]).alias("score"))
            )
        weights = {
            t: self._weight(1, w, q.field, ttf=1)
            for t, w in var_weights.items()
        }
        per_term = self._scored_term_rows(weights, None, q.field)
        return per_term.groupBy("doc_id").agg(
            self._sum_as_float(F.col("score")).alias("score")
        )

    def _fuzzy_scored(self, q: P.FuzzyQ) -> DataFrame:
        """TopTermsBlendedFreqScoringRewrite (MultiTermQuery.java:173-212):
        blended df = max over the kept expansions
        (BlendedTermQuery.java:281-290), each expansion scored as a
        TermQuery with the blended df wrapped in BoostQuery(term boost),
        combined as a SHOULD disjunction sum. One postings scan for all
        expansions (per-term weights resolved inside the decode UDF)."""
        exp = self._fuzzy_expansions(q)
        if not exp:
            return self._empty_scored()
        df_blend = max(df for _, df, _ in exp)
        weights = {
            t: self._weight(df_blend, b * q.boost, q.field) for t, _df, b in exp
        }
        per_term = self._scored_term_rows(weights, None, q.field)
        return per_term.groupBy("doc_id").agg(
            self._sum_as_float(F.col("score")).alias("score")
        )

    def _score_freq_df(self, df: DataFrame, weight: float,
                       field: str | None = None) -> DataFrame:
        """(doc_id, freq, norm) -> (doc_id, score) via vectorized UDF."""
        scoring = self.scoring
        sim = self.sim
        sim_score = self._sim_score() if sim is not None else None
        cache_f32 = self.index.cache_f32_for(field)
        avgdl_dbl = self.index.avgdl_dbl_for(field)

        @F.pandas_udf(T.DoubleType())
        def score_udf(freq: pd.Series, norm: pd.Series) -> pd.Series:
            f = freq.to_numpy()
            nm = norm.to_numpy()
            if sim is not None:
                s = sim_score(f, LENGTH_TABLE[nm.astype(np.int64) & 0xFF], weight)
            elif scoring == "lucene":
                s = bm25.score(f, nm, np.float32(weight), cache_f32).astype(np.float64)
            else:
                qdl = LENGTH_TABLE[nm.astype(np.int64) & 0xFF]
                s = bm25.score_double(f, qdl, weight, avgdl_dbl)
            return pd.Series(s)

        return df.select("doc_id", score_udf("freq", "norm").alias("score"))

    def _phrase_scored(self, q, candidates: list[int] | None = None) -> DataFrame:
        """Phrase family (PhraseQuery.java:71, MultiPhraseQuery.java:53).

        slots: one tuple of alternative terms per phrase position; a doc
        matches when some term of every slot occurs at consecutive
        (slop=0) or near (slop>0) positions. Two-phase: docID conjunction
        on slot presence first, positions decoded only for survivors
        (TwoPhaseIterator / ExactPhraseMatcher pattern).

        slop=0: freq = #exact alignments (ExactPhraseMatcher.java:166).
        slop>0 (plain AND MultiPhrase): the REFERENCE SloppyPhraseMatcher
        algorithm — PhraseQueue propagation of the least PhrasePosition
        with repeat-group collision resolution (sloppy.py;
        SloppyPhraseMatcher.java:163-205, 365-470), including repeated
        terms ("get get value") and the multi-term repeat machinery
        (alternative slots as union position streams, bipartite
        term-group detection, collide-driven group init)."""
        if isinstance(q, P.MultiPhraseQ):
            slots = [tuple(alt) for alt in q.positions]
            weight_terms = [t for alt in slots for t in alt]
            offsets = list(range(len(slots)))
        else:
            slots = [(t,) for t in q.terms]
            weight_terms = list(q.terms)
            # explicit positions (PhraseQuery.Builder.add(term, pos) /
            # the NGramPhraseQuery rewrite); exact matching only
            explicit = getattr(q, "positions", None)
            assert explicit is None or q.slop == 0, \
                "explicit phrase positions require slop=0"
            offsets = list(explicit) if explicit else list(range(len(slots)))
        slop = q.slop
        fld = getattr(q, "field", None)
        uniq = list(dict.fromkeys(t for alt in slots for t in alt))
        stats = self.index.stats_for_terms(uniq, fld)
        if isinstance(q, P.MultiPhraseQ):
            # MultiPhrase: a slot matches if ANY alternative exists; drop
            # missing alternatives, fail only if a whole slot is gone
            slots = [tuple(t for t in alt if t in stats) for alt in slots]
            if any(not alt for alt in slots):
                return self._empty_scored()
            weight_terms = [t for t in weight_terms if t in stats]
            uniq = list(dict.fromkeys(t for alt in slots for t in alt))
        elif any(t not in stats for t in uniq):
            return self._empty_scored()
        w = self._combined_weight([stats[t][0] for t in weight_terms], q.boost, fld)
        # ---- phase 1 (TwoPhaseIterator.approximation): docID conjunction
        # from doc blocks ONLY — no position decode, no position shuffle.
        # Slots are intersected rarest-first; the surviving docID set then
        # semi-joins the position rows BEFORE their groupBy, so only
        # survivors' position arrays ever cross a shuffle ("the quick"
        # never ships every "the" doc's positions).
        pos = self._position_rows(uniq, fld)
        if candidates is not None:
            pos = self._cand(pos, candidates)
        total_df = sum(stats[t][0] for t in uniq)
        # Cost gate for the approximation phase: the doc-block decode +
        # semi-join is an extra stage, so run it only when it PRUNES.
        # Expected survivors under slot independence =
        # n_docs * prod(slot_df / n_docs); the semi-join pays when the
        # surviving position rows (survivors x slots) undercut the
        # unpruned shuffle (total_df rows) by PHRASE_CONJ_PRUNE_RATIO.
        # "data line" over a corpus where both terms are hot prunes
        # ~nothing (est ~ total) -> skip, saving the extra stage;
        # "the <rare>" prunes 50x -> conjunct. Scale-invariant: the
        # ratio, not the corpus size, decides.
        n_docs = max(1, self.index.doc_count_for(fld))
        est_surv = float(n_docs)
        for alt in slots:
            slot_df = min(n_docs, sum(stats[t][0] for t in alt))
            est_surv *= slot_df / n_docs
        if (
            total_df > self.PHRASE_CONJ_MIN_DF
            and est_surv * len(slots)
            < self.PHRASE_CONJ_PRUNE_RATIO * total_df
        ):
            surv = self._slot_conjunction_docs(slots, stats, fld)
            pos = pos.join(surv, "doc_id", "left_semi")
        # else: either every slot is small (the position shuffle is
        # already bounded) or the slots are all hot (the conjunction
        # keeps ~every doc); the phase-2 matcher discards
        # non-conjunction docs exactly either way (TwoPhaseIterator
        # approximation skipped when it cannot pay for itself)
        idx_of = {t: i for i, t in enumerate(uniq)}
        # slot -> list of (term_idx, offset) pairs
        slot_spec = [
            [idx_of[t] for t in alt] for alt in slots
        ]
        grouped = (
            pos.groupBy("doc_id")
            .agg(
                F.collect_list(F.struct("idx", "positions")).alias("plists"),
                F.first("norm").alias("norm"),
            )
        )

        single_term_slots = all(len(idxs) == 1 for idxs in slot_spec)

        @F.pandas_udf(T.DoubleType())
        def phrase_freq(plists: pd.Series) -> pd.Series:
            from lucene_spark.search.sloppy import sloppy_phrase_freq

            out = np.zeros(len(plists), dtype=np.float64)
            for r, entries in enumerate(plists):
                arrs = {}
                for e in entries:
                    arrs[e["idx"]] = np.asarray(e["positions"], dtype=np.int64)
                if slop > 0:
                    # reference-exact sloppy matcher (repeat-safe).
                    # Multi-term slots feed the union of their present
                    # alternatives' positions (UnionPostingsEnum) under
                    # the slot's FULL query term set, so repeat-group
                    # detection sees query-level term identity
                    # (SloppyPhraseMatcher.initFirstTime).
                    slot_in = []
                    ok = True
                    for idxs in slot_spec:
                        if single_term_slots:
                            ti = idxs[0]
                            if ti not in arrs:
                                ok = False
                                break
                            slot_in.append((ti, arrs[ti]))
                            continue
                        parts = [arrs[i] for i in idxs if i in arrs]
                        if not parts:
                            ok = False
                            break
                        slot_in.append(
                            (
                                frozenset(idxs),
                                np.unique(np.concatenate(parts)),
                            )
                        )
                    if ok:
                        out[r] = sloppy_phrase_freq(slot_in, slop)
                    continue
                # offset-adjusted union per slot
                slot_pos = []
                ok = True
                for off, idxs in zip(offsets, slot_spec):
                    parts = [arrs[i] - off for i in idxs if i in arrs]
                    if not parts:
                        ok = False
                        break
                    slot_pos.append(np.unique(np.concatenate(parts)))
                if not ok:
                    continue
                cand = slot_pos[0]
                for sp in slot_pos[1:]:
                    cand = np.intersect1d(cand, sp, assume_unique=True)
                out[r] = float(len(cand[cand >= 0]))
            return pd.Series(out)

        # filter on the *score* (0 iff freq == 0: BM25 weight > 0 always)
        # rather than on freq: a freq filter makes Catalyst evaluate the
        # phrase UDF twice (once for Filter, once for the downstream
        # Project) — scoring first keeps a single ArrowEvalPython node.
        matched = grouped.withColumn("freq", phrase_freq("plists"))
        return self._score_freq_df(
            matched.select("doc_id", "freq", "norm"), w, fld
        ).filter(F.col("score") > 0.0)

    def _slot_conjunction_docs(self, slots, stats, field: str | None = None) -> DataFrame:
        """Phase-1 approximation: docIDs containing some alternative of
        EVERY slot, from doc blocks only (positions never decoded).
        Rarest slot first so the running intersection shrinks fastest;
        duplicate slots (repeated phrase terms) scan once."""
        seen: dict[tuple, None] = {}
        for alt in slots:
            # slot entries may be bare terms or (field, term) leaf keys
            key = tuple(sorted((t for t in alt if t in stats), key=repr))
            seen.setdefault(key, None)
        ordered = sorted(seen, key=lambda key: sum(stats[t][0] for t in key))
        if len(ordered) > 1:
            rarest_df = sum(stats[t][0] for t in ordered[0])
            if rarest_df <= self.PHRASE_CONJ_MIN_DF:
                ordered = ordered[:1]
        surv = None
        for key in ordered:
            # duplicate docIDs are harmless on the probe/build side of a
            # left-semi join — no distinct() (it would add an exchange).
            # A slot's alternatives may span fields (masked spans inside
            # an or): per-field doc rows union into one slot doc set.
            sd = None
            for fld, ts in _by_field(key).items():
                d = self._doc_rows(ts, field if fld is None else fld)
                sd = d if sd is None else sd.unionByName(d)
            surv = sd if surv is None else surv.join(sd, "doc_id", "left_semi")
        return surv

    def _phrase_wildcard_multiphrase(self, q) -> P.MultiPhraseQ | None:
        """PhraseWildcardQuery -> MultiPhraseQ by dictionary expansion
        (sandbox/search/PhraseWildcardQuery.java:63). The TOTAL
        expansion budget (maxMultiTermExpansions) is split evenly
        across the remaining multi-terms in clause order —
        ``remainingExpansions / remainingMultiTerms`` (lines 188-197) —
        each multi-term expanding in term-dictionary order up to its
        share. Returns None when a slot expands to nothing (the
        reference's no-match segment behavior)."""
        remaining_exp = int(q.max_multi_term_expansions)
        remaining_multi = sum(1 for c in q.clauses if not isinstance(c, str))
        slots = []
        for c in q.clauses:
            if isinstance(c, str):
                slots.append((c,))
                continue
            cap = max(0, remaining_exp // max(1, remaining_multi))
            if isinstance(c, P.FuzzyQ):
                terms = sorted(
                    t for t, _df, _b in self._fuzzy_expansions(c)
                )[:cap]
            else:
                # per-slot expansion budget pushed down as TakeOrdered —
                # only `cap` rows reach the driver
                terms = self._predicate_term_stats(
                    self._multiterm_pred(c), q.field, order_limit=cap
                )
                terms = [t for t, _df, _ttf in terms]
            remaining_exp -= len(terms)
            remaining_multi -= 1
            if not terms:
                return None
            slots.append(tuple(terms))
        return P.MultiPhraseQ(tuple(slots), q.slop, q.boost, q.field)

    def _term_automaton_scored(self, q: P.TermAutomatonQ,
                               candidates: list[int] | None = None) -> DataFrame:
        """TermAutomatonQuery (sandbox/search/TermAutomatonQuery.java:70,
        TermAutomatonScorer.java:231): determinize the term automaton,
        fetch ONE position pass for its alphabet, phase-1 docID
        conjunction on the DFA's *required* terms (every 0->accept path
        crosses them — the TwoPhaseIterator approximation), then the
        reference-exact countMatches per surviving doc in an
        Arrow-batched UDF. Weight = combined idf over alphabet terms
        present in the index (TermAutomatonWeight, lines 364-399);
        score = similarity(freq, norm)."""
        from lucene_spark.search import termautomaton as TA

        dfa = TA.determinize(q.n_states, q.transitions, q.accepts)
        if not dfa.terms:
            return self._empty_scored()
        fld = q.field
        stats = self.index.stats_for_terms(list(dfa.terms), fld)
        # an absent alphabet term can never fire its arcs; a *required*
        # absent term kills the query outright
        required = TA.required_terms(dfa)
        if any(t not in stats for t in required):
            return self._empty_scored()
        present = [t for t in dfa.terms if t in stats]
        if not present:
            return self._empty_scored()
        w = self._combined_weight([stats[t][0] for t in present], q.boost, fld)
        pos = self._position_rows(present, fld)
        if candidates is not None:
            pos = self._cand(pos, candidates)
        req_present = [t for t in required if t in stats]
        total_df = sum(stats[t][0] for t in present)
        if req_present and total_df > self.PHRASE_CONJ_MIN_DF:
            surv = self._slot_conjunction_docs(
                [(t,) for t in req_present], stats, fld
            )
            pos = pos.join(surv, "doc_id", "left_semi")
        grouped = (
            pos.groupBy("doc_id")
            .agg(
                F.collect_list(F.struct("idx", "positions")).alias("plists"),
                F.first("norm").alias("norm"),
            )
        )
        # position-row idx (index into `present`) -> DFA symbol id
        sym_of_idx = [dfa.terms.index(t) for t in present]

        @F.pandas_udf(T.DoubleType())
        def ta_freq(plists: pd.Series) -> pd.Series:
            out = np.zeros(len(plists), dtype=np.float64)
            for r, entries in enumerate(plists):
                events = []
                for e in entries:
                    sym = sym_of_idx[e["idx"]]
                    events.extend((int(p), sym) for p in e["positions"])
                events.sort()
                out[r] = float(TA.count_matches(events, dfa))
            return pd.Series(out)

        matched = grouped.withColumn("freq", ta_freq("plists"))
        return self._score_freq_df(
            matched.select("doc_id", "freq", "norm"), w, fld
        ).filter(F.col("score") > 0.0)

    def _bool_scored(self, q: P.BoolQ, k: int | None = None,
                     candidates: list[int] | None = None) -> DataFrame:
        """BooleanQuery semantics (BooleanQuery.java:77-176,
        Boolean2ScorerSupplier.java:100-248): score = Σ scoring clauses;
        MUST = scoring intersection, SHOULD = scoring union (optional when
        MUST present), FILTER = non-scoring semi join, MUST_NOT = anti join."""
        spark = self.index.spark
        scored_parts = []
        # MUST: intersection of scored clauses
        must_df = None
        for c in q.must:
            s = self.scored(c, candidates=candidates).withColumnRenamed("score", "s")
            if must_df is None:
                must_df = s.withColumnRenamed("s", "score")
            else:
                must_df = (
                    must_df.join(s, "doc_id", "inner")
                    .withColumn("score", F.col("score") + F.col("s"))
                    .drop("s")
                )
        # SHOULD: union + groupBy sum (+count for minShouldMatch)
        should_df = None
        if q.should:
            u = None
            for c in q.should:
                s = self.scored(c, candidates=candidates)
                u = s if u is None else u.unionByName(s)
            should_df = u.groupBy("doc_id").agg(
                self._sum_as_float(F.col("score")).alias("score"),
                F.count(F.lit(1)).alias("n_should"),
            )
            msm = q.min_should_match
            if must_df is None and msm < 1:
                msm = 1  # pure disjunction: at least one clause matches by construction
            if msm > 0:
                should_df = should_df.filter(F.col("n_should") >= msm)
            should_df = should_df.drop("n_should")

        if must_df is not None and should_df is not None:
            if q.min_should_match > 0:
                # SHOULD becomes required at msm (BooleanQuery.java:96)
                base = must_df.join(
                    should_df.withColumnRenamed("score", "s2"), "doc_id", "inner"
                )
            else:
                base = must_df.join(
                    should_df.withColumnRenamed("score", "s2"), "doc_id", "left"
                ).fillna({"s2": 0.0})
            combined = base.withColumn("score", F.col("score") + F.col("s2")).drop("s2")
            if self.scoring == "lucene":
                combined = combined.withColumn(
                    "score", F.col("score").cast("float").cast("double")
                )
        elif must_df is not None:
            combined = must_df
            if len(q.must) > 1 and self.scoring == "lucene":
                combined = combined.withColumn(
                    "score", F.col("score").cast("float").cast("double")
                )
        elif should_df is not None:
            combined = should_df
        else:
            # filter-only query: constant score 0 over the filter set
            combined = None

        # FILTER clauses: non-scoring required (BooleanWeight.java:31)
        filter_sets = [self.doc_set(c) for c in q.filter]
        if combined is None:
            if not filter_sets:
                return self._empty_scored()
            base = filter_sets[0]
            for fs in filter_sets[1:]:
                base = base.join(fs, "doc_id", "left_semi")
            combined = base.withColumn("score", F.lit(0.0))
        else:
            for fs in filter_sets:
                combined = combined.join(fs, "doc_id", "left_semi")
        # MUST_NOT: anti join (ReqExclScorer semantics)
        for c in q.must_not:
            combined = combined.join(self.doc_set(c), "doc_id", "left_anti")
        if q.boost != 1.0:
            if self.scoring == "lucene":
                combined = combined.withColumn(
                    "score",
                    (F.col("score").cast("float") * F.lit(np.float32(q.boost)).cast("float")).cast(
                        "double"
                    ),
                )
            else:
                combined = combined.withColumn("score", F.col("score") * F.lit(float(q.boost)))
        return combined.select("doc_id", "score")

    def _dismax_scored(self, q: P.DisMaxQ, candidates: list[int] | None = None) -> DataFrame:
        """DisjunctionMaxQuery.java:45: max + tiebreak * (sum - max)."""
        u = None
        for c in q.clauses:
            s = self.scored(c, candidates=candidates)
            u = s if u is None else u.unionByName(s)
        if u is None:
            return self._empty_scored()
        agg = u.groupBy("doc_id").agg(
            F.max("score").alias("mx"), F.sum("score").alias("sm")
        )
        if self.scoring == "lucene":
            expr = (
                F.col("mx").cast("float")
                + F.lit(np.float32(q.tiebreak)).cast("float")
                * (F.col("sm").cast("float") - F.col("mx").cast("float"))
            ).cast("double")
        else:
            expr = F.col("mx") + F.lit(float(q.tiebreak)) * (F.col("sm") - F.col("mx"))
        return agg.select("doc_id", expr.alias("score"))

    def _covering_scored(
        self, q: P.CoveringQ, candidates: list[int] | None = None
    ) -> DataFrame:
        """CoveringQuery (sandbox/search/CoveringQuery.java:54-108,
        CoveringScorer.java:138,168,211-216): matches when the number of
        matching sub-queries >= max(1, per-doc minimumNumberMatch value);
        score = Σ matching clause scores; docs with no value never match.

        Spark shape: scored-union + ONE groupBy (the clause count rides
        the same aggregation as the score sum) + the doc-values join —
        no per-clause shuffles, msm filter before the join would be
        wrong (the threshold is per-doc), but the join is on the
        already-aggregated (small) match set, not the corpus."""
        u = None
        for c in q.queries:
            s = self.scored(c, candidates=candidates)
            u = s if u is None else u.unionByName(s)
        if u is None:
            return self._empty_scored()
        agg = u.groupBy("doc_id").agg(
            self._sum_as_float(F.col("score")).alias("score"),
            F.count(F.lit(1)).alias("_n_match"),
        )
        vals = self.index.docs.select(
            "doc_id", F.expr(q.min_match_col).cast("long").alias("_mm")
        )
        return (
            agg.join(vals, "doc_id")
            .filter(
                F.col("_mm").isNotNull()
                & (F.col("_n_match") >= F.greatest(F.lit(1), F.col("_mm")))
            )
            .select("doc_id", "score")
        )

    def _interval_scored(self, q: P.IntervalQ, candidates: list[int] | None = None) -> DataFrame:
        """IntervalQuery (intervals/IntervalQuery.java:59): two-phase like
        phrases — docID conjunction on the leaf terms BEFORE the position
        shuffle (semi-join of position rows against the doc-block
        intersection), then the minimal-interval algebra per doc
        (intervals.py). freq = sum 1/(1+gaps), weight = summed leaf idf."""
        from lucene_spark.search import intervals as IV

        terms = IV.leaf_keys(q.source)
        uniq = list(dict.fromkeys(terms))
        stats = self._stats_for_keys(uniq)
        # phase-1 conjunction uses REQUIRED slots only: negative
        # combinators' subtrahends and or-alternatives are optional
        # (intervals.required_terms); a slot with no present term kills
        # the query, an absent optional term just has no positions
        req_slots = []
        for slot in IV.required_terms(q.source):
            present = tuple(t for t in dict.fromkeys(slot) if t in stats)
            if not present:
                return self._empty_scored()
            req_slots.append(present)
        present_terms = [t for t in terms if t in stats]
        uniq = [t for t in uniq if t in stats]
        w = self._combined_weight([stats[t][0] for t in present_terms], q.boost)
        # leaves run over the default field unless scoped by a
        # FieldMaskingSpanQ ((field, term) keys; per-field fetch + union)
        surv = self._slot_conjunction_docs(req_slots, stats)
        pos = self._position_rows_keyed(uniq)
        if candidates is not None:
            pos = self._cand(pos, candidates)
        pos = pos.join(surv, "doc_id", "left_semi")
        grouped = (
            pos.groupBy("doc_id")
            .agg(
                F.collect_list(F.struct("idx", "positions")).alias("plists"),
                F.first("norm").alias("norm"),
            )
        )
        source = q.source
        uniq_l = list(uniq)

        @F.pandas_udf(T.DoubleType())
        def interval_freq(plists: pd.Series) -> pd.Series:
            out = np.zeros(len(plists), dtype=np.float64)
            for r, entries in enumerate(plists):
                pos_by_term = {}
                for e in entries:
                    pos_by_term[uniq_l[e["idx"]]] = np.asarray(
                        e["positions"], dtype=np.int64
                    )
                out[r] = IV.freq_of(source, pos_by_term)
            return pd.Series(out)

        matched = grouped.withColumn("freq", interval_freq("plists"))
        return self._score_freq_df(
            matched.select("doc_id", "freq", "norm"), w
        ).filter(F.col("score") > 0.0)

    def _payload_scored(self, q: P.PayloadScoreQ,
                        candidates: list[int] | None = None) -> DataFrame:
        """PayloadScoreQuery (queries/payloads/PayloadScoreQuery.java,
        PayloadFunction min/max/avg/sum): evaluate the span's minimal
        intervals per doc, collect the payloads of every leaf-term
        position inside a matched interval, aggregate with the
        PayloadFunction; score = func(payloads) * boost
        (includeSpanScore=False semantics). Same two-phase shape as
        intervals; payloads ride the position rows."""
        from lucene_spark.search import intervals as IV

        source = P.span_source(q.span)
        terms = IV.leaf_keys(source)
        uniq = list(dict.fromkeys(terms))
        stats = self._stats_for_keys(uniq)
        req_slots = []
        for slot in IV.required_terms(source):
            present = tuple(t for t in dict.fromkeys(slot) if t in stats)
            if not present:
                return self._empty_scored()
            req_slots.append(present)
        uniq = [t for t in uniq if t in stats]
        pos = self._position_rows_keyed(uniq, with_payloads=True)
        if candidates is not None:
            pos = self._cand(pos, candidates)
        total_df = sum(stats[t][0] for t in uniq)
        if total_df > self.PHRASE_CONJ_MIN_DF:
            surv = self._slot_conjunction_docs(req_slots, stats)
            pos = pos.join(surv, "doc_id", "left_semi")
        grouped = pos.groupBy("doc_id").agg(
            F.collect_list(
                F.struct("idx", "positions", "payloads")
            ).alias("plists")
        )
        uniq_l = list(uniq)
        func = q.func
        boost = float(q.boost)

        @F.pandas_udf(T.DoubleType())
        def payload_score(plists: pd.Series) -> pd.Series:
            out = np.full(len(plists), np.nan, dtype=np.float64)
            for r, entries in enumerate(plists):
                pos_by_term, pay_by_term = {}, {}
                for e in entries:
                    t = uniq_l[e["idx"]]
                    pos_by_term[t] = np.asarray(e["positions"], dtype=np.int64)
                    pay_by_term[t] = np.asarray(e["payloads"], dtype=np.float64)
                ivs = IV.evaluate(source, pos_by_term)
                if not ivs:
                    continue
                vals = []
                for s0, s1 in ivs:
                    for t, ps in pos_by_term.items():
                        m = (ps >= s0) & (ps <= s1)
                        if m.any():
                            vals.append(pay_by_term[t][m])
                allv = np.concatenate(vals)
                out[r] = {
                    "min": np.min, "max": np.max,
                    "avg": np.mean, "sum": np.sum,
                }[func](allv)
            return pd.Series(out)

        scored = (
            grouped.withColumn("pscore", payload_score("plists"))
            .filter(F.col("pscore").isNotNull())
            .select(
                "doc_id", (F.col("pscore") * F.lit(boost)).alias("score")
            )
        )
        return scored

    def _payload_check_scored(
        self, q: P.SpanPayloadCheckQ, candidates: list[int] | None = None
    ) -> DataFrame:
        """SpanPayloadCheckQuery (queries/payloads/
        SpanPayloadCheckQuery.java:44,206-237): a span is accepted iff
        the payloads at its positions, in ascending position order,
        compare true one-for-one (and same count) against
        ``q.payloads`` under ``q.op``; docs score like the span over
        accepted intervals only (sloppyFreq = sum 1/(1+gaps)).
        Comparisons run in float32 (this engine's payload type)."""
        from lucene_spark.search import intervals as IV

        source = P.span_source(q.span)
        terms = IV.leaf_keys(source)
        uniq = list(dict.fromkeys(terms))
        stats = self._stats_for_keys(uniq)
        req_slots = []
        for slot in IV.required_terms(source):
            present = tuple(t for t in dict.fromkeys(slot) if t in stats)
            if not present:
                return self._empty_scored()
            req_slots.append(present)
        present_terms = [t for t in terms if t in stats]
        uniq = [t for t in uniq if t in stats]
        w = self._combined_weight(
            [stats[t][0] for t in present_terms], q.boost
        )
        surv = self._slot_conjunction_docs(req_slots, stats)
        pos = self._position_rows_keyed(uniq, with_payloads=True)
        if candidates is not None:
            pos = self._cand(pos, candidates)
        pos = pos.join(surv, "doc_id", "left_semi")
        grouped = pos.groupBy("doc_id").agg(
            F.collect_list(
                F.struct("idx", "positions", "payloads")
            ).alias("plists"),
            F.first("norm").alias("norm"),
        )
        uniq_l = list(uniq)
        refs = list(q.payloads)
        op = q.op
        if op not in ("eq", "gt", "gte", "lt", "lte"):
            raise ValueError(f"unknown payload match op {op!r}")

        @F.pandas_udf(T.DoubleType())
        def check_freq(plists: pd.Series) -> pd.Series:
            import operator

            cmp = {
                "eq": operator.eq, "gt": operator.gt, "gte": operator.ge,
                "lt": operator.lt, "lte": operator.le,
            }[op]
            out = np.zeros(len(plists), dtype=np.float64)
            for r, entries in enumerate(plists):
                pos_by_term, pay_by_term = {}, {}
                for e in entries:
                    t = uniq_l[e["idx"]]
                    pos_by_term[t] = np.asarray(e["positions"], dtype=np.int64)
                    pay_by_term[t] = np.asarray(e["payloads"], dtype=np.float64)
                ivs = IV.evaluate(source, pos_by_term)
                if not ivs:
                    continue
                k = IV._gap_k(source)
                freq = 0.0
                for s0, s1 in ivs:
                    seq = []
                    for t, ps in pos_by_term.items():
                        m = (ps >= s0) & (ps <= s1)
                        if m.any():
                            seq.extend(zip(ps[m], pay_by_term[t][m]))
                    seq.sort()
                    if len(seq) != len(refs):
                        continue
                    ok = all(
                        ref is not None
                        and cmp(np.float32(v), np.float32(ref))
                        for (_, v), ref in zip(seq, refs)
                    )
                    if ok:
                        freq += 1.0 / (1.0 + max(0, (s1 - s0) - (k - 1)))
                out[r] = freq
            return pd.Series(out)

        matched = grouped.withColumn("freq", check_freq("plists")).filter(
            F.col("freq") > 0.0
        )
        return self._score_freq_df(matched.select("doc_id", "freq", "norm"), w)

    def _rewrite_common_terms(self, q: P.CommonTermsQ):
        """CommonTermsQuery plan rewrite (CommonTermsQuery.java:136-190):
        df > max_df_ratio * maxDoc => high-freq group, else low-freq MUST.
        Reference semantics reproduced exactly:
        - cutoff is against maxDoc, not docCount (buildQuery uses
          reader.maxDoc(), CommonTermsQuery.java:164);
        - terms absent from the index stay in the low-freq MUST group
          (TermStates for a missing term matches nothing, so the whole
          conjunction is empty — NOT dropped, CommonTermsQuery.java:152);
        - when no low-freq terms remain, the high-freq group becomes a
          conjunction (MUST), CommonTermsQuery.java:172-180."""
        stats = self.index.stats_for_terms(list(dict.fromkeys(q.terms)))
        cutoff = q.max_df_ratio * self.index.N
        low = tuple(
            P.TermQ(t)
            for t in dict.fromkeys(q.terms)
            if t not in stats or stats[t][0] <= cutoff
        )
        high = tuple(
            P.TermQ(t)
            for t in dict.fromkeys(q.terms)
            if t in stats and stats[t][0] > cutoff
        )
        if not low:
            return P.BoolQ(must=high, boost=q.boost)
        return P.BoolQ(must=low, should=high, boost=q.boost)

    # ------------------------------------------------------------------
    # derived queries (MoreLikeThis, rescoring, suggest)
    # ------------------------------------------------------------------

    def more_like_this(self, doc_id: int, max_terms: int = 10,
                       **knobs) -> P.BoolQ:
        """MoreLikeThis (queries/mlt/MoreLikeThis.java:147): extract the
        doc's top-`max_terms` terms by tf*idf and build an OR query over
        them. Term freqs come from the stored term vectors when the
        index has them (MoreLikeThis.retrieveTerms(int) prefers
        getTermVector) — one doc_id-pruned read, no re-tokenize of a
        possibly-huge stored doc; else we re-analyze the stored text
        (the reference's stored-fields fallback). `knobs` are the
        reference setters — see `_mlt_from_tf`."""
        if self.index.manifest.get("with_term_vectors"):
            rows = self.index.term_vector(doc_id).select("term", "freq").collect()
            return self._mlt_from_tf({r["term"]: int(r["freq"]) for r in rows},
                                     max_terms, **knobs)
        row = (
            self.index.corpus.filter(F.col("doc_id") == doc_id)
            .select(self.index.manifest["text_col"])
            .collect()
        )
        if not row:
            return P.BoolQ()
        return self.mlt_from_text(row[0][0] or "", max_terms, **knobs)

    def mlt_from_text(self, text: str, max_terms: int = 10,
                      **knobs) -> P.BoolQ:
        """MoreLikeThis over arbitrary unseen text (MoreLikeThis.java
        like(String) path): top-`max_terms` terms by tf*idf as an OR
        query. `knobs` as in `_mlt_from_tf`."""
        from lucene_spark.analysis import analyze_query_text

        toks = analyze_query_text(text or "", analyzer=self.index.analyzer)
        if not toks:
            return P.BoolQ()
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        return self._mlt_from_tf(tf, max_terms, **knobs)

    def _mlt_from_tf(self, tf: dict[str, int], max_terms: int,
                     min_term_freq: int = 2, min_doc_freq: int = 5,
                     max_doc_freq: int | None = None,
                     min_word_len: int = 0, max_word_len: int = 0,
                     stop_words=None, boost: bool = False,
                     boost_factor: float = 1.0) -> P.BoolQ:
        """Shared MLT term selection, reference-exact knobs and formula:

        - source-token noise filters (MoreLikeThis.isNoiseWord): word
          shorter than `min_word_len` / longer than a non-zero
          `max_word_len` / in `stop_words` -> skipped;
        - createQueue filters (MoreLikeThis.java:622-662): tf <
          min_term_freq, df < min_doc_freq, df > max_doc_freq -> skipped
          (defaults 2/5/unbounded = DEFAULT_MIN_TERM_FREQ /
          DEFAULT_MIN_DOC_FREQ / DEFAULT_MAX_DOC_FREQ);
        - score = tf * idf with the reference's default
          ClassicSimilarity.idf = ln((N+1)/(df+1)) + 1
          (ClassicSimilarity.java:62); float64 + 6dp rounding pins the
          tie order the reference leaves to HashMap iteration;
        - `boost=True` (createQuery, MoreLikeThis.java:591-613): each
          selected TermQ gets weight boost_factor * score / bestScore,
          where bestScore is the score of the FIRST term popped from
          the ascending-score FreqQ — i.e. the LOWEST selected score, a
          reference quirk mirrored here (all boosts >= boost_factor).
        """
        tf = {
            t: f for t, f in tf.items()
            if (min_word_len <= 0 or len(t) >= min_word_len)
            and (max_word_len <= 0 or len(t) <= max_word_len)
            and (not stop_words or t not in stop_words)
            and (min_term_freq <= 0 or f >= min_term_freq)
        }
        if not tf:
            return P.BoolQ()
        stats = self.index.stats_for_terms(sorted(tf))
        n = self.index.doc_count
        scored = sorted(
            (
                # 6dp rounding pins the tie-break across libm variants
                (-round(tf[t] * (float(np.log((n + 1) / (stats[t][0] + 1.0)))
                                 + 1.0), 6), t)
                for t in tf
                if t in stats and stats[t][0] > 0
                and (min_doc_freq <= 0 or stats[t][0] >= min_doc_freq)
                and (max_doc_freq is None or stats[t][0] <= max_doc_freq)
            ),
        )[:max_terms]
        if not boost or not scored:
            return P.BoolQ(should=tuple(P.TermQ(t) for _, t in scored))
        best = max(neg for neg, _ in scored)  # least score = last popped
        return P.BoolQ(should=tuple(
            P.TermQ(t, boost=boost_factor * ((neg / best) if best else 1.0))
            for neg, t in scored
        ))

    def rescore(self, first: object, second: object, n: int,
                weight: float = 1.0) -> DataFrame:
        """QueryRescorer analog (search/QueryRescorer.java:62-80): take
        top-n of `first`, add weight * second-query score for docs that
        match `second` (missing => +0), re-sorted (score desc, docID
        asc). The second pass is candidate-bounded: the top-n docIDs are
        collected (n is small by contract) and pushed into the second
        query's leaf scorers, so it never scores — or shuffles — the
        whole index."""
        top = self.top_k(first, n).select("doc_id", F.col("score").alias("s1"))
        ids = [r["doc_id"] for r in top.select("doc_id").collect()]
        sec = self.scored(second, candidates=ids).select(
            "doc_id", F.col("score").alias("s2")
        )
        out = (
            F.broadcast(top)
            .join(sec, "doc_id", "left")
            .fillna({"s2": 0.0})
            .withColumn("score", F.col("s1") + F.lit(float(weight)) * F.col("s2"))
        )
        return out.select("doc_id", "score").orderBy(F.desc("score"), F.asc("doc_id"))

    def suggest(self, prefix: str, n: int = 10) -> DataFrame:
        """Prefix suggester (suggest/.../AnalyzingInfixSuggester.java:102
        shape): terms-dictionary scan LIKE 'p%' weighted by collection
        frequency. At scale the stats table is bucket-pruned Parquet;
        the LIKE pushes down to the scan."""
        stats = self.index.term_stats
        if self.index.has_field_column:
            stats = stats.filter(F.col("field") == self.index.resolve_field(None))
        return (
            stats.filter(F.col("term").startswith(prefix))
            .select("term", F.col("ttf").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term"))
            .limit(n)
        )

    def analyze(self, text: str) -> list[str]:
        """Query-side analysis with the INDEX's analyzer chain
        (util/QueryBuilder.java re-runs the analyzer on query text;
        synonym expansion stays index-time only)."""
        from lucene_spark.analysis import analyze_query_text

        return analyze_query_text(text, analyzer=self.index.analyzer)

    # ------------------------------------------------------------------
    # non-scoring doc sets
    # ------------------------------------------------------------------

    def doc_set(self, q) -> DataFrame:
        """Plan node -> distinct DataFrame(doc_id), no scores (FILTER path).

        With a query_cache installed, repeated filters serve a persisted
        doc set once the usage-tracking policy threshold clears
        (LRUQueryCache; IndexSearcher applies the cache exactly to this
        non-scoring Weight context)."""
        q = P.rewrite(q)
        if self.query_cache is not None:
            return self.query_cache.get_or_compute(
                q, lambda: self._doc_set_uncached(q)
            )
        return self._doc_set_uncached(q)

    def _doc_set_uncached(self, q) -> DataFrame:
        if isinstance(q, P.TermQ):
            return self._doc_rows([q.term], q.field).distinct()
        if isinstance(q, P.BlendedTermQ) and q.fields:
            # cross-field blend in filter context: a doc matches if ANY
            # (field, term) pair matches (BlendedTermQuery rewrites to a
            # disjunction over Term(field, text) pairs) — union per field.
            u = None
            for fld in q.fields:
                s = self._doc_rows(list(q.terms), fld)
                u = s if u is None else u.unionByName(s)
            return u.distinct()
        if isinstance(q, (P.SynonymQ, P.TermInSetQ, P.BlendedTermQ)):
            return self._doc_rows(list(q.terms), getattr(q, "field", None)).distinct()
        if isinstance(q, (P.PrefixQ, P.WildcardQ, P.RegexpQ)):
            return self._doc_rows_for_predicate(
                self._multiterm_pred(q), q.field
            ).distinct()
        if isinstance(q, P.FuzzyQ):
            # Same expansion set as the scored path (FuzzyTermsEnum with
            # transpositions honored + pushed pre-filters) — a plain
            # levenshtein predicate here would silently miss terms
            # reachable only via a transposition (Damerau 1 / Lev 2).
            terms = [t for t, _df, _b in self._fuzzy_expansions(q)]
            if not terms:
                return self.index.spark.createDataFrame([], _DOCS_SCHEMA)
            return self._doc_rows(terms, q.field).distinct()
        if isinstance(q, P.FuzzyLikeThisQ):
            terms = list(self._fuzzy_like_this_vars(q))
            if not terms:
                return self.index.spark.createDataFrame([], _DOCS_SCHEMA)
            return self._doc_rows(terms, q.field).distinct()
        if isinstance(q, P.TermRangeQ):
            return self._doc_rows_for_predicate(
                self._multiterm_pred(q), q.field
            ).distinct()
        if isinstance(q, P.FieldFilter):
            col = F.col(q.col)
            if q.op == "=":
                pred = col == q.value
            elif q.op == "in":
                pred = col.isin(list(q.value))
            elif q.op == "between":
                pred = col.between(q.value[0], q.value[1])
            elif q.op == "notnull":
                # class:* wildcard filter shape (KNearestNeighbor
                # Classifier.java knnSearch: docs with ANY class value)
                pred = col.isNotNull()
            else:
                raise ValueError(q.op)
            return self._live(self.index.docs.filter(pred).select("doc_id"))
        if isinstance(q, P.GeoBoxQ):
            from lucene_spark.geo import box_predicate

            pred = box_predicate(q.lat_col, q.lon_col, q.min_lat,
                                 q.max_lat, q.min_lon, q.max_lon)
            return self._live(self.index.docs.filter(pred).select("doc_id"))
        if isinstance(q, P.GeoDistanceQ):
            from lucene_spark.geo import distance_predicate

            pred = distance_predicate(q.lat_col, q.lon_col, q.lat, q.lon,
                                      q.radius_m)
            return self._live(self.index.docs.filter(pred).select("doc_id"))
        if isinstance(q, P.ShapeQ):
            from lucene_spark.geo_shape import shape_relation_predicate

            pred = shape_relation_predicate(
                q.lats_col, q.lons_col, q.polygon, q.relation, q.holes,
                q.kind,
            )
            return self._live(self.index.docs.filter(pred).select("doc_id"))
        if isinstance(q, P.MatchAllQ):
            return self._live(self.index.docs.select("doc_id"))
        if isinstance(q, (P.ConstScoreQ, P.BoostQ)):
            return self.doc_set(q.inner)
        if isinstance(q, (P.PhraseQ, P.MultiPhraseQ)):
            return self._phrase_scored(q).select("doc_id")
        if isinstance(q, P.PhraseWildcardQ):
            mp = self._phrase_wildcard_multiphrase(q)
            if mp is None:
                return self.index.spark.createDataFrame([], _DOCS_SCHEMA)
            return self._phrase_scored(mp).select("doc_id")
        if isinstance(q, P.TermAutomatonQ):
            return self._term_automaton_scored(q).select("doc_id")
        if isinstance(q, P.CommonTermsQ):
            return self.doc_set(self._rewrite_common_terms(q))
        if isinstance(q, P.IntervalQ):
            return self._interval_scored(q).select("doc_id")
        if isinstance(q, P.FeatureQ):
            return self._live(
                self.index.docs.filter(F.col(q.col).isNotNull()).select("doc_id")
            )
        if isinstance(q, P.DistanceFeatureQ):
            return self._live(
                self.index.docs.filter(F.col(q.col).isNotNull()).select("doc_id")
            )
        if isinstance(q, P.GeoDistanceFeatureQ):
            return self._live(
                self.index.docs.filter(
                    F.col(q.lat_col).isNotNull()
                    & F.col(q.lon_col).isNotNull()
                ).select("doc_id")
            )
        if isinstance(q, P.BoolQ):
            base = None
            for c in list(q.must) + list(q.filter):
                s = self.doc_set(c)
                base = s if base is None else base.join(s, "doc_id", "left_semi")
            if base is None and q.should:
                u = None
                for c in q.should:
                    s = self.doc_set(c)
                    u = s if u is None else u.unionByName(s)
                base = u.distinct()
            if base is None:
                return self.index.spark.createDataFrame([], _DOCS_SCHEMA)
            for c in q.must_not:
                base = base.join(self.doc_set(c), "doc_id", "left_anti")
            return base
        raise TypeError(f"unsupported query node: {q!r}")

    # ------------------------------------------------------------------
    # collectors
    # ------------------------------------------------------------------

    def top_k(self, q, k: int, field_filters: tuple = ()) -> DataFrame:
        """Top-k by (score desc, docID asc) — TopScoreDocCollector +
        HitQueue tie-break (search/HitQueue.java:78-84). Spark physical
        plan: per-partition top-k + driver merge (TakeOrderedAndProject),
        exactly the CollectorManager reduce contract
        (IndexSearcher.java:660-712).

        Boolean queries whose scoring clauses are all plain terms route
        through the block-max WAND path (_bool_topk_wand) when pruning
        is enabled — identical results, bounded decode."""
        q = P.rewrite(q)
        if not field_filters and isinstance(q, P.BoolQ) and self.prune_enabled:
            wand = self._bool_topk_wand(q, k)
            if wand is not None:
                return wand
        scored = self.scored(q, k=k)
        for ff in field_filters:
            scored = scored.join(self.doc_set(ff), "doc_id", "left_semi")
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def top_k_batch(self, queries: dict[str, object], k: int) -> DataFrame:
        """Run MANY top-k queries as ONE Spark job:
        DataFrame(query_id, doc_id, score, rank), rank 1..k per query by
        (score desc, docID asc) — the same HitQueue contract as top_k.

        Why: a query suite executed one .collect() at a time pays the
        fixed job overhead (planning, scheduling, stage launch) per
        query; at local[N] that floor does not parallelize, which is
        what capped the measured N->4N query-suite scaling. Union-ing
        the scored plans under a single action lets Spark run every
        query's stages concurrently across all cores and pay the
        scheduling floor once per BATCH. This is the search-side twin of
        IndexSearcher's CollectorManager reduce: per-query collectors
        run independently, one reduce at the end
        (IndexSearcher.java:660-712).

        Block-max WAND pruning stays on per query (same routing as
        top_k); its θ-sampling and candidate-verification driver jobs
        are BATCHED across queries too (one tagged union action each)
        so they never serialize the suite. The per-query limit is a
        row_number window partitioned by query_id — one shuffle of at
        most ~(candidates) rows, and WAND-pruned queries contribute
        only their surviving blocks."""
        from pyspark.sql.window import Window

        rewritten = {qid: P.rewrite(q) for qid, q in queries.items()}
        wand_st = {}
        if self.prune_enabled:
            for qid, qr in rewritten.items():
                if isinstance(qr, P.BoolQ):
                    st = self._wand_state(qr, k)
                    if st is not None:
                        wand_st[qid] = st
        live = {qid: st for qid, st in wand_st.items() if st != "empty"}

        # ---- batched WAND pass 1: every query's θ samples, ONE action ----
        samples_by_qid: dict[str, list] = {qid: [] for qid in live}
        if live:
            u = None
            for qid, st in live.items():
                p = self._wand_sample_plan(st, k).select(
                    F.lit(qid).alias("query_id"), "doc_id", "score"
                )
                u = p if u is None else u.unionByName(p)
            for r in u.collect():
                samples_by_qid[r["query_id"]].append(r)

        # ---- batched θ verification: ONE action across queries ----
        verified_by_qid: dict[str, list] = {}
        vplans = None
        for qid, st in live.items():
            if self._wand_needs_verify(st):
                verified_by_qid[qid] = []
                ids = list({r["doc_id"] for r in samples_by_qid[qid]})
                vp = self.scored(rewritten[qid], candidates=ids).select(
                    F.lit(qid).alias("query_id"), "score"
                )
                vplans = vp if vplans is None else vplans.unionByName(vp)
        if vplans is not None:
            for r in vplans.collect():
                verified_by_qid[r["query_id"]].append(float(r["score"]))

        parts = []
        for qid, qr in rewritten.items():
            scored = None
            st = wand_st.get(qid)
            if st == "empty":
                scored = self._empty_scored().limit(k)
            elif st is not None:
                theta = self._wand_theta(
                    st, k, samples_by_qid[qid], verified_by_qid.get(qid)
                )
                scored = self._wand_pruned_plan(st, theta, k)
            if scored is None:
                scored = self.scored(qr, k=k)
            parts.append(
                scored.select(
                    F.lit(qid).alias("query_id"), "doc_id", "score"
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            u.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def top_field(self, q, sort: list[tuple[str, bool]], k: int,
                  missing: dict | None = None) -> DataFrame:
        """TopFieldCollector with a MULTI-field Sort
        (search/TopFieldCollector.java:58, search/Sort.java,
        search/SortField.java): top-k of the matching docs ordered by
        each (docs-table column, reverse) SortField analog in turn,
        final tie-break docID asc (FieldValueHitQueue comparator
        cascade). ``missing`` maps column -> substituted value for null
        docs (SortField.setMissingValue); unsubstituted nulls sort
        first ascending / last descending.

        Physical plan: the doc-set semi-joins a pruned docs projection,
        then ONE TakeOrderedAndProject — per-partition top-k + driver
        merge, never a global sort."""
        cols = [c for c, _ in sort]
        base = self.doc_set(q).join(
            self.index.docs.select("doc_id", *cols), "doc_id"
        )
        order = []
        for c, reverse in sort:
            col = F.col(c)
            if missing and c in missing:
                col = F.coalesce(col, F.lit(missing[c]))
            order.append(
                col.desc_nulls_last() if reverse else col.asc_nulls_first()
            )
        order.append(F.asc("doc_id"))
        return base.orderBy(*order).limit(k).select("doc_id", *cols)

    def top_field_after(self, q, sort: list[tuple[str, bool]], k: int,
                        after_values: list, after_doc: int) -> DataFrame:
        """Field-sort pagination — TopFieldCollector.create(sort, n,
        after=FieldDoc, ...) (search/TopFieldCollector.java PagingField
        Collector): resume strictly after the (sort values, docID) mark
        in lexicographic sort order. The after predicate is a pure
        column expression, so Catalyst can push it into the docs scan
        (parquet row-group pruning on the sort column)."""
        cols = [c for c, _ in sort]
        base = self.doc_set(q).join(
            self.index.docs.select("doc_id", *cols), "doc_id"
        )
        pred = F.lit(False)
        eq = F.lit(True)
        for (c, reverse), v in zip(sort, after_values):
            col = F.col(c)
            pred = pred | (eq & ((col < F.lit(v)) if reverse else (col > F.lit(v))))
            eq = eq & (col == F.lit(v))
        pred = pred | (eq & (F.col("doc_id") > int(after_doc)))
        order = []
        for c, reverse in sort:
            order.append(F.col(c).desc() if reverse else F.col(c).asc())
        order.append(F.asc("doc_id"))
        return (
            base.filter(pred).orderBy(*order).limit(k)
            .select("doc_id", *cols)
        )

    # ------------------------------------------------------------------
    # block-max WAND for boolean top-k
    # ------------------------------------------------------------------

    def _bool_topk_wand(self, q: P.BoolQ, k: int) -> DataFrame | None:
        """Block-max WAND / block-max conjunction for top-k boolean
        queries over plain term clauses (search/WANDScorer.java:38-140,
        search/BlockMaxConjunctionScorer.java, MaxScoreCache.java).

        Distributed shape (one decode scan + two tiny driver jobs):
        1. θ_lb — a sound lower bound on the k-th best total score:
           per-clause top-k (single-term block-max pruned, one job),
           then exact totals for that candidate union (candidate-bounded
           scored(), second tiny job; skipped for pure disjunctions where
           driver-side partial sums already lower-bound totals). The k-th
           best verified total ≤ true k-th best, so pruning on it is safe.
        2. salt-level cross-clause bounds — one column-pruned read of
           (term, salt, row_impacts): salt_max[t][s] = max possible score
           of t in docID shard s (no block bytes touched).
        3. pruned decode — a block of term t in salt s is skipped when
           block_max(t) + Σ_{t'≠t} salt_max[t'][s] < θ_lb (WAND upper
           bound); for conjunctions a salt missing ANY must term is
           skipped wholesale (BlockMaxConjunction advance). Every true
           top-k doc's blocks survive (its total ≥ θ_lb ≤ every covering
           block's bound), so results are identical to the unpruned plan.

        Returns None when the shape doesn't apply (non-term clauses,
        overlapping term sets, index without row_impacts).

        Staged as _wand_state -> _wand_sample_plan (pass-1 collect) ->
        optional candidate verification -> _wand_theta ->
        _wand_pruned_plan so top_k_batch can run EVERY query's θ
        sampling (and verification) as one tagged union action instead
        of serial per-query driver jobs."""
        st = self._wand_state(q, k)
        if st is None:
            return None
        if st == "empty":
            return self._empty_scored().limit(k)
        # θ as a PLAN, not a collected value: the sample union (and the
        # candidate-bounded verification when the shape requires it)
        # reduces to a one-row {__theta} DataFrame that the pruned
        # decode consumes via a broadcast cross join. The whole query is
        # then ONE Spark action — no θ driver round-trips at all — which
        # is what bounds sequential query scaling (the per-action floor:
        # Catalyst analysis + py4j + scheduling do not parallelize with
        # cores; BENCH_scaling query_scaling_efficiency). Round 3 had
        # already fused sampling+verification (3 actions -> 2); this
        # folds the remaining θ collect into the final plan (2 -> 1).
        sample_plan = self._wand_sample_plan(st, k)
        if self._wand_needs_verify(st):
            # exact totals for the sampled candidates (must/msm/filter/
            # must_not shapes): the k-th best verified total ≤ true k-th
            totals = self.scored(q, candidates=sample_plan).select(
                F.col("score").alias("__tot")
            )
        else:
            # pure disjunction: per-doc partial sums over the per-term
            # top-k samples already lower-bound the true totals
            totals = sample_plan.groupBy("doc_id").agg(
                F.sum("score").alias("__tot")
            )
        theta_df = (
            totals.orderBy(F.desc("__tot"))
            .limit(k)
            .agg(
                F.when(F.count(F.lit(1)) >= k, F.min("__tot"))
                .otherwise(F.lit(float("-inf")))
                .alias("__t0")
            )
            # same soundness shave as _wand_theta: partial sums /
            # reassociated float adds can overshoot stored totals by ulps
            .select(
                (
                    F.col("__t0")
                    - F.abs(F.col("__t0")) * F.lit(1e-9)
                    - F.lit(1e-12)
                ).alias("__theta")
            )
        )
        return self._wand_pruned_plan(st, theta_df, k)

    def _wand_state(self, q: P.BoolQ, k: int):
        """Shape check + stats lookup for the WAND path. Returns None
        (shape doesn't apply -> plain path), "empty" (provably no
        hits), or the state dict the later stages consume."""
        if not (q.must or q.should):
            return None
        if not all(
            isinstance(c, P.TermQ) and c.field is None for c in q.must + q.should
        ):
            return None  # non-term or field-scoped clauses: plain path
        must_t = [(c.term, c.boost) for c in q.must]
        should_t = [(c.term, c.boost) for c in q.should]
        all_terms = [t for t, _ in must_t + should_t]
        if len(set(all_terms)) != len(all_terms):
            return None  # duplicate/overlapping terms: fall back
        if "row_impacts" not in self.index.postings.columns:
            return None
        stats = self.index.stats_for_terms(all_terms)
        if any(t not in stats for t, _ in must_t):
            return "empty"
        should_t = [(t, b) for t, b in should_t if t in stats]
        msm = q.min_should_match
        if not must_t and len(should_t) < max(1, msm):
            return "empty"
        weights = {
            t: self._weight(stats[t][0], b, ttf=stats[t][1])
            for t, b in must_t + should_t
        }
        if len(weights) < 2:
            return None  # single-term: the plain path already prunes
        if sum(stats[t][0] for t in weights) < self.wand_min_postings:
            return None  # decode too small to amortize θ round-trips
        return {
            "q": q,
            "weights": weights,
            "terms": list(weights),
            "must_set": frozenset(t for t, _ in must_t),
            "should_set": frozenset(t for t, _ in should_t),
            "msm": msm,
        }

    def _wand_sample_plan(self, st, k: int) -> DataFrame:
        """Pass 1 plan: union of per-term top-k (single-term block-max
        pruned) — the θ_lb candidate sample."""
        weights = st["weights"]
        union = None
        for t in st["terms"]:
            tk = (
                self._scored_term_rows({t: weights[t]}, k)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
            )
            union = tk if union is None else union.unionByName(tk)
        return union

    def _wand_needs_verify(self, st) -> bool:
        q = st["q"]
        return bool(q.must or st["msm"] > 1 or q.filter or q.must_not)

    def _wand_theta(self, st, k: int, samples, verified) -> float:
        """θ_lb from the pass-1 samples; ``verified`` is the exact
        candidate-bounded score list when the query shape requires it
        (must/msm/filter/must_not), else None and driver-side partial
        sums already lower-bound the totals."""
        theta = -np.inf
        if verified is not None:
            vs = sorted(verified, reverse=True)
            if len(vs) >= k:
                theta = float(vs[k - 1])
        else:
            partial: dict[int, float] = {}
            for r in samples:
                partial[r["doc_id"]] = partial.get(r["doc_id"], 0.0) + r["score"]
            tots = sorted(partial.values(), reverse=True)
            if len(tots) >= k:
                theta = float(tots[k - 1])
        if np.isfinite(theta):
            # shave a hair off θ: partial sums / reassociated float adds
            # can overshoot the engine's stored totals by ulps — keep the
            # bound strictly sound (costs ~nothing in pruning power)
            theta -= 1e-9 * abs(theta) + 1e-12
        return float(theta)

    def _wand_pruned_plan(self, st, theta, k: int) -> DataFrame:
        """Passes 2+3 (see _bool_topk_wand): distributive salt-level
        cross-clause bounds, then the pruned decode scan + assembly.

        ``theta``: either a driver float (top_k_batch's batched θ passes)
        or a one-row {__theta} DataFrame fused into the scan as a
        broadcast cross join (single-query path — keeps the whole query
        one Spark action)."""
        q = st["q"]
        weights = st["weights"]
        terms = st["terms"]
        must_set = st["must_set"]
        should_set = st["should_set"]
        msm = st["msm"]

        # ---- pass 2: salt-level upper bounds (metadata-only read) ----
        scoring = self.scoring
        sim = self.sim
        sim_score = self._sim_score() if sim is not None else None
        cache_f32 = self.index.cache_f32
        avgdl_dbl = self.index.avgdl_dbl

        def imp_max(impacts, w) -> float:
            f = np.array([p["freq"] for p in impacts], dtype=np.float32)
            nm = np.array([p["norm"] for p in impacts], dtype=np.int64)
            if len(f) == 0:
                return 0.0
            if sim is not None:
                return float(np.max(sim_score(f, LENGTH_TABLE[nm & 0xFF], w)))
            if scoring == "lucene":
                return float(np.max(bm25.score(f, nm, np.float32(w), cache_f32)))
            return float(
                np.max(bm25.score_double(f, LENGTH_TABLE[nm & 0xFF], w, avgdl_dbl))
            )

        weights_b = dict(weights)

        @F.pandas_udf(T.DoubleType())
        def row_max_udf(term: pd.Series, imps: pd.Series) -> pd.Series:
            out = []
            for t, arr in zip(term, imps):
                if arr is None or len(arr) == 0:
                    # pre-upgrade segment rows (reader unions with
                    # allowMissingColumns): bound unknown -> +inf, never
                    # 0.0, or pruning would silently drop their blocks
                    out.append(np.inf)
                else:
                    out.append(imp_max(arr, weights_b[t]))
            return pd.Series(out)

        # ---- pass 2: salt-level upper bounds, computed DISTRIBUTIVELY ----
        # Per-row max score executor-side (column-pruned read, no block
        # bytes), reduced to one scalar per (term, salt), then per-salt
        # cross-clause aggregates. Nothing is collected to the driver:
        # at 10^10 docs the (term, salt) metadata is millions of rows,
        # which pass 3 consumes via a join (AQE broadcasts it when small).
        cache_key = frozenset(weights.items())
        bounds = self._wand_meta_cache.get(cache_key)
        if bounds is not None:
            self._wand_meta_cache.move_to_end(cache_key)
        else:
            light = self.index.postings_for_terms(terms).select(
                "term", "salt", "row_impacts"
            )
            ts_max = (
                light.withColumn("m_ts", row_max_udf("term", "row_impacts"))
                .groupBy("term", "salt")
                .agg(F.max("m_ts").alias("m_ts"))
            )
            must_lc = sorted(must_set)
            salt_agg = ts_max.groupBy("salt").agg(
                F.sum("m_ts").alias("salt_total"),
                F.count(
                    F.when(F.col("term").isin(must_lc), F.lit(1))
                ).alias("must_cnt"),
            )
            bounds = (
                ts_max.join(salt_agg, "salt")
                .select(
                    "term",
                    "salt",
                    "m_ts",
                    (F.col("salt_total") - F.col("m_ts")).alias("others"),
                    "must_cnt",
                )
                .persist()
            )
            self._wand_meta_cache[cache_key] = bounds
            while len(self._wand_meta_cache) > self.WAND_META_CACHE_MAX:
                _, evicted = self._wand_meta_cache.popitem(last=False)
                evicted.unpersist()
        n_must = len(must_set)

        # ---- pass 3: pruned decode scan (bounds joined in, not collected) ----
        rows = self.index.postings_for_terms(terms).join(
            bounds, ["term", "salt"], "left"
        )
        theta_is_df = isinstance(theta, DataFrame)
        if theta_is_df:
            # one-row broadcast: every decode row carries __theta; the
            # sample/verify subtree executes inside this same action
            rows = rows.crossJoin(F.broadcast(theta))
            theta_f = None
        else:
            theta_f = float(theta)

        def fn(iterator):
            for pdf in iterator:
                if theta_is_df:
                    if not len(pdf):
                        continue
                    th = float(pdf["__theta"].iat[0])
                else:
                    th = theta_f
                parts = []
                for row in pdf.itertuples(index=False):
                    t = row.term
                    if (
                        n_must
                        and pd.notna(row.must_cnt)
                        and int(row.must_cnt) < n_must
                    ):
                        continue  # conjunction impossible in this shard
                    # inf - inf = NaN in the others column; NaN / missing
                    # bound rows mean "unknown" -> no pruning (sound)
                    others = row.others
                    if pd.isna(others):
                        others = np.inf
                    own = row.m_ts if pd.notna(row.m_ts) else np.inf
                    w = weights_b[t]
                    for blk in row.blocks:
                        bmax = (
                            imp_max(blk["impacts"], w)
                            if len(blk["impacts"])
                            else own
                        )
                        if bmax + others < th:
                            continue
                        d, f, nm = decode_block(blk)
                        if sim is not None:
                            qdl = LENGTH_TABLE[nm.astype(np.int64) & 0xFF]
                            sc = sim_score(f, qdl, w)
                        elif scoring == "lucene":
                            sc = bm25.score(f, nm, np.float32(w), cache_f32).astype(
                                np.float64
                            )
                        else:
                            qdl = LENGTH_TABLE[nm.astype(np.int64) & 0xFF]
                            sc = bm25.score_double(f, qdl, w, avgdl_dbl)
                        parts.append(
                            pd.DataFrame(
                                {"doc_id": d, "term": t, "score": sc}
                            )
                        )
                if parts:
                    yield pd.concat(parts)

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("term", T.StringType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        decoded = self._live(rows.mapInPandas(fn, schema=schema))

        # ---- assembly (same combine semantics as _bool_scored) ----
        in_must = F.col("term").isin(list(must_set)) if must_set else F.lit(False)
        in_should = F.col("term").isin(list(should_set)) if should_set else F.lit(False)
        agg = decoded.groupBy("doc_id").agg(
            F.sum(F.when(in_must, F.col("score"))).alias("m_sum"),
            F.count(F.when(in_must, F.lit(1))).alias("m_cnt"),
            F.sum(F.when(in_should, F.col("score"))).alias("s_sum"),
            F.count(F.when(in_should, F.lit(1))).alias("s_cnt"),
        )
        if must_set:
            agg = agg.filter(F.col("m_cnt") == len(must_set))
        eff_msm = msm
        if not must_set and eff_msm < 1:
            eff_msm = 1
        if should_set and eff_msm > 0:
            if must_set and msm == 0:
                pass  # optional should
            else:
                agg = agg.filter(F.col("s_cnt") >= eff_msm)
        if must_set and should_set:
            s_part = F.coalesce(F.col("s_sum"), F.lit(0.0))
            if self.scoring == "lucene":
                s_part = s_part.cast("float").cast("double")
                total = (F.col("m_sum") + s_part).cast("float").cast("double")
            else:
                total = F.col("m_sum") + s_part
        elif must_set:
            total = F.col("m_sum")
            if len(must_set) > 1 and self.scoring == "lucene":
                total = total.cast("float").cast("double")
        else:
            total = (
                F.col("s_sum").cast("float").cast("double")
                if self.scoring == "lucene"
                else F.col("s_sum")
            )
        combined = agg.select("doc_id", total.alias("score"))
        for c in q.filter:
            combined = combined.join(self.doc_set(c), "doc_id", "left_semi")
        for c in q.must_not:
            combined = combined.join(self.doc_set(c), "doc_id", "left_anti")
        if q.boost != 1.0:
            if self.scoring == "lucene":
                combined = combined.withColumn(
                    "score",
                    (
                        F.col("score").cast("float")
                        * F.lit(np.float32(q.boost)).cast("float")
                    ).cast("double"),
                )
            else:
                combined = combined.withColumn(
                    "score", F.col("score") * F.lit(float(q.boost))
                )
        return combined.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_after(self, q, k: int, after_score: float, after_doc: int,
                     field_filters: tuple = ()) -> DataFrame:
        """Cursor pagination (IndexSearcher.searchAfter:470-520): resume
        strictly below the (score, docID) mark."""
        scored = self.scored(q)
        for ff in field_filters:
            scored = scored.join(self.doc_set(ff), "doc_id", "left_semi")
        below = (F.col("score") < after_score) | (
            (F.col("score") == after_score) & (F.col("doc_id") > after_doc)
        )
        return scored.filter(below).orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _term_doc_freq_norm(self, term: str, field, doc_id: int):
        """(freq, norm) of one (term, doc) from the postings, or None.
        Salt + bucket predicates prune the scan to one row."""
        rows = (
            self.index.postings_for_terms([term], field)
            .filter(F.col("salt") == doc_id // self.index.salt_rows)
            .select("blocks")
            .collect()
        )
        for row in rows:
            for blk in row["blocks"]:
                if blk["first_docid"] <= doc_id <= blk["last_docid"]:
                    d, f, nm = decode_block(blk)
                    i = int(np.searchsorted(d, doc_id))
                    if i < len(d) and d[i] == doc_id:
                        return int(f[i]), int(nm[i])
        return None

    def explain(self, q, doc_id: int) -> dict:
        """Explanation analog (search/Explanation.java, IndexSearcher
        .explain): nested {value, description, details} whose root value
        equals the engine's score for this doc bit-for-bit (the
        components are computed with the same bm25 arithmetic as the
        decode UDF, in the searcher's scoring mode)."""
        q = P.rewrite(q)
        # non-matches carry a structured matched=False marker (Lucene
        # Explanation.noMatch analog) — parents must NOT sniff description
        # strings, a nested failed MUST reports a different description
        NO = {"value": 0.0, "description": "no matching term",
              "details": [], "matched": False}
        if isinstance(q, P.TermQ):
            stats = self.index.stats_for_terms([q.term], q.field)
            if q.term not in stats:
                return NO
            fn = self._term_doc_freq_norm(q.term, q.field, doc_id)
            if fn is None:
                return NO
            freq, norm = fn
            df = stats[q.term][0]
            dc = self.index.doc_count_for(q.field)
            w = self._weight(df, q.boost, q.field, ttf=stats[q.term][1])
            val = float(
                self._score_arrays(
                    np.array([freq]), np.array([norm]), w
                )[0]
            )
            dl = float(LENGTH_TABLE[norm & 0xFF])
            return {
                "value": val,
                "description": (
                    f"weight({q.term} in {doc_id}) [BM25], product of:"
                ),
                "details": [
                    {"value": float(q.boost), "description": "boost",
                     "details": []},
                    {"value": float(w) / float(q.boost),
                     "description": f"idf, n={df}, N={dc}", "details": []},
                    {"value": val / float(w),
                     "description": (
                         f"tf, freq={freq}, k1={bm25.K1}, b={bm25.B}, "
                         f"dl={dl}, avgdl={self.index.avgdl_dbl_for(q.field)}"
                     ),
                     "details": []},
                ],
            }
        if isinstance(q, P.BoostQ):
            inner = self.explain(q.inner, doc_id)
            if not inner.get("matched", True):
                return {"value": 0.0,
                        "description": f"boost {q.boost}, no match",
                        "details": [inner], "matched": False}
            val = inner["value"] * q.boost
            if self.scoring == "lucene":
                val = float(np.float32(inner["value"]) * np.float32(q.boost))
            return {
                "value": val,
                "description": f"boost {q.boost}, product of:",
                "details": [inner],
            }
        if isinstance(q, P.ConstScoreQ):
            hit = self.doc_set(q.inner).filter(
                F.col("doc_id") == doc_id
            ).count()
            return (
                {"value": float(q.boost),
                 "description": "ConstantScore", "details": []}
                if hit else NO
            )
        if isinstance(q, P.BoolQ):
            must = [self.explain(c, doc_id) for c in q.must]
            should = [self.explain(c, doc_id) for c in q.should]
            if any(not m.get("matched", True) for m in must):
                return {"value": 0.0,
                        "description": "failure to meet MUST clause",
                        "details": must, "matched": False}
            for c in q.must_not:
                if self.doc_set(c).filter(F.col("doc_id") == doc_id).count():
                    return {"value": 0.0,
                            "description": "match on prohibited clause",
                            "details": [], "matched": False}
            for c in q.filter:
                if not self.doc_set(c).filter(
                    F.col("doc_id") == doc_id
                ).count():
                    return {"value": 0.0,
                            "description": "failure to meet FILTER clause",
                            "details": [], "matched": False}
            matching = [m for m in must] + [
                s for s in should if s.get("matched", True)
            ]
            n_should = sum(1 for s in should if s.get("matched", True))
            if q.min_should_match and n_should < q.min_should_match:
                return {"value": 0.0,
                        "description": "failure to meet minShouldMatch",
                        "details": [], "matched": False}
            if not matching:
                return {"value": 0.0, "description": "no matching clause",
                        "details": must + should, "matched": False}
            val = float(np.sum([m["value"] for m in matching], dtype=np.float64))
            return {"value": val, "description": "sum of:",
                    "details": matching}
        if isinstance(q, P.DisMaxQ):
            ds = [self.explain(c, doc_id) for c in q.clauses]
            hits = [d for d in ds if d.get("matched", True)]
            if not hits:
                return NO
            vals = [d["value"] for d in hits]
            mx = max(vals)
            val = mx + q.tiebreak * (sum(vals) - mx)
            return {
                "value": float(val),
                "description": f"max plus {q.tiebreak} times others of:",
                "details": hits,
            }
        if isinstance(q, P.DistanceFeatureQ):
            # LongDistanceFeatureQuery.java:105-125 explain: weight /
            # pivotDistance / origin / current value as details
            row = self.index.docs.filter(
                F.col("doc_id") == doc_id
            ).select(q.col).collect()
            if not row or row[0][0] is None:
                return {
                    "value": 0.0,
                    "description": (
                        f"Document {doc_id} doesn't have a value "
                        f"for field {q.col}"
                    ),
                    "details": [], "matched": False,
                }
            value = float(row[0][0])
            dist = abs(value - float(q.origin))
            val = float(q.boost) * (
                float(q.pivot) / (float(q.pivot) + dist)
            )
            if self.scoring == "lucene":
                val = float(np.float32(val))
            return {
                "value": val,
                "description": (
                    "Distance score, computed as weight * pivotDistance"
                    " / (pivotDistance + abs(value - origin)) from:"
                ),
                "details": [
                    {"value": float(q.boost), "description": "weight",
                     "details": []},
                    {"value": float(q.pivot),
                     "description": "pivotDistance", "details": []},
                    {"value": float(q.origin), "description": "origin",
                     "details": []},
                    {"value": value, "description": "current value",
                     "details": []},
                ],
            }
        if isinstance(q, P.GeoDistanceFeatureQ):
            # LatLonPointDistanceFeatureQuery.java:119-140 explain:
            # weight / pivotDistance / originLat / originLon / current
            # lat / current lon / computed distance as details; docs
            # with either coordinate missing explain as no-match.
            from lucene_spark.geo import haversine_meters_py

            row = self.index.docs.filter(
                F.col("doc_id") == doc_id
            ).select(q.lat_col, q.lon_col).collect()
            if (
                not row
                or row[0][0] is None
                or row[0][1] is None
            ):
                return {
                    "value": 0.0,
                    "description": (
                        f"Document {doc_id} doesn't have a value "
                        f"for fields {q.lat_col},{q.lon_col}"
                    ),
                    "details": [], "matched": False,
                }
            cur_lat, cur_lon = float(row[0][0]), float(row[0][1])
            dist = haversine_meters_py(cur_lat, cur_lon, q.lat, q.lon)
            val = float(q.boost) * (
                float(q.pivot_m) / (float(q.pivot_m) + dist)
            )
            if self.scoring == "lucene":
                val = float(np.float32(val))
            return {
                "value": val,
                "description": (
                    "Distance score, computed as weight * pivotDistance"
                    " / (pivotDistance + distance) from:"
                ),
                "details": [
                    {"value": float(q.boost), "description": "weight",
                     "details": []},
                    {"value": float(q.pivot_m),
                     "description": "pivotDistance", "details": []},
                    {"value": float(q.lat), "description": "originLat",
                     "details": []},
                    {"value": float(q.lon), "description": "originLon",
                     "details": []},
                    {"value": cur_lat, "description": "current lat",
                     "details": []},
                    {"value": cur_lon, "description": "current lon",
                     "details": []},
                    {"value": float(dist), "description": "distance",
                     "details": []},
                ],
            }
        # generic fallback: score the query, pick this doc
        row = (
            self.scored(q)
            .filter(F.col("doc_id") == doc_id)
            .collect()
        )
        if not row:
            return NO
        return {"value": float(row[0]["score"]),
                "description": "score", "details": []}

    def count(self, q) -> int:
        """TotalHitCountCollector analog, with the Weight#count fast
        paths (search/Weight.java:180-210, TermQuery.java count(),
        MatchAllDocsQuery count()): when the index has no deletes, a
        term's hit count IS its df from the (memoized, collected-once)
        stats table and MatchAll's is maxDoc — O(1), no postings scan.
        Everything else falls back to the distributed doc-set count."""
        qr = P.rewrite(q)
        if self._deletes is None:
            if isinstance(qr, P.MatchAllQ):
                return int(self.index.N)
            if isinstance(qr, P.TermQ):
                stats = self.index.stats_for_terms([qr.term], qr.field)
                return int(stats[qr.term][0]) if qr.term in stats else 0
        return self.doc_set(qr).count()
