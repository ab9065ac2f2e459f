"""Pluggable similarities beyond the default BM25.

Replicates the scoring contracts of the reference's similarity zoo
(`lucene/core/src/java/org/apache/lucene/search/similarities/`):

- ClassicSimilarity (TFIDF: ClassicSimilarity.java:38-64,
  TFIDFSimilarity.java:461-503): idf = ln((N+1)/(df+1)) + 1,
  score = sqrt(freq) * boost*idf * 1/sqrt(qdl) where qdl is the
  SmallFloat-quantized doc length decoded from the norm byte
  (the normTable built at TFIDFSimilarity.java:467-473).
- BooleanSimilarity (BooleanSimilarity.java:58-60): score = boost.
- LMDirichletSimilarity (LMDirichletSimilarity.java:70-74, mu=2000
  default): score = boost * (ln(1 + freq/(mu*P)) + ln(mu/(dl+mu))),
  P = (ttf+1)/(sumTtf+1) (LMSimilarity.DefaultCollectionModel,
  LMSimilarity.java:145-147).
- LMJelinekMercerSimilarity (LMJelinekMercerSimilarity.java:61-67):
  score = boost * ln(1 + ((1-lambda)*freq/dl) / (lambda*P)).
- DFISimilarity (DFISimilarity.java:56-67): expected =
  (ttf+1)*dl/(sumTtf+1); 0 when freq <= expected, else
  boost * log2(independence(freq, expected) + 1) with the
  ChiSquared / Standardized / Saturated measures
  (IndependenceChiSquared.java:34 etc.).
- DFRSimilarity (DFRSimilarity.java:103-108) with basic models
  G / I(F) / I(n) / I(ne) (BasicModelG.java:31-46 ...), after
  effects B / L (AfterEffectB.java:32-35, AfterEffectL.java:32-33)
  and normalizations H1 / H2 / H3 / Z
  (NormalizationH1.java:57, NormalizationH2.java:58, ...).
- IBSimilarity (IBSimilarity.java:93-96) with distributions LL / SPL
  (DistributionLL.java:34, DistributionSPL.java:46-58), lambdas
  DF / TTF (LambdaDF.java:33-38, LambdaTTF.java:33-39) and the same
  normalizations.

All are SimilarityBase-style `score(stats, freq, docLen)` models
(SimilarityBase.java:218-225): docLen is the LENGTH_TABLE-decoded
quantized length, avgFieldLength = sumTtf / docCount. We compute in
float64 (the reference computes the inner formula in double and casts
the final value to float; our DuckDB oracles compare at 4 decimal
places, where the two agree). The float32 bit-parity guarantee of the
engine applies to the default BM25 only — a documented deviation.

Every model here is monotone non-decreasing in freq and non-increasing
in docLen, the invariant impacts-based block-max pruning requires
(Similarity.java class javadoc "scores should not decrease when freq
increases / norm gets larger"), so `Searcher`'s block-max machinery
stays valid for all of them.

Weight params are plain tuples so they ride inside the existing
``terms_weights`` dicts into the decode UDF closures unchanged.
"""

from __future__ import annotations

import math

import numpy as np

LN2 = math.log(2.0)


def _log2(x):
    return np.log(x) / LN2


class Similarity:
    """Per-term weight params + vectorized double-precision scorer.

    ``weight`` precomputes everything derivable from global stats
    (createWeight-time work); ``score`` is the SimScorer hot path over
    numpy arrays of (freq, quantized-doc-length).
    """

    name: str = "?"
    supports_combined = False

    def weight(self, df: int, ttf: int, doc_count: int, sum_ttf: int,
               boost: float) -> tuple:
        raise NotImplementedError

    def combined_weight(self, stats: list[tuple[int, int]], doc_count: int,
                        sum_ttf: int, boost: float) -> tuple:
        raise NotImplementedError(
            f"{self.name}: multi-term (phrase/synonym) weights not supported"
        )

    def score(self, freqs: np.ndarray, qdl: np.ndarray, params: tuple) -> np.ndarray:
        raise NotImplementedError

    def score_f32(self, freqs: np.ndarray, qdl: np.ndarray, params: tuple) -> np.ndarray:
        """Reference-cast scoring: SimilarityBase.score() computes the
        model in DOUBLE and the SimScorer casts the final value to float
        (SimilarityBase.java:218-225 returns double; Similarity.SimScorer
        #score returns float) — so double math + one final float32 cast
        IS the reference's float arithmetic for every SimilarityBase
        subclass. ClassicSimilarity overrides (TFIDF computes per-step
        in float, TFIDFSimilarity.java:497-503)."""
        return self.score(freqs, qdl, params).astype(np.float32)


class ClassicSimilarity(Similarity):
    """TFIDF. idf: ClassicSimilarity.java:62-64; lengthNorm 1/sqrt(dl):
    ClassicSimilarity.java:38-40; score = tf(freq)*queryWeight*norm:
    TFIDFSimilarity.java:497-503. Multi-term weight sums per-term idfs
    (TFIDFSimilarity.java:403-421)."""

    name = "classic"
    supports_combined = True

    def weight(self, df, ttf, doc_count, sum_ttf, boost):
        idf = math.log((doc_count + 1) / (df + 1.0)) + 1.0
        return (boost * idf,)

    def combined_weight(self, stats, doc_count, sum_ttf, boost):
        idf = sum(math.log((doc_count + 1) / (df + 1.0)) + 1.0 for df, _ in stats)
        return (boost * idf,)

    def score(self, freqs, qdl, params):
        (qw,) = params
        return np.sqrt(np.asarray(freqs, dtype=np.float64)) * qw / np.sqrt(qdl)

    def score_f32(self, freqs, qdl, params):
        # TFIDFSimilarity computes in FLOAT per step: tf=(float)sqrt(freq)
        # (TFIDFSimilarity.java:497), queryWeight float, lengthNorm =
        # (float)(1/sqrt(dl)) (ClassicSimilarity.java:38-40), product in
        # float — reproduce the same intermediate precision
        (qw,) = params
        tf = np.sqrt(np.asarray(freqs, dtype=np.float32)).astype(np.float32)
        norm = (
            np.float32(1.0)
            / np.sqrt(np.asarray(qdl, dtype=np.float32)).astype(np.float32)
        ).astype(np.float32)
        return (tf * np.float32(qw) * norm).astype(np.float32)


class BooleanSimilarity(Similarity):
    """score = boost, norm-blind (BooleanSimilarity.java:58-60)."""

    name = "boolean"
    supports_combined = True

    def weight(self, df, ttf, doc_count, sum_ttf, boost):
        return (boost,)

    def combined_weight(self, stats, doc_count, sum_ttf, boost):
        return (boost,)

    def score(self, freqs, qdl, params):
        (boost,) = params
        return np.full(len(np.asarray(freqs)), boost, dtype=np.float64)


class LMDirichletSimilarity(Similarity):
    """LMDirichletSimilarity.java:70-74, default mu=2000 (line 65-67)."""

    name = "lmdirichlet"

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def weight(self, df, ttf, doc_count, sum_ttf, boost):
        p = (ttf + 1.0) / (sum_ttf + 1.0)  # LMSimilarity.java:145-147
        return (boost, p)

    def score(self, freqs, qdl, params):
        boost, p = params
        f = np.asarray(freqs, dtype=np.float64)
        s = boost * (
            np.log1p(f / (self.mu * p)) + np.log(self.mu / (qdl + self.mu))
        )
        # LMDirichletSimilarity.java:75 "return score > 0.0d ? score : 0.0d"
        return np.maximum(s, 0.0)


class LMJelinekMercerSimilarity(Similarity):
    """LMJelinekMercerSimilarity.java:61-67; lambda in (0, 1]."""

    name = "lmjelinekmercer"

    def __init__(self, lam: float = 0.1):
        assert 0 < lam <= 1
        self.lam = float(lam)

    def weight(self, df, ttf, doc_count, sum_ttf, boost):
        p = (ttf + 1.0) / (sum_ttf + 1.0)
        return (boost, p)

    def score(self, freqs, qdl, params):
        boost, p = params
        f = np.asarray(freqs, dtype=np.float64)
        return boost * np.log1p(((1 - self.lam) * f / qdl) / (self.lam * p))


_INDEPENDENCE = {
    # IndependenceChiSquared.java:34 / Standardized.java:34 / Saturated.java:33
    "chisquared": lambda f, e: (f - e) * (f - e) / e,
    "standardized": lambda f, e: (f - e) / np.sqrt(e),
    "saturated": lambda f, e: (f - e) / e,
}


class DFISimilarity(Similarity):
    """Divergence From Independence (DFISimilarity.java:56-67)."""

    name = "dfi"

    def __init__(self, independence: str = "chisquared"):
        self._measure = _INDEPENDENCE[independence]

    def weight(self, df, ttf, doc_count, sum_ttf, boost):
        return (boost, float(ttf), float(sum_ttf))

    def score(self, freqs, qdl, params):
        boost, ttf, sum_ttf = params
        f = np.asarray(freqs, dtype=np.float64)
        expected = (ttf + 1.0) * qdl / (sum_ttf + 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            m = self._measure(f, expected)
            s = boost * _log2(m + 1.0)
        return np.where(f <= expected, 0.0, s)


# --- DFR framework -------------------------------------------------------

def _tfn(normalization: str, c: float, freq, qdl, avgdl, ttf, sum_ttf, doc_count):
    f = np.asarray(freq, dtype=np.float64)
    if normalization == "h1":    # NormalizationH1.java:57
        return f * c * (avgdl / qdl)
    if normalization == "h2":    # NormalizationH2.java:58
        return f * _log2(1.0 + c * avgdl / qdl)
    if normalization == "h3":    # NormalizationH3.java:48-50 (c = mu)
        return (f + c * ((ttf + 1.0) / (sum_ttf + 1.0))) / (qdl + c) * c
    if normalization == "z":     # NormalizationZ.java:49-50 (c = z)
        return f * np.power(avgdl / qdl, c)
    if normalization == "none":  # Normalization.NoNormalization, tfn = tf
        return f
    raise ValueError(normalization)


class DFRSimilarity(Similarity):
    """DFR: basic model x after effect x normalization
    (DFRSimilarity.java:103-108). After effects are pre-combined with
    the 1+tfn factor exactly as the reference does (aeTimes1pTfn)."""

    name = "dfr"

    def __init__(self, basic_model: str = "g", after_effect: str = "b",
                 normalization: str = "h2", c: float = 1.0):
        assert basic_model in ("g", "if", "in", "ine")
        assert after_effect in ("b", "l")
        self.basic_model = basic_model
        self.after_effect = after_effect
        self.normalization = normalization
        self.c = float(c)

    def weight(self, df, ttf, doc_count, sum_ttf, boost):
        return (boost, float(df), float(ttf), float(doc_count), float(sum_ttf))

    def score(self, freqs, qdl, params):
        boost, df, ttf, n_docs, sum_ttf = params
        avgdl = sum_ttf / n_docs
        tfn = _tfn(self.normalization, self.c, freqs, qdl, avgdl, ttf, sum_ttf, n_docs)
        if self.after_effect == "b":
            # AfterEffectB.java scoreTimes1pTfn: F = ttf+1, n = df+1,
            # returns (F + 1) / n = (ttf + 2) / (df + 1)
            ae1p = (ttf + 2.0) / (df + 1.0)
        else:                          # AfterEffectL.java:32-33
            ae1p = 1.0
        bm = self.basic_model
        if bm == "g":    # BasicModelG.java:31-46
            lam = (ttf + 1.0) / (n_docs + ttf + 1.0)
            a = _log2(lam + 1.0)
            b = _log2((1.0 + lam) / lam)
            return boost * (b - (b - a) / (1.0 + tfn)) * ae1p
        if bm == "if":   # BasicModelIF.java:31-41
            a = _log2(1.0 + (n_docs + 1.0) / (ttf + 0.5))
        elif bm == "in":  # BasicModelIn.java:31-41
            a = _log2((n_docs + 1.0) / (df + 0.5))
        else:            # BasicModelIne.java:31-44
            ne = n_docs * (1.0 - ((n_docs - 1.0) / n_docs) ** ttf)
            a = _log2((n_docs + 1.0) / (ne + 0.5))
        return boost * a * ae1p * (1.0 - 1.0 / (1.0 + tfn))


class IBSimilarity(Similarity):
    """Information-based: distribution x lambda x normalization
    (IBSimilarity.java:93-96)."""

    name = "ib"

    def __init__(self, distribution: str = "spl", lam: str = "df",
                 normalization: str = "h2", c: float = 1.0):
        assert distribution in ("ll", "spl")
        assert lam in ("df", "ttf")
        self.distribution = distribution
        self.lam = lam
        self.normalization = normalization
        self.c = float(c)

    def weight(self, df, ttf, doc_count, sum_ttf, boost):
        return (boost, float(df), float(ttf), float(doc_count), float(sum_ttf))

    def score(self, freqs, qdl, params):
        boost, df, ttf, n_docs, sum_ttf = params
        avgdl = sum_ttf / n_docs
        tfn = _tfn(self.normalization, self.c, freqs, qdl, avgdl, ttf, sum_ttf, n_docs)
        if self.lam == "df":   # LambdaDF.java:33-38
            lam = (df + 1.0) / (n_docs + 1.0)
        else:                  # LambdaTTF.java:33-39
            lam = (ttf + 1.0) / (n_docs + 1.0)
        lam = min(lam, np.nextafter(1.0, 0.0))
        if self.distribution == "ll":  # DistributionLL.java:34
            return boost * -np.log(lam / (tfn + lam))
        # DistributionSPL.java:46-58
        q = 1.0 - 1.0 / (tfn + 1.0)
        q = np.minimum(q, np.nextafter(1.0, 0.0))
        pow_ = np.power(lam, q)
        # DistributionSPL.java pow==lambda rounding guard: when pow(lam, q)
        # rounds to lam the log would be -inf; nudge one ulp toward 1
        # (lam < 1 always here after the min() clamp above -> nextUp).
        pow_ = np.where(pow_ == lam, np.nextafter(pow_, 1.0), pow_)
        return boost * -np.log((pow_ - lam) / (1.0 - lam))


class SweetSpotSimilarity(ClassicSimilarity):
    """misc/SweetSpotSimilarity.java:35 — ClassicSimilarity with a
    "sweet spot" plateau: docs whose length falls in [ln_min, ln_max]
    all get lengthNorm 1.0 and the norm decays as
    1/sqrt(steepness*(|x-min| + |x-max| - (max-min)) + 1) outside it
    (computeLengthNorm, SweetSpotSimilarity.java:106-115); tf is
    baselineTf: (freq <= tf_min) ? tf_base : sqrt(freq + tf_base^2 -
    tf_min), 0 at 0 (SweetSpotSimilarity.java:137-142). Defaults
    degrade to ClassicSimilarity exactly (min=max=1, steepness=0.5,
    tf_base=tf_min=0)."""

    name = "sweetspot"

    def __init__(self, ln_min: int = 1, ln_max: int = 1,
                 steepness: float = 0.5, tf_base: float = 0.0,
                 tf_min: float = 0.0):
        self.ln_min = int(ln_min)
        self.ln_max = int(ln_max)
        self.steepness = float(steepness)
        self.tf_base = float(tf_base)
        self.tf_min = float(tf_min)

    def score(self, freqs, qdl, params):
        (qw,) = params
        f = np.asarray(freqs, dtype=np.float64)
        tf = np.where(
            f <= self.tf_min,
            self.tf_base,
            np.sqrt(f + self.tf_base * self.tf_base - self.tf_min),
        )
        tf = np.where(f == 0.0, 0.0, tf)
        ln = 1.0 / np.sqrt(
            self.steepness
            * (np.abs(qdl - self.ln_min) + np.abs(qdl - self.ln_max)
               - (self.ln_max - self.ln_min))
            + 1.0
        )
        return tf * qw * ln


class MultiSimilarity(Similarity):
    """search/similarities/MultiSimilarity.java:30-76 — score is the SUM
    of the sub-similarities' scores (MultiSimScorer.score accumulates;
    its explain labels the node "sum of:"). Weight params are the tuple
    of child params, threading through the decode UDF unchanged."""

    name = "multi"

    def __init__(self, sims):
        self.sims = [by_name(s) for s in sims]
        if not self.sims:
            raise ValueError("MultiSimilarity needs >= 1 sub-similarity")
        self.supports_combined = all(s.supports_combined for s in self.sims)

    def weight(self, df, ttf, doc_count, sum_ttf, boost):
        return tuple(
            s.weight(df, ttf, doc_count, sum_ttf, boost) for s in self.sims
        )

    def combined_weight(self, stats, doc_count, sum_ttf, boost):
        return tuple(
            s.combined_weight(stats, doc_count, sum_ttf, boost)
            for s in self.sims
        )

    def score(self, freqs, qdl, params):
        acc = None
        for s, p in zip(self.sims, params):
            v = s.score(freqs, qdl, p)
            acc = v if acc is None else acc + v
        return acc


class PerFieldSimilarityWrapper(Similarity):
    """search/similarities/PerFieldSimilarityWrapper.java:31-47 — the
    similarity is chosen by FIELD at createWeight time. The executor
    passes the leaf's field into ``weight`` (wants_field opt-in); the
    resolved child's key is embedded in the weight params so the decode
    UDF dispatches without needing the field again."""

    name = "per_field"
    wants_field = True

    def __init__(self, default, fields: dict | None = None):
        self.default = by_name(default)
        self.fields = {f: by_name(s) for f, s in (fields or {}).items()}
        self.supports_combined = self.default.supports_combined and all(
            s.supports_combined for s in self.fields.values()
        )

    def get(self, field):
        """PerFieldSimilarityWrapper.get(String field) analog."""
        return self.fields.get(field, self.default)

    def weight(self, df, ttf, doc_count, sum_ttf, boost, field=None):
        child = self.get(field)
        return (field if field in self.fields else None,
                child.weight(df, ttf, doc_count, sum_ttf, boost))

    def combined_weight(self, stats, doc_count, sum_ttf, boost, field=None):
        child = self.get(field)
        return (field if field in self.fields else None,
                child.combined_weight(stats, doc_count, sum_ttf, boost))

    def score(self, freqs, qdl, params):
        key, child_params = params
        return self.get(key).score(freqs, qdl, child_params)


_REGISTRY = {
    "classic": ClassicSimilarity,
    "sweetspot": SweetSpotSimilarity,
    "boolean": BooleanSimilarity,
    "lmdirichlet": LMDirichletSimilarity,
    "lmjelinekmercer": LMJelinekMercerSimilarity,
    "dfi": DFISimilarity,
    "dfr": DFRSimilarity,
    "ib": IBSimilarity,
    "multi": MultiSimilarity,
    "per_field": PerFieldSimilarityWrapper,
}


def by_name(name, **kwargs) -> Similarity:
    """Instantiate a similarity by name; an instance passes through."""
    if isinstance(name, Similarity):
        return name
    return _REGISTRY[name](**kwargs)
