"""Unit tests for the pluggable similarity zoo (lucene_spark/similarities.py).

Each model is checked against an independently-coded version of the
PAPER formula (not the reference's reassociated rewrite), plus the
monotonicity invariants impacts-based block-max pruning relies on:
non-decreasing in freq, non-increasing in doc length
(search/similarities/Similarity.java class javadoc).
"""

import math

import numpy as np
import pytest

from lucene_spark import similarities as S

FREQS = np.array([1.0, 2.0, 3.0, 7.0, 50.0])
QDL = np.array([4.0, 16.0, 28.0, 40.0, 512.0])
STATS = dict(df=30, ttf=90, doc_count=1000, sum_ttf=40_000)


def _score(sim, freqs=FREQS, qdl=QDL, boost=1.0, **stats):
    st = {**STATS, **stats}
    w = sim.weight(st["df"], st["ttf"], st["doc_count"], st["sum_ttf"], boost)
    return sim.score(freqs, qdl, w)


ALL = [
    S.ClassicSimilarity(),
    S.BooleanSimilarity(),
    S.LMDirichletSimilarity(),
    S.LMJelinekMercerSimilarity(0.7),
    S.DFISimilarity(),
    S.DFRSimilarity(),                      # G / B / H2
    S.DFRSimilarity("ine", "l", "h1"),
    S.IBSimilarity(),                       # SPL / DF / H2
    S.IBSimilarity("ll", "ttf", "h1"),
]


@pytest.mark.parametrize("sim", ALL, ids=lambda s: f"{s.name}:{type(s).__name__}")
def test_monotone_in_freq_antitone_in_dl(sim):
    # freq increasing at fixed dl -> scores non-decreasing
    f = np.arange(1.0, 30.0)
    s = sim.score(f, np.full_like(f, 40.0), _weight(sim))
    assert np.all(np.diff(s) >= -1e-12)
    # dl increasing at fixed freq -> scores non-increasing
    dl = np.arange(4.0, 200.0)
    s = sim.score(np.full_like(dl, 3.0), dl, _weight(sim))
    assert np.all(np.diff(s) <= 1e-12)


def _weight(sim, boost=1.0):
    return sim.weight(STATS["df"], STATS["ttf"], STATS["doc_count"],
                      STATS["sum_ttf"], boost)


def test_classic_formula():
    # idf = ln((N+1)/(df+1)) + 1; score = sqrt(f) * idf / sqrt(dl)
    # (ClassicSimilarity.java:38-64)
    got = _score(S.ClassicSimilarity())
    idf = math.log(1001 / 31.0) + 1.0
    want = np.sqrt(FREQS) * idf / np.sqrt(QDL)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_sweetspot_defaults_degrade_to_classic():
    # min=max=1, steepness=0.5, tf_base=tf_min=0 -> exactly Classic
    # (SweetSpotSimilarity.java:97 "degrades to 1/sqrt(x)")
    np.testing.assert_allclose(
        _score(S.SweetSpotSimilarity()), _score(S.ClassicSimilarity()),
        rtol=1e-12,
    )


def test_sweetspot_plateau_and_decay():
    # lengths inside [4, 40] all norm 1.0; outside decays as the paper
    # form 1/sqrt(s*(|x-lo|+|x-hi|-(hi-lo))+1) (computeLengthNorm)
    sim = S.SweetSpotSimilarity(ln_min=4, ln_max=40, steepness=0.5)
    got = _score(sim)
    idf = math.log(1001 / 31.0) + 1.0
    ln = 1.0 / np.sqrt(0.5 * (np.abs(QDL - 4) + np.abs(QDL - 40) - 36) + 1.0)
    np.testing.assert_allclose(got, np.sqrt(FREQS) * idf * ln, rtol=1e-12)
    assert ln[0] == ln[1] == ln[3] == 1.0 and ln[4] < 1.0


def test_sweetspot_baseline_tf():
    # (freq <= tf_min) ? tf_base : sqrt(freq + base^2 - min); 0 at 0
    sim = S.SweetSpotSimilarity(tf_base=1.5, tf_min=2.0)
    got = sim.score(np.array([0.0, 1.0, 2.0, 5.0]), np.array([1.0] * 4),
                    sim.weight(30, 90, 1000, 40_000, 1.0))
    idf = math.log(1001 / 31.0) + 1.0
    want = np.array([0.0, 1.5, 1.5, math.sqrt(5.0 + 2.25 - 2.0)]) * idf
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_boolean_is_boost():
    np.testing.assert_array_equal(_score(S.BooleanSimilarity(), boost=2.5),
                                  np.full(5, 2.5))


def test_lmdirichlet_formula():
    # boost * (ln(1 + f/(mu*P)) + ln(mu/(dl+mu))), P=(ttf+1)/(sumTtf+1)
    # (LMDirichletSimilarity.java:70-74)
    p = 91 / 40_001.0
    want = np.log(1 + FREQS / (2000.0 * p)) + np.log(2000.0 / (QDL + 2000.0))
    want = np.maximum(want, 0.0)  # LMDirichletSimilarity.java:75 clamp
    np.testing.assert_allclose(_score(S.LMDirichletSimilarity()), want, rtol=1e-12)
    # long doc + rare freq drives the raw formula negative -> clamped to 0
    got = _score(S.LMDirichletSimilarity(), freqs=np.array([1.0]),
                 qdl=np.array([1e7]), ttf=39_000)
    assert got[0] == 0.0


def test_lmjm_formula():
    # boost * ln(1 + ((1-l) f/dl)/(l P)) (LMJelinekMercerSimilarity.java:61-67)
    p = 91 / 40_001.0
    want = np.log(1 + (0.3 * FREQS / QDL) / (0.7 * p))
    np.testing.assert_allclose(
        _score(S.LMJelinekMercerSimilarity(0.7)), want, rtol=1e-12
    )


def test_dfi_zero_at_or_below_expected():
    # expected = (ttf+1)*dl/(sumTtf+1); freq <= expected -> 0
    # (DFISimilarity.java:56-67)
    sim = S.DFISimilarity()
    e = 91 * 40.0 / 40_001.0   # ~0.091: freq >= 1 always above at these dls
    got = _score(sim, freqs=np.array([1.0]), qdl=np.array([40.0]))
    want = math.log2((1.0 - e) ** 2 / e + 1)
    np.testing.assert_allclose(got, [want], rtol=1e-12)
    # huge dl makes expected exceed freq -> exactly 0
    got = _score(sim, freqs=np.array([1.0]), qdl=np.array([1e9]))
    assert got[0] == 0.0


def test_dfr_g_b_matches_paper_form():
    """The reference rewrites G+B as (B-(B-A)/(1+tfn))*aeTimes1pTfn
    (BasicModelG.java:31-46). Paper form: (A + B*tfn) * ae with
    ae = ((F+1)/n)/(1+tfn), F = ttf+1, n = df+1
    (AfterEffectB.java scoreTimes1pTfn). Must agree."""
    sim = S.DFRSimilarity("g", "b", "h2")
    got = _score(sim)
    df, f_ttf, nd, sttf = STATS["df"], STATS["ttf"], STATS["doc_count"], STATS["sum_ttf"]
    avgdl = sttf / nd
    tfn = FREQS * np.log2(1 + avgdl / QDL)
    lam = (f_ttf + 1) / (nd + f_ttf + 1)
    a, b = math.log2(lam + 1), math.log2((1 + lam) / lam)
    ae = ((f_ttf + 2) / (df + 1)) / (1 + tfn)
    want = (a + b * tfn) * ae
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_ib_spl_df_h2():
    # -ln((lam^q - lam)/(1 - lam)), q = tfn/(tfn+1), lam=(df+1)/(N+1)
    # (DistributionSPL.java:46-58, LambdaDF.java:33-38)
    got = _score(S.IBSimilarity("spl", "df", "h2"))
    avgdl = STATS["sum_ttf"] / STATS["doc_count"]
    tfn = FREQS * np.log2(1 + avgdl / QDL)
    lam = 31 / 1001.0
    q = tfn / (tfn + 1)
    want = -np.log((lam**q - lam) / (1 - lam))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_ib_spl_pow_rounding_guard_no_inf():
    # DistributionSPL.java nudges pow when pow(lambda, q) rounds to lambda
    # (else -log(0) = +inf). df == doc_count drives lam -> nextDown(1.0),
    # where lam^q rounds to lam for q near 1.
    got = _score(S.IBSimilarity("spl", "df", "h2"),
                 freqs=np.array([1e18]), qdl=np.array([1.0]), df=1000)
    assert np.isfinite(got[0])


def test_registry_and_combined():
    assert S.by_name("classic").name == "classic"
    w2 = S.ClassicSimilarity().combined_weight(
        [(30, 0), (30, 0)], 1000, 40_000, 1.0
    )
    (w1,) = S.ClassicSimilarity().weight(30, 90, 1000, 40_000, 1.0)
    np.testing.assert_allclose(w2[0], 2 * w1, rtol=1e-12)
    with pytest.raises(NotImplementedError):
        S.LMDirichletSimilarity().combined_weight([(3, 1)], 10, 100, 1.0)
