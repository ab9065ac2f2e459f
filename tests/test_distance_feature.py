"""DistanceFeatureQuery (document/LongDistanceFeatureQuery.java:44-120,
document/LatLonPointDistanceFeatureQuery.java:50-140; built by
LongPoint.newDistanceFeatureQuery / LatLonPoint.newDistanceFeatureQuery)
— score = boost * pivot / (pivot + distance), verified against a pandas
brute force and the additive SHOULD composition."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import (
    BoolQ,
    DistanceFeatureQ,
    GeoDistanceFeatureQ,
    Searcher,
    TermQ,
)


@pytest.fixture(scope="module")
def dist_idx(spark, tmp_path_factory):
    pdf = make_corpus(120, seed=23)
    # deterministic numeric doc-values column (mtime analog) + coords
    pdf["mtime"] = [(i * 37) % 1000 for i in range(len(pdf))]
    pdf["lat"] = [((i * 7919) % 18000) / 100.0 - 90.0 for i in range(len(pdf))]
    pdf["lon"] = [((i * 104729) % 36000) / 100.0 - 180.0 for i in range(len(pdf))]
    idx_dir = str(tmp_path_factory.mktemp("dist_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", keep_cols=["mtime", "lat", "lon"],
        num_buckets=4, salt_rows=64,
    )
    return Index(spark, idx_dir), pdf


def _scores(df):
    return {int(r["doc_id"]): float(r["score"]) for r in df.collect()}


def test_long_distance_feature_formula(dist_idx):
    """Every doc matches; score = boost * pivot / (pivot + |v - origin|)
    (LongDistanceFeatureQuery.java:117), float32-rounded in lucene mode."""
    idx, pdf = dist_idx
    s = Searcher(idx)
    got = _scores(s.scored(DistanceFeatureQ("mtime", 500.0, 100.0, boost=2.0)))
    docs = idx.docs.select("doc_id", "mtime").toPandas()
    assert len(got) == len(docs)
    for doc_id, v in zip(docs["doc_id"], docs["mtime"]):
        want = np.float32(2.0 * 100.0 / (100.0 + abs(float(v) - 500.0)))
        assert got[int(doc_id)] == pytest.approx(float(want), abs=1e-9)


def test_should_composition_is_additive(dist_idx):
    """BoolQ(must=text, should=distance) = text score + feature score
    for every doc matching the MUST clause — the recency-boost shape."""
    idx, _ = dist_idx
    s = Searcher(idx, scoring="double")
    dq = DistanceFeatureQ("mtime", 300.0, 50.0, boost=0.5)
    combined = _scores(s.scored(BoolQ(must=(TermQ("merge"),), should=(dq,))))
    text = _scores(s.scored(TermQ("merge")))
    feat = _scores(s.scored(dq))
    assert set(combined) == set(text)
    for d, sc in combined.items():
        assert sc == pytest.approx(text[d] + feat[d], rel=1e-12)


def test_doc_set_matches_nonnull(dist_idx):
    idx, _ = dist_idx
    s = Searcher(idx)
    n_docs = idx.docs.count()
    assert s.doc_set(DistanceFeatureQ("mtime", 0.0, 1.0)).count() == n_docs


def test_pivot_must_be_positive():
    with pytest.raises(ValueError):
        DistanceFeatureQ("mtime", 0.0, 0.0)
    with pytest.raises(ValueError):
        GeoDistanceFeatureQ("lat", "lon", 0.0, 0.0, -1.0)


def _haversine_m(lat1, lon1, lat2, lon2):
    to_rad = math.pi / 180.0
    sin_dlat = math.sin((lat2 - lat1) * 0.5 * to_rad)
    sin_dlon = math.sin((lon2 - lon1) * 0.5 * to_rad)
    h = (sin_dlat * sin_dlat
         + math.cos(lat1 * to_rad) * math.cos(lat2 * to_rad)
         * sin_dlon * sin_dlon)
    return 2.0 * 6371008.7714 * math.asin(min(1.0, math.sqrt(h)))


def test_geo_distance_feature_formula(dist_idx):
    """score = boost * pivot_m / (pivot_m + haversine_m)
    (LatLonPointDistanceFeatureQuery.java:130-131)."""
    idx, _ = dist_idx
    s = Searcher(idx, scoring="double")
    origin = (12.5, 80.25)
    pivot = 500_000.0
    got = _scores(s.scored(
        GeoDistanceFeatureQ("lat", "lon", origin[0], origin[1], pivot)
    ))
    coords = idx.docs.select("doc_id", "lat", "lon").toPandas()
    assert len(got) == len(coords)
    for doc_id, la, lo in zip(coords["doc_id"], coords["lat"], coords["lon"]):
        d = _haversine_m(origin[0], origin[1], float(la), float(lo))
        assert got[int(doc_id)] == pytest.approx(
            pivot / (pivot + d), rel=1e-6
        )


def test_geo_closest_doc_ranks_first(dist_idx):
    """Ranking by the feature alone = ranking by proximity."""
    idx, _ = dist_idx
    s = Searcher(idx, scoring="double")
    origin = (12.5, 80.25)
    top = s.top_k(
        GeoDistanceFeatureQ("lat", "lon", origin[0], origin[1], 1000.0), 5
    ).collect()
    coords = idx.docs.select("doc_id", "lat", "lon").toPandas()
    dists = sorted(
        (_haversine_m(origin[0], origin[1], float(la), float(lo)), int(d))
        for d, la, lo in zip(coords["doc_id"], coords["lat"], coords["lon"])
    )
    assert [int(r["doc_id"]) for r in top] == [d for _, d in dists[:5]]


def test_explain_structure(dist_idx):
    """IndexSearcher.explain parity: weight/pivotDistance/origin/value
    details and the same float32-rounded root value as the scorer
    (LongDistanceFeatureQuery.java:105-125)."""
    idx, _ = dist_idx
    s = Searcher(idx)
    q = DistanceFeatureQ("mtime", 500.0, 100.0, boost=2.0)
    some = s.scored(q).limit(1).collect()[0]
    ex = s.explain(q, int(some["doc_id"]))
    assert ex["value"] == pytest.approx(float(some["score"]), abs=1e-9)
    descs = [d["description"] for d in ex["details"]]
    assert descs == ["weight", "pivotDistance", "origin", "current value"]
