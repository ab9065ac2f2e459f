"""LatLonPoint analog (lucene_spark/geo.py) — box / distance / sort.

Mirrors the reference's TestLatLonPoint*: every predicate is checked
against a brute-force haversine computed independently in numpy, the
distance query against its own bbox-free form (the pre-filter must
never exclude a true match), and the plan-node path (GeoBoxQ /
GeoDistanceQ as BoolQ FILTER clauses) end-to-end over an index whose
docs table carries lat/lon keep_cols."""

import math
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark import geo
from lucene_spark.index import Index, build_index
from lucene_spark.search import BoolQ, GeoBoxQ, GeoDistanceQ, Searcher, TermQ


def _synth(n=400, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lat": np.round(rng.uniform(-90, 90, n), 4),
        "lon": np.round(rng.uniform(-180, 180, n), 4),
    })


def _hav_np(lat1, lon1, lat2, lon2):
    p1, l1 = np.radians(lat1), np.radians(lon1)
    p2, l2 = math.radians(lat2), math.radians(lon2)
    h = (np.sin((p2 - p1) / 2) ** 2
         + np.cos(p1) * math.cos(p2) * np.sin((l2 - l1) / 2) ** 2)
    return 2 * geo.EARTH_MEAN_RADIUS_METERS * np.arcsin(np.sqrt(h))


@pytest.fixture(scope="module")
def geo_df(spark):
    return spark.createDataFrame(_synth())


def test_box_filter_matches_brute_force(spark, geo_df):
    pdf = _synth()
    got = sorted(
        r.doc_id
        for r in geo.box_filter(geo_df, "lat", "lon", -20, 35, 40, 150).collect()
    )
    want = sorted(pdf.doc_id[
        (pdf.lat >= -20) & (pdf.lat <= 35) & (pdf.lon >= 40) & (pdf.lon <= 150)
    ].tolist())
    assert got == want and got


def test_box_dateline_crossing(spark, geo_df):
    # min_lon > max_lon -> two lon ranges (LatLonPoint.newBoxQuery rewrite)
    pdf = _synth()
    got = sorted(
        r.doc_id
        for r in geo.box_filter(geo_df, "lat", "lon", -90, 90, 160, -160).collect()
    )
    want = sorted(pdf.doc_id[(pdf.lon >= 160) | (pdf.lon <= -160)].tolist())
    assert got == want and got


def test_distance_matches_brute_force(spark, geo_df):
    pdf = _synth()
    d = _hav_np(pdf.lat.values, pdf.lon.values, 48.8566, 2.3522)
    for radius in (5e5, 2e6, 8e6):
        got = sorted(
            r.doc_id
            for r in geo.within_distance(
                geo_df, "lat", "lon", 48.8566, 2.3522, radius
            ).collect()
        )
        want = sorted(pdf.doc_id[d <= radius].tolist())
        assert got == want, radius
    assert len(got) > 0


def test_distance_near_pole_bbox_saturates(spark, geo_df):
    # circle around 89N: lon span must saturate to the full range, never
    # dropping matches on the far side of the pole
    pdf = _synth()
    d = _hav_np(pdf.lat.values, pdf.lon.values, 89.0, 0.0)
    got = sorted(
        r.doc_id
        for r in geo.within_distance(geo_df, "lat", "lon", 89.0, 0.0, 1.5e6).collect()
    )
    want = sorted(pdf.doc_id[d <= 1.5e6].tolist())
    assert got == want


def test_distance_bbox_dateline_wrap(spark, geo_df):
    # center near the dateline: bbox wraps, matches on both signs of lon
    pdf = _synth()
    d = _hav_np(pdf.lat.values, pdf.lon.values, 0.0, 179.5)
    got = sorted(
        r.doc_id
        for r in geo.within_distance(geo_df, "lat", "lon", 0.0, 179.5, 2e6).collect()
    )
    want = sorted(pdf.doc_id[d <= 2e6].tolist())
    assert got == want
    assert any(pdf.set_index("doc_id").lon[g] < 0 for g in got)  # wrapped side


def test_nearest_topk_order(spark, geo_df):
    pdf = _synth()
    d = _hav_np(pdf.lat.values, pdf.lon.values, 10.0, 10.0)
    order = np.lexsort((pdf.doc_id.values, d))
    want = pdf.doc_id.values[order][:10].tolist()
    rows = geo.nearest(geo_df, "lat", "lon", 10.0, 10.0, 10).collect()
    assert [r.doc_id for r in rows] == want
    assert np.allclose(
        [r.distance_m for r in rows], np.sort(d)[:10], rtol=1e-9
    )


def test_invalid_ranges_raise():
    with pytest.raises(ValueError):
        geo.box_predicate("lat", "lon", 50, 40, 0, 10)
    with pytest.raises(ValueError):
        geo.box_predicate("lat", "lon", -10, 10, 0, 200)
    with pytest.raises(ValueError):
        geo.distance_bbox(0, 0, -1)


def test_geo_plan_nodes_compose_with_boolq(spark, tmp_path_factory):
    """GeoBoxQ / GeoDistanceQ as FILTER clauses over an index with
    lat/lon doc-values columns (LatLonPoint next to an inverted field,
    the standard Lucene document layout)."""
    pdf = _synth(120)
    texts = ["alpha data stream"] * 60 + ["beta control plane"] * 60
    corpus = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": pdf.doc_id, "content": texts,
            "lat": pdf.lat, "lon": pdf.lon,
        })
    )
    idx_dir = str(tmp_path_factory.mktemp("geoidx"))
    build_index(
        spark, corpus, idx_dir, text_col="content", doc_id_col="doc_id",
        keep_cols=["lat", "lon"], num_buckets=4, salt_rows=2048,
    )
    s = Searcher(Index(spark, idx_dir))
    d = _hav_np(pdf.lat.values, pdf.lon.values, 10.0, 10.0)
    want = set(pdf.doc_id[(d <= 6e6) & (pdf.doc_id < 60)].tolist())
    q = BoolQ(
        must=(TermQ("data"),),
        filter=(GeoDistanceQ("lat", "lon", 10.0, 10.0, 6e6),),
    )
    got = {r.doc_id for r in s.top_k(q, 200).collect()}
    assert got == want and got

    want_box = set(
        pdf.doc_id[(pdf.lat.between(-40, 40)) & (pdf.lon.between(-60, 60))
                   & (pdf.doc_id >= 60)].tolist()
    )
    qb = BoolQ(
        must=(TermQ("control"),),
        filter=(GeoBoxQ("lat", "lon", -40, 40, -60, 60),),
    )
    got_box = {r.doc_id for r in s.top_k(qb, 200).collect()}
    assert got_box == want_box and got_box


def test_box_predicate_pushdown_reaches_scan(spark, tmp_path):
    """The box predicate must reach the parquet scan as PushedFilters
    (the BKD-pruning analog — §4 of the module docstring)."""
    pdf = _synth(200)
    path = os.path.join(str(tmp_path), "pts.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    df = spark.read.parquet(path)
    plan = geo.box_filter(df, "lat", "lon", -20, 35, 40, 150)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(lat,-20" in plan
