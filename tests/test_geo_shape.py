"""Polygon query (LatLonPoint.newPolygonQuery analog, geo_shape.py):
convex case checked against an independent half-plane oracle; concave
and holed cases checked Spark-vs-DuckDB (the SQL twin used by the
driver gate must agree with the Column expression)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from lucene_spark.geo_shape import (
    polygon_filter,
    polygon_predicate_sql,
)

_CONVEX = [(0.0, 0.0), (0.0, 10.0), (8.0, 12.0), (12.0, 5.0), (7.0, -2.0)]
_CONCAVE = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (5.0, 4.0), (0.0, 10.0)]
_OUTER = [(0.0, 0.0), (0.0, 12.0), (12.0, 12.0), (12.0, 0.0)]
_HOLE = [(4.0, 4.0), (4.0, 8.0), (8.0, 8.0), (8.0, 4.0)]


def _points(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n),
        "lat": rng.uniform(-3, 15, n).round(4),
        "lon": rng.uniform(-5, 15, n).round(4),
    })


def _convex_inside(pdf, poly):
    """Independent oracle: convex polygon via same-side cross products
    (strict interior; we drop near-boundary points to dodge edge-rule
    differences)."""
    pts = np.asarray(poly)
    lat, lon = pdf["lat"].to_numpy(), pdf["lon"].to_numpy()
    side = None
    inside = np.ones(len(pdf), bool)
    margin = np.full(len(pdf), np.inf)
    for i in range(len(pts)):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % len(pts)]
        cross = (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1)
        if side is None:
            side = np.sign(cross[np.abs(cross).argmax()])
        inside &= (cross * side) > 0
        margin = np.minimum(margin, np.abs(cross))
    return inside, margin


def test_polygon_convex_vs_halfplane(spark):
    pdf = _points()
    df = spark.createDataFrame(pdf)
    got = set(
        r["doc_id"]
        for r in polygon_filter(df, "lat", "lon", _CONVEX).collect()
    )
    want, margin = _convex_inside(pdf, _CONVEX)
    keep = margin > 1e-6  # ignore exactly-on-edge ambiguity
    ids = pdf["doc_id"].to_numpy()
    assert set(ids[want & keep]) == {i for i in got if keep[i]}
    assert want.sum() > 100  # the sample actually exercises the interior


def test_polygon_concave_and_hole_vs_duckdb(spark):
    pdf = _points(seed=11)
    con = duckdb.connect()
    con.register("pts", pdf)
    for poly, holes in [(_CONCAVE, ()), (_OUTER, (_HOLE,))]:
        df = spark.createDataFrame(pdf)
        got = sorted(
            r["doc_id"]
            for r in polygon_filter(df, "lat", "lon", poly, holes).collect()
        )
        sql = polygon_predicate_sql("lat", "lon", poly, holes)
        want = sorted(
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM pts WHERE {sql}"
            ).fetchall()
        )
        assert got == want and len(got) > 50
    # hole actually removes points: holed count < outer count
    df = spark.createDataFrame(pdf)
    full = polygon_filter(df, "lat", "lon", _OUTER).count()
    holed = polygon_filter(df, "lat", "lon", _OUTER, (_HOLE,)).count()
    assert holed < full


def test_polygon_bbox_prunes(spark):
    # everything far outside the bbox must be rejected by the bbox term
    pdf = pd.DataFrame({"doc_id": [0, 1], "lat": [50.0, -50.0],
                        "lon": [100.0, -100.0]})
    df = spark.createDataFrame(pdf)
    assert polygon_filter(df, "lat", "lon", _CONVEX).count() == 0
