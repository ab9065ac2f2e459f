"""Polygon point-in-polygon query — LatLonPoint.newPolygonQuery analog
(document/LatLonPoint.java:291, geo/Polygon.java:33, geo/Polygon2D
component tree).

The reference builds a Polygon2D interval tree and tests candidate BKD
leaves; Spark-first, the polygon is a QUERY-TIME literal, so the test
unrolls into a pure column expression:

- bounding-box prune: a pushdown-able range predicate (the analog of
  the BKD outer-node reject, and of Polygon2D's own bbox short-cut) —
  this is the part parquet row-group min/max skipping sees;
- exact refine: crossing-number (ray cast toward -inf lon) as ONE
  codegen expression — a sum of per-edge CASE terms, odd parity =
  inside (the same edge rule as geo/GeoUtils.lineCrossesLine-based
  Polygon2D.internalContains). No Python UDF, no shuffle.

Holes (Polygon.java supports them) subtract: inside(outer) AND NOT
inside(any hole).

``polygon_predicate_sql`` is the term-by-term ANSI-SQL twin for the
DuckDB oracle gate (geo_polygon_docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _validate(polygon) -> list[tuple[float, float]]:
    pts = [(float(lat), float(lon)) for lat, lon in polygon]
    if len(pts) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    if pts[0] == pts[-1]:  # accept closed rings, store open
        pts = pts[:-1]
    if len(pts) < 3:
        raise ValueError("degenerate polygon")
    return pts


def _crossings(lat_col: Column, lon_col: Column,
               pts: list[tuple[float, float]]) -> Column:
    """Crossing count of a -inf-lon ray from the point, one CASE term
    per edge (semi-open rule: an edge counts iff its lat interval
    half-contains the point's lat, which makes shared vertices count
    exactly once)."""
    total = F.lit(0)
    n = len(pts)
    for i in range(n):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses a horizontal ray rule
        straddles = (F.lit(y1) > lat_col) != (F.lit(y2) > lat_col)
        x_at = F.lit(x1) + (lat_col - F.lit(y1)) * F.lit(
            (x2 - x1) / (y2 - y1)
        )
        total = total + F.when(straddles & (lon_col < x_at), 1).otherwise(0)
    return total


def polygon_predicate(lat_col: str, lon_col: str, polygon,
                      holes=()) -> Column:
    """Inclusive bbox prune AND exact crossing-number refine."""
    pts = _validate(polygon)
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    min_lat = min(p[0] for p in pts)
    max_lat = max(p[0] for p in pts)
    min_lon = min(p[1] for p in pts)
    max_lon = max(p[1] for p in pts)
    bbox = (
        (lat >= F.lit(min_lat)) & (lat <= F.lit(max_lat))
        & (lon >= F.lit(min_lon)) & (lon <= F.lit(max_lon))
    )
    inside = _crossings(lat, lon, pts) % 2 == 1
    for hole in holes:
        inside = inside & ~(_crossings(lat, lon, _validate(hole)) % 2 == 1)
    return bbox & inside


def _crossings_sql(lat_expr: str, lon_expr: str,
                   pts: list[tuple[float, float]]) -> str:
    terms = []
    n = len(pts)
    for i in range(n):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % n]
        if y1 == y2:
            continue
        slope = (x2 - x1) / (y2 - y1)
        terms.append(
            f"(CASE WHEN (({y1!r} > {lat_expr}) <> ({y2!r} > {lat_expr}))"
            f" AND ({lon_expr} < {x1!r} + ({lat_expr} - {y1!r}) * {slope!r})"
            f" THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def polygon_predicate_sql(lat_expr: str, lon_expr: str, polygon,
                          holes=()) -> str:
    """ANSI-SQL twin of :func:`polygon_predicate` (same edge terms, same
    literals) for DuckDB oracles."""
    pts = _validate(polygon)
    min_lat = min(p[0] for p in pts)
    max_lat = max(p[0] for p in pts)
    min_lon = min(p[1] for p in pts)
    max_lon = max(p[1] for p in pts)
    sql = (
        f"({lat_expr} >= {min_lat!r} AND {lat_expr} <= {max_lat!r}"
        f" AND {lon_expr} >= {min_lon!r} AND {lon_expr} <= {max_lon!r}"
        f" AND {_crossings_sql(lat_expr, lon_expr, pts)} % 2 = 1"
    )
    for hole in holes:
        sql += (f" AND NOT ({_crossings_sql(lat_expr, lon_expr, _validate(hole))}"
                f" % 2 = 1)")
    return sql + ")"


def polygon_filter(df: DataFrame, lat_col: str, lon_col: str, polygon,
                   holes=()) -> DataFrame:
    return df.filter(polygon_predicate(lat_col, lon_col, polygon, holes))
