"""Geo queries — LatLonPoint analog (document/LatLonPoint.java).

The reference encodes (lat, lon) into a 2D BKD tree and serves
``newBoxQuery`` / ``newDistanceQuery`` / ``newDistanceSort``
(LatLonPoint.java:238-320, LatLonPointDistanceQuery.java,
LatLonPointDistanceComparator.java). Spark-first, the BKD tree's job —
skipping blocks whose (lat, lon) range can't intersect the query — is
exactly what parquet row-group min/max pruning plus Catalyst predicate
pushdown already do over two DOUBLE doc-values columns, so:

- box query      -> a pushdown-able range predicate (dateline-crossing
                    boxes split into two lon ranges, like
                    LatLonPoint.newBoxQuery's two-query rewrite)
- distance query -> the distance's bounding box as the pushdown-able
                    PRE-filter (GeoUtils.distanceQuerySortKey /
                    Rectangle.fromPointDistance analog), then the exact
                    haversine refine (SloppyMath.haversinMeters,
                    EARTH_MEAN_RADIUS_METERS = 6371008.7714) as a
                    JVM-side column expression — two-phase, exactly the
                    reference's bbox-then-haversin structure
- distance sort  -> orderBy(haversine) + docID tie-break
                    (LatLonPointDistanceComparator semantics)

All expressions are built-in trig functions (whole-stage codegen, no
Python). Plan-node integration: ``GeoBoxQ`` / ``GeoDistanceQ`` in
search/plans.py lower through ``doc_set`` like ``FieldFilter``, so geo
predicates compose with boolean FILTER clauses over an index whose docs
table carries lat/lon keep_cols.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GeoUtils.java:56 — mean earth radius used by haversinMeters
EARTH_MEAN_RADIUS_METERS = 6_371_008.7714

MIN_LAT, MAX_LAT = -90.0, 90.0
MIN_LON, MAX_LON = -180.0, 180.0


def haversine_meters(lat_col, lon_col, lat: float, lon: float) -> Column:
    """SloppyMath.haversinMeters as a codegen column expression:
    2R * asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2)))."""
    phi1 = F.radians(F.col(lat_col) if isinstance(lat_col, str) else lat_col)
    lam1 = F.radians(F.col(lon_col) if isinstance(lon_col, str) else lon_col)
    phi2 = F.lit(math.radians(lat))
    lam2 = F.lit(math.radians(lon))
    sdlat = F.sin((phi2 - phi1) / 2)
    sdlon = F.sin((lam2 - lam1) / 2)
    h = sdlat * sdlat + F.cos(phi1) * F.cos(phi2) * sdlon * sdlon
    return F.lit(2.0 * EARTH_MEAN_RADIUS_METERS) * F.asin(F.sqrt(h))


def haversine_meters_py(lat1: float, lon1: float,
                        lat2: float, lon2: float) -> float:
    """Driver-side scalar twin of :func:`haversine_meters` (same
    formula, same constant) for explain() detail output."""
    phi1, lam1 = math.radians(lat1), math.radians(lon1)
    phi2, lam2 = math.radians(lat2), math.radians(lon2)
    sdlat = math.sin((phi2 - phi1) / 2)
    sdlon = math.sin((lam2 - lam1) / 2)
    h = sdlat * sdlat + math.cos(phi1) * math.cos(phi2) * sdlon * sdlon
    return 2.0 * EARTH_MEAN_RADIUS_METERS * math.asin(math.sqrt(h))


def haversine_meters_sql(lat_expr: str, lon_expr: str,
                         lat: float, lon: float) -> str:
    """ANSI-SQL twin of :func:`haversine_meters` (same formula, same
    constant) for the DuckDB oracles."""
    phi1 = f"radians({lat_expr})"
    lam1 = f"radians({lon_expr})"
    phi2 = repr(math.radians(lat))
    lam2 = repr(math.radians(lon))
    h = (f"(sin(({phi2} - {phi1}) / 2) * sin(({phi2} - {phi1}) / 2) + "
         f"cos({phi1}) * cos({phi2}) * "
         f"sin(({lam2} - {lam1}) / 2) * sin(({lam2} - {lam1}) / 2))")
    return f"(2.0 * {EARTH_MEAN_RADIUS_METERS!r} * asin(sqrt({h})))"


def box_predicate(lat_col: str, lon_col: str, min_lat: float,
                  max_lat: float, min_lon: float, max_lon: float) -> Column:
    """LatLonPoint.newBoxQuery (LatLonPoint.java:238): inclusive ranges;
    min_lon > max_lon means the box crosses the dateline and splits into
    two lon ranges (the reference rewrites to a 2-clause disjunction)."""
    if not (MIN_LAT <= min_lat <= max_lat <= MAX_LAT):
        raise ValueError(f"invalid latitude range [{min_lat}, {max_lat}]")
    for v in (min_lon, max_lon):
        if not (MIN_LON <= v <= MAX_LON):
            raise ValueError(f"invalid longitude {v}")
    lat_ok = F.col(lat_col).between(min_lat, max_lat)
    if min_lon <= max_lon:
        return lat_ok & F.col(lon_col).between(min_lon, max_lon)
    return lat_ok & (
        F.col(lon_col).between(min_lon, MAX_LON)
        | F.col(lon_col).between(MIN_LON, max_lon)
    )


def distance_bbox(lat: float, lon: float, radius_m: float):
    """Rectangle.fromPointDistance analog: the lat/lon bounding box of a
    distance circle, used as the pushdown-able pre-filter. Conservative
    (never excludes a true match): lat span = angular radius; lon span
    widens by 1/cos(worst-case |lat|) and saturates to the full range
    near the poles or past a quarter circumference."""
    if radius_m < 0:
        raise ValueError("radius must be >= 0")
    ang = math.degrees(radius_m / EARTH_MEAN_RADIUS_METERS)
    min_lat = max(MIN_LAT, lat - ang)
    max_lat = min(MAX_LAT, lat + ang)
    worst = min(90.0, max(abs(min_lat), abs(max_lat)))
    if ang >= 90.0 or worst >= 89.0:
        return min_lat, max_lat, MIN_LON, MAX_LON
    lon_span = ang / math.cos(math.radians(worst))
    if lon_span >= 180.0:
        return min_lat, max_lat, MIN_LON, MAX_LON
    min_lon, max_lon = lon - lon_span, lon + lon_span
    if min_lon < MIN_LON:
        min_lon += 360.0  # dateline wrap -> crossing box
    if max_lon > MAX_LON:
        max_lon -= 360.0
    return min_lat, max_lat, min_lon, max_lon


def distance_predicate(lat_col: str, lon_col: str, lat: float, lon: float,
                       radius_m: float) -> Column:
    """LatLonPoint.newDistanceQuery (LatLonPoint.java:262): bbox
    pre-filter (pushdown) AND exact haversine <= radius (inclusive,
    LatLonPointDistanceQuery's distance <= radiusMeters)."""
    min_lat, max_lat, min_lon, max_lon = distance_bbox(lat, lon, radius_m)
    lat_ok = F.col(lat_col).between(min_lat, max_lat)
    if min_lon <= max_lon:
        pre = lat_ok & F.col(lon_col).between(min_lon, max_lon)
    else:
        pre = lat_ok & (
            F.col(lon_col).between(min_lon, MAX_LON)
            | F.col(lon_col).between(MIN_LON, max_lon)
        )
    return pre & (haversine_meters(lat_col, lon_col, lat, lon) <= radius_m)


# --------------------------------------------------------------------------
# standalone DataFrame operators (pipeline style, no index required)
# --------------------------------------------------------------------------


def box_filter(df: DataFrame, lat_col: str, lon_col: str, min_lat: float,
               max_lat: float, min_lon: float, max_lon: float) -> DataFrame:
    return df.filter(
        box_predicate(lat_col, lon_col, min_lat, max_lat, min_lon, max_lon)
    )


def within_distance(df: DataFrame, lat_col: str, lon_col: str, lat: float,
                    lon: float, radius_m: float) -> DataFrame:
    return df.filter(
        distance_predicate(lat_col, lon_col, lat, lon, radius_m)
    )


def nearest(df: DataFrame, lat_col: str, lon_col: str, lat: float,
            lon: float, k: int, id_col: str = "doc_id") -> DataFrame:
    """LatLonPoint.newDistanceSort + TopFieldCollector: top-k nearest
    rows with a ``distance_m`` column; ties break on ascending id
    (LatLonPointDistanceComparator's docID tie-break). One
    TakeOrderedAndProject — no shuffle beyond the top-k reduce."""
    dist = haversine_meters(lat_col, lon_col, lat, lon)
    return (
        df.withColumn("distance_m", dist)
        .orderBy(F.asc("distance_m"), F.asc(id_col))
        .limit(k)
    )
