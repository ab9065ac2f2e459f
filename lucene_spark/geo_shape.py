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


# ---------------------------------------------------------------------------
# LatLonShape analog: per-DOC geometries related to a literal query
# polygon with INTERSECTS / WITHIN / DISJOINT / CONTAINS.
#
# Reference: document/LatLonShape.java:67 (createIndexableFields
# tessellates polygons/lines/points into triangles in the BKD tree) and
# document/LatLonShapeQuery.java (SpatialQuery relate loop over
# triangle leaves, queryRelation INTERSECTS/WITHIN/DISJOINT/CONTAINS,
# ShapeField.QueryRelation).
#
# Spark-first re-expression: a doc's geometry is DATA — two
# array<double> columns (ring vertices, open ring for polygons,
# polyline for lines, single element for points). No tessellation: the
# relation test against the literal query polygon unrolls into pure
# Column expressions over the vertex arrays —
#   - bbox prune (the BKD outer-node analog; with materialized
#     min/max columns it is parquet row-group prunable),
#   - vertex-in-polygon parity (doc vertices vs query rings, query
#     vertices vs doc ring) via the same crossing-number terms as
#     polygon_predicate,
#   - proper edge-pair crossing (orientation sign tests) with the
#     query edges unrolled as literals and the doc edges folded with
#     F.aggregate/F.exists over the vertex arrays — whole-stage
#     codegen, no Python UDF, no shuffle.
#
# Documented conventions (double math; the reference uses exact
# orientation predicates over quantized ints):
#   - edge crossings are PROPER crossings (strict sign tests);
#     boundary-touching cases resolve via the vertex parity tests, so
#     gate fixtures avoid exact-touch coordinates;
#   - polygon relations: INTERSECTS = any doc vertex inside query
#     (minus holes) OR any query outer/hole vertex inside doc OR any
#     edge pair crossing; WITHIN = every doc vertex inside AND no
#     crossing; DISJOINT = NOT INTERSECTS; CONTAINS = every query
#     outer vertex inside doc AND no crossing (doc-side holes are not
#     modeled, like LatLonShape's triangle decomposition of simple
#     rings).

SHAPE_RELATIONS = ("intersects", "within", "disjoint", "contains")


def _vtx(lats, lons, i):
    return F.element_at(lats, i + 1), F.element_at(lons, i + 1)


def _pt_in_doc(qlat: float, qlon: float, lats, lons):
    """Literal point inside the doc ring (crossing parity, same
    semi-open edge rule as _crossings)."""
    n = F.size(lats)
    idx = F.sequence(F.lit(0), n - 1)

    def term(acc, i):
        y1, x1 = _vtx(lats, lons, i)
        j = F.when(i + 1 < n, i + 1).otherwise(F.lit(0))
        y2, x2 = _vtx(lats, lons, j)
        straddles = (y1 > F.lit(qlat)) != (y2 > F.lit(qlat))
        x_at = x1 + (F.lit(qlat) - y1) * (x2 - x1) / (y2 - y1)
        return acc + F.when(straddles & (F.lit(qlon) < x_at), 1).otherwise(0)

    return F.aggregate(idx, F.lit(0), term) % 2 == 1


def _sgn(x):
    return F.when(x > 0, 1).when(x < 0, -1).otherwise(0)


def _doc_edges_cross_q(lats, lons, qpts: list, closed: bool):
    """ANY doc edge properly crosses ANY query-ring edge (query edges
    are literals, doc edges fold over the arrays)."""
    n = F.size(lats)
    last_start = (n - 1) if closed else (n - 2)
    idx = F.sequence(F.lit(0), F.greatest(last_start, F.lit(-1)))
    m = len(qpts)

    def crosses(i):
        ay, ax = _vtx(lats, lons, i)
        j = F.when(i + 1 < n, i + 1).otherwise(F.lit(0))
        by, bx = _vtx(lats, lons, j)
        cond = F.lit(False)
        for k in range(m):
            cy, cx = qpts[k]
            dy, dx = qpts[(k + 1) % m]
            o1 = _sgn((bx - ax) * (F.lit(cy) - ay) - (by - ay) * (F.lit(cx) - ax))
            o2 = _sgn((bx - ax) * (F.lit(dy) - ay) - (by - ay) * (F.lit(dx) - ax))
            o3 = _sgn(
                F.lit(dx - cx) * (ay - F.lit(cy)) - F.lit(dy - cy) * (ax - F.lit(cx))
            )
            o4 = _sgn(
                F.lit(dx - cx) * (by - F.lit(cy)) - F.lit(dy - cy) * (bx - F.lit(cx))
            )
            cond = cond | ((o1 * o2 < 0) & (o3 * o4 < 0))
        return cond

    return F.exists(idx, crosses)


def shape_relation_predicate(lats_col: str, lons_col: str, polygon,
                             relation: str = "intersects", holes=(),
                             kind: str = "polygon",
                             bbox_cols=None) -> Column:
    """Relation between each doc's geometry (vertex arrays) and the
    literal query polygon. ``kind``: "polygon" (closed ring), "line"
    (open polyline) or "point" (1 vertex). ``bbox_cols`` =
    (minlat, maxlat, minlon, maxlon) column names to use materialized,
    parquet-prunable bounds instead of array_min/array_max."""
    if relation not in SHAPE_RELATIONS:
        raise ValueError(relation)
    qpts = _validate(polygon)
    qholes = [_validate(h) for h in holes]
    lats, lons = F.col(lats_col), F.col(lons_col)
    closed = kind == "polygon"

    qmin_lat = min(p[0] for p in qpts)
    qmax_lat = max(p[0] for p in qpts)
    qmin_lon = min(p[1] for p in qpts)
    qmax_lon = max(p[1] for p in qpts)
    if bbox_cols:
        dminlat, dmaxlat, dminlon, dmaxlon = (F.col(c) for c in bbox_cols)
    else:
        dminlat, dmaxlat = F.array_min(lats), F.array_max(lats)
        dminlon, dmaxlon = F.array_min(lons), F.array_max(lons)
    bbox_overlap = (
        (dminlat <= F.lit(qmax_lat)) & (dmaxlat >= F.lit(qmin_lat))
        & (dminlon <= F.lit(qmax_lon)) & (dmaxlon >= F.lit(qmin_lon))
    )
    # doc bbox fully inside query bbox is necessary for WITHIN
    bbox_within = (
        (dminlat >= F.lit(qmin_lat)) & (dmaxlat <= F.lit(qmax_lat))
        & (dminlon >= F.lit(qmin_lon)) & (dmaxlon <= F.lit(qmax_lon))
    )

    def in_q(lat_e, lon_e):
        ins = _crossings(lat_e, lon_e, qpts) % 2 == 1
        for h in qholes:
            ins = ins & ~(_crossings(lat_e, lon_e, h) % 2 == 1)
        return ins

    n = F.size(lats)
    vidx = F.sequence(F.lit(0), n - 1)
    any_vertex_in_q = F.exists(
        vidx, lambda i: in_q(*_vtx(lats, lons, i))
    )
    all_vertices_in_q = F.forall(
        vidx, lambda i: in_q(*_vtx(lats, lons, i))
    )

    if kind == "point":
        pt_in = in_q(F.element_at(lats, 1), F.element_at(lons, 1))
        if relation in ("intersects", "within"):
            return bbox_overlap & pt_in
        if relation == "disjoint":
            return ~(bbox_overlap & pt_in)
        return F.lit(False)  # a point never CONTAINS a polygon

    rings = [qpts] + qholes
    any_cross = F.lit(False)
    for ring in rings:
        any_cross = any_cross | _doc_edges_cross_q(lats, lons, ring, closed)
    any_q_vertex_in_doc = F.lit(False)
    if closed:
        for ring in rings:
            for (qy, qx) in ring:
                any_q_vertex_in_doc = any_q_vertex_in_doc | _pt_in_doc(
                    qy, qx, lats, lons
                )

    intersects = bbox_overlap & (
        any_vertex_in_q | any_q_vertex_in_doc | any_cross
    )
    if relation == "intersects":
        return intersects
    if relation == "disjoint":
        return ~intersects
    if relation == "within":
        return bbox_overlap & bbox_within & all_vertices_in_q & ~any_cross
    # contains: only a closed doc ring can contain the query polygon
    if not closed:
        return F.lit(False)
    all_q_outer_in_doc = F.lit(True)
    for (qy, qx) in qpts:
        all_q_outer_in_doc = all_q_outer_in_doc & _pt_in_doc(
            qy, qx, lats, lons
        )
    return bbox_overlap & all_q_outer_in_doc & ~any_cross


def shape_filter(df: DataFrame, lats_col: str, lons_col: str, polygon,
                 relation: str = "intersects", holes=(),
                 kind: str = "polygon", bbox_cols=None) -> DataFrame:
    return df.filter(shape_relation_predicate(
        lats_col, lons_col, polygon, relation, holes, kind, bbox_cols
    ))


# --- ANSI-SQL twin (unrolled doc vertices) for the DuckDB oracles ----------

def _pt_in_ring_sql(lat_e: str, lon_e: str, ring) -> str:
    return f"({_crossings_sql(lat_e, lon_e, ring)} % 2 = 1)"


def _pt_in_doc_sql(qy: float, qx: float, dpts: list) -> str:
    qy_s, qx_s = f"({qy!r})", f"({qx!r})"
    terms = []
    n = len(dpts)
    for i in range(n):
        y1, x1 = dpts[i]
        y2, x2 = dpts[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1} > {qy_s}) <> ({y2} > {qy_s})) AND"
            f" ({qx_s} < ({x1}) + ({qy_s} - ({y1})) * (({x2}) - ({x1}))"
            f" / (({y2}) - ({y1}))) THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def _sgn_sql(e: str) -> str:
    return f"(CASE WHEN {e} > 0 THEN 1 WHEN {e} < 0 THEN -1 ELSE 0 END)"


def shape_relation_sql(doc_pts: list, polygon, relation: str = "intersects",
                       holes=(), kind: str = "polygon") -> str:
    """SQL twin of shape_relation_predicate for a doc shape whose
    vertices are SQL expression pairs ``[(lat_sql, lon_sql), ...]``
    (the gate's shapes are pure functions of doc_id, so the oracle
    unrolls them). Same conventions, same edge terms."""
    if relation not in SHAPE_RELATIONS:
        raise ValueError(relation)
    qpts = _validate(polygon)
    qholes = [_validate(h) for h in holes]
    closed = kind == "polygon"
    n = len(doc_pts)

    def in_q_sql(lat_e, lon_e):
        s = _pt_in_ring_sql(lat_e, lon_e, qpts)
        for h in qholes:
            s += f" AND NOT {_pt_in_ring_sql(lat_e, lon_e, h)}"
        return f"({s})"

    any_v_in_q = " OR ".join(in_q_sql(y, x) for y, x in doc_pts)
    all_v_in_q = " AND ".join(in_q_sql(y, x) for y, x in doc_pts)

    cross_terms = []
    edge_count = n if closed else n - 1
    rings = [qpts] + qholes
    for i in range(edge_count):
        ay, ax = doc_pts[i]
        by, bx = doc_pts[(i + 1) % n]
        for ring in rings:
            m = len(ring)
            for k in range(m):
                cy, cx = ring[k]
                dy, dx = ring[(k + 1) % m]
                cy_s, cx_s = f"({cy!r})", f"({cx!r})"
                dy_s, dx_s = f"({dy!r})", f"({dx!r})"
                ddx, ddy = f"({dx - cx!r})", f"({dy - cy!r})"
                o1 = _sgn_sql(
                    f"((({bx})-({ax})) * ({cy_s}-({ay})) - (({by})-({ay})) * ({cx_s}-({ax})))"
                )
                o2 = _sgn_sql(
                    f"((({bx})-({ax})) * ({dy_s}-({ay})) - (({by})-({ay})) * ({dx_s}-({ax})))"
                )
                o3 = _sgn_sql(
                    f"({ddx} * (({ay})-{cy_s}) - {ddy} * (({ax})-{cx_s}))"
                )
                o4 = _sgn_sql(
                    f"({ddx} * (({by})-{cy_s}) - {ddy} * (({bx})-{cx_s}))"
                )
                cross_terms.append(
                    f"({o1} * {o2} < 0 AND {o3} * {o4} < 0)"
                )
    any_cross = "(" + " OR ".join(cross_terms) + ")"

    q_in_doc_terms = []
    if closed:
        for ring in rings:
            for (qy, qx) in ring:
                q_in_doc_terms.append(_pt_in_doc_sql(qy, qx, doc_pts))
    any_q_in_doc = (
        "(" + " OR ".join(q_in_doc_terms) + ")" if q_in_doc_terms else "FALSE"
    )

    intersects = f"(({any_v_in_q}) OR {any_q_in_doc} OR {any_cross})"
    if relation == "intersects":
        return intersects
    if relation == "disjoint":
        return f"(NOT {intersects})"
    if relation == "within":
        return f"(({all_v_in_q}) AND NOT {any_cross})"
    if not closed:
        return "FALSE"
    all_q_in_doc = " AND ".join(
        _pt_in_doc_sql(qy, qx, doc_pts) for qy, qx in qpts
    )
    return f"(({all_q_in_doc}) AND NOT {any_cross})"
