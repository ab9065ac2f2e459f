"""LatLonShape analog (geo_shape.py shape relations + search ShapeQ).

Hand-crafted geometries with known INTERSECTS/WITHIN/DISJOINT/CONTAINS
relations, a brute-force Python mirror for randomized agreement, the
ShapeQ plan node composed with BoolQ over an index, and the SQL-twin
agreement that backs the shape_* driver gates.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from lucene_spark import geo_shape
from lucene_spark.index import Index, build_index
from lucene_spark.search import BoolQ, Searcher, ShapeQ, TermQ

# query: unit square (0,0)-(10,10) with a hole (4,4)-(6,6)
Q = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
Q_HOLE = [(4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0)]


def _diamond(clat, clon, s):
    return (
        [clat - s, clat, clat + s, clat],
        [clon, clon + s, clon, clon - s],
    )


# (center, half-size) -> expected relation against Q (no hole cases
# avoid the hole region)
CASES = [
    # fully inside, away from the hole
    ((2.0, 2.0), 1.0, {"intersects", "within"}),
    # crossing the outer boundary
    ((0.0, 5.0), 2.0, {"intersects"}),
    # fully outside
    ((20.0, 20.0), 3.0, {"disjoint"}),
    # inside the hole -> disjoint (hole subtracts)
    ((5.0, 5.0), 0.5, {"disjoint"}),
    # straddling the hole boundary -> intersects (not within: vertices
    # inside the hole fail the in-query test)
    ((5.0, 3.8), 0.5, {"intersects"}),
    # big diamond containing the whole query square
    ((5.0, 5.0), 30.0, {"intersects", "contains"}),
]


def _build_df(spark):
    rows = []
    for i, ((clat, clon), s, _want) in enumerate(CASES):
        lats, lons = _diamond(clat, clon, s)
        rows.append((i, lats, lons))
    return spark.createDataFrame(rows, "doc_id long, lats array<double>, lons array<double>")


@pytest.mark.parametrize("relation", geo_shape.SHAPE_RELATIONS)
def test_handcrafted_relations(spark, relation):
    df = _build_df(spark)
    got = {
        r.doc_id
        for r in geo_shape.shape_filter(
            df, "lats", "lons", Q, relation, (Q_HOLE,)
        ).collect()
    }
    want = {i for i, (_c, _s, rel) in enumerate(CASES) if relation in rel}
    if relation == "disjoint":
        # disjoint = NOT intersects
        want = {
            i for i, (_c, _s, rel) in enumerate(CASES)
            if "intersects" not in rel
        }
    assert got == want, (relation, got, want)


def test_line_and_point_kinds(spark):
    # line crossing the square, line outside, point inside, point in hole
    line_in = (10, [ -2.0, 2.0], [-2.0, 2.0])   # crosses the corner region
    line_out = (11, [20.0, 25.0], [20.0, 25.0])
    df_lines = spark.createDataFrame(
        [line_in, line_out],
        "doc_id long, lats array<double>, lons array<double>",
    )
    got = {
        r.doc_id
        for r in geo_shape.shape_filter(
            df_lines, "lats", "lons", Q, "intersects", (Q_HOLE,), kind="line"
        ).collect()
    }
    assert got == {10}

    df_pts = spark.createDataFrame(
        [(20, [2.0], [2.0]), (21, [5.0], [5.0]), (22, [50.0], [50.0])],
        "doc_id long, lats array<double>, lons array<double>",
    )
    got_p = {
        r.doc_id
        for r in geo_shape.shape_filter(
            df_pts, "lats", "lons", Q, "intersects", (Q_HOLE,), kind="point"
        ).collect()
    }
    assert got_p == {20}  # 21 is in the hole, 22 outside
    got_w = {
        r.doc_id
        for r in geo_shape.shape_filter(
            df_pts, "lats", "lons", Q, "disjoint", (Q_HOLE,), kind="point"
        ).collect()
    }
    assert got_w == {21, 22}


def test_validation():
    with pytest.raises(ValueError):
        geo_shape.shape_relation_predicate("a", "b", Q, "overlaps")
    with pytest.raises(ValueError):
        ShapeQ("a", "b", tuple(Q), relation="touches")
    with pytest.raises(ValueError):
        ShapeQ("a", "b", tuple(Q), kind="multipoint")


def test_bbox_cols_variant(spark):
    from pyspark.sql import functions as F

    df = _build_df(spark)
    df2 = df.select(
        "*",
        F.array_min("lats").alias("minlat"),
        F.array_max("lats").alias("maxlat"),
        F.array_min("lons").alias("minlon"),
        F.array_max("lons").alias("maxlon"),
    )
    got = {
        r.doc_id
        for r in df2.filter(
            geo_shape.shape_relation_predicate(
                "lats", "lons", Q, "intersects", (Q_HOLE,),
                bbox_cols=("minlat", "maxlat", "minlon", "maxlon"),
            )
        ).collect()
    }
    want = {
        i for i, (_c, _s, rel) in enumerate(CASES) if "intersects" in rel
    }
    assert got == want


def test_shapeq_plan_node_composes_with_boolq(spark, tmp_path_factory):
    """ShapeQ as a FILTER clause beside a scored text query, like
    LatLonShapeQuery inside a BooleanQuery."""
    rows = []
    for i, ((clat, clon), s, _want) in enumerate(CASES):
        lats, lons = _diamond(clat, clon, s)
        rows.append((i, "alpha data" if i % 2 == 0 else "beta data",
                     lats, lons))
    corpus = spark.createDataFrame(
        rows, "doc_id long, content string, lats array<double>, "
              "lons array<double>")
    idx_dir = str(tmp_path_factory.mktemp("shapeidx"))
    build_index(
        spark, corpus, idx_dir, text_col="content", doc_id_col="doc_id",
        keep_cols=["lats", "lons"], num_buckets=2, salt_rows=2048,
    )
    s = Searcher(Index(spark, idx_dir))
    q = BoolQ(
        must=(TermQ("data"),),
        filter=(ShapeQ("lats", "lons", tuple(Q), "intersects",
                       (tuple(Q_HOLE),)),),
    )
    got = {r.doc_id for r in s.top_k(q, 20).collect()}
    want = {i for i, (_c, _s2, rel) in enumerate(CASES)
            if "intersects" in rel}
    assert got == want


def test_sql_twin_agreement(spark):
    """Randomized diamonds: the Spark predicate and the DuckDB SQL twin
    (same edge terms) agree on every relation."""
    rng = np.random.default_rng(7)
    n = 300
    clat = np.round(rng.uniform(-20, 25, n), 2)
    clon = np.round(rng.uniform(-20, 25, n), 2)
    hs = np.round(rng.uniform(0.3, 8.0, n), 2)
    pdf = pd.DataFrame({"doc_id": np.arange(n), "clat": clat,
                        "clon": clon, "hs": hs})
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    sdf = sdf.select(
        "doc_id",
        F.array(F.col("clat") - F.col("hs"), F.col("clat"),
                F.col("clat") + F.col("hs"), F.col("clat")).alias("lats"),
        F.array(F.col("clon"), F.col("clon") + F.col("hs"),
                F.col("clon"), F.col("clon") - F.col("hs")).alias("lons"),
    )
    doc_pts = [("(clat - hs)", "clon"), ("clat", "(clon + hs)"),
               ("(clat + hs)", "clon"), ("clat", "(clon - hs)")]
    con = duckdb.connect()
    con.register("shapes", pdf)
    for relation in geo_shape.SHAPE_RELATIONS:
        got = {
            r.doc_id
            for r in geo_shape.shape_filter(
                sdf, "lats", "lons", Q, relation, (Q_HOLE,)
            ).collect()
        }
        pred = geo_shape.shape_relation_sql(doc_pts, Q, relation, (Q_HOLE,))
        want = set(
            con.sql(f"SELECT doc_id FROM shapes WHERE {pred}")
            .df()["doc_id"].tolist()
        )
        assert got == want, relation
