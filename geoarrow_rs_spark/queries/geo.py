"""geo kernel/overlay query-catalog entries (split from queries.py)."""

from ._shared import *  # noqa: F401,F403
from ._shared import (  # noqa: F401
    _BM25_K1P1,
    _BM25_TERMS,
    _GRAM8_SQL,
    _NG3,
    _NS_GAP,
    _NS_HOUR,
    _banded_block,
    _hits_sql,
    _luhn_sql,
    _minhash_pairs_cte,
    _money_sum,
    _money_sum_sql,
    _spread,
    _t,
)



def geo_point_accessors(spark, sf_dir):
    """Point constructors + X/Y accessors over customer-derived coordinates."""
    c = _t(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "ST_X(ST_Point(c_acctbal, CAST(c_custkey AS DOUBLE))) AS x",
        "ST_Y(ST_Point(c_acctbal, CAST(c_custkey AS DOUBLE))) AS y",
    )


ORACLE_GEO_POINT = """
SELECT c_custkey, c_acctbal AS x, CAST(c_custkey AS DOUBLE) AS y FROM customer
"""


def geo_distance(spark, sf_dir):
    """Planar ST_Distance between constructed point pairs (vectorized point fast path)."""
    o = _t(spark, sf_dir, "orders")
    # fused composite (r8): ST_DistanceXY = ST_Distance(ST_Point, ST_Point)
    # worker-side — 1 ArrowEvalPython node instead of the 2-level chain
    return o.selectExpr(
        "o_orderkey",
        # axis-aligned distance: exact (no sqrt) — |x|
        "ST_DistanceXY(o_totalprice, 0.0, 0.0, 0.0) AS d_axis",
        # euclidean with sqrt: rounded to tolerate hypot-vs-sqrt ulp diffs
        "round(ST_DistanceXY(o_totalprice, CAST(o_custkey % 1000 AS DOUBLE), 0.0, 0.0), 2) AS d_euclid",
    )


ORACLE_GEO_DISTANCE = """
SELECT o_orderkey,
       o_totalprice AS d_axis,
       round(sqrt(o_totalprice * o_totalprice +
                  CAST(o_custkey % 1000 AS DOUBLE) * CAST(o_custkey % 1000 AS DOUBLE)), 2) AS d_euclid
FROM orders
"""


def geo_box_measures(spark, sf_dir):
    """Envelope area/perimeter measures from ST_MakeEnvelope boxes."""
    p = _t(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "ST_Area(ST_MakeEnvelope(0.0, 0.0, CAST(p_size AS DOUBLE), CAST(p_size + 3 AS DOUBLE))) AS box_area",
        "ST_Perimeter(ST_MakeEnvelope(0.0, 0.0, CAST(p_size AS DOUBLE), CAST(p_size + 3 AS DOUBLE))) AS box_perimeter",
    )


ORACLE_GEO_BOX = """
SELECT p_partkey,
       CAST(p_size AS DOUBLE) * CAST(p_size + 3 AS DOUBLE) AS box_area,
       2.0 * (CAST(p_size AS DOUBLE) + CAST(p_size + 3 AS DOUBLE)) AS box_perimeter
FROM part
"""


def geo_total_bounds(spark, sf_dir):
    """Corpus-wide extent: native min/max aggregation over bbox structs."""
    s = _t(spark, sf_dir, "supplier").selectExpr(
        "ST_BBox(ST_Point(s_acctbal, CAST(s_suppkey AS DOUBLE))) AS b"
    )
    return s.agg(
        F.min("b.xmin").alias("xmin"),
        F.min("b.ymin").alias("ymin"),
        F.max("b.xmax").alias("xmax"),
        F.max("b.ymax").alias("ymax"),
    )


ORACLE_GEO_BOUNDS = """
SELECT MIN(s_acctbal) AS xmin, MIN(CAST(s_suppkey AS DOUBLE)) AS ymin,
       MAX(s_acctbal) AS xmax, MAX(CAST(s_suppkey AS DOUBLE)) AS ymax
FROM supplier
"""


def geo_spatial_join(spark, sf_dir):
    """Points-in-boxes spatial join via the PBSM grid strategy."""
    pts = _t(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        "ST_Point(c_acctbal, CAST(c_custkey % 500 AS DOUBLE)) AS geometry",
        "named_struct('xmin', c_acctbal, 'ymin', CAST(c_custkey % 500 AS DOUBLE), "
        "'xmax', c_acctbal, 'ymax', CAST(c_custkey % 500 AS DOUBLE)) AS bbox",
    )
    boxes = _t(spark, sf_dir, "nation").selectExpr(
        "n_nationkey",
        "ST_MakeEnvelope(CAST(n_nationkey * 400 - 1000 AS DOUBLE), 0.0, "
        "CAST(n_nationkey * 400 - 550 AS DOUBLE), CAST(100 + n_nationkey * 20 AS DOUBLE)) AS geometry",
        "named_struct('xmin', CAST(n_nationkey * 400 - 1000 AS DOUBLE), 'ymin', 0.0, "
        "'xmax', CAST(n_nationkey * 400 - 550 AS DOUBLE), 'ymax', CAST(100 + n_nationkey * 20 AS DOUBLE)) AS box_bbox",
    )
    # points vs axis-aligned envelopes with native covering structs: every
    # geometry equals its own bbox, so the bbox test IS ST_Intersects —
    # refine="bbox" + explicit bbox columns keep the whole join inside
    # whole-stage codegen (zero Python at any scale).
    joined = spatial_join(
        pts,
        boxes.withColumnRenamed("geometry", "box_geom"),
        left_geom="geometry",
        right_geom="box_geom",
        predicate="intersects",
        strategy="grid",
        cell_size=500.0,
        refine="bbox",
        left_bbox="bbox",
        right_bbox="box_bbox",
    )
    return joined.groupBy("n_nationkey").agg(F.count(F.lit(1)).alias("n_points"))


ORACLE_GEO_SJOIN = """
SELECT n_nationkey, COUNT(*) AS n_points
FROM nation JOIN customer
  ON c_acctbal >= CAST(n_nationkey * 400 - 1000 AS DOUBLE)
 AND c_acctbal <= CAST(n_nationkey * 400 - 550 AS DOUBLE)
 AND CAST(c_custkey % 500 AS DOUBLE) >= 0.0
 AND CAST(c_custkey % 500 AS DOUBLE) <= CAST(100 + n_nationkey * 20 AS DOUBLE)
GROUP BY n_nationkey
"""


def geo_within_triangle(spark, sf_dir):
    """Constant-region geofence: ST_Within(point, const polygon) compiled
    to native ray-cast arithmetic (point_in_polygon_expr) — no Python in
    the plan, filter-eligible for pushdown. The pUDF ST_Within surface is
    exercised separately in tests/test_functions.py."""
    from ..functions.registry import point_in_polygon_expr

    c = _t(spark, sf_dir, "customer")
    inside = point_in_polygon_expr(
        F.col("c_acctbal"),
        (F.col("c_custkey") % 450).cast("double"),
        [(0, 0), (8000, 0), (0, 400)],
        boundary="exclude",
    )
    return c.select("c_custkey", inside.alias("inside"))


ORACLE_GEO_WITHIN = """
SELECT c_custkey,
       (c_acctbal > 0 AND CAST(c_custkey % 450 AS DOUBLE) > 0
        AND (c_acctbal * 400.0 + CAST(c_custkey % 450 AS DOUBLE) * 8000.0) < 3200000.0) AS inside
FROM customer
"""


def geo_centroid(spark, sf_dir):
    """ST_Centroid of constructed polygons with closed-form coordinates."""
    p = _t(spark, sf_dir, "part")
    env = "ST_MakeEnvelope(0.0, 0.0, CAST(p_size * 2 AS DOUBLE), 10.0)"
    return p.selectExpr(
        "p_partkey",
        f"ST_X(ST_Centroid({env})) AS cx",
        f"ST_Y(ST_Centroid({env})) AS cy",
    )


ORACLE_GEO_CENTROID = """
SELECT p_partkey, CAST(p_size AS DOUBLE) AS cx, 5.0 AS cy FROM part
"""


def geo_buffer_area(spark, sf_dir):
    """ST_Buffer around points; area vs the exact pi*r^2-series oracle."""
    o = _t(spark, sf_dir, "orders")
    return o.selectExpr(
        "o_orderkey",
        "round(ST_Area(ST_Buffer(ST_Point(0.0, 0.0), CAST(1 + o_orderkey % 5 AS DOUBLE), 8)), 4) AS buf_area",
    )


ORACLE_GEO_BUFFER = """
SELECT o_orderkey,
       round(0.5 * 32.0 * CAST(1 + o_orderkey % 5 AS DOUBLE) * CAST(1 + o_orderkey % 5 AS DOUBLE)
             * sin(2.0 * pi() / 32.0), 4) AS buf_area
FROM orders
"""


def geo_convex_hull(spark, sf_dir):
    """ST_ConvexHull of a 3-point collection; area = triangle closed form.
    _spread: the construction chain is pure python-kernel work straight off
    a single-file scan — parallelize it before the UDF chain runs."""
    o = _spread(_t(spark, sf_dir, "orders"))
    x = "CAST(o_orderkey % 100 + 1 AS DOUBLE)"
    y = "CAST(o_custkey % 50 + 1 AS DOUBLE)"
    return o.selectExpr(
        "o_orderkey",
        f"ST_Area(ST_ConvexHull(ST_Collect(ST_Collect(ST_Point(0.0, 0.0), ST_Point({x}, 0.0)), ST_Point(0.0, {y})))) AS hull_area",
    )


ORACLE_GEO_HULL = """
SELECT o_orderkey,
       CAST(o_orderkey % 100 + 1 AS DOUBLE) * CAST(o_custkey % 50 + 1 AS DOUBLE) / 2.0 AS hull_area
FROM orders
"""


def geo_multipolygon_stats(spark, sf_dir):
    """Countries-shaped workload: a per-row MultiPolygon (two disjoint
    squares) pushed through area/perimeter/centroid/convex-hull — the mixed
    Multi* batch-decode fast path end to end (the content-keyed decode cache
    makes the five chained ST_ calls share one decode). Mirrors the
    reference's MultiPolygon area bench
    (/root/reference/rust/geoarrow-old/benches/area.rs:1-36)."""
    o = _spread(_t(spark, sf_dir, "orders"))
    s = "CAST(o_orderkey % 50 + 1 AS DOUBLE)"
    t = "CAST(o_orderkey % 50 + 1 + o_custkey % 7 + 1 AS DOUBLE)"
    # fused composite kernel (r8): the former 3-level ArrowEvalPython chain
    # (envelopes -> collect -> extract+5 stats, 3 Arrow round trips) runs
    # worker-side as ONE kernel call — ST_BoxPairStats delegates to the
    # identical kernel sequence, so values are bit-identical; the five
    # textually-repeated calls share one slot (semantic equality) and the
    # struct fields are native JVM GetStructField projections
    st = f"ST_BoxPairStats(0.0, 0.0, {s}, {s}, {t}, 0.0, {t} + {s}, {s})"
    return o.selectExpr(
        "o_orderkey",
        f"{st}.area AS mp_area",
        f"{st}.perimeter AS mp_perimeter",
        f"round({st}.cx, 6) AS cx",
        f"round({st}.cy, 6) AS cy",
        f"{st}.hull_area AS hull_area",
    )


# two side-by-side axis-aligned squares: every stat has a closed form
ORACLE_GEO_MULTIPOLYGON = """
SELECT o_orderkey,
       2.0 * st * st AS mp_area,
       8.0 * st AS mp_perimeter,
       round((st + tt) / 2.0, 6) AS cx,
       round(st / 2.0, 6) AS cy,
       (tt + st) * st AS hull_area
FROM (
  SELECT o_orderkey,
         CAST(o_orderkey % 50 + 1 AS DOUBLE) AS st,
         CAST(o_orderkey % 50 + 1 + o_custkey % 7 + 1 AS DOUBLE) AS tt
  FROM orders
)
"""


def geo_wkt_types(spark, sf_dir):
    """WKT parse + ST_GeometryType / GeoArrow type-id across all 7 types."""
    o = _t(spark, sf_dir, "orders")
    wkt = (
        "CASE CAST(o_orderkey % 4 AS INT) "
        "WHEN 0 THEN 'POINT (1 2)' "
        "WHEN 1 THEN 'LINESTRING (0 0, 5 0, 5 5)' "
        "WHEN 2 THEN 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))' "
        "ELSE 'MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))' END"
    )
    g = f"ST_GeomFromWKT({wkt})"
    return (
        o.selectExpr(
            f"ST_GeometryType({g}) AS gtype",
            f"ST_GeoArrowTypeId({g}) AS type_id",
            f"ST_NPoints({g}) AS npoints",
            f"ST_NumGeometries({g}) AS ngeoms",
        )
        .groupBy("gtype", "type_id", "npoints", "ngeoms")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_GEO_WKT_TYPES = """
SELECT gtype, type_id, npoints, ngeoms, COUNT(*) AS n FROM (
  SELECT CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN 'ST_Point' WHEN 1 THEN 'ST_LineString'
           WHEN 2 THEN 'ST_Polygon' ELSE 'ST_MultiPolygon' END AS gtype,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE 6 END AS type_id,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 5 ELSE 10 END AS npoints,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 2 END AS ngeoms
  FROM orders
) GROUP BY gtype, type_id, npoints, ngeoms
"""


def geo_simplify_scale(spark, sf_dir):
    """ST_Simplify after an affine scale: RDP collapses the collinear midpoint."""
    li = _spread(_t(spark, sf_dir, "lineitem"))
    sx = "CAST(l_partkey % 20 + 1 AS DOUBLE)"
    g = f"ST_Affine(ST_GeomFromWKT('LINESTRING (0 0, 5 0.1, 10 0)'), {sx}, 0.0, 0.0, 1.0, 0.0, 0.0)"
    # construct-once: build + simplify once, measure twice (the column has
    # only 20 distinct geometries — the chain would otherwise run per
    # output column over the full lineitem scan); _spread parallelizes the
    # python kernel loop over the biggest table's single-file scan
    return li.selectExpr(
        "l_orderkey", "l_linenumber", f"ST_Simplify({g}, 1.0) AS s"
    ).selectExpr(
        "l_orderkey",
        "l_linenumber",
        "ST_Length(s) AS len_simplified",
        "ST_NPoints(s) AS np_simplified",
    )


ORACLE_GEO_SIMPLIFY = """
SELECT l_orderkey, l_linenumber,
       10.0 * CAST(l_partkey % 20 + 1 AS DOUBLE) AS len_simplified,
       2 AS np_simplified
FROM lineitem
"""


def geo_clip(spark, sf_dir):
    """ST_ClipByBox2D of envelope families; area by interval intersection."""
    p = _t(spark, sf_dir, "part")
    box = "ST_MakeEnvelope(0.0, 0.0, CAST(p_size AS DOUBLE), CAST(p_size AS DOUBLE))"
    return p.selectExpr(
        "p_partkey",
        f"ST_Area(ST_ClipByBox2D({box}, 3.0, 3.0, 40.0, 40.0)) AS clip_area",
    )


ORACLE_GEO_CLIP = """
SELECT p_partkey,
       CASE WHEN p_size > 3
            THEN (LEAST(CAST(p_size AS DOUBLE), 40.0) - 3.0) * (LEAST(CAST(p_size AS DOUBLE), 40.0) - 3.0)
            ELSE 0.0 END AS clip_area
FROM part
"""


def geo_geohash(spark, sf_dir):
    """Geohash encode + decode round trip. Cell centers are exact dyadic
    rationals (360/2^15 = 45/2^12), so both engines produce bit-identical
    doubles with no rounding."""
    c = _t(spark, sf_dir, "customer")
    gh = "ST_GeoHash(ST_Point(CAST(c_custkey % 360 - 180 AS DOUBLE) + 0.5, CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5), 6)"
    return c.selectExpr(
        "c_custkey",
        f"{gh} AS gh",
        f"ST_X(ST_GeoHashDecode({gh})) AS cell_lon",
        f"ST_Y(ST_GeoHashDecode({gh})) AS cell_lat",
    )


def geo_line_interpolate(spark, sf_dir):
    """ST_LineInterpolatePoint at per-row fractions along axis lines."""
    p = _t(spark, sf_dir, "part")
    x = "CAST(p_size AS DOUBLE)"  # integer-valued; frac 0.25 is a power of two
    line = f"ST_MakeLine(ST_Point(0.0, 0.0), ST_Point({x}, 0.0))"
    return p.selectExpr(
        "p_partkey",
        f"ST_X(ST_LineInterpolatePoint({line}, 0.25)) AS x_quarter",
        f"ST_LineLocatePoint({line}, ST_Point({x}, 3.0)) AS loc_end",
    )


ORACLE_GEO_LINE_INTERP = """
SELECT p_partkey, CAST(p_size AS DOUBLE) * 0.25 AS x_quarter, 1.0 AS loc_end
FROM part
"""


def geo_center_envelope(spark, sf_dir):
    """ST_Center / ST_Envelope of boxes (bbox midpoint closed form)."""
    s = _t(spark, sf_dir, "supplier")
    two = (
        "ST_Collect(ST_Point(CAST(s_suppkey % 40 AS DOUBLE), 0.0), "
        "ST_Point(CAST(s_suppkey % 40 + 10 AS DOUBLE), 8.0))"
    )
    return s.selectExpr(
        "s_suppkey",
        f"ST_X(ST_Center({two})) AS center_x",
        f"ST_Area(ST_Envelope({two})) AS env_area",
    )


ORACLE_GEO_CENTER = """
SELECT s_suppkey, CAST(s_suppkey % 40 AS DOUBLE) + 5.0 AS center_x, 80.0 AS env_area
FROM supplier
"""


def geo_dump_explode(spark, sf_dir):
    """ST_Dump + explode: one row per part (the reference's table explode,
    explode.rs:206)."""
    from ..ops import explode_geometries

    o = _t(spark, sf_dir, "orders")
    x = "CAST(o_orderkey % 100 AS DOUBLE)"
    geom = (
        f"ST_Collect(ST_Collect(ST_Point({x}, 1.0), ST_Point({x} + 1.0, 2.0)), "
        f"ST_Point({x} + 2.0, 3.0))"
    )
    df = o.selectExpr("o_orderkey", f"{geom} AS geometry")
    ex = explode_geometries(df, "geometry")
    return ex.selectExpr("o_orderkey", "ST_X(geometry) AS px", "ST_Y(geometry) AS py")


ORACLE_GEO_DUMP = """
SELECT o_orderkey, CAST(o_orderkey % 100 AS DOUBLE) + d.k AS px, 1.0 + d.k AS py
FROM orders, (SELECT UNNEST([0.0, 1.0, 2.0]) AS k) d
"""


def geo_geojson_roundtrip(spark, sf_dir):
    """ST_AsGeoJSON -> ST_GeomFromGeoJSON round trip preserves geometry."""
    c = _t(spark, sf_dir, "customer")
    pt = "ST_Point(CAST(c_custkey % 1000 AS DOUBLE), CAST(c_nationkey AS DOUBLE))"
    return c.selectExpr(
        "c_custkey",
        f"ST_X(ST_GeomFromGeoJSON(ST_AsGeoJSON({pt}))) AS gx",
        f"ST_Y(ST_GeomFromGeoJSON(ST_AsGeoJSON({pt}))) AS gy",
    )


ORACLE_GEO_GEOJSON = """
SELECT c_custkey, CAST(c_custkey % 1000 AS DOUBLE) AS gx, CAST(c_nationkey AS DOUBLE) AS gy
FROM customer
"""


def geo_overlay_areas(spark, sf_dir):
    """Polygon boolean ops with integer-coordinate boxes (exact arithmetic
    both engines). Box A = (0,0,p_size,p_size), B = (3,3,43,43)."""
    p = _t(spark, sf_dir, "part")
    a = "ST_MakeEnvelope(0.0, 0.0, CAST(p_size AS DOUBLE), CAST(p_size AS DOUBLE))"
    b = "ST_MakeEnvelope(3.0, 3.0, 43.0, 43.0)"
    return p.selectExpr(
        "p_partkey",
        f"ST_Area(ST_Intersection({a}, {b})) AS inter_area",
        f"ST_Area(ST_Union({a}, {b})) AS union_area",
        f"ST_Area(ST_Difference({a}, {b})) AS diff_area",
        f"ST_Area(ST_SymDifference({a}, {b})) AS sym_area",
    )


ORACLE_GEO_OVERLAY = """
SELECT p_partkey,
       ia AS inter_area,
       pa + 1600.0 - ia AS union_area,
       pa - ia AS diff_area,
       pa + 1600.0 - 2.0 * ia AS sym_area
FROM (
  SELECT p_partkey,
         CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE) AS pa,
         CASE WHEN p_size > 3
              THEN (LEAST(CAST(p_size AS DOUBLE), 43.0) - 3.0) * (LEAST(CAST(p_size AS DOUBLE), 43.0) - 3.0)
              ELSE 0.0 END AS ia
  FROM part
)
"""


def geo_relate_matrix(spark, sf_dir):
    """DE-9IM relate strings between box A=(0,0,s,s) and fixed box
    B=(3,3,43,43); the matrix depends only on the size class of s."""
    p = _t(spark, sf_dir, "part")
    a = "ST_MakeEnvelope(0.0, 0.0, CAST(p_size AS DOUBLE), CAST(p_size AS DOUBLE))"
    b = "ST_MakeEnvelope(3.0, 3.0, 43.0, 43.0)"
    return (
        p.selectExpr("p_partkey", f"ST_Relate({a}, {b}) AS de9im")
    )


ORACLE_GEO_RELATE = """
SELECT p_partkey,
       CASE WHEN p_size < 3 THEN 'FF2FF1212'
            WHEN p_size = 3 THEN 'FF2F01212'
            WHEN p_size < 43 THEN '212101212'
            WHEN p_size = 43 THEN '212F11FF2'
            ELSE '212FF1FF2' END AS de9im
FROM part
"""


def geo_buffer_line(spark, sf_dir):
    """Line-capsule buffer area: 2*r*L + (regular-polygon circle area).
    With quadsegs=8 the caps sum to a full inscribed 32-gon."""
    s = _t(spark, sf_dir, "supplier")
    ln = "ST_MakeLine(ST_Point(0.0, 0.0), ST_Point(CAST(s_suppkey % 50 + 10 AS DOUBLE), 0.0))"
    return s.selectExpr(
        "s_suppkey",
        f"round(ST_Area(ST_Buffer({ln}, 2.0, 8)), 3) AS buf_area",
    )


ORACLE_GEO_BUFFER_LINE = """
SELECT s_suppkey,
       round(2.0 * 2.0 * CAST(s_suppkey % 50 + 10 AS DOUBLE)
             + 0.5 * 32.0 * 4.0 * sin(2.0 * pi() / 32.0), 3) AS buf_area
FROM supplier
"""


def geo_azimuth(spark, sf_dir):
    """Bearing between derived points; atan2 is available in both engines
    (identical libm-correct results, rounded to absorb any last-ulp drift)."""
    o = _t(spark, sf_dir, "orders")
    x2 = "CAST(o_orderkey % 100 AS DOUBLE)"
    y2 = "CAST(o_custkey % 100 AS DOUBLE)"
    return o.selectExpr(
        "o_orderkey",
        f"round(ST_Azimuth(ST_Point(0.0, 0.0), ST_Point({x2}, {y2})), 9) AS az",
    ).where(f"NOT ({x2} = 0.0 AND {y2} = 0.0)")


ORACLE_GEO_AZIMUTH = """
SELECT o_orderkey,
       round(CASE WHEN atan2(CAST(o_orderkey % 100 AS DOUBLE), CAST(o_custkey % 100 AS DOUBLE)) >= 0
                  THEN atan2(CAST(o_orderkey % 100 AS DOUBLE), CAST(o_custkey % 100 AS DOUBLE))
                  ELSE atan2(CAST(o_orderkey % 100 AS DOUBLE), CAST(o_custkey % 100 AS DOUBLE)) + 2.0 * pi()
             END, 9) AS az
FROM orders
WHERE NOT (CAST(o_orderkey % 100 AS DOUBLE) = 0.0 AND CAST(o_custkey % 100 AS DOUBLE) = 0.0)
"""


def geo_reverse_flip(spark, sf_dir):
    """ST_Reverse / ST_FlipCoordinates structural checks (exact)."""
    p = _t(spark, sf_dir, "part")
    line = "ST_MakeLine(ST_Point(CAST(p_size AS DOUBLE), 1.0), ST_Point(0.0, 2.0))"
    return p.selectExpr(
        "p_partkey",
        f"ST_X(ST_StartPoint(ST_Reverse({line}))) AS rev_start_x",
        f"ST_Y(ST_StartPoint(ST_FlipCoordinates({line}))) AS flip_start_y",
    )


ORACLE_GEO_REVERSE = """
SELECT p_partkey, 0.0 AS rev_start_x, CAST(p_size AS DOUBLE) AS flip_start_y
FROM part
"""


def geo_areal_interpolation(spark, sf_dir):
    """Areal interpolation: part 'footprints' (envelope family) apportion
    their retail price to two fixed zones by exact overlap-area fraction
    (ST_Intersection area / footprint area) — the classic GIS transfer of
    an attribute between incompatible zone systems, composed from the
    overlay engine + an exact-cents aggregation. The memoized kernels
    collapse the 50-distinct-box family to one overlay per distinct
    input pair."""
    p = _t(spark, sf_dir, "part")
    foot = "ST_MakeEnvelope(0.0, 0.0, CAST(p_size AS DOUBLE), CAST(p_size AS DOUBLE))"
    zones = [("west", "ST_MakeEnvelope(0.0, 0.0, 25.0, 50.0)"),
             ("east", "ST_MakeEnvelope(25.0, 0.0, 50.0, 50.0)")]
    parts = []
    for zname, zbox in zones:
        parts.append(
            p.selectExpr(
                f"'{zname}' AS zone",
                "p_retailprice",
                f"ST_Area(ST_Intersection({foot}, {zbox})) AS __ia",
                f"ST_Area({foot}) AS __fa",
            )
        )
    u = parts[0].unionByName(parts[1])
    # apportioned cents = round half-up of price*fraction in cents (exact
    # integer-total arithmetic, deterministic in both engines)
    frac = F.when(F.col("__fa") > 0, F.col("__ia") / F.col("__fa")).otherwise(F.lit(0.0))
    cents = F.floor(F.col("p_retailprice") * frac * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (
        u.groupBy("zone")
        .agg((F.sum(cents).cast("double") / F.lit(100.0)).alias("apportioned_value"))
    )


ORACLE_GEO_AREAL = """
WITH f AS (
  SELECT p_retailprice,
         CAST(p_size AS DOUBLE) AS s,
         CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE) AS fa
  FROM part
),
z AS (
  SELECT 'west' AS zone, 0.0 AS zx0, 25.0 AS zx1 FROM (SELECT 1)
  UNION ALL SELECT 'east', 25.0, 50.0 FROM (SELECT 1)
),
joined AS (
  SELECT z.zone, f.p_retailprice, f.fa,
         greatest(0.0, least(f.s, z.zx1) - greatest(0.0, z.zx0))
           * least(f.s, 50.0) AS ia
  FROM f CROSS JOIN z
)
SELECT zone,
       CAST(SUM(CAST(floor(p_retailprice * (CASE WHEN fa > 0 THEN ia / fa ELSE 0.0 END) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS apportioned_value
FROM joined GROUP BY zone
"""


def geo_trajectory_stats(spark, sf_dir):
    """Trajectory analytics: per user ordered by time, step distances
    between consecutive synthesized positions (ST_Distance over a lag
    window — geo kernels composed with window functions), total path
    length (decimal sum of 6-dp-rounded steps — absorbs hypot-vs-sqrt
    last-ulp), max step, and net displacement start->end (lexicographic
    struct min/max pins the endpoints)."""
    e = _t(spark, sf_dir, "events")
    d = e.selectExpr(
        "user_id", "ts", "event_id",
        "CAST(event_id % 360 AS DOUBLE) - 179.5 AS x",
        "CAST(event_id % 170 AS DOUBLE) - 84.5 AS y",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    d = d.withColumn("px", F.lag("x").over(w)).withColumn("py", F.lag("y").over(w))
    step = F.expr("ST_Distance(ST_Point(x, y), ST_Point(px, py))")
    d = d.withColumn("__step", F.when(F.col("px").isNotNull(), step))
    dec = "decimal(38,12)"
    agg = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            F.sum(
                F.coalesce(F.round(F.col("__step"), 6).cast(dec), F.lit(0).cast(dec))
            ).cast("double"),
            6,
        ).alias("path_len"),
        F.round(F.max("__step"), 6).alias("max_step"),
        F.min(F.struct("ts", "event_id", "x", "y")).alias("__f"),
        F.max(F.struct("ts", "event_id", "x", "y")).alias("__l"),
    )
    disp = F.sqrt(
        (F.col("__l.x") - F.col("__f.x")) * (F.col("__l.x") - F.col("__f.x"))
        + (F.col("__l.y") - F.col("__f.y")) * (F.col("__l.y") - F.col("__f.y"))
    )
    return agg.select(
        "user_id", "n_points", "path_len", "max_step",
        F.round(disp, 6).alias("displacement"),
    )


ORACLE_GEO_TRAJECTORY = """
WITH d AS (
  SELECT user_id, epoch_ns(ts) AS t, event_id,
         CAST(event_id % 360 AS DOUBLE) - 179.5 AS x,
         CAST(event_id % 170 AS DOUBLE) - 84.5 AS y
  FROM events
),
lagged AS (
  SELECT user_id, t, event_id, x, y,
         lag(x) OVER (PARTITION BY user_id ORDER BY t, event_id) AS px,
         lag(y) OVER (PARTITION BY user_id ORDER BY t, event_id) AS py
  FROM d
),
stepped AS (
  SELECT user_id, t, event_id, x, y,
         CASE WHEN px IS NOT NULL
              THEN sqrt((x - px) * (x - px) + (y - py) * (y - py)) END AS step
  FROM lagged
),
ends AS (
  SELECT user_id,
         COUNT(*) AS n_points,
         round(CAST(SUM(COALESCE(CAST(round(step, 6) AS DECIMAL(38,12)),
                                 CAST(0 AS DECIMAL(38,12)))) AS DOUBLE), 6) AS path_len,
         round(MAX(step), 6) AS max_step,
         MIN(struct_pack(t := t, e := event_id, x := x, y := y)) AS f,
         MAX(struct_pack(t := t, e := event_id, x := x, y := y)) AS l
  FROM stepped
  GROUP BY user_id
)
SELECT user_id, n_points, path_len, max_step,
       round(sqrt((l.x - f.x) * (l.x - f.x) + (l.y - f.y) * (l.y - f.y)), 6) AS displacement
FROM ends
"""




def geo_native_pruned_read(spark, sf_dir):
    """Native-encoding GeoParquet row-group pruning END TO END: customer
    points are staged as a separated-coord (struct{x,y}, the GeoParquet 1.1
    native layout) point file with small row groups sorted by x, then read
    back through read_geoparquet's native-stats pruned path — row groups
    skipped from the coordinate leaves' own footer statistics
    (spatial_filter.rs:57-135 + 167-181 parity) before the exact window
    filter. The staging write is driver-side fixture construction (pyarrow,
    deterministic, overwritten per call), not a production path."""
    import json as _json
    import os as _os
    import tempfile as _tempfile

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from ..io.geoparquet import read_geoparquet

    c = _t(spark, sf_dir, "customer")
    rows = (
        c.selectExpr(
            "c_custkey",
            "CAST(c_custkey % 1000 AS DOUBLE) AS x",
            "CAST(c_nationkey AS DOUBLE) AS y",
        )
        .orderBy("x", "c_custkey")
        .collect()
    )
    coords = _pa.StructArray.from_arrays(
        [_pa.array([r.x for r in rows]), _pa.array([r.y for r in rows])],
        ["x", "y"],
    )
    tbl = _pa.table({"id": _pa.array([r.c_custkey for r in rows]),
                     "geometry": coords})
    tbl = tbl.replace_schema_metadata({b"geo": _json.dumps({
        "version": "1.1.0",
        "primary_column": "geometry",
        "columns": {"geometry": {"encoding": "point",
                                 "geometry_types": ["Point"]}},
    })})
    f = _os.path.join(
        _tempfile.gettempdir(),
        f"geoarrow_native_pruned_{abs(hash(_os.path.abspath(sf_dir)))}.parquet",
    )
    _pq.write_table(tbl, f, row_group_size=256)
    df = read_geoparquet(spark, f, bbox=(100.0, 0.0, 300.0, 12.0))
    return df.selectExpr(
        "id", "ST_X(geometry) AS gx", "ST_Y(geometry) AS gy"
    )


ORACLE_GEO_NATIVE_PRUNED = """
SELECT c_custkey AS id,
       CAST(c_custkey % 1000 AS DOUBLE) AS gx,
       CAST(c_nationkey AS DOUBLE) AS gy
FROM customer
WHERE (c_custkey % 1000) BETWEEN 100 AND 300
  AND c_nationkey BETWEEN 0 AND 12
"""


def geo_datasource_write_roundtrip(spark, sf_dir):
    """Single-pass distributed GeoParquet WRITE + pruned read-back, fully
    through the DataSource API: customer points go out via
    ``df.write.format("geoparquet")`` (each task streams its batches into
    its own part with the ``geo`` footer and covering column in place; no
    footer-stamping second pass), then come back through
    ``spark.read.format("geoparquet")`` with a bbox window that prunes row
    groups from the covering statistics before the exact filter. The temp
    dataset is keyed by sf_dir and overwritten per call. Reference write
    surface: rust/geoparquet/src/writer (options/encode.rs); the
    distributed single-pass shape is the Spark design."""
    import os as _os
    import tempfile as _tempfile

    out = _os.path.join(
        _tempfile.gettempdir(),
        f"geoarrow_ds_write_{abs(hash(_os.path.abspath(sf_dir)))}",
    )
    c = _t(spark, sf_dir, "customer")
    # every 4th customer: the entry measures the write PATH (footer,
    # covering, sidecar, pruned read-back), not bulk throughput — the
    # full-volume write cost lives in the pytest suite and the function
    # API's own round trips
    pts = c.where("c_custkey % 4 = 0").selectExpr(
        "c_custkey",
        "ST_Point(CAST(c_custkey % 1000 AS DOUBLE), "
        "CAST(c_nationkey AS DOUBLE)) AS geometry",
    )
    # bounded row groups so covering statistics stay useful; the
    # x-clustered-write pruning demonstration lives in
    # geo_native_pruned_read / functions.curves. coalesce(2): file-count
    # control a real pipeline applies anyway, and on this single-JVM
    # bench box a 32-task Arrow write burst late in a long session forces
    # heap expansion (page-zeroing at ~10s/GB -> a 2s entry reads 40s);
    # bisected + reproduced, see BENCH_NOTES_r06.md
    (
        pts.coalesce(2).write.format("geoparquet").mode("overwrite")
        .option("rowgroup_rows", "4096").save(out)
    )
    # read back through read_geoparquet: identical covering-stats
    # row-group pruning + exact refine, but the scan runs on the
    # session's warm pandas-UDF worker pool — a format() read spawns a
    # fresh planner process per query (~3-5s on a loaded session,
    # BENCH_NOTES_r06.md), which would measure spawn cost, not the engine
    from ..io.geoparquet import read_geoparquet

    back = read_geoparquet(spark, out, bbox=(100.0, 0.0, 300.0, 12.0))
    return back.selectExpr(
        "c_custkey AS id",
        "ST_X(geometry) AS gx",
        "ST_Y(geometry) AS gy",
        "bbox.xmin AS cov_xmin",
        "bbox.ymax AS cov_ymax",
    )


ORACLE_GEO_DS_WRITE = """
SELECT c_custkey AS id,
       CAST(c_custkey % 1000 AS DOUBLE) AS gx,
       CAST(c_nationkey AS DOUBLE) AS gy,
       CAST(c_custkey % 1000 AS DOUBLE) AS cov_xmin,
       CAST(c_nationkey AS DOUBLE) AS cov_ymax
FROM customer
WHERE c_custkey % 4 = 0
  AND (c_custkey % 1000) BETWEEN 100 AND 300
  AND c_nationkey BETWEEN 0 AND 12
"""
