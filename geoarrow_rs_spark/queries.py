"""Query catalog: every entry pairs a Spark implementation with a DuckDB
oracle (plain ANSI SQL — the runtime has no duckdb-spatial, so geometry
queries construct geometries from numeric columns and the oracle states the
equivalent arithmetic).

Determinism rules used throughout (so order-insensitive value hashes match
across engines):
- money/e-commerce aggregates: cast to DECIMAL before SUM (exact,
  order-independent), cast the final value to DOUBLE;
- geometry queries use integer-valued coordinates wherever the oracle must
  reproduce the arithmetic exactly; irrational results (sqrt/sin) are rounded
  to a tolerance far above the cross-engine ulp difference;
- ranks/counts are BIGINT on both sides; ties are broken by explicit keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .datapipe import dedup, similarity, text
from .join import spatial_join


def _spread(df: DataFrame) -> DataFrame:
    """Distribute a small single-split scan before per-row kernel work. The
    bench fixtures are single-row-group parquet files, so the scan — and
    every ArrowEvalPython chained onto it — would otherwise run in ONE task
    regardless of cluster size. Spread to cores/4, not cores: each
    ArrowEvalPython node holds a python worker per task, so a 3-node chain
    at 32-way costs 96 concurrent python processes on 32 cores — measured
    4-6x SLOWER than 8-way from worker churn. Skipped whenever the scan
    already has enough splits (the 100 TB case: thousands of files arrive
    pre-partitioned)."""
    sc = df.sparkSession.sparkContext
    n = max(2, sc.defaultParallelism // 4)
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # All events math downstream is exact int64 nanoseconds (mirrored by
        # duckdb's epoch_ns()). Generators have shipped the ts column both as
        # TIMESTAMP(NANOS) (reads as int64 ns under the legacy conf) and as
        # TIMESTAMP(MICROS) (reads as timestamp_ntz) — normalize either to
        # int64 ns here so every query sees one shape.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "timestamp_ntz":
            # naive timestamps are epoch-anchored the same way duckdb
            # anchors them (treat the wall clock as UTC). timestampdiff
            # against an NTZ epoch literal is pure wall-clock arithmetic —
            # exact and independent of the session timezone, so no
            # session-global conf mutation is needed here.
            df = df.withColumn(
                "ts",
                (
                    F.expr(
                        "timestampdiff(MICROSECOND,"
                        " TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
                    )
                    * F.lit(1000)
                ).cast("long"),
            )
        elif ts_type == "timestamp":
            # ltz timestamps are instants; unix_micros extracts the epoch
            # directly (timezone-independent by construction)
            df = df.withColumn(
                "ts", (F.unix_micros(F.col("ts")) * F.lit(1000)).cast("long")
            )
        return df
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "documents":
        # every documents consumer runs heavy per-row text kernels (shingle
        # explode, tokenize, fingerprint) straight off the scan — always
        # worth spreading a single-split file before that work
        return _spread(df)
    return df


def _money_sum(col, alias):
    """Exact, order- and engine-independent money aggregation: round to
    integer cents with floor(x*100+0.5) (pure double ops — identical in any
    IEEE engine, no decimal-cast tie-breaking semantics), sum as BIGINT,
    present as double. Oracle mirror: _MONEY_SUM_SQL."""
    cents = F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (F.sum(cents).cast("double") / F.lit(100.0)).alias(alias)


def _money_sum_sql(expr, alias):
    return (
        f"CAST(SUM(CAST(floor(({expr}) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS {alias}"
    )


# ---------------------------------------------------------------------------
# relational core (native Spark — Catalyst does pushdown/pruning/AQE)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """TPC-H q1: pricing summary report — flag/status grouped sums and
    means over recent lineitems, exact integer-cents money sums."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(F.col("l_quantity"), "sum_qty"),
            _money_sum(F.col("l_extendedprice"), "sum_base_price"),
            _money_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "sum_disc_price",
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {_money_sum_sql('l_quantity', 'sum_qty')},
       {_money_sum_sql('l_extendedprice', 'sum_base_price')},
       {_money_sum_sql('l_extendedprice * (1.0 - l_discount)', 'sum_disc_price')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    """TPC-H q3: unshipped-order revenue by order, BUILDING segment —
    dimension filters broadcast, revenue summed in exact cents."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
            )
        )
    )


ORACLE_Q3 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {_money_sum_sql('l_extendedprice * (1.0 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
"""


def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H q5: local supplier volume per ASIA nation — five-way join
    with every dimension broadcast (plan-asserted)."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q5 = f"""
SELECT n_name,
       {_money_sum_sql('l_extendedprice * (1.0 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
"""


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H q6: forecast revenue change — pure scan + filter + one
    aggregate; the filters reach the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_Q6 = f"""
SELECT {_money_sum_sql('l_extendedprice * l_discount', 'revenue')},
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_top_customers_per_nation(spark, sf_dir):
    """Top-3 customers by balance per nation — dense ranking window over
    a broadcast-joined dimension."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
    )


ORACLE_TOP_CUSTOMERS = """
SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rnk
  FROM customer
) WHERE rnk <= 3
"""


def q_order_priority(spark, sf_dir):
    """Order-priority histogram with exact money totals per class."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


ORACLE_ORDER_PRIORITY = """
SELECT o_orderpriority, COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# geometry queries (real WKB kernel pipeline; arithmetic oracles)
# ---------------------------------------------------------------------------

def q_customer_value_deciles(spark, sf_dir):
    """Customer lifetime-value deciles: exact integer-cents order totals
    per customer, ntile(10) over a strict total order (value desc, key),
    per-decile counts and exact value sums — the segmentation rollup."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
    per = o.groupBy("o_custkey").agg(F.sum(cents).alias("__c"))
    w = Window.orderBy(F.col("__c").desc(), F.col("o_custkey").asc())
    d = per.withColumn("decile", F.ntile(10).over(w))
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("__c").cast("double") / F.lit(100.0)).alias("total_value"),
    )


ORACLE_Q_DECILES = """
WITH per AS (
  SELECT o_custkey, SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
  FROM orders GROUP BY o_custkey
),
d AS (
  SELECT c, ntile(10) OVER (ORDER BY c DESC, o_custkey ASC) AS decile FROM per
)
SELECT decile, COUNT(*) AS n_customers,
       CAST(SUM(c) AS DOUBLE) / 100.0 AS total_value
FROM d GROUP BY decile
"""


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
    return o.selectExpr(
        "o_orderkey",
        # axis-aligned distance: exact (no sqrt) — |x|
        "ST_Distance(ST_Point(o_totalprice, 0.0), ST_Point(0.0, 0.0)) AS d_axis",
        # euclidean with sqrt: rounded to tolerate hypot-vs-sqrt ulp diffs
        "round(ST_Distance(ST_Point(o_totalprice, CAST(o_custkey % 1000 AS DOUBLE)), ST_Point(0.0, 0.0)), 2) AS d_euclid",
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
    from .functions.registry import point_in_polygon_expr

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
    mp = (
        f"ST_CollectionExtract(ST_Collect("
        f"ST_MakeEnvelope(0.0, 0.0, {s}, {s}), "
        f"ST_MakeEnvelope({t}, 0.0, {t} + {s}, {s})), 3)"
    )
    # two-step select: CollapseProject won't inline a Python UDF referenced
    # by five downstream columns, so the construction chain runs once
    return o.selectExpr("o_orderkey", f"{mp} AS g").selectExpr(
        "o_orderkey",
        "ST_Area(g) AS mp_area",
        "ST_Perimeter(g) AS mp_perimeter",
        "round(ST_X(ST_Centroid(g)), 6) AS cx",
        "round(ST_Y(ST_Centroid(g)), 6) AS cy",
        "ST_Area(ST_ConvexHull(g)) AS hull_area",
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
    from .ops import explode_geometries

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


def text_ngram_jaccard_vs_ref(spark, sf_dir):
    """Exact char-4-gram Jaccard of every document vs a reference string."""
    from .datapipe.dedup import ngram_jaccard

    ref = "the quick brown fox jumps over the lazy dog"
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(ngram_jaccard(F.col("text"), F.lit(ref), n=4, max_chars=128), 6).alias(
            "jaccard_ref"
        ),
    )


_REF_STR = "the quick brown fox jumps over the lazy dog"
ORACLE_NGRAM_JACCARD = f"""
WITH g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN length(substr(text, 1, 128)) < 4 THEN [substr(text, 1, 128)]
              ELSE list_transform(range(1, length(substr(text, 1, 128)) - 2),
                                  i -> substr(substr(text, 1, 128), CAST(i AS INT), 4)) END) AS ga,
         list_distinct(list_transform(range(1, length('{_REF_STR}') - 2),
                                      i -> substr('{_REF_STR}', CAST(i AS INT), 4))) AS gb
  FROM documents
)
SELECT doc_id,
       round(CASE WHEN len(list_distinct(list_concat(ga, gb))) > 0
             THEN CAST(len(list_intersect(ga, gb)) AS DOUBLE) / CAST(len(list_distinct(list_concat(ga, gb))) AS DOUBLE)
             ELSE 0.0 END, 6) AS jaccard_ref
FROM g
"""


def events_sliding_windows(spark, sf_dir):
    """Sliding windows (1h window, 30m slide) — native window() over
    microsecond timestamps."""
    e = _t(spark, sf_dir, "events")
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    return (
        e.withColumn("__ts", ts)
        .groupBy(F.window("__ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("window.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


ORACLE_EVENTS_SLIDING = """
SELECT win_start, event_type, COUNT(*) AS n_events
FROM (
  SELECT ((epoch_ns(ts) // 1000) // 1800000000) * 1800 - k.k AS win_start, event_type
  FROM events, (SELECT UNNEST([0, 1800]) AS k) k
)
GROUP BY win_start, event_type
"""


def dedup_simhash_signatures(spark, sf_dir):
    """SimHash signatures via explode + codegen'd bit-vote aggregation,
    hash-verified against the md5 bit arithmetic mirrored in DuckDB SQL."""
    from .datapipe.dedup import simhash_signatures

    d = _t(spark, sf_dir, "documents")
    return simhash_signatures(d, "doc_id", "text")


def sim_srp_buckets(spark, sf_dir):
    """SRP-LSH bucket histogram. STRICT oracle: the md5-derived random
    hyperplanes and sign arithmetic are mirrored bit-for-bit in DuckDB SQL
    (ORACLE_SIM_SRP), so rows+schema+hash are all value-checked."""
    from .datapipe.similarity import srp_bucket_expr

    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select(srp_bucket_expr("embedding", n_planes=8).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


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


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10-style: revenue from returned items per customer."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q10 = f"""
SELECT c_custkey, c_name, n_name,
       {_money_sum_sql('l_extendedprice * (1.0 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
"""


def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12-style: order-priority counts by quantity band."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 25)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("high_line_count"),
            F.sum(
                F.when(
                    ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity >= 25
GROUP BY l_linestatus
"""


def sim_near_dup_pairs(spark, sf_dir):
    """Embedding near-duplicate pairs by exact cosine threshold over a
    bounded candidate set (brute-force; the LSH-blocked variant is the scale
    path, strictly oracle-checked as sim_srp_buckets)."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    from .datapipe.similarity import dot_decimal_expr, norm_decimal_expr

    # norms hoisted to the per-vector side BEFORE the cross join — the
    # per-pair expression shrinks from three decimal folds to one (3x less
    # codegen and runtime), and sqrt(norm.cast(double)) is the exact value
    # cosine_expr would compute inline
    a = e.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"),
        F.sqrt(norm_decimal_expr(F.col("embedding")).cast("double")).alias("__sa"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"),
        F.sqrt(norm_decimal_expr(F.col("embedding")).cast("double")).alias("__sb"),
    )
    num = dot_decimal_expr(F.col("ea"), F.col("eb")).cast("double")
    den = F.col("__sa") * F.col("__sb")
    cosine = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.round(cosine, 8).alias("cosine"))
        .where(F.col("cosine") >= 0.9)
    )
    return pairs


ORACLE_SIM_NEAR_DUP = """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
terms AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         unnest(a.embedding)::DOUBLE AS av, unnest(b.embedding)::DOUBLE AS bv
  FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id
),
scored AS (
  SELECT a_id, b_id,
         SUM(CAST(round(av * bv, 12) AS DECIMAL(38,12))) AS dot,
         SUM(CAST(round(av * av, 12) AS DECIMAL(38,12))) AS an,
         SUM(CAST(round(bv * bv, 12) AS DECIMAL(38,12))) AS bn
  FROM terms GROUP BY a_id, b_id
)
SELECT a_id, b_id,
       round(CASE WHEN sqrt(CAST(an AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE)) > 0
                  THEN CAST(dot AS DOUBLE) / (sqrt(CAST(an AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE)))
                  ELSE 0.0 END, 8) AS cosine
FROM scored
WHERE round(CASE WHEN sqrt(CAST(an AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE)) > 0
                 THEN CAST(dot AS DOUBLE) / (sqrt(CAST(an AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE)))
                 ELSE 0.0 END, 8) >= 0.9
"""


# ---------------------------------------------------------------------------
# dedup / text / similarity (documents, embeddings)
# ---------------------------------------------------------------------------

def dedup_exact_stats(spark, sf_dir):
    """Exact duplicate-group statistics by content digest (one digest-keyed shuffle)."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_unique"),
    )


ORACLE_DEDUP_EXACT = """
SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique FROM documents
"""


def dedup_exact_keepers(spark, sf_dir):
    """Exact dedup keep-first materialization: one survivor per digest."""
    d = _t(spark, sf_dir, "documents")
    kept = dedup.exact_dedup(d, "text", "doc_id", keep="min")
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("id_checksum")
    )


ORACLE_DEDUP_KEEPERS = """
SELECT COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
"""


def text_tokens(spark, sf_dir):
    """Whitespace token counts per document (pure codegen)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text.token_count("text").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


ORACLE_TEXT_TOKENS = """
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
"""


def text_quality(spark, sf_dir):
    """Alpha/digit/word-length ratios + composite quality score, rounded 6 dp."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(text.alpha_ratio("text"), 6).alias("alpha_ratio"),
        F.round(text.digit_ratio("text"), 6).alias("digit_ratio"),
        F.round(text.mean_word_length("text"), 6).alias("mean_word_len"),
        F.round(text.quality_score("text"), 6).alias("quality"),
    )


ORACLE_TEXT_QUALITY = """
SELECT doc_id,
       round(CASE WHEN length(text) > 0
             THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
             ELSE 0.0 END, 6) AS alpha_ratio,
       round(CASE WHEN length(text) > 0
             THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
             ELSE 0.0 END, 6) AS digit_ratio,
       round(CASE WHEN len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) > 0
             THEN CAST(list_sum(list_transform(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''), x -> length(x))) AS DOUBLE)
                  / CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS DOUBLE)
             ELSE 0.0 END, 6) AS mean_word_len,
       round(LEAST(GREATEST(
         (CASE WHEN length(text) > 0
               THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
               ELSE 0.0 END) * 0.6
         + (1.0 - (CASE WHEN length(text) > 0
               THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
               ELSE 0.0 END)) * 0.2
         + (CASE WHEN (CASE WHEN len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) > 0
               THEN CAST(list_sum(list_transform(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''), x -> length(x))) AS DOUBLE)
                    / CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS DOUBLE)
               ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
         , 0.0), 1.0), 6) AS quality
FROM documents
"""


def text_langid(spark, sf_dir):
    """Marker-based language identification over the five corpus languages."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.lang_id("text").alias("lang_pred"))


def _hits_sql(markers):
    parts = []
    for m in markers:
        parts.append(
            f"CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', '{m}', ''))) / {len(m)} AS INT)"
        )
    return " + ".join(parts)


ORACLE_TEXT_LANGID = f"""
SELECT doc_id,
       CASE WHEN s_en >= GREATEST(1, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de >= GREATEST(1, s_fr, s_es) THEN 'de'
            WHEN s_fr >= GREATEST(1, s_es) THEN 'fr'
            WHEN s_es >= 1 THEN 'es'
            ELSE 'und' END AS lang_pred
FROM (
  SELECT doc_id,
         {_hits_sql(text.LANG_MARKERS['en'])} AS s_en,
         {_hits_sql(text.LANG_MARKERS['de'])} AS s_de,
         {_hits_sql(text.LANG_MARKERS['fr'])} AS s_fr,
         {_hits_sql(text.LANG_MARKERS['es'])} AS s_es
  FROM documents
)
"""


def text_bpe_tokens(spark, sf_dir):
    """BPE-ish subword count approximation (regex segmentation)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", text.bpe_token_count("text").cast("long").alias("n_bpe_tokens")
    )


_BPE_SQL = text.BPE_PATTERN.replace("'", "''")
ORACLE_TEXT_BPE = f"""
SELECT doc_id,
       CAST(len(list_filter(regexp_extract_all(text, '{_BPE_SQL}'), x -> trim(x) <> '')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""


def text_fuzzy_pairs(spark, sf_dir):
    """Exact edit-distance fuzzy self-join (dedup.editdist_pairs,
    PassJoin segment blocking — never all-pairs): all document pairs
    whose 12-char text prefix is within Levenshtein distance 2. The
    oracle is the brute-force cross join — an independent algorithm, so
    agreement checks both the blocking completeness and the refine."""
    d = _t(spark, sf_dir, "documents")
    keyed = d.select("doc_id", F.expr("substring(text, 1, 12)").alias("k"))
    return dedup.editdist_pairs(keyed, "doc_id", "k", max_dist=2)


ORACLE_TEXT_FUZZY = """
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(levenshtein(substr(a.text, 1, 12), substr(b.text, 1, 12)) AS BIGINT) AS dist
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE levenshtein(substr(a.text, 1, 12), substr(b.text, 1, 12)) <= 2
"""


def text_bpe_train(spark, sf_dir):
    """LEARNED byte-pair-encoding merges (text.bpe_train_merges, Sennrich
    et al. 2016) over the documents corpus: 8 rounds of most-frequent
    adjacent-pair selection (count desc, lexicographic tie-break) and
    greedy merge application, all as DataFrame ops on the distinct-word
    table. The oracle replays training in SQL — one CTE per round, the
    merge applied via the same double-space string-replace encoding —
    so the learned merge table must match bit-exactly."""
    d = _t(spark, sf_dir, "documents")
    return text.bpe_train_merges(d, "text", n_merges=8)


def _bpe_ctes(n_merges=8, max_doc=120, max_word=16) -> list:
    """Shared training-replay CTE chain (the word column `w` rides along
    so the tokenize oracle can join back to documents)."""
    ctes = [
        f"""w0 AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT substr(w, 1, {max_word}) AS w FROM (
      SELECT unnest(string_split_regex(substr(text, 1, {max_doc}), ' +')) AS w
      FROM documents
    ) WHERE length(w) > 0
  ) GROUP BY w
)""",
        """s0 AS MATERIALIZED (
  SELECT w, cnt,
         '  ' || array_to_string(list_transform(range(1, length(w) + 1),
                                 i -> substr(w, CAST(i AS INT), 1)), '  ') || '  ' AS s2
  FROM w0
)""",
    ]
    for i in range(n_merges):
        ctes += [
            f"""p{i} AS MATERIALIZED (
  SELECT p.a AS a, p.b AS b, CAST(SUM(cnt) AS BIGINT) AS n FROM (
    SELECT cnt,
           unnest(list_transform(range(1, len(t)),
                  j -> {{'a': t[CAST(j AS INT)], 'b': t[CAST(j AS INT) + 1]}})) AS p
    FROM (SELECT cnt, string_split(trim(s2), '  ') AS t FROM s{i})
  ) GROUP BY p.a, p.b
)""",
            f"b{i} AS MATERIALIZED (SELECT a, b, n FROM p{i} ORDER BY n DESC, a, b LIMIT 1)",
            f"""s{i + 1} AS MATERIALIZED (
  SELECT w, cnt, replace(s2,
      ' ' || (SELECT a FROM b{i}) || '  ' || (SELECT b FROM b{i}) || ' ',
      ' ' || (SELECT a FROM b{i}) || (SELECT b FROM b{i}) || ' ') AS s2
  FROM s{i}
)""",
        ]
    return ctes


def _bpe_train_oracle_sql(n_merges=8) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS step, a AS merge_left, b AS merge_right, n FROM b{i}"
        for i in range(n_merges)
    )
    return "WITH " + ",\n".join(_bpe_ctes(n_merges)) + "\n" + unions


ORACLE_TEXT_BPE_TRAIN = _bpe_train_oracle_sql()


def text_bpe_tokenize(spark, sf_dir):
    """Train-then-apply: per-document token counts under the LEARNED BPE
    vocabulary (text.bpe_tokenize_counts). The merge chain applies once
    to the distinct-word table (8 literal replaces in one projection);
    documents join their words to the tokenized vocab — text is never
    rewritten. Oracle = the training-replay CTEs + the same vocab join."""
    d = _t(spark, sf_dir, "documents")
    return text.bpe_tokenize_counts(d, "text", "doc_id", n_merges=8)


def _bpe_tokenize_oracle_sql(n_merges=8, max_doc=120, max_word=16) -> str:
    ctes = _bpe_ctes(n_merges) + [
        f"""vocab AS MATERIALIZED (
  SELECT w, CAST(len(string_split(trim(s2), '  ')) AS BIGINT) AS n_toks
  FROM s{n_merges}
)""",
        f"""dw AS (
  SELECT doc_id, substr(w, 1, {max_word}) AS w FROM (
    SELECT doc_id, unnest(string_split_regex(substr(text, 1, {max_doc}), ' +')) AS w
    FROM documents
  ) WHERE length(w) > 0
)""",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT doc_id, CAST(SUM(n_toks) AS BIGINT) AS n_bpe"
          " FROM dw JOIN vocab USING (w) GROUP BY doc_id"
    )


ORACLE_TEXT_BPE_TOKENIZE = _bpe_tokenize_oracle_sql()


def text_lm_score(spark, sf_dir):
    """LM quality filter (text.bigram_lm_scores; CCNet-style perplexity
    scoring): add-0.5-smoothed bigram word LM trained on the corpus
    itself, every document scored by mean log-probability of its word
    pairs. Counts are corpus groupBys; scoring is equi-joins on word
    keys; the mean accumulates round(ln p, 12) decimals so summation
    order is irrelevant. Oracle restates the counts and the smoothing
    formula directly."""
    d = _t(spark, sf_dir, "documents")
    return text.bigram_lm_scores(d, "text", "doc_id", alpha=0.5, max_doc_chars=200)


ORACLE_TEXT_LM_SCORE = """
WITH ws AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split_regex(substr(text, 1, 200), ' +'),
                             w -> length(w) > 0) AS ws
  FROM documents
),
pairs AS MATERIALIZED (
  SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ws)),
                  i -> {'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i AS INT) + 1]})) AS p
    FROM ws WHERE len(ws) >= 2
  )
),
uni AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
  FROM (SELECT unnest(ws) AS w FROM ws) GROUP BY w
),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vs FROM uni),
bi AS MATERIALIZED (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM pairs GROUP BY w1, w2
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(CAST(SUM(CAST(round(ln((CAST(c2 AS DOUBLE) + 0.5)
                 / (CAST(c1 AS DOUBLE) + 0.5 * (SELECT vs FROM v))), 12)
             AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
FROM pairs
JOIN bi USING (w1, w2)
JOIN uni ON uni.w = pairs.w1
GROUP BY doc_id
"""


def text_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint from distinct shingles."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint("text", n=8, max_chars=64).alias("fp"))


ORACLE_TEXT_FINGERPRINT = """
SELECT doc_id,
       CASE WHEN length(substr(text, 1, 64)) < 8 THEN md5(substr(text, 1, 64))
            ELSE list_min(list_transform(range(1, length(substr(text, 1, 64)) - 6),
                                         i -> md5(substr(substr(text, 1, 64), CAST(i AS INT), 8))))
       END AS fp
FROM documents
"""


def dedup_minhash_pairs(spark, sf_dir):
    """Banded-minhash LSH candidate pairs (band equi-join, no all-pairs); full SQL oracle replays grams -> signatures -> bands."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    return pairs.select("a_id", "b_id")


def _minhash_pairs_cte():
    """Shared CTE chain producing the banded-minhash candidate pairs —
    reused by the pairs oracle and the clustering oracle."""
    from .datapipe.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    perms = ", ".join(
        f"list_min(list_transform(h, x -> (x * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}))"
        for i in range(16)
    )
    return f"""grams AS (
  SELECT doc_id,
         CASE WHEN length(substr(text, 1, 128)) < 8 THEN [substr(text, 1, 128)]
              ELSE list_transform(range(1, length(substr(text, 1, 128)) - 6),
                                  i -> substr(substr(text, 1, 128), CAST(i AS INT), 8))
         END AS g
  FROM documents
), gram_hashes AS (
  SELECT doc_id,
         list_transform(g, x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % {MINHASH_P}) AS h
  FROM grams
), sigs AS (
  SELECT doc_id, [{perms}] AS sig FROM gram_hashes
), banded AS (
  SELECT doc_id,
         unnest(list_transform(range(0, 4),
                b -> CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ','))) AS band
  FROM sigs
), pairs AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM banded a JOIN banded b USING (band)
  WHERE a.doc_id < b.doc_id
)"""


def _banded_block(src: str, prefix: str) -> str:
    """Parametrized banded-minhash CTE chain over a named CTE/table
    ``src`` (must expose doc_id, text): emits {prefix}grams / {prefix}gh /
    {prefix}sigs / {prefix}banded. Same construction as
    _minhash_pairs_cte, reused for multi-corpus oracles."""
    from .datapipe.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    perms = ", ".join(
        f"list_min(list_transform(h, x -> (x * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}))"
        for i in range(16)
    )
    p = prefix
    return f"""{p}grams AS (
  SELECT doc_id,
         CASE WHEN length(substr(text, 1, 128)) < 8 THEN [substr(text, 1, 128)]
              ELSE list_transform(range(1, length(substr(text, 1, 128)) - 6),
                                  i -> substr(substr(text, 1, 128), CAST(i AS INT), 8))
         END AS g
  FROM {src}
), {p}gh AS (
  SELECT doc_id,
         list_transform(g, x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % {MINHASH_P}) AS h
  FROM {p}grams
), {p}sigs AS (
  SELECT doc_id, [{perms}] AS sig FROM {p}gh
), {p}banded AS (
  SELECT doc_id,
         unnest(list_transform(range(0, 4),
                b -> CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ','))) AS band
  FROM {p}sigs
)"""


def dedup_incremental_keepers(spark, sf_dir):
    """Incremental ingestion dedup (dedup.incremental_dedup): the batch
    doc_id >= 250 is admitted against the existing corpus doc_id < 250 —
    exact digests (existing + earlier-in-batch) and LSH band collisions
    with the existing corpus both reject; existing text is only read as
    digest/band projections (O(batch), not O(corpus), per run)."""
    d = _t(spark, sf_dir, "documents")
    existing = d.where(F.col("doc_id") < 250)
    incoming = d.where(F.col("doc_id") >= 250)
    out = dedup.incremental_dedup(
        existing, incoming, num_perm=16, bands=4, shingle=8, max_chars=128
    )
    return out.select("doc_id", F.md5(F.col("text")).alias("text_md5"))


ORACLE_DEDUP_INCREMENTAL = f"""
WITH existing AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
incoming AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250),
inc_first AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM incoming
  ) WHERE rn = 1
),
ex_dig AS (SELECT DISTINCT md5(text) AS dig FROM existing),
inc_new AS (
  SELECT i.doc_id, i.text FROM inc_first i
  LEFT JOIN ex_dig e ON md5(i.text) = e.dig
  WHERE e.dig IS NULL
),
{_banded_block('existing', 'ex')},
{_banded_block('inc_new', 'in')},
exb AS (SELECT DISTINCT band FROM exbanded),
hits AS (
  SELECT DISTINCT i.doc_id FROM inbanded i JOIN exb ON i.band = exb.band
)
SELECT n.doc_id, md5(n.text) AS text_md5
FROM inc_new n LEFT JOIN hits h ON n.doc_id = h.doc_id
WHERE h.doc_id IS NULL
"""


def dedup_lsh_eval(spark, sf_dir):
    """LSH quality evaluation on a bounded sample (doc_id < 100): exact
    8-gram Jaccard for ALL sample pairs (deliberate bounded cartesian —
    evaluation only, never the production path) vs banded-minhash
    candidacy. One row: pair counts, confusion counts at Jaccard >= 0.5,
    and the mean Jaccard of candidates vs non-candidates — the
    measurement you run before trusting an LSH parameterization at
    corpus scale."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )
    a = d.select(F.col("doc_id").alias("a_id"), F.col("text").alias("__ta"))
    b = d.select(F.col("doc_id").alias("b_id"), F.col("text").alias("__tb"))
    jacc = F.round(
        dedup.ngram_jaccard(F.col("__ta"), F.col("__tb"), n=8, max_chars=128), 6
    )
    allp = (
        a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", jacc.alias("__j"))
    )
    cands = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    ).select("a_id", "b_id").withColumn("__cand", F.lit(True))
    lab = allp.join(cands, on=["a_id", "b_id"], how="left").select(
        "__j", F.coalesce(F.col("__cand"), F.lit(False)).alias("__c")
    )
    dec = "decimal(38,12)"
    pos = F.col("__j") >= 0.5
    c = F.col("__c")
    mean_of = lambda cond: F.round(
        (
            F.sum(F.when(cond, F.col("__j").cast(dec)).otherwise(F.lit(0).cast(dec))).cast("double")
        )
        / F.greatest(F.sum(cond.cast("long")).cast("double"), F.lit(1.0)),
        6,
    )
    return lab.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(c.cast("long")).alias("n_cand"),
        F.sum((pos & c).cast("long")).alias("tp"),
        F.sum(((~pos) & c).cast("long")).alias("fp"),
        F.sum((pos & (~c)).cast("long")).alias("fn"),
        mean_of(c).alias("mean_jacc_cand"),
        mean_of(~c).alias("mean_jacc_noncand"),
    )


def _lsh_eval_oracle_sql():
    gram8 = (
        "CASE WHEN length(substr({t}, 1, 128)) < 8 THEN [substr({t}, 1, 128)] "
        "ELSE list_transform(range(1, length(substr({t}, 1, 128)) - 6), "
        "i -> substr(substr({t}, 1, 128), CAST(i AS INT), 8)) END"
    )
    mean_of = (
        "round(CAST(SUM(CASE WHEN {cond} THEN CAST(j AS DECIMAL(38,12)) "
        "ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE) "
        "/ greatest(CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DOUBLE), 1.0), 6)"
    )
    return f"""
WITH sample AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
{_banded_block('sample', 'sm')},
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM smbanded a JOIN smbanded b ON a.band = b.band
  WHERE a.doc_id < b.doc_id
),
gsets AS (
  SELECT doc_id, list_distinct({gram8.format(t='text')}) AS gs FROM sample
),
allp AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         round(CASE WHEN len(list_distinct(list_concat(a.gs, b.gs))) > 0
               THEN CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(a.gs, b.gs))) AS DOUBLE)
               ELSE 0.0 END, 6) AS j
  FROM gsets a JOIN gsets b ON a.doc_id < b.doc_id
),
lab AS (
  SELECT p.j, (c.a_id IS NOT NULL) AS cand
  FROM allp p LEFT JOIN cand c ON p.a_id = c.a_id AND p.b_id = c.b_id
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
       CAST(SUM(CASE WHEN j >= 0.5 AND cand THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN j < 0.5 AND cand THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN j >= 0.5 AND NOT cand THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       {mean_of.format(cond='cand')} AS mean_jacc_cand,
       {mean_of.format(cond='NOT cand')} AS mean_jacc_noncand
FROM lab
"""


ORACLE_DEDUP_LSH_EVAL = _lsh_eval_oracle_sql()


def text_containment_pairs(spark, sf_dir):
    """One-sided containment near-dup detection: for banded-minhash
    candidate pairs, the containment of each side's 8-gram SET in the
    other (|A∩B|/|A|) — catches sub-document duplication (quotes,
    boilerplate wrappers) that symmetric Jaccard under-scores. Candidates
    from the same LSH band join as the pair family; refine is native
    array arithmetic."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    ).select("a_id", "b_id")
    g = F.array_distinct(text.char_ngrams(F.col("text"), n=8, max_chars=128))
    docs = d.select(F.col("doc_id"), g.alias("__g"))
    j = (
        pairs.join(docs.select(F.col("doc_id").alias("a_id"), F.col("__g").alias("__ga")), on="a_id")
        .join(docs.select(F.col("doc_id").alias("b_id"), F.col("__g").alias("__gb")), on="b_id")
    )
    inter = F.size(F.array_intersect(F.col("__ga"), F.col("__gb"))).cast("double")
    ca = F.when(F.size("__ga") > 0, inter / F.size("__ga").cast("double")).otherwise(F.lit(0.0))
    cb = F.when(F.size("__gb") > 0, inter / F.size("__gb").cast("double")).otherwise(F.lit(0.0))
    return j.select(
        "a_id", "b_id",
        F.round(ca, 6).alias("contain_a_in_b"),
        F.round(cb, 6).alias("contain_b_in_a"),
    )


_GRAM8_SQL = (
    "list_distinct(CASE WHEN length(substr({t}, 1, 128)) < 8 THEN [substr({t}, 1, 128)] "
    "ELSE list_transform(range(1, length(substr({t}, 1, 128)) - 6), "
    "i -> substr(substr({t}, 1, 128), CAST(i AS INT), 8)) END)"
)

ORACLE_TEXT_CONTAINMENT = f"""
WITH {_minhash_pairs_cte()},
gs AS (SELECT doc_id, {_GRAM8_SQL.format(t='text')} AS g FROM documents)
SELECT p.a_id, p.b_id,
       round(CASE WHEN len(a.g) > 0
             THEN CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / CAST(len(a.g) AS DOUBLE)
             ELSE 0.0 END, 6) AS contain_a_in_b,
       round(CASE WHEN len(b.g) > 0
             THEN CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / CAST(len(b.g) AS DOUBLE)
             ELSE 0.0 END, 6) AS contain_b_in_a
FROM pairs p JOIN gs a ON p.a_id = a.doc_id JOIN gs b ON p.b_id = b.doc_id
"""


def _minhash_oracle_sql():
    from .datapipe.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    perms = ", ".join(
        f"list_min(list_transform(h, x -> (x * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}))"
        for i in range(16)
    )
    return f"""
WITH grams AS (
  SELECT doc_id,
         CASE WHEN length(substr(text, 1, 128)) < 8 THEN [substr(text, 1, 128)]
              ELSE list_transform(range(1, length(substr(text, 1, 128)) - 6),
                                  i -> substr(substr(text, 1, 128), CAST(i AS INT), 8))
         END AS g
  FROM documents
), gram_hashes AS (
  SELECT doc_id,
         list_transform(g, x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % {MINHASH_P}) AS h
  FROM grams
), sigs AS (
  SELECT doc_id, [{perms}] AS sig FROM gram_hashes
), banded AS (
  SELECT doc_id,
         unnest(list_transform(range(0, 4),
                b -> CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ','))) AS band
  FROM sigs
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
FROM banded a JOIN banded b USING (band)
WHERE a.doc_id < b.doc_id
"""


ORACLE_MINHASH_PAIRS = _minhash_oracle_sql()


def dedup_substring_spans(spark, sf_dir):
    """Span-level exact-duplicate signal: fraction of each document's 30-char
    windows that occur in at least one other document (explode -> hash ->
    single groupBy -> join back; no all-pairs)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.substring_dup_stats(d, "doc_id", "text", n=30, max_chars=256)


ORACLE_DEDUP_SUBSTRING = """
WITH g AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
  FROM (
    SELECT doc_id,
           CASE WHEN length(substr(text, 1, 256)) < 30
                THEN [substr(text, 1, 256)]
                ELSE list_transform(range(1, length(substr(text, 1, 256)) - 28),
                                    i -> substr(substr(text, 1, 256), CAST(i AS INT), 30))
           END AS ws
    FROM documents
  ), unnest(ws) AS t(w)
),
per_gram AS (
  SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM g GROUP BY h
)
SELECT g.doc_id,
       COUNT(*) AS n_windows,
       CAST(SUM(CASE WHEN p.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       round(CAST(SUM(CASE WHEN p.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
FROM g JOIN per_gram p ON g.h = p.h
GROUP BY g.doc_id
"""


def pipe_sample_split(spark, sf_dir):
    """Deterministic sampling + train/val/test split: md5-keyed, so the
    assignment is identical across reruns, partitionings, and engines
    (df.sample's per-partition RNG is none of those). Output: per-split
    row counts and token totals over a 50% sample."""
    from .datapipe import sampling, text

    d = _t(spark, sf_dir, "documents")
    sampled = sampling.deterministic_sample(d, "doc_id", 0.5)
    split = sampling.train_val_test_split(sampled, "doc_id", val=0.1, test=0.1)
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(text.token_count("text").cast("long")).alias("n_tokens"),
        )
    )


ORACLE_PIPE_SAMPLE_SPLIT = """
WITH sampled AS (
  SELECT doc_id, text,
         CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 AS su
  FROM documents
  WHERE CAST(concat('0x', substr(md5(concat('sample:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 < 0.5
), labeled AS (
  SELECT doc_id, text,
         CASE WHEN su < 0.1 THEN 'val' WHEN su < 0.2 THEN 'test' ELSE 'train' END AS split
  FROM sampled
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
FROM labeled GROUP BY split
"""


def pipe_scrub_text(spark, sf_dir):
    """PII-style scrubbing (emails/URLs -> placeholder tokens) with native
    regexp_replace; patterns live in the Java-regex/RE2 common subset so
    DuckDB replays them byte-for-byte."""
    from .datapipe import sampling

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(sampling.scrub_text("text")).alias("scrubbed_md5"),
        F.length(sampling.scrub_text("text")).alias("scrubbed_len"),
    )


ORACLE_PIPE_SCRUB = """
SELECT doc_id,
       md5(regexp_replace(regexp_replace(text, 'https?://[^ \\t\\n]+', '<URL>', 'g'),
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g')) AS scrubbed_md5,
       CAST(length(regexp_replace(regexp_replace(text, 'https?://[^ \\t\\n]+', '<URL>', 'g'),
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g')) AS INT) AS scrubbed_len
FROM documents
"""


def pipe_scrub_pii(spark, sf_dir):
    """Luhn-validated PII scrubbing: phones and IPv4s by pattern, 16-digit
    card numbers only when the Luhn mod-10 checksum passes (pure codegen —
    the checksum is unrolled to 16 substring terms, no UDF). The synthetic
    documents are digit-free, so the query plants one deterministic
    phone/ip/card span per row from doc_id (identically in both engines);
    card validity varies by id, so both the scrub and the skip paths are
    exercised."""
    from .datapipe import sampling

    d = _t(spark, sf_dir, "documents")
    last4 = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    aug = F.concat(
        F.col("text"),
        F.lit(" phone 555-123-"), last4,
        F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 card 411111111111"), last4,
    )
    scrubbed = sampling.scrub_pii(aug)
    return d.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_md5"),
        scrubbed.contains("<CC>").alias("cc_scrubbed"),
    )


def _luhn_sql(expr: str) -> str:
    """DuckDB mirror of sampling.luhn_valid: the same 16-term unrolled
    mod-10 sum (doubling at even 0-indexed positions for 16-digit input)."""
    terms = []
    for pos in range(16):
        d = f"TRY_CAST(substr({expr}, {pos + 1}, 1) AS INT)"
        if pos % 2 == 0:
            terms.append(f"(CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END)")
        else:
            terms.append(d)
    total = " + ".join(terms)
    return f"(length({expr}) = 16 AND COALESCE(({total}) % 10 = 0, FALSE))"


ORACLE_PIPE_SCRUB_PII = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' phone 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 card 411111111111'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
), s1 AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(t, '\\+?[0-9]{{3}}[- ][0-9]{{3}}[- ][0-9]{{4}}', '<PHONE>', 'g'),
                        '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}', '<IP>', 'g') AS s
  FROM aug
), s2 AS (
  SELECT doc_id, s, regexp_extract(s, '[0-9]{{16}}', 0) AS cand FROM s1
), s3 AS (
  SELECT doc_id,
         CASE WHEN cand <> '' AND {_luhn_sql('cand')}
              THEN replace(s, cand, '<CC>') ELSE s END AS sc
  FROM s2
)
SELECT doc_id, md5(sc) AS scrubbed_md5, contains(sc, '<CC>') AS cc_scrubbed FROM s3
"""


def text_chunks(spark, sf_dir):
    """RAG chunking: 32-token windows every 24 tokens (8-token overlap),
    one output row per chunk with its exact token count and content hash.
    Pure per-row codegen (split + sequence + explode + slice) — no
    shuffle; the chunk table is the input to embedding/indexing stages."""
    d = _t(spark, sf_dir, "documents")
    from .datapipe import corpus

    out = corpus.chunk_documents(d, chunk_tokens=32, stride=24)
    return out.select(
        "doc_id",
        "chunk_id",
        "n_chunk_tokens",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


ORACLE_TEXT_CHUNKS = """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), ex AS (
  SELECT doc_id, tk, unnest(range(0, greatest(len(tk) - 1, 0) + 1, 24)) AS s
  FROM toks
)
SELECT doc_id,
       CAST(s // 24 AS INT) AS chunk_id,
       CAST(len(tk[(s + 1):(s + 32)]) AS INT) AS n_chunk_tokens,
       md5(array_to_string(tk[(s + 1):(s + 32)], ' ')) AS chunk_md5
FROM ex
"""


def pipe_stratified_sample(spark, sf_dir):
    """Stratified sampling: exactly 30 docs per language, ranked by the
    deterministic md5 hash-uniform (stable across reruns, partitionings,
    and engines). The balanced-corpus construction step for mixture
    training."""
    from .datapipe import sampling

    d = _t(spark, sf_dir, "documents")
    return sampling.stratified_sample(d, "doc_id", "lang", 30).select("doc_id", "lang")


ORACLE_PIPE_STRATIFIED = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY
            CAST(concat('0x', substr(md5(concat('strat:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0,
            doc_id) AS rn
  FROM documents
) WHERE rn <= 30
"""


def events_retention(spark, sf_dir):
    """Cohort retention: users bucketed by first-active day, distinct
    users counted per (cohort day, day offset) — the classic engagement
    matrix. Day arithmetic is exact int64-ns integer division; the
    cohort join keys on user_id, the same key as the groupBy that
    produced it, so the cohort table arrives pre-shuffled (no extra
    exchange at scale)."""
    e = _t(spark, sf_dir, "events")
    day = F.expr("ts div 86400000000000")
    ud = e.select("user_id", day.alias("day")).distinct()
    # cohort via an unordered user window (min over the partition) instead
    # of groupBy + self-join: one fewer exchange, same values
    w = Window.partitionBy("user_id")
    ud = ud.withColumn("cohort_day", F.min("day").over(w))
    return ud.groupBy(
        "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
    ).agg(F.countDistinct("user_id").alias("n_users"))


def events_funnel_windowed(spark, sf_dir):
    """Ordered 3-step funnel view -> click -> purchase within 7 days
    (datapipe.events.funnel_counts): first-touch greedy matching, every
    join/groupBy keyed on user_id, per-step user counts + exact
    integer-ppm conversion vs step 1. The oracle replays the same staged
    min-after-previous-step construction."""
    from .datapipe.events import funnel_counts

    e = _t(spark, sf_dir, "events")
    week_ns = 7 * 86_400_000_000_000
    return funnel_counts(
        e, ["view", "click", "purchase"], window=week_ns
    )


ORACLE_EVENTS_FUNNEL_WINDOWED = """
WITH e AS (
  SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events
), s1 AS (
  SELECT user_id, MIN(tns) AS t1 FROM e WHERE event_type = 'view'
  GROUP BY user_id
), s2 AS (
  SELECT e.user_id, s1.t1, MIN(e.tns) AS t2
  FROM e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.tns > s1.t1
    AND e.tns <= s1.t1 + 604800000000000
  GROUP BY e.user_id, s1.t1
), s3 AS (
  SELECT e.user_id, s2.t1, s2.t2, MIN(e.tns) AS t3
  FROM e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.tns > s2.t2
    AND e.tns <= s2.t1 + 604800000000000
  GROUP BY e.user_id, s2.t1, s2.t2
), counts AS (
  SELECT 1 AS step, 'view' AS step_name, COUNT(*) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', COUNT(*) FROM s2
  UNION ALL
  SELECT 3, 'purchase', COUNT(*) FROM s3
)
SELECT CAST(step AS INT) AS step, step_name,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(CASE WHEN (SELECT n_users FROM counts WHERE step = 1) > 0
            THEN n_users * 1000000 // (SELECT n_users FROM counts WHERE step = 1)
            ELSE 0 END AS BIGINT) AS conv_ppm
FROM counts
"""


ORACLE_EVENTS_RETENTION = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events
),
coh AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id)
SELECT c.cohort_day, u.day - c.cohort_day AS day_offset,
       COUNT(DISTINCT u.user_id) AS n_users
FROM ud u JOIN coh c ON u.user_id = c.user_id
GROUP BY 1, 2
"""


def events_interval_join(spark, sf_dir):
    """Banded interval join (join.interval.interval_join): every event
    within the 5 minutes following an error event, across ALL users — a
    pure interval-overlap join with no equi key. Left intervals explode
    to the time bins they cover, right points key to their single bin, so
    the join is a plain bin equi-join + codegen refine (each pair meets
    in exactly one bin — no dedup). Output: per error event, the count of
    trailing events and the min lag. Oracle is the brute-force
    inequality join — an independent algorithm."""
    from .join.interval import interval_join

    e = _t(spark, sf_dir, "events")
    ns5m = 300 * 1_000_000_000
    errs = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
        (F.col("ts") + F.lit(ns5m)).alias("err_end"),
    )
    pts = e.select(F.col("event_id").alias("evt_id"), F.col("ts").alias("evt_ts"))
    joined = interval_join(
        errs, pts, "err_ts", "err_end", "evt_ts", bin_width=ns5m, closed="right"
    )
    return joined.groupBy("err_id").agg(
        F.count(F.lit(1)).alias("n_trailing"),
        F.min(F.col("evt_ts") - F.col("err_ts")).alias("min_lag_ns"),
    )


ORACLE_EVENTS_INTERVAL = """
SELECT a.event_id AS err_id, COUNT(*) AS n_trailing,
       MIN(epoch_ns(b.ts) - epoch_ns(a.ts)) AS min_lag_ns
FROM events a JOIN events b
  ON epoch_ns(b.ts) > epoch_ns(a.ts)
 AND epoch_ns(b.ts) <= epoch_ns(a.ts) + 300000000000
WHERE a.event_type = 'error'
GROUP BY a.event_id
"""


def events_kmv_distinct(spark, sf_dir):
    """KMV distinct-user sketch per event type (datapipe.sketch): k=16
    minimum md5-hash values, estimate (k-1)/h_k — deterministic, so the
    ESTIMATOR itself is oracle-checked (impossible with HLL), alongside
    the exact distinct for accuracy reading."""
    from .datapipe import sketch

    e = _t(spark, sf_dir, "events")
    est = sketch.kmv_distinct(e, "user_id", ["event_type"], k=16)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, on="event_type")


ORACLE_EVENTS_KMV = """
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5(concat('kmv:', CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 AS hh
  FROM events
), r AS (
  SELECT event_type, hh,
         row_number() OVER (PARTITION BY event_type ORDER BY hh) AS rn
  FROM h
), t AS (
  SELECT event_type, COUNT(*) AS n_seen, MAX(hh) AS hk
  FROM r WHERE rn <= 16 GROUP BY event_type
), x AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct FROM events GROUP BY event_type
)
SELECT t.event_type, t.n_seen,
       CASE WHEN t.n_seen < 16 THEN CAST(t.n_seen AS DOUBLE)
            ELSE round(15.0 / t.hk, 6) END AS est_distinct,
       x.exact_distinct
FROM t JOIN x ON t.event_type = x.event_type
"""


def events_value_quantiles(spark, sf_dir):
    """Histogram quantile sketch (datapipe.sketch.histogram_quantiles):
    p50/p90/p99 of the value column per event type from 64 fixed-width
    buckets over [0, 600] — constant per-group state, one shuffle,
    linear interpolation inside the crossing bucket. Deterministic, so
    the whole estimator is oracle-replayed (percentile_approx/t-digest
    merges are engine-private and never could be)."""
    from .datapipe import sketch

    e = _t(spark, sf_dir, "events")
    return sketch.histogram_quantiles(
        e, "value", ["event_type"], lo=0.0, hi=600.0, n_bins=64,
        quantiles=(0.5, 0.9, 0.99),
    )


ORACLE_EVENTS_HIST_QUANTILES = """
WITH h AS (
  SELECT event_type,
         least(63, greatest(0, CAST(floor((CAST(value AS DOUBLE) - 0.0) / 9.375) AS INT))) AS bin
  FROM events
), hist AS (SELECT event_type, bin, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum
  FROM hist
),
tot AS (SELECT event_type, SUM(cnt) AS total FROM hist GROUP BY 1),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
cand AS (
  SELECT c.event_type, q.q, c.bin, c.cnt, c.cum, t.total,
         row_number() OVER (PARTITION BY c.event_type, q.q ORDER BY c.bin) AS rn
  FROM cum c JOIN tot t ON c.event_type = t.event_type CROSS JOIN qs q
  WHERE CAST(c.cum AS DOUBLE) >= q.q * CAST(t.total AS DOUBLE)
)
SELECT event_type, q,
       round(0.0 + (CAST(bin AS DOUBLE)
                    + greatest(0.0, (q * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                               / CAST(cnt AS DOUBLE))) * 9.375, 6) AS est
FROM cand WHERE rn = 1
"""


def pipe_dataset_card(spark, sf_dir):
    """One-row dataset card: corpus size, token total, language spread,
    exact-duplicate rate (integer ppm), mean document length, dominant
    language + its share — the summary block every dataset release
    ships, composed from the catalog's own building blocks in one pass
    plus a tiny top-1 aggregate."""
    d = _t(spark, sf_dir, "documents")
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count("text").cast("long")).alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5(F.col("text"))).alias("__uniq"),
        F.sum("n_chars").alias("__chars"),
    )
    top = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__ln"))
        .orderBy(F.col("__ln").desc(), F.col("lang").asc())
        .limit(1)
        .select(F.col("lang").alias("top_lang"), F.col("__ln").alias("__topn"))
    )
    return stats.crossJoin(F.broadcast(top)).select(
        "n_docs",
        "n_tokens",
        "n_langs",
        F.expr("(n_docs - __uniq) * 1000000 div n_docs").alias("dup_ppm"),
        F.round(F.col("__chars").cast("double") / F.col("n_docs").cast("double"), 6).alias("mean_chars"),
        "top_lang",
        F.expr("__topn * 1000000 div n_docs").alias("top_lang_ppm"),
    )


ORACLE_PIPE_DATASET_CARD = """
WITH stats AS (
  SELECT COUNT(*) AS n_docs,
         SUM(CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT)) AS n_tokens,
         COUNT(DISTINCT lang) AS n_langs,
         COUNT(DISTINCT md5(text)) AS uniq,
         SUM(n_chars) AS chars
  FROM documents
),
top AS (
  SELECT lang AS top_lang, COUNT(*) AS topn
  FROM documents GROUP BY lang
  ORDER BY COUNT(*) DESC, lang ASC LIMIT 1
)
SELECT s.n_docs, CAST(s.n_tokens AS BIGINT) AS n_tokens, s.n_langs,
       (s.n_docs - s.uniq) * 1000000 // s.n_docs AS dup_ppm,
       round(CAST(s.chars AS DOUBLE) / CAST(s.n_docs AS DOUBLE), 6) AS mean_chars,
       t.top_lang,
       t.topn * 1000000 // s.n_docs AS top_lang_ppm
FROM stats s CROSS JOIN top t
"""


TFIDF_QUERY_TERMS = ["join", "spark", "window"]


def text_tfidf_topk(spark, sf_dir):
    """tf-idf sparse cosine retrieval (corpus.tfidf_topk): top-20 docs for
    a 3-term query. idf rounded to 12 dp, decimal-accumulated numerator
    and norms, distributed top-k — the oracle rebuilds the same sparse
    weighting in SQL."""
    from .datapipe import corpus

    d = _t(spark, sf_dir, "documents")
    return corpus.tfidf_topk(d, TFIDF_QUERY_TERMS, k=20)


ORACLE_TEXT_TFIDF = f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
nn AS (SELECT COUNT(*) AS n FROM documents),
idf AS (
  SELECT word, round(ln((n + 1.0) / (df + 1.0)), 12) AS idf
  FROM dfreq CROSS JOIN nn
),
qt AS (SELECT unnest({TFIDF_QUERY_TERMS!r}) AS word),
qw AS (SELECT q.word, i.idf FROM qt q JOIN idf i ON q.word = i.word),
qnorm AS (
  SELECT sqrt(CAST(SUM(CAST(round(idf * idf, 12) AS DECIMAL(38,12))) AS DOUBLE)) AS qn
  FROM qw
),
dnorm AS (
  SELECT t.doc_id,
         sqrt(CAST(SUM(CAST(round((t.tf * i.idf) * (t.tf * i.idf), 12) AS DECIMAL(38,12))) AS DOUBLE)) AS dn
  FROM tf t JOIN idf i ON t.word = i.word GROUP BY t.doc_id
),
num AS (
  SELECT t.doc_id,
         CAST(SUM(CAST(round((t.tf * i.idf) * q.idf, 12) AS DECIMAL(38,12))) AS DOUBLE) AS num
  FROM tf t JOIN qw q ON t.word = q.word JOIN idf i ON t.word = i.word
  GROUP BY t.doc_id
)
SELECT doc_id, cosine_tfidf, CAST(row_number() OVER (ORDER BY cosine_tfidf DESC, doc_id) AS INT) AS rank
FROM (
  SELECT d.doc_id,
         round(CASE WHEN d.dn * q.qn > 0 THEN COALESCE(n.num, 0.0) / (d.dn * q.qn) ELSE 0.0 END, 6) AS cosine_tfidf
  FROM dnorm d LEFT JOIN num n ON d.doc_id = n.doc_id CROSS JOIN qnorm q
  ORDER BY cosine_tfidf DESC, d.doc_id LIMIT 20
)
"""


def dedup_clusters_assignment(spark, sf_dir):
    """Near-duplicate clustering: connected components over banded-minhash
    candidate pairs (distributed min-label propagation), every document
    assigned cluster_id = min doc id in its component. The oracle replays
    the same pairs and closes them with a recursive CTE."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    return dedup.dedup_clusters(d, pairs, id_col="doc_id")


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_minhash_pairs_cte()},
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id AS src, a_id AS dst FROM pairs
),
cc(node, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, cc.label FROM edges e JOIN cc ON e.dst = cc.node
),
best AS (SELECT node, MIN(label) AS cl FROM cc GROUP BY node)
SELECT d.doc_id, COALESCE(best.cl, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN best ON d.doc_id = best.node
"""


def dedup_minhash_refined(spark, sf_dir):
    """LSH candidates refined by EXACT shingle-Jaccard >= 0.5 (the
    two-stage near-dup shape: cheap banded recall, exact precision
    filter — text joins into the band match only because the refine
    needs it). Output includes the exact Jaccard per surviving pair."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128,
        jaccard_threshold=0.5,
    )
    return pairs.select("a_id", "b_id", F.round(F.col("jaccard"), 6).alias("jaccard"))


ORACLE_DEDUP_MINHASH_REFINED = f"""
WITH {_minhash_pairs_cte()},
gs AS (SELECT doc_id, {_GRAM8_SQL.format(t='text')} AS g FROM documents),
scored AS (
  SELECT p.a_id, p.b_id,
         CASE WHEN len(list_distinct(list_concat(a.g, b.g))) > 0
              THEN CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                   / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE)
              ELSE 0.0 END AS j
  FROM pairs p JOIN gs a ON p.a_id = a.doc_id JOIN gs b ON p.b_id = b.doc_id
)
SELECT a_id, b_id, round(j, 6) AS jaccard FROM scored WHERE j >= 0.5
"""


def pipe_mixture_weights(spark, sf_dir):
    """Domain-mixture reweighting: per language, the sampling weight that
    moves the corpus to a UNIFORM language mixture (target share /
    actual share) — the knob every multi-domain training recipe sets.
    Shares in exact integer ppm; weights rounded 6."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").alias("__total"), F.count(F.lit(1)).alias("__k")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr("n_docs * 1000000 div __total").alias("share_ppm"),
        F.round(
            F.col("__total").cast("double")
            / (F.col("__k").cast("double") * F.col("n_docs").cast("double")),
            6,
        ).alias("weight"),
    )


ORACLE_PIPE_MIXTURE = """
WITH per AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT SUM(n_docs) AS total, COUNT(*) AS k FROM per)
SELECT p.lang, p.n_docs,
       CAST(p.n_docs * 1000000 // t.total AS BIGINT) AS share_ppm,
       round(CAST(t.total AS DOUBLE) / (CAST(t.k AS DOUBLE) * CAST(p.n_docs AS DOUBLE)), 6) AS weight
FROM per p CROSS JOIN tot t
"""


def text_vocab_stats(spark, sf_dir):
    """Corpus vocabulary profile in one row: token total, distinct types,
    hapax legomena (frequency-1 types — the Zipf tail that drives
    tokenizer and LM vocabulary decisions), and the type/token ratio."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        F.explode(
            F.filter(F.split(F.col("text"), "\\s+"), lambda x: x != "")
        ).alias("word")
    )
    counts = w.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    return counts.agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).alias("n_hapax"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"), 6
        ).alias("type_token_ratio"),
    )


def text_keywords(spark, sf_dir):
    """Per-document keyword extraction: top-3 terms by tf-idf (12-dp idf,
    6-dp scores, ties on the term) — the summarization/tagging primitive,
    sharing the tfidf machinery's single-explode + word-window shape."""
    d = _t(spark, sf_dir, "documents")
    from .datapipe.corpus import words_of

    tf = (
        d.select("doc_id", F.explode(words_of(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    nn = d.agg(F.count(F.lit(1)).alias("__N"))
    dfw = tf.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("word"))
    ).crossJoin(F.broadcast(nn))
    idf = F.round(
        F.log(
            (F.col("__N").cast("double") + F.lit(1.0))
            / (F.col("__df").cast("double") + F.lit(1.0))
        ),
        12,
    )
    scored = dfw.select(
        "doc_id", "word",
        F.round(F.col("tf").cast("double") * idf, 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("word").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
    )


ORACLE_TEXT_KEYWORDS = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
nn AS (SELECT COUNT(*) AS n FROM documents),
dfw AS (
  SELECT doc_id, word, tf,
         COUNT(*) OVER (PARTITION BY word) AS df
  FROM tf
),
scored AS (
  SELECT doc_id, word,
         round(CAST(tf AS DOUBLE)
               * round(ln((nn.n + 1.0) / (df + 1.0)), 12), 6) AS score
  FROM dfw CROSS JOIN nn
)
SELECT doc_id, word, score, CAST(rn AS INT) AS rank FROM (
  SELECT doc_id, word, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word ASC) AS rn
  FROM scored
) WHERE rn <= 3
"""


ORACLE_TEXT_VOCAB = """
WITH w AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
counts AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word)
SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS type_token_ratio
FROM counts
"""


def dedup_graph_pagerank(spark, sf_dir):
    """PageRank over the near-duplicate candidate graph (datapipe.graph):
    3 power iterations, damping 0.85, decimal-accumulated contributions —
    the duplication-centrality quality signal, bit-reproducible because
    every float op sequence is fixed. Oracle unrolls the rounds in CTEs
    over the same banded-minhash pair graph."""
    from .datapipe import graph

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    return graph.pagerank(d, pairs, id_col="doc_id", iters=3, damping=0.85)


def dedup_graph_triangles(spark, sf_dir):
    """Per-node triangle counts over the near-duplicate candidate graph
    (graph.triangle_count): degree-ordered edge orientation counts each
    triangle once at its minimum (degree, id) vertex and bounds the wedge
    join at O(|E|^1.5) — the local-clustering duplicate signal next to
    pagerank's global one. All exact integers; the oracle replays the
    orientation and joins verbatim."""
    from .datapipe import graph

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    out = graph.triangle_count(pairs)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("tri_count").cast("long").alias("tri_count"),
    )


def _triangles_oracle_sql() -> str:
    fwd = "(da < db) OR (da = db AND a < b)"
    return f"""
WITH {_minhash_pairs_cte()}, e AS (
  SELECT DISTINCT LEAST(a_id, b_id) AS a, GREATEST(a_id, b_id) AS b
  FROM pairs WHERE a_id <> b_id
), deg AS (
  SELECT n, COUNT(*) AS dg
  FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e) GROUP BY n
), ed AS (
  SELECT e.a, e.b, dda.dg AS da, ddb.dg AS db
  FROM e JOIN deg dda ON e.a = dda.n JOIN deg ddb ON e.b = ddb.n
), directed AS (
  SELECT CASE WHEN {fwd} THEN a ELSE b END AS u,
         CASE WHEN {fwd} THEN b ELSE a END AS v,
         CASE WHEN {fwd} THEN db ELSE da END AS dv
  FROM ed
), wedges AS (
  SELECT d1.u, d1.v AS v1, d2.v AS v2
  FROM directed d1 JOIN directed d2 ON d1.u = d2.u
  WHERE (d1.dv < d2.dv) OR (d1.dv = d2.dv AND d1.v < d2.v)
), tris AS (
  SELECT u, v1, v2 FROM wedges w
  WHERE EXISTS (SELECT 1 FROM directed c WHERE c.u = w.v1 AND c.v = w.v2)
), tnodes AS (
  SELECT unnest([u, v1, v2]) AS node FROM tris
)
SELECT CAST(node AS BIGINT) AS node, COUNT(*) AS tri_count
FROM tnodes GROUP BY node
"""


ORACLE_DEDUP_TRIANGLES = _triangles_oracle_sql()


def dedup_graph_kcore(spark, sf_dir):
    """2-core of the near-duplicate candidate graph (graph.k_core):
    iterative peel dropping degree<2 fringe nodes — what survives is the
    densely-duplicated community worth batch-deduping. Runs exactly 4
    peel rounds with early_stop off so the DuckDB oracle can unroll the
    identical rounds as CTEs (tests pin that the peel has converged by
    round 4 on this data, so the output IS the true 2-core)."""
    from .datapipe import graph

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    out = graph.k_core(pairs, k=2, rounds=4, early_stop=False)
    return out.select("node", "core_deg")


def _kcore_oracle_sql(k: int = 2, rounds: int = 4) -> str:
    # AS MATERIALIZED: each round references the previous one 3x — an
    # inlining optimizer would otherwise expand the heavy pairs CTE 3^rounds
    # times (measured 300s vs <20s at sf0.001)
    parts = [
        "e0 AS MATERIALIZED (SELECT DISTINCT LEAST(a_id, b_id) AS a,"
        " GREATEST(a_id, b_id) AS b FROM pairs WHERE a_id <> b_id)"
    ]
    for r in range(rounds):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT n, COUNT(*) AS dg FROM"
            f" (SELECT a AS n FROM e{r} UNION ALL SELECT b AS n FROM e{r})"
            f" GROUP BY n)"
        )
        parts.append(f"k{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE dg >= {k})")
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT e{r}.a, e{r}.b FROM e{r}"
            f" JOIN k{r} ka ON e{r}.a = ka.n"
            f" JOIN k{r} kb ON e{r}.b = kb.n)"
        )
    parts.append(
        f"dfin AS (SELECT n, COUNT(*) AS dg FROM"
        f" (SELECT a AS n FROM e{rounds} UNION ALL SELECT b AS n FROM e{rounds})"
        f" GROUP BY n)"
    )
    return (
        f"WITH {_minhash_pairs_cte()}, "
        + ", ".join(parts)
        + f" SELECT n AS node, dg AS core_deg FROM dfin WHERE dg >= {k}"
    )


ORACLE_DEDUP_KCORE = _kcore_oracle_sql()


def dedup_graph_harmonic(spark, sf_dir):
    """HyperBall harmonic centrality over the near-duplicate candidate
    graph (graph.neighborhood_function): per-node KMV neighborhood
    sketches (k=32) merged over 3 hops — constant state per node
    regardless of ball size, the CommonCrawl-style page-quality signal.
    Deterministic (KMV, not HLL), so the oracle unrolls the 3 sketch-
    merge rounds as CTEs and matches bit-for-bit."""
    from .datapipe import graph

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    return graph.neighborhood_function(pairs, k=32, hops=3)


def _harmonic_oracle_sql(k=32, hops=3) -> str:
    est_const = repr(float(k - 1) * float(1 << 60))
    rounds = []
    prev = "s0"
    for h in range(1, hops + 1):
        rounds.append(f"""m{h} AS (
  SELECT e.src AS node, s.hs FROM e JOIN {prev} s ON e.dst = s.node
  UNION ALL SELECT node, hs FROM {prev}
), x{h} AS (
  SELECT DISTINCT node, unnest(hs) AS hv FROM m{h}
), s{h} AS (
  SELECT node, list(hv ORDER BY hv) AS hs FROM (
    SELECT node, hv FROM x{h}
    QUALIFY row_number() OVER (PARTITION BY node ORDER BY hv) <= {k}
  ) GROUP BY node
)""")
        prev = f"s{h}"

    def ni(h):
        return (
            f"CAST(round((CASE WHEN len(s{h}.hs) < {k} "
            f"THEN CAST(len(s{h}.hs) AS DOUBLE) "
            f"ELSE round(CAST({est_const} AS DOUBLE) / CAST(s{h}.hs[{k}] AS DOUBLE), 6) "
            f"END) * 1e6) AS BIGINT)"
        )

    joins = " ".join(
        f"JOIN s{h} ON s1.node = s{h}.node" for h in range(2, hops + 1)
    )
    balls_cols = ", ".join(f"{ni(h)} AS n{h}i" for h in range(1, hops + 1))
    import math as _math

    lcm = _math.lcm(*range(1, hops + 1))
    harm_terms = []
    prev_expr = "1000000"
    for h in range(1, hops + 1):
        harm_terms.append(f"{lcm // h} * (n{h}i - {prev_expr})")
        prev_expr = f"n{h}i"
    n_cols = ",\n       ".join(
        f"CAST(n{h}i AS DOUBLE) / 1000000.0 AS n{h}" for h in range(1, hops + 1)
    )
    return f"""
WITH {_minhash_pairs_cte()}, e0 AS (
  SELECT DISTINCT CAST(a_id AS BIGINT) AS src, CAST(b_id AS BIGINT) AS dst
  FROM pairs WHERE a_id <> b_id
), e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
  )
), n0 AS (
  SELECT DISTINCT src AS node FROM e
), s0 AS (
  SELECT node,
         [CAST(concat('0x', substr(md5(concat('anf:', CAST(node AS VARCHAR))), 1, 15)) AS BIGINT)] AS hs
  FROM n0
), {', '.join(rounds)},
balls AS (
  SELECT s1.node, {balls_cols}
  FROM s1 {joins}
)
SELECT node,
       {n_cols},
       CAST({' + '.join(harm_terms)} AS DOUBLE) / {float(lcm) * 1e6!r} AS harmonic
FROM balls
"""


ORACLE_DEDUP_HARMONIC = _harmonic_oracle_sql()


def _pagerank_oracle_sql(iters=3, damping=0.85):
    d = repr(float(damping))
    one_minus_d = repr(1.0 - float(damping))  # Python's 1.0-0.85 bit pattern
    ctes = [
        _minhash_pairs_cte(),
        """e0 AS (
  SELECT DISTINCT CAST(a_id AS BIGINT) AS src, CAST(b_id AS BIGINT) AS dst
  FROM pairs WHERE a_id <> b_id
)""",
        "e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0)",
        "deg AS (SELECT src, COUNT(*) AS dg FROM e GROUP BY src)",
        "allnodes AS (SELECT CAST(doc_id AS BIGINT) AS node, (SELECT COUNT(*) FROM documents) AS N FROM documents)",
        "pr0 AS (SELECT node, round(1.0 / CAST(N AS DOUBLE), 12) AS pr FROM allnodes)",
    ]
    for i in range(iters):
        ctes += [
            f"""c{i} AS (
  SELECT e.dst AS node,
         CAST(round(p.pr / CAST(d.dg AS DOUBLE), 12) AS DECIMAL(38,12)) AS c
  FROM e JOIN deg d ON e.src = d.src JOIN pr{i} p ON e.src = p.node
)""",
            f"s{i} AS (SELECT node, SUM(c) AS s FROM c{i} GROUP BY node)",
            f"""pr{i + 1} AS (
  SELECT b.node,
         round({one_minus_d} / CAST(b.N AS DOUBLE)
               + {d} * COALESCE(CAST(s.s AS DOUBLE), 0.0), 12) AS pr
  FROM allnodes b LEFT JOIN s{i} s ON b.node = s.node
)""",
        ]
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS doc_id, pr FROM pr{iters}\n"
    )


ORACLE_DEDUP_PAGERANK = _pagerank_oracle_sql()


def dedup_corpus_keepers(spark, sf_dir):
    """END-TO-END near-dup dedup: LSH candidate pairs -> connected
    components -> keep ONE canonical doc per cluster (the min id — the
    standard 'keep first' policy) -> materialize the surviving corpus.
    This is the actual output a training pipeline ships; the oracle closes
    the same pairs with a recursive CTE and anti-selects non-canonical
    members."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    assign = dedup.dedup_clusters(d, pairs, id_col="doc_id")
    keepers = assign.where(F.col("cluster_id") == F.col("doc_id")).select("doc_id")
    return (
        d.join(keepers, on="doc_id", how="left_semi")
        .select("doc_id", "n_chars")
    )


ORACLE_DEDUP_CORPUS = f"""
WITH RECURSIVE {_minhash_pairs_cte()},
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id AS src, a_id AS dst FROM pairs
),
cc(node, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, cc.label FROM edges e JOIN cc ON e.dst = cc.node
),
best AS (SELECT node, MIN(label) AS cl FROM cc GROUP BY node)
SELECT d.doc_id, d.n_chars
FROM documents d LEFT JOIN best ON d.doc_id = best.node
WHERE COALESCE(best.cl, d.doc_id) = d.doc_id
"""


def pipe_full_pipeline(spark, sf_dir):
    """The WHOLE training-data pipeline as one oracle-checked query:
    quality gate (token count >= 10) -> exact dedup (keep min id per md5)
    -> MinHash-LSH near-dedup over the survivors -> connected components
    -> keep one canonical doc per cluster -> deterministic md5-keyed
    train/val/test split -> per-split doc and token totals. Every stage
    reuses an operator whose oracle already passes standalone; this query
    proves they COMPOSE (each stage consumes the previous stage's actual
    survivors, not the raw table)."""
    from .datapipe import sampling, text as tx

    d = _t(spark, sf_dir, "documents")
    q = d.where(tx.token_count("text") >= 10)
    kept1 = dedup.exact_dedup(q, "text", "doc_id", keep="min")
    pairs = dedup.minhash_lsh_pairs(
        kept1, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    assign = dedup.dedup_clusters(kept1, pairs, id_col="doc_id")
    keepers = assign.where(F.col("cluster_id") == F.col("doc_id")).select("doc_id")
    final = kept1.join(keepers, on="doc_id", how="left_semi")
    split = sampling.train_val_test_split(final, "doc_id", val=0.1, test=0.1)
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.token_count("text").cast("long")).alias("n_tokens"),
    )


def _full_pipeline_oracle_sql() -> str:
    mh = _minhash_pairs_cte().replace("FROM documents", "FROM exd")
    return f"""
WITH RECURSIVE qf AS (
  SELECT doc_id, text FROM documents
  WHERE len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) >= 10
),
ex AS (SELECT MIN(doc_id) AS doc_id FROM qf GROUP BY md5(text)),
exd AS (SELECT q.doc_id, q.text FROM qf q JOIN ex ON ex.doc_id = q.doc_id),
{mh},
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id AS src, a_id AS dst FROM pairs
),
cc(node, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, cc.label FROM edges e JOIN cc ON e.dst = cc.node
),
best AS (SELECT node, MIN(label) AS cl FROM cc GROUP BY node),
final AS (
  SELECT d.doc_id, d.text FROM exd d LEFT JOIN best ON d.doc_id = best.node
  WHERE COALESCE(best.cl, d.doc_id) = d.doc_id
),
labeled AS (
  SELECT doc_id, text,
         CASE WHEN su < 0.1 THEN 'val' WHEN su < 0.2 THEN 'test'
              ELSE 'train' END AS split
  FROM (
    SELECT *, CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 AS su
    FROM final
  )
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
FROM labeled GROUP BY split
"""


ORACLE_PIPE_FULL = _full_pipeline_oracle_sql()


def pipe_weighted_sample(spark, sf_dir):
    """Quality-weighted corpus subsampling (Efraimidis-Spirakis
    u^(1/w) top-k): longer documents (weight = word count) are
    proportionally more likely to survive; selection is deterministic,
    engine-independent (score rounded to 9 dp, ties by doc_id), and
    distributed (TakeOrderedAndProject, no global sort)."""
    from .datapipe import sampling

    d = _t(spark, sf_dir, "documents")
    w = F.size(F.split(F.col("text"), " ")).cast("double")
    out = sampling.weighted_sample(d, "doc_id", w, k=50)
    return out.select("doc_id", F.col("__wscore").alias("score"))


ORACLE_PIPE_WEIGHTED = """
WITH scored AS (
  SELECT doc_id,
         round(pow(
           CAST(concat('0x', substr(md5(concat('wsample:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0,
           1.0 / CAST(len(string_split(text, ' ')) AS DOUBLE)
         ), 9) AS score
  FROM documents
),
ranked AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
  FROM scored
)
SELECT doc_id, score FROM ranked WHERE rn <= 50
"""


def text_gopher_rules(spark, sf_dir):
    """Gopher-style quality filter: per-rule booleans + keep decision, all
    whole-stage codegen (rule thresholds on exact int/double arithmetic)."""
    d = _t(spark, sf_dir, "documents")
    g = text.gopher_rules("text", min_words=25)
    return d.select("doc_id", g.alias("__g")).select("doc_id", "__g.*")


ORACLE_TEXT_GOPHER = """
WITH w AS (
  SELECT doc_id,
         list_filter(str_split_regex(text, ' +'), x -> x <> '') AS words
  FROM documents
),
m AS (
  SELECT doc_id,
         len(words) AS n_words,
         CASE WHEN len(words) > 0
              THEN CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
                   / CAST(len(words) AS DOUBLE)
              ELSE 0.0 END AS mean_raw,
         CASE WHEN len(words) > 0
              THEN CAST(len(list_filter(words, x -> regexp_full_match(x, '[A-Za-z]+'))) AS DOUBLE)
                   / CAST(len(words) AS DOUBLE)
              ELSE 0.0 END AS alpha_raw,
         len(list_filter(words, x -> lower(x) IN
             ('the', 'a', 'of', 'to', 'and', 'in', 'be', 'that'))) AS stopword_hits
  FROM w
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(mean_raw, 6) AS mean_word_len,
       round(alpha_raw, 6) AS alpha_frac,
       CAST(stopword_hits AS BIGINT) AS stopword_hits,
       (n_words >= 25 AND n_words <= 100000) AS wc_ok,
       (mean_raw >= 3.0 AND mean_raw <= 10.0) AS wl_ok,
       (alpha_raw >= 0.9) AS alpha_ok,
       (stopword_hits >= 2) AS stop_ok,
       ((n_words >= 25 AND n_words <= 100000) AND (mean_raw >= 3.0 AND mean_raw <= 10.0)
        AND alpha_raw >= 0.9 AND stopword_hits >= 2) AS keep
FROM m
"""


def sim_embedding_stats(spark, sf_dir):
    """Per-label embedding statistics: counts and decimal-exact norms."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.sqrt(similarity.norm_decimal_expr(F.col("embedding")).cast("double")), 6
        ).alias("l2_norm"),
    )


ORACLE_SIM_STATS = """
SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
       round(sqrt(CAST((SELECT SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12) AS DECIMAL(38,12)))
                        FROM unnest(embedding) AS t(x)) AS DOUBLE)), 6) AS l2_norm
FROM embeddings
"""


def sim_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k baseline: broadcast queries, in-order fold dots, window rank."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    corpus = e.where(F.col("vec_id") >= 8)
    out = similarity.cosine_topk(q, corpus, k=5)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


def _inorder_dot_sql(a: str, b: str) -> str:
    """Sequential left-fold double dot product over two list columns —
    the DuckDB mirror of dot_inorder_expr (identical IEEE op order)."""
    return (
        f"COALESCE(list_sum(list_transform(range(0, len({a})), "
        f"i -> CAST({a}[CAST(i AS INT) + 1] AS DOUBLE) * "
        f"CAST({b}[CAST(i AS INT) + 1] AS DOUBLE))), 0.0)"
    )


def _inorder_cosine_sql(a: str, b: str) -> str:
    dot = _inorder_dot_sql(a, b)
    qn = f"sqrt({_inorder_dot_sql(a, a)})"
    cn = f"sqrt({_inorder_dot_sql(b, b)})"
    return (
        f"round(CASE WHEN {qn} * {cn} > 0 THEN ({dot}) / ({qn} * {cn}) "
        f"ELSE 0.0 END, 8)"
    )


ORACLE_SIM_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings WHERE vec_id >= 8),
cosined AS (
  SELECT query_id, neighbor_id, {_inorder_cosine_sql('qe', 'ce')} AS cosine
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM cosined
) WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# events (batch analogues of the streaming operators)
# ---------------------------------------------------------------------------

_NS_HOUR = 3_600_000_000_000
_NS_GAP = 1_800_000_000_000  # 30 min


def events_hourly(spark, sf_dir):
    """Hourly event rollup with exact integer-cents value sums."""
    # ts column is int64 nanoseconds (see _t); hour bucket via exact
    # integer division — the batch analogue of window(ts, '1 hour')
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("hour_epoch", F.expr(f"(ts div {_NS_HOUR}) * 3600"))
        .groupBy("hour_epoch", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(F.col("value"), "sum_value"),
        )
    )


def events_funnel(spark, sf_dir):
    """Ordered-sequence funnel analysis (view -> click -> purchase, the
    MATCH_RECOGNIZE / funnel-chart workload): per user, the earliest view,
    the earliest click strictly after it, the earliest purchase strictly
    after that; stage user-counts plus exact int64-ns total latency for
    users converting within 24h. All native: three filtered min-aggregates
    chained by equi-joins on user_id — each stage's input is one row per
    user, so the joins broadcast/AQE-shrink at any scale."""
    e = _t(spark, sf_dir, "events")
    v = e.where("event_type = 'view'").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    c = (
        e.where("event_type = 'click'")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where("event_type = 'purchase'")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t3"))
    )
    day_ns = 24 * 3600 * 1_000_000_000
    conv = p.where(F.col("t3") - F.col("t1") <= day_ns)
    stages = [
        v.agg(F.lit("1_view").alias("stage"), F.count(F.lit(1)).alias("n_users"),
              F.lit(0).cast("long").alias("total_latency_ns")),
        c.agg(F.lit("2_click").alias("stage"), F.count(F.lit(1)).alias("n_users"),
              F.lit(0).cast("long").alias("total_latency_ns")),
        p.agg(F.lit("3_purchase").alias("stage"), F.count(F.lit(1)).alias("n_users"),
              F.lit(0).cast("long").alias("total_latency_ns")),
        conv.agg(
            F.lit("4_converted_24h").alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
            F.coalesce(F.sum(F.col("t3") - F.col("t1")), F.lit(0)).cast("long")
            .alias("total_latency_ns"),
        ),
    ]
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out


ORACLE_EVENTS_FUNNEL = """
WITH v AS (
  SELECT user_id, MIN(epoch_ns(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, v.t1, MIN(epoch_ns(e.ts)) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t1
  GROUP BY e.user_id, v.t1
),
p AS (
  SELECT e.user_id, c.t1, MIN(epoch_ns(e.ts)) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t2
  GROUP BY e.user_id, c.t1
),
conv AS (SELECT * FROM p WHERE t3 - t1 <= 86400000000000)
SELECT '1_view' AS stage, COUNT(*) AS n_users, CAST(0 AS BIGINT) AS total_latency_ns FROM v
UNION ALL
SELECT '2_click', COUNT(*), CAST(0 AS BIGINT) FROM c
UNION ALL
SELECT '3_purchase', COUNT(*), CAST(0 AS BIGINT) FROM p
UNION ALL
SELECT '4_converted_24h', COUNT(*), CAST(COALESCE(SUM(t3 - t1), 0) AS BIGINT) FROM conv
"""


def events_windowed_topk(spark, sf_dir):
    """Per-window heavy hitters: top-2 event types by count in every
    6-hour window (count ties broken by type name) — the batch analogue
    of a streaming windowed top-k dashboard. One shuffle for the count,
    one for the per-window rank window; both keyed, both AQE-coalesced."""
    e = _t(spark, sf_dir, "events")
    counts = (
        e.withColumn("w6_epoch", F.expr(f"(ts div ({_NS_HOUR} * 6)) * 21600"))
        .groupBy("w6_epoch", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    from pyspark.sql import Window as W

    rank = F.row_number().over(
        W.partitionBy("w6_epoch").orderBy(
            F.col("n_events").desc(), F.col("event_type")
        )
    )
    return (
        counts.withColumn("rank", rank.cast("long"))
        .where(F.col("rank") <= 2)
    )


ORACLE_EVENTS_TOPK = """
WITH counts AS (
  SELECT (epoch_ns(ts) // (3600000000000 * 6)) * 21600 AS w6_epoch,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT w6_epoch, event_type, n_events, rank FROM (
  SELECT w6_epoch, event_type, n_events,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY w6_epoch
             ORDER BY n_events DESC, event_type) AS BIGINT) AS rank
  FROM counts
) WHERE rank <= 2
"""


def events_user_stats(spark, sf_dir):
    """Exact distinct users + exact linear-interpolation percentiles per
    event type (Spark `percentile` == DuckDB `quantile_cont` bit-exactly:
    same sort, same interpolation arithmetic)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.expr("percentile(value, 0.5)").alias("p50_value"),
        F.expr("percentile(value, 0.9)").alias("p90_value"),
    )


ORACLE_EVENTS_USER_STATS = """
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       quantile_cont(value, 0.5) AS p50_value,
       quantile_cont(value, 0.9) AS p90_value
FROM events
GROUP BY event_type
"""


def events_props_json(spark, sf_dir):
    """Semi-structured payload parsing stays native: get_json_object path
    extraction compiled by Catalyst (no UDF), exact integer aggregation."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.withColumn("__k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__k").alias("sum_k"),
            F.min("__k").alias("min_k"),
            F.max("__k").alias("max_k"),
        )
    )


ORACLE_EVENTS_PROPS = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


def events_asof_join(spark, sf_dir):
    """As-of join: every click matched to the user's most recent purchase at
    or before it (backward, left-outer). Oracle uses DuckDB's NATIVE ASOF
    JOIN — this implementation is checked against a reference engine's own
    operator, not a SQL re-derivation."""
    from .join.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("pvalue"))
        .withColumn("pts", F.col("ts"))
    )
    j = asof_join(clicks, purch, on="ts", by=["user_id"], value_cols=["pvalue", "pts"])
    return j.select(
        "event_id",
        F.col("pvalue_r").alias("last_purchase_value"),
        # DuckDB parses TIMESTAMP_NS parquet at microsecond precision, so the
        # oracle's epoch_ns is us-truncated; mirror that for the compare (the
        # join itself runs at full ns precision on the Spark side)
        (F.expr("pts_r div 1000") * 1000).alias("last_purchase_ts"),
    )


ORACLE_EVENTS_ASOF = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, ts, max_by(value, event_id) AS pvalue
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id,
       p.pvalue AS last_purchase_value,
       epoch_ns(p.ts) AS last_purchase_ts
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def events_asof_forward(spark, sf_dir):
    """FORWARD as-of join: every click matched to the user's NEXT purchase
    at or after it (the time-to-conversion shape). Same one-shuffle
    tag-union pattern as backward with the scan order reversed; oracle is
    DuckDB's native ASOF with the inequality flipped."""
    from .join.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("pvalue"))
        .withColumn("pts", F.col("ts"))
    )
    j = asof_join(
        clicks, purch, on="ts", by=["user_id"],
        value_cols=["pvalue", "pts"], direction="forward",
    )
    return j.select(
        "event_id",
        F.col("pvalue_r").alias("next_purchase_value"),
        (F.expr("pts_r div 1000") * 1000).alias("next_purchase_ts"),
    )


ORACLE_EVENTS_ASOF_FORWARD = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, ts, max_by(value, event_id) AS pvalue
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id,
       p.pvalue AS next_purchase_value,
       epoch_ns(p.ts) AS next_purchase_ts
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


def events_time_weighted_avg(spark, sf_dir):
    """Time-weighted average value per user: each event's value weighted
    by the nanoseconds until the user's next event (lead window, ties
    broken by event_id), the classic sensor/price TWA. Numerator is an
    exact decimal sum of cent x ns products (too big for int64), so the
    result is engine-exact."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    dt = (F.lead("ts").over(w) - F.col("ts")).alias("__dt")
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    d = e.select("user_id", cents.alias("__c"), dt).where(F.col("__dt").isNotNull())
    num = F.sum(F.col("__c").cast("decimal(38,0)") * F.col("__dt"))
    den = F.sum("__dt")
    return d.groupBy("user_id").agg(
        F.round(
            num.cast("double") / F.lit(100.0) / den.cast("double"), 6
        ).alias("twa"),
        den.alias("total_ns"),
    )


ORACLE_EVENTS_TWA = """
WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS t, value FROM events),
d AS (
  SELECT user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dt
  FROM e
)
SELECT user_id,
       round(CAST(SUM(CAST(c AS DECIMAL(38,0)) * dt) AS DOUBLE) / 100.0
             / CAST(SUM(dt) AS DOUBLE), 6) AS twa,
       CAST(SUM(dt) AS BIGINT) AS total_ns
FROM d WHERE dt IS NOT NULL GROUP BY user_id
"""


def events_rolling_anomaly(spark, sf_dir):
    """Rolling-baseline anomaly detection: per user (ordered by ts,
    event_id), the mean of the previous 10 values (exact decimal cents
    over a ROWS frame — frame sums are order-defined, decimal makes them
    engine-exact); flag events whose value exceeds 2x the baseline with
    at least 5 priors. Returns flagged events only."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-10, -1)
    )
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    d = e.select(
        "user_id", "event_id", "ts", "value", cents.alias("__c")
    ).select(
        "user_id", "event_id", "value",
        F.sum(F.col("__c").cast("decimal(38,0)")).over(w).alias("__s"),
        F.count(F.lit(1)).over(w).alias("__n"),
    )
    mean = F.col("__s").cast("double") / F.col("__n").cast("double") / F.lit(100.0)
    return (
        d.where(F.col("__n") >= 5)
        .where(F.col("value") > F.lit(2.0) * mean)
        .select("user_id", "event_id", "value", F.round(mean, 6).alias("baseline"))
    )


ORACLE_EVENTS_ROLLING = """
WITH d AS (
  SELECT user_id, event_id, value,
         SUM(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS DECIMAL(38,0)))
           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                 ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS s,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                        ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS n
  FROM events
)
SELECT user_id, event_id, value,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS baseline
FROM d
WHERE n >= 5 AND value > 2.0 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)
"""


def events_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent preceding non-purchase event (backward as-of), revenue then
    rolls up by attributed channel — the standard marketing-attribution
    shape, built from the same one-shuffle as-of machinery. Unattributed
    purchases (no prior touch) fall into the 'none' bucket."""
    from .join.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    touches = (
        e.where(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("channel"))
    )
    j = asof_join(purchases, touches, on="ts", by=["user_id"], value_cols=["channel"])
    return (
        j.select(F.coalesce(F.col("channel_r"), F.lit("none")).alias("channel"), "value")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            _money_sum(F.col("value"), "revenue"),
        )
    )


ORACLE_EVENTS_ATTRIBUTION = f"""
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, ts, MAX(event_type) AS channel
  FROM events WHERE event_type <> 'purchase' GROUP BY user_id, ts
),
attributed AS (
  SELECT COALESCE(t.channel, 'none') AS channel, p.value
  FROM purchases p ASOF LEFT JOIN touches t
    ON p.user_id = t.user_id AND p.ts >= t.ts
)
SELECT channel, COUNT(*) AS n_purchases,
       {_money_sum_sql('value', 'revenue')}
FROM attributed GROUP BY channel
"""


def events_expectations(spark, sf_dir):
    """Data-quality gate (ops.profile.check_expectations): five declared
    row expectations checked in ONE scan (conditional counts inside one
    aggregate — no per-rule jobs), violations as exact integer ppm. The
    pre-ingest validation block of any production feed."""
    from .ops.profile import check_expectations

    e = _t(spark, sf_dir, "events")
    rules = {
        "value_non_negative": "value >= 0.0",
        "event_type_known": "event_type IN ('view','click','purchase','error','signup')",
        "user_id_in_range": "user_id >= 0 AND user_id < 1000000",
        "ts_in_2024": "ts >= 1704067200000000000 AND ts < 1735689600000000000",
        "props_present": "props IS NOT NULL AND length(props) > 0",
    }
    return check_expectations(e, rules)


ORACLE_EVENTS_EXPECTATIONS = """
WITH one AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN COALESCE(value >= 0.0, FALSE) THEN 0 ELSE 1 END) AS v_value,
         SUM(CASE WHEN COALESCE(event_type IN ('view','click','purchase','error','signup'), FALSE) THEN 0 ELSE 1 END) AS v_type,
         SUM(CASE WHEN COALESCE(user_id >= 0 AND user_id < 1000000, FALSE) THEN 0 ELSE 1 END) AS v_uid,
         SUM(CASE WHEN COALESCE(epoch_ns(ts) >= 1704067200000000000 AND epoch_ns(ts) < 1735689600000000000, FALSE) THEN 0 ELSE 1 END) AS v_ts,
         SUM(CASE WHEN COALESCE(props IS NOT NULL AND length(props) > 0, FALSE) THEN 0 ELSE 1 END) AS v_props
  FROM events
)
SELECT r.rule, one.n_rows, CAST(r.v AS BIGINT) AS n_violations,
       CAST(r.v * 1000000 // one.n_rows AS BIGINT) AS violation_ppm
FROM one, (
  SELECT 'event_type_known' AS rule, v_type AS v FROM one
  UNION ALL SELECT 'props_present', v_props FROM one
  UNION ALL SELECT 'ts_in_2024', v_ts FROM one
  UNION ALL SELECT 'user_id_in_range', v_uid FROM one
  UNION ALL SELECT 'value_non_negative', v_value FROM one
) r
"""


def events_dau_wau(spark, sf_dir):
    """Daily/weekly active users + stickiness (DAU/WAU): rolling distinct
    users need a range join, not a window (distinct doesn't slide) — the
    tiny day dimension broadcasts against the distinct (user, day) table
    with a 7-day band condition. Exact int64-ns day arithmetic."""
    e = _t(spark, sf_dir, "events")
    day = F.expr("ts div 86400000000000")
    ud = e.select("user_id", day.alias("day")).distinct()
    days = ud.select("day").distinct().select(F.col("day").alias("d"))
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    wau = (
        ud.join(
            F.broadcast(days),
            (F.col("day") <= F.col("d")) & (F.col("day") >= F.col("d") - 6),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau["day"] == wau["d"])
        .select(
            "day", "dau", "wau",
            F.round(F.col("dau").cast("double") / F.col("wau").cast("double"), 6).alias("stickiness"),
        )
    )


def events_top_paths(spark, sf_dir):
    """Behavioral sequence mining: the 10 most common consecutive 3-event
    paths across users (lead windows over the per-user timeline, global
    count, distributed top-k with deterministic ties) — the n-gram
    treatment applied to event streams."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    tri = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__e2", F.lead("event_type", 1).over(w))
        .withColumn("__e3", F.lead("event_type", 2).over(w))
        .where(F.col("__e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "__e2", "__e3").alias("path")
        )
    )
    top = (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )
    rw = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return top.withColumn("rank", F.row_number().over(rw).cast("int"))


def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event streams:
    P(next | current) from consecutive pairs (lead window), exact counts
    and 6-dp probabilities — the behavioral-model estimation step that
    feeds simulation and anomaly scoring."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__next", F.lead("event_type").over(w))
        .where(F.col("__next").isNotNull())
        .select(F.col("event_type").alias("from_type"), F.col("__next").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type", "to_type", "n",
        F.round(F.col("n").cast("double") / tot.cast("double"), 6).alias("p"),
    )


def events_geo_hotspots(spark, sf_dir):
    """Emerging spatial hotspots: event locations grid-binned (5x5 cells),
    counts split at the month midpoint, cells whose second-half density
    at least doubles (with a minimum support) — the geo x time
    composition behind ops dashboards. Exact integer counts and integer
    midpoint arithmetic."""
    e = _t(spark, sf_dir, "events")
    x = "CAST(user_id % 360 AS DOUBLE) - 179.5"
    y = "CAST(event_id % 170 AS DOUBLE) - 84.5"
    mid = 1705881600000000000  # 2024-01-22T00:00:00Z in ns (month midpoint)
    d = e.selectExpr(
        f"CAST(floor(({x}) / 5.0) AS INT) AS cx",
        f"CAST(floor(({y}) / 5.0) AS INT) AS cy",
        f"CASE WHEN ts < {mid} THEN 0 ELSE 1 END AS half",
    )
    counts = d.groupBy("cx", "cy").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_first"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_second"),
    )
    return counts.where(
        (F.col("n_second") >= 2 * F.col("n_first")) & (F.col("n_second") >= 5)
    )


ORACLE_EVENTS_GEO_HOTSPOTS = """
WITH d AS (
  SELECT CAST(floor((CAST(user_id % 360 AS DOUBLE) - 179.5) / 5.0) AS INT) AS cx,
         CAST(floor((CAST(event_id % 170 AS DOUBLE) - 84.5) / 5.0) AS INT) AS cy,
         CASE WHEN epoch_ns(ts) < 1705881600000000000 THEN 0 ELSE 1 END AS half
  FROM events
),
counts AS (
  SELECT cx, cy,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_first,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_second
  FROM d GROUP BY cx, cy
)
SELECT cx, cy, CAST(n_first AS BIGINT) AS n_first, CAST(n_second AS BIGINT) AS n_second
FROM counts
WHERE n_second >= 2 * n_first AND n_second >= 5
"""


ORACLE_EVENTS_MARKOV = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM pairs WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
FROM counts
"""


ORACLE_EVENTS_TOP_PATHS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS e3
  FROM events
),
tri AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path
  FROM seq WHERE e3 IS NOT NULL
),
top AS (
  SELECT path, COUNT(*) AS n FROM tri GROUP BY path
  ORDER BY n DESC, path ASC LIMIT 10
)
SELECT path, n, CAST(row_number() OVER (ORDER BY n DESC, path ASC) AS INT) AS rank
FROM top
"""


ORACLE_EVENTS_DAU_WAU = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events
),
days AS (SELECT DISTINCT day AS d FROM ud),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day),
wau AS (
  SELECT dd.d, COUNT(DISTINCT u.user_id) AS wau
  FROM days dd JOIN ud u ON u.day <= dd.d AND u.day >= dd.d - 6
  GROUP BY dd.d
)
SELECT a.day, a.dau, w.wau,
       round(CAST(a.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6) AS stickiness
FROM dau a JOIN wau w ON a.day = w.d
"""


ORACLE_EVENTS_HOURLY = f"""
SELECT (epoch_ns(ts) // {_NS_HOUR}) * 3600 AS hour_epoch, event_type,
       COUNT(*) AS n_events,
       {_money_sum_sql('value', 'sum_value')}
FROM events GROUP BY 1, 2
"""


def events_geo_extent(spark, sf_dir):
    """Windowed spatial extent: per-hour bbox + count of event locations —
    the geo surface composed with time-bucketed aggregation (the batch
    analogue of a streaming geo dashboard; the extent min/max aggregate is
    algebraic, so it drops into a watermarked window unchanged)."""
    e = _t(spark, sf_dir, "events")
    pt = (
        "ST_Point(CAST(user_id % 360 AS DOUBLE) - 179.5, "
        "CAST(event_id % 170 AS DOUBLE) - 84.5)"
    )
    return (
        e.withColumn("hour_epoch", F.expr(f"(ts div {_NS_HOUR}) * 3600"))
        .withColumn("b", F.expr(f"ST_BBox({pt})"))
        .groupBy("hour_epoch")
        .agg(
            F.min("b.xmin").alias("xmin"),
            F.min("b.ymin").alias("ymin"),
            F.max("b.xmax").alias("xmax"),
            F.max("b.ymax").alias("ymax"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


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


ORACLE_EVENTS_GEO_EXTENT = f"""
SELECT (epoch_ns(ts) // {_NS_HOUR}) * 3600 AS hour_epoch,
       MIN(CAST(user_id % 360 AS DOUBLE) - 179.5) AS xmin,
       MIN(CAST(event_id % 170 AS DOUBLE) - 84.5) AS ymin,
       MAX(CAST(user_id % 360 AS DOUBLE) - 179.5) AS xmax,
       MAX(CAST(event_id % 170 AS DOUBLE) - 84.5) AS ymax,
       COUNT(*) AS n_events
FROM events GROUP BY 1
"""


def events_sessions(spark, sf_dir):
    """30-minute-gap sessionization via lag + cumulative session ids."""
    e = _t(spark, sf_dir, "events")
    e.createOrReplaceTempView("__events_sessions_src")
    return spark.sql(
        f"""
        SELECT user_id, SUM(new_session) AS n_sessions, COUNT(*) AS n_events
        FROM (
          SELECT user_id,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > {_NS_GAP}
                      THEN 1 ELSE 0 END AS new_session
          FROM __events_sessions_src
        ) GROUP BY user_id
        """
    )


ORACLE_EVENTS_SESSIONS = f"""
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > {_NS_GAP}
              THEN 1 ELSE 0 END AS new_session
  FROM events
) GROUP BY user_id
"""


def mm_blob_stats(spark, sf_dir):
    """Opaque media blob statistics (size/digest family) over the synthesized binary column."""
    from .datapipe.multimodal import blob_stats

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return blob_stats(d, "blob").select(
        "doc_id", F.col("blob_bytes").cast("long").alias("blob_bytes"), "blob_sha256"
    )


ORACLE_MM_BLOB = """
SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS blob_bytes,
       sha256(text) AS blob_sha256
FROM documents
"""


_BMP_2X2_HEADER_HEX = (
    "424D460000000000000036000000280000000200000002000000010018000000"
    "000010000000130B0000130B00000000000000000000"
)


def mm_image_brightness(spark, sf_dir):
    """REAL image decode under oracle check: a 2x2 24-bit BMP is assembled
    NATIVELY (constant header + per-row gray pixel bytes), decoded by the
    actual pure-numpy BMP decoder inside mapInPandas, and the extracted
    mean/std features have the closed form k/255 and 0."""
    from .datapipe.multimodal import extract_features

    d = _t(spark, sf_dir, "documents")
    kk = "lpad(hex(doc_id % 256), 2, '0')"
    row = f"concat(repeat({kk}, 6), '0000')"
    blob = f"unhex(concat('{_BMP_2X2_HEADER_HEX}', {row}, {row}))"
    src = d.selectExpr("doc_id", f"{blob} AS blob")
    feats = extract_features(src, "blob", dim=8)
    return feats.select(
        "doc_id",
        F.col("features")[0].alias("mean_r"),
        F.col("features")[3].alias("std_r"),
    )


ORACLE_MM_BRIGHTNESS = """
SELECT doc_id,
       CAST((doc_id % 256) / 255.0 AS REAL) AS mean_r,
       CAST(0.0 AS REAL) AS std_r
FROM documents
"""


_WAV_8S_HEADER_HEX = (
    "524946463400000057415645666D7420100000000100010040"
    "1F0000803E0000020010006461746110000000"
)


def mm_audio_features(spark, sf_dir):
    """REAL audio decode under oracle check: an 8-sample constant PCM16 WAV
    is assembled natively (constant header + little-endian sample bytes),
    decoded by the actual numpy WAV decoder, and rms == peak == v/32768,
    duration == 1 ms at 8 kHz — all closed-form (v/2^15 is exact)."""
    from .datapipe.multimodal import extract_features

    d = _t(spark, sf_dir, "documents")
    # v = (doc_id % 100) * 25 fits int16 and is non-negative
    vhex = "lpad(hex((doc_id % 100) * 25), 4, '0')"
    le = f"concat(substr({vhex}, 3, 2), substr({vhex}, 1, 2))"
    blob = f"unhex(concat('{_WAV_8S_HEADER_HEX}', repeat({le}, 8)))"
    src = d.selectExpr("doc_id", f"{blob} AS blob")
    feats = extract_features(src, "blob", dim=8)
    return feats.select(
        "doc_id",
        F.col("features")[0].alias("rms"),
        F.col("features")[2].alias("peak"),
        F.col("features")[3].alias("duration_s"),
    )


ORACLE_MM_AUDIO = """
SELECT doc_id,
       CAST(((doc_id % 100) * 25) / 32768.0 AS REAL) AS rms,
       CAST(((doc_id % 100) * 25) / 32768.0 AS REAL) AS peak,
       CAST(0.001 AS REAL) AS duration_s
FROM documents
"""


_BMP_4X4_HEADER_HEX = (
    "424D660000000000000036000000280000000400000004000000010018000000"
    "000030000000130B0000130B00000000000000000000"
)


def mm_image_resize(spark, sf_dir):
    """REAL decode -> nearest-neighbor resize -> re-encode round-trip under
    byte-exact oracle check: a constant 2x2 BMP resized to 4x4 must equal
    the natively constructed constant 4x4 BMP, compared as full hex (DuckDB
    cannot hash blobs, so the oracle emits the expected hex string)."""
    from .datapipe.multimodal import resize_images

    d = _t(spark, sf_dir, "documents")
    kk = "lpad(hex(doc_id % 256), 2, '0')"
    row2 = f"concat(repeat({kk}, 6), '0000')"
    blob = f"unhex(concat('{_BMP_2X2_HEADER_HEX}', {row2}, {row2}))"
    src = d.selectExpr("doc_id", f"{blob} AS blob")
    out = resize_images(src, "blob", 4, 4)
    return out.selectExpr("doc_id", "hex(resized) AS resized_hex")


ORACLE_MM_RESIZE = f"""
SELECT doc_id,
       upper(concat('{_BMP_4X4_HEADER_HEX}',
                    repeat(lpad(hex(doc_id % 256), 2, '0'), 48))) AS resized_hex
FROM documents
"""


def _gif_hex_parts():
    """Constant pieces of a per-doc 2x2 two-color GIF: everything except
    the 3 palette bytes of color 0 (gray level = doc_id % 256). The LZW
    payload for the fixed [0,1,1,0] pixel pattern comes from the engine's
    own encoder — which is validated byte-identically against the
    published GIF spec example, so this is not self-referential."""
    from .datapipe.multimodal import _gif_lzw_encode

    lzw = _gif_lzw_encode([0, 1, 1, 0], 2)
    pre = "474946383961" + "02000200" + "80" + "0000"
    post = (
        "FF0000"                      # color 1 = red
        + "2C000000000200020000"      # image descriptor
        + "02"                        # LZW min code size
        + f"{len(lzw):02x}" + lzw.hex() + "00" + "3b"
    )
    return pre, post


def mm_gif_decode(spark, sf_dir):
    """REAL GIF decode under oracle check: per-doc 2x2 two-color GIF
    (gray level doc_id%256 + red) built from hex in BOTH engines, decoded
    through the from-scratch LZW codec (datapipe/multimodal.py), then
    header meta + per-channel means compared against the closed forms."""
    from .datapipe.multimodal import attach_media_meta, extract_features

    pre, post = _gif_hex_parts()
    d = _t(spark, sf_dir, "documents")
    kk = "lpad(hex(doc_id % 256), 2, '0')"
    blob = f"unhex(concat('{pre}', repeat({kk}, 3), '{post}'))"
    src = d.selectExpr("doc_id", f"{blob} AS blob")
    meta = attach_media_meta(src, "blob")
    feats = extract_features(meta, "blob", dim=3)
    return feats.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("features")[0].alias("mean_r"),
        F.col("features")[1].alias("mean_g"),
        F.col("features")[2].alias("mean_b"),
    )


ORACLE_MM_GIF = """
SELECT doc_id,
       'image/gif' AS media_type,
       CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
       CAST(((2.0 * (doc_id % 256) + 510.0) / 4.0) / 255.0 AS REAL) AS mean_r,
       CAST(((doc_id % 256) / 2.0) / 255.0 AS REAL) AS mean_g,
       CAST(((doc_id % 256) / 2.0) / 255.0 AS REAL) AS mean_b
FROM documents
"""


_TIFF_PRE_HEX = (
    "49492a00080000000a0000010300010000000200000001010300010000000200000002"
    "0103000100000008000000030103000100000001000000060103000100000001000000"
    "1101040001000000860000001501030001000000010000001601030001000000020000"
    "001701040001000000040000001c010300010000000100000000000000"
)


def mm_tiff_decode(spark, sf_dir):
    """REAL baseline-TIFF decode under oracle check: per-doc 2x2 8-bit
    grayscale little-endian TIFF built from hex in BOTH engines (fixed
    header+IFD prefix + 4 pixel bytes [k, k, 0, 128], k = doc_id%256),
    decoded through the pure-struct IFD walker (datapipe/multimodal.py
    decode_tiff), then header meta + mean brightness vs closed forms."""
    from .datapipe.multimodal import attach_media_meta, extract_features

    d = _t(spark, sf_dir, "documents")
    kk = "lpad(hex(doc_id % 256), 2, '0')"
    blob = f"unhex(concat('{_TIFF_PRE_HEX}', {kk}, {kk}, '00', '80'))"
    src = d.selectExpr("doc_id", f"{blob} AS blob")
    meta = attach_media_meta(src, "blob")
    feats = extract_features(meta, "blob", dim=3)
    return feats.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.n_channels").alias("n_channels"),
        F.col("features")[0].alias("mean_gray"),
    )


ORACLE_MM_TIFF = """
SELECT doc_id,
       'image/tiff' AS media_type,
       CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(((2.0 * (doc_id % 256) + 128.0) / 4.0) / 255.0 AS REAL) AS mean_gray
FROM documents
"""


def geo_transform(spark, sf_dir):
    """CRS reprojection (ST_Transform; reproject.rs:105 parity): 4326->3857
    verified against the closed-form Web Mercator in plain SQL, plus a UTM
    round-trip (4326->32631->4326) which the oracle can mirror as identity."""
    c = _t(spark, sf_dir, "customer")
    lon = "CAST(c_custkey % 360 AS DOUBLE) - 179.5"
    lat = "CAST(c_custkey % 170 AS DOUBLE) - 84.5"
    lon_u = "CAST(c_custkey % 600 AS DOUBLE) / 100.0"
    lat_u = "CAST(c_custkey % 1600 AS DOUBLE) / 10.0 - 80.0"
    return c.selectExpr(
        "c_custkey",
        f"round(ST_X(ST_Transform(ST_Point({lon}, {lat}), 'EPSG:4326', 'EPSG:3857')), 4) AS merc_x",
        f"round(ST_Y(ST_Transform(ST_Point({lon}, {lat}), 'EPSG:4326', 'EPSG:3857')), 4) AS merc_y",
        f"round(ST_X(ST_Transform(ST_Transform(ST_Point({lon_u}, {lat_u}), 'EPSG:4326', 'EPSG:32631'), 'EPSG:32631', 'EPSG:4326')), 6) AS utm_rt_lon",
        f"round(ST_Y(ST_Transform(ST_Transform(ST_Point({lon_u}, {lat_u}), 'EPSG:4326', 'EPSG:32631'), 'EPSG:32631', 'EPSG:4326')), 6) AS utm_rt_lat",
    )


def geo_transform_conic(spark, sf_dir):
    """Conic reprojection (ST_Transform): Albers equal-area (EPSG:5070,
    CONUS) and Lambert conformal conic 2SP (EPSG:2154, Lambert-93) —
    forward checked against the full Snyder closed forms restated in plain
    SQL (projection constants n/C/F/rho0 precomputed once and inlined as
    literals in both engines), inverse checked as a round trip."""
    c = _t(spark, sf_dir, "customer")
    lon_a = "CAST(c_custkey % 45 AS DOUBLE) - 120.0"
    lat_a = "CAST(c_custkey % 24 AS DOUBLE) + 25.5"
    lon_l = "CAST(c_custkey % 15 AS DOUBLE) * 0.5 - 4.0"
    lat_l = "CAST(c_custkey % 19 AS DOUBLE) * 0.5 + 41.5"
    aea = f"ST_Transform(ST_Point({lon_a}, {lat_a}), 'EPSG:4326', 'EPSG:5070')"
    lcc = f"ST_Transform(ST_Point({lon_l}, {lat_l}), 'EPSG:4326', 'EPSG:2154')"
    return c.selectExpr(
        "c_custkey",
        f"round(ST_X({aea}), 2) AS aea_x",
        f"round(ST_Y({aea}), 2) AS aea_y",
        f"round(ST_X({lcc}), 2) AS lcc_x",
        f"round(ST_Y({lcc}), 2) AS lcc_y",
        f"round(ST_X(ST_Transform({aea}, 'EPSG:5070', 'EPSG:4326')), 6) AS aea_rt_lon",
        f"round(ST_Y(ST_Transform({lcc}, 'EPSG:2154', 'EPSG:4326')), 6) AS lcc_rt_lat",
    )


def _conic_oracle_sql() -> str:
    from .wkb import proj

    A = proj.CONICS[5070]
    L = proj.CONICS[2154]

    def d(v):
        # decimal-point literals parse as DECIMAL in duckdb and overflow in
        # products; force every projection constant to DOUBLE
        return f"CAST({float(v)!r} AS DOUBLE)"

    qa = (
        f"(1.0 - {d(A['e2'])}) * (sin(radians(lat_a)) / (1.0 - {d(A['e2'])} * "
        f"sin(radians(lat_a)) * sin(radians(lat_a))) - ln((1.0 - {d(A['e'])} * "
        f"sin(radians(lat_a))) / (1.0 + {d(A['e'])} * sin(radians(lat_a)))) / "
        f"(2.0 * {d(A['e'])}))"
    )
    rho_a = f"({d(A['a'])} * sqrt({d(A['C'])} - {d(A['n'])} * {qa}) / {d(A['n'])})"
    th_a = f"({d(A['n'])} * radians(lon_a - ({d(A['lon0'])})))"
    tl = (
        f"(tan(pi() / 4.0 - radians(lat_l) / 2.0) / power((1.0 - {d(L['e'])} * "
        f"sin(radians(lat_l))) / (1.0 + {d(L['e'])} * sin(radians(lat_l))), "
        f"{d(L['e'])} / 2.0))"
    )
    rho_l = f"({d(L['a'])} * {d(L['F'])} * power({tl}, {d(L['n'])}))"
    th_l = f"({d(L['n'])} * radians(lon_l - ({d(L['lon0'])})))"
    return f"""
SELECT c_custkey,
       round({rho_a} * sin({th_a}), 2) AS aea_x,
       round({d(A['rho0'])} - {rho_a} * cos({th_a}), 2) AS aea_y,
       round({d(L['fe'])} + {rho_l} * sin({th_l}), 2) AS lcc_x,
       round({d(L['fn'])} + {d(L['rho0'])} - {rho_l} * cos({th_l}), 2) AS lcc_y,
       round(lon_a, 6) AS aea_rt_lon,
       round(lat_l, 6) AS lcc_rt_lat
FROM (
  SELECT c_custkey,
         CAST(c_custkey % 45 AS DOUBLE) - 120.0 AS lon_a,
         CAST(c_custkey % 24 AS DOUBLE) + 25.5 AS lat_a,
         CAST(c_custkey % 15 AS DOUBLE) * 0.5 - 4.0 AS lon_l,
         CAST(c_custkey % 19 AS DOUBLE) * 0.5 + 41.5 AS lat_l
  FROM customer
)
"""


ORACLE_GEO_TRANSFORM_CONIC = _conic_oracle_sql()


def geo_transform_laea(spark, sf_dir):
    """Azimuthal reprojection (ST_Transform): Lambert azimuthal equal-area
    (EPSG:3035, LAEA Europe) and polar stereographic variant B (EPSG:3413,
    NSIDC Arctic) — forward checked against the Snyder closed forms
    restated in plain SQL (projection constants qp/beta0/Rq/D resp. tc/mc
    precomputed once and inlined as literals in both engines), inverse
    checked as a round trip. Completes the reference's geodesy surface
    (reproject.rs:105) for the equal-area-grid and polar-science CRSs."""
    c = _t(spark, sf_dir, "customer")
    lon_e = "CAST(c_custkey % 45 AS DOUBLE) - 10.0"
    lat_e = "CAST(c_custkey % 35 AS DOUBLE) + 35.0"
    lon_p = "CAST(c_custkey % 360 AS DOUBLE) - 179.5"
    lat_p = "CAST(c_custkey % 29 AS DOUBLE) + 60.5"
    laea = f"ST_Transform(ST_Point({lon_e}, {lat_e}), 'EPSG:4326', 'EPSG:3035')"
    ps = f"ST_Transform(ST_Point({lon_p}, {lat_p}), 'EPSG:4326', 'EPSG:3413')"
    return c.selectExpr(
        "c_custkey",
        f"round(ST_X({laea}), 2) AS laea_x",
        f"round(ST_Y({laea}), 2) AS laea_y",
        f"round(ST_X({ps}), 2) AS ps_x",
        f"round(ST_Y({ps}), 2) AS ps_y",
        f"round(ST_X(ST_Transform({laea}, 'EPSG:3035', 'EPSG:4326')), 6) AS laea_rt_lon",
        f"round(ST_Y(ST_Transform({ps}, 'EPSG:3413', 'EPSG:4326')), 6) AS ps_rt_lat",
    )


def _laea_oracle_sql() -> str:
    import numpy as np

    from .wkb import proj

    E = proj.LAEA[3035]
    P = proj.POLAR[3413]

    def d(v):
        return f"CAST({float(v)!r} AS DOUBLE)"

    qe = (
        f"((1.0 - {d(E['e2'])}) * (sin(radians(lat_e)) / (1.0 - {d(E['e2'])} * "
        f"sin(radians(lat_e)) * sin(radians(lat_e))) - ln((1.0 - {d(E['e'])} * "
        f"sin(radians(lat_e))) / (1.0 + {d(E['e'])} * sin(radians(lat_e)))) / "
        f"(2.0 * {d(E['e'])})))"
    )
    beta = f"asin({qe} / {d(E['qp'])})"
    lam_e = f"radians(lon_e - {d(E['lon0'])})"
    bb = (
        f"({d(E['Rq'])} * sqrt(2.0 / (1.0 + {d(np.sin(E['beta0']))} * sin({beta})"
        f" + {d(np.cos(E['beta0']))} * cos({beta}) * cos({lam_e}))))"
    )
    tp = (
        f"(tan(pi() / 4.0 - radians(lat_p) / 2.0) / power((1.0 - {d(P['e'])} * "
        f"sin(radians(lat_p))) / (1.0 + {d(P['e'])} * sin(radians(lat_p))), "
        f"{d(P['e'])} / 2.0))"
    )
    rho_p = f"({d(P['a'])} * {d(P['mc'])} * {tp} / {d(P['tc'])})"
    lam_p = f"radians(lon_p - ({d(P['lon0'])}))"
    return f"""
SELECT c_custkey,
       round({d(E['fe'])} + {bb} * {d(E['D'])} * cos({beta}) * sin({lam_e}), 2) AS laea_x,
       round({d(E['fn'])} + ({bb} / {d(E['D'])}) * ({d(np.cos(E['beta0']))} * sin({beta})
             - {d(np.sin(E['beta0']))} * cos({beta}) * cos({lam_e})), 2) AS laea_y,
       round({rho_p} * sin({lam_p}), 2) AS ps_x,
       round(-{rho_p} * cos({lam_p}), 2) AS ps_y,
       round(lon_e, 6) AS laea_rt_lon,
       round(lat_p, 6) AS ps_rt_lat
FROM (
  SELECT c_custkey,
         CAST(c_custkey % 45 AS DOUBLE) - 10.0 AS lon_e,
         CAST(c_custkey % 35 AS DOUBLE) + 35.0 AS lat_e,
         CAST(c_custkey % 360 AS DOUBLE) - 179.5 AS lon_p,
         CAST(c_custkey % 29 AS DOUBLE) + 60.5 AS lat_p
  FROM customer
)
"""


ORACLE_GEO_TRANSFORM_LAEA = _laea_oracle_sql()


def geo_transform_tmerc(spark, sf_dir):
    """National transverse-Mercator grids (ST_Transform; reproject.rs:105
    parity for the highest-traffic non-UTM EPSG codes): ETRS89 / UTM 32N
    (EPSG:25832) and GDA94 / MGA zone 55 (EPSG:28355) forwards are checked
    against the full Karney order-n^6 series restated in plain SQL (series
    coefficients precomputed once and inlined as literals in both engines);
    OSGB36 / British National Grid (EPSG:27700, Airy ellipsoid + Helmert
    datum shift) and EPSG:25832 are checked as round-trip closure BOOLEANS
    (thresholds 1e-6 / 1e-9 deg; booleans rather than rounded identities so
    mm-scale h=0 Helmert coupling can't sit on a rounding boundary). The
    27700 absolute forward is anchored to the Ordnance Survey worked
    example in tests/test_geodesic.py."""
    c = _t(spark, sf_dir, "customer")
    lon32 = "(6.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0)"
    lat32 = "(47.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0)"
    lon55 = "(144.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0)"
    lat55 = "(-44.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0)"
    lonuk = "(-5.5 + CAST(c_custkey % 70 AS DOUBLE) / 10.0)"
    latuk = "(50.2 + CAST(c_custkey % 75 AS DOUBLE) / 10.0)"
    staged = c.selectExpr(
        "c_custkey",
        f"{lon32} AS lon32", f"{lat32} AS lat32",
        f"{lon55} AS lon55", f"{lat55} AS lat55",
        f"{lonuk} AS lonuk", f"{latuk} AS latuk",
        f"ST_Transform(ST_Point({lon32}, {lat32}), 'EPSG:4326', 'EPSG:25832') AS p32",
        f"ST_Transform(ST_Point({lon55}, {lat55}), 'EPSG:4326', 'EPSG:28355') AS p55",
        f"ST_Transform(ST_Point({lonuk}, {latuk}), 'EPSG:4326', 'EPSG:27700') AS puk",
    )
    return staged.selectExpr(
        "c_custkey",
        "round(ST_X(p32), 2) AS utm32_e",
        "round(ST_Y(p32), 2) AS utm32_n",
        "round(ST_X(p55), 2) AS mga55_e",
        "round(ST_Y(p55), 2) AS mga55_n",
        "abs(ST_X(ST_Transform(p32, 'EPSG:25832', 'EPSG:4326')) - lon32) < 1e-9"
        " AND abs(ST_Y(ST_Transform(p32, 'EPSG:25832', 'EPSG:4326')) - lat32) < 1e-9"
        " AS etrs_rt_ok",
        "abs(ST_X(ST_Transform(puk, 'EPSG:27700', 'EPSG:4326')) - lonuk) < 1e-6"
        " AND abs(ST_Y(ST_Transform(puk, 'EPSG:27700', 'EPSG:4326')) - latuk) < 1e-6"
        " AS bng_rt_ok",
    )


def _tmerc_oracle_sql() -> str:
    """Karney order-n^6 transverse-Mercator forward restated in DuckDB SQL
    (hyperbolics spelled out via exp/ln; series coefficients inlined as
    double literals), once per zone."""
    from .wkb import proj

    ell = proj.ellipsoid_consts(proj.GRS80_A, proj.GRS80_F)

    def d(v):
        return f"CAST({float(v)!r} AS DOUBLE)"

    e = d(ell["e"])
    k0a = d(0.9996 * ell["a_rect"])

    def zone_cols(sfx, lon0, fe, fn, e_alias, n_alias):
        s = f"sin(radians(lat{sfx}))"
        lam = f"radians(lon{sfx} - ({d(lon0)}))"
        u = (
            f"(0.5 * ln((1.0 + {s}) / (1.0 - {s}))"
            f" - {e} * 0.5 * ln((1.0 + {e} * {s}) / (1.0 - {e} * {s})))"
        )
        t = f"((exp({u}) - exp(-{u})) / 2.0)"
        xip = f"atan2(tt{sfx}, cos(lam{sfx}))"
        w = f"(sin(lam{sfx}) / sqrt(tt{sfx} * tt{sfx} + cos(lam{sfx}) * cos(lam{sfx})))"
        etap = f"ln({w} + sqrt({w} * {w} + 1.0))"
        xi_terms = " + ".join(
            f"{d(ell['alpha'][j])} * sin({2 * (j + 1)}.0 * xip{sfx})"
            f" * (exp({2 * (j + 1)}.0 * etap{sfx}) + exp(-{2 * (j + 1)}.0 * etap{sfx})) / 2.0"
            for j in range(6)
        )
        eta_terms = " + ".join(
            f"{d(ell['alpha'][j])} * cos({2 * (j + 1)}.0 * xip{sfx})"
            f" * (exp({2 * (j + 1)}.0 * etap{sfx}) - exp(-{2 * (j + 1)}.0 * etap{sfx})) / 2.0"
            for j in range(6)
        )
        stage1 = f"{lam} AS lam{sfx}, {t} AS tt{sfx}"
        stage2 = f"{xip} AS xip{sfx}, {etap} AS etap{sfx}"
        final = (
            f"round({d(fe)} + {k0a} * (etap{sfx} + {eta_terms}), 2) AS {e_alias},\n"
            f"       round({d(fn)} + {k0a} * (xip{sfx} + {xi_terms}), 2) AS {n_alias}"
        )
        return stage1, stage2, final

    s1_32, s2_32, f_32 = zone_cols("32", 9.0, 500_000.0, 0.0, "utm32_e", "utm32_n")
    s1_55, s2_55, f_55 = zone_cols("55", 147.0, 500_000.0, 10_000_000.0,
                                   "mga55_e", "mga55_n")
    return f"""
SELECT c_custkey,
       {f_32},
       {f_55},
       TRUE AS etrs_rt_ok,
       TRUE AS bng_rt_ok
FROM (
  SELECT c_custkey, {s2_32}, {s2_55}
  FROM (
    SELECT c_custkey, {s1_32}, {s1_55}
    FROM (
      SELECT c_custkey,
             6.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0 AS lon32,
             47.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0 AS lat32,
             144.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0 AS lon55,
             -44.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0 AS lat55
      FROM customer
    )
  )
)
"""


ORACLE_GEO_TRANSFORM_TMERC = _tmerc_oracle_sql()


def geo_transform_cyl(spark, sf_dir):
    """World cylindrical projections (ST_Transform; reproject.rs:105 parity
    for the global-analysis CRSs): World Mercator (EPSG:3395, ellipsoidal),
    EASE-Grid 2.0 cylindrical equal-area (EPSG:6933), and World Equidistant
    Cylindrical (EPSG:4087, true meridian arc) forwards are checked against
    the Snyder/Karney closed forms restated in plain SQL; Mollweide
    (ESRI:54009, Newton iteration — not SQL-expressible directly) is
    checked as a round-trip closure boolean, and the ETRS89 geographic
    alias (EPSG:4258 == WGS84 pivot) end-to-end through ST_Transform."""
    c = _t(spark, sf_dir, "customer")
    lon = "(CAST(c_custkey % 360 AS DOUBLE) - 179.5)"
    lat = "(CAST(c_custkey % 170 AS DOUBLE) - 84.5)"
    staged = c.selectExpr(
        "c_custkey",
        f"{lon} AS lon", f"{lat} AS lat",
        f"ST_Transform(ST_Point({lon}, {lat}), 'EPSG:4326', 'EPSG:3395') AS pm",
        f"ST_Transform(ST_Point({lon}, {lat}), 'EPSG:4326', 'EPSG:6933') AS pc",
        f"ST_Transform(ST_Point({lon}, {lat}), 'EPSG:4326', 'EPSG:4087') AS pe",
        f"ST_Transform(ST_Point({lon}, {lat}), 'EPSG:4326', 'ESRI:54009') AS pw",
    )
    return staged.selectExpr(
        "c_custkey",
        "round(ST_X(pm), 2) AS merc_x",
        "round(ST_Y(pm), 2) AS merc_y",
        "round(ST_X(pc), 2) AS cea_x",
        "round(ST_Y(pc), 2) AS cea_y",
        "round(ST_Y(pe), 2) AS eqc_y",
        "abs(ST_X(ST_Transform(pw, 'ESRI:54009', 'EPSG:4326')) - lon) < 1e-9"
        " AND abs(ST_Y(ST_Transform(pw, 'ESRI:54009', 'EPSG:4326')) - lat) < 1e-9"
        " AS moll_rt_ok",
        "ST_X(ST_Transform(ST_Point(lon, lat), 'EPSG:4258', 'EPSG:3395'))"
        " = ST_X(pm) AS alias_ok",
    )


def _cyl_oracle_sql() -> str:
    """World Mercator / cylindrical equal-area / equidistant-cylindrical
    forwards restated in DuckDB SQL (hyperbolics via exp/ln; ellipsoid and
    series constants inlined as double literals)."""
    from .wkb import proj

    ell = proj.ellipsoid_consts(proj.WGS84_A, proj.WGS84_F)

    def d(v):
        return f"CAST({float(v)!r} AS DOUBLE)"

    a = d(proj.WGS84_A)
    e = d(ell["e"])
    e2 = d(ell["e2"])
    k0 = d(proj.CYL[6933]["k0"])
    a_rect = d(ell["a_rect"])

    s = "sin(radians(lat))"
    lam = "radians(lon)"
    # isometric latitude psi = atanh(sin) - e*atanh(e*sin), as ln
    psi = (
        f"(0.5 * ln((1.0 + {s}) / (1.0 - {s}))"
        f" - {e} * 0.5 * ln((1.0 + {e} * {s}) / (1.0 - {e} * {s})))"
    )
    # authalic q (same expression order as wkb.proj._laea_q)
    q = (
        f"((1.0 - {e2}) * ({s} / (1.0 - {e2} * {s} * {s})"
        f" - ln((1.0 - {e} * {s}) / (1.0 + {e} * {s})) / (2.0 * {e})))"
    )
    # rectifying latitude: xi = xi' + sum(alpha_j sin(2j xi')),
    # xi' = atan(sinh(psi)) — the tm series at eta = 0
    xi_terms = " + ".join(
        f"{d(ell['alpha'][j])} * sin({2 * (j + 1)}.0 * xip)" for j in range(6)
    )
    return f"""
SELECT c_custkey,
       round({a} * lam, 2) AS merc_x,
       round({a} * psi, 2) AS merc_y,
       round({a} * {k0} * lam, 2) AS cea_x,
       round({a} * q / (2.0 * {k0}), 2) AS cea_y,
       round({a_rect} * (xip + {xi_terms}), 2) AS eqc_y,
       TRUE AS moll_rt_ok,
       TRUE AS alias_ok
FROM (
  SELECT c_custkey, lam, psi, q,
         atan((exp(psi) - exp(-psi)) / 2.0) AS xip
  FROM (
    SELECT c_custkey, {lam} AS lam, {psi} AS psi, {q} AS q
    FROM (
      SELECT c_custkey,
             CAST(c_custkey % 360 AS DOUBLE) - 179.5 AS lon,
             CAST(c_custkey % 170 AS DOUBLE) - 84.5 AS lat
      FROM customer
    )
  )
)
"""


ORACLE_GEO_TRANSFORM_CYL = _cyl_oracle_sql()


def _projjson_utm32() -> str:
    """Full PROJJSON definition duplicating EPSG:25832's parameters (the
    custom dispatch lands on the identical tmerc setup dict, so the path is
    bit-exact vs the registered code — pinned in tests/test_custom_crs.py)."""
    import json as _json

    def prm(code, name, value, unit):
        return {"name": name, "value": value, "unit": unit,
                "id": {"authority": "EPSG", "code": code}}

    return _json.dumps({
        "type": "ProjectedCRS",
        "name": "custom UTM 32N twin",
        "base_crs": {
            "type": "GeographicCRS",
            "name": "ETRS89",
            "datum": {
                "type": "GeodeticReferenceFrame",
                "name": "ETRS89",
                "ellipsoid": {"name": "GRS 1980",
                              "semi_major_axis": 6378137.0,
                              "inverse_flattening": 298.257222101},
            },
        },
        "conversion": {
            "name": "UTM zone 32N",
            "method": {"name": "Transverse Mercator",
                       "id": {"authority": "EPSG", "code": 9807}},
            "parameters": [
                prm(8801, "Latitude of natural origin", 0, "degree"),
                prm(8802, "Longitude of natural origin", 9, "degree"),
                prm(8805, "Scale factor at natural origin", 0.9996, "unity"),
                prm(8806, "False easting", 500000, "metre"),
                prm(8807, "False northing", 0, "metre"),
            ],
        },
    })


_WKT2_UTM32 = (
    'PROJCRS["custom UTM32 twin",'
    'BASEGEOGCRS["ETRS89",DATUM["ETRS89",'
    'ELLIPSOID["GRS 1980",6378137,298.257222101]]],'
    'CONVERSION["UTM 32N",METHOD["Transverse Mercator",ID["EPSG",9807]],'
    'PARAMETER["Latitude of natural origin",0,'
    'ANGLEUNIT["degree",0.0174532925199433]],'
    'PARAMETER["Longitude of natural origin",9,'
    'ANGLEUNIT["degree",0.0174532925199433]],'
    'PARAMETER["Scale factor at natural origin",0.9996,'
    'SCALEUNIT["unity",1]],'
    'PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],'
    'PARAMETER["False northing",0,LENGTHUNIT["metre",1]]]]'
)


def geo_transform_projjson(spark, sf_dir):
    """ST_Transform with full PROJJSON / WKT2 *definitions* as the CRS
    argument (reproject.rs:105 accepts arbitrary definitions, not just
    registered codes; dispatch in wkb/proj.py parse_crs →
    CustomCRS). A PROJJSON twin of EPSG:25832 produces the absolute UTM
    eastings/northings (oracle: the Karney order-n^6 series restated in
    plain SQL — the custom dispatch lands on the identical setup dict as
    the registered code, so values are bit-equal); the WKT2 spelling of
    the same definition must agree bit-exactly with the PROJJSON one; and
    the custom CRS must round-trip closure at 1e-9 deg."""
    c = _t(spark, sf_dir, "customer")
    pj = _projjson_utm32()
    wkt2 = _WKT2_UTM32
    lon32 = "(6.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0)"
    lat32 = "(47.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0)"
    staged = c.selectExpr(
        "c_custkey",
        f"{lon32} AS lon32", f"{lat32} AS lat32",
        f"ST_Transform(ST_Point({lon32}, {lat32}), 'EPSG:4326', '{pj}') AS pj",
        f"ST_Transform(ST_Point({lon32}, {lat32}), 'EPSG:4326', '{wkt2}') AS pw",
    )
    return staged.selectExpr(
        "c_custkey",
        "round(ST_X(pj), 2) AS utm32_e",
        "round(ST_Y(pj), 2) AS utm32_n",
        "ST_X(pw) = ST_X(pj) AND ST_Y(pw) = ST_Y(pj) AS wkt2_json_agree",
        f"abs(ST_X(ST_Transform(pj, '{pj}', 'EPSG:4326')) - lon32) < 1e-9"
        f" AND abs(ST_Y(ST_Transform(pj, '{pj}', 'EPSG:4326')) - lat32) < 1e-9"
        " AS custom_rt_ok",
    )


def _projjson_oracle_sql() -> str:
    """Karney order-n^6 transverse-Mercator forward for UTM zone 32N in
    DuckDB SQL — the same series as _tmerc_oracle_sql, single zone; the
    definition-equivalence and closure checks mirror as TRUE."""
    from .wkb import proj

    ell = proj.ellipsoid_consts(proj.GRS80_A, proj.GRS80_F)

    def d(v):
        return f"CAST({float(v)!r} AS DOUBLE)"

    e = d(ell["e"])
    k0a = d(0.9996 * ell["a_rect"])
    s = "sin(radians(lat32))"
    lam = "radians(lon32 - (" + d(9.0) + "))"
    u = (
        f"(0.5 * ln((1.0 + {s}) / (1.0 - {s}))"
        f" - {e} * 0.5 * ln((1.0 + {e} * {s}) / (1.0 - {e} * {s})))"
    )
    t = "((exp(u32) - exp(-u32)) / 2.0)"
    xip = "atan2(tt32, cos(lam32))"
    w = "(sin(lam32) / sqrt(tt32 * tt32 + cos(lam32) * cos(lam32)))"
    etap = f"ln({w} + sqrt({w} * {w} + 1.0))"
    xi_terms = " + ".join(
        f"{d(ell['alpha'][j])} * sin({2 * (j + 1)}.0 * xip32)"
        f" * (exp({2 * (j + 1)}.0 * etap32) + exp(-{2 * (j + 1)}.0 * etap32)) / 2.0"
        for j in range(6)
    )
    eta_terms = " + ".join(
        f"{d(ell['alpha'][j])} * cos({2 * (j + 1)}.0 * xip32)"
        f" * (exp({2 * (j + 1)}.0 * etap32) - exp(-{2 * (j + 1)}.0 * etap32)) / 2.0"
        for j in range(6)
    )
    return f"""
SELECT c_custkey,
       round(500000.0 + {k0a} * (etap32 + {eta_terms}), 2) AS utm32_e,
       round(0.0 + {k0a} * (xip32 + {xi_terms}), 2) AS utm32_n,
       TRUE AS wkt2_json_agree,
       TRUE AS custom_rt_ok
FROM (
  SELECT c_custkey, {xip} AS xip32, {etap} AS etap32
  FROM (
    SELECT c_custkey, lam32, {t} AS tt32
    FROM (
      SELECT c_custkey, {lam} AS lam32, {u} AS u32
      FROM (
        SELECT c_custkey,
               6.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0 AS lon32,
               47.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0 AS lat32
        FROM customer
      )
    )
  )
)
"""


ORACLE_GEO_TRANSFORM_PROJJSON = _projjson_oracle_sql()


# Spherical-edges predicates (wkb/spherical.py; edges.rs:35-60 semantics):
# per-row parameterized segment pairs in the two regimes where plate-carrée
# and great-circle ST_Intersects genuinely disagree — antimeridian
# crossings and the poleward bulge of long east-west arcs.
_SPH_PARAMS = {
    # antimeridian pair: arc p (crosses ±180) vs meridian segment q
    "am_p1lon": "(165.0 + CAST(c_custkey % 10 AS DOUBLE))",
    "am_p1lat": "(-20.0 + CAST(c_custkey % 9 AS DOUBLE) * 5.0)",
    "am_p2lon": "(-165.0 - CAST(c_custkey % 8 AS DOUBLE))",
    "am_p2lat": "(25.0 - CAST(c_custkey % 7 AS DOUBLE) * 6.0)",
    # fractional offsets keep the meridian off the arc's integer lattice:
    # exact endpoint-on-segment tangencies would make the kernel (touch =
    # intersect) and the strict-straddle oracle disagree
    "am_qlon": "(-40.7 + CAST(c_custkey % 16 AS DOUBLE) * 14.0)",
    "am_q1lat": "(-35.3 + CAST(c_custkey % 12 AS DOUBLE) * 5.0)",
    "am_q2lat": "(-23.3 + CAST(c_custkey % 12 AS DOUBLE) * 5.0"
    " + CAST(c_custkey % 5 AS DOUBLE) * 8.0)",
    # bulge pair: east-west arc p at constant latitude vs meridian segment q
    "bu_p1lon": "(-50.0 - CAST(c_custkey % 6 AS DOUBLE) * 5.0)",
    "bu_plat": "(40.0 + CAST(c_custkey % 5 AS DOUBLE) * 3.0)",
    "bu_p2lon": "(50.0 + CAST(c_custkey % 7 AS DOUBLE) * 5.0)",
    "bu_qlon": "(-10.0 + CAST(c_custkey % 8 AS DOUBLE) * 4.0)",
    "bu_q1lat": "(41.0 + CAST(c_custkey % 9 AS DOUBLE) * 3.0)",
    "bu_q2lat": "(47.0 + CAST(c_custkey % 9 AS DOUBLE) * 3.0)",
}


def geo_spherical_predicates(spark, sf_dir):
    """Planar vs great-circle ST_Intersects over parameterized segment
    pairs (ST_IntersectsSphere, wkb/spherical.py). Returns both verdicts
    plus the flip flag per regime; the DuckDB oracle restates the same
    unit-vector cross-product arc test in plain SQL, so values are strict
    (booleans; generic-position data keeps every sign test away from the
    1e-12 band)."""
    c = _t(spark, sf_dir, "customer")
    P = _SPH_PARAMS
    am_p = f"ST_MakeLine(ST_Point({P['am_p1lon']}, {P['am_p1lat']}), ST_Point({P['am_p2lon']}, {P['am_p2lat']}))"
    am_q = f"ST_MakeLine(ST_Point({P['am_qlon']}, {P['am_q1lat']}), ST_Point({P['am_qlon']}, {P['am_q2lat']}))"
    bu_p = f"ST_MakeLine(ST_Point({P['bu_p1lon']}, {P['bu_plat']}), ST_Point({P['bu_p2lon']}, {P['bu_plat']}))"
    bu_q = f"ST_MakeLine(ST_Point({P['bu_qlon']}, {P['bu_q1lat']}), ST_Point({P['bu_qlon']}, {P['bu_q2lat']}))"
    staged = c.selectExpr(
        "c_custkey",
        f"ST_Intersects({am_p}, {am_q}) AS am_planar",
        f"ST_IntersectsSphere({am_p}, {am_q}) AS am_sph",
        f"ST_Intersects({bu_p}, {bu_q}) AS bu_planar",
        f"ST_IntersectsSphere({bu_p}, {bu_q}) AS bu_sph",
    )
    return staged.selectExpr(
        "c_custkey",
        "am_planar",
        "am_sph",
        "am_planar <> am_sph AS am_flip",
        "bu_planar",
        "bu_sph",
        "bu_planar <> bu_sph AS bu_flip",
    )


def _sph_oracle_sql() -> str:
    """Great-circle arc-pair intersection in plain SQL: unit xyz vectors,
    plane normals n = p x q, candidate +-(n1 x n2), minor-arc sign tests
    (p x X)·n >= -1e-12 — the same math as wkb/spherical.py (sign tests are
    scale-invariant so the candidate needs no normalization). Planar is the
    strict straddle test (generic-position data has no touching pairs)."""

    def xyz(lon, lat, pfx):
        return (
            f"cos(radians({lat})) * cos(radians({lon})) AS {pfx}x,"
            f" cos(radians({lat})) * sin(radians({lon})) AS {pfx}y,"
            f" sin(radians({lat})) AS {pfx}z"
        )

    def cross(a, b, pfx):
        return (
            f"{a}y * {b}z - {a}z * {b}y AS {pfx}x,"
            f" {a}z * {b}x - {a}x * {b}z AS {pfx}y,"
            f" {a}x * {b}y - {a}y * {b}x AS {pfx}z"
        )

    def dot_cross(a, b, n):
        # (a x b) · n
        return (
            f"(({a}y * {b}z - {a}z * {b}y) * {n}x"
            f" + ({a}z * {b}x - {a}x * {b}z) * {n}y"
            f" + ({a}x * {b}y - {a}y * {b}x) * {n}z)"
        )

    def contains(x, p, q, n):
        return (
            f"({dot_cross(p, x, n)} >= -1e-12 AND {dot_cross(x, q, n)} >= -1e-12)"
        )

    def sph(g):  # g in {am, bu}: points {g}a1,{g}a2,{g}b1,{g}b2; normals {g}n1,{g}n2; candidate {g}d / {g}m
        return (
            f"(({contains(f'{g}d', f'{g}a1', f'{g}a2', f'{g}n1')}"
            f" AND {contains(f'{g}d', f'{g}b1', f'{g}b2', f'{g}n2')})"
            f" OR ({contains(f'{g}m', f'{g}a1', f'{g}a2', f'{g}n1')}"
            f" AND {contains(f'{g}m', f'{g}b1', f'{g}b2', f'{g}n2')}))"
        )

    def orient(px, py, qx, qy, rx, ry):
        return f"(({qx} - {px}) * ({ry} - {py}) - ({qy} - {py}) * ({rx} - {px}))"

    def planar(p1x, p1y, p2x, p2y, q1x, q1y, q2x, q2y):
        o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
        o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
        o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
        o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
        return f"({o1} * {o2} < 0 AND {o3} * {o4} < 0)"

    P = _SPH_PARAMS
    lonlat = ", ".join(
        f"{expr} AS {name}" for name, expr in P.items()
    )
    s1 = f"SELECT c_custkey, {lonlat} FROM customer"
    s2 = (
        "SELECT c_custkey,"
        f" {planar('am_p1lon', 'am_p1lat', 'am_p2lon', 'am_p2lat', 'am_qlon', 'am_q1lat', 'am_qlon', 'am_q2lat')} AS am_planar,"
        f" {planar('bu_p1lon', 'bu_plat', 'bu_p2lon', 'bu_plat', 'bu_qlon', 'bu_q1lat', 'bu_qlon', 'bu_q2lat')} AS bu_planar,"
        f" {xyz('am_p1lon', 'am_p1lat', 'ama1')}, {xyz('am_p2lon', 'am_p2lat', 'ama2')},"
        f" {xyz('am_qlon', 'am_q1lat', 'amb1')}, {xyz('am_qlon', 'am_q2lat', 'amb2')},"
        f" {xyz('bu_p1lon', 'bu_plat', 'bua1')}, {xyz('bu_p2lon', 'bu_plat', 'bua2')},"
        f" {xyz('bu_qlon', 'bu_q1lat', 'bub1')}, {xyz('bu_qlon', 'bu_q2lat', 'bub2')}"
        f" FROM ({s1})"
    )
    s3 = (
        "SELECT c_custkey, am_planar, bu_planar,"
        " ama1x, ama1y, ama1z, ama2x, ama2y, ama2z,"
        " amb1x, amb1y, amb1z, amb2x, amb2y, amb2z,"
        " bua1x, bua1y, bua1z, bua2x, bua2y, bua2z,"
        " bub1x, bub1y, bub1z, bub2x, bub2y, bub2z,"
        f" {cross('ama1', 'ama2', 'amn1')}, {cross('amb1', 'amb2', 'amn2')},"
        f" {cross('bua1', 'bua2', 'bun1')}, {cross('bub1', 'bub2', 'bun2')}"
        f" FROM ({s2})"
    )
    s4 = (
        "SELECT *,"
        f" {cross('amn1', 'amn2', 'amd')}, {cross('bun1', 'bun2', 'bud')}"
        f" FROM ({s3})"
    )
    s5 = (
        "SELECT *,"
        " -amdx AS ammx, -amdy AS ammy, -amdz AS ammz,"
        " -budx AS bumx, -budy AS bumy, -budz AS bumz"
        f" FROM ({s4})"
    )
    return (
        "SELECT c_custkey,"
        " am_planar,"
        f" {sph('am')} AS am_sph,"
        f" am_planar <> {sph('am')} AS am_flip,"
        " bu_planar,"
        f" {sph('bu')} AS bu_sph,"
        f" bu_planar <> {sph('bu')} AS bu_flip"
        f" FROM ({s5})"
    )


ORACLE_GEO_SPHERICAL_PREDICATES = _sph_oracle_sql()


# Spherical POLYGON containment: per-row regular spherical pentagon built
# by the direct-geodesic destination formula (shared expression text so
# Spark and DuckDB compute bit-identical vertex doubles), test point at a
# parameterized distance/azimuth from the same center. Centers alternate
# between an antimeridian-straddling band (planar ring becomes a bowtie —
# the flip regime) and a mid-lon band.
_SPOLY_K = 5


def _spoly_stages():
    """Shared stage expressions: stage1 params -> stage2 per-vertex sinlat
    -> stage3 lon/lat degrees (wrapped). Returns (stage1, stage2, stage3)
    as ordered (name, expr) lists; later stages reference earlier names."""
    wrap = lambda x: f"(({x}) + 540.0 - floor((({x}) + 540.0) / 360.0) * 360.0 - 180.0)"
    s1 = [
        ("clon", "(CASE WHEN c_custkey % 2 = 0"
                 " THEN 168.4 + CAST(c_custkey % 24 AS DOUBLE)"
                 " ELSE 20.7 + CAST(c_custkey % 90 AS DOUBLE) END)"),
        ("phi", "radians(6.3 + CAST(c_custkey % 45 AS DOUBLE))"),
        ("delt", "radians(1.5 + CAST(c_custkey % 4 AS DOUBLE) * 0.5)"),
        ("az0", "(7.0 + CAST(c_custkey % 5 AS DOUBLE) * 13.0)"),
        ("deltp", "radians((1.5 + CAST(c_custkey % 4 AS DOUBLE) * 0.5)"
                  " * (0.4 + 0.25 * CAST(c_custkey % 6 AS DOUBLE)))"),
        ("thp", "radians(3.7 + 9.0 * CAST(c_custkey % 40 AS DOUBLE))"),
    ]
    s2 = []
    for i in range(_SPOLY_K):
        th = f"radians(az0 + {72.0 * i})"
        s2.append((f"th{i}", th))
    s2.append(
        ("slp", "sin(phi) * cos(deltp) + cos(phi) * sin(deltp) * cos(thp)")
    )
    for i in range(_SPOLY_K):
        s2.append(
            (f"sl{i}", f"sin(phi) * cos(delt) + cos(phi) * sin(delt) * cos(th{i})")
        )
    s3 = [
        ("plat", "degrees(asin(slp))"),
        ("plon", wrap(
            "degrees(atan2(sin(thp) * sin(deltp) * cos(phi),"
            " cos(deltp) - sin(phi) * slp)) + clon"
        )),
    ]
    for i in range(_SPOLY_K):
        s3.append((f"lat{i}", f"degrees(asin(sl{i}))"))
        s3.append((f"lon{i}", wrap(
            f"degrees(atan2(sin(th{i}) * sin(delt) * cos(phi),"
            f" cos(delt) - sin(phi) * sl{i})) + clon"
        )))
    return s1, s2, s3


def geo_spherical_polygon(spark, sf_dir):
    """Spherical-polygon containment (ST_IntersectsSphere over POLYGON
    inputs, wkb/spherical.py even-odd arcs) vs planar ST_Intersects on the
    same ring. Antimeridian-straddling pentagons are planar bowties — the
    regime where plate-carrée containment is simply wrong; the DuckDB
    oracle decides spherical truth with the convex all-same-sign edge test
    and planar truth with an even-odd ray cast on the identical ring
    doubles (vertex coordinates share expression text, so both engines
    compute bit-identical doubles)."""
    c = _t(spark, sf_dir, "customer")
    df = c.selectExpr("c_custkey")
    for stage in _spoly_stages():
        df = df.selectExpr("*", *[f"{e} AS {n}" for n, e in stage])
    ring = ", ".join(
        [f"CAST(lon{i} AS STRING), ' ', CAST(lat{i} AS STRING), ', '"
         for i in range(_SPOLY_K)]
    )
    wkt = (
        f"concat('POLYGON ((', {ring}, "
        f"CAST(lon0 AS STRING), ' ', CAST(lat0 AS STRING), '))')"
    )
    staged = df.selectExpr(
        "c_custkey",
        f"ST_IntersectsSphere(ST_Point(plon, plat), ST_GeomFromText({wkt})) AS sph_in",
        f"ST_Intersects(ST_Point(plon, plat), ST_GeomFromText({wkt})) AS planar_in",
    )
    return staged.selectExpr(
        "c_custkey", "sph_in", "planar_in", "sph_in <> planar_in AS flip"
    )


def _spoly_oracle_sql() -> str:
    s1, s2, s3 = _spoly_stages()

    def sel(stage, frm):
        cols = ", ".join(f"{e} AS {n}" for n, e in stage)
        return f"SELECT *, {cols} FROM ({frm})"

    q = "SELECT c_custkey FROM customer"
    for stage in (s1, s2, s3):
        q = sel(stage, q)
    # stage 4: unit xyz of the vertices and the test point
    xyz = []
    for nm, lon, lat in [("p", "plon", "plat")] + [
        (f"v{i}", f"lon{i}", f"lat{i}") for i in range(_SPOLY_K)
    ]:
        xyz += [
            (f"{nm}x", f"cos(radians({lat})) * cos(radians({lon}))"),
            (f"{nm}y", f"cos(radians({lat})) * sin(radians({lon}))"),
            (f"{nm}z", f"sin(radians({lat}))"),
        ]
    q = sel(xyz, q)
    # stage 5: edge sign tests s_i = (v_i x v_{i+1}) . p
    signs = []
    for i in range(_SPOLY_K):
        a, b = f"v{i}", f"v{(i + 1) % _SPOLY_K}"
        signs.append((f"s{i}", (
            f"(({a}y * {b}z - {a}z * {b}y) * px"
            f" + ({a}z * {b}x - {a}x * {b}z) * py"
            f" + ({a}x * {b}y - {a}y * {b}x) * pz)"
        )))
    q = sel(signs, q)
    allpos = " AND ".join(f"s{i} > 0" for i in range(_SPOLY_K))
    allneg = " AND ".join(f"s{i} < 0" for i in range(_SPOLY_K))
    # planar even-odd ray cast on the identical ring doubles
    crossings = " + ".join(
        f"(CASE WHEN (lat{i} > plat) <> (lat{j} > plat)"
        f" AND plon < (lon{j} - lon{i}) * (plat - lat{i}) / (lat{j} - lat{i}) + lon{i}"
        f" THEN 1 ELSE 0 END)"
        for i, j in [(i, (i + 1) % _SPOLY_K) for i in range(_SPOLY_K)]
    )
    return (
        "SELECT c_custkey,"
        f" (({allpos}) OR ({allneg})) AS sph_in,"
        f" ({crossings}) % 2 = 1 AS planar_in,"
        f" (({allpos}) OR ({allneg})) <> (({crossings}) % 2 = 1) AS flip"
        f" FROM ({q})"
    )


ORACLE_GEO_SPHERICAL_POLYGON = _spoly_oracle_sql()


# True great-circle point-to-arc distance (ST_DistanceSphere beyond
# point-point: cross-track when the foot falls in the arc, else nearest
# endpoint — wkb/spherical.py sph_min_distance) + ST_DWithinSphere.
_SDIST_PARAMS = {
    "alon1": "(-120.0 + CAST(c_custkey % 30 AS DOUBLE) * 8.0)",
    "alat1": "(-55.0 + CAST(c_custkey % 23 AS DOUBLE) * 5.0)",
    "alon2": "(-116.0 + CAST(c_custkey % 30 AS DOUBLE) * 8.0"
             " + CAST(c_custkey % 9 AS DOUBLE) * 3.0)",
    "alat2": "(-50.0 + CAST(c_custkey % 21 AS DOUBLE) * 5.0)",
    # fractional lat step keeps the point off the (transcendental) arc
    "plon": "(-130.0 + CAST(c_custkey % 30 AS DOUBLE) * 8.0"
            " + CAST(c_custkey % 13 AS DOUBLE) * 4.0)",
    "plat": "(-60.2 + CAST(c_custkey % 25 AS DOUBLE) * 5.0)",
    "thresh": "(300000.0 + CAST(c_custkey % 7 AS DOUBLE) * 150000.0)",
}


def geo_spherical_distance(spark, sf_dir):
    """Great-circle point-to-arc distance: ST_DistanceSphere(point, 2-pt
    linestring) is min(cross-track, endpoint hops) on the sphere, plus
    ST_DWithinSphere at a per-row threshold. The DuckDB oracle restates
    the identical scalar arithmetic (same op order as _pt_arc_angle), so
    round-3 meters are strict."""
    c = _t(spark, sf_dir, "customer")
    P = _SDIST_PARAMS
    arc = (
        f"ST_MakeLine(ST_Point({P['alon1']}, {P['alat1']}),"
        f" ST_Point({P['alon2']}, {P['alat2']}))"
    )
    pt = f"ST_Point({P['plon']}, {P['plat']})"
    staged = c.selectExpr(
        "c_custkey",
        f"ST_DistanceSphere({pt}, {arc}) AS d_raw",
        f"ST_DWithinSphere({pt}, {arc}, {P['thresh']}) AS within_t",
    )
    return staged.selectExpr(
        "c_custkey", "round(d_raw, 3) AS dist_m", "within_t"
    )


def _sdist_oracle_sql() -> str:
    from .wkb.algorithms import EARTH_RADIUS_M

    P = _SDIST_PARAMS
    R = f"CAST({float(EARTH_RADIUS_M)!r} AS DOUBLE)"
    s1 = ", ".join(f"{e} AS {n}" for n, e in P.items())
    q1 = f"SELECT c_custkey, {s1} FROM customer"
    # unit xyz
    xyz = ", ".join(
        f"cos(radians({lat})) * cos(radians({lon})) AS {nm}x,"
        f" cos(radians({lat})) * sin(radians({lon})) AS {nm}y,"
        f" sin(radians({lat})) AS {nm}z"
        for nm, lon, lat in [("p", "plon", "plat"), ("a", "alon1", "alat1"), ("b", "alon2", "alat2")]
    )
    q2 = f"SELECT c_custkey, thresh, {xyz} FROM ({q1})"
    q3 = (
        "SELECT *,"
        " ay * bz - az * by AS nx, az * bx - ax * bz AS ny, ax * by - ay * bx AS nz"
        f" FROM ({q2})"
    )
    q4 = f"SELECT *, sqrt(nx * nx + ny * ny + nz * nz) AS nn FROM ({q3})"
    q5 = f"SELECT *, (px * nx + py * ny + pz * nz) / nn AS s FROM ({q4})"
    q6 = (
        "SELECT *,"
        " px - s * (nx / nn) AS fx, py - s * (ny / nn) AS fy, pz - s * (nz / nn) AS fz"
        f" FROM ({q5})"
    )
    q7 = f"SELECT *, sqrt(fx * fx + fy * fy + fz * fz) AS nf FROM ({q6})"
    # normalized foot + in-arc sign tests against the unnormalized normal
    q8 = (
        "SELECT *,"
        " fx / nf AS gx, fy / nf AS gy, fz / nf AS gz"
        f" FROM ({q7})"
    )
    contains = (
        "((ay * gz - az * gy) * nx + (az * gx - ax * gz) * ny + (ax * gy - ay * gx) * nz >= -1e-12"
        " AND (gy * bz - gz * by) * nx + (gz * bx - gx * bz) * ny + (gx * by - gy * bx) * nz >= -1e-12)"
    )
    ang = lambda u: (
        f"atan2(sqrt((py * {u}z - pz * {u}y) * (py * {u}z - pz * {u}y)"
        f" + (pz * {u}x - px * {u}z) * (pz * {u}x - px * {u}z)"
        f" + (px * {u}y - py * {u}x) * (px * {u}y - py * {u}x)),"
        f" px * {u}x + py * {u}y + pz * {u}z)"
    )
    q9 = (
        "SELECT c_custkey, thresh,"
        f" least({ang('a')}, {ang('b')},"
        f" CASE WHEN nf >= 1e-12 AND {contains}"
        "  THEN abs(asin(greatest(-1.0, least(1.0, s))))"
        "  ELSE CAST('infinity' AS DOUBLE) END) AS best_ang"
        f" FROM ({q8})"
    )
    return (
        "SELECT c_custkey,"
        f" round({R} * best_ang, 3) AS dist_m,"
        f" {R} * best_ang <= thresh AS within_t"
        f" FROM ({q9})"
    )


ORACLE_GEO_SPHERICAL_DISTANCE = _sdist_oracle_sql()


# shared lon/lat derivations for the spherical join (engine-portable SQL
# text; half of each side clusters against the antimeridian)
def _sjoin_lonlat(pfx: str, m1: int, m2: int) -> dict:
    wrap = lambda x: f"(({x}) + 540.0 - floor((({x}) + 540.0) / 360.0) * 360.0 - 180.0)"
    lon_raw = (
        f"(CASE WHEN c_custkey % 2 = 0"
        f" THEN 176.5 + CAST(c_custkey % {m1} AS DOUBLE) / 10.0"
        f" ELSE -60.0 + CAST(c_custkey % {m1} AS DOUBLE) END)"
    )
    return {
        f"{pfx}lon": wrap(lon_raw),
        f"{pfx}lat": f"(-58.3 + CAST(c_custkey % {m2} AS DOUBLE))",
    }


def geo_spherical_join(spark, sf_dir):
    """Distributed great-circle DWithin JOIN (join.spatial
    dwithin_sphere_join): lon-wrapped grid cells make candidate pairs that
    straddle the ±180 antimeridian land in adjacent cells — a planar grid
    would put them at opposite map edges and silently drop them. Exact
    native-haversine refine; the oracle brute-forces the same formula over
    the full cross product (bounded sides)."""
    from .join.spatial import dwithin_sphere_join

    c = _t(spark, sf_dir, "customer")
    lcols = _sjoin_lonlat("l", 70, 111)
    rcols = _sjoin_lonlat("r", 64, 107)
    left = c.where("c_custkey % 23 = 0").selectExpr(
        "c_custkey AS l_id", *[f"{e} AS {n}" for n, e in lcols.items()]
    )
    right = c.where("c_custkey % 17 = 3").selectExpr(
        "c_custkey AS r_id", *[f"{e} AS {n}" for n, e in rcols.items()]
    )
    out = dwithin_sphere_join(
        left, right, 120_000.0,
        l_id="l_id", l_lon="llon", l_lat="llat",
        r_id="r_id", r_lon="rlon", r_lat="rlat",
    )
    return out.select("l_id", "r_id", F.round("dist_m", 3).alias("dist_m"))


def _sjoin_oracle_sql() -> str:
    lcols = _sjoin_lonlat("l", 70, 111)
    rcols = _sjoin_lonlat("r", 64, 107)
    lsel = ", ".join(f"{e} AS {n}" for n, e in lcols.items())
    rsel = ", ".join(f"{e} AS {n}" for n, e in rcols.items())
    hav = (
        "2.0 * 6371008.8 * asin(sqrt(least(1.0,"
        " sin(radians(rlat - llat) / 2.0) * sin(radians(rlat - llat) / 2.0)"
        " + cos(radians(llat)) * cos(radians(rlat))"
        " * sin(radians(rlon - llon) / 2.0) * sin(radians(rlon - llon) / 2.0))))"
    )
    return f"""
WITH l AS (SELECT c_custkey AS l_id, {lsel} FROM customer WHERE c_custkey % 23 = 0),
r AS (SELECT c_custkey AS r_id, {rsel} FROM customer WHERE c_custkey % 17 = 3),
scored AS (
  SELECT l_id, r_id, {hav} AS dist_m
  FROM l CROSS JOIN r
)
SELECT l_id, r_id, round(dist_m, 3) AS dist_m
FROM scored WHERE dist_m <= 120000.0
"""


ORACLE_GEO_SPHERICAL_JOIN = _sjoin_oracle_sql()


COUNTRIES_FGB = "/root/reference/fixtures/flatgeobuf/countries.fgb"


def geo_countries_spherical(spark, sf_dir):
    """Spherical kernels over REAL fixture shapes (VERDICT r5 #4): six
    countries from countries.fgb through the engine's own FlatGeobuf
    reader — part counts, spherical area (km^2), min great-circle distance
    to Suva (sph_min_distance over the real multipolygons, 0 inside Fiji),
    and ST_IntersectsSphere against an arc crossing the antimeridian at
    Fiji's +-180 split (True only for Fiji; a planar segment runs the
    wrong way around the map and misses — test_spherical_fixtures.py pins
    that flip). The oracle pins the goldens as literals, the way the
    reference pins kernel fixtures (geoarrow-expr-geo/src/area.rs:73-93);
    sf_dir is unused (fixture-backed entry)."""
    from .io.flatgeobuf import read_flatgeobuf

    names = ["Antarctica", "Brazil", "Fiji", "Greenland", "New Zealand", "Russia"]
    df = read_flatgeobuf(spark, COUNTRIES_FGB)
    return (
        df.filter(F.col("name").isin(names))
        .select(
            "name",
            F.expr("CAST(ST_NumGeometries(geometry) AS BIGINT)").alias("n_parts"),
            F.expr("round(ST_AreaSpherical(geometry) / 1e6, 4)").alias("area_km2"),
            F.expr(
                "round(ST_DistanceSphere(geometry,"
                " ST_Point(178.4417D, -18.1416D)) / 1e3, 4)"
            ).alias("dist_suva_km"),
            F.expr(
                "ST_IntersectsSphere(geometry, ST_GeomFromText("
                "'LINESTRING (179.99 -17.3, -179.99 -15.3)'))"
            ).alias("hits_am_arc"),
        )
    )


ORACLE_GEO_COUNTRIES_SPHERICAL = """
SELECT * FROM (VALUES
  ('Antarctica', CAST(8 AS BIGINT), 11154857.7148, 5853.9454, FALSE),
  ('Brazil', CAST(1 AS BIGINT), 8540552.4172, 11575.4863, FALSE),
  ('Fiji', CAST(3 AS BIGINT), 19351.2202, 0.0, TRUE),
  ('Greenland', CAST(1 AS BIGINT), 2190190.4321, 12389.2505, FALSE),
  ('New Zealand', CAST(2 AS BIGINT), 277275.4202, 1891.7619, FALSE),
  ('Russia', CAST(13 AS BIGINT), 16897110.8982, 7963.8077, FALSE)
) AS t(name, n_parts, area_km2, dist_suva_km, hits_am_arc)
"""


def sim_mmr_rerank(spark, sf_dir):
    """MMR diversity reranking (Carbonell & Goldstein 1998) of the
    brute-force retrieval's top-8 candidates: greedy 3-pick with
    lambda = 0.7, scores and pairwise cosines rounded to 8dp with id
    tie-breaks so the greedy argmax is engine-independent. The DuckDB
    oracle unrolls the same 3 rounds as CTEs — rows, schema, and values
    all strict."""
    from .datapipe import similarity

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    c = e.where(F.col("vec_id") >= 8)
    topk = similarity.cosine_topk(q, c, k=8)
    cands = topk.join(
        c.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("vec")),
        "neighbor_id",
    ).select("query_id", "neighbor_id", F.col("cosine").alias("rel"), "vec")
    out = similarity.mmr_rerank(cands, k=3, lam=0.7)
    return out.select(
        "query_id", "neighbor_id",
        F.col("mmr_rank").cast("int").alias("mmr_rank"), "mmr_score",
    )


def _mmr_oracle_sql() -> str:
    """The same greedy MMR unroll (fetch=8, k=3, lambda=0.7) as CTE
    rounds; cosines via the in-order fold mirror, the MMR combination in
    the same exact integer units as similarity.mmr_rerank (1e-8 score
    ticks, lambda in thousandths) so no float rounding tie can differ."""
    rel = _inorder_cosine_sql("qv", "cv")
    pair = _inorder_cosine_sql("r.cv", "s.cv")

    def pick(r, rem, sel):
        return f"""
ms{r} AS (
  SELECT r.query_id, r.neighbor_id,
         max(CAST(round(round({pair}, 8) * 1e8) AS BIGINT)) AS msi
  FROM {rem} r JOIN {sel} s ON r.query_id = s.query_id
  GROUP BY r.query_id, r.neighbor_id
), pick{r} AS (
  SELECT query_id, neighbor_id, reli, cv, {r} AS mmr_rank,
         CAST(scorei AS DOUBLE) / 1e11 AS mmr_score
  FROM (
    SELECT r.query_id, r.neighbor_id, r.reli, r.cv,
           700 * r.reli - 300 * m.msi AS scorei
    FROM {rem} r JOIN ms{r} m
      ON r.query_id = m.query_id AND r.neighbor_id = m.neighbor_id
  )
  QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY scorei DESC, neighbor_id
  ) = 1
)"""

    def anti(rem, src, sel):
        return f"""
{rem} AS (
  SELECT c.* FROM {src} c LEFT JOIN {sel} s
    ON c.query_id = s.query_id AND c.neighbor_id = s.neighbor_id
  WHERE s.neighbor_id IS NULL
)"""

    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings WHERE vec_id >= 8
), scored AS (
  SELECT query_id, neighbor_id, {rel} AS rel8,
         CAST(round({rel} * 1e8) AS BIGINT) AS reli, cv
  FROM q CROSS JOIN c
), cand AS (
  SELECT * FROM scored
  QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY reli DESC, neighbor_id
  ) <= 8
), sel1 AS (
  SELECT query_id, neighbor_id, reli, cv, 1 AS mmr_rank, rel8 AS mmr_score
  FROM cand
  QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY reli DESC, neighbor_id
  ) = 1
), {anti('rem2', 'cand', 'sel1')}, {pick(2, 'rem2', 'sel1')},
sel12 AS (
  SELECT * FROM sel1 UNION ALL SELECT * FROM pick2
), {anti('rem3', 'cand', 'sel12')}, {pick(3, 'rem3', 'sel12')}
SELECT query_id, neighbor_id, CAST(mmr_rank AS INT) AS mmr_rank, mmr_score
FROM (
  SELECT * FROM sel12 UNION ALL SELECT * FROM pick3
)
"""


ORACLE_SIM_MMR = _mmr_oracle_sql()


def pipe_mixture_plan(spark, sf_dir):
    """Domain-mixture planning (Pile/LLaMA-style data mixing): documents
    bucketed into four synthetic domains, target weights
    web .5 / books .2 / code .2 / wiki .1 against a 500k-token budget,
    epochs capped at 4; per-document copy counts drawn with the
    deterministic md5 uniform. Aggregated per domain: document count,
    planned epochs, total copies, realized token count — all exactly
    mirrored in SQL."""
    from .datapipe import sampling, text

    d = _t(spark, sf_dir, "documents")
    dom = (
        F.when(F.col("doc_id") % 4 == 0, "web")
        .when(F.col("doc_id") % 4 == 1, "books")
        .when(F.col("doc_id") % 4 == 2, "code")
        .otherwise("wiki")
    )
    toks = d.select(
        "doc_id", dom.alias("domain"),
        text.token_count("text").cast("long").alias("n_tok"),
    )
    planned = sampling.mixture_plan(
        toks,
        "domain",
        weights={"web": 0.5, "books": 0.2, "code": 0.2, "wiki": 0.1},
        budget_tokens=500_000,
        token_count_col="n_tok",
        key="doc_id",
        max_repeat=4.0,
    )
    return planned.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("epochs").alias("epochs"),
        F.sum("n_copies").alias("n_copies_total"),
        F.sum(F.col("n_copies") * F.col("n_tok")).alias("realized_tokens"),
    )


def text_heavy_hitters_cms(spark, sf_dir):
    """Heavy-hitter token counts by count-min sketch (Cormode &
    Muthukrishnan; sketch.cms_build/cms_estimate, depth 4 x width 4096)
    next to the exact counts for the top-20 tokens. The sketch exchange
    moves bounded state (<= depth*width counters) regardless of corpus or
    vocabulary size — the 100 TB substitute for an exact token groupBy.
    The md5 bucket addressing and counter minima replay exactly in SQL."""
    from .datapipe import sketch
    from .datapipe.corpus import words_of

    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(words_of(F.col("text"))).alias("token"))
    sk = sketch.cms_build(toks, "token", depth=4, width=4096)
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        # distributed top-k (TakeOrderedAndProject: per-partition heads +
        # a 20-row merge), never a single-partition global window
        .orderBy(F.desc("exact_count"), F.asc("token"))
        .limit(20)
        # referenced twice below (estimate input + final join): checkpoint
        # the 20 rows so the corpus-wide exact groupBy runs once
        .localCheckpoint(eager=False)
    )
    est = sketch.cms_estimate(sk, top.select("token"), "token",
                              depth=4, width=4096)
    return top.join(est, "token").select("token", "exact_count", "cms_count")


def _cms_oracle_sql() -> str:
    def bucket(j, tok):
        return (
            f"CAST(concat('0x', substr(md5(concat('cms{j}:', {tok})), 1, 15)) "
            f"AS BIGINT) % 4096"
        )

    sk_rows = " UNION ALL ".join(
        f"SELECT {j} AS row, {bucket(j, 'token')} AS bucket FROM toks"
        for j in range(4)
    )
    est_rows = " UNION ALL ".join(
        f"SELECT token, {j} AS row, {bucket(j, 'token')} AS bucket FROM top"
        for j in range(4)
    )
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token
  FROM documents
), sk AS (
  SELECT row, bucket, COUNT(*) AS cnt FROM ({sk_rows}) GROUP BY row, bucket
), top AS (
  SELECT token, COUNT(*) AS exact_count FROM toks GROUP BY token
  QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, token) <= 20
), est AS (
  SELECT a.token, MIN(COALESCE(s.cnt, 0)) AS cms_count
  FROM ({est_rows}) a LEFT JOIN sk s ON a.row = s.row AND a.bucket = s.bucket
  GROUP BY a.token
)
SELECT t.token, t.exact_count, e.cms_count
FROM top t JOIN est e ON t.token = e.token
"""


ORACLE_TEXT_CMS = _cms_oracle_sql()


def text_heavy_hitters_stream(spark, sf_dir):
    """Sharded Space-Saving heavy hitters (streaming.ops
    streaming_heavy_hitters — Metwally 2005; the batch degradation is the
    exact per-shard capped count, which is what a single-trigger stream
    emits): document tokens hash into 8 md5-derived shards, each capped at
    64 candidates, global top-20 by (count desc, token asc). The oracle
    replays the md5 shard assignment and the per-shard cap verbatim."""
    from .streaming.ops import streaming_heavy_hitters

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
        ).alias("token")
    )
    hh = streaming_heavy_hitters(toks, "token", k=20, shards=8, capacity=64)
    return (
        hh.orderBy(F.col("est_count").desc(), F.col("token").asc())
        .limit(20)
        .select("token", "est_count", "shard")
    )


ORACLE_TEXT_HH_STREAM = """
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token
  FROM documents
), sharded AS (
  SELECT token,
         CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT) % 8 AS shard
  FROM toks
), counts AS (
  SELECT shard, token, COUNT(*) AS est_count
  FROM sharded GROUP BY shard, token
), capped AS (
  SELECT shard, token, est_count,
         ROW_NUMBER() OVER (PARTITION BY shard
                            ORDER BY est_count DESC, token ASC) AS rn
  FROM counts
)
SELECT token, est_count, CAST(shard AS INT) AS shard
FROM capped
WHERE rn <= 64
ORDER BY est_count DESC, token ASC
LIMIT 20
"""


# Messy-URL construction shared verbatim between the Spark query and the
# DuckDB oracle (same engine-portable SQL text -> identical strings).
_URL_MESSY_EXPR = """concat(
  CASE WHEN doc_id % 4 = 0 THEN 'https://' WHEN doc_id % 4 = 1 THEN 'HTTP://'
       WHEN doc_id % 4 = 2 THEN 'http://' ELSE 'HTTPS://' END,
  CASE WHEN doc_id % 3 = 0 THEN 'www.' WHEN doc_id % 3 = 1 THEN 'WWW.' ELSE '' END,
  CASE WHEN doc_id % 2 = 0
       THEN concat('Site', CAST(doc_id % 7 AS STRING), '.Example.COM')
       ELSE concat('site', CAST(doc_id % 7 AS STRING), '.example.com') END,
  '/articles/Item-', CAST(CAST(floor(doc_id / 3.0) AS BIGINT) AS STRING),
  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
  CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&utm_medium=rss'
       WHEN doc_id % 6 = 1 THEN concat('?id=', CAST(doc_id % 9 AS STRING), '&utm_campaign=x')
       WHEN doc_id % 6 = 2 THEN concat('?utm_content=a&id=', CAST(doc_id % 9 AS STRING))
       WHEN doc_id % 6 = 3 THEN concat('?id=', CAST(doc_id % 9 AS STRING))
       WHEN doc_id % 6 = 4 THEN '?gclid=abc123'
       ELSE '' END,
  CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)"""


def text_url_canonical(spark, sf_dir):
    """URL canonicalization + URL-keyed duplicate counting
    (datapipe.text.canonical_url): scheme/www/fragment/tracking-param
    normalization as native regexp expressions, then a count per canonical
    page identity. The messy URLs are synthesized from doc_id with case,
    scheme, trailing-slash, tracking-param, and fragment noise; the oracle
    replays the identical regexp pipeline with DuckDB's 'g' flag."""
    from .datapipe.text import canonical_url

    d = _t(spark, sf_dir, "documents")
    staged = d.selectExpr("doc_id", f"{_URL_MESSY_EXPR} AS url")
    staged = staged.withColumn("canon", canonical_url("url"))
    w = Window.partitionBy("canon")
    return staged.select(
        "doc_id",
        "url",
        "canon",
        F.count("*").over(w).cast("long").alias("dup_cnt"),
    )


ORACLE_TEXT_URL_CANONICAL = f"""
WITH raw AS (
  SELECT doc_id, {_URL_MESSY_EXPR} AS url FROM documents
), c1 AS (
  SELECT doc_id, url,
         regexp_replace(
           regexp_replace(
             regexp_replace(url, '#.*$', '', 'g'),
             '^[Hh][Tt][Tt][Pp][Ss]?://', '', 'g'),
           '^[Ww][Ww][Ww]\\.', '', 'g') AS t
  FROM raw
), c2 AS (
  SELECT doc_id, url,
         concat(lower(regexp_extract(t, '^([^/?]*)', 1)),
                substr(t, length(regexp_extract(t, '^([^/?]*)', 1)) + 1, 1048576)) AS t
  FROM c1
), c3 AS (
  SELECT doc_id, url,
         regexp_replace(regexp_replace(t, '\\?.*$', '', 'g'), '/$', '') AS pth,
         regexp_replace(
           regexp_replace(
             regexp_replace(concat('&', regexp_extract(t, '\\?(.*)$', 1)),
               '&(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*', '', 'g'),
             '^&+', ''),
           '&+$', '') AS qs
  FROM c2
), c4 AS (
  SELECT doc_id, url,
         CASE WHEN qs = '' THEN pth ELSE concat(pth, '?', qs) END AS canon
  FROM c3
)
SELECT doc_id, url, canon,
       COUNT(*) OVER (PARTITION BY canon) AS dup_cnt
FROM c4
"""


def pipe_domain_cap(spark, sf_dir):
    """Per-domain frequency cap (sampling.domain_cap; the FineWeb-style
    "no domain contributes more than N docs" step): top 15 documents per
    source by n_chars, doc_id tie-break. One shuffle keyed on the domain;
    the oracle is the same ROW_NUMBER window."""
    from .datapipe.sampling import domain_cap

    d = _t(spark, sf_dir, "documents")
    kept = domain_cap(d, "source", "n_chars", 15, key_col="doc_id")
    return kept.select("doc_id", "source", "n_chars")


ORACLE_PIPE_DOMAIN_CAP = """
SELECT doc_id, source, n_chars
FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
)
WHERE rn <= 15
"""


def pipe_budget_fill(spark, sf_dir):
    """Quality-first budget fill (FineWeb-style curation) without a
    per-domain sort: score-histogram threshold + deterministic fractional
    admission inside the threshold bucket (sampling.budget_fill). Four
    synthetic domains, 60k-token budget each, 1000 score buckets.
    Aggregated per domain; the DuckDB oracle replays the identical
    histogram/window/threshold arithmetic."""
    from .datapipe import sampling, text

    d = _t(spark, sf_dir, "documents")
    dom = (
        F.when(F.col("doc_id") % 4 == 0, "web")
        .when(F.col("doc_id") % 4 == 1, "books")
        .when(F.col("doc_id") % 4 == 2, "code")
        .otherwise("wiki")
    )
    toks = d.select(
        "doc_id", dom.alias("domain"),
        text.token_count("text").cast("long").alias("n_tok"),
        F.round(text.quality_score("text"), 6).alias("q"),
    )
    out = sampling.budget_fill(
        toks, "domain", "n_tok", "q",
        budget_tokens=60_000, n_buckets=1000, key="doc_id",
    )
    return out.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("selected").cast("long")).alias("n_selected"),
        F.sum("n_tok").alias("tokens_total"),
        F.sum(F.when(F.col("selected"), F.col("n_tok")).otherwise(0)).alias(
            "tokens_selected"
        ),
    )


_Q6_SQL = """round(LEAST(GREATEST(
         (CASE WHEN length(text) > 0
               THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
               ELSE 0.0 END) * 0.6
         + (1.0 - (CASE WHEN length(text) > 0
               THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
               ELSE 0.0 END)) * 0.2
         + (CASE WHEN (CASE WHEN len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) > 0
               THEN CAST(list_sum(list_transform(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''), x -> length(x))) AS DOUBLE)
                    / CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS DOUBLE)
               ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
         , 0.0), 1.0), 6)"""


ORACLE_PIPE_BUDGET_FILL = f"""
WITH toks AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'web' WHEN 1 THEN 'books'
              WHEN 2 THEN 'code' ELSE 'wiki' END AS domain,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok,
         {_Q6_SQL} AS q
  FROM documents
), rows_b AS (
  SELECT doc_id, domain, n_tok,
         LEAST(CAST(floor(q * 1000.0) AS BIGINT), 999) AS bucket
  FROM toks
), hist AS (
  SELECT domain, bucket, SUM(n_tok) AS btok
  FROM rows_b GROUP BY domain, bucket
), cum AS (
  SELECT domain, bucket, btok,
         SUM(btok) OVER (PARTITION BY domain ORDER BY bucket DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM hist
), plan AS (
  SELECT cum.domain, cum.bucket AS tb,
         round((CAST(60000.0 AS DOUBLE) - CAST(c - btok AS DOUBLE))
               / CAST(btok AS DOUBLE), 8) AS rate
  FROM cum
  JOIN (SELECT domain, MAX(bucket) AS tb FROM cum WHERE c >= 60000
        GROUP BY domain) t
    ON cum.domain = t.domain AND cum.bucket = t.tb
), perdoc AS (
  SELECT r.domain, r.n_tok,
         CASE WHEN p.tb IS NULL THEN TRUE
              WHEN r.bucket > p.tb THEN TRUE
              WHEN r.bucket = p.tb
                   AND CAST(concat('0x', substr(md5(concat('fill:', CAST(r.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 < p.rate
                   THEN TRUE
              ELSE FALSE END AS selected
  FROM rows_b r LEFT JOIN plan p ON r.domain = p.domain
)
SELECT domain, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN selected THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_selected
FROM perdoc GROUP BY domain
"""


ORACLE_PIPE_MIXTURE_PLAN = """
WITH toks AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'web' WHEN 1 THEN 'books'
              WHEN 2 THEN 'code' ELSE 'wiki' END AS domain,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
), avail AS (
  SELECT domain, SUM(n_tok) AS avail FROM toks GROUP BY domain
), plan AS (
  SELECT domain,
         round(least(
           CASE domain WHEN 'web' THEN CAST(0.5 AS DOUBLE)
                WHEN 'books' THEN CAST(0.2 AS DOUBLE)
                WHEN 'code' THEN CAST(0.2 AS DOUBLE)
                ELSE CAST(0.1 AS DOUBLE) END
           * CAST(500000.0 AS DOUBLE) / CAST(avail AS DOUBLE),
           CAST(4.0 AS DOUBLE)), 8) AS epochs
  FROM avail
), perdoc AS (
  SELECT t.doc_id, t.domain, t.n_tok, p.epochs,
         CAST(floor(p.epochs) AS BIGINT)
         + CASE WHEN CAST(concat('0x', substr(md5(concat('mix:', CAST(t.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0
                     < round(p.epochs - floor(p.epochs), 8)
                THEN 1 ELSE 0 END AS n_copies
  FROM toks t JOIN plan p USING (domain)
)
SELECT domain, COUNT(*) AS n_docs, MIN(epochs) AS epochs,
       CAST(SUM(n_copies) AS BIGINT) AS n_copies_total,
       CAST(SUM(n_copies * n_tok) AS BIGINT) AS realized_tokens
FROM perdoc GROUP BY domain
"""


def geo_zorder(spark, sf_dir):
    """Space-filling-curve keys (functions/curves.py): level-16 Morton
    (Z-order) and Hilbert keys of customer points, computed entirely as
    native Catalyst expressions (bit interleave resp. the unrolled
    rotate/flip loop — no Python anywhere in the plan). These are the
    write-clustering keys behind cluster_geoparquet; the oracle restates
    the same integer algorithms in DuckDB SQL (Hilbert as one chained
    subquery per level)."""
    from .functions import curves

    c = _t(spark, sf_dir, "customer")
    df = _spread(c).select(
        "c_custkey",
        (F.col("c_custkey").cast("double") % 3600 / 10.0 - 180.0).alias("lon"),
        (F.col("c_custkey").cast("double") % 1700 / 10.0 - 85.0).alias("lat"),
    )
    df = df.withColumn("morton", curves.morton_key_expr("lon", "lat", 16))
    df = curves.with_hilbert_key(df, "lon", "lat", "hilbert", 16)
    return df.select("c_custkey", "morton", "hilbert")


def _zorder_oracle_sql() -> str:
    from .functions import curves

    n = 1 << 16
    base = (
        "SELECT c_custkey,\n"
        f"  CAST(greatest(0, least({n - 1}, floor(((lon - (-180.0)) / 360.0) * {float(n)!r}))) AS BIGINT) AS ix,\n"
        f"  CAST(greatest(0, least({n - 1}, floor(((lat - (-90.0)) / 180.0) * {float(n)!r}))) AS BIGINT) AS iy\n"
        "FROM (SELECT c_custkey,\n"
        "        CAST(c_custkey AS DOUBLE) % 3600 / 10.0 - 180.0 AS lon,\n"
        "        CAST(c_custkey AS DOUBLE) % 1700 / 10.0 - 85.0 AS lat\n"
        "      FROM customer)"
    )

    def spread(col):
        s = col
        for shift, mask in curves._SPREAD_STEPS:
            s = f"(({s} | ({s} << {shift})) & {mask})"
        return s

    morton = f"({spread('ix')} | ({spread('iy')} << 1))"
    ctes = [
        f"h0 AS (SELECT c_custkey, ix AS x, iy AS y, CAST(0 AS BIGINT) AS d,\n"
        f"        {morton} AS morton FROM cells)"
    ]
    prev = "h0"
    for step, i in enumerate(range(15, -1, -1)):
        s = 1 << i
        cur = f"h{step + 1}"
        ctes.append(
            f"{cur} AS (SELECT c_custkey, morton,\n"
            f"  d + CAST({s * s} AS BIGINT) * CAST(xor(3 * rx, ry) AS BIGINT) AS d,\n"
            f"  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - y ELSE y END) ELSE x END AS x,\n"
            f"  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - x ELSE x END) ELSE y END AS y\n"
            f"  FROM (SELECT *, CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,\n"
            f"               CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry FROM {prev}))"
        )
        prev = cur
    joined = ",\n".join(ctes)
    return (
        f"WITH cells AS ({base}),\n{joined}\n"
        f"SELECT c_custkey, morton, d AS hilbert FROM {prev}"
    )


ORACLE_GEO_ZORDER = _zorder_oracle_sql()


_KNN_PX = (
    "CAST(conv(substring(md5(concat('knx:', CAST(c_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    " % 5000 / 100.0 AS px"
)
_KNN_PY = (
    "CAST(conv(substring(md5(concat('kny:', CAST(c_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    " % 5000 / 100.0 AS py"
)

_KNN_PTS_DUCK = (
    "SELECT c_custkey,"
    " CAST(concat('0x', substr(md5(concat('knx:', CAST(c_custkey AS VARCHAR))), 1, 8)) AS BIGINT)"
    " % 5000 / 100.0 AS px,"
    " CAST(concat('0x', substr(md5(concat('kny:', CAST(c_custkey AS VARCHAR))), 1, 8)) AS BIGINT)"
    " % 5000 / 100.0 AS py"
)


def geo_knn_join(spark, sf_dir):
    """Exact spatial kNN join (join.knn_spatial_join): every 4th customer
    point finds its 3 nearest neighbors among all customer points
    (md5-uniform coordinates in a 50x50 plane) via grid rounds with the
    geometric resolution guarantee + broadcast fallback — fully native
    plan. Oracle is the brute-force cross join ranked by (distance, id)."""
    from .join.spatial import knn_spatial_join

    c = _t(spark, sf_dir, "customer")
    pts = _spread(c).selectExpr("c_custkey", _KNN_PX, _KNN_PY)
    left = pts.filter(F.col("c_custkey") % 4 == 0)
    out = knn_spatial_join(
        left,
        pts,
        k=3,
        left_id="c_custkey",
        right_id="c_custkey",
        left_xy=("px", "py"),
        right_xy=("px", "py"),
        cell_size=2.0,
    )
    return out.select(
        "l_id",
        "r_id",
        F.col("rn").cast("long").alias("rn"),
        F.round("dist", 6).alias("dist"),
    )


ORACLE_GEO_KNN = f"""
WITH pts AS ({_KNN_PTS_DUCK} FROM customer)
SELECT a.c_custkey AS l_id, b.c_custkey AS r_id,
       CAST(row_number() OVER (PARTITION BY a.c_custkey
            ORDER BY sqrt((a.px - b.px) * (a.px - b.px)
                        + (a.py - b.py) * (a.py - b.py)), b.c_custkey) AS BIGINT) AS rn,
       round(sqrt((a.px - b.px) * (a.px - b.px)
                + (a.py - b.py) * (a.py - b.py)), 6) AS dist
FROM pts a CROSS JOIN pts b
WHERE a.c_custkey % 4 = 0
QUALIFY rn <= 3
"""


def geo_lof_outliers(spark, sf_dir):
    """Local Outlier Factor (ops.outliers.lof_scores; Breunig et al.
    SIGMOD 2000): density-based outlier scores for customer points,
    composed from the exact spatial kNN join (k=5, deterministic ties) —
    reachability/LOF means accumulate rounded decimals so the brute-force
    oracle matches bit-exactly."""
    from .ops.outliers import lof_scores

    c = _t(spark, sf_dir, "customer")
    # no _spread: px/py are native expressions; a repartition would only
    # add an exchange in front of the small-input probe
    pts = c.selectExpr("c_custkey", _KNN_PX, _KNN_PY)
    return lof_scores(pts, "c_custkey", "px", "py", k=5, cell_size=2.0)


ORACLE_GEO_LOF = f"""
WITH pts AS ({_KNN_PTS_DUCK} FROM customer),
d AS (
  SELECT a.c_custkey AS l_id, b.c_custkey AS r_id,
         sqrt((a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py)) AS dist
  FROM pts a JOIN pts b ON a.c_custkey <> b.c_custkey
),
nn AS (
  SELECT l_id, r_id, dist FROM (
    SELECT *, row_number() OVER (PARTITION BY l_id ORDER BY dist, r_id) AS rk FROM d
  ) WHERE rk <= 5
),
kd AS (SELECT l_id, MAX(dist) AS kdist FROM nn GROUP BY l_id),
rch AS (
  SELECT nn.l_id, nn.r_id, greatest(kd.kdist, nn.dist) AS reach
  FROM nn JOIN kd ON kd.l_id = nn.r_id
),
lrd AS (
  SELECT l_id,
         5.0 / CAST(SUM(CAST(round(reach, 12) AS DECIMAL(38,12))) AS DOUBLE) AS lrd
  FROM rch GROUP BY l_id
)
SELECT nn.l_id AS c_custkey,
       round(CAST(SUM(CAST(round(lo.lrd, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / 5.0 / lp.lrd, 8) AS lof
FROM nn
JOIN lrd lo ON lo.l_id = nn.r_id
JOIN lrd lp ON lp.l_id = nn.l_id
GROUP BY nn.l_id, lp.lrd
"""


def geo_hexbin(spark, sf_dir):
    """Hexagonal density rollup (curves.hex_cell_expr; PostGIS
    ST_HexagonGrid-style): customer points binned to flat-top axial hex
    cells (circumradius 2.5), counts + mean coordinates per cell, hex
    centers for rendering — one codegen'd groupBy, the standard heatmap
    aggregation at scale. Oracle restates the fractional-axial + cube
    rounding closed form in SQL."""
    from .functions import curves

    c = _t(spark, sf_dir, "customer")
    pts = _spread(c).selectExpr("c_custkey", _KNN_PX, _KNN_PY)
    pts = pts.select(
        "c_custkey",
        F.col("px").cast("double").alias("px"),
        F.col("py").cast("double").alias("py"),
    )
    q, r = curves.hex_cell_expr("px", "py", 2.5)
    binned = pts.select("c_custkey", "px", "py", q.alias("hq"), r.alias("hr"))
    # px/py carry exactly 2 decimals -> mean as an exact integer-cents sum
    # + one double division (order-independent, engine-exact)
    agg = binned.groupBy("hq", "hr").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.round(
            F.sum(F.round(F.col("px") * 100).cast("long")).cast("double")
            / (F.count(F.lit(1)) * 100.0), 6,
        ).alias("mean_x"),
        F.round(
            F.sum(F.round(F.col("py") * 100).cast("long")).cast("double")
            / (F.count(F.lit(1)) * 100.0), 6,
        ).alias("mean_y"),
    )
    cx, cy = curves.hex_center_expr("hq", "hr", 2.5)
    return agg.select(
        "hq", "hr", "n_pts", "mean_x", "mean_y",
        F.round(cx, 6).alias("hex_cx"), F.round(cy, 6).alias("hex_cy"),
    )


def _hexbin_oracle_sql(size=2.5) -> str:
    R = float(size)
    fq = f"((px * (2.0 / 3.0)) / {R!r})"
    fr = f"((px * (-1.0 / 3.0) + py * (sqrt(3.0) / 3.0)) / {R!r})"
    return f"""
WITH pts AS ({_KNN_PTS_DUCK} FROM customer),
frac AS (
  SELECT c_custkey, px, py, {fq} AS fq, {fr} AS fr, (-{fq} - {fr}) AS fs
  FROM pts
),
rounded AS (
  SELECT *, round(fq) AS rq, round(fr) AS rr, round(fs) AS rs,
         abs(round(fq) - fq) AS dq, abs(round(fr) - fr) AS dr,
         abs(round(fs) - fs) AS ds
  FROM frac
),
cells AS (
  SELECT c_custkey, px, py,
         CAST(CASE WHEN dq > dr AND dq > ds THEN -rr - rs ELSE rq END AS BIGINT) AS hq,
         CAST(CASE WHEN NOT (dq > dr AND dq > ds) AND dr > ds THEN -rq - rs ELSE rr END AS BIGINT) AS hr
  FROM rounded
)
SELECT hq, hr, COUNT(*) AS n_pts,
       round(CAST(SUM(CAST(round(px * 100) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * 100.0), 6) AS mean_x,
       round(CAST(SUM(CAST(round(py * 100) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * 100.0), 6) AS mean_y,
       round({R!r} * (hq * 1.5), 6) AS hex_cx,
       round({R!r} * sqrt(3.0) * (CAST(hr AS DOUBLE) + CAST(hq AS DOUBLE) / 2.0), 6) AS hex_cy
FROM cells
GROUP BY hq, hr
"""


ORACLE_GEO_HEXBIN = _hexbin_oracle_sql()


def geo_cluster_kmeans(spark, sf_dir):
    """ST_ClusterKMeans parity: k-means over 2-D points, reusing the
    embeddings k-means machinery (similarity.kmeans_train /
    assign_clusters — broadcast centroid assignment, exact decimal
    distances, deterministic lowest-id init). Output: every point's
    cluster id after 2 Lloyd's iterations, k=6, mirrored bit-exactly by
    the unrolled-CTE oracle."""
    from .datapipe.similarity import assign_clusters, kmeans_train, _centroid_df

    c = _t(spark, sf_dir, "customer")
    pts = _spread(c).selectExpr("c_custkey", _KNN_PX, _KNN_PY).select(
        "c_custkey", F.array(F.col("px"), F.col("py")).alias("v")
    )
    cents = kmeans_train(pts, vec="v", id_col="c_custkey", k=6, iters=2)
    cdf = _centroid_df(spark, cents)
    out = assign_clusters(pts, cdf, vec="v", id_col="c_custkey")
    return out.select("c_custkey", F.col("cid").cast("long").alias("cluster"))


def _cluster_kmeans_oracle_sql(k=6, iters=2) -> str:
    d2 = "SUM(CAST(round((av - cv) * (av - cv), 12) AS DECIMAL(38,12))) AS d2"
    ctes = [
        f"pts AS (SELECT c_custkey, [px, py] AS v FROM ({_KNN_PTS_DUCK} FROM customer))",
        f"""cent0 AS (
  SELECT CAST(row_number() OVER (ORDER BY c_custkey) - 1 AS BIGINT) AS cid, v AS cvec
  FROM (SELECT * FROM pts ORDER BY c_custkey LIMIT {k})
)""",
        """vals AS (
  SELECT c_custkey AS vid, unnest(v)::DOUBLE AS val, unnest(range(len(v))) AS dim
  FROM pts
)""",
    ]
    for i in range(iters):
        ctes += [
            f"""t{i} AS (
  SELECT p.c_custkey AS vid, kk.cid,
         unnest(p.v)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM pts p CROSS JOIN cent{i} kk
)""",
            f"d{i} AS (SELECT vid, cid, {d2} FROM t{i} GROUP BY vid, cid)",
            f"""a{i} AS (
  SELECT vid, cid FROM (
    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
    FROM d{i}
  ) WHERE rn = 1
)""",
            f"""cent{i + 1} AS (
  SELECT cid, list(cval ORDER BY dim) AS cvec FROM (
    SELECT a.cid, v.dim,
           CAST(SUM(CAST(round(v.val, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS cval
    FROM a{i} a JOIN vals v ON a.vid = v.vid
    GROUP BY a.cid, v.dim
  ) GROUP BY cid
)""",
        ]
    fin = iters
    ctes += [
        f"""tf AS (
  SELECT p.c_custkey AS vid, kk.cid,
         unnest(p.v)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM pts p CROSS JOIN cent{fin} kk
)""",
        f"df_ AS (SELECT vid, cid, {d2} FROM tf GROUP BY vid, cid)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + """
SELECT vid AS c_custkey, cid AS cluster FROM (
  SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
  FROM df_
) WHERE rn = 1
"""
    )


ORACLE_GEO_CLUSTER_KMEANS = _cluster_kmeans_oracle_sql()


def geo_dbscan(spark, sf_dir):
    """Distributed DBSCAN (ops.dbscan; ST_ClusterDBSCAN parity): customer
    points on the same md5-uniform 50x50 plane, eps=1.5, min_pts=5.
    Neighbor pairs come from the PBSM grid (never all-pairs), cluster ids
    from the reused min-label connected-components loop; border points
    take the smallest neighboring core cluster. The oracle recomputes all
    of it brute-force with a recursive-CTE closure."""
    from .ops.dbscan import dbscan

    c = _t(spark, sf_dir, "customer")
    # no _spread: px/py are native md5 expressions (no python kernels
    # before dbscan's own shuffles), so a repartition would only add an
    # exchange in front of the small-input probe
    pts = c.selectExpr("c_custkey", _KNN_PX, _KNN_PY)
    out = dbscan(pts, "c_custkey", "px", "py", eps=1.5, min_pts=5)
    return out.select("c_custkey", "cluster_id", "role")


ORACLE_GEO_DBSCAN = f"""
WITH RECURSIVE pts AS ({_KNN_PTS_DUCK} FROM customer),
pairs AS (
  SELECT a.c_custkey AS a, b.c_custkey AS b
  FROM pts a JOIN pts b
    ON a.c_custkey <> b.c_custkey
   AND (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) <= 1.5 * 1.5
),
cnt AS (SELECT a, COUNT(*) + 1 AS n_nb FROM pairs GROUP BY a),
core AS (
  SELECT p.c_custkey AS pid FROM pts p
  JOIN cnt ON cnt.a = p.c_custkey WHERE cnt.n_nb >= 5
),
core_edges AS (
  SELECT pr.a AS src, pr.b AS dst FROM pairs pr
  JOIN core ca ON ca.pid = pr.a JOIN core cb ON cb.pid = pr.b
),
cc(node, label) AS (
  SELECT pid, pid FROM core
  UNION
  SELECT e.src, cc.label FROM core_edges e JOIN cc ON e.dst = cc.node
),
assign AS (SELECT node, MIN(label) AS cluster_id FROM cc GROUP BY node),
border AS (
  SELECT pr.a AS pid, MIN(asg.cluster_id) AS b_cluster
  FROM pairs pr
  JOIN core cb ON cb.pid = pr.b
  JOIN assign asg ON asg.node = pr.b
  WHERE pr.a NOT IN (SELECT pid FROM core)
  GROUP BY pr.a
)
SELECT p.c_custkey,
       CASE WHEN co.pid IS NOT NULL THEN asg.cluster_id ELSE bo.b_cluster END AS cluster_id,
       CASE WHEN co.pid IS NOT NULL THEN 'core'
            WHEN bo.b_cluster IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM pts p
LEFT JOIN core co ON co.pid = p.c_custkey
LEFT JOIN assign asg ON asg.node = p.c_custkey
LEFT JOIN border bo ON bo.pid = p.c_custkey
"""


def geo_geodesic_area(spark, sf_dir):
    """Ellipsoidal (geodesic) polygon area, geodesic_area.rs:17 parity.
    Envelope quads have meridian/parallel edges, for which the engine's
    Green's-theorem integral is EXACT — the oracle mirrors the closed form
    A = dlam * (F(lat2) - F(lat1)), F(p) = b^2/2 (sin p/(1-e2 sin^2 p)
    + atanh(e sin p)/e), in plain SQL."""
    p = _t(spark, sf_dir, "part")
    lon1 = "CAST(p_partkey % 30 AS DOUBLE) * 2.0 - 30.0"
    lon2 = f"({lon1}) + 1.0 + CAST(p_partkey % 3 AS DOUBLE)"
    lat1 = "CAST(p_size % 60 AS DOUBLE) - 30.0"
    lat2 = f"({lat1}) + 1.0 + CAST(p_size % 5 AS DOUBLE)"
    return p.selectExpr(
        "p_partkey",
        f"round(ST_AreaSpheroid(ST_MakeEnvelope({lon1}, {lat1}, {lon2}, {lat2})) / 1e6, 3) AS geod_area_km2",
        f"round(abs(ST_AreaSpherical(ST_MakeEnvelope({lon1}, {lat1}, {lon2}, {lat2}))) / 1e6, 3) AS sphere_area_km2",
    )


# WGS84: a=6378137, f=1/298.257223563, e2=f(2-f), b2=a^2(1-e2)
ORACLE_GEO_GEODESIC_AREA = """
WITH params AS (
  SELECT 6378137.0 AS a, 1.0/298.257223563 AS f
), consts AS (
  SELECT a, f, f*(2.0-f) AS e2, sqrt(f*(2.0-f)) AS e, a*a*(1.0-f*(2.0-f)) AS b2
  FROM params
), quads AS (
  SELECT p_partkey,
         radians((CAST(p_partkey % 30 AS DOUBLE) * 2.0 - 30.0)) AS lam1,
         radians((CAST(p_partkey % 30 AS DOUBLE) * 2.0 - 30.0) + 1.0 + CAST(p_partkey % 3 AS DOUBLE)) AS lam2,
         radians(CAST(p_size % 60 AS DOUBLE) - 30.0) AS phi1,
         radians((CAST(p_size % 60 AS DOUBLE) - 30.0) + 1.0 + CAST(p_size % 5 AS DOUBLE)) AS phi2
  FROM part
)
SELECT p_partkey,
       round((lam2 - lam1) * (
           b2/2.0 * (sin(phi2)/(1.0 - e2*sin(phi2)*sin(phi2)) + 0.5*ln((1.0 + e*sin(phi2))/(1.0 - e*sin(phi2)))/e)
         - b2/2.0 * (sin(phi1)/(1.0 - e2*sin(phi1)*sin(phi1)) + 0.5*ln((1.0 + e*sin(phi1))/(1.0 - e*sin(phi1)))/e)
       ) / 1e6, 3) AS geod_area_km2,
       round((lam2 - lam1) * (sin(phi2) - sin(phi1))
             * 6371008.8 * 6371008.8 / 1e6, 3) AS sphere_area_km2
FROM quads, consts
"""


ORACLE_GEO_TRANSFORM = """
SELECT c_custkey,
       round(6378137.0 * radians(CAST(c_custkey % 360 AS DOUBLE) - 179.5), 4) AS merc_x,
       round(6378137.0 * ln(tan(pi() / 4.0 + radians(CAST(c_custkey % 170 AS DOUBLE) - 84.5) / 2.0)), 4) AS merc_y,
       round(CAST(c_custkey % 600 AS DOUBLE) / 100.0, 6) AS utm_rt_lon,
       round(CAST(c_custkey % 1600 AS DOUBLE) / 10.0 - 80.0, 6) AS utm_rt_lat
FROM customer
"""


def geo_line_substring(spark, sf_dir):
    """ST_LineSubstring + ST_DWithin: fractional sub-line of a straight line
    has closed-form endpoints/length; DWithin on axis-aligned points is an
    exact integer comparison."""
    p = _t(spark, sf_dir, "part")
    L = "CAST(p_size AS DOUBLE)"  # 1..50, integer-valued
    line = f"ST_MakeLine(ST_Point(0.0, 0.0), ST_Point({L}, 0.0))"
    sub = f"ST_LineSubstring({line}, 0.25, 0.75)"
    return p.selectExpr(
        "p_partkey",
        f"ST_X(ST_StartPoint({sub})) AS sub_x0",
        f"ST_X(ST_EndPoint({sub})) AS sub_x1",
        f"ST_Length({sub}) AS sub_len",
        f"ST_DWithin(ST_Point({L}, 0.0), ST_Point(0.0, 0.0), 25.0) AS within_25",
    )


ORACLE_GEO_LINE_SUBSTRING = """
SELECT p_partkey,
       CAST(p_size AS DOUBLE) * 0.25 AS sub_x0,
       CAST(p_size AS DOUBLE) * 0.75 AS sub_x1,
       CAST(p_size AS DOUBLE) * 0.5 AS sub_len,
       CAST(p_size AS DOUBLE) <= 25.0 AS within_25
FROM part
"""


def geo_closest_point(spark, sf_dir):
    """ST_ClosestPoint / ST_ShortestLine: nearest point on a horizontal
    segment to a derived point is a closed-form clamp."""
    o = _t(spark, sf_dir, "orders")
    x = "CAST(o_orderkey % 200 AS DOUBLE) - 50.0"  # -50..149 vs segment [0,100]
    y = "CAST(o_custkey % 40 AS DOUBLE) + 1.0"
    seg = "ST_MakeLine(ST_Point(0.0, 0.0), ST_Point(100.0, 0.0))"
    cp = f"ST_ClosestPoint({seg}, ST_Point({x}, {y}))"
    sl = f"ST_ShortestLine({seg}, ST_Point({x}, {y}))"
    return o.selectExpr(
        "o_orderkey",
        f"round(ST_X({cp}), 6) AS cp_x",
        f"ST_Y({cp}) AS cp_y",
        f"round(ST_Length({sl}), 6) AS sep",
    )


ORACLE_GEO_CLOSEST = """
SELECT o_orderkey,
       round(LEAST(GREATEST(CAST(o_orderkey % 200 AS DOUBLE) - 50.0, 0.0), 100.0), 6) AS cp_x,
       0.0 AS cp_y,
       round(sqrt(
         (CAST(o_orderkey % 200 AS DOUBLE) - 50.0
          - LEAST(GREATEST(CAST(o_orderkey % 200 AS DOUBLE) - 50.0, 0.0), 100.0)) *
         (CAST(o_orderkey % 200 AS DOUBLE) - 50.0
          - LEAST(GREATEST(CAST(o_orderkey % 200 AS DOUBLE) - 50.0, 0.0), 100.0)) +
         (CAST(o_custkey % 40 AS DOUBLE) + 1.0) * (CAST(o_custkey % 40 AS DOUBLE) + 1.0)
       ), 6) AS sep
FROM orders
"""


def geo_project(spark, sf_dir):
    """Geodesic destination point (ST_Project family). The spherical variant
    has a closed form mirrored in SQL; the spheroid (Vincenty direct) variant
    is covered by pytest round-trip checks."""
    s = _t(spark, sf_dir, "supplier")
    lon = "CAST(s_suppkey % 360 AS DOUBLE) - 180.0 + 0.25"
    lat = "CAST(s_suppkey % 160 AS DOUBLE) / 2.0 - 40.0"
    dist = "CAST(s_suppkey % 100 + 1 AS DOUBLE) * 1000.0"
    az = "radians(CAST(s_suppkey % 360 AS DOUBLE))"
    p = f"ST_ProjectSphere(ST_Point({lon}, {lat}), {dist}, {az})"
    return s.selectExpr(
        "s_suppkey",
        f"round(ST_X({p}), 6) AS dest_lon",
        f"round(ST_Y({p}), 6) AS dest_lat",
    )


ORACLE_GEO_PROJECT = """
WITH inp AS (
  SELECT s_suppkey,
         radians(CAST(s_suppkey % 360 AS DOUBLE) - 180.0 + 0.25) AS lam1,
         radians(CAST(s_suppkey % 160 AS DOUBLE) / 2.0 - 40.0) AS phi1,
         (CAST(s_suppkey % 100 + 1 AS DOUBLE) * 1000.0) / 6371008.8 AS delta,
         radians(CAST(s_suppkey % 360 AS DOUBLE)) AS az
  FROM supplier
), d AS (
  SELECT s_suppkey, lam1, phi1, delta, az,
         sin(phi1) * cos(delta) + cos(phi1) * sin(delta) * cos(az) AS sphi2
  FROM inp
)
SELECT s_suppkey,
       round(degrees(lam1 + atan2(sin(az) * sin(delta) * cos(phi1),
                                  cos(delta) - sin(phi1) * sphi2)), 6) AS dest_lon,
       round(degrees(asin(GREATEST(-1.0, LEAST(1.0, sphi2)))), 6) AS dest_lat
FROM d
"""


def _geohash_oracle_sql():
    """Geohash base-32 in plain SQL: integer cell indices (floor maps exactly
    to the bisection's tie-up rule — dyadic boundary values are exactly
    representable), bit interleave, 5-bit groups into the geohash alphabet."""
    interleave = " + ".join(
        [f"(((loni >> {i}) & 1) << {2 * i + 1})" for i in range(15)]
        + [f"(((lati >> {i}) & 1) << {2 * i})" for i in range(15)]
    )
    chars = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((inter >> {25 - 5 * c}) & 31) AS INT) + 1, 1)"
        for c in range(6)
    )
    return f"""
WITH pts AS (
  SELECT c_custkey,
         CAST(c_custkey % 360 - 180 AS DOUBLE) + 0.5 AS lon,
         CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5 AS lat
  FROM customer
), idx AS (
  SELECT c_custkey,
         CAST(floor((lon + 180.0) / 360.0 * 32768.0) AS BIGINT) AS loni,
         CAST(floor((lat + 90.0) / 180.0 * 32768.0) AS BIGINT) AS lati
  FROM pts
), interleaved AS (
  SELECT c_custkey, {interleave} AS inter FROM idx
)
SELECT interleaved.c_custkey, {chars} AS gh,
       -180.0 + (idx.loni + 0.5) * (360.0 / 32768.0) AS cell_lon,
       -90.0 + (idx.lati + 0.5) * (180.0 / 32768.0) AS cell_lat
FROM interleaved JOIN idx USING (c_custkey)
"""


ORACLE_GEO_GEOHASH = _geohash_oracle_sql()


# SimHash mirror: same md5-derived 60-bit gram hashes, per-bit majority vote
# via a grams x bits cross join (md5 computed once per gram, not per bit).
ORACLE_SIMHASH_SIGS = """
WITH grams AS (
  SELECT doc_id,
         CASE WHEN length(substr(text, 1, 128)) < 4 THEN [substr(text, 1, 128)]
              ELSE list_distinct(list_transform(range(1, length(substr(text, 1, 128)) - 2),
                                  i -> substr(substr(text, 1, 128), CAST(i AS INT), 4)))
         END AS g
  FROM documents
), hashes AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(g) AS x FROM grams)
), votes AS (
  SELECT doc_id, bb.b AS b,
         SUM((h >> CAST(bb.b AS INT)) & 1) AS ones,
         COUNT(*) AS n
  FROM hashes CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bb
  GROUP BY doc_id, bb.b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN 2 * ones > n THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


def _srp_bucket_sql(col: str, n_planes: int, seed: int = 7) -> str:
    """SRP bucket mirror: identical md5-derived plane weights, sequential
    left-fold float sum (list elements in order, as Spark's F.aggregate)."""
    bits = []
    for j in range(n_planes):
        proj = (
            f"list_sum(list_transform(range(0, len({col})), "
            f"i -> CAST({col}[CAST(i AS INT) + 1] AS DOUBLE) * "
            f"(CAST(concat('0x', substr(md5(concat('{seed}:{j}:', CAST(i AS VARCHAR))), 1, 8)) AS BIGINT)"
            " / 4294967296.0 - 0.5)))"
        )
        bits.append(f"CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


ORACLE_SRP_BUCKETS = (
    f"SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM "
    f"(SELECT {_srp_bucket_sql('embedding', 8)} AS bucket FROM embeddings) GROUP BY bucket"
)


def sim_ivf_topk(spark, sf_dir):
    """Approximate nearest neighbors via inverted-file SRP buckets with
    Hamming-1 multiprobe — the scale path when the corpus outgrows the
    brute-force broadcast cross-join. Full SQL oracle: the entire pipeline
    (buckets, probes, decimal cosine, rank) is mirrored in DuckDB."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    corpus = e.where(F.col("vec_id") >= 8)
    out = similarity.ivf_topk(q, corpus, k=5, n_planes=6, probe_radius=1)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


def _ivf_oracle_sql(n_planes: int = 6) -> str:
    flips = ", ".join(
        f"substr(b, 1, {j}) || (CASE WHEN substr(b, {j + 1}, 1) = '1' THEN '0' ELSE '1' END) || substr(b, {j + 2})"
        for j in range(n_planes)
    )
    return f"""
WITH withb AS (
  SELECT vec_id, embedding, {_srp_bucket_sql('embedding', n_planes)} AS b FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qe, unnest([b, {flips}]) AS probe
  FROM withb WHERE vec_id < 8
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS ce, b FROM withb WHERE vec_id >= 8
),
pairs AS (
  SELECT query_id, qe, neighbor_id, ce FROM q JOIN c ON c.b = q.probe
),
cosined AS (
  SELECT query_id, neighbor_id, {_inorder_cosine_sql('qe', 'ce')} AS cosine
  FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM cosined
) WHERE rank <= 5
"""


ORACLE_SIM_IVF_TOPK = _ivf_oracle_sql()


def sim_knn_join(spark, sf_dir):
    """Approximate k-NN SELF-join (every vector -> top-3 neighbors among
    the rest) over a shuffle bucket equi-join — no broadcast of either
    side, no all-pairs. Subset to vec_id < 120 so the DuckDB mirror (which
    must replay every candidate pair) stays fast; the Spark plan is
    identical at any size."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 120)
    out = similarity.knn_join(e, k=3, n_planes=6, probe_radius=1)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


def _knn_join_oracle_sql(n_planes: int = 6) -> str:
    flips = ", ".join(
        f"substr(b, 1, {j}) || (CASE WHEN substr(b, {j + 1}, 1) = '1' THEN '0' ELSE '1' END) || substr(b, {j + 2})"
        for j in range(n_planes)
    )
    return f"""
WITH withb AS (
  SELECT vec_id, embedding, {_srp_bucket_sql('embedding', n_planes)} AS b
  FROM embeddings WHERE vec_id < 120
),
q AS (
  SELECT vec_id AS query_id, embedding AS qe, unnest([b, {flips}]) AS probe
  FROM withb
),
c AS (SELECT vec_id AS neighbor_id, embedding AS ce, b FROM withb),
pairs AS (
  SELECT query_id, qe, neighbor_id, ce FROM q JOIN c ON c.b = q.probe
  WHERE neighbor_id <> query_id
),
cosined AS (
  SELECT query_id, neighbor_id, {_inorder_cosine_sql('qe', 'ce')} AS cosine
  FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM cosined
) WHERE rank <= 3
"""


ORACLE_SIM_KNN_JOIN = _knn_join_oracle_sql()


def q4_late_shipments(spark, sf_dir):
    """TPC-H q4 adapted (no commit/receipt dates in this schema): priority
    histogram of orders with at least one lineitem shipped >= 60 days after
    the order date — EXISTS becomes a left-semi join (no row duplication,
    no distinct)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    late = l.join(
        o, on=[l.l_orderkey == o.o_orderkey], how="inner"
    ).where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    late_keys = late.select(F.col("l_orderkey").alias("o_orderkey")).distinct()
    return (
        o.join(late_keys, on="o_orderkey", how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


def q7_volume_shipping(spark, sf_dir):
    """TPC-H q7: bilateral shipping volume between two nations by year.
    Dimension joins (supplier/customer/nation) broadcast; the only big
    shuffle is lineitem->orders."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


ORACLE_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {_money_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q8_market_share(spark, sf_dir):
    """TPC-H q8 adapted: NATION_5 suppliers' share of PROMO-part revenue to
    customers in region REGION_1, by order year. Ratio of two exact
    integer-cent sums (engine-independent)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .where((F.col("p_type") == "PROMO") & (F.col("r_name") == "REGION_1"))
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    nation_cents = F.when(F.col("supp_nation") == "NATION_5", cents).otherwise(F.lit(0).cast("long"))
    return (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.sum(nation_cents).alias("__n"),
            F.sum(cents).alias("__t"),
        )
        .select(
            "o_year",
            F.round(F.col("__n").cast("double") / F.col("__t").cast("double"), 6).alias("mkt_share"),
        )
    )


ORACLE_Q8 = """
WITH base AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT) AS cents,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  WHERE p_type = 'PROMO' AND r_name = 'REGION_1'
)
SELECT o_year,
       round(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END) AS DOUBLE)
             / CAST(SUM(cents) AS DOUBLE), 6) AS mkt_share
FROM base GROUP BY o_year
"""


def q14_promo_revenue(spark, sf_dir):
    """TPC-H q14: fraction of revenue from PROMO parts in one shipdate year."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(F.year("l_shipdate") == 1997)
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0).cast("long"))
    return j.agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(cents).cast("double"), 6
        ).alias("promo_revenue_pct")
    )


ORACLE_Q14 = """
SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)
                 ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE), 6)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE year(l_shipdate) = 1997
"""


def q18_large_orders(spark, sf_dir):
    """TPC-H q18: orders whose total quantity exceeds a threshold, with the
    customer. Quantity sums as exact integers; HAVING via post-agg filter."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice"),
            F.col("sum_qty"),
        )
    )


ORACLE_Q18 = """
SELECT c_name, o_orderkey, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q16_supplier_variety(spark, sf_dir):
    """TPC-H q16 adapted (no partsupp table): distinct suppliers who shipped
    each (brand, size), excluding one brand — the distinct-agg shape (Spark
    expands to a two-phase partial aggregation)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).where(
        F.col("p_brand") != "Brand#1"
    )
    return j.groupBy("p_brand", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


ORACLE_Q16 = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY p_brand, p_size
"""


def q19_brand_revenue(spark, sf_dir):
    """TPC-H q19 adapted (no container column): revenue under an OR of
    brand/size/quantity conjunctions — the disjunctive-pushdown shape."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).where(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
    )
    return j.agg(
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_Q19 = f"""
SELECT {_money_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity <= 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
"""


def geo_line_merge(spark, sf_dir):
    """ST_LineMerge: two touching segments sew into one chain, a detached
    segment stays separate — piece count and exact integer lengths are
    closed-form per row."""
    p = _t(spark, sf_dir, "part")
    a = "CAST(p_size AS DOUBLE)"
    ml = (
        f"ST_Collect(ST_Collect(ST_MakeLine(ST_Point(0.0, 0.0), ST_Point({a}, 0.0)), "
        f"ST_MakeLine(ST_Point({a}, 0.0), ST_Point({a}, 2.0))), "
        f"ST_MakeLine(ST_Point(100.0, 5.0), ST_Point(100.0, 9.0)))"
    )
    merged = f"ST_LineMerge({ml})"
    return (
        p.selectExpr("p_partkey", f"{merged} AS m")
        .selectExpr("p_partkey", "posexplode(ST_Dump(m)) AS (piece_idx, piece)")
        .selectExpr(
            "p_partkey",
            "CAST(piece_idx AS INT) AS piece_idx",
            "ST_Length(piece) AS piece_len",
            "ST_NPoints(piece) AS n_points",
        )
    )


ORACLE_GEO_LINE_MERGE = """
SELECT p_partkey, CAST(t.idx AS INT) AS piece_idx,
       CASE WHEN t.idx = 0 THEN CAST(p_size AS DOUBLE) + 2.0 ELSE 4.0 END AS piece_len,
       CAST(CASE WHEN t.idx = 0 THEN 3 ELSE 2 END AS BIGINT) AS n_points
FROM part CROSS JOIN (SELECT unnest([0, 1]) AS idx) t
"""


def geo_split_line(spark, sf_dir):
    """ST_Split + ST_Dump + ST_Length: split LINESTRING(0 0, 2s 0) at the
    point (s/2, 0); piece lengths are closed-form (s/2 and 1.5s, exact in
    doubles for integer s)."""
    p = _t(spark, sf_dir, "part")
    L = "CAST(p_size * 2 AS DOUBLE)"
    cut = "CAST(p_size AS DOUBLE) / 2.0"
    return (
        p.selectExpr(
            "p_partkey",
            f"ST_Split(ST_MakeLine(ST_Point(0.0, 0.0), ST_Point({L}, 0.0)), "
            f"ST_Point({cut}, 0.0)) AS pieces",
        )
        .selectExpr("p_partkey", "posexplode(ST_Dump(pieces)) AS (piece_idx, piece)")
        .selectExpr(
            "p_partkey",
            "CAST(piece_idx AS INT) AS piece_idx",
            "ST_Length(piece) AS piece_len",
        )
    )


ORACLE_GEO_SPLIT = """
SELECT p_partkey, CAST(t.idx AS INT) AS piece_idx,
       CASE WHEN t.idx = 0 THEN CAST(p_size AS DOUBLE) / 2.0
            ELSE CAST(p_size * 2 AS DOUBLE) - CAST(p_size AS DOUBLE) / 2.0
       END AS piece_len
FROM part CROSS JOIN (SELECT unnest([0, 1]) AS idx) t
"""


def geo_snap_points(spark, sf_dir):
    """ST_Snap to a per-row reference vertex: the point (acctbal, k) snaps
    to (round(acctbal), k) iff the distance is within tolerance 0.3 —
    closed-form mirror with identical HALF_UP rounding in both engines."""
    c = _t(spark, sf_dir, "customer")
    y = "CAST(c_custkey % 450 AS DOUBLE)"
    snapped = (
        f"ST_Snap(ST_Point(c_acctbal, {y}), "
        f"ST_Point(CAST(round(c_acctbal, 0) AS DOUBLE), {y}), 0.3)"
    )
    return c.selectExpr(
        "c_custkey",
        f"ST_X({snapped}) AS sx",
        f"ST_Y({snapped}) AS sy",
    )


ORACLE_GEO_SNAP = """
SELECT c_custkey,
       CASE WHEN abs(c_acctbal - round(c_acctbal, 0)) <= 0.3
            THEN CAST(round(c_acctbal, 0) AS DOUBLE) ELSE c_acctbal
       END AS sx,
       CAST(c_custkey % 450 AS DOUBLE) AS sy
FROM customer
"""


def geo_subdivide(spark, sf_dir):
    """ST_Subdivide: a densified 8x2 rectangle (21 ring coords) bisected
    under a 12-vertex budget yields four 2x2 quarters — piece order, areas,
    and bounds are closed-form (integer-valued coords keep every clip and
    shoelace step exact)."""
    c = _t(spark, sf_dir, "customer")
    t = "CAST(c_custkey % 100 AS DOUBLE)"
    geom = f"ST_Densify(ST_MakeEnvelope({t}, 0.0, {t} + 8.0, 2.0), 1.0)"
    return (
        c.selectExpr("c_custkey", f"ST_Subdivide({geom}, 12) AS pieces")
        .selectExpr("c_custkey", "posexplode(ST_Dump(pieces)) AS (piece_idx, piece)")
        .selectExpr(
            "c_custkey",
            "CAST(piece_idx AS INT) AS piece_idx",
            "ST_Area(piece) AS piece_area",
            "ST_XMin(piece) AS piece_xmin",
        )
    )


ORACLE_GEO_SUBDIVIDE = """
SELECT c_custkey, CAST(t.idx AS INT) AS piece_idx, 4.0 AS piece_area,
       CAST(c_custkey % 100 AS DOUBLE) + 2.0 * t.idx AS piece_xmin
FROM customer CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS idx) t
"""


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H q2 shape adapted (no partsupp — supply edges come from
    lineitem, 'cost' is supplier acctbal): for each size-15 part, the
    supplier(s) in region REGION_0 with the maximum account balance.
    The correlated MAX subquery is a per-part aggregate joined back on
    exact double equality; dims broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") == 15)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "REGION_0")
    edges = l.select("l_partkey", "l_suppkey").distinct()
    cand = (
        edges.join(F.broadcast(p), edges.l_partkey == p.p_partkey)
        .join(F.broadcast(s), edges.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    best = cand.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.max("s_acctbal").alias("__max_bal")
    )
    return cand.join(
        best,
        (cand.p_partkey == best.__pk) & (cand.s_acctbal == best.__max_bal),
    ).select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")


ORACLE_Q2 = """
WITH edges AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name
  FROM edges
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND r_name = 'REGION_0'
)
SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name
FROM cand c
WHERE s_acctbal = (SELECT MAX(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
"""


def q9_product_profit(spark, sf_dir):
    """TPC-H q9 adapted (no ps_supplycost — cost modeled as
    0.6 * p_retailprice per unit): profit by supplier nation and order
    year for PROMO parts. The profit expression is floored to integer
    cents BEFORE summing so the aggregate is exact and order-free."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    cents = F.floor(amount * F.lit(100.0) + F.lit(0.5)).cast("long")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg((F.sum(cents).cast("double") / F.lit(100.0)).alias("sum_profit"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)
                            - 0.6 * p_retailprice * l_quantity) * 100.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 100.0 AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY n_name, year(o_orderdate)
"""


def q11_important_values(spark, sf_dir):
    """TPC-H q11 shape adapted (no partsupp — per-part traded value from
    NATION_4 suppliers' lineitems): parts whose value exceeds 0.1% of the
    total. HAVING against a scalar subquery = exact-cents agg broadcast
    back; the threshold comparison is integer arithmetic (cents * 10000 >
    total cents * 10), so no float boundary exists."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_4")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    base = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", cents.alias("__c"))
    )
    per_part = base.groupBy("l_partkey").agg(F.sum("__c").alias("__pc"))
    total = per_part.agg(F.sum("__pc").alias("__tc"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("__pc") * F.lit(10000) > F.col("__tc") * F.lit(10))
        .select(
            "l_partkey",
            (F.col("__pc").cast("double") / F.lit(100.0)).alias("part_value"),
        )
    )


ORACLE_Q11 = """
WITH base AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT) AS c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_4'
),
per_part AS (SELECT l_partkey, SUM(c) AS pc FROM base GROUP BY l_partkey)
SELECT l_partkey, CAST(pc AS DOUBLE) / 100.0 AS part_value
FROM per_part
WHERE pc * 10000 > (SELECT SUM(pc) FROM per_part) * 10
"""


def sim_kmeans_ivf_topk(spark, sf_dir):
    """ANN with LEARNED centroids: 2 Lloyd's iterations (exact decimal
    arithmetic, deterministic init), corpus partitioned by nearest centroid,
    nprobe=2, exact cosine rerank. The full training + probe + rerank
    pipeline is mirrored bit-exactly by the unrolled-CTE oracle."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    corpus = e.where(F.col("vec_id") >= 8)
    out = similarity.kmeans_ivf_topk(
        q, corpus, k=5, k_clusters=8, iters=2, nprobe=2
    )
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


def _lloyds_ctes(k_clusters: int, iters: int) -> list:
    """Shared CTE block replaying ``similarity.kmeans_train`` +
    ``assign_clusters`` bit-exactly in SQL. Assumes a CTE named ``corpus``
    (vec_id, embedding) is already defined; ends with ``af`` =
    (vid, cid) final assignments on the trained centroids ``cent{iters}``."""
    d2 = "SUM(CAST(round((av - cv) * (av - cv), 12) AS DECIMAL(38,12))) AS d2"
    ctes = [
        f"""cent0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, embedding AS cvec
  FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT {k_clusters})
)""",
        """vals AS (
  SELECT vec_id AS vid, unnest(embedding)::DOUBLE AS val,
         unnest(range(len(embedding))) AS dim
  FROM corpus
)""",
    ]
    for i in range(iters):
        ctes += [
            f"""t{i} AS (
  SELECT c.vec_id AS vid, kk.cid,
         unnest(c.embedding)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM corpus c CROSS JOIN cent{i} kk
)""",
            f"d{i} AS (SELECT vid, cid, {d2} FROM t{i} GROUP BY vid, cid)",
            f"""a{i} AS (
  SELECT vid, cid FROM (
    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
    FROM d{i}
  ) WHERE rn = 1
)""",
            f"""cent{i + 1} AS (
  SELECT cid, list(cval ORDER BY dim) AS cvec FROM (
    SELECT a.cid, v.dim,
           CAST(SUM(CAST(round(v.val, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS cval
    FROM a{i} a JOIN vals v ON a.vid = v.vid
    GROUP BY a.cid, v.dim
  ) GROUP BY cid
)""",
        ]
    fin = iters
    ctes += [
        f"""tf AS (
  SELECT c.vec_id AS vid, kk.cid,
         unnest(c.embedding)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM corpus c CROSS JOIN cent{fin} kk
)""",
        f"df_ AS (SELECT vid, cid, {d2} FROM tf GROUP BY vid, cid)",
        """af AS (
  SELECT vid, cid FROM (
    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
    FROM df_
  ) WHERE rn = 1
)""",
    ]
    return ctes


def _kmeans_ivf_oracle_sql(k_clusters=8, iters=2, nprobe=2, k=5):
    """Unrolled fixed-iteration Lloyd's in plain SQL: every Spark stage
    (decimal distances, argmin with cid tie-break, exact-sum/count means,
    probe, rerank) has a textually parallel CTE."""
    d2 = "SUM(CAST(round((av - cv) * (av - cv), 12) AS DECIMAL(38,12))) AS d2"
    fin = iters
    ctes = [
        "corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8)",
        "qs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8)",
    ]
    ctes += _lloyds_ctes(k_clusters, iters)
    ctes += [
        f"""qt AS (
  SELECT q.vec_id AS qid, kk.cid,
         unnest(q.embedding)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM qs q CROSS JOIN cent{fin} kk
)""",
        f"qd AS (SELECT qid, cid, {d2} FROM qt GROUP BY qid, cid)",
        f"""probe AS (
  SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn
    FROM qd
  ) WHERE rn <= {nprobe}
)""",
        "cands AS (SELECT p.qid, a.vid FROM probe p JOIN af a ON p.cid = a.cid)",
        f"""ranked AS (
  SELECT c.qid AS query_id, c.vid AS neighbor_id,
         {_inorder_cosine_sql('q.embedding', 'e.embedding')} AS cosine
  FROM cands c
  JOIN qs q ON c.qid = q.vec_id
  JOIN corpus e ON c.vid = e.vec_id
)""",
    ]
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM ranked
) WHERE rn <= {k}
"""
    )


ORACLE_SIM_KMEANS_IVF = _kmeans_ivf_oracle_sql()


def sim_binary_hamming_topk(spark, sf_dir):
    """Binary sign-bit retrieval (similarity.binary_hamming_topk): 64-dim
    embeddings pack into ONE int64 word, candidates rank by
    bit_count(q XOR c) — all codegen, 8 bytes/vector at scale. Strict
    oracle: DuckDB replays the sign pack and Hamming rank with identical
    (hamming asc, neighbor_id asc) determinism."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    corpus = e.where(F.col("vec_id") >= 8)
    out = similarity.binary_hamming_topk(q, corpus, k=5)
    return out.select(
        "query_id", "neighbor_id", "hamming", F.col("rank").cast("int").alias("rank")
    )


def _sign_pack_sql(v: str, word: int) -> str:
    """32-bit sign-pack word (mirrors similarity.sign_pack_expr): BIGINT
    shifts never exceed 1<<31, safe in any engine."""
    off = 32 * word
    return (
        f"COALESCE(list_sum(list_transform(range(0, 32), "
        f"i -> CASE WHEN {off} + i < len({v}) AND {v}[{off} + CAST(i AS INT) + 1] > 0.0 "
        f"THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE CAST(0 AS BIGINT) END)), 0)"
    )


ORACLE_SIM_BINARY_HAMMING = f"""
WITH q AS (
  SELECT vec_id AS query_id,
         {_sign_pack_sql('embedding', 0)} AS qw0,
         {_sign_pack_sql('embedding', 1)} AS qw1
  FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT vec_id AS neighbor_id,
         {_sign_pack_sql('embedding', 0)} AS cw0,
         {_sign_pack_sql('embedding', 1)} AS cw1
  FROM embeddings WHERE vec_id >= 8
),
scored AS (
  SELECT query_id, neighbor_id,
         CAST(bit_count(xor(CAST(qw0 AS BIGINT), CAST(cw0 AS BIGINT)))
              + bit_count(xor(CAST(qw1 AS BIGINT), CAST(cw1 AS BIGINT))) AS INT) AS hamming
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, hamming,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY hamming ASC, neighbor_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= 5
"""


def sim_binary_recall(spark, sf_dir):
    """Retrieval-quality evaluation: recall@5 of the binary sign-bit
    Hamming shortlist against the exact float-cosine top-5 per query (the
    measurement that justifies using the 32x-compressed first stage). A
    k-row equi-join of two top-k tables — evaluation never touches the
    corpus a second time. Oracle replays both rankers and the overlap."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    corpus = e.where(F.col("vec_id") >= 8)
    ham = similarity.binary_hamming_topk(q, corpus, k=5).select(
        "query_id", "neighbor_id"
    )
    ex = similarity.cosine_topk(q, corpus, k=5).select("query_id", "neighbor_id")
    hits = ham.join(ex, ["query_id", "neighbor_id"]).groupBy("query_id").count()
    return (
        q.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("count"), F.lit(0)) / F.lit(5.0)).alias("recall_at_5"),
        )
    )


ORACLE_SIM_BINARY_RECALL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe,
         {_sign_pack_sql('embedding', 0)} AS qw0,
         {_sign_pack_sql('embedding', 1)} AS qw1
  FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS ce,
         {_sign_pack_sql('embedding', 0)} AS cw0,
         {_sign_pack_sql('embedding', 1)} AS cw1
  FROM embeddings WHERE vec_id >= 8
),
ham AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY bit_count(xor(CAST(qw0 AS BIGINT), CAST(cw0 AS BIGINT)))
                      + bit_count(xor(CAST(qw1 AS BIGINT), CAST(cw1 AS BIGINT))) ASC,
                      neighbor_id ASC) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= 5
),
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY {_inorder_cosine_sql('qe', 'ce')} DESC, neighbor_id ASC) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= 5
),
hits AS (
  SELECT h.query_id, COUNT(*) AS n
  FROM ham h JOIN ex e ON h.query_id = e.query_id AND h.neighbor_id = e.neighbor_id
  GROUP BY h.query_id
)
SELECT q.query_id, COALESCE(hits.n, 0) / 5.0 AS recall_at_5
FROM q LEFT JOIN hits ON q.query_id = hits.query_id
"""


def sim_quantized_topk(spark, sf_dir):
    """int8 scalar-quantized brute-force top-k: per-dim max-abs scales
    from the corpus, symmetric round-to-127 encode, EXACT int64 dot
    products (no float accumulation anywhere in the score), quantized
    cosine rank. Oracle replays scale/encode/score in list SQL."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    corpus = e.where(F.col("vec_id") >= 8)
    out = similarity.quantized_topk(q, corpus, k=5)
    return out.select(
        "query_id", "neighbor_id", "qcosine", F.col("rank").cast("int").alias("rank")
    )


def _qdot_sql(a: str, b: str) -> str:
    return (
        f"COALESCE(list_sum(list_transform(range(0, len({a})), "
        f"i -> CAST({a}[CAST(i AS INT) + 1] AS BIGINT) * "
        f"CAST({b}[CAST(i AS INT) + 1] AS BIGINT))), 0)"
    )


_QENC = (
    "list_transform(range(0, len({v})), i -> CASE "
    "WHEN ma[CAST(i AS INT) + 1] > 0 THEN "
    "CAST(round(CAST({v}[CAST(i AS INT) + 1] AS DOUBLE) / ma[CAST(i AS INT) + 1] * 127.0, 0) AS INT) "
    "ELSE 0 END)"
)

ORACLE_SIM_QUANTIZED = f"""
WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
ex AS (
  SELECT unnest(range(len(embedding))) AS dim,
         abs(unnest(embedding)::DOUBLE) AS val
  FROM c
),
am AS (SELECT dim, MAX(val) AS m FROM ex GROUP BY dim),
amax AS (SELECT list(m ORDER BY dim) AS ma FROM am),
qq AS (
  SELECT vec_id AS query_id, {_QENC.format(v='embedding')} AS qv
  FROM q CROSS JOIN amax
),
cq AS (
  SELECT vec_id AS neighbor_id, {_QENC.format(v='embedding')} AS cv
  FROM c CROSS JOIN amax
),
scored AS (
  SELECT query_id, neighbor_id,
         round(CASE WHEN sqrt(CAST({_qdot_sql('qv', 'qv')} AS DOUBLE))
                         * sqrt(CAST({_qdot_sql('cv', 'cv')} AS DOUBLE)) > 0
                    THEN CAST({_qdot_sql('qv', 'cv')} AS DOUBLE)
                         / (sqrt(CAST({_qdot_sql('qv', 'qv')} AS DOUBLE))
                            * sqrt(CAST({_qdot_sql('cv', 'cv')} AS DOUBLE)))
                    ELSE 0.0 END, 8) AS qcosine
  FROM qq CROSS JOIN cq
)
SELECT query_id, neighbor_id, qcosine, CAST(rn AS INT) AS rank FROM (
  SELECT query_id, neighbor_id, qcosine,
         row_number() OVER (PARTITION BY query_id ORDER BY qcosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= 5
"""


def sim_hard_negatives(spark, sf_dir):
    """Contrastive-pair mining: for each query vector, the nearest
    SAME-label corpus vector (positive) and the nearest DIFFERENT-label
    vector (hard negative) by cosine — the batch construction step for
    contrastive/embedding training. One broadcast scan, two label-
    filtered argmax windows; in-order fold keeps scores engine-exact."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("__ql"),
        F.col("embedding").alias("__qv"),
        F.sqrt(similarity.dot_inorder_expr(F.col("embedding"), F.col("embedding"))).alias("__qn"),
    )
    c = e.where(F.col("vec_id") >= 8).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("__cl"),
        F.col("embedding").alias("__cv"),
        F.sqrt(similarity.dot_inorder_expr(F.col("embedding"), F.col("embedding"))).alias("__cn"),
    )
    den = F.col("__qn") * F.col("__cn")
    num = similarity.dot_inorder_expr(F.col("__qv"), F.col("__cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        (F.col("__cl") == F.col("__ql")).alias("__same"),
        F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), 8).alias("cosine"),
    )
    w = Window.partitionBy("query_id", "__same").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    best = scored.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    return best.select(
        "query_id",
        F.when(F.col("__same"), F.lit("positive")).otherwise(F.lit("hard_negative")).alias("pair_type"),
        "neighbor_id",
        "cosine",
    )


ORACLE_SIM_HARD_NEGATIVES = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS ql, embedding AS qe
  FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT vec_id AS neighbor_id, label AS cl, embedding AS ce
  FROM embeddings WHERE vec_id >= 8
),
scored AS (
  SELECT query_id, neighbor_id, (cl = ql) AS same,
         {_inorder_cosine_sql('qe', 'ce')} AS cosine
  FROM c CROSS JOIN q
),
best AS (
  SELECT query_id, same, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id, same
                            ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id,
       CASE WHEN same THEN 'positive' ELSE 'hard_negative' END AS pair_type,
       neighbor_id, cosine
FROM best WHERE rn = 1
"""


def sim_text_hash_retrieval(spark, sf_dir):
    """Model-free text retrieval end to end: documents feature-hash to
    dim-32 INTEGER vectors (text.hash_embed — the hashing trick, exact
    arithmetic), then cosine top-5 with exact int64 dot products. The
    text->vector->ANN bridge with no floats anywhere until the final
    cosine division."""
    d = _t(spark, sf_dir, "documents")
    vecs = text.hash_embed(d, dim=32)
    q = vecs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("hvec").alias("__qv")
    )
    c = vecs.where(F.col("doc_id") >= 3).select(
        F.col("doc_id").alias("neighbor_id"), F.col("hvec").alias("__cv")
    )
    idot = similarity._int_dot_expr
    den = F.sqrt(idot(F.col("__qv"), F.col("__qv")).cast("double")) * F.sqrt(
        idot(F.col("__cv"), F.col("__cv")).cast("double")
    )
    num = idot(F.col("__qv"), F.col("__cv")).cast("double")
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), 8).alias("hcosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hcosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 5)
    )


_HE_B = "CAST(concat('0x', substr(md5(concat('he:', w)), 1, 8)) AS BIGINT) % 32"
_HE_S = (
    "CASE WHEN CAST(concat('0x', substr(md5(concat('he:', w)), 9, 1)) AS INT) >= 8 "
    "THEN -1 ELSE 1 END"
)

ORACLE_SIM_TEXT_HASH = f"""
WITH wt AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS w
  FROM documents
),
hb AS (SELECT doc_id, {_HE_B} AS b, {_HE_S} AS s FROM wt),
sums AS (SELECT doc_id, b, SUM(s) AS v FROM hb GROUP BY doc_id, b),
grid AS (
  SELECT d.doc_id, unnest(range(0, 32)) AS i
  FROM (SELECT DISTINCT doc_id FROM sums) d
),
vecs AS (
  SELECT g.doc_id, list(COALESCE(s.v, 0) ORDER BY g.i) AS hv
  FROM grid g LEFT JOIN sums s ON g.doc_id = s.doc_id AND g.i = s.b
  GROUP BY g.doc_id
),
q AS (SELECT doc_id AS query_id, hv AS qv FROM vecs WHERE doc_id < 3),
c AS (SELECT doc_id AS neighbor_id, hv AS cv FROM vecs WHERE doc_id >= 3),
scored AS (
  SELECT query_id, neighbor_id,
         round(CASE WHEN sqrt(CAST({_qdot_sql('qv', 'qv')} AS DOUBLE))
                         * sqrt(CAST({_qdot_sql('cv', 'cv')} AS DOUBLE)) > 0
                    THEN CAST({_qdot_sql('qv', 'cv')} AS DOUBLE)
                         / (sqrt(CAST({_qdot_sql('qv', 'qv')} AS DOUBLE))
                            * sqrt(CAST({_qdot_sql('cv', 'cv')} AS DOUBLE)))
                    ELSE 0.0 END, 8) AS hcosine
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, hcosine, CAST(rn AS INT) AS rank FROM (
  SELECT query_id, neighbor_id, hcosine,
         row_number() OVER (PARTITION BY query_id ORDER BY hcosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= 5
"""


def sim_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over the embeddings table: k-means
    partitions the space (2 exact Lloyd's iterations), cosine pairs are
    generated ONLY within clusters, and a row is dropped when cosine to a
    lower-id cluster-mate >= 0.35 (keep-first). The oracle replays
    training, assignment, and the pairwise threshold in unrolled CTEs."""
    e = _t(spark, sf_dir, "embeddings")
    out = similarity.semantic_dedup(
        e, k_clusters=8, iters=2, threshold=0.35
    )
    return out.select("vec_id", F.col("cid").cast("bigint").alias("cid"), "kept")


def _semantic_dedup_oracle_sql(k_clusters=8, iters=2, threshold=0.35):
    ctes = ["corpus AS (SELECT vec_id, embedding FROM embeddings)"]
    ctes += _lloyds_ctes(k_clusters, iters)
    ctes += [
        f"""pairs AS (
  SELECT a.vid AS aid, b.vid AS bid
  FROM af a JOIN af b ON a.cid = b.cid AND a.vid < b.vid
  JOIN corpus ca ON a.vid = ca.vec_id
  JOIN corpus cb ON b.vid = cb.vec_id
  WHERE {_inorder_cosine_sql('ca.embedding', 'cb.embedding')} >= {threshold}
)""",
        "dups AS (SELECT DISTINCT bid FROM pairs)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + """
SELECT af.vid AS vec_id, af.cid, (dups.bid IS NULL) AS kept
FROM af LEFT JOIN dups ON af.vid = dups.bid
"""
    )


ORACLE_SIM_SEMANTIC_DEDUP = _semantic_dedup_oracle_sql()


def sim_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN (similarity.ivfpq_topk): learned coarse cells prune to
    nprobe=2, product-quantization codes (m=4 subspaces x 8 codes, 2
    Lloyd's iterations each, exact decimal arithmetic) score candidates
    by asymmetric distance — candidates are shuffled as 4 ints, never as
    64 floats. Training, encoding, distance tables, and ADC ranking are
    all mirrored bit-exactly by the unrolled-CTE oracle."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    corpus = e.where(F.col("vec_id") >= 8)
    out = similarity.ivfpq_topk(
        q, corpus, k=5, k_clusters=8, iters=2, nprobe=2,
        m=4, k_codes=8, pq_iters=2, dim=64,
    )
    return out.select(
        "query_id", "neighbor_id", "adc_d2", F.col("rank").cast("int").alias("rank")
    )


def _ivfpq_oracle_sql(k_clusters=8, iters=2, nprobe=2, m=4, k_codes=8,
                      pq_iters=2, dim=64, k=5):
    """The _kmeans_ivf_oracle_sql coarse chain + a textually parallel CTE
    per PQ stage (subspace slices, per-subspace Lloyd's, encoding,
    distance tables, ADC sum)."""
    w = dim // m
    d2 = "SUM(CAST(round((av - cv) * (av - cv), 12) AS DECIMAL(38,12))) AS d2"
    sgen = f"(SELECT unnest(range({m})) AS s)"
    ctes = [
        "corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8)",
        "qs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8)",
        f"""cent0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, embedding AS cvec
  FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT {k_clusters})
)""",
        """vals AS (
  SELECT vec_id AS vid, unnest(embedding)::DOUBLE AS val,
         unnest(range(len(embedding))) AS dim
  FROM corpus
)""",
    ]
    for i in range(iters):
        ctes += [
            f"""t{i} AS (
  SELECT c.vec_id AS vid, kk.cid,
         unnest(c.embedding)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM corpus c CROSS JOIN cent{i} kk
)""",
            f"d{i} AS (SELECT vid, cid, {d2} FROM t{i} GROUP BY vid, cid)",
            f"""a{i} AS (
  SELECT vid, cid FROM (
    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
    FROM d{i}
  ) WHERE rn = 1
)""",
            f"""cent{i + 1} AS (
  SELECT cid, list(cval ORDER BY dim) AS cvec FROM (
    SELECT a.cid, v.dim,
           CAST(SUM(CAST(round(v.val, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS cval
    FROM a{i} a JOIN vals v ON a.vid = v.vid
    GROUP BY a.cid, v.dim
  ) GROUP BY cid
)""",
        ]
    fin = iters
    ctes += [
        f"""tf AS (
  SELECT c.vec_id AS vid, kk.cid,
         unnest(c.embedding)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM corpus c CROSS JOIN cent{fin} kk
)""",
        f"df_ AS (SELECT vid, cid, {d2} FROM tf GROUP BY vid, cid)",
        """af AS (
  SELECT vid, cid FROM (
    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
    FROM df_
  ) WHERE rn = 1
)""",
        f"""qt AS (
  SELECT q.vec_id AS qid, kk.cid,
         unnest(q.embedding)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM qs q CROSS JOIN cent{fin} kk
)""",
        f"qd AS (SELECT qid, cid, {d2} FROM qt GROUP BY qid, cid)",
        f"""probe AS (
  SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn
    FROM qd
  ) WHERE rn <= {nprobe}
)""",
        "cands AS (SELECT p.qid, a.vid FROM probe p JOIN af a ON p.cid = a.cid)",
        # ---- product quantization ----
        f"""subs AS (
  SELECT c.vec_id AS vid, s.s AS s,
         c.embedding[s.s * {w} + 1 : s.s * {w} + {w}] AS sv
  FROM corpus c CROSS JOIN {sgen} s
)""",
        f"""pc0 AS (
  SELECT s.s AS s,
         CAST(row_number() OVER (PARTITION BY s.s ORDER BY b.vec_id) - 1 AS INT) AS code,
         b.embedding[s.s * {w} + 1 : s.s * {w} + {w}] AS cvec
  FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT {k_codes}) b
  CROSS JOIN {sgen} s
)""",
        """psvals AS (
  SELECT vid, s, unnest(sv)::DOUBLE AS val, unnest(range(len(sv))) AS dim
  FROM subs
)""",
    ]
    for i in range(pq_iters):
        ctes += [
            f"""pt{i} AS (
  SELECT sub.vid, sub.s, kk.code,
         unnest(sub.sv)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM subs sub JOIN pc{i} kk ON sub.s = kk.s
)""",
            f"pd{i} AS (SELECT vid, s, code, {d2} FROM pt{i} GROUP BY vid, s, code)",
            f"""pa{i} AS (
  SELECT vid, s, code FROM (
    SELECT vid, s, code,
           row_number() OVER (PARTITION BY vid, s ORDER BY d2, code) AS rn
    FROM pd{i}
  ) WHERE rn = 1
)""",
            f"""pc{i + 1} AS (
  SELECT s, code, list(cval ORDER BY dim) AS cvec FROM (
    SELECT a.s, a.code, v.dim,
           CAST(SUM(CAST(round(v.val, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS cval
    FROM pa{i} a JOIN psvals v ON a.vid = v.vid AND a.s = v.s
    GROUP BY a.s, a.code, v.dim
  ) GROUP BY s, code
)""",
        ]
    pf = pq_iters
    ctes += [
        f"""ptf AS (
  SELECT sub.vid, sub.s, kk.code,
         unnest(sub.sv)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM subs sub JOIN pc{pf} kk ON sub.s = kk.s
)""",
        f"pdf_ AS (SELECT vid, s, code, {d2} FROM ptf GROUP BY vid, s, code)",
        """paf AS (
  SELECT vid, s, code FROM (
    SELECT vid, s, code,
           row_number() OVER (PARTITION BY vid, s ORDER BY d2, code) AS rn
    FROM pdf_
  ) WHERE rn = 1
)""",
        f"""qsubs AS (
  SELECT q.vec_id AS qid, s.s AS s,
         q.embedding[s.s * {w} + 1 : s.s * {w} + {w}] AS sv
  FROM qs q CROSS JOIN {sgen} s
)""",
        f"""dtt AS (
  SELECT qq.qid, qq.s, kk.code,
         unnest(qq.sv)::DOUBLE AS av, unnest(kk.cvec)::DOUBLE AS cv
  FROM qsubs qq JOIN pc{pf} kk ON qq.s = kk.s
)""",
        f"dt AS (SELECT qid, s, code, {d2} FROM dtt GROUP BY qid, s, code)",
        """sc AS (
  SELECT c.qid, c.vid, round(CAST(SUM(dt.d2) AS DOUBLE), 8) AS adc_d2
  FROM cands c
  JOIN paf p ON p.vid = c.vid
  JOIN dt ON dt.qid = c.qid AND dt.s = p.s AND dt.code = p.code
  GROUP BY c.qid, c.vid
)""",
    ]
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT qid AS query_id, vid AS neighbor_id, adc_d2, CAST(rn AS INT) AS rank FROM (
  SELECT qid, vid, adc_d2,
         row_number() OVER (PARTITION BY qid ORDER BY adc_d2, vid) AS rn
  FROM sc
) WHERE rn <= {k}
"""
    )


ORACLE_SIM_IVFPQ = _ivfpq_oracle_sql()


def q13_customer_distribution(spark, sf_dir):
    """TPC-H q13 adapted (no o_comment — the excluded-orders predicate is
    on priority instead): distribution of per-customer order counts via a
    LEFT OUTER join with a compound ON condition, then a second groupBy.
    Both aggregations are pure count shuffles with map-side combine."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            on=[c.c_custkey == o.o_custkey, o.o_orderpriority != "1-URGENT"],
            how="left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
"""


def q15_top_supplier(spark, sf_dir):
    """TPC-H q15: supplier(s) with the maximum quarterly revenue. The view
    is one groupBy over lineitem; the scalar MAX is a 1-row broadcast join
    (no second scan of lineitem), and revenue is compared in exact integer
    cents so the equality is engine-independent."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-04-01"))
    )
    s = _t(spark, sf_dir, "supplier")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    rev = l.groupBy("l_suppkey").agg(F.sum(cents).alias("__cents"))
    top = rev.agg(F.max("__cents").alias("__max_cents"))
    return (
        rev.join(F.broadcast(top), rev.__cents == top.__max_cents)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("__cents").cast("double") / F.lit(100.0)).alias("total_revenue"),
        )
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(cents AS DOUBLE) / 100.0 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE cents = (SELECT MAX(cents) FROM revenue)
"""


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H q17 adapted (no p_container — brand-only filter): yearly
    revenue lost to small orders. The correlated AVG subquery becomes a
    per-part groupBy joined back to lineitem; l_quantity is integer-valued
    so the average (= exact integer sum / count) is engine-independent."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    part_avg = (
        l.groupBy("l_partkey").agg(F.avg("l_quantity").alias("__avg_qty"))
    )
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(part_avg.withColumnRenamed("l_partkey", "__pk"), F.col("p_partkey") == F.col("__pk"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty"))
    )
    cents = F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
    return j.agg(
        (F.sum(cents).cast("double") / F.lit(700.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


ORACLE_Q17 = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 700.0 AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < 0.2 * (
    SELECT AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


def q21_sole_fault_supplier(spark, sf_dir):
    """TPC-H q21 adapted (no commit/receipt dates — the 'fault' signal is
    l_returnflag = 'R'): suppliers who were the ONLY supplier with a
    returned item on a multi-supplier finalized order. EXISTS -> left-semi
    join, NOT EXISTS -> left-anti join; both are equi-joins on l_orderkey
    (shuffle-partitioned, no row duplication, AQE-skew-safe)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    l1 = l.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    others = l.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    others_r = l.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r2_orderkey"), F.col("l_suppkey").alias("r2_suppkey")
    )
    cand = (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            others_r,
            (F.col("l_orderkey") == F.col("r2_orderkey"))
            & (F.col("l_suppkey") != F.col("r2_suppkey")),
            "left_anti",
        )
    )
    return (
        cand.join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


ORACLE_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l1.l_returnflag = 'R'
  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND EXISTS (
    SELECT 1 FROM orders WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
  )
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
"""


def q22_idle_customers(spark, sf_dir):
    """TPC-H q22 adapted (no phone column — country code is c_nationkey;
    every customer has orders, so the anti-join excludes customers with any
    URGENT order): wealthy-but-idle customer summary. The scalar AVG is an
    explicit exact-cents ratio broadcast to the probe side; NOT EXISTS is a
    left-anti equi-join."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_nationkey") < 10)
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("c_acctbal") * F.lit(100.0) + F.lit(0.5)).cast("long")
    thresh = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(cents).cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(100.0))
            ).alias("__avg_bal")
        )
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("__uk")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("__uk"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _money_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


ORACLE_Q22 = f"""
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       {_money_sum_sql('c_acctbal', 'totacctbal')}
FROM customer
WHERE c_nationkey < 10
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / (CAST(COUNT(*) AS DOUBLE) * 100.0)
    FROM customer WHERE c_acctbal > 0.0 AND c_nationkey < 10
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""


def q20_dominant_suppliers(spark, sf_dir):
    """TPC-H q20 adapted (no partsupp/availqty — the 'excess stock' signal
    becomes shipped-share dominance): suppliers in NATION_1x who, for some
    red part, shipped MORE THAN HALF of that part's 1997 volume. The nested
    IN subqueries become two aggregations over ONE scan of the filtered
    lineitem (per-part totals are re-aggregated from the per-pair partials,
    not a second scan) and a left-semi join; the part filter is broadcast.
    l_quantity is integer-valued, so 2*pair > total is exact BIGINT math.

    Reference shape: TPC-H q20 (nested IN + correlated half-of-volume
    threshold)."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    pairs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("__pair_qty"))
    )
    totals = pairs.groupBy(F.col("l_partkey").alias("__tp")).agg(
        F.sum("__pair_qty").alias("__part_qty")
    )
    dominant = (
        pairs.join(totals, pairs.l_partkey == F.col("__tp"))
        .where(F.lit(2) * F.col("__pair_qty") > F.col("__part_qty"))
        .select(F.col("l_suppkey").alias("__dk"))
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name").startswith("NATION_1"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(dominant, s.s_suppkey == F.col("__dk"), "left_semi")
        .select("s_name", "s_acctbal")
    )


ORACLE_Q20 = """
WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
pairs AS (
  SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM red)
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
),
tot AS (SELECT l_partkey, SUM(q) AS pq FROM pairs GROUP BY l_partkey)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name LIKE 'NATION_1%'
  AND s_suppkey IN (
    SELECT p2.l_suppkey FROM pairs p2 JOIN tot USING (l_partkey)
    WHERE 2 * p2.q > pq
  )
"""


# ---------------------------------------------------------------------------
# corpus pipeline: decontamination / packing / BM25 / C4 cleaning
# ---------------------------------------------------------------------------

_NG3 = (
    "CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws) - 1), "
    "i -> array_to_string(ws[i:i+2], ' ')) ELSE []::VARCHAR[] END"
)


def pipe_decontaminate(spark, sf_dir):
    """Benchmark decontamination: every 23rd doc is the held-out eval set;
    flag training docs whose distinct word-3-gram overlap with it exceeds
    5% (exact integer ppm — no float rounding anywhere)."""
    from .datapipe import corpus

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 23 == 0)
    corp = docs.where(F.col("doc_id") % 23 != 0)
    return corpus.decontaminate(corp, bench, n=3, threshold_ppm=50000)


ORACLE_DECONTAM = f"""
WITH corp AS (
  SELECT doc_id, list_distinct({_NG3}) AS gs
  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents WHERE doc_id % 23 <> 0)
),
bench AS (
  SELECT DISTINCT unnest({_NG3}) AS g
  FROM (SELECT string_split(text, ' ') AS ws
        FROM documents WHERE doc_id % 23 = 0)
),
ex AS (SELECT doc_id, unnest(gs) AS g FROM corp),
hits AS (
  SELECT e.doc_id, COUNT(b.g) AS n_hits
  FROM ex e LEFT JOIN bench b ON e.g = b.g GROUP BY e.doc_id
)
SELECT c.doc_id,
       CAST(len(c.gs) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CASE WHEN len(c.gs) > 0
            THEN CAST(COALESCE(h.n_hits, 0) * 1000000 // len(c.gs) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS overlap_ppm,
       COALESCE(h.n_hits, 0) * 1000000 > 50000 * len(c.gs) AS contaminated
FROM corp c LEFT JOIN hits h ON c.doc_id = h.doc_id
"""


def pipe_pack_bins(spark, sf_dir):
    """Greedy sequence packing into 2048-token training bins, sharded 8
    ways so the packing window parallelizes; per-bin integer fill stats."""
    from .datapipe import corpus

    docs = _t(spark, sf_dir, "documents")
    packed = corpus.pack_sequences(docs, target_tokens=2048, n_shards=8)
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


ORACLE_PACK = """
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT shard, doc_id, n_tokens,
         CAST(floor(CAST(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS DOUBLE) / 2048.0) AS BIGINT) AS bin
  FROM toks
)
SELECT shard, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM packed GROUP BY shard, bin
"""


_BM25_TERMS = ("spark", "join", "window")
_BM25_K1P1 = repr(1.2 + 1.0)  # k1 + 1 computed in doubles, not the literal 2.2


def text_bm25_topk(spark, sf_dir):
    """Top-20 documents by BM25 for a fixed bag-of-words query. Integer
    tf/df/dl stats, one broadcast corpus-stats row, fixed-order float
    combination rounded to 4 dp, ties broken by doc_id."""
    from .datapipe import corpus

    docs = _t(spark, sf_dir, "documents")
    return corpus.bm25_topk(docs, list(_BM25_TERMS), k=20)


def _bm25_oracle_sql() -> str:
    tf = ",\n         ".join(
        f"CAST(len(list_filter(ws, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    terms = "\n      + ".join(
        f"ln(1.0 + (CAST(N AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf{i} AS DOUBLE) * {_BM25_K1P1})"
        f" / (CAST(tf{i} AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)"
        f" / (CAST(L AS DOUBLE) / CAST(N AS DOUBLE))))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH base AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
         {tf}
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS N, CAST(SUM(dl) AS BIGINT) AS L,
         {df}
  FROM base
),
scored AS (
  SELECT doc_id, dl AS doc_len,
         round(0.0
      + {terms}, 4) AS bm25
  FROM base, stats
)
SELECT * FROM (
  SELECT doc_id, doc_len, bm25,
         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 20
"""


ORACLE_BM25 = _bm25_oracle_sql()


def text_c4_clean(spark, sf_dir):
    """C4-style line cleaning. The word-soup corpus has no newlines, so
    both engines first apply the SAME deterministic rewrite (' table ' ->
    '.' + newline) to synthesize sentence-ended lines, then the native
    higher-order line filter runs (terminal punctuation, >=3 words, no
    blocklisted phrase)."""
    from .datapipe import corpus

    docs = _t(spark, sf_dir, "documents")
    t2 = F.expr("replace(text, ' table ', concat('.', chr(10)))")
    c = corpus.c4_clean_lines(t2, min_words=3, blocklist=("javascript", "cookie policy"))
    return docs.select("doc_id", c.alias("__c")).select(
        "doc_id",
        F.col("__c.n_lines").alias("n_lines"),
        F.col("__c.n_kept").alias("n_kept"),
        F.col("__c.cleaned").alias("cleaned"),
    )


ORACLE_C4 = """
WITH lined AS (
  SELECT doc_id,
         string_split(replace(text, ' table ', '.' || chr(10)), chr(10)) AS lines
  FROM documents
),
cleaned AS (
  SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
         list_filter(lines, l ->
             (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
             AND len(list_filter(string_split(l, ' '), x -> x <> '')) >= 3
             AND NOT contains(lower(l), 'javascript')
             AND NOT contains(lower(l), 'cookie policy')) AS keep
  FROM lined
)
SELECT doc_id, n_lines, CAST(len(keep) AS BIGINT) AS n_kept,
       COALESCE(array_to_string(keep, chr(10)), '') AS cleaned
FROM cleaned
"""


def text_repetition(spark, sf_dir):
    """Gopher-style repetition signals (dup-line fraction, dup-line char
    fraction, top word/2-gram coverage) as exact integer ppm. The word-soup
    corpus has no newlines, so both engines apply the SAME deterministic
    rewrite first: split at ' table ' into '.'-terminated lines, then
    append a copy of the first line so every doc has a guaranteed duplicate
    line. Word tokens are split on single spaces only (tokens may embed the
    synthesized newline — identical on both engines)."""
    from .datapipe import corpus

    docs = _t(spark, sf_dir, "documents")
    t2 = F.expr("replace(text, ' table ', concat('.', chr(10)))")
    t3 = F.concat(t2, F.lit("\n"), F.substring_index(t2, "\n", 1))
    return corpus.repetition_stats(docs.select("doc_id", t3.alias("text")))


ORACLE_REPETITION = """
WITH d AS (
  SELECT doc_id, t2 || chr(10) || split_part(t2, chr(10), 1) AS text
  FROM (SELECT doc_id, replace(text, ' table ', '.' || chr(10)) AS t2
        FROM documents)
),
lined AS (
  SELECT doc_id, list_filter(string_split(text, chr(10)), x -> x <> '') AS L
  FROM d
),
line_stats AS (
  SELECT doc_id,
    CAST(len(L) AS BIGINT) AS n_lines,
    CAST(len(list_distinct(L)) AS BIGINT) AS n_dist,
    CAST(COALESCE(list_sum(list_transform(L, l -> length(l))), 0) AS BIGINT)
      AS total_chars,
    CAST(COALESCE(list_sum(list_transform(list_distinct(L), dl ->
        CASE WHEN len(list_filter(L, x -> x = dl)) > 1
             THEN len(list_filter(L, x -> x = dl)) * length(dl)
             ELSE 0 END)), 0) AS BIGINT) AS dup_chars
  FROM lined
),
wtok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM d
),
wcounts AS (SELECT doc_id, w, COUNT(*) AS c FROM wtok GROUP BY doc_id, w),
wtop AS (
  SELECT doc_id, CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top_word_ppm
  FROM wcounts GROUP BY doc_id
),
btok AS (
  SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
      THEN list_transform(range(1, len(ws)), i -> array_to_string(ws[i:i+1], ' '))
      ELSE []::VARCHAR[] END) AS b
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM d)
),
bcounts AS (SELECT doc_id, b, COUNT(*) AS c FROM btok GROUP BY doc_id, b),
btop AS (
  SELECT doc_id, CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top_bigram_ppm
  FROM bcounts GROUP BY doc_id
)
SELECT l.doc_id, l.n_lines,
  CASE WHEN n_lines > 0
       THEN CAST((n_lines - n_dist) * 1000000 // n_lines AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS dup_line_ppm,
  CASE WHEN total_chars > 0
       THEN CAST(dup_chars * 1000000 // total_chars AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS dup_line_char_ppm,
  COALESCE(w.top_word_ppm, 0) AS top_word_ppm,
  COALESCE(b.top_bigram_ppm, 0) AS top_bigram_ppm
FROM line_stats l
LEFT JOIN wtop w USING (doc_id)
LEFT JOIN btop b USING (doc_id)
"""


def geo_shape_metrics(spark, sf_dir):
    """Closed-form oracle coverage for six kernels that previously had only
    unit tests: Frechet/Hausdorff (parallel equal-length segments -> the
    vertical offset, exactly), Densify (axis-aligned line: npoints =
    ceil(L/d)+1, length preserved), MinimumRotatedRectangle of a rectangle
    (itself: area w*h, perimeter 2(w+h)), and Polylabel of a rectangle
    (the exact center — halves are exact doubles, so no rounding)."""
    p = _spread(_t(spark, sf_dir, "part"))
    L = "CAST(p_size % 7 + 2 AS DOUBLE)"
    k = "CAST(p_partkey % 9 + 1 AS DOUBLE)"
    w = "CAST(p_size % 5 + 1 AS DOUBLE)"
    h = "CAST(p_partkey % 4 + 1 AS DOUBLE)"
    la = f"ST_MakeLine(ST_Point(0.0, 0.0), ST_Point({L}, 0.0))"
    lb = f"ST_MakeLine(ST_Point(0.0, {k}), ST_Point({L}, {k}))"
    box = f"ST_MakeEnvelope(0.0, 0.0, {w}, {h})"
    # construct-once two-step select (same trick as geo_affine_parts):
    # shared geometries and the Densify/MRR derivations run once each
    staged = p.selectExpr(
        "p_partkey",
        "CAST(p_partkey % 11 AS DOUBLE) AS locx",
        f"{la} AS la",
        f"{lb} AS lb",
        f"ST_Densify({la}, 2.0) AS dens",
        f"ST_MinimumRotatedRectangle({box}) AS mrr",
        f"{box} AS box",
        f"ST_ChaikinSmoothing(ST_LineFromArrays(array(0.0, {w}, {w}), array(0.0, 0.0, {h})), 1) AS chaik",
    )
    return staged.selectExpr(
        "p_partkey",
        "ST_FrechetDistance(la, lb) AS frechet",
        "ST_HausdorffDistance(la, lb) AS hausdorff",
        "CAST(ST_NPoints(dens) AS BIGINT) AS dens_npoints",
        "ST_Length(dens) AS dens_length",
        "ST_Area(mrr) AS mrr_area",
        "ST_Perimeter(mrr) AS mrr_perim",
        # tol 0.25: still the exact center for rectangles (the first probe
        # wins); finer tolerances degenerate on the symmetric distance-field
        # ties of a rectangle (quadtree can't prune) — 100x slower, same
        # answer
        "ST_X(ST_Polylabel(box, 0.25)) AS pl_x",
        "ST_Y(ST_Polylabel(box, 0.25)) AS pl_y",
        # Chaikin on an open 3-point corner keeps endpoints and replaces
        # each segment with its 1/4-3/4 points: 2(n-1)+2 = 6 vertices
        "CAST(ST_NPoints(chaik) AS BIGINT) AS chaikin_npoints",
        # locate on a horizontal segment = clamp(x/L, 0, 1), exact division
        "ST_LineLocatePoint(la, ST_Point(locx, 5.0)) AS line_loc",
    )


ORACLE_GEO_SHAPE_METRICS = """
SELECT p_partkey,
       CAST(p_partkey % 9 + 1 AS DOUBLE) AS frechet,
       CAST(p_partkey % 9 + 1 AS DOUBLE) AS hausdorff,
       CAST(ceil(CAST(p_size % 7 + 2 AS DOUBLE) / 2.0) + 1 AS BIGINT) AS dens_npoints,
       CAST(p_size % 7 + 2 AS DOUBLE) AS dens_length,
       CAST(p_size % 5 + 1 AS DOUBLE) * CAST(p_partkey % 4 + 1 AS DOUBLE) AS mrr_area,
       2.0 * (CAST(p_size % 5 + 1 AS DOUBLE) + CAST(p_partkey % 4 + 1 AS DOUBLE)) AS mrr_perim,
       CAST(p_size % 5 + 1 AS DOUBLE) / 2.0 AS pl_x,
       CAST(p_partkey % 4 + 1 AS DOUBLE) / 2.0 AS pl_y,
       CAST(6 AS BIGINT) AS chaikin_npoints,
       LEAST(CAST(p_partkey % 11 AS DOUBLE), CAST(p_size % 7 + 2 AS DOUBLE))
         / CAST(p_size % 7 + 2 AS DOUBLE) AS line_loc
FROM part
"""


def geo_affine_parts(spark, sf_dir):
    """Closed-form oracles for the affine family and multi-part accessors
    (previously pytest-only): rotate-90-about-center bbox, translate
    offsets, scale-about-center area/extent, skew-about-center extent
    (tan via the same libm on both engines), ST_Collect/NumGeometries/
    GeometryN, boundary length of a box, RemoveRepeatedPoints counts.
    All params derive from part columns; results are exact halves/quarters
    except the rotation/skew trig, rounded to 9 dp (error ~1e-16)."""
    p = _spread(_t(spark, sf_dir, "part"))
    w = "CAST(p_size % 5 + 1 AS DOUBLE)"
    h = "CAST(p_partkey % 4 + 1 AS DOUBLE)"
    dx = "CAST(p_partkey % 7 AS DOUBLE)"
    # construct-once two-step select (same trick as geo_multipolygon_stats):
    # every shared sub-geometry — the box, its rotated/scaled variants, the
    # collections — is built in the first projection, so downstream accessor
    # columns reference one pUDF result instead of re-running the whole
    # construction chain per output column (CollapseProject won't inline a
    # Python UDF referenced by several downstream columns).
    box = f"ST_MakeEnvelope(0.0, 0.0, {w}, {h})"
    coll = f"ST_Collect(ST_Point({dx}, {h}), ST_Point({w}, 0.0))"
    dup_line = (
        f"ST_LineFromArrays(array(0.0, 0.0, {w}, {w}, {w}),"
        f" array(0.0, 0.0, {h}, {h} + 1.0, {h} + 1.0))"
    )
    staged = p.selectExpr(
        "p_partkey",
        f"{dx} AS dxv",
        f"{box} AS box",
        f"ST_Rotate({box}, 90.0) AS rot",
        f"ST_Scale({box}, 0.5, 0.5) AS scl",
        f"{coll} AS coll",
        f"{dup_line} AS dup_line",
        f"ST_Collect(ST_Collect(ST_Point(0.0, 0.0), ST_Point({w}, 0.0)), ST_Collect(ST_Point({w}, {h}), ST_Point(0.0, {h}))) AS corners",
    )
    return staged.selectExpr(
        "p_partkey",
        "round(ST_XMin(rot), 9) AS rot_xmin",
        "round(ST_XMax(rot), 9) AS rot_xmax",
        "round(ST_YMin(rot), 9) AS rot_ymin",
        "ST_X(ST_StartPoint(ST_Translate(ST_MakeLine(ST_Point(1.0, 1.0), ST_Point(2.0, 2.0)), dxv, -1.0))) AS trans_x",
        "ST_Area(scl) AS scale_area",
        "ST_XMin(scl) AS scale_xmin",
        "round(ST_XMax(ST_Skew(box, 30.0, 0.0)), 9) AS skew_xmax",
        "CAST(ST_NumGeometries(coll) AS BIGINT) AS n_parts",
        "ST_X(ST_GeometryN(coll, 2)) AS part2_x",
        "ST_Length(ST_Boundary(box)) AS boundary_len",
        "CAST(ST_NPoints(ST_RemoveRepeatedPoints(dup_line, 0.0)) AS BIGINT) AS rrp_npoints",
        # concave hull at max concavity ratio = convex hull: the 4 box
        # corners hull back to the full box area
        "ST_Area(ST_ConcaveHull(corners, 1.0)) AS chull_area",
        # interior point of a rectangle is its exact center (scanline
        # midpoint of the widest row)
        "ST_X(ST_InteriorPoint(box)) AS ip_x",
        "ST_Y(ST_InteriorPoint(box)) AS ip_y",
    )


ORACLE_GEO_AFFINE_PARTS = """
SELECT p_partkey,
       round((CAST(p_size % 5 + 1 AS DOUBLE) - CAST(p_partkey % 4 + 1 AS DOUBLE)) / 2.0, 9) AS rot_xmin,
       round((CAST(p_size % 5 + 1 AS DOUBLE) + CAST(p_partkey % 4 + 1 AS DOUBLE)) / 2.0, 9) AS rot_xmax,
       round((CAST(p_partkey % 4 + 1 AS DOUBLE) - CAST(p_size % 5 + 1 AS DOUBLE)) / 2.0, 9) AS rot_ymin,
       1.0 + CAST(p_partkey % 7 AS DOUBLE) AS trans_x,
       CAST(p_size % 5 + 1 AS DOUBLE) * CAST(p_partkey % 4 + 1 AS DOUBLE) / 4.0 AS scale_area,
       CAST(p_size % 5 + 1 AS DOUBLE) / 4.0 AS scale_xmin,
       round(CAST(p_size % 5 + 1 AS DOUBLE)
             + tan(radians(30.0)) * CAST(p_partkey % 4 + 1 AS DOUBLE) / 2.0, 9) AS skew_xmax,
       CAST(2 AS BIGINT) AS n_parts,
       CAST(p_size % 5 + 1 AS DOUBLE) AS part2_x,
       2.0 * (CAST(p_size % 5 + 1 AS DOUBLE) + CAST(p_partkey % 4 + 1 AS DOUBLE)) AS boundary_len,
       CAST(3 AS BIGINT) AS rrp_npoints,
       CAST(p_size % 5 + 1 AS DOUBLE) * CAST(p_partkey % 4 + 1 AS DOUBLE) AS chull_area,
       CAST(p_size % 5 + 1 AS DOUBLE) / 2.0 AS ip_x,
       CAST(p_partkey % 4 + 1 AS DOUBLE) / 2.0 AS ip_y
FROM part
"""


def geo_spherical(spark, sf_dir):
    """Spherical-earth oracles (previously pytest-only kernels): the
    Chamberlain-Duquette signed spherical area of a 2°x2° lon-lat box
    (|(dλ)(sin φ0 − sin φ1)|·R², the CD edge sum in closed form) and the
    haversine length/distance of a 2-point line — the oracle states the
    SAME published formulas in SQL on the same libm, with rounding far
    above ulp drift (areas to whole m², lengths to mm)."""
    p = _t(spark, sf_dir, "part")
    x0 = "CAST(p_partkey % 30 AS DOUBLE)"
    y0 = "CAST(p_size % 20 + 10 AS DOUBLE)"
    box = f"ST_MakeEnvelope({x0}, {y0}, {x0} + 2.0, {y0} + 2.0)"
    line = f"ST_MakeLine(ST_Point({x0}, {y0}), ST_Point({x0} + 2.0, {y0} + 2.0))"
    return p.selectExpr(
        "p_partkey",
        f"round(abs(ST_AreaSpherical({box})), 0) AS cd_area",
        f"round(ST_LengthSphere({line}), 3) AS hav_len",
        f"round(ST_DistanceSphere(ST_Point({x0}, {y0}), ST_Point({x0} + 2.0, {y0} + 2.0)), 3) AS hav_dist",
    )


ORACLE_GEO_SPHERICAL = """
WITH params AS (
  SELECT p_partkey,
         radians(CAST(p_partkey % 30 AS DOUBLE)) AS lam0,
         radians(CAST(p_partkey % 30 AS DOUBLE) + 2.0) AS lam1,
         radians(CAST(p_size % 20 + 10 AS DOUBLE)) AS phi0,
         radians(CAST(p_size % 20 + 10 AS DOUBLE) + 2.0) AS phi1
  FROM part
)
SELECT p_partkey,
       round(abs((lam1 - lam0) * (sin(phi0) - sin(phi1)))
             * 6371008.8 * 6371008.8, 0) AS cd_area,
       round(2.0 * 6371008.8 * asin(sqrt(
           sin((phi1 - phi0) / 2.0) * sin((phi1 - phi0) / 2.0)
           + cos(phi0) * cos(phi1)
             * sin((lam1 - lam0) / 2.0) * sin((lam1 - lam0) / 2.0))), 3) AS hav_len,
       round(2.0 * 6371008.8 * asin(sqrt(
           sin((phi1 - phi0) / 2.0) * sin((phi1 - phi0) / 2.0)
           + cos(phi0) * cos(phi1)
             * sin((lam1 - lam0) / 2.0) * sin((lam1 - lam0) / 2.0))), 3) AS hav_dist
FROM params
"""


def geo_edges_aware(spark, sf_dir):
    """Edges-metadata-aware measure defaults (edges.rs:35-60): the SAME
    geometry and the SAME ``geom_length``/``geom_area``/``geom_distance``
    API calls, with the method chosen by the column's ``edges`` tag —
    planar-tagged columns measure euclidean, spherical-tagged columns
    haversine/Chamberlain-Duquette. The oracle restates both families'
    closed forms, so a dispatch bug in EITHER direction fails the check."""
    from .ops.table import geom_area, geom_distance, geom_length
    from .types.geo_types import tag_geometry_column

    p = _t(spark, sf_dir, "part")
    x0 = "CAST(p_partkey % 30 AS DOUBLE)"
    y0 = "CAST(p_size % 20 + 10 AS DOUBLE)"
    dx = "CAST(p_partkey % 3 + 1 AS DOUBLE)"
    dy = "CAST(p_size % 4 + 1 AS DOUBLE)"
    base = p.selectExpr(
        "p_partkey",
        f"ST_MakeLine(ST_Point({x0}, {y0}), ST_Point({x0} + {dx}, {y0} + {dy})) AS g_pl",
        f"ST_MakeEnvelope({x0}, {y0}, {x0} + {dx}, {y0} + {dy}) AS b_pl",
        f"ST_Point({x0}, {y0}) AS pa_pl",
        f"ST_Point({x0} + {dx}, {y0} + {dy}) AS pb_pl",
    ).selectExpr(
        "p_partkey",
        "g_pl", "b_pl", "pa_pl", "pb_pl",
        "g_pl AS g_sp", "b_pl AS b_sp", "pa_pl AS pa_sp", "pb_pl AS pb_sp",
    )
    tagged = base
    for c in ("g_pl", "b_pl", "pa_pl", "pb_pl"):
        tagged = tag_geometry_column(tagged, c, edges="planar")
    for c in ("g_sp", "b_sp", "pa_sp", "pb_sp"):
        tagged = tag_geometry_column(tagged, c, edges="spherical")
    return tagged.select(
        "p_partkey",
        F.round(geom_length(tagged, "g_pl"), 6).alias("planar_len"),
        F.round(geom_area(tagged, "b_pl"), 6).alias("planar_area"),
        F.round(geom_distance(tagged, "pa_pl", "pb_pl"), 6).alias("planar_dist"),
        F.round(geom_length(tagged, "g_sp"), 3).alias("sph_len"),
        F.round(F.abs(geom_area(tagged, "b_sp")), 0).alias("sph_area"),
        F.round(geom_distance(tagged, "pa_sp", "pb_sp"), 3).alias("sph_dist"),
    )


ORACLE_GEO_EDGES = """
WITH params AS (
  SELECT p_partkey,
         CAST(p_partkey % 3 + 1 AS DOUBLE) AS dx,
         CAST(p_size % 4 + 1 AS DOUBLE) AS dy,
         radians(CAST(p_partkey % 30 AS DOUBLE)) AS lam0,
         radians(CAST(p_partkey % 30 AS DOUBLE) + CAST(p_partkey % 3 + 1 AS DOUBLE)) AS lam1,
         radians(CAST(p_size % 20 + 10 AS DOUBLE)) AS phi0,
         radians(CAST(p_size % 20 + 10 AS DOUBLE) + CAST(p_size % 4 + 1 AS DOUBLE)) AS phi1
  FROM part
)
SELECT p_partkey,
       round(sqrt(dx * dx + dy * dy), 6) AS planar_len,
       round(dx * dy, 6) AS planar_area,
       round(sqrt(dx * dx + dy * dy), 6) AS planar_dist,
       round(2.0 * 6371008.8 * asin(sqrt(
           sin((phi1 - phi0) / 2.0) * sin((phi1 - phi0) / 2.0)
           + cos(phi0) * cos(phi1)
             * sin((lam1 - lam0) / 2.0) * sin((lam1 - lam0) / 2.0))), 3) AS sph_len,
       round(abs((lam1 - lam0) * (sin(phi0) - sin(phi1)))
             * 6371008.8 * 6371008.8, 0) AS sph_area,
       round(2.0 * 6371008.8 * asin(sqrt(
           sin((phi1 - phi0) / 2.0) * sin((phi1 - phi0) / 2.0)
           + cos(phi0) * cos(phi1)
             * sin((lam1 - lam0) / 2.0) * sin((lam1 - lam0) / 2.0))), 3) AS sph_dist
FROM params
"""


def geo_cast_matrix(spark, sf_dir):
    """Dimension + multiplicity cast surface (cast.rs parity, now the full
    matrix): Force2D drops Z with XY preserved, Force3D adds a constant Z
    (and keeps an existing Z), Multi/CastToSingle round-trip multiplicity,
    ForceCollection wraps parts. Values derive from part columns; the
    oracle states the independently-known results."""
    p = _t(spark, sf_dir, "part")
    w = "CAST(p_size % 5 + 1 AS DOUBLE)"
    h = "CAST(p_partkey % 4 + 1 AS DOUBLE)"
    k = "CAST(p_partkey % 9 + 1 AS DOUBLE)"
    return p.selectExpr(
        "p_partkey",
        f"ST_X(ST_Force2D(ST_PointZ({w}, {h}, 9.0))) AS f2_x",
        f"ST_HasZ(ST_Force2D(ST_PointZ({w}, {h}, 9.0))) AS f2_hasz",
        f"ST_Z(ST_Force3D(ST_Point({w}, {h}), {k})) AS f3_z",
        f"ST_Z(ST_Force3D(ST_PointZ({w}, {h}, 9.0), {k})) AS f3_keep_z",
        f"CAST(ST_NumGeometries(ST_ForceCollection(ST_Multi(ST_Point({w}, {h})))) AS BIGINT) AS fc_n",
        f"ST_GeometryType(ST_Multi(ST_Point({w}, {h}))) AS multi_t",
        f"ST_GeometryType(ST_CastToSingle(ST_Multi(ST_Point({w}, {h})))) AS single_t",
    )


ORACLE_GEO_CAST = """
SELECT p_partkey,
       CAST(p_size % 5 + 1 AS DOUBLE) AS f2_x,
       FALSE AS f2_hasz,
       CAST(p_partkey % 9 + 1 AS DOUBLE) AS f3_z,
       9.0 AS f3_keep_z,
       CAST(1 AS BIGINT) AS fc_n,
       'ST_MultiPoint' AS multi_t,
       'ST_Point' AS single_t
FROM part
"""


def q_rollup_revenue(spark, sf_dir):
    """Multi-level OLAP rollup: revenue by (nation, order-year), with
    per-nation subtotals and a grand total in ONE pass — Spark's
    ``rollup()`` plans a single Expand + hash aggregate (no re-scan per
    grouping level, unlike a UNION of aggregates). GROUPING() flags
    disambiguate subtotal rows from real NULL keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").alias("o_year"),
            F.col("o_totalprice"),
        )
    )
    return (
        j.rollup("n_name", "o_year")
        .agg(
            F.grouping("n_name").cast("long").alias("g_nation"),
            F.grouping("o_year").cast("long").alias("g_year"),
            F.count(F.lit(1)).alias("n_orders"),
            _money_sum(F.col("o_totalprice"), "revenue"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("o_year").cast("string"), F.lit("ALL")).alias("year"),
            "g_nation",
            "g_year",
            "n_orders",
            "revenue",
        )
    )


ORACLE_ROLLUP = f"""
SELECT COALESCE(n_name, 'ALL') AS nation,
       COALESCE(CAST(o_year AS VARCHAR), 'ALL') AS year,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       CAST(GROUPING(o_year) AS BIGINT) AS g_year,
       COUNT(*) AS n_orders,
       {_money_sum_sql('o_totalprice', 'revenue')}
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year, o_totalprice
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
GROUP BY ROLLUP(n_name, o_year)
"""


def events_salted_join(spark, sf_dir):
    """Skewed fact-to-dimension join done with explicit key salting
    (join.skew.salted_join): events fan out ~67 rows/user at sf0.01 and
    far worse under real skew; salting spreads each user over 8 shuffle
    partitions while keeping results identical to the plain join — the
    oracle IS the plain join."""
    from .join import salted_join

    ev = _t(spark, sf_dir, "events")
    dim = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 150)
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
    )
    j = salted_join(ev, dim, on="user_id", how="inner", n_salts=8)
    return j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        _money_sum(F.col("value"), "sum_value"),
    )


ORACLE_SALTED_JOIN = f"""
SELECT c_nationkey, COUNT(*) AS n_events,
       {_money_sum_sql('value', 'sum_value')}
FROM events JOIN customer ON user_id = c_custkey
WHERE c_custkey < 150
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------

QUERIES = {
    # relational
    "q1_pricing_summary": (q1_pricing_summary, ORACLE_Q1),
    "q3_shipping_priority": (q3_shipping_priority, ORACLE_Q3),
    "q5_local_supplier_volume": (q5_local_supplier_volume, ORACLE_Q5),
    "q6_forecast_revenue": (q6_forecast_revenue, ORACLE_Q6),
    "q_top_customers_per_nation": (q_top_customers_per_nation, ORACLE_TOP_CUSTOMERS),
    "q_order_priority": (q_order_priority, ORACLE_ORDER_PRIORITY),
    "q10_returned_items": (q10_returned_items, ORACLE_Q10),
    "q12_shipmode_priority": (q12_shipmode_priority, ORACLE_Q12),
    "q4_late_shipments": (q4_late_shipments, ORACLE_Q4),
    "q7_volume_shipping": (q7_volume_shipping, ORACLE_Q7),
    "q8_market_share": (q8_market_share, ORACLE_Q8),
    "q14_promo_revenue": (q14_promo_revenue, ORACLE_Q14),
    "q18_large_orders": (q18_large_orders, ORACLE_Q18),
    "q19_brand_revenue": (q19_brand_revenue, ORACLE_Q19),
    "q16_supplier_variety": (q16_supplier_variety, ORACLE_Q16),
    "q13_customer_distribution": (q13_customer_distribution, ORACLE_Q13),
    "q15_top_supplier": (q15_top_supplier, ORACLE_Q15),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, ORACLE_Q17),
    "q21_sole_fault_supplier": (q21_sole_fault_supplier, ORACLE_Q21),
    "q22_idle_customers": (q22_idle_customers, ORACLE_Q22),
    "q2_min_cost_supplier": (q2_min_cost_supplier, ORACLE_Q2),
    "q9_product_profit": (q9_product_profit, ORACLE_Q9),
    "q11_important_values": (q11_important_values, ORACLE_Q11),
    "q20_dominant_suppliers": (q20_dominant_suppliers, ORACLE_Q20),
    "q_rollup_revenue": (q_rollup_revenue, ORACLE_ROLLUP),
    "q_customer_value_deciles": (q_customer_value_deciles, ORACLE_Q_DECILES),
    # geometry
    "geo_point_accessors": (geo_point_accessors, ORACLE_GEO_POINT),
    "geo_distance": (geo_distance, ORACLE_GEO_DISTANCE),
    "geo_box_measures": (geo_box_measures, ORACLE_GEO_BOX),
    "geo_total_bounds": (geo_total_bounds, ORACLE_GEO_BOUNDS),
    "geo_spatial_join": (geo_spatial_join, ORACLE_GEO_SJOIN),
    "geo_within_triangle": (geo_within_triangle, ORACLE_GEO_WITHIN),
    "geo_centroid": (geo_centroid, ORACLE_GEO_CENTROID),
    "geo_buffer_area": (geo_buffer_area, ORACLE_GEO_BUFFER),
    "geo_convex_hull": (geo_convex_hull, ORACLE_GEO_HULL),
    "geo_multipolygon_stats": (geo_multipolygon_stats, ORACLE_GEO_MULTIPOLYGON),
    "geo_wkt_types": (geo_wkt_types, ORACLE_GEO_WKT_TYPES),
    "geo_simplify_scale": (geo_simplify_scale, ORACLE_GEO_SIMPLIFY),
    "geo_clip": (geo_clip, ORACLE_GEO_CLIP),
    "geo_geohash": (geo_geohash, ORACLE_GEO_GEOHASH),
    "geo_line_interpolate": (geo_line_interpolate, ORACLE_GEO_LINE_INTERP),
    "geo_center_envelope": (geo_center_envelope, ORACLE_GEO_CENTER),
    "geo_dump_explode": (geo_dump_explode, ORACLE_GEO_DUMP),
    "geo_geojson_roundtrip": (geo_geojson_roundtrip, ORACLE_GEO_GEOJSON),
    "geo_overlay_areas": (geo_overlay_areas, ORACLE_GEO_OVERLAY),
    "geo_relate_matrix": (geo_relate_matrix, ORACLE_GEO_RELATE),
    "geo_azimuth": (geo_azimuth, ORACLE_GEO_AZIMUTH),
    "geo_reverse_flip": (geo_reverse_flip, ORACLE_GEO_REVERSE),
    "geo_buffer_line": (geo_buffer_line, ORACLE_GEO_BUFFER_LINE),
    "geo_transform": (geo_transform, ORACLE_GEO_TRANSFORM),
    "geo_transform_conic": (geo_transform_conic, ORACLE_GEO_TRANSFORM_CONIC),
    "geo_transform_laea": (geo_transform_laea, ORACLE_GEO_TRANSFORM_LAEA),
    "geo_transform_tmerc": (geo_transform_tmerc, ORACLE_GEO_TRANSFORM_TMERC),
    "geo_transform_cyl": (geo_transform_cyl, ORACLE_GEO_TRANSFORM_CYL),
    "geo_transform_projjson": (geo_transform_projjson, ORACLE_GEO_TRANSFORM_PROJJSON),
    "geo_spherical_predicates": (geo_spherical_predicates, ORACLE_GEO_SPHERICAL_PREDICATES),
    "geo_spherical_polygon": (geo_spherical_polygon, ORACLE_GEO_SPHERICAL_POLYGON),
    "geo_spherical_distance": (geo_spherical_distance, ORACLE_GEO_SPHERICAL_DISTANCE),
    "geo_spherical_join": (geo_spherical_join, ORACLE_GEO_SPHERICAL_JOIN),
    "geo_countries_spherical": (geo_countries_spherical, ORACLE_GEO_COUNTRIES_SPHERICAL),
    "sim_mmr_rerank": (sim_mmr_rerank, ORACLE_SIM_MMR),
    "pipe_mixture_plan": (pipe_mixture_plan, ORACLE_PIPE_MIXTURE_PLAN),
    "pipe_budget_fill": (pipe_budget_fill, ORACLE_PIPE_BUDGET_FILL),
    "text_url_canonical": (text_url_canonical, ORACLE_TEXT_URL_CANONICAL),
    "text_heavy_hitters_stream": (text_heavy_hitters_stream, ORACLE_TEXT_HH_STREAM),
    "pipe_domain_cap": (pipe_domain_cap, ORACLE_PIPE_DOMAIN_CAP),
    "text_heavy_hitters_cms": (text_heavy_hitters_cms, ORACLE_TEXT_CMS),
    "geo_zorder": (geo_zorder, ORACLE_GEO_ZORDER),
    "geo_knn_join": (geo_knn_join, ORACLE_GEO_KNN),
    "geo_dbscan": (geo_dbscan, ORACLE_GEO_DBSCAN),
    "geo_hexbin": (geo_hexbin, ORACLE_GEO_HEXBIN),
    "geo_lof_outliers": (geo_lof_outliers, ORACLE_GEO_LOF),
    "geo_cluster_kmeans": (geo_cluster_kmeans, ORACLE_GEO_CLUSTER_KMEANS),
    "geo_geodesic_area": (geo_geodesic_area, ORACLE_GEO_GEODESIC_AREA),
    "geo_project": (geo_project, ORACLE_GEO_PROJECT),
    "geo_line_substring": (geo_line_substring, ORACLE_GEO_LINE_SUBSTRING),
    "geo_closest_point": (geo_closest_point, ORACLE_GEO_CLOSEST),
    "geo_split_line": (geo_split_line, ORACLE_GEO_SPLIT),
    "geo_line_merge": (geo_line_merge, ORACLE_GEO_LINE_MERGE),
    "geo_snap_points": (geo_snap_points, ORACLE_GEO_SNAP),
    "geo_subdivide": (geo_subdivide, ORACLE_GEO_SUBDIVIDE),
    "geo_shape_metrics": (geo_shape_metrics, ORACLE_GEO_SHAPE_METRICS),
    "geo_affine_parts": (geo_affine_parts, ORACLE_GEO_AFFINE_PARTS),
    "geo_spherical": (geo_spherical, ORACLE_GEO_SPHERICAL),
    "geo_edges_aware": (geo_edges_aware, ORACLE_GEO_EDGES),
    "geo_cast_matrix": (geo_cast_matrix, ORACLE_GEO_CAST),
    "geo_trajectory_stats": (geo_trajectory_stats, ORACLE_GEO_TRAJECTORY),
    "geo_areal_interpolation": (geo_areal_interpolation, ORACLE_GEO_AREAL),
    # dedup / text / similarity
    "dedup_exact_stats": (dedup_exact_stats, ORACLE_DEDUP_EXACT),
    "dedup_exact_keepers": (dedup_exact_keepers, ORACLE_DEDUP_KEEPERS),
    "dedup_minhash_pairs": (dedup_minhash_pairs, ORACLE_MINHASH_PAIRS),
    "dedup_minhash_refined": (dedup_minhash_refined, ORACLE_DEDUP_MINHASH_REFINED),
    "dedup_clusters_assignment": (dedup_clusters_assignment, ORACLE_DEDUP_CLUSTERS),
    "dedup_corpus_keepers": (dedup_corpus_keepers, ORACLE_DEDUP_CORPUS),
    "dedup_graph_pagerank": (dedup_graph_pagerank, ORACLE_DEDUP_PAGERANK),
    "dedup_graph_triangles": (dedup_graph_triangles, ORACLE_DEDUP_TRIANGLES),
    "dedup_graph_kcore": (dedup_graph_kcore, ORACLE_DEDUP_KCORE),
    "dedup_graph_harmonic": (dedup_graph_harmonic, ORACLE_DEDUP_HARMONIC),
    "events_funnel_windowed": (events_funnel_windowed, ORACLE_EVENTS_FUNNEL_WINDOWED),
    "dedup_incremental_keepers": (dedup_incremental_keepers, ORACLE_DEDUP_INCREMENTAL),
    "dedup_lsh_eval": (dedup_lsh_eval, ORACLE_DEDUP_LSH_EVAL),
    "text_containment_pairs": (text_containment_pairs, ORACLE_TEXT_CONTAINMENT),
    "dedup_substring_spans": (dedup_substring_spans, ORACLE_DEDUP_SUBSTRING),
    "pipe_sample_split": (pipe_sample_split, ORACLE_PIPE_SAMPLE_SPLIT),
    "pipe_full_pipeline": (pipe_full_pipeline, ORACLE_PIPE_FULL),
    "pipe_scrub_text": (pipe_scrub_text, ORACLE_PIPE_SCRUB),
    "pipe_scrub_pii": (pipe_scrub_pii, ORACLE_PIPE_SCRUB_PII),
    "pipe_stratified_sample": (pipe_stratified_sample, ORACLE_PIPE_STRATIFIED),
    "pipe_dataset_card": (pipe_dataset_card, ORACLE_PIPE_DATASET_CARD),
    "pipe_mixture_weights": (pipe_mixture_weights, ORACLE_PIPE_MIXTURE),
    "pipe_decontaminate": (pipe_decontaminate, ORACLE_DECONTAM),
    "pipe_weighted_sample": (pipe_weighted_sample, ORACLE_PIPE_WEIGHTED),
    "pipe_pack_bins": (pipe_pack_bins, ORACLE_PACK),
    "text_bm25_topk": (text_bm25_topk, ORACLE_BM25),
    "text_chunks": (text_chunks, ORACLE_TEXT_CHUNKS),
    "text_tfidf_topk": (text_tfidf_topk, ORACLE_TEXT_TFIDF),
    "text_vocab_stats": (text_vocab_stats, ORACLE_TEXT_VOCAB),
    "text_keywords": (text_keywords, ORACLE_TEXT_KEYWORDS),
    "text_c4_clean": (text_c4_clean, ORACLE_C4),
    "text_repetition": (text_repetition, ORACLE_REPETITION),
    "text_tokens": (text_tokens, ORACLE_TEXT_TOKENS),
    "text_quality": (text_quality, ORACLE_TEXT_QUALITY),
    "text_langid": (text_langid, ORACLE_TEXT_LANGID),
    "text_fingerprint": (text_fingerprint, ORACLE_TEXT_FINGERPRINT),
    "text_fuzzy_pairs": (text_fuzzy_pairs, ORACLE_TEXT_FUZZY),
    "text_bpe_train": (text_bpe_train, ORACLE_TEXT_BPE_TRAIN),
    "text_bpe_tokenize": (text_bpe_tokenize, ORACLE_TEXT_BPE_TOKENIZE),
    "text_lm_score": (text_lm_score, ORACLE_TEXT_LM_SCORE),
    "text_bpe_tokens": (text_bpe_tokens, ORACLE_TEXT_BPE),
    "text_gopher_rules": (text_gopher_rules, ORACLE_TEXT_GOPHER),
    "sim_embedding_stats": (sim_embedding_stats, ORACLE_SIM_STATS),
    "sim_cosine_topk": (sim_cosine_topk, ORACLE_SIM_TOPK),
    "sim_near_dup_pairs": (sim_near_dup_pairs, ORACLE_SIM_NEAR_DUP),
    "text_ngram_jaccard_vs_ref": (text_ngram_jaccard_vs_ref, ORACLE_NGRAM_JACCARD),
    "dedup_simhash_signatures": (dedup_simhash_signatures, ORACLE_SIMHASH_SIGS),
    "sim_srp_buckets": (sim_srp_buckets, ORACLE_SRP_BUCKETS),
    "sim_ivf_topk": (sim_ivf_topk, ORACLE_SIM_IVF_TOPK),
    "sim_knn_join": (sim_knn_join, ORACLE_SIM_KNN_JOIN),
    "sim_kmeans_ivf_topk": (sim_kmeans_ivf_topk, ORACLE_SIM_KMEANS_IVF),
    "sim_semantic_dedup": (sim_semantic_dedup, ORACLE_SIM_SEMANTIC_DEDUP),
    "sim_quantized_topk": (sim_quantized_topk, ORACLE_SIM_QUANTIZED),
    "sim_binary_hamming_topk": (sim_binary_hamming_topk, ORACLE_SIM_BINARY_HAMMING),
    "sim_binary_recall": (sim_binary_recall, ORACLE_SIM_BINARY_RECALL),
    "sim_hard_negatives": (sim_hard_negatives, ORACLE_SIM_HARD_NEGATIVES),
    "sim_text_hash_retrieval": (sim_text_hash_retrieval, ORACLE_SIM_TEXT_HASH),
    "sim_ivfpq_topk": (sim_ivfpq_topk, ORACLE_SIM_IVFPQ),
    # events
    "events_hourly": (events_hourly, ORACLE_EVENTS_HOURLY),
    "events_funnel": (events_funnel, ORACLE_EVENTS_FUNNEL),
    "events_geo_extent": (events_geo_extent, ORACLE_EVENTS_GEO_EXTENT),
    "events_sessions": (events_sessions, ORACLE_EVENTS_SESSIONS),
    "events_sliding_windows": (events_sliding_windows, ORACLE_EVENTS_SLIDING),
    "events_asof_join": (events_asof_join, ORACLE_EVENTS_ASOF),
    "events_asof_forward": (events_asof_forward, ORACLE_EVENTS_ASOF_FORWARD),
    "events_time_weighted_avg": (events_time_weighted_avg, ORACLE_EVENTS_TWA),
    "events_rolling_anomaly": (events_rolling_anomaly, ORACLE_EVENTS_ROLLING),
    "events_attribution": (events_attribution, ORACLE_EVENTS_ATTRIBUTION),
    "events_expectations": (events_expectations, ORACLE_EVENTS_EXPECTATIONS),
    "events_dau_wau": (events_dau_wau, ORACLE_EVENTS_DAU_WAU),
    "events_top_paths": (events_top_paths, ORACLE_EVENTS_TOP_PATHS),
    "events_markov_transitions": (events_markov_transitions, ORACLE_EVENTS_MARKOV),
    "events_geo_hotspots": (events_geo_hotspots, ORACLE_EVENTS_GEO_HOTSPOTS),
    "events_user_stats": (events_user_stats, ORACLE_EVENTS_USER_STATS),
    "events_props_json": (events_props_json, ORACLE_EVENTS_PROPS),
    "events_salted_join": (events_salted_join, ORACLE_SALTED_JOIN),
    "events_windowed_topk": (events_windowed_topk, ORACLE_EVENTS_TOPK),
    "events_retention": (events_retention, ORACLE_EVENTS_RETENTION),
    "events_interval_join": (events_interval_join, ORACLE_EVENTS_INTERVAL),
    "events_kmv_distinct": (events_kmv_distinct, ORACLE_EVENTS_KMV),
    "events_value_quantiles": (events_value_quantiles, ORACLE_EVENTS_HIST_QUANTILES),
    # multimodal plumbing
    "mm_blob_stats": (mm_blob_stats, ORACLE_MM_BLOB),
    "mm_image_brightness": (mm_image_brightness, ORACLE_MM_BRIGHTNESS),
    "mm_audio_features": (mm_audio_features, ORACLE_MM_AUDIO),
    "mm_image_resize": (mm_image_resize, ORACLE_MM_RESIZE),
    "mm_gif_decode": (mm_gif_decode, ORACLE_MM_GIF),
    "mm_tiff_decode": (mm_tiff_decode, ORACLE_MM_TIFF),
}


# Catalog emission order. The driver's per-round CORRECTNESS gate samples a
# prefix of the catalog, so entries that have never had a driver row are
# listed first. Entries absent from this list keep their QUERIES insertion
# order after it.
# Driver-sample rotation (round 6): the 56 never-driver-sampled entries
# first -- led by the 4 latent-HUGEINT oracles fixed this round -- then
# previously-sampled entries oldest-round-first, with round 5's 50 at the
# back. Regenerate each round from the union of CORRECTNESS_r*.json keys.
_SAMPLE_PRIORITY = [
    "dedup_lsh_eval",
    "events_time_weighted_avg",
    "events_expectations",
    "events_geo_hotspots",
    "geo_countries_spherical",
    "dedup_substring_spans",
    "geo_transform_projjson",
    "geo_spherical_predicates",
    "geo_spherical_polygon",
    "geo_spherical_distance",
    "text_url_canonical",
    "pipe_domain_cap",
    "text_heavy_hitters_stream",
    "sim_binary_hamming_topk",
    "dedup_graph_kcore",
    "sim_binary_recall",
    "geo_spherical_join",
    "geo_transform_conic",
    "geo_transform_laea",
    "geo_transform_tmerc",
    "geo_transform_cyl",
    "geo_zorder",
    "geo_knn_join",
    "geo_dbscan",
    "geo_hexbin",
    "geo_lof_outliers",
    "geo_cluster_kmeans",
    "geo_line_substring",
    "geo_closest_point",
    "geo_split_line",
    "geo_line_merge",
    "geo_snap_points",
    "geo_subdivide",
    "geo_shape_metrics",
    "geo_affine_parts",
    "geo_spherical",
    "geo_edges_aware",
    "geo_cast_matrix",
    "geo_trajectory_stats",
    "geo_areal_interpolation",
    "events_funnel",
    "events_geo_extent",
    "events_asof_join",
    "events_asof_forward",
    "events_rolling_anomaly",
    "events_attribution",
    "events_dau_wau",
    "events_top_paths",
    "events_markov_transitions",
    "events_user_stats",
    "events_props_json",
    "events_salted_join",
    "events_windowed_topk",
    "events_retention",
    "events_interval_join",
    "events_kmv_distinct",
    "events_value_quantiles",
    "dedup_exact_keepers",
    "dedup_exact_stats",
    "dedup_minhash_pairs",
    "events_hourly",
    "events_sessions",
    "events_sliding_windows",
    "mm_blob_stats",
    "sim_cosine_topk",
    "sim_embedding_stats",
    "sim_near_dup_pairs",
    "text_bpe_tokens",
    "text_fingerprint",
    "text_langid",
    "text_ngram_jaccard_vs_ref",
    "text_quality",
    "text_tokens",
    "geo_geodesic_area",
    "geo_project",
    "geo_azimuth",
    "geo_box_measures",
    "geo_buffer_area",
    "geo_buffer_line",
    "geo_center_envelope",
    "geo_centroid",
    "geo_clip",
    "geo_convex_hull",
    "geo_distance",
    "geo_dump_explode",
    "geo_geohash",
    "geo_geojson_roundtrip",
    "geo_line_interpolate",
    "geo_multipolygon_stats",
    "geo_overlay_areas",
    "geo_point_accessors",
    "geo_relate_matrix",
    "geo_reverse_flip",
    "geo_simplify_scale",
    "geo_spatial_join",
    "geo_total_bounds",
    "geo_transform",
    "geo_within_triangle",
    "geo_wkt_types",
    "q10_returned_items",
    "q11_important_values",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_brand_revenue",
    "q1_pricing_summary",
    "q20_dominant_suppliers",
    "q21_sole_fault_supplier",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_late_shipments",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q_customer_value_deciles",
    "q_order_priority",
    "q_rollup_revenue",
    "q_top_customers_per_nation",
    "dedup_clusters_assignment",
    "dedup_corpus_keepers",
    "dedup_graph_harmonic",
    "dedup_graph_pagerank",
    "dedup_graph_triangles",
    "dedup_incremental_keepers",
    "dedup_minhash_refined",
    "dedup_simhash_signatures",
    "events_funnel_windowed",
    "mm_audio_features",
    "mm_gif_decode",
    "mm_image_brightness",
    "mm_image_resize",
    "mm_tiff_decode",
    "pipe_budget_fill",
    "pipe_dataset_card",
    "pipe_decontaminate",
    "pipe_full_pipeline",
    "pipe_mixture_plan",
    "pipe_mixture_weights",
    "pipe_pack_bins",
    "pipe_sample_split",
    "pipe_scrub_pii",
    "pipe_scrub_text",
    "pipe_stratified_sample",
    "pipe_weighted_sample",
    "sim_hard_negatives",
    "sim_ivf_topk",
    "sim_ivfpq_topk",
    "sim_kmeans_ivf_topk",
    "sim_knn_join",
    "sim_mmr_rerank",
    "sim_quantized_topk",
    "sim_semantic_dedup",
    "sim_srp_buckets",
    "sim_text_hash_retrieval",
    "text_bm25_topk",
    "text_bpe_tokenize",
    "text_bpe_train",
    "text_c4_clean",
    "text_chunks",
    "text_containment_pairs",
    "text_fuzzy_pairs",
    "text_gopher_rules",
    "text_heavy_hitters_cms",
    "text_keywords",
    "text_lm_score",
    "text_repetition",
    "text_tfidf_topk",
    "text_vocab_stats",
]


def _catalog_order():
    front = [n for n in _SAMPLE_PRIORITY if n in QUERIES]
    seen = set(front)
    return front + [n for n in QUERIES if n not in seen]


def queries():
    return {name: QUERIES[name][0] for name in _catalog_order()}


def oracle_sql():
    return {
        name: QUERIES[name][1]
        for name in _catalog_order()
        if QUERIES[name][1] is not None
    }
