"""Cross-validation of join strategies against independent references:
grid vs broadcast spatial join on random data, and asof_join vs
pandas.merge_asof."""

import random

import pandas as pd
from pyspark.sql import Row, functions as F

from geoarrow_rs_spark.join import asof_join, spatial_join


def test_grid_and_broadcast_spatial_join_agree(spark):
    """The two physical strategies implement ONE logical operator: on 400
    random points vs 25 random boxes (seeded), their result pair sets must
    be identical."""
    rng = random.Random(1234)
    pts = spark.createDataFrame(
        [
            Row(pid=i, x=rng.uniform(-50, 50), y=rng.uniform(-50, 50))
            for i in range(400)
        ]
    ).selectExpr("pid", "ST_Point(x, y) AS geometry")
    boxes = spark.createDataFrame(
        [
            Row(
                bid=j,
                x0=(x0 := rng.uniform(-50, 40)),
                y0=(y0 := rng.uniform(-50, 40)),
                x1=x0 + rng.uniform(0.5, 15),
                y1=y0 + rng.uniform(0.5, 15),
            )
            for j in range(25)
        ]
    ).selectExpr("bid", "ST_MakeEnvelope(x0, y0, x1, y1) AS box_geom")

    def pairs(strategy):
        out = spatial_join(
            pts,
            boxes,
            "geometry",
            "box_geom",
            predicate="intersects",
            strategy=strategy,
            cell_size=7.0,
        )
        return sorted((r.pid, r.bid) for r in out.select("pid", "bid").collect())

    got_grid = pairs("grid")
    got_bcast = pairs("broadcast")
    assert got_grid == got_bcast
    assert len(got_grid) > 0


def test_asof_join_matches_pandas_merge_asof(spark):
    """pandas.merge_asof is an independent implementation of backward
    as-of semantics — 600 random trades vs 300 random quotes over 3 keys
    must match row for row."""
    rng = random.Random(99)
    keys = ["A", "B", "C"]
    trades = [
        Row(k=rng.choice(keys), ts=rng.randint(0, 10_000), tid=i)
        for i in range(600)
    ]
    quotes = [
        Row(k=rng.choice(keys), ts=rng.randint(0, 10_000), px=float(i))
        for i in range(300)
    ]
    # merge_asof requires unique, sorted ordering; de-dup right on (k, ts)
    # keeping the last px, mirroring asof_join's last-in-sort-wins note
    qdf = (
        pd.DataFrame([r.asDict() for r in quotes])
        .sort_values(["ts", "px"])
        .drop_duplicates(["k", "ts"], keep="last")
        .sort_values("ts")
        .reset_index(drop=True)
    )
    tdf = (
        pd.DataFrame([r.asDict() for r in trades])
        .sort_values("ts")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        tdf, qdf, on="ts", by="k", direction="backward", suffixes=("", "_q")
    )
    want_map = {r.tid: (None if pd.isna(r.px) else r.px) for r in want.itertuples()}

    ltab = spark.createDataFrame(tdf)
    rtab = spark.createDataFrame(qdf)
    out = asof_join(ltab, rtab, on="ts", by=["k"], value_cols=["px"])
    got_map = {r.tid: r.px_r for r in out.collect()}
    assert got_map == want_map
    assert any(v is not None for v in got_map.values())


def test_interval_join_tolerates_end_before_start(spark):
    """A malformed row with end < start yields zero matches (the refine
    predicate can never hold) instead of a sequence() boundary error
    killing the job."""
    from geoarrow_rs_spark.join.interval import interval_join

    left = spark.createDataFrame(
        [(1, 100, 200), (2, 500, 400)], "lid long, s long, e long"
    )
    right = spark.createDataFrame(
        [(10, 150), (11, 450)], "rid long, ts long"
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_join(left, right, "s", "e", "ts", bin_width=50).collect()
    )
    assert got == [(1, 10)]  # the inverted interval matches nothing


def test_dwithin_sphere_join_vs_brute_force(spark):
    """Grid-candidate great-circle DWithin join == brute-force haversine
    cross join, including pairs straddling the antimeridian."""
    import math
    import numpy as np

    from geoarrow_rs_spark.join.spatial import dwithin_sphere_join, haversine_expr
    from pyspark.sql import functions as F

    rng = np.random.RandomState(5)
    def mk(n, offset):
        rows = []
        for i in range(n):
            # cluster half the points hard against ±180
            if i % 2 == 0:
                lon = 179.0 + rng.uniform(0, 2.0)
                lon = lon - 360.0 if lon >= 180.0 else lon
            else:
                lon = rng.uniform(-170, 170)
            rows.append((offset + i, float(lon), float(rng.uniform(-60, 60))))
        return rows
    left = spark.createDataFrame(mk(120, 0), "l_id LONG, lon DOUBLE, lat DOUBLE")
    right = spark.createDataFrame(mk(150, 1000), "r_id LONG, lon DOUBLE, lat DOUBLE")
    eps = 150_000.0  # 150 km
    got = {
        (r["l_id"], r["r_id"])
        for r in dwithin_sphere_join(left, right, eps).collect()
    }
    brute = (
        left.crossJoin(
            right.select(
                F.col("r_id"), F.col("lon").alias("rlon"), F.col("lat").alias("rlat")
            )
        )
        .withColumn(
            "d",
            haversine_expr(F.col("lon"), F.col("lat"), F.col("rlon"), F.col("rlat")),
        )
        .filter(F.col("d") <= eps)
    )
    want = {(r["l_id"], r["r_id"]) for r in brute.collect()}
    assert got == want
    assert want  # the clusters guarantee some matches
    # at least one matched pair genuinely straddles ±180
    lons = {r["l_id"]: r["lon"] for r in left.collect()}
    rlons = {r["r_id"]: r["lon"] for r in right.collect()}
    assert any(
        (lons[a] > 170 and rlons[b] < -170) or (lons[a] < -170 and rlons[b] > 170)
        for a, b in want
    )


def test_dwithin_sphere_join_at_latitude_limit(spark):
    """Regression: pairs sitting in the last fraction of a degree below
    max_abs_lat whose lon separation exceeds the small-angle eps_deg/cos
    estimate must still be found (cell sizing uses the exact haversine
    worst case, and the exact-wrap recompute may not shrink cells)."""
    import numpy as np

    from geoarrow_rs_spark.join.spatial import dwithin_sphere_join, haversine_expr
    from pyspark.sql import functions as F

    eps = 120_000.0
    # dense band hugging the 66-degree default limit
    rng = np.random.RandomState(9)
    lrows = [(i, float(rng.uniform(-5, 5)), float(rng.uniform(65.5, 66.0)))
             for i in range(120)]
    rrows = [(1000 + i, float(rng.uniform(-5, 5)), float(rng.uniform(65.5, 66.0)))
             for i in range(120)]
    left = spark.createDataFrame(lrows, "l_id LONG, lon DOUBLE, lat DOUBLE")
    right = spark.createDataFrame(rrows, "r_id LONG, lon DOUBLE, lat DOUBLE")
    got = {(r["l_id"], r["r_id"]) for r in dwithin_sphere_join(left, right, eps).collect()}
    brute = (
        left.crossJoin(right.select("r_id", F.col("lon").alias("rlon"), F.col("lat").alias("rlat")))
        .withColumn("d", haversine_expr(F.col("lon"), F.col("lat"), F.col("rlon"), F.col("rlat")))
        .filter(F.col("d") <= eps)
    )
    want = {(r["l_id"], r["r_id"]) for r in brute.collect()}
    assert got == want and want


def test_dwithin_sphere_join_polar_caps(spark):
    """Rows beyond max_abs_lat must not be silently dropped: polar-cap
    AEQD partitions find every pair, including pole-hugging clusters where
    lon/lat grids degenerate and pairs straddling the band/cap boundary;
    band and cap outputs stay disjoint (no duplicated pairs)."""
    import numpy as np

    from geoarrow_rs_spark.join.spatial import dwithin_sphere_join, haversine_expr
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    def mk(n, offset):
        rows = []
        for i in range(n):
            kind = i % 4
            if kind == 0:        # hard against the north pole, all longitudes
                lat, lon = rng.uniform(88.5, 90.0), rng.uniform(-180, 180)
            elif kind == 1:      # straddle the band/cap boundary at ±66
                lat = rng.uniform(65.0, 67.0) * rng.choice([-1.0, 1.0])
                lon = rng.uniform(-3, 3)
            elif kind == 2:      # south cap
                lat, lon = rng.uniform(-90.0, -80.0), rng.uniform(-180, 180)
            else:                # mid-latitude control
                lat, lon = rng.uniform(-50, 50), rng.uniform(-170, 170)
            rows.append((offset + i, float(lon), float(lat)))
        return rows

    left = spark.createDataFrame(mk(140, 0), "l_id LONG, lon DOUBLE, lat DOUBLE")
    right = spark.createDataFrame(mk(140, 1000), "r_id LONG, lon DOUBLE, lat DOUBLE")
    eps = 150_000.0
    got = [(r["l_id"], r["r_id"]) for r in dwithin_sphere_join(left, right, eps).collect()]
    assert len(got) == len(set(got))  # band/cap partitions are disjoint
    brute = (
        left.crossJoin(right.select("r_id", F.col("lon").alias("rlon"), F.col("lat").alias("rlat")))
        .withColumn("d", haversine_expr(F.col("lon"), F.col("lat"), F.col("rlon"), F.col("rlat")))
        .filter(F.col("d") <= eps)
    )
    want = {(r["l_id"], r["r_id"]) for r in brute.collect()}
    assert set(got) == want
    # the fixture must actually exercise the cap paths
    lats = {r["l_id"]: r["lat"] for r in left.collect()}
    rlats = {r["r_id"]: r["lat"] for r in right.collect()}
    assert any(lats[a] > 66.0 or rlats[b] > 66.0 for a, b in want)
    assert any(lats[a] < -66.0 or rlats[b] < -66.0 for a, b in want)
    assert any(abs(lats[a]) > 88.0 for a, _ in want)  # pole-hugging matches


def test_dwithin_sphere_join_eps_too_large_raises(spark):
    from geoarrow_rs_spark.join.spatial import dwithin_sphere_join

    left = spark.createDataFrame([(1, 0.0, 0.0)], "l_id LONG, lon DOUBLE, lat DOUBLE")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="too large"):
        dwithin_sphere_join(left, left, 8_000_000.0)

def test_dwithin_sphere_join_tiny_eps_cap_packing(spark):
    """Small radii used to shrink the AEQD cap cell until |iy| overflowed
    the fixed packing offset, aliasing unrelated strips into one cell id.
    The cell is now floored so the index range always fits: results stay
    exact and the candidate grid keeps its locality guarantee."""
    import numpy as np

    from geoarrow_rs_spark.join.spatial import dwithin_sphere_join, haversine_expr
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    # clusters near the pole + scattered far points; eps = 5 m
    rows_l, rows_r = [], []
    for i in range(40):
        lat = rng.uniform(80.0, 90.0)
        lon = rng.uniform(-180.0, 180.0)
        rows_l.append((i, float(lon), float(lat)))
        # half the right rows within ~3 m of a left row, half far away
        if i % 2 == 0:
            dlat = rng.uniform(-2e-5, 2e-5)   # ~2 m
            rows_r.append((1000 + i, float(lon), float(lat + dlat)))
        else:
            rows_r.append((1000 + i, float((lon + 90.0 + 360.0) % 360.0 - 180.0), float(lat - 5.0)))
    left = spark.createDataFrame(rows_l, "l_id LONG, lon DOUBLE, lat DOUBLE")
    right = spark.createDataFrame(rows_r, "r_id LONG, lon DOUBLE, lat DOUBLE")
    eps = 5.0
    got = {(r["l_id"], r["r_id"])
           for r in dwithin_sphere_join(left, right, eps).collect()}
    brute = (
        left.crossJoin(right.select("r_id", F.col("lon").alias("rlon"),
                                    F.col("lat").alias("rlat")))
        .withColumn("d", haversine_expr(F.col("lon"), F.col("lat"),
                                        F.col("rlon"), F.col("rlat")))
        .filter(F.col("d") <= eps)
    )
    want = {(r["l_id"], r["r_id"]) for r in brute.collect()}
    assert got == want and len(want) >= 10
