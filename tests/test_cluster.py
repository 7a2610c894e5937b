"""Space-filling-curve keys + spatially-clustered GeoParquet writes.

The write-side analogue of the reference's Hilbert-sorted FlatGeobuf
writer (rust/geoarrow-flatgeobuf/src/writer.rs + upstream packed Hilbert
R-tree): sorting a Parquet write by a curve key makes the covering
struct's row-group statistics tight, which is what makes bbox pushdown
actually prune at scale.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoarrow_rs_spark.functions import curves


def _points_df(spark, n=20_000, seed=7):
    """Deterministic pseudo-random world points, built natively."""
    df = spark.range(n).withColumn(
        "h", F.abs(F.xxhash64(F.col("id") + F.lit(seed)))
    )
    return df.select(
        "id",
        ((F.col("h") % 3_600_000) / 10_000.0 - 180.0).alias("lon"),
        (((F.col("h") / F.lit(3_600_000)).cast("long") % 1_700_000) / 10_000.0 - 85.0).alias("lat"),
    )


def test_morton_and_hilbert_keys_match_reference(spark):
    pdf = (
        _points_df(spark, 2_000)
        .withColumn("morton", curves.morton_key_expr("lon", "lat", 16))
        .transform(lambda d: curves.with_hilbert_key(d, "lon", "lat", "hilbert", 16))
        .toPandas()
    )
    n = 1 << 16
    ix = np.clip(np.floor((pdf["lon"].to_numpy() + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((pdf["lat"].to_numpy() + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)

    def spread(v):
        v = v.copy()
        for shift, mask in curves._SPREAD_STEPS:
            v = (v | (v << shift)) & mask
        return v

    expect_m = spread(ix) | (spread(iy) << 1)
    assert (pdf["morton"].to_numpy() == expect_m).all()

    expect_h = np.array(
        [curves.hilbert_xy2d(int(a), int(b), 16) for a, b in zip(ix, iy)],
        dtype=np.int64,
    )
    assert (pdf["hilbert"].to_numpy() == expect_h).all()


def test_hilbert_key_is_bijective_and_continuous_on_grid(spark):
    """Level-4 grid: the 256 cells map onto exactly 0..255, and walking the
    curve in key order moves one cell at a time (the Hilbert continuity
    property Morton lacks — why it is the default clustering curve)."""
    level, n = 4, 16
    rows = [(x * n + y, (x + 0.5) / n * 360.0 - 180.0, (y + 0.5) / n * 180.0 - 90.0)
            for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "cell long, lon double, lat double")
    pdf = curves.with_hilbert_key(df, "lon", "lat", "d", level).toPandas()
    assert sorted(pdf["d"].tolist()) == list(range(n * n))
    order = pdf.sort_values("d")
    xs = (order["cell"] // n).to_numpy()
    ys = (order["cell"] % n).to_numpy()
    steps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (steps == 1).all()


def test_curve_keys_are_native_expressions(spark):
    plan = (
        _points_df(spark, 10)
        .withColumn("m", curves.morton_key_expr("lon", "lat", 16))
        .transform(lambda d: curves.with_hilbert_key(d, "lon", "lat", "h", 16))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan  # no ArrowEvalPython/BatchEvalPython anywhere
    assert "*(1) Project" in plan  # single codegen'd stage for the whole chain


def _rowgroups_hit(path, rect):
    """Count (row groups total, row groups whose bbox stats intersect rect)."""
    import glob
    import pyarrow.parquet as pq

    qxmin, qymin, qxmax, qymax = rect
    total = hit = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            st = {}
            for i in range(g.num_columns):
                col = g.column(i)
                if col.path_in_schema.startswith("bbox."):
                    st[col.path_in_schema] = col.statistics
            total += 1
            if (st["bbox.xmin"].min <= qxmax and st["bbox.xmax"].max >= qxmin
                    and st["bbox.ymin"].min <= qymax and st["bbox.ymax"].max >= qymin):
                hit += 1
    return total, hit


def test_cluster_geoparquet_prunes_row_groups(spark, tmp_path):
    """Same 20k world points written unclustered vs Hilbert-clustered into
    16 output ranges: a 10x10-degree bbox query must touch (almost) every
    unclustered row group but only a small fraction of the clustered ones —
    the measurable version of the 100 TB pruning claim."""
    from geoarrow_rs_spark.io.geoparquet import read_geoparquet, write_geoparquet

    pts = _points_df(spark, 20_000).withColumn(
        "geometry", F.expr("ST_Point(lon, lat)")
    ).drop("lon", "lat")

    flat = str(tmp_path / "flat")
    clus = str(tmp_path / "clustered")
    write_geoparquet(pts.repartition(16), flat, crs="EPSG:4326")
    curves.cluster_geoparquet(
        pts, clus, crs="EPSG:4326", num_partitions=16, level=16
    )

    rect = (-10.0, 40.0, 0.0, 50.0)
    t_flat, hit_flat = _rowgroups_hit(flat, rect)
    t_clus, hit_clus = _rowgroups_hit(clus, rect)
    assert t_flat >= 16 and t_clus >= 16
    assert hit_flat >= t_flat - 1          # unclustered: ~every group touched
    assert hit_clus * 4 <= t_clus          # clustered: <= 25% touched

    # clustering changes layout only — same rows come back
    a = read_geoparquet(spark, flat).select("id").toPandas()["id"].sort_values()
    b = read_geoparquet(spark, clus).select("id").toPandas()["id"].sort_values()
    assert a.tolist() == b.tolist()

    # and the bbox-filtered read of the clustered set is exact
    got = (
        read_geoparquet(spark, clus, bbox=rect)
        .join(read_geoparquet(spark, flat, bbox=rect), "id", "full_outer")
        .count()
    )
    assert got == read_geoparquet(spark, flat, bbox=rect).count()


def test_cluster_geoparquet_morton_roundtrip(spark, tmp_path):
    from geoarrow_rs_spark.io.geoparquet import read_geoparquet

    pts = _points_df(spark, 1_000).withColumn(
        "geometry", F.expr("ST_Point(lon, lat)")
    ).drop("lon", "lat")
    path = str(tmp_path / "morton")
    curves.cluster_geoparquet(pts, path, curve="morton", num_partitions=4)
    assert read_geoparquet(spark, path).count() == 1_000
    with pytest.raises(ValueError):
        curves.cluster_geoparquet(pts, path, curve="peano")


def test_curve_keys_clamp_out_of_bounds(spark):
    """Points outside the key domain clamp to the edge cells instead of
    wrapping or erroring — a 100 TB write with a few bad rows must not
    fail or scatter them across the keyspace."""
    df = spark.createDataFrame(
        [(1, -999.0, 50.0), (2, 999.0, 50.0), (3, 0.0, -999.0), (4, 0.0, 999.0),
         (5, -180.0, -90.0), (6, 180.0, 90.0)],
        "id long, lon double, lat double",
    )
    pdf = (
        df.withColumn("m", curves.morton_key_expr("lon", "lat", 8))
        .transform(lambda d: curves.with_hilbert_key(d, "lon", "lat", "h", 8))
        .toPandas().set_index("id")
    )
    n = 1 << 8
    # clamped coords: ix in {0, n-1}, so keys must equal the edge-cell keys
    def mkey(ix, iy):
        def spread(v):
            for shift, mask in curves._SPREAD_STEPS:
                v = (v | (v << shift)) & mask
            return v
        return spread(ix) | (spread(iy) << 1)

    iy50 = min(n - 1, int((50.0 + 90) / 180 * n))
    assert pdf.loc[1, "m"] == mkey(0, iy50)
    assert pdf.loc[2, "m"] == mkey(n - 1, iy50)
    assert pdf.loc[5, "m"] == mkey(0, 0)
    assert pdf.loc[6, "m"] == mkey(n - 1, n - 1)
    assert pdf.loc[5, "h"] == curves.hilbert_xy2d(0, 0, 8)
    assert pdf.loc[6, "h"] == curves.hilbert_xy2d(n - 1, n - 1, 8)


def test_hex_cells_partition_plane_and_centers_invert(spark):
    """Every point maps to exactly one hex cell whose center is within
    the circumradius (cells partition the plane), across negative and
    positive coordinates; hex_center_expr inverts hex_cell_expr for
    on-center points."""
    import numpy as np

    rng = np.random.default_rng(31)
    pts = [(i, float(x), float(y))
           for i, (x, y) in enumerate(rng.uniform(-40, 40, (3000, 2)))]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    R = 2.0
    q, r = curves.hex_cell_expr("x", "y", R)
    cx, cy = curves.hex_center_expr("hq", "hr", R)
    pdf = (
        df.select("id", "x", "y", q.alias("hq"), r.alias("hr"))
        .select("*", cx.alias("cx"), cy.alias("cy"))
        .toPandas()
    )
    d = np.hypot(pdf["x"] - pdf["cx"], pdf["y"] - pdf["cy"])
    assert (d <= R + 1e-9).all()       # inside circumradius of claimed cell

    # centers map back to their own cell
    centers = pdf[["hq", "hr", "cx", "cy"]].drop_duplicates()
    cdf = spark.createDataFrame(centers)
    q2, r2 = curves.hex_cell_expr("cx", "cy", R)
    back = cdf.select("hq", "hr", q2.alias("q2"), r2.alias("r2")).toPandas()
    assert (back["hq"] == back["q2"]).all()
    assert (back["hr"] == back["r2"]).all()


def test_zorder_parquet_prunes_both_columns(spark, tmp_path, sf_dir):
    """Z-order clustered write: file-level min/max stats must prune a
    selective range predicate on EITHER clustered column, where the
    natural (single-key) order prunes only its own key. Measured with
    real parquet footer statistics."""
    from geoarrow_rs_spark.io.layout import file_stats_overlap, write_zorder_parquet

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zorder")
    # natural order: as generated (orderkey-sorted), round-robin split
    li.repartition(8).write.parquet(plain)
    write_zorder_parquet(li, zord, "l_orderkey", "l_partkey", num_partitions=8)

    # same rows either way
    assert spark.read.parquet(zord).count() == li.count()

    import duckdb
    pk_lo, pk_hi = duckdb.sql(
        f"SELECT min(l_partkey), min(l_partkey) + (max(l_partkey)-min(l_partkey))//20 "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()
    z_pk, z_n = file_stats_overlap(zord, "l_partkey", pk_lo, pk_hi)
    p_pk, p_n = file_stats_overlap(plain, "l_partkey", pk_lo, pk_hi)
    # round-robin files all span the full partkey domain -> nothing prunes;
    # the z-ordered layout must actually skip files on the secondary column
    assert p_pk == p_n
    assert z_pk < z_n, (z_pk, z_n)

    ok_lo, ok_hi = duckdb.sql(
        f"SELECT min(l_orderkey), min(l_orderkey) + (max(l_orderkey)-min(l_orderkey))//20 "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()
    z_ok, _ = file_stats_overlap(zord, "l_orderkey", ok_lo, ok_hi)
    assert z_ok < z_n, (z_ok, z_n)


def test_k_core_peel(spark):
    from geoarrow_rs_spark.datapipe.graph import k_core

    # path 1-2-3-4 + triangle 5-6-7 + pendant 8 off the triangle:
    # the 2-core is exactly the triangle (each with core degree 2)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (7, 5), (7, 8)],
        "a_id LONG, b_id LONG",
    )
    got = {(r["node"], r["core_deg"]) for r in k_core(pairs, k=2).collect()}
    assert got == {(5, 2), (6, 2), (7, 2)}
    # k=1 keeps everything with an edge
    got1 = {r["node"] for r in k_core(pairs, k=1).collect()}
    assert got1 == {1, 2, 3, 4, 5, 6, 7, 8}
    # fixed-round (no early stop) converges to the same fixed point
    got4 = {(r["node"], r["core_deg"]) for r in
            k_core(pairs, k=2, rounds=4, early_stop=False).collect()}
    assert got4 == got


def test_kcore_catalog_rounds_converged(spark, sf_dir):
    """The catalog entry runs exactly 4 peel rounds (oracle-unrollable);
    pin that the peel has actually converged by then on the test data, so
    the entry's output IS the true 2-core."""
    from geoarrow_rs_spark.datapipe import dedup
    from geoarrow_rs_spark.datapipe.graph import k_core

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    r4 = {(r["node"], r["core_deg"]) for r in
          k_core(pairs, k=2, rounds=4, early_stop=False).collect()}
    r6 = {(r["node"], r["core_deg"]) for r in
          k_core(pairs, k=2, rounds=6, early_stop=False).collect()}
    assert r4 == r6
