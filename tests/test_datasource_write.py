"""df.write.format("geoparquet") — the single-pass distributed writer.

Unlike write_geoparquet (Spark parquet sink + a second footer-stamping
pass over every part), the DataSource writer streams each task's batches
into its own part file with the ``geo`` footer already in place and
unions the dataset bbox from per-task commit messages — one pass total.
Reference write surface: rust/geoparquet/src/writer (GeoParquetWriter
options/encoder); the distributed shape is ours.
"""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

import geoarrow_rs_spark as gs
from geoarrow_rs_spark.io.geoparquet import SIDECAR, read_geoparquet


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    gs.register_all(spark)


def _points_df(spark, n=1000):
    return spark.sql(
        "SELECT id, CONCAT('n', id) AS name, "
        "ST_Point(CAST(id AS DOUBLE), CAST(id % 50 AS DOUBLE)) AS geometry "
        f"FROM range({n}) t(id)"
    )


def test_write_roundtrip_with_footers(tmp_path, spark):
    out = str(tmp_path / "ds")
    _points_df(spark).write.format("geoparquet").mode("overwrite").save(out)

    parts = sorted(glob.glob(out + "/*.parquet"))
    assert parts
    for p in parts:
        md = pq.read_metadata(p).metadata
        assert b"geo" in md  # every part footer, no stamping pass
        doc = json.loads(md[b"geo"])
        assert doc["primary_column"] == "geometry"
        assert doc["columns"]["geometry"]["encoding"] == "WKB"
        cov = doc["columns"]["geometry"]["covering"]["bbox"]
        assert cov["xmin"] == ["bbox", "xmin"]

    side = json.load(open(os.path.join(out, SIDECAR)))
    assert side["columns"]["geometry"]["bbox"] == [0.0, 0.0, 999.0, 49.0]

    back = spark.read.format("geoparquet").load(out)
    assert back.count() == 1000
    assert set(back.columns) == {"id", "name", "geometry", "bbox"}
    # covering stats drive row-group pruning on the read side
    assert (
        spark.read.format("geoparquet").option("bbox", "100,0,200,50")
        .load(out).count() == 101
    )
    # the function reader understands the layout too
    assert read_geoparquet(spark, out, bbox=(100, 0, 200, 50)).count() == 101


def test_write_append_unions_bbox(tmp_path, spark):
    out = str(tmp_path / "ds")
    _points_df(spark, 100).write.format("geoparquet").mode("append").save(out)
    spark.sql(
        "SELECT id + 5000 AS id, 'x' AS name, "
        "ST_Point(-100.0, -20.0) AS geometry FROM range(10) t(id)"
    ).write.format("geoparquet").mode("append").save(out)
    side = json.load(open(os.path.join(out, SIDECAR)))
    assert side["columns"]["geometry"]["bbox"] == [-100.0, -20.0, 99.0, 49.0]
    assert spark.read.format("geoparquet").load(out).count() == 110


def test_write_overwrite_replaces_old_parts(tmp_path, spark):
    out = str(tmp_path / "ds")
    _points_df(spark, 500).write.format("geoparquet").mode("append").save(out)
    old_parts = set(glob.glob(out + "/*.parquet"))
    _points_df(spark, 50).write.format("geoparquet").mode("overwrite").save(out)
    new_parts = set(glob.glob(out + "/*.parquet"))
    assert not (old_parts & new_parts)  # unique names; old ones removed
    assert spark.read.format("geoparquet").load(out).count() == 50
    side = json.load(open(os.path.join(out, SIDECAR)))
    assert side["columns"]["geometry"]["bbox"] == [0.0, 0.0, 49.0, 49.0]


def test_write_crs_and_no_covering(tmp_path, spark):
    out = str(tmp_path / "ds")
    (
        _points_df(spark, 20).write.format("geoparquet")
        .option("crs", "EPSG:3857").option("covering", "false")
        .mode("overwrite").save(out)
    )
    side = json.load(open(os.path.join(out, SIDECAR)))
    assert side["columns"]["geometry"]["crs"] == "EPSG:3857"
    assert "covering" not in side["columns"]["geometry"]
    back = spark.read.format("geoparquet").load(out)
    assert set(back.columns) == {"id", "name", "geometry"}
    assert back.count() == 20


def test_write_caller_covering_column_kept(tmp_path, spark):
    out = str(tmp_path / "ds")
    df = _points_df(spark, 30).selectExpr(
        "id", "name", "geometry", "ST_BBox(geometry) AS bbox"
    )
    df.write.format("geoparquet").mode("overwrite").save(out)
    side = json.load(open(os.path.join(out, SIDECAR)))
    assert side["columns"]["geometry"]["bbox"] == [0.0, 0.0, 29.0, 29.0]
    assert spark.read.format("geoparquet").load(out).count() == 30


def test_write_missing_geometry_column_raises(tmp_path, spark):
    out = str(tmp_path / "ds")
    df = spark.range(5)
    with pytest.raises(Exception, match="geometry"):
        df.write.format("geoparquet").mode("overwrite").save(out)


def test_write_null_geometries(tmp_path, spark):
    out = str(tmp_path / "ds")
    spark.sql(
        "SELECT id, IF(id % 2 = 0, ST_Point(CAST(id AS DOUBLE), 1.0), "
        "CAST(NULL AS BINARY)) AS geometry FROM range(10) t(id)"
    ).write.format("geoparquet").mode("overwrite").save(out)
    back = spark.read.format("geoparquet").load(out)
    assert back.count() == 10
    assert back.where("geometry IS NULL").count() == 5
    side = json.load(open(os.path.join(out, SIDECAR)))
    assert side["columns"]["geometry"]["bbox"] == [0.0, 1.0, 8.0, 1.0]
