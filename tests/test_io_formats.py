"""Shapefile and Arrow IPC round-trip tests."""

import os

import pytest
from pyspark.sql import Row


def test_shapefile_roundtrip(spark, tmp_path):
    from geoarrow_rs_spark.io import read_shapefile, write_shapefile

    df = spark.createDataFrame(
        [
            Row(name="pt", value=1, score=1.5, wkt="POINT (3 4)"),
            Row(name="line", value=2, score=2.5, wkt="LINESTRING (0 0, 5 0, 5 5)"),
            Row(
                name="poly",
                value=3,
                score=3.5,
                wkt="POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
            ),
            Row(name="mpoly", value=4, score=4.5,
                wkt="MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"),
            Row(name="mpt", value=5, score=5.5, wkt="MULTIPOINT (1 1, 2 2)"),
        ]
    ).selectExpr("name", "value", "score", "ST_GeomFromWKT(wkt) AS geometry")
    shp = os.path.join(str(tmp_path), "test.shp")
    write_shapefile(df, shp)
    assert os.path.exists(shp.replace(".shp", ".shx"))
    assert os.path.exists(shp.replace(".shp", ".dbf"))

    back = read_shapefile(spark, shp, shp.replace(".shp", ".dbf"))
    rows = {r["name"]: r for r in back.selectExpr(
        "name", "value", "score",
        "ST_GeometryType(geometry) AS t", "ST_Area(geometry) AS a",
        "ST_Length(geometry) AS l", "ST_NPoints(geometry) AS np").collect()}
    assert len(rows) == 5
    assert rows["pt"]["t"] == "ST_Point"
    assert rows["line"]["l"] == 10.0
    assert rows["poly"]["a"] == 96.0  # 100 - 4 hole
    assert rows["mpoly"]["a"] == 8.0
    assert rows["mpoly"]["t"] == "ST_MultiPolygon"
    assert rows["mpt"]["np"] == 2
    assert rows["poly"]["value"] == 3
    assert rows["line"]["score"] == 2.5


def test_arrow_ipc_roundtrip(spark, tmp_path):
    from geoarrow_rs_spark.io import read_arrow_ipc, write_arrow_ipc

    df = spark.createDataFrame(
        [Row(id=i, name=f"n{i}", val=float(i) * 1.5) for i in range(100)]
    )
    p = os.path.join(str(tmp_path), "t.arrow")
    write_arrow_ipc(df, p)
    back = read_arrow_ipc(spark, p)
    assert back.count() == 100
    assert {r["id"] for r in back.collect()} == set(range(100))


def test_arrow_ipc_multifile(spark, tmp_path):
    from geoarrow_rs_spark.io import read_arrow_ipc, write_arrow_ipc

    d = os.path.join(str(tmp_path), "ipcdir")
    os.makedirs(d)
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(50)])
    write_arrow_ipc(df.where("id < 25"), os.path.join(d, "a.arrow"))
    write_arrow_ipc(df.where("id >= 25"), os.path.join(d, "b.arrow"))
    back = read_arrow_ipc(spark, d)
    assert back.count() == 50
