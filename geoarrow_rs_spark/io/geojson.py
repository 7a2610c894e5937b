"""GeoJSON-lines (newline-delimited features) read/write (SURVEY.md §2.1;
read mirrors /root/reference/rust/geoarrow-old/src/io/geojson_lines, write
mirrors /root/reference/rust/geoarrow-geojson/src/writer/mod.rs:51-175).

Read path is fully native until the final geometry parse: ``spark.read.json``
parses features in parallel; the geometry object is re-serialized with
``to_json`` (native) and converted to WKB by ``ST_GeomFromGeoJSON``.
Write path is native string assembly + ``ST_AsGeoJSON``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_geojson_lines(
    spark: SparkSession, path: str, geometry_col: str = "geometry"
) -> DataFrame:
    raw = spark.read.json(path)
    cols = []
    if "properties" in raw.columns:
        props = raw.select("properties.*").columns
        cols = [F.col(f"properties.{c}").alias(c) for c in props]
    geom = F.expr(f"ST_GeomFromGeoJSON(to_json({geometry_col}))").alias(geometry_col)
    return raw.select(*cols, geom)


def write_geojson_lines(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    mode: str = "overwrite",
):
    props = [c for c in df.columns if c != geometry_col]
    feature = F.concat(
        F.lit('{"type":"Feature","geometry":'),
        F.coalesce(F.expr(f"ST_AsGeoJSON({geometry_col})"), F.lit("null")),
        F.lit(',"properties":'),
        F.to_json(F.struct(*[F.col(c) for c in props])),
        F.lit("}"),
    )
    df.select(feature.alias("value")).write.mode(mode).text(path)
