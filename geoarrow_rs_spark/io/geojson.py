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
    """Mixed geometry types break Spark's JSON schema inference (conflicting
    nested-array depths for ``coordinates``), so the geometry is extracted as
    a raw JSON string with ``get_json_object`` from the text line; properties
    get their schema from a JSON-inference pass that drops the geometry."""
    inferred = spark.read.json(path)
    prop_fields = []
    if "properties" in inferred.columns:
        prop_fields = inferred.schema["properties"].dataType.fields
    raw = spark.read.text(path)
    cols = [
        F.get_json_object(F.col("value"), f"$.properties.{f.name}")
        .cast(f.dataType)
        .alias(f.name)
        for f in prop_fields
    ]
    geom = F.expr(
        "ST_GeomFromGeoJSON(get_json_object(value, '$.geometry'))"
    ).alias(geometry_col)
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
