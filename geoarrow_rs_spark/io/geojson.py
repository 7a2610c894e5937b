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


def read_geojson(
    spark: SparkSession, path: str, geometry_col: str = "geometry"
) -> DataFrame:
    """Whole-file GeoJSON FeatureCollection read (mirrors read_geojson,
    /root/reference/rust/geoarrow-old/src/io/geojson). Files parallelize
    one-per-task; features flatten inside mapInPandas, then the same
    GeoJSON-string -> WKB path as the lines reader."""
    import json

    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    raw = spark.read.text(path, wholetext=True)
    mid_schema = StructType(
        [StructField("__geom_json", StringType()), StructField("__props_json", StringType())]
    )

    def flatten(batches):
        for pdf in batches:
            rows = []
            for doc in pdf["value"]:
                obj = json.loads(doc)
                feats = obj["features"] if obj.get("type") == "FeatureCollection" else [obj]
                for ft in feats:
                    rows.append(
                        {
                            "__geom_json": json.dumps(ft.get("geometry"), separators=(",", ":")),
                            "__props_json": json.dumps(ft.get("properties") or {}, separators=(",", ":")),
                        }
                    )
            yield pd.DataFrame(rows, columns=["__geom_json", "__props_json"])

    flat = raw.mapInPandas(flatten, schema=mid_schema)
    # infer property schema from a sample
    sample = flat.select("__props_json").limit(200)
    props_df = spark.read.json(sample.rdd.map(lambda r: r["__props_json"])) if sample.count() else None
    cols = []
    if props_df is not None and props_df.columns and props_df.columns != ["_corrupt_record"]:
        for f in props_df.schema.fields:
            cols.append(
                F.get_json_object(F.col("__props_json"), f"$.{f.name}")
                .cast(f.dataType)
                .alias(f.name)
            )
    geom = F.expr("ST_GeomFromGeoJSON(__geom_json)").alias(geometry_col)
    return flat.select(*cols, geom)


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


def write_geojson(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
):
    """Whole-file FeatureCollection writer
    (rust/geoarrow-geojson/src/writer/mod.rs:51-175 parity): the document
    most web tools accept, as opposed to the line-delimited variant.

    A single JSON document forces a single writer; features are built
    DISTRIBUTED (the same native expression as the lines writer — geometry
    encoding and property serialization run on executors) and stream to the
    driver via ``toLocalIterator`` with only framing written locally.

    Throughput ceiling: single driver writer => single-disk bandwidth;
    suitable for web-map-sized documents. For large exports use
    ``write_geojson_lines`` (fully distributed, one part per task)."""
    props = [c for c in df.columns if c != geometry_col]
    feature = F.concat(
        F.lit('{"type":"Feature","geometry":'),
        F.coalesce(F.expr(f"ST_AsGeoJSON({geometry_col})"), F.lit("null")),
        F.lit(',"properties":'),
        F.to_json(F.struct(*[F.col(c) for c in props])),
        F.lit("}"),
    )
    rows = df.select(feature.alias("value")).toLocalIterator()
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        first = True
        for r in rows:
            if not first:
                f.write(",")
            f.write("\n")
            f.write(r["value"])
            first = False
        f.write("\n]}\n")
