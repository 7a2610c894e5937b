"""CSV with WKT geometry column (SURVEY.md §2.1; mirrors
/root/reference/rust/geoarrow-csv/src/{reader.rs:21-48,writer.rs:14-44}).

Spark's native CSV source handles schema inference / delimiters / quoting /
headers (the reference's reader options map 1:1 onto DataFrameReader options);
the geometry column is parsed from WKT into canonical WKB post-scan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_csv_wkt(
    spark: SparkSession,
    path: str,
    geometry_name: str = "geometry",
    has_header: bool = True,
    delimiter: str = ",",
    infer_schema: bool = True,
    **options,
) -> DataFrame:
    df = spark.read.csv(
        path,
        header=has_header,
        sep=delimiter,
        inferSchema=infer_schema,
        **options,
    )
    if geometry_name in df.columns:
        df = df.withColumn(geometry_name, F.expr(f"ST_GeomFromWKT({geometry_name})"))
    return df


def write_csv_wkt(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    mode: str = "overwrite",
    header: bool = True,
    **options,
):
    out = df
    if geometry_col in df.columns:
        out = out.withColumn(geometry_col, F.expr(f"ST_AsWKT({geometry_col})"))
    out.write.mode(mode).csv(path, header=header, **options)
