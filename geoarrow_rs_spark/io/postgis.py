"""PostGIS read via JDBC (SURVEY.md §2.1; mirrors read_postgis(connection_url,
sql), /root/reference/rust/geoarrow-old/src/io/postgis/reader.rs:171).

Spark's JDBC source does the distributed fetch (partitioned by an optional
numeric column); geometry arrives as (E)WKB — ``ST_GeomFromWKB`` normalizes
EWKB (SRID flag) to canonical ISO WKB.

No PostgreSQL server ships in this environment, but the full code path —
Spark's JDBC relation (query/driver options, partitioned fetch) plus the
(E)WKB normalization — is integration-tested end-to-end against embedded
Derby in tests/test_postgis_jdbc.py; only the driver class differs from a
live PostGIS run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_postgis(
    spark: SparkSession,
    connection_url: str,
    sql: str,
    geometry_col: str = "geometry",
    partition_column: str = None,
    num_partitions: int = None,
    lower_bound=None,
    upper_bound=None,
    **options,
) -> DataFrame:
    """Run ``sql`` against PostGIS over JDBC. Wrap the geometry in
    ``ST_AsBinary`` in your SQL (or pass raw — EWKB hex is handled too)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", connection_url)
        .option("driver", "org.postgresql.Driver")
    )
    if partition_column:
        if lower_bound is None or upper_bound is None:
            # reader.option() stringifies None to 'None', which surfaces as
            # an opaque JDBC error deep inside Spark — fail up front instead
            raise ValueError(
                "read_postgis: partition_column requires lower_bound and "
                "upper_bound"
            )
        # Spark rejects 'query' + 'partitionColumn' together: the partitioned
        # fetch must go through a dbtable subquery alias instead
        reader = (
            reader.option("dbtable", f"({sql}) SPARK_POSTGIS_SUBQ")
            .option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions or 8)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    else:
        reader = reader.option("query", sql)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    if geometry_col in df.columns:
        # ST_GeomFromEWKB (not ...FromWKB): normalize endianness/structure
        # but KEEP the wire SRID, like reader.rs:171's per-value SRID →
        # ST_SRID stays queryable downstream
        dt = dict(df.dtypes)[geometry_col]
        col = F.col(geometry_col)
        if dt == "string":  # EWKB hex text
            col = F.unhex(F.upper(col))
        df = df.withColumn(geometry_col, F.expr(f"ST_GeomFromEWKB({geometry_col})")) if dt == "binary" else df.withColumn(
            geometry_col, F.call_udf("ST_GeomFromEWKB", col)
        )
    return df
