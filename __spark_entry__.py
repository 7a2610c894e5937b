"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query at sf0.001 (spatial join: customers-as-
  points against nation boxes via the PBSM grid strategy).
- ``queries()``: one callable per implemented operator (SURVEY.md §2 +
  north-star pipeline operators), each (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: equivalent DuckDB ANSI SQL for each query (geometry
  queries build geometries from numeric columns so their oracles are plain
  arithmetic — the runtime has no duckdb-spatial extension).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import geoarrow_rs_spark as gs
from geoarrow_rs_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    gs.register_all(spark)
    return Q.geo_spatial_join(spark, "/root/testdata/sf0.001")


def _wrap(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        gs.register_all(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in Q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
