#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt where suffix comes from
$PLAN_SUFFIX (default "before").
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r07"
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    import geoarrow_rs_spark as gs
    from geoarrow_rs_spark.queries import QUERIES

    import bench

    if not names:
        names = list(bench.HEADLINE)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    gs.register_all(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for name in names:
        fn = QUERIES[name][0]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:
            plan = f"ERROR building {name}: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")

    spark.stop()


if __name__ == "__main__":
    main()
