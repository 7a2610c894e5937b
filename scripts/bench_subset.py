#!/usr/bin/env python
"""Focused re-measurement of a subset of catalog queries with the exact
bench.py session/methodology (median of N, hash-force). Usage:
  python scripts/bench_subset.py q1 q2 ...
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS."""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession, functions as F

    import geoarrow_rs_spark as gs
    from geoarrow_rs_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench-subset")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    gs.register_all(spark)

    spark.range(1000).selectExpr("sum(ST_X(ST_Point(CAST(id AS DOUBLE), 0.0)))").collect()
    spark.range(30_000_000).groupBy((F.col("id") % 500_000).alias("k")).count().count()
    for t in ("lineitem", "orders", "customer", "documents", "embeddings", "events", "part", "supplier", "nation", "region"):
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.select([F.count(c) for c in df.columns[:3]]).collect()

    def force(df):
        cols = [F.hash(F.col(c)).cast("long") for c in df.columns]
        acc = cols[0]
        for c in cols[1:]:
            acc = acc + c
        return df.select(F.sum(acc)).collect()

    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in names:
        try:
            force(QUERIES[name][0](spark, warm_dir))
        except Exception as exc:
            print(f"warmup failed {name}: {exc!r}", file=sys.stderr)

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    out = {}
    for name in names:
        fn = QUERIES[name][0]
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        runs.sort()
        out[name] = {"median": round(runs[len(runs) // 2], 3), "runs": [round(r, 3) for r in runs]}
        print(name, out[name])
    print(json.dumps({k: v["median"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
