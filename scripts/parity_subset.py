#!/usr/bin/env python
"""Targeted oracle parity for a subset of catalog queries at any SF.
Usage: python scripts/parity_subset.py q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Reuses the exact comparator from tests/test_oracle_parity.py."""
import os
import sys
import time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb
from pyspark.sql import SparkSession

from test_oracle_parity import TABLES, _compare
import geoarrow_rs_spark as gs
from geoarrow_rs_spark.queries import QUERIES

names = sys.argv[1:]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
gs.register_all(spark)
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

bad = 0
for name in names:
    fn, sql = QUERIES[name]
    t0 = time.time()
    try:
        spdf = fn(spark, SF).toPandas()
        odf = con.execute(sql).fetchdf()
        _compare(spdf, odf, name)
        print(f"{name}: OK rows={len(spdf)} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as exc:
        bad += 1
        print(f"{name}: FAIL {exc}", flush=True)
print(f"done: {len(names) - bad}/{len(names)} OK")
sys.exit(1 if bad else 0)
