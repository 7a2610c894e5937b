import os, sys, time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import duckdb
from pyspark.sql import SparkSession

from test_oracle_parity import TABLES, _compare  # reuse the exact comparator
import geoarrow_rs_spark as gs
from geoarrow_rs_spark.queries import QUERIES

SF = "/root/testdata/sf0.1"
EXCLUDE = {  # recursive label-closure CTE oracles: quadratic at sf0.1
    "geo_dbscan", "dedup_clusters_assignment",
    "dedup_incremental_keepers", "pipe_full_pipeline",
}

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
gs.register_all(spark)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

ok = bad = 0
lines = []
for name in sorted(QUERIES):
    if name in EXCLUDE:
        lines.append(f"{name}: SKIPPED (recursive-CTE oracle; see header)")
        continue
    fn, sql = QUERIES[name]
    t0 = time.time()
    try:
        spdf = fn(spark, SF).toPandas()
        odf = con.execute(sql).fetchdf()
        _compare(spdf, odf, name)
        ok += 1
        lines.append(f"{name}: OK rows={len(spdf)} ({time.time()-t0:.1f}s)")
    except Exception as exc:
        bad += 1
        lines.append(f"{name}: FAIL {exc}")
    print(lines[-1], flush=True)

hdr = f"""# PARITY_sf01_r08 — FULL-catalog value parity vs DuckDB at sf0.1
#
# Refreshed at the end of round 8 (180-entry catalog unchanged; round 8
# is the second OPTIMIZATION round — see OPTIMIZATION_r08.md). Every
# queries() entry executed at sf0.1 and compared against its
# oracle_sql() with the exact order-insensitive value comparator from
# tests/test_oracle_parity.py (row count + schema + exact values, float
# NaN-aware, dtype-family-strict, zero tolerance).
#
# RESULT: {ok}/{ok+bad} checked queries MATCH exactly ({bad} failures).
#
# 4 entries are excluded from the sf0.1 oracle run because their DuckDB
# oracles use recursive label-closure CTEs whose intermediate state is
# quadratic per connected component — tractable at the driver's sf0.01
# gate (where they pass), intractable on sf0.1's denser graphs. At
# sf0.1 these operators are instead verified by local-vs-distributed
# path equality (tests) and execute cleanly (see SF01_TIMING_r06.log):
#   - geo_dbscan
#   - dedup_clusters_assignment
#   - dedup_incremental_keepers
#   - pipe_full_pipeline

"""
with open("/root/repo/PARITY_sf01_r08.log", "w") as f:
    f.write(hdr + "\n".join(lines) + "\n")
print("DONE", ok, bad)
