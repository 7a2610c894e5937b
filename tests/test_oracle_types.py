"""CI-grade oracle output-type lint.

The driver's correctness gate hashes Spark and DuckDB results
**type-strictly**: a DuckDB HUGEINT/UHUGEINT aggregate (the default result
type of ``SUM(BIGINT)`` and ``//``) materializes through pandas as float64,
so even bit-identical values hash-mismatch against Spark's int64.  Round 5
lost 8 driver rows to exactly this.  This test walks every ``oracle_sql()``
entry and asserts the DuckDB relation's output types stay inside the safe
set — integer families that map to pandas int64, DOUBLE/FLOAT, VARCHAR,
BOOLEAN, DATE/TIMESTAMP, and DECIMAL (which fetchdf materializes as float64,
matching the Spark side's double).  Any new oracle that forgets a
``CAST(... AS BIGINT)`` around an integer aggregate fails here, locally,
instead of in a driver round.
"""

import re

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Types whose pandas materialization is stable and matches what the Spark
# side of the same query produces. DECIMAL is allowed only because fetchdf
# renders it as float64 and every DECIMAL-output oracle has a double-typed
# Spark column (enforced by the dtype-strict parity comparator).
_ALLOWED = re.compile(
    r"^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|VARCHAR|BOOLEAN"
    r"|DATE|TIMESTAMP|DECIMAL\(\d+,\d+\))$"
)


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _oracle_items():
    from geoarrow_rs_spark.queries import QUERIES

    return sorted((n, sql) for n, (_fn, sql) in QUERIES.items() if sql is not None)


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_output_types_are_hash_safe(ddb, name, sql):
    rel = ddb.sql(sql)
    bad = [
        (col, str(t))
        for col, t in zip(rel.columns, rel.types)
        if not _ALLOWED.match(str(t))
    ]
    assert not bad, (
        f"{name}: oracle output columns with driver-hash-unsafe DuckDB types: "
        f"{bad}. HUGEINT/UHUGEINT (from SUM(BIGINT) or //) materialize as "
        "float64 in pandas and hash-mismatch Spark's int64 — wrap the "
        "aggregate in CAST(... AS BIGINT)."
    )
