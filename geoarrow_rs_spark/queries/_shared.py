"""Query catalog: every entry pairs a Spark implementation with a DuckDB
oracle (plain ANSI SQL — the runtime has no duckdb-spatial, so geometry
queries construct geometries from numeric columns and the oracle states the
equivalent arithmetic).

Determinism rules used throughout (so order-insensitive value hashes match
across engines):
- money/e-commerce aggregates: cast to DECIMAL before SUM (exact,
  order-independent), cast the final value to DOUBLE;
- geometry queries use integer-valued coordinates wherever the oracle must
  reproduce the arithmetic exactly; irrational results (sqrt/sin) are rounded
  to a tolerance far above the cross-engine ulp difference;
- ranks/counts are BIGINT on both sides; ties are broken by explicit keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..datapipe import dedup, similarity, text
from ..join import spatial_join


def _spread(df: DataFrame) -> DataFrame:
    """Distribute a small single-split scan before per-row kernel work. The
    bench fixtures are single-row-group parquet files, so the scan — and
    every ArrowEvalPython chained onto it — would otherwise run in ONE task
    regardless of cluster size. Spread to min(cores, 16): each
    ArrowEvalPython node holds a python worker per task, so a 3-node chain
    spawns 3n workers — unbounded width measurably loses to 16-way at 32
    cores from worker churn (r7 A/B: 32-way 1.22s vs 16-way 1.05s on the
    multipolygon chain), while at LOW core counts width is everything
    (8-way 0.97s vs the old cores/4=2-way 2.44s at 8 cores — the r6
    cores/4 rule was tuned only at 32 cores and crippled the low-core
    scaling runs). Skipped whenever the scan already has enough splits
    (the 100 TB case: thousands of files arrive pre-partitioned)."""
    sc = df.sparkSession.sparkContext
    n = max(2, min(sc.defaultParallelism, 16))
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # All events math downstream is exact int64 nanoseconds (mirrored by
        # duckdb's epoch_ns()). Generators have shipped the ts column both as
        # TIMESTAMP(NANOS) (reads as int64 ns under the legacy conf) and as
        # TIMESTAMP(MICROS) (reads as timestamp_ntz) — normalize either to
        # int64 ns here so every query sees one shape.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "timestamp_ntz":
            # naive timestamps are epoch-anchored the same way duckdb
            # anchors them (treat the wall clock as UTC). timestampdiff
            # against an NTZ epoch literal is pure wall-clock arithmetic —
            # exact and independent of the session timezone, so no
            # session-global conf mutation is needed here.
            df = df.withColumn(
                "ts",
                (
                    F.expr(
                        "timestampdiff(MICROSECOND,"
                        " TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
                    )
                    * F.lit(1000)
                ).cast("long"),
            )
        elif ts_type == "timestamp":
            # ltz timestamps are instants; unix_micros extracts the epoch
            # directly (timezone-independent by construction)
            df = df.withColumn(
                "ts", (F.unix_micros(F.col("ts")) * F.lit(1000)).cast("long")
            )
        return df
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "documents":
        # every documents consumer runs heavy per-row text kernels (shingle
        # explode, tokenize, fingerprint) straight off the scan — always
        # worth spreading a single-split file before that work
        return _spread(df)
    return df


def _money_sum(col, alias):
    """Exact, order- and engine-independent money aggregation: round to
    integer cents with floor(x*100+0.5) (pure double ops — identical in any
    IEEE engine, no decimal-cast tie-breaking semantics), sum as BIGINT,
    present as double. Oracle mirror: _MONEY_SUM_SQL."""
    cents = F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (F.sum(cents).cast("double") / F.lit(100.0)).alias(alias)


def _money_sum_sql(expr, alias):
    return (
        f"CAST(SUM(CAST(floor(({expr}) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS {alias}"
    )


def _hits_sql(markers):
    parts = []
    for m in markers:
        parts.append(
            f"CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', '{m}', ''))) / {len(m)} AS INT)"
        )
    return " + ".join(parts)


def _minhash_pairs_cte():
    """Shared CTE chain producing the banded-minhash candidate pairs —
    reused by the pairs oracle and the clustering oracle."""
    from ..datapipe.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    perms = ", ".join(
        f"list_min(list_transform(h, x -> (x * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}))"
        for i in range(16)
    )
    return f"""grams AS (
  SELECT doc_id,
         CASE WHEN length(substr(text, 1, 128)) < 8 THEN [substr(text, 1, 128)]
              ELSE list_transform(range(1, length(substr(text, 1, 128)) - 6),
                                  i -> substr(substr(text, 1, 128), CAST(i AS INT), 8))
         END AS g
  FROM documents
), gram_hashes AS (
  SELECT doc_id,
         list_transform(g, x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % {MINHASH_P}) AS h
  FROM grams
), sigs AS (
  SELECT doc_id, [{perms}] AS sig FROM gram_hashes
), banded AS (
  SELECT doc_id,
         unnest(list_transform(range(0, 4),
                b -> CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ','))) AS band
  FROM sigs
), pairs AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM banded a JOIN banded b USING (band)
  WHERE a.doc_id < b.doc_id
)"""


def _banded_block(src: str, prefix: str) -> str:
    """Parametrized banded-minhash CTE chain over a named CTE/table
    ``src`` (must expose doc_id, text): emits {prefix}grams / {prefix}gh /
    {prefix}sigs / {prefix}banded. Same construction as
    _minhash_pairs_cte, reused for multi-corpus oracles."""
    from ..datapipe.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    perms = ", ".join(
        f"list_min(list_transform(h, x -> (x * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}))"
        for i in range(16)
    )
    p = prefix
    return f"""{p}grams AS (
  SELECT doc_id,
         CASE WHEN length(substr(text, 1, 128)) < 8 THEN [substr(text, 1, 128)]
              ELSE list_transform(range(1, length(substr(text, 1, 128)) - 6),
                                  i -> substr(substr(text, 1, 128), CAST(i AS INT), 8))
         END AS g
  FROM {src}
), {p}gh AS (
  SELECT doc_id,
         list_transform(g, x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % {MINHASH_P}) AS h
  FROM {p}grams
), {p}sigs AS (
  SELECT doc_id, [{perms}] AS sig FROM {p}gh
), {p}banded AS (
  SELECT doc_id,
         unnest(list_transform(range(0, 4),
                b -> CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ','))) AS band
  FROM {p}sigs
)"""


_GRAM8_SQL = (
    "list_distinct(CASE WHEN length(substr({t}, 1, 128)) < 8 THEN [substr({t}, 1, 128)] "
    "ELSE list_transform(range(1, length(substr({t}, 1, 128)) - 6), "
    "i -> substr(substr({t}, 1, 128), CAST(i AS INT), 8)) END)"
)


def _luhn_sql(expr: str) -> str:
    """DuckDB mirror of sampling.luhn_valid: the same 16-term unrolled
    mod-10 sum (doubling at even 0-indexed positions for 16-digit input)."""
    terms = []
    for pos in range(16):
        d = f"TRY_CAST(substr({expr}, {pos + 1}, 1) AS INT)"
        if pos % 2 == 0:
            terms.append(f"(CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END)")
        else:
            terms.append(d)
    total = " + ".join(terms)
    return f"(length({expr}) = 16 AND COALESCE(({total}) % 10 = 0, FALSE))"


# ---------------------------------------------------------------------------
# events (batch analogues of the streaming operators)
# ---------------------------------------------------------------------------

_NS_HOUR = 3_600_000_000_000
_NS_GAP = 1_800_000_000_000  # 30 min


# ---------------------------------------------------------------------------
# corpus pipeline: decontamination / packing / BM25 / C4 cleaning
# ---------------------------------------------------------------------------

_NG3 = (
    "CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws) - 1), "
    "i -> array_to_string(ws[i:i+2], ' ')) ELSE []::VARCHAR[] END"
)


_BM25_TERMS = ("spark", "join", "window")
_BM25_K1P1 = repr(1.2 + 1.0)  # k1 + 1 computed in doubles, not the literal 2.2
