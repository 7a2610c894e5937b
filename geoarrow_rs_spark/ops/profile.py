"""Table profiling and expectation checks (data-quality gates).

The pre-ingest validation pass every production pipeline runs: declare
row-level expectations as boolean SQL predicates, get per-rule violation
counts in ONE scan (each rule is a conditional count inside the same
aggregate — no per-rule jobs, no shuffle beyond the final single-row
reduce). Numeric profiling is the same shape: one pass, algebraic
aggregates only, so both compose with watermarked windows for streaming
quality monitors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def check_expectations(df: DataFrame, rules: dict) -> DataFrame:
    """``rules``: {rule_name: boolean Column or SQL string}. Output: one
    row per rule — (rule, n_rows, n_violations, violation_ppm), ppm as
    exact integer arithmetic. A null predicate result counts as a
    violation (unknown fails closed)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    names = sorted(rules)
    for i, name in enumerate(names):
        cond = rules[name]
        c = F.expr(cond) if isinstance(cond, str) else cond
        aggs.append(
            F.sum(F.when(F.coalesce(c, F.lit(False)), 0).otherwise(1)).alias(f"__v{i}")
        )
    one = df.agg(*aggs)
    per_rule = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"), F.col(f"__v{i}").alias("n_violations")
                )
                for i, name in enumerate(names)
            ]
        )
    ).alias("r")
    return one.select("n_rows", per_rule).select(
        F.col("r.rule").alias("rule"),
        "n_rows",
        F.col("r.n_violations").alias("n_violations"),
        F.expr("r.n_violations * 1000000 div n_rows").alias("violation_ppm"),
    )


def windowed_expectations(
    df: DataFrame,
    ts_col: str,
    rules: dict,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """check_expectations per event-time window — violation counts are
    conditional sums, i.e. algebraic, so the same rules run as a
    watermarked streaming quality monitor with constant per-window state.
    Output: (window_start, rule, n_rows, n_violations) per window."""
    names = sorted(rules)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, name in enumerate(names):
        cond = rules[name]
        c = F.expr(cond) if isinstance(cond, str) else cond
        aggs.append(
            F.sum(F.when(F.coalesce(c, F.lit(False)), 0).otherwise(1)).alias(f"__v{i}")
        )
    src = df
    if df.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    one = src.groupBy(F.window(F.col(ts_col), window).alias("__w")).agg(*aggs)
    per_rule = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"), F.col(f"__v{i}").alias("n_violations")
                )
                for i, name in enumerate(names)
            ]
        )
    ).alias("r")
    return one.select(F.col("__w.start").alias("window_start"), "n_rows", per_rule).select(
        "window_start",
        F.col("r.rule").alias("rule"),
        "n_rows",
        F.col("r.n_violations").alias("n_violations"),
    )


def profile_numeric(df: DataFrame, cols: list) -> DataFrame:
    """Long-format numeric profile in one scan: per column — row count,
    null count, distinct count, min, max (doubles)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        col = F.col(c).cast("double")
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn{i}"),
            F.countDistinct(col).alias(f"__nd{i}"),
            F.min(col).alias(f"__mn{i}"),
            F.max(col).alias(f"__mx{i}"),
        ]
    one = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__nn{i}").alias("n_null"),
                    F.col(f"__nd{i}").alias("n_distinct"),
                    F.col(f"__mn{i}").alias("min_value"),
                    F.col(f"__mx{i}").alias("max_value"),
                )
                for i, c in enumerate(cols)
            ]
        )
    ).alias("p")
    return one.select("n_rows", per_col).select(
        F.col("p.column").alias("column"),
        "n_rows",
        F.col("p.n_null").alias("n_null"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_value").alias("min_value"),
        F.col("p.max_value").alias("max_value"),
    )
