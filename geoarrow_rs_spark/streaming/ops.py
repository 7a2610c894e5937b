"""Structured Streaming operators (SURVEY.md §2.7).

The reference has only pull-based batch iterators (sync/async streams,
/root/reference/rust/geoparquet/src/reader/async.rs:16) — no event-time
semantics. Here Spark *adds* capability: file sources replay under
``readStream``, every ST_* function is stateless so it composes with
watermarks, and these helpers provide the standard windowed/sessionized
shapes. Each works identically on batch DataFrames (tested that way) and
streaming DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_stream_parquet(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """File-source stream over a parquet directory; schema required by
    Structured Streaming (pass df.schema from a batch read)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys=("event_type",),
) -> DataFrame:
    """Tumbling-window counts + value sum with late-data watermark."""
    src = df
    if df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    df: DataFrame,
    text_col: str = "text",
    watermark_col: str = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator: exact dedup across a stream. Rows are
    grouped by content digest; per-digest state records whether the digest
    was already emitted, so only the FIRST occurrence ever passes downstream
    (``applyInPandasWithState`` — the stateful-op vehicle Structured
    Streaming provides for semantics Spark lacks natively).

    Works on batch DataFrames too (state degenerates to per-group first)."""
    from pyspark.sql import functions as F

    digest = F.md5(F.col(text_col).cast("binary")).alias("__digest")
    src = df.withColumn("__digest", digest)
    if df.isStreaming and watermark_col:
        src = src.withWatermark(watermark_col, watermark)

    if not df.isStreaming:
        from ..datapipe.dedup import exact_dedup

        first = src.groupBy("__digest").agg(
            F.min(F.struct(*[F.col(c) for c in df.columns])).alias("__row")
        )
        return first.select("__row.*")

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = df.schema

    def dedup_fn(key, pdfs, state):
        if state.exists:
            return iter([])
        emitted = False
        for pdf in pdfs:
            if len(pdf) and not emitted:
                emitted = True
                state.update((1,))
                yield pdf.head(1).drop(columns=["__digest"])

    return src.groupBy("__digest").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (native ``session_window``) per user."""
    src = df
    if df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            user_col,
            "n_events",
            "sum_value",
        )
    )
