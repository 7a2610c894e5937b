"""As-of (most-recent-match) join — a custom operator Spark lacks natively.

Implemented as the standard distributed pattern: tag and union both sides,
ONE shuffle+sort per key (partitionBy(by), orderBy(ts, side)), then a
last-non-null carry-forward window picks each left row's most recent right
row with ``r.ts <= l.ts``. No range explosion, no per-row Python, and the
single sort is exactly what a sort-merge join would pay anyway — this is
the scale-correct shape for 100 TB event streams.

Cross-engine verification: DuckDB ships a native ASOF JOIN, so the catalog
query checks this implementation against a reference engine's own operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by=(),
    value_cols=None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.on <= left.on`` (``direction='backward'``, the default) or the
    EARLIEST right row with ``right.on >= left.on``
    (``direction='forward'`` — the next-scheduled-event/next-quote shape)
    within the same ``by`` keys. Left-outer: unmatched left rows keep
    nulls. Forward is the same one-shuffle tag-union pattern with the
    scan order reversed — identical cost.

    Ties: right rows sort before left rows at equal ``on`` (a right row at
    exactly left.ts matches, in both directions). Duplicate right rows on
    the same (by, on) are the caller's to resolve (pre-aggregate) —
    last-in-sort wins otherwise.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: bad direction={direction!r}")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {on}]
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        F.lit(0).alias("__side"),
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in set(by) | {on} else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(1).alias("__side"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    order = (
        F.col(on).asc() if direction == "backward" else F.col(on).desc()
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(order, F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__side") == 0).drop("__side")
