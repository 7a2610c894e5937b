"""Event-funnel analytics as native DataFrame ops.

The ordered k-step funnel ("of users who did A, how many then did B,
then C, within a window") is the flagship product-analytics query; no
reference-engine analogue exists (geoarrow-rs is an array-kernel
library), so this sits in the beyond-reference event family next to
retention / sessions / attribution in queries.py.

Semantics: FIRST-TOUCH with greedy step matching — t1 is the user's
earliest step-1 event; each later step is the earliest qualifying event
after the previous step's match, optionally capped at ``t1 + window``.
This is the semantics of the standard funnel tools; note the greedy
window-capped chain is not guaranteed to find a completion that a later
t1 would have found (the documented first-touch trade-off).

Scale shape: one filter + groupBy per step, every join and groupBy keyed
on the user column — with the input pre-partitioned by user the whole
funnel runs with a single exchange. State per user is k timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window=None,
) -> DataFrame:
    """Per-user step-completion times for an ordered funnel.

    Output: one row per user who completed ALL ``len(steps)`` steps, with
    columns ``t1 .. tk`` (the matched event times). Use the intermediate
    per-prefix frames via :func:`funnel_counts` for the usual step-counts
    report. ``window`` (same unit as ``ts_col``) caps every step at
    ``t1 + window``.
    """
    return _funnel_stages(events, steps, user_col, type_col, ts_col, window)[-1]


def _funnel_stages(events, steps, user_col, type_col, ts_col, window):
    # each stage is referenced by the next stage AND by the counts report:
    # checkpoint so stage i's work runs once, not once per downstream use
    stages = []
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
        .localCheckpoint(eager=False)
    )
    stages.append(cur)
    for i, s in enumerate(steps[1:], start=2):
        nxt = events.where(F.col(type_col) == s).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") > F.col(f"t{i - 1}")
        if window is not None:
            cond = cond & (F.col("__ts") <= F.col("t1") + F.lit(window))
        prev_cols = [f"t{j}" for j in range(1, i)]
        cur = (
            nxt.join(stages[-1], user_col)
            .where(cond)
            .groupBy(user_col, *prev_cols)
            .agg(F.min("__ts").alias(f"t{i}"))
            .localCheckpoint(eager=False)
        )
        stages.append(cur)
    return stages


def funnel_counts(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window=None,
) -> DataFrame:
    """The funnel report: one row per step with the user count and the
    exact integer-ppm conversion vs step 1 — assembled as ONE plan (a
    union of per-stage aggregates over the checkpointed stages), not k
    driver-side count() jobs."""
    stages = _funnel_stages(events, steps, user_col, type_col, ts_col, window)
    per = [
        st.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step"),
            F.lit(name).alias("step_name"),
            F.col("n_users").cast("long").alias("n_users"),
        )
        for i, (name, st) in enumerate(zip(steps, stages), start=1)
    ]
    u = per[0]
    for p in per[1:]:
        u = u.unionByName(p)
    first = u.where(F.col("step") == 1).select(
        F.col("n_users").alias("__n1")
    )
    return u.crossJoin(F.broadcast(first)).select(
        "step", "step_name", "n_users",
        F.when(
            F.col("__n1") > 0, F.expr("n_users * 1000000 div __n1")
        ).otherwise(F.lit(0)).cast("long").alias("conv_ppm"),
    )
