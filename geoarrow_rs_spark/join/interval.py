"""Interval (range) join via time-bin banding — the temporal analogue of
the PBSM grid spatial join (SURVEY.md §2.6 "range/interval join").

Problem shape: left rows carry an interval [start, end], right rows a
point ``ts``; emit every (left, right) pair with start < ts <= end (or the
configured inclusivity). A naive plan is a cartesian product with an
inequality filter — quadratic and un-shuffleable. The banded plan:

1. choose a bin width B (ideally ~ the median interval length);
2. each left interval explodes to the bins it covers
   (start div B .. end div B — bounded fanout: len/B + 1 bins);
3. each right point belongs to exactly ONE bin (ts div B);
4. equi-join on the bin key, then refine with the exact inequality.

Because the right point lives in exactly one bin, every qualifying pair
meets in exactly one bin — no dedup pass is needed, the join is a plain
shuffle equi-join Catalyst can plan (AQE splits hot bins), and the refine
is a codegen row filter. At 100 TB this is the only viable shape: shuffle
volume is O(rows x avg_bins_per_interval), never O(n^2).

Spark 3.x has a rule-based optimization for range joins only in Databricks
runtime; open-source Catalyst plans the raw inequality as
BroadcastNestedLoopJoin — this module is the portable scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_ts: str,
    bin_width: int,
    how: str = "inner",
    closed: str = "right",
) -> DataFrame:
    """Banded interval join: pairs (l, r) with l.start < r.ts <= l.end
    (``closed='right'``, the as-of/window convention) or the other
    inclusivities. ``bin_width`` is in the units of the timestamp columns
    (e.g. nanoseconds). Column names must be disjoint between the sides
    (select/alias first, as with any Spark join).

    Returns the joined DataFrame with all left + right columns.
    """
    if how != "inner":
        raise ValueError("interval_join: only inner joins are supported")
    w = int(bin_width)
    lo = F.col(left_start)
    hi = F.col(left_end)
    # `div` = exact integer division (ns-scale epochs overflow the 53-bit
    # double mantissa, so / would corrupt bin ids). The stop is clamped
    # with greatest(): a malformed row with end < start would otherwise
    # make sequence() raise an illegal-boundaries error and kill the whole
    # job — clamping yields a single bin and the refine predicate (which
    # can never hold when end < start) drops the row, i.e. zero matches.
    start_bin = F.expr(f"`{left_start}` div {w}")
    stop_bin = F.greatest(start_bin, F.expr(f"`{left_end}` div {w}"))
    bins = F.sequence(start_bin, stop_bin, F.lit(1).cast("long"))
    l_binned = left.withColumn("__bin", F.explode(bins))
    r_binned = right.withColumn("__bin", F.expr(f"`{right_ts}` div {w}"))
    ts = F.col(right_ts)
    if closed == "right":
        refine = (ts > lo) & (ts <= hi)
    elif closed == "left":
        refine = (ts >= lo) & (ts < hi)
    elif closed == "both":
        refine = (ts >= lo) & (ts <= hi)
    else:
        raise ValueError(f"interval_join: bad closed={closed!r}")
    return l_binned.join(r_binned, on="__bin", how="inner").where(refine).drop("__bin")
