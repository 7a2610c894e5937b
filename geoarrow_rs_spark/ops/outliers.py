"""Local Outlier Factor over point columns (Breunig, Kriegel, Ng,
Sander: "LOF: Identifying Density-Based Local Outliers", SIGMOD 2000 —
public algorithm), composed entirely from the engine's exact spatial kNN
join.

Variant note: classic LOF's k-distance NEIGHBORHOOD can exceed k rows
under distance ties; this implementation uses EXACTLY k neighbors with
deterministic (distance, id) tie-break — the same definition on both
engines, which is what makes the oracle bit-exact.

Scale shape: one kNN join (grid rounds + straggler broadcast, see
join.knn_spatial_join), then three keyed joins/aggregations over the
n*k neighbor table — no stage ever materializes more than k rows per
point. Reachability and LOF means accumulate round(x, 12) decimals, so
partition/summation order cannot change the rounded result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def lof_scores(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    k: int = 5,
    cell_size: float = 1.0,
    max_radius_cells: int = 8,
) -> DataFrame:
    """LOF score per point: ~1 inside uniform-density regions, >> 1 for
    points whose local density is far below their neighbors'. Returns
    ``(id_col, lof)`` with lof rounded to 8 decimals."""
    from ..join.spatial import knn_spatial_join

    nn = knn_spatial_join(
        df, df, k=k + 1,
        left_id=id_col, right_id=id_col,
        left_xy=(x_col, y_col), right_xy=(x_col, y_col),
        cell_size=cell_size, max_radius_cells=max_radius_cells,
    ).filter(F.col("l_id") != F.col("r_id"))
    # exactly k neighbors after dropping self (self may not be rank 1 when
    # duplicate coordinates tie at distance 0 — re-rank to be safe)
    w = Window.partitionBy("l_id").orderBy("dist", "r_id")
    nn = (
        nn.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("l_id", "r_id", "dist")
        .localCheckpoint(eager=True)
    )

    kdist = nn.groupBy("l_id").agg(F.max("dist").alias("kdist"))
    reach = nn.join(
        kdist.select(F.col("l_id").alias("r_id"), "kdist"), on="r_id"
    ).select(
        "l_id", "r_id",
        F.greatest(F.col("kdist"), F.col("dist")).alias("reach"),
    )
    # lrd(p) = k / sum(reach) — one double division over an exact decimal sum
    lrd = reach.groupBy("l_id").agg(
        (
            F.lit(float(k))
            / F.sum(F.round(F.col("reach"), 12).cast("decimal(38,12)")).cast("double")
        ).alias("lrd")
    )
    lof = (
        nn.join(lrd.select(F.col("l_id").alias("r_id"), F.col("lrd").alias("lrd_o")), on="r_id")
        .join(lrd, on="l_id")
        .groupBy("l_id", "lrd")
        .agg(
            F.sum(F.round(F.col("lrd_o"), 12).cast("decimal(38,12)")).alias("__ls")
        )
        .select(
            F.col("l_id").alias(id_col),
            F.round(
                F.col("__ls").cast("double") / F.lit(float(k)) / F.col("lrd"), 8
            ).alias("lof"),
        )
    )
    return lof
