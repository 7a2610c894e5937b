"""Distributed DBSCAN over point columns (ST_ClusterDBSCAN parity).

Density clustering the reference leaves to its R-tree building blocks
(rust/geoarrow-old/src/indexed/array.rs + rstar); PostGIS ships it as the
window function ST_ClusterDBSCAN. Here it is a composition of the
engine's existing scale patterns — no new physical machinery:

1. eps-neighbor pairs via the PBSM grid (cell = eps, 3x3 probe explode,
   equi-join on cell id, native distance filter) — exactly the
   spatial-join candidate plan, so no all-pairs stage ever exists;
2. core points = neighbor count >= min_pts (map-side combinable count);
3. cluster ids = connected components over core-core edges, reusing the
   min-label-propagation loop from datapipe.dedup (localCheckpoint per
   round, driver checks convergence only);
4. border points take the smallest cluster id among their core
   neighbors (deterministic, unlike "first reached" textbook DBSCAN);
   everything else is noise (NULL cluster).

All candidate generation is bucketed equi-joins — the operator scales
exactly as far as the spatial join and dedup clustering it is built from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PACK = 1 << 21


def _home_cell(x, y, cs: float):
    return (
        F.floor(x / F.lit(cs)).cast("long") * F.lit(_PACK)
        + F.floor(y / F.lit(cs)).cast("long")
    )


def eps_neighbor_pairs(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
) -> DataFrame:
    """All ordered pairs (a, b) with euclidean distance <= eps, a != b.

    Grid equi-join with cell size = eps: every true neighbor of a point
    lies within its 3x3 cell neighborhood, so the probe explode is a
    constant 9 cells per row and the join is a plain shuffle on cell id."""
    cs = float(eps)
    P = df.select(
        F.col(id_col).cast("long").alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
    )
    home = P.select(
        F.col("pid").alias("b"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        _home_cell(F.col("px"), F.col("py"), cs).alias("__cell"),
    )
    cx = F.floor(F.col("px") / cs).cast("long")
    cy = F.floor(F.col("py") / cs).cast("long")
    cells = F.flatten(
        F.transform(
            F.sequence(cx - 1, cx + 1),
            lambda ix: F.transform(
                F.sequence(cy - 1, cy + 1), lambda iy: ix * F.lit(_PACK) + iy
            ),
        )
    )
    probe = P.withColumn("__cell", F.explode(cells))
    dx = F.col("px") - F.col("bx")
    dy = F.col("py") - F.col("by")
    return (
        probe.join(home, on="__cell")
        .filter(F.col("pid") != F.col("b"))
        .filter(dx * dx + dy * dy <= F.lit(cs * cs))
        .select(F.col("pid").alias("a"), "b")
    )


def dbscan(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
    max_iter: int = 25,
) -> DataFrame:
    """DBSCAN cluster assignment.

    Returns one row per input id: ``(id_col, cluster_id, role)`` where
    role is 'core' | 'border' | 'noise', cluster_id is the smallest core
    id in the cluster (NULL for noise). ``min_pts`` counts the point
    itself, matching the classic |N_eps(p)| >= minPts definition."""
    from ..datapipe.dedup import dedup_clusters

    pairs = eps_neighbor_pairs(df, id_col, x_col, y_col, eps).localCheckpoint(
        eager=True
    )
    # neighbor count includes the point itself
    counts = pairs.groupBy("a").agg((F.count(F.lit(1)) + 1).alias("n_nb"))
    ids = df.select(F.col(id_col).cast("long").alias("pid"))
    core = (
        ids.join(counts, ids.pid == counts.a, "left")
        .select("pid", (F.coalesce("n_nb", F.lit(1)) >= min_pts).alias("is_core"))
        .localCheckpoint(eager=True)
    )
    core_ids = core.filter("is_core").select("pid")
    core_edges = (
        pairs.join(core_ids.withColumnRenamed("pid", "a"), on="a")
        .join(core_ids.withColumnRenamed("pid", "b"), on="b")
        .select("a", "b")
    )
    assign = dedup_clusters(
        core_ids.withColumnRenamed("pid", "doc_id"),
        core_edges,
        id_col="doc_id",
        a_col="a",
        b_col="b",
        max_iter=max_iter,
    ).select(F.col("doc_id").alias("cpid"), "cluster_id")

    # border: non-core with >= 1 core neighbor -> min neighbor-core cluster
    border = (
        pairs.join(core.filter("is_core").select(F.col("pid").alias("b")), on="b")
        .join(assign, F.col("b") == F.col("cpid"))
        .groupBy("a")
        .agg(F.min("cluster_id").alias("b_cluster"))
    )
    out = (
        core.join(assign, core.pid == assign.cpid, "left")
        .join(border, core.pid == border.a, "left")
        .select(
            F.col("pid").alias(id_col),
            F.when(F.col("is_core"), F.col("cluster_id"))
            .otherwise(F.col("b_cluster"))
            .alias("cluster_id"),
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("b_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
        )
    )
    return out
