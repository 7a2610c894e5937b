"""Graph analytics for corpus curation, as iterative DataFrame ops.

Web-scale corpus pipelines weight documents by link/duplication-graph
centrality (e.g. CommonCrawl harmonic-centrality filtering); here the
same shape runs on any edge list — including the near-duplicate candidate
graph the dedup stage already produces.

PageRank is a fixed-iteration power method: each round is one equi-join
(edge x rank) + one groupBy (incoming mass per node). State per round is
the O(|V|) rank table; edges never change, so at 100 TB you persist the
(src, dst, deg) table once and stream rounds over it. Contribution sums
are decimal-accumulated (order-independent), making a fixed-round run
bit-reproducible in ANSI SQL — the oracle unrolls the rounds as CTEs.

Connected components lives in ``dedup.dedup_clusters`` (large-star/
small-star contraction); this module adds the weighted-centrality side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,12)"


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair list (each pair
    contributes both directions). Nodes with no edges hold the teleport
    mass (1-d)/N; dangling redistribution is intentionally omitted (the
    variant is documented and mirrored by the oracle — for a quality
    SIGNAL the relative ordering is what matters).

    pr_{t+1}(v) = round((1-d)/N + d * sum_{u~v} round(pr_t(u)/deg(u), 12), 12)

    Output: (id_col, pr) — one row per node.
    """
    edges = (
        pairs.select(
            F.col(a_col).cast("long").alias("src"),
            F.col(b_col).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    E = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = E.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ED = E.join(deg, on="src").localCheckpoint(eager=True)

    nn = nodes.agg(F.count(F.lit(1)).alias("__N"))
    base = nodes.select(F.col(id_col).cast("long").alias("node")).crossJoin(
        F.broadcast(nn)
    )
    d = float(damping)
    pr = base.select(
        "node",
        F.round(F.lit(1.0) / F.col("__N").cast("double"), 12).alias("pr"),
    )
    for _ in range(iters):
        contrib = ED.join(
            pr.select(F.col("node").alias("src"), "pr"), on="src"
        ).select(
            F.col("dst").alias("node"),
            F.round(F.col("pr") / F.col("__deg").cast("double"), 12)
            .cast(_DEC)
            .alias("__c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        pr = (
            base.join(sums, on="node", how="left")
            .select(
                "node",
                F.round(
                    F.lit(1.0 - d) / F.col("__N").cast("double")
                    + F.lit(d) * F.coalesce(F.col("__s").cast("double"), F.lit(0.0)),
                    12,
                ).alias("pr"),
            )
        )
    return pr.select(F.col("node").alias(id_col), "pr")


def triangle_count(
    pairs: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """Exact per-node triangle counts over an undirected edge list — the
    local-clustering signal of the duplicate-candidate graph (a document
    inside a dense triangle cluster is a much stronger duplicate than one
    with the same raw degree).

    Degree-ordered orientation (the standard distributed formulation):
    every edge points from its lower (degree, id) endpoint to the higher,
    so each triangle is counted exactly once at its minimum vertex and —
    the scale property — the maximum out-degree is O(sqrt(|E|)), which
    bounds the wedge join at O(|E|^1.5) total work regardless of hub
    nodes. Three equi-joins + one semi-join + one groupBy; all exact
    integers, so the SQL oracle replays it verbatim.

    Output: (node, tri_count) for nodes in at least one triangle.
    """
    e = (
        pairs.select(
            F.least(a_col, b_col).alias("a"), F.greatest(a_col, b_col).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    ed = e.join(
        deg.select(F.col("n").alias("a"), F.col("dg").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("dg").alias("db")), "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    directed = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    d1 = directed.select("u", F.col("v").alias("v1"), F.col("dv").alias("dv1"))
    d2 = directed.select("u", F.col("v").alias("v2"), F.col("dv").alias("dv2"))
    wedges = d1.join(d2, "u").where(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    )
    closing = directed.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tris = wedges.join(closing, ["v1", "v2"], "left_semi")
    nodes = tris.select(
        F.explode(F.array("u", "v1", "v2")).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("tri_count"))
