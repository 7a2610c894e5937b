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
