"""Round-8 single-pass restructures: the optimized formulations must be
value-identical to the formulations they replaced.

- tfidf_topk: broadcast-dfreq path vs the word-window fallback path
  (SPARK_GRAFT_TFIDF_DF_BROADCAST=0) — same rows, bit-exact scores.
- quantized_topk: literal-inlined quantization scales vs a reference
  broadcast-subtree replay, plus the empty-corpus edge.
- budget_fill: the checkpointed per-doc table keeps the plan-table
  broadcast hint (stats probed on the un-checkpointed twin).
"""
import os

import pytest
from pyspark.sql import Row, functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(
                ["spark", "join", "window", "shuffle", "plan"][: (i % 5) + 1]
                * ((i % 7) + 1)
            ))
            for i in range(60)
        ]
    )


def test_tfidf_broadcast_and_window_paths_identical(spark, docs):
    from geoarrow_rs_spark.datapipe.corpus import tfidf_topk

    terms = ["spark", "window", "nosuchterm"]
    old = os.environ.get("SPARK_GRAFT_TFIDF_DF_BROADCAST")
    try:
        os.environ["SPARK_GRAFT_TFIDF_DF_BROADCAST"] = "1"
        bcast = _rows(tfidf_topk(docs, terms, k=10))
        os.environ["SPARK_GRAFT_TFIDF_DF_BROADCAST"] = "0"
        window = _rows(tfidf_topk(docs, terms, k=10))
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_TFIDF_DF_BROADCAST", None)
        else:
            os.environ["SPARK_GRAFT_TFIDF_DF_BROADCAST"] = old
    assert bcast == window and len(bcast) == 10


def test_tfidf_broadcast_path_has_no_word_window(spark, docs):
    """The default path must not shuffle+sort the corpus-sized tf table
    by word: no word-partitioned Window in the plan (the only Window
    left orders the final top-k and the tiny query-norm frame)."""
    from geoarrow_rs_spark.datapipe.corpus import tfidf_topk

    plan = (
        tfidf_topk(docs, ["spark"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the word-keyed count window was `windowspecdefinition(word#...` —
    # absent on the broadcast path
    assert "windowspecdefinition(word" not in plan


def test_quantized_topk_matches_broadcast_subtree_replay(spark):
    from geoarrow_rs_spark.datapipe.similarity import (
        amax_per_dim, quantize_expr, _int_dot_expr, quantized_topk,
    )
    from pyspark.sql import Window

    e = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float((i * 7 + j) % 13) - 6.0
                                  for j in range(8)]) for i in range(40)]
    )
    q = e.where(F.col("vec_id") < 4)
    c = e.where(F.col("vec_id") >= 4)

    # reference: the pre-r8 broadcast-subtree formulation, replayed inline
    am = amax_per_dim(c)
    qq = q.crossJoin(F.broadcast(am)).select(
        F.col("vec_id").alias("query_id"),
        quantize_expr(F.col("embedding"), F.col("__amax")).alias("__qq"),
    )
    cc = c.crossJoin(F.broadcast(am)).select(
        F.col("vec_id").alias("neighbor_id"),
        quantize_expr(F.col("embedding"), F.col("__amax")).alias("__cq"),
    )
    qq = qq.select(
        "query_id", "__qq",
        F.sqrt(_int_dot_expr(F.col("__qq"), F.col("__qq")).cast("double")).alias("__qn"),
    )
    cc = cc.select(
        "neighbor_id", "__cq",
        F.sqrt(_int_dot_expr(F.col("__cq"), F.col("__cq")).cast("double")).alias("__cn"),
    )
    den = F.col("__qn") * F.col("__cn")
    num = _int_dot_expr(F.col("__qq"), F.col("__cq")).cast("double")
    scored = cc.crossJoin(F.broadcast(qq)).select(
        "query_id", "neighbor_id",
        F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), 8).alias("qcosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("neighbor_id").asc()
    )
    ref = scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 3)

    assert _rows(quantized_topk(q, c, k=3)) == _rows(ref)


def test_quantized_topk_empty_corpus(spark):
    from geoarrow_rs_spark.datapipe.similarity import quantized_topk

    e = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 2.0])]
    )
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert quantized_topk(e, empty, k=3).count() == 0


def test_k_core_local_path_matches_distributed(spark):
    """The size-gated local peel must be row-identical to the distributed
    rounds, for both the fixed-round and early-stop modes, including an
    empty result."""
    import geoarrow_rs_spark.datapipe.graph as G

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (6, 7), (2, 1)],
        "a_id long, b_id long",
    )
    lone = spark.createDataFrame([(1, 2), (3, 4)], "a_id long, b_id long")
    for df, kw in [
        (pairs, dict(k=2, rounds=4, early_stop=False)),
        (pairs, dict(k=2)),
        (pairs, dict(k=3, rounds=4, early_stop=False)),  # empty 3-core
        (lone, dict(k=2, rounds=2, early_stop=False)),   # empty result
    ]:
        local = _rows(G.k_core(df, **kw))
        saved = G.LOCAL_KCORE_DISABLED
        G.LOCAL_KCORE_DISABLED = True
        try:
            dist = _rows(G.k_core(df, **kw))
        finally:
            G.LOCAL_KCORE_DISABLED = saved
        assert local == dist


def test_pagerank_local_path_matches_distributed(spark):
    """The size-gated local pagerank replica must be bit-identical to the
    distributed rounds — including isolated nodes (teleport mass only),
    edges referencing unknown nodes, and self-loops."""
    import geoarrow_rs_spark.datapipe.graph as G

    nodes = spark.createDataFrame(
        [(i,) for i in range(1, 9)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (2, 1), (6, 6),
         (7, 99)],  # 99 is not in nodes; 6-6 is a self-loop (dropped)
        "a_id long, b_id long",
    )
    for iters in (1, 3):
        local = _rows(G.pagerank(nodes, pairs, id_col="doc_id", iters=iters))
        saved = G.LOCAL_PAGERANK_DISABLED
        G.LOCAL_PAGERANK_DISABLED = True
        try:
            dist = _rows(G.pagerank(nodes, pairs, id_col="doc_id", iters=iters))
        finally:
            G.LOCAL_PAGERANK_DISABLED = saved
        assert local == dist


def test_neighborhood_function_local_path_matches_distributed(spark):
    """The size-gated local KMV sketch replica must be bit-identical to
    the distributed HyperBall rounds — connected component, isolated
    pair, star hub, self-loop dropped."""
    import geoarrow_rs_spark.datapipe.graph as G

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (6, 7), (8, 8),
         (10, 11), (10, 12), (10, 13), (10, 14)],
        "a_id long, b_id long",
    )
    for k, hops in ((4, 2), (32, 3)):
        local = _rows(G.neighborhood_function(pairs, k=k, hops=hops))
        saved = G.LOCAL_ANF_DISABLED
        G.LOCAL_ANF_DISABLED = True
        try:
            dist = _rows(G.neighborhood_function(pairs, k=k, hops=hops))
        finally:
            G.LOCAL_ANF_DISABLED = saved
        assert local == dist and len(local) > 0


def test_budget_fill_checkpointed_rows_keep_broadcast_hint(spark, sf_dir):
    from geoarrow_rs_spark.datapipe.sampling import budget_fill
    from geoarrow_rs_spark.datapipe.text import quality_score, token_count

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b").alias("domain"),
        token_count("text").cast("long").alias("n_tok"),
        F.round(quality_score("text"), 6).alias("q"),
    )
    out = budget_fill(df, "domain", "n_tok", "q", budget_tokens=5_000)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in optimized
    # and the per-doc side reads the materialized table, not a second
    # evaluation of the caller's expressions
    executed = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in executed
