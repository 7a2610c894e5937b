"""Reliable-checkpoint escape hatch (r8, VERDICT r7 #6): the three r7
materialization points route through ``checkpoint_df``, which swaps the
executor-local ``localCheckpoint`` for a reliable ``checkpoint`` into
``$SPARK_GRAFT_RELIABLE_CHECKPOINT`` when that is set — identical results,
different failure domain (see SCALE.md)."""

import os

from pyspark.sql import functions as F

from geoarrow_rs_spark.checkpoint import checkpoint_df
from geoarrow_rs_spark.datapipe import corpus as corpus_ops


def test_checkpoint_df_local_default(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = checkpoint_df(df, eager=True)
    assert sorted(r["v"] for r in out.collect()) == list(range(0, 200, 2))


def test_checkpoint_df_reliable_mode(spark, tmp_path, monkeypatch):
    ck = tmp_path / "ckpt"
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", str(ck))
    df = spark.range(50).withColumn("v", F.col("id") + 1)
    out = checkpoint_df(df, eager=True)
    assert sorted(r["v"] for r in out.collect()) == list(range(1, 51))
    # the reliable checkpoint must actually have been written to the dir
    found = [p for p, _d, files in os.walk(ck) if files]
    assert found, "no reliable checkpoint files written"


def test_tfidf_identical_under_reliable_checkpoint(spark, tmp_path, monkeypatch):
    rows = [(i, f"alpha beta gamma doc{i % 3} beta") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    terms = ["beta", "gamma"]
    base = corpus_ops.tfidf_topk(docs, terms, k=5).collect()
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT",
                       str(tmp_path / "ck2"))
    reliable = corpus_ops.tfidf_topk(docs, terms, k=5).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, reliable))
