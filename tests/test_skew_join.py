"""salted_join: result parity with the plain join, salt in the join keys."""

from pyspark.sql import Row, functions as F

from geoarrow_rs_spark.join import salted_join


def _dfs(spark):
    left = spark.createDataFrame(
        [Row(k=i % 3, v=i) for i in range(100)] + [Row(k=99, v=1000)]
    )
    right = spark.createDataFrame(
        [Row(k=0, name="a"), Row(k=1, name="b"), Row(k=2, name="c")]
    )
    return left, right


def test_salted_inner_matches_plain(spark):
    left, right = _dfs(spark)
    got = salted_join(left, right, on="k", n_salts=4).orderBy("v").collect()
    want = left.join(right, "k").orderBy("v").collect()
    assert [(r.k, r.v, r.name) for r in got] == [(r.k, r.v, r.name) for r in want]


def test_salted_left_keeps_unmatched(spark):
    left, right = _dfs(spark)
    got = salted_join(left, right, on="k", how="left", n_salts=4).orderBy("v").collect()
    want = left.join(right, "k", "left").orderBy("v").collect()
    assert [(r.k, r.v, r.name) for r in got] == [(r.k, r.v, r.name) for r in want]
    assert any(r.name is None for r in got)  # k=99 survives null-extended


def test_salt_is_in_join_keys(spark):
    left, right = _dfs(spark)
    out = salted_join(left, right, on="k", n_salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    # the join itself is a plain equi-join (hash-partitionable, no cartesian)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
