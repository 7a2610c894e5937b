"""PassJoin edit-distance fuzzy join: exactness vs a from-scratch
Wagner-Fischer brute force, adversarial key shapes, and plan checks."""

import itertools
import random

from geoarrow_rs_spark.datapipe.dedup import editdist_pairs


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[-1]


def _brute(rows, d):
    return {
        (a, b, _lev(ka, kb))
        for (a, ka), (b, kb) in itertools.combinations(rows, 2)
        if _lev(ka, kb) <= d
    }


def test_editdist_pairs_exact_for_each_threshold(spark):
    """Mixed realistic + degenerate keys (typos, suffix noise, empty and
    sub-threshold-length strings): results equal brute force for
    d = 1, 2, 3, including dist values."""
    random.seed(4)
    words = ["spark", "spork", "stark", "shark", "sparkle", "park", "dark",
             "darks", "quartz", "quart", "quarts", "a", "ab", "abc", ""]
    rows = [(i, random.choice(words) + random.choice(["", "x", "xy"]))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, k string")
    for d in (1, 2, 3):
        got = {
            (r["a_id"], r["b_id"], r["dist"])
            for r in editdist_pairs(df, "id", "k", d).collect()
        }
        assert got == _brute(rows, d), d


def test_editdist_pairs_varied_lengths(spark):
    """Length-skewed keys exercise the (L, i) geometry across the whole
    +-d length window and the position-window clamps."""
    random.seed(9)
    alpha = "abcde"
    rows = [
        (i, "".join(random.choice(alpha) for _ in range(random.randint(0, 14))))
        for i in range(250)
    ]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in editdist_pairs(df, "id", "k", 2).collect()
    }
    assert got == _brute(rows, 2)


def test_editdist_pairs_plan_has_no_python_and_no_cartesian(spark):
    df = spark.range(200).selectExpr("id", "concat('key', CAST(id % 37 AS STRING)) AS k")
    plan = (
        editdist_pairs(df, "id", "k", 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
