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


def test_bpe_train_matches_reference_trainer(spark):
    """BPE trainer vs a from-scratch pure-Python Sennrich trainer on a
    corpus with chained merges, overlap cases ('a b a' / repeated pairs)
    and count ties — the learned merge table must match exactly."""
    from collections import Counter

    from pyspark.sql import Row

    from geoarrow_rs_spark.datapipe.text import bpe_train_merges

    rows = [Row(text="low lower lowest low low new newer newest wide wider widest low newer")] * 3 \
        + [Row(text="low slow slower news new lownew a b a aa aaa")]
    df = spark.createDataFrame(rows)
    got = [(r.step, r.merge_left, r.merge_right, r.n)
           for r in bpe_train_merges(df, n_merges=6).collect()]

    words = Counter()
    for r in rows:
        for w in r.text[:120].split(" "):
            if w:
                words[w[:16]] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for step in range(6):
        pc = Counter()
        for w, toks in vocab.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += words[w]
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((step, a, b, n))
        for w, toks in vocab.items():
            out = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            vocab[w] = out
    assert got == merges
