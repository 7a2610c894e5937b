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


# ---------------------------------------------------------------------------
# property-based coverage (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@given(
    st.lists(st.integers(0, 7), min_size=0, max_size=400),
    st.integers(3, 6),
)
@settings(max_examples=200, deadline=None)
def test_gif_lzw_roundtrip_property(seq, min_code):
    """LZW encode->decode is the identity for ANY symbol sequence and any
    minimum code size that covers the alphabet (driver-side, no Spark)."""
    from geoarrow_rs_spark.datapipe.multimodal import (
        _gif_lzw_decode, _gif_lzw_encode,
    )

    assert _gif_lzw_decode(_gif_lzw_encode(seq, min_code), min_code) == seq


@given(st.integers(1, 10), st.integers(0, 1 << 20))
@settings(max_examples=300, deadline=None)
def test_hilbert_curve_adjacency_property(level, seed):
    """For any level, consecutive curve positions d and d+1 map to cells
    exactly one Manhattan step apart (driver-side reference loop — the
    Spark expression is pinned to it elsewhere)."""
    from geoarrow_rs_spark.functions.curves import hilbert_xy2d

    n = 1 << level
    d = seed % (n * n - 1) if n * n > 1 else 0
    # invert via search over the 4 candidate neighbors is overkill; just
    # check bijectivity locally: find cells for d and d+1 by scanning the
    # reference forward map on a bounded window is O(n^2) — instead use
    # the known inverse-free check: build the full map for small levels
    if level <= 5:
        fwd = {hilbert_xy2d(x, y, level): (x, y) for x in range(n) for y in range(n)}
        assert len(fwd) == n * n  # bijective
        x0, y0 = fwd[d]
        x1, y1 = fwd[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1
    else:
        # large levels: bijectivity on a random 2x2 block of cells
        rx, ry = (seed * 7919) % (n - 1), (seed * 104729) % (n - 1)
        keys = {hilbert_xy2d(rx + dx, ry + dy, level)
                for dx in (0, 1) for dy in (0, 1)}
        assert len(keys) == 4


@given(
    st.lists(
        st.text(alphabet="abcde", min_size=0, max_size=9),
        min_size=2, max_size=40,
    ),
    st.integers(1, 2),
)
@settings(max_examples=5, deadline=None)
def test_editdist_pairs_property(spark, keys, d):
    """PassJoin result equals Wagner-Fischer brute force for arbitrary
    short-alphabet key sets and thresholds (few examples — each runs
    Spark jobs)."""
    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in editdist_pairs(df, "id", "k", d).collect()
    }
    assert got == _brute(rows, d)


def test_interval_join_random_vs_brute(spark):
    """Seeded random intervals/points across several bin widths (including
    widths far smaller and larger than the interval lengths) must match
    the brute-force inequality join exactly."""
    from pyspark.sql import Row

    from geoarrow_rs_spark.join.interval import interval_join

    rng = random.Random(11)
    lefts = []
    for i in range(120):
        s = rng.randint(0, 10_000)
        lefts.append((i, s, s + rng.randint(0, 800)))
    rights = [(j, rng.randint(-100, 10_900)) for j in range(300)]
    ldf = spark.createDataFrame([Row(lid=i, lo=s, hi=e) for i, s, e in lefts])
    rdf = spark.createDataFrame([Row(rid=j, ts=t) for j, t in rights])
    want = {
        (i, j) for i, s, e in lefts for j, t in rights if s < t <= e
    }
    for width in (7, 100, 1024, 5000):
        got = {
            (r.lid, r.rid)
            for r in interval_join(ldf, rdf, "lo", "hi", "ts", width).collect()
        }
        assert got == want, f"width={width}: {len(got ^ want)} mismatches"


def _luhn_ref(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@given(st.lists(st.integers(0, 9), min_size=16, max_size=16))
@settings(max_examples=60, deadline=None)
def test_luhn_property_cases(case_digits):
    """Collect hypothesis-generated 16-digit cases; checked in one Spark
    job afterwards (see test_luhn_bulk below via module accumulation)."""
    _LUHN_CASES.append("".join(str(d) for d in case_digits))


_LUHN_CASES = []


def test_luhn_bulk_matches_reference(spark):
    """sampling.luhn_valid over the hypothesis-collected 16-digit strings
    (plus canonical valid cards) must match the textbook right-to-left
    doubling implementation exactly."""
    from pyspark.sql import Row

    from geoarrow_rs_spark.datapipe.sampling import luhn_valid

    cases = list(dict.fromkeys(_LUHN_CASES + ["4111111111111111", "5500005555555559"]))
    df = spark.createDataFrame([Row(i=i, n=c) for i, c in enumerate(cases)])
    got = {r.i: r.v for r in df.select("i", luhn_valid("n").alias("v")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == _luhn_ref(c), (c, got[i])


@given(
    st.lists(
        st.one_of(
            st.binary(min_size=0, max_size=64),
            st.just(None),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=300, deadline=None)
def test_batchdecode_never_crashes_on_garbage(vals):
    """The recursive WKB parser must return a DecodedBatch or None for ANY
    byte input — never raise, never mis-index (property fuzz over raw
    garbage; structured cases covered in test_batchdecode)."""
    from geoarrow_rs_spark.functions import batchdecode as bd

    db = bd.decode_batch(list(vals))
    if db is not None:
        assert len(db.idx) <= len(vals)
        assert db.coords.shape[1] == 2


@given(st.data())
@settings(max_examples=120, deadline=None)
def test_batchdecode_gc_fuzz_roundtrip(data):
    """Random (nested) GeometryCollections: the batch decode must accept
    them, report has_gc, and the opted-in kernels (bounds + hull +
    translate) must match the per-row Geom path byte-for-byte."""
    import numpy as np
    import pandas as pd

    from geoarrow_rs_spark.functions import batchdecode as bd
    from geoarrow_rs_spark.functions import kernels as K
    from geoarrow_rs_spark.wkb import algorithms as alg
    from geoarrow_rs_spark.wkb import core as wc

    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))

    def rand_geom(depth):
        k = rng.integers(0, 4 if depth >= 2 else 5)
        if k == 0:
            return wc.point(float(rng.uniform(-50, 50)), float(rng.uniform(-50, 50)))
        if k == 1:
            n = int(rng.integers(2, 5))
            return wc.Geom(wc.LINESTRING, rng.uniform(-50, 50, (n, 2)))
        if k == 2:
            x0, y0 = rng.uniform(-50, 40, 2)
            return wc.box(float(x0), float(y0), float(x0 + 5), float(y0 + 5))
        if k == 3:
            return wc.multipoint(rng.uniform(-50, 50, (int(rng.integers(1, 4)), 2)))
        return wc.collection([rand_geom(depth + 1) for _ in range(int(rng.integers(1, 3)))])

    gcs = [wc.collection([rand_geom(0) for _ in range(int(rng.integers(1, 4)))])
           for _ in range(5)]
    vals = [wc.to_wkb(g) for g in gcs]
    db = bd.decode_batch(vals)
    assert db is not None and db.has_gc
    s = pd.Series(vals, dtype=object)
    assert [bytes(v) for v in K.k_envelope(s)] == [wc.to_wkb(alg.envelope(g)) for g in gcs]
    assert [bytes(v) for v in K.k_convex_hull(s)] == [wc.to_wkb(alg.convex_hull(g)) for g in gcs]
    assert [bytes(v) for v in K.k_translate(s, 1.0, 2.0)] == [
        wc.to_wkb(alg.affine_transform(g, 1.0, 0.0, 0.0, 1.0, 1.0, 2.0)) for g in gcs
    ]
