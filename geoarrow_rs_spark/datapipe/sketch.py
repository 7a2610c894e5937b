"""Deterministic cardinality sketching: K-Minimum-Values (KMV).

Unlike HLL (whose register layouts differ per engine, so results can never
be oracle-checked), the KMV estimator is a pure function of the data:
hash every key to a uniform in [0,1), keep the k smallest DISTINCT hash
values per group, estimate distinct = (k-1) / h_k where h_k is the k-th
minimum (Bar-Yossef et al. 2002). With the md5-derived hash this is
bit-reproducible in any engine — the estimator itself is the oracle.

Scale shape: the heavy step is the distinct of (group, hash). When a
lower bound n_min on per-group cardinality is known, pass
``prefilter = c * k / n_min`` (c ~ 4-10 safety): hashes above the
threshold cannot be among the k minima when n >= n_min, so the distinct
and the rank window see only ~c*k rows per group instead of n — the
sketch's bandwidth win without a custom UDAF. With no bound, this is an
exact-distinct-cost estimator whose value is the *mergeability* of the
per-group minima (union of KMV sets = KMV of the union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import hash_uniform


def kmv_distinct(
    df: DataFrame,
    key: str,
    group_cols: list,
    k: int = 16,
    salt: str = "kmv",
    prefilter: float | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-group KMV distinct-count estimate. Output: group_cols +
    (n_seen, est_distinct). Without prefilter, groups with fewer than k
    distinct hashes are exact (est = n_seen).

    With ``prefilter`` set, a group whose surviving hash count falls
    below k can NOT be treated as exact — the prefilter may have dropped
    real minima for that group. That branch instead scales up by the
    survival probability (hashes are uniform in [0,1), so distinct ~
    n_seen / prefilter — the classic distinct-sampling estimator) and the
    output gains an ``est_is_exact`` boolean column (false for every
    scaled-up group) so callers can't mistake the unreliable branch for
    an exact count.
    """
    per = df.select(*group_cols, hash_uniform(key, salt).alias("__h"))
    if prefilter is not None:
        per = per.where(F.col("__h") < F.lit(float(prefilter)))
    per = per.distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h").asc())
    ranked = per.withColumn("__r", F.row_number().over(w)).where(F.col("__r") <= k)
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("__h").alias("__hk")
    )
    kmv_est = F.round(F.lit(float(k - 1)) / F.col("__hk"), round_to)
    if prefilter is None:
        est = F.when(
            F.col("n_seen") < k, F.col("n_seen").cast("double")
        ).otherwise(kmv_est)
        return agg.select(*group_cols, "n_seen", est.alias("est_distinct"))
    scaled = F.round(
        F.col("n_seen").cast("double") / F.lit(float(prefilter)), round_to
    )
    est = F.when(F.col("n_seen") < k, scaled).otherwise(kmv_est)
    return agg.select(
        *group_cols,
        "n_seen",
        est.alias("est_distinct"),
        F.lit(False).alias("est_is_exact"),
    )


def histogram_quantiles(
    df: DataFrame,
    value: str,
    group_cols: list,
    lo: float,
    hi: float,
    n_bins: int = 64,
    quantiles: tuple = (0.5, 0.9, 0.99),
    round_to: int = 6,
) -> DataFrame:
    """Fixed-range histogram quantile estimates per group: values bin into
    ``n_bins`` equal-width buckets over [lo, hi] (clamped), the quantile
    is linearly interpolated inside the first bucket whose cumulative
    count reaches q * total. Per-group state is n_bins counters —
    constant, mergeable, one shuffle — the deterministic cousin of
    t-digest/percentile_approx whose result an oracle can replay exactly
    (their merge orders are engine-private). Error is bounded by the bin
    width; pick the range from domain knowledge or a prior min/max pass.

    Output: group_cols + (q, est).
    """
    width = (float(hi) - float(lo)) / int(n_bins)
    v = F.col(value).cast("double")
    b = F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int")
    bin_col = F.least(F.lit(int(n_bins) - 1), F.greatest(F.lit(0), b))
    hist = df.groupBy(*group_cols, bin_col.alias("__bin")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # cumulative AND total from the same window partitioning — one
    # exchange feeds both (a separate groupBy+join would add two)
    w = Window.partitionBy(*group_cols).orderBy("__bin")
    wt = Window.partitionBy(*group_cols)
    cum = hist.withColumn("__cum", F.sum("__cnt").over(w)).withColumn(
        "__total", F.sum("__cnt").over(wt)
    )
    qcol = F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    thresh = F.col("q") * F.col("__total").cast("double")
    first = (
        cum.select(*group_cols, "__bin", "__cnt", "__cum", "__total", qcol)
        .where(F.col("__cum").cast("double") >= thresh)
        .groupBy(*group_cols, "q")
        .agg(F.min(F.struct("__bin", "__cum", "__cnt", "__total")).alias("__f"))
    )
    qt = F.col("q") * F.col("__f.__total").cast("double")
    cum_before = (F.col("__f.__cum") - F.col("__f.__cnt")).cast("double")
    frac = (qt - cum_before) / F.col("__f.__cnt").cast("double")
    est = F.round(
        F.lit(float(lo))
        + (F.col("__f.__bin").cast("double") + F.greatest(F.lit(0.0), frac))
        * F.lit(width),
        round_to,
    )
    return first.select(*group_cols, "q", est.alias("est"))


def _cms_bucket(token, j: int, width: int, salt: str):
    """Row-j counter bucket for a token: the shared 60-bit md5 hash
    (dedup.gram_hash_expr) of the salted token, mod width."""
    from .dedup import gram_hash_expr

    t = F.col(token) if isinstance(token, str) else token
    return gram_hash_expr(F.concat(F.lit(f"{salt}{j}:"), t)) % F.lit(int(width))


def cms_build(
    df: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 4096,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a token column:
    a (row, bucket, cnt) counter table with at most depth * width rows.

    Scale shape: one scan; the posexplode multiplies rows by ``depth``
    BEFORE the shuffle, but map-side partial aggregation collapses each
    partition's contribution to <= depth * width counters — so the
    exchange moves bounded state regardless of corpus size or vocabulary,
    which is the whole point vs an exact token groupBy. The finished
    sketch is broadcastable and mergeable (counter-wise sum).
    """
    buckets = F.array(*[
        _cms_bucket(token_col, j, width, salt) for j in range(depth)
    ])
    per = df.select(F.posexplode(buckets).alias("row", "bucket"))
    return per.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    tokens: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 4096,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for each row of ``tokens``: the estimate is
    min over the depth rows of the addressed counters (0 when a bucket
    was never touched). CMS guarantees estimate >= true count, with the
    overestimate bounded by the collision mass e*N/width w.h.p.

    The sketch is broadcast (<= depth * width rows); the lookup is a
    stateless bucket computation + equi-join — no corpus access at all.
    """
    buckets = F.array(*[
        _cms_bucket(token_col, j, width, salt) for j in range(depth)
    ])
    addressed = tokens.select(
        token_col, F.posexplode(buckets).alias("row", "bucket")
    )
    hit = addressed.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return hit.groupBy(token_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count")
    )
