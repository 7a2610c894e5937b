"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force baseline — broadcast the (small) query set,
  native dot products, window top-k. Exact; scales linearly in corpus size.
- ``ivf_topk``: scale path — coarse quantizer (deterministic grid/LSH
  centroids) partitions the corpus; queries probe only matching partitions.
- ``srp_bucket_expr``: sign-random-projection bucket for LSH blocking.

Dot products use ``F.zip_with`` + ``F.aggregate`` (native, no UDF). For
cross-engine oracle determinism the decimal variant ``dot_decimal_expr``
accumulates per-term products as DECIMAL(30,12) — exact, order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..checkpoint import checkpoint_df


def dot_expr(v1, v2):
    return F.aggregate(
        F.zip_with(v1, v2, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_decimal_expr(v1, v2, scale: int = 12):
    """Order-independent exact dot product: each term rounded to DECIMAL(38,12)
    then summed as decimals (deterministic across engines/partitionings)."""
    prods = F.zip_with(
        v1, v2, lambda a, b: (a.cast("double") * b.cast("double")).cast(f"decimal(38,{scale})")
    )
    return F.aggregate(
        prods,
        F.lit(0).cast(f"decimal(38,{scale})"),
        # Spark widens decimal addition (38,12)+(38,12) -> (38,11); cast back
        # so the merge type equals the accumulator type (exact for our
        # magnitudes: |terms| << 10^26)
        lambda acc, x: (acc + x).cast(f"decimal(38,{scale})"),
    )


def norm_decimal_expr(v, scale: int = 12):
    return dot_decimal_expr(v, v, scale)


def cosine_expr(v1, v2):
    """Cosine similarity, deterministic decimal accumulation, double result."""
    num = dot_decimal_expr(v1, v2).cast("double")
    den = F.sqrt(norm_decimal_expr(v1).cast("double")) * F.sqrt(
        norm_decimal_expr(v2).cast("double")
    )
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def dot_inorder_expr(v1, v2, dim_hint: int | None = None):
    """Sequential left-fold double dot product. Deterministic because both
    engines execute the identical IEEE op sequence (Spark's aggregate and
    DuckDB's list_sum both fold the list left-to-right) — ~2x faster than
    the decimal accumulation, used on the top-k rerank hot paths.

    ``dim_hint`` (guide §1.2 per-task work): when the caller knows the
    vector dimension, rows matching it take an UNROLLED static sum —
    0.0 + x1 + x2 + ... — which whole-stage codegen compiles to straight
    multiply-adds instead of an interpreted HOF lambda per element. The
    leading literal 0.0 makes the unrolled chain the exact fold op
    sequence, so results are bit-identical; rows whose size mismatches
    the hint fall back to the fold."""
    if dim_hint:
        terms = [
            F.element_at(v1, i).cast("double")
            * F.element_at(v2, i).cast("double")
            for i in range(1, dim_hint + 1)
        ]
        unrolled = F.lit(0.0)
        for t in terms:
            unrolled = unrolled + t
        return F.when(
            (F.size(v1) == dim_hint) & (F.size(v2) == dim_hint), unrolled
        ).otherwise(dot_inorder_expr(v1, v2))
    prods = F.zip_with(v1, v2, lambda a, b: a.cast("double") * b.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine_fast_expr(v1, v2, dim_hint: int | None = None):
    """Cosine on the in-order double fold (see dot_inorder_expr)."""
    num = dot_inorder_expr(v1, v2, dim_hint)
    den = F.sqrt(dot_inorder_expr(v1, v1, dim_hint)) * F.sqrt(
        dot_inorder_expr(v2, v2, dim_hint)
    )
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force top-k: broadcast queries x corpus, rank by
    (cosine desc, corpus id) for determinism. Output: query_id, neighbor_id,
    cosine, rank."""
    # precompute per-side norms once (recomputing them per pair would
    # multiply the decimal-accumulation work by the other side's cardinality)
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        F.sqrt(dot_inorder_expr(F.col(query_vec), F.col(query_vec))).alias("__qn"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        F.sqrt(dot_inorder_expr(F.col(corpus_vec), F.col(corpus_vec))).alias("__cn"),
    )
    den = F.col("__qn") * F.col("__cn")
    num = dot_inorder_expr(F.col("__qv"), F.col("__cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), 8).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _srp_weights(n_planes: int, seed: int, dim: int) -> list:
    """Driver-side replica of the md5 plane weights, bit-exact to the SQL
    expression: conv(hex, 16, 10) yields an integer < 2**32 (exactly
    representable), the division is by 16**8 == 2**32 (a power of two, so
    exact), and the 0.5 subtraction is exact — every step is the same IEEE
    double the JVM computes."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:8], 16)
            / float(16**8)
            - 0.5
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def _srp_proj_md5(v, j: int, seed: int):
    """One plane's projection with weights derived per element by md5 at
    RUNTIME — the general-dim path (and the SQL-oracle-shaped original)."""
    return F.aggregate(
        F.zip_with(
            v,
            F.sequence(F.lit(0), F.size(v) - 1),
            lambda x, i: x.cast("double")
            * (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{seed}:{j}:"), i.cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("double")
                / F.lit(float(16**8))
                - F.lit(0.5)
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def srp_bucket_expr(vec, n_planes: int = 12, seed: int = 7, dim_hint: int | None = None):
    """Sign-random-projection bucket id (string of sign bits). Plane j weight
    for dimension i = md5-derived pseudo-random in [-0.5, 0.5) — deterministic,
    no data movement, reproducible in SQL.

    ``dim_hint`` (guide §1.2 per-task work): when the caller knows the
    common vector dimension, the plane weights are precomputed driver-side
    (bit-exact, see ``_srp_weights``) and embedded as literal arrays, so
    each row's projection is a plain zip_with multiply-add instead of
    ``n_planes * dim`` runtime md5+conv string evaluations (384 md5 calls
    per row at dim 64 / 6 planes). Rows whose actual size differs from the
    hint (and null vectors) fall back to the md5 path via a per-row guard,
    so results are identical for EVERY input regardless of the hint."""
    v = F.col(vec) if isinstance(vec, str) else vec
    if dim_hint:
        W = _srp_weights(n_planes, seed, dim_hint)
        fast_bits = []
        for j in range(n_planes):
            wj = F.array(*[F.lit(w) for w in W[j]])
            proj = F.aggregate(
                F.zip_with(v, wj, lambda x, w: x.cast("double") * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            fast_bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        slow_bits = [
            F.when(_srp_proj_md5(v, j, seed) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(n_planes)
        ]
        return F.when(F.size(v) == dim_hint, F.concat(*fast_bits)).otherwise(
            F.concat(*slow_bits)
        )
    bits = [
        F.when(_srp_proj_md5(v, j, seed) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(n_planes)
    ]
    return F.concat(*bits)


def _flip_bit_expr(bucket, j):
    """Flip character j (0-based) of a '0'/'1' bucket string (native)."""
    b = bucket
    flipped = F.when(F.substring(b, j + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1"))
    return F.concat(F.substring(b, 1, j), flipped, F.substring(b, j + 2, 2_000_000))


def multiprobe_from_base_expr(base, n_planes: int = 6, radius: int = 1):
    """Probe-bucket array derived from an ALREADY-COMPUTED bucket column:
    the base plus every bucket within Hamming ``radius``. Each flip embeds
    ``base`` three times (two substrings + the condition), so deriving the
    flips from a staged column instead of re-inlining the full SRP tree
    shrinks the expression by ~3 * n_planes SRP evaluations per row
    (guide §1.2 — the optimizer does not CSE textually-duplicated
    aggregate lambdas)."""
    probes = [base]
    if radius >= 1:
        probes += [_flip_bit_expr(base, j) for j in range(n_planes)]
    if radius >= 2:
        for a in range(n_planes):
            for b in range(a + 1, n_planes):
                probes.append(_flip_bit_expr(_flip_bit_expr(base, a), b))
    return F.array(*probes)


def multiprobe_buckets_expr(
    vec,
    n_planes: int = 6,
    seed: int = 7,
    radius: int = 1,
    dim_hint: int | None = None,
):
    """Array of probe buckets: the vector's own SRP bucket plus every bucket
    within the given Hamming radius (radius 1 => n_planes+1 probes). Probing
    neighbors recovers candidates that a near-boundary projection pushed into
    an adjacent bucket — the standard multiprobe-LSH recall fix.

    NOTE: the base bucket expression is inlined into every flip; when you
    can stage the base as a column first, prefer
    ``srp_bucket_expr`` + ``multiprobe_from_base_expr`` (see ivf_topk)."""
    base = srp_bucket_expr(vec, n_planes, seed, dim_hint=dim_hint)
    return multiprobe_from_base_expr(base, n_planes, radius)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    n_planes: int = 6,
    probe_radius: int = 1,
    dim_hint: int | None = None,
) -> DataFrame:
    """Approximate top-k: SRP-bucket the corpus (inverted file); each query
    probes its own bucket plus all buckets within Hamming ``probe_radius``
    (multiprobe). The corpus keeps ONE bucket per vector, so a candidate pair
    joins at most once — no dedup shuffle. Scale path when the corpus no
    longer fits the brute-force broadcast cross-join; probe_radius trades
    compute for recall (radius 1 lifts recall to ~1.0 on clustered data).
    ``dim_hint`` engages the literal-weight SRP fast path (bit-identical,
    see srp_bucket_expr); the base bucket is staged as a column so the
    Hamming flips reference it instead of re-inlining the SRP tree."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        srp_bucket_expr(query_vec, n_planes, dim_hint=dim_hint).alias("__b"),
    ).select(
        "query_id",
        "__qv",
        F.explode(
            multiprobe_from_base_expr(F.col("__b"), n_planes, radius=probe_radius)
        ).alias("__bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        srp_bucket_expr(corpus_vec, n_planes, dim_hint=dim_hint).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), on="__bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine_fast_expr(F.col("__qv"), F.col("__cv")), 8).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def knn_join(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    probe_radius: int = 1,
    dim_hint: int | None = None,
) -> DataFrame:
    """Approximate k-NN SELF-join: every vector finds its top-k neighbors
    among all others — the all-pairs similarity-search shape (dedup graph
    building, recommendation candidates), distinct from fixed-query top-k.

    Unlike :func:`ivf_topk`, NEITHER side broadcasts (both are the full
    corpus): candidates come from a shuffle hash equi-join on the SRP
    bucket key — the corpus keeps ONE bucket per vector while the probe
    side explodes to its Hamming-``probe_radius`` neighborhood, so a pair
    joins at most once and no dedup shuffle is needed. Per-point top-k is
    a window over the candidate set (partitioned by the point — scales
    with keys, never a global sort). Self-matches are excluded.
    ``dim_hint``: see ivf_topk."""
    q = df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        srp_bucket_expr(vec_col, n_planes, dim_hint=dim_hint).alias("__b"),
    ).select(
        "query_id",
        "__qv",
        F.explode(
            multiprobe_from_base_expr(F.col("__b"), n_planes, radius=probe_radius)
        ).alias("__bucket"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        srp_bucket_expr(vec_col, n_planes, dim_hint=dim_hint).alias("__bucket"),
    )
    scored = (
        c.join(q, on="__bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_fast_expr(F.col("__qv"), F.col("__cv")), 8).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def dist2_decimal_expr(v1, v2, scale: int = 12):
    """Squared L2 distance with the same order-independent decimal
    accumulation as dot_decimal_expr (deterministic across engines)."""
    diffs = F.zip_with(v1, v2, lambda a, b: a.cast("double") - b.cast("double"))
    return dot_decimal_expr(diffs, diffs, scale)


def _centroid_df(spark, cents):
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("__cid", LongType(), False),
            StructField("__cvec", ArrayType(DoubleType()), False),
        ]
    )
    return spark.createDataFrame([(int(c), list(v)) for c, v in cents], schema)


def assign_clusters(
    df: DataFrame,
    cent_df: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid table,
    exact decimal distances, ties broken by centroid id. Output:
    (id_col, vec, cid) — one row per input row."""
    d2 = dist2_decimal_expr(F.col(vec), F.col("__cvec")).alias("__d2")
    scored = df.crossJoin(F.broadcast(cent_df)).select(
        F.col(id_col), F.col(vec), F.col("__cid"), d2
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct(F.col("__d2"), F.col("__cid"))).alias("__m"),
        F.first(vec).alias(vec),
    )
    return best.select(id_col, vec, F.col("__m.__cid").alias("cid"))


# ---------------------------------------------------------------------------
# Driver-local exact trainer (small-corpus fast path)
#
# faiss-style practice: k-means / PQ codebooks train on a sample that fits
# in one machine; only corpus ASSIGNMENT and search need the cluster. When
# Catalyst's plan-time size estimate says the training input is small, we
# collect it and run the SAME algorithm locally — bit-identical to the
# distributed pipeline (and therefore to the SQL oracles) because every
# decimal operation is replicated exactly:
#   - CAST(double AS DECIMAL(38,12)) == Decimal(repr(x)) HALF_UP at 12 dp
#     (JVM BigDecimal.valueOf uses the shortest round-trip repr, as repr())
#   - dist2_decimal_expr's fold widens each (38,12)+(38,12) step to (38,11)
#     == per-step HALF_UP quantize at 11 dp (verified against Spark)
#   - SUM over DECIMAL(38,12) is an exact integer sum at scale 1e12
#   - CAST(decimal AS DOUBLE) == float(Decimal) (nearest double)
# Assignment argmins run vectorized in float64 with a 1e-6 near-tie escape
# to the exact decimal fold (float error here is < 1e-9), so the hot loop
# is numpy while every tie resolves exactly as Spark would.
# ---------------------------------------------------------------------------

import os as _os
from decimal import ROUND_HALF_UP as _HALF_UP, Decimal as _Dec

import numpy as _np

_E12 = _Dec("1e-12")
_E11 = _Dec("1e-11")

LOCAL_TRAIN_DISABLED = _os.environ.get("SPARK_GRAFT_DISABLE_LOCAL_TRAIN", "") == "1"
_LOCAL_TRAIN_MAX_BYTES = 256 << 20


def _dec12(x) -> _Dec:
    """Replica of Spark ``CAST(double AS DECIMAL(38,12))``."""
    return _Dec(repr(float(x))).quantize(_E12, rounding=_HALF_UP)


def _fold_d2(a, b) -> _Dec:
    """Replica of ``dist2_decimal_expr``: 12 dp term cast, 11 dp per-step
    accumulate (Spark widens (38,12)+(38,12) -> (38,11))."""
    acc = _Dec(0)
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc = (acc + _dec12(d * d)).quantize(_E11, rounding=_HALF_UP)
    return acc


def _plan_size_bytes(df: DataFrame):
    """Catalyst plan-time size estimate — no job (same trick as the auto
    spatial-join strategy)."""
    try:
        if df.isStreaming:
            return None
        jstats = df._jdf.queryExecution().optimizedPlan().stats()
        size = jstats.sizeInBytes()
        # Py4J maps scala BigInt to a Python int directly; older bridges
        # hand back the Java object
        return size if isinstance(size, int) else int(size.toString())
    except Exception:
        return None


def _collect_if_small(corpus: DataFrame, id_col: str, vec: str):
    """[(id, [float, ...])] sorted by id if the training input is estimated
    small enough to collect, else None (caller uses the distributed path)."""
    if LOCAL_TRAIN_DISABLED:
        return None
    size = _plan_size_bytes(corpus)
    if size is None or size > _LOCAL_TRAIN_MAX_BYTES:
        return None
    rows = corpus.select(id_col, vec).collect()
    rows = [(r[0], [float(x) for x in r[1]]) for r in rows]
    rows.sort(key=lambda r: r[0])
    return rows


def _assigned_local_df(spark, corpus, id_col, vec, local_rows, cents,
                       with_vec: bool):
    """Driver-local replica of ``assign_clusters`` over an already-collected
    corpus: (id[, vec], cid) DataFrame, bit-identical to the distributed
    broadcast-cross-join + min(struct(d2, cid)) (see ``_assign_local`` for
    the exact-decimal tie contract). Returns None when the collected rows
    are not a clean 2-D matrix — caller uses the distributed path. Saves a
    corpus re-scan AND the k_clusters x dim exact-decimal distance
    evaluation per corpus row (guide §2.4: the corpus was already
    collected for training; assignment is a pure function of it)."""
    from pyspark.sql.types import LongType, StructField, StructType

    X = _np.asarray([v for _, v in local_rows], dtype=_np.float64)
    if X.ndim != 2 or X.shape[0] == 0:
        return None
    idx = _assign_local(X, cents)
    cid_of = [int(cents[i][0]) for i in idx]
    src = corpus.select(id_col, vec).schema
    if with_vec:
        fields = [src[0], src[1], StructField("cid", LongType(), False)]
        rows = [(rid, v, c) for (rid, v), c in zip(local_rows, cid_of)]
    else:
        fields = [src[0], StructField("cid", LongType(), False)]
        rows = [(rid, c) for (rid, _), c in zip(local_rows, cid_of)]
    return spark.createDataFrame(rows, StructType(fields))


def _codes_local_df(spark, corpus, id_col, local_rows, pcents, m: int, w: int):
    """Driver-local replica of ``pq_encode`` over an already-collected
    corpus: (vid, s, code) DataFrame. Same exact-decimal tie contract as
    ``_assigned_local_df``; None -> caller uses the distributed path."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    X = _np.asarray([v for _, v in local_rows], dtype=_np.float64)
    if X.ndim != 2 or X.shape[0] == 0 or X.shape[1] != m * w:
        return None
    id_field = corpus.select(id_col).schema[0]
    rows = []
    for s in range(m):
        sub_cents = [(code, v) for (cs, code, v) in pcents if cs == s]
        idx = _assign_local(X[:, s * w:(s + 1) * w], sub_cents)
        rows += [
            (rid, s, int(sub_cents[i][0]))
            for (rid, _), i in zip(local_rows, idx)
        ]
    schema = StructType([
        StructField("vid", id_field.dataType, id_field.nullable),
        StructField("s", IntegerType(), False),
        StructField("code", IntegerType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def _dec12_int_matrix(X: _np.ndarray) -> _np.ndarray:
    """(n, d) int64 of CAST(v AS DECIMAL(38,12)) scaled by 1e12 — the exact
    summands of the distributed centroid update, summable in numpy."""
    flat = [int(_dec12(x).scaleb(12)) for x in X.ravel().tolist()]
    return _np.asarray(flat, dtype=_np.int64).reshape(X.shape)


def _assign_local(X: _np.ndarray, cents: list) -> _np.ndarray:
    """Per-row index into ``cents`` of the nearest centroid under the exact
    decimal metric, ties by centroid id (``min(struct(d2, cid))`` replica).
    ``cents`` must be sorted ascending by id."""
    C = _np.asarray([c[-1] for c in cents], dtype=_np.float64)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    best = _np.argmin(d2, axis=1)  # first minimum = lowest cid
    mind = d2[_np.arange(len(X)), best]
    # scale-aware near-tie window: float64 summation error grows with the
    # d2 magnitude (~dims * eps * d2), so an absolute 1e-6 alone would
    # miss genuine ties on large-magnitude vectors
    tol = 1e-6 + 1e-9 * float(d2.max(initial=0.0))
    near = d2 <= (mind[:, None] + tol)
    for i in _np.flatnonzero(near.sum(axis=1) > 1):
        cand = _np.flatnonzero(near[i])
        exact = [(_fold_d2(X[i], C[j]), j) for j in cand]
        best[i] = min(exact)[1]
    return best


def _exact_means(V12: _np.ndarray, assign: _np.ndarray, n_cents: int):
    """[(cent_index, [mean, ...])] for non-empty centroids: exact int sums
    at 1e12 scale, CAST(sum AS DOUBLE) / CAST(n AS DOUBLE) replica."""
    n, d = V12.shape
    sums = _np.zeros((n_cents, d), dtype=_np.int64)
    _np.add.at(sums, assign, V12)
    counts = _np.bincount(assign, minlength=n_cents)
    out = []
    for j in range(n_cents):
        if counts[j]:
            cnt = float(counts[j])
            out.append(
                (j, [float(_Dec(int(s)).scaleb(-12)) / cnt for s in sums[j]])
            )
    return out


def _int64_sum_safe(X: _np.ndarray) -> bool:
    """int64 headroom guard for the 1e12-scaled sums."""
    if X.size == 0:
        return True
    return float(_np.abs(X).max()) * 1e12 * X.shape[0] < 4e18


def _kmeans_train_local(rows: list, k: int, iters: int) -> list:
    X = _np.asarray([v for _, v in rows], dtype=_np.float64)
    if X.ndim != 2 or not _int64_sum_safe(X):
        return None
    cents = [(i, list(X[i])) for i in range(min(k, len(rows)))]
    V12 = _dec12_int_matrix(X)
    for _ in range(iters):
        assign = _assign_local(X, cents)
        by_idx = _exact_means(V12, assign, len(cents))
        cents = sorted((cents[j][0], mean) for j, mean in by_idx)
    return cents


def _pq_train_local(rows: list, m: int, k_codes: int, iters: int, w: int) -> list:
    X = _np.asarray([v for _, v in rows], dtype=_np.float64)
    if X.ndim != 2 or not _int64_sum_safe(X):
        return None
    n_init = min(k_codes, len(rows))
    cents = sorted(
        (s, c, list(X[c][s * w : (s + 1) * w]))
        for c in range(n_init)
        for s in range(m)
    )
    V12 = _dec12_int_matrix(X)
    for _ in range(iters):
        new_cents = []
        for s in range(m):
            sub_cents = [(c, v) for (cs, c, v) in cents if cs == s]
            Xs = X[:, s * w : (s + 1) * w]
            assign = _assign_local(Xs, sub_cents)
            by_idx = _exact_means(V12[:, s * w : (s + 1) * w], assign, len(sub_cents))
            new_cents.extend((s, sub_cents[j][0], mean) for j, mean in by_idx)
        cents = sorted(new_cents)
    return cents


def kmeans_train(
    corpus: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> list:
    """Lloyd's k-means, expressed as DataFrame ops so it runs at corpus
    scale: assignment is a broadcast cross-join + groupBy-min; the centroid
    update is posexplode + per-(cluster, dim) exact decimal sums. Only the
    k x d centroid matrix is collected per iteration (a few KB) — the
    corpus never leaves the executors. Deterministic end-to-end: decimal
    sums are order-independent, means are exact-sum / count in doubles,
    init is the k lowest-id vectors — so a fixed-iteration run is
    reproducible bit-exactly in ANSI SQL (see the kmeans IVF oracle).

    At 100 TB, train on a sample (``corpus.sample(...)``) and reuse the
    centroids; assignment of the full corpus stays fully distributed.

    When the training input is plan-estimated small (< 256 MB), the whole
    algorithm runs driver-local instead — one collect job replaces
    ``2 * iters`` driver-synchronous Spark jobs, with bit-identical output
    (see the exact-decimal replica notes above)."""
    local_rows = _collect_if_small(corpus, id_col, vec)
    if local_rows is not None:
        cents = _kmeans_train_local(local_rows, k, iters)
        if cents is not None:
            return cents
    spark = corpus.sparkSession
    init_rows = (
        corpus.orderBy(id_col).limit(k).select(vec).collect()
    )
    cents = [(i, [float(x) for x in r[0]]) for i, r in enumerate(init_rows)]
    for _ in range(iters):
        cdf = _centroid_df(spark, cents)
        assigned = assign_clusters(corpus, cdf, vec=vec, id_col=id_col)
        ex = assigned.select("cid", F.posexplode(F.col(vec)).alias("dim", "val"))
        sums = ex.groupBy("cid", "dim").agg(
            F.sum(F.col("val").cast("double").cast("decimal(38,12)")).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        rows = (
            sums.select(
                "cid",
                "dim",
                (F.col("__s").cast("double") / F.col("__n").cast("double")).alias("v"),
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "v"))),
                    lambda s: s["v"],
                ).alias("cvec")
            )
            .collect()
        )
        cents = sorted((int(r["cid"]), [float(x) for x in r["cvec"]]) for r in rows)
    return cents


def kmeans_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 5,
    k_clusters: int = 8,
    iters: int = 2,
    nprobe: int = 2,
) -> DataFrame:
    """IVF with LEARNED (k-means) centroids: train, partition the corpus by
    nearest centroid, probe the ``nprobe`` nearest cells per query, exact
    cosine rerank inside the probed cells. The learned partitioning adapts
    to the data distribution (vs the data-agnostic SRP planes of ivf_topk),
    which is what lifts recall on clustered embeddings at the same probe
    budget. Every stage is a broadcast or equi-join — no all-pairs.

    Size-gated local fast path (guide §2.4): when the corpus is
    plan-estimated small it is collected ONCE and both training and the
    final corpus assignment run driver-local (bit-identical replicas, see
    _kmeans_train_local / _assigned_local_df) — one collect job replaces
    the training jobs plus a corpus re-scan and the per-row k x d
    exact-decimal assignment. At scale the distributed path is unchanged:
    train on a sample, assign fully distributed."""
    spark = queries.sparkSession
    local_rows = _collect_if_small(corpus, corpus_id, corpus_vec)
    cents = _kmeans_train_local(local_rows, k_clusters, iters) \
        if local_rows is not None else None
    if cents is None:
        cents = kmeans_train(corpus, vec=corpus_vec, id_col=corpus_id,
                             k=k_clusters, iters=iters)
    cdf = _centroid_df(spark, cents)
    assigned = None
    if local_rows is not None:
        la = _assigned_local_df(spark, corpus, corpus_id, corpus_vec,
                                local_rows, cents, with_vec=True)
        if la is not None:
            assigned = la.select(
                F.col(corpus_id).alias("neighbor_id"),
                F.col(corpus_vec).alias("__cv"),
                "cid",
            )
    if assigned is None:
        assigned = assign_clusters(
            corpus, cdf, vec=corpus_vec, id_col=corpus_id
        ).select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(corpus_vec).alias("__cv"),
            "cid",
        )
    qd = queries.crossJoin(F.broadcast(cdf)).select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        F.col("__cid"),
        dist2_decimal_expr(F.col(query_vec), F.col("__cvec")).alias("__d2"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__d2").asc(), F.col("__cid").asc())
    probes = (
        qd.withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= nprobe)
        .select("query_id", "__qv", F.col("__cid").alias("cid"))
    )
    cands = probes.join(assigned, on="cid")
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_fast_expr(F.col("__qv"), F.col("__cv")), 8).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ, no-residual variant)
# ---------------------------------------------------------------------------

def _subspace_rows(df: DataFrame, vec: str, id_col: str, m: int, w: int):
    """(id, s, subvec) long format: one row per vector per subspace."""
    return df.selectExpr(
        f"{id_col} AS vid",
        f"posexplode(transform(sequence(0, {m - 1}),"
        f" s -> slice({vec}, s * {w} + 1, {w}))) AS (s, subvec)",
    )


def _pq_centroid_df(spark, cents):
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("s", IntegerType(), False),
            StructField("code", IntegerType(), False),
            StructField("__cvec", ArrayType(DoubleType()), False),
        ]
    )
    return spark.createDataFrame(
        [(int(s), int(c), list(v)) for s, c, v in cents], schema
    )


def pq_train(
    corpus: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k_codes: int = 8,
    iters: int = 2,
    dim: int | None = None,
) -> list:
    """Per-subspace k-means codebooks (product quantization — Jegou,
    Douze, Schmid, "Product quantization for nearest neighbor search",
    TPAMI 2011). All m subspaces train in the SAME jobs: vectors explode
    to (id, subspace, subvec) rows once, assignment is one broadcast join
    keyed by subspace, the update one grouped exact-decimal mean — so the
    training cost is independent of m. Deterministic like kmeans_train
    (init = the k_codes lowest-id vectors' slices), hence SQL-mirrorable.

    Returns [(s, code, centroid_subvec)] with m * k_codes entries.

    Small training inputs dispatch to the exact driver-local replica, like
    :func:`kmeans_train`."""
    spark = corpus.sparkSession
    if dim is None:
        dim = len(corpus.select(vec).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = dim // m
    local_rows = _collect_if_small(corpus, id_col, vec)
    if local_rows is not None:
        cents = _pq_train_local(local_rows, m, k_codes, iters, w)
        if cents is not None:
            return cents
    sub = _subspace_rows(corpus, vec, id_col, m, w).localCheckpoint(eager=True)

    init = (
        corpus.orderBy(id_col).limit(k_codes).selectExpr(
            f"{id_col} AS vid", f"{vec} AS v"
        ).collect()
    )
    cents = [
        (s, c, [float(x) for x in r["v"][s * w : (s + 1) * w]])
        for c, r in enumerate(init)
        for s in range(m)
    ]
    for _ in range(iters):
        cdf = _pq_centroid_df(spark, cents)
        d2 = dist2_decimal_expr(F.col("subvec"), F.col("__cvec")).alias("__d2")
        scored = sub.join(F.broadcast(cdf), on="s").select(
            "vid", "s", "subvec", "code", d2
        )
        best = scored.groupBy("vid", "s").agg(
            F.min(F.struct(F.col("__d2"), F.col("code"))).alias("__m"),
            F.first("subvec").alias("subvec"),
        )
        ex = best.select(
            "s", F.col("__m.code").alias("code"),
            F.posexplode(F.col("subvec")).alias("dim", "val"),
        )
        rows = (
            ex.groupBy("s", "code", "dim")
            .agg(
                F.sum(F.col("val").cast("double").cast("decimal(38,12)")).alias("__sum"),
                F.count(F.lit(1)).alias("__n"),
            )
            .select(
                "s", "code", "dim",
                (F.col("__sum").cast("double") / F.col("__n").cast("double")).alias("v"),
            )
            .groupBy("s", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "v"))),
                    lambda t: t["v"],
                ).alias("cvec")
            )
            .collect()
        )
        cents = sorted(
            (int(r["s"]), int(r["code"]), [float(x) for x in r["cvec"]]) for r in rows
        )
    return cents


def pq_encode(
    corpus: DataFrame,
    cents: list,
    vec: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Assign every vector its per-subspace code: (vid, s, code) long
    format — the m-byte compressed representation that replaces the full
    vector in candidate scoring (and in shuffles)."""
    w = dim // m
    spark = corpus.sparkSession
    cdf = _pq_centroid_df(spark, cents)
    sub = _subspace_rows(corpus, vec, id_col, m, w)
    d2 = dist2_decimal_expr(F.col("subvec"), F.col("__cvec")).alias("__d2")
    scored = sub.join(F.broadcast(cdf), on="s").select("vid", "s", "code", d2)
    return scored.groupBy("vid", "s").agg(
        F.min(F.struct(F.col("__d2"), F.col("code"))).alias("__m")
    ).select("vid", "s", F.col("__m.code").alias("code"))


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 5,
    k_clusters: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    m: int = 4,
    k_codes: int = 8,
    pq_iters: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ approximate nearest neighbors: coarse k-means cells prune
    the search (probe ``nprobe`` cells), product-quantization codes score
    the surviving candidates by asymmetric distance (ADC) — the query
    keeps full precision, each candidate is represented by its m codebook
    entries, and the squared-L2 estimate is the sum of m table lookups.

    The 100 TB shape: full vectors are touched exactly twice (coarse
    assignment + encoding, both embarrassingly parallel); candidate
    scoring joins the (qid, s, code) distance table (tiny, broadcast)
    against the m-row code representation — the shuffle carries m ints
    per candidate instead of the d-float vector, which is the entire
    point of PQ at scale. No-residual variant (codes quantize raw
    vectors, not cell residuals) so every stage stays a plain
    deterministic join, bit-exactly mirrored by the SQL oracle.

    Returns (query_id, neighbor_id, adc_d2, rank) — rank by estimated
    distance, ascending, ties on neighbor id."""
    spark = queries.sparkSession
    if dim is None:
        dim = len(corpus.select(corpus_vec).first()[0])
    w = dim // m

    # coarse quantizer: learned cells + corpus assignment (existing IVF).
    # One shared collect feeds both local trainers when the corpus is
    # plan-estimated small; otherwise each falls back to its distributed
    # training pipeline independently.
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    local_rows = _collect_if_small(corpus, corpus_id, corpus_vec)
    ccents = pcents = None
    if local_rows is not None:
        ccents = _kmeans_train_local(local_rows, k_clusters, iters)
        pcents = _pq_train_local(local_rows, m, k_codes, pq_iters, dim // m)
    if ccents is None:
        ccents = kmeans_train(corpus, vec=corpus_vec, id_col=corpus_id,
                              k=k_clusters, iters=iters)
    if pcents is None:
        pcents = pq_train(corpus, vec=corpus_vec, id_col=corpus_id, m=m,
                          k_codes=k_codes, iters=pq_iters, dim=dim)
    cdf = _centroid_df(spark, ccents)
    # size-gated local fast path (guide §2.4): the corpus was already
    # collected for training — coarse assignment and PQ encoding are pure
    # functions of it, so compute both driver-local (bit-identical
    # replicas) instead of re-scanning the corpus twice and re-running the
    # exact-decimal distance evaluation distributed. Distributed path
    # unchanged when the corpus is big (the documented 100 TB shape:
    # vectors touched exactly twice, embarrassingly parallel).
    assigned = codes = None
    if local_rows is not None:
        la = _assigned_local_df(spark, corpus, corpus_id, corpus_vec,
                                local_rows, ccents, with_vec=False)
        lc = _codes_local_df(spark, corpus, corpus_id, local_rows, pcents,
                             m, dim // m)
        if la is not None and lc is not None:
            assigned = la.withColumnRenamed(corpus_id, "neighbor_id")
            codes = lc.withColumnRenamed("vid", "neighbor_id")
    if assigned is None or codes is None:
        assigned = assign_clusters(
            corpus, cdf, vec=corpus_vec, id_col=corpus_id
        ).select(F.col(corpus_id).alias("neighbor_id"), "cid")
        codes = pq_encode(corpus, pcents, vec=corpus_vec, id_col=corpus_id,
                          m=m, dim=dim).withColumnRenamed("vid", "neighbor_id")

    # query-side: probed cells + per-subspace distance tables
    qd = queries.crossJoin(F.broadcast(cdf)).select(
        F.col(query_id).alias("query_id"),
        F.col("__cid"),
        dist2_decimal_expr(F.col(query_vec), F.col("__cvec")).alias("__d2"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__d2").asc(), F.col("__cid").asc())
    probes = (
        qd.withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= nprobe)
        .select("query_id", F.col("__cid").alias("cid"))
    )
    qsub = _subspace_rows(queries, query_vec, query_id, m, w).withColumnRenamed(
        "vid", "query_id"
    )
    pdf = _pq_centroid_df(spark, pcents)
    dtab = qsub.join(F.broadcast(pdf), on="s").select(
        "query_id", "s", "code",
        dist2_decimal_expr(F.col("subvec"), F.col("__cvec")).alias("__sd2"),
    )

    # ADC scoring of probed candidates over codes (no full vectors here)
    cands = probes.join(assigned, on="cid").select("query_id", "neighbor_id")
    scored = (
        cands.join(codes, on="neighbor_id")
        .join(dtab, on=["query_id", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("__sd2").alias("__adc"))
        .select(
            "query_id", "neighbor_id",
            F.round(F.col("__adc").cast("double"), 8).alias("adc_d2"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(wr)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# int8 scalar quantization
# ---------------------------------------------------------------------------

def amax_per_dim(corpus: DataFrame, vec: str = "embedding") -> DataFrame:
    """Single-row DataFrame with the per-dimension max-abs over the corpus
    (the symmetric int8 quantization scale). One posexplode + groupBy —
    output is d values, broadcastable anywhere."""
    ex = corpus.select(F.posexplode(F.col(vec)).alias("dim", "val"))
    am = ex.groupBy("dim").agg(F.max(F.abs(F.col("val").cast("double"))).alias("m"))
    return am.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("__amax")
    )


def quantize_expr(vec, amax):
    """Symmetric int8 encode: q_i = round(x_i / amax_i * 127). Exact
    double ops in both engines; zero-scale dimensions encode to 0."""
    return F.zip_with(
        vec,
        amax,
        lambda x, m: F.when(
            m > 0, F.round(x.cast("double") / m * F.lit(127.0), 0)
        )
        .otherwise(F.lit(0.0))
        .cast("int"),
    )


def _int_dot_expr(v1, v2):
    prods = F.zip_with(v1, v2, lambda a, b: (a * b).cast("long"))
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Brute-force top-k over int8 scalar-quantized embeddings: 4x less
    candidate traffic than float32 and EXACT integer dot products (an
    int64 sum of int8 products — bit-deterministic, no float-order
    concerns at all). The quantized cosine ranks candidates; at 100 TB
    this is the memory-bound rerank you run inside IVF cells, with the
    codes shuffling as d bytes instead of d floats.

    Output: query_id, neighbor_id, qcosine, rank.
    """
    # The quantization scale is MODEL STATE — one row of d doubles — and
    # it feeds BOTH the query-side and corpus-side encodes. As a broadcast
    # subtree it was planned twice (two complete corpus posexplode +
    # max-per-dim passes, one per encode side; r8 plan audit). Collecting
    # the single row (bounded by the embedding dimension, never the
    # corpus) and inlining it as a literal array computes the pass once;
    # Python floats round-trip IEEE-exactly, so every encode sees
    # bit-identical scales.
    am_row = amax_per_dim(corpus, vec=corpus_vec).collect()[0]
    ma = am_row["__amax"] or []
    am_col = (
        F.array(*[F.lit(float(v)) for v in ma])
        if ma
        else F.expr("CAST(array() AS array<double>)")  # empty corpus: same
        # zip_with padding semantics as the old empty __amax row
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        quantize_expr(F.col(query_vec), am_col).alias("__qq"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        quantize_expr(F.col(corpus_vec), am_col).alias("__cq"),
    )
    q = q.select(
        "query_id", "__qq",
        F.sqrt(_int_dot_expr(F.col("__qq"), F.col("__qq")).cast("double")).alias("__qn"),
    )
    c = c.select(
        "neighbor_id", "__cq",
        F.sqrt(_int_dot_expr(F.col("__cq"), F.col("__cq")).cast("double")).alias("__cn"),
    )
    den = F.col("__qn") * F.col("__cn")
    num = _int_dot_expr(F.col("__qq"), F.col("__cq")).cast("double")
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), 8).alias("qcosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Semantic deduplication (SemDeDup)
# ---------------------------------------------------------------------------

def semantic_dedup(
    corpus: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    k_clusters: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
    dim_hint: int | None = None,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means
    clusters the embedding space, then cosine pairs are examined ONLY
    within each cluster — a row is dropped when its cosine to any
    lower-id member of the same cluster reaches ``threshold`` (the
    deterministic keep-first policy; greedy, not transitive, so the
    decision is a pure pairwise predicate restatable in SQL).

    Scale shape: training touches only the k x d centroid matrix on the
    driver; assignment is a broadcast join; candidate generation is a
    self-equi-join on cluster id — pair count is sum over clusters of
    |cluster|^2 / 2 rather than |corpus|^2 / 2, and k_clusters is the
    knob that bounds it (at 100 TB pick k so the largest cell fits a
    shuffle partition, exactly like the IVF cell sizing).

    Output: (id_col, cid, kept) — one row per input row, kept=false for
    dropped near-duplicates.
    """
    spark = corpus.sparkSession
    # size-gated local fast path (guide §2.4, same as kmeans_ivf_topk):
    # a small corpus is collected ONCE and training + assignment run
    # driver-local, bit-identical to the distributed replicas
    local_rows = _collect_if_small(corpus, id_col, vec)
    cents = _kmeans_train_local(local_rows, k_clusters, iters) \
        if local_rows is not None else None
    if cents is None:
        cents = kmeans_train(
            corpus, vec=vec, id_col=id_col, k=k_clusters, iters=iters
        )
    assigned = None
    if local_rows is not None:
        assigned = _assigned_local_df(
            spark, corpus, id_col, vec, local_rows, cents, with_vec=True
        )
    if assigned is None:
        cdf = _centroid_df(spark, cents)
        # `assigned` is referenced THREE times (both pair-join sides and
        # the final keep join): checkpoint so the broadcast-cross-join
        # assignment pass runs once, not three times (§2.4;
        # checkpoint_df honors the reliable-checkpoint escape hatch)
        assigned = checkpoint_df(
            assign_clusters(corpus, cdf, vec=vec, id_col=id_col),
            eager=False,
        )
    # precompute each row's norm ONCE before the pair join — recomputing it
    # per pair would triple the dot-product work (the per-pair op sequence
    # is unchanged, so the rounded cosine stays bit-identical)
    norm = F.sqrt(dot_inorder_expr(F.col(vec), F.col(vec), dim_hint))
    a = assigned.select(
        F.col(id_col).alias("__aid"), F.col(vec).alias("__av"),
        norm.alias("__an"), "cid",
    )
    b = assigned.select(
        F.col(id_col).alias("__bid"), F.col(vec).alias("__bv"),
        norm.alias("__bn"), "cid",
    )
    den = F.col("__an") * F.col("__bn")
    num = dot_inorder_expr(F.col("__av"), F.col("__bv"), dim_hint)
    sim = F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), 8)
    dup_ids = (
        a.join(b, on="cid")
        .where(F.col("__aid") < F.col("__bid"))
        .where(sim >= F.lit(float(threshold)))
        .select(F.col("__bid").alias(id_col))
        .distinct()
    )
    return assigned.join(
        dup_ids.withColumn("__dup", F.lit(True)), on=id_col, how="left"
    ).select(
        id_col,
        "cid",
        F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
    )


# ---------------------------------------------------------------------------
# model persistence: train once, reuse across jobs
# ---------------------------------------------------------------------------

def save_centroids(spark, cents, path: str):
    """Persist k-means centroids (kmeans_train output) as parquet so the
    expensive training pass runs once and every downstream job (corpus
    assignment, IVF probing, streaming scorers) reloads the same
    deterministic model."""
    _centroid_df(spark, cents).write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> list:
    rows = spark.read.parquet(path).collect()
    return sorted((int(r["__cid"]), [float(x) for x in r["__cvec"]]) for r in rows)


def save_pq_codebooks(spark, cents, path: str):
    """Persist product-quantization codebooks (pq_train output)."""
    _pq_centroid_df(spark, cents).write.mode("overwrite").parquet(path)


def load_pq_codebooks(spark, path: str) -> list:
    rows = spark.read.parquet(path).collect()
    return sorted(
        (int(r["s"]), int(r["code"]), [float(x) for x in r["__cvec"]]) for r in rows
    )


LOCAL_MMR_DISABLED = _os.environ.get("SPARK_GRAFT_DISABLE_LOCAL_MMR", "") == "1"
_MMR_LOCAL_MAX_ROWS = 100_000  # ~60 MB of (ids, rel, 64-dim vec) rows


def _round_half_up(x: float, exp: str) -> float:
    """Replica of Spark ``round(double, n)``: BigDecimal.valueOf (shortest
    decimal repr) then setScale(n, HALF_UP)."""
    return float(_Dec(repr(float(x))).quantize(_Dec(exp), rounding=_HALF_UP))


def _mmr_local(rows, k, lam_i, scale, round_exp):
    """Driver-local replica of the unrolled greedy rounds — the same
    in-order IEEE cosine fold, the same HALF_UP rounding composition, the
    same integer score arithmetic and (score desc, cand id asc)
    tie-breaks, so output is bit-identical to the distributed plan
    (equality-tested). rows: (qid, cid, rel8, reli, vec)."""
    import math

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    # per-row norms computed once (they never change); the pairwise cosine
    # reuses them with the same expression order as cosine_fast_expr.
    # Keyed by row identity, not candidate id — the same neighbor id under
    # a different query is a different row object.
    norms = {}

    def norm(c):
        key = id(c)
        n = norms.get(key)
        if n is None:
            n = math.sqrt(fold_dot(c[4], c[4]))
            norms[key] = n
        return n

    def cos_i(c, s):
        den = norm(c) * norm(s)
        v = fold_dot(c[4], s[4]) / den if den > 0 else 0.0
        return int(round(_round_half_up(v, round_exp) * scale))

    byq = {}
    for r in rows:
        byq.setdefault(r[0], []).append(r)
    out = []
    for qid in byq:
        cands = byq[qid]
        first = min(cands, key=lambda c: (-c[3], c[1]))
        sel_ids = {first[1]}
        newest = first
        out.append((qid, first[1], 1, float(first[2])))
        # running max-sim per candidate: round r only folds in the newest
        # pick (max is associative — identical to the full max the
        # distributed groupBy computes)
        maxsim = {}
        for rank in range(2, k + 1):
            rem = [c for c in cands if c[1] not in sel_ids]
            if not rem:
                break
            best = None
            for c in rem:
                msi = cos_i(c, newest)
                prev = maxsim.get(c[1])
                if prev is None or msi > prev:
                    maxsim[c[1]] = msi
                else:
                    msi = prev
                scorei = lam_i * c[3] - (1000 - lam_i) * msi
                key = (-scorei, c[1])
                if best is None or key < best[1]:
                    best = (c, key, scorei)
            out.append((qid, best[0][1], rank, best[2] / (scale * 1000.0)))
            sel_ids.add(best[0][1])
            newest = best[0]
    return out


def mmr_rerank(
    cands: DataFrame,
    k: int = 3,
    lam: float = 0.7,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    rel_col: str = "rel",
    vec_col: str = "vec",
    round_to: int = 8,
) -> DataFrame:
    """Maximal-marginal-relevance reranking (Carbonell & Goldstein 1998) of
    a per-query candidate set — the diversity pass between retrieval and a
    RAG context window: greedily pick k candidates maximizing
    ``lam * relevance - (1 - lam) * max_similarity_to_already_picked``.

    The greedy loop is unrolled into k DataFrame rounds (a window top-1,
    an anti-join, and a candidates-x-selected cosine per round), so the
    whole plan is native expressions over the CANDIDATE table — cost is
    O(k * |queries| * fetch), independent of corpus size; the corpus-scale
    work stays in the upstream retrieval stage.

    Determinism: relevance and pairwise cosines are rounded to
    ``round_to`` dp, then the MMR combination runs in EXACT integer
    arithmetic — scores in 1e-{round_to} units, ``lam`` quantized to
    thousandths — so there is no float rounding step whose half-way ties
    could differ between engines; ties broken by candidate id. The greedy
    argmax (and so the selection) is exactly reproducible in SQL.

    Output: query_id, cand_id, mmr_rank (1-based pick order), mmr_score
    (= (lam_i * rel_i - (1000 - lam_i) * maxsim_i) / 1e{round_to + 3};
    rank 1 carries the plain rounded relevance).
    """
    qid, cid = query_id, cand_id
    scale = float(10 ** round_to)
    lam_i = int(round(lam * 1000))

    def to_i(c):
        # rounded-to-round_to doubles recovered as exact integers (the
        # argument is within float error of an integer, never near .5)
        return F.round(c * F.lit(scale)).cast("long")

    rel8 = F.round(F.col(rel_col), round_to).alias("__rel8")
    base = cands.select(
        qid, cid, rel8, F.col(vec_col).alias("__v")
    ).withColumn("__reli", to_i(F.col("__rel8")))

    # Driver-local fast path (same design rules as the k-means/PQ/CC local
    # paths, SCALE.md): the candidate table is |queries| x fetch rows by
    # construction, and the unrolled plan pays k rounds of driver-
    # synchronous stages for kilobyte-scale state. Gate = a bounded
    # limit(cap + 1) probe — the Catalyst size estimate is useless here
    # (a post-window cross-join lineage estimates at petabytes), and the
    # probe's cost is bounded by the cap even on huge inputs. Kill switch
    # SPARK_GRAFT_DISABLE_LOCAL_MMR=1; output bit-identical to the
    # distributed plan (equality-tested).
    if not LOCAL_MMR_DISABLED and not cands.isStreaming:
        probe = base.select(qid, cid, "__rel8", "__reli", "__v").limit(
            _MMR_LOCAL_MAX_ROWS + 1
        ).collect()
        if len(probe) <= _MMR_LOCAL_MAX_ROWS:
            rows = [
                (r[0], r[1], r[2], r[3], [float(x) for x in r[4]])
                for r in probe
            ]
            out = _mmr_local(rows, k, lam_i, scale, f"1E-{round_to}")
            from pyspark.sql import types as T

            in_schema = {f.name: f.dataType for f in base.schema.fields}
            schema = T.StructType([
                T.StructField(qid, in_schema[qid]),
                T.StructField(cid, in_schema[cid]),
                T.StructField("mmr_rank", T.IntegerType(), False),
                T.StructField("mmr_score", T.DoubleType(), True),
            ])
            spark = cands.sparkSession
            return spark.createDataFrame(
                [(o[0], o[1], o[2], o[3]) for o in out], schema
            )

    # every greedy round references the candidate table 2-3 times; without
    # this the upstream RETRIEVAL lineage would re-execute per reference.
    # localCheckpoint (not cache) so the materialized blocks are released
    # by the ContextCleaner when the result is dereferenced — cache()
    # would pin them in executor storage for the session's lifetime with
    # no safe point to unpersist.
    base = base.localCheckpoint(eager=False)
    w1 = Window.partitionBy(qid).orderBy(F.desc("__reli"), F.asc(cid))
    sel = (
        base.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") == 1)
        .select(
            qid, cid, "__reli", "__v",
            F.lit(1).alias("mmr_rank"),
            F.col("__rel8").alias("mmr_score"),
        )
    )
    for r in range(2, k + 1):
        rem = base.join(sel.select(qid, cid), [qid, cid], "left_anti")
        pair = rem.join(
            sel.select(qid, F.col("__v").alias("__sv")), qid
        )
        ms = (
            pair.groupBy(qid, cid)
            .agg(
                F.max(
                    to_i(F.round(
                        cosine_fast_expr(F.col("__v"), F.col("__sv")), round_to
                    ))
                ).alias("__msi")
            )
        )
        scored = rem.join(ms, [qid, cid]).withColumn(
            "__scorei",
            F.lit(lam_i) * F.col("__reli")
            - F.lit(1000 - lam_i) * F.col("__msi"),
        )
        wr = Window.partitionBy(qid).orderBy(F.desc("__scorei"), F.asc(cid))
        pick = (
            scored.withColumn("__rn", F.row_number().over(wr))
            .where(F.col("__rn") == 1)
            .select(
                qid, cid, "__reli", "__v",
                F.lit(r).alias("mmr_rank"),
                (F.col("__scorei").cast("double") / F.lit(scale * 1000.0))
                .alias("mmr_score"),
            )
        )
        sel = sel.unionByName(pick)
    return sel.select(qid, F.col(cid), "mmr_rank", "mmr_score")


def sign_pack_expr(vec, word: int) -> Column:
    """Pack 32 of an embedding's sign bits (dims 32*word .. 32*word+31,
    bit set when the component > 0) into a non-negative int64 word. 32-bit
    words keep every shift and sum inside BIGINT range on ANY engine (a
    single 64-bit word would need bit 63 = 2^63, which overflows signed
    64-bit in SQL). Pure codegen: sequence + transform + aggregate."""
    name = vec if isinstance(vec, str) else None
    if name is None:
        raise ValueError("sign_pack_expr needs a column NAME (used in expr SQL)")
    off = 32 * word
    return F.expr(
        f"aggregate(transform(sequence(0, 31), i -> "
        f"IF({off} + i < size({name}) AND element_at({name}, {off} + i + 1) > 0.0D, "
        f"shiftleft(1L, i), 0L)), 0L, (acc, x) -> acc + x)"
    )


def binary_hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    dim: int = 64,
) -> DataFrame:
    """Binary (sign-bit) retrieval: embeddings compress 32x+ to
    ceil(dim/32) int64 words and similarity is the Hamming distance
    ``sum(bit_count(q XOR c))`` — the standard cheap first-stage filter
    before an exact float rerank. Everything is native codegen (pack,
    XOR, bit_count, TakeOrdered window); at scale the corpus shuffles a
    few bytes per vector and the tiny query side broadcasts.

    Output: query_id, neighbor_id, hamming, rank — ranked by
    (hamming asc, neighbor_id asc) for engine-independent determinism.
    """
    n_words = (dim + 31) // 32
    q = queries.select(
        F.col(query_id).alias("query_id"),
        *[sign_pack_expr(query_vec, w).alias(f"__qw{w}") for w in range(n_words)],
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        *[sign_pack_expr(corpus_vec, w).alias(f"__cw{w}") for w in range(n_words)],
    )
    ham = F.lit(0)
    for w in range(n_words):
        ham = ham + F.bit_count(F.col(f"__qw{w}").bitwiseXOR(F.col(f"__cw{w}")))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        ham.cast("int").alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
