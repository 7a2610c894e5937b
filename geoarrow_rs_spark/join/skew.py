"""Skew-mitigating join utilities.

At 100 TB a handful of hot keys (a viral user, a default/null surrogate, a
mega-tenant) can pin an entire shuffle-hash or sort-merge join on one task.
AQE's skew-join split (``spark.sql.adaptive.skewJoin``) repairs many cases
at runtime, but it only splits the PROBE side of a sort-merge join; when
the build side also carries the hot key, explicit salting is the standard
fix: spread each hot key's rows across ``n_salts`` sub-keys and replicate
the other side once per sub-key, so the hot key occupies ``n_salts`` tasks
instead of one.

``salted_join`` produces results identical to the plain equi-join (the
salt never appears in the output) — verified row-for-row against a DuckDB
oracle by the ``events_salted_join`` catalog query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join that spreads every left key over ``n_salts`` shuffle
    partitions: the (large, skewed) left side gets a per-row salt, the
    (smaller) right side is replicated once per salt value, and the join
    key becomes ``(key..., salt)``.

    Output columns and rows equal ``left.join(right, on, how)`` exactly;
    the salt is internal. The right side grows ``n_salts``×, so use this
    when the right side is too big to broadcast but far smaller than the
    left (the classic fact-to-dimension skew case); for ``n_salts`` times
    a broadcastable size, just broadcast instead.

    ``how`` may be ``inner`` or ``left`` (outer semantics survive because
    every left row carries exactly one salt and every right key exists at
    every salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # Per-row salt on the skewed side. monotonically_increasing_id is free
    # (no shuffle, partition-local counter) and spreads uniformly; the salt
    # value itself carries no meaning, so run-to-run variation is fine.
    lsalt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = [l[k] == r[k] for k in keys] + [l["__salt"] == r["__salt"]]
    out_cols = [l[c] for c in left.columns] + [
        r[c] for c in right.columns if c not in keys
    ]
    return l.join(r, cond, how).select(*out_cols)
