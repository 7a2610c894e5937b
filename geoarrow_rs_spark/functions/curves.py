"""Space-filling-curve keys as NATIVE Spark expressions, and a clustering
GeoParquet writer built on them.

Why this exists: GeoParquet bbox pushdown (io/geoparquet.py) prunes row
groups by the min/max statistics of the covering struct. Statistics are
only tight if spatially-near rows are stored near each other — on an
unordered 100 TB write every row group spans the whole extent and nothing
prunes. Sorting the write by a space-filling-curve key fixes that: it is
the same design as the reference's FlatGeobuf writer, which Hilbert-sorts
features before building its packed R-tree (io/flatgeobuf.py parity;
upstream flatgeobuf crate), and as Delta/Iceberg Z-ordering.

Both curves are pure integer arithmetic, expressed as Catalyst expressions
(shiftleft / bitwiseAND / CASE) — zero Python in the plan, so the key
computation rides whole-stage codegen and adds no measurable cost to a
write. Morton (Z-order) is a closed-form bit interleave; Hilbert runs its
per-level rotate/flip loop as a single `aggregate()` fold at runtime
(`hilbert_key_sql`) so the plan stays constant-size at any level.

Public closed forms: Morton spread-bits trick (Hacker's Delight §7-2);
Hilbert xy<->d loop (Warren / Wikipedia "Hilbert curve" C routine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# default key domain: WGS84 lon/lat world
WORLD_BOUNDS = (-180.0, -90.0, 180.0, 90.0)

_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def scaled_cell_expr(x, y, level: int, bounds=WORLD_BOUNDS):
    """(x, y) doubles -> integer grid coords in [0, 2**level), clamped.

    Native: two fused multiply-divides + floor + clamp per coordinate."""
    n = 1 << level
    xmin, ymin, xmax, ymax = bounds
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y

    def cell(v, lo, hi):
        c = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n)))
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), c)).cast("long")

    return cell(x, xmin, xmax), cell(y, ymin, ymax)


def _spread_bits(c: Column) -> Column:
    """Interleave-ready bit spread: abcd -> 0a0b0c0d (32 -> 64 bits)."""
    for shift, mask in _SPREAD_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def morton_key_expr(x, y, level: int = 16, bounds=WORLD_BOUNDS) -> Column:
    """Z-order (Morton) key of a point, fully native (level <= 31)."""
    if not 1 <= level <= 31:
        raise ValueError("morton level must be in [1, 31]")
    ix, iy = scaled_cell_expr(x, y, level, bounds)
    return _spread_bits(ix).bitwiseOR(F.shiftleft(_spread_bits(iy), 1))


def hilbert_key_sql(x_sql: str, y_sql: str, level: int = 16, bounds=WORLD_BOUNDS) -> str:
    """Hilbert key as ONE native SQL expression: the classic per-level
    rotate/flip loop as an `aggregate()` fold over `sequence(level-1, 0)`.

    A single runtime loop (JVM higher-order function over a 16-element
    array) replaces the earlier unrolled 16-projection chain — that chain
    was O(level^2) in eager DataFrame analysis time (each select()
    re-analyzes the whole plan) and compiled kilobytes of code, all to
    save an interpreted loop of ~12 integer ops per level. Branch-free
    arithmetic selects keep the per-iteration work tiny."""
    if not 1 <= level <= 31:
        raise ValueError("hilbert level must be in [1, 31]")
    n = 1 << level
    xmin, ymin, xmax, ymax = bounds

    def cell(v, lo, hi):
        return (
            f"CAST(greatest(0, least({n - 1}, "
            f"floor((({v}) - CAST({lo!r} AS DOUBLE)) / CAST({hi - lo!r} AS DOUBLE)"
            f" * CAST({float(n)!r} AS DOUBLE)))) AS BIGINT)"
        )

    rx = "(CAST(shiftright(acc.x, i) AS INT) & 1)"
    ry = "(CAST(shiftright(acc.y, i) AS INT) & 1)"
    sL = "CAST(shiftleft(1, i) AS BIGINT)"
    flip = f"CAST((1 - {ry}) * {rx} AS BIGINT)"
    swap = f"CAST(1 - {ry} AS BIGINT)"
    fx = f"(acc.x + {flip} * ({sL} - 1 - 2 * acc.x))"
    fy = f"(acc.y + {flip} * ({sL} - 1 - 2 * acc.y))"
    return f"""aggregate(
      sequence({level - 1}, 0, -1),
      named_struct('x', {cell(x_sql, xmin, xmax)},
                   'y', {cell(y_sql, ymin, ymax)},
                   'd', CAST(0 AS BIGINT)),
      (acc, i) -> named_struct(
        'x', {fx} + {swap} * ({fy} - {fx}),
        'y', {fy} + {swap} * ({fx} - {fy}),
        'd', acc.d + {sL} * {sL} * CAST(({rx} * 3) ^ {ry} AS BIGINT)),
      acc -> acc.d)"""


def with_hilbert_key(
    df: DataFrame,
    x,
    y,
    out: str = "hilbert_key",
    level: int = 16,
    bounds=WORLD_BOUNDS,
) -> DataFrame:
    """Add a Hilbert-curve key column, fully native (see hilbert_key_sql).

    Accepts column names or arbitrary Column expressions for x/y (the
    latter are projected to temp columns first so the SQL fold can
    reference them by name)."""
    tmpx, tmpy = f"__h_in_x_{out}", f"__h_in_y_{out}"
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    keep = [c for c in df.columns if c != out]
    staged = df.select(*[F.col(c) for c in keep], xc.alias(tmpx), yc.alias(tmpy))
    key = F.expr(hilbert_key_sql(tmpx, tmpy, level, bounds))
    return staged.select(*[F.col(c) for c in keep], key.alias(out))


def hilbert_xy2d(ix: int, iy: int, level: int) -> int:
    """Driver-side scalar reference of the same loop (tests / planning)."""
    d = 0
    for i in range(level - 1, -1, -1):
        s = 1 << i
        rx = 1 if (ix & s) > 0 else 0
        ry = 1 if (iy & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                ix, iy = s - 1 - ix, s - 1 - iy
            ix, iy = iy, ix
    return d


def cluster_geoparquet(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    curve: str = "hilbert",
    level: int = 16,
    bounds=WORLD_BOUNDS,
    num_partitions: int | None = None,
    **write_kwargs,
):
    """Spatially-clustered GeoParquet write: range-partition + sort by a
    space-filling-curve key of the geometry's bbox center, then write via
    ``write_geoparquet`` (covering struct + geo footer metadata as usual).

    ``repartitionByRange`` samples the key distribution, so output files
    adapt to data density (cities get many files, oceans few) — no manual
    grid tuning, no hot partitions. Within each file rows are key-sorted,
    so every row group's covering min/max statistics span a tiny rectangle
    and bbox scans prune at BOTH the file level (range metadata) and the
    row-group level (Parquet stats). At 100 TB this is the difference
    between scanning ~everything and touching only the files that overlap
    the query window.

    ``bounds`` defaults to the lon/lat world; pass the dataset's extent
    (e.g. from a previous ``total_bounds``) for finer key resolution on
    regional data."""
    from ..io.geoparquet import write_geoparquet

    covering = write_kwargs.get("covering_col", "bbox")
    out = df
    if covering not in df.columns:
        out = out.withColumn(covering, F.expr(f"ST_BBox({geometry_col})"))
    cx = (F.col(f"{covering}.xmin") + F.col(f"{covering}.xmax")) / 2
    cy = (F.col(f"{covering}.ymin") + F.col(f"{covering}.ymax")) / 2
    key = "__sfc_key"
    if curve == "morton":
        out = out.withColumn(key, morton_key_expr(cx, cy, level, bounds))
    elif curve == "hilbert":
        out = with_hilbert_key(out, cx, cy, out=key, level=level, bounds=bounds)
    else:
        raise ValueError(f"unknown curve: {curve!r} (use 'hilbert' or 'morton')")
    if num_partitions:
        out = out.repartitionByRange(num_partitions, key)
    else:
        out = out.repartitionByRange(key)
    out = out.sortWithinPartitions(key).drop(key)
    return write_geoparquet(out, path, geometry_col=geometry_col, **write_kwargs)


# ---------------------------------------------------------------------------
# Hexagonal binning (flat-top axial grid; PostGIS ST_HexagonGrid-style)
# ---------------------------------------------------------------------------

def hex_cell_expr(x, y, size: float):
    """(q, r) axial coordinates of the flat-top hexagon containing a point
    (circumradius ``size``), as native integer Columns.

    Closed-form fractional axial coords + cube rounding (Red Blob Games'
    public hex-grid formulation): pure arithmetic and comparisons, so hex
    heatmap rollups over points are a groupBy on a codegen'd key — the
    standard aggregation primitive for density maps at scale. Restated
    verbatim in SQL by the geo_hexbin oracle."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    R = float(size)
    fq = (xc * (2.0 / 3.0)) / F.lit(R)
    fr = (xc * (-1.0 / 3.0) + yc * (3.0 ** 0.5 / 3.0)) / F.lit(R)
    fs = -fq - fr
    rq = F.round(fq, 0)
    rr = F.round(fr, 0)
    rs = F.round(fs, 0)
    dq = F.abs(rq - fq)
    dr = F.abs(rr - fr)
    ds = F.abs(rs - fs)
    q = F.when((dq > dr) & (dq > ds), -rr - rs).otherwise(rq)
    r = F.when(~((dq > dr) & (dq > ds)) & (dr > ds), -rq - rs).otherwise(rr)
    return q.cast("long"), r.cast("long")


def hex_center_expr(q, r, size: float):
    """Center point (x, y) of a flat-top axial hex cell — the inverse of
    hex_cell_expr for rendering/joining rollups back to geometry."""
    qc = F.col(q) if isinstance(q, str) else q
    rc = F.col(r) if isinstance(r, str) else r
    R = float(size)
    x = F.lit(R) * (qc * 1.5)
    y = F.lit(R) * (3.0 ** 0.5) * (rc.cast("double") + qc.cast("double") / 2.0)
    return x, y
