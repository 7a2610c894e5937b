"""Table-level geometry operations (SURVEY.md §2.3 / §2.2 table ops).

These are the Spark translations of the reference's native table algorithms:
- explode      — /root/reference/rust/geoarrow-old/src/algorithm/native/explode.rs:206-213
- total_bounds — /root/reference/rust/geoarrow-old/src/algorithm/native/total_bounds.rs:9
- downcast     — /root/reference/rust/geoarrow-cast/src/downcast.rs:82-99
- geometry-column discovery — python/tests/core/operations/test_geometry_col.py

Scale notes: ``total_bounds`` is a native min/max aggregation over a bbox
struct (map-side partial agg, no shuffle of data — only of 4 doubles per
partition). ``explode`` uses Spark's native ``posexplode`` after an ST_Dump
pUDF, which is exactly the reference's offsets-flatten trick (explode.rs:58).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

GEOMETRY_META_KEY = "geoarrow.encoding"


def with_bbox(df: DataFrame, geom_col: str, bbox_col: str = "bbox") -> DataFrame:
    """Add a covering struct<xmin,ymin,xmax,ymax> column for geom_col
    (the GeoParquet covering, /root/reference/rust/geoparquet/src/writer/options.rs)."""
    return df.withColumn(bbox_col, F.expr(f"ST_BBox({geom_col})"))


def total_bounds(df: DataFrame, geom_col: str):
    """(xmin, ymin, xmax, ymax) of the whole column. Native agg on the bbox
    struct — two-phase (partial per partition), no wide shuffle."""
    row = (
        with_bbox(df, geom_col, "__b")
        .agg(
            F.min("__b.xmin").alias("xmin"),
            F.min("__b.ymin").alias("ymin"),
            F.max("__b.xmax").alias("xmax"),
            F.max("__b.ymax").alias("ymax"),
        )
        .collect()[0]
    )
    return (row["xmin"], row["ymin"], row["xmax"], row["ymax"])


def explode_geometries(
    df: DataFrame, geom_col: str, keep_position: bool = False
) -> DataFrame:
    """One row per single-part geometry, other columns preserved
    (explode.rs:206 semantics: multi -> parts; simple geoms pass through)."""
    parts = F.expr(f"ST_Dump({geom_col})")
    other = [c for c in df.columns if c != geom_col]
    if keep_position:
        ex = df.select(*other, F.posexplode_outer(parts).alias("part_index", geom_col))
        return ex
    return df.select(*other, F.explode_outer(parts).alias(geom_col))


def geometry_columns(df: DataFrame) -> list:
    """Columns tagged as geometry (via field metadata) plus untagged binary
    columns named like geometry conventions."""
    out = []
    for f in df.schema.fields:
        md = f.metadata or {}
        if md.get(GEOMETRY_META_KEY) or md.get("ARROW:extension:name", "").startswith("geoarrow"):
            out.append(f.name)
        elif f.dataType.typeName() == "binary" and f.name in ("geometry", "geom", "wkb_geometry"):
            out.append(f.name)
    return out


def infer_geometry_type(df: DataFrame, geom_col: str):
    """Distinct set of GeoArrow type ids present (pass 1 of downcast,
    downcast.rs:82-99). Cheap distributed agg over a small-cardinality set."""
    rows = (
        df.select(F.expr(f"ST_GeoArrowTypeId({geom_col})").alias("tid"))
        .where(F.col("tid").isNotNull())
        .agg(F.collect_set("tid").alias("s"))
        .collect()
    )
    return sorted(rows[0]["s"]) if rows else []


_DOWNCAST = {
    frozenset([1]): "Point",
    frozenset([2]): "LineString",
    frozenset([3]): "Polygon",
    frozenset([4]): "MultiPoint",
    frozenset([5]): "MultiLineString",
    frozenset([6]): "MultiPolygon",
    frozenset([1, 4]): "MultiPoint",
    frozenset([2, 5]): "MultiLineString",
    frozenset([3, 6]): "MultiPolygon",
}


def downcast_geometry_type(df: DataFrame, geom_col: str):
    """Infer the simplest common native type name (infer_downcast_type,
    downcast.rs:82); returns 'Geometry' for mixed inputs."""
    tids = infer_geometry_type(df, geom_col)
    kinds = frozenset(t % 10 for t in tids)
    return _DOWNCAST.get(kinds, "Geometry" if kinds else None)


# ---------------------------------------------------------------------------
# Edges-metadata-aware measure defaults (edges.rs:35-60 semantics)
# ---------------------------------------------------------------------------

# edge interpretation -> kernel family. The four named geodesic methods all
# resolve to the spheroid kernels (our spheroid path is Vincenty; andoyer/
# thomas are lower-order approximations of the same quantity and karney
# differs below 1e-9 relative on WGS84 — same collapsing the reference's
# python surface applies for length, geodesic_length.rs).
_EDGE_FAMILY = {
    "planar": "planar",
    "spherical": "spherical",
    "andoyer": "spheroid",
    "karney": "spheroid",
    "thomas": "spheroid",
    "vincenty": "spheroid",
}

_EDGE_KERNELS = {
    "planar": {
        "length": "ST_Length",
        "area": "ST_Area",
        "distance": "ST_Distance",
        "intersects": "ST_Intersects",
        "dwithin": "ST_DWithin",
    },
    "spherical": {
        "length": "ST_LengthSphere",
        "area": "ST_AreaSpherical",
        "distance": "ST_DistanceSphere",
        "intersects": "ST_IntersectsSphere",
        "dwithin": "ST_DWithinSphere",
    },
    # geodesic edges use the spherical predicate too: an ellipsoidal
    # geodesic deviates from the great circle by < f/2 (~0.17%) of the arc,
    # which never flips a predicate except within that sliver of the
    # crossing — documented divergence (wkb/spherical.py's table)
    "spheroid": {
        "length": "ST_LengthSpheroid",
        "area": "ST_AreaSpheroid",
        "distance": "ST_DistanceSpheroid",
        "intersects": "ST_IntersectsSphere",
        "dwithin": "ST_DWithinSphere",
    },
}


def _edge_kernel(df: DataFrame, geom_col: str, op: str) -> str:
    from ..types.geo_types import get_edges

    edges = get_edges(df, geom_col)
    family = _EDGE_FAMILY.get(str(edges).lower())
    if family is None:
        raise ValueError(f"unknown edges interpretation {edges!r} on {geom_col!r}")
    return _EDGE_KERNELS[family][op]


def geom_length(df: DataFrame, geom_col: str) -> Column:
    """Length honoring the column's ``edges`` tag: planar columns measure
    euclidean, ``spherical`` columns haversine, the geodesic methods the
    spheroid kernel — the metadata picks the math, the query stays the
    same (edges.rs:35-60 semantics as a DataFrame-level default)."""
    return F.call_function(_edge_kernel(df, geom_col, "length"), F.col(geom_col))


def geom_area(df: DataFrame, geom_col: str) -> Column:
    """Area honoring the column's ``edges`` tag (see :func:`geom_length`)."""
    return F.call_function(_edge_kernel(df, geom_col, "area"), F.col(geom_col))


def geom_distance(df: DataFrame, geom_col: str, other_col: str) -> Column:
    """Distance honoring the LEFT column's ``edges`` tag; raises if the
    two columns are tagged with conflicting interpretations."""
    from ..types.geo_types import get_edges

    fam_a = _EDGE_FAMILY.get(str(get_edges(df, geom_col)).lower())
    fam_b = _EDGE_FAMILY.get(str(get_edges(df, other_col)).lower())
    if fam_a != fam_b:
        raise ValueError(
            f"edges mismatch: {geom_col!r} is {fam_a}, {other_col!r} is {fam_b}"
        )
    return F.call_function(
        _edge_kernel(df, geom_col, "distance"), F.col(geom_col), F.col(other_col)
    )


def geom_intersects(df: DataFrame, geom_col: str, other_col: str) -> Column:
    """Intersects honoring the ``edges`` tag: planar columns get
    ST_Intersects, spherical/geodesic columns great-circle
    ST_IntersectsSphere (all WKB kinds; polygons must fit in an open
    hemisphere — the full per-kernel divergence table lives in
    wkb/spherical.py). Raises on conflicting tags, like
    :func:`geom_distance`."""
    from ..types.geo_types import get_edges

    fam_a = _EDGE_FAMILY.get(str(get_edges(df, geom_col)).lower())
    fam_b = _EDGE_FAMILY.get(str(get_edges(df, other_col)).lower())
    if fam_a != fam_b:
        raise ValueError(
            f"edges mismatch: {geom_col!r} is {fam_a}, {other_col!r} is {fam_b}"
        )
    return F.call_function(
        _edge_kernel(df, geom_col, "intersects"), F.col(geom_col), F.col(other_col)
    )


def geom_dwithin(df: DataFrame, geom_col: str, other_col: str, distance) -> Column:
    """DWithin honoring the ``edges`` tag: planar columns compare euclidean
    units, spherical/geodesic columns METERS via great-circle
    ST_DWithinSphere (note the unit change — same PostGIS geometry vs
    geography convention). Raises on conflicting tags."""
    from ..types.geo_types import get_edges

    fam_a = _EDGE_FAMILY.get(str(get_edges(df, geom_col)).lower())
    fam_b = _EDGE_FAMILY.get(str(get_edges(df, other_col)).lower())
    if fam_a != fam_b:
        raise ValueError(
            f"edges mismatch: {geom_col!r} is {fam_a}, {other_col!r} is {fam_b}"
        )
    d = F.lit(float(distance)) if not isinstance(distance, Column) else distance
    return F.call_function(
        _edge_kernel(df, geom_col, "dwithin"), F.col(geom_col), F.col(other_col), d
    )
