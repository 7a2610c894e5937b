"""compute module: 1:1 surface parity with geoarrow.rust.compute
(_compute.pyi) and semantic checks for the composed non-center origins."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from geoarrow_rs_spark import compute
from geoarrow_rs_spark.wkb import algorithms as alg
from geoarrow_rs_spark.wkb.core import from_wkb, from_wkt, to_wkb

REFERENCE_SURFACE = [
    # every `def` in /root/reference/python/geoarrow-compute/python/geoarrow/
    # rust/compute/_compute.pyi
    "affine_transform", "area", "center", "centroid", "chaikin_smoothing",
    "convex_hull", "densify", "envelope", "explode", "frechet_distance",
    "geodesic_perimeter", "is_empty", "length", "line_interpolate_point",
    "line_locate_point", "polylabel", "rotate", "scale", "signed_area",
    "simplify", "skew", "total_bounds", "translate",
]

WKTS = [
    "POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))",
    "LINESTRING (0 0, 3 4, 6 0)",
    "POINT (2 3)",
]


def test_surface_is_complete():
    for name in REFERENCE_SURFACE:
        assert callable(getattr(compute, name)), name


@pytest.fixture(scope="module")
def geoms(spark):
    df = spark.createDataFrame([Row(i=i, wkt=w) for i, w in enumerate(WKTS)])
    return df.select("i", "wkt", F.expr("ST_GeomFromWKT(wkt)").alias("g"))


def _flat_coords(g):
    if g.kind == 1:  # point
        return [np.asarray(g.data, dtype=float)]
    if g.kind == 2:  # linestring
        return [np.asarray(g.data, dtype=float)]
    if g.kind == 3:  # polygon
        return [np.asarray(r, dtype=float) for r in g.data]
    raise AssertionError(g.kind)


def _assert_geom_close(wkb_got, geom_want, atol=1e-9):
    got, want = from_wkb(wkb_got), geom_want
    assert got.kind == want.kind
    for ca, cw in zip(_flat_coords(got), _flat_coords(want)):
        assert np.allclose(ca, cw, atol=atol), (ca, cw)


def _one(df, col):
    return bytes(df.select(col.alias("o")).collect()[0].o)


def test_method_dispatch(geoms):
    out = geoms.orderBy("i").select(
        compute.area(F.col("g")).alias("a"),
        compute.length(F.col("g"), method="euclidean").alias("l"),
        compute.simplify(F.col("g"), 0.5, method="vw").alias("s"),
        compute.is_empty(F.col("g")).alias("e"),
    ).collect()
    assert out[0].a == 8.0
    assert out[2].a == 0.0
    assert out[1].l == 10.0
    assert not out[0].e
    with pytest.raises(ValueError):
        compute.area(F.col("g"), method="nope")
    with pytest.raises(ValueError):
        compute.length(F.col("g"), method="nope")
    with pytest.raises(ValueError):
        compute.simplify(F.col("g"), 0.5, method="nope")


def test_rotate_about_centroid_matches_algorithm(geoms):
    rows = geoms.orderBy("i").select(
        "wkt", compute.rotate(F.col("g"), 30.0, origin="centroid").alias("o")
    ).collect()
    for r in rows:
        want = alg.rotate(from_wkt(r.wkt), 30.0, origin="centroid")
        _assert_geom_close(bytes(r.o), want)


def test_rotate_about_point_tuple(geoms):
    # rotating POINT(2 3) by 90 deg about (2, 3) is the identity
    pt = geoms.where(F.col("i") == 2)
    got = from_wkb(_one(pt, compute.rotate(F.col("g"), 90.0, origin=(2.0, 3.0))))
    assert np.allclose(np.asarray(got.data, dtype=float)[:2], [2.0, 3.0], atol=1e-12)


def test_scale_about_centroid(geoms):
    box = geoms.where(F.col("i") == 0)
    got = _one(box, compute.scale(F.col("g"), 2.0, 2.0, origin="centroid"))
    want = alg.scale(from_wkt(WKTS[0]), 2.0, 2.0, origin="centroid")
    _assert_geom_close(got, want)


def test_skew_about_origin_tuple(geoms):
    box = geoms.where(F.col("i") == 0)
    got = _one(box, compute.skew(F.col("g"), 15.0, 5.0, origin=(0.0, 0.0)))
    want = alg.skew(from_wkt(WKTS[0]), 15.0, 5.0, origin=(0.0, 0.0))
    _assert_geom_close(got, want)


def test_translate_and_affine(geoms):
    pt = geoms.where(F.col("i") == 2)
    got = from_wkb(_one(pt, compute.translate(F.col("g"), 1.0, -1.0)))
    assert np.allclose(np.asarray(got.data, dtype=float)[:2], [3.0, 2.0])
    got = from_wkb(_one(pt, compute.affine_transform(F.col("g"), (0, 1, 1, 0, 0, 0))))
    assert np.allclose(np.asarray(got.data, dtype=float)[:2], [3.0, 2.0])  # swap axes


def test_dataframe_level_ops(geoms):
    b = compute.total_bounds(geoms, "g")
    assert tuple(b) == (0.0, 0.0, 6.0, 4.0)
    n = compute.explode(geoms.select(F.col("g")), "g").count()
    assert n == 3


def test_edges_metadata_dispatch(spark):
    """geom_length/area/distance pick the kernel family from the column's
    edges tag; conflicting tags on a distance pair raise."""
    import pytest

    from geoarrow_rs_spark.ops.table import geom_distance, geom_length
    from geoarrow_rs_spark.types.geo_types import tag_geometry_column

    df = spark.range(1).selectExpr(
        "ST_MakeLine(ST_Point(0.0, 0.0), ST_Point(3.0, 4.0)) AS g",
        "ST_Point(0.0, 0.0) AS a",
        "ST_Point(1.0, 0.0) AS b",
    )
    planar = tag_geometry_column(df, "g", edges="planar")
    assert planar.select(geom_length(planar, "g").alias("v")).collect()[0]["v"] == 5.0

    sph = tag_geometry_column(df, "g", edges="spherical")
    v = sph.select(geom_length(sph, "g").alias("v")).collect()[0]["v"]
    assert v > 500_000  # meters, not degrees: the tag flipped the math

    vin = tag_geometry_column(df, "g", edges="vincenty")
    v2 = vin.select(geom_length(vin, "g").alias("v")).collect()[0]["v"]
    assert abs(v2 - v) / v < 0.01 and v2 != v  # spheroid family, close to sphere

    mixed = tag_geometry_column(
        tag_geometry_column(df, "a", edges="planar"), "b", edges="spherical"
    )
    with pytest.raises(ValueError, match="edges mismatch"):
        geom_distance(mixed, "a", "b")
