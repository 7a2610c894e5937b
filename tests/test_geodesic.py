"""Vincenty geodesics, concave hull, constructors (pure python, fast)."""

import math

import pytest

from geoarrow_rs_spark.wkb import algorithms as alg
from geoarrow_rs_spark.wkb import from_wkt, multipoint


def test_vincenty_equator_degree():
    # 1 degree along the equator on WGS84 = a * pi/180
    d = alg.vincenty_distance(0, 0, 1, 0)
    assert d == pytest.approx(6378137.0 * math.pi / 180, rel=1e-9)


def test_vincenty_meridian_degree():
    # known WGS84 meridian arc for 1 degree at the equator ≈ 110574.4 m
    d = alg.vincenty_distance(0, 0, 0, 1)
    assert d == pytest.approx(110574.4, abs=1.0)


def test_vincenty_vs_haversine():
    # ellipsoidal vs spherical differ by < 0.6% but are not equal
    d_v = alg.vincenty_distance(2.35, 48.85, -0.13, 51.51)  # Paris -> London
    d_h = alg.haversine_distance(2.35, 48.85, -0.13, 51.51)
    assert abs(d_v - d_h) / d_h < 0.006
    assert d_v != d_h
    assert 330_000 < d_v < 360_000  # ~344 km


def test_vincenty_length_linestring():
    line = from_wkt("LINESTRING (0 0, 1 0, 1 1)")
    L = alg.vincenty_length(line)
    exp = alg.vincenty_distance(0, 0, 1, 0) + alg.vincenty_distance(1, 0, 1, 1)
    assert L == pytest.approx(exp, rel=1e-12)


def test_concave_hull_c_shape():
    # points forming a C — concave hull should have less area than convex
    pts = []
    for i in range(11):
        pts.append([0, i])          # left wall
        pts.append([10, 0 + i * 0.0] if False else [i, 0])   # bottom
        pts.append([i, 10])         # top
    pts += [[10, 1], [10, 9]]
    mp = multipoint([[float(x), float(y)] for x, y in pts])
    ch = alg.concave_hull(mp, k=5)
    cvx = alg.convex_hull(mp)
    assert ch.kind == 3
    assert alg.area(ch) <= alg.area(cvx) + 1e-9
    # hull covers every input point
    for (x, y) in pts:
        from geoarrow_rs_spark.wkb import point

        assert alg.intersects(ch, point(float(x), float(y)))


def test_concave_hull_small_inputs():
    tri = multipoint([[0.0, 0.0], [4.0, 0.0], [0.0, 3.0]])
    h = alg.concave_hull(tri, k=3)
    assert alg.area(h) == 6.0
