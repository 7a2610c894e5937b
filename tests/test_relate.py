"""DE-9IM relate tests against canonical matrices (PostGIS/JTS documented
examples)."""

import pytest

from geoarrow_rs_spark.wkb import from_wkt, point
from geoarrow_rs_spark.wkb.relate import relate, relate_pattern

A = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"


def test_disjoint_polygons():
    b = "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"
    assert relate(from_wkt(A), from_wkt(b)) == "FF2FF1212"


def test_overlapping_polygons():
    b = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"
    assert relate(from_wkt(A), from_wkt(b)) == "212101212"


def test_equal_polygons():
    assert relate(from_wkt(A), from_wkt(A)) == "2FFF1FFF2"


def test_contains_within():
    inner = "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"
    assert relate(from_wkt(A), from_wkt(inner)) == "212FF1FF2"
    assert relate(from_wkt(inner), from_wkt(A)) == "2FF1FF212"


def test_touching_edge():
    b = "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"
    assert relate(from_wkt(A), from_wkt(b)) == "FF2F11212"


def test_point_in_polygon():
    assert relate(point(5, 5), from_wkt(A)) == "0FFFFF212"
    assert relate(point(0, 5), from_wkt(A)) == "F0FFFF212"
    assert relate(point(50, 5), from_wkt(A)) == "FF0FFF212"


def test_line_crosses_polygon():
    line = "LINESTRING (-5 5, 15 5)"
    m = relate(from_wkt(line), from_wkt(A))
    assert m[0] == "1"  # interior of line crosses interior of polygon
    assert m[1] == "0"  # line interior hits boundary at points
    assert m[2] == "1"  # line extends outside


def test_line_line():
    a = from_wkt("LINESTRING (0 0, 10 10)")
    b = from_wkt("LINESTRING (0 10, 10 0)")
    m = relate(a, b)
    assert m[0] == "0"
    collinear = from_wkt("LINESTRING (5 5, 15 15)")
    m2 = relate(a, collinear)
    assert m2[0] == "1"


def test_relate_pattern():
    inner = from_wkt("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    assert relate_pattern(from_wkt(A), inner, "T*****FF*") is True  # contains
    assert relate_pattern(inner, from_wkt(A), "T*F**F***") is True  # within
    assert relate_pattern(from_wkt(A), inner, "FF*FF****") is False  # not disjoint


def test_points_in_polygon_vectorized_matches_scalar():
    """points_in_polygon (vectorized) must classify bit-identically to the
    scalar point_in_polygon on every input — interior, exterior, boundary
    lattice points, concave rings, and holes — because callers mix the two
    paths (geofence batches use the vector one, single-geometry kernels
    the scalar one)."""
    import random

    import numpy as np

    from geoarrow_rs_spark.wkb.algorithms import (
        point_in_polygon,
        points_in_polygon,
    )

    rng = random.Random(42)
    # concave outer ring + one hole, integer vertices so lattice points hit
    # edges/vertices exactly
    outer = np.array([
        [0.0, 0.0], [10.0, 0.0], [10.0, 4.0], [5.0, 4.0], [5.0, 7.0],
        [10.0, 7.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0],
    ])
    hole = np.array([
        [2.0, 2.0], [4.0, 2.0], [4.0, 8.0], [2.0, 8.0], [2.0, 2.0],
    ])
    cases = [([outer], None), ([outer, hole], None)]
    # diamond: 45-degree edges exercise the crossing interpolation
    diamond = np.array([
        [6.0, 1.0], [11.0, 6.0], [6.0, 11.0], [1.0, 6.0], [6.0, 1.0],
    ])
    cases.append(([diamond], None))

    pts = []
    for gx in range(-1, 13):
        for gy in range(-1, 13):
            pts.append((float(gx), float(gy)))          # lattice incl. edges
            pts.append((gx + 0.5, gy + 0.5))            # interior offsets
    for _ in range(500):
        pts.append((rng.uniform(-2, 13), rng.uniform(-2, 13)))
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])

    for rings, _ in cases:
        vec = points_in_polygon(px, py, rings)
        sca = np.array(
            [point_in_polygon(float(x), float(y), rings) for x, y in pts],
            dtype=np.int8,
        )
        assert np.array_equal(vec, sca)
