"""Boolean overlay tests (pure python — no Spark session needed)."""

import pytest

from geoarrow_rs_spark.wkb import algorithms as alg
from geoarrow_rs_spark.wkb import booleanops as bo
from geoarrow_rs_spark.wkb import from_wkt


SQ_A = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
SQ_B = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"
SQ_FAR = "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"


def A():
    return from_wkt(SQ_A)


def B():
    return from_wkt(SQ_B)


def test_intersection_overlapping():
    g = bo.intersection(A(), B())
    assert alg.area(g) == pytest.approx(25.0, abs=1e-6)
    b = alg.bounds(g)
    assert b == pytest.approx((5.0, 5.0, 10.0, 10.0), abs=1e-9)


def test_union_overlapping():
    g = bo.union(A(), B())
    assert alg.area(g) == pytest.approx(175.0, abs=1e-6)


def test_difference():
    g = bo.difference(A(), B())
    assert alg.area(g) == pytest.approx(75.0, abs=1e-6)
    g2 = bo.difference(B(), A())
    assert alg.area(g2) == pytest.approx(75.0, abs=1e-6)


def test_sym_difference():
    g = bo.sym_difference(A(), B())
    assert alg.area(g) == pytest.approx(150.0, abs=1e-6)


def test_disjoint_polygons():
    inter = bo.intersection(A(), from_wkt(SQ_FAR))
    assert inter.is_empty() or alg.area(inter) == 0.0
    uni = bo.union(A(), from_wkt(SQ_FAR))
    assert alg.area(uni) == pytest.approx(200.0, abs=1e-6)


def test_contained_polygon():
    inner = from_wkt("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    assert alg.area(bo.intersection(A(), inner)) == pytest.approx(4.0, abs=1e-6)
    assert alg.area(bo.union(A(), inner)) == pytest.approx(100.0, abs=1e-6)
    d = bo.difference(A(), inner)
    assert alg.area(d) == pytest.approx(96.0, abs=1e-6)
    # difference must have a hole
    assert d.kind in (3, 6)
    rings = d.data if d.kind == 3 else d.data[0]
    assert len(rings) == 2


def test_difference_hole_membership():
    inner = from_wkt("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    d = bo.difference(A(), inner)
    from geoarrow_rs_spark.wkb import point

    assert alg.intersects(d, point(1, 1))
    assert not alg.contains(d, point(3, 3))


def test_cross_shape_union():
    h = from_wkt("POLYGON ((0 4, 10 4, 10 6, 0 6, 0 4))")
    v = from_wkt("POLYGON ((4 0, 6 0, 6 10, 4 10, 4 0))")
    g = bo.union(h, v)
    # 20 + 20 - 4 overlap
    assert alg.area(g) == pytest.approx(36.0, abs=1e-6)
    inter = bo.intersection(h, v)
    assert alg.area(inter) == pytest.approx(4.0, abs=1e-6)


def test_multipolygon_input():
    mp = from_wkt(
        "MULTIPOLYGON (((0 0, 3 0, 3 3, 0 3, 0 0)), ((7 7, 10 7, 10 10, 7 10, 7 7)))"
    )
    big = from_wkt("POLYGON ((1 1, 9 1, 9 9, 1 9, 1 1))")
    inter = bo.intersection(mp, big)
    assert alg.area(inter) == pytest.approx(4.0 + 4.0, abs=1e-6)


def test_shared_edge_union():
    left = from_wkt("POLYGON ((0 0, 5 0, 5 10, 0 10, 0 0))")
    right = from_wkt("POLYGON ((5 0, 10 0, 10 10, 5 10, 5 0))")
    g = bo.union(left, right)
    assert alg.area(g) == pytest.approx(100.0, abs=1e-6)


def test_intersection_with_touching_corner():
    corner = from_wkt("POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))")
    inter = bo.intersection(A(), corner)
    assert alg.area(inter) == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# property-based fuzz: overlay identities on random rectangles/triangles
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


def _rect(x0, y0, w, h):
    return from_wkt(
        f"POLYGON (({x0} {y0}, {x0 + w} {y0}, {x0 + w} {y0 + h}, "
        f"{x0} {y0 + h}, {x0} {y0}))"
    )


coords = st.integers(min_value=-8, max_value=8)
dims = st.integers(min_value=1, max_value=9)


@given(coords, coords, dims, dims, coords, coords, dims, dims)
@settings(max_examples=300, deadline=None)
def test_overlay_identities_rectangles(x0, y0, w0, h0, x1, y1, w1, h1):
    """Inclusion-exclusion + difference laws, with the intersection
    checked against the EXACT axis-aligned overlap formula (independent of
    the overlay engine)."""
    a, b = _rect(x0, y0, w0, h0), _rect(x1, y1, w1, h1)
    aa, ab = alg.area(a), alg.area(b)
    ai = alg.area(bo.intersection(a, b))
    au = alg.area(bo.union(a, b))
    ad = alg.area(bo.difference(a, b))
    asym = alg.area(bo.sym_difference(a, b))
    # exact closed form for axis-aligned rectangle overlap
    ov = max(0, min(x0 + w0, x1 + w1) - max(x0, x1)) * max(
        0, min(y0 + h0, y1 + h1) - max(y0, y1)
    )
    assert ai == pytest.approx(ov, abs=1e-9)
    assert au == pytest.approx(aa + ab - ai, abs=1e-9)
    assert ad == pytest.approx(aa - ai, abs=1e-9)
    assert asym == pytest.approx(au - ai, abs=1e-9)


@given(coords, coords, dims, dims, coords, coords, dims)
@settings(max_examples=200, deadline=None)
def test_overlay_identities_triangle_vs_rect(x0, y0, w0, h0, tx, ty, ts):
    """Same identities with a diagonal edge in play (right triangle vs
    rectangle) — exercises non-axis-aligned intersection points."""
    a = _rect(x0, y0, w0, h0)
    b = from_wkt(
        f"POLYGON (({tx} {ty}, {tx + ts} {ty}, {tx} {ty + ts}, {tx} {ty}))"
    )
    aa, ab = alg.area(a), alg.area(b)
    ai = alg.area(bo.intersection(a, b))
    au = alg.area(bo.union(a, b))
    ad = alg.area(bo.difference(a, b))
    assert 0.0 <= ai <= min(aa, ab) + 1e-9
    assert au == pytest.approx(aa + ab - ai, abs=1e-9)
    assert ad == pytest.approx(aa - ai, abs=1e-9)
    assert max(aa, ab) - 1e-9 <= au <= aa + ab + 1e-9
