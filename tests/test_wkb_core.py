"""WKB/WKT codec + algorithm tests against the reference's golden fixtures.

Golden 4-row pattern (two values, one null, one EMPTY) mirrors
/root/reference/rust/geoarrow-test/src/raw/*.rs; expected polygon areas
[550.0, 675.0, None, 0.0] mirror
/root/reference/rust/geoarrow-expr-geo/src/area.rs:73-93.
"""

import math

import numpy as np
import pytest

from geoarrow_rs_spark.wkb import algorithms as alg
from geoarrow_rs_spark.wkb import (
    from_wkb,
    from_wkt,
    point,
    to_wkb,
    to_wkt,
)

# reference golden WKTs (raw/point.rs, raw/linestring.rs, raw/polygon.rs, ...)
GOLDEN = {
    "point": ["POINT (30 10)", "POINT (40 20)", None, "POINT EMPTY"],
    "linestring": [
        "LINESTRING (30 10, 10 30, 40 40)",
        "LINESTRING (40 10, 20 30, 60 40)",
        None,
        "LINESTRING EMPTY",
    ],
    "polygon": [
        "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
        "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
        None,
        "POLYGON EMPTY",
    ],
    "multipoint": [
        "MULTIPOINT (10 40, 40 30, 20 20, 30 10)",
        "MULTIPOINT (40 40, 20 45, 45 30, 40 20)",
        None,
        "MULTIPOINT EMPTY",
    ],
    "multilinestring": [
        "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
        "MULTILINESTRING ((40 40, 20 45, 45 30))",
        None,
        "MULTILINESTRING EMPTY",
    ],
    "multipolygon": [
        "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))",
        "MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)))",
        None,
        "MULTIPOLYGON EMPTY",
    ],
    "geometrycollection": [
        "GEOMETRYCOLLECTION (POINT (40 10), LINESTRING (10 10, 20 20, 10 40))",
        "GEOMETRYCOLLECTION (POLYGON ((40 40, 20 45, 45 30, 40 40)))",
        None,
        "GEOMETRYCOLLECTION EMPTY",
    ],
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_wkt_wkb_roundtrip(name):
    for wkt in GOLDEN[name]:
        g = from_wkt(wkt)
        if wkt is None:
            assert g is None
            continue
        # WKB round-trip preserves structure
        g2 = from_wkb(to_wkb(g))
        assert g2.kind == g.kind
        assert g2.is_empty() == g.is_empty()
        assert to_wkt(g2) == to_wkt(g)
        # WKT round-trip reproduces input (canonical spacing)
        assert to_wkt(from_wkt(to_wkt(g))) == to_wkt(g)


def test_zm_roundtrip():
    for wkt in [
        "POINT Z (30 10 40)",
        "POINT M (30 10 300)",
        "POINT ZM (30 10 40 300)",
        "LINESTRING Z (30 10 40, 10 30 40, 40 40 80)",
        "POLYGON Z ((30 10 40, 40 40 80, 20 40 60, 10 20 20, 30 10 40))",
    ]:
        g = from_wkt(wkt)
        g2 = from_wkb(to_wkb(g))
        assert to_wkt(g2) == to_wkt(g)
        assert g2.has_z == g.has_z and g2.has_m == g.has_m


def test_big_endian_and_ewkb():
    import struct

    # big-endian point
    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 30.0, 10.0)
    g = from_wkb(be)
    assert g.kind == 1 and g.data[0] == 30.0 and g.data[1] == 10.0
    # EWKB with SRID + Z flag
    ewkb = (
        b"\x01"
        + struct.pack("<I", 0x80000000 | 0x20000000 | 1)
        + struct.pack("<I", 4326)
        + struct.pack("<ddd", 1.0, 2.0, 3.0)
    )
    g = from_wkb(ewkb)
    assert g.has_z and g.srid == 4326 and g.data[2] == 3.0


def test_area_golden():
    # area.rs:73-93 — [550.0, 675.0, null, 0.0]
    polys = GOLDEN["polygon"]
    areas = [alg.area(from_wkt(w)) for w in polys]
    assert areas[0] == 550.0
    assert areas[1] == 675.0
    assert areas[2] is None
    assert areas[3] == 0.0


def test_signed_area_orientation():
    ccw = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    cw = from_wkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")
    assert alg.signed_area(ccw) == 100.0
    assert alg.signed_area(cw) == -100.0
    assert alg.area(cw) == 100.0


def test_length_and_perimeter():
    line = from_wkt("LINESTRING (0 0, 3 4)")
    assert alg.length(line) == 5.0
    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert alg.length(sq) == 0.0
    assert alg.perimeter(sq) == 40.0


def test_centroid():
    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    c = alg.centroid(sq)
    assert (c.data[0], c.data[1]) == (5.0, 5.0)
    line = from_wkt("LINESTRING (0 0, 10 0)")
    c = alg.centroid(line)
    assert (c.data[0], c.data[1]) == (5.0, 0.0)
    mp = from_wkt("MULTIPOINT (0 0, 10 0, 10 10, 0 10)")
    c = alg.centroid(mp)
    assert (c.data[0], c.data[1]) == (5.0, 5.0)
    # mixed: areal dominates
    gc = from_wkt(
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), POINT (100 100))"
    )
    c = alg.centroid(gc)
    assert (c.data[0], c.data[1]) == (1.0, 1.0)


def test_centroid_polygon_with_hole():
    p = from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    )
    c = alg.centroid(p)
    # centroid pushed away from the hole at (2,2)
    assert c.data[0] > 5.0 and c.data[1] > 5.0
    total = 100.0
    hole = 4.0
    exp_x = (5.0 * total - 2.0 * hole) / (total - hole)
    assert abs(c.data[0] - exp_x) < 1e-9


def test_bounds_envelope_center():
    g = from_wkt("LINESTRING (1 2, 5 9, -3 4)")
    assert alg.bounds(g) == (-3.0, 2.0, 5.0, 9.0)
    env = alg.envelope(g)
    assert alg.area(env) == 8 * 7
    c = alg.center(g)
    assert (c.data[0], c.data[1]) == (1.0, 5.5)
    assert alg.bounds(from_wkt("POLYGON EMPTY")) is None


def test_convex_hull():
    mp = from_wkt("MULTIPOINT (0 0, 10 0, 10 10, 0 10, 5 5, 2 3)")
    h = alg.convex_hull(mp)
    assert alg.area(h) == 100.0
    tri = from_wkt("MULTIPOINT (0 0, 4 0, 0 3)")
    assert alg.area(alg.convex_hull(tri)) == 6.0


def test_minimum_rotated_rect():
    # tilted segment-ish rectangle of points
    mp = from_wkt("MULTIPOINT (0 0, 2 2, 3 1, 1 -1)")
    r = alg.minimum_rotated_rect(mp)
    assert abs(alg.area(r) - math.hypot(2, 2) * math.hypot(1, 1)) < 1e-9


def test_predicates_point_polygon():
    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    inside = point(5, 5)
    onb = point(0, 5)
    outside = point(15, 5)
    assert alg.intersects(sq, inside) and alg.contains(sq, inside)
    assert alg.intersects(sq, onb) and not alg.contains(sq, onb)
    assert alg.covers(sq, onb)
    assert not alg.intersects(sq, outside)
    assert alg.within(inside, sq)
    assert alg.touches(sq, onb)
    # hole
    holed = from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    assert not alg.contains(holed, point(5, 5))
    assert alg.contains(holed, point(2, 2))


def test_predicates_line_line():
    a = from_wkt("LINESTRING (0 0, 10 10)")
    b = from_wkt("LINESTRING (0 10, 10 0)")
    c = from_wkt("LINESTRING (0 1, 10 11)")
    assert alg.intersects(a, b)
    assert alg.crosses(a, b)
    assert not alg.intersects(a, c)
    assert alg.disjoint(a, c)
    # collinear overlap: intersects but does not cross
    d = from_wkt("LINESTRING (5 5, 15 15)")
    assert alg.intersects(a, d)
    assert not alg.crosses(a, d)
    assert alg.overlaps(a, d)


def test_predicates_polygon_polygon():
    a = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    b = from_wkt("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    c = from_wkt("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))")
    inner = from_wkt("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    assert alg.intersects(a, b)
    assert alg.overlaps(a, b)
    assert not alg.intersects(a, c)
    assert alg.contains(a, inner)
    assert alg.within(inner, a)
    assert not alg.overlaps(a, inner)
    # touching squares
    t = from_wkt("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")
    assert alg.intersects(a, t)
    assert alg.touches(a, t)
    assert not alg.overlaps(a, t)


def test_equals():
    a = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    b = from_wkt("POLYGON ((10 0, 10 10, 0 10, 0 0, 10 0))")  # rotated start
    assert alg.equals(a, b)
    assert alg.equals_exact(a, a)
    assert not alg.equals_exact(a, b)


def test_distance():
    a = point(0, 0)
    b = point(3, 4)
    assert alg.distance(a, b) == 5.0
    sq = from_wkt("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")
    assert alg.distance(a, sq) == 10.0
    assert alg.distance(point(15, 5), sq) == 0.0
    line = from_wkt("LINESTRING (0 10, 10 10)")
    assert alg.distance(point(5, 0), line) == 10.0
    # segment-interior to segment-interior
    l1 = from_wkt("LINESTRING (0 0, 10 0)")
    l2 = from_wkt("LINESTRING (0 5, 10 5)")
    assert alg.distance(l1, l2) == 5.0


def test_frechet_hausdorff():
    a = from_wkt("LINESTRING (0 0, 10 0)")
    b = from_wkt("LINESTRING (0 1, 10 1)")
    assert alg.frechet_distance(a, b) == 1.0
    assert alg.hausdorff_distance(a, b) == 1.0


def test_line_interpolate_locate():
    line = from_wkt("LINESTRING (0 0, 10 0)")
    p = alg.line_interpolate_point(line, 0.5)
    assert (p.data[0], p.data[1]) == (5.0, 0.0)
    p = alg.line_interpolate_point(line, 2.0)  # clamped
    assert (p.data[0], p.data[1]) == (10.0, 0.0)
    assert alg.line_locate_point(line, point(5, 3)) == 0.5
    bent = from_wkt("LINESTRING (0 0, 10 0, 10 10)")
    p = alg.line_interpolate_point(bent, 0.75)
    assert (p.data[0], p.data[1]) == (10.0, 5.0)


def test_transforms():
    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    t = alg.translate(sq, 5, -5)
    assert alg.bounds(t) == (5.0, -5.0, 15.0, 5.0)
    s = alg.scale(sq, 2, 2, origin=(0, 0))
    assert alg.area(s) == 400.0
    r = alg.rotate(sq, 90, origin=(0, 0))
    b = alg.bounds(r)
    assert abs(b[0] + 10) < 1e-9 and abs(b[3] - 10) < 1e-9
    assert abs(alg.area(r) - 100.0) < 1e-9
    sk = alg.skew(sq, 45, 0, origin=(0, 0))
    assert abs(alg.area(sk) - 100.0) < 1e-9  # shear preserves area


def test_simplify():
    line = from_wkt("LINESTRING (0 0, 5 0.1, 10 0)")
    s = alg.simplify(line, 1.0)
    assert len(s.data) == 2
    assert alg.length(s) == 10.0
    keep = alg.simplify(line, 0.01)
    assert len(keep.data) == 3
    vw = alg.simplify_vw(line, 10.0)
    assert len(vw.data) == 2


def test_densify_chaikin_dedup():
    line = from_wkt("LINESTRING (0 0, 10 0)")
    d = alg.densify(line, 3.0)
    assert len(d.data) == 5  # 0, 2.5, 5, 7.5, 10
    assert alg.length(d) == 10.0
    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    sm = alg.chaikin_smoothing(sq, 1)
    assert alg.area(sm) < 100.0
    assert alg.area(sm) > 80.0
    rep = from_wkt("LINESTRING (0 0, 0 0, 5 0, 5 0, 10 0)")
    rr = alg.remove_repeated_points(rep)
    assert len(rr.data) == 3


def test_buffer():
    b = alg.buffer(point(0, 0), 10.0, quadsegs=64)
    assert abs(alg.area(b) - math.pi * 100) / (math.pi * 100) < 1e-3
    assert alg.buffer(point(0, 0), -1).is_empty()
    # line capsule: 2*r*L + pi*r^2
    lb = alg.buffer(from_wkt("LINESTRING (0 0, 10 0)"), 2.0, quadsegs=16)
    assert alg.area(lb) == pytest.approx(40 + math.pi * 4, rel=0.01)
    # polygon: area + perimeter*r + pi*r^2
    pb = alg.buffer(from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"), 1.0, quadsegs=16)
    assert alg.area(pb) == pytest.approx(100 + 40 + math.pi, rel=0.01)
    # buffered result contains the original
    assert alg.covers(pb, from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))


def test_interior_point_and_polylabel():
    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    ip = alg.interior_point(sq)
    assert alg.contains(sq, ip)
    # C-shape where centroid is outside
    c_shape = from_wkt(
        "POLYGON ((0 0, 10 0, 10 2, 2 2, 2 8, 10 8, 10 10, 0 10, 0 0))"
    )
    ip = alg.interior_point(c_shape)
    assert alg.contains(c_shape, ip)
    pl = alg.polylabel(sq, 0.1)
    assert abs(pl.data[0] - 5) < 0.5 and abs(pl.data[1] - 5) < 0.5


def test_validity():
    assert alg.is_valid(from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
    bow = from_wkt("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")
    assert not alg.is_valid(bow)
    assert "self-intersect" in alg.validity_reason(bow)
    open_ring = from_wkt("LINESTRING (0 0, 10 0, 10 10)")
    assert not alg.is_ring(open_ring)
    closed = from_wkt("LINESTRING (0 0, 10 0, 10 10, 0 0)")
    assert alg.is_ring(closed)
    assert alg.is_simple(from_wkt("LINESTRING (0 0, 1 1, 2 0)"))
    assert not alg.is_simple(from_wkt("LINESTRING (0 0, 10 10, 10 0, 0 10)"))


def test_spherical_and_haversine():
    # 1-degree square at equator ≈ (111.19 km)^2
    sq = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    a = alg.spherical_area(sq)
    assert abs(a) / 1e6 == pytest.approx(111.19**2, rel=0.01)
    line = from_wkt("LINESTRING (0 0, 1 0)")
    assert alg.haversine_length(line) == pytest.approx(111_195, rel=0.001)
    assert alg.haversine_distance(0, 0, 0, 1) == pytest.approx(111_195, rel=0.001)


def test_multipoint_wkt_with_parens():
    g = from_wkt("MULTIPOINT ((10 40), (40 30))")
    assert g.data.shape == (2, 2)


def test_to_ewkb_roundtrip_and_flags():
    import struct

    from geoarrow_rs_spark.wkb.core import to_ewkb

    # srid=0 -> plain ISO bytes
    g = from_wkt("POINT (3 4)")
    assert to_ewkb(g) == to_wkb(g)
    # srid set -> SRID flag + word in the top-level header, body unchanged
    g.srid = 3857
    e = to_ewkb(g)
    (code,) = struct.unpack_from("<I", e, 1)
    assert code & 0x20000000
    (srid,) = struct.unpack_from("<I", e, 5)
    assert srid == 3857
    g2 = from_wkb(e)
    assert g2.srid == 3857 and to_wkt(g2) == "POINT (3 4)"
    # Z/M survive the EWKB header (flag bits, not ISO 1000-offsets)
    gz = from_wkt("POINT ZM (1 2 3 4)")
    gz.srid = 4326
    gz2 = from_wkb(to_ewkb(gz))
    assert gz2.has_z and gz2.has_m and gz2.srid == 4326
    assert to_wkt(gz2) == to_wkt(gz)
    # nested kinds keep only the top-level SRID, like PostGIS
    gm = from_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
    gm.srid = 2154
    gm2 = from_wkb(to_ewkb(gm))
    assert gm2.srid == 2154 and to_wkt(gm2) == to_wkt(gm)
