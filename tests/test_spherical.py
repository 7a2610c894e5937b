"""Spherical-edges binary predicates (wkb/spherical.py; VERDICT r4 #8).

Great-circle ST_Intersects for puntal/lineal geometries, the SQL kernel,
and the edges-metadata dispatch. The flip cases are the ones where planar
plate-carrée and spherical answers genuinely differ: antimeridian
crossings and the poleward bulge of long east-west arcs."""

import pytest

from geoarrow_rs_spark.wkb import algorithms as alg
from geoarrow_rs_spark.wkb.core import from_wkt, to_wkb
from geoarrow_rs_spark.wkb.spherical import sph_intersects


def L(a, b, c, d):
    return from_wkt(f"LINESTRING ({a} {b}, {c} {d})")


def P(x, y):
    return from_wkt(f"POINT ({x} {y})")


# (g1, g2, spherical expected, planar expected)
FLIP_CASES = [
    # arc (170,0)->(-170,10) crosses the antimeridian; the planar segment
    # runs the other way around through lon 0
    (L(170, 0, -170, 10), L(179.5, -5, 179.5, 15), True, False),
    # east-west arc at lat 45 bulges to 63.43N at lon 0
    (L(-60, 45, 60, 45), L(0, 50, 0, 60), False, False),
    (L(-60, 45, 60, 45), L(0, 63, 0, 65), True, False),
    (L(-60, 45, 60, 45), L(0, 44, 0, 46), False, True),
    (L(-60, 45, 60, 45), P(0, 63.434948822922), True, False),
]

AGREE_CASES = [
    (L(-1, -1, 1, 1), L(-1, 1, 1, -1), True),
    (L(10, 10, 11, 11), L(50, 50, 51, 51), False),
    (P(5, 5), P(5, 5), True),
    (P(5, 5), P(5, 5.001), False),
    (L(0, 0, 10, 0), L(5, 0, 15, 0), True),  # same great circle, overlap
    (L(0, 0, 10, 0), L(11, 0, 15, 0), False),  # same great circle, disjoint
    (L(0, 0, 10, 10), L(10, 10, 20, 0), True),  # touch at shared vertex
]


def test_flip_cases_vs_planar():
    for g1, g2, want_sph, want_planar in FLIP_CASES:
        assert sph_intersects(g1, g2) is want_sph
        assert alg.intersects(g1, g2) is want_planar


def test_agreement_cases():
    for g1, g2, want in AGREE_CASES:
        assert sph_intersects(g1, g2) is want
        assert alg.intersects(g1, g2) is want
        # symmetric
        assert sph_intersects(g2, g1) is want


def test_multi_kinds_and_nulls():
    ml = from_wkt("MULTILINESTRING ((170 0, -170 10), (10 10, 11 11))")
    assert sph_intersects(ml, L(179.5, -5, 179.5, 15)) is True
    mp = from_wkt("MULTIPOINT (0 63.434948822922, 40 40)")
    assert sph_intersects(mp, L(-60, 45, 60, 45)) is True
    assert sph_intersects(None, L(0, 0, 1, 1)) is None
    assert sph_intersects(L(0, 0, 1, 1), None) is None


def test_polygon_point_containment():
    poly = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert sph_intersects(poly, P(5, 5)) is True
    assert sph_intersects(P(5, 5), poly) is True
    assert sph_intersects(poly, P(20, 5)) is False
    # hole subtracts (even-odd)
    holed = from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    assert sph_intersects(holed, P(5, 5)) is False
    assert sph_intersects(holed, P(2, 2)) is True


def test_polygon_antimeridian_flip():
    # quad straddling ±180: planar sees a bowtie spanning lon [-174, 170]
    # and calls (179, 10) outside; spherically it is inside
    quad = from_wkt("POLYGON ((170 5, -174 5, -174 15, 170 15, 170 5))")
    assert sph_intersects(quad, P(179, 10)) is True
    assert alg.intersects(quad, P(179, 10)) is False
    assert sph_intersects(quad, P(160, 10)) is False


def test_polygon_polar_cap():
    # triangle around the south pole: contains the pole spherically;
    # the planar ring does not even contain its own "pole" point
    cap = from_wkt("POLYGON ((0 -80, 120 -80, -120 -80, 0 -80))")
    assert sph_intersects(cap, P(0, -90)) is True
    assert sph_intersects(cap, P(45, -85)) is True
    assert sph_intersects(cap, P(0, -70)) is False


def test_polygon_polygon():
    a = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    b = from_wkt("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    c = from_wkt("POLYGON ((20 20, 25 20, 25 25, 20 25, 20 20))")
    inner = from_wkt("POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))")
    line = L(-5, 5, 20, 5)
    assert sph_intersects(a, b) is True
    assert sph_intersects(a, c) is False
    assert sph_intersects(a, inner) is True   # containment, no boundary touch
    assert sph_intersects(inner, a) is True
    assert sph_intersects(a, line) is True    # line crosses the polygon
    assert sph_intersects(c, line) is False


def test_polygon_beyond_hemisphere_orientation_semantics():
    """Polygons exceeding an open hemisphere no longer raise: they use the
    s2/OGC orientation convention (interior on the LEFT of the outer-ring
    walk), so oceans/Russia-sized regions work without caller splitting."""
    # equator ring walked EASTWARD: left of travel = north -> interior is
    # the whole northern hemisphere (centroid degenerate -> orientation)
    north = from_wkt("POLYGON ((0 0, 90 0, 180 0, -90 0, 0 0))")
    assert sph_intersects(north, P(0, 45)) is True
    assert sph_intersects(north, P(77, 89)) is True
    assert sph_intersects(north, P(0, -45)) is False
    assert sph_intersects(north, P(-120, -5)) is False
    # a ring whose vertices fit an open hemisphere stays winding-AGNOSTIC
    # (interior = the hemisphere-bounded small region), so both windings
    # of the lat -60 ring denote the southern cap
    for ring in (
        "POLYGON ((0 -60, 90 -60, 180 -60, -90 -60, 0 -60))",
        "POLYGON ((0 -60, -90 -60, 180 -60, 90 -60, 0 -60))",
    ):
        g = from_wkt(ring)
        assert sph_intersects(g, P(45, -89)) is True
        assert sph_intersects(g, P(0, 0)) is False
    # a 200-degree-wide lune (lon 0..200, lat -80..80): vertices span more
    # than any open hemisphere -> orientation path. Eastward walk along
    # the south edge => interior on the left = the wide lune itself
    big = from_wkt(
        "POLYGON ((0 -80, 100 -80, -160 -80, -160 80, 100 80, 0 80, 0 -80))"
    )
    assert sph_intersects(big, P(100, 0)) is True
    assert sph_intersects(big, P(30, 0)) is True
    assert sph_intersects(big, P(190, 0)) is True
    assert sph_intersects(big, P(100, 75)) is True
    assert sph_intersects(big, P(-80, 0)) is False
    assert sph_intersects(big, P(-120, 0)) is False
    # reversed winding flips the interior to the 160-degree complement
    small = from_wkt(
        "POLYGON ((0 -80, 0 80, 100 80, -160 80, -160 -80, 100 -80, 0 -80))"
    )
    assert sph_intersects(small, P(-80, 0)) is True
    assert sph_intersects(small, P(100, 0)) is False
    # a crossing line still intersects the big lune via its boundary
    assert sph_intersects(big, L(-10, 0, 10, 0)) is True
    # hemisphere-sized polygons keep the winding-AGNOSTIC behavior: both
    # windings of a small triangle contain its interior point
    tri_ccw = from_wkt("POLYGON ((0 0, 10 0, 5 8, 0 0))")
    tri_cw = from_wkt("POLYGON ((0 0, 5 8, 10 0, 0 0))")
    assert sph_intersects(tri_ccw, P(5, 3)) is True
    assert sph_intersects(tri_cw, P(5, 3)) is True
    assert sph_intersects(tri_ccw, P(50, 50)) is False
    assert sph_intersects(tri_cw, P(50, 50)) is False


def test_antipodal_raises():
    with pytest.raises(ValueError):
        sph_intersects(L(0, 0, 180, 0), L(10, -10, 10, 10))


def test_sql_kernel_and_edges_dispatch(spark):
    from pyspark.sql import functions as F

    from geoarrow_rs_spark.ops.table import geom_intersects
    from geoarrow_rs_spark.types.geo_types import set_crs

    rows = [
        (1, to_wkb(L(170, 0, -170, 10)), to_wkb(L(179.5, -5, 179.5, 15))),
        (2, to_wkb(L(-60, 45, 60, 45)), to_wkb(L(0, 44, 0, 46))),
        (3, to_wkb(L(-1, -1, 1, 1)), to_wkb(L(-1, 1, 1, -1))),
    ]
    df = spark.createDataFrame(rows, "id INT, a BINARY, b BINARY")
    got = {
        r["id"]: (r["sph"], r["pl"])
        for r in df.selectExpr(
            "id",
            "ST_IntersectsSphere(a, b) AS sph",
            "ST_Intersects(a, b) AS pl",
        ).collect()
    }
    assert got == {1: (True, False), 2: (False, True), 3: (True, True)}

    # edges dispatch: identical query text, metadata picks the math
    sph_df = set_crs(set_crs(df, "a", "EPSG:4326", edges="spherical"),
                     "b", "EPSG:4326", edges="spherical")
    out_sph = {
        r["id"]: r["hit"]
        for r in sph_df.select("id", geom_intersects(sph_df, "a", "b").alias("hit")).collect()
    }
    assert out_sph == {1: True, 2: False, 3: True}
    out_pl = {
        r["id"]: r["hit"]
        for r in df.select("id", geom_intersects(df, "a", "b").alias("hit")).collect()
    }
    assert out_pl == {1: False, 2: True, 3: True}

    # conflicting tags raise
    mixed = set_crs(df, "a", "EPSG:4326", edges="spherical")
    with pytest.raises(ValueError):
        geom_intersects(mixed, "a", "b")


def test_seg2_fast_path_matches_scalar():
    """The vectorized two-point-segment fast paths must agree with the
    per-row geometry paths on a dense grid including touching, collinear,
    shared-endpoint, NaN-free generic, and null rows."""
    import numpy as np
    import pandas as pd

    from geoarrow_rs_spark.functions import kernels as K
    from geoarrow_rs_spark.wkb.spherical import sph_intersects

    rng = np.random.RandomState(7)
    segs = []
    # generic random segments (short, mid-lat)
    for _ in range(120):
        x1, y1 = rng.uniform(-170, 170), rng.uniform(-80, 80)
        segs.append((x1, y1, x1 + rng.uniform(-20, 20), y1 + rng.uniform(-20, 20)))
    # adversarial: touching / collinear / shared endpoints / antimeridian
    segs += [
        (0, 0, 10, 0), (5, 0, 15, 0), (10, 0, 20, 0), (0, 0, 10, 10),
        (10, 10, 20, 0), (5, 5, 5, -5), (0, 5, 10, 5), (170, 0, -170, 10),
        (179.5, -5, 179.5, 15), (-60, 45, 60, 45), (0, 44, 0, 46),
    ]
    a = [K.to_wkb(K.from_wkt(f"LINESTRING ({s[0]} {s[1]}, {s[2]} {s[3]})")) for s in segs]
    n = len(a)
    idx2 = rng.permutation(n)
    b = [a[i] for i in idx2]
    a[3] = None  # null row
    s1, s2 = pd.Series(a, dtype=object), pd.Series(b, dtype=object)

    fast_pl = K.k_intersects(s1, s2)
    slow_pl = K._k_intersects_slow(s1, s2)
    assert list(fast_pl) == list(slow_pl)

    fast_sp = K.k_intersects_sphere(s1, s2)
    for i in range(n):
        want = (
            None if a[i] is None or b[i] is None
            else sph_intersects(K.from_wkb(a[i]), K.from_wkb(b[i]))
        )
        assert fast_sp[i] is want or fast_sp[i] == want

    # non-seg2 columns (points / 3-vertex lines) must route to the slow path
    mixed = pd.Series(
        [K.to_wkb(K.from_wkt("POINT (5 5)")),
         K.to_wkb(K.from_wkt("LINESTRING (0 0, 5 5, 10 0)"))], dtype=object
    )
    other = pd.Series([a[0], a[1]], dtype=object)
    got = K.k_intersects(mixed, other)
    want = K._k_intersects_slow(mixed, other)
    assert list(got) == list(want)


def test_sph_min_distance():
    import math

    from geoarrow_rs_spark.wkb.algorithms import EARTH_RADIUS_M
    from geoarrow_rs_spark.wkb.spherical import sph_min_distance

    R = EARTH_RADIUS_M
    eq_arc = L(-10, 0, 10, 0)
    # cross-track: foot inside the arc -> R * 1 deg
    d = sph_min_distance(P(0, 1), eq_arc)
    assert abs(d - R * math.radians(1)) < 1e-6 * R
    # beyond the endpoint -> nearest endpoint distance (R * 10 deg)
    d = sph_min_distance(P(20, 0), eq_arc)
    assert abs(d - R * math.radians(10)) < 1e-6 * R
    # intersecting -> 0 (even though planar would disagree about the spot)
    assert sph_min_distance(L(170, 0, -170, 10), L(179.5, -5, 179.5, 15)) == 0.0
    # polygon containment -> 0; outside polygon -> distance to boundary
    poly = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert sph_min_distance(poly, P(5, 5)) == 0.0
    d = sph_min_distance(poly, P(5, -2))
    assert abs(d - R * math.radians(2)) < 1e-4 * R  # ~cross-track to the south edge
    # symmetric + None-safe
    assert sph_min_distance(P(5, -2), poly) == d
    assert sph_min_distance(None, poly) is None


def test_sql_distance_sphere_and_dwithin(spark):
    import math

    from geoarrow_rs_spark.wkb.algorithms import EARTH_RADIUS_M

    rows = [
        (1, to_wkb(P(0, 1)), to_wkb(L(-10, 0, 10, 0))),
        (2, to_wkb(P(20, 0)), to_wkb(L(-10, 0, 10, 0))),
    ]
    df = spark.createDataFrame(rows, "id INT, a BINARY, b BINARY")
    got = {
        r["id"]: (r["d"], r["w1"], r["w2"])
        for r in df.selectExpr(
            "id",
            "ST_DistanceSphere(a, b) AS d",
            "ST_DWithinSphere(a, b, 120000.0) AS w1",
            "ST_DWithinSphere(a, b, 100000.0) AS w2",
        ).collect()
    }
    R = EARTH_RADIUS_M
    assert abs(got[1][0] - R * math.radians(1)) < 1.0
    assert got[1][1] is True and got[1][2] is False  # ~111.2 km
    assert got[2][1] is False


def test_distance_fast_path_matches_scalar():
    """Vectorized point-vs-segment spherical distance must agree with the
    scalar sph_min_distance (both argument orders, nulls, empties)."""
    import numpy as np
    import pandas as pd

    from geoarrow_rs_spark.functions import kernels as K
    from geoarrow_rs_spark.wkb.spherical import sph_min_distance

    rng = np.random.RandomState(11)
    pts, arcs = [], []
    for _ in range(80):
        pts.append((rng.uniform(-175, 175), rng.uniform(-85, 85)))
        x1, y1 = rng.uniform(-170, 170), rng.uniform(-75, 75)
        arcs.append((x1, y1, x1 + rng.uniform(-25, 25), y1 + rng.uniform(-15, 15)))
    a = [K.to_wkb(P(x, y)) for x, y in pts]
    b = [K.to_wkb(L(*s)) for s in arcs]
    a[5] = None
    s1, s2 = pd.Series(a, dtype=object), pd.Series(b, dtype=object)
    for left, right in ((s1, s2), (s2, s1)):
        fast = K.k_distance_sphere(left, right)
        for i in range(len(a)):
            va, vb = left[i], right[i]
            if va is None or vb is None:
                assert fast[i] != fast[i]  # NaN
            else:
                want = sph_min_distance(K.from_wkb(va), K.from_wkb(vb))
                assert abs(fast[i] - want) <= 1e-6 * max(1.0, want)


# ---------------------------------------------------------------------------
# property-based coverage (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=150, deadline=None)
@given(
    lon=st.floats(-5.0, 5.0),
    lat=st.floats(-5.0, 5.0),
    dx1=st.floats(-0.05, 0.05),
    dy1=st.floats(-0.05, 0.05),
    dx2=st.floats(-0.05, 0.05),
    dy2=st.floats(-0.05, 0.05),
)
def test_tiny_segments_converge_to_planar(lon, lat, dx1, dy1, dx2, dy2):
    """For sub-0.1-degree segments near the equator the sphere is locally
    flat: spherical and planar intersects must agree away from boundary
    configurations (skip the ±1e-7-degree band around touching)."""
    import numpy as np

    a = L(lon, lat, lon + dx1, lat + dy1)
    b = L(lon + dx2, lat + dy2, lon + dx2 + dx1, lat + dy2 - dy1)
    planar = alg.intersects(a, b)
    # reject near-degenerate configs where the answers legitimately sit
    # inside each algorithm's epsilon band
    ax = np.array([lon, lat]); d1 = np.array([dx1, dy1]); d2 = np.array([dx2, dy2])
    if abs(np.cross(d1, np.array([dx1, -dy1]))) < 1e-8:  # near-parallel
        return
    # distance of each endpoint from the other segment's line, in degrees
    def pt_line(p, q0, q1):
        v = q1 - q0
        nv = np.hypot(v[0], v[1])
        if nv < 1e-12:
            return 0.0
        return abs(np.cross(v, p - q0)) / nv
    pts_a = [ax, ax + d1]
    pts_b = [ax + d2, ax + d2 + np.array([dx1, -dy1])]
    margin = min(
        min(pt_line(p, pts_b[0], pts_b[1]) for p in pts_a),
        min(pt_line(p, pts_a[0], pts_a[1]) for p in pts_b),
    )
    if margin < 1e-6:
        return
    assert sph_intersects(a, b) is planar


@settings(max_examples=100, deadline=None)
@given(
    lon1=st.floats(-179.0, 179.0), lat1=st.floats(-85.0, 85.0),
    lon2=st.floats(-179.0, 179.0), lat2=st.floats(-85.0, 85.0),
    lon3=st.floats(-179.0, 179.0), lat3=st.floats(-85.0, 85.0),
)
def test_sph_distance_metric_properties(lon1, lat1, lon2, lat2, lon3, lat3):
    """sph_min_distance between points is the haversine-free metric:
    symmetric, zero on identity, triangle inequality."""
    from geoarrow_rs_spark.wkb.spherical import sph_min_distance

    p1, p2, p3 = P(lon1, lat1), P(lon2, lat2), P(lon3, lat3)
    d12 = sph_min_distance(p1, p2)
    d21 = sph_min_distance(p2, p1)
    assert d12 == d21
    assert sph_min_distance(p1, p1) <= 1e-6
    d13 = sph_min_distance(p1, p3)
    d23 = sph_min_distance(p2, p3)
    # relative slack: atan2-form angles carry ~1e-10 relative float error
    assert d12 <= d13 + d23 + 1e-6 * (1.0 + d12)


@settings(max_examples=80, deadline=None)
@given(
    clon=st.floats(-170.0, 170.0),
    clat=st.floats(-60.0, 60.0),
    r=st.floats(0.5, 5.0),
    az=st.floats(0.0, 359.0),
    frac=st.floats(0.1, 2.5),
)
def test_point_in_spherical_cap_polygon(clon, clat, r, az, frac):
    """A regular 12-gon inscribed in a spherical cap: points strictly
    inside the inradius are inside, points beyond the circumradius are
    outside (the ring between is polygon-geometry-dependent, skipped)."""
    import math

    from geoarrow_rs_spark.wkb import algorithms as A
    from geoarrow_rs_spark.wkb.core import from_wkt

    verts = []
    for i in range(12):
        g = A.project_sphere(clon, clat, math.radians(r) * A.EARTH_RADIUS_M,
                             math.radians(i * 30.0))
        verts.append((g[0], g[1]))
    wkt = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in verts)
    wkt += f", {verts[0][0]} {verts[0][1]}))"
    poly = from_wkt(wkt)
    gp = A.project_sphere(clon, clat, math.radians(r * frac) * A.EARTH_RADIUS_M,
                          math.radians(az))
    pt = P(gp[0], gp[1])
    inradius = r * math.cos(math.radians(15.0))  # apothem of the 12-gon
    if frac * r < inradius * 0.98:
        assert sph_intersects(poly, pt) is True
    elif frac * r > r * 1.02:
        assert sph_intersects(poly, pt) is False


def test_geom_dwithin_edges_dispatch(spark):
    from geoarrow_rs_spark.ops.table import geom_dwithin
    from geoarrow_rs_spark.types.geo_types import set_crs

    # two points ~111 km apart (1 deg on a meridian)
    rows = [(1, to_wkb(P(0, 0)), to_wkb(P(0, 1)))]
    df = spark.createDataFrame(rows, "id INT, a BINARY, b BINARY")
    # planar: euclidean degrees
    assert df.select(geom_dwithin(df, "a", "b", 1.5).alias("w")).collect()[0]["w"] is True
    assert df.select(geom_dwithin(df, "a", "b", 0.5).alias("w")).collect()[0]["w"] is False
    # spherical: METERS
    sdf = set_crs(set_crs(df, "a", "EPSG:4326", edges="spherical"),
                  "b", "EPSG:4326", edges="spherical")
    assert sdf.select(geom_dwithin(sdf, "a", "b", 120000.0).alias("w")).collect()[0]["w"] is True
    assert sdf.select(geom_dwithin(sdf, "a", "b", 100000.0).alias("w")).collect()[0]["w"] is False
