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


# ---------------------------------------------------------------------------
# CRS reprojection (ST_Transform / wkb.proj)
# ---------------------------------------------------------------------------

def test_proj_webmercator_closed_form():
    import numpy as np
    from geoarrow_rs_spark.wkb import proj

    lon, lat = np.array([2.2945]), np.array([48.8584])
    x, y = proj.webmercator_forward(lon, lat)
    R = proj.WGS84_A
    assert x[0] == pytest.approx(R * np.radians(2.2945), rel=1e-15)
    assert y[0] == pytest.approx(R * np.log(np.tan(np.pi / 4 + np.radians(48.8584) / 2)), rel=1e-15)
    lon2, lat2 = proj.webmercator_inverse(x, y)
    assert lon2[0] == pytest.approx(2.2945, abs=1e-12)
    assert lat2[0] == pytest.approx(48.8584, abs=1e-12)


def test_proj_utm_roundtrip_and_meridian():
    import numpy as np
    from geoarrow_rs_spark.wkb import proj

    rng = np.random.default_rng(7)
    lon = rng.uniform(0.1, 5.9, 500)
    lat = rng.uniform(-80, 84, 500)
    E, N = proj.tm_forward(lon, lat, 3.0)
    lon2, lat2 = proj.tm_inverse(E, N, 3.0)
    assert np.abs(lon2 - lon).max() < 1e-10
    assert np.abs(lat2 - lat).max() < 1e-10
    # central meridian: E = 500000 exactly, N = k0 * meridian arc (numerically
    # integrated — independent of the Krueger series under test)
    E0, N0 = proj.tm_forward(np.array([3.0]), np.array([45.0]), 3.0)
    theta = np.linspace(0.0, np.radians(45.0), 400001)
    integrand = (1 - proj._E2 * np.sin(theta) ** 2) ** -1.5
    M = proj.WGS84_A * (1 - proj._E2) * np.trapz(integrand, theta)
    assert E0[0] == pytest.approx(500000.0, abs=1e-6)
    assert N0[0] == pytest.approx(0.9996 * M, abs=1e-3)


def test_proj_utm_matches_independent_redfearn():
    """Cross-check the Karney series against an independently coded Redfearn
    expansion (agreement within Redfearn's own ~mm truncation error)."""
    import numpy as np
    from geoarrow_rs_spark.wkb import proj

    def redfearn(lon_deg, lat_deg, lon0):
        a, f = proj.WGS84_A, 1 / 298.257223563
        e2 = f * (2 - f)
        ep2 = e2 / (1 - e2)
        phi, lam = np.radians(lat_deg), np.radians(lon_deg - lon0)
        Nn = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        T, C = np.tan(phi) ** 2, ep2 * np.cos(phi) ** 2
        A = lam * np.cos(phi)
        M = a * ((1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
                 - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
                 + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
                 - (35 * e2**3 / 3072) * np.sin(6 * phi))
        k0 = 0.9996
        E = k0 * Nn * (A + (1 - T + C) * A**3 / 6
                       + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120) + 500000
        N = k0 * (M + Nn * np.tan(phi) * (A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
                  + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720))
        return E, N

    for lon, lat in [(2.2945, 48.8584), (0.5, -33.9), (5.9, 70.2), (3.0, 0.0)]:
        E1, N1 = proj.tm_forward(np.array([lon]), np.array([lat]), 3.0)
        E2, N2 = redfearn(lon, lat, 3.0)
        assert abs(E1[0] - E2) < 0.005
        assert abs(N1[0] - N2) < 0.005


def test_transform_crs_geometry_and_southern_utm():
    from geoarrow_rs_spark.wkb import algorithms as alg
    from geoarrow_rs_spark.wkb import from_wkt, to_wkt

    line = from_wkt("LINESTRING (172.5 -43.5, 172.6 -43.6)")  # NZ, zone 59S
    utm = alg.transform_crs(line, 4326, 32759)
    assert utm.data[:, 1].min() > 0  # false northing keeps N positive
    back = alg.transform_crs(utm, "EPSG:32759", "EPSG:4326")
    assert back.data[0][0] == pytest.approx(172.5, abs=1e-9)
    assert back.data[1][1] == pytest.approx(-43.6, abs=1e-9)
    # polygon through web mercator and back preserves area approximately
    poly = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    rt = alg.transform_crs(alg.transform_crs(poly, 4326, 3857), 3857, 4326)
    assert alg.area(rt) == pytest.approx(1.0, abs=1e-12)


def test_st_transform_sql(spark):
    from geoarrow_rs_spark.functions import register_functions

    register_functions(spark)
    row = spark.sql(
        "SELECT ST_X(ST_Transform(ST_Point(3.0, 0.0), 'EPSG:4326', 'EPSG:32631')) AS e, "
        "ST_Y(ST_Transform(ST_Point(3.0, 0.0), 'EPSG:4326', 'EPSG:32631')) AS n"
    ).first()
    assert row["e"] == pytest.approx(500000.0, abs=1e-6)
    assert row["n"] == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# ellipsoidal (geodesic) area + perimeter
# ---------------------------------------------------------------------------

def test_ellipsoidal_area_closed_form_quad():
    """Meridian/parallel-edged quad: the Green's-theorem engine is exact vs
    the closed-form ellipsoid zone area."""
    import math

    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    b2 = a * a * (1 - e2)

    def F(lat_deg):
        s = math.sin(math.radians(lat_deg))
        return b2 / 2 * (s / (1 - e2 * s * s) + math.atanh(e * s) / e)

    quad = from_wkt("POLYGON ((10 40, 12 40, 12 45, 10 45, 10 40))")
    got = alg.ellipsoidal_area(quad)
    exp = math.radians(2.0) * (F(45) - F(40))
    assert got == pytest.approx(exp, rel=1e-14)
    # orientation-independent, ~0.16% above the spherical value at 40-45N
    cw = from_wkt("POLYGON ((10 40, 10 45, 12 45, 12 40, 10 40))")
    assert alg.ellipsoidal_area(cw) == pytest.approx(got, rel=1e-14)
    assert got / abs(alg.spherical_area(quad)) == pytest.approx(1.0016, abs=5e-4)


def test_ellipsoidal_area_holes_and_quadrature():
    import numpy as np
    from geoarrow_rs_spark.wkb.core import Geom, POLYGON

    holey = from_wkt(
        "POLYGON ((10 40, 12 40, 12 45, 10 45, 10 40),"
        " (10.5 41, 11 41, 11 42, 10.5 42, 10.5 41))"
    )
    outer = from_wkt("POLYGON ((10 40, 12 40, 12 45, 10 45, 10 40))")
    hole = from_wkt("POLYGON ((10.5 41, 11 41, 11 42, 10.5 42, 10.5 41))")
    assert alg.ellipsoidal_area(holey) == pytest.approx(
        alg.ellipsoidal_area(outer) - alg.ellipsoidal_area(hole), rel=1e-12
    )
    # GL8 quadrature on a long diagonal edge vs 20k-point densification
    tri = from_wkt("POLYGON ((0 0, 30 0, 15 30, 0 0))")
    pts = [[0.0, 0.0], [30.0, 0.0], [15.0, 30.0], [0.0, 0.0]]
    segs = []
    for i in range(3):
        t = np.linspace(0, 1, 20000, endpoint=False)[:, None]
        segs.append(np.array(pts[i])[None, :] * (1 - t) + np.array(pts[i + 1])[None, :] * t)
    segs.append(np.array([pts[0]]))
    dense = Geom(POLYGON, [np.vstack(segs)])
    assert alg.ellipsoidal_area(tri) == pytest.approx(
        alg.ellipsoidal_area(dense), rel=1e-9
    )


def test_ellipsoidal_perimeter_vincenty():
    quad = from_wkt("POLYGON ((10 40, 12 40, 12 45, 10 45, 10 40))")
    exp = (
        alg.vincenty_distance(10, 40, 12, 40)
        + alg.vincenty_distance(12, 40, 12, 45)
        + alg.vincenty_distance(12, 45, 10, 45)
        + alg.vincenty_distance(10, 45, 10, 40)
    )
    assert alg.ellipsoidal_perimeter(quad) == pytest.approx(exp, rel=1e-12)
    # meridian degree at 40-45N is ~111.1 km; sanity of magnitude
    assert 1.3e6 < alg.ellipsoidal_perimeter(quad) < 1.6e6


# ---------------------------------------------------------------------------
# geodesic destination (ST_Project) + negative buffer
# ---------------------------------------------------------------------------

def test_project_spheroid_roundtrip():
    """Vincenty direct then inverse returns the input distance (mm level)."""
    for (lon, lat, d, az) in [
        (2.29, 48.85, 50_000, 0.7),
        (-70.0, -33.0, 120_000, 4.1),
        (150.0, 60.0, 5_000, 2.0),
        (0.0, 0.0, 1_000_000, 1.2),
    ]:
        lon2, lat2 = alg.project_spheroid(lon, lat, d, az)
        assert alg.vincenty_distance(lon, lat, lon2, lat2) == pytest.approx(d, abs=1e-3)


def test_project_sphere_matches_spheroid_roughly():
    lon2, lat2 = alg.project_sphere(10, 45, 100_000, 1.0)
    lon3, lat3 = alg.project_spheroid(10, 45, 100_000, 1.0)
    assert lon2 == pytest.approx(lon3, abs=0.02)
    assert lat2 == pytest.approx(lat3, abs=0.02)
    # due north by quarter meridian from equator ~ north pole (sphere)
    import math

    _, lat_np = alg.project_sphere(0, 0, math.pi / 2 * 6371008.8, 0.0)
    assert lat_np == pytest.approx(90.0, abs=1e-6)


def test_negative_buffer_erosion():
    """buffer(poly, -w) == morphological erosion via boundary-capsule
    subtraction; exact for the axis-aligned square."""
    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert alg.area(alg.buffer(sq, -1.0, 8)) == pytest.approx(64.0)
    assert alg.area(alg.buffer(sq, -5.0, 8)) == pytest.approx(0.0, abs=1e-9)
    holey = from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    a = alg.area(alg.buffer(holey, -0.5, 8))
    assert 70 < a < 74  # 9x9 shell minus 3x3-with-rounded-corners hole
    assert alg.buffer(from_wkt("LINESTRING (0 0, 5 5)"), -1.0).is_empty()


def test_union_of_disjoint_annuli():
    """Regression: union of two disjoint polygons-with-holes lost one side
    (degenerate capsule seams + probes landing on coincident boundaries)."""
    from geoarrow_rs_spark.wkb import booleanops as bo
    from geoarrow_rs_spark.wkb.core import Geom, MULTILINESTRING
    import numpy as np

    holey = from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    rings = [np.asarray(r[:, :2]) for r in holey.data]
    outer = alg.buffer(Geom(MULTILINESTRING, rings[:1]), 0.5, 8)
    inner = alg.buffer(Geom(MULTILINESTRING, rings[1:]), 0.5, 8)
    u = bo.geom_union(outer, inner)
    assert alg.area(u) == pytest.approx(alg.area(outer) + alg.area(inner), rel=1e-9)


def test_laea_and_polar_projections_roundtrip_and_properties():
    """LAEA Europe (EPSG:3035) and polar stereographic (EPSG:3413/3031):
    origin anchors exact, round-trips below 1e-9 degrees, the defining
    property of each holds (LAEA: unit area scale; polar stereographic:
    scale exactly 1 on the standard parallel)."""
    import numpy as np

    from geoarrow_rs_spark.wkb import proj

    x, y = proj.laea_forward(np.array([10.0]), np.array([52.0]), 3035)
    assert abs(x[0] - 4_321_000.0) < 1e-9 and abs(y[0] - 3_210_000.0) < 1e-9
    x, y = proj.polar_forward(np.array([0.0]), np.array([90.0]), 3413)
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    x, y = proj.polar_forward(np.array([0.0]), np.array([-90.0]), 3031)
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9

    rng = np.random.default_rng(13)
    lon = rng.uniform(-25, 45, 5000)
    lat = rng.uniform(28, 72, 5000)
    lo2, la2 = proj.laea_inverse(*proj.laea_forward(lon, lat, 3035), 3035)
    assert np.abs(lo2 - lon).max() < 1e-9
    assert np.abs(la2 - lat).max() < 1e-9
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(55, 89.99, 5000)
    lo2, la2 = proj.polar_inverse(*proj.polar_forward(lon, lat, 3413), 3413)
    dl = (lo2 - lon + 180.0) % 360.0 - 180.0
    assert np.abs(dl).max() < 1e-9
    assert np.abs(la2 - lat).max() < 1e-9
    lat = -lat
    lo2, la2 = proj.polar_inverse(*proj.polar_forward(lon, lat, 3031), 3031)
    dl = (lo2 - lon + 180.0) % 360.0 - 180.0
    assert np.abs(dl).max() < 1e-9
    assert np.abs(la2 - lat).max() < 1e-9

    a, f = proj.GRS80_A, proj.GRS80_F
    e2 = f * (2 - f)
    d = 1e-6
    for lon0, lat0 in ((10.0, 52.0), (25.0, 40.0), (-5.0, 65.0)):
        x0, y0 = proj.laea_forward(np.array([lon0]), np.array([lat0]), 3035)
        xe, ye = proj.laea_forward(np.array([lon0 + d]), np.array([lat0]), 3035)
        xn, yn = proj.laea_forward(np.array([lon0]), np.array([lat0 + d]), 3035)
        pa = abs(float((xe - x0) * (yn - y0) - (xn - x0) * (ye - y0)))
        s = np.sin(np.radians(lat0))
        M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        N = a / np.sqrt(1 - e2 * s * s)
        ea = np.radians(d) * M * np.radians(d) * N * np.cos(np.radians(lat0))
        assert abs(pa / float(ea) - 1.0) < 1e-6

    # polar stereographic: scale exactly 1 on the standard parallel (70N)
    aw, fw = proj.WGS84_A, proj.WGS84_F
    e2w = fw * (2 - fw)
    dl = 1e-6
    x1, y1 = proj.polar_forward(np.array([20.0]), np.array([70.0]), 3413)
    x2, y2 = proj.polar_forward(np.array([20.0 + dl]), np.array([70.0]), 3413)
    s = np.sin(np.radians(70.0))
    arc = np.radians(dl) * aw * np.cos(np.radians(70.0)) / np.sqrt(1 - e2w * s * s)
    assert abs(float(np.hypot(x2 - x1, y2 - y1)) / float(arc) - 1.0) < 1e-6


def test_conic_projections_roundtrip_and_anchors():
    """Albers (EPSG:5070) and Lambert-93 (EPSG:2154): origin anchors are
    exact, forward/inverse round-trips close to 1e-9 degrees across the
    valid domain, and the defining property of each holds (scale 1 on LCC
    standard parallels; unit area scale for AEA)."""
    import numpy as np

    from geoarrow_rs_spark.wkb import proj

    x, y = proj.conic_forward(np.array([-96.0]), np.array([23.0]), 5070)
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    x, y = proj.conic_forward(np.array([3.0]), np.array([46.5]), 2154)
    assert abs(x[0] - 700000.0) < 1e-9 and abs(y[0] - 6600000.0) < 1e-9

    rng = np.random.default_rng(11)
    lon = rng.uniform(-125, -70, 5000)
    lat = rng.uniform(24, 50, 5000)
    lo2, la2 = proj.conic_inverse(*proj.conic_forward(lon, lat, 5070), 5070)
    assert np.abs(lo2 - lon).max() < 1e-9
    assert np.abs(la2 - lat).max() < 1e-9
    lon = rng.uniform(-5, 10, 5000)
    lat = rng.uniform(41, 51, 5000)
    lo2, la2 = proj.conic_inverse(*proj.conic_forward(lon, lat, 2154), 2154)
    assert np.abs(lo2 - lon).max() < 1e-9
    assert np.abs(la2 - lat).max() < 1e-9

    # LCC conformal: scale exactly 1 on the standard parallels
    a, f = proj.GRS80_A, proj.GRS80_F
    e2 = f * (2 - f)
    for latsp in (44.0, 49.0):
        dl = 1e-6
        x1, y1 = proj.conic_forward(np.array([3.0]), np.array([latsp]), 2154)
        x2, y2 = proj.conic_forward(np.array([3.0 + dl]), np.array([latsp]), 2154)
        s = np.sin(np.radians(latsp))
        arc = np.radians(dl) * a * np.cos(np.radians(latsp)) / np.sqrt(1 - e2 * s * s)
        assert abs(float(np.hypot(x2 - x1, y2 - y1)) / arc - 1.0) < 1e-6

    # AEA equal-area: projected/ellipsoidal area ratio 1
    d = 1e-6
    for lon0, lat0 in ((-110.0, 40.0), (-80.0, 30.0)):
        x0, y0 = proj.conic_forward(np.array([lon0]), np.array([lat0]), 5070)
        xe, ye = proj.conic_forward(np.array([lon0 + d]), np.array([lat0]), 5070)
        xn, yn = proj.conic_forward(np.array([lon0]), np.array([lat0 + d]), 5070)
        pa = abs(float((xe - x0) * (yn - y0) - (xn - x0) * (ye - y0)))
        s = np.sin(np.radians(lat0))
        M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        N = a / np.sqrt(1 - e2 * s * s)
        ea = np.radians(d) * M * np.radians(d) * N * np.cos(np.radians(lat0))
        assert abs(pa / ea - 1.0) < 1e-6


def test_pyproj_hook_falls_back_cleanly(monkeypatch):
    """With the hook on but pyproj absent (this container), transform_xy
    keeps using the closed forms and unknown CRSs still raise."""
    import numpy as np
    import pytest as _pytest

    from geoarrow_rs_spark.wkb import proj

    monkeypatch.setattr(proj, "USE_PYPROJ", True)
    x, y = proj.transform_xy(np.array([10.0]), np.array([45.0]), 4326, 3857)
    ex, ey = proj.webmercator_forward(np.array([10.0]), np.array([45.0]))
    assert x[0] == ex[0] and y[0] == ey[0]
    # 27700/2157 are covered natively now; Krovak (5514) still needs pyproj
    assert proj.supported_crs(27700) and proj.supported_crs(2157)
    assert not proj.supported_crs(5514)
    with _pytest.raises(ValueError):
        proj.transform_xy(np.array([0.0]), np.array([0.0]), 4326, 5514)


def test_tmerc_bng_matches_os_worked_example():
    """The parameterized-ellipsoid TM core reproduces the Ordnance Survey's
    published worked example ('A guide to coordinate systems in Great
    Britain': OSGB36 52deg39'27.2531\"N 1deg43'4.5177\"E ->
    E 651409.903 N 313177.270) to the millimeter — validating the Airy
    ellipsoid series, the 49N latitude-of-origin arc offset, and k0/fe/fn
    handling at once."""
    import numpy as np

    from geoarrow_rs_spark.wkb import proj as P

    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    E, N = P.tm_forward(
        np.array([lon]), np.array([lat]), -2.0, k0=0.9996012717,
        fe=400_000.0, fn=-100_000.0, a=P.AIRY_A, f=P.AIRY_F, lat0_deg=49.0,
    )
    assert abs(E[0] - 651409.903) < 1.5e-3
    assert abs(N[0] - 313177.270) < 1.5e-3


def test_tmerc_national_grids_roundtrip():
    """transform_xy round trips through every registered national grid.
    Datum-shift-free grids (ETRS89 UTM, GDA94 MGA) close to < 1e-9 deg;
    the OSGB36 grid closes to < 1e-7 deg — the residual is the h=0
    convention coupling through the Helmert rotation/scale (identical in
    any 2D Helmert pipeline, pyproj included), not series error."""
    import numpy as np

    from geoarrow_rs_spark.wkb import proj as P

    rng = np.random.default_rng(42)
    cases = {
        25832: ((6.0, 12.0), (47.0, 56.0), 1e-9),
        25833: ((12.0, 18.0), (47.0, 56.0), 1e-9),
        28355: ((144.0, 150.0), (-44.0, -35.0), 1e-9),
        28356: ((150.0, 156.0), (-38.0, -24.0), 1e-9),
        27700: ((-6.0, 1.8), (50.0, 58.0), 1e-7),
    }
    for epsg, ((lo0, lo1), (la0, la1), tol) in cases.items():
        lons = rng.uniform(lo0, lo1, 200)
        lats = rng.uniform(la0, la1, 200)
        x, y = P.transform_xy(lons, lats, 4326, epsg)
        lon2, lat2 = P.transform_xy(x, y, epsg, 4326)
        assert np.abs(lon2 - lons).max() < tol, epsg
        assert np.abs(lat2 - lats).max() < tol, epsg


def test_tmerc_helmert_shift_magnitude_and_exact_inverse():
    """The OSGB36 datum shift moves UK points by a plausible 50-200 m
    (vs the no-shift projection), and the Helmert matrix inverse is exact:
    ECEF -> datum -> ECEF closes to float precision."""
    import numpy as np

    from geoarrow_rs_spark.wkb import proj as P

    lon, lat = np.array([-1.5]), np.array([52.5])
    with_shift = np.array(P.transform_xy(lon, lat, 4326, 27700))
    lon_no, lat_no = lon, lat  # pretend WGS84 == OSGB36 (no shift)
    E_no, N_no = P.tm_forward(
        lon_no, lat_no, -2.0, k0=0.9996012717, fe=400_000.0, fn=-100_000.0,
        a=P.AIRY_A, f=P.AIRY_F, lat0_deg=49.0,
    )
    d = float(np.hypot(with_shift[0][0] - E_no[0], with_shift[1][0] - N_no[0]))
    assert 50.0 < d < 200.0

    X, Y, Z = P.geodetic_to_ecef(lon, lat, P.WGS84_A, P.WGS84_F)
    M, t, Minv = P._helmert_for(P.OSGB36_TO_WGS84)
    V = M @ np.vstack([X, Y, Z]) + t[:, None]
    W = Minv @ (V - t[:, None])
    assert np.abs(W - np.vstack([X, Y, Z])).max() < 1e-6  # meters


def test_tmerc_zone_families_and_special_grids():
    """GRS80 zone families (ETRS89/NAD83/GDA94/GDA2020 UTM ranges) resolve
    by rule with the same math as the explicit entries; ITM and NZTM map
    their projection origin to the exact false origin (closed anchor) and
    round-trip below 1e-9 deg."""
    import numpy as np

    from geoarrow_rs_spark.wkb import proj as P

    # the natural origin lands exactly on (fe, fn) for datum-free grids
    e, n = P.transform_xy(np.array([-8.0]), np.array([53.5]), 4326, 2157)
    assert abs(e[0] - 600_000.0) < 1e-6 and abs(n[0] - 750_000.0) < 1e-6
    e, n = P.transform_xy(np.array([173.0]), np.array([0.0]), 4326, 2193)
    assert abs(e[0] - 1_600_000.0) < 1e-6 and abs(n[0] - 10_000_000.0) < 1e-6

    rng = np.random.default_rng(7)
    cases = {
        2157: ((-10.5, -5.5), (51.4, 55.4)),    # Irish TM
        2193: ((166.0, 178.5), (-47.3, -34.1)), # NZTM
        26917: ((-84.0, -78.0), (25.0, 48.0)),  # NAD83 / UTM 17N
        25830: ((-6.0, 0.0), (36.0, 44.0)),     # ETRS89 / UTM 30N
        28354: ((138.0, 144.0), (-39.0, -26.0)),# GDA94 / MGA 54
        7855: ((144.0, 150.0), (-39.0, -26.0)), # GDA2020 / MGA 55
    }
    for epsg, ((lo0, lo1), (la0, la1)) in cases.items():
        lons = rng.uniform(lo0, lo1, 100)
        lats = rng.uniform(la0, la1, 100)
        x, y = P.transform_xy(lons, lats, 4326, epsg)
        lon2, lat2 = P.transform_xy(x, y, epsg, 4326)
        assert np.abs(lon2 - lons).max() < 1e-9, epsg
        assert np.abs(lat2 - lats).max() < 1e-9, epsg

    # the rule-resolved codes agree with a directly-parameterized forward
    lons = rng.uniform(6.5, 11.5, 50)
    lats = rng.uniform(47.0, 55.0, 50)
    xr, yr = P.transform_xy(lons, lats, 4326, 25832)
    xd, yd = P.tm_forward(lons, lats, 9.0, fe=500_000.0, fn=0.0,
                          a=P.GRS80_A, f=P.GRS80_F)
    assert np.array_equal(xr, xd) and np.array_equal(yr, yd)


def test_parse_crs_projjson_and_wkt2():
    """parse_crs covers the reference's CRS variants (crs.rs:36-140):
    SRID ints, authority strings, PROJJSON dicts/strings, WKT2 with a
    trailing ID node."""
    import json

    import pytest as _pytest

    from geoarrow_rs_spark.wkb import proj as P

    assert P.parse_crs(4326) == 4326
    assert P.parse_crs("EPSG:3857") == 3857
    assert P.parse_crs("27700") == 27700
    pj = {"type": "GeographicCRS", "name": "WGS 84",
          "id": {"authority": "EPSG", "code": 4326}}
    assert P.parse_crs(pj) == 4326
    assert P.parse_crs(json.dumps(pj)) == 4326
    wkt2 = ('PROJCRS["OSGB36 / British National Grid",'
            'BASEGEOGCRS["OSGB36",DATUM["OSGB 1936"],ID["EPSG",4277]],'
            'CONVERSION["BNG"],ID["EPSG",27700]]')
    assert P.parse_crs(wkt2) == 27700
    wkt1 = 'GEOGCS["WGS 84",AUTHORITY["EPSG","4326"]]'
    assert P.parse_crs(wkt1) == 4326
    with _pytest.raises(ValueError):
        P.parse_crs({"type": "GeographicCRS", "name": "custom"})
    with _pytest.raises(ValueError):
        P.parse_crs('PROJCRS["mystery",CONVERSION["x"]]')


def test_cylindrical_world_projections():
    """World Mercator (3395), EASE-Grid 2.0 / v1 cylindrical equal-area
    (6933/3410), World Equidistant Cylindrical (4087), and Mollweide
    (ESRI:54009): round trips at 1e-9 degrees, each projection's defining
    property, and published anchor constants."""
    import numpy as np

    from geoarrow_rs_spark.wkb import proj as P

    rng = np.random.default_rng(17)
    lon = rng.uniform(-179.9, 179.9, 5000)
    lat = rng.uniform(-84.9, 84.9, 5000)
    for code in (3395, 6933, 3410, 4087, 54009):
        assert P.supported_crs(code)
        x, y = P.cyl_forward(lon, lat, code)
        lo2, la2 = P.cyl_inverse(x, y, code)
        assert np.abs(lo2 - lon).max() < 1e-9, code
        assert np.abs(la2 - lat).max() < 1e-9, code

    a = P.WGS84_A
    e = float(np.sqrt(P.WGS84_F * (2 - P.WGS84_F)))

    # 3395: the atanh isometric-latitude form equals the independent
    # Snyder tan(pi/4 + phi/2) closed form
    phi = np.radians(lat)
    s = np.sin(phi)
    y_snyder = a * np.log(
        np.tan(np.pi / 4 + phi / 2) * ((1 - e * s) / (1 + e * s)) ** (e / 2)
    )
    x1, y1 = P.cyl_forward(lon, lat, 3395)
    assert np.abs(y1 - y_snyder).max() < 1e-6
    # conformality: local E-W and N-S scales agree (isotropic)
    d = 1e-6
    for lon0, lat0 in ((10.0, 40.0), (-60.0, -25.0), (120.0, 70.0)):
        x0, y0 = P.cyl_forward(np.array([lon0]), np.array([lat0]), 3395)
        xe, _ = P.cyl_forward(np.array([lon0 + d]), np.array([lat0]), 3395)
        _, yn = P.cyl_forward(np.array([lon0]), np.array([lat0 + d]), 3395)
        s0 = np.sin(np.radians(lat0))
        w = np.sqrt(1 - e * e * s0 * s0)
        k_ew = float(xe[0] - x0[0]) / (
            np.radians(d) * a * np.cos(np.radians(lat0)) / w
        )
        k_ns = float(yn[0] - y0[0]) / (
            np.radians(d) * a * (1 - e * e) / w**3
        )
        assert abs(k_ew / k_ns - 1.0) < 1e-6

    # 6933: published EASE-Grid 2.0 projected extents (EPSG registry
    # bounds): x(180, 0) and y(0, 90)
    xe, _ = P.cyl_forward(np.array([180.0]), np.array([0.0]), 6933)
    _, yn = P.cyl_forward(np.array([0.0]), np.array([90.0]), 6933)
    assert abs(xe[0] - 17367530.445161) < 1e-3
    assert abs(yn[0] - 7342230.1365) < 1e-2
    # equal-area: projected Jacobian == ellipsoidal area element M*N*cos
    for code in (6933, 3410):
        p = P.CYL[code]
        a_c, e2_c = p["a"], p["e2"]
        for lat0 in (0.0, 25.0, 55.0, -80.0):
            x0, y0 = P.cyl_forward(np.array([10.0]), np.array([lat0]), code)
            xq, _ = P.cyl_forward(np.array([10.0 + d]), np.array([lat0]), code)
            _, yq = P.cyl_forward(np.array([10.0]), np.array([lat0 + d]), code)
            J = float(xq[0] - x0[0]) * float(yq[0] - y0[0]) / np.radians(d) ** 2
            s0 = np.sin(np.radians(lat0))
            exact = (
                a_c * a_c * (1 - e2_c) * np.cos(np.radians(lat0))
                / (1 - e2_c * s0 * s0) ** 2
            )
            assert abs(J / exact - 1.0) < 1e-5, (code, lat0)

    # 4087: y is the true meridian arc — quarter meridian anchor
    # (WGS84 pole distance 10001965.7293 m) and x = a*lam on the equator
    _, yp = P.cyl_forward(np.array([0.0]), np.array([90.0]), 4087)
    assert abs(yp[0] - 10001965.7293) < 1e-3
    xq, _ = P.cyl_forward(np.array([90.0]), np.array([0.0]), 4087)
    assert abs(xq[0] - a * np.pi / 2) < 1e-9

    # Mollweide: exact ellipse extents 2*sqrt(2)*R and sqrt(2)*R, and
    # equal-area on the R = a sphere
    xm, _ = P.cyl_forward(np.array([180.0]), np.array([0.0]), 54009)
    _, ym = P.cyl_forward(np.array([0.0]), np.array([90.0]), 54009)
    assert abs(xm[0] - 2 * np.sqrt(2) * a) < 1e-6
    assert abs(ym[0] - np.sqrt(2) * a) < 1e-6
    for lat0 in (0.0, 35.0, -62.0):
        x0, y0 = P.cyl_forward(np.array([15.0]), np.array([lat0]), 54009)
        xq, yqx = P.cyl_forward(np.array([15.0 + d]), np.array([lat0]), 54009)
        xn, yq = P.cyl_forward(np.array([15.0]), np.array([lat0 + d]), 54009)
        J = abs(
            float(xq[0] - x0[0]) * float(yq[0] - y0[0])
            - float(xn[0] - x0[0]) * float(yqx[0] - y0[0])
        ) / np.radians(d) ** 2
        exact = a * a * np.cos(np.radians(lat0))
        assert abs(J / exact - 1.0) < 1e-5, lat0

    # geodetic aliases pivot as WGS84; ESRI namespace parses
    for alias in (4258, 4269, 4283, 7844):
        ax, ay = P.transform_xy(np.array([2.0]), np.array([48.0]), alias, 3395)
        bx, by = P.transform_xy(np.array([2.0]), np.array([48.0]), 4326, 3395)
        assert ax[0] == bx[0] and ay[0] == by[0]
    assert P.parse_crs("ESRI:54009") == 54009


def test_parse_crs_ogc_variants():
    """OGC:CRS84 (the GeoParquet default CRS) and OGC URNs resolve: CRS84
    is WGS84 lon-lat — this engine's axis convention — so it maps to 4326;
    EPSG URNs with or without a version field parse."""
    from geoarrow_rs_spark.wkb import proj as P

    assert P.parse_crs("OGC:CRS84") == 4326
    assert P.parse_crs("CRS84") == 4326
    assert P.parse_crs("urn:ogc:def:crs:OGC:1.3:CRS84") == 4326
    assert P.parse_crs("urn:ogc:def:crs:EPSG::4326") == 4326
    assert P.parse_crs("urn:ogc:def:crs:EPSG:9.9.1:27700") == 27700
    assert P.parse_crs({"id": {"authority": "OGC", "code": "CRS84"}}) == 4326


def test_cylindrical_pole_edges():
    """Pole edge cases (review findings): ellipsoidal Mercator stays
    FINITE at |lat| = 90 (large clip value, not inf); the equal-area
    inverses return latitudes within [-90, 90] and hit the pole exactly
    from the pole's own forward image."""
    import numpy as np

    from geoarrow_rs_spark.wkb import proj as P

    x, y = P.cyl_forward(np.array([10.0, -20.0]), np.array([90.0, -90.0]), 3395)
    assert np.all(np.isfinite(y)) and y[0] > 1e7 and y[1] < -1e7

    for code in (6933, 3410):
        x, y = P.cyl_forward(np.array([10.0, 10.0]), np.array([90.0, -90.0]), code)
        lo, la = P.cyl_inverse(x, y, code)
        assert abs(la[0] - 90.0) < 1e-9 and abs(la[1] + 90.0) < 1e-9
        # near-pole sweep never leaves the valid latitude range
        lats = np.array([89.999999, 89.9999995, 89.99999999, 90.0])
        _, yy = P.cyl_forward(np.full(4, 0.0), lats, code)
        _, la2 = P.cyl_inverse(np.zeros(4), yy, code)
        assert np.all(la2 <= 90.0) and np.all(la2 >= -90.0)

    # LAEA gets the same guard
    xs, ys = P.laea_forward(np.array([10.0]), np.array([90.0]), 3035)
    _, la3 = P.laea_inverse(xs, ys, 3035)
    assert abs(la3[0] - 90.0) < 1e-9


def test_envelope_areas_xy_fast_path_bit_identical():
    """The batched array path of k_envelope_areas_xy must be BIT-identical
    to the unfused kernel chain (ST_MakeEnvelope -> ST_AreaSpheroid /
    ST_AreaSpherical) over the query domain plus adversarial boxes:
    inverted extents, zero-size, negative-zero corners, antimeridian-
    crossing widths, and nulls."""
    import numpy as np
    import pandas as pd

    from geoarrow_rs_spark.functions import kernels as K

    rng = np.random.default_rng(8)
    # geo_geodesic_area's modular domain
    pk = rng.integers(0, 10_000, 400)
    ps = rng.integers(1, 51, 400)
    x0 = (pk % 30).astype(float) * 2.0 - 30.0
    y0 = (ps % 60).astype(float) - 30.0
    x1 = x0 + 1.0 + (pk % 3).astype(float)
    y1 = y0 + 1.0 + (ps % 5).astype(float)
    # adversarial rows
    extra = np.array(
        [
            [0.0, 0.0, 0.0, 0.0],
            [-0.0, -0.0, 0.0, 0.0],
            [5.0, 5.0, 1.0, 1.0],        # inverted (xmax < xmin)
            [-179.5, -80.0, 179.5, 80.0],  # near-global, wide dlam
            [170.0, 10.0, 190.0, 20.0],  # crosses the antimeridian wrap
            [-30.0, -90.0, 30.0, 90.0],  # pole-to-pole
            [1e-9, 1e-9, 2e-9, 2e-9],    # degenerate tiny
        ]
    )
    X0 = pd.Series(np.concatenate([x0, extra[:, 0], [np.nan]]))
    Y0 = pd.Series(np.concatenate([y0, extra[:, 1], [1.0]]))
    X1 = pd.Series(np.concatenate([x1, extra[:, 2], [2.0]]))
    Y1 = pd.Series(np.concatenate([y1, extra[:, 3], [3.0]]))

    fast = K.k_envelope_areas_xy(X0, Y0, X1, Y1)
    env = K.k_make_envelope(X0, Y0, X1, Y1)
    ref_spheroid = K.k_area_spheroid(env).to_numpy()
    ref_spherical = K.k_area_spherical(env).to_numpy()

    fs = fast["spheroid"].to_numpy()
    fp = fast["spherical"].to_numpy()
    assert np.array_equal(fs, ref_spheroid, equal_nan=True)
    assert np.array_equal(fp, ref_spherical, equal_nan=True)
    # the null row really is null in both
    assert np.isnan(fs[-1]) and np.isnan(ref_spheroid[-1])


def test_subdivide_box_stats_xy_matches_unfused_chain():
    """The fused subdivide-pieces composite must reproduce the unfused
    kernel chain exactly: same piece order, same area/xmin doubles, nulls
    and degenerate boxes included."""
    import numpy as np
    import pandas as pd

    from geoarrow_rs_spark.functions import kernels as K

    t = np.arange(250).astype(float) % 100.0
    X0 = pd.Series(np.concatenate([t, [np.nan, 0.0]]))
    Y0 = pd.Series([0.0] * 250 + [0.0, 0.0])
    X1 = pd.Series(np.concatenate([t + 8.0, [1.0, 0.0]]))  # last: zero-size
    Y1 = pd.Series([2.0] * 250 + [1.0, 0.0])
    dens = pd.Series([1.0] * 252)
    mv = pd.Series([12] * 252)

    fused = K.k_subdivide_box_stats_xy(X0, Y0, X1, Y1, dens, mv)
    pieces = K.k_dump(
        K.k_subdivide(K.k_densify(K.k_make_envelope(X0, Y0, X1, Y1), dens), mv)
    )
    for i in range(252):
        lst = pieces[i]
        if lst is None:
            assert fused[i] is None
            continue
        ref_area = K.k_area(pd.Series(lst, dtype=object)).to_numpy()
        ref_xmin = K.k_xmin(pd.Series(lst, dtype=object)).to_numpy()
        got = fused[i]
        assert len(got) == len(lst)
        for j, d in enumerate(got):
            assert d["area"] == ref_area[j] or (
                np.isnan(d["area"]) and np.isnan(ref_area[j])
            )
            assert d["xmin"] == ref_xmin[j] or (
                np.isnan(d["xmin"]) and np.isnan(ref_xmin[j])
            )
