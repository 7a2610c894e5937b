"""CRS reprojection: vectorized numpy transforms between supported EPSG codes.

Spark-side analogue of the reference's geodesy reprojection
(/root/reference/rust/geoarrow-old/src/algorithm/geodesy/reproject.rs:105 —
Rust `geodesy` crate applied over coord buffers). The environment has no
pyproj, so the transforms are implemented from public closed forms:

- EPSG:4326  — WGS84 lon/lat degrees (the pivot CRS)
- EPSG:3857  — Web Mercator (spherical, R = WGS84 semi-major)
- EPSG:32601-32660 / 32701-32760 — WGS84 UTM north/south zones, via the
  exact-to-nanometers Krueger series (Karney 2011, "Transverse Mercator with an
  accuracy of a few nanometers", public domain formulas, 6th order in the
  third flattening n)
- EPSG:27700 — OSGB36 British National Grid (Airy 1830 + Helmert datum
  shift through ECEF); EPSG:2157 Irish TM, EPSG:2193 NZTM, and the GRS80
  UTM zone families ETRS89 (25828-25838), NAD83 (26901-26923), GDA94 MGA
  (28348-28358), GDA2020 MGA (7846-7859)
- EPSG:5070 / 2154 — Albers equal-area + Lambert conformal conic (Snyder)
- EPSG:3035 — Lambert azimuthal equal-area Europe (Snyder pp. 187-190)
- EPSG:3413 / 3031 — polar stereographic variant B (Snyder pp. 160-162)
- EPSG:3395 — World Mercator (ellipsoidal, variant A); EPSG:6933 / 3410 —
  EASE-Grid 2.0 / v1 cylindrical equal-area; EPSG:4087 — World Equidistant
  Cylindrical (ellipsoidal meridian arc); ESRI:54009 — World Mollweide
- EPSG:4258 / 4269 / 4283 / 7844 — ETRS89 / NAD83 / GDA94 / GDA2020
  geographic, treated as WGS84-coincident (sub-meter datum differences)

All functions are elementwise over numpy arrays — a batch of coordinates is
transformed with no Python-level loop, matching the reference's
CoordBuffer-at-a-time design.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6_378_137.0
WGS84_F = 1 / 298.257223563

_E2 = WGS84_F * (2 - WGS84_F)
_E = np.sqrt(_E2)

# third flattening and Karney's series coefficients (order 6)
_N = WGS84_F / (2 - WGS84_F)
_n = _N
# rectifying radius A = a/(1+n) (1 + n^2/4 + n^4/64 + n^6/256)
_A_RECT = WGS84_A / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64 + _n**6 / 256)

_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
    - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630
    - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
    + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
])

_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
    - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
    - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
    + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
])

# conformal -> geographic latitude series
_DELTA = np.array([
    2 * _n - 2 * _n**2 / 3 - 2 * _n**3 + 116 * _n**4 / 45 + 26 * _n**5 / 45
    - 2854 * _n**6 / 675,
    7 * _n**2 / 3 - 8 * _n**3 / 5 - 227 * _n**4 / 45 + 2704 * _n**5 / 315
    + 2323 * _n**6 / 945,
    56 * _n**3 / 15 - 136 * _n**4 / 35 - 1262 * _n**5 / 105
    + 73814 * _n**6 / 2835,
    4279 * _n**4 / 630 - 332 * _n**5 / 35 - 399572 * _n**6 / 14175,
    4174 * _n**5 / 315 - 144838 * _n**6 / 6237,
    601676 * _n**6 / 22275,
])

_UTM_K0 = 0.9996
_UTM_FE = 500_000.0
_UTM_FN_SOUTH = 10_000_000.0


# ---------------------------------------------------------------------------
# Parameterized ellipsoid support: the same Karney order-n^6 series with
# coefficients computed per ellipsoid (WGS84 precomputed above stays the
# fast default; national grids use Airy 1830 / GRS80)
# ---------------------------------------------------------------------------

def _tm_series_coeffs(n):
    """(alpha, beta, delta) Krueger series coefficient arrays for third
    flattening n (Karney 2011, same order-6 formulas as the WGS84 constants
    above)."""
    alpha = np.array([
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630
        - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    ])
    beta = np.array([
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    ])
    delta = np.array([
        2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45 + 26 * n**5 / 45
        - 2854 * n**6 / 675,
        7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45 + 2704 * n**5 / 315
        + 2323 * n**6 / 945,
        56 * n**3 / 15 - 136 * n**4 / 35 - 1262 * n**5 / 105
        + 73814 * n**6 / 2835,
        4279 * n**4 / 630 - 332 * n**5 / 35 - 399572 * n**6 / 14175,
        4174 * n**5 / 315 - 144838 * n**6 / 6237,
        601676 * n**6 / 22275,
    ])
    return alpha, beta, delta


_ELL_CACHE: dict = {}


def ellipsoid_consts(a, f):
    """Cached per-ellipsoid constants: e, e2, rectifying radius, series."""
    key = (float(a), float(f))
    got = _ELL_CACHE.get(key)
    if got is None:
        e2 = f * (2 - f)
        n = f / (2 - f)
        a_rect = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
        alpha, beta, delta = _tm_series_coeffs(n)
        got = dict(a=float(a), f=float(f), e=float(np.sqrt(e2)), e2=float(e2),
                   a_rect=float(a_rect), alpha=alpha, beta=beta, delta=delta)
        _ELL_CACHE[key] = got
    return got


# ---------------------------------------------------------------------------
# Web Mercator (EPSG:3857)
# ---------------------------------------------------------------------------

def webmercator_forward(lon_deg, lat_deg):
    """lon/lat degrees -> EPSG:3857 meters (spherical formulas, R = a)."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.clip(np.asarray(lat_deg, dtype=np.float64), -89.9999999, 89.9999999))
    x = WGS84_A * lon
    y = WGS84_A * np.log(np.tan(np.pi / 4 + lat / 2))
    return x, y


def webmercator_inverse(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WGS84_A)
    lat = np.degrees(2 * np.arctan(np.exp(y / WGS84_A)) - np.pi / 2)
    return lon, lat


# ---------------------------------------------------------------------------
# Transverse Mercator (Karney 2011 Krueger series, order n^6)
# ---------------------------------------------------------------------------

def _tm_xi0(lat0_deg, ell):
    """Rectified latitude xi of the projection origin (lam = 0): the
    meridian-arc offset M0 / A_rect for grids with a non-equatorial
    latitude of origin (e.g. British National Grid's 49N)."""
    if not lat0_deg:
        return 0.0
    phi0 = float(np.radians(lat0_deg))
    s0 = np.sin(phi0)
    e = ell["e"]
    tau0 = np.sinh(np.arctanh(s0) - e * np.arctanh(e * s0))
    xi_p0 = float(np.arctan(tau0))
    xi0 = xi_p0
    for j in range(6):
        w = 2.0 * (j + 1)
        xi0 += float(ell["alpha"][j]) * np.sin(w * xi_p0)
    return float(xi0)


def tm_forward(lon_deg, lat_deg, lon0_deg, k0=_UTM_K0, fe=_UTM_FE, fn=0.0,
               a=WGS84_A, f=WGS84_F, lat0_deg=0.0):
    """Geographic -> transverse Mercator easting/northing (meters) on an
    arbitrary ellipsoid (defaults: WGS84, equatorial origin — the UTM
    case, identical to the original fixed-WGS84 implementation)."""
    ell = ellipsoid_consts(a, f)
    e, a_rect, alpha = ell["e"], ell["a_rect"], ell["alpha"]
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    sphi = np.sin(lat)
    # conformal latitude tau' = sinh(asinh-like combination)
    t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xi = xi + alpha[j] * np.sin(w * xi_p) * np.cosh(w * eta_p)
        eta = eta + alpha[j] * np.cos(w * xi_p) * np.sinh(w * eta_p)
    E = fe + k0 * a_rect * eta
    N = fn + k0 * a_rect * (xi - _tm_xi0(lat0_deg, ell))
    return E, N


def tm_inverse(E, N, lon0_deg, k0=_UTM_K0, fe=_UTM_FE, fn=0.0,
               a=WGS84_A, f=WGS84_F, lat0_deg=0.0):
    """Transverse Mercator easting/northing -> geographic degrees."""
    ell = ellipsoid_consts(a, f)
    a_rect, beta, delta = ell["a_rect"], ell["beta"], ell["delta"]
    xi = (np.asarray(N, dtype=np.float64) - fn) / (k0 * a_rect) \
        + _tm_xi0(lat0_deg, ell)
    eta = (np.asarray(E, dtype=np.float64) - fe) / (k0 * a_rect)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xi_p = xi_p - beta[j] * np.sin(w * xi) * np.cosh(w * eta)
        eta_p = eta_p - beta[j] * np.cos(w * xi) * np.sinh(w * eta)
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    chi = np.arctan(tau_p)
    phi = chi.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        phi = phi + delta[j] * np.sin(w * chi)
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


def utm_zone_params(epsg):
    """(lon0_deg, false_northing) for a WGS84 UTM EPSG code."""
    epsg = int(epsg)
    if 32601 <= epsg <= 32660:
        zone, fn = epsg - 32600, 0.0
    elif 32701 <= epsg <= 32760:
        zone, fn = epsg - 32700, _UTM_FN_SOUTH
    else:
        raise ValueError(f"not a UTM EPSG code: {epsg}")
    return zone * 6.0 - 183.0, fn


def utm_epsg_for(lon_deg, lat_deg):
    """EPSG code of the natural UTM zone for a lon/lat (no Norway exceptions)."""
    zone = int(np.floor((float(lon_deg) + 180.0) / 6.0)) % 60 + 1
    return (32600 if float(lat_deg) >= 0 else 32700) + zone


# ---------------------------------------------------------------------------
# Geodetic datum shifts: geographic <-> geocentric (ECEF) + 7-parameter
# Helmert position-vector transformation (EPSG method 9606). Used for
# national grids whose datum is not WGS84-equivalent (OSGB36). The Helmert
# inverse uses the exact 3x3 matrix inverse (not the negated-parameters
# approximation) so our own round trips close to float precision.
# ---------------------------------------------------------------------------

def geodetic_to_ecef(lon_deg, lat_deg, a, f):
    """lon/lat degrees (h = 0) -> geocentric XYZ meters on (a, f)."""
    e2 = f * (2 - f)
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s, c = np.sin(lat), np.cos(lat)
    nu = a / np.sqrt(1 - e2 * s * s)
    return nu * c * np.cos(lon), nu * c * np.sin(lon), nu * (1 - e2) * s


def ecef_to_geodetic(X, Y, Z, a, f, iters=20):
    """Geocentric XYZ -> lon/lat degrees on (a, f) (height discarded —
    the 2D map-projection convention). Fixed-point iteration on phi
    converges well below 1e-12 rad for earth-surface points."""
    e2 = f * (2 - f)
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    Z = np.asarray(Z, dtype=np.float64)
    lon = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1 - e2))
    for _ in range(iters):
        s = np.sin(phi)
        nu = a / np.sqrt(1 - e2 * s * s)
        h = p / np.cos(phi) - nu
        phi = np.arctan2(Z, p * (1 - e2 * nu / (nu + h)))
    return np.degrees(lon), np.degrees(phi)


def _helmert_matrices(p):
    """(M, t, Minv) for position-vector params
    (tx, ty, tz meters, rx, ry, rz arcseconds, s ppm)."""
    tx, ty, tz, rx, ry, rz, s_ppm = p
    asr = np.pi / (180.0 * 3600.0)
    rx, ry, rz = rx * asr, ry * asr, rz * asr
    scale = 1.0 + s_ppm * 1e-6
    M = scale * np.array([
        [1.0, -rz, ry],
        [rz, 1.0, -rx],
        [-ry, rx, 1.0],
    ])
    return M, np.array([tx, ty, tz]), np.linalg.inv(M)


_HELMERT_CACHE: dict = {}


def _helmert_for(params):
    got = _HELMERT_CACHE.get(params)
    if got is None:
        got = _helmert_matrices(params)
        _HELMERT_CACHE[params] = got
    return got


def datum_to_wgs84(lon_deg, lat_deg, a, f, helmert_params):
    """Geographic on a local datum -> WGS84 geographic, via ECEF + the
    datum's (datum -> WGS84) Helmert parameters."""
    X, Y, Z = geodetic_to_ecef(lon_deg, lat_deg, a, f)
    M, t, _ = _helmert_for(helmert_params)
    V = M @ np.vstack([np.atleast_1d(X), np.atleast_1d(Y), np.atleast_1d(Z)])
    return ecef_to_geodetic(V[0] + t[0], V[1] + t[1], V[2] + t[2],
                            WGS84_A, WGS84_F)


def wgs84_to_datum(lon_deg, lat_deg, a, f, helmert_params):
    X, Y, Z = geodetic_to_ecef(lon_deg, lat_deg, WGS84_A, WGS84_F)
    M, t, Minv = _helmert_for(helmert_params)
    V = np.vstack([np.atleast_1d(X) - t[0], np.atleast_1d(Y) - t[1],
                   np.atleast_1d(Z) - t[2]])
    W = Minv @ V
    return ecef_to_geodetic(W[0], W[1], W[2], a, f)


# ---------------------------------------------------------------------------
# National transverse-Mercator grids (reproject.rs:105 parity for the
# high-traffic EPSG codes a reference user would hit first)
# ---------------------------------------------------------------------------

AIRY_A = 6_377_563.396
AIRY_F = 1 / 299.3249646

# NAD83 / RGF93 / ETRS89 / GDA94 datum ellipsoid (GRS80); differs from
# WGS84 only in 1/f's 9th decimal — parameterized per CRS anyway
GRS80_A = 6_378_137.0
GRS80_F = 1 / 298.257222101

# OSGB36 -> WGS84 Helmert (EPSG transformation 1314; ~2 m accuracy vs the
# authoritative OSTN15 grid shift, which needs the 15 MB NTv2 grid file)
OSGB36_TO_WGS84 = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)

TMERC = {
    # OSGB36 / British National Grid
    27700: dict(a=AIRY_A, f=AIRY_F, lat0=49.0, lon0=-2.0, k0=0.9996012717,
                fe=400_000.0, fn=-100_000.0, helmert=OSGB36_TO_WGS84),
    # IRENET95 / Irish Transverse Mercator (ETRS89-based, datum-free)
    2157: dict(a=GRS80_A, f=GRS80_F, lat0=53.5, lon0=-8.0, k0=0.99982,
               fe=600_000.0, fn=750_000.0),
    # NZGD2000 / New Zealand Transverse Mercator
    2193: dict(a=GRS80_A, f=GRS80_F, lat0=0.0, lon0=173.0, k0=0.9996,
               fe=1_600_000.0, fn=10_000_000.0),
}

# Whole GRS80 UTM-style zone families, by EPSG range (all treated as
# WGS84-equivalent datums — ETRS89 / NAD83 / GDA94 / GDA2020 agree with
# WGS84 far below any Helmert shift's formal accuracy):
# (lo, hi, zone_base, false_northing)
_TM_GRS80_ZONES = (
    (25828, 25838, 25800, 0.0),           # ETRS89 / UTM 28N-38N
    (26901, 26923, 26900, 0.0),           # NAD83 / UTM 1N-23N
    (28348, 28358, 28300, 10_000_000.0),  # GDA94 / MGA 48-58
    (7846, 7859, 7800, 10_000_000.0),     # GDA2020 / MGA 46-59
)


def _grs80_utm_params(epsg):
    """(lon0_deg, false_northing) for GRS80 zone-family EPSG codes, or
    None if the code is not in any registered family."""
    for lo, hi, base, fn in _TM_GRS80_ZONES:
        if lo <= epsg <= hi:
            return (epsg - base) * 6.0 - 183.0, fn
    return None


# ---------------------------------------------------------------------------
# Conic projections: Albers equal-area + Lambert conformal conic (2SP)
# (Snyder 1987, "Map Projections: A Working Manual", USGS PP 1395 —
# ellipsoidal formulas pp. 100-102 (AEA) and pp. 107-109 (LCC))
# ---------------------------------------------------------------------------

def _conic_setup(p):
    a = p["a"]
    e2 = p["f"] * (2 - p["f"])
    e = float(np.sqrt(e2))
    lat0, lat1, lat2 = map(np.radians, (p["lat0"], p["lat1"], p["lat2"]))

    def m(phi):
        s = np.sin(phi)
        return np.cos(phi) / np.sqrt(1 - e2 * s * s)

    one_sp = abs(lat1 - lat2) < 1e-12
    if p["kind"] == "aea":
        def q(phi):
            s = np.sin(phi)
            return (1 - e2) * (
                s / (1 - e2 * s * s) - np.log((1 - e * s) / (1 + e * s)) / (2 * e)
            )

        m1, m2 = m(lat1), m(lat2)
        q0, q1, q2 = q(lat0), q(lat1), q(lat2)
        # one-standard-parallel limit: n = lim (m1^2 - m2^2)/(q2 - q1)
        # = -2 m m' / q' evaluated at the parallel = sin(phi1)
        # (Snyder 14-8 one-SP form)
        n = np.sin(lat1) if one_sp else (m1 * m1 - m2 * m2) / (q2 - q1)
        C = m1 * m1 + n * q1
        rho0 = a * np.sqrt(C - n * q0) / n
        p.update(e=e, e2=e2, n=float(n), C=float(C), rho0=float(rho0))
    else:  # lcc
        def t(phi):
            s = np.sin(phi)
            return np.tan(np.pi / 4 - phi / 2) / (
                (1 - e * s) / (1 + e * s)
            ) ** (e / 2)

        m1, m2 = m(lat1), m(lat2)
        t0, t1, t2 = t(lat0), t(lat1), t(lat2)
        # one-standard-parallel limit: n = d(ln m)/d(ln t) at the
        # parallel = sin(phi1) (Snyder 15-4's 1SP case). The LCC-1SP
        # scale factor k0 enters as rho = k0 * a * F * t^n; since a only
        # ever multiplies F's rho products, it is folded as a *= k0 by
        # the custom-CRS constructor before calling this setup.
        n = np.sin(lat1) if one_sp else np.log(m1 / m2) / np.log(t1 / t2)
        Fc = m1 / (n * t1 ** n)
        rho0 = a * Fc * t0 ** n
        p.update(e=e, e2=e2, n=float(n), F=float(Fc), rho0=float(rho0))
    return p


CONICS = {
    # NAD83 / Conus Albers (equal-area; the reference's geodesy crate serves
    # the same family via proj strings)
    5070: _conic_setup(dict(
        kind="aea", a=GRS80_A, f=GRS80_F,
        lat0=23.0, lon0=-96.0, lat1=29.5, lat2=45.5, fe=0.0, fn=0.0,
    )),
    # RGF93 / Lambert-93 (France LCC 2SP)
    2154: _conic_setup(dict(
        kind="lcc", a=GRS80_A, f=GRS80_F,
        lat0=46.5, lon0=3.0, lat1=44.0, lat2=49.0, fe=700_000.0, fn=6_600_000.0,
    )),
}


def conic_forward(lon_deg, lat_deg, epsg):
    p = epsg if isinstance(epsg, dict) else CONICS[int(epsg)]
    a, e, e2, n = p["a"], p["e"], p["e2"], p["n"]
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - p["lon0"])
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s = np.sin(phi)
    if p["kind"] == "aea":
        q = (1 - e2) * (
            s / (1 - e2 * s * s) - np.log((1 - e * s) / (1 + e * s)) / (2 * e)
        )
        rho = a * np.sqrt(p["C"] - n * q) / n
    else:
        t = np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)
        rho = a * p["F"] * t ** n
    theta = n * lam
    x = p["fe"] + rho * np.sin(theta)
    y = p["fn"] + p["rho0"] - rho * np.cos(theta)
    return x, y


def conic_inverse(x, y, epsg, iters=12):
    p = epsg if isinstance(epsg, dict) else CONICS[int(epsg)]
    a, e, e2, n = p["a"], p["e"], p["e2"], p["n"]
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = p["rho0"] - (np.asarray(y, dtype=np.float64) - p["fn"])
    rho = np.hypot(xp, yp)
    theta = np.arctan2(xp, yp)  # n > 0 for both registered CRSs
    lam = theta / n
    if p["kind"] == "aea":
        q = (p["C"] - (rho * n / a) ** 2) / n
        phi = np.arcsin(np.clip(q / 2, -1, 1))
        for _ in range(iters):
            s = np.sin(phi)
            one = 1 - e2 * s * s
            phi = phi + one * one / (2 * np.cos(phi)) * (
                q / (1 - e2) - s / one + np.log((1 - e * s) / (1 + e * s)) / (2 * e)
            )
    else:
        t = (rho / (a * p["F"])) ** (1 / n)
        phi = np.pi / 2 - 2 * np.arctan(t)
        for _ in range(iters):
            s = e * np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(t * ((1 - s) / (1 + s)) ** (e / 2))
    return np.degrees(lam) + p["lon0"], np.degrees(phi)


# ---------------------------------------------------------------------------
# Lambert azimuthal equal-area (oblique aspect, ellipsoidal)
# (Snyder 1987, USGS PP 1395, pp. 187-190) — EPSG:3035 LAEA Europe
# ---------------------------------------------------------------------------

def _laea_q(phi, e, e2):
    s = np.sin(phi)
    return (1 - e2) * (
        s / (1 - e2 * s * s) - np.log((1 - e * s) / (1 + e * s)) / (2 * e)
    )


def _laea_setup(p):
    a = p["a"]
    e2 = p["f"] * (2 - p["f"])
    e = float(np.sqrt(e2))
    lat0 = np.radians(p["lat0"])
    qp = float(_laea_q(np.pi / 2, e, e2))
    q0 = float(_laea_q(lat0, e, e2))
    beta0 = float(np.arcsin(q0 / qp))
    Rq = a * np.sqrt(qp / 2)
    m0 = np.cos(lat0) / np.sqrt(1 - e2 * np.sin(lat0) ** 2)
    D = a * m0 / (Rq * np.cos(beta0))
    p.update(e=e, e2=e2, qp=qp, beta0=beta0, Rq=float(Rq), D=float(D))
    return p


LAEA = {
    # ETRS89-extended / LAEA Europe (the pan-EU statistical grid CRS)
    3035: _laea_setup(dict(
        a=GRS80_A, f=GRS80_F, lat0=52.0, lon0=10.0,
        fe=4_321_000.0, fn=3_210_000.0,
    )),
}


def laea_forward(lon_deg, lat_deg, epsg):
    p = epsg if isinstance(epsg, dict) else LAEA[int(epsg)]
    e, e2, qp, b0, Rq, D = p["e"], p["e2"], p["qp"], p["beta0"], p["Rq"], p["D"]
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - p["lon0"])
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    beta = np.arcsin(np.clip(_laea_q(phi, e, e2) / qp, -1.0, 1.0))
    sb, cb = np.sin(beta), np.cos(beta)
    sb0, cb0 = np.sin(b0), np.cos(b0)
    B = Rq * np.sqrt(2.0 / (1.0 + sb0 * sb + cb0 * cb * np.cos(lam)))
    x = p["fe"] + B * D * cb * np.sin(lam)
    y = p["fn"] + (B / D) * (cb0 * sb - sb0 * cb * np.cos(lam))
    return x, y


def laea_inverse(x, y, epsg, iters=12):
    p = epsg if isinstance(epsg, dict) else LAEA[int(epsg)]
    e, e2, qp, b0, Rq, D = p["e"], p["e2"], p["qp"], p["beta0"], p["Rq"], p["D"]
    sb0, cb0 = np.sin(b0), np.cos(b0)
    xp = (np.asarray(x, dtype=np.float64) - p["fe"])
    yp = (np.asarray(y, dtype=np.float64) - p["fn"])
    rho = np.hypot(xp / D, D * yp)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * Rq), -1.0, 1.0))
    sc, cc = np.sin(ce), np.cos(ce)
    # rho -> 0 means the projection center itself; guard the division
    safe = np.where(rho == 0.0, 1.0, rho)
    q = qp * (cc * sb0 + D * yp * sc * cb0 / safe)
    q = np.where(rho == 0.0, qp * sb0, q)
    lam = np.arctan2(xp * sc, D * rho * cb0 * cc - D * D * yp * sb0 * sc)
    lam = np.where(rho == 0.0, 0.0, lam)
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    # same pole guard as the cylindrical equal-area inverse: the
    # 1/(2 cos phi) factor diverges at |phi| = pi/2
    at_pole = np.abs(q) >= qp * (1.0 - 1e-14)
    for _ in range(iters):
        s = np.sin(phi)
        one = 1 - e2 * s * s
        phi = phi + one * one / (2 * np.cos(phi)) * (
            q / (1 - e2) - s / one + np.log((1 - e * s) / (1 + e * s)) / (2 * e)
        )
    phi = np.where(at_pole, np.copysign(np.pi / 2, q), phi)
    phi = np.clip(phi, -np.pi / 2, np.pi / 2)
    return np.degrees(lam) + p["lon0"], np.degrees(phi)


# ---------------------------------------------------------------------------
# Polar stereographic, variant B (ellipsoidal; Snyder pp. 160-162)
# EPSG:3413 (NSIDC Arctic) / EPSG:3031 (Antarctic)
# ---------------------------------------------------------------------------

def _polar_t(phi, e):
    s = np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)


def _polar_setup(p):
    a = p["a"]
    e2 = p["f"] * (2 - p["f"])
    e = float(np.sqrt(e2))
    if "k0" in p:
        # variant A (EPSG method 9810): scale factor k0 given at the pole
        # instead of a standard parallel. rho = 2 a k0 t /
        # sqrt((1+e)^(1+e) (1-e)^(1-e)) (Snyder 21-33), expressed through
        # the variant-B machinery as mc/tc = that constant, tc = 1.
        mc = float(
            2.0 * p["k0"] / np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
        )
        p.update(e=e, e2=e2, tc=1.0, mc=mc, south=p["lat_ts"] < 0)
        return p
    ts = np.radians(abs(p["lat_ts"]))
    tc = float(_polar_t(ts, e))
    mc = float(np.cos(ts) / np.sqrt(1 - e2 * np.sin(ts) ** 2))
    p.update(e=e, e2=e2, tc=tc, mc=mc, south=p["lat_ts"] < 0)
    return p


POLAR = {
    # WGS84 / NSIDC Sea Ice Polar Stereographic North
    3413: _polar_setup(dict(a=WGS84_A, f=WGS84_F, lat_ts=70.0, lon0=-45.0,
                            fe=0.0, fn=0.0)),
    # WGS84 / Antarctic Polar Stereographic
    3031: _polar_setup(dict(a=WGS84_A, f=WGS84_F, lat_ts=-71.0, lon0=0.0,
                            fe=0.0, fn=0.0)),
}


def polar_forward(lon_deg, lat_deg, epsg):
    p = epsg if isinstance(epsg, dict) else POLAR[int(epsg)]
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - p["lon0"])
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    if p["south"]:
        phi = -phi
    t = _polar_t(phi, p["e"])
    rho = p["a"] * p["mc"] * t / p["tc"]
    x = p["fe"] + rho * np.sin(lam)
    y = p["fn"] + (rho if p["south"] else -rho) * np.cos(lam)
    return x, y


def polar_inverse(x, y, epsg, iters=12):
    p = epsg if isinstance(epsg, dict) else POLAR[int(epsg)]
    e = p["e"]
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = np.asarray(y, dtype=np.float64) - p["fn"]
    rho = np.hypot(xp, yp)
    t = rho * p["tc"] / (p["a"] * p["mc"])
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(iters):
        s = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - s) / (1 + s)) ** (e / 2))
    lam = np.arctan2(xp, yp if p["south"] else -yp)
    if p["south"]:
        phi = -phi
    return np.degrees(lam) + p["lon0"], np.degrees(phi)


# ---------------------------------------------------------------------------
# Normal-aspect cylindrical + pseudocylindrical world projections
# (Snyder 1987: Mercator pp. 41-44, cylindrical equal-area pp. 76-85,
# equidistant cylindrical p. 90, Mollweide pp. 249-252; EPSG methods
# 9804 / 9835 / 1028). Covers the global-analysis CRSs a reference user
# hits after the national grids: World Mercator, EASE-Grid 2.0,
# plate carree, Mollweide.
# ---------------------------------------------------------------------------

def _rect_lat(phi, ell):
    """Rectifying latitude xi(phi) (vectorized): meridian arc = A_rect*xi.
    Same conformal-then-alpha-series composition as tm_forward at lam=0,
    exact to n^6."""
    s = np.sin(phi)
    e = ell["e"]
    if e == 0.0:
        return np.asarray(phi, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        # arctanh(+-1) -> +-inf at the poles; arctan collapses it to +-pi/2
        tau = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
    xi_p = np.arctan(tau)
    xi = xi_p.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xi = xi + ell["alpha"][j] * np.sin(w * xi_p)
    return xi


def _inv_rect_lat(xi, ell):
    """Geographic latitude from rectifying latitude (vectorized): the
    tm_inverse beta/delta series composition at eta = 0."""
    if ell["e"] == 0.0:
        return np.asarray(xi, dtype=np.float64)
    xi_p = np.asarray(xi, dtype=np.float64).copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xi_p = xi_p - ell["beta"][j] * np.sin(w * xi)
    phi = xi_p.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        phi = phi + ell["delta"][j] * np.sin(w * xi_p)
    return phi


def _cea_q(phi, e, e2):
    """Authalic q with the spherical (e -> 0) limit 2*sin(phi)."""
    if e == 0.0:
        return 2.0 * np.sin(phi)
    return _laea_q(phi, e, e2)


def _cyl_setup(p):
    ell = ellipsoid_consts(p["a"], p.get("f", 0.0))
    if "k0" in p:
        # Mercator variant A (EPSG method 9804): explicit scale factor at
        # the natural origin instead of a standard parallel
        k0 = float(p["k0"])
    else:
        ts = np.radians(p.get("lat_ts", 0.0))
        s = np.sin(ts)
        # point scale on the standard parallel(s): k0 = m(lat_ts)
        k0 = float(np.cos(ts) / np.sqrt(1 - ell["e2"] * s * s))
    p.update(e=ell["e"], e2=ell["e2"], k0=k0, ell=ell)
    if p["kind"] == "cea":
        p["qp"] = float(_cea_q(np.pi / 2, ell["e"], ell["e2"]))
    return p


CYL = {
    # WGS 84 / World Mercator (ellipsoidal Mercator variant A: k0 = 1)
    3395: _cyl_setup(dict(kind="merc", a=WGS84_A, f=WGS84_F, lat_ts=0.0,
                          lon0=0.0, fe=0.0, fn=0.0)),
    # WGS 84 / NSIDC EASE-Grid 2.0 Global (cylindrical equal-area,
    # standard parallels 30N/S) — the sea-ice / soil-moisture grid CRS
    6933: _cyl_setup(dict(kind="cea", a=WGS84_A, f=WGS84_F, lat_ts=30.0,
                          lon0=0.0, fe=0.0, fn=0.0)),
    # NSIDC EASE-Grid Global v1 (international authalic SPHERE)
    3410: _cyl_setup(dict(kind="cea", a=6_371_228.0, f=0.0, lat_ts=30.0,
                          lon0=0.0, fe=0.0, fn=0.0)),
    # WGS 84 / World Equidistant Cylindrical (EPSG method 1028:
    # x = a*lam, y = meridian arc M(phi) on the ellipsoid)
    4087: _cyl_setup(dict(kind="eqc", a=WGS84_A, f=WGS84_F, lat_ts=0.0,
                          lon0=0.0, fe=0.0, fn=0.0)),
    # World Mollweide (ESRI:54009). Spherical-only projection; like PROJ,
    # the sphere radius is the ellipsoid semi-major axis.
    54009: _cyl_setup(dict(kind="moll", a=WGS84_A, f=0.0, lat_ts=0.0,
                           lon0=0.0, fe=0.0, fn=0.0)),
}

# Pole guard for the ellipsoidal (arctanh) Mercator form: must keep
# sin(phi) strictly below 1.0 in double precision — webmercator's
# 89.9999999 is NOT enough there (sin rounds to exactly 1.0 and
# arctanh(1) = inf); at 89.99999 sin(phi) = 1 - 1.5e-14, comfortably
# representable below 1, giving the large-finite y PROJ produces.
_MERC_LAT_CLIP = 89.99999


def cyl_forward(lon_deg, lat_deg, epsg):
    p = epsg if isinstance(epsg, dict) else CYL[int(epsg)]
    a, k0 = p["a"], p["k0"]
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - p["lon0"])
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    kind = p["kind"]
    if kind == "merc":
        phi = np.radians(np.clip(
            np.asarray(lat_deg, dtype=np.float64), -_MERC_LAT_CLIP, _MERC_LAT_CLIP
        ))
        s = np.sin(phi)
        # isometric latitude psi = atanh(sin) - e*atanh(e*sin)
        psi = np.arctanh(s) - p["e"] * np.arctanh(p["e"] * s)
        x = a * k0 * lam
        y = a * k0 * psi
    elif kind == "cea":
        x = a * k0 * lam
        y = a * _cea_q(phi, p["e"], p["e2"]) / (2.0 * k0)
    elif kind == "eqc":
        x = a * k0 * lam
        y = p["ell"]["a_rect"] * _rect_lat(phi, p["ell"])
    else:  # moll (sphere R = a)
        sp = np.pi * np.sin(phi)
        theta = np.asarray(phi, dtype=np.float64).copy()
        for _ in range(15):
            denom = 2.0 + 2.0 * np.cos(2.0 * theta)
            step = np.where(
                denom < 1e-14, 0.0,
                (2.0 * theta + np.sin(2.0 * theta) - sp) / np.maximum(denom, 1e-14),
            )
            theta = theta - step
        x = (2.0 * np.sqrt(2.0) / np.pi) * a * lam * np.cos(theta)
        y = np.sqrt(2.0) * a * np.sin(theta)
    return p["fe"] + x, p["fn"] + y


def cyl_inverse(x, y, epsg, iters=12):
    p = epsg if isinstance(epsg, dict) else CYL[int(epsg)]
    a, k0 = p["a"], p["k0"]
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = np.asarray(y, dtype=np.float64) - p["fn"]
    kind = p["kind"]
    if kind == "merc":
        lam = xp / (a * k0)
        psi = yp / (a * k0)
        chi = np.arctan(np.sinh(psi))  # conformal latitude
        phi = chi.copy()
        e = p["e"]
        if e != 0.0:
            for _ in range(iters):
                phi = np.arctan(np.sinh(psi + e * np.arctanh(e * np.sin(phi))))
    elif kind == "cea":
        lam = xp / (a * k0)
        q = 2.0 * yp * k0 / a
        if p["e"] == 0.0:
            phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        else:
            e, e2 = p["e"], p["e2"]
            phi = np.arcsin(np.clip(q / p["qp"], -1.0, 1.0))  # authalic lat
            # the Snyder iteration's 1/(2 cos(phi)) factor amplifies the
            # ~1e-16 residual of the analytically-zero bracket into a
            # wrong fixed point at the pole (latitudes PAST 90) — pole
            # rows are answered directly, not iterated
            at_pole = np.abs(q) >= p["qp"] * (1.0 - 1e-14)
            for _ in range(iters):
                s = np.sin(phi)
                one = 1 - e2 * s * s
                phi = phi + one * one / (2 * np.cos(phi)) * (
                    q / (1 - e2) - s / one
                    + np.log((1 - e * s) / (1 + e * s)) / (2 * e)
                )
            phi = np.where(at_pole, np.copysign(np.pi / 2, q), phi)
            phi = np.clip(phi, -np.pi / 2, np.pi / 2)
    elif kind == "eqc":
        lam = xp / (a * k0)
        phi = _inv_rect_lat(yp / p["ell"]["a_rect"], p["ell"])
    else:  # moll
        theta = np.arcsin(np.clip(yp / (np.sqrt(2.0) * a), -1.0, 1.0))
        phi = np.arcsin(np.clip(
            (2.0 * theta + np.sin(2.0 * theta)) / np.pi, -1.0, 1.0
        ))
        ct = np.cos(theta)
        lam = np.where(
            ct < 1e-14, 0.0,
            np.pi * xp / (2.0 * np.sqrt(2.0) * a * np.maximum(ct, 1e-14)),
        )
    return np.degrees(lam) + p["lon0"], np.degrees(phi)


# Geodetic CRSs treated as WGS84-equivalent pivots: ETRS89 / NAD83 /
# GDA94 / GDA2020 lon-lat differ from WGS84 by well under the Helmert
# shifts' formal accuracy (same convention as the GRS80 UTM zone
# families above).
GEOGRAPHIC_WGS84_EQUIV = frozenset({4326, 4258, 4269, 4283, 7844})


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _is_utm(epsg):
    return 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760


def supported_crs(epsg) -> bool:
    if isinstance(epsg, CustomCRS):
        return True
    epsg = int(epsg)
    if epsg == 3857 or epsg in GEOGRAPHIC_WGS84_EQUIV or epsg in CONICS \
            or epsg in LAEA or epsg in POLAR or epsg in TMERC \
            or epsg in CYL or _is_utm(epsg) \
            or _grs80_utm_params(epsg) is not None:
        return True
    if USE_PYPROJ:
        try:
            import pyproj  # noqa: F401
        except ImportError:
            return False
        return True
    return False


def to_wgs84(x, y, src_epsg):
    if isinstance(src_epsg, CustomCRS):
        return _custom_to_wgs84(x, y, src_epsg)
    src_epsg = int(src_epsg)
    if src_epsg in GEOGRAPHIC_WGS84_EQUIV:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if src_epsg == 3857:
        return webmercator_inverse(x, y)
    if src_epsg in CYL:
        return cyl_inverse(x, y, src_epsg)
    if src_epsg in CONICS:
        return conic_inverse(x, y, src_epsg)
    if src_epsg in LAEA:
        return laea_inverse(x, y, src_epsg)
    if src_epsg in POLAR:
        return polar_inverse(x, y, src_epsg)
    if src_epsg in TMERC:
        p = TMERC[src_epsg]
        lon, lat = tm_inverse(x, y, p["lon0"], k0=p["k0"], fe=p["fe"],
                              fn=p["fn"], a=p["a"], f=p["f"],
                              lat0_deg=p["lat0"])
        if "helmert" in p:
            lon, lat = datum_to_wgs84(lon, lat, p["a"], p["f"], p["helmert"])
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if _is_utm(src_epsg):
        lon0, fn = utm_zone_params(src_epsg)
        return tm_inverse(x, y, lon0, fn=fn)
    zp = _grs80_utm_params(src_epsg)
    if zp is not None:
        return tm_inverse(x, y, zp[0], fn=zp[1], a=GRS80_A, f=GRS80_F)
    raise ValueError(f"unsupported source CRS: EPSG:{src_epsg}")


def from_wgs84(lon, lat, dst_epsg):
    if isinstance(dst_epsg, CustomCRS):
        return _custom_from_wgs84(lon, lat, dst_epsg)
    dst_epsg = int(dst_epsg)
    if dst_epsg in GEOGRAPHIC_WGS84_EQUIV:
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if dst_epsg == 3857:
        return webmercator_forward(lon, lat)
    if dst_epsg in CYL:
        return cyl_forward(lon, lat, dst_epsg)
    if dst_epsg in CONICS:
        return conic_forward(lon, lat, dst_epsg)
    if dst_epsg in LAEA:
        return laea_forward(lon, lat, dst_epsg)
    if dst_epsg in POLAR:
        return polar_forward(lon, lat, dst_epsg)
    if dst_epsg in TMERC:
        p = TMERC[dst_epsg]
        if "helmert" in p:
            lon, lat = wgs84_to_datum(lon, lat, p["a"], p["f"], p["helmert"])
        return tm_forward(lon, lat, p["lon0"], k0=p["k0"], fe=p["fe"],
                          fn=p["fn"], a=p["a"], f=p["f"], lat0_deg=p["lat0"])
    if _is_utm(dst_epsg):
        lon0, fn = utm_zone_params(dst_epsg)
        return tm_forward(lon, lat, lon0, fn=fn)
    zp = _grs80_utm_params(dst_epsg)
    if zp is not None:
        return tm_forward(lon, lat, zp[0], fn=zp[1], a=GRS80_A, f=GRS80_F)
    raise ValueError(f"unsupported target CRS: EPSG:{dst_epsg}")


# ---------------------------------------------------------------------------
# pyproj plug-in hook
# ---------------------------------------------------------------------------
# This container ships no pyproj, so the closed forms above are the built-in
# surface. Environments that have pyproj get every CRS pair it knows by
# flipping this on; it is consulted FIRST so authoritative transforms win
# over our closed forms when both exist. The flag must be set before the
# SparkSession starts (python workers import this module independently).
USE_PYPROJ = __import__("os").environ.get("SPARK_GRAFT_USE_PYPROJ", "") == "1"
_PYPROJ_CACHE: dict = {}


# codes this engine accepts that live in the ESRI registry, not EPSG —
# the pyproj path must preserve the authority or Transformer.from_crs
# raises CRSError on a nonexistent EPSG code
_ESRI_CODES = frozenset({54009})


def _crs_authority_string(code: int) -> str:
    return f"ESRI:{code}" if code in _ESRI_CODES else f"EPSG:{code}"


def _pyproj_transform(x, y, src_epsg, dst_epsg):
    """Vectorized pyproj transform, or None if pyproj is unavailable."""
    try:
        from pyproj import Transformer
    except ImportError:
        return None
    def spec(c):
        # custom CRSs hand pyproj their original PROJJSON/WKT definition
        if isinstance(c, CustomCRS):
            return c.text if c.text else None
        return _crs_authority_string(int(c))

    key = (src_epsg if isinstance(src_epsg, CustomCRS) else int(src_epsg),
           dst_epsg if isinstance(dst_epsg, CustomCRS) else int(dst_epsg))
    tr = _PYPROJ_CACHE.get(key)
    if tr is None:
        s_spec, d_spec = spec(src_epsg), spec(dst_epsg)
        if s_spec is None or d_spec is None:
            return None  # definition text lost; fall back to closed forms
        tr = Transformer.from_crs(s_spec, d_spec, always_xy=True)
        _PYPROJ_CACHE[key] = tr
    tx, ty = tr.transform(
        np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    )
    return np.asarray(tx), np.asarray(ty)


def transform_xy(x, y, src_epsg, dst_epsg):
    """Vectorized (x, y) arrays src -> dst. Pivot through EPSG:4326, unless
    the pyproj hook is enabled and pyproj is importable."""
    custom = isinstance(src_epsg, CustomCRS) or isinstance(dst_epsg, CustomCRS)
    same = (src_epsg == dst_epsg) if custom else int(src_epsg) == int(dst_epsg)
    if same:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if USE_PYPROJ:
        got = _pyproj_transform(x, y, src_epsg, dst_epsg)
        if got is not None:
            return got
    lon, lat = to_wgs84(x, y, src_epsg)
    return from_wgs84(lon, lat, dst_epsg)


def parse_crs(crs) -> int:
    """EPSG code from any of the reference's CRS variants (crs.rs:36-140):
    an int SRID, 'EPSG:4326' / '4326' strings, a PROJJSON dict (or its
    JSON string) carrying an EPSG or OGC id, a WKT2 string ending in an
    ID["EPSG", n] node, an OGC URN ('urn:ogc:def:crs:EPSG::4326'), or
    'OGC:CRS84' (the GeoParquet default CRS — WGS84 lon-lat, which is
    exactly this engine's axis convention, so it resolves to 4326).
    Compound CRSs (horizontal + vertical, PROJJSON or WKT2) resolve to
    their horizontal component — geometry here is 2-D. Legacy PROJ
    strings ('+proj=utm +zone=32 +datum=WGS84', '+init=epsg:n') resolve
    through the same closed-form engines."""
    if isinstance(crs, (int, np.integer)):
        return int(crs)
    if isinstance(crs, dict):
        import json

        ident = crs.get("id") or {}
        auth = str(ident.get("authority", "")).upper()
        if auth == "EPSG":
            code = int(ident["code"])
            if supported_crs(code):
                return code
            # unregistered code, but the PROJJSON may carry the full
            # method + parameters — build the projection from those
            try:
                return _custom_from_projjson(crs, text=json.dumps(crs))
            except (ValueError, KeyError, TypeError):
                return code  # surface the unsupported-CRS error downstream
        if auth == "OGC" and str(ident.get("code", "")).upper() in (
            "CRS84", "84"
        ):
            return 4326
        try:
            return _custom_from_projjson(crs, text=json.dumps(crs))
        except (ValueError, KeyError, TypeError) as exc:
            raise ValueError(
                "PROJJSON without an EPSG id and not buildable from its "
                f"conversion parameters ({exc}): {crs.get('name', crs)!r}"
            )
    s = str(crs).strip()
    low = s.lower()
    if low in ("ogc:crs84", "crs84", "urn:ogc:def:crs:ogc:1.3:crs84",
               "urn:ogc:def:crs:ogc::crs84"):
        return 4326
    if low.startswith("urn:ogc:def:crs:epsg:"):
        # urn:ogc:def:crs:EPSG::4326 (the version field may be present)
        return int(s.rsplit(":", 1)[1])
    if low.startswith("epsg:") or low.startswith("esri:"):
        # ESRI: for the 54xxx world-projection series (e.g. ESRI:54009
        # Mollweide); the numeric namespaces don't collide
        return int(s[5:])
    if s.startswith("{"):
        import json

        return parse_crs(json.loads(s))
    if s.startswith("+") or low.startswith("proj=") or low.startswith("init="):
        return _custom_from_proj_string(s)
    if "[" in s:  # WKT2: take the OUTERMOST (last) ID/AUTHORITY node
        import re

        m = None
        for m in re.finditer(
            r'(?:ID|AUTHORITY)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', s, re.I
        ):
            pass
        if m:
            code = int(m.group(1))
            if supported_crs(code):
                return code
            try:
                return _custom_from_wkt2(s)
            except (ValueError, KeyError, TypeError, IndexError):
                return code
        try:
            return _custom_from_wkt2(s)
        except (ValueError, KeyError, TypeError, IndexError) as exc:
            raise ValueError(
                "WKT2 CRS without an EPSG identifier and not buildable "
                f"from its CONVERSION node ({exc}): {s[:80]!r}"
            )
    return int(s)


# ---------------------------------------------------------------------------
# Custom CRS: projection method + parameters with NO EPSG code
# ---------------------------------------------------------------------------
# GeoParquet carries CRS as PROJJSON, and a user-defined CRS (a local TM
# grid, a bespoke LCC, a BoundCRS with explicit TOWGS84 shifts) has no
# EPSG id at all — the reference handles those through its geodesy engine
# (reproject.rs:105 takes any definition string). Here the same coverage
# comes from routing the parsed method + parameters into the generic
# engines above. Everything below is built from the public PROJJSON
# schema (proj.org/schemas/v0.7/projjson.schema.json) and the OGC WKT2
# spec (ISO 19162); EPSG method/parameter codes are from the public EPSG
# registry.
#
# Datum convention: a custom CRS on a non-WGS84 ellipsoid WITHOUT an
# explicit transformation (BoundCRS / TOWGS84) is treated as
# WGS84-coincident — the same convention as the GRS80 zone families
# above, and what PROJ does when no pipeline is available. With a
# BoundCRS the 3/7-parameter Helmert shift is applied through ECEF.

class CustomCRS:
    """A CRS resolved from method + parameters rather than an EPSG code.

    ``kind`` selects the engine ('tmerc' | 'conic' | 'laea' | 'polar' |
    'cyl' | 'geographic'); ``p`` is the engine's precomputed setup dict;
    ``a``/``f`` are the TRUE datum ellipsoid (LCC-1SP folds k0 into the
    setup's working ``a``, so the helmert path must not read it from
    ``p``); ``helmert`` is an optional position-vector 7-tuple
    (datum -> WGS84); ``text`` is the original definition for the pyproj
    hook. Hash/equality are by canonical scalar parameters, so the
    ``src == dst`` early exit and the pyproj transformer cache work."""

    __slots__ = ("kind", "p", "a", "f", "helmert", "text", "_key")

    def __init__(self, kind, p, a, f, helmert=None, text=None):
        self.kind = kind
        self.p = p
        self.a = float(a)
        self.f = float(f)
        self.helmert = tuple(float(v) for v in helmert) if helmert else None
        self.text = text
        scalars = tuple(sorted(
            (k, float(v)) for k, v in p.items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
        ))
        self._key = (kind, self.a, self.f, scalars, self.helmert)

    def __eq__(self, other):
        return isinstance(other, CustomCRS) and self._key == other._key

    def __hash__(self):
        return hash(self._key)

    def __repr__(self):
        return f"CustomCRS(kind={self.kind!r}, a={self.a}, f={self.f})"


# EPSG method code / lower-cased name -> internal method tag
_PJ_METHODS = {
    9807: "tmerc", "transverse mercator": "tmerc",
    9801: "lcc1", "lambert conic conformal (1sp)": "lcc1",
    9802: "lcc2", "lambert conic conformal (2sp)": "lcc2",
    9822: "aea", "albers equal area": "aea",
    9820: "laea", "lambert azimuthal equal area": "laea",
    9829: "polar_b", "polar stereographic (variant b)": "polar_b",
    9810: "polar_a", "polar stereographic (variant a)": "polar_a",
    9804: "merc_a", "mercator (variant a)": "merc_a",
    9805: "merc_b", "mercator (variant b)": "merc_b",
    9835: "cea", "lambert cylindrical equal area": "cea",
    1028: "eqc", "equidistant cylindrical": "eqc",
    1029: "eqc", "equidistant cylindrical (spherical)": "eqc",
    1024: "webmerc", "popular visualisation pseudo mercator": "webmerc",
    "mollweide": "moll",
}

# EPSG parameter code / lower-cased name -> (slot, unit kind)
_PJ_PARAMS = {
    8801: ("lat0", "angle"), "latitude of natural origin": ("lat0", "angle"),
    8802: ("lon0", "angle"), "longitude of natural origin": ("lon0", "angle"),
    8805: ("k0", "scale"), "scale factor at natural origin": ("k0", "scale"),
    8806: ("fe", "length"), "false easting": ("fe", "length"),
    8807: ("fn", "length"), "false northing": ("fn", "length"),
    8821: ("lat0", "angle"), "latitude of false origin": ("lat0", "angle"),
    8822: ("lon0", "angle"), "longitude of false origin": ("lon0", "angle"),
    8823: ("lat1", "angle"),
    "latitude of 1st standard parallel": ("lat1", "angle"),
    8824: ("lat2", "angle"),
    "latitude of 2nd standard parallel": ("lat2", "angle"),
    8826: ("fe", "length"), "easting at false origin": ("fe", "length"),
    8827: ("fn", "length"), "northing at false origin": ("fn", "length"),
    8832: ("lat_ts", "angle"),
    "latitude of standard parallel": ("lat_ts", "angle"),
    8833: ("lon0", "angle"), "longitude of origin": ("lon0", "angle"),
}

# BoundCRS Helmert parameter codes (position-vector convention slots)
_PJ_HELMERT = {
    8605: 0, "x-axis translation": 0,
    8606: 1, "y-axis translation": 1,
    8607: 2, "z-axis translation": 2,
    8608: 3, "x-axis rotation": 3,
    8609: 4, "y-axis rotation": 4,
    8610: 5, "z-axis rotation": 5,
    8611: 6, "scale difference": 6,
}


def _pj_unit_factor(unit, kind):
    """Multiplier taking a PROJJSON/WKT parameter value to degrees
    (angles), metres (lengths), or unity (scales). ``unit`` is a name
    string or a dict/float carrying a conversion factor to SI
    (radians / metres)."""
    if unit is None:
        return 1.0
    if isinstance(unit, str):
        u = unit.lower()
        if u in ("degree", "metre", "meter", "unity", ""):
            return 1.0
        if u == "grad":
            return 0.9 if kind == "angle" else 1.0
        if u in ("arc-second", "arcsecond"):
            return 1.0 / 3600.0
        raise ValueError(f"unsupported CRS parameter unit: {unit!r}")
    cf = float(unit["conversion_factor"] if isinstance(unit, dict) else unit)
    if kind == "angle":  # factor to radians -> degrees
        return cf * 180.0 / np.pi
    return cf  # factor to metres (or unity for scales)


def _pj_method_tag(method):
    mid = (method.get("id") or {})
    if str(mid.get("authority", "")).upper() == "EPSG":
        tag = _PJ_METHODS.get(int(mid["code"]))
        if tag:
            return tag
    return _PJ_METHODS.get(str(method.get("name", "")).strip().lower())


def _pj_params(parameters):
    """{slot: value-in-deg/m} from a PROJJSON parameter list."""
    out = {}
    for prm in parameters or ():
        pid = (prm.get("id") or {})
        slot = None
        if str(pid.get("authority", "")).upper() == "EPSG":
            slot = _PJ_PARAMS.get(int(pid["code"]))
        if slot is None:
            slot = _PJ_PARAMS.get(str(prm.get("name", "")).strip().lower())
        if slot is None:
            continue  # unused parameter (e.g. ellipsoid scaling factor)
        name, ukind = slot
        out[name] = float(prm["value"]) * _pj_unit_factor(
            prm.get("unit"), ukind
        )
    return out


def _pj_ellipsoid(geog):
    """(a, f) from a PROJJSON GeographicCRS / GeodeticCRS node."""
    datum = geog.get("datum") or geog.get("datum_ensemble") or {}
    ell = datum.get("ellipsoid")
    if ell is None:
        raise ValueError("CRS definition carries no ellipsoid")
    if "radius" in ell:
        return float(ell["radius"]), 0.0
    a = float(ell["semi_major_axis"])
    if "inverse_flattening" in ell:
        rf = float(ell["inverse_flattening"])
        return a, (1.0 / rf if rf else 0.0)
    b = float(ell["semi_minor_axis"])
    return a, (a - b) / a


def _wgs84_like(a, f):
    """WGS84/GRS80-coincident by the repo's standing convention."""
    return abs(a - WGS84_A) < 1.0 and abs(f - WGS84_F) < 1e-8


def _custom_projected(tag, g, a, f, helmert, text):
    """CustomCRS for a projected method tag + {slot: value} params on
    ellipsoid (a, f)."""
    lat0 = g.get("lat0", 0.0)
    lon0 = g.get("lon0", 0.0)
    k0 = g.get("k0", 1.0)
    fe = g.get("fe", 0.0)
    fn = g.get("fn", 0.0)
    if tag == "tmerc":
        p = dict(a=a, f=f, lat0=lat0, lon0=lon0, k0=k0, fe=fe, fn=fn)
        return CustomCRS("tmerc", p, a, f, helmert, text)
    if tag in ("lcc1", "lcc2", "aea"):
        if tag == "lcc1":
            # rho = k0 * a * F * t^n == (k0*a) * F * t^n: fold the 1SP
            # scale factor into the setup's working semi-major axis
            # (dimensionless F, t, n are unchanged); lat1 = lat2 = lat0
            # takes the one-parallel limit branch in _conic_setup
            p = _conic_setup(dict(kind="lcc", a=a * k0, f=f, lat0=lat0,
                                  lon0=lon0, lat1=lat0, lat2=lat0,
                                  fe=fe, fn=fn))
        else:
            p = _conic_setup(dict(kind="lcc" if tag == "lcc2" else "aea",
                                  a=a, f=f, lat0=lat0, lon0=lon0,
                                  lat1=g.get("lat1", lat0),
                                  lat2=g.get("lat2", g.get("lat1", lat0)),
                                  fe=fe, fn=fn))
        return CustomCRS("conic", p, a, f, helmert, text)
    if tag == "laea":
        p = _laea_setup(dict(a=a, f=f, lat0=lat0, lon0=lon0, fe=fe, fn=fn))
        return CustomCRS("laea", p, a, f, helmert, text)
    if tag == "polar_b":
        p = _polar_setup(dict(a=a, f=f, lat_ts=g.get("lat_ts", 90.0),
                              lon0=lon0, fe=fe, fn=fn))
        return CustomCRS("polar", p, a, f, helmert, text)
    if tag == "polar_a":
        # variant A: lat0 is +-90; only its sign reaches the engine
        # (hemisphere selector) — k0 carries the scale
        p = _polar_setup(dict(a=a, f=f, lat_ts=lat0 if lat0 else 90.0,
                              lon0=lon0, fe=fe, fn=fn, k0=k0))
        return CustomCRS("polar", p, a, f, helmert, text)
    if tag in ("merc_a", "merc_b", "cea", "eqc", "webmerc", "moll"):
        kind = {"merc_a": "merc", "merc_b": "merc", "cea": "cea",
                "eqc": "eqc", "webmerc": "merc", "moll": "moll"}[tag]
        d = dict(kind=kind, a=a, lon0=lon0, fe=fe, fn=fn)
        if tag == "merc_a":
            d.update(f=f, k0=k0)
        elif tag in ("webmerc", "moll"):
            d.update(f=0.0, lat_ts=0.0)  # spherical by definition (R = a)
        else:
            d.update(f=f, lat_ts=g.get("lat1", g.get("lat_ts", 0.0)))
        return CustomCRS("cyl", _cyl_setup(d), a, f, helmert, text)
    raise ValueError(f"unsupported projection method tag: {tag!r}")


def _custom_from_projjson(d, text=None, helmert=None):
    """CustomCRS (or int EPSG pivot) from a PROJJSON dict that carries a
    full definition (conversion / datum) rather than a usable EPSG id."""
    typ = str(d.get("type", ""))
    if typ == "BoundCRS":
        tr = d.get("transformation") or {}
        hp = [0.0] * 7
        for prm in tr.get("parameters", ()):
            pid = (prm.get("id") or {})
            slot = None
            if str(pid.get("authority", "")).upper() == "EPSG":
                slot = _PJ_HELMERT.get(int(pid["code"]))
            if slot is None:
                slot = _PJ_HELMERT.get(str(prm.get("name", "")).strip().lower())
            if slot is None:
                continue
            ukind = "length" if slot < 3 else ("angle" if slot < 6 else "scale")
            v = float(prm["value"])
            if slot < 3:
                v *= _pj_unit_factor(prm.get("unit"), "length")
            elif slot < 6:
                # rotations: position-vector tuple wants ARC-SECONDS
                u = prm.get("unit")
                if isinstance(u, str):
                    v *= {"arc-second": 1.0, "arcsecond": 1.0,
                          "degree": 3600.0}.get(u.lower(), 1.0)
                elif u is not None:  # factor to radians
                    cf = float(u["conversion_factor"] if isinstance(u, dict) else u)
                    v *= cf * (180.0 * 3600.0) / np.pi
            hp[slot] = v
        mname = str((tr.get("method") or {}).get("name", "")).lower()
        if "frame" in mname:  # coordinate-frame rotation: opposite sign
            hp[3], hp[4], hp[5] = -hp[3], -hp[4], -hp[5]
        return _custom_from_projjson(d["source_crs"], text=text,
                                     helmert=tuple(hp))
    if typ == "CompoundCRS":
        # horizontal + vertical: geometry here is 2-D, so resolve the
        # horizontal component (PROJ does the same for 2-D input). Route
        # through parse_crs so an EPSG-coded component lands on its
        # registered engine.
        for comp in d.get("components") or ():
            if str(comp.get("type", "")) in (
                "GeographicCRS", "GeodeticCRS", "Geographic 2D CRS",
                "ProjectedCRS", "BoundCRS",
            ):
                return parse_crs(comp)
        raise ValueError("CompoundCRS without a horizontal component")
    if typ in ("GeographicCRS", "GeodeticCRS", "Geographic 2D CRS"):
        a, f = _pj_ellipsoid(d)
        if helmert is None and _wgs84_like(a, f):
            return 4326
        return CustomCRS("geographic", dict(a=a, f=f), a, f, helmert, text)
    if typ == "ProjectedCRS":
        base = d.get("base_crs") or {}
        a, f = _pj_ellipsoid(base)
        conv = d.get("conversion") or {}
        tag = _pj_method_tag(conv.get("method") or {})
        if tag is None:
            raise ValueError(
                "unsupported projection method: "
                f"{(conv.get('method') or {}).get('name')!r}"
            )
        return _custom_projected(tag, _pj_params(conv.get("parameters")),
                                 a, f, helmert, text)
    raise ValueError(f"unsupported PROJJSON CRS type: {typ!r}")


# ---------------------------------------------------------------------------
# PROJ strings ('+proj=utm +zone=32 +datum=WGS84') — the legacy definition
# format still carried by shapefile .prj sidecars, GeoJSON pipelines and
# user configs. Parsed from the public PROJ documentation
# (proj.org/usage/projections.html); the resolved parameters route into
# the same closed-form engines as PROJJSON/WKT2.
# ---------------------------------------------------------------------------

# (a, f) from the public PROJ ellipsoid registry ('proj -le')
_PROJ_ELLPS = {
    "wgs84": (6378137.0, 1.0 / 298.257223563),
    "grs80": (6378137.0, 1.0 / 298.257222101),
    "intl": (6378388.0, 1.0 / 297.0),
    "clrk66": (6378206.4, (6378206.4 - 6356583.8) / 6378206.4),
    "clrk80": (6378249.145, 1.0 / 293.465),
    "clrk80ign": (6378249.2, 1.0 / 293.4660212936269),
    "bessel": (6377397.155, 1.0 / 299.1528128),
    "krass": (6378245.0, 1.0 / 298.3),
    "airy": (6377563.396, 1.0 / 299.3249646),
    "mod_airy": (6377340.189, (6377340.189 - 6356034.446) / 6377340.189),
    "aust_sa": (6378160.0, 1.0 / 298.25),
    "helmert": (6378200.0, 1.0 / 298.3),
    "evrst30": (6377276.345, 1.0 / 300.8017),
    "sphere": (6370997.0, 0.0),
}

# datum shorthand -> (ellps key, towgs84 7-tuple or None). None means
# WGS84-coincident (NAD27's real shift needs grid files PROJ ships and we
# don't — the repo's standing no-transformation convention applies, as
# documented at the CustomCRS section header).
_PROJ_DATUMS = {
    "wgs84": ("wgs84", None),
    "nad83": ("grs80", None),
    "nad27": ("clrk66", None),
    "potsdam": ("bessel", (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)),
    "osgb36": ("airy",
               (446.448, -125.157, 542.06, 0.15, 0.247, 0.842, -20.489)),
    "carthage": ("clrk80ign", (-263.0, 6.0, 431.0, 0.0, 0.0, 0.0, 0.0)),
    "hermannskogel": ("bessel",
                      (577.326, 90.129, 463.919, 5.137, 1.474, 5.297,
                       2.4232)),
    "ire65": ("mod_airy",
              (482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15)),
    "nzgd49": ("intl",
               (59.47, -5.04, 187.44, 0.47, -0.1, 1.024, -4.5993)),
}

# +proj= name -> engine method tag (same tags as _PJ_METHODS)
_PROJ_NAMES = {
    "tmerc": "tmerc", "etmerc": "tmerc",
    "lcc": "lcc",          # 1SP/2SP split on the parameters below
    "aea": "aea",
    "laea": "laea",
    "stere": "stere",      # polar_a / polar_b split on the parameters
    "merc": "merc",        # merc_a / merc_b split on k vs lat_ts
    "webmerc": "webmerc",
    "cea": "cea",
    "eqc": "eqc",
    "moll": "moll",
}

# +key= -> engine parameter slot (all angles are degrees in PROJ strings,
# lengths metres — no unit conversion needed)
_PROJ_PARAM_KEYS = {
    "lat_0": "lat0", "lon_0": "lon0", "k_0": "k0", "k": "k0",
    "x_0": "fe", "y_0": "fn", "lat_1": "lat1", "lat_2": "lat2",
    "lat_ts": "lat_ts",
}

_PROJ_IGNORED_KEYS = {
    "no_defs", "type", "wktext", "over", "no_off", "approx", "vunits",
    "geoid_crs",
}


def _parse_proj_kv(s):
    """{key: value-or-True} from '+k=v +flag' text (keys lower-cased)."""
    out = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            out[k.lower()] = v
        else:
            out[tok.lower()] = True
    return out


def _proj_string_ellipsoid(kv):
    """(a, f, helmert-or-None) from +datum/+ellps/+a/+b/+rf/+f/+R."""
    helmert = None
    if "datum" in kv:
        d = str(kv["datum"]).lower()
        if d not in _PROJ_DATUMS:
            raise ValueError(f"unsupported PROJ +datum={kv['datum']!r}")
        ekey, helmert = _PROJ_DATUMS[d]
        a, f = _PROJ_ELLPS[ekey]
    elif "ellps" in kv:
        e = str(kv["ellps"]).lower()
        if e not in _PROJ_ELLPS:
            raise ValueError(f"unsupported PROJ +ellps={kv['ellps']!r}")
        a, f = _PROJ_ELLPS[e]
    elif "r" in kv:
        a, f = float(kv["r"]), 0.0
    elif "a" in kv:
        a = float(kv["a"])
        if "rf" in kv:
            rf = float(kv["rf"])
            f = 1.0 / rf if rf else 0.0
        elif "f" in kv:
            f = float(kv["f"])
        elif "b" in kv:
            f = (a - float(kv["b"])) / a
        else:
            f = 0.0
    else:
        a, f = _PROJ_ELLPS["wgs84"]  # PROJ's default
    if "towgs84" in kv:
        vals = [float(v) for v in str(kv["towgs84"]).split(",")]
        if len(vals) == 3:
            vals += [0.0, 0.0, 0.0, 0.0]
        if len(vals) != 7:
            raise ValueError("+towgs84 wants 3 or 7 comma-separated terms")
        # PROJ +towgs84 is the position-vector convention — same as ours
        helmert = None if not any(vals) else tuple(vals)
    return a, f, helmert


def _custom_from_proj_string(s):
    """CustomCRS (or int EPSG pivot) from a legacy PROJ string."""
    kv = _parse_proj_kv(s)
    if "init" in kv:
        ns, _, code = str(kv["init"]).partition(":")
        if ns.lower() != "epsg":
            raise ValueError(f"unsupported PROJ +init namespace {ns!r}")
        return parse_crs(int(code))
    # keys that change the result and have no engine here must not be
    # silently dropped
    if str(kv.get("pm", "greenwich")).lower() not in ("greenwich", "0"):
        raise ValueError("PROJ +pm (non-Greenwich prime meridian) "
                         "is not supported")
    for key in ("nadgrids", "geoidgrids", "alpha", "gamma", "lonc"):
        if key in kv and str(kv[key]).lower() not in ("@null", "null"):
            raise ValueError(f"PROJ +{key} is not supported")
    if str(kv.get("axis", "enu")).lower() != "enu":
        raise ValueError("PROJ +axis other than 'enu' is not supported")
    if "units" in kv and str(kv["units"]).lower() not in ("m", "meter",
                                                          "metre"):
        raise ValueError(f"unsupported PROJ +units={kv['units']!r}")
    if "to_meter" in kv and float(kv["to_meter"]) != 1.0:
        raise ValueError("PROJ +to_meter other than 1 is not supported")

    name = str(kv.get("proj", "")).lower()
    if not name:
        raise ValueError("PROJ string carries no +proj=")
    a, f, helmert = _proj_string_ellipsoid(kv)

    if name in ("longlat", "latlong", "lonlat", "latlon"):
        if helmert is None and _wgs84_like(a, f):
            return 4326
        return CustomCRS("geographic", dict(a=a, f=f), a, f, helmert, s)

    g = {}
    for key, slot in _PROJ_PARAM_KEYS.items():
        if key in kv:
            g[slot] = float(kv[key])

    if name == "utm":
        zone = int(kv.get("zone", 0))
        if not 1 <= zone <= 60:
            raise ValueError("+proj=utm wants +zone=1..60")
        south = "south" in kv
        # pivot to the registered zone engine only on the EXACT WGS84
        # ellipsoid — GRS80 stays custom so its (micrometre-level, but
        # real) flattening difference is honored like EPSG 258xx does
        if helmert is None and a == WGS84_A and f == WGS84_F:
            return (32700 if south else 32600) + zone
        g = dict(lat0=0.0, lon0=zone * 6.0 - 183.0, k0=_UTM_K0,
                 fe=_UTM_FE, fn=1e7 if south else 0.0)
        return _custom_projected("tmerc", g, a, f, helmert, s)

    tag = _PROJ_NAMES.get(name)
    if tag is None:
        raise ValueError(f"unsupported PROJ projection +proj={name!r}")
    if tag == "lcc":
        # PROJ semantics: n comes from lat_1/lat_2 (lat_1 DEFAULTS TO 0
        # like PROJ — not to lat_0 — and lat_2 defaults to lat_1), rho0
        # from lat_0 independently — i.e. even "+lat_1 only" is the 2SP
        # formula in its equal-parallel limit, NOT a tangent cone at
        # lat_0. k_0 is the one thing the generic conic engine doesn't
        # carry; it folds into the 1SP setup only when the cone is
        # tangent at the origin (lat_0 == lat_1).
        g.setdefault("lat1", 0.0)
        g.setdefault("lat2", g["lat1"])
        if abs(g["lat1"] + g["lat2"]) < 1e-10:
            # n = 0: PROJ rejects these ("|lat_1 + lat_2| should be > 0")
            raise ValueError(
                "+proj=lcc with lat_1 + lat_2 == 0 is degenerate (the "
                "cone constant vanishes); PROJ rejects it too")
        if g.get("k0", 1.0) != 1.0:
            if g["lat2"] != g["lat1"] or (
                "lat0" in g and g["lat0"] != g["lat1"]
            ):
                raise ValueError(
                    "+proj=lcc with k_0 != 1 is only supported on the "
                    "tangent cone (lat_0 == lat_1, no distinct lat_2)")
            tag = "lcc1"
            g["lat0"] = g["lat1"]
        else:
            tag = "lcc2"
    elif tag == "stere":
        lat0 = g.get("lat0")
        if lat0 is None or abs(lat0) != 90.0:
            raise ValueError("+proj=stere is only supported at the poles "
                             "(+lat_0=90 or -90; oblique stereographic "
                             "has no engine here)")
        if "lat_ts" in g:
            if g["lat_ts"] == 0.0:
                raise ValueError(
                    "+proj=stere with lat_ts=0 (true scale at the "
                    "equator) has no engine here; use +lat_0=+-90 with "
                    "+k_0 (variant A) or a nonzero lat_ts")
            tag = "polar_b"
            if (g["lat_ts"] < 0) != (lat0 < 0):
                # PROJ reads |lat_ts| with the hemisphere from lat_0
                g["lat_ts"] = -g["lat_ts"]
        else:
            tag = "polar_a"
    elif tag == "merc":
        tag = "merc_b" if "lat_ts" in g else "merc_a"
    if tag in ("merc_a", "merc_b", "cea", "eqc", "webmerc", "moll") and \
            g.get("lat0"):
        raise ValueError(
            f"+proj={name} with a non-zero +lat_0 is not supported")
    return _custom_projected(tag, g, a, f, helmert, s)


def _custom_to_wgs84(x, y, crs):
    k = crs.kind
    if k == "geographic":
        lon = np.asarray(x, dtype=np.float64)
        lat = np.asarray(y, dtype=np.float64)
    elif k == "tmerc":
        q = crs.p
        lon, lat = tm_inverse(x, y, q["lon0"], k0=q["k0"], fe=q["fe"],
                              fn=q["fn"], a=q["a"], f=q["f"],
                              lat0_deg=q["lat0"])
    elif k == "conic":
        lon, lat = conic_inverse(x, y, crs.p)
    elif k == "laea":
        lon, lat = laea_inverse(x, y, crs.p)
    elif k == "polar":
        lon, lat = polar_inverse(x, y, crs.p)
    else:
        lon, lat = cyl_inverse(x, y, crs.p)
    if crs.helmert:
        lon, lat = datum_to_wgs84(lon, lat, crs.a, crs.f, crs.helmert)
    return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)


def _custom_from_wgs84(lon, lat, crs):
    if crs.helmert:
        lon, lat = wgs84_to_datum(lon, lat, crs.a, crs.f, crs.helmert)
    k = crs.kind
    if k == "geographic":
        return (np.asarray(lon, dtype=np.float64),
                np.asarray(lat, dtype=np.float64))
    if k == "tmerc":
        q = crs.p
        return tm_forward(lon, lat, q["lon0"], k0=q["k0"], fe=q["fe"],
                          fn=q["fn"], a=q["a"], f=q["f"], lat0_deg=q["lat0"])
    if k == "conic":
        return conic_forward(lon, lat, crs.p)
    if k == "laea":
        return laea_forward(lon, lat, crs.p)
    if k == "polar":
        return polar_forward(lon, lat, crs.p)
    return cyl_forward(lon, lat, crs.p)


# --- WKT2 (ISO 19162): same coverage through a minimal node parser -------

def _wkt_tokenize(s):
    """Parse a WKT2 string into a (NAME, [args...]) tree; args are nested
    nodes, numbers, or bare strings. Quoted strings use the WKT '""'
    escape."""
    i, n = 0, len(s)

    def skip_ws():
        nonlocal i
        while i < n and s[i] in " \t\r\n":
            i += 1

    def parse_node():
        nonlocal i
        skip_ws()
        j = i
        while i < n and (s[i].isalnum() or s[i] in "_$"):
            i += 1
        name = s[j:i].upper()
        skip_ws()
        args = []
        if i < n and s[i] in "[(":
            close = "]" if s[i] == "[" else ")"
            i += 1
            while True:
                skip_ws()
                if i >= n:
                    raise ValueError("unterminated WKT node")
                if s[i] == close:
                    i += 1
                    break
                if s[i] == ",":
                    i += 1
                    continue
                if s[i] == '"':
                    i += 1
                    buf = []
                    while i < n:
                        if s[i] == '"':
                            if i + 1 < n and s[i + 1] == '"':
                                buf.append('"')
                                i += 2
                                continue
                            i += 1
                            break
                        buf.append(s[i])
                        i += 1
                    args.append("".join(buf))
                elif s[i] in "-+.0123456789":
                    j2 = i
                    while i < n and s[i] in "-+.0123456789eE":
                        i += 1
                    args.append(float(s[j2:i]))
                else:
                    args.append(parse_node())
        return (name, args)

    node = parse_node()
    skip_ws()
    return node


def _wkt_find(node, *names):
    for arg in node[1]:
        if isinstance(arg, tuple) and arg[0] in names:
            return arg
    return None


def _wkt_find_all(node, *names):
    return [a for a in node[1]
            if isinstance(a, tuple) and a[0] in names]


def _wkt_epsg_id(node):
    idn = _wkt_find(node, "ID", "AUTHORITY")
    if idn and str(idn[1][0]).upper() == "EPSG":
        try:
            return int(float(idn[1][1]))
        except (TypeError, ValueError):
            return None
    return None


def _wkt_unit_factor(pnode, kind):
    u = _wkt_find(pnode, "ANGLEUNIT", "LENGTHUNIT", "SCALEUNIT", "UNIT")
    if u is None:
        return 1.0
    name = str(u[1][0]).lower()
    cf = float(u[1][1]) if len(u[1]) > 1 and isinstance(u[1][1], float) else 1.0
    if kind == "angle":
        if name == "degree":
            return 1.0
        return cf * 180.0 / np.pi  # factor to radians
    if name in ("metre", "meter", "unity"):
        return 1.0
    return cf


def _custom_from_wkt2(s):
    """CustomCRS (or int EPSG pivot) from a WKT2 string with a full
    CONVERSION definition (the path for WKT without a usable EPSG id)."""
    return _custom_from_wkt_node(_wkt_tokenize(s), s)


def _custom_from_wkt_node(root, s):
    if root[0] == "COMPOUNDCRS":
        # horizontal + vertical: geometry here is 2-D, so resolve the
        # horizontal member (same convention as the PROJJSON path).
        for arg in root[1]:
            if isinstance(arg, tuple) and arg[0] in (
                "GEOGCRS", "GEODCRS", "GEOGCS", "PROJCRS", "PROJCS",
            ):
                code = _wkt_epsg_id(arg)
                if code and supported_crs(code):
                    return code
                return _custom_from_wkt_node(arg, s)
        raise ValueError("COMPOUNDCRS without a horizontal component")
    if root[0] == "BOUNDCRS":
        # keep scope: WKT BoundCRS is rare next to PROJJSON BoundCRS
        raise ValueError("WKT2 BOUNDCRS is not supported; "
                         "use the PROJJSON form")
    if root[0] in ("GEOGCRS", "GEODCRS", "GEOGCS"):
        a, f = _wkt_ellipsoid(root)
        if _wgs84_like(a, f):
            return 4326
        return CustomCRS("geographic", dict(a=a, f=f), a, f, None, s)
    if root[0] not in ("PROJCRS", "PROJCS"):
        raise ValueError(f"unsupported WKT2 CRS node: {root[0]}")
    base = _wkt_find(root, "BASEGEOGCRS", "BASEGEODCRS", "GEOGCS")
    if base is None:
        raise ValueError("WKT2 ProjectedCRS without a base geographic CRS")
    a, f = _wkt_ellipsoid(base)
    conv = _wkt_find(root, "CONVERSION", "DERIVINGCONVERSION")
    if conv is not None:
        meth = _wkt_find(conv, "METHOD", "PROJECTION")
        pnodes = _wkt_find_all(conv, "PARAMETER")
    else:  # WKT1 (incl. ESRI): PROJECTION/PARAMETER directly under PROJCS
        meth = _wkt_find(root, "PROJECTION")
        pnodes = _wkt_find_all(root, "PARAMETER")
        # WKT1 parameter values are in the CS-level UNIT — the engines
        # here work in metres, so a foot-based CRS must not be silently
        # misread (ESRI state-plane .prj files are routinely in feet)
        unit = _wkt_find(root, "UNIT")
        if unit is not None:
            uname = str(unit[1][0]).lower()
            ucf = (float(unit[1][1])
                   if len(unit[1]) > 1 and isinstance(unit[1][1], float)
                   else 1.0)
            if uname not in ("metre", "meter") and ucf != 1.0:
                raise ValueError(
                    f"WKT1 projected CRS in non-metre unit {unit[1][0]!r} "
                    "is not supported")
    if meth is None:
        raise ValueError("WKT2 ProjectedCRS without a projection method")
    code = _wkt_epsg_id(meth)
    tag = _PJ_METHODS.get(code) if code else None
    mname = str(meth[1][0]).strip().lower()
    if tag is None:
        tag = _PJ_METHODS.get(mname)
    if tag is None:
        tag = _ESRI_METHODS.get(mname)
    if tag is None:
        raise ValueError(f"unsupported projection method: {meth[1][0]!r}")
    g = {}
    for pn in pnodes:
        pcode = _wkt_epsg_id(pn)
        slot = _PJ_PARAMS.get(pcode) if pcode else None
        if slot is None:
            pname = str(pn[1][0]).strip().lower()
            slot = _PJ_PARAMS.get(pname) or _ESRI_PARAMS.get(pname)
        if slot is None:
            continue
        name, ukind = slot
        g[name] = float(pn[1][1]) * _wkt_unit_factor(pn, ukind)
    tag, g = _resolve_esri_tag(tag, g)
    return _custom_projected(tag, g, a, f, None, s)


# ESRI WKT1 projection / parameter spellings (the dialect written into
# shapefile .prj sidecars by ArcGIS; names from the public ESRI
# projection-engine documentation). Pseudo-tags resolve on parameters in
# _resolve_esri_tag.
_ESRI_METHODS = {
    "transverse_mercator": "tmerc",
    "gauss_kruger": "tmerc",
    "lambert_conformal_conic": "lcc_auto",
    "albers": "aea",
    "lambert_azimuthal_equal_area": "laea",
    "stereographic_north_pole": "polar_north",
    "stereographic_south_pole": "polar_south",
    "mercator": "merc_b",
    "mercator_auxiliary_sphere": "esri_webmerc",
    "cylindrical_equal_area": "cea",
    "equidistant_cylindrical": "eqc",
    "plate_carree": "eqc",
    "mollweide": "moll",
}

_ESRI_PARAMS = {
    "false_easting": ("fe", "length"),
    "false_northing": ("fn", "length"),
    "central_meridian": ("lon0", "angle"),
    "longitude_of_origin": ("lon0", "angle"),
    "latitude_of_origin": ("lat0", "angle"),
    "scale_factor": ("k0", "scale"),
    "standard_parallel_1": ("lat1", "angle"),
    "standard_parallel_2": ("lat2", "angle"),
    "auxiliary_sphere_type": ("aux_type", "scale"),
}


def _resolve_esri_tag(tag, g):
    """Split ESRI's parameter-overloaded method names onto engine tags."""
    if tag == "lcc_auto":
        # one ESRI name covers 1SP and 2SP. Same resolution as the PROJ
        # string front end: the 2SP formula (equal-parallel limit
        # included) honors a distinct Latitude_Of_Origin; a non-unit
        # Scale_Factor only folds into the tangent (1SP) cone.
        if g.get("k0", 1.0) != 1.0:
            if ("lat2" in g and g["lat2"] != g.get("lat1")) or (
                "lat1" in g and "lat0" in g and g["lat1"] != g["lat0"]
            ):
                raise ValueError(
                    "ESRI Lambert_Conformal_Conic with Scale_Factor != 1 "
                    "is only supported on the tangent cone "
                    "(Latitude_Of_Origin == Standard_Parallel_1, no "
                    "distinct Standard_Parallel_2)")
            g = dict(g)
            g["lat0"] = g.get("lat1", g.get("lat0", 0.0))
            return "lcc1", g
        g = dict(g)
        g.setdefault("lat1", g.get("lat0", 0.0))
        g.setdefault("lat2", g["lat1"])
        return "lcc2", g
    if tag in ("polar_north", "polar_south"):
        south = tag == "polar_south"
        g = dict(g)
        lat_ts = g.get("lat1", g.get("lat0", 90.0))
        g["lat_ts"] = -abs(lat_ts) if south else abs(lat_ts)
        return "polar_b", g
    if tag == "esri_webmerc":
        if g.pop("aux_type", 0.0) != 0.0:
            raise ValueError(
                "Mercator_Auxiliary_Sphere with Auxiliary_Sphere_Type != 0 "
                "is not supported")
        g = dict(g)
        g.pop("lat1", None)
        return "webmerc", g
    g.pop("aux_type", None)
    return tag, g


def _wkt_ellipsoid(geog_node):
    datum = _wkt_find(geog_node, "DATUM", "TRF", "ENSEMBLE")
    ell = _wkt_find(datum, "ELLIPSOID", "SPHEROID") if datum else None
    if ell is None:
        raise ValueError("WKT2 CRS carries no ellipsoid")
    pm = _wkt_find(geog_node, "PRIMEM")
    if pm is not None and len(pm[1]) > 1 and isinstance(pm[1][1], float) \
            and pm[1][1] != 0.0:
        # dropping a Paris/Ferro prime meridian would silently shift
        # every longitude — refuse instead
        raise ValueError(
            f"non-Greenwich prime meridian {pm[1][0]!r} is not supported")
    a = float(ell[1][1])
    rf = float(ell[1][2])
    return a, (1.0 / rf if rf else 0.0)
