"""Full PROJJSON / WKT2 *definition* support for ST_Transform
(reproject.rs:105 accepts arbitrary definitions; here the parsed
method + parameters route into the same closed-form engines as the
registered EPSG codes).

Strategy: every custom definition below duplicates the parameters of a
registered EPSG code, so the custom path must agree with the EPSG path —
bit-exactly where the dispatch lands on the identical setup dict, within
1e-6 m otherwise — and every custom CRS must round-trip lon/lat at 1e-9
degrees (the repo-wide projection closure bar)."""

import json

import numpy as np
import pytest

from geoarrow_rs_spark.wkb import proj as P


def _geog(name, a, rf):
    return {
        "type": "GeographicCRS",
        "name": name,
        "datum": {
            "type": "GeodeticReferenceFrame",
            "name": name,
            "ellipsoid": {
                "name": name,
                "semi_major_axis": a,
                "inverse_flattening": rf,
            },
        },
    }


def _prm(code, name, value, unit):
    return {
        "name": name,
        "value": value,
        "unit": unit,
        "id": {"authority": "EPSG", "code": code},
    }


def _projjson(base, method_name, method_code, params):
    return {
        "type": "ProjectedCRS",
        "name": f"custom {method_name}",
        "base_crs": base,
        "conversion": {
            "name": method_name,
            "method": {
                "name": method_name,
                "id": {"authority": "EPSG", "code": method_code},
            },
            "parameters": params,
        },
    }


GRS80 = _geog("GRS 1980", 6378137.0, 298.257222101)
WGS84 = _geog("WGS 84", 6378137.0, 298.257223563)

# custom definition -> (EPSG twin, sample lon range, lat range, tol metres)
# tol 0.0 = bit-exact (dispatch reaches the identical setup dict)
CASES = {
    "tmerc_utm32": (
        _projjson(GRS80, "Transverse Mercator", 9807, [
            _prm(8801, "Latitude of natural origin", 0, "degree"),
            _prm(8802, "Longitude of natural origin", 9, "degree"),
            _prm(8805, "Scale factor at natural origin", 0.9996, "unity"),
            _prm(8806, "False easting", 500000, "metre"),
            _prm(8807, "False northing", 0, "metre"),
        ]),
        25832, (6.0, 12.0), (47.0, 56.0), 0.0,
    ),
    "lcc2sp_lambert93": (
        _projjson(GRS80, "Lambert Conic Conformal (2SP)", 9802, [
            _prm(8821, "Latitude of false origin", 46.5, "degree"),
            _prm(8822, "Longitude of false origin", 3, "degree"),
            _prm(8823, "Latitude of 1st standard parallel", 49, "degree"),
            _prm(8824, "Latitude of 2nd standard parallel", 44, "degree"),
            _prm(8826, "Easting at false origin", 700000, "metre"),
            _prm(8827, "Northing at false origin", 6600000, "metre"),
        ]),
        2154, (-4.5, 7.5), (42.5, 50.5), 1e-6,
    ),
    "aea_conus": (
        _projjson(GRS80, "Albers Equal Area", 9822, [
            _prm(8821, "Latitude of false origin", 23, "degree"),
            _prm(8822, "Longitude of false origin", -96, "degree"),
            _prm(8823, "Latitude of 1st standard parallel", 29.5, "degree"),
            _prm(8824, "Latitude of 2nd standard parallel", 45.5, "degree"),
            _prm(8826, "Easting at false origin", 0, "metre"),
            _prm(8827, "Northing at false origin", 0, "metre"),
        ]),
        5070, (-124.0, -67.0), (25.0, 49.0), 1e-6,
    ),
    "laea_europe": (
        _projjson(GRS80, "Lambert Azimuthal Equal Area", 9820, [
            _prm(8801, "Latitude of natural origin", 52, "degree"),
            _prm(8802, "Longitude of natural origin", 10, "degree"),
            _prm(8806, "False easting", 4321000, "metre"),
            _prm(8807, "False northing", 3210000, "metre"),
        ]),
        3035, (-10.0, 30.0), (35.0, 70.0), 1e-6,
    ),
    "polarb_nsidc_north": (
        _projjson(WGS84, "Polar Stereographic (variant B)", 9829, [
            _prm(8832, "Latitude of standard parallel", 70, "degree"),
            _prm(8833, "Longitude of origin", -45, "degree"),
            _prm(8806, "False easting", 0, "metre"),
            _prm(8807, "False northing", 0, "metre"),
        ]),
        3413, (-180.0, 180.0), (60.0, 89.5), 1e-6,
    ),
    "mercb_world": (
        _projjson(WGS84, "Mercator (variant B)", 9805, [
            _prm(8832, "Latitude of standard parallel", 0, "degree"),
            _prm(8802, "Longitude of natural origin", 0, "degree"),
            _prm(8806, "False easting", 0, "metre"),
            _prm(8807, "False northing", 0, "metre"),
        ]),
        3395, (-179.0, 179.0), (-84.0, 84.0), 1e-6,
    ),
    "cea_easegrid2": (
        _projjson(WGS84, "Lambert Cylindrical Equal Area", 9835, [
            _prm(8823, "Latitude of 1st standard parallel", 30, "degree"),
            _prm(8802, "Longitude of natural origin", 0, "degree"),
            _prm(8806, "False easting", 0, "metre"),
            _prm(8807, "False northing", 0, "metre"),
        ]),
        6933, (-179.0, 179.0), (-85.0, 85.0), 1e-6,
    ),
    "eqc_world": (
        _projjson(WGS84, "Equidistant Cylindrical", 1028, [
            _prm(8823, "Latitude of 1st standard parallel", 0, "degree"),
            _prm(8802, "Longitude of natural origin", 0, "degree"),
            _prm(8806, "False easting", 0, "metre"),
            _prm(8807, "False northing", 0, "metre"),
        ]),
        4087, (-179.0, 179.0), (-85.0, 85.0), 1e-6,
    ),
    "moll_world": (
        _projjson(WGS84, "Mollweide", 0, [
            _prm(8802, "Longitude of natural origin", 0, "degree"),
            _prm(8806, "False easting", 0, "metre"),
            _prm(8807, "False northing", 0, "metre"),
        ]),
        54009, (-179.0, 179.0), (-85.0, 85.0), 1e-6,
    ),
}


def _samples(lon_rng, lat_rng, n=2000, seed=11):
    rng = np.random.default_rng(seed)
    return (
        rng.uniform(lon_rng[0], lon_rng[1], n),
        rng.uniform(lat_rng[0], lat_rng[1], n),
    )


@pytest.mark.parametrize("name", sorted(CASES))
def test_projjson_definition_matches_epsg_twin(name):
    d, epsg, lon_rng, lat_rng, tol = CASES[name]
    crs = P.parse_crs(d)
    assert isinstance(crs, P.CustomCRS), name
    lon, lat = _samples(lon_rng, lat_rng)
    xe, ye = P.transform_xy(lon, lat, 4326, epsg)
    xc, yc = P.transform_xy(lon, lat, 4326, crs)
    if tol == 0.0:
        assert np.array_equal(xe, xc) and np.array_equal(ye, yc), name
    else:
        assert float(np.abs(xe - xc).max()) < tol, name
        assert float(np.abs(ye - yc).max()) < tol, name
    # the JSON *string* form parses to the same CRS
    crs2 = P.parse_crs(json.dumps(d))
    assert crs2 == crs
    # round-trip closure at the repo-wide 1e-9 deg bar (1e-7 for the
    # near-pole stereographic band, where 1e-9 deg of longitude is
    # sub-micrometre)
    rt_tol = 1e-7 if name == "polarb_nsidc_north" else 1e-9
    lo, la = P.transform_xy(xc, yc, crs, 4326)
    # longitude compares modulo 360 (±180 is the same meridian; atan2 may
    # return either branch near the antimeridian)
    dlon = np.abs(lo - lon)
    dlon = np.minimum(dlon, 360.0 - dlon)
    assert float(dlon.max()) < rt_tol, name
    assert float(np.abs(la - lat).max()) < rt_tol, name


def test_boundcrs_helmert_matches_epsg_27700():
    """BoundCRS (projected source + position-vector TOWGS84) == the
    registered OSGB36/BNG path, which applies the same 7-parameter
    Helmert through ECEF — bit-exact."""
    h = P.OSGB36_TO_WGS84
    bound = {
        "type": "BoundCRS",
        "source_crs": _projjson(
            _geog("Airy 1830", 6377563.396, 299.3249646),
            "Transverse Mercator", 9807, [
                _prm(8801, "Latitude of natural origin", 49, "degree"),
                _prm(8802, "Longitude of natural origin", -2, "degree"),
                _prm(8805, "Scale factor at natural origin",
                     0.9996012717, "unity"),
                _prm(8806, "False easting", 400000, "metre"),
                _prm(8807, "False northing", -100000, "metre"),
            ]),
        "target_crs": {"type": "GeographicCRS", "name": "WGS 84",
                       "id": {"authority": "EPSG", "code": 4326}},
        "transformation": {
            "name": "OSGB36 to WGS 84 (9)",
            "method": {
                "name": "Position Vector transformation (geog2D domain)",
                "id": {"authority": "EPSG", "code": 9606},
            },
            "parameters": [
                _prm(8605, "X-axis translation", h[0], "metre"),
                _prm(8606, "Y-axis translation", h[1], "metre"),
                _prm(8607, "Z-axis translation", h[2], "metre"),
                _prm(8608, "X-axis rotation", h[3], "arc-second"),
                _prm(8609, "Y-axis rotation", h[4], "arc-second"),
                _prm(8610, "Z-axis rotation", h[5], "arc-second"),
                _prm(8611, "Scale difference", h[6], "parts per million"),
            ],
        },
    }
    crs = P.parse_crs(bound)
    assert isinstance(crs, P.CustomCRS)
    assert crs.helmert == tuple(h)
    lon, lat = _samples((-5.5, 1.5), (50.2, 57.7), 1000)
    xe, ye = P.transform_xy(lon, lat, 4326, 27700)
    xc, yc = P.transform_xy(lon, lat, 4326, crs)
    assert np.array_equal(xe, xc) and np.array_equal(ye, yc)
    lo, la = P.transform_xy(xc, yc, crs, 4326)
    # mm-scale closure: the h=0 2D Helmert convention couples lon/lat
    # (same bar as the registered 27700 round-trip)
    assert float(np.abs(lo - lon).max()) < 1e-6
    assert float(np.abs(la - lat).max()) < 1e-6


def test_wkt2_full_definition_matches_epsg_twin():
    """A WKT2 PROJCRS with no usable EPSG id parses via its CONVERSION
    node into the same engine as the EPSG twin (Lambert-93 params)."""
    wkt2 = (
        'PROJCRS["custom L93",'
        'BASEGEOGCRS["RGF93",DATUM["RGF93",'
        'ELLIPSOID["GRS 1980",6378137,298.257222101]]],'
        'CONVERSION["Lambert-93",'
        'METHOD["Lambert Conic Conformal (2SP)",ID["EPSG",9802]],'
        'PARAMETER["Latitude of false origin",46.5,'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'PARAMETER["Longitude of false origin",3,'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'PARAMETER["Latitude of 1st standard parallel",49,'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'PARAMETER["Latitude of 2nd standard parallel",44,'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'PARAMETER["Easting at false origin",700000,LENGTHUNIT["metre",1]],'
        'PARAMETER["Northing at false origin",6600000,'
        'LENGTHUNIT["metre",1]]]]'
    )
    crs = P.parse_crs(wkt2)
    assert isinstance(crs, P.CustomCRS) and crs.kind == "conic"
    lon, lat = _samples((-4.5, 7.5), (42.5, 50.5))
    xe, ye = P.transform_xy(lon, lat, 4326, 2154)
    xc, yc = P.transform_xy(lon, lat, 4326, crs)
    assert float(np.abs(xe - xc).max()) < 1e-6
    assert float(np.abs(ye - yc).max()) < 1e-6
    lo, la = P.transform_xy(xc, yc, crs, 4326)
    assert float(np.abs(lo - lon).max()) < 1e-9
    assert float(np.abs(la - lat).max()) < 1e-9


def test_wkt2_tmerc_definition_bit_exact_vs_utm():
    wkt2 = (
        'PROJCRS["custom UTM32",'
        'BASEGEOGCRS["ETRS89",DATUM["ETRS89",'
        'ELLIPSOID["GRS 1980",6378137,298.257222101]]],'
        'CONVERSION["UTM 32N",METHOD["Transverse Mercator",ID["EPSG",9807]],'
        'PARAMETER["Latitude of natural origin",0,'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'PARAMETER["Longitude of natural origin",9,'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'PARAMETER["Scale factor at natural origin",0.9996,'
        'SCALEUNIT["unity",1]],'
        'PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],'
        'PARAMETER["False northing",0,LENGTHUNIT["metre",1]]]]'
    )
    crs = P.parse_crs(wkt2)
    assert isinstance(crs, P.CustomCRS) and crs.kind == "tmerc"
    lon, lat = _samples((6.0, 12.0), (47.0, 56.0))
    xe, ye = P.transform_xy(lon, lat, 4326, 25832)
    xc, yc = P.transform_xy(lon, lat, 4326, crs)
    assert np.array_equal(xe, xc) and np.array_equal(ye, yc)


def test_lcc_1sp_roundtrip():
    """LCC 1SP (EPSG method 9801) has no registered twin — check the
    k0-folding construction by its defining properties: 1e-9 deg
    round-trip and scale k0 at the natural-origin parallel."""
    d = _projjson(GRS80, "Lambert Conic Conformal (1SP)", 9801, [
        _prm(8801, "Latitude of natural origin", 40, "degree"),
        _prm(8802, "Longitude of natural origin", 5, "degree"),
        _prm(8805, "Scale factor at natural origin", 0.9995, "unity"),
        _prm(8806, "False easting", 300000, "metre"),
        _prm(8807, "False northing", 200000, "metre"),
    ])
    crs = P.parse_crs(d)
    assert isinstance(crs, P.CustomCRS) and crs.kind == "conic"
    lon, lat = _samples((-5.0, 15.0), (30.0, 50.0))
    x, y = P.transform_xy(lon, lat, 4326, crs)
    lo, la = P.transform_xy(x, y, crs, 4326)
    assert float(np.abs(lo - lon).max()) < 1e-9
    assert float(np.abs(la - lat).max()) < 1e-9
    # local E-W scale at (5, 40) == k0 * (geodesic-normal radius form).
    # dd=1e-4 deg (~8.5 m) keeps the finite difference well above float64
    # noise on ~3e5 m coordinates while curvature error stays ~1e-12.
    dd = 1e-4
    x0, y0 = P.transform_xy(np.array([5.0]), np.array([40.0]), 4326, crs)
    x1, y1 = P.transform_xy(np.array([5.0 + dd]), np.array([40.0]), 4326, crs)
    e2 = P.GRS80_F * (2 - P.GRS80_F)
    s = np.sin(np.radians(40.0))
    nu = P.GRS80_A / np.sqrt(1 - e2 * s * s)
    ground = np.radians(dd) * nu * np.cos(np.radians(40.0))
    k = float(np.hypot(x1[0] - x0[0], y1[0] - y0[0])) / float(ground)
    assert abs(k - 0.9995) < 1e-9


def test_custom_geographic_and_sphere():
    """A non-WGS84 geographic CRS (no transformation) follows the
    WGS84-coincident convention; a spherical ellipsoid parses via
    'radius'. International 1924 sphere-of-radius example round-trips
    through a projected custom CRS."""
    intl = _geog("International 1924", 6378388.0, 297.0)
    crs = P.parse_crs(intl)
    assert isinstance(crs, P.CustomCRS) and crs.kind == "geographic"
    lon, lat = _samples((-170.0, 170.0), (-80.0, 80.0), 500)
    lo, la = P.transform_xy(lon, lat, 4326, crs)
    # WGS84-coincident convention: geographic custom CRS with no shift is
    # an identity on lon/lat
    assert np.array_equal(lo, lon) and np.array_equal(la, lat)

    sphere = {
        "type": "ProjectedCRS",
        "name": "sphere cea",
        "base_crs": {
            "type": "GeographicCRS",
            "name": "authalic sphere",
            "datum": {
                "type": "GeodeticReferenceFrame",
                "name": "sphere",
                "ellipsoid": {"name": "sphere", "radius": 6371228.0},
            },
        },
        "conversion": {
            "name": "EASE v1",
            "method": {"name": "Lambert Cylindrical Equal Area",
                       "id": {"authority": "EPSG", "code": 9835}},
            "parameters": [
                _prm(8823, "Latitude of 1st standard parallel", 30, "degree"),
                _prm(8802, "Longitude of natural origin", 0, "degree"),
                _prm(8806, "False easting", 0, "metre"),
                _prm(8807, "False northing", 0, "metre"),
            ],
        },
    }
    crs2 = P.parse_crs(sphere)
    assert isinstance(crs2, P.CustomCRS)
    xe, ye = P.transform_xy(lon, lat, 4326, 3410)  # EASE v1 twin
    xc, yc = P.transform_xy(lon, lat, 4326, crs2)
    assert float(np.abs(xe - xc).max()) < 1e-6
    assert float(np.abs(ye - yc).max()) < 1e-6


def test_unsupported_definitions_still_raise():
    with pytest.raises(ValueError):
        P.parse_crs({"type": "GeographicCRS", "name": "no-datum custom"})
    bad = _projjson(GRS80, "Hotine Oblique Mercator (variant A)", 9812, [])
    with pytest.raises(ValueError):
        P.parse_crs(bad)
    with pytest.raises(ValueError):
        P.parse_crs('PROJCRS["mystery",CONVERSION["x"]]')


def test_compound_crs_resolves_horizontal_component():
    """CompoundCRS (horizontal + vertical) resolves its horizontal member
    for 2-D geometry — PROJ's convention for 2-D input. Covered: PROJJSON
    with an EPSG-coded horizontal, PROJJSON with a full-definition
    horizontal, and the WKT2 COMPOUNDCRS node (whose outermost ID is the
    compound's own — unusable — code)."""
    # PROJJSON, horizontal by EPSG id (WGS84 + EGM2008 height = EPSG:9518)
    compound = {
        "type": "CompoundCRS",
        "name": "WGS 84 + EGM2008 height",
        "id": {"authority": "EPSG", "code": 9518},
        "components": [
            {"type": "GeographicCRS", "name": "WGS 84",
             "id": {"authority": "EPSG", "code": 4326}},
            {"type": "VerticalCRS", "name": "EGM2008 height",
             "id": {"authority": "EPSG", "code": 3855}},
        ],
    }
    assert P.parse_crs(compound) == 4326
    # vertical listed first still resolves the horizontal member
    compound["components"].reverse()
    assert P.parse_crs(compound) == 4326

    # PROJJSON, horizontal carried as a full definition (no usable id)
    d, epsg, lon_rng, lat_rng, _ = CASES["tmerc_utm32"]
    nested = {
        "type": "CompoundCRS",
        "name": "custom UTM32 + height",
        "components": [d, {"type": "VerticalCRS", "name": "h"}],
    }
    crs = P.parse_crs(nested)
    assert isinstance(crs, P.CustomCRS)
    lon, lat = _samples(lon_rng, lat_rng)
    xe, ye = P.transform_xy(lon, lat, 4326, epsg)
    xc, yc = P.transform_xy(lon, lat, 4326, crs)
    assert np.array_equal(xe, xc) and np.array_equal(ye, yc)

    # WKT2 COMPOUNDCRS: horizontal member by ID, trailing compound ID
    wkt2 = (
        'COMPOUNDCRS["WGS 84 + EGM2008 height",'
        'GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
        'ELLIPSOID["WGS 84",6378137,298.257223563]],ID["EPSG",4326]],'
        'VERTCRS["EGM2008 height",VDATUM["EGM2008 geoid"],'
        'ID["EPSG",3855]],ID["EPSG",9518]]'
    )
    assert P.parse_crs(wkt2) == 4326

    with pytest.raises(ValueError):
        P.parse_crs({"type": "CompoundCRS", "name": "vertical only",
                     "components": [{"type": "VerticalCRS", "name": "h"}]})


def test_custom_crs_identity_and_grouping():
    """CustomCRS equality/hash key on the definition text — the batch
    kernel's uniform-CRS fast path and transform caches depend on it."""
    d, _, _, _, _ = CASES["tmerc_utm32"]
    c1, c2 = P.parse_crs(d), P.parse_crs(json.dumps(d))
    assert c1 == c2 and hash(c1) == hash(c2)
    other = P.parse_crs(CASES["laea_europe"][0])
    assert c1 != other


# ---------------------------------------------------------------------------
# PROJ strings ('+proj=... +datum=...') — legacy definitions from .prj
# sidecars and user configs, resolved through the same engines
# ---------------------------------------------------------------------------


def test_proj_string_epsg_pivots():
    """WGS84-datum shorthand forms resolve straight to registered codes."""
    assert P.parse_crs("+proj=longlat +datum=WGS84 +no_defs") == 4326
    assert P.parse_crs("+proj=longlat +ellps=WGS84 +no_defs +type=crs") == 4326
    assert P.parse_crs("+proj=utm +zone=32 +datum=WGS84 +units=m +no_defs") == 32632
    assert P.parse_crs("+proj=utm +zone=33 +south +datum=WGS84") == 32733
    assert P.parse_crs("+init=epsg:3857") == 3857
    assert P.parse_crs("+init=EPSG:4326 +no_defs") == 4326


PROJ_STRING_TWINS = {
    # proj string -> (EPSG twin, lon range, lat range, metre tolerance)
    "+proj=utm +zone=32 +ellps=GRS80 +units=m +no_defs": (
        25832, (6.0, 12.0), (38.0, 62.0), 1e-6),
    "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 +x_0=0 +y_0=0 "
    "+ellps=GRS80 +units=m": (5070, (-120.0, -75.0), (25.0, 49.0), 1e-6),
    "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80": (
        3035, (-10.0, 30.0), (35.0, 65.0), 1e-6),
    "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
    "+datum=WGS84 +units=m": (3413, (-180.0, 180.0), (62.0, 88.0), 1e-6),
    "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 "
    "+datum=WGS84": (3031, (-180.0, 180.0), (-88.0, -62.0), 1e-6),
    "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +x_0=700000 "
    "+y_0=6600000 +ellps=GRS80 +units=m +no_defs": (
        2154, (-5.0, 9.0), (41.5, 51.0), 1e-6),
}


@pytest.mark.parametrize("pstr", sorted(PROJ_STRING_TWINS))
def test_proj_string_matches_epsg_twin(pstr):
    epsg, lon_rng, lat_rng, tol = PROJ_STRING_TWINS[pstr]
    crs = P.parse_crs(pstr)
    # GRS80-on-UTM pivots to the registered WGS84 zone code (the
    # ellipsoids differ by ~1e-11 in flattening — sub-micrometre); every
    # other twin resolves to a CustomCRS
    assert isinstance(crs, P.CustomCRS) or P.supported_crs(crs)
    lon, lat = _samples(lon_rng, lat_rng)
    xe, ye = P.transform_xy(lon, lat, 4326, epsg)
    xc, yc = P.transform_xy(lon, lat, 4326, crs)
    assert np.max(np.abs(xe - xc)) <= tol
    assert np.max(np.abs(ye - yc)) <= tol
    # round-trip closure (longitude compared modulo 360: polar grids
    # cover the +-180 seam where both signs name the same meridian)
    lon2, lat2 = P.transform_xy(xc, yc, crs, 4326)
    dlon = np.abs(lon2 - lon)
    dlon = np.minimum(dlon, 360.0 - dlon)
    assert np.max(dlon) <= 1e-9
    assert np.max(np.abs(lat2 - lat)) <= 1e-9


def test_proj_string_towgs84_matches_boundcrs():
    """+towgs84 is the position-vector convention — the same 7 numbers in
    a PROJJSON BoundCRS (position-vector method) must land on the same
    Helmert pipeline."""
    hp = (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)
    pstr = ("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 "
            "+ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7 "
            "+units=m +no_defs")
    crs_p = P.parse_crs(pstr)
    assert isinstance(crs_p, P.CustomCRS)
    assert crs_p.helmert == hp
    crs_d = P.parse_crs("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 "
                        "+y_0=0 +datum=potsdam +units=m")
    lon, lat = _samples((6.0, 12.0), (47.0, 55.0))
    xp, yp = P.transform_xy(lon, lat, 4326, crs_p)
    xd, yd = P.transform_xy(lon, lat, 4326, crs_d)
    assert np.array_equal(xp, xd) and np.array_equal(yp, yd)
    # all-zero towgs84 collapses to the no-transformation convention
    z = P.parse_crs("+proj=longlat +ellps=WGS84 +towgs84=0,0,0")
    assert z == 4326


def test_proj_string_merc_variants_and_sphere():
    """merc splits on k vs lat_ts; webmerc is the registered 3857."""
    ma = P.parse_crs("+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +datum=WGS84")
    mb = P.parse_crs("+proj=merc +lon_0=0 +lat_ts=0 +x_0=0 +y_0=0 "
                     "+datum=WGS84")
    lon, lat = _samples((-170.0, 170.0), (-80.0, 80.0))
    xa, ya = P.transform_xy(lon, lat, 4326, ma)
    xb, yb = P.transform_xy(lon, lat, 4326, mb)
    # k=1 and lat_ts=0 are the same Mercator
    assert np.max(np.abs(xa - xb)) <= 1e-6
    assert np.max(np.abs(ya - yb)) <= 1e-6
    wm = P.parse_crs("+proj=webmerc +datum=WGS84")
    xw, yw = P.transform_xy(lon, lat, 4326, wm)
    xr, yr = P.transform_xy(lon, lat, 4326, 3857)
    assert np.max(np.abs(xw - xr)) <= 1e-6
    assert np.max(np.abs(yw - yr)) <= 1e-6


def test_proj_string_unsupported_forms_raise():
    for bad in (
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53 +ellps=GRS80",
        "+proj=utm +zone=32 +datum=WGS84 +units=us-ft",
        "+proj=longlat +datum=WGS84 +pm=paris",
        "+proj=lcc +lat_1=33 +lat_0=40 +k_0=0.9 +lon_0=-96 +ellps=GRS80",  # k0 off-tangent
        "+proj=stere +lat_0=52 +lon_0=5 +ellps=bessel",  # oblique
        "+proj=tmerc +lat_0=0 +lon_0=9 +ellps=unknown_ellps",
        "+proj=utm +zone=99 +datum=WGS84",
        "+proj=eqc +lat_0=30 +datum=WGS84",
        "+nadgrids=ntv2.gsb +proj=longlat +ellps=clrk66",
        "+proj=utm +zone=10 +datum=NAD27 +axis=neu",
    ):
        with pytest.raises((ValueError, KeyError)):
            P.parse_crs(bad)


def test_proj_string_lcc_degenerate_2sp_honors_lat0():
    """PROJ semantics: lcc with only lat_1 (or lat_1 == lat_2) is the 2SP
    formula in its equal-parallel limit — a distinct lat_0 moves the
    false origin and must NOT be overwritten by the parallel. Twin: the
    same parameters through the PROJJSON 2SP method."""
    pstr = ("+proj=lcc +lat_1=45 +lat_2=45 +lat_0=44 +lon_0=3 "
            "+x_0=700000 +y_0=6600000 +ellps=GRS80")
    crs_p = P.parse_crs(pstr)
    d = {
        "type": "ProjectedCRS", "name": "degenerate 2sp",
        "base_crs": {
            "type": "GeographicCRS", "name": "GRS80",
            "datum": {"type": "GeodeticReferenceFrame", "name": "g",
                      "ellipsoid": {"name": "GRS 1980",
                                    "semi_major_axis": 6378137.0,
                                    "inverse_flattening": 298.257222101}},
        },
        "conversion": {
            "name": "lcc", "method": {
                "name": "Lambert Conic Conformal (2SP)",
                "id": {"authority": "EPSG", "code": 9802}},
            "parameters": [
                {"name": "Latitude of false origin", "value": 44,
                 "unit": "degree", "id": {"authority": "EPSG", "code": 8821}},
                {"name": "Longitude of false origin", "value": 3,
                 "unit": "degree", "id": {"authority": "EPSG", "code": 8822}},
                {"name": "Latitude of 1st standard parallel", "value": 45,
                 "unit": "degree", "id": {"authority": "EPSG", "code": 8823}},
                {"name": "Latitude of 2nd standard parallel", "value": 45,
                 "unit": "degree", "id": {"authority": "EPSG", "code": 8824}},
                {"name": "Easting at false origin", "value": 700000,
                 "unit": "metre", "id": {"authority": "EPSG", "code": 8826}},
                {"name": "Northing at false origin", "value": 6600000,
                 "unit": "metre", "id": {"authority": "EPSG", "code": 8827}},
            ],
        },
    }
    crs_j = P.parse_crs(d)
    lon, lat = _samples((-2.0, 8.0), (41.0, 49.0))
    xp, yp = P.transform_xy(lon, lat, 4326, crs_p)
    xj, yj = P.transform_xy(lon, lat, 4326, crs_j)
    assert np.array_equal(xp, xj) and np.array_equal(yp, yj)
    # and lat_0 genuinely matters: dropping it changes the northing
    crs_n = P.parse_crs(pstr.replace("+lat_0=44 ", "+lat_0=45 "))
    _, y45 = P.transform_xy(lon, lat, 4326, crs_n)
    assert np.max(np.abs(y45 - yp)) > 100000.0  # ~1 degree of meridian


def test_proj_string_nad27_convention():
    """+datum=NAD27 resolves to clrk66 with the documented
    WGS84-coincident convention (the real shift needs grid files)."""
    crs = P.parse_crs("+proj=utm +zone=10 +datum=NAD27 +units=m +no_defs")
    assert isinstance(crs, P.CustomCRS)
    assert crs.helmert is None
    a, f = P._PROJ_ELLPS["clrk66"]
    assert crs.a == a and abs(crs.f - f) < 1e-15


# ---------------------------------------------------------------------------
# ESRI WKT1 — the dialect ArcGIS writes into shapefile .prj sidecars
# ---------------------------------------------------------------------------

_ESRI_GCS = ('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
             '6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],'
             'UNIT["Degree",0.0174532925199433]]')

ESRI_TWINS = {
    # name -> (wkt, EPSG twin, lon range, lat range)
    "utm33n": (
        f'PROJCS["WGS_1984_UTM_Zone_33N",{_ESRI_GCS},'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["False_Easting",500000.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",15.0],'
        'PARAMETER["Scale_Factor",0.9996],'
        'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]',
        32633, (12.0, 18.0), (35.0, 70.0)),
    "webmerc": (
        f'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",{_ESRI_GCS},'
        'PROJECTION["Mercator_Auxiliary_Sphere"],'
        'PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["Standard_Parallel_1",0.0],'
        'PARAMETER["Auxiliary_Sphere_Type",0.0],UNIT["Meter",1.0]]',
        3857, (-179.0, 179.0), (-85.0, 85.0)),
    "polar_north": (
        f'PROJCS["NSIDC_Polar_Stereographic_North",{_ESRI_GCS},'
        'PROJECTION["Stereographic_North_Pole"],'
        'PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",-45.0],'
        'PARAMETER["Standard_Parallel_1",70.0],UNIT["Meter",1.0]]',
        3413, (-180.0, 180.0), (62.0, 88.0)),
    "laea_europe": (
        'PROJCS["ETRS_1989_LAEA",GEOGCS["GCS_ETRS_1989",'
        'DATUM["D_ETRS_1989",SPHEROID["GRS_1980",6378137.0,298.257222101]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Azimuthal_Equal_Area"],'
        'PARAMETER["False_Easting",4321000.0],'
        'PARAMETER["False_Northing",3210000.0],'
        'PARAMETER["Central_Meridian",10.0],'
        'PARAMETER["Latitude_Of_Origin",52.0],UNIT["Meter",1.0]]',
        3035, (-10.0, 30.0), (35.0, 65.0)),
}


def test_esri_wkt1_geogcs_resolves():
    assert P.parse_crs(_ESRI_GCS) == 4326


@pytest.mark.parametrize("name", sorted(ESRI_TWINS))
def test_esri_wkt1_matches_epsg_twin(name):
    wkt, epsg, lon_rng, lat_rng = ESRI_TWINS[name]
    crs = P.parse_crs(wkt)
    assert isinstance(crs, P.CustomCRS)
    lon, lat = _samples(lon_rng, lat_rng)
    xe, ye = P.transform_xy(lon, lat, 4326, epsg)
    xc, yc = P.transform_xy(lon, lat, 4326, crs)
    assert np.max(np.abs(xe - xc)) <= 1e-6
    assert np.max(np.abs(ye - yc)) <= 1e-6


def test_esri_wkt1_lcc_2sp():
    """ESRI uses one Lambert_Conformal_Conic name for 1SP and 2SP; the
    2SP split must reproduce the generic conic engine's numbers for the
    same parameters fed through PROJJSON."""
    wkt = (
        'PROJCS["NAD_1983_StatePlane_California_V",'
        'GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",'
        'SPHEROID["GRS_1980",6378137.0,298.257222101]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic"],'
        'PARAMETER["False_Easting",2000000.0],'
        'PARAMETER["False_Northing",500000.0],'
        'PARAMETER["Central_Meridian",-118.0],'
        'PARAMETER["Standard_Parallel_1",34.0333333],'
        'PARAMETER["Standard_Parallel_2",35.4666667],'
        'PARAMETER["Latitude_Of_Origin",33.5],UNIT["Meter",1.0]]'
    )
    crs = P.parse_crs(wkt)
    assert isinstance(crs, P.CustomCRS) and crs.kind == "conic"
    # closure at the repo bar
    lon, lat = _samples((-121.0, -115.0), (32.5, 36.5))
    x, y = P.transform_xy(lon, lat, 4326, crs)
    lon2, lat2 = P.transform_xy(x, y, crs, 4326)
    assert np.max(np.abs(lon2 - lon)) <= 1e-9
    assert np.max(np.abs(lat2 - lat)) <= 1e-9


def test_esri_wkt1_unsupported_forms_raise():
    foot = ESRI_TWINS["utm33n"][0].replace(
        'UNIT["Meter",1.0]]', 'UNIT["Foot_US",0.3048006096012192]]')
    paris = ('GEOGCS["NTF_Paris",DATUM["D_NTF",SPHEROID["Clarke_1880_IGN",'
             '6378249.2,293.4660212936265]],'
             'PRIMEM["Paris",2.337229166666667],'
             'UNIT["Grad",0.01570796326794897]]')
    aux = ESRI_TWINS["webmerc"][0].replace(
        '"Auxiliary_Sphere_Type",0.0', '"Auxiliary_Sphere_Type",1.0')
    for bad in (foot, paris, aux):
        with pytest.raises(ValueError):
            P.parse_crs(bad)


def test_proj_string_lcc_lat2_only_defaults_lat1_to_zero():
    """PROJ defaults lat_1 to 0 (NOT to lat_0): '+proj=lcc +lat_2=60
    +lat_0=40' means standard parallels (0, 60) with the false origin at
    40 — twin-checked against the PROJJSON 2SP method with those exact
    parameters. And the old behavior (parallels (40, 60)) must measurably
    differ, so a regression cannot hide."""
    pstr = "+proj=lcc +lat_2=60 +lat_0=40 +lon_0=3 +ellps=GRS80"
    crs_p = P.parse_crs(pstr)

    def lcc2_json(lat1, lat2, lat0):
        return {
            "type": "ProjectedCRS", "name": "t",
            "base_crs": {
                "type": "GeographicCRS", "name": "GRS80",
                "datum": {"type": "GeodeticReferenceFrame", "name": "g",
                          "ellipsoid": {"name": "GRS 1980",
                                        "semi_major_axis": 6378137.0,
                                        "inverse_flattening": 298.257222101}},
            },
            "conversion": {
                "name": "lcc", "method": {
                    "name": "Lambert Conic Conformal (2SP)",
                    "id": {"authority": "EPSG", "code": 9802}},
                "parameters": [
                    {"name": "Latitude of false origin", "value": lat0,
                     "unit": "degree",
                     "id": {"authority": "EPSG", "code": 8821}},
                    {"name": "Longitude of false origin", "value": 3,
                     "unit": "degree",
                     "id": {"authority": "EPSG", "code": 8822}},
                    {"name": "Latitude of 1st standard parallel",
                     "value": lat1, "unit": "degree",
                     "id": {"authority": "EPSG", "code": 8823}},
                    {"name": "Latitude of 2nd standard parallel",
                     "value": lat2, "unit": "degree",
                     "id": {"authority": "EPSG", "code": 8824}},
                ],
            },
        }

    lon, lat = _samples((-2.0, 8.0), (35.0, 62.0))
    xp, yp = P.transform_xy(lon, lat, 4326, crs_p)
    xj, yj = P.transform_xy(lon, lat, 4326, P.parse_crs(lcc2_json(0, 60, 40)))
    assert np.array_equal(xp, xj) and np.array_equal(yp, yj)
    xo, _ = P.transform_xy(lon, lat, 4326, P.parse_crs(lcc2_json(40, 60, 40)))
    assert np.max(np.abs(xo - xp)) > 1000.0  # old lat_1=lat_0 reading differs


def test_proj_string_lcc_degenerate_cone_raises():
    """lat_1 + lat_2 == 0 (incl. both absent -> (0, 0)) makes the cone
    constant vanish; PROJ rejects these and so do we."""
    for bad in (
        "+proj=lcc +lat_0=40 +lon_0=3 +ellps=GRS80",          # (0, 0)
        "+proj=lcc +lat_1=30 +lat_2=-30 +lon_0=3 +ellps=GRS80",  # n = 0
    ):
        with pytest.raises(ValueError, match="degenerate"):
            P.parse_crs(bad)
