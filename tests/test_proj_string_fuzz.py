"""Round-trip closure fuzz for the PROJ-string front end: random (but
seeded) parameter draws across every supported projection family must
produce a CRS whose forward+inverse closes at the repo-wide 1e-9 degree
bar on in-domain samples. Catches parameter-slot mix-ups (lat_0 vs
lat_ts, k vs k_0, fe/fn swaps) that EPSG-twin tests can't, because twins
only cover published parameter combinations."""

import numpy as np
import pytest

from geoarrow_rs_spark.wkb import proj as P

RNG = np.random.default_rng(1234)


def _draws(n=6):
    for _ in range(n):
        yield {
            "lat0": float(RNG.uniform(-60, 60)),
            "lon0": float(RNG.uniform(-170, 170)),
            "k0": float(RNG.uniform(0.9994, 1.0004)),
            "fe": float(RNG.integers(0, 10_000_00)),
            "fn": float(RNG.integers(0, 10_000_00)),
            "lat1": float(RNG.uniform(20, 55)),
            "lat2": float(RNG.uniform(20, 55)),
            "lat_ts": float(RNG.uniform(55, 85)),
            "ellps": str(RNG.choice(["WGS84", "GRS80", "intl", "bessel"])),
        }


def _closure(pstr, lon_rng, lat_rng, n=300, tol=1e-9):
    crs = P.parse_crs(pstr)
    lon = RNG.uniform(*lon_rng, n)
    lat = RNG.uniform(*lat_rng, n)
    x, y = P.transform_xy(lon, lat, 4326, crs)
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y)), pstr
    lon2, lat2 = P.transform_xy(x, y, crs, 4326)
    dlon = np.abs(lon2 - lon)
    dlon = np.minimum(dlon, 360.0 - dlon)
    assert float(dlon.max()) <= tol, (pstr, float(dlon.max()))
    assert float(np.abs(lat2 - lat).max()) <= tol, pstr


@pytest.mark.parametrize("d", list(_draws()))
def test_tmerc_closure(d):
    _closure(
        "+proj=tmerc +lat_0={lat0} +lon_0={lon0} +k={k0} +x_0={fe} "
        "+y_0={fn} +ellps={ellps}".format(**d),
        (d["lon0"] - 3, d["lon0"] + 3), (-70.0, 70.0),
    )


@pytest.mark.parametrize("d", list(_draws()))
def test_lcc2_closure(d):
    lo, hi = sorted((d["lat1"], d["lat2"]))
    if hi - lo < 0.5:
        hi = lo + 2.0
    _closure(
        "+proj=lcc +lat_0={lat0} +lon_0={lon0} +lat_1={lo} +lat_2={hi} "
        "+x_0={fe} +y_0={fn} +ellps={ellps}".format(lo=lo, hi=hi, **d),
        (d["lon0"] - 20, d["lon0"] + 20), (lo - 10, hi + 10),
    )


@pytest.mark.parametrize("d", list(_draws()))
def test_aea_closure(d):
    lo, hi = sorted((d["lat1"], d["lat2"]))
    if hi - lo < 0.5:
        hi = lo + 2.0
    _closure(
        "+proj=aea +lat_0={lat0} +lon_0={lon0} +lat_1={lo} +lat_2={hi} "
        "+x_0={fe} +y_0={fn} +ellps={ellps}".format(lo=lo, hi=hi, **d),
        (d["lon0"] - 30, d["lon0"] + 30), (lo - 15, hi + 15),
    )


@pytest.mark.parametrize("d", list(_draws()))
def test_laea_closure(d):
    _closure(
        "+proj=laea +lat_0={lat0} +lon_0={lon0} +x_0={fe} +y_0={fn} "
        "+ellps={ellps}".format(**d),
        (d["lon0"] - 30, d["lon0"] + 30),
        (d["lat0"] - 25, d["lat0"] + 25),
    )


@pytest.mark.parametrize("d", list(_draws()))
def test_polar_stere_closure(d):
    _closure(
        "+proj=stere +lat_0=90 +lat_ts={lat_ts} +lon_0={lon0} +x_0={fe} "
        "+y_0={fn} +ellps={ellps}".format(**d),
        (-180.0, 180.0), (60.0, 89.0),
    )
    _closure(
        "+proj=stere +lat_0=-90 +lat_ts=-{lat_ts} +lon_0={lon0} "
        "+x_0={fe} +y_0={fn} +ellps={ellps}".format(**d),
        (-180.0, 180.0), (-89.0, -60.0),
    )


@pytest.mark.parametrize("d", list(_draws()))
def test_cylindrical_closure(d):
    _closure(
        "+proj=merc +lon_0={lon0} +k={k0} +x_0={fe} +y_0={fn} "
        "+ellps={ellps}".format(**d),
        (d["lon0"] - 160, d["lon0"] + 160), (-80.0, 80.0),
    )
    _closure(
        "+proj=cea +lon_0={lon0} +lat_ts={lat1} +x_0={fe} +y_0={fn} "
        "+ellps={ellps}".format(**d),
        (d["lon0"] - 160, d["lon0"] + 160), (-80.0, 80.0),
    )
    _closure(
        "+proj=eqc +lon_0={lon0} +lat_ts={lat1} +x_0={fe} +y_0={fn} "
        "+ellps={ellps}".format(**d),
        (d["lon0"] - 160, d["lon0"] + 160), (-80.0, 80.0),
    )


def test_utm_matches_family():
    """+proj=utm equals +proj=tmerc with the zone's derived parameters on
    the same ellipsoid (the UTM shorthand must not drift from tmerc)."""
    for zone, south, ellps in ((7, False, "intl"), (33, True, "bessel")):
        u = P.parse_crs(f"+proj=utm +zone={zone} "
                        f"{'+south ' if south else ''}+ellps={ellps}")
        t = P.parse_crs(
            f"+proj=tmerc +lat_0=0 +lon_0={zone * 6 - 183} +k=0.9996 "
            f"+x_0=500000 +y_0={10000000 if south else 0} +ellps={ellps}")
        lon = RNG.uniform(zone * 6 - 186, zone * 6 - 180, 200)
        lat = RNG.uniform(-75, -5, 200) if south else RNG.uniform(5, 75, 200)
        xu, yu = P.transform_xy(lon, lat, 4326, u)
        xt, yt = P.transform_xy(lon, lat, 4326, t)
        assert np.array_equal(xu, xt) and np.array_equal(yu, yt)
