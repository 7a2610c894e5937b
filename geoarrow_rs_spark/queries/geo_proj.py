"""geo projection + spherical-edges catalog entries (split from geo.py)."""

from ._shared import *  # noqa: F401,F403
from ._shared import (  # noqa: F401
    _BM25_K1P1,
    _BM25_TERMS,
    _GRAM8_SQL,
    _NG3,
    _NS_GAP,
    _NS_HOUR,
    _banded_block,
    _hits_sql,
    _luhn_sql,
    _minhash_pairs_cte,
    _money_sum,
    _money_sum_sql,
    _spread,
    _t,
)
def geo_transform(spark, sf_dir):
    """CRS reprojection (ST_Transform; reproject.rs:105 parity): 4326->3857
    verified against the closed-form Web Mercator in plain SQL, plus a UTM
    round-trip (4326->32631->4326) which the oracle can mirror as identity."""
    c = _t(spark, sf_dir, "customer")
    lon = "CAST(c_custkey % 360 AS DOUBLE) - 179.5"
    lat = "CAST(c_custkey % 170 AS DOUBLE) - 84.5"
    lon_u = "CAST(c_custkey % 600 AS DOUBLE) / 100.0"
    lat_u = "CAST(c_custkey % 1600 AS DOUBLE) / 10.0 - 80.0"
    return c.selectExpr(
        "c_custkey",
        f"round(ST_X(ST_Transform(ST_Point({lon}, {lat}), 'EPSG:4326', 'EPSG:3857')), 4) AS merc_x",
        f"round(ST_Y(ST_Transform(ST_Point({lon}, {lat}), 'EPSG:4326', 'EPSG:3857')), 4) AS merc_y",
        f"round(ST_X(ST_Transform(ST_Transform(ST_Point({lon_u}, {lat_u}), 'EPSG:4326', 'EPSG:32631'), 'EPSG:32631', 'EPSG:4326')), 6) AS utm_rt_lon",
        f"round(ST_Y(ST_Transform(ST_Transform(ST_Point({lon_u}, {lat_u}), 'EPSG:4326', 'EPSG:32631'), 'EPSG:32631', 'EPSG:4326')), 6) AS utm_rt_lat",
    )


def geo_transform_conic(spark, sf_dir):
    """Conic reprojection (ST_Transform): Albers equal-area (EPSG:5070,
    CONUS) and Lambert conformal conic 2SP (EPSG:2154, Lambert-93) —
    forward checked against the full Snyder closed forms restated in plain
    SQL (projection constants n/C/F/rho0 precomputed once and inlined as
    literals in both engines), inverse checked as a round trip."""
    c = _t(spark, sf_dir, "customer")
    lon_a = "CAST(c_custkey % 45 AS DOUBLE) - 120.0"
    lat_a = "CAST(c_custkey % 24 AS DOUBLE) + 25.5"
    lon_l = "CAST(c_custkey % 15 AS DOUBLE) * 0.5 - 4.0"
    lat_l = "CAST(c_custkey % 19 AS DOUBLE) * 0.5 + 41.5"
    # fused composite (r8): forward + inverse round trip in ONE kernel call
    # per CRS (ST_TransformRoundtripXY delegates to the same k_point /
    # k_transform / k_x / k_y sequence) — 1 ArrowEvalPython node instead of
    # the former 3-level point->transform->accessor chain
    aea = f"ST_TransformRoundtripXY({lon_a}, {lat_a}, 'EPSG:4326', 'EPSG:5070')"
    lcc = f"ST_TransformRoundtripXY({lon_l}, {lat_l}, 'EPSG:4326', 'EPSG:2154')"
    return c.selectExpr(
        "c_custkey",
        f"round({aea}.fx, 2) AS aea_x",
        f"round({aea}.fy, 2) AS aea_y",
        f"round({lcc}.fx, 2) AS lcc_x",
        f"round({lcc}.fy, 2) AS lcc_y",
        f"round({aea}.ix, 6) AS aea_rt_lon",
        f"round({lcc}.iy, 6) AS lcc_rt_lat",
    )


def _conic_oracle_sql() -> str:
    from ..wkb import proj

    A = proj.CONICS[5070]
    L = proj.CONICS[2154]

    def d(v):
        # decimal-point literals parse as DECIMAL in duckdb and overflow in
        # products; force every projection constant to DOUBLE
        return f"CAST({float(v)!r} AS DOUBLE)"

    qa = (
        f"(1.0 - {d(A['e2'])}) * (sin(radians(lat_a)) / (1.0 - {d(A['e2'])} * "
        f"sin(radians(lat_a)) * sin(radians(lat_a))) - ln((1.0 - {d(A['e'])} * "
        f"sin(radians(lat_a))) / (1.0 + {d(A['e'])} * sin(radians(lat_a)))) / "
        f"(2.0 * {d(A['e'])}))"
    )
    rho_a = f"({d(A['a'])} * sqrt({d(A['C'])} - {d(A['n'])} * {qa}) / {d(A['n'])})"
    th_a = f"({d(A['n'])} * radians(lon_a - ({d(A['lon0'])})))"
    tl = (
        f"(tan(pi() / 4.0 - radians(lat_l) / 2.0) / power((1.0 - {d(L['e'])} * "
        f"sin(radians(lat_l))) / (1.0 + {d(L['e'])} * sin(radians(lat_l))), "
        f"{d(L['e'])} / 2.0))"
    )
    rho_l = f"({d(L['a'])} * {d(L['F'])} * power({tl}, {d(L['n'])}))"
    th_l = f"({d(L['n'])} * radians(lon_l - ({d(L['lon0'])})))"
    return f"""
SELECT c_custkey,
       round({rho_a} * sin({th_a}), 2) AS aea_x,
       round({d(A['rho0'])} - {rho_a} * cos({th_a}), 2) AS aea_y,
       round({d(L['fe'])} + {rho_l} * sin({th_l}), 2) AS lcc_x,
       round({d(L['fn'])} + {d(L['rho0'])} - {rho_l} * cos({th_l}), 2) AS lcc_y,
       round(lon_a, 6) AS aea_rt_lon,
       round(lat_l, 6) AS lcc_rt_lat
FROM (
  SELECT c_custkey,
         CAST(c_custkey % 45 AS DOUBLE) - 120.0 AS lon_a,
         CAST(c_custkey % 24 AS DOUBLE) + 25.5 AS lat_a,
         CAST(c_custkey % 15 AS DOUBLE) * 0.5 - 4.0 AS lon_l,
         CAST(c_custkey % 19 AS DOUBLE) * 0.5 + 41.5 AS lat_l
  FROM customer
)
"""


ORACLE_GEO_TRANSFORM_CONIC = _conic_oracle_sql()


def geo_transform_laea(spark, sf_dir):
    """Azimuthal reprojection (ST_Transform): Lambert azimuthal equal-area
    (EPSG:3035, LAEA Europe) and polar stereographic variant B (EPSG:3413,
    NSIDC Arctic) — forward checked against the Snyder closed forms
    restated in plain SQL (projection constants qp/beta0/Rq/D resp. tc/mc
    precomputed once and inlined as literals in both engines), inverse
    checked as a round trip. Completes the reference's geodesy surface
    (reproject.rs:105) for the equal-area-grid and polar-science CRSs."""
    c = _t(spark, sf_dir, "customer")
    lon_e = "CAST(c_custkey % 45 AS DOUBLE) - 10.0"
    lat_e = "CAST(c_custkey % 35 AS DOUBLE) + 35.0"
    lon_p = "CAST(c_custkey % 360 AS DOUBLE) - 179.5"
    lat_p = "CAST(c_custkey % 29 AS DOUBLE) + 60.5"
    laea = f"ST_Transform(ST_Point({lon_e}, {lat_e}), 'EPSG:4326', 'EPSG:3035')"
    ps = f"ST_Transform(ST_Point({lon_p}, {lat_p}), 'EPSG:4326', 'EPSG:3413')"
    return c.selectExpr(
        "c_custkey",
        f"round(ST_X({laea}), 2) AS laea_x",
        f"round(ST_Y({laea}), 2) AS laea_y",
        f"round(ST_X({ps}), 2) AS ps_x",
        f"round(ST_Y({ps}), 2) AS ps_y",
        f"round(ST_X(ST_Transform({laea}, 'EPSG:3035', 'EPSG:4326')), 6) AS laea_rt_lon",
        f"round(ST_Y(ST_Transform({ps}, 'EPSG:3413', 'EPSG:4326')), 6) AS ps_rt_lat",
    )


def _laea_oracle_sql() -> str:
    import numpy as np

    from ..wkb import proj

    E = proj.LAEA[3035]
    P = proj.POLAR[3413]

    def d(v):
        return f"CAST({float(v)!r} AS DOUBLE)"

    qe = (
        f"((1.0 - {d(E['e2'])}) * (sin(radians(lat_e)) / (1.0 - {d(E['e2'])} * "
        f"sin(radians(lat_e)) * sin(radians(lat_e))) - ln((1.0 - {d(E['e'])} * "
        f"sin(radians(lat_e))) / (1.0 + {d(E['e'])} * sin(radians(lat_e)))) / "
        f"(2.0 * {d(E['e'])})))"
    )
    beta = f"asin({qe} / {d(E['qp'])})"
    lam_e = f"radians(lon_e - {d(E['lon0'])})"
    bb = (
        f"({d(E['Rq'])} * sqrt(2.0 / (1.0 + {d(np.sin(E['beta0']))} * sin({beta})"
        f" + {d(np.cos(E['beta0']))} * cos({beta}) * cos({lam_e}))))"
    )
    tp = (
        f"(tan(pi() / 4.0 - radians(lat_p) / 2.0) / power((1.0 - {d(P['e'])} * "
        f"sin(radians(lat_p))) / (1.0 + {d(P['e'])} * sin(radians(lat_p))), "
        f"{d(P['e'])} / 2.0))"
    )
    rho_p = f"({d(P['a'])} * {d(P['mc'])} * {tp} / {d(P['tc'])})"
    lam_p = f"radians(lon_p - ({d(P['lon0'])}))"
    return f"""
SELECT c_custkey,
       round({d(E['fe'])} + {bb} * {d(E['D'])} * cos({beta}) * sin({lam_e}), 2) AS laea_x,
       round({d(E['fn'])} + ({bb} / {d(E['D'])}) * ({d(np.cos(E['beta0']))} * sin({beta})
             - {d(np.sin(E['beta0']))} * cos({beta}) * cos({lam_e})), 2) AS laea_y,
       round({rho_p} * sin({lam_p}), 2) AS ps_x,
       round(-{rho_p} * cos({lam_p}), 2) AS ps_y,
       round(lon_e, 6) AS laea_rt_lon,
       round(lat_p, 6) AS ps_rt_lat
FROM (
  SELECT c_custkey,
         CAST(c_custkey % 45 AS DOUBLE) - 10.0 AS lon_e,
         CAST(c_custkey % 35 AS DOUBLE) + 35.0 AS lat_e,
         CAST(c_custkey % 360 AS DOUBLE) - 179.5 AS lon_p,
         CAST(c_custkey % 29 AS DOUBLE) + 60.5 AS lat_p
  FROM customer
)
"""


ORACLE_GEO_TRANSFORM_LAEA = _laea_oracle_sql()


def geo_transform_tmerc(spark, sf_dir):
    """National transverse-Mercator grids (ST_Transform; reproject.rs:105
    parity for the highest-traffic non-UTM EPSG codes): ETRS89 / UTM 32N
    (EPSG:25832) and GDA94 / MGA zone 55 (EPSG:28355) forwards are checked
    against the full Karney order-n^6 series restated in plain SQL (series
    coefficients precomputed once and inlined as literals in both engines);
    OSGB36 / British National Grid (EPSG:27700, Airy ellipsoid + Helmert
    datum shift) and EPSG:25832 are checked as round-trip closure BOOLEANS
    (thresholds 1e-6 / 1e-9 deg; booleans rather than rounded identities so
    mm-scale h=0 Helmert coupling can't sit on a rounding boundary). The
    27700 absolute forward is anchored to the Ordnance Survey worked
    example in tests/test_geodesic.py."""
    c = _t(spark, sf_dir, "customer")
    lon32 = "(6.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0)"
    lat32 = "(47.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0)"
    lon55 = "(144.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0)"
    lat55 = "(-44.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0)"
    lonuk = "(-5.5 + CAST(c_custkey % 70 AS DOUBLE) / 10.0)"
    latuk = "(50.2 + CAST(c_custkey % 75 AS DOUBLE) / 10.0)"
    staged = c.selectExpr(
        "c_custkey",
        f"{lon32} AS lon32", f"{lat32} AS lat32",
        f"{lon55} AS lon55", f"{lat55} AS lat55",
        f"{lonuk} AS lonuk", f"{latuk} AS latuk",
        f"ST_Transform(ST_Point({lon32}, {lat32}), 'EPSG:4326', 'EPSG:25832') AS p32",
        f"ST_Transform(ST_Point({lon55}, {lat55}), 'EPSG:4326', 'EPSG:28355') AS p55",
        f"ST_Transform(ST_Point({lonuk}, {latuk}), 'EPSG:4326', 'EPSG:27700') AS puk",
    )
    return staged.selectExpr(
        "c_custkey",
        "round(ST_X(p32), 2) AS utm32_e",
        "round(ST_Y(p32), 2) AS utm32_n",
        "round(ST_X(p55), 2) AS mga55_e",
        "round(ST_Y(p55), 2) AS mga55_n",
        "abs(ST_X(ST_Transform(p32, 'EPSG:25832', 'EPSG:4326')) - lon32) < 1e-9"
        " AND abs(ST_Y(ST_Transform(p32, 'EPSG:25832', 'EPSG:4326')) - lat32) < 1e-9"
        " AS etrs_rt_ok",
        "abs(ST_X(ST_Transform(puk, 'EPSG:27700', 'EPSG:4326')) - lonuk) < 1e-6"
        " AND abs(ST_Y(ST_Transform(puk, 'EPSG:27700', 'EPSG:4326')) - latuk) < 1e-6"
        " AS bng_rt_ok",
    )


def _tmerc_oracle_sql() -> str:
    """Karney order-n^6 transverse-Mercator forward restated in DuckDB SQL
    (hyperbolics spelled out via exp/ln; series coefficients inlined as
    double literals), once per zone."""
    from ..wkb import proj

    ell = proj.ellipsoid_consts(proj.GRS80_A, proj.GRS80_F)

    def d(v):
        return f"CAST({float(v)!r} AS DOUBLE)"

    e = d(ell["e"])
    k0a = d(0.9996 * ell["a_rect"])

    def zone_cols(sfx, lon0, fe, fn, e_alias, n_alias):
        s = f"sin(radians(lat{sfx}))"
        lam = f"radians(lon{sfx} - ({d(lon0)}))"
        u = (
            f"(0.5 * ln((1.0 + {s}) / (1.0 - {s}))"
            f" - {e} * 0.5 * ln((1.0 + {e} * {s}) / (1.0 - {e} * {s})))"
        )
        t = f"((exp({u}) - exp(-{u})) / 2.0)"
        xip = f"atan2(tt{sfx}, cos(lam{sfx}))"
        w = f"(sin(lam{sfx}) / sqrt(tt{sfx} * tt{sfx} + cos(lam{sfx}) * cos(lam{sfx})))"
        etap = f"ln({w} + sqrt({w} * {w} + 1.0))"
        xi_terms = " + ".join(
            f"{d(ell['alpha'][j])} * sin({2 * (j + 1)}.0 * xip{sfx})"
            f" * (exp({2 * (j + 1)}.0 * etap{sfx}) + exp(-{2 * (j + 1)}.0 * etap{sfx})) / 2.0"
            for j in range(6)
        )
        eta_terms = " + ".join(
            f"{d(ell['alpha'][j])} * cos({2 * (j + 1)}.0 * xip{sfx})"
            f" * (exp({2 * (j + 1)}.0 * etap{sfx}) - exp(-{2 * (j + 1)}.0 * etap{sfx})) / 2.0"
            for j in range(6)
        )
        stage1 = f"{lam} AS lam{sfx}, {t} AS tt{sfx}"
        stage2 = f"{xip} AS xip{sfx}, {etap} AS etap{sfx}"
        final = (
            f"round({d(fe)} + {k0a} * (etap{sfx} + {eta_terms}), 2) AS {e_alias},\n"
            f"       round({d(fn)} + {k0a} * (xip{sfx} + {xi_terms}), 2) AS {n_alias}"
        )
        return stage1, stage2, final

    s1_32, s2_32, f_32 = zone_cols("32", 9.0, 500_000.0, 0.0, "utm32_e", "utm32_n")
    s1_55, s2_55, f_55 = zone_cols("55", 147.0, 500_000.0, 10_000_000.0,
                                   "mga55_e", "mga55_n")
    return f"""
SELECT c_custkey,
       {f_32},
       {f_55},
       TRUE AS etrs_rt_ok,
       TRUE AS bng_rt_ok
FROM (
  SELECT c_custkey, {s2_32}, {s2_55}
  FROM (
    SELECT c_custkey, {s1_32}, {s1_55}
    FROM (
      SELECT c_custkey,
             6.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0 AS lon32,
             47.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0 AS lat32,
             144.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0 AS lon55,
             -44.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0 AS lat55
      FROM customer
    )
  )
)
"""


ORACLE_GEO_TRANSFORM_TMERC = _tmerc_oracle_sql()


def geo_transform_cyl(spark, sf_dir):
    """World cylindrical projections (ST_Transform; reproject.rs:105 parity
    for the global-analysis CRSs): World Mercator (EPSG:3395, ellipsoidal),
    EASE-Grid 2.0 cylindrical equal-area (EPSG:6933), and World Equidistant
    Cylindrical (EPSG:4087, true meridian arc) forwards are checked against
    the Snyder/Karney closed forms restated in plain SQL; Mollweide
    (ESRI:54009, Newton iteration — not SQL-expressible directly) is
    checked as a round-trip closure boolean, and the ETRS89 geographic
    alias (EPSG:4258 == WGS84 pivot) end-to-end through ST_Transform."""
    c = _t(spark, sf_dir, "customer")
    lon = "(CAST(c_custkey % 360 AS DOUBLE) - 179.5)"
    lat = "(CAST(c_custkey % 170 AS DOUBLE) - 84.5)"
    # fused composites (r8): every projection runs as ONE worker-side kernel
    # call over the native lon/lat columns (ST_TransformXY /
    # ST_TransformRoundtripXY delegate to the identical k_point+k_transform+
    # accessor sequence) — the plan is 1 ArrowEvalPython node with 5 call
    # slots instead of the former 3-level chain
    staged = c.selectExpr(
        "c_custkey",
        f"{lon} AS lon", f"{lat} AS lat",
        f"ST_TransformXY({lon}, {lat}, 'EPSG:4326', 'EPSG:3395') AS tm",
        f"ST_TransformXY({lon}, {lat}, 'EPSG:4326', 'EPSG:6933') AS tc",
        f"ST_TransformXY({lon}, {lat}, 'EPSG:4326', 'EPSG:4087') AS te",
        f"ST_TransformRoundtripXY({lon}, {lat}, 'EPSG:4326', 'ESRI:54009') AS tw",
        f"ST_TransformXY({lon}, {lat}, 'EPSG:4258', 'EPSG:3395') AS ta",
    )
    return staged.selectExpr(
        "c_custkey",
        "round(tm.x, 2) AS merc_x",
        "round(tm.y, 2) AS merc_y",
        "round(tc.x, 2) AS cea_x",
        "round(tc.y, 2) AS cea_y",
        "round(te.y, 2) AS eqc_y",
        "abs(tw.ix - lon) < 1e-9 AND abs(tw.iy - lat) < 1e-9 AS moll_rt_ok",
        "ta.x = tm.x AS alias_ok",
    )


def _cyl_oracle_sql() -> str:
    """World Mercator / cylindrical equal-area / equidistant-cylindrical
    forwards restated in DuckDB SQL (hyperbolics via exp/ln; ellipsoid and
    series constants inlined as double literals)."""
    from ..wkb import proj

    ell = proj.ellipsoid_consts(proj.WGS84_A, proj.WGS84_F)

    def d(v):
        return f"CAST({float(v)!r} AS DOUBLE)"

    a = d(proj.WGS84_A)
    e = d(ell["e"])
    e2 = d(ell["e2"])
    k0 = d(proj.CYL[6933]["k0"])
    a_rect = d(ell["a_rect"])

    s = "sin(radians(lat))"
    lam = "radians(lon)"
    # isometric latitude psi = atanh(sin) - e*atanh(e*sin), as ln
    psi = (
        f"(0.5 * ln((1.0 + {s}) / (1.0 - {s}))"
        f" - {e} * 0.5 * ln((1.0 + {e} * {s}) / (1.0 - {e} * {s})))"
    )
    # authalic q (same expression order as wkb.proj._laea_q)
    q = (
        f"((1.0 - {e2}) * ({s} / (1.0 - {e2} * {s} * {s})"
        f" - ln((1.0 - {e} * {s}) / (1.0 + {e} * {s})) / (2.0 * {e})))"
    )
    # rectifying latitude: xi = xi' + sum(alpha_j sin(2j xi')),
    # xi' = atan(sinh(psi)) — the tm series at eta = 0
    xi_terms = " + ".join(
        f"{d(ell['alpha'][j])} * sin({2 * (j + 1)}.0 * xip)" for j in range(6)
    )
    return f"""
SELECT c_custkey,
       round({a} * lam, 2) AS merc_x,
       round({a} * psi, 2) AS merc_y,
       round({a} * {k0} * lam, 2) AS cea_x,
       round({a} * q / (2.0 * {k0}), 2) AS cea_y,
       round({a_rect} * (xip + {xi_terms}), 2) AS eqc_y,
       TRUE AS moll_rt_ok,
       TRUE AS alias_ok
FROM (
  SELECT c_custkey, lam, psi, q,
         atan((exp(psi) - exp(-psi)) / 2.0) AS xip
  FROM (
    SELECT c_custkey, {lam} AS lam, {psi} AS psi, {q} AS q
    FROM (
      SELECT c_custkey,
             CAST(c_custkey % 360 AS DOUBLE) - 179.5 AS lon,
             CAST(c_custkey % 170 AS DOUBLE) - 84.5 AS lat
      FROM customer
    )
  )
)
"""


ORACLE_GEO_TRANSFORM_CYL = _cyl_oracle_sql()


def _projjson_utm32() -> str:
    """Full PROJJSON definition duplicating EPSG:25832's parameters (the
    custom dispatch lands on the identical tmerc setup dict, so the path is
    bit-exact vs the registered code — pinned in tests/test_custom_crs.py)."""
    import json as _json

    def prm(code, name, value, unit):
        return {"name": name, "value": value, "unit": unit,
                "id": {"authority": "EPSG", "code": code}}

    return _json.dumps({
        "type": "ProjectedCRS",
        "name": "custom UTM 32N twin",
        "base_crs": {
            "type": "GeographicCRS",
            "name": "ETRS89",
            "datum": {
                "type": "GeodeticReferenceFrame",
                "name": "ETRS89",
                "ellipsoid": {"name": "GRS 1980",
                              "semi_major_axis": 6378137.0,
                              "inverse_flattening": 298.257222101},
            },
        },
        "conversion": {
            "name": "UTM zone 32N",
            "method": {"name": "Transverse Mercator",
                       "id": {"authority": "EPSG", "code": 9807}},
            "parameters": [
                prm(8801, "Latitude of natural origin", 0, "degree"),
                prm(8802, "Longitude of natural origin", 9, "degree"),
                prm(8805, "Scale factor at natural origin", 0.9996, "unity"),
                prm(8806, "False easting", 500000, "metre"),
                prm(8807, "False northing", 0, "metre"),
            ],
        },
    })


_WKT2_UTM32 = (
    'PROJCRS["custom UTM32 twin",'
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


def geo_transform_projjson(spark, sf_dir):
    """ST_Transform with full PROJJSON / WKT2 *definitions* as the CRS
    argument (reproject.rs:105 accepts arbitrary definitions, not just
    registered codes; dispatch in wkb/proj.py parse_crs →
    CustomCRS). A PROJJSON twin of EPSG:25832 produces the absolute UTM
    eastings/northings (oracle: the Karney order-n^6 series restated in
    plain SQL — the custom dispatch lands on the identical setup dict as
    the registered code, so values are bit-equal); the WKT2 spelling of
    the same definition must agree bit-exactly with the PROJJSON one; and
    the custom CRS must round-trip closure at 1e-9 deg."""
    c = _t(spark, sf_dir, "customer")
    pj = _projjson_utm32()
    wkt2 = _WKT2_UTM32
    lon32 = "(6.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0)"
    lat32 = "(47.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0)"
    staged = c.selectExpr(
        "c_custkey",
        f"{lon32} AS lon32", f"{lat32} AS lat32",
        f"ST_Transform(ST_Point({lon32}, {lat32}), 'EPSG:4326', '{pj}') AS pj",
        f"ST_Transform(ST_Point({lon32}, {lat32}), 'EPSG:4326', '{wkt2}') AS pw",
    )
    return staged.selectExpr(
        "c_custkey",
        "round(ST_X(pj), 2) AS utm32_e",
        "round(ST_Y(pj), 2) AS utm32_n",
        "ST_X(pw) = ST_X(pj) AND ST_Y(pw) = ST_Y(pj) AS wkt2_json_agree",
        f"abs(ST_X(ST_Transform(pj, '{pj}', 'EPSG:4326')) - lon32) < 1e-9"
        f" AND abs(ST_Y(ST_Transform(pj, '{pj}', 'EPSG:4326')) - lat32) < 1e-9"
        " AS custom_rt_ok",
    )


def _projjson_oracle_sql() -> str:
    """Karney order-n^6 transverse-Mercator forward for UTM zone 32N in
    DuckDB SQL — the same series as _tmerc_oracle_sql, single zone; the
    definition-equivalence and closure checks mirror as TRUE."""
    from ..wkb import proj

    ell = proj.ellipsoid_consts(proj.GRS80_A, proj.GRS80_F)

    def d(v):
        return f"CAST({float(v)!r} AS DOUBLE)"

    e = d(ell["e"])
    k0a = d(0.9996 * ell["a_rect"])
    s = "sin(radians(lat32))"
    lam = "radians(lon32 - (" + d(9.0) + "))"
    u = (
        f"(0.5 * ln((1.0 + {s}) / (1.0 - {s}))"
        f" - {e} * 0.5 * ln((1.0 + {e} * {s}) / (1.0 - {e} * {s})))"
    )
    t = "((exp(u32) - exp(-u32)) / 2.0)"
    xip = "atan2(tt32, cos(lam32))"
    w = "(sin(lam32) / sqrt(tt32 * tt32 + cos(lam32) * cos(lam32)))"
    etap = f"ln({w} + sqrt({w} * {w} + 1.0))"
    xi_terms = " + ".join(
        f"{d(ell['alpha'][j])} * sin({2 * (j + 1)}.0 * xip32)"
        f" * (exp({2 * (j + 1)}.0 * etap32) + exp(-{2 * (j + 1)}.0 * etap32)) / 2.0"
        for j in range(6)
    )
    eta_terms = " + ".join(
        f"{d(ell['alpha'][j])} * cos({2 * (j + 1)}.0 * xip32)"
        f" * (exp({2 * (j + 1)}.0 * etap32) - exp(-{2 * (j + 1)}.0 * etap32)) / 2.0"
        for j in range(6)
    )
    return f"""
SELECT c_custkey,
       round(500000.0 + {k0a} * (etap32 + {eta_terms}), 2) AS utm32_e,
       round(0.0 + {k0a} * (xip32 + {xi_terms}), 2) AS utm32_n,
       TRUE AS wkt2_json_agree,
       TRUE AS custom_rt_ok
FROM (
  SELECT c_custkey, {xip} AS xip32, {etap} AS etap32
  FROM (
    SELECT c_custkey, lam32, {t} AS tt32
    FROM (
      SELECT c_custkey, {lam} AS lam32, {u} AS u32
      FROM (
        SELECT c_custkey,
               6.0 + CAST(c_custkey % 60 AS DOUBLE) / 10.0 AS lon32,
               47.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0 AS lat32
        FROM customer
      )
    )
  )
)
"""


ORACLE_GEO_TRANSFORM_PROJJSON = _projjson_oracle_sql()


# Spherical-edges predicates (wkb/spherical.py; edges.rs:35-60 semantics):
# per-row parameterized segment pairs in the two regimes where plate-carrée
# and great-circle ST_Intersects genuinely disagree — antimeridian
# crossings and the poleward bulge of long east-west arcs.
_SPH_PARAMS = {
    # antimeridian pair: arc p (crosses ±180) vs meridian segment q
    "am_p1lon": "(165.0 + CAST(c_custkey % 10 AS DOUBLE))",
    "am_p1lat": "(-20.0 + CAST(c_custkey % 9 AS DOUBLE) * 5.0)",
    "am_p2lon": "(-165.0 - CAST(c_custkey % 8 AS DOUBLE))",
    "am_p2lat": "(25.0 - CAST(c_custkey % 7 AS DOUBLE) * 6.0)",
    # fractional offsets keep the meridian off the arc's integer lattice:
    # exact endpoint-on-segment tangencies would make the kernel (touch =
    # intersect) and the strict-straddle oracle disagree
    "am_qlon": "(-40.7 + CAST(c_custkey % 16 AS DOUBLE) * 14.0)",
    "am_q1lat": "(-35.3 + CAST(c_custkey % 12 AS DOUBLE) * 5.0)",
    "am_q2lat": "(-23.3 + CAST(c_custkey % 12 AS DOUBLE) * 5.0"
    " + CAST(c_custkey % 5 AS DOUBLE) * 8.0)",
    # bulge pair: east-west arc p at constant latitude vs meridian segment q
    "bu_p1lon": "(-50.0 - CAST(c_custkey % 6 AS DOUBLE) * 5.0)",
    "bu_plat": "(40.0 + CAST(c_custkey % 5 AS DOUBLE) * 3.0)",
    "bu_p2lon": "(50.0 + CAST(c_custkey % 7 AS DOUBLE) * 5.0)",
    "bu_qlon": "(-10.0 + CAST(c_custkey % 8 AS DOUBLE) * 4.0)",
    "bu_q1lat": "(41.0 + CAST(c_custkey % 9 AS DOUBLE) * 3.0)",
    "bu_q2lat": "(47.0 + CAST(c_custkey % 9 AS DOUBLE) * 3.0)",
}


def geo_spherical_predicates(spark, sf_dir):
    """Planar vs great-circle ST_Intersects over parameterized segment
    pairs (ST_IntersectsSphere, wkb/spherical.py). Returns both verdicts
    plus the flip flag per regime; the DuckDB oracle restates the same
    unit-vector cross-product arc test in plain SQL, so values are strict
    (booleans; generic-position data keeps every sign test away from the
    1e-12 band)."""
    c = _t(spark, sf_dir, "customer")
    P = _SPH_PARAMS
    # fused composites (r8): each predicate runs as ONE worker-side kernel
    # call on the 8 coordinate expressions (ST_SegIntersects[Sphere]XY
    # delegates to the identical k_point/k_make_line/k_intersects[_sphere]
    # sequence) — 1 ArrowEvalPython node with 4 call slots instead of the
    # former 3-level point->line->predicate chain
    am_args = (
        f"{P['am_p1lon']}, {P['am_p1lat']}, {P['am_p2lon']}, {P['am_p2lat']}, "
        f"{P['am_qlon']}, {P['am_q1lat']}, {P['am_qlon']}, {P['am_q2lat']}"
    )
    bu_args = (
        f"{P['bu_p1lon']}, {P['bu_plat']}, {P['bu_p2lon']}, {P['bu_plat']}, "
        f"{P['bu_qlon']}, {P['bu_q1lat']}, {P['bu_qlon']}, {P['bu_q2lat']}"
    )
    staged = c.selectExpr(
        "c_custkey",
        f"ST_SegIntersectsXY({am_args}) AS am_planar",
        f"ST_SegIntersectsSphereXY({am_args}) AS am_sph",
        f"ST_SegIntersectsXY({bu_args}) AS bu_planar",
        f"ST_SegIntersectsSphereXY({bu_args}) AS bu_sph",
    )
    return staged.selectExpr(
        "c_custkey",
        "am_planar",
        "am_sph",
        "am_planar <> am_sph AS am_flip",
        "bu_planar",
        "bu_sph",
        "bu_planar <> bu_sph AS bu_flip",
    )


def _sph_oracle_sql() -> str:
    """Great-circle arc-pair intersection in plain SQL: unit xyz vectors,
    plane normals n = p x q, candidate +-(n1 x n2), minor-arc sign tests
    (p x X)·n >= -1e-12 — the same math as wkb/spherical.py (sign tests are
    scale-invariant so the candidate needs no normalization). Planar is the
    strict straddle test (generic-position data has no touching pairs)."""

    def xyz(lon, lat, pfx):
        return (
            f"cos(radians({lat})) * cos(radians({lon})) AS {pfx}x,"
            f" cos(radians({lat})) * sin(radians({lon})) AS {pfx}y,"
            f" sin(radians({lat})) AS {pfx}z"
        )

    def cross(a, b, pfx):
        return (
            f"{a}y * {b}z - {a}z * {b}y AS {pfx}x,"
            f" {a}z * {b}x - {a}x * {b}z AS {pfx}y,"
            f" {a}x * {b}y - {a}y * {b}x AS {pfx}z"
        )

    def dot_cross(a, b, n):
        # (a x b) · n
        return (
            f"(({a}y * {b}z - {a}z * {b}y) * {n}x"
            f" + ({a}z * {b}x - {a}x * {b}z) * {n}y"
            f" + ({a}x * {b}y - {a}y * {b}x) * {n}z)"
        )

    def contains(x, p, q, n):
        return (
            f"({dot_cross(p, x, n)} >= -1e-12 AND {dot_cross(x, q, n)} >= -1e-12)"
        )

    def sph(g):  # g in {am, bu}: points {g}a1,{g}a2,{g}b1,{g}b2; normals {g}n1,{g}n2; candidate {g}d / {g}m
        return (
            f"(({contains(f'{g}d', f'{g}a1', f'{g}a2', f'{g}n1')}"
            f" AND {contains(f'{g}d', f'{g}b1', f'{g}b2', f'{g}n2')})"
            f" OR ({contains(f'{g}m', f'{g}a1', f'{g}a2', f'{g}n1')}"
            f" AND {contains(f'{g}m', f'{g}b1', f'{g}b2', f'{g}n2')}))"
        )

    def orient(px, py, qx, qy, rx, ry):
        return f"(({qx} - {px}) * ({ry} - {py}) - ({qy} - {py}) * ({rx} - {px}))"

    def planar(p1x, p1y, p2x, p2y, q1x, q1y, q2x, q2y):
        o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
        o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
        o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
        o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
        return f"({o1} * {o2} < 0 AND {o3} * {o4} < 0)"

    P = _SPH_PARAMS
    lonlat = ", ".join(
        f"{expr} AS {name}" for name, expr in P.items()
    )
    s1 = f"SELECT c_custkey, {lonlat} FROM customer"
    s2 = (
        "SELECT c_custkey,"
        f" {planar('am_p1lon', 'am_p1lat', 'am_p2lon', 'am_p2lat', 'am_qlon', 'am_q1lat', 'am_qlon', 'am_q2lat')} AS am_planar,"
        f" {planar('bu_p1lon', 'bu_plat', 'bu_p2lon', 'bu_plat', 'bu_qlon', 'bu_q1lat', 'bu_qlon', 'bu_q2lat')} AS bu_planar,"
        f" {xyz('am_p1lon', 'am_p1lat', 'ama1')}, {xyz('am_p2lon', 'am_p2lat', 'ama2')},"
        f" {xyz('am_qlon', 'am_q1lat', 'amb1')}, {xyz('am_qlon', 'am_q2lat', 'amb2')},"
        f" {xyz('bu_p1lon', 'bu_plat', 'bua1')}, {xyz('bu_p2lon', 'bu_plat', 'bua2')},"
        f" {xyz('bu_qlon', 'bu_q1lat', 'bub1')}, {xyz('bu_qlon', 'bu_q2lat', 'bub2')}"
        f" FROM ({s1})"
    )
    s3 = (
        "SELECT c_custkey, am_planar, bu_planar,"
        " ama1x, ama1y, ama1z, ama2x, ama2y, ama2z,"
        " amb1x, amb1y, amb1z, amb2x, amb2y, amb2z,"
        " bua1x, bua1y, bua1z, bua2x, bua2y, bua2z,"
        " bub1x, bub1y, bub1z, bub2x, bub2y, bub2z,"
        f" {cross('ama1', 'ama2', 'amn1')}, {cross('amb1', 'amb2', 'amn2')},"
        f" {cross('bua1', 'bua2', 'bun1')}, {cross('bub1', 'bub2', 'bun2')}"
        f" FROM ({s2})"
    )
    s4 = (
        "SELECT *,"
        f" {cross('amn1', 'amn2', 'amd')}, {cross('bun1', 'bun2', 'bud')}"
        f" FROM ({s3})"
    )
    s5 = (
        "SELECT *,"
        " -amdx AS ammx, -amdy AS ammy, -amdz AS ammz,"
        " -budx AS bumx, -budy AS bumy, -budz AS bumz"
        f" FROM ({s4})"
    )
    return (
        "SELECT c_custkey,"
        " am_planar,"
        f" {sph('am')} AS am_sph,"
        f" am_planar <> {sph('am')} AS am_flip,"
        " bu_planar,"
        f" {sph('bu')} AS bu_sph,"
        f" bu_planar <> {sph('bu')} AS bu_flip"
        f" FROM ({s5})"
    )


ORACLE_GEO_SPHERICAL_PREDICATES = _sph_oracle_sql()


# Spherical POLYGON containment: per-row regular spherical pentagon built
# by the direct-geodesic destination formula (shared expression text so
# Spark and DuckDB compute bit-identical vertex doubles), test point at a
# parameterized distance/azimuth from the same center. Centers alternate
# between an antimeridian-straddling band (planar ring becomes a bowtie —
# the flip regime) and a mid-lon band.
_SPOLY_K = 5


def _spoly_stages():
    """Shared stage expressions: stage1 params -> stage2 per-vertex sinlat
    -> stage3 lon/lat degrees (wrapped). Returns (stage1, stage2, stage3)
    as ordered (name, expr) lists; later stages reference earlier names."""
    wrap = lambda x: f"(({x}) + 540.0 - floor((({x}) + 540.0) / 360.0) * 360.0 - 180.0)"
    s1 = [
        ("clon", "(CASE WHEN c_custkey % 2 = 0"
                 " THEN 168.4 + CAST(c_custkey % 24 AS DOUBLE)"
                 " ELSE 20.7 + CAST(c_custkey % 90 AS DOUBLE) END)"),
        ("phi", "radians(6.3 + CAST(c_custkey % 45 AS DOUBLE))"),
        ("delt", "radians(1.5 + CAST(c_custkey % 4 AS DOUBLE) * 0.5)"),
        ("az0", "(7.0 + CAST(c_custkey % 5 AS DOUBLE) * 13.0)"),
        ("deltp", "radians((1.5 + CAST(c_custkey % 4 AS DOUBLE) * 0.5)"
                  " * (0.4 + 0.25 * CAST(c_custkey % 6 AS DOUBLE)))"),
        ("thp", "radians(3.7 + 9.0 * CAST(c_custkey % 40 AS DOUBLE))"),
    ]
    s2 = []
    for i in range(_SPOLY_K):
        th = f"radians(az0 + {72.0 * i})"
        s2.append((f"th{i}", th))
    s2.append(
        ("slp", "sin(phi) * cos(deltp) + cos(phi) * sin(deltp) * cos(thp)")
    )
    for i in range(_SPOLY_K):
        s2.append(
            (f"sl{i}", f"sin(phi) * cos(delt) + cos(phi) * sin(delt) * cos(th{i})")
        )
    s3 = [
        ("plat", "degrees(asin(slp))"),
        ("plon", wrap(
            "degrees(atan2(sin(thp) * sin(deltp) * cos(phi),"
            " cos(deltp) - sin(phi) * slp)) + clon"
        )),
    ]
    for i in range(_SPOLY_K):
        s3.append((f"lat{i}", f"degrees(asin(sl{i}))"))
        s3.append((f"lon{i}", wrap(
            f"degrees(atan2(sin(th{i}) * sin(delt) * cos(phi),"
            f" cos(delt) - sin(phi) * sl{i})) + clon"
        )))
    return s1, s2, s3


def geo_spherical_polygon(spark, sf_dir):
    """Spherical-polygon containment (ST_IntersectsSphere over POLYGON
    inputs, wkb/spherical.py even-odd arcs) vs planar ST_Intersects on the
    same ring. Antimeridian-straddling pentagons are planar bowties — the
    regime where plate-carrée containment is simply wrong; the DuckDB
    oracle decides spherical truth with the convex all-same-sign edge test
    and planar truth with an even-odd ray cast on the identical ring
    doubles (vertex coordinates share expression text, so both engines
    compute bit-identical doubles)."""
    c = _t(spark, sf_dir, "customer")
    df = c.selectExpr("c_custkey")
    for stage in _spoly_stages():
        df = df.selectExpr("*", *[f"{e} AS {n}" for n, e in stage])
    ring = ", ".join(
        [f"CAST(lon{i} AS STRING), ' ', CAST(lat{i} AS STRING), ', '"
         for i in range(_SPOLY_K)]
    )
    wkt = (
        f"concat('POLYGON ((', {ring}, "
        f"CAST(lon0 AS STRING), ' ', CAST(lat0 AS STRING), '))')"
    )
    staged = df.selectExpr(
        "c_custkey",
        f"ST_IntersectsSphere(ST_Point(plon, plat), ST_GeomFromText({wkt})) AS sph_in",
        f"ST_Intersects(ST_Point(plon, plat), ST_GeomFromText({wkt})) AS planar_in",
    )
    return staged.selectExpr(
        "c_custkey", "sph_in", "planar_in", "sph_in <> planar_in AS flip"
    )


def _spoly_oracle_sql() -> str:
    s1, s2, s3 = _spoly_stages()

    def sel(stage, frm):
        cols = ", ".join(f"{e} AS {n}" for n, e in stage)
        return f"SELECT *, {cols} FROM ({frm})"

    q = "SELECT c_custkey FROM customer"
    for stage in (s1, s2, s3):
        q = sel(stage, q)
    # stage 4: unit xyz of the vertices and the test point
    xyz = []
    for nm, lon, lat in [("p", "plon", "plat")] + [
        (f"v{i}", f"lon{i}", f"lat{i}") for i in range(_SPOLY_K)
    ]:
        xyz += [
            (f"{nm}x", f"cos(radians({lat})) * cos(radians({lon}))"),
            (f"{nm}y", f"cos(radians({lat})) * sin(radians({lon}))"),
            (f"{nm}z", f"sin(radians({lat}))"),
        ]
    q = sel(xyz, q)
    # stage 5: edge sign tests s_i = (v_i x v_{i+1}) . p
    signs = []
    for i in range(_SPOLY_K):
        a, b = f"v{i}", f"v{(i + 1) % _SPOLY_K}"
        signs.append((f"s{i}", (
            f"(({a}y * {b}z - {a}z * {b}y) * px"
            f" + ({a}z * {b}x - {a}x * {b}z) * py"
            f" + ({a}x * {b}y - {a}y * {b}x) * pz)"
        )))
    q = sel(signs, q)
    allpos = " AND ".join(f"s{i} > 0" for i in range(_SPOLY_K))
    allneg = " AND ".join(f"s{i} < 0" for i in range(_SPOLY_K))
    # planar even-odd ray cast on the identical ring doubles
    crossings = " + ".join(
        f"(CASE WHEN (lat{i} > plat) <> (lat{j} > plat)"
        f" AND plon < (lon{j} - lon{i}) * (plat - lat{i}) / (lat{j} - lat{i}) + lon{i}"
        f" THEN 1 ELSE 0 END)"
        for i, j in [(i, (i + 1) % _SPOLY_K) for i in range(_SPOLY_K)]
    )
    return (
        "SELECT c_custkey,"
        f" (({allpos}) OR ({allneg})) AS sph_in,"
        f" ({crossings}) % 2 = 1 AS planar_in,"
        f" (({allpos}) OR ({allneg})) <> (({crossings}) % 2 = 1) AS flip"
        f" FROM ({q})"
    )


ORACLE_GEO_SPHERICAL_POLYGON = _spoly_oracle_sql()


# True great-circle point-to-arc distance (ST_DistanceSphere beyond
# point-point: cross-track when the foot falls in the arc, else nearest
# endpoint — wkb/spherical.py sph_min_distance) + ST_DWithinSphere.
_SDIST_PARAMS = {
    "alon1": "(-120.0 + CAST(c_custkey % 30 AS DOUBLE) * 8.0)",
    "alat1": "(-55.0 + CAST(c_custkey % 23 AS DOUBLE) * 5.0)",
    "alon2": "(-116.0 + CAST(c_custkey % 30 AS DOUBLE) * 8.0"
             " + CAST(c_custkey % 9 AS DOUBLE) * 3.0)",
    "alat2": "(-50.0 + CAST(c_custkey % 21 AS DOUBLE) * 5.0)",
    # fractional lat step keeps the point off the (transcendental) arc
    "plon": "(-130.0 + CAST(c_custkey % 30 AS DOUBLE) * 8.0"
            " + CAST(c_custkey % 13 AS DOUBLE) * 4.0)",
    "plat": "(-60.2 + CAST(c_custkey % 25 AS DOUBLE) * 5.0)",
    "thresh": "(300000.0 + CAST(c_custkey % 7 AS DOUBLE) * 150000.0)",
}


def geo_spherical_distance(spark, sf_dir):
    """Great-circle point-to-arc distance: ST_DistanceSphere(point, 2-pt
    linestring) is min(cross-track, endpoint hops) on the sphere, plus
    ST_DWithinSphere at a per-row threshold. The DuckDB oracle restates
    the identical scalar arithmetic (same op order as _pt_arc_angle), so
    round-3 meters are strict."""
    c = _t(spark, sf_dir, "customer")
    P = _SDIST_PARAMS
    # fused composites (r8): point->line->sphere-distance chain runs as ONE
    # worker-side kernel call over the 6 coordinate expressions (+threshold)
    # — 1 ArrowEvalPython node instead of the former 3-level chain
    args = (
        f"{P['plon']}, {P['plat']}, {P['alon1']}, {P['alat1']}, "
        f"{P['alon2']}, {P['alat2']}"
    )
    staged = c.selectExpr(
        "c_custkey",
        f"ST_PointArcDistanceSphereXY({args}) AS d_raw",
        f"ST_PointArcDWithinSphereXY({args}, {P['thresh']}) AS within_t",
    )
    return staged.selectExpr(
        "c_custkey", "round(d_raw, 3) AS dist_m", "within_t"
    )


def _sdist_oracle_sql() -> str:
    from ..wkb.algorithms import EARTH_RADIUS_M

    P = _SDIST_PARAMS
    R = f"CAST({float(EARTH_RADIUS_M)!r} AS DOUBLE)"
    s1 = ", ".join(f"{e} AS {n}" for n, e in P.items())
    q1 = f"SELECT c_custkey, {s1} FROM customer"
    # unit xyz
    xyz = ", ".join(
        f"cos(radians({lat})) * cos(radians({lon})) AS {nm}x,"
        f" cos(radians({lat})) * sin(radians({lon})) AS {nm}y,"
        f" sin(radians({lat})) AS {nm}z"
        for nm, lon, lat in [("p", "plon", "plat"), ("a", "alon1", "alat1"), ("b", "alon2", "alat2")]
    )
    q2 = f"SELECT c_custkey, thresh, {xyz} FROM ({q1})"
    q3 = (
        "SELECT *,"
        " ay * bz - az * by AS nx, az * bx - ax * bz AS ny, ax * by - ay * bx AS nz"
        f" FROM ({q2})"
    )
    q4 = f"SELECT *, sqrt(nx * nx + ny * ny + nz * nz) AS nn FROM ({q3})"
    q5 = f"SELECT *, (px * nx + py * ny + pz * nz) / nn AS s FROM ({q4})"
    q6 = (
        "SELECT *,"
        " px - s * (nx / nn) AS fx, py - s * (ny / nn) AS fy, pz - s * (nz / nn) AS fz"
        f" FROM ({q5})"
    )
    q7 = f"SELECT *, sqrt(fx * fx + fy * fy + fz * fz) AS nf FROM ({q6})"
    # normalized foot + in-arc sign tests against the unnormalized normal
    q8 = (
        "SELECT *,"
        " fx / nf AS gx, fy / nf AS gy, fz / nf AS gz"
        f" FROM ({q7})"
    )
    contains = (
        "((ay * gz - az * gy) * nx + (az * gx - ax * gz) * ny + (ax * gy - ay * gx) * nz >= -1e-12"
        " AND (gy * bz - gz * by) * nx + (gz * bx - gx * bz) * ny + (gx * by - gy * bx) * nz >= -1e-12)"
    )
    ang = lambda u: (
        f"atan2(sqrt((py * {u}z - pz * {u}y) * (py * {u}z - pz * {u}y)"
        f" + (pz * {u}x - px * {u}z) * (pz * {u}x - px * {u}z)"
        f" + (px * {u}y - py * {u}x) * (px * {u}y - py * {u}x)),"
        f" px * {u}x + py * {u}y + pz * {u}z)"
    )
    q9 = (
        "SELECT c_custkey, thresh,"
        f" least({ang('a')}, {ang('b')},"
        f" CASE WHEN nf >= 1e-12 AND {contains}"
        "  THEN abs(asin(greatest(-1.0, least(1.0, s))))"
        "  ELSE CAST('infinity' AS DOUBLE) END) AS best_ang"
        f" FROM ({q8})"
    )
    return (
        "SELECT c_custkey,"
        f" round({R} * best_ang, 3) AS dist_m,"
        f" {R} * best_ang <= thresh AS within_t"
        f" FROM ({q9})"
    )


ORACLE_GEO_SPHERICAL_DISTANCE = _sdist_oracle_sql()


# shared lon/lat derivations for the spherical join (engine-portable SQL
# text; half of each side clusters against the antimeridian)
def _sjoin_lonlat(pfx: str, m1: int, m2: int) -> dict:
    wrap = lambda x: f"(({x}) + 540.0 - floor((({x}) + 540.0) / 360.0) * 360.0 - 180.0)"
    lon_raw = (
        f"(CASE WHEN c_custkey % 2 = 0"
        f" THEN 176.5 + CAST(c_custkey % {m1} AS DOUBLE) / 10.0"
        f" ELSE -60.0 + CAST(c_custkey % {m1} AS DOUBLE) END)"
    )
    return {
        f"{pfx}lon": wrap(lon_raw),
        f"{pfx}lat": f"(-58.3 + CAST(c_custkey % {m2} AS DOUBLE))",
    }


def geo_spherical_join(spark, sf_dir):
    """Distributed great-circle DWithin JOIN (join.spatial
    dwithin_sphere_join): lon-wrapped grid cells make candidate pairs that
    straddle the ±180 antimeridian land in adjacent cells — a planar grid
    would put them at opposite map edges and silently drop them. Exact
    native-haversine refine; the oracle brute-forces the same formula over
    the full cross product (bounded sides)."""
    from ..join.spatial import dwithin_sphere_join

    c = _t(spark, sf_dir, "customer")
    lcols = _sjoin_lonlat("l", 70, 111)
    rcols = _sjoin_lonlat("r", 64, 107)
    left = c.where("c_custkey % 23 = 0").selectExpr(
        "c_custkey AS l_id", *[f"{e} AS {n}" for n, e in lcols.items()]
    )
    right = c.where("c_custkey % 17 = 3").selectExpr(
        "c_custkey AS r_id", *[f"{e} AS {n}" for n, e in rcols.items()]
    )
    out = dwithin_sphere_join(
        left, right, 120_000.0,
        l_id="l_id", l_lon="llon", l_lat="llat",
        r_id="r_id", r_lon="rlon", r_lat="rlat",
    )
    return out.select("l_id", "r_id", F.round("dist_m", 3).alias("dist_m"))


def _sjoin_oracle_sql() -> str:
    lcols = _sjoin_lonlat("l", 70, 111)
    rcols = _sjoin_lonlat("r", 64, 107)
    lsel = ", ".join(f"{e} AS {n}" for n, e in lcols.items())
    rsel = ", ".join(f"{e} AS {n}" for n, e in rcols.items())
    hav = (
        "2.0 * 6371008.8 * asin(sqrt(least(1.0,"
        " sin(radians(rlat - llat) / 2.0) * sin(radians(rlat - llat) / 2.0)"
        " + cos(radians(llat)) * cos(radians(rlat))"
        " * sin(radians(rlon - llon) / 2.0) * sin(radians(rlon - llon) / 2.0))))"
    )
    return f"""
WITH l AS (SELECT c_custkey AS l_id, {lsel} FROM customer WHERE c_custkey % 23 = 0),
r AS (SELECT c_custkey AS r_id, {rsel} FROM customer WHERE c_custkey % 17 = 3),
scored AS (
  SELECT l_id, r_id, {hav} AS dist_m
  FROM l CROSS JOIN r
)
SELECT l_id, r_id, round(dist_m, 3) AS dist_m
FROM scored WHERE dist_m <= 120000.0
"""


ORACLE_GEO_SPHERICAL_JOIN = _sjoin_oracle_sql()


COUNTRIES_FGB = "/root/reference/fixtures/flatgeobuf/countries.fgb"


def geo_countries_spherical(spark, sf_dir):
    """Spherical kernels over REAL fixture shapes (VERDICT r5 #4): six
    countries from countries.fgb through the engine's own FlatGeobuf
    reader — part counts, spherical area (km^2), min great-circle distance
    to Suva (sph_min_distance over the real multipolygons, 0 inside Fiji),
    and ST_IntersectsSphere against an arc crossing the antimeridian at
    Fiji's +-180 split (True only for Fiji; a planar segment runs the
    wrong way around the map and misses — test_spherical_fixtures.py pins
    that flip). The oracle pins the goldens as literals, the way the
    reference pins kernel fixtures (geoarrow-expr-geo/src/area.rs:73-93);
    sf_dir is unused (fixture-backed entry)."""
    from ..io.flatgeobuf import read_flatgeobuf

    names = ["Antarctica", "Brazil", "Fiji", "Greenland", "New Zealand", "Russia"]
    df = read_flatgeobuf(spark, COUNTRIES_FGB)
    return (
        df.filter(F.col("name").isin(names))
        .select(
            "name",
            F.expr("CAST(ST_NumGeometries(geometry) AS BIGINT)").alias("n_parts"),
            F.expr("round(ST_AreaSpherical(geometry) / 1e6, 4)").alias("area_km2"),
            F.expr(
                "round(ST_DistanceSphere(geometry,"
                " ST_Point(178.4417D, -18.1416D)) / 1e3, 4)"
            ).alias("dist_suva_km"),
            F.expr(
                "ST_IntersectsSphere(geometry, ST_GeomFromText("
                "'LINESTRING (179.99 -17.3, -179.99 -15.3)'))"
            ).alias("hits_am_arc"),
        )
    )


ORACLE_GEO_COUNTRIES_SPHERICAL = """
SELECT * FROM (VALUES
  ('Antarctica', CAST(8 AS BIGINT), 11154857.7148, 5853.9454, FALSE),
  ('Brazil', CAST(1 AS BIGINT), 8540552.4172, 11575.4863, FALSE),
  ('Fiji', CAST(3 AS BIGINT), 19351.2202, 0.0, TRUE),
  ('Greenland', CAST(1 AS BIGINT), 2190190.4321, 12389.2505, FALSE),
  ('New Zealand', CAST(2 AS BIGINT), 277275.4202, 1891.7619, FALSE),
  ('Russia', CAST(13 AS BIGINT), 16897110.8982, 7963.8077, FALSE)
) AS t(name, n_parts, area_km2, dist_suva_km, hits_am_arc)
"""


