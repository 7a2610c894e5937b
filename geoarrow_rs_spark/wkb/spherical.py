"""Great-circle (spherical-edges) binary predicates.

With ``edges='spherical'`` column metadata (edges.rs:35-60), a two-vertex
segment denotes the MINOR great-circle arc between its endpoints — not the
straight line in lon/lat space. Planar and spherical ``ST_Intersects``
genuinely disagree in two regimes:

- arcs crossing the antimeridian (the planar segment runs the "wrong way"
  across the whole map), and
- long east-west arcs, which bulge poleward on the sphere (an arc from
  (-60, 45) to (60, 45) reaches ~63.4°N at lon 0 while the planar segment
  stays at 45°N).

Per-kernel divergence contract (VERDICT r4 directive #8):

============================  =============================================
kernel                        spherical-edges behavior
============================  =============================================
ST_IntersectsSphere           exact great-circle semantics for ALL WKB
                              kinds: points/lines exact; polygons get
                              great-circle edges + spherical even-odd
                              containment. Polygons that fit in an open
                              hemisphere are winding-agnostic (interior =
                              the hemisphere-bounded region, like PostGIS
                              geography). Larger polygons (oceans, Russia)
                              fall back to the s2/OGC ORIENTATION
                              convention: interior lies on the LEFT of the
                              outer-ring walk — no ValueError, but winding
                              now matters, exactly as in other geography
                              engines.
ST_Distance/Length/Area       already edges-dispatched via
                              ops.table.geom_* (sphere/spheroid kernels)
ST_Contains/Within/Relate,    remain PLANAR regardless of the edges tag;
overlay (Intersection/...)    callers with spherical columns must either
                              accept plate-carrée semantics or densify
============================  =============================================

Math: unit vectors on S²; a great-circle segment (p, q) has plane normal
n = p x q, and a candidate point X lies on the minor arc iff
(p x X)·n >= 0 and (X x q)·n >= 0. Two non-coplanar arcs can only meet at
+-(n1 x n2)/|n1 x n2|. Antipodal endpoints leave the great circle
undefined -> ValueError (same contract as s2 / PostGIS geography).
"""

from __future__ import annotations

import math

import numpy as np

from .core import LINESTRING, POINT, iter_parts

_EPS = 1e-12
# dot >= _SAME_POINT_DOT treats two unit vectors as the same position for
# the INTERSECTS predicate (~4.5e-7 rad ~ 2.8 m on Earth; cos snaps to 1.0
# well before that, so a much tighter cutoff would misfire on exact-equal
# inputs). sph_min_distance deliberately bypasses this snap for
# point-vs-point inputs — its atan2 form resolves ~6 cm.
_SAME_POINT_DOT = 1.0 - 1e-13


def _xyz(lon: float, lat: float) -> np.ndarray:
    lam = math.radians(lon)
    phi = math.radians(lat)
    c = math.cos(phi)
    return np.array([c * math.cos(lam), c * math.sin(lam), math.sin(phi)])


def _arc_contains(X, p, q, n) -> bool:
    """X (unit, on the great circle of p,q with normal n = p x q) lies on
    the minor arc p->q."""
    return (
        float(np.dot(np.cross(p, X), n)) >= -_EPS
        and float(np.dot(np.cross(X, q), n)) >= -_EPS
    )


def _point_on_arc(X, p, q) -> bool:
    n = np.cross(p, q)
    nn = float(np.linalg.norm(n))
    if nn < _EPS:
        if float(np.dot(p, q)) < 0.0:
            raise ValueError(
                "antipodal segment endpoints: great-circle arc undefined"
            )
        return float(np.dot(X, p)) >= _SAME_POINT_DOT  # degenerate point
    if abs(float(np.dot(X, n)) / nn) > _EPS:
        return False
    return _arc_contains(X, p, q, n)


def _arcs_intersect(p1, q1, p2, q2) -> bool:
    n1 = np.cross(p1, q1)
    n2 = np.cross(p2, q2)
    l1 = float(np.linalg.norm(n1))
    l2 = float(np.linalg.norm(n2))
    if l1 < _EPS:  # arc 1 degenerates to a point (or is antipodal)
        if float(np.dot(p1, q1)) < 0.0:
            raise ValueError(
                "antipodal segment endpoints: great-circle arc undefined"
            )
        return _point_on_arc(p1, p2, q2)
    if l2 < _EPS:
        if float(np.dot(p2, q2)) < 0.0:
            raise ValueError(
                "antipodal segment endpoints: great-circle arc undefined"
            )
        return _point_on_arc(p2, p1, q1)
    d = np.cross(n1, n2)
    ld = float(np.linalg.norm(d))
    if ld < _EPS * l1 * l2:  # same great circle: overlap iff any endpoint
        return (
            _arc_contains(p2, p1, q1, n1)
            or _arc_contains(q2, p1, q1, n1)
            or _arc_contains(p1, p2, q2, n2)
            or _arc_contains(q1, p2, q2, n2)
        )
    X = d / ld
    if _arc_contains(X, p1, q1, n1) and _arc_contains(X, p2, q2, n2):
        return True
    Xn = -X
    return _arc_contains(Xn, p1, q1, n1) and _arc_contains(Xn, p2, q2, n2)


def _rings_xyz(poly):
    """Rings of a POLYGON part as lists of unit xyz vertices (the closing
    duplicate vertex dropped)."""
    rings = []
    for r in poly.data:
        m = len(r)
        if m and np.allclose(r[0, :2], r[m - 1, :2]):
            m -= 1
        rings.append([_xyz(float(r[i, 0]), float(r[i, 1])) for i in range(m)])
    return rings


def _poly_outside_ref(rings):
    """A reference point guaranteed OUTSIDE the polygon: the antipode of
    the outer ring's vertex centroid. Valid only while the polygon fits in
    an open hemisphere around that centroid — the same restriction most
    geography engines impose — else ValueError (callers fall back to
    :func:`_interior_ref_by_orientation`)."""
    C = np.sum(rings[0], axis=0)
    n = float(np.linalg.norm(C))
    if n < _EPS:
        raise ValueError(
            "spherical polygon has no defined interior (vertex centroid "
            "degenerate — the ring spans a full great circle)"
        )
    C = C / n
    for ring in rings:
        for v in ring:
            if float(np.dot(v, C)) <= _EPS:
                raise ValueError(
                    "spherical polygon exceeds a hemisphere: interior is "
                    "ambiguous (split it or densify)"
                )
    return -C


def _boundary_min_angle(X, rings, skip=None):
    """Min angular distance from X to every ring edge, optionally skipping
    one (ring_index, edge_index) host edge."""
    best = math.inf
    for ri, ring in enumerate(rings):
        m = len(ring)
        for j in range(m):
            if skip is not None and (ri, j) == skip:
                continue
            best = min(best, _pt_arc_angle(X, ring[j], ring[(j + 1) % m]))
    return best


def _interior_ref_by_orientation(rings):
    """Interior reference for a polygon that does NOT fit in an open
    hemisphere: the s2/OGC orientation convention — interior on the LEFT
    of the outer-ring walk. The reference sits just left of the midpoint
    of the longest outer edge, offset by half the midpoint's clearance to
    the rest of the boundary so the offset arc provably crosses nothing
    (a boundary-local wedge of that radius is all-interior on the left)."""
    outer = rings[0]
    m = len(outer)
    best_i, best_len = -1, -1.0
    for i in range(m):
        ll = _angle(outer[i], outer[(i + 1) % m])
        if ll > best_len:
            best_len, best_i = ll, i
    v0, v1 = outer[best_i], outer[(best_i + 1) % m]
    ne = np.cross(v0, v1)
    nn = float(np.linalg.norm(ne))
    if nn < _EPS:
        if float(np.dot(v0, v1)) < 0.0:
            raise ValueError(
                "antipodal segment endpoints: great-circle arc undefined"
            )
        raise ValueError(
            "spherical polygon boundary is degenerate (all edges zero-length)"
        )
    ne = ne / nn  # left of travel v0 -> v1 (eastward equator edge -> north)
    mid = v0 + v1
    mid = mid / float(np.linalg.norm(mid))
    delta = _boundary_min_angle(mid, rings, skip=(0, best_i))
    if delta < 1e-9:
        raise ValueError(
            "spherical polygon is self-touching at an edge midpoint: "
            "interior reference undefined"
        )
    th = min(delta / 2.0, 0.1)
    R = mid * math.cos(th) + ne * math.sin(th)
    return R / float(np.linalg.norm(R))


def _poly_ref(rings):
    """(reference point, reference_is_inside) for even-odd containment:
    hemisphere-bounded polygons use the winding-agnostic outside antipode;
    larger ones the orientation-convention interior point."""
    try:
        return _poly_outside_ref(rings), False
    except ValueError:
        return _interior_ref_by_orientation(rings), True


def _ring_edges(rings):
    for ring in rings:
        m = len(ring)
        for i in range(m):
            yield ring[i], ring[(i + 1) % m]


def _count_crossings(X, ref, rings) -> int:
    """Proper crossings of the minor arc X -> ref with every ring edge,
    using the half-open plane-straddle rule (the spherical analog of the
    planar "(y_i > py) != (y_j > py)" ray cast): an edge counts only when
    its endpoints sit on strictly opposite sides of the ray circle, which
    makes a ray through a shared VERTEX count exactly once for a true
    crossing and twice (parity no-op) for a graze — no double-count."""
    nr = np.cross(X, ref)
    nnr = float(np.linalg.norm(nr))
    if nnr < _EPS:  # X coincides with the reference point
        return 0
    crossings = 0
    for p, q in _ring_edges(rings):
        sp = float(np.dot(p, nr)) > 0.0
        sq = float(np.dot(q, nr)) > 0.0
        if sp == sq:
            continue
        ne = np.cross(p, q)
        u = np.cross(ne, nr)
        nu = float(np.linalg.norm(u))
        if nu < _EPS:  # edge lies in the ray plane: a graze, not a cross
            continue
        u = u / nu
        cand = u if _arc_contains(u, p, q, ne) else -u
        if _arc_contains(cand, p, q, ne) and _arc_contains(cand, X, ref, nr):
            crossings += 1
    return crossings


def _safe_waypoint(X, rings):
    """A point ~90 degrees from X with clearance from the boundary, for
    splitting an antipodal X -> ref parity walk into two defined arcs."""
    for e in (
        np.array([1.0, 0.0, 0.0]),
        np.array([0.0, 1.0, 0.0]),
        np.array([0.0, 0.0, 1.0]),
        np.array([0.577350269189626, 0.577350269189626, 0.577350269189626]),
    ):
        M = np.cross(X, e)
        nm = float(np.linalg.norm(M))
        if nm < 0.1:
            continue
        M = M / nm
        if _boundary_min_angle(M, rings) > 1e-9:
            return M
    raise ValueError(
        "spherical polygon boundary blocks every parity waypoint"
    )


def _point_in_sph_poly(X, rings, ref, ref_inside: bool = False) -> bool:
    """Even-odd rule on the sphere: parity of proper crossings of the arc
    X -> ref with every ring edge (holes subtract automatically), XORed
    with the reference point's known classification. Boundary points are
    handled by the caller's on-edge test."""
    if float(np.dot(X, ref)) <= -1.0 + 1e-12:
        # X is (nearly) the reference's antipode — the arc between them is
        # undefined.
        if not ref_inside:
            # Hemisphere path: ref is the centroid's antipode, so X is the
            # centroid itself; the polygon lies strictly inside the open
            # centroid hemisphere, so any direction 90° from the centroid
            # is also guaranteed outside.
            C = -ref
            e = (
                np.array([1.0, 0.0, 0.0])
                if abs(C[0]) < 0.9
                else np.array([0.0, 1.0, 0.0])
            )
            ref2 = np.cross(C, e)
            ref2 = ref2 / np.linalg.norm(ref2)
            return _count_crossings(X, ref2, rings) % 2 == 1
        # Orientation path: no hemisphere guarantee — walk X -> M -> ref
        # through a boundary-clear waypoint (parity is path-independent).
        M = _safe_waypoint(X, rings)
        parity = (
            _count_crossings(X, M, rings) + _count_crossings(M, ref, rings)
        ) % 2
        return (parity == 1) != ref_inside
    parity = _count_crossings(X, ref, rings) % 2
    return (parity == 1) != ref_inside


def _decompose_with_verts(g):
    """(points, segments, polygons, vertices) of g as unit xyz vectors.
    Each polygon entry is (rings, outside_ref); ``vertices`` lists every
    distinct vertex ONCE (points, all linestring vertices, all ring
    vertices) for the distance reduction."""
    pts = []
    segs = []
    polys = []
    verts = []
    for p in iter_parts(g):
        if p.is_empty():
            continue
        if p.kind == POINT:
            v = _xyz(float(p.data[0]), float(p.data[1]))
            pts.append(v)
            verts.append(v)
        elif p.kind == LINESTRING:
            L = p.data
            V = [_xyz(float(L[i, 0]), float(L[i, 1])) for i in range(len(L))]
            if len(V) == 1:
                pts.append(V[0])
            segs.extend((V[i], V[i + 1]) for i in range(len(V) - 1))
            verts.extend(V)
        else:  # POLYGON (iter_parts never yields other kinds)
            rings = _rings_xyz(p)
            if not rings or not rings[0]:
                continue
            polys.append((rings, *_poly_ref(rings)))
            for ring in rings:
                verts.extend(ring)
    return pts, segs, polys, verts


def _decompose(g):
    """(points, segments, polygons) of g as unit xyz vectors."""
    pts, segs, polys, _ = _decompose_with_verts(g)
    return pts, segs, polys


def _angle(a, b) -> float:
    """Angular distance between unit vectors (atan2 form: accurate at both
    tiny and near-antipodal separations, unlike acos)."""
    cx = a[1] * b[2] - a[2] * b[1]
    cy = a[2] * b[0] - a[0] * b[2]
    cz = a[0] * b[1] - a[1] * b[0]
    cross = math.sqrt(cx * cx + cy * cy + cz * cz)
    dot = a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
    return math.atan2(cross, dot)


def _pt_arc_angle(X, p, q) -> float:
    """Min angular distance from point X to the minor arc (p, q):
    cross-track |asin(X·n̂)| when the great-circle foot falls inside the
    arc, else the nearer endpoint. Scalar arithmetic in fixed order so the
    SQL oracles can restate it verbatim."""
    nx = p[1] * q[2] - p[2] * q[1]
    ny = p[2] * q[0] - p[0] * q[2]
    nz = p[0] * q[1] - p[1] * q[0]
    nn = math.sqrt(nx * nx + ny * ny + nz * nz)
    if nn < _EPS:  # degenerate arc (point); antipodal raises in intersects
        return _angle(X, p)
    s = (X[0] * nx + X[1] * ny + X[2] * nz) / nn
    fx = X[0] - s * (nx / nn)
    fy = X[1] - s * (ny / nn)
    fz = X[2] - s * (nz / nn)
    nf = math.sqrt(fx * fx + fy * fy + fz * fz)
    if nf >= _EPS:
        F = np.array([fx / nf, fy / nf, fz / nf])
        if _arc_contains(F, p, q, np.array([nx, ny, nz])):
            return abs(math.asin(max(-1.0, min(1.0, s))))
    return min(_angle(X, p), _angle(X, q))


def sph_min_distance(g1, g2, radius: float = None):
    """Minimum great-circle distance between two geometries (meters by
    default): 0 when they intersect spherically (incl. polygon
    containment), else the s2-style reduction — min over every vertex of
    one geometry against every arc of the other (for non-crossing arcs the
    minimum is always attained at an endpoint). None-safe; NaN for empty
    inputs, matching the planar distance kernel."""
    from .algorithms import EARTH_RADIUS_M

    if g1 is None or g2 is None:
        return None
    if radius is None:
        radius = EARTH_RADIUS_M
    pts1, segs1, polys1, v1 = _decompose_with_verts(g1)
    pts2, segs2, polys2, v2 = _decompose_with_verts(g2)
    if (segs1 or polys1 or segs2 or polys2) and sph_intersects(g1, g2):
        # arcs/polygons can overlap or contain — distance 0. Pure
        # point-vs-point inputs skip this: the predicate's same-point
        # epsilon (~4.5e-7 rad) would snap sub-3m distances to zero,
        # while the _angle math below resolves them exactly.
        return 0.0
    edges1 = list(segs1)
    for rings, _, _ in polys1:
        edges1.extend(_ring_edges(rings))
    edges2 = list(segs2)
    for rings, _, _ in polys2:
        edges2.extend(_ring_edges(rings))
    if not v1 or not v2:
        return float("nan")
    best = math.inf
    for a in v1:
        for b in v2:
            best = min(best, _angle(a, b))
        for p, q in edges2:
            best = min(best, _pt_arc_angle(a, p, q))
    for b in v2:
        for p, q in edges1:
            best = min(best, _pt_arc_angle(b, p, q))
    return radius * best


def _xyz_batch(lon, lat):
    """Degree arrays -> (n, 3) unit vectors (batch twin of _xyz)."""
    lam = np.radians(lon)
    phi = np.radians(lat)
    c = np.cos(phi)
    return np.stack([c * np.cos(lam), c * np.sin(lam), np.sin(phi)], axis=1)


def sph_pt_seg2_dist_batch(plon, plat, ax1, ay1, ax2, ay2):
    """Whole-batch great-circle point-to-arc distance in meters for
    point-vs-two-point-segment rows: min(cross-track if the foot is in
    the arc, endpoint hops). Returns (meters, need_fallback); fallback
    rows (NaN inputs, degenerate arcs) re-run through sph_min_distance."""
    from .algorithms import EARTH_RADIUS_M

    X = _xyz_batch(plon, plat)
    p = _xyz_batch(ax1, ay1)
    q = _xyz_batch(ax2, ay2)
    n = np.cross(p, q)
    nn = np.linalg.norm(n, axis=1)
    nan = (
        np.isnan(plon) | np.isnan(plat)
        | np.isnan(ax1) | np.isnan(ay1) | np.isnan(ax2) | np.isnan(ay2)
    )
    need_fallback = nan | (nn < _EPS)
    safe_nn = np.where(nn < _EPS, 1.0, nn)
    s = np.einsum("ij,ij->i", X, n) / safe_nn
    f = X - s[:, None] * (n / safe_nn[:, None])
    nf = np.linalg.norm(f, axis=1)
    safe_nf = np.where(nf < _EPS, 1.0, nf)
    g = f / safe_nf[:, None]
    in_arc = (
        (nf >= _EPS)
        & (np.einsum("ij,ij->i", np.cross(p, g), n) >= -_EPS)
        & (np.einsum("ij,ij->i", np.cross(g, q), n) >= -_EPS)
    )
    xt = np.abs(np.arcsin(np.clip(s, -1.0, 1.0)))

    def ang(u):
        c = np.cross(X, u)
        return np.arctan2(
            np.linalg.norm(c, axis=1), np.einsum("ij,ij->i", X, u)
        )

    best = np.minimum(ang(p), ang(q))
    best = np.where(in_arc, np.minimum(best, xt), best)
    return EARTH_RADIUS_M * best, need_fallback


def sph_seg2_batch(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Whole-batch great-circle intersection for two-point segments (the
    dominant shape in segment tables). Inputs are degree arrays (n,).
    Returns (hit, need_fallback): rows flagged need_fallback (degenerate
    arcs, coplanar arcs, NaN coords) must be re-evaluated per-row by
    :func:`sph_intersects`, which also owns the antipodal ValueError.
    The candidate direction n1 x n2 is NORMALIZED before the sign tests:
    the tests compare against the absolute -1e-12 epsilon, so an
    unnormalized short-arc candidate (|d| << 1) would scale marginal
    values into the acceptance band the scalar path rejects — booleans
    must match the scalar path even in the tolerance band."""

    p1 = _xyz_batch(ax1, ay1)
    q1 = _xyz_batch(ax2, ay2)
    p2 = _xyz_batch(bx1, by1)
    q2 = _xyz_batch(bx2, by2)
    n1 = np.cross(p1, q1)
    n2 = np.cross(p2, q2)
    l1 = np.linalg.norm(n1, axis=1)
    l2 = np.linalg.norm(n2, axis=1)
    d = np.cross(n1, n2)
    ld = np.linalg.norm(d, axis=1)
    nan = (
        np.isnan(ax1) | np.isnan(ay1) | np.isnan(ax2) | np.isnan(ay2)
        | np.isnan(bx1) | np.isnan(by1) | np.isnan(bx2) | np.isnan(by2)
    )
    need_fallback = nan | (l1 < _EPS) | (l2 < _EPS) | (ld < _EPS * l1 * l2)
    du = d / np.where(ld < _EPS * l1 * l2, 1.0, ld)[:, None]

    def contains(X, p, q, n):
        return (
            (np.einsum("ij,ij->i", np.cross(p, X), n) >= -_EPS)
            & (np.einsum("ij,ij->i", np.cross(X, q), n) >= -_EPS)
        )

    hit = (
        contains(du, p1, q1, n1) & contains(du, p2, q2, n2)
    ) | (
        contains(-du, p1, q1, n1) & contains(-du, p2, q2, n2)
    )
    return hit & ~need_fallback, need_fallback


def _point_touches(X, segs, polys) -> bool:
    for p, q in segs:
        if _point_on_arc(X, p, q):
            return True
    for rings, ref, ref_inside in polys:
        for p, q in _ring_edges(rings):
            if _point_on_arc(X, p, q):
                return True
        if _point_in_sph_poly(X, rings, ref, ref_inside):
            return True
    return False


def sph_intersects(g1, g2):
    """Great-circle ST_Intersects. Points/lines are exact; polygons use
    great-circle edges + spherical even-odd containment and must fit in an
    open hemisphere (ValueError otherwise). None-safe."""
    if g1 is None or g2 is None:
        return None
    pts1, segs1, polys1 = _decompose(g1)
    pts2, segs2, polys2 = _decompose(g2)
    for a in pts1:
        for b in pts2:
            if float(np.dot(a, b)) >= _SAME_POINT_DOT:
                return True
    for a in pts1:
        if _point_touches(a, segs2, polys2):
            return True
    for b in pts2:
        if _point_touches(b, segs1, polys1):
            return True
    edges1 = list(segs1)
    for rings, _, _ in polys1:
        edges1.extend(_ring_edges(rings))
    edges2 = list(segs2)
    for rings, _, _ in polys2:
        edges2.extend(_ring_edges(rings))
    for p1, q1 in edges1:
        for p2, q2 in edges2:
            if _arcs_intersect(p1, q1, p2, q2):
                return True
    # no boundary contact: containment. Boundaries don't cross, so any
    # vertex decides for its whole connected part — but parts are
    # independent, so every endpoint is tested (cheap vs the arc sweep).
    for rings, ref, ref_inside in polys1:
        if any(_point_in_sph_poly(p, rings, ref, ref_inside) for p, _ in edges2):
            return True
    for rings, ref, ref_inside in polys2:
        if any(_point_in_sph_poly(p, rings, ref, ref_inside) for p, _ in edges1):
            return True
    return False
