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
ST_IntersectsSphere           exact great-circle semantics for POINT /
                              MULTIPOINT / LINESTRING / MULTILINESTRING
                              (and collections thereof); polygon inputs
                              raise NotImplementedError — an honest
                              boundary, not a silent planar answer
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
# dot >= _SAME_POINT_DOT treats two unit vectors as the same position
# (~4.5e-7 rad ~ 2.9 mm on Earth — float64 xyz conversion noise floor)
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


def _decompose(g):
    """(points, segments) of g as unit xyz vectors; puntal/lineal only."""
    pts = []
    segs = []
    for p in iter_parts(g):
        if p.is_empty():
            continue
        if p.kind == POINT:
            pts.append(_xyz(float(p.data[0]), float(p.data[1])))
        elif p.kind == LINESTRING:
            L = p.data
            V = [_xyz(float(L[i, 0]), float(L[i, 1])) for i in range(len(L))]
            if len(V) == 1:
                pts.append(V[0])
            segs.extend((V[i], V[i + 1]) for i in range(len(V) - 1))
        else:
            raise NotImplementedError(
                "spherical-edges predicates are implemented for puntal and "
                "lineal geometries; polygon inputs have no great-circle "
                "kernel yet (use planar ST_Intersects explicitly, or "
                "densify edges)"
            )
    return pts, segs


def sph_seg2_batch(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Whole-batch great-circle intersection for two-point segments (the
    dominant shape in segment tables). Inputs are degree arrays (n,).
    Returns (hit, need_fallback): rows flagged need_fallback (degenerate
    arcs, coplanar arcs, NaN coords) must be re-evaluated per-row by
    :func:`sph_intersects`, which also owns the antipodal ValueError.
    The sign tests are scale-invariant, so the candidate direction
    n1 x n2 needs no normalization — same booleans as the scalar path."""

    def xyz(lon, lat):
        lam = np.radians(lon)
        phi = np.radians(lat)
        c = np.cos(phi)
        return np.stack([c * np.cos(lam), c * np.sin(lam), np.sin(phi)], axis=1)

    p1 = xyz(ax1, ay1)
    q1 = xyz(ax2, ay2)
    p2 = xyz(bx1, by1)
    q2 = xyz(bx2, by2)
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

    def contains(X, p, q, n):
        return (
            (np.einsum("ij,ij->i", np.cross(p, X), n) >= -_EPS)
            & (np.einsum("ij,ij->i", np.cross(X, q), n) >= -_EPS)
        )

    hit = (
        contains(d, p1, q1, n1) & contains(d, p2, q2, n2)
    ) | (
        contains(-d, p1, q1, n1) & contains(-d, p2, q2, n2)
    )
    return hit & ~need_fallback, need_fallback


def sph_intersects(g1, g2):
    """Great-circle ST_Intersects for point/line geometries. None-safe."""
    if g1 is None or g2 is None:
        return None
    pts1, segs1 = _decompose(g1)
    pts2, segs2 = _decompose(g2)
    for a in pts1:
        for b in pts2:
            if float(np.dot(a, b)) >= _SAME_POINT_DOT:
                return True
    for a in pts1:
        for p, q in segs2:
            if _point_on_arc(a, p, q):
                return True
    for b in pts2:
        for p, q in segs1:
            if _point_on_arc(b, p, q):
                return True
    for p1, q1 in segs1:
        for p2, q2 in segs2:
            if _arcs_intersect(p1, q1, p2, q2):
                return True
    return False
