"""Pure-numpy geometry model with WKB/WKT codecs.

This is the kernel substrate for the engine: the canonical on-wire form of a
geometry column in Spark is a WKB ``BinaryType`` column (see SURVEY.md §1.3 —
Spark has no union/extension types, so the reference's native GeoArrow layouts
map to WKB, mirroring what ``geoarrow.wkb`` serialized arrays hold in the
reference: /root/reference/rust/geoarrow-schema/src/datatype.rs:51-67).

Geometry value model (mirrors the 7 geometry kinds of
/root/reference/rust/geoarrow-schema/src/datatype.rs:23-68):

- Point              data: np.ndarray shape (dim,)  (NaNs => EMPTY)
- LineString         data: np.ndarray shape (n, dim)
- Polygon            data: list[np.ndarray (n, dim)]   (rings; first = shell)
- MultiPoint         data: np.ndarray shape (n, dim)
- MultiLineString    data: list[np.ndarray (n, dim)]
- MultiPolygon       data: list[list[np.ndarray (n, dim)]]
- GeometryCollection data: list[Geom]

Coordinate order is x, y [, z] [, m]; ``has_z``/``has_m`` give the dimension
(XY/XYZ/XYM/XYZM as in /root/reference/rust/geoarrow-schema/src/dimension.rs).
No external geometry library is used (shapely is not available in the target
environment); all algorithms are implemented in numpy in ``algorithms.py``.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# Geometry kind ids (match WKB base type codes and the reference's type ids,
# /root/reference/rust/geoarrow-schema/src/type_id.rs:12-35)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

KIND_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
NAME_KINDS = {v.upper(): k for k, v in KIND_NAMES.items()}

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


class Geom:
    """One geometry value. Lightweight tagged container."""

    __slots__ = ("kind", "has_z", "has_m", "data", "srid")

    def __init__(self, kind, data, has_z=False, has_m=False, srid=0):
        self.kind = kind
        self.data = data
        self.has_z = has_z
        self.has_m = has_m
        self.srid = srid

    @property
    def dim(self):
        return 2 + (1 if self.has_z else 0) + (1 if self.has_m else 0)

    @property
    def type_name(self):
        return KIND_NAMES[self.kind]

    # GeoArrow type id: dim_order*10 + kind (type_id.rs:23 semantics)
    @property
    def type_id(self):
        dim_order = (1 if self.has_z and not self.has_m else 0) + (
            2 if self.has_m and not self.has_z else 0
        ) + (3 if self.has_z and self.has_m else 0)
        return dim_order * 10 + self.kind

    def is_empty(self):
        k, d = self.kind, self.data
        if k == POINT:
            return d is None or len(d) == 0 or bool(np.isnan(d[0]))
        if k in (LINESTRING, MULTIPOINT):
            return len(d) == 0
        if k in (POLYGON, MULTILINESTRING):
            return len(d) == 0
        if k == MULTIPOLYGON:
            return len(d) == 0
        if k == GEOMETRYCOLLECTION:
            return len(d) == 0 or all(g.is_empty() for g in d)
        raise ValueError(f"bad kind {k}")

    def __repr__(self):
        return f"<Geom {self.type_name}{'Z' if self.has_z else ''}{'M' if self.has_m else ''} empty={self.is_empty()}>"

    def __eq__(self, other):
        if not isinstance(other, Geom):
            return NotImplemented
        return to_wkb(self) == to_wkb(other)

    def __hash__(self):
        return hash(to_wkb(self))


def empty(kind, has_z=False, has_m=False):
    dim = 2 + has_z + has_m
    if kind == POINT:
        return Geom(POINT, np.full(dim, np.nan), has_z, has_m)
    if kind in (LINESTRING, MULTIPOINT):
        return Geom(kind, np.empty((0, dim)), has_z, has_m)
    return Geom(kind, [], has_z, has_m)


def point(x, y, z=None, m=None):
    c = [x, y]
    if z is not None:
        c.append(z)
    if m is not None:
        c.append(m)
    return Geom(POINT, np.asarray(c, dtype=np.float64), z is not None, m is not None)


def linestring(coords, has_z=False, has_m=False):
    return Geom(LINESTRING, _coerce(coords, has_z, has_m), has_z, has_m)


def polygon(rings, has_z=False, has_m=False):
    return Geom(POLYGON, [_coerce(r, has_z, has_m) for r in rings], has_z, has_m)


def multipoint(coords, has_z=False, has_m=False):
    return Geom(MULTIPOINT, _coerce(coords, has_z, has_m), has_z, has_m)


def multilinestring(lines, has_z=False, has_m=False):
    return Geom(MULTILINESTRING, [_coerce(l, has_z, has_m) for l in lines], has_z, has_m)


def multipolygon(polys, has_z=False, has_m=False):
    return Geom(
        MULTIPOLYGON,
        [[_coerce(r, has_z, has_m) for r in rings] for rings in polys],
        has_z,
        has_m,
    )


def collection(geoms):
    has_z = any(g.has_z for g in geoms)
    has_m = any(g.has_m for g in geoms)
    return Geom(GEOMETRYCOLLECTION, list(geoms), has_z, has_m)


def box(xmin, ymin, xmax, ymax):
    """Axis-aligned rectangle as a Polygon (CCW shell)."""
    ring = np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]],
        dtype=np.float64,
    )
    return Geom(POLYGON, [ring])


def _coerce(coords, has_z, has_m):
    dim = 2 + has_z + has_m
    a = np.asarray(coords, dtype=np.float64)
    if a.size == 0:
        return a.reshape(0, dim)
    if a.ndim != 2 or a.shape[1] != dim:
        raise ValueError(f"expected (n,{dim}) coords, got {a.shape}")
    return a


# ---------------------------------------------------------------------------
# WKB
# ---------------------------------------------------------------------------

class _Cur:
    __slots__ = ("buf", "pos", "mv")

    def __init__(self, buf):
        self.buf = buf
        self.mv = memoryview(buf)
        self.pos = 0


def _read_coords(cur, n, dim, little):
    nbytes = n * dim * 8
    end = cur.pos + nbytes
    arr = np.frombuffer(cur.mv[cur.pos:end], dtype="<f8" if little else ">f8")
    cur.pos = end
    a = arr.reshape(n, dim)
    return a.astype(np.float64) if not little else np.array(a)  # own the memory


def _parse_header(cur):
    little = cur.buf[cur.pos] == 1
    cur.pos += 1
    (code,) = struct.unpack_from("<I" if little else ">I", cur.buf, cur.pos)
    cur.pos += 4
    srid = 0
    has_z = has_m = False
    if code & (_EWKB_Z | _EWKB_M | _EWKB_SRID):  # EWKB flags
        has_z = bool(code & _EWKB_Z)
        has_m = bool(code & _EWKB_M)
        if code & _EWKB_SRID:
            (srid,) = struct.unpack_from("<I" if little else ">I", cur.buf, cur.pos)
            cur.pos += 4
        base = code & 0xFF
    else:  # ISO WKB: 1000-Z, 2000-M, 3000-ZM
        base = code % 1000
        flavor = code // 1000
        has_z = flavor in (1, 3)
        has_m = flavor in (2, 3)
    return little, base, has_z, has_m, srid


def _read_u32(cur, little):
    (v,) = struct.unpack_from("<I" if little else ">I", cur.buf, cur.pos)
    cur.pos += 4
    return v


def _parse_body(cur, base, has_z, has_m, little, srid):
    dim = 2 + has_z + has_m
    if base == POINT:
        c = _read_coords(cur, 1, dim, little)[0]
        return Geom(POINT, c, has_z, has_m, srid)
    if base == LINESTRING:
        n = _read_u32(cur, little)
        return Geom(LINESTRING, _read_coords(cur, n, dim, little), has_z, has_m, srid)
    if base == POLYGON:
        nrings = _read_u32(cur, little)
        rings = []
        for _ in range(nrings):
            n = _read_u32(cur, little)
            rings.append(_read_coords(cur, n, dim, little))
        return Geom(POLYGON, rings, has_z, has_m, srid)
    if base == MULTIPOINT:
        n = _read_u32(cur, little)
        pts = np.empty((n, dim))
        for i in range(n):
            l2, b2, z2, m2, _ = _parse_header(cur)
            pts[i] = _read_coords(cur, 1, 2 + z2 + m2, l2)[0][:dim]
        return Geom(MULTIPOINT, pts, has_z, has_m, srid)
    if base == MULTILINESTRING:
        n = _read_u32(cur, little)
        lines = []
        for _ in range(n):
            l2, b2, z2, m2, _ = _parse_header(cur)
            ln = _read_u32(cur, l2)
            lines.append(_read_coords(cur, ln, 2 + z2 + m2, l2))
        return Geom(MULTILINESTRING, lines, has_z, has_m, srid)
    if base == MULTIPOLYGON:
        n = _read_u32(cur, little)
        polys = []
        for _ in range(n):
            l2, b2, z2, m2, _ = _parse_header(cur)
            nrings = _read_u32(cur, l2)
            rings = []
            for _ in range(nrings):
                ln = _read_u32(cur, l2)
                rings.append(_read_coords(cur, ln, 2 + z2 + m2, l2))
            polys.append(rings)
        return Geom(MULTIPOLYGON, polys, has_z, has_m, srid)
    if base == GEOMETRYCOLLECTION:
        n = _read_u32(cur, little)
        geoms = []
        for _ in range(n):
            l2, b2, z2, m2, s2 = _parse_header(cur)
            geoms.append(_parse_body(cur, b2, z2, m2, l2, s2))
        return Geom(GEOMETRYCOLLECTION, geoms, has_z, has_m, srid)
    raise ValueError(f"unsupported WKB type {base}")


def from_wkb(buf):
    """Parse one WKB (or EWKB) blob -> Geom. None/empty input -> None."""
    if buf is None or len(buf) == 0:
        return None
    cur = _Cur(bytes(buf))
    little, base, has_z, has_m, srid = _parse_header(cur)
    return _parse_body(cur, base, has_z, has_m, little, srid)


def _wkb_code(kind, has_z, has_m):
    return kind + (1000 if has_z else 0) + (2000 if has_m else 0)


def _w_coords(out, a):
    out.append(np.ascontiguousarray(a, dtype="<f8").tobytes())


def _write_body(out, g):
    out.append(b"\x01")
    out.append(struct.pack("<I", _wkb_code(g.kind, g.has_z, g.has_m)))
    k, d = g.kind, g.data
    if k == POINT:
        c = d if d is not None and len(d) else np.full(g.dim, np.nan)
        _w_coords(out, c)
    elif k == LINESTRING:
        out.append(struct.pack("<I", len(d)))
        _w_coords(out, d)
    elif k == POLYGON:
        out.append(struct.pack("<I", len(d)))
        for r in d:
            out.append(struct.pack("<I", len(r)))
            _w_coords(out, r)
    elif k == MULTIPOINT:
        out.append(struct.pack("<I", len(d)))
        sub = struct.pack("<I", _wkb_code(POINT, g.has_z, g.has_m))
        for row in d:
            out.append(b"\x01")
            out.append(sub)
            _w_coords(out, row)
    elif k == MULTILINESTRING:
        out.append(struct.pack("<I", len(d)))
        sub = struct.pack("<I", _wkb_code(LINESTRING, g.has_z, g.has_m))
        for line in d:
            out.append(b"\x01")
            out.append(sub)
            out.append(struct.pack("<I", len(line)))
            _w_coords(out, line)
    elif k == MULTIPOLYGON:
        out.append(struct.pack("<I", len(d)))
        sub = struct.pack("<I", _wkb_code(POLYGON, g.has_z, g.has_m))
        for rings in d:
            out.append(b"\x01")
            out.append(sub)
            out.append(struct.pack("<I", len(rings)))
            for r in rings:
                out.append(struct.pack("<I", len(r)))
                _w_coords(out, r)
    elif k == GEOMETRYCOLLECTION:
        out.append(struct.pack("<I", len(d)))
        for sub_g in d:
            _write_body(out, sub_g)
    else:
        raise ValueError(f"bad kind {k}")


def to_wkb(g):
    """Serialize Geom -> ISO WKB (little-endian). None -> None."""
    if g is None:
        return None
    out = []
    _write_body(out, g)
    return b"".join(out)


def to_ewkb(g):
    """Serialize Geom -> PostGIS EWKB: the ISO body with the SRID flag and
    SRID word spliced into the top-level header when ``g.srid`` is set
    (PostGIS tags only the outermost header). srid == 0 degrades to plain
    ISO WKB — PostGIS treats 0 as "unknown" and omits the flag too."""
    if g is None:
        return None
    iso = to_wkb(g)
    if not g.srid:
        return iso
    # EWKB top-level code: base kind + flag bits (the ISO 1000/2000 Z/M
    # offsets and the EWKB flag encoding cannot be mixed in one word)
    code = (
        g.kind
        | (_EWKB_Z if g.has_z else 0)
        | (_EWKB_M if g.has_m else 0)
        | _EWKB_SRID
    )
    return (
        b"\x01"
        + struct.pack("<I", code)
        + struct.pack("<I", g.srid)
        + iso[5:]
    )


# ---------------------------------------------------------------------------
# WKT
# ---------------------------------------------------------------------------

def _fmt_num(v):
    if v == math.floor(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords_row(row):
    return " ".join(_fmt_num(v) for v in row)


def _fmt_seq(a):
    return "(" + ", ".join(_fmt_coords_row(r) for r in a) + ")"


def to_wkt(g):
    if g is None:
        return None
    tag = g.type_name.upper()
    zm = (" Z" if g.has_z and not g.has_m else "") + (
        " M" if g.has_m and not g.has_z else ""
    ) + (" ZM" if g.has_z and g.has_m else "")
    if g.is_empty():
        return f"{tag}{zm} EMPTY"
    k, d = g.kind, g.data
    if k == POINT:
        body = f"({_fmt_coords_row(d)})"
    elif k in (LINESTRING, MULTIPOINT):
        body = _fmt_seq(d)
    elif k in (POLYGON, MULTILINESTRING):
        body = "(" + ", ".join(_fmt_seq(r) for r in d) + ")"
    elif k == MULTIPOLYGON:
        body = "(" + ", ".join(
            "(" + ", ".join(_fmt_seq(r) for r in rings) + ")" for rings in d
        ) + ")"
    else:
        body = "(" + ", ".join(to_wkt(sub) for sub in d) + ")"
    return f"{tag}{zm} {body}"


class _WktCur:
    __slots__ = ("s", "pos")

    def __init__(self, s):
        self.s = s
        self.pos = 0

    def skip_ws(self):
        while self.pos < len(self.s) and self.s[self.pos] in " \t\n\r":
            self.pos += 1

    def peek(self):
        self.skip_ws()
        return self.s[self.pos] if self.pos < len(self.s) else ""

    def expect(self, ch):
        self.skip_ws()
        if self.pos >= len(self.s) or self.s[self.pos] != ch:
            raise ValueError(f"WKT parse error at {self.pos}: expected {ch!r} in {self.s[:80]!r}")
        self.pos += 1

    def word(self):
        self.skip_ws()
        start = self.pos
        while self.pos < len(self.s) and (self.s[self.pos].isalpha()):
            self.pos += 1
        return self.s[start:self.pos].upper()

    def number(self):
        self.skip_ws()
        start = self.pos
        while self.pos < len(self.s) and self.s[self.pos] not in " \t\n\r,()":
            self.pos += 1
        return float(self.s[start:self.pos])


def _wkt_coords(cur, dim):
    cur.expect("(")
    rows = []
    while True:
        row = [cur.number() for _ in range(dim)]
        rows.append(row)
        if cur.peek() == ",":
            cur.expect(",")
        else:
            break
    cur.expect(")")
    return np.asarray(rows, dtype=np.float64)


def _wkt_point_coords(cur, dim):
    # POINT body may or may not have parens around single coord
    cur.expect("(")
    row = [cur.number() for _ in range(dim)]
    cur.expect(")")
    return np.asarray(row, dtype=np.float64)


def from_wkt(s):
    if s is None:
        return None
    s = s.strip()
    if not s:
        return None
    cur = _WktCur(s)
    return _parse_wkt_geom(cur)


def _parse_wkt_geom(cur):
    tag = cur.word()
    if tag not in NAME_KINDS:
        raise ValueError(f"unknown WKT tag {tag!r}")
    kind = NAME_KINDS[tag]
    has_z = has_m = False
    nxt = cur.word()
    if nxt in ("Z", "M", "ZM"):
        has_z = "Z" in nxt
        has_m = "M" in nxt
        nxt = cur.word()
    if nxt == "EMPTY":
        return empty(kind, has_z, has_m)
    if nxt:
        raise ValueError(f"unexpected token {nxt!r}")
    dim = 2 + has_z + has_m
    if kind == POINT:
        return Geom(POINT, _wkt_point_coords(cur, dim), has_z, has_m)
    if kind == LINESTRING:
        return Geom(LINESTRING, _wkt_coords(cur, dim), has_z, has_m)
    if kind == POLYGON:
        cur.expect("(")
        rings = [_wkt_coords(cur, dim)]
        while cur.peek() == ",":
            cur.expect(",")
            rings.append(_wkt_coords(cur, dim))
        cur.expect(")")
        return Geom(POLYGON, rings, has_z, has_m)
    if kind == MULTIPOINT:
        cur.expect("(")
        pts = []
        while True:
            if cur.peek() == "(":
                cur.expect("(")
                pts.append([cur.number() for _ in range(dim)])
                cur.expect(")")
            else:
                pts.append([cur.number() for _ in range(dim)])
            if cur.peek() == ",":
                cur.expect(",")
            else:
                break
        cur.expect(")")
        return Geom(MULTIPOINT, np.asarray(pts, dtype=np.float64), has_z, has_m)
    if kind == MULTILINESTRING:
        cur.expect("(")
        lines = [_wkt_coords(cur, dim)]
        while cur.peek() == ",":
            cur.expect(",")
            lines.append(_wkt_coords(cur, dim))
        cur.expect(")")
        return Geom(MULTILINESTRING, lines, has_z, has_m)
    if kind == MULTIPOLYGON:
        cur.expect("(")
        polys = []
        while True:
            cur.expect("(")
            rings = [_wkt_coords(cur, dim)]
            while cur.peek() == ",":
                cur.expect(",")
                rings.append(_wkt_coords(cur, dim))
            cur.expect(")")
            polys.append(rings)
            if cur.peek() == ",":
                cur.expect(",")
            else:
                break
        cur.expect(")")
        return Geom(MULTIPOLYGON, polys, has_z, has_m)
    # GeometryCollection
    cur.expect("(")
    geoms = [_parse_wkt_geom(cur)]
    while cur.peek() == ",":
        cur.expect(",")
        geoms.append(_parse_wkt_geom(cur))
    cur.expect(")")
    g = collection(geoms)
    g.has_z, g.has_m = has_z or g.has_z, has_m or g.has_m
    return g


# ---------------------------------------------------------------------------
# iteration helpers used by algorithms
# ---------------------------------------------------------------------------

def iter_simple(g):
    """Yield simple (non-collection) component Geoms of g."""
    if g.kind == GEOMETRYCOLLECTION:
        for sub in g.data:
            yield from iter_simple(sub)
    else:
        yield g


def iter_parts(g):
    """Yield single-part geometries (Point/LineString/Polygon) of g."""
    k, d = g.kind, g.data
    if k in (POINT, LINESTRING, POLYGON):
        yield g
    elif k == MULTIPOINT:
        for row in d:
            yield Geom(POINT, row, g.has_z, g.has_m)
    elif k == MULTILINESTRING:
        for line in d:
            yield Geom(LINESTRING, line, g.has_z, g.has_m)
    elif k == MULTIPOLYGON:
        for rings in d:
            yield Geom(POLYGON, rings, g.has_z, g.has_m)
    else:
        for sub in d:
            yield from iter_parts(sub)


def all_coords(g):
    """All coordinates of g as one (n, dim) array (may be empty)."""
    arrs = []
    dim = g.dim

    def _walk(gg):
        k, d = gg.kind, gg.data
        if k == POINT:
            if d is not None and len(d) and not np.isnan(d[0]):
                arrs.append(np.asarray(d).reshape(1, -1)[:, :dim])
        elif k in (LINESTRING, MULTIPOINT):
            if len(d):
                arrs.append(np.asarray(d)[:, :dim])
        elif k in (POLYGON, MULTILINESTRING):
            for r in d:
                if len(r):
                    arrs.append(np.asarray(r)[:, :dim])
        elif k == MULTIPOLYGON:
            for rings in d:
                for r in rings:
                    if len(r):
                        arrs.append(np.asarray(r)[:, :dim])
        else:
            for sub in d:
                _walk(sub)

    _walk(g)
    if not arrs:
        return np.empty((0, dim))
    return np.vstack(arrs)


def to_multi(g):
    """X -> Multi-X promotion (the infallible side of the reference cast
    matrix, rust/geoarrow-cast/src/cast.rs:56-82); multis and collections
    pass through unchanged."""
    if g is None:
        return None
    if g.kind == POINT:
        if g.is_empty():
            return empty(MULTIPOINT, g.has_z, g.has_m)
        return Geom(MULTIPOINT, g.data.reshape(1, -1), g.has_z, g.has_m)
    if g.kind == LINESTRING:
        return Geom(MULTILINESTRING, [g.data], g.has_z, g.has_m)
    if g.kind == POLYGON:
        return Geom(MULTIPOLYGON, [g.data], g.has_z, g.has_m)
    return g
