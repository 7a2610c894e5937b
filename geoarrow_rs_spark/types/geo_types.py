"""Geometry type/schema system on Spark (SURVEY.md §1, build-plan item 1).

Mirrors the reference's schema crate
(/root/reference/rust/geoarrow-schema/src/{datatype.rs,metadata.rs,crs.rs,
edges.rs,type_id.rs}) on Spark's schema machinery:

- geometry columns are WKB ``BinaryType`` with entries in
  ``StructField.metadata`` standing in for Arrow's
  ``ARROW:extension:name``/``ARROW:extension:metadata``;
- CRS may be an authority:code string, SRID int, PROJJSON dict, or WKT2
  string (crs.rs:36-140 variants), stored as-is;
- ``edges`` declares edge interpretation: planar | spherical | andoyer |
  karney | thomas | vincenty (edges.rs:35-60);
- GeoArrow type ids follow type_id.rs:12-35 (dim_order*10 + geometry kind).

Spark drops field metadata on derived columns, so functions that *create*
geometry re-tag via :func:`tag_geometry_column`; IO writers read these tags
to emit GeoParquet ``geo`` metadata.
"""

from __future__ import annotations

from enum import IntEnum

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StructField,
    StructType,
)

ENCODING_KEY = "geoarrow.encoding"   # "wkb" (canonical) | "wkt"
CRS_KEY = "geoarrow.crs"
EDGES_KEY = "geoarrow.edges"

VALID_EDGES = {"planar", "spherical", "andoyer", "karney", "thomas", "vincenty"}

BBOX_SCHEMA = StructType(
    [
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
    ]
)


class GeometryTypeId(IntEnum):
    """GeoArrow type ids (type_id.rs:12-35): dim_order*10 + kind;
    XY=0x, XYZ=1x, XYM=2x, XYZM=3x."""

    POINT = 1
    LINESTRING = 2
    POLYGON = 3
    MULTIPOINT = 4
    MULTILINESTRING = 5
    MULTIPOLYGON = 6
    GEOMETRYCOLLECTION = 7
    POINT_Z = 11
    LINESTRING_Z = 12
    POLYGON_Z = 13
    MULTIPOINT_Z = 14
    MULTILINESTRING_Z = 15
    MULTIPOLYGON_Z = 16
    GEOMETRYCOLLECTION_Z = 17
    POINT_M = 21
    POINT_ZM = 31


def geo_field(
    name: str = "geometry",
    crs=None,
    edges: str = "planar",
    encoding: str = "wkb",
    nullable: bool = True,
) -> StructField:
    """A tagged WKB geometry StructField."""
    if edges not in VALID_EDGES:
        raise ValueError(f"edges must be one of {sorted(VALID_EDGES)}")
    md = {ENCODING_KEY: encoding, EDGES_KEY: edges}
    if crs is not None:
        md[CRS_KEY] = crs
    return StructField(name, BinaryType(), nullable, metadata=md)


def is_geometry_field(field: StructField) -> bool:
    md = field.metadata or {}
    return ENCODING_KEY in md or str(md.get("ARROW:extension:name", "")).startswith(
        "geoarrow"
    )


def tag_geometry_column(
    df: DataFrame, col: str, crs=None, edges: str = "planar"
) -> DataFrame:
    """Attach geometry metadata to an existing (WKB binary) column.

    Metadata survives df.schema round-trips and parquet writes (Spark stores
    field metadata in its parquet schema); mirrors the reference's
    ``ARROW:extension:metadata`` JSON ({"crs":...,"edges":...},
    metadata.rs:93)."""
    md = {ENCODING_KEY: "wkb", EDGES_KEY: edges}
    if crs is not None:
        md[CRS_KEY] = crs
    return df.withMetadata(col, md)


def get_crs(df: DataFrame, col: str):
    """CRS of a tagged geometry column (None if untagged) — the Spark
    translation of python geoarrow.rust.core get_crs (_crs.py)."""
    md = df.schema[col].metadata or {}
    return md.get(CRS_KEY)


def set_crs(df: DataFrame, col: str, crs, edges: str = None) -> DataFrame:
    md = dict(df.schema[col].metadata or {})
    md[CRS_KEY] = crs
    md.setdefault(ENCODING_KEY, "wkb")
    if edges is not None:
        md[EDGES_KEY] = edges
    return df.withMetadata(col, md)


def get_edges(df: DataFrame, col: str):
    md = df.schema[col].metadata or {}
    return md.get(EDGES_KEY, "planar")
