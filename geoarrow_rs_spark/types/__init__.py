from .geo_types import (
    BBOX_SCHEMA,
    CRS_KEY,
    EDGES_KEY,
    ENCODING_KEY,
    GeometryTypeId,
    geo_field,
    get_crs,
    get_edges,
    is_geometry_field,
    set_crs,
    tag_geometry_column,
)

__all__ = [
    "BBOX_SCHEMA",
    "CRS_KEY",
    "EDGES_KEY",
    "ENCODING_KEY",
    "GeometryTypeId",
    "geo_field",
    "get_crs",
    "get_edges",
    "is_geometry_field",
    "set_crs",
    "tag_geometry_column",
]
