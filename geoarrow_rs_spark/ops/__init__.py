from .table import (
    downcast_geometry_type,
    explode_geometries,
    geometry_columns,
    infer_geometry_type,
    total_bounds,
    with_bbox,
)

__all__ = [
    "explode_geometries",
    "total_bounds",
    "with_bbox",
    "geometry_columns",
    "infer_geometry_type",
    "downcast_geometry_type",
]
