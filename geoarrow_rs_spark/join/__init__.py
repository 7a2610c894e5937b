from .asof import asof_join
from .skew import salted_join
from .spatial import (
    bucketed_spatial_join,
    grid_cells_expr,
    spatial_join,
    write_grid_bucketed,
)

__all__ = [
    "asof_join",
    "salted_join",
    "spatial_join",
    "grid_cells_expr",
    "write_grid_bucketed",
    "bucketed_spatial_join",
]
