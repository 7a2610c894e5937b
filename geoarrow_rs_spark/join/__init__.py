from .spatial import grid_cells_expr, spatial_join

__all__ = ["spatial_join", "grid_cells_expr"]
