from .csv import read_csv_wkt, write_csv_wkt
from .geojson import read_geojson_lines, write_geojson_lines
from .geoparquet import read_geoparquet, write_geoparquet

__all__ = [
    "read_geoparquet",
    "write_geoparquet",
    "read_csv_wkt",
    "write_csv_wkt",
    "read_geojson_lines",
    "write_geojson_lines",
]
