from .arrow_ipc import read_arrow_ipc, write_arrow_ipc
from .flatgeobuf import read_flatgeobuf, write_flatgeobuf
from .csv import read_csv_wkt, write_csv_wkt

# reference-name aliases (geoarrow.rust.io _csv.pyi)
read_csv = read_csv_wkt
write_csv = write_csv_wkt
from .geojson import read_geojson, read_geojson_lines, write_geojson, write_geojson_lines
from .geoparquet import (
    geoparquet_info,
    read_geoparquet,
    write_geoparquet,
    write_geoparquet_partitioned,
)
from .postgis import read_postgis
from .shapefile import read_shapefile, write_shapefile
from .gdal import gdal_layers, read_gdal

__all__ = [
    "gdal_layers",
    "read_gdal",
    "geoparquet_info",
    "read_geoparquet",
    "write_geoparquet",
    "write_geoparquet_partitioned",
    "read_csv_wkt",
    "write_csv_wkt",
    "read_geojson",
    "read_geojson_lines",
    "write_geojson",
    "write_geojson_lines",
    "read_flatgeobuf",
    "write_flatgeobuf",
    "read_shapefile",
    "write_shapefile",
    "read_arrow_ipc",
    "write_arrow_ipc",
    "read_postgis",
    "read_csv",
    "write_csv",
]
