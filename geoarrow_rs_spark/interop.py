"""Optional-ecosystem interop (shapely / geopandas), guarded behind import.

Mirrors the reference's interop surface
(/root/reference/python/geoarrow-core/src/interop/shapely/ — from_shapely /
to_shapely over WKB) re-expressed for Spark DataFrames. This runtime ships
neither shapely nor geopandas, so every entry point degrades to a clear
ImportError while the WKB bridging logic stays importable and unit-testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _require(mod_name: str):
    try:
        import importlib

        return importlib.import_module(mod_name)
    except ImportError as e:  # pragma: no cover - env has no shapely
        raise ImportError(
            f"{mod_name} is not installed in this environment; "
            f"geoarrow_rs_spark.interop.{mod_name}-based conversions need it. "
            "All engine functionality works without it — interop only bridges "
            "in-memory Python objects."
        ) from e


def from_shapely(spark, geoms, id_col: str = "id", geometry_col: str = "geometry"):
    """shapely geometries -> Spark DataFrame with a WKB geometry column
    (from_shapely parity). Serialization happens locally via shapely's own
    WKB writer; Spark sees plain binary rows."""
    shapely = _require("shapely")
    rows = [
        (i, bytes(shapely.to_wkb(g, flavor="iso")) if g is not None else None)
        for i, g in enumerate(geoms)
    ]
    return spark.createDataFrame(rows, schema=f"{id_col} long, {geometry_col} binary")


def to_shapely(df: DataFrame, geometry_col: str = "geometry", limit: int | None = None):
    """WKB geometry column -> list of shapely geometries (to_shapely parity).
    Collects to the driver — pass ``limit`` for big frames."""
    shapely = _require("shapely")
    take = df.select(geometry_col)
    if limit is not None:
        take = take.limit(limit)
    return [
        shapely.from_wkb(bytes(r[geometry_col])) if r[geometry_col] is not None else None
        for r in take.collect()
    ]


def to_geopandas(df: DataFrame, geometry_col: str = "geometry", crs=None):
    """Spark DataFrame -> GeoDataFrame (driver-side; small results)."""
    gpd = _require("geopandas")
    shapely = _require("shapely")
    pdf = df.toPandas()
    pdf[geometry_col] = pdf[geometry_col].map(
        lambda v: shapely.from_wkb(bytes(v)) if v is not None else None
    )
    return gpd.GeoDataFrame(pdf, geometry=geometry_col, crs=crs)


def from_geopandas(spark, gdf, geometry_col: str = "geometry"):
    """GeoDataFrame -> Spark DataFrame with WKB geometry."""
    shapely = _require("shapely")
    pdf = gdf.copy()
    pdf[geometry_col] = [
        bytes(shapely.to_wkb(g, flavor="iso")) if g is not None else None
        for g in gdf.geometry
    ]
    return spark.createDataFrame(pdf)
