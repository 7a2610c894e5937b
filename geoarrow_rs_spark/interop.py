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


GEOARROW_WKB_EXT = "geoarrow.wkb"


def to_pyarrow(df: DataFrame, geometry_col: str = "geometry", crs=None):
    """Spark DataFrame -> pyarrow Table whose geometry field carries
    GeoArrow extension metadata (ARROW:extension:name = geoarrow.wkb,
    extension:metadata = {crs}) — the reference's ``to_arrow`` surface
    (python/geoarrow-core interop). Collects to the driver (pyarrow is an
    in-memory bridge; for datasets use the GeoParquet writer instead)."""
    import json as _json

    import pyarrow as pa

    pdf = df.toPandas()
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    i = table.schema.get_field_index(geometry_col)
    field = table.schema.field(i)
    meta = {b"ARROW:extension:name": GEOARROW_WKB_EXT.encode()}
    ext = {}
    if crs is not None:
        ext["crs"] = crs
    meta[b"ARROW:extension:metadata"] = _json.dumps(ext).encode()
    new_field = pa.field(field.name, field.type, field.nullable, metadata=meta)
    return table.set_column(i, new_field, table.column(i))


def from_pyarrow(spark, table, geometry_col: str = None):
    """pyarrow Table (optionally GeoArrow-tagged) -> Spark DataFrame with a
    WKB geometry column (``from_arrow`` parity). The geometry field is
    found by its ARROW:extension:name when not named explicitly."""
    if geometry_col is None:
        for field in table.schema:
            md = field.metadata or {}
            if md.get(b"ARROW:extension:name", b"").decode().startswith("geoarrow."):
                geometry_col = field.name
                break
    pdf = table.to_pandas()
    if geometry_col is not None:
        pdf[geometry_col] = pdf[geometry_col].map(
            lambda v: bytes(v) if v is not None else None
        )
    return spark.createDataFrame(pdf)
