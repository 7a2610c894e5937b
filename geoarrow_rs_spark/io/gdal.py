"""GDAL/OGR vector read bridge.

Reference surface: geoarrow-old/src/io/gdal/reader.rs:14 (``read_gdal`` —
an OGR layer streamed to Arrow batches with WKB geometry). The Spark
translation plans FID ranges on the driver and lets each task open the
dataset and decode its own range to WKB + attribute columns, so the read
is distributed like the FlatGeobuf/Shapefile readers.

This runtime ships no GDAL, so the entry point degrades to a clear
ImportError (the same guard convention as interop.py's shapely bridge)
while the planning/type-mapping logic stays importable and
unit-testable. When ``osgeo`` IS present the path is exercised by the
same tests, which skip otherwise.
"""

from __future__ import annotations

import math


def _require_ogr():
    try:
        from osgeo import ogr  # noqa: F401

        ogr.UseExceptions()
        return ogr
    except ImportError as e:  # pragma: no cover - env has no GDAL
        raise ImportError(
            "GDAL (osgeo) is not installed in this environment; read_gdal "
            "needs it. The built-in GeoParquet / FlatGeobuf / GeoJSON / "
            "CSV / Shapefile / PostGIS readers cover the common formats "
            "without GDAL."
        ) from e


# public OGR field-type codes (gdal/ogr/ogr_core.h) -> Spark SQL types.
# List types land as strings (OGR's own CSV representation — the long
# tail of drivers that emit lists do not round-trip them consistently),
# and so do date/time/datetime: ``Feature.GetField`` returns them as
# strings ('2021/03/05 12:34:56'), so declaring Date/Timestamp types
# would crash the Arrow conversion; callers cast with to_date/
# to_timestamp and the format they know their data uses.
_OGR_FIELD_TYPES = {
    0: "long",      # OFTInteger
    1: "string",    # OFTIntegerList
    2: "double",    # OFTReal
    3: "string",    # OFTRealList
    4: "string",    # OFTString
    5: "string",    # OFTStringList
    8: "binary",    # OFTBinary
    9: "string",    # OFTDate
    10: "string",   # OFTTime
    11: "string",   # OFTDateTime
    12: "long",     # OFTInteger64
    13: "string",   # OFTInteger64List
}


def _spark_field_type(ogr_code: int) -> str:
    return _OGR_FIELD_TYPES.get(int(ogr_code), "string")


def _index_ranges(n_features: int, batch_size: int):
    """[(start, count), ...] covering [0, n_features) — the driver-side
    plan; each range becomes one task."""
    if n_features <= 0:
        return [(0, 0)]
    batch_size = max(1, int(batch_size))
    n_parts = math.ceil(n_features / batch_size)
    return [
        (i * batch_size, min(batch_size, n_features - i * batch_size))
        for i in range(n_parts)
    ]


def read_gdal(
    spark,
    path: str,
    layer=None,
    batch_size: int = 65536,
    geometry_col: str = "geometry",
):
    """OGR dataset layer -> DataFrame with ISO-WKB geometry + attribute
    columns, CRS tagged from the layer's spatial reference (WKT).

    Distribution: the driver reads only the layer schema and feature
    count; each task re-opens the dataset (GDAL handles are not
    picklable) and scans its own index range via ``SetNextByIndex`` —
    sequential access every OGR driver supports, fast where the driver
    advertises OLCFastSetNextByIndex. One task per ``batch_size``
    features.
    """
    ogr = _require_ogr()
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ds = ogr.Open(path)
    if ds is None:
        raise ValueError(f"GDAL cannot open {path!r}")
    lyr = (
        ds.GetLayerByName(layer)
        if isinstance(layer, str)
        else ds.GetLayer(layer or 0)
    )
    if lyr is None:
        raise ValueError(f"layer {layer!r} not found in {path!r}")
    defn = lyr.GetLayerDefn()
    fields = [
        (
            defn.GetFieldDefn(i).GetName(),
            _spark_field_type(defn.GetFieldDefn(i).GetType()),
        )
        for i in range(defn.GetFieldCount())
    ]
    n = lyr.GetFeatureCount(1)
    srs = lyr.GetSpatialRef()
    crs_wkt = srs.ExportToWkt() if srs is not None else None

    spark_types = {
        "long": LongType(),
        "double": DoubleType(),
        "string": StringType(),
        "binary": BinaryType(),
    }
    out_schema = StructType(
        [StructField("fid", LongType())]
        + [StructField(nm, spark_types[t]) for nm, t in fields]
        + [StructField(geometry_col, BinaryType())]
    )
    field_names = [nm for nm, _t in fields]

    ranges = spark.createDataFrame(
        _index_ranges(n, batch_size), schema="start long, count long"
    )

    def decode(batches):
        from osgeo import ogr as togr

        togr.UseExceptions()
        tds = togr.Open(path)
        tlyr = (
            tds.GetLayerByName(layer)
            if isinstance(layer, str)
            else tds.GetLayer(layer or 0)
        )
        for pdf in batches:
            for _, r in pdf.iterrows():
                start, count = int(r["start"]), int(r["count"])
                if count <= 0:
                    continue
                rows = []
                tlyr.ResetReading()
                tlyr.SetNextByIndex(start)
                for _i in range(count):
                    feat = tlyr.GetNextFeature()
                    if feat is None:
                        break
                    row = {"fid": feat.GetFID()}
                    for j, nm in enumerate(field_names):
                        row[nm] = (
                            feat.GetField(j) if feat.IsFieldSet(j) else None
                        )
                    g = feat.GetGeometryRef()
                    row[geometry_col] = (
                        bytes(g.ExportToIsoWkb()) if g is not None else None
                    )
                    rows.append(row)
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in out_schema.fields]
                    )

    out = ranges.repartition(max(1, len(_index_ranges(n, batch_size)))) \
        .mapInPandas(decode, schema=out_schema)
    if crs_wkt:
        from ..types.geo_types import set_crs

        out = set_crs(out, geometry_col, crs_wkt)
    return out


def gdal_layers(path: str):
    """Layer names in an OGR dataset (driver-side metadata probe)."""
    ogr = _require_ogr()
    ds = ogr.Open(path)
    if ds is None:
        raise ValueError(f"GDAL cannot open {path!r}")
    return [ds.GetLayer(i).GetName() for i in range(ds.GetLayerCount())]
