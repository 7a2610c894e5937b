"""GDAL/OGR bridge (io/gdal.py — reference reader.rs:14 read_gdal).

The runtime ships no GDAL, so the suite pins the guard contract and the
driver-side planning logic; when osgeo IS importable (a future env) the
real read path runs against the reference countries.fgb fixture."""

import pytest

from geoarrow_rs_spark.io import gdal as G


def _has_gdal():
    try:
        import osgeo  # noqa: F401

        return True
    except ImportError:
        return False


def test_guard_raises_clear_importerror(spark):
    if _has_gdal():
        pytest.skip("osgeo present; guard not reachable")
    with pytest.raises(ImportError, match="GDAL .*read_gdal"):
        G.read_gdal(spark, "/tmp/anything.gpkg")
    with pytest.raises(ImportError):
        G.gdal_layers("/tmp/anything.gpkg")


def test_index_ranges_cover_exactly():
    assert G._index_ranges(0, 100) == [(0, 0)]
    assert G._index_ranges(5, 100) == [(0, 5)]
    assert G._index_ranges(100, 100) == [(0, 100)]
    assert G._index_ranges(101, 100) == [(0, 100), (100, 1)]
    r = G._index_ranges(179, 64)
    assert r == [(0, 64), (64, 64), (128, 51)]
    assert sum(c for _s, c in r) == 179
    # degenerate batch size clamps to 1
    assert G._index_ranges(3, 0) == [(0, 1), (1, 1), (2, 1)]


def test_ogr_field_type_mapping():
    # public OGR codes: OFTInteger(0) OFTReal(2) OFTString(4) OFTBinary(8)
    # OFTDate(9) OFTDateTime(11) OFTInteger64(12)
    assert G._spark_field_type(0) == "long"
    assert G._spark_field_type(2) == "double"
    assert G._spark_field_type(4) == "string"
    assert G._spark_field_type(8) == "binary"
    # GetField returns date/time/datetime as strings — the schema must
    # agree or the Arrow conversion crashes on real layers
    assert G._spark_field_type(9) == "string"
    assert G._spark_field_type(11) == "string"
    assert G._spark_field_type(12) == "long"
    # list types and unknowns degrade to string, never crash
    for code in (1, 3, 5, 13, 99):
        assert G._spark_field_type(code) == "string"


@pytest.mark.skipif(not _has_gdal(), reason="osgeo not installed")
def test_read_gdal_countries_fgb(spark):
    """Real-path parity vs the native FlatGeobuf reader on the reference
    fixture (only runs where GDAL is installed)."""
    from geoarrow_rs_spark.io import read_flatgeobuf

    path = "/root/reference/fixtures/flatgeobuf/countries.fgb"
    via_gdal = G.read_gdal(spark, path)
    via_native = read_flatgeobuf(spark, path)
    assert via_gdal.count() == via_native.count() == 179
