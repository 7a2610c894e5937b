"""Python Data Source API (Spark 4) wrappers — idiomatic
``spark.read.format(...)`` access to the custom readers.

``spark.read.format("flatgeobuf").load(path)`` plans partitions through
the same driver-side header/Hilbert-index logic as
``io.flatgeobuf.read_flatgeobuf`` (reference parity:
rust/geoarrow-flatgeobuf/src/reader/sync.rs:38), but surfaces it as a
first-class Spark source: the planner sees real InputPartitions (one per
feature-offset chunk), executors open the file themselves, and options
ride the standard reader API:

    spark.read.format("flatgeobuf")
        .option("bbox", "-20,30,40,70")      # Hilbert R-tree pruned
        .option("columns", "name,pop")       # projection
        .load("countries.fgb")

Register once per session with ``register_datasources(spark)`` (done by
``geoarrow_rs_spark.register_all``). The DataFrame-function reader stays
the primary API; this wrapper exists so format-string pipelines and SQL
``CREATE TABLE ... USING flatgeobuf`` work unchanged.
"""

from __future__ import annotations

import struct

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import BinaryType, StructField, StructType

_CHUNK = 20000  # feature offsets per partition (matches read_flatgeobuf)


class _FgbPartition(InputPartition):
    def __init__(self, extents):
        self.extents = extents  # [(off, end)]


class FlatGeobufDataSource(DataSource):
    """``format("flatgeobuf")``: schema from the FGB header, partitions
    from the feature offset table, optional bbox pushdown via the file's
    packed Hilbert R-tree."""

    @classmethod
    def name(cls):
        return "flatgeobuf"

    def _path(self):
        p = self.options.get("path")
        if not p:
            raise ValueError("flatgeobuf: .load(path) or .option('path', ...) required")
        return p

    def schema(self):
        from .flatgeobuf import _fgb_spark_type, _plan_fgb

        header, _ = _plan_fgb(self._path())
        want = None
        if self.options.get("columns"):
            want = {c.strip() for c in self.options["columns"].split(",")}
        geometry_col = self.options.get("geometry_col", "geometry")
        fields = [
            StructField(c["name"], _fgb_spark_type(c["type"]))
            for c in header["columns"]
            if want is None or c["name"] in want
        ]
        return StructType(fields + [StructField(geometry_col, BinaryType())])

    def reader(self, schema):
        return _FgbReader(self._path(), self.options, schema)


class _FgbReader(DataSourceReader):
    def __init__(self, path, options, schema):
        from .flatgeobuf import _plan_fgb

        self.path = path
        self.schema = schema
        self.bbox = None
        if options.get("bbox"):
            self.bbox = tuple(float(v) for v in options["bbox"].split(","))
        # plan at construction: the reader object is pickled to executors,
        # so header + extents computed here ship with it
        self._header, self._extents = _plan_fgb(path, self.bbox)

    def partitions(self):
        extents = self._extents
        chunks = [
            extents[i : i + _CHUNK] for i in range(0, len(extents), _CHUNK)
        ] or [[]]
        return [_FgbPartition(c) for c in chunks]

    def read(self, partition):
        from ..wkb import algorithms as alg
        from ..wkb import core as wc
        from .flatgeobuf import _decode_properties, _geometry_to_geom, _root
        from .ranges import coalesce_ranges, open_range_source

        header = self._header
        cols_meta = header["columns"]
        gtype_hint = header["geometry_type"]
        has_z = header["has_z"]
        prop_names = [f.name for f in self.schema.fields[:-1]]
        bbox = self.bbox
        with open_range_source(self.path) as src:
            for roff, rend, members in coalesce_ranges(partition.extents):
                blob = src.read_at(roff, rend - roff)
                for off, _end in members:
                    rel = int(off) - roff
                    (sz,) = struct.unpack_from("<I", blob, rel)
                    buf = blob[rel + 4 : rel + 4 + sz]
                    feat = _root(buf)
                    geom_t = feat.table(0)
                    geom = _geometry_to_geom(geom_t, gtype_hint, has_z) if geom_t else None
                    if bbox is not None and geom is not None:
                        # exact refine after the conservative index prune —
                        # identical semantics to read_flatgeobuf's post-filter
                        b = alg.bounds(geom)
                        if b is None or (
                            b[2] < bbox[0] or b[0] > bbox[2]
                            or b[3] < bbox[1] or b[1] > bbox[3]
                        ):
                            continue
                    props = _decode_properties(feat.vector_bytes(1), cols_meta)
                    yield tuple(
                        [props.get(n) for n in prop_names]
                        + [wc.to_wkb(geom) if geom is not None else None]
                    )


class _ShpPartition(InputPartition):
    def __init__(self, records):
        self.records = records  # [(rid, off, length)]


class ShapefileDataSource(DataSource):
    """``format("shapefile")``: .shx record index drives the partitions,
    .dbf supplies property columns (``read_shapefile`` parity). Pass the
    .shp path to ``.load``; the .shx/.dbf siblings are found next to it."""

    @classmethod
    def name(cls):
        return "shapefile"

    def _paths(self):
        p = self.options.get("path")
        if not p:
            raise ValueError("shapefile: .load(path.shp) required")
        import os

        # splitext, not str.replace: a '.shp' elsewhere in the path (e.g.
        # a directory named data.shp.d) must not be rewritten.
        dbf = self.options.get("dbf", os.path.splitext(p)[0] + ".dbf")
        return p, (dbf if os.path.exists(dbf) else None)

    def schema(self):
        from pyspark.sql.types import (
            BooleanType, DoubleType, LongType, StringType,
        )

        from .shapefile import _read_dbf_header

        _, dbf = self._paths()
        fields = []
        if dbf:
            _, _, _, fields = _read_dbf_header(dbf)

        def sp(ftype, fdec):
            if ftype in ("N", "F"):
                return DoubleType() if fdec > 0 else LongType()
            if ftype == "L":
                return BooleanType()
            return StringType()

        geometry_col = self.options.get("geometry_col", "geometry")
        return StructType(
            [StructField(n, sp(t, d)) for (n, t, _l, d) in fields]
            + [StructField(geometry_col, BinaryType())]
        )

    def reader(self, schema):
        return _ShpReader(*self._paths(), schema)


class _ShpReader(DataSourceReader):
    def __init__(self, shp_path, dbf_path, schema):
        from .shapefile import _read_dbf_header, _read_shx

        self.shp_path = shp_path
        self.dbf_path = dbf_path
        self.schema = schema
        import os

        self._index = _read_shx(os.path.splitext(shp_path)[0] + ".shx")
        self._dbf_meta = None
        self._fields = []
        if dbf_path:
            _, hsize, rsize, fields = _read_dbf_header(dbf_path)
            self._dbf_meta = (hsize, rsize)
            self._fields = fields

    def partitions(self):
        recs = [
            (i, off, length) for i, (off, length) in enumerate(self._index)
        ]
        chunks = [recs[i : i + 10000] for i in range(0, len(recs), 10000)] or [[]]
        return [_ShpPartition(c) for c in chunks]

    def read(self, partition):
        from ..wkb import core as wc
        from .shapefile import _decode_record, _parse_dbf_value

        dbf = open(self.dbf_path, "rb") if self.dbf_path else None
        with open(self.shp_path, "rb") as shp:
            for rid, off, length in partition.records:
                shp.seek(off + 8)
                geom = _decode_record(shp.read(length))
                vals = []
                if dbf is not None:
                    hsize, rsize = self._dbf_meta
                    dbf.seek(hsize + rid * rsize + 1)
                    raw = dbf.read(rsize - 1)
                    pos = 0
                    for (n, t, l, d) in self._fields:
                        vals.append(_parse_dbf_value(raw[pos : pos + l], t, d))
                        pos += l
                vals.append(wc.to_wkb(geom) if geom is not None else None)
                yield tuple(vals)
        if dbf is not None:
            dbf.close()


class _GpqPartition(InputPartition):
    def __init__(self, file, rg, part_vals):
        self.file = file
        self.rg = rg
        self.part_vals = part_vals  # hive key=value dirs, as strings


class GeoParquetDataSource(DataSource):
    """``format("geoparquet")``: one InputPartition per SURVIVING row group.

    Planning prunes row groups from parquet footer statistics alone — the
    covering struct's leaves when the file has one (GeoParquet 1.1 bbox
    covering), else the native coordinate leaves themselves (the
    reference's with_intersecting_row_groups over ParquetBboxStatistics,
    rust/geoparquet/src/reader/spatial_filter.rs:57-181) — then each task
    reads exactly one row group and refines with the exact per-row bbox
    test. Geometry comes back as canonical WKB whatever the stored
    encoding. Options: ``bbox`` ("xmin,ymin,xmax,ymax"), ``columns``
    (top-level projection, pushed into the row-group read), ``geometry_col``.
    Hive ``key=value`` directory levels surface as string columns.

    The DataFrame-function reader (``io.geoparquet.read_geoparquet``)
    stays the primary API; this wrapper makes format-string pipelines and
    ``CREATE TABLE ... USING geoparquet`` work, with the pruning visible
    to Spark as real InputPartitions."""

    @classmethod
    def name(cls):
        return "geoparquet"

    def _path(self):
        p = self.options.get("path")
        if not p:
            raise ValueError("geoparquet: .load(path) or .option('path', ...) required")
        local = p[len("file://"):] if p.startswith("file://") else p
        if "://" in local:
            raise ValueError(
                "geoparquet data source reads local/file:// paths; use "
                "read_geoparquet / spark.read.parquet for object stores"
            )
        return local

    def _plan_meta(self):
        from .geoparquet import _parquet_parts, read_geo_metadata

        path = self._path()
        meta = read_geo_metadata(path) or {}
        gcol = self.options.get("geometry_col") or meta.get(
            "primary_column", "geometry"
        )
        col_meta = meta.get("columns", {}).get(gcol, {})
        cov = col_meta.get("covering", {}).get("bbox")
        covering = cov["xmin"][0] if cov else None
        enc = col_meta.get("encoding", "WKB")
        return path, _parquet_parts(path), gcol, enc, covering

    def schema(self):
        import os

        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_type

        path, parts, gcol, enc, _cov = self._plan_meta()
        if not parts:
            raise ValueError(f"geoparquet: no part files under {path}")
        aschema = pq.read_schema(parts[0])
        want = None
        if self.options.get("columns"):
            want = {c.strip() for c in self.options["columns"].split(",")}
            want.add(gcol)
        fields = []
        for f in aschema:
            if want is not None and f.name not in want:
                continue
            if f.name == gcol:
                fields.append(StructField(gcol, BinaryType()))
            else:
                fields.append(StructField(f.name, from_arrow_type(f.type)))
        seen = {f.name for f in fields}
        root = path if os.path.isdir(path) else os.path.dirname(path)
        from .geoparquet import _hive_partition_values
        for k in _hive_partition_values(parts[0], root):
            if k not in seen and (want is None or k in want):
                from pyspark.sql.types import StringType

                fields.append(StructField(k, StringType()))
        return StructType(fields)

    def reader(self, schema):
        return _GpqReader(self._plan_meta(), self.options, schema)


class _GpqReader(DataSourceReader):
    def __init__(self, plan_meta, options, schema):
        import os

        from .geoparquet import _file_rowgroup_tasks, _hive_partition_values

        path, parts, gcol, enc, covering = plan_meta
        self.gcol = gcol
        self.enc = enc
        self.covering = covering
        self.schema = schema
        self.bbox = None
        if options.get("bbox"):
            self.bbox = tuple(float(v) for v in options["bbox"].split(","))
        root = path if os.path.isdir(path) else os.path.dirname(path)
        self._tasks = []
        for f in parts:
            pv = _hive_partition_values(f, root)
            if self.bbox is None:
                import pyarrow.parquet as pq

                rgs = [(rg, True) for rg in range(pq.read_metadata(f).num_row_groups)]
            else:
                rgs = _file_rowgroup_tasks(f, gcol, self.bbox, covering)
            self._tasks.extend(
                _GpqPartition(f, rg, pv) for rg, keep in rgs if keep
            )

    def partitions(self):
        return self._tasks or [_GpqPartition(None, -1, {})]

    def read(self, partition):
        if partition.file is None:
            return
        import pyarrow.parquet as pq

        from ..wkb import algorithms as alg
        from ..wkb import core as wc

        gcol = self.gcol
        names = [f.name for f in self.schema.fields]
        file_cols = [n for n in names if n not in partition.part_vals]
        tbl = pq.ParquetFile(partition.file).read_row_group(
            partition.rg, columns=file_cols
        )
        cols = {n: tbl.column(n).to_pylist() for n in file_cols}
        if self.enc != "WKB":
            from ..functions import kernels as K
            import pandas as pd

            cols[gcol] = list(K.k_from_native(pd.Series(cols[gcol]), self.enc))
        else:
            cols[gcol] = [bytes(v) if v is not None else None for v in cols[gcol]]
        n = tbl.num_rows
        keep = [True] * n
        if self.bbox is not None:
            bx0, by0, bx1, by1 = self.bbox
            for i, v in enumerate(cols[gcol]):
                if v is None:
                    keep[i] = False
                    continue
                b = alg.bounds(wc.from_wkb(v))
                keep[i] = b is not None and not (
                    b[2] < bx0 or b[0] > bx1 or b[3] < by0 or b[1] > by1
                )
        for k, v in partition.part_vals.items():
            if k in names:
                cols[k] = [v] * n
        for i in range(n):
            if keep[i]:
                yield tuple(cols[c][i] for c in names)


def register_datasources(spark):
    """Register the Python data sources on this session (idempotent).

    Only the two expected benign cases are swallowed — the API not
    existing (Spark < 4) and re-registration of the same source. Any
    other failure is a real registration problem and is re-raised so
    ``format("flatgeobuf")`` doesn't silently go missing.
    """
    registry = getattr(spark, "dataSource", None)
    if registry is None:
        return  # Spark < 4: Python DataSource API unavailable
    for src in (FlatGeobufDataSource, ShapefileDataSource, GeoParquetDataSource):
        try:
            registry.register(src)
        except Exception as exc:
            msg = str(exc).lower()
            if "already" in msg and "register" in msg:
                continue
            raise
