"""Column-API surface for the ST_* registry.

Usage::

    import geoarrow_rs_spark as gs
    from geoarrow_rs_spark import functions as stf

    gs.register_all(spark)
    df.select(stf.st_area("geom"))        # == F.expr("ST_Area(geom)")

Every SQL-registered function is also exposed as a snake_case Python function
via :func:`pyspark.sql.functions.call_udf`.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from .registry import (
    BBOX_SCHEMA,
    bbox_intersects_expr,
    bbox_overlap_expr,
    bbox_struct_expr,
    register_functions,
    _SCALAR_UDFS,
)

__all__ = [
    "register_functions",
    "bbox_intersects_expr",
    "bbox_overlap_expr",
    "bbox_struct_expr",
    "BBOX_SCHEMA",
]


def _snake(name: str) -> str:
    # ST_GeomFromWKT -> st_geomfromwkt is ugly; produce st_geom_from_wkt
    body = name[3:]
    s = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", body)
    s = re.sub(r"(?<=[A-Z])(?=[A-Z][a-z])", "_", s)
    return "st_" + s.lower()


def _make(name):
    def fn(*cols):
        args = [F.col(c) if isinstance(c, str) else (c if hasattr(c, "cast") else F.lit(c)) for c in cols]
        return F.call_udf(name, *args)

    fn.__name__ = _snake(name)
    fn.__doc__ = f"Column wrapper for SQL function {name}."
    return fn


for _name in _SCALAR_UDFS:
    _f = _make(_name)
    globals()[_f.__name__] = _f
    __all__.append(_f.__name__)

st_extent_agg = _make("ST_Extent_Agg")
st_union_agg = _make("ST_Union_Agg")
__all__ += ["st_extent_agg", "st_union_agg"]
