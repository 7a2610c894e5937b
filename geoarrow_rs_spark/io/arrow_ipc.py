"""Arrow IPC (Feather v2) read/write (SURVEY.md §2.1; mirrors
/root/reference/rust/geoarrow-old/src/io/ipc).

Read: driver opens the IPC file with pyarrow (zero-copy mmap), converts per
record batch to Spark via Arrow-enabled createDataFrame. Distributed scale
path: a directory of IPC files is parallelized one-file-per-task through
``mapInArrow`` on a file-list DataFrame.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.ipc as ipc

from pyspark.sql import DataFrame, SparkSession


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Read one IPC file (or a directory of them) into a DataFrame."""
    paths = (
        [os.path.join(path, p) for p in sorted(os.listdir(path)) if p.endswith((".arrow", ".feather", ".ipc"))]
        if os.path.isdir(path)
        else [path]
    )
    if not paths:
        raise FileNotFoundError(f"no arrow IPC files under {path}")
    if len(paths) == 1:
        table = _open_table(paths[0])
        return spark.createDataFrame(table.to_pandas())

    # multi-file: parallelize the file list; each task streams its file
    import pandas as pd

    first = _open_table(paths[0])
    # schema inference needs at least one row; sample from the first
    # non-empty file
    sample = first.to_pandas().head(1)
    if len(sample) == 0:
        for p in paths[1:]:
            sample = _open_table(p).to_pandas().head(1)
            if len(sample):
                break
    spark_schema = spark.createDataFrame(sample).schema

    files_df = spark.createDataFrame([(p,) for p in paths], schema="path string")

    def load(batches):
        for pdf in batches:
            for p in pdf["path"]:
                yield _open_table(p).to_pandas()

    return files_df.mapInPandas(load, schema=spark_schema)


def _open_table(p: str) -> pa.Table:
    try:
        with ipc.open_file(p) as r:
            return r.read_all()
    except pa.ArrowInvalid:
        with ipc.open_stream(p) as r:
            return r.read_all()


def write_arrow_ipc(df: DataFrame, path: str, batch_size: int = 65536):
    """Driver-side IPC write (single-file interchange format => single
    writer), streamed through ``toLocalIterator`` like the FGB/shapefile
    writers: peak driver memory is one prefetched partition plus one
    ``batch_size`` row buffer, never the whole DataFrame.

    Throughput ceiling: one driver-side writer => single-disk bandwidth
    (~100s of MB/s), regardless of cluster size. For exports beyond a few
    GB use the distributed sink (``write_geoparquet`` — one file per
    task) and convert per-file downstream if IPC is truly required."""
    import pandas as pd

    from pyspark.sql.pandas.types import to_arrow_schema

    pa_schema = to_arrow_schema(df.schema)
    cols = df.columns
    with ipc.new_file(path, pa_schema) as w:

        def flush(rows):
            pdf = pd.DataFrame.from_records(rows, columns=cols)
            w.write_batch(
                pa.RecordBatch.from_pandas(pdf, schema=pa_schema, preserve_index=False)
            )

        buf = []
        for row in df.toLocalIterator(prefetchPartitions=True):
            buf.append(tuple(row))
            if len(buf) >= batch_size:
                flush(buf)
                buf = []
        if buf:
            flush(buf)
