"""Cheap construction of small driver-side DataFrames.

``spark.createDataFrame(rows, schema)`` over a Python list parallelizes
into ``defaultParallelism`` slices — 32 on this repo's local[32]
deployment — so every action that executes the frame (a 1-row stats
write, a probe's bucket collect, a broadcast join build) sets up 32
Python partition pipelines to ship a handful of pickled rows: measured
~5 s per 1-row parquet write on this box, ~0.3 s with ONE slice, every
action, steady-state (guide §4: the Python boundary is pure overhead
when the values are already on the driver — so cross it once, not 32
times).  The index mutation verbs pay that cost per stats swap — per
TRIGGER in the streamed ingest entries — and every probe pays it for
its query-term/vector frame.

:func:`small_rows_df` is a drop-in ``createDataFrame`` for BOUNDED
driver-resident row sets: identical rows, column names, types and
nullability, but sliced to one Python partition per 50k rows (min 1)
instead of one per core.  Empty row sets skip Python entirely (a pure
JVM 0-row plan with the same schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType

try:  # Spark keeps this private helper stable across 3.x/4.x
    from pyspark.sql.types import _parse_datatype_string
except ImportError:  # pragma: no cover - API moved
    _parse_datatype_string = None

_ROWS_PER_SLICE = 50_000


def small_rows_df(spark, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` minus the per-core
    Python-slice overhead: same values, same schema (incl. nullability).

    ``rows``: a list/iterable of tuples, small and driver-resident by
    contract.  ``schema``: DDL string or StructType.
    """
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        # pure-JVM empty frame with the exact declared schema — the
        # common "empty corpus" early-return never needs a Python stage
        st = schema
        if not isinstance(st, StructType) and _parse_datatype_string is not None:
            st = _parse_datatype_string(st)
        if isinstance(st, StructType) and all(f.nullable for f in st.fields):
            # lit(None) casts are nullable, so DataFrame.to(st) would
            # raise on any non-nullable field — route those through
            # createDataFrame, which accepts an empty non-nullable frame
            empty = spark.range(0).select(
                *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
            )
            return empty.to(st)
        return spark.createDataFrame([], schema)
    n_slices = max(1, len(rows) // _ROWS_PER_SLICE)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )
