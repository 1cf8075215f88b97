"""Driver-side literal results as pure-JVM frames.

``spark.createDataFrame(rows)`` parallelizes PICKLED rows into
``defaultParallelism`` slices: every consumer of a 1-row result then
runs a 32-task stage whose tasks each spin a Python worker to unpickle
the row (measured: the noop save of one such literal was the single
most expensive stage of ``friedman_test`` — multi-second under load,
32 tasks, PythonRDD in the lineage).  A literal is better expressed as
``Project [lit(v) ...] over Range(0,1)``: one JVM task, codegen'd, no
Python worker, no pickling.

``literal_frame`` builds exactly that for small driver-side results
(the ``ks_test`` convention of eager 1-row stats operators).  Values
that cannot be expressed as Spark literals (or row counts past
``max_lit_rows``) fall back to ``createDataFrame(...).coalesce(1)`` —
same semantics, one partition, one Python deserialize task.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def literal_frame(
    spark: SparkSession,
    rows,
    schema,
    max_lit_rows: int = 16,
) -> DataFrame:
    """Build a DataFrame holding ``rows`` (collected ``Row``s) with
    ``schema`` as a JVM-literal plan; see module docstring."""
    names = [f.name for f in schema.fields]
    if 0 < len(rows) <= max_lit_rows:
        try:
            parts = []
            for r in rows:
                cols = []
                for f in schema.fields:
                    v = r[f.name]
                    lit = F.lit(v) if v is not None else F.lit(None)
                    cols.append(lit.cast(f.dataType).alias(f.name))
                parts.append(spark.range(1).select(*cols))
            return functools.reduce(DataFrame.unionByName, parts)
        except Exception:
            pass  # un-literal-able value type: fall through
    return spark.createDataFrame(rows, schema).coalesce(1)
