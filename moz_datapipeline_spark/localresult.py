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
(the ``ks_test`` convention of eager small-result stats operators).
One row becomes a plain literal projection; 2..``max_lit_rows`` rows
become ONE exploded array-of-structs literal (a single Generate over
Range(0,1) — plan size stays O(rows), still zero Python).  Values
that cannot be expressed as Spark literals (or row counts past
``max_lit_rows``) fall back to ``createDataFrame(...).coalesce(1)`` —
same semantics, one partition, one Python deserialize task.

Rows may be collected ``Row``s, dicts (by field name) or plain tuples
(positional, the ``createDataFrame`` convention); the schema may be a
``StructType`` or a DDL string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _field_value(row, name: str, idx: int):
    if isinstance(row, dict):
        return row.get(name)
    if isinstance(row, (tuple, list)) and not hasattr(row, "__fields__"):
        return row[idx]
    return row[name]


def literal_frame(
    spark: SparkSession,
    rows,
    schema,
    max_lit_rows: int = 64,
) -> DataFrame:
    """Build a DataFrame holding ``rows`` with ``schema`` as a
    JVM-literal plan; see module docstring."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if 0 < len(rows) <= max_lit_rows:
        try:
            structs = []
            for r in rows:
                cols = []
                for i, f in enumerate(schema.fields):
                    v = _field_value(r, f.name, i)
                    lit = F.lit(v) if v is not None else F.lit(None)
                    cols.append(lit.cast(f.dataType).alias(f.name))
                structs.append(cols)
            if len(structs) == 1:
                return spark.range(1).select(*structs[0])
            return (
                spark.range(1)
                .select(
                    F.explode(
                        F.array(*[F.struct(*cs) for cs in structs])
                    ).alias("_r")
                )
                .select("_r.*")
            )
        except Exception:
            pass  # un-literal-able value type: fall through
    return spark.createDataFrame(rows, schema).coalesce(1)
