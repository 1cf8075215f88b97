"""localresult.literal_frame — driver-side literal results as JVM plans.

The contract (see the module docstring): small collected results come
back as a codegen'd ``Project [lit...] over Range(0,1)`` union — no
Python-worker scan, no pickled parallelize — and anything the literal
path cannot express falls back to ``createDataFrame(...).coalesce(1)``
with identical values.
"""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import types as T

from moz_datapipeline_spark.localresult import literal_frame

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BooleanType()),
    ]
)


def test_literal_path_plan_has_no_python_scan(spark):
    rows = [Row(k=3, x=1.5, s="a", b=True)]
    out = literal_frame(spark, rows, SCHEMA)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Range" in plan, plan
    for marker in ("ExistingRDD", "PythonRDD", "BatchEvalPython"):
        assert marker not in plan, plan


def test_literal_values_round_trip_exactly(spark):
    rows = [
        Row(k=3, x=0.1 + 0.2, s="a", b=True),
        Row(k=None, x=float("nan"), s=None, b=None),
    ]
    out = literal_frame(spark, rows, SCHEMA).collect()
    assert out[0]["k"] == 3 and out[0]["x"] == 0.1 + 0.2
    assert out[0]["s"] == "a" and out[0]["b"] is True
    assert out[1]["k"] is None and math.isnan(out[1]["x"])
    assert out[1]["s"] is None and out[1]["b"] is None
    assert [f.name for f in literal_frame(spark, rows, SCHEMA).schema.fields] == [
        "k",
        "x",
        "s",
        "b",
    ]


def test_fallback_past_max_lit_rows_single_partition(spark):
    rows = [Row(k=i, x=float(i), s=str(i), b=bool(i % 2)) for i in range(40)]
    out = literal_frame(spark, rows, SCHEMA, max_lit_rows=16)
    assert out.rdd.getNumPartitions() == 1
    got = sorted(r["k"] for r in out.collect())
    assert got == list(range(40))


def test_nested_type_round_trips_whichever_path(spark):
    # arrays may or may not be literal-able depending on the Spark
    # version — the contract is only that values survive verbatim
    schema = T.StructType(
        [T.StructField("a", T.ArrayType(T.LongType()))]
    )
    rows = [Row(a=[1, 2, 3])]
    out = literal_frame(spark, rows, schema)
    assert out.collect()[0]["a"] == [1, 2, 3]
