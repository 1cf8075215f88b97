"""As-of join edge semantics."""

from __future__ import annotations


def test_asof_backward_inclusive(spark):
    from moz_datapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "k", 100, "a"), (2, "k", 200, "b"), (3, "k", 50, "c")],
        "id int, key string, ts long, payload string",
    )
    right = spark.createDataFrame(
        [("k", 100, 1.0), ("k", 150, 2.0), ("k", 999, 9.0)],
        "key string, ts long, v double",
    )
    out = (
        asof_join(left, right, key="key", ts="ts", right_value_cols=["v"])
        .toPandas()
        .set_index("id")
    )
    # ts=100 matches the right row AT 100 (inclusive)
    assert out.loc[1, "v_right"] == 1.0 and out.loc[1, "ts_right"] == 100
    # ts=200: latest at-or-before is 150
    assert out.loc[2, "v_right"] == 2.0
    # ts=50: nothing before → nulls
    assert out.loc[3, "v_right"] != out.loc[3, "v_right"] or out.loc[3, "v_right"] is None


def test_asof_keys_isolated(spark):
    from moz_datapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "a", 100, "x"), (2, "b", 100, "y")],
        "id int, key string, ts long, payload string",
    )
    right = spark.createDataFrame(
        [("a", 10, 5.0)], "key string, ts long, v double"
    )
    out = asof_join(left, right, key="key", ts="ts", right_value_cols=["v"])
    rows = {r["id"]: r["v_right"] for r in out.collect()}
    assert rows[1] == 5.0
    assert rows[2] is None  # other key never sees a's rows
