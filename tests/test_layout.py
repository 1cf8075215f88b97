"""Physical-layout operators: bucketed tables (exchange-free joins)
and Z-order clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from moz_datapipeline_spark.sources.layout import (
    write_bucketed,
    zorder_layout,
    zorder_value,
)


def _py_zorder(x: int, y: int, bits: int) -> int:
    z = 0
    for k in range(bits):
        z += ((x >> k) & 1) << (2 * k)
        z += ((y >> k) & 1) << (2 * k + 1)
    return z


def test_zorder_value_matches_reference(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 100, 1023) for y in (0, 3, 7, 512)],
        "x long, y long",
    )
    got = df.select("x", "y", zorder_value("x", "y", bits=10).alias("z")).collect()
    for r in got:
        assert r["z"] == _py_zorder(r["x"], r["y"], 10), (r["x"], r["y"])


def test_zorder_value_rejects_bad_bits(spark):
    with pytest.raises(ValueError):
        zorder_value("x", "y", bits=0)
    with pytest.raises(ValueError):
        zorder_value("x", "y", bits=40)
    with pytest.raises(ValueError, match="64-bit"):
        zorder_value("x", "y", "z", "w", bits=16)  # 64 result bits
    with pytest.raises(ValueError, match="2 columns"):
        zorder_value("x")


def _py_zorder_n(vals: tuple, bits: int) -> int:
    n = len(vals)
    z = 0
    for k in range(bits):
        for i, v in enumerate(vals):
            z += ((v >> k) & 1) << (n * k + i)
    return z


def test_zorder_value_n_dimensional(spark):
    """The generalized interleave: 3-D matches the reference bit model,
    2-D stays byte-identical to the historical form, and zorder_layout
    over 3 columns preserves the row multiset."""
    df = spark.createDataFrame(
        [
            (x, y, z)
            for x in (0, 1, 5, 100)
            for y in (0, 3, 512)
            for z in (0, 7, 1023)
        ],
        "x long, y long, z long",
    )
    got = df.select(
        "x", "y", "z",
        zorder_value("x", "y", bits=10).alias("z2"),
        zorder_value("x", "y", "z", bits=10).alias("z3"),
    ).collect()
    for r in got:
        assert r["z2"] == _py_zorder(r["x"], r["y"], 10)
        assert r["z2"] == _py_zorder_n((r["x"], r["y"]), 10)
        assert r["z3"] == _py_zorder_n((r["x"], r["y"], r["z"]), 10)

    out = zorder_layout(df, "x", "y", "z", bits=10, num_partitions=3)
    before = sorted(map(tuple, df.collect()))
    after = sorted((r["x"], r["y"], r["z"]) for r in out.collect())
    assert after == before  # multiset preserved, order-only transform


def test_zorder_layout_preserves_rows_and_sorts(spark):
    df = spark.createDataFrame(
        [((i * 37) % 256, (i * 91) % 256) for i in range(2000)],
        "x long, y long",
    )
    out = zorder_layout(df, "x", "y", bits=8, num_partitions=4)
    rows = out.select(
        F.spark_partition_id().alias("pid"), "zvalue", "x", "y"
    ).collect()
    assert len(rows) == 2000
    # content preserved as a multiset
    assert sorted((r["x"], r["y"]) for r in rows) == sorted(
        ((i * 37) % 256, (i * 91) % 256) for i in range(2000)
    )
    # physically sorted along the curve within every partition
    by_pid: dict[int, list[int]] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["zvalue"])
    for zs in by_pid.values():
        assert zs == sorted(zs)


def test_bucketed_join_eliminates_exchange(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "bkt_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "bkt_lineitem", "o_orderkey", 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_orders").join(
            spark.table("bkt_lineitem"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        # and it still computes the right thing
        want = orders.join(lineitem, "o_orderkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_write_bucketed_rejects_bad_count(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        write_bucketed(df, "nope", "id", 0)


def test_partitioned_write_prunes_at_planning_time(spark, tmp_path, sf_dir):
    import io
    from contextlib import redirect_stdout

    from moz_datapipeline_spark.sources.layout import write_partitioned

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    out = str(tmp_path / "orders_by_priority")
    write_partitioned(orders, out, ["o_orderpriority"])

    pruned = spark.read.parquet(out).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    # the partition predicate must prune directories at planning time,
    # not run as a row-level data filter
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert pruned.count() == want

    with pytest.raises(ValueError):
        write_partitioned(orders, out, [])
