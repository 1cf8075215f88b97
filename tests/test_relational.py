"""Relational division (operators/relational.relational_division)."""

from __future__ import annotations

import pytest

from moz_datapipeline_spark.operators.relational import (
    relational_division,
)


def test_division_basic(spark):
    # s1 supplies all of {p1,p2,p3}; s2 misses p3; s3 supplies extras
    supplies = spark.createDataFrame(
        [
            ("s1", "p1"), ("s1", "p2"), ("s1", "p3"),
            ("s2", "p1"), ("s2", "p2"),
            ("s3", "p1"), ("s3", "p2"), ("s3", "p3"), ("s3", "p9"),
            ("s1", "p1"),  # duplicate must not double-count
        ],
        "supplier string, part string",
    )
    kit = spark.createDataFrame(
        [("p1",), ("p2",), ("p3",), ("p3",)], "part string"
    )
    got = sorted(
        r.supplier
        for r in relational_division(
            supplies, ["supplier"], ["part"], kit
        ).collect()
    )
    assert got == ["s1", "s3"]


def test_division_empty_divisor_is_vacuously_all_keys(spark):
    supplies = spark.createDataFrame(
        [("s1", "p1"), ("s2", "p2")], "supplier string, part string"
    )
    empty = spark.createDataFrame([], "part string")
    got = sorted(
        r.supplier
        for r in relational_division(
            supplies, ["supplier"], ["part"], empty
        ).collect()
    )
    assert got == ["s1", "s2"]


def test_division_composite_keys_and_values(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, "x", 10), ("a", 1, "y", 20),
            ("a", 2, "x", 10),
            ("b", 1, "x", 10), ("b", 1, "y", 20),
        ],
        "k1 string, k2 int, v1 string, v2 int",
    )
    div = spark.createDataFrame(
        [("x", 10), ("y", 20)], "v1 string, v2 int"
    )
    got = sorted(
        (r.k1, r.k2)
        for r in relational_division(
            df, ["k1", "k2"], ["v1", "v2"], div
        ).collect()
    )
    assert got == [("a", 1), ("b", 1)]


def test_division_rejects_empty_specs(spark):
    df = spark.createDataFrame([("a", "b")], "k string, v string")
    with pytest.raises(ValueError):
        relational_division(df, [], ["v"], df.select("v"))
