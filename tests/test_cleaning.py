"""Unit tests for the scalar cleaning/recoding surface (reference
semantics from scripts/utils/utils.js:140-162, vulnerability.js:209-221)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _vals(spark, fn, inputs):
    df = spark.createDataFrame([(v,) for v in inputs], "x string")
    return [r["y"] for r in df.select(fn("x").alias("y")).collect()]


def test_road_class_defaults(spark):
    from moz_datapipeline_spark.functions.cleaning import road_class

    got = _vals(spark, road_class, ["Primary", "N/A", None, "Vicinal", ""])
    assert got == ["primary", "secondary", "secondary", "vicinal", "secondary"]


def test_surface_type_defaults(spark):
    from moz_datapipeline_spark.functions.cleaning import surface_type

    got = _vals(spark, surface_type, ["Paved", "Unpaved", "gravel", None])
    assert got == ["paved", "unpaved", "unpaved", "unpaved"]


def test_road_condition_collapse(spark):
    from moz_datapipeline_spark.functions.cleaning import road_condition

    got = _vals(spark, road_condition, ["Good", "Very Poor", "N/A", None, "Fair"])
    assert got == ["good", "poor", "poor", "poor", "fair"]


def test_flood_severity_bands(spark):
    from moz_datapipeline_spark.functions.cleaning import flood_severity

    df = spark.createDataFrame(
        [(0.0,), (0.19,), (0.2,), (0.5,), (0.51,), (1.5,), (1.51,), (20.0,)],
        "d double",
    )
    got = [r["s"] for r in df.select(flood_severity("d").alias("s")).collect()]
    assert got == ["none", "none", "low", "low", "medium", "medium", "high", "high"]


def test_camel_case():
    from moz_datapipeline_spark.functions.cleaning import camel_case

    assert camel_case("flood-ead") == "floodEad"
    assert camel_case("ag-potential") == "agPotential"
    assert camel_case("aadt") == "aadt"
    assert camel_case("a_b_c") == "aBC"


def test_shapefile_reader_rejects_non_wgs84_target(spark):
    from moz_datapipeline_spark.sources.readers import read_shapefile

    with pytest.raises(NotImplementedError, match="EPSG:4326"):
        read_shapefile(spark, "/nonexistent.shp", target_crs="EPSG:3857")


def test_quantile_normalize_cdf_properties(spark):
    import pytest as _pytest

    from moz_datapipeline_spark.functions.scaling import quantile_normalize

    # self-normalizing a uniform ramp recovers the uniform CDF
    vals = [float(i) for i in range(101)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {
        r.x: r.x_qnorm
        for r in quantile_normalize(df, "x", q=100).collect()
    }
    for v in vals:
        assert abs(rows[v] - v / 100.0) < 1e-9

    # out-of-range values clamp against a shifted reference; NULL stays
    ref = spark.createDataFrame(
        [(float(i),) for i in range(50, 151)], "x double"
    )
    cur = spark.createDataFrame(
        [(0.0,), (100.0,), (999.0,), (None,)], "x double"
    )
    got = {
        r.x: r.x_qnorm
        for r in quantile_normalize(cur, "x", reference=ref).collect()
    }
    assert got[0.0] == 0.0 and got[999.0] == 1.0
    assert abs(got[100.0] - 0.5) < 1e-9
    assert got[None] is None

    # monotone under heavy ties in the reference
    tied = spark.createDataFrame(
        [(1.0,)] * 90 + [(2.0,)] * 10, "x double"
    )
    pairs = sorted(
        (r.x, r.x_qnorm)
        for r in quantile_normalize(
            tied.distinct(), "x", reference=tied, q=10
        ).collect()
    )
    assert pairs[0][1] <= pairs[1][1]

    with _pytest.raises(ValueError):
        quantile_normalize(df, "x", q=0)
