"""Network enrichment — the reference's ``additional-props`` stage.

Reference: scripts/additional-props/additional-props.js. Adds to each
way: geometric length (P12, :57-60), province ISO via lowercased-name
join (J6, :62-66), its bridges as an array of structs (J7, :68-76),
flood depth/length arrays aligned to the 10 return periods (J8,
:78-87), and the RUC linear rescale (P9, :89-91).

One Catalyst DAG: two broadcast joins (provinces, flood stats are small
per-way tables), one groupBy for the bridge collect, all scalar work
codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moz_datapipeline_spark.functions.arrays import RETURN_PERIODS
from moz_datapipeline_spark.functions.geo import linestring_length_km
from moz_datapipeline_spark.functions.scaling import linear_rescale, round_half_up


def add_length(ways: DataFrame, coords_col: str = "coordinates") -> DataFrame:
    """Great-circle length (km), rounded to 2 — additional-props.js:57-60."""
    return ways.withColumn(
        "length", round_half_up(linestring_length_km(coords_col), 2)
    )


def add_province_iso(ways: DataFrame, provinces: DataFrame) -> DataFrame:
    """J6: lowercase-name equi join to the (small) province table."""
    p = provinces.select(
        F.lower(F.col("name")).alias("_pname"), F.col("iso").alias("provinceIso")
    )
    return ways.join(
        F.broadcast(p), F.lower(F.col("PROVINCE")) == F.col("_pname"), "left"
    ).drop("_pname")


def add_bridges(ways: DataFrame, bridges: DataFrame) -> DataFrame:
    """J7/A10: aggregate each way's bridges into array<struct<type,length>>.

    Sorted collect keeps the array deterministic under any partitioning.
    """
    agg = bridges.groupBy(
        F.col("roadSegmentID").alias("_way")
    ).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("type"), F.col("length")))
        ).alias("bridges")
    )
    return ways.join(agg, ways["NAME"] == agg["_way"], "left").drop("_way")


def add_flood_arrays(ways: DataFrame, flood_stats: DataFrame) -> DataFrame:
    """J8/U2: long flood table → fixed 10-element arrays per way.

    ``flood_stats``: (way_id, return_period, max_depth_m, pct_flooded).
    Pivot by the fixed period list (bounded width), then pack arrays in
    period order; missing periods → 0 (reference treats absent stats as
    dry, additional-props.js:83-87).
    """
    pivoted = (
        flood_stats.groupBy("way_id")
        .pivot("return_period", list(RETURN_PERIODS))
        .agg(
            F.first("max_depth_m").alias("d"),
            F.first("pct_flooded").alias("l"),
        )
    )
    depth_cols = [F.coalesce(F.col(f"{p}_d"), F.lit(0.0)) for p in RETURN_PERIODS]
    len_cols = [F.coalesce(F.col(f"{p}_l"), F.lit(0.0)) for p in RETURN_PERIODS]
    packed = pivoted.select(
        F.col("way_id").alias("_way"),
        F.array(*depth_cols).alias("flood_depths"),
        F.array(*len_cols).alias("flood_lengths"),
    )
    return ways.join(packed, ways["NAME"] == packed["_way"], "left").drop("_way")


def rescale_ruc(
    ways: DataFrame, slope: float = 5.7762, intercept: float = -0.0334
) -> DataFrame:
    """P9: RUC linear recalibration (additional-props.js:89-91)."""
    return ways.withColumn(
        "RUC", round_half_up(linear_rescale("RUC", slope, intercept), 2)
    )


def additional_props(
    ways: DataFrame,
    provinces: DataFrame,
    bridges: DataFrame,
    flood_stats: DataFrame,
    coords_col: str = "coordinates",
) -> DataFrame:
    """Full enrichment stage as one lazy DAG."""
    out = add_length(ways, coords_col)
    out = add_province_iso(out, provinces)
    out = add_bridges(out, bridges)
    out = add_flood_arrays(out, flood_stats)
    return rescale_ruc(out)
