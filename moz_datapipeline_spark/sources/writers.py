"""Sinks: Parquet (engine-internal), CSV (indicator contract), GeoJSON.

S8/S9 of SURVEY §2.1. Parquet everywhere internally; CSV/GeoJSON only at
the edges for reference compatibility. The vector-tile sink (S12,
tippecanoe) is an external post-step outside the engine.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None):
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_indicator_csv(df: DataFrame, path: str):
    """Indicator contract sink (way_id, score[, value]) — utils.js:111-118."""
    cols = ["way_id", "score"] + (["value"] if "value" in df.columns else [])
    df.select(*cols).write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str):
    df.write.mode("overwrite").json(path)


def collect_geojson(df: DataFrame, geom_type: str = "LineString") -> dict:
    """Small-result GeoJSON assembly (driver-side; final outputs only).

    Expects a ``coordinates`` array column (LINESTRING_COORDS shape);
    all other columns become feature properties.
    """
    props = [c for c in df.columns if c != "coordinates"]
    features = []
    for row in df.collect():
        coords = [[p["lon"], p["lat"]] for p in (row["coordinates"] or [])]
        features.append(
            {
                "type": "Feature",
                "geometry": {"type": geom_type, "coordinates": coords},
                "properties": {p: row[p] for p in props},
            }
        )
    return {"type": "FeatureCollection", "features": features}


def write_geojson(df: DataFrame, path: str, geom_type: str = "LineString"):
    with open(path, "w") as fh:
        json.dump(collect_geojson(df, geom_type), fh)
