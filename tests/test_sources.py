"""Source/sink round-trip tests."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

REFERENCE_OSM = "/root/reference/tests/fixtures/roadnetwork.osm"


def test_read_osm_ways_reference_fixture(spark):
    from moz_datapipeline_spark.sources.readers import read_osm_ways

    if not os.path.exists(REFERENCE_OSM):
        pytest.skip("reference fixture not present")
    ways = read_osm_ways(spark, REFERENCE_OSM).toPandas().set_index("NAME")
    assert len(ways) == 10
    assert list(ways.loc["1", "nodes"]) == ["2", "3"]
    assert ways.loc["1", "RUC"] == 1.25
    assert ways.loc["8", "length"] == 2000.0
    assert ways.loc["10", "SURF_TYPE"] == "Unpaved"


def test_geojson_roundtrip(spark, tmp_path):
    from moz_datapipeline_spark.sources.readers import (
        linestring_coords,
        read_geojson_features,
    )
    from moz_datapipeline_spark.sources.writers import write_geojson

    gj = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[0.0, 0.0], [1.0, 1.0]],
                },
                "properties": {"NAME": "w1", "RUC": 1.5},
            }
        ],
    }
    src = tmp_path / "in.geojson"
    src.write_text(json.dumps(gj))
    feats = read_geojson_features(spark, str(src)).withColumn(
        "coordinates", linestring_coords("coordinates_json")
    )
    out = tmp_path / "out.geojson"
    write_geojson(feats.select("NAME", "RUC", "coordinates"), str(out))
    back = json.loads(out.read_text())
    assert back["features"][0]["properties"]["NAME"] == "w1"
    assert back["features"][0]["geometry"]["coordinates"] == [[0.0, 0.0], [1.0, 1.0]]


def test_indicator_csv_roundtrip(spark, tmp_path):
    from moz_datapipeline_spark.sources.readers import read_indicator_csv
    from moz_datapipeline_spark.sources.writers import write_indicator_csv

    df = spark.createDataFrame(
        [("w1", 50.0, 10.0), ("w2", 100.0, 20.0)],
        "way_id string, score double, value double",
    )
    path = str(tmp_path / "ind")
    write_indicator_csv(df, path)
    back = read_indicator_csv(spark, path).toPandas().set_index("way_id")
    assert back.loc["w2", "score"] == 100.0
    assert back.loc["w1", "value"] == 10.0


def test_merge_eaul_flatten(spark):
    from moz_datapipeline_spark.plans.moz_pipeline import merge_eaul

    network = spark.createDataFrame([("1",), ("2",), ("3",)], "NAME string")
    results = spark.createDataFrame(
        [
            ("__baseline__", "baseline", 100.0),
            ("1", "upgrade-rehab-asphalt", 50.0),
            ("1", "upgrade-rehab-gravel", 60.0),
            ("2", "upgrade-rehab-asphalt", 80.0),
        ],
        "way_id string, upgrade_id string, eaul double",
    )
    out = merge_eaul(network, results).toPandas().set_index("NAME")
    assert out.loc["1", "eaul-upgrade-rehab-asphalt"] == 50.0
    assert out.loc["1", "eaul-upgrade-rehab-gravel"] == 60.0
    assert out.loc["2", "eaul-upgrade-rehab-asphalt"] == 80.0
    # way 3 has no results → nulls
    assert out.loc["3", "eaul-upgrade-rehab-asphalt"] != out.loc["3", "eaul-upgrade-rehab-asphalt"]


def test_shapefile_distributed_parse(spark, tmp_path):
    """Runs only where geopandas is installed: parsing must happen on
    executors (mapInPandas over file paths) and surface the fixed
    SHAPEFILE_SCHEMA row contract."""
    gpd = pytest.importorskip("geopandas")
    from shapely.geometry import LineString

    from moz_datapipeline_spark.sources.readers import read_shapefile

    gdf = gpd.GeoDataFrame(
        {"NAME": ["a", "b"]},
        geometry=[LineString([(0, 0), (1, 1)]), LineString([(1, 1), (2, 0)])],
        crs="EPSG:4326",
    )
    p = str(tmp_path / "ways.shp")
    gdf.to_file(p)
    out = read_shapefile(spark, p).toPandas()
    assert len(out) == 2
    assert set(out["geom_type"]) == {"LineString"}
    assert out.iloc[0]["properties"]["NAME"] in ("a", "b")
    assert out.iloc[0]["coordinates"][0]["lon"] is not None
    # plan must be a mapInPandas over paths, not a driver-side createDataFrame of features
    assert "MapInPandas" in read_shapefile(spark, p)._jdf.queryExecution().toString()
