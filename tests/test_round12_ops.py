"""Round-12 operator tests: point-level DBSCAN, z-order layout,
Fellegi-Sunter record linkage."""

from __future__ import annotations

import pytest


def test_grid_dbscan_hand_computed(spark):
    """Two 3-point blobs 556 km apart at eps=200 km / min_pts=3: all
    six blob points are core (2 neighbors + self); (2.5, 0) is 167 km
    from blob A's edge but 222 km from its middle -> border, joins
    A's cluster; (10, 10) is noise.  Labels are the min core id."""
    from moz_datapipeline_spark.operators.geometry import grid_dbscan

    pts = [
        (1, 0.0, 0.0), (2, 0.5, 0.0), (3, 1.0, 0.0),
        (4, 2.5, 0.0),
        (5, 10.0, 10.0),
        (6, 0.0, 5.0), (7, 0.5, 5.0), (8, 1.0, 5.0),
    ]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    out = {
        r.id: r
        for r in grid_dbscan(df, eps_km=200.0, min_pts=3).collect()
    }
    assert len(out) == 8
    assert all(out[i].is_core for i in (1, 2, 3, 6, 7, 8))
    assert not out[4].is_core and not out[5].is_core
    assert out[1].cluster == out[2].cluster == out[3].cluster == 1
    assert out[4].cluster == 1
    assert out[5].cluster is None
    assert out[6].cluster == out[7].cluster == out[8].cluster == 6


def test_grid_dbscan_min_pts_one_isolated_cores(spark):
    """min_pts=1: every point is core; isolated cores become their own
    singleton cluster (no core-core edge, label = own id)."""
    from moz_datapipeline_spark.operators.geometry import grid_dbscan

    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 90.0, 40.0)], "id long, lon double, lat double"
    )
    out = {
        r.id: r for r in grid_dbscan(df, eps_km=10.0, min_pts=1).collect()
    }
    assert out[1].is_core and out[1].cluster == 1
    assert out[2].is_core and out[2].cluster == 2


def test_grid_dbscan_duplicate_positions_count(spark):
    """Coincident points are mutual 0-km neighbors: 3 points at one
    location with min_pts=3 are all core, one cluster."""
    from moz_datapipeline_spark.operators.geometry import grid_dbscan

    df = spark.createDataFrame(
        [(i, 5.0, 5.0) for i in range(1, 4)],
        "id long, lon double, lat double",
    )
    out = {
        r.id: r for r in grid_dbscan(df, eps_km=1.0, min_pts=3).collect()
    }
    assert all(out[i].is_core and out[i].cluster == 1 for i in (1, 2, 3))


def test_grid_dbscan_guards(spark):
    from moz_datapipeline_spark.operators.geometry import grid_dbscan

    df = spark.createDataFrame(
        [(1, 0.0, 0.0)], "id long, lon double, lat double"
    )
    with pytest.raises(ValueError, match="eps_km"):
        grid_dbscan(df, eps_km=0.0)
    with pytest.raises(ValueError, match="min_pts"):
        grid_dbscan(df, eps_km=1.0, min_pts=0)
