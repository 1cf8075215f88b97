"""Dissolve (grouped union via edge cancellation) + shoelace measures.

Reference: scripts/preparation.sh:149-151 (mapshaper -dissolve2 of
Maputo city into its province) and :193-195 (district centroids).
Fixtures are hand-computable unit-cell tilings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from moz_datapipeline_spark.functions.geo import (
    polygon_area,
    polygon_centroid,
    polygon_perimeter,
)
from moz_datapipeline_spark.operators.geometry import dissolve

POLY_SCHEMA = StructType(
    [
        StructField("gid", StringType()),
        StructField("rings_x", ArrayType(ArrayType(DoubleType()))),
        StructField("rings_y", ArrayType(ArrayType(DoubleType()))),
    ]
)


def _cell(c: float, r: float):
    """Unit grid cell at column c, row r — CCW open ring."""
    return [[c, c + 1, c + 1, c]], [[r, r, r + 1, r + 1]]


def _polys(spark, rows):
    return spark.createDataFrame(rows, POLY_SCHEMA)


def test_shoelace_measures(spark):
    # L-shape: area 12, perimeter 16, centroid hand-computed:
    # union of 4x2 bottom rect (area 8, c=(2,1)) and 2x2 top square
    # (area 4, c=(1,3)) -> cx=(8*2+4*1)/12, cy=(8*1+4*3)/12
    df = spark.createDataFrame(
        [
            (
                "L",
                [[0.0, 4.0, 4.0, 2.0, 2.0, 0.0]],
                [[0.0, 0.0, 2.0, 2.0, 4.0, 4.0]],
            )
        ],
        POLY_SCHEMA,
    )
    row = df.select(
        polygon_area("rings_x", "rings_y").alias("a"),
        polygon_perimeter("rings_x", "rings_y").alias("p"),
        polygon_centroid("rings_x", "rings_y").alias("c"),
    ).collect()[0]
    assert row["a"] == pytest.approx(12.0)
    assert row["p"] == pytest.approx(16.0)
    assert row["c"]["cx"] == pytest.approx(20.0 / 12.0)
    assert row["c"]["cy"] == pytest.approx(20.0 / 12.0)


def test_shoelace_with_hole_and_closed_ring(spark):
    # 6x6 square with 2x2 hole; outer CCW, hole CW, rings explicitly
    # closed (first vertex repeated) -> same result as open rings
    df = spark.createDataFrame(
        [
            (
                "H",
                [
                    [0.0, 6.0, 6.0, 0.0, 0.0],
                    [2.0, 2.0, 4.0, 4.0, 2.0],
                ],
                [
                    [0.0, 0.0, 6.0, 6.0, 0.0],
                    [2.0, 4.0, 4.0, 2.0, 2.0],
                ],
            )
        ],
        POLY_SCHEMA,
    )
    row = df.select(
        polygon_area("rings_x", "rings_y").alias("a"),
        polygon_perimeter("rings_x", "rings_y").alias("p"),
        polygon_centroid("rings_x", "rings_y").alias("c"),
    ).collect()[0]
    assert row["a"] == pytest.approx(32.0)
    assert row["p"] == pytest.approx(32.0)
    assert row["c"]["cx"] == pytest.approx(3.0)
    assert row["c"]["cy"] == pytest.approx(3.0)


def test_dissolve_two_cells(spark):
    rows = []
    for i, (c, r) in enumerate([(0.0, 0.0), (1.0, 0.0)]):
        rx, ry = _cell(c, r)
        rows.append(("g", rx, ry))
    out = dissolve(_polys(spark, rows), "gid").collect()
    assert len(out) == 1
    # 2x1 rectangle: shared edge cancelled, collinear mid-vertices kept
    assert out[0]["rings_x"] == [[0.0, 1.0, 2.0, 2.0, 1.0, 0.0]]
    assert out[0]["rings_y"] == [[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]]


def test_dissolve_ring_with_hole(spark):
    # 3x3 block minus the center cell -> outer ring (12 edges, CCW)
    # + hole ring (4 edges, CW); area 8, perimeter 16
    rows = []
    for c in range(3):
        for r in range(3):
            if (c, r) == (1, 1):
                continue
            rx, ry = _cell(float(c), float(r))
            rows.append(("g", rx, ry))
    d = dissolve(_polys(spark, rows), "gid")
    row = d.select(
        "rings_x",
        polygon_area("rings_x", "rings_y").alias("a"),
        polygon_perimeter("rings_x", "rings_y").alias("p"),
        polygon_centroid("rings_x", "rings_y").alias("c"),
    ).collect()[0]
    assert sorted(len(r) for r in row["rings_x"]) == [4, 12]
    assert row["a"] == pytest.approx(8.0)
    assert row["p"] == pytest.approx(16.0)
    assert row["c"]["cx"] == pytest.approx(1.5)
    assert row["c"]["cy"] == pytest.approx(1.5)


def test_dissolve_disjoint_parts_and_groups(spark):
    rows = []
    # group a: two disjoint cells -> two rings; group b: one cell
    for c, r in [(0.0, 0.0), (5.0, 5.0)]:
        rx, ry = _cell(c, r)
        rows.append(("a", rx, ry))
    rx, ry = _cell(2.0, 2.0)
    rows.append(("b", rx, ry))
    out = {
        r["gid"]: r
        for r in dissolve(_polys(spark, rows), "gid")
        .select(
            "gid",
            "rings_x",
            polygon_area("rings_x", "rings_y").alias("a"),
        )
        .collect()
    }
    assert len(out["a"]["rings_x"]) == 2
    assert out["a"]["a"] == pytest.approx(2.0)
    assert out["a"]["rings_x"][0][0] == 0.0  # rings sorted by min vertex
    assert out["b"]["a"] == pytest.approx(1.0)


def test_dissolve_deterministic(spark):
    rows = []
    for i, (c, r) in enumerate([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]):
        rx, ry = _cell(c, r)
        rows.append(("g", rx, ry))
    df = _polys(spark, rows)
    a = dissolve(df, "gid").collect()
    b = dissolve(df.repartition(7), "gid").collect()
    assert a == b
    # 2x2 block: single 8-edge ring
    assert len(a[0]["rings_x"]) == 1 and len(a[0]["rings_x"][0]) == 8


def test_prepare_admin_areas(spark):
    from moz_datapipeline_spark.plans.moz_pipeline import prepare_admin_areas

    rows = []
    # province P1 = two adjacent districts, P2 = one district
    for did, pid, (c, r) in [
        ("d1", "P1", (0.0, 0.0)),
        ("d2", "P1", (1.0, 0.0)),
        ("d3", "P2", (5.0, 5.0)),
    ]:
        rx, ry = _cell(c, r)
        rows.append((did, pid, rx, ry))
    districts = spark.createDataFrame(
        rows, "district_id string, province_iso string, "
        "rings_x array<array<double>>, rings_y array<array<double>>"
    )
    out = prepare_admin_areas(districts)
    provs = {r["province_iso"]: r for r in out["provinces"].collect()}
    assert len(provs["P1"]["rings_x"]) == 1
    assert len(provs["P1"]["rings_x"][0]) == 6  # dissolved 2x1 rect
    assert len(provs["P2"]["rings_x"][0]) == 4
    cents = {r["district_id"]: r for r in out["district_centroids"].collect()}
    assert cents["d1"]["cx"] == pytest.approx(0.5)
    assert cents["d3"]["cy"] == pytest.approx(5.5)
    assert cents["d2"]["area"] == pytest.approx(1.0)


def test_dissolve_rejects_mixed_orientation(spark):
    # adjacent cells wound OPPOSITE ways traverse their shared edge in
    # the SAME direction: it cancels as undirected but leaves the
    # surviving edges with unbalanced in/out degrees — must raise the
    # tiling error, not loop or emit garbage
    ccw_x, ccw_y = _cell(0.0, 0.0)
    cw = ("g", [[1.0, 1.0, 2.0, 2.0]], [[0.0, 1.0, 1.0, 0.0]])
    bad = spark.createDataFrame([("g", ccw_x, ccw_y), cw], POLY_SCHEMA)
    with pytest.raises(Exception, match="edge-matched|PYTHON"):
        dissolve(bad, "gid").collect()
