"""A5 for arbitrary polygons: lineSplit + midpoint-membership kernel.

Reference: scripts/indicator-from-areas/indicator-from-areas.js:91-127 —
split each way at polygon boundaries, test the midpoint of each piece
for membership, sum inside lengths × indicator / way length.

Fixtures are hand-computable: L-shape (concave), square-with-hole,
diamond (non-axis-aligned edges), plus a cross-check of the polygon
kernel against the rectangle codegen fast path on the same data.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from moz_datapipeline_spark.operators.areas import (
    _polygon_clip_lengths,
    indicator_from_areas,
    indicator_from_polygon_areas,
    polygon_clipped_pairs,
)

SEG_SCHEMA = StructType(
    [
        StructField("way_id", LongType()),
        StructField("ax", DoubleType()),
        StructField("ay", DoubleType()),
        StructField("bx", DoubleType()),
        StructField("by", DoubleType()),
        StructField("way_len", DoubleType()),
    ]
)

POLY_SCHEMA = StructType(
    [
        StructField("area_id", StringType()),
        StructField("rings_x", ArrayType(ArrayType(DoubleType()))),
        StructField("rings_y", ArrayType(ArrayType(DoubleType()))),
        StructField("indicator", DoubleType()),
    ]
)


def _segs(spark, rows):
    return spark.createDataFrame(rows, SEG_SCHEMA)


def _polys(spark, rows):
    return spark.createDataFrame(rows, POLY_SCHEMA)


# ---------------------------------------------------------------------------
# numpy kernel unit tests (no Spark round-trip — exact hand-computed values)
# ---------------------------------------------------------------------------


def _clip1(ax, ay, bx, by, rings):
    import numpy as np

    rings_x = [[p[0] for p in r] for r in rings]
    rings_y = [[p[1] for p in r] for r in rings]
    out = _polygon_clip_lengths(
        np.array([ax]), np.array([ay]), np.array([bx]), np.array([by]),
        rings_x, rings_y,
    )
    return float(out[0])


L_SHAPE = [[(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0)]]
HOLED = [
    [(0.0, 0.0), (6.0, 0.0), (6.0, 6.0), (0.0, 6.0)],
    [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)],
]
DIAMOND = [[(2.0, 0.0), (0.0, 2.0), (-2.0, 0.0), (0.0, -2.0)]]


def test_concave_notch():
    # at y=3 the L-shape spans x in [0,2]; at y=1 it spans [0,4]
    assert _clip1(-1.0, 3.0, 5.0, 3.0, L_SHAPE) == pytest.approx(2.0)
    assert _clip1(-1.0, 1.0, 5.0, 1.0, L_SHAPE) == pytest.approx(4.0)


def test_hole_even_odd():
    # crossing the hole: inside = [0,2] + [4,6] = 4
    assert _clip1(-1.0, 3.0, 7.0, 3.0, HOLED) == pytest.approx(4.0)
    # below the hole: full [0,6]
    assert _clip1(-1.0, 1.0, 7.0, 1.0, HOLED) == pytest.approx(6.0)


def test_diamond_diagonal():
    # y=x crosses |x|+|y|<=2 on x in [-1,1] -> length 2*sqrt(2)
    assert _clip1(-3.0, -3.0, 3.0, 3.0, DIAMOND) == pytest.approx(2 * math.sqrt(2))


def test_fully_inside_and_outside():
    assert _clip1(-0.5, 0.0, 0.5, 0.0, DIAMOND) == pytest.approx(1.0)
    assert _clip1(3.0, 3.0, 4.0, 3.0, DIAMOND) == pytest.approx(0.0)
    # tangent along an edge-touching line contributes nothing
    assert _clip1(-3.0, 2.0, 3.0, 2.0, DIAMOND) == pytest.approx(0.0)


def test_vertical_segment_and_open_ring():
    # open ring is closed implicitly; vertical chord of the L at x=1
    assert _clip1(1.0, -1.0, 1.0, 5.0, L_SHAPE) == pytest.approx(4.0)
    assert _clip1(3.0, -1.0, 3.0, 5.0, L_SHAPE) == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# Spark plan tests
# ---------------------------------------------------------------------------


def _ring_cols(rings):
    return (
        [[p[0] for p in r] for r in rings],
        [[p[1] for p in r] for r in rings],
    )


def test_indicator_from_polygon_areas_fold(spark):
    lx, ly = _ring_cols(L_SHAPE)
    hx, hy = _ring_cols(HOLED)
    # shift the holed square away so bboxes are disjoint from the L
    hx = [[x + 10.0 for x in r] for r in hx]
    polys = _polys(
        spark,
        [
            ("L", lx, ly, 2.0),
            ("H", hx, hy, 5.0),
            ("Z", lx, ly, 0.0),  # zero indicator: pruned before the join
        ],
    )
    segs = _segs(
        spark,
        [
            (1, -1.0, 3.0, 5.0, 3.0, 6.0),   # L overlap 2
            (2, 9.0, 3.0, 17.0, 3.0, 8.0),   # H overlap 4 (hole crossing)
            (3, 100.0, 100.0, 101.0, 100.0, 1.0),  # no polygon
        ],
    )
    out = {
        r["way_id"]: r["value"]
        for r in indicator_from_polygon_areas(segs, polys).collect()
    }
    assert out[1] == pytest.approx(2.0 * 2.0 / 6.0)
    assert out[2] == pytest.approx(4.0 * 5.0 / 8.0)
    assert 3 not in out


def test_polygon_kernel_matches_rectangle_fast_path(spark):
    """Same axis-aligned cells via both paths -> identical folds."""
    cells = [
        ("c0", 0.0, 0.0, 4.0, 3.0, 1.5),
        ("c1", 4.0, 0.0, 9.0, 5.0, 2.5),
        ("c2", 1.0, 3.0, 3.0, 8.0, 4.0),
    ]
    rect = spark.createDataFrame(
        [(c[1], c[2], c[3], c[4], c[5]) for c in cells],
        "pminx double, pminy double, pmaxx double, pmaxy double, indicator double",
    )
    poly_rows = []
    for cid, x0, y0, x1, y1, ind in cells:
        ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        rx, ry = _ring_cols([ring])
        poly_rows.append((cid, rx, ry, ind))
    polys = _polys(spark, poly_rows)

    seg_rows = []
    for i in range(40):
        ax = (i * 7 % 11) - 1.0
        ay = (i * 3 % 9) - 0.5
        bx = ax + 1 + (i % 4)
        by = ay + (i % 3) - 1.0
        seg_rows.append(
            (i, ax, ay, bx, by, math.hypot(bx - ax, by - ay) or 1.0)
        )
    segs = _segs(spark, seg_rows)

    fast = {
        r["way_id"]: r["value"]
        for r in indicator_from_areas(segs, rect).collect()
    }
    slow = {
        r["way_id"]: r["value"]
        for r in indicator_from_polygon_areas(segs, polys).collect()
    }
    assert set(fast) == set(slow)
    for k in fast:
        assert slow[k] == pytest.approx(fast[k], abs=1e-9), k


def test_pairs_bbox_prefilter_broadcasts(spark):
    lx, ly = _ring_cols(L_SHAPE)
    polys = _polys(spark, [("L", lx, ly, 1.0)])
    segs = _segs(spark, [(1, -1.0, 3.0, 5.0, 3.0, 6.0)])
    plan = polygon_clipped_pairs(segs, polys)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_rings_through_rows_matches_broadcast_path(spark):
    """The no-broadcast grid-join plan returns the same folds as the
    ring-broadcast plan, including when bboxes straddle many grid cells
    (the canonical-cell predicate must keep each pair exactly once)."""
    lx, ly = _ring_cols(L_SHAPE)
    hx, hy = _ring_cols(HOLED)
    hx = [[x + 10.0 for x in r] for r in hx]
    polys = _polys(
        spark, [("L", lx, ly, 2.0), ("H", hx, hy, 5.0), ("Z", lx, ly, 0.0)]
    )
    segs = _segs(
        spark,
        [
            (1, -1.0, 3.0, 5.0, 3.0, 6.0),
            (2, 9.0, 3.0, 17.0, 3.0, 8.0),
            (3, 100.0, 100.0, 101.0, 100.0, 1.0),
            (4, 0.5, 0.5, 15.5, 4.5, math.hypot(15.0, 4.0)),  # spans both
        ],
    )
    want = {
        r["way_id"]: r["value"]
        for r in indicator_from_polygon_areas(segs, polys).collect()
    }
    for cell in (0.7, 2.0, 50.0):  # many cells ... one cell
        got = {
            r["way_id"]: r["value"]
            for r in indicator_from_polygon_areas(
                segs, polys, rings_through_rows=True, cell_size=cell
            ).collect()
        }
        assert set(got) == set(want), cell
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (cell, k)


def test_rings_through_rows_cell_explosion_raises_clearly(spark):
    """A bbox spanning more grid cells than max_cells_per_bbox must
    fail with a clear 'increase cell_size' sizing error, not an opaque
    mid-job sequence overflow."""
    from moz_datapipeline_spark.operators.areas import polygon_clipped_pairs

    lx, ly = _ring_cols(L_SHAPE)
    polys = _polys(spark, [("L", lx, ly, 2.0)])
    # a 60x3 world-spanning segment bbox at cell_size=0.5 → >400 cells
    segs = _segs(spark, [(1, -30.0, 0.0, 30.0, 3.0, 60.1)])
    out = polygon_clipped_pairs(
        segs, polys, rings_through_rows=True, cell_size=0.5,
        max_cells_per_bbox=100,
    )
    with pytest.raises(Exception, match="increase cell_size"):
        out.collect()
    # same data, adequate cap: completes
    ok = polygon_clipped_pairs(
        segs, polys, rings_through_rows=True, cell_size=0.5,
        max_cells_per_bbox=4096,
    )
    assert ok.count() >= 0


def test_rings_through_rows_completes_above_broadcast_cap(spark, monkeypatch):
    """A polygon side over the cap: the broadcast path refuses, the
    documented fallback completes with the same answer — and its plan
    construction runs zero Spark jobs (no driver collect anywhere)."""
    from moz_datapipeline_spark.operators import areas

    lx, ly = _ring_cols(L_SHAPE)
    polys = _polys(spark, [("L", lx, ly, 2.0), ("M", lx, ly, 0.5)])
    segs = _segs(spark, [(1, -1.0, 3.0, 5.0, 3.0, 6.0)])
    monkeypatch.setattr(areas, "MAX_BROADCAST_POLYGONS", 1)
    with pytest.raises(ValueError, match="rings_through_rows"):
        areas.polygon_clipped_pairs(segs, polys)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out_df = areas.indicator_from_polygon_areas(
        segs, polys, rings_through_rows=True, cell_size=2.0
    )
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # plan-only construction
    out = {r["way_id"]: r["value"] for r in out_df.collect()}
    assert out[1] == pytest.approx((2.0 * 2.0 + 2.0 * 0.5) / 6.0)


def test_oversized_polygon_side_raises_before_collect(spark, monkeypatch):
    """The ring broadcast must refuse an over-cap polygon side with a
    clear error instead of silently collecting it into the driver."""
    from moz_datapipeline_spark.operators import areas

    lx, ly = _ring_cols(L_SHAPE)
    polys = _polys(spark, [("L", lx, ly, 1.0), ("M", lx, ly, 1.0)])
    segs = _segs(spark, [(1, -1.0, 3.0, 5.0, 3.0, 6.0)])
    monkeypatch.setattr(areas, "MAX_BROADCAST_POLYGONS", 1)
    with pytest.raises(ValueError, match="too large to broadcast"):
        areas.polygon_clipped_pairs(segs, polys)
    monkeypatch.setattr(areas, "MAX_BROADCAST_POLYGONS", 500_000)
    monkeypatch.setattr(areas, "MAX_BROADCAST_RING_BYTES", 8)
    with pytest.raises(ValueError, match="too large to broadcast"):
        areas.polygon_clipped_pairs(segs, polys)
