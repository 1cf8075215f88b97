"""Area-based indicators: spatial join + length-weighted average.

Reference: scripts/indicator-from-areas/indicator-from-areas.js.

J9 — the reference prefilters way×polygon pairs with an R-tree on
bboxes (scripts/utils/utils.js:83-98) then runs exact geometry tests.
Here the bbox prefilter is a plain range-predicate join (Catalyst
pushes, AQE skew-splits, the polygon side broadcasts when small); the
exact weighting runs only on surviving pairs.

A5 — per way: weight = overlap_length × indicator / way_length, summed
over intersecting polygons (indicator-from-areas.js:91-127). The
reference approximates membership by splitting the line and testing the
midpoint of the first segment of each piece; with axis-aligned cells we
compute the clipped length exactly in column space. For arbitrary
polygons the same operator accepts a pandas-UDF weighting kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bbox_join(
    ways: DataFrame,
    polygons: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """Candidate pairs by bbox overlap.

    ``ways`` needs (minx, miny, maxx, maxy); ``polygons`` needs
    (pminx, pminy, pmaxx, pmaxy). Broadcasts the polygon side —
    boundary/zone tables are small relative to the network.
    """
    cond = (
        (F.col("minx") <= F.col("pmaxx"))
        & (F.col("maxx") >= F.col("pminx"))
        & (F.col("miny") <= F.col("pmaxy"))
        & (F.col("maxy") >= F.col("pminy"))
    )
    return ways.join(F.broadcast(polygons), cond, how)


def length_weighted_indicator(
    pairs: DataFrame,
    way_id: str = "way_id",
    overlap_len: str = "overlap_len",
    way_len: str = "way_len",
    indicator: str = "indicator",
) -> DataFrame:
    """A5 fold: sum(overlap·ind)/way_len per way → indicator contract rows.

    One groupBy(way_id) shuffle; zero-value polygons should be filtered
    upstream (reference prunes ind<=0, utils.js:86).
    """
    return (
        pairs.groupBy(F.col(way_id).alias("way_id"))
        .agg(
            (
                F.sum(F.col(overlap_len) * F.col(indicator)) / F.first(way_len)
            ).alias("value")
        )
    )


def clipped_segment_length(
    ax, ay, bx, by, cminx, cminy, cmaxx, cmaxy
):
    """Length of segment (a,b) clipped to an axis-aligned cell.

    Liang–Barsky in pure column expressions — exact for rectangular
    zones, fully codegen'd (no UDF). Returns a Column (same units as
    the coordinates).
    """
    ax, ay, bx, by = map(F.col, (ax, ay, bx, by)) if isinstance(ax, str) else (ax, ay, bx, by)
    dx = bx - ax
    dy = by - ay

    def axis_range(p0, d, lo, hi):
        # entering/leaving parameters for one axis (d==0 → full range if inside)
        t0 = F.when(d != 0, (lo - p0) / d).otherwise(F.lit(float("-inf")))
        t1 = F.when(d != 0, (hi - p0) / d).otherwise(F.lit(float("inf")))
        return F.least(t0, t1), F.greatest(t0, t1)

    tx0, tx1 = axis_range(ax, dx, F.col(cminx) if isinstance(cminx, str) else cminx,
                          F.col(cmaxx) if isinstance(cmaxx, str) else cmaxx)
    ty0, ty1 = axis_range(ay, dy, F.col(cminy) if isinstance(cminy, str) else cminy,
                          F.col(cmaxy) if isinstance(cmaxy, str) else cmaxy)
    t_in = F.greatest(tx0, ty0, F.lit(0.0))
    t_out = F.least(tx1, ty1, F.lit(1.0))
    frac = F.greatest(t_out - t_in, F.lit(0.0))
    seg_len = F.sqrt(dx * dx + dy * dy)
    # degenerate axis: if dx==0 require minx<=ax<=maxx (same for y)
    ok_x = (dx != 0) | (
        (ax >= (F.col(cminx) if isinstance(cminx, str) else cminx))
        & (ax <= (F.col(cmaxx) if isinstance(cmaxx, str) else cmaxx))
    )
    ok_y = (dy != 0) | (
        (ay >= (F.col(cminy) if isinstance(cminy, str) else cminy))
        & (ay <= (F.col(cmaxy) if isinstance(cmaxy, str) else cmaxy))
    )
    return F.when(ok_x & ok_y, seg_len * frac).otherwise(F.lit(0.0))


def indicator_from_areas(
    way_segments: DataFrame,
    cells: DataFrame,
    indicator: str = "indicator",
) -> DataFrame:
    """End-to-end area indicator for rectangular zones.

    ``way_segments``: (way_id, ax, ay, bx, by, way_len) — exploded
    2-vertex pieces. ``cells``: (pminx, pminy, pmaxx, pmaxy, indicator).
    Plan: bbox join (broadcast) → exact clipped length (codegen) →
    A5 fold. Zero-indicator cells pruned before the join.
    """
    segs = way_segments.withColumn(
        "minx", F.least("ax", "bx")
    ).withColumn("maxx", F.greatest("ax", "bx")).withColumn(
        "miny", F.least("ay", "by")
    ).withColumn("maxy", F.greatest("ay", "by"))
    live_cells = cells.filter(F.col(indicator) > 0)
    pairs = bbox_join(segs, live_cells)
    pairs = pairs.withColumn(
        "overlap_len",
        clipped_segment_length(
            "ax", "ay", "bx", "by", "pminx", "pminy", "pmaxx", "pmaxy"
        ),
    ).filter(F.col("overlap_len") > 0)
    return (
        pairs.groupBy("way_id")
        .agg(
            (F.sum(F.col("overlap_len") * F.col(indicator)) / F.first("way_len")).alias(
                "value"
            )
        )
    )
