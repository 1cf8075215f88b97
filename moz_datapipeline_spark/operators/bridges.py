"""Bridge preparation — nearest-road snapping (reference prep-bridge).

- ``clean_bridges``      (P5–P7) — road-id extraction, type derivation,
  length cleanup (scripts/prep-bridge/prep-bridge.js:46-72).
- ``snap_to_nearest_way`` (J5)   — grouped nearest-neighbor join:
  equi-prefilter on ROAD_ID, then argmin of point→segment distance
  (prep-bridge.js:86-112). The reference's per-row find+reduce becomes
  an equi join + window row_number — the cheap key prefilter keeps the
  candidate set small so the distance math runs on few pairs, exactly
  the optimization the reference hand-rolled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from moz_datapipeline_spark.functions.cleaning import clean_numeric, road_id_from_link
from moz_datapipeline_spark.functions.geo import point_to_segment_distance


def clean_bridges(
    bridges: DataFrame,
    link_col: str = "Link_ID",
    type_col: str = "Des_Type",
    length_col: str = "Over_Length",
    default_length: float = 7.0,
) -> DataFrame:
    """Derive roadID / type / length from raw bridge records."""
    return (
        bridges.withColumn("roadID", road_id_from_link(link_col))
        .withColumn(
            "type",
            F.when(F.col(type_col) == "CULV", F.lit("culvert")).otherwise(
                F.lit("bridge")
            ),
        )
        .withColumn("length", clean_numeric(length_col, default=default_length))
    )


def snap_to_nearest_way(
    bridges: DataFrame,
    way_segments: DataFrame,
    bridge_id: str = "bridge_id",
    bridge_x: str = "lon",
    bridge_y: str = "lat",
    road_key_bridge: str = "roadID",
    road_key_way: str = "ROAD_ID",
) -> DataFrame:
    """Attach each bridge to its nearest segment of the matching road.

    ``way_segments`` is the exploded per-segment form:
    (NAME, ROAD_ID, ax, ay, bx, by) — one row per 2-vertex piece of each
    way. Join on road id (equi, shuffles only matching pairs), compute
    point→segment distance as pure column math, keep the argmin per
    bridge via min-over-struct: one hash aggregation with map-side
    partials instead of sorting every candidate group. Tiebreak order is
    (_dist, NAME, remaining columns) — the first two match the reference
    rule, the tail just makes exotic ties deterministic.
    """
    joined = bridges.join(
        way_segments,
        bridges[road_key_bridge] == way_segments[road_key_way],
        "inner",
    ).withColumn(
        "_dist",
        point_to_segment_distance(
            bridge_x, bridge_y, "ax", "ay", "bx", "by"
        ),
    )
    rest = [c for c in joined.columns if c not in (bridge_id, "_dist", "NAME")]
    argmin = joined.groupBy(bridge_id).agg(
        F.min(F.struct("_dist", "NAME", *rest)).alias("_m")
    )
    return argmin.select(
        bridge_id,
        *[
            F.col(f"_m.{c}").alias("roadSegmentID" if c == "NAME" else c)
            for c in joined.columns
            if c != bridge_id
        ],
    )
