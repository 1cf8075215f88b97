"""Scalar column-expression surface — pure Catalyst, no Python UDFs.

Every helper returns a :class:`pyspark.sql.Column` so expressions stay
inside whole-stage codegen on the JVM.
"""

from moz_datapipeline_spark.functions.cleaning import (
    camel_case,
    clean_numeric,
    flood_severity,
    road_class,
    road_condition,
    road_id_from_link,
    surface_type,
)
from moz_datapipeline_spark.functions.scaling import linear_rescale, round_half_up
from moz_datapipeline_spark.functions.arrays import map_to_array, trapezoid_ead
from moz_datapipeline_spark.functions.geo import (
    haversine_km,
    linestring_length_km,
    point_to_segment_distance,
)

__all__ = [
    "camel_case",
    "clean_numeric",
    "flood_severity",
    "road_class",
    "road_condition",
    "road_id_from_link",
    "surface_type",
    "linear_rescale",
    "round_half_up",
    "map_to_array",
    "trapezoid_ead",
    "haversine_km",
    "linestring_length_km",
    "point_to_segment_distance",
]
