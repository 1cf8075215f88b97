"""Range joins at scale.

``bbox_join`` (areas.py) broadcasts the interval side — right when zones
are small. When BOTH sides are large (point stream × million-interval
table), a broadcast nested-loop explodes; ``bucketed_range_join``
converts the range predicate into an equi join:

- points map to bucket ``floor(p / width)``
- intervals explode to every bucket they overlap
- equi join on the bucket co-locates candidates; an exact filter
  removes false positives from bucket granularity.

Shuffle volume is |points| + Σ interval spans/width — tunable via
``bucket_width`` (match the median interval length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """points ⨝ intervals ON lo <= p < hi, as a bucketed equi join."""
    p_bucketed = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    i_bucketed = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                # hi is exclusive: a hi exactly on a bucket edge doesn't
                # reach into the next bucket
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / bucket_width
                ).cast("long"),
            )
        ),
    )
    joined = p_bucketed.join(i_bucketed, "_bucket", how)
    return joined.filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    ).drop("_bucket")
