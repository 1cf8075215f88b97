"""Temporal joins Spark lacks as built-ins: as-of join.

``asof_join`` attaches to each left row the most recent right row at or
before its timestamp, per key — the staple of event/state enrichment
(prices, sensor states, config versions).

Implementation is the union-and-carry trick, NOT a per-row lookup:
tag both sides, union, sort within key by (ts, side) and carry the last
non-null right values forward with an unbounded-preceding window. One
shuffle on the key; no range explosion; skew follows the key
distribution (salt upstream if a key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` on the same key (inclusive).

    Right-side timestamps equal to the left timestamp match (the right
    row sorts first via the side tag). Left rows with no prior right row
    get nulls.
    """
    lcols = left.columns
    carried = [f"{c}{suffix}" for c in right_value_cols] + [f"{ts}{suffix}"]

    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in right_value_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias(f"{ts}{suffix}"),
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
        F.col(ts).alias(f"{ts}{suffix}"),
    )
    # align schemas: left columns absent on the right become nulls
    for c in lcols:
        if c not in (key, ts):
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).drop("_side")
