"""Event-stream operators: windowed aggregation + sessionization.

``hourly_rollup`` works identically on a batch DataFrame and a
streaming one (groupBy(window(...)) compiles to a stateful streaming
agg under readStream). For streaming use, attach a watermark first so
late data is bounded:

    events = (spark.readStream.format(...)...load()
              .withWatermark("ts", "2 hours"))
    hourly_rollup(events).writeStream.outputMode("append")...

``sessionize`` uses ``session_window`` in streaming mode; the batch
variant (lag + running sum) matches the oracle-checked query in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_rollup(
    events: DataFrame, ts_col: str = "ts", keys: tuple[str, ...] = ("event_type",)
) -> DataFrame:
    """Tumbling 1-hour windows: count + sum(value) per key."""
    return (
        events.groupBy(F.window(F.col(ts_col), "1 hour").alias("w"), *keys)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def sessionize_streaming(
    events: DataFrame, gap: str = "30 minutes", user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions via the native session_window (streaming-safe)."""
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch sessionization (lag + running sum) assigning session ids."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    flagged = events.withColumn("_prev", F.lag(ts_col).over(w)).withColumn(
        "_new",
        F.when(
            F.col("_prev").isNull()
            | (
                F.col(ts_col).cast("double") - F.col("_prev").cast("double")
                > gap_seconds
            ),
            1,
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_prev", "_new")
