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


def stream_stream_attribution(
    views: DataFrame,
    clicks: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_delay: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: each click joins the
    views of the same user in ``[click.ts - max_delay, click.ts]``.

    Both sides carry a watermark and the join condition bounds the
    event-time distance in BOTH directions, so Spark can prove state
    eviction: view rows are dropped once the click watermark passes
    ``view_ts + max_delay``, keeping state O(active window), not
    O(stream).  Works identically on batch DataFrames (the same plan
    minus the state store).
    """
    v = views.select(
        F.col(user_col).alias("_v_user"),
        F.col(ts_col).alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = clicks.withWatermark(ts_col, watermark)
    cond = (
        (c[user_col] == v["_v_user"])
        & (v["view_ts"] <= c[ts_col])
        & (c[ts_col] <= v["view_ts"] + F.expr(f"INTERVAL {max_delay}"))
    )
    return c.join(v, cond).drop("_v_user")


def ohlc_rollup(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling OHLC bars — the streaming twin of
    ``operators/temporal.ohlc_bars`` (same dual-mode contract as
    ``hourly_rollup``: under ``readStream`` this compiles to a
    stateful streaming aggregate; attach a watermark first and run
    append mode so bars emit exactly once, on window close).

    open/close are min/max STRUCT folds over (event time, value) —
    algebraic aggregates, so streaming state is O(1) per (key,
    window): each micro-batch folds into the running min/max structs,
    nothing buffers rows.  Duplicate timestamps tiebreak on the value
    (deterministic across micro-batch arrival orders — a
    first()-style aggregate would be arrival-order-dependent, which
    streaming forbids).  NULL values drop.
    """
    v = F.col(value_col).cast("double")
    pick = F.struct(F.col(ts_col).alias("_t"), v.alias("_v"))
    return (
        events.filter(v.isNotNull())
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            *[F.col(k) for k in keys],
        )
        .agg(
            F.min(pick).alias("_f"),
            F.max(pick).alias("_l"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            F.col("_f._v").alias("open"),
            "high",
            "low",
            F.col("_l._v").alias("close"),
            "n",
        )
    )


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream–static dimension enrichment: broadcast the (static)
    dimension into every micro-batch — the streaming counterpart of
    the J1/J2 broadcast dimension joins, and the join shape Spark
    allows UNRESTRICTED in streaming (no watermark needed: the static
    side never changes mid-query, each micro-batch joins against the
    dimension's current snapshot).

    Left join by default: an event with no dimension row survives
    with NULLs (dropping events because a dimension lags is a
    pipeline bug).  Works identically on batch frames (the dual-mode
    ``hourly_rollup`` contract).
    """
    return stream.join(F.broadcast(dim), key, how)


def windowed_user_counts_stream(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """STREAMING stage of windowed top-k: per (window, key, user)
    event counts under a watermark — append-mode safe, so each
    window's counts emit exactly once when the watermark passes.

    Ranking deliberately does NOT live in the stream: Structured
    Streaming forbids window functions over streaming aggregates
    (rank needs the closed window's full count set).  The standard
    production shape is this stage → a sink → ``topk_from_counts``
    over the closed windows (or ``forEachBatch``).
    ``windowed_topk_batch`` is the equivalence twin the tests pin.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_len).alias("w"),
            F.col(key_col).alias("key"),
            F.col(user_col).alias("user"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "key",
            "user",
            "n_events",
        )
    )


def topk_from_counts(counts: DataFrame, k: int = 3) -> DataFrame:
    """Rank stage over CLOSED windows: top-k users per (window, key)
    by count, ties broken by user ascending (deterministic, replayed
    by the oracle).  The window is partitioned per (window, key) —
    WindowGroupLimit prunes to k rows per partition map-side, so the
    exchange carries ~k rows per group, not the counts."""
    if k < 1:
        raise ValueError("topk_from_counts: k must be >= 1")
    w = Window.partitionBy("window_start", "key").orderBy(
        F.col("n_events").desc(), F.col("user").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("window_start", "key", "user", "n_events", "rank")
    )


def windowed_topk_batch(
    events: DataFrame,
    k: int = 3,
    ts_col: str = "ts",
    window_ns: int = 3_600_000_000_000,
    key_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Batch twin of the streaming windowed top-k (long-ns ts — the
    engine contract): tumbling-window counts + the SAME rank stage.
    One hash aggregate + one per-(window, key) WindowGroupLimit."""
    step = window_ns // 1_000_000_000
    counts = events.groupBy(
        (F.floor(F.col(ts_col) / F.lit(window_ns)) * F.lit(step))
        .cast("long")
        .alias("window_start"),
        F.col(key_col).alias("key"),
        F.col(user_col).alias("user"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return topk_from_counts(counts, k=k)
